"""High-cardinality exact grouped aggregation.

``Dataset.groupby(keys).aggregate(...)`` pays ~0.1-0.25 ms of Python
overhead PER GROUP in the reduce stage — fine for histograms (few
groups), lethal for key-per-row constraints (uniqueness over
(repo,path,commit): 1M rows -> minutes).  This module provides the
scale-correct shape:

1. per-batch LOCAL pre-aggregation (pyarrow ``Table.group_by`` —
   vectorized C++) so the shuffle moves one row per key per block;
2. a COARSE partition key = stable hash(key) & (C-1) (all rows of a key
   co-locate; C is small so Ray's per-group overhead is bounded);
3. per-coarse-group vectorized merge (pandas groupby — C++ hash agg).

Supported ops: sum, min, max, count (count rows per key).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_MERGE_OP = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}

_FNV_BASIS = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)


def _hash_string_array(col) -> np.ndarray:
    """Per-row FNV-1a over the utf-8 bytes, straight from the Arrow
    string buffers — no pandas / Python-object conversion (the same
    longest-first byte-position walk as ``text._fnv1a_rolling``; key
    strings are short, so the position loop is a handful of vectorized
    steps).  Nulls hash like the empty string (co-location only)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    n = len(col)
    if n == 0:
        return np.zeros(0, np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    h = np.full(n, _FNV_BASIS, dtype=np.uint64)
    if n and lens.min() == lens.max():
        # equal-width fast path (sha-style keys): the packed value buffer
        # IS an (n, L) byte matrix — column walk, no index gathers
        width = int(lens[0])
        if width:
            block = data[offs[0]:offs[-1]].reshape(n, width)
            with np.errstate(over="ignore"):
                for p in range(width):
                    h = (h ^ block[:, p].astype(np.uint64)) * _FNV_PRIME
        return h
    order = np.argsort(-lens, kind="stable")
    starts_o, lens_o, h_o = starts[order], lens[order], h[order]
    maxlen = int(lens_o[0]) if n else 0
    n_active = n
    with np.errstate(over="ignore"):
        for p in range(maxlen):
            while n_active and lens_o[n_active - 1] <= p:
                n_active -= 1
            b = data[starts_o[:n_active] + p].astype(np.uint64)
            h_o[:n_active] = (h_o[:n_active] ^ b) * _FNV_PRIME
    h[order] = h_o
    return h


def _hash_numeric_array(col) -> np.ndarray:
    """64-bit mix of a numeric/bool column (splitmix64 finalizer)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, 0)
    arr = col.to_numpy(zero_copy_only=False)
    if arr.dtype.kind == "f":
        f = arr.astype(np.float64)
        f = np.where(np.isnan(f), 0.0, f)  # canonical NaN slot
        u = f.view(np.uint64)
    else:
        u = arr.astype(np.int64).view(np.uint64)
    with np.errstate(over="ignore"):
        u = (u ^ (u >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        u = (u ^ (u >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return u ^ (u >> np.uint64(31))


def hash_columns(keys_tbl: pa.Table) -> np.ndarray:
    """Deterministic (cross-process) 64-bit hash of one or more key
    columns, fully vectorized over the Arrow buffers.

    This runs once per batch in EVERY coarse-hash exchange (uniqueness,
    exact dedup, every grouped aggregate) — the round-2 version
    round-tripped through ``to_pandas()`` + ``hash_pandas_object``,
    which materializes a Python object per string cell; this one never
    leaves numpy.  A final splitmix64 mix ensures the LOW bits (used by
    the ``& (coarse-1)`` partitioner) avalanche."""
    h = np.full(keys_tbl.num_rows, _FNV_BASIS, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for name in keys_tbl.column_names:
            col = keys_tbl.column(name)
            typ = col.type
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                ch = _hash_string_array(col)
            elif (pa.types.is_integer(typ) or pa.types.is_floating(typ)
                  or pa.types.is_boolean(typ)):
                ch = _hash_numeric_array(col)
            else:  # rare key types (date, decimal, ...): deterministic
                ch = pd.util.hash_pandas_object(  # pandas fallback
                    col.to_pandas(), index=False).to_numpy().astype(np.uint64)
            h = (h ^ ch) * _FNV_PRIME
        h = (h ^ (h >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        h = (h ^ (h >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return h ^ (h >> np.uint64(31))


def _key_hash(keys_tbl: pa.Table) -> np.ndarray:
    """Deterministic (cross-process) 64-bit hash of the key columns."""
    return hash_columns(keys_tbl)


def grouped_aggregate(ds, keys: list[str], aggs: list[tuple[str, str, str]],
                      coarse: int = 1024, num_partitions: int | None = None):
    """Exact ``GROUP BY keys`` with aggs = [(col, op, alias)].

    ``op='count'`` counts rows (col ignored).  Returns a Dataset with
    columns keys + aliases.
    """
    from ..util import shuffle_partitions

    if num_partitions is None:
        num_partitions = shuffle_partitions()

    arrow_aggs = []
    local_names = list(keys)
    for col, op, alias in aggs:
        if op == "count":
            arrow_aggs.append(([], "count_all"))
        else:
            arrow_aggs.append((col, op))
        local_names.append(alias)

    def local(t: pa.Table) -> pa.Table:
        g = t.group_by(keys).aggregate(arrow_aggs)
        g = g.rename_columns(local_names)
        kh = _key_hash(g.select(keys))
        return g.append_column(
            "__coarse", pa.array((kh & np.uint64(coarse - 1)).astype(np.int64)))

    merge_ops = {alias: _MERGE_OP[op] for _, op, alias in aggs}

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.drop(columns="__coarse").groupby(keys, sort=False, dropna=False)
               .agg(merge_ops).reset_index())
        for _, op, alias in aggs:
            if op in ("sum", "count"):
                out[alias] = out[alias].astype("int64") \
                    if pd.api.types.is_integer_dtype(out[alias]) else out[alias]
        return out

    return (ds.map_batches(local, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=num_partitions)
            .map_groups(combine, batch_format="pandas"))
