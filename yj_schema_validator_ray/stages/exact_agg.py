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

_MERGE_OP = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _key_hash(keys_tbl: pa.Table) -> np.ndarray:
    """Deterministic (cross-process) 64-bit hash of the key columns."""
    return pd.util.hash_pandas_object(
        keys_tbl.to_pandas(), index=False).to_numpy().astype(np.uint64)


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
