"""Size-adaptive dimension attach: the broadcast-vs-shuffle join choice
for enriching a fact/aggregate dataset with columns from a dimension
table whose size is NOT known to be bounded.

nation/region are genuinely dimension-scale and may always broadcast;
``customer`` scales linearly with the fact tables (TPC-H: 15M rows at
sf100, far more at web scale), so an unconditional driver-side collect +
``ray.put`` of the customer table is the classic scale-killer.  This
stage applies the same guard as the pair↔signature join
(:func:`.dedup.join_pairs_with_signatures`):

- dimension materialized size <= ``broadcast_max_bytes``: collect once,
  ``ray.put`` sorted key + column arrays, vectorized searchsorted attach
  inside stateless map tasks (zero shuffle — the fast interactive plan);
- larger: NOTHING is collected driver-side — both sides co-locate
  through one coarse-hash exchange on the join key (the
  :func:`.dedup.coarse_mix` bucketing shared by the other large-large
  joins) and a vectorized pandas merge runs per coarse group.

Both plans return the same rows (order unspecified — compose with a
downstream sort/aggregate) and are pinned row-identical in
``tests/test_stages_misc.py``.

Contracts: the join key is integer-valued (cast to int64 on both sides);
the dimension side has UNIQUE join keys — a duplicated dim key would fan
out fact rows in both plans alike (standard dimensional-model contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# pandas NULLABLE dtypes per arrow type: all-miss left joins must not
# collapse a dim column to float64-NaN / object-None (whose arrow
# inference diverges across blocks)
_NULLABLE = {"string": "string", "large_string": "string",
             "int64": "Int64", "int32": "Int32", "float64": "Float64",
             "float32": "Float32", "bool": "boolean"}


def attach_dim_adaptive(fact_ds, fact_key: str, dim_ds, dim_key: str,
                        dim_cols: list[str], *, how: str = "left",
                        coarse: int = 1024,
                        broadcast_max_bytes: int = 256 << 20):
    """fact(fact_key, ...) ⟕ dim(dim_key, dim_cols) -> fact columns +
    ``dim_cols``.  ``how='left'`` keeps unmatched fact rows with null dim
    columns; ``how='inner'`` drops them (SQL inner-join semantics)."""
    if how not in ("left", "inner"):
        raise ValueError(f"attach_dim_adaptive: how={how!r}")

    mat = dim_ds.materialize()
    dim_schema = mat.schema()
    dim_types = {n: t for n, t in zip(dim_schema.names, dim_schema.types)}
    missing = [c for c in (dim_key, *dim_cols) if c not in dim_types]
    if missing:
        raise ValueError(f"attach_dim_adaptive: dim lacks {missing}")

    if (mat.size_bytes() or broadcast_max_bytes + 1) <= broadcast_max_bytes:
        return _attach_broadcast(fact_ds, fact_key, mat, dim_key, dim_cols,
                                 dim_types, how)
    return _attach_shuffle(fact_ds, fact_key, mat, dim_key, dim_cols,
                           dim_types, how, coarse)


def _attach_broadcast(fact_ds, fact_key, dim_mat, dim_key, dim_cols,
                      dim_types, how):
    import ray

    from ..util import collect_small_arrow, process_cached, ref_key

    tbl = collect_small_arrow(dim_mat)
    if tbl.num_columns == 0:  # empty dimension
        keys = np.empty(0, np.int64)
        cols = {c: np.empty(0, object) for c in dim_cols}
    else:
        keys = pc.cast(tbl.column(dim_key), pa.int64()).to_numpy()
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        cols = {c: tbl.column(c).to_numpy(zero_copy_only=False)[order]
                for c in dim_cols}
    ref = ray.put((keys, cols))

    class Attach:
        def __init__(self, r):
            self.keys, self.cols = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            fk = pc.cast(t.column(fact_key), pa.int64()).to_numpy()
            if len(self.keys) == 0:
                pos = np.zeros(len(fk), dtype=np.int64)
                hit = np.zeros(len(fk), dtype=bool)
            else:
                pos = np.searchsorted(self.keys, fk).clip(
                    max=len(self.keys) - 1)
                hit = self.keys[pos] == fk
            if how == "inner":
                t = t.filter(pa.array(hit))
                pos, hit = pos[hit], hit[hit]
            for c in dim_cols:
                vals = (np.where(hit, self.cols[c][pos], None)
                        if len(self.keys) else
                        np.full(t.num_rows, None, dtype=object))
                t = t.append_column(c, pa.array(vals, dim_types[c]))
            return t

    return fact_ds.map_batches(
        process_cached(Attach, (ref_key(ref), fact_key, how, *dim_cols),
                       ref),
        batch_format="pyarrow")


def _attach_shuffle(fact_ds, fact_key, dim_mat, dim_key, dim_cols,
                    dim_types, how, coarse):
    """Both sides exchange once on coarse(key); a vectorized pandas merge
    joins per coarse group.  Only the key + requested dim columns cross
    the wire on the dim side; fact rows ship their (already aggregated)
    columns.  Driver state: none."""
    from ..util import shuffle_partitions
    from .dedup import coarse_mix

    fact_schema = fact_ds.schema()
    fact_names = list(fact_schema.names)
    fact_types = {n: t for n, t in zip(fact_schema.names,
                                       fact_schema.types)}
    out_names = fact_names + list(dim_cols)
    dim_pd = {c: _NULLABLE.get(str(dim_types[c])) for c in dim_cols}

    def fact_side(t: pa.Table) -> pa.Table:
        fk = pc.cast(t.column(fact_key), pa.int64())
        arrays = {n: t.column(n) for n in fact_names}
        for c in dim_cols:
            arrays[c] = pa.nulls(t.num_rows, dim_types[c])
        arrays["__side"] = pa.array(np.ones(t.num_rows, np.int64))
        arrays["__coarse"] = pa.array(coarse_mix(fk.to_numpy(), coarse - 1),
                                      pa.int64())
        return pa.table(arrays)

    def dim_side(t: pa.Table) -> pa.Table:
        dk = pc.cast(t.column(dim_key), pa.int64())
        arrays = {}
        for n in fact_names:
            arrays[n] = (dk if n == fact_key
                         else pa.nulls(t.num_rows, fact_types[n]))
        for c in dim_cols:
            arrays[c] = t.column(c)
        arrays["__side"] = pa.array(np.zeros(t.num_rows, np.int64))
        arrays["__coarse"] = pa.array(coarse_mix(dk.to_numpy(), coarse - 1),
                                      pa.int64())
        return pa.table(arrays)

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        f = g.loc[g["__side"] == 1, fact_names]
        d = g.loc[g["__side"] == 0, [fact_key, *dim_cols]]
        out = f.merge(d, on=fact_key, how=how)[out_names]
        for c, pd_dtype in dim_pd.items():  # stabilize all-miss blocks
            if pd_dtype is not None:
                out[c] = out[c].astype(pd_dtype)
        return out

    u = (fact_ds.map_batches(fact_side, batch_format="pyarrow")
         .union(dim_mat.map_batches(dim_side, batch_format="pyarrow")))
    return (u.groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(join_group, batch_format="pandas"))


def colocate_join(left_ds, right_ds, left_key: str, right_key: str, *,
                  how: str = "inner", coarse: int = 1024,
                  schemas: tuple[pa.Schema, pa.Schema] | None = None):
    """Large-large equi-join by coarse-hash co-location: when BOTH sides
    scale with the corpus (e.g. order-grain partials x order-grain
    partials), neither may broadcast — both exchange ONCE on
    ``coarse_mix(key)`` and a vectorized pandas merge runs per coarse
    bucket.  No driver state, no per-join aggregator actors (Ray's
    ``Dataset.join`` spins hash-shuffle actors costing seconds per join
    and rejects the schema-less empty blocks earlier exchanges emit).

    Unlike :func:`attach_dim_adaptive` there is no uniqueness contract
    on either side (general m:n).  Keys are integer-valued (cast to
    int64).  Output columns: left columns, then right columns minus
    ``right_key`` (the key survives under the LEFT name); the two
    sides' non-key column names must be disjoint.  Row order is
    unspecified — compose with a downstream sort/aggregate.

    Pass ``schemas=(left, right)`` when a side may be EMPTY with no
    inferable schema (an upstream inner gate can kill every row on a
    small corpus): ``Dataset.schema()`` returns None there, and the
    pipeline must still present typed output.
    """
    if how != "inner":
        raise ValueError(f"colocate_join: how={how!r} (inner only)")

    from ..util import shuffle_partitions
    from .dedup import coarse_mix

    lsch, rsch = schemas if schemas is not None else (
        left_ds.schema(), right_ds.schema())
    left_names = list(lsch.names)
    right_out = [n for n in rsch.names if n != right_key]
    clash = set(left_names) & set(right_out)
    if clash:
        raise ValueError(f"colocate_join: column clash {sorted(clash)}")

    def _pa_type(t):
        # Dataset.schema() over pandas blocks reports numpy dtypes
        if isinstance(t, pa.DataType):
            return t
        if t == np.dtype("O"):
            return pa.string()
        return pa.from_numpy_dtype(t)

    types = {n: _pa_type(t) for n, t in zip(lsch.names, lsch.types)}
    types.update({n: _pa_type(t) for n, t in zip(rsch.names, rsch.types)})
    out_names = left_names + right_out
    out_pd = {n: _NULLABLE.get(str(types[n])) for n in out_names}

    def left_side(t: pa.Table) -> pa.Table:
        lk = pc.cast(t.column(left_key), pa.int64())
        arrays = {n: (lk if n == left_key else t.column(n))
                  for n in left_names}
        for c in right_out:
            arrays[c] = pa.nulls(t.num_rows, types[c])
        arrays["__side"] = pa.array(np.ones(t.num_rows, np.int64))
        arrays["__coarse"] = pa.array(coarse_mix(lk.to_numpy(), coarse - 1),
                                      pa.int64())
        return pa.table(arrays)

    def right_side(t: pa.Table) -> pa.Table:
        rk = pc.cast(t.column(right_key), pa.int64())
        arrays = {}
        for n in left_names:
            arrays[n] = (rk if n == left_key
                         else pa.nulls(t.num_rows, types[n]))
        for c in right_out:
            arrays[c] = t.column(c)
        arrays["__side"] = pa.array(np.zeros(t.num_rows, np.int64))
        arrays["__coarse"] = pa.array(coarse_mix(rk.to_numpy(), coarse - 1),
                                      pa.int64())
        return pa.table(arrays)

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        lt = g.loc[g["__side"] == 1, left_names]
        rt = g.loc[g["__side"] == 0, [left_key, *right_out]]
        out = lt.merge(rt, on=left_key, how="inner")[out_names]
        # the union pads each side with typed nulls, which pandas blocks
        # upcast to float64/object; restore nullable dtypes (inner join
        # => no join-induced nulls, per-row values exact under 2^53)
        for c, pd_dtype in out_pd.items():
            if pd_dtype is not None:
                out[c] = out[c].astype(pd_dtype)
        return out

    u = (left_ds.map_batches(left_side, batch_format="pyarrow")
         .union(right_ds.map_batches(right_side, batch_format="pyarrow")))
    return (u.groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(join_group, batch_format="pandas"))
