"""Exact distributed quantiles (global or per-group) over a float64
column — the "percentile report" a data-quality layer needs, computed
without ever sorting the full dataset or collecting row data on the
driver.

Plan (classic two-phase rank selection):

1. ONE streaming pass histograms values into order-preserving radix
   buckets (the IEEE-754 monotone bit trick: flip all bits of negatives,
   set the sign bit of positives — unsigned order == numeric order — and
   keep the top ``bucket_bits``).  Per-batch partials pre-aggregate, so
   the exchange and the driver only ever see (group, bucket, count) rows
   — bounded by the number of NON-EMPTY buckets, not by data size.
2. The driver (holding only the histogram) locates, per group and
   quantile q, the bucket containing rank ``ceil(q * n)`` and the
   residual in-bucket rank.
3. A second pruned pass filters to target buckets only (a broadcast-set
   membership test per batch) and each (group, bucket) partition selects
   its order statistics with ``np.partition`` — one bucket's rows, never
   the dataset, is the memory bound (with ``bucket_bits=12`` and smooth
   data that is ~1/4096 of a group; pathological single-value groups
   degrade to the group size, which a production run would recurse on).

The selected value is an actual element (``quantile_disc`` semantics,
rank = ceil(q*n), 1-indexed) — no interpolation arithmetic, so the
result is bit-identical to the DuckDB window-function oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

DEFAULT_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


def _radix_bucket(values: np.ndarray, bucket_bits: int) -> np.ndarray:
    """Order-preserving bucket index of float64 values."""
    u = values.astype(np.float64).view(np.uint64)
    neg = (u >> np.uint64(63)).astype(bool)
    u = np.where(neg, ~u, u | np.uint64(1 << 63))
    return (u >> np.uint64(64 - bucket_bits)).astype(np.int64)


def grouped_exact_quantiles(ds, group_col: str, value_col: str,
                            qs=DEFAULT_QS, bucket_bits: int = 12,
                            max_exact_groups: int = 20_000):
    """(group, quantile, value) — the EXACT ceil(q*n)-th smallest value
    per group.  ``ds`` streams twice (pass 1 histogram, pass 3 pruned
    gather); materialize upstream if it is expensive to recompute.

    Driver-state bound: the exact plan holds a ``targets`` dict and a
    group->code map of O(groups x len(qs)) entries on the driver, and
    the pruned gather funnels through <= 8 reducers — right for
    low-cardinality report groups (event types, languages, shards).
    When the histogram shows more than ``max_exact_groups`` distinct
    groups the call auto-routes to the mergeable per-group sketch
    (:func:`grouped_quantile_sketch`, O(groups x k) WORKER memory,
    ~1/k rank error), returning the same (group, quantile, value)
    schema — pass ``max_exact_groups=None`` to force the exact plan."""
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate

    def hist_partial(t: pa.Table) -> pa.Table:
        b = _radix_bucket(t.column(value_col).to_numpy(), bucket_bits)
        return pa.table({group_col: t.column(group_col),
                         "bucket": pa.array(b, pa.int64())})

    # the histogram exchange moves (group, bucket, n) partials only —
    # a handful of rows per block — so a few reducers beat the default
    # cores-proportional count (each extra partition is ~fixed sort cost)
    hist = grouped_aggregate(
        ds.map_batches(hist_partial, batch_format="pyarrow"),
        [group_col, "bucket"], [("", "count", "n")],
        num_partitions=min(8, shuffle_partitions())).to_pandas()

    # driver: locate (bucket, residual rank) per (group, q) — histogram
    # rows only, no row data
    targets: dict = {}  # (group, bucket) -> list of (q, in-bucket rank)
    if group_col not in hist.columns:  # empty input -> schema-less blocks
        hist = pd.DataFrame({group_col: [], "bucket": [], "n": []})
    if (max_exact_groups is not None
            and hist[group_col].nunique() > max_exact_groups):
        import ray.data

        sk = grouped_quantile_sketch(ds, group_col, value_col, qs=qs)
        return ray.data.from_pandas(
            sk.rename(columns={"value_est": "value"}))
    for grp, g in hist.groupby(group_col, sort=False):
        g = g.sort_values("bucket")
        counts = g["n"].to_numpy()
        cum = np.cumsum(counts)
        n = int(cum[-1])
        for q in qs:
            r = max(1, int(np.ceil(q * n)))
            bi = int(np.searchsorted(cum, r))
            bucket = int(g["bucket"].to_numpy()[bi])
            before = int(cum[bi - 1]) if bi else 0
            targets.setdefault((grp, bucket), []).append((q, r - before))

    if not targets:
        import ray.data

        return ray.data.from_pandas(pd.DataFrame(
            {group_col: pd.Series(dtype="object"),
             "quantile": pd.Series(dtype="float64"),
             "value": pd.Series(dtype="float64")}))

    # vectorized membership: encode each wanted (group, bucket) as
    # code << bucket_bits | bucket with a tiny group->code dict; rows
    # test via np.isin on the combined int key — no per-row Python
    group_code = {g: i for i, g in enumerate({g for g, _ in targets})}
    wanted_keys = np.array(
        [(group_code[g] << bucket_bits) | b for g, b in targets],
        dtype=np.int64)

    def prune(t: pa.Table) -> pa.Table:
        grp = pd.Series(t.column(group_col).to_pandas())
        code = grp.map(group_code).fillna(-1).to_numpy(dtype=np.int64)
        vals = t.column(value_col).to_numpy()
        b = _radix_bucket(vals, bucket_bits)
        key = (code << bucket_bits) | b
        keep = (code >= 0) & np.isin(key, wanted_keys)
        t = t.append_column("bucket", pa.array(b, pa.int64()))
        return t.filter(pa.array(keep))

    def select(g: pd.DataFrame) -> pd.DataFrame:
        grp = g[group_col].iloc[0]
        bucket = int(g["bucket"].iloc[0])
        vals = g[value_col].to_numpy()
        out_q, out_v = [], []
        for q, rank in targets[(grp, bucket)]:
            v = np.partition(vals, rank - 1)[rank - 1]
            out_q.append(q)
            out_v.append(float(v))
        return pd.DataFrame({group_col: [grp] * len(out_q),
                             "quantile": out_q, "value": out_v})

    return (ds.map_batches(prune, batch_format="pyarrow")
            .groupby([group_col, "bucket"],
                     num_partitions=min(len(targets), 8, shuffle_partitions()))
            .map_groups(select, batch_format="pandas")
            .map_batches(lambda t: t.select([group_col, "quantile", "value"]),
                         batch_format="pyarrow"))


def _compact(vals: np.ndarray, wts: np.ndarray, k: int):
    """Compress weighted points to <= k centroids preserving the
    cumulative-weight profile (t-digest-style uniform compaction)."""
    order = np.argsort(vals, kind="stable")
    v, w = vals[order], wts[order]
    if len(v) <= k:
        return v, w
    cw = np.cumsum(w)
    total = cw[-1]
    edges = np.linspace(0.0, float(total), k + 1)
    idx = np.searchsorted(cw, edges[1:-1], side="left")
    starts = np.concatenate(([0], idx))
    ends = np.concatenate((idx, [len(v)]))
    out_v, out_w = [], []
    for s, e in zip(starts, ends):
        if e <= s:
            continue
        seg_w = w[s:e]
        sw = seg_w.sum()
        mid = int(np.searchsorted(np.cumsum(seg_w), sw / 2.0))
        out_v.append(v[s:e][min(mid, e - s - 1)])
        out_w.append(sw)
    return np.asarray(out_v, np.float64), np.asarray(out_w, np.float64)


def approx_quantile_sketch(ds, value_col: str, qs=DEFAULT_QS, k: int = 256):
    """ONE-pass approximate quantiles via a mergeable weighted-centroid
    sketch (uniform-rank compaction, the t-digest family): each batch
    compresses its sorted values to <= ``k`` (value, weight) centroids;
    centroids merge associatively through a two-level tree (per-partition
    compaction, then one final compaction), so memory is O(k) per worker
    and only ~k rows ever reach the driver.  Rank error is ~1/k per
    compaction level (tested <= 2% at k=256).

    The streaming counterpart of :func:`grouped_exact_quantiles` — use
    the sketch when a second pruned pass over the data is too expensive
    (e.g. the input is not re-readable), the exact variant otherwise.
    Returns a pandas DataFrame (quantile, value_est).
    """
    from ..util import shuffle_partitions

    def partial(t: pa.Table) -> pa.Table:
        vals = t.column(value_col).to_numpy().astype(np.float64)
        v, w = _compact(vals, np.ones(len(vals)), k)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64())})

    def merge(t: pa.Table) -> pa.Table:
        v, w = _compact(t.column("v").to_numpy(),
                        t.column("w").to_numpy(), k)
        return pa.table({"v": pa.array(v, pa.float64()),
                         "w": pa.array(w, pa.float64())})

    sk = (ds.map_batches(partial, batch_format="pyarrow")
          .repartition(min(8, shuffle_partitions()))
          .map_batches(merge, batch_format="pyarrow")
          .repartition(1)
          .map_batches(merge, batch_format="pyarrow")).take_all()
    v = np.array([r["v"] for r in sk])
    w = np.array([r["w"] for r in sk])
    order = np.argsort(v, kind="stable")
    v, w = v[order], w[order]
    cw = np.cumsum(w)
    total = cw[-1] if len(cw) else 0.0
    out = []
    for q in qs:
        i = int(np.searchsorted(cw, q * total, side="left"))
        out.append((q, float(v[min(i, len(v) - 1)]) if len(v) else float("nan")))
    return pd.DataFrame({"quantile": [q for q, _ in out],
                         "value_est": [x for _, x in out]})


def grouped_quantile_sketch(ds, group_col: str, value_col: str,
                            qs=DEFAULT_QS, k: int = 128):
    """Per-group one-pass approximate quantiles: the same mergeable
    centroid sketch as :func:`approx_quantile_sketch`, compacted
    group-wise at every level (memory O(groups x k) per worker, ~k rows
    per group on the driver).  Returns (group, quantile, value_est)."""
    from ..util import shuffle_partitions

    def compact_frame(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({group_col: pd.Series(dtype="object"),
                                 "v": pd.Series(dtype="float64"),
                                 "w": pd.Series(dtype="float64")})
        # groups already at <= k centroids pass through vectorized
        # (compaction is a no-op for them) — the per-group Python loop
        # only ever touches oversized groups, so a high-cardinality
        # column with modest per-group data costs one sort, not one
        # DataFrame construction per group
        sizes = df.groupby(group_col, sort=False)["v"].transform("size")
        big_mask = (sizes > k).to_numpy()
        out = [df[~big_mask]]
        for g, part in df[big_mask].groupby(group_col, sort=False):
            v, w = _compact(part["v"].to_numpy(), part["w"].to_numpy(), k)
            out.append(pd.DataFrame({group_col: g, "v": v, "w": w}))
        return pd.concat(out, ignore_index=True)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return compact_frame(pd.DataFrame({
            group_col: df[group_col],
            "v": df[value_col].astype(np.float64),
            "w": np.ones(len(df))}))

    sk = (ds.map_batches(partial, batch_format="pandas")
          .repartition(min(8, shuffle_partitions()))
          .map_batches(compact_frame, batch_format="pandas")
          .repartition(1)
          .map_batches(compact_frame, batch_format="pandas")).to_pandas()

    rows = []
    for g, part in sk.groupby(group_col, sort=False):
        order = np.argsort(part["v"].to_numpy(), kind="stable")
        v = part["v"].to_numpy()[order]
        w = part["w"].to_numpy()[order]
        cw = np.cumsum(w)
        total = cw[-1] if len(cw) else 0.0
        for q in qs:
            i = int(np.searchsorted(cw, q * total, side="left"))
            rows.append((g, q, float(v[min(i, len(v) - 1)])
                         if len(v) else float("nan")))
    return pd.DataFrame({group_col: [g for g, _, _ in rows],
                         "quantile": [q for _, q, _ in rows],
                         "value_est": [x for _, _, x in rows]})


def grouped_exact_quantiles_sql(table: str, group_col: str, value_col: str,
                                qs=DEFAULT_QS) -> str:
    """DuckDB oracle: rank = ceil(q*n) per group via window functions
    (the exact element, no interpolation)."""
    qlist = ", ".join(str(q) for q in qs)
    return f"""
WITH s AS (
  SELECT {group_col}, {value_col} AS value,
         row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS r,
         count(*) OVER (PARTITION BY {group_col}) AS n
  FROM {table}
),
q AS (SELECT CAST(unnest([{qlist}]) AS DOUBLE) AS quantile)
-- CAST to DOUBLE: DuckDB infers DECIMAL for 0.25-style literals, and
-- DECIMAL rank arithmetic (exact 0.99*100=99) would disagree with the
-- engine's IEEE-double ceil(0.99*100)=100
SELECT s.{group_col}, q.quantile, s.value
FROM q JOIN s ON s.r = CAST(ceil(q.quantile * s.n) AS BIGINT)"""


def lineitem_weighted_median(sf_dir: str):
    """Global WEIGHTED median: the extended-price cents value at which
    the running l_quantity weight (ascending by price, ties by a
    stable row id) first reaches half the total — inventory's "price
    point where half the unit volume sits".  Output is the one
    crossing row: (median_price_cents, cum_weight_at, total_weight),
    found as cum*2 >= tot AND (cum - w)*2 < tot in exact integers.

    Shape: rides :func:`~.rank.budget_select`'s two-phase histogram
    prefix sum in ASCENDING key order (budget = +inf keeps every row's
    inclusive cum), then a vectorized crossing filter — a global
    weighted quantile with NO global sort; driver state is
    distinct-price-sized and guarded.
    """
    import ray.data

    from ..util import collect_small_arrow
    from .rank import budget_select

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_linenumber",
                                        "l_extendedprice", "l_quantity"])

    def rows(t: pa.Table) -> pa.Table:
        price = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        qty = pc.cast(pc.round(pc.multiply(
            t.column("l_quantity"), pa.scalar(100.0))), pa.int64())
        rid = pc.add(pc.multiply(pc.cast(t.column("l_orderkey"),
                                         pa.int64()),
                                 pa.scalar(8, pa.int64())),
                     pc.cast(t.column("l_linenumber"), pa.int64()))
        return pa.table({"rid": rid, "price_c": price, "qty_c": qty})

    cum = budget_select(li.map_batches(rows, batch_format="pyarrow"),
                        key_col="price_c", id_col="rid",
                        weight_col="qty_c", budget=(1 << 62),
                        descending=False)

    tot = int(collect_small_arrow(cum.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(pc.sum(t.column("qty_c")).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow")).to_pandas()["s"].sum())

    def crossing(t: pa.Table) -> pa.Table:
        c = t.column("cum").to_numpy()
        w = t.column("qty_c").to_numpy()
        m = (c * 2 >= tot) & ((c - w) * 2 < tot)
        sel = t.filter(pa.array(m))
        return pa.table({
            "median_price_cents": sel.column("price_c"),
            "cum_weight_at": sel.column("cum"),
            "total_weight": pa.array([tot] * sel.num_rows, pa.int64())})

    return cum.map_batches(crossing, batch_format="pyarrow")


def lineitem_weighted_median_sql() -> str:
    return """
WITH r AS (
  SELECT CAST(round(l_extendedprice * 100.0) AS BIGINT) AS price_c,
         CAST(round(l_quantity * 100.0) AS BIGINT) AS qty_c,
         l_orderkey * 8 + l_linenumber AS rid
  FROM lineitem),
c AS (
  SELECT price_c, qty_c,
         sum(qty_c) OVER (ORDER BY price_c, rid
                          ROWS UNBOUNDED PRECEDING) AS cum,
         sum(qty_c) OVER () AS tot
  FROM r)
SELECT price_c AS median_price_cents, CAST(cum AS BIGINT)
         AS cum_weight_at,
       CAST(tot AS BIGINT) AS total_weight
FROM c WHERE cum * 2 >= tot AND (cum - qty_c) * 2 < tot"""
