"""Warehouse-calendar / linear-algebra OLAP waves 12-14 — split from ``pipelines/olap.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``olap`` module re-exports everything, so the import surface —
``from ..pipelines import olap as OL`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


TTL_WATERMARK_US = 1_706_572_800_000_000  # 2024-01-30T00:00:00Z


def events_ttl_expiry(sf_dir: str, ttl_days: int = 7, coarse: int = 1024):
    """Keyed-state TTL/GC accounting (the streaming-state eviction
    audit): for every (user, type) stream, its state is LIVE at the
    watermark if the last event arrived within ``ttl_days``, else
    EXPIRED — report live/expired stream counts per type.  This is the
    bookkeeping a stateful streaming job runs to size its keyed state
    under eviction.

    Shape: per-batch argmax partials (max ts per (user, type) — one
    row per stream per block), one keyed exchange merges maxima, the
    classify is a vectorized compare; output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    cutoff = TTL_WATERMARK_US - ttl_days * 86_400_000_000

    def partials(t: pa.Table) -> pa.Table:
        g = (pa.table({"user_id": pc.cast(t.column("user_id"), pa.int64()),
                       "event_type": t.column("event_type"),
                       "ts_us": pc.cast(t.column("ts"), pa.int64())})
             .group_by(["user_id", "event_type"])
             .aggregate([("ts_us", "max")])
             .rename_columns(["user_id", "event_type", "last_us"]))
        keys = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()))

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "n_live": pd.Series(dtype="int64"),
                "n_expired": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = (g.groupby(["user_id", "event_type"], as_index=False)
               ["last_us"].max())
        live = (per["last_us"] >= cutoff)
        out = pd.DataFrame({"event_type": per["event_type"],
                            "n_live": live.astype("int64"),
                            "n_expired": (~live).astype("int64")})
        return out.groupby("event_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    parts = (ev.map_batches(partials, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type"],
                             [("n_live", "sum", "n_live"),
                              ("n_expired", "sum", "n_expired")])


def events_ttl_expiry_sql(ttl_days: int = 7) -> str:
    cutoff = TTL_WATERMARK_US - ttl_days * 86_400_000_000
    return f"""
WITH per AS (
  SELECT user_id, event_type, max(epoch_us(ts)) AS last_us
  FROM events GROUP BY user_id, event_type)
SELECT event_type,
       CAST(count(*) FILTER (WHERE last_us >= {cutoff}) AS BIGINT)
         AS n_live,
       CAST(count(*) FILTER (WHERE last_us < {cutoff}) AS BIGINT)
         AS n_expired
FROM per GROUP BY event_type"""


def events_dense_matrix(sf_dir: str):
    """Dense (day x type) count matrix INCLUDING explicit zero cells —
    the cross-join-spine fill that charting/ML feature layers need
    (sparse groupby output leaves holes; the spine makes absence a
    row).  Spine = distinct days x distinct types, both derived from
    the data itself.

    Shape: one (day, type) count exchange (sparse, data-sized); the
    spine fill runs on the collected day x type domain (calendar x
    type-vocabulary bounded at any scale).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"day": day, "event_type": t.column("event_type")})

    sparse = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["day", "event_type"], [("", "count", "n")])).to_pandas()
    days = sorted(sparse["day"].unique())
    types = sorted(sparse["event_type"].unique())
    spine = pd.MultiIndex.from_product([days, types],
                                       names=["day", "event_type"])
    dense = (sparse.set_index(["day", "event_type"])
             .reindex(spine, fill_value=0).reset_index())
    dense["n"] = dense["n"].astype("int64")
    return dense


def events_dense_matrix_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT strftime(date_trunc('day', ts), '%Y-%m-%d')
                    AS day FROM events),
t AS (SELECT DISTINCT event_type FROM events),
c AS (SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
             event_type, count(*) AS n
      FROM events GROUP BY 1, 2)
SELECT d.day, t.event_type,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n
FROM d CROSS JOIN t
LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type"""


def supplier_hhi_by_region(sf_dir: str):
    """Market-concentration audit: per region, the exact integer
    Herfindahl-Hirschman numerator over nations' supplier counts —
    HHI = sum(share_i^2) = (sum n_i^2) / N^2, so reporting
    (n_suppliers = N, hhi_num = sum n_i^2) keeps the certificate
    integer and the fp ratio downstream — the grouped companion of the
    Gini concentration audit.

    Shape: one (nation)-domain count exchange; region fold over the
    25-nation table driver-side (the dimension is constant-sized).
    """
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(),
                   nat.column("n_regionkey").to_pylist()))

    def rows(t: pa.Table) -> pa.Table:
        return pa.table({"n_nationkey": pc.cast(t.column("s_nationkey"),
                                                pa.int64())})

    per_nation = collect_small_arrow(grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_nationkey"])
        .map_batches(rows, batch_format="pyarrow"),
        ["n_nationkey"], [("", "count", "n")])).to_pandas()
    per_nation["region"] = per_nation["n_nationkey"].map(
        lambda v: n2r[int(v)])
    out = (per_nation.assign(n2=lambda d: d["n"].astype("int64") ** 2)
           .groupby("region", as_index=False)
           .agg(n_nations=("n", "size"), n_suppliers=("n", "sum"),
                hhi_num=("n2", "sum")))
    out = out.rename(columns={"region": "r_regionkey"})
    for c in ("r_regionkey", "n_nations", "n_suppliers", "hhi_num"):
        out[c] = out[c].astype("int64")
    return out


def supplier_hhi_by_region_sql() -> str:
    return """
WITH pn AS (
  SELECT n.n_regionkey, s.s_nationkey, count(*) AS n
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
  GROUP BY n.n_regionkey, s.s_nationkey)
SELECT CAST(n_regionkey AS BIGINT) AS r_regionkey,
       CAST(count(*) AS BIGINT) AS n_nations,
       CAST(sum(n) AS BIGINT) AS n_suppliers,
       CAST(sum(n * n) AS BIGINT) AS hhi_num
FROM pn GROUP BY n_regionkey"""


def customer_peak_open_orders(sf_dir: str, coarse: int = 1024):
    """Per-customer PEAK concurrency: the maximum number of that
    customer's orders simultaneously open (open = [orderdate day,
    last ship day]), reported as a (peak -> n_customers) histogram —
    the per-entity companion of the global backlog series
    (:func:`orders_open_per_day`), and the classic interval max-overlap
    sweep run inside each key group.

    Shape: lineitem ships (orderkey, max ship) partials to the orders
    side through one orderkey exchange; each order then emits two
    (custkey, day, ±1) boundary rows into a custkey exchange where the
    per-customer sweep is one lexsort + cumsum + segment max; output
    is peak-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        return pa.table({
            "okey": keys,
            "v": pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                           pa.scalar(DAY_US, pa.int64())),
            "cust": pc.cast(t.column("o_custkey"), pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                       "ship": pc.divide(
                           pc.cast(t.column("l_shipdate"), pa.int64()),
                           pa.scalar(DAY_US, pa.int64()))})
             .group_by(["okey"]).aggregate([("ship", "max")])
             .rename_columns(["okey", "v"]))
        kk = g.column("okey")
        return pa.table({
            "okey": kk, "v": g.column("v"),
            "cust": pa.array(np.zeros(g.num_rows, np.int64)),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def boundaries(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"cust": pd.Series(dtype="int64"),
                "day": pd.Series(dtype="int64"),
                "d": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 0).any():
            return pd.DataFrame(cols)
        o = (g.loc[g["side"] == 0, ["okey", "v", "cust"]]
             .rename(columns={"v": "start"}))
        ms = (g.loc[g["side"] == 1, ["okey", "v"]]
              .groupby("okey", as_index=False).max()
              .rename(columns={"v": "close"}))
        j = o.merge(ms, on="okey", how="inner")  # orders with lineitems
        # close can precede start in this synthetic corpus: the open
        # interval is [min(start, close), max(start, close)]
        lo = np.minimum(j["start"].to_numpy(), j["close"].to_numpy())
        hi = np.maximum(j["start"].to_numpy(), j["close"].to_numpy())
        return pd.DataFrame({
            "cust": np.concatenate([j["cust"].to_numpy()] * 2),
            "day": np.concatenate([lo, hi + 1]),
            "d": np.concatenate([np.ones(len(j), np.int64),
                                 -np.ones(len(j), np.int64)])})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"peak_open": pd.Series(dtype="int64"),
                "n_customers": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        agg = (g.groupby(["cust", "day"], as_index=False)["d"].sum()
               .sort_values(["cust", "day"], kind="mergesort"))
        cust = agg["cust"].to_numpy()
        d = agg["d"].to_numpy()
        cum = np.cumsum(d)
        starts = np.concatenate(([0], np.flatnonzero(
            cust[1:] != cust[:-1]) + 1))
        base = np.repeat(np.concatenate(([0], cum[starts[1:] - 1])),
                         np.diff(np.concatenate((starts, [len(d)]))))
        within = cum - base
        peak = pd.DataFrame({"cust": cust, "w": within}) \
            .groupby("cust")["w"].max()
        r = (peak.value_counts().rename_axis("peak_open")
             .reset_index(name="n_customers")
             .astype({"peak_open": "int64", "n_customers": "int64"}))
        return r

    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey",
                                        "o_orderdate"])
         .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate"])
          .map_batches(li_side, batch_format="pyarrow"))
    b = (o.union(li)
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(boundaries, batch_format="pandas"))

    def add_cust_coarse(t: pa.Table) -> pa.Table:
        from ..stages.dedup import coarse_mix as cm

        keys = pc.cast(t.column("cust"), pa.int64())
        return t.append_column(
            "__coarse2", pa.array(cm(keys.to_numpy(), coarse - 1),
                                  pa.int64()))

    parts = (b.map_batches(add_cust_coarse, batch_format="pyarrow")
             .groupby("__coarse2", num_partitions=shuffle_partitions())
             .map_groups(sweep, batch_format="pandas"))
    return grouped_aggregate(parts, ["peak_open"],
                             [("n_customers", "sum", "n_customers")])


def customer_peak_open_orders_sql() -> str:
    return """
WITH ms AS (SELECT l_orderkey,
                   CAST(epoch_us(max(l_shipdate)) // 86400000000
                        AS BIGINT) AS close
            FROM lineitem GROUP BY l_orderkey),
iv AS (
  SELECT o.o_custkey AS cust,
         least(CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT),
               ms.close) AS lo,
         greatest(CAST(epoch_us(o.o_orderdate) // 86400000000
                       AS BIGINT), ms.close) AS hi
  FROM orders o JOIN ms ON ms.l_orderkey = o.o_orderkey),
b AS (
  SELECT cust, lo AS day, 1 AS d FROM iv
  UNION ALL SELECT cust, hi + 1, -1 FROM iv),
s AS (SELECT cust, day, sum(d) AS d FROM b GROUP BY cust, day),
c AS (SELECT cust,
             sum(d) OVER (PARTITION BY cust ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS open
      FROM s),
p AS (SELECT cust, CAST(max(open) AS BIGINT) AS peak_open
      FROM c GROUP BY cust)
SELECT peak_open, CAST(count(*) AS BIGINT) AS n_customers
FROM p GROUP BY peak_open"""


FISCAL_ANCHOR_DAY = 9125  # 1994-12-26 (Monday), BEFORE the data min:
#   weeks stay non-negative, where numpy floor-div and DuckDB's
#   truncating // agree (they diverge on negatives)
_F445_CUM = (4, 8, 13, 17, 21, 26, 30, 34, 39, 43, 47, 52)


def orders_fiscal_445(sf_dir: str):
    """4-4-5 fiscal-calendar rollup: every order date maps to the
    retail fiscal calendar (52-week years anchored Monday 1994-12-26,
    one week before the corpus' first order so week numbers stay
    non-negative — numpy floor division and DuckDB's truncating //
    only agree there;
    each quarter = 4+4+5 weeks) with PURE INTEGER day arithmetic —
    week = (epoch_day - anchor) // 7, fiscal_year = week // 52, and
    the period is the searchsorted position of week-in-year against
    the cumulative (4,8,13,...,52) boundaries — then revenue
    aggregates per (fiscal_year, fiscal_period).  The calendar logic
    finance warehouses need and civil-calendar date functions can't
    express.

    Shape: zero-shuffle per-batch mapping + period-domain partials;
    one tiny exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    DAY_US = 86_400_000_000
    cum = np.array(_F445_CUM, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        day = (pc.cast(t.column("o_orderdate"), pa.int64()).to_numpy()
               // DAY_US)
        week = (day - FISCAL_ANCHOR_DAY) // 7
        fy = week // 52
        wiy = week - fy * 52
        period = np.searchsorted(cum, wiy, side="right") + 1
        cents = pc.cast(pc.round(pc.multiply(
            t.column("o_totalprice"), pa.scalar(100.0))),
            pa.int64()).to_numpy()
        g = (pa.table({"fiscal_year": pa.array(fy, pa.int64()),
                       "fiscal_period": pa.array(period.astype(np.int64)),
                       "n_orders": pa.array(np.ones(len(fy), np.int64)),
                       "revenue_cents": pa.array(cents, pa.int64())})
             .group_by(["fiscal_year", "fiscal_period"])
             .aggregate([("n_orders", "sum"), ("revenue_cents", "sum")])
             .rename_columns(["fiscal_year", "fiscal_period",
                              "n_orders", "revenue_cents"]))
        return g

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderdate", "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["fiscal_year", "fiscal_period"],
        [("n_orders", "sum", "n_orders"),
         ("revenue_cents", "sum", "revenue_cents")])


def orders_fiscal_445_sql() -> str:
    b = ", ".join(f"({i + 1}, {c})" for i, c in enumerate(_F445_CUM))
    return f"""
WITH bounds(p, cum) AS (VALUES {b}),
d AS (
  SELECT (epoch_us(o_orderdate) // 86400000000
          - {FISCAL_ANCHOR_DAY}) // 7 AS week,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders),
m AS (
  SELECT week // 52 AS fiscal_year,
         week - (week // 52) * 52 AS wiy, cents
  FROM d),
p AS (
  SELECT fiscal_year,
         (SELECT min(p) FROM bounds WHERE m.wiy < cum) AS fiscal_period,
         cents
  FROM m)
SELECT CAST(fiscal_year AS BIGINT) AS fiscal_year,
       CAST(fiscal_period AS BIGINT) AS fiscal_period,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(cents) AS BIGINT) AS revenue_cents
FROM p GROUP BY fiscal_year, fiscal_period"""


def embedding_gram_matrix(emb_ds):
    """Exact-integer PCA sufficient statistic: the Gram matrix
    G = sum_v q_v q_v^T over the 1e-6-quantized embedding components,
    upper triangle as (dim_i <= dim_j, gram_q, n_vecs) rows — the
    mergeable second-moment matrix whose eigendecomposition (fp,
    downstream) IS principal component analysis; covariance follows by
    subtracting the centroid outer product (also exact via
    ``embedding_centroids``).

    Shape: per batch ONE int64 ``q.T @ q`` matmul collapses the (n, d)
    block to the constant (d, d) partial — vectors never reach the
    exchange and the merge is elementwise integer addition.  Entries
    fit int64 up to ~9e6 vectors per 1e12-quantized product; the
    HUGEINT oracle and this documented bound cover the rest.
    """
    from ..stages.ann import _list_f64_matrix
    from ..stages.exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = _list_f64_matrix(t.column("embedding"))
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        g = q.T @ q  # (d, d) int64
        d = g.shape[0]
        iu = np.triu_indices(d)
        return pa.table({
            "dim_i": pa.array(iu[0].astype(np.int64)),
            "dim_j": pa.array(iu[1].astype(np.int64)),
            "gram_q": pa.array(g[iu]),
            "n_vecs": pa.array(np.full(len(iu[0]), q.shape[0],
                                       np.int64))})

    return grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["dim_i", "dim_j"],
        [("gram_q", "sum", "gram_q"), ("n_vecs", "sum", "n_vecs")])


def embedding_gram_matrix_sql() -> str:
    return """
WITH el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings)
SELECT CAST(a.dim AS BIGINT) AS dim_i, CAST(b.dim AS BIGINT) AS dim_j,
       CAST(sum(a.xq * b.xq) AS BIGINT) AS gram_q,
       CAST(count(*) AS BIGINT) AS n_vecs
FROM el a JOIN el b ON a.vec_id = b.vec_id AND a.dim <= b.dim
GROUP BY a.dim, b.dim"""


def user_conversion_survival(sf_dir: str, coarse: int = 1024):
    """Survival-analysis curve for conversion: per user, days from
    FIRST ACTIVITY to FIRST PURCHASE (never-converters excluded, their
    count reported by the downstream row sum vs user total); output is
    the (days_to_convert -> n_users, cum_users) curve — the
    time-to-event distribution product teams read as "how long until a
    new user buys".

    Shape: per-batch (user, min ts, min purchase ts) partials -> one
    user-keyed exchange merges minima -> integer day difference ->
    day-domain histogram with a driver-side cumulative (the curve is
    calendar-bounded).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    from ..util import shuffle_partitions

    BIG = (1 << 62)

    def partials(t: pa.Table) -> pa.Table:
        ts = pc.cast(t.column("ts"), pa.int64())
        is_p = pc.equal(t.column("event_type"), "purchase")
        pts = pc.if_else(is_p, ts, pa.scalar(BIG, pa.int64()))
        g = (pa.table({"user_id": pc.cast(t.column("user_id"), pa.int64()),
                       "first_us": ts, "first_purchase_us": pts})
             .group_by(["user_id"])
             .aggregate([("first_us", "min"),
                         ("first_purchase_us", "min")])
             .rename_columns(["user_id", "first_us",
                              "first_purchase_us"]))
        keys = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()))

    def days_hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"days_to_convert": pd.Series(dtype="int64"),
                "n_users": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = (g.groupby("user_id", as_index=False)
               .agg(first_us=("first_us", "min"),
                    fp=("first_purchase_us", "min")))
        conv = per[per["fp"] < BIG]
        days = ((conv["fp"].to_numpy() - conv["first_us"].to_numpy())
                // 86_400_000_000)
        v, c = np.unique(days, return_counts=True)
        return pd.DataFrame({"days_to_convert": v.astype("int64"),
                             "n_users": c.astype("int64")})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts"])
    hist = collect_small_arrow(grouped_aggregate(
        (ev.map_batches(partials, batch_format="pyarrow")
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(days_hist, batch_format="pandas")),
        ["days_to_convert"],
        [("n_users", "sum", "n_users")])).to_pandas()
    hist = hist.sort_values("days_to_convert").reset_index(drop=True)
    hist["cum_users"] = hist["n_users"].cumsum().astype("int64")
    hist["n_users"] = hist["n_users"].astype("int64")
    hist["days_to_convert"] = hist["days_to_convert"].astype("int64")
    return hist


def user_conversion_survival_sql() -> str:
    return """
WITH per AS (
  SELECT user_id, min(epoch_us(ts)) AS first_us,
         min(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')
           AS fp
  FROM events GROUP BY user_id),
d AS (
  SELECT (fp - first_us) // 86400000000 AS days_to_convert
  FROM per WHERE fp IS NOT NULL),
h AS (SELECT days_to_convert, CAST(count(*) AS BIGINT) AS n_users
      FROM d GROUP BY days_to_convert)
SELECT CAST(days_to_convert AS BIGINT) AS days_to_convert, n_users,
       CAST(sum(n_users) OVER (ORDER BY days_to_convert
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM h"""


DISCOUNT_CAPS_BP = (0, 200, 500, 1000)


def discount_cap_whatif(sf_dir: str):
    """What-if / scenario analysis in one pass: total revenue under
    hypothetical discount CAPS (discounts clamped to <= cap) for caps
    0% / 2% / 5% / 10%, in exact e4 units — the pricing-policy
    simulation ("how much revenue would a 2% discount ceiling
    recover?").  All scenarios evaluate per batch from the same rows
    (level-tagged partials), so the input is scanned ONCE however
    many scenarios run.

    Shape: zero-shuffle scan, scenario-domain partials, one tiny
    exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    caps = np.array(DISCOUNT_CAPS_BP, np.int64)

    def partial(t: pa.Table) -> pa.Table:
        ext = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                           pa.scalar(100.0))),
                      pa.int64()).to_numpy()
        disc = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                            pa.scalar(10000.0))),
                       pa.int64()).to_numpy()
        rows_cap, rows_rev, rows_n = [], [], []
        for c in caps:
            eff = np.minimum(disc, c)
            rows_cap.append(int(c))
            rows_rev.append(int((ext * (10000 - eff)).sum()))
            rows_n.append(len(ext))
        return pa.table({
            "cap_bp": pa.array(rows_cap, pa.int64()),
            "revenue_e4": pa.array(rows_rev, pa.int64()),
            "n_lines": pa.array(rows_n, pa.int64())})

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                              columns=["l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow"),
        ["cap_bp"], [("revenue_e4", "sum", "revenue_e4"),
                     ("n_lines", "sum", "n_lines")])


def discount_cap_whatif_sql() -> str:
    parts = []
    for c in DISCOUNT_CAPS_BP:
        parts.append(f"""
SELECT CAST({c} AS BIGINT) AS cap_bp,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                * (10000 - least(CAST(round(l_discount * 10000.0)
                                      AS BIGINT), {c}))) AS BIGINT)
         AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


def session_bounce_rate(sf_dir: str, gap_s: int = 1800,
                        coarse: int = 1024):
    """Bounce-rate by landing event type: sessions (30-min idle cut,
    event_id tiebreak — the shared sessionization rule) grouped by
    their FIRST event's type, reporting sessions and single-event
    bounces per landing type — the entry-page quality report.

    Shape: one user-keyed exchange; per bucket the session cut is the
    shared lexsort + gap cumsum, the landing type is the row at each
    session start, and the bounce test is a session-length bincount;
    output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    gap_us = gap_s * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def bounce(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"landing_type": pd.Series(dtype="object"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_bounces": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        new_sess = new_user | (gap > gap_us)
        sid = np.cumsum(new_sess) - 1
        n_sess = int(sid[-1]) + 1
        sizes = np.bincount(sid, minlength=n_sess)
        landing = et[new_sess]
        out = pd.DataFrame({"landing_type": landing,
                            "n_sessions": np.ones(n_sess, np.int64),
                            "n_bounces": (sizes == 1).astype("int64")})
        return out.groupby("landing_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(bounce, batch_format="pandas"))
    return grouped_aggregate(parts, ["landing_type"],
                             [("n_sessions", "sum", "n_sessions"),
                              ("n_bounces", "sum", "n_bounces")])


def session_bounce_rate_sql(gap_s: int = 1800) -> str:
    return f"""
WITH g AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                   > {gap_s} * 1000000
              THEN 1 ELSE 0 END AS ns
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
s AS (
  SELECT user_id, event_type, ts, event_id,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM g),
p AS (
  SELECT user_id, sid,
         min_by(event_type, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                            + event_id) AS landing_type,
         count(*) AS n
  FROM s GROUP BY user_id, sid)
SELECT landing_type, CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE n = 1) AS BIGINT) AS n_bounces
FROM p GROUP BY landing_type"""


def events_interarrival_log2(sf_dir: str, coarse: int = 1024):
    """Latency-histogram (observability) shape: per event type, the
    log2-bucketed distribution of same-user interarrival gaps —
    bucket = bit_length(gap_us) - 1 = floor(log2 gap), computed EXACTLY
    on both sides (vectorized doubling bit-length on the engine,
    length(bin(gap)) string arithmetic in the oracle — IEEE log2 at
    power-of-two boundaries is exactly the kind of fp the repo bans).

    Shape: one user-keyed exchange, vectorized lag inside the bucket,
    (type, bucket)-domain counts out.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def _bit_length(x: np.ndarray) -> np.ndarray:
        # exact vectorized bit length (doubling trick, no fp log)
        b = np.zeros(len(x), np.int64)
        v = x.copy()
        for s in (32, 16, 8, 4, 2, 1):
            m = v >= (1 << s)
            b[m] += s
            v[m] >>= s
        return b + (v > 0)

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "log2_bucket": pd.Series(dtype="int64"),
                "n": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        et = g["event_type"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, et = u[order], ts[order], et[order]
        same = np.concatenate(([False], u[1:] == u[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        sel = same & (gap > 0)
        bucket = _bit_length(gap[sel]) - 1
        out = pd.DataFrame({"event_type": et[sel],
                            "log2_bucket": bucket.astype("int64"),
                            "n": np.ones(int(sel.sum()), np.int64)})
        return out.groupby(["event_type", "log2_bucket"],
                           as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(hist, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type", "log2_bucket"],
                             [("n", "sum", "n")])


def events_interarrival_log2_sql() -> str:
    return """
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events),
b AS (
  SELECT event_type,
         CAST(length(bin(gap_us)) - 1 AS BIGINT) AS log2_bucket
  FROM l WHERE gap_us IS NOT NULL AND gap_us > 0)
SELECT event_type, log2_bucket, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY event_type, log2_bucket"""

