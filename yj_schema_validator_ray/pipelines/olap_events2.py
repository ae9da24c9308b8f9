"""Event-stream OLAP waves 5-6 — split from ``pipelines/olap.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``olap`` module re-exports everything, so the import surface —
``from ..pipelines import olap as OL`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# wide pivot (conditional aggregation)
# ---------------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_type_pivot(sf_dir: str):
    """PIVOT the event stream into one WIDE row per user: a count
    column per (pinned) event type plus the total — the long-to-wide
    conditional-aggregation reshape feeding feature stores.  The type
    list is pinned (a pivot's output schema must be static); unlisted
    types count only toward ``n_total``.

    Shape: per-batch crosstab partials (already wide, one row per user
    per batch) -> one keyed exact aggregate summing the wide columns.
    No row-grain data crosses the exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(df["user_id"], df["event_type"])
        ct = ct.reindex(columns=list(EVENT_TYPES), fill_value=0)
        out = ct.rename(columns={t: f"n_{t}" for t in EVENT_TYPES})
        out = out.reset_index()
        out["user_id"] = out["user_id"].astype("int64")
        for c in cols:
            out[c] = out[c].astype("int64")
        out["n_total"] = (df.groupby("user_id", sort=False).size()
                          .reindex(out["user_id"]).to_numpy()
                          .astype("int64"))
        return out

    return grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/events.parquet",
                              columns=["user_id", "event_type"])
        .map_batches(partial, batch_format="pandas"),
        ["user_id"],
        [(c, "sum", c) for c in cols] + [("n_total", "sum", "n_total")])


def events_type_pivot_sql() -> str:
    sel = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        f" AS n_{t}" for t in EVENT_TYPES)
    return f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       {sel},
       CAST(count(*) AS BIGINT) AS n_total
FROM events GROUP BY user_id"""


# ---------------------------------------------------------------------------
# RFM segmentation (exact quintile scores over a derived aggregate)
# ---------------------------------------------------------------------------

def orders_rfm(sf_dir: str):
    """RFM customer segmentation: per customer, Recency (last order
    timestamp), Frequency (order count) and Monetary (lifetime cents),
    each scored 1-5 against the EXACT population quintiles of the
    derived per-customer aggregate — the classic warehouse
    segmentation, built from this engine's exact-quantile machinery
    (:func:`~..stages.quantiles.grouped_exact_quantiles`) applied to a
    DERIVED table instead of a base table.

    Shape: one keyed aggregate to customer grain (materialized — the
    quantile pass streams it twice), a long-format (metric, value)
    projection through the exact-quantile histogram plan (3x4
    thresholds -> broadcast), one stateless scoring scan.  Scores are
    ``1 + #(v > threshold)`` over doubles both engines derive
    identically, so the hash is exact.
    """
    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.quantiles import grouped_exact_quantiles
    from ..util import process_cached, ref_key

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("o_totalprice"), pa.scalar(100.0))), pa.int64()),
            "ts_us": pc.cast(t.column("o_orderdate"), pa.int64()),
        })

    per_cust = grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_custkey", "o_totalprice", "o_orderdate"])
        .map_batches(prep, batch_format="pyarrow"),
        ["o_custkey"],
        [("cents", "count", "n_orders"),
         ("cents", "sum", "monetary_cents"),
         ("ts_us", "max", "last_us")]).materialize()

    def long_form(t: pa.Table) -> pa.Table:
        n = t.num_rows
        v = np.concatenate([
            t.column("last_us").to_numpy().astype(np.float64),
            t.column("n_orders").to_numpy().astype(np.float64),
            t.column("monetary_cents").to_numpy().astype(np.float64)])
        metric = np.concatenate([np.full(n, "r", object),
                                 np.full(n, "f", object),
                                 np.full(n, "m", object)])
        return pa.table({"metric": pa.array(metric, pa.string()),
                         "v": pa.array(v, pa.float64())})

    qs = (0.2, 0.4, 0.6, 0.8)
    thr = grouped_exact_quantiles(
        per_cust.map_batches(long_form, batch_format="pyarrow"),
        "metric", "v", qs=qs).to_pandas()
    piv = thr.pivot_table(index="metric", columns="quantile",
                          values="value", aggfunc="max")
    mat = {m: piv.loc[m, list(qs)].to_numpy(dtype=np.float64)
           for m in piv.index}
    ref = ray.put(mat)

    class Score:
        def __init__(self, r):
            self.mat = ray.get(r)

        def _score(self, v: np.ndarray, metric: str) -> np.ndarray:
            th = self.mat[metric]
            return (1 + (v[:, None] > th[None, :]).sum(axis=1)) \
                .astype(np.int64)

        def __call__(self, t: pa.Table) -> pa.Table:
            r = self._score(t.column("last_us").to_numpy()
                            .astype(np.float64), "r")
            f = self._score(t.column("n_orders").to_numpy()
                            .astype(np.float64), "f")
            m = self._score(t.column("monetary_cents").to_numpy()
                            .astype(np.float64), "m")
            return pa.table({
                "o_custkey": t.column("o_custkey"),
                "n_orders": t.column("n_orders"),
                "monetary_cents": t.column("monetary_cents"),
                "last_us": t.column("last_us"),
                "r_score": pa.array(r), "f_score": pa.array(f),
                "m_score": pa.array(m),
                "rfm_code": pa.array(100 * r + 10 * f + m),
            })

    return per_cust.map_batches(process_cached(Score, ref_key(ref), ref),
                                batch_format="pyarrow")


def orders_rfm_sql() -> str:
    def score(col, alias):
        cmps = " + ".join(
            f"(CASE WHEN c.{col} > p{alias}.t{i} THEN 1 ELSE 0 END)"
            for i in (1, 2, 3, 4))
        return f"CAST(1 + {cmps} AS BIGINT)"

    return f"""
WITH c AS (
  SELECT CAST(o_custkey AS BIGINT) AS o_custkey,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS monetary_cents,
         CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS last_us
  FROM orders GROUP BY o_custkey),
m AS (
  SELECT 'r' AS metric, CAST(last_us AS DOUBLE) AS v FROM c
  UNION ALL SELECT 'f', CAST(n_orders AS DOUBLE) FROM c
  UNION ALL SELECT 'm', CAST(monetary_cents AS DOUBLE) FROM c),
s AS (
  SELECT metric, v,
         row_number() OVER (PARTITION BY metric ORDER BY v) AS rk,
         count(*) OVER (PARTITION BY metric) AS n
  FROM m),
q AS (SELECT CAST(unnest([0.2, 0.4, 0.6, 0.8]) AS DOUBLE) AS quantile),
thr AS (
  SELECT s.metric, q.quantile, s.v FROM q JOIN s
  ON s.rk = CAST(ceil(q.quantile * s.n) AS BIGINT)),
p AS (
  SELECT metric,
         max(CASE WHEN quantile = 0.2 THEN v END) AS t1,
         max(CASE WHEN quantile = 0.4 THEN v END) AS t2,
         max(CASE WHEN quantile = 0.6 THEN v END) AS t3,
         max(CASE WHEN quantile = 0.8 THEN v END) AS t4
  FROM thr GROUP BY metric)
SELECT c.o_custkey, c.n_orders, c.monetary_cents, c.last_us,
       {score('last_us', 'r')} AS r_score,
       {score('n_orders', 'f')} AS f_score,
       {score('monetary_cents', 'm')} AS m_score,
       CAST(100 * (1 + {" + ".join(f"(CASE WHEN c.last_us > pr.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
          + 10 * (1 + {" + ".join(f"(CASE WHEN c.n_orders > pf.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
          + (1 + {" + ".join(f"(CASE WHEN c.monetary_cents > pm.t{i} THEN 1 ELSE 0 END)" for i in (1, 2, 3, 4))})
            AS BIGINT) AS rfm_code
FROM c, p pr, p pf, p pm
WHERE pr.metric = 'r' AND pf.metric = 'f' AND pm.metric = 'm'"""


# ---------------------------------------------------------------------------
# band (non-equi temporal) self join: views in the hour before a purchase
# ---------------------------------------------------------------------------

def events_purchase_view_window(sf_dir: str, window_s: int = 3600,
                                coarse: int = 1024):
    """BAND JOIN: for every purchase, how many of the same user's view
    events fall in the hour before it ``[ts - W, ts)`` — the non-equi
    temporal join (attribution lookback) the equi-join operators can't
    express.  Unlike :func:`events_conversion_window` (first-view
    anchor, one row per user) this scores EVERY purchase against a
    sliding lookback.

    Shape: one user-keyed exchange; per partition both event streams
    sort once and the band is two vectorized ``searchsorted`` probes —
    O((P+V) log V) per user, never the P x V product.  Purchases with
    zero views are kept (LEFT semantics), matching the SQL.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000

    def prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(t.column("event_type"),
                        value_set=pa.array(["purchase", "view"]))
        t = t.filter(keep)
        user = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "user_id": user,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "is_p": pc.cast(pc.equal(t.column("event_type"),
                                     pa.scalar("purchase")), pa.int64()),
            "__coarse": pa.array(coarse_mix(user.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def band(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _, u in g.groupby("user_id", sort=False):
            p = u[u["is_p"] == 1]
            if p.empty:
                continue
            vts = np.sort(u.loc[u["is_p"] == 0, "ts_us"]
                          .to_numpy(np.int64))
            pts = p["ts_us"].to_numpy(np.int64)
            n = (np.searchsorted(vts, pts, side="left")
                 - np.searchsorted(vts, pts - w_us, side="left"))
            outs.append(pd.DataFrame({
                "event_id": p["event_id"].to_numpy(np.int64),
                "user_id": p["user_id"].to_numpy(np.int64),
                "ts_us": pts,
                "n_views_1h": n.astype(np.int64)}))
        if not outs:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "ts_us": pd.Series(dtype="int64"),
                                 "n_views_1h": pd.Series(dtype="int64")})
        return pd.concat(outs, ignore_index=True)

    return (ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(band, batch_format="pandas"))


def events_purchase_view_window_sql(window_s: int = 3600) -> str:
    return f"""
SELECT CAST(p.event_id AS BIGINT) AS event_id,
       CAST(p.user_id AS BIGINT) AS user_id,
       CAST(epoch_us(p.ts) AS BIGINT) AS ts_us,
       CAST(count(v.event_id) AS BIGINT) AS n_views_1h
FROM events p LEFT JOIN events v
  ON v.user_id = p.user_id AND v.event_type = 'view'
 AND v.ts >= p.ts - INTERVAL {window_s} SECOND AND v.ts < p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id, p.ts"""


# ---------------------------------------------------------------------------
# year-over-year growth (lag over an aggregated series)
# ---------------------------------------------------------------------------

def orders_yoy_growth(sf_dir: str):
    """Year-over-year revenue deltas per order priority: aggregate to
    the (priority, year) domain, then LAG within each priority's year
    series — the trend-report shape (growth emitted as the exact
    integer cent DIFFERENCE; a ratio would be fp).  First year of each
    priority has no predecessor and is dropped, like the SQL's
    ``WHERE prev IS NOT NULL``.

    Per-batch domain partials -> driver-side lag over the ~|priorities
    x years| series (domain-sized by construction)."""
    import ray.data

    from ..util import collect_small_arrow

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "o_orderpriority": t.column("o_orderpriority"),
            "o_year": pc.strftime(t.column("o_orderdate"), format="%Y"),
            "revenue_cents": pc.cast(pc.round(pc.multiply(
                t.column("o_totalprice"), pa.scalar(100.0))), pa.int64())})
        return (tt.group_by(["o_orderpriority", "o_year"])
                .aggregate([("revenue_cents", "sum")])
                .rename_columns(["o_orderpriority", "o_year",
                                 "revenue_cents"]))

    partials = collect_small_arrow(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderpriority", "o_orderdate",
                                       "o_totalprice"])
        .map_batches(partial, batch_format="pyarrow")).to_pandas()
    if partials.empty:
        return pd.DataFrame({
            "o_orderpriority": pd.Series(dtype="string"),
            "o_year": pd.Series(dtype="string"),
            "revenue_cents": pd.Series(dtype="int64"),
            "prev_cents": pd.Series(dtype="int64"),
            "yoy_diff_cents": pd.Series(dtype="int64")})
    y = (partials.groupby(["o_orderpriority", "o_year"], as_index=False)
         ["revenue_cents"].sum()
         .sort_values(["o_orderpriority", "o_year"]))
    y["prev_cents"] = (y.groupby("o_orderpriority", sort=False)
                       ["revenue_cents"].shift(1))
    y = y[y["prev_cents"].notna()].copy()
    y["revenue_cents"] = y["revenue_cents"].astype("int64")
    y["prev_cents"] = y["prev_cents"].astype("int64")
    y["yoy_diff_cents"] = (y["revenue_cents"]
                           - y["prev_cents"]).astype("int64")
    return y.reset_index(drop=True)


def orders_yoy_growth_sql() -> str:
    return """
WITH y AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y') AS o_year,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS revenue_cents
  FROM orders GROUP BY 1, 2),
l AS (
  SELECT *, lag(revenue_cents) OVER (PARTITION BY o_orderpriority
                                     ORDER BY o_year) AS prev_cents
  FROM y)
SELECT o_orderpriority, o_year, revenue_cents,
       CAST(prev_cents AS BIGINT) AS prev_cents,
       CAST(revenue_cents - prev_cents AS BIGINT) AS yoy_diff_cents
FROM l WHERE prev_cents IS NOT NULL"""


# ---------------------------------------------------------------------------
# multi-round k-means (unrolled Lloyd iterations, SQL-oracled end-to-end)
# ---------------------------------------------------------------------------

def embedding_kmeans(sf_dir: str, rounds: int = 3):
    """FULL k-means refinement loop: ``rounds`` exact Lloyd iterations
    (centroids of the current assignment -> nearest-centroid
    re-assignment), the iterative-ML-training-loop shape
    (:func:`embedding_lloyd_step` is one round; this drives the loop
    with per-round re-materialization bounding the lineage, the
    :mod:`..stages.pagerank` discipline).  The whole trajectory is
    bit-checkable: the fixed-point arithmetic contract of the single
    step holds every round, and the oracle unrolls the same ``rounds``
    CTE chain.

    A cluster that loses all members simply disappears from the next
    round's centroid set (both engines derive this identically).

    Shape per round: zero-shuffle (label x dim) int64 partial sums ->
    driver-collected k x d centroid matrix (tiny at any corpus size)
    -> broadcast argmin re-assignment scan.  Vectors never cross an
    exchange; only the assignment column changes per round.

    Output per vector: (vec_id, label_init, label_final, moved).
    """
    cur = _kmeans_assign_ds(sf_dir, rounds)

    def finish(t: pa.Table) -> pa.Table:
        init = t.column("label_init")
        fin = t.column("label")
        return pa.table({
            "vec_id": t.column("vec_id"),
            "label_init": init,
            "label_final": fin,
            "moved": pc.cast(pc.not_equal(fin, init), pa.int64())})

    return cur.map_batches(finish, batch_format="pyarrow")


def _kmeans_assign_ds(sf_dir: str, rounds: int):
    """Shared Lloyd driver: returns the post-``rounds`` assignment
    Dataset (vec_id, embedding, label_init, label) — the engine half of
    the unrolled-CTE oracle contract (:func:`_kmeans_cte_parts`)."""
    import ray
    import ray.data

    from ..stages.ann import _list_f64_matrix
    from ..util import collect_small_arrow, process_cached, ref_key

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
            "embedding": t.column("embedding"),
            "label_init": pc.cast(t.column("label"), pa.int64()),
            "label": pc.cast(t.column("label"), pa.int64())})

    cur = (ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["vec_id", "embedding", "label"])
           .map_batches(prep, batch_format="pyarrow")).materialize()

    def cent_partial(t: pa.Table) -> pa.Table:
        xq = np.floor(_list_f64_matrix(t.column("embedding"))
                      * 1e6 + 0.5).astype(np.int64)
        lbl = t.column("label").to_numpy()
        labels, inv = np.unique(lbl, return_inverse=True)
        k, d = len(labels), xq.shape[1]
        sums = np.zeros((k, d), np.int64)
        np.add.at(sums, inv, xq)
        ns = np.bincount(inv, minlength=k).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(labels, d), pa.int64()),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), k)),
            "sum_q": pa.array(sums.reshape(-1)),
            "n_vecs": pa.array(np.repeat(ns, d)),
        })

    for _ in range(rounds):
        cdf = collect_small_arrow(
            cur.map_batches(cent_partial,
                            batch_format="pyarrow")).to_pandas()
        cdf = (cdf.groupby(["label", "dim"], as_index=False)
               [["sum_q", "n_vecs"]].sum().sort_values(["label", "dim"]))
        labels = np.sort(cdf["label"].unique())
        d = int(cdf["dim"].max()) + 1
        sums = cdf["sum_q"].to_numpy(np.int64).reshape(len(labels), d)
        ns = (cdf.groupby("label", sort=True)["n_vecs"].first()
              .to_numpy(np.int64))
        m = np.sign(sums) * (np.abs(sums) // ns[:, None])
        ref = ray.put((labels, m))

        class Assign:
            def __init__(self, r):
                self.labels, self.m = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                xq = np.floor(_list_f64_matrix(t.column("embedding"))
                              * 1e6 + 0.5).astype(np.int64)
                dist = ((xq[:, None, :].astype(np.int64)
                         - self.m[None, :, :]) ** 2).sum(axis=2)
                best = np.argmin(dist, axis=1)
                return pa.table({
                    "vec_id": t.column("vec_id"),
                    "embedding": t.column("embedding"),
                    "label_init": t.column("label_init"),
                    "label": pa.array(self.labels[best], pa.int64())})

        cur = cur.map_batches(
            process_cached(Assign, ref_key(ref), ref),
            batch_format="pyarrow", batch_size=1024).materialize()

    return cur


def embedding_kmeans_sql(rounds: int = 3) -> str:
    """Oracle: the same ``rounds``-step Lloyd chain unrolled as CTEs
    (the :func:`..stages.pagerank.trade_pagerank` unrolled-oracle
    technique applied to k-means)."""
    parts = _kmeans_cte_parts(rounds)
    return f"""
WITH {", ".join(parts)}
SELECT CAST(e.vec_id AS BIGINT) AS vec_id,
       CAST(e.label AS BIGINT) AS label_init,
       a.label AS label_final,
       CAST(CASE WHEN a.label <> e.label THEN 1 ELSE 0 END AS BIGINT)
         AS moved
FROM embeddings e JOIN a{rounds} a USING (vec_id)"""


def _kmeans_cte_parts(rounds: int) -> list:
    """The unrolled Lloyd CTE chain (a0 .. a{rounds}) shared by the
    k-means and SemDeDup oracles."""
    parts = ["""el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
a0 AS (SELECT vec_id, CAST(label AS BIGINT) AS label FROM embeddings)"""]
    for r in range(1, rounds + 1):
        parts.append(f"""c{r} AS (
  SELECT a.label, e.dim, CAST(sum(e.xq) // count(*) AS BIGINT) AS m
  FROM el e JOIN a{r - 1} a USING (vec_id) GROUP BY a.label, e.dim),
d{r} AS (
  SELECT e.vec_id, c.label AS cand,
         CAST(sum((e.xq - c.m) * (e.xq - c.m)) AS BIGINT) AS d2
  FROM el e JOIN c{r} c ON c.dim = e.dim GROUP BY e.vec_id, c.label),
a{r} AS (
  SELECT vec_id, cand AS label FROM (
    SELECT vec_id, cand,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cand) AS rk
    FROM d{r}) WHERE rk = 1)""")
    return parts


# ---------------------------------------------------------------------------
# trailing-window exact distinct (rolling COUNT(DISTINCT) OVER a day range)
# ---------------------------------------------------------------------------

def events_rolling_distinct(sf_dir: str, window_days: int = 7):
    """Exact trailing-``window_days`` distinct active users per day
    (the rolling COUNT(DISTINCT) the MA-of-DAU series approximates):
    a user is active on day d if they had ANY event in
    [d - window_days + 1, d].

    Distributed shape — rolling distinct does NOT decompose as a
    windowed sum of per-day distincts, but each user's activity
    coverage is a union of equal-length intervals, so it becomes the
    :func:`orders_open_per_day` boundary sweep run per user:

    1. one user-keyed coarse exchange of deduped int64 (user, day)
       pairs (per-batch dedup first; text never moves);
    2. inside each co-located group, a vectorized chain scan merges
       each user's overlapping coverage intervals and emits +-1
       boundary rows (equal interval lengths make chain ends monotone,
       so the scan is one shift-compare, no loop);
    3. the day-domain boundary histogram is one exact aggregate and
       the running sum over the day DOMAIN is driver math.

    Days with zero active users inside [first, last] event day are
    emitted with n_active = 0 (LEFT JOIN semantics in the oracle).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, shuffle_partitions

    US_PER_DAY = 86_400_000_000
    W = int(window_days)

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        day = pc.cast(pc.divide(pc.cast(t.column("ts"), pa.int64()),
                                pa.scalar(US_PER_DAY, pa.int64())),
                      pa.int64())
        dd = (pa.table({"u": u, "day": day})
              .group_by(["u", "day"]).aggregate([]))
        un = dd.column("u").to_numpy(zero_copy_only=False).astype(np.int64)
        return dd.append_column(
            "__coarse", pa.array(coarse_mix(un), pa.int64()))

    def boundaries(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["u", "day"])
             .sort_values(["u", "day"], kind="mergesort"))
        u = g["u"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        # coverage of one event day is [day, day + W - 1]; within a
        # user, a new chain starts when the gap leaves the coverage
        brk = np.ones(len(u), bool)
        if len(u) > 1:
            brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] >= W)
        last = np.roll(brk, -1)
        if len(u):
            last[-1] = True
        return pd.DataFrame({
            "day": np.concatenate([day[brk], day[last] + W]),
            "d": np.concatenate([
                np.ones(int(brk.sum()), np.int64),
                np.full(int(last.sum()), -1, np.int64)])})

    hist = collect_small_arrow(grouped_aggregate(
        ds.map_batches(pairs, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(boundaries, batch_format="pandas"),
        ["day"], [("d", "sum", "delta")])).to_pandas()

    hist = hist.sort_values("day").reset_index(drop=True)
    lo = int(hist["day"].iloc[0])            # min start = first event day
    hi = int(hist["day"].iloc[-1]) - W       # max end - W = last event day
    full = pd.DataFrame({"day": np.arange(lo, hi + 1, dtype=np.int64)})
    full = full.merge(hist, on="day", how="left")
    full["n_active"] = (full["delta"].fillna(0).astype("int64")
                        .cumsum().astype("int64"))
    return full[["day", "n_active"]]


def events_rolling_distinct_sql(window_days: int = 7) -> str:
    return f"""
WITH ev AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS u,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
days AS (
  SELECT unnest(range((SELECT min(day) FROM ev),
                      (SELECT max(day) + 1 FROM ev))) AS day)
SELECT CAST(d.day AS BIGINT) AS day,
       CAST(count(DISTINCT e.u) AS BIGINT) AS n_active
FROM days d LEFT JOIN ev e
  ON e.day BETWEEN d.day - {int(window_days) - 1} AND d.day
GROUP BY d.day"""


# ---------------------------------------------------------------------------
# market-basket pair support (frequent co-purchased item pairs)
# ---------------------------------------------------------------------------

def basket_pairs(sf_dir: str, min_support: int = 2, max_basket: int = 32):
    """Co-purchase pair mining (the Apriori/market-basket first pass):
    for every unordered part pair {p1 < p2}, in how many orders do both
    appear — keeping pairs with support >= ``min_support``.

    Shape: the within-group self-join.  One order-keyed coarse exchange
    of int64 (order, part) pairs co-locates each basket; pair expansion
    is a fully-vectorized grouped-arange gather (no per-basket Python),
    quadratic only in basket size, which is HARD-BOUNDED: baskets with
    more than ``max_basket`` distinct parts are dropped, and the oracle
    mirrors the drop — the documented guard against pathological
    mega-baskets at scale (same discipline as the LSH bucket cap).
    Pair-domain partial counts cross one exact aggregate; the support
    gate is a post-aggregate filter.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_partkey"])

    def prep(t: pa.Table) -> pa.Table:
        dd = (pa.table({
            "o": pc.cast(t.column("l_orderkey"), pa.int64()),
            "p": pc.cast(t.column("l_partkey"), pa.int64())})
            .group_by(["o", "p"]).aggregate([]))
        on = dd.column("o").to_numpy(zero_copy_only=False).astype(np.int64)
        return dd.append_column(
            "__coarse", pa.array(coarse_mix(on), pa.int64()))

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["o", "p"])
             .sort_values(["o", "p"], kind="mergesort"))
        o = g["o"].to_numpy(np.int64)
        p = g["p"].to_numpy(np.int64)
        # basket sizes + within-basket positions, vectorized
        brk = np.ones(len(o), bool)
        brk[1:] = o[1:] != o[:-1]
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(o)))
        keep = sizes <= max_basket
        size_per_row = np.repeat(sizes, sizes)
        pos = np.arange(len(o)) - np.repeat(starts, sizes)
        row_keep = np.repeat(keep, sizes)
        rep = np.where(row_keep, size_per_row - 1 - pos, 0)
        total = int(rep.sum())
        if total == 0:
            return pd.DataFrame({"p1": np.empty(0, np.int64),
                                 "p2": np.empty(0, np.int64),
                                 "support": np.empty(0, np.int64)})
        ends = rep.cumsum()
        inc = np.arange(total) - np.repeat(ends - rep, rep)
        p1 = np.repeat(p, rep)
        p2 = p[np.repeat(np.arange(len(p)) + 1, rep) + inc]
        out = (pd.DataFrame({"p1": p1, "p2": p2})
               .groupby(["p1", "p2"], sort=False).size()
               .rename("support").reset_index())
        out["support"] = out["support"].astype("int64")
        return out

    agg = grouped_aggregate(
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(expand, batch_format="pandas"),
        ["p1", "p2"], [("support", "sum", "support")])

    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t.column("support"), pa.scalar(min_support, pa.int64()))),
        batch_format="pyarrow")


def basket_pairs_sql(min_support: int = 2, max_basket: int = 32) -> str:
    return f"""
WITH basket AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                  CAST(l_partkey AS BIGINT) AS p
  FROM lineitem),
sized AS (
  SELECT o FROM basket GROUP BY o HAVING count(*) <= {int(max_basket)})
SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS support
FROM basket a
JOIN basket b ON a.o = b.o AND a.p < b.p
JOIN sized s ON s.o = a.o
GROUP BY a.p, b.p
HAVING count(*) >= {int(min_support)}"""


# ---------------------------------------------------------------------------
# UNPIVOT / melt — the wide-to-long inverse of the type pivot
# ---------------------------------------------------------------------------

def events_unpivot(sf_dir: str):
    """Melt the wide per-user type pivot back to long (user_id,
    event_type, n) rows, dropping zero cells — the UNPIVOT reshape.
    Composed as pivot -> melt so the oracle (a direct GROUP BY over
    the pinned type list) certifies the round trip: melt(pivot(x)) ==
    groupby(x).  The melt is a pure per-batch reshape (no exchange on
    top of the pivot's)."""
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.melt(id_vars=["user_id"], value_vars=cols,
                      var_name="event_type", value_name="n")
        out = out[out["n"] > 0].reset_index(drop=True)
        out["event_type"] = out["event_type"].str.slice(2)
        out["user_id"] = out["user_id"].astype("int64")
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "event_type", "n"]]

    return events_type_pivot(sf_dir).map_batches(
        melt, batch_format="pandas")


def events_unpivot_sql() -> str:
    types = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
SELECT CAST(user_id AS BIGINT) AS user_id,
       event_type,
       CAST(count(*) AS BIGINT) AS n
FROM events
WHERE event_type IN ({types})
GROUP BY user_id, event_type"""


# ---------------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------------

def events_user_streaks(sf_dir: str):
    """Per-user consecutive-day activity streaks (the classic
    gaps-and-islands shape): longest streak, total active days, and
    number of distinct streaks.

    Distributed shape: per-batch (user, day) dedup prunes the exchange
    to at most one int64 pair per user-day, ONE user-keyed coarse
    exchange co-locates each user, and inside each group a single
    sorted shift-compare marks island breaks (``diff != 1``) — run
    lengths fall out of the break positions with no Python loop.  The
    output is user-domain sized; nothing collects on the driver.

    Reference analogue: none (warehouse canon; same family as
    :func:`events_rolling_distinct`'s interval sweep).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    US_PER_DAY = 86_400_000_000

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        day = pc.cast(pc.divide(pc.cast(t.column("ts"), pa.int64()),
                                pa.scalar(US_PER_DAY, pa.int64())),
                      pa.int64())
        dd = (pa.table({"user_id": u, "day": day})
              .group_by(["user_id", "day"]).aggregate([]))
        un = dd.column("user_id").to_numpy(zero_copy_only=False)
        return dd.append_column(
            "__coarse",
            pa.array(coarse_mix(un.astype(np.int64)), pa.int64()))

    def streaks(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop_duplicates(["user_id", "day"])
             .sort_values(["user_id", "day"], kind="mergesort"))
        u = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        n = len(u)
        if n == 0:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "longest_streak": pd.Series(dtype="int64"),
                "n_active_days": pd.Series(dtype="int64"),
                "n_streaks": pd.Series(dtype="int64")})
        brk = np.ones(n, bool)
        brk[1:] = (u[1:] != u[:-1]) | (day[1:] - day[:-1] != 1)
        starts = np.flatnonzero(brk)
        run_len = np.diff(np.concatenate((starts, [n])))
        run_user = u[starts]
        df = pd.DataFrame({"user_id": run_user, "len": run_len})
        out = (df.groupby("user_id", sort=False)
               .agg(longest_streak=("len", "max"),
                    n_active_days=("len", "sum"),
                    n_streaks=("len", "size"))
               .reset_index())
        for c in ("longest_streak", "n_active_days", "n_streaks"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(streaks, batch_format="pandas"))


def events_user_streaks_sql() -> str:
    return """
WITH days AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS user_id,
         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
  FROM events),
isl AS (
  SELECT user_id, day,
         day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS grp
  FROM days),
runs AS (
  SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(count(*) AS BIGINT) AS n_streaks
FROM runs GROUP BY user_id"""


# ---------------------------------------------------------------------------
# Z-order (Morton) layout clustering over two int dimensions
# ---------------------------------------------------------------------------

_MORTON_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Interleave-ready 31-bit spread (uint64, bits land on even
    positions) — the standard mask cascade, fully vectorized."""
    x = x.astype(np.uint64)
    for sh, mask in _MORTON_MASKS:
        x = (x | (x << np.uint64(sh))) & np.uint64(mask)
    return x


def lineitem_zorder_stats(sf_dir: str, shift: int = 16):
    """Z-ORDER layout clustering certificate: Morton-interleave
    ``(l_partkey, l_suppkey)``, bucket rows by the top Morton bits
    (``morton >> shift``), and report each bucket's row count and
    bounding box over BOTH dimensions.

    This is the data-layout primitive behind multi-dimensional scan
    pruning at 100 TB (Delta/Iceberg ``ZORDER BY``): writing files in
    Morton-bucket order makes per-file min/max stats tight on EVERY
    interleaved column at once, so predicates on either key prune
    files.  The per-bucket bbox output IS the pruning index a writer
    would persist.  Engine shape: the Morton code is five mask-shift
    steps on the raw int64 Arrow buffers (zero Python per row), bucket
    stats are one :func:`~..stages.exact_agg.grouped_aggregate`
    exchange of 5-column int64 partials; nothing driver-side.  Keys are
    guarded to [0, 2^31) — wider keys need a wider-spread variant.

    Reference analogue: none (lakehouse layout canon; Morton 1966).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    def add_bucket(t: pa.Table) -> pa.Table:
        x = t.column("l_partkey").to_numpy(zero_copy_only=False).astype(np.int64)
        y = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(x) and (x.min() < 0 or y.min() < 0
                       or max(x.max(), y.max()) >= (1 << 31)):
            raise ValueError(
                "lineitem_zorder_stats: keys outside [0, 2^31) — widen "
                "the Morton spread before bucketing")
        morton = (_spread_bits(x) | (_spread_bits(y) << np.uint64(1)))
        return pa.table({
            "bucket": pa.array((morton >> np.uint64(shift)).astype(np.int64),
                               pa.int64()),
            "part": pa.array(x, pa.int64()),
            "supp": pa.array(y, pa.int64()),
        })

    return grouped_aggregate(
        ds.map_batches(add_bucket, batch_format="pyarrow"),
        ["bucket"],
        [("part", "count", "n_rows"),
         ("part", "min", "min_part"), ("part", "max", "max_part"),
         ("supp", "min", "min_supp"), ("supp", "max", "max_supp")])


def lineitem_zorder_stats_sql(shift: int = 16) -> str:
    """Oracle: the identical mask cascade in BIGINT bit ops."""
    def spread(col: str) -> str:
        e = col
        for sh, mask in _MORTON_MASKS:
            e = f"(({e} | ({e} << {sh})) & {mask})"
        return e

    return f"""
WITH src AS (
  SELECT CAST(l_partkey AS BIGINT) AS part,
         CAST(l_suppkey AS BIGINT) AS supp
  FROM lineitem),
m AS (
  SELECT part, supp,
         ({spread('part')} | ({spread('supp')} << 1)) >> {shift} AS bucket
  FROM src)
SELECT bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(part) AS BIGINT) AS min_part,
       CAST(max(part) AS BIGINT) AS max_part,
       CAST(min(supp) AS BIGINT) AS min_supp,
       CAST(max(supp) AS BIGINT) AS max_supp
FROM m GROUP BY bucket"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic dedup = k-means clusters -> within-cluster cosine prune
# ---------------------------------------------------------------------------

def semdedup(sf_dir: str, rounds: int = 2, threshold: float = 0.4):
    """SemDeDup (Abbas et al., 2023): semantic deduplication by
    clustering the embedding space with k-means and pruning, WITHIN
    each cluster, every vector that has a higher-similarity twin —
    keep-lowest-``vec_id`` is the deterministic representative rule.
    The quadratic pair scan is confined to one cluster (the paper's
    entire point: k scales the within-cluster work down as the corpus
    grows), so the global shape is linear + per-cluster tiles.

    Shape: ``rounds`` exact fixed-point Lloyd iterations (the shared
    :func:`_kmeans_assign_ds` driver — zero-shuffle int64 centroid
    partials, broadcast argmin scans) -> ONE cluster-keyed exchange of
    (vec_id, embedding) -> per-cluster ascending-``vec_id`` tile
    matmuls that OR a "has an earlier twin" flag per vector; vectors
    never reach the driver and no pair list materializes (the flag is
    the output).  ``sim`` uses f64 cosine with the same >= threshold
    test as :func:`..stages.ann.embedding_dup_pairs` (driver-green
    precedent for cross-engine f64 determinism at this rounding).

    Output per vector: (vec_id, cluster, pruned).  The default
    threshold is tuned to this corpus (synthetic 16-dim embeddings are
    near-random: max within-cluster cosine ~0.47, so the paper's ~0.99
    web-dedup setting would prune nothing); production corpora with
    real semantic twins use the high setting.
    """
    from ..stages.ann import _list_f64_matrix, _normalize
    from ..util import shuffle_partitions

    cur = _kmeans_assign_ds(sf_dir, rounds)

    def strip(t: pa.Table) -> pa.Table:
        return pa.table({
            "cluster": t.column("label"),
            "vec_id": t.column("vec_id"),
            "embedding": t.column("embedding")})

    def prune_cluster(g: pa.Table) -> pa.Table:
        n = g.num_rows
        if n == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "cluster": pa.array([], pa.int64()),
                             "pruned": pa.array([], pa.bool_())})
        ids = g.column("vec_id").to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        cluster = g.column("cluster").to_numpy()[order]
        M = _normalize(_list_f64_matrix(g.column("embedding"))[order])
        pruned = np.zeros(n, bool)
        B = 4096
        for cs in range(0, n, B):          # column tile = candidate j
            ce = min(cs + B, n)
            for rs in range(0, ce, B):     # row tile = earlier i (i < j)
                re_ = min(rs + B, ce)
                sims = M[rs:re_] @ M[cs:ce].T
                if rs == cs:
                    sims[np.tril_indices(re_ - rs, k=0, m=ce - cs)] = -2.0
                hit = (sims >= threshold).any(axis=0)
                pruned[cs:ce] |= hit
        return pa.table({"vec_id": pa.array(ids, pa.int64()),
                         "cluster": pa.array(cluster, pa.int64()),
                         "pruned": pa.array(pruned)})

    return (cur.map_batches(strip, batch_format="pyarrow")
            .groupby("cluster",
                     num_partitions=min(64, shuffle_partitions()))
            .map_groups(prune_cluster, batch_format="pyarrow"))


def semdedup_sql(rounds: int = 2, threshold: float = 0.4) -> str:
    parts = _kmeans_cte_parts(rounds)
    return f"""
WITH {", ".join(parts)},
asg AS (
  SELECT CAST(e.vec_id AS BIGINT) AS vec_id, a.label AS cluster,
         e.embedding
  FROM embeddings e JOIN a{rounds} a USING (vec_id)),
twins AS (
  SELECT DISTINCT b.vec_id
  FROM asg a JOIN asg b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                               CAST(b.embedding AS DOUBLE[]))
        >= {threshold})
SELECT asg.vec_id, asg.cluster, (t.vec_id IS NOT NULL) AS pruned
FROM asg LEFT JOIN twins t USING (vec_id)"""


def lang_source_share(sf_dir: str):
    """Ratio-to-report window: per (source, lang), the doc count and its
    share of the source's total in integer BASIS POINTS
    (``n * 10000 // source_total`` — floor division both sides, so the
    value hash is fp-free).  The mixture-dashboard number every feed
    report opens with.

    Shape: one (source, lang)-keyed count exchange; the share division
    runs on the collected domain-sized (sources x langs) table."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["source", "lang"])
    c = collect_small_arrow(grouped_aggregate(
        ds, ["source", "lang"], [("", "count", "n_docs")])).to_pandas()
    tot = c.groupby("source")["n_docs"].transform("sum").to_numpy()
    c["share_bp"] = (c["n_docs"].to_numpy(np.int64) * 10000) // tot
    c["share_bp"] = c["share_bp"].astype("int64")
    return pa.Table.from_pandas(c, preserve_index=False)


def lang_source_share_sql() -> str:
    return """
WITH c AS (SELECT source, lang, count(*) AS n
           FROM documents GROUP BY 1, 2)
SELECT source, lang, CAST(n AS BIGINT) AS n_docs,
       CAST((n * 10000) // SUM(n) OVER (PARTITION BY source) AS BIGINT)
         AS share_bp
FROM c"""


def events_burst_days(sf_dir: str, z: int = 2):
    """Burst detection on the aggregated daily series: per event type,
    flag days whose count exceeds mean + ``z`` sigma of that type's
    own daily distribution.  The test is evaluated in EXACT integers —
    ``n*D - S > 0 and (n*D - S)^2 > z^2 * (D*Q - S^2)`` with D=#days,
    S=sum, Q=sum of squares — Python ints on the engine side, HUGEINT
    in the oracle, so no sqrt/fp enters the certificate (the
    count-series companion to the value-level MAD gate in
    ``events_mad_outliers``).

    Shape: one (type, day)-keyed count exchange; the flagging runs on
    the collected day-domain series (calendar-bounded at any scale)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"event_type": t.column("event_type"),
                         "day": day})

    d = collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["event_type", "day"], [("", "count", "n_events")])).to_pandas()
    flags = []
    for _, g in d.groupby("event_type", sort=False):
        n = [int(v) for v in g["n_events"]]   # Python ints: no overflow
        D, S, Q = len(n), sum(n), sum(v * v for v in n)
        var_term = D * Q - S * S
        flags.append(pd.Series(
            [(v * D - S) > 0 and (v * D - S) ** 2 > z * z * var_term
             for v in n], index=g.index))
    d["is_burst"] = pd.concat(flags).sort_index()
    d["n_events"] = d["n_events"].astype("int64")
    return pa.Table.from_pandas(d, preserve_index=False)


def events_burst_days_sql(z: int = 2) -> str:
    return f"""
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2),
s AS (SELECT event_type, COUNT(*) AS nd, SUM(n) AS sn, SUM(n * n) AS qn
      FROM d GROUP BY event_type)
SELECT d.event_type, d.day, CAST(d.n AS BIGINT) AS n_events,
       (d.n * s.nd - s.sn > 0 AND
        (d.n * s.nd - s.sn) * (d.n * s.nd - s.sn)
          > {z * z} * (s.nd * s.qn - s.sn * s.sn)) AS is_burst
FROM d JOIN s USING (event_type)"""


def events_active_coverage(sf_dir: str, window_s: int = 300):
    """Interval-UNION coverage per user: pad every event to a
    [ts, ts+window) activity interval and report how much wall-clock
    each user's union of intervals covers (plus how many disjoint
    merged intervals it falls into) — total-active-time accounting,
    where naive SUM double-counts every overlap.

    Distributed shape: one user-keyed coarse exchange of (user, ts)
    int64 pairs; inside each group the merge is the classic sweep done
    with vectorized pandas segment ops (per-user cummax of interval
    ends -> island breaks where the next start clears the running max
    -> per-island max(end) - min(start)).  Outputs are exact integer
    MICROSECONDS (epoch_us both sides), so no fp enters the hash."""
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def pairs(t: pa.Table) -> pa.Table:
        u = pc.cast(t.column("user_id"), pa.int64())
        ts = pc.cast(t.column("ts"), pa.int64())
        un = u.to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": u, "ts": ts,
            "__coarse": pa.array(coarse_mix(un.astype(np.int64)),
                                 pa.int64())})

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_intervals": pd.Series(dtype="int64"),
                                 "covered_us": pd.Series(dtype="int64")})
        g = g.sort_values(["user_id", "ts"], kind="mergesort")
        ts = g["ts"].to_numpy(np.int64)
        te = ts + w_us
        u = g["user_id"]
        prev_max = pd.Series(te).groupby(u.to_numpy()).cummax() \
            .groupby(u.to_numpy()).shift(1)
        new_island = (~(ts <= prev_max.to_numpy())) \
            | prev_max.isna().to_numpy()
        island = np.cumsum(new_island)
        df = pd.DataFrame({"user_id": u.to_numpy(np.int64),
                           "island": island, "ts": ts, "te": te})
        per_isl = df.groupby(["user_id", "island"], sort=False).agg(
            s=("ts", "min"), t=("te", "max"))
        out = (per_isl.assign(c=per_isl["t"] - per_isl["s"])
               .groupby("user_id", sort=False)
               .agg(n_intervals=("c", "size"), covered_us=("c", "sum"))
               .reset_index())
        out["n_intervals"] = out["n_intervals"].astype("int64")
        out["covered_us"] = out["covered_us"].astype("int64")
        return out

    return (ds.map_batches(pairs, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(sweep, batch_format="pandas"))


def events_active_coverage_sql(window_s: int = 300) -> str:
    return f"""
WITH e AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, ts,
         ts + INTERVAL {window_s} SECOND AS te
  FROM events),
m AS (
  SELECT user_id, ts, te,
         CASE WHEN ts <= max(te) OVER (PARTITION BY user_id
                   ORDER BY ts, te
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS ni
  FROM e),
g AS (SELECT user_id, ts, te,
             SUM(ni) OVER (PARTITION BY user_id ORDER BY ts, te) AS isl
      FROM m),
i AS (SELECT user_id, isl, min(ts) AS s, max(te) AS t
      FROM g GROUP BY 1, 2)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(SUM(epoch_us(t - s)) AS BIGINT) AS covered_us
FROM i GROUP BY user_id"""


def events_benford(sf_dir: str):
    """Benford's-law first-digit audit over the value column — the
    classic fabricated-numbers screen.  The digit is extracted from
    the EXACT integer cents (``round(value*100)``), first character of
    the int's decimal string — identical int-to-string on both sides,
    no log10 (whose IEEE results at powers of ten differ between
    libraries).  Non-positive amounts are excluded on both sides.
    Output (digit, n) exact; the Benford deviation stat stays
    downstream where fp is allowed.  One fixed-width (9-row) count
    exchange."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])

    def digits(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))), pa.int64())
        c = c.to_numpy(zero_copy_only=False)
        c = c[c > 0]
        # first decimal digit: digit count via log-free integer divide
        d = c.copy()
        d[d >= 10**15] //= 10**15
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        return pa.table({"digit": pa.array(d, pa.int64())})

    return grouped_aggregate(
        ds.map_batches(digits, batch_format="pyarrow"),
        ["digit"], [("", "count", "n")])


def events_benford_sql() -> str:
    return """
WITH c AS (
  SELECT CAST(round(value * 100) AS BIGINT) AS c FROM events),
d AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE c > 0)
SELECT digit, CAST(count(*) AS BIGINT) AS n
FROM d GROUP BY digit"""


def user_activity_gini(sf_dir: str):
    """Concentration-of-activity audit: the exact integer Gini
    numerator over per-user event counts — ``sum((2r - n - 1) * x_r)``
    with rank ``r`` ascending by (count, user_id) — reported with
    ``n_users`` and ``sum_events`` so the [0,1] Gini ratio stays
    downstream where fp is allowed.  Ties don't matter: permuting
    equal counts inside a tie block leaves the sum unchanged, so the
    deterministic id tie-break is merely reproducibility.

    Shape: per-user counts (one keyed exchange) ->
    :func:`~..stages.rank.global_rank` (histogram-offset ranking, no
    global sort) -> per-block (sum rx, sum x, n) partials -> one tiny
    driver combine using Python ints (the r*x sum is the one term that
    could outgrow int64 at extreme scale)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.rank import global_rank
    from ..util import collect_small_arrow

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id"])
    # alias "x" (not "n"): global_rank's internal histogram uses "n"
    counts = grouped_aggregate(ev, ["user_id"], [("", "count", "x")])
    ranked = global_rank(counts, key_col="x", id_col="user_id",
                         descending=False)

    def partial(t: pa.Table) -> pa.Table:
        r = t.column("rank").to_numpy()
        x = t.column("x").to_numpy()
        return pa.table({
            "n_users": pa.array([t.num_rows], pa.int64()),
            "sum_x": pa.array([int(x.sum())], pa.int64()),
            "sum_rx": pa.array([int((r * x).sum())], pa.int64())})

    s = collect_small_arrow(ranked.map_batches(
        partial, batch_format="pyarrow")).to_pandas().sum()
    n, sx, srx = int(s.n_users), int(s.sum_x), int(s.sum_rx)
    gini_num = 2 * srx - (n + 1) * sx
    return pd.DataFrame({
        "n_users": pd.Series([n], dtype="int64"),
        "sum_events": pd.Series([sx], dtype="int64"),
        "gini_num": pd.Series([gini_num], dtype="int64")})


def user_activity_gini_sql() -> str:
    return """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
r AS (SELECT n,
             row_number() OVER (ORDER BY n ASC, user_id ASC) AS rk,
             count(*) OVER () AS nu,
             SUM(n) OVER () AS sx
      FROM c)
SELECT CAST(ANY_VALUE(nu) AS BIGINT) AS n_users,
       CAST(ANY_VALUE(sx) AS BIGINT) AS sum_events,
       CAST(2 * SUM(rk * n) - (ANY_VALUE(nu) + 1) * ANY_VALUE(sx)
            AS BIGINT) AS gini_num
FROM r"""




# ---------------------------------------------------------------------------
# zone-map pruning audit: Morton layout vs single-key range layout
# ---------------------------------------------------------------------------

def zonemap_prune_audit(sf_dir: str, shift: int = 16, pshift: int = 3):
    """Zone-map (min/max pruning-index) audit: bucket ``lineitem`` rows
    under two physical layouts — the Morton/z-order clustering of
    :func:`lineitem_zorder_stats` and a plain single-key range layout
    (``l_partkey >> pshift``) — and replay four rectangle predicates
    (both-key low / both-key high / part-band / supp-band quartile
    boxes derived from the global bounds) against each layout's
    per-zone bounding boxes.  Per (layout, predicate): zones total,
    zones a min/max check prunes, rows the unpruned zones would scan,
    and the true matching rows — the quantified "z-order makes BOTH
    columns prunable, single-key order only one" claim a table
    optimizer acts on.

    Scale shape: pass 1 reduces to 4 global bounds (per-block int64
    partials); pass 2 emits per-batch pre-aggregated zone partials for
    BOTH layouts into ONE (layout, bucket)-keyed exact aggregate — the
    collected result IS the pruning index a writer persists,
    zone-domain-sized by construction; pass 3 counts true matches with
    vectorized interval masks (per-block 4-int partials).  The
    cross-product replay runs over the zone index driver-side.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    def keys(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        x = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy(
            zero_copy_only=False)
        y = pc.cast(t.column("l_suppkey"), pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(x) and (x.min() < 0 or y.min() < 0
                       or max(x.max(), y.max()) >= (1 << 31)):
            raise ValueError("zonemap_prune_audit: keys outside [0, 2^31)")
        return x, y

    def bounds_partial(t: pa.Table) -> pa.Table:
        x, y = keys(t)
        if not len(x):
            return pa.table({c: pa.array([], pa.int64())
                             for c in ("mnp", "mxp", "mns", "mxs")})
        return pa.table({"mnp": pa.array([int(x.min())], pa.int64()),
                         "mxp": pa.array([int(x.max())], pa.int64()),
                         "mns": pa.array([int(y.min())], pa.int64()),
                         "mxs": pa.array([int(y.max())], pa.int64())})

    bt = collect_small_arrow(
        ds.map_batches(bounds_partial, batch_format="pyarrow")).to_pandas()
    mnp, mxp = int(bt["mnp"].min()), int(bt["mxp"].max())
    mns, mxs = int(bt["mns"].min()), int(bt["mxs"].max())

    # the four quartile-box predicates (pure integer floor division —
    # identical to the oracle's BIGINT // math on non-negative keys)
    preds = [
        (0, mnp, mnp + (mxp - mnp) // 2, mns, mns + (mxs - mns) // 2),
        (1, mnp + (mxp - mnp) // 2 + 1, mxp, mns + (mxs - mns) // 2 + 1, mxs),
        (2, mnp + (mxp - mnp) // 4, mnp + 3 * (mxp - mnp) // 4, mns, mxs),
        (3, mnp, mxp, mns + (mxs - mns) // 4, mns + 3 * (mxs - mns) // 4),
    ]

    def zone_partial(t: pa.Table) -> pa.Table:
        x, y = keys(t)
        morton = ((_spread_bits(x) | (_spread_bits(y) << np.uint64(1)))
                  >> np.uint64(shift)).astype(np.int64)
        frames = []
        for layout, bucket in (("morton", morton), ("prange", x >> pshift)):
            g = (pd.DataFrame({"bucket": bucket, "p": x, "s": y})
                 .groupby("bucket", sort=False)
                 .agg(n=("p", "size"), min_p=("p", "min"),
                      max_p=("p", "max"), min_s=("s", "min"),
                      max_s=("s", "max")).reset_index())
            g.insert(0, "layout", layout)
            frames.append(g)
        out = pd.concat(frames, ignore_index=True)
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    zones = collect_small_arrow(grouped_aggregate(
        ds.map_batches(zone_partial, batch_format="pyarrow"),
        ["layout", "bucket"],
        [("n", "sum", "n"),
         ("min_p", "min", "min_p"), ("max_p", "max", "max_p"),
         ("min_s", "min", "min_s"), ("max_s", "max", "max_s")])
    ).to_pandas()

    def match_partial(t: pa.Table) -> pa.Table:
        x, y = keys(t)
        cnt = [int(((x >= lp) & (x <= hp) & (y >= ls) & (y <= hs)).sum())
               for _, lp, hp, ls, hs in preds]
        return pa.table({"pred_id": pa.array(range(len(preds)), pa.int64()),
                         "matched": pa.array(cnt, pa.int64())})

    mt = collect_small_arrow(
        ds.map_batches(match_partial, batch_format="pyarrow")).to_pandas()
    matched = mt.groupby("pred_id")["matched"].sum()

    rows = []
    for layout in ("morton", "prange"):
        z = zones[zones["layout"] == layout]
        for pid, lp, hp, ls, hs in preds:
            pruned = ((z["max_p"] < lp) | (z["min_p"] > hp)
                      | (z["max_s"] < ls) | (z["min_s"] > hs))
            rows.append((layout, pid, len(z), int(pruned.sum()),
                         int(z.loc[~pruned, "n"].sum()),
                         int(matched.get(pid, 0))))
    return pa.table({
        "layout": pa.array([r[0] for r in rows]),
        "pred_id": pa.array([r[1] for r in rows], pa.int64()),
        "zones_total": pa.array([r[2] for r in rows], pa.int64()),
        "zones_pruned": pa.array([r[3] for r in rows], pa.int64()),
        "rows_scanned": pa.array([r[4] for r in rows], pa.int64()),
        "rows_matched": pa.array([r[5] for r in rows], pa.int64())})


def zonemap_prune_audit_sql(shift: int = 16, pshift: int = 3) -> str:
    """Oracle: the identical Morton cascade, quartile predicates and
    bbox prune test in one query (zones/bounds MATERIALIZED — each is
    referenced per predicate)."""
    def spread(col: str) -> str:
        e = col
        for sh, mask in _MORTON_MASKS:
            e = f"(({e} | ({e} << {sh})) & {mask})"
        return e

    morton = f"({spread('part')} | ({spread('supp')} << 1)) >> {shift}"
    return f"""
WITH src AS MATERIALIZED (
  SELECT CAST(l_partkey AS BIGINT) AS part,
         CAST(l_suppkey AS BIGINT) AS supp
  FROM lineitem),
bounds AS MATERIALIZED (
  SELECT min(part) AS mnp, max(part) AS mxp,
         min(supp) AS mns, max(supp) AS mxs
  FROM src),
preds AS MATERIALIZED (
  SELECT 0 AS pred_id, mnp AS lo_p, mnp + (mxp - mnp) // 2 AS hi_p,
         mns AS lo_s, mns + (mxs - mns) // 2 AS hi_s FROM bounds
  UNION ALL
  SELECT 1, mnp + (mxp - mnp) // 2 + 1, mxp,
         mns + (mxs - mns) // 2 + 1, mxs FROM bounds
  UNION ALL
  SELECT 2, mnp + (mxp - mnp) // 4, mnp + 3 * (mxp - mnp) // 4,
         mns, mxs FROM bounds
  UNION ALL
  SELECT 3, mnp, mxp,
         mns + (mxs - mns) // 4, mns + 3 * (mxs - mns) // 4 FROM bounds),
zones AS MATERIALIZED (
  SELECT 'morton' AS layout, {morton} AS bucket,
         count(*) AS n, min(part) AS min_p, max(part) AS max_p,
         min(supp) AS min_s, max(supp) AS max_s
  FROM src GROUP BY bucket
  UNION ALL
  SELECT 'prange', part >> {pshift},
         count(*), min(part), max(part), min(supp), max(supp)
  FROM src GROUP BY part >> {pshift}),
joined AS (
  SELECT z.layout, pr.pred_id, z.n,
         (z.max_p < pr.lo_p OR z.min_p > pr.hi_p
          OR z.max_s < pr.lo_s OR z.min_s > pr.hi_s) AS pruned
  FROM zones z CROSS JOIN preds pr),
agg AS (
  SELECT layout, pred_id,
         CAST(count(*) AS BIGINT) AS zones_total,
         CAST(coalesce(sum(CASE WHEN pruned THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS zones_pruned,
         CAST(coalesce(sum(CASE WHEN NOT pruned THEN n ELSE 0 END), 0)
              AS BIGINT) AS rows_scanned
  FROM joined GROUP BY layout, pred_id),
m AS (
  SELECT pr.pred_id, count(*) AS rows_matched
  FROM src JOIN preds pr
    ON src.part BETWEEN pr.lo_p AND pr.hi_p
   AND src.supp BETWEEN pr.lo_s AND pr.hi_s
  GROUP BY pr.pred_id)
SELECT a.layout, CAST(a.pred_id AS BIGINT) AS pred_id, a.zones_total,
       a.zones_pruned, a.rows_scanned,
       CAST(coalesce(m.rows_matched, 0) AS BIGINT) AS rows_matched
FROM agg a LEFT JOIN m ON m.pred_id = a.pred_id"""
