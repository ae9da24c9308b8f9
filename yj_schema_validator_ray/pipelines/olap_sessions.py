"""Session / interval / experiment OLAP waves 8-11 — split from ``pipelines/olap.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``olap`` module re-exports everything, so the import surface —
``from ..pipelines import olap as OL`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

def orders_allen_intervals(sf_dir: str, coarse: int = 1024):
    """Allen's interval-algebra audit: classify every lineitem's ship
    window against its parent order's fulfillment window into the 13
    mutually-exclusive Allen relations and count each — the temporal
    conformance profile (how shipping activity sits inside the promised
    window) and the algebra layer under as-of / range joins.

    Intervals in exact integer DAYS (timestamps are midnight-aligned):
    order window a = [orderdate, orderdate + 30]; ship window
    b = [shipdate, shipdate + (linenumber % 7) + 1] (the deterministic
    width stands in for the absent receiptdate column).

    Shape: the standard order-grain pattern — lineitem rows carry only
    (orderkey, b1, b2) int64 triples through one coarse-hash exchange
    to meet the orders side's (orderkey, a1) rows; the per-bucket
    classify is pure vectorized numpy; output is <= 13 rows.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        a1 = pc.divide(pc.cast(t.column("o_orderdate"), pa.int64()),
                       pa.scalar(DAY_US, pa.int64()))
        n = t.num_rows
        return pa.table({
            "okey": keys, "x1": a1,
            "x2": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_orderkey"), pa.int64())
        b1 = pc.divide(pc.cast(t.column("l_shipdate"), pa.int64()),
                       pa.scalar(DAY_US, pa.int64())).to_numpy()
        width = pc.cast(t.column("l_linenumber"), pa.int64()).to_numpy() % 7 + 1
        return pa.table({
            "okey": keys,
            "x1": pa.array(b1, pa.int64()),
            "x2": pa.array(b1 + width, pa.int64()),
            "side": pa.array(np.ones(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    REL = ["equals", "before", "meets", "overlaps", "starts", "during",
           "finishes", "after", "met_by", "overlapped_by", "started_by",
           "contains", "finished_by"]

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty or not (g["side"] == 1).any():
            return pd.DataFrame({"relation": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        o = g.loc[g["side"] == 0, ["okey", "x1"]].rename(
            columns={"x1": "a1"})
        li = g.loc[g["side"] == 1, ["okey", "x1", "x2"]].rename(
            columns={"x1": "b1", "x2": "b2"})
        j = li.merge(o, on="okey", how="inner")
        a1 = j["a1"].to_numpy()
        a2 = a1 + 30
        b1, b2 = j["b1"].to_numpy(), j["b2"].to_numpy()
        code = np.select(
            [(b1 == a1) & (b2 == a2), b2 < a1, b2 == a1,
             (b1 < a1) & (b2 > a1) & (b2 < a2), (b1 == a1) & (b2 < a2),
             (b1 > a1) & (b2 < a2), (b2 == a2) & (b1 > a1), b1 > a2,
             b1 == a2, (b1 > a1) & (b1 < a2) & (b2 > a2),
             (b1 == a1) & (b2 > a2), (b1 < a1) & (b2 > a2),
             (b2 == a2) & (b1 < a1)],
            np.arange(13), default=-1)
        cnt = np.bincount(code, minlength=13)
        keep = cnt > 0
        return pd.DataFrame({
            "relation": [r for r, k in zip(REL, keep) if k],
            "n": cnt[keep].astype("int64")})

    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_orderdate"])
         .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate",
                                         "l_linenumber"])
          .map_batches(li_side, batch_format="pyarrow"))
    parts = (o.union(li)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["relation"], [("n", "sum", "n")])


def orders_allen_intervals_sql() -> str:
    return """
WITH iv AS (
  SELECT CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS a1,
         CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) + 30
           AS a2,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT) AS b1,
         CAST(epoch_us(l.l_shipdate) // 86400000000 AS BIGINT)
           + (l.l_linenumber % 7) + 1 AS b2
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
lab AS (
  SELECT CASE
    WHEN b1 = a1 AND b2 = a2 THEN 'equals'
    WHEN b2 < a1 THEN 'before'
    WHEN b2 = a1 THEN 'meets'
    WHEN b1 < a1 AND b2 > a1 AND b2 < a2 THEN 'overlaps'
    WHEN b1 = a1 AND b2 < a2 THEN 'starts'
    WHEN b1 > a1 AND b2 < a2 THEN 'during'
    WHEN b2 = a2 AND b1 > a1 THEN 'finishes'
    WHEN b1 > a2 THEN 'after'
    WHEN b1 = a2 THEN 'met_by'
    WHEN b1 > a1 AND b1 < a2 AND b2 > a2 THEN 'overlapped_by'
    WHEN b1 = a1 AND b2 > a2 THEN 'started_by'
    WHEN b1 < a1 AND b2 > a2 THEN 'contains'
    WHEN b2 = a2 AND b1 < a1 THEN 'finished_by'
  END AS relation FROM iv)
SELECT relation, CAST(count(*) AS BIGINT) AS n
FROM lab GROUP BY relation"""


def events_value_ma_range(sf_dir: str, window_min: int = 10,
                          coarse: int = 1024):
    """Time-RANGE window frame: per event, the trailing sum of the SAME
    user's value-cents over [ts - 10 min, ts] — the RANGE BETWEEN
    INTERVAL frame (sparse, irregular series), complementing the
    rows-based events_dau_ma7.  RANGE semantics exactly: every peer row
    with equal ts is included regardless of ordering.

    Shape: one user-keyed coarse exchange of (user, ts_us, event_id,
    cents) int64 rows; per bucket one lexsort + per-user-segment
    prefix-sum with two vectorized searchsorted probes (no per-row
    loop, no self-join).  Output is event-grain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    W_US = window_min * 60 * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "cents": pc.cast(pc.round(pc.multiply(
                t.column("value"), pa.scalar(100.0))), pa.int64()),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "trailing_cents": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        w = g["cents"].to_numpy()
        order = np.lexsort((eid, ts, u))
        u, ts, eid, w = u[order], ts[order], eid[order], w[order]
        starts = np.concatenate(([0], np.flatnonzero(u[1:] != u[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(u)]))
        cum = np.concatenate(([0], np.cumsum(w)))
        out = np.empty(len(u), np.int64)
        for s, e in zip(starts, ends):  # per USER segment (few, small)
            seg = ts[s:e]
            lo = s + np.searchsorted(seg, seg - W_US, side="left")
            hi = s + np.searchsorted(seg, seg, side="right")
            out[s:e] = cum[hi] - cum[lo]
        return pd.DataFrame({"event_id": eid, "user_id": u,
                             "trailing_cents": out})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "value"])
    return (ev.map_batches(rows, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(trailing, batch_format="pandas"))


def events_value_ma_range_sql(window_min: int = 10) -> str:
    return f"""
SELECT CAST(event_id AS BIGINT) AS event_id,
       CAST(user_id AS BIGINT) AS user_id,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL {window_min} MINUTE PRECEDING
               AND CURRENT ROW) AS BIGINT) AS trailing_cents
FROM events"""


def events_cusum_alarm(sf_dir: str):
    """Sequential change detection (one-sided CUSUM / SPC) on each
    event type's daily count series: S_t = max(0, S_{t-1} + x_t - k)
    with reference k = that type's floor-mean daily count, alarming
    when the cumulative excess tops one average day (S_t > k).  The
    recursion is evaluated CLOSED-FORM — S_t = C_t - min(0, running
    min C_j) with C the cumsum of (x - k) — so both sides are pure
    window algebra over exact integers (the sequential-detection
    companion to the pointwise z-gate in :func:`events_burst_days`).

    Shape: one (type, day)-keyed count exchange; the CUSUM sweep runs
    on the collected day-domain series (calendar-bounded at any
    scale), Python ints driver-side vs HUGEINT in the oracle.
    """
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
    d = d.sort_values(["event_type", "day"]).reset_index(drop=True)
    s_out, alarm_out = [], []
    for _, g in d.groupby("event_type", sort=False):
        x = [int(v) for v in g["n_events"]]
        k = sum(x) // len(x)
        cum, run_min, s = 0, 0, []
        for v in x:
            cum += v - k
            run_min = min(run_min, cum)
            s.append(cum - min(0, run_min))
        s_out.extend(s)
        alarm_out.extend([v > k for v in s])
    d["s_stat"] = pd.Series(s_out, dtype="int64")
    d["alarm"] = pd.Series(alarm_out, dtype="bool")
    d["n_events"] = d["n_events"].astype("int64")
    return pa.Table.from_pandas(d, preserve_index=False)


def events_cusum_alarm_sql() -> str:
    return """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS x
  FROM events GROUP BY 1, 2),
k AS (SELECT event_type, sum(x) // count(*) AS kk FROM d GROUP BY 1),
c AS (
  SELECT d.event_type, d.day, d.x, k.kk,
         sum(d.x - k.kk) OVER (PARTITION BY d.event_type ORDER BY d.day
                               ROWS UNBOUNDED PRECEDING) AS cum
  FROM d JOIN k USING (event_type)),
m AS (
  SELECT event_type, day, x, kk, cum,
         least(0, min(cum) OVER (PARTITION BY event_type ORDER BY day
                                 ROWS UNBOUNDED PRECEDING)) AS mn
  FROM c)
SELECT event_type, day, CAST(x AS BIGINT) AS n_events,
       CAST(cum - mn AS BIGINT) AS s_stat,
       (cum - mn) > kk AS alarm
FROM m"""


def orders_backlog_age_buckets(sf_dir: str, coarse: int = 1024):
    """Backlog aging report as of a snapshot date (1998-01-01): orders
    placed by then whose lineitems are not all shipped (or that have
    no lineitems) are bucketed by age in days — the WIP/receivables
    aging statement.

    Shape: the orders side prunes at the read (o_orderdate <= D pushed
    into read_parquet); lineitem ships only per-batch (orderkey,
    max_ship) partials; one coarse-hash exchange merges them and emits
    bucket-count partials; output is <= 4 rows.
    """
    import pyarrow.dataset as pds
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    D_US = 883_612_800_000_000  # 1998-01-01T00:00:00Z epoch us
    DAY_US = 86_400_000_000

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        age = (D_US - pc.cast(t.column("o_orderdate"),
                              pa.int64()).to_numpy()) // DAY_US
        return pa.table({
            "okey": keys,
            "v": pa.array(age, pa.int64()),
            "side": pa.array(np.zeros(t.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                       "ship_us": pc.cast(t.column("l_shipdate"),
                                          pa.int64())})
             .group_by(["okey"]).aggregate([("ship_us", "max")])
             .rename_columns(["okey", "v"]))
        kk = g.column("okey")
        return pa.table({
            "okey": kk, "v": g.column("v"),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def buckets(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"age_bucket": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 0).any():
            return pd.DataFrame(cols)
        o = g.loc[g["side"] == 0, ["okey", "v"]].rename(
            columns={"v": "age"})
        ms = (g.loc[g["side"] == 1, ["okey", "v"]]
              .groupby("okey", as_index=False).max()
              .rename(columns={"v": "last_ship"}))
        j = o.merge(ms, on="okey", how="left")
        open_mask = j["last_ship"].isna() | (j["last_ship"] > D_US)
        age = j.loc[open_mask, "age"].to_numpy()
        lab = np.where(age <= 30, "0-30",
                       np.where(age <= 90, "31-90",
                                np.where(age <= 365, "91-365", "365+")))
        v, c = np.unique(lab, return_counts=True)
        return pd.DataFrame({"age_bucket": v,
                             "n_orders": c.astype("int64")})

    o = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"],
        filter=(pds.field("o_orderdate")
                <= pa.scalar(D_US, pa.timestamp("us"))))
        .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_shipdate"])
          .map_batches(li_side, batch_format="pyarrow"))
    parts = (o.union(li)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(buckets, batch_format="pandas"))
    return grouped_aggregate(parts, ["age_bucket"],
                             [("n_orders", "sum", "n_orders")])


def orders_backlog_age_buckets_sql() -> str:
    return """
WITH ms AS (SELECT l_orderkey, max(l_shipdate) AS last_ship
            FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT (epoch_us(TIMESTAMP '1998-01-01')
          - epoch_us(o.o_orderdate)) // 86400000000 AS age_days,
         (ms.last_ship IS NULL
          OR ms.last_ship > TIMESTAMP '1998-01-01') AS is_open
  FROM orders o LEFT JOIN ms ON ms.l_orderkey = o.o_orderkey
  WHERE o.o_orderdate <= TIMESTAMP '1998-01-01')
SELECT CASE WHEN age_days <= 30 THEN '0-30'
            WHEN age_days <= 90 THEN '31-90'
            WHEN age_days <= 365 THEN '91-365'
            ELSE '365+' END AS age_bucket,
       CAST(count(*) AS BIGINT) AS n_orders
FROM j WHERE is_open GROUP BY 1"""


def events_autocorr_lag1(sf_dir: str):
    """Lag-1 autocorrelation of each event type's daily count series,
    reported as EXACT INTEGER Pearson numerators — n*Σab − Σa*Σb and
    the two variance terms — so the fp correlation r stays downstream
    where fp is allowed (the persistence/seasonality screen next to
    :func:`events_burst_days` and :func:`events_cusum_alarm`).
    Python-int driver math vs HUGEINT in the oracle; at extreme daily
    counts the BIGINT output cast is the documented bound.

    Shape: one (type, day)-keyed count exchange; the lag pairing runs
    on the collected day-domain series (calendar-bounded)."""
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
        ["event_type", "day"], [("", "count", "n")])).to_pandas()
    d = d.sort_values(["event_type", "day"]).reset_index(drop=True)
    rows = []
    for et, g in d.groupby("event_type", sort=False):
        x = [int(v) for v in g["n"]]
        if len(x) < 2:
            # single-day series has no lag pairs: the oracle's WHERE
            # b IS NOT NULL drops the type entirely — mirror that
            continue
        a, b = x[1:], x[:-1]
        n = len(a)
        sa, sb = sum(a), sum(b)
        rows.append({
            "event_type": et, "n_pairs": n,
            "cov_num": n * sum(p * q for p, q in zip(a, b)) - sa * sb,
            "var_a_num": n * sum(v * v for v in a) - sa * sa,
            "var_b_num": n * sum(v * v for v in b) - sb * sb})
    out = pd.DataFrame(rows, columns=["event_type", "n_pairs", "cov_num",
                                      "var_a_num", "var_b_num"])
    for c in ("n_pairs", "cov_num", "var_a_num", "var_b_num"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def events_autocorr_lag1_sql() -> str:
    return """
WITH d AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS x
  FROM events GROUP BY 1, 2),
p AS (
  SELECT event_type, x AS a,
         lag(x) OVER (PARTITION BY event_type ORDER BY day) AS b
  FROM d),
q AS (SELECT event_type, a, b FROM p WHERE b IS NOT NULL)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(count(*) * sum(a * b) - sum(a) * sum(b) AS BIGINT)
         AS cov_num,
       CAST(count(*) * sum(a * a) - sum(a) * sum(a) AS BIGINT)
         AS var_a_num,
       CAST(count(*) * sum(b * b) - sum(b) * sum(b) AS BIGINT)
         AS var_b_num
FROM q GROUP BY event_type"""


SESSION_PATTERNS = ("view.*purchase", "view.*click.*purchase",
                    "error.*error")


def session_path_match(sf_dir: str, gap_s: int = 1800,
                       coarse: int = 1024):
    """Behavioral-pattern mining over sessionized paths: sessions are
    cut at 30-min idle gaps (the events_sessions rule, ties broken by
    event_id), each session's ordered event-type path is joined into a
    'a>b>c' string, and every pattern in ``SESSION_PATTERNS`` reports
    how many sessions match its regex — funnel queries expressed as
    path regexes instead of fixed step joins.

    Shape: one user-keyed exchange of (user, ts_us, event_id, type)
    rows; per bucket a vectorized lexsort + gap cumsum builds session
    ids, a pandas groupby joins paths (session-domain sized), and the
    compiled regexes scan path strings; output is len(patterns) rows.
    """
    import re

    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    gap_us = gap_s * 1_000_000
    pats = [(p, re.compile(p)) for p in SESSION_PATTERNS]

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def match(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"pattern": pd.Series(dtype="object"),
                "n_sessions": pd.Series(dtype="int64"),
                "n_matching": pd.Series(dtype="int64")}
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
        sid = np.cumsum(new_sess)
        paths = (pd.Series(et).groupby(sid).agg(">".join))
        n = len(paths)
        return pd.DataFrame({
            "pattern": [p for p, _ in pats],
            "n_sessions": np.full(len(pats), n, np.int64),
            "n_matching": np.array(
                [int(sum(1 for s in paths if rx.search(s)))
                 for _, rx in pats], np.int64)})

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(match, batch_format="pandas"))
    return grouped_aggregate(parts, ["pattern"],
                             [("n_sessions", "sum", "n_sessions"),
                              ("n_matching", "sum", "n_matching")])


def session_path_match_sql(gap_s: int = 1800) -> str:
    pat_rows = " UNION ALL ".join(
        f"SELECT '{p}' AS pattern" for p in SESSION_PATTERNS)
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
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM s GROUP BY user_id, sid),
pats AS ({pat_rows})
SELECT pats.pattern,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(*) FILTER (WHERE regexp_matches(p.path, pats.pattern))
            AS BIGINT) AS n_matching
FROM p, pats GROUP BY pats.pattern"""


def event_type_overlap(sf_dir: str, coarse: int = 256):
    """Audience-overlap matrix: for every ordered event-type pair
    (a < b), how many distinct users did BOTH — the co-occurrence /
    bitmap-intersection query behind audience planning ("view AND
    purchase").  Includes the diagonal (a = a: distinct users of a).

    Shape: per-batch DISTINCT (user, type) partials -> one user-keyed
    exchange dedupes globally -> each user's type set (<= |types|)
    expands to its ordered pairs INSIDE the bucket (bounded |types|^2
    per user, vectorized via merge on user) -> pair-domain count
    exchange.  No user list ever reaches the driver.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def pairs_rows(t: pa.Table) -> pa.Table:
        g = (t.select(["user_id", "event_type"])
             .group_by(["user_id", "event_type"]).aggregate([]))
        keys = pc.cast(g.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys, "event_type": g.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"type_a": pd.Series(dtype="object"),
                "type_b": pd.Series(dtype="object"),
                "n_users": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        d = g[["user_id", "event_type"]].drop_duplicates()
        j = d.merge(d, on="user_id", suffixes=("_a", "_b"))
        j = j[j["event_type_a"] <= j["event_type_b"]]
        r = (j.groupby(["event_type_a", "event_type_b"], as_index=False)
             .agg(n_users=("user_id", "nunique")))
        r.columns = ["type_a", "type_b", "n_users"]
        r["n_users"] = r["n_users"].astype("int64")
        return r

    parts = (ev.map_batches(pairs_rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(expand, batch_format="pandas"))
    return grouped_aggregate(parts, ["type_a", "type_b"],
                             [("n_users", "sum", "n_users")])


def event_type_overlap_sql() -> str:
    return """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
SELECT a.event_type AS type_a, b.event_type AS type_b,
       CAST(count(*) AS BIGINT) AS n_users
FROM d a JOIN d b ON a.user_id = b.user_id
                 AND a.event_type <= b.event_type
GROUP BY a.event_type, b.event_type"""


def embedding_label_scatter(emb_ds):
    """Per-label WITHIN-CLASS scatter (the Fisher / LDA separability
    numerator): for each label, n_vecs and the exact integer
    sum-over-dims of n*Σx² − (Σx)² on the 1e-6-quantized components —
    n times the within-class sum of squares, so no rational mean ever
    enters the certificate.  The embedding-space companion to the
    clustering-quality ops (is this label a tight cluster or a cloud?).

    Shape: per batch the (n, d) matrix collapses to (labels × d)
    (n, Σx, Σx²) int64 partials — vectors never reach the exchange —
    then one (label, dim)-keyed exchange and a label-domain reduce.
    Products n·Σx² stay under int64 at any realistic per-label count;
    the oracle computes in HUGEINT and the output cast is the bound.
    """
    from ..stages.ann import _list_f64_matrix
    from ..stages.exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        m = _list_f64_matrix(t.column("embedding"))
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        labels = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uniq, inv = np.unique(labels, return_inverse=True)
        d = q.shape[1]
        s1 = np.zeros((len(uniq), d), np.int64)
        s2 = np.zeros((len(uniq), d), np.int64)
        np.add.at(s1, inv, q)
        np.add.at(s2, inv, q * q)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table({
            "label": pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                    len(uniq))),
            "n": pa.array(np.repeat(counts, d)),
            "s1": pa.array(s1.reshape(-1)),
            "s2": pa.array(s2.reshape(-1))})

    pd_ = grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["label", "dim"],
        [("n", "sum", "n"), ("s1", "sum", "s1"), ("s2", "sum", "s2")])

    # the (label x dim) table is DOMAIN-sized; finish the n*s2 - s1^2
    # term driver-side in arbitrary-precision Python ints — numpy int64
    # wraps SILENTLY near 9.2e18 while the HUGEINT oracle keeps going
    # (the final BIGINT cast is the only bound, asserted explicitly)
    from ..util import collect_small_arrow

    pdf = collect_small_arrow(pd_).to_pandas()
    acc: dict[int, list[int]] = {}
    for lab, n, a, b in zip(pdf["label"], pdf["n"], pdf["s1"],
                            pdf["s2"]):
        e = acc.setdefault(int(lab), [0, 0])
        e[0] = max(e[0], int(n))
        e[1] += int(n) * int(b) - int(a) * int(a)
    rows = sorted(acc.items())
    assert all(abs(w) < 2**63 for _, (_, w) in rows), \
        "wss_num exceeds int64 — mirror the oracle's HUGEINT overflow"
    import pandas as _pd
    return _pd.DataFrame({
        "label": _pd.Series([k for k, _ in rows], dtype="int64"),
        "n_vecs": _pd.Series([v[0] for _, v in rows], dtype="int64"),
        "wss_num": _pd.Series([v[1] for _, v in rows], dtype="int64")})


def embedding_label_scatter_sql() -> str:
    return """
WITH el AS (
  SELECT CAST(label AS BIGINT) AS label,
         unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
pd AS (
  SELECT label, dim, count(*) AS n, sum(xq) AS s1, sum(xq * xq) AS s2
  FROM el GROUP BY label, dim)
SELECT label, CAST(max(n) AS BIGINT) AS n_vecs,
       CAST(sum(n * s2 - s1 * s1) AS BIGINT) AS wss_num
FROM pd GROUP BY label"""


def log_parse_roundtrip(sf_dir: str):
    """Raw-log ETL certificate: events are FORMATTED into classic
    key=value log lines per batch (ts_us/user/type/cents), then PARSED
    back with one RE2 ``pc.extract_regex`` named-group kernel (no
    Python per row) and aggregated per type — proving the parse layer
    is lossless against the typed-source oracle, the way a real
    pipeline certifies its log parser against structured ground truth.

    Shape: format + parse + partial all inside one zero-shuffle
    map_batches; one type-domain exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    PAT = (r"^ts=(?P<ts>\d+) user=(?P<user>\d+) "
           r"type=(?P<type>\w+) val=(?P<val>-?\d+)$")

    def roundtrip(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                             pa.scalar(100.0))), pa.int64())
        line = pc.binary_join_element_wise(
            "ts=", pc.cast(pc.cast(t.column("ts"), pa.int64()),
                           pa.string()),
            " user=", pc.cast(pc.cast(t.column("user_id"), pa.int64()),
                              pa.string()),
            " type=", t.column("event_type"),
            " val=", pc.cast(cents, pa.string()), "")
        f = pc.extract_regex(line, pattern=PAT)
        if isinstance(f, pa.ChunkedArray):
            f = f.combine_chunks()
        parsed_type = f.field("type")
        parsed_val = pc.cast(f.field("val"), pa.int64())
        return (pa.table({"event_type": parsed_type,
                          "n_events": pa.array(np.ones(len(parsed_type),
                                                       np.int64)),
                          "sum_cents": parsed_val})
                .group_by(["event_type"])
                .aggregate([("n_events", "sum"), ("sum_cents", "sum")])
                .rename_columns(["event_type", "n_events", "sum_cents"]))

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "event_type",
                                        "value"])
    return grouped_aggregate(
        ev.map_batches(roundtrip, batch_format="pyarrow"),
        ["event_type"], [("n_events", "sum", "n_events"),
                         ("sum_cents", "sum", "sum_cents")])


def log_parse_roundtrip_sql() -> str:
    # the oracle is the TYPED source: parse-roundtrip must be lossless
    return """
SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_cents
FROM events GROUP BY event_type"""


def events_debounce(sf_dir: str, window_s: int = 259_200,
                    coarse: int = 1024):
    """Telemetry throttle/debounce accounting: an event is KEPT if it
    is the first of its (user, type) stream or arrives more than
    ``window_s`` (default 3 days — sized to this corpus's sparse
    per-stream cadence so the rule actually drops rows) after the
    previous event of that stream (previous
    EVENT, not previous kept — the stateless throttle rule, so both
    sides are pure lag algebra); report kept/total per type.

    Shape: one (user)-keyed exchange of int64 rows; per bucket one
    lexsort + vectorized diff against the (user, type) run structure;
    output is type-domain.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    w_us = window_s * 1_000_000

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        return pa.table({
            "user_id": keys,
            "ts_us": pc.cast(t.column("ts"), pa.int64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
            "event_type": t.column("event_type"),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def debounce(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"event_type": pd.Series(dtype="object"),
                "n_total": pd.Series(dtype="int64"),
                "n_kept": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        u = g["user_id"].to_numpy()
        et = g["event_type"].to_numpy()
        ts = g["ts_us"].to_numpy()
        eid = g["event_id"].to_numpy()
        order = np.lexsort((eid, ts, et, u))
        u, et, ts = u[order], et[order], ts[order]
        same_run = np.concatenate(
            ([False], (u[1:] == u[:-1]) & (et[1:] == et[:-1])))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        kept = (~same_run) | (gap > w_us)
        out = pd.DataFrame({"event_type": et,
                            "n_total": np.ones(len(et), np.int64),
                            "n_kept": kept.astype("int64")})
        return out.groupby("event_type", as_index=False).sum()

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "ts", "user_id",
                                        "event_type"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(debounce, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type"],
                             [("n_total", "sum", "n_total"),
                              ("n_kept", "sum", "n_kept")])


def events_debounce_sql(window_s: int = 259_200) -> str:
    return f"""
WITH l AS (
  SELECT event_type,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY user_id, event_type
           ORDER BY ts, event_id) AS gap_us
  FROM events)
SELECT event_type, CAST(count(*) AS BIGINT) AS n_total,
       CAST(count(*) FILTER (WHERE gap_us IS NULL
                             OR gap_us > {window_s * 1_000_000})
            AS BIGINT) AS n_kept
FROM l GROUP BY event_type"""


def ab_test_report(sf_dir: str, coarse: int = 1024):
    """Experiment analysis: users are assigned to control/treatment by
    the md5-parity rule (md5(user)[:8] first hex digit < '8' ->
    control — deterministic, mirrors in SQL), and the report gives per
    variant: users, converters (>=1 purchase), total purchases, and
    purchase value in integer cents — the conversion-lift table whose
    fp ratios live downstream.  The assignment hash is the same
    sampling convention the md5-rule operators share, so bucketing is
    stable across reruns/epochs (a real experimentation requirement).

    Shape: per-batch (user, is_purchase, cents) partials -> one
    user-keyed exchange -> per-user fold + variant classify inside the
    bucket -> 2-row output exchange.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..stages.sampling import _hex8
    from ..util import shuffle_partitions

    def rows(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("user_id"), pa.int64())
        is_p = pc.cast(pc.equal(t.column("event_type"), "purchase"),
                       pa.int64())
        cents = pc.multiply(
            pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))), pa.int64()),
            is_p)
        g = (pa.table({"user_id": keys, "n_purchases": is_p,
                       "purchase_cents": cents})
             .group_by(["user_id"])
             .aggregate([("n_purchases", "sum"),
                         ("purchase_cents", "sum")])
             .rename_columns(["user_id", "n_purchases",
                              "purchase_cents"]))
        kk = g.column("user_id")
        return g.append_column(
            "__coarse", pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64()))

    def per_variant(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"variant": pd.Series(dtype="object"),
                "n_users": pd.Series(dtype="int64"),
                "n_converters": pd.Series(dtype="int64"),
                "n_purchases": pd.Series(dtype="int64"),
                "purchase_cents": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = g.groupby("user_id", as_index=False).sum()
        # the shared sampling hash rule (stages.sampling._hex8), first
        # hex digit as the variant coin
        hx = _hex8(int(u) for u in per["user_id"])
        per["variant"] = ["control" if h[0] < "8" else "treatment"
                          for h in hx]
        r = per.groupby("variant", as_index=False).agg(
            n_users=("user_id", "size"),
            n_converters=("n_purchases", lambda s: int((s > 0).sum())),
            n_purchases=("n_purchases", "sum"),
            purchase_cents=("purchase_cents", "sum"))
        for c in ("n_users", "n_converters", "n_purchases",
                  "purchase_cents"):
            r[c] = r[c].astype("int64")
        return r

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "value"])
    parts = (ev.map_batches(rows, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(per_variant, batch_format="pandas"))
    return grouped_aggregate(parts, ["variant"],
                             [("n_users", "sum", "n_users"),
                              ("n_converters", "sum", "n_converters"),
                              ("n_purchases", "sum", "n_purchases"),
                              ("purchase_cents", "sum",
                               "purchase_cents")])


def ab_test_report_sql() -> str:
    return """
WITH per AS (
  SELECT user_id,
         CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
           AS n_purchases,
         CAST(coalesce(sum(CAST(round(value * 100.0) AS BIGINT))
                       FILTER (WHERE event_type = 'purchase'), 0)
              AS BIGINT) AS purchase_cents
  FROM events GROUP BY user_id),
v AS (
  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
              THEN 'control' ELSE 'treatment' END AS variant,
         n_purchases, purchase_cents
  FROM per)
SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
       CAST(count(*) FILTER (WHERE n_purchases > 0) AS BIGINT)
         AS n_converters,
       CAST(sum(n_purchases) AS BIGINT) AS n_purchases,
       CAST(sum(purchase_cents) AS BIGINT) AS purchase_cents
FROM v GROUP BY variant"""

