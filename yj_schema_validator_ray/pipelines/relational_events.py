"""Relational waves 3-7: Q5/Q14, running totals, grouped analytics — split from ``pipelines/relational.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``relational`` module re-exports everything, so the import surface —
``from ..pipelines import relational as R`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational_common import (_period_index, _value_cents,
                                _window_start)  # noqa: F401

def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             year: str = "1996"):
    """TPC-H Q5-shaped local-supplier volume: revenue per nation where
    the CUSTOMER and the SUPPLIER sit in the same nation of one region.

    Ray-first plan for the 6-table join: region/nation are genuinely
    dimension-scale (broadcast as inline constants); customer and
    supplier SCALE with the fact tables, so their nationkey columns
    attach size-adaptively
    (:func:`~..stages.dimjoin.attach_dim_adaptive` — broadcast under a
    byte budget, coarse-hash exchange co-location above it, INNER so
    out-of-region rows drop).  The only unconditional large-large
    exchange is lineitem-partials JOIN orders on the order key
    (``Dataset.join`` hash shuffle); lineitem revenue is pre-aggregated
    per (orderkey, suppkey) per batch before any exchange, and the
    same-nation equality filter runs on the join output."""
    import ray
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{int(year) + 1}-01-01")

    nation = pa.concat_tables(ray.get(
        ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_arrow_refs()))
    region_t = pa.concat_tables(ray.get(
        ray.data.read_parquet(f"{sf_dir}/region.parquet").to_arrow_refs()))
    rkeys = {k for k, nm in zip(region_t.column("r_regionkey").to_pylist(),
                                region_t.column("r_name").to_pylist())
             if nm == region}
    nat_keys = [k for k, rk in zip(nation.column("n_nationkey").to_pylist(),
                                   nation.column("n_regionkey").to_pylist())
                if rk in rkeys]
    nat_names = dict(zip(nation.column("n_nationkey").to_pylist(),
                         nation.column("n_name").to_pylist()))
    # nation-domain constant (<=25 keys): legal inline broadcast
    in_region = pa.array(sorted(nat_keys), pa.int64())

    def region_only(key_col, nk_col):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.is_in(pc.cast(t.column(nk_col), pa.int64()),
                            value_set=in_region)
            sel = t.filter(keep)
            return pa.table({key_col: sel.column(key_col),
                             nk_col: pc.cast(sel.column(nk_col),
                                             pa.int64())})
        return f

    cust_dim = (ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"])
        .map_batches(region_only("c_custkey", "c_nationkey"),
                     batch_format="pyarrow"))
    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"])
        .map_batches(region_only("s_suppkey", "s_nationkey"),
                     batch_format="pyarrow"))

    def ord_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"),
                                     pa.scalar(lo)),
                    pc.less(t.column("o_orderdate"), pa.scalar(hi)))
        return t.filter(m).select(["o_orderkey", "o_custkey"])

    orders = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ord_prep, batch_format="pyarrow"),
        "o_custkey", cust_dim, "c_custkey", ["c_nationkey"], how="inner",
    ).map_batches(lambda t: t.select(["o_orderkey", "c_nationkey"]),
                  batch_format="pyarrow")

    def li_prep(t: pa.Table) -> pa.Table:
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), pa.int64())
        rev_e4 = pc.multiply(price_c,
                             pc.subtract(pa.scalar(100, pa.int64()),
                                         disc_c))
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "l_suppkey": t.column("l_suppkey"),
                       "revenue_e4": rev_e4})
        return (tt.group_by(["l_orderkey", "l_suppkey"])
                .aggregate([("revenue_e4", "sum")])
                .rename_columns(["l_orderkey", "l_suppkey",
                                 "revenue_e4"]))

    def li_project(t: pa.Table) -> pa.Table:
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "s_nationkey": pc.cast(t.column("s_nationkey"),
                                              pa.int64()),
                       "revenue_e4": t.column("revenue_e4")})
        return (tt.group_by(["l_orderkey", "s_nationkey"])
                .aggregate([("revenue_e4", "sum")])
                .rename_columns(["l_orderkey", "s_nationkey",
                                 "revenue_e4"]))

    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow"),
        "l_suppkey", supp_dim, "s_suppkey", ["s_nationkey"], how="inner",
    ).map_batches(li_project, batch_format="pyarrow")

    joined = li.join(orders, join_type="inner",
                     num_partitions=min(8, shuffle_partitions()),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    def same_nation(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("s_nationkey"),
                              t.column("c_nationkey")))
        return pa.table({"n_nationkey": t.column("s_nationkey"),
                         "revenue_e4": t.column("revenue_e4")})

    per_nation = grouped_aggregate(
        joined.map_batches(same_nation, batch_format="pyarrow"),
        ["n_nationkey"], [("revenue_e4", "sum", "revenue_e4")])

    def attach_name(t: pa.Table) -> pa.Table:
        names = [nat_names[k] for k in t.column("n_nationkey").to_pylist()]
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "revenue_e4": t.column("revenue_e4")})

    return (per_nation.map_batches(attach_name, batch_format="pyarrow")
            .sort(["revenue_e4", "n_name"], descending=[True, False]))


def q5_sql(region: str = "ASIA", year: str = "1996") -> str:
    return f"""
SELECT n.n_name,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
             AND c.c_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'
  AND o.o_orderdate >= TIMESTAMP '{year}-01-01'
  AND o.o_orderdate < TIMESTAMP '{int(year) + 1}-01-01'
GROUP BY n.n_name
ORDER BY revenue_e4 DESC, n.n_name"""


def q14_promo_revenue(sf_dir: str, ptype: str = "PROMO",
                      year: str = "1996", month: str = "06"):
    """TPC-H Q14-shaped promo-revenue share: LEFT membership flag
    against the promo subset of the part table.  Part scales with the
    fact tables (TPC-H: sf x 200k rows), so the flag attaches
    size-adaptively (:func:`~..stages.dimjoin.attach_dim_adaptive`):
    lineitem pre-aggregates revenue per (partkey) inside each batch —
    only part-grain partials reach the attach — and the promo key set
    broadcasts only under a byte budget, co-locating through one
    coarse-hash exchange above it.  A missing flag means "not promo"
    (LEFT semantics — rows whose partkey is absent from part still
    count toward total revenue, mirrored by the SQL's IN-subquery).
    The two integer-cent sums meet in one global aggregate and the
    ratio derives from exact ints on both sides."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dimjoin import attach_dim_adaptive

    lo = pd.Timestamp(f"{year}-{month}-01")
    hi = (lo + pd.offsets.MonthBegin(1)).normalize()

    def promo_rows(t: pa.Table) -> pa.Table:
        sel = t.filter(pc.equal(t.column("p_type"), ptype))
        return pa.table({
            "p_partkey": sel.column("p_partkey"),
            "is_promo": pa.array(np.ones(sel.num_rows, np.int64)),
        })

    promo_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        .map_batches(promo_rows, batch_format="pyarrow"))

    def li_partials(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"),
                                     pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), pa.int64())
        rev_e4 = pc.multiply(price_c,
                             pc.subtract(pa.scalar(100, pa.int64()),
                                         disc_c))
        tt = pa.table({"l_partkey": t.column("l_partkey"),
                       "rev_e4": rev_e4})
        return (tt.group_by(["l_partkey"]).aggregate([("rev_e4", "sum")])
                .rename_columns(["l_partkey", "rev_e4"]))

    per_part = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_extendedprice",
                 "l_discount"])
        .map_batches(li_partials, batch_format="pyarrow"))

    flagged = attach_dim_adaptive(per_part, "l_partkey", promo_dim,
                                  "p_partkey", ["is_promo"], how="left")

    def reduce_partial(t: pa.Table) -> pa.Table:
        rev = t.column("rev_e4")
        is_promo = pc.fill_null(pc.cast(t.column("is_promo"), pa.int64()),
                                0)
        promo_rev = pc.if_else(pc.equal(is_promo, 1), rev,
                               pa.scalar(0, pa.int64()))
        return pa.table({
            "promo_rev_e4": pa.array([pc.sum(promo_rev).as_py() or 0],
                                     pa.int64()),
            "total_rev_e4": pa.array([pc.sum(rev).as_py() or 0],
                                     pa.int64()),
        })

    agg = (flagged.map_batches(reduce_partial, batch_format="pyarrow")
           .aggregate(Sum("promo_rev_e4", alias_name="promo_rev_e4"),
                      Sum("total_rev_e4", alias_name="total_rev_e4")))
    promo_rev = int(agg["promo_rev_e4"] or 0)
    total_rev = int(agg["total_rev_e4"] or 0)
    # raw IEEE division of exact ints: bit-identical to the SQL mirror
    # (a round() here would differ at half-ulp ties: banker's vs half-away)
    pct = (100.0 * float(promo_rev) / float(total_rev)) if total_rev else 0.0
    return pd.DataFrame({"promo_rev_e4": [promo_rev],
                         "total_rev_e4": [total_rev],
                         "promo_pct": [pct]})


def q14_sql(ptype: str = "PROMO", year: str = "1996",
            month: str = "06") -> str:
    # membership via IN-subquery (NOT an inner join): mirrors the Ray
    # side's broadcast key-set semantics exactly — a lineitem row whose
    # partkey is absent from part still counts toward total_rev_e4
    lo = pd.Timestamp(f"{year}-{month}-01")
    hi = (lo + pd.offsets.MonthBegin(1)).normalize().strftime("%Y-%m-%d")
    return f"""
WITH f AS (
  SELECT CASE WHEN l_partkey IN (SELECT p_partkey FROM part
                                 WHERE p_type = '{ptype}')
              THEN 1 ELSE 0 END AS is_promo,
         CAST(round(l_extendedprice * 100.0) AS BIGINT)
         * (100 - CAST(round(l_discount * 100.0) AS BIGINT)) AS rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{lo.strftime("%Y-%m-%d")}'
    AND l_shipdate < TIMESTAMP '{hi}'
)
SELECT CAST(coalesce(sum(CASE WHEN is_promo = 1 THEN rev_e4 ELSE 0 END), 0)
            AS BIGINT) AS promo_rev_e4,
       CAST(coalesce(sum(rev_e4), 0) AS BIGINT) AS total_rev_e4,
       CASE WHEN coalesce(sum(rev_e4), 0) = 0 THEN 0.0
            ELSE 100.0 * CAST(sum(CASE WHEN is_promo = 1 THEN rev_e4
                                       ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rev_e4) AS DOUBLE) END AS promo_pct
FROM f"""


def events_running_total(sf_dir: str, coarse: int = 64):
    """Per-EVENT running total of a user's spend (cumulative window
    function emitting one row per input row — the ordered-window shape
    ``SUM(...) OVER (PARTITION BY user ORDER BY ts ROWS UNBOUNDED
    PRECEDING)``, distinct from the per-user AGGREGATE outputs of
    sessionize/top-users).

    Partitioning: users co-locate via a coarse bucket (one Ray group
    per bucket, never per user); inside a bucket the running sum is one
    time-sorted vectorized pandas ``groupby.cumsum``.  Money in integer
    cents; ties broken by ``event_id`` so the order — and therefore
    every prefix sum — is deterministic.
    """
    import ray.data

    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "user_id", "ts",
                                        "value"])

    def add_cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.bit_wise_and(t.column("user_id"), coarse - 1),
                    pa.int64())
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts": t.column("ts"),
            "cents": _value_cents(t.column("value")),
            "coarse": c,
        })

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        run = g.groupby("user_id", sort=False)["cents"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].astype("int64"),
            "user_id": g["user_id"].astype("int64"),
            "running_cents": run.astype("int64"),
        })

    return (ds.map_batches(add_cents, batch_format="pyarrow")
            .groupby("coarse", num_partitions=min(coarse,
                                                  shuffle_partitions()))
            .map_groups(running, batch_format="pandas"))


def events_running_total_sql() -> str:
    return """
SELECT event_id, user_id,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
FROM events"""


_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def events_user_type_pivot(sf_dir: str, types=_PIVOT_TYPES):
    """PIVOT: one wide row per user with a count column per event type
    (the one-hot / feature-table shape training pipelines feed joins
    with).  Single exchange: each batch pre-pivots locally (crosstab
    after a C++ group-count), so the shuffle moves one wide row per
    (user, block) and the reduce is a plain columnar SUM — no
    tall-to-wide reshape ever crosses the wire.  ``n_events`` counts
    ALL events (unknown types included), mirroring the SQL conditional
    aggregation."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])
    cols = [f"n_{ty}" for ty in types]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "user_id": t.column("user_id").to_numpy(),
            "et": t.column("event_type").to_pandas(),
        })
        ct = pd.crosstab(df["user_id"], df["et"])
        out = pd.DataFrame({"user_id": ct.index.to_numpy()})
        out["n_events"] = (df.groupby("user_id", sort=True).size()
                           .reindex(ct.index).to_numpy())
        for ty, col in zip(types, cols):
            out[col] = (ct[ty].to_numpy() if ty in ct.columns
                        else np.zeros(len(ct), dtype=np.int64))
            out[col] = out[col].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return pa.Table.from_pandas(out, preserve_index=False)

    aggs = [("n_events", "sum", "n_events")] + [(c, "sum", c) for c in cols]
    return grouped_aggregate(ds.map_batches(partial, batch_format="pyarrow"),
                             ["user_id"], aggs)


def events_user_type_pivot_sql(types=_PIVOT_TYPES) -> str:
    cases = ",\n       ".join(
        f"CAST(sum(CASE WHEN event_type = '{ty}' THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS n_{ty}" for ty in types)
    return f"""
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       {cases}
FROM events GROUP BY user_id"""


def customer_order_totals(sf_dir: str, coarse: int = 1024):
    """LEFT OUTER join: every customer with its order count and total
    spend (integer cents), RETAINING zero-order customers with 0/0 —
    the outer-join member of the relational family (q3/q5/training_table
    are inner; churn / inactive-account analyses need the unmatched
    left rows).

    Shape: the orders side pre-aggregates per batch (one row per
    custkey per batch crosses the wire, never order rows), then BOTH
    sides — customer-cardinality each, so neither broadcasts at 100 TB
    — co-locate through one coarse-hash exchange on custkey (the
    :func:`~..stages.dedup.coarse_mix` bucketing shared by the other
    large-large joins) and a vectorized pandas left-merge + fill runs
    per coarse group.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_mktsegment"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def cust_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "c_custkey": keys,
            "c_mktsegment": t.column("c_mktsegment"),
            "order_count": pa.array(np.zeros(n, np.int64)),
            "total_price_cents": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def order_side(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        g = (pa.table({"c_custkey": pc.cast(t.column("o_custkey"),
                                            pa.int64()),
                       "total_price_cents": cents})
             .group_by(["c_custkey"])
             .aggregate([("total_price_cents", "sum"), ([], "count_all")])
             .rename_columns(["c_custkey", "total_price_cents",
                              "order_count"]))
        n = g.num_rows
        keys = g.column("c_custkey")
        return pa.table({
            "c_custkey": keys,
            "c_mktsegment": pa.array([None] * n, pa.string()),
            "order_count": pc.cast(g.column("order_count"), pa.int64()),
            "total_price_cents": g.column("total_price_cents"),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        c = g.loc[g["side"] == 0, ["c_custkey", "c_mktsegment"]]
        o = (g.loc[g["side"] == 1,
                   ["c_custkey", "order_count", "total_price_cents"]]
             .groupby("c_custkey", as_index=False).sum())
        out = c.merge(o, on="c_custkey", how="left")
        out["order_count"] = (out["order_count"].fillna(0)
                              .astype("int64"))
        out["total_price_cents"] = (out["total_price_cents"].fillna(0)
                                    .astype("int64"))
        return out

    u = (cust.map_batches(cust_side, batch_format="pyarrow")
         .union(orders.map_batches(order_side, batch_format="pyarrow")))
    return (u.groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(join_group, batch_format="pandas"))


def customer_order_totals_sql() -> str:
    return """
WITH per_cust AS (
  SELECT o_custkey, CAST(count(*) AS BIGINT) AS order_count,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
           AS total_price_cents
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_mktsegment,
       CAST(coalesce(p.order_count, 0) AS BIGINT) AS order_count,
       CAST(coalesce(p.total_price_cents, 0) AS BIGINT)
         AS total_price_cents
FROM customer c LEFT JOIN per_cust p ON p.o_custkey = c.c_custkey"""


def events_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT) per group: distinct users + total events
    per event type — the audience-size / cardinality accounting query.

    Two-level plan, both exchanges over bounded domains: level 1
    deduplicates (event_type, user_id) pairs with per-batch local
    counts through one coarse-hash exchange
    (:func:`~..stages.exact_agg.grouped_aggregate` — the exchange moves
    DEDUPED pairs, at most |types| x |users| rows, never event rows);
    level 2 reduces the pair table to per-type (n_users, n_events) —
    group-domain-sized.  This is the standard two-phase exact distinct
    aggregation; the approximate path for unbounded user domains is the
    HLL sketch (:func:`~.constraints.distinct_sketch`).
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])

    pairs = grouped_aggregate(ds, ["event_type", "user_id"],
                              [("", "count", "n_events")])

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "event_type": t.column("event_type"),
            "n_users": pa.array(np.ones(n, np.int64)),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
        })

    return grouped_aggregate(
        pairs.map_batches(pair_partial, batch_format="pyarrow"),
        ["event_type"],
        [("n_users", "sum", "n_users"), ("n_events", "sum", "n_events")])


def events_distinct_users_sql() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type"""


def docs_top_per_group(sf_dir: str, k: int = 2):
    """Grouped top-k (argmax per group): the ``k`` longest documents of
    every (source, lang) cell, ties broken deterministically by doc_id —
    the "best exemplar per bucket" selection curation pipelines use for
    inspection samples and per-domain anchors.

    Per-batch LOCAL top-k per group (a candidate must be in its batch's
    group top-k to be in the global top-k) -> one exchange of at most
    groups x k rows per batch -> final per-group top-k.  Text never
    moves; the exchange is group-domain-sized regardless of corpus
    size.
    """
    import pandas as pd
    import ray.data

    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "source", "lang",
                                        "n_chars"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "lang", "n_chars", "doc_id"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        out = df.groupby(["source", "lang"], sort=False).head(k).copy()
        out["doc_id"] = out["doc_id"].astype("int64")
        out["n_chars"] = out["n_chars"].astype("int64")
        return out

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["source", "lang", "n_chars", "doc_id"],
                            ascending=[True, True, False, True],
                            kind="mergesort")
        out = df.groupby(["source", "lang"], sort=False).head(k).copy()
        out["rnk"] = (out.groupby(["source", "lang"], sort=False)
                      .cumcount() + 1).astype("int64")
        return out

    return (ds.map_batches(local_topk, batch_format="pandas")
            .groupby(["source", "lang"],
                     num_partitions=min(8, shuffle_partitions()))
            .map_groups(final_topk, batch_format="pandas"))


def docs_top_per_group_sql(k: int = 2) -> str:
    return f"""
WITH ranked AS (
  SELECT source, lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
         CAST(row_number() OVER (PARTITION BY source, lang
              ORDER BY n_chars DESC, doc_id ASC) AS BIGINT) AS rnk
  FROM documents
)
SELECT source, lang, doc_id, n_chars, rnk FROM ranked WHERE rnk <= {k}"""


def events_value_histogram(sf_dir: str, nbins: int = 20):
    """Equi-width histogram of a float measure: global (min, max) from
    one aggregate pass, then a vectorized bucket-assignment scan with
    per-batch partial counts through one tiny exchange (bucket-domain-
    sized).  Bucket arithmetic is a fixed tree of IEEE subtract /
    divide / floor mirrored operand-for-operand in the SQL oracle, so
    the integer bucket ids hash-match exactly; the top edge folds into
    the last bucket on both sides (``least``).
    """
    import ray.data
    from ray.data.aggregate import Max, Min

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["value"])
    mm = ds.aggregate(Min("value"), Max("value"))
    lo, hi = float(mm["min(value)"]), float(mm["max(value)"])
    width = (hi - lo) / float(nbins)

    def assign(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy().astype(np.float64)
        if width > 0:
            b = np.minimum(np.floor((v - lo) / width),
                           float(nbins - 1)).astype(np.int64)
        else:
            b = np.zeros(len(v), np.int64)
        return pa.table({"bucket": pa.array(b)})

    return grouped_aggregate(
        ds.map_batches(assign, batch_format="pyarrow"),
        ["bucket"], [("", "count", "n")])


def events_value_histogram_sql(nbins: int = 20) -> str:
    return f"""
WITH mm AS (
  SELECT min(value) AS lo, max(value) AS hi FROM events
),
b AS (
  SELECT CASE WHEN (mm.hi - mm.lo) / {nbins}.0 > 0
              THEN CAST(least(floor((e.value - mm.lo)
                        / ((mm.hi - mm.lo) / {nbins}.0)),
                        {nbins - 1}.0) AS BIGINT)
              ELSE 0 END AS bucket
  FROM events e, mm
)
SELECT bucket, CAST(count(*) AS BIGINT) AS n
FROM b GROUP BY bucket"""


def events_value_quartiles(sf_dir: str):
    """Quantile-bucket assignment (NTILE-by-value): label every event
    with its within-type quartile bucket — the feature-binning /
    winsorization-prep step.  Thresholds are the EXACT ceil(q*n)-th
    smallest values from :func:`~..stages.quantiles.grouped_exact_quantiles`
    (group-domain-sized -> broadcast), and the bucket is a sum of
    strict ``value > threshold`` comparisons of doubles both engines
    read from the same parquet — deterministic, hash-exact.

    One quantile pass + one stateless vectorized assignment scan; the
    only exchange is the quantile histogram's partial exchange.
    """
    import ray
    import ray.data

    from ..stages.quantiles import grouped_exact_quantiles
    from ..util import process_cached, ref_key

    qs = (0.25, 0.5, 0.75)
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "value"])
    thr = grouped_exact_quantiles(ev, "event_type", "value",
                                  qs=qs).to_pandas()
    piv = thr.pivot_table(index="event_type", columns="quantile",
                          values="value", aggfunc="max")
    types = list(piv.index)
    mat = piv[[0.25, 0.5, 0.75]].to_numpy(dtype=np.float64)
    ref = ray.put((types, mat))

    class AssignBucket:
        def __init__(self, r):
            ts, m = ray.get(r)
            self.value_set = pa.array(ts, pa.string())
            self.mat = m

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("event_type"),
                              value_set=self.value_set)
            ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("value").to_numpy().astype(np.float64)
            th = self.mat[ix]
            bucket = (v[:, None] > th).sum(axis=1).astype(np.int64)
            return pa.table({
                "event_id": pc.cast(t.column("event_id"), pa.int64()),
                "event_type": t.column("event_type"),
                "bucket": pa.array(bucket),
            })

    return ev.map_batches(process_cached(AssignBucket, ref_key(ref), ref),
                          batch_format="pyarrow")


def events_value_quartiles_sql() -> str:
    from ..stages.quantiles import grouped_exact_quantiles_sql

    inner = grouped_exact_quantiles_sql("events", "event_type", "value",
                                        qs=(0.25, 0.5, 0.75))
    return f"""
WITH p AS (
  SELECT event_type,
         max(CASE WHEN quantile = 0.25 THEN value END) AS q1,
         max(CASE WHEN quantile = 0.5  THEN value END) AS q2,
         max(CASE WHEN quantile = 0.75 THEN value END) AS q3
  FROM ({inner}) x GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       CAST((CASE WHEN e.value > p.q1 THEN 1 ELSE 0 END
           + CASE WHEN e.value > p.q2 THEN 1 ELSE 0 END
           + CASE WHEN e.value > p.q3 THEN 1 ELSE 0 END) AS BIGINT)
         AS bucket
FROM events e JOIN p ON p.event_type = e.event_type"""


def events_winsorized_stats(sf_dir: str):
    """Winsorized robust aggregation: per event type, clamp every value
    to the exact within-type [q1, q3] thresholds and report the clamped
    sum (1e-6-quantized integer) plus how many rows were clamped at
    each side — the outlier-robust mean prep that follows
    :func:`events_value_quartiles`'s binning.  Clamping substitutes one
    of two doubles both engines read from the same parquet (no new
    arithmetic), and the only float op is the quantized floor(x*1e6),
    so the hash is exact.

    One quantile pass (group-domain thresholds, broadcast) + one
    stateless scan with per-batch partials -> a type-domain reduce.
    """
    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.quantiles import grouped_exact_quantiles
    from ..util import process_cached, ref_key

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])
    thr = grouped_exact_quantiles(ev, "event_type", "value",
                                  qs=(0.25, 0.75)).to_pandas()
    piv = thr.pivot_table(index="event_type", columns="quantile",
                          values="value", aggfunc="max")
    types = list(piv.index)
    mat = piv[[0.25, 0.75]].to_numpy(dtype=np.float64)
    ref = ray.put((types, mat))

    class Winsorize:
        def __init__(self, r):
            ts, m = ray.get(r)
            self.value_set = pa.array(ts, pa.string())
            self.mat = m

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("event_type"),
                              value_set=self.value_set)
            ix = idx.to_numpy(zero_copy_only=False).astype(np.int64)
            v = t.column("value").to_numpy().astype(np.float64)
            lo, hi = self.mat[ix, 0], self.mat[ix, 1]
            low = v < lo
            high = v > hi
            w = np.where(low, lo, np.where(high, hi, v))
            part = pa.table({
                "event_type": t.column("event_type"),
                "n_events": pa.array(np.ones(len(v), np.int64)),
                "n_low": pa.array(low.astype(np.int64)),
                "n_high": pa.array(high.astype(np.int64)),
                "wsum_q6": pa.array(np.floor(w * 1e6).astype(np.int64)),
            })
            return part

    parts = ev.map_batches(process_cached(Winsorize, ref_key(ref), ref),
                           batch_format="pyarrow")
    return grouped_aggregate(
        parts, ["event_type"],
        [("n_events", "sum", "n_events"), ("n_low", "sum", "n_low"),
         ("n_high", "sum", "n_high"), ("wsum_q6", "sum", "wsum_q6")])


def events_winsorized_stats_sql() -> str:
    from ..stages.quantiles import grouped_exact_quantiles_sql

    inner = grouped_exact_quantiles_sql("events", "event_type", "value",
                                        qs=(0.25, 0.75))
    return f"""
WITH p AS (
  SELECT event_type,
         max(CASE WHEN quantile = 0.25 THEN value END) AS lo,
         max(CASE WHEN quantile = 0.75 THEN value END) AS hi
  FROM ({inner}) x GROUP BY event_type
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN e.value < p.lo THEN 1 ELSE 0 END) AS BIGINT)
         AS n_low,
       CAST(sum(CASE WHEN e.value > p.hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_high,
       CAST(sum(CAST(floor(
           (CASE WHEN e.value < p.lo THEN p.lo
                 WHEN e.value > p.hi THEN p.hi
                 ELSE e.value END) * 1000000) AS BIGINT)) AS BIGINT)
         AS wsum_q6
FROM events e JOIN p ON p.event_type = e.event_type
GROUP BY e.event_type"""


def events_weekday_profile(sf_dir: str):
    """Weekly seasonality profile: per (event type, day-of-week),
    event count and EXACT distinct users — the calendar heat-map every
    operations dashboard draws.  Day-of-week comes from ``strftime
    '%w'`` (Sunday = '0') on BOTH engines, so the group keys match
    byte-for-byte.  Same two-phase COUNT(DISTINCT) shape as
    :func:`events_dau`: a (type, dow, user) pair-dedupe exchange whose
    rows are bounded by types x 7 x users, then a tiny profile reduce.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "user_id"])

    def rows(t: pa.Table) -> pa.Table:
        dow = pc.strftime(t.column("ts"), format="%w")
        return pa.table({"event_type": t.column("event_type"),
                         "dow": dow,
                         "user_id": t.column("user_id")})

    pairs = grouped_aggregate(
        ds.map_batches(rows, batch_format="pyarrow"),
        ["event_type", "dow", "user_id"], [("", "count", "n_events")])

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "event_type": t.column("event_type"),
            "dow": t.column("dow"),
            "n_users": pa.array(np.ones(n, np.int64)),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
        })

    return grouped_aggregate(
        pairs.map_batches(pair_partial, batch_format="pyarrow"),
        ["event_type", "dow"],
        [("n_users", "sum", "n_users"), ("n_events", "sum", "n_events")])


def events_weekday_profile_sql() -> str:
    return """
SELECT event_type, strftime(ts, '%w') AS dow,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY event_type, dow"""


def events_dau(sf_dir: str):
    """Daily active users: per calendar day, distinct users + event
    count — the canonical time-series health metric, and the calendar
    variant of :func:`events_distinct_users` (same two-phase exact
    COUNT(DISTINCT) shape: a (day, user) pair-dedupe exchange whose
    rows are bounded by days x users, then a day-domain reduce).  Day
    truncation is ``pc.floor_temporal`` + ``strftime`` mirrored by
    DuckDB ``date_trunc``/``strftime`` — both emit the same
    'YYYY-MM-DD' strings, so the hash compare is exact.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"day": day, "user_id": t.column("user_id")})

    pairs = grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["day", "user_id"], [("", "count", "n_events")])

    def pair_partial(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "day": t.column("day"),
            "n_users": pa.array(np.ones(n, np.int64)),
            "n_events": pc.cast(t.column("n_events"), pa.int64()),
        })

    return grouped_aggregate(
        pairs.map_batches(pair_partial, batch_format="pyarrow"),
        ["day"],
        [("n_users", "sum", "n_users"), ("n_events", "sum", "n_events")])


def events_dau_sql() -> str:
    return """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY day"""


def events_dau_ma7(sf_dir: str):
    """Sliding-window aggregate over the DAU series: per day, the
    trailing 7-row SUM of daily active users (the "7-day rolling
    health metric" every dashboard draws).  Integer window SUM (not
    AVG) keeps the value hash fp-free.

    Shape: the distributed part is the DAU exchange itself
    (:func:`events_dau` — the (day, user) pair-dedupe shuffle); the
    windowed pass runs on the collected day series, which is
    calendar-bounded (years of days) at ANY corpus scale — the
    standard post-exchange domain-sized tail.  Window semantics are
    ROWS over the observed-day series sorted by day (mirrored by the
    oracle's ``ROWS BETWEEN 6 PRECEDING AND CURRENT ROW``), so missing
    calendar days shorten the window identically on both sides.
    """
    from ..util import collect_small_arrow

    d = (collect_small_arrow(events_dau(sf_dir)).to_pandas()
         .sort_values("day").reset_index(drop=True))
    c = d["n_users"].to_numpy(np.int64).cumsum()
    lag = np.concatenate([np.zeros(min(7, len(c)), np.int64), c[:-7]]) \
        if len(c) > 7 else np.zeros(len(c), np.int64)
    d["dau_7d_sum"] = c - lag
    return pa.Table.from_pandas(
        d[["day", "n_users", "dau_7d_sum"]], preserve_index=False)


def events_dau_ma7_sql() -> str:
    return """
WITH dau AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
  FROM events GROUP BY day)
SELECT day, n_users,
       CAST(SUM(n_users) OVER (ORDER BY day
            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS dau_7d_sum
FROM dau"""


def events_daily_gapfill(sf_dir: str):
    """Time-series resample with a calendar spine: per-day event counts
    over the FULL [min_day, max_day] range, missing days filled with 0
    — the gap-fill every charting/forecasting consumer needs before a
    rolling window is honest about quiet days.

    Shape: the distributed part is one day-keyed count exchange
    (:func:`~..stages.exact_agg.grouped_aggregate`); the spine join
    runs on the collected day series, calendar-bounded (years of days)
    at any corpus scale — the standard post-exchange domain-sized
    tail.  Day strings are 'YYYY-MM-DD' (the :func:`events_dau`
    contract), so pandas ``date_range`` and DuckDB ``generate_series``
    enumerate identical spines.
    """
    import pandas as pd
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts"])

    def day_rows(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t.column("ts"), unit="day"),
                          format="%Y-%m-%d")
        return pa.table({"day": day})

    counts = (collect_small_arrow(grouped_aggregate(
        ds.map_batches(day_rows, batch_format="pyarrow"),
        ["day"], [("", "count", "n_events")])).to_pandas()
        .set_index("day")["n_events"])
    spine = pd.date_range(counts.index.min(), counts.index.max(),
                          freq="D").strftime("%Y-%m-%d")
    filled = counts.reindex(spine, fill_value=0).astype("int64")
    return pa.table({"day": pa.array(list(spine), pa.string()),
                     "n_events": pa.array(filled.to_numpy(), pa.int64())})


def events_daily_gapfill_sql() -> str:
    return """
WITH d AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY day),
span AS (
  SELECT strftime(unnest(generate_series(
           CAST(min(day) AS DATE), CAST(max(day) AS DATE),
           INTERVAL 1 DAY)), '%Y-%m-%d') AS day
  FROM d)
SELECT span.day, CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events
FROM span LEFT JOIN d USING (day)"""


def pushdown_filter_scan(sf_dir: str, max_qty: int = 5,
                         returnflag: str = "R"):
    """Predicate-pushdown certificate — the 'prune at the read' rule as
    a first-class, oracled query: the filter ships INTO
    ``read_parquet`` as a pyarrow dataset expression, so row groups
    whose statistics exclude the predicate never leave storage and
    non-matching rows never enter the object store (q6 filters
    per-batch AFTER the read; this is the earlier, cheaper layer the
    100-TB read path leans on).  Output is one audit row
    (n_rows, sum_qty_c) in exact integer cents."""
    import pyarrow.dataset as pds
    import ray.data

    from ..util import collect_small_arrow

    expr = ((pds.field("l_quantity") < float(max_qty))
            & (pds.field("l_returnflag") == returnflag))
    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_returnflag"], filter=expr)

    def partial(t: pa.Table) -> pa.Table:
        qty_c = pc.cast(pc.round(pc.multiply(t.column("l_quantity"),
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "sum_qty_c": pa.array([pc.sum(qty_c).as_py() or 0],
                                  pa.int64())})

    s = collect_small_arrow(
        ds.map_batches(partial, batch_format="pyarrow")).to_pandas().sum()
    return pd.DataFrame({"n_rows": pd.Series([int(s.n_rows)], dtype="int64"),
                         "sum_qty_c": pd.Series([int(s.sum_qty_c)],
                                                dtype="int64")})


def pushdown_filter_scan_sql(max_qty: int = 5,
                             returnflag: str = "R") -> str:
    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CAST(round(l_quantity * 100) AS BIGINT)), 0)
            AS BIGINT) AS sum_qty_c
FROM lineitem
WHERE l_quantity < {max_qty} AND l_returnflag = '{returnflag}'"""


def events_props_stats(sf_dir: str):
    """Semi-structured extraction: parse the JSON ``props`` payload per
    event and aggregate the extracted measure per event type — the
    "pull a field out of the raw JSON column" step every event pipeline
    runs before typed analytics (and the engine's bread and butter:
    the validator already parses exactly these payloads).

    Per-batch: real ``json.loads`` per event (the payloads are small;
    parse failures and missing keys count into ``n_bad`` instead of
    poisoning the aggregate) + local pre-aggregation, then one
    group-domain exchange.
    """
    import json

    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        types = t.column("event_type").to_pylist()
        ks = np.empty(t.num_rows, dtype=np.int64)
        bad = np.zeros(t.num_rows, dtype=np.int64)
        for i, p in enumerate(t.column("props").to_pylist()):
            try:
                v = json.loads(p)["k"]
                # "good" = an exact JSON integer (or digit string) that
                # fits int64 — the same set TRY_CAST(... AS BIGINT)
                # accepts in the oracle; bools/floats/words are bad on
                # BOTH sides
                if isinstance(v, bool) or not isinstance(v, (int, str)):
                    raise ValueError(v)
                ks[i] = int(v)
            except (TypeError, ValueError, KeyError, OverflowError):
                ks[i] = 0
                bad[i] = 1
        g = (pd.DataFrame({"event_type": types, "sum_k": ks,
                           "min_k": np.where(bad, np.iinfo(np.int64).max,
                                             ks),
                           "max_k": np.where(bad, np.iinfo(np.int64).min,
                                             ks),
                           "n_bad": bad, "n": 1})
             .groupby("event_type", sort=False)
             .agg(sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
                  max_k=("max_k", "max"), n_bad=("n_bad", "sum"),
                  n=("n", "sum")).reset_index())
        for c in ("sum_k", "min_k", "max_k", "n_bad", "n"):
            g[c] = g[c].astype("int64")
        return g

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["event_type"],
        [("n", "sum", "n"), ("sum_k", "sum", "sum_k"),
         ("min_k", "min", "min_k"), ("max_k", "max", "max_k"),
         ("n_bad", "sum", "n_bad")])


def events_props_stats_sql() -> str:
    # TRY_CAST: non-integer payloads (strings, overflow) become NULL and
    # count into n_bad instead of hard-erroring the oracle; the coalesce
    # sentinels mirror the engine's all-bad-group min/max exactly
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(coalesce(sum(TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(min(TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)),
                     9223372036854775807) AS BIGINT) AS min_k,
       CAST(coalesce(max(TRY_CAST(json_extract_string(props, '$.k')
                                  AS BIGINT)),
                     -9223372036854775808) AS BIGINT) AS max_k,
       CAST(sum(CASE WHEN TRY_CAST(json_extract_string(props, '$.k')
                          AS BIGINT) IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
FROM events GROUP BY event_type"""
