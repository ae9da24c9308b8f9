"""Relational coverage over the TPC-H-ish tables: grouped aggregates,
broadcast joins, sort/top-k, tumbling windows, sessionization.

These exercise the wide-operation layer (groupby/aggregate shuffles,
broadcast small-side joins, sort+limit) with exact DuckDB oracles.  Column
names are chosen to match the oracle SQL aliases exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1-shaped summary: per (returnflag, linestatus) sums/avgs.
    Pre-aggregation happens inside Ray's hash aggregate; input pruned to
    the 7 needed columns at the read."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_shipdate"])
    cutoff = pd.Timestamp("1998-09-02")

    # money columns are 2-decimal: sum in EXACT integer cents so results
    # are bit-identical regardless of summation order (fp-order noise in
    # double sums breaks value-hash comparisons otherwise)
    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t.column("l_shipdate"), pa.scalar(cutoff)))
        qty = pc.cast(pc.round(t.column("l_quantity")), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        disc_e4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()), disc_c))
        tt = pa.table({"l_returnflag": t.column("l_returnflag"),
                       "l_linestatus": t.column("l_linestatus"),
                       "sum_qty": qty, "sum_base_price_cents": price_c,
                       "sum_disc_price_e4": disc_e4})
        return (tt.group_by(["l_returnflag", "l_linestatus"])
                .aggregate([("sum_qty", "sum"), ("sum_base_price_cents", "sum"),
                            ("sum_disc_price_e4", "sum"), ([], "count_all")])
                .rename_columns(["l_returnflag", "l_linestatus", "sum_qty",
                                 "sum_base_price_cents", "sum_disc_price_e4",
                                 "count_order"]))

    from ..util import shuffle_partitions

    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"],
                    num_partitions=min(8, shuffle_partitions()))
           .aggregate(Sum("sum_qty", alias_name="sum_qty"),
                      Sum("sum_base_price_cents", alias_name="sum_base_price_cents"),
                      Sum("sum_disc_price_e4", alias_name="sum_disc_price_e4"),
                      Sum("count_order", alias_name="count_order")))

    def finalize(t: pa.Table) -> pa.Table:
        # averages derived from exact integer sums: identical doubles on
        # both sides (same ints -> same IEEE division)
        n = pc.cast(t.column("count_order"), pa.float64())
        avg_qty = pc.round(pc.divide(pc.cast(t.column("sum_qty"), pa.float64()), n),
                           ndigits=4)
        avg_price = pc.round(
            pc.divide(pc.divide(pc.cast(t.column("sum_base_price_cents"),
                                        pa.float64()), pa.scalar(100.0)), n),
            ndigits=4)
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "sum_qty": t.column("sum_qty"),
            "sum_base_price_cents": t.column("sum_base_price_cents"),
            "sum_disc_price_e4": t.column("sum_disc_price_e4"),
            "avg_qty": avg_qty, "avg_price": avg_price,
            "count_order": t.column("count_order"),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def q1_sql() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_base_price_cents,
       CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS sum_disc_price_e4,
       round(CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 4) AS avg_qty,
       round((CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)) AS DOUBLE)
              / 100.0) / CAST(count(*) AS DOUBLE), 4) AS avg_price,
       CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus"""


def top_customers(sf_dir: str, k: int = 10):
    """Revenue top-k customers: orders groupby custkey (shuffle over
    pre-aggregated partials) + SIZE-ADAPTIVE attach of the customer
    dimension (:func:`..stages.dimjoin.attach_dim_adaptive`) — customer
    scales with the fact tables, so it broadcasts only under a byte
    budget and co-locates through one coarse-hash exchange above it.
    INNER semantics (FK orphans drop), matching the SQL oracle."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dimjoin import attach_dim_adaptive
    from ..util import shuffle_partitions

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        tt = pa.table({"o_custkey": t.column("o_custkey"),
                       "total_price_cents": cents})
        return (tt.group_by(["o_custkey"]).aggregate([("total_price_cents", "sum")])
                .rename_columns(["o_custkey", "total_price_cents"]))

    per_cust = (orders.map_batches(partial, batch_format="pyarrow")
                .groupby("o_custkey", num_partitions=shuffle_partitions())
                .aggregate(Sum("total_price_cents", alias_name="total_price_cents")))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_custkey", "c_name",
                                          "c_mktsegment"])
    joined = attach_dim_adaptive(per_cust, "o_custkey", cust, "c_custkey",
                                 ["c_name", "c_mktsegment"], how="inner")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "c_name": t.column("c_name"),
            "c_mktsegment": t.column("c_mktsegment"),
            "total_price_cents": t.column("total_price_cents"),
        })

    top = (joined.map_batches(finalize, batch_format="pyarrow")
           .sort(["total_price_cents", "c_custkey"],
                 descending=[True, False]).limit(k))

    def add_rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["total_price_cents", "c_custkey"],
                            ascending=[False, True]).reset_index(drop=True)
        df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df

    return add_rank(top.to_pandas())


def top_customers_sql(k: int = 10) -> str:
    return f"""
WITH per_cust AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS total_price_cents
  FROM orders GROUP BY o_custkey
)
SELECT c.c_custkey, c.c_name, c.c_mktsegment, p.total_price_cents,
       CAST(row_number() OVER (ORDER BY p.total_price_cents DESC, c.c_custkey) AS BIGINT) AS rank
FROM per_cust p JOIN customer c ON c.c_custkey = p.o_custkey
ORDER BY p.total_price_cents DESC, c.c_custkey
LIMIT {k}"""


def nation_region_counts(sf_dir: str):
    """Two-level broadcast join: nation -> region name + customer counts
    per region (small-small-large star join, all broadcast)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    region = pa.concat_tables(ray.get(
        ray.data.read_parquet(f"{sf_dir}/region.parquet").to_arrow_refs()))
    nation = pa.concat_tables(ray.get(
        ray.data.read_parquet(f"{sf_dir}/nation.parquet").to_arrow_refs()))
    r_name = dict(zip(region.column("r_regionkey").to_pylist(),
                      region.column("r_name").to_pylist()))
    n_region = dict(zip(nation.column("n_nationkey").to_pylist(),
                        nation.column("n_regionkey").to_pylist()))
    ref = ray.put((r_name, n_region))

    cust = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                 columns=["c_nationkey"])

    class ToRegion:
        def __init__(self, r):
            import ray as _ray
            self.r_name, self.n_region = _ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            nk = t.column("c_nationkey").to_pylist()
            rn = [self.r_name[self.n_region[int(x)]] for x in nk]
            out = pa.table({"r_name": pa.array(rn, pa.string())})
            return (out.group_by(["r_name"]).aggregate([([], "count_all")])
                    .rename_columns(["r_name", "n_customers"]))

    return (cust.map_batches(ToRegion, fn_constructor_args=(ref,),
                             batch_format="pyarrow", concurrency=(1, 2))
            .groupby("r_name", num_partitions=4)
            .aggregate(Sum("n_customers", alias_name="n_customers")))


def nation_region_counts_sql() -> str:
    return """
SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_customers
FROM customer c
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
GROUP BY r.r_name"""


# ---------------------------------------------------------------------------
# events: tumbling windows + sessionization (streaming-shaped)
# ---------------------------------------------------------------------------

from .relational_common import (_period_index, _value_cents,
                                _window_start)  # noqa: F401


def events_tumbling_window(sf_dir: str, window_s: int = 3600):
    """Tumbling event-time window: (event_type, window_start) -> count,
    sum(value).  Window assignment is per-batch vectorized arithmetic on
    the epoch; the groupby shuffles pre-aggregated partials only."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"event_type": t.column("event_type"),
                       "window_start": _window_start(t.column("ts"), window_s),
                       "value_cents": _value_cents(t.column("value"))})
        return (tt.group_by(["event_type", "window_start"])
                .aggregate([("value_cents", "sum"), ([], "count_all")])
                .rename_columns(["event_type", "window_start", "sum_value_cents", "n_events"]))

    from ..util import shuffle_partitions

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "window_start"],
                     num_partitions=shuffle_partitions())
            .aggregate(Sum("sum_value_cents", alias_name="sum_value_cents"),
                       Sum("n_events", alias_name="n_events")))


def events_tumbling_window_sql(window_s: int = 3600) -> str:
    return f"""
SELECT event_type,
       CAST(floor(epoch(ts) / {window_s}) * {window_s} AS BIGINT) AS window_start,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM events
GROUP BY 1, 2"""


def events_sessionize(sf_dir: str, gap_s: int = 1800, coarse: int = 64):
    """Per-user sessionization (gap > ``gap_s`` s starts a new session).

    Partitioning: users co-locate via a COARSE key (``user_id % coarse``)
    — one Ray group per coarse bucket, never per user (Ray's per-group
    reduce overhead makes key-per-user map_groups unusable at scale);
    inside a bucket the windowing is one vectorized pandas
    ``groupby.diff`` over the time-sorted frame.  Assumption: one user's
    events fit one bucket's memory.
    """
    import ray.data

    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def add_coarse(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.bit_wise_and(t.column("user_id"), coarse - 1), pa.int64())
        return t.append_column("coarse", c)

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        gaps = g.groupby("user_id", sort=False)["ts"].diff().dt.total_seconds()
        new_session = (gaps > gap_s).astype("int64")
        out = (pd.DataFrame({"user_id": g["user_id"], "new": new_session})
               .groupby("user_id", sort=False)
               .agg(n_sessions=("new", "sum"), n_events=("new", "size"))
               .reset_index())
        out["n_sessions"] = (out["n_sessions"] + 1).astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (ds.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse", num_partitions=min(coarse, shuffle_partitions()))
            .map_groups(sessions_bucket, batch_format="pandas")
            .map_batches(lambda t: t.select(["user_id", "n_sessions", "n_events"]),
                         batch_format="pyarrow"))


def events_sessionize_sql(gap_s: int = 1800) -> str:
    return f"""
WITH gaps AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) > {gap_s}
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
)
SELECT user_id,
       CAST(sum(new_session) + 1 AS BIGINT) AS n_sessions,
       CAST(count(*) AS BIGINT) AS n_events
FROM gaps GROUP BY user_id"""


def events_top_users(sf_dir: str, k: int = 20):
    """sort/top-k coverage: users by total event value."""
    import ray.data
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"user_id": t.column("user_id"),
                       "total_value_cents": _value_cents(t.column("value"))})
        return (tt.group_by(["user_id"]).aggregate([("total_value_cents", "sum")])
                .rename_columns(["user_id", "total_value_cents"]))

    from ..util import shuffle_partitions

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("user_id", num_partitions=shuffle_partitions())
           .aggregate(Sum("total_value_cents", alias_name="total_value_cents")))
    top = agg.sort(["total_value_cents", "user_id"], descending=[True, False]).limit(k)
    return top.to_pandas()


def events_top_users_sql(k: int = 20) -> str:
    return f"""
SELECT user_id,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS total_value_cents
FROM events GROUP BY user_id
ORDER BY total_value_cents DESC, user_id
LIMIT {k}"""


def events_hopping_window(sf_dir: str, size_s: int = 3600, hop_s: int = 1800):
    """Hopping (sliding) event-time window: size 2x hop, so every event
    belongs to exactly two windows — implemented as a vectorized 1->2 row
    expansion per batch before the shuffle (flat-map semantics inside
    map_batches)."""
    import ray.data
    from ray.data.aggregate import Sum

    from ..util import shuffle_partitions

    assert size_s == 2 * hop_s, "this operator models the size=2*hop case"
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])

    def partial(t: pa.Table) -> pa.Table:
        w0 = _window_start(t.column("ts"), hop_s)
        w1 = pc.subtract(w0, hop_s)
        cents = _value_cents(t.column("value"))

        def arr(x):
            return x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x

        et = arr(t.column("event_type"))
        tt = pa.table({
            "event_type": pa.concat_arrays([et, et]),
            "window_start": pa.concat_arrays([arr(w0), arr(w1)]),
            "value_cents": pa.concat_arrays([arr(cents), arr(cents)]),
        })
        return (tt.group_by(["event_type", "window_start"])
                .aggregate([("value_cents", "sum"), ([], "count_all")])
                .rename_columns(["event_type", "window_start",
                                 "sum_value_cents", "n_events"]))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["event_type", "window_start"],
                     num_partitions=shuffle_partitions())
            .aggregate(Sum("sum_value_cents", alias_name="sum_value_cents"),
                       Sum("n_events", alias_name="n_events")))


def events_hopping_window_sql(size_s: int = 3600, hop_s: int = 1800) -> str:
    return f"""
WITH expanded AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / {hop_s}) * {hop_s} AS BIGINT) AS window_start,
         value
  FROM events
  UNION ALL
  SELECT event_type,
         CAST(floor(epoch(ts) / {hop_s}) * {hop_s} - {hop_s} AS BIGINT) AS window_start,
         value
  FROM events
)
SELECT event_type, window_start,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS sum_value_cents,
       CAST(count(*) AS BIGINT) AS n_events
FROM expanded
GROUP BY 1, 2"""


def q3_shipping_priority(sf_dir: str, segment: str = "BUILDING",
                         cutoff: str = "1995-03-15", k: int = 10):
    """TPC-H Q3-shaped: revenue of unshipped orders for one segment.

    Demonstrates the large-large HASH JOIN primitive (``Dataset.join``
    on l_orderkey/o_orderkey); lineitem revenue is pre-aggregated per
    batch BEFORE the join so the shuffle moves order-grained partials.
    The segment's customer keys SEMI-JOIN onto orders size-adaptively
    (:func:`~..stages.dimjoin.attach_dim_adaptive` with no payload
    columns — customer scales with the fact tables, so the key set
    broadcasts only under a byte budget and co-locates through one
    coarse-hash exchange above it).
    """
    import ray
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..util import shuffle_partitions

    cut = pd.Timestamp(cutoff)

    cust_seg = (ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"])
        .map_batches(lambda t: t.filter(
            pc.equal(t.column("c_mktsegment"), segment))
            .select(["c_custkey"]), batch_format="pyarrow"))

    def order_filter(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("o_orderdate"), pa.scalar(cut)))
        return t.select(["o_orderkey", "o_custkey"])

    orders = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(order_filter, batch_format="pyarrow"),
        "o_custkey", cust_seg, "c_custkey", [], how="inner"
    ).map_batches(lambda t: t.select(["o_orderkey"]),
                  batch_format="pyarrow")

    def li_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("l_shipdate"), pa.scalar(cut)))
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        disc_c = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        rev_e4 = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                                  disc_c))
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "revenue_e4": rev_e4})
        return (tt.group_by(["l_orderkey"]).aggregate([("revenue_e4", "sum")])
                .rename_columns(["l_orderkey", "revenue_e4"]))

    li = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])
        .map_batches(li_partial, batch_format="pyarrow"))

    joined = li.join(orders, join_type="inner",
                     num_partitions=min(8, shuffle_partitions()),
                     on=("l_orderkey",), right_on=("o_orderkey",))

    from ray.data.aggregate import Sum

    rev = (joined.groupby("l_orderkey", num_partitions=4)
           .aggregate(Sum("revenue_e4", alias_name="revenue_e4")))
    top = rev.sort(["revenue_e4", "l_orderkey"],
                   descending=[True, False]).limit(k)
    return top.to_pandas()


def q3_shipping_priority_sql(segment: str = "BUILDING",
                             cutoff: str = "1995-03-15", k: int = 10) -> str:
    return f"""
SELECT l.l_orderkey,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))) AS BIGINT)
         AS revenue_e4
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = '{segment}'
  AND o.o_orderdate < TIMESTAMP '{cutoff}'
  AND l.l_shipdate > TIMESTAMP '{cutoff}'
GROUP BY l.l_orderkey
ORDER BY revenue_e4 DESC, l.l_orderkey
LIMIT {k}"""


def q4_priority_counts(sf_dir: str, flag: str = "R"):
    """Semi-join shape (TPC-H Q4-style): count orders per priority having
    at least one returned lineitem — distinct keys on the big side, then
    hash join to orders, then a small grouped count."""
    import ray.data

    from ..util import shuffle_partitions
    from ..stages.exact_agg import grouped_aggregate

    li_keys = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_returnflag"])
        .map_batches(lambda t: (t.filter(pc.equal(t.column("l_returnflag"), flag))
                                .select(["l_orderkey"])
                                .group_by(["l_orderkey"]).aggregate([])),
                     batch_format="pyarrow"))
    li_distinct = grouped_aggregate(li_keys, ["l_orderkey"],
                                    [("", "count", "n")])

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_orderpriority"])
    joined = orders.join(li_distinct, join_type="inner",
                         num_partitions=min(8, shuffle_partitions()),
                         on=("o_orderkey",), right_on=("l_orderkey",))

    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["o_orderpriority"]).group_by(["o_orderpriority"])
                .aggregate([([], "count_all")])
                .rename_columns(["o_orderpriority", "n_orders"]))

    return (joined.map_batches(partial, batch_format="pyarrow")
            .groupby("o_orderpriority", num_partitions=4)
            .aggregate(Sum("n_orders", alias_name="n_orders")))


def q4_priority_counts_sql(flag: str = "R") -> str:
    return f"""
SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = '{flag}')
GROUP BY o.o_orderpriority"""


def events_asof_join(sf_dir: str, left_type: str = "click",
                     right_type: str = "view",
                     direction: str = "backward"):
    """Per-user AS-OF join: each `left_type` event joined to the most
    recent `right_type` event of the SAME user at or before its
    timestamp (inner — unmatched lefts drop).  ``direction="forward"``
    flips the semantics to the EARLIEST right event at or after the
    left timestamp (the "next touchpoint" attribution shape); ties on
    (user, ts) resolve to max event_id backward / min event_id forward
    — merge_asof's last/first-row rule under the deterministic
    secondary sort, pinned identically in the SQL oracle.

    Ray Data has no as-of join; the distributed shape is the standard
    co-partition-then-merge plan: both sides tagged in ONE pruned read,
    hash-co-partitioned by user (coarse key so all of a user's events of
    both types land in one group), and merged per partition with
    pandas.merge_asof (vectorized sort-merge).  Partitioning assumption:
    one user's events fit in one group — users are fine-grained, so no
    salting is needed; a pathological single-user stream would need
    time-range chunking with boundary carryover.
    DuckDB's native ASOF JOIN is the oracle.
    """
    import ray.data

    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array([left_type, right_type]))
        t = t.filter(m)
        side = pc.equal(t.column("event_type"), left_type)  # True = left
        coarse = pc.bit_wise_and(t.column("user_id"), 255)
        return pa.table({"event_id": t.column("event_id"),
                         "ts": t.column("ts"),
                         "user_id": t.column("user_id"),
                         "is_left": side,
                         "coarse": coarse})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = (g[g["is_left"]]
                .sort_values("ts", kind="stable")[["event_id", "user_id", "ts"]])
        # secondary sort on event_id: merge_asof takes the LAST tied right
        # row, so equal-(user, ts) views resolve to the max event_id
        # deterministically regardless of shuffle/block order
        # secondary-sort order makes the tie pick deterministic:
        # backward takes the LAST tied row (max id), forward the FIRST
        # (min id) — ascending (ts, id) serves both
        right = (g[~g["is_left"]]
                 .rename(columns={"event_id": "view_event_id", "ts": "view_ts"})
                 .sort_values(["view_ts", "view_event_id"], kind="stable")
                 [["view_event_id", "user_id", "view_ts"]])
        if left.empty or right.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "view_event_id": pd.Series(dtype="int64")})
        m = pd.merge_asof(left, right, left_on="ts", right_on="view_ts",
                          by="user_id", direction=direction,
                          allow_exact_matches=True)
        m = m.dropna(subset=["view_event_id"])
        return pd.DataFrame({"event_id": m["event_id"].astype("int64"),
                             "user_id": m["user_id"].astype("int64"),
                             "view_event_id": m["view_event_id"].astype("int64")})

    return (ev.map_batches(tag, batch_format="pyarrow")
            .groupby("coarse", num_partitions=min(8, shuffle_partitions()))
            .map_groups(merge, batch_format="pandas"))


def events_range_join(sf_dir: str, left_type: str = "click",
                      right_type: str = "purchase", window_s: int = 3600):
    """Per-user many-to-many RANGE (interval) join: each ``left_type``
    event matched to EVERY ``right_type`` event of the same user whose
    attribution window ``[ts, ts + window_s)`` contains it — the classic
    "clicks within an hour of a purchase" shape.  Unlike the as-of join
    a left row can match many right rows, so this is a true interval
    join, not a merge.

    Distributed shape: ONE pruned read, both sides tagged, hash-
    co-partitioned by a coarse user key, then a per-partition vectorized
    equi-merge on user_id followed by the interval filter.  The per-user
    click x purchase cross product is the unit of work — bounded by
    window density per user; a pathological single hot user would need
    time-chunk salting with window-length overlap, the standard interval
    -join mitigation.  DuckDB's IEJoin is the oracle.
    """
    import ray.data

    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def tag(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"),
                     value_set=pa.array([left_type, right_type]))
        t = t.filter(m)
        return pa.table({
            "event_id": t.column("event_id"),
            "epoch_us": pc.cast(t.column("ts"), pa.int64()),
            "user_id": t.column("user_id"),
            "is_left": pc.equal(t.column("event_type"), left_type),
            "coarse": pc.bit_wise_and(t.column("user_id"), 255),
        })

    win_us = window_s * 1_000_000

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[g["is_left"]][["event_id", "user_id", "epoch_us"]]
        right = (g[~g["is_left"]]
                 .rename(columns={"event_id": "matched_event_id",
                                  "epoch_us": "wstart_us"})
                 [["matched_event_id", "user_id", "wstart_us"]])
        if left.empty or right.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "matched_event_id": pd.Series(dtype="int64")})
        m = left.merge(right, on="user_id")
        d = m["epoch_us"] - m["wstart_us"]
        m = m[(d >= 0) & (d < win_us)]
        return pd.DataFrame({"event_id": m["event_id"].astype("int64"),
                             "user_id": m["user_id"].astype("int64"),
                             "matched_event_id":
                                 m["matched_event_id"].astype("int64")})

    return (ev.map_batches(tag, batch_format="pyarrow")
            .groupby("coarse", num_partitions=min(8, shuffle_partitions()))
            .map_groups(merge, batch_format="pandas"))


def events_range_join_sql(left_type: str = "click",
                          right_type: str = "purchase",
                          window_s: int = 3600) -> str:
    return f"""
WITH lefts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{left_type}'
),
rights AS (
  SELECT event_id AS matched_event_id, user_id, ts AS wstart
  FROM events WHERE event_type = '{right_type}'
)
SELECT l.event_id, l.user_id, r.matched_event_id
FROM lefts l JOIN rights r
  ON l.user_id = r.user_id
 AND l.ts >= r.wstart AND l.ts < r.wstart + INTERVAL {window_s} SECOND"""


def events_funnel(sf_dir: str, stages=("view", "click", "purchase")):
    """Funnel analysis: how many users reached each stage IN ORDER —
    stage k counts users whose earliest stage-1..k event times are
    strictly increasing (first view before first click before first
    purchase).

    Shape: per-batch partial min-ts per (user, stage) -> one coarse-hash
    exchange of (user, stage, min_ts) partials
    (:func:`~..stages.exact_agg.grouped_aggregate`) -> per-partition
    pivot + vectorized ordering test -> tiny count aggregation.  Only
    per-user minima cross the wire, never events.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        m = pc.is_in(t.column("event_type"), value_set=pa.array(list(stages)))
        t = t.filter(m)
        tt = pa.table({"user_id": t.column("user_id"),
                       "event_type": t.column("event_type"),
                       "ts_us": pc.cast(t.column("ts"), pa.int64())})
        return (tt.group_by(["user_id", "event_type"])
                .aggregate([("ts_us", "min")])
                .rename_columns(["user_id", "event_type", "min_ts"]))

    mins = grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["user_id", "event_type"], [("min_ts", "min", "min_ts")])

    def pivot_count(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="user_id", columns="event_type",
                          values="min_ts", aggfunc="min")
        reached = pd.Series(True, index=p.index)
        out = []
        prev = None
        for k, st in enumerate(stages):
            cur = p[st] if st in p.columns else pd.Series(float("nan"),
                                                         index=p.index)
            reached = reached & cur.notna() if prev is None else \
                reached & cur.notna() & (cur > prev)
            prev = cur.where(reached)
            out.append((st, int(reached.sum())))
        return pd.DataFrame({"stage": [s for s, _ in out],
                             "n_users": [n for _, n in out]})

    def add_coarse(t: pa.Table) -> pa.Table:
        return t.append_column(
            "coarse", pc.cast(pc.bit_wise_and(t.column("user_id"), 63),
                              pa.int64()))

    per_part = (mins.map_batches(add_coarse, batch_format="pyarrow")
                .groupby("coarse", num_partitions=min(8, shuffle_partitions()))
                .map_groups(pivot_count, batch_format="pandas"))
    return (per_part.groupby("stage", num_partitions=2)
            .aggregate(Sum("n_users", alias_name="n_users")))


def events_retention(sf_dir: str, period_s: int = 86400):
    """Day-over-day retention: per day, distinct active users and how
    many of them are also active the NEXT day.

    Shape: per-batch (day, user) dedupe partial -> one coarse-hash
    exchange makes (day, user) distinct while ALSO summing presence
    flags for 'active today' vs 'active tomorrow' (each distinct pair
    emits a second row tagged to the previous day, so the intersection
    becomes a per-key flag test — no self-join, no second shuffle of
    the data) -> tiny per-day count aggregation.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"day": _period_index(t.column("ts"), period_s),
                       "user_id": t.column("user_id")})
        tt = (tt.group_by(["day", "user_id"]).aggregate([([], "count_all")])
              .rename_columns(["day", "user_id", "__n"]))
        d = tt.column("day")
        u = tt.column("user_id")
        ones = pa.array(np.ones(len(d), dtype=np.int64))
        zeros = pa.array(np.zeros(len(d), dtype=np.int64))
        # row 1: active on `day`; row 2: presence credited to day-1
        return pa.table({
            "day": pa.concat_arrays([d.combine_chunks(),
                                     pc.subtract(d, 1).combine_chunks()]),
            "user_id": pa.concat_arrays([u.combine_chunks(),
                                         u.combine_chunks()]),
            "a": pa.concat_arrays([ones, zeros]),
            "p": pa.concat_arrays([zeros, ones]),
        })

    flags = grouped_aggregate(
        ev.map_batches(partial, batch_format="pyarrow"),
        ["day", "user_id"], [("a", "max", "a"), ("p", "max", "p")])

    def day_partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t.column("a"), 0))
        return (t.group_by(["day"])
                .aggregate([("a", "sum"), ("p", "sum")])
                .rename_columns(["day", "n_active", "n_retained"]))

    return (flags.map_batches(day_partial, batch_format="pyarrow")
            .groupby("day", num_partitions=min(8, shuffle_partitions()))
            .aggregate(Sum("n_active", alias_name="n_active"),
                       Sum("n_retained", alias_name="n_retained")))


def events_retention_sql(period_s: int = 86400) -> str:
    return f"""
WITH du AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / {period_s}) AS BIGINT) AS day,
         user_id
  FROM events
)
SELECT a.day, CAST(count(*) AS BIGINT) AS n_active,
       CAST(count(b.user_id) AS BIGINT) AS n_retained
FROM du a LEFT JOIN du b
  ON b.user_id = a.user_id AND b.day = a.day + 1
GROUP BY a.day"""


def events_window_top_users(sf_dir: str, window_s: int = 3600, k: int = 3):
    """Windowed top-k: per tumbling window, the ``k`` users with the
    highest summed value — the "leaders per hour" composition.

    Shape: per-batch (window, user) partial sums -> one coarse-hash
    exchange (:func:`~..stages.exact_agg.grouped_aggregate`) -> window-
    partitioned vectorized rank+head (windows are coarse by
    construction, so per-group overhead is bounded by the time span,
    not the data).  Deterministic tie-break (value desc, user asc)
    matches the row_number oracle exactly.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"window_start": _window_start(t.column("ts"), window_s),
                       "user_id": t.column("user_id"),
                       "total_value_cents": _value_cents(t.column("value"))})
        return (tt.group_by(["window_start", "user_id"])
                .aggregate([("total_value_cents", "sum")])
                .rename_columns(["window_start", "user_id",
                                 "total_value_cents"]))

    agg = grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["window_start", "user_id"],
        [("total_value_cents", "sum", "total_value_cents")])

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(["window_start", "total_value_cents", "user_id"],
                           ascending=[True, False, True], kind="stable"))
        g["rank"] = g.groupby("window_start", sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        g["rank"] = g["rank"].astype("int64")
        return g.reset_index(drop=True)

    return (agg.groupby("window_start",
                        num_partitions=min(8, shuffle_partitions()))
            .map_groups(topk, batch_format="pandas"))


def events_window_top_users_sql(window_s: int = 3600, k: int = 3) -> str:
    return f"""
WITH w AS (
  SELECT CAST(floor(epoch(ts) / {window_s}) * {window_s} AS BIGINT)
           AS window_start,
         user_id,
         CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
           AS total_value_cents
  FROM events GROUP BY 1, 2
)
SELECT window_start, user_id, total_value_cents, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY window_start
            ORDER BY total_value_cents DESC, user_id) AS rank
  FROM w)
WHERE rank <= {k}"""


def events_cohorts(sf_dir: str, period_s: int = 86400, coarse: int = 64):
    """Cohort retention matrix: users grouped by their FIRST active day
    (the cohort); for every (cohort, day) cell, how many of that
    cohort's users were active that day.

    Shape: per-batch (day, user) dedupe partial -> ONE user-bucket
    exchange; inside each bucket a vectorized pandas pass computes each
    user's cohort (min day) and emits its distinct (cohort, day) rows
    pre-counted -> tiny (cohort, day) count aggregation.  Cohort
    assignment never needs a second shuffle or a broadcast user map.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({"day": _period_index(t.column("ts"), period_s),
                       "user_id": t.column("user_id")})
        tt = (tt.group_by(["day", "user_id"]).aggregate([([], "count_all")])
              .rename_columns(["day", "user_id", "__n"]))
        tt = tt.drop_columns(["__n"])  # dedupe artifact — never shuffle it
        return tt.append_column(
            "coarse", pc.cast(pc.bit_wise_and(tt.column("user_id"),
                                              coarse - 1), pa.int64()))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["day", "user_id"])
        cohort = g.groupby("user_id", sort=False)["day"].transform("min")
        out = (pd.DataFrame({"cohort": cohort, "day": g["day"]})
               .groupby(["cohort", "day"], sort=False)
               .size().rename("n_users").reset_index())
        out["n_users"] = out["n_users"].astype("int64")
        return out

    rows = (ev.map_batches(partial, batch_format="pyarrow")
            .groupby("coarse", num_partitions=min(8, shuffle_partitions()))
            .map_groups(per_bucket, batch_format="pandas"))
    return grouped_aggregate(rows, ["cohort", "day"],
                             [("n_users", "sum", "n_users")])


def events_cohorts_sql(period_s: int = 86400) -> str:
    return f"""
WITH du AS (
  SELECT DISTINCT CAST(floor(epoch(ts) / {period_s}) AS BIGINT) AS day,
         user_id
  FROM events
),
c AS (SELECT user_id, min(day) AS cohort FROM du GROUP BY user_id)
SELECT c.cohort, du.day, CAST(count(*) AS BIGINT) AS n_users
FROM du JOIN c ON c.user_id = du.user_id
GROUP BY 1, 2"""


def events_funnel_sql(stages=("view", "click", "purchase")) -> str:
    mins = ", ".join(
        f"min(CASE WHEN event_type = '{s}' THEN epoch_us(ts) END) AS t{k}"
        for k, s in enumerate(stages))
    rows = []
    for k, s in enumerate(stages):
        cond = " AND ".join(
            ["t0 IS NOT NULL"]
            + [f"t{i} IS NOT NULL AND t{i} > t{i-1}" for i in range(1, k + 1)])
        rows.append(f"SELECT '{s}' AS stage, CAST(count(*) FILTER (WHERE {cond}) "
                    f"AS BIGINT) AS n_users FROM m")
    union = " UNION ALL ".join(rows)
    return f"""
WITH m AS (
  SELECT user_id, {mins} FROM events GROUP BY user_id
)
{union}"""


def events_asof_join_sql(left_type: str = "click",
                         right_type: str = "view") -> str:
    # Deliberately NOT DuckDB's native ASOF JOIN: its pick among tied
    # right-side (user_id, view_ts) rows is unspecified, while the Ray
    # plan resolves ties to the max view_event_id (merge_asof last-row
    # rule).  The window formulation pins the same deterministic choice.
    return f"""
WITH lefts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{left_type}'
),
rights AS (
  SELECT event_id AS view_event_id, user_id, ts AS view_ts
  FROM events WHERE event_type = '{right_type}'
),
matched AS (
  SELECT l.event_id, l.user_id, r.view_event_id,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.view_ts DESC, r.view_event_id DESC) AS rn
  FROM lefts l JOIN rights r
    ON l.user_id = r.user_id AND r.view_ts <= l.ts
)
SELECT event_id, user_id, view_event_id FROM matched WHERE rn = 1"""


def events_asof_join_forward_sql(left_type: str = "click",
                                 right_type: str = "view") -> str:
    # forward variant: earliest right at-or-after; ties -> MIN
    # view_event_id (merge_asof first-row rule under ascending sort)
    return f"""
WITH lefts AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = '{left_type}'
),
rights AS (
  SELECT event_id AS view_event_id, user_id, ts AS view_ts
  FROM events WHERE event_type = '{right_type}'
),
matched AS (
  SELECT l.event_id, l.user_id, r.view_event_id,
         row_number() OVER (
           PARTITION BY l.event_id
           ORDER BY r.view_ts ASC, r.view_event_id ASC) AS rn
  FROM lefts l JOIN rights r
    ON l.user_id = r.user_id AND r.view_ts >= l.ts
)
SELECT event_id, user_id, view_event_id FROM matched WHERE rn = 1"""


def q6_forecast_revenue(sf_dir: str, year: str = "1996",
                        disc_lo: int = 3, disc_hi: int = 7,
                        max_qty: int = 24):
    """TPC-H Q6-shaped forecast-revenue: one filtered full-table scan
    reduced to a single row — the canonical 'prune at the read, reduce
    to partials' shape (no shuffle at all; per-batch integer-cent
    partials meet in one tiny global aggregate).  Discount is filtered
    in exact cents (round(l_discount*100)) so the SQL mirror is
    bit-identical."""
    import ray.data
    from ray.data.aggregate import Sum

    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{int(year) + 1}-01-01")

    def partial(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        disc_c = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        m2 = pc.and_(
            pc.and_(pc.greater_equal(disc_c, pa.scalar(disc_lo, pa.int64())),
                    pc.less_equal(disc_c, pa.scalar(disc_hi, pa.int64()))),
            pc.less(t.column("l_quantity"), pa.scalar(float(max_qty))))
        t = t.filter(m2)
        disc_c = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                              pa.scalar(100.0))), pa.int64())
        price_c = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                               pa.scalar(100.0))), pa.int64())
        rev_e4 = pc.multiply(price_c, disc_c)
        return pa.table({
            "revenue_e4": pa.array(
                [pc.sum(rev_e4).as_py() or 0], pa.int64()),
            "n_items": pa.array([t.num_rows], pa.int64()),
        })

    ds = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"])
        .map_batches(partial, batch_format="pyarrow"))
    agg = ds.aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                       Sum("n_items", alias_name="n_items"))
    return pd.DataFrame({"revenue_e4": [int(agg["revenue_e4"] or 0)],
                         "n_items": [int(agg["n_items"] or 0)]})


def q6_sql(year: str = "1996", disc_lo: int = 3, disc_hi: int = 7,
           max_qty: int = 24) -> str:
    return f"""
SELECT CAST(coalesce(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                         * CAST(round(l_discount * 100.0) AS BIGINT)), 0)
            AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{year}-01-01'
  AND l_shipdate < TIMESTAMP '{int(year) + 1}-01-01'
  AND CAST(round(l_discount * 100.0) AS BIGINT) BETWEEN {disc_lo} AND {disc_hi}
  AND l_quantity < {max_qty}"""

# --- round-5 maintenance split: the waves below live in sibling
# modules; this facade preserves the original import surface
# (`from ..pipelines import relational as R`).
from .relational_events import *  # noqa: F401,F403,E402
from .relational_tpch2 import *  # noqa: F401,F403,E402
