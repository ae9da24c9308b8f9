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

def _period_index(ts_col, period_s: int):
    """ts -> floor(epoch/period) period ordinal (int64); shared by every
    time-bucketed events query so the derivation can't drift."""
    epoch = pc.divide(pc.cast(ts_col, pa.int64()), 1_000_000)
    return pc.cast(pc.floor(pc.divide(pc.cast(epoch, pa.float64()),
                                      float(period_s))), pa.int64())


def _window_start(ts_col, window_s: int):
    """ts -> epoch-second tumbling-window start (int64)."""
    return pc.multiply(_period_index(ts_col, window_s), window_s)


def _value_cents(value_col):
    """Money in integer cents (fp sums break value-hash oracles)."""
    return pc.cast(pc.round(pc.multiply(value_col, pa.scalar(100.0))),
                   pa.int64())


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


def low_activity_customers(sf_dir: str, k: int = 5):
    """ANTI-join-family query: customers with FEWER than ``k`` orders —
    the churn / low-engagement segment (zero-order customers included,
    which is the part an inner join silently drops).  Composes the
    LEFT OUTER join (:func:`customer_order_totals`) with a count
    filter, so it inherits its scale shape: pre-aggregated order side,
    one coarse-hash exchange, no broadcast of either corpus-scale
    side."""
    ds = customer_order_totals(sf_dir)
    return (ds.filter(expr=f"order_count < {k}")
            .map_batches(lambda t: t.select(
                ["c_custkey", "c_mktsegment", "order_count"]),
                batch_format="pyarrow"))


def low_activity_customers_sql(k: int = 5) -> str:
    return f"""
SELECT c.c_custkey, c.c_mktsegment,
       CAST(count(o.o_orderkey) AS BIGINT) AS order_count
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
HAVING count(o.o_orderkey) < {k}"""


def q10_returned_items(sf_dir: str, start: str = "1996-01-01",
                       end: str = "1996-04-01", k: int = 20):
    """TPC-H Q10-shaped returned-item reporting: top-k customers by
    revenue lost to returns in one quarter — a FOUR-table star
    (lineitem x orders large-large on orderkey; customer + nation
    broadcast dims), with the repo's exact integer revenue_e4
    convention (cents x discount-percent, no float sums).

    Scale shape: lineitem pre-aggregates returned-revenue per order
    inside each batch (only order-grain partials reach the exchange);
    the order side carries (orderkey, custkey) for the quarter; both
    sides co-locate through one :func:`~..stages.dedup.coarse_mix`
    exchange, the per-customer reduce runs through
    :func:`~..stages.exact_agg.grouped_aggregate`, and the
    customer/nation dims attach via
    :func:`~..stages.dimjoin.attach_dim_adaptive` (broadcast under a
    byte budget, coarse-hash exchange above — customer is NOT assumed
    dimension-scale).  Only the final top-k sorts.
    """
    import ray
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import process_cached, ref_key, shuffle_partitions

    t0, t1 = pd.Timestamp(start), pd.Timestamp(end)
    coarse = 1024

    def order_side(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"),
                                     pa.scalar(t0)),
                    pc.less(t.column("o_orderdate"), pa.scalar(t1)))
        t = t.filter(m)
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "o_orderkey": keys,
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "revenue_e4": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def li_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("l_returnflag"), "R"))
        price_c = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc_pct = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), pa.int64())
        rev = pc.multiply(price_c, pc.subtract(pa.scalar(100, pa.int64()),
                                               disc_pct))
        g = (pa.table({"o_orderkey": pc.cast(t.column("l_orderkey"),
                                             pa.int64()),
                       "revenue_e4": rev})
             .group_by(["o_orderkey"]).aggregate([("revenue_e4", "sum")])
             .rename_columns(["o_orderkey", "revenue_e4"]))
        keys = g.column("o_orderkey")
        n = g.num_rows
        return pa.table({
            "o_orderkey": keys,
            "o_custkey": pa.array(np.full(n, -1, np.int64)),
            "revenue_e4": g.column("revenue_e4"),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["o_orderkey", "o_custkey"]]
        r = (g.loc[g["side"] == 1, ["o_orderkey", "revenue_e4"]]
             .groupby("o_orderkey", as_index=False).sum())
        out = o.merge(r, on="o_orderkey", how="inner")
        return out[["o_custkey", "revenue_e4"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"])
    joined = (orders.map_batches(order_side, batch_format="pyarrow")
              .union(li.map_batches(li_side, batch_format="pyarrow"))
              .groupby("__coarse", num_partitions=shuffle_partitions())
              .map_groups(join_group, batch_format="pandas"))
    per_cust = grouped_aggregate(
        joined, ["o_custkey"], [("revenue_e4", "sum", "revenue_e4")])

    # customer dim enriched with n_name, then attached SIZE-ADAPTIVELY
    # (customer scales with the fact tables — broadcast only under a
    # byte budget, coarse-hash exchange above it).  Both attaches are
    # INNER: FK orphans (customer missing, or customer with an unknown
    # nation) drop, matching the oracle's inner joins.
    from ..stages.dimjoin import attach_dim_adaptive

    nation_ds = ray.data.read_parquet(f"{sf_dir}/nation.parquet",
                                      columns=["n_nationkey", "n_name"])
    cust_ds = ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                    columns=["c_custkey", "c_name",
                                             "c_nationkey"])
    cust_dim = attach_dim_adaptive(cust_ds, "c_nationkey", nation_ds,
                                   "n_nationkey", ["n_name"], how="inner")

    joined = attach_dim_adaptive(per_cust, "o_custkey", cust_dim,
                                 "c_custkey", ["c_name", "n_name"],
                                 how="inner")

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "c_name": t.column("c_name"),
            "n_name": t.column("n_name"),
            "revenue_e4": pc.cast(t.column("revenue_e4"), pa.int64()),
        })

    top = (joined.map_batches(finalize, batch_format="pyarrow")
           .sort(["revenue_e4", "c_custkey"], descending=[True, False])
           .limit(k).to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top


def q10_returned_items_sql(start: str = "1996-01-01",
                           end: str = "1996-04-01", k: int = 20) -> str:
    return f"""
WITH agg AS (
  SELECT c.c_custkey, c.c_name, n.n_name,
         CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
              * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
              AS BIGINT) AS revenue_e4
  FROM customer c, orders o, lineitem l, nation n
  WHERE c.c_custkey = o.o_custkey
    AND l.l_orderkey = o.o_orderkey
    AND o.o_orderdate >= DATE '{start}'
    AND o.o_orderdate < DATE '{end}'
    AND l.l_returnflag = 'R'
    AND c.c_nationkey = n.n_nationkey
  GROUP BY 1, 2, 3
)
SELECT c_custkey, c_name, n_name, revenue_e4,
       CAST(row_number() OVER (ORDER BY revenue_e4 DESC, c_custkey)
            AS BIGINT) AS rank
FROM agg
ORDER BY revenue_e4 DESC, c_custkey
LIMIT {k}"""


def q13_customer_distribution(sf_dir: str):
    """TPC-H Q13-shaped customer order-count DISTRIBUTION: how many
    customers placed exactly N orders — including N=0, which only the
    outer join preserves.  Pure composition: the LEFT OUTER join
    (:func:`customer_order_totals`) feeds a second domain-sized
    grouped reduce on the count itself (a histogram over a computed
    key — the two-level aggregate shape).
    """
    from ..stages.exact_agg import grouped_aggregate

    ds = customer_order_totals(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({"order_count": pc.cast(t.column("order_count"),
                                                pa.int64())})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["order_count"], [("", "count", "n_customers")])


def q13_customer_distribution_sql() -> str:
    return """
WITH per_cust AS (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS order_count
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY c.c_custkey
)
SELECT order_count, CAST(count(*) AS BIGINT) AS n_customers
FROM per_cust GROUP BY order_count"""


def q12_shipmode_priority(sf_dir: str, start: str = "1996-01-01",
                          end: str = "1997-01-01"):
    """TPC-H Q12-shaped conditional counting join: per lineitem
    return-flag class, how many of the year's line items belong to
    high- vs low-priority orders (Q12 proper splits by ship mode,
    which this corpus lacks; return flag plays that role).  The CASE
    aggregation happens BEFORE the join — each side reduces to
    order-grain partials, one coarse exchange co-locates them, and
    the final reduce is class-domain-sized.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    t0, t1 = pd.Timestamp(start), pd.Timestamp(end)
    coarse = 1024

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        hi = pc.cast(pc.is_in(t.column("o_orderpriority"),
                              value_set=pa.array(["1-URGENT", "2-HIGH"])),
                     pa.int64())
        n = t.num_rows
        return pa.table({
            "o_orderkey": keys,
            "high_prio": hi,
            "l_returnflag": pa.array([None] * n, pa.string()),
            "n_items": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def li_side(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"),
                                     pa.scalar(t0)),
                    pc.less(t.column("l_shipdate"), pa.scalar(t1)))
        t = t.filter(m)
        g = (pa.table({"o_orderkey": pc.cast(t.column("l_orderkey"),
                                             pa.int64()),
                       "l_returnflag": t.column("l_returnflag")})
             .group_by(["o_orderkey", "l_returnflag"])
             .aggregate([([], "count_all")])
             .rename_columns(["o_orderkey", "l_returnflag", "n_items"]))
        keys = g.column("o_orderkey")
        n = g.num_rows
        return pa.table({
            "o_orderkey": keys,
            "high_prio": pa.array(np.full(n, -1, np.int64)),
            "l_returnflag": g.column("l_returnflag"),
            "n_items": pc.cast(g.column("n_items"), pa.int64()),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["side"] == 0, ["o_orderkey", "high_prio"]]
        li = g.loc[g["side"] == 1,
                   ["o_orderkey", "l_returnflag", "n_items"]]
        out = li.merge(o, on="o_orderkey", how="inner")
        out["high_count"] = (out["n_items"]
                             * out["high_prio"]).astype("int64")
        out["low_count"] = (out["n_items"]
                            * (1 - out["high_prio"])).astype("int64")
        return out[["l_returnflag", "high_count", "low_count"]]

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"])
    joined = (orders.map_batches(order_side, batch_format="pyarrow")
              .union(li.map_batches(li_side, batch_format="pyarrow"))
              .groupby("__coarse", num_partitions=shuffle_partitions())
              .map_groups(join_group, batch_format="pandas"))
    return grouped_aggregate(
        joined, ["l_returnflag"],
        [("high_count", "sum", "high_line_count"),
         ("low_count", "sum", "low_line_count")])


def q12_shipmode_priority_sql(start: str = "1996-01-01",
                              end: str = "1997-01-01") -> str:
    return f"""
SELECT l.l_returnflag,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o, lineitem l
WHERE o.o_orderkey = l.l_orderkey
  AND l.l_shipdate >= DATE '{start}'
  AND l.l_shipdate < DATE '{end}'
GROUP BY l.l_returnflag"""


def q18_large_volume_orders(sf_dir: str, qty_threshold: int = 200,
                            k: int = 50):
    """TPC-H Q18-shaped large-volume customers: orders whose TOTAL line
    quantity exceeds a threshold, with the buying customer attached —
    the HAVING-over-join shape (the filter applies to an aggregate the
    scan cannot see, so it must run after the per-order reduce).

    Quantities are 2-decimal doubles -> summed in exact integer
    CENTI-UNITS (the repo's money convention) so the HAVING comparison
    and the output hash match bit-for-bit.  Shape: per-batch per-order
    quantity partials -> per-order reduce through
    :func:`~..stages.exact_agg.grouped_aggregate` -> threshold filter
    (order-grain, post-aggregate) -> one coarse exchange joins the
    surviving orders (small by construction) with the order side for
    custkey -> top-k.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    coarse = 1024
    thr_centi = qty_threshold * 100

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        q_centi = pc.cast(pc.round(pc.multiply(t.column("l_quantity"),
                                               pa.scalar(100.0))),
                          pa.int64())
        return (pa.table({"o_orderkey": pc.cast(t.column("l_orderkey"),
                                                pa.int64()),
                          "qty_centi": q_centi})
                .group_by(["o_orderkey"]).aggregate([("qty_centi", "sum")])
                .rename_columns(["o_orderkey", "qty_centi"]))

    per_order = grouped_aggregate(
        li.map_batches(qty_partial, batch_format="pyarrow"),
        ["o_orderkey"], [("qty_centi", "sum", "qty_centi")])
    big = per_order.filter(expr=f"qty_centi > {thr_centi}")

    def big_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "o_orderkey": keys,
            "qty_centi": pc.cast(t.column("qty_centi"), pa.int64()),
            "o_custkey": pa.array(np.full(n, -1, np.int64)),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "o_orderkey": keys,
            "qty_centi": pa.array(np.zeros(n, np.int64)),
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        b = g.loc[g["side"] == 1, ["o_orderkey", "qty_centi"]]
        o = g.loc[g["side"] == 0, ["o_orderkey", "o_custkey"]]
        return b.merge(o, on="o_orderkey", how="inner")

    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])
    joined = (big.map_batches(big_side, batch_format="pyarrow")
              .union(orders.map_batches(order_side,
                                        batch_format="pyarrow"))
              .groupby("__coarse", num_partitions=shuffle_partitions())
              .map_groups(join_group, batch_format="pandas"))
    top = (joined.sort(["qty_centi", "o_orderkey"],
                       descending=[True, False]).limit(k).to_pandas())
    top["rank"] = np.arange(1, len(top) + 1, dtype=np.int64)
    return top[["o_orderkey", "o_custkey", "qty_centi", "rank"]]


def q18_large_volume_orders_sql(qty_threshold: int = 200,
                                k: int = 50) -> str:
    return f"""
WITH per_order AS (
  SELECT l_orderkey AS o_orderkey,
         CAST(sum(CAST(round(l_quantity * 100.0) AS BIGINT)) AS BIGINT)
           AS qty_centi
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(round(l_quantity * 100.0) AS BIGINT))
         > {qty_threshold * 100}
)
SELECT p.o_orderkey, o.o_custkey, p.qty_centi,
       CAST(row_number() OVER (ORDER BY p.qty_centi DESC, p.o_orderkey)
            AS BIGINT) AS rank
FROM per_order p JOIN orders o ON o.o_orderkey = p.o_orderkey
ORDER BY p.qty_centi DESC, p.o_orderkey
LIMIT {k}"""


def relational_integrity(sf_dir: str,
                         broadcast_max_bytes: int = 256 << 20):
    """Multi-foreign-key integrity audit across the warehouse tables:
    one row per FK edge with the referencing row count and the orphan
    count — the cross-TABLE counterpart of the corpus-level
    ``ref_integrity`` constraint.

    Scale shapes per edge, SIZE-ADAPTIVE: a referenced key set under a
    byte budget broadcasts as a sorted key array (``pc.is_in`` inside a
    stateless scan); above the budget — customer/orders scale with the
    fact tables, so no referenced side is ASSUMED dimension-scale —
    the edge audits through one coarse-hash exchange of side-tagged
    DEDUPED key partials (only distinct keys per batch cross the
    wire).  lineitem->orders always takes the exchange plan; both
    plans are pinned result-identical in ``tests/test_stages_misc``.
    """
    import ray
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import process_cached, ref_key, shuffle_partitions

    rows = []
    coarse = 1024

    # --- broadcast plan: referenced key set fits a byte budget -------
    def broadcast_edge(fk_name, table, col, ref_keys_ds):
        keys_tbl = pa.concat_tables(ray.get(ref_keys_ds.to_arrow_refs()))
        keys = pc.cast(keys_tbl.column(keys_tbl.schema.names[0]),
                       pa.int64())
        uniq = np.sort(pc.unique(keys).to_numpy(zero_copy_only=False))
        bref = ray.put(pa.array(uniq, pa.int64()))

        class Audit:
            def __init__(self, r):
                self.keys = ray.get(r)

            def __call__(self, t: pa.Table) -> pa.Table:
                col_a = pc.cast(t.column(col), pa.int64())
                hit = pc.is_in(col_a, value_set=self.keys)
                n = t.num_rows
                miss = n - pc.sum(pc.cast(hit, pa.int64())).as_py()
                return pa.table({"n_rows": pa.array([n], pa.int64()),
                                 "n_orphans": pa.array([int(miss)],
                                                       pa.int64())})

        agg = (ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                     columns=[col])
               .map_batches(process_cached(Audit, ref_key(bref), bref),
                            batch_format="pyarrow").to_pandas().sum())
        rows.append((fk_name, int(agg["n_rows"]), int(agg["n_orphans"])))

    # --- exchange plan: neither side broadcasts; side-tagged DEDUPED
    # key partials co-locate through one coarse-hash groupby ----------
    def exchange_edge(fk_name, table, col, ref_keys_ds, ref_col):
        def referencing_keys(t: pa.Table) -> pa.Table:
            g = (pa.table({"k": pc.cast(t.column(col), pa.int64())})
                 .group_by(["k"]).aggregate([([], "count_all")])
                 .rename_columns(["k", "n_ref"]))
            keys = g.column("k")
            n = g.num_rows
            return pa.table({
                "k": keys, "n_ref": pc.cast(g.column("n_ref"), pa.int64()),
                "present": pa.array(np.zeros(n, np.int64)),
                "__coarse": pa.array(coarse_mix(keys.to_numpy(),
                                                coarse - 1), pa.int64()),
            })

        def referenced_keys(t: pa.Table) -> pa.Table:
            keys = pc.cast(t.column(ref_col), pa.int64())
            n = t.num_rows
            return pa.table({
                "k": keys,
                "n_ref": pa.array(np.zeros(n, np.int64)),
                "present": pa.array(np.ones(n, np.int64)),
                "__coarse": pa.array(coarse_mix(keys.to_numpy(),
                                                coarse - 1), pa.int64()),
            })

        def audit_group(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("k", sort=False).agg(
                n_ref=("n_ref", "sum"), present=("present", "max"))
            orphans = int(agg.loc[agg["present"] == 0, "n_ref"].sum())
            return pd.DataFrame({"n_rows": [int(agg["n_ref"].sum())],
                                 "n_orphans": [orphans]})

        refing = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                       columns=[col])
        tot = (refing.map_batches(referencing_keys, batch_format="pyarrow")
               .union(ref_keys_ds.map_batches(referenced_keys,
                                              batch_format="pyarrow"))
               .groupby("__coarse", num_partitions=shuffle_partitions())
               .map_groups(audit_group, batch_format="pandas")
               .to_pandas().sum())
        rows.append((fk_name, int(tot["n_rows"]), int(tot["n_orphans"])))

    # --- size-adaptive dispatch: broadcast only under a byte budget.
    # nation/region are genuinely dimension-scale; customer and orders
    # scale with the fact tables, so their edges must survive the
    # referenced side outgrowing worker heaps (the exchange plan). ----
    def audit_edge(fk_name, table, col, ref_table, ref_col):
        ref_keys_ds = ray.data.read_parquet(
            f"{sf_dir}/{ref_table}.parquet",
            columns=[ref_col]).materialize()
        size = ref_keys_ds.size_bytes() or broadcast_max_bytes + 1
        if size <= broadcast_max_bytes:
            broadcast_edge(fk_name, table, col, ref_keys_ds)
        else:
            exchange_edge(fk_name, table, col, ref_keys_ds, ref_col)

    audit_edge("orders.o_custkey->customer", "orders", "o_custkey",
               "customer", "c_custkey")
    audit_edge("customer.c_nationkey->nation", "customer",
               "c_nationkey", "nation", "n_nationkey")
    audit_edge("nation.n_regionkey->region", "nation", "n_regionkey",
               "region", "r_regionkey")
    # lineitem -> orders is always large-large: force the exchange plan
    # (also keeps it continuously exercised at test scale)
    exchange_edge("lineitem.l_orderkey->orders", "lineitem", "l_orderkey",
                  ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                        columns=["o_orderkey"]),
                  "o_orderkey")

    return pd.DataFrame({
        "fk": [r[0] for r in rows],
        "n_rows": pd.Series([r[1] for r in rows], dtype="int64"),
        "n_orphans": pd.Series([r[2] for r in rows], dtype="int64"),
    })


def relational_integrity_sql() -> str:
    return """
SELECT 'orders.o_custkey->customer' AS fk,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_orphans
FROM orders o LEFT JOIN customer c ON c.c_custkey = o.o_custkey
UNION ALL
SELECT 'customer.c_nationkey->nation',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN n.n_nationkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)
FROM customer c LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
UNION ALL
SELECT 'nation.n_regionkey->region',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN r.r_regionkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)
FROM nation n LEFT JOIN region r ON r.r_regionkey = n.n_regionkey
UNION ALL
SELECT 'lineitem.l_orderkey->orders',
       CAST(count(*) AS BIGINT),
       CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
            AS BIGINT)
FROM lineitem l LEFT JOIN orders o ON o.o_orderkey = l.l_orderkey"""


def events_interarrival(sf_dir: str, coarse: int = 64):
    """Per-user INTER-ARRIVAL gap statistics (count / sum / min / max of
    consecutive-event gaps in integer MICROSECONDS) — the engagement-
    cadence features behind churn models and bot detection.  Exact by
    construction: gaps are int64 differences of the parquet timestamps
    (no float time math), and the gap MULTISET is invariant to how
    equal timestamps tie-break (diffs of a sorted sequence depend only
    on its values), so the oracle's window ordering is safe.

    Same co-partition shape as :func:`events_sessionize`: users
    co-locate via a coarse bucket key, one vectorized sorted-diff per
    bucket; users with a single event emit nothing (no gaps), exactly
    like the SQL.
    """
    import ray.data

    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "ts"])

    def add_coarse(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.bit_wise_and(t.column("user_id"), coarse - 1),
                    pa.int64())
        return t.append_column("coarse", c)

    def gaps_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"])
        us = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        d = pd.DataFrame({"user_id": g["user_id"].to_numpy(),
                          "gap_us": np.concatenate(([0], np.diff(us)))})
        first = d["user_id"].ne(d["user_id"].shift())
        d = d[~first]
        out = (d.groupby("user_id", sort=False)
               .agg(n_gaps=("gap_us", "size"), sum_gap_us=("gap_us", "sum"),
                    min_gap_us=("gap_us", "min"),
                    max_gap_us=("gap_us", "max")).reset_index())
        for c in ("n_gaps", "sum_gap_us", "min_gap_us", "max_gap_us"):
            out[c] = out[c].astype("int64")
        return out

    return (ds.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("coarse",
                     num_partitions=min(coarse, shuffle_partitions()))
            .map_groups(gaps_bucket, batch_format="pandas")
            .map_batches(lambda t: t.select(
                ["user_id", "n_gaps", "sum_gap_us", "min_gap_us",
                 "max_gap_us"]), batch_format="pyarrow"))


def events_interarrival_sql() -> str:
    return """
WITH gaps AS (
  SELECT user_id,
         epoch_us(ts) - epoch_us(lag(ts) OVER
             (PARTITION BY user_id ORDER BY ts)) AS gap_us
  FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
       CAST(min(gap_us) AS BIGINT) AS min_gap_us,
       CAST(max(gap_us) AS BIGINT) AS max_gap_us
FROM gaps WHERE gap_us IS NOT NULL
GROUP BY user_id"""


def orders_monthly_priority(sf_dir: str):
    """Calendar reporting rollup: orders and spend per (month,
    priority) — the month-granularity counterpart of the event-time
    windows (``strftime`` month truncation mirrored on both sides,
    money in exact integer cents).  Per-batch partials over the
    (months x priorities) domain, one tiny exchange."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    ds = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        month = pc.strftime(pc.floor_temporal(t.column("o_orderdate"),
                                              unit="month"),
                            format="%Y-%m")
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({"month": month,
                         "o_orderpriority": t.column("o_orderpriority"),
                         "total_price_cents": cents})

    return grouped_aggregate(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["month", "o_orderpriority"],
        [("", "count", "n_orders"),
         ("total_price_cents", "sum", "total_price_cents")])


def orders_monthly_priority_sql() -> str:
    return """
SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS month,
       o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT)
         AS total_price_cents
FROM orders GROUP BY 1, 2"""


def events_transition_matrix(sf_dir: str, coarse: int = 64):
    """Event-type TRANSITION MATRIX: counts of (event_type ->
    next_event_type) over each user's time-ordered stream — the Markov
    session features behind next-action models and funnel discovery.
    Ordering is pinned on (ts, event_id) on BOTH sides, so tied
    timestamps cannot flake the oracle (the determinism rule the as-of
    join established).

    Same coarse user-bucket co-partition as
    :func:`events_sessionize`; inside a bucket the next-event pairing
    is one vectorized shift; per-batch pair counts reduce through one
    (type x type)-domain exchange.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"])

    def add_coarse(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.bit_wise_and(t.column("user_id"), coarse - 1),
                    pa.int64())
        return t.append_column("coarse", c)

    def pairs_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"])
        cur = g["event_type"].to_numpy(dtype=object)
        nxt = np.roll(cur, -1)
        same_user = (g["user_id"].to_numpy()
                     == np.roll(g["user_id"].to_numpy(), -1))
        same_user[-1] = False
        d = (pd.DataFrame({"event_type": cur[same_user],
                           "next_event_type": nxt[same_user]})
             .groupby(["event_type", "next_event_type"], sort=False)
             .size().rename("n").reset_index())
        d["n"] = d["n"].astype("int64")
        return d

    parts = (ds.map_batches(add_coarse, batch_format="pyarrow")
             .groupby("coarse",
                      num_partitions=min(coarse, shuffle_partitions()))
             .map_groups(pairs_bucket, batch_format="pandas"))
    return grouped_aggregate(parts, ["event_type", "next_event_type"],
                             [("n", "sum", "n")])


def events_transition_matrix_sql() -> str:
    return """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id)
           AS next_event_type
  FROM events
)
SELECT event_type, next_event_type, CAST(count(*) AS BIGINT) AS n
FROM seq WHERE next_event_type IS NOT NULL
GROUP BY event_type, next_event_type"""


def _custkey_zero_side(t: pa.Table, coarse: int) -> pa.Table:
    """Shared customer side for the custkey-keyed count merges
    (full-outer accounting + degree histogram): (k, 0, side=0) rows."""
    from ..stages.dedup import coarse_mix

    keys = pc.cast(t.column("c_custkey"), pa.int64())
    n = t.num_rows
    return pa.table({
        "k": keys, "n_orders": pa.array(np.zeros(n, np.int64)),
        "side": pa.array(np.zeros(n, np.int64)),
        "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                             pa.int64())})


def customer_orders_full_outer(sf_dir: str, coarse: int = 1024):
    """FULL OUTER join accounting: classify every customer key into
    'both' / 'customer_only' / 'order_only' with distinct-key and order
    counts — the join-surface completer next to the inner (q3/q5) and
    left-outer (customer_order_totals) members.  Right-side orphans are
    synthesized deterministically (orders with o_orderkey % 50 < 2
    re-homed at o_custkey + 1e6, mirrored in the SQL oracle) so the
    'order_only' branch is actually exercised on this corpus.

    Shape: orders pre-aggregate per batch to (custkey, n) partials;
    both sides — customer-cardinality each — co-locate through one
    coarse-hash exchange; the per-bucket classify is one vectorized
    merge; output is 3 rows.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def cust_side(t: pa.Table) -> pa.Table:
        return _custkey_zero_side(t, coarse)

    def order_side(t: pa.Table) -> pa.Table:
        ck = pc.cast(t.column("o_custkey"), pa.int64()).to_numpy()
        ok = pc.cast(t.column("o_orderkey"), pa.int64()).to_numpy()
        keys = np.concatenate((ck, ck[ok % 50 < 2] + 1_000_000))
        g = (pa.table({"k": pa.array(keys, pa.int64())})
             .group_by(["k"]).aggregate([([], "count_all")])
             .rename_columns(["k", "n_orders"]))
        kk = g.column("k")
        return pa.table({
            "k": kk, "n_orders": pc.cast(g.column("n_orders"), pa.int64()),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"match_status": pd.Series(dtype="object"),
                "n_custkeys": pd.Series(dtype="int64"),
                "n_orders": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = g.groupby("k", as_index=False).agg(
            has_c=("side", lambda s: (s == 0).any()),
            n_orders=("n_orders", "sum"))
        status = np.where(per["has_c"] & (per["n_orders"] > 0), "both",
                          np.where(per["has_c"], "customer_only",
                                   "order_only"))
        out = pd.DataFrame({"match_status": status,
                            "n_orders": per["n_orders"].astype("int64")})
        r = out.groupby("match_status", as_index=False).agg(
            n_custkeys=("n_orders", "size"), n_orders=("n_orders", "sum"))
        r["n_custkeys"] = r["n_custkeys"].astype("int64")
        r["n_orders"] = r["n_orders"].astype("int64")
        return r

    c = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])
         .map_batches(cust_side, batch_format="pyarrow"))
    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_custkey"])
         .map_batches(order_side, batch_format="pyarrow"))
    parts = (c.union(o)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["match_status"],
                             [("n_custkeys", "sum", "n_custkeys"),
                              ("n_orders", "sum", "n_orders")])


def customer_orders_full_outer_sql() -> str:
    return """
WITH o_aug AS (
  SELECT o_custkey FROM orders
  UNION ALL
  SELECT o_custkey + 1000000 FROM orders WHERE o_orderkey % 50 < 2),
oc AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS n_orders
       FROM o_aug GROUP BY o_custkey),
f AS (
  SELECT (c.c_custkey IS NOT NULL) AS has_c,
         coalesce(oc.n_orders, 0) AS n_orders
  FROM customer c FULL OUTER JOIN oc ON oc.k = c.c_custkey)
SELECT CASE WHEN has_c AND n_orders > 0 THEN 'both'
            WHEN has_c THEN 'customer_only'
            ELSE 'order_only' END AS match_status,
       CAST(count(*) AS BIGINT) AS n_custkeys,
       CAST(sum(n_orders) AS BIGINT) AS n_orders
FROM f GROUP BY 1"""


def customer_order_degree_histogram(sf_dir: str, coarse: int = 1024):
    """Degree-distribution profile: how many customers placed exactly k
    orders, INCLUDING k = 0 (the left-outer zero class) — the skew
    report that sizes reducer hot spots before a custkey-keyed join.

    Shape: the same one-exchange left-outer merge as
    :func:`customer_order_totals`, but the per-bucket output is already
    histogram partials (order_count, n) so the second exchange is
    degree-domain-sized.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def cust_side(t: pa.Table) -> pa.Table:
        return _custkey_zero_side(t, coarse)

    def order_side(t: pa.Table) -> pa.Table:
        g = (pa.table({"k": pc.cast(t.column("o_custkey"), pa.int64())})
             .group_by(["k"]).aggregate([([], "count_all")])
             .rename_columns(["k", "n_orders"]))
        kk = g.column("k")
        return pa.table({
            "k": kk, "n_orders": pc.cast(g.column("n_orders"), pa.int64()),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def hist(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"order_count": pd.Series(dtype="int64"),
                "n_customers": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        per = g.groupby("k", as_index=False).agg(
            has_c=("side", lambda s: (s == 0).any()),
            n_orders=("n_orders", "sum"))
        per = per[per["has_c"]]  # customers only (orphan orders excluded)
        r = (per.groupby("n_orders", as_index=False).size()
             .rename(columns={"n_orders": "order_count",
                              "size": "n_customers"}))
        return r.astype({"order_count": "int64", "n_customers": "int64"})

    c = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey"])
         .map_batches(cust_side, batch_format="pyarrow"))
    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey"])
         .map_batches(order_side, batch_format="pyarrow"))
    parts = (c.union(o)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(hist, batch_format="pandas"))
    return grouped_aggregate(parts, ["order_count"],
                             [("n_customers", "sum", "n_customers")])


def customer_order_degree_histogram_sql() -> str:
    return """
WITH oc AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
            FROM orders GROUP BY o_custkey)
SELECT CAST(coalesce(oc.n, 0) AS BIGINT) AS order_count,
       CAST(count(*) AS BIGINT) AS n_customers
FROM customer c LEFT JOIN oc ON oc.o_custkey = c.c_custkey
GROUP BY coalesce(oc.n, 0)"""


def orders_abc_classification(sf_dir: str):
    """ABC / Pareto inventory classification: parts ranked by revenue
    (descending, ties by partkey) are split at cumulative-revenue
    thresholds — class A covers the first 80% of revenue, B to 95%,
    C the tail — with per-class part counts and exact e4-unit revenue.

    Shape: per-part revenue partials (one partkey-keyed exchange) feed
    :func:`~..stages.rank.budget_select`'s two-phase histogram cumsum
    (global ORDER BY + running total WITHOUT a global sort; driver
    state is distinct-revenue-sized and guarded); the class gate is a
    vectorized integer compare against the broadcast total; output is
    3 rows.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.rank import budget_select
    from ..util import collect_small_arrow

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"])

    def rev_rows(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                             pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(t.column("l_discount"),
                                            pa.scalar(100.0))), pa.int64())
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "rev": pa.array(cents.to_numpy() * (100 - disc.to_numpy()),
                            pa.int64())})

    per_part = grouped_aggregate(li.map_batches(rev_rows,
                                                batch_format="pyarrow"),
                                 ["l_partkey"], [("rev", "sum", "rev")])
    # part-domain-sized: materialize so the total and the class gate
    # don't re-execute the exchange twice
    cum = budget_select(per_part, key_col="rev", id_col="l_partkey",
                        weight_col="rev", budget=(1 << 62)).materialize()
    tot = int(collect_small_arrow(cum.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(pc.sum(t.column("rev")).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow")).to_pandas()["s"].sum())

    # overflow-safe gate: c*100 <= tot*80  <=>  c <= (tot*80)//100 for
    # integer c, and the thresholds are exact PYTHON ints — cum never
    # multiplies in int64 (the SQL side's window sums are HUGEINT)
    thr_a = (tot * 80) // 100
    thr_b = (tot * 95) // 100

    def classify(t: pa.Table) -> pa.Table:
        c = t.column("cum").to_numpy()
        cls = np.where(c <= thr_a, "A", np.where(c <= thr_b, "B", "C"))
        return pa.table({"abc_class": pa.array(cls, pa.string()),
                         "n_parts": pa.array(np.ones(len(c), np.int64)),
                         "revenue_e4": t.column("rev")})

    return grouped_aggregate(
        cum.map_batches(classify, batch_format="pyarrow"),
        ["abc_class"], [("n_parts", "sum", "n_parts"),
                        ("revenue_e4", "sum", "revenue_e4")])


def orders_abc_classification_sql() -> str:
    return """
WITH pr AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
              AS BIGINT) AS rev
  FROM lineitem GROUP BY l_partkey),
c AS (
  SELECT rev,
         sum(rev) OVER (ORDER BY rev DESC, l_partkey
                        ROWS UNBOUNDED PRECEDING) AS cum,
         sum(rev) OVER () AS tot
  FROM pr)
SELECT CASE WHEN cum * 100 <= tot * 80 THEN 'A'
            WHEN cum * 100 <= tot * 95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(rev) AS BIGINT) AS revenue_e4
FROM c GROUP BY 1"""


def nation_revenue_share_bp(sf_dir: str, coarse: int = 1024):
    """Two-level hierarchy share: each nation's customer-order revenue
    as exact integer cents plus its share of the REGION total in
    floor-div basis points — the percent-of-parent rollup every
    geo/org hierarchy report needs (the relational companion of the
    lang/source ratio-to-report).

    Shape: order-grain cents partials co-locate with the customer side
    through one custkey coarse exchange (the customer_order_totals
    shape); nation-domain partials fold through a second tiny
    exchange; the region share is a 25-row driver fold off the nation
    table.
    """
    import pyarrow.parquet as pq
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, shuffle_partitions

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(),
                   nat.column("n_regionkey").to_pylist()))

    def cust_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "k": keys,
            "nation": pc.cast(t.column("c_nationkey"), pa.int64()),
            "cents": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def order_side(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        g = (pa.table({"k": pc.cast(t.column("o_custkey"), pa.int64()),
                       "cents": cents})
             .group_by(["k"]).aggregate([("cents", "sum")])
             .rename_columns(["k", "cents"]))
        kk = g.column("k")
        n = g.num_rows
        return pa.table({
            "k": kk, "nation": pa.array(np.zeros(n, np.int64)),
            "cents": g.column("cents"),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(kk.to_numpy(), coarse - 1),
                                 pa.int64())})

    def per_nation(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"nation": pd.Series(dtype="int64"),
                "revenue_cents": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 0).any():
            return pd.DataFrame(cols)
        c = g.loc[g["side"] == 0, ["k", "nation"]]
        o = (g.loc[g["side"] == 1, ["k", "cents"]]
             .groupby("k", as_index=False).sum())
        j = c.merge(o, on="k", how="inner")
        r = (j.groupby("nation", as_index=False)["cents"].sum()
             .rename(columns={"cents": "revenue_cents"}))
        return r.astype({"nation": "int64", "revenue_cents": "int64"})

    c = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                               columns=["c_custkey", "c_nationkey"])
         .map_batches(cust_side, batch_format="pyarrow"))
    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_custkey", "o_totalprice"])
         .map_batches(order_side, batch_format="pyarrow"))
    per = collect_small_arrow(grouped_aggregate(
        (c.union(o)
         .groupby("__coarse", num_partitions=shuffle_partitions())
         .map_groups(per_nation, batch_format="pandas")),
        ["nation"], [("revenue_cents", "sum", "revenue_cents")])) \
        .to_pandas()
    per["region"] = per["nation"].map(lambda v: n2r[int(v)])
    reg_tot = per.groupby("region")["revenue_cents"].transform("sum")
    per["share_bp"] = (per["revenue_cents"] * 10_000
                       // reg_tot).astype("int64")
    out = per.rename(columns={"nation": "n_nationkey",
                              "region": "r_regionkey"})
    for col in ("n_nationkey", "r_regionkey", "revenue_cents",
                "share_bp"):
        out[col] = out[col].astype("int64")
    return out[["n_nationkey", "r_regionkey", "revenue_cents",
                "share_bp"]].sort_values("n_nationkey") \
        .reset_index(drop=True)


def nation_revenue_share_bp_sql() -> str:
    return """
WITH per AS (
  SELECT c.c_nationkey AS n_nationkey,
         CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT))
              AS BIGINT) AS revenue_cents
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY c.c_nationkey),
j AS (
  SELECT per.n_nationkey, n.n_regionkey, per.revenue_cents,
         sum(per.revenue_cents) OVER (PARTITION BY n.n_regionkey)
           AS reg_tot
  FROM per JOIN nation n ON n.n_nationkey = per.n_nationkey)
SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey,
       CAST(n_regionkey AS BIGINT) AS r_regionkey,
       revenue_cents,
       CAST(revenue_cents * 10000 // reg_tot AS BIGINT) AS share_bp
FROM j"""
