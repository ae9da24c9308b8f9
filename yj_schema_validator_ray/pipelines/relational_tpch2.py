"""Relational waves 8-14: TPC-H star joins, outer joins, shares — split from ``pipelines/relational.py`` along its wave
boundaries (round-5 maintenance split; no behavior change).  The
``relational`` module re-exports everything, so the import surface —
``from ..pipelines import relational as R`` — is unchanged.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational_events import customer_order_totals  # noqa: F401

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

