"""TPC-H canon extension wave: the join-heavy query shapes the round-3
relational family did not yet cover — cross-nation volume (Q7), market
share (Q8), max-subquery top supplier (Q15), correlated-average filter
(Q17), OR-of-predicate-branches join (Q19), the EXISTS/NOT-EXISTS
double-correlated shape (Q21) and scalar-subquery + anti-join (Q22).

Adaptations to this corpus (documented per query): no ``partsupp``
table — Q2/Q11/Q20 run over the lineitem-derived offer relation
(min extendedprice-cents per (partkey, suppkey), :func:`_offer_min_cost`)
which preserves their correlated-subquery structures, and Q9/Q16 are
adapted by substituting part attributes for the partsupp columns (Q9's
``ps_supplycost`` -> ``p_retailprice`` as the unit-cost proxy; Q16's
supplier-exclusion subquery keyed on ``s_acctbal < 0`` instead of the
comment pattern) with the ORIGINAL join/aggregate structure intact —
and no ``l_shipmode`` /
``l_commitdate`` / ``c_phone`` columns — each query substitutes a column
of the same shape and keeps the ORIGINAL join/subquery structure, which
is what the engine is exercising.

Money convention (CLAUDE.md): all sums in exact integer cents / e4
fixed-point (price-cents x (100 - discount-cents)) so Ray and DuckDB
hash bit-identically.  Scale shapes: dimension attaches go through
:func:`~..stages.dimjoin.attach_dim_adaptive` (broadcast under a byte
budget, coarse-hash co-location above — customer/supplier/part all
scale with the corpus); the only unconditional large-large exchanges
are order-key joins of pre-aggregated order-grain partials.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())


def _rev_e4(t: pa.Table) -> pa.Array:
    """extendedprice * (1 - discount) in exact e4 fixed point."""
    return pc.multiply(
        _cents(t.column("l_extendedprice")),
        pc.subtract(pa.scalar(100, pa.int64()),
                    _cents(t.column("l_discount"))))


def _nation_names(sf_dir: str) -> dict[int, str]:
    # nation/region are genuinely dimension-scale (25/5 rows at ANY
    # corpus size): a direct parquet read is milliseconds, where a
    # driver-side Ray Dataset execution costs ~1 s of fixed overhead
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"])
    return dict(zip(t.column("n_nationkey").to_pylist(),
                    t.column("n_name").to_pylist()))


def _nations_of_region(sf_dir: str, region: str) -> list[int]:
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_regionkey"])
    region_t = pq.read_table(f"{sf_dir}/region.parquet",
                             columns=["r_regionkey", "r_name"])
    rkeys = {k for k, nm in zip(region_t.column("r_regionkey").to_pylist(),
                                region_t.column("r_name").to_pylist())
             if nm == region}
    return sorted(k for k, rk in zip(nation.column("n_nationkey").to_pylist(),
                                     nation.column("n_regionkey").to_pylist())
                  if rk in rkeys)


def q7_volume_shipping(sf_dir: str, nation_a: int = 1, nation_b: int = 2,
                       start: str = "1996-01-01", end: str = "1998-01-01"):
    """TPC-H Q7-shaped cross-nation volume: revenue shipped between two
    nations per (supplier nation, customer nation, ship year) — the
    two-sided dimension-gate join (both the supplier AND the customer
    side must land in the nation pair, and the pair must CROSS).

    Plan: supplier/customer nationkeys attach size-adaptively to their
    fact side (INNER, so out-of-pair rows die at the gate); lineitem
    reduces to (orderkey, supp-nation, year) revenue partials BEFORE
    the one unconditional exchange — the order-key join against the
    (orderkey, cust-nation) order partials; nation NAMES (25-row
    domain) map inline after the final nation-pair-domain reduce.
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive, colocate_join
    from ..util import collect_small_arrow

    lo, hi = pd.Timestamp(start), pd.Timestamp(end)
    pair = pa.array(sorted({nation_a, nation_b}), pa.int64())
    names = _nation_names(sf_dir)

    def nation_gate(key_col, nk_col):
        def f(t: pa.Table) -> pa.Table:
            keep = pc.is_in(pc.cast(t.column(nk_col), pa.int64()),
                            value_set=pair)
            sel = t.filter(keep)
            return pa.table({key_col: pc.cast(sel.column(key_col),
                                              pa.int64()),
                             nk_col: pc.cast(sel.column(nk_col),
                                             pa.int64())})
        return f

    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
        .map_batches(nation_gate("s_suppkey", "s_nationkey"),
                     batch_format="pyarrow"))
    cust_dim = (ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        .map_batches(nation_gate("c_custkey", "c_nationkey"),
                     batch_format="pyarrow"))

    orders = attach_dim_adaptive(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_orderkey", "o_custkey"]),
        "o_custkey", cust_dim, "c_custkey", ["c_nationkey"], how="inner",
    ).map_batches(lambda t: t.select(["o_orderkey", "c_nationkey"]),
                  batch_format="pyarrow")

    def li_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        tt = pa.table({"l_orderkey": pc.cast(t.column("l_orderkey"),
                                             pa.int64()),
                       "l_suppkey": pc.cast(t.column("l_suppkey"),
                                            pa.int64()),
                       "l_year": pc.strftime(t.column("l_shipdate"),
                                             format="%Y"),
                       "revenue_e4": _rev_e4(t)})
        return (tt.group_by(["l_orderkey", "l_suppkey", "l_year"])
                .aggregate([("revenue_e4", "sum")])
                .rename_columns(["l_orderkey", "l_suppkey", "l_year",
                                 "revenue_e4"]))

    def li_project(t: pa.Table) -> pa.Table:
        tt = pa.table({"l_orderkey": t.column("l_orderkey"),
                       "s_nationkey": pc.cast(t.column("s_nationkey"),
                                              pa.int64()),
                       "l_year": t.column("l_year"),
                       "revenue_e4": t.column("revenue_e4")})
        return (tt.group_by(["l_orderkey", "s_nationkey", "l_year"])
                .aggregate([("revenue_e4", "sum")])
                .rename_columns(["l_orderkey", "s_nationkey", "l_year",
                                 "revenue_e4"]))

    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate",
                     "l_extendedprice", "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow"),
        "l_suppkey", supp_dim, "s_suppkey", ["s_nationkey"], how="inner",
    ).map_batches(li_project, batch_format="pyarrow")

    joined = colocate_join(
        li, orders, "l_orderkey", "o_orderkey",
        schemas=(pa.schema([("l_orderkey", pa.int64()),
                            ("s_nationkey", pa.int64()),
                            ("l_year", pa.string()),
                            ("revenue_e4", pa.int64())]),
                 pa.schema([("o_orderkey", pa.int64()),
                            ("c_nationkey", pa.int64())])))

    def cross_pair_partial(t: pa.Table) -> pa.Table:
        # filter to CROSSING pairs + local pair-domain pre-aggregate:
        # each block emits <= |pairs| x |years| rows, so the reduce
        # needs no exchange at all — partials collect driver-side
        t = t.filter(pc.not_equal(t.column("s_nationkey"),
                                  t.column("c_nationkey")))
        tt = pa.table({"s_nationkey": t.column("s_nationkey"),
                       "c_nationkey": t.column("c_nationkey"),
                       "l_year": t.column("l_year"),
                       "revenue_e4": t.column("revenue_e4")})
        return (tt.group_by(["s_nationkey", "c_nationkey", "l_year"])
                .aggregate([("revenue_e4", "sum")])
                .rename_columns(["s_nationkey", "c_nationkey", "l_year",
                                 "revenue_e4"]))

    # nation-pair x year domain (<= 25 x 25 x years rows at ANY corpus
    # scale): merge the per-block partials driver-side — the standard
    # post-scan domain-sized tail (the zero-match case must still
    # present the typed 4-column schema)
    partials = collect_small_arrow(
        joined.map_batches(cross_pair_partial,
                           batch_format="pyarrow")).to_pandas()
    if partials.empty:
        return pd.DataFrame({"supp_nation": pd.Series(dtype="string"),
                             "cust_nation": pd.Series(dtype="string"),
                             "l_year": pd.Series(dtype="string"),
                             "revenue_e4": pd.Series(dtype="int64")})
    out = (partials.groupby(["s_nationkey", "c_nationkey", "l_year"],
                            as_index=False)["revenue_e4"].sum())
    out["supp_nation"] = out["s_nationkey"].map(names).astype("string")
    out["cust_nation"] = out["c_nationkey"].map(names).astype("string")
    out["revenue_e4"] = out["revenue_e4"].astype("int64")
    return (out[["supp_nation", "cust_nation", "l_year", "revenue_e4"]]
            .sort_values(["supp_nation", "cust_nation", "l_year"])
            .reset_index(drop=True))


def q7_sql(nation_a: int = 1, nation_b: int = 2,
           start: str = "1996-01-01", end: str = "1998-01-01") -> str:
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       strftime(l.l_shipdate, '%Y') AS l_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
            AS BIGINT) AS revenue_e4
FROM lineitem l
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
WHERE l.l_shipdate >= TIMESTAMP '{start}'
  AND l.l_shipdate < TIMESTAMP '{end}'
  AND ((s.s_nationkey = {nation_a} AND c.c_nationkey = {nation_b})
    OR (s.s_nationkey = {nation_b} AND c.c_nationkey = {nation_a}))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year"""


def q8_market_share(sf_dir: str, region: str = "ASIA",
                    share_nation: int = 2, ptype: str = "PROMO",
                    start: str = "1996-01-01", end: str = "1998-01-01"):
    """TPC-H Q8-shaped market share: of the revenue a region's
    customers spent on one part type per order year, how much came
    from one nation's suppliers.  Q8 proper divides the two sums; the
    ratio is emitted as its exact integer numerator + denominator
    (``nation_rev_e4`` / ``total_rev_e4``) so the hash comparison
    stays bit-exact — fp division would depend on summation order.

    Plan: part-type gate and supplier nation attach size-adaptively on
    the lineitem side, which then reduces to per-order (nation, total)
    revenue partials; the order side gates o_orderdate + the customer
    region; one order-key join, then a year-domain reduce.
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive, colocate_join
    from ..util import collect_small_arrow

    lo, hi = pd.Timestamp(start), pd.Timestamp(end)
    in_region = pa.array(_nations_of_region(sf_dir, region), pa.int64())

    def part_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t.column("p_type"), pa.scalar(ptype)))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_hit": pa.array(np.ones(s.num_rows, np.int64))})

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        .map_batches(part_gate, batch_format="pyarrow"))
    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow"))

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table({"l_orderkey": pc.cast(t.column("l_orderkey"),
                                               pa.int64()),
                         "l_partkey": pc.cast(t.column("l_partkey"),
                                              pa.int64()),
                         "l_suppkey": pc.cast(t.column("l_suppkey"),
                                              pa.int64()),
                         "revenue_e4": _rev_e4(t)})

    li = attach_dim_adaptive(
        attach_dim_adaptive(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_orderkey", "l_partkey", "l_suppkey",
                         "l_extendedprice", "l_discount"])
            .map_batches(li_prep, batch_format="pyarrow"),
            "l_partkey", part_dim, "p_partkey", ["p_hit"], how="inner"),
        "l_suppkey", supp_dim, "s_suppkey", ["s_nationkey"], how="inner")

    def li_partial(t: pa.Table) -> pa.Table:
        nat = pc.cast(pc.equal(t.column("s_nationkey"),
                               pa.scalar(share_nation, pa.int64())),
                      pa.int64())
        tt = pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "nation_rev_e4": pc.multiply(t.column("revenue_e4"), nat),
            "total_rev_e4": t.column("revenue_e4")})
        return (tt.group_by(["l_orderkey"])
                .aggregate([("nation_rev_e4", "sum"),
                            ("total_rev_e4", "sum")])
                .rename_columns(["l_orderkey", "nation_rev_e4",
                                 "total_rev_e4"]))

    li = li.map_batches(li_partial, batch_format="pyarrow")

    def cust_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.is_in(pc.cast(t.column("c_nationkey"), pa.int64()),
                              value_set=in_region))
        return pa.table({
            "c_custkey": pc.cast(s.column("c_custkey"), pa.int64()),
            "c_hit": pa.array(np.ones(s.num_rows, np.int64))})

    cust_dim = (ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
        .map_batches(cust_gate, batch_format="pyarrow"))

    def ord_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("o_orderdate"),
                                     pa.scalar(lo)),
                    pc.less(t.column("o_orderdate"), pa.scalar(hi)))
        t = t.filter(m)
        return pa.table({"o_orderkey": pc.cast(t.column("o_orderkey"),
                                               pa.int64()),
                         "o_custkey": pc.cast(t.column("o_custkey"),
                                              pa.int64()),
                         "o_year": pc.strftime(t.column("o_orderdate"),
                                               format="%Y")})

    orders = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(ord_prep, batch_format="pyarrow"),
        "o_custkey", cust_dim, "c_custkey", ["c_hit"], how="inner",
    ).map_batches(lambda t: t.select(["o_orderkey", "o_year"]),
                  batch_format="pyarrow")

    joined = colocate_join(
        li, orders, "l_orderkey", "o_orderkey",
        schemas=(pa.schema([("l_orderkey", pa.int64()),
                            ("nation_rev_e4", pa.int64()),
                            ("total_rev_e4", pa.int64())]),
                 pa.schema([("o_orderkey", pa.int64()),
                            ("o_year", pa.string())])))

    def year_partial(t: pa.Table) -> pa.Table:
        # local year-domain pre-aggregate per block: the final reduce
        # merges <= |years| rows per block driver-side (no exchange)
        return (t.select(["o_year", "nation_rev_e4", "total_rev_e4"])
                .group_by(["o_year"])
                .aggregate([("nation_rev_e4", "sum"),
                            ("total_rev_e4", "sum")])
                .rename_columns(["o_year", "nation_rev_e4",
                                 "total_rev_e4"]))

    partials = collect_small_arrow(
        joined.map_batches(year_partial,
                           batch_format="pyarrow")).to_pandas()
    if partials.empty:
        return pd.DataFrame({"o_year": pd.Series(dtype="string"),
                             "nation_rev_e4": pd.Series(dtype="int64"),
                             "total_rev_e4": pd.Series(dtype="int64")})
    out = (partials.groupby("o_year", as_index=False)
           [["nation_rev_e4", "total_rev_e4"]].sum())
    out["nation_rev_e4"] = out["nation_rev_e4"].astype("int64")
    out["total_rev_e4"] = out["total_rev_e4"].astype("int64")
    return out.sort_values("o_year").reset_index(drop=True)


def q8_sql(region: str = "ASIA", share_nation: int = 2,
           ptype: str = "PROMO", start: str = "1996-01-01",
           end: str = "1998-01-01") -> str:
    return f"""
SELECT strftime(o.o_orderdate, '%Y') AS o_year,
       CAST(sum(CASE WHEN s.s_nationkey = {share_nation}
                THEN CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                     * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
                ELSE 0 END) AS BIGINT) AS nation_rev_e4,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT)))
            AS BIGINT) AS total_rev_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = '{ptype}'
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = '{region}'
WHERE o.o_orderdate >= TIMESTAMP '{start}'
  AND o.o_orderdate < TIMESTAMP '{end}'
GROUP BY o_year
ORDER BY o_year"""


def q15_top_supplier(sf_dir: str, start: str = "1996-01-01"):
    """TPC-H Q15-shaped top supplier: the supplier(s) whose quarterly
    revenue equals the GLOBAL maximum — the max-scalar-subquery shape
    (the filter needs an aggregate over the whole reduced relation).

    Plan: lineitem reduces to per-supplier revenue
    (:func:`~..stages.exact_agg.grouped_aggregate` — supplier-domain
    output), ``Dataset.max`` extracts the one scalar (never the
    relation) driver-side, a stateless filter keeps the argmax row(s),
    and s_name attaches size-adaptively.  Ties are kept, exactly as
    the SQL ``WHERE total = (SELECT max(...))`` keeps them.
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate

    lo = pd.Timestamp(start)
    hi = lo + pd.DateOffset(months=3)

    def li_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        tt = pa.table({"l_suppkey": pc.cast(t.column("l_suppkey"),
                                            pa.int64()),
                       "total_revenue_e4": _rev_e4(t)})
        return (tt.group_by(["l_suppkey"])
                .aggregate([("total_revenue_e4", "sum")])
                .rename_columns(["l_suppkey", "total_revenue_e4"]))

    per_supp = grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_shipdate", "l_extendedprice",
                     "l_discount"])
        .map_batches(li_prep, batch_format="pyarrow"),
        ["l_suppkey"], [("total_revenue_e4", "sum", "total_revenue_e4")])
    per_supp = per_supp.materialize()  # consumed twice: max + filter
    best = per_supp.max("total_revenue_e4")

    winners = per_supp.map_batches(
        lambda t: t.filter(pc.equal(t.column("total_revenue_e4"),
                                    pa.scalar(best, pa.int64()))),
        batch_format="pyarrow")

    supp_dim = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                     columns=["s_suppkey", "s_name"])
    out = attach_dim_adaptive(winners, "l_suppkey", supp_dim, "s_suppkey",
                              ["s_name"], how="inner")
    return out.map_batches(
        lambda t: pa.table({"s_suppkey": t.column("l_suppkey"),
                            "s_name": t.column("s_name"),
                            "total_revenue_e4":
                                t.column("total_revenue_e4")}),
        batch_format="pyarrow").sort("s_suppkey")


def q15_sql(start: str = "1996-01-01") -> str:
    hi = (pd.Timestamp(start) + pd.DateOffset(months=3)).strftime("%Y-%m-%d")
    return f"""
WITH revenue AS (
  SELECT l_suppkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100.0) AS BIGINT)))
              AS BIGINT) AS total_revenue_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{start}'
    AND l_shipdate < TIMESTAMP '{hi}'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, r.total_revenue_e4
FROM revenue r JOIN supplier s ON s.s_suppkey = r.l_suppkey
WHERE r.total_revenue_e4 = (SELECT max(total_revenue_e4) FROM revenue)
ORDER BY s.s_suppkey"""


def q17_small_quantity_revenue(sf_dir: str, brand: str = "Brand#1",
                               max_size: int = 10):
    """TPC-H Q17-shaped small-quantity revenue: total price of line
    items whose quantity is under 20% of the part's own average
    quantity — the correlated-average filter (each row compares
    against an aggregate of its OWN group, so the relation must meet
    itself part-keyed).

    The fractional comparison is exact: with quantities in
    centi-units, ``q < 0.2 * avg``  <=>  ``5 * q_c * n < sum_q_c``
    (integers only — no fp divide on either engine).  Plan: the part
    gate attaches size-adaptively, then ONE part-keyed coarse exchange
    co-locates each part's rows; avg + filter + sum run vectorized per
    coarse bucket and only bucket-domain partials reach the final
    two-cell reduce.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dedup import coarse_mix
    from ..stages.dimjoin import attach_dim_adaptive
    from ..util import shuffle_partitions

    coarse = 1024

    def part_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.and_(
            pc.equal(t.column("p_brand"), pa.scalar(brand)),
            pc.less_equal(t.column("p_size"), pa.scalar(max_size))))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_hit": pa.array(np.ones(s.num_rows, np.int64))})

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"])
        .map_batches(part_gate, batch_format="pyarrow"))

    def li_prep(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_partkey"), pa.int64())
        return pa.table({
            "l_partkey": keys,
            "qty_c": _cents(t.column("l_quantity")),
            "price_c": _cents(t.column("l_extendedprice")),
        })

    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])
        .map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey", part_dim, "p_partkey", ["p_hit"], how="inner")

    def add_coarse(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_partkey"), pa.int64()).to_numpy()
        return pa.table({
            "l_partkey": t.column("l_partkey"),
            "qty_c": t.column("qty_c"),
            "price_c": t.column("price_c"),
            "__coarse": pa.array(coarse_mix(keys, coarse - 1), pa.int64()),
        })

    def bucket_partial(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({
                "total_price_cents": pd.Series(dtype="int64"),
                "n_items": pd.Series(dtype="int64")})
        agg = (g.groupby("l_partkey", sort=False)["qty_c"]
               .agg(n="count", s="sum"))
        g = g.join(agg, on="l_partkey")
        mask = 5 * g["qty_c"] * g["n"] < g["s"]
        return pd.DataFrame({
            "total_price_cents": [int(g.loc[mask, "price_c"].sum())],
            "n_items": [int(mask.sum())]})

    parts = (li.map_batches(add_coarse, batch_format="pyarrow")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(bucket_partial, batch_format="pandas"))
    agg = parts.aggregate(Sum("total_price_cents",
                              alias_name="total_price_cents"),
                          Sum("n_items", alias_name="n_items"))
    return pd.DataFrame({
        "total_price_cents": [int(agg["total_price_cents"] or 0)],
        "n_items": [int(agg["n_items"] or 0)]})


def q17_sql(brand: str = "Brand#1", max_size: int = 10) -> str:
    return f"""
WITH li AS (
  SELECT l.l_partkey,
         CAST(round(l.l_quantity * 100.0) AS BIGINT) AS qty_c,
         CAST(round(l.l_extendedprice * 100.0) AS BIGINT) AS price_c
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_brand = '{brand}' AND p.p_size <= {max_size}),
ag AS (
  SELECT l_partkey, count(*) AS n, CAST(sum(qty_c) AS BIGINT) AS s
  FROM li GROUP BY l_partkey)
SELECT CAST(coalesce(sum(li.price_c), 0) AS BIGINT) AS total_price_cents,
       CAST(count(*) AS BIGINT) AS n_items
FROM li JOIN ag ON ag.l_partkey = li.l_partkey
WHERE 5 * li.qty_c * ag.n < ag.s"""


#: (brand, max size, qty lo, qty hi) — Q19's three OR branches
Q19_BRANCHES = (("Brand#1", 5, 1, 11), ("Brand#2", 10, 10, 20),
                ("Brand#3", 15, 20, 30))


def q19_discounted_revenue(sf_dir: str):
    """TPC-H Q19-shaped discounted revenue: an OR of three
    (brand, size-range, quantity-range) predicate branches over the
    lineitem x part join, reduced to one revenue row.  The join exists
    only to see part attributes — so the part gate ships its brand +
    size columns size-adaptively onto the fact side and the OR
    evaluates as three vectorized masks; no row ever leaves its block.
    Quantity bounds compare in exact centi-units on both engines.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dimjoin import attach_dim_adaptive

    brands = pa.array(sorted({b for b, _, _, _ in Q19_BRANCHES}))

    def part_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.is_in(t.column("p_brand"), value_set=brands))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_brand": s.column("p_brand"),
            "p_size": pc.cast(s.column("p_size"), pa.int64())})

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"])
        .map_batches(part_gate, batch_format="pyarrow"))

    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice",
                     "l_discount"])
        .map_batches(lambda t: pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "qty_c": _cents(t.column("l_quantity")),
            "revenue_e4": _rev_e4(t)}), batch_format="pyarrow"),
        "l_partkey", part_dim, "p_partkey", ["p_brand", "p_size"],
        how="inner")

    def partial(t: pa.Table) -> pa.Table:
        mask = None
        for b, sz, qlo, qhi in Q19_BRANCHES:
            m = pc.and_(
                pc.and_(pc.equal(t.column("p_brand"), pa.scalar(b)),
                        pc.less_equal(t.column("p_size"),
                                      pa.scalar(sz, pa.int64()))),
                pc.and_(pc.greater_equal(t.column("qty_c"),
                                         pa.scalar(qlo * 100, pa.int64())),
                        pc.less_equal(t.column("qty_c"),
                                      pa.scalar(qhi * 100, pa.int64()))))
            mask = m if mask is None else pc.or_(mask, m)
        t = t.filter(mask)
        return pa.table({
            "revenue_e4": pa.array(
                [pc.sum(t.column("revenue_e4")).as_py() or 0], pa.int64()),
            "n_items": pa.array([t.num_rows], pa.int64())})

    agg = (li.map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("revenue_e4", alias_name="revenue_e4"),
                      Sum("n_items", alias_name="n_items")))
    return pd.DataFrame({"revenue_e4": [int(agg["revenue_e4"] or 0)],
                         "n_items": [int(agg["n_items"] or 0)]})


def q19_sql() -> str:
    branch = " OR ".join(
        f"(p.p_brand = '{b}' AND p.p_size <= {sz} "
        f"AND CAST(round(l.l_quantity * 100.0) AS BIGINT) "
        f"BETWEEN {qlo * 100} AND {qhi * 100})"
        for b, sz, qlo, qhi in Q19_BRANCHES)
    return f"""
SELECT CAST(coalesce(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))), 0)
            AS BIGINT) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE {branch}"""


def q21_waiting_suppliers(sf_dir: str, k: int = 100):
    """TPC-H Q21-shaped sole-fault supplier count: on finalized
    multi-supplier orders, count per supplier the orders where THAT
    supplier was the only one with a returned line — the
    EXISTS / NOT-EXISTS double-correlated-subquery shape (this corpus
    has no l_commitdate/l_receiptdate, so 'late' is played by
    l_returnflag = 'R'; the correlation structure is Q21's).

    Plan: lineitem reduces per batch to (order, supplier,
    any-returned) partials; the status-F order gate attaches
    size-adaptively; ONE order-keyed coarse exchange co-locates each
    order's supplier set, where both correlated predicates evaluate
    vectorized (n_supp >= 2, n_returned_suppliers == 1); survivors are
    supplier-keyed counts.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    coarse = 1024

    def li_prep(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "ret": pc.cast(pc.equal(t.column("l_returnflag"),
                                    pa.scalar("R")), pa.int64())})
        return (tt.group_by(["l_orderkey", "l_suppkey"])
                .aggregate([("ret", "max")])
                .rename_columns(["l_orderkey", "l_suppkey", "ret"]))

    def order_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(t.column("o_orderstatus"), pa.scalar("F")))
        return pa.table({
            "o_orderkey": pc.cast(s.column("o_orderkey"), pa.int64()),
            "o_hit": pa.array(np.ones(s.num_rows, np.int64))})

    orders_f = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus"])
        .map_batches(order_gate, batch_format="pyarrow"))

    # per-(order, supplier) partials may be split across batches: the
    # coarse exchange groups by order key, so the per-order pandas
    # merge below re-reduces duplicates before the correlated checks
    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_returnflag"])
        .map_batches(li_prep, batch_format="pyarrow"),
        "l_orderkey", orders_f, "o_orderkey", ["o_hit"], how="inner")

    def add_coarse(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_orderkey"), pa.int64()).to_numpy()
        return pa.table({
            "l_orderkey": t.column("l_orderkey"),
            "l_suppkey": t.column("l_suppkey"),
            "ret": t.column("ret"),
            "__coarse": pa.array(coarse_mix(keys, coarse - 1), pa.int64()),
        })

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"l_suppkey": pd.Series(dtype="int64")})
        g = (g.groupby(["l_orderkey", "l_suppkey"], sort=False)["ret"]
             .max().reset_index())
        agg = (g.groupby("l_orderkey", sort=False)["ret"]
               .agg(n_supp="count", n_ret="sum"))
        g = g.join(agg, on="l_orderkey")
        q = g[(g["ret"] == 1) & (g["n_supp"] >= 2) & (g["n_ret"] == 1)]
        return q[["l_suppkey"]].astype("int64")

    waiting = (li.map_batches(add_coarse, batch_format="pyarrow")
               .groupby("__coarse", num_partitions=shuffle_partitions())
               .map_groups(per_order, batch_format="pandas"))
    counts = grouped_aggregate(waiting, ["l_suppkey"],
                               [("", "count", "numwait")])

    supp_dim = ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                                     columns=["s_suppkey", "s_name"])
    named = attach_dim_adaptive(counts, "l_suppkey", supp_dim, "s_suppkey",
                                ["s_name"], how="inner")
    return (named.map_batches(
        lambda t: t.select(["s_name", "numwait"]), batch_format="pyarrow")
        .sort(["numwait", "s_name"], descending=[True, False])
        .limit(k))


def q21_sql(k: int = 100) -> str:
    return f"""
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         max(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS ret
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
               AND o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey),
ag AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(ret) AS n_ret
  FROM ls GROUP BY l_orderkey)
SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
FROM ls
JOIN ag ON ag.l_orderkey = ls.l_orderkey
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.ret = 1 AND ag.n_supp >= 2 AND ag.n_ret = 1
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT {k}"""


#: Q22's seven "country code" nations, played by nationkeys
Q22_NATIONS = (0, 3, 7, 11, 14, 17, 21)


def q22_global_sales_opportunity(sf_dir: str,
                                 nations: tuple[int, ...] = Q22_NATIONS,
                                 cutoff: str = "2000-01-01"):
    """TPC-H Q22-shaped sales opportunity: customers from seven
    nations with above-average positive balances and NO RECENT orders
    — scalar subquery (global average) + anti-join (c_phone country
    codes are played by nationkeys, and because every customer in this
    corpus has at least one lifetime order, "no orders" is played by
    "no orders on/after ``cutoff``" — the anti-join target is the
    date-filtered orders scan; the subquery/anti-join structure is
    Q22's).

    Exactness: ``c_acctbal > avg(positive balances)`` compares as
    ``c_cents * n_pos > sum_pos_cents`` — integers on both engines.
    Plan: the average's (n, sum) reduce to two driver scalars (legal:
    scalars, never the relation); the anti-join attaches the distinct
    recent-order-custkey set size-adaptively (LEFT) and keeps the
    misses; the final reduce is nation-domain-sized (<= 25 rows), so
    it collects driver-side into a typed frame — the zero-survivor
    case must still present the three-column schema.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    nat_set = pa.array(sorted(nations), pa.int64())

    def cust_prep(t: pa.Table) -> pa.Table:
        keep = pc.is_in(pc.cast(t.column("c_nationkey"), pa.int64()),
                        value_set=nat_set)
        t = t.filter(keep)
        return pa.table({
            "c_custkey": pc.cast(t.column("c_custkey"), pa.int64()),
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "bal_c": _cents(t.column("c_acctbal"))})

    cust = (ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey", "c_acctbal"])
        .map_batches(cust_prep, batch_format="pyarrow")).materialize()

    def pos_partial(t: pa.Table) -> pa.Table:
        p = t.filter(pc.greater(t.column("bal_c"),
                                pa.scalar(0, pa.int64())))
        return pa.table({
            "n_pos": pa.array([p.num_rows], pa.int64()),
            "sum_pos": pa.array([pc.sum(p.column("bal_c")).as_py() or 0],
                                pa.int64())})

    agg = (cust.map_batches(pos_partial, batch_format="pyarrow")
           .aggregate(Sum("n_pos", alias_name="n_pos"),
                      Sum("sum_pos", alias_name="sum_pos")))
    n_pos, sum_pos = int(agg["n_pos"] or 0), int(agg["sum_pos"] or 0)
    if n_pos == 0:  # avg of empty set is NULL -> SQL keeps no rows
        return pd.DataFrame({"c_nationkey": pd.Series(dtype="int64"),
                             "numcust": pd.Series(dtype="int64"),
                             "totacctbal_cents": pd.Series(dtype="int64")})

    rich = cust.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t.column("bal_c"), pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_pos, pa.int64()))),
        batch_format="pyarrow")

    # distinct RECENT-order custkeys (unique dim contract) for the
    # anti-join; the date gate prunes before the distinct exchange
    cut = pd.Timestamp(cutoff)

    def recent(t: pa.Table) -> pa.Table:
        s = t.filter(pc.greater_equal(t.column("o_orderdate"),
                                      pa.scalar(cut)))
        return pa.table({"o_custkey": pc.cast(s.column("o_custkey"),
                                              pa.int64())})

    has_orders = grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_custkey", "o_orderdate"])
        .map_batches(recent, batch_format="pyarrow"),
        ["o_custkey"], [("", "count", "n_orders")])

    attached = attach_dim_adaptive(rich, "c_custkey", has_orders,
                                   "o_custkey", ["n_orders"], how="left")

    def keep_orderless(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_null(t.column("n_orders")))
        return pa.table({"c_nationkey": t.column("c_nationkey"),
                         "numcust": pa.array(np.ones(t.num_rows, np.int64)),
                         "totacctbal_cents": t.column("bal_c")})

    out = collect_small_arrow(grouped_aggregate(
        attached.map_batches(keep_orderless, batch_format="pyarrow"),
        ["c_nationkey"],
        [("numcust", "sum", "numcust"),
         ("totacctbal_cents", "sum", "totacctbal_cents")])).to_pandas()
    if out.empty:
        out = pd.DataFrame({"c_nationkey": pd.Series(dtype="int64"),
                            "numcust": pd.Series(dtype="int64"),
                            "totacctbal_cents": pd.Series(dtype="int64")})
    return (out[["c_nationkey", "numcust", "totacctbal_cents"]]
            .sort_values("c_nationkey").reset_index(drop=True))


def q22_sql(nations: tuple[int, ...] = Q22_NATIONS,
            cutoff: str = "2000-01-01") -> str:
    nat = ", ".join(str(n) for n in sorted(nations))
    return f"""
WITH pos AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS s
  FROM customer
  WHERE c_nationkey IN ({nat})
    AND CAST(round(c_acctbal * 100.0) AS BIGINT) > 0)
SELECT c.c_nationkey,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c.c_acctbal * 100.0) AS BIGINT)) AS BIGINT)
         AS totacctbal_cents
FROM customer c, pos
WHERE c.c_nationkey IN ({nat})
  AND CAST(round(c.c_acctbal * 100.0) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '{cutoff}')
GROUP BY c.c_nationkey
ORDER BY c.c_nationkey"""


def q9_product_profit(sf_dir: str, name_word: str = "widget"):
    """TPC-H Q9-shaped product-type profit by nation and year.  No
    ``partsupp`` in this corpus, so the supply-cost term substitutes the
    part's own ``p_retailprice`` as the unit cost (Q9 proper uses
    ``ps_supplycost``); the join/aggregate STRUCTURE — part-name gate,
    part + supplier + nation attach, profit expression per (nation,
    ship year) — is Q9's.  Profit in exact e4 fixed point:
    ``price_c*(100-disc_c) - retail_c*qty*100``.

    Plan: the part gate and the supplier-nation lookup attach
    size-adaptively onto the lineitem scan (both dims scale with the
    corpus); the scan reduces per batch to (nationkey, year) partials —
    a 25 x |years| domain — and one driver-side merge finishes (nation
    names are dimension-scale and map driver-side, like Q7/Q8).
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..util import collect_small_arrow

    names = _nation_names(sf_dir)

    def part_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.match_substring(t.column("p_name"), name_word))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_retail_c": _cents(s.column("p_retailprice"))})

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"])
        .map_batches(part_gate, batch_format="pyarrow"))
    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow"))

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "rev_e4": _rev_e4(t),
            "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64()),
            "o_year": pc.strftime(t.column("l_shipdate"), format="%Y")})

    li = attach_dim_adaptive(
        attach_dim_adaptive(
            ray.data.read_parquet(
                f"{sf_dir}/lineitem.parquet",
                columns=["l_partkey", "l_suppkey", "l_quantity",
                         "l_extendedprice", "l_discount", "l_shipdate"])
            .map_batches(li_prep, batch_format="pyarrow"),
            "l_partkey", part_dim, "p_partkey", ["p_retail_c"],
            how="inner"),
        "l_suppkey", supp_dim, "s_suppkey", ["s_nationkey"], how="inner")

    def partial(t: pa.Table) -> pa.Table:
        cost_e4 = pc.multiply(
            pc.multiply(t.column("p_retail_c"), t.column("qty")),
            pa.scalar(100, pa.int64()))
        tt = pa.table({
            "s_nationkey": t.column("s_nationkey"),
            "o_year": t.column("o_year"),
            "profit_e4": pc.subtract(t.column("rev_e4"), cost_e4)})
        return (tt.group_by(["s_nationkey", "o_year"])
                .aggregate([("profit_e4", "sum")])
                .rename_columns(["s_nationkey", "o_year", "profit_e4"]))

    partials = collect_small_arrow(
        li.map_batches(partial, batch_format="pyarrow")).to_pandas()
    if partials.empty:
        return pd.DataFrame({"nation": pd.Series(dtype="string"),
                             "o_year": pd.Series(dtype="string"),
                             "profit_e4": pd.Series(dtype="int64")})
    out = (partials.groupby(["s_nationkey", "o_year"], as_index=False)
           ["profit_e4"].sum())
    out["nation"] = out["s_nationkey"].map(names)
    out["profit_e4"] = out["profit_e4"].astype("int64")
    return (out[["nation", "o_year", "profit_e4"]]
            .sort_values(["nation", "o_year"],
                         ascending=[True, False]).reset_index(drop=True))


def q9_sql(name_word: str = "widget") -> str:
    return f"""
SELECT n.n_name AS nation,
       strftime(l.l_shipdate, '%Y') AS o_year,
       CAST(sum(CAST(round(l.l_extendedprice * 100.0) AS BIGINT)
                * (100 - CAST(round(l.l_discount * 100.0) AS BIGINT))
                - CAST(round(p.p_retailprice * 100.0) AS BIGINT)
                  * CAST(round(l.l_quantity) AS BIGINT) * 100)
            AS BIGINT) AS profit_e4
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
           AND contains(p.p_name, '{name_word}')
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
GROUP BY nation, o_year
ORDER BY nation, o_year DESC"""


def q16_supplier_variety(sf_dir: str, excl_brand: str = "Brand#1"):
    """TPC-H Q16-shaped supplier variety: how many DISTINCT suppliers
    ship each (brand, type, size) part style, excluding one brand and
    excluding "complaint" suppliers — adapted to this corpus as the
    suppliers with a negative account balance (Q16 proper greps the
    comment text; same NOT-IN-subquery shape).

    Plan: the exclusion set is collected ONCE (negative-balance
    suppliers are a vanishing fraction of any realistic corpus — the
    bounded side of a broadcast anti-join, same discipline as
    ``constraints.ref_integrity``); lineitem reduces to distinct
    (partkey, suppkey) partials, the part attributes attach
    size-adaptively, and two keyed exact aggregates implement
    ``count(DISTINCT suppkey)`` without ever shipping a row twice.
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    bad_tbl = collect_small_arrow(
        ray.data.read_parquet(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_acctbal"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(
                t.filter(pc.less(t.column("s_acctbal"),
                                 pa.scalar(0.0))).column("s_suppkey"),
                pa.int64())}), batch_format="pyarrow"))
    bad = (bad_tbl.column("s_suppkey").combine_chunks()
           if bad_tbl.num_columns else pa.array([], pa.int64()))

    def part_gate(t: pa.Table) -> pa.Table:
        s = t.filter(pc.not_equal(t.column("p_brand"),
                                  pa.scalar(excl_brand)))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_brand": s.column("p_brand"),
            "p_type": s.column("p_type"),
            "p_size": pc.cast(s.column("p_size"), pa.int64())})

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"])
        .map_batches(part_gate, batch_format="pyarrow"))

    def li_prep(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64())})
        tt = tt.filter(pc.invert(pc.is_in(tt.column("l_suppkey"),
                                          value_set=bad)))
        return tt.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    li = attach_dim_adaptive(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey"])
        .map_batches(li_prep, batch_format="pyarrow"),
        "l_partkey", part_dim, "p_partkey",
        ["p_brand", "p_type", "p_size"], how="inner")

    distinct = grouped_aggregate(
        li, ["p_brand", "p_type", "p_size", "l_suppkey"],
        [("l_suppkey", "count", "n")])
    return grouped_aggregate(
        distinct, ["p_brand", "p_type", "p_size"],
        [("n", "count", "supplier_cnt")])


def q16_sql(excl_brand: str = "Brand#1") -> str:
    return f"""
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> '{excl_brand}'
  AND l.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size"""


# ---------------------------------------------------------------------------
# Q2 / Q11 / Q20 — the partsupp family, adapted over the lineitem-derived
# offer relation (closing the full 22-query TPC-H canon)
# ---------------------------------------------------------------------------

def _gate_dim(mask_fn):
    """Batch fn for a key-only dimension gate: keep ``p_partkey`` where
    ``mask_fn(batch)`` holds, plus a constant marker column so
    :func:`~..stages.dimjoin.attach_dim_adaptive` (inner) can act as a
    pure semi-join filter."""
    def f(t: pa.Table) -> pa.Table:
        s = t.filter(mask_fn(t))
        return pa.table({
            "p_partkey": pc.cast(s.column("p_partkey"), pa.int64()),
            "p_gate": pa.array(np.zeros(s.num_rows, np.int8()))})
    return f


def _offer_min_cost(sf_dir: str):
    """The corpus has no ``partsupp``; the offer relation is derived
    from lineitem as min(extendedprice-cents) per (partkey, suppkey) —
    "the cheapest observed offer" — which preserves every downstream
    correlated-subquery structure of the Q2/Q11/Q20 family.  Exact
    integer cents; per-batch pre-aggregation before the one keyed
    exchange (pair-domain output, far smaller than lineitem)."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    def li_prep(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "cost_cents": _cents(t.column("l_extendedprice"))})
        return (tt.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("cost_cents", "min")])
                .rename_columns(["l_partkey", "l_suppkey", "cost_cents"]))

    return grouped_aggregate(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_prep, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"], [("cost_cents", "min", "cost_cents")])


def q2_min_cost_supplier(sf_dir: str, region: str = "EUROPE",
                         p_type: str = "STANDARD", max_size: int = 25):
    """TPC-H Q2-shaped minimum-cost supplier: for each gated part
    (type + size), the region supplier(s) whose offer equals the
    per-part MINIMUM — the correlated-min-subquery shape.

    Plan: the offer relation reduces lineitem to pair-domain
    (:func:`_offer_min_cost`); supplier attributes attach
    size-adaptively and the region gate is a 25-entry nation-key
    ``is_in`` (nation/region are dimension-scale at ANY corpus size);
    the part gate attaches size-adaptively too (part scales with the
    corpus).  The per-part min is a second part-domain exact
    aggregate attached back to the gated pairs — the groupwise-min +
    equality-join-back plan; ties are kept exactly as SQL keeps them.
    """
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate

    eu = pa.array(_nations_of_region(sf_dir, region), pa.int64())
    nmap = _nation_names(sf_dir)

    offer = _offer_min_cost(sf_dir)

    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
            "s_name": t.column("s_name"),
            "s_acctbal_cents": _cents(t.column("s_acctbal")),
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow"))
    gated = attach_dim_adaptive(
        offer, "l_suppkey", supp_dim, "s_suppkey",
        ["s_name", "s_acctbal_cents", "s_nationkey"], how="inner")
    gated = gated.map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"), value_set=eu)),
        batch_format="pyarrow")

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_type", "p_size"])
        .map_batches(_gate_dim(lambda t: pc.and_(
            pc.equal(t.column("p_type"), pa.scalar(p_type)),
            pc.less_equal(t.column("p_size"),
                          pa.scalar(max_size, pa.int32())))),
            batch_format="pyarrow"))
    gated = attach_dim_adaptive(gated, "l_partkey", part_dim, "p_partkey",
                                ["p_gate"], how="inner")
    gated = gated.drop_columns(["p_gate"]).materialize()

    mins = grouped_aggregate(gated, ["l_partkey"],
                             [("cost_cents", "min", "min_cost")])
    withmin = attach_dim_adaptive(gated, "l_partkey", mins, "l_partkey",
                                  ["min_cost"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("cost_cents"),
                              t.column("min_cost")))
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "p_partkey": t.column("l_partkey"),
            "s_suppkey": t.column("l_suppkey"),
            "s_name": t.column("s_name"),
            "s_acctbal_cents": t.column("s_acctbal_cents"),
            "n_name": pa.array([nmap[int(k)] for k in nk], pa.string()),
            "cost_cents": t.column("cost_cents")})

    return withmin.map_batches(finish, batch_format="pyarrow")


def q2_sql(region: str = "EUROPE", p_type: str = "STANDARD",
           max_size: int = 25) -> str:
    return f"""
WITH eu AS (
  SELECT n_nationkey, n_name
  FROM nation JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{region}'),
offer AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(round(l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS cost_cents
  FROM lineitem GROUP BY l_partkey, l_suppkey),
gated AS (
  SELECT o.l_partkey, o.l_suppkey, o.cost_cents, s.s_name,
         CAST(round(s.s_acctbal * 100.0) AS BIGINT) AS s_acctbal_cents,
         e.n_name
  FROM offer o
  JOIN supplier s ON s.s_suppkey = o.l_suppkey
  JOIN eu e ON e.n_nationkey = s.s_nationkey
  JOIN part p ON p.p_partkey = o.l_partkey
  WHERE p.p_type = '{p_type}' AND p.p_size <= {max_size})
SELECT g.l_partkey AS p_partkey, g.l_suppkey AS s_suppkey, g.s_name,
       g.s_acctbal_cents, g.n_name, g.cost_cents
FROM gated g
WHERE g.cost_cents = (SELECT min(cost_cents) FROM gated g2
                      WHERE g2.l_partkey = g.l_partkey)"""


def q11_important_parts(sf_dir: str, region: str = "EUROPE",
                        denom: int = 1000):
    """TPC-H Q11-shaped important stock: per-part inventory value
    restricted to one region's suppliers, keeping parts whose value
    exceeds a fixed fraction of the GLOBAL total — the
    scalar-aggregate-in-HAVING shape.  The threshold is exact integer
    floor division (``total // denom``) so both engines derive the
    same gate bit-for-bit.

    Plan: per-batch (partkey, suppkey) partial sums, one size-adaptive
    supplier attach for the nation gate, one part-domain exact
    aggregate; the global total is ``Dataset.sum`` over the
    part-domain relation (ONE driver scalar, never the rows)."""
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate

    eu = pa.array(_nations_of_region(sf_dir, region), pa.int64())

    def li_prep(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "value_cents": _cents(t.column("l_extendedprice"))})
        return (tt.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("value_cents", "sum")])
                .rename_columns(["l_partkey", "l_suppkey", "value_cents"]))

    pairs = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"])
        .map_batches(li_prep, batch_format="pyarrow"))

    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow"))
    pairs = attach_dim_adaptive(pairs, "l_suppkey", supp_dim, "s_suppkey",
                                ["s_nationkey"], how="inner")
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.is_in(t.column("s_nationkey"), value_set=eu)),
        batch_format="pyarrow")

    v = grouped_aggregate(pairs, ["l_partkey"],
                          [("value_cents", "sum", "value_cents")])
    v = v.materialize()  # consumed twice: global sum + filter
    total = v.sum("value_cents") or 0
    thresh = int(total) // denom

    return v.map_batches(
        lambda t: pa.table({
            "p_partkey": t.column("l_partkey"),
            "value_cents": t.column("value_cents")}).filter(
                pc.greater(t.column("value_cents"),
                           pa.scalar(thresh, pa.int64()))),
        batch_format="pyarrow")


def q11_sql(region: str = "EUROPE", denom: int = 1000) -> str:
    return f"""
WITH eu AS (
  SELECT n_nationkey FROM nation JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = '{region}'),
v AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
              AS BIGINT) AS value_cents
  FROM lineitem JOIN supplier s ON s.s_suppkey = l_suppkey
  JOIN eu e ON e.n_nationkey = s.s_nationkey
  GROUP BY l_partkey)
SELECT l_partkey AS p_partkey, value_cents FROM v
WHERE value_cents > (SELECT CAST(sum(value_cents) // {denom} AS BIGINT)
                     FROM v)"""


def q20_dominant_suppliers(sf_dir: str, name_word: str = "widget",
                           year: int = 1997, region: str = "EUROPE"):
    """TPC-H Q20-shaped potential promotion: region suppliers who
    shipped MORE THAN HALF of a gated part's total volume in one year
    — the nested-aggregate-subquery + IN-subquery shape (Q20's
    ``ps_availqty > 0.5 * sum(l_quantity)`` dominance test, expressed
    over the lineitem-derived offer relation).

    Plan: year filter at the scan, part-name gate via a size-adaptive
    attach, ONE pair-domain exact aggregate, a part-domain total
    attached back (integer ``2*supp > total`` — no floats), then a
    supplier-domain distinct and the dimension-scale region gate."""
    import ray.data

    from ..stages.dimjoin import attach_dim_adaptive
    from ..stages.exact_agg import grouped_aggregate

    eu = pa.array(_nations_of_region(sf_dir, region), pa.int64())
    nmap = _nation_names(sf_dir)
    lo = pd.Timestamp(f"{year}-01-01")
    hi = pd.Timestamp(f"{year + 1}-01-01")

    def li_prep(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.greater_equal(t.column("l_shipdate"), pa.scalar(lo)),
                    pc.less(t.column("l_shipdate"), pa.scalar(hi)))
        t = t.filter(m)
        tt = pa.table({
            "l_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
            "qty": pc.cast(pc.round(t.column("l_quantity")), pa.int64())})
        return (tt.group_by(["l_partkey", "l_suppkey"])
                .aggregate([("qty", "sum")])
                .rename_columns(["l_partkey", "l_suppkey", "supp_qty"]))

    pairs0 = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
        .map_batches(li_prep, batch_format="pyarrow"))

    part_dim = (ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
        .map_batches(_gate_dim(
            lambda t: pc.match_substring(t.column("p_name"), name_word)),
            batch_format="pyarrow"))
    gated = attach_dim_adaptive(pairs0, "l_partkey", part_dim, "p_partkey",
                                ["p_gate"], how="inner").drop_columns(
                                    ["p_gate"])

    pair = grouped_aggregate(gated, ["l_partkey", "l_suppkey"],
                             [("supp_qty", "sum", "supp_qty")]).materialize()
    tot = grouped_aggregate(pair, ["l_partkey"],
                            [("supp_qty", "sum", "part_qty")])
    dom = attach_dim_adaptive(pair, "l_partkey", tot, "l_partkey",
                              ["part_qty"], how="inner")
    dom = dom.map_batches(
        lambda t: t.filter(pc.greater(
            pc.multiply(t.column("supp_qty"), pa.scalar(2, pa.int64())),
            t.column("part_qty"))).select(["l_suppkey"]),
        batch_format="pyarrow")
    supp_ids = grouped_aggregate(dom, ["l_suppkey"],
                                 [("l_suppkey", "count", "n")])

    supp_dim = (ray.data.read_parquet(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey"])
        .map_batches(lambda t: pa.table({
            "s_suppkey": pc.cast(t.column("s_suppkey"), pa.int64()),
            "s_name": t.column("s_name"),
            "s_nationkey": pc.cast(t.column("s_nationkey"), pa.int64())}),
            batch_format="pyarrow"))
    out = attach_dim_adaptive(supp_ids, "l_suppkey", supp_dim, "s_suppkey",
                              ["s_name", "s_nationkey"], how="inner")

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t.column("s_nationkey"), value_set=eu))
        nk = t.column("s_nationkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "s_suppkey": t.column("l_suppkey"),
            "s_name": t.column("s_name"),
            "n_name": pa.array([nmap[int(k)] for k in nk], pa.string())})

    return out.map_batches(finish, batch_format="pyarrow")


def q20_sql(name_word: str = "widget", year: int = 1997,
            region: str = "EUROPE") -> str:
    return f"""
WITH gated AS (
  SELECT l_partkey, l_suppkey, CAST(round(l_quantity) AS BIGINT) AS qty
  FROM lineitem JOIN part p ON p.p_partkey = l_partkey
  WHERE p.p_name LIKE '%{name_word}%'
    AND l_shipdate >= TIMESTAMP '{year}-01-01'
    AND l_shipdate < TIMESTAMP '{year + 1}-01-01'),
pair AS (
  SELECT l_partkey, l_suppkey, CAST(sum(qty) AS BIGINT) AS supp_qty
  FROM gated GROUP BY l_partkey, l_suppkey),
tot AS (
  SELECT l_partkey, CAST(sum(supp_qty) AS BIGINT) AS part_qty
  FROM pair GROUP BY l_partkey),
dom AS (
  SELECT DISTINCT p.l_suppkey FROM pair p JOIN tot t USING (l_partkey)
  WHERE 2 * p.supp_qty > t.part_qty)
SELECT s.s_suppkey, s.s_name, n.n_name
FROM dom d JOIN supplier s ON s.s_suppkey = d.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = '{region}'"""
