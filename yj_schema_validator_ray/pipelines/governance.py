"""Data-governance pipelines: deletion propagation, financial
reconciliation, slowly-changing-dimension maintenance, incremental
aggregate certification.

These are the bookkeeping operators a production lake needs around the
analytic canon (reference analogue: none — the reference validates
documents; these validate the LAKE).  Every operator keeps the repo's
scale discipline: per-batch Arrow partials, coarse-hash keyed
exchanges (``stages.dedup.coarse_mix``), domain-sized outputs, no
driver-side loops over row-scale data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.sampling import _hex8, _hex_threshold

DELETE_RATE = 0.03


def _rule_mask(keys: pa.Array, thr: str) -> pa.Array:
    """The sampling-convention deletion rule: md5(str(key))[:8] < thr —
    ONE definition of the hash rule (``stages.sampling._hex8`` /
    ``_hex_threshold``) shared by every md5-rule operator so the
    convention can never drift between engines and their SQL mirrors
    (md5(CAST(k AS VARCHAR)))."""
    hx = _hex8(keys.to_pylist())
    return pa.array([h < thr for h in hx], pa.bool_())


def cascade_delete_audit(sf_dir: str, rate: float = DELETE_RATE,
                         coarse: int = 1024):
    """GDPR-style right-to-be-forgotten audit: a deterministic delete
    set of customers (md5-rule on c_custkey, ~3%) cascades to their
    orders and to those orders' lineitems; report per-entity
    deleted/retained row counts.

    Scale shape: the rule is a pure function of the customer key, so
    customer AND orders classify per batch with ZERO joins (o_custkey
    is on the order row).  Only lineitem needs its parent order's
    custkey — a genuine large-large join, done as one coarse-hash
    exchange on orderkey where the orders side ships only DELETED
    orderkeys (rate-bounded) and the lineitem side ships per-batch
    (orderkey, n_rows) partials.  Output is 3 rows.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    thr = _hex_threshold(rate)

    def count_rule(t: pa.Table, key: str, entity: str) -> pa.Table:
        m = _rule_mask(pc.cast(t.column(key), pa.int64()), thr)
        nd = int(pc.sum(pc.cast(m, pa.int64())).as_py() or 0)
        return pa.table({"entity": pa.array([entity], pa.string()),
                         "n_deleted": pa.array([nd], pa.int64()),
                         "n_retained": pa.array([t.num_rows - nd],
                                                pa.int64())})

    cust = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey"])
            .map_batches(lambda t: count_rule(t, "c_custkey", "customer"),
                         batch_format="pyarrow"))
    orders_counts = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                           columns=["o_custkey"])
                     .map_batches(lambda t: count_rule(t, "o_custkey",
                                                       "orders"),
                                  batch_format="pyarrow"))

    # lineitem: one keyed exchange on orderkey against deleted orders
    def deleted_orders(t: pa.Table) -> pa.Table:
        m = _rule_mask(pc.cast(t.column("o_custkey"), pa.int64()), thr)
        keys = pc.cast(t.filter(m).column("o_orderkey"), pa.int64())
        n = len(keys)
        return pa.table({
            "okey": keys,
            "n_rows": pa.array(np.zeros(n, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def lineitem_partials(t: pa.Table) -> pa.Table:
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64())})
             .group_by(["okey"]).aggregate([([], "count_all")])
             .rename_columns(["okey", "n_rows"]))
        keys = g.column("okey")
        return pa.table({
            "okey": keys,
            "n_rows": pc.cast(g.column("n_rows"), pa.int64()),
            "side": pa.array(np.ones(g.num_rows, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"entity": pd.Series(dtype="object"),
                                 "n_deleted": pd.Series(dtype="int64"),
                                 "n_retained": pd.Series(dtype="int64")})
        dead = set(g.loc[g["side"] == 0, "okey"].to_numpy())
        li = g[g["side"] == 1]
        is_dead = li["okey"].isin(dead).to_numpy()
        nd = int(li.loc[is_dead, "n_rows"].sum())
        nr = int(li.loc[~is_dead, "n_rows"].sum())
        return pd.DataFrame({"entity": ["lineitem"],
                             "n_deleted": [nd], "n_retained": [nr]})

    do = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                columns=["o_orderkey", "o_custkey"])
          .map_batches(deleted_orders, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey"])
          .map_batches(lineitem_partials, batch_format="pyarrow"))
    li_counts = (do.union(li)
                 .groupby("__coarse", num_partitions=shuffle_partitions())
                 .map_groups(classify, batch_format="pandas"))

    merged = cust.union(orders_counts).union(li_counts)
    return grouped_aggregate(merged, ["entity"],
                             [("n_deleted", "sum", "n_deleted"),
                              ("n_retained", "sum", "n_retained")])


def cascade_delete_audit_sql(rate: float = DELETE_RATE) -> str:
    thr = _hex_threshold(rate)
    return f"""
WITH rule AS (SELECT '{thr}' AS thr)
SELECT 'customer' AS entity,
       CAST(count(*) FILTER (WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) < thr) AS BIGINT) AS n_deleted,
       CAST(count(*) FILTER (WHERE substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8) >= thr) AS BIGINT) AS n_retained
FROM customer, rule
UNION ALL
SELECT 'orders',
       CAST(count(*) FILTER (WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) < thr) AS BIGINT),
       CAST(count(*) FILTER (WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) >= thr) AS BIGINT)
FROM orders, rule
UNION ALL
SELECT 'lineitem',
       CAST(count(*) FILTER (WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) < thr) AS BIGINT),
       CAST(count(*) FILTER (WHERE substr(md5(CAST(o_custkey AS VARCHAR)), 1, 8) >= thr) AS BIGINT)
FROM lineitem JOIN orders ON l_orderkey = o_orderkey, rule"""


def orders_price_reconciliation(sf_dir: str, coarse: int = 1024):
    """Financial reconciliation audit: recompute each order's total from
    its lineitems as sum(extended * (1-discount) * (1+tax)) and compare
    to the stated o_totalprice, reporting per-priority mismatch counts
    and the total absolute drift.

    EXACT INTEGER arithmetic end-to-end: each 2-decimal factor is
    quantized once (cents / basis points — exact for 2-dec doubles),
    then the product stays in int64 units of 1e-4 cents; no float sum
    ordering can diverge from the SQL oracle.

    Shape: lineitem pre-aggregates per batch to (orderkey, recomputed)
    partials; one coarse-hash exchange joins them to the orders side
    (orderkey, stated, priority); per-bucket vectorized compare emits
    priority-grain partials; a tiny grouped_aggregate finishes.
    Orders with no lineitems count as mismatched with drift = stated.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def li_side(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t.column("l_extendedprice"), pa.scalar(100.0))), pa.int64())
        disc = pc.cast(pc.round(pc.multiply(
            t.column("l_discount"), pa.scalar(100.0))), pa.int64())
        tax = pc.cast(pc.round(pc.multiply(
            t.column("l_tax"), pa.scalar(100.0))), pa.int64())
        v = (cents.to_numpy() * (100 - disc.to_numpy())
             * (100 + tax.to_numpy()))
        g = (pa.table({"okey": pc.cast(t.column("l_orderkey"), pa.int64()),
                       "recomputed": pa.array(v, pa.int64())})
             .group_by(["okey"]).aggregate([("recomputed", "sum")])
             .rename_columns(["okey", "recomputed"]))
        keys = g.column("okey")
        n = g.num_rows
        return pa.table({
            "okey": keys,
            "recomputed": g.column("recomputed"),
            "stated": pa.array(np.zeros(n, np.int64)),
            "o_orderpriority": pa.array([None] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        stated = pc.multiply(
            pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                         pa.scalar(100.0))), pa.int64()),
            pa.scalar(10000, pa.int64()))
        n = t.num_rows
        return pa.table({
            "okey": keys,
            "recomputed": pa.array(np.zeros(n, np.int64)),
            "stated": stated,
            "o_orderpriority": t.column("o_orderpriority"),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def reconcile(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderpriority": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64"),
                "n_mismatched": pd.Series(dtype="int64"),
                "abs_drift": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        o = g[g["side"] == 0]
        li = (g.loc[g["side"] == 1, ["okey", "recomputed"]]
              .groupby("okey", as_index=False).sum())
        j = o.merge(li, on="okey", how="left", suffixes=("_o", ""))
        rec = j["recomputed"].fillna(0).astype("int64")
        drift = (rec - j["stated"]).abs()
        out = pd.DataFrame({"o_orderpriority": j["o_orderpriority"],
                            "mis": (drift > 0).astype("int64"),
                            "abs_drift": drift.astype("int64")})
        r = out.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("mis", "size"), n_mismatched=("mis", "sum"),
            abs_drift=("abs_drift", "sum"))
        r["n_orders"] = r["n_orders"].astype("int64")
        return r[["o_orderpriority", "n_orders", "n_mismatched",
                  "abs_drift"]]

    li = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_tax"])
        .map_batches(li_side, batch_format="pyarrow"))
    o = (ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"])
        .map_batches(order_side, batch_format="pyarrow"))
    parts = (li.union(o)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(reconcile, batch_format="pandas"))
    return grouped_aggregate(parts, ["o_orderpriority"],
                             [("n_orders", "sum", "n_orders"),
                              ("n_mismatched", "sum", "n_mismatched"),
                              ("abs_drift", "sum", "abs_drift")])


def orders_price_reconciliation_sql() -> str:
    return """
WITH li AS (
  SELECT l_orderkey,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100.0) AS BIGINT))
                  * (100 + CAST(round(l_tax * 100.0) AS BIGINT)))
              AS BIGINT) AS recomputed
  FROM lineitem GROUP BY l_orderkey),
j AS (
  SELECT o.o_orderpriority,
         coalesce(li.recomputed, 0) AS recomputed,
         CAST(round(o.o_totalprice * 100.0) AS BIGINT) * 10000 AS stated
  FROM orders o LEFT JOIN li ON li.l_orderkey = o.o_orderkey)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(count(*) FILTER (WHERE recomputed <> stated) AS BIGINT)
         AS n_mismatched,
       CAST(sum(abs(recomputed - stated)) AS BIGINT) AS abs_drift
FROM j GROUP BY o_orderpriority"""


def _scd2_history(base: pd.DataFrame, upd: pd.DataFrame) -> pd.DataFrame:
    """ONE definition of the SCD2 dimension-history build shared by the
    producer (:func:`customer_scd2`) and the consumer
    (:func:`orders_scd2_temporal_join`): merge same-(cust, version)
    update partials, apply the 'SEG-' || n%5 segment rule, concat with
    the base rows and mergesort by (c_custkey, version).  Changing the
    rule here changes both sides together (and the SQL twin is the
    shared ``_SCD2_HIST_CTES`` string)."""
    upd = upd.groupby(["c_custkey", "version"], as_index=False)["n"].sum()
    upd["segment"] = "SEG-" + (upd["n"] % 5).astype(str)
    h = pd.concat([base, upd[["c_custkey", "version", "segment"]]],
                  ignore_index=True)
    return h.sort_values(["c_custkey", "version"], kind="mergesort")


# SQL twin of _scd2_history (composed by both scd2 oracles)
_SCD2_HIST_CTES = """upd AS (
  SELECT o_custkey AS c_custkey,
         CAST(year(o_orderdate) AS BIGINT) AS version,
         'SEG-' || CAST(count(*) % 5 AS VARCHAR) AS segment
  FROM orders GROUP BY o_custkey, year(o_orderdate)),
hist AS (
  SELECT c_custkey, CAST(0 AS BIGINT) AS version,
         c_mktsegment AS segment
  FROM customer
  UNION ALL SELECT * FROM upd)"""


def customer_scd2(sf_dir: str, coarse: int = 1024):
    """Slowly-changing-dimension (Type 2) build: merge the customer
    base rows (version 0) with a segment-update stream derived from
    orders — one update per (custkey, order year) setting segment to
    'SEG-' || (year's order count % 5) — into validity-interval rows
    (valid_from, valid_to, is_current).  Customers sighted only in the
    update stream (FK orphans) enter history at their first update,
    like a real CDC merge.

    Shape: orders pre-aggregate per batch to (custkey, year, n)
    partials; base + update partials co-locate through one coarse-hash
    exchange on custkey; the per-bucket merge is one vectorized pandas
    sort + shift per bucket (NOT per customer).  Output is
    history-sized (|customer| + |distinct cust-years|).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    def base_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "c_custkey": keys,
            "version": pa.array(np.zeros(n, np.int64)),
            "segment": t.column("c_mktsegment"),
            "n": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def update_side(t: pa.Table) -> pa.Table:
        g = (pa.table({
                "c_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
                "version": pc.cast(pc.year(t.column("o_orderdate")),
                                   pa.int64())})
             .group_by(["c_custkey", "version"])
             .aggregate([([], "count_all")])
             .rename_columns(["c_custkey", "version", "n"]))
        keys = g.column("c_custkey")
        return pa.table({
            "c_custkey": keys,
            "version": g.column("version"),
            "segment": pa.array([None] * g.num_rows, pa.string()),
            "n": pc.cast(g.column("n"), pa.int64()),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def build(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"c_custkey": pd.Series(dtype="int64"),
                "valid_from": pd.Series(dtype="int64"),
                "valid_to": pd.Series(dtype="int64"),
                "segment": pd.Series(dtype="object"),
                "is_current": pd.Series(dtype="bool")}
        if g.empty:
            return pd.DataFrame(cols)
        h = _scd2_history(
            base=g.loc[g["version"] == 0,
                       ["c_custkey", "version", "segment"]],
            upd=g.loc[g["version"] > 0, ["c_custkey", "version", "n"]])
        nxt = h["version"].shift(-1)
        last = h["c_custkey"].ne(h["c_custkey"].shift(-1))
        return pd.DataFrame({
            "c_custkey": h["c_custkey"].astype("int64"),
            "valid_from": h["version"].astype("int64"),
            "valid_to": np.where(last, 9999,
                                 nxt.fillna(9999) - 1).astype("int64"),
            "segment": h["segment"],
            "is_current": last.to_numpy()})

    base = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_mktsegment"])
            .map_batches(base_side, batch_format="pyarrow"))
    upd = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                 columns=["o_custkey", "o_orderdate"])
           .map_batches(update_side, batch_format="pyarrow"))
    return (base.union(upd)
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(build, batch_format="pandas"))


def customer_scd2_sql() -> str:
    return f"""
WITH {_SCD2_HIST_CTES},
s AS (
  SELECT c_custkey, version, segment,
         lead(version) OVER (PARTITION BY c_custkey
                             ORDER BY version) AS nxt
  FROM hist)
SELECT c_custkey, version AS valid_from,
       CAST(coalesce(nxt - 1, 9999) AS BIGINT) AS valid_to, segment,
       (nxt IS NULL) AS is_current
FROM s"""


INCR_SPLIT_US = 1_705_708_800_000_000  # 2024-01-20T00:00:00Z in epoch us


def incremental_agg(sf_dir: str):
    """Incremental-view-maintenance certificate: the per-event-type
    aggregate (count, sum/min/max of integer value-cents) is computed
    as TWO independent partial-state sets — the "yesterday" base
    (ts < 2024-01-20) and the "today" delta (ts >= split) — and the
    final answer comes from MERGING the states (count+count, sum+sum,
    min min, max max), never re-reading base rows.  The SQL oracle is
    the full recompute over all rows: passing the value-hash check IS
    the proof that the merge is lossless, i.e. the aggregate state is
    genuinely mergeable and the pipeline can maintain it incrementally
    at 100 TB (only the delta is scanned per refresh).

    Shape: two predicate-pushdown scans (each side prunes at the read),
    per-batch Arrow partials, one tiny type-domain exchange each, then
    a 2x|types|-row merge — base rows never co-move with delta rows.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    def partials(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                             pa.scalar(100.0))), pa.int64())
        g = (pa.table({"event_type": t.column("event_type"),
                       "sum_cents": cents, "min_cents": cents,
                       "max_cents": cents})
             .group_by(["event_type"])
             .aggregate([("sum_cents", "sum"), ("min_cents", "min"),
                         ("max_cents", "max"), ([], "count_all")])
             .rename_columns(["event_type", "sum_cents", "min_cents",
                              "max_cents", "n_events"]))
        return g.select(["event_type", "n_events", "sum_cents",
                         "min_cents", "max_cents"])

    def state(read_filter):
        # the pushed predicate may reference non-projected columns:
        # ts filters at the read but never ships in the batches
        ds = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                    columns=["event_type", "value"],
                                    filter=read_filter)
              .map_batches(partials, batch_format="pyarrow"))
        return grouped_aggregate(ds, ["event_type"],
                                 [("n_events", "sum", "n_events"),
                                  ("sum_cents", "sum", "sum_cents"),
                                  ("min_cents", "min", "min_cents"),
                                  ("max_cents", "max", "max_cents")])

    import pyarrow.dataset as pds

    split = pa.scalar(INCR_SPLIT_US, pa.timestamp("us"))
    base = state(pds.field("ts") < split)
    delta = state(pds.field("ts") >= split)
    # the IVM step: merge aggregate STATES (associative ops only)
    return grouped_aggregate(base.union(delta), ["event_type"],
                             [("n_events", "sum", "n_events"),
                              ("sum_cents", "sum", "sum_cents"),
                              ("min_cents", "min", "min_cents"),
                              ("max_cents", "max", "max_cents")])


def incremental_agg_sql() -> str:
    return """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS sum_cents,
       CAST(min(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS min_cents,
       CAST(max(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT)
         AS max_cents
FROM events GROUP BY event_type"""


def orders_scd2_temporal_join(sf_dir: str, coarse: int = 1024):
    """Effective-dated dimension lookup (the consumer side of
    :func:`customer_scd2`): every order joins to the customer-segment
    version in force the YEAR BEFORE its order date (eff = year - 1,
    so lookups genuinely land mid-history instead of on their own
    update), aggregating order counts and integer-cent revenue per
    segment value — the temporal/point-in-interval join every SCD
    warehouse query runs.

    Shape: ONE custkey-keyed coarse exchange carries all three row
    kinds (base dim rows, per-(cust, year) update partials, per-(cust,
    eff-year) probe partials); inside each bucket the history build is
    the scd2 sort/shift and the interval lookup is one vectorized
    searchsorted over cust*2^20+year packed keys — no per-probe
    Python, no second exchange.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    PK = 1 << 20  # year packing radix (years << 2^20)

    def base_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("c_custkey"), pa.int64())
        n = t.num_rows
        return pa.table({
            "c_custkey": keys,
            "year": pa.array(np.zeros(n, np.int64)),
            "segment": t.column("c_mktsegment"),
            "n": pa.array(np.zeros(n, np.int64)),
            "cents": pa.array(np.zeros(n, np.int64)),
            "kind": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def order_sides(t: pa.Table) -> pa.Table:
        ck = pc.cast(t.column("o_custkey"), pa.int64())
        yr = pc.cast(pc.year(t.column("o_orderdate")), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        upd = (pa.table({"c_custkey": ck, "year": yr})
               .group_by(["c_custkey", "year"])
               .aggregate([([], "count_all")])
               .rename_columns(["c_custkey", "year", "n"]))
        nu = upd.num_rows
        probe = (pa.table({"c_custkey": ck,
                           "year": pc.subtract(yr, pa.scalar(1, pa.int64())),
                           "cents": cents})
                 .group_by(["c_custkey", "year"])
                 .aggregate([("cents", "sum"), ([], "count_all")])
                 .rename_columns(["c_custkey", "year", "cents", "n"]))
        np_ = probe.num_rows
        both = pa.table({
            "c_custkey": pa.concat_arrays([
                upd.column("c_custkey").combine_chunks(),
                probe.column("c_custkey").combine_chunks()]),
            "year": pa.concat_arrays([
                upd.column("year").combine_chunks(),
                probe.column("year").combine_chunks()]),
            "segment": pa.array([None] * (nu + np_), pa.string()),
            "n": pa.concat_arrays([
                pc.cast(upd.column("n"), pa.int64()).combine_chunks(),
                pc.cast(probe.column("n"), pa.int64()).combine_chunks()]),
            "cents": pa.concat_arrays([
                pa.array(np.zeros(nu, np.int64)),
                probe.column("cents").combine_chunks()]),
            "kind": pa.array([1] * nu + [2] * (nu + np_ - nu), pa.int64()),
        })
        keys = both.column("c_custkey")
        return both.append_column(
            "__coarse", pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64()))

    def lookup(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"segment": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64"),
                "revenue_cents": pd.Series(dtype="int64")}
        if g.empty or not (g["kind"] == 2).any():
            return pd.DataFrame(cols)
        hist = _scd2_history(
            base=g.loc[g["kind"] == 0, ["c_custkey", "year", "segment"]]
            .rename(columns={"year": "version"}),
            upd=g.loc[g["kind"] == 1, ["c_custkey", "year", "n"]]
            .rename(columns={"year": "version"}))
        seg_key = (hist["c_custkey"].to_numpy() * PK
                   + hist["version"].to_numpy())
        seg_cust = hist["c_custkey"].to_numpy()
        seg_val = hist["segment"].to_numpy()
        pr = (g[g["kind"] == 2]
              .groupby(["c_custkey", "year"], as_index=False)
              .agg(n=("n", "sum"), cents=("cents", "sum")))
        pk = pr["c_custkey"].to_numpy() * PK + pr["year"].to_numpy()
        idx = np.searchsorted(seg_key, pk, side="right") - 1
        ok = (idx >= 0) & (seg_cust[np.maximum(idx, 0)]
                           == pr["c_custkey"].to_numpy())
        out = pd.DataFrame({
            "segment": seg_val[idx[ok]],
            "n_orders": pr["n"].to_numpy()[ok],
            "revenue_cents": pr["cents"].to_numpy()[ok]})
        r = out.groupby("segment", as_index=False).sum()
        r["n_orders"] = r["n_orders"].astype("int64")
        r["revenue_cents"] = r["revenue_cents"].astype("int64")
        return r

    base = (ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                                  columns=["c_custkey", "c_mktsegment"])
            .map_batches(base_side, batch_format="pyarrow"))
    osides = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                    columns=["o_custkey", "o_orderdate",
                                             "o_totalprice"])
              .map_batches(order_sides, batch_format="pyarrow"))
    parts = (base.union(osides)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(lookup, batch_format="pandas"))
    return grouped_aggregate(parts, ["segment"],
                             [("n_orders", "sum", "n_orders"),
                              ("revenue_cents", "sum", "revenue_cents")])


def orders_scd2_temporal_join_sql() -> str:
    return f"""
WITH {_SCD2_HIST_CTES},
s AS (
  SELECT c_custkey, version, segment,
         coalesce(lead(version) OVER (PARTITION BY c_custkey
                                      ORDER BY version) - 1, 9999)
           AS valid_to
  FROM hist),
probe AS (
  SELECT o_custkey AS c_custkey,
         CAST(year(o_orderdate) AS BIGINT) - 1 AS eff,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
  FROM orders)
SELECT s.segment, CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(p.cents) AS BIGINT) AS revenue_cents
FROM probe p JOIN s ON s.c_custkey = p.c_custkey
                   AND p.eff BETWEEN s.version AND s.valid_to
GROUP BY s.segment"""


def order_proration(sf_dir: str, coarse: int = 1024):
    """Largest-remainder PRORATION: each order's stated total (integer
    cents) is allocated across its lineitems proportionally to
    extendedprice, with the classic largest-remainder rule (base =
    total*ext // sum_ext; the remainder cents go to the lines with the
    largest modulo, ties by linenumber) so every order's allocations
    sum to its total EXACTLY — the financial spread/allocation step
    (revenue splits, cost shares) where naive rounding leaks cents.

    The audit output pins the per-line vectors, not just their sums:
    per priority, (n_orders, n_lines, allocated_cents — which must
    equal the stated totals — and alloc_dot_line = sum(alloc *
    linenumber), a checksum any misallocation shifts).

    Shape: one orderkey-keyed coarse exchange (order side: total +
    priority; line side: (okey, linenumber, ext_cents) triples);
    per-bucket vectorized grouped base/remainder arithmetic (argsort
    by (okey, -mod, linenumber) + per-order rank < remainder); tiny
    priority-domain finish.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def order_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("o_orderkey"), pa.int64())
        cents = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                             pa.scalar(100.0))), pa.int64())
        n = t.num_rows
        return pa.table({
            "okey": keys, "a": cents,
            "b": pa.array(np.zeros(n, np.int64)),
            "o_orderpriority": t.column("o_orderpriority"),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def li_side(t: pa.Table) -> pa.Table:
        keys = pc.cast(t.column("l_orderkey"), pa.int64())
        ext = pc.cast(pc.round(pc.multiply(t.column("l_extendedprice"),
                                           pa.scalar(100.0))), pa.int64())
        n = t.num_rows
        return pa.table({
            "okey": keys, "a": ext,
            "b": pc.cast(t.column("l_linenumber"), pa.int64()),
            "o_orderpriority": pa.array([None] * n, pa.string()),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(keys.to_numpy(), coarse - 1),
                                 pa.int64())})

    def prorate(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"o_orderpriority": pd.Series(dtype="object"),
                "n_orders": pd.Series(dtype="int64"),
                "n_lines": pd.Series(dtype="int64"),
                "allocated_cents": pd.Series(dtype="int64"),
                "alloc_dot_line": pd.Series(dtype="int64")}
        if g.empty or not (g["side"] == 1).any():
            return pd.DataFrame(cols)
        o = (g.loc[g["side"] == 0, ["okey", "a", "o_orderpriority"]]
             .rename(columns={"a": "total"}))
        li = (g.loc[g["side"] == 1, ["okey", "a", "b"]]
              .rename(columns={"a": "ext", "b": "line"})
              .sort_values(["okey", "line"], kind="mergesort"))
        j = li.merge(o, on="okey", how="inner")
        # per-order ext sums computed on the JOINED frame so orphan
        # lineitems (dropped by the inner merge) can't misalign rows
        se = j.groupby("okey")["ext"].transform("sum").to_numpy()
        total = j["total"].to_numpy()
        ext = j["ext"].to_numpy()
        line = j["line"].to_numpy()
        okey = j["okey"].to_numpy()
        # exact integer base + modulo (object dtype: total*ext can top
        # int64 at 1e9 * 1e9 cents — Python ints like the oracle HUGEINT)
        prod = total.astype(object) * ext.astype(object)
        base = np.array([int(p // s) for p, s in zip(prod, se)],
                        dtype=np.int64)
        mod = np.array([int(p % s) for p, s in zip(prod, se)],
                       dtype=np.int64)
        base_sum = (pd.Series(base).groupby(okey).transform("sum")
                    .to_numpy())
        rem_arr = total - base_sum  # cents left per order, on each row
        # vectorized per-order rank by (mod desc, line): run-start
        # offsets over the lexsorted okey (no per-row Python)
        order_rank = np.lexsort((line, -mod, okey))
        so = okey[order_rank]
        starts = np.concatenate(([0], np.flatnonzero(so[1:] != so[:-1])
                                 + 1))
        within = (np.arange(len(so), dtype=np.int64)
                  - np.repeat(starts, np.diff(np.concatenate(
                      (starts, [len(so)])))))
        rank_in_order = np.empty(len(j), np.int64)
        rank_in_order[order_rank] = within
        alloc = base + (rank_in_order < rem_arr).astype(np.int64)
        out = pd.DataFrame({"o_orderpriority": j["o_orderpriority"],
                            "n_lines": np.ones(len(j), np.int64),
                            "allocated_cents": alloc,
                            "alloc_dot_line": alloc * line,
                            "okey": okey})
        r = out.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("okey", "nunique"), n_lines=("n_lines", "sum"),
            allocated_cents=("allocated_cents", "sum"),
            alloc_dot_line=("alloc_dot_line", "sum"))
        for c in ("n_orders", "n_lines", "allocated_cents",
                  "alloc_dot_line"):
            r[c] = r[c].astype("int64")
        return r

    o = (ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                               columns=["o_orderkey", "o_totalprice",
                                        "o_orderpriority"])
         .map_batches(order_side, batch_format="pyarrow"))
    li = (ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                columns=["l_orderkey", "l_linenumber",
                                         "l_extendedprice"])
          .map_batches(li_side, batch_format="pyarrow"))
    parts = (o.union(li)
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(prorate, batch_format="pandas"))
    return grouped_aggregate(parts, ["o_orderpriority"],
                             [("n_orders", "sum", "n_orders"),
                              ("n_lines", "sum", "n_lines"),
                              ("allocated_cents", "sum",
                               "allocated_cents"),
                              ("alloc_dot_line", "sum",
                               "alloc_dot_line")])


def order_proration_sql() -> str:
    return """
WITH li AS (
  SELECT l_orderkey AS okey, l_linenumber AS line,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS ext,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
              OVER (PARTITION BY l_orderkey) AS BIGINT) AS se
  FROM lineitem),
o AS (
  SELECT o_orderkey AS okey, o_orderpriority,
         CAST(round(o_totalprice * 100.0) AS BIGINT) AS total
  FROM orders),
b AS (
  SELECT li.okey, li.line, o.o_orderpriority, o.total,
         (o.total * li.ext) // li.se AS base,
         (o.total * li.ext) % li.se AS md
  FROM li JOIN o ON o.okey = li.okey),
r AS (
  SELECT *,
         row_number() OVER (PARTITION BY okey
                            ORDER BY md DESC, line) - 1 AS rk,
         total - sum(base) OVER (PARTITION BY okey) AS rem
  FROM b),
a AS (SELECT okey, line, o_orderpriority,
             base + CASE WHEN rk < rem THEN 1 ELSE 0 END AS alloc
      FROM r)
SELECT o_orderpriority,
       CAST(count(DISTINCT okey) AS BIGINT) AS n_orders,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(alloc) AS BIGINT) AS allocated_cents,
       CAST(sum(alloc * line) AS BIGINT) AS alloc_dot_line
FROM a GROUP BY o_orderpriority"""


def k_anonymity_audit(sf_dir: str, k: int = 5):
    """Privacy-governance audit: k-anonymity of the customer table
    under the quasi-identifier (c_nationkey, c_mktsegment) — every row
    must be indistinguishable from at least k-1 others on the QI.
    Reports per-QI-class size statistics plus the violating mass:
    (n_classes, min_class_size, n_small_classes, n_rows_at_risk) — the
    release gate before publishing a "de-identified" extract.

    Shape: one QI-domain count exchange (bounded by |nations| x
    |segments|); the audit fold is driver-side over the class table.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    def rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "c_nationkey": pc.cast(t.column("c_nationkey"), pa.int64()),
            "c_mktsegment": t.column("c_mktsegment")})

    classes = collect_small_arrow(grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey", "c_mktsegment"])
        .map_batches(rows, batch_format="pyarrow"),
        ["c_nationkey", "c_mktsegment"],
        [("", "count", "n")])).to_pandas()
    ns = classes["n"].astype("int64")
    small = ns < k
    return pd.DataFrame({
        "n_classes": pd.Series([len(ns)], dtype="int64"),
        "min_class_size": pd.Series([int(ns.min())], dtype="int64"),
        "n_small_classes": pd.Series([int(small.sum())], dtype="int64"),
        "n_rows_at_risk": pd.Series([int(ns[small].sum())],
                                    dtype="int64")})


def k_anonymity_audit_sql(k: int = 5) -> str:
    return f"""
WITH c AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
           FROM customer GROUP BY c_nationkey, c_mktsegment)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST(count(*) FILTER (WHERE n < {k}) AS BIGINT)
         AS n_small_classes,
       CAST(coalesce(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT)
         AS n_rows_at_risk
FROM c"""


def qi_generalization_ladder(sf_dir: str, k: int = 5):
    """Anonymization LADDER: re-run the k-anonymity audit at three
    quasi-identifier generalization levels — (nation, segment) ->
    (nation) -> (region) — showing how coarsening the QI shrinks the
    at-risk mass (the generalization step a privacy officer applies
    when :func:`k_anonymity_audit` fails).  Region comes from the
    nation dimension (25 rows — broadcast-trivial lookup inside the
    batch map).

    Shape: ONE customer scan emits per-batch count partials for all
    three levels (level-tagged rows share the exchange); the audit
    fold is driver-side over the bounded class tables.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    import pyarrow.parquet as pq

    nat = pq.read_table(f"{sf_dir}/nation.parquet",
                        columns=["n_nationkey", "n_regionkey"])
    n2r = dict(zip(nat.column("n_nationkey").to_pylist(),
                   nat.column("n_regionkey").to_pylist()))

    def partials(t: pa.Table) -> pa.Table:
        nk = pc.cast(t.column("c_nationkey"), pa.int64()).to_numpy()
        seg = t.column("c_mktsegment").to_pylist()
        rk = np.array([n2r[int(v)] for v in nk], np.int64)
        lvl0 = ["0|" + str(a) + "|" + s for a, s in zip(nk, seg)]
        lvl1 = ["1|" + str(a) for a in nk]
        lvl2 = ["2|" + str(r) for r in rk]
        return pa.table({"qi_class": pa.array(lvl0 + lvl1 + lvl2,
                                              pa.string())})

    classes = collect_small_arrow(grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/customer.parquet",
                              columns=["c_nationkey", "c_mktsegment"])
        .map_batches(partials, batch_format="pyarrow"),
        ["qi_class"], [("", "count", "n")])).to_pandas()
    classes["level"] = classes["qi_class"].str[0].astype("int64")
    rows = []
    names = {0: "nation+segment", 1: "nation", 2: "region"}
    for lvl, g in classes.groupby("level"):
        ns = g["n"].astype("int64")
        small = ns < k
        rows.append({"qi_level": names[int(lvl)],
                     "n_classes": len(ns),
                     "min_class_size": int(ns.min()),
                     "n_rows_at_risk": int(ns[small].sum())})
    out = pd.DataFrame(rows)
    for c in ("n_classes", "min_class_size", "n_rows_at_risk"):
        out[c] = out[c].astype("int64")
    return out


def qi_generalization_ladder_sql(k: int = 5) -> str:
    return f"""
WITH l0 AS (SELECT c_nationkey, c_mktsegment, count(*) AS n
            FROM customer GROUP BY 1, 2),
l1 AS (SELECT c_nationkey, count(*) AS n FROM customer GROUP BY 1),
l2 AS (SELECT n.n_regionkey, count(*) AS n
       FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
       GROUP BY 1)
SELECT 'nation+segment' AS qi_level,
       CAST(count(*) AS BIGINT) AS n_classes,
       CAST(min(n) AS BIGINT) AS min_class_size,
       CAST(coalesce(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT)
         AS n_rows_at_risk
FROM l0
UNION ALL
SELECT 'nation', CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
       CAST(coalesce(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT)
FROM l1
UNION ALL
SELECT 'region', CAST(count(*) AS BIGINT), CAST(min(n) AS BIGINT),
       CAST(coalesce(sum(n) FILTER (WHERE n < {k}), 0) AS BIGINT)
FROM l2"""


# ---------------------------------------------------------------------------
# CDC changelog compaction with a base+delta merge certificate
# ---------------------------------------------------------------------------

CHANGELOG_CUT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z


def changelog_compaction(sf_dir: str):
    """Changelog (CDC) compaction certificate: treating the event
    stream as an upsert log keyed by ``user_id`` (latest
    ``(ts, event_id)`` wins; ``event_type='error'`` as the tombstone
    marker), compact it three ways — the FULL log, the base segment
    (``ts < CHANGELOG_CUT_US``), and the delta segment (``ts >= cut``)
    — and certify the incremental-maintenance identity a lakehouse
    MERGE relies on:

        compact(full) == merge(compact(base), compact(delta))

    (delta's last-writer wins per key, op counts add).  Output is one
    row: live-key count, tombstoned-key count, exact int64 sums of the
    live keys' last event ids / op counts, and the mismatch count (0 +
    ``states_equal=1`` iff the identity holds).

    Scale shape: last-writer-wins is a distributive argmax, so ONE
    linear pass emits <= 3 candidate rows + counts per (user, segment)
    per batch; one user-keyed coarse exchange co-locates a key's full /
    base / delta partials TOGETHER, and each group finishes the three
    compactions, the merge, and the comparison locally, emitting only
    group-level partial SUMS.  The driver folds block-count-sized
    partials — per-key state never leaves the exchange.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import collect_small_arrow, shuffle_partitions

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": df["user_id"].astype("int64"),
            "ts_us": df["ts"].astype("int64"),
            "event_id": df["event_id"].astype("int64"),
            "event_type": df["event_type"].astype("string"),
        })
        outs = []
        for seg, sub in ((0, df),
                         (1, df[df["ts_us"] < CHANGELOG_CUT_US]),
                         (2, df[df["ts_us"] >= CHANGELOG_CUT_US])):
            if not len(sub):
                continue
            s = sub.sort_values(["user_id", "ts_us", "event_id"],
                                kind="mergesort")
            g = s.groupby("user_id", sort=False)
            last = g.tail(1)[["user_id", "ts_us", "event_id", "event_type"]]
            m = last.merge(g.size().rename("n").reset_index(), on="user_id")
            m.insert(1, "seg", np.int64(seg))
            outs.append(m)
        if not outs:
            return pd.DataFrame({
                "user_id": pd.Series(dtype="int64"),
                "seg": pd.Series(dtype="int64"),
                "ts_us": pd.Series(dtype="int64"),
                "event_id": pd.Series(dtype="int64"),
                "event_type": pd.Series(dtype="string"),
                "n": pd.Series(dtype="int64"),
                "__coarse": pd.Series(dtype="int64")})
        out = pd.concat(outs, ignore_index=True)
        out["n"] = out["n"].astype("int64")
        out["__coarse"] = coarse_mix(
            out["user_id"].to_numpy(np.int64)).astype(np.int64)
        return out

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns="__coarse")
        s = g.sort_values(["user_id", "seg", "ts_us", "event_id"],
                          kind="mergesort")
        gb = s.groupby(["user_id", "seg"], sort=False)
        last = gb.tail(1)[["user_id", "seg", "event_id", "event_type"]]
        m = last.merge(gb["n"].sum().rename("n").reset_index(),
                       on=["user_id", "seg"])
        f = m[m["seg"] == 0].set_index("user_id")
        b = m[m["seg"] == 1].set_index("user_id").reindex(f.index)
        d = m[m["seg"] == 2].set_index("user_id").reindex(f.index)
        # merged state: delta's last writer wins, op counts add
        # cast back to int64 after the NaN-bearing reindex: a float64
        # compare would silently lose exactness past 2^53 ids
        m_id = (d["event_id"].where(d["event_id"].notna(), b["event_id"])
                .astype("int64"))
        m_type = d["event_type"].where(d["event_type"].notna(),
                                       b["event_type"])
        m_n = (b["n"].fillna(0) + d["n"].fillna(0)).astype("int64")
        mismatch = ((f["event_id"] != m_id) | (f["event_type"] != m_type)
                    | (f["n"] != m_n))
        tomb = f["event_type"] == "error"
        live = ~tomb
        return pd.DataFrame({
            "n_keys": [np.int64(live.sum())],
            "n_tombstoned": [np.int64(tomb.sum())],
            "sum_last_event_id": [np.int64(f.loc[live, "event_id"].sum())],
            "sum_n_ops": [np.int64(f.loc[live, "n"].sum())],
            "n_mismatch": [np.int64(mismatch.sum())]})

    parts = collect_small_arrow(
        ds.map_batches(partial, batch_format="pandas")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(finish, batch_format="pandas")).to_pandas()

    tot = parts.sum() if len(parts) else None
    vals = {c: (int(tot[c]) if tot is not None else 0)
            for c in ("n_keys", "n_tombstoned", "sum_last_event_id",
                      "sum_n_ops", "n_mismatch")}
    vals["states_equal"] = 1 if vals["n_mismatch"] == 0 else 0
    return pa.table({c: pa.array([v], pa.int64()) for c, v in vals.items()})


def changelog_compaction_sql() -> str:
    """Oracle: three row_number()-windowed compactions + a FULL OUTER
    JOIN merge/compare; compaction CTEs are MATERIALIZED (each is
    referenced by several of the final scalar subqueries)."""
    cut = CHANGELOG_CUT_US
    seg = """
  SELECT user_id,
         max(CASE WHEN rd = 1 THEN event_id END) AS last_id,
         max(CASE WHEN rd = 1 THEN event_type END) AS last_type,
         count(*) AS n
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                  ORDER BY ts_us DESC, event_id DESC) AS rd FROM ev{w})
  GROUP BY user_id"""
    return f"""
WITH ev AS (
  SELECT CAST(user_id AS BIGINT) AS user_id, epoch_us(ts) AS ts_us,
         CAST(event_id AS BIGINT) AS event_id, event_type
  FROM events),
full_c AS MATERIALIZED ({seg.format(w='')}),
base_c AS MATERIALIZED ({seg.format(w=f' WHERE ts_us < {cut}')}),
delta_c AS MATERIALIZED ({seg.format(w=f' WHERE ts_us >= {cut}')}),
merged AS MATERIALIZED (
  SELECT coalesce(d.user_id, b.user_id) AS user_id,
         coalesce(d.last_id, b.last_id) AS last_id,
         coalesce(d.last_type, b.last_type) AS last_type,
         coalesce(b.n, 0) + coalesce(d.n, 0) AS n
  FROM base_c b FULL OUTER JOIN delta_c d USING (user_id)),
cmp AS MATERIALIZED (
  SELECT coalesce(f.user_id, m.user_id) AS user_id,
         (f.user_id IS NULL OR m.user_id IS NULL
          OR f.last_id <> m.last_id OR f.last_type <> m.last_type
          OR f.n <> m.n) AS mismatch
  FROM full_c f FULL OUTER JOIN merged m ON f.user_id = m.user_id)
SELECT
  CAST((SELECT count(*) FROM full_c WHERE last_type <> 'error')
       AS BIGINT) AS n_keys,
  CAST((SELECT count(*) FROM full_c WHERE last_type = 'error')
       AS BIGINT) AS n_tombstoned,
  CAST((SELECT coalesce(sum(last_id), 0) FROM full_c
        WHERE last_type <> 'error') AS BIGINT) AS sum_last_event_id,
  CAST((SELECT coalesce(sum(n), 0) FROM full_c WHERE last_type <> 'error')
       AS BIGINT) AS sum_n_ops,
  CAST((SELECT count(*) FROM cmp WHERE mismatch) AS BIGINT) AS n_mismatch,
  CAST(CASE WHEN (SELECT count(*) FROM cmp WHERE mismatch) = 0
       THEN 1 ELSE 0 END AS BIGINT) AS states_equal"""
