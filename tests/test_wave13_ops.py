"""Eleventh/twelfth-wave contracts: proration conservation, TTL
watermark arithmetic, dense-spine completeness, range-plan balance."""

import duckdb
import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    return con


def test_proration_conserves_cents_per_order():
    # the largest-remainder rule must hit every order's stated total
    # EXACTLY (per order, not just in aggregate): replay the oracle's
    # allocation and assert zero drift order-by-order
    from yj_schema_validator_ray.pipelines.governance import (
        order_proration_sql)

    con = _con()
    per_order = con.execute("""
WITH li AS (
  SELECT l_orderkey AS okey, l_linenumber AS line,
         CAST(round(l_extendedprice * 100.0) AS BIGINT) AS ext,
         CAST(sum(CAST(round(l_extendedprice * 100.0) AS BIGINT))
              OVER (PARTITION BY l_orderkey) AS BIGINT) AS se
  FROM lineitem),
o AS (SELECT o_orderkey AS okey,
             CAST(round(o_totalprice * 100.0) AS BIGINT) AS total
      FROM orders),
b AS (SELECT li.okey, li.line, o.total,
             (o.total * li.ext) // li.se AS base,
             (o.total * li.ext) % li.se AS md
      FROM li JOIN o ON o.okey = li.okey),
r AS (SELECT *, row_number() OVER (PARTITION BY okey
                                   ORDER BY md DESC, line) - 1 AS rk,
             total - sum(base) OVER (PARTITION BY okey) AS rem
      FROM b)
SELECT okey, max(total) AS total,
       sum(base + CASE WHEN rk < rem THEN 1 ELSE 0 END) AS allocated
FROM r GROUP BY okey""").fetchdf()
    assert (per_order["total"] == per_order["allocated"]).all()
    # and the registered oracle's aggregate equals the stated totals
    agg = con.execute(order_proration_sql()).fetchdf()
    assert int(agg["allocated_cents"].sum()) == int(
        per_order["total"].sum())


def test_ttl_expiry_partition_is_total():
    from yj_schema_validator_ray.pipelines.olap import (
        events_ttl_expiry_sql)

    con = _con()
    df = con.execute(events_ttl_expiry_sql()).fetchdf()
    streams, = con.execute(
        "SELECT count(*) FROM (SELECT DISTINCT user_id, event_type "
        "FROM events)").fetchone()
    assert int((df["n_live"] + df["n_expired"]).sum()) == streams


def test_dense_matrix_is_complete_grid(ray_session):
    from yj_schema_validator_ray.pipelines.olap import events_dense_matrix

    d = events_dense_matrix(SF)
    days = d["day"].nunique()
    types = d["event_type"].nunique()
    assert len(d) == days * types
    # zero cells exist only if some (day,type) had no events; total
    # must equal the event count either way
    con = _con()
    n, = con.execute("SELECT count(*) FROM events").fetchone()
    assert int(d["n"].sum()) == n


def test_range_plan_is_balanced(ray_session):
    from yj_schema_validator_ray.pipelines.curation import (
        range_partition_plan)

    plan = range_partition_plan(SF, k=8)
    con = _con()
    n, = con.execute("SELECT count(*) FROM orders").fetchone()
    # boundaries ascend and each cum is within one dollar-bucket of
    # its ceil(i*N/8) target (cum >= target by construction)
    b = plan.sort_values("split_idx")
    assert b["boundary_dollars"].is_monotonic_increasing
    targets = [(i * n + 7) // 8 for i in range(1, 8)]
    assert (b["cum_orders"].to_numpy() >= np.array(targets)).all()


def test_log_parse_pattern_rejects_malformed():
    import pyarrow as pa
    import pyarrow.compute as pc

    pat = (r"^ts=(?P<ts>\d+) user=(?P<user>\d+) "
           r"type=(?P<type>\w+) val=(?P<val>-?\d+)$")
    good = pa.array(["ts=1 user=2 type=click val=-30"])
    bad = pa.array(["ts=x user=2 type=click val=3",
                    "user=2 ts=1 type=click val=3"])
    assert pc.extract_regex(good, pattern=pat).is_valid()[0].as_py()
    assert not any(v.as_py() for v in
                   pc.extract_regex(bad, pattern=pat).is_valid())
