"""Wave-9 operators: Morton spread correctness, gaps-and-islands streak
semantics, and the expectation suite's violation accounting."""

import numpy as np
import pandas as pd


def test_spread_bits_matches_naive():
    from yj_schema_validator_ray.pipelines.olap import _spread_bits

    def naive(v: int) -> int:
        out = 0
        for b in range(31):
            out |= ((v >> b) & 1) << (2 * b)
        return out

    rng = np.random.default_rng(7)
    vals = np.concatenate((
        np.array([0, 1, 2, 3, (1 << 31) - 1], dtype=np.int64),
        rng.integers(0, 1 << 31, size=200, dtype=np.int64)))
    got = _spread_bits(vals)
    exp = np.array([naive(int(v)) for v in vals], dtype=np.uint64)
    assert (got == exp).all()


def test_morton_interleave_orders_quadrants():
    from yj_schema_validator_ray.pipelines.olap import _spread_bits

    # z-order property: the top interleaved bits form quadrants — all
    # points with x,y < 2^k sort before any point with x or y >= 2^k
    xs = np.array([3, 3, 900, 5], dtype=np.int64)
    ys = np.array([7, 500, 7, 2], dtype=np.int64)
    m = _spread_bits(xs) | (_spread_bits(ys) << np.uint64(1))
    small = m[[0, 3]]
    big = m[[1, 2]]
    assert small.max() < big.min()


def test_user_streaks_semantics(ray_session):
    import ray

    from yj_schema_validator_ray.pipelines.olap import events_user_streaks
    import pyarrow.parquet as pq
    import pyarrow as pa
    import tempfile, os

    # user 1: days 0,1,2 then 5,6 -> longest 3, active 5, streaks 2
    # user 2: day 10 only (two events same day) -> 1,1,1
    us = 86_400_000_000
    rows = {
        "event_id": list(range(6)),
        "ts": pd.to_datetime(
            [d * us * 1000 for d in [0, 1, 2, 5, 6, 10]]
            + [], unit="ns"),
        "user_id": [1, 1, 1, 1, 1, 2],
        "event_type": ["view"] * 6,
        "value": [0.0] * 6,
        "props": ["{}"] * 6,
    }
    # add a same-day duplicate event for user 2
    rows["event_id"].append(6)
    rows["ts"] = pd.to_datetime(
        [d * us * 1000 for d in [0, 1, 2, 5, 6, 10, 10]], unit="ns")
    rows["user_id"].append(2)
    rows["event_type"].append("click")
    rows["value"].append(1.0)
    rows["props"].append("{}")

    with tempfile.TemporaryDirectory() as td:
        tbl = pa.table(rows)
        tbl = tbl.set_column(  # real events table is timestamp[us]
            tbl.schema.get_field_index("ts"), "ts",
            tbl.column("ts").cast(pa.timestamp("us")))
        pq.write_table(tbl, os.path.join(td, "events.parquet"))
        out = (events_user_streaks(td).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
    assert out.to_dict("records") == [
        {"user_id": 1, "longest_streak": 3, "n_active_days": 5,
         "n_streaks": 2},
        {"user_id": 2, "longest_streak": 1, "n_active_days": 1,
         "n_streaks": 1},
    ]


def test_expectations_report_all_pass_on_corpus(ray_session):
    from yj_schema_validator_ray.pipelines.constraints import (
        expectations_report,
    )

    out = expectations_report("/root/testdata/sf0.001")
    assert len(out) == 7
    assert (out.observed > 0).all()
    assert out.passed.eq(out.violations == 0).all()
    # the synthetic warehouse is clean except for any seeded orphans;
    # row-level checks must hold
    row_level = out[out.expectation.isin(
        ["row_count_at_least_1", "not_null:o_custkey",
         "accepted_values:o_orderstatus", "regex:o_orderpriority",
         "range:o_totalprice", "unique:o_orderkey"])]
    assert row_level.passed.all()


def test_semdedup_keep_lowest_id(ray_session):
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.olap import semdedup

    # vecs 1,2,5 are identical twins; 3 is orthogonal; 4 is the twin's
    # negative (cosine -1, never pruned)
    v = [1.0, 0.0, 0.0, 0.0]
    rows = {
        "vec_id": [1, 2, 3, 4, 5],
        "embedding": [v, v, [0.0, 1.0, 0.0, 0.0],
                      [-1.0, 0.0, 0.0, 0.0], v],
        "label": [0, 0, 0, 0, 0],
    }
    tbl = pa.table({
        "vec_id": pa.array(rows["vec_id"], pa.int64()),
        "embedding": pa.array(rows["embedding"], pa.list_(pa.float32())),
        "label": pa.array(rows["label"], pa.int32()),
    })
    with tempfile.TemporaryDirectory() as td:
        pq.write_table(tbl, os.path.join(td, "embeddings.parquet"))
        out = (semdedup(td, rounds=1, threshold=0.9).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
    assert list(out.vec_id) == [1, 2, 3, 4, 5]
    # keep-lowest-id: 1 survives, 2 and 5 prune; 3 and 4 survive
    assert list(out.pruned) == [False, True, False, False, True]
