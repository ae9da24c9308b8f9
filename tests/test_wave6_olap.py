"""Wave-6 unit tests: exact-proportion stratified split (multi-block
rank correctness + exact cut sizes) and the wide pivot partial."""

import numpy as np
import pandas as pd
import pytest

from yj_schema_validator_ray.stages.sampling import exact_split


@pytest.fixture()
def split_df():
    rng = np.random.default_rng(3)
    n = 400
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": rng.choice(["s1", "s2", "s3"], size=n),
        "text": [f"doc number {i} body {i * 7 % 13}" for i in range(n)],
    })


def test_exact_split_proportions_and_ranks(ray_session, split_df):
    import hashlib

    import ray.data

    out = exact_split(ray.data.from_pandas(split_df).repartition(7)).to_pandas()
    assert len(out) == len(split_df)
    for src, g in out.groupby("source"):
        n = len(g)
        # ranks are a permutation of 1..n within the source
        assert sorted(g["rk"]) == list(range(1, n + 1))
        # exact floor-count split sizes
        n_train = int(np.floor(0.8 * n))
        n_val = int(np.floor(0.1 * n))
        vc = g["split"].value_counts()
        assert vc.get("train", 0) == n_train
        assert vc.get("val", 0) == n_val
        assert vc.get("test", 0) == n - n_train - n_val
        # rank order agrees with a driver-side (md5, doc_id) sort
        sub = split_df[split_df["source"] == src].copy()
        sub["h"] = [hashlib.md5(t.encode()).hexdigest()
                    for t in sub["text"]]
        want = (sub.sort_values(["h", "doc_id"])["doc_id"]
                .to_numpy(np.int64))
        got = g.sort_values("rk")["doc_id"].to_numpy(np.int64)
        assert (got == want).all()


def test_exact_split_deterministic(ray_session, split_df):
    import ray.data

    a = exact_split(ray.data.from_pandas(split_df)).to_pandas()
    b = exact_split(
        ray.data.from_pandas(split_df).repartition(5)).to_pandas()
    a = a.sort_values("doc_id").reset_index(drop=True)
    b = b.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_rolling_distinct_gaps_and_zero_days(ray_session):
    """Hand-built activity with a dead zone: interval union per user,
    zero-active middle days emitted, window edges exact."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.olap import (
        events_rolling_distinct)

    US = 86_400_000_000
    # user 1 active day 0 and day 10 (gap > window); user 2 day 0 only;
    # user 3 days 1,2 (overlapping coverage merges into one chain)
    rows = [(1, 0), (1, 10), (2, 0), (3, 1), (3, 2)]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([u for u, _ in rows], pa.int64()),
        "ts": pa.array([d * US + 5 for _, d in rows],
                       pa.timestamp("us")),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = events_rolling_distinct(d, window_days=3)
    want = {  # trailing 3-day window [d-2, d]
        0: 2,   # u1, u2
        1: 3,   # u1, u2 (cover 0..2), u3
        2: 3,
        3: 1,   # only u3 (day2 covers 2..4)
        4: 1,
        5: 0, 6: 0, 7: 0, 8: 0, 9: 0,   # dead zone
        10: 1,  # u1 again
    }
    got_map = dict(zip(got["day"], got["n_active"]))
    assert got_map == want


def test_basket_pairs_cap_and_cross_block(ray_session):
    """A basket over the cap is dropped wholesale; a basket split
    across input blocks is repaired by the order-keyed exchange;
    duplicate (order, part) rows count once."""
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.olap import basket_pairs

    # order 1: parts 1,2,3 (dup part 2) -> pairs (1,2),(1,3),(2,3)
    # order 2: parts 1,2 -> pair (1,2) => support(1,2) = 2
    # order 3: parts 10..14 with cap 4 -> dropped entirely
    orders = ([1] * 4 + [2] * 2 + [3] * 5)
    parts = [1, 2, 2, 3, 1, 2, 10, 11, 12, 13, 14]
    tbl = pa.table({
        "l_orderkey": pa.array(orders, pa.int64()),
        "l_partkey": pa.array(parts, pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "lineitem.parquet"))
        got = (basket_pairs(d, min_support=1, max_basket=4)
               .to_pandas().sort_values(["p1", "p2"])
               .reset_index(drop=True))
    want = {(1, 2): 2, (1, 3): 1, (2, 3): 1}
    assert {(r["p1"], r["p2"]): r["support"]
            for _, r in got.iterrows()} == want
