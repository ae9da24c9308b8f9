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
