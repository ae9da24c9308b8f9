"""Wave-8 unit tests: XOR table fingerprint partition-invariance and
the distributed prefix-max watermark vs a sequential replay."""

import hashlib

import numpy as np
import pandas as pd
import pytest

from yj_schema_validator_ray.pipelines.curation import corpus_fingerprint
from yj_schema_validator_ray.stages.streaming import events_late_arrivals


@pytest.fixture()
def docs_df():
    rng = np.random.default_rng(5)
    n = 300
    return pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "text": [f"body {i} {'x' * int(rng.integers(0, 40))}"
                 for i in range(n)],
        "lang": rng.choice(["en", "fr", "de"], size=n),
    })


def test_fingerprint_partition_invariant(ray_session, docs_df):
    import ray.data

    a = corpus_fingerprint(ray.data.from_pandas(docs_df))
    b = corpus_fingerprint(
        ray.data.from_pandas(docs_df.sample(frac=1.0, random_state=1))
        .repartition(9))
    a = a.sort_values("lang").reset_index(drop=True)
    b = b.sort_values("lang").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_fingerprint_detects_one_changed_row(ray_session, docs_df):
    import ray.data

    base = corpus_fingerprint(ray.data.from_pandas(docs_df))
    mutated = docs_df.copy()
    mutated.loc[7, "text"] = mutated.loc[7, "text"] + "!"
    mut = corpus_fingerprint(ray.data.from_pandas(mutated))
    lang = docs_df.loc[7, "lang"]
    a = base.set_index("lang")
    b = mut.set_index("lang")
    assert a.loc[lang, "n_docs"] == b.loc[lang, "n_docs"]
    assert a.loc[lang, "content_xor"] != b.loc[lang, "content_xor"]
    other = [l for l in a.index if l != lang]
    pd.testing.assert_frame_equal(a.loc[other], b.loc[other])


def test_late_arrivals_matches_sequential_replay(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(9)
    n = 500
    ts = np.sort(rng.integers(0, 10**12, size=n))
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": pd.to_datetime(ts, unit="us"),
    })
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")

    lateness_us = 60 * 1_000_000
    out = (events_late_arrivals(str(tmp_path), lateness_s=60)
           .to_pandas().sort_values("event_id").reset_index(drop=True))

    # sequential replay in md5-arrival order
    h = {i: hashlib.md5(str(i).encode()).hexdigest() for i in range(n)}
    arrival = sorted(range(n), key=lambda i: (h[i], i))
    wm = -1
    want = {}
    for i in arrival:
        t = int(ts[i])
        want[i] = (wm, int(wm >= 0 and t < wm - lateness_us))
        wm = max(wm, t)
    assert len(out) == n
    for r in out.itertuples():
        w_wm, w_late = want[r.event_id]
        assert r.watermark_us == w_wm and r.late == w_late, r.event_id
