"""Streaming windowed aggregation (stateful bucket actors + watermark)
must equal the batch tumbling window when no events are late."""

import numpy as np
import pandas as pd

from yj_schema_validator_ray.pipelines.relational import events_tumbling_window
from yj_schema_validator_ray.stages.streaming import streaming_tumbling_window

SF = "/root/testdata/sf0.001"


def test_streaming_equals_batch_window(ray_session):
    batch = (events_tumbling_window(SF).to_pandas()
             .sort_values(["event_type", "window_start"]).reset_index(drop=True))
    stream = streaming_tumbling_window(SF)
    pd.testing.assert_frame_equal(
        stream[batch.columns.tolist()], batch, check_dtype=False)


def test_late_event_accounting(ray_session):
    import ray

    from yj_schema_validator_ray.stages.streaming import WindowBucketActor

    a = WindowBucketActor.remote(window_s=100, lateness_s=10)
    assert ray.get(a.ingest.remote(["k"], [1000], [5])) == 0
    # watermark=1000; an event older than 990 is late-dropped
    assert ray.get(a.ingest.remote(["k"], [950], [5])) == 1
    # finalization: epoch-1000 sits in window [1000,1100), which closes
    # once watermark - lateness >= 1100, i.e. watermark >= 1110
    assert ray.get(a.ingest.remote(["k"], [1115], [7])) == 0
    done = ray.get(a.poll_finalized.remote())
    assert ("k", 1000, 1, 5) in done
    rows, late = ray.get(a.flush.remote())
    assert ("k", 1100, 1, 7) in rows
    assert late == 1
    ray.kill(a)


def test_events_asof_join_semantics(ray_session, tmp_path):
    """As-of join: each click matches the most recent view of the same
    user at-or-before its ts; clicks with no prior view drop (inner)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import events_asof_join

    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    rows = [
        # user 1: view@0, click@5 -> match; view@10, click@10 (exact) -> match
        (0, ts(0), 1, "view"), (1, ts(5), 1, "click"),
        (2, ts(10), 1, "view"), (3, ts(10), 1, "click"),
        # user 2: click before any view -> dropped; later view+click match
        (4, ts(1), 2, "click"), (5, ts(2), 2, "view"), (6, ts(3), 2, "click"),
        # user 3: other event types ignored
        (7, ts(1), 3, "error"), (8, ts(2), 3, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = events_asof_join(str(d)).to_pandas()
    got = {(int(r.event_id), int(r.view_event_id)) for r in out.itertuples()}
    assert got == {(1, 0), (3, 2), (6, 5)}


def test_events_asof_join_forward_semantics(ray_session, tmp_path):
    """Forward as-of: each click matches the EARLIEST view of the same
    user at-or-after its ts; ties on ts resolve to min view id."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import events_asof_join

    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    rows = [
        # user 1: click@5 -> next view is @10 (not the earlier @0)
        (0, ts(0), 1, "view"), (1, ts(5), 1, "click"), (2, ts(10), 1, "view"),
        # user 2: click@10 with TWO views at ts=10 -> min view id (4)
        (3, ts(10), 2, "click"), (4, ts(10), 2, "view"), (5, ts(10), 2, "view"),
        # user 3: click after the last view -> dropped
        (6, ts(9), 3, "view"), (7, ts(20), 3, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = events_asof_join(str(d), direction="forward").to_pandas()
    got = {(int(r.event_id), int(r.view_event_id)) for r in out.itertuples()}
    assert got == {(1, 2), (3, 4)}


def test_events_range_join_semantics(ray_session, tmp_path):
    """Range join: each click matches EVERY purchase window
    [ts, ts+3600s) of the same user containing it (many-to-many)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import events_range_join

    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    rows = [
        # user 1: purchases @0 and @1800 (overlapping windows [0,3600)
        # and [1800,5400)); click @2000 in BOTH, click @4000 in the
        # second only, click @5500 in neither
        (0, ts(0), 1, "purchase"), (1, ts(1800), 1, "purchase"),
        (2, ts(2000), 1, "click"), (3, ts(4000), 1, "click"),
        (4, ts(5500), 1, "click"),
        # boundary: click exactly at window start matches, at end doesn't
        (5, ts(0), 2, "purchase"), (6, ts(0), 2, "click"),
        (7, ts(3600), 2, "click"),
        # other user's window never matches
        (8, ts(100), 3, "click"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = events_range_join(str(d)).to_pandas()
    got = {(int(r.event_id), int(r.matched_event_id)) for r in out.itertuples()}
    assert got == {(2, 0), (2, 1), (3, 1), (6, 5)}


def test_events_funnel_ordering(ray_session, tmp_path):
    """Funnel counts users whose FIRST event of each stage is strictly
    after the previous stage's first event — out-of-order users drop at
    the stage that violates the order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import events_funnel

    ts = lambda s: pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)
    rows = [
        # user 1: view@1 click@2 purchase@3 -> reaches all three
        (0, ts(1), 1, "view"), (1, ts(2), 1, "click"), (2, ts(3), 1, "purchase"),
        # user 2: click BEFORE view -> only 'view' stage counts
        (3, ts(5), 2, "click"), (4, ts(6), 2, "view"), (5, ts(7), 2, "purchase"),
        # user 3: view then click, no purchase -> two stages
        (6, ts(1), 3, "view"), (7, ts(9), 3, "click"),
        # user 4: purchase only -> zero stages
        (8, ts(1), 4, "purchase"),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows], pa.string()),
        "value": pa.array([0.0] * len(rows), pa.float64()),
    })
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, d / "events.parquet")
    out = events_funnel(str(d)).to_pandas()
    got = dict(zip(out["stage"], out["n_users"]))
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_grouped_exact_quantiles_empty_input(ray_session):
    """Empty/filtered-to-nothing input returns an (empty) Dataset — the
    same type as every other input, so callers never branch."""
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import (
        grouped_exact_quantiles)

    ds = ray.data.from_pandas(pd.DataFrame(
        {"g": pd.Series(dtype="object"),
         "value": pd.Series(dtype="float64")}))
    out = grouped_exact_quantiles(ds, "g", "value")
    assert isinstance(out, ray.data.Dataset)
    assert out.count() == 0


def test_approx_quantile_sketch_error_bound(ray_session):
    """The mergeable centroid sketch lands within 2% RANK error of the
    true quantiles on a multi-block stream."""
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import approx_quantile_sketch

    rng = np.random.RandomState(23)
    vals = np.concatenate([rng.lognormal(0, 1, 40_000),
                           rng.normal(100, 5, 10_000)])
    ds = ray.data.from_pandas(
        pd.DataFrame({"value": vals})).repartition(20)
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    out = approx_quantile_sketch(ds, "value", qs=qs)
    s = np.sort(vals)
    for q, est in zip(out["quantile"], out["value_est"]):
        rank = np.searchsorted(s, est) / len(s)
        assert abs(rank - q) <= 0.02, (q, est, rank)


def test_partition_layout_invariance(ray_session):
    """Exact operators must not depend on block layout: quantiles,
    vocab top-k and heavy hitters return identical results on 1-block
    vs shuffled 16-block inputs."""
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import (
        grouped_exact_quantiles)
    from yj_schema_validator_ray.stages.text import (heavy_hitters,
                                                     vocab_top_terms)

    rng = np.random.RandomState(17)
    vocab = np.array([f"w{i}" for i in range(50)])
    texts = [" ".join(vocab[rng.randint(0, 50, size=30)]) for _ in range(400)]
    docs = pd.DataFrame({"doc_id": range(400), "text": texts})
    vals = pd.DataFrame({"g": ["a", "b"] * 500,
                         "value": rng.normal(size=1000)})

    def layouts(df):
        yield ray.data.from_pandas(df)
        yield ray.data.from_pandas(df).random_shuffle(seed=9).repartition(16)

    outs = [grouped_exact_quantiles(ds, "g", "value").to_pandas()
            .sort_values(["g", "quantile"]).reset_index(drop=True)
            for ds in layouts(vals)]
    pd.testing.assert_frame_equal(outs[0], outs[1])

    outs = [vocab_top_terms(ds, k=20).to_pandas()
            .sort_values(["tf", "term"], ascending=[False, True])
            .reset_index(drop=True) for ds in layouts(docs)]
    pd.testing.assert_frame_equal(outs[0], outs[1])

    outs = [heavy_hitters(ds, k=10, capacity=100).to_pandas()
            .sort_values(["n", "term"], ascending=[False, True])
            .reset_index(drop=True) for ds in layouts(docs)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_grouped_quantile_sketch_error_bound(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import (
        grouped_quantile_sketch)

    rng = np.random.RandomState(31)
    frames = {"a": rng.lognormal(0, 1, 20_000),
              "b": rng.normal(50, 10, 15_000)}
    df = pd.DataFrame({
        "g": np.concatenate([[k] * len(v) for k, v in frames.items()]),
        "value": np.concatenate(list(frames.values()))})
    ds = ray.data.from_pandas(df).random_shuffle(seed=3).repartition(16)
    out = grouped_quantile_sketch(ds, "g", "value")
    for r in out.itertuples():
        s = np.sort(frames[r.g])
        rank = np.searchsorted(s, r.value_est) / len(s)
        assert abs(rank - r.quantile) <= 0.03, (r.g, r.quantile, rank)


def test_grouped_exact_quantiles(ray_session):
    """Two-phase radix-bucket rank selection equals the exact
    ceil(q*n)-th smallest per group — including negative values and an
    all-equal (single-bucket) group."""
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import (
        grouped_exact_quantiles)

    rng = np.random.RandomState(7)
    frames = {
        "a": rng.normal(0, 100, size=1000),       # negatives included
        "b": rng.exponential(5, size=377),
        "c": np.full(50, 3.25),                   # pathological: one value
    }
    df = pd.DataFrame({
        "g": np.concatenate([[k] * len(v) for k, v in frames.items()]),
        "value": np.concatenate(list(frames.values())),
    })
    qs = (0.25, 0.5, 0.75, 0.9, 0.99)
    out = grouped_exact_quantiles(
        ray.data.from_pandas(df), "g", "value", qs=qs).to_pandas()
    got = {(r.g, r.quantile): r.value for r in out.itertuples()}
    assert len(got) == len(frames) * len(qs)
    for k, v in frames.items():
        s = np.sort(v)
        for q in qs:
            r = max(1, int(np.ceil(q * len(v))))
            assert got[(k, q)] == s[r - 1], (k, q)


def test_grouped_quantiles_auto_route_high_cardinality(ray_session):
    """A 100k-group column auto-routes to the per-group sketch (no
    O(groups x qs) driver targets dict, no per-group pruned gather) and
    — because every group fits inside one sketch without compaction —
    still returns the exact ceil(q*n)-th element per group."""
    import ray.data

    from yj_schema_validator_ray.stages.quantiles import (
        grouped_exact_quantiles)

    n_groups = 100_000
    rng = np.random.RandomState(23)
    g = np.repeat(np.arange(n_groups, dtype=np.int64), 2)
    vals = rng.normal(size=len(g)) * 10
    df = pd.DataFrame({"g": g, "value": vals})
    qs = (0.5, 0.99)
    out = grouped_exact_quantiles(
        ray.data.from_pandas(df), "g", "value", qs=qs).to_pandas()
    assert len(out) == n_groups * len(qs)
    got = {(int(r.g), r.quantile): r.value for r in out.itertuples()}
    check = rng.choice(n_groups, size=200, replace=False)
    for grp in check:
        s = np.sort(vals[g == grp])
        for q in qs:
            r = max(1, int(np.ceil(q * len(s))))
            assert got[(int(grp), q)] == s[r - 1], (grp, q)


def test_session_actor_watermark_semantics(ray_session):
    """SessionBucketActor: gap splits sessions, the watermark finalizes
    sessions incrementally (user can reopen later), and events older
    than watermark - lateness are dropped and counted."""
    import ray

    from yj_schema_validator_ray.stages.streaming import SessionBucketActor

    a = SessionBucketActor.remote(gap_us=100, lateness_us=10)
    # user 1: two events 50 apart (one session), then a 200 gap (new one)
    assert ray.get(a.ingest.remote([1, 1], [1000, 1050])) == 0
    assert ray.get(a.poll_finalized.remote()) == []  # nothing closable yet
    assert ray.get(a.ingest.remote([1], [1300])) == 0  # gap 250 > 100
    # watermark 1300: session (1000,1050) closed at the gap; 1050+100 <
    # 1290 so it is emittable NOW while the stream still flows
    out = ray.get(a.poll_finalized.remote())
    assert out == [(1, 1000, 1050, 2)]
    # late event: watermark 1300, lateness 10 -> anything < 1290 drops
    assert ray.get(a.ingest.remote([2], [1100])) == 1
    rows, late = ray.get(a.flush.remote())
    assert rows == [(1, 1300, 1300, 1)] and late == 1
    ray.kill(a)


def test_streaming_sessionize_matches_batch(ray_session):
    from yj_schema_validator_ray.pipelines.relational import (
        events_sessionize)
    from yj_schema_validator_ray.stages.streaming import (
        streaming_sessionize)

    sf = "/root/testdata/sf0.001"
    got = (streaming_sessionize(sf).sort_values("user_id")
           .reset_index(drop=True))
    exp = (events_sessionize(sf).to_pandas().sort_values("user_id")
           .reset_index(drop=True).astype({"user_id": "int64",
                                           "n_sessions": "int64",
                                           "n_events": "int64"}))
    pd.testing.assert_frame_equal(got, exp)
