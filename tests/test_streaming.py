"""Streaming windowed aggregation (stateful bucket actors + watermark)
must equal the batch tumbling window when no events are late."""

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
