"""Stream-shaped windowed aggregation with incremental actor state.

Ray Data is a batch engine with no event-time watermarks; for
stream-shaped inputs (the ``events`` table as an ordered, partitioned
log) the engine offers two shapes:

1. :func:`..pipelines.relational.events_tumbling_window` — the batch
   shape (``groupby`` over pre-aggregated window partials).  Prefer it.
2. :class:`WindowedCounter` (here) — RAW RAY ACTORS holding incremental
   per-window state with a watermark: one actor per key-hash bucket fed
   batches in timestamp order; windows finalize (and become emittable)
   once the bucket's watermark (max ts seen - allowed lateness) passes
   their end.  This is the "(c) raw Ray tasks/actors" escape hatch
   (SURVEY §2 custom operators) for semantics the Dataset API can't
   express: emitting results incrementally while the stream is still
   being consumed, with late-event accounting.

Partitioning assumption: events are routed to buckets by
``hash(key) % n_buckets`` — one key's events always meet the same
actor; within a bucket, batches must arrive in non-decreasing ts order
for the watermark to be meaningful (the driver feeds sorted batches).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray


@ray.remote
class WindowBucketActor:
    """Incremental (event_type, window) -> (count, sum_cents) state for
    one key-hash bucket, with watermark-driven finalization."""

    def __init__(self, window_s: int, lateness_s: int):
        self.window_s = window_s
        self.lateness_s = lateness_s
        self.state: dict[tuple, list] = {}   # (key, win) -> [n, sum_cents]
        self.watermark = -np.inf
        self.late_events = 0

    def ingest(self, keys: list, epochs: list, cents: list) -> int:
        """Feed a batch; returns number of late-dropped events."""
        late = 0
        for k, e, c in zip(keys, epochs, cents):
            if e < self.watermark - self.lateness_s:
                late += 1     # too late: window may already be finalized
                continue
            win = int(e // self.window_s) * self.window_s
            slot = self.state.get((k, win))
            if slot is None:
                self.state[(k, win)] = [1, c]
            else:
                slot[0] += 1
                slot[1] += c
        if epochs:
            self.watermark = max(self.watermark, max(epochs))
        self.late_events += late
        return late

    def poll_finalized(self) -> list[tuple]:
        """Windows whose end + lateness < watermark: emit and drop."""
        cutoff = self.watermark - self.lateness_s
        done = [kw for kw in self.state if kw[1] + self.window_s <= cutoff]
        result = []
        for k, w in done:
            n, s = self.state.pop((k, w))
            result.append((k, w, n, s))
        return result

    def flush(self) -> tuple[list[tuple], int]:
        """End of stream: emit everything remaining + late count."""
        result = [(k, w, n, s) for (k, w), (n, s) in self.state.items()]
        self.state.clear()
        return result, self.late_events


def streaming_tumbling_window(sf_dir: str, window_s: int = 3600,
                              lateness_s: int = 600, n_buckets: int = 4):
    """Windowed counts via stateful bucket actors fed in ts order.

    Returns a DataFrame (event_type, window_start, n_events,
    sum_value_cents) — equal to the batch tumbling window when no events
    are late (the driver feeds globally sorted batches, so none are).
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type", "value"])
    ds = ds.sort("ts")  # ordered log (range-partitioned by time)

    actors = [WindowBucketActor.remote(window_s, lateness_s)
              for _ in range(n_buckets)]
    emitted: list[tuple] = []

    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        epoch = pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                          1_000_000).to_numpy()
        keys = batch.column("event_type").to_pylist()
        cents = pc.cast(pc.round(pc.multiply(batch.column("value"),
                                             pa.scalar(100.0))),
                        pa.int64()).to_numpy()
        # stable routing (Python str hash is per-process randomized)
        import hashlib

        buckets = np.array([int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
                            % n_buckets for k in keys])
        pending = []
        for b in range(n_buckets):
            m = buckets == b
            if not m.any():
                continue
            pending.append(actors[b].ingest.remote(
                [k for k, mm in zip(keys, m) if mm],
                epoch[m].tolist(), cents[m].tolist()))
        ray.get(pending)
        # incremental emission while the stream is still flowing
        for rows in ray.get([a.poll_finalized.remote() for a in actors]):
            emitted.extend(rows)

    for rows, _late in ray.get([a.flush.remote() for a in actors]):
        emitted.extend(rows)
    for a in actors:
        ray.kill(a)

    df = pd.DataFrame(emitted, columns=["event_type", "window_start",
                                        "n_events", "sum_value_cents"])
    return (df.groupby(["event_type", "window_start"], as_index=False)
            .sum().astype({"window_start": "int64", "n_events": "int64",
                           "sum_value_cents": "int64"})
            [["event_type", "window_start", "sum_value_cents", "n_events"]]
            .sort_values(["event_type", "window_start"]).reset_index(drop=True))


@ray.remote
class SessionBucketActor:
    """Incremental per-user SESSION state for one user-hash bucket.

    A session extends while consecutive events arrive within ``gap_s``;
    it becomes emittable once the bucket watermark (max ts seen minus
    ``lateness_s``) passes ``last_ts + gap_s`` — no event can extend it
    any more, though the same user may open NEW sessions later (session
    windows finalize individually; per-user totals only at flush)."""

    def __init__(self, gap_us: int, lateness_us: int):
        # MICROSECOND domain end-to-end: the parquet timestamps carry
        # sub-second parts, and the SQL gap compare (epoch() doubles)
        # is exact at us precision — flooring to seconds would diverge
        self.gap = gap_us
        self.lateness = lateness_us
        # user -> [session_start, last_ts, n_events]
        self.open: dict[int, list] = {}
        self.watermark = -np.inf
        self.emitted: list[tuple] = []
        self.late_events = 0

    def ingest(self, users: list, epochs: list) -> int:
        late = 0
        for u, e in zip(users, epochs):
            if e < self.watermark - self.lateness:
                late += 1
                continue
            s = self.open.get(u)
            if s is None:
                self.open[u] = [e, e, 1]
            elif e - s[1] > self.gap:
                self.emitted.append((u, s[0], s[1], s[2]))  # close
                self.open[u] = [e, e, 1]
            else:
                s[1] = max(s[1], e)
                s[2] += 1
        if epochs:
            self.watermark = max(self.watermark, max(epochs))
        self.late_events += late
        return late

    def poll_finalized(self) -> list[tuple]:
        """Sessions no on-time event can extend: emit and drop."""
        cutoff = self.watermark - self.lateness
        out = list(self.emitted)
        self.emitted.clear()
        done = [u for u, s in self.open.items()
                if s[1] + self.gap < cutoff]
        for u in done:
            s = self.open.pop(u)
            out.append((u, s[0], s[1], s[2]))
        return out

    def flush(self) -> tuple[list[tuple], int]:
        out = list(self.emitted)
        self.emitted.clear()
        out.extend((u, s[0], s[1], s[2]) for u, s in self.open.items())
        self.open.clear()
        return out, self.late_events


def streaming_sessionize(sf_dir: str, gap_s: int = 1800,
                         lateness_s: int = 600, n_buckets: int = 4):
    """Per-user sessionization via stateful bucket actors fed a
    ts-ordered stream, with watermark-driven INCREMENTAL session
    emission (a closed session leaves actor memory while the stream is
    still flowing — the property the batch shape can't offer).

    Returns (user_id, n_sessions, n_events) aggregated from the emitted
    session rows — equal to the batch window SQL
    (:func:`..pipelines.relational.events_sessionize_sql`) when no
    events are late (the driver feeds globally sorted batches, so none
    are).  Partitioning: ``user_id % n_buckets`` — one user's events
    always meet the same actor."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id"])
    ds = ds.sort("ts")  # ordered log (range-partitioned by time)

    actors = [SessionBucketActor.remote(gap_s * 1_000_000,
                                        lateness_s * 1_000_000)
              for _ in range(n_buckets)]
    sessions: list[tuple] = []

    for batch in ds.iter_batches(batch_size=8192, batch_format="pyarrow"):
        epoch = pc.cast(batch.column("ts"), pa.int64()).to_numpy()  # us
        users = pc.cast(batch.column("user_id"), pa.int64()).to_numpy()
        buckets = users % n_buckets
        pending = []
        for b in range(n_buckets):
            m = buckets == b
            if not m.any():
                continue
            pending.append(actors[b].ingest.remote(users[m].tolist(),
                                                   epoch[m].tolist()))
        ray.get(pending)
        for rows in ray.get([a.poll_finalized.remote() for a in actors]):
            sessions.extend(rows)

    for rows, _late in ray.get([a.flush.remote() for a in actors]):
        sessions.extend(rows)
    for a in actors:
        ray.kill(a)

    df = pd.DataFrame(sessions, columns=["user_id", "session_start",
                                         "session_end", "n_events"])
    out = (df.groupby("user_id", as_index=False)
           .agg(n_sessions=("session_start", "size"),
                n_events=("n_events", "sum")))
    return out.astype({"user_id": "int64", "n_sessions": "int64",
                       "n_events": "int64"})


def events_late_arrivals(sf_dir: str, lateness_s: int = 60,
                         coarse: int = 1024):
    """Late-event accounting under watermark semantics: replaying the
    stream in ARRIVAL order, each event is checked against the high
    watermark — the max EVENT TIME seen strictly before it — minus the
    allowed lateness; events older than that would be dropped (or
    side-outputted) by a streaming window operator.  This is the batch
    audit that sizes ``allowed_lateness`` before deploying the
    stateful-actor windows (:func:`streaming_tumbling_window`).

    The corpus's event_id order IS its time order (zero lateness), so
    arrival order is defined as the deterministic md5 permutation of
    event ids — a reproducible out-of-order network replay both
    engines derive identically (the :mod:`..sampling` md5-decision
    convention).

    The watermark is a distributed PREFIX MAX over that order: pass 1
    reduces per-bucket maxima keyed by the first md5 byte (256 rows on
    the driver at ANY corpus size — bucket-prefix order equals
    full-digest order), the driver folds them into exclusive incoming
    maxima, pass 2 co-locates each bucket and runs a vectorized
    shifted cummax over (digest, event_id).  The first arrival has no
    predecessor: watermark = -1 sentinel (never late), matching the
    SQL ``coalesce``.

    Output per event: (event_id, ts_us, watermark_us, late).
    """
    import hashlib

    import ray
    import ray.data

    from ..util import collect_small_arrow, process_cached, ref_key, \
        shuffle_partitions
    from .exact_agg import grouped_aggregate

    lateness_us = lateness_s * 1_000_000

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(i).encode()).hexdigest()
             for i in df["event_id"]]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            # explicit us cast: the source parquet unit must not leak
            # into the epoch integers (ns-unit files would come out 1000x)
            "ts_us": df["ts"].astype("datetime64[us]").astype("int64")
            .to_numpy(),
            "h": h,
            "bucket": np.array([int(x[:2], 16) for x in h], np.int64),
        })

    ev = (ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                columns=["event_id", "ts"])
          .map_batches(prep, batch_format="pandas")).materialize()

    bmax = collect_small_arrow(grouped_aggregate(
        ev, ["bucket"], [("ts_us", "max", "mx")],
        num_partitions=min(8, shuffle_partitions()))).to_pandas()
    bmax = bmax.sort_values("bucket")
    run = np.maximum.accumulate(bmax["mx"].to_numpy(np.int64))
    incoming = dict(zip(bmax["bucket"].astype(int),
                        np.concatenate(([np.int64(-1)], run[:-1]))))
    ref = ray.put(incoming)

    class Watermark:
        def __init__(self, r):
            self.incoming = ray.get(r)

        def __call__(self, g: pd.DataFrame) -> pd.DataFrame:
            outs = []
            for b, blk in g.groupby("bucket", sort=False):
                blk = blk.sort_values(["h", "event_id"], kind="mergesort")
                ts = blk["ts_us"].to_numpy(np.int64)
                seed = np.int64(self.incoming[int(b)])
                wm = np.concatenate(
                    ([seed], np.maximum.accumulate(
                        np.maximum(ts[:-1], seed))))
                outs.append(pd.DataFrame({
                    "event_id": blk["event_id"].to_numpy(np.int64),
                    "ts_us": ts,
                    "watermark_us": wm,
                    "late": ((wm >= 0) & (ts < wm - lateness_us))
                    .astype(np.int64)}))
            return pd.concat(outs, ignore_index=True)

    return (ev.groupby("bucket", num_partitions=shuffle_partitions())
            .map_groups(process_cached(Watermark,
                                       (ref_key(ref), lateness_us), ref),
                        batch_format="pandas"))


def events_late_arrivals_sql(lateness_s: int = 60) -> str:
    us = lateness_s * 1_000_000
    return f"""
WITH a AS (
  SELECT CAST(event_id AS BIGINT) AS event_id,
         CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         md5(CAST(event_id AS VARCHAR)) AS h
  FROM events),
w AS (
  SELECT event_id, ts_us,
         CAST(coalesce(max(ts_us) OVER (
                  ORDER BY h, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
              -1) AS BIGINT) AS watermark_us
  FROM a)
SELECT event_id, ts_us, watermark_us,
       CAST(CASE WHEN watermark_us >= 0
                  AND ts_us < watermark_us - {us}
                 THEN 1 ELSE 0 END AS BIGINT) AS late
FROM w"""
