"""Bloom-filter membership sketch + incremental dedup.

The 100 TB use case: dedup a NEW crawl against a prior corpus without
joining against it — build a bits-only summary of the old side once
(mergeable per-batch bitmaps, OR-combined through a small tree), then
filter the new side with a broadcast of the final bitmap.  No shuffle
touches either corpus; the exchange volume is ``m/8`` bytes per block
on the build side and zero on the probe side.

Guarantees: NO false negatives (a true duplicate is always dropped);
false positives (a new doc wrongly dropped) at the standard Bloom rate
``(1 - e^{-kn/m})^k`` — size ``m_bits`` for the expected old-side
cardinality.  Hashes are deterministic (double hashing off two fixed
64-bit mixes), so results are rerun-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash2(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit mixes (splitmix-style) for double hashing."""
    v = values.astype(np.uint64)

    def mix(x, c):
        x = (x ^ (x >> np.uint64(30))) * c
        x = (x ^ (x >> np.uint64(27))) * _MIX1
        return x ^ (x >> np.uint64(31))

    return mix(v, _MIX1), mix(v, _MIX2)


def _text_keys(texts: list[str]) -> np.ndarray:
    """Deterministic 64-bit content keys (first 8 bytes of sha256)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
         for t in texts), dtype=np.uint64, count=len(texts))


def _set_bits(bitmap: np.ndarray, keys: np.ndarray, k: int) -> None:
    m = np.uint64(len(bitmap) * 64)
    h1, h2 = _hash2(keys)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bitmap, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    m = np.uint64(len(bitmap) * 64)
    h1, h2 = _hash2(keys)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def build_bloom(docs_ds, m_bits: int = 1 << 20, k: int = 5) -> np.ndarray:
    """Distributed build: per-batch bitmap partial (one ``m/8``-byte row
    per block) -> OR-merge tree (per-partition, then one final task) ->
    final uint64 bitmap on the driver (bounded by ``m``, not data)."""
    from ..util import shuffle_partitions

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        _set_bits(bm, _text_keys(t.column("text").to_pylist()), k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def orr(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t.column("bm").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    rows = (docs_ds.map_batches(partial, batch_format="pyarrow")
            .repartition(min(8, shuffle_partitions()))
            .map_batches(orr, batch_format="pyarrow")
            .repartition(1)
            .map_batches(orr, batch_format="pyarrow")).take_all()
    return np.frombuffer(rows[0]["bm"], dtype=np.uint64).copy()


def incremental_dedup(new_ds, bloom: np.ndarray, k: int = 5):
    """Filter a new crawl against a prior corpus's Bloom bitmap: keep
    rows whose content key is NOT (probably) in the old corpus.  The
    bitmap broadcasts via ``ray.put`` once; probing is stateless
    vectorized bit tests per batch."""
    import ray

    from ..util import process_cached, ref_key

    ref = ray.put(bloom)

    class Probe:
        def __init__(self, r):
            self.bm = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = _text_keys(t.column("text").to_pylist())
            return t.filter(pa.array(~_test_bits(self.bm, keys, k)))

    return new_ds.map_batches(process_cached(Probe, (ref_key(ref), k), ref),
                              batch_format="pyarrow")


def synthesize_new_crawl(docs_ds):
    """Deterministic 'new crawl' over the documents corpus: 5% exact
    re-crawls (ids%100<5, text unchanged — must drop, no false
    negatives) + 5% revisions (ids%100>=95, ' [rev2]' appended — kept
    modulo the FP rate), ids shifted +1e6.  Mirrored verbatim by the
    ``bloom_accuracy`` SQL oracle's ``newc`` CTE."""
    def make_new(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dup = t.filter(pa.array(ids % 100 < 5))
        chg = t.filter(pa.array(ids % 100 >= 95))
        chg = chg.set_column(
            chg.schema.get_field_index("text"), "text",
            pa.array([x + " [rev2]" for x in
                      chg.column("text").to_pylist()], pa.string()))
        out = pa.concat_tables([dup, chg])
        new_ids = pa.array(out.column("doc_id").to_numpy() + 1_000_000,
                           pa.int64())
        return out.set_column(out.schema.get_field_index("doc_id"),
                              "doc_id", new_ids)

    return docs_ds.map_batches(make_new, batch_format="pyarrow")
