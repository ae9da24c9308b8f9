"""Count-Min sketch: mergeable approximate frequency counts.

The streaming-frequency member of the sketch family (HLL = distinct,
quantile centroids = ranks, Bloom = membership, Misra-Gries = top-k):
a (d x w) counter grid where each item increments one counter per row
(row-specific hash); the estimate is the MIN over rows.  Structural
guarantees (Cormode & Muthukrishnan 2005):

- NEVER an underestimate: est(x) >= true(x) always (only collisions add);
- est(x) <= true(x) + (e/w) * N with probability >= 1 - e^-d per query
  (N = total stream weight).

Mergeability is elementwise ADDITION, so the Ray shape is the same as
the HLL sketches (``constraints.distinct_sketch``): one serialized grid
per batch, driver-side sum of the (d*w*8)-byte blobs — counters only,
never term strings, cross the wire.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# distinct odd multipliers per row (splitmix64-flavored finalizer mixes)
_ROW_MULT = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                      0x94D049BB133111EB, 0xD6E8FEB86659FD93,
                      0xA5A5A5A5A5A5A5A5, 0xC2B2AE3D27D4EB4F],
                     dtype=np.uint64)


class CountMinSketch:
    def __init__(self, w: int = 4096, d: int = 4):
        if d > len(_ROW_MULT):
            raise ValueError(f"d <= {len(_ROW_MULT)}")
        self.w, self.d = w, d
        self.table = np.zeros((d, w), dtype=np.int64)

    def _row_idx(self, h: np.ndarray, r: int) -> np.ndarray:
        x = h * _ROW_MULT[r]
        x ^= x >> np.uint64(29)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(32)
        return (x % np.uint64(self.w)).astype(np.int64)

    def add_hashed(self, h: np.ndarray, counts: np.ndarray) -> None:
        for r in range(self.d):
            np.add.at(self.table[r], self._row_idx(h, r),
                      counts.astype(np.int64))

    def estimate_hashed(self, h: np.ndarray) -> np.ndarray:
        return np.min(np.stack([self.table[r][self._row_idx(h, r)]
                                for r in range(self.d)]), axis=0)

    def merge_blob(self, blob: bytes) -> None:
        self.table += np.frombuffer(blob, dtype=np.int64).reshape(
            self.d, self.w)

    def to_blob(self) -> bytes:
        return self.table.tobytes()


def _term_hash(terms) -> np.ndarray:
    """Deterministic cross-process 64-bit term hashes (pandas SipHash
    with its fixed key — the same family ``constraints._hash64`` uses)."""
    return pd.util.hash_array(np.asarray(list(terms), dtype=object)) \
        .astype(np.uint64)


def term_cms_sketch(docs_ds, w: int = 4096, d: int = 4) -> CountMinSketch:
    """One merged CMS over all lowercased ``\\w+`` terms of the corpus:
    per-batch local term counts feed a per-batch sketch; only the
    (d x w x 8)-byte grids leave the workers (HLL blob pattern)."""
    from .text import WORD_RE

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        counts = pd.Series(np.concatenate(toks.to_numpy())
                           if len(toks) else [], dtype=object) \
            .value_counts()
        sk = CountMinSketch(w, d)
        if len(counts):
            sk.add_hashed(_term_hash(counts.index),
                          counts.to_numpy(dtype=np.int64))
        return pd.DataFrame({"grid": [sk.to_blob()]})

    def pre_merge(batch: pd.DataFrame) -> pd.DataFrame:
        # worker-side tree level: up to 64 per-batch grids -> 1, so the
        # driver ingests blocks/64 blobs instead of one per input batch
        sk = CountMinSketch(w, d)
        for blob in batch["grid"]:
            sk.merge_blob(blob)
        return pd.DataFrame({"grid": [sk.to_blob()]})

    parts = (docs_ds.map_batches(partial, batch_format="pandas")
             .map_batches(pre_merge, batch_format="pandas",
                          batch_size=64))
    merged = CountMinSketch(w, d)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b.column("grid").to_pylist():
            merged.merge_blob(blob)
    return merged
