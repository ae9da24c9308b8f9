"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns
with sidecar metadata (mime, width/height or duration, sha256).  The
decode / feature-extract kernels are STUBBED (no image/audio libraries in
this container — clearly marked below); everything Ray-side is real and
tested: schema, actor-pool signature, batch sizing, zero-copy binary
handling, output layout.

Memory note (100 TB): binary payloads dominate block size — callers must
use a small ``batch_size`` (e.g. 32-128) and rely on the object store to
spill; blocks stay Arrow end-to-end (never pandas: object dtype copies).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("mime", pa.string()),
    ("payload", pa.binary()),
])

FEATURE_DIM = 16


def decode_image(payload: bytes) -> "np.ndarray":
    """STUB — real decode needs an image library not present in this
    container.  The pipeline plumbing uses :func:`fake_decode` instead."""
    raise NotImplementedError(
        "image decode requires an imaging library unavailable in this "
        "environment; wire a real decoder here in production")


def fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in 'decoded image': derive a fixed-size float
    vector from the payload bytes (stable across runs/actors)."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((FEATURE_DIM * 4) // len(h) + 1))[:FEATURE_DIM * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.float64(0xFFFFFFFF)).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: binary payload -> feature vector + metadata.

    ``__init__`` would load the decoder/model once per actor; the
    per-batch path is the real Arrow plumbing.
    """

    def __init__(self, use_real_decoder: bool = False):
        self.decode = decode_image if use_real_decoder else fake_decode

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = [self.decode(p) for p in payloads]
        shas = [hashlib.sha256(p).hexdigest() for p in payloads]
        sizes = [len(p) for p in payloads]
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "payload_sha256": pa.array(shas, pa.string()),
            "payload_bytes": pa.array(sizes, pa.int64()),
            "feature": pa.array([f.tolist() for f in feats],
                                pa.list_(pa.float32(), FEATURE_DIM)),
        })


class ImageResizer:
    """Actor-pool stage: decode -> resize -> re-encode (STUB kernels).

    The resize kernel itself needs an image library (not in this
    container): :func:`fake_resize` deterministically derives a
    target-sized byte payload so the Ray plumbing — small batches,
    binary in/binary out, per-actor setup — is real and testable.
    """

    def __init__(self, width: int = 64, height: int = 64,
                 use_real_decoder: bool = False):
        self.width = width
        self.height = height
        self.decode = decode_image if use_real_decoder else fake_decode

    def _fake_resize(self, payload: bytes) -> bytes:
        n = self.width * self.height
        h = hashlib.sha256(payload).digest()
        return (h * (n // len(h) + 1))[:n]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        resized = [self._fake_resize(p) for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "mime": batch.column("mime"),
            "payload": pa.array(resized, pa.binary()),
            "width": pa.array([self.width] * len(resized), pa.int32()),
            "height": pa.array([self.height] * len(resized), pa.int32()),
        })


class FrameSampler:
    """Actor-pool stage: sample every k-th 'frame' of a video payload.

    STUB decode: payloads are treated as concatenated fixed-size frame
    blocks; real codecs slot into ``__init__``.  Emits 1->N rows
    (media_id, frame_index, frame payload) — the row-expansion layout a
    real video pipeline needs.
    """

    def __init__(self, frame_bytes: int = 256, every_k: int = 2):
        self.frame_bytes = frame_bytes
        self.every_k = every_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, payload in zip(batch.column("media_id").to_pylist(),
                                batch.column("payload").to_pylist()):
            n_frames = max(1, len(payload) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_k):
                ids.append(mid)
                idxs.append(fi)
                frames.append(
                    payload[fi * self.frame_bytes:(fi + 1) * self.frame_bytes])
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "frame_index": pa.array(idxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_dataset_from_documents(sf_dir: str):
    """Synthesize a media table by treating document text bytes as opaque
    payloads (the plumbing-level stand-in for real image bytes)."""
    import ray.data

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["application/octet-stream"] * len(ids), pa.string()),
            "payload": pa.array([t.encode("utf-8") for t in texts], pa.binary()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return ds.map_batches(f, batch_format="pyarrow")


def media_features(media_ds, batch_size: int = 64, concurrency=None):
    """The featurize stage: small batches (binary payloads), actor pool."""
    from ..util import default_pool

    return media_ds.map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency or default_pool())
