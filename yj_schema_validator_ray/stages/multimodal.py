"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns
with sidecar metadata (mime, width/height or duration, sha256).
UNCOMPRESSED image formats decode natively with pure numpy (PPM P6,
24/32-bit BMP — :func:`decode_image`), with real nearest-neighbor resize
and a real 16-dim feature; COMPRESSED formats (PNG/JPEG) need a codec
library this container lacks and raise NotImplementedError (a
deterministic stand-in keeps the Ray plumbing exercised on any input).
Schema, actor-pool signature, batch sizing, zero-copy binary handling,
and output layout are real and tested either way.

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


def _decode_ppm_p6(payload: bytes) -> np.ndarray:
    """Binary PPM (P6): pure-numpy header parse + pixel view."""
    pos, tokens = 2, []
    n = len(payload)
    while len(tokens) < 3 and pos < n:
        while pos < n and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":  # comment to end of line
            while pos < n and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    need = w * h * 3
    arr = np.frombuffer(payload, dtype=np.uint8, count=need, offset=pos)
    return arr.reshape(h, w, 3).copy()


def _decode_bmp(payload: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BMP: header fields + strided row gather."""
    if len(payload) < 54:
        raise ValueError("truncated BMP")
    data_off = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    comp = int.from_bytes(payload[30:34], "little")
    if bpp not in (24, 32) or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={comp})")
    flip = h > 0  # positive height = bottom-up row order
    h = abs(h)
    nbytes = bpp // 8
    stride = (w * nbytes + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                         offset=data_off).reshape(h, stride)
    px = rows[:, :w * nbytes].reshape(h, w, nbytes)
    if flip:
        px = px[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(px[:, :, 2::-1])


def decode_image(payload: bytes) -> np.ndarray:
    """Real pure-numpy decode of UNCOMPRESSED formats — PPM (P6) and
    24/32-bit BMP — to an (h, w, 3) uint8 array.  Compressed formats
    (PNG/JPEG) need a codec library that is not in this container and
    raise NotImplementedError (wire a real codec here in production)."""
    if payload[:2] == b"P6":
        return _decode_ppm_p6(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise NotImplementedError(
        "compressed image decode (PNG/JPEG/...) requires a codec library "
        "unavailable in this environment; PPM(P6)/BMP decode natively")


def encode_ppm(arr: np.ndarray) -> bytes:
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.astype(np.uint8).tobytes()


def resize_nearest(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize — two index gathers, no loops."""
    h, w = arr.shape[:2]
    yi = (np.arange(height) * h // height).clip(max=h - 1)
    xi = (np.arange(width) * w // width).clip(max=w - 1)
    return arr[yi][:, xi]


def image_features(arr: np.ndarray) -> np.ndarray:
    """Deterministic 16-dim feature of a decoded image: per-channel
    mean/std + 3x3 nearest-downsampled grayscale + aspect ratio."""
    a = arr.astype(np.float64) / 255.0
    gray = a.mean(axis=2)
    blocks = resize_nearest((gray[..., None] * 255).astype(np.uint8), 3, 3)
    return np.concatenate([
        a.mean(axis=(0, 1)), a.std(axis=(0, 1)),
        (blocks[..., 0].astype(np.float64) / 255.0).reshape(-1),
        [arr.shape[1] / arr.shape[0]],
    ]).astype(np.float32)


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
        if use_real_decoder:
            self.decode = lambda p: image_features(decode_image(p))
        else:
            self.decode = fake_decode

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
    """Actor-pool stage: decode -> nearest-neighbor resize -> re-encode.

    REAL for natively decodable payloads (PPM P6 / uncompressed BMP by
    magic bytes): numpy decode + gather resize + PPM re-encode.
    Non-decodable payloads (compressed formats need a codec library this
    container lacks) fall back to a deterministic stand-in so the Ray
    plumbing — small batches, binary in/binary out, per-actor setup —
    stays exercised on any input.
    """

    def __init__(self, width: int = 64, height: int = 64):
        self.width = width
        self.height = height

    def _fake_resize(self, payload: bytes) -> bytes:
        n = self.width * self.height
        h = hashlib.sha256(payload).digest()
        return (h * (n // len(h) + 1))[:n]

    def _resize_one(self, payload: bytes) -> tuple[bytes, str]:
        if payload[:2] in (b"P6", b"BM"):
            arr = resize_nearest(decode_image(payload), self.width, self.height)
            return encode_ppm(arr), "image/x-portable-pixmap"
        return self._fake_resize(payload), "application/octet-stream"

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out = [self._resize_one(p) for p in payloads]
        return pa.table({
            "media_id": batch.column("media_id"),
            "mime": pa.array([m for _, m in out], pa.string()),
            "payload": pa.array([p for p, _ in out], pa.binary()),
            "width": pa.array([self.width] * len(out), pa.int32()),
            "height": pa.array([self.height] * len(out), pa.int32()),
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
