"""Multimodal columns: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as Arrow ``binary`` columns
with sidecar metadata (mime, width/height or duration, sha256).
PPM P6, 24/32-bit BMP, 8-bit non-interlaced PNG (stdlib zlib + numpy
scanline unfiltering, all five filter types) and baseline sequential
JPEG (pure-numpy Huffman + batched-matmul IDCT, stages/jpeg.py) all
decode natively with pure numpy (:func:`decode_image`), with real
nearest-neighbor resize and a real 16-dim feature; formats beyond
those (progressive JPEG, GIF, TIFF, any audio/video codec) need a
codec library this container lacks and raise NotImplementedError
(a deterministic stand-in keeps the Ray plumbing exercised on any
input).  Schema, actor-pool signature, batch sizing, zero-copy binary
handling, and output layout are real and tested either way.

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _decode_png(payload: bytes) -> np.ndarray:
    """REAL PNG decode with stdlib ``zlib`` + numpy scanline unfiltering
    (no codec library needed): 8-bit depth, color types 0/2/3/4/6,
    non-interlaced; all five filter types (None/Sub/Up/Average/Paeth,
    RFC 2083 §6).  Sub rows unfilter as a vectorized per-channel
    modular cumsum and Up rows as one vector add; Average/Paeth carry a
    true left-pixel dependency, so those rows walk pixels with
    channel-vector steps."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("bad PNG signature")
    pos, idat, plte = 8, [], None
    w = h = ctype = None
    n = len(payload)
    while pos + 8 <= n:
        ln = int.from_bytes(payload[pos:pos + 4], "big")
        typ = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w, h, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
                raise NotImplementedError(
                    "PNG decode supports 8-bit non-interlaced images only")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    rows = raw.reshape(h, stride + 1)
    ftypes = rows[:, 0]
    filt_rows = rows[:, 1:].astype(np.int32)
    recon = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f, row = int(ftypes[y]), filt_rows[y]
        if f == 0:
            cur = row
        elif f == 1:  # Sub: modular prefix sum per channel lane
            cur = np.cumsum(row.reshape(w, ch), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f in (3, 4):
            cur = np.empty(stride, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            upleft = np.zeros(ch, dtype=np.int32)
            for x in range(0, stride, ch):
                up = prev[x:x + ch]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    p = left + up - upleft
                    da, db, dc = (np.abs(p - left), np.abs(p - up),
                                  np.abs(p - upleft))
                    pred = np.where((da <= db) & (da <= dc), left,
                                    np.where(db <= dc, up, upleft))
                left = (row[x:x + ch] + pred) % 256
                cur[x:x + ch] = left
                upleft = up
        else:
            raise ValueError(f"bad PNG filter type {f}")
        recon[y] = cur
        prev = cur
    px = recon.astype(np.uint8).reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        return plte[px[:, :, 0]]
    if ch == 1:
        return np.repeat(px, 3, axis=2)
    if ch == 2:  # gray + alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return np.ascontiguousarray(px[:, :, :3])  # RGB / RGBA minus alpha


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    crc = zlib.crc32(typ + data) & 0xFFFFFFFF
    return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(4, "big")


def encode_png(arr: np.ndarray, filter_type: int = 4) -> bytes:
    """Minimal real PNG encoder (8-bit RGB, one filter type for every
    row).  Filtering is fully vectorized — unlike decode, the filter
    predictors read ORIGINAL pixels, so there is no sequential
    dependency.  Exists so tests and pipelines can synthesize valid
    PNGs exercising every unfilter path."""
    import struct
    import zlib

    a = np.ascontiguousarray(arr.astype(np.uint8))
    h, w = a.shape[:2]
    flat = a.reshape(h, w * 3).astype(np.int32)
    left = np.zeros_like(flat)
    left[:, 3:] = flat[:, :-3]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, 3:] = flat[:-1, :-3]
    if filter_type == 0:
        filt = flat
    elif filter_type == 1:
        filt = flat - left
    elif filter_type == 2:
        filt = flat - up
    elif filter_type == 3:
        filt = flat - ((left + up) >> 1)
    elif filter_type == 4:
        p = left + up - upleft
        da, db, dc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        pred = np.where((da <= db) & (da <= dc), left,
                        np.where(db <= dc, up, upleft))
        filt = flat - pred
    else:
        raise ValueError(f"bad filter type {filter_type}")
    body = (filt % 256).astype(np.uint8)
    scan = np.empty((h, w * 3 + 1), dtype=np.uint8)
    scan[:, 0] = filter_type
    scan[:, 1:] = body
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scan.tobytes()))
            + _png_chunk(b"IEND", b""))


def decode_image(payload: bytes) -> np.ndarray:
    """Real pure-numpy decode — PPM (P6), 24/32-bit BMP, 8-bit
    non-interlaced PNG (stdlib zlib inflate + numpy scanline
    unfiltering), and baseline sequential JPEG (pure-numpy Huffman +
    IDCT, see stages/jpeg.py) — to an (h, w, 3) uint8 array."""
    if payload[:2] == b"P6":
        return _decode_ppm_p6(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:8] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise NotImplementedError(
        "unsupported image format (PPM P6 / BMP / PNG / baseline JPEG "
        "decode natively; progressive JPEG, GIF, TIFF etc. need a codec "
        "library unavailable in this environment)")


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
        if (payload[:2] in (b"P6", b"BM", b"\xff\xd8")
                or payload[:8] == _PNG_SIG):
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


def png_dataset_from_documents(sf_dir: str, size: int = 8):
    """Synthesize a REAL PNG per document: an 8x8 RGB gradient with
    pixel(y, x, c) = (doc_id*7 + y*8 + x + 97*c) % 256, encoded with
    filter type doc_id % 5 — every row of the corpus exercises one of
    the five PNG unfilter paths, and the pixel pattern has a closed
    form a SQL oracle can integrate over."""
    import ray.data

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        grid = np.arange(size * size, dtype=np.int64).reshape(size, size)
        chan = 97 * np.arange(3, dtype=np.int64)
        payloads = []
        for did in ids:
            arr = (int(did) * 7 + grid[..., None] + chan) % 256
            payloads.append(encode_png(arr.astype(np.uint8),
                                       filter_type=int(did) % 5))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["image/png"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return ds.map_batches(f, batch_format="pyarrow")


class PngPixelStats:
    """Decode REAL PNGs and emit exact integer pixel projections:
    (width, height, per-channel pixel sum) — the integer numerators of
    the 16-dim feature's per-channel means (mean_c = px_sum_c/(w*h*255))
    in a hash-safe form.  Any unfiltering error anywhere in the image
    perturbs the sums, so a SQL oracle over the closed-form pattern
    certifies the decode byte-for-byte."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        out_w, out_h, sums = [], [], []
        for payload in batch.column("payload").to_pylist():
            arr = decode_image(payload)
            out_h.append(arr.shape[0])
            out_w.append(arr.shape[1])
            sums.append(arr.sum(axis=(0, 1), dtype=np.int64))
        s = (np.stack(sums) if sums
             else np.zeros((0, 3), dtype=np.int64))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(out_w, pa.int32()),
            "height": pa.array(out_h, pa.int32()),
            "px_sum_r": pa.array(s[:, 0], pa.int64()),
            "px_sum_g": pa.array(s[:, 1], pa.int64()),
            "px_sum_b": pa.array(s[:, 2], pa.int64()),
        })


def png_pixel_stats_sql(size: int = 8) -> str:
    """Closed-form oracle: pixel(y,x,c) = (doc_id*7 + (y*8+x) + 97c) % 256
    summed over the grid (y*8+x ranges 0..63)."""
    n = size * size - 1
    sums = ", ".join(
        f"CAST(sum((d.doc_id * 7 + s.i + {97 * c}) % 256) AS BIGINT) "
        f"AS px_sum_{ch}"
        for c, ch in enumerate("rgb"))
    return f"""
SELECT d.doc_id AS media_id,
       CAST({size} AS INTEGER) AS width, CAST({size} AS INTEGER) AS height,
       {sums}
FROM documents d
CROSS JOIN (SELECT unnest(generate_series(0, {n})) AS i) s
GROUP BY d.doc_id"""


def jpeg_dataset_from_documents(sf_dir: str, size: int = 16):
    """Synthesize a REAL baseline JPEG per document: a 16x16 grayscale
    image of four constant 8x8 blocks with level(doc_id, bi) =
    (doc_id*13 + bi*53) % 256, restart interval doc_id % 3 (0 = none) —
    with the DC quantization step of 8 the decode reproduces the levels
    BIT-EXACTLY (flat blocks are DC-only; see stages/jpeg.py), so a
    closed-form SQL oracle certifies the full Huffman/dequant/IDCT
    chain, including the RSTn restart paths, byte-for-byte."""
    import ray.data

    from .jpeg import encode_jpeg

    nb = size // 8

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        bi = (np.arange(nb * nb).reshape(nb, nb))
        payloads = []
        for did in ids:
            levels = (int(did) * 13 + bi * 53) % 256
            arr = np.repeat(np.repeat(levels, 8, axis=0), 8,
                            axis=1).astype(np.uint8)
            payloads.append(encode_jpeg(arr, restart_interval=int(did) % 3))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["image/jpeg"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return ds.map_batches(f, batch_format="pyarrow")


def jpeg_pixel_stats_sql(size: int = 16) -> str:
    """Closed-form oracle for :func:`jpeg_dataset_from_documents`:
    64 pixels per block at level (doc_id*13 + bi*53) % 256, replicated
    across the three output channels (grayscale decode)."""
    nb = size // 8
    total = ", ".join(
        f"CAST(sum(64 * ((d.doc_id * 13 + b.bi * 53) % 256)) AS BIGINT) "
        f"AS px_sum_{ch}" for ch in "rgb")
    return f"""
SELECT d.doc_id AS media_id,
       CAST({size} AS INTEGER) AS width, CAST({size} AS INTEGER) AS height,
       {total}
FROM documents d
CROSS JOIN (SELECT unnest(generate_series(0, {nb * nb - 1})) AS bi) b
GROUP BY d.doc_id"""


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


# ---------------------------------------------------------------------------
# perceptual-hash image dedup
# ---------------------------------------------------------------------------

def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG/pHash transform)."""
    k = np.arange(n, dtype=np.float64)
    m = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] /= np.sqrt(2)
    return m * np.sqrt(2.0 / n)


def phash64(stack: np.ndarray) -> np.ndarray:
    """Batched pHash of decoded (N, h, w, 3) uint8 images: integer luma
    -> 2-D DCT -> drop DC -> median threshold -> 63-bit signature in an
    int64.  A pure brightness shift or any re-encode (different PNG
    filter, PPM/BMP transcode) leaves the signature unchanged — the
    content-addressed identity byte hashing cannot give."""
    if stack.size == 0:
        return np.zeros(0, np.int64)
    lum = (299 * stack[..., 0].astype(np.int64)
           + 587 * stack[..., 1].astype(np.int64)
           + 114 * stack[..., 2].astype(np.int64)) // 1000
    h, w = lum.shape[1], lum.shape[2]
    d_h, d_w = _dct_matrix(h), _dct_matrix(w)
    coef = np.einsum("ij,njk,lk->nil", d_h, lum.astype(np.float64), d_w)
    flat = coef.reshape(coef.shape[0], -1)[:, 1:]  # drop DC
    med = np.median(flat, axis=1, keepdims=True)
    bits = (flat > med).astype(np.uint64)
    weights = np.uint64(1) << np.arange(flat.shape[1], dtype=np.uint64)
    return (bits * weights[None, :]).sum(axis=1).astype(np.int64)


class PngPhash:
    """Actor/process stage: decode PNG payloads, emit (media_id, phash).
    Decode state (zlib, unfilter tables) is per-process; the DCT basis
    is built once per instance."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        arrs = [decode_image(p) for p in
                batch.column("payload").to_pylist()]
        stack = (np.stack(arrs) if arrs
                 else np.zeros((0, 1, 1, 3), np.uint8))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "phash": pa.array(phash64(stack)),
        })


def media_phash_groups(sf_dir: str):
    """Perceptual-hash image dedup certificate: decode every synthetic
    PNG, pHash it, and account (congruence class k = doc_id % 256,
    distinct-pHash count).  The generator's pixel pattern depends on
    doc_id ONLY through doc_id % 256 while the PNG filter type cycles
    mod 5 — same-class images are pixel-identical but byte-DIFFERENT,
    so sha/byte dedup cannot group them and the pipeline must prove
    decode -> pHash collapses every class to exactly ONE signature
    (n_phash = 1 is the oracled certificate, the simhash-style
    constant-column pattern).

    Shape: decode + hash per batch (process-cached stage), per-batch
    (k, phash) distinct partials, one domain-sized exchange, per-class
    distinct count — payload bytes never cross the wire.
    """
    from ..stages.exact_agg import grouped_aggregate
    from ..util import process_cached

    hashed = png_dataset_from_documents(sf_dir).map_batches(
        process_cached(PngPhash, ()), batch_format="pyarrow",
        batch_size=256)

    def kclass(t: pa.Table) -> pa.Table:
        mid = t.column("media_id").to_numpy()
        return pa.table({
            "k": pa.array(mid % 256),
            "phash": t.column("phash"),
        })

    pairs = grouped_aggregate(
        hashed.map_batches(kclass, batch_format="pyarrow"),
        ["k", "phash"], [("", "count", "n_docs")])

    return grouped_aggregate(
        pairs, ["k"],
        [("n_docs", "sum", "n_docs"), ("", "count", "n_phash")])


def media_phash_groups_sql() -> str:
    return """
SELECT CAST(doc_id % 256 AS BIGINT) AS k,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(1 AS BIGINT) AS n_phash
FROM documents GROUP BY doc_id % 256"""
