"""Pure-numpy baseline JPEG codec (ITU T.81 sequential DCT).

No codec library exists in this container, so both halves are
implemented from the public spec: the ENCODER synthesizes real JFIF
bitstreams for tests/pipelines (grayscale or YCbCr 4:4:4, canonical
Huffman tables emitted as generic DHT segments, optional restart
markers); the DECODER handles baseline sequential JPEG (SOF0):
1- or 3-component scans, sampling factors 1-2 per axis (4:4:4 /
4:2:2 / 4:2:0), generic DQT/DHT parsing, byte-unstuffing, DRI/RSTn
restart intervals, batched-matmul IDCT.

Exactness lever for oracles: a per-8x8-block CONSTANT grayscale image
quantized with a DC step of 8 round-trips bit-exactly — FDCT of a flat
block is DC-only (AC ~ 1e-13 quantizes to 0), DC = 8*(level-128)
divides the step exactly, and the IDCT reproduces the level — so one
closed-form SQL expression certifies the full chain (bit packing,
Huffman decode, dequant, IDCT, level shift) byte-for-byte.

The reference (`alexmond/yj-schema-validator`) has no media path at
all; this exists for the LLM-data-pipeline surface (multimodal decode
as an actor-pool `map_batches` stage, see stages/multimodal.py).
"""

from __future__ import annotations

import struct

import numpy as np


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis (T.81 A.3.3 scaling)."""
    x = np.arange(8, dtype=np.float64)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(0.25)
    c[0] = np.sqrt(0.125)
    return c


_C = _dct_matrix()

# zigzag scan: anti-diagonals d = row+col, odd d walks rows ascending
_ZZ = np.array(
    [r * 8 + (d - r)
     for d in range(15)
     for r in (range(max(0, d - 7), min(d, 7) + 1) if d % 2
               else reversed(range(max(0, d - 7), min(d, 7) + 1)))],
    dtype=np.int64)

# default quantization tables: DC step 8 (exact for flat blocks), flat
# AC step 16 — deliberately simple; any 1..255 entries are valid DQT
DEFAULT_QTAB_LUMA = np.array([8] + [16] * 63, dtype=np.uint8)
DEFAULT_QTAB_CHROMA = np.array([8] + [24] * 63, dtype=np.uint8)


# ---------------------------------------------------------------------------
# Huffman tables: single-length canonical codes (simple, always valid)
# ---------------------------------------------------------------------------

def _canonical_table(symbols: list[int], length: int):
    """BITS/HUFFVAL for a one-length canonical code; requires
    len(symbols) < 2**length so the all-ones code stays reserved."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    codes = {sym: (length, i) for i, sym in enumerate(symbols)}
    return bits, list(symbols), codes


_DC_SYMBOLS = list(range(12))
_AC_SYMBOLS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                              for s in range(1, 11)]
_DC_BITS, _DC_VALS, _DC_CODES = _canonical_table(_DC_SYMBOLS, 4)
_AC_BITS, _AC_VALS, _AC_CODES = _canonical_table(_AC_SYMBOLS, 8)


class _BitWriter:
    """MSB-first bit packer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        if n == 0:
            return
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: (category, value-bits)."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    return size, (v if v >= 0 else v + (1 << size) - 1)


def _encode_blocks(writer: _BitWriter, qblocks: np.ndarray, pred: int,
                   dc_codes, ac_codes) -> int:
    """Entropy-encode zigzagged quantized blocks (n, 64); returns the
    final DC predictor."""
    for blk in qblocks:
        size, bits = _magnitude(int(blk[0]) - pred)
        pred = int(blk[0])
        ln, code = dc_codes[size]
        writer.write(code, ln)
        writer.write(bits, size)
        nz = np.nonzero(blk[1:])[0]
        prev = 0
        for i in nz:
            run = int(i) - prev
            prev = int(i) + 1
            while run >= 16:
                ln, code = ac_codes[0xF0]
                writer.write(code, ln)
                run -= 16
            size, bits = _magnitude(int(blk[1 + i]))
            ln, code = ac_codes[(run << 4) | size]
            writer.write(code, ln)
            writer.write(bits, size)
        if prev < 63:
            ln, code = ac_codes[0x00]
            writer.write(code, ln)
    return pred


def _fdct_quant(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, 8x8 FDCT, quantize, zigzag -> (by, bx, 64) int32."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .astype(np.float64) - 128.0)
    coef = np.einsum("ij,byjk,lk->byil", _C, blocks, _C, optimize=True)
    q = np.round(coef / qtab.astype(np.float64).reshape(8, 8))
    return q.reshape(by, bx, 64)[:, :, _ZZ].astype(np.int32)


def _pad_to_multiple(plane: np.ndarray, my: int, mx: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % my
    pw = (-w) % mx
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _dht_segment(tclass: int, tid: int, bits: list[int],
                 vals: list[int]) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt_segment(tid: int, qtab: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(qtab.tolist())  # zigzag order on the wire
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def rgb_to_ycbcr(arr: np.ndarray) -> np.ndarray:
    """JFIF color transform, float -> rounded uint8 planes."""
    a = arr.astype(np.float64)
    y = 0.299 * a[..., 0] + 0.587 * a[..., 1] + 0.114 * a[..., 2]
    cb = 128.0 - 0.168735892 * a[..., 0] - 0.331264108 * a[..., 1] \
        + 0.5 * a[..., 2]
    cr = 128.0 + 0.5 * a[..., 0] - 0.418687589 * a[..., 1] \
        - 0.081312411 * a[..., 2]
    return np.clip(np.round(np.stack([y, cb, cr], axis=-1)), 0,
                   255).astype(np.uint8)


def encode_jpeg(arr: np.ndarray, qtab_luma: np.ndarray = DEFAULT_QTAB_LUMA,
                qtab_chroma: np.ndarray = DEFAULT_QTAB_CHROMA,
                restart_interval: int = 0,
                subsampling: str = "444") -> bytes:
    """Baseline JFIF encoder: (h, w) grayscale or (h, w, 3) RGB
    (converted to YCbCr; ``subsampling`` "444" or "420").  ``qtab_*``
    are zigzag-ordered 64-entry uint8 tables.  ``restart_interval`` > 0
    emits DRI + RSTn markers every that many MCUs (exercises the
    decoder's restart path)."""
    a = np.asarray(arr, dtype=np.uint8)
    gray = a.ndim == 2 or a.shape[2] == 1
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub = 2 if (subsampling == "420" and not gray) else 1
    if gray:
        planes = [a.reshape(a.shape[0], a.shape[1])]
        samps = [(1, 1)]
    else:
        ycc = rgb_to_ycbcr(a)
        planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
        samps = [(sub, sub), (1, 1), (1, 1)]
        if sub == 2:
            for ci in (1, 2):
                p = _pad_to_multiple(planes[ci], 2, 2).astype(np.float64)
                planes[ci] = np.clip(np.round(
                    (p[0::2, 0::2] + p[0::2, 1::2]
                     + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0),
                    0, 255).astype(np.uint8)
    h, w = a.shape[:2]
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    qtabs = [qtab_luma] + ([qtab_chroma] if not gray else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    for tid, q in enumerate(qtabs):
        out += _dqt_segment(tid, np.asarray(q, dtype=np.uint8))
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hs, vs = samps[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, min(ci, 1)])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    qblocks = []
    for ci, plane in enumerate(planes):
        hs, vs = samps[ci]
        ph, pw = mcuy * 8 * vs, mcux * 8 * hs
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge") if plane.shape != (ph, pw) else plane
        qblocks.append(_fdct_quant(p, _dezigzag_qtab(qtabs[min(ci, 1)])))

    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    writer = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    for mi, (my, mx) in enumerate((y, x) for y in range(mcuy)
                                  for x in range(mcux)):
        if restart_interval and mi and mi % restart_interval == 0:
            writer.flush()
            out += writer.buf
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) & 7
            writer = _BitWriter()
            preds = [0] * ncomp
        for ci in range(ncomp):
            hs, vs = samps[ci]
            for v in range(vs):
                for hh in range(hs):
                    preds[ci] = _encode_blocks(
                        writer, qblocks[ci][my * vs + v, mx * hs + hh][None, :],
                        preds[ci], _DC_CODES, _AC_CODES)
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _dezigzag_qtab(qtab) -> np.ndarray:
    """Zigzag-ordered 64-entry table -> natural-order (8, 8)."""
    nat = np.empty(64, dtype=np.float64)
    nat[_ZZ] = np.asarray(qtab, dtype=np.float64)
    return nat.reshape(8, 8)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _HuffDecoder:
    """Canonical Huffman decode table from a DHT's BITS/HUFFVAL."""

    def __init__(self, bits: bytes, vals: bytes):
        self.lut = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lut[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, bitbuf: np.ndarray, pos: int) -> tuple[int, int]:
        code, ln = 0, 0
        lut = self.lut
        n = bitbuf.shape[0]
        while ln < 16:
            if pos >= n:
                raise ValueError("truncated entropy data")
            code = (code << 1) | int(bitbuf[pos])
            pos += 1
            ln += 1
            sym = lut.get((ln, code))
            if sym is not None:
                return sym, pos
        raise ValueError("invalid Huffman code")


def _receive_extend(bitbuf: np.ndarray, pos: int, size: int) -> tuple[int, int]:
    if size == 0:
        return 0, pos
    if pos + size > bitbuf.shape[0]:
        raise ValueError("truncated entropy data")
    v = 0
    for i in range(size):
        v = (v << 1) | int(bitbuf[pos + i])
    pos += size
    if v < (1 << (size - 1)):
        v -= (1 << size) - 1
    return v, pos


def _split_scan(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data -> unstuffed restart intervals; returns the
    segments and the offset of the terminating marker."""
    segs, cur = [], bytearray()
    i, n = start, len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline sequential JPEG -> (h, w, 3) uint8 RGB.  Supports 1- or
    3-component interleaved scans, per-axis sampling factors 1-2,
    generic DQT/DHT, DRI/RSTn.  Grayscale replicates to 3 channels
    (matches the PNG gray path in stages/multimodal.py)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("bad JPEG signature")
    qtabs: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffDecoder] = {}
    ac_tabs: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    comps = None  # list of (cid, hsamp, vsamp, qid)
    h = w = None
    i = 2
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            raise ValueError("marker expected")
        marker = payload[i + 1]
        if marker == 0xD9:  # EOI
            break
        ln = int.from_bytes(payload[i + 2:i + 4], "big")
        seg = payload[i + 4:i + 2 + ln]
        i += 2 + ln
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                if prec:
                    raise NotImplementedError("16-bit DQT")
                qtabs[tid] = _dezigzag_qtab(np.frombuffer(
                    seg, np.uint8, 64, p + 1))
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1 (both Huffman seq.)
            depth, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if depth != 8:
                raise NotImplementedError("only 8-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    raise NotImplementedError("sampling factors 1-2 only")
                comps.append((cid, hs, vs, qid))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError("baseline sequential JPEG only")
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tclass, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = seg[p + 1:p + 17]
                nv = sum(bits)
                vals = seg[p + 17:p + 17 + nv]
                (dc_tabs if tclass == 0 else ac_tabs)[tid] = \
                    _HuffDecoder(bits, vals)
                p += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            if comps is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(payload, i, h, w, comps, scan_tabs,
                                qtabs, dc_tabs, ac_tabs, restart_interval)
        # APPn / COM / others: skipped
    raise ValueError("JPEG missing SOS")


def _decode_scan(payload, start, h, w, comps, scan_tabs, qtabs,
                 dc_tabs, ac_tabs, restart_interval) -> np.ndarray:
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    nmcu = mcux * mcuy
    # per-component zigzag coefficient stores (by, bx, 64)
    stores = []
    for cid, hs, vs, qid in comps:
        stores.append(np.zeros((mcuy * vs, mcux * hs, 64), dtype=np.int32))

    segs, _ = _split_scan(payload, start)
    bitbufs = [np.unpackbits(np.frombuffer(s, np.uint8)) for s in segs]

    interval = restart_interval or nmcu
    mcu = 0
    for bitbuf in bitbufs:
        pos = 0
        preds = [0] * len(comps)
        end = min(mcu + interval, nmcu)
        while mcu < end:
            my, mx = divmod(mcu, mcux)
            for ci, (cid, hs, vs, qid) in enumerate(comps):
                dct, act = scan_tabs[cid]
                dc_dec, ac_dec = dc_tabs[dct], ac_tabs[act]
                for v in range(vs):
                    for hh in range(hs):
                        blk = stores[ci][my * vs + v, mx * hs + hh]
                        size, pos = dc_dec.decode(bitbuf, pos)
                        diff, pos = _receive_extend(bitbuf, pos, size)
                        preds[ci] += diff
                        blk[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym, pos = ac_dec.decode(bitbuf, pos)
                            if sym == 0x00:
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0 and run != 15:
                                raise ValueError("bad AC symbol")
                            k += run
                            if size:
                                if k > 63:
                                    raise ValueError("AC index overflow")
                                val, pos = _receive_extend(bitbuf, pos, size)
                                blk[k] = val
                                k += 1
                            else:
                                k += 1  # ZRL consumed 16 zeros
            mcu += 1
        if mcu >= nmcu:
            break

    planes = []
    for (cid, hs, vs, qid), store in zip(comps, stores):
        by, bx = store.shape[:2]
        # dequantize in natural order: store is zigzag; scatter then scale
        nat = np.zeros((by, bx, 64), dtype=np.float64)
        nat[:, :, _ZZ] = store
        nat = nat.reshape(by, bx, 8, 8) * qtabs[qid][None, None]
        px = np.einsum("ji,byjk,kl->byil", _C, nat, _C, optimize=True)
        px = np.clip(np.round(px + 128.0), 0, 255).astype(np.uint8)
        plane = px.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full resolution (sample replication), crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1:
            plane = np.repeat(plane, ry, axis=0)
        if rx > 1:
            plane = np.repeat(plane, rx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        return np.repeat(planes[0][:, :, None], 3, axis=2)
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136286 * cb - 0.714136286 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
