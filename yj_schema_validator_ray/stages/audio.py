"""Audio modality: real RIFF/WAVE PCM16 encode + decode (pure
stdlib/numpy, no codec library) and exact integer feature extraction.

Same contract as the image path (:mod:`.multimodal`): audio is an opaque
``binary`` column with typed metadata; the decoder is a GENERIC RIFF
chunk walk (unknown chunks skipped, word-alignment padding honored), and
the synthesized corpus has a closed-form sample formula so a SQL oracle
certifies the full container-parse + PCM-decode + feature chain exactly
— every emitted feature is an integer (sums of |s|, s^2, zero crossings,
peak), so there is no fp-summation-order hazard.

100 TB shape: feature extraction is an embarrassingly parallel
``map_batches`` scan (payload bytes never shuffle); real corpora would
read payloads from object storage with small batch sizes — the plumbing
(schema, batch signature, output layout) is identical.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

SYNTH_FRAMES = 256  # per-channel frames in the synthesized corpus


def encode_wav(samples: np.ndarray, rate: int, channels: int,
               pad_chunk: bool = False) -> bytes:
    """Interleaved int16 ``samples`` -> RIFF/WAVE PCM16 bytes.  With
    ``pad_chunk`` an odd-sized LIST chunk (plus its alignment pad byte)
    precedes ``data`` — decoders must walk chunks generically."""
    assert samples.dtype == np.int16
    data = samples.tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, rate,
                      rate * channels * 2, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if pad_chunk:
        junk = b"INFO\x00"  # 5 bytes: odd size forces the pad-byte path
        chunks += b"LIST" + struct.pack("<I", len(junk)) + junk + b"\x00"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM16 -> (sample_rate, channels, flat int16 samples).
    Generic chunk walk: any chunk other than fmt/data is skipped, odd
    chunk sizes consume their alignment pad byte."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    rate = channels = None
    data = None
    while pos + 8 <= min(end, len(payload)):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            afmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if afmt != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV encoding (format={afmt}, bits={bits});"
                    " only PCM16 is implemented")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    return int(rate), int(channels), data


def wav_dataset_from_documents(sf_dir: str, frames: int = SYNTH_FRAMES):
    """Synthesize a REAL WAV per document: flat interleaved sample
    ``s(doc_id, i) = ((doc_id*31 + i*i*7) % 65536) - 32768`` over
    ``frames * channels`` samples, ``channels = 1 + doc_id % 2``,
    ``rate = 8000 + (doc_id % 3) * 4000``; odd doc_ids carry an extra
    odd-sized LIST chunk so the generic chunk walk (and its alignment
    pad) is exercised corpus-wide.  The formula is SQL-integrable."""
    import ray.data

    def f(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        payloads = []
        for did in ids:
            did = int(did)
            ch = 1 + did % 2
            i = np.arange(frames * ch, dtype=np.int64)
            s = ((did * 31 + i * i * 7) % 65536 - 32768).astype(np.int16)
            payloads.append(encode_wav(s, 8000 + (did % 3) * 4000, ch,
                                       pad_chunk=bool(did % 2)))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "mime": pa.array(["audio/wav"] * len(ids), pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])
    return ds.map_batches(f, batch_format="pyarrow")


def wav_stats(batch: pa.Table) -> pa.Table:
    """Decode real WAVs and emit EXACT integer audio features:
    (sample_rate, n_channels, n_samples, sum_abs, sum_sq, peak,
    zero_crossings) — sum_sq is the integer numerator of RMS^2,
    crossings counted over the flat interleaved stream with the
    ``(s_i < 0) != (s_{i-1} < 0)`` convention."""
    ids = batch.column("media_id").to_numpy()
    cols = {k: [] for k in ("sample_rate", "n_channels", "n_samples",
                            "sum_abs", "sum_sq", "peak",
                            "zero_crossings")}
    for payload in batch.column("payload"):
        rate, ch, s = decode_wav(payload.as_py())
        v = s.astype(np.int64)
        a = np.abs(v)
        cols["sample_rate"].append(rate)
        cols["n_channels"].append(ch)
        cols["n_samples"].append(len(v))
        cols["sum_abs"].append(int(a.sum()))
        cols["sum_sq"].append(int((v * v).sum()))
        cols["peak"].append(int(a.max()) if len(v) else 0)
        neg = v < 0
        cols["zero_crossings"].append(int((neg[1:] != neg[:-1]).sum()))
    out = {"media_id": pa.array(ids, pa.int64())}
    out.update({k: pa.array(vals, pa.int64()) for k, vals in cols.items()})
    return pa.table(out)


def wav_stats_sql(frames: int = SYNTH_FRAMES) -> str:
    """DuckDB oracle for the synthesized-WAV feature chain: integrates
    the closed-form sample formula with the same integer conventions."""
    return f"""
WITH d AS (
  SELECT doc_id, 1 + doc_id % 2 AS ch FROM documents
),
s AS (
  SELECT doc_id, ch, i,
         ((doc_id * 31 + i * i * 7) % 65536) - 32768 AS v
  FROM d, unnest(generate_series(0, {frames} * ch - 1)) AS t(i)
),
sc AS (
  SELECT doc_id, ch, v,
         CASE WHEN (v < 0) <> (lag(v) OVER (PARTITION BY doc_id
                                            ORDER BY i) < 0)
              THEN 1 ELSE 0 END AS zx
  FROM s
),
f AS (
  SELECT doc_id, ch,
         count(*) AS n_samples,
         sum(abs(v)) AS sum_abs,
         sum(v * v) AS sum_sq,
         max(abs(v)) AS peak,
         sum(zx) AS zero_crossings
  FROM sc GROUP BY doc_id, ch
)
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 3) * 4000 AS BIGINT) AS sample_rate,
       CAST(ch AS BIGINT) AS n_channels,
       CAST(n_samples AS BIGINT) AS n_samples,
       CAST(sum_abs AS BIGINT) AS sum_abs,
       CAST(sum_sq AS BIGINT) AS sum_sq,
       CAST(peak AS BIGINT) AS peak,
       CAST(zero_crossings AS BIGINT) AS zero_crossings
FROM f"""
