"""RIFF/WAVE PCM16 codec: round-trip parity, generic chunk walking,
brute-force feature parity (the sf0.001 SQL-oracle parity lives in
test_correctness_oracle.py)."""

import numpy as np
import pytest

from yj_schema_validator_ray.stages.audio import (decode_wav, encode_wav,
                                                  wav_stats)


def test_wav_roundtrip_mono_and_stereo():
    rng = np.random.RandomState(5)
    for ch in (1, 2):
        s = rng.randint(-32768, 32768, size=300 * ch).astype(np.int16)
        rate, got_ch, got = decode_wav(encode_wav(s, 44100, ch))
        assert (rate, got_ch) == (44100, ch)
        assert (got == s).all()


def test_wav_junk_chunk_and_padding_skipped():
    s = np.array([1, -2, 3, -4, 0, 32767, -32768], dtype=np.int16)
    payload = encode_wav(s, 8000, 1, pad_chunk=True)
    # the odd-sized LIST chunk sits between fmt and data
    assert b"LIST" in payload
    rate, ch, got = decode_wav(payload)
    assert (rate, ch) == (8000, 1) and (got == s).all()


def test_wav_rejects_non_pcm16():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS" + b"\x00" * 40)
    # 8-bit PCM header
    import struct

    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    bad = (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
           + b"fmt " + struct.pack("<I", len(fmt)) + fmt)
    with pytest.raises(ValueError, match="only PCM16"):
        decode_wav(bad)


def test_wav_stats_brute_parity():
    import pyarrow as pa

    rng = np.random.RandomState(9)
    rows = []
    payloads = []
    for mid in range(6):
        ch = 1 + mid % 2
        s = rng.randint(-32768, 32768, size=100 * ch).astype(np.int16)
        payloads.append(encode_wav(s, 16000, ch, pad_chunk=bool(mid % 2)))
        v = s.astype(np.int64)
        neg = v < 0
        rows.append((16000, ch, len(v), int(np.abs(v).sum()),
                     int((v * v).sum()), int(np.abs(v).max()),
                     int((neg[1:] != neg[:-1]).sum())))
    batch = pa.table({
        "media_id": pa.array(range(6), pa.int64()),
        "payload": pa.array(payloads, pa.binary()),
    })
    out = wav_stats(batch).to_pandas()
    for i, (rate, ch, n, sa, sq, pk, zc) in enumerate(rows):
        r = out.iloc[i]
        assert (r.sample_rate, r.n_channels, r.n_samples) == (rate, ch, n)
        assert (r.sum_abs, r.sum_sq, r.peak, r.zero_crossings) \
            == (sa, sq, pk, zc)
