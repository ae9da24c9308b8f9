"""Repetition and compressibility quality signals: brute-force parity
and edge cases (SQL-oracle parity for repetition_stats lives in
test_correctness_oracle.py)."""

import pyarrow as pa

from yj_schema_validator_ray.stages.text import (compression_stats,
                                                 repetition_stats)


def _docs(texts):
    import ray

    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))


def test_repetition_stats_hand_cases(ray_session):
    texts = [
        "a b a b a b",          # top bigram ('a','b') x3 of 5 bigrams
        "one\ntwo\none\n",      # 4 lines ('one','two','one',''), 3 distinct
        "solo",                 # single token -> no bigrams
        "",                     # empty doc: 1 line (itself), 0 tokens
    ]
    got = (repetition_stats(_docs(texts)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert list(got.loc[0, ["n_bigrams", "top_bigram_count"]]) == [5, 3]
    assert list(got.loc[1, ["n_lines", "n_distinct_lines"]]) == [4, 3]
    assert list(got.loc[2, ["n_bigrams", "top_bigram_count"]]) == [0, 0]
    assert list(got.loc[3, ["n_lines", "n_bigrams"]]) == [1, 0]


def test_compression_stats_repetitive_vs_random(ray_session):
    import zlib

    rep = "spam " * 400
    rnd = "k9#qZ!rT@1vX$wL7&mN2*pB4^dF6(gH8)jC0-eY5+sU3=aO"
    got = (compression_stats(_docs([rep, rnd])).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # exact determinism vs a direct zlib call
    assert got.loc[0, "zlib_bytes"] == len(zlib.compress(rep.encode(), 6))
    assert got.loc[0, "raw_bytes"] == len(rep.encode())
    # repetitive text compresses dramatically; high-entropy text doesn't
    assert got.loc[0, "zlib_bytes"] * 10 < got.loc[0, "raw_bytes"]
    assert got.loc[1, "zlib_bytes"] * 2 > got.loc[1, "raw_bytes"]
