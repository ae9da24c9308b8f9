"""Repetition and compressibility quality signals: brute-force parity
and edge cases (SQL-oracle parity for repetition_stats lives in
test_correctness_oracle.py)."""

import pandas as pd
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


def test_bpe_merge_training_hand_example(ray_session):
    """Tiny hand-derived corpus: merge order and encoded ids are fully
    determined (ties break on the lexicographically least pair)."""
    import ray.data

    from yj_schema_validator_ray.stages.bpe import (BPEEncoder,
                                                    train_bpe_merges)

    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["aa aa ab"])})
    ds = ray.data.from_arrow(docs)
    merges = train_bpe_merges(ds, num_merges=2)
    assert merges == [(b" ", b"a"), (b" a", b"a")]
    enc = BPEEncoder(merges)
    # pretokens: "aa" -> [97,97]; " aa" -> [257]; " ab" -> [256, 98]
    assert enc.encode("aa aa ab") == [97, 97, 257, 256, 98]
    assert enc.decode(enc.encode("aa aa ab")) == b"aa aa ab"


def test_bpe_roundtrip_and_modes_agree(ray_session):
    """Closed loop: decode(encode(x)) == x bytes for tricky inputs
    (unicode, emoji, empty, whitespace runs, contractions); the tasks
    and actor-pool execution modes return identical rows."""
    import ray.data

    from yj_schema_validator_ray.stages.bpe import (BPEEncoder,
                                                    tokenize_bpe,
                                                    train_bpe_merges)

    texts = ["the quick brown fox's jumps 123 !!!  \t\n", "",
             "ünïcode wörds emoji 🚀 mix", "aaaa" * 50,
             "I'll we've don't it's", "   spaces   runs   "]
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts)})
    ds = ray.data.from_arrow(docs).repartition(2)

    merges = train_bpe_merges(ds, num_merges=64)
    enc = BPEEncoder(merges)
    for t in texts:
        ids = enc.encode(t)
        assert enc.decode(ids) == t.encode("utf-8")
        assert len(ids) <= len(t.encode("utf-8"))

    a = (tokenize_bpe(ds, num_merges=64).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    assert a["roundtrip_ok"].all() and a["tokens_le_bytes"].all()
    assert (a["n_bytes"] == [len(t.encode("utf-8")) for t in texts]).all()
    # merging must actually compress the repetitive doc
    assert a.loc[3, "n_bpe_tokens"] < a.loc[3, "n_bytes"]
    b = (tokenize_bpe(ds, num_merges=64, mode="actor").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    # training is deterministic across runs
    assert train_bpe_merges(ds, num_merges=64) == merges


def test_bpe_roundtrip_property_random_unicode():
    """Property: decode(encode(x)) == utf-8 bytes of x for ARBITRARY
    text under an arbitrary trained merge table (byte-level BPE is
    lossless by construction; any miss is a table/merge-loop bug)."""
    from hypothesis import given, settings, strategies as st

    from yj_schema_validator_ray.stages.bpe import BPEEncoder

    # adversarial merge table: overlapping merges incl. multi-byte runs
    merges = [(b"a", b"a"), (b"aa", b"a"), (b" ", b"t"), (b" t", b"h"),
              (b"e", b" "), (b"\xc3", b"\xa9"), (b"1", b"2")]
    enc = BPEEncoder(merges)

    @settings(max_examples=200, deadline=None)
    @given(text=st.text(max_size=200))
    def check(text):
        ids = enc.encode(text)
        assert enc.decode(ids) == text.encode("utf-8")
        assert len(ids) <= len(text.encode("utf-8"))

    check()
