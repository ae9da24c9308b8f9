"""Edge semantics for the classifier / inverted-index / DAU-window wave
(sf0.001 oracle parity lives in test_correctness_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from yj_schema_validator_ray.stages.classify import (
    CLF_BIAS, CLF_WEIGHTS, quality_classifier, term_postings)


def _ds(tbl, parts=1):
    import ray

    ds = ray.data.from_arrow(tbl)
    return ds.repartition(parts) if parts > 1 else ds


def test_classifier_scores_and_zero_token_docs(ray_session):
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "fast fast slow",        # 3+3-3 = 3
            "",                      # no tokens -> bias
            "...!!!",                # punctuation only -> bias
            "dup dup unknownword",   # -4-4+0 = -8
        ]),
    })
    got = (quality_classifier(_ds(docs, 2)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert got["clf_score"].tolist() == [3, CLF_BIAS, CLF_BIAS, -8]
    assert got["keep"].tolist() == [True, True, True, False]
    # occurrence scoring, not distinct-token scoring
    assert got.loc[0, "clf_score"] == 2 * CLF_WEIGHTS["fast"] + CLF_WEIGHTS["slow"]


def test_term_postings_cap_exact_across_partitions(ray_session):
    # 30 docs all contain 'common'; doc i also contains f'only{i}'.
    # With cap=5 the postings for 'common' must be the 5 SMALLEST doc
    # ids even when the docs are spread over many partitions (every
    # global minimum survives its own partial's cap).
    n = 30
    docs = pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([f"common only{i}" for i in range(n)]),
    })
    for parts in (1, 8):
        got = term_postings(_ds(docs, parts), k=3, cap=5).to_pandas()
        got = got.sort_values(["df", "term"],
                              ascending=[False, True]).reset_index(drop=True)
        assert got.loc[0, "term"] == "common"
        assert got.loc[0, "df"] == n
        assert got.loc[0, "postings"] == "0,1,2,3,4"
        # the df=1 tail picks lexicographically smallest terms
        assert got["term"].tolist()[1:] == ["only0", "only1"]


def test_cross_source_overlap_distinct_and_partition_invariant(ray_session):
    # 'w0 w1 w2 w3 w4' appears in A twice and in B once -> counted ONCE
    # (distinct grams); 'x0..x4' is A-only -> no pair row; C shares a
    # different gram with B only.
    from yj_schema_validator_ray.stages.text import cross_source_overlap

    docs = pa.table({
        "source": pa.array(["A", "A", "B", "B", "C"]),
        "text": pa.array([
            "w0 w1 w2 w3 w4",
            "w0 w1 w2 w3 w4 tail",   # same gram again within A
            "w0 w1 w2 w3 w4",
            "y0 y1 y2 y3 y4",
            "y0 y1 y2 y3 y4",
        ]),
    })
    for parts in (1, 4):
        got = (cross_source_overlap(_ds(docs, parts)).to_pandas()
               .sort_values(["source_a", "source_b"])
               .reset_index(drop=True))
        assert list(map(tuple, got.to_records(index=False))) == [
            ("A", "B", 1), ("B", "C", 1)], parts


def test_csv_roundtrip_checksum_matches_parquet_source(ray_session):
    # engine-vs-engine: the per-lang XOR content checksum after the CSV
    # write->read cycle must equal the same checksum over the parquet
    # source (catches corruptions that cancel in the char sums); texts
    # include embedded delimiters/quotes/newlines to exercise escaping
    import numpy as np
    import pyarrow.parquet as pq
    import tempfile, os

    from yj_schema_validator_ray.pipelines.curation import docs_csv_roundtrip
    from yj_schema_validator_ray.stages.text import _fnv1a_rolling

    texts = ['plain words', 'has,comma', 'has "quotes" inside',
             'line\nbreak', 'trailing space ', 'ünïcode ok']
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en", "en", "de", "de", "en", "de"]),
        "text": pa.array(texts),
    })
    with tempfile.TemporaryDirectory() as sf:
        pq.write_table(tbl, os.path.join(sf, "documents.parquet"))
        got = (docs_csv_roundtrip(sf, checksum=True)
               .sort_values("lang").reset_index(drop=True))
        src = pd.DataFrame({
            "lang": tbl.column("lang").to_pandas(),
            "x": _fnv1a_rolling(tbl.column("text").combine_chunks()),
            "n": [len(t) for t in texts]})
        want = (src.groupby("lang")
                .agg(n_docs=("n", "size"), total_chars=("n", "sum"),
                     text_xor=("x", lambda v: int(np.bitwise_xor.reduce(
                         v.to_numpy(np.int64)))))
                .reset_index().sort_values("lang").reset_index(drop=True))
        for c in ("n_docs", "total_chars", "text_xor"):
            assert got[c].astype("int64").tolist() == \
                want[c].astype("int64").tolist(), c


def test_corpus_merge_upsert_tombstone_semantics(ray_session, tmp_path):
    # ids 0-4: %100<5 -> tombstoned AND re-arrive at id+1e6;
    # ids 95-99: %100>=95 -> revised in place (' [rev2]' appended);
    # id 50: carried unchanged.
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.curation import corpus_merge

    ids = [0, 50, 95]
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(["aaa", "bbbb", "ccccc"]),
        "lang": pa.array(["en", "en", "de"]),
        "source": pa.array(["s", "s", "s"]),
        "n_chars": pa.array([3, 4, 5], pa.int64()),
    })
    pq.write_table(tbl, tmp_path / "documents.parquet")
    got = (corpus_merge(str(tmp_path)).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    # merged: de -> {95 revised: 'ccccc [rev2]' (12 chars)};
    #         en -> {1000000 arrival 'aaa' (3), 50 unchanged 'bbbb' (4)}
    assert got["lang"].tolist() == ["de", "en"]
    assert got["n_docs"].tolist() == [1, 2]
    assert got["total_chars"].tolist() == [12, 7]
    assert got["id_xor"].tolist() == [95, 1_000_000 ^ 50]


def test_embedding_quantize_edges(ray_session):
    # zero vector -> scale 0, all codes 0; max element maps to +/-127;
    # reconstruction of the max element is exact (err term 0)
    import ray

    from yj_schema_validator_ray.stages.ann import embedding_quantize

    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(
            [[0.0, 0.0], [1.0, -0.5], []],
            pa.list_(pa.float32())),
    })
    got = (embedding_quantize(ray.data.from_arrow(tbl)).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert got["dim"].tolist() == [2, 2, 0]
    assert got["scale_q6"].tolist() == [0, 1_000_000, 0]
    # vec 1: q = [127, floor(-63.5 + 0.5) = -63] -> sum 64, abs 190
    assert got["q_sum"].tolist() == [0, 64, 0]
    assert got["q_abs_sum"].tolist() == [0, 190, 0]
    # err: elem0 exact (127*1/127 = 1.0); elem1 |-0.5 + 63/127| > 0
    assert got.loc[0, "err_q9_sum"] == 0
    assert got.loc[1, "err_q9_sum"] > 0
    assert got.loc[2, "err_q9_sum"] == 0


def test_dup_substring_coverage_interval_union(ray_session):
    # L=5.  'abcde' occurs in docs 0 and 1 -> both get 1 dup start,
    # 5 covered chars.  doc 2 repeats 'qqqqq' at starts 0,1,2 (within-
    # doc duplication counts too) -> union [0,7) = 7 chars.  doc 3 is
    # shorter than L -> absent.  Partition-invariant.
    from yj_schema_validator_ray.stages.text import dup_substring_coverage

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(["abcdefgh", "abcdeZZZ", "qqqqqqq", "abc"]),
    })
    for parts in (1, 4):
        got = (dup_substring_coverage(_ds(docs, parts), L=5).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == [0, 1, 2], parts
        assert got["n_dup_starts"].tolist() == [1, 1, 3], parts
        assert got["n_covered_chars"].tolist() == [5, 5, 7], parts


def test_events_dau_ma7_short_series(ray_session, tmp_path):
    # 3 observed days (< window width): the trailing sum is the prefix
    # sum; a gap day is simply absent (ROWS semantics, both sides).
    from yj_schema_validator_ray.pipelines.relational import events_dau_ma7

    ts = pd.to_datetime([
        "2024-01-01 03:00", "2024-01-01 09:00",   # day 1: users 1, 2
        "2024-01-02 10:00",                        # day 2: user 1
        "2024-01-05 12:00", "2024-01-05 13:00",   # day 5: users 2, 3
    ])
    tbl = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "ts": pa.array(ts, pa.timestamp("us")),
        "user_id": pa.array([1, 2, 1, 2, 3], pa.int64()),
        "event_type": pa.array(["a"] * 5),
        "value": pa.array([0.0] * 5),
        "props": pa.array(["{}"] * 5),
    })
    pq.write_table(tbl, tmp_path / "events.parquet")
    got = events_dau_ma7(str(tmp_path)).to_pandas()
    got = got.sort_values("day").reset_index(drop=True)
    assert got["day"].tolist() == ["2024-01-01", "2024-01-02", "2024-01-05"]
    assert got["n_users"].tolist() == [2, 1, 2]
    assert got["dau_7d_sum"].tolist() == [2, 3, 5]
