"""Wave-10 operators: DSIR importance weights, blocklist word
boundaries, and lexical-diversity counting invariants."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def test_gram_buckets_match_md5_and_cache():
    from yj_schema_validator_ray.stages.sampling import (
        _DSIR_BUCKET_CACHE, _gram_buckets)

    toks = ["the", "spark", "the", "dup", "x_1"]
    got = _gram_buckets(toks)
    exp = [int(hashlib.md5(t.encode()).hexdigest()[:2], 16) for t in toks]
    assert got.tolist() == exp
    assert all(0 <= b < 256 for b in got)
    # distinct tokens land in the process cache; repeats don't re-hash
    assert {"the", "spark", "dup", "x_1"} <= set(_DSIR_BUCKET_CACHE)


def test_dsir_weight_formula_is_floor_division():
    # the engine's weight must be the same add-one floor-div integer the
    # SQL computes: w = (scale * (ct+1)) // (cr+1)
    ct = np.array([0, 9, 100], dtype=np.int64)
    cr = np.array([3, 0, 7], dtype=np.int64)
    w = (1_000_000 * (ct + 1)) // (cr + 1)
    assert w.tolist() == [250_000, 10_000_000, 12_625_000]


def test_blocklist_counts_whole_words_only(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import blocklist_filter

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "dup Dup DUPLICATE dupe",   # 2 whole-word hits, 2 non-hits
            "clean text only",
            "spam, spam! lorem.",       # punctuation still bounds words
        ], pa.string()),
    }))
    out = (blocklist_filter(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.n_blocked.tolist() == [2, 0, 3]
    assert out.kept.tolist() == [False, True, False]


def test_lexical_diversity_counts(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import lexical_diversity

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "a a a b",      # counts {a:3, b:1}
            "x",            # counts {x:1}
            "... !!!",      # no tokens -> row drops
        ], pa.string()),
    }))
    out = (lexical_diversity(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out.doc_id.tolist() == [1, 2]
    assert out.n_tokens.tolist() == [4, 1]
    assert out.n_types.tolist() == [2, 1]
    assert out.sum_c2.tolist() == [10, 1]  # 9 + 1; 1


def test_orc_roundtrip_checksum_matches_parquet_source(ray_session):
    # engine-vs-engine: per-lang XOR content checksum after the ORC
    # write->read cycle equals the same checksum over the parquet
    # source (ORC is binary-safe, so unicode/newlines must survive)
    import os
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.curation import (
        docs_orc_roundtrip)
    from yj_schema_validator_ray.stages.text import _fnv1a_rolling

    texts = ["plain words", "has,comma", 'has "quotes" inside',
             "line\nbreak", "trailing space ", "ünïcode ok", ""]
    tbl = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "lang": pa.array(["en", "en", "de", "de", "en", "de", "en"]),
        "text": pa.array(texts),
    })
    with tempfile.TemporaryDirectory() as sf:
        pq.write_table(tbl, os.path.join(sf, "documents.parquet"))
        got = (docs_orc_roundtrip(sf, checksum=True)
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


def test_daily_gapfill_fills_missing_days(ray_session):
    import os
    import tempfile

    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import (
        events_daily_gapfill)

    ts = pa.array([
        pd.Timestamp("2024-01-01 10:00"),
        pd.Timestamp("2024-01-01 11:00"),
        pd.Timestamp("2024-01-04 00:00"),   # 2nd+3rd missing
    ], pa.timestamp("us"))
    tbl = pa.table({"event_id": pa.array([1, 2, 3], pa.int64()),
                    "ts": ts,
                    "user_id": pa.array([1, 1, 2], pa.int64()),
                    "event_type": pa.array(["a", "b", "a"]),
                    "value": pa.array([1.0, 2.0, 3.0]),
                    "props": pa.array(["{}", "{}", "{}"])})
    with tempfile.TemporaryDirectory() as sf:
        pq.write_table(tbl, os.path.join(sf, "events.parquet"))
        out = (events_daily_gapfill(sf).to_pandas()
               .sort_values("day").reset_index(drop=True))
    assert out.day.tolist() == ["2024-01-01", "2024-01-02",
                                "2024-01-03", "2024-01-04"]
    assert out.n_events.tolist() == [2, 0, 0, 1]


def test_hapax_and_top_terms_semantics(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import (
        doc_top_terms, hapax_per_source)

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "zebra zebra apple unique1",   # top: zebra(2); hapax: unique1
            "apple banana banana",         # top tie at 2? banana(2)
            "apple unique2 unique3",       # top tie at 1 -> 'apple'
        ], pa.string()),
        "source": pa.array(["s1", "s1", "s2"]),
    }))
    top = (doc_top_terms(ds).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert top.term.tolist() == ["zebra", "banana", "apple"]
    assert top.tf.tolist() == [2, 2, 1]

    hx = (hapax_per_source(ds).to_pandas()
          .sort_values("source").reset_index(drop=True))
    # s1 distinct: zebra apple unique1 banana -> 4; hapax: unique1, zebra?
    # zebra appears twice globally -> not hapax; banana twice -> no.
    # s2 distinct: apple unique2 unique3 -> 3; hapax: unique2, unique3
    assert hx.source.tolist() == ["s1", "s2"]
    assert hx.n_terms.tolist() == [4, 3]
    assert hx.n_hapax.tolist() == [1, 2]


def test_burst_days_integer_test_matches_float_zscore(ray_session):
    import os
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.olap import events_burst_days

    # 9 quiet days of 10 events + one 50-event spike: the spike is the
    # only day with n > mean + 2*sigma (float check mirrors the
    # integer certificate)
    days = [f"2024-01-{d:02d}" for d in range(1, 10)] + ["2024-01-10"]
    counts = [10] * 9 + [50]
    ts, eid = [], []
    for day, n in zip(days, counts):
        for i in range(n):
            ts.append(pd.Timestamp(f"{day} 06:00") + pd.Timedelta(minutes=i))
            eid.append(len(eid) + 1)
    tbl = pa.table({"event_id": pa.array(eid, pa.int64()),
                    "ts": pa.array(ts, pa.timestamp("us")),
                    "user_id": pa.array([1] * len(eid), pa.int64()),
                    "event_type": pa.array(["click"] * len(eid)),
                    "value": pa.array([0.0] * len(eid)),
                    "props": pa.array(["{}"] * len(eid))})
    with tempfile.TemporaryDirectory() as sf:
        pq.write_table(tbl, os.path.join(sf, "events.parquet"))
        out = (events_burst_days(sf).to_pandas()
               .sort_values("day").reset_index(drop=True))
    arr = np.array(counts, dtype=float)
    float_flags = (arr > arr.mean() + 2 * arr.std()).tolist()
    assert out.is_burst.tolist() == float_flags
    assert out.is_burst.tolist() == [False] * 9 + [True]


def test_compact_shards_file_count_contract(ray_session):
    # the oracle checks only the accounting; the file-count contract
    # (64 fragments -> exactly 8 compacted files) is pinned here
    import glob
    import shutil
    import tempfile

    import ray.data

    from yj_schema_validator_ray.pipelines.curation import compact_shards

    out = compact_shards("/root/testdata/sf0.001",
                         small_files=64, target_files=8)
    assert out.attrs["n_files_before"] == 64
    assert out.attrs["n_files_after"] == 8
    assert int(out["n_docs"].sum()) == 500


def test_wave10_ops_are_repartition_invariant(ray_session):
    # block boundaries must never change results: per-batch partials +
    # keyed exchanges only (catches accidental batch-local semantics)
    import ray.data

    from yj_schema_validator_ray.stages.sampling import dsir_select
    from yj_schema_validator_ray.stages.text import (
        hapax_per_source, lexical_diversity, oov_rate)

    def docs(nblocks=None):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "source"])
        return ds.repartition(nblocks) if nblocks else ds

    for fn in (dsir_select, oov_rate, hapax_per_source,
               lexical_diversity):
        a = fn(docs()).to_pandas()
        b = fn(docs(7)).to_pandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True), fn.__name__
