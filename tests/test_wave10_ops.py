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
