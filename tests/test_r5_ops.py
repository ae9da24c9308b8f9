"""Round-5 operators: ExactSubstr fingerprint wire + cut."""
import numpy as np
import pandas as pd


def test_gram_fingerprints_match_string_equality():
    # the 128-bit fingerprint must be a function of the gram STRING:
    # equal windows hash equal, and across a small adversarial corpus
    # distinct windows hash distinct (2^-128 pair bound makes any
    # collision here a bug, not bad luck)
    from yj_schema_validator_ray.stages.text import _gram_fingerprints

    L = 5
    texts = ["abcdefghij", "xxabcdexx", "abcde", "édcba-abcde",
             "aaaaaaaa", ""]
    seen = {}
    for tx in texts:
        fp = _gram_fingerprints(tx, L)
        if fp is None:
            assert len(tx) < L
            continue
        h1, h2 = fp
        assert len(h1) == len(tx) - L + 1
        for i in range(len(h1)):
            g = tx[i:i + L]
            key = (int(h1[i]), int(h2[i]))
            if g in seen:
                assert seen[g] == key, f"same gram {g!r} hashed twice"
            seen[g] = key
    # distinct grams -> distinct fingerprints
    inv = {}
    for g, key in seen.items():
        assert key not in inv or inv[key] == g, \
            f"collision {g!r} vs {inv[key]!r}"
        inv[key] = g


def test_dup_substring_plans_are_row_identical(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import dup_substring_coverage

    def docs():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"])

    a = (dup_substring_coverage(docs(), wire="fingerprint").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (dup_substring_coverage(docs(), wire="gram").to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_dup_substring_cut_conserves_coverage(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import (
        dup_substring_coverage, dup_substring_cut)

    def docs():
        return ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"])

    cov = dup_substring_coverage(docs()).to_pandas()
    cut = dup_substring_cut(docs()).to_pandas()
    # every doc appears in the cut; removed chars == covered chars
    # (0 where the doc has no duplicated substring)
    m = cut.merge(cov[["doc_id", "n_covered_chars"]], on="doc_id",
                  how="left").fillna({"n_covered_chars": 0})
    assert (m["n_removed"].to_numpy()
            == m["n_covered_chars"].to_numpy()).all()
    assert (m["n_before"].to_numpy()
            == m["n_removed"].to_numpy() + m["n_after"].to_numpy()).all()
    # the rewrite really removes content where coverage says so
    assert (cut["n_removed"] > 0).any()


def test_dup_substring_cut_hand_case(ray_session):
    # two docs sharing one length-4 substring "XYZW"; everything else
    # unique — the cut must remove exactly those 4 chars from each
    import ray.data

    from yj_schema_validator_ray.stages.text import dup_substring_cut

    rows = [{"doc_id": 1, "text": "aaXYZWbb"},
            {"doc_id": 2, "text": "ccccXYZW"},
            {"doc_id": 3, "text": "nodupes!"}]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = (dup_substring_cut(ds, L=4).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["n_before"].tolist() == [8, 8, 8]
    assert out["n_removed"].tolist() == [4, 4, 0]
    assert out["n_after"].tolist() == [4, 4, 8]

    def cksum(s):
        return sum(ord(c) for c in s)

    assert out["kept_checksum"].tolist() == [
        cksum("aabb"), cksum("cccc"), cksum("nodupes!")]
