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


def test_knn_lsh_agrees_on_separated_clusters(ray_session, tmp_path):
    # on CLUSTERABLE data (the case that matters — random gaussians are
    # the adversarial near-equidistant case) the LSH-pruned vote must
    # reproduce the exact broadcast vote essentially everywhere: tight
    # well-separated clusters land in the same code buckets by
    # construction, so the candidate set contains the true top-k
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.stages.ann import (
        knn_classify, knn_classify_lsh)

    rng = np.random.RandomState(7)
    n_per, d, n_cl = 50, 16, 4
    centers = rng.normal(size=(n_cl, d)) * 10.0
    vecs, labels = [], []
    for c in range(n_cl):
        vecs.append(centers[c] + rng.normal(size=(n_per, d)) * 0.01)
        labels.extend([c] * n_per)
    m = np.concatenate(vecs)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float64())),
        "label": pa.array(np.array(labels, dtype=np.int64))})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")

    ex = knn_classify(str(tmp_path)).to_pandas().set_index("vec_id")
    ap = knn_classify_lsh(str(tmp_path)).to_pandas().set_index("vec_id")
    assert len(ap) == len(ex)  # full coverage
    j = ex.join(ap, rsuffix="_l")
    agree = (j["pred_label"] == j["pred_label_l"]).mean()
    assert agree >= 0.99, f"clustered agreement {agree}"
    # and both are perfect classifiers on separated clusters
    assert ex["correct"].all() and ap["correct"].all()


def test_cluster_scatter_decomposition_on_separated_clusters(
        ray_session, tmp_path):
    # two tight far-apart clusters: the rational decomposition must
    # balance exactly AND within/total must be tiny (between dominates)
    import pyarrow as pa
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.stages.ann import (
        embedding_cluster_scatter)

    rng = np.random.RandomState(3)
    m = np.concatenate([
        np.array([50.0] * 8) + rng.normal(size=(40, 8)) * 0.01,
        np.array([-50.0] * 8) + rng.normal(size=(40, 8)) * 0.01])
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
        "embedding": pa.array([r.tolist() for r in m],
                              pa.list_(pa.float64()))})
    pq.write_table(tbl, tmp_path / "embeddings.parquet")
    out = embedding_cluster_scatter(str(tmp_path), n_centroids=2,
                                    improvement_bound=0.01)
    assert bool(out["decomposition_ok"].iloc[0])
    assert bool(out["within_le_total_ok"].iloc[0])
    # within <= 1% of total: the clusters are 1e4 x tighter than the gap
    assert bool(out["improvement_ok"].iloc[0])


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
