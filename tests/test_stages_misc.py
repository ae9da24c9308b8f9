"""Unit tests for HLL sketch accuracy, exact_agg vs pandas, multimodal
plumbing, ANN brute-force vs LSH recall, dedup signatures."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yj_schema_validator_ray.pipelines.constraints import HLLSketch, kl_divergence
from yj_schema_validator_ray.stages.multimodal import (
    FEATURE_DIM, MediaFeaturizer, decode_image, fake_decode)


def _rand_hashes(rng, n):
    # FULL 64-bit range — a biased top bit leaves half the registers
    # empty and poisons the estimate (production _hash64 is full-range)
    return rng.randint(-2**63, 2**63, size=n, dtype=np.int64).astype(np.uint64)


def test_hll_estimate_accuracy():
    sk = HLLSketch(p=12)
    rng = np.random.RandomState(3)
    true_n = 50_000
    sk.add_hashed(_rand_hashes(rng, true_n))
    est = sk.estimate()
    assert abs(est - true_n) / true_n < 0.05  # ~1.04/sqrt(4096) = 1.6% std


def test_hll_merge_equals_union():
    a, b = HLLSketch(p=10), HLLSketch(p=10)
    both = HLLSketch(p=10)
    rng = np.random.RandomState(4)
    h1 = _rand_hashes(rng, 1000)
    h2 = _rand_hashes(rng, 1000)
    a.add_hashed(h1); b.add_hashed(h2)
    both.add_hashed(h1); both.add_hashed(h2)
    assert a.merge(b).estimate() == both.estimate()


def test_kl_divergence_zero_on_match():
    assert kl_divergence({"a": 80, "b": 20}, {"a": 0.8, "b": 0.2}) == pytest.approx(0)
    assert kl_divergence({"a": 99, "b": 1}, {"a": 0.5, "b": 0.5}) > 0.5


def test_media_featurizer_plumbing():
    batch = pa.table({
        "media_id": pa.array([1, 2], pa.int64()),
        "mime": pa.array(["application/octet-stream"] * 2),
        "payload": pa.array([b"hello", b"world"], pa.binary()),
    })
    out = MediaFeaturizer()(batch)
    assert out.column_names == ["media_id", "payload_sha256", "payload_bytes", "feature"]
    rows = out.to_pylist()
    assert rows[0]["payload_bytes"] == 5
    assert len(rows[0]["feature"]) == FEATURE_DIM
    # deterministic stand-in decode
    assert np.allclose(fake_decode(b"hello"), fake_decode(b"hello"))
    assert not np.allclose(fake_decode(b"hello"), fake_decode(b"world"))


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_exact_agg_matches_pandas(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.exact_agg import grouped_aggregate

    rng = np.random.RandomState(5)
    df = pd.DataFrame({
        "k1": rng.choice(["a", "b", "c", "d"], 5000),
        "k2": rng.randint(0, 500, 5000),
        "v": rng.randint(0, 100, 5000),
    })
    got = grouped_aggregate(
        ray.data.from_pandas(df), ["k1", "k2"],
        [("v", "sum", "v_sum"), ("v", "min", "v_min"), ("", "count", "n")],
    ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    exp = (df.groupby(["k1", "k2"])
           .agg(v_sum=("v", "sum"), v_min=("v", "min"), n=("v", "size"))
           .reset_index().sort_values(["k1", "k2"]).reset_index(drop=True))
    got["k2"] = got["k2"].astype(exp["k2"].dtype)
    for c in ["v_sum", "v_min", "n"]:
        got[c] = got[c].astype("int64"); exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_ann_lsh_results_subset_of_bruteforce(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.ann import ann_topk_bruteforce, ann_topk_lsh

    rng = np.random.RandomState(6)
    n, d = 400, 16
    m = rng.normal(size=(n, d)).astype(np.float32)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([row.tolist() for row in m],
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl)
    queries = {0: m[0].astype(np.float64), 1: m[1].astype(np.float64)}
    bf = ann_topk_bruteforce(ds, queries, k=5).to_pandas()
    # exact top-k: self similarity 1.0 at rank 1
    top1 = bf[bf["rank"] == 1].set_index("query_id")
    assert top1.loc[0, "vec_id"] == 0 and top1.loc[0, "sim"] == pytest.approx(1.0)
    # LSH candidates score identically to brute force where they overlap
    lsh = ann_topk_lsh(ds, queries, k=5).to_pandas()
    merged = lsh.merge(bf, on=["query_id", "vec_id"], suffixes=("_l", "_b"))
    assert (merged["sim_l"] == merged["sim_b"]).all()


def test_minhash_signature_similarity():
    from yj_schema_validator_ray.stages.dedup import MinHasher

    mh = MinHasher(num_perm=128)
    a = "the quick brown fox jumps over the lazy dog " * 10
    b = "the quick brown fox jumps over the lazy cat " * 10
    c = "completely different content with no overlap at all zzz " * 10
    sim_ab = (mh.signature(a) == mh.signature(b)).mean()
    sim_ac = (mh.signature(a) == mh.signature(c)).mean()
    assert sim_ab > 0.5 > sim_ac
    # deterministic across instances (fixed seed)
    assert (MinHasher(num_perm=128).signature(a) == mh.signature(a)).all()


def test_minhash_batch_path_bit_identical_to_per_doc():
    """The vectorized whole-batch __call__ (one Arrow-buffer window pass,
    cross-batch shingle dedupe, reduceat mins) must produce EXACTLY the
    per-doc signature() values — including short (<k), empty, unicode and
    duplicate docs, sliced batches, and large_string columns."""
    import pyarrow as pa
    from yj_schema_validator_ray.stages.dedup import (
        MinHasher, _batch_window_hashes, _shingle_hashes)

    mh = MinHasher(num_perm=64)
    texts = [
        "the quick brown fox jumps over the lazy dog " * 20,
        "short", "", "ab", "exactly5.",
        "unicode snowman ☃ and emoji 🚀 mixed in " * 7,
        "the quick brown fox jumps over the lazy dog " * 20,  # dup
        "x" * 4, "y" * 5,
    ]
    ref = np.stack([mh.signature(t) for t in texts])

    def sigs_of(tbl):
        out = mh(tbl)
        return np.stack([np.array(s, dtype=np.int64).view(np.uint64)
                         for s in out.column("sig").to_pylist()])

    batch = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)})
    assert (sigs_of(batch) == ref).all()
    assert (sigs_of(batch.slice(2, 4)) == ref[2:6]).all()
    large = pa.table({"doc_id": batch.column("doc_id"),
                      "text": pa.array(texts, pa.large_string())})
    assert (sigs_of(large) == ref).all()
    # the window-hash kernel itself matches the per-doc shingle hasher
    wins, woffs = _batch_window_hashes(batch.column("text"), 5)
    for i, t in enumerate(texts):
        got = np.unique(wins[woffs[i]:woffs[i + 1]])
        assert (got == _shingle_hashes(t, 5)).all()
    # chunk boundaries cannot change values: force many tiny chunks
    tiny = MinHasher(num_perm=64)
    tiny.CHUNK_WINDOWS = 8
    assert (np.stack([np.array(s, dtype=np.int64).view(np.uint64)
                      for s in tiny(batch).column("sig").to_pylist()])
            == ref).all()


def test_ngram_and_simhash_batch_paths_bit_identical():
    """batch_grams (cross-batch factorize + one rolling-poly pass) and the
    SimHasher whole-batch bit-count path must equal the per-doc reference
    methods exactly — incl. empty/short/punctuation-only/unicode docs."""
    import pyarrow as pa
    from yj_schema_validator_ray.stages.dedup import AllNGramHasher, SimHasher

    texts = ["", "one", "one two", "one two three",
             "one two three four " * 50,
             "ünïcode wörds emoji 🚀 mix " * 3,
             "  punctuation,,, only !!! ", "a b c",
             "the quick brown fox jumps over the lazy dog " * 5]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})
    ng = AllNGramHasher(3)
    assert (ng(tbl).column("grams").to_pylist()
            == [ng.gram_hashes(t).tolist() for t in texts])
    # all-too-short batch -> empty gram lists, not a crash
    short = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                      "text": pa.array(["a b", ""])})
    assert ng(short).column("grams").to_pylist() == [[], []]

    sh = SimHasher()
    got = np.array(sh(tbl).column("simhash").to_pylist(),
                   np.int64).astype(np.uint64)
    ref = np.array([sh.simhash(t) for t in texts], np.uint64)
    assert (got == ref).all()


def test_simhash_hamming_properties():
    from yj_schema_validator_ray.stages.dedup import SimHasher

    sh = SimHasher()
    a = sh.simhash("alpha beta gamma delta epsilon " * 20)
    b = sh.simhash("alpha beta gamma delta zeta " * 20)
    c = sh.simhash("totally unrelated words qqq www eee " * 20)
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(a, b) < ham(a, c)


def test_image_resizer_plumbing():
    from yj_schema_validator_ray.stages.multimodal import ImageResizer

    batch = pa.table({
        "media_id": pa.array([1], pa.int64()),
        "mime": pa.array(["image/png"]),
        "payload": pa.array([b"fakeimagebytes"], pa.binary()),
    })
    out = ImageResizer(width=8, height=8)(batch).to_pylist()
    assert len(out[0]["payload"]) == 64
    assert out[0]["width"] == 8 and out[0]["height"] == 8
    # deterministic across calls
    out2 = ImageResizer(width=8, height=8)(batch).to_pylist()
    assert out2[0]["payload"] == out[0]["payload"]


def test_frame_sampler_row_expansion():
    from yj_schema_validator_ray.stages.multimodal import FrameSampler

    payload = bytes(range(256)) * 5  # 5 frames of 256 bytes
    batch = pa.table({
        "media_id": pa.array([7], pa.int64()),
        "payload": pa.array([payload], pa.binary()),
    })
    out = FrameSampler(frame_bytes=256, every_k=2)(batch).to_pylist()
    assert [r["frame_index"] for r in out] == [0, 2, 4]
    assert all(len(r["frame"]) == 256 for r in out)
    assert all(r["media_id"] == 7 for r in out)


def test_lang_drift_detects_shifted_mix(ray_session):
    import ray.data

    from yj_schema_validator_ray.pipelines.constraints import lang_drift

    def mk(langs):
        return ray.data.from_pandas(pd.DataFrame({"lang": langs}))

    # clean: matches the generator's 8/90 json/yaml mix -> no drift
    clean = mk(["json"] * 8 + ["yaml"] * 90 + [None] * 2)
    r = lang_drift(clean)
    assert bool(r["drifted"].iloc[0]) is False
    assert r["kl"].iloc[0] == pytest.approx(0.0, abs=1e-6)

    # drifted: half json -> KL crosses the threshold
    drifted = mk(["json"] * 50 + ["yaml"] * 50)
    r2 = lang_drift(drifted)
    assert bool(r2["drifted"].iloc[0]) is True
    assert r2["kl"].iloc[0] > 0.3


def test_minhash_pipeline_distributed_verify(ray_session):
    """End-to-end minhash near-dup: exact duplicates are found with
    jaccard_est 1.0 and signatures are joined distributed (no driver
    materialization on the path)."""
    import ray.data

    from yj_schema_validator_ray.stages.dedup import minhash_lsh_pairs

    base = [f"the quick brown fox jumps over the lazy dog number {i} "
            f"with plenty of shared shingle material to hash" for i in range(30)]
    texts = base + base[:5]  # ids 30..34 duplicate 0..4
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    out = minhash_lsh_pairs(ds, threshold=0.9).to_pandas()
    found = {(int(a), int(b)): j
             for a, b, j in zip(out["a"], out["b"], out["jaccard_est"])}
    for i in range(5):
        assert found[(i, 30 + i)] == 1.0  # exact dup -> identical signature


def test_ngram_jaccard_distributed(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.dedup import ngram_jaccard_pairs

    texts = ["alpha beta gamma delta epsilon zeta", "alpha beta gamma delta epsilon zeta",
             "one two three four five six seven", "totally different words here now ok"]
    docs = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(4), "text": texts}))
    cands = ray.data.from_pandas(pd.DataFrame(
        {"a": [0, 2], "b": [1, 3]}))
    out = ngram_jaccard_pairs(docs, cands, n=3, threshold=0.5).to_pandas()
    assert len(out) == 1
    assert (int(out["a"].iloc[0]), int(out["b"].iloc[0])) == (0, 1)
    assert out["jaccard"].iloc[0] == 1.0


def test_kmeans_clusters_nearest_centroid(ray_session):
    """Every assignment is the argmax-cosine centroid, reruns are
    identical, and well-separated blobs land in distinct clusters."""
    import ray.data

    from yj_schema_validator_ray.stages.ann import (kmeans_clusters,
                                                    train_kmeans)

    rng = np.random.RandomState(3)
    blobs = [rng.normal(c, 0.05, size=(50, 8)) for c in
             (np.eye(8)[0], np.eye(8)[3], np.eye(8)[6])]
    vecs = np.vstack(blobs).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(len(vecs)),
                       "embedding": [v.tolist() for v in vecs]})
    mk = lambda: ray.data.from_pandas(df)
    out = (kmeans_clusters(mk(), n_centroids=3).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    out2 = (kmeans_clusters(mk(), n_centroids=3).to_pandas()
            .sort_values("vec_id").reset_index(drop=True))
    assert out.equals(out2)  # deterministic
    cent = train_kmeans(mk(), n_centroids=3)
    n = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    assert (out["cluster"].to_numpy() ==
            np.argmax(n @ cent.T, axis=1)).all()
    # one cluster per blob, three distinct clusters
    labels = [set(out["cluster"][i * 50:(i + 1) * 50]) for i in range(3)]
    assert all(len(s) == 1 for s in labels)
    assert len(set().union(*labels)) == 3


def test_bloom_incremental_dedup(ray_session):
    """Bloom incremental dedup: every true duplicate drops (no false
    negatives — the Bloom guarantee) and fresh docs survive at well
    under the configured false-positive rate."""
    import ray.data

    from yj_schema_validator_ray.stages.bloom import (build_bloom,
                                                      incremental_dedup)

    old_texts = [f"old document number {i} with some body" for i in range(20_000)]
    old = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(20_000), "text": old_texts})).repartition(8)
    bloom = build_bloom(old, m_bits=1 << 18, k=5)

    new_texts = old_texts[:1000] + [f"fresh doc {i}" for i in range(1000)]
    new = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(100_000, 100_000 + len(new_texts)),
         "text": new_texts}))
    kept = incremental_dedup(new, bloom, k=5).to_pandas()
    kept_ids = set(kept["doc_id"])
    assert not (kept_ids & set(range(100_000, 101_000)))  # dups all drop
    n_fresh_kept = len(kept_ids & set(range(101_000, 102_000)))
    assert n_fresh_kept >= 980  # FPR ~0.3% at n=20k, m=2^18, k=5


def test_pair_join_broadcast_and_shuffle_plans_agree(ray_session):
    """The adaptive join's two plans (broadcast fast path vs the fully
    distributed two-exchange shuffle) return identical joined rows,
    including in-flight dedupe of duplicate candidate pairs and inner
    (drop-unknown-id) semantics."""
    import ray.data

    from yj_schema_validator_ray.stages.dedup import (
        _unpack_binary_matrix, join_pairs_with_signatures)

    attrs = pd.DataFrame({
        "doc_id": range(10),
        "sig": [list(range(i, i + 4)) for i in range(10)],
    })
    pairs = pd.DataFrame({
        "a": [0, 0, 2, 5, 0, 7],
        "b": [1, 1, 3, 6, 1, 99],  # dup (0,1) x3; (7,99) has unknown id
    })

    def run(**kw):
        out = join_pairs_with_signatures(
            ray.data.from_pandas(pairs),
            ray.data.from_pandas(attrs).map_batches(
                lambda t: t, batch_format="pyarrow"),
            "sig", **kw).to_pandas().sort_values(["a", "b"])
        rows = {}
        for _, r in out.iterrows():
            sa = np.frombuffer(r["sig_a"], dtype="<i8")
            sb = np.frombuffer(r["sig_b"], dtype="<i8")
            rows[(int(r["a"]), int(r["b"]))] = (tuple(sa), tuple(sb))
        return rows

    bcast = run()
    shuffle = run(broadcast_max_bytes=0)
    expect = {(0, 1): ((0, 1, 2, 3), (1, 2, 3, 4)),
              (2, 3): ((2, 3, 4, 5), (3, 4, 5, 6)),
              (5, 6): ((5, 6, 7, 8), (6, 7, 8, 9))}
    assert bcast == expect
    assert shuffle == expect


def test_ngram_jaccard_exact_matches_bruteforce(ray_session):
    """The AllPairs prefix-filter plan finds EXACTLY the pairs a naive
    all-pairs Jaccard over word trigram sets finds (no candidate loss
    from prefix/length filtering)."""
    import itertools

    import ray.data

    from yj_schema_validator_ray.stages.dedup import ngram_jaccard_exact_pairs

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=30)) for _ in range(20)]
    texts += [texts[0], texts[1] + " extra tail words appended here",
              "short"]  # exact dup, near dup, sub-n-gram doc
    t = 0.3

    def grams(s):
        ws = [w.lower() for w in __import__("re").findall(r"\w+", s)]
        return {tuple(ws[i:i + 3]) for i in range(len(ws) - 2)}

    expect = {}
    for a, b in itertools.combinations(range(len(texts)), 2):
        ga, gb = grams(texts[a]), grams(texts[b])
        if not ga or not gb:
            continue
        j = len(ga & gb) / len(ga | gb)
        if j >= t:
            expect[(a, b)] = np.floor(j * 1e6 + 0.5) / 1e6

    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    out = ngram_jaccard_exact_pairs(ds, threshold=t).to_pandas()
    got = {(int(a), int(b)): j
           for a, b, j in zip(out["a"], out["b"], out["jaccard"])}
    assert got == expect
    assert (20, 0) in got or (0, 20) in got  # the exact dup surfaced

    # hot-gram chunked emission path (full_triu_max forces the blockwise
    # pair generator) must produce the identical pair set
    out2 = (ngram_jaccard_exact_pairs(ds, threshold=t, full_triu_max=4)
            .to_pandas())
    got2 = {(int(a), int(b)): j
            for a, b, j in zip(out2["a"], out2["b"], out2["jaccard"])}
    assert got2 == expect


def test_ann_ivf_full_probe_equals_bruteforce(ray_session):
    """IVF probing EVERY cell is exhaustive: results equal brute force
    exactly; fewer probes return a subset with identical sims."""
    import ray.data

    from yj_schema_validator_ray.stages.ann import (ann_topk_bruteforce,
                                                    ann_topk_ivf)

    rng = np.random.RandomState(5)
    vecs = rng.normal(size=(400, 16)).astype(np.float32)
    df = pd.DataFrame({"vec_id": range(400),
                       "embedding": [v.tolist() for v in vecs]})
    queries = {i: vecs[i].astype(np.float64) for i in range(3)}
    mk = lambda: ray.data.from_pandas(df)
    bf = (ann_topk_bruteforce(mk(), queries, k=5).to_pandas()
          .sort_values(["query_id", "vec_id"]).reset_index(drop=True))
    full = (ann_topk_ivf(mk(), queries, k=5, n_centroids=8, n_probe=8)
            .to_pandas().sort_values(["query_id", "vec_id"])
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(bf[["query_id", "vec_id"]],
                                  full[["query_id", "vec_id"]])
    assert np.allclose(bf["sim"], full["sim"])
    part = ann_topk_ivf(mk(), queries, k=5, n_centroids=8, n_probe=2).to_pandas()
    merged = part.merge(bf, on=["query_id", "vec_id"], suffixes=("_p", "_b"))
    assert np.allclose(merged["sim_p"], merged["sim_b"])  # subset, same sims


def test_embedding_dups_lsh_matches_exact(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.ann import (embedding_dup_pairs,
                                                    embedding_dup_pairs_lsh)

    rng = np.random.RandomState(3)
    M = rng.normal(size=(60, 16))
    M[50:] = M[:10]  # ids 50..59 duplicate 0..9
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": [list(map(float, r)) for r in M]})
    mk = lambda: ray.data.from_pandas(df)
    exact = embedding_dup_pairs(mk()).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    lsh = embedding_dup_pairs_lsh(mk()).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(exact[["a", "b", "sim"]],
                                  lsh[["a", "b", "sim"]])
    assert len(exact) == 10


def test_winnowing_fingerprints_properties(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import winnowing_fingerprints

    texts = ["the quick brown fox jumps over the lazy dog " * 3,
             "the quick brown fox jumps over the lazy dog " * 3,  # dup of 0
             "completely different content with other words here",
             "ab"]  # shorter than k -> no fingerprints
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(4), "text": texts}))
    out = winnowing_fingerprints(ds, k=5, w=4).to_pandas()
    by_doc = {d: g.sort_values("pos") for d, g in out.groupby("doc_id")}
    # identical docs -> identical fingerprint sets (positions included)
    pd.testing.assert_frame_equal(
        by_doc[0].drop(columns="doc_id").reset_index(drop=True),
        by_doc[1].drop(columns="doc_id").reset_index(drop=True))
    assert 3 not in by_doc  # too short
    # winnowing guarantee: gaps between selected positions <= w
    pos = by_doc[0]["pos"].to_numpy()
    assert (np.diff(pos) <= 4).all()
    # different docs share (essentially) no fingerprints
    inter = set(by_doc[0]["fingerprint"]) & set(by_doc[2]["fingerprint"])
    assert len(inter) <= 1


def test_hash_sample_deterministic_and_rate(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.sampling import hash_sample

    df = pd.DataFrame({"doc_id": range(10_000)})
    mk = lambda: ray.data.from_pandas(df)
    a = sorted(r["doc_id"] for r in hash_sample(mk(), 0.3).take_all())
    b = sorted(r["doc_id"] for r in hash_sample(mk(), 0.3).take_all())
    assert a == b  # pure per-row decision -> rerun-stable
    assert 0.27 < len(a) / 10_000 < 0.33  # close to the nominal rate
    # a higher rate strictly grows the kept set (nested samples)
    c = set(r["doc_id"] for r in hash_sample(mk(), 0.5).take_all())
    assert set(a) <= c


def test_mixture_sample_per_source(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.sampling import mixture_sample

    df = pd.DataFrame({"doc_id": range(6000),
                       "source": ["a", "b", "c"] * 2000})
    out = mixture_sample(ray.data.from_pandas(df),
                         {"a": 1.0, "b": 0.5}).to_pandas()
    by = out.groupby("source").size()
    assert by.get("a", 0) == 2000          # rate 1.0 keeps everything
    assert 850 < by.get("b", 0) < 1150     # ~0.5
    assert "c" not in by.index             # absent source dropped


def test_pack_sequences_prefix_sum(ray_session):
    """The distributed two-phase prefix sum equals a single-process
    cumsum, across bucket boundaries and shuffled input blocks."""
    import ray.data

    from yj_schema_validator_ray.stages.sampling import pack_sequences

    rng = np.random.RandomState(11)
    n = 700  # spans multiple 256-doc buckets
    texts = [" ".join(["tok"] * rng.randint(1, 40)) for _ in range(n)]
    df = pd.DataFrame({"doc_id": range(n), "text": texts})
    ds = ray.data.from_pandas(df).random_shuffle(seed=5)  # order-insensitive
    out = (pack_sequences(ds, budget=100).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    ntok = df["text"].str.count(r"\w+").astype("int64")
    expect_off = ntok.cumsum().shift(fill_value=0).astype("int64")
    assert (out["n_tokens"].to_numpy() == ntok.to_numpy()).all()
    assert (out["tok_offset"].to_numpy() == expect_off.to_numpy()).all()
    assert (out["seq_id"].to_numpy() == (expect_off // 100).to_numpy()).all()


def test_vocab_top_terms(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import vocab_top_terms

    texts = ["apple banana apple", "banana cherry", "apple date date date"]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(3), "text": texts}))
    out = (vocab_top_terms(ds, k=3).to_pandas()
           .sort_values(["tf", "term"], ascending=[False, True])
           .reset_index(drop=True))
    assert list(out["term"]) == ["apple", "date", "banana"]
    assert list(out["tf"]) == [3, 3, 2]
    assert list(out["df"]) == [2, 1, 2]


def test_stratified_sample_exact_sizes(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.sampling import stratified_sample

    df = pd.DataFrame({"doc_id": range(900),
                       "source": ["a", "b", "c"] * 300})
    out = stratified_sample(ray.data.from_pandas(df), 40).to_pandas()
    assert out.groupby("source").size().to_dict() == {"a": 40, "b": 40, "c": 40}
    # rerun-stable (pure hash ranking) and nested under a bigger N
    out2 = stratified_sample(ray.data.from_pandas(df), 40).to_pandas()
    assert set(map(tuple, out.values)) == set(map(tuple, out2.values))
    big = stratified_sample(ray.data.from_pandas(df), 80).to_pandas()
    assert set(out["doc_id"]) <= set(big["doc_id"])


def test_heavy_hitters_matches_exact_topk(ray_session):
    """MG sketch + exact recount finds the true top-k on a Zipfian
    vocabulary much larger than the sketch capacity."""
    import ray.data

    from yj_schema_validator_ray.stages.text import heavy_hitters

    rng = np.random.RandomState(13)
    vocab = np.array([f"w{i}" for i in range(2000)])
    # Zipf draw: heavy head, long tail
    freq = rng.zipf(1.3, size=60_000)
    words = vocab[(freq - 1) % len(vocab)]
    texts = [" ".join(words[i * 60:(i + 1) * 60]) for i in range(1000)]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(len(texts)), "text": texts}))
    out = (heavy_hitters(ds, k=10, capacity=400).to_pandas()
           .sort_values(["n", "term"], ascending=[False, True])
           .reset_index(drop=True))
    vc = pd.Series(words).value_counts()
    expect = (vc.reset_index().rename(columns={"index": "term", "count": "n"})
              .sort_values(["n", "term"], ascending=[False, True]).head(10)
              .reset_index(drop=True))
    assert list(out["term"]) == list(expect["term"])
    assert list(out["n"]) == list(expect["n"].astype(int))


def test_chunk_documents_windows(ray_session):
    """Sliding windows: full coverage with overlap, short docs yield one
    chunk, the tail chunk may be short, reconstruction round-trips."""
    import hashlib

    import ray.data

    from yj_schema_validator_ray.stages.text import chunk_documents

    texts = ["a" * 5, "b" * 500, "c" * 501, "x" * 1300]
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": range(4), "text": texts}))
    out = chunk_documents(ds, size=500, step=400).to_pandas()
    by = {d: g.sort_values("chunk_idx") for d, g in out.groupby("doc_id")}
    assert len(by[0]) == 1 and by[0]["chunk_chars"].iloc[0] == 5
    assert len(by[1]) == 1                     # exactly size -> one chunk
    assert len(by[2]) == 2                     # one char over -> two
    assert list(by[3]["chunk_chars"]) == [500, 500, 500]  # 1300 chars, 3 windows
    assert list(by[3]["start_char"]) == [0, 400, 800]
    # shas match the actual slices (coverage + content round-trip)
    for r in by[3].itertuples():
        piece = texts[3][r.start_char:r.start_char + 500]
        assert r.chunk_sha256 == hashlib.sha256(piece.encode()).hexdigest()


def test_weighted_sample_rate_tracks_length(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.sampling import weighted_sample

    long = ["tok " * 400] * 2000   # rate 1.0 -> all kept
    half = ["tok " * 100] * 2000   # rate 0.5
    df = pd.DataFrame({"doc_id": range(4000), "text": long + half})
    out = weighted_sample(ray.data.from_pandas(df), scale_tokens=200).to_pandas()
    kept = set(out["doc_id"])
    assert set(range(2000)) <= kept          # full-rate docs all survive
    frac_half = len(kept & set(range(2000, 4000))) / 2000
    assert 0.45 < frac_half < 0.55           # ~0.5 keep rate
    out2 = weighted_sample(ray.data.from_pandas(df), scale_tokens=200).to_pandas()
    assert kept == set(out2["doc_id"])       # deterministic


def test_scrub_pii_counts(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import scrub_pii

    texts = ["contact me at a.person@example.com or b@x.io",
             "card 1234567890123456 and pin 123",
             "nothing sensitive here"]
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": range(3), "text": texts}))
    out = {r["doc_id"]: r for r in scrub_pii(ds).take_all()}
    assert out[0]["n_emails"] == 2 and out[0]["n_longnums"] == 0
    assert out[1]["n_emails"] == 0 and out[1]["n_longnums"] == 1
    assert out[2]["n_emails"] == 0 and out[2]["n_longnums"] == 0
    # scrubbed length reflects the replacements
    assert out[0]["clean_len"] == len(
        "contact me at <EMAIL> or <EMAIL>")
    assert out[1]["clean_len"] == len("card <NUM> and pin 123")


def _ppm(w, h, gradient=True):
    arr = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            arr[y, x] = (x * 40 % 256, y * 40 % 256, (x + y) % 256)
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + arr.tobytes(), arr


def _bmp24(arr):
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = bytes(arr[y, :, ::-1].tobytes())  # RGB -> BGR
        rows += row + b"\x00" * (stride - len(row))
    data_off = 54
    size = data_off + len(rows)
    head = (b"BM" + size.to_bytes(4, "little") + b"\x00" * 4
            + data_off.to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(rows).to_bytes(4, "little")
            + b"\x00" * 16)
    return head + bytes(rows)


def test_real_image_decode_ppm_and_bmp():
    from yj_schema_validator_ray.stages.multimodal import decode_image

    payload, arr = _ppm(5, 3)
    assert (decode_image(payload) == arr).all()
    assert (decode_image(_bmp24(arr)) == arr).all()


def test_resize_and_features_real():
    from yj_schema_validator_ray.stages.multimodal import (
        FEATURE_DIM, ImageResizer, MediaFeaturizer, decode_image,
        image_features, resize_nearest)

    payload, arr = _ppm(8, 4)
    # nearest resize halves cleanly: every other pixel
    small = resize_nearest(arr, 4, 2)
    assert (small == arr[::2, ::2]).all()
    # featurizer with the real decoder: first 3 dims are channel means
    f = image_features(arr)
    assert len(f) == FEATURE_DIM
    assert np.allclose(f[:3], arr.reshape(-1, 3).mean(axis=0) / 255.0,
                       atol=1e-6)
    batch = pa.table({"media_id": pa.array([1], pa.int64()),
                      "mime": pa.array(["image/x-portable-pixmap"]),
                      "payload": pa.array([payload], pa.binary())})
    out = MediaFeaturizer(use_real_decoder=True)(batch).to_pylist()
    assert np.allclose(out[0]["feature"], f)
    # resizer round-trips through a REAL decode->resize->PPM encode
    rz = ImageResizer(width=4, height=2)(batch).to_pylist()
    assert rz[0]["mime"] == "image/x-portable-pixmap"
    assert (decode_image(rz[0]["payload"]) == small).all()


def test_embedding_dups_lsh_hot_bucket_blockwise_exact(ray_session):
    """Buckets larger than max_bucket are scored exactly in bounded
    blocks, never truncated — a tiny max_bucket must give the same
    pairs as the exact all-pairs baseline."""
    import ray.data

    from yj_schema_validator_ray.stages.ann import (embedding_dup_pairs,
                                                    embedding_dup_pairs_lsh)

    rng = np.random.RandomState(3)
    M = rng.normal(size=(60, 16))
    M[50:] = M[:10]  # ids 50..59 duplicate 0..9
    df = pd.DataFrame({"vec_id": range(60),
                       "embedding": [list(map(float, r)) for r in M]})
    mk = lambda: ray.data.from_pandas(df)
    exact = embedding_dup_pairs(mk()).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    lsh = embedding_dup_pairs_lsh(mk(), max_bucket=7).to_pandas().sort_values(
        ["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(exact[["a", "b", "sim"]],
                                  lsh[["a", "b", "sim"]])
    assert len(exact) == 10


def test_heavy_hitters_mg_merge_bound(ray_session):
    """A hitter above the mergeable-MG survival bound
    (freq > N/(capacity+1)) spread evenly across MANY blocks — while
    every block also carries its own unique high-count filler terms —
    must survive the hierarchical merge and come back with its EXACT
    global count from the recount pass."""
    import ray.data

    from yj_schema_validator_ray.stages.text import heavy_hitters

    n_blocks = 40
    frames = []
    for b in range(n_blocks):
        # per-block: hitter x30, plus 12 block-unique fillers x20 each
        words = ["hot"] * 30
        for f in range(12):
            words += [f"blk{b}f{f}"] * 20
        frames.append(pd.DataFrame(
            {"doc_id": [b], "text": [" ".join(words)]}))
    df = pd.concat(frames, ignore_index=True)
    # N = 40*(30+240) = 10800; capacity 10 -> survival bound
    # N/(capacity+1) = 981.8 < hitter 1200 (strictly above the bound)
    ds = ray.data.from_pandas(df).repartition(8)
    out = heavy_hitters(ds, k=5, capacity=10).to_pandas()
    got = dict(zip(out["term"], out["n"]))
    assert got.get("hot") == 1200


def test_png_roundtrip_all_filters():
    """encode_png -> decode_image is identity for every PNG filter type
    and odd shapes (no Ray needed)."""
    from yj_schema_validator_ray.stages.multimodal import (decode_image,
                                                           encode_png)

    rng = np.random.RandomState(0)
    for ft in range(5):
        for shape in [(1, 1, 3), (7, 13, 3), (16, 16, 3), (5, 1, 3)]:
            img = rng.randint(0, 256, size=shape, dtype=np.uint8)
            assert (decode_image(encode_png(img, filter_type=ft)) == img).all()


def test_png_decode_spec_vector():
    """Independent RFC-2083 check: a PNG assembled by hand (raw
    scanlines with hand-computed Sub and Paeth filter bytes, stdlib
    zlib/struct only — NOT via encode_png) decodes to the known pixels,
    so a matched encoder/decoder bug cannot hide."""
    import struct
    import zlib

    from yj_schema_validator_ray.stages.multimodal import decode_image

    # pixels: row0 (10,20,30),(40,60,80); row1 (5,5,5),(250,0,128)
    # row0 Sub:   10,20,30 then 40-10,60-20,80-30 = 30,40,50
    # row1 Paeth: preds are the up pixel for every channel ->
    #             (5-10,5-20,5-30)%256=(251,241,231) and
    #             (250-40,0-60,128-80)%256=(210,196,48)
    raw = (bytes([1, 10, 20, 30, 30, 40, 50])
           + bytes([4, 251, 241, 231, 210, 196, 48]))
    sig = b"\x89PNG\r\n\x1a\n"

    def chunk(typ, data):
        crc = zlib.crc32(typ + data) & 0xFFFFFFFF
        return len(data).to_bytes(4, "big") + typ + data + crc.to_bytes(4, "big")

    png = (sig + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
    out = decode_image(png)
    expect = np.array([[[10, 20, 30], [40, 60, 80]],
                       [[5, 5, 5], [250, 0, 128]]], dtype=np.uint8)
    assert (out == expect).all()


def test_png_resizer_and_pixel_stats(ray_session):
    """ImageResizer treats PNG as decodable (real resize, PPM out) and
    PngPixelStats sums match a direct numpy decode."""
    import ray.data

    from yj_schema_validator_ray.stages.multimodal import (ImageResizer,
                                                           PngPixelStats,
                                                           decode_image,
                                                           encode_png)

    rng = np.random.RandomState(5)
    imgs = [rng.randint(0, 256, size=(9, 11, 3), dtype=np.uint8)
            for _ in range(4)]
    df = pd.DataFrame({"media_id": range(4),
                       "payload": [encode_png(im, filter_type=i % 5)
                                   for i, im in enumerate(imgs)]})
    ds = ray.data.from_pandas(df)
    rs = ds.map_batches(ImageResizer, batch_format="pyarrow", batch_size=4,
                        concurrency=1).to_pandas()
    assert set(rs["mime"]) == {"image/x-portable-pixmap"}  # real path
    stats = (ds.map_batches(PngPixelStats, batch_format="pyarrow",
                            concurrency=1)
             .to_pandas().sort_values("media_id").reset_index(drop=True))
    for i, im in enumerate(imgs):
        assert stats.loc[i, "width"] == 11 and stats.loc[i, "height"] == 9
        assert (stats.loc[i, ["px_sum_r", "px_sum_g", "px_sum_b"]].to_numpy()
                == im.sum(axis=(0, 1))).all()


def test_jpeg_flat_blocks_bit_exact():
    """Baseline-JPEG round trip is BIT-EXACT for per-8x8-block-constant
    grayscale with the default DC step of 8 (flat blocks are DC-only and
    the step divides 8*(level-128)) — with and without restart markers.
    This is the property the media_features_jpeg SQL oracle relies on."""
    from yj_schema_validator_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(11)
    levels = rng.randint(0, 256, size=(3, 4))
    img = np.repeat(np.repeat(levels, 8, axis=0), 8, axis=1).astype(np.uint8)
    for ri in (0, 1, 3, 7):
        out = decode_jpeg(encode_jpeg(img, restart_interval=ri))
        assert out.shape == (24, 32, 3)
        assert (out == img[:, :, None]).all(), f"restart_interval={ri}"


def test_jpeg_decode_spec_vector():
    """Independent T.81 check: a JPEG assembled BY HAND (markers,
    canonical DHT, hand-packed Huffman bits — NOT via encode_jpeg)
    decodes to the known pixels, so a matched encoder/decoder bug
    cannot hide.  One 8x8 grayscale block: DC table maps code '01' ->
    category 3, value bits '101' = diff 5; AC table maps '0' -> EOB;
    qtab DC step 16 -> dequantized DC 80 -> every pixel 80/8+128 = 138.
    Entropy bytes: '01'+'101'+'0' padded with 1s = 01101011 = 0x6B."""
    import struct

    from yj_schema_validator_ray.stages.jpeg import decode_jpeg

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    dqt = seg(0xDB, bytes([0]) + bytes([16] * 64))
    sof = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
              + bytes([1, 1, 0x11, 0]))
    dc_bits = [0] * 16
    dc_bits[1] = 2  # two codes of length 2: 00 -> 0, 01 -> 3
    dht_dc = seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes([0, 3]))
    ac_bits = [0] * 16
    ac_bits[0] = 1  # one code of length 1: 0 -> EOB
    dht_ac = seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes([0x00]))
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    jpg = (b"\xff\xd8" + dqt + sof + dht_dc + dht_ac + sos
           + bytes([0x6B]) + b"\xff\xd9")
    out = decode_jpeg(jpg)
    assert out.shape == (8, 8, 3)
    assert (out == 138).all()


def test_jpeg_color_roundtrip_444_420():
    """Color paths: flat-per-MCU color survives 4:2:0 up to the YCbCr
    round-trip (+-1); smooth gradients stay within the quantization
    bound for both subsamplings; restart markers change nothing."""
    from yj_schema_validator_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(5)
    cells = rng.randint(30, 220, size=(2, 3, 3))
    flat = np.repeat(np.repeat(cells, 16, axis=0), 16, axis=1).astype(np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(flat, subsampling=sub)).astype(int)
        assert np.abs(out - flat.astype(int)).max() <= 1, sub

    yy, xx = np.mgrid[0:24, 0:40]
    smooth = np.stack([60 + yy * 2, 80 + xx * 2, 100 + yy + xx],
                      axis=-1).astype(np.uint8)
    for sub in ("444", "420"):
        out = decode_jpeg(encode_jpeg(smooth, subsampling=sub)).astype(int)
        assert np.abs(out - smooth.astype(int)).max() <= 16, sub
    a = decode_jpeg(encode_jpeg(smooth, subsampling="420"))
    b = decode_jpeg(encode_jpeg(smooth, subsampling="420", restart_interval=2))
    assert (a == b).all()


def test_jpeg_odd_sizes_and_decode_image_dispatch():
    """Non-multiple-of-8 shapes crop back to the requested size, and
    decode_image dispatches on the FFD8 magic."""
    from yj_schema_validator_ray.stages.jpeg import decode_jpeg, encode_jpeg
    from yj_schema_validator_ray.stages.multimodal import decode_image

    g = (np.arange(13)[:, None] * 9 + np.arange(21)[None, :] * 4) % 200
    g = (g + 20).astype(np.uint8)
    payload = encode_jpeg(g)
    out = decode_jpeg(payload)
    assert out.shape == (13, 21, 3)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 16
    assert (decode_image(payload) == out).all()
    color = np.stack([g, g[::-1], g[:, ::-1]], axis=-1)
    assert decode_jpeg(encode_jpeg(color, subsampling="420")).shape \
        == (13, 21, 3)


def test_attach_dim_adaptive_plans_agree(ray_session):
    """attach_dim_adaptive's broadcast and shuffle plans return identical
    rows for both how='left' and how='inner', including FK orphans and
    dim rows nobody references."""
    import ray.data

    from yj_schema_validator_ray.stages.dimjoin import attach_dim_adaptive

    fact = pd.DataFrame({
        "k": pd.Series([1, 2, 3, 99, 2], dtype="int64"),  # 99 is an orphan
        "v": pd.Series([10, 20, 30, 40, 50], dtype="int64"),
    })
    dim = pd.DataFrame({
        "dk": pd.Series([1, 2, 3, 4], dtype="int64"),  # 4 unreferenced
        "name": ["a", "b", "c", "d"],
        "seg": ["x", "y", "z", "w"],
    })

    def run(how, **kw):
        out = attach_dim_adaptive(
            ray.data.from_pandas(fact).map_batches(
                lambda t: t, batch_format="pyarrow"),
            "k",
            ray.data.from_pandas(dim).map_batches(
                lambda t: t, batch_format="pyarrow"),
            "dk", ["name", "seg"], how=how, **kw).to_pandas()
        out["name"] = out["name"].astype(object).where(out["name"].notna(),
                                                       None)
        out["seg"] = out["seg"].astype(object).where(out["seg"].notna(),
                                                     None)
        return sorted(map(tuple, out[["k", "v", "name", "seg"]]
                          .itertuples(index=False)))

    for how in ("left", "inner"):
        bcast = run(how)
        shuffle = run(how, broadcast_max_bytes=0)
        assert bcast == shuffle, how
        if how == "inner":
            assert bcast == [(1, 10, "a", "x"), (2, 20, "b", "y"),
                             (2, 50, "b", "y"), (3, 30, "c", "z")]
        else:
            assert (99, 40, None, None) in bcast and len(bcast) == 5


def test_relational_integrity_edge_plans_agree(ray_session, tmp_path):
    """The FK-audit broadcast and exchange plans count rows/orphans
    identically, including referencing-side duplicates and orphans."""
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import (
        relational_integrity)

    # minimal warehouse: 2 orphan orders (custkeys 777, 888), dup refs
    pq.write_table(pa.table({
        "o_orderkey": pa.array(range(8), pa.int64()),
        "o_custkey": pa.array([1, 1, 2, 3, 777, 888, 2, 1], pa.int64()),
    }), tmp_path / "orders.parquet")
    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "c_nationkey": pa.array([0, 0, 1, 9], pa.int64()),  # 9 orphan
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "n_nationkey": pa.array([0, 1], pa.int64()),
        "n_regionkey": pa.array([0, 5], pa.int64()),  # 5 orphan
    }), tmp_path / "nation.parquet")
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0], pa.int64()),
    }), tmp_path / "region.parquet")
    pq.write_table(pa.table({
        "l_orderkey": pa.array([0, 0, 1, 42], pa.int64()),  # 42 orphan
    }), tmp_path / "lineitem.parquet")

    expect = pd.DataFrame({
        "fk": ["customer.c_nationkey->nation",
               "lineitem.l_orderkey->orders",
               "nation.n_regionkey->region",
               "orders.o_custkey->customer"],
        "n_rows": pd.Series([4, 4, 2, 8], dtype="int64"),
        "n_orphans": pd.Series([1, 1, 1, 2], dtype="int64"),
    })
    for budget in (256 << 20, 0):  # broadcast plan, then exchange plan
        got = (relational_integrity(str(tmp_path),
                                    broadcast_max_bytes=budget)
               .sort_values("fk").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, expect)


def test_kmeans_training_sample_spans_blocks(ray_session):
    """The k-means training sample must be a hash sample over the WHOLE
    dataset, not a prefix of the first blocks: with ids 0..4095 split
    into 8 ordered blocks and sample_size=256, a prefix would only see
    ids < 512; the hash gate must pick ids from every block."""
    import ray.data

    from yj_schema_validator_ray.stages.ann import train_kmeans
    from yj_schema_validator_ray.stages.sampling import hash_sample

    n, dim = 4096, 8
    rng = np.random.RandomState(3)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(rng.randn(n, dim).tolist(),
                              pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    sampled_ids = (hash_sample(ds, 256 / n, id_col="vec_id")
                   .to_pandas()["vec_id"].to_numpy())
    # every eighth of the id range contributes (prefix would give one)
    octants = set(sampled_ids // (n // 8))
    assert octants == set(range(8)), octants
    cent = train_kmeans(ds, n_centroids=4, sample_size=256)
    assert cent.shape == (4, dim)
    assert np.isfinite(cent).all()


def test_attach_dim_adaptive_semijoin_and_int_payload(ray_session):
    """The two shapes q3/q14 rely on: dim_cols=[] is a pure semi-join
    (inner) and an int64 payload under how='left' must null-fill without
    collapsing to float64 — identical rows under both plans."""
    import ray.data

    from yj_schema_validator_ray.stages.dimjoin import attach_dim_adaptive

    fact = pd.DataFrame({
        "k": pd.Series([1, 2, 3, 99, 2], dtype="int64"),
        "v": pd.Series([10, 20, 30, 40, 50], dtype="int64"),
    })
    dim = pd.DataFrame({
        "dk": pd.Series([1, 2, 4], dtype="int64"),
        "flag": pd.Series([7, 8, 9], dtype="int64"),
    })

    def run(dim_cols, how, **kw):
        out = attach_dim_adaptive(
            ray.data.from_pandas(fact).map_batches(
                lambda t: t, batch_format="pyarrow"),
            "k",
            ray.data.from_pandas(dim).map_batches(
                lambda t: t, batch_format="pyarrow"),
            "dk", dim_cols, how=how, **kw).to_pandas()
        cols = ["k", "v"] + dim_cols
        if dim_cols:
            out[dim_cols[0]] = out[dim_cols[0]].astype("Int64")
        return sorted(map(tuple, out[cols].fillna(-1).itertuples(
            index=False)))

    # semi-join: inner with no payload columns
    for kw in ({}, {"broadcast_max_bytes": 0}):
        assert run([], "inner", **kw) == [(1, 10), (2, 20), (2, 50)]
    # int64 payload, left: misses null (here -1 via fillna), not float
    a = run(["flag"], "left")
    b = run(["flag"], "left", broadcast_max_bytes=0)
    assert a == b == [(1, 10, 7), (2, 20, 8), (2, 50, 8), (3, 30, -1),
                      (99, 40, -1)]


def test_count_min_sketch_properties(ray_session):
    """CMS: never underestimates, eps-bound holds at the configured
    width, merge(blob) == single-pass, estimates exact when w >> items."""
    from yj_schema_validator_ray.stages.cms import (CountMinSketch,
                                                    _term_hash)

    rng = np.random.RandomState(21)
    terms = np.array([f"w{i}" for i in range(500)], dtype=object)
    counts = rng.zipf(1.5, 500).astype(np.int64)
    h = _term_hash(terms)

    one = CountMinSketch(w=4096, d=4)
    one.add_hashed(h, counts)
    est = one.estimate_hashed(h)
    assert (est >= counts).all()
    import math
    assert (est <= counts + math.ceil(math.e / 4096 * counts.sum())).all()

    # split-merge equals single-pass
    a, b = CountMinSketch(w=4096, d=4), CountMinSketch(w=4096, d=4)
    a.add_hashed(h[:250], counts[:250])
    b.add_hashed(h[250:], counts[250:])
    a.merge_blob(b.to_blob())
    assert (a.table == one.table).all()

    # tiny stream in a wide sketch: exact
    small = CountMinSketch(w=1 << 16, d=4)
    small.add_hashed(h[:20], counts[:20])
    assert (small.estimate_hashed(h[:20]) == counts[:20]).all()
