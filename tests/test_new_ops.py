"""Edge cases for the tf-idf / confusion / zscore / outer-join /
distinct / grouped-top-k / histogram wave (sf0.001 oracle parity lives
in test_correctness_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from yj_schema_validator_ray.stages.text import tfidf_top_terms


def _ds(tbl, parts=1):
    import ray

    ds = ray.data.from_arrow(tbl)
    return ds.repartition(parts) if parts > 1 else ds


def test_tfidf_tiebreaks_and_partition_invariance(ray_session):
    # doc 0: 'rare' and 'common' both tf=2 -> rarer df wins rank 1;
    # doc 1: 'aa'/'bb' tie on (tf, df) -> lexicographic
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "rare rare common common filler",
            "bb aa aa bb",
            "common one",
            "common two",
        ]),
    })
    expected_doc0 = [("rare", 1), ("common", 2), ("filler", 3)]
    expected_doc1 = [("aa", 1), ("bb", 2)]
    for parts in (1, 4):
        got = (tfidf_top_terms(_ds(docs, parts)).to_pandas()
               .sort_values(["doc_id", "rnk"]).reset_index(drop=True))
        d0 = got[got.doc_id == 0][["term", "rnk"]].to_records(index=False)
        assert [tuple(x) for x in d0] == expected_doc0, parts
        d1 = got[got.doc_id == 1][["term", "rnk"]].to_records(index=False)
        assert [tuple(x) for x in d1] == expected_doc1, parts
        # df is global: 'common' appears in 3 docs even when split
        assert (got[got.term == "common"]["df"] == 3).all()


def test_tfidf_vocab_bound(ray_session):
    docs = pa.table({"doc_id": pa.array([0], pa.int64()),
                     "text": pa.array(["a b c d e"])})
    try:
        tfidf_top_terms(_ds(docs), max_vocab=2)
    except ValueError as e:
        assert "max_vocab" in str(e)
    else:
        raise AssertionError("expected ValueError past the vocab bound")


def test_customer_order_totals_keeps_zero_order_customers(
        ray_session, tmp_path):
    from yj_schema_validator_ray.pipelines.relational import (
        customer_order_totals)

    pq.write_table(pa.table({
        "c_custkey": pa.array([1, 2, 3], pa.int64()),
        "c_mktsegment": pa.array(["A", "B", "A"]),
    }), tmp_path / "customer.parquet")
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([10.01, 0.5, 2.0], pa.float64()),
    }), tmp_path / "orders.parquet")

    got = (customer_order_totals(str(tmp_path)).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert got["c_custkey"].tolist() == [1, 2, 3]
    assert got["order_count"].tolist() == [2, 0, 1]
    assert got["total_price_cents"].tolist() == [1051, 0, 200]


def test_value_histogram_constant_column(ray_session, tmp_path):
    from yj_schema_validator_ray.pipelines.relational import (
        events_value_histogram)

    pq.write_table(pa.table({
        "value": pa.array([7.5] * 10, pa.float64()),
    }), tmp_path / "events.parquet")
    got = events_value_histogram(str(tmp_path)).to_pandas()
    assert got["bucket"].tolist() == [0]
    assert got["n"].tolist() == [10]


def test_docs_top_per_group_small_groups(ray_session, tmp_path):
    from yj_schema_validator_ray.pipelines.relational import (
        docs_top_per_group)

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "source": pa.array(["s1", "s1", "s1", "s2"]),
        "lang": pa.array(["en", "en", "en", "de"]),
        "n_chars": pa.array([5, 9, 9, 4], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = (docs_top_per_group(str(tmp_path), k=2).to_pandas()
           .sort_values(["source", "lang", "rnk"]).reset_index(drop=True))
    # ties on n_chars=9 break by doc_id ASC; singleton group keeps 1 row
    assert got[["doc_id", "rnk"]].values.tolist() == [[1, 1], [2, 2], [3, 1]]


def test_feature_zscore_drops_constant_groups(ray_session, tmp_path):
    from yj_schema_validator_ray.pipelines.curation import feature_zscore

    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": pa.array(["en", "en", "de", "fr"]),
        "n_chars": pa.array([10, 20, 7, 7], pa.int64()),
    }), tmp_path / "documents.parquet")
    got = (feature_zscore(str(tmp_path)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # de and fr are singleton/constant groups (std=0) -> filtered
    assert got["lang"].tolist() == ["en", "en"]
    assert np.allclose(got["z"].to_numpy(), [-1.0, 1.0])


def test_collect_small_arrow_handles_empty_blocks(ray_session):
    import ray

    from yj_schema_validator_ray.util import collect_small_arrow

    ds = ray.data.from_arrow(pa.table({"x": pa.array([1, 2], pa.int64())}))
    # repartition far beyond the row count -> schema-less empty blocks
    t = collect_small_arrow(ds.repartition(16))
    assert sorted(t.column("x").to_pylist()) == [1, 2]


def test_dup_ngram_fraction_cross_doc(ray_session):
    from yj_schema_validator_ray.stages.text import dup_ngram_fraction

    # docs 0/1 share the 3-gram "a b c"; doc 2 is too short (2 tokens);
    # doc 3 has no shared grams; doc 0 repeats its shared gram twice
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "a b c x a b c",   # grams: abc,bcx,cxa,xab,abc -> 2 dup pos
            "z a b c q",       # abc shared -> 1 dup pos of 3
            "too short",
            "u v w x y",
        ]),
    })
    for parts in (1, 4):
        got = (dup_ngram_fraction(_ds(docs, parts), n=3).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert got["doc_id"].tolist() == [0, 1, 3]  # doc 2 absent
        assert got["n_grams"].tolist() == [5, 3, 3]
        assert got["n_dup_grams"].tolist() == [2, 1, 0], parts


def test_tfidf_distributed_matches_broadcast(ray_session):
    from yj_schema_validator_ray.stages.text import (
        tfidf_top_terms, tfidf_top_terms_distributed)

    rng = np.random.RandomState(11)
    vocab = np.array([f"w{i}" for i in range(60)])
    texts = [" ".join(vocab[rng.randint(0, 60, size=rng.randint(5, 40))])
             for _ in range(300)]
    docs = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                     "text": pa.array(texts)})
    a = (tfidf_top_terms(_ds(docs, 8)).to_pandas()
         .sort_values(["doc_id", "rnk"]).reset_index(drop=True))
    b = (tfidf_top_terms_distributed(_ds(docs, 8)).to_pandas()
         .sort_values(["doc_id", "rnk"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a[["doc_id", "term", "tf", "df", "rnk"]],
                                  b[["doc_id", "term", "tf", "df", "rnk"]])


def test_mega_bucket_star_edges_keep_members_connected(ray_session):
    # 250 identical docs: one LSH bucket larger than the 200-pair cap.
    # Before the star-edge fix, members 200..249 silently got NO
    # candidate pairs; now every member must appear in some pair.
    from yj_schema_validator_ray.stages.dedup import (minhash_lsh_pairs,
                                                      simhash_pairs)

    n = 250
    docs = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(["the same exact document text here"] * n),
    })
    for fn in (minhash_lsh_pairs, simhash_pairs):
        pairs = fn(_ds(docs, 2)).to_pandas()
        covered = set(pairs["a"]) | set(pairs["b"])
        assert covered == set(range(n)), fn.__name__


def test_union_by_name_conflicting_types_raise(ray_session):
    import ray

    from yj_schema_validator_ray.util import union_by_name

    a = ray.data.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
    b = ray.data.from_arrow(pa.table({"x": pa.array(["s"], pa.string())}))
    try:
        union_by_name([a, b])
    except ValueError as e:
        assert "conflicting" in str(e)
    else:
        raise AssertionError("expected ValueError on type conflict")


def test_union_by_name_fills_missing_with_nulls(ray_session):
    import ray

    from yj_schema_validator_ray.util import union_by_name

    a = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "lang": pa.array(["en", "de"])}))
    b = ray.data.from_arrow(pa.table({
        "id": pa.array([3], pa.int64()),
        "n": pa.array([7], pa.int64())}))
    got = (union_by_name([a, b]).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert list(got.columns) == ["id", "lang", "n"]
    assert got["lang"].tolist()[:2] == ["en", "de"]
    assert pd.isna(got["lang"].iloc[2])
    assert pd.isna(got["n"].iloc[0]) and got["n"].iloc[2] == 7


def test_embedding_norm_stats_empty_vector(ray_session):
    from yj_schema_validator_ray.stages.ann import embedding_norm_stats

    ds = _ds(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[0.5, 2.0], []],
                              pa.list_(pa.float32())),
    }))
    got = (embedding_norm_stats(ds).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    assert got["dim"].tolist() == [2, 0]
    # floor(1e6*0.25) + floor(1e6*4.0) = 250000 + 4000000
    assert got["q_norm_sum"].tolist() == [4250000, 0]


def test_embedding_norm_stats_null_elements(ray_session):
    # element-level nulls inside a vector: SQL sum() skips NULL terms, so
    # the engine must contribute exactly 0 for them (never NaN->INT64_MIN)
    from yj_schema_validator_ray.stages.ann import embedding_norm_stats

    ds = _ds(pa.table({
        "vec_id": pa.array([0], pa.int64()),
        "embedding": pa.array([[0.5, None, 2.0]], pa.list_(pa.float32())),
    }))
    got = embedding_norm_stats(ds).to_pandas()
    assert got["dim"].tolist() == [3]
    assert got["q_norm_sum"].tolist() == [4250000]


def test_mixed_mega_bucket_keeps_small_sha_groups_pair_complete():
    # A band bucket larger than the cap that MIXES several small same-sha
    # groups: every within-group pair must still be emitted (the capped
    # head+star regime alone would drop tail-tail pairs of late groups).
    from yj_schema_validator_ray.stages.dedup import _emit_band_pairs

    groups = []  # (sha64, simhash, id_range) — same chunk0 val for all
    base = 0x1234
    for gi in range(5):  # 5 groups x 60 = 300 members in one bucket
        sig = base | (gi << 16)  # chunk0 val identical, chunk1 differs
        ids = np.arange(gi * 60, gi * 60 + 60, dtype=np.int64)
        groups.append((gi + 1, sig, ids))
    rows = {"chunk": [], "val": [], "doc_id": [], "simhash": [],
            "sha64": []}
    for sha64, sig, ids in groups:
        rows["chunk"].extend([0] * len(ids))
        rows["val"].extend([base] * len(ids))
        rows["doc_id"].extend(ids.tolist())
        rows["simhash"].extend([sig] * len(ids))
        rows["sha64"].extend([sha64] * len(ids))
    g = pd.DataFrame({k: pd.Series(v, dtype="int64")
                      for k, v in rows.items()})
    # shuffle row order: emission must not depend on input order
    g = g.sample(frac=1.0, random_state=7).reset_index(drop=True)
    pairs = _emit_band_pairs(g, max_hamming=3, cap=200)
    got = set(zip(pairs["a"].tolist(), pairs["b"].tolist()))
    for sha64, sig, ids in groups:
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                assert (ids[i], ids[j]) in got, (sha64, ids[i], ids[j])


def test_epoch_mixture_upsampling_reference():
    """epoch_mixture == the per-row reference: floor(rate) full epochs
    plus one md5-gated fractional epoch keyed on (id, epoch); rate<1 is
    pure sampling, unbudgeted sources drop, epochs are 0-based."""
    import hashlib

    import ray

    from yj_schema_validator_ray.stages.sampling import (_hex_threshold,
                                                         epoch_mixture)

    n = 400
    rng = np.random.RandomState(5)
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "source": pa.array(rng.choice(["a", "b", "c"], n)),
    })
    rates = {"a": 2.5, "b": 0.3}  # c dropped
    got = (epoch_mixture(ray.data.from_arrow(tbl).repartition(4),
                         rates).to_pandas()
           .sort_values(["doc_id", "epoch"]).reset_index(drop=True))
    exp_rows = []
    for d, s in zip(tbl.column("doc_id").to_pylist(),
                    tbl.column("source").to_pylist()):
        r = rates.get(s)
        if r is None:
            continue
        for e in range(int(np.floor(r))):
            exp_rows.append((d, s, e))
        e = int(np.floor(r))
        if e < int(np.ceil(r)):
            hx = hashlib.md5(f"{d}:{e}".encode()).hexdigest()[:8]
            if hx < _hex_threshold(r - np.floor(r)):
                exp_rows.append((d, s, e))
    exp = pd.DataFrame(exp_rows, columns=["doc_id", "source", "epoch"])
    assert got[["doc_id", "source", "epoch"]].astype(
        {"doc_id": "int64", "epoch": "int64"}).values.tolist() \
        == exp.values.tolist()
    # sanity: upsampled source really repeats, fractional epoch partial
    a = got[got["source"] == "a"]
    assert set(a["epoch"]) == {0, 1, 2}
    n_a = (tbl.column("source").to_pylist().count("a"))
    assert len(a) > 2 * n_a and len(a) < 3 * n_a


def test_dense_topk_ties_and_sparse_groups_cross_block(ray_session):
    """Ties on the kept tiers straddle blocks; one group has fewer than
    k distinct values (all its rows keep); dense rank counts DISTINCT
    values, not rows.  Result must be partition-invariant."""
    from yj_schema_validator_ray.pipelines.olap import dense_topk

    tbl = pa.table({
        "g": pa.array(["a"] * 6 + ["b"] * 3, pa.string()),
        "v": pa.array([9, 9, 7, 7, 7, 1, 5, 5, 5], pa.int64()),
        "i": pa.array(range(9), pa.int64()),
    })

    def run(parts):
        return (dense_topk(_ds(tbl, parts), "g", "v", "i", k=2)
                .to_pandas().sort_values(["g", "v", "i"],
                                         ascending=[True, False, True])
                .reset_index(drop=True))

    got = run(5)
    # a: tiers 9 (rank 1, 2 rows) + 7 (rank 2, 3 rows); value 1 drops.
    # b: single tier 5 -> rank 1, all 3 rows keep.
    assert got[got["g"] == "a"]["v"].tolist() == [9, 9, 7, 7, 7]
    assert got[got["g"] == "a"]["dr"].tolist() == [1, 1, 2, 2, 2]
    assert got[got["g"] == "b"]["dr"].tolist() == [1, 1, 1]
    assert got.equals(run(1))


def test_first_last_cross_block_and_ts_ties(ray_session):
    """First and last rows of a user live in different blocks, and a
    duplicated min/max timestamp is tie-broken by event_id BOTH ways —
    the merge must pick min (ts, id) for first and max (ts, id) for
    last, not first/last per column independently."""
    from yj_schema_validator_ray.pipelines.olap import first_last_by_user

    # user 7: min ts=10 appears twice (ids 5 and 3 -> first id must be
    # 3); max ts=90 twice (ids 1 and 8 -> last id must be 8).
    tbl = pa.table({
        "user_id": pa.array([7, 7, 7, 7, 7, 2], pa.int64()),
        "ts_us": pa.array([10, 10, 50, 90, 90, 4], pa.int64()),
        "event_id": pa.array([5, 3, 9, 1, 8, 0], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d", "e", "z"]),
    })
    got = (first_last_by_user(_ds(tbl, 6)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    u7 = got[got["user_id"] == 7].iloc[0]
    assert (u7["n_events"], u7["first_event_id"], u7["first_type"],
            u7["last_event_id"], u7["last_type"]) == (5, 3, "b", 8, "e")
    u2 = got[got["user_id"] == 2].iloc[0]
    assert (u2["n_events"], u2["first_event_id"], u2["last_event_id"]) \
        == (1, 0, 0)


def test_embedding_centroids_partition_invariant(ray_session):
    """Integer fixed-point sums make the merge order-free: 1-block and
    8-block runs must be bit-identical, and sums must equal the direct
    numpy reference."""
    from yj_schema_validator_ray.pipelines.olap import embedding_centroids

    rng = np.random.RandomState(11)
    n, d = 64, 5
    mat = rng.randn(n, d).astype(np.float32)
    labels = rng.randint(0, 3, n)
    tbl = pa.table({
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })

    def run(parts):
        return (embedding_centroids(_ds(tbl, parts)).to_pandas()
                .sort_values(["label", "dim"]).reset_index(drop=True))

    a, b = run(1), run(8)
    assert a.equals(b)
    q = np.floor(mat.astype(np.float64) * 1e6 + 0.5).astype(np.int64)
    for lab in range(3):
        ref = q[labels == lab].sum(axis=0)
        sub = a[a["label"] == lab]
        assert sub["sum_q"].to_numpy().tolist() == ref.tolist()
        assert (sub["n_vecs"] == (labels == lab).sum()).all()


def test_ols_stats_slope_recovers_trend(ray_session):
    """The five integer sums recover the OLS slope: synthesize events
    with a known value = a + b*t trend per type and check the derived
    slope (exact integer math on Python ints, no overflow) is close."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import events_ols_stats

    n = 2000
    rng = np.random.RandomState(3)
    t0 = np.int64(1_700_000_000_000_000)
    secs = np.sort(rng.randint(0, 86_400, n)).astype(np.int64)
    typ = np.where(np.arange(n) % 2 == 0, "up", "down")
    slope = np.where(typ == "up", 0.02, -0.01)  # dollars per second
    val = 100.0 + slope * secs + rng.randn(n) * 0.5
    tbl = pa.table({
        "event_type": pa.array(typ),
        "ts": pa.array((t0 + secs * 1_000_000), pa.timestamp("us")),
        "value": pa.array(val, pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = events_ols_stats(d).to_pandas().set_index("event_type")
    for t, want in [("up", 0.02), ("down", -0.01)]:
        r = got.loc[t]
        n_, sx, sy, sxx, sxy = (int(r["n_events"]), int(r["sum_x"]),
                                int(r["sum_y_cents"]), int(r["sum_xx"]),
                                int(r["sum_xy"]))
        b_cents = (n_ * sxy - sx * sy) / (n_ * sxx - sx * sx)
        assert abs(b_cents / 100.0 - want) < 2e-4, (t, b_cents / 100.0)


def test_term_cooccurrence_partition_invariant_and_exact(ray_session):
    """Pair counts straddling blocks merge exactly, df attaches match
    the vocab, and a term outside the top-v vocab never pairs."""
    import ray

    from yj_schema_validator_ray.stages.text import term_cooccurrence

    texts = ["alpha beta", "alpha beta gamma", "beta gamma",
             "alpha zzrare", "gamma alpha beta", "beta beta alpha"]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts)})

    def run(parts):
        ds = ray.data.from_arrow(tbl)
        if parts > 1:
            ds = ds.repartition(parts)
        return (term_cooccurrence(ds, v=3).to_pandas()
                .sort_values(["term_a", "term_b"]).reset_index(drop=True))

    got = run(4)
    assert got.equals(run(1))
    # top-3 vocab by tf: beta(6), alpha(5), gamma(3); zzrare excluded
    pairs = {(a, b): n for a, b, n in
             zip(got["term_a"], got["term_b"], got["n_docs"])}
    assert pairs == {("alpha", "beta"): 4, ("alpha", "gamma"): 2,
                     ("beta", "gamma"): 3}
    dfa = dict(zip(got["term_a"], got["df_a"]))
    dfb = dict(zip(got["term_b"], got["df_b"]))
    assert dfa["alpha"] == 5 and dfb["beta"] == 5 and dfb["gamma"] == 3


def test_mad_outliers_flags_known_anomalies(ray_session):
    """A tight cluster plus two far points: MAD gate flags exactly the
    far points; med/mad are actual corpus elements."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import events_mad_outliers

    vals = [10.0, 10.1, 9.9, 10.2, 9.8, 10.0, 10.1, 500.0, -500.0]
    tbl = pa.table({
        "event_type": pa.array(["a"] * len(vals)),
        "ts": pa.array([1_700_000_000_000_000 + i for i in range(len(vals))],
                       pa.timestamp("us")),
        "value": pa.array(vals, pa.float64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        got = events_mad_outliers(d).to_pandas()
    r = got.iloc[0]
    assert r["n_events"] == len(vals)
    assert r["med"] in vals and r["n_outliers"] == 2


def test_trade_pagerank_mass_and_structure(ray_session):
    """Integer PageRank on a hand-built star graph: mass conservation
    modulo floor losses, hub outranks leaves, and the exact recurrence
    matches a driver-side Python reference."""
    import os
    import tempfile

    from yj_schema_validator_ray.stages.pagerank import (SCALE,
                                                         trade_pagerank)

    # orders/lineitem forming a star: customers 1..6 all buy from
    # supplier 1; customer 1 also buys from suppliers 2 and 3.
    custs = [1, 2, 3, 4, 5, 6, 1, 1]
    supps = [1, 1, 1, 1, 1, 1, 2, 3]
    orders = pa.table({
        "o_orderkey": pa.array(range(len(custs)), pa.int64()),
        "o_custkey": pa.array(custs, pa.int64()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(range(len(supps)), pa.int64()),
        "l_suppkey": pa.array(supps, pa.int64()),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(orders, os.path.join(d, "orders.parquet"))
        pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
        got = trade_pagerank(d, iters=3).to_pandas()

    # python reference of the same integer recurrence
    pairs = sorted(set(zip(custs, supps)))
    edges = [(c * 2, s * 2 + 1) for c, s in pairs] + \
            [(s * 2 + 1, c * 2) for c, s in pairs]
    deg = {}
    for a, _ in edges:
        deg[a] = deg.get(a, 0) + 1
    n = len(deg)
    r = {v: SCALE // n for v in deg}
    for _ in range(3):
        nxt = {v: (15 * SCALE) // (100 * n) for v in deg}
        for a, b in edges:
            nxt[b] += (85 * r[a]) // (100 * deg[a])
        r = nxt
    want = {("customer" if v % 2 == 0 else "supplier", v // 2): rv
            for v, rv in r.items()}
    assert len(got) == n
    for _, row in got.iterrows():
        assert want[(row["kind"], row["node_key"])] == row["rank_q"]
    g = got.set_index(["kind", "node_key"])["rank_q"]
    # hub supplier 1 dominates everything; mass conserved mod floors
    assert g[("supplier", 1)] == g.max()
    assert 0 <= SCALE - int(got["rank_q"].sum()) < 4 * n * len(edges)


def test_trade_bfs_hops_chain(ray_session):
    """BFS hop levels on a hand-built chain: supplier 1 (seed nation)
    <- customers 1,2 <- supplier 2 <- customer 3; hop distances follow
    the symmetrized chain, nodes beyond `hops` are absent."""
    import os
    import tempfile

    from yj_schema_validator_ray.stages.pagerank import trade_bfs_hops

    # chain: c1-s1, c2-s1, c2-s2, c3-s2 ; c4-s3 is a disconnected island
    custs = [1, 2, 2, 3, 4]
    supps = [1, 1, 2, 2, 3]
    orders = pa.table({
        "o_orderkey": pa.array(range(len(custs)), pa.int64()),
        "o_custkey": pa.array(custs, pa.int64()),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array(range(len(supps)), pa.int64()),
        "l_suppkey": pa.array(supps, pa.int64()),
    })
    supplier = pa.table({
        "s_suppkey": pa.array([1, 2, 3], pa.int64()),
        "s_nationkey": pa.array([3, 7, 7], pa.int64()),  # seed = nation 3
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(orders, os.path.join(d, "orders.parquet"))
        pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
        pq.write_table(supplier, os.path.join(d, "supplier.parquet"))
        got = trade_bfs_hops(d, seed_nation=3, hops=2).to_pandas()
    hop = {(r["kind"], r["node_key"]): r["hop"] for _, r in got.iterrows()}
    assert hop == {
        ("supplier", 1): 0,
        ("customer", 1): 1, ("customer", 2): 1,
        ("supplier", 2): 2,
        # customer 3 is 3 hops away -> absent; island (c4,s3) absent
    }


def test_path_trigrams_cross_block_user(ray_session):
    """A user's ordered stream split across blocks still yields the
    full trigram set (co-location repairs the split); users with < 3
    events contribute nothing."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import events_path_trigrams

    # user 1: a b a b -> trigrams (a,b,a), (b,a,b); user 2: a b (none)
    tbl = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "ts": pa.array([1_700_000_000_000_000 + i * 1_000_000
                        for i in range(6)], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "b", "a", "b"]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"),
                       row_group_size=2)
        got = events_path_trigrams(d).to_pandas()
    tri = {(r.e1, r.e2, r.e3): r.n for r in got.itertuples()}
    assert tri == {("a", "b", "a"): 1, ("b", "a", "b"): 1}


def test_orders_open_per_day_sweep(ray_session):
    """Hand-built spans: overlap counting matches the closed form and
    orders without lineitems drop (inner semantics)."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import orders_open_per_day

    US = 86_400_000_000
    # order 0: open day 10, last ship day 12  -> open 10,11,12
    # order 1: open day 11, last ship day 11  -> open 11
    # order 2: open day 14, last ship day 15  -> open 14,15
    # order 3: no lineitems -> dropped
    orders = pa.table({
        "o_orderkey": pa.array([0, 1, 2, 3], pa.int64()),
        "o_orderdate": pa.array([10 * US, 11 * US, 14 * US, 9 * US],
                                pa.timestamp("us")),
    })
    lineitem = pa.table({
        "l_orderkey": pa.array([0, 0, 1, 2, 2], pa.int64()),
        "l_shipdate": pa.array([11 * US, 12 * US, 11 * US, 15 * US,
                                14 * US], pa.timestamp("us")),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(orders, os.path.join(d, "orders.parquet"))
        pq.write_table(lineitem, os.path.join(d, "lineitem.parquet"))
        got = orders_open_per_day(d)
    want = {10: 1, 11: 2, 12: 1, 13: 0, 14: 1, 15: 1}
    assert dict(zip(got["day"], got["n_open"])) == want


def test_skyline_ties_duplicates_and_brute_force():
    """_skyline_2d vs the O(n^2) dominance definition on adversarial
    data: duplicated frontier points all survive, equal-y-greater-x
    dominates, diagonal (all-frontier) survives whole."""
    from yj_schema_validator_ray.pipelines.olap import _skyline_2d

    rng = np.random.RandomState(7)
    for trial in range(30):
        n = rng.randint(1, 40)
        x = rng.randint(0, 6, n).astype(np.int64)
        y = rng.randint(0, 6, n).astype(np.int64)
        df = pd.DataFrame({"i": np.arange(n, dtype=np.int64),
                           "x": x, "y": y})
        got = set(_skyline_2d(df, "x", "y")["i"])
        want = set()
        for a in range(n):
            dominated = any(
                x[b] >= x[a] and y[b] >= y[a]
                and (x[b] > x[a] or y[b] > y[a]) for b in range(n))
            if not dominated:
                want.add(a)
        assert got == want, (trial, df, got, want)
    # explicit diagonal: everything survives
    d = pd.DataFrame({"i": [0, 1, 2], "x": [1, 2, 3],
                      "y": [3, 2, 1]}).astype(np.int64)
    assert set(_skyline_2d(d, "x", "y")["i"]) == {0, 1, 2}


def test_user_mode_tie_break_cross_block(ray_session):
    """Tie on count resolves lexicographically; counts straddling
    blocks merge before the argmax."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import events_user_mode

    # user 1: b,b,a,a -> tie (2,2) -> 'a'; user 2: c,c,a -> 'c'
    tbl = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2], pa.int64()),
        "event_type": pa.array(["b", "b", "a", "a", "c", "c", "a"]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"),
                       row_group_size=2)
        got = (events_user_mode(d).to_pandas()
               .sort_values("user_id").reset_index(drop=True))
    assert got.values.tolist() == [[1, "a", 2], [2, "c", 2]]


def test_conversion_window_anchor_and_bounds(ray_session):
    """Clicks BEFORE or AT the first view don't count; the window bound
    is inclusive; users without views are excluded from the base."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import (
        events_conversion_window)

    US = 1_000_000
    rows = [
        # user 1: click before view (ignored), view @100s, click @100s
        # (not strictly after), click exactly @100+3600s -> converts at
        # the 3600 bound (inclusive)
        (1, 50, "click"), (1, 100, "view"), (1, 100, "click"),
        (1, 3700, "click"),
        # user 2: view @0, click @80000s -> converts only at 86400
        (2, 0, "view"), (2, 80_000, "click"),
        # user 3: clicks only -> not in the base
        (3, 10, "click"),
        # user 4: view only -> in base, never converts
        (4, 7, "view"),
    ]
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] * US for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(tbl, os.path.join(d, "events.parquet"),
                       row_group_size=3)
        got = (events_conversion_window(d).to_pandas()
               .sort_values("window_s").reset_index(drop=True))
    assert got.values.tolist() == [[3600, 3, 1], [86400, 3, 2]]


def test_phash_invariances():
    """pHash is invariant to re-encoding (PNG filter choice, PPM
    transcode) and to a global brightness shift, but separates
    genuinely different patterns."""
    from yj_schema_validator_ray.stages.multimodal import (encode_png,
                                                           encode_ppm,
                                                           decode_image,
                                                           phash64)

    rng = np.random.RandomState(13)
    img = rng.randint(0, 200, (8, 8, 3)).astype(np.uint8)

    def ph(payload):
        return int(phash64(np.stack([decode_image(payload)]))[0])

    base = ph(encode_png(img, filter_type=0))
    for ft in range(1, 5):
        assert ph(encode_png(img, filter_type=ft)) == base  # re-encode
    assert ph(encode_ppm(img)) == base                      # transcode
    assert ph(encode_ppm((img + 40).astype(np.uint8))) == base  # shift
    other = rng.randint(0, 200, (8, 8, 3)).astype(np.uint8)
    assert ph(encode_ppm(other)) != base


def test_hits_star_structure_and_mass(ray_session):
    """On a star (all customers buy from supplier 1, customer 1 also
    from 2/3): supplier 1 is the top authority, customer 1 the top hub;
    L1 mass stays ~scale after each renormalization (floor losses only)
    and matches the exact python reference."""
    import os
    import tempfile

    from yj_schema_validator_ray.stages.pagerank import (HITS_SCALE,
                                                         trade_hits)

    custs = [1, 2, 3, 4, 5, 6, 1, 1]
    supps = [1, 1, 1, 1, 1, 1, 2, 3]
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.table({
            "o_orderkey": pa.array(range(len(custs)), pa.int64()),
            "o_custkey": pa.array(custs, pa.int64()),
        }), os.path.join(d, "orders.parquet"))
        pq.write_table(pa.table({
            "l_orderkey": pa.array(range(len(supps)), pa.int64()),
            "l_suppkey": pa.array(supps, pa.int64()),
        }), os.path.join(d, "lineitem.parquet"))
        got = trade_hits(d, iters=2).to_pandas()

    pairs = sorted(set(zip(custs, supps)))
    cs = sorted({c for c, _ in pairs})
    h = {c: HITS_SCALE // len(cs) for c in cs}
    for _ in range(2):
        ar = {}
        for c, s in pairs:
            ar[s] = ar.get(s, 0) + h[c]
        ta = sum(ar.values())
        a = {s: (v * HITS_SCALE) // ta for s, v in ar.items()}
        hr = {}
        for c, s in pairs:
            hr[c] = hr.get(c, 0) + a[s]
        th = sum(hr.values())
        h = {c: (v * HITS_SCALE) // th for c, v in hr.items()}
    want = {("customer", c): v for c, v in h.items()}
    want.update({("supplier", s): v for s, v in a.items()})
    got_map = {(r.kind, r.node_key): r.score_q for r in got.itertuples()}
    assert got_map == want
    sup = got[got["kind"] == "supplier"].set_index("node_key")["score_q"]
    hub = got[got["kind"] == "customer"].set_index("node_key")["score_q"]
    assert sup.idxmax() == 1 and hub.idxmax() == 1
    assert 0 <= HITS_SCALE - int(sup.sum()) < len(sup)
    assert 0 <= HITS_SCALE - int(hub.sum()) < len(hub)


def test_lloyd_step_recovers_corrupted_blob_labels(ray_session):
    """Three well-separated blobs with 10% corrupted labels: one exact
    Lloyd assignment step restores every true label, and per-vector
    dist never exceeds the own-centroid distance."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import embedding_lloyd_step

    rng = np.random.RandomState(23)
    n, d = 120, 6
    true = rng.randint(0, 3, n)
    centers = np.array([[8.0] * d, [-8.0] * d,
                        [8.0] * 3 + [-8.0] * 3])
    mat = (centers[true] + rng.randn(n, d) * 0.3).astype(np.float32)
    noisy = true.copy()
    flip = rng.choice(n, n // 10, replace=False)
    noisy[flip] = (noisy[flip] + 1) % 3
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(noisy.astype(np.int32), pa.int32()),
    })
    with tempfile.TemporaryDirectory() as dd:
        pq.write_table(tbl, os.path.join(dd, "embeddings.parquet"))
        got = (embedding_lloyd_step(dd).to_pandas()
               .sort_values("vec_id").reset_index(drop=True))
    assert got["new_label"].to_numpy().tolist() == true.tolist()
    assert int(got["moved"].sum()) == len(flip)


def test_kmeans_multi_round_converges_and_is_stable(ray_session):
    """Three separated blobs with 30% corrupted labels: the 3-round
    Lloyd loop recovers every true label, exactly the corrupted
    vectors report moved=1, and a fixed point is reached (a 4th
    round changes nothing)."""
    import os
    import tempfile

    from yj_schema_validator_ray.pipelines.olap import embedding_kmeans

    rng = np.random.RandomState(41)
    n, d = 150, 5
    true = rng.randint(0, 3, n)
    centers = np.array([[9.0] * d, [-9.0] * d,
                        [9.0, -9.0, 9.0, -9.0, 9.0]])
    mat = (centers[true] + rng.randn(n, d) * 0.4).astype(np.float32)
    noisy = true.copy()
    flip = rng.choice(n, int(n * 0.3), replace=False)
    noisy[flip] = (noisy[flip] + 1) % 3
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(noisy.astype(np.int32), pa.int32()),
    })
    with tempfile.TemporaryDirectory() as dd:
        pq.write_table(tbl, os.path.join(dd, "embeddings.parquet"))
        got3 = (embedding_kmeans(dd, rounds=3).to_pandas()
                .sort_values("vec_id").reset_index(drop=True))
        got4 = (embedding_kmeans(dd, rounds=4).to_pandas()
                .sort_values("vec_id").reset_index(drop=True))
    assert got3["label_final"].to_numpy().tolist() == true.tolist()
    moved_ids = set(got3.loc[got3["moved"] == 1, "vec_id"])
    assert moved_ids == set(int(i) for i in flip)
    # fixed point: round 4 output identical to round 3
    assert got4["label_final"].to_numpy().tolist() == true.tolist()
