"""Driver-oracle-able ACCURACY queries for the approximate operator
family.

The sketch/LSH operators (HLL distinct, MinHash near-dup, ANN top-k)
are approximate by design, so their outputs carry no SQL oracle — but
their *accuracy against the exact operator* is deterministic (fixed
seeds, fixed corpus) and exactly checkable: each query here runs BOTH
the approximate and the exact pipeline, emits the exact-side value
(hash-checked against DuckDB) plus boolean bound checks of the
approximate side, and the driver's value-hash compare fails if any
bound is violated.  Bounds are set from measured behavior at sf0.001
and sf0.01 with explicit margin; they are properties of the algorithm
parameters (HLL p=12 -> ~1.6% sigma; MinHash 64 perms -> ~0.12 sigma
per pair), not of one corpus.

No reference counterpart (alexmond/yj-schema-validator has no
approximate operators); this is the LLM-pipeline quality-gate layer.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: sentinel matching pipelines.constraints._hash64's null slot — HLL
#: counts null as a distinct value, so the exact side must too
_NULL_SENTINEL = "\x00null"


def hll_accuracy(corpus_ds, columns=("repo", "path", "commit", "lang"),
                 p: int = 12, rel_bound: float = 0.05):
    """(column_name, exact_distinct, within_bound): exact distinct count
    per column (distributed, null counted as a value — HLL semantics)
    plus a check that the HLL estimate is within ``rel_bound`` relative
    error.  p=12 gives sigma ~1.04/sqrt(4096) = 1.6%, so 5% is ~3 sigma.

    The exact side is a two-exchange plan that never moves raw rows:
    per-batch DISTINCT (column, value) partials -> global dedup through
    the coarse-hash exchange -> per-block counts -> one tiny sum.
    """
    from ..pipelines.constraints import distinct_sketch
    from ..stages.exact_agg import grouped_aggregate

    cols = list(columns)

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        names, vals = [], []
        for c in cols:
            u = pc.unique(pc.fill_null(pc.cast(batch.column(c), pa.string()),
                                       _NULL_SENTINEL))
            names.append(np.full(len(u), c, dtype=object))
            vals.append(u.to_numpy(zero_copy_only=False))
        return pa.table({
            "column_name": pa.array(np.concatenate(names), pa.string()),
            "value": pa.array(np.concatenate(vals), pa.string())})

    distinct = grouped_aggregate(
        corpus_ds.map_batches(partial, batch_format="pyarrow"),
        ["column_name", "value"], [("", "count", "n")])

    def count_part(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        g = t.group_by("column_name").aggregate([("value", "count")])
        return pa.table({"column_name": g.column("column_name"),
                         "part": pc.cast(g.column("value_count"), pa.int64())})

    exact = grouped_aggregate(
        distinct.map_batches(count_part, batch_format="pyarrow"),
        ["column_name"], [("part", "sum", "exact_distinct")]).to_pandas()

    est = distinct_sketch(corpus_ds, columns=cols, p=p)
    out = exact.merge(est, on="column_name")
    rel = (out["distinct_estimate"] - out["exact_distinct"]).abs() \
        / out["exact_distinct"].clip(lower=1)
    return pd.DataFrame({
        "column_name": out["column_name"],
        "exact_distinct": out["exact_distinct"].astype("int64"),
        "within_bound": (rel <= rel_bound),
    }).sort_values("column_name").reset_index(drop=True)


def hll_accuracy_sql(columns=("repo", "path", "commit", "lang")) -> str:
    from ..sources.corpus import corpus_sql_cte

    parts = []
    for c in columns:
        qc = f'"{c}"' if c == "commit" else c
        parts.append(
            f"SELECT '{c}' AS column_name, "
            f"CAST(count(DISTINCT {qc}) + max(CASE WHEN {qc} IS NULL "
            f"THEN 1 ELSE 0 END) AS BIGINT) AS exact_distinct, "
            f"TRUE AS within_bound FROM corpus")
    return f"WITH {corpus_sql_cte()}\n" + "\nUNION ALL\n".join(parts)


def _ann_accuracy(exact_df: pd.DataFrame, approx_df: pd.DataFrame,
                  recall_bound: float) -> pd.DataFrame:
    rows = []
    for qid, ex in exact_df.groupby("query_id", sort=True):
        ap = approx_df[approx_df["query_id"] == qid]
        inter = len(set(ex["vec_id"]) & set(ap["vec_id"]))
        ex1 = ex.loc[ex["rank"] == 1, "vec_id"].iloc[0]
        a1 = ap.loc[ap["rank"] == 1, "vec_id"]
        rows.append((int(qid), len(ex),
                     bool(len(a1) and a1.iloc[0] == ex1),
                     bool(inter / len(ex) >= recall_bound)))
    return pd.DataFrame({
        "query_id": pd.Series([r[0] for r in rows], dtype="int64"),
        "n_exact": pd.Series([r[1] for r in rows], dtype="int64"),
        "top1_hit": pd.Series([r[2] for r in rows], dtype="bool"),
        "recall_ok": pd.Series([r[3] for r in rows], dtype="bool"),
    })


def ann_lsh_accuracy(emb_ds, queries, k: int = 10,
                     recall_bound: float = 0.10):
    """Per query: exact top-k size (hash-checked vs the brute-force SQL)
    + two LSH quality checks: the rank-1 result matches the exact rank-1
    (self-retrieval — the LSH contract: identical/near-identical vectors
    share every code) and recall@k >= ``recall_bound``.  Single-table
    8-bit LSH trades recall on the low-similarity tail for a ~2^-8
    candidate set, so the floor is the self-match (measured 0.1-0.3
    recall@10 on random-tail queries at both test scales)."""
    from ..stages.ann import ann_topk_bruteforce, ann_topk_lsh

    exact = ann_topk_bruteforce(emb_ds, queries, k).to_pandas()
    approx = ann_topk_lsh(emb_ds, queries, k).to_pandas()
    return _ann_accuracy(exact, approx, recall_bound)


def ann_ivf_accuracy(emb_ds, queries, k: int = 10,
                     recall_bound: float = 0.40):
    """Per query: exact top-k size + IVF quality checks (top-1 hit and
    recall@k >= 0.4 with the default 2-of-16 probed centroids; measured
    0.4-1.0 at both test scales)."""
    from ..stages.ann import ann_topk_bruteforce, ann_topk_ivf

    exact = ann_topk_bruteforce(emb_ds, queries, k).to_pandas()
    approx = ann_topk_ivf(emb_ds, queries, k).to_pandas()
    return _ann_accuracy(exact, approx, recall_bound)


def knn_lsh_accuracy(sf_dir: str, k: int = 5,
                     coverage_bound: float = 0.95,
                     agreement_bound: float = 0.08,
                     acc_delta_bound: float = 0.10):
    """One row certifying the LSH-pruned k-NN classifier
    (:func:`~..stages.ann.knn_classify_lsh`) against the broadcast
    exact baseline (:func:`~..stages.ann.knn_classify`):

    - ``n_vecs`` / ``n_labels`` — exact-side table facts, hash-checked
      against DuckDB;
    - ``coverage_ok`` — the LSH path classified >= 95% of vectors
      (4 tables x 2^6 buckets leave essentially no vector bucket-alone;
      measured 1.0 at both test scales);
    - ``agreement_ok`` — prediction agreement with the exact vote
      >= ``agreement_bound``.  The synthetic corpus is RANDOM gaussian
      embeddings — near-equidistant neighbors, the documented
      adversarial case for any pruned candidate set (same caveat as
      :func:`ann_lsh_accuracy`'s 0.10 recall floor); measured
      agreement 0.20/0.23 at sf0.001/sf0.01, so 0.08 is ~2.5x margin.
      On clusterable data the agreement is ~1.0 — pinned by the
      well-separated-clusters pytest, the bound that actually matters;
    - ``acc_delta_ok`` — |accuracy(LSH) − accuracy(exact)| <=
      ``acc_delta_bound`` (measured 0.014-0.024): pruning must not
      change the headline quality metric even where individual
      predictions churn among equidistant neighbors.
    """
    from ..stages.ann import knn_classify, knn_classify_lsh

    ex = knn_classify(sf_dir, k=k).to_pandas()
    ap = knn_classify_lsh(sf_dir, k=k).to_pandas()
    m = ex.merge(ap, on="vec_id", suffixes=("", "_l"))
    coverage = len(ap) / max(len(ex), 1)
    agreement = float((m["pred_label"] == m["pred_label_l"]).mean()) \
        if len(m) else 0.0
    acc_delta = abs(float(ap["correct"].mean())
                    - float(ex["correct"].mean())) if len(ap) else 1.0
    return pd.DataFrame({
        "n_vecs": pd.Series([len(ex)], dtype="int64"),
        "n_labels": pd.Series([ex["label"].nunique()], dtype="int64"),
        "coverage_ok": pd.Series([coverage >= coverage_bound]),
        "agreement_ok": pd.Series([agreement >= agreement_bound]),
        "acc_delta_ok": pd.Series([acc_delta <= acc_delta_bound])})


def knn_lsh_accuracy_sql() -> str:
    return """
SELECT CAST(count(*) AS BIGINT) AS n_vecs,
       CAST(count(DISTINCT label) AS BIGINT) AS n_labels,
       TRUE AS coverage_ok, TRUE AS agreement_ok, TRUE AS acc_delta_ok
FROM embeddings"""


def ann_accuracy_sql(k: int = 10, n_queries: int = 5) -> str:
    """Exact-side oracle: per-query exact top-k count from brute-force
    cosine SQL; the boolean bound columns assert the approximate side."""
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) AS sim
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, vec_id) AS rank
  FROM scored
)
SELECT query_id, CAST(count(*) AS BIGINT) AS n_exact,
       TRUE AS top1_hit, TRUE AS recall_ok
FROM ranked WHERE rank <= {k}
GROUP BY query_id"""


def minhash_accuracy(docs_ds, threshold: float = 0.3,
                     recall_bound: float = 0.9,
                     mean_err_bound: float = 0.05,
                     max_err_bound: float = 0.15):
    """One row: the exact AllPairs n-gram pair count (hash-checked vs
    the gram self-join SQL) + three MinHash quality checks against it —
    candidate recall (the 16-band/64-perm LSH must surface >= 90% of
    true >=0.3-Jaccard pairs; S-curve collision prob at J=0.3 is ~0.97)
    and the signature Jaccard-estimate error on recovered pairs (64
    permutations -> sigma ~ sqrt(J(1-J)/64) <= 0.06; measured mean
    0.014-0.019, max 0.034-0.068 at the two test scales).

    MinHash estimates CHAR-5-shingle Jaccard while the exact side uses
    word 3-grams; on text the two spaces track closely, which is exactly
    what this query certifies end-to-end for the dedup family.

    Scale caveat: past the 200-member mega-bucket cap the LSH pair
    generator emits verified STAR edges instead of all tail pairs (by
    design — see ``dedup.minhash_lsh_pairs``), so the 0.9 recall bound
    applies to corpora whose duplicate clusters stay under the cap
    (true of every test corpus; mass-duplication clusters are certified
    for CONNECTIVITY by the star-edge pytest instead).
    """
    from ..stages.dedup import minhash_lsh_pairs, ngram_jaccard_exact_pairs

    exact = ngram_jaccard_exact_pairs(docs_ds, threshold=threshold).to_pandas()
    mh = minhash_lsh_pairs(docs_ds, threshold=threshold).to_pandas()
    if len(exact) == 0:
        return pd.DataFrame({"n_exact_pairs": pd.Series([0], dtype="int64"),
                             "recall_ok": [True], "mean_err_ok": [True],
                             "max_err_ok": [True]})
    m = exact.merge(mh, on=["a", "b"], how="left")
    found = m["jaccard_est"].notna()
    err = (m.loc[found, "jaccard_est"] - m.loc[found, "jaccard"]).abs()
    return pd.DataFrame({
        "n_exact_pairs": pd.Series([len(exact)], dtype="int64"),
        "recall_ok": [bool(found.mean() >= recall_bound)],
        "mean_err_ok": [bool(len(err) == 0 or err.mean() <= mean_err_bound)],
        "max_err_ok": [bool(len(err) == 0 or err.max() <= max_err_bound)],
    })


def minhash_accuracy_sql(threshold: float = 0.3) -> str:
    from ..stages.dedup import ngram_jaccard_exact_sql

    return f"""
SELECT CAST(count(*) AS BIGINT) AS n_exact_pairs,
       TRUE AS recall_ok, TRUE AS mean_err_ok, TRUE AS max_err_ok
FROM ({ngram_jaccard_exact_sql(threshold=threshold)}) exact_pairs"""


def quantile_sketch_accuracy(events_ds, group_col: str = "event_type",
                             value_col: str = "value",
                             rank_err_bound: float = 0.05):
    """(group, quantile, value, rank_err_ok): the EXACT per-group
    quantile values (hash-checked against the window-function SQL, same
    oracle core as ``events_quantiles``) plus a check that the mergeable
    centroid sketch's estimate sits within ``rank_err_bound`` RANK
    error of its target.  k=128 with multi-level compaction measures
    <= 0.03 in tests (``test_grouped_quantile_sketch_error_bound``);
    0.05 adds margin.

    The rank of each estimate is computed DISTRIBUTED: the (group,
    quantile, estimate) table is tiny (groups x qs), so it broadcasts
    into a one-pass partial count of ``value <= estimate`` per group,
    merged through one domain-sized exchange — the events rows never
    move.
    """
    from ..stages.exact_agg import grouped_aggregate
    from ..stages.quantiles import (grouped_exact_quantiles,
                                    grouped_quantile_sketch)
    from ..util import process_cached, ref_key

    import ray

    exact = grouped_exact_quantiles(
        events_ds, group_col, value_col).to_pandas()
    sketch = grouped_quantile_sketch(events_ds, group_col, value_col)
    est = exact.merge(sketch, on=[group_col, "quantile"])
    ref = ray.put((est[group_col].to_numpy(dtype=object),
                   est["quantile"].to_numpy(),
                   est["value_est"].to_numpy()))

    class RankPartial:
        """Per-batch (group, quantile) -> (count value<=est, group n)."""

        def __init__(self, r):
            self.groups, self.qs, self.ests = ray.get(r)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            g = df[group_col].to_numpy(dtype=object)
            v = df[value_col].to_numpy(dtype=np.float64)
            rows = []
            for grp, q, e in zip(self.groups, self.qs, self.ests):
                m = g == grp
                rows.append((grp, q, int((v[m] <= e).sum()), int(m.sum())))
            return pd.DataFrame({
                group_col: [r[0] for r in rows],
                "quantile": pd.Series([r[1] for r in rows],
                                      dtype="float64"),
                "n_le": pd.Series([r[2] for r in rows], dtype="int64"),
                "n_grp": pd.Series([r[3] for r in rows], dtype="int64"),
            })

    ranks = grouped_aggregate(
        events_ds.map_batches(
            process_cached(RankPartial, ref_key(ref), ref),
            batch_format="pandas"),
        [group_col, "quantile"],
        [("n_le", "sum", "n_le"), ("n_grp", "sum", "n_grp")]).to_pandas()

    out = est.merge(ranks, on=[group_col, "quantile"])
    err = (out["n_le"] / out["n_grp"] - out["quantile"]).abs()
    return pd.DataFrame({
        group_col: out[group_col],
        "quantile": out["quantile"].astype("float64"),
        "value": out["value"].astype("float64"),
        "rank_err_ok": (err <= rank_err_bound).astype(bool),
    })


def quantile_sketch_accuracy_sql(group_col: str = "event_type",
                                 value_col: str = "value") -> str:
    from ..stages.quantiles import grouped_exact_quantiles_sql

    return f"""
SELECT {group_col}, quantile, value, TRUE AS rank_err_ok
FROM ({grouped_exact_quantiles_sql("events", group_col, value_col)}) x"""


def bloom_accuracy(docs_ds, new_ds, fp_rate_bound: float = 0.02,
                   m_bits: int = 1 << 20, k: int = 5):
    """One row certifying the Bloom incremental-dedup operator against
    the EXACT overlap between a new crawl and the prior corpus:
    ``n_new`` / ``n_true_dups`` are exact (hash-checked vs the SQL
    text-membership join), ``no_false_negatives`` asserts the Bloom
    guarantee (every true duplicate was dropped — a structural property,
    any violation is a bug), and ``fp_ok`` bounds the false-positive
    drops at ``fp_rate_bound`` of the new crawl (m=2^20 bits / k=5 on
    these corpus sizes gives FPR << 1%).

    The exact side never joins row-wise on the driver: old docs, new
    docs and Bloom-kept new docs flow (sha-keyed, per-batch
    pre-deduped partial counts) through ONE coarse-hash exchange;
    per-sha side counts then reduce to the four scalars.
    """
    import hashlib

    from ..stages.bloom import build_bloom, incremental_dedup
    from ..stages.exact_agg import grouped_aggregate

    bloom = build_bloom(docs_ds, m_bits=m_bits, k=k)
    kept = incremental_dedup(new_ds, bloom, k=k)

    def side_partial(side_old, side_new, side_kept):
        def f(t: pa.Table) -> pa.Table:
            shas = [hashlib.sha256(x.encode()).hexdigest()
                    for x in t.column("text").to_pylist()]
            df = pd.DataFrame({"sha": shas})
            g = df.groupby("sha", sort=False).size().rename("n").reset_index()
            n = g["n"].astype("int64")
            return pa.table({
                "sha": pa.array(g["sha"], pa.string()),
                "n_old": pa.array(n * side_old, pa.int64()),
                "n_new": pa.array(n * side_new, pa.int64()),
                "n_kept": pa.array(n * side_kept, pa.int64()),
            })
        return f

    u = (docs_ds.map_batches(side_partial(1, 0, 0), batch_format="pyarrow")
         .union(new_ds.map_batches(side_partial(0, 1, 0),
                                   batch_format="pyarrow"))
         .union(kept.map_batches(side_partial(0, 0, 1),
                                 batch_format="pyarrow")))
    per_sha = grouped_aggregate(
        u, ["sha"], [("n_old", "sum", "n_old"), ("n_new", "sum", "n_new"),
                     ("n_kept", "sum", "n_kept")])

    def reduce_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        in_old = df["n_old"] > 0
        return pa.table({
            "n_new": pa.array([int(df["n_new"].sum())], pa.int64()),
            "n_true_dups": pa.array([int(df.loc[in_old, "n_new"].sum())],
                                    pa.int64()),
            "n_false_neg": pa.array([int(df.loc[in_old, "n_kept"].sum())],
                                    pa.int64()),
            "n_kept": pa.array([int(df["n_kept"].sum())], pa.int64()),
        })

    tot = (per_sha.map_batches(reduce_partial, batch_format="pyarrow")
           .to_pandas().sum())
    n_new = int(tot["n_new"])
    n_true = int(tot["n_true_dups"])
    n_fp = (n_new - int(tot["n_kept"])) - n_true  # dropped - true dups
    return pd.DataFrame({
        "n_new": pd.Series([n_new], dtype="int64"),
        "n_true_dups": pd.Series([n_true], dtype="int64"),
        "no_false_negatives": [bool(int(tot["n_false_neg"]) == 0)],
        "fp_ok": [bool(n_fp <= max(1, int(fp_rate_bound * n_new)))],
    })


def bloom_accuracy_sql() -> str:
    """Exact overlap of the synthesized new crawl (ids%100<5 exact
    re-crawls + ids%100>=95 ' [rev2]' revisions, ids shifted +1e6 —
    byte-identical to ``stages.bloom.synthesize_new_crawl``) vs the
    prior corpus."""
    return """
WITH newc AS (
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 100 < 5
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text || ' [rev2]'
  FROM documents WHERE doc_id % 100 >= 95
)
SELECT CAST(count(*) AS BIGINT) AS n_new,
       CAST(sum(CASE WHEN n.text IN (SELECT text FROM documents)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_true_dups,
       TRUE AS no_false_negatives, TRUE AS fp_ok
FROM newc n"""


def simhash_accuracy(docs_aug_ds, max_hamming: int = 3,
                     cap: int = 200):
    """(n_exact_dup_pairs, n_mega_groups, all_exact_dups_found): the
    exact-duplicate pair count over the two-crawl corpus (hash-checked
    vs the sha-group SQL) plus the STRUCTURAL SimHash guarantee that
    every exact duplicate pair is recovered — identical text gives an
    identical 64-bit signature, so Hamming 0 <= ``max_hamming`` and the
    16-bit chunk banding must surface the pair; any miss is a plumbing
    bug in the explode/band/verify chain, which is what this certifies.

    Pair-complete recall is claimed ONLY for duplicate groups of at
    most ``cap`` members — the same cap past which the pair generators
    deliberately switch from quadratic emission to verified STAR edges.
    The claim holds even when an oversized BAND bucket mixes several
    small same-sha groups: ``simhash_pairs`` sorts bucket runs by sha64
    so same-sha members are contiguous and emits full quadratic for
    every same-sha run <= ``cap`` touching the capped tail.  Oversized
    groups are counted EXACTLY into ``n_mega_groups`` (hash-checked;
    their star-edge connectivity is pinned by
    ``test_mega_bucket_star_edges_keep_members_connected``), so the
    certificate stays green-and-honest at mass-duplication scale
    instead of failing on a claim the scale design intentionally does
    not make.

    Fully distributed: exact pairs are emitted inside sha groups behind
    the same coarse exchange as exact dedup (dup groups are
    crawl-overlap-sized); the recall check joins the side-tagged pair
    sets through one (a, b)-keyed exchange and reduces to scalars.
    """
    import pyarrow.compute as pc

    from ..stages.dedup import add_text_sha, simhash_pairs
    from ..stages.exact_agg import grouped_aggregate, hash_columns
    from ..util import shuffle_partitions

    def sha_rows(batch: pa.Table) -> pa.Table:
        b = add_text_sha(batch.select(["doc_id", "text"]))
        t = b.select(["text_sha", "doc_id"])
        kh = hash_columns(t.select(["text_sha"]))
        return t.append_column(
            "__coarse", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    def emit_exact_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _, part in g.groupby("text_sha", sort=False):
            if len(part) < 2 or len(part) > cap:
                continue  # mega groups: counted, star-edge-certified
            ids = np.sort(part["doc_id"].to_numpy())
            iu, ju = np.triu_indices(len(ids), k=1)
            out_a.append(ids[iu])
            out_b.append(ids[ju])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    exact_pairs = (docs_aug_ds
                   .map_batches(sha_rows, batch_format="pyarrow")
                   .groupby("__coarse",
                            num_partitions=shuffle_partitions())
                   .map_groups(emit_exact_pairs, batch_format="pandas"))

    def tag(is_exact):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "a": pc.cast(t.column("a"), pa.int64()),
                "b": pc.cast(t.column("b"), pa.int64()),
                "n_exact": pa.array(
                    np.full(n, 1 if is_exact else 0, np.int64)),
                "n_sim": pa.array(
                    np.full(n, 0 if is_exact else 1, np.int64)),
            })
        return f

    sim = simhash_pairs(docs_aug_ds, max_hamming=max_hamming)
    u = (exact_pairs.map_batches(tag(True), batch_format="pyarrow")
         .union(sim.map_batches(tag(False), batch_format="pyarrow")))
    per_pair = grouped_aggregate(
        u, ["a", "b"], [("n_exact", "sum", "n_exact"),
                        ("n_sim", "sum", "n_sim")])

    def reduce_partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        ex = df["n_exact"] > 0
        return pa.table({
            "n_exact_dup_pairs": pa.array([int(ex.sum())], pa.int64()),
            "n_missed": pa.array(
                [int((ex & (df["n_sim"] == 0)).sum())], pa.int64()),
        })

    tot = (per_pair.map_batches(reduce_partial, batch_format="pyarrow")
           .to_pandas().sum())

    # exact count of oversized dup groups (star-edge regime) — one more
    # sha-keyed exchange of per-batch count partials, group-domain output
    sizes = grouped_aggregate(
        docs_aug_ds.map_batches(
            lambda b: add_text_sha(b.select(["doc_id", "text"]))
            .select(["text_sha"]), batch_format="pyarrow"),
        ["text_sha"], [("", "count", "n")])
    n_mega = sizes.filter(expr=f"n > {cap}").count()

    return pd.DataFrame({
        "n_exact_dup_pairs": pd.Series([int(tot["n_exact_dup_pairs"])],
                                       dtype="int64"),
        "n_mega_groups": pd.Series([int(n_mega)], dtype="int64"),
        "all_exact_dups_found": [bool(int(tot["n_missed"]) == 0)],
    })


def simhash_accuracy_sql(docs_cte: str, cap: int = 200) -> str:
    return f"""WITH {docs_cte},
g AS (
  SELECT count(*) AS n FROM docs_aug
  GROUP BY sha256(text) HAVING count(*) > 1
)
SELECT CAST(coalesce(sum(CASE WHEN n <= {cap} THEN n * (n - 1) / 2
                         ELSE 0 END), 0) AS BIGINT)
         AS n_exact_dup_pairs,
       CAST(coalesce(sum(CASE WHEN n > {cap} THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_mega_groups,
       TRUE AS all_exact_dups_found
FROM g"""


def hll_grouped_accuracy(sf_dir: str, p: int = 12,
                         rel_bound: float = 0.05):
    """(event_type, exact_distinct, within_bound): the exact per-group
    distinct-user count (hash-checked vs COUNT(DISTINCT) SQL) plus a
    check that the grouped HLL sketch
    (:func:`~.constraints.grouped_distinct_sketch`, the
    unbounded-domain path) estimates each group within ``rel_bound``
    relative error (p=12 -> sigma ~1.6%, 5% is ~3 sigma)."""
    import ray.data

    from ..pipelines.constraints import grouped_distinct_sketch
    from ..pipelines.relational import events_distinct_users

    exact = events_distinct_users(sf_dir).to_pandas()
    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "user_id"])
    est = grouped_distinct_sketch(ev, "event_type", "user_id",
                                  p=p).to_pandas()
    out = exact.merge(est, on="event_type")
    rel = (out["distinct_estimate"] - out["n_users"]).abs() \
        / out["n_users"].clip(lower=1)
    return pd.DataFrame({
        "event_type": out["event_type"],
        "exact_distinct": out["n_users"].astype("int64"),
        "within_bound": (rel <= rel_bound).astype(bool),
    })


def hll_grouped_accuracy_sql() -> str:
    return """
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct,
       TRUE AS within_bound
FROM events GROUP BY event_type"""


def fingerprint_consistency(docs_aug_ds):
    """(n_docs, n_md5_groups, fnv_consistent): consistency certificate
    for the rows-only FNV-1a rolling fingerprint against the
    SQL-checkable md5 fingerprint — both hash the SAME normalized text,
    so their equality partitions of the corpus must be identical.
    ``n_md5_groups`` is hash-checked against DuckDB; ``fnv_consistent``
    asserts the FNV partition has the same group count AND that no md5
    group maps to more than one FNV value (a collision, instability, or
    vectorization bug in the byte-position walk would split or merge
    groups and flip the bit).

    Distributed: fingerprint rows -> one (md5)-keyed exchange counting
    per-group distinct FNV values -> scalar reduce.
    """
    from ..stages.exact_agg import grouped_aggregate
    from ..stages.text import fingerprints

    fp = fingerprints(docs_aug_ds)

    def pair_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "fingerprint_md5": t.column("fingerprint_md5"),
            "fingerprint_fnv": t.column("fingerprint_fnv"),
        })

    per_pair = grouped_aggregate(
        fp.map_batches(pair_rows, batch_format="pyarrow"),
        ["fingerprint_md5", "fingerprint_fnv"],
        [("", "count", "n_docs")])

    # the pair exchange hashes BOTH key columns, so an md5 group with
    # two fnv values may span blocks — re-key each side alone before
    # counting (all three exchanges are pair-domain-sized)
    per_md5 = grouped_aggregate(
        per_pair, ["fingerprint_md5"],
        [("", "count", "n_fnv_variants"), ("n_docs", "sum", "n_docs")])
    per_fnv = grouped_aggregate(
        per_pair.map_batches(
            lambda t: t.select(["fingerprint_fnv"]),
            batch_format="pyarrow"),
        ["fingerprint_fnv"], [("", "count", "n")])

    def md5_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        multi = pc.sum(pc.cast(pc.greater(t.column("n_fnv_variants"), 1),
                               pa.int64())).as_py() or 0
        return pa.table({
            "n_md5_groups": pa.array([t.num_rows], pa.int64()),
            "n_multi_fnv": pa.array([int(multi)], pa.int64()),
            "n_docs": pa.array(
                [int(pc.sum(t.column("n_docs")).as_py() or 0)], pa.int64()),
        })

    m = (per_md5.map_batches(md5_partial, batch_format="pyarrow")
         .to_pandas().sum())
    n_fnv_groups = per_fnv.count()
    n_md5 = int(m["n_md5_groups"])
    # identical partitions <=> every md5 group has exactly one fnv
    # (no split) AND distinct fnv count equals the md5 group count
    # (no fnv collision merging two md5 groups)
    consistent = (int(m["n_multi_fnv"]) == 0 and n_fnv_groups == n_md5)
    return pd.DataFrame({
        "n_docs": pd.Series([int(m["n_docs"])], dtype="int64"),
        "n_md5_groups": pd.Series([n_md5], dtype="int64"),
        "fnv_consistent": [bool(consistent)],
    })


def fingerprint_consistency_sql(docs_cte: str) -> str:
    return f"""WITH {docs_cte}
SELECT CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT md5(lower(regexp_replace(text, '\\s+', ' ',
            'g')))) AS BIGINT) AS n_md5_groups,
       TRUE AS fnv_consistent
FROM docs_aug"""


def cms_accuracy(docs_ds, k: int = 20, w: int = 4096, d: int = 4):
    """(term, tf, overestimate_ok, within_eps): the exact corpus term
    frequencies for the global top-``k`` terms (hash-checked vs the SQL
    vocabulary query) plus the two Count-Min guarantees checked against
    the merged sketch:

    - ``overestimate_ok``: est >= true for EVERY probed term — the
      structural CM property (collisions only ever ADD); a False here
      is a merge/indexing bug, not noise;
    - ``within_eps``: est <= true + ceil((e/w) * N) with N = total
      token count — the standard error bound, comfortably met at
      d=4 x w=4096 on this corpus (deterministic hashes make the check
      reproducible).

    Distributed shape: exact counts through the same per-batch-partial
    + coarse exchange as ``vocab_top_terms``; the sketch through
    per-batch (d x w) grids summed driver-side (HLL blob pattern).
    Both scans stream; driver state = one grid + k rows.
    """
    import math as _math

    from ..stages.cms import CountMinSketch, _term_hash, term_cms_sketch
    from ..stages.text import vocab_top_terms

    top = vocab_top_terms(docs_ds, k=k).to_pandas()
    top = top.sort_values(["tf", "term"],
                          ascending=[False, True]).head(k)

    sketch = term_cms_sketch(docs_ds, w=w, d=d)
    est = sketch.estimate_hashed(_term_hash(top["term"]))
    true = top["tf"].to_numpy(dtype=np.int64)
    n_total = int(sketch.table[0].sum())  # row 0 sums the whole stream
    bound = int(_math.ceil(_math.e / w * n_total))
    return pd.DataFrame({
        "term": top["term"].astype(object),
        "tf": pd.Series(true, dtype="int64"),
        "overestimate_ok": bool((est >= true).all()),
        "within_eps": bool((est <= true + bound).all()),
    })


def cms_accuracy_sql(k: int = 20) -> str:
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       TRUE AS overestimate_ok, TRUE AS within_eps
FROM toks GROUP BY term
ORDER BY tf DESC, term LIMIT {k}"""


def hll_intersect_accuracy(sf_dir: str, type_a: str = "click",
                           type_b: str = "purchase", p: int = 12,
                           rel_bound: float = 0.05):
    """Sketch SET ALGEBRA certificate: estimate the distinct-user
    INTERSECTION of two event types by HLL inclusion-exclusion
    (est_A + est_B - est_AuB — union is a register-wise max merge,
    the operation HLL is closed under) and pin it against the exact
    intersection.  Output (n_a, n_b, n_intersect, within_bound):
    exact counts SQL-oracled, the bound checked against the exact
    UNION size (inclusion-exclusion compounds three estimate errors,
    so the natural error scale is the union, not the intersection).

    Exact side: per-batch (user, a, b) flag partials -> one user-keyed
    :func:`~..stages.exact_agg.grouped_aggregate` (max flags) ->
    per-block counts -> tiny sum.  Sketch side: 2^p-register blobs per
    batch, driver merge — both sides mergeable, nothing user-shaped on
    the driver."""
    import ray.data

    from ..stages.exact_agg import grouped_aggregate, hash_columns
    from ..util import collect_small_arrow
    from .constraints import HLLSketch

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type"])

    def flag_partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        uid = t.column("user_id").to_numpy()
        a, b = (et == type_a), (et == type_b)
        keep = a | b
        df = (pd.DataFrame({"user_id": uid[keep],
                            "a": a[keep].astype(np.int64),
                            "b": b[keep].astype(np.int64)})
              .groupby("user_id", sort=False).max().reset_index())
        return pa.Table.from_pandas(df, preserve_index=False)

    flags = grouped_aggregate(
        ev.map_batches(flag_partial, batch_format="pyarrow"),
        ["user_id"], [("a", "max", "a"), ("b", "max", "b")])

    def count_partial(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        return pa.table({
            "n_a": pa.array([int(a.sum())], pa.int64()),
            "n_b": pa.array([int(b.sum())], pa.int64()),
            "n_int": pa.array([int((a & b).sum())], pa.int64())})

    cnt = collect_small_arrow(
        flags.map_batches(count_partial,
                          batch_format="pyarrow")).to_pandas().sum()
    n_a, n_b, n_int = int(cnt.n_a), int(cnt.n_b), int(cnt.n_int)

    def sketch_partial(t: pa.Table) -> pa.Table:
        et = t.column("event_type").to_numpy(zero_copy_only=False)
        h = hash_columns(t.select(["user_id"]))
        names, blobs = [], []
        for name, mask in (("a", et == type_a), ("b", et == type_b)):
            sk = HLLSketch(p)
            sk.add_hashed(h[mask])
            names.append(name)
            blobs.append(sk.registers.tobytes())
        return pa.table({"which": pa.array(names, pa.string()),
                         "registers": pa.array(blobs, pa.binary())})

    merged = {"a": HLLSketch(p), "b": HLLSketch(p)}
    for blk in (ev.map_batches(sketch_partial, batch_format="pyarrow")
                .iter_batches(batch_format="pyarrow")):
        for name, blob in zip(blk.column("which").to_pylist(),
                              blk.column("registers").to_pylist()):
            np.maximum(merged[name].registers,
                       np.frombuffer(blob, dtype=np.uint8),
                       out=merged[name].registers)
    est_a = merged["a"].estimate()
    est_b = merged["b"].estimate()
    union = HLLSketch(p)
    np.maximum(merged["a"].registers, merged["b"].registers,
               out=union.registers)
    est_int = est_a + est_b - union.estimate()
    n_union = max(n_a + n_b - n_int, 1)
    within = abs(est_int - n_int) <= rel_bound * n_union
    return pd.DataFrame({"n_a": pd.Series([n_a], dtype="int64"),
                         "n_b": pd.Series([n_b], dtype="int64"),
                         "n_intersect": pd.Series([n_int], dtype="int64"),
                         "within_bound": [bool(within)]})


def hll_intersect_accuracy_sql(type_a: str = "click",
                               type_b: str = "purchase") -> str:
    return f"""
WITH a AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = '{type_a}'),
     b AS (SELECT DISTINCT user_id FROM events
           WHERE event_type = '{type_b}')
SELECT (SELECT CAST(count(*) AS BIGINT) FROM a) AS n_a,
       (SELECT CAST(count(*) AS BIGINT) FROM b) AS n_b,
       (SELECT CAST(count(*) AS BIGINT)
        FROM a JOIN b USING (user_id)) AS n_intersect,
       TRUE AS within_bound"""


KMV_K = 32
_KMV_SPACE = 1 << 60  # md5[:15] hex = 60-bit hash space


def distinct_kmv(sf_dir: str, k: int = KMV_K):
    """KMV (k-minimum-values / bottom-k) distinct sketch — the third
    sketch family next to HLL and CMS — with a FULLY EXACT oracle: the
    hash is the repo's md5[:15]-hex convention, so DuckDB reproduces
    the k-th minimum and therefore the ESTIMATE itself bit-for-bit
    (not just an error bound).  est = (k-1) * 2^60 // kth_min_hash,
    or the exact distinct when fewer than k hashes exist (the
    small-domain branch events.user_id exercises at these scales).

    Shape: per-batch bottom-k partials (k smallest distinct hashes per
    block — bottom-k of a union is bottom-k of per-part bottom-ks, so
    the merge is associative); the driver folds blocks*k hashes; the
    exact side reuses the distinct-pair exchange.  Columns audited:
    events.user_id, events.event_id, documents.doc_id.
    """
    import hashlib

    import pyarrow.compute as pc
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    def one(table: str, col: str):
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                   columns=[col])

        def bottomk(t: pa.Table) -> pa.Table:
            vals = np.unique(pc.cast(t.column(col), pa.int64()).to_numpy())
            hs = np.sort(np.array(
                [int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
                 for v in vals], np.int64))[:k]
            return pa.table({"hv": pa.array(hs, pa.int64())})

        parts = collect_small_arrow(
            ds.map_batches(bottomk, batch_format="pyarrow")).to_pandas()
        hs = np.sort(np.unique(parts["hv"].to_numpy()))[:k]

        # exact distinct: per-batch distinct -> one keyed exchange ->
        # count (the hll_accuracy exact plan)
        def dvals(t: pa.Table) -> pa.Table:
            return pa.table({"v": pa.array(np.unique(
                pc.cast(t.column(col), pa.int64()).to_numpy()), pa.int64())})

        dist = grouped_aggregate(
            ds.map_batches(dvals, batch_format="pyarrow"),
            ["v"], [("", "count", "n")])
        nd = int(collect_small_arrow(dist.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow")).to_pandas()["n"].sum())

        if len(hs) < k:
            est = len(hs)
        else:
            est = (k - 1) * _KMV_SPACE // int(hs[k - 1])
        return {"column_name": f"{table}.{col}", "exact_distinct": nd,
                "kmv_estimate": int(est)}

    rows = [one("events", "user_id"), one("events", "event_id"),
            one("documents", "doc_id")]
    out = pd.DataFrame(rows)
    out["exact_distinct"] = out["exact_distinct"].astype("int64")
    out["kmv_estimate"] = out["kmv_estimate"].astype("int64")
    return out


def distinct_kmv_sql(k: int = KMV_K) -> str:
    parts = []
    for table, col in (("events", "user_id"), ("events", "event_id"),
                       ("documents", "doc_id")):
        parts.append(f"""
SELECT '{table}.{col}' AS column_name,
       CAST((SELECT count(DISTINCT {col}) FROM {table}) AS BIGINT)
         AS exact_distinct,
       CAST((
         WITH h AS (SELECT DISTINCT CAST(('0x' ||
                      substr(md5(CAST({col} AS VARCHAR)), 1, 15))
                      AS BIGINT) AS hv FROM {table}),
              r AS (SELECT hv, row_number() OVER (ORDER BY hv) AS rk
                    FROM h),
              a AS (SELECT count(*) AS nd,
                           max(CASE WHEN rk = {k} THEN hv END) AS kth
                    FROM r)
         SELECT CASE WHEN nd < {k} THEN nd
                     ELSE (CAST({k - 1} AS HUGEINT)
                           * {_KMV_SPACE}) // kth END
         FROM a) AS BIGINT) AS kmv_estimate""")
    return "\nUNION ALL\n".join(parts)
