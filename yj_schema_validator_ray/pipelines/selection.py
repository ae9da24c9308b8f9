"""Representative-subset selection over the document/embedding corpus:
greedy maximum coverage (the submodular facility-location shape behind
"pick the k docs that cover the most vocabulary") and Maximal Marginal
Relevance (Carbonell & Goldstein 1998 — relevance-vs-redundancy
diversified top-k, the standard re-ranking step of a retrieval
pipeline).

Both are SEQUENTIAL selectors (each pick depends on every prior pick),
so the engine shape is: ONE distributed pass per pick that reduces the
corpus to a block-count-sized argmax partial, with the selected state
(covered-term set / selected-candidate list) broadcast back — the
selected state is pick-bounded (k docs' vocabularies, c candidate
vectors), never corpus-sized, so the driver never holds row-scale data.
Both trajectories are exact integers end-to-end and pinned against
unrolled-CTE DuckDB oracles.

Reference analogue: none (data-curation canon; the reference validates
single documents).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# post-lower() ASCII word class — the repo-wide tokenizer convention
# (stages/text.py WORD_RE after lower()), mirrored by the oracles'
# regexp_extract_all(lower(text), '[0-9a-z_]+')
_LWORD_RE = re.compile(r"[0-9a-z_]+")


# ---------------------------------------------------------------------------
# Greedy maximum coverage over token bigrams
# ---------------------------------------------------------------------------

def greedy_coverage(sf_dir: str, k: int = 4):
    """Greedy max-coverage: ``k`` rounds of "pick the document whose
    DISTINCT token bigrams cover the most not-yet-covered bigrams",
    ties to the lowest ``doc_id`` — the 1-1/e-approximate submodular
    selection used to build small held-out/eval subsets that span a
    corpus' vocabulary.

    Engine shape: documents are tokenized ONCE into a materialized
    (doc_id, distinct-bigram list) Dataset — a bigram list is atomic
    with its row, so dynamic block splitting can never separate a
    document from its vocabulary.  Each round broadcasts the covered
    set (bounded by the k winners' combined vocabulary, NOT the corpus)
    into one map_batches pass that emits a single per-block argmax
    partial ``(doc_id, gain, terms)`` — the winner's term list rides
    the partial, so the driver learns the next covered set from the
    block-count-sized collect without a second scan.  k rounds = k
    linear passes, zero shuffles.

    Output: one row per round — (round, doc_id, gain, covered_after),
    all int64, bit-identical to the unrolled greedy CTE oracle.
    """
    import ray.data

    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])

    def to_terms(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64()).to_pylist()
        terms: list[list[str]] = []
        for txt in t.column("text").to_pylist():
            ws = _LWORD_RE.findall((txt or "").lower())
            terms.append(sorted({f"{a} {b}" for a, b in zip(ws, ws[1:])}))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "terms": pa.array(terms, pa.list_(pa.string()))})

    doc_terms = ds.map_batches(to_terms, batch_format="pyarrow").materialize()

    empty = pa.table({"doc_id": pa.array([], pa.int64()),
                      "gain": pa.array([], pa.int64()),
                      "terms": pa.array([], pa.list_(pa.string()))})

    covered: set[str] = set()
    rows = []
    for rnd in range(1, k + 1):
        cov = frozenset(covered)  # closure-captured; pick-bounded

        def block_best(t: pa.Table, _cov=cov) -> pa.Table:
            if t.num_rows == 0:
                return empty
            best = None  # (gain, doc_id, terms) with (-gain, doc_id) order
            for did, terms in zip(t.column("doc_id").to_pylist(),
                                  t.column("terms").to_pylist()):
                g = sum(1 for w in terms if w not in _cov)
                if g > 0 and (best is None or (-g, did) < (-best[0], best[1])):
                    best = (g, did, terms)
            if best is None:
                return empty
            return pa.table({
                "doc_id": pa.array([best[1]], pa.int64()),
                "gain": pa.array([best[0]], pa.int64()),
                "terms": pa.array([best[2]], pa.list_(pa.string()))})

        part = collect_small_arrow(
            doc_terms.map_batches(block_best, batch_format="pyarrow"))
        if part.num_rows == 0:
            break  # corpus fully covered — oracle stops emitting too
        gains = part.column("gain").to_pylist()
        dids = part.column("doc_id").to_pylist()
        w = min(range(len(dids)), key=lambda i: (-gains[i], dids[i]))
        covered.update(part.column("terms")[w].as_py())
        rows.append((rnd, dids[w], gains[w], len(covered)))

    return pa.table({
        "round": pa.array([r[0] for r in rows], pa.int64()),
        "doc_id": pa.array([r[1] for r in rows], pa.int64()),
        "gain": pa.array([r[2] for r in rows], pa.int64()),
        "covered_after": pa.array([r[3] for r in rows], pa.int64())})


def greedy_coverage_sql(k: int = 4) -> str:
    """Unrolled greedy CTE: round i recomputes every document's
    uncovered-bigram gain against the covered set c_{i-1}, picks the
    (gain DESC, doc_id) winner, and folds its bigrams into c_i.  The
    bigram CTE is MATERIALIZED — each round references it and DuckDB's
    default CTE inlining would re-derive it per round."""
    base = """
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[0-9a-z_]+') AS l
  FROM documents),
p AS MATERIALIZED (
  SELECT DISTINCT doc_id,
         l[CAST(i AS INT)] || ' ' || l[CAST(i AS INT) + 1] AS term
  FROM toks, unnest(range(1, len(l))) t(i)),
c0 AS (SELECT term FROM p WHERE 1 = 0)"""
    parts = [base]
    finals = []
    for i in range(1, k + 1):
        parts.append(f""",
g{i} AS (
  SELECT doc_id, count(*) AS g FROM p
  WHERE term NOT IN (SELECT term FROM c{i-1})
  GROUP BY doc_id),
s{i} AS MATERIALIZED (
  SELECT doc_id, g FROM g{i} ORDER BY g DESC, doc_id LIMIT 1),
c{i} AS MATERIALIZED (
  SELECT term FROM c{i-1}
  UNION
  SELECT p.term FROM p JOIN s{i} USING (doc_id))""")
        finals.append(
            f"SELECT CAST({i} AS BIGINT) AS round, s{i}.doc_id, "
            f"CAST(s{i}.g AS BIGINT) AS gain, "
            f"CAST((SELECT count(*) FROM c{i}) AS BIGINT) AS covered_after "
            f"FROM s{i}")
    return ("".join(parts) + "\n" + "\nUNION ALL\n".join(finals)
            + "\nORDER BY round")


# ---------------------------------------------------------------------------
# Maximal Marginal Relevance diversified top-k
# ---------------------------------------------------------------------------

def mmr_select(sf_dir: str, c: int = 64, k: int = 8):
    """MMR re-ranking: from the ``c`` highest-relevance candidates
    (dot product against the query = the min-``vec_id`` embedding),
    greedily pick ``k`` where each pick maximizes

        score = 2 * rel(v) - max_{s in selected} sim(v, s)

    (lambda = 1/2 scaled by 2 to stay integral), ties to the lowest
    ``vec_id``.  Embeddings are quantized to int64 (floor(x*1e6+0.5))
    so the whole trajectory — relevance, pairwise similarities, scores
    — is exact integer math, bit-identical to the oracle.

    Engine shape: ONE linear pass computes every vector's relevance dot
    against the broadcast query and emits a per-block top-``c`` partial
    that CARRIES the quantized vectors, so the candidate tile (c rows)
    reaches the driver from the block-count-sized collect without a
    second scan.  The c x c pairwise-similarity tile and the k-step
    greedy loop are candidate-bounded driver work (c=64 -> 32 KiB of
    dots), never corpus-sized.  Overflow guard: |xq| <= 2e6 and
    dim <= 4096 bound every dot by 1.6e16 << 2^63.
    """
    import ray.data

    from ..util import collect_small_arrow

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def quantize(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        ids = pc.cast(t.column("vec_id"), pa.int64()).to_numpy(
            zero_copy_only=False)
        emb = t.column("embedding")
        if emb.num_chunks:
            flat = np.concatenate([
                np.asarray(ch.flatten(), dtype=np.float64)
                for ch in emb.chunks])
            mat = flat.reshape(len(ids), -1) if len(ids) else \
                np.empty((0, 0), np.float64)
        else:
            mat = np.empty((0, 0), np.float64)
        xq = np.floor(mat * 1e6 + 0.5).astype(np.int64)
        if xq.size and (np.abs(xq).max() > 2_000_000 or xq.shape[1] > 4096):
            raise ValueError("mmr_select: quantized magnitude/dim outside "
                             "the int64 dot-product overflow budget")
        return ids, xq

    # pass 0 (cheap, embedding-free): the query id is the global min
    qid = int(ds.min("vec_id"))

    def q_partial(t: pa.Table) -> pa.Table:
        ids, xq = quantize(t)
        hit = np.flatnonzero(ids == qid)
        if not len(hit):
            return pa.table({"xq": pa.array([], pa.list_(pa.int64()))})
        return pa.table({"xq": pa.array([xq[hit[0]].tolist()],
                                        pa.list_(pa.int64()))})

    qt = collect_small_arrow(
        ds.map_batches(q_partial, batch_format="pyarrow"))
    qvec = np.asarray(qt.column("xq")[0].as_py(), dtype=np.int64)

    def topc_partial(t: pa.Table) -> pa.Table:
        ids, xq = quantize(t)
        keep = ids != qid
        ids, xq = ids[keep], xq[keep]
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "rel": pa.array([], pa.int64()),
                             "xq": pa.array([], pa.list_(pa.int64()))})
        rel = xq @ qvec
        order = np.lexsort((ids, -rel))[:c]
        return pa.table({
            "vec_id": pa.array(ids[order], pa.int64()),
            "rel": pa.array(rel[order], pa.int64()),
            "xq": pa.array([row.tolist() for row in xq[order]],
                           pa.list_(pa.int64()))})

    part = collect_small_arrow(
        ds.map_batches(topc_partial, batch_format="pyarrow"))
    ids = part.column("vec_id").to_numpy(zero_copy_only=False)
    rel = part.column("rel").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -rel))[:c]
    ids, rel = ids[order], rel[order]
    cmat = np.asarray(part.column("xq").take(pa.array(order)).to_pylist(),
                      dtype=np.int64)

    sims = cmat @ cmat.T  # c x c int64, overflow-bounded by the guard

    selected: list[int] = []
    out = []
    for rank in range(1, min(k, len(ids)) + 1):
        best = None  # (score, vec_id, idx, ms)
        for i in range(len(ids)):
            if i in selected:
                continue
            ms = int(max(sims[i, j] for j in selected)) if selected else 0
            score = 2 * int(rel[i]) - ms
            key = (-score, int(ids[i]))
            if best is None or key < best[0]:
                best = (key, i, ms, score)
        _, i, ms, score = best
        selected.append(i)
        out.append((rank, int(ids[i]), int(rel[i]), ms, score))

    return pa.table({
        "rank": pa.array([r[0] for r in out], pa.int64()),
        "vec_id": pa.array([r[1] for r in out], pa.int64()),
        "rel_dot": pa.array([r[2] for r in out], pa.int64()),
        "max_sim_dot": pa.array([r[3] for r in out], pa.int64()),
        "mmr_score": pa.array([r[4] for r in out], pa.int64())})


def mmr_select_sql(c: int = 64, k: int = 8) -> str:
    """Unrolled greedy MMR CTE over the same int64 quantization; the
    element-unnest and candidate/pairwise tiles are MATERIALIZED (each
    greedy round references them)."""
    base = """
WITH el AS MATERIALIZED (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
qv AS MATERIALIZED (
  SELECT dim, xq FROM el
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)),
rel AS (
  SELECT el.vec_id, CAST(sum(el.xq * qv.xq) AS BIGINT) AS rel
  FROM el JOIN qv USING (dim)
  WHERE el.vec_id <> (SELECT min(vec_id) FROM embeddings)
  GROUP BY el.vec_id),
cand AS MATERIALIZED (
  SELECT vec_id, rel FROM rel ORDER BY rel DESC, vec_id LIMIT {c}),
pd AS MATERIALIZED (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(sum(a.xq * b.xq) AS BIGINT) AS s
  FROM el a JOIN el b USING (dim)
  WHERE a.vec_id IN (SELECT vec_id FROM cand)
    AND b.vec_id IN (SELECT vec_id FROM cand) AND a.vec_id <> b.vec_id
  GROUP BY ia, ib),
s1 AS MATERIALIZED (
  SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms,
         CAST(2 * rel AS BIGINT) AS score
  FROM cand ORDER BY 2 * rel DESC, vec_id LIMIT 1),
sel1 AS (SELECT vec_id FROM s1)""".replace("{c}", str(int(c)))
    parts = [base]
    finals = ["SELECT CAST(1 AS BIGINT) AS rank, vec_id, rel AS rel_dot, "
              "ms AS max_sim_dot, score AS mmr_score FROM s1"]
    for i in range(2, k + 1):
        parts.append(f""",
s{i} AS MATERIALIZED (
  SELECT c.vec_id, c.rel, CAST(max(pd.s) AS BIGINT) AS ms,
         CAST(2 * c.rel - max(pd.s) AS BIGINT) AS score
  FROM cand c JOIN pd ON pd.ia = c.vec_id
                     AND pd.ib IN (SELECT vec_id FROM sel{i-1})
  WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i-1})
  GROUP BY c.vec_id, c.rel
  ORDER BY score DESC, c.vec_id LIMIT 1),
sel{i} AS MATERIALIZED (
  SELECT vec_id FROM sel{i-1} UNION SELECT vec_id FROM s{i})""")
        finals.append(
            f"SELECT CAST({i} AS BIGINT), vec_id, rel, ms, score FROM s{i}")
    return ("".join(parts) + "\n" + "\nUNION ALL\n".join(finals)
            + "\nORDER BY rank")
