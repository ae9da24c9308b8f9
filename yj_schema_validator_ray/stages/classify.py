"""Model-scoring and index-building operators over the ``documents``
table: a linear bag-of-words quality classifier (the fasttext-style
"score every document with a trained model" stage every training-data
pipeline runs before filtering) and a bounded inverted-index builder
(term -> capped posting list).

Reference analogue: none in ``alexmond/yj-schema-validator`` (the
reference is a schema validator); these come from the LLM-training-data
brief.  Both are SQL-oracle-able because the model is a pinned
integer-weight table and the postings cap is an exact "P smallest doc
ids" semantics — no floats, no approximation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import WORD_RE

# Pinned linear model: token -> integer weight.  Integer scores keep the
# driver's value-hash comparison exact (no fp summation-order drift),
# exactly like the money-in-cents rule for the relational queries.  The
# terms cover the corpus's closed vocabulary so scores vary per doc.
CLF_WEIGHTS: dict[str, int] = {
    "fast": 3, "vector": 2, "stream": 2, "merge": 1, "join": 1,
    "query": 1, "window": 1, "sort": 1, "batch": 1, "hash": 1,
    "slow": -3, "dup": -4, "scan": -1, "a": -1, "the": -1,
}
CLF_BIAS = 0
CLF_THRESHOLD = 0


class LinearClassifier:
    """Per-process model state: compiled tokenizer + weight lookup table.

    The "model" is deliberately tiny here, but the plumbing is the real
    thing: weights load once per process (``util.process_cached`` task
    mode — cheap state, no actor-pool ramp), scoring is one vectorized
    explode + hash-map lookup + segmented add per batch.  A real
    fasttext/regression model swaps the dict for an embedding matrix in
    ``__init__`` and nothing else changes.
    """

    def __init__(self):
        import re

        self.word = re.compile(WORD_RE)
        self.weights = dict(CLF_WEIGHTS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.word.pattern)
        lens = toks.map(len).to_numpy()
        score = np.full(len(batch), CLF_BIAS, dtype=np.int64)
        if lens.sum():
            flat = np.concatenate(
                [np.asarray(t, dtype=object) for t in toks])
            w = (pd.Series(flat).map(self.weights)
                 .fillna(0).to_numpy(np.int64))
            doc_idx = np.repeat(np.arange(len(batch)), lens)
            np.add.at(score, doc_idx, w)
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(np.int64),
            "clf_score": score,
            "keep": score >= CLF_THRESHOLD,
        })


def quality_classifier(docs_ds):
    """(doc_id, clf_score, keep): linear bag-of-words model score per
    document.  Zero-shuffle scan; every occurrence of a vocab token
    contributes its weight (not distinct-token scoring)."""
    from ..util import process_cached

    return docs_ds.map_batches(process_cached(LinearClassifier, ()),
                               batch_format="pandas")


def quality_classifier_sql() -> str:
    """DuckDB mirror: unnest the same lowercased ASCII-\\w token stream,
    join the pinned weight table, sum per doc (docs with zero vocab hits
    still appear via the LEFT JOIN back to documents)."""
    values = ", ".join(f"('{t}', {w})" for t, w in sorted(CLF_WEIGHTS.items()))
    return f"""
WITH w(tok, wt) AS (VALUES {values}),
toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS tok
  FROM documents
),
s AS (
  SELECT t.doc_id, SUM(w.wt) AS hit_sum
  FROM toks t JOIN w ON t.tok = w.tok
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(s.hit_sum, 0) + {CLF_BIAS} AS BIGINT) AS clf_score,
       (COALESCE(s.hit_sum, 0) + {CLF_BIAS}) >= {CLF_THRESHOLD} AS keep
FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id"""


class _BigramScorer:
    """Per-process state: the broadcast 65,536-cell bigram count table
    (one ``ray.get`` per worker process, zero-copy numpy view)."""

    def __init__(self, ref):
        import ray

        self.counts = ray.get(ref)

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        data, offs, doc_idx, codes, valid = _bigram_codes(t.column("text"))
        n = len(ids)
        score = np.zeros(n, np.int64)
        nb = np.zeros(n, np.int64)
        if len(codes):
            vals = self.counts[codes]
            np.add.at(score, doc_idx[valid], vals[valid])
            np.add.at(nb, doc_idx[valid], 1)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "n_bigrams": pa.array(nb),
                         "score": pa.array(score)})


def _bigram_codes(col):
    """Vectorized char-bigram extraction straight from the Arrow string
    buffers: returns (data bytes, offsets, per-pair doc index, pair
    codes b0*256+b1, validity mask excluding cross-document pairs).
    ASCII-only by contract (byte == character, so the DuckDB ``substr``
    oracle sees identical bigrams); non-ASCII bytes raise."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = pc.fill_null(col, "")
    n = len(col)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)[
        offs[0]:offs[-1]]
    offs = offs - offs[0]
    if len(data) and data.max() >= 128:
        raise ValueError("char bigram LM: corpus must be ASCII "
                         "(byte != char breaks the substr oracle)")
    if len(data) < 2:
        return data, offs, np.zeros(0, np.int64), np.zeros(0, np.int64), \
            np.zeros(0, bool)
    codes = data[:-1].astype(np.int64) * 256 + data[1:]
    lens = offs[1:] - offs[:-1]
    doc_idx = np.repeat(np.arange(n), lens)[:len(data) - 1]
    valid = np.ones(len(data) - 1, bool)
    bound = offs[1:-1] - 1  # last byte of each doc pairs into the next
    bound = bound[bound >= 0]
    valid[bound[bound < len(valid)]] = False
    return data, offs, doc_idx, codes, valid


def charlm_scores(docs_ds):
    """Corpus-trained character-bigram LM quality score (the CCNet /
    KenLM "score every document with a model trained on the corpus
    itself" shape, in exact integers): pass 1 aggregates the global
    bigram frequency table (domain <= 256^2 cells — a per-batch
    ``bincount`` partial and one tiny keyed aggregate), pass 2
    broadcasts it and scores each document as the SUM of its bigrams'
    corpus frequencies.  Common char sequences score high; line noise
    scores low.  Integer sums keep the DuckDB mirror bit-exact where a
    log-prob formulation would drift.

    Output: ``(doc_id, n_bigrams, score)``, one row per document
    (zero-bigram docs score 0).
    """
    import ray

    from ..util import collect_small_arrow, process_cached, ref_key
    from .exact_agg import grouped_aggregate

    def count_partial(t: pa.Table) -> pa.Table:
        _, _, _, codes, valid = _bigram_codes(t.column("text"))
        counts = np.bincount(codes[valid], minlength=65536) \
            if len(codes) else np.zeros(65536, np.int64)
        nz = np.flatnonzero(counts)
        return pa.table({"code": pa.array(nz, pa.int64()),
                         "n": pa.array(counts[nz], pa.int64())})

    agg = grouped_aggregate(
        docs_ds.map_batches(count_partial, batch_format="pyarrow"),
        ["code"], [("n", "sum", "n")])
    tbl = collect_small_arrow(agg)
    full = np.zeros(65536, np.int64)
    if tbl.num_columns:
        full[tbl.column("code").to_numpy()] = tbl.column("n").to_numpy()
    ref = ray.put(full)

    return docs_ds.map_batches(
        process_cached(_BigramScorer, (ref_key(ref),), ref),
        batch_format="pyarrow")


def charlm_scores_sql() -> str:
    """Mirror: explode char bigrams via ``substr`` positions, aggregate
    the same global frequency table, join it back per document."""
    return """
WITH grams AS (
  SELECT doc_id, substr(text, i, 2) AS g
  FROM documents, unnest(range(1, length(text))) AS t(i)
),
counts AS (SELECT g, count(*) AS c FROM grams GROUP BY g),
s AS (
  SELECT doc_id, count(*) AS nb, sum(c) AS sc
  FROM grams JOIN counts USING (g)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(coalesce(s.nb, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.sc, 0) AS BIGINT) AS score
FROM documents d LEFT JOIN s USING (doc_id)"""


def term_postings(docs_ds, k: int = 50, cap: int = 20):
    """Bounded inverted index: for the top-``k`` terms by document
    frequency, the first ``cap`` doc ids (ascending) that contain the
    term, as a comma-joined string, plus the exact df.

    Shape (the same scale discipline as :func:`.text.vocab_top_terms`):
    per-batch tokenize + LOCAL (term -> df, capped sorted postings)
    pre-aggregation — each doc lives in exactly one batch, so partial
    dfs sum exactly and partial posting lists are disjoint — then one
    coarse-hash exchange on the term, a per-coarse-group merge that
    re-sorts/re-caps the union of partial lists (exact for "cap
    smallest ids": every global minimum survives its own partial's
    cap), per-block top-k, and a tiny global sort.  Postings rows cross
    the wire at <= cap ids per term per block; the full posting lists
    never materialize anywhere.
    """
    from ..util import shuffle_partitions
    from .exact_agg import hash_columns

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64"),
                                 "postings": pd.Series(dtype="object")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(np.int64), lens)
        pairs = (pd.DataFrame({"term": flat, "doc_id": doc_rep})
                 .drop_duplicates()
                 .sort_values(["term", "doc_id"]))
        g = pairs.groupby("term", sort=False)
        out = g.agg(df=("doc_id", "size")).reset_index()
        out["df"] = out["df"].astype("int64")
        out["postings"] = (g["doc_id"]
                           .agg(lambda v: ",".join(map(str, v.iloc[:cap])))
                           .to_numpy())
        return out

    def add_coarse(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select(["term"]))
        return t.append_column(
            "__coarse", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("term", sort=False)
               .agg(df=("df", "sum")).reset_index())
        out["df"] = out["df"].astype("int64")
        expl = (g[["term"]].assign(pid=g["postings"].str.split(","))
                .explode("pid"))
        expl["pid"] = expl["pid"].astype("int64")
        top = (expl.sort_values(["term", "pid"])
               .groupby("term", sort=False).head(cap))
        posts = top.groupby("term", sort=False)["pid"].agg(
            lambda v: ",".join(map(str, v)))
        out["postings"] = out["term"].map(posts).to_numpy()
        return out

    agg = (docs_ds.map_batches(partial, batch_format="pandas")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("__coarse", num_partitions=shuffle_partitions())
           .map_groups(combine, batch_format="pandas"))

    def local_topk(t: pa.Table) -> pa.Table:
        d = (t.to_pandas().sort_values(["df", "term"],
                                       ascending=[False, True]).head(k))
        return pa.Table.from_pandas(d, preserve_index=False)

    return (agg.map_batches(local_topk, batch_format="pyarrow")
            .sort(["df", "term"], descending=[True, False]).limit(k))


def term_postings_sql(k: int = 50, cap: int = 20) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT * FROM (
    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[0-9a-z_]+')) AS tok
    FROM documents)
),
df AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY tok),
ranked AS (
  SELECT tok, doc_id,
         row_number() OVER (PARTITION BY tok ORDER BY doc_id) AS rn
  FROM toks
),
posts AS (
  SELECT tok, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM ranked WHERE rn <= {cap} GROUP BY tok
)
SELECT d.tok AS term, d.df, p.postings
FROM df d JOIN posts p USING (tok)
ORDER BY d.df DESC, term LIMIT {k}"""
