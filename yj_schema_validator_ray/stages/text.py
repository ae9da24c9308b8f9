"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, document fingerprinting.

All hot paths are vectorized: pyarrow.compute RE2 kernels (which match
DuckDB's RE2 semantics exactly — that is what makes the SQL oracles
byte-equal) or per-actor compiled regexes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# Word regex shared with the DuckDB oracle.  The oracles spell it '\w+',
# which RE2 reads as ASCII [0-9A-Za-z_]+; several engine paths tokenize
# via pandas .str.findall (Python re, where \w is UNICODE-aware), so the
# engine side spells the ASCII class out explicitly — the two notations
# are byte-identical under RE2, and the explicit class keeps Python re
# agreeing with RE2 on non-ASCII corpora too.
WORD_RE = r"[0-9A-Za-z_]+"
PUNCT_RE = r"[.,;:!?]"


def token_counts(docs_ds):
    """(doc_id, n_tokens, n_chars): \\w+ token count + char length.
    Vectorized pc.count_substring_regex — no Python loop."""
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(pc.count_substring_regex(text, WORD_RE), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def quality_stats(docs_ds):
    """SQL-oracle-able quality metrics per doc: token/char counts, punct
    count, upper-char count, mean token length (rounded)."""
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_tokens = pc.cast(pc.count_substring_regex(text, WORD_RE), pa.int64())
        n_chars = pc.cast(pc.utf8_length(text), pa.int64())
        n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64())
        n_upper = pc.cast(pc.count_substring_regex(text, r"[A-Z]"), pa.int64())
        tok_chars = pc.cast(pc.count_substring_regex(text, r"\w"), pa.int64())
        # explicit half-away-from-zero rounding (same formula as the SQL
        # oracle; pc.round is half-to-even — a 6-decimal tie would flip)
        mean_tok = pc.divide(
            pc.floor(pc.add(pc.multiply(
                pc.divide(pc.cast(tok_chars, pa.float64()),
                          pc.cast(pc.max_element_wise(n_tokens, 1), pa.float64())),
                1e6), 0.5)), 1e6)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens": n_tokens, "n_chars": n_chars,
            "n_punct": n_punct, "n_upper": n_upper,
            "mean_token_len": mean_tok,
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "por"},
}


class QualityScorer:
    """Actor-pool stage: composite quality score per document
    (length / punctuation / stopword ratios — the C4/Gopher-style
    heuristics).  Stopword sets + regexes compiled once per actor."""

    def __init__(self):
        import re

        self.word = re.compile(WORD_RE)
        self.stop = frozenset().union(*_STOPWORDS.values())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(self.word.pattern)
        n_tok = toks.map(len).clip(lower=1)
        stop_ratio = toks.map(
            lambda ws: sum(w in self.stop for w in ws)) / n_tok
        n_chars = batch["text"].str.len().clip(lower=1)
        alpha_ratio = batch["text"].str.count(r"[A-Za-z]") / n_chars
        # crude composite in [0, 1]
        length_score = (n_chars.clip(upper=2000) / 2000.0)
        score = (0.4 * alpha_ratio + 0.3 * stop_ratio.clip(upper=0.5) / 0.5
                 + 0.3 * length_score)
        # explicit half-away rounding: identical formula in the SQL
        # oracle (numpy's round is half-even, DuckDB's is half-away —
        # midpoints would flip by 1e-6 otherwise)
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
        return pd.DataFrame({
            "doc_id": batch["doc_id"],
            "stop_ratio": r6(stop_ratio),
            "alpha_ratio": r6(alpha_ratio),
            "quality_score": r6(score),
        })


def quality_scores(docs_ds):
    from ..util import process_cached

    # cheap state (regex + stopword sets) -> task mode, per-process cache
    return docs_ds.map_batches(process_cached(QualityScorer, ()),
                               batch_format="pandas")


class LangId:
    """Actor-pool stage: stopword-hit language ID (n-gram-free heuristic;
    deterministic).  Falls back to 'unknown' when no list scores."""

    def __init__(self):
        import re

        self.word = re.compile(WORD_RE)
        self.tables = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = []
        for text in batch["text"]:
            ws = self.word.findall(text.lower())[:200]
            best, best_hits = "unknown", 0
            for lang in sorted(self.tables):
                hits = sum(w in self.tables[lang] for w in ws)
                if hits > best_hits:
                    best, best_hits = lang, hits
            preds.append(best)
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": preds})


def lang_id(docs_ds):
    from ..util import process_cached

    return docs_ds.map_batches(process_cached(LangId, ()),
                               batch_format="pandas")


def _fnv1a_rolling(norm) -> np.ndarray:
    """Vectorized FNV-1a over every document's UTF-8 bytes, straight from
    the Arrow string buffers (zero-copy).  The hash is sequential in byte
    POSITION but independent across DOCUMENTS, so we loop over positions
    (bounded by the longest doc) and update the whole batch per step —
    ~batch_size-way SIMD instead of a per-byte Python loop."""
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    off_dtype = np.int64 if pa.types.is_large_string(norm.type) else np.int32
    offs = np.frombuffer(norm.buffers()[1], dtype=off_dtype)[
        norm.offset:norm.offset + len(norm) + 1].astype(np.int64)
    data = np.frombuffer(norm.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    h = np.full(len(norm), 1469598103934665603, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    # iterate longest-first so the active set shrinks monotonically
    order = np.argsort(-lens, kind="stable")
    starts_o, lens_o, h_o = starts[order], lens[order], h[order]
    maxlen = int(lens_o[0]) if len(lens_o) else 0
    n_active = len(lens_o)
    with np.errstate(over="ignore"):
        for p in range(maxlen):
            while n_active and lens_o[n_active - 1] <= p:
                n_active -= 1
            b = data[starts_o[:n_active] + p].astype(np.uint64)
            h_o[:n_active] = (h_o[:n_active] ^ b) * prime
    h[order] = h_o
    # signed mapping h - 2^63 (== flip the top bit, viewed as int64)
    return (h ^ np.uint64(1 << 63)).view(np.int64)


def fingerprints(docs_ds):
    """Deterministic document fingerprints: md5 of the
    whitespace-normalized lower-cased text (SQL-oracle-able: DuckDB
    ``md5(lower(regexp_replace(text,'\\s+',' ',g)))``) plus a 64-bit
    FNV-1a rolling content hash (rows-only; vectorized across the batch
    by byte position — no per-byte Python loop)."""
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        norm = pc.replace_substring_regex(pc.utf8_lower(text), r"\s+", " ")
        md5s = [hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in norm.to_pylist()]
        rolls = _fnv1a_rolling(norm)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "fingerprint_md5": pa.array(md5s, pa.string()),
            "fingerprint_fnv": pa.array(rolls, pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONGNUM_RE = r"[0-9]{6,}"


def scrub_pii(docs_ds):
    """PII-style scrubbing pass (emails, long digit runs): per-doc match
    counts + the scrubbed text length — fully vectorized RE2 kernels
    (pc.count_substring_regex / pc.replace_substring_regex), mirrored
    exactly by the DuckDB RE2 oracle.  The scrubbed text itself stays in
    the pipeline in production; the query surfaces the accounting."""
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        n_emails = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
        n_longnums = pc.cast(pc.count_substring_regex(text, LONGNUM_RE), pa.int64())
        clean = pc.replace_substring_regex(
            pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>"),
            LONGNUM_RE, "<NUM>")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_emails": n_emails,
            "n_longnums": n_longnums,
            "clean_len": pc.cast(pc.utf8_length(clean), pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def scrub_pii_sql() -> str:
    return rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{LONGNUM_RE}')) AS BIGINT) AS n_longnums,
       CAST(length(regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                                  '{LONGNUM_RE}', '<NUM>', 'g')) AS BIGINT) AS clean_len
FROM documents"""


def winnowing_fingerprints(docs_ds, k: int = 5, w: int = 4):
    """MOSS-style winnowing fingerprints: char k-gram rolling hashes, one
    selected minimum per sliding window of ``w`` hashes (rightmost-min
    rule), deduped by (position, hash) — the classic local-similarity
    fingerprint (Schleimer, Wilkerson, Aiken, SIGMOD'03).

    Output: exploded rows (doc_id, pos, fingerprint) — guaranteed to
    share fingerprints with any document that shares a substring of
    length >= w + k - 1.  Vectorized per document with a sliding-window
    view; per-batch work is numpy only.
    """
    def f(batch: pa.Table) -> pa.Table:
        out_id, out_pos, out_fp = [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            data = text.encode("utf-8", "ignore")
            n = len(data)
            if n < k:
                continue
            arr = np.frombuffer(data, dtype=np.uint8)
            h = np.zeros(n - k + 1, dtype=np.uint64)
            mult = np.uint64(1099511628211)
            for i in range(k):
                h = h * mult + arr[i:n - k + 1 + i].astype(np.uint64)
            if len(h) < w:
                sel = np.array([int(np.flatnonzero(h == h.min())[-1])])
            else:
                win = np.lib.stride_tricks.sliding_window_view(h, w)
                # rightmost minimum per window: argmin on the reversed
                # window picks the LAST minimal element
                rev_arg = np.argmin(win[:, ::-1], axis=1)
                sel = np.unique(np.arange(len(win)) + (w - 1 - rev_arg))
            out_id.append(np.full(len(sel), doc_id, dtype=np.int64))
            out_pos.append(sel.astype(np.int64))
            out_fp.append(h[sel].astype(np.int64))
        if not out_id:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "fingerprint": pa.array([], pa.int64())})
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
            "pos": pa.array(np.concatenate(out_pos), pa.int64()),
            "fingerprint": pa.array(np.concatenate(out_fp), pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def vocab_top_terms(docs_ds, k: int = 100):
    """Distributed vocabulary building: per-term corpus frequency (tf)
    and document frequency (df), top-``k`` by (tf desc, term asc).

    Shape: per-batch tokenize + LOCAL (term -> tf, df) pre-aggregation
    (one row per distinct term per batch crosses the wire — each doc
    lives in exactly one batch, so per-batch distinct-doc counts sum to
    the true df) -> one coarse-hash exchange
    (:func:`~.exact_agg.grouped_aggregate`) -> per-block top-k -> tiny
    global sort over <= partitions*k rows.  The global sort never sees
    the full vocabulary.
    """
    from .exact_agg import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64"),
                                 "df": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
        g = (pd.DataFrame({"term": flat, "doc_id": doc_rep})
             .groupby("term", sort=False)
             .agg(tf=("term", "size"), df=("doc_id", "nunique"))
             .reset_index())
        g["tf"] = g["tf"].astype("int64")
        g["df"] = g["df"].astype("int64")
        return g

    agg = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["term"], [("tf", "sum", "tf"), ("df", "sum", "df")])

    def local_topk(t: pa.Table) -> pa.Table:
        d = (t.to_pandas().sort_values(["tf", "term"],
                                       ascending=[False, True]).head(k))
        return pa.Table.from_pandas(d, preserve_index=False)

    return (agg.map_batches(local_topk, batch_format="pyarrow")
            .sort(["tf", "term"], descending=[True, False]).limit(k))


def heavy_hitters(docs_ds, k: int = 20, capacity: int = 400):
    """One-pass heavy-hitter terms via a distributed Misra-Gries sketch
    with an exact recount of the surviving candidates.

    Pass 1 runs a Misra-Gries summary of ``capacity`` counters inside
    each batch (vectorized: full local value_counts truncated to the
    top ``capacity`` — the batch-local equivalent of MG's decrement
    rule, with the same guarantee: any term with batch frequency
    > batch_n/capacity survives) and merges partials with the standard
    mergeable-summaries MG rule (sum, subtract the (capacity+1)-th
    count, keep positives) so the global freq > N/(capacity+1) survival
    bound holds; the driver sees only ``capacity`` candidate terms.  Pass 2 recounts ONLY the broadcast
    candidates exactly and keeps the top ``k`` by (count desc, term
    asc).  Unlike :func:`vocab_top_terms` the full vocabulary never
    shuffles — memory is O(capacity) per worker regardless of
    vocabulary size; the trade is that adversarial distributions where
    the true k-th hitter's frequency is below n/capacity can evade the
    sketch (the classic MG bound), which the exact variant does not
    miss.
    """
    import ray

    from ..util import process_cached

    def mg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        vc = pd.Series(flat).value_counts().head(capacity)
        return pd.DataFrame({"term": vc.index, "n": vc.to_numpy().astype("int64")})

    def mg_merge(g: pd.DataFrame) -> pd.DataFrame:
        # standard Misra-Gries merge (Agarwal et al., "Mergeable
        # Summaries"): sum counters, then subtract the (capacity+1)-th
        # largest count from every counter and keep the positive ones —
        # NOT a plain truncate, which would void the global
        # freq > N/(capacity+1) survival bound when a hitter is spread
        # evenly across partials.  Counts may be deflated here; the
        # exact recount pass below restores true counts for survivors.
        m = (g.groupby("term", sort=False)["n"].sum()
             .sort_values(ascending=False))
        if len(m) > capacity:
            m = m.iloc[:capacity] - int(m.iloc[capacity])
            m = m[m > 0]
        return pd.DataFrame({"term": m.index, "n": m.to_numpy().astype("int64")})

    from ..util import shuffle_partitions

    # hierarchical merge: per-partition re-truncation first, so the
    # final single-task merge sees <= partitions * capacity rows, not
    # blocks * capacity
    cand = (docs_ds.map_batches(mg_partial, batch_format="pandas")
            .repartition(shuffle_partitions())
            .map_batches(mg_merge, batch_format="pandas")
            .repartition(1)
            .map_batches(mg_merge, batch_format="pandas"))
    cand_terms = [r["term"] for r in cand.take_all()]  # <= capacity strings
    wanted_ref = ray.put(frozenset(cand_terms))

    class Recount:
        def __init__(self, ref):
            self.wanted = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(WORD_RE)
            lens = toks.map(len).to_numpy()
            if lens.sum() == 0:
                return pd.DataFrame({"term": pd.Series(dtype="object"),
                                     "n": pd.Series(dtype="int64")})
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            s = pd.Series(flat)
            vc = s[s.isin(self.wanted)].value_counts()
            return pd.DataFrame({"term": vc.index,
                                 "n": vc.to_numpy().astype("int64")})

    from ..util import ref_key
    from .exact_agg import grouped_aggregate

    exact = grouped_aggregate(
        docs_ds.map_batches(
            process_cached(Recount, (ref_key(wanted_ref),), wanted_ref),
            batch_format="pandas"),
        ["term"], [("n", "sum", "n")])
    return (exact.sort(["n", "term"], descending=[True, False]).limit(k))


def chunk_documents(docs_ds, size: int = 500, step: int = 400):
    """Sliding-window document chunking (the RAG / long-doc training
    prep stage): chunk i covers chars ``[i*step, i*step+size)``;
    ``n_chunks = 1 + max(0, ceil((len - size) / step))`` so every char
    is covered and the tail chunk may be short.  1->N row expansion per
    batch; the driver-facing columns carry the chunk's sha256 + length
    (binary-safe compare), the text itself stays in-pipeline.
    """
    def f(batch: pa.Table) -> pa.Table:
        out_id, out_ci, out_start, out_len, out_sha = [], [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            n = len(text)
            n_chunks = 1 + max(0, int(np.ceil((n - size) / float(step))))
            for ci in range(n_chunks):
                chunk = text[ci * step:ci * step + size]
                out_id.append(doc_id)
                out_ci.append(ci)
                out_start.append(ci * step)
                out_len.append(len(chunk))
                out_sha.append(hashlib.sha256(chunk.encode()).hexdigest())
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "chunk_idx": pa.array(out_ci, pa.int64()),
            "start_char": pa.array(out_start, pa.int64()),
            "chunk_chars": pa.array(out_len, pa.int64()),
            "chunk_sha256": pa.array(out_sha, pa.string()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def chunk_documents_sql(size: int = 500, step: int = 400) -> str:
    """Oracle: same window rule via generate_series + substring (docs
    are ASCII, so char ops equal byte ops; sha over the same slices)."""
    return f"""
WITH m AS (
  SELECT doc_id, text, CAST(length(text) AS BIGINT) AS n FROM documents
),
idx AS (
  SELECT doc_id, text,
         unnest(generate_series(0,
           CAST(greatest(ceil((n - {size}) / {step}.0), 0) AS BIGINT))) AS ci
  FROM m
)
SELECT doc_id, CAST(ci AS BIGINT) AS chunk_idx,
       CAST(ci * {step} AS BIGINT) AS start_char,
       CAST(length(substring(text, CAST(ci * {step} + 1 AS BIGINT), {size}))
            AS BIGINT) AS chunk_chars,
       sha256(substring(text, CAST(ci * {step} + 1 AS BIGINT), {size}))
         AS chunk_sha256
FROM idx"""


def heavy_hitters_sql(k: int = 20) -> str:
    """Oracle for :func:`heavy_hitters` — exact whenever the vocabulary
    fits the sketch capacity (always true for this corpus)."""
    return rf"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM toks GROUP BY term ORDER BY n DESC, term LIMIT {k}"""


def vocab_top_terms_sql(k: int = 100) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS tf,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS df
FROM toks GROUP BY term
ORDER BY tf DESC, term LIMIT {k}"""


def term_cooccurrence(docs_ds, v: int = 50):
    """Document-level co-occurrence counts over the top-``v`` vocabulary
    (the PMI numerator table: collocation mining, topic seeding, word-
    association features).

    Plan: vocabulary = :func:`vocab_top_terms` (distributed top-v, the
    full vocab never collects anywhere) -> the v terms land in each
    task's closure (strings, KBs) -> per batch a vectorized
    (doc, term)-distinct self-merge on doc_id emits ordered pairs
    (term_a < term_b) with LOCAL counts -> one pair-keyed coarse
    exchange (pair domain <= v*(v-1)/2 regardless of corpus size) ->
    df columns for both terms attach from the same v-row vocab at the
    end, making each row PMI-ready (log(n_docs*N/(df_a*df_b)) is
    driver math).  Per-doc pair fan-out is bounded by the vocab hit
    count, not document length.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    voc_t = collect_small_arrow(vocab_top_terms(docs_ds, k=v))
    vocab = voc_t.column("term").to_pylist()
    dfs = dict(zip(vocab, voc_t.column("df").to_pylist()))
    vocab_set = set(vocab)

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"term_a": pd.Series(dtype="object"),
                              "term_b": pd.Series(dtype="object"),
                              "n_docs": pd.Series(dtype="int64")})
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
        ft = pd.DataFrame({"doc_id": doc_rep, "term": flat})
        ft = ft[ft["term"].isin(vocab_set)].drop_duplicates()
        if ft.empty:
            return empty
        m = ft.merge(ft, on="doc_id")
        m = m[m["term_x"] < m["term_y"]]
        if m.empty:
            return empty
        g = (m.groupby(["term_x", "term_y"], sort=False).size()
             .reset_index(name="n_docs"))
        g.columns = ["term_a", "term_b", "n_docs"]
        g["n_docs"] = g["n_docs"].astype("int64")
        return g

    pairs = grouped_aggregate(
        docs_ds.map_batches(pair_partial, batch_format="pandas"),
        ["term_a", "term_b"], [("n_docs", "sum", "n_docs")])

    def attach_df(t: pa.Table) -> pa.Table:
        a = pd.Series(t.column("term_a").to_pandas())
        b = pd.Series(t.column("term_b").to_pandas())
        return pa.table({
            "term_a": t.column("term_a"), "term_b": t.column("term_b"),
            "n_docs": pc.cast(t.column("n_docs"), pa.int64()),
            "df_a": pa.array(a.map(dfs).to_numpy(np.int64)),
            "df_b": pa.array(b.map(dfs).to_numpy(np.int64)),
        })

    return pairs.map_batches(attach_df, batch_format="pyarrow")


def term_cooccurrence_sql(v: int = 50) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents),
v AS (
  SELECT term, CAST(count(*) AS BIGINT) AS tf,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term ORDER BY tf DESC, term LIMIT {v}),
ft AS (
  SELECT DISTINCT t.doc_id, t.term FROM toks t
  WHERE t.term IN (SELECT term FROM v)),
p AS (
  SELECT a.term AS term_a, b.term AS term_b,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM ft a JOIN ft b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY a.term, b.term)
SELECT p.term_a, p.term_b, p.n_docs, va.df AS df_a, vb.df AS df_b
FROM p JOIN v va ON va.term = p.term_a JOIN v vb ON vb.term = p.term_b"""


def lang_id_sql() -> str:
    """DuckDB oracle for :func:`lang_id`: same stopword tables, same
    first-200-token window, same first-max-wins tie-break (languages
    iterated in sorted order with strict '>' replacement)."""
    langs = sorted(_STOPWORDS)
    hit_cols = []
    for lang in langs:
        words = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[lang]))
        hit_cols.append(
            f"len(list_filter(ws, x -> list_contains([{words}], x))) AS {lang}")
    greatest = f"greatest({', '.join(langs)})"
    whens = " ".join(f"WHEN {lang} = {greatest} THEN '{lang}'"
                     for lang in langs)
    return rf"""
WITH toks AS (
  SELECT doc_id,
         list_slice(regexp_extract_all(lower(text), '\w+'), 1, 200) AS ws
  FROM documents
),
hits AS (
  SELECT doc_id, {', '.join(hit_cols)} FROM toks
)
SELECT doc_id,
       CASE WHEN {greatest} = 0 THEN 'unknown' {whens} END AS lang_pred
FROM hits"""


def quality_scores_sql() -> str:
    """DuckDB oracle for :func:`quality_scores` — identical operand order
    so the unrounded doubles match bit-for-bit before round(6)."""
    union = sorted(frozenset().union(*_STOPWORDS.values()))
    words = ", ".join(f"'{w}'" for w in union)
    return rf"""
WITH t AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '\w+') AS ws,
         greatest(length(text), 1) AS n_chars
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(list_filter(ws, x -> list_contains([{words}], x))) AS DOUBLE)
           / CAST(greatest(len(ws), 1) AS DOUBLE) AS stop_ratio_raw,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE)
           / CAST(n_chars AS DOUBLE) AS alpha_ratio_raw,
         CAST(least(n_chars, 2000) AS DOUBLE) / 2000.0 AS length_score
  FROM t
)
SELECT doc_id,
       floor(stop_ratio_raw * 1e6 + 0.5) / 1e6 AS stop_ratio,
       floor(alpha_ratio_raw * 1e6 + 0.5) / 1e6 AS alpha_ratio,
       floor((0.4 * alpha_ratio_raw
              + (0.3 * least(stop_ratio_raw, 0.5)) / 0.5
              + 0.3 * length_score) * 1e6 + 0.5) / 1e6 AS quality_score
FROM m"""


def repetition_stats(docs_ds):
    """Gopher-style repetition quality signals per document (Rae et al.
    2021, "Scaling Language Models", table A1 repetition filters):
    duplicate-line and top-bigram concentration — the standard
    quality-filter inputs ``dup_line_frac = 1 - n_distinct_lines /
    n_lines`` and ``top_bigram_frac = top_bigram_count / n_bigrams``.
    Raw integer numerators/denominators are emitted (fractions are a
    downstream division) so the SQL oracle compares exactly.

    Zero-shuffle scan; per-doc token/line walks are bounded by document
    size.  Bigrams use the shared ``\\w+`` lowercased tokenizer; lines
    split on bare newline (both mirrored in the SQL CTEs).
    """
    import re
    from collections import Counter

    word = re.compile(WORD_RE)

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        n_lines = []
        n_distinct = []
        n_bigrams = []
        top_bi = []
        for text in batch["text"]:
            lines = text.split("\n")
            n_lines.append(len(lines))
            n_distinct.append(len(set(lines)))
            ws = word.findall(text.lower())
            if len(ws) < 2:
                n_bigrams.append(0)
                top_bi.append(0)
            else:
                c = Counter(zip(ws, ws[1:]))
                n_bigrams.append(len(ws) - 1)
                top_bi.append(max(c.values()))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "n_lines": pd.Series(n_lines, dtype="int64"),
            "n_distinct_lines": pd.Series(n_distinct, dtype="int64"),
            "n_bigrams": pd.Series(n_bigrams, dtype="int64"),
            "top_bigram_count": pd.Series(top_bi, dtype="int64"),
        })

    return docs_ds.map_batches(f, batch_format="pandas")


def repetition_stats_sql() -> str:
    return r"""
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents
),
lstats AS (
  SELECT doc_id, count(*) AS n_lines,
         count(DISTINCT ln) AS n_distinct_lines
  FROM lines GROUP BY doc_id
),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
  FROM documents
),
bi AS (
  SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g
  FROM toks, unnest(generate_series(1, len(ws) - 1)) AS t(i)
),
bc AS (SELECT doc_id, g, count(*) AS c FROM bi GROUP BY doc_id, g),
bstats AS (
  SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bigram_count
  FROM bc GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(l.n_lines AS BIGINT) AS n_lines,
       CAST(l.n_distinct_lines AS BIGINT) AS n_distinct_lines,
       CAST(coalesce(b.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(b.top_bigram_count, 0) AS BIGINT) AS top_bigram_count
FROM documents d
JOIN lstats l USING (doc_id)
LEFT JOIN bstats b USING (doc_id)"""


def compression_stats(docs_ds, level: int = 6):
    """Compression-ratio quality signal: zlib-compressed size per
    document (RefinedWeb / Gopher use compressibility to flag
    boilerplate and gibberish — highly repetitive text compresses far
    below natural prose).  No SQL oracle (DuckDB has no zlib);
    determinism is pinned by unit tests on known inputs.  Zero-shuffle
    scan; the division into a ratio stays downstream so output is
    integer-exact."""
    import zlib

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        raw = []
        comp = []
        for text in batch["text"]:
            b = text.encode("utf-8")
            raw.append(len(b))
            comp.append(len(zlib.compress(b, level)))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].astype("int64"),
            "raw_bytes": pd.Series(raw, dtype="int64"),
            "zlib_bytes": pd.Series(comp, dtype="int64"),
        })

    return docs_ds.map_batches(f, batch_format="pandas")


def tfidf_top_terms(docs_ds, k: int = 3, max_vocab: int = 20_000_000):
    """Per-document DISTINCTIVE terms — the tf-idf feature-extraction
    step of a curation pipeline, with an INTEGER-EXACT ordering so the
    result is driver-oracle-able: terms rank by (tf DESC, df ASC, term
    ASC) — highest in-document frequency, rarest in the corpus.  For
    any two terms of one document this orders exactly like tf * idf
    with any idf strictly decreasing in df whenever tf ties break on
    idf, and it sidesteps the float ``log`` whose last-ULP behavior is
    not pinned down across engines (the repo convention: never hash-
    compare a transcendental).

    Shape: pass 1 builds the document-frequency table — per-batch local
    ``(term, df)`` partials (each doc lives in exactly one batch, so
    per-batch distinct-doc counts SUM to the true df, the same argument
    as :func:`vocab_top_terms`) -> one coarse-hash exchange.  The df
    table is VOCABULARY-sized, not corpus-sized; it broadcasts once via
    ``ray.put`` as a sorted term array + df array and attaches per
    batch with ``searchsorted`` (broadcast-small-side join, never a
    shuffle).  Pass 2 recomputes per-doc tf locally and selects top-k
    per doc inside the batch — per-doc selection never crosses blocks.
    ``max_vocab`` bounds the driver/broadcast state with a clear error
    (same convention as the candidate-id bound in
    :func:`~.dedup.ngram_jaccard_pairs`); beyond it, attach df with a
    distributed term-keyed exchange instead.
    """
    import ray

    from ..util import collect_small_arrow, process_cached, ref_key
    from .exact_agg import grouped_aggregate

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "df": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
        g = (pd.DataFrame({"term": flat, "doc_id": doc_rep})
             .groupby("term", sort=False)
             .agg(df=("doc_id", "nunique")).reset_index())
        g["df"] = g["df"].astype("int64")
        return g

    df_ds = grouped_aggregate(
        docs_ds.map_batches(df_partial, batch_format="pandas"),
        ["term"], [("df", "sum", "df")])
    df_tbl = collect_small_arrow(df_ds)
    if df_tbl.num_rows > max_vocab:
        raise ValueError(
            f"tfidf_top_terms: vocabulary {df_tbl.num_rows} exceeds the "
            f"broadcast bound max_vocab={max_vocab}; use "
            "tfidf_top_terms_distributed (term-keyed exchange, no "
            "broadcast — pinned row-identical in tests)")
    terms = df_tbl.column("term").to_numpy(zero_copy_only=False)
    dfs = df_tbl.column("df").to_numpy()
    order = np.argsort(terms)
    ref = ray.put((terms[order], dfs[order]))

    class TopK:
        def __init__(self, r):
            self.terms, self.dfs = ray.get(r)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            toks = batch["text"].str.lower().str.findall(WORD_RE)
            lens = toks.map(len).to_numpy()
            if lens.sum() == 0:
                return pd.DataFrame({
                    "doc_id": pd.Series(dtype="int64"),
                    "term": pd.Series(dtype="object"),
                    "tf": pd.Series(dtype="int64"),
                    "df": pd.Series(dtype="int64"),
                    "rnk": pd.Series(dtype="int64")})
            flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
            doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
            g = (pd.DataFrame({"doc_id": doc_rep, "term": flat})
                 .groupby(["doc_id", "term"], sort=False).size()
                 .rename("tf").reset_index())
            g["tf"] = g["tf"].astype("int64")
            g["df"] = self.dfs[np.searchsorted(self.terms,
                                               g["term"].to_numpy())]
            g = g.sort_values(["doc_id", "tf", "df", "term"],
                              ascending=[True, False, True, True],
                              kind="mergesort")
            g["rnk"] = (g.groupby("doc_id", sort=False).cumcount() + 1
                        ).astype("int64")
            return g[g["rnk"] <= k].reset_index(drop=True)

    return docs_ds.map_batches(process_cached(TopK, ref_key(ref), ref),
                               batch_format="pandas")


def tfidf_top_terms_sql(k: int = 3) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM toks GROUP BY term
),
ranked AS (
  SELECT t.doc_id, t.term, t.tf, d.df,
         CAST(row_number() OVER (PARTITION BY t.doc_id
              ORDER BY t.tf DESC, d.df ASC, t.term ASC) AS BIGINT) AS rnk
  FROM tf t JOIN df d USING (term)
)
SELECT doc_id, term, tf, df, rnk FROM ranked WHERE rnk <= {k}"""


class LangConfusionPartial(LangId):
    """Per-batch partial of the stated-vs-detected language confusion
    matrix: reuses the :class:`LangId` stopword tables, emits grouped
    COUNTS (lang, lang_pred, n_docs) — never per-doc rows — so the
    exchange moves at most |langs|^2 rows per batch."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds = LangId.__call__(
            self, batch[["doc_id", "text"]])["lang_pred"]
        g = (pd.DataFrame({"lang": batch["lang"].to_numpy(),
                           "lang_pred": preds.to_numpy()})
             .groupby(["lang", "lang_pred"], sort=False).size()
             .rename("n_docs").reset_index())
        g["n_docs"] = g["n_docs"].astype("int64")
        return g


def lang_confusion(docs_ds):
    """Metadata-QA audit: confusion matrix of the corpus's STATED
    ``lang`` column vs the DETECTED language (the same stopword-hit
    heuristic as :func:`lang_id`, so the two queries share one SQL
    oracle core).  The mislabeled-language rate is a standard corpus
    health gate (CCNet-style pipelines drop or re-route documents whose
    declared and detected languages disagree).

    Shape: one scan of per-batch partial counts over the
    (lang x lang_pred) DOMAIN + one tiny coarse-hash exchange — no
    per-document rows ever shuffle, so the plan is flat at 100 TB.
    """
    from ..util import process_cached
    from .exact_agg import grouped_aggregate

    partial = process_cached(LangConfusionPartial, ())
    return grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["lang", "lang_pred"], [("n_docs", "sum", "n_docs")])


def lang_confusion_sql() -> str:
    return f"""
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM documents d JOIN ({lang_id_sql()}) p ON p.doc_id = d.doc_id
GROUP BY d.lang, p.lang_pred"""


def dup_ngram_fraction(docs_ds, n: int = 5):
    """RefinedWeb-style duplicate n-gram accounting ACROSS documents:
    per doc, how many word-``n``-gram positions carry a gram that also
    appears in ANOTHER document (``repetition_stats`` covers the
    within-doc signals; this is the cross-document one used to flag
    boilerplate and templated spam).  Output (doc_id, n_grams,
    n_dup_grams) — integers, fully SQL-oracled; the ratio stays
    downstream.

    Unlike :func:`tfidf_top_terms` (vocab-sized broadcast), the shared-
    gram attach here is FULLY DISTRIBUTED — the gram vocabulary grows
    with the corpus, so nothing gram-shaped ever lands on the driver:
    per-batch (gram, doc_id, c) pre-aggregation -> exchange 1 keyed on
    gram (within each group the distinct-doc count marks rows shared)
    -> exchange 2 keyed on doc_id summing (c, shared*c).  Docs with
    fewer than ``n`` tokens emit no grams and are absent from the
    result, exactly like the SQL.
    """
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        ids = batch["doc_id"].to_numpy()
        g_doc, g_str = [], []
        for did, ts in zip(ids, toks):
            if len(ts) < n:
                continue
            g_doc.extend([did] * (len(ts) - n + 1))
            g_str.extend(" ".join(ts[i:i + n])
                         for i in range(len(ts) - n + 1))
        if not g_str:
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64"),
                                 "__coarse": pd.Series(dtype="int64")})
        df = (pd.DataFrame({"g": g_str, "doc_id": g_doc})
              .groupby(["g", "doc_id"], sort=False).size()
              .rename("c").reset_index())
        df["doc_id"] = df["doc_id"].astype("int64")
        df["c"] = df["c"].astype("int64")
        kh = hash_columns(pa.table({"g": pa.array(df["g"], pa.string())}))
        df["__coarse"] = (kh & np.uint64(1023)).astype("int64")
        return df

    def mark_shared(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("g", sort=False)["doc_id"].transform("size")
        out = pd.DataFrame({
            "doc_id": g["doc_id"],
            "n_grams": g["c"],
            "n_dup_grams": g["c"].where(nd > 1, 0).astype("int64"),
        })
        return out

    marked = (docs_ds.map_batches(gram_rows, batch_format="pandas")
              .groupby("__coarse", num_partitions=shuffle_partitions())
              .map_groups(mark_shared, batch_format="pandas"))
    return grouped_aggregate(
        marked, ["doc_id"],
        [("n_grams", "sum", "n_grams"),
         ("n_dup_grams", "sum", "n_dup_grams")])


def dup_ngram_fraction_sql(n: int = 5) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws
  FROM documents
),
grams AS (
  SELECT doc_id,
         list_aggregate(list_slice(ws, i, i + {n - 1}), 'string_agg', ' ')
           AS g
  FROM toks, unnest(range(1, len(ws) - {n - 2})) AS t(i)
),
gd AS (SELECT g, doc_id, count(*) AS c FROM grams GROUP BY g, doc_id),
nd AS (SELECT g, count(*) AS nd FROM gd GROUP BY g)
SELECT gd.doc_id,
       CAST(sum(gd.c) AS BIGINT) AS n_grams,
       CAST(sum(CASE WHEN nd.nd > 1 THEN gd.c ELSE 0 END) AS BIGINT)
         AS n_dup_grams
FROM gd JOIN nd USING (g)
GROUP BY gd.doc_id"""


def cross_source_overlap(docs_ds, n: int = 5):
    """Cross-source contamination matrix: for every source pair
    (a < b), the number of DISTINCT word-``n``-grams that appear in
    both sources — the corpus-level companion to
    :func:`dup_ngram_fraction` (that one marks documents; this one
    tells you WHICH feeds overlap, the first question when a held-out
    source turns out to be contaminated).

    Fully distributed like ``dup_ngram_fraction``: per-batch distinct
    (gram, source) pre-aggregation -> one gram-keyed coarse exchange ->
    per-gram pair emission (sources per gram are bounded by the source
    domain, so the per-gram self-join is tiny) -> one source-pair-domain
    aggregate.  Nothing gram-shaped ever lands on the driver.
    """
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        srcs = batch["source"].to_numpy()
        g_src, g_str = [], []
        for src, ts in zip(srcs, toks):
            if len(ts) < n:
                continue
            g_src.extend([src] * (len(ts) - n + 1))
            g_str.extend(" ".join(ts[i:i + n])
                         for i in range(len(ts) - n + 1))
        if not g_str:
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "source": pd.Series(dtype="object"),
                                 "__coarse": pd.Series(dtype="int64")})
        df = (pd.DataFrame({"g": g_str, "source": g_src})
              .drop_duplicates(ignore_index=True))
        kh = hash_columns(pa.table({"g": pa.array(df["g"], pa.string())}))
        df["__coarse"] = (kh & np.uint64(1023)).astype("int64")
        return df

    def pair_rows(g: pd.DataFrame) -> pd.DataFrame:
        # partials from different batches may repeat a (gram, source)
        d = g[["g", "source"]].drop_duplicates(ignore_index=True)
        m = d.merge(d, on="g")
        m = m[m["source_x"] < m["source_y"]]
        out = (m.groupby(["source_x", "source_y"], sort=False)
               .size().rename("n_shared_grams").reset_index())
        out.columns = ["source_a", "source_b", "n_shared_grams"]
        out["n_shared_grams"] = out["n_shared_grams"].astype("int64")
        return out

    pairs = (docs_ds.map_batches(gram_rows, batch_format="pandas")
             .groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(pair_rows, batch_format="pandas"))
    return grouped_aggregate(
        pairs, ["source_a", "source_b"],
        [("n_shared_grams", "sum", "n_shared_grams")])


def cross_source_overlap_sql(n: int = 5) -> str:
    return rf"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(text), '\w+') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT source,
         list_aggregate(list_slice(ws, i, i + {n - 1}), 'string_agg', ' ')
           AS g
  FROM toks, unnest(range(1, len(ws) - {n - 2})) AS t(i)
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_shared_grams
FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
GROUP BY source_a, source_b"""


_GRAM_POW_CACHE: dict = {}


def _gram_pows(L: int):
    """Power vectors for the two independent 64-bit polynomial hashes
    (splitmix / xxhash odd constants); cached per L."""
    if L not in _GRAM_POW_CACHE:
        p1, p2 = np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F)
        pw1 = np.empty(L, np.uint64)
        pw2 = np.empty(L, np.uint64)
        a = b = np.uint64(1)
        for j in range(L - 1, -1, -1):
            pw1[j] = a
            pw2[j] = b
            a = a * p1
            b = b * p2
        _GRAM_POW_CACHE[L] = (pw1, pw2)
    return _GRAM_POW_CACHE[L]


def _gram_fingerprints(tx: str, L: int):
    """128-bit fingerprint of every length-``L`` CHARACTER window of
    ``tx``: two independent degree-(L-1) polynomial hashes over the
    codepoint sequence, each mod 2^64 (numpy uint64 wraparound is the
    modulus).  Vectorized: utf-32 decode -> sliding window view -> one
    (m, L) x (L,) wraparound dot per hash.  Pair-collision probability
    ~2^-128 per gram pair (~2^-64 union bound over corpus-scale gram
    counts) — the 100 TB wire format for the ExactSubstr exchange:
    16 bytes per occurrence regardless of L, vs L utf-8 bytes."""
    cp = np.frombuffer(tx.encode("utf-32-le"), dtype=np.uint32)
    m = len(cp) - L + 1
    if m <= 0:
        return None
    pw1, pw2 = _gram_pows(L)
    w = np.lib.stride_tricks.sliding_window_view(cp, L).astype(np.uint64)
    h1 = (w * pw1).sum(axis=1, dtype=np.uint64)
    h2 = (w * pw2).sum(axis=1, dtype=np.uint64)
    return h1, h2


def _dup_doc_starts(docs_ds, L: int, wire: str):
    """Shared front half of the ExactSubstr family: stream of
    (doc_id, n, starts) rows for every (gram, doc) whose gram occurs
    >= 2 times corpus-wide.  ``wire`` picks the exchange payload:

    - ``"fingerprint"`` (default at scale): the 128-bit gram
      fingerprint (two int64 columns) rides the gram-keyed exchange —
      constant 16 bytes per gram occurrence, the 100 TB wire format.
    - ``"gram"``: the raw L-char gram string (the oracle twin; exact
      by construction, L utf-8 bytes per occurrence on the wire).

    Both plans are pinned row-identical in tests; the fingerprint
    plan's error bound is ~2^-64 over corpus-scale gram counts.
    """
    from ..util import shuffle_partitions
    from .dedup import coarse_mix
    from .exact_agg import hash_columns

    if wire == "fingerprint":
        def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy()
            dl, sl, h1l, h2l = [], [], [], []
            for did, tx in zip(ids, batch["text"]):
                fp = _gram_fingerprints(tx, L)
                if fp is None:
                    continue
                h1, h2 = fp
                m = len(h1)
                dl.append(np.full(m, did, np.int64))
                sl.append(np.arange(m, dtype=np.int64))
                h1l.append(h1)
                h2l.append(h2)
            if not dl:
                return pd.DataFrame(
                    {"g1": pd.Series(dtype="int64"),
                     "g2": pd.Series(dtype="int64"),
                     "doc_id": pd.Series(dtype="int64"),
                     "n": pd.Series(dtype="int64"),
                     "starts": pd.Series(dtype="object"),
                     "__coarse": pd.Series(dtype="int64")})
            df = pd.DataFrame(
                {"g1": np.concatenate(h1l).view(np.int64),
                 "g2": np.concatenate(h2l).view(np.int64),
                 "doc_id": np.concatenate(dl),
                 "start": np.concatenate(sl)})
            gb = df.groupby(["g1", "g2", "doc_id"], sort=False)
            out = gb.agg(n=("start", "size")).reset_index()
            out["n"] = out["n"].astype("int64")
            out["starts"] = gb["start"].agg(
                lambda v: ",".join(map(str, v))).to_numpy()
            out["__coarse"] = coarse_mix(out["g1"].to_numpy(), 1023)
            return out

        def mark_dup(g: pd.DataFrame) -> pd.DataFrame:
            tot = g.groupby(["g1", "g2"], sort=False)["n"].transform("sum")
            d = g[tot >= 2]
            return pd.DataFrame({"doc_id": d["doc_id"],
                                 "n": d["n"],
                                 "starts": d["starts"]})
    else:
        def gram_rows(batch: pd.DataFrame) -> pd.DataFrame:
            ids = batch["doc_id"].to_numpy()
            g_doc, g_str, g_start = [], [], []
            for did, tx in zip(ids, batch["text"]):
                m = len(tx) - L + 1
                if m <= 0:
                    continue
                g_doc.extend([did] * m)
                g_start.extend(range(m))
                g_str.extend(tx[i:i + L] for i in range(m))
            if not g_str:
                return pd.DataFrame(
                    {"g": pd.Series(dtype="object"),
                     "doc_id": pd.Series(dtype="int64"),
                     "n": pd.Series(dtype="int64"),
                     "starts": pd.Series(dtype="object"),
                     "__coarse": pd.Series(dtype="int64")})
            df = pd.DataFrame({"g": g_str, "doc_id": g_doc,
                               "start": g_start})
            gb = df.groupby(["g", "doc_id"], sort=False)
            out = gb.agg(n=("start", "size")).reset_index()
            out["n"] = out["n"].astype("int64")
            out["doc_id"] = out["doc_id"].astype("int64")
            out["starts"] = gb["start"].agg(
                lambda v: ",".join(map(str, v))).to_numpy()
            kh = hash_columns(
                pa.table({"g": pa.array(out["g"], pa.string())}))
            out["__coarse"] = (kh & np.uint64(1023)).astype("int64")
            return out

        def mark_dup(g: pd.DataFrame) -> pd.DataFrame:
            tot = g.groupby("g", sort=False)["n"].transform("sum")
            d = g[tot >= 2]
            return pd.DataFrame({"doc_id": d["doc_id"],
                                 "n": d["n"],
                                 "starts": d["starts"]})

    return (docs_ds.map_batches(gram_rows, batch_format="pandas")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(mark_dup, batch_format="pandas"))


def dup_substring_coverage(docs_ds, L: int = 20,
                           wire: str = "fingerprint"):
    """ExactSubstr-style duplicated-substring accounting (the
    character-level companion to :func:`dup_ngram_fraction`, after
    Lee et al. 2022 "Deduplicating Training Data Makes Language Models
    Better"): per document, how many length-``L`` substring START
    positions carry a substring that occurs >= 2 times corpus-wide
    (any doc, any position), and how many CHARACTERS are covered by
    the union of those [start, start+L) intervals — the quantity
    :func:`dup_substring_cut` removes.  Docs with no duplicated
    substring are absent, exactly like the SQL.

    Shape: per-batch (gram, doc) pre-aggregation with packed start
    lists -> one gram-keyed coarse exchange (global occurrence count
    decides duplication; survivors re-key by doc) -> one doc-keyed
    exchange doing the vectorized interval-union.  The DEFAULT wire
    payload is the 128-bit gram fingerprint (16 bytes/occurrence,
    collision bound ~2^-64 corpus-wide — see
    :func:`_gram_fingerprints`); ``wire="gram"`` ships the raw gram
    strings (the oracle twin, pinned row-identical in tests).
    """
    from ..util import shuffle_partitions

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        ids, n_starts, n_cov = [], [], []
        for did, grp in g.groupby("doc_id", sort=False):
            starts = np.sort(np.fromiter(
                (int(x) for s in grp["starts"] for x in s.split(",")),
                dtype=np.int64))
            gaps = np.diff(starts)
            covered = int(np.minimum(gaps, L).sum()) + L
            ids.append(did)
            n_starts.append(len(starts))
            n_cov.append(covered)
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64"),
                             "n_dup_starts": pd.array(n_starts, "int64"),
                             "n_covered_chars": pd.array(n_cov, "int64")})

    dup = _dup_doc_starts(docs_ds, L, wire)

    def add_doc_coarse(t: pa.Table) -> pa.Table:
        from .dedup import coarse_mix

        ids = t.column("doc_id").to_numpy()
        return t.append_column(
            "__c2", pa.array(coarse_mix(ids, 1023), pa.int64()))

    return (dup.map_batches(add_doc_coarse, batch_format="pyarrow")
            .groupby("__c2", num_partitions=shuffle_partitions())
            .map_groups(lambda g: cover(g.drop(columns="__c2")),
                        batch_format="pandas"))


def dup_substring_coverage_sql(L: int = 20) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, i AS start, substr(text, i, {L}) AS gram
  FROM documents, unnest(range(1, length(text) - {L} + 2)) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT g.doc_id, g.start FROM g JOIN dup USING (gram)),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM d, unnest(range(start, start + {L})) AS u(p)
)
SELECT d.doc_id,
       CAST(count(*) AS BIGINT) AS n_dup_starts,
       CAST(any_value(c.n_cov) AS BIGINT) AS n_covered_chars
FROM d JOIN (SELECT doc_id, count(*) AS n_cov FROM cov GROUP BY doc_id) c
  USING (doc_id)
GROUP BY d.doc_id"""


def dup_substring_cut(docs_ds, L: int = 20, wire: str = "fingerprint"):
    """ExactSubstr CUT — the removal step of Lee et al. 2022 that
    :func:`dup_substring_coverage` only measures: rewrite every
    document with the duplicated-substring interval union REMOVED and
    certify the rewrite with exact integer accounting — ``n_before`` /
    ``n_removed`` / ``n_after`` plus a codepoint-sum checksum of the
    KEPT characters (the rewrite itself, order-free).  Conservation:
    ``n_removed`` equals coverage's ``n_covered_chars`` for every doc
    with duplicates (pinned in tests).  EVERY document appears — docs
    with no duplicated substring keep all chars — mirroring the
    oracle's LEFT-JOIN spine.

    Shape: the shared dup-start stream (:func:`_dup_doc_starts`,
    fingerprint wire by default) and the text co-locate through ONE
    doc-keyed coarse exchange (schema-aligned union of the two sides);
    a per-group boundary-delta cumsum builds the covered mask
    vectorized, and the kept-codepoint sum is read straight off the
    masked utf-32 array.  Text moves through exactly one exchange, as
    any rewrite must; the start lists are interval-compressed domain
    data, never gram-shaped.
    """
    from ..util import shuffle_partitions
    from .dedup import coarse_mix

    dup = _dup_doc_starts(docs_ds, L, wire)

    def dup_side(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return pa.table({
            "doc_id": ids,
            "starts": pc.cast(t.column("starts"), pa.string()),
            "text": pa.nulls(t.num_rows, pa.string()),
            "__c2": pa.array(coarse_mix(ids.to_numpy(), 1023),
                             pa.int64())})

    def text_side(t: pa.Table) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        return pa.table({
            "doc_id": ids,
            "starts": pa.nulls(t.num_rows, pa.string()),
            "text": pc.cast(t.column("text"), pa.string()),
            "__c2": pa.array(coarse_mix(ids.to_numpy(), 1023),
                             pa.int64())})

    both = (dup.map_batches(dup_side, batch_format="pyarrow")
            .union(docs_ds.map_batches(text_side,
                                       batch_format="pyarrow")))

    def rewrite(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"doc_id": pd.Series(dtype="int64"),
                "n_before": pd.Series(dtype="int64"),
                "n_removed": pd.Series(dtype="int64"),
                "n_after": pd.Series(dtype="int64"),
                "kept_checksum": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        txt = g[g["text"].notna()]
        st = g[g["text"].isna()]
        starts_by_doc = {
            int(did): ",".join(grp["starts"])
            for did, grp in st.groupby("doc_id", sort=False)}
        ids, nb, nr, na, ck = [], [], [], [], []
        for did, tx in zip(txt["doc_id"], txt["text"]):
            n = len(tx)
            cp = np.frombuffer(tx.encode("utf-32-le"), dtype=np.uint32)
            s = starts_by_doc.get(int(did))
            if s is None:
                removed = 0
                kept_sum = int(cp.astype(np.int64).sum()) if n else 0
            else:
                starts = np.fromiter((int(x) for x in s.split(",")),
                                     dtype=np.int64)
                delta = np.zeros(n + 1, np.int64)
                np.add.at(delta, starts, 1)
                np.add.at(delta, np.minimum(starts + L, n), -1)
                covered = np.cumsum(delta[:n]) > 0
                removed = int(covered.sum())
                kept_sum = int(cp[~covered].astype(np.int64).sum())
            ids.append(int(did))
            nb.append(n)
            nr.append(removed)
            na.append(n - removed)
            ck.append(kept_sum)
        return pd.DataFrame({
            "doc_id": pd.array(ids, dtype="int64"),
            "n_before": pd.array(nb, dtype="int64"),
            "n_removed": pd.array(nr, dtype="int64"),
            "n_after": pd.array(na, dtype="int64"),
            "kept_checksum": pd.array(ck, dtype="int64")})

    return (both.groupby("__c2", num_partitions=shuffle_partitions())
            .map_groups(lambda g: rewrite(g.drop(columns="__c2")),
                        batch_format="pandas"))


def dup_substring_cut_sql(L: int = 20) -> str:
    return f"""
WITH g AS (
  SELECT doc_id, i AS start, substr(text, i, {L}) AS gram
  FROM documents, unnest(range(1, length(text) - {L} + 2)) AS t(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT g.doc_id, g.start FROM g JOIN dup USING (gram)),
cov AS (
  SELECT DISTINCT doc_id, p
  FROM d, unnest(range(start, start + {L})) AS u(p)
),
chars AS (
  SELECT doc_id, i AS p, unicode(substr(text, i, 1)) AS cp
  FROM documents, unnest(range(1, length(text) + 1)) AS t(i)
),
kept AS (
  SELECT c.doc_id,
         CAST(count(*) FILTER (WHERE v.p IS NULL) AS BIGINT) AS n_after,
         CAST(coalesce(sum(c.cp) FILTER (WHERE v.p IS NULL), 0)
              AS BIGINT) AS kept_checksum
  FROM chars c LEFT JOIN cov v ON v.doc_id = c.doc_id AND v.p = c.p
  GROUP BY c.doc_id)
SELECT dd.doc_id,
       CAST(length(dd.text) AS BIGINT) AS n_before,
       CAST(length(dd.text) - coalesce(k.n_after, 0) AS BIGINT)
         AS n_removed,
       CAST(coalesce(k.n_after, 0) AS BIGINT) AS n_after,
       CAST(coalesce(k.kept_checksum, 0) AS BIGINT) AS kept_checksum
FROM documents dd LEFT JOIN kept k USING (doc_id)"""


def tfidf_top_terms_distributed(docs_ds, k: int = 3):
    """:func:`tfidf_top_terms` without the vocabulary-sized broadcast —
    the path to take past its ``max_vocab`` bound.  Same output, same
    ordering, pinned row-identical in tests.

    Two exchanges, nothing vocabulary-shaped on the driver: exchange 1
    keyed on term attaches df — each doc lives in exactly one batch, so
    the per-batch (term, doc_id, tf) rows are globally unique and the
    per-term row count IS the document frequency; exchange 2 keyed on
    doc_id re-unites each document's terms for the local top-k.
    """
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    def tf_rows(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "doc_id": pd.Series(dtype="int64"),
                                 "tf": pd.Series(dtype="int64"),
                                 "__coarse": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
        g = (pd.DataFrame({"term": flat, "doc_id": doc_rep})
             .groupby(["term", "doc_id"], sort=False).size()
             .rename("tf").reset_index())
        g["doc_id"] = g["doc_id"].astype("int64")
        g["tf"] = g["tf"].astype("int64")
        kh = hash_columns(pa.table({"term": pa.array(g["term"],
                                                     pa.string())}))
        g["__coarse"] = (kh & np.uint64(1023)).astype("int64")
        return g

    def attach_df(g: pd.DataFrame) -> pd.DataFrame:
        # each doc lives in exactly one batch, so (term, doc_id) rows
        # are unique here and rows-per-term IS the document frequency
        df_count = g.groupby("term", sort=False)["doc_id"].transform("size")
        return pd.DataFrame({"doc_id": g["doc_id"], "term": g["term"],
                             "tf": g["tf"],
                             "df": df_count.astype("int64")})

    def doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        # one COARSE doc bucket per call (many docs): vectorized sort +
        # per-doc head inside — never one Ray group per document
        # (CLAUDE.md high-cardinality rule)
        g = g.sort_values(["doc_id", "tf", "df", "term"],
                          ascending=[True, False, True, True],
                          kind="mergesort")
        out = g.groupby("doc_id", sort=False).head(k).copy()
        out["rnk"] = (out.groupby("doc_id", sort=False).cumcount() + 1
                      ).astype("int64")
        return out[["doc_id", "term", "tf", "df", "rnk"]]

    def add_doc_coarse(df: pd.DataFrame) -> pd.DataFrame:
        from ..stages.dedup import coarse_mix

        df = df[["doc_id", "term", "tf", "df"]].copy()
        df["__dc"] = coarse_mix(df["doc_id"].to_numpy(), 1023)
        return df

    nsp = shuffle_partitions()
    return (docs_ds.map_batches(tf_rows, batch_format="pandas")
            .groupby("__coarse", num_partitions=nsp)
            .map_groups(attach_df, batch_format="pandas")
            .map_batches(add_doc_coarse, batch_format="pandas")
            .groupby("__dc", num_partitions=nsp)
            .map_groups(doc_topk, batch_format="pandas"))


#: GPT-2-style pre-tokenizer split, restricted to RE2 (no lookahead —
#: the original's trailing-space lookahead branch is dropped), so the
#: Arrow kernel and the DuckDB oracle count identically
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def token_counts_bpe(docs_ds):
    """(doc_id, n_bpe_pretokens, n_word_tokens): GPT-2-style
    pre-tokenizer segment count (contractions split, leading-space
    fusion, digit/punct runs — the count a BPE tokenizer's merge stage
    starts from, and the standard cheap proxy for 'model tokens' in
    curation budgets) alongside the plain \\w+ count.  One vectorized
    RE2 pass per column, zero shuffle."""
    def f(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_bpe_pretokens": pc.cast(
                pc.count_substring_regex(text, BPE_RE), pa.int64()),
            "n_word_tokens": pc.cast(
                pc.count_substring_regex(text, WORD_RE), pa.int64()),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def token_counts_bpe_sql() -> str:
    pat = BPE_RE.replace("'", "''")  # SQL string-literal quote escape
    return rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)
         AS n_bpe_pretokens,
       CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT)
         AS n_word_tokens
FROM documents"""


def lang_top_terms(docs_ds, k: int = 10):
    """Per-LANGUAGE top-k vocabulary: the grouped counterpart of
    :func:`vocab_top_terms` (per-language frequency reports are how
    multilingual curation checks each slice's health).  Ordering is
    integer-exact: (tf DESC, term ASC) within each language.

    Shape: per-batch (lang, term) count partials -> one coarse-hash
    exchange (:func:`~.exact_agg.grouped_aggregate`) -> per-BLOCK local
    top-k per lang (a candidate must be in its block's language top-k
    to be global: each (lang, term) lives in exactly one block after
    the exchange) -> final langs x k selection in one tiny
    lang-keyed reduce.  The full vocabulary never gathers anywhere.
    """
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"lang": pd.Series(dtype="object"),
                                 "term": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        lang_rep = np.repeat(batch["lang"].to_numpy(dtype=object), lens)
        g = (pd.DataFrame({"lang": lang_rep, "term": flat})
             .groupby(["lang", "term"], sort=False).size()
             .rename("tf").reset_index())
        g["tf"] = g["tf"].astype("int64")
        return g

    counts = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["lang", "term"], [("tf", "sum", "tf")])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "tf", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.groupby("lang", sort=False).head(k)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "tf", "term"],
                            ascending=[True, False, True],
                            kind="mergesort")
        out = df.groupby("lang", sort=False).head(k).copy()
        out["rnk"] = (out.groupby("lang", sort=False).cumcount() + 1
                      ).astype("int64")
        return out

    return (counts.map_batches(local_topk, batch_format="pandas")
            .groupby("lang", num_partitions=min(8, shuffle_partitions()))
            .map_groups(final_topk, batch_format="pandas"))


def lang_top_terms_sql(k: int = 10) -> str:
    return rf"""
WITH toks AS (
  SELECT lang, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents
),
counts AS (
  SELECT lang, term, CAST(count(*) AS BIGINT) AS tf
  FROM toks GROUP BY lang, term
),
ranked AS (
  SELECT lang, term, tf,
         CAST(row_number() OVER (PARTITION BY lang
              ORDER BY tf DESC, term ASC) AS BIGINT) AS rnk
  FROM counts
)
SELECT lang, term, tf, rnk FROM ranked WHERE rnk <= {k}"""


# --- C4-style blocklist filter ----------------------------------------

BLOCKLIST_TERMS = ("dup", "spam", "lorem")


def blocklist_filter(docs_ds, terms: tuple[str, ...] = BLOCKLIST_TERMS):
    """C4-style blocklist filtering: count whole-word blocklist hits per
    doc and mark survivors (C4 drops any doc with >= 1 hit; the counts
    are the audit trail).  One RE2 alternation with ``\\b`` anchors —
    under the ASCII ``\\w`` class both Arrow and DuckDB draw identical
    word boundaries.  Pure per-row scan, zero shuffle."""
    pat = r"\b(" + "|".join(terms) + r")\b"

    def f(batch: pa.Table) -> pa.Table:
        low = pc.utf8_lower(batch.column("text"))
        n = pc.cast(pc.count_substring_regex(low, pat), pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_blocked": n,
            "kept": pc.equal(n, 0),
        })

    return docs_ds.map_batches(f, batch_format="pyarrow")


def blocklist_filter_sql(terms: tuple[str, ...] = BLOCKLIST_TERMS) -> str:
    pat = r"\b(" + "|".join(terms) + r")\b"
    return rf"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{pat}')) AS BIGINT)
         AS n_blocked,
       len(regexp_extract_all(lower(text), '{pat}')) = 0 AS kept
FROM documents"""


# --- Lexical diversity (type/token/collision counts) ------------------


def lexical_diversity(docs_ds):
    """Per-doc lexical-diversity counts, all exact integers: total token
    occurrences, distinct types, and the collision sum ``sum(c_i^2)``
    (the Simpson-index numerator — the ratio stays downstream where fp
    is allowed).  Docs whose text has no tokens drop, like the SQL
    GROUP BY over an empty extract.  Per-row computation only: a doc
    never spans batches, so there is no shuffle."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        ex = pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy().repeat(toks.str.len()),
            "g": np.concatenate([np.asarray(t, object) for t in toks])
                 if len(batch) else np.array([], object),
        })
        if ex.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "n_types": pd.Series(dtype="int64"),
                                 "sum_c2": pd.Series(dtype="int64")})
        tc = (ex.groupby(["doc_id", "g"], sort=False).size()
                .rename("c").reset_index())
        out = tc.groupby("doc_id", sort=False).agg(
            n_tokens=("c", "sum"), n_types=("c", "size"))
        out["sum_c2"] = tc.assign(c2=tc["c"] ** 2).groupby(
            "doc_id", sort=False)["c2"].sum()
        return out.reset_index().astype("int64")

    return docs_ds.map_batches(f, batch_format="pandas")


def lexical_diversity_sql() -> str:
    return r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
tc AS (SELECT doc_id, g, count(*) AS c FROM toks GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_types,
       CAST(SUM(c * c) AS BIGINT) AS sum_c2
FROM tc GROUP BY doc_id"""


# --- Source-pair similarity over hashed unigram signatures ------------


def source_similarity(docs_ds):
    """Corpus-mixture analysis: every source gets a FIXED-width 256-
    bucket hashed-unigram signature (first md5 byte, the
    :func:`~.sampling.dsir_select` feature space); output is the exact
    integer dot product between every source pair plus each side's
    total token count — the inputs to any downstream cosine/overlap
    ratio, kept integral so the oracle hashes bit-for-bit.

    Scale shape: per-batch (source, bucket) partials -> one
    grouped_aggregate over a sources x 256 domain -> a domain-sized
    driver matmul.  Nothing corpus-sized leaves the scan.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate
    from .sampling import _gram_buckets

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        srcs = batch["source"].to_numpy()
        acc: dict[str, np.ndarray] = {}
        for src, ts in zip(srcs, toks):
            if ts:
                vec = acc.get(src)
                if vec is None:
                    vec = acc[src] = np.zeros(256, np.int64)
                np.add.at(vec, _gram_buckets(ts), 1)
        if not acc:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        return pd.DataFrame({
            "source": np.repeat(list(acc), 256),
            "b": np.tile(np.arange(256, dtype=np.int64), len(acc)),
            "c": np.concatenate(list(acc.values())),
        })

    sig = collect_small_arrow(grouped_aggregate(
        docs_ds.map_batches(partials, batch_format="pandas"),
        ["source", "b"], [("c", "sum", "c")]))
    srcs = sorted(set(sig.column("source").to_pylist()))
    mat = np.zeros((len(srcs), 256), np.int64)
    idx = {s: i for i, s in enumerate(srcs)}
    mat[[idx[s] for s in sig.column("source").to_pylist()],
        sig.column("b").to_numpy()] = sig.column("c").to_numpy()
    dots = mat @ mat.T  # int64 exact; bucket counts are corpus-bounded
    tot = mat.sum(axis=1)
    # dot == 0 <=> no shared bucket <=> the pair is absent from the SQL
    # inner join on bucket id — drop it here too
    rows = [(srcs[i], srcs[j], int(dots[i, j]), int(tot[i]), int(tot[j]))
            for i in range(len(srcs)) for j in range(i + 1, len(srcs))
            if dots[i, j] > 0]
    return pa.table({
        "src_a": pa.array([r[0] for r in rows], pa.string()),
        "src_b": pa.array([r[1] for r in rows], pa.string()),
        "dot": pa.array([r[2] for r in rows], pa.int64()),
        "n_a": pa.array([r[3] for r in rows], pa.int64()),
        "n_b": pa.array([r[4] for r in rows], pa.int64()),
    })


def source_similarity_sql() -> str:
    return r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
sb AS (SELECT source, substr(md5(g), 1, 2) AS b, count(*) AS c
       FROM toks GROUP BY 1, 2),
tot AS (SELECT source, SUM(c) AS n FROM sb GROUP BY source)
SELECT a.source AS src_a, b.source AS src_b,
       CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
       CAST(ANY_VALUE(ta.n) AS BIGINT) AS n_a,
       CAST(ANY_VALUE(tb.n) AS BIGINT) AS n_b
FROM sb a
JOIN sb b ON a.b = b.b AND a.source < b.source
JOIN tot ta ON ta.source = a.source
JOIN tot tb ON tb.source = b.source
GROUP BY 1, 2"""


# --- OOV-rate audit against a bounded global vocabulary ---------------


def oov_rate(docs_ds, k: int = 50):
    """Tokenizer-prep OOV audit: build the top-``k`` global vocabulary
    (tf desc, term asc — the :func:`vocab_top_terms` contract) and
    count, per source, how many token OCCURRENCES fall outside it —
    the coverage number that decides whether a fixed vocab/merge table
    is big enough for a new feed.

    Shape: the vocab is ``k``-bounded so it is driver-sized BY
    CONSTRUCTION (the top-k never sees the full vocabulary —
    vocab_top_terms' per-block top-k does the bounding); pass 2 is a
    zero-shuffle scan with the vocab as an inline constant, feeding a
    source-domain :func:`~.exact_agg.grouped_aggregate`."""
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    vocab = frozenset(collect_small_arrow(
        vocab_top_terms(docs_ds, k=k)).column("term").to_pylist())

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "n_tokens": pd.Series(dtype="int64"),
                                 "n_oov": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        src_rep = np.repeat(batch["source"].to_numpy(), lens)
        oov = (~pd.Series(flat, dtype=object).isin(vocab)).to_numpy()
        g = (pd.DataFrame({"source": src_rep, "oov": oov.astype(np.int64)})
             .groupby("source", sort=False)
             .agg(n_tokens=("oov", "size"), n_oov=("oov", "sum"))
             .reset_index())
        g["n_tokens"] = g["n_tokens"].astype("int64")
        g["n_oov"] = g["n_oov"].astype("int64")
        return g

    return grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["source"], [("n_tokens", "sum", "n_tokens"),
                     ("n_oov", "sum", "n_oov")])


def oov_rate_sql(k: int = 50) -> str:
    return rf"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
tf AS (SELECT g, count(*) AS c FROM toks GROUP BY g),
vocab AS (SELECT g FROM tf ORDER BY c DESC, g LIMIT {k})
SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(CASE WHEN g NOT IN (SELECT g FROM vocab)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
FROM toks GROUP BY source"""


# --- Keyword extraction: per-doc argmax term ---------------------------


def doc_top_terms(docs_ds):
    """Keyword extraction, simplest honest form: per document the most
    frequent token with its count (ties: lexicographically smallest
    term — deterministic on both sides).  Purely per-row (a doc never
    spans batches): tokenize, count, argmax inside the batch; zero
    shuffle.  Token-free docs drop, like the SQL."""
    def f(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "term": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        doc_rep = np.repeat(batch["doc_id"].to_numpy(), lens)
        tc = (pd.DataFrame({"doc_id": doc_rep, "term": flat})
              .groupby(["doc_id", "term"], sort=False).size()
              .rename("tf").reset_index())
        # (tf desc, term asc) winner per doc: sort once, take first
        tc = tc.sort_values(["doc_id", "tf", "term"],
                            ascending=[True, False, True])
        out = tc.drop_duplicates("doc_id", keep="first").reset_index(
            drop=True)
        out["doc_id"] = out["doc_id"].astype("int64")
        out["tf"] = out["tf"].astype("int64")
        return out[["doc_id", "term", "tf"]]

    return docs_ds.map_batches(f, batch_format="pandas")


def doc_top_terms_sql() -> str:
    return r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
tc AS (SELECT doc_id, g, count(*) AS c FROM toks GROUP BY 1, 2),
rk AS (SELECT doc_id, g, c,
              row_number() OVER (PARTITION BY doc_id
                                 ORDER BY c DESC, g ASC) AS rn
       FROM tc)
SELECT doc_id, g AS term, CAST(c AS BIGINT) AS tf
FROM rk WHERE rn = 1"""


# --- Hapax-legomena audit per source -----------------------------------


def hapax_per_source(docs_ds):
    """Vocabulary-growth (Heaps'-law) audit: per source, the number of
    DISTINCT terms it contains and how many of those are corpus-wide
    hapax legomena (global frequency exactly 1 — necessarily contained
    in a single source).  The rising-hapax-share signal is the standard
    tell for OCR noise / random-string spam in a new feed.

    Shape: per-batch (term, source, c) pre-aggregation -> ONE
    term-keyed coarse-hash exchange (global counts + flags computed
    per group, nothing term-shaped on the driver) -> a source-domain
    :func:`~.exact_agg.grouped_aggregate`."""
    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"g": pd.Series(dtype="object"),
                                 "source": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64"),
                                 "__coarse": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        src_rep = np.repeat(batch["source"].to_numpy(), lens)
        df = (pd.DataFrame({"g": flat, "source": src_rep})
              .groupby(["g", "source"], sort=False).size()
              .rename("c").reset_index())
        df["c"] = df["c"].astype("int64")
        kh = hash_columns(pa.table({"g": pa.array(df["g"], pa.string())}))
        df["__coarse"] = (kh & np.uint64(1023)).astype("int64")
        return df

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        # re-aggregate cross-batch partials, then global-per-term stats
        tsc = (g.groupby(["g", "source"], sort=False)["c"].sum()
               .reset_index())
        tot = tsc.groupby("g", sort=False)["c"].transform("sum")
        return pd.DataFrame({
            "source": tsc["source"],
            "n_terms": np.ones(len(tsc), np.int64),
            "n_hapax": (tot == 1).to_numpy().astype(np.int64),
        })

    marked = (docs_ds.map_batches(partials, batch_format="pandas")
              .groupby("__coarse", num_partitions=shuffle_partitions())
              .map_groups(mark, batch_format="pandas"))
    return grouped_aggregate(
        marked, ["source"],
        [("n_terms", "sum", "n_terms"), ("n_hapax", "sum", "n_hapax")])


def hapax_per_source_sql() -> str:
    return r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
tsc AS (SELECT g, source, count(*) AS c FROM toks GROUP BY 1, 2),
tg AS (SELECT g, SUM(c) AS tc FROM tsc GROUP BY g)
SELECT tsc.source,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(CASE WHEN tg.tc = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_hapax
FROM tsc JOIN tg USING (g)
GROUP BY tsc.source"""


# --- Keyword search: TF-IDF-weighted top-k retrieval -------------------


def search_topk(docs_ds, query=("spark", "window", "hash"), k: int = 20,
                scale: int = 1_000_000_000):
    """Keyword-query retrieval baseline: score every document against a
    small query term set with integer TF-IDF weights and return the
    top-``k`` — the search primitive (the per-doc analytics cousin is
    :func:`tfidf_top_terms`; this one ranks DOCS for a QUERY).

    Exact-integer contract: per query term, ``w_t = scale // (df_t + 1)``
    (floor division — the rare-term boost without fp logs); doc score =
    sum over query terms of ``tf_dt * w_t``.  Ranking ties break to the
    smaller doc_id.

    Shape: pass 1 computes df for the QUERY TERMS ONLY (a query-sized
    aggregate — per-batch membership counts, never the vocabulary);
    pass 2 is a zero-shuffle scoring scan with the weights inline,
    then a top-k sort over scored docs (docs matching no term drop)."""
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    terms = list(query)

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        sets = toks.map(frozenset)
        return pd.DataFrame({
            "term": pd.Series(terms, dtype="object"),
            "df": pd.Series([int(sets.map(lambda s: t in s).sum())
                             for t in terms], dtype="int64")})

    dfs = collect_small_arrow(grouped_aggregate(
        docs_ds.map_batches(df_partial, batch_format="pandas"),
        ["term"], [("df", "sum", "df")])).to_pandas()
    w = {t: int(scale) // (int(d) + 1)
         for t, d in zip(dfs["term"], dfs["df"])}

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        ids = batch["doc_id"].to_numpy()
        out_ids, out_scores = [], []
        for did, ts in zip(ids, toks):
            s = 0
            for t in terms:
                tf = ts.count(t)
                if tf:
                    s += tf * w[t]
            if s:
                out_ids.append(int(did))
                out_scores.append(s)
        return pd.DataFrame({"doc_id": pd.Series(out_ids, dtype="int64"),
                             "score": pd.Series(out_scores,
                                                dtype="int64")})

    return (docs_ds.map_batches(score, batch_format="pandas")
            .sort(["score", "doc_id"], descending=[True, False])
            .limit(k))


def search_topk_sql(query=("spark", "window", "hash"), k: int = 20,
                    scale: int = 1_000_000_000) -> str:
    qlist = ", ".join(f"'{t}'" for t in query)
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS g
  FROM documents),
qt AS (SELECT doc_id, g, count(*) AS tf FROM toks
       WHERE g IN ({qlist}) GROUP BY 1, 2),
dfs AS (SELECT g, count(DISTINCT doc_id) AS df FROM toks
        WHERE g IN ({qlist}) GROUP BY g),
scored AS (
  SELECT qt.doc_id, SUM(qt.tf * ({scale} // (dfs.df + 1))) AS score
  FROM qt JOIN dfs USING (g) GROUP BY qt.doc_id)
SELECT doc_id, CAST(score AS BIGINT) AS score
FROM scored ORDER BY score DESC, doc_id LIMIT {k}"""


def term_drift_topk(docs_ds, k: int = 20):
    """Corpus-drift screen at TERM granularity: split the corpus into
    deterministic halves (doc_id % 2 — stand-in for old/new crawl
    snapshots), count each term per half, and rank terms by the
    exact-integer cross-multiplied rate difference
    |n0*T1 - n1*T0| (T = half totals) — "which terms changed share the
    most", the vocabulary-level companion of the lang KL drift gate.

    Shape: per-batch (term, n0, n1) pandas partials -> one term-keyed
    exchange (materialized once, vocab-domain); half totals fold from
    block partial sums; per-block top-k then a tiny global sort over
    <= partitions*k rows — the full vocabulary never sorts globally.
    Products n*T are int64; at extreme corpus scale the documented
    bound is to rescale T to per-million before the cross multiply.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "n0": pd.Series(dtype="int64"),
                                 "n1": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        half = np.repeat(batch["doc_id"].to_numpy() % 2, lens)
        g = (pd.DataFrame({"term": flat, "n0": (half == 0).astype("int64"),
                           "n1": (half == 1).astype("int64")})
             .groupby("term", sort=False, as_index=False).sum())
        return g

    agg = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["term"], [("n0", "sum", "n0"), ("n1", "sum", "n1")]).materialize()

    tots = collect_small_arrow(agg.map_batches(
        lambda t: pa.table({
            "t0": pa.array([int(pc.sum(t.column("n0")).as_py() or 0)],
                           pa.int64()),
            "t1": pa.array([int(pc.sum(t.column("n1")).as_py() or 0)],
                           pa.int64())}),
        batch_format="pyarrow")).to_pandas().sum()
    t0, t1 = int(tots.t0), int(tots.t1)

    def local_topk(t: pa.Table) -> pa.Table:
        d = t.to_pandas()
        d["drift_num"] = (d["n0"] * t1 - d["n1"] * t0).abs().astype("int64")
        d = d.sort_values(["drift_num", "term"],
                          ascending=[False, True]).head(k)
        return pa.Table.from_pandas(
            d[["term", "n0", "n1", "drift_num"]], preserve_index=False)

    return (agg.map_batches(local_topk, batch_format="pyarrow")
            .sort(["drift_num", "term"], descending=[True, False])
            .limit(k))


def term_drift_topk_sql(k: int = 20) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id % 2 AS half,
         unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents),
c AS (
  SELECT term,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
  FROM toks GROUP BY term),
t AS (SELECT sum(n0) AS t0, sum(n1) AS t1 FROM c)
SELECT term, n0, n1,
       CAST(abs(n0 * t.t1 - n1 * t.t0) AS BIGINT) AS drift_num
FROM c, t ORDER BY drift_num DESC, term LIMIT {k}"""


def source_weighted_jaccard(docs_ds):
    """Weighted (multiset) Jaccard between every source pair over term
    frequencies — sum(min(tf_a, tf_b)) / sum(max(tf_a, tf_b)) as exact
    integer numerator and denominator (the fp ratio stays downstream)
    — the corpus-mixture similarity that, unlike the binary overlap
    ops, weights by how OFTEN terms co-occur.

    The identity sum_max(a,b) = T_a + T_b - sum_min(a,b) (T = source
    total) means only the MIN term needs pair work, and only over
    sources co-occurring on a term: per post-exchange (term)-bucket,
    a sparse per-term source-count pivot feeds one vectorized
    np.minimum over the |sources|^2-bounded pair grid.

    Shape: per-batch (term, source, tf) partials -> one term-keyed
    exchange -> per-bucket pair-min partials + per-source totals ->
    pair-domain finish.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return pd.DataFrame({"term": pd.Series(dtype="object"),
                                 "source": pd.Series(dtype="object"),
                                 "tf": pd.Series(dtype="int64")})
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        src = np.repeat(batch["source"].to_numpy(object), lens)
        g = (pd.DataFrame({"term": flat, "source": src})
             .groupby(["term", "source"], sort=False)
             .size().rename("tf").reset_index())
        g["tf"] = g["tf"].astype("int64")
        return g

    agg = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pandas"),
        ["term", "source"], [("tf", "sum", "tf")]).materialize()

    totals = collect_small_arrow(grouped_aggregate(
        agg, ["source"], [("tf", "sum", "t")])).to_pandas() \
        .set_index("source")["t"].to_dict()

    def pair_mins(df: pd.DataFrame) -> pd.DataFrame:
        cols = {"source_a": pd.Series(dtype="object"),
                "source_b": pd.Series(dtype="object"),
                "sum_min": pd.Series(dtype="int64")}
        if df.empty:
            return pd.DataFrame(cols)
        piv = df.pivot_table(index="term", columns="source",
                             values="tf", aggfunc="sum", fill_value=0)
        srcs = list(piv.columns)
        m = piv.to_numpy(np.int64)
        rows = []
        for i in range(len(srcs)):
            for j in range(i + 1, len(srcs)):
                rows.append((srcs[i], srcs[j],
                             int(np.minimum(m[:, i], m[:, j]).sum())))
        return pd.DataFrame(rows, columns=["source_a", "source_b",
                                           "sum_min"]).astype(
            {"sum_min": "int64"})

    # the (term, source) exchange does NOT co-locate a term's sources;
    # re-key by TERM alone so every pivot row is complete
    from ..util import shuffle_partitions
    from .exact_agg import _hash_string_array

    def add_term_coarse(t: pa.Table) -> pa.Table:
        col = t.column("term")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        kh = _hash_string_array(col)
        return t.append_column(
            "__tc", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    mins = grouped_aggregate(
        (agg.map_batches(add_term_coarse, batch_format="pyarrow")
         .groupby("__tc", num_partitions=shuffle_partitions())
         .map_groups(pair_mins, batch_format="pandas")),
        ["source_a", "source_b"], [("sum_min", "sum", "sum_min")])
    out = collect_small_arrow(mins).to_pandas()
    # the exchange only emits pairs co-occurring in >=1 term bucket;
    # the oracle's pair spine is ALL ordered source pairs (LEFT JOIN,
    # sum_min=0) — synthesize missing pairs from the totals domain
    srcs_sorted = sorted(totals)
    seen = set(zip(out["source_a"], out["source_b"]))
    missing = [(a, b) for i, a in enumerate(srcs_sorted)
               for b in srcs_sorted[i + 1:] if (a, b) not in seen]
    if missing:
        out = pd.concat(
            [out, pd.DataFrame(missing, columns=["source_a", "source_b"])
             .assign(sum_min=np.int64(0))], ignore_index=True)
    out["sum_max"] = [int(totals[a]) + int(totals[b]) - int(sm)
                      for a, b, sm in zip(out["source_a"],
                                          out["source_b"],
                                          out["sum_min"])]
    out["sum_min"] = out["sum_min"].astype("int64")
    out["sum_max"] = out["sum_max"].astype("int64")
    return out.sort_values(["source_a", "source_b"]).reset_index(
        drop=True)


def source_weighted_jaccard_sql() -> str:
    return r"""
WITH toks AS (
  SELECT source, unnest(regexp_extract_all(lower(text), '\w+')) AS term
  FROM documents),
c AS (SELECT source, term, CAST(count(*) AS BIGINT) AS tf
      FROM toks GROUP BY source, term),
t AS (SELECT source, CAST(sum(tf) AS BIGINT) AS tot FROM c
      GROUP BY source),
m AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(sum(least(a.tf, b.tf)) AS BIGINT) AS sum_min
  FROM c a JOIN c b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT p.source_a, p.source_b, coalesce(m.sum_min, 0) AS sum_min,
       CAST(ta.tot + tb.tot - coalesce(m.sum_min, 0) AS BIGINT)
         AS sum_max
FROM (SELECT x.source AS source_a, y.source AS source_b
      FROM t x JOIN t y ON x.source < y.source) p
LEFT JOIN m ON m.source_a = p.source_a AND m.source_b = p.source_b
JOIN t ta ON ta.source = p.source_a
JOIN t tb ON tb.source = p.source_b"""


# ---------------------------------------------------------------------------
# adjacent-bigram collocation statistics (PMI-ready integer table)
# ---------------------------------------------------------------------------

def collocation_stats(docs_ds, min_pair: int = 5):
    """Adjacent-bigram collocation mining (the PMI / log-likelihood
    input table of Church & Hanks 1990): for every token bigram
    occurring >= ``min_pair`` times, its occurrence count plus both
    unigram occurrence counts and the corpus token total — all exact
    int64, so PMI = log(n_pair * n_tokens / (n_t1 * n_t2)) stays a
    consumer-side rational and the repo's no-float-aggregates
    discipline holds.

    Shape: ONE tokenize pass emits per-batch PRE-AGGREGATED partials
    for both grains — unigram counts and within-document adjacent-pair
    counts (pair positions are a vectorized boundary mask over the
    flattened token stream; bigrams never cross documents) — tagged
    into one term-keyed exact aggregate.  The support gate prunes the
    pair table BEFORE the two marginal attaches, each a STRING-keyed
    coarse-hash exchange joining on the exact term per group (the
    unigram table is vocabulary-domain-sized and never collects
    driver-side).  The token total folds from vocabulary-domain-sized
    partial sums.
    """
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    def partials(batch: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"kind": pd.Series(dtype="int64"),
                              "t1": pd.Series(dtype="object"),
                              "t2": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64")})
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        if lens.sum() == 0:
            return empty
        flat = np.concatenate([np.asarray(t, dtype=object) for t in toks])
        uni = pd.DataFrame({"kind": np.int64(0), "t1": flat, "t2": ""}) \
            .groupby(["kind", "t1", "t2"], sort=False).size() \
            .reset_index(name="n")
        # adjacent positions whose successor is in the SAME document:
        # mask off each document's last token via the boundary offsets
        last_idx = lens.cumsum() - 1
        keep = np.ones(len(flat), bool)
        keep[last_idx[lens > 0]] = False
        keep = keep[:-1] if len(keep) else keep
        pr = pd.DataFrame({"kind": np.int64(1),
                           "t1": flat[:-1][keep], "t2": flat[1:][keep]}) \
            .groupby(["kind", "t1", "t2"], sort=False).size() \
            .reset_index(name="n")
        out = pd.concat([uni, pr], ignore_index=True)
        out["n"] = out["n"].astype("int64")
        return out

    agg = grouped_aggregate(
        docs_ds.map_batches(partials, batch_format="pandas"),
        ["kind", "t1", "t2"], [("n", "sum", "n")]).materialize()

    uni = agg.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"),
                                    pa.scalar(0, pa.int64())))
        .select(["t1", "n"]).rename_columns(["term", "n_term"]),
        batch_format="pyarrow")

    tot_t = collect_small_arrow(uni.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(pc.sum(t.column("n_term")).as_py() or 0)], pa.int64())}),
        batch_format="pyarrow"))
    n_tokens = int(sum(tot_t.column("s").to_pylist())) if tot_t.num_rows \
        else 0

    pairs = agg.map_batches(
        lambda t: t.filter(pc.and_(
            pc.equal(t.column("kind"), pa.scalar(1, pa.int64())),
            pc.greater_equal(t.column("n"),
                             pa.scalar(min_pair, pa.int64()))))
        .select(["t1", "t2", "n"]).rename_columns(["t1", "t2", "n_pair"]),
        batch_format="pyarrow")

    def attach_marginal(fact_ds, key_col: str, out_col: str):
        """STRING-keyed marginal attach: the int64-keyed adaptive attach
        can't carry term keys, so fact and the vocab-domain unigram
        table meet through ONE coarse-hash exchange on the hashed term
        (``union_by_name`` aligns the differing schemas) and a
        vectorized pandas merge joins on the EXACT string per group —
        no driver-side vocab at any corpus size."""
        from ..util import shuffle_partitions, union_by_name
        from .exact_agg import hash_columns

        def key_on(col):
            def f(t: pa.Table) -> pa.Table:
                kh = hash_columns(pa.table({"k": t.column(col)}))
                return t.append_column("__coarse", pa.array(
                    (kh & np.uint64(1023)).astype(np.int64), pa.int64()))
            return f

        dim = uni.map_batches(
            lambda t: t.rename_columns([key_col, out_col]),
            batch_format="pyarrow")
        u = union_by_name([
            fact_ds.map_batches(key_on(key_col), batch_format="pyarrow"),
            dim.map_batches(key_on(key_col), batch_format="pyarrow")])

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop(columns="__coarse")
            is_dim = g["n_pair"].isna()
            fact = g[~is_dim].drop(columns=[out_col])
            dimg = g[is_dim][[key_col, out_col]]
            out = fact.merge(dimg, on=key_col, how="inner")
            for c in out.columns:
                if c not in ("t1", "t2"):
                    out[c] = out[c].astype("int64")
            return out

        return (u.groupby("__coarse", num_partitions=shuffle_partitions())
                .map_groups(merge, batch_format="pandas"))

    joined = attach_marginal(attach_marginal(pairs, "t1", "n_t1"),
                             "t2", "n_t2")

    return joined.map_batches(
        lambda t: pa.table({
            "t1": t.column("t1"), "t2": t.column("t2"),
            "n_pair": pc.cast(t.column("n_pair"), pa.int64()),
            "n_t1": pc.cast(t.column("n_t1"), pa.int64()),
            "n_t2": pc.cast(t.column("n_t2"), pa.int64()),
            "n_tokens": pa.array(np.full(t.num_rows, n_tokens, np.int64))}),
        batch_format="pyarrow")


def collocation_stats_sql(min_pair: int = 5) -> str:
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS l
  FROM documents),
flat AS (SELECT unnest(l) AS term FROM toks),
uni AS MATERIALIZED (SELECT term, count(*) AS n FROM flat GROUP BY term),
tot AS (SELECT count(*) AS n_tokens FROM flat),
pr AS (
  SELECT l[CAST(i AS INT)] AS t1, l[CAST(i AS INT) + 1] AS t2,
         count(*) AS n_pair
  FROM toks, unnest(range(1, len(l))) t(i)
  GROUP BY 1, 2 HAVING count(*) >= {int(min_pair)})
SELECT pr.t1, pr.t2, CAST(pr.n_pair AS BIGINT) AS n_pair,
       CAST(a.n AS BIGINT) AS n_t1, CAST(b.n AS BIGINT) AS n_t2,
       CAST((SELECT n_tokens FROM tot) AS BIGINT) AS n_tokens
FROM pr JOIN uni a ON a.term = pr.t1 JOIN uni b ON b.term = pr.t2"""
