"""DuckDB oracle SQL builders for the corpus-based pipelines.

Each function returns ANSI SQL over the driver's pre-registered views
(``documents`` etc.) that independently reconstructs the expected output
of the matching Ray pipeline — the corpus derivation is shared string
arithmetic (:func:`..sources.corpus.corpus_sql_cte`), so verdicts,
violations and even per-row ``sha256(content)`` are exactly comparable.
"""

from __future__ import annotations

from .config import NO_SCHEMA_MSG
from .sources.corpus import BAD_YAML_MSG, ORPHAN_ORG, corpus_sql_cte

_DOCS_CTE = f"""
WITH {corpus_sql_cte()},
base AS (
  SELECT i, t, repo, path, "commit", lang, content,
         sha256(content) AS content_sha256
  FROM corpus
),
docs AS (
  SELECT i, t, repo, path, "commit", lang, content_sha256,
         path AS doc_key, 1 AS doc_index
  FROM base WHERE t <> 3
  UNION ALL
  SELECT i, t, repo, path, "commit", lang, content_sha256,
         path || '-' || CAST(v.d AS VARCHAR) AS doc_key, v.d AS doc_index
  FROM base, (VALUES (1), (2), (3)) AS v(d) WHERE t = 3
)"""

_VALID_EXPR = "(t IN (0, 1) OR (t = 3 AND doc_index <> 2))"
_ERROR_EXPR = f"""CASE
  WHEN t IN (4, 9) OR (t = 3 AND doc_index = 2) THEN '{NO_SCHEMA_MSG}'
  WHEN t = 5 THEN '{BAD_YAML_MSG}'
  ELSE NULL END"""


def verdicts_sql() -> str:
    return f"""{_DOCS_CTE}
SELECT repo, path, "commit", lang, doc_key,
       CAST(doc_index AS INTEGER) AS doc_index,
       {_VALID_EXPR} AS valid,
       {_ERROR_EXPR} AS error,
       CAST(CASE WHEN {_VALID_EXPR} THEN 0 ELSE 1 END AS BIGINT) AS n_violations,
       content_sha256
FROM docs"""


# expected keyword-violation constants per template (engine messages are
# pinned by tests/test_compiler.py against the reference golden phrasing)
_KW = {
    2: ("/properties/sample/properties/boolean-sample",
        "urn:example:10#/properties/sample/properties/boolean-sample",
        "/sample/boolean-sample", "type", "integer found, boolean expected"),
    6: ("/properties/sample/properties/enum-sample",
        "urn:example:10#/properties/sample/properties/enum-sample",
        "/sample/enum-sample", "enum",
        "does not have a value in the enumeration [en1, en2, en3, en4, en5, en6]"),
    7: ("/properties/sample", "urn:example:10#/properties/sample",
        "/sample", "required", "required property 'string-sample' not found"),
    8: ("/properties/sample/properties/integer-sample",
        "urn:example:10#/properties/sample/properties/integer-sample",
        "/sample/integer-sample", "minimum", "must have a minimum value of 10"),
}


def violations_sql() -> str:
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    kw_whens_ep = " ".join(f"WHEN {t} THEN {q(v[0])}" for t, v in _KW.items())
    kw_whens_sp = " ".join(f"WHEN {t} THEN {q(v[1])}" for t, v in _KW.items())
    kw_whens_ip = " ".join(f"WHEN {t} THEN {q(v[2])}" for t, v in _KW.items())
    kw_whens_kw = " ".join(f"WHEN {t} THEN {q(v[3])}" for t, v in _KW.items())
    kw_whens_msg = " ".join(f"WHEN {t} THEN {q(v[4])}" for t, v in _KW.items())
    return f"""{_DOCS_CTE}
SELECT repo, path, "commit", doc_key,
       CASE t {kw_whens_ep} ELSE '' END AS evaluation_path,
       CASE t {kw_whens_sp} ELSE '' END AS schema_path,
       CASE t {kw_whens_ip} ELSE '' END AS instance_path,
       CASE t {kw_whens_kw} ELSE 'error' END AS keyword,
       CASE t {kw_whens_msg} ELSE {_ERROR_EXPR} END AS message
FROM docs
WHERE NOT {_VALID_EXPR}"""


def summary_sql() -> str:
    return f"""{_DOCS_CTE}
SELECT CAST(count(*) AS BIGINT) AS files,
       CAST(sum(CASE WHEN {_VALID_EXPR} THEN 1 ELSE 0 END) AS BIGINT) AS valid,
       CAST(sum(CASE WHEN {_VALID_EXPR} THEN 0 ELSE 1 END) AS BIGINT) AS invalid,
       CAST(sum(CASE WHEN {_VALID_EXPR} THEN 0 ELSE 1 END) AS BIGINT) AS errors
FROM docs"""


def uniqueness_sql() -> str:
    return f"""WITH {corpus_sql_cte()}
SELECT repo, path, "commit", CAST(count(*) AS BIGINT) AS n_rows
FROM corpus
GROUP BY repo, path, "commit"
HAVING count(*) > 1"""


def ref_integrity_sql() -> str:
    """Orphan repos: rows whose repo is missing from the known-repos
    dimension (the dimension = distinct corpus repos minus the injected
    '{ORPHAN_ORG}/*' org, FIXTURES.md §4)."""
    return f"""WITH {corpus_sql_cte()}
SELECT repo, CAST(count(*) AS BIGINT) AS n_orphan_rows
FROM corpus
WHERE repo LIKE '{ORPHAN_ORG}/%'
GROUP BY repo"""


def lang_histogram_sql() -> str:
    return f"""WITH {corpus_sql_cte()}
SELECT lang, CAST(count(*) AS BIGINT) AS n
FROM corpus
GROUP BY lang"""


def column_stats_sql() -> str:
    """Per-column stats over the corpus string columns: count / nulls /
    min / max / exact distinct (the engine's exact path; the HLL sketch
    path is rows-only-checked)."""
    cols = ["repo", "path", "commit", "lang"]
    selects = []
    for c in cols:
        qc = f'"{c}"' if c == "commit" else c
        selects.append(f"""SELECT '{c}' AS column_name,
       CAST(count(*) AS BIGINT) AS row_count,
       CAST(sum(CASE WHEN {qc} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(min({qc}) AS VARCHAR) AS min_value,
       CAST(max({qc}) AS VARCHAR) AS max_value,
       CAST(count(DISTINCT {qc}) AS BIGINT) AS distinct_count
FROM corpus""")
    return f"WITH {corpus_sql_cte()}\n" + "\nUNION ALL\n".join(selects)


def lang_drift_sql() -> str:
    """KL(observed ‖ baseline) on the non-null lang histogram, vs the same
    baseline constants the engine uses (BASELINE_LANG_P)."""
    from .pipelines.constraints import BASELINE_LANG_P

    case = " ".join(f"WHEN '{k}' THEN {v!r}" for k, v in BASELINE_LANG_P.items())
    kl = f"sum((n / t) * ln((n / t) / (CASE lang {case} END)))"
    # sign-aware half-away rounding (matches the engine formula exactly;
    # the partial-support 'KL' can be negative)
    return f"""WITH {corpus_sql_cte()},
h AS (SELECT lang, CAST(count(*) AS DOUBLE) AS n FROM corpus
      WHERE lang IS NOT NULL GROUP BY lang),
tot AS (SELECT sum(n) AS t FROM h),
k AS (SELECT {kl} AS kl_raw FROM h, tot)
SELECT CASE WHEN kl_raw >= 0 THEN floor(kl_raw * 1e6 + 0.5) / 1e6
            ELSE -floor(-kl_raw * 1e6 + 0.5) / 1e6 END AS kl,
       (kl_raw > 0.05) AS drifted
FROM k"""


def repo_stats_salted_sql() -> str:
    return f"""WITH {corpus_sql_cte()}
SELECT repo,
       CAST(sum(length(content)) AS BIGINT) AS total_chars,
       CAST(count(*) AS BIGINT) AS n_rows
FROM corpus GROUP BY repo"""


def content_length_histogram_sql() -> str:
    """Log2-bucketed content length histogram (drift input)."""
    return f"""WITH {corpus_sql_cte()}
SELECT CAST(floor(log2(length(content) + 1)) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n
FROM corpus
GROUP BY 1"""


# ---------------------------------------------------------------------------
# documents-table operators (dedup / text analysis)
# ---------------------------------------------------------------------------

# the 'two overlapping crawls' augmentation used by the dedup queries
# (mirrors __ray_entry__._augment: ids % 100 < 5 duplicated at id+1000000)
_DOCS_AUG = """
docs_aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 100 < 5
)"""

_DOCS_AUG3 = """
docs_aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, source
  FROM documents WHERE doc_id % 100 < 5
)"""

_EMB_AUG = """
emb_aug AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + 1000000 AS vec_id, embedding FROM embeddings WHERE vec_id % 100 < 5
)"""


def exact_dup_groups_sql() -> str:
    return f"""WITH {_DOCS_AUG}
SELECT sha256(text) AS text_sha,
       CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM docs_aug
GROUP BY sha256(text)
HAVING count(*) > 1"""


def dedup_exact_sql() -> str:
    return f"""WITH {_DOCS_AUG}
SELECT sha256(text) AS text_sha, CAST(min(doc_id) AS BIGINT) AS doc_id
FROM docs_aug GROUP BY sha256(text)"""


def token_counts_sql() -> str:
    # RE2 on both sides (pyarrow count_substring_regex <-> DuckDB regexp)
    return r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars
FROM documents"""


def quality_stats_sql() -> str:
    return r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS n_punct,
       CAST(len(regexp_extract_all(text, '[A-Z]')) AS BIGINT) AS n_upper,
       floor(CAST(len(regexp_extract_all(text, '\w')) AS DOUBLE)
             / greatest(len(regexp_extract_all(text, '\w+')), 1) * 1e6 + 0.5)
         / 1e6 AS mean_token_len
FROM documents"""


def fingerprint_md5_sql() -> str:
    return r"""
SELECT doc_id,
       md5(regexp_replace(lower(text), '\s+', ' ', 'g')) AS fingerprint_md5
FROM documents"""


def ann_topk_sql(k: int = 10, n_queries: int = 5) -> str:
    return f"""
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
           FROM embeddings WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id,
         round(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6) AS sim
  FROM embeddings e, q
),
ranked AS (
  SELECT query_id, vec_id, sim,
         CAST(row_number() OVER (PARTITION BY query_id
                                 ORDER BY sim DESC, vec_id) AS BIGINT) AS rank
  FROM scored
)
SELECT query_id, vec_id, sim, rank FROM ranked WHERE rank <= {k}"""


def embedding_dups_sql(threshold: float = 0.99) -> str:
    return f"""WITH {_EMB_AUG}
SELECT a.vec_id AS a, b.vec_id AS b,
       round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 6) AS sim
FROM emb_aug a JOIN emb_aug b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {threshold}"""


def resume_accounting_sql(nparts: int = 8) -> str:
    """Per-partition verdict accounting for the resumable layout: the
    shard id mirrors ``state.lineage._shard_of`` exactly —
    ``uint64(big-endian md5(path)[:8]) % nparts`` is
    ``CAST('0x' || substr(md5(path),1,16) AS UBIGINT) % nparts`` in
    DuckDB.  ``resume_ok`` is the engine-verified kill/resume
    certificate (constant TRUE here)."""
    return f"""{_DOCS_CTE}
SELECT CAST(CAST(('0x' || substr(md5(path), 1, 16)) AS UBIGINT)
            % {nparts} AS BIGINT) AS partition_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(CASE WHEN {_VALID_EXPR} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valid,
       TRUE AS resume_ok
FROM docs
GROUP BY 1"""
