"""Training-data curation pipeline: the composition showcase.

documents (two overlapping crawls) -> exact dedup (keep min doc_id) ->
quality gate (token/char/punct thresholds) -> per-source token accounting.
Every stage is a streaming Dataset transform; the whole pipeline is
SQL-oracle-checked end to end (dedup via sha256 group-min, quality via
RE2 counts — both sides compute identical integers).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.text import PUNCT_RE, WORD_RE

MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.1  # n_punct / n_tokens


def curated_documents(docs_ds):
    """Kept doc_ids + quality metrics after dedup + quality gate.

    Dedup = hash-shuffle on sha256(text), keep min doc_id; the kept-id
    set is tiny relative to text, so the second pass filters by broadcast
    membership instead of joining text back across the cluster.
    """
    import ray

    from ..stages.exact_agg import grouped_aggregate

    def sha_rows(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(t.encode()).hexdigest()
                for t in batch.column("text").to_pylist()]
        return pa.table({"text_sha": pa.array(shas, pa.string()),
                         "doc_id": batch.column("doc_id")})

    kept = grouped_aggregate(
        docs_ds.map_batches(sha_rows, batch_format="pyarrow"),
        ["text_sha"], [("doc_id", "min", "doc_id")])
    kept_ids = frozenset(r["doc_id"] for r in kept.take_all())
    kept_ref = ray.put(kept_ids)

    class QualityGate:
        def __init__(self, ref):
            # Arrow value-set once per actor -> vectorized pc.is_in
            self.kept = pa.array(sorted(ray.get(ref)), pa.int64())

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pc.is_in(batch.column("doc_id"), value_set=self.kept)
            b = batch.filter(mask)
            text = b.column("text")
            n_tokens = pc.cast(pc.count_substring_regex(text, WORD_RE), pa.int64())
            n_punct = pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64())
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            keep = pc.and_(
                pc.greater_equal(n_tokens, MIN_TOKENS),
                pc.less_equal(pc.cast(n_punct, pa.float64()),
                              pc.multiply(pc.cast(n_tokens, pa.float64()),
                                          MAX_PUNCT_RATIO)))
            out = pa.table({
                "doc_id": b.column("doc_id"), "source": b.column("source"),
                "n_tokens": n_tokens, "n_chars": n_chars, "n_punct": n_punct,
            })
            return out.filter(keep)

    from ..util import process_cached, ref_key

    return docs_ds.map_batches(
        process_cached(QualityGate, ref_key(kept_ref), kept_ref),
        batch_format="pyarrow")


def curation_report(docs_ds):
    """Per-source accounting of the curated corpus: docs kept + token
    totals (the 'what goes into the training mix' summary)."""
    from ray.data.aggregate import Sum

    from ..util import shuffle_partitions

    cur = curated_documents(docs_ds)

    def partial(t: pa.Table) -> pa.Table:
        return (t.select(["source", "n_tokens", "n_chars"])
                .group_by(["source"])
                .aggregate([("n_tokens", "sum"), ("n_chars", "sum"),
                            ([], "count_all")])
                .rename_columns(["source", "total_tokens", "total_chars",
                                 "n_docs"]))

    return (cur.map_batches(partial, batch_format="pyarrow")
            .groupby("source", num_partitions=min(4, shuffle_partitions()))
            .aggregate(Sum("total_tokens", alias_name="total_tokens"),
                       Sum("total_chars", alias_name="total_chars"),
                       Sum("n_docs", alias_name="n_docs")))


def curation_report_sql(docs_cte: str) -> str:
    """Oracle: same dedup + gate + accounting in SQL over ``docs_aug``."""
    return f"""WITH {docs_cte},
kept AS (
  SELECT min(doc_id) AS doc_id
  FROM docs_aug GROUP BY sha256(text)
),
gated AS (
  SELECT d.doc_id, d.source,
         CAST(len(regexp_extract_all(d.text, '\\w+')) AS BIGINT) AS n_tokens,
         CAST(length(d.text) AS BIGINT) AS n_chars,
         CAST(len(regexp_extract_all(d.text, '[.,;:!?]')) AS BIGINT) AS n_punct
  FROM docs_aug d JOIN kept k ON k.doc_id = d.doc_id
)
SELECT source,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(*) AS BIGINT) AS n_docs
FROM gated
WHERE n_tokens >= {MIN_TOKENS}
  AND CAST(n_punct AS DOUBLE) <= n_tokens * {MAX_PUNCT_RATIO}
GROUP BY source"""
