"""Training-data curation pipeline: the composition showcase.

documents (two overlapping crawls) -> exact dedup (keep min doc_id) ->
quality gate (token/char/punct thresholds) -> per-source token accounting.
Every stage is a streaming Dataset transform; the whole pipeline is
SQL-oracle-checked end to end (dedup via sha256 group-min, quality via
RE2 counts — both sides compute identical integers).
"""

from __future__ import annotations

import hashlib

import numpy as np

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.text import PUNCT_RE, WORD_RE

MIN_TOKENS = 20
MAX_PUNCT_RATIO = 0.1  # n_punct / n_tokens


def curated_documents(docs_ds):
    """Kept docs + quality metrics after dedup + quality gate — ONE pass
    over text, nothing on the driver.

    Duplicates have IDENTICAL text, hence identical metrics, so the
    quality metrics are computed per row UP FRONT (text is dropped right
    there) and dedup becomes take-first-by-doc_id per sha over the small
    metric rows: per-batch local first -> coarse-hash shuffle (~60 B/row,
    never text) -> per-group vectorized first.  (The previous design
    broadcast the kept-id set, which is O(distinct docs) — NOT small at
    corpus scale.)
    """
    import numpy as np
    import pandas as pd

    from ..util import shuffle_partitions

    def metric_rows(batch: pa.Table) -> pa.Table:
        shas = [hashlib.sha256(t.encode()).hexdigest()
                for t in batch.column("text").to_pylist()]
        text = batch.column("text")
        t = pa.table({
            "text_sha": pa.array(shas, pa.string()),
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "n_tokens": pc.cast(pc.count_substring_regex(text, WORD_RE), pa.int64()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "n_punct": pc.cast(pc.count_substring_regex(text, PUNCT_RE), pa.int64()),
        })
        # local pre-dedup: min doc_id per sha within the batch (metrics
        # ride along — identical across duplicates by construction)
        df = t.to_pandas().sort_values(["text_sha", "doc_id"], kind="stable")
        df = df.drop_duplicates("text_sha", keep="first")
        coarse = (pd.util.hash_array(df["text_sha"].to_numpy(dtype=object))
                  & np.uint64(1023)).astype("int64")
        df["__coarse"] = coarse
        return pa.Table.from_pandas(df, preserve_index=False)

    def first_per_sha(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["text_sha", "doc_id"], kind="stable")
        g = g.drop_duplicates("text_sha", keep="first")
        return g.drop(columns="__coarse")

    kept = (docs_ds.map_batches(metric_rows, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(first_per_sha, batch_format="pandas"))

    def gate(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.greater_equal(t.column("n_tokens"), MIN_TOKENS),
            pc.less_equal(pc.cast(t.column("n_punct"), pa.float64()),
                          pc.multiply(pc.cast(t.column("n_tokens"), pa.float64()),
                                      MAX_PUNCT_RATIO)))
        return t.filter(keep).select(
            ["doc_id", "source", "n_tokens", "n_chars", "n_punct"])

    return kept.map_batches(gate, batch_format="pyarrow")


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


def training_prep(docs_ds, budget: int = 512):
    """The full training-data prep composition: two overlapping crawls
    -> exact dedup (keep min doc_id) -> quality gate -> GPT-style
    sequence packing (distributed prefix sum over the KEPT docs).

    Composes :func:`curated_documents` (one text pass, metric-row dedup
    shuffle) with :func:`~..stages.sampling.pack_from_counts` — after
    the first pass only (doc_id, n_tokens) rows flow.  Output:
    (doc_id, n_tokens, tok_offset, seq_id) per kept doc, oracle-checked
    end to end.
    """
    from ..stages.sampling import pack_from_counts

    cnt = curated_documents(docs_ds).map_batches(
        lambda t: t.select(["doc_id", "n_tokens"]), batch_format="pyarrow")
    return pack_from_counts(cnt, budget=budget)


def training_prep_sql(docs_cte: str, budget: int = 512) -> str:
    """Oracle: dedup + gate + window-function prefix sum in one query."""
    return f"""WITH {docs_cte},
kept AS (
  SELECT min(doc_id) AS doc_id FROM docs_aug GROUP BY sha256(text)
),
gated AS (
  SELECT d.doc_id,
         CAST(len(regexp_extract_all(d.text, '\\w+')) AS BIGINT) AS n_tokens,
         CAST(len(regexp_extract_all(d.text, '[.,;:!?]')) AS BIGINT) AS n_punct
  FROM docs_aug d JOIN kept k ON k.doc_id = d.doc_id
),
f AS (
  SELECT doc_id, n_tokens FROM gated
  WHERE n_tokens >= {MIN_TOKENS}
    AND CAST(n_punct AS DOUBLE) <= n_tokens * {MAX_PUNCT_RATIO}
),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS tok_offset
  FROM f
)
SELECT doc_id, n_tokens, tok_offset,
       CAST(floor(tok_offset / {budget}.0) AS BIGINT) AS seq_id
FROM c"""


def docs_rollup(docs_ds):
    """ROLLUP / grouping-sets accounting in ONE data pass: doc counts +
    token totals at (source, lang), (source) and () grain.

    Only the FINEST grain touches the data (per-batch partials -> one
    coarse-hash exchange); the coarser tiers are re-aggregated from the
    base result, whose size is the group DOMAIN (sources x langs), not
    the corpus — so deriving tiers in a single small task is bounded
    regardless of data size.  NULL group values mark rolled-up levels,
    exactly like SQL ``GROUP BY ROLLUP``.
    """
    import pandas as pd

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.text import WORD_RE

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "lang": t.column("lang"),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), WORD_RE),
                pa.int64()),
        })

    base = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "lang"],
        [("", "count", "n_docs"), ("n_tokens", "sum", "total_tokens")])

    def tiers(df: pd.DataFrame) -> pd.DataFrame:
        t1 = (df.groupby("source", as_index=False)
              .agg(n_docs=("n_docs", "sum"),
                   total_tokens=("total_tokens", "sum")))
        t1["lang"] = None
        t2 = pd.DataFrame({"source": [None], "lang": [None],
                           "n_docs": [df["n_docs"].sum()],
                           "total_tokens": [df["total_tokens"].sum()]})
        out = pd.concat([df, t1, t2], ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["total_tokens"] = out["total_tokens"].astype("int64")
        return out[["source", "lang", "n_docs", "total_tokens"]]

    return (base.repartition(1)
            .map_batches(tiers, batch_format="pandas"))


def docs_rollup_sql() -> str:
    return r"""
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS total_tokens
FROM documents GROUP BY ROLLUP (source, lang)"""


def docs_cube(docs_ds):
    """CUBE accounting — :func:`docs_rollup` plus the (lang)-only tier,
    i.e. ALL four grouping sets of (source, lang), still in ONE data
    pass: the finest grain is the only one that touches the corpus and
    every coarser tier re-aggregates from the domain-sized base."""
    import pandas as pd

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.text import WORD_RE

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "lang": t.column("lang"),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), WORD_RE),
                pa.int64()),
        })

    base = grouped_aggregate(
        docs_ds.map_batches(partial, batch_format="pyarrow"),
        ["source", "lang"],
        [("", "count", "n_docs"), ("n_tokens", "sum", "total_tokens")])

    def tiers(df: pd.DataFrame) -> pd.DataFrame:
        outs = [df]
        for keys in (["source"], ["lang"], []):
            dropped = [c for c in ("source", "lang") if c not in keys]
            if keys:
                t = (df.groupby(keys, as_index=False)
                     .agg(n_docs=("n_docs", "sum"),
                          total_tokens=("total_tokens", "sum")))
            else:
                t = pd.DataFrame({"n_docs": [df["n_docs"].sum()],
                                  "total_tokens": [df["total_tokens"].sum()]})
            for c in dropped:
                t[c] = None
            outs.append(t)
        out = pd.concat(outs, ignore_index=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["total_tokens"] = out["total_tokens"].astype("int64")
        return out[["source", "lang", "n_docs", "total_tokens"]]

    return (base.repartition(1)
            .map_batches(tiers, batch_format="pandas"))


def docs_cube_sql() -> str:
    return r"""
SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS total_tokens
FROM documents GROUP BY CUBE (source, lang)"""


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


def quality_length_filter(docs_ds, q: float = 0.9):
    """Keep the longest ~(1-q) tail of the corpus: documents whose
    character length reaches the exact global ``ceil(q*n)``-th smallest
    length (the percentile-threshold quality gate curation pipelines
    run before packing).

    Two-phase global-quantile-then-filter: one exchange of (length,
    count) PARTIALS builds the length histogram (driver state = distinct
    lengths, never row-scale), the driver reads the threshold off the
    cumulative histogram with the same ``ceil(q*n)`` element convention
    as :mod:`..stages.quantiles`, and the filter is a zero-shuffle
    vectorized scan.  Text never moves.
    """
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    def with_len(t: pa.Table) -> pa.Table:
        return pa.table({"text_len": pc.cast(pc.utf8_length(
            t.column("text")), pa.int64())})

    hist = grouped_aggregate(
        docs_ds.map_batches(with_len, batch_format="pyarrow"),
        ["text_len"], [("", "count", "n")],
        num_partitions=min(8, shuffle_partitions())).to_pandas()
    hist = hist.sort_values("text_len")
    cum = np.cumsum(hist["n"].to_numpy())
    total = int(cum[-1]) if len(cum) else 0
    if total == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "text_len": pa.array([], pa.int64())})
    r = max(1, int(np.ceil(q * total)))  # IEEE double, mirrors the SQL
    thr = int(hist["text_len"].to_numpy()[np.searchsorted(cum, r)])

    def keep(t: pa.Table) -> pa.Table:
        ln = pc.cast(pc.utf8_length(t.column("text")), pa.int64())
        m = pc.greater_equal(ln, pa.scalar(thr, pa.int64()))
        return pa.table({"doc_id": t.column("doc_id").filter(m),
                         "text_len": ln.filter(m)})

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def quality_length_filter_sql(q: float = 0.9) -> str:
    return f"""
WITH s AS (
  SELECT length(text) AS L,
         row_number() OVER (ORDER BY length(text)) AS r,
         count(*) OVER () AS n
  FROM documents
)
SELECT doc_id, CAST(length(text) AS BIGINT) AS text_len
FROM documents
WHERE length(text) >= (
  SELECT L FROM s
  WHERE r = greatest(1, CAST(ceil(CAST({q} AS DOUBLE) * n) AS BIGINT)))"""


def training_table(sf_dir: str, coarse: int = 1024):
    """Assemble the per-document TRAINING TABLE: text-side features
    (char length, token count) joined 1:1 with embedding-side features
    (quantized L1 checksum, label) — the "attach features onto docs"
    step that precedes packing/sharding.

    Join shape: LARGE x LARGE equi-join on doc_id — at 100 TB both
    sides are corpus-scale so neither broadcasts; one coarse-hash
    exchange co-locates the two sides (the same sort-shuffle machinery
    as :mod:`..stages.exact_agg`) and a vectorized pandas merge runs
    per coarse group.  Only the FEATURES move: text and the float
    vectors are reduced to per-row scalars inside the map stage, so the
    exchange carries ~40 bytes/row regardless of document size.

    ``emb_q_sum`` = sum of floor(1e6 * component) over the vector —
    an integer checksum of the embedding that both engines compute
    identically (floor has no rounding-tie ambiguity; float sums would
    break the driver's value-hash compare).
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])

    def doc_side(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id")
        n = t.num_rows
        return pa.table({
            "doc_id": ids,
            "text_len": pc.cast(pc.utf8_length(t.column("text")),
                                pa.int64()),
            "n_tokens": pc.cast(pc.count_substring_regex(
                t.column("text"), r"\w+"), pa.int64()),
            "emb_q_sum": pa.array(np.full(n, -1, np.int64)),
            "label": pa.array(np.full(n, -1, np.int64)),
            "side": pa.array(np.zeros(n, np.int64)),
            "__coarse": pa.array(coarse_mix(ids.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def emb_side(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id")
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        q = np.floor(flat.astype(np.float64) * 1e6).astype(np.int64)
        lens = pc.list_value_length(col).fill_null(0).to_numpy()
        offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
        cs = np.concatenate(([0], np.cumsum(q, dtype=np.int64)))
        sums = cs[offs[1:]] - cs[offs[:-1]]
        n = t.num_rows
        return pa.table({
            "doc_id": ids,
            "text_len": pa.array(np.full(n, -1, np.int64)),
            "n_tokens": pa.array(np.full(n, -1, np.int64)),
            "emb_q_sum": pa.array(sums, pa.int64()),
            "label": pc.cast(t.column("label"), pa.int64()),
            "side": pa.array(np.ones(n, np.int64)),
            "__coarse": pa.array(coarse_mix(ids.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def join_group(g: pd.DataFrame) -> pd.DataFrame:
        d = g.loc[g["side"] == 0, ["doc_id", "text_len", "n_tokens"]]
        e = g.loc[g["side"] == 1, ["doc_id", "emb_q_sum", "label"]]
        return d.merge(e, on="doc_id", how="inner")

    u = (docs.map_batches(doc_side, batch_format="pyarrow")
         .union(emb.map_batches(emb_side, batch_format="pyarrow")))
    return (u.groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(join_group, batch_format="pandas"))


def training_table_sql() -> str:
    # LEFT JOIN lateral unnest keeps zero-length/NULL embeddings as
    # emb_q_sum=0 rows, matching the engine's cumsum-offsets path
    # (an inner lateral would drop the vec_id entirely)
    return r"""
WITH eq AS (
  SELECT vec_id,
         CAST(label AS BIGINT) AS label,
         CAST(coalesce(sum(CAST(floor(CAST(u.x AS DOUBLE) * 1000000)
                                AS BIGINT)), 0) AS BIGINT) AS emb_q_sum
  FROM embeddings LEFT JOIN unnest(embedding) AS u(x) ON TRUE
  GROUP BY vec_id, label
)
SELECT d.doc_id,
       CAST(length(d.text) AS BIGINT) AS text_len,
       CAST(len(regexp_extract_all(d.text, '\w+')) AS BIGINT) AS n_tokens,
       eq.emb_q_sum, eq.label
FROM documents d JOIN eq ON eq.vec_id = d.doc_id"""


def feature_zscore(sf_dir: str):
    """Per-group feature NORMALIZATION: z-score of document length
    within its language — the feature-scaling step that precedes
    training-table assembly (mixture balancing, outlier gating).

    Exactly driver-oracle-able despite emitting floats, because every
    float op is ONE correctly-rounded IEEE-754 operation on exact
    integer inputs, evaluated in the same order as the SQL oracle: the
    group moments are INTEGER sums (sum, sum-of-squares, count — fp
    summation order never enters, per the repo's integer-cents
    convention), and mean / var / std / z are a fixed tree of
    divide / subtract / sqrt whose results are fully determined by
    IEEE semantics (unlike transcendentals, which the convention
    forbids).  ``sqrt`` is clamped at 0 on BOTH sides because a
    constant group's variance can round to a tiny negative.

    Shape: one coarse-hash exchange over the (lang) DOMAIN for the
    moments (tiny — group-count rows), broadcast of the per-lang
    (mean, std) table via ``ray.put``, then one stateless vectorized
    attach pass (``pc.index_in`` + numpy gather).  Zero-variance and
    singleton groups are filtered identically on both sides (z is
    undefined there).

    Integer bound: sum(n_chars^2) must fit int64 — ~1e11 docs at 3e3
    chars is 9e17 < 2^63; shard the sum (or widen to python ints in the
    merge) past that.
    """
    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, process_cached, ref_key

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "n_chars"])

    def moments_partial(t: pa.Table) -> pa.Table:
        n = pc.cast(t.column("n_chars"), pa.int64())
        return pa.table({"lang": t.column("lang"), "s1": n,
                         "s2": pc.multiply(n, n)})

    mom = grouped_aggregate(
        docs.map_batches(moments_partial, batch_format="pyarrow"),
        ["lang"], [("s1", "sum", "s1"), ("s2", "sum", "s2"),
                   ("", "count", "n")])
    tbl = collect_small_arrow(mom)
    s1 = tbl.column("s1").to_numpy().astype(np.float64)
    s2 = tbl.column("s2").to_numpy().astype(np.float64)
    nn = tbl.column("n").to_numpy().astype(np.float64)
    # operand-order mirror of the SQL: mean = s1/n,
    # std = sqrt(greatest((s2 - s1*s1/n)/n, 0))
    mean = s1 / nn
    std = np.sqrt(np.maximum((s2 - (s1 * s1) / nn) / nn, 0.0))
    keep = std > 0
    langs = tbl.column("lang").to_numpy(zero_copy_only=False)[keep]
    ref = ray.put((list(langs), mean[keep], std[keep]))

    class AttachZ:
        def __init__(self, r):
            ls, m, s = ray.get(r)
            self.value_set = pa.array(ls, pa.string())
            self.mean, self.std = m, s

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t.column("lang"), value_set=self.value_set)
            mask = pc.is_valid(idx)
            t2 = t.filter(mask)
            ix = pc.filter(idx, mask).to_numpy(
                zero_copy_only=False).astype(np.int64)
            x = t2.column("n_chars").to_numpy().astype(np.float64)
            z = (x - self.mean[ix]) / self.std[ix]
            return pa.table({
                "doc_id": pc.cast(t2.column("doc_id"), pa.int64()),
                "lang": t2.column("lang"),
                "n_chars": pc.cast(t2.column("n_chars"), pa.int64()),
                "z": pa.array(z, pa.float64()),
            })

    return docs.map_batches(process_cached(AttachZ, ref_key(ref), ref),
                            batch_format="pyarrow")


def feature_zscore_sql() -> str:
    return """
WITH s AS (
  SELECT lang, CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars*n_chars) AS BIGINT) AS s2,
         CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY lang
),
p AS (
  SELECT lang, CAST(s1 AS DOUBLE)/n AS mean,
         sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n)/n,
                       0)) AS std
  FROM s
)
SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS n_chars,
       (d.n_chars - p.mean)/p.std AS z
FROM documents d JOIN p ON p.lang = d.lang
WHERE p.std > 0"""


def shard_documents(sf_dir: str, out_dir: str | None = None):
    """Resumable-output sharding: assign every document a deterministic
    shard (the first hex digit of md5(doc_id) — the same SQL-mirrorable
    hash family the sampling operators use), write ONE PARQUET
    DIRECTORY PER SHARD (hive ``partition_cols`` layout, so a failed
    run can skip finished shards and downstream readers can prune),
    read the written corpus BACK, and account (shard, n_docs,
    total_tokens) over the round-tripped rows.  The SQL oracle computes
    the same accounting over the source table directly — a hash match
    certifies the write -> read cycle lost nothing.

    Output rows are shard-domain-sized; the write streams block-by-
    block (never materializes), and the read-back prunes to the two
    columns the accounting needs.
    """
    import shutil
    import tempfile

    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..stages.sampling import _hex8
    from ..stages.text import WORD_RE

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_shards_")

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])

    def assign(t: pa.Table) -> pa.Table:
        hx = _hex8(t.column("doc_id").to_pylist())
        return t.append_column("shard",
                               pa.array([h[0] for h in hx], pa.string()))

    try:
        docs.map_batches(assign, batch_format="pyarrow").write_parquet(
            out_dir, partition_cols=["shard"])

        back = ray.data.read_parquet(out_dir, columns=["text", "shard"])

        def partial(t: pa.Table) -> pa.Table:
            return pa.table({
                "shard": pc.cast(t.column("shard"), pa.string()),
                "n_tokens": pc.cast(
                    pc.count_substring_regex(t.column("text"), WORD_RE),
                    pa.int64()),
            })

        out = grouped_aggregate(
            back.map_batches(partial, batch_format="pyarrow"),
            ["shard"],
            [("", "count", "n_docs"),
             ("n_tokens", "sum", "total_tokens")]).to_pandas()
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def shard_documents_sql() -> str:
    return r"""
SELECT substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len(regexp_extract_all(text, '\w+'))) AS BIGINT)
         AS total_tokens
FROM documents GROUP BY 1"""


def docs_union_evolved(sf_dir: str):
    """Schema-evolution accounting: union two crawls whose schemas
    DIVERGED (crawl A carries ``lang``, crawl B dropped it and added
    ``n_chars``) via :func:`~..util.union_by_name`, then count rows and
    per-column non-null coverage — the first sanity report run after
    ingesting a corpus whose schema drifted between dumps.  One
    normalize-union scan + per-batch count partials, single tiny
    reduce."""
    import ray.data

    from ..util import union_by_name

    a = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "lang"])
    b = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                              columns=["doc_id", "n_chars"])

    def shift(t: pa.Table) -> pa.Table:
        ids = pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                     pa.scalar(1_000_000, pa.int64()))
        return t.set_column(t.schema.get_field_index("doc_id"),
                            "doc_id", ids)

    u = union_by_name([a, b.map_batches(shift, batch_format="pyarrow")])

    def counts(t: pa.Table) -> pa.Table:
        return pa.table({
            "n_rows": pa.array([t.num_rows], pa.int64()),
            "n_lang": pa.array([t.num_rows - t.column("lang").null_count],
                               pa.int64()),
            "n_n_chars": pa.array(
                [t.num_rows - t.column("n_chars").null_count], pa.int64()),
        })

    out = u.map_batches(counts, batch_format="pyarrow").to_pandas().sum()
    import pandas as pd

    return pd.DataFrame({
        "n_rows": pd.Series([int(out["n_rows"])], dtype="int64"),
        "n_lang": pd.Series([int(out["n_lang"])], dtype="int64"),
        "n_n_chars": pd.Series([int(out["n_n_chars"])], dtype="int64"),
    })


def docs_union_evolved_sql() -> str:
    return """
WITH u AS (
  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, CAST(NULL AS VARCHAR) AS lang,
         CAST(n_chars AS BIGINT) AS n_chars
  FROM documents
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(lang) AS BIGINT) AS n_lang,
       CAST(count(n_chars) AS BIGINT) AS n_n_chars
FROM u"""


def docs_jsonl_roundtrip(sf_dir: str, out_dir: str | None = None):
    """Multi-format source/sink coverage: stream the documents table out
    as JSONL (the interchange format most crawl dumps arrive in), read
    it BACK with the JSON reader, and account (lang, n_docs,
    total_chars) over the round-tripped rows — the oracle computes the
    same numbers from the parquet source, so a hash match certifies
    the JSONL encode -> decode cycle preserved every row and field.
    """
    import shutil
    import tempfile

    import ray.data

    from ..stages.exact_agg import grouped_aggregate

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_jsonl_")

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        docs.write_json(out_dir)
        back = ray.data.read_json(out_dir)

        def partial(t: pa.Table) -> pa.Table:
            return pa.table({
                "lang": pc.cast(t.column("lang"), pa.string()),
                "n_chars": pc.cast(pc.utf8_length(t.column("text")),
                                   pa.int64()),
            })

        out = grouped_aggregate(
            back.map_batches(partial, batch_format="pyarrow"),
            ["lang"],
            [("", "count", "n_docs"),
             ("n_chars", "sum", "total_chars")]).to_pandas()
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def docs_jsonl_roundtrip_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def docs_csv_roundtrip(sf_dir: str, out_dir: str | None = None,
                       checksum: bool = False):
    """CSV sink/source coverage (the same write -> read-back -> account
    certificate as :func:`docs_jsonl_roundtrip`, over the other
    interchange format bulk exports arrive in).  Arrow's CSV writer
    quotes embedded delimiters/newlines, so the hash match certifies
    the quote/escape cycle too.  With ``checksum=True`` the result
    keeps a per-lang XOR of FNV-1a content hashes — no SQL twin, but
    the pytest compares it engine-vs-engine against the parquet source,
    so a corruption that cancels out in the char sums still trips."""
    import shutil
    import tempfile

    import ray.data

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_csv_")

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        docs.write_csv(out_dir)
        back = ray.data.read_csv(out_dir)
        out = _lang_accounting(back)
        if not checksum:
            out = out.drop(columns=["text_xor"])
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def _lang_accounting(ds):
    """Per-lang (n_docs, total_chars, text_xor) accounting shared by the
    sink/source round-trip certificates: an XOR of per-doc FNV-1a
    content hashes survives any aggregation order, so the result is
    exchange-stable AND detects corruptions whose char sums cancel."""
    from ..stages.exact_agg import hash_columns
    from ..stages.text import _fnv1a_rolling
    from ..util import shuffle_partitions

    def partial(t: pa.Table) -> pa.Table:
        # CSV cannot distinguish an unquoted empty field from NULL;
        # normalize read-back nulls to "" (source texts are non-null)
        text = pc.fill_null(pc.cast(t.column("text"), pa.string()), "")
        import numpy as np
        sha = _fnv1a_rolling(text).astype(np.int64)
        return pa.table({
            "lang": pc.cast(t.column("lang"), pa.string()),
            "n_chars": pc.cast(pc.utf8_length(text), pa.int64()),
            "text_xor": pa.array(sha),
        })

    def xor_merge(g):
        import numpy as np

        out = (g.groupby("lang", sort=False)
               .agg(n_docs=("n_chars", "size"),
                    total_chars=("n_chars", "sum"),
                    text_xor=("text_xor",
                              lambda v: np.bitwise_xor.reduce(
                                  v.to_numpy(np.int64))))
               .reset_index())
        out["n_docs"] = out["n_docs"].astype("int64")
        out["total_chars"] = out["total_chars"].astype("int64")
        out["text_xor"] = out["text_xor"].astype("int64")
        return out

    def add_coarse(t: pa.Table) -> pa.Table:
        import numpy as np
        kh = hash_columns(t.select(["lang"]))
        return t.append_column(
            "__coarse",
            pa.array((kh & np.uint64(255)).astype(np.int64)))

    return (ds.map_batches(partial, batch_format="pyarrow")
            .map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=min(8, shuffle_partitions()))
            .map_groups(xor_merge, batch_format="pandas")).to_pandas()


def docs_csv_roundtrip_sql() -> str:
    # the engine-side FNV-1a (text._fnv1a_rolling) has no SQL twin, so
    # the XOR checksum compares engine-vs-engine (parquet source vs CSV
    # round trip) inside the pytest (checksum=True); the ORACLE checks
    # the per-lang counts/char sums like the JSONL round trip.
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def _block_shard_stem(t: pa.Table) -> str:
    """Deterministic per-block shard name stem: a content hash of the
    block's doc_id vector.  A Ray task RETRY re-executes the same block
    -> same stem, so combined with :func:`_atomic_write` the retry
    OVERWRITES the first attempt instead of leaving a duplicate (uuid
    names double-counted the read-back after worker-death retries)."""
    ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
    return hashlib.md5(ids.tobytes()).hexdigest()


def _atomic_write(path: str, writer) -> None:
    """temp-file + ``os.replace`` shard write: a dying writer never
    leaves a partial file under the final name, and a retried task
    replaces rather than duplicates.  Readers additionally filter by
    ``file_extensions`` so an orphaned ``.tmp-*`` from a hard-killed
    worker is never read back."""
    import os
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    try:
        writer(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def docs_orc_roundtrip(sf_dir: str, out_dir: str | None = None,
                       checksum: bool = False):
    """ORC sink/source coverage.  Ray ships no native ORC I/O, so this
    exercises the general recipe for ANY Arrow-supported format Ray
    lacks: the sink is a ``map_batches`` task writing one
    ``pyarrow.orc`` shard per BLOCK (``batch_size=None`` — shard count
    tracks block count, so the layout stays partitioned and resumable),
    consumed only through its path/row manifest; the source is
    ``read_binary_files`` + a per-file ORC decode in ``map_batches``.
    Certificate: the same per-lang write -> read-back -> account
    contract as the CSV/JSONL round trips (XOR checksum engine-vs-
    engine under ``checksum=True``)."""
    import os
    import shutil
    import tempfile

    import pyarrow.orc as orc
    import ray.data

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_orc_")

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        def write_shard(t: pa.Table) -> pa.Table:
            path = os.path.join(out_dir,
                                f"part-{_block_shard_stem(t)}.orc")
            _atomic_write(path, lambda p: orc.write_table(t, p))
            return pa.table({"path": pa.array([path], pa.string()),
                             "rows": pa.array([t.num_rows], pa.int64())})

        # the manifest is shard-domain sized; collecting it IS the sink
        # barrier (nothing reads the directory before every shard lands)
        manifest = docs.map_batches(
            write_shard, batch_size=None,
            batch_format="pyarrow").to_pandas()
        assert len(manifest) > 0

        def decode(t: pa.Table) -> pa.Table:
            tabs = [orc.ORCFile(pa.BufferReader(b.as_py())).read()
                    for b in t.column("bytes")]
            return pa.concat_tables(tabs)

        back = (ray.data.read_binary_files(
                    out_dir, file_extensions=["orc"])
                .map_batches(decode, batch_format="pyarrow"))
        out = _lang_accounting(back)
        if not checksum:
            out = out.drop(columns=["text_xor"])
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def docs_orc_roundtrip_sql() -> str:
    # like the CSV round trip: the oracle checks per-lang counts/char
    # sums; the XOR checksum is engine-vs-engine inside the pytest
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def corpus_merge(sf_dir: str):
    """SNAPSHOT MERGE (upsert + tombstone apply): the maintenance step
    that follows :func:`corpus_diff`'s report — base corpus + a delta
    of upserts (5% revised ' [rev2]' docs, 5% new arrivals at shifted
    ids) and tombstones (the 5% deleted ids), producing the next
    snapshot's per-lang accounting plus a ``bit_xor(doc_id)`` MEMBERSHIP
    certificate (counts alone can't tell "replaced the right row" from
    "replaced the wrong one").

    Shape: both sides reduce to (doc_id, lang, n_chars, version, tomb)
    scalar rows per batch — text never shuffles — and co-locate through
    ONE id-keyed coarse exchange; per-id resolution (tombstone wins,
    else highest version) is vectorized masking inside each group; the
    survivors aggregate to the lang domain in the same pass.
    """
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    coarse = 1024

    def base_rows(t: pa.Table) -> pa.Table:
        return _merge_rows(t.column("doc_id"), t.column("lang"),
                           t.column("text"), version=0, tomb=False)

    def delta_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        # revised docs (upsert, same id)
        rev = t.filter(pa.array((ids % 100) >= 95))
        rev_text = pc.binary_join_element_wise(
            pc.cast(rev.column("text"), pa.string()), " [rev2]", "")
        # new arrivals (upsert, shifted id, lang carried)
        arr = t.filter(pa.array((ids % 100) < 5))
        arr_ids = pc.add(pc.cast(arr.column("doc_id"), pa.int64()),
                         pa.scalar(1_000_000, pa.int64()))
        # tombstones for the deleted ids (payload irrelevant)
        tomb = t.filter(pa.array((ids % 100) < 5))
        return pa.concat_tables([
            _merge_rows(rev.column("doc_id"), rev.column("lang"),
                        rev_text, version=1, tomb=False),
            _merge_rows(arr_ids, arr.column("lang"),
                        arr.column("text"), version=1, tomb=False),
            _merge_rows(tomb.column("doc_id"), tomb.column("lang"),
                        tomb.column("text"), version=1, tomb=True),
        ])

    def _merge_rows(ids, langs, texts, version: int, tomb: bool) -> pa.Table:
        ids = pc.cast(ids, pa.int64())
        n = len(ids)
        return pa.table({
            "doc_id": ids,
            "lang": pc.cast(langs, pa.string()),
            "n_chars": pc.cast(pc.utf8_length(texts), pa.int64()),
            "version": pa.array(np.full(n, version, np.int64)),
            "tomb": pa.array(np.full(n, tomb)),
            "__coarse": pa.array(coarse_mix(ids.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        tomb_ids = set(g.loc[g["tomb"], "doc_id"])
        live = g[~g["tomb"] & ~g["doc_id"].isin(tomb_ids)]
        # highest version per id wins (stable sort: base first)
        live = (live.sort_values(["doc_id", "version"], kind="stable")
                .groupby("doc_id", sort=False).tail(1))
        out = (live.groupby("lang", sort=False)
               .agg(n_docs=("doc_id", "size"),
                    total_chars=("n_chars", "sum"),
                    id_xor=("doc_id", lambda v: int(np.bitwise_xor.reduce(
                        v.to_numpy(np.int64)))))
               .reset_index())
        for c in ("n_docs", "total_chars", "id_xor"):
            out[c] = out[c].astype("int64")
        return out

    def lang_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("lang", sort=False)
               .agg(n_docs=("n_docs", "sum"),
                    total_chars=("total_chars", "sum"),
                    id_xor=("id_xor", lambda v: int(np.bitwise_xor.reduce(
                        v.to_numpy(np.int64)))))
               .reset_index())
        for c in ("n_docs", "total_chars", "id_xor"):
            out[c] = out[c].astype("int64")
        return out

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    u = (docs.map_batches(base_rows, batch_format="pyarrow")
         .union(docs.map_batches(delta_rows, batch_format="pyarrow")))
    parts = (u.groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(resolve, batch_format="pandas"))
    # lang domain is tiny: one small exchange finishes the certificate
    return (parts.groupby("lang", num_partitions=4)
            .map_groups(lang_merge, batch_format="pandas"))


def corpus_merge_sql() -> str:
    return """
WITH delta_up AS (
  SELECT doc_id, lang, text || ' [rev2]' AS text
  FROM documents WHERE doc_id % 100 >= 95
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, lang, text
  FROM documents WHERE doc_id % 100 < 5
),
merged AS (
  SELECT * FROM delta_up
  UNION ALL
  SELECT doc_id, lang, text FROM documents
  WHERE doc_id % 100 >= 5
    AND doc_id NOT IN (SELECT doc_id FROM delta_up)
)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
FROM merged GROUP BY lang"""


def corpus_diff(sf_dir: str):
    """SNAPSHOT DIFF between two corpus versions: per-document
    added / removed / changed / unchanged accounting — the ingest-time
    report that tells a pipeline operator what yesterday's crawl
    actually did.  The "new" snapshot is synthesized deterministically
    from the old one (5% of docs deleted: ids%100 in [0,5); 5% revised:
    ids%100 >= 95 get ' [rev2]' appended; the rest carried unchanged),
    and the SQL oracle mirrors the synthesis in CTEs.

    Shape: both snapshots reduce to (doc_id, sha) rows per batch and
    co-locate through ONE doc_id-keyed coarse exchange; per-key state
    comparison is vectorized inside each group; the output is a
    4-row class histogram.  Text never shuffles.
    """
    import hashlib

    import pandas as pd
    import ray.data

    from ..stages.dedup import coarse_mix
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions

    coarse = 1024

    def old_rows(t: pa.Table) -> pa.Table:
        return _diff_rows(t, is_new=False)

    def new_rows(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        # carried forward (5% deleted), 5% revised
        kept = t.filter(pa.array((ids % 100) >= 5))
        kids = kept.column("doc_id").to_numpy()
        rev = (kids % 100) >= 95
        texts = kept.column("text").to_pylist()
        texts = [x + " [rev2]" if r else x for x, r in zip(texts, rev)]
        kept = kept.set_column(kept.schema.get_field_index("text"),
                               "text", pa.array(texts, pa.string()))
        # 5% genuinely NEW arrivals (shifted ids)
        arr = t.filter(pa.array((ids % 100) < 5))
        arr = arr.set_column(
            arr.schema.get_field_index("doc_id"), "doc_id",
            pa.array(arr.column("doc_id").to_numpy() + 1_000_000,
                     pa.int64()))
        return pa.concat_tables([_diff_rows(kept, is_new=True),
                                 _diff_rows(arr, is_new=True)])

    def _diff_rows(t: pa.Table, is_new: bool) -> pa.Table:
        ids = pc.cast(t.column("doc_id"), pa.int64())
        shas = [hashlib.sha256(x.encode()).hexdigest()
                for x in t.column("text").to_pylist()]
        n = t.num_rows
        return pa.table({
            "doc_id": ids,
            "sha_old": pa.array([None] * n if is_new else shas,
                                pa.string()),
            "sha_new": pa.array(shas if is_new else [None] * n,
                                pa.string()),
            "__coarse": pa.array(coarse_mix(ids.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        # '' sentinel: pandas max over object columns rejects NaN+str
        g = g.fillna({"sha_old": "", "sha_new": ""})
        agg = g.groupby("doc_id", sort=False).agg(
            sha_old=("sha_old", "max"), sha_new=("sha_new", "max"))
        old_p = agg["sha_old"] != ""
        new_p = agg["sha_new"] != ""
        status = np.where(~old_p, "added",
                          np.where(~new_p, "removed",
                                   np.where(agg["sha_old"] == agg["sha_new"],
                                            "unchanged", "changed")))
        out = (pd.DataFrame({"status": status}).groupby("status")
               .size().rename("n_docs").reset_index())
        out["n_docs"] = out["n_docs"].astype("int64")
        return out

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "text"])
    u = (docs.map_batches(old_rows, batch_format="pyarrow")
         .union(docs.map_batches(new_rows, batch_format="pyarrow")))
    parts = (u.groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(classify, batch_format="pandas"))
    return grouped_aggregate(parts, ["status"],
                             [("n_docs", "sum", "n_docs")])


def corpus_diff_sql() -> str:
    return """
WITH newc AS (
  SELECT doc_id,
         CASE WHEN doc_id % 100 >= 95 THEN text || ' [rev2]'
              ELSE text END AS text
  FROM documents WHERE doc_id % 100 >= 5
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text
  FROM documents WHERE doc_id % 100 < 5
),
j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
         sha256(o.text) AS sha_old, sha256(n.text) AS sha_new
  FROM documents o FULL OUTER JOIN newc n ON n.doc_id = o.doc_id
)
SELECT CASE WHEN sha_old IS NULL THEN 'added'
            WHEN sha_new IS NULL THEN 'removed'
            WHEN sha_old = sha_new THEN 'unchanged'
            ELSE 'changed' END AS status,
       CAST(count(*) AS BIGINT) AS n_docs
FROM j GROUP BY 1"""


def corpus_fingerprint(docs_ds):
    """Table FINGERPRINT for migration / replication audits: per lang,
    row count, total chars, and order-free XOR certificates over the
    row CONTENT (md5-prefix int) and the id set — two corpus copies
    fingerprint equal iff they hold the same rows, regardless of
    partitioning or order (counts alone can't tell "row replaced" from
    "row intact"; the :func:`corpus_merge` certificate idea promoted to
    a standalone audit operator).

    XOR is commutative/associative/self-inverse, so per-batch partials
    merge exactly in any order; partials are lang-domain rows per block
    and the final merge is a driver-side fold over |langs| x blocks
    rows (the q8 year-partial pattern).  Text never moves.
    """
    import pandas as pd

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        content = np.array(
            [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
             for t in df["text"]], np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        lens = df["text"].str.len().to_numpy(np.int64)
        out = (pd.DataFrame({"lang": df["lang"].to_numpy(object),
                             "n_docs": 1, "total_chars": lens,
                             "content_xor": content, "id_xor": ids})
               .groupby("lang", sort=False)
               .agg(n_docs=("n_docs", "sum"),
                    total_chars=("total_chars", "sum"),
                    content_xor=("content_xor",
                                 lambda v: np.bitwise_xor.reduce(
                                     v.to_numpy(np.int64))),
                    id_xor=("id_xor",
                            lambda v: np.bitwise_xor.reduce(
                                v.to_numpy(np.int64))))
               .reset_index())
        return out

    from ..util import collect_small_arrow

    partials = collect_small_arrow(
        docs_ds.map_batches(partial, batch_format="pandas")).to_pandas()
    if partials.empty:
        return pd.DataFrame({"lang": pd.Series(dtype="string"),
                             "n_docs": pd.Series(dtype="int64"),
                             "total_chars": pd.Series(dtype="int64"),
                             "content_xor": pd.Series(dtype="int64"),
                             "id_xor": pd.Series(dtype="int64")})
    out = (partials.groupby("lang", as_index=False)
           .agg(n_docs=("n_docs", "sum"),
                total_chars=("total_chars", "sum"),
                content_xor=("content_xor",
                             lambda v: np.bitwise_xor.reduce(
                                 v.to_numpy(np.int64))),
                id_xor=("id_xor",
                        lambda v: np.bitwise_xor.reduce(
                            v.to_numpy(np.int64)))))
    for c in ("n_docs", "total_chars", "content_xor", "id_xor"):
        out[c] = out[c].astype("int64")
    return out


def corpus_fingerprint_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT))
            AS BIGINT) AS content_xor,
       CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
FROM documents GROUP BY lang"""


# ---------------------------------------------------------------------------
# corpus-wide line-level deduplication with document REWRITE (CCNet-style)
# ---------------------------------------------------------------------------

_POS_BITS = 20  # position packing doc_id * 2^20 + line_no: < 1M lines/doc


class _LineRewriter:
    """Stateless-task rewrite stage: mask every line occurrence whose
    corpus-wide count exceeds the threshold UNLESS it is the line's
    globally-first occurrence, then reassemble each document from its
    surviving lines.  Cheap state (two sorted int64 arrays) — task mode
    via ``util.process_cached``, not an actor pool."""

    def __init__(self, dir_ref):
        import ray

        self.lh, self.mp = ray.get(dir_ref)  # sorted hashes, first-pos

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, lens, flat, lh, pos = _corpus_line_rows(t)
        if len(self.lh) and len(lh):
            at = np.searchsorted(self.lh, lh)
            at_c = np.minimum(at, len(self.lh) - 1)
            dup_hit = self.lh[at_c] == lh
            removed = dup_hit & (self.mp[at_c] != pos)
        else:
            removed = np.zeros(len(lh), dtype=bool)
        keep = ~removed
        starts = np.concatenate(([0], np.cumsum(lens)))
        rem_cs = np.concatenate(([0], np.cumsum(removed, dtype=np.int64)))
        n_removed = rem_cs[starts[1:]] - rem_cs[starts[:-1]]
        flat_py = flat.to_pylist()
        md5s, clens = [], []
        for k in range(len(ids)):
            s, e = int(starts[k]), int(starts[k + 1])
            txt = "\n".join(flat_py[j] for j in range(s, e) if keep[j])
            md5s.append(hashlib.md5(txt.encode("utf-8")).hexdigest())
            clens.append(len(txt))
        return pa.table({
            "i": pa.array(ids, pa.int64()),
            "n_lines": pa.array(lens, pa.int64()),
            "n_removed": pa.array(n_removed, pa.int64()),
            "cleaned_len": pa.array(clens, pa.int64()),
            "cleaned_md5": pa.array(md5s, pa.string()),
        })


def _corpus_line_rows(t: pa.Table):
    """documents(doc_id) batch -> (ids, lines-per-doc, flat line array,
    line hash, packed global position), fully vectorized: the corpus is
    synthesized per batch, split on newlines with the Arrow kernel, and
    hashed straight from the flat string buffers."""
    from ..sources.corpus import synthesize_batch
    from ..stages.exact_agg import _hash_string_array

    ids = t.column("doc_id").to_numpy().astype(np.int64)
    corp = synthesize_batch(t)
    lists = pc.split_pattern(corp.column("content"), "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    lens = pc.list_value_length(lists).to_numpy().astype(np.int64)
    total = int(lens.sum())
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), lens)
    ln = (np.arange(total, dtype=np.int64)
          - np.repeat(np.cumsum(lens) - lens, lens) + 1)
    pos = ids[doc_idx] * (1 << _POS_BITS) + ln
    lh = _hash_string_array(flat).view(np.int64)
    return ids, lens, flat, lh, pos


def line_dedup(sf_dir: str, max_count: int = 1,
               max_dup_lines: int = 4_000_000):
    """Corpus-wide LINE deduplication with document rewrite (the
    CCNet/RefinedWeb curation step: boilerplate lines repeated across a
    crawl are deleted, each keeping exactly its globally-FIRST
    occurrence by (doc, line_no) position).  Output per document:
    ``(i, n_lines, n_removed, cleaned_len, cleaned_md5)`` — the md5
    certifies the rewritten text byte-for-byte against the SQL oracle's
    ordered ``string_agg`` reassembly.

    Shape: (1) per-batch vectorized explode (``pc.split_pattern`` +
    Arrow-buffer FNV hash) pre-aggregates to (line-hash, count,
    min-pos), so the hash-keyed coarse exchange moves 24 bytes per
    distinct line per block and reduces to the duplicated-line
    DIRECTORY — 16 bytes per distinct line with corpus count >
    ``max_count``; text never moves.  (2) The directory is collected
    driver-side (bounded by ``max_dup_lines``, ~64 MB of int64 pairs at
    the default; past that route the attach through a doc-keyed
    colocate join like ``stages/dedup.join_pairs_with_signatures``
    instead of a broadcast) and shipped once via ``ray.put``.  (3) A
    zero-shuffle rewrite scan masks removed occurrences via
    ``searchsorted`` and reassembles each document locally.

    Line identity is the 64-bit FNV-1a of the line bytes
    (``exact_agg._hash_string_array``) — collision-free at oracle
    scale; position packing assumes < 2^20 lines per document.
    """
    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, process_cached, ref_key

    def line_stats(t: pa.Table) -> pa.Table:
        _, _, _, lh, pos = _corpus_line_rows(t)
        import pandas as pd
        g = (pd.DataFrame({"lh": lh, "pos": pos})
             .groupby("lh", sort=False)["pos"]
             .agg(c="size", mp="min").reset_index())
        return pa.table({"lh": pa.array(g["lh"], pa.int64()),
                         "c": pa.array(g["c"], pa.int64()),
                         "mp": pa.array(g["mp"], pa.int64())})

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id"])
    directory = grouped_aggregate(
        docs.map_batches(line_stats, batch_format="pyarrow"),
        ["lh"], [("c", "sum", "c"), ("mp", "min", "mp")])
    dup_tbl = collect_small_arrow(directory.map_batches(
        lambda t: t.filter(pc.greater(t.column("c"), max_count))
                   .select(["lh", "mp"]),
        batch_format="pyarrow"))
    if dup_tbl.num_columns and dup_tbl.num_rows > max_dup_lines:
        raise ValueError(
            f"line_dedup: {dup_tbl.num_rows} duplicated lines exceeds "
            f"max_dup_lines={max_dup_lines}; raise the bound or route the "
            "attach through a doc-keyed colocate join "
            "(stages/dedup.join_pairs_with_signatures shape)")
    if dup_tbl.num_columns and dup_tbl.num_rows:
        lh = dup_tbl.column("lh").to_numpy()
        mp = dup_tbl.column("mp").to_numpy()
        order = np.argsort(lh)
        dir_ref = ray.put((lh[order], mp[order]))
    else:
        dir_ref = ray.put((np.zeros(0, np.int64), np.zeros(0, np.int64)))

    return docs.map_batches(
        process_cached(_LineRewriter, ("line_dedup", ref_key(dir_ref)),
                       dir_ref),
        batch_format="pyarrow")


def line_dedup_sql(max_count: int = 1) -> str:
    from ..sources.corpus import corpus_sql_cte

    return f"""
WITH {corpus_sql_cte()},
ls AS (SELECT i, string_split(content, chr(10)) AS a FROM corpus),
lines AS (
  SELECT i, unnest(a) AS line, unnest(range(1, len(a) + 1)) AS ln
  FROM ls
),
pos AS (SELECT i, ln, line, i * {1 << _POS_BITS} + ln AS p FROM lines),
dup AS (
  SELECT line, min(p) AS first_pos
  FROM pos GROUP BY line HAVING count(*) > {max_count}
),
marked AS (
  SELECT pos.i, pos.ln, pos.line,
         (dup.line IS NOT NULL AND pos.p <> dup.first_pos) AS removed
  FROM pos LEFT JOIN dup USING (line)
)
SELECT i,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(CASE WHEN removed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(length(coalesce(string_agg(
             CASE WHEN NOT removed THEN line END, chr(10) ORDER BY ln),
             '')) AS BIGINT) AS cleaned_len,
       md5(coalesce(string_agg(
             CASE WHEN NOT removed THEN line END, chr(10) ORDER BY ln),
             '')) AS cleaned_md5
FROM marked GROUP BY i"""


def compact_shards(sf_dir: str, small_files: int = 64,
                   target_files: int = 8):
    """Small-file COMPACTION — the table-maintenance pass every
    long-lived lake table needs: a fragmented layout (``small_files``
    tiny parquet files, the pathological many-small-writes state) is
    rewritten by ``repartition(target_files)`` into few well-sized
    files, and the per-lang account + XOR content checksum
    (:func:`_lang_accounting`) certifies the rewrite lost and
    duplicated nothing.  The oracle computes the same accounting over
    the source table — only counts/sums are SQL-checked; the file-count
    contract (exactly ``target_files`` after compaction) is pinned in
    pytest.

    Scale note: compaction IS a shuffle by design (that is the price of
    re-clustering); the certificate's accounting stays streaming."""
    import glob as _glob
    import shutil
    import tempfile

    import ray.data

    frag_dir = tempfile.mkdtemp(prefix="yjsv_frag_")
    comp_dir = tempfile.mkdtemp(prefix="yjsv_comp_")
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        # fragment: force many tiny files (the "before" state)
        docs.repartition(small_files).write_parquet(frag_dir)
        n_before = len(_glob.glob(f"{frag_dir}/*.parquet"))
        # compact
        (ray.data.read_parquet(frag_dir)
         .repartition(target_files).write_parquet(comp_dir))
        n_after = len(_glob.glob(f"{comp_dir}/*.parquet"))
        out = _lang_accounting(ray.data.read_parquet(comp_dir))
        out = out.drop(columns=["text_xor"])
        out.attrs["n_files_before"] = n_before
        out.attrs["n_files_after"] = n_after
    finally:
        shutil.rmtree(frag_dir, ignore_errors=True)
        shutil.rmtree(comp_dir, ignore_errors=True)
    return out


def compact_shards_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def docs_feather_roundtrip(sf_dir: str, out_dir: str | None = None,
                           checksum: bool = False):
    """Feather / Arrow-IPC sink-source coverage — the zero-copy
    interchange format (mmap-able, the on-disk twin of the in-flight
    Arrow batches).  Same recipe as :func:`docs_orc_roundtrip`: one
    IPC shard per BLOCK via a map_batches task sink consumed through a
    path/row manifest, read back with read_binary_files + a per-file
    decode, certified by the per-lang accounting contract."""
    import os
    import shutil
    import tempfile

    import pyarrow.feather as feather
    import ray.data

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_feather_")

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        def write_shard(t: pa.Table) -> pa.Table:
            path = os.path.join(out_dir,
                                f"part-{_block_shard_stem(t)}.feather")
            _atomic_write(path,
                          lambda p: feather.write_feather(t, p))
            return pa.table({"path": pa.array([path], pa.string()),
                             "rows": pa.array([t.num_rows], pa.int64())})

        manifest = docs.map_batches(
            write_shard, batch_size=None,
            batch_format="pyarrow").to_pandas()
        assert len(manifest) > 0

        def decode(t: pa.Table) -> pa.Table:
            tabs = [feather.read_table(pa.BufferReader(b.as_py()))
                    for b in t.column("bytes")]
            return pa.concat_tables(tabs)

        back = (ray.data.read_binary_files(
                    out_dir, file_extensions=["feather"])
                .map_batches(decode, batch_format="pyarrow"))
        out = _lang_accounting(back)
        if not checksum:
            out = out.drop(columns=["text_xor"])
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def docs_feather_roundtrip_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""


def shuffle_certificate(sf_dir: str):
    """``Dataset.random_shuffle`` coverage with an exact oracle: the
    global shuffle is inherently non-deterministic, so the certified
    output is its ORDER-FREE fingerprint — per-lang counts, char sums,
    and id XOR taken AFTER the all-to-all shuffle — which must equal
    the unshuffled table's fingerprint (rows permuted, none lost,
    duplicated, or mutated).  This is the repo's only use of Ray's
    random_shuffle (training-epoch randomization); every deterministic
    sampling need uses the md5-rule operators instead.

    Shape: the shuffle IS the exchange; the fingerprint partials are
    lang-domain per block and fold driver-side (XOR associativity),
    exactly like :func:`corpus_fingerprint`.
    """
    import ray.data

    from ..util import collect_small_arrow

    docs = (ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                  columns=["doc_id", "lang", "text"])
            .random_shuffle())

    def partial_pd(df):
        import pandas as pd

        g = (df.assign(n_docs=1,
                       total_chars=df["text"].str.len().astype("int64"),
                       id_xor=df["doc_id"].astype("int64"))
             .groupby("lang", sort=False)
             .agg(n_docs=("n_docs", "sum"),
                  total_chars=("total_chars", "sum"),
                  id_xor=("id_xor", lambda v: int(
                      np.bitwise_xor.reduce(v.to_numpy(np.int64)))))
             .reset_index())
        return g

    partials = collect_small_arrow(
        docs.map_batches(partial_pd, batch_format="pandas")).to_pandas()
    out = (partials.groupby("lang", as_index=False)
           .agg(n_docs=("n_docs", "sum"),
                total_chars=("total_chars", "sum"),
                id_xor=("id_xor", lambda v: int(
                    np.bitwise_xor.reduce(v.to_numpy(np.int64))))))
    for c in ("n_docs", "total_chars", "id_xor"):
        out[c] = out[c].astype("int64")
    return out


def shuffle_certificate_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars,
       CAST(bit_xor(doc_id) AS BIGINT) AS id_xor
FROM documents GROUP BY lang"""


def range_partition_plan(sf_dir: str, k: int = 8):
    """Range-partitioning PLAN: the k-1 split points on o_totalprice
    (whole dollars) that balance orders across k range partitions —
    boundary_i = the smallest dollar value whose running count reaches
    ceil(i*N/k) — plus the exact cumulative count at each boundary,
    the planning step before a range-partitioned write or range join
    (split points need not be exact row values, so the plan quantizes
    to the bounded dollar grid — price-range-domain, NOT data-sized).

    Shape: one dollar-domain count exchange; the driver folds the
    bounded histogram (price-range cardinality at any corpus scale)
    with one cumsum + searchsorted over the k-1 rank targets.
    """
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    def partial(t: pa.Table) -> pa.Table:
        d = pc.cast(pc.floor(t.column("o_totalprice")), pa.int64())
        return pa.table({"dollars": d})

    hist = collect_small_arrow(grouped_aggregate(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                              columns=["o_totalprice"])
        .map_batches(partial, batch_format="pyarrow"),
        ["dollars"], [("", "count", "n")])).to_pandas()
    hist = hist.sort_values("dollars").reset_index(drop=True)
    cum = hist["n"].cumsum().to_numpy()
    n_total = int(cum[-1]) if len(cum) else 0
    targets = [(i * n_total + k - 1) // k for i in range(1, k)]
    idx = np.searchsorted(cum, targets, side="left")
    import pandas as pd

    out = pd.DataFrame({
        "split_idx": pd.Series(range(1, k), dtype="int64"),
        "boundary_dollars": hist["dollars"].to_numpy()[idx]
        .astype("int64"),
        "cum_orders": cum[idx].astype("int64")})
    return out


def range_partition_plan_sql(k: int = 8) -> str:
    return f"""
WITH c AS (
  SELECT CAST(floor(o_totalprice) AS BIGINT) AS dollars,
         count(*) AS n
  FROM orders GROUP BY 1),
s AS (
  SELECT dollars,
         sum(n) OVER (ORDER BY dollars ROWS UNBOUNDED PRECEDING) AS cum
  FROM c),
t AS (SELECT CAST(sum(n) AS BIGINT) AS N FROM c),
g AS (SELECT CAST(unnest(range(1, {k})) AS BIGINT) AS i)
SELECT g.i AS split_idx,
       CAST(min(s.dollars) AS BIGINT) AS boundary_dollars,
       CAST(min_by(s.cum, s.dollars) AS BIGINT) AS cum_orders
FROM g, t, s
WHERE s.cum >= (g.i * t.N + {k - 1}) // {k}
GROUP BY g.i"""


_DICT_AUDIT_COLS = (("documents", "source"), ("documents", "lang"),
                    ("orders", "o_orderpriority"))


def dict_encoding_audit(sf_dir: str):
    """Storage-planning audit: for each candidate string column, the
    exact byte accounting that decides dictionary encoding — n_rows,
    n_distinct, raw value bytes (sum of lengths) and the dictionary's
    value-page bytes (sum of DISTINCT lengths); the codes themselves
    are n_rows * ceil(log2 n_distinct)/8, computed downstream —
    the "should this column be dict-encoded" answer a columnar writer
    needs per row group.

    Shape: per column, one zero-shuffle scan emits (sum-len, count)
    partials AND per-batch distinct values into a value-domain
    exchange whose per-block length sums fold driver-side.
    """
    import pandas as pd
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow

    rows = []
    for table, col in _DICT_AUDIT_COLS:
        ds = ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                   columns=[col])

        def raw_partial(t: pa.Table, c=col) -> pa.Table:
            return pa.table({
                "n_rows": pa.array([t.num_rows], pa.int64()),
                "raw_bytes": pa.array(
                    [int(pc.sum(pc.binary_length(
                        pc.cast(t.column(c), pa.string()))).as_py()
                        or 0)], pa.int64())})

        raw = collect_small_arrow(ds.map_batches(
            raw_partial, batch_format="pyarrow")).to_pandas().sum()

        def dvals(t: pa.Table, c=col) -> pa.Table:
            u = pc.unique(pc.cast(t.column(c), pa.string()))
            return pa.table({"v": u})

        dist = grouped_aggregate(
            ds.map_batches(dvals, batch_format="pyarrow"),
            ["v"], [("", "count", "n")])

        def dist_partial(t: pa.Table) -> pa.Table:
            return pa.table({
                "n_distinct": pa.array([t.num_rows], pa.int64()),
                "dict_value_bytes": pa.array(
                    [int(pc.sum(pc.binary_length(t.column("v")))
                         .as_py() or 0)], pa.int64())})

        d = collect_small_arrow(dist.map_batches(
            dist_partial, batch_format="pyarrow")).to_pandas().sum()
        rows.append({"column_name": f"{table}.{col}",
                     "n_rows": int(raw.n_rows),
                     "n_distinct": int(d.n_distinct),
                     "raw_bytes": int(raw.raw_bytes),
                     "dict_value_bytes": int(d.dict_value_bytes)})
    out = pd.DataFrame(rows)
    for c in ("n_rows", "n_distinct", "raw_bytes", "dict_value_bytes"):
        out[c] = out[c].astype("int64")
    return out


def dict_encoding_audit_sql() -> str:
    parts = []
    for table, col in _DICT_AUDIT_COLS:
        parts.append(f"""
SELECT '{table}.{col}' AS column_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT {col}) AS BIGINT) AS n_distinct,
       CAST(sum(length({col})) AS BIGINT) AS raw_bytes,
       CAST((SELECT sum(length(v)) FROM
             (SELECT DISTINCT {col} AS v FROM {table})) AS BIGINT)
         AS dict_value_bytes
FROM {table}""")
    return "\nUNION ALL\n".join(parts)


def multiformat_union_read(sf_dir: str, out_dir: str | None = None):
    """Heterogeneous-lake federated ingestion: the documents table is
    deterministically SPLIT into three format shards (doc_id % 3 ->
    parquet / JSONL / Arrow-IPC), each written with its native sink,
    then read back through the three format readers and UNIONED into
    one logical dataset whose per-lang accounting must equal the
    original table — the "mixed-format lake behind one Dataset" story
    a migration-era corpus always needs.

    Shape: three partition-pruned writes (one shard set per format),
    three streaming readers, one union, the shared per-lang
    accounting; nothing ever collects beyond lang-domain partials.
    """
    import json
    import os
    import shutil
    import tempfile

    import pyarrow.feather as feather
    import ray.data

    cleanup = out_dir is None
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="yjsv_multifmt_")
    pq_dir = os.path.join(out_dir, "pq")
    jl_dir = os.path.join(out_dir, "jl")
    fe_dir = os.path.join(out_dir, "fe")
    for d in (pq_dir, jl_dir, fe_dir):
        os.makedirs(d, exist_ok=True)

    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                                 columns=["doc_id", "lang", "text"])
    try:
        def write_shards(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column("doc_id"), pa.int64()).to_numpy()
            m = ids % 3
            parts = [t.filter(pa.array(m == r)) for r in range(3)]
            u = _block_shard_stem(t)
            import pyarrow.parquet as pqw

            if parts[0].num_rows:
                _atomic_write(
                    os.path.join(pq_dir, f"p-{u}.parquet"),
                    lambda p: pqw.write_table(parts[0], p))
            if parts[1].num_rows:
                def _write_jsonl(p):
                    with open(p, "w") as f:
                        for row in parts[1].to_pylist():
                            f.write(json.dumps(row) + "\n")
                _atomic_write(os.path.join(jl_dir, f"p-{u}.jsonl"),
                              _write_jsonl)
            if parts[2].num_rows:
                _atomic_write(
                    os.path.join(fe_dir, f"p-{u}.feather"),
                    lambda p: feather.write_feather(parts[2], p))
            return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

        manifest = docs.map_batches(write_shards, batch_size=None,
                                    batch_format="pyarrow").to_pandas()
        assert manifest["rows"].sum() > 0

        back_pq = ray.data.read_parquet(pq_dir,
                                        file_extensions=["parquet"])
        back_jl = ray.data.read_json(jl_dir, file_extensions=["jsonl"])

        def fe_decode(t: pa.Table) -> pa.Table:
            tabs = [feather.read_table(pa.BufferReader(b.as_py()))
                    for b in t.column("bytes")]
            return pa.concat_tables(tabs)

        back_fe = (ray.data.read_binary_files(
                       fe_dir, file_extensions=["feather"])
                   .map_batches(fe_decode, batch_format="pyarrow"))

        def norm(t: pa.Table) -> pa.Table:
            return pa.table({
                "doc_id": pc.cast(t.column("doc_id"), pa.int64()),
                "lang": pc.cast(t.column("lang"), pa.string()),
                "text": pc.cast(t.column("text"), pa.string())})

        unioned = (back_pq.map_batches(norm, batch_format="pyarrow")
                   .union(back_jl.map_batches(norm,
                                              batch_format="pyarrow"))
                   .union(back_fe.map_batches(norm,
                                              batch_format="pyarrow")))
        out = _lang_accounting(unioned)
        out = out.drop(columns=["text_xor"])
    finally:
        if cleanup:
            shutil.rmtree(out_dir, ignore_errors=True)
    return out


def multiformat_union_read_sql() -> str:
    return """
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY lang"""
