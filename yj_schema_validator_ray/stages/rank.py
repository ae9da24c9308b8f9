"""Distributed global ranking (dense ``row_number`` over the whole
dataset) without a global sort.

``row_number() OVER (ORDER BY key DESC, id)`` normally forces a total
sort — an all-to-all exchange of EVERY row through a range partitioner.
When the rank key is low-cardinality relative to the data (lengths,
scores, bucketed metrics — the usual case for quality ranking), the
two-phase histogram shape is strictly cheaper:

1. one exchange of (key, count) PARTIALS (pre-aggregated per batch, so
   the shuffle moves one row per distinct key per block);
2. the driver turns the key histogram into exclusive prefix offsets
   (state = distinct keys only — never row-scale);
3. one exchange of (id, key) 16-byte rows co-located BY KEY, where each
   key group sorts its ids and adds the broadcast offset.

Row data never moves; the big text/blob columns stay at rest.  At 100 TB
with a pathological near-unique key the histogram degrades toward row
count — ``max_distinct`` guards that cliff explicitly (use a bucketed
key or ``Dataset.sort`` when ranking by a continuous near-unique score).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def global_rank(ds, key_col: str, id_col: str, descending: bool = True,
                rank_col: str = "rank", max_distinct: int = 2_000_000):
    """(id, key) -> (id, key, rank) with rank = 1-based global
    ``row_number`` ordered by ``key`` (desc by default), ties broken by
    ascending ``id`` — deterministic and SQL-mirrorable."""
    import ray

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate

    proj = ds.map_batches(lambda t: t.select([id_col, key_col]),
                          batch_format="pyarrow").materialize()

    hist = grouped_aggregate(proj, [key_col], [("", "count", "n")],
                             num_partitions=min(8, shuffle_partitions())
                             ).to_pandas()
    if len(hist) > max_distinct:
        raise ValueError(
            f"global_rank: {len(hist):,} distinct {key_col!r} values "
            f"exceed max_distinct={max_distinct:,}; rank by a bucketed "
            "key or use Dataset.sort for continuous near-unique keys")
    hist = hist.sort_values(key_col, ascending=not descending)
    excl = np.concatenate(([0], np.cumsum(hist["n"].to_numpy())))[:-1]
    # broadcast as parallel sorted arrays (searchsorted probe) — a 2M-key
    # numpy pair ships and probes far cheaper than a Python dict
    keys_nat = hist[key_col].to_numpy()
    nat_order = np.argsort(keys_nat, kind="stable")
    ref = ray.put((keys_nat[nat_order], excl.astype(np.int64)[nat_order]))

    def rank_group(g: pd.DataFrame) -> pd.DataFrame:
        # one COARSE bucket per call (many keys): one vectorized lexsort
        # over the bucket, per-key offsets via searchsorted run starts —
        # no per-distinct-key Ray group (CLAUDE.md high-cardinality rule)
        keys_sorted, offs_sorted = ray.get(ref)
        if g.empty:
            # mirror the incoming group's key/id dtypes (string keys are
            # legal) so empty coarse buckets can't emit a divergent schema
            return pd.DataFrame({id_col: pd.Series(dtype=g[id_col].dtype),
                                 key_col: pd.Series(dtype=g[key_col].dtype),
                                 rank_col: pd.Series(dtype="int64")})
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        order = np.lexsort((ids, keys))
        keys, ids = keys[order], ids[order]
        starts = np.concatenate(([0], np.flatnonzero(
            keys[1:] != keys[:-1]) + 1))
        within = np.arange(len(ids), dtype=np.int64) \
            - np.repeat(starts, np.diff(np.concatenate((starts,
                                                        [len(ids)]))))
        base = offs_sorted[np.searchsorted(keys_sorted, keys)]
        return pd.DataFrame({id_col: ids, key_col: keys,
                             rank_col: (base + 1 + within).astype("int64")})

    from .exact_agg import hash_columns

    def add_coarse(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select([key_col]))
        return t.append_column(
            "__coarse", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    return (proj.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(rank_group, batch_format="pandas"))


def docs_length_rank(docs_ds, rank_col: str = "rank"):
    """Documents ranked globally by character length (longest first,
    doc_id ties ascending) — the quality-ranking shape a curation
    pipeline uses to keep the top-N% of a corpus."""
    def with_len(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "text_len": pc.cast(pc.utf8_length(t.column("text")),
                                pa.int64()),
        })

    import ray.data  # noqa: F401  (caller owns the session)

    return global_rank(docs_ds.map_batches(with_len,
                                           batch_format="pyarrow"),
                       key_col="text_len", id_col="doc_id",
                       rank_col=rank_col)


def docs_length_rank_sql(rank_col: str = "rank") -> str:
    return f"""
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS text_len,
       CAST(row_number() OVER (ORDER BY length(text) DESC, doc_id)
            AS BIGINT) AS {rank_col}
FROM documents"""


def quality_rank_fusion(docs_ds, k: int = 100):
    """RANK FUSION selection: combine two incomparable quality signals
    — the linear classifier score (model) and document length (proxy) —
    by summing each document's global rank under both orderings and
    keeping the ``k`` best fused ranks (the Cormack et al. reciprocal-
    rank-fusion family, in its integer sum-of-ranks form so the driver
    hash is exact).  Rank fusion is how curation pipelines blend
    signals whose scales don't compare (a logit vs a char count).

    Shape: two :func:`global_rank` passes (each a histogram exchange,
    no total sort), ONE doc-keyed coarse exchange co-locating each
    doc's two rank rows, per-group vectorized pivot to
    (rank_clf, rank_len, fused), per-block top-k pruning, and a tiny
    global sort over <= partitions*k rows.
    """
    import pandas as pd
    import ray.data  # noqa: F401

    from ..stages.classify import quality_classifier
    from ..stages.dedup import coarse_mix
    from ..util import shuffle_partitions

    scored = quality_classifier(docs_ds).map_batches(
        lambda t: t.select(["doc_id", "clf_score"]),
        batch_format="pyarrow")
    lens = docs_ds.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "text_len": pc.cast(pc.utf8_length(t.column("text")),
                                pa.int64())}),
        batch_format="pyarrow")
    r1 = global_rank(scored, "clf_score", "doc_id", rank_col="rnk")
    r2 = global_rank(lens, "text_len", "doc_id", rank_col="rnk")

    def tag(which: int):
        def f(t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column("doc_id"), pa.int64())
            return pa.table({
                "doc_id": ids,
                "rnk": pc.cast(t.column("rnk"), pa.int64()),
                "side": pa.array(np.full(t.num_rows, which, np.int64)),
                "__coarse": pa.array(coarse_mix(ids.to_numpy(), 1023),
                                     pa.int64()),
            })
        return f

    def fuse(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "rank_clf": pd.Series(dtype="int64"),
                                 "rank_len": pd.Series(dtype="int64"),
                                 "fused": pd.Series(dtype="int64")})
        p = g.pivot_table(index="doc_id", columns="side", values="rnk",
                          aggfunc="first")
        p = p.dropna()  # every doc has both rows; belt-and-braces
        out = pd.DataFrame({
            "doc_id": p.index.to_numpy().astype("int64"),
            "rank_clf": p[0].to_numpy().astype("int64"),
            "rank_len": p[1].to_numpy().astype("int64"),
        })
        out["fused"] = out["rank_clf"] + out["rank_len"]
        return out.sort_values(["fused", "doc_id"]).head(k)

    u = (r1.map_batches(tag(0), batch_format="pyarrow")
         .union(r2.map_batches(tag(1), batch_format="pyarrow")))
    fused = (u.groupby("__coarse", num_partitions=shuffle_partitions())
             .map_groups(fuse, batch_format="pandas"))
    return fused.sort(["fused", "doc_id"]).limit(k)


def quality_rank_fusion_sql(k: int = 100) -> str:
    from .classify import quality_classifier_sql

    return f"""
WITH clf AS ({quality_classifier_sql()}),
r1 AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY clf_score DESC, doc_id)
              AS BIGINT) AS rank_clf
  FROM clf
),
r2 AS (
  SELECT doc_id,
         CAST(row_number() OVER (ORDER BY length(text) DESC, doc_id)
              AS BIGINT) AS rank_len
  FROM documents
)
SELECT doc_id, rank_clf, rank_len,
       rank_clf + rank_len AS fused
FROM r1 JOIN r2 USING (doc_id)
ORDER BY fused, doc_id LIMIT {k}"""


def budget_select(ds, key_col: str, id_col: str, weight_col: str,
                  budget: int, descending: bool = True,
                  max_distinct: int = 2_000_000):
    """Global TOKEN-BUDGET selection: keep rows, in ``key_col`` order
    (desc by default, ties by ascending ``id_col``), while the running
    sum of ``weight_col`` stays <= ``budget`` — the "take the best
    documents until the token budget is spent" primitive of
    training-data mixing/selection pipelines.

    Same two-phase histogram shape as :func:`global_rank` (a global
    ORDER BY + cumulative window without a total sort):

    1. one exchange of per-key (count, weight_sum) PARTIALS;
    2. driver: exclusive prefix of weight_sums in key order (state =
       distinct keys only, ``max_distinct``-guarded);
    3. one exchange of (id, key, weight) rows co-located BY KEY; each
       key group sorts by id, adds the broadcast base to its in-group
       weight cumsum, and filters ``cum <= budget`` vectorized.

    Output: (id, key, weight, cum) for kept rows — ``cum`` INCLUDES the
    row's own weight (SQL ``ROWS UNBOUNDED PRECEDING`` inclusive frame).
    ``key_col == weight_col`` is legal (select-the-longest-first) and
    collapses the two output columns into one.
    """
    import ray

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    cols = list(dict.fromkeys([id_col, key_col, weight_col]))
    proj = ds.map_batches(lambda t: t.select(cols),
                          batch_format="pyarrow").materialize()

    hist = grouped_aggregate(
        proj, [key_col], [("", "count", "n"),
                          (weight_col, "sum", "w")],
        num_partitions=min(8, shuffle_partitions())).to_pandas()
    if len(hist) > max_distinct:
        raise ValueError(
            f"budget_select: {len(hist):,} distinct {key_col!r} values "
            f"exceed max_distinct={max_distinct:,}; bucket the key")
    hist = hist.sort_values(key_col, ascending=not descending)
    excl = np.concatenate(([0], np.cumsum(hist["w"].to_numpy())))[:-1]
    keys_nat = hist[key_col].to_numpy()
    nat_order = np.argsort(keys_nat, kind="stable")
    ref = ray.put((keys_nat[nat_order], excl.astype(np.int64)[nat_order]))

    def select_group(g: pd.DataFrame) -> pd.DataFrame:
        keys_sorted, base_sorted = ray.get(ref)
        if g.empty:
            return pd.DataFrame({
                id_col: pd.Series(dtype=g[id_col].dtype),
                key_col: pd.Series(dtype=g[key_col].dtype),
                weight_col: pd.Series(dtype="int64"),
                "cum": pd.Series(dtype="int64")})
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        w = g[weight_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, keys))
        keys, ids, w = keys[order], ids[order], w[order]
        starts = np.concatenate(([0], np.flatnonzero(
            keys[1:] != keys[:-1]) + 1))
        cs = np.cumsum(w)
        seg_base = np.repeat(
            np.concatenate(([0], cs[starts[1:] - 1])), np.diff(
                np.concatenate((starts, [len(w)]))))
        within = cs - seg_base  # inclusive in-key cumsum
        base = base_sorted[np.searchsorted(keys_sorted, keys)]
        cum = base + within
        keep = cum <= budget
        return pd.DataFrame({id_col: ids[keep],
                             key_col: keys[keep],
                             weight_col: w[keep],
                             "cum": cum[keep].astype("int64")})

    def add_coarse(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select([key_col]))
        return t.append_column(
            "__coarse", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    return (proj.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(select_group, batch_format="pandas"))


def docs_token_budget(docs_ds, budget: int = 20_000):
    """Documents selected longest-first under a global token budget —
    (doc_id, n_tokens, cum_tokens); the corpus-curation "fill the
    training budget with the best docs" gate."""
    from .text import WORD_RE

    def with_tokens(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), WORD_RE),
                pa.int64()),
        })

    out = budget_select(
        docs_ds.map_batches(with_tokens, batch_format="pyarrow"),
        key_col="n_tokens", id_col="doc_id", weight_col="n_tokens",
        budget=budget)
    return out.map_batches(
        lambda t: pa.table({
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
            "cum_tokens": t.column("cum"),
        }), batch_format="pyarrow")


def docs_token_budget_sql(budget: int = 20_000) -> str:
    return rf"""
WITH t AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY n_tokens DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {budget}"""


def grouped_budget_select(ds, group_col: str, key_col: str, id_col: str,
                          weight_col: str, budgets: dict,
                          max_distinct: int = 2_000_000):
    """PER-GROUP token-budget selection — the training-MIX shape: each
    source gets its own budget, filled with its best rows first
    (``key_col`` desc, ``id_col`` ties asc).  Groups absent from
    ``budgets`` are dropped (same contract as ``mixture_sample``).

    Same two-phase histogram machinery as :func:`budget_select`, keyed
    by (group, key): the driver state is the (group, key) domain
    (``max_distinct``-guarded), never row-scale; rows co-locate by
    hash of (group, key) so every (group, key) run reduces in one
    vectorized pass, with one dict probe per RUN (not per row).
    """
    import ray

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate, hash_columns

    cols = list(dict.fromkeys([group_col, id_col, key_col, weight_col]))
    proj = ds.map_batches(lambda t: t.select(cols),
                          batch_format="pyarrow").materialize()

    hist = grouped_aggregate(
        proj, [group_col, key_col], [(weight_col, "sum", "w")],
        num_partitions=min(8, shuffle_partitions())).to_pandas()
    if len(hist) > max_distinct:
        raise ValueError(
            f"grouped_budget_select: {len(hist):,} distinct "
            f"(group, key) pairs exceed {max_distinct:,}; bucket the key")
    hist = hist[hist[group_col].isin(budgets)]
    hist = hist.sort_values([group_col, key_col],
                            ascending=[True, False])
    excl = (hist.groupby(group_col, sort=False)["w"]
            .apply(lambda s: s.cumsum().shift(fill_value=0)))
    base_map = dict(zip(zip(hist[group_col], hist[key_col]),
                        np.asarray(excl, dtype=np.int64)))
    ref = ray.put((base_map, dict(budgets)))

    def select_group(g: pd.DataFrame) -> pd.DataFrame:
        bases, buds = ray.get(ref)
        out_cols = [group_col, id_col, key_col, weight_col]
        if g.empty:
            d = {c: pd.Series(dtype=g[c].dtype) for c in out_cols}
            d["cum"] = pd.Series(dtype="int64")
            return pd.DataFrame(d)
        g = g[g[group_col].isin(buds)]
        if g.empty:
            d = {c: pd.Series(dtype=object if c == group_col else "int64")
                 for c in out_cols}
            d["cum"] = pd.Series(dtype="int64")
            return pd.DataFrame(d)
        grp = g[group_col].to_numpy()
        keys = g[key_col].to_numpy()
        ids = g[id_col].to_numpy()
        w = g[weight_col].to_numpy().astype(np.int64)
        order = np.lexsort((ids, keys, grp))
        grp, keys, ids, w = grp[order], keys[order], ids[order], w[order]
        change = (keys[1:] != keys[:-1]) | (grp[1:] != grp[:-1])
        starts = np.concatenate(([0], np.flatnonzero(change) + 1))
        cs = np.cumsum(w)
        seg_base = np.repeat(
            np.concatenate(([0], cs[starts[1:] - 1])),
            np.diff(np.concatenate((starts, [len(w)]))))
        within = cs - seg_base
        base = np.repeat(
            np.fromiter((bases[(grp[s], keys[s])] for s in starts),
                        np.int64, len(starts)),
            np.diff(np.concatenate((starts, [len(w)]))))
        bud = np.repeat(
            np.fromiter((buds[grp[s]] for s in starts), np.int64,
                        len(starts)),
            np.diff(np.concatenate((starts, [len(w)]))))
        cum = base + within
        keep = cum <= bud
        return pd.DataFrame({group_col: grp[keep], id_col: ids[keep],
                             key_col: keys[keep], weight_col: w[keep],
                             "cum": cum[keep].astype("int64")})

    def add_coarse(t: pa.Table) -> pa.Table:
        kh = hash_columns(t.select([group_col, key_col]))
        return t.append_column(
            "__coarse", pa.array((kh & np.uint64(1023)).astype(np.int64)))

    return (proj.map_batches(add_coarse, batch_format="pyarrow")
            .groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(select_group, batch_format="pandas"))


def mixture_token_budget(docs_ds, budgets: dict | None = None):
    """Per-SOURCE token budgets filled longest-first — the data-mixing
    curation gate; (source, doc_id, n_tokens, cum_tokens)."""
    from .text import WORD_RE

    if budgets is None:
        budgets = {"src1": 20_000, "src2": 10_000, "src3": 5_000,
                   "src4": 2_000}

    def with_tokens(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": t.column("source"),
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(
                pc.count_substring_regex(t.column("text"), WORD_RE),
                pa.int64()),
        })

    out = grouped_budget_select(
        docs_ds.map_batches(with_tokens, batch_format="pyarrow"),
        group_col="source", key_col="n_tokens", id_col="doc_id",
        weight_col="n_tokens", budgets=budgets)
    return out.map_batches(
        lambda t: pa.table({
            "source": t.column("source"),
            "doc_id": t.column("doc_id"),
            "n_tokens": pc.cast(t.column("n_tokens"), pa.int64()),
            "cum_tokens": t.column("cum"),
        }), batch_format="pyarrow")


def mixture_token_budget_sql(budgets: dict | None = None) -> str:
    if budgets is None:
        budgets = {"src1": 20_000, "src2": 10_000, "src3": 5_000,
                   "src4": 2_000}
    cases = " ".join(f"WHEN '{s}' THEN {b}" for s, b in budgets.items())
    srcs = ", ".join(f"'{s}'" for s in budgets)
    return rf"""
WITH t AS (
  SELECT source, doc_id,
         CAST(len(regexp_extract_all(text, '\w+')) AS BIGINT) AS n_tokens
  FROM documents WHERE source IN ({srcs})
),
c AS (
  SELECT source, doc_id, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY n_tokens DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM t
)
SELECT source, doc_id, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= (CASE source {cases} END)"""
