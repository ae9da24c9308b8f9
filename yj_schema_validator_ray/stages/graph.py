"""Distributed connected components over near-duplicate pair graphs.

Turning a dedup PAIR list into CLUSTERS (one representative per
transitive group) needs connected components — min-label ("hash-min")
propagation, the MapReduce CC shape (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14; plain hash-min is their
baseline): every node's label starts as its own id and each round takes
the min over its neighborhood.  Plain hash-min needs O(diameter)
rounds; each round here is followed by a POINTER-JUMPING shortcut
(label(v) <- label(label(v)), the classic Shiloach-Vishkin halving
step), which compresses label chains geometrically and brings the
round count to O(log diameter) — near-dup graphs are unions of
near-cliques (diameter 2-4) so they converge in 2-3 rounds either way,
but a pathological chain of borderline-similar docs no longer costs a
round per hop.

Scale shape: each round is three bounded all-to-all exchanges moving
(int64, int64) rows ONLY — adjacency is materialized once and never
re-derived, labels are re-materialized per round (16 bytes/row) to
truncate the iterative lineage, and convergence is detected with a
driver-side scalar (the exact label sum as an arbitrary-precision
Python int — no int64 wraparound at any id scale — strictly decreasing
until fixpoint).  No driver-side graph state at any size.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _exact_label_sum(labels_ds) -> int:
    """Exact (arbitrary-precision) sum of the ``label`` column.

    ``Dataset.sum`` accumulates in int64; with 2^63-scale ids the sum
    wraps and equality of wrapped sums could falsely signal a fixpoint.
    Per-batch partial sums are taken over an object-dtype view (exact
    Python ints) and combined on the driver — one tiny row per block.
    """
    total = 0
    partials = labels_ds.map_batches(
        lambda t: pa.table({"s": pa.array(
            [str(int(t.column("label").to_numpy(
                zero_copy_only=False).astype(object).sum()))
             if t.num_rows else "0"], pa.string())}),
        batch_format="pyarrow")
    for b in partials.iter_batches(batch_format="pyarrow"):
        for s in b.column("s").to_pylist():
            total += int(s)
    return total


def connected_components(pairs_ds, max_iters: int = 50, coarse: int = 1024):
    """``(a, b)`` undirected pair rows -> ``(doc_id, component)`` where
    ``component`` is the smallest doc_id reachable from ``doc_id``.
    Only nodes that appear in a pair are emitted (isolated docs are
    trivially their own component and are left to the caller).

    An empty pair graph returns a typed empty ``pyarrow.Table`` (Ray
    drops the schema of all-empty blocks, so a Dataset could not carry
    the output columns downstream).
    """
    from ..util import shuffle_partitions
    from .dedup import coarse_mix
    from .exact_agg import grouped_aggregate

    nparts = shuffle_partitions()

    def bounded(ds):
        """Materialize with a bounded block count.  Ray's sort-shuffle
        map_groups emits as many blocks as it READS, so an iterated
        exchange grows +N blocks per round (quadratic task-count blowup
        — measured 10x on a 16-block input); coalesce whenever the
        label table exceeds 2x the reducer count."""
        m = ds.materialize()
        if m.num_blocks() > 2 * nparts:
            m = m.repartition(nparts).materialize()
        return m

    def to_adj(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        node = np.concatenate([a, b])
        return pa.table({
            "node": pa.array(node, pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            # partition key precomputed ONCE — every propagation round
            # re-reads the materialized adjacency
            "__coarse": pa.array(coarse_mix(node, coarse - 1), pa.int64()),
        })

    adj = pairs_ds.map_batches(to_adj, batch_format="pyarrow").materialize()
    if adj.count() == 0:
        return pa.table({"doc_id": pa.array([], pa.int64()),
                         "component": pa.array([], pa.int64())})

    # round 0 fused with initialization: label(v) = min(v, min nbr(v))
    labels = grouped_aggregate(
        adj, ["node"], [("nbr", "min", "label")],
        coarse=coarse, num_partitions=nparts).map_batches(
            lambda t: pa.table({
                "node": t.column("node"),
                "label": pc.min_element_wise(t.column("node"),
                                             t.column("label")),
            }), batch_format="pyarrow")
    labels = bounded(labels)
    total = _exact_label_sum(labels)

    def _neg_ones(n: int) -> pa.Array:
        return pa.array(np.full(n, -1, np.int64()))

    def adj_side(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t.column("node"), "nbr": t.column("nbr"),
            "lbl": _neg_ones(t.num_rows),
            "__coarse": t.column("__coarse"),
        })

    def lbl_side(t: pa.Table) -> pa.Table:
        node = t.column("node")
        return pa.table({
            "node": node,
            "nbr": _neg_ones(t.num_rows),
            "lbl": t.column("label"),
            "__coarse": pa.array(coarse_mix(node.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def propagate(g: pd.DataFrame) -> pd.DataFrame:
        is_lbl = g["nbr"] < 0
        lbl = g.loc[is_lbl, ["node", "lbl"]]
        edges = g.loc[~is_lbl, ["node", "nbr"]].merge(lbl, on="node")
        # each node offers its label to every neighbor AND keeps its own
        return pd.DataFrame({
            "node": np.concatenate([edges["nbr"].to_numpy(),
                                    lbl["node"].to_numpy()]),
            "cand": np.concatenate([edges["lbl"].to_numpy(),
                                    lbl["lbl"].to_numpy()]),
        })

    # pointer-jumping shortcut: label(v) <- label(label(v)).  Every
    # label value IS a node with its own label row (labels are mins of
    # node-id sets), so a (query keyed by label) x (answer keyed by
    # node) exchange resolves each chain hop; label(x) <= x makes the
    # jumped value monotone, no min against the old label needed.
    def q_side(t: pa.Table) -> pa.Table:
        lbl = t.column("label")
        return pa.table({
            "k": lbl, "v": t.column("node"),
            "lbl": _neg_ones(t.num_rows),
            "__coarse": pa.array(coarse_mix(lbl.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def a_side(t: pa.Table) -> pa.Table:
        node = t.column("node")
        return pa.table({
            "k": node, "v": _neg_ones(t.num_rows),
            "lbl": t.column("label"),
            "__coarse": pa.array(coarse_mix(node.to_numpy(), coarse - 1),
                                 pa.int64()),
        })

    def resolve(g: pd.DataFrame) -> pd.DataFrame:
        is_a = g["v"] < 0
        ans = g.loc[is_a, ["k", "lbl"]]
        qs = g.loc[~is_a, ["k", "v"]].merge(ans, on="k")
        return pd.DataFrame({"node": qs["v"].to_numpy(),
                             "label": qs["lbl"].to_numpy()})

    for rnd in range(max_iters):
        u = (adj.map_batches(adj_side, batch_format="pyarrow")
             .union(labels.map_batches(lbl_side, batch_format="pyarrow")))
        offers = (u.groupby("__coarse", num_partitions=nparts)
                  .map_groups(propagate, batch_format="pandas"))
        # materialize: both jump sides read labels — without a
        # materialization the propagate exchange would execute twice
        labels = bounded(grouped_aggregate(
            offers, ["node"], [("cand", "min", "label")],
            coarse=coarse, num_partitions=nparts))
        if rnd > 0:
            # adaptive shortcut: near-clique dedup graphs converge in
            # round 0-1, where the extra exchange buys nothing; from
            # round 1 on, label chains exist and jumping compresses
            # them geometrically (O(log diameter) total rounds)
            jumped = (labels.map_batches(q_side, batch_format="pyarrow")
                      .union(labels.map_batches(a_side,
                                                batch_format="pyarrow"))
                      .groupby("__coarse", num_partitions=nparts)
                      .map_groups(resolve, batch_format="pandas"))
            labels = bounded(jumped)
        new_total = _exact_label_sum(labels)
        if new_total == total:  # fixpoint: no label moved anywhere
            break
        total = new_total
    else:
        raise RuntimeError(
            f"connected_components: no fixpoint after {max_iters} rounds "
            "— the pair graph's diameter exceeds the cap; raise max_iters")

    return labels.map_batches(
        lambda t: t.rename_columns(["doc_id", "component"]),
        batch_format="pyarrow")


def ngram_components(docs_ds, n: int = 3, threshold: float = 0.3):
    """Near-dup CLUSTERS of the exact n-gram Jaccard pair graph: the
    transitive closure the pairwise operators stop short of — what a
    keep-one-per-cluster 100 TB dedup actually consumes."""
    from .dedup import ngram_jaccard_exact_pairs

    pairs = ngram_jaccard_exact_pairs(docs_ds, n=n, threshold=threshold)
    return connected_components(pairs)


def ngram_components_sql(n: int = 3, threshold: float = 0.3) -> str:
    """DuckDB oracle for :func:`ngram_components`: the
    :func:`..stages.dedup.ngram_jaccard_exact_sql` pair CTE followed by a
    recursive min-label reachability closure."""
    assert n == 3, "oracle is written for trigram shape"
    return rf"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM toks, unnest(generate_series(1, len(ws) - {n - 1})) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE)
        >= {threshold}
),
edges AS (SELECT a, b FROM pairs UNION ALL SELECT b AS a, a AS b FROM pairs),
reach AS (
  SELECT a AS doc_id, a AS comp FROM edges
  UNION
  SELECT e.b AS doc_id, r.comp
  FROM reach r JOIN edges e ON e.a = r.doc_id
)
SELECT doc_id, min(comp) AS component FROM reach GROUP BY doc_id"""
