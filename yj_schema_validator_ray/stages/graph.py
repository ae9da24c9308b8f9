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


def supplier_cooccurrence_edges(sf_dir: str, coarse: int = 1024):
    """Distinct supplier co-occurrence edges from ``lineitem``: an
    undirected edge (a < b) for every supplier pair that ships in the
    same order, plus the number of orders supporting it.  Columns
    ``(a, b, n_orders)``.

    Shape: per-batch distinct (order, supplier) partials -> one
    order-keyed coarse exchange -> per-order pair emission (basket
    sizes are bounded by order line counts, so the per-order self-join
    is tiny) -> a pair-keyed exact aggregate for global dedup.
    """
    import ray.data

    from ..util import shuffle_partitions
    from .dedup import coarse_mix
    from .exact_agg import grouped_aggregate

    def prep(t: pa.Table) -> pa.Table:
        d = (pa.table({
            "o": pc.cast(t.column("l_orderkey"), pa.int64()),
            "s": pc.cast(t.column("l_suppkey"), pa.int64())})
            .group_by(["o", "s"]).aggregate([]))
        return d.append_column(
            "__coarse",
            pa.array(coarse_mix(d.column("o").to_numpy(), coarse - 1),
                     pa.int64()))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["o", "s"]].drop_duplicates()
        m = d.merge(d, on="o")
        m = m[m["s_x"] < m["s_y"]]
        return pd.DataFrame({"a": m["s_x"].to_numpy(np.int64),
                             "b": m["s_y"].to_numpy(np.int64)})

    pair_rows = (ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])
        .map_batches(prep, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=shuffle_partitions())
        .map_groups(pairs, batch_format="pandas"))
    return grouped_aggregate(pair_rows, ["a", "b"],
                             [("a", "count", "n_orders")], coarse=coarse)


def triangle_counts(edges_ds, coarse: int = 1024):
    """Exact per-node triangle participation counts over an undirected
    graph given as DISTINCT edges ``(a, b)`` with ``a < b`` (int64 node
    ids < 2^31).  Returns ``(node, n_triangles)`` for nodes in >= 1
    triangle.

    The MapReduce triangle algorithm (Cohen, "Graph Twiddling in a
    MapReduce World", CiSE 2009; Suri & Vassilvitskii, WWW'11): orient
    each edge from its lower-(degree, id) endpoint — every node's
    OUT-degree is then O(sqrt(m)) — emit open triads (pairs of
    out-neighbors) per source, and close them against the edge set with
    one large-large co-location join on a packed (v, w) int64 key.
    Exchanges move int64 triples only; no adjacency ever materializes
    driver-side.
    """
    from ..util import shuffle_partitions
    from .dedup import coarse_mix
    from .exact_agg import grouped_aggregate

    edges = edges_ds.materialize()  # read 3x: degrees, triads, closure
    if edges.count() == 0:
        return pa.table({"node": pa.array([], pa.int64()),
                         "n_triangles": pa.array([], pa.int64())})

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            pc.cast(t.column("a"), pa.int64()).combine_chunks(),
            pc.cast(t.column("b"), pa.int64()).combine_chunks()])})

    degrees = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")], coarse=coarse)

    from .dimjoin import attach_dim_adaptive

    deg_a = degrees.map_batches(
        lambda t: t.rename_columns(["na", "deg_a"]), batch_format="pyarrow")
    deg_b = degrees.map_batches(
        lambda t: t.rename_columns(["nb", "deg_b"]), batch_format="pyarrow")
    ed = attach_dim_adaptive(
        attach_dim_adaptive(edges, "a", deg_a, "na", ["deg_a"], how="inner"),
        "b", deg_b, "nb", ["deg_b"], how="inner")

    def orient(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        if len(a) and max(a.max(initial=0), b.max(initial=0)) >= 1 << 31:
            raise ValueError("triangle_counts: node ids must be < 2^31")
        da = t.column("deg_a").to_numpy()
        db = t.column("deg_b").to_numpy()
        low_a = (da < db) | ((da == db) & (a < b))
        src = np.where(low_a, a, b)
        dst = np.where(low_a, b, a)
        return pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
            "__coarse": pa.array(coarse_mix(src, coarse - 1), pa.int64())})

    def triads(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["src", "dst"]]
        m = d.merge(d, on="src")
        m = m[m["dst_x"] < m["dst_y"]]
        v = m["dst_x"].to_numpy(np.int64)
        w = m["dst_y"].to_numpy(np.int64)
        return pd.DataFrame({"k": (v << 32) | w,
                             "u": m["src"].to_numpy(np.int64)})

    triad_ds = (ed.map_batches(orient, batch_format="pyarrow")
                .groupby("__coarse", num_partitions=shuffle_partitions())
                .map_groups(triads, batch_format="pandas"))

    def edge_keys(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy()
        b = pc.cast(t.column("b"), pa.int64()).to_numpy()
        return pa.table({"k": pa.array((a << 32) | b, pa.int64()),
                         "hit": pa.array(np.ones(len(a), np.int64))})

    from .dimjoin import colocate_join

    closed = colocate_join(
        triad_ds, edges.map_batches(edge_keys, batch_format="pyarrow"),
        "k", "k",
        schemas=(pa.schema([("k", pa.int64()), ("u", pa.int64())]),
                 pa.schema([("k", pa.int64()), ("hit", pa.int64())])))

    def fan3(t: pa.Table) -> pa.Table:
        k = pc.cast(t.column("k"), pa.int64()).to_numpy()
        u = pc.cast(t.column("u"), pa.int64()).to_numpy()
        v = k >> 32
        w = k & ((1 << 32) - 1)
        return pa.table({"node": pa.array(np.concatenate([u, v, w]),
                                          pa.int64())})

    return grouped_aggregate(
        closed.map_batches(fan3, batch_format="pyarrow"),
        ["node"], [("node", "count", "n_triangles")], coarse=coarse)


def supplier_triangles(sf_dir: str, min_support: int = 1):
    """Per-supplier triangle counts of the order-co-occurrence graph —
    the clustering-structure audit of the trade network (tightly-knit
    supplier groups ship together transitively).  Columns
    ``(s_suppkey, n_triangles)``.

    ``min_support`` drops edges backed by fewer than that many orders
    BEFORE triangle closure.  Triangle counting is inherently
    Theta(sum d_out^2): this synthetic corpus draws suppliers uniformly
    per order, so its co-occurrence graph approaches COMPLETE at scale
    (sf0.1: 454k of the 500k possible edges — and a near-complete
    graph's triangle count is Theta(n^3), i.e. the ANSWER is huge no
    matter the algorithm).  Real co-occurrence graphs are power-law
    sparse; the support threshold is the standard densification guard
    (and is what the bench measures at replicated scale)."""
    edges = supplier_cooccurrence_edges(sf_dir)
    if min_support > 1:
        edges = edges.map_batches(
            lambda t, s=min_support: t.filter(
                pc.greater_equal(t.column("n_orders"),
                                 pa.scalar(s, pa.int64()))),
            batch_format="pyarrow")
    edges = edges.map_batches(
        lambda t: t.select(["a", "b"]), batch_format="pyarrow")
    out = triangle_counts(edges)
    if isinstance(out, pa.Table):  # empty-graph fast path
        return out.rename_columns(["s_suppkey", "n_triangles"])
    return out.map_batches(
        lambda t: t.rename_columns(["s_suppkey", "n_triangles"]),
        batch_format="pyarrow")


def supplier_triangles_sql(min_support: int = 1) -> str:
    """Oracle: distinct co-occurrence pairs, canonical u<v<w triangle
    enumeration by a double pair self-join, then a 3-way node unnest."""
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {min_support}
),
tri AS (
  SELECT e1.x AS u, e1.y AS v, e2.y AS w
  FROM pairs e1
  JOIN pairs e2 ON e2.x = e1.y
  JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y
),
nodes AS (
  SELECT u AS s FROM tri
  UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri
)
SELECT s AS s_suppkey, CAST(count(*) AS BIGINT) AS n_triangles
FROM nodes GROUP BY s"""


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


def graph_assortativity(sf_dir: str, min_support: int = 5):
    """Degree-assortativity SUFFICIENT STATISTICS of the supplier
    co-occurrence graph: over the (support-thresholded) edge set, the
    exact integer Newman numerators — n_edges, sum(du*dv),
    sum(du+dv), sum(du^2+dv^2) — from which the fp assortativity
    coefficient r = (M*Σdudv − (Σd/2)²·4/M…) is computed downstream.
    Positive r = hubs link hubs; the mixing-structure audit next to
    the triangle/PageRank/HITS family.

    Shape: the shared edge builder (one orderkey-keyed exchange),
    a node-domain degree aggregate, two adaptive degree attaches
    (the triangle_counts pattern), then single-row per-batch partials.
    """
    from ..util import collect_small_arrow
    from .dimjoin import attach_dim_adaptive
    from .exact_agg import grouped_aggregate

    edges = supplier_cooccurrence_edges(sf_dir)
    edges = edges.map_batches(
        lambda t, s=min_support: t.filter(
            pc.greater_equal(t.column("n_orders"),
                             pa.scalar(s, pa.int64())))
        .select(["a", "b"]), batch_format="pyarrow").materialize()

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            pc.cast(t.column("a"), pa.int64()).combine_chunks(),
            pc.cast(t.column("b"), pa.int64()).combine_chunks()])})

    degrees = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")])
    deg_a = degrees.map_batches(
        lambda t: t.rename_columns(["na", "deg_a"]),
        batch_format="pyarrow")
    deg_b = degrees.map_batches(
        lambda t: t.rename_columns(["nb", "deg_b"]),
        batch_format="pyarrow")
    ed = attach_dim_adaptive(
        attach_dim_adaptive(edges, "a", deg_a, "na", ["deg_a"],
                            how="inner"),
        "b", deg_b, "nb", ["deg_b"], how="inner")

    def partial(t: pa.Table) -> pa.Table:
        du = t.column("deg_a").to_numpy().astype(np.int64)
        dv = t.column("deg_b").to_numpy().astype(np.int64)
        return pa.table({
            "n_edges": pa.array([len(du)], pa.int64()),
            "sum_dudv": pa.array([int((du * dv).sum())], pa.int64()),
            "sum_d": pa.array([int((du + dv).sum())], pa.int64()),
            "sum_d2": pa.array([int((du * du + dv * dv).sum())],
                               pa.int64())})

    s = collect_small_arrow(ed.map_batches(
        partial, batch_format="pyarrow")).to_pandas().sum()
    import pandas as pd

    return pd.DataFrame({
        "n_edges": pd.Series([int(s.n_edges)], dtype="int64"),
        "sum_dudv": pd.Series([int(s.sum_dudv)], dtype="int64"),
        "sum_d": pd.Series([int(s.sum_d)], dtype="int64"),
        "sum_d2": pd.Series([int(s.sum_d2)], dtype="int64")})


def graph_assortativity_sql(min_support: int = 5) -> str:
    return f"""
WITH li AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
pairs AS (
  SELECT a.l_suppkey AS x, b.l_suppkey AS y
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2 HAVING count(*) >= {min_support}),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT x AS node FROM pairs
        UNION ALL SELECT y FROM pairs)
  GROUP BY node),
e AS (
  SELECT dx.d AS du, dy.d AS dv
  FROM pairs p JOIN deg dx ON dx.node = p.x
               JOIN deg dy ON dy.node = p.y)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(du * dv) AS BIGINT) AS sum_dudv,
       CAST(sum(du + dv) AS BIGINT) AS sum_d,
       CAST(sum(du * du + dv * dv) AS BIGINT) AS sum_d2
FROM e"""


# ---------------------------------------------------------------------------
# k-core decomposition over the part co-purchase graph
# ---------------------------------------------------------------------------

def part_kcore(sf_dir: str, k: int = 3, rounds: int = 16,
               min_support: int = 2, max_basket: int = 32):
    """k-core decomposition (Seidman 1983; the Batagelj-Zaversnik peel
    expressed as parallel rounds): repeatedly delete every node whose
    degree among SURVIVING nodes is < ``k``; after ``rounds`` parallel
    peels, report each core member's within-core degree — the standard
    "dense cohesive subgraph" primitive (spam/community cores over
    co-occurrence graphs).

    The graph is the :func:`..pipelines.olap_events2.basket_pairs` edge
    relation (unordered part pairs co-purchased in >= ``min_support``
    orders, mega-baskets > ``max_basket`` dropped — the documented
    densification guard), REUSED so graph and market-basket families
    share one driver-green edge derivation.

    Scale shape: edges are materialized ONCE as int64 (p1, p2) and every
    peel round is one linear map over them — alive-set membership tests
    ride a BROADCAST bitset over the part-key DOMAIN (1 bit per possible
    key: 2^31 keys cap = 256 MiB, budget-guarded; the catalog dimension
    of the corpus, not the row count), per-batch degree partials are
    sparse (node, d) int64 rows, and one exact node-keyed aggregate per
    round merges them.  The shrinking survivor id set the driver folds
    into the next bitset is part-domain-sized — the same domain-sized
    driver-state budget every constraint op documents.  Rounds stop
    early at the fixed point (identical result: further peels are
    no-ops), so the common case pays ~core-depth rounds, not ``rounds``.
    """
    import ray.data  # noqa: F401  (Dataset machinery via basket_pairs)

    from ..pipelines.olap_events2 import basket_pairs
    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    edges = basket_pairs(sf_dir, min_support=min_support,
                         max_basket=max_basket).map_batches(
        lambda t: t.select(["p1", "p2"]), batch_format="pyarrow"
    ).materialize()

    bt = collect_small_arrow(edges.map_batches(
        lambda t: pa.table({"mx": pa.array(
            [max(int(pc.max(t.column("p1")).as_py() or 0),
                 int(pc.max(t.column("p2")).as_py() or 0))]
            if t.num_rows else [], pa.int64())}),
        batch_format="pyarrow"))
    mx = max(bt.column("mx").to_pylist(), default=-1)
    if mx < 0:
        return pa.table({"part": pa.array([], pa.int64()),
                         "core_deg": pa.array([], pa.int64())})
    if mx >= (1 << 31):
        raise ValueError("part_kcore: part keys outside [0, 2^31) — the "
                         "broadcast bitset budget (256 MiB) is exceeded; "
                         "remap keys before peeling")
    nbytes = (mx + 1 + 7) // 8

    def degrees(bits_arr: np.ndarray):
        """Linear pass: per-batch sparse degree partials over edges whose
        BOTH endpoints are alive in the broadcast bitset (``ray.put``
        once per round; workers read it zero-copy from the object
        store — never per-task closure bytes)."""
        import ray

        bits_ref = ray.put(bits_arr)

        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0:
                return pa.table({"node": pa.array([], pa.int64()),
                                 "d": pa.array([], pa.int64())})
            bits = ray.get(bits_ref)
            p1 = t.column("p1").to_numpy(zero_copy_only=False)
            p2 = t.column("p2").to_numpy(zero_copy_only=False)
            a1 = (bits[p1 >> 3] >> (p1 & 7).astype(np.uint8)) & 1
            a2 = (bits[p2 >> 3] >> (p2 & 7).astype(np.uint8)) & 1
            m = (a1 & a2).astype(bool)
            node, d = np.unique(np.concatenate([p1[m], p2[m]]),
                                return_counts=True)
            return pa.table({"node": pa.array(node, pa.int64()),
                             "d": pa.array(d.astype(np.int64), pa.int64())})

        return grouped_aggregate(
            edges.map_batches(partial, batch_format="pyarrow"),
            ["node"], [("d", "sum", "d")])

    def to_bits(nodes: np.ndarray) -> np.ndarray:
        bits = np.zeros(nbytes, np.uint8)
        np.bitwise_or.at(bits, nodes >> 3,
                         (np.uint8(1) << (nodes & 7).astype(np.uint8)))
        return bits

    alive = np.full(nbytes, 0xFF, np.uint8)  # n0 is implicit: only edge
    # endpoints ever earn a degree row, so all-ones == "every endpoint"
    for _ in range(rounds):
        deg = degrees(alive)
        surv = collect_small_arrow(deg.map_batches(
            lambda t: t.filter(pc.greater_equal(
                t.column("d"), pa.scalar(k, pa.int64()))).select(["node"]),
            batch_format="pyarrow"))
        nodes = (surv.column("node").to_numpy(zero_copy_only=False)
                 if surv.num_rows else np.empty(0, np.int64))
        nxt = to_bits(nodes)
        if np.array_equal(nxt, alive):
            break  # fixed point — remaining peels are no-ops
        alive = nxt

    final = degrees(alive)
    return final.map_batches(
        lambda t: pa.table({"part": t.column("node"),
                            "core_deg": pc.cast(t.column("d"), pa.int64())}),
        batch_format="pyarrow")


def part_kcore_sql(k: int = 3, rounds: int = 16, min_support: int = 2,
                   max_basket: int = 32) -> str:
    """Unrolled parallel-peel CTE over the same basket_pairs edge
    relation; survivor CTEs are MATERIALIZED (each round references the
    previous one multiple times — default inlining would expand 4^rounds
    subtrees)."""
    base = f"""
WITH li AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                  CAST(l_partkey AS BIGINT) AS p
  FROM lineitem),
ok AS (SELECT o FROM li GROUP BY o HAVING count(*) <= {int(max_basket)}),
e AS MATERIALIZED (
  SELECT a.p AS p1, b.p AS p2
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p JOIN ok ON ok.o = a.o
  GROUP BY p1, p2 HAVING count(*) >= {int(min_support)}),
n0 AS MATERIALIZED (SELECT p1 AS node FROM e UNION SELECT p2 FROM e)"""
    parts = [base]
    for i in range(1, rounds + 1):
        parts.append(f""",
n{i} AS MATERIALIZED (
  SELECT node FROM (
    SELECT node, count(*) AS d FROM (
      SELECT p1 AS node FROM e
      WHERE p1 IN (SELECT node FROM n{i-1})
        AND p2 IN (SELECT node FROM n{i-1})
      UNION ALL
      SELECT p2 FROM e
      WHERE p1 IN (SELECT node FROM n{i-1})
        AND p2 IN (SELECT node FROM n{i-1})
    ) GROUP BY node) WHERE d >= {int(k)})""")
    parts.append(f"""
SELECT node AS part, CAST(count(*) AS BIGINT) AS core_deg FROM (
  SELECT p1 AS node FROM e
  WHERE p1 IN (SELECT node FROM n{rounds})
    AND p2 IN (SELECT node FROM n{rounds})
  UNION ALL
  SELECT p2 FROM e
  WHERE p1 IN (SELECT node FROM n{rounds})
    AND p2 IN (SELECT node FROM n{rounds})
) GROUP BY node""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# local clustering coefficient (integer triple: deg / wedges / triangles)
# ---------------------------------------------------------------------------
# local clustering coefficient (integer triple: deg / wedges / triangles)
# ---------------------------------------------------------------------------

def _basket_edges(sf_dir: str, min_support: int, max_basket: int):
    """The shared part co-purchase edge relation (a, b int64, a < b) —
    the same :func:`..pipelines.olap_events2.basket_pairs` derivation
    :func:`part_kcore` rides, so every part-graph operator certifies
    ONE driver-green edge definition."""
    from ..pipelines.olap_events2 import basket_pairs

    return basket_pairs(sf_dir, min_support=min_support,
                        max_basket=max_basket).map_batches(
        lambda t: t.select(["p1", "p2"]).rename_columns(["a", "b"]),
        batch_format="pyarrow").materialize()


_BASKET_EDGE_CTE = """
WITH li AS (
  SELECT DISTINCT CAST(l_orderkey AS BIGINT) AS o,
                  CAST(l_partkey AS BIGINT) AS p
  FROM lineitem),
ok AS (SELECT o FROM li GROUP BY o HAVING count(*) <= {max_basket}),
pairs AS MATERIALIZED (
  SELECT a.p AS x, b.p AS y
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p JOIN ok ON ok.o = a.o
  GROUP BY x, y HAVING count(*) >= {min_support})"""


def part_clustering(sf_dir: str, min_support: int = 2,
                    max_basket: int = 32):
    """Per-node local clustering-coefficient NUMERATORS over the part
    co-purchase graph: for every part, its degree, wedge count
    d(d-1)/2, and triangle participation count — lcc(v) =
    n_triangles / n_wedges stays a consumer-side rational, so the
    whole output is exact int64 (the repo's no-float-aggregates
    discipline; Watts-Strogatz 1998 for the metric).

    Shape: REUSES the :func:`part_kcore` edge relation (one
    driver-green basket derivation for the whole part-graph family)
    and the O(sqrt(m)) degree-oriented triangle closure
    (:func:`triangle_counts`), adds one endpoint-keyed degree
    aggregate, and stitches triangles onto degrees with the
    size-adaptive dimension attach (both tables are node-domain-
    sized) — triangle-free nodes keep a 0 via the left attach.
    """
    from .dimjoin import attach_dim_adaptive
    from .exact_agg import grouped_aggregate

    edges = _basket_edges(sf_dir, min_support, max_basket)

    def endpoints(t: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            pc.cast(t.column("a"), pa.int64()).combine_chunks(),
            pc.cast(t.column("b"), pa.int64()).combine_chunks()])})

    degrees = grouped_aggregate(
        edges.map_batches(endpoints, batch_format="pyarrow"),
        ["node"], [("node", "count", "deg")])

    tri = triangle_counts(edges)
    if isinstance(tri, pa.Table):  # empty-graph fast path
        import ray.data

        tri = ray.data.from_arrow(tri)

    joined = attach_dim_adaptive(degrees, "node", tri, "node",
                                 ["n_triangles"], how="left")

    def present(t: pa.Table) -> pa.Table:
        d = pc.cast(t.column("deg"), pa.int64()).to_numpy(
            zero_copy_only=False)
        tr = t.column("n_triangles").to_numpy(zero_copy_only=False)
        tr = np.nan_to_num(tr.astype(np.float64)).astype(np.int64) \
            if tr.dtype.kind == "f" else tr.astype(np.int64)
        return pa.table({
            "part": pc.cast(t.column("node"), pa.int64()),
            "deg": pa.array(d, pa.int64()),
            "n_wedges": pa.array(d * (d - 1) // 2, pa.int64()),
            "n_triangles": pa.array(tr, pa.int64())})

    return joined.map_batches(present, batch_format="pyarrow")


def part_clustering_sql(min_support: int = 2, max_basket: int = 32) -> str:
    cte = _BASKET_EDGE_CTE.format(min_support=int(min_support),
                                  max_basket=int(max_basket))
    return cte + """,
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS deg
  FROM (SELECT x AS node FROM pairs UNION ALL SELECT y FROM pairs)
  GROUP BY node),
tri AS (
  SELECT e1.x AS u, e1.y AS v, e2.y AS w
  FROM pairs e1
  JOIN pairs e2 ON e2.x = e1.y
  JOIN pairs e3 ON e3.x = e1.x AND e3.y = e2.y),
tcnt AS (
  SELECT s, CAST(count(*) AS BIGINT) AS n_triangles
  FROM (SELECT u AS s FROM tri UNION ALL SELECT v FROM tri
        UNION ALL SELECT w FROM tri)
  GROUP BY s)
SELECT CAST(deg.node AS BIGINT) AS part, deg.deg,
       CAST(deg.deg * (deg.deg - 1) // 2 AS BIGINT) AS n_wedges,
       CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles
FROM deg LEFT JOIN tcnt t ON t.s = deg.node"""


# ---------------------------------------------------------------------------
# two-hop neighborhood size (friends-of-friends candidate reach)
# ---------------------------------------------------------------------------

def part_two_hop(sf_dir: str, min_support: int = 2, max_basket: int = 32):
    """Distinct <=2-hop reach per node over the part co-purchase graph
    — (part, n_1hop, n_2hop) where ``n_2hop`` counts distinct OTHER
    nodes at distance 1 or 2.  This is the friends-of-friends
    candidate-generation primitive (what a co-purchase recommender can
    reach through one intermediary).

    Shape: symmetrized edges key ONE exchange by the MID node — within
    a mid's group every ordered neighbor pair (u, w), u != w, certifies
    dist(u, w) <= 2 — unioned with the direct pairs (distance 1 need
    not share a mid); a pair-keyed exact aggregate dedups candidate
    pairs across mids, and a node-keyed count + the adaptive degree
    attach finish.  Per-mid emission is Theta(d(mid)^2) — bounded by
    the same ``max_basket`` densification guard the edge relation
    applies — and the candidate pair domain is n_nodes^2 at worst,
    never row-count-scale.
    """
    from ..util import shuffle_partitions
    from .dedup import coarse_mix
    from .dimjoin import attach_dim_adaptive
    from .exact_agg import grouped_aggregate

    edges = _basket_edges(sf_dir, min_support, max_basket)

    def symmetrize(t: pa.Table) -> pa.Table:
        a = pc.cast(t.column("a"), pa.int64()).to_numpy(
            zero_copy_only=False)
        b = pc.cast(t.column("b"), pa.int64()).to_numpy(
            zero_copy_only=False)
        mid = np.concatenate([a, b])
        return pa.table({
            "mid": pa.array(mid, pa.int64()),
            "nbr": pa.array(np.concatenate([b, a]), pa.int64()),
            "__coarse": pa.array(coarse_mix(mid), pa.int64())})

    sym = edges.map_batches(symmetrize, batch_format="pyarrow").materialize()

    def mid_pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = g[["mid", "nbr"]].drop_duplicates()
        m = d.merge(d, on="mid")
        m = m[m["nbr_x"] != m["nbr_y"]]
        out = pd.concat([
            pd.DataFrame({"u": m["nbr_x"].to_numpy(np.int64),
                          "w": m["nbr_y"].to_numpy(np.int64)}),
            pd.DataFrame({"u": d["mid"].to_numpy(np.int64),
                          "w": d["nbr"].to_numpy(np.int64)})],
            ignore_index=True)
        return out.drop_duplicates()

    cand = (sym.groupby("__coarse", num_partitions=shuffle_partitions())
            .map_groups(mid_pairs, batch_format="pandas"))
    dedup = grouped_aggregate(cand, ["u", "w"], [("u", "count", "__m")])
    reach = grouped_aggregate(
        dedup.map_batches(lambda t: t.select(["u"]), batch_format="pyarrow"),
        ["u"], [("u", "count", "n_2hop")])

    degrees = grouped_aggregate(
        sym.map_batches(lambda t: t.select(["mid"]), batch_format="pyarrow"),
        ["mid"], [("mid", "count", "n_1hop")])

    joined = attach_dim_adaptive(degrees, "mid", reach, "u",
                                 ["n_2hop"], how="inner")
    return joined.map_batches(
        lambda t: pa.table({
            "part": pc.cast(t.column("mid"), pa.int64()),
            "n_1hop": pc.cast(t.column("n_1hop"), pa.int64()),
            "n_2hop": pc.cast(t.column("n_2hop"), pa.int64())}),
        batch_format="pyarrow")


def part_two_hop_sql(min_support: int = 2, max_basket: int = 32) -> str:
    cte = _BASKET_EDGE_CTE.format(min_support=int(min_support),
                                  max_basket=int(max_basket))
    return cte + """,
ed AS MATERIALIZED (
  SELECT x AS u, y AS v FROM pairs UNION ALL SELECT y, x FROM pairs),
cand AS (
  SELECT DISTINCT u, w FROM (
    SELECT a.v AS u, b.v AS w
    FROM ed a JOIN ed b ON a.u = b.u AND a.v <> b.v
    UNION ALL
    SELECT u, v AS w FROM ed)),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS n_1hop FROM ed GROUP BY u),
reach AS (SELECT u, CAST(count(*) AS BIGINT) AS n_2hop FROM cand GROUP BY u)
SELECT CAST(deg.u AS BIGINT) AS part, deg.n_1hop, reach.n_2hop
FROM deg JOIN reach ON reach.u = deg.u"""
