"""Exact integer PageRank over the customer<->supplier trade graph —
the iterative-update showcase (power iteration), kept bit-exact against
a SQL oracle by doing ALL arithmetic in order-free int64.

Formulation: nodes are customers and suppliers that trade (node id =
2*custkey / 2*suppkey+1); each DISTINCT (customer, supplier) lineitem
relationship contributes edges BOTH ways, so the walk is over the
symmetrized trade graph (no dangling nodes: every node in the graph
has out-degree >= 1 by construction).  Ranks are integers scaled by
``scale``:

    r_0(v)   = scale // N
    r_{t+1}(v) = (15*scale) // (100*N)
                 + sum_{u->v} (85 * r_t(u)) // (100 * deg(u))

Every term is an int64 (floor) expression and the per-node sum is an
integer sum — summation ORDER cannot change the result, which is what
makes a distributed power iteration hash-identical to DuckDB's
unrolled-CTE evaluation of the same recurrence.  (Classic float
PageRank would diverge in the last ulps across partitionings; the
floor-quantized variant loses < deg ulps of mass per node per round,
irrelevant for ranking and exactly mirrored in SQL.)

Scale shape: the adjacency (edge, degree) working set is built ONCE
through order-key co-location joins and materialized (int64 rows only
— the pattern of :mod:`.graph`); each of the ``iters`` rounds is one
edge<->rank co-location join plus one destination-keyed exchange of
int64 partials.  Nothing row-scale ever reaches the driver; the only
driver scalars are N and the two closed-form constants.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SCALE = 1_000_000_000_000


def trade_pagerank(sf_dir: str, iters: int = 3, scale: int = SCALE):
    """(kind, node_key, rank_q) after ``iters`` exact integer power
    iterations over the symmetrized customer<->supplier graph."""
    import ray.data

    from ..stages.dimjoin import colocate_join
    from ..stages.exact_agg import grouped_aggregate

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
        })

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
        })

    joined = colocate_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    def pair_part(t: pa.Table) -> pa.Table:
        return pa.table({"c": t.column("o_custkey"),
                         "s": t.column("l_suppkey")})

    pairs = grouped_aggregate(
        joined.map_batches(pair_part, batch_format="pyarrow"),
        ["c", "s"], [("", "count", "__m")])

    def symmetrize(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        cn, sn = c * 2, s * 2 + 1
        return pa.table({
            "src": pa.array(np.concatenate([cn, sn])),
            "dst": pa.array(np.concatenate([sn, cn])),
        })

    from ..util import shuffle_partitions

    nparts = shuffle_partitions()

    def bounded(ds):
        """Materialize with a bounded block count: Ray's sort-shuffle
        map_groups emits as many blocks as it READS, so without this
        the rank table gains +|ewd blocks| blocks per round and the
        per-round exchange cost grows quadratically (measured 20 ->
        46 -> 91 s/round at sf0.1; bounded it is flat).  Same guard as
        :func:`.graph.connected_components`."""
        m = ds.materialize()
        if m.num_blocks() > 2 * nparts:
            m = m.repartition(nparts).materialize()
        return m

    from .dedup import coarse_mix

    COARSE = 1024

    # ONE src-keyed exchange builds the static adjacency: out-degree is
    # computed in place per co-located group and one SEED row per node
    # (dst = -1 sentinel) rides along, so neither a degree join nor a
    # separate node-list pass exists.  Adjacency blocks carry their
    # precomputed __coarse and are materialized once — every round
    # reuses them as-is (the .graph adjacency discipline); the union
    # schema is pure int64 (sentinels, not nulls), so rounds never pay
    # pandas nullable-dtype restores.
    def key_edges(t: pa.Table) -> pa.Table:
        src = t.column("src").to_numpy()
        return t.append_column("__coarse", pa.array(
            coarse_mix(src, COARSE - 1), pa.int64()))

    def build_adj(g: pd.DataFrame) -> pd.DataFrame:
        deg = g.groupby("src", sort=False)["dst"].transform("size")
        seeds = g.drop_duplicates("src")
        return pd.DataFrame({
            "src": np.concatenate([g["src"].to_numpy(),
                                   seeds["src"].to_numpy()]),
            "dst": np.concatenate([
                g["dst"].to_numpy(),
                np.full(len(seeds), -1, np.int64)]),
            "deg": np.concatenate([
                deg.to_numpy(np.int64),
                np.zeros(len(seeds), np.int64)]),
            "r": np.full(len(g) + len(seeds), -1, np.int64),
            "__coarse": np.concatenate([g["__coarse"].to_numpy(),
                                        seeds["__coarse"].to_numpy()]),
        })

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    adj_full = bounded(
        edges.map_batches(key_edges, batch_format="pyarrow")
        .groupby("__coarse", num_partitions=nparts)
        .map_groups(build_adj, batch_format="pandas"))
    adj = bounded(adj_full.filter(expr="dst >= 0"))
    seeds = bounded(adj_full.filter(expr="dst < 0"))
    n_nodes = seeds.count()

    r0 = scale // n_nodes
    base = (15 * scale) // (100 * n_nodes)

    def init_rank(t: pa.Table) -> pa.Table:
        n = t.num_rows
        return pa.table({
            "src": t.column("src"),
            "dst": pa.array(np.full(n, -1, np.int64)),
            "deg": pa.array(np.zeros(n, np.int64)),
            "r": pa.array(np.full(n, r0, np.int64)),
            "__coarse": t.column("__coarse"),
        })

    rank = seeds.map_batches(init_rank, batch_format="pyarrow")

    def step(g: pd.DataFrame) -> pd.DataFrame:
        """One co-located group: route each node's quantum along its
        out-edges and pre-aggregate by destination before the dst
        exchange."""
        is_rank = g["dst"] < 0
        rk = g.loc[is_rank, ["src", "r"]]
        ed = g.loc[~is_rank, ["src", "dst", "deg"]].merge(
            rk, on="src", how="inner")
        x = (85 * ed["r"].to_numpy(np.int64)) \
            // (100 * ed["deg"].to_numpy(np.int64))
        out = (pd.DataFrame({"dst": ed["dst"].to_numpy(np.int64), "x": x})
               .groupby("dst", sort=False, as_index=False)["x"].sum())
        out["x"] = out["x"].astype("int64")
        return out

    for _ in range(iters):
        contrib = (adj.union(rank)
                   .groupby("__coarse", num_partitions=nparts)
                   .map_groups(step, batch_format="pandas"))
        agg = grouped_aggregate(contrib, ["dst"], [("x", "sum", "sx")])

        def next_rank(t: pa.Table) -> pa.Table:
            node = t.column("dst").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            sx = t.column("sx").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            n = len(node)
            return pa.table({
                "src": pa.array(node),
                "dst": pa.array(np.full(n, -1, np.int64)),
                "deg": pa.array(np.zeros(n, np.int64)),
                "r": pa.array(base + sx),
                "__coarse": pa.array(coarse_mix(node, COARSE - 1),
                                     pa.int64()),
            })

        # re-materialize per round with a bounded block count (see
        # ``bounded``): truncates the iterative lineage the way .graph
        # does for CC labels
        rank = bounded(agg.map_batches(next_rank, batch_format="pyarrow"))

    def present(t: pa.Table) -> pa.Table:
        node = t.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        kind = np.where(node % 2 == 0, "customer", "supplier")
        return pa.table({
            "kind": pa.array(kind),
            "node_key": pa.array(node // 2),
            "rank_q": pc.cast(t.column("r"), pa.int64()),
        })

    return rank.map_batches(present, batch_format="pyarrow")


def trade_pagerank_sql(iters: int = 3, scale: int = SCALE) -> str:
    """Unrolled-CTE oracle of the same integer recurrence."""
    parts = [f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
                  CAST(l.l_suppkey AS BIGINT) AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
edges AS (
  SELECT c*2 AS src, s*2+1 AS dst FROM pairs
  UNION ALL
  SELECT s*2+1 AS src, c*2 AS dst FROM pairs),
deg AS (SELECT src, CAST(count(*) AS BIGINT) AS deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM deg),
r0 AS (SELECT src AS node, CAST({scale} // n AS BIGINT) AS r FROM deg, nn)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
r{t} AS (
  SELECT e.dst AS node,
         CAST((SELECT (15 * {scale}) // (100 * n) FROM nn)
              + sum((85 * r{t-1}.r) // (100 * d.deg)) AS BIGINT) AS r
  FROM edges e
  JOIN deg d ON d.src = e.src
  JOIN r{t-1} ON r{t-1}.node = e.src
  GROUP BY e.dst)""")
    parts.append(f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       CAST(node // 2 AS BIGINT) AS node_key,
       r AS rank_q
FROM r{iters}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# HITS (hubs & authorities) — the normalize-per-round iterative pattern
# ---------------------------------------------------------------------------

HITS_SCALE = 1_000_000


def trade_hits(sf_dir: str, iters: int = 2, scale: int = HITS_SCALE):
    """Exact integer HITS on the bipartite customer->supplier trade
    graph: hub scores (customers) and authority scores (suppliers)
    after ``iters`` mutual-reinforcement rounds with L1 renormalization
    to ``scale`` each half-step:

        a_raw(s) = sum_{(c,s)} h(c);  a = (a_raw * scale) // A_total
        h_raw(c) = sum_{(c,s)} a(s);  h = (h_raw * scale) // H_total

    Unlike :func:`trade_pagerank` the recurrence needs a GLOBAL total
    per half-step — computed as an exact integer ``Dataset.aggregate``
    driver scalar (the one number that must leave the cluster), so the
    normalized vector is still order-free int64 and hash-matches the
    unrolled-CTE oracle.  ``scale`` = 1e6 keeps raw*scale within int64
    (raw <= scale by L1 invariance).

    Shape: the two adjacency orientations are pure maps over the
    distinct-pairs table (coarse key precomputed, materialized once,
    no degree pass needed); each half-step is one static-union
    co-location exchange + one node-keyed exchange of pre-aggregated
    int64 partials + one scalar aggregate.
    """
    import ray.data
    from ray.data.aggregate import Sum

    from ..stages.dimjoin import colocate_join
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions
    from .dedup import coarse_mix

    COARSE = 1024
    nparts = shuffle_partitions()

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    def li_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
        })

    def o_prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64()),
        })

    joined = colocate_join(
        li.map_batches(li_prep, batch_format="pyarrow"),
        orders.map_batches(o_prep, batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    pairs = grouped_aggregate(
        joined.map_batches(
            lambda t: pa.table({"c": t.column("o_custkey"),
                                "s": t.column("l_suppkey")}),
            batch_format="pyarrow"),
        ["c", "s"], [("", "count", "__m")]).materialize()

    def orient(key_col: str, other_col: str):
        def f(t: pa.Table) -> pa.Table:
            k = t.column(key_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            o = t.column(other_col).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "key": pa.array(k), "other": pa.array(o),
                "v": pa.array(np.full(len(k), -1, np.int64)),
                "__coarse": pa.array(coarse_mix(k, COARSE - 1),
                                     pa.int64()),
            })
        return f

    adj_c = pairs.map_batches(orient("c", "s"),
                              batch_format="pyarrow").materialize()
    adj_s = pairs.map_batches(orient("s", "c"),
                              batch_format="pyarrow").materialize()

    custs = grouped_aggregate(pairs, ["c"],
                              [("", "count", "__d")]).materialize()
    n_c = custs.count()
    h0 = scale // n_c

    def vec_from(t: pa.Table, node_col: str, vals: np.ndarray) -> pa.Table:
        node = t.column(node_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "key": pa.array(node),
            "other": pa.array(np.full(len(node), -1, np.int64)),
            "v": pa.array(vals),
            "__coarse": pa.array(coarse_mix(node, COARSE - 1), pa.int64()),
        })

    vec = custs.map_batches(
        lambda t: vec_from(t, "c", np.full(t.num_rows, h0, np.int64)),
        batch_format="pyarrow").materialize()

    def halfstep(g: pd.DataFrame) -> pd.DataFrame:
        is_vec = g["other"] < 0
        vv = g.loc[is_vec, ["key", "v"]]
        ed = g.loc[~is_vec, ["key", "other"]].merge(vv, on="key",
                                                    how="inner")
        out = (ed.groupby("other", sort=False, as_index=False)["v"].sum()
               .rename(columns={"other": "node", "v": "x"}))
        out["x"] = out["x"].astype("int64")
        return out

    result = {}
    for half in range(2 * iters):
        adj = adj_c if half % 2 == 0 else adj_s
        raw = grouped_aggregate(
            adj.union(vec).groupby("__coarse", num_partitions=nparts)
            .map_groups(halfstep, batch_format="pandas"),
            ["node"], [("x", "sum", "xr")]).materialize()
        total = int(raw.aggregate(Sum("xr"))["sum(xr)"])

        def norm(t: pa.Table) -> pa.Table:
            xr = t.column("xr").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return vec_from(t, "node", (xr * scale) // total)

        vec = raw.map_batches(norm, batch_format="pyarrow").materialize()
        result["a" if half % 2 == 0 else "h"] = vec

    def present(kind: str):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            return pa.table({
                "kind": pa.array(np.repeat(np.array([kind]), n)),
                "node_key": pc.cast(t.column("key"), pa.int64()),
                "score_q": pc.cast(t.column("v"), pa.int64()),
            })
        return f

    hubs = result["h"].map_batches(present("customer"),
                                   batch_format="pyarrow")
    auths = result["a"].map_batches(present("supplier"),
                                    batch_format="pyarrow")
    return hubs.union(auths)


def trade_hits_sql(iters: int = 2, scale: int = HITS_SCALE) -> str:
    """Unrolled-CTE oracle of the same integer HITS recurrence."""
    parts = [f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
                  CAST(l.l_suppkey AS BIGINT) AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
h0 AS (
  SELECT c, CAST({scale} // (SELECT count(DISTINCT c) FROM pairs)
            AS BIGINT) AS h
  FROM (SELECT DISTINCT c FROM pairs))"""]
    for t in range(1, iters + 1):
        parts.append(f""",
a{t}r AS (
  SELECT s, CAST(sum(h{t-1}.h) AS BIGINT) AS ar
  FROM pairs JOIN h{t-1} USING (c) GROUP BY s),
a{t} AS (
  SELECT s, CAST(ar * {scale} // (SELECT sum(ar) FROM a{t}r)
           AS BIGINT) AS a
  FROM a{t}r),
h{t}r AS (
  SELECT c, CAST(sum(a{t}.a) AS BIGINT) AS hr
  FROM pairs JOIN a{t} USING (s) GROUP BY c),
h{t} AS (
  SELECT c, CAST(hr * {scale} // (SELECT sum(hr) FROM h{t}r)
           AS BIGINT) AS h
  FROM h{t}r)""")
    parts.append(f"""
SELECT 'customer' AS kind, c AS node_key, h AS score_q FROM h{iters}
UNION ALL
SELECT 'supplier' AS kind, s AS node_key, a AS score_q FROM a{iters}""")
    return "".join(parts)


# ---------------------------------------------------------------------------
# multi-source BFS hop levels — the frontier-expansion iterative pattern
# ---------------------------------------------------------------------------

def trade_bfs_hops(sf_dir: str, seed_nation: int = 3, hops: int = 3):
    """Hop distance (<= ``hops``) from one nation's suppliers over the
    symmetrized customer<->supplier trade graph — the k-hop
    reachability / frontier-expansion shape, run as ``hops`` unrolled
    Bellman-Ford relaxations so the whole trajectory stays exact:

        h_0(v)   = 0 for the seed suppliers
        h_r(v)   = min(h_{r-1}(v), 1 + min_{u->v} h_{r-1}(u))

    (a node enters the level table the first round it is reached and
    its hop can only stay; pure int64, no tie ambiguity — bit-identical
    to the unrolled-CTE oracle).  Nodes unreached within ``hops``
    rounds are absent on both sides.

    Scale shape (the :func:`trade_pagerank` round discipline): the
    symmetrized edge relation is keyed by ``coarse_mix(src)`` ONCE and
    materialized; each round unions the (node, hop) level rows into the
    same coarse exchange, relaxes within co-located groups with a
    per-group pre-min, then one node-keyed exact min merges the
    partials.  Level rows are int64 triples — vectors/text never move,
    and the driver sees no per-node state.
    """
    import ray.data

    from ..stages.dimjoin import colocate_join
    from ..stages.exact_agg import grouped_aggregate
    from ..util import shuffle_partitions
    from .dedup import coarse_mix

    nparts = shuffle_partitions()
    COARSE = 1024

    def bounded(ds):
        m = ds.materialize()
        if m.num_blocks() > 2 * nparts:
            m = m.repartition(nparts).materialize()
        return m

    li = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_orderkey", "l_suppkey"])
    orders = ray.data.read_parquet(f"{sf_dir}/orders.parquet",
                                   columns=["o_orderkey", "o_custkey"])

    joined = colocate_join(
        li.map_batches(lambda t: pa.table({
            "l_orderkey": pc.cast(t.column("l_orderkey"), pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64())}),
            batch_format="pyarrow"),
        orders.map_batches(lambda t: pa.table({
            "o_orderkey": pc.cast(t.column("o_orderkey"), pa.int64()),
            "o_custkey": pc.cast(t.column("o_custkey"), pa.int64())}),
            batch_format="pyarrow"),
        "l_orderkey", "o_orderkey")

    pairs = grouped_aggregate(
        joined.map_batches(lambda t: pa.table({
            "c": t.column("o_custkey"), "s": t.column("l_suppkey")}),
            batch_format="pyarrow"),
        ["c", "s"], [("", "count", "__m")])

    def symmetrize_key(t: pa.Table) -> pa.Table:
        c = t.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
        s = t.column("s").to_numpy(zero_copy_only=False).astype(np.int64)
        cn, sn = c * 2, s * 2 + 1
        src = np.concatenate([cn, sn])
        return pa.table({
            "src": pa.array(src),
            "dst": pa.array(np.concatenate([sn, cn])),
            "h": pa.array(np.full(len(src), -1, np.int64)),
            "__coarse": pa.array(coarse_mix(src, COARSE - 1), pa.int64())})

    adj = bounded(pairs.map_batches(symmetrize_key, batch_format="pyarrow"))

    def seed_prep(t: pa.Table) -> pa.Table:
        s = t.filter(pc.equal(pc.cast(t.column("s_nationkey"), pa.int64()),
                              pa.scalar(seed_nation, pa.int64())))
        node = (pc.cast(s.column("s_suppkey"), pa.int64()).to_numpy()
                .astype(np.int64) * 2 + 1)
        return pa.table({
            "src": pa.array(node),
            "dst": pa.array(np.full(len(node), -1, np.int64)),
            "h": pa.array(np.zeros(len(node), np.int64)),
            "__coarse": pa.array(coarse_mix(node, COARSE - 1), pa.int64())})

    level = bounded(
        ray.data.read_parquet(f"{sf_dir}/supplier.parquet",
                              columns=["s_suppkey", "s_nationkey"])
        .map_batches(seed_prep, batch_format="pyarrow"))

    def relax(g: pd.DataFrame) -> pd.DataFrame:
        """One co-located group: current levels pass through, every
        out-edge of a levelled node proposes h+1 for its destination,
        and a per-group pre-min bounds what the node-keyed exchange
        carries."""
        is_lev = g["dst"] < 0
        lev = g.loc[is_lev, ["src", "h"]]
        ed = g.loc[~is_lev, ["src", "dst"]].merge(lev, on="src",
                                                  how="inner")
        out = pd.concat([
            pd.DataFrame({"node": lev["src"].to_numpy(np.int64),
                          "h": lev["h"].to_numpy(np.int64)}),
            pd.DataFrame({"node": ed["dst"].to_numpy(np.int64),
                          "h": ed["h"].to_numpy(np.int64) + 1})])
        out = out.groupby("node", sort=False, as_index=False)["h"].min()
        out["h"] = out["h"].astype("int64")
        return out

    for _ in range(hops):
        contrib = (adj.union(level)
                   .groupby("__coarse", num_partitions=nparts)
                   .map_groups(relax, batch_format="pandas"))
        agg = grouped_aggregate(contrib, ["node"], [("h", "min", "h")])

        def next_level(t: pa.Table) -> pa.Table:
            node = t.column("node").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "src": pa.array(node),
                "dst": pa.array(np.full(len(node), -1, np.int64)),
                "h": pc.cast(t.column("h"), pa.int64()),
                "__coarse": pa.array(coarse_mix(node, COARSE - 1),
                                     pa.int64())})

        level = bounded(agg.map_batches(next_level, batch_format="pyarrow"))

    def present(t: pa.Table) -> pa.Table:
        node = t.column("src").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        return pa.table({
            "kind": pa.array(np.where(node % 2 == 0, "customer",
                                      "supplier")),
            "node_key": pa.array(node // 2),
            "hop": pc.cast(t.column("h"), pa.int64())})

    return level.map_batches(present, batch_format="pyarrow")


def trade_bfs_hops_sql(seed_nation: int = 3, hops: int = 3) -> str:
    """Unrolled-CTE oracle of the same bounded relaxation."""
    parts = [f"""
WITH pairs AS (
  SELECT DISTINCT CAST(o.o_custkey AS BIGINT) AS c,
                  CAST(l.l_suppkey AS BIGINT) AS s
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
edges AS (
  SELECT c*2 AS src, s*2+1 AS dst FROM pairs
  UNION ALL
  SELECT s*2+1 AS src, c*2 AS dst FROM pairs),
h0 AS (
  SELECT CAST(s_suppkey*2+1 AS BIGINT) AS node, CAST(0 AS BIGINT) AS h
  FROM supplier WHERE s_nationkey = {seed_nation})"""]
    for r in range(1, hops + 1):
        parts.append(f""",
h{r} AS (
  SELECT node, CAST(min(h) AS BIGINT) AS h FROM (
    SELECT node, h FROM h{r-1}
    UNION ALL
    SELECT e.dst AS node, h{r-1}.h + 1 AS h
    FROM edges e JOIN h{r-1} ON h{r-1}.node = e.src)
  GROUP BY node)""")
    parts.append(f"""
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       CAST(node // 2 AS BIGINT) AS node_key, h AS hop
FROM h{hops}""")
    return "".join(parts)
