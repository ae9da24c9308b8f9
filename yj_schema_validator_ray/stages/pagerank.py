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

    edges = pairs.map_batches(symmetrize, batch_format="pyarrow")
    deg = grouped_aggregate(edges, ["src"],
                            [("", "count", "deg")]).materialize()
    n_nodes = deg.count()
    # adjacency with out-degree attached: built once, read every round
    ewd = colocate_join(edges, deg, "src", "src").materialize()

    r0 = scale // n_nodes
    base = (15 * scale) // (100 * n_nodes)

    def init_rank(t: pa.Table) -> pa.Table:
        src = t.column("src")
        return pa.table({
            "node": pc.cast(src, pa.int64()),
            "r": pa.array(np.full(t.num_rows, r0, np.int64)),
        })

    rank = deg.map_batches(init_rank, batch_format="pyarrow")

    for _ in range(iters):
        j = colocate_join(ewd, rank, "src", "node")

        def contrib(t: pa.Table) -> pa.Table:
            r = t.column("r").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            d = t.column("deg").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "dst": pc.cast(t.column("dst"), pa.int64()),
                "x": pa.array((85 * r) // (100 * d)),
            })

        agg = grouped_aggregate(
            j.map_batches(contrib, batch_format="pyarrow"),
            ["dst"], [("x", "sum", "sx")])

        def next_rank(t: pa.Table) -> pa.Table:
            sx = t.column("sx").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            return pa.table({
                "node": pc.cast(t.column("dst"), pa.int64()),
                "r": pa.array(base + sx),
            })

        # re-materialize per round: truncates the iterative lineage the
        # way .graph does for CC labels (16 bytes/node)
        rank = agg.map_batches(next_rank,
                               batch_format="pyarrow").materialize()

    def present(t: pa.Table) -> pa.Table:
        node = t.column("node").to_numpy(zero_copy_only=False) \
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
