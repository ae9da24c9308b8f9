"""Similarity search over the ``embeddings`` table (vec_id, embedding
list<float>, label).

- :func:`ann_topk_bruteforce` — exact cosine top-k: the query matrix is
  broadcast ONCE (``ray.put``), each batch does one float64 matmul
  against it.  This is the correctness baseline (DuckDB
  ``list_cosine_similarity`` oracle).
- :func:`ann_topk_lsh` — random-hyperplane LSH bucketing: the scale
  path; probes only vectors sharing a code bucket with the query.
- :func:`embedding_dup_pairs` — cosine>threshold near-dup pairs via
  block-wise matmul (exact; O(N^2/B) flops, vectorized).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _list_f64_matrix(col) -> np.ndarray:
    """(rows, dim) float64 from a list<float> column — one flatten +
    reshape off the Arrow value buffer instead of a per-row ``to_pylist``
    (embeddings are fixed-dim; ragged input raises in the reshape)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 1), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(np.float64, copy=False).reshape(n, -1)


def _batch_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    return ids, _list_f64_matrix(batch.column("embedding"))


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


class BruteForceScorer:
    """Actor-pool stage holding the broadcast (normalized) query matrix."""

    def __init__(self, queries_ref):
        import ray

        q = ray.get(queries_ref)  # dict: query_id -> np.ndarray
        self.qids = np.array(sorted(q), dtype=np.int64)
        self.Q = _normalize(np.stack([q[i] for i in self.qids]).astype(np.float64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(batch)
        sims = _normalize(m) @ self.Q.T  # (batch, n_queries)
        nq = len(self.qids)
        return pa.table({
            "query_id": pa.array(np.repeat(self.qids, len(ids)), pa.int64()),
            "vec_id": pa.array(np.tile(ids, nq), pa.int64()),
            "sim": pa.array(np.round(sims.T.reshape(-1), 6), pa.float64()),
        })


def ann_topk_bruteforce(emb_ds, queries: dict[int, np.ndarray], k: int = 10):
    """Exact cosine top-k per query vector.

    Per-batch partial top-k (sort inside the map, keep k rows per query
    per batch) -> tiny global sort+head on the driver side via
    groupby(query_id).map_groups.  Ties broken by vec_id ascending on
    the ROUNDED similarity so results are fp-stable vs the SQL oracle.
    """
    import ray

    from ..util import process_cached, ref_key

    qref = ray.put(queries)
    # cheap state (normalized query matrix) -> stateless tasks with a
    # per-worker-process cache; warm workers skip the actor-pool ramp
    scored = emb_ds.map_batches(
        process_cached(BruteForceScorer, ref_key(qref), qref),
        batch_format="pyarrow")

    def batch_topk(batch: pa.Table) -> pa.Table:
        df = batch.to_pandas()
        df = (df.sort_values(["query_id", "sim", "vec_id"],
                             ascending=[True, False, True])
              .groupby("query_id", sort=False).head(k))
        return pa.Table.from_pandas(df, preserve_index=False)

    partial = scored.map_batches(batch_topk, batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return partial.groupby("query_id").map_groups(final_topk, batch_format="pandas")


class LSHCoder:
    """Random-hyperplane signature: vec -> nbits-bit code (deterministic
    seed).  Actors share the same planes (same seed)."""

    def __init__(self, dim: int, nbits: int = 12, seed: int = 11):
        rng = np.random.RandomState(seed)
        self.planes = rng.normal(size=(dim, nbits))

    def code(self, m: np.ndarray) -> np.ndarray:
        bits = (m @ self.planes) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(batch)
        return pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "code": pa.array(self.code(m), pa.int64()),
            "embedding": batch.column("embedding"),
        })


def ann_topk_lsh(emb_ds, queries: dict[int, np.ndarray], k: int = 10,
                 nbits: int = 8):
    """Approximate top-k: only vectors whose LSH code matches a query's
    code are scored (IVF-style bucketing; the 100 TB path — candidate
    set shrinks ~2^-nbits per bucket)."""
    import ray

    from ..util import process_cached, ref_key

    dim = len(next(iter(queries.values())))
    coder = LSHCoder(dim, nbits)
    qids = np.array(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([queries[i] for i in qids]).astype(np.float64))
    qcodes = coder.code(Q)
    qref = ray.put((qids, Q, qcodes))

    class BucketScorer:
        def __init__(self, ref, nb):
            self.qids, self.Q, self.qcodes = ray.get(ref)
            self.coder = LSHCoder(self.Q.shape[1], nb)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(batch)
            codes = self.coder.code(m)
            out_q, out_v, out_s = [], [], []
            mn = _normalize(m)
            for qi, qc in zip(range(len(self.qids)), self.qcodes):
                mask = codes == qc
                if not mask.any():
                    continue
                sims = mn[mask] @ self.Q[qi]
                out_q.append(np.full(mask.sum(), self.qids[qi], dtype=np.int64))
                out_v.append(ids[mask])
                out_s.append(np.round(sims, 6))
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64()),
            })

    scored = emb_ds.map_batches(
        process_cached(BucketScorer, (ref_key(qref), nbits), qref, nbits),
        batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def train_kmeans(emb_ds, n_centroids: int = 16, sample_size: int = 2048,
                 seed: int = 13) -> np.ndarray:
    """Spherical k-means centroids trained on a deterministic HASH
    sample (driver-side Lloyd iterations over ~sample_size vectors —
    the data itself never leaves its blocks).

    The sample is md5(vec_id)-thresholded (:func:`.sampling.hash_sample`)
    rather than a ``limit()`` prefix: a prefix sees only the first
    blocks, which on a sorted/sharded corpus is ONE shard's distribution
    and biases the centroids; the hash gate touches every block and is
    reproducible across reruns, resumes and repartitioning."""
    import ray

    from .sampling import hash_sample

    n_total = emb_ds.count()
    rate = min(1.0, sample_size / max(n_total, 1))
    sample = hash_sample(emb_ds, rate, id_col="vec_id")
    tbl = pa.concat_tables(ray.get(sample.materialize().to_arrow_refs()))
    if tbl.num_rows == 0:  # degenerate tiny-rate corner: fall back
        tbl = pa.concat_tables(ray.get(
            emb_ds.limit(min(sample_size, n_total)).to_arrow_refs()))
    elif tbl.num_rows > sample_size:  # binomial overshoot: determinize
        order = np.argsort(tbl.column("vec_id").to_numpy())[:sample_size]
        tbl = tbl.take(pa.array(np.sort(order)))
    _, m = _batch_matrix(tbl)
    m = _normalize(m)
    rng = np.random.RandomState(seed)
    cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
    for _ in range(10):  # Lloyd iterations (small, driver-side)
        assign = np.argmax(m @ cent.T, axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                v = m[mask].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cent[c] = v / n
    return cent


def kmeans_clusters(emb_ds, n_centroids: int = 16, sample_size: int = 2048,
                    seed: int = 13):
    """(vec_id, cluster) cosine k-means assignments — the clustering
    counterpart of the IVF index (same trainer, same broadcast-centroid
    per-batch argmax).  Deterministic: fixed seed + hash sample."""
    import ray

    from ..util import process_cached, ref_key

    cent = train_kmeans(emb_ds, n_centroids, sample_size, seed)
    ref = ray.put(cent)

    class Assign:
        def __init__(self, r):
            self.cent = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(batch)
            cells = np.argmax(_normalize(m) @ self.cent.T, axis=1)
            return pa.table({"vec_id": pa.array(ids, pa.int64()),
                             "cluster": pa.array(cells.astype(np.int64),
                                                 pa.int64())})

    return emb_ds.map_batches(process_cached(Assign, ref_key(ref), ref),
                              batch_format="pyarrow")


def ann_topk_ivf(emb_ds, queries: dict[int, np.ndarray], k: int = 10,
                 n_centroids: int = 16, n_probe: int = 4,
                 sample_size: int = 2048, seed: int = 13):
    """IVF top-k: k-means centroids trained on a deterministic sample,
    vectors assigned to their nearest centroid per batch, queries probe
    only the ``n_probe`` nearest cells — the classic inverted-file scale
    path (candidate set ~ n_probe/n_centroids of the data).
    """
    import ray

    from ..util import process_cached, ref_key

    cent = train_kmeans(emb_ds, n_centroids, sample_size, seed)

    qids = np.array(sorted(queries), dtype=np.int64)
    Q = _normalize(np.stack([queries[i] for i in qids]).astype(np.float64))
    probe_cells = np.argsort(-(Q @ cent.T), axis=1)[:, :n_probe]
    ref = ray.put((qids, Q, cent, probe_cells))

    class IVFScorer:
        def __init__(self, r):
            self.qids, self.Q, self.cent, self.probes = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(batch)
            mn = _normalize(m)
            cells = np.argmax(mn @ self.cent.T, axis=1)
            out_q, out_v, out_s = [], [], []
            for qi in range(len(self.qids)):
                mask = np.isin(cells, self.probes[qi])
                if not mask.any():
                    continue
                sims = mn[mask] @ self.Q[qi]
                out_q.append(np.full(int(mask.sum()), self.qids[qi], np.int64))
                out_v.append(ids[mask])
                out_s.append(np.round(sims, 6))
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int64()),
                                 "vec_id": pa.array([], pa.int64()),
                                 "sim": pa.array([], pa.float64())})
            return pa.table({
                "query_id": pa.array(np.concatenate(out_q), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), pa.int64()),
                "sim": pa.array(np.concatenate(out_s), pa.float64())})

    scored = emb_ds.map_batches(
        process_cached(IVFScorer, ref_key(ref), ref), batch_format="pyarrow")

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def embedding_dup_pairs_lsh(emb_ds, threshold: float = 0.99, nbits: int = 16,
                            ntables: int = 4, seed: int = 29,
                            max_bucket: int = 4096):
    """Cosine near-dup pairs via hyperplane LSH bucketing — the 100 TB
    default path (:func:`embedding_dup_pairs` is the exact sf-small
    oracle baseline).

    vectors -> ``ntables`` independent hyperplane codes (seeds derived,
    shared across actors) -> explode (table, code, vec_id, embedding) ->
    coarse-hash groupby co-locates each bucket -> EXACT all-pairs cosine
    inside each bucket (vectorized matmul) -> cross-table pair dedup.
    Identical vectors always share every code, so recall at
    threshold≈0.99 is ~1; only candidate buckets are ever scored, and
    nothing is materialized on the driver.  Shuffle volume is
    ntables x corpus — the standard LSH recall/IO trade.  Hot buckets
    larger than ``max_bucket`` are scored exactly in bounded
    ``max_bucket``-square blocks (never truncated — the query carries
    the exact SQL oracle, so a silent cap would drop true pairs).
    """
    from .exact_agg import grouped_aggregate
    from ..util import process_cached, shuffle_partitions

    class CodeExplode:
        """Stateful: hyperplane tables built once per actor (same seeds
        everywhere, so codes agree across actors)."""

        def __init__(self):
            self.coders = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(batch)
            if self.coders is None:
                self.coders = [LSHCoder(m.shape[1], nbits, seed + 97 * t)
                               for t in range(ntables)]
            out = []
            for t, coder in enumerate(self.coders):
                out.append(pa.table({
                    "tbl": pa.array(np.full(len(ids), t, dtype=np.int64)),
                    "code": pa.array(coder.code(m), pa.int64()),
                    "vec_id": pa.array(ids, pa.int64()),
                    "embedding": batch.column("embedding"),
                }))
            return pa.concat_tables(out)

    coded = emb_ds.map_batches(
        process_cached(CodeExplode, (nbits, ntables, seed)),
        batch_format="pyarrow")

    def add_coarse(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        coarse = pc.bit_wise_and(
            pc.bit_wise_xor(t.column("code"),
                            pc.multiply(t.column("tbl"), 2654435761)), 1023)
        return t.append_column("coarse", coarse)

    def emit_bucket_pairs(g: pa.Table) -> pa.Table:
        tb = g.column("tbl").to_numpy()
        cd = g.column("code").to_numpy()
        order = np.lexsort((cd, tb))
        tb, cd = tb[order], cd[order]
        ids = g.column("vec_id").to_numpy()[order]
        M = _list_f64_matrix(g.column("embedding"))[order]
        change = np.flatnonzero((tb[1:] != tb[:-1]) | (cd[1:] != cd[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(ids)]))
        out_a, out_b, out_s = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids = ids[s:e]
            mn = _normalize(M[s:e])
            # hot buckets are NOT truncated (that would silently drop true
            # pairs and break the exact oracle); pairs are emitted in
            # max_bucket x max_bucket blocks so scratch stays bounded at
            # B^2 floats regardless of bucket size
            for bs in range(0, len(run_ids), max_bucket):
                be = min(bs + max_bucket, len(run_ids))
                for cs in range(bs, len(run_ids), max_bucket):
                    ce = min(cs + max_bucket, len(run_ids))
                    sims = mn[bs:be] @ mn[cs:ce].T
                    if bs == cs:
                        iu, ju = np.triu_indices(be - bs, k=1)
                    else:
                        iu, ju = np.unravel_index(
                            np.arange(sims.size), sims.shape)
                    v = sims[iu, ju]  # gather once, reuse filter + output
                    keep = v >= threshold
                    a = run_ids[bs + iu[keep]]
                    b = run_ids[cs + ju[keep]]
                    lo, hi = np.minimum(a, b), np.maximum(a, b)
                    out_a.append(lo)
                    out_b.append(hi)
                    out_s.append(np.round(v[keep], 6))
        if not out_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"a": pa.array(np.concatenate(out_a), pa.int64()),
                         "b": pa.array(np.concatenate(out_b), pa.int64()),
                         "sim": pa.array(np.concatenate(out_s), pa.float64())})

    raw = (coded.map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse", num_partitions=shuffle_partitions())
           .map_groups(emit_bucket_pairs, batch_format="pyarrow"))
    # a pair found in k tables appears k times with the same sim
    return grouped_aggregate(raw, ["a", "b"], [("sim", "max", "sim")])


def embedding_dup_pairs(emb_ds, threshold: float = 0.99):
    """Exact cosine near-dup pairs (a < b, sim >= threshold).

    The full normalized matrix is broadcast once (fine up to ~10M x 128
    float32 = 5 GB object-store; beyond that
    :func:`embedding_dup_pairs_lsh` is the default scale path); each
    batch multiplies against it.  Kept as the exact oracle baseline.
    """
    import ray

    from ..util import process_cached, ref_key

    # build the broadcast side once on the driver (small: ids + vectors)
    tbl = pa.concat_tables(
        ray.get(emb_ds.select_columns(["vec_id", "embedding"]).to_arrow_refs()))
    ids_all, m_all = _batch_matrix(tbl)
    order = np.argsort(ids_all)
    ids_all, m_all = ids_all[order], _normalize(m_all[order])
    ref = ray.put((ids_all, m_all))

    class PairScorer:
        def __init__(self, r):
            self.ids, self.M = ray.get(r)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(batch)
            sims = _normalize(m) @ self.M.T  # (batch, N)
            bi, ni = np.nonzero(sims >= threshold)
            a = ids[bi]
            b = self.ids[ni]
            keep = a < b
            return pa.table({
                "a": pa.array(a[keep], pa.int64()),
                "b": pa.array(b[keep], pa.int64()),
                "sim": pa.array(np.round(sims[bi, ni][keep], 6), pa.float64()),
            })

    return emb_ds.map_batches(
        process_cached(PairScorer, ref_key(ref), ref), batch_format="pyarrow")


def embedding_norm_stats(emb_ds):
    """Per-vector embedding health stats with EXACT integer outputs:
    dimension count plus a quantized squared-norm checksum
    sum(floor(1e6 * x * x)) — each term is one IEEE multiply + one
    exact floor, and the sum is integer, so fp summation ORDER never
    enters (the same quantization trick as ``training_table``'s
    emb_q_sum).  The all-float L2 norm itself stays downstream; this
    is the driver-hashable audit row (zero-dim and degenerate vectors
    surface as dim=0 / q_norm_sum=0).  Zero-shuffle scan.
    """
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat_arr = col.flatten()
        if flat_arr.null_count:
            # element-level nulls: SQL's sum() skips them (contributes 0);
            # NaN from to_numpy would floor to INT64_MIN garbage instead
            flat_arr = flat_arr.fill_null(0.0)
        flat = flat_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * flat * 1e6).astype(np.int64)
        lens = pc.list_value_length(col).fill_null(0).to_numpy()
        offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
        cs = np.concatenate(([0], np.cumsum(q, dtype=np.int64)))
        sums = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table({
            "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
            "dim": pa.array(lens.astype(np.int64)),
            "q_norm_sum": pa.array(sums, pa.int64()),
        })

    return emb_ds.map_batches(f, batch_format="pyarrow")


def embedding_quantize(emb_ds):
    """Per-vector INT8 quantization audit — the compression step a
    100 TB embedding store runs before serving (absmax scaling, the
    llama.cpp/ FAISS SQ8 scheme): scale = max|x|, q_j = floor(x/scale*127
    + 0.5).  Outputs are EXACT integers (the same quantized-checksum
    trick as :func:`embedding_norm_stats`): the quantized scale, the
    signed and absolute quant-code sums, and a 1e-9-quantized total
    reconstruction error — every term a fixed tree of IEEE ops mirrored
    operand-for-operand in the SQL oracle, so the driver hash is exact.
    Zero-shuffle scan; element nulls contribute 0 on both sides.
    """
    def f(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat_arr = col.flatten()
        if flat_arr.null_count:
            flat_arr = flat_arr.fill_null(0.0)
        flat = flat_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        lens = pc.list_value_length(col).fill_null(0).to_numpy()
        offs = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
        starts = offs[:-1]
        nz = lens > 0
        scale = np.zeros(len(lens), np.float64)
        if flat.size and nz.any():
            # reduceat over non-empty starts only: consecutive non-empty
            # segments are contiguous in flat, so each reduction spans
            # exactly one vector's elements
            scale[nz] = np.maximum.reduceat(np.abs(flat), starts[nz])
        scale_rep = np.repeat(scale, lens)
        with np.errstate(invalid="ignore", divide="ignore"):
            q = np.floor(flat / scale_rep * 127 + 0.5)
        q = np.where(scale_rep == 0, 0.0, q)
        err = np.abs(flat - q * scale_rep / 127.0)
        err_q = np.floor(err * 1e9).astype(np.int64)
        qi = q.astype(np.int64)

        def seg_sum(x):
            cs = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
            return cs[offs[1:]] - cs[offs[:-1]]

        return pa.table({
            "vec_id": pc.cast(t.column("vec_id"), pa.int64()),
            "dim": pa.array(lens.astype(np.int64)),
            "scale_q6": pa.array(
                np.floor(scale * 1e6 + 0.5).astype(np.int64)),
            "q_sum": pa.array(seg_sum(qi), pa.int64()),
            "q_abs_sum": pa.array(seg_sum(np.abs(qi)), pa.int64()),
            "err_q9_sum": pa.array(seg_sum(err_q), pa.int64()),
        })

    return emb_ds.map_batches(f, batch_format="pyarrow")


def embedding_quantize_sql() -> str:
    return """
WITH sc AS (
  SELECT vec_id, coalesce(max(abs(CAST(u.x AS DOUBLE))), 0) AS scale,
         CAST(len(embedding) AS BIGINT) AS dim
  FROM embeddings LEFT JOIN unnest(embedding) AS u(x) ON TRUE
  GROUP BY vec_id, len(embedding)
),
el AS (
  SELECT e.vec_id, CAST(u.x AS DOUBLE) AS x
  FROM embeddings e LEFT JOIN unnest(e.embedding) AS u(x) ON TRUE
),
q AS (
  SELECT el.vec_id, el.x,
         CASE WHEN sc.scale = 0 THEN 0.0
              ELSE floor(el.x / sc.scale * 127 + 0.5) END AS qj
  FROM el JOIN sc USING (vec_id)
)
SELECT q.vec_id, sc.dim,
       CAST(floor(sc.scale * 1000000 + 0.5) AS BIGINT) AS scale_q6,
       CAST(coalesce(sum(CAST(q.qj AS BIGINT)), 0) AS BIGINT) AS q_sum,
       CAST(coalesce(sum(CAST(abs(q.qj) AS BIGINT)), 0) AS BIGINT)
         AS q_abs_sum,
       CAST(coalesce(sum(CAST(floor(abs(q.x - q.qj * sc.scale / 127)
                                    * 1000000000) AS BIGINT)), 0) AS BIGINT)
         AS err_q9_sum
FROM q JOIN sc USING (vec_id)
GROUP BY q.vec_id, sc.dim, sc.scale"""


def embedding_norm_stats_sql() -> str:
    return """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(coalesce(sum(CAST(floor(CAST(u.x AS DOUBLE)
                                    * CAST(u.x AS DOUBLE) * 1000000)
                              AS BIGINT)), 0) AS BIGINT) AS q_norm_sum
FROM embeddings LEFT JOIN unnest(embedding) AS u(x) ON TRUE
GROUP BY vec_id, len(embedding)"""


def knn_classify(sf_dir: str, k: int = 5,
                 max_broadcast_bytes: int = 2 << 30):
    """Leave-one-out k-NN label vote over the embeddings table: every
    vector is classified by the MAJORITY label of its ``k`` nearest
    OTHER vectors (exact integer L2 on 1e6 fixed-point coordinates, the
    :func:`~..pipelines.olap.embedding_lloyd_step` arithmetic contract)
    — classification-via-retrieval, fully SQL-oracled because every
    comparison is int64 (distance ties break to the smaller vec_id,
    vote ties to the smaller label).

    Shape: the quantized (n, d) neighbor matrix broadcasts once
    (``ray.put``) and each batch scores against it with one int64
    matmul — the EXACT-oracle baseline, capped at ``max_broadcast_bytes``
    like :func:`embedding_dups` (the documented scale path is the
    LSH/IVF-pruned candidate generation of :func:`ann_topk_lsh` feeding
    the same vote).  Output: (vec_id, label, pred_label, n_votes,
    correct).
    """
    import ray
    import ray.data

    from ..util import collect_small_arrow, process_cached, ref_key

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])
    mat_t = collect_small_arrow(emb.materialize())
    nbytes = mat_t.nbytes
    if nbytes > max_broadcast_bytes:
        raise ValueError(
            f"knn_classify: embedding table is {nbytes}B > "
            f"{max_broadcast_bytes}B — use the LSH-bucketed candidate "
            "path (ann_topk_lsh) at this scale")
    order = np.argsort(mat_t.column("vec_id").to_numpy())
    all_ids = mat_t.column("vec_id").to_numpy()[order].astype(np.int64)
    all_q = np.floor(_list_f64_matrix(mat_t.column("embedding"))
                     * 1e6 + 0.5).astype(np.int64)[order]
    all_lbl = mat_t.column("label").to_numpy(zero_copy_only=False) \
        .astype(np.int64)[order]
    labels = np.sort(np.unique(all_lbl))
    lbl_idx = np.searchsorted(labels, all_lbl)
    ref = ray.put((all_ids, all_q, all_lbl, labels, lbl_idx))

    class Vote:
        def __init__(self, r):
            (self.ids, self.q, self.lbl, self.labels,
             self.lbl_idx) = ray.get(r)
            self.norms = (self.q * self.q).sum(axis=1)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = pc.cast(t.column("vec_id"), pa.int64()).to_numpy()
            true = t.column("label").to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            xq = np.floor(_list_f64_matrix(t.column("embedding"))
                          * 1e6 + 0.5).astype(np.int64)
            # exact int64 L2: |a|^2 + |b|^2 - 2ab (all well inside int64)
            d2 = ((xq * xq).sum(axis=1)[:, None] + self.norms[None, :]
                  - 2 * (xq @ self.q.T))
            n_all = len(self.ids)
            # deterministic composite order (d2, neighbor vec_id):
            # neighbor index follows vec_id order, so idx breaks ties
            if int(d2.max(initial=0)) > (2 ** 62) // max(n_all, 1):
                raise ValueError("knn_classify: composite sort key would "
                                 "overflow int64 at this n/d2 range")
            key = d2 * np.int64(n_all) + np.arange(n_all, dtype=np.int64)
            self_pos = np.searchsorted(self.ids, ids)
            is_self = self.ids[self_pos.clip(max=n_all - 1)] == ids
            rows = np.arange(len(ids))
            key[rows[is_self], self_pos[is_self]] = np.iinfo(np.int64).max
            top = np.argpartition(key, k - 1, axis=1)[:, :k]
            top = np.take_along_axis(
                top, np.argsort(np.take_along_axis(key, top, axis=1),
                                axis=1), axis=1)
            votes = np.zeros((len(ids), len(self.labels)), np.int64)
            for j in range(k):
                votes[rows, self.lbl_idx[top[:, j]]] += 1
            best = votes.argmax(axis=1)  # first max = smallest label
            return pa.table({
                "vec_id": pa.array(ids, pa.int64()),
                "label": pa.array(true),
                "pred_label": pa.array(self.labels[best]),
                "n_votes": pa.array(votes[rows, best]),
                "correct": pa.array(
                    (self.labels[best] == true).astype(np.int64)),
            })

    return emb.map_batches(
        process_cached(Vote, (ref_key(ref), k), ref),
        batch_format="pyarrow", batch_size=512)


def knn_classify_sql(k: int = 5) -> str:
    return f"""
WITH el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
d AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib,
         CAST(sum((a.xq - b.xq) * (a.xq - b.xq)) AS BIGINT) AS d2
  FROM el a JOIN el b ON a.dim = b.dim AND a.vec_id <> b.vec_id
  GROUP BY ia, ib),
topk AS (
  SELECT ia, ib,
         row_number() OVER (PARTITION BY ia ORDER BY d2, ib) AS rn
  FROM d),
votes AS (
  SELECT t.ia, CAST(e.label AS BIGINT) AS cand, count(*) AS c
  FROM topk t JOIN embeddings e ON e.vec_id = t.ib
  WHERE t.rn <= {k} GROUP BY t.ia, cand),
pred AS (
  SELECT ia, cand, c,
         row_number() OVER (PARTITION BY ia ORDER BY c DESC, cand) AS pr
  FROM votes)
SELECT e.vec_id, CAST(e.label AS BIGINT) AS label, p.cand AS pred_label,
       CAST(p.c AS BIGINT) AS n_votes,
       CAST(CASE WHEN p.cand = e.label THEN 1 ELSE 0 END AS BIGINT)
         AS correct
FROM embeddings e JOIN pred p ON p.ia = e.vec_id AND p.pr = 1"""


def knn_classify_lsh(sf_dir: str, k: int = 5, nbits: int = 6,
                     n_tables: int = 4, max_bucket: int = 8192):
    """LSH-pruned leave-one-out k-NN label vote — the SCALE path past
    :func:`knn_classify`'s broadcast byte cap (its docstring's
    documented route, now wired): candidate neighbors come from
    ``n_tables`` independent random-hyperplane code buckets instead of
    the all-pairs matrix, and the VOTE is the identical exact-int64
    arithmetic contract (1e6 fixed-point L2; distance ties to the
    smaller vec_id, vote ties to the smaller label) — so wherever the
    candidate set contains the true top-k, the prediction matches the
    broadcast baseline bit-for-bit (certified by
    :func:`~..pipelines.accuracy.knn_lsh_accuracy`).

    Shape: one scan emits (table, code, vec_id, label, packed q-vector)
    rows ×``n_tables``; one (table, code)-keyed exchange does the
    within-bucket exact top-k per member (tiled above ``max_bucket``
    rows to bound the pairwise block; expected bucket size is
    n / 2^nbits per table — at corpus scale ``nbits`` grows with
    log2(n) to hold it flat); one vec-keyed exchange merges the
    per-table candidate lists (dedup by neighbor), takes the global
    top-k and votes.  Nothing data-sized ever reaches the driver and
    no all-pairs surface exists — wire volume is
    O(n · n_tables · (d·8 + k·24)) bytes.
    """
    import ray.data

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate  # noqa: F401 (plan parity)

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding", "label"])

    coders = [LSHCoder(0, nbits, seed=11 + 101 * t) for t in range(n_tables)]

    def bucket_rows(t: pa.Table) -> pa.Table:
        ids, m = _batch_matrix(t)
        if len(ids) == 0:
            return pa.table({"bkey": pa.array([], pa.int64()),
                             "vec_id": pa.array([], pa.int64()),
                             "label": pa.array([], pa.int64()),
                             "qv": pa.array([], pa.binary())})
        labels = t.column("label").to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        d = q.shape[1]
        mn = _normalize(m)
        blob = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(d * 8), len(ids),
            [None, pa.py_buffer(np.ascontiguousarray(q).tobytes())])
        keys, outs = [], []
        for tno, coder in enumerate(coders):
            if coder.planes.shape[0] != d:  # lazily size the planes
                coder.__init__(d, nbits, seed=11 + 101 * tno)
            codes = coder.code(mn)
            keys.append(codes + np.int64(tno << nbits))
        rep = pa.chunked_array([blob] * n_tables)
        return pa.table({
            "bkey": pa.array(np.concatenate(keys), pa.int64()),
            "vec_id": pa.array(np.tile(ids.astype(np.int64), n_tables)),
            "label": pa.array(np.tile(labels, n_tables)),
            "qv": pc.cast(rep, pa.binary())})

    def bucket_topk(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_id": pd.Series(dtype="int64"),
                "label": pd.Series(dtype="int64"),
                "nb_id": pd.Series(dtype="int64"),
                "nb_label": pd.Series(dtype="int64"),
                "d2": pd.Series(dtype="int64")}
        out = []
        for _, b in g.groupby("bkey", sort=False):
            nb = len(b)
            if nb < 2:
                continue
            ids = b["vec_id"].to_numpy(np.int64)
            lbl = b["label"].to_numpy(np.int64)
            q = np.frombuffer(b"".join(b["qv"]), np.int64) \
                .reshape(nb, -1)
            norms = (q * q).sum(axis=1)
            kk = min(k, nb - 1)
            for lo in range(0, nb, max_bucket):
                hi = min(lo + max_bucket, nb)
                d2 = (norms[lo:hi, None] + norms[None, :]
                      - 2 * (q[lo:hi] @ q.T))
                if int(d2.max(initial=0)) > (2 ** 62) // max(nb, 1):
                    raise ValueError(
                        "knn_classify_lsh: composite sort key would "
                        "overflow int64 at this bucket size/d2 range")
                key = d2 * np.int64(nb) + np.arange(nb, dtype=np.int64)
                rows = np.arange(hi - lo)
                key[rows, lo + rows] = np.iinfo(np.int64).max  # self
                top = np.argpartition(key, kk - 1, axis=1)[:, :kk]
                out.append(pd.DataFrame({
                    "vec_id": np.repeat(ids[lo:hi], kk),
                    "label": np.repeat(lbl[lo:hi], kk),
                    "nb_id": ids[top.reshape(-1)],
                    "nb_label": lbl[top.reshape(-1)],
                    "d2": np.take_along_axis(d2, top, axis=1)
                    .reshape(-1)}))
        if not out:
            return pd.DataFrame(cols)
        return pd.concat(out, ignore_index=True).astype(
            {c: "int64" for c in cols})

    cands = (emb.map_batches(bucket_rows, batch_format="pyarrow")
             .groupby("bkey", num_partitions=shuffle_partitions())
             .map_groups(bucket_topk, batch_format="pandas"))

    from .dedup import coarse_mix

    def add_vc(t: pa.Table) -> pa.Table:
        return t.append_column("__vc", pa.array(
            coarse_mix(t.column("vec_id").to_numpy(), 1023), pa.int64()))

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        cols = {"vec_id": pd.Series(dtype="int64"),
                "label": pd.Series(dtype="int64"),
                "pred_label": pd.Series(dtype="int64"),
                "n_votes": pd.Series(dtype="int64"),
                "correct": pd.Series(dtype="int64")}
        if g.empty:
            return pd.DataFrame(cols)
        g = g.drop_duplicates(["vec_id", "nb_id"])
        g = g.sort_values(["vec_id", "d2", "nb_id"])
        g = g.groupby("vec_id", sort=False).head(k)
        vc = (g.groupby(["vec_id", "label", "nb_label"], sort=False)
              .size().rename("c").reset_index())
        vc = vc.sort_values(["vec_id", "c", "nb_label"],
                            ascending=[True, False, True])
        best = vc.groupby("vec_id", sort=False).head(1)
        return pd.DataFrame({
            "vec_id": best["vec_id"].astype("int64"),
            "label": best["label"].astype("int64"),
            "pred_label": best["nb_label"].astype("int64"),
            "n_votes": best["c"].astype("int64"),
            "correct": (best["nb_label"] == best["label"])
            .astype("int64")})

    return (cands.map_batches(add_vc, batch_format="pyarrow")
            .groupby("__vc", num_partitions=shuffle_partitions())
            .map_groups(lambda g: vote(g.drop(columns="__vc")),
                        batch_format="pandas"))


def embedding_cluster_scatter(sf_dir: str, n_centroids: int = 16,
                              improvement_bound: float = 0.999):
    """Scatter-decomposition certificate for the (rows-only, iterative)
    k-means clustering of :func:`kmeans_clusters`: the law of total
    scatter — total SSE == within-cluster SSE + between-cluster SSE —
    verified EXACTLY in rational arithmetic over the 1e6-quantized
    integer vectors (``fractions.Fraction``; no float ever enters), so
    a wrong assignment plumbing (dropped rows, mixed-up partials)
    cannot balance the books.  Emits the exact-side total scatter
    (hash-checked against DuckDB HUGEINT, reported in 1e-6 units to
    stay inside BIGINT) plus three booleans: the exact decomposition
    identity, within <= total (true for ANY partition), and
    within <= ``improvement_bound`` x total (the clustering actually
    concentrated mass; measured within/total = 0.886-0.887 on the
    random-gaussian corpus — the worst case for cosine k-means — so
    0.999 is a safe floor while still ruling out a no-op partition).

    Shape: centroids train on the hash sample
    (:func:`train_kmeans`), broadcast once; ONE scan emits
    (cluster x dim) count/sum/sum-of-squares int64 partials; one
    domain-sized exchange; driver math on the k*d-row table.
    """
    from fractions import Fraction

    import ray
    import ray.data

    from ..util import collect_small_arrow, process_cached, ref_key
    from .exact_agg import grouped_aggregate

    emb = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    cent = train_kmeans(emb, n_centroids)
    ref = ray.put(cent)

    class Partial:
        def __init__(self, r):
            self.cent = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, m = _batch_matrix(t)
            if len(ids) == 0:
                return pa.table({"cluster": pa.array([], pa.int64()),
                                 "dim": pa.array([], pa.int64()),
                                 "n": pa.array([], pa.int64()),
                                 "s1": pa.array([], pa.int64()),
                                 "s2": pa.array([], pa.int64())})
            cells = np.argmax(_normalize(m) @ self.cent.T, axis=1) \
                .astype(np.int64)
            q = np.floor(m * 1e6 + 0.5).astype(np.int64)
            d = q.shape[1]
            uniq, inv = np.unique(cells, return_inverse=True)
            s1 = np.zeros((len(uniq), d), np.int64)
            s2 = np.zeros((len(uniq), d), np.int64)
            np.add.at(s1, inv, q)
            np.add.at(s2, inv, q * q)
            counts = np.bincount(inv, minlength=len(uniq)) \
                .astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.repeat(uniq, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64),
                                        len(uniq))),
                "n": pa.array(np.repeat(counts, d)),
                "s1": pa.array(s1.reshape(-1)),
                "s2": pa.array(s2.reshape(-1))})

    agg = grouped_aggregate(
        emb.map_batches(process_cached(Partial, ref_key(ref), ref),
                        batch_format="pyarrow"),
        ["cluster", "dim"],
        [("n", "sum", "n"), ("s1", "sum", "s1"), ("s2", "sum", "s2")])
    pdf = collect_small_arrow(agg).to_pandas()

    dims = sorted(pdf["dim"].unique())
    g1 = {dd: 0 for dd in dims}
    g2 = {dd: 0 for dd in dims}
    n_total = 0
    within = Fraction(0)
    # per-cluster rational within-SSE + global per-dim totals
    for cl, grp in pdf.groupby("cluster"):
        n_c = int(grp["n"].iloc[0])
        n_total += n_c
        for dd, a, b in zip(grp["dim"], grp["s1"], grp["s2"]):
            a, b = int(a), int(b)
            g1[int(dd)] += a
            g2[int(dd)] += b
            within += Fraction(n_c * b - a * a, n_c)
    t_num = sum(n_total * g2[dd] - g1[dd] * g1[dd] for dd in dims)
    total = Fraction(t_num, n_total)
    between = Fraction(0)
    for cl, grp in pdf.groupby("cluster"):
        n_c = int(grp["n"].iloc[0])
        for dd, a in zip(grp["dim"], grp["s1"]):
            mu_d = Fraction(int(a), n_c) - Fraction(g1[int(dd)], n_total)
            between += n_c * mu_d * mu_d
    decomposition_ok = (within + between == total)
    within_le_total = within <= total
    improvement_ok = within <= total * Fraction(
        int(improvement_bound * 10**6), 10**6)
    return pd.DataFrame({
        "n_vecs": pd.Series([n_total], dtype="int64"),
        "dim": pd.Series([len(dims)], dtype="int64"),
        "total_scatter_m": pd.Series([t_num // 10**6], dtype="int64"),
        "decomposition_ok": pd.Series([bool(decomposition_ok)]),
        "within_le_total_ok": pd.Series([bool(within_le_total)]),
        "improvement_ok": pd.Series([bool(improvement_ok)])})


def embedding_cluster_scatter_sql() -> str:
    return """
WITH el AS (
  SELECT vec_id, unnest(range(len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
              AS BIGINT) AS xq
  FROM embeddings),
pd AS (SELECT dim, count(*) AS n, sum(xq) AS s1, sum(xq * xq) AS s2
       FROM el GROUP BY dim)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vecs,
       CAST((SELECT max(len(embedding)) FROM embeddings) AS BIGINT)
         AS dim,
       CAST(sum(n * s2 - s1 * s1) // 1000000 AS BIGINT)
         AS total_scatter_m,
       TRUE AS decomposition_ok, TRUE AS within_le_total_ok,
       TRUE AS improvement_ok
FROM pd"""


def embedding_dim_stats(emb_ds):
    """Per-DIMENSION embedding distribution audit (the list-column
    analytics shape): for every dimension index 1..d, the element
    count plus exact-integer quantized sum/min/max
    (``floor(1e6 * x)`` per element — one IEEE multiply + exact floor,
    the :func:`embedding_norm_stats` contract), the columns a feature-
    drift monitor tracks per embedding model version.

    Shape: per-batch flatten -> position index by offset subtraction ->
    d-row partials -> one dimension-keyed
    :func:`~..stages.exact_agg.grouped_aggregate` (d is model-fixed,
    so the exchange is constant-width at any corpus scale)."""
    import pyarrow.compute as pc

    from .exact_agg import grouped_aggregate

    def partial(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat_arr = col.flatten()
        if flat_arr.null_count:
            flat_arr = flat_arr.fill_null(0.0)  # mirror SQL coalesce(x,0)
        flat = flat_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * 1e6).astype(np.int64)
        lens = pc.list_value_length(col).fill_null(0).to_numpy()
        offs = np.cumsum(lens, dtype=np.int64)
        idx = np.arange(len(q), dtype=np.int64) \
            - np.repeat(offs - lens, lens) + 1  # 1-based like SQL lists
        df = pd.DataFrame({"dim_idx": idx, "q": q})
        g = df.groupby("dim_idx", sort=False).agg(
            n=("q", "size"), q_sum=("q", "sum"),
            q_min=("q", "min"), q_max=("q", "max")).reset_index()
        for c in ("n", "q_sum", "q_min", "q_max"):
            g[c] = g[c].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    return grouped_aggregate(
        emb_ds.map_batches(partial, batch_format="pyarrow"),
        ["dim_idx"], [("n", "sum", "n"), ("q_sum", "sum", "q_sum"),
                      ("q_min", "min", "q_min"), ("q_max", "max", "q_max")])


def embedding_dim_stats_sql() -> str:
    return """
WITH ex AS (
  SELECT i, CAST(coalesce(embedding[i], 0) AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i))
SELECT CAST(i AS BIGINT) AS dim_idx,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS q_sum,
       CAST(min(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS q_min,
       CAST(max(CAST(floor(x * 1000000) AS BIGINT)) AS BIGINT) AS q_max
FROM ex GROUP BY i"""


_RP_SIGN_CACHE: dict = {}


def _rp_signs(d_in: int, d_out: int) -> np.ndarray:
    """Deterministic Rademacher (+1/-1) projection matrix derived from
    md5 — sign(i,j) = +1 iff the first hex char of md5('i:j') < '8',
    the same SQL-mirrorable hash family the sampling operators use.
    Cached per worker process (it is model-dimension sized)."""
    import hashlib

    key = (d_in, d_out)
    if key not in _RP_SIGN_CACHE:
        s = np.empty((d_in, d_out), np.int64)
        for i in range(d_in):
            for j in range(d_out):
                h = hashlib.md5(f"{i}:{j}".encode()).hexdigest()[0]
                s[i, j] = 1 if h < "8" else -1
        _RP_SIGN_CACHE[key] = s
    return _RP_SIGN_CACHE[key]


def embedding_rp_project(emb_ds, d_out: int = 16):
    """Sparse/Rademacher RANDOM PROJECTION (Achlioptas 2003): reduce
    each embedding to ``d_out`` dimensions with a deterministic +-1
    matrix.  Arithmetic is exact end to end: elements quantize FIRST
    (``floor(1e6 * x)``, one IEEE multiply + exact floor — the
    :func:`embedding_norm_stats` contract), then an int64 matmul
    against the sign matrix, so the projected values are integers the
    SQL oracle reproduces term-for-term (sum order never matters).

    Shape: zero-shuffle scan; the sign matrix is process-cached
    (model-dim sized, never shipped per batch).  Output long-form
    (vec_id, out_dim, q_val) to keep the schema narrow."""
    import pyarrow.compute as pc

    def f(t: pa.Table) -> pa.Table:
        col = t.column("embedding")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy()
        if len(lens) == 0 or lens.max() == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "out_dim": pa.array([], pa.int64()),
                             "q_val": pa.array([], pa.int64())})
        d_in = int(lens.max())
        flat_arr = col.flatten()
        if flat_arr.null_count:
            flat_arr = flat_arr.fill_null(0.0)
        flat = flat_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        q = np.floor(flat * 1e6).astype(np.int64)
        # ragged guard: this corpus is fixed-dim; assert instead of pad
        assert (lens == d_in).all(), "mixed embedding dims"
        mat = q.reshape(-1, d_in)
        out = mat @ _rp_signs(d_in, d_out)          # int64 exact
        vid = t.column("vec_id").to_numpy(zero_copy_only=False)
        return pa.table({
            "vec_id": pa.array(np.repeat(vid, d_out), pa.int64()),
            "out_dim": pa.array(
                np.tile(np.arange(1, d_out + 1, dtype=np.int64),
                        len(vid)), pa.int64()),
            "q_val": pa.array(out.reshape(-1), pa.int64())})

    return emb_ds.map_batches(f, batch_format="pyarrow")


def embedding_rp_project_sql(d_out: int = 16) -> str:
    return f"""
WITH ex AS (
  SELECT vec_id, i,
         CAST(floor(CAST(coalesce(embedding[i], 0) AS DOUBLE) * 1000000)
              AS BIGINT) AS q
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)),
s AS (
  SELECT i, j,
         CASE WHEN substr(md5(CAST(i - 1 AS VARCHAR) || ':' ||
                              CAST(j - 1 AS VARCHAR)), 1, 1) < '8'
              THEN 1 ELSE -1 END AS sign
  FROM unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1))
         AS a(i),
       unnest(range(1, {d_out} + 1)) AS b(j))
SELECT ex.vec_id, CAST(s.j AS BIGINT) AS out_dim,
       CAST(SUM(ex.q * s.sign) AS BIGINT) AS q_val
FROM ex JOIN s USING (i)
GROUP BY ex.vec_id, s.j"""
