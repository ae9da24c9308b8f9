"""Deduplication operators over the ``documents`` table (doc_id, text, ...).

Beyond-the-reference operators a large-scale training-data pipeline needs
(driver brief): exact dedup, MinHash+LSH, SimHash, n-gram Jaccard
verification, embedding-cosine near-dup (in :mod:`.ann`).

Scale design: every operator is shuffle-shaped as
  per-batch vectorized signature -> explode to (bucket, doc_id) ->
  groupby(bucket) -> per-group candidate pairs -> signature-based verify
so the all-to-all exchanges move signatures/pairs, never document text.
Signatures are deterministic (fixed seeds) so reruns are stable.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# exact dedup (hash-partition + per-group first; ray_guide "Exact dedup")
# ---------------------------------------------------------------------------


def add_text_sha(batch: pa.Table) -> pa.Table:
    shas = [hashlib.sha256(t.encode("utf-8")).hexdigest()
            for t in batch.column("text").to_pylist()]
    return batch.append_column("text_sha", pa.array(shas, pa.string()))


def exact_dup_groups(docs_ds):
    """Duplicate-content groups: (text_sha, keep_doc_id, n_copies>1).

    sha256 per batch -> per-batch partial (sha, min_id, n) -> one
    hash-shuffle over partials (not raw text) -> filter n>1.
    """
    from .exact_agg import grouped_aggregate

    def sha_rows(batch: pa.Table) -> pa.Table:
        b = add_text_sha(batch.select(["doc_id", "text"]))
        return b.select(["text_sha", "doc_id"]).rename_columns(
            ["text_sha", "keep_doc_id"])

    rows = docs_ds.map_batches(sha_rows, batch_format="pyarrow")
    return grouped_aggregate(rows, ["text_sha"],
                             [("keep_doc_id", "min", "keep_doc_id"),
                              ("", "count", "n_copies")]) \
        .filter(expr="n_copies > 1")


def dedup_exact(docs_ds):
    """The kept-rows side: one row per distinct text (min doc_id wins)."""
    from .exact_agg import grouped_aggregate

    def sha_rows(batch: pa.Table) -> pa.Table:
        b = add_text_sha(batch.select(["doc_id", "text"]))
        return b.select(["text_sha", "doc_id"])

    rows = docs_ds.map_batches(sha_rows, batch_format="pyarrow")
    return grouped_aggregate(rows, ["text_sha"],
                             [("doc_id", "min", "doc_id")])


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup (shingle -> minhash -> band -> bucket groupby)
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int = 7):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Deterministic 64-bit hashes of char k-shingles (FNV-1a over bytes)."""
    data = text.encode("utf-8", "ignore")
    n = len(data)
    if n < k:
        data = data + b"\x00" * (k - n)
        n = k
    arr = np.frombuffer(data, dtype=np.uint8)
    # vectorized polynomial hash of each k-window
    h = np.zeros(n - k + 1, dtype=np.uint64)
    mult = np.uint64(1099511628211)
    for i in range(k):
        h = h * mult + arr[i:n - k + 1 + i].astype(np.uint64)
    return np.unique(h)


class MinHasher:
    """Actor-pool stage: text -> minhash signature (num_perm x uint64).

    Permutation params are built once per actor in ``__init__``.
    """

    def __init__(self, num_perm: int = 64, k: int = 5):
        self.a, self.b = _minhash_params(num_perm)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k)
        # (num_perm, n_shingles) universal hash, min over shingles
        v = (np.outer(self.a, sh) + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "sig": pa.array([s.astype(np.int64) for s in sigs],
                            pa.list_(pa.int64(), self.num_perm)),
        })


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int) -> pa.Table:
    ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
    sig = np.asarray(batch.column("sig").to_pylist(), dtype=np.uint64)
    out_band, out_hash, out_id = [], [], []
    for bi in range(bands):
        chunk = sig[:, bi * rows_per_band:(bi + 1) * rows_per_band]
        # order-sensitive mix of the band rows -> one 64-bit bucket hash
        h = np.zeros(len(ids), dtype=np.uint64)
        for c in range(chunk.shape[1]):
            h = h * np.uint64(1000003) + chunk[:, c]
        out_band.append(np.full(len(ids), bi, dtype=np.int64))
        out_hash.append(h.astype(np.int64))
        out_id.append(ids)
    return pa.table({
        "band": pa.array(np.concatenate(out_band), pa.int64()),
        "bucket": pa.array(np.concatenate(out_hash), pa.int64()),
        "doc_id": pa.array(np.concatenate(out_id), pa.int64()),
    })


def minhash_lsh_pairs(docs_ds, num_perm: int = 64, bands: int = 16,
                      threshold: float = 0.5, concurrency=None):
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    docs -> MinHasher actor pool -> band explode -> groupby(band, bucket)
    -> per-group pairs -> dedup pairs -> verify via signature agreement
    (fraction of equal minhashes estimates Jaccard; text never shuffles).
    Returns (a, b, jaccard_est) with a < b, jaccard_est >= threshold.
    """
    from ..util import default_pool

    if concurrency is None:
        concurrency = default_pool()
    rows_per_band = num_perm // bands
    sigs = docs_ds.map_batches(MinHasher, fn_constructor_args=(num_perm,),
                               batch_format="pyarrow", concurrency=concurrency)
    # keep the signatures for the verify stage (small: num_perm ints/doc)
    sigs = sigs.materialize()
    banded = sigs.map_batches(
        lambda b: _band_rows(b, bands, rows_per_band), batch_format="pyarrow")

    # Pair generation: grouping on raw (band, bucket) would make one
    # map_groups call PER BUCKET (~1 ms of Ray overhead each — 80k buckets
    # took 90 s).  Instead group on a COARSE hash of the bucket key (all
    # rows of one bucket still co-locate) and emit pairs for every
    # equal-key run with numpy inside each coarse group.
    from ..util import shuffle_partitions

    nsp = shuffle_partitions()

    def add_coarse(t: pa.Table) -> pa.Table:
        # bucket is already a hash: xor-fold with band, keep 10 bits
        # (1024 coarse groups; bit ops avoid int64 overflow)
        coarse = pc.bit_wise_and(pc.bit_wise_xor(t.column("bucket"),
                                                 t.column("band")), 1023)
        return t.append_column("coarse", coarse)

    def emit_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["band", "bucket", "doc_id"])
        band = g["band"].to_numpy()
        bucket = g["bucket"].to_numpy()
        ids = g["doc_id"].to_numpy()
        # run boundaries of equal (band, bucket)
        change = np.flatnonzero((band[1:] != band[:-1]) | (bucket[1:] != bucket[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(ids)]))
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            run = ids[s:e][:200]  # cap pathological mega-buckets
            iu, ju = np.triu_indices(len(run), k=1)
            out_a.append(run[iu])
            out_b.append(run[ju])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    raw_pairs = (banded.map_batches(add_coarse, batch_format="pyarrow")
                 .groupby("coarse", num_partitions=nsp)
                 .map_groups(emit_pairs_part, batch_format="pandas"))

    # verify FIRST (vectorized signature lookups — cheap even on the raw,
    # duplicated candidate stream), dedup AFTER thresholding: the surviving
    # pair set is orders of magnitude smaller than the candidate set, so
    # this drops a whole shuffle stage from the hot path
    import ray

    sig_tbl = pa.concat_tables(ray.get(sigs.to_arrow_refs()))
    ids_arr = sig_tbl.column("doc_id").to_numpy()
    sig_col = sig_tbl.column("sig").combine_chunks()
    sig_mat = sig_col.flatten().to_numpy().reshape(-1, num_perm).astype(np.uint64)
    order = np.argsort(ids_arr)
    sig_ref = ray.put((ids_arr[order], sig_mat[order]))

    class Verify:
        def __init__(self, ref):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            a = batch.column("a").to_numpy()
            b = batch.column("b").to_numpy()
            ia = np.searchsorted(self.ids, a)
            ib = np.searchsorted(self.ids, b)
            est = (self.mat[ia] == self.mat[ib]).mean(axis=1)
            t = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64()),
                          "jaccard_est": pa.array(est, pa.float64())})
            return t.filter(pc.greater_equal(t.column("jaccard_est"), threshold))

    verified = raw_pairs.map_batches(Verify, fn_constructor_args=(sig_ref,),
                                     batch_format="pyarrow", concurrency=(1, 2))

    from .exact_agg import grouped_aggregate

    return grouped_aggregate(verified, ["a", "b"],
                             [("jaccard_est", "min", "jaccard_est")],
                             num_partitions=4)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHasher:
    """text -> 64-bit simhash over \\w+ token hashes (deterministic)."""

    def __init__(self):
        import re
        self.tok = re.compile(r"\w+")

    def simhash(self, text: str) -> int:
        tokens = self.tok.findall(text.lower())
        if not tokens:
            return 0
        hs = np.array([int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "little")
            for t in tokens], dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
        score = (2 * bits.astype(np.int64) - 1).sum(axis=0)
        return int("".join("1" if s > 0 else "0" for s in score[::-1]), 2)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sh = [self.simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "simhash": pa.array(np.array(sh, dtype=np.uint64).astype(np.int64),
                                             pa.int64())})


def simhash_pairs(docs_ds, max_hamming: int = 3, concurrency=None):
    """Near-dup pairs by simhash: band the 64 bits into 4 x 16-bit chunks
    (any chunk equal -> candidate; Hamming<=3 guarantees a chunk match),
    verify Hamming distance on the full hash."""
    from ..util import default_pool

    if concurrency is None:
        concurrency = default_pool()
    sigs = docs_ds.map_batches(SimHasher, batch_format="pyarrow",
                               concurrency=concurrency)

    def explode(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=np.int64)
        sh = np.asarray(batch.column("simhash").to_pylist(), dtype=np.int64).astype(np.uint64)
        chunks, vals, oid, osh = [], [], [], []
        for c in range(4):
            chunks.append(np.full(len(ids), c, dtype=np.int64))
            vals.append(((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64))
            oid.append(ids)
            osh.append(sh.astype(np.int64))
        return pa.table({"chunk": pa.array(np.concatenate(chunks)),
                         "val": pa.array(np.concatenate(vals)),
                         "doc_id": pa.array(np.concatenate(oid)),
                         "simhash": pa.array(np.concatenate(osh))})

    # coarse-grouped vectorized pair generation (same pattern as
    # minhash_lsh_pairs: one map_groups call per coarse hash group, numpy
    # runs inside — never one Ray call per bucket)
    def add_coarse(t: pa.Table) -> pa.Table:
        coarse = pc.bit_wise_and(pc.bit_wise_xor(t.column("val"),
                                                 t.column("chunk")), 255)
        return t.append_column("coarse", coarse)

    def emit_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["chunk", "val", "doc_id"])
        chunk = g["chunk"].to_numpy()
        val = g["val"].to_numpy()
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        change = np.flatnonzero((chunk[1:] != chunk[:-1]) | (val[1:] != val[:-1]))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(ids)]))
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            run_ids = ids[s:e][:200]
            run_hs = hs[s:e][:200]
            iu, ju = np.triu_indices(len(run_ids), k=1)
            x = run_hs[iu] ^ run_hs[ju]
            # vectorized popcount via unpackbits on the 8 bytes
            ham = np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                                axis=1).sum(axis=1)
            keep = ham <= max_hamming
            out_a.append(run_ids[iu][keep])
            out_b.append(run_ids[ju][keep])
            out_h.append(ham[keep].astype(np.int64))
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b),
                             "hamming": np.concatenate(out_h)})

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate

    nsp = shuffle_partitions()
    raw = (sigs.map_batches(explode, batch_format="pyarrow")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse", num_partitions=nsp)
           .map_groups(emit_pairs_part, batch_format="pandas"))
    return grouped_aggregate(raw, ["a", "b"], [("hamming", "min", "hamming")])


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(docs_ds, candidate_pairs_ds, n: int = 3,
                        threshold: float = 0.5):
    """Exact word n-gram Jaccard for candidate pairs.

    Pair verification ships texts ONLY for candidate doc_ids (broadcast of
    the candidate subset — small by construction), never the full corpus.
    """
    import ray

    cand = candidate_pairs_ds.select_columns(["a", "b"]).to_pandas()
    needed = set(cand["a"]) | set(cand["b"])
    if not needed:
        return ray.data.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))

    def grams_partial(batch: pa.Table) -> pa.Table:
        ids, texts = [], []
        for i, t in zip(batch.column("doc_id").to_pylist(),
                        batch.column("text").to_pylist()):
            if i in needed:
                ids.append(i)
                texts.append(t)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text": pa.array(texts, pa.string())})

    subset = docs_ds.map_batches(grams_partial, batch_format="pyarrow").to_pandas()
    import re
    tok = re.compile(r"\w+")

    def gramset(text):
        ws = tok.findall(text.lower())
        return {tuple(ws[i:i + n]) for i in range(max(0, len(ws) - n + 1))}

    gs = {int(r.doc_id): gramset(r.text) for r in subset.itertuples()}
    rows = []
    for a, b in zip(cand["a"], cand["b"]):
        sa, sb = gs.get(int(a), set()), gs.get(int(b), set())
        u = len(sa | sb)
        j = (len(sa & sb) / u) if u else 0.0
        if j >= threshold:
            rows.append((int(a), int(b), round(j, 6)))
    return ray.data.from_pandas(pd.DataFrame(
        rows, columns=["a", "b", "jaccard"]).astype(
        {"a": "int64", "b": "int64", "jaccard": "float64"}))
