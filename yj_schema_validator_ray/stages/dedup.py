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


def _batch_window_hashes(col, k: int):
    """Per-doc char-k-window polynomial hashes for a WHOLE batch,
    straight from the Arrow string buffers: ONE windowed poly pass over
    the concatenated value buffer (k vectorized steps, the
    ``_fnv1a_rolling`` buffer-walk idea), then per-doc slices gathered
    with a grouped-arange — no ``to_pylist``, no per-doc hashing.
    Values are bit-identical to :func:`_shingle_hashes` minus the
    per-doc ``unique`` (min-based consumers are unaffected by dups).

    Returns ``(wins, win_offsets)``: doc i's window hashes are
    ``wins[win_offsets[i]:win_offsets[i+1]]`` (short docs get their one
    zero-padded window, computed individually — they cannot use the
    global pass because their window would cross into the next doc).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, np.uint64), np.zeros(1, np.int64)
    off_dtype = np.int64 if pa.types.is_large_string(col.type) else np.int32
    offs = np.frombuffer(col.buffers()[1], dtype=off_dtype)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    starts, lens = offs[:-1], offs[1:] - offs[:-1]
    mult = np.uint64(1099511628211)
    nw_global = max(len(data) - k + 1, 0)
    H = np.zeros(nw_global, dtype=np.uint64)
    d64 = data.astype(np.uint64)
    with np.errstate(over="ignore"):
        for i in range(k):
            H = H * mult + d64[i:nw_global + i]
    win_counts = np.where(lens >= k, lens - k + 1, 1)
    woffs = np.concatenate(([0], np.cumsum(win_counts)))
    wins = np.empty(int(woffs[-1]), dtype=np.uint64)
    normal = lens >= k
    if normal.any():
        nc = win_counts[normal]
        doc_sel = np.flatnonzero(normal)
        pos = np.arange(int(nc.sum())) - np.repeat(
            np.cumsum(nc) - nc, nc)
        src = np.repeat(starts[doc_sel], nc) + pos
        dst = np.repeat(woffs[:-1][doc_sel], nc) + pos
        wins[dst] = H[src]
    with np.errstate(over="ignore"):
        for d in np.flatnonzero(~normal):  # rare: doc shorter than k
            h = np.uint64(0)
            for byte in data[starts[d]:starts[d] + lens[d]]:
                h = h * mult + np.uint64(byte)
            for _ in range(k - int(lens[d])):  # zero padding
                h = h * mult
            wins[woffs[d]] = h
    return wins, woffs


class MinHasher:
    """Actor-pool stage: text -> minhash signature (num_perm x uint64).

    Permutation params are built once per actor in ``__init__``.  The
    batch path hashes every doc's char-5 windows in ONE vectorized
    buffer pass (no ``to_pylist``) and dedupes shingles ACROSS the
    batch before the (num_perm x shingle) universal-hash table is
    built — repetitive corpora share most shingles, so the modmul work
    collapses to O(num_perm x unique) and each doc's signature is a
    small cache-hot gather of its OWN unique rows from that table +
    min (a whole-chunk ``reduceat`` over the un-deduped gather measured
    3x slower on this memory-bound box: 750 MB of temps vs ~50 KB per
    doc).  Signatures are bit-identical to the per-doc
    :meth:`signature` path (pinned in tests).
    """

    #: windows per dedupe chunk — bounds the (unique x num_perm)
    #: hash table at ~32 MB (64 perms)
    CHUNK_WINDOWS = 1 << 16

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
        n = batch.num_rows
        if n == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "sig": pa.array([], pa.list_(pa.int64(),
                                                          self.num_perm))})
        wins, woffs = _batch_window_hashes(batch.column("text"), self.k)
        sigs = np.empty((n, self.num_perm), dtype=np.uint64)
        i = 0
        while i < n:
            j = i + 1  # at least one doc per chunk
            while j < n and woffs[j + 1] - woffs[i] <= self.CHUNK_WINDOWS:
                j += 1
            seg = wins[woffs[i]:woffs[j]]
            uniq, inv = np.unique(seg, return_inverse=True)
            with np.errstate(over="ignore"):
                # (unique, num_perm) C-order: each doc then gathers only
                # its OWN unique rows — a ~50 KB cache-hot block
                vals = (uniq[:, None] * self.a[None, :]
                        + self.b[None, :]) % np.uint64(_MERSENNE)
            base = woffs[i]
            for d in range(i, j):
                ids = np.unique(inv[woffs[d] - base:woffs[d + 1] - base])
                sigs[d] = vals[ids].min(axis=0)
            i = j
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sigs.reshape(-1).astype(np.int64)), self.num_perm),
        })


def _band_rows(batch: pa.Table, bands: int, rows_per_band: int) -> pa.Table:
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    sig = _fixed_list_matrix(batch.column("sig")).view(np.uint64)
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
                      threshold: float = 0.5,
                      broadcast_max_bytes: int = 256 << 20):
    """Near-duplicate candidate pairs with signature-estimated Jaccard.

    docs -> MinHasher actor pool -> band explode -> groupby(band, bucket)
    -> per-group pairs -> dedup pairs -> verify via signature agreement
    (fraction of equal minhashes estimates Jaccard; text never shuffles).
    Returns (a, b, jaccard_est) with a < b, jaccard_est >= threshold.

    ``broadcast_max_bytes`` is forwarded to the adaptive pair<->signature
    join (0 forces the fully distributed two-exchange shuffle plan — the
    TB-scale path; both plans are pinned row-identical in tests).
    """
    from ..util import process_cached

    rows_per_band = num_perm // bands
    # stateless tasks + per-worker-process hasher cache: MinHasher state
    # is two small permutation arrays, so warm task workers beat the
    # ~5 s actor-pool spin-up (same trade as validator task mode)
    sigs = docs_ds.map_batches(
        process_cached(MinHasher, (num_perm, 5), num_perm),
        batch_format="pyarrow")
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
            run = ids[s:e]
            head = run[:200]  # quadratic emission only up to the cap
            iu, ju = np.triu_indices(len(head), k=1)
            out_a.append(head[iu])
            out_b.append(head[ju])
            if n > 200:
                # mega-bucket tail: STAR edges to the bucket head instead
                # of a silent drop — every member stays a candidate (the
                # Jaccard verify confirms or rejects each edge, and
                # connected-components clustering stays whole) at linear
                # instead of quadratic pair count
                tail = run[200:]
                out_a.append(np.full(len(tail), run[0], dtype=ids.dtype))
                out_b.append(tail)
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    raw_pairs = (banded.map_batches(add_coarse, batch_format="pyarrow")
                 .groupby("coarse", num_partitions=nsp)
                 .map_groups(emit_pairs_part, batch_format="pandas"))

    # verify via a DISTRIBUTED pair<->signature join: signatures are never
    # collected on the driver (at 10^9 docs x 64 perms that would be
    # ~0.5 TB on one node).  Multi-band duplicate candidates are deduped
    # in-flight inside the join's first exchange.
    verified = join_pairs_with_signatures(
        raw_pairs, sigs, "sig", num_partitions=nsp,
        broadcast_max_bytes=broadcast_max_bytes)

    def score(batch: pa.Table) -> pa.Table:
        sa = _unpack_binary_matrix(batch.column("sig_a"))
        sb = _unpack_binary_matrix(batch.column("sig_b"))
        est = (sa == sb).mean(axis=1) if len(sa) else np.zeros(0)
        t = pa.table({"a": batch.column("a"), "b": batch.column("b"),
                      "jaccard_est": pa.array(est, pa.float64())})
        return t.filter(pc.greater_equal(t.column("jaccard_est"), threshold))

    return verified.map_batches(score, batch_format="pyarrow")


def _fixed_list_matrix(col) -> np.ndarray:
    """Zero-copy (doc, k) matrix from a fixed-size-list column."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if len(col) == 0:
        return np.zeros((0, 1), dtype=np.int64)
    return col.flatten().to_numpy(zero_copy_only=False).reshape(len(col), -1)


def _pack_list_binary(col) -> pa.Array:
    """list<int64> column (fixed or variable size) -> one little-endian
    binary blob per row (Acero hash joins accept binary payloads but not
    list columns)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype("<i8")
    lens = pc.list_value_length(col).fill_null(0).to_numpy().astype(np.int64)
    offs = np.concatenate(([0], np.cumsum(lens))).astype(np.int32) * 8
    return pa.Array.from_buffers(
        pa.binary(), len(col),
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(flat.tobytes())])


def _unpack_binary_matrix(col) -> np.ndarray:
    """Inverse of :func:`_pack_binary` (handles sliced/taken arrays)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros((0, 1), dtype=np.int64)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    width = int(offs[1] - offs[0])
    idx = offs[:-1, None] + np.arange(width)[None, :]
    return np.ascontiguousarray(data[idx]).view("<i8").reshape(n, width // 8)


def coarse_mix(arr: np.ndarray, mask: int = 1023) -> np.ndarray:
    """Shared Fibonacci-hash coarse bucketing (one definition — three
    stages partition by it and must agree)."""
    h = arr.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
    return ((h >> np.uint64(33)) & np.uint64(mask)).astype(np.int64)


def _gather_blobs(data: np.ndarray, offs: np.ndarray,
                  idx: np.ndarray) -> pa.Array:
    """Vectorized gather of variable-width blobs[idx] into a fresh
    Arrow binary array (no per-row Python).  int64 cumsum; the int32
    Arrow offsets are range-checked (callers bound batch bytes)."""
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(lens, dtype=np.int64)))
    total = int(cum[-1])
    if total > np.iinfo(np.int32).max:
        raise ValueError(
            f"blob gather of {total} bytes overflows int32 Arrow offsets; "
            "reduce the attach batch size")
    new_offs = cum.astype(np.int32)
    within = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], lens)
    out = data[np.repeat(offs[idx], lens) + within]
    return pa.Array.from_buffers(
        pa.binary(), len(idx),
        [None, pa.py_buffer(new_offs.tobytes()),
         pa.py_buffer(np.ascontiguousarray(out).tobytes())])


class _BroadcastAttacher:
    """Task-mode GENERATOR stage: attach broadcast (id -> blob)
    attributes to both sides of a deduped pair batch (inner semantics —
    unknown ids drop).  Output is yielded in slices whose gathered bytes
    stay well under the int32 Arrow offset limit, so arbitrarily large
    input blocks are safe without forcing a map_batches ``batch_size``
    (whose cross-block bundling stalls the streaming executor on the
    many tiny blocks a groupby emits)."""

    MAX_SLICE_BYTES = 256 << 20

    def __init__(self, ref, attr_col: str):
        import ray

        self.ids, self.offs, self.data = ray.get(ref)
        self.lens = self.offs[1:] - self.offs[:-1]  # once per process
        self.attr_col = attr_col

    def __call__(self, batch: pa.Table):
        a = batch.column("a").to_numpy()
        b = batch.column("b").to_numpy()
        ia = np.searchsorted(self.ids, a)
        ib = np.searchsorted(self.ids, b)
        ia_c = np.minimum(ia, len(self.ids) - 1)
        ib_c = np.minimum(ib, len(self.ids) - 1)
        ok = (self.ids[ia_c] == a) & (self.ids[ib_c] == b)
        sel = np.flatnonzero(ok)
        row_bytes = self.lens[ia_c[sel]] + self.lens[ib_c[sel]] + 16
        cuts = np.searchsorted(np.cumsum(row_bytes),
                               np.arange(1, 1 + (int(row_bytes.sum())
                                                 // self.MAX_SLICE_BYTES))
                               * self.MAX_SLICE_BYTES)
        parts = [p for p in np.split(sel, cuts) if len(p)]
        if not parts:  # keep the schema: a yield-nothing batch would
            parts = [sel]  # make an all-dropped dataset schema-less
        for part in parts:
            yield pa.table({
                "a": pa.array(a[part], pa.int64()),
                "b": pa.array(b[part], pa.int64()),
                self.attr_col + "_a": _gather_blobs(self.data, self.offs,
                                                    ia_c[part]),
                self.attr_col + "_b": _gather_blobs(self.data, self.offs,
                                                    ib_c[part]),
            })


def join_pairs_with_signatures(pairs_ds, attrs_ds, attr_col: str,
                               num_partitions: int | None = None,
                               id_col: str = "doc_id", coarse: int = 1024,
                               broadcast_max_bytes: int = 256 << 20):
    """Distributed attachment of a per-doc attribute to both sides of a
    candidate-pair dataset: ``(a, b)`` ⋈ ``(doc_id, attr)`` — nothing on
    the driver beyond a bounded broadcast.  Duplicate candidate pairs
    (multi-band hits) are deduped in-flight.

    ADAPTIVE plan, the classic broadcast-vs-shuffle join choice:

    - attribute side <= ``broadcast_max_bytes`` (materialized Arrow
      size): dedupe pairs with one tiny 16-byte-row exchange, then
      attach blobs from a ``ray.put`` broadcast of the packed attribute
      table inside stateless map tasks (vectorized searchsorted +
      blob gather).  The blob-sized data never shuffles at all.
    - larger: the fully distributed two-exchange path below (at 10^9
      docs x 64 perms the signature side is ~0.5 TB — broadcasting is
      impossible, shuffling is the only correct shape).

    The shuffle path is two coarse-hash groupby exchanges (the same
    sort-based shuffle machinery as :mod:`.exact_agg`; Ray's dedicated
    hash-shuffle join operator costs seconds of aggregator-actor
    spin-up per join, which dominates at interactive scale and adds
    nothing at cluster scale):

    1. union(pair requests keyed by each side, attr rows keyed by id)
       -> groupby(coarse(key)) -> vectorized pandas merge per partition
       -> (a, b, slot, attr)
    2. groupby(coarse(pair)) -> slot pivot -> (a, b, attr_a, attr_b).

    List attributes are packed to per-row binary blobs (unpack with
    :func:`_unpack_binary_matrix`); shuffles move ids + blobs only.
    """
    import ray

    from ..util import process_cached, ref_key, shuffle_partitions
    from .exact_agg import grouped_aggregate

    if num_partitions is None:
        num_partitions = shuffle_partitions()

    mat = attrs_ds.materialize()
    if (mat.size_bytes() or broadcast_max_bytes + 1) <= broadcast_max_bytes:
        tbl = pa.concat_tables(ray.get(mat.to_arrow_refs()))
        attr = tbl.column(attr_col)
        if pa.types.is_fixed_size_list(attr.type) or pa.types.is_list(attr.type):
            attr = _pack_list_binary(attr)
        elif isinstance(attr, pa.ChunkedArray):
            attr = attr.combine_chunks()
        ids = tbl.column(id_col).to_numpy()
        order = np.argsort(ids, kind="stable")
        attr = attr.take(pa.array(order))
        n = len(attr)
        offs = np.frombuffer(attr.buffers()[1], dtype=np.int32)[
            attr.offset:attr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(attr.buffers()[2], dtype=np.uint8)
        ref = ray.put((ids[order], offs - offs[0],
                       data[offs[0]:offs[-1]]))
        deduped = grouped_aggregate(
            pairs_ds, ["a", "b"], [("", "count", "__n")],
            num_partitions=num_partitions).map_batches(
                lambda t: t.select(["a", "b"]), batch_format="pyarrow")
        return deduped.map_batches(
            process_cached(_BroadcastAttacher, (ref_key(ref), attr_col),
                           ref, attr_col),
            batch_format="pyarrow")

    def mix(arr: np.ndarray) -> np.ndarray:
        return coarse_mix(arr, coarse - 1)

    def to_requests(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy()
        b = t.column("b").to_numpy()
        key = np.concatenate([a, b])
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "a": pa.array(np.concatenate([a, a]), pa.int64()),
            "b": pa.array(np.concatenate([b, b]), pa.int64()),
            "slot": pa.array(np.repeat([0, 1], len(a)), pa.int64()),
            "sig": pa.array([b""] * (2 * len(a)), pa.binary()),
            "coarse": pa.array(mix(key), pa.int64()),
        })

    def to_attr_rows(t: pa.Table) -> pa.Table:
        attr = t.column(attr_col)
        if pa.types.is_fixed_size_list(attr.type) or pa.types.is_list(attr.type):
            attr = _pack_list_binary(attr)
        elif isinstance(attr, pa.ChunkedArray):
            attr = attr.combine_chunks()
        key = t.column(id_col).to_numpy()
        minus1 = pa.array(np.full(len(key), -1, dtype=np.int64))
        return pa.table({
            "key": pa.array(key, pa.int64()),
            "a": minus1, "b": minus1, "slot": minus1,
            "sig": attr,
            "coarse": pa.array(mix(key), pa.int64()),
        })

    # shuffle path reads the already-materialized copy — never re-runs
    # the attribute lineage a second time
    u = (pairs_ds.map_batches(to_requests, batch_format="pyarrow")
         .union(mat.map_batches(to_attr_rows, batch_format="pyarrow")))

    def attach(g: pd.DataFrame) -> pd.DataFrame:
        is_attr = g["slot"] < 0
        sig_rows = g.loc[is_attr, ["key", "sig"]]
        req = g.loc[~is_attr, ["key", "a", "b", "slot"]].drop_duplicates()
        m = req.merge(sig_rows, on="key", how="inner")
        return m[["a", "b", "slot", "sig"]]

    stage1 = (u.groupby("coarse", num_partitions=num_partitions)
              .map_groups(attach, batch_format="pandas"))

    def add_pair_coarse(t: pa.Table) -> pa.Table:
        a = t.column("a").to_numpy().astype(np.uint64)
        b = t.column("b").to_numpy().astype(np.uint64)
        return t.append_column(
            "coarse2", pa.array(mix((a * np.uint64(1000003)) ^ b), pa.int64()))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        s0 = g.loc[g["slot"] == 0, ["a", "b", "sig"]].rename(
            columns={"sig": attr_col + "_a"})
        s1 = g.loc[g["slot"] == 1, ["a", "b", "sig"]].rename(
            columns={"sig": attr_col + "_b"})
        return s0.merge(s1, on=["a", "b"], how="inner")

    return (stage1.map_batches(add_pair_coarse, batch_format="pyarrow")
            .groupby("coarse2", num_partitions=num_partitions)
            .map_groups(combine, batch_format="pandas")
            .map_batches(lambda t: t.select(
                ["a", "b", attr_col + "_a", attr_col + "_b"]),
                batch_format="pyarrow"))


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------

class SimHasher:
    """text -> 64-bit simhash over \\w+ token hashes (deterministic)."""

    def __init__(self):
        import re
        self.tok = re.compile(r"[0-9A-Za-z_]+")  # ASCII class == RE2 \w (oracle parity)

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
        # whole-batch path, bit-identical to per-doc simhash() (pinned in
        # tests): factorize tokens across the batch, blake2b only the
        # UNIQUE tokens, per-doc bit-count via segment sums of the
        # gathered (token x 64) bit table
        texts = batch.column("text").to_pylist()
        ndocs = len(texts)
        sh = np.zeros(ndocs, dtype=np.uint64)
        if ndocs:
            toks = [self.tok.findall(t.lower()) for t in texts]
            lens = np.fromiter((len(x) for x in toks), np.int64, ndocs)
            total = int(lens.sum())
            if total:
                flat = np.empty(total, dtype=object)
                pos = 0
                for ws in toks:
                    flat[pos:pos + len(ws)] = ws
                    pos += len(ws)
                codes, uniques = pd.factorize(flat)
                uh = np.fromiter(
                    (int.from_bytes(hashlib.blake2b(
                        t.encode(), digest_size=8).digest(), "little")
                     for t in uniques), np.uint64, len(uniques))
                # (unique, 64) bit table, bit s == (h >> s) & 1
                bits = np.unpackbits(uh[:, None].view(np.uint8), axis=1,
                                     bitorder="little").astype(np.int32)
                offs = np.concatenate(([0], np.cumsum(lens)))
                nz = np.flatnonzero(lens)
                ones = np.add.reduceat(bits[codes], offs[nz], axis=0)
                score = 2 * ones - lens[nz, None]
                sh[nz] = ((score > 0).astype(np.uint64)
                          << np.arange(64, dtype=np.uint64)[None, :]
                          ).sum(axis=1, dtype=np.uint64)
        # sha64 = first 8 bytes of sha256(text): lets the pair generator
        # keep same-sha (exact-dup) members CONTIGUOUS inside oversized
        # band buckets, so the exact-dup pair-completeness certificate
        # (accuracy.simhash_accuracy) holds structurally past the cap
        sha64 = np.fromiter(
            (int.from_bytes(hashlib.sha256(t.encode("utf-8")).digest()[:8],
                            "little") for t in texts),
            np.uint64, ndocs).view(np.int64) if ndocs else \
            np.empty(0, np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "simhash": pa.array(sh.astype(np.int64),
                                             pa.int64()),
                         "sha64": pa.array(sha64, pa.int64())})


def simhash_pairs(docs_ds, max_hamming: int = 3):
    """Near-dup pairs by simhash: band the 64 bits into 4 x 16-bit chunks
    (any chunk equal -> candidate; Hamming<=3 guarantees a chunk match),
    verify Hamming distance on the full hash.

    Oversized band buckets (>200 members) switch from quadratic emission
    to head-200 quadratic + verified star edges, PLUS full quadratic for
    every same-sha run (<=200 members) touching the capped tail — so the
    exact-duplicate pair-completeness certificate
    (:func:`..pipelines.accuracy.simhash_accuracy`) holds structurally
    even when a mega bucket mixes several small identical-text groups.
    Pairs are emitted (min, max)-normalized and MAY repeat across bands /
    straddling runs; consumers aggregate or dedupe per (a, b)."""
    from ..util import process_cached

    sigs = docs_ds.map_batches(process_cached(SimHasher, ()),
                               batch_format="pyarrow")

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(
            zero_copy_only=False).astype(np.uint64)
        sha64 = batch.column("sha64").to_numpy(zero_copy_only=False)
        chunks, vals, oid, osh, osha = [], [], [], [], []
        for c in range(4):
            chunks.append(np.full(len(ids), c, dtype=np.int64))
            vals.append(((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64))
            oid.append(ids)
            osh.append(sh.astype(np.int64))
            osha.append(sha64)
        return pa.table({"chunk": pa.array(np.concatenate(chunks)),
                         "val": pa.array(np.concatenate(vals)),
                         "doc_id": pa.array(np.concatenate(oid)),
                         "simhash": pa.array(np.concatenate(osh)),
                         "sha64": pa.array(np.concatenate(osha))})

    # coarse-grouped vectorized pair generation (same pattern as
    # minhash_lsh_pairs: one map_groups call per coarse hash group, numpy
    # runs inside — never one Ray call per bucket)
    def add_coarse(t: pa.Table) -> pa.Table:
        coarse = pc.bit_wise_and(pc.bit_wise_xor(t.column("val"),
                                                 t.column("chunk")), 255)
        return t.append_column("coarse", coarse)

    from functools import partial

    from ..util import shuffle_partitions
    from .exact_agg import grouped_aggregate

    nsp = shuffle_partitions()
    raw = (sigs.map_batches(explode, batch_format="pyarrow")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse", num_partitions=nsp)
           .map_groups(partial(_emit_band_pairs, max_hamming=max_hamming),
                       batch_format="pandas"))
    return grouped_aggregate(raw, ["a", "b"], [("hamming", "min", "hamming")])


def _emit_band_pairs(g: pd.DataFrame, max_hamming: int = 3,
                     cap: int = 200) -> pd.DataFrame:
    """One coarse group of exploded (chunk, val, doc_id, simhash, sha64)
    band rows -> verified candidate pairs.  Module-level so the capped
    mixed-mega-bucket regime is unit-testable on synthetic signatures."""
    # sha64 in the sort key keeps exact-dup (same-sha) members
    # CONTIGUOUS within each band bucket, so the capped regime below
    # can still emit every same-sha pair for sha groups <= cap
    g = g.sort_values(["chunk", "val", "sha64", "doc_id"])
    chunk = g["chunk"].to_numpy()
    val = g["val"].to_numpy()
    ids = g["doc_id"].to_numpy()
    hs = g["simhash"].to_numpy().astype(np.uint64)
    sha = g["sha64"].to_numpy()
    change = np.flatnonzero((chunk[1:] != chunk[:-1]) | (val[1:] != val[:-1]))
    starts = np.concatenate(([0], change + 1))
    ends = np.concatenate((change + 1, [len(ids)]))
    out_a, out_b, out_h = [], [], []

    def _ham(x: np.ndarray) -> np.ndarray:
        # vectorized popcount via unpackbits on the 8 bytes
        return np.unpackbits(x.view(np.uint8).reshape(len(x), 8),
                             axis=1).sum(axis=1)

    def _quad(lo: int, hi: int) -> None:
        iu, ju = np.triu_indices(hi - lo, k=1)
        seg_ids, seg_hs = ids[lo:hi], hs[lo:hi]
        ham = _ham(seg_hs[iu] ^ seg_hs[ju])
        keep = ham <= max_hamming
        a, b = seg_ids[iu][keep], seg_ids[ju][keep]
        out_a.append(np.minimum(a, b))
        out_b.append(np.maximum(a, b))
        out_h.append(ham[keep].astype(np.int64))

    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        _quad(s, min(e, s + cap))
        if e - s > cap:
            # mega-bucket tail: star edges to the bucket head (full
            # Hamming verify per edge) instead of a silent drop —
            # linear emission keeps every member a candidate
            tail_ids = ids[s:e][cap:]
            ham_t = _ham(hs[s:e][cap:] ^ hs[s])
            keep_t = ham_t <= max_hamming
            a_t = np.full(int(keep_t.sum()), ids[s], dtype=ids.dtype)
            b_t = tail_ids[keep_t]
            out_a.append(np.minimum(a_t, b_t))
            out_b.append(np.maximum(a_t, b_t))
            out_h.append(ham_t[keep_t].astype(np.int64))
            # exact-dup completeness past the cap: same-sha runs that
            # touch the capped tail get their full quadratic emitted
            # (bounded: each run <= cap, or it is a mega sha group
            # excluded from the pair-completeness claim by design)
            seg_sha = sha[s:e]
            r_change = np.flatnonzero(seg_sha[1:] != seg_sha[:-1])
            r_starts = np.concatenate(([0], r_change + 1))
            r_ends = np.concatenate((r_change + 1, [e - s]))
            for rs, re_ in zip(r_starts, r_ends):
                if re_ - rs < 2 or re_ - rs > cap or re_ <= cap:
                    continue  # inside the head quad, or mega sha run
                _quad(s + rs, s + re_)
    if not out_a:
        return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                             "b": pd.Series([], dtype="int64"),
                             "hamming": pd.Series([], dtype="int64")})
    return pd.DataFrame({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b),
                         "hamming": np.concatenate(out_h)})


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, for candidate pairs)
# ---------------------------------------------------------------------------

class NGramHasher:
    """Actor-pool stage: text -> sorted unique 64-bit word n-gram hashes
    for the broadcast candidate doc-id subset (ids only — 8 bytes each;
    texts never leave their blocks, gram sets shuffle through the pair
    join instead of being collected on the driver)."""

    def __init__(self, ids_ref, n: int):
        import ray
        import re

        self.wanted = pa.array(np.sort(ray.get(ids_ref)), pa.int64())
        self.tok = re.compile(r"[0-9A-Za-z_]+")  # ASCII class == RE2 \w (oracle parity)
        self.n = n

    def gram_hashes(self, text: str) -> np.ndarray:
        ws = self.tok.findall(text.lower())
        if len(ws) < self.n:
            return np.zeros(0, dtype=np.int64)
        # deterministic token hashes (pandas SipHash, fixed key), then a
        # rolling polynomial combine over each n-window — vectorized
        th = pd.util.hash_array(np.array(ws, dtype=object)).astype(np.uint64)
        h = np.zeros(len(ws) - self.n + 1, dtype=np.uint64)
        mult = np.uint64(1099511628211)
        for i in range(self.n):
            h = h * mult + th[i:len(ws) - self.n + 1 + i]
        return np.unique(h).astype(np.int64)

    def batch_grams(self, texts: list[str]) -> pa.ListArray:
        """Whole-batch :meth:`gram_hashes` (bit-identical, pinned in
        tests): factorize tokens ACROSS the batch (one hash pass instead
        of a per-doc ``hash_array`` — which re-factorizes internally per
        call, 0.9 s/batch on the bench corpus), SipHash only the unique
        tokens, then ONE global rolling-poly pass over the concatenated
        token hashes gathering only windows that stay inside their doc;
        per-doc unsigned-sort-unique via a single lexsort."""
        ndocs = len(texts)
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(ndocs + 1, np.int32), pa.int32()),
            pa.array([], pa.int64()))
        if ndocs == 0:
            return empty
        toks = [self.tok.findall(t.lower()) for t in texts]
        lens = np.fromiter((len(x) for x in toks), np.int64, ndocs)
        total = int(lens.sum())
        nw = np.where(lens >= self.n, lens - self.n + 1, 0)
        if total < self.n or int(nw.sum()) == 0:
            return empty
        flat = np.empty(total, dtype=object)
        pos = 0
        for ws in toks:
            flat[pos:pos + len(ws)] = ws
            pos += len(ws)
        codes, uniques = pd.factorize(flat)
        uh = pd.util.hash_array(np.asarray(uniques, dtype=object)
                                ).astype(np.uint64)
        th = uh[codes]
        mult = np.uint64(1099511628211)
        ng = total - self.n + 1
        H = np.zeros(ng, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.n):
                H = H * mult + th[i:ng + i]
        offs = np.concatenate(([0], np.cumsum(lens)))
        # valid window start positions: offs[d] .. offs[d]+nw[d]-1
        rel = np.arange(int(nw.sum())) - np.repeat(np.cumsum(nw) - nw, nw)
        starts = np.repeat(offs[:-1], nw) + rel
        wins = H[starts]
        doc_of = np.repeat(np.arange(ndocs, dtype=np.int64), nw)
        order = np.lexsort((wins, doc_of))
        dv, wv = doc_of[order], wins[order]
        keep = np.concatenate(
            ([True], (dv[1:] != dv[:-1]) | (wv[1:] != wv[:-1])))
        counts = np.bincount(dv[keep], minlength=ndocs)
        return pa.ListArray.from_arrays(
            pa.array(np.concatenate(([0], np.cumsum(counts))).astype(
                np.int32), pa.int32()),
            pa.array(wv[keep].astype(np.int64), pa.int64()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch.column("doc_id"), value_set=self.wanted)
        b = batch.filter(keep)
        return pa.table({
            "doc_id": b.column("doc_id"),
            "grams": self.batch_grams(b.column("text").to_pylist()),
        })


def _blob_values(col) -> tuple[np.ndarray, np.ndarray]:
    """(flat int64 values, per-row lengths) of a binary-blob column
    holding packed int64 arrays — zero-copy from the Arrow buffers."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    offs = np.frombuffer(col.buffers()[1], dtype=np.int32)[
        col.offset:col.offset + n + 1].astype(np.int64)
    data = np.frombuffer(col.buffers()[2], dtype=np.uint8)
    vals = data[offs[0]:offs[-1]].view("<i8")
    return vals, (offs[1:] - offs[:-1]) // 8


def _score_jaccard(batch: pa.Table, threshold: float) -> pa.Table:
    """Exact Jaccard on joined gram-blob pairs (sorted unique int64 hash
    arrays packed as binary), vectorized across the whole batch: tag
    every gram with its pair index, one lexsort, count adjacent
    (pair, gram) duplicates — each side's set is unique, so duplicates
    ARE the intersection.  No per-pair Python loop.

    Filter on the RAW quotient, round the reported value
    half-away-from-zero to 6 decimals — the same formula the DuckDB
    oracle uses (``floor(j*1e6+0.5)/1e6``; Python's round is
    half-to-even and would flip midpoints)."""
    n = batch.num_rows
    if n == 0:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    va, la = _blob_values(batch.column("grams_a"))
    vb, lb = _blob_values(batch.column("grams_b"))
    idx = np.arange(n)
    ids = np.concatenate([np.repeat(idx, la), np.repeat(idx, lb)])
    vals = np.concatenate([va, vb])
    order = np.lexsort((vals, ids))
    ids_s, vals_s = ids[order], vals[order]
    dup = (ids_s[1:] == ids_s[:-1]) & (vals_s[1:] == vals_s[:-1])
    inter = np.bincount(ids_s[1:][dup], minlength=n)
    union = la + lb - inter
    with np.errstate(invalid="ignore", divide="ignore"):
        j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
    keep = j >= threshold
    return pa.table({
        "a": pc.take(batch.column("a"), pa.array(np.flatnonzero(keep))),
        "b": pc.take(batch.column("b"), pa.array(np.flatnonzero(keep))),
        "jaccard": pa.array(np.floor(j[keep] * 1e6 + 0.5) / 1e6,
                            pa.float64()),
    })


class AllNGramHasher(NGramHasher):
    """Gram-hash sets for EVERY document (no candidate-id filter) — feeds
    the exact AllPairs prefix-filter join."""

    def __init__(self, n: int):
        import re

        self.tok = re.compile(r"[0-9A-Za-z_]+")  # ASCII class == RE2 \w (oracle parity)
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "grams": self.batch_grams(batch.column("text").to_pylist()),
        })


def ngram_jaccard_exact_pairs(docs_ds, n: int = 3, threshold: float = 0.3,
                              full_triu_max: int = 3000):
    """EXACT all-pairs word n-gram Jaccard >= threshold — no LSH, no
    sampling, fully distributed, SQL-oracle-able (DuckDB gram self-join).

    The scale story is the AllPairs/PPJoin prefix filter (Bayardo et al.
    WWW'07; Xiao et al. WWW'08): under a fixed global gram order (we use
    the unsigned hash value, which is what :meth:`NGramHasher.gram_hashes`
    already sorts by), two sets with ``J(A,B) >= t`` MUST share a gram
    within the first ``|A| - ceil(t*|A|) + 1`` grams of each — so the
    inverted index receives only each doc's prefix (~(1-t) of its grams)
    and candidate generation stays exact while hot stopword-ish grams
    (which sort late for most docs only by chance) shrink the exchange.
    A length filter (``min_sz >= t * max_sz`` — necessary since
    ``J <= |smaller| / |larger|``) prunes inside each gram run before
    pairs are emitted.  Verification attaches full gram sets to both pair
    sides via the same hash-shuffle join as the MinHash verify
    (:func:`join_pairs_with_signatures`); document text never shuffles
    and nothing reaches the driver.
    """
    from ..util import process_cached, shuffle_partitions

    nsp = shuffle_partitions()
    # consumed twice (prefix explode + verify join): materialize the
    # small gram-set table once (ids + hash lists only, never text)
    grams = docs_ds.map_batches(process_cached(AllNGramHasher, (n,), n),
                                batch_format="pyarrow").materialize()

    def prefix_rows(t: pa.Table) -> pa.Table:
        col = t.column("grams")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = t.column("doc_id").to_numpy()
        lens = pc.list_value_length(col).fill_null(0).to_numpy().astype(np.int64)
        flat = col.flatten().to_numpy(zero_copy_only=False)
        plen = np.minimum(
            np.maximum(lens - np.ceil(threshold * lens).astype(np.int64) + 1, 0),
            lens)
        starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
        tot = int(plen.sum())
        within = (np.arange(tot)
                  - np.repeat(np.concatenate(([0], np.cumsum(plen)))[:-1], plen))
        take = np.repeat(starts, plen) + within
        return pa.table({
            "gram": pa.array(flat[take], pa.int64()),
            "doc_id": pa.array(np.repeat(ids, plen), pa.int64()),
            "sz": pa.array(np.repeat(lens, plen), pa.int64()),
            "pos": pa.array(within, pa.int64()),
        })

    def add_coarse(t: pa.Table) -> pa.Table:
        return t.append_column(
            "coarse",
            pa.array(coarse_mix(t.column("gram").to_numpy()), pa.int64()))

    # PPJoin positional filter: a pair found at the FIRST shared prefix
    # gram (position pa in A, pb in B) can have overlap at most
    # 1 + min(|A|-pa-1, |B|-pb-1); J >= t needs overlap >=
    # t/(1+t) * (|A|+|B|).  Any true pair passes this at its first
    # shared gram (all other shared grams sort after it in BOTH lists),
    # so filtering every occurrence independently and keeping a pair if
    # ANY occurrence passes admits no false negatives — later-occurrence
    # false positives are killed by the exact verify.
    alpha_coef = threshold / (1.0 + threshold)

    def emit_pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["gram", "doc_id"])
        gram = g["gram"].to_numpy()
        ids = g["doc_id"].to_numpy()
        sz = g["sz"].to_numpy()
        pos = g["pos"].to_numpy()
        change = np.flatnonzero(gram[1:] != gram[:-1])
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [len(ids)]))
        out_a, out_b = [], []

        def filt(run_ids, run_sz, run_pos, iu, ju):
            lo = np.minimum(run_sz[iu], run_sz[ju])
            hi = np.maximum(run_sz[iu], run_sz[ju])
            keep = lo >= threshold * hi  # J <= lo/hi — exact necessary cond
            ubound = 1 + np.minimum(run_sz[iu] - run_pos[iu] - 1,
                                    run_sz[ju] - run_pos[ju] - 1)
            keep &= ubound >= alpha_coef * (run_sz[iu] + run_sz[ju])
            out_a.append(run_ids[iu][keep])
            out_b.append(run_ids[ju][keep])

        for s, e in zip(starts, ends):
            n_run = e - s
            if n_run < 2:
                continue
            run_ids, run_sz, run_pos = ids[s:e], sz[s:e], pos[s:e]
            if n_run <= full_triu_max:  # full triu fits (<4.5M pairs)
                iu, ju = np.triu_indices(n_run, k=1)
                filt(run_ids, run_sz, run_pos, iu, ju)
                continue
            # pathological hot-gram run: emit in ~2M-pair chunks so the
            # index arrays never exceed a bounded footprint (exactness
            # forbids the cap the minhash candidate path uses)
            block = max(1, 2_000_000 // n_run)
            for c0 in range(0, n_run - 1, block):
                i_idx = np.arange(c0, min(c0 + block, n_run - 1))
                counts = (n_run - 1) - i_idx
                iu = np.repeat(i_idx, counts)
                offs_ = np.concatenate(([0], np.cumsum(counts)))[:-1]
                ju = (np.arange(len(iu)) - np.repeat(offs_, counts)
                      + iu + 1)
                filt(run_ids, run_sz, run_pos, iu, ju)
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                 "b": pd.Series([], dtype="int64")})
        # partition-local dedupe: pairs found via several grams of this
        # partition collapse before they hit the global exchange
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)}).drop_duplicates()

    raw = (grams.map_batches(prefix_rows, batch_format="pyarrow")
           .map_batches(add_coarse, batch_format="pyarrow")
           .groupby("coarse", num_partitions=nsp)
           .map_groups(emit_pairs_part, batch_format="pandas"))
    # multi-gram candidate dupes collapse inside the join's in-flight
    # dedupe (both the broadcast and the shuffle plan dedupe pairs)
    joined = join_pairs_with_signatures(raw, grams, "grams",
                                        num_partitions=nsp)
    return joined.map_batches(lambda b: _score_jaccard(b, threshold),
                              batch_format="pyarrow")


def ngram_jaccard_exact_sql(n: int = 3, threshold: float = 0.3) -> str:
    """DuckDB oracle for :func:`ngram_jaccard_exact_pairs`: gram-string
    self-join (grams as joined token strings — tokens contain no spaces,
    so the ' ' separator is unambiguous; the engine's 64-bit gram hashes
    are collision-free at oracle scale).  Same raw-quotient threshold,
    same half-away 6-decimal rounding."""
    assert n == 3, "oracle is written for trigram shape"
    return rf"""
WITH toks AS (
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
)
SELECT i.a, i.b,
       floor((CAST(i.i AS DOUBLE)
              / CAST(sa.sz + sb.sz - i.i AS DOUBLE)) * 1e6 + 0.5) / 1e6
         AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.a
JOIN sizes sb ON sb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE)
      >= {threshold}"""


def ngram_jaccard_pairs(docs_ds, candidate_pairs_ds, n: int = 3,
                        threshold: float = 0.5):
    """Exact word n-gram Jaccard for candidate pairs — fully distributed.

    Candidate doc IDS (not texts) are broadcast to filter the corpus;
    gram-hash sets are computed per block and attached to both pair sides
    via the same hash-shuffle join as the MinHash verify
    (:func:`join_pairs_with_signatures`); Jaccard is computed per
    partition on sorted unique hash arrays.  Nothing text-sized ever
    reaches the driver.
    """
    import ray

    from ..util import process_cached, ref_key, shuffle_partitions

    # pairs are consumed twice (id collection + join): materialize the
    # small pair set once so the upstream candidate pipeline runs once
    MAX_CANDIDATE_IDS = 5_000_000  # ~40 MB of int64 on the driver
    pairs = candidate_pairs_ds.select_columns(["a", "b"]).materialize()
    ids: set = set()
    for t in pairs.iter_batches(batch_format="pyarrow"):
        ids.update(t.column("a").to_pylist())
        ids.update(t.column("b").to_pylist())
        if len(ids) > MAX_CANDIDATE_IDS:
            # the driver-side id set is bounded by the candidate count
            # (post-LSH, small by construction); make that bound explicit
            # rather than silently ballooning driver memory
            raise ValueError(
                f"ngram_jaccard_pairs: >{MAX_CANDIDATE_IDS:,} distinct "
                "candidate doc ids — this verify path broadcasts the id "
                "set to filter the corpus and is meant for post-LSH "
                "candidate volumes; for corpus-scale exact n-gram "
                "Jaccard use ngram_jaccard_exact_pairs (AllPairs), "
                "which never collects ids driver-side.")
    if not ids:
        return ray.data.from_pandas(pd.DataFrame(
            {"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"),
             "jaccard": pd.Series(dtype="float64")}))
    ids_ref = ray.put(np.fromiter(ids, dtype=np.int64, count=len(ids)))

    grams = docs_ds.map_batches(
        process_cached(NGramHasher, (ref_key(ids_ref), n), ids_ref, n),
        batch_format="pyarrow")

    joined = join_pairs_with_signatures(
        pairs, grams, "grams", num_partitions=shuffle_partitions())

    return joined.map_batches(lambda b: _score_jaccard(b, threshold),
                              batch_format="pyarrow")


# ---------------------------------------------------------------------------
# benchmark decontamination (training-data hygiene: drop/flag documents
# that share an n-gram with a held-out evaluation set)
# ---------------------------------------------------------------------------


class _DecontamProbe:
    """Stateless-task probe stage: count, per document, the DISTINCT word
    n-grams it shares with the broadcast benchmark gram-hash set.  Cheap
    state (one sorted int64 array + the shared tokenizer) — task mode via
    :func:`..util.process_cached`, not an actor pool."""

    def __init__(self, bench_ref, n: int, bench_mod: int):
        import ray

        self.bench = ray.get(bench_ref)  # sorted int64 gram hashes
        self.hasher = AllNGramHasher(n)
        self.mod = bench_mod

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = ids % self.mod != 0  # the benchmark itself is not scored
        ids = ids[keep]
        texts = [t for t, k in zip(batch.column("text").to_pylist(), keep)
                 if k]
        grams = self.hasher.batch_grams(texts)
        vals = np.asarray(grams.values)
        offs = np.asarray(grams.offsets).astype(np.int64)
        if len(self.bench) and len(vals):
            pos = np.searchsorted(self.bench, vals)
            hit = self.bench[np.minimum(pos, len(self.bench) - 1)] == vals
        else:
            hit = np.zeros(len(vals), dtype=bool)
        cs = np.concatenate(([0], np.cumsum(hit, dtype=np.int64)))
        counts = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "contaminated_grams": pa.array(counts, pa.int64()),
            "contaminated": pa.array(counts > 0),
        })


def decontaminate(docs_ds, bench_mod: int = 41, n: int = 3,
                  max_bench_grams: int = 32_000_000):
    """Benchmark decontamination: per non-benchmark document, the count of
    distinct word ``n``-grams it shares with the held-out benchmark slice
    (``doc_id % bench_mod == 0`` stands in for an eval set) and a
    ``contaminated`` flag — the training-data hygiene step every serious
    LLM pipeline runs before packing (13-gram overlap vs eval benchmarks;
    Brown et al., "Language Models are Few-Shot Learners", appendix C —
    ``n`` is a parameter here because the synthetic corpus' documents are
    short).

    100 TB shape: the benchmark side is an EVAL SET — megabytes by
    definition, never corpus-scale — so its distinct gram hashes are
    unioned on the driver (bounded by ``max_bench_grams``, ~256 MB of
    int64 at the default) and broadcast once via ``ray.put``; the probe
    is then an embarrassingly parallel zero-shuffle scan over the corpus
    (vectorized searchsorted per batch).  Nothing text-sized moves.

    Gram identity is the same 64-bit token-window hash the exact n-gram
    join uses (:meth:`NGramHasher.gram_hashes`) — collision-free at
    oracle scale, as :func:`ngram_jaccard_exact_sql` already assumes.
    """
    import ray

    from ..util import process_cached, ref_key

    hasher = AllNGramHasher(n)

    def bench_grams(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = ids % bench_mod == 0
        texts = [x for x, k in zip(t.column("text").to_pylist(), sel) if k]
        vals = np.unique(np.asarray(hasher.batch_grams(texts).values))
        return pa.table({"g": pa.array(vals, pa.int64())})

    parts = []
    total = 0
    for t in docs_ds.map_batches(bench_grams, batch_format="pyarrow",
                                 ).iter_batches(batch_format="pyarrow"):
        arr = t.column("g").to_numpy()
        parts.append(arr)
        total += len(arr)
        if total > max_bench_grams:
            raise ValueError(
                f"decontaminate: >{max_bench_grams:,} benchmark gram "
                "hashes — the benchmark side must be an eval-set-sized "
                "corpus slice; raise max_bench_grams only with driver "
                "memory to match")
    bench = (np.unique(np.concatenate(parts)) if parts
             else np.zeros(0, dtype=np.int64))
    ref = ray.put(bench)

    return docs_ds.map_batches(
        process_cached(_DecontamProbe, (ref_key(ref), n, bench_mod),
                       ref, n, bench_mod),
        batch_format="pyarrow")


def decontaminate_sql(bench_mod: int = 41, n: int = 3) -> str:
    """DuckDB oracle for :func:`decontaminate` (gram strings instead of
    the engine's collision-free-at-oracle-scale 64-bit hashes)."""
    assert n == 3, "oracle is written for trigram shape"
    return rf"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\w+') AS ws FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g
  FROM toks, unnest(generate_series(1, len(ws) - {n - 1})) AS t(i)
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % {bench_mod} = 0),
hits AS (
  SELECT gr.doc_id, count(*) AS contaminated_grams
  FROM grams gr JOIN bench b ON gr.g = b.g
  WHERE gr.doc_id % {bench_mod} <> 0
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.contaminated_grams, 0) AS BIGINT)
         AS contaminated_grams,
       coalesce(h.contaminated_grams, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % {bench_mod} <> 0"""


def cosine_dup_pairs(docs_ds, num: int = 4, den: int = 5, grid: int = 8,
                     max_vocab: int = 4096, max_block: int = 4096):
    """EXACT unigram count-vector cosine self-join: every unordered pair
    (a < b) with ``cos(v_a, v_b) >= num/den`` over the documents' term
    COUNT vectors, threshold tested in pure int64.

    Why dense + grid rather than an inverted index: cosine over count
    vectors has no exact prefix filter without an extra per-term
    max-weight pass (Bayardo et al. WWW'07 needs it), and on
    stopword-dense vocabularies the posting-list self-join costs
    Theta(sum_t df_t^2) — on this corpus (31-term vocab, df ~ 0.8N)
    that is 224M contribution rows at sf0.1 for ~125k surviving pairs.
    Instead:

    1. the vocabulary is DISCOVERED distributed (:func:`..stages.text.
       vocab_top_terms` — one coarse exchange of per-batch partials) and
       hard-bounded at ``max_vocab`` (wider vocabularies error, naming
       :func:`ngram_jaccard_exact_pairs` / :func:`minhash_lsh_pairs` as
       the sparse alternatives — same bound discipline as tfidf);
    2. each document becomes one dense ``V`` int64 count row (KB-sized
       vocab ships in the task closure; zero-norm docs drop, matching
       the oracle's inner join against per-doc norms);
    3. the all-pairs join runs as a THETA-JOIN GRID exchange (Okcan &
       Riedewald, SIGMOD'11 "1-Bucket-Theta"): rows hash into ``grid``
       groups, every group pair (g <= h) is one cell, each row
       replicates to its ``grid`` cells, and each cell exactly scores
       one (N/G x N/G) block cross via float64 BLAS matmuls in
       ``max_block``-square tiles.  Replication factor G ~
       sqrt(#workers) is the standard exact-quadratic-join trade; no
       side is ever broadcast whole or collected on the driver, and
       each unordered pair lands in EXACTLY one cell, so no global
       pair-dedup exchange is needed afterwards.

    Exactness of the float64 matmul: counts are non-negative ints, so
    every partial sum is <= dot <= sqrt(na*nb); ``norm2 <= 6e8`` is
    enforced per row, hence dot < 2^53 (f64-exact) and
    ``den^2*dot^2 <= den^2*na*nb <= 9e18`` fits int64.

    Output: ``a, b, dot, cosine`` with ``cosine`` the same half-away
    6-decimal rounding as the Jaccard path.

    Reference analogue: none (LLM-pipeline brief); the exact-similarity
    template is :func:`ngram_jaccard_exact_pairs`.
    """
    import pandas as pd

    from ..util import collect_small_arrow, shuffle_partitions
    from .text import WORD_RE, vocab_top_terms

    if grid & (grid - 1) or grid <= 0:
        raise ValueError("grid must be a power of two")
    if not (0 < num <= den):
        raise ValueError("threshold num/den must lie in (0, 1]")

    voc_t = collect_small_arrow(vocab_top_terms(docs_ds, k=max_vocab + 1))
    if voc_t.num_rows > max_vocab:
        raise ValueError(
            f"cosine_dup_pairs: vocabulary exceeds max_vocab={max_vocab}; "
            "a dense count matrix would not fit — use the sparse set "
            "similarity paths (ngram_jaccard_exact_pairs / "
            "minhash_lsh_pairs) or raise max_vocab")
    vocab = sorted(voc_t.column("term").to_pylist())
    idx = {t: i for i, t in enumerate(vocab)}
    V = len(vocab)

    def vectorize(batch: pd.DataFrame) -> pa.Table:
        toks = batch["text"].str.lower().str.findall(WORD_RE)
        lens = toks.map(len).to_numpy()
        n = len(batch)
        M = np.zeros((n, V), dtype=np.int64)
        if n and lens.sum():
            flat = pd.Series(
                np.concatenate([np.asarray(t, dtype=object) for t in toks]))
            ti = flat.map(idx).to_numpy(np.int64)
            np.add.at(M, (np.repeat(np.arange(n), lens), ti), 1)
        norm2 = np.einsum("ij,ij->i", M, M)
        if norm2.size and norm2.max() > 600_000_000:
            raise ValueError(
                "cosine_dup_pairs: a document's squared count norm "
                "exceeds 6e8 — the int64 threshold test would overflow")
        keep = np.flatnonzero(norm2 > 0)  # oracle inner-joins norms
        M, norm2 = M[keep], norm2[keep]
        offs = (np.arange(len(keep) + 1, dtype=np.int32) * (V * 8))
        vec = pa.Array.from_buffers(
            pa.binary(), len(keep),
            [None, pa.py_buffer(offs.tobytes()),
             pa.py_buffer(np.ascontiguousarray(M, dtype="<i8").tobytes())])
        return pa.table({
            "doc_id": pa.array(
                batch["doc_id"].to_numpy()[keep].astype(np.int64)),
            "vec": vec,
            "norm2": pa.array(norm2, pa.int64()),
        })

    def grid_explode(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        n = len(ids)
        grp = coarse_mix(ids, grid - 1)
        h = np.tile(np.arange(grid, dtype=np.int64), n)
        g_rep = np.repeat(grp, grid)
        lo = np.minimum(g_rep, h)
        hi = np.maximum(g_rep, h)
        # cell (g, g) would be hit once per h in {g} only; dedupe the
        # h == grp diagonal double-count is unnecessary: for h != grp the
        # cell is (min, max) once; for h == grp it is (g, g) exactly once.
        take = np.repeat(np.arange(n, dtype=np.int64), grid)
        sub = t.take(pa.array(take))
        return pa.table({
            "cell": pa.array(lo * grid + hi, pa.int64()),
            "side": pa.array(g_rep, pa.int64()),
            "doc_id": sub.column("doc_id"),
            "vec": sub.column("vec"),
            "norm2": sub.column("norm2"),
        })

    num2 = np.int64(num * num)
    den2 = np.int64(den * den)

    def empty() -> pa.Table:
        return pa.table({"a": pa.array([], pa.int64()),
                         "b": pa.array([], pa.int64()),
                         "dot": pa.array([], pa.int64()),
                         "cosine": pa.array([], pa.float64())})

    def score_cell(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return empty()
        cell = int(g.column("cell")[0].as_py())
        lo, hi = cell // grid, cell % grid
        side = g.column("side").to_numpy()
        ids = g.column("doc_id").to_numpy()
        norm2 = g.column("norm2").to_numpy()
        vec = g.column("vec")
        if isinstance(vec, pa.ChunkedArray):
            vec = vec.combine_chunks()
        M = _unpack_binary_matrix(vec).astype(np.float64)

        def cross(ia, ib, triu: bool):
            out_a, out_b, out_d, out_c = [], [], [], []
            for bs in range(0, len(ia), max_block):
                be = min(bs + max_block, len(ia))
                c0 = bs if triu else 0
                for cs in range(c0, len(ib), max_block):
                    ce = min(cs + max_block, len(ib))
                    dots = M[ia[bs:be]] @ M[ib[cs:ce]].T
                    if triu and bs == cs:
                        iu, ju = np.triu_indices(be - bs, k=1)
                    else:
                        iu, ju = np.unravel_index(
                            np.arange(dots.size), dots.shape)
                    d = np.rint(dots[iu, ju]).astype(np.int64)
                    ra, rb = ia[bs + iu], ib[cs + ju]
                    na, nb = norm2[ra], norm2[rb]
                    keep = den2 * d * d >= num2 * na * nb
                    keep &= d > 0
                    ra, rb, d = ra[keep], rb[keep], d[keep]
                    na, nb = na[keep], nb[keep]
                    pa_, pb_ = ids[ra], ids[rb]
                    out_a.append(np.minimum(pa_, pb_))
                    out_b.append(np.maximum(pa_, pb_))
                    out_d.append(d)
                    out_c.append(np.floor(
                        d / np.sqrt(na.astype(np.float64)
                                    * nb.astype(np.float64)) * 1e6 + 0.5)
                        / 1e6)
            if not out_a:
                return empty()
            return pa.table({
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
                "dot": pa.array(np.concatenate(out_d), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            })

        if lo == hi:
            return cross(np.arange(len(ids)), np.arange(len(ids)), True)
        ia = np.flatnonzero(side == lo)
        ib = np.flatnonzero(side == hi)
        if not len(ia) or not len(ib):
            return empty()
        return cross(ia, ib, False)

    cells = grid * (grid + 1) // 2
    return (docs_ds.map_batches(vectorize, batch_format="pandas")
            .map_batches(grid_explode, batch_format="pyarrow")
            .groupby("cell", num_partitions=min(cells, shuffle_partitions()))
            .map_groups(score_cell, batch_format="pyarrow"))


def cosine_dup_pairs_sql(num: int = 4, den: int = 5) -> str:
    """DuckDB oracle for :func:`cosine_dup_pairs`: term-string posting
    self-join (fine at oracle scale), the SAME int64 threshold test and
    half-away 6-decimal cosine rounding."""
    return rf"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '\w+')) AS w
  FROM documents
),
cnts AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2
),
norms AS (
  SELECT doc_id, CAST(sum(c * c) AS BIGINT) AS n2 FROM cnts GROUP BY 1
),
dots AS (
  SELECT a.doc_id AS a, b.doc_id AS b, CAST(sum(a.c * b.c) AS BIGINT) AS dot
  FROM cnts a JOIN cnts b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d.a, d.b, d.dot,
       floor(d.dot / sqrt(CAST(na.n2 AS DOUBLE) * CAST(nb.n2 AS DOUBLE))
             * 1e6 + 0.5) / 1e6 AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.a
JOIN norms nb ON nb.doc_id = d.b
WHERE {den * den} * d.dot * d.dot >= {num * num} * na.n2 * nb.n2
ORDER BY d.a, d.b"""


def dedup_normalized(docs_ds):
    """Normalization-canonical dedup: documents that differ only in
    case/punctuation/whitespace collapse to one canonical form
    (lowercase, non-word runs -> single space, trimmed) — the cheap
    canon pass that catches re-encoded boilerplate exact-sha dedup
    misses.  To certify exactly that, a deterministic MESSY TWIN is
    synthesized for ids % 100 < 5 (``upper(text) || ' !!'``, ids
    shifted +2e6, mirrored in the SQL oracle): every twin must land in
    its original's group despite a different sha256.

    Same scale shape as :func:`exact_dup_groups`: md5 of the canon
    form per batch, (key, min_id, n) partials, one keyed exchange of
    partials — raw text never shuffles."""
    import hashlib

    from .exact_agg import grouped_aggregate

    def messy(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = t.filter(pa.array(ids % 100 < 5))
        up = pc.binary_join_element_wise(
            pc.utf8_upper(sel.column("text")), " !!", "")
        return pa.table({
            "doc_id": pa.array(sel.column("doc_id").to_numpy() + 2_000_000,
                               pa.int64()),
            "text": up})

    aug = docs_ds.union(docs_ds.map_batches(messy, batch_format="pyarrow"))

    def key_rows(t: pa.Table) -> pa.Table:
        norm = pc.utf8_trim(
            pc.replace_substring_regex(pc.utf8_lower(t.column("text")),
                                       "[^0-9a-z_]+", " "),
            characters=" ")
        keys = [hashlib.md5(s.encode()).hexdigest()
                for s in norm.to_pylist()]
        return pa.table({"norm_md5": pa.array(keys, pa.string()),
                         "keep_doc_id": pc.cast(t.column("doc_id"),
                                                pa.int64())})

    rows = aug.map_batches(key_rows, batch_format="pyarrow")
    return grouped_aggregate(rows, ["norm_md5"],
                             [("keep_doc_id", "min", "keep_doc_id"),
                              ("", "count", "n_copies")]) \
        .filter(expr="n_copies > 1")


def dedup_normalized_sql() -> str:
    return r"""
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 2000000 AS doc_id, upper(text) || ' !!' AS text
  FROM documents WHERE doc_id % 100 < 5),
n AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^0-9a-z_]+', ' ', 'g'),
                  ' ')) AS k
  FROM aug)
SELECT k AS norm_md5, CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT) AS n_copies
FROM n GROUP BY k HAVING count(*) > 1"""


_PACK = 1 << 40  # doc_id packing radix for argmax-by-(prio, -id)


def dedup_keep_best(docs_ds):
    """Canonical selection with a precedence rule: within each
    exact-duplicate group keep the copy from the most-trusted source
    (lowest srcN suffix), ties broken by lowest doc_id — the curation
    policy step after plain exact dedup (keep the authoritative copy,
    not just the first-seen one).

    Duplicates are synthesized as a RE-ATTRIBUTED mirror crawl (ids %
    100 < 5, id + 1e6, source rotated srcN -> src((N+7)%20), same
    text) so the precedence rule is exercised in both directions: some
    twins out-rank their original, some don't.  Mirrored in the SQL
    oracle.

    The argmax is a PACKED-INT64 max — prio * 2^40 + (2^40-1 - doc_id)
    — so it rides the same associative (sha-keyed partial -> one keyed
    exchange) shape as :func:`exact_dup_groups`; raw text never moves
    and no per-group Python runs.  The SQL oracle mirrors the packing
    arithmetic exactly.
    """
    from .exact_agg import grouped_aggregate

    def mirror(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        sel = t.filter(pa.array(ids % 100 < 5))
        sfx = pc.cast(pc.utf8_slice_codeunits(sel.column("source"), 3),
                      pa.int64()).to_numpy()
        rot = (sfx + 7) % 20
        return pa.table({
            "doc_id": pa.array(sel.column("doc_id").to_numpy() + 1_000_000,
                               pa.int64()),
            "text": sel.column("text"),
            "source": pa.array(["src" + str(s) for s in rot], pa.string())})

    docs_ds = docs_ds.union(
        docs_ds.map_batches(mirror, batch_format="pyarrow"))

    def sha_rows(batch: pa.Table) -> pa.Table:
        b = add_text_sha(batch.select(["doc_id", "text", "source"]))
        ids = pc.cast(b.column("doc_id"), pa.int64()).to_numpy()
        sfx = pc.cast(pc.utf8_slice_codeunits(b.column("source"), 3),
                      pa.int64()).to_numpy()
        packed = (19 - sfx) * _PACK + (_PACK - 1 - ids)
        return pa.table({"text_sha": b.column("text_sha"),
                         "packed": pa.array(packed, pa.int64())})

    rows = docs_ds.map_batches(sha_rows, batch_format="pyarrow")
    agg = grouped_aggregate(rows, ["text_sha"],
                            [("packed", "max", "packed"),
                             ("", "count", "n_copies")]) \
        .filter(expr="n_copies > 1")

    def decode(t: pa.Table) -> pa.Table:
        packed = t.column("packed").to_numpy()
        ids = (_PACK - 1) - (packed % _PACK)
        sfx = 19 - (packed // _PACK)
        src = pc.binary_join_element_wise(
            "src", pa.array([str(s) for s in sfx], pa.string()), "")
        return pa.table({"text_sha": t.column("text_sha"),
                         "keep_doc_id": pa.array(ids, pa.int64()),
                         "keep_source": src,
                         "n_copies": t.column("n_copies")})

    return agg.map_batches(decode, batch_format="pyarrow")


def dedup_keep_best_sql() -> str:
    return f"""
WITH aug AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text,
         'src' || CAST((CAST(substr(source, 4) AS BIGINT) + 7) % 20
                       AS VARCHAR) AS source
  FROM documents WHERE doc_id % 100 < 5),
k AS (
  SELECT sha256(text) AS text_sha, doc_id,
         CAST(substr(source, 4) AS BIGINT) AS sfx
  FROM aug),
p AS (
  SELECT text_sha,
         max((19 - sfx) * {_PACK} + ({_PACK - 1} - doc_id)) AS packed,
         CAST(count(*) AS BIGINT) AS n_copies
  FROM k GROUP BY text_sha HAVING count(*) > 1)
SELECT text_sha,
       CAST({_PACK - 1} - (packed % {_PACK}) AS BIGINT) AS keep_doc_id,
       'src' || CAST(19 - (packed // {_PACK}) AS VARCHAR) AS keep_source,
       n_copies
FROM p"""


def dedup_idempotence(docs_ds):
    """Algebraic-law certificate: exact dedup is IDEMPOTENT —
    dedup(dedup(X)) keeps exactly what dedup(X) keeps.  The engine
    runs the keep-min-id dedup twice (the second pass over the first
    pass's kept ids re-joined to their rows) and reports
    (n_input, n_after_once, n_after_twice, idempotent) — the
    maintenance guarantee that re-running a dedup job on an
    already-deduped corpus is a no-op (safe to re-run after a partial
    failure without a tombstone log).

    Shape: two sha-keyed partial exchanges over the augmented corpus
    (the dedup_exact shape, twice); counts only — text never collects.
    """
    import pandas as pd

    from ..util import collect_small_arrow
    from .exact_agg import grouped_aggregate

    def aug(ds):
        def shifted(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy()
            sel = t.filter(pa.array(ids % 100 < 5))
            return pa.table({
                "doc_id": pa.array(sel.column("doc_id").to_numpy()
                                   + 1_000_000, pa.int64()),
                "text": sel.column("text")})

        return ds.union(ds.map_batches(shifted, batch_format="pyarrow"))

    def dedup_once(ds):
        def sha_rows(t: pa.Table) -> pa.Table:
            b = add_text_sha(t.select(["doc_id", "text"]))
            return b.select(["text_sha", "doc_id"])

        kept = grouped_aggregate(
            ds.map_batches(sha_rows, batch_format="pyarrow"),
            ["text_sha"], [("doc_id", "min", "doc_id")])
        return kept  # (text_sha, doc_id)

    def count(ds):
        return int(collect_small_arrow(ds.map_batches(
            lambda t: pa.table({"n": pa.array([t.num_rows], pa.int64())}),
            batch_format="pyarrow")).to_pandas()["n"].sum())

    a = aug(docs_ds).materialize()
    n_input = count(a)
    once = dedup_once(a).materialize()
    n_once = count(once)
    # second pass: the kept (sha, id) rows ARE the dedup key space; a
    # second keyed reduce over them must change nothing
    twice = grouped_aggregate(once, ["text_sha"],
                              [("doc_id", "min", "doc_id")])
    n_twice = count(twice)
    return pd.DataFrame({
        "n_input": pd.Series([n_input], dtype="int64"),
        "n_after_once": pd.Series([n_once], dtype="int64"),
        "n_after_twice": pd.Series([n_twice], dtype="int64"),
        "idempotent": pd.Series([n_once == n_twice], dtype="bool")})


def dedup_idempotence_sql() -> str:
    return """
WITH aug AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 100 < 5),
once AS (SELECT sha256(text) AS s, min(doc_id) AS doc_id
         FROM aug GROUP BY sha256(text))
SELECT CAST((SELECT count(*) FROM aug) AS BIGINT) AS n_input,
       CAST((SELECT count(*) FROM once) AS BIGINT) AS n_after_once,
       CAST((SELECT count(*) FROM
             (SELECT s, min(doc_id) FROM once GROUP BY s)) AS BIGINT)
         AS n_after_twice,
       TRUE AS idempotent"""
