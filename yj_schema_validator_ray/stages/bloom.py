"""Bloom-filter membership sketch + incremental dedup.

The 100 TB use case: dedup a NEW crawl against a prior corpus without
joining against it — build a bits-only summary of the old side once
(mergeable per-batch bitmaps, OR-combined through a small tree), then
filter the new side with a broadcast of the final bitmap.  No shuffle
touches either corpus; the exchange volume is ``m/8`` bytes per block
on the build side and zero on the probe side.

Guarantees: NO false negatives (a true duplicate is always dropped);
false positives (a new doc wrongly dropped) at the standard Bloom rate
``(1 - e^{-kn/m})^k`` — size ``m_bits`` for the expected old-side
cardinality.  Hashes are deterministic (double hashing off two fixed
64-bit mixes), so results are rerun-stable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_MIX1 = np.uint64(0x9E3779B97F4A7C15)
_MIX2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash2(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit mixes (splitmix-style) for double hashing."""
    v = values.astype(np.uint64)

    def mix(x, c):
        x = (x ^ (x >> np.uint64(30))) * c
        x = (x ^ (x >> np.uint64(27))) * _MIX1
        return x ^ (x >> np.uint64(31))

    return mix(v, _MIX1), mix(v, _MIX2)


def _text_keys(texts: list[str]) -> np.ndarray:
    """Deterministic 64-bit content keys (first 8 bytes of sha256)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.sha256(t.encode()).digest()[:8], "little")
         for t in texts), dtype=np.uint64, count=len(texts))


def _set_bits(bitmap: np.ndarray, keys: np.ndarray, k: int) -> None:
    m = np.uint64(len(bitmap) * 64)
    h1, h2 = _hash2(keys)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        np.bitwise_or.at(bitmap, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))


def _test_bits(bitmap: np.ndarray, keys: np.ndarray, k: int) -> np.ndarray:
    m = np.uint64(len(bitmap) * 64)
    h1, h2 = _hash2(keys)
    hit = np.ones(len(keys), dtype=bool)
    for i in range(k):
        pos = (h1 + np.uint64(i) * h2) % m
        word = bitmap[(pos >> np.uint64(6)).astype(np.int64)]
        hit &= (word >> (pos & np.uint64(63))) & np.uint64(1) != 0
    return hit


def build_bloom(docs_ds, m_bits: int = 1 << 20, k: int = 5) -> np.ndarray:
    """Distributed build: per-batch bitmap partial (one ``m/8``-byte row
    per block) -> OR-merge tree (per-partition, then one final task) ->
    final uint64 bitmap on the driver (bounded by ``m``, not data)."""
    from ..util import shuffle_partitions

    words = m_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        _set_bits(bm, _text_keys(t.column("text").to_pylist()), k)
        return pa.table({"bm": pa.array([bm.tobytes()], pa.binary())})

    def orr(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t.column("bm").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({"bm": pa.array([acc.tobytes()], pa.binary())})

    rows = (docs_ds.map_batches(partial, batch_format="pyarrow")
            .repartition(min(8, shuffle_partitions()))
            .map_batches(orr, batch_format="pyarrow")
            .repartition(1)
            .map_batches(orr, batch_format="pyarrow")).take_all()
    return np.frombuffer(rows[0]["bm"], dtype=np.uint64).copy()


def incremental_dedup(new_ds, bloom: np.ndarray, k: int = 5):
    """Filter a new crawl against a prior corpus's Bloom bitmap: keep
    rows whose content key is NOT (probably) in the old corpus.  The
    bitmap broadcasts via ``ray.put`` once; probing is stateless
    vectorized bit tests per batch."""
    import ray

    from ..util import process_cached, ref_key

    ref = ray.put(bloom)

    class Probe:
        def __init__(self, r):
            self.bm = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            keys = _text_keys(t.column("text").to_pylist())
            return t.filter(pa.array(~_test_bits(self.bm, keys, k)))

    return new_ds.map_batches(process_cached(Probe, (ref_key(ref), k), ref),
                              batch_format="pyarrow")


def synthesize_new_crawl(docs_ds):
    """Deterministic 'new crawl' over the documents corpus: 5% exact
    re-crawls (ids%100<5, text unchanged — must drop, no false
    negatives) + 5% revisions (ids%100>=95, ' [rev2]' appended — kept
    modulo the FP rate), ids shifted +1e6.  Mirrored verbatim by the
    ``bloom_accuracy`` SQL oracle's ``newc`` CTE."""
    def make_new(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        dup = t.filter(pa.array(ids % 100 < 5))
        chg = t.filter(pa.array(ids % 100 >= 95))
        chg = chg.set_column(
            chg.schema.get_field_index("text"), "text",
            pa.array([x + " [rev2]" for x in
                      chg.column("text").to_pylist()], pa.string()))
        out = pa.concat_tables([dup, chg])
        new_ids = pa.array(out.column("doc_id").to_numpy() + 1_000_000,
                           pa.int64())
        return out.set_column(out.schema.get_field_index("doc_id"),
                              "doc_id", new_ids)

    return docs_ds.map_batches(make_new, batch_format="pyarrow")


def bloom_semijoin(sf_dir: str, priority: str = "1-URGENT",
                   m_bits: int = 1 << 20, k: int = 5):
    """Bloom-filter SEMI-JOIN pushdown — the join-avoidance pattern the
    100-TB plan leans on when one side reduces to membership: build a
    bits-only summary of the filtered orders keys (per-batch bitmaps,
    OR-merge tree), broadcast it, and pre-filter lineitem with bit
    tests instead of shuffling either table.

    Certificate (one row, all checks computed distributed):
    ``n_line`` / ``n_exact`` — exact scan + semi-join counts
    (SQL-oracled); ``no_false_negatives`` — every true match passed
    the bloom (the structural guarantee, verified not assumed);
    ``fpr_ok`` — false passes <= 2x the analytic ``(1-e^{-kn/m})^k``
    rate on the non-matching population.  The exact side runs through
    ONE key-keyed exchange of pre-aggregated (key, n, n_passed)
    partials — the bitmap never substitutes for correctness, it only
    cuts the rows that reach the exact stage in a real pipeline."""
    import math

    import ray
    import ray.data

    from ..stages.exact_agg import grouped_aggregate
    from ..util import collect_small_arrow, process_cached, ref_key, \
        shuffle_partitions

    words = m_bits // 64
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderpriority"])

    def o_partial(t: pa.Table) -> pa.Table:
        keys = t.filter(pa.compute.equal(
            t.column("o_orderpriority"), priority)) \
            .column("o_orderkey").to_numpy(zero_copy_only=False)
        bm = np.zeros(words, dtype=np.uint64)
        _set_bits(bm, keys.astype(np.uint64), k)
        return pa.table({
            "bm": pa.array([bm.tobytes()], pa.binary()),
            "n_keys": pa.array([len(keys)], pa.int64())})

    def orr(t: pa.Table) -> pa.Table:
        acc = np.zeros(words, dtype=np.uint64)
        for blob in t.column("bm").to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
        return pa.table({
            "bm": pa.array([acc.tobytes()], pa.binary()),
            "n_keys": pa.array(
                [int(sum(t.column("n_keys").to_pylist()))], pa.int64())})

    rows = (orders.map_batches(o_partial, batch_format="pyarrow")
            .repartition(min(8, shuffle_partitions()))
            .map_batches(orr, batch_format="pyarrow")
            .repartition(1)
            .map_batches(orr, batch_format="pyarrow")).take_all()
    bloom = np.frombuffer(rows[0]["bm"], dtype=np.uint64).copy()
    n_keys = int(rows[0]["n_keys"])  # order keys are unique (PK)
    ref = ray.put(bloom)

    line = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                                 columns=["l_orderkey"])

    class Probe:
        def __init__(self, r):
            self.bm = ray.get(r)

        def __call__(self, t: pa.Table) -> pa.Table:
            import pandas as pd

            keys = t.column("l_orderkey").to_numpy(zero_copy_only=False)
            hit = _test_bits(self.bm, keys.astype(np.uint64), k)
            df = (pd.DataFrame({"key": keys,
                                "n": np.ones(len(keys), np.int64),
                                "n_passed": hit.astype(np.int64)})
                  .groupby("key", sort=False).sum().reset_index())
            df["is_order"] = np.int64(0)
            return pa.Table.from_pandas(df, preserve_index=False)

    def o_keys(t: pa.Table) -> pa.Table:
        keys = t.filter(pa.compute.equal(
            t.column("o_orderpriority"), priority)) \
            .column("o_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({"key": pa.array(keys, pa.int64()),
                         "n": pa.array(np.zeros(len(keys), np.int64)),
                         "n_passed": pa.array(np.zeros(len(keys),
                                                       np.int64)),
                         "is_order": pa.array(np.ones(len(keys),
                                                      np.int64))})

    both = (line.map_batches(process_cached(Probe, (ref_key(ref), k), ref),
                             batch_format="pyarrow")
            .union(orders.map_batches(o_keys, batch_format="pyarrow")))
    per_key = grouped_aggregate(
        both, ["key"],
        [("n", "sum", "n"), ("n_passed", "sum", "n_passed"),
         ("is_order", "max", "is_order")])

    def final_partial(t: pa.Table) -> pa.Table:
        n = t.column("n").to_numpy()
        npass = t.column("n_passed").to_numpy()
        iso = t.column("is_order").to_numpy().astype(bool)
        return pa.table({
            "n_line": pa.array([int(n.sum())], pa.int64()),
            "n_pass": pa.array([int(npass.sum())], pa.int64()),
            "n_exact": pa.array([int(n[iso].sum())], pa.int64()),
            "n_exact_passed": pa.array([int(npass[iso].sum())],
                                       pa.int64())})

    s = collect_small_arrow(per_key.map_batches(
        final_partial, batch_format="pyarrow")).to_pandas().sum()
    fpr = (1.0 - math.exp(-k * n_keys / m_bits)) ** k
    n_nonmatch = int(s.n_line) - int(s.n_exact)
    false_pass = int(s.n_pass) - int(s.n_exact_passed)
    return pd.DataFrame({
        "n_line": pd.Series([int(s.n_line)], dtype="int64"),
        "n_exact": pd.Series([int(s.n_exact)], dtype="int64"),
        "no_false_negatives": [bool(s.n_exact_passed == s.n_exact)],
        "fpr_ok": [bool(false_pass <= max(2.0 * fpr * n_nonmatch, 8.0))],
    })


def bloom_semijoin_sql(priority: str = "1-URGENT") -> str:
    return f"""
SELECT (SELECT CAST(count(*) AS BIGINT) FROM lineitem) AS n_line,
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IN (SELECT o_orderkey FROM orders
                             WHERE o_orderpriority = '{priority}'))
         AS n_exact,
       TRUE AS no_false_negatives,
       TRUE AS fpr_ok"""
