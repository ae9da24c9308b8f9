"""Fourteenth-wave pure-logic contracts: fiscal-calendar partition,
bit-length exactness, max-gap stitching — no Ray session needed."""

import numpy as np


def test_fiscal_445_periods_partition_the_year():
    from yj_schema_validator_ray.pipelines.olap import _F445_CUM

    cum = np.array(_F445_CUM, np.int64)
    # 12 periods covering weeks 0..51 with the 4-4-5 pattern per quarter
    widths = np.diff(np.concatenate(([0], cum)))
    assert list(widths) == [4, 4, 5] * 4
    assert cum[-1] == 52
    periods = np.searchsorted(cum, np.arange(52), side="right") + 1
    assert periods.min() == 1 and periods.max() == 12
    # period sizes in weeks match the pattern
    sizes = np.bincount(periods)[1:]
    assert list(sizes) == [4, 4, 5] * 4


def test_bit_length_doubling_matches_python():
    # mirror of events_interarrival_log2's vectorized doubling trick
    def bit_length(x):
        b = np.zeros(len(x), np.int64)
        v = x.copy()
        for s in (32, 16, 8, 4, 2, 1):
            m = v >= (1 << s)
            b[m] += s
            v[m] >>= s
        return b + (v > 0)

    xs = np.array([1, 2, 3, 4, 7, 8, 1023, 1024, 1025,
                   (1 << 40) - 1, 1 << 40, (1 << 62) - 1], np.int64)
    assert list(bit_length(xs)) == [int(v).bit_length() for v in xs]


def test_max_gap_bucket_stitching():
    # the sequence_gap_audit decomposition: max gap = max(in-bucket
    # gaps, cross-bucket boundary gaps) for ANY bucketization
    rng = [3, 4, 9, 10, 11, 40, 41, 90, 200, 201, 202, 512]
    k = np.array(rng, np.int64)
    truth = int(np.diff(np.sort(k)).max())
    lo, hi = int(k.min()), int(k.max())
    span = hi - lo + 1
    for C in (2, 3, 8, 64):
        b = (k - lo) * C // span
        max_gap = 0
        stats = []
        for bucket in sorted(set(b)):
            kk = np.sort(k[b == bucket])
            if len(kk) > 1:
                max_gap = max(max_gap, int(np.diff(kk).max()))
            stats.append((int(kk[0]), int(kk[-1])))
        stats.sort()
        for (lo1, hi1), (lo2, hi2) in zip(stats, stats[1:]):
            max_gap = max(max_gap, lo2 - hi1)
        assert max_gap == truth, C


def test_largest_remainder_is_within_one_cent_of_proportional():
    # proration property on a hand case: allocations differ from the
    # real-valued proportional split by < 1 cent each and sum exactly
    total = 1001
    ext = np.array([3, 3, 3], np.int64)
    se = int(ext.sum())
    base = (total * ext) // se
    mod = (total * ext) % se
    rem = total - int(base.sum())
    order = np.lexsort((np.arange(len(ext)), -mod))
    alloc = base.copy()
    alloc[order[:rem]] += 1
    assert int(alloc.sum()) == total
    assert np.all(np.abs(alloc - total * ext / se) < 1.0)


def test_wave13_embedding_ops_are_repartition_invariant(ray_session):
    import pandas as pd
    import ray.data

    from yj_schema_validator_ray.pipelines.olap import (
        embedding_gram_matrix, embedding_label_scatter)

    def emb(cols, nblocks=None):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet", columns=cols)
        return ds.repartition(nblocks) if nblocks else ds

    cases = [(embedding_gram_matrix, ["embedding"]),
             (embedding_label_scatter, ["embedding", "label"])]
    def as_pdf(r):
        return r.to_pandas() if hasattr(r, "to_pandas") else r

    for fn, cols in cases:
        a = as_pdf(fn(emb(cols)))
        b = as_pdf(fn(emb(cols, 7)))
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True,
                                      obj=fn.__name__)


def test_weighted_jaccard_is_repartition_invariant(ray_session):
    import pandas as pd
    import ray.data

    from yj_schema_validator_ray.stages.text import (
        source_weighted_jaccard)

    def docs(nblocks=None):
        ds = ray.data.read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text", "source"])
        return ds.repartition(nblocks) if nblocks else ds

    a = source_weighted_jaccard(docs()).reset_index(drop=True)
    b = source_weighted_jaccard(docs(7)).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
