"""Connected components (min-label propagation) and benchmark
decontamination: brute-force parity, partition invariance, bounds."""

import re

import numpy as np
import pyarrow as pa
import pytest

from yj_schema_validator_ray.stages.dedup import decontaminate
from yj_schema_validator_ray.stages.graph import connected_components

SF_DOCS = "/root/testdata/sf0.001/documents.parquet"


def _pairs_ds(a, b, parts=1):
    import ray

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array(np.asarray(a, dtype=np.int64), pa.int64()),
        "b": pa.array(np.asarray(b, dtype=np.int64), pa.int64())}))
    return ds.repartition(parts) if parts > 1 else ds


def _cc_dict(ds):
    df = ds.to_pandas()
    return dict(zip(df["doc_id"], df["component"]))


def _union_find(a, b):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a, b):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {v: find(v) for v in parent}


def test_cc_hand_graph(ray_session):
    # chain (diameter 3: needs >1 propagation round), clique, pair,
    # duplicate pair rows (multi-band style)
    got = _cc_dict(connected_components(_pairs_ds(
        [1, 2, 3, 10, 10, 11, 20, 20], [2, 3, 4, 11, 12, 12, 21, 21])))
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_random_graph_vs_union_find(ray_session):
    # random graph vs a driver union-find, AND partition invariance:
    # the same graph on 16 shuffled blocks must agree with 1 block
    rng = np.random.RandomState(7)
    e = rng.randint(0, 150, size=(400, 2))
    e = e[e[:, 0] != e[:, 1]]
    a, b = e[:, 0], e[:, 1]
    expect = _union_find(a, b)
    assert _cc_dict(connected_components(_pairs_ds(a, b))) == expect
    assert _cc_dict(connected_components(_pairs_ds(a, b, parts=16))) == expect


def test_cc_long_path_pointer_jumping(ray_session):
    # a path (diameter 12) converges in O(log d) rounds via the
    # pointer-jumping shortcut — max_iters=6 would overflow plain
    # O(diameter) hash-min but passes with jumping
    n = np.arange(100, 113)
    got = _cc_dict(connected_components(_pairs_ds(n[:-1], n[1:]),
                                        max_iters=6))
    assert got == {int(v): 100 for v in n}


def test_cc_empty_pairs(ray_session):
    import ray

    empty = ray.data.from_arrow(pa.table({
        "a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}))
    out = connected_components(empty)
    # typed empty pyarrow.Table (Ray drops all-empty block schemas)
    assert isinstance(out, pa.Table)
    df = out.to_pandas()
    assert list(df.columns) == ["doc_id", "component"] and len(df) == 0


def test_cc_iteration_cap(ray_session):
    n = np.arange(0, 12)
    with pytest.raises(RuntimeError, match="no fixpoint"):
        connected_components(_pairs_ds(n[:-1], n[1:]), max_iters=2)


def _brute_decontam(bench_mod=41, n=3):
    import pyarrow.parquet as pq

    t = pq.read_table(SF_DOCS).to_pandas()

    def grams(s):
        ws = re.findall(r"\w+", s.lower())
        return {tuple(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    bench = set()
    for _, r in t.iterrows():
        if r.doc_id % bench_mod == 0:
            bench |= grams(r.text)
    return {r.doc_id: len(grams(r.text) & bench)
            for _, r in t.iterrows() if r.doc_id % bench_mod != 0}


def test_decontaminate_vs_bruteforce(ray_session):
    import ray

    got = decontaminate(
        ray.data.read_parquet(SF_DOCS, columns=["doc_id", "text"])
    ).to_pandas()
    exp = _brute_decontam()
    assert dict(zip(got["doc_id"], got["contaminated_grams"])) == exp
    assert (got["contaminated"] == (got["contaminated_grams"] > 0)).all()


def test_decontaminate_bench_bound(ray_session):
    import ray

    with pytest.raises(ValueError, match="benchmark gram hashes"):
        decontaminate(
            ray.data.read_parquet(SF_DOCS, columns=["doc_id", "text"]),
            max_bench_grams=2)
