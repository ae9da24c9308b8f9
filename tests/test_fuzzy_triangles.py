"""Unit tests for the wave-5 kernels: the pair-axis vectorized
Levenshtein DP (vs a reference scalar DP), the blocked fuzzy-pair
stage's guard rails, and distributed triangle counting (vs an
itertools brute force on a synthetic graph)."""

import itertools
import random

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yj_schema_validator_ray.stages.fuzzy import (fuzzy_pairs,
                                                  levenshtein_pairs)
from yj_schema_validator_ray.stages.graph import triangle_counts


def ref_levenshtein(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (a[i - 1] != b[j - 1]))
        prev = cur
    return prev[lb]


def test_levenshtein_pairs_matches_reference():
    rng = random.Random(7)
    alpha = "abcde"
    pairs = []
    for _ in range(300):
        a = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        pairs.append((a, b))
    pairs += [("", ""), ("", "abc"), ("abc", ""), ("same", "same"),
              ("kitten", "sitting"), ("flaw", "lawn")]
    a_s = np.array([p[0] for p in pairs], object)
    b_s = np.array([p[1] for p in pairs], object)
    got = levenshtein_pairs(a_s, b_s)
    want = np.array([ref_levenshtein(a, b) for a, b in pairs], np.int64)
    assert (got == want).all()


def test_fuzzy_pairs_blocked(ray_session):
    import ray.data

    df = pd.DataFrame({
        "blk": ["x"] * 4 + ["y"] * 3,
        "id": [1, 2, 3, 4, 10, 11, 12],
        "s": ["cold widget", "cold widgit", "warm widget", "bolt",
              "red rod", "red rod", "blue rod"],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    out = fuzzy_pairs(ds, "blk", "id", "s", max_d=2).to_pandas()
    got = {(r.blk, r.id_a, r.id_b, r.dist)
           for r in out.itertuples()}
    # within-block pairs only; cross-block "red rod"/"cold widget" never
    want = set()
    for blk, grp in df.groupby("blk"):
        for (i1, s1), (i2, s2) in itertools.combinations(
                zip(grp["id"], grp["s"]), 2):
            d = ref_levenshtein(s1, s2)
            if d <= 2:
                want.add((blk, min(i1, i2), max(i1, i2), d))
    assert got == want


def test_fuzzy_pairs_max_block_guard(ray_session):
    import ray.data

    df = pd.DataFrame({"blk": ["x"] * 5, "id": range(5), "s": ["a"] * 5})
    ds = ray.data.from_pandas(df)
    with pytest.raises(Exception, match="max_block"):
        fuzzy_pairs(ds, "blk", "id", "s", max_block=3).to_pandas()


def brute_triangles(edges):
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for u, v, w in itertools.combinations(sorted(adj), 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            for x in (u, v, w):
                counts[x] = counts.get(x, 0) + 1
    return counts


def test_triangle_counts_random_graph(ray_session):
    import ray.data

    rng = random.Random(11)
    nodes = list(range(1, 41))
    edges = sorted({(a, b) for a in nodes for b in nodes
                    if a < b and rng.random() < 0.15})
    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([e[0] for e in edges], pa.int64()),
        "b": pa.array([e[1] for e in edges], pa.int64()),
    })).repartition(4)
    out = triangle_counts(ds).to_pandas()
    got = dict(zip(out["node"], out["n_triangles"]))
    assert got == brute_triangles(edges)


def test_triangle_counts_empty(ray_session):
    import ray.data

    ds = ray.data.from_arrow(pa.table({"a": pa.array([], pa.int64()),
                                       "b": pa.array([], pa.int64())}))
    out = triangle_counts(ds)
    assert isinstance(out, pa.Table)
    assert out.num_rows == 0
    assert out.column_names == ["node", "n_triangles"]
