"""Exact count-vector cosine self-join: grid-plan invariance (every
unordered pair scored in exactly one cell), zero-norm drop, integer
threshold exactness, and the dense-vocab bound guard."""

import numpy as np
import pandas as pd
import pytest


def _docs(rows):
    import ray

    return ray.data.from_pandas(pd.DataFrame(rows))


def _expected(texts, num=4, den=5):
    """Driver-side exact reference over tiny inputs."""
    import re

    vecs = {}
    for i, t in texts.items():
        toks = re.findall(r"[0-9A-Za-z_]+", t.lower())
        if not toks:
            continue
        c = {}
        for w in toks:
            c[w] = c.get(w, 0) + 1
        vecs[i] = c
    out = []
    ids = sorted(vecs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            va, vb = vecs[a], vecs[b]
            dot = sum(va[w] * vb[w] for w in va if w in vb)
            na = sum(v * v for v in va.values())
            nb = sum(v * v for v in vb.values())
            if dot > 0 and den * den * dot * dot >= num * num * na * nb:
                import math

                cos = math.floor(dot / math.sqrt(na * nb) * 1e6 + 0.5) / 1e6
                out.append((a, b, dot, cos))
    return pd.DataFrame(out, columns=["a", "b", "dot", "cosine"])


def test_cosine_pairs_grid_invariant_and_exact(ray_session):
    from yj_schema_validator_ray.stages.dedup import cosine_dup_pairs

    texts = {
        1: "alpha beta beta gamma",
        2: "alpha beta beta gamma",          # exact dup of 1 -> cos 1.0
        3: "alpha beta beta gamma delta",    # near dup
        4: "zeta eta theta",                 # unrelated
        5: "",                               # zero-norm: dropped
        6: "alpha alpha alpha",              # heavy single term
        7: "alpha",                          # cos(6,7) = 1.0
    }
    rows = [{"doc_id": i, "text": t} for i, t in texts.items()]
    exp = _expected(texts)

    results = {}
    for grid in (1, 2, 8):
        got = (cosine_dup_pairs(_docs(rows), grid=grid)
               .to_pandas().sort_values(["a", "b"]).reset_index(drop=True))
        results[grid] = got
        pd.testing.assert_frame_equal(
            got, exp.sort_values(["a", "b"]).reset_index(drop=True),
            check_dtype=False)
    # grid plans agree pairwise (each pair emitted exactly once per plan)
    pd.testing.assert_frame_equal(results[1], results[8])
    # sanity on the reference itself: dup pair present at cos == 1.0
    assert ((exp.a == 1) & (exp.b == 2) & (exp.cosine == 1.0)).any()
    assert ((exp.a == 6) & (exp.b == 7) & (exp.cosine == 1.0)).any()
    assert not ((exp.a == 4) | (exp.b == 4)).any()  # unrelated doc
    assert not ((exp.a == 5) | (exp.b == 5)).any()  # zero-norm doc


def test_cosine_pairs_vocab_bound(ray_session):
    from yj_schema_validator_ray.stages.dedup import cosine_dup_pairs

    rows = [{"doc_id": i, "text": " ".join(f"w{i}_{j}" for j in range(8))}
            for i in range(10)]
    with pytest.raises(ValueError, match="max_vocab"):
        cosine_dup_pairs(_docs(rows), max_vocab=16).materialize()


def test_cosine_pairs_grid_param_guard(ray_session):
    from yj_schema_validator_ray.stages.dedup import cosine_dup_pairs

    with pytest.raises(ValueError, match="power of two"):
        cosine_dup_pairs(_docs([{"doc_id": 1, "text": "x"}]), grid=3)
    with pytest.raises(ValueError, match="threshold"):
        cosine_dup_pairs(_docs([{"doc_id": 1, "text": "x"}]), num=6, den=5)
