"""Property-based checks (hypothesis) for the low-level vectorized
helpers: binary pack/unpack roundtrips, FNV vectorization vs the scalar
definition, JSON-equality axioms."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from yj_schema_validator_ray.functions.compiler import json_equal
from yj_schema_validator_ray.stages.dedup import (
    _pack_list_binary, _unpack_binary_matrix)
from yj_schema_validator_ray.stages.text import _fnv1a_rolling

# ---------------------------------------------------------------------------
# pack/unpack roundtrip (fixed-size lists — the minhash signature shape)
# ---------------------------------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(-2**63, 2**63 - 1),
                         min_size=4, max_size=4), min_size=1, max_size=20))
def test_pack_unpack_fixed_roundtrip(rows):
    col = pa.array(rows, pa.list_(pa.int64(), 4))
    packed = _pack_list_binary(col)
    got = _unpack_binary_matrix(packed)
    assert got.tolist() == rows


@settings(max_examples=50, deadline=None)
@given(st.lists(st.lists(st.integers(-2**63, 2**63 - 1),
                         min_size=4, max_size=4), min_size=3, max_size=20))
def test_unpack_handles_taken_slices(rows):
    col = pa.array(rows, pa.list_(pa.int64(), 4))
    packed = _pack_list_binary(col)
    sliced = packed.slice(1, len(rows) - 2)
    assert _unpack_binary_matrix(sliced).tolist() == rows[1:-1]


# ---------------------------------------------------------------------------
# vectorized FNV-1a == scalar definition
# ---------------------------------------------------------------------------


def _fnv_scalar(t: str) -> int:
    h = 1469598103934665603
    for b in t.encode("utf-8"):
        h = ((h ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h - (1 << 63)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.text(max_size=200), min_size=1, max_size=10))
def test_fnv_vector_equals_scalar(texts):
    got = _fnv1a_rolling(pa.array(texts, pa.string()))
    assert list(got) == [_fnv_scalar(t) for t in texts]


# ---------------------------------------------------------------------------
# json_equal axioms (draft 2020-12 instance equality)
# ---------------------------------------------------------------------------

_json = st.recursive(
    st.none() | st.booleans() | st.integers(-10, 10)
    | st.floats(allow_nan=False, allow_infinity=False, width=32)
    | st.text(max_size=8),
    lambda inner: st.lists(inner, max_size=3)
    | st.dictionaries(st.text(max_size=4), inner, max_size=3),
    max_leaves=8)


@settings(max_examples=100, deadline=None)
@given(_json)
def test_json_equal_reflexive(v):
    assert json_equal(v, v)


@settings(max_examples=100, deadline=None)
@given(_json, _json)
def test_json_equal_symmetric(a, b):
    assert json_equal(a, b) == json_equal(b, a)


@settings(max_examples=50, deadline=None)
@given(st.integers(-5, 5))
def test_json_equal_numeric_not_boolean(i):
    assert json_equal(i, float(i))
    assert not json_equal(bool(i), i) or isinstance(i, bool)
    assert not json_equal(True, 1) and not json_equal(False, 0)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(-3, 3), max_size=4))
def test_json_equal_containers_numeric(xs):
    assert json_equal(xs, [float(x) for x in xs])
    assert not json_equal({"a": xs}, {"a": xs + [0]})
