"""Differential test: our compiled validator's VERDICT (valid/invalid)
must agree with the reference-grade `jsonschema` library (draft 2020-12)
on randomized documents.  Messages are engine-specific; validity is not.

Formats are excluded here (the engine treats format assertions as hard
errors per the reference config, while jsonschema's default ignores
them); format behavior is pinned by unit tests instead.
"""

import json

import jsonschema
import pytest
from hypothesis import given, settings, strategies as st

from yj_schema_validator_ray.functions.compiler import compile_schema

SCHEMAS = [
    {"type": "object",
     "required": ["name"],
     "properties": {
         "name": {"type": "string", "minLength": 1, "maxLength": 20},
         "age": {"type": "integer", "minimum": 0, "maximum": 150},
         "tags": {"type": "array", "items": {"type": "string"},
                  "minItems": 0, "maxItems": 5, "uniqueItems": True},
         "mode": {"enum": ["a", "b", "c", 1, 2, None]},
         "ratio": {"type": "number", "exclusiveMinimum": 0,
                   "exclusiveMaximum": 1},
         "pat": {"type": "string", "pattern": "^x[0-9]*$"},
     },
     "additionalProperties": False},
    {"oneOf": [{"type": "integer", "minimum": 10},
               {"type": "string", "maxLength": 3},
               {"type": "object", "required": ["k"]}]},
    {"anyOf": [{"type": "integer", "multipleOf": 3},
               {"type": "array", "contains": {"type": "boolean"}}]},
    {"allOf": [{"type": "object"},
               {"properties": {"v": {"not": {"type": "null"}}}}]},
    {"$defs": {"node": {"type": "object", "properties": {
        "value": {"type": "integer"},
        "next": {"$ref": "#/$defs/node"}},
        "additionalProperties": False}},
     "$ref": "#/$defs/node"},
    {"type": "object", "patternProperties": {"^n_": {"type": "integer"}},
     "additionalProperties": {"type": "string"}},
    {"prefixItems": [{"type": "string"}, {"type": "integer"}],
     "items": {"type": "boolean"}, "type": "array"},
    {"if": {"type": "object", "required": ["k"]},
     "then": {"properties": {"v": {"type": "integer"}}},
     "else": {"type": "array"}},
    {"type": "object",
     "dependentRequired": {"name": ["age"]},
     "dependentSchemas": {"v": {"properties": {"v": {"type": "integer"}}}}},
    {"type": "object", "propertyNames": {"maxLength": 4}},
    {"type": "array", "contains": {"type": "integer"},
     "minContains": 2, "maxContains": 3},
    # annotation-dependent keywords (dynamic evaluated-set semantics)
    {"allOf": [{"properties": {"name": {}}},
               {"patternProperties": {"^n_": {}}}],
     "unevaluatedProperties": False},
    {"anyOf": [{"required": ["k"], "properties": {"k": {}}},
               {"required": ["v"], "properties": {"v": {}}}],
     "unevaluatedProperties": {"type": "string"}},
    {"prefixItems": [{"type": "string"}],
     "contains": {"type": "integer"},
     "unevaluatedItems": {"type": "boolean"}},
    # $anchor plain-name fragment + const/enum numeric-equality edges
    {"$defs": {"leaf": {"$anchor": "leaf", "type": "integer"}},
     "type": "object", "properties": {"v": {"$ref": "#leaf"}}},
    {"properties": {"c": {"const": 1}, "e": {"enum": [0, 1.5, "x", True]}}},
    # $dynamicRef resolving within a single resource (tree recursion)
    {"$dynamicAnchor": "node", "type": "object",
     "properties": {"value": {"type": "integer"},
                    "next": {"$dynamicRef": "#node"}},
     "additionalProperties": False},
]

json_scalars = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-1000, max_value=1000),
    st.floats(allow_nan=False, allow_infinity=False,
              min_value=-1e6, max_value=1e6),
    st.text(alphabet="abcxyz0189_ ", max_size=12),
)
json_values = st.recursive(
    json_scalars,
    lambda children: st.one_of(
        st.lists(children, max_size=5),
        st.dictionaries(
            st.one_of(st.sampled_from(["name", "age", "tags", "mode", "ratio",
                                       "pat", "k", "v", "value", "next",
                                       "n_a", "other"]),
                      st.text(alphabet="abkn_", max_size=5)),
            children, max_size=5)),
    max_leaves=12)


@pytest.mark.parametrize("schema_idx", range(len(SCHEMAS)))
@settings(max_examples=150, deadline=None)
@given(doc=json_values)
def test_verdict_matches_jsonschema(schema_idx, doc):
    schema = SCHEMAS[schema_idx]
    ours = compile_schema(schema, "urn:test").validate(doc) == []
    theirs = jsonschema.Draft202012Validator(schema).is_valid(doc)
    assert ours == theirs, (
        f"verdict mismatch on {json.dumps(doc, default=str)[:200]}: "
        f"ours={ours} jsonschema={theirs}")
