"""Per-keyword unit tests for the JSON-Schema compiler, pinning the
NetworkNT-style messages (the reference golden pins type's
"integer found, boolean expected" byte-for-byte:
/root/reference/src/test/resources/testreport/invalidyaml.json:6-14)."""

import pytest

from yj_schema_validator_ray.functions.compiler import compile_schema, json_type_name


def first(schema, value, uri=""):
    out = compile_schema(schema, uri).validate(value)
    return out[0] if out else None


def test_type_golden_message():
    # mirrors the reference's invalid.yaml fixture result
    schema = {"$id": "urn:example:10", "type": "object", "properties": {
        "sample": {"type": "object", "properties": {
            "boolean-sample": {"type": "boolean"}}}}}
    v = first(schema, {"sample": {"boolean-sample": 123}})
    assert v.message == "integer found, boolean expected"
    assert v.keyword == "type"
    assert v.instance_location == "/sample/boolean-sample"
    assert v.evaluation_path == "/properties/sample/properties/boolean-sample"
    assert v.schema_location == "urn:example:10#/properties/sample/properties/boolean-sample"


@pytest.mark.parametrize("value,found", [
    (None, "null"), (True, "boolean"), (3, "integer"), (3.5, "number"),
    ("x", "string"), ({}, "object"), ([], "array"),
])
def test_type_names(value, found):
    assert json_type_name(value) == found


def test_integer_accepts_integral_float():
    assert first({"type": "integer"}, 10.0) is None
    assert first({"type": "integer"}, 10.5).message == "number found, integer expected"
    assert first({"type": "number"}, True).message == "boolean found, number expected"


def test_enum():
    v = first({"enum": ["a", "b"]}, "c")
    assert v.message == "does not have a value in the enumeration [a, b]"
    assert first({"enum": ["a", "b"]}, "a") is None


def test_pattern_precompiled():
    v = first({"pattern": "^cfg-[0-9]+$"}, "nope")
    assert v.message == "does not match the regex pattern ^cfg-[0-9]+$"
    assert first({"pattern": "^cfg-[0-9]+$"}, "cfg-12") is None
    assert first({"pattern": "^x$"}, 5) is None  # non-strings pass


def test_required():
    out = compile_schema({"required": ["age", "name"],
                          "properties": {"name": {"type": "string"}}}).validate({"name": 42})
    msgs = sorted(v.message for v in out)
    assert "required property 'age' not found" in msgs
    assert any(m == "integer found, string expected" for m in msgs)


def test_bounds_and_lengths():
    assert first({"minimum": 10}, 5).message == "must have a minimum value of 10"
    assert first({"maximum": 200}, 500).message == "must have a maximum value of 200"
    assert first({"exclusiveMinimum": 0}, 0).message == "must have an exclusive minimum value of 0"
    assert first({"minLength": 1}, "").message == "must be at least 1 characters long"
    assert first({"maxLength": 2}, "abc").message == "must be at most 2 characters long"
    assert first({"minItems": 2}, [1]).message == "must have at least 2 items but found 1"
    assert first({"multipleOf": 3}, 10).message == "must be multiple of 3"
    assert first({"multipleOf": 0.1}, 0.3) is None  # fp-tolerant


@pytest.mark.parametrize("fmt,good,bad", [
    ("email", "a@b.co", "not-an-email"),
    ("date", "2024-02-29", "2023-02-29"),
    ("date-time", "2024-01-01T10:00:00Z", "2024-01-01T99:00:00Z"),
    ("uri", "https://x.y/z", "no scheme"),
    ("uuid", "123e4567-e89b-12d3-a456-426614174000", "xyz"),
    ("ipv4", "10.0.0.1", "10.0.0.999"),
    ("regex", "^a+$", "a[("),
])
def test_formats(fmt, good, bad):
    schema = {"type": "string", "format": fmt}
    assert first(schema, good) is None
    assert first(schema, bad).message == f"does not match the {fmt} pattern"


def test_items_and_prefix_items():
    v = first({"items": {"type": "integer"}}, [1, "a"])
    assert v.instance_location == "/1"
    assert v.message == "string found, integer expected"
    v = first({"prefixItems": [{"type": "string"}], "items": {"type": "integer"}},
              ["ok", 2, "bad"])
    assert v.instance_location == "/2"


def test_additional_properties_false_and_schema():
    v = first({"properties": {"a": {}}, "additionalProperties": False}, {"a": 1, "b": 2})
    assert "property 'b' is not defined" in v.message
    v = first({"additionalProperties": {"type": "string"}}, {"k": 1})
    assert v.message == "integer found, string expected"
    assert v.instance_location == "/k"


def test_recursive_ref_logger_levels():
    # the reference sample-schema's self-referential loggerLevelProp shape
    schema = {
        "$id": "urn:example:10",
        "$defs": {
            "loggerLevel": {"type": "string", "enum": ["INFO", "ERROR"]},
            "loggerLevelProp": {"type": "object", "additionalProperties": {
                "oneOf": [{"$ref": "#/$defs/loggerLevel"},
                          {"$ref": "#/$defs/loggerLevelProp"}]}},
        },
        "$ref": "#/$defs/loggerLevelProp",
    }
    c = compile_schema(schema, "urn:example:10")
    assert c.validate({"root": "INFO", "sun": {"rmi": "ERROR"}}) == []
    out = c.validate({"root": "nope"})
    assert out[0].keyword == "oneOf"
    assert out[0].message == "must be valid to one and only one schema, but 0 are valid"


def test_oneof_anyof_allof_not():
    assert first({"oneOf": [{"type": "integer"}, {"minimum": 0}]}, 5).message \
        == "must be valid to one and only one schema, but 2 are valid"
    assert first({"anyOf": [{"type": "integer"}, {"type": "string"}]}, 5) is None
    assert first({"anyOf": [{"type": "integer"}], }, "x").message \
        == "must be valid to at least one of the schemas"
    assert first({"allOf": [{"type": "integer"}, {"minimum": 10}]}, 5).keyword == "minimum"
    assert first({"not": {"type": "integer"}}, 5).message == "must not be valid to the schema"


def test_unique_items_and_const_and_contains():
    assert first({"uniqueItems": True}, [1, 2, 1]).keyword == "uniqueItems"
    assert first({"const": 5}, 6).message == "must be the constant value '5'"
    assert first({"contains": {"type": "string"}}, [1, 2]).keyword == "contains"
    assert first({"contains": {"type": "string"}}, [1, "a"]) is None


def test_json_equality_semantics():
    # draft 2020-12: numbers compare mathematically, booleans never equal
    # numbers — for BOTH const and enum
    assert first({"const": 1}, 1.0) is None
    assert first({"const": 1.0}, 1) is None
    assert first({"const": 1}, True) is not None
    assert first({"enum": [1]}, True) is not None
    assert first({"enum": [1]}, 1.0) is None
    assert first({"enum": [0]}, False) is not None
    assert first({"enum": [True]}, True) is None
    assert first({"enum": ["a", "b"]}, "a") is None
    assert first({"enum": ["1"]}, 1) is not None
    # containers apply the same rules element-wise
    assert first({"const": [1, 2]}, [1.0, 2]) is None
    assert first({"const": [1]}, [True]) is not None
    assert first({"const": {"a": 1}}, {"a": 1.0}) is None
    assert first({"const": {"a": 1}}, {"a": True}) is not None


def test_multiple_of_exact_semantics():
    # tiny divisors must not accept everything (old float-quotient
    # tolerance did); BigDecimal-style exactness instead
    assert first({"multipleOf": 1e-10}, 0.00000000015) is not None
    assert first({"multipleOf": 1e-10}, 0.0000000002) is None
    assert first({"multipleOf": 0.01}, 19.99) is None
    assert first({"multipleOf": 0.01}, 19.995) is not None
    assert first({"multipleOf": 2}, 10**20) is None
    assert first({"multipleOf": 3}, 10**20 + 1) is not None


def test_nested_eval_and_ref_paths():
    schema = {"$id": "urn:x", "properties": {
        "lv": {"$ref": "#/$defs/L"}},
        "$defs": {"L": {"type": "string"}}}
    v = first(schema, {"lv": 1})
    assert v.evaluation_path == "/properties/lv/$ref"
    assert v.schema_location == "urn:x#/$defs/L"


def test_anchor_and_dynamic_ref():
    # $anchor plain-name fragment resolution
    s = {"$id": "urn:a", "$defs": {"x": {"$anchor": "node", "type": "integer"}},
         "$ref": "#node"}
    c = compile_schema(s, "urn:a")
    assert c.validate(5) == []
    assert c.validate("s")[0].message == "string found, integer expected"
    # $dynamicRef/$dynamicAnchor (single-resource recursive tree)
    t = {"$id": "urn:tree", "$dynamicAnchor": "node", "type": "object",
         "properties": {"v": {"type": "integer"},
                        "kids": {"type": "array",
                                 "items": {"$dynamicRef": "#node"}}}}
    c2 = compile_schema(t, "urn:tree")
    assert c2.validate({"v": 1, "kids": [{"v": 2, "kids": []}]}) == []
    assert c2.validate({"v": 1, "kids": [{"v": "x"}]})[0].keyword == "type"
    # same-document absolute-URI self ref
    u = {"$id": "urn:b", "$defs": {"s": {"type": "string"}},
         "$ref": "urn:b#/$defs/s"}
    assert compile_schema(u, "urn:b").validate("ok") == []


def test_absolute_ref_uri_boundary():
    import pytest as _pt

    from yj_schema_validator_ray.functions.compiler import SchemaCompileError

    # a SIBLING URI sharing the base as a prefix must NOT be treated as
    # same-document (urn:b vs urn:b2)
    s = {"$id": "urn:b", "$defs": {"t": {"type": "string"}},
         "properties": {"x": {"$ref": "urn:b2#/$defs/t"}}}
    with _pt.raises(SchemaCompileError):
        compile_schema(s, "urn:b")
    # with an empty base, remote refs still fail AT COMPILE TIME
    with _pt.raises(SchemaCompileError):
        compile_schema({"$ref": "https://x.y/s.json#/a"}, "")
