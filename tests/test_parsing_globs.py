"""Parsing (JSON-first / YAML-fallback / multi-doc) and catalog globs."""

import pytest

from yj_schema_validator_ray.functions.globs import compile_glob, glob_matches
from yj_schema_validator_ray.functions.catalog import SchemaDetector
from yj_schema_validator_ray.functions.parsing import (
    ParseError, doc_keys, extract_schema_ref, parse_documents)


def test_json_first():
    # JSON parse attempted first -> a JSON file is exactly one document
    assert parse_documents('{"a": 1}') == [{"a": 1}]
    # "123" is valid JSON (scalar)
    assert parse_documents("123") == [123]


def test_yaml_fallback_multidoc():
    docs = parse_documents("a: 1\n---\nb: 2\n")
    assert docs == [{"a": 1}, {"b": 2}]


def test_empty_yaml_doc_parses_to_none():
    assert parse_documents("---\n") == [None]


def test_parse_error_is_deterministic():
    with pytest.raises(ParseError) as ei:
        parse_documents("key: [unclosed\n")
    assert str(ei.value).startswith("YAML parse error: ")


def test_doc_keys_reference_naming():
    # bare path for one doc, path-i (1-based) for many
    # (YamlSchemaValidator.java:112-121)
    assert doc_keys("f.yaml", 1) == ["f.yaml"]
    assert doc_keys("f.yaml", 3) == ["f.yaml-1", "f.yaml-2", "f.yaml-3"]


def test_extract_schema_ref():
    assert extract_schema_ref({"$schema": "./s.json"}) == "./s.json"
    assert extract_schema_ref({"a": 1}) is None
    assert extract_schema_ref(None) is None
    assert extract_schema_ref([1]) is None


@pytest.mark.parametrize("pattern,path,matches", [
    ("*.yaml", "a/b/c.yaml", True),          # basename-only when no '/'
    ("*.yaml", "c.yml", False),
    ("configs/*.yaml", "configs/app.yaml", True),
    ("configs/*.yaml", "configs/sub/app.yaml", False),   # * stays in segment
    ("**/*.yaml", "a/b/c.yaml", True),                    # ** crosses segments
    ("a?c.yml", "abc.yml", True),
    ("a?c.yml", "ac.yml", False),
    (".github/workflows/*.yml", ".github/workflows/ci.yml", True),
])
def test_glob_semantics(pattern, path, matches):
    assert glob_matches(compile_glob(pattern), path) is matches


def test_specificity_most_literal_wins():
    g1 = compile_glob("*.yaml")
    g2 = compile_glob("configs/app-*.yaml")
    assert g2.specificity > g1.specificity
    det = SchemaDetector()
    assert det.detect("configs/app-7.yaml") == "app-config"
    assert det.detect(".github/workflows/ci.yml") == "github-workflow"
    assert det.detect("Chart.yaml") == "helm-chart"
    assert det.detect("README.md") is None
