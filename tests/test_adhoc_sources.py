"""S2 stdin-style ad-hoc validation + S5 gated HTTP fetch."""

import pytest

from yj_schema_validator_ray.config import NO_SCHEMA_MSG, ValidatorConfig
from yj_schema_validator_ray.sources.adhoc import (
    adhoc_corpus, fetch_schema_http, validate_strings)
from yj_schema_validator_ray.sources.corpus import schema_registry


def test_single_string_named_stdin(ray_session):
    cfg = ValidatorConfig(schemas=schema_registry())
    out = validate_strings(
        ["$schema: schemas/sample-schema.json\nsample:\n  string-sample: x\n"],
        cfg).to_pandas()
    assert list(out["doc_key"]) == ["stdin"]
    assert bool(out["valid"].iloc[0]) is True


def test_multiple_strings_numbered(ray_session):
    cfg = ValidatorConfig(schemas=schema_registry())
    out = validate_strings(
        ["$schema: schemas/sample-schema.json\nsample:\n  string-sample: x\n",
         "no-schema: here\n"], cfg).to_pandas().sort_values("doc_key")
    assert list(out["doc_key"]) == ["stdin-1", "stdin-2"]
    assert out.set_index("doc_key").loc["stdin-2", "error"] == NO_SCHEMA_MSG


def test_multidoc_stdin_explodes(ray_session):
    cfg = ValidatorConfig(schemas=schema_registry())
    content = ("$schema: schemas/sample-schema.json\nsample:\n  string-sample: a\n"
               "---\n$schema: schemas/sample-schema.json\nsample:\n  string-sample: b\n")
    out = validate_strings([content], cfg).to_pandas().sort_values("doc_key")
    assert list(out["doc_key"]) == ["stdin-1", "stdin-2"]
    assert out["valid"].all()


def test_http_fetch_gated_offline():
    with pytest.raises(RuntimeError, match="Error fetching schema from URL"):
        fetch_schema_http("http://127.0.0.1:9/schema.json", timeout_s=0.2)
