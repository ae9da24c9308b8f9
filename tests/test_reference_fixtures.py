"""Golden parity against the REFERENCE'S OWN fixtures: feed the actual
files under /root/reference/src/test/resources/testdata/ (read at test
time, never copied) through our engine and expect the reference's golden
results (testreport/*.json):

- invalid.yaml -> exactly one violation: (type, /sample/boolean-sample,
  "integer found, boolean expected", urn:example:10#/properties/sample/
  properties/boolean-sample)    [testreport/invalidyaml.json:6-14]
- valid.yaml (2 docs) -> both valid          [testreport/validyaml.txt]
- multi3invalid.yaml -> [true, false(No schema), true]
                                     [testreport/multi3invalidyaml.json]
- empty.yaml -> "No schema found..."; badformat.yaml -> parse error
"""

import json
from pathlib import Path

import pyarrow as pa
import pytest

from yj_schema_validator_ray.config import NO_SCHEMA_MSG, ValidatorConfig
from yj_schema_validator_ray.stages.validator import SchemaValidator

REF = Path("/root/reference/src/test/resources/testdata")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference fixtures not available")


@pytest.fixture(scope="module")
def validator():
    schema = json.loads((REF / "sample-schema.json").read_text())
    # doc files embed "$schema: ./sample-schema.json" and live at the
    # fixture dir root, so register under the resolved relative id
    return SchemaValidator(ValidatorConfig(
        schemas={"sample-schema.json": schema}))


def run_file(validator, name):
    content = (REF / name).read_text()
    batch = pa.table({"repo": ["ref"], "path": [name], "commit": ["c"],
                      "lang": ["yaml"], "content": [content]})
    return {r["doc_key"]: r for r in validator(batch).to_pylist()}


def test_invalid_yaml_golden_violation(validator):
    out = run_file(validator, "invalid.yaml")
    r = out["invalid.yaml"]
    assert r["valid"] is False
    v = r["violations"]
    assert len(v) == 1
    assert v[0]["keyword"] == "type"
    assert v[0]["message"] == "integer found, boolean expected"
    assert v[0]["instance_path"] == "/sample/boolean-sample"
    assert v[0]["schema_path"] == \
        "urn:example:10#/properties/sample/properties/boolean-sample"
    assert v[0]["evaluation_path"] == \
        "/properties/sample/properties/boolean-sample"


def test_valid_yaml_two_docs(validator):
    out = run_file(validator, "valid.yaml")
    # second doc points at sample-schema.yaml; register both ids
    schema = json.loads((REF / "sample-schema.json").read_text())
    v2 = SchemaValidator(ValidatorConfig(schemas={
        "sample-schema.json": schema, "sample-schema.yaml": schema}))
    out = run_file(v2, "valid.yaml")
    assert set(out) == {"valid.yaml-1", "valid.yaml-2"}
    assert all(r["valid"] for r in out.values()), {
        k: [vv["message"] for vv in r["violations"]] for k, r in out.items()}


def test_valid_json_single_doc(validator):
    out = run_file(validator, "valid.json")
    assert out["valid.json"]["valid"] is True


def test_invalid_json_boolean_sample(validator):
    out = run_file(validator, "invalid.json")
    r = out["invalid.json"]
    assert r["valid"] is False
    msgs = {(v["keyword"], v["instance_path"]) for v in r["violations"]}
    assert ("type", "/sample/boolean-sample") in msgs


def test_multi3invalid_golden_pattern(validator):
    out = run_file(validator, "multi3invalid.yaml")
    assert out["multi3invalid.yaml-1"]["valid"] is True
    assert out["multi3invalid.yaml-2"]["valid"] is False
    assert out["multi3invalid.yaml-2"]["error"] == NO_SCHEMA_MSG
    assert out["multi3invalid.yaml-3"]["valid"] is True


def test_multi3valid_all_ok(validator):
    out = run_file(validator, "multi3valid.yaml")
    assert len(out) == 3 and all(r["valid"] for r in out.values())


def test_empty_yaml_no_schema(validator):
    out = run_file(validator, "empty.yaml")
    assert out["empty.yaml"]["error"] == NO_SCHEMA_MSG


def test_badformat_yaml_parse_error(validator):
    out = run_file(validator, "badformat.yaml")
    r = out["badformat.yaml"]
    assert r["valid"] is False
    assert r["error"] is not None


def test_valid_no_schema_yaml(validator):
    out = run_file(validator, "validNoSchema.yaml")
    assert out["validNoSchema.yaml"]["error"] == NO_SCHEMA_MSG
