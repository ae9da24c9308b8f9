"""Report renderer parity tests against the reference's golden shapes
(/root/reference/src/test/resources/testreport/*)."""

import json

from yj_schema_validator_ray.pipelines import reports

INVALID_FILES = {
    "src/test/resources/testdata/invalid.yaml": {
        "valid": False, "error": None,
        "details": [{
            "evaluation_path": "/properties/sample/properties/boolean-sample",
            "schema_path": "urn:example:10#/properties/sample/properties/boolean-sample",
            "instance_path": "/sample/boolean-sample",
            "keyword": "type",
            "message": "integer found, boolean expected",
        }],
    },
}

MULTI3_FILES = {
    "t/multi3invalid.yaml-1": {"valid": True, "error": None, "details": []},
    "t/multi3invalid.yaml-2": {
        "valid": False,
        "error": "No schema found in YAML file or provided as parameter",
        "details": []},
    "t/multi3invalid.yaml-3": {"valid": True, "error": None, "details": []},
}


def test_text_report_matches_reference_golden():
    # golden: testreport/invalidyaml.txt
    expected = ("Validation Result: invalid\n"
                "src/test/resources/testdata/invalid.yaml: invalid\n"
                " Details:\n"
                " Path: /sample/boolean-sample\n"
                " Schema: urn:example:10#/properties/sample/properties/boolean-sample\n"
                " type: integer found, boolean expected\n")
    assert reports.to_text(INVALID_FILES) == expected


def test_text_multi3_matches_reference_golden():
    # golden: testreport/multi3invalidyaml.txt
    expected = ("Validation Result: invalid\n"
                "t/multi3invalid.yaml-1: ok\n"
                "t/multi3invalid.yaml-2: invalid\n"
                " error: No schema found in YAML file or provided as parameter\n"
                "t/multi3invalid.yaml-3: ok\n")
    assert reports.to_text(MULTI3_FILES) == expected


def test_json_report_matches_reference_golden():
    # golden: testreport/invalidyaml.json (Jackson pretty-printer layout)
    golden = """{
  "valid" : false,
  "files" : {
    "src/test/resources/testdata/invalid.yaml" : {
      "valid" : false,
      "details" : [ {
        "valid" : false,
        "evaluationPath" : "/properties/sample/properties/boolean-sample",
        "schemaLocation" : "urn:example:10#/properties/sample/properties/boolean-sample",
        "instanceLocation" : "/sample/boolean-sample",
        "errors" : {
          "type" : "integer found, boolean expected"
        }
      } ]
    }
  }
}"""
    assert reports.to_json(INVALID_FILES) == golden


def test_json_multi3_matches_reference_golden():
    got = json.loads(reports.to_json(MULTI3_FILES))
    assert got == {
        "valid": False,
        "files": {
            "t/multi3invalid.yaml-1": {"valid": True},
            "t/multi3invalid.yaml-2": {
                "valid": False,
                "errors": {"error": "No schema found in YAML file or provided as parameter"}},
            "t/multi3invalid.yaml-3": {"valid": True},
        },
    }


def test_junit_report_shape():
    xml = reports.to_junit(INVALID_FILES)
    assert '<testsuites errors="0" failures="1" name="SchemaValidationSuite" skipped="0" tests="1">' in xml
    assert '<failure message="Type Mismatch at /sample/boolean-sample">integer found, boolean expected</failure>' in xml


def test_junit_failure_categories():
    assert reports._failure_category(
        {"valid": False, "error": "No schema found in YAML file or provided as parameter",
         "details": []}) == "No Schema Error"
    assert reports._failure_category(
        {"valid": False, "error": "YAML parse error: x", "details": []}) == "YAML Parse Error"
    assert reports._failure_category(
        {"valid": False, "error": "Schema not found: x", "details": []}) == "Validation Error"


def test_sarif_report_shape():
    doc = json.loads(reports.to_sarif(INVALID_FILES))
    assert doc["version"] == "2.1.0"
    run = doc["runs"][0]
    assert run["invocations"][0]["executionSuccessful"] is False
    assert run["invocations"][0]["exitCode"] == 1
    res = run["results"][0]
    assert res["message"]["text"] == \
        "At path '/sample/boolean-sample': integer found, boolean expected"
    assert res["locations"][0]["physicalLocation"]["region"]["snippet"]["text"] == \
        "Path: /sample/boolean-sample"
    assert run["tool"]["driver"]["name"] == "YAML Schema Validator"


def test_llm_json_and_compact():
    files = {
        "a.yaml": {"valid": True, "error": None, "details": []},
        "b.yaml": {"valid": False, "error": "boom", "details": []},
    }
    root = json.loads(reports.to_llm(files))
    assert root["summary"] == {"files": 2, "valid": 1, "invalid": 1, "errors": 1}
    second = root["results"][1]
    assert second["file"] == "b.yaml" and second["valid"] is False
    assert second["errors"][0]["keyword"] == "error"
    assert second["errors"][0]["message"] == "boom"

    compact = reports.to_llm(files, compact=True)
    assert compact.startswith("# 1/2 files valid, 1 errors")
    assert "b.yaml: [error]: boom" in compact


def test_exit_code_and_colors():
    assert reports.exit_code(MULTI3_FILES) == 1
    assert reports.exit_code({"a": {"valid": True, "error": None, "details": []}}) == 0
    colored = reports.to_text(MULTI3_FILES, color=True)
    assert "\x1b[31minvalid\x1b[0;39m" in colored
    assert "\x1b[32mok\x1b[0;39m" in colored


def test_yaml_report_roundtrip():
    import yaml

    tree = yaml.safe_load(reports.to_yaml(INVALID_FILES))
    assert tree["valid"] is False
    assert tree["files"]["src/test/resources/testdata/invalid.yaml"]["details"][0][
        "errors"]["type"] == "integer found, boolean expected"


def test_llm_json_localises_schema_violations():
    """Mirror of the reference's jsonReportLocalisesSchemaViolations
    (FilesOutputToLlmTest.java:71-91): per-instance violations carry a
    JSON pointer, a keyword and the schema location; summary counts the
    file invalid; 'summary' precedes 'results' in the serialized JSON."""
    from yj_schema_validator_ray.functions.compiler import compile_schema

    schema = {"type": "object", "required": ["age"],
              "properties": {"name": {"type": "string"},
                             "age": {"type": "integer"}}}
    out = compile_schema(schema, "urn:t").validate({"name": 42})
    details = [{"instance_path": v.instance_location, "keyword": v.keyword,
                "message": v.message, "schema_path": v.schema_location,
                "evaluation_path": v.evaluation_path}
               for v in out]
    files = {"bad.yaml": {"valid": False, "error": None,
                          "details": details}}
    raw = reports.to_llm(files)
    root = json.loads(raw)
    assert root["summary"]["invalid"] == 1
    errs = root["results"][0]["errors"]
    assert len(errs) > 0
    assert "schemaLocation" in raw
    assert "pointer" in errs[0] and "keyword" in errs[0]
    # summary-first ordering is part of the surface (LLM prompt budget)
    assert raw.index('"summary"') < raw.index('"results"')
    kws = {e["keyword"] for e in errs}
    assert kws == {"required", "type"}
