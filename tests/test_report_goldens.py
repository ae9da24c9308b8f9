"""Byte-parity of rendered JUnit/SARIF (and JSON/text) reports against
the reference's golden files in ``testreport/`` — the same comparison the
reference's own runner test does (``YamlSchemaValidatorRunnerTest.java:200-236``),
with its normalization (``util/XmlCompareUtil.java:29-37``): lines
trimmed, XML attributes sorted, SARIF timestamps blanked.  Goldens are
read from /root/reference at test time, never copied in."""

import json
import re
from pathlib import Path

import pyarrow as pa
import pytest

from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.pipelines import reports
from yj_schema_validator_ray.stages.validator import SchemaValidator

REF = Path("/root/reference/src/test/resources")

pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference fixtures not available")

_ATTR = re.compile(r'(\w[\w.-]*)=("[^"]*"|\'[^\']*\')')
_TS = re.compile(r'"(startTimeUtc|endTimeUtc)"\s*:\s*"[^"]*"')


def _normalize_xml_line(line: str) -> str:
    line = line.strip()
    if not (line.startswith("<") and "=" in line):
        return line
    head = line.split(" ", 1)[0]
    tail = "/>" if line.rstrip().endswith("/>") else ">"
    rest = line[len(head):].rstrip(">/").rstrip()
    attrs = sorted(f"{k}={v}" for k, v in _ATTR.findall(rest))
    suffix = line[line.index(">") + 1:] if tail == ">" else ""
    return head + " " + " ".join(attrs) + tail + suffix


def _normalize(text: str) -> list[str]:
    text = _TS.sub(lambda m: f'"{m.group(1)}":""', text)
    return [_normalize_xml_line(line) for line in text.strip().split("\n")]


def _validate(name: str) -> dict:
    schema = json.loads((REF / "testdata" / "sample-schema.json").read_text())
    v = SchemaValidator(ValidatorConfig(schemas={
        "src/test/resources/testdata/sample-schema.json": schema,
        "src/test/resources/testdata/sample-schema.yaml": schema}))
    path = f"src/test/resources/testdata/{name}"
    content = (REF / "testdata" / name).read_text()
    batch = pa.table({"repo": ["ref"], "path": [path], "commit": ["c"],
                      "lang": ["yaml"], "content": [content]})
    rows = sorted(v(batch).to_pylist(), key=lambda r: r["doc_index"])
    return {r["doc_key"]: {"valid": bool(r["valid"]), "error": r["error"],
                           "details": list(r["violations"] or [])}
            for r in rows}


def _golden(stem: str, ext: str) -> str:
    return (REF / "testreport" / f"{stem}.{ext}").read_text()


@pytest.mark.parametrize("fixture,stem", [
    ("invalid.yaml", "invalidyaml"),
    ("valid.yaml", "validyaml"),
    ("multi3invalid.yaml", "multi3invalidyaml"),
])
def test_junit_golden_byte_parity(fixture, stem):
    files = _validate(fixture)
    ours = reports.to_junit(files, file_attr="src/test/resources")
    assert _normalize(ours) == _normalize(_golden(stem, "xml"))


@pytest.mark.parametrize("fixture,stem", [
    ("invalid.yaml", "invalidyaml"),
    ("valid.yaml", "validyaml"),
    ("multi3invalid.yaml", "multi3invalidyaml"),
])
def test_sarif_golden_byte_parity(fixture, stem):
    files = _validate(fixture)
    ours = reports.to_sarif(files)
    assert _normalize(ours) == _normalize(_golden(stem, "sarif"))


@pytest.mark.parametrize("fixture,stem", [
    ("invalid.yaml", "invalidyaml"),
    ("valid.yaml", "validyaml"),
    ("multi3invalid.yaml", "multi3invalidyaml"),
])
def test_json_golden_byte_parity(fixture, stem):
    files = _validate(fixture)
    ours = reports.to_json(files)
    assert _normalize(ours) == _normalize(_golden(stem, "json"))


@pytest.mark.parametrize("fixture,stem", [
    ("invalid.yaml", "invalidyaml"),
    ("valid.yaml", "validyaml"),
    ("multi3invalid.yaml", "multi3invalidyaml"),
])
def test_text_golden_byte_parity(fixture, stem):
    files = _validate(fixture)
    ours = reports.to_text(files)
    assert _normalize(ours) == _normalize(_golden(stem, "txt"))
