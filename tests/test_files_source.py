"""Directory/file-tree source: read_binary_files-based corpus + lazy
local schema loading from the tree (reference filesystem parity)."""

import json
from pathlib import Path

import pytest

from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.sources.files import corpus_from_directory

SCHEMA = {
    "$id": "urn:test:tree",
    "type": "object",
    "properties": {"flag": {"type": "boolean"}},
    "required": ["flag"],
}


@pytest.fixture()
def tree(tmp_path):
    root = tmp_path / "tree"
    (root / "sub").mkdir(parents=True)
    (root / "schemas").mkdir()
    (root / "schemas" / "s.json").write_text(json.dumps(SCHEMA))
    (root / "good.yaml").write_text("$schema: ./schemas/s.json\nflag: true\n")
    (root / "sub" / "bad.yaml").write_text(
        "$schema: ../schemas/s.json\nflag: 7\n")
    (root / "sub" / "missing.yaml").write_text(
        "$schema: ./nope.json\nflag: true\n")
    (root / "plain.json").write_text('{"flag": false, "$schema": "schemas/s.json"}')
    (root / "ignored.txt").write_text("not a doc")
    return root


def test_corpus_from_directory_shape(tree, ray_session):
    rows = {r["path"]: r for r in corpus_from_directory(str(tree)).take_all()}
    # only yaml/yml/json picked up, paths relative to the root
    assert set(rows) == {"good.yaml", "sub/bad.yaml", "sub/missing.yaml",
                         "plain.json", "schemas/s.json"}
    assert rows["good.yaml"]["lang"] == "yaml"
    assert rows["plain.json"]["lang"] == "json"
    assert rows["good.yaml"]["content"].startswith("$schema:")


def test_directory_validation_with_lazy_local_schemas(tree, ray_session):
    from yj_schema_validator_ray.pipelines.validate import validate_corpus

    cfg = ValidatorConfig(schema_base_dir=str(tree))
    out = {r["doc_key"]: r for r in validate_corpus(
        corpus_from_directory(str(tree)), cfg).take_all()}
    assert out["good.yaml"]["valid"] is True
    # ../-relative $schema resolved against the FILE's directory
    assert out["sub/bad.yaml"]["valid"] is False
    assert out["sub/bad.yaml"]["violations"][0]["message"] == \
        "integer found, boolean expected"
    # bare relative ref (no ./ prefix) loads from the base dir
    assert out["plain.json"]["valid"] is True
    # missing schema file -> reference's NoSuchFileException message
    assert out["sub/missing.yaml"]["error"] == \
        "NoSuchFileException: sub/nope.json"


def test_cli_input_dir(tree, tmp_path, capsys, ray_session):
    from yj_schema_validator_ray.cli import main

    code = main(["--input-dir", str(tree), "--report-type", "text"])
    out = capsys.readouterr().out
    assert code == 1  # bad.yaml + missing.yaml fail
    assert "good.yaml: ok" in out
    assert "sub/bad.yaml: invalid" in out
