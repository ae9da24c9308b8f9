"""End-to-end CLI tests (reference entry-point parity: report routing,
report file, exit code 0/1)."""

import json
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yj_schema_validator_ray.sources.corpus import MINI_SCHEMA, synthesize_batch


@pytest.fixture()
def corpus_parquet(tmp_path):
    docs = pa.table({"doc_id": pa.array(list(range(20)), pa.int64())})
    t = synthesize_batch(docs)
    p = tmp_path / "corpus.parquet"
    pq.write_table(t, p)
    return str(p)


@pytest.fixture()
def schema_file(tmp_path):
    # the CLI registers the schema under ITS OWN path; documents embed
    # "schemas/sample-schema.json", so write it there
    d = tmp_path / "schemas"
    d.mkdir()
    p = d / "sample-schema.json"
    p.write_text(json.dumps(MINI_SCHEMA))
    return str(p)


def run_cli(args, ray_session):
    from yj_schema_validator_ray.cli import main

    return main(args)


def test_cli_text_report_and_exit_code(corpus_parquet, schema_file,
                                       tmp_path, capsys, ray_session, monkeypatch):
    monkeypatch.chdir(tmp_path)  # so embedded 'schemas/sample-schema.json' resolves
    code = run_cli(["--input", corpus_parquet,
                    "--schema", "schemas/sample-schema.json"], ray_session)
    out = capsys.readouterr().out
    assert out.startswith("Validation Result: invalid")
    assert code == 1


def test_cli_report_file_llm_compact(corpus_parquet, schema_file,
                                     tmp_path, ray_session, monkeypatch):
    monkeypatch.chdir(tmp_path)
    report = tmp_path / "r.txt"
    code = run_cli(["--input", corpus_parquet,
                    "--schema", "schemas/sample-schema.json",
                    "--report-type", "llm", "--compact",
                    "--report-file-name", str(report)], ray_session)
    assert code == 1
    text = report.read_text()
    assert text.startswith("#")
    assert "[error]" in text or "[type]" in text


def test_cli_valid_only_corpus_exits_zero(tmp_path, schema_file,
                                          capsys, ray_session, monkeypatch):
    monkeypatch.chdir(tmp_path)
    docs = pa.table({"doc_id": pa.array([0, 1, 10, 11], pa.int64())})
    p = tmp_path / "ok.parquet"
    pq.write_table(synthesize_batch(docs), p)
    code = run_cli(["--input", str(p),
                    "--schema", "schemas/sample-schema.json"], ray_session)
    assert code == 0
    assert capsys.readouterr().out.startswith("Validation Result: ok")


def test_cli_positional_files_reference_style(tmp_path, schema_file,
                                              capsys, ray_session, monkeypatch):
    monkeypatch.chdir(tmp_path)
    good = tmp_path / "good.yaml"
    good.write_text("$schema: schemas/sample-schema.json\n"
                    "sample:\n  string-sample: hello\n")
    bad = tmp_path / "bad.yaml"
    bad.write_text("$schema: schemas/sample-schema.json\n"
                   "sample:\n  string-sample: x\n  boolean-sample: 123\n")
    code = run_cli([str(good), str(bad),
                    "--schema", "schemas/sample-schema.json"], ray_session)
    out = capsys.readouterr().out
    assert code == 1
    assert f"{good}: ok" in out
    assert f"{bad}: invalid" in out
    assert "integer found, boolean expected" in out


def test_cli_missing_file_error_result(tmp_path, schema_file,
                                       capsys, ray_session, monkeypatch):
    monkeypatch.chdir(tmp_path)
    code = run_cli(["nope.yaml", "--schema", "schemas/sample-schema.json"],
                   ray_session)
    out = capsys.readouterr().out
    assert code == 1
    assert "NoSuchFileException: nope.yaml" in out


def test_cli_schema_override_requires_schema(corpus_parquet, ray_session):
    # reference rejects the combination at startup
    # (YamlSchemaValidatorRunner.java:152-157)
    with pytest.raises(SystemExit):
        run_cli(["--input", corpus_parquet, "--schema-override"], ray_session)


def test_cli_out_report_keeps_details(corpus_parquet, schema_file,
                                      tmp_path, capsys, ray_session,
                                      monkeypatch):
    # with --out, the rendered report must still carry keyword-violation
    # details (it used to be rebuilt from the written parquet with
    # details=[]), and the verdict/violation tables must land on disk
    monkeypatch.chdir(tmp_path)
    out_dir = tmp_path / "tables"
    code = run_cli(["--input", corpus_parquet,
                    "--schema", "schemas/sample-schema.json",
                    "--out", str(out_dir)], ray_session)
    out = capsys.readouterr().out
    assert code == 1
    assert "integer found, boolean expected" in out  # detail line present
    assert list(out_dir.glob("verdicts/*.parquet"))
    assert list(out_dir.glob("violations/*.parquet"))


def test_cli_infer_schema(corpus_parquet, tmp_path, ray_session):
    out = tmp_path / "inferred.json"
    code = run_cli(["--input", corpus_parquet,
                    "--infer-schema", str(out)], ray_session)
    assert code == 0
    sch = json.loads(out.read_text())
    assert sch["$schema"].endswith("2020-12/schema")
    assert "object" in sch["type"]
    assert "sample" in sch["properties"]


def test_help_surface_covers_reference_flags(capsys):
    """--help parity sweep (YamlSchemaValidatorRunner.java:128-145):
    every reference option has its analogue in the help text, and the
    reference's stdin note is reproduced."""
    import pytest

    from yj_schema_validator_ray.cli import build_parser

    with pytest.raises(SystemExit) as e:
        build_parser().parse_args(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    for flag in ["--help", "--schema", "--schema-override",
                 "--report-type", "--report-file-name", "--http-timeout",
                 "--ignore-ssl-errors", "--color"]:
        assert flag in out, flag
    assert "reads from stdin" in out
    for rt in ["text", "json", "yaml", "junit", "sarif"]:
        assert rt in out, rt
