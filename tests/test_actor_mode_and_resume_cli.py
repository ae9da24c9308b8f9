"""Actor-pool validator mode, CLI --resume end-to-end, exact_agg null
keys, new format validators."""

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.functions.compiler import compile_schema
from yj_schema_validator_ray.sources.corpus import (
    MINI_SCHEMA, schema_registry, synthesize_batch)


def test_actor_mode_equals_task_mode(ray_session):
    import ray.data

    from yj_schema_validator_ray.pipelines.validate import validate_corpus

    docs = pa.table({"doc_id": pa.array(list(range(50)), pa.int64())})
    corpus = ray.data.from_arrow(docs).map_batches(
        synthesize_batch, batch_format="pyarrow")
    cfg = ValidatorConfig(schemas=schema_registry())
    tasks = (validate_corpus(corpus, cfg).to_pandas()
             .sort_values(["doc_key"]).reset_index(drop=True))
    actors = (validate_corpus(corpus, cfg, use_actors=True,
                              concurrency=2).to_pandas()
              .sort_values(["doc_key"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(tasks.drop(columns=["violations"]),
                                  actors.drop(columns=["violations"]))


def test_cli_resume_end_to_end(tmp_path, ray_session, monkeypatch, capsys):
    from yj_schema_validator_ray.cli import main

    monkeypatch.chdir(tmp_path)
    (tmp_path / "schemas").mkdir()
    (tmp_path / "schemas" / "sample-schema.json").write_text(
        json.dumps(MINI_SCHEMA))
    docs = pa.table({"doc_id": pa.array(list(range(40)), pa.int64())})
    pq.write_table(synthesize_batch(docs), tmp_path / "corpus.parquet")

    out = tmp_path / "out"
    code = main(["--input", str(tmp_path / "corpus.parquet"),
                 "--schema", "schemas/sample-schema.json",
                 "--resume", "--out", str(out), "--nparts", "3"])
    assert code == 1  # corpus contains invalid templates
    assert len(list(out.glob("part-*.parquet"))) == 3
    assert len(list(out.glob("violations-*.parquet"))) == 3
    capsys.readouterr()

    # second run: everything skipped
    code2 = main(["--input", str(tmp_path / "corpus.parquet"),
                  "--schema", "schemas/sample-schema.json",
                  "--resume", "--out", str(out), "--nparts", "3"])
    text = capsys.readouterr().out
    assert code2 == 1
    assert text.count("True") == 3  # skipped column


def test_exact_agg_null_keys(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.exact_agg import grouped_aggregate

    df = pd.DataFrame({"k": ["a", None, "a", None, "b"],
                       "v": [1, 2, 3, 4, 5]})
    got = grouped_aggregate(ray.data.from_pandas(df), ["k"],
                            [("v", "sum", "v_sum")]).to_pandas()
    got = got.sort_values("k", na_position="last").reset_index(drop=True)
    assert got.loc[got["k"] == "a", "v_sum"].iloc[0] == 4
    assert got.loc[got["k"] == "b", "v_sum"].iloc[0] == 5
    assert got.loc[got["k"].isna(), "v_sum"].iloc[0] == 6


@pytest.mark.parametrize("fmt,good,bad", [
    ("duration", "P1DT2H", "P"),
    ("duration", "PT5.5S", "1D"),
    ("json-pointer", "/a/b~1c", "a/b"),
    ("relative-json-pointer", "1/a", "/a"),
    ("iri", "https://ex.amplé.org/p", "not a scheme"),
    ("idn-email", "uéser@example.org", "no-at-sign"),
    ("idn-hostname", "bücher.example", "has space.example"),
    ("uri-template", "http://ex.org/{id}/x{?q,lang*}", "http://ex.org/{un}closed{"),
])
def test_extra_formats(fmt, good, bad):
    schema = {"type": "string", "format": fmt}
    assert compile_schema(schema).validate(good) == []
    out = compile_schema(schema).validate(bad)
    assert out and out[0].keyword == "format"
