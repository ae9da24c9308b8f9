"""Schema inference: structural stats + assembled draft 2020-12 schema,
closed the loop by validating the corpus against its own inferred
schema."""

import pandas as pd
import pytest


def test_walk_and_assembly_semantics(ray_session):
    import ray.data

    from yj_schema_validator_ray.functions.infer import (schema_from_stats,
                                                         structure_stats)

    docs = [
        '{"name": "a", "count": 1, "tags": ["x", "y"]}',
        '{"name": "b", "count": 2.5}',
        '{"name": "c", "count": 3, "extra": null}',
    ]
    ds = ray.data.from_pandas(pd.DataFrame({"content": docs}))
    stats = structure_stats(ds).to_pandas()
    rows = stats.to_dict("records")
    by = {(r["path"], r["json_type"]): r["n"] for r in rows}
    assert by[("", "object")] == 3
    assert by[("/properties/name", "string")] == 3
    assert by[("/properties/count", "integer")] == 2
    assert by[("/properties/count", "number")] == 1
    assert by[("/properties/tags", "array")] == 1
    assert by[("/properties/tags/items", "string")] == 2

    sch = schema_from_stats(rows)
    assert sch["type"] == "object"
    props = sch["properties"]
    assert props["name"]["type"] == "string"
    assert props["count"]["type"] == "number"  # integer collapses in
    assert props["tags"] == {"type": "array", "items": {"type": "string"}}
    # name+count in every doc; tags/extra are not
    assert sch["required"] == ["count", "name"]


def test_enum_inference_bounded(ray_session):
    """Small stable domains become enums; high-cardinality paths are
    refused via the per-batch saturation sentinel."""
    import json

    import ray.data

    from yj_schema_validator_ray.functions.infer import (enum_stats,
                                                         schema_from_stats,
                                                         structure_stats)

    docs = [json.dumps({"color": ["red", "green", "blue"][i % 3],
                        "id": f"unique-{i}"}) for i in range(60)]
    ds = ray.data.from_pandas(pd.DataFrame({"content": docs}))
    stats = structure_stats(ds).to_pandas().to_dict("records")
    evals = enum_stats(ds, per_batch_cap=10).to_pandas().to_dict("records")
    sch = schema_from_stats(stats, evals)
    assert sch["properties"]["color"]["enum"] == ["blue", "green", "red"]
    assert "enum" not in sch["properties"]["id"]  # saturated domain


def test_yaml_edge_scalars_and_keys(ray_session):
    """Non-JSON YAML scalars (dates) are typed as strings and block
    enums at their path; nullable enum paths include null; non-string
    mapping keys emit no property constraint."""
    import ray.data

    from yj_schema_validator_ray.functions.infer import (inference_stats,
                                                         schema_from_stats)

    docs = (["status: red\nwhen: 2020-01-01\n1: intkey\n"] * 10
            + ["status: null\nwhen: 2021-12-31\n"] * 6)
    ds = ray.data.from_pandas(pd.DataFrame({"content": docs}))
    structure, enums = inference_stats(ds)
    sch = schema_from_stats(structure.to_pandas().to_dict("records"),
                            enums.to_pandas().to_dict("records"))
    props = sch["properties"]
    assert props["when"]["type"] == "string"  # date -> string, no crash
    assert "enum" not in props["when"]        # un-tallied scalars block it
    assert props["status"]["enum"] == [None, "red"]  # nullable enum
    assert "1" not in props                   # int key skipped
    assert sch["required"] == ["status", "when"]


def test_inference_partial_never_crashes_on_arbitrary_content():
    """Robustness: any string content tallies without an exception
    (YAML parse failures skip; exotic parsed scalars normalize)."""
    import pyarrow as pa
    from hypothesis import given, settings, strategies as st

    from yj_schema_validator_ray.functions.infer import _inference_partial

    @settings(max_examples=150, deadline=None)
    @given(content=st.text(max_size=300))
    def check(content):
        out = _inference_partial(
            pa.table({"content": [content]}), per_batch_cap=4)
        assert set(out.column_names) == {"kind", "path", "json_type",
                                         "value_json", "n"}

    check()


def test_corpus_validates_against_inferred_schema(ray_session):
    """The closed loop: infer over the sf0.001 corpus, compile the
    result, and every parseable file validates against it."""
    from yj_schema_validator_ray.config import ValidatorConfig
    from yj_schema_validator_ray.functions.infer import (schema_from_stats,
                                                         structure_stats)
    from yj_schema_validator_ray.pipelines import validate as V
    from yj_schema_validator_ray.sources.corpus import corpus_dataset

    SF = "/root/testdata/sf0.001"
    stats = structure_stats(corpus_dataset(SF)).to_pandas()
    sch = schema_from_stats(stats.to_dict("records"))
    # the corpus has empty (null) docs alongside the object templates
    assert "object" in sch["type"]
    assert sch["required"] == ["sample"]  # shared by every object doc

    # schema_override: embedded $schema refs would otherwise win the
    # resolution precedence and miss from this one-entry registry
    cfg = ValidatorConfig(schemas={"inferred": sch},
                          default_schema="inferred",
                          schema_override=True)
    s = V.summary(V.validate_corpus(corpus_dataset(SF), cfg))
    # every file that PARSES is valid against its own inferred schema —
    # the only invalids are the corpus's intentional parse errors
    assert s["invalid"] == s["errors"]
    assert s["valid"] == s["files"] - s["errors"]
    assert s["valid"] > 0
