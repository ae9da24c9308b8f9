"""Direct (rayless) tests of the SchemaValidator stage class and the
violation explode — the actor class is smoked outside Ray on purpose
(actor __init__ failures surface late inside map_batches)."""

import hashlib

import pyarrow as pa

from yj_schema_validator_ray.config import NO_SCHEMA_MSG, ValidatorConfig
from yj_schema_validator_ray.sources.corpus import (
    BAD_YAML_MSG, DUP_IDS, synthesize_batch, schema_registry)
from yj_schema_validator_ray.stages.validator import SchemaValidator, explode_violations


def corpus_rows(n=30):
    return synthesize_batch(pa.table({"doc_id": pa.array(list(range(n)), pa.int64())}))


def run(n=30):
    return SchemaValidator(ValidatorConfig(schemas=schema_registry()))(corpus_rows(n))


def by_key(table):
    return {r["doc_key"]: r for r in table.to_pylist()}


def test_verdicts_per_template():
    out = by_key(run(10))
    assert out["data/doc-0.json"]["valid"] is True
    assert out["configs/app-1.yaml"]["valid"] is True
    t2 = out["configs/app-2.yaml"]
    assert t2["valid"] is False and t2["n_violations"] == 1
    v = t2["violations"][0]
    assert v["message"] == "integer found, boolean expected"
    assert v["schema_path"] == "urn:example:10#/properties/sample/properties/boolean-sample"
    assert v["instance_path"] == "/sample/boolean-sample"
    # multi-doc explode with path-i keys; middle doc lacks $schema
    assert out["configs/app-3.yaml-1"]["valid"] is True
    assert out["configs/app-3.yaml-2"]["error"] == NO_SCHEMA_MSG
    assert out["configs/app-3.yaml-3"]["valid"] is True
    assert out["configs/app-4.yaml"]["error"] == NO_SCHEMA_MSG      # empty doc
    assert out["configs/app-5.yaml"]["error"] == BAD_YAML_MSG        # parse error
    assert out["configs/app-6.yaml"]["violations"][0]["keyword"] == "enum"
    assert out["configs/app-7.yaml"]["violations"][0]["keyword"] == "required"
    assert out["configs/app-8.yaml"]["violations"][0]["keyword"] == "minimum"
    assert out["configs/app-9.yaml"]["error"] == NO_SCHEMA_MSG       # no $schema


def test_sha256_per_row_invariant():
    corpus = corpus_rows(10)
    contents = dict(zip(corpus.column("path").to_pylist(),
                        corpus.column("content").to_pylist()))
    for key, row in by_key(run(10)).items():
        expected = hashlib.sha256(contents[row["path"]].encode()).hexdigest()
        assert row["content_sha256"] == expected


def test_multidoc_rows_share_file_sha_and_count():
    out = run(10)
    # 10 input files -> 12 logical docs (template 3 explodes to 3)
    assert out.num_rows == 12


def test_duplicate_key_injection():
    # uniqueness is a corpus-level (one row == one file) constraint
    out = corpus_rows(80)
    keys = list(zip(out.column("repo").to_pylist(),
                    out.column("path").to_pylist(),
                    out.column("commit").to_pylist()))
    from collections import Counter
    dups = {k: c for k, c in Counter(keys).items() if c > 1}
    assert len(dups) == len(DUP_IDS)
    assert all(c == 2 for c in dups.values())


def test_explode_violations_shapes():
    flat = explode_violations(run(10))
    rows = flat.to_pylist()
    kw = {(r["doc_key"], r["keyword"]) for r in rows}
    assert ("configs/app-2.yaml", "type") in kw
    assert ("configs/app-3.yaml-2", "error") in kw
    err_rows = [r for r in rows if r["keyword"] == "error"]
    assert all(r["instance_path"] == "" for r in err_rows)


def test_schema_override_and_default():
    reg = schema_registry()
    cfg = ValidatorConfig(schemas=reg, default_schema="schemas/sample-schema.json",
                          schema_override=True)
    batch = pa.table({
        "repo": ["r"], "path": ["p.yaml"], "commit": ["c"], "lang": ["yaml"],
        "content": ["$schema: missing-schema.json\nsample:\n  string-sample: x\n"],
    })
    out = SchemaValidator(cfg)(batch).to_pylist()
    assert out[0]["valid"] is True  # override wins over embedded $schema

    cfg2 = ValidatorConfig(schemas=reg)
    out2 = SchemaValidator(cfg2)(batch).to_pylist()
    assert out2[0]["error"] == "Schema not found: missing-schema.json"


def test_relative_schema_ref_resolution():
    reg = {"configs/s.json": {"type": "object"}}
    batch = pa.table({
        "repo": ["r"], "path": ["configs/app.yaml"], "commit": ["c"],
        "lang": ["yaml"], "content": ["$schema: ./s.json\na: 1\n"],
    })
    out = SchemaValidator(ValidatorConfig(schemas=reg))(batch).to_pylist()
    assert out[0]["valid"] is True


def test_catalog_autodetect_path():
    reg = {"app-config": {"type": "object", "required": ["sample"]}}
    cfg = ValidatorConfig(schemas=reg, auto_detect=True)
    batch = pa.table({
        "repo": ["r"], "path": ["configs/app-1.yaml"], "commit": ["c"],
        "lang": ["yaml"], "content": ["a: 1\n"],
    })
    out = SchemaValidator(cfg)(batch).to_pylist()
    assert out[0]["valid"] is False
    assert out[0]["violations"][0]["keyword"] == "required"


def test_content_cache_equivalence_and_path_dependence():
    """Fork-heavy corpora validate once per distinct content; contents
    with ./-relative $schema stay keyed by parent dir."""
    import pyarrow.compute as pc

    base = corpus_rows(30)
    forks = [base.set_column(1, "path", pc.binary_join_element_wise(
        pa.array([f"fork{r}/"] * base.num_rows), base.column("path"), ""))
        for r in range(5)]
    corpus = pa.concat_tables(forks)
    cfg = ValidatorConfig(schemas=schema_registry())
    cached = SchemaValidator(cfg)(corpus).to_pandas() \
        .sort_values(["path", "doc_index"]).reset_index(drop=True)
    plain = SchemaValidator(cfg, content_cache_size=0)(corpus).to_pandas() \
        .sort_values(["path", "doc_index"]).reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(cached.drop(columns=["violations"]),
                                  plain.drop(columns=["violations"]))

    # relative $schema: same content, different dirs -> different schemas
    reg = {"configs/s.json": {"type": "object", "required": ["a"]},
           "other/s.json": {"type": "object"}}
    v = SchemaValidator(ValidatorConfig(schemas=reg))

    def mk(p):
        return pa.table({"repo": ["r"], "path": [p], "commit": ["c"],
                         "lang": ["yaml"],
                         "content": ["$schema: ./s.json\nb: 1\n"]})

    assert v(mk("configs/app.yaml")).to_pylist()[0]["valid"] is False
    assert v(mk("other/app.yaml")).to_pylist()[0]["valid"] is True


def test_validator_never_crashes_on_arbitrary_content():
    """Robustness: any string content yields exactly >=1 verdict row per
    input row, never an exception (per-row fault isolation)."""
    from hypothesis import given, settings, strategies as st

    v = SchemaValidator(ValidatorConfig(schemas=schema_registry()))

    @settings(max_examples=150, deadline=None)
    @given(content=st.text(max_size=300))
    def check(content):
        batch = pa.table({
            "repo": ["r"], "path": ["f.yaml"], "commit": ["c"],
            "lang": ["yaml"], "content": [content],
        })
        out = v(batch)
        assert out.num_rows >= 1
        row = out.to_pylist()[0]
        assert isinstance(row["valid"], bool)
        assert row["content_sha256"] == hashlib.sha256(
            content.encode("utf-8")).hexdigest()

    check()


def test_autodetect_content_cache_keys_on_full_path():
    """Under catalog autodetect the verdict depends on the FULL path, so
    the content cache keys on (sha, path): identical content at a
    detected path and an undetected path must get DIFFERENT verdicts
    even when validated back-to-back by one cached validator, and
    fork-heavy autodetect corpora must match the uncached validator."""
    import pandas as pd
    import pyarrow.compute as pc

    reg = {"app-config": {"type": "object", "required": ["sample"]}}
    cfg = ValidatorConfig(schemas=reg, auto_detect=True)
    v = SchemaValidator(cfg)

    def mk(p):
        return pa.table({"repo": ["r"], "path": [p], "commit": ["c"],
                         "lang": ["yaml"], "content": ["a: 1\n"]})

    hit = v(mk("configs/app-1.yaml")).to_pylist()[0]
    assert hit["valid"] is False  # detected -> required 'sample' missing
    miss = v(mk("lib/readme.yaml")).to_pylist()[0]
    assert miss["valid"] is False and "No schema" in (miss["error"] or "")
    # same content BACK at the detected path: must still be the catalog
    # verdict (a (sha, None) key would have leaked the readme verdict)
    again = v(mk("configs/app-1.yaml")).to_pylist()[0]
    assert again["violations"] == hit["violations"]
    assert again["error"] is None if hit["error"] is None else True

    # fork-heavy equivalence: cached == uncached frame-for-frame
    base = corpus_rows(20)
    forks = [base.set_column(1, "path", pc.binary_join_element_wise(
        pa.array([f"fork{r}/"] * base.num_rows), base.column("path"), ""))
        for r in range(4)]
    corpus = pa.concat_tables(forks)
    cfg2 = ValidatorConfig(schemas=schema_registry(), auto_detect=True)
    cached = SchemaValidator(cfg2)(corpus).to_pandas() \
        .sort_values(["path", "doc_index"]).reset_index(drop=True)
    plain = SchemaValidator(cfg2, content_cache_size=0)(corpus).to_pandas() \
        .sort_values(["path", "doc_index"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(cached.drop(columns=["violations"]),
                                  plain.drop(columns=["violations"]))
