"""Resume semantics: a second run skips fingerprint-matched partitions
and recomputes only missing ones, producing identical output (SURVEY.md
§5 test layer d)."""

import json
from pathlib import Path

import pandas as pd
import pyarrow as pa
import pytest

from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.sources.corpus import schema_registry
from yj_schema_validator_ray.state.lineage import (
    MANIFEST_DIR, load_manifests, run_resumable_validation)


@pytest.fixture()
def corpus_ds(ray_session):
    import ray.data

    from yj_schema_validator_ray.sources.corpus import synthesize_batch

    docs = pa.table({"doc_id": pa.array(list(range(100)), pa.int64())})
    return ray.data.from_arrow(docs).map_batches(
        synthesize_batch, batch_format="pyarrow")


def read_all(out_dir):
    parts = sorted(Path(out_dir).glob("part-*.parquet"))
    return (pd.concat([pd.read_parquet(p) for p in parts])
            .sort_values(["path", "doc_index"]).reset_index(drop=True))


def test_resume_skips_completed_partitions(corpus_ds, tmp_path):
    cfg = ValidatorConfig(schemas=schema_registry())
    out = str(tmp_path / "out")

    s1 = run_resumable_validation(corpus_ds, out, cfg, nparts=4)
    assert len(s1) == 4 and not s1["skipped"].any()
    first = read_all(out)
    manifests = load_manifests(out)
    assert set(manifests) == {0, 1, 2, 3}

    # simulate a killed run: partition 2's manifest + data vanish
    (Path(out) / MANIFEST_DIR / "part-2.json").unlink()
    (Path(out) / "part-2.parquet").unlink()

    s2 = run_resumable_validation(corpus_ds, out, cfg, nparts=4)
    assert set(s2.loc[s2["skipped"], "partition_id"]) == {0, 1, 3}
    assert set(s2.loc[~s2["skipped"], "partition_id"]) == {2}

    second = read_all(out)
    pd.testing.assert_frame_equal(first, second)

    # lineage records carry fingerprint + counts
    m = load_manifests(out)[2]
    assert set(m) == {"partition_id", "input_fingerprint", "n_rows", "n_violations"}
    assert m["n_rows"] > 0


def test_fully_complete_run_recomputes_nothing(corpus_ds, tmp_path):
    cfg = ValidatorConfig(schemas=schema_registry())
    out = str(tmp_path / "out")
    run_resumable_validation(corpus_ds, out, cfg, nparts=3)
    s = run_resumable_validation(corpus_ds, out, cfg, nparts=3)
    assert s["skipped"].all()


def test_corrupt_manifest_triggers_recompute(corpus_ds, tmp_path):
    cfg = ValidatorConfig(schemas=schema_registry())
    out = str(tmp_path / "out")
    run_resumable_validation(corpus_ds, out, cfg, nparts=2)
    (Path(tmp_path / "out") / MANIFEST_DIR / "part-1.json").write_text("{broken")
    s = run_resumable_validation(corpus_ds, out, cfg, nparts=2)
    assert set(s.loc[~s["skipped"], "partition_id"]) == {1}


def test_changed_input_revalidates_only_changed_shards(ray_session, tmp_path):
    """--resume must not serve stale shard outputs: a shard whose input
    fingerprint changed is re-validated; untouched shards stay skipped."""
    import ray.data

    from yj_schema_validator_ray.sources.corpus import synthesize_batch

    def base():
        docs = pa.table({"doc_id": pa.array(list(range(100)), pa.int64())})
        return ray.data.from_arrow(docs).map_batches(
            synthesize_batch, batch_format="pyarrow")

    target = base().take(1)[0]["path"]  # one fixed path -> one shard changes

    def corpus(mutate: bool):
        ds = base()
        if not mutate:
            return ds

        def tweak(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            mask = pc.equal(t.column("path"), target)
            new_content = pc.if_else(
                mask, pa.scalar("not: [valid, yaml"), t.column("content"))
            return t.set_column(t.schema.get_field_index("content"),
                                "content", new_content)

        return ds.map_batches(tweak, batch_format="pyarrow")

    cfg = ValidatorConfig(schemas=schema_registry())
    out = str(tmp_path / "out")
    run_resumable_validation(corpus(False), out, cfg, nparts=4)

    s2 = run_resumable_validation(corpus(True), out, cfg, nparts=4)
    redone = set(s2.loc[~s2["skipped"], "partition_id"])
    assert len(redone) >= 1          # the mutated shard(s) re-ran
    assert len(redone) < 4           # untouched shards stayed skipped
    # the re-validated output reflects the NEW content (parse error rows)
    df = read_all(out)
    assert (df["error"].notna() & df["error"].str.contains("Parse", na=False)).any() or \
        (~df["valid"]).any()

    # and a third run with the same mutated input skips everything
    s3 = run_resumable_validation(corpus(True), out, cfg, nparts=4)
    assert s3["skipped"].all()
