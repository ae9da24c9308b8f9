"""Flagship pipeline: corpus -> validator actor pool -> verdicts/violations.

Dataset-first layout (SURVEY.md §3.4): one streaming pass over the corpus
produces the verdicts table with violations as a nested ``list<struct>``
column; the flat violations table is a second, cheap vectorized explode —
no re-validation, no driver materialization.
"""

from __future__ import annotations

from ..config import ValidatorConfig
from ..stages.validator import SchemaValidator, explode_violations


def validate_corpus(corpus_ds, config: ValidatorConfig, *,
                    concurrency=None, batch_size: int = 2048,
                    num_cpus: float = 1, use_actors: bool = False,
                    content_cache_size: int = 65536):
    """corpus Dataset -> verdicts Dataset (violations nested per doc).

    Compiled-schema amortization (the reference's ``schemaCache``,
    ``YamlSchemaValidator.java:65,184-202``) comes in two flavors:

    - default: stateless TASKS + per-worker-process compile cache
      (``make_validator_fn``) — elastic, zero pool spin-up, compiles
      once per worker process;
    - ``use_actors=True``: a ``SchemaValidator`` actor pool — for
      genuinely heavy per-actor state (model loads, remote schema
      fetches a la ``fetchSchemaFromUrl``) where a dedicated pool with
      ``__init__``-time setup is worth its ~5 s ramp.
    """
    from ..stages.validator import make_validator_fn

    if not use_actors:
        return corpus_ds.map_batches(
            make_validator_fn(config,
                              content_cache_size=content_cache_size),
            batch_format="pyarrow",
            batch_size=batch_size, num_cpus=num_cpus,
            zero_copy_batch=True)
    if concurrency is None:
        # autoscaling pool that leaves CPUs for the read / downstream
        # stages so the pipeline neither serializes nor deadlocks
        from ..util import default_pool

        concurrency = default_pool(max_fraction=0.75)
    return corpus_ds.map_batches(
        SchemaValidator,
        fn_constructor_args=(config,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def verdicts_table(verdicts_ds):
    """Verdicts without the nested violations payload (cheap projection)."""
    return verdicts_ds.drop_columns(["violations"])


def violations_table(verdicts_ds):
    """Flat violation rows: (repo, path, commit, doc_key, evaluation_path,
    schema_path, instance_path, keyword, message).  File-level errors are
    rows with keyword='error' and empty paths (FilesOutputToLlm.java:112-144)."""
    return verdicts_ds.map_batches(explode_violations, batch_format="pyarrow",
                                   zero_copy_batch=True)


def summary(verdicts_ds):
    """Global run summary (A1/A2: FilesOutput.java:47-50,
    FilesOutputToLlm.java:40-68): files / valid / invalid / total errors.
    Decomposes as per-block partials + a tiny final combine."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column("valid")
        nv = batch.column("n_violations")
        return pa.table({
            "files": pa.array([batch.num_rows], pa.int64()),
            "valid_files": pa.array([pc.sum(pc.cast(v, pa.int64())).as_py() or 0], pa.int64()),
            "errors": pa.array([pc.sum(nv).as_py() or 0], pa.int64()),
        })

    parts = verdicts_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    files = int(parts["files"].sum())
    valid_files = int(parts["valid_files"].sum())
    errors = int(parts["errors"].sum())
    return {
        "files": files,
        "valid": valid_files,
        "invalid": files - valid_files,
        "errors": errors,
        "all_valid": files == valid_files,   # global AND (FilesOutput.java:49)
    }
