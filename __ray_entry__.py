"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash →
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from yj_schema_validator_ray import oracles
from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.pipelines import constraints as C
from yj_schema_validator_ray.pipelines import validate as V
from yj_schema_validator_ray.sources.corpus import corpus_dataset, schema_registry


def _config() -> ValidatorConfig:
    return ValidatorConfig(schemas=schema_registry())


def _validated(sf_dir: str):
    return V.validate_corpus(corpus_dataset(sf_dir), _config())


# ---------------------------------------------------------------------------


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: synthesize corpus ->
    validator actor pool -> verdicts table (violations nested column dropped)."""
    return V.verdicts_table(_validated("/root/testdata/sf0.001"))


def queries() -> dict[str, Callable[[str], Any]]:
    import pandas as pd

    def q_verdicts(sf_dir):
        return V.verdicts_table(_validated(sf_dir))

    def q_violations(sf_dir):
        return V.violations_table(_validated(sf_dir))

    def q_summary(sf_dir):
        s = V.summary(_validated(sf_dir))
        return pd.DataFrame({"files": [s["files"]], "valid": [s["valid"]],
                             "invalid": [s["invalid"]], "errors": [s["errors"]]})

    def q_uniqueness(sf_dir):
        return C.uniqueness_violations(corpus_dataset(sf_dir))

    def q_ref_integrity(sf_dir):
        return C.ref_integrity_violations(corpus_dataset(sf_dir))

    def q_column_stats(sf_dir):
        return C.column_stats(corpus_dataset(sf_dir))

    def q_lang_histogram(sf_dir):
        return C.lang_histogram(corpus_dataset(sf_dir))

    def q_content_length_histogram(sf_dir):
        return C.content_length_histogram(corpus_dataset(sf_dir))

    def q_lang_drift(sf_dir):
        return C.lang_drift(corpus_dataset(sf_dir))

    def q_distinct_sketch(sf_dir):
        # HLL estimates — approximate by design, rows-only check
        return C.distinct_sketch(corpus_dataset(sf_dir))

    def q_repo_stats_salted(sf_dir):
        return C.repo_stats_salted(corpus_dataset(sf_dir))

    return {
        "verdicts": q_verdicts,
        "violations": q_violations,
        "summary": q_summary,
        "uniqueness": q_uniqueness,
        "ref_integrity": q_ref_integrity,
        "column_stats": q_column_stats,
        "lang_histogram": q_lang_histogram,
        "content_length_histogram": q_content_length_histogram,
        "lang_drift": q_lang_drift,
        "distinct_sketch": q_distinct_sketch,
        "repo_stats_salted": q_repo_stats_salted,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "verdicts": oracles.verdicts_sql(),
        "violations": oracles.violations_sql(),
        "summary": oracles.summary_sql(),
        "uniqueness": oracles.uniqueness_sql(),
        "ref_integrity": oracles.ref_integrity_sql(),
        "column_stats": oracles.column_stats_sql(),
        "lang_histogram": oracles.lang_histogram_sql(),
        "content_length_histogram": oracles.content_length_histogram_sql(),
        "lang_drift": oracles.lang_drift_sql(),
        "repo_stats_salted": oracles.repo_stats_salted_sql(),
        # distinct_sketch: approximate (HLL) — intentionally no SQL oracle
    }
