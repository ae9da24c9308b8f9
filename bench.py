"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) at $RAY_GRAFT_CPUS CPUs (default 32).

Prints ONE JSON line:
  {"metric": ..., "value": <headline sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ..., "num_cpus": N,
   "files_validated": N, "files_per_sec": N}

--scaling: runs the same bench twice in FRESH processes at 8 and 32 CPUs
on the same input and reports both throughputs + scaling efficiency
(the sandbox evidence for the two-cluster-size criterion; BASELINE.md).

The documents table is small (5k rows at sf0.1), so the validation
headline replicates the deterministic corpus generator over
REPLICATE x N doc ids — same per-row work, corpus-scale row counts.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("GRAFT_REPLICATE", "100"))


def corpus_n(n_rows: int, num_blocks: int):
    """Deterministic corpus over doc_ids 0..n_rows-1 (same generator as
    the sf tables' corpus, corpus-scale row count)."""
    import pyarrow as pa
    import ray.data

    from yj_schema_validator_ray.sources.corpus import synthesize_batch

    ds = ray.data.range(n_rows, override_num_blocks=num_blocks)

    def to_doc_id(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t.column("id")})

    return ds.map_batches(to_doc_id, batch_format="pyarrow") \
             .map_batches(synthesize_batch, batch_format="pyarrow")


def run_bench() -> dict:
    import ray

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    import pyarrow.parquet as pq

    from yj_schema_validator_ray.config import ValidatorConfig
    from yj_schema_validator_ray.pipelines import constraints as C
    from yj_schema_validator_ray.pipelines import relational as R
    from yj_schema_validator_ray.pipelines import validate as V
    from yj_schema_validator_ray.sources.corpus import corpus_dataset, schema_registry
    from yj_schema_validator_ray.stages import ann as A
    from yj_schema_validator_ray.stages import dedup as D

    n_docs = pq.read_metadata(f"{SF_DIR}/documents.parquet").num_rows
    n_files = n_docs * REPLICATE
    cfg = ValidatorConfig(schemas=schema_registry())

    timings: dict[str, float] = {}

    # warm the page cache (untimed) so we measure compute, not first read
    corpus_dataset(SF_DIR).count()

    # -- headline: validate n_files docs end-to-end (verdict consume) ----
    t0 = time.perf_counter()
    corpus = corpus_n(n_files, num_blocks=max(NUM_CPUS * 4, 32))
    verdicts = V.validate_corpus(corpus, cfg, batch_size=4096)
    summary = V.summary(verdicts)
    timings["validate"] = time.perf_counter() - t0
    assert summary["files"] >= n_files

    # -- constraints over a corpus-scale synthesized corpus --------------
    t0 = time.perf_counter()
    corpus = corpus_n(n_files, num_blocks=max(NUM_CPUS * 4, 32))
    n_dup = C.uniqueness_violations(corpus).count()
    timings["uniqueness"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    corpus = corpus_n(n_files, num_blocks=max(NUM_CPUS * 4, 32))
    C.ref_integrity_violations(corpus).count()
    timings["ref_integrity"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    corpus = corpus_n(n_files, num_blocks=max(NUM_CPUS * 4, 32))
    C.lang_histogram(corpus).count()
    timings["lang_histogram"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    corpus = corpus_n(n_files, num_blocks=max(NUM_CPUS * 4, 32))
    C.column_stats(corpus)
    timings["column_stats"] = time.perf_counter() - t0

    # -- sf-table pipelines ---------------------------------------------
    def docs_ds():
        import ray.data

        return ray.data.read_parquet(f"{SF_DIR}/documents.parquet",
                                     columns=["doc_id", "text"])

    t0 = time.perf_counter()
    D.minhash_lsh_pairs(docs_ds()).count()
    timings["dedup_minhash"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    import numpy as np
    import pyarrow.parquet as pq2

    et = pq2.read_table(f"{SF_DIR}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    qv = {int(v): np.asarray(e, dtype=np.float64)
          for v, e in zip(et.column("vec_id").to_pylist()[:5],
                          et.column("embedding").to_pylist()[:5])}
    import ray.data

    emb = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    A.ann_topk_bruteforce(emb, qv).count()
    timings["ann_topk"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    R.q1_pricing_summary(SF_DIR).count()
    timings["q1"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    R.events_tumbling_window(SF_DIR).count()
    timings["events_window"] = time.perf_counter() - t0

    headline = timings["validate"]
    result = {
        "metric": ("validated files/sec end-to-end (rows validated + "
                   "constraints aggregated) on the synthesized source-code "
                   "corpus"),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in timings.items()},
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "num_cpus": NUM_CPUS,
        "files_validated": n_files,
        "files_per_sec": round(n_files / headline, 1),
        "uniqueness_dup_groups": n_dup,
    }
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Same job at 8 and 32 CPUs in fresh processes on identical input."""
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    t_lo, t_hi = r_lo["queries"]["validate"], r_hi["queries"]["validate"]
    thr_lo = r_lo["files_validated"] / t_lo
    thr_hi = r_hi["files_validated"] / t_hi
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency = throughput(32)/(4 x throughput(8))",
        "cpus": [lo, hi],
        "sec_8": round(t_lo, 3), "sec_32": round(t_hi, 3),
        "files_per_sec_8": round(thr_lo, 1),
        "files_per_sec_32": round(thr_hi, 1),
        "scaling_efficiency": round(eff, 3),
        "full_8": r_lo, "full_32": r_hi,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
