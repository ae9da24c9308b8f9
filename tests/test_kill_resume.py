"""SURVEY §5(d): kill a resumable run mid-flight, restart, assert the
completed partitions are skipped and the final output is identical to an
uninterrupted run."""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import pandas as pd
import pytest

SCRIPT = """
import ray, sys
ray.init(address="local", num_cpus=4, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import pyarrow as pa
import ray.data
sys.path.insert(0, {repo!r})
from yj_schema_validator_ray.config import ValidatorConfig
from yj_schema_validator_ray.sources.corpus import synthesize_batch, schema_registry
from yj_schema_validator_ray.state.lineage import run_resumable_validation

docs = pa.table({{"doc_id": pa.array(list(range(300)), pa.int64())}})
corpus = ray.data.from_arrow(docs).map_batches(synthesize_batch,
                                               batch_format="pyarrow")
cfg = ValidatorConfig(schemas=schema_registry())
s = run_resumable_validation(corpus, {out!r}, cfg, nparts=6)
print("DONE", len(s), int(s["skipped"].sum()))
ray.shutdown()
"""


def run_job(out_dir, kill_after_manifests=None, timeout=180):
    code = SCRIPT.format(repo="/root/repo", out=str(out_dir))
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                            text=True)
    mdir = Path(out_dir) / "_lineage"
    if kill_after_manifests is not None:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if mdir.is_dir() and \
                    len(list(mdir.glob("part-*.json"))) >= kill_after_manifests:
                proc.send_signal(signal.SIGKILL)
                proc.wait()
                # reap any stray ray workers from the killed session
                subprocess.run(["pkill", "-9", "-f",
                                "session_.*default_worker"], check=False)
                return None
            if proc.poll() is not None:
                break  # finished before we could kill it — fine
            time.sleep(0.05)
    out, _ = proc.communicate(timeout=timeout)
    return out


# Spawns its own Ray sessions in subprocesses — must NOT run while the
# suite's session-scoped cluster is up (concurrent local clusters hang).
# Run standalone: RUN_KILL_RESUME=1 python -m pytest tests/test_kill_resume.py
@pytest.mark.skipif(not os.environ.get("RUN_KILL_RESUME"),
                    reason="standalone only: spawns its own Ray sessions")
def test_kill_and_resume(tmp_path):
    out = tmp_path / "out"

    # run 1: killed once at least one partition has committed
    run_job(out, kill_after_manifests=1)
    committed = len(list((out / "_lineage").glob("part-*.json")))
    assert committed >= 1

    # run 2: fresh process resumes; completed partitions are skipped
    text = run_job(out)
    assert text is not None and "DONE 6" in text
    skipped = int(text.split()[-1])
    assert skipped >= committed  # nothing committed was recomputed

    resumed = pd.concat([pd.read_parquet(p)
                         for p in sorted(out.glob("part-*.parquet"))])

    # reference: uninterrupted run in a clean dir
    ref_out = tmp_path / "ref"
    run_job(ref_out)
    reference = pd.concat([pd.read_parquet(p)
                           for p in sorted(ref_out.glob("part-*.parquet"))])

    a = resumed.sort_values(["path", "doc_index"]).reset_index(drop=True)
    b = reference.sort_values(["path", "doc_index"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
