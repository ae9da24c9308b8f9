"""Deterministic sampling operators for training-data pipelines.

Sampling at corpus scale must be (a) a pure per-row function — no global
state, no RNG sequencing, so any worker can decide any row and reruns /
resumes pick the same rows — and (b) stable under repartitioning.  Both
operators key on ``md5(doc_id)``: the first 8 hex chars compared against
a rate threshold (hex strings compare like the numbers they encode), so
the DuckDB oracle can mirror the decision byte-for-byte.

- :func:`hash_sample` — uniform rate sample.
- :func:`mixture_sample` — per-source rates (the "training mix"): each
  source is independently downsampled to its target weight.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _hex_threshold(rate: float) -> str:
    rate = min(max(rate, 0.0), 1.0)
    v = int(rate * 16**8)
    if v >= 16**8:
        return "g"  # > every hex digit -> keeps all rows (rate 1.0)
    return format(v, "08x")


def _hex8(doc_ids) -> list[str]:
    return [hashlib.md5(str(i).encode()).hexdigest()[:8] for i in doc_ids]


def hash_sample(docs_ds, rate: float, id_col: str = "doc_id"):
    """Deterministic uniform sample: keep rows with
    ``md5(id)[:8] < hex(rate * 16^8)``."""
    thr = _hex_threshold(rate)

    def f(batch: pa.Table) -> pa.Table:
        hx = _hex8(batch.column(id_col).to_pylist())
        return batch.filter(pa.array([h < thr for h in hx], pa.bool_()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def hash_sample_sql(rate: float, table: str = "documents",
                    id_col: str = "doc_id", columns: str = "doc_id") -> str:
    thr = _hex_threshold(rate)
    return (f"SELECT {columns} FROM {table} "
            f"WHERE substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) < '{thr}'")


def mixture_sample(docs_ds, rates: dict[str, float],
                   id_col: str = "doc_id", source_col: str = "source"):
    """Training-mix sampling: per-source keep rates (sources absent from
    ``rates`` are dropped).  Pure per-row decision — reproducible across
    reruns, resumes, and repartitioning."""
    thr = {s: _hex_threshold(r) for s, r in rates.items()}

    def f(batch: pa.Table) -> pa.Table:
        hx = _hex8(batch.column(id_col).to_pylist())
        src = batch.column(source_col).to_pylist()
        keep = [h < thr.get(s, "00000000") for h, s in zip(hx, src)]
        return batch.filter(pa.array(keep, pa.bool_()))

    return docs_ds.map_batches(f, batch_format="pyarrow")


def mixture_sample_sql(rates: dict[str, float], table: str = "documents",
                       id_col: str = "doc_id", source_col: str = "source",
                       columns: str = "doc_id, source") -> str:
    whens = " ".join(
        f"WHEN '{s}' THEN '{_hex_threshold(r)}'" for s, r in sorted(rates.items()))
    return (f"SELECT {columns} FROM {table} "
            f"WHERE substr(md5(CAST({id_col} AS VARCHAR)), 1, 8) "
            f"< (CASE {source_col} {whens} ELSE '00000000' END)")
