"""Resumable partitioned output with per-partition lineage records.

The ``north_rule`` requires streaming, resumable execution: each output
partition checkpoints a lineage record ``(partition_id,
input_fingerprint, row_count, violation_count)`` so a killed run resumes
without recomputation (the reference has NO checkpointing — rerun is a
full re-validate, ``YamlSchemaValidatorRunner.java:90-98``; this layer is
the engine's scale-generalization per SURVEY.md §4.2/§7.5).

Design (one streaming pipeline, shard-parallel, atomic per shard):
1. A stable shard id ``part = md5(path) % nparts`` is attached per row
   (content-independent, stable across runs/processes).
2. Shards already completed (manifest present AND input fingerprint
   matches) are filtered out BEFORE validation — resume skips them at
   the read.
3. ``groupby(part).map_groups(write_shard)`` writes each shard's verdict
   rows to ``out/part-<p>.parquet`` via temp-file + ``os.replace`` (atomic
   on POSIX), then the manifest — so a kill mid-write never half-counts
   a partition: data file renames first, manifest last.
"""

from __future__ import annotations

import hashlib
import json
import os
from pathlib import Path

import pandas as pd

MANIFEST_DIR = "_lineage"


def _shard_of(paths: pd.Series, nparts: int) -> pd.Series:
    return paths.map(lambda p: int.from_bytes(
        hashlib.md5(p.encode()).digest()[:8], "big") % nparts).astype("int64")


def _fingerprint(shas: pd.Series) -> str:
    h = hashlib.sha256()
    for s in sorted(shas):
        h.update(s.encode())
    return h.hexdigest()


def load_manifests(out_dir: str) -> dict[int, dict]:
    mdir = Path(out_dir) / MANIFEST_DIR
    out = {}
    if mdir.is_dir():
        for f in mdir.glob("part-*.json"):
            try:
                m = json.loads(f.read_text())
                out[int(m["partition_id"])] = m
            except (ValueError, KeyError):
                continue  # corrupt manifest -> recompute that partition
    return out


def current_input_fingerprints(corpus_ds, shard_ids, nparts: int) -> dict[int, str]:
    """Per-shard fingerprint of the CURRENT input for the given shards —
    a sha-only pass (no validation): distinct sha256(content) per shard,
    reduced to the same digest ``write_shard`` records.  Distributed:
    per-batch (part, sha) pairs pre-deduped, one small groupby."""
    import hashlib as _h

    import pyarrow as pa

    wanted = sorted(shard_ids)

    def sha_partial(batch: pa.Table) -> pa.Table:
        paths = pd.Series(batch.column("path").to_pylist())
        parts = _shard_of(paths, nparts)
        mask = parts.isin(wanted).to_numpy()
        kept = batch.filter(pa.array(mask))
        kparts = parts[mask].to_numpy()
        shas = [_h.sha256((c or "").encode("utf-8")).hexdigest()
                for c in kept.column("content").to_pylist()]
        t = pa.table({"part": pa.array(kparts, pa.int64()),
                      "sha": pa.array(shas, pa.string())})
        return t.group_by(["part", "sha"]).aggregate([]).select(["part", "sha"])

    def fp_group(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "part": [int(g["part"].iloc[0])],
            "fingerprint": [_fingerprint(g["sha"].drop_duplicates())],
        })

    res = (corpus_ds.map_batches(sha_partial, batch_format="pyarrow")
           .groupby("part").map_groups(fp_group, batch_format="pandas")
           .to_pandas())
    return dict(zip(res["part"].astype(int), res["fingerprint"]))


def run_resumable_validation(corpus_ds, out_dir: str, config, *,
                             nparts: int = 16, validate_kwargs=None,
                             verify_fingerprints: bool = True):
    """Validate ``corpus_ds`` into ``out_dir`` resumably.

    A shard is skipped only when its manifest is present AND (by default)
    its recorded input fingerprint matches the current input — a changed
    corpus re-validates exactly the changed shards instead of silently
    serving stale outputs.  ``verify_fingerprints=False`` skips the
    sha-only verification pass for corpora known to be immutable.

    Returns a summary DataFrame (partition_id, n_rows, n_violations,
    skipped) covering ALL partitions (completed ones report skipped=True).
    """
    import pyarrow as pa

    from ..pipelines.validate import validate_corpus

    out = Path(out_dir)
    (out / MANIFEST_DIR).mkdir(parents=True, exist_ok=True)
    completed = load_manifests(out_dir)

    def assign(batch: pa.Table) -> pa.Table:
        parts = _shard_of(pd.Series(batch.column("path").to_pylist()), nparts)
        return batch.append_column("part", pa.array(parts.to_numpy(), pa.int64()))

    if completed and verify_fingerprints:
        current = current_input_fingerprints(corpus_ds, completed, nparts)
        stale = {p for p, m in completed.items()
                 if current.get(p) != m.get("input_fingerprint")}
        completed = {p: m for p, m in completed.items() if p not in stale}

    with_part = corpus_ds.map_batches(assign, batch_format="pyarrow")
    todo = with_part.filter(expr=f"part not in {sorted(completed)}") \
        if completed else with_part

    # the validator emits a fixed verdict schema (no passthrough of extra
    # columns); part is a pure function of `path`, so re-derive it after
    verdicts = validate_corpus(todo, config, **(validate_kwargs or {})) \
        .map_batches(assign, batch_format="pyarrow")

    out_str = str(out)

    def write_shard(g: pd.DataFrame) -> pd.DataFrame:
        p = int(g["part"].iloc[0])
        g = g.sort_values(["path", "doc_index"]).reset_index(drop=True)
        data = g.drop(columns=["violations"], errors="ignore")
        tmp = Path(out_str) / f".part-{p}.parquet.tmp"
        final = Path(out_str) / f"part-{p}.parquet"
        data.to_parquet(tmp, index=False)
        os.replace(tmp, final)  # atomic: data visible only when complete

        # flat violations table for the shard (F1 rows; empty shards too,
        # so a resumed reader never distinguishes fresh from resumed)
        if "violations" in g.columns:
            keys = ["repo", "path", "commit", "doc_key"]
            # vectorized explode of the list<struct> column (was iterrows)
            ex = g.loc[g["violations"].map(
                lambda v: v is not None and len(v) > 0), keys + ["violations"]]
            ex = ex.explode("violations", ignore_index=True)
            detail = (pd.DataFrame(ex["violations"].tolist())
                      if len(ex) else pd.DataFrame(columns=[
                          "evaluation_path", "schema_path", "instance_path",
                          "keyword", "message"]))
            vdf = pd.concat([ex[keys], detail], axis=1)
            errs = g.loc[g["error"].notna(), keys + ["error"]].reset_index(drop=True)
            if len(errs):
                edf = errs[keys].copy()
                edf[["evaluation_path", "schema_path", "instance_path"]] = ""
                edf["keyword"] = "error"
                edf["message"] = errs["error"]
                vdf = pd.concat([vdf, edf], ignore_index=True)
            vdf = vdf[["repo", "path", "commit", "doc_key", "evaluation_path",
                       "schema_path", "instance_path", "keyword", "message"]]
            vdf = vdf.astype({c: "object" for c in vdf.columns})
            vtmp = Path(out_str) / f".violations-{p}.parquet.tmp"
            vfinal = Path(out_str) / f"violations-{p}.parquet"
            vdf.to_parquet(vtmp, index=False)
            os.replace(vtmp, vfinal)
        manifest = {
            "partition_id": p,
            "input_fingerprint": _fingerprint(g["content_sha256"].drop_duplicates()),
            "n_rows": int(len(g)),
            "n_violations": int(g["n_violations"].sum()),
        }
        mtmp = Path(out_str) / MANIFEST_DIR / f".part-{p}.json.tmp"
        mfinal = Path(out_str) / MANIFEST_DIR / f"part-{p}.json"
        mtmp.write_text(json.dumps(manifest))
        os.replace(mtmp, mfinal)  # manifest LAST -> never half-counted
        return pd.DataFrame({"partition_id": [p],
                             "n_rows": [manifest["n_rows"]],
                             "n_violations": [manifest["n_violations"]],
                             "skipped": [False]})

    done = verdicts.groupby("part").map_groups(
        write_shard, batch_format="pandas").to_pandas()

    skipped = pd.DataFrame({
        "partition_id": sorted(completed),
        "n_rows": [completed[p]["n_rows"] for p in sorted(completed)],
        "n_violations": [completed[p]["n_violations"] for p in sorted(completed)],
        "skipped": [True] * len(completed),
    })
    return (pd.concat([done, skipped], ignore_index=True)
            .sort_values("partition_id").reset_index(drop=True))


def resume_accounting(corpus_ds, config, nparts: int = 8):
    """Driver-facing end-to-end proof of the resumable layout
    (VERDICT r3 #6): one full resumable validation run, a simulated
    kill (one partition's manifest + data file removed), and a resumed
    run that must skip every intact partition and recompute ONLY the
    lost one.  Output: per-partition verdict accounting over the
    RE-READ partition files — (partition_id, n_rows, n_valid) are
    SQL-exact over the corpus CTE (the shard id is
    ``uint64(md5(path)[:8]) % nparts``, expressible in DuckDB as
    ``CAST('0x' || substr(md5(path),1,16) AS UBIGINT)``) — plus a
    ``resume_ok`` certificate: the resumed output is frame-identical
    to the fresh output AND the skip set was exactly
    {all manifested partitions} - {the killed one}.
    """
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="yjsv_resume_")
    try:
        run_resumable_validation(corpus_ds, out, config, nparts=nparts)

        def read_all():
            parts = sorted(Path(out).glob("part-*.parquet"))
            return (pd.concat([pd.read_parquet(p) for p in parts])
                    .sort_values(["path", "doc_index"])
                    .reset_index(drop=True))

        fresh = read_all()
        manifested = set(load_manifests(out))
        killed = min(manifested)
        (Path(out) / MANIFEST_DIR / f"part-{killed}.json").unlink()
        (Path(out) / f"part-{killed}.parquet").unlink()

        s2 = run_resumable_validation(corpus_ds, out, config,
                                      nparts=nparts)
        resumed = read_all()
        skip_ok = (set(s2.loc[s2["skipped"], "partition_id"])
                   == manifested - {killed})
        frames_ok = fresh.equals(resumed)

        acc = (resumed.groupby("part")
               .agg(n_rows=("valid", "size"), n_valid=("valid", "sum"))
               .reset_index().rename(columns={"part": "partition_id"}))
        return pd.DataFrame({
            "partition_id": acc["partition_id"].astype("int64"),
            "n_rows": acc["n_rows"].astype("int64"),
            "n_valid": acc["n_valid"].astype("int64"),
            "resume_ok": bool(skip_ok and frames_ok),
        })
    finally:
        shutil.rmtree(out, ignore_errors=True)
