"""Eighth-wave (governance) operator contracts beyond the oracle
harness: packing decode, interval exclusivity/contiguity, gate
monotonicity — properties the row-hash comparison can't state."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_allen_relations_partition_all_pairs():
    # the 13 predicates are a PARTITION of interval-pair space: for a
    # grid of (a1,b1,b2) every pair matches exactly one relation
    a1 = 0
    a2 = a1 + 30
    hits = []
    for b1 in range(-40, 70):
        for w in range(1, 45):
            b2 = b1 + w
            conds = [
                (b1 == a1) & (b2 == a2), b2 < a1, b2 == a1,
                (b1 < a1) & (b2 > a1) & (b2 < a2),
                (b1 == a1) & (b2 < a2), (b1 > a1) & (b2 < a2),
                (b2 == a2) & (b1 > a1), b1 > a2, b1 == a2,
                (b1 > a1) & (b1 < a2) & (b2 > a2),
                (b1 == a1) & (b2 > a2), (b1 < a1) & (b2 > a2),
                (b2 == a2) & (b1 < a1)]
            hits.append(sum(bool(c) for c in conds))
    assert set(hits) == {1}


def test_keep_best_packing_roundtrip():
    from yj_schema_validator_ray.stages.dedup import _PACK

    for prio in (0, 7, 19):
        for doc_id in (0, 123, 1_000_456, _PACK - 1):
            packed = prio * _PACK + (_PACK - 1 - doc_id)
            assert (_PACK - 1) - (packed % _PACK) == doc_id
            assert packed // _PACK == prio
    # higher source trust strictly dominates any doc_id
    assert 1 * _PACK + 0 > 0 * _PACK + (_PACK - 1)


def test_scd2_intervals_are_contiguous_and_exclusive(ray_session):
    from yj_schema_validator_ray.pipelines.governance import customer_scd2

    df = customer_scd2(SF).to_pandas().sort_values(
        ["c_custkey", "valid_from"]).reset_index(drop=True)
    assert (df["valid_from"] <= df["valid_to"]).all()
    for _, g in df.groupby("c_custkey"):
        # exactly one current row; next.valid_from == prev.valid_to + 1
        assert int(g["is_current"].sum()) == 1
        assert bool(g["is_current"].iloc[-1])
        nxt = g["valid_from"].to_numpy()[1:]
        prv = g["valid_to"].to_numpy()[:-1]
        assert (nxt == prv + 1).all()


def test_source_nucleus_gate_bounds(ray_session):
    import ray.data
    from yj_schema_validator_ray.stages.sampling import source_nucleus

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text", "source"])
    df = source_nucleus(docs, pct=90).to_pandas()
    assert len(df) == 20
    # kept mass reaches the threshold but never by more than one doc's
    # worth under it; and dropping docs means kept < total
    assert (df["kept_score"] * 100 >= df["tot_score"] * 90).all()
    assert (df["kept_score"] <= df["tot_score"]).all()
    assert (df["n_kept"] >= 1).all()


def test_incremental_agg_matches_single_scan(ray_session):
    import ray.data
    import pyarrow.compute as pc
    from yj_schema_validator_ray.pipelines.governance import incremental_agg

    merged = incremental_agg(SF).to_pandas().sort_values(
        "event_type").reset_index(drop=True)
    t = pa.concat_tables([pa.table(b) for b in ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_type", "value"]).iter_batches(
            batch_format="pyarrow")])
    cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                         pa.scalar(100.0))), pa.int64())
    full = (pa.table({"event_type": t.column("event_type"),
                      "c": cents})
            .group_by(["event_type"])
            .aggregate([("c", "sum"), ("c", "min"), ("c", "max"),
                        ([], "count_all")])
            .to_pandas().sort_values("event_type")
            .reset_index(drop=True))
    assert (merged["n_events"].to_numpy()
            == full["count_all"].to_numpy()).all()
    assert (merged["sum_cents"].to_numpy() == full["c_sum"].to_numpy()).all()
    assert (merged["min_cents"].to_numpy() == full["c_min"].to_numpy()).all()
    assert (merged["max_cents"].to_numpy() == full["c_max"].to_numpy()).all()


def test_cascade_delete_rule_is_key_pure():
    from yj_schema_validator_ray.pipelines.governance import (
        _hex_threshold, _rule_mask)

    keys = pa.array(list(range(1000)), pa.int64())
    thr = _hex_threshold(0.03)
    a = _rule_mask(keys, thr).to_pylist()
    b = _rule_mask(keys, thr).to_pylist()
    assert a == b
    assert 5 <= sum(a) <= 60  # ~3% of 1000, loose band


def test_wave11_ops_are_repartition_invariant(ray_session):
    import ray.data
    from yj_schema_validator_ray.stages.dedup import (dedup_keep_best,
                                                      dedup_normalized)
    from yj_schema_validator_ray.stages.sampling import source_nucleus

    def docs(cols, nblocks=None):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=cols)
        return ds.repartition(nblocks) if nblocks else ds

    cases = [(dedup_keep_best, ["doc_id", "text", "source"]),
             (dedup_normalized, ["doc_id", "text"]),
             (source_nucleus, ["doc_id", "text", "source"])]
    for fn, cols in cases:
        a = fn(docs(cols)).to_pandas()
        b = fn(docs(cols, 7)).to_pandas()
        a = a.sort_values(list(a.columns)).reset_index(drop=True)
        b = b.sort_values(list(b.columns)).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_like=True,
                                      obj=fn.__name__)
