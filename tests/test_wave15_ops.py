"""Wave-15 operator properties (oracle equality itself is covered by
the parametrized mini driver-harness in test_correctness_oracle.py)."""

import pytest

SF = "/root/testdata/sf0.001"


def test_greedy_coverage_invariants(ray_session):
    from yj_schema_validator_ray.pipelines.selection import greedy_coverage

    t = greedy_coverage(SF, k=4).to_pandas()
    assert list(t["round"]) == [1, 2, 3, 4]
    # submodularity: marginal gains never increase round-over-round
    assert all(a >= b for a, b in zip(t["gain"], t["gain"][1:]))
    # covered set grows by exactly each round's gain
    assert t["covered_after"].tolist() == t["gain"].cumsum().tolist()


def test_mmr_select_score_identity(ray_session):
    from yj_schema_validator_ray.pipelines.selection import mmr_select

    t = mmr_select(SF, c=32, k=6).to_pandas()
    assert len(t) == 6
    # rank 1 is pure relevance (nothing selected yet)
    assert t.loc[0, "max_sim_dot"] == 0
    # the score identity holds on every emitted row
    assert (t["mmr_score"] == 2 * t["rel_dot"] - t["max_sim_dot"]).all()
    assert t["vec_id"].is_unique


def test_part_kcore_fixpoint_and_degree_floor(ray_session):
    from yj_schema_validator_ray.stages.graph import part_kcore

    a = part_kcore(SF, k=3, rounds=16).to_pandas() \
        .sort_values("part").reset_index(drop=True)
    # converged core: every member meets the degree floor within it
    assert (a["core_deg"] >= 3).all()
    # extra peel rounds past the fixed point are provable no-ops
    b = part_kcore(SF, k=3, rounds=24).to_pandas() \
        .sort_values("part").reset_index(drop=True)
    assert a.equals(b)


def test_changelog_compaction_certificate(ray_session):
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.governance import (
        changelog_compaction)

    t = changelog_compaction(SF).to_pandas()
    assert len(t) == 1
    assert t.loc[0, "states_equal"] == 1
    assert t.loc[0, "n_mismatch"] == 0
    users = len(set(pq.read_table(f"{SF}/events.parquet",
                                  columns=["user_id"])
                    .column("user_id").to_pylist()))
    assert t.loc[0, "n_keys"] + t.loc[0, "n_tombstoned"] == users


def test_zonemap_prune_audit_accounting(ray_session):
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.olap_events2 import (
        zonemap_prune_audit)

    t = zonemap_prune_audit(SF).to_pandas()
    assert len(t) == 8  # 2 layouts x 4 predicates
    total = pq.read_metadata(f"{SF}/lineitem.parquet").num_rows
    # a zone map never scans fewer rows than actually match (soundness)
    assert (t["rows_scanned"] >= t["rows_matched"]).all()
    assert (t["rows_scanned"] <= total).all()
    # predicate 3 constrains only supp: the part-range layout cannot
    # prune a single zone for it (the claim the audit quantifies)
    p3 = t[(t["layout"] == "prange") & (t["pred_id"] == 3)]
    assert (p3["zones_pruned"] == 0).all()
    assert (p3["rows_scanned"] == total).all()


@pytest.mark.parametrize("name", [
    "greedy_coverage", "mmr_select", "part_kcore",
    "changelog_compaction", "zonemap_prune_audit"])
def test_wave15_registered(name):
    import __ray_entry__ as e

    assert name in e.queries()
    assert name in e.oracle_sql()
