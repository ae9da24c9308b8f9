"""Wave-16 operator properties (oracle equality itself is covered by
the parametrized mini driver-harness in test_correctness_oracle.py)."""

import pytest

SF = "/root/testdata/sf0.001"


def test_part_clustering_bounds(ray_session):
    from yj_schema_validator_ray.stages.graph import part_clustering

    t = part_clustering(SF).to_pandas()
    assert len(t) > 0
    # triangles through a node never exceed its wedge count
    assert (t["n_triangles"] <= t["n_wedges"]).all()
    assert (t["n_wedges"] == t["deg"] * (t["deg"] - 1) // 2).all()
    assert (t["deg"] >= 1).all()


def test_part_two_hop_dominates_degree(ray_session):
    from yj_schema_validator_ray.stages.graph import part_two_hop

    t = part_two_hop(SF).to_pandas()
    assert len(t) > 0
    # every direct neighbor is within two hops; self never counts
    assert (t["n_2hop"] >= t["n_1hop"]).all()
    n_nodes = len(t)
    assert (t["n_2hop"] <= n_nodes - 1).all()


def test_collocation_stats_marginal_consistency(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.text import collocation_stats

    docs = ray.data.read_parquet(f"{SF}/documents.parquet",
                                 columns=["doc_id", "text"])
    t = collocation_stats(docs).to_pandas()
    assert len(t) > 0
    # a bigram can't occur more often than either of its unigrams
    assert (t["n_pair"] <= t["n_t1"]).all()
    assert (t["n_pair"] <= t["n_t2"]).all()
    # one corpus-wide token total on every row
    assert t["n_tokens"].nunique() == 1
    assert (t["n_t1"] <= t["n_tokens"].iloc[0]).all()


@pytest.mark.parametrize("name", [
    "part_clustering", "part_two_hop", "collocation_stats"])
def test_wave16_registered(name):
    import __ray_entry__ as e

    assert name in e.queries()
    assert name in e.oracle_sql()
