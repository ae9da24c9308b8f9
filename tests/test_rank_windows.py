"""Global rank, running total, pivot, percentile filter: edge cases and
partition invariance (the sf0.001 oracle parity lives in
test_correctness_oracle.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from yj_schema_validator_ray.stages.rank import global_rank


def _ds(tbl, parts=1):
    import ray

    ds = ray.data.from_arrow(tbl)
    return ds.repartition(parts) if parts > 1 else ds


def test_global_rank_ties_and_partition_invariance(ray_session):
    # heavy ties: rank must be dense row_number with doc_id tie-break,
    # identical on 1 block and 8 shuffled blocks
    rng = np.random.RandomState(3)
    ids = np.arange(200, dtype=np.int64)
    keys = rng.randint(0, 7, size=200).astype(np.int64)  # 7 distinct keys
    tbl = pa.table({"doc_id": pa.array(ids), "k": pa.array(keys)})

    exp = (pd.DataFrame({"doc_id": ids, "k": keys})
           .sort_values(["k", "doc_id"], ascending=[False, True])
           .reset_index(drop=True))
    exp["rank"] = np.arange(1, 201, dtype=np.int64)
    exp = exp.sort_values("doc_id").reset_index(drop=True)

    for parts in (1, 8):
        got = (global_rank(_ds(tbl, parts), "k", "doc_id").to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert (got["rank"].to_numpy()
                == exp["rank"].to_numpy()).all(), parts
        assert (got["k"].to_numpy() == exp["k"].to_numpy()).all()


def test_global_rank_max_distinct_guard(ray_session):
    ids = np.arange(50, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids), "k": pa.array(ids)})
    with pytest.raises(ValueError, match="max_distinct"):
        global_rank(_ds(tbl), "k", "doc_id", max_distinct=10)


def test_pivot_unknown_type_counts_into_n_events(ray_session, tmp_path):
    # a type outside the fixed column list contributes to n_events only
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import (
        events_user_type_pivot)

    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "ts": pa.array([pd.Timestamp("2024-01-01")] * 4),
        "user_id": pa.array([7, 7, 7, 8], pa.int64()),
        "event_type": pa.array(["click", "mystery", "click", "view"]),
        "value": pa.array([1.0, 2.0, 3.0, 4.0]),
        "props": pa.array(["{}"] * 4),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = (events_user_type_pivot(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert got.loc[0, "n_events"] == 3 and got.loc[0, "n_click"] == 2
    assert got.loc[0, "n_view"] == 0  # mystery not counted per-type
    assert got.loc[1, "n_events"] == 1 and got.loc[1, "n_view"] == 1


def test_running_total_partition_invariance(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from yj_schema_validator_ray.pipelines.relational import (
        events_running_total)

    rng = np.random.RandomState(11)
    n = 300
    t = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(pd.to_datetime("2024-01-01")
                       + pd.to_timedelta(rng.randint(0, 500, n), unit="s")),
        "user_id": pa.array(rng.randint(0, 9, n).astype(np.int64)),
        "event_type": pa.array(["view"] * n),
        "value": pa.array(rng.uniform(0, 20, n).round(2)),
        "props": pa.array(["{}"] * n),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    got = (events_running_total(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))

    df = t.to_pandas()
    df["cents"] = (df["value"] * 100.0).round().astype("int64")
    df = df.sort_values(["user_id", "ts", "event_id"])
    df["running_cents"] = df.groupby("user_id")["cents"].cumsum()
    exp = df.sort_values("event_id").reset_index(drop=True)
    assert (got["running_cents"].to_numpy()
            == exp["running_cents"].to_numpy()).all()
    # max running value per user == user total (cumsum reaches the sum)
    tot = df.groupby("user_id")["cents"].sum().sort_index()
    mx = got.groupby("user_id")["running_cents"].max().sort_index()
    assert (mx.to_numpy() == tot.to_numpy()).all()


def test_quality_filter_q0_keeps_all(ray_session):
    import ray

    from yj_schema_validator_ray.pipelines.curation import (
        quality_length_filter)

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a", "bb", "ccc"]),
    }))
    got = quality_length_filter(docs, q=0.0).to_pandas()
    assert sorted(got["doc_id"]) == [1, 2, 3]

    got = quality_length_filter(docs, q=1.0).to_pandas()
    assert sorted(got["doc_id"]) == [3]  # only the max length survives


def test_global_rank_high_cardinality_keys(ray_session):
    """Near-unique keys (the regime the coarse-bucketed final exchange
    exists for): 20k distinct values rank correctly and the plan never
    creates one Ray group per key."""
    import pyarrow as pa
    import ray

    rng = np.random.RandomState(5)
    n = 20_000
    ids = np.arange(n, dtype=np.int64)
    keys = rng.permutation(n).astype(np.int64)  # all distinct
    tbl = pa.table({"doc_id": pa.array(ids), "k": pa.array(keys)})
    got = (global_rank(ray.data.from_arrow(tbl).repartition(8),
                       "k", "doc_id").to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    exp = (pd.DataFrame({"doc_id": ids, "k": keys})
           .sort_values(["k", "doc_id"], ascending=[False, True]))
    exp["rank"] = np.arange(1, n + 1, dtype=np.int64)
    exp = exp.sort_values("doc_id").reset_index(drop=True)
    assert (got["rank"].to_numpy() == exp["rank"].to_numpy()).all()


def test_budget_select_matches_pandas_reference(ray_session):
    """budget_select == the pandas sort+cumsum reference, including key
    ties straddling the budget boundary and multi-partition inputs."""
    import ray.data

    from yj_schema_validator_ray.stages.rank import budget_select

    rng = np.random.RandomState(9)
    n = 4000
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "key": rng.randint(0, 40, n).astype(np.int64),  # heavy ties
        "w": rng.randint(1, 50, n).astype(np.int64),
    })
    ref = df.sort_values(["key", "id"], ascending=[False, True]).copy()
    ref["cum"] = ref["w"].cumsum()
    budget = int(ref["cum"].iloc[n // 3])  # boundary mid-tie on purpose
    ref = ref[ref["cum"] <= budget]

    ds = ray.data.from_pandas(df).repartition(8).map_batches(
        lambda t: t, batch_format="pyarrow")
    got = (budget_select(ds, "key", "id", "w", budget=budget)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = (ref[["id", "key", "w", "cum"]].sort_values("id")
           .reset_index(drop=True).astype("int64"))
    got = got.astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_grouped_budget_select_matches_pandas_reference(ray_session):
    """Per-group budgets == pandas per-group sort+cumsum reference;
    groups without a budget drop entirely."""
    import ray.data

    from yj_schema_validator_ray.stages.rank import grouped_budget_select

    rng = np.random.RandomState(12)
    n = 3000
    df = pd.DataFrame({
        "src": rng.choice(["a", "b", "c"], n),
        "id": np.arange(n, dtype=np.int64),
        "key": rng.randint(0, 30, n).astype(np.int64),
        "w": rng.randint(1, 40, n).astype(np.int64),
    })
    budgets = {"a": 4000, "b": 1500}  # 'c' unbudgeted -> dropped
    ref = (df[df["src"].isin(budgets)]
           .sort_values(["src", "key", "id"],
                        ascending=[True, False, True]).copy())
    ref["cum"] = ref.groupby("src")["w"].cumsum()
    ref = ref[ref["cum"] <= ref["src"].map(budgets)]

    ds = ray.data.from_pandas(df).repartition(6).map_batches(
        lambda t: t, batch_format="pyarrow")
    got = (grouped_budget_select(ds, "src", "key", "id", "w", budgets)
           .to_pandas().sort_values("id").reset_index(drop=True))
    exp = (ref[["src", "id", "key", "w", "cum"]].sort_values("id")
           .reset_index(drop=True))
    for c in ["id", "key", "w", "cum"]:
        got[c] = got[c].astype("int64"); exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)
