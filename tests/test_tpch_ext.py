"""Unit tests for the TPC-H canon extension wave (pipelines/tpch_ext)
and the generic large-large colocate_join it rides on.  The full
query-vs-DuckDB-oracle comparison runs in test_correctness_oracle.py;
these pin the join stage's semantics and the structural properties the
oracle can't isolate (tie retention, empty-side schema stability)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _merge_expect(left: pd.DataFrame, right: pd.DataFrame, lk: str,
                  rk: str) -> pd.DataFrame:
    r = right.rename(columns={rk: lk})
    return left.merge(r, on=lk, how="inner")


def _collect_sorted(ds, cols):
    df = ds.to_pandas()
    for c in df.columns:
        if str(df[c].dtype).startswith(("Int", "Float")):
            df[c] = df[c].astype(df[c].dtype.name.lower())
        elif str(df[c].dtype).startswith("string"):
            df[c] = df[c].astype(object)
    return df[cols].sort_values(cols).reset_index(drop=True)


def test_colocate_join_matches_pandas_merge(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.dimjoin import colocate_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.randint(0, 500, 4000).astype("int64"),
        "lv": rng.randint(0, 10**9, 4000).astype("int64"),
        "tag": [f"t{i % 13}" for i in range(4000)]})
    # m:n — duplicate keys on BOTH sides
    right = pd.DataFrame({
        "rk": rng.randint(0, 600, 1500).astype("int64"),
        "rv": rng.randint(-5, 5, 1500).astype("int64")})

    got = _collect_sorted(
        colocate_join(ray.data.from_pandas(left, override_num_blocks=7),
                      ray.data.from_pandas(right, override_num_blocks=5),
                      "k", "rk"),
        ["k", "lv", "tag", "rv"])
    want = (_merge_expect(left, right, "k", "rk")[["k", "lv", "tag", "rv"]]
            .sort_values(["k", "lv", "tag", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_colocate_join_empty_side_with_explicit_schemas(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.dimjoin import colocate_join
    from yj_schema_validator_ray.util import collect_small_arrow

    left = pd.DataFrame({"k": pd.Series(dtype="int64"),
                         "lv": pd.Series(dtype="int64")})
    right = pd.DataFrame({"rk": np.arange(10, dtype="int64"),
                          "rv": np.arange(10, dtype="int64") * 2})
    out = colocate_join(
        ray.data.from_pandas(left),
        ray.data.from_pandas(right), "k", "rk",
        schemas=(pa.schema([("k", pa.int64()), ("lv", pa.int64())]),
                 pa.schema([("rk", pa.int64()), ("rv", pa.int64())])))
    assert collect_small_arrow(out).num_rows == 0


def test_colocate_join_rejects_column_clash(ray_session):
    import ray.data

    from yj_schema_validator_ray.stages.dimjoin import colocate_join

    df = pd.DataFrame({"k": [1], "v": [2]})
    with pytest.raises(ValueError, match="clash"):
        colocate_join(ray.data.from_pandas(df),
                      ray.data.from_pandas(df.rename(columns={"k": "k2"})),
                      "k", "k2")


def test_collect_small_arrow_skips_empty_pandas_blocks(ray_session):
    import ray.data

    from yj_schema_validator_ray.util import collect_small_arrow

    # an empty zero-column pandas block (what an unoccupied exchange
    # partition emits) must be dropped, not crash the concat
    ds = ray.data.from_pandas([pd.DataFrame({"a": [1, 2]}),
                               pd.DataFrame()])
    t = collect_small_arrow(ds)
    assert t.column("a").to_pylist() == [1, 2]


def test_q15_keeps_ties(ray_session):
    # two suppliers with bit-identical max revenue must BOTH survive
    # the argmax filter (SQL `= (SELECT max(...))` keeps ties); pin via
    # a direct scan of the per-supplier reduce at sf0.001
    import duckdb

    from yj_schema_validator_ray.pipelines.tpch_ext import (
        q15_sql, q15_top_supplier)

    got = q15_top_supplier(SF).to_pandas()
    con = duckdb.connect()
    for t in ["lineitem", "supplier"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    want = con.execute(q15_sql()).fetchdf()
    assert len(got) == len(want) >= 1
    assert got["total_revenue_e4"].nunique() == 1


def test_q22_empty_result_keeps_schema(ray_session):
    # a cutoff before every order date leaves zero anti-join survivors;
    # the typed three-column schema must survive anyway (driver compare
    # sorts columns by name even for empty frames)
    from yj_schema_validator_ray.pipelines.tpch_ext import (
        q22_global_sales_opportunity)

    out = q22_global_sales_opportunity(SF, cutoff="1990-01-01")
    assert list(out.columns) == ["c_nationkey", "numcust",
                                 "totacctbal_cents"]
    assert len(out) == 0
    assert all(str(dt) == "int64" for dt in out.dtypes)
