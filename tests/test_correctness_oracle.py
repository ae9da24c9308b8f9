"""Mini driver-harness: run every queries() entry at sf0.001 and compare
against its oracle_sql() via DuckDB (row count + schema + order-insensitive
values), the same check the external driver performs at sf0.01."""

import math

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def harness(ray_session):
    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return e, con


def to_pandas(result):
    import ray.data
    import pyarrow as pa

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype("string")
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


def assert_matches(ray_df, sql_df, name):
    a, b = normalize(ray_df), normalize(sql_df)
    assert list(a.columns) == list(b.columns), f"{name}: columns {list(a.columns)} != {list(b.columns)}"
    assert len(a) == len(b), f"{name}: rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert all(
                (pd.isna(x) and pd.isna(y)) or math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)
                for x, y in zip(av, bv)), f"{name}: float col {c} differs"
        else:
            eq = (av.fillna("\0") == bv.fillna("\0")) if av.dtype == "string" else (av == bv)
            assert eq.all(), f"{name}: col {c} differs\n{a[~eq].head()}\n{b[~eq].head()}"


def _oracle_names():
    import __ray_entry__ as e

    return sorted(e.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(harness, name):
    e, con = harness
    q = e.queries()[name]
    sql = e.oracle_sql()[name]
    ray_df = to_pandas(q(SF_DIR))
    sql_df = con.execute(sql).fetchdf()
    assert_matches(ray_df, sql_df, name)


def test_rows_only_queries_run(harness):
    e, _ = harness
    qs = e.queries()
    for name in set(qs) - set(e.oracle_sql()):
        df = to_pandas(qs[name](SF_DIR))
        assert len(df) >= 0


def test_entry_smoke(harness):
    e, _ = harness
    ds = e.entry()
    df = to_pandas(ds)
    assert len(df) > 0
