"""Local mirror of the driver's correctness gate: run every queries() entry
on Ray AND its oracle_sql() on DuckDB over sf0.001, compare row sets
exactly (sorted columns, sorted rows). Catches Ray↔SQL drift before the
driver does at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(df[col]):
            df[col] = df[col].astype(bool)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _to_pandas(obj):
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    return obj


QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", QUERIES)
def test_query_matches_oracle(con, name):
    ray_fn = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    got = _normalize(_to_pandas(ray_fn(SF_DIR)))
    if sql is None:
        # rows-only query (driver records the weaker check); just assert it runs
        assert len(got) >= 0
        return
    exp = _normalize(con.execute(sql).fetchdf())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}")
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    float_cols = [c for c in got.columns if pd.api.types.is_float_dtype(got[c])]
    for c in got.columns:
        if c in float_cols:
            np.testing.assert_allclose(
                got[c].to_numpy(), exp[c].to_numpy(), rtol=0, atol=1e-9,
                err_msg=f"{name}: float column {c}")
        else:
            mism = (got[c] != exp[c])
            assert not mism.any(), (
                f"{name}: column {c} mismatches at {mism.sum()} rows; "
                f"sample got={got.loc[mism, c].head(3).tolist()} "
                f"exp={exp.loc[mism, c].head(3).tolist()}")


def test_entry_smoke():
    res = entrymod.entry()
    df = _to_pandas(res)
    assert len(df) > 0
    assert set(["conv_id", "turn_idx", "valid", "reject_reason"]) <= set(df.columns)
