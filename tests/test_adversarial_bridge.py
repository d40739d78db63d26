"""Adversarial events→turns bridge parity: the Ray derivation and the
DuckDB CTE must agree on inputs the driver's testdata never produces —
NULL props, 7/8-digit user ids (lpad truncation territory), and unknown
event types. These exact cases broke parity before the third review pass."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entrymod


@pytest.fixture(scope="module")
def adversarial_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("adv")
    n = 1500
    rng = np.random.default_rng(13)
    ev = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(1_704_067_200_000_000
                       + rng.integers(0, 30 * 86400, n).astype("int64") * 1_000_000,
                       pa.timestamp("us")),
        "user_id": pa.array(rng.choice([3, 999999, 1000000, 1234567, 99999999], n),
                            pa.int64()),
        "event_type": pa.array(rng.choice(
            ["click", "view", "signup", "purchase", "error", "FUTURE_TYPE"], n)),
        "value": pa.array(rng.random(n)),
        "props": pa.array([None if i % 20 == 2 else '{"k": 9}' for i in range(n)],
                          pa.string()),
    })
    pq.write_table(ev, str(out / "events.parquet"))
    return str(out)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


@pytest.mark.parametrize("name", ["turns_derive", "validate_route",
                                  "reject_summary", "turn_lag", "sessionize"])
def test_adversarial_parity(adversarial_dir, name):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{adversarial_dir}/events.parquet')")
    got = entrymod.queries()[name](adversarial_dir)
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    exp = con.execute(entrymod.oracle_sql()[name]).fetchdf()
    g, e = _norm(got), _norm(exp)
    assert list(g.columns) == list(e.columns)
    assert len(g) == len(e), f"{name}: {len(g)} vs {len(e)}"
    assert g.equals(e), f"{name}: value mismatch"


def test_adversarial_covers_the_hard_cases(adversarial_dir):
    t = pq.read_table(f"{adversarial_dir}/events.parquet")
    assert t["props"].null_count > 0
    assert max(t["user_id"].to_pylist()) >= 10_000_000
    assert "FUTURE_TYPE" in set(t["event_type"].to_pylist())