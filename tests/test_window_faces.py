"""Units for the window-frame query kernels: moving-average frame
boundaries at segment edges and the NTILE closed form vs the SQL rule
(first n mod k buckets get ceil(n/k))."""

import duckdb
import numpy as np
import pandas as pd

import lauchy_ray.pipelines.queries as Q


def test_mavg_matches_pandas_rolling():
    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 9, n).astype(np.int64),
        "ts_us": rng.integers(0, 10_000, n).astype(np.int64),
        "cents": rng.integers(-500, 5000, n).astype(np.int64)})
    # expected: pandas rolling window 3, min_periods 1, per user in
    # (ts_us, event_id) order
    s = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    exp = (s.groupby("user_id", sort=False)["cents"]
           .rolling(3, min_periods=1).mean().to_numpy())
    out = _run_mavg_kernel(s)
    np.testing.assert_allclose(out["mavg"].to_numpy(), exp, rtol=0, atol=0)


def _run_mavg_kernel(df):
    """Invoke the mavg closure by rebuilding it the way the query does."""
    W = Q.MAVG_WINDOW
    df = df.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    cents = df["cents"].to_numpy(np.int64)
    uid = df["user_id"].to_numpy(np.int64)
    n = len(df)
    first = np.ones(n, dtype=bool)
    first[1:] = uid[1:] != uid[:-1]
    seg_start = np.flatnonzero(first)[np.cumsum(first) - 1]
    pos = np.arange(n, dtype=np.int64)
    sof = np.maximum(seg_start, pos - (W - 1))
    cs = np.cumsum(cents)
    base = np.where(sof > 0, cs[np.maximum(sof - 1, 0)], 0)
    wsum = cs - base
    wn = pos - sof + 1
    return pd.DataFrame({"mavg": wsum.astype(np.float64) / wn})


def test_ntile_closed_form_matches_duckdb():
    """The vectorized NTILE formula must agree with DuckDB's ntile for
    every group size 1..13 and k=4."""
    rows = []
    for size in range(1, 14):
        for r in range(size):
            rows.append((size, r))
    df = pd.DataFrame(rows, columns=["grp", "rel"])
    K = 4
    sizes = df["grp"].to_numpy(np.int64)
    rel = df["rel"].to_numpy(np.int64)
    q, rem = sizes // K, sizes % K
    cut = rem * (q + 1)
    q_safe = np.maximum(q, 1)
    tile = np.where(rel < cut, rel // (q + 1), rem + (rel - cut) // q_safe) + 1
    exp = duckdb.sql(
        "SELECT grp, rel, ntile(4) OVER (PARTITION BY grp ORDER BY rel)"
        " AS t FROM df ORDER BY grp, rel").fetchdf()["t"].to_numpy()
    np.testing.assert_array_equal(tile, exp)
