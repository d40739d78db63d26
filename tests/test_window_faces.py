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


def test_interval_bucket_boundaries_and_key_isolation():
    from lauchy_ray.stages.join import _interval_bucket
    W = 10
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4, 10, 11, 20], np.int64),
        "user_id":  np.array([7, 7, 7, 7, 8, 8, 9], np.int64),
        "ts_us":    np.array([0, 10, 20, 15, 15, 15, 15], np.int64),
        # user 7: clicks at 0,10,20 and a purchase at 15 → window [5,15]
        # pairs with the click at 10 ONLY (0 < 5 excluded, 20 > 15
        # excluded); user 8: click+purchase at EQUAL ts → inclusive pair;
        # user 9: purchase with no clicks → no pair, and it must NOT see
        # user 8's click at the same ts
        "side":     np.array([0, 0, 0, 1, 0, 1, 1], np.int64)})
    out = _interval_bucket(df, "user_id", W).sort_values("left_id")
    assert list(map(tuple, out[["left_id", "right_id", "gap_us"]]
                    .itertuples(index=False))) == [(4, 2, 5), (11, 10, 0)]


def test_interval_bucket_exact_lower_bound_and_mxn():
    from lauchy_ray.stages.join import _interval_bucket
    df = pd.DataFrame({
        "event_id": np.array([1, 2, 3, 4], np.int64),
        "user_id":  np.array([5, 5, 5, 5], np.int64),
        "ts_us":    np.array([0, 5, 10, 10], np.int64),
        "side":     np.array([0, 0, 1, 1], np.int64)})
    # width 10: both purchases at 10 pair with clicks at 0 (== lower
    # bound, inclusive) and 5 → full 2×2 expansion
    out = _interval_bucket(df, "user_id", 10)
    assert len(out) == 4
    assert set(map(tuple, out[["left_id", "right_id"]]
                   .itertuples(index=False))) == {(3, 1), (3, 2),
                                                  (4, 1), (4, 2)}
