"""Hot-conversation pre-split for sessionize (SURVEY §7.4; r4 verdict #5).

One degenerate conversation owning a large share of the rows must not
lower-bound a single bucket's wall time: its rows are salted into
ts-range chunks (level 1) and the per-chunk session summaries are
gap-merged (level 2). These tests pin (a) detection, (b) that the salt
actually spreads the hot conv over many buckets, and (c) that the
pre-split output is EXACTLY the single-pass output — including sessions
spanning chunk boundaries.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lauchy_ray.oracle import sessionize_rows
from lauchy_ray.stages.sessionize import (
    HOT_CHUNK_ROWS, _salted_bucket, find_hot_convs, sessionize,
    sessionize_conv_stats)

GAP_US = 30 * 60 * 1_000_000


def _skewed_turns(n_cold_convs: int = 40, cold_rows: int = 30,
                  hot_rows: int = 900, seed: int = 7) -> pd.DataFrame:
    """~43% of rows in one conversation, timestamps engineered so that
    sessions both break and continue across any ts-range chunk cut."""
    rng = np.random.default_rng(seed)
    rows = []
    base = 1_700_000_000_000_000
    for c in range(n_cold_convs):
        t = base + c * 10_000_000_000
        for i in range(cold_rows):
            t += int(rng.integers(1, 3 * GAP_US))
            rows.append(("conv%03d" % c, i, t))
    t = base
    for i in range(hot_rows):
        # mostly small steps (sessions run on), occasional gap breaks
        t += int(rng.integers(1, GAP_US // 4)) if i % 37 else 2 * GAP_US
        rows.append(("hotconv", i, t))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us"])
    df = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    # datetime64[us], matching the parquet fixtures the engine reads
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us").astype("datetime64[us]")
    return df


def _oracle(df: pd.DataFrame) -> pd.DataFrame:
    rows = [{"conv_id": c, "turn_idx": i, "ts": t}
            for c, i, t in zip(df["conv_id"], df["turn_idx"], df["ts_us"])]
    exp = pd.DataFrame(sessionize_rows(rows, GAP_US))
    return exp.sort_values(["conv_id", "session_id"]).reset_index(drop=True)


def _norm(out: pd.DataFrame) -> pd.DataFrame:
    out = out.sort_values(["conv_id", "session_id"]).reset_index(drop=True)
    res = out[["conv_id", "session_id", "start_ts", "end_ts",
               "n_turns"]].copy()
    res["session_id"] = res["session_id"].astype("int64")
    res["start_ts"] = res["start_ts"].astype("datetime64[us]").astype("int64")
    res["end_ts"] = res["end_ts"].astype("datetime64[us]").astype("int64")
    res["n_turns"] = res["n_turns"].astype("int64")
    return res


def test_find_hot_convs(ray_session):
    df = _skewed_turns()
    hot = find_hot_convs(rd.from_pandas(df[["conv_id", "ts"]]), hot_rows=500)
    assert [h["conv_id"] for h in hot] == ["hotconv"]
    h = hot[0]
    sub = df[df["conv_id"] == "hotconv"]
    assert h["n"] == len(sub)
    assert h["lo"] == int(sub["ts_us"].min())
    assert h["hi"] == int(sub["ts_us"].max())


def test_salt_spreads_hot_conv(ray_session):
    df = _skewed_turns()
    sub = df[df["conv_id"] == "hotconv"]
    hot = {"hotconv": (8, int(sub["ts_us"].min()),
                       int(sub["ts_us"].max()) - int(sub["ts_us"].min()))}
    b = _salted_bucket(df[["conv_id", "ts"]].copy(), nb=64, hot=hot)
    hot_buckets = b.loc[b["conv_id"] == "hotconv", "__bucket"].nunique()
    assert hot_buckets >= 6  # 8 chunks, minus possible hash collisions
    # cold convs keep the plain conv-hash bucketing
    from lauchy_ray.stages.bucketing import key_bucket
    cold = b[b["conv_id"] != "hotconv"]
    expect = key_bucket(cold["conv_id"].to_numpy(), 64)
    assert (cold["__bucket"].to_numpy() == expect).all()


def test_presplit_output_exact(ray_session):
    df = _skewed_turns()
    ds = rd.from_pandas(df[["conv_id", "turn_idx", "ts"]])
    hot = find_hot_convs(ds, hot_rows=200)
    assert hot, "fixture must trigger the pre-split"
    # force chunks to be tiny so many boundary stitches happen
    import lauchy_ray.stages.sessionize as S
    old = S.HOT_CHUNK_ROWS
    S.HOT_CHUNK_ROWS = 64
    try:
        got = _norm(sessionize(ds, GAP_US, hot_convs=hot).to_pandas())
    finally:
        S.HOT_CHUNK_ROWS = old
    exp = _oracle(df)
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["session_id"].tolist() == exp["session_id"].tolist()
    assert got["start_ts"].tolist() == exp["start_ts"].tolist()
    assert got["end_ts"].tolist() == exp["end_ts"].tolist()
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()
    # and identical to the uniform single-pass engine path
    plain = _norm(sessionize(ds, GAP_US, hot_rows=None).to_pandas())
    pd.testing.assert_frame_equal(got, plain)


def test_presplit_conv_stats_exact(ray_session):
    df = _skewed_turns()
    ds = rd.from_pandas(df[["conv_id", "turn_idx", "ts"]])
    hot = find_hot_convs(ds, hot_rows=200)
    import lauchy_ray.stages.sessionize as S
    old = S.HOT_CHUNK_ROWS
    S.HOT_CHUNK_ROWS = 64
    try:
        got = (sessionize_conv_stats(ds, GAP_US, hot_convs=hot).to_pandas()
               .sort_values("conv_id").reset_index(drop=True))
    finally:
        S.HOT_CHUNK_ROWS = old
    plain = (sessionize_conv_stats(ds, GAP_US).to_pandas()
             .sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, plain)


def test_hot_chunk_rows_constant_sane():
    assert 0 < HOT_CHUNK_ROWS <= 2_000_000


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None)
@given(st.data())
def test_presplit_property_random_streams(ray_session, data):
    """Random conversation mixes (skew, gap patterns, chunk sizes): the
    pre-split path must equal the scalar oracle exactly."""
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    n_cold = int(data.draw(st.integers(1, 6)))
    hot_n = int(data.draw(st.integers(40, 200)))
    chunk = int(data.draw(st.integers(7, 64)))
    base = 1_700_000_000_000_000
    rows = []
    for c in range(n_cold):
        t = base + c * 5_000_000_000
        for i in range(int(rng.integers(1, 30))):
            t += int(rng.integers(1, 3 * GAP_US))
            rows.append(("c%02d" % c, i, t))
    t = base
    for i in range(hot_n):
        step = int(rng.integers(1, GAP_US // 3)) if rng.random() < 0.9 \
            else int(rng.integers(GAP_US + 1, 3 * GAP_US))
        t += step
        rows.append(("hot", i, t))
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts_us"])
    df = df.sample(frac=1.0, random_state=rng_seed).reset_index(drop=True)
    df["ts"] = pd.to_datetime(df["ts_us"], unit="us").astype("datetime64[us]")
    ds = rd.from_pandas(df[["conv_id", "turn_idx", "ts"]])
    sub = df[df["conv_id"] == "hot"]
    hot = [{"conv_id": "hot", "n": len(sub),
            "lo": int(sub["ts_us"].min()), "hi": int(sub["ts_us"].max())}]
    import lauchy_ray.stages.sessionize as S
    old = S.HOT_CHUNK_ROWS
    S.HOT_CHUNK_ROWS = chunk
    try:
        got = _norm(sessionize(ds, GAP_US, hot_convs=hot).to_pandas())
    finally:
        S.HOT_CHUNK_ROWS = old
    exp = _oracle(df)
    pd.testing.assert_frame_equal(
        got, exp.astype(got.dtypes.to_dict()), check_dtype=False)
