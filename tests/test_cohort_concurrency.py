"""Adversarial unit tests for the cohort-retention fold and the
sweep-line session-concurrency operator: tie semantics (starts before
ends at equal ts, zero-length single-event sessions, cross-user touching
sessions) against an independent brute-force reference, on both the
single-task fast path and the forced bucket-shuffle path."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import lauchy_ray.pipelines.queries as Q
import lauchy_ray.stages.bucketing as B
import ray.data as rd
from lauchy_ray.stages.graph import triangle_counts

HOUR = Q.HOUR_US
GAP = Q.GAP_US


def _write_events(tmp_path, ts_us, user_id):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    t = pa.table({
        "event_id": pa.array(np.arange(len(ts_us)), pa.int64()),
        "ts": pa.array(np.asarray(ts_us, np.int64),
                       pa.timestamp("us")),
        "user_id": pa.array(np.asarray(user_id, np.int64)),
        "event_type": pa.array(["e"] * len(ts_us)),
        "value": pa.array(np.zeros(len(ts_us))),
        "props": pa.array(['{"k": 1}'] * len(ts_us)),
    })
    pq.write_table(t, d / "events.parquet")
    return str(d)


def _brute_sessions(ts_us, user_id):
    df = pd.DataFrame({"u": user_id, "t": ts_us}).sort_values(["u", "t"])
    sessions = []
    for _, g in df.groupby("u"):
        ts = g["t"].to_numpy()
        start = ts[0]
        prev = ts[0]
        for t in ts[1:]:
            if t - prev > GAP:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    return sessions


def _brute_concurrency(sessions):
    # starts sort before ends at equal ts: +1 rows first (d descending)
    bounds = [(s, 1) for s, _ in sessions] + [(e, -1) for _, e in sessions]
    bounds.sort(key=lambda p: (p[0], -p[1]))
    out: dict[int, int] = {}
    run = 0
    for ts, d in bounds:
        run += d
        h = ts // HOUR
        out[h] = max(out.get(h, run), run)
    return out


ADVERSARIAL_CASES = {
    # zero-length sessions: one event each, same instant, three users
    "same_instant_singletons": ([5 * HOUR] * 3, [1, 2, 3]),
    # touching: user 1's session END == user 2's session START
    "touching_cross_user": ([0, GAP // 2, GAP // 2, GAP],
                            [1, 1, 2, 2]),
    # duplicate timestamps within one user straddling a gap boundary
    "dup_ts_at_gap": ([0, 0, GAP + 1, GAP + 1, 3 * GAP + 10],
                      [7, 7, 7, 7, 7]),
    # sessions spanning hour boundaries, interleaved users
    "hour_spanning": ([0, HOUR - 1, HOUR + 1, 2 * HOUR,
                       HOUR // 2, HOUR // 2 + GAP // 2],
                      [1, 1, 1, 1, 2, 2]),
}


@pytest.mark.parametrize("case", sorted(ADVERSARIAL_CASES))
@pytest.mark.parametrize("forced", [False, True],
                         ids=["fast-path", "bucket-path"])
def test_session_concurrency_matches_brute(tmp_path, ray_session,
                                           monkeypatch, case, forced):
    ts_us, users = ADVERSARIAL_CASES[case]
    sf = _write_events(tmp_path, ts_us, users)
    if forced:
        monkeypatch.setattr(B, "SINGLE_TASK_BYTES", 0)
    got = (Q.q_session_concurrency(sf).to_pandas()
           .sort_values("hour_id").reset_index(drop=True))
    exp = _brute_concurrency(_brute_sessions(ts_us, users))
    assert dict(zip(got["hour_id"], got["max_conc"])) == exp


def test_session_concurrency_randomized_vs_brute(tmp_path, ray_session):
    rng = np.random.default_rng(11)
    n = 400
    ts_us = rng.integers(0, 50 * HOUR, n)
    users = rng.integers(0, 12, n)
    sf = _write_events(tmp_path, ts_us, users)
    got = Q.q_session_concurrency(sf).to_pandas()
    exp = _brute_concurrency(_brute_sessions(ts_us, users))
    assert dict(zip(got["hour_id"], got["max_conc"])) == exp


def test_cohort_retention_matches_brute(tmp_path, ray_session, monkeypatch):
    rng = np.random.default_rng(5)
    n = 500
    ts_us = rng.integers(0, 20 * Q.DAY_US, n)
    users = rng.integers(0, 25, n)
    sf = _write_events(tmp_path, ts_us, users)
    monkeypatch.setattr(B, "SINGLE_TASK_BYTES", 0)
    got = (Q.q_cohort_retention(sf).to_pandas()
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    ud = (pd.DataFrame({"u": users, "day": ts_us // Q.DAY_US})
          .drop_duplicates())
    cohort = ud.groupby("u")["day"].transform("min")
    exp = (pd.DataFrame({"cohort_day": cohort, "day_offset": ud["day"] - cohort})
           .groupby(["cohort_day", "day_offset"]).size()
           .reset_index(name="n_users")
           .sort_values(["cohort_day", "day_offset"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


def test_props_k_stats_missing_keys_excluded(tmp_path, ray_session):
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "event_type": ["a", "a", "b", "b", "c"],
        "props": ['{"k": 5}', '{"other": 1}', '{"k": -3}', '{"k": 9}',
                  '{}'],
    })
    pq.write_table(t, d / "events.parquet")
    got = (Q.q_props_k_stats(str(d)).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    # type "c" has no k anywhere -> absent; "a" counts only the k row
    assert got["event_type"].tolist() == ["a", "b"]
    assert got["n_k"].tolist() == [1, 2]
    assert got["sum_k"].tolist() == [5, 6]
    assert got["min_k"].tolist() == [5, -3]
    assert got["max_k"].tolist() == [5, 9]


def test_embed_dim_stats_negative_floor_and_exactness(tmp_path, ray_session):
    # floor on negatives rounds AWAY from zero (-1.0000004 -> -2 at 1e6
    # scale when the float64 product lands below the integer) — the exact
    # contract the oracle's floor shares, unlike round-half-even
    d = tmp_path / "sf"
    d.mkdir()
    vecs = [[0.5, -0.5], [1.25, -1.25], [0.0, -2.0]]
    t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 0], pa.int32())})
    pq.write_table(t, d / "embeddings.parquet")
    got = (Q.q_embed_dim_stats(str(d)).to_pandas()
           .sort_values("dim").reset_index(drop=True))
    assert got["dim"].tolist() == [0, 1]
    assert got["n"].tolist() == [3, 3]
    # exact fixed-point sums: floor(v * 1e6) per element
    import math
    exp = [sum(math.floor(float(np.float32(v)) * 1e6) for v in col)
           for col in zip(*vecs)]
    assert got["sum_q"].tolist() == exp


def test_embed_dim_stats_nonfinite_excluded(tmp_path, ray_session):
    # NaN/inf cells leave BOTH n and sum_q; an all-NaN dim disappears
    d = tmp_path / "sf"
    d.mkdir()
    vecs = [[0.5, float("nan"), float("nan")],
            [1.0, float("inf"), float("nan")],
            [2.0, -3.0, float("nan")]]
    t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32())),
                  "label": pa.array([0, 0, 0], pa.int32())})
    pq.write_table(t, d / "embeddings.parquet")
    got = (Q.q_embed_dim_stats(str(d)).to_pandas()
           .sort_values("dim").reset_index(drop=True))
    assert got["dim"].tolist() == [0, 1]        # dim 2 all-NaN -> gone
    assert got["n"].tolist() == [3, 1]
    assert got["sum_q"].tolist() == [3_500_000, -3_000_000]


def test_props_k_stats_regex_contract_nested_and_string(tmp_path,
                                                        ray_session):
    # the regex IS the contract: nested objects match, string-encoded
    # values don't — identical to the oracle's regexp_extract face
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "event_type": ["a", "a", "a"],
        "props": ['{"outer": {"k": 7}}', '{"k": "9"}', '{"k": 4}'],
    })
    pq.write_table(t, d / "events.parquet")
    got = Q.q_props_k_stats(str(d)).to_pandas()
    assert got["n_k"].tolist() == [2]           # 7 (nested) + 4; not "9"
    assert got["sum_k"].tolist() == [11]
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{d}/events.parquet')")
    import __ray_entry__ as entrymod
    exp = con.execute(entrymod.oracle_sql()["props_k_stats"]).fetchdf()
    assert exp["n_k"].tolist() == [2] and exp["sum_k"].tolist() == [11]


def test_triangle_counts_rejects_wide_ids(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"u": [1, 2 ** 40], "v": [2, 3]})
                        .astype("int64"))
    with pytest.raises(Exception, match="2\\^31|remap"):
        triangle_counts(ds).to_pandas()


def test_value_percent_rank_ties_and_singleton(tmp_path, ray_session):
    # RANK tie semantics (equal cents share the smaller-count rank) and
    # the n=1 partition emitting 0.0 like SQL
    d = tmp_path / "sf"
    d.mkdir()
    t = pa.table({
        "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "event_type": ["a", "a", "a", "a", "solo"],
        "value": pa.array([1.0, 1.0, 2.0, 0.5, 9.9]),
    })
    pq.write_table(t, d / "events.parquet")
    got = (Q.q_value_percent_rank(str(d)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # type a sorted cents: 50,100,100,200 -> smaller counts 0,1,1,3; n=4
    assert got["prank"].tolist() == [1/3, 1/3, 3/3, 0.0, 0.0]


def test_cep_absence_matches_brute(tmp_path, ray_session, monkeypatch):
    rng = np.random.default_rng(13)
    n = 400
    ts_us = rng.integers(0, 10 * Q.HOUR_US, n)
    users = rng.integers(0, 10, n)
    kinds = rng.choice(["click", "purchase", "view"], n)
    # adversarial: equal-ts click/purchase pairs must NOT convert
    ts_us[0] = ts_us[1] = 12345
    users[0] = users[1] = 3
    kinds[0], kinds[1] = "click", "purchase"
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts_us.astype("int64"), pa.timestamp("us")),
        "user_id": pa.array(users.astype("int64")),
        "event_type": pa.array(kinds),
        "value": pa.array(np.zeros(n)),
        "props": pa.array(["{}"] * n)}), d / "events.parquet")
    monkeypatch.setattr(B, "SINGLE_TASK_BYTES", 0)
    got = set(Q.q_cep_absence(str(d)).to_pandas()["event_id"])
    exp = set()
    for i in range(n):
        if kinds[i] != "click":
            continue
        converted = any(
            kinds[j] == "purchase" and users[j] == users[i]
            and ts_us[i] < ts_us[j] <= ts_us[i] + Q.INTERVAL_W_US
            for j in range(n))
        if not converted:
            exp.add(i)
    assert got == exp
    assert 0 in got  # the equal-ts pair did not convert


def test_embed_quantize_constant_dim_and_nan(tmp_path, ray_session):
    d = tmp_path / "sf"
    d.mkdir()
    vecs = [[0.0, 5.0, float("nan")],
            [1.0, 5.0, float("nan")],
            [0.5, 5.0, float("nan")]]
    pq.write_table(pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0], pa.int32())}), d / "embeddings.parquet")
    got = (Q.q_embed_quantize(str(d)).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    # dim0 spans [0,1]: q = floor(v*255); dim1 constant -> 0; dim2 NaN
    assert got["n_fin"].tolist() == [2, 2, 2]
    assert got["q_sum"].tolist() == [0, 255, 127]
