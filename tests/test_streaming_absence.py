"""Streaming absence (timeout) engine: batch equivalence over the
validated fixture stream, shard/slicing invariance, late routing,
checkpoint resume, and a hypothesis property test against a scalar
row-at-a-time oracle (random streams, duplicates, equal-ts runs)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lauchy_ray.state.streaming import (AbsenceShardCore,
                                        run_streaming_absence)

BIG_LATENESS = 1 << 40
WINDOW = 30 * 60 * 1_000_000


def _codes_kwargs(fixture_dir):
    codes = sorted(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    return {"entity_codes": codes}


def _batch_absences(fixture_dir, window=WINDOW):
    """Ground truth over the SAME prepared stream: user turns with no
    assistant turn in the conv within (t, t+window], dedup keep-first."""
    from lauchy_ray.pipelines.validate import _drop_null_text
    from lauchy_ray.stages.validator import Validator
    codes = sorted(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    table = pq.ParquetDataset(fixture_dir["turns"]).read()
    v = Validator(entity_codes=codes)(_drop_null_text(table))
    df = (v.select(["conv_id", "turn_idx", "role", "ts"]).to_pandas()
          .assign(ts_us=lambda d: d["ts"].astype("datetime64[us]")
                  .astype("int64")))
    df = df.drop_duplicates(["conv_id", "turn_idx"], keep="first")
    out = set()
    for conv, g in df.groupby("conv_id"):
        a = np.sort(g.loc[g["role"] == "assistant", "ts_us"].to_numpy())
        u = g[g["role"] == "user"]
        for idx, t in zip(u["turn_idx"], u["ts_us"]):
            lo = np.searchsorted(a, t, side="right")
            hi = np.searchsorted(a, t + window, side="right")
            if lo >= hi:
                out.add((conv, int(idx), int(t)))
    return out


def _as_set(df):
    return set(map(tuple,
                   df[["conv_id", "turn_idx", "ts"]].itertuples(index=False)))


@pytest.fixture(scope="module")
def absence_truth(fixture_dir):
    truth = _batch_absences(fixture_dir)
    assert truth, "fixture must contain unanswered user turns"
    return truth


def test_streaming_equals_batch(fixture_dir, absence_truth):
    got, late, _ = run_streaming_absence(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=4, validate_kwargs=_codes_kwargs(fixture_dir))
    assert (late["ts"] == -1).all()      # only duplicate routes
    assert _as_set(got) == absence_truth
    # deadlines are ts + window on every emission
    assert (got["deadline"] == got["ts"] + WINDOW).all()


def test_shard_count_invariance(fixture_dir, absence_truth):
    for n_shards in (1, 7):
        got, _, _ = run_streaming_absence(
            fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
            n_shards=n_shards, validate_kwargs=_codes_kwargs(fixture_dir))
        assert _as_set(got) == absence_truth


def test_checkpoint_resume_identical(fixture_dir, absence_truth, tmp_path):
    ck = str(tmp_path / "ck")
    got, _, _ = run_streaming_absence(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=2, validate_kwargs=_codes_kwargs(fixture_dir),
        checkpoint_dir=ck)
    again, _, _ = run_streaming_absence(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=2, validate_kwargs=_codes_kwargs(fixture_dir),
        checkpoint_dir=ck)
    assert _as_set(got) == absence_truth
    assert _as_set(again) == absence_truth
    assert len(again) == len(got)


# ------------------------------------------- hypothesis vs scalar oracle

NEG = -(1 << 62)


def _absence_oracle(rows, lateness, window):
    """(absence set, wm-late list, dup-route count) for arrival-ordered
    rows (conv, idx, role, ts) under the prefix-wm late rule, keep-first
    duplicates, existence-based answers."""
    wm = NEG
    wm_late, acc = [], []
    for conv, idx, role, ts in rows:
        if ts <= wm:
            wm_late.append((conv, idx, ts))
        else:
            acc.append((conv, idx, role, ts))
        wm = max(wm, ts - lateness)
    seen, users, assists = set(), [], {}
    dup = 0
    for conv, idx, role, ts in acc:
        if role == "user":
            if (conv, idx) in seen:
                dup += 1
                continue
            seen.add((conv, idx))
            users.append((conv, idx, ts))
        elif role == "assistant":
            assists.setdefault(conv, []).append(ts)
    absences = set()
    for conv, idx, t in users:
        if not any(t < ta <= t + window for ta in assists.get(conv, [])):
            absences.add((conv, idx, t))
    return absences, wm_late, dup


def _run_core(rows, lateness, window, n_slices):
    core = AbsenceShardCore(window, lateness)
    cuts = np.linspace(0, len(rows), n_slices + 1).astype(int)
    for k in range(n_slices):
        part = rows[cuts[k]:cuts[k + 1]]
        if not part:
            continue
        core.ingest(pa.table({
            "conv_id": [r[0] for r in part],
            "turn_idx": pa.array([r[1] for r in part], pa.int64()),
            "role": [r[2] for r in part],
            "ts": pa.array([r[3] for r in part], pa.timestamp("us")),
        }))
    fin = core.finalize()
    from lauchy_ray.state.streaming import rows_list
    got = {(r["conv_id"], r["turn_idx"], r["ts"])
           for r in rows_list(fin["emitted"])}
    late_rows = rows_list(fin["late"])
    wm_late = [(r["conv_id"], r["turn_idx"], r["ts"])
               for r in late_rows if r["ts"] != -1]
    dup = sum(1 for r in late_rows if r["ts"] == -1)
    return got, wm_late, dup


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2 ** 31 - 1),
       lateness=st.sampled_from([0, 3, 10, 1 << 40]),
       window=st.sampled_from([1, 5, 25]),
       n_slices=st.integers(1, 6))
def test_core_matches_scalar_oracle(seed, lateness, window, n_slices):
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(rng.integers(1, 4)):
        conv = f"c{c}"
        n = int(rng.integers(1, 14))
        ts = np.cumsum(rng.integers(0, 4, n)) + int(rng.integers(0, 20))
        roles = rng.choice(["user", "assistant", "tool"], n)
        for i in range(n):
            rows.append((conv, i, str(roles[i]), int(ts[i])))
        # duplicate copies of a few user turns (same idx, same-ish ts)
        for i in rng.choice(n, size=min(2, n), replace=False):
            rows.append((conv, int(i), str(roles[i]), int(ts[i])))
    rng.shuffle(rows)
    exp = _absence_oracle(rows, lateness, window)
    got = _run_core(rows, lateness, window, n_slices)
    assert got[0] == exp[0]
    assert sorted(got[1]) == sorted(exp[1])
    assert got[2] == exp[2]
