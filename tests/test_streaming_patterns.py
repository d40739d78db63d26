"""Streaming (A B+ C) row-pattern engine vs the batch kernel over the
same validated stream: match-set equality with ample lateness, slicing
and shard-count invariance, late routing under tight lateness, carried
DFA state across micro-batch boundaries, and checkpoint resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray.stages.patterns import match_abplusc_bucket
from lauchy_ray.state.streaming import (PatternShardCore,
                                        run_streaming_patterns)

BIG_LATENESS = 1 << 40  # >> fixture jitter: no late rows


def _batch_matches(fixture_dir):
    """Ground truth: the batch kernel over the SAME prepared stream
    (validated + null-text-dropped) the streaming engine consumes."""
    from lauchy_ray.pipelines.validate import _drop_null_text
    from lauchy_ray.stages.validator import Validator
    codes = sorted(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    table = pq.ParquetDataset(fixture_dir["turns"]).read()
    v = Validator(entity_codes=codes)(_drop_null_text(table))
    df = v.select(["conv_id", "turn_idx", "role"]).to_pandas()
    # the stream has duplicate (conv, turn_idx) arrivals; the engine keeps
    # the FIRST (fragment order) — mirror that for ground truth
    df = df.drop_duplicates(["conv_id", "turn_idx"], keep="first")
    return match_abplusc_bucket(df)


def _as_set(df):
    return set(map(tuple, df[["conv_id", "start_idx", "end_idx",
                              "n_tool_turns"]].itertuples(index=False)))


@pytest.fixture(scope="module")
def batch_truth(fixture_dir):
    truth = _batch_matches(fixture_dir)
    assert len(truth) > 0, "fixture must contain A B+ C matches"
    return truth


def _codes_kwargs(fixture_dir):
    codes = sorted(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    return {"entity_codes": codes}


def test_streaming_equals_batch(fixture_dir, batch_truth):
    got, late, _ = run_streaming_patterns(
        fixture_dir["turns"], lateness_us=BIG_LATENESS, n_shards=4,
        validate_kwargs=_codes_kwargs(fixture_dir))
    # with ample lateness the only "late" routes are duplicate-idx
    # arrivals (marked ts = -1) — never a watermark drop
    assert (late["ts"] == -1).all()
    assert _as_set(got) == _as_set(batch_truth)


def test_shard_count_invariance(fixture_dir, batch_truth):
    for n_shards in (1, 7):
        got, _, _ = run_streaming_patterns(
            fixture_dir["turns"], lateness_us=BIG_LATENESS,
            n_shards=n_shards, validate_kwargs=_codes_kwargs(fixture_dir))
        assert _as_set(got) == _as_set(batch_truth)


def test_fragment_slicing_invariance(fixture_dir, batch_truth, tmp_path):
    """Re-fragment the same stream (13 uneven micro-batches instead of 4):
    emissions must not change — the consumption rule is slicing-invariant."""
    table = pq.ParquetDataset(fixture_dir["turns"]).read()
    frag_dir = tmp_path / "refrag"
    frag_dir.mkdir()
    bounds = np.linspace(0, table.num_rows, 14).astype(int)
    for f in range(13):
        pq.write_table(table.slice(bounds[f], bounds[f + 1] - bounds[f]),
                       str(frag_dir / f"part-{f:05d}.parquet"))
    got, _, _ = run_streaming_patterns(
        str(frag_dir), lateness_us=BIG_LATENESS, n_shards=4,
        validate_kwargs=_codes_kwargs(fixture_dir))
    assert _as_set(got) == _as_set(batch_truth)


def test_late_routing_and_conservation(fixture_dir):
    """Tight lateness: some turns route late; every prepared row is either
    consumed (frontier) or routed late, and no match uses a late turn."""
    got, late, wms = run_streaming_patterns(
        fixture_dir["turns"], lateness_us=1_000_000, n_shards=4,
        validate_kwargs=_codes_kwargs(fixture_dir))
    late = late[late["ts"] != -1]  # watermark drops, not dup routes
    assert len(late) > 0, "fixture jitter must exercise the late path"
    assert all(w > 0 for w in wms)
    # late turns are excluded from the sequence: a match spanning a late
    # turn's idx in the same conv would contradict the frontier rule
    late_keys = set(map(tuple, late[["conv_id", "turn_idx"]]
                        .itertuples(index=False)))
    for row in got.itertuples(index=False):
        for i in range(row.start_idx, row.end_idx + 1):
            assert (row.conv_id, i) not in late_keys


# ------------------------------------------------ core-level unit tests

def _tbl(rows):
    return pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
        "role": [r[2] for r in rows],
        "ts": pa.array([r[3] for r in rows], pa.int64()),
    })


def test_core_carried_run_across_batches():
    """A tool-run split across micro-batches must emit ONE match with the
    full count, identical to single-batch ingestion."""
    rows = [("c", 0, "user", 10), ("c", 1, "tool", 20), ("c", 2, "tool", 30),
            ("c", 3, "tool", 40), ("c", 4, "assistant", 50)]
    for split in range(1, 5):
        core = PatternShardCore(lateness_us=0)
        core.ingest(_tbl(rows[:split]), seq=0)
        core.ingest(_tbl(rows[split:]), seq=1)
        from lauchy_ray.state.streaming import rows_list
        out = rows_list(core.finalize()["emitted"])
        assert out == [{"conv_id": "c", "start_idx": 0, "end_idx": 4,
                        "n_tool_turns": 3}], f"split={split}"


def test_core_gap_breaks_run_and_neighbours():
    # idx 2 missing (e.g. null-text drop): user(0) tool(1) [gap] tool(3)
    # assistant(4) — neither fragment may match
    core = PatternShardCore(lateness_us=0)
    core.ingest(_tbl([("c", 0, "user", 10), ("c", 1, "tool", 20),
                      ("c", 3, "tool", 40), ("c", 4, "assistant", 50)]),
                seq=0)
    assert core.finalize()["emitted"] == []


def test_core_late_row_routed_not_matched():
    core = PatternShardCore(lateness_us=5)
    # ts 100 arrives first: wm = 95; the user turn at ts 50 is late
    core.ingest(_tbl([("c", 3, "assistant", 100), ("c", 0, "user", 50),
                      ("c", 1, "tool", 96), ("c", 2, "tool", 97)]), seq=0)
    fin = core.finalize()
    assert fin["emitted"] == []  # run has no adjacent A (idx 0 was late)
    from lauchy_ray.state.streaming import rows_list
    assert [(r["conv_id"], r["turn_idx"])
            for r in rows_list(fin["late"])] == [("c", 0)]


def test_core_duplicate_idx_keeps_first():
    core = PatternShardCore(lateness_us=0)
    core.ingest(_tbl([("c", 0, "user", 10), ("c", 1, "tool", 20),
                      ("c", 1, "system", 25), ("c", 2, "assistant", 30)]),
                seq=0)
    from lauchy_ray.state.streaming import rows_list
    out = rows_list(core.finalize()["emitted"])
    assert out == [{"conv_id": "c", "start_idx": 0, "end_idx": 2,
                    "n_tool_turns": 1}]


def test_core_stale_inflated_dup_never_rematches():
    """An adversarial duplicate with an INFLATED ts arriving after its
    region was consumed must be stale-dropped — never re-enter the DFA,
    regress the frontier, or re-emit the match (exactly-once)."""
    core = PatternShardCore(lateness_us=0)
    core.ingest(_tbl([("c", 0, "user", 10), ("c", 1, "tool", 20),
                      ("c", 2, "assistant", 30)]), seq=0)
    core.ingest(_tbl([("c", 0, "user", 100), ("c", 1, "tool", 101),
                      ("c", 2, "assistant", 102)]), seq=1)
    fin = core.finalize()
    from lauchy_ray.state.streaming import rows_list
    assert rows_list(fin["emitted"]) == [{"conv_id": "c", "start_idx": 0,
                                          "end_idx": 2, "n_tool_turns": 1}]
    assert sum(1 for r in rows_list(fin["late"]) if r["ts"] == -1) == 3


def test_checkpoint_resume_identical(fixture_dir, batch_truth, tmp_path):
    """Full run vs crash-after-every-prefix resume: identical emissions
    (delta-log replay dedupe, snapshot restore)."""
    ck = str(tmp_path / "ck")
    got, _, _ = run_streaming_patterns(
        fixture_dir["turns"], lateness_us=BIG_LATENESS, n_shards=2,
        validate_kwargs=_codes_kwargs(fixture_dir), checkpoint_dir=ck)
    # resume over the SAME checkpoint dir: all seqs already applied,
    # emissions come from the delta log exactly once
    again, _, _ = run_streaming_patterns(
        fixture_dir["turns"], lateness_us=BIG_LATENESS, n_shards=2,
        validate_kwargs=_codes_kwargs(fixture_dir), checkpoint_dir=ck)
    assert _as_set(got) == _as_set(batch_truth)
    assert _as_set(again) == _as_set(batch_truth)
    assert len(again) == len(got)


# ------------------------------------------- hypothesis vs scalar oracle

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st


def _pattern_oracle(rows, lateness):
    """Row-at-a-time reference for PatternShardCore's timing-free
    semantics. rows = (conv, idx, role, ts) in ARRIVAL order.
    → (matches set, watermark-late list, dup/stale-route count)."""
    NEG = -(1 << 62)
    wm = NEG
    wm_late, accepted = [], []
    for conv, idx, role, ts in rows:
        if ts <= wm:
            wm_late.append((conv, idx, ts))
        else:
            accepted.append((conv, idx, role, ts))
        wm = max(wm, ts - lateness)
    # winner per (conv, idx) = (min ts, earliest arrival); losers routed
    win = {}
    for a_i, (conv, idx, role, ts) in enumerate(accepted):
        k = (conv, idx)
        if k not in win or ts < win[k][0]:
            win[k] = (ts, a_i, role)
    n_routed = len(accepted) - len(win)
    seqs = {}
    for (conv, idx), (_, _, role) in win.items():
        seqs.setdefault(conv, []).append((idx, role))
    matches = set()
    for conv, seq in seqs.items():
        seq.sort()
        prev_idx, prev_role = None, None
        run_start, run_aok, run_len = -1, False, 0
        for idx, role in seq:
            adjacent = prev_idx is not None and idx == prev_idx + 1
            if role == "tool":
                if run_len and adjacent:
                    run_len += 1
                else:
                    run_len, run_start = 1, idx
                    run_aok = adjacent and prev_role == "user"
            else:
                if run_len and adjacent and role == "assistant" and run_aok:
                    matches.add((conv, run_start - 1, idx, run_len))
                run_len = 0
            prev_idx, prev_role = idx, role
    return matches, wm_late, n_routed


_stream_strategy = st.integers(0, 2 ** 31 - 1)


@settings(max_examples=60, deadline=None)
@given(seed=_stream_strategy,
       lateness=st.sampled_from([0, 3, 10, 1 << 40]),
       n_slices=st.integers(1, 6))
def test_core_matches_scalar_oracle(seed, lateness, n_slices):
    """Random per-conv-monotone streams with shuffled arrival, equal-ts
    runs and duplicate-idx copies (ts >= winner): engine emissions, late
    routes and dup/stale routes must equal the scalar oracle at every
    lateness and micro-batch slicing."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(rng.integers(1, 4)):
        conv = f"c{c}"
        n = int(rng.integers(1, 12))
        ts = np.cumsum(rng.integers(0, 4, n)) + int(rng.integers(0, 20))
        roles = rng.choice(["user", "tool", "assistant", "system"], n)
        rows += [(conv, i, roles[i], int(ts[i])) for i in range(n)]
    rng.shuffle(rows)
    # duplicate re-deliveries (same ts — the contract keeps ts monotone
    # with idx per conv; an INFLATED-ts dup violates it and is
    # conservatively stale-dropped, covered by the deterministic unit
    # test below) at random arrival positions, possibly different role
    for _ in range(int(rng.integers(0, 3))):
        if not rows:
            break
        conv, idx, role, ts = rows[int(rng.integers(0, len(rows)))]
        dup = (conv, idx, str(rng.choice(["user", "tool", "assistant"])),
               ts)
        rows.insert(int(rng.integers(0, len(rows) + 1)), dup)

    exp_matches, exp_wm_late, exp_routed = _pattern_oracle(rows, lateness)

    core = PatternShardCore(lateness_us=lateness)
    bounds = sorted(rng.integers(0, len(rows) + 1, n_slices - 1).tolist())
    bounds = [0] + bounds + [len(rows)]
    for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        if hi > lo:
            core.ingest(_tbl(rows[lo:hi]), seq=s)
    fin = core.finalize()
    from lauchy_ray.state.streaming import rows_list
    got_matches = {(r["conv_id"], r["start_idx"], r["end_idx"],
                    r["n_tool_turns"]) for r in rows_list(fin["emitted"])}
    assert got_matches == exp_matches
    late_rows = rows_list(fin["late"])
    got_wm_late = Counter((r["conv_id"], r["turn_idx"], r["ts"])
                          for r in late_rows if r["ts"] != -1)
    assert got_wm_late == Counter(exp_wm_late)
    n_routed = sum(1 for r in late_rows if r["ts"] == -1)
    assert n_routed == exp_routed
