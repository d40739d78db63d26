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
        out = core.finalize()["emitted"]
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
    assert [(r["conv_id"], r["turn_idx"]) for r in fin["late"]] == [("c", 0)]


def test_core_duplicate_idx_keeps_first():
    core = PatternShardCore(lateness_us=0)
    core.ingest(_tbl([("c", 0, "user", 10), ("c", 1, "tool", 20),
                      ("c", 1, "system", 25), ("c", 2, "assistant", 30)]),
                seq=0)
    out = core.finalize()["emitted"]
    assert out == [{"conv_id": "c", "start_idx": 0, "end_idx": 2,
                    "n_tool_turns": 1}]


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
