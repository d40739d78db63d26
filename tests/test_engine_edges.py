"""Edge cases from the round-4 review: null roles / null conv ids
through the arrow-native decode, name-index compaction boundedness,
dedup checkpoint migration from the pre-columnar format, and negative
turn_idx rejection."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from lauchy_ray.state.streaming import (AbsenceShardCore, DedupShardCore,
                                        JoinShardCore)

W = 100


def _tab(rows):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows], pa.string()),
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": pa.array([r[2] for r in rows], pa.string()),
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })


def test_null_role_and_conv_do_not_crash():
    """Null role = neither user nor assistant (the old object-compare
    behavior); null conv_id keys as "" deterministically."""
    rows = [("c1", 0, "user", 10), (None, 1, "assistant", 11),
            ("c1", 2, None, 12), ("c1", 3, "assistant", 13)]
    for cls in (AbsenceShardCore, JoinShardCore):
        core = cls(W, 1 << 40)
        core.ingest(_tab(rows))
        fin = core.finalize()
        if cls is AbsenceShardCore:
            # user turn 0 answered by assistant at 13 (None-role row 12
            # is ignored; null-conv assistant belongs to conv "")
            assert fin["emitted"] == []
        else:
            blocks = fin["emitted"]
            pairs = {(b["conv_id"][i], b["u_idx"][i], b["a_idx"][i])
                     for b in blocks for i in range(len(b["u_idx"]))}
            assert pairs == {("c1", 0, 3)}


def test_negative_turn_idx_rejected():
    for cls in (AbsenceShardCore, JoinShardCore):
        core = cls(W, 0)
        with pytest.raises(ValueError, match="turn_idx"):
            core.ingest(_tab([("c1", -1, "user", 10)]))
    core = DedupShardCore(["conv_id", "turn_idx"], 10, 0)
    with pytest.raises(ValueError, match="turn_idx"):
        core.ingest(_tab([("c1", -1, "user", 10)]))


def test_dedup_name_index_compacts():
    """One-turn convs with tiny retention: the persistent name index
    must stay bounded by the live horizon, not stream lifetime."""
    core = DedupShardCore(["conv_id", "turn_idx"], retention_us=10,
                          lateness_us=0)
    for b in range(80):
        rows = [(f"c{b}_{i}", 0, "user", b * 1000 + i)
                for i in range(100)]
        core.ingest(_tab(rows))
    # 8000 lifetime convs; retention 10us keeps ≤ ~1 batch live
    assert len(core._names) <= 1024 + 400
    assert core._n_state() <= 200


def test_absence_name_index_compacts():
    core = AbsenceShardCore(window_us=5, lateness_us=0)
    for b in range(80):
        rows = [(f"c{b}_{i}", 0, "user", b * 1000 + i)
                for i in range(100)]
        core.ingest(_tab(rows))
    assert len(core._names) <= 1024 + 400
    # emissions still one per unanswered user turn so far
    fin = core.finalize()
    from lauchy_ray.state.streaming import rows_count
    assert rows_count(fin["emitted"]) == 8000


def test_dedup_restores_pre_columnar_checkpoint_state():
    """A generic-format core snapshot (the pre-fast-path layout) must
    MIGRATE into the packed arrays — not silently restore into the
    unused dict and re-accept every seen key."""
    core = DedupShardCore(["conv_id", "turn_idx"], 1 << 40, 0)
    old = ({("a", 1): 100, ("a", 2): 101, ("b", 1): 102}, 64)
    core._restore_core(old)
    out = core.ingest(_tab([("a", 1, "user", 200),   # dup of migrated
                            ("b", 2, "user", 201)]))  # new
    assert out == 1
    assert core._n_state() == 4
