"""FunnelShardCore (14th engine): streaming ordered-stage conversation
funnel — the streaming face of stages/patterns.funnel_bucket_partial,
exactly-once, watermark-late-aware, micro-batch-slicing invariant."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray.stages.patterns import funnel_bucket_partial, funnel_merge
from lauchy_ray.state.streaming import (FunnelShardCore, rows_count,
                                        rows_list, run_streaming_funnel)

BIG = 1 << 40


def _tbl(rows):
    return pa.table({
        "conv_id": [r[0] for r in rows],
        "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
        "role": [r[2] for r in rows],
        "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
    })


def _counts(core: FunnelShardCore) -> dict:
    fin = core.finalize()
    out = {}
    for r in rows_list(fin["emitted"]):
        out[int(r["stage"])] = out.get(int(r["stage"]), 0) + int(r["n_convs"])
    return out


def test_core_basic_cascade():
    rows = [
        # c1: full funnel (user -> later tool -> later assistant)
        ("c1", 0, "user", 10), ("c1", 1, "system", 20),
        ("c1", 2, "tool", 30), ("c1", 3, "assistant", 40),
        # c2: tool BEFORE the first user — stage 2 not attained
        ("c2", 0, "tool", 10), ("c2", 1, "user", 20),
        ("c2", 2, "assistant", 30),
        # wait: c2 assistant after user but needs tool AFTER user first
        # c3: user only
        ("c3", 0, "user", 15),
        # c4: no user at all
        ("c4", 0, "assistant", 15),
    ]
    core = FunnelShardCore(lateness_us=BIG)
    core.ingest(_tbl(rows), seq=0)
    assert _counts(core) == {1: 3, 2: 1, 3: 1}


def test_core_matches_batch_kernel_any_slicing():
    """Random invariant-honoring streams, random micro-batch slicing,
    huge lateness: finalize counts == the batch funnel kernel."""
    rng = np.random.default_rng(11)
    for trial in range(6):
        rows = []
        n_convs = int(rng.integers(3, 12))
        for c in range(n_convs):
            t = 1000 * c
            for i in range(int(rng.integers(1, 15))):
                t += int(rng.integers(1, 50))
                role = rng.choice(["user", "tool", "assistant", "system"])
                rows.append((f"c{c}", i, str(role), t))
        rng.shuffle(rows)
        # rows arrive shuffled; huge lateness so nothing drops
        core = FunnelShardCore(lateness_us=BIG)
        bounds = sorted(rng.integers(0, len(rows) + 1, 3).tolist())
        bounds = [0] + bounds + [len(rows)]
        for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
            if hi > lo:
                core.ingest(_tbl(rows[lo:hi]), seq=s)
        got = _counts(core)
        df = pd.DataFrame({
            "conv_id": [r[0] for r in rows],
            "turn_idx": [r[1] for r in rows],
            "role": [r[2] for r in rows]})
        exp = funnel_merge(funnel_bucket_partial(df))
        exp_map = dict(zip(exp["stage"].astype(int),
                           exp["n_convs"].astype(int)))
        assert got == exp_map, f"trial={trial}"


def test_core_stale_dup_and_late_routing():
    core = FunnelShardCore(lateness_us=0)
    core.ingest(_tbl([("c", 0, "user", 100), ("c", 1, "tool", 200)]), seq=0)
    # duplicate of consumed idx 0 with inflated ts: stale-drop (ts=-1),
    # must not regress the cascade
    core.ingest(_tbl([("c", 0, "user", 300), ("c", 2, "assistant", 400)]),
                seq=1)
    # watermark-late row: ts below wm at arrival
    core.ingest(_tbl([("c", 3, "user", 10)]), seq=2)
    fin_late = rows_list(core.late)
    assert sum(1 for r in fin_late if r["ts"] == -1) == 1
    assert sum(1 for r in fin_late if r["ts"] == 10) == 1
    assert _counts(core) == {1: 1, 2: 1, 3: 1}


def test_core_checkpoint_resume(tmp_path):
    rows = [("c%d" % (i % 5), i // 5, ["user", "tool", "assistant"][i % 3],
             100 + 10 * i) for i in range(60)]
    ck = str(tmp_path / "f.ckpt")
    core = FunnelShardCore(lateness_us=50, checkpoint_path=ck)
    core.ingest(_tbl(rows[:30]), seq=0)
    core.ingest(_tbl(rows[30:]), seq=1)
    expect = _counts(core)

    core2 = FunnelShardCore(lateness_us=50, checkpoint_path=ck)
    # full replay: applied seqs skip, result identical
    core2.ingest(_tbl(rows[:30]), seq=0)
    core2.ingest(_tbl(rows[30:]), seq=1)
    assert _counts(core2) == expect


def test_runner_shard_count_invariance(ray_session, fixture_dir):
    entity_codes = sorted(set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist()))
    vk = {"entity_codes": entity_codes}
    f1, l1, _ = run_streaming_funnel(fixture_dir["turns"], n_shards=1,
                                     validate_kwargs=vk)
    f6, l6, _ = run_streaming_funnel(fixture_dir["turns"], n_shards=6,
                                     validate_kwargs=vk)
    pd.testing.assert_frame_equal(f1, f6)
    assert len(l1) == len(l6)
    assert set(f1["stage"]) == {1, 2, 3}
    # funnel monotone: later stages never exceed earlier ones
    n = f1.sort_values("stage")["n_convs"].to_numpy()
    assert n[0] >= n[1] >= n[2]


from hypothesis import given, settings
from hypothesis import strategies as st


def _funnel_oracle(rows, lateness):
    """Scalar mirror of FunnelShardCore on ONE shard: arrival-order scan
    with the row-level prefix-watermark rule (late iff ts ≤ wm computed
    over strictly-prior arrivals), duplicate (conv, idx) resolved to the
    (min ts, earliest arrival) copy, cascade over the surviving rows in
    idx order. Input must honor the bridge invariant (ts non-decreasing
    with idx per conv), under which stale drops only ever hit
    duplicates."""
    wm = -(1 << 62)
    acc = []
    n_wm_late = 0
    for a, (c, i, role, ts) in enumerate(rows):
        if ts <= wm:
            n_wm_late += 1
        else:
            acc.append((c, i, ts, a, role))
        wm = max(wm, ts - lateness)
    best = {}
    for c, i, ts, a, role in acc:
        k = (c, i)
        if k not in best or (ts, a) < best[k][:2]:
            best[k] = (ts, a, role)
    n_dup = len(acc) - len(best)
    by_conv: dict = {}
    for (c, i), (_, _, role) in sorted(best.items()):
        by_conv.setdefault(c, []).append(role)
    counts = [0, 0, 0]
    for roles in by_conv.values():
        stage = 0
        for r in roles:
            if stage == 0 and r == "user":
                stage = 1
            elif stage == 1 and r == "tool":
                stage = 2
            elif stage == 2 and r == "assistant":
                stage = 3
        for s in range(stage):
            counts[s] += 1
    return {s + 1: counts[s] for s in range(3)}, n_wm_late, n_dup


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_funnel_property_finite_lateness(data):
    """Random invariant-honoring streams, random duplication, random
    micro-batch slicing, FINITE lateness: finalize counts and late/dup
    routing must equal the scalar oracle exactly."""
    seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(seed)
    lateness = int(data.draw(st.sampled_from([0, 5, 25, 100])))
    n_convs = int(data.draw(st.integers(1, 6)))
    per_conv = []
    for c in range(n_convs):
        t = int(rng.integers(0, 40))
        turns = []
        for i in range(int(rng.integers(1, 12))):
            t += int(rng.integers(0, 30))  # ts non-decreasing with idx
            role = str(rng.choice(["user", "tool", "assistant", "system"]))
            turns.append((f"c{c}", i, role, t))
        per_conv.append(turns)
    # interleave conversations preserving per-conv order (arrival mix)
    rows = []
    cursors = [0] * n_convs
    while any(cursors[c] < len(per_conv[c]) for c in range(n_convs)):
        c = int(rng.integers(0, n_convs))
        if cursors[c] < len(per_conv[c]):
            rows.append(per_conv[c][cursors[c]])
            cursors[c] += 1
    # at-least-once duplicates (same conv/idx/role, same or inflated ts)
    for _ in range(int(rng.integers(0, 4))):
        r = rows[int(rng.integers(0, len(rows)))]
        rows.insert(int(rng.integers(0, len(rows) + 1)),
                    (r[0], r[1], r[2], r[3] + int(rng.integers(0, 10))))

    exp_counts, exp_wm_late, exp_dup = _funnel_oracle(rows, lateness)

    core = FunnelShardCore(lateness_us=lateness)
    bounds = sorted(rng.integers(0, len(rows) + 1, 3).tolist())
    bounds = [0] + bounds + [len(rows)]
    for s, (lo, hi) in enumerate(zip(bounds[:-1], bounds[1:])):
        if hi > lo:
            core.ingest(_tbl(rows[lo:hi]), seq=s)
    fin = core.finalize()   # finalize drains pending (can route dups)
    late_rows = rows_list(fin["late"])
    got = {}
    for r in rows_list(fin["emitted"]):
        got[int(r["stage"])] = got.get(int(r["stage"]), 0) \
            + int(r["n_convs"])
    assert got == exp_counts, f"seed={seed}"
    assert sum(1 for r in late_rows if r["ts"] != -1) == exp_wm_late
    assert sum(1 for r in late_rows if r["ts"] == -1) == exp_dup
