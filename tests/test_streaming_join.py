"""Streaming interval-join engine (JoinShardCore): batch equivalence over
the validated fixture stream, shard/slicing invariance, complement-of-
absence identity, checkpoint resume, and a hypothesis property test
against a scalar row-at-a-time oracle (random streams, duplicates,
equal-ts runs, role interleavings)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lauchy_ray.state.streaming import JoinShardCore, run_streaming_join

BIG_LATENESS = 1 << 40
WINDOW = 30 * 60 * 1_000_000


def _codes_kwargs(fixture_dir):
    codes = sorted(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    return {"entity_codes": codes}


def _batch_pairs(fixture_dir, window=WINDOW):
    """Ground truth over the SAME prepared stream: every (user,
    assistant) pair per conv with 0 < a_ts − u_ts ≤ window, dedup
    keep-first on (conv, turn_idx) across roles."""
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
        a = g[g["role"] == "assistant"]
        u = g[g["role"] == "user"]
        for ui, ut in zip(u["turn_idx"], u["ts_us"]):
            m = (a["ts_us"] > ut) & (a["ts_us"] <= ut + window)
            for ai, at in zip(a.loc[m, "turn_idx"], a.loc[m, "ts_us"]):
                out.add((conv, int(ui), int(ai), int(ut), int(at)))
    return out


def _as_set(df):
    return set(map(tuple, df[["conv_id", "u_idx", "a_idx", "u_ts", "a_ts"]]
                   .itertuples(index=False)))


@pytest.fixture(scope="module")
def join_truth(fixture_dir):
    truth = _batch_pairs(fixture_dir)
    assert truth, "fixture must contain answered user turns"
    return truth


def test_streaming_equals_batch(fixture_dir, join_truth):
    got, late, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=4, validate_kwargs=_codes_kwargs(fixture_dir))
    assert (late["ts"] == -1).all()      # only duplicate routes
    assert _as_set(got) == join_truth
    assert (got["gap_us"] == got["a_ts"] - got["u_ts"]).all()
    assert (got["gap_us"] > 0).all() and (got["gap_us"] <= WINDOW).all()


def test_shard_count_invariance(fixture_dir, join_truth):
    for n_shards in (1, 7):
        got, _, _ = run_streaming_join(
            fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
            n_shards=n_shards, validate_kwargs=_codes_kwargs(fixture_dir))
        assert _as_set(got) == join_truth


def test_join_complements_absence(fixture_dir, join_truth):
    """join ∪ absence partitions the kept user turns: a user turn either
    has ≥1 pair within the window or exactly one absence emission."""
    from lauchy_ray.state.streaming import run_streaming_absence
    vk = _codes_kwargs(fixture_dir)
    pairs, _, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=4, validate_kwargs=vk)
    absent, _, _ = run_streaming_absence(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=4, validate_kwargs=vk)
    joined_u = set(map(tuple, pairs[["conv_id", "u_idx"]]
                       .itertuples(index=False)))
    absent_u = set(map(tuple, absent[["conv_id", "turn_idx"]]
                       .itertuples(index=False)))
    assert not (joined_u & absent_u)
    truth_u = {(c, u) for c, u, _, _, _ in join_truth}
    assert joined_u == truth_u


def test_checkpoint_resume_identical(fixture_dir, join_truth, tmp_path):
    ck = str(tmp_path / "ck")
    got, _, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=2, validate_kwargs=_codes_kwargs(fixture_dir),
        checkpoint_dir=ck)
    again, _, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=2, validate_kwargs=_codes_kwargs(fixture_dir),
        checkpoint_dir=ck)
    assert _as_set(got) == join_truth
    assert _as_set(again) == join_truth
    assert len(again) == len(got)


# ------------------------------------------- hypothesis vs scalar oracle

NEG = -(1 << 62)


def _join_oracle(rows, lateness, window):
    """(pair set, wm-late list, dup-route count) for arrival-ordered rows
    (conv, idx, role, ts) under the prefix-wm late rule, keep-first
    duplicates ACROSS roles, pairs = 0 < a_ts − u_ts ≤ window."""
    wm = NEG
    wm_late, acc = [], []
    for conv, idx, role, ts in rows:
        if ts <= wm:
            wm_late.append((conv, idx, ts))
        else:
            acc.append((conv, idx, role, ts))
        wm = max(wm, ts - lateness)
    seen = set()
    users, assists = [], []
    dup = 0
    for conv, idx, role, ts in acc:
        if role not in ("user", "assistant"):
            continue
        if (conv, idx) in seen:
            dup += 1
            continue
        seen.add((conv, idx))
        (users if role == "user" else assists).append((conv, idx, ts))
    pairs = set()
    for cu, ui, ut in users:
        for ca, ai, at in assists:
            if cu == ca and ut < at <= ut + window:
                pairs.add((cu, ui, ai, ut, at))
    return pairs, wm_late, dup


def _run_core(rows, lateness, window, n_slices):
    core = JoinShardCore(window, lateness)
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
    got = set()
    for b in fin["emitted"]:   # columnar emission blocks
        got |= set(zip(b["conv_id"].tolist(), b["u_idx"].tolist(),
                       b["a_idx"].tolist(), b["u_ts"].tolist(),
                       b["a_ts"].tolist()))
    from lauchy_ray.state.streaming import rows_list
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
        for i in rng.choice(n, size=min(2, n), replace=False):
            rows.append((conv, int(i), str(roles[i]), int(ts[i])))
    rng.shuffle(rows)
    exp = _join_oracle(rows, lateness, window)
    got = _run_core(rows, lateness, window, n_slices)
    assert got[0] == exp[0]
    assert sorted(got[1]) == sorted(exp[1])
    assert got[2] == exp[2]


# ------------------------------------------------- spill-to-parts path

def test_spill_out_dir_equals_in_memory(fixture_dir, join_truth, tmp_path):
    """out_dir mode: pairs land as per-shard (shard, seq)-deterministic
    parquet parts, the runner returns a lazy Dataset over them, and the
    result is identical to the in-memory mode (round-5 scale fix)."""
    import glob
    import os
    vk = _codes_kwargs(fixture_dir)
    out_dir = str(tmp_path / "parts")
    ds, late, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=4, validate_kwargs=vk, out_dir=out_dir)
    got = ds.to_pandas()
    assert _as_set(got) == join_truth
    assert (got["gap_us"] == got["a_ts"] - got["u_ts"]).all()
    assert (late["ts"] == -1).all()
    assert glob.glob(os.path.join(out_dir, "shard-*", "part-*.parquet"))
    # dirty-dir guard: a fresh (non-resuming) run must refuse to append
    with pytest.raises(ValueError, match="interleave"):
        run_streaming_join(
            fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
            n_shards=4, validate_kwargs=vk, out_dir=out_dir)


def test_spill_checkpoint_resume(fixture_dir, join_truth, tmp_path):
    """Crash after two fragments, resume into the SAME out_dir +
    checkpoint_dir: applied seqs are skipped, their parts are kept, and
    the final part set equals a clean run's pairs exactly (no dups)."""
    import os

    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (JoinShardActor,
                                            _prepare_fragment)

    vk = _codes_kwargs(fixture_dir)
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "parts")
    n_shards = 3
    fragments = list_fragments(fixture_dir["turns"])
    os.makedirs(ck, exist_ok=True)
    actors = [JoinShardActor.remote(
        WINDOW, BIG_LATENESS, os.path.join(ck, f"shard-{s}.ckpt"),
        os.path.join(out_dir, f"shard-{s:03d}"))
        for s in range(n_shards)]
    vk_ref = ray.put(vk)
    for seq, frag in enumerate(fragments[:2]):
        refs = ray.get(_prepare_fragment.remote(frag, n_shards, vk_ref))
        ray.get([actors[s].ingest.remote(r, seq)
                 for s, r in enumerate(refs) if r is not None])
    del actors  # "crash"

    ds, late, _ = run_streaming_join(
        fixture_dir["turns"], WINDOW, lateness_us=BIG_LATENESS,
        n_shards=n_shards, validate_kwargs=vk,
        checkpoint_dir=ck, out_dir=out_dir)
    assert _as_set(ds.to_pandas()) == join_truth
    assert (late["ts"] == -1).all()
