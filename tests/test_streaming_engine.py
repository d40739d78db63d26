"""Watermark-driven streaming engine vs its single-threaded oracle
(SURVEY.md §5.5: windows & watermark with shuffled arrival and late turns)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray import oracle
from lauchy_ray.state.streaming import run_streaming_window_counts

HOUR_US = 3600 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000
N_SHARDS = 6


@pytest.fixture(scope="module")
def streamed(fixture_dir):
    entity_codes = set(pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    wc, late, wms = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    return wc, late, wms, entity_codes


def _oracle(fixture_dir, entity_codes):
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=entity_codes)
    return oracle.streaming_window_counts_rows(rows, HOUR_US, LATENESS_US, N_SHARDS)


def test_streaming_matches_oracle(fixture_dir, streamed):
    wc, late, wms, entity_codes = streamed
    exp_counts, exp_late, exp_wms = _oracle(fixture_dir, entity_codes)
    exp_wc = pd.DataFrame(exp_counts)
    key = ["window_id", "role", "tool"]
    got = wc.sort_values(key).reset_index(drop=True)
    exp = exp_wc.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    # late rows as sets (cross-shard order is not defined)
    got_late = set(map(tuple, late[["conv_id", "turn_idx", "ts"]].itertuples(index=False)))
    exp_late_set = {(r["conv_id"], r["turn_idx"], r["ts"]) for r in exp_late}
    assert got_late == exp_late_set
    assert len(exp_late_set) > 0, "fixture must exercise the late path"
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_conservation(fixture_dir, streamed):
    """Every validated turn is either counted in exactly one emitted window
    or routed late: totals must add up."""
    wc, late, _, _ = streamed
    total_in = pq.ParquetDataset(fixture_dir["turns"]).read().num_rows
    counted = int(wc["n_valid"].sum() + wc["n_rejected"].sum())
    assert counted + len(late) == total_in


def test_streaming_sliding_matches_oracle(fixture_dir, streamed):
    """Sliding 1h/15min variant: engine == oracle, and every on-time turn
    lands in exactly width/slide windows."""
    _, _, _, entity_codes = streamed
    slide = HOUR_US // 4
    wc, late, wms = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        slide_us=slide, validate_kwargs={"entity_codes": sorted(entity_codes)})
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=entity_codes)
    exp_counts, exp_late, exp_wms = oracle.streaming_window_counts_rows(
        rows, HOUR_US, LATENESS_US, N_SHARDS, slide)
    key = ["window_id", "role", "tool"]
    got = wc.sort_values(key).reset_index(drop=True)
    exp = pd.DataFrame(exp_counts).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    assert sorted(wms) == sorted(exp_wms)
    # multiplicity bound: counted contributions ≤ 4× turns (closed-window
    # contributions of partially-late rows are dropped, so ≤, and > 3×
    # because most rows are fully on time)
    total = turns.num_rows
    counted = int(wc["n_valid"].sum() + wc["n_rejected"].sum())
    assert 3 * total < counted + 4 * len(late) <= 4 * total


def test_streaming_checkpoint_resume(fixture_dir, streamed, tmp_path):
    """Crash mid-stream with state checkpointing: feed only the first 2 of
    4 fragments (simulated crash: actors die with the session scope), then
    a FRESH set of actors restores the snapshots and replays the full
    sequence — results must equal an uncheckpointed full run exactly."""
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (
        WindowShardActor, _shard_tables, run_streaming_window_counts)
    from lauchy_ray.stages.validator import Validator

    wc_full, late_full, wms_full, codes = streamed
    ckpt = str(tmp_path / "ckpt")
    import os
    os.makedirs(ckpt)

    # phase 1: partial run (2 fragments), checkpointing, then "crash"
    frags = list_fragments(fixture_dir["turns"])
    actors = [WindowShardActor.remote(HOUR_US, LATENESS_US, None,
                                      os.path.join(ckpt, f"shard-{s}.ckpt"))
              for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        import pyarrow.compute as pc_
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq) for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    # phase 2: fresh run over ALL fragments with the same checkpoint dir
    wc, late, wms = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)}, checkpoint_dir=ckpt)
    key = ["window_id", "role", "tool"]
    pd.testing.assert_frame_equal(
        wc.sort_values(key).reset_index(drop=True),
        wc_full.sort_values(key).reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_streaming_torn_delta_log_repair(fixture_dir, streamed, tmp_path):
    """Crash mid-append leaves partial pickle bytes at the delta-log tail.
    A resumed actor must TRUNCATE the torn record before appending, or every
    delta written after the crash is silently dropped at read time
    (exactly-once violation; ADVICE r1). Simulate: checkpointed partial run,
    append garbage bytes to each shard's delta log, resume-replay — results
    must equal the uncheckpointed full run."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import WindowShardActor, _shard_tables

    wc_full, late_full, wms_full, codes = streamed
    ckpt = str(tmp_path / "ckpt_torn")
    os.makedirs(ckpt)

    frags = list_fragments(fixture_dir["turns"])
    actors = [WindowShardActor.remote(HOUR_US, LATENESS_US, None,
                                      os.path.join(ckpt, f"shard-{s}.ckpt"))
              for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq) for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    # torn append: partial pickle bytes at EOF of every delta log
    torn = 0
    for s in range(N_SHARDS):
        path = os.path.join(ckpt, f"shard-{s}.ckpt.deltas.pkl")
        if os.path.exists(path):
            with open(path, "ab") as f:
                f.write(b"\x80\x04\x95\xff\xff")  # pickle preamble, cut off
            torn += 1
    assert torn > 0, "fixture must have produced delta logs to tear"

    wc, late, wms = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)}, checkpoint_dir=ckpt)
    key = ["window_id", "role", "tool"]
    pd.testing.assert_frame_equal(
        wc.sort_values(key).reset_index(drop=True),
        wc_full.sort_values(key).reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_streaming_deterministic(fixture_dir, streamed):
    wc1, late1, _, codes = streamed
    wc2, late2, _ = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    key = ["window_id", "role", "tool"]
    pd.testing.assert_frame_equal(
        wc1.sort_values(key).reset_index(drop=True),
        wc2.sort_values(key).reset_index(drop=True))
    assert len(late1) == len(late2)


def _batch_window_counts(fixture_dir, entity_codes, slide_us=None):
    """Expected merge-policy result: EVERY validated row counted into all
    windows covering it, lateness irrelevant — a plain batch aggregation."""
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=entity_codes)
    slide = slide_us or HOUR_US
    n_per = HOUR_US // slide
    recs = []
    for r in rows:
        last = r["ts"] // slide
        for k in range(n_per):
            wid = last - k
            if wid >= 0:
                recs.append((wid, r["role"], r["tool"], bool(r["valid"])))
    df = pd.DataFrame(recs, columns=["window_id", "role", "tool", "ok"])
    g = df.groupby(["window_id", "role", "tool"], as_index=False).agg(
        n_valid=("ok", "sum"), n_rejected=("ok", lambda s: int((~s).sum())))
    g["n_valid"] = g["n_valid"].astype(int)
    return g


def test_streaming_merge_policy_equals_batch(fixture_dir, streamed):
    """late_policy="merge": late/partially-late contributions become
    correction rows, so the final rollup must equal the batch computation
    exactly — for tumbling AND sliding windows."""
    _, _, _, codes = streamed
    for slide in (None, HOUR_US // 4):
        wc, late, _ = run_streaming_window_counts(
            fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
            slide_us=slide, late_policy="merge",
            validate_kwargs={"entity_codes": sorted(codes)})
        exp = _batch_window_counts(fixture_dir, codes, slide)
        key = ["window_id", "role", "tool"]
        got = wc.sort_values(key).reset_index(drop=True)
        exp = exp.sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
        if slide is None:  # tumbling: fixture is known to produce late rows
            assert len(late) > 0  # still reported (merged, not dropped)


def test_streaming_merge_policy_checkpoint_resume(fixture_dir, streamed, tmp_path):
    """Merge-policy corrections ride the ordinary delta-log commit path, so
    crash-resume under merge converges to the same batch-equal answer."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import WindowShardActor, _shard_tables

    _, _, _, codes = streamed
    ckpt = str(tmp_path / "ckpt_merge")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [WindowShardActor.remote(HOUR_US, LATENESS_US, None,
                                      os.path.join(ckpt, f"shard-{s}.ckpt"),
                                      "merge")
              for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq) for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    wc, _, _ = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        late_policy="merge", checkpoint_dir=ckpt,
        validate_kwargs={"entity_codes": sorted(codes)})
    exp = _batch_window_counts(fixture_dir, codes)
    key = ["window_id", "role", "tool"]
    pd.testing.assert_frame_equal(
        wc.sort_values(key).reset_index(drop=True)[["window_id", "role", "tool",
                                                    "n_valid", "n_rejected"]],
        exp.sort_values(key).reset_index(drop=True), check_dtype=False)


def test_streaming_late_policy_config_guard(fixture_dir, streamed, tmp_path):
    """A checkpoint dir written under one late_policy must refuse replay
    under another (silent policy mixing would corrupt counts)."""
    import pytest as pytest_

    _, _, _, codes = streamed
    ckpt = str(tmp_path / "ckpt_guard")
    run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        late_policy="merge", checkpoint_dir=ckpt,
        validate_kwargs={"entity_codes": sorted(codes)})
    with pytest_.raises(ValueError):
        run_streaming_window_counts(
            fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
            late_policy="route", checkpoint_dir=ckpt,
            validate_kwargs={"entity_codes": sorted(codes)})


GAP_US = 30 * 60 * 1_000_000


def test_streaming_sessions_match_oracle(fixture_dir, streamed):
    """Streaming session windows (conv_id ts-gap close, watermark-driven
    emission) == the single-threaded per-shard oracle simulation."""
    from lauchy_ray.state.streaming import run_streaming_sessions

    _, _, _, codes = streamed
    sess, late, wms = run_streaming_sessions(
        fixture_dir["turns"], GAP_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=codes)
    exp_sess, exp_late, exp_wms = oracle.streaming_sessions_rows(
        rows, GAP_US, LATENESS_US, N_SHARDS)
    got = set(map(tuple, sess[["conv_id", "start_us", "end_us", "n_turns"]]
                  .itertuples(index=False)))
    exp = {(r["conv_id"], r["start_us"], r["end_us"], r["n_turns"])
           for r in exp_sess}
    assert got == exp
    assert len(late) == len(exp_late)
    assert sorted(wms) == sorted(exp_wms)
    # conservation: every row is in exactly one session or routed late
    assert int(sess["n_turns"].sum()) + len(late) == turns.num_rows


def test_streaming_sessions_infinite_lateness_equals_batch(fixture_dir, streamed):
    """With lateness → ∞ nothing is ever late, so streaming sessionization
    must equal the BATCH sessionize over the same rows exactly."""
    import ray.data as rd_

    from lauchy_ray.stages.sessionize import sessionize
    from lauchy_ray.state.streaming import run_streaming_sessions

    _, _, _, codes = streamed
    huge = 1 << 60
    sess, late, _ = run_streaming_sessions(
        fixture_dir["turns"], GAP_US, huge, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    assert len(late) == 0
    batch = sessionize(rd_.read_parquet(fixture_dir["turns"]), GAP_US).to_pandas()
    got = set(map(tuple, sess[["conv_id", "start_us", "end_us", "n_turns"]]
                  .itertuples(index=False)))
    exp = set(zip(batch["conv_id"],
                  batch["start_ts"].astype("int64") // 1000,
                  batch["end_ts"].astype("int64") // 1000,
                  batch["n_turns"]))
    assert got == exp


def test_streaming_sessions_checkpoint_resume(fixture_dir, streamed, tmp_path):
    """Session shard actors share the delta-log + snapshot commit protocol:
    crash after 2 fragments, resume-replay must equal the clean run."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import (
        SessionShardActor, _shard_tables, run_streaming_sessions)

    _, _, _, codes = streamed
    sess_full, late_full, wms_full = run_streaming_sessions(
        fixture_dir["turns"], GAP_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})

    ckpt = str(tmp_path / "ckpt_sess")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [SessionShardActor.remote(GAP_US, LATENESS_US,
                                       os.path.join(ckpt, f"shard-{s}.ckpt"))
              for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq) for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    sess, late, wms = run_streaming_sessions(
        fixture_dir["turns"], GAP_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)}, checkpoint_dir=ckpt)
    key = ["conv_id", "start_us", "end_us"]
    pd.testing.assert_frame_equal(
        sess.sort_values(key).reset_index(drop=True),
        sess_full.sort_values(key).reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_streaming_dedup_exactly_once(fixture_dir, streamed, tmp_path):
    """Streaming dedup-by-key: output holds exactly the FIRST arrival of
    every (conv_id, turn_idx) key, written exactly-once."""
    import glob
    import os

    import pyarrow.parquet as pq_

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import run_streaming_dedup

    _, _, _, codes = streamed
    out = str(tmp_path / "dedup_out")
    summary = run_streaming_dedup(
        fixture_dir["turns"], out, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})

    got = pq_.ParquetDataset(sorted(
        glob.glob(os.path.join(out, "shard-*", "part-*.parquet")))).read().to_pandas()
    # expected: first occurrence per key in global fragment order (all rows
    # of a conv land on one shard, in fragment order)
    frames = [pq_.read_table(f).to_pandas() for f in list_fragments(fixture_dir["turns"])]
    allrows = pd.concat(frames, ignore_index=True)
    allrows = allrows[allrows["text"].notna()]
    exp = allrows.drop_duplicates(subset=["conv_id", "turn_idx"], keep="first")
    assert summary["rows_out"] == len(got) == len(exp)
    key = ["conv_id", "turn_idx"]
    g = got.sort_values(key).reset_index(drop=True)
    x = exp.sort_values(key).reset_index(drop=True)
    # the streamed rows passed through the validator, which TIDIES text
    x = x.assign(text=x["text"].str.replace("Adamm", "Adam", regex=False))
    assert g["text"].tolist() == x["text"].tolist()
    assert (g["ts"].astype("int64") // 1000).tolist() == \
        (x["ts"].astype("datetime64[us]").astype("int64") // 1000).tolist()
    assert not got.duplicated(subset=key).any()


def test_streaming_dedup_checkpoint_resume(fixture_dir, streamed, tmp_path):
    """Crash after 2 fragments; resume-replay must produce byte-identical
    output parts (idempotent recompute + rename overwrite)."""
    import glob
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import (
        DedupShardActor, _shard_tables, run_streaming_dedup)

    _, _, _, codes = streamed
    clean_out = str(tmp_path / "dedup_clean")
    run_streaming_dedup(fixture_dir["turns"], clean_out, n_shards=N_SHARDS,
                        validate_kwargs={"entity_codes": sorted(codes)})

    crash_out = str(tmp_path / "dedup_crash")
    ckpt = str(tmp_path / "dedup_ckpt")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [DedupShardActor.remote(
        ["conv_id", "turn_idx"], 3600 * 1_000_000, 5 * 60 * 1_000_000,
        os.path.join(crash_out, f"shard-{s:03d}"),
        os.path.join(ckpt, f"shard-{s}.ckpt")) for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq) for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    run_streaming_dedup(fixture_dir["turns"], crash_out, n_shards=N_SHARDS,
                        validate_kwargs={"entity_codes": sorted(codes)},
                        checkpoint_dir=ckpt)
    clean = pq_.ParquetDataset(sorted(glob.glob(
        os.path.join(clean_out, "shard-*", "part-*.parquet")))).read().to_pandas()
    crashed = pq_.ParquetDataset(sorted(glob.glob(
        os.path.join(crash_out, "shard-*", "part-*.parquet")))).read().to_pandas()
    key = ["conv_id", "turn_idx"]
    pd.testing.assert_frame_equal(
        clean.sort_values(key).reset_index(drop=True),
        crashed.sort_values(key).reset_index(drop=True))


def test_streaming_dedup_retention_eviction(tmp_path):
    """A duplicate arriving beyond the retention horizon passes through
    (bounded-state tradeoff, documented); within the horizon it is
    dropped."""
    import ray

    from lauchy_ray.state.streaming import DedupShardActor

    a = DedupShardActor.remote(["conv_id", "turn_idx"],
                               retention_us=10_000_000, lateness_us=0)
    base = 1_700_000_000_000_000

    def tab(rows):
        return pa.table({
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int32()),
            "ts": pa.array([base + r[2] for r in rows], pa.timestamp("us")),
        })

    # key K first seen at t=0; push watermark far past retention with
    # enough filler keys to trigger the amortized sweep
    filler = [(f"C{i:03d}", 0, 1_000_000) for i in range(100)]
    n1 = ray.get(a.ingest.remote(tab([("K", 0, 0)] + filler)))
    assert n1 == 101
    n2 = ray.get(a.ingest.remote(tab([("K", 0, 30_000_000)])))  # dup, in horizon? wm=1s-0 → kept state; still seen → dropped
    assert n2 == 0
    # advance wm way beyond retention, forcing eviction of K
    far = [(f"D{i:03d}", 0, 200_000_000) for i in range(200)]
    ray.get(a.ingest.remote(tab(far)))
    n3 = ray.get(a.ingest.remote(tab([("K", 0, 190_000_000)])))
    assert n3 == 1  # original K evicted: the late duplicate passes through
    ray.kill(a)


def test_streaming_sessions_fastpath_oracle_at_scale(tmp_path):
    """The vectorized session fast path must equal the row-at-a-time
    oracle on a corpus large enough to exercise mid-batch closures and
    the per-conv slow/fast mix (the small fixture cannot: a 153-session
    divergence at 8M rows was caught only at scale)."""
    import pyarrow.parquet as pq_

    from lauchy_ray.datagen import write_fixture
    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import run_streaming_sessions

    paths = write_fixture(str(tmp_path / "fx"), n_turns=200_000, n_convs=800,
                          seed=13, n_fragments=16)
    codes = pq_.read_table(paths["entities"])["code"].to_pylist()
    sess, late, wms = run_streaming_sessions(
        paths["turns"], GAP_US, LATENESS_US, n_shards=4,
        validate_kwargs={"entity_codes": sorted(codes)})
    rows = []
    for f in list_fragments(paths["turns"]):
        t = pq_.read_table(f)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         t["ts"].cast(pa.int64()))
        rows.extend(oracle.validate_table(t.to_pylist(), entity_codes=set(codes)))
    exp_sess, exp_late, exp_wms = oracle.streaming_sessions_rows(
        rows, GAP_US, LATENESS_US, 4)
    got = set(map(tuple, sess[["conv_id", "start_us", "end_us", "n_turns"]]
                  .itertuples(index=False)))
    exp = {(r["conv_id"], r["start_us"], r["end_us"], r["n_turns"])
           for r in exp_sess}
    assert got == exp
    assert len(got) > 5000  # closures genuinely exercised
    assert len(late) == len(exp_late)
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_dedup_refuses_dirty_out_dir(fixture_dir, streamed, tmp_path):
    """A fresh (uncheckpointed) run into an out_dir that already holds
    parts must refuse — it would interleave two datasets."""
    from lauchy_ray.state.streaming import run_streaming_dedup

    _, _, _, codes = streamed
    out = str(tmp_path / "dedup_dirty")
    run_streaming_dedup(fixture_dir["turns"], out, n_shards=2,
                        validate_kwargs={"entity_codes": sorted(codes)})
    with pytest.raises(ValueError):
        run_streaming_dedup(fixture_dir["turns"], out, n_shards=2,
                            validate_kwargs={"entity_codes": sorted(codes)})


def test_streaming_distinct_matches_oracle(fixture_dir, streamed):
    """Streaming windowed COUNT(DISTINCT conv): engine == single-threaded
    per-shard oracle, and shard counts sum exactly (conv→shard is a
    partition)."""
    from lauchy_ray.state.streaming import run_streaming_distinct

    _, _, _, codes = streamed
    dc, late, wms = run_streaming_distinct(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=codes)
    exp_counts, exp_late, exp_wms = oracle.streaming_distinct_rows(
        rows, HOUR_US, LATENESS_US, N_SHARDS)
    got = dict(zip(dc["window_id"], dc["n_convs"]))
    exp = {r["window_id"]: r["n_convs"] for r in exp_counts}
    assert got == exp
    got_late = set(map(tuple,
                       late[["conv_id", "turn_idx", "ts"]]
                       .itertuples(index=False)))
    exp_late_set = {(r["conv_id"], r["turn_idx"], r["ts"]) for r in exp_late}
    assert got_late == exp_late_set
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_distinct_infinite_lateness_equals_batch(fixture_dir,
                                                           streamed):
    """With lateness → ∞ nothing routes late, so the streamed figure must
    equal the BATCH distinct-conv-per-window over the same rows."""
    from lauchy_ray.state.streaming import run_streaming_distinct

    _, _, _, codes = streamed
    dc, late, _ = run_streaming_distinct(
        fixture_dir["turns"], HOUR_US, 1 << 60, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    assert len(late) == 0
    turns = pq.ParquetDataset(fixture_dir["turns"]).read().to_pandas()
    turns = turns[turns["text"].notna()]
    wid = turns["ts"].astype("datetime64[us]").astype("int64") // HOUR_US
    exp = (pd.DataFrame({"window_id": wid, "conv": turns["conv_id"]})
           .groupby("window_id")["conv"].nunique())
    got = dict(zip(dc["window_id"], dc["n_convs"]))
    assert got == exp.to_dict()


def test_streaming_distinct_checkpoint_resume(fixture_dir, streamed,
                                              tmp_path):
    """Distinct shard actors share the delta-log + snapshot commit
    protocol: crash after 2 fragments, resume-replay == the clean run."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import (
        DistinctShardActor, _shard_tables, run_streaming_distinct)

    _, _, _, codes = streamed
    dc_full, late_full, wms_full = run_streaming_distinct(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})

    ckpt = str(tmp_path / "ckpt_distinct")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [DistinctShardActor.remote(
        HOUR_US, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq)
                 for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    dc, late, wms = run_streaming_distinct(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)},
        checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        dc.sort_values("window_id").reset_index(drop=True),
        dc_full.sort_values("window_id").reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_streaming_topk_matches_oracle(fixture_dir, streamed):
    """Streaming windowed top-k heavy hitters: engine == single-threaded
    per-shard oracle (local top-k emission + exact global merge)."""
    from lauchy_ray.state.streaming import run_streaming_topk

    _, _, _, codes = streamed
    K = 3
    tk, late, wms = run_streaming_topk(
        fixture_dir["turns"], HOUR_US, K, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(), entity_codes=codes)
    exp_topk, exp_late, exp_wms = oracle.streaming_topk_rows(
        rows, HOUR_US, K, LATENESS_US, N_SHARDS)
    key = ["window_id", "rk"]
    got = tk.sort_values(key).reset_index(drop=True)
    exp = pd.DataFrame(exp_topk).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    got_late = set(map(tuple,
                       late[["conv_id", "turn_idx", "ts"]]
                       .itertuples(index=False)))
    assert got_late == {(r["conv_id"], r["turn_idx"], r["ts"])
                        for r in exp_late}
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_topk_infinite_lateness_equals_batch(fixture_dir,
                                                       streamed):
    """With lateness → ∞ nothing routes late: the streamed top-k must
    equal the BATCH per-window top-k ((n DESC, conv ASC) tiebreak) over
    the same rows."""
    from lauchy_ray.state.streaming import run_streaming_topk

    _, _, _, codes = streamed
    K = 3
    tk, late, _ = run_streaming_topk(
        fixture_dir["turns"], HOUR_US, K, 1 << 60, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})
    assert len(late) == 0
    turns = pq.ParquetDataset(fixture_dir["turns"]).read().to_pandas()
    turns = turns[turns["text"].notna()]
    wid = turns["ts"].astype("datetime64[us]").astype("int64") // HOUR_US
    g = (pd.DataFrame({"window_id": wid, "conv_id": turns["conv_id"]})
         .groupby(["window_id", "conv_id"], as_index=False).size()
         .rename(columns={"size": "n"})
         .sort_values(["window_id", "n", "conv_id"],
                      ascending=[True, False, True], kind="stable"))
    exp = g.groupby("window_id", sort=True).head(K).reset_index(drop=True)
    exp["rk"] = exp.groupby("window_id", sort=False).cumcount() + 1
    got = tk.sort_values(["window_id", "rk"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


def test_streaming_topk_checkpoint_resume(fixture_dir, streamed, tmp_path):
    """Top-k shard actors share the delta-log + snapshot commit protocol:
    crash after 2 fragments, resume-replay == the clean run."""
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import (
        TopKShardActor, _shard_tables, run_streaming_topk)

    _, _, _, codes = streamed
    K = 3
    tk_full, late_full, wms_full = run_streaming_topk(
        fixture_dir["turns"], HOUR_US, K, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)})

    ckpt = str(tmp_path / "ckpt_topk")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [TopKShardActor.remote(
        HOUR_US, K, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq)
                 for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    tk, late, wms = run_streaming_topk(
        fixture_dir["turns"], HOUR_US, K, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(codes)},
        checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        tk.sort_values(["window_id", "rk"]).reset_index(drop=True),
        tk_full.sort_values(["window_id", "rk"]).reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_streaming_approx_topk_matches_oracle_and_bounds(fixture_dir,
                                                         streamed):
    """Bounded-memory Misra-Gries heavy hitters: engine == per-fragment
    single-threaded mirror, and the MG guarantee holds vs exact counts
    (n_est ≤ true ≤ n_est + err_bound)."""
    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import run_streaming_approx_topk

    _, _, _, codes = streamed
    K, CAP = 8, 8
    tk, late, wms = run_streaming_approx_topk(
        fixture_dir["turns"], HOUR_US, K, CAP, LATENESS_US,
        n_shards=N_SHARDS, validate_kwargs={"entity_codes": sorted(codes)})

    frag_rows = []
    for frag in list_fragments(fixture_dir["turns"]):
        t = pq.ParquetDataset(frag).read()
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         t["ts"].cast(pa.int64()))
        frag_rows.append(oracle.validate_table(t.to_pylist(),
                                               entity_codes=codes))
    exp_topk, exp_late, exp_wms = oracle.streaming_approx_topk_rows(
        frag_rows, HOUR_US, K, CAP, LATENESS_US, N_SHARDS)
    key = ["window_id", "rk"]
    got = tk.sort_values(key).reset_index(drop=True)
    exp = pd.DataFrame(exp_topk).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    assert sorted(wms) == sorted(exp_wms)

    # MG guarantee vs exact on-time counts (route semantics: exclude the
    # late rows both engines agree on)
    all_rows = [r for f in frag_rows for r in f]
    late_keys = {(r["conv_id"], r["turn_idx"], r["ts"]) for r in exp_late}
    exact: dict[tuple, int] = {}
    for r in all_rows:
        if (r["conv_id"], r["turn_idx"], r["ts"]) in late_keys:
            continue
        kk = (r["ts"] // HOUR_US, r["conv_id"])
        exact[kk] = exact.get(kk, 0) + 1
    assert len(tk) > 0
    for row in tk.itertuples(index=False):
        true = exact[(row.window_id, row.conv_id)]
        assert row.n_est <= true <= row.n_est + row.err_bound, row


def test_streaming_approx_topk_checkpoint_resume(fixture_dir, streamed,
                                                 tmp_path):
    import os

    import pyarrow.compute as pc_
    import pyarrow.parquet as pq_
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.stages.validator import Validator
    from lauchy_ray.state.streaming import (
        ApproxTopKShardActor, _shard_tables, run_streaming_approx_topk)

    _, _, _, codes = streamed
    K, CAP = 5, 12
    full, late_full, wms_full = run_streaming_approx_topk(
        fixture_dir["turns"], HOUR_US, K, CAP, LATENESS_US,
        n_shards=N_SHARDS, validate_kwargs={"entity_codes": sorted(codes)})

    ckpt = str(tmp_path / "ckpt_approx")
    os.makedirs(ckpt)
    frags = list_fragments(fixture_dir["turns"])
    actors = [ApproxTopKShardActor.remote(
        HOUR_US, K, CAP, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    v = Validator(entity_codes=sorted(codes))
    for seq, frag in enumerate(frags[:2]):
        t = pq_.read_table(frag)
        shards = _shard_tables(v(t.filter(pc_.is_valid(t["text"]))), N_SHARDS)
        ray.get([actors[s].ingest.remote(tab, seq)
                 for s, tab in shards.items()])
    for a in actors:
        ray.kill(a)

    tk, late, wms = run_streaming_approx_topk(
        fixture_dir["turns"], HOUR_US, K, CAP, LATENESS_US,
        n_shards=N_SHARDS, validate_kwargs={"entity_codes": sorted(codes)},
        checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        tk.sort_values(["window_id", "rk"]).reset_index(drop=True),
        full.sort_values(["window_id", "rk"]).reset_index(drop=True))
    assert len(late) == len(late_full)
    assert sorted(wms) == sorted(wms_full)


def test_mg_merge_guarantee_unit():
    """mg_merge: capacity respected, estimates undercount by ≤ total
    subtractions, heavy keys survive."""
    import numpy as np

    from lauchy_ray.state.streaming import mg_merge

    rng = np.random.default_rng(5)
    true: dict[int, int] = {}
    summary: dict[int, int] = {}
    sub_total = 0
    for _ in range(30):
        keys = rng.integers(0, 50, 200)
        batch: dict[int, int] = {}
        for kk in keys.tolist():
            batch[kk] = batch.get(kk, 0) + 1
            true[kk] = true.get(kk, 0) + 1
        summary, s = mg_merge(summary, batch, capacity=10)
        sub_total += s
        assert len(summary) <= 10
    for kk, est in summary.items():
        assert est <= true[kk] <= est + sub_total
    for kk, t in true.items():
        if t > sub_total:
            assert kk in summary, (kk, t, sub_total)
