"""Streaming operators vs the pure-Python oracle: dedup, sessionization,
tumbling/sliding window counts, watermark late-flagging (SURVEY.md §5.2/5.5)."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from lauchy_ray import oracle
from lauchy_ray.pipelines.validate import validated_stream
from lauchy_ray.sources.stream import read_stream
from lauchy_ray.stages.dedup import dedup_exact
from lauchy_ray.stages.sessionize import sessionize
from lauchy_ray.stages.watermark import flag_late, late_split, watermark_of
from lauchy_ray.stages.windows import window_counts

GAP_US = 30 * 60 * 1_000_000
HOUR_US = 3600 * 1_000_000


@pytest.fixture(scope="module")
def oracle_rows(fixture_dir):
    """Fixture rows in arrival order (fragment-sorted), ts as epoch-us."""
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    return turns.to_pylist()


@pytest.fixture(scope="module")
def entity_codes(fixture_dir):
    return set(pq.read_table(fixture_dir["entities"])["code"].to_pylist())


@pytest.fixture(scope="module")
def validated_oracle(oracle_rows, entity_codes):
    return oracle.validate_table(oracle_rows, entity_codes=entity_codes)


def test_read_stream_arrival_order(fixture_dir, oracle_rows):
    ds = read_stream(fixture_dir["turns"])
    df = ds.to_pandas().sort_values("arrival_idx").reset_index(drop=True)
    assert len(df) == len(oracle_rows)
    # arrival order reproduces the fragment-sorted row order exactly
    assert df["conv_id"].tolist() == [r["conv_id"] for r in oracle_rows]
    assert df["turn_idx"].tolist() == [r["turn_idx"] for r in oracle_rows]
    assert df["arrival_idx"].is_unique


def test_dedup_exact(fixture_dir, oracle_rows):
    expected = oracle.dedup_rows(oracle_rows)
    got = dedup_exact(read_stream(fixture_dir["turns"])).to_pandas()
    assert len(got) == len(expected)
    key = lambda df: sorted(zip(df["conv_id"], df["turn_idx"]))  # noqa: E731
    assert key(got) == sorted((r["conv_id"], r["turn_idx"]) for r in expected)
    # idempotent: dedup of deduped stream is a no-op
    assert dedup_exact(rd.from_pandas(got)).count() == len(expected)


def test_dedup_keep_first_is_by_arrival_not_content(ray_session):
    """When a retransmission DIFFERS from the original (corruption/update),
    keep-first must keep the FIRST ARRIVAL's content, not an arbitrary
    copy — the exactly-once contract is about arrival order."""
    import pyarrow as pa

    from lauchy_ray.schema import TURNS_SCHEMA
    t = pa.table({
        "conv_id": ["C1", "C1", "C1"],
        "turn_idx": pa.array([0, 1, 0], pa.int32()),
        "role": ["user"] * 3,
        "text": ["original", "other", "CORRUPTED RETRANSMIT"],
        "tool": ["TOOL_TEXT"] * 3,
        "ts": pa.array([10, 20, 30], pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)
    ds = rd.from_arrow(t).map_batches(
        lambda df: df.assign(arrival_idx=[0, 1, 2]), batch_format="pandas")
    out = dedup_exact(ds).to_pandas().sort_values("turn_idx")
    assert len(out) == 2
    assert out[out["turn_idx"] == 0]["text"].iloc[0] == "original"


def test_sessionize(fixture_dir, oracle_rows):
    expected = pd.DataFrame(oracle.sessionize_rows(oracle_rows, GAP_US))
    got = sessionize(read_stream(fixture_dir["turns"], arrival=False), GAP_US).to_pandas()
    got["start_ts"] = got["start_ts"].astype("int64") // 1000  # ns → us
    got["end_ts"] = got["end_ts"].astype("int64") // 1000
    key = ["conv_id", "session_id"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[expected.columns], expected, check_dtype=False)
    assert got["session_id"].max() > 0  # fixture really splits sessions


@pytest.mark.parametrize("slide_div", [1, 4])
def test_window_counts(fixture_dir, validated_oracle, entity_codes, slide_div):
    slide = HOUR_US // slide_div
    expected = pd.DataFrame(
        oracle.window_counts_rows(validated_oracle, HOUR_US, slide))
    vds = validated_stream(rd.read_parquet(fixture_dir["turns"]),
                           entity_codes=entity_codes)
    got = window_counts(vds, HOUR_US, slide).to_pandas()
    key = ["window_id", "role", "tool"]
    got = got.sort_values(key).reset_index(drop=True)
    expected = expected.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[expected.columns], expected, check_dtype=False)


def test_flag_late(fixture_dir, oracle_rows):
    lateness = 5 * 60 * 1_000_000
    expected = oracle.late_rows(oracle_rows, lateness)
    got = flag_late(read_stream(fixture_dir["turns"]), lateness).to_pandas()
    # align on per-conv arrival rank (robust to exact-duplicate rows)
    got = got.sort_values(["conv_id", "arrival_idx"]).reset_index(drop=True)
    got["rank"] = got.groupby("conv_id").cumcount()
    exp_df = pd.DataFrame(expected)
    exp_df["rank"] = exp_df.groupby("conv_id").cumcount()
    merged = got.merge(exp_df[["conv_id", "rank", "late"]].rename(
        columns={"late": "late_exp"}), on=["conv_id", "rank"])
    assert len(merged) == len(got)
    assert (merged["late"] == merged["late_exp"]).all()
    assert merged["late_exp"].sum() > 0  # fixture exercises the late path


def test_late_split_and_watermark(fixture_dir):
    on_time, late = late_split(read_stream(fixture_dir["turns"]))
    total = read_stream(fixture_dir["turns"]).count()
    n_on, n_late = on_time.count(), late.count()
    assert n_on + n_late == total and n_late > 0
    wm = watermark_of(read_stream(fixture_dir["turns"]))
    assert isinstance(wm, int) and wm > 1_700_000_000_000_000


def test_parallelism_invariance(small_fixture_dir):
    """Same input at different block counts ⇒ identical result row sets
    (SURVEY.md §5.3 — catches ordering/exactly-once bugs)."""
    results = []
    for nblocks in (2, 16):
        ds = rd.read_parquet(small_fixture_dir["turns"],
                             override_num_blocks=nblocks)
        vds = validated_stream(ds, concurrency=(1, 4))
        counts = window_counts(vds).to_pandas().sort_values(
            ["window_id", "role", "tool"]).reset_index(drop=True)
        results.append(counts)
    pd.testing.assert_frame_equal(results[0], results[1])


def test_dedup_salting_equivalence(fixture_dir):
    """Hot-key salting (groupby on (conv_id, turn_idx % salt)) must be a
    pure repartitioning: identical dedup result as the unsalted path."""
    import pyarrow.parquet as pq_
    import ray.data as rd_

    from lauchy_ray.stages.dedup import dedup_exact

    ds = rd_.read_parquet(fixture_dir["turns"])
    key = ["conv_id", "turn_idx"]
    plain = dedup_exact(ds, salt=1).to_pandas().sort_values(key).reset_index(drop=True)
    salted = dedup_exact(ds, salt=4).to_pandas().sort_values(key).reset_index(drop=True)
    assert list(salted.columns) == list(plain.columns)
    import pandas as pd_
    pd_.testing.assert_frame_equal(salted, plain)


def test_dedup_out_dir_guard_fresh_checkpoint(fixture_dir, tmp_path):
    """A fresh checkpoint_dir pointed at an out_dir holding parts from an
    UNRELATED run must refuse (round-2 advice), while a checkpoint dir
    with prior shard state resumes fine (covered by
    test_streaming_dedup_checkpoint_resume)."""
    import os

    import pytest as _pytest

    from lauchy_ray.state.streaming import run_streaming_dedup
    out = tmp_path / "dirty_out" / "shard-000"
    out.mkdir(parents=True)
    (out / "part-000000.parquet").write_bytes(b"stale")
    fresh_ckpt = tmp_path / "fresh_ckpt"
    fresh_ckpt.mkdir()
    with _pytest.raises(ValueError, match="interleave"):
        run_streaming_dedup(fixture_dir["turns"], str(tmp_path / "dirty_out"),
                            checkpoint_dir=str(fresh_ckpt))


def test_sessionize_hot_conv_documented_limit():
    """SURVEY §7.4 documented bound: a degenerate hot conversation lands
    in ONE bucket (a conv's turns must co-locate), so the bucket task
    holds the whole conv. Prove the vectorized bucket pass completes a
    10^7-turn single conversation — the stated envelope — with correct
    session structure (no per-row Python, one sort + one groupby)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from lauchy_ray.stages.sessionize import sessionize

    n = 10_000_000
    gap_us = 30 * 60 * 1_000_000
    # 100 sessions: turns 1s apart, a >gap jump every 100k turns
    ts = np.arange(n, dtype=np.int64) * 1_000_000
    ts += (np.arange(n, dtype=np.int64) // 100_000) * (2 * gap_us)
    t = pa.table({
        "conv_id": pa.array(["hot"] * n, pa.string()).dictionary_encode(),
        "turn_idx": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array(ts, pa.timestamp("us")),
    })
    out = sessionize(rd.from_arrow(t)).to_pandas()
    assert len(out) == 100
    assert out["n_turns"].sum() == n
    assert (out.sort_values("session_id")["n_turns"] == 100_000).all()
