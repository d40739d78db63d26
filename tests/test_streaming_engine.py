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
