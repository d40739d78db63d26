"""Streaming windowed HLL (13th engine) vs its scalar oracle, accuracy
against exact distinct, checkpoint-resume, and shard-count invariance."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray import oracle
from lauchy_ray.state.streaming import run_streaming_window_hll

HOUR_US = 3600 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000
N_SHARDS = 6
KEY = ["window_id"]
COLS = ["window_id", "est_users"]


@pytest.fixture(scope="module")
def streamed_h(fixture_dir):
    entity_codes = set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    est, late, wms = run_streaming_window_hll(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    return est, late, wms, entity_codes


def test_streaming_hll_matches_oracle(fixture_dir, streamed_h):
    est, late, wms, entity_codes = streamed_h
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(),
                                 entity_codes=entity_codes)
    exp_rows, exp_late, exp_wms = oracle.streaming_hll_rows(
        rows, HOUR_US, LATENESS_US, N_SHARDS)
    exp = pd.DataFrame(exp_rows).sort_values(KEY).reset_index(drop=True)
    got = est.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
    got_late = sorted(map(tuple, late[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    exp_late_s = sorted((r["conv_id"], r["turn_idx"], r["ts"])
                        for r in exp_late)
    assert got_late == exp_late_s
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_hll_accuracy_vs_exact(fixture_dir, streamed_h):
    """HLL estimates should land within the sketch's error envelope of
    the exact windowed distinct (m=1024 → ~3.2% std; allow 15%)."""
    from lauchy_ray.state.streaming import run_streaming_distinct

    est, _, _, entity_codes = streamed_h
    exact, _, _ = run_streaming_distinct(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    merged = est.merge(exact, on="window_id")
    n_col = [c for c in exact.columns if c != "window_id"][0]
    assert len(merged) > 0
    for _, r in merged.iterrows():
        exact_n = int(r[n_col])
        assert abs(int(r["est_users"]) - exact_n) <= max(2, 0.15 * exact_n)


def test_streaming_hll_shard_count_invariance(fixture_dir, streamed_h):
    """Registers are max-mergeable, so with ∞ lateness the estimates
    must be identical across shard counts."""
    _, _, _, entity_codes = streamed_h
    vk = {"entity_codes": sorted(entity_codes)}
    a, la, _ = run_streaming_window_hll(fixture_dir["turns"], HOUR_US,
                                        1 << 60, n_shards=1,
                                        validate_kwargs=vk)
    b, lb, _ = run_streaming_window_hll(fixture_dir["turns"], HOUR_US,
                                        1 << 60, n_shards=5,
                                        validate_kwargs=vk)
    assert len(la) == len(lb) == 0
    pd.testing.assert_frame_equal(
        a.sort_values(KEY).reset_index(drop=True)[COLS],
        b.sort_values(KEY).reset_index(drop=True)[COLS],
        check_dtype=False)


def test_streaming_hll_checkpoint_resume(fixture_dir, streamed_h,
                                         tmp_path):
    import os

    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import HllShardActor, _prepare_fragment

    est_ref, late_ref, wms_ref, entity_codes = streamed_h
    ckpt = str(tmp_path / "hckpt")
    vk = {"entity_codes": sorted(entity_codes)}
    fragments = list_fragments(fixture_dir["turns"])
    os.makedirs(ckpt, exist_ok=True)
    actors = [HllShardActor.remote(
        HOUR_US, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    vk_ref = ray.put(vk)
    for seq, frag in enumerate(fragments[:2]):
        refs = ray.get(_prepare_fragment.remote(frag, N_SHARDS, vk_ref))
        ray.get([actors[s].ingest.remote(r, seq)
                 for s, r in enumerate(refs) if r is not None])
    del actors  # "crash"

    est, late, wms = run_streaming_window_hll(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs=vk, checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        est.sort_values(KEY).reset_index(drop=True)[COLS],
        est_ref.sort_values(KEY).reset_index(drop=True)[COLS],
        check_dtype=False)
    assert sorted(wms) == sorted(wms_ref)
    assert (sorted(map(tuple, late[["conv_id", "turn_idx", "ts"]]
                       .itertuples(index=False)))
            == sorted(map(tuple, late_ref[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False))))
