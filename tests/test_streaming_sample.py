"""Streaming per-window bottom-k sample (11th engine) vs its scalar
oracle, batch equivalence under infinite lateness, shard-count
invariance (mergeability), and checkpoint-resume."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray import oracle
from lauchy_ray.state.streaming import run_streaming_sample

HOUR_US = 3600 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000
N_SHARDS = 6
K = 5
KEY = ["window_id", "pos"]
COLS = ["window_id", "pos", "conv_id", "turn_idx", "h"]


@pytest.fixture(scope="module")
def streamed_s(fixture_dir):
    entity_codes = set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    smp, late, wms = run_streaming_sample(
        fixture_dir["turns"], HOUR_US, K, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    return smp, late, wms, entity_codes


def _oracle(fixture_dir, entity_codes):
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(),
                                 entity_codes=entity_codes)
    return oracle.streaming_sample_rows(
        rows, HOUR_US, K, LATENESS_US, N_SHARDS)


def test_streaming_sample_matches_oracle(fixture_dir, streamed_s):
    smp, late, wms, entity_codes = streamed_s
    exp_rows, exp_late, exp_wms = _oracle(fixture_dir, entity_codes)
    exp = pd.DataFrame(exp_rows).sort_values(KEY).reset_index(drop=True)
    got = smp.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
    got_late = set(map(tuple,
                       late[["conv_id", "turn_idx", "ts"]].itertuples(
                           index=False)))
    exp_late_set = {(r["conv_id"], r["turn_idx"], r["ts"])
                    for r in exp_late}
    assert got_late == exp_late_set
    assert len(exp_late_set) > 0, "fixture must exercise the late path"
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_sample_shard_count_invariance(fixture_dir, streamed_s):
    """Mergeability: the emitted sample must be independent of shard
    count EXCEPT through the late rule — run with 1 shard and infinite
    lateness on both sides to isolate the sample itself."""
    _, _, _, entity_codes = streamed_s
    vk = {"entity_codes": sorted(entity_codes)}
    a, la, _ = run_streaming_sample(fixture_dir["turns"], HOUR_US, K,
                                    1 << 60, n_shards=1,
                                    validate_kwargs=vk)
    b, lb, _ = run_streaming_sample(fixture_dir["turns"], HOUR_US, K,
                                    1 << 60, n_shards=5,
                                    validate_kwargs=vk)
    assert len(la) == len(lb) == 0
    pd.testing.assert_frame_equal(
        a.sort_values(KEY).reset_index(drop=True)[COLS],
        b.sort_values(KEY).reset_index(drop=True)[COLS],
        check_dtype=False)


def test_streaming_sample_equals_batch(fixture_dir, streamed_s):
    """Infinite lateness ⇒ streaming sample ≡ the batch window_sample
    stage over the same validated stream."""
    import ray.data as rd

    from lauchy_ray.pipelines.validate import validated_stream
    from lauchy_ray.stages.windows import window_sample

    _, _, _, entity_codes = streamed_s
    smp, late, _ = run_streaming_sample(
        fixture_dir["turns"], HOUR_US, K, 1 << 60, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    assert len(late) == 0
    turns = rd.read_parquet(fixture_dir["turns"])
    vds = validated_stream(turns, entity_codes=sorted(entity_codes))
    exp = (window_sample(vds, HOUR_US, K).to_pandas()
           .sort_values(KEY).reset_index(drop=True))
    got = smp.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)


def test_streaming_sample_checkpoint_resume(fixture_dir, streamed_s,
                                            tmp_path):
    import os

    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (SampleShardActor,
                                            _prepare_fragment)

    smp_ref, late_ref, wms_ref, entity_codes = streamed_s
    ckpt = str(tmp_path / "sckpt")
    vk = {"entity_codes": sorted(entity_codes)}
    fragments = list_fragments(fixture_dir["turns"])
    assert len(fragments) >= 3
    os.makedirs(ckpt, exist_ok=True)
    actors = [SampleShardActor.remote(
        HOUR_US, K, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    vk_ref = ray.put(vk)
    for seq, frag in enumerate(fragments[:2]):
        refs = ray.get(_prepare_fragment.remote(frag, N_SHARDS, vk_ref))
        ray.get([actors[s].ingest.remote(r, seq)
                 for s, r in enumerate(refs) if r is not None])
    del actors  # "crash"

    smp, late, wms = run_streaming_sample(
        fixture_dir["turns"], HOUR_US, K, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs=vk, checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        smp.sort_values(KEY).reset_index(drop=True)[COLS],
        smp_ref.sort_values(KEY).reset_index(drop=True)[COLS],
        check_dtype=False)
    assert sorted(wms) == sorted(wms_ref)
    got_late = sorted(map(tuple, late[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    exp_late = sorted(map(tuple, late_ref[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    assert got_late == exp_late


def test_streaming_sample_duplicate_arrivals_are_set_semantics():
    """Feeding the same on-time row twice must not occupy two sample
    slots (exact-row dedup in the merge)."""
    from lauchy_ray.state.streaming import SampleShardCore

    core = SampleShardCore(100, 3, 0)
    t = pa.table({
        "conv_id": ["c1", "c1", "c1", "c2"],
        "turn_idx": pa.array([1, 1, 2, 7], pa.int64()),
        "role": ["user"] * 4,
        "text": ["x"] * 4,
        "tool": [""] * 4,
        "ts": pa.array([10, 10, 11, 12], pa.int64()),
        "valid": [True] * 4,
    })
    core.ingest(t, None)
    out = core.finalize()
    rows = [r for b in out["emitted"]
            for r in pd.DataFrame(b).to_dict("records")]
    keys = {(r["conv_id"], r["turn_idx"]) for r in rows}
    assert keys == {("c1", 1), ("c1", 2), ("c2", 7)}
    assert len(rows) == 3
