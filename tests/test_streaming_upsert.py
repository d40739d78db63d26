"""Streaming upsert / KTable compaction (12th engine) vs its scalar
oracle, correction semantics, property coverage, checkpoint-resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lauchy_ray import oracle
from lauchy_ray.state.streaming import UpsertShardCore, run_streaming_upsert

LATENESS_US = 5 * 60 * 1_000_000
N_SHARDS = 6
KEY = ["conv_id", "turn_idx"]
COLS = ["conv_id", "turn_idx", "ts", "valid"]


@pytest.fixture(scope="module")
def streamed_u(fixture_dir):
    entity_codes = set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    up, late, wms = run_streaming_upsert(
        fixture_dir["turns"], LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    return up, late, wms, entity_codes


def test_streaming_upsert_matches_oracle(fixture_dir, streamed_u):
    up, late, wms, entity_codes = streamed_u
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(),
                                 entity_codes=entity_codes)
    exp_rows, exp_late, exp_wms = oracle.streaming_upsert_rows(
        rows, LATENESS_US, N_SHARDS)
    exp = pd.DataFrame(exp_rows).sort_values(KEY).reset_index(drop=True)
    got = up.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
    got_late = sorted(map(tuple, late[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    exp_late_s = sorted((r["conv_id"], r["turn_idx"], r["ts"])
                        for r in exp_late)
    assert got_late == exp_late_s
    assert sorted(wms) == sorted(exp_wms)
    assert len(got) > 0


def test_upsert_correction_semantics():
    """A newer-ts version replaces; an equal-ts later arrival replaces;
    an older-ts on-time row does NOT replace."""
    core = UpsertShardCore(1 << 60)  # infinite lateness: nothing late

    def t(rows):
        return pa.table({
            "conv_id": pa.array([r[0] for r in rows]),
            "turn_idx": pa.array([r[1] for r in rows], pa.int64()),
            "role": pa.array(["user"] * len(rows)),
            "text": pa.array(["x"] * len(rows)),
            "tool": pa.array([""] * len(rows)),
            "ts": pa.array([r[2] for r in rows], pa.int64()),
            "valid": pa.array([r[3] for r in rows]),
        })

    core.ingest(t([("c", 1, 100, True), ("c", 2, 100, True)]), None)
    core.ingest(t([("c", 1, 200, False)]), None)   # newer → replaces
    core.ingest(t([("c", 2, 100, False)]), None)   # equal ts → later wins
    core.ingest(t([("c", 1, 50, True)]), None)     # older → ignored
    out = core.finalize()
    rows = {(r["conv_id"], r["turn_idx"]): (r["ts"], r["valid"])
            for b in out["emitted"]
            for r in pd.DataFrame(b).to_dict("records")}
    assert rows == {("c", 1): (200, False), ("c", 2): (100, False)}
    assert out["state_keys"] == 2


_urow = st.tuples(st.sampled_from(["CA", "CB"]), st.integers(0, 5),
                  st.integers(0, 300), st.booleans())


@settings(max_examples=50, deadline=None)
@given(rows=st.lists(_urow, min_size=1, max_size=60),
       n_batches=st.integers(1, 4),
       lateness=st.sampled_from([0, 40, 1000]))
def test_upsert_core_matches_oracle_property(rows, n_batches, lateness):
    core = UpsertShardCore(lateness)
    bounds = [round(i * len(rows) / n_batches)
              for i in range(n_batches + 1)]
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        if chunk:
            core.ingest(pa.table({
                "conv_id": pa.array([r[0] for r in chunk]),
                "turn_idx": pa.array([r[1] for r in chunk], pa.int64()),
                "role": pa.array(["user"] * len(chunk)),
                "text": pa.array(["x"] * len(chunk)),
                "tool": pa.array([""] * len(chunk)),
                "ts": pa.array([r[2] for r in chunk], pa.int64()),
                "valid": pa.array([r[3] for r in chunk]),
            }), None)
    got = core.finalize()
    dict_rows = [{"conv_id": r[0], "turn_idx": r[1], "ts": r[2],
                  "valid": r[3]} for r in rows]
    exp_rows, exp_late, _ = oracle.streaming_upsert_rows(
        dict_rows, lateness, 1)
    got_map = {(r["conv_id"], r["turn_idx"]): (r["ts"], bool(r["valid"]))
               for b in got["emitted"]
               for r in pd.DataFrame(b).to_dict("records")}
    exp_map = {(r["conv_id"], r["turn_idx"]): (r["ts"], r["valid"])
               for r in exp_rows}
    assert got_map == exp_map
    from lauchy_ray.state.streaming import rows_count
    assert rows_count(got["late"]) == len(exp_late)


def test_streaming_upsert_checkpoint_resume(fixture_dir, streamed_u,
                                            tmp_path):
    import os

    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (UpsertShardActor,
                                            _prepare_fragment)

    up_ref, late_ref, wms_ref, entity_codes = streamed_u
    ckpt = str(tmp_path / "uckpt")
    vk = {"entity_codes": sorted(entity_codes)}
    fragments = list_fragments(fixture_dir["turns"])
    os.makedirs(ckpt, exist_ok=True)
    actors = [UpsertShardActor.remote(
        LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    vk_ref = ray.put(vk)
    for seq, frag in enumerate(fragments[:2]):
        refs = ray.get(_prepare_fragment.remote(frag, N_SHARDS, vk_ref))
        ray.get([actors[s].ingest.remote(r, seq)
                 for s, r in enumerate(refs) if r is not None])
    del actors  # "crash"

    up, late, wms = run_streaming_upsert(
        fixture_dir["turns"], LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs=vk, checkpoint_dir=ckpt)
    pd.testing.assert_frame_equal(
        up.sort_values(KEY).reset_index(drop=True)[COLS],
        up_ref.sort_values(KEY).reset_index(drop=True)[COLS],
        check_dtype=False)
    assert sorted(wms) == sorted(wms_ref)
    assert (sorted(map(tuple, late[KEY + ["ts"]].itertuples(index=False)))
            == sorted(map(tuple,
                          late_ref[KEY + ["ts"]].itertuples(index=False))))


def test_upsert_out_dir_equals_in_memory(fixture_dir, streamed_u,
                                         tmp_path):
    """out_dir mode: the compacted view spills as per-shard
    latest.parquet, returned as a lazy Dataset — identical content to
    the driver-DataFrame mode (round-5 scale fix)."""
    up_ref, late_ref, wms_ref, entity_codes = streamed_u
    ds, late, wms = run_streaming_upsert(
        fixture_dir["turns"], LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)},
        out_dir=str(tmp_path / "up"))
    got = ds.to_pandas().sort_values(KEY).reset_index(drop=True)
    exp = up_ref.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS],
                                  check_dtype=False)
    assert sorted(wms) == sorted(wms_ref)
    assert (sorted(map(tuple, late[KEY + ["ts"]].itertuples(index=False)))
            == sorted(map(tuple,
                          late_ref[KEY + ["ts"]].itertuples(index=False))))


def test_upsert_restores_pre_log_structured_snapshot():
    """A snapshot written by the old single-sorted-array layout (same
    config tuple) must migrate into the run list on restore."""
    old_names = pd.Index(["cA", "cB"])
    k = np.array([(0 << 34) | 1, (1 << 34) | 2], np.int64)
    t = np.array([100, 200], np.int64)
    v = np.array([True, False])
    s = np.array([0, 1], np.int64)
    core = UpsertShardCore(1 << 60)
    core._restore_core((old_names, k, t, v, s, 2))
    assert core._arrivals == 2 and len(core._runs) == 1
    # a newer correction for cA/1 must still replace the restored row
    core.ingest(pa.table({
        "conv_id": pa.array(["cA"]),
        "turn_idx": pa.array([1], pa.int64()),
        "role": pa.array(["user"]), "text": pa.array(["x"]),
        "tool": pa.array([""]), "ts": pa.array([150], pa.int64()),
        "valid": pa.array([False]),
    }), None)
    rows = {(r["conv_id"], r["turn_idx"]): (r["ts"], bool(r["valid"]))
            for b in core.finalize()["emitted"]
            for r in pd.DataFrame(b).to_dict("records")}
    assert rows == {("cA", 1): (150, False), ("cB", 2): (200, False)}
