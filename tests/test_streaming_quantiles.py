"""Streaming exact windowed quantiles (10th engine) vs its scalar oracle,
conservation, infinite-lateness ≡ batch stage, and checkpoint-resume."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from lauchy_ray import oracle
from lauchy_ray.state.streaming import run_streaming_quantiles

HOUR_US = 3600 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000
N_SHARDS = 6
KEY = ["window_id", "role"]
COLS = ["window_id", "role", "n_valid", "n_rejected", "p50", "p90", "p99"]


@pytest.fixture(scope="module")
def streamed_q(fixture_dir):
    entity_codes = set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist())
    qdf, late, wms = run_streaming_quantiles(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    return qdf, late, wms, entity_codes


def _oracle(fixture_dir, entity_codes):
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    rows = oracle.validate_table(turns.to_pylist(),
                                 entity_codes=entity_codes)
    return oracle.streaming_quantiles_rows(
        rows, HOUR_US, LATENESS_US, N_SHARDS)


def test_streaming_quantiles_match_oracle(fixture_dir, streamed_q):
    qdf, late, wms, entity_codes = streamed_q
    exp_cells, exp_late, exp_wms = _oracle(fixture_dir, entity_codes)
    exp = pd.DataFrame(exp_cells).sort_values(KEY).reset_index(drop=True)
    got = qdf.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
    got_late = set(map(tuple,
                       late[["conv_id", "turn_idx", "ts"]].itertuples(
                           index=False)))
    exp_late_set = {(r["conv_id"], r["turn_idx"], r["ts"])
                    for r in exp_late}
    assert got_late == exp_late_set
    assert len(exp_late_set) > 0, "fixture must exercise the late path"
    assert sorted(wms) == sorted(exp_wms)


def test_streaming_quantiles_conservation(fixture_dir, streamed_q):
    """Every validated turn is either in exactly one cell's histogram
    (n_valid + n_rejected) or routed late."""
    qdf, late, _, _ = streamed_q
    total_in = pq.ParquetDataset(fixture_dir["turns"]).read().num_rows
    counted = int(qdf["n_valid"].sum() + qdf["n_rejected"].sum())
    assert counted + len(late) == total_in


def test_streaming_quantiles_infinite_lateness_equals_batch(
        fixture_dir, streamed_q):
    """With lateness → ∞ nothing is late and the streaming result must
    equal the BATCH histogram-partial stage (and its SQL-shaped rule)."""
    import ray.data as rd

    from lauchy_ray.pipelines.validate import validated_stream
    from lauchy_ray.stages.windows import window_len_quantiles

    _, _, _, entity_codes = streamed_q
    qdf, late, _ = run_streaming_quantiles(
        fixture_dir["turns"], HOUR_US, 1 << 60, n_shards=N_SHARDS,
        validate_kwargs={"entity_codes": sorted(entity_codes)})
    assert len(late) == 0
    turns = rd.read_parquet(fixture_dir["turns"])
    vds = validated_stream(turns, entity_codes=sorted(entity_codes))
    exp = (window_len_quantiles(vds, HOUR_US).to_pandas()
           .sort_values(KEY).reset_index(drop=True))
    got = qdf.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)


def test_streaming_quantiles_checkpoint_resume(fixture_dir, streamed_q,
                                               tmp_path):
    """Feed only the first 2 fragments with checkpointing (simulated
    crash), then a FULL run against the same checkpoint dir: replay must
    converge to the uncheckpointed result exactly."""
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (
        QuantileShardActor, _prepare_fragment, _shard_tables)

    qdf_ref, late_ref, wms_ref, entity_codes = streamed_q
    ckpt = str(tmp_path / "qckpt")
    vk = {"entity_codes": sorted(entity_codes)}

    fragments = list_fragments(fixture_dir["turns"])
    assert len(fragments) >= 3
    # partial run: fragments[0:2] through checkpointing actors
    import os
    os.makedirs(ckpt, exist_ok=True)
    actors = [QuantileShardActor.remote(
        HOUR_US, LATENESS_US, os.path.join(ckpt, f"shard-{s}.ckpt"))
        for s in range(N_SHARDS)]
    vk_ref = ray.put(vk)
    for seq, frag in enumerate(fragments[:2]):
        refs = ray.get(_prepare_fragment.remote(frag, N_SHARDS, vk_ref))
        ray.get([actors[s].ingest.remote(r, seq)
                 for s, r in enumerate(refs) if r is not None])
    del actors  # "crash"

    qdf, late, wms = run_streaming_quantiles(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=N_SHARDS,
        validate_kwargs=vk, checkpoint_dir=ckpt)
    got = qdf.sort_values(KEY).reset_index(drop=True)
    exp = qdf_ref.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)
    assert sorted(wms) == sorted(wms_ref)
    got_late = sorted(map(tuple, late[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    exp_late = sorted(map(tuple, late_ref[["conv_id", "turn_idx", "ts"]]
                          .itertuples(index=False)))
    assert got_late == exp_late


def test_quantiles_from_hist_matches_duckdb_rule():
    """The integer-ceil disc rule vs DuckDB on float-hazard (q·n exactly
    integral) and singleton histograms."""
    import duckdb

    from lauchy_ray.stages.windows import quantiles_from_hist

    rng = np.random.default_rng(7)
    for n in (1, 2, 3, 10, 100, 997):
        raw = rng.integers(0, 40, n)
        vals, cnts = np.unique(raw, return_counts=True)
        got = quantiles_from_hist(vals, cnts)
        exp = duckdb.sql(
            "SELECT quantile_disc(x, 0.5), quantile_disc(x, 0.9), "
            "quantile_disc(x, 0.99) FROM (SELECT unnest($1) AS x)",
            params=[[int(v) for v in raw]]).fetchone()
        assert (got["p50"], got["p90"], got["p99"]) == exp, n


def test_streaming_quantiles_slicing_invariance(fixture_dir, streamed_q):
    """Micro-batch boundaries must not change the result: re-run with
    every fragment split row-wise into 3 slices ingested separately."""
    import ray

    from lauchy_ray.sources.stream import list_fragments
    from lauchy_ray.state.streaming import (
        QuantileShardActor, _prepare_fragment)

    qdf_ref, late_ref, _, entity_codes = streamed_q
    vk_ref = ray.put({"entity_codes": sorted(entity_codes)})
    actors = [QuantileShardActor.remote(HOUR_US, LATENESS_US, None)
              for _ in range(N_SHARDS)]
    for frag in list_fragments(fixture_dir["turns"]):
        refs = ray.get(_prepare_fragment.remote(frag, N_SHARDS, vk_ref))
        for s, r in enumerate(refs):
            if r is None:
                continue
            t = ray.get(r)
            cut1, cut2 = t.num_rows // 3, 2 * t.num_rows // 3
            for sl in (t.slice(0, cut1), t.slice(cut1, cut2 - cut1),
                       t.slice(cut2)):
                if sl.num_rows:
                    ray.get(actors[s].ingest.remote(sl, None))
    finals = ray.get([a.finalize.remote() for a in actors])
    # driver merge, same as run_streaming_quantiles
    from lauchy_ray.stages.windows import quantiles_from_hist
    cells = [c for f in finals for c in f["emitted"]]
    acc: dict[tuple, dict] = {}
    nvals: dict[tuple, int] = {}
    for c in cells:
        k = (c["window_id"], c["role"])
        h = acc.setdefault(k, {})
        for v, n in zip(c["vals"].tolist(), c["cnts"].tolist()):
            h[v] = h.get(v, 0) + n
        nvals[k] = nvals.get(k, 0) + c["n_valid"]
    rows = []
    for k in sorted(acc):
        h = acc[k]
        vals = np.array(sorted(h))
        cnts = np.array([h[v] for v in vals.tolist()])
        total = int(cnts.sum())
        rows.append({"window_id": k[0], "role": k[1],
                     "n_valid": nvals[k], "n_rejected": total - nvals[k],
                     **quantiles_from_hist(vals, cnts)})
    got = pd.DataFrame(rows).sort_values(KEY).reset_index(drop=True)
    exp = qdf_ref.sort_values(KEY).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[COLS], exp[COLS], check_dtype=False)


def test_streaming_quantiles_null_role_routes_as_empty():
    """Out-of-contract null-role rows: the engine fill_nulls role to ""
    at decode; the scalar oracle mirrors that, so both sides land a
    null-role row in the SAME (window, role="") cell (ADVICE r4)."""
    from lauchy_ray.state.streaming import QuantileShardCore

    core = QuantileShardCore(HOUR_US, 0, None)
    t = pa.table({
        "conv_id": pa.array(["c1", "c1", "c1"]),
        "turn_idx": pa.array([0, 1, 2], pa.int64()),
        "role": pa.array(["user", None, None]),
        "text": pa.array(["abc", "defgh", "xy"]),
        "tool": pa.array(["", "", ""]),
        "ts": pa.array([10, 20, 30], pa.int64()),
        "valid": pa.array([True, True, False]),
    })
    core.ingest(t, None)
    cells = core.finalize()["emitted"]
    rows = [{"conv_id": "c1", "turn_idx": i, "role": r, "text": x,
             "ts": s, "valid": v}
            for i, r, x, s, v in [(0, "user", "abc", 10, True),
                                  (1, None, "defgh", 20, True),
                                  (2, None, "xy", 30, False)]]
    exp_cells, _, _ = oracle.streaming_quantiles_rows(rows, HOUR_US, 0, 1)
    got = {(c["window_id"], c["role"]): (c["n_valid"],
                                         sorted(zip(c["vals"], c["cnts"])))
           for c in cells}
    exp = {(c["window_id"], c["role"]): (c["n_valid"], None)
           for c in exp_cells}
    assert set(got) == set(exp) == {(0, "user"), (0, "")}
    assert got[(0, "")][0] == exp[(0, "")][0] == 1
    assert [tuple(map(int, p)) for p in got[(0, "")][1]] == [(2, 1), (5, 1)]
