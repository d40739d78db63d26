"""Benchmark harness (driver contract: prints ONE JSON line).

Headline metric (BASELINE.json): turns/sec for validation + window-agg on
a deterministic synthetic transcript Parquet stream (generated once into
/tmp and cached by (seed, size)). Also times every queries() entry over
$GRAFT_SF_DIR (default /root/testdata/sf0.1).

  python bench.py             # one run at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling   # fresh processes at 8 and 32 CPUs on the
                              # same input; reports both + efficiency

Owns its Ray session (the only scripts allowed to: bench, CLI, tests).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from statistics import median as _median

BENCH_TURNS = int(os.environ.get("LAUCHY_BENCH_TURNS", 8_000_000))
BENCH_CONVS = max(100, BENCH_TURNS // 50)
SEED = 42
# Headline/streaming numbers are the MEDIAN of this many timed passes (after
# one untimed warm pass); raw samples are recorded in the JSON so a noisy
# sandbox run is visible instead of silently becoming the official number
# (round-2 driver record swung 2.13x on a single-sample bench).
BENCH_PASSES = max(1, int(os.environ.get("LAUCHY_BENCH_PASSES", 3)))



def calibrate() -> dict:
    """Fixed single-thread reference work, reported with every run: the
    sandbox's effective CPU speed swings >2x between runs (the round-2
    driver recorded a uniformly ~2x-slower suite than the same-day
    builder runs), so the JSON carries normalization constants — compare
    bench numbers at comparable calibration, or scale by the ratio."""
    import numpy as np
    a = np.random.default_rng(0).random((1024, 1024))
    a @ a  # warm
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        a @ a
        best = min(best, time.time() - t0)
    t0 = time.time()
    s = 0
    for i in range(2_000_000):
        s += i
    pyloop = time.time() - t0
    # memory BANDWIDTH probe (80MB stream copy): the matmul is
    # cache-resident and blind to the co-tenant interference that
    # actually sinks this engine's throughput — an observed degraded
    # window ran numpy elementwise ops 100x slow (copy at ~46MB/s) while
    # matmul read normal. Compare bench numbers at comparable MB/s.
    buf = np.empty(10_000_000, np.int64)
    buf[:] = 3
    best_bw = 0.0
    for _ in range(3):
        t0 = time.time()
        buf.copy()
        best_bw = max(best_bw, 80.0 / max(time.time() - t0, 1e-9))
    try:
        load1, load5, _ = os.getloadavg()
    except OSError:
        load1 = load5 = -1.0
    # single-thread speed misses multi-core steal from co-tenants; the
    # load average at bench start captures that side (32-CPU box: load >8
    # from OUTSIDE the bench means the parallel stages are contended)
    return {"matmul_1024_sec": round(best, 4),
            "pyloop_2e6_sec": round(pyloop, 4),
            "membw_mb_s": round(best_bw, 1),
            "loadavg_1m": round(load1, 2), "loadavg_5m": round(load5, 2)}


def ensure_bench_fixture() -> dict[str, str]:
    """Deterministic bench turns table, cached across runs/processes."""
    out_dir = f"/tmp/lauchy_bench/turns_{BENCH_TURNS}_{SEED}"
    marker = os.path.join(out_dir, ".complete")
    paths = {"turns": os.path.join(out_dir, "turns"),
             "entities": os.path.join(out_dir, "entities.parquet")}
    if os.path.exists(marker):
        return paths
    from lauchy_ray.datagen import write_fixture
    t0 = time.time()
    write_fixture(out_dir, n_turns=BENCH_TURNS, n_convs=BENCH_CONVS,
                  seed=SEED, n_fragments=64)
    with open(marker, "w") as f:
        f.write(f"generated in {time.time() - t0:.1f}s\n")
    return paths


def run_headline(paths: dict[str, str]) -> dict:
    """read → validate (actor pool) → tumbling window counts (+ per-reason
    totals), consumed as small aggregates. One streaming pass."""
    import pyarrow.parquet as pq
    import ray.data as rd
    from lauchy_ray.pipelines.validate import validated_stream
    from lauchy_ray.stages.windows import window_counts

    entity_codes = pq.read_table(paths["entities"], columns=["code"])["code"].to_pylist()

    def one_pass():
        turns = rd.read_parquet(paths["turns"])
        # stateless-task validator (worker-process cached state): elastic, no
        # actor-spawn latency; the rules dict is small so per-worker copies
        # are cheap. The actor-pool path stays the default for heavy state.
        vds = validated_stream(turns, entity_codes=entity_codes,
                               batch_size=65536, use_actors=False)
        return window_counts(vds).to_pandas()

    # one untimed pass warms the OS page cache AND the Ray worker pool
    # (process spawn + code unpickle), so the measurement is steady-state
    # throughput — what a long-running stream job actually sees. Then
    # BENCH_PASSES timed passes; the reported number is their median and
    # every raw sample ships in the JSON.
    one_pass()
    samples = []
    wc = None
    for _ in range(BENCH_PASSES):
        t0 = time.time()
        wc = one_pass()
        samples.append(round(time.time() - t0, 3))
    elapsed = _median(samples)
    n_turns = int(wc["n_valid"].sum() + wc["n_rejected"].sum())
    return {"sec": elapsed, "turns": n_turns, "samples": samples,
            "turns_per_sec": n_turns / elapsed, "window_cells": len(wc)}


def run_streaming(paths: dict[str, str]) -> dict:
    """Steady-state throughput of the three STREAMING engines (micro-batch
    CEP over fragment arrival order): tumbling window counts, session
    windows, dedup-by-key — one warm pass each, then one timed pass."""
    import shutil

    import pyarrow.parquet as pq

    from lauchy_ray.state.streaming import (
        run_streaming_absence, run_streaming_approx_topk,
        run_streaming_dedup, run_streaming_distinct, run_streaming_join,
        run_streaming_patterns, run_streaming_quantiles,
        run_streaming_funnel, run_streaming_sample,
        run_streaming_sessions, run_streaming_topk, run_streaming_upsert,
        run_streaming_window_counts, run_streaming_window_hll)

    codes = sorted(pq.read_table(paths["entities"], columns=["code"])
                   ["code"].to_pylist())
    vk = {"entity_codes": codes}
    hour = 3600 * 1_000_000
    gap = 30 * 60 * 1_000_000
    late = 5 * 60 * 1_000_000
    out = {}

    def timed(name, fn, pre=None):
        fn()  # warm (page cache + worker pool)
        samples = []
        for _ in range(BENCH_PASSES):
            if pre:
                pre()  # untimed setup (e.g. output cleanup) stays OUT of
                # the measured region
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
        elapsed = _median(samples)
        out[name] = {"sec": round(elapsed, 3), "samples": samples,
                     "turns_per_sec": round(BENCH_TURNS / elapsed)}

    timed("cep_windows", lambda: run_streaming_window_counts(
        paths["turns"], hour, late, n_shards=8, validate_kwargs=vk))
    timed("cep_sessions", lambda: run_streaming_sessions(
        paths["turns"], gap, late, n_shards=8, validate_kwargs=vk))
    timed("cep_patterns", lambda: run_streaming_patterns(
        paths["turns"], late, n_shards=8, validate_kwargs=vk))
    timed("cep_funnel", lambda: run_streaming_funnel(
        paths["turns"], late, n_shards=8, validate_kwargs=vk))
    timed("cep_distinct", lambda: run_streaming_distinct(
        paths["turns"], hour, late, n_shards=8, validate_kwargs=vk))
    timed("cep_topk", lambda: run_streaming_topk(
        paths["turns"], hour, 5, late, n_shards=8, validate_kwargs=vk))
    timed("cep_approx_topk", lambda: run_streaming_approx_topk(
        paths["turns"], hour, 5, 64, late, n_shards=8, validate_kwargs=vk))
    timed("cep_timeout", lambda: run_streaming_absence(
        paths["turns"], gap, late, n_shards=8, validate_kwargs=vk))
    jd = "/tmp/lauchy_bench/stream_join_out"

    def clean_jd():
        if os.path.isdir(jd):
            shutil.rmtree(jd)

    clean_jd()
    # out_dir = the scale path: pairs spill as per-shard parquet parts,
    # never concat'd on the driver (round-5 fix)
    timed("cep_join", lambda: run_streaming_join(
        paths["turns"], gap, late, n_shards=8, validate_kwargs=vk,
        out_dir=jd), pre=clean_jd)
    timed("cep_quantiles", lambda: run_streaming_quantiles(
        paths["turns"], hour, late, n_shards=8, validate_kwargs=vk))
    timed("cep_sample", lambda: run_streaming_sample(
        paths["turns"], hour, 5, late, n_shards=8, validate_kwargs=vk))
    ud = "/tmp/lauchy_bench/stream_upsert_out"

    def clean_ud():
        if os.path.isdir(ud):
            shutil.rmtree(ud)

    clean_ud()
    timed("cep_upsert", lambda: run_streaming_upsert(
        paths["turns"], late, n_shards=8, validate_kwargs=vk,
        out_dir=ud), pre=clean_ud)
    timed("cep_hll", lambda: run_streaming_window_hll(
        paths["turns"], hour, late, n_shards=8, validate_kwargs=vk))

    dd = "/tmp/lauchy_bench/stream_dedup_out"

    def clean_dd():
        if os.path.isdir(dd):
            shutil.rmtree(dd)

    clean_dd()
    timed("cep_dedup",
          lambda: run_streaming_dedup(paths["turns"], dd, n_shards=8,
                                      validate_kwargs=vk),
          pre=clean_dd)
    return out


def run_queries(sf_dir: str) -> dict[str, float]:
    import __ray_entry__ as em
    out = {}
    for name, fn in em.queries().items():
        t0 = time.time()
        res = fn(sf_dir)
        if hasattr(res, "to_pandas"):
            res = res.to_pandas()
        out[name] = round(time.time() - t0, 3)
    return out


def _trim_for_stdout(result: dict, sidecar: str) -> dict:
    """The grading driver keeps only a ~2000-byte stdout tail; round 3's
    4,043-byte line was recorded as "parsed": null. Emit a <1900-byte
    summary (headline + scaling-relevant numbers + bandwidth probes) and
    write the FULL result — per-query timings, streaming engines, both
    calibration blocks — to a sidecar JSON file next to this script."""
    with open(sidecar, "w") as f:
        json.dump(result, f, indent=1)
    calib = result.get("calibration", {})
    calib_end = result.get("calibration_end", {})
    slim = {
        "metric": result["metric"],
        "value": result["value"],
        "unit": result["unit"],
        "sf": result["sf"],
        "num_cpus": result["num_cpus"],
        "bench_turns": result["bench_turns"],
        "turns_per_sec": result["turns_per_sec"],
        "headline_samples": result["headline_samples"],
        # per-query timings live in the sidecar; stdout carries the totals
        "queries": {"total_sec": result["queries_total_sec"],
                    "n": len(result["queries"])},
        "queries_total_sec": result["queries_total_sec"],
        "membw_mb_s": [calib.get("membw_mb_s"), calib_end.get("membw_mb_s")],
        "loadavg_1m": calib.get("loadavg_1m"),
        "details_file": sidecar,
    }
    line = json.dumps(slim)
    if len(line) >= 1900:   # explicit raise — asserts vanish under -O
        raise ValueError(f"stdout line {len(line)}B breaks driver contract")
    return slim


def single_run() -> dict:
    ncpu = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import ray
    if not ray.is_initialized():
        # log_to_driver=False: worker prints otherwise leak into stdout
        # AHEAD of the one JSON line this script contracts to emit (an
        # observed run interleaved "(_prepare_fragment pid=...)" lines)
        ray.init(address="local", num_cpus=ncpu, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    paths = ensure_bench_fixture()
    calib = calibrate()
    headline = run_headline(paths)
    # Scaling subprocesses only need the headline (efficiency is computed
    # from it); skipping streaming+queries keeps --scaling tractable at
    # median-of-3.
    headline_only = os.environ.get("LAUCHY_BENCH_HEADLINE_ONLY") == "1"
    streaming = {} if headline_only else run_streaming(paths)
    queries = {} if headline_only else run_queries(sf_dir)
    result = {
        "metric": "turns/sec validation+window-agg on synthetic transcript stream",
        "value": round(headline["sec"], 3),
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": ncpu,
        "bench_turns": headline["turns"],
        "headline_samples": headline["samples"],
        "bench_passes": BENCH_PASSES,
        "calibration": calib,
        # the box's memory bandwidth oscillates on MINUTE timescales —
        # a healthy start probe does not certify the whole run, so probe
        # again at the end; a run is trustworthy only when BOTH read sane
        "calibration_end": calibrate(),
        "turns_per_sec": round(headline["turns_per_sec"]),
        "queries_total_sec": round(sum(queries.values()), 3),
        "streaming": streaming,
    }
    ray.shutdown()
    return result


def scaling() -> dict:
    def run(ncpu: int) -> dict:
        # each subprocess gets its own sidecar (the full result); stdout is
        # the trimmed summary, so read the sidecar for calibration blocks
        sidecar = f"/tmp/lauchy_bench/sidecar_{ncpu}.json"
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   LAUCHY_BENCH_HEADLINE_ONLY="1",
                   LAUCHY_BENCH_SIDECAR=sidecar)
        subprocess.run([sys.executable, os.path.abspath(__file__)],
                       env=env, capture_output=True, text=True, check=True,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
        with open(sidecar) as f:
            return json.load(f)

    lo, hi = 8, 32
    r_lo, r_hi = run(lo), run(hi)
    eff = (r_lo["value"] / r_hi["value"]) / (hi / lo)
    return {
        "sec_8": r_lo["value"], "sec_32": r_hi["value"],
        "samples_8": r_lo.get("headline_samples"),
        "samples_32": r_hi.get("headline_samples"),
        "calibration_8": r_lo.get("calibration"),
        "calibration_32": r_hi.get("calibration"),
        "turns_per_sec_8": r_lo["turns_per_sec"],
        "turns_per_sec_32": r_hi["turns_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "bench_turns": r_hi["bench_turns"],
    }


if __name__ == "__main__":
    here = os.path.dirname(os.path.abspath(__file__))
    if "--scaling" in sys.argv:
        full = scaling()
        sidecar = os.path.join(here, "bench_details_scaling.json")
        with open(sidecar, "w") as f:
            json.dump(full, f, indent=1)
        slim = {k: full[k] for k in
                ("sec_8", "sec_32", "turns_per_sec_8", "turns_per_sec_32",
                 "scaling_efficiency", "bench_turns", "samples_8",
                 "samples_32")}
        slim["membw_mb_s"] = [
            (full.get("calibration_8") or {}).get("membw_mb_s"),
            (full.get("calibration_32") or {}).get("membw_mb_s")]
        slim["details_file"] = sidecar
        line = json.dumps(slim)
        if len(line) >= 1900:
            raise ValueError(f"stdout line {len(line)}B breaks contract")
        print(line)
    else:
        full = single_run()
        sidecar = os.environ.get("LAUCHY_BENCH_SIDECAR",
                                 os.path.join(here, "bench_details.json"))
        if os.path.dirname(sidecar):   # bare filename → cwd, no makedirs
            os.makedirs(os.path.dirname(sidecar), exist_ok=True)
        print(json.dumps(_trim_for_stdout(full, sidecar)))
