"""Bench stdout contract (r3 verdict item #1): the grading driver keeps
only a ~2000-byte stdout tail, so the one JSON line bench.py prints must
stay under 1900 bytes — r3's 4,043-byte line was recorded as
"parsed": null and the round lost its official perf record."""

import json
import sys


def _load_bench():
    import importlib.util
    import pathlib
    path = pathlib.Path(__file__).resolve().parent.parent / "bench.py"
    spec = importlib.util.spec_from_file_location("bench_mod", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_result(n_queries: int) -> dict:
    calib = {"matmul_1024_sec": 0.1591, "pyloop_2e6_sec": 0.1002,
             "membw_mb_s": 2345.9, "loadavg_1m": 2.69, "loadavg_5m": 2.95}
    return {
        "metric": ("turns/sec validation+window-agg on synthetic "
                   "transcript stream"),
        "value": 3.661, "unit": "sec",
        "queries": {f"query_name_{i:04d}": 1.234
                    for i in range(n_queries)},
        "sf": "/root/testdata/sf0.1", "num_cpus": 32,
        "bench_turns": 8_080_000,
        "headline_samples": [3.633, 3.694, 3.717], "bench_passes": 3,
        "calibration": calib, "calibration_end": dict(calib),
        "turns_per_sec": 2_207_047, "queries_total_sec": 121.013,
        "streaming": {f"cep_engine_{i}": {"sec": 4.3,
                                          "samples": [4.1, 4.3, 4.5],
                                          "turns_per_sec": 1_879_070}
                      for i in range(13)},
    }


def test_stdout_line_under_driver_tail(tmp_path):
    """Even with 500 queries and 13 engines, the printed line must stay
    under 1900 bytes (everything bulky goes to the sidecar)."""
    bench = _load_bench()
    sidecar = str(tmp_path / "details.json")
    slim = bench._trim_for_stdout(_full_result(500), sidecar)
    line = json.dumps(slim)
    assert len(line) < 1900, len(line)
    # the sidecar carries the FULL result, per-query timings included
    with open(sidecar) as f:
        full = json.load(f)
    assert len(full["queries"]) == 500
    assert len(full["streaming"]) == 13


def test_trim_raises_instead_of_breaking_contract(tmp_path):
    """If the slim object itself ever outgrows the tail, bench must DIE
    loudly (a silent oversized line records parsed: null again)."""
    import pytest
    bench = _load_bench()
    res = _full_result(3)
    res["metric"] = "x" * 3000
    with pytest.raises(ValueError):
        bench._trim_for_stdout(res, str(tmp_path / "d.json"))
