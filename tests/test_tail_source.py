"""Live/tailing fragment source (r4 verdict missing-#1): fragments
appended to the input directory MID-RUN must yield results identical to
a static run over the final fragment set, with the exactly-once
checkpoint contract (fragment log + seq-skip replay) intact."""

import os
import shutil
import threading
import time

import pandas as pd
import pyarrow.parquet as pq
import pytest

from lauchy_ray.sources.stream import list_fragments, tail_fragments
from lauchy_ray.state.streaming import run_streaming_window_counts

HOUR_US = 3600 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000


# ------------------------------------------------------------- unit

def test_tail_yields_in_order_and_mid_run(tmp_path):
    d = tmp_path / "frags"
    d.mkdir()
    (d / "f-000.parquet").write_bytes(b"x")
    (d / "f-001.parquet").write_bytes(b"x")

    def producer():
        time.sleep(0.4)
        (d / "f-002.parquet").write_bytes(b"x")
        time.sleep(0.2)
        (d / "f-003.parquet").write_bytes(b"x")
        (d / "_EOS").write_bytes(b"")

    t = threading.Thread(target=producer)
    t.start()
    got = [os.path.basename(p)
           for p in tail_fragments(str(d), poll_interval_s=0.05,
                                   idle_timeout_s=30.0)]
    t.join()
    assert got == ["f-000.parquet", "f-001.parquet",
                   "f-002.parquet", "f-003.parquet"]


def test_tail_idle_timeout(tmp_path):
    d = tmp_path / "frags"
    d.mkdir()
    (d / "a.parquet").write_bytes(b"x")
    t0 = time.monotonic()
    got = list(tail_fragments(str(d), poll_interval_s=0.05,
                              idle_timeout_s=0.3))
    assert [os.path.basename(p) for p in got] == ["a.parquet"]
    assert time.monotonic() - t0 < 5.0


def test_tail_rejects_out_of_order_arrival(tmp_path):
    d = tmp_path / "frags"
    d.mkdir()
    (d / "b.parquet").write_bytes(b"x")

    def producer():
        time.sleep(0.3)
        (d / "a.parquet").write_bytes(b"x")  # sorts BEFORE consumed b

    t = threading.Thread(target=producer)
    t.start()
    with pytest.raises(ValueError, match="sorted order"):
        list(tail_fragments(str(d), poll_interval_s=0.05,
                            idle_timeout_s=5.0))
    t.join()


def test_tail_skip_replays_nothing_but_enforces_order(tmp_path):
    d = tmp_path / "frags"
    d.mkdir()
    (d / "f-000.parquet").write_bytes(b"x")
    (d / "f-001.parquet").write_bytes(b"x")
    (d / "_EOS").write_bytes(b"")
    got = [os.path.basename(p)
           for p in tail_fragments(str(d), poll_interval_s=0.05,
                                   idle_timeout_s=1.0,
                                   skip={"f-000.parquet"})]
    assert got == ["f-001.parquet"]


# ------------------------------------------------------- integration

def _split_fragments(src_dir: str, dst: str, n_first: int):
    """Copy the first n fragments now; return the held-back rest."""
    frags = list_fragments(src_dir)
    os.makedirs(dst, exist_ok=True)
    for p in frags[:n_first]:
        shutil.copy(p, dst)
    return frags[n_first:]


def test_tail_run_equals_static_run(ray_session, fixture_dir, tmp_path):
    entity_codes = sorted(set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist()))
    vk = {"entity_codes": entity_codes}
    static_wc, static_late, _ = run_streaming_window_counts(
        fixture_dir["turns"], HOUR_US, LATENESS_US, n_shards=4,
        validate_kwargs=vk)

    live = str(tmp_path / "live")
    rest = _split_fragments(fixture_dir["turns"], live, n_first=2)
    ckpt = str(tmp_path / "ckpt")

    def producer():
        time.sleep(1.0)
        for p in rest:
            shutil.copy(p, live)
            time.sleep(0.3)
        open(os.path.join(live, "_EOS"), "w").close()

    t = threading.Thread(target=producer)
    t.start()
    tail_wc, tail_late, _ = run_streaming_window_counts(
        live, HOUR_US, LATENESS_US, n_shards=4, validate_kwargs=vk,
        checkpoint_dir=ckpt, tail=True, poll_interval_s=0.1,
        idle_timeout_s=60.0)
    t.join()

    key = ["window_id", "role", "tool"]
    pd.testing.assert_frame_equal(
        tail_wc.sort_values(key).reset_index(drop=True),
        static_wc.sort_values(key).reset_index(drop=True))
    assert len(tail_late) == len(static_late)

    # exactly-once manifest: the fragment log holds every fragment once,
    # in name order
    with open(os.path.join(ckpt, "_fragments.log")) as f:
        logged = [ln.strip() for ln in f if ln.strip()]
    assert logged == sorted(logged) and len(logged) == len(set(logged))
    assert logged == [os.path.basename(p) for p in list_fragments(live)]

    # resume against the same dir: logged prefix replays (seq-skip), then
    # EOS drains — identical output, log unchanged
    tail_wc2, _, _ = run_streaming_window_counts(
        live, HOUR_US, LATENESS_US, n_shards=4, validate_kwargs=vk,
        checkpoint_dir=ckpt, tail=True, poll_interval_s=0.1,
        idle_timeout_s=2.0)
    pd.testing.assert_frame_equal(
        tail_wc2.sort_values(key).reset_index(drop=True),
        static_wc.sort_values(key).reset_index(drop=True))
    with open(os.path.join(ckpt, "_fragments.log")) as f:
        logged2 = [ln.strip() for ln in f if ln.strip()]
    assert logged2 == logged

    # a static (non-tail) run must refuse the tail-written checkpoint dir
    with pytest.raises(ValueError, match="different config"):
        run_streaming_window_counts(
            live, HOUR_US, LATENESS_US, n_shards=4, validate_kwargs=vk,
            checkpoint_dir=ckpt)


def test_tail_sessions_and_dedup_equal_static(ray_session, fixture_dir,
                                              tmp_path):
    """Tail mode on the sessions and dedup runners: mid-run appends must
    equal the static run (sessions bit-for-bit; dedup same kept rows)."""
    import pyarrow.parquet as pq2

    from lauchy_ray.state.streaming import (run_streaming_dedup,
                                            run_streaming_sessions)
    GAP = 30 * 60 * 1_000_000
    entity_codes = sorted(set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist()))
    vk = {"entity_codes": entity_codes}

    s_sess, s_late, _ = run_streaming_sessions(
        fixture_dir["turns"], GAP, LATENESS_US, n_shards=4,
        validate_kwargs=vk)

    live = str(tmp_path / "live")
    rest = _split_fragments(fixture_dir["turns"], live, n_first=2)

    def producer():
        time.sleep(0.8)
        for p in rest:
            shutil.copy(p, live)
            time.sleep(0.2)
        open(os.path.join(live, "_EOS"), "w").close()

    t = threading.Thread(target=producer)
    t.start()
    t_sess, t_late, _ = run_streaming_sessions(
        live, GAP, LATENESS_US, n_shards=4, validate_kwargs=vk,
        tail=True, poll_interval_s=0.1, idle_timeout_s=60.0)
    t.join()
    key = ["conv_id", "start_us"]
    pd.testing.assert_frame_equal(
        t_sess.sort_values(key).reset_index(drop=True),
        s_sess.sort_values(key).reset_index(drop=True))
    assert len(t_late) == len(s_late)

    # dedup: static vs tail (fragments all present, EOS pre-placed)
    out_s = str(tmp_path / "ds")
    sum_s = run_streaming_dedup(fixture_dir["turns"], out_s,
                                validate_kwargs=vk, n_shards=4)
    open(os.path.join(live, "_EOS"), "w").close()
    out_t = str(tmp_path / "dt")
    sum_t = run_streaming_dedup(live, out_t, validate_kwargs=vk,
                                n_shards=4, tail=True,
                                poll_interval_s=0.1, idle_timeout_s=5.0)
    assert sum_t["rows_out"] == sum_s["rows_out"]


def test_tail_param_on_all_runners(ray_session, fixture_dir, tmp_path):
    """Every streaming runner accepts tail= (uniform API): drive one of
    the mechanically-converted ones (topk) with _EOS pre-placed and an
    all-present directory — must equal its static run."""
    import inspect

    from lauchy_ray.state import streaming as S
    runners = [getattr(S, n) for n in dir(S)
               if n.startswith("run_streaming_")]
    for r in runners:
        assert "tail" in inspect.signature(r).parameters, r.__name__

    entity_codes = sorted(set(
        pq.read_table(fixture_dir["entities"])["code"].to_pylist()))
    vk = {"entity_codes": entity_codes}
    static_tk, _, _ = S.run_streaming_topk(
        fixture_dir["turns"], HOUR_US, 3, LATENESS_US, n_shards=4,
        validate_kwargs=vk)
    live = str(tmp_path / "live")
    _split_fragments(fixture_dir["turns"], live, n_first=10**6)  # all
    open(os.path.join(live, "_EOS"), "w").close()
    tail_tk, _, _ = S.run_streaming_topk(
        live, HOUR_US, 3, LATENESS_US, n_shards=4, validate_kwargs=vk,
        tail=True, poll_interval_s=0.1, idle_timeout_s=5.0)
    key = list(static_tk.columns)
    pd.testing.assert_frame_equal(
        tail_tk.sort_values(key).reset_index(drop=True),
        static_tk.sort_values(key).reset_index(drop=True))


def test_tail_validate_service_mode(ray_session, fixture_dir, tmp_path):
    """The flagship exactly-once validate as a SERVICE: fragments landing
    mid-run commit through the same manifest; sinks equal the static
    run's, out-of-order arrival tolerated (fragments are independent)."""
    import pyarrow.compute as pc2

    from lauchy_ray.pipelines.checkpointed import run_checkpointed_validate
    from lauchy_ray.state.sink import read_sink
    entity_codes = pq.read_table(
        fixture_dir["entities"], columns=["code"])["code"].to_pylist()

    out_s = str(tmp_path / "static")
    sum_s = run_checkpointed_validate(fixture_dir["turns"], out_s,
                                      entity_codes=entity_codes)

    live = str(tmp_path / "live")
    frags = list_fragments(fixture_dir["turns"])
    os.makedirs(live)
    shutil.copy(frags[1], live)  # out-of-order start: 2nd fragment first

    def producer():
        time.sleep(0.8)
        shutil.copy(frags[0], live)   # arrives AFTER a later-sorting one
        for p in frags[2:]:
            shutil.copy(p, live)
            time.sleep(0.2)
        open(os.path.join(live, "_EOS"), "w").close()

    t = threading.Thread(target=producer)
    t.start()
    out_t = str(tmp_path / "tailed")
    sum_t = run_checkpointed_validate(live, out_t,
                                      entity_codes=entity_codes,
                                      tail=True, poll_interval_s=0.1,
                                      idle_timeout_s=60.0)
    t.join()
    assert sum_t["fragments_processed"] == sum_s["fragments_processed"]
    assert sum_t["rows"] == sum_s["rows"]
    for sink in ("valid", "rejected", "side"):
        a = read_sink(out_s, sink)
        b = read_sink(out_t, sink)
        assert a.num_rows == b.num_rows, sink
    # resume on the drained dir: everything skipped, nothing reprocessed
    sum_r = run_checkpointed_validate(live, out_t,
                                      entity_codes=entity_codes,
                                      tail=True, poll_interval_s=0.1,
                                      idle_timeout_s=2.0)
    assert sum_r["fragments_processed"] == 0
    assert sum_r["fragments_skipped"] == sum_s["fragments_processed"]
