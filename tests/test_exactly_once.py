"""Exactly-once sink: atomic commit, resume-skips-done, crash idempotence
(SURVEY.md §5.4; north_rule resumability)."""

import json
import os

import pyarrow.parquet as pq
import pytest

from lauchy_ray.pipelines.checkpointed import run_checkpointed_validate
from lauchy_ray.state.sink import committed_fragments, read_sink


def _key_set(table):
    if table.num_rows == 0:
        return set()
    return set(zip(table["conv_id"].to_pylist(), table["turn_idx"].to_pylist(),
                   table["ts"].to_pylist()))


def test_full_run_then_resume_noop(fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    s1 = run_checkpointed_validate(fixture_dir["turns"], out)
    assert s1["fragments_processed"] == s1["fragments_total"] == 4
    valid1 = read_sink(out, "valid")
    rejected1 = read_sink(out, "rejected")
    total_in = pq.ParquetDataset(fixture_dir["turns"]).read().num_rows
    assert valid1.num_rows + rejected1.num_rows == total_in

    # rerun: everything skipped, outputs byte-identical row sets
    s2 = run_checkpointed_validate(fixture_dir["turns"], out)
    assert s2["fragments_processed"] == 0
    assert s2["fragments_skipped"] == 4
    assert _key_set(read_sink(out, "valid")) == _key_set(valid1)


def test_partial_crash_resume(fixture_dir, tmp_path):
    """Simulate a crash after 2 of 4 fragments committed: delete two
    manifests AND one output file (crash mid-rename-batch). Resume must
    reprocess exactly the missing fragments and converge to the full run."""
    out_full = str(tmp_path / "full")
    run_checkpointed_validate(fixture_dir["turns"], out_full)
    golden_valid = _key_set(read_sink(out_full, "valid"))
    golden_rej = _key_set(read_sink(out_full, "rejected"))

    out = str(tmp_path / "crash")
    run_checkpointed_validate(fixture_dir["turns"], out)
    # "crash": drop the commit records of fragments 2,3 and one output file
    for name in ["part-00002", "part-00003"]:
        os.remove(os.path.join(out, "_manifest", name + ".json"))
    os.remove(os.path.join(out, "valid", "part-00003.parquet"))

    s = run_checkpointed_validate(fixture_dir["turns"], out)
    assert s["fragments_processed"] == 2
    assert _key_set(read_sink(out, "valid")) == golden_valid
    assert _key_set(read_sink(out, "rejected")) == golden_rej
    assert len(committed_fragments(out)) == 4


def test_sigkill_resume_converges(small_fixture_dir, tmp_path):
    """Real crash: SIGKILL a CLI validate run mid-flight, resume, and the
    sinks must converge exactly to an uninterrupted run (no dupes, no
    loss). Whatever subset of fragments was committed at kill time, the
    manifest protocol makes the rerun pick up the rest."""
    import signal
    import subprocess
    import sys
    import time

    out_full = str(tmp_path / "full")
    run_checkpointed_validate(small_fixture_dir["turns"], out_full)
    golden = _key_set(read_sink(out_full, "valid"))

    out = str(tmp_path / "killed")
    cmd = [sys.executable, "-m", "lauchy_ray.cli", "validate",
           "--input", small_fixture_dir["turns"], "--out", out,
           "--num-cpus", "2", "--max-in-flight", "1"]
    proc = subprocess.Popen(cmd, cwd="/root/repo",
                            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    # kill the moment SOME but not all fragments are committed (poll the
    # manifest); if the run wins the race the resume is a (valid) no-op
    deadline = time.time() + 60
    while time.time() < deadline and proc.poll() is None:
        n = len(committed_fragments(out)) if os.path.isdir(
            os.path.join(out, "_manifest")) else 0
        if 1 <= n < 8:
            break
        time.sleep(0.05)
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    committed_before = len(committed_fragments(out)) if os.path.isdir(
        os.path.join(out, "_manifest")) else 0
    s = run_checkpointed_validate(small_fixture_dir["turns"], out)
    assert s["fragments_skipped"] == committed_before
    assert _key_set(read_sink(out, "valid")) == golden


def test_hot_conv_skew_does_not_break(tmp_path):
    """Degenerate skew: ONE conversation owns 100% of a 60k-turn stream.
    The per-conv stages (sessionize, dedup, late-flagging) must still
    complete — state is O(conv length) in a single group, which fits —
    and window counts are unaffected (their partial key excludes conv_id)."""
    import ray.data as rd

    from lauchy_ray.datagen import write_fixture
    from lauchy_ray.pipelines.validate import validated_stream
    from lauchy_ray.sources.stream import read_stream
    from lauchy_ray.stages.dedup import dedup_exact
    from lauchy_ray.stages.sessionize import sessionize
    from lauchy_ray.stages.windows import window_counts

    paths = write_fixture(str(tmp_path / "hot"), n_turns=60000, n_convs=1,
                          seed=7, n_fragments=8)
    sess = sessionize(rd.read_parquet(paths["turns"])).to_pandas()
    assert sess["conv_id"].nunique() == 1 and sess["n_turns"].sum() >= 60000

    dd = dedup_exact(read_stream(paths["turns"]))
    assert dd.count() == 60000

    vds = validated_stream(rd.read_parquet(paths["turns"]), use_actors=False)
    wc = window_counts(vds).to_pandas()
    assert int(wc["n_valid"].sum() + wc["n_rejected"].sum()) == sess["n_turns"].sum()


def test_manifest_lineage(fixture_dir, tmp_path):
    out = str(tmp_path / "out")
    run_checkpointed_validate(fixture_dir["turns"], out)
    mdir = os.path.join(out, "_manifest")
    entries = [json.load(open(os.path.join(mdir, f))) for f in sorted(os.listdir(mdir))]
    assert len(entries) == 4
    for e in entries:
        assert e["rows_in"] > 0 and "max_ts_us" in e
        assert set(e["outputs"]) == {"valid", "rejected", "side"}
        for sink, info in e["outputs"].items():
            assert os.path.exists(info["file"])
            assert pq.read_metadata(info["file"]).num_rows == info["rows"] or info["rows"] == 0
