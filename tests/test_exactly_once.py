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
