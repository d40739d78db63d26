"""Golden artifacts (FIXTURES.md §5): emitted files are consistent with the
live oracle and reproduce the engine's outputs."""

import json
import os

import pyarrow.parquet as pq
import ray.data as rd

from lauchy_ray.golden import write_golden
from lauchy_ray.pipelines.validate import validated_stream


def test_write_and_check_golden(fixture_dir):
    fx = os.path.dirname(fixture_dir["entities"])
    paths = write_golden(fx)
    meta = json.load(open(paths["meta"]))
    total = pq.ParquetDataset(fixture_dir["turns"]).read().num_rows
    assert meta["n_rows"] == total
    assert meta["n_valid"] + meta["n_rejected"] == total
    assert meta["n_late"] > 0
    assert meta["blacklist_off_all_valid"] is True

    gv = pq.read_table(paths["golden_valid"])
    gr = pq.read_table(paths["golden_rejected"])
    assert gv.num_rows == meta["n_valid"] and gr.num_rows == meta["n_rejected"]

    # engine reproduces the golden valid row set exactly
    codes = pq.read_table(fixture_dir["entities"])["code"].to_pylist()
    got = validated_stream(rd.read_parquet(fixture_dir["turns"]),
                           entity_codes=codes).to_pandas()
    got_valid = got[got["valid"]]
    key = lambda df: sorted(zip(df["conv_id"], df["turn_idx"], df["text"]))  # noqa: E731
    gv_df = gv.to_pandas()
    assert key(got_valid) == key(gv_df)

    ws = pq.read_table(paths["golden_window_counts_sliding"])
    wt = pq.read_table(paths["golden_window_counts"])
    import pyarrow.compute as pc
    assert pc.sum(ws["n_valid"]).as_py() + pc.sum(ws["n_rejected"]).as_py() == 4 * total
    assert pc.sum(wt["n_valid"]).as_py() + pc.sum(wt["n_rejected"]).as_py() == total
