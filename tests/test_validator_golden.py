"""Golden end-to-end: engine vs pure-Python oracle on the tiny fixture
(SURVEY.md §5.2 — exact accepted/rejected row-set match, per-turn text
equality, under stable (conv_id, turn_idx) ordering)."""

import pyarrow.parquet as pq
import ray.data as rd

from lauchy_ray.oracle import validate_table
from lauchy_ray.pipelines.validate import validated_stream

SORT_KEY = ["conv_id", "turn_idx", "ts", "text"]  # ts/text break duplicate-row ties


def _rows(table_or_df):
    df = table_or_df.to_pandas() if hasattr(table_or_df, "to_pandas") else table_or_df
    df = df.copy()
    df["ts"] = df["ts"].astype("int64")
    return df.sort_values(SORT_KEY).reset_index(drop=True)


def run_both(fixture_dir, enable_blacklist=True, entity_codes=None, **kwargs):
    import pyarrow as pa
    turns = pq.ParquetDataset(fixture_dir["turns"]).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    oracle_in = turns.to_pylist()
    expected = validate_table(oracle_in, entity_codes=entity_codes,
                              enable_blacklist=enable_blacklist)

    ds = validated_stream(rd.read_parquet(fixture_dir["turns"]),
                          entity_codes=entity_codes,
                          enable_blacklist=enable_blacklist, **kwargs)
    got = ds.to_pandas()
    got["ts"] = got["ts"].astype("int64")

    import pandas as pd
    exp = pd.DataFrame(expected)
    return _rows(got), _rows(exp)


def test_golden_rowsets(fixture_dir):
    entity_codes = pq.read_table(fixture_dir["entities"])["code"].to_pylist()
    got, exp = run_both(fixture_dir, entity_codes=set(entity_codes))
    assert len(got) == len(exp)
    for col in ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                "valid", "reject_reason", "side"]:
        assert got[col].tolist() == exp[col].tolist(), f"column {col} mismatch"
    # sanity: the fixture exercises both branches and several reject reasons
    assert got["valid"].sum() > 0 and (~got["valid"]).sum() > 0
    assert got.loc[~got["valid"], "reject_reason"].nunique() >= 4
    assert got["side"].sum() > 0


def test_blacklist_kill_switch(fixture_dir):
    """enable_blacklist=False ⇒ every row re-marked valid (pass-through,
    ≙ TopologyProducer.java:283-287)."""
    got, exp = run_both(fixture_dir, enable_blacklist=False)
    assert got["valid"].all()
    assert exp["valid"].all()
    # reasons are retained for observability and still agree with the oracle
    assert got["reject_reason"].tolist() == exp["reject_reason"].tolist()


def test_gate_passthrough(fixture_dir):
    """tool == "" rows bypass validation as valid (≙ java:169-172)."""
    got, _ = run_both(fixture_dir)
    gated = got[got["tool"] == ""]
    assert len(gated) > 0
    assert gated["valid"].all()
    assert (gated["reject_reason"] == "").all()


def test_tidy_applied_before_validation(fixture_dir):
    got, _ = run_both(fixture_dir)
    assert not got["text"].str.contains("Adamm").any()
    assert got["text"].str.startswith("Adam ").any()


def test_side_record_synthesis(fixture_dir, tmp_path):
    """S4 (TopologyProducer.java:215-221): webdata carries a SYNTHESIZED
    record — the target entity wrapped with total=1, return_count=1 and
    the user token — not the raw turn row."""
    import pyarrow.parquet as pq_
    import ray.data as rd_

    from lauchy_ray.pipelines.validate import run_flagship, validated_stream
    from lauchy_ray.stages.validator import webdata_stream

    ents = pq_.read_table(fixture_dir["entities"])
    names = dict(zip(ents["code"].to_pylist(), ents["name"].to_pylist()))
    ds = validated_stream(rd_.read_parquet(fixture_dir["turns"]),
                          entity_codes=ents["code"].to_pylist(),
                          use_actors=False)
    web = webdata_stream(ds, names, token="TOK123").to_pandas()
    side_count = int(ds.to_pandas()["side"].sum())
    assert len(web) == side_count > 0
    assert set(web.columns) == {"code", "name", "attribute_code", "value",
                                "total", "return_count", "token"}
    assert (web["total"] == 1).all() and (web["return_count"] == 1).all()
    assert (web["token"] == "TOK123").all()
    assert (web["value"] == "[]").all()
    assert (web["attribute_code"] == "TOOL_LNK_PERSON").all()
    # name lookup comes from the entity dictionary actor state
    known = web[web["code"].isin(names)]
    assert len(known) > 0
    assert (known["name"] == known["code"].map(names)).all()

    # run_flagship writes the synthesized webdata sink alongside side
    out = str(tmp_path / "flagship")
    run_flagship(fixture_dir["turns"], fixture_dir["entities"], out_dir=out,
                 user_token="TOK123")
    wt = pq_.ParquetDataset(f"{out}/webdata").read().to_pandas()
    st = pq_.ParquetDataset(f"{out}/side").read()
    assert len(wt) == st.num_rows == side_count
    assert (wt["token"] == "TOK123").all()
