"""JSON wire-format ingest (≙ QDataAnswerMessage envelopes) + the V-note
message-validity semantics, incl. the faithful last-writer-wins quirk."""

import json

import pandas as pd
import pytest

from lauchy_ray.pipelines.validate import validated_stream
from lauchy_ray.sources.json_ingest import (
    answers_to_turns, message_validity, parse_lines, read_answer_messages,
)


def _msg(items, msg_type="DATA_MSG", data_type="Answer", token="tok"):
    return json.dumps({"msg_type": msg_type, "data_type": data_type,
                       "token": token, "items": items})


def _item(value, attr="TOOL_INT", src="SRC_U", tgt="CONV_X"):
    return {"sourceCode": src, "targetCode": tgt,
            "attributeCode": attr, "value": value}


@pytest.fixture(scope="module")
def jsonl_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("jsonl") / "messages-000.jsonl"
    lines = [
        _msg([_item("42"), _item("43")]),               # msg 0: all valid
        _msg([_item("nope"), _item("7")]),              # msg 1: bad then good (V-note!)
        _msg([_item("8"), _item("bad")]),               # msg 2: good then bad
        _msg([], msg_type="CMD_MSG"),                   # msg 3: gated envelope
        "{this is not json",                            # msg 4: parse error
        _msg([_item("5182A753556", attr="TOOL_ABN")]),  # msg 5: exception path
    ]
    p.write_text("\n".join(lines))
    return str(p)


def test_parse_and_flatten(jsonl_file):
    ds = read_answer_messages(jsonl_file)
    df = ds.to_pandas().sort_values(["msg_id", "item_idx"]).reset_index(drop=True)
    assert len(df) == 9  # 2+2+2 + 1 (gate) + 1 (parse error) + 1 (ABN)
    assert (df["msg_type"] == "PARSE_ERROR").sum() == 1
    assert df.loc[df["msg_id"] == 3, "msg_type"].iloc[0] == "CMD_MSG"
    assert df.loc[0, "value"] == "42" and df.loc[0, "attribute_code"] == "TOOL_INT"


def test_message_validity_modes(jsonl_file):
    turns = answers_to_turns(read_answer_messages(jsonl_file))
    validated = validated_stream(turns, use_actors=False).to_pandas()

    v_all = message_validity(validated, mode="all").set_index("msg_id")["msg_valid"]
    v_last = message_validity(validated, mode="last").set_index("msg_id")["msg_valid"]

    assert bool(v_all[0]) and bool(v_last[0])            # all-valid message
    # THE reference bug (V-note): bad answer overwritten by later good one
    assert not bool(v_all[1])
    assert bool(v_last[1])
    # good-then-bad fails under both
    assert not bool(v_all[2]) and not bool(v_last[2])
    # gated envelope passes through as valid (java:169-172)
    assert bool(v_all[3]) and bool(v_last[3])
    # ABN exception row: invalid under both (exception aborts, java:275-277)
    assert not bool(v_all[5]) and not bool(v_last[5])


def test_token_equality_check(tmp_path):
    """V1 (TopologyProducer.java:180-183): the envelope token must equal
    the supplied user token. mode="all" fails a mismatched message
    outright; mode="last" faithfully lets per-answer reassignment
    OVERWRITE the token verdict, so the mismatch only decides messages
    with no real answers (the reference loop body never runs)."""
    p = tmp_path / "messages-000.jsonl"
    lines = [
        _msg([_item("42")], token="tok"),        # 0: good token, valid answer
        _msg([_item("42")], token="WRONG"),      # 1: bad token, valid answer
        _msg([], token="WRONG"),                 # 2: bad token, NO answers
        _msg([], token="tok"),                   # 3: good token, no answers
        _msg([], msg_type="CMD_MSG", token="WRONG"),  # 4: non-Answer envelope
    ]
    p.write_text("\n".join(lines))
    turns = answers_to_turns(read_answer_messages(str(p)))
    validated = validated_stream(turns, use_actors=False).to_pandas()

    v_all = message_validity(validated, mode="all",
                             expected_token="tok").set_index("msg_id")["msg_valid"]
    v_last = message_validity(validated, mode="last",
                              expected_token="tok").set_index("msg_id")["msg_valid"]
    assert bool(v_all[0]) and bool(v_last[0])
    assert not bool(v_all[1])        # clean semantics: token mismatch fails
    assert bool(v_last[1])           # faithful: overwritten by the answer
    assert not bool(v_all[2]) and not bool(v_last[2])  # no answers: mismatch holds
    assert bool(v_all[3]) and bool(v_last[3])
    # token check sits inside the DATA_MSG/Answer branch — non-Answer
    # envelopes are never token-checked (TP:172)
    assert bool(v_all[4]) and bool(v_last[4])
    # without expected_token the check is off (round-1 behavior preserved)
    v_off = message_validity(validated, mode="all").set_index("msg_id")["msg_valid"]
    assert bool(v_off[1])


def test_parse_error_is_invalid(jsonl_file):
    turns = answers_to_turns(read_answer_messages(jsonl_file)).to_pandas()
    bad = turns[turns["parse_error"]]
    assert len(bad) == 1


def test_multi_file_unique_msg_ids(tmp_path):
    for i in range(3):
        (tmp_path / f"part-{i}.jsonl").write_text(_msg([_item("1")]))
    df = read_answer_messages(str(tmp_path)).to_pandas()
    assert df["msg_id"].nunique() == 3
