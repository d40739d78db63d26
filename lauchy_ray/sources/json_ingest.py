"""JSON ingest: the reference's actual wire format.

lauchy consumes JSON ``QDataAnswerMessage`` envelopes from Kafka
(TopologyProducer.java:131, 167, 178)::

    {"msg_type": "DATA_MSG", "data_type": "Answer", "token": "...",
     "items": [{"sourceCode": "...", "targetCode": "...",
                "attributeCode": "...", "value": "..."}, ...]}

This module flattens JSONL files of such envelopes into per-answer rows
(``flat_map`` shape, SURVEY.md §2.2 M8) and maps them onto the engine's
turns schema, so a user of the reference can point their message log at
this engine unchanged.

Message-level validity (SURVEY.md V-note): inside the reference's
per-answer loop ``valid`` is REASSIGNED per answer with no break
(java:185-273), so the message's verdict is the verdict of the LAST
answer — an early failing answer is overwritten by a later passing one —
except that a thrown exception aborts the loop and fails the whole
message (java:275-277). :func:`message_validity` offers:

- mode="all"  — the clean semantics (message valid iff every answer valid);
- mode="last" — the reference's faithful last-writer-wins behavior,
  exception-aborts included (rows with reject_reason == "exception" fail
  the message regardless of position).

Malformed JSON lines are routed to rows with ``tool=""`` + parse_error
semantics? No — faithfully to java:275-277, a message that fails to parse
is INVALID as a whole; we emit one synthetic row per bad line with
msg_type="PARSE_ERROR" so nothing is silently dropped.
"""

from __future__ import annotations

import json

import pandas as pd
import pyarrow as pa
import ray.data as rd

ANSWERS_SCHEMA = pa.schema([
    ("msg_id", pa.int64()),
    ("item_idx", pa.int32()),
    ("msg_type", pa.string()),
    ("data_type", pa.string()),
    ("token", pa.string()),
    ("source_code", pa.string()),
    ("target_code", pa.string()),
    ("attribute_code", pa.string()),
    ("value", pa.string()),
])


def parse_lines(lines: list[str], base_msg_id: int = 0) -> pa.Table:
    """JSONL envelope lines → flattened per-answer Arrow table."""
    rows = {name: [] for name in ANSWERS_SCHEMA.names}

    def emit(mid, idx, mtype, dtype, token, src, tgt, attr, val):
        rows["msg_id"].append(mid)
        rows["item_idx"].append(idx)
        rows["msg_type"].append(mtype)
        rows["data_type"].append(dtype)
        rows["token"].append(token)
        rows["source_code"].append(src)
        rows["target_code"].append(tgt)
        rows["attribute_code"].append(attr)
        rows["value"].append(val)

    for i, line in enumerate(lines):
        mid = base_msg_id + i
        # parse the WHOLE message before emitting anything: a throw anywhere
        # fails the message atomically (≙ java:275-277) — no partial rows
        try:
            msg = json.loads(line)
            items = msg.get("items") or []
            staged = []
            if not items:
                # synthetic carrier row for an empty-items envelope:
                # item_idx = -1 marks it as NOT a real answer (the
                # reference's per-answer loop never runs, TP:185), so
                # message-level verdicts can exclude it
                staged.append((mid, -1, str(msg.get("msg_type", "")),
                               str(msg.get("data_type", "")),
                               str(msg.get("token", "")), "", "", "", ""))
            for k, item in enumerate(items):
                staged.append((mid, k, str(msg.get("msg_type", "")),
                               str(msg.get("data_type", "")),
                               str(msg.get("token", "")),
                               str(item.get("sourceCode", "")),
                               str(item.get("targetCode", "")),
                               str(item.get("attributeCode", "")),
                               str(item.get("value", ""))))
            for row in staged:
                emit(*row)
        except (json.JSONDecodeError, AttributeError, TypeError):
            emit(mid, 0, "PARSE_ERROR", "", "", "", "", "", "")
    rows["item_idx"] = pa.array(rows["item_idx"], pa.int32())
    rows["msg_id"] = pa.array(rows["msg_id"], pa.int64())
    return pa.table(rows, schema=ANSWERS_SCHEMA)


def read_answer_messages(path: str) -> rd.Dataset:
    """JSONL file(s) of QDataAnswerMessage envelopes → per-answer Dataset.
    One task per file (scales with file count); msg_id = (file_ordinal <<
    32) | line_number — globally unique and deterministic, like
    sources.stream arrival ids."""
    import glob
    import os
    files = ([path] if os.path.isfile(path)
             else sorted(glob.glob(os.path.join(path, "*.jsonl"))
                         + glob.glob(os.path.join(path, "*.json"))))

    def load(batch: dict) -> pa.Table:
        p, ordinal = batch["path"][0], int(batch["ordinal"][0])
        with open(p) as f:
            lines = f.read().splitlines()
        return parse_lines(lines, base_msg_id=ordinal << 32)

    items = [{"path": p, "ordinal": i} for i, p in enumerate(files)]
    return rd.from_items(items).map_batches(load, batch_size=1,
                                            batch_format="numpy")


def answers_to_turns(answers: rd.Dataset) -> rd.Dataset:
    """Map flattened answers onto the engine's turns schema:
    conv_id ≙ sourceCode (the token user's entity), turn_idx ≙ item_idx,
    role ≙ 'user' for DATA_MSG/Answer envelopes ('gate' rows keep tool="" →
    validated as pass-through, java:169-172), tool ≙ attributeCode,
    text ≙ value, ts synthesized from msg order (the wire format carries no
    event time; a production feed would map a header timestamp here)."""
    def conv(df: pd.DataFrame) -> pd.DataFrame:
        gated = ~((df["msg_type"] == "DATA_MSG") & (df["data_type"] == "Answer"))
        out = pd.DataFrame({
            "conv_id": df["source_code"].where(df["source_code"] != "", "UNKNOWN"),
            "turn_idx": df["item_idx"].astype("int32"),
            "role": "user",
            "text": df["value"],
            "tool": df["attribute_code"].where(~gated, ""),
            # carried for the message-level token-equality check (V1,
            # TP:180-183) — compared in message_validity, not per turn
            "token": df["token"],
            "answer_msg": ~gated,
            "real_item": df["item_idx"] >= 0,
            # synthesized event time, BOUNDED for the ns-datetime range and
            # MONOTONE within a file: one day per file ordinal (mod 50y),
            # one second per line (line < 2^32 → ≤136y; 2026+50+136 < the
            # ns max of 2262). A production feed maps a real header ts here.
            "ts": pd.to_datetime(
                1_767_225_600_000_000  # 2026-01-01 epoch-us
                + ((df["msg_id"] // (1 << 32)) % 18250) * 86_400_000_000
                + (df["msg_id"] % (1 << 32)) * 1_000_000
                + df["item_idx"], unit="us"),
            "msg_id": df["msg_id"],
            "parse_error": df["msg_type"] == "PARSE_ERROR",
        })
        return out
    return answers.map_batches(conv, batch_format="pandas")


def message_validity(validated: pd.DataFrame, mode: str = "all",
                     expected_token: str | None = None) -> pd.DataFrame:
    """Per-message verdict from per-answer validation results.

    mode="all": message valid iff all its answers are valid (clean).
    mode="last": the reference's last-writer-wins (see module docstring) —
    the verdict of the highest item_idx, except any "exception" row (or
    parse error) fails the message.

    expected_token (V1, TopologyProducer.java:180-183): the user token the
    envelope's token must equal. A mismatch sets the message invalid
    BEFORE the per-answer loop — under mode="all" that fails the message
    outright; under mode="last" it is faithfully OVERWRITTEN by the
    per-answer reassignment, so it only decides messages with NO real
    answers (the reference loop body never runs, valid keeps the token
    verdict). Only DATA_MSG/Answer envelopes are checked (the token code
    sits inside that branch; others pass the gate, TP:172/initial
    valid=true at TP:161).
    → DataFrame (msg_id, msg_valid)."""
    df = validated
    # one shared parse-error series: unparseable messages are INVALID as a
    # whole under either mode (java:275-277), even though their synthetic
    # gate row validates as pass-through
    parse_err = (df.get("parse_error", pd.Series(False, index=df.index))
                 .groupby(df["msg_id"]).any())
    if expected_token is not None and "token" in df.columns:
        is_ans = df.get("answer_msg", pd.Series(True, index=df.index))
        tok_bad = (((df["token"] != expected_token) & is_ans)
                   .groupby(df["msg_id"]).any())
    else:
        tok_bad = pd.Series(False, index=parse_err.index)
    if mode == "all":
        agg = df.groupby("msg_id")["valid"].all() & ~parse_err & ~tok_bad
    elif mode == "last":
        real = df.get("real_item", pd.Series(True, index=df.index))
        real_rows = df[real.astype(bool)]
        ordered = real_rows.sort_values(["msg_id", "turn_idx"], kind="stable")
        last = ordered.groupby("msg_id")["valid"].last()
        # messages with no real answers keep the pre-loop verdict: the
        # token check's (TP:181-183), else the initial valid=true (TP:161)
        last = last.reindex(parse_err.index)
        no_answers = last.isna()
        last[no_answers] = ~tok_bad[no_answers]
        exc = (df["reject_reason"] == "exception").groupby(df["msg_id"]).any()
        agg = last.astype(bool) & ~exc & ~parse_err
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return agg.rename("msg_valid").reset_index()
