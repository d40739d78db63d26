"""events → turns bridge: a canonical, deterministic derivation of the
transcript table (BASELINE.json input_hint schema) from the provided
``events`` table, implemented TWICE from one spec:

- :func:`derive_turns` — the Ray Data implementation (vectorized pandas /
  numpy inside map_batches + one groupby shuffle for per-conv ranking);
- :func:`turns_sql` / :func:`validated_sql` — the equivalent DuckDB SQL
  (CTE text) over the pre-registered ``events`` view.

The driver's correctness gate runs both sides at sf=0.01 and compares
row sets, so every constant below (tool routing mods, text pools, the
rules dictionary) must be THE single source for both. Tests assert
Ray == DuckDB on sf0.001 so drift is caught locally first.

Derivation spec (all arithmetic on int64 event_id/user_id — no floats):

  conv_id  = 'CONV_' || printf('%06d', user_id)   (NOT lpad — lpad truncates
             past 6 digits; printf matches Python's non-truncating 06d)
  turn_idx = row_number() over (partition by user_id order by ts, event_id) - 1
  arrival_idx = event_id            (the log's arrival sequence)
  role     = 'intruder' if event_id % 37 == 0 else
             {click,view→user; signup→system; purchase→assistant; error→tool}
  tool     = overrides first-match: %41→TOOL_UNKNOWN, %43→'' (gate),
             %47→TOOL_FORBIDDEN; else by event_type:
             click→TOOL_TEXT view→TOOL_DATE signup→TOOL_EMAIL
             purchase→TOOL_ABN/TOOL_CC (event_id parity)
             error→TOOL_INT/TOOL_MULTI/TOOL_LNK_PERSON (event_id % 3)
  text     = per-tool CASE over event_id mods (see _TEXT spec inline),
             mixing valid/invalid payloads incl. 'Adamm' (tidy), '[]'
             (side output), checksum pools, and props passthrough.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from . import rules as R
from .datagen import _gen_valid_abns, _gen_valid_ccs
from .functions.checksums import ABN_SQL, LUHN_SQL

# Deterministic checksum pools, shared verbatim by both implementations.
_rng = np.random.default_rng(20260101)
ABN_OK = _gen_valid_abns(_rng, 5)
ABN_BAD = [a[:-1] + str((int(a[-1]) + 1) % 10) for a in ABN_OK]
CC_OK = _gen_valid_ccs(_rng, 5)
CC_BAD = [c[:-1] + str((int(c[-1]) + 1) % 10) for c in CC_OK]

_ROLE_MAP = {"click": "user", "view": "user", "signup": "system",
             "purchase": "assistant", "error": "tool"}
_BASE_TOOL = {"click": "TOOL_TEXT", "view": "TOOL_DATE", "signup": "TOOL_EMAIL"}
_ERROR_TOOLS = ["TOOL_INT", "TOOL_MULTI", "TOOL_LNK_PERSON"]
_MULTI_POOL = ["123", "abc", "AB12", "xyz!", "AB1"]
_INT_POOL_BAD = "12.5"
_LNK_POOL = ["[]", "bad value!", "person_link-2", "person_link-3"]


# ---------------------------------------------------------------- Ray side

def _rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
    """Per-conversation rank for EVERY user in one collocated bucket,
    vectorized: one sort by (user_id, ts, event_id), ranks via cumcount —
    O(buckets) Python calls instead of one per user (the scale-safe form
    for millions of conversations)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable").copy()
    g["turn_idx"] = g.groupby("user_id", sort=False).cumcount().astype(np.int32)
    return g.drop(columns=["__bucket"], errors="ignore")


def _derive_batch(df: pd.DataFrame) -> pd.DataFrame:
    eid = df["event_id"].to_numpy()
    uid = df["user_id"].to_numpy()
    etype = df["event_type"]

    # vectorized CONV_%06d (hot path — a Python format lambda per row was
    # the turns-derive bottleneck). pandas str.zfill, NOT np.char.zfill:
    # np.char's fixed-itemsize output TRUNCATES ids past 6 digits, while
    # str.zfill matches printf %06d (pads, never truncates) — the
    # adversarial wide-id fixture exists to catch exactly this
    conv_id = ("CONV_" + pd.Series(uid).astype("str").str.zfill(6)) \
        .to_numpy(dtype=object)

    # .fillna defaults mirror the SQL CASE ELSE arms exactly: an event_type
    # outside the five known values must derive identically on both sides
    role = etype.map(_ROLE_MAP).fillna("tool").to_numpy(dtype=object)
    role[eid % 37 == 0] = "intruder"

    tool = etype.map(_BASE_TOOL).to_numpy(dtype=object)
    purchase = (etype == "purchase").to_numpy()
    tool[purchase & (eid % 2 == 0)] = "TOOL_ABN"
    tool[purchase & (eid % 2 == 1)] = "TOOL_CC"
    # SQL ELSE arm: anything not click/view/signup/purchase routes by id%3
    err = (~etype.isin(["click", "view", "signup", "purchase"])).to_numpy()
    for k in range(3):
        tool[err & (eid % 3 == k)] = _ERROR_TOOLS[k]
    # overrides, LAST applied wins ⇒ apply in reverse CASE order
    tool[eid % 47 == 0] = "TOOL_FORBIDDEN"
    tool[eid % 43 == 0] = ""
    tool[eid % 41 == 0] = "TOOL_UNKNOWN"

    text = np.array(["payload " + str(e % 100) for e in eid % 100], dtype=object)
    m = tool == "TOOL_TEXT"
    if m.any():
        mod = eid % 10
        t = np.array(["hello world " + str(e) for e in eid % 1000], dtype=object)
        t[mod == 0] = ""
        sel = m & (mod == 1)
        t[sel] = np.array(["Adamm says " + str(u) for u in uid[sel]], dtype=object)
        sel = m & (mod == 2)
        t[sel] = df["props"].to_numpy(dtype=object)[sel]
        text[m] = t[m]
    m = tool == "TOOL_DATE"
    if m.any():
        dates = df["ts"].dt.strftime("%Y-%m-%d").to_numpy(dtype=object)
        dates[eid % 10 == 0] = "Jan 1 2024"
        text[m] = dates[m]
    m = tool == "TOOL_EMAIL"
    if m.any():
        emails = np.array(["user" + str(u) + "@example.com" for u in uid], dtype=object)
        emails[eid % 3 == 0] = "not-an-email"
        text[m] = emails[m]
    m = tool == "TOOL_ABN"
    if m.any():
        pool = np.where(eid % 3 == 0, np.array(ABN_BAD, object)[eid % 5],
                        np.array(ABN_OK, object)[eid % 5])
        text[m] = pool[m]
    m = tool == "TOOL_CC"
    if m.any():
        pool = np.where(eid % 3 == 0, np.array(CC_BAD, object)[eid % 5],
                        np.array(CC_OK, object)[eid % 5])
        text[m] = pool[m]
    m = tool == "TOOL_INT"
    if m.any():
        ints = np.array([str(e % 100000) for e in eid], dtype=object)
        ints[eid % 4 == 0] = _INT_POOL_BAD
        neg = m & (eid % 4 == 1)
        ints[neg] = np.array(["-" + str(e % 50) for e in eid[neg]], dtype=object)
        text[m] = ints[m]
    m = tool == "TOOL_MULTI"
    if m.any():
        text[m] = np.array(_MULTI_POOL, object)[eid % 5][m]
    m = tool == "TOOL_LNK_PERSON"
    if m.any():
        text[m] = np.array(_LNK_POOL, object)[eid % 4][m]

    return pd.DataFrame({
        "conv_id": conv_id,
        "turn_idx": df["turn_idx"].astype("int32"),
        "role": role,
        "text": text,
        "tool": tool,
        "ts": df["ts"],
        "arrival_idx": eid,
    })


def derive_turns(events: rd.Dataset) -> rd.Dataset:
    """events Dataset → canonical turns Dataset. The per-conversation rank
    shuffles on a BOUNDED bucket of user_id (co-locating each user's rows)
    and ranks all users of a bucket in one vectorized pass — never one
    Python group call per conversation."""
    from .stages.bucketing import group_map_by_key
    ranked = group_map_by_key(events, "user_id", _rank_bucket)
    return ranked.map_batches(_derive_batch, batch_format="pandas")


# ---------------------------------------------------------------- SQL side

def _sq(values: list[str]) -> str:
    return "[" + ", ".join("'" + v + "'" for v in values) + "]"


def turns_cte(events_rel: str = "events") -> str:
    """WITH-clause body deriving ``turns`` from the events view. DuckDB
    string/list indexing is 1-based, hence the ``+ 1`` on every pool index."""
    return f"""
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INTEGER) AS turn_idx
  FROM {events_rel}
),
turns AS (
  SELECT
    'CONV_' || printf('%06d', user_id) AS conv_id,  -- printf does NOT
    -- truncate past 6 digits (lpad does), matching the Python 06d format
    turn_idx,
    CASE WHEN event_id % 37 = 0 THEN 'intruder'
         WHEN event_type IN ('click', 'view') THEN 'user'
         WHEN event_type = 'signup' THEN 'system'
         WHEN event_type = 'purchase' THEN 'assistant'
         ELSE 'tool' END AS role,
    CASE tool
      WHEN 'TOOL_TEXT' THEN (CASE event_id % 10
        WHEN 0 THEN ''
        WHEN 1 THEN 'Adamm says ' || CAST(user_id AS VARCHAR)
        WHEN 2 THEN props
        ELSE 'hello world ' || CAST(event_id % 1000 AS VARCHAR) END)
      WHEN 'TOOL_DATE' THEN (CASE WHEN event_id % 10 = 0 THEN 'Jan 1 2024'
        ELSE strftime(ts, '%Y-%m-%d') END)
      WHEN 'TOOL_EMAIL' THEN (CASE WHEN event_id % 3 = 0 THEN 'not-an-email'
        ELSE 'user' || CAST(user_id AS VARCHAR) || '@example.com' END)
      WHEN 'TOOL_ABN' THEN (CASE WHEN event_id % 3 = 0
        THEN ({_sq(ABN_BAD)})[CAST(event_id % 5 AS INT) + 1]
        ELSE ({_sq(ABN_OK)})[CAST(event_id % 5 AS INT) + 1] END)
      WHEN 'TOOL_CC' THEN (CASE WHEN event_id % 3 = 0
        THEN ({_sq(CC_BAD)})[CAST(event_id % 5 AS INT) + 1]
        ELSE ({_sq(CC_OK)})[CAST(event_id % 5 AS INT) + 1] END)
      WHEN 'TOOL_INT' THEN (CASE WHEN event_id % 4 = 0 THEN '{_INT_POOL_BAD}'
        WHEN event_id % 4 = 1 THEN '-' || CAST(event_id % 50 AS VARCHAR)
        ELSE CAST(event_id % 100000 AS VARCHAR) END)
      WHEN 'TOOL_MULTI' THEN ({_sq(_MULTI_POOL)})[CAST(event_id % 5 AS INT) + 1]
      WHEN 'TOOL_LNK_PERSON' THEN ({_sq(_LNK_POOL)})[CAST(event_id % 4 AS INT) + 1]
      ELSE 'payload ' || CAST(event_id % 100 AS VARCHAR)
    END AS text,
    tool, ts,
    event_id AS arrival_idx
  FROM (
    SELECT *,
      CASE WHEN event_id % 41 = 0 THEN 'TOOL_UNKNOWN'
           WHEN event_id % 43 = 0 THEN ''
           WHEN event_id % 47 = 0 THEN 'TOOL_FORBIDDEN'
           WHEN event_type = 'click' THEN 'TOOL_TEXT'
           WHEN event_type = 'view' THEN 'TOOL_DATE'
           WHEN event_type = 'signup' THEN 'TOOL_EMAIL'
           WHEN event_type = 'purchase' THEN
             (CASE WHEN event_id % 2 = 0 THEN 'TOOL_ABN' ELSE 'TOOL_CC' END)
           ELSE (CASE CAST(event_id % 3 AS INT) WHEN 0 THEN 'TOOL_INT'
                 WHEN 1 THEN 'TOOL_MULTI' ELSE 'TOOL_LNK_PERSON' END)
      END AS tool
    FROM ranked
  )
)"""


def validated_cte(events_rel: str = "events") -> str:
    """turns + rules + validated (valid, reject_reason, side) — the SQL mirror
    of oracle.validate_row's check order over the bridge profile (no entity
    dictionary)."""
    abn = ABN_SQL.format(v="t.text")
    luhn = LUHN_SQL.format(v="t.text")
    return f"""{turns_cte(events_rel)},
{R.rules_sql_cte()},
tool_meta AS (
  SELECT tool, any_value(kind) AS kind, any_value(allowed_roles) AS allowed
  FROM rules GROUP BY tool
),
tidied AS (
  -- mirrors the engine's null filter (_drop_null_text ≙ java:133):
  -- a NULL-props event routed to the props text arm derives NULL text
  SELECT conv_id, turn_idx, role, replace(text, 'Adamm', 'Adam') AS text,
         tool, ts, arrival_idx
  FROM turns
  WHERE text IS NOT NULL
),
validated AS (
  SELECT t.*,
    CASE
      WHEN t.tool = '' THEN ''
      WHEN t.role = 'intruder' THEN '{R.R_SOURCE_MISMATCH}'
      WHEN m.tool IS NULL THEN '{R.R_ATTR_UNKNOWN}'
      WHEN NOT list_contains(m.allowed, t.role) THEN '{R.R_ATTR_NOT_ALLOWED}'
      WHEN m.kind = 'abn' THEN
        (CASE WHEN {abn} THEN ''
              WHEN NOT regexp_full_match(t.text, '[0-9]+') THEN '{R.R_EXCEPTION}'
              ELSE '{R.R_CHECKSUM_FAIL}' END)
      WHEN m.kind = 'luhn' THEN
        (CASE WHEN {luhn} THEN ''
              WHEN NOT regexp_full_match(t.text, '[0-9]*') THEN '{R.R_EXCEPTION}'
              ELSE '{R.R_CHECKSUM_FAIL}' END)
      WHEN EXISTS (SELECT 1 FROM rules r
                   WHERE r.tool = t.tool AND r.kind = 'regex'
                     AND regexp_full_match(t.text, r.regex))
        THEN ''
      ELSE '{R.R_REGEX_FAIL}'
    END AS reject_reason,
    (t.tool = '{R.SIDE_OUTPUT_TOOL}' AND t.text = '{R.SIDE_OUTPUT_VALUE}'
     AND t.role <> 'intruder') AS side
  FROM tidied t LEFT JOIN tool_meta m USING (tool)
),
validated_full AS (
  SELECT conv_id, turn_idx, role, text, tool, ts, arrival_idx,
         reject_reason = '' AS valid, reject_reason, side
  FROM validated
)"""
