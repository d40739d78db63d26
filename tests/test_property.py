"""Property-based oracle equivalence (SURVEY.md §5.6): random transcripts →
the distributed engine and the pure-Python oracle must agree exactly."""

import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lauchy_ray.oracle import validate_table
from lauchy_ray.pipelines.validate import validated_stream
from lauchy_ray.schema import TURNS_SCHEMA

TOOLS = ["TOOL_TEXT", "TOOL_EMAIL", "TOOL_INT", "TOOL_DATE", "TOOL_MULTI",
         "TOOL_ABN", "TOOL_CC", "TOOL_LNK_PERSON", "TOOL_FORBIDDEN",
         "TOOL_UNKNOWN", ""]
ROLES = ["user", "assistant", "tool", "system", "intruder", "ghost"]

turn_strategy = st.fixed_dictionaries({
    "conv_id": st.sampled_from(["CONV_A", "CONV_B", "CONV_C"]),
    "turn_idx": st.integers(0, 100),
    "role": st.sampled_from(ROLES),
    "text": st.one_of(
        st.text(max_size=40),
        st.sampled_from(["", "[]", "Adamm x", "51824753556", "4539578763621486",
                         "123", "abc", "AB12", "user1@example.com", "2026-01-01",
                         "-42", "12.5", "héllo ©", "line\nbreak", "5182A753556"])),
    "tool": st.sampled_from(TOOLS),
    "ts": st.integers(1_700_000_000_000_000, 1_800_000_000_000_000),
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(turn_strategy, min_size=1, max_size=60))
def test_engine_matches_oracle_on_random_transcripts(rows):
    table = pa.table({
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": [r["role"] for r in rows],
        "text": [r["text"] for r in rows],
        "tool": [r["tool"] for r in rows],
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)
    expected = validate_table([dict(r) for r in rows])
    got = validated_stream(rd.from_arrow(table), use_actors=False).to_pandas()
    key = ["conv_id", "turn_idx", "ts", "text", "role", "tool"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    exp = pd.DataFrame(expected)
    exp["ts"] = pd.to_datetime(exp["ts"], unit="us").astype("datetime64[us]")
    exp = exp.sort_values(key, kind="stable").reset_index(drop=True)
    for col in ["valid", "reject_reason", "side", "text"]:
        assert got[col].tolist() == exp[col].tolist(), f"{col} mismatch"
