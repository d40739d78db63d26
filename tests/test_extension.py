"""User-extension surface (SURVEY.md §2.9): new validator kinds are a Rule
row plus a registered vectorized predicate — no engine changes."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from lauchy_ray import rules as R
from lauchy_ray.oracle import validate_table
from lauchy_ray.pipelines.validate import validated_stream
from lauchy_ray.schema import TURNS_SCHEMA


def test_custom_predicate_kind():
    @R.register_predicate("palindrome")
    def palindrome_np(values: np.ndarray) -> np.ndarray:
        return np.array([isinstance(v, str) and v == v[::-1] for v in values])

    rules = list(R.DEFAULT_RULES) + [
        R.Rule("TOOL_PAL", 0, None, "pal-invalid", "DTT_PAL", "palindrome")]

    rows = [
        {"conv_id": "C1", "turn_idx": 0, "role": "user", "text": "level",
         "tool": "TOOL_PAL", "ts": 1},
        {"conv_id": "C1", "turn_idx": 1, "role": "user", "text": "hello",
         "tool": "TOOL_PAL", "ts": 2},
        {"conv_id": "C1", "turn_idx": 2, "role": "user", "text": "abccba",
         "tool": "TOOL_PAL", "ts": 3},
    ]
    expected = validate_table(rows, rules=rules)
    assert [r["valid"] for r in expected] == [True, False, True]
    assert expected[1]["reject_reason"] == R.R_CHECKSUM_FAIL

    table = pa.table({
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": [r["role"] for r in rows],
        "text": [r["text"] for r in rows],
        "tool": [r["tool"] for r in rows],
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)
    got = validated_stream(rd.from_arrow(table), rules=rules,
                           use_actors=False).to_pandas()
    got = got.sort_values("turn_idx")
    assert got["valid"].tolist() == [True, False, True]


def test_builtin_kinds_route_through_registry():
    R._register_builtin_predicates()
    assert "abn" in R.PREDICATE_REGISTRY and "luhn" in R.PREDICATE_REGISTRY


def test_checksum_overrides_regex():
    """Reference quirk (TopologyProducer.java:228-231): for a checksum-kind
    attribute the checksum REPLACES the regex validation list — a regex row
    on the same tool is never consulted."""
    rules = list(R.DEFAULT_RULES) + [
        # a regex that would ACCEPT everything — must be ignored for kind=abn
        R.Rule("TOOL_ABN2", 0, None, "abn-invalid", "DTT_ABN", "abn"),
        R.Rule("TOOL_ABN2", 1, r".*", "never-used", "DTT_ABN", "regex"),
    ]
    rows = [
        {"conv_id": "C", "turn_idx": 0, "role": "user", "text": "51824753556",
         "tool": "TOOL_ABN2", "ts": 1},                      # checksum-valid
        {"conv_id": "C", "turn_idx": 1, "role": "user", "text": "51824753557",
         "tool": "TOOL_ABN2", "ts": 2},                      # checksum-invalid
    ]
    out = validate_table(rows, rules=rules)
    assert [r["valid"] for r in out] == [True, False]
    assert out[1]["reject_reason"] == R.R_CHECKSUM_FAIL  # regex .* did NOT rescue it
