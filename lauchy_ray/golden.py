"""Golden-expectation artifacts (FIXTURES.md §5): for a fixture directory,
emit the oracle-computed expected outputs as parquet files, sorted by
(conv_id, turn_idx) — the exact row sets the engine must reproduce.

    python -m lauchy_ray.golden /tmp/fx            # writes /tmp/fx/golden/

Files: golden_valid / golden_rejected (full rows + reject_reason),
golden_sessions (gap=30min), golden_window_counts (tumbling 1h; sliding
1h/15min alongside), golden_late (lateness=5min), plus the
blacklist-off variant row count in golden_meta.json.
"""

from __future__ import annotations

import json
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

from . import oracle
# the one canonical set of windowing constants (pipelines/queries.py) —
# golden artifacts must pin the SAME parameters the engine queries use
from .pipelines.queries import GAP_US, HOUR_US, LATENESS_US, Q15_US

_VALIDATED_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()), ("role", pa.string()),
    ("text", pa.string()), ("tool", pa.string()), ("ts", pa.int64()),
    ("valid", pa.bool_()), ("reject_reason", pa.string()), ("side", pa.bool_()),
])
_SESSIONS_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("session_id", pa.int64()),
    ("start_ts", pa.int64()), ("end_ts", pa.int64()), ("n_turns", pa.int64()),
])
_WINDOWS_SCHEMA = pa.schema([
    ("window_id", pa.int64()), ("role", pa.string()), ("tool", pa.string()),
    ("n_valid", pa.int64()), ("n_rejected", pa.int64()),
])
_LATE_SCHEMA = pa.schema(list(_VALIDATED_SCHEMA)[:6] + [("late", pa.bool_())])


def _rows_to_table(rows: list[dict], schema: pa.Schema) -> pa.Table:
    """Typed even when empty — consumers must see the expected columns."""
    return pa.Table.from_pylist(
        [{f.name: r.get(f.name) for f in schema} for r in rows], schema=schema)


def write_golden(fixture_dir: str) -> dict[str, str]:
    turns = pq.ParquetDataset(os.path.join(fixture_dir, "turns")).read()
    turns = turns.set_column(turns.schema.get_field_index("ts"), "ts",
                             turns["ts"].cast(pa.int64()))
    entities = pq.read_table(os.path.join(fixture_dir, "entities.parquet"),
                             columns=["code"])["code"].to_pylist()
    rows = turns.to_pylist()

    validated = oracle.validate_table(rows, entity_codes=set(entities))
    key = lambda r: (r["conv_id"], r["turn_idx"], r["ts"], r["text"])  # noqa: E731
    valid = sorted((r for r in validated if r["valid"]), key=key)
    rejected = sorted((r for r in validated if not r["valid"]), key=key)
    sessions = oracle.sessionize_rows(rows, GAP_US)
    w_tumb = oracle.window_counts_rows(validated, HOUR_US)
    w_slide = oracle.window_counts_rows(validated, HOUR_US, Q15_US)
    late = [r for r in oracle.late_rows(rows, LATENESS_US) if r["late"]]
    passthrough = oracle.validate_table(rows, entity_codes=set(entities),
                                        enable_blacklist=False)

    out_dir = os.path.join(fixture_dir, "golden")
    os.makedirs(out_dir, exist_ok=True)
    paths = {}
    for name, data, schema in [
            ("golden_valid", valid, _VALIDATED_SCHEMA),
            ("golden_rejected", rejected, _VALIDATED_SCHEMA),
            ("golden_sessions", sessions, _SESSIONS_SCHEMA),
            ("golden_window_counts", w_tumb, _WINDOWS_SCHEMA),
            ("golden_window_counts_sliding", w_slide, _WINDOWS_SCHEMA),
            ("golden_late", late, _LATE_SCHEMA)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(_rows_to_table(data, schema), p)
        paths[name] = p
    meta = {"n_rows": len(rows), "n_valid": len(valid),
            "n_rejected": len(rejected), "n_late": len(late),
            "blacklist_off_all_valid": all(r["valid"] for r in passthrough)}
    with open(os.path.join(out_dir, "golden_meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    paths["meta"] = os.path.join(out_dir, "golden_meta.json")
    return paths


if __name__ == "__main__":
    print(json.dumps(write_golden(sys.argv[1])))
