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

GAP_US = 30 * 60 * 1_000_000
HOUR_US = 3600 * 1_000_000
Q15_US = 900 * 1_000_000
LATENESS_US = 5 * 60 * 1_000_000


def _rows_to_table(rows: list[dict]) -> pa.Table:
    if not rows:
        return pa.table({})
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    return pa.table(cols)


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
    for name, data in [("golden_valid", valid), ("golden_rejected", rejected),
                       ("golden_sessions", sessions),
                       ("golden_window_counts", w_tumb),
                       ("golden_window_counts_sliding", w_slide),
                       ("golden_late", late)]:
        p = os.path.join(out_dir, f"{name}.parquet")
        pq.write_table(_rows_to_table(data), p)
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
