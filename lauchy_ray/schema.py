"""Arrow schemas for the engine's tables (≙ BASELINE.json input_hint).

The reference's wire format is schema-on-read JSON over Kafka
(TopologyProducer.java:131, 167); here every stream is a fixed-schema
Parquet-backed ``ray.data.Dataset`` of turns.
"""

from __future__ import annotations

import pyarrow as pa

TURNS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),      # session & partition key (≙ Kafka key / token user)
    ("turn_idx", pa.int32()),      # per-conv sequence number; stable ordering
    ("role", pa.string()),         # ≙ Answer.sourceCode role-analog
    ("text", pa.string()),         # ≙ Answer.value — the validated payload
    ("tool", pa.string()),         # ≙ Answer.attributeCode — selects the rule
    ("ts", pa.timestamp("us")),    # event time; basis for watermarks & windows
])

# Columns appended by the validator stage.
VALIDATED_EXTRA = pa.schema([
    ("valid", pa.bool_()),
    ("reject_reason", pa.string()),  # "" when valid
    ("side", pa.bool_()),            # side-output trigger (≙ webdata special case)
])

ENTITIES_SCHEMA = pa.schema([
    ("code", pa.string()),
    ("name", pa.string()),
    ("def_code", pa.string()),
])

SESSIONS_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("session_id", pa.int32()),
    ("start_ts", pa.timestamp("us")),
    ("end_ts", pa.timestamp("us")),
    ("n_turns", pa.int64()),
])
