"""Stateless scalar/text kernels.

``tidy`` ≙ the reference's mapValues normalizer
(TopologyProducer.java:134, 148-151): a fixed find/replace applied to the
raw payload BEFORE validation — order matters and is preserved by the
pipeline (tidy → validate, TopologyProducer.java:134-135).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

TIDY_FROM = "Adamm"
TIDY_TO = "Adam"


def tidy_batch(batch: pa.Table, column: str = "text") -> pa.Table:
    """Vectorized replace on the text column (zero-copy for untouched columns)."""
    fixed = pc.replace_substring(batch[column], TIDY_FROM, TIDY_TO)
    return batch.set_column(batch.schema.get_field_index(column), column, fixed)


def tidy_scalar(value: str) -> str:
    """Oracle-path tidy (Java replaceAll on a literal ≙ str.replace)."""
    return value.replace(TIDY_FROM, TIDY_TO) if value is not None else value
