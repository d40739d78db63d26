"""Exact dedup by key — exactly-once per (conv_id, turn_idx)
(SURVEY.md §2.6: hash-partition on the key, keep the FIRST arrival).

Two-phase to keep the shuffle small (the at-scale design):
1. partial: drop duplicates WITHIN each batch (duplicates from retried
   producers are usually close together) — vectorized, no shuffle;
2. global: hash-shuffle by key (`groupby`), keep min arrival_idx per key.

Without an arrival_idx column the rows must be exact duplicates (then
keep-any == keep-first and the partial phase alone would suffice, but the
global phase still guarantees cross-batch uniqueness).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

KEY = ["conv_id", "turn_idx"]


def _partial_dedup(batch: pd.DataFrame) -> pd.DataFrame:
    if "arrival_idx" in batch.columns:
        batch = batch.sort_values("arrival_idx", kind="stable")
    return batch.drop_duplicates(subset=KEY, keep="first")


def _first_arrival(group: pd.DataFrame) -> pd.DataFrame:
    if "arrival_idx" in group.columns:
        return group.sort_values("arrival_idx", kind="stable").head(1)
    return group.head(1)


def dedup_exact(ds: rd.Dataset, key: list[str] | None = None) -> rd.Dataset:
    key = key or KEY
    ds = ds.map_batches(_partial_dedup, batch_format="pandas")
    return ds.groupby(key).map_groups(_first_arrival, batch_format="pandas")
