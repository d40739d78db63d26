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


def _partial_dedup(batch: pd.DataFrame, key: list[str]) -> pd.DataFrame:
    if "arrival_idx" in batch.columns:
        batch = batch.sort_values("arrival_idx", kind="stable")
    return batch.drop_duplicates(subset=key, keep="first")


def _first_arrival_in_conv(group: pd.DataFrame, key: list[str]) -> pd.DataFrame:
    if "arrival_idx" in group.columns:
        group = group.sort_values("arrival_idx", kind="stable")
    return group.drop_duplicates(subset=key, keep="first")


def dedup_exact(ds: rd.Dataset, key: list[str] | None = None) -> rd.Dataset:
    """Shuffle groups by key[0] ONLY (e.g. conv_id): correctness needs just
    co-location of equal full keys, and thousands of conv groups beat
    millions of (conv, turn) groups on per-group overhead. Vectorized
    drop_duplicates inside each group."""
    key = key or KEY
    ds = ds.map_batches(lambda b: _partial_dedup(b, key), batch_format="pandas")
    return ds.groupby(key[0]).map_groups(
        lambda g: _first_arrival_in_conv(g, key), batch_format="pandas")
