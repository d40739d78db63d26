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


def _first_arrival_in_bucket(group: pd.DataFrame, key: list[str]) -> pd.DataFrame:
    """Keep-first for EVERY key collocated in one bucket, vectorized: one
    stable sort by arrival, one drop_duplicates over the full key."""
    if "arrival_idx" in group.columns:
        group = group.sort_values("arrival_idx", kind="stable")
    return group.drop_duplicates(subset=key, keep="first") \
        .drop(columns=["__bucket"], errors="ignore")


def dedup_exact(ds: rd.Dataset, key: list[str] | None = None,
                salt: int = 1) -> rd.Dataset:
    """Shuffle on a BOUNDED hash bucket of key[0] (e.g. conv_id):
    correctness needs only co-location of equal full keys, and O(buckets)
    vectorized group passes beat one Python call per conversation (the
    scale-safe form for millions of keys). Vectorized drop_duplicates
    inside each bucket.

    salt (explicit hot-key skew handling, north_star): with salt > 1 the
    shuffle key becomes (bucket, key[1] % salt) — still a pure function
    of the FULL key, so equal keys co-locate, but a hot conversation's
    rows split ``salt`` ways instead of serializing in one bucket."""
    from .bucketing import group_map_by_key, n_buckets_for, with_bucket
    key = key or KEY
    raw = ds  # size/bucket estimates come from the RAW input: the partial
    # dedup below is transformed lineage whose safe_size_bytes is None
    ds = ds.map_batches(lambda b: _partial_dedup(b, key), batch_format="pandas")
    if salt > 1 and len(key) > 1:
        nb = n_buckets_for(raw)
        ds = ds.map_batches(lambda b: with_bucket(b, key[0], nb),
                            batch_format="pandas")
        sub = key[1]

        def add_salt(b: pd.DataFrame) -> pd.DataFrame:
            return b.assign(_salt=(b[sub].astype("int64") % salt))

        return (ds.map_batches(add_salt, batch_format="pandas")
                .groupby(["__bucket", "_salt"])
                .map_groups(lambda g: _first_arrival_in_bucket(g, key)
                            .drop(columns=["_salt"]), batch_format="pandas"))
    return group_map_by_key(ds, key[0],
                            lambda g: _first_arrival_in_bucket(g, key),
                            size_ds=raw)
