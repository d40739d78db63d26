"""Watermark-driven late-turn handling (north_star; SURVEY.md §2.6/§7.3-7).

Semantics (matches oracle.late_rows): a turn is LATE iff its event time is
more than ``lateness`` behind its conversation's running-max event time *at
arrival* — arrival order being the deterministic (fragment, row) sequence
from sources.stream.read_stream (≙ Kafka per-partition offset order).

Distributed shape: the running max only involves rows of the SAME conv_id,
so shuffling on a hash BUCKET of conv_id (stages/bucketing — bucket count
scales with input size) co-locates each conversation and a single
vectorized pass flags every conv in the bucket — equivalent to the
reference's per-partition watermark tracker and deterministic under any
Ray scheduling. Per-task state is one bucket (~TARGET_BUCKET_BYTES of
rows), and the per-conv running max is a C-level grouped cummax.

``late_split`` routes late rows to their own sink (out/late/) per policy;
``watermark_of`` reports the global low-watermark = min over conv maxima −
lateness (what a streaming emission gate would compare window ends to).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

DEFAULT_LATENESS_US = 5 * 60 * 1_000_000


def _flag_bucket(group: pd.DataFrame, lateness_us: int) -> pd.DataFrame:
    """Late-flag EVERY conversation in one bucket, vectorized: one sort by
    (conv, arrival), per-conv running max via pandas' C-level groupby
    cummax shifted one row (masked at conv boundaries) — O(buckets)
    Python calls, never one per conversation."""
    g = group.sort_values(["conv_id", "arrival_idx"], kind="stable").copy()
    ts = g["ts"].astype("int64")
    conv = g["conv_id"].to_numpy()
    first = np.ones(len(g), dtype=bool)
    if len(g) > 1:
        first[1:] = conv[1:] != conv[:-1]
    # cummax WITHIN conv; previous row's value = running max over prior
    # arrivals of the same conv (exclusive); conv-first rows never late.
    # INT64 end-to-end: Series.shift would promote to float64 (NaN fill)
    # and round timestamps past 2^53 — slice with numpy instead.
    cmax = ts.groupby(g["conv_id"], sort=False).cummax().to_numpy()
    prev_max = np.empty(len(g), dtype=np.int64)
    if len(g):
        prev_max[0] = 0
        prev_max[1:] = cmax[:-1]
    prev_max[first] = np.iinfo(np.int64).min // 2
    g["late"] = ts.to_numpy() < prev_max - lateness_us
    return g.drop(columns=["__bucket"], errors="ignore")


def flag_late(ds: rd.Dataset, lateness_us: int = DEFAULT_LATENESS_US) -> rd.Dataset:
    """turns (with arrival_idx) → turns + late:bool."""
    from .bucketing import group_map_by_key
    return group_map_by_key(ds, "conv_id",
                            lambda g: _flag_bucket(g, lateness_us))


def late_split(ds: rd.Dataset, lateness_us: int = DEFAULT_LATENESS_US):
    """Two LAZY branches over the flagged stream. Consuming both re-runs
    the conv_id shuffle (Ray derived Datasets don't share subplans) — at
    the 10^12-turn envelope that 2x recompute is the right trade against
    materializing the whole flagged corpus in the object store. Callers
    that want one pass should consume ``flag_late`` directly and route
    per batch (as state/streaming does)."""
    flagged = flag_late(ds, lateness_us)
    on_time = flagged.map_batches(lambda df: df[~df["late"]], batch_format="pandas")
    late = flagged.map_batches(lambda df: df[df["late"]], batch_format="pandas")
    return on_time, late


def watermark_of(ds: rd.Dataset, lateness_us: int = DEFAULT_LATENESS_US) -> int:
    """Global low-watermark (epoch-us): min over conv running-max − lateness.
    Small aggregate — safe to materialize."""
    import pyarrow as pa
    from ray.data.aggregate import Max
    conv_max = ds.groupby("conv_id").aggregate(Max("ts", alias_name="max_ts"))
    mins = conv_max.min("max_ts")
    ts = mins if not hasattr(mins, "timestamp") else int(mins.timestamp() * 1e6)
    if isinstance(ts, pa.TimestampScalar):
        ts = ts.cast(pa.int64()).as_py()
    return int(ts) - lateness_us
