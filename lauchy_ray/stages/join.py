"""Stateful stream-table join with sorted per-conv turn buffers
(north_star: "hash-partitioned dict keyed by conv_id with sorted turn_idx
buffers for stable ordering"; generalizes the reference's per-record
entity lookups V3-V6, TopologyProducer.java:196-208).

Two faces:

- ``broadcast_join``: the small side (rules / dimension table) is shipped
  once via ray.put and looked up per batch in actor state — no shuffle
  (≙ the Infinispan dictionary cache, minus the per-record RPC).
- ``ordered_conv_join``: hash-shuffle turns by conv_id, buffer each conv
  sorted by turn_idx, and emit turns WITH previous-turn context
  (prev_role, prev_ts, gap) in stable turn order — the stateful
  sorted-buffer join. Ray Data's groupby supplies the hash partitioning;
  the sort inside the group is the "sorted turn_idx buffer". State per
  group is O(conv length), never O(total rows).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


class BroadcastLookup:
    """map_batches actor: left join a batch against a broadcast dict."""

    def __init__(self, lookup_ref, key: str, out_cols: dict[str, str]):
        self.lookup = ray.get(lookup_ref)   # key -> dict of attrs
        self.key = key
        self.out_cols = out_cols            # out_col -> attr name

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        for out_col, attr in self.out_cols.items():
            df[out_col] = df[self.key].map(
                lambda k: self.lookup.get(k, {}).get(attr))
        return df


def broadcast_join(ds: rd.Dataset, lookup: dict, key: str,
                   out_cols: dict[str, str], concurrency=(1, 8)) -> rd.Dataset:
    ref = ray.put(lookup)
    return ds.map_batches(BroadcastLookup,
                          fn_constructor_kwargs={"lookup_ref": ref, "key": key,
                                                 "out_cols": out_cols},
                          batch_format="pandas", concurrency=concurrency)


def _with_prev(group: pd.DataFrame) -> pd.DataFrame:
    g = group.sort_values(["turn_idx", "ts"], kind="stable").copy()
    ts = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
    g["prev_role"] = g["role"].shift(1).fillna("")
    prev_ts = np.empty(len(g), dtype=np.int64)
    prev_ts[0] = -1
    prev_ts[1:] = ts[:-1]
    gap = np.where(prev_ts < 0, -1, ts - prev_ts)
    g["gap_us"] = gap
    return g


def ordered_conv_join(turns: rd.Dataset) -> rd.Dataset:
    """turns → turns + (prev_role, gap_us) in stable per-conv turn order."""
    return turns.groupby("conv_id").map_groups(_with_prev, batch_format="pandas")
