"""Bounded-bucket sharding for per-key group operations.

Ray's ``groupby(key).map_groups(fn)`` makes ONE Python call per distinct
key — fine for a thousand conversations, ruinous for millions (the
per-group overhead dominates long before the data does). The scale-safe
form keys the shuffle on a BOUNDED hash-bucket space and runs a
vectorized multi-group pass inside each collocated bucket: sort by the
real key, find segment boundaries, process all groups in numpy/pandas at
once. The same number of rows moves; the Python-call count drops from
O(distinct keys) to O(buckets).

Used by the turns rank derivation, exact dedup and sessionization; the
near-dup candidate generation (dedup_near N_PARTITIONS) and the
order_revenue per-order aggregation follow the same pattern locally.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

N_GROUP_BUCKETS = 64


def key_bucket(values, n_buckets: int = N_GROUP_BUCKETS) -> np.ndarray:
    """Deterministic bucket ids for a key column. Strings hash with crc32
    (never Python's process-salted hash()), computed once per DISTINCT
    value; integers bucket by modulo."""
    arr = np.asarray(values)
    if arr.dtype.kind in "iu":
        return (arr.astype(np.int64) % n_buckets).astype(np.int64)
    obj = arr.astype(object)
    uniq, inv = np.unique(obj, return_inverse=True)
    codes = np.array([zlib.crc32(str(u).encode()) % n_buckets for u in uniq],
                     dtype=np.int64)
    return codes[inv]


def with_bucket(df: pd.DataFrame, key: str,
                col: str = "__bucket") -> pd.DataFrame:
    return df.assign(**{col: key_bucket(df[key].to_numpy())})
