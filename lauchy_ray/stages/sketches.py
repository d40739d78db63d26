"""Mergeable sketches: HyperLogLog approximate COUNT DISTINCT with an
EXACT SQL oracle.

The sketch uses the repo's shared md5-60bit hash convention (dedup_near.
md5_60 ≡ ``('0x'||substr(md5(x),1,15))::BIGINT`` in DuckDB), so the
ENTIRE pipeline — bucket assignment, rank-of-first-one (via integer
bit_length ≡ ``length(printf('%b', rem))``), register maxima, the
integer-scaled register sum, the raw estimate, and the linear-counting
small-range branch — is re-derived bit-for-bit in DuckDB (``hll_sql``):
an approximate operator whose APPROXIMATION is deterministic, making it
value-checkable like the exact ones.

Float-parity preconditions (verified empirically on this platform):
- the raw-estimate expression matches when both sides write the same
  IEEE op order with forced-double (``e0``) literals;
- DuckDB ``ln()`` and CPython ``math.log`` agree bitwise on every
  rational m/Z the correction can see (Z ∈ 1..m; numpy's SIMD log does
  NOT — the kernel must use math.log, which is O(groups) calls anyway).

Scale shape (the reason HLL exists): each batch folds its rows into
≤ m=1024 register partials per group key; merges are elementwise max —
associative and tiny. A 100-TB corpus moves O(groups × m) register rows
through the merge, never user ids, where the exact count-distinct
(q_distinct_users_by_type) must shuffle every distinct pair.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .dedup_near import md5_60

HLL_P = 10
HLL_M = 1 << HLL_P            # 1024 registers
HLL_REM_BITS = 60 - HLL_P     # 50 bits below the bucket index
# scaled register terms 2^(SCALE-rho) stay integral and the all-empty
# worst case m·2^SCALE = 2^62 still fits int64
HLL_SCALE_BITS = 52
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_REM_MASK = (1 << HLL_REM_BITS) - 1


def hll_rho(h: int) -> int:
    """Rank of the first 1-bit in the 50-bit remainder (1-based; 51 when
    the remainder is all zeros) — ``bit_length`` keeps it pure-integer on
    both engines."""
    rem = h & _REM_MASK
    return 51 if rem == 0 else HLL_REM_BITS - rem.bit_length() + 1


def hll_register_partial(df: pd.DataFrame, key_col: str,
                         value_col: str) -> pd.DataFrame:
    """One batch → its (key, bucket, rho-max) register partial. Values
    hash once per DISTINCT value in the batch; output is ≤ groups×m rows
    regardless of batch size."""
    d = df[[key_col, value_col]].drop_duplicates()
    uniq = pd.unique(d[value_col])
    hs = {u: md5_60(str(u)) for u in uniq}
    h = d[value_col].map(hs).to_numpy(np.int64)
    bucket = h >> HLL_REM_BITS
    rho = np.fromiter((hll_rho(int(x)) for x in h), dtype=np.int64,
                      count=len(h))
    part = pd.DataFrame({key_col: d[key_col].to_numpy(),
                         "bucket": bucket, "rho": rho})
    g = part.groupby([key_col, "bucket"], sort=False)["rho"].max()
    return g.reset_index()


def hll_merge_registers(df: pd.DataFrame, key_col: str) -> pd.DataFrame:
    """Fold register partials (elementwise max) and estimate per key.
    Branches exactly as the SQL oracle: raw = α·m²·2^52 / S with S the
    integer-scaled register sum (empty registers contribute 2^52); the
    linear-counting correction m·ln(m/Z) applies when raw ≤ 2.5m and any
    register is empty."""
    regs = (df.groupby([key_col, "bucket"], sort=True)["rho"].max()
            .reset_index())
    out_keys, out_est = [], []
    for key, g in regs.groupby(key_col, sort=True):
        rho = g["rho"].to_numpy(np.int64)
        v = len(rho)
        s = int(np.sum(np.int64(1) << (HLL_SCALE_BITS - rho))) + (
            (HLL_M - v) << HLL_SCALE_BITS)
        raw = HLL_ALPHA * 1024.0 * 1024.0 * 4503599627370496.0 / s
        if raw <= 2.5 * HLL_M and v < HLL_M:
            est = 1024.0 * math.log(1024.0 / (HLL_M - v))
        else:
            est = raw
        out_keys.append(key)
        out_est.append(int(math.floor(est)))
    return pd.DataFrame({key_col: out_keys,
                         "est_users": pd.Series(out_est, dtype="int64")})


CMS_D = 4      # sketch depth (independent hash rows)
CMS_W = 1024   # counters per row


def cms_partial(df: pd.DataFrame, value_col: str) -> pd.DataFrame:
    """One batch → its Count-Min counter partial: for each of the D hash
    rows, the batch's total hit count per cell. Values hash once per
    DISTINCT value (md5_60 of ``"{depth}:{value}"`` — the repo's shared
    md5-60bit convention, so DuckDB recomputes the same cells); output is
    ≤ D×W rows regardless of batch size, and merging partials is a plain
    grouped SUM — the sketch is what makes frequency estimation a
    bounded-state operator at 100 TB."""
    vc = df[value_col].value_counts()
    vals = vc.index.to_numpy()
    cnts = vc.to_numpy(np.int64)
    out_d, out_cell, out_c = [], [], []
    for d in range(CMS_D):
        cells = np.fromiter(
            (md5_60(f"{d}:{v}") % CMS_W for v in vals),
            dtype=np.int64, count=len(vals))
        g = pd.DataFrame({"cell": cells, "c": cnts}).groupby(
            "cell", sort=False)["c"].sum()
        out_d.append(np.full(len(g), d, np.int64))
        out_cell.append(g.index.to_numpy(np.int64))
        out_c.append(g.to_numpy(np.int64))
    return pd.DataFrame({"depth": np.concatenate(out_d),
                         "cell": np.concatenate(out_cell),
                         "counter": np.concatenate(out_c)})


def cms_merge(df: pd.DataFrame) -> pd.DataFrame:
    """Fold counter partials: grouped sum over the bounded (depth, cell)
    space — associative, ≤ D×W rows out."""
    g = (df.groupby(["depth", "cell"], sort=True)["counter"].sum()
         .reset_index())
    g["counter"] = g["counter"].astype("int64")
    return g


def cms_estimate(sketch: pd.DataFrame, value) -> int:
    """Point frequency estimate: min over depths of the value's cell
    counter (the classic CMS upper bound — exact when no collision)."""
    est = None
    lookup = {(int(d), int(c)): int(n) for d, c, n in
              zip(sketch["depth"], sketch["cell"], sketch["counter"])}
    for d in range(CMS_D):
        cell = md5_60(f"{d}:{value}") % CMS_W
        cnt = lookup.get((d, cell), 0)
        est = cnt if est is None else min(est, cnt)
    return int(est)


def cms_sql(table: str = "events", value_col: str = "user_id") -> str:
    """DuckDB re-derivation of the sketch counters: per-value totals cross
    the D hash rows (VALUES list generated from CMS_D so Python and SQL
    can never disagree on depth), cell = md5-60bit of '{depth}:{value}'
    mod W — the identical bytes Python hashes, so every counter matches
    exactly."""
    vals = ", ".join(f"({d})" for d in range(CMS_D))
    return f"""
        WITH v AS (
          SELECT {value_col} AS val, count(*) AS c FROM {table} GROUP BY 1),
        cells AS (
          SELECT d.depth,
                 ('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':' ||
                                      CAST(val AS VARCHAR)), 1, 15))::BIGINT
                   % {CMS_W} AS cell,
                 c
          FROM v CROSS JOIN (VALUES {vals}) AS d(depth))
        SELECT CAST(depth AS BIGINT) AS depth, cell,
               sum(c)::BIGINT AS counter
        FROM cells GROUP BY 1, 2"""


def hll_sql(table: str = "events", key_col: str = "event_type",
            value_col: str = "user_id") -> str:
    """DuckDB re-derivation of the full sketch (see module docstring)."""
    return f"""
        WITH pairs AS (
          SELECT DISTINCT {key_col}, {value_col} FROM {table}),
        h AS (
          SELECT {key_col},
                 ('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15))::BIGINT AS h
          FROM pairs),
        r AS (
          SELECT {key_col}, h >> {HLL_REM_BITS} AS bucket,
                 CASE WHEN (h & ((1::BIGINT << {HLL_REM_BITS}) - 1)) = 0
                      THEN {HLL_REM_BITS + 1}
                      ELSE {HLL_REM_BITS}
                           - length(printf('%b', h & ((1::BIGINT << {HLL_REM_BITS}) - 1)))
                           + 1 END AS rho
          FROM h),
        regs AS (
          SELECT {key_col}, bucket, max(rho) AS rho FROM r GROUP BY 1, 2),
        agg AS (
          SELECT {key_col}, count(*) AS v,
                 sum(1::BIGINT << ({HLL_SCALE_BITS} - rho))::BIGINT
                   + (({HLL_M} - count(*))::BIGINT << {HLL_SCALE_BITS}) AS s
          FROM regs GROUP BY 1),
        est AS (
          SELECT {key_col}, v,
                 0.7213e0 / (1e0 + 1.079e0 / 1024.0e0) * 1024.0e0 * 1024.0e0
                   * 4503599627370496.0e0 / s AS raw
          FROM agg)
        SELECT {key_col},
               CAST(floor(CASE WHEN raw <= 2560.0e0 AND v < {HLL_M}
                               THEN 1024.0e0 * ln(1024.0e0 / ({HLL_M} - v))
                               ELSE raw END) AS BIGINT) AS est_users
        FROM est"""
