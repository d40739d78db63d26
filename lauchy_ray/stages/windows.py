"""Tumbling / sliding windowed counts of valid vs rejected per (role, tool)
(north_star; SURVEY.md §2.6).

At-scale shape: window-id assignment + PARTIAL aggregation happen inside
`map_batches` (vectorized `pyarrow` group_by per batch — one output row per
distinct (window, role, tool) per batch), so the all-to-all `groupby`
shuffle only moves pre-aggregated partials, not raw turns. This is the
combiner pattern the guide mandates and also neutralizes hot-window /
hot-conv skew (a hot key collapses to one partial row per batch — no
explicit salting needed because the partial key already excludes conv_id).

Sliding windows replicate each row to width/slide window ids BEFORE the
partial aggregation (replication happens on the small grouped output, not
the raw stream).

window_id is an integer step index: row ∈ window w ⇔
w*slide ≤ ts < w*slide + width, i.e. w ∈ [ts//slide - width/slide + 1,
ts//slide]. window_start_us = w * slide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data.aggregate import Sum

HOUR_US = 3600 * 1_000_000


def _partial_counts(batch: pa.Table, width_us: int, slide_us: int) -> pa.Table:
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    n_per = width_us // slide_us
    last = ts // slide_us
    # replicate each row to its n_per windows (n_per == 1 for tumbling)
    reps = np.repeat(np.arange(len(ts)), n_per)
    wids = np.repeat(last, n_per) - np.tile(np.arange(n_per - 1, -1, -1), len(ts))
    keep = wids >= 0
    valid = batch["valid"].to_numpy(zero_copy_only=False)[reps[keep]]
    part = pa.table({
        "window_id": pa.array(wids[keep], pa.int64()),
        "role": batch["role"].take(pa.array(reps[keep])),
        "tool": batch["tool"].take(pa.array(reps[keep])),
        "n_valid": pa.array(valid.astype(np.int64)),
        "n_rejected": pa.array((~valid).astype(np.int64)),
    })
    return pa.TableGroupBy(part, ["window_id", "role", "tool"]).aggregate(
        [("n_valid", "sum"), ("n_rejected", "sum")]).rename_columns(
        ["window_id", "role", "tool", "n_valid", "n_rejected"])


def _merge_counts(t: pa.Table) -> pa.Table:
    return pa.TableGroupBy(t, ["window_id", "role", "tool"]).aggregate(
        [("n_valid", "sum"), ("n_rejected", "sum")]).rename_columns(
        ["window_id", "role", "tool", "n_valid", "n_rejected"])


def window_counts(validated: rd.Dataset, width_us: int = HOUR_US,
                  slide_us: int | None = None,
                  final: str = "merge") -> rd.Dataset:
    """validated turns → (window_id, role, tool, n_valid, n_rejected).

    final="merge" (default): after the per-batch partial aggregation the
    result cardinality is bounded by windows × roles × tools — NOT by row
    count — so the final combine is a single narrow task (coalesce blocks,
    one pyarrow group_by), avoiding the full sort-shuffle machinery whose
    fixed cost dwarfs the work at any scale. final="shuffle" keeps the
    hash/sort groupby path for when the post-combine key space is itself
    huge (e.g. per-conv windows)."""
    slide_us = slide_us or width_us
    assert width_us % slide_us == 0, "width must be a multiple of slide"
    partials = validated.map_batches(
        lambda t: _partial_counts(t, width_us, slide_us), batch_format="pyarrow")
    if final == "shuffle":
        return partials.groupby(["window_id", "role", "tool"]).aggregate(
            Sum("n_valid", alias_name="n_valid"),
            Sum("n_rejected", alias_name="n_rejected"))
    return partials.repartition(1).map_batches(
        _merge_counts, batch_format="pyarrow", batch_size=None)


def _partial_len_hist(batch: pa.Table, width_us: int) -> pa.Table:
    """Per-batch (window_id, role, len) HISTOGRAM partial: exact windowed
    quantiles shuffle one row per distinct (window, role, length), never
    raw turns — the domain of a length column is bounded (≤ max text
    size), so the partial cardinality is O(windows × roles × lengths)
    regardless of stream volume. n_valid rides the same partial."""
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    lens = pc.utf8_length(batch["text"]).to_numpy(zero_copy_only=False)
    valid = batch["valid"].to_numpy(zero_copy_only=False)
    part = pa.table({
        "window_id": pa.array(ts // width_us, pa.int64()),
        "role": batch["role"],
        "len": pa.array(lens.astype(np.int64)),
        "n": pa.array(np.ones(len(ts), np.int64)),
        "n_valid": pa.array(valid.astype(np.int64)),
    })
    return pa.TableGroupBy(part, ["window_id", "role", "len"]).aggregate(
        [("n", "sum"), ("n_valid", "sum")]).rename_columns(
        ["window_id", "role", "len", "n", "n_valid"])


# exact rationals: DuckDB's quantile_disc(x, q) returns
# sorted(x)[ceil(q*n) - 1] computed EXACTLY — a float ceil(q*n) rounds
# 0.7*10 up to 8 on IEEE doubles, so targets use integer (num, den)
QUANTILES = (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100))


def quantiles_from_hist(vals: np.ndarray, cnts: np.ndarray,
                        qs=QUANTILES) -> dict[str, int]:
    """quantile_disc over a SORTED value histogram: smallest value whose
    cumulative count ≥ ceil(q·n), with the ceil in integer arithmetic."""
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = {}
    for name, num, den in qs:
        target = (num * n + den - 1) // den  # exact ceil(num*n/den)
        out[name] = int(vals[np.searchsorted(cum, target)])
    return out


def _merge_len_hist(t: pa.Table) -> pa.Table:
    """Final combine: merge histogram partials, then per (window, role)
    compute n_valid/n_rejected and disc-quantiles from the cumulative
    counts. Runs in ONE narrow task (input is the bounded partial set)."""
    g = (pa.TableGroupBy(t, ["window_id", "role", "len"])
         .aggregate([("n", "sum"), ("n_valid", "sum")])
         .rename_columns(["window_id", "role", "len", "n", "n_valid"])
         .sort_by([("window_id", "ascending"), ("role", "ascending"),
                   ("len", "ascending")]))
    wid = g["window_id"].to_numpy()
    role = g["role"].to_numpy(zero_copy_only=False)
    lens = g["len"].to_numpy()
    n = g["n"].to_numpy()
    nv = g["n_valid"].to_numpy()
    # group boundaries over the sorted (window, role) pairs
    change = np.flatnonzero((wid[1:] != wid[:-1]) | (role[1:] != role[:-1]))
    starts = np.concatenate([[0], change + 1])
    ends = np.concatenate([change + 1, [len(wid)]])
    rows = []
    for s, e in zip(starts, ends):
        total = int(n[s:e].sum())
        qv = quantiles_from_hist(lens[s:e], n[s:e])
        rows.append({"window_id": int(wid[s]), "role": role[s],
                     "n_valid": int(nv[s:e].sum()),
                     "n_rejected": total - int(nv[s:e].sum()), **qv})
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {"window_id": pa.array([], pa.int64()), "role": pa.array([], pa.string()),
         "n_valid": pa.array([], pa.int64()), "n_rejected": pa.array([], pa.int64()),
         "p50": pa.array([], pa.int64()), "p90": pa.array([], pa.int64()),
         "p99": pa.array([], pa.int64())})


def window_len_quantiles(validated: rd.Dataset,
                         width_us: int = HOUR_US) -> rd.Dataset:
    """Validated turns → (window_id, role, n_valid, n_rejected,
    p50/p90/p99 of utf8 length(text)) per tumbling window — EXACT
    quantiles at stream scale via the histogram-partial combiner (the
    length domain is bounded, so partials are, too)."""
    partials = validated.map_batches(
        lambda t: _partial_len_hist(t, width_us), batch_format="pyarrow")
    return partials.repartition(1).map_batches(
        _merge_len_hist, batch_format="pyarrow", batch_size=None)


# ----------------------------- windowed deterministic bottom-k sampling

SAMPLE_K = 5
SAMPLE_KNUTH = 2654435761


def sample_row_hash(conv_ids: np.ndarray, turn_idx: np.ndarray,
                    h_cache: dict | None = None) -> np.ndarray:
    """Deterministic per-turn sample hash, SQL-computable:
    md5-60(conv_id) XOR ((turn_idx % 65536) · KNUTH) % 2^32. md5 runs
    once per DISTINCT conv (reuse ``h_cache`` across batches — convs
    repeat heavily); the idx mix stays < 2^48 so neither numpy int64
    nor DuckDB BIGINT can overflow (a raw idx·KNUTH product would wrap
    silently in numpy and error in DuckDB)."""
    import hashlib
    if h_cache is None:
        h_cache = {}
    uniq, inv = np.unique(np.asarray(conv_ids, dtype=object),
                          return_inverse=True)
    hu = np.fromiter(
        (h_cache.get(c) if c in h_cache else h_cache.setdefault(
            c, int(hashlib.md5(str(c).encode()).hexdigest()[:15], 16))
         for c in uniq), dtype=np.int64, count=len(uniq))
    mix = ((turn_idx.astype(np.int64) % 65536) * SAMPLE_KNUTH) % 4294967296
    return hu[inv] ^ mix


def _bottomk_per_window(df: pd.DataFrame, k: int) -> pd.DataFrame:
    # SET semantics over (window, conv, idx): the stream's at-least-once
    # duplicate turns must not occupy two sample slots (the streaming
    # engine dedupes the same way, and the SQL oracle SELECTs DISTINCT)
    out = df.sort_values(["window_id", "h", "conv_id", "turn_idx"],
                         kind="stable")
    out = out.drop_duplicates(["window_id", "conv_id", "turn_idx"])
    return out.groupby("window_id", sort=False).head(k)


def _partial_window_sample(t: pa.Table, width_us: int,
                           k: int) -> pd.DataFrame:
    # pyarrow in: the int64 cast is unambiguously MICROSECONDS (a pandas
    # datetime64 astype would be ns and shift every window id)
    ts = t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    conv = t["conv_id"].to_pandas().to_numpy()
    idx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
    part = pd.DataFrame({
        "window_id": ts // width_us,
        "conv_id": conv,
        "turn_idx": idx,
        "h": sample_row_hash(conv, idx),
    })
    return _bottomk_per_window(part, k)


def _merge_window_sample(df: pd.DataFrame, k: int) -> pd.DataFrame:
    out = _bottomk_per_window(df, k).reset_index(drop=True)
    out = out.sort_values(["window_id", "h", "conv_id", "turn_idx"],
                          kind="stable").reset_index(drop=True)
    out["pos"] = (out.groupby("window_id", sort=False).cumcount() + 1
                  ).astype("int64")
    return out[["window_id", "pos", "conv_id", "turn_idx", "h"]]


def window_sample(validated: rd.Dataset, width_us: int = HOUR_US,
                  k: int = SAMPLE_K) -> rd.Dataset:
    """Per tumbling window, the k rows with the smallest deterministic
    hash — a uniform fixed-size sample per window that is MERGEABLE
    (bottom-k of a union = bottom-k of partial bottom-ks) and a pure
    function of the data: reruns, resumes and any cluster size agree.
    Per-batch partials keep k rows per (window, batch); the merge is one
    narrow task over O(batches × windows × k) rows."""
    partials = validated.map_batches(
        lambda t: _partial_window_sample(t, width_us, k),
        batch_format="pyarrow")
    return partials.repartition(1).map_batches(
        lambda df: _merge_window_sample(df, k),
        batch_format="pandas", batch_size=None)


def topk_rank(df, k: int):
    """Per-window top-k with the CONTRACT tiebreak (n DESC, conv_id ASC),
    rk = 1..k — shared by the batch query (q_window_topk_convs) and the
    streaming merge (merge_topk_partials) so the tiebreak the SQL oracle
    cross-checks lives in exactly one place."""
    df = df.sort_values(["window_id", "n", "conv_id"],
                        ascending=[True, False, True], kind="stable")
    df = df.groupby("window_id", sort=True).head(k).reset_index(drop=True)
    df["rk"] = df.groupby("window_id", sort=False).cumcount() + 1
    return df
