"""Sequence / CEP pattern operators over per-conversation turn order —
the MATCH_RECOGNIZE face of the engine (the reference's Kafka Streams
lineage is event-per-record; these are the row-pattern operators a CEP
engine adds on top: regex-over-rows matching, ordered funnels, and
trajectory signatures).

Scale shape: all three co-locate each conv_id on a hash bucket
(stages/bucketing.group_map_by_key) and run ONE vectorized pass per
bucket — numpy boundary masks over (conv, turn_idx)-sorted arrays, never
a Python call per conversation (the trajectory kernel's per-conv string
join is the one inherent O(convs)-calls step; each call is a C-speed
``str.join`` so total work stays O(total chars)). Matches never nest and
never cross conversations, so per-bucket output is bounded by the
bucket's row count and the merge steps are bounded-cardinality folds.

turn_idx is consecutive per conversation by construction
(events_bridge.derive_turns ranks with row_number), so sorted-row
adjacency IS turn adjacency; every kernel asserts nothing and relies
only on that documented invariant.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# Pattern symbols over the bridge's role alphabet: the classic agent
# transcript shape "user asks -> agent runs tools -> agent answers",
# i.e. MATCH_RECOGNIZE (A B+ C) with A=user, B=tool, C=assistant.
PAT_A, PAT_B, PAT_C = "user", "tool", "assistant"


def match_abplusc_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """All convs of one bucket → every (A B+ C) match, vectorized:
    B-run starts/ends from boundary masks, then one gather per run for
    the A-neighbour before and the C-neighbour after. Runs are disjoint
    so starts and ends pair positionally."""
    g = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = g["conv_id"].to_numpy()
    role = g["role"].to_numpy()
    tidx = g["turn_idx"].to_numpy()  # int32 both sides (events_bridge:67)
    n = len(g)
    if n == 0:
        return pd.DataFrame({"conv_id": pd.Series(dtype=object),
                             "start_idx": pd.Series(dtype="int32"),
                             "end_idx": pd.Series(dtype="int32"),
                             "n_tool_turns": pd.Series(dtype="int64")})
    is_b = role == PAT_B
    # adjacency = same conv AND consecutive turn_idx: dense raw turns make
    # the idx check a no-op, but a pre-filtered stream (e.g. the validated
    # stream after its null-text drop) has gaps, and a gap must break both
    # runs and neighbour checks — this keeps the kernel equal to the
    # streaming pattern engine over the same filtered input
    adj_prev = np.zeros(n, dtype=bool)
    adj_prev[1:] = (conv[1:] == conv[:-1]) & (tidx[1:] == tidx[:-1] + 1)
    prev_b = np.zeros(n, dtype=bool)
    prev_b[1:] = is_b[:-1]
    next_b = np.zeros(n, dtype=bool)
    next_b[:-1] = is_b[1:]
    adj_next = np.zeros(n, dtype=bool)
    adj_next[:-1] = adj_prev[1:]
    run_start = np.flatnonzero(is_b & ~(prev_b & adj_prev))
    run_end = np.flatnonzero(is_b & ~(next_b & adj_next))
    # A immediately before the run, C immediately after — both must stay
    # inside the run's conversation and be idx-adjacent
    ok_a = (run_start > 0) & adj_prev[run_start] \
        & (role[np.maximum(run_start - 1, 0)] == PAT_A)
    ok_c = (run_end < n - 1) & adj_next[run_end] \
        & (role[np.minimum(run_end + 1, n - 1)] == PAT_C)
    keep = ok_a & ok_c
    s, e = run_start[keep], run_end[keep]
    # keep guarantees s-1 / e+1 in bounds; run rows are contiguous sorted
    # positions so the B-count is positional — no reliance on idx gaps
    return pd.DataFrame({
        "conv_id": conv[s],
        "start_idx": tidx[s - 1],           # the A turn
        "end_idx": tidx[e + 1],             # the C turn
        "n_tool_turns": e - s + 1,
    })


FUNNEL_STAGES = [(1, "user"), (2, "tool_after_user"),
                 (3, "answer_after_tool")]


def funnel_bucket_partial(df: pd.DataFrame) -> pd.DataFrame:
    """One bucket → its 3-row funnel partial: #convs with a user turn,
    #convs with a tool turn AFTER their first user turn, #convs with an
    assistant turn AFTER that first qualifying tool turn. Cascaded
    first-position-per-conv via masked minimum.reduceat — one pass, no
    per-conv Python."""
    g = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    conv = g["conv_id"].to_numpy()
    role = g["role"].to_numpy()
    n = len(g)
    if n == 0:
        counts = np.zeros(3, np.int64)
    else:
        first = np.ones(n, dtype=bool)
        first[1:] = conv[1:] != conv[:-1]
        seg_starts = np.flatnonzero(first)
        seg_id = np.cumsum(first) - 1
        pos = np.arange(n, dtype=np.int64)

        def first_pos(mask: np.ndarray) -> np.ndarray:
            """Per conv: smallest row position satisfying mask (n = none)."""
            return np.minimum.reduceat(np.where(mask, pos, n), seg_starts)

        u = first_pos(role == PAT_A)
        t = first_pos((role == PAT_B) & (pos > u[seg_id]))
        a = first_pos((role == PAT_C) & (pos > t[seg_id]))
        counts = np.array([(u < n).sum(), (t < n).sum(), (a < n).sum()],
                          dtype=np.int64)
    return pd.DataFrame({
        "stage": np.array([s for s, _ in FUNNEL_STAGES], np.int64),
        "stage_name": [nm for _, nm in FUNNEL_STAGES],
        "n_convs": counts,
    })


def funnel_merge(df: pd.DataFrame) -> pd.DataFrame:
    """Sum the bounded (buckets x 3) partials — convs never split across
    buckets so the sums are exact."""
    out = (df.groupby(["stage", "stage_name"], sort=True)["n_convs"]
           .sum().reset_index())
    out["stage"] = out["stage"].astype("int64")
    out["n_convs"] = out["n_convs"].astype("int64")
    return out


def trajectory_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One conv bucket → (trajectory, cnt) partials: each conv's role
    initials joined in turn order (the string_agg/collect_list face),
    pre-counted per bucket so the downstream fold moves one row per
    distinct trajectory per bucket, never one per conv."""
    if not len(df):
        return pd.DataFrame({"trajectory": pd.Series(dtype=object),
                             "cnt": pd.Series(dtype="int64")})
    g = df.sort_values(["conv_id", "turn_idx"], kind="stable")
    initials = g["role"].str[:1]
    sig = initials.groupby(g["conv_id"].to_numpy(), sort=False).agg("".join)
    out = sig.value_counts().rename_axis("trajectory").reset_index(name="cnt")
    out["cnt"] = out["cnt"].astype("int64")
    return out


def trajectory_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Trajectory-keyed sum of the per-bucket partials."""
    out = (df.groupby("trajectory", sort=False)["cnt"].sum()
           .reset_index(name="n_convs"))
    out["n_convs"] = out["n_convs"].astype("int64")
    return out[["trajectory", "n_convs"]]
