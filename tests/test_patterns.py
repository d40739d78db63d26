"""Unit tests for the CEP sequence operators (stages/patterns.py):
row-pattern (A B+ C) matching, the ordered-stage funnel, and trajectory
signatures — including conv-boundary and bucket-mixing cases the
vectorized kernels must get right."""

import numpy as np
import pandas as pd

from lauchy_ray.stages.patterns import (funnel_bucket_partial, funnel_merge,
                                        match_abplusc_bucket,
                                        trajectory_bucket, trajectory_fold)


def _turns(rows):
    return pd.DataFrame({
        "conv_id": [r[0] for r in rows],
        "turn_idx": np.array([r[1] for r in rows], np.int32),
        "role": [r[2] for r in rows]})


# ------------------------------------------------------- pattern match

def test_match_basic_run():
    df = _turns([("c1", 0, "user"), ("c1", 1, "tool"), ("c1", 2, "tool"),
                 ("c1", 3, "assistant"), ("c1", 4, "user")])
    out = match_abplusc_bucket(df)
    assert out.to_dict("records") == [
        {"conv_id": "c1", "start_idx": 0, "end_idx": 3, "n_tool_turns": 2}]


def test_match_requires_both_neighbours():
    # run at conv start (no A before), run ending without C after
    df = _turns([("c1", 0, "tool"), ("c1", 1, "assistant"),
                 ("c2", 0, "user"), ("c2", 1, "tool"), ("c2", 2, "user")])
    assert len(match_abplusc_bucket(df)) == 0


def test_match_never_crosses_conversations():
    # c1 ends with a tool run; c2 starts with assistant — adjacency in the
    # sorted bucket must NOT stitch them into a match
    df = _turns([("c1", 0, "user"), ("c1", 1, "tool"),
                 ("c2", 0, "assistant"), ("c2", 1, "user"), ("c2", 2, "tool"),
                 ("c3", 0, "assistant")])
    assert len(match_abplusc_bucket(df)) == 0


def test_match_multiple_runs_one_conv_and_unsorted_input():
    rows = [("c1", 0, "user"), ("c1", 1, "tool"), ("c1", 2, "assistant"),
            ("c1", 3, "user"), ("c1", 4, "tool"), ("c1", 5, "tool"),
            ("c1", 6, "tool"), ("c1", 7, "assistant")]
    df = _turns(rows).sample(frac=1.0, random_state=7)  # kernel must sort
    out = match_abplusc_bucket(df).sort_values("start_idx").reset_index(drop=True)
    assert out["start_idx"].tolist() == [0, 3]
    assert out["end_idx"].tolist() == [2, 7]
    assert out["n_tool_turns"].tolist() == [1, 3]


def test_match_empty():
    out = match_abplusc_bucket(_turns([]))
    assert list(out.columns) == ["conv_id", "start_idx", "end_idx",
                                 "n_tool_turns"]
    assert len(out) == 0


# ------------------------------------------------------------- funnel

def test_funnel_cascade_order_matters():
    # c1 reaches all 3 stages; c2 has tool BEFORE its first user turn
    # (stage 2 not reached); c3 user only
    df = _turns([
        ("c1", 0, "user"), ("c1", 1, "tool"), ("c1", 2, "assistant"),
        ("c2", 0, "tool"), ("c2", 1, "user"), ("c2", 2, "assistant"),
        ("c3", 0, "user"),
    ])
    out = funnel_bucket_partial(df).set_index("stage")["n_convs"]
    assert out.to_dict() == {1: 3, 2: 1, 3: 1}
    # c2's assistant turn after user (but without a tool between) must
    # not count for stage 3 — verified by the 3->1 drop above


def test_funnel_merge_sums_partials():
    p1 = funnel_bucket_partial(_turns([("c1", 0, "user")]))
    p2 = funnel_bucket_partial(_turns([("c2", 0, "user"), ("c2", 1, "tool"),
                                       ("c2", 2, "assistant")]))
    merged = funnel_merge(pd.concat([p1, p2])).set_index("stage")["n_convs"]
    assert merged.to_dict() == {1: 2, 2: 1, 3: 1}


# --------------------------------------------------------- trajectory

def test_trajectory_signature_and_counts():
    df = _turns([("c1", 0, "user"), ("c1", 1, "assistant"),
                 ("c2", 0, "user"), ("c2", 1, "assistant"),
                 ("c3", 1, "tool"), ("c3", 0, "user")])  # unsorted c3
    parts = trajectory_bucket(df)
    out = trajectory_fold(parts).set_index("trajectory")["n_convs"]
    assert out.to_dict() == {"ua": 2, "ut": 1}


def test_trajectory_fold_across_buckets():
    a = trajectory_bucket(_turns([("c1", 0, "user")]))
    b = trajectory_bucket(_turns([("c2", 0, "user")]))
    out = trajectory_fold(pd.concat([a, b]))
    assert out.to_dict("records") == [{"trajectory": "u", "n_convs": 2}]
