"""Connected components (stages/graph.py): alternating large/small-star
vs a union-find reference — random graphs, adversarial shapes, the
forced bucket-shuffle path, and the driver query at sf0.001."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lauchy_ray.stages import bucketing
from lauchy_ray.stages.graph import connected_components


def _ref(df: pd.DataFrame) -> pd.DataFrame:
    parent: dict[int, int] = {}

    def find(x):
        while parent.get(x, x) != x:
            x = parent[x]
        return x

    nodes = set()
    for a, b in zip(df["u"], df["v"]):
        a, b = int(a), int(b)
        if a == b:
            continue
        nodes.update((a, b))
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
            parent.setdefault(lo, lo)
    return pd.DataFrame(
        [(n, find(n)) for n in sorted(nodes)],
        columns=["node_id", "rep_id"]).astype("int64")


def _run(df: pd.DataFrame, **kw) -> pd.DataFrame:
    out = connected_components(rd.from_pandas(df), **kw)
    if isinstance(out, tuple):
        out = out[0]
    return (out.to_pandas().astype("int64")
            .sort_values("node_id").reset_index(drop=True))


def test_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(5, 80))
        ne = int(rng.integers(2, 150))
        df = pd.DataFrame({
            "u": rng.integers(0, n, ne).astype(np.int64),
            "v": rng.integers(0, n, ne).astype(np.int64)})
        df = df[df.u != df.v]
        if not len(df):
            continue
        pd.testing.assert_frame_equal(_run(df), _ref(df))


def test_path_graph_converges_logarithmically(ray_session):
    n = 512
    df = pd.DataFrame({"u": np.arange(n - 1, dtype=np.int64),
                       "v": np.arange(1, n, dtype=np.int64)})
    out, rounds = connected_components(rd.from_pandas(df),
                                       return_rounds=True)
    got = out.to_pandas().astype("int64")
    assert len(got) == n and (got["rep_id"] == 0).all()
    assert rounds <= 12, f"path-{n} took {rounds} rounds (want O(log n))"


def test_duplicate_and_reversed_edges(ray_session):
    df = pd.DataFrame({"u": [1, 2, 2, 9, 9, 5],
                       "v": [2, 1, 1, 5, 5, 9]}).astype("int64")
    pd.testing.assert_frame_equal(_run(df), _ref(df))


def test_self_loops_only_is_empty(ray_session):
    df = pd.DataFrame({"u": [3, 3], "v": [3, 3]}).astype("int64")
    out = connected_components(rd.from_pandas(df))
    assert out.count() == 0


def test_bucketed_shuffle_path(ray_session, monkeypatch):
    """Force the real hash-bucket groupby path (no single-task gate):
    per-u neighborhoods must still be complete within a bucket."""
    monkeypatch.setattr(bucketing, "SINGLE_TASK_BYTES", 0)
    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "u": rng.integers(0, 40, 60).astype(np.int64),
        "v": rng.integers(0, 40, 60).astype(np.int64)})
    df = df[df.u != df.v]
    pd.testing.assert_frame_equal(_run(df), _ref(df))


def _pr_ref(df: pd.DataFrame, iters: int = 5) -> pd.DataFrame:
    """Single-process reference: identical integer fixed-point updates."""
    from lauchy_ray.stages.graph import PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM, PR_SCALE
    ed = df[df.u != df.v]
    pairs = set(zip(ed.u, ed.v)) | set(zip(ed.v, ed.u))
    adj: dict[int, list[int]] = {}
    for u, v in pairs:
        adj.setdefault(int(u), []).append(int(v))
    r = {n: PR_SCALE for n in adj}
    for _ in range(iters):
        s = {n: 0 for n in adj}
        for u, nbrs in adj.items():
            c = r[u] // len(nbrs)
            for v in nbrs:
                s[v] += c
        r = {n: PR_BASE + PR_DAMP_NUM * s[n] // PR_DAMP_DEN for n in adj}
    return (pd.DataFrame({"node_id": list(r), "rank_fp": list(r.values())})
            .astype("int64").sort_values("node_id").reset_index(drop=True))


def test_pagerank_matches_reference(ray_session):
    from lauchy_ray.stages.graph import pagerank
    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "u": rng.integers(0, 30, 80).astype(np.int64),
        "v": rng.integers(0, 30, 80).astype(np.int64)})
    got = (pagerank(rd.from_pandas(df).repartition(4)).to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _pr_ref(df))


def test_pagerank_star_center_wins(ray_session):
    """On a star graph the hub must outrank every leaf."""
    from lauchy_ray.stages.graph import pagerank
    leaves = np.arange(1, 12, dtype=np.int64)
    df = pd.DataFrame({"u": np.zeros(len(leaves), np.int64), "v": leaves})
    got = pagerank(rd.from_pandas(df)).to_pandas().set_index("node_id")
    hub = got.loc[0, "rank_fp"]
    assert (got.drop(index=0)["rank_fp"] < hub).all()


def test_pagerank_bucketed_path(ray_session, monkeypatch):
    from lauchy_ray.stages.graph import pagerank
    monkeypatch.setattr(bucketing, "SINGLE_TASK_BYTES", 0)
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "u": rng.integers(0, 25, 50).astype(np.int64),
        "v": rng.integers(0, 25, 50).astype(np.int64)})
    got = (pagerank(rd.from_pandas(df).repartition(3)).to_pandas()
           .sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _pr_ref(df))


def test_pagerank_hub_no_int64_wrap(ray_session):
    """A hub absorbing mass from 120k leaves makes the old 85*S damping
    intermediate wrap int64 (S = 1.2e17, 85*S = 1.02e19 > 2^63); the
    split-form fold must match the arbitrary-precision reference."""
    from lauchy_ray.stages.graph import (PR_BASE, PR_DAMP_DEN, PR_DAMP_NUM,
                                         PR_SCALE, pagerank)
    n = 120_000
    leaves = np.arange(1, n + 1, dtype=np.int64)
    df = pd.DataFrame({"u": np.zeros(n, np.int64), "v": leaves})
    got = (pagerank(rd.from_pandas(df).repartition(4), iters=1)
           .to_pandas().set_index("node_id"))
    s_hub = n * (PR_SCALE // 1)  # each leaf contributes r//deg = PR_SCALE
    want_hub = PR_BASE + PR_DAMP_NUM * s_hub // PR_DAMP_DEN  # python bigint
    assert int(got.loc[0, "rank_fp"]) == want_hub
    s_leaf = PR_SCALE // n  # hub's mass split over its n neighbors
    want_leaf = PR_BASE + PR_DAMP_NUM * s_leaf // PR_DAMP_DEN
    assert int(got.loc[1, "rank_fp"]) == want_leaf


def _bfs_ref(df: pd.DataFrame, seed_mod=1000, cap=16) -> pd.DataFrame:
    """Single-process multi-source BFS reference."""
    adj: dict[int, set] = {}
    for a, b in zip(df["u"], df["v"]):
        a, b = int(a), int(b)
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    level = {n: 0 for n in adj if n % seed_mod == 0}
    frontier = set(level)
    for r in range(1, cap + 1):
        nxt = set()
        for n in frontier:
            for m in adj[n]:
                if m not in level:
                    level[m] = r
                    nxt.add(m)
        frontier = nxt
    return (pd.DataFrame({"node_id": list(level),
                          "level": list(level.values())})
            .astype("int64").sort_values("node_id").reset_index(drop=True))


def test_bfs_levels_matches_reference(ray_session):
    from lauchy_ray.stages.graph import bfs_levels
    rng = np.random.default_rng(5)
    # ids multiples of 500 so some hit the seed rule (mod 1000)
    df = pd.DataFrame({
        "u": (rng.integers(0, 40, 120) * 500).astype(np.int64),
        "v": (rng.integers(0, 40, 120) * 500).astype(np.int64)})
    df = df[df.u != df.v]
    got = (bfs_levels(rd.from_pandas(df).repartition(4), seed_mod=1000)
           .to_pandas().astype("int64")
           .sort_values("node_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _bfs_ref(df))


def test_bfs_levels_cap_and_chain(ray_session):
    """A 20-node path from the seed: nodes past the 16-round cap are
    omitted, matching the capped oracle."""
    from lauchy_ray.stages.graph import bfs_levels
    n = 21
    ids = np.arange(n, dtype=np.int64) + 1_000  # only node 1000 seeds
    df = pd.DataFrame({"u": ids[:-1], "v": ids[1:]})
    got = (bfs_levels(rd.from_pandas(df), seed_mod=1000)
           .to_pandas().astype("int64")
           .sort_values("node_id").reset_index(drop=True))
    assert len(got) == 17                      # levels 0..16
    assert got["level"].tolist() == list(range(17))
