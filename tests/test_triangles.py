"""Triangle counting: brute-force equivalence on random graphs (dups,
reversed dups, self-loops in the input), forced bucket-shuffle path, and
the degree-ordering wedge bound sanity (hub star graph → zero triangles,
no quadratic pair list at the hub)."""

import itertools

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

import lauchy_ray.stages.bucketing as B
from lauchy_ray.stages.graph import _seg_pairs, triangle_counts


def _brute(edges):
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        u, v = min(a, b), max(a, b)
        es.add((u, v))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    counts = {}
    for (u, v), w in itertools.product(es, adj):
        if w > v and (v, w) in es and (u, w) in es:
            for x in (u, v, w):
                counts[x] = counts.get(x, 0) + 1
    return counts


@pytest.mark.parametrize("forced", [False, True],
                         ids=["fast-path", "bucket-path"])
def test_triangle_counts_matches_brute(ray_session, monkeypatch, forced):
    rng = np.random.default_rng(3)
    raw = rng.integers(0, 25, size=(300, 2))
    # adversarial garnish: self-loops and reversed duplicates
    raw = np.vstack([raw, [[7, 7], [3, 9], [9, 3]]])
    if forced:
        monkeypatch.setattr(B, "SINGLE_TASK_BYTES", 0)
    ds = rd.from_pandas(pd.DataFrame({"u": raw[:, 0], "v": raw[:, 1]})
                        .astype("int64")).repartition(4)
    got = triangle_counts(ds, size_ds=None).to_pandas()
    exp = _brute([tuple(r) for r in raw])
    assert dict(zip(got["vid"], got["n_tri"])) == exp


def test_triangle_counts_star_graph_no_triangles(ray_session):
    # hub star: center 0 linked to 1..40 — zero triangles, and the
    # degree orientation points every edge INTO the hub, so the hub
    # generates no wedges (the skew guard this algorithm exists for)
    n = 40
    ds = rd.from_pandas(pd.DataFrame({
        "u": np.zeros(n, np.int64),
        "v": np.arange(1, n + 1, dtype=np.int64)}))
    got = triangle_counts(ds).to_pandas()
    assert len(got) == 0


def test_seg_pairs_vectorized_matches_naive():
    rng = np.random.default_rng(9)
    key = np.sort(rng.integers(0, 8, 50))
    vals = rng.integers(100, 200, 50)
    starts = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    lengths = np.diff(np.r_[starts, len(key)])
    ii, jj = _seg_pairs(vals, starts, lengths)
    naive = []
    for s, ln in zip(starts, lengths):
        for j in range(s, s + ln):
            for i in range(s, j):
                naive.append((i, j))
    assert list(zip(ii.tolist(), jj.tolist())) == naive
    # all pairs stay within their segment
    seg_of = np.repeat(np.arange(len(starts)), lengths)
    assert (seg_of[ii] == seg_of[jj]).all()


def test_word_cooccur_matches_naive(ray_session):
    from lauchy_ray.stages.bucketing import group_map_by_key
    from lauchy_ray.stages.terms import (COOC_WINDOW, cooccur_fold,
                                         cooccur_partial)
    docs = pd.DataFrame({"doc_id": [0, 1, 2],
                         "text": ["a b c a", "b  b c", "x"]})
    ds = rd.from_pandas(docs).repartition(3)
    got = group_map_by_key(
        ds.map_batches(cooccur_partial, batch_format="pandas"),
        "w1", cooccur_fold)
    got = got.to_pandas()
    naive = {}
    for t in docs["text"]:
        toks = t.split()
        for i in range(len(toks)):
            for j in range(i + 1, min(i + COOC_WINDOW, len(toks) - 1) + 1):
                key = tuple(sorted((toks[i], toks[j])))
                naive[key] = naive.get(key, 0) + 1
    assert {(r.w1, r.w2): r.n for r in got.itertuples()} == naive
