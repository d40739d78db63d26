"""Fuzzy edit-distance join (stages/fuzzy.py): kernel exactness vs a
scalar DP and DuckDB, blocking losslessness vs an all-pairs reference,
and the hot-block guard."""

import random

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lauchy_ray.stages.fuzzy import (MAX_BLOCK_VALUES, _block_kernel,
                                     fuzzy_self_join, levenshtein_many)


def _ed(a: bytes, b: bytes) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                         prev[j - 1] + (ca != cb))
        prev = cur
    return prev[-1]


def test_levenshtein_matches_scalar_dp_and_duckdb():
    random.seed(4)
    alph = "abcdé漢"
    pairs = [("".join(random.choices(alph, k=random.randint(0, 9))),
              "".join(random.choices(alph, k=random.randint(0, 9))))
             for _ in range(500)]
    pairs += [("", ""), ("", "xyz"), ("same", "same"), ("héllo", "hello")]
    a = np.array([p[0] for p in pairs], dtype=object)
    b = np.array([p[1] for p in pairs], dtype=object)
    got = levenshtein_many(a, b)
    exp = np.array([_ed(x.encode(), y.encode()) for x, y in pairs])
    np.testing.assert_array_equal(got, exp)
    df = pd.DataFrame({"a": a, "b": b})
    dd = duckdb.sql("SELECT levenshtein(a, b) d FROM df").fetchdf()
    np.testing.assert_array_equal(got, dd["d"].to_numpy())


def test_fuzzy_join_matches_all_pairs_reference(ray_session):
    random.seed(9)
    vocab = ["ring", "king", "kings", "widget", "widgit", "bolt", "bolts",
             "gear", "gearx", "gizmo"]
    rows = [random.choice(vocab) for _ in range(300)]
    df = pd.DataFrame({"p_name": rows})
    got = (fuzzy_self_join(rd.from_pandas(df), "p_name", max_dist=1)
           .to_pandas().sort_values(["name_a", "name_b"])
           .reset_index(drop=True))
    # brute reference over distinct values
    names = sorted(set(rows))
    cnt = pd.Series(rows).value_counts()
    exp = []
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            a, b = names[i], names[j]
            if abs(len(a) - len(b)) > 1:
                continue
            d = _ed(a.encode(), b.encode())
            if d <= 1:
                exp.append((a, b, d, int(cnt[a]), int(cnt[b])))
    exp = pd.DataFrame(exp, columns=["name_a", "name_b", "dist",
                                     "n_a", "n_b"])
    assert len(exp) > 0
    for c in ("dist", "n_a", "n_b"):
        got[c] = got[c].astype("int64")
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


def test_hot_block_guard():
    names = [f"x{i:05d}" for i in range(MAX_BLOCK_VALUES + 1)]
    df = pd.DataFrame({"name": names,
                       "n": np.ones(len(names), np.int64),
                       "L": np.full(len(names), 6, np.int64),
                       "block": np.full(len(names), 6, np.int64)})
    with pytest.raises(ValueError, match="MAX_BLOCK_VALUES"):
        _block_kernel(df, 1)


def test_null_values_are_dropped(ray_session):
    """NULLs never pair (SQL `a.name < b.name` semantics) and must not
    poison the length/blocking arithmetic."""
    df = pd.DataFrame({"p_name": ["ring", None, "king", None, "ring"]})
    got = (fuzzy_self_join(rd.from_pandas(df), "p_name", max_dist=1)
           .to_pandas())
    assert len(got) == 1
    row = got.iloc[0]
    assert (row["name_a"], row["name_b"], row["dist"],
            row["n_a"], row["n_b"]) == ("king", "ring", 1, 1, 2)
