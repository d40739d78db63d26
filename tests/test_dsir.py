"""DSIR importance weighting: quantization exactness, selection
direction (target-like docs outrank non-target), and edge cases."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from lauchy_ray.stages.dsir import (DSIR_K, LOG_SCALE, dsir_doc_weight,
                                    dsir_partial, dsir_weights)


def _docs(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_dsir_target_docs_rank_first():
    """Docs wearing the target slice's vocabulary must outrank docs of
    the disjoint non-target vocabulary."""
    rows = []
    for i in range(20):
        rows.append({"doc_id": i, "lang": "en",
                     "text": "alpha beta gamma alpha"})
    for i in range(20, 40):
        rows.append({"doc_id": i, "lang": "de",
                     "text": "zeta eta theta zeta"})
    # two candidate docs in each style, both non-target lang (selection
    # scores EVERY doc; weight must reflect text, not the lang label)
    rows.append({"doc_id": 100, "lang": "fr", "text": "alpha beta alpha"})
    rows.append({"doc_id": 101, "lang": "fr", "text": "zeta eta zeta"})
    out = dsir_weights(_docs(rows), target_lang="en", k=50).to_pandas()
    w = out.set_index("doc_id")["weight_scaled"]
    assert w.loc[100] > w.loc[101]
    # every pure-target doc outranks every pure-non-target doc
    assert w.loc[list(range(20))].min() > w.loc[list(range(20, 40))].max()
    # rank is dense 1..n over (weight DESC, doc_id ASC)
    assert list(out["rank"]) == list(range(1, len(out) + 1))
    srt = out.sort_values(["weight_scaled", "doc_id"],
                          ascending=[False, True])
    assert list(srt["doc_id"]) == list(out["doc_id"])


def test_dsir_weight_quantization_matches_scalar():
    """dsir_doc_weight == the scalar formula, term by term."""
    df = pd.DataFrame({
        "doc_id": [1, 1, 2], "term": ["a", "b", "a"],
        "cnt": [3, 1, 2], "c_t": [5, 1, 5], "c_r": [9, 4, 9]})
    t_t, t_r, v = 6, 13, 2
    out = dsir_doc_weight(df, t_t, t_r, v).set_index("doc_id")

    def q(c, den):
        return math.floor(math.log((c + 1.0) / den) * LOG_SCALE + 0.5)

    w1 = 3 * (q(5, t_t + v) - q(9, t_r + v)) + 1 * (q(1, t_t + v)
                                                    - q(4, t_r + v))
    w2 = 2 * (q(5, t_t + v) - q(9, t_r + v))
    assert int(out.loc[1, "weight_scaled"]) == w1
    assert int(out.loc[2, "weight_scaled"]) == w2
    assert int(out.loc[1, "n_tok"]) == 4


def test_dsir_partial_empty_and_missing_lang():
    empty = dsir_partial(pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                       "text": pd.Series(dtype=object),
                                       "lang": pd.Series(dtype=object)}),
                         "en")
    assert list(empty.columns) == ["term", "doc_id", "cnt", "tgt"]
    assert len(empty) == 0
    one = dsir_partial(pd.DataFrame({"doc_id": [7], "text": ["x y x"],
                                     "lang": ["zz"]}), "en")
    assert set(map(tuple, one[["term", "cnt", "tgt"]].itertuples(
        index=False))) == {("x", 2, 0), ("y", 1, 0)}


def test_dsir_k_cut():
    rows = [{"doc_id": i, "lang": "en" if i % 2 else "fr",
             "text": f"tok{i % 5} tok{i % 7}"} for i in range(60)]
    out = dsir_weights(_docs(rows), target_lang="en", k=10).to_pandas()
    assert len(out) == 10
    assert DSIR_K == 200  # the query face's documented default
