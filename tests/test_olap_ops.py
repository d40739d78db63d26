"""Unit tests for the round-3 OLAP/sketch/join widening: the generic
FULL OUTER join face, the Count-Min sketch partials (associativity +
estimate bound), the Bloom pre-prune (zero false negatives), and the
term-explosion kernels (partial fold ≡ naive count; bucket top-k is
lossless)."""

import numpy as np
import pandas as pd
import ray.data as rd

from lauchy_ray.stages.join import full_outer_join
from lauchy_ray.stages.sketches import (CMS_D, CMS_W, cms_estimate,
                                        cms_merge, cms_partial)
from lauchy_ray.stages.terms import (merge_topk, term_bucket_topk,
                                     term_doc_partial)


# ---------------------------------------------------------- full outer

def test_full_outer_join_matches_pandas():
    rng = np.random.default_rng(7)
    left = pd.DataFrame({"k": rng.integers(0, 40, 120),
                         "lv": rng.normal(size=120)})
    right = pd.DataFrame({"k": rng.integers(20, 60, 90),
                          "rv": rng.integers(0, 9, 90)})
    got = full_outer_join(
        rd.from_pandas(left).repartition(4),
        rd.from_pandas(right).repartition(3), "k",
        left_cols={"lv": "Float64"}, right_cols={"rv": "Int64"},
        size_bytes=1).to_pandas()  # force the bucket-shuffle path
    exp = left.astype({"lv": "Float64"}).merge(
        right.astype({"rv": "Int64"}), on="k", how="outer")

    def norm(df):
        return (df.assign(lv=df["lv"].astype("float64"),
                          rv=df["rv"].astype("float64"))
                .sort_values(["k", "lv", "rv"], na_position="last")
                .reset_index(drop=True))
    g, e = norm(got), norm(exp)
    assert len(g) == len(e)
    for c in ["k", "lv", "rv"]:
        np.testing.assert_allclose(g[c].to_numpy(np.float64),
                                   e[c].to_numpy(np.float64), equal_nan=True)


def test_full_outer_join_unmatched_rows_carry_na():
    left = pd.DataFrame({"k": [1, 2], "lv": [10.0, 20.0]})
    right = pd.DataFrame({"k": [2, 3], "rv": [7, 8]})
    got = full_outer_join(
        rd.from_pandas(left), rd.from_pandas(right), "k",
        left_cols={"lv": "Float64"}, right_cols={"rv": "Int64"},
        size_bytes=1).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [1, 2, 3]
    assert pd.isna(got.loc[2, "lv"]) and pd.isna(got.loc[0, "rv"])
    assert got.loc[1, "lv"] == 20.0 and got.loc[1, "rv"] == 7


def test_full_outer_join_null_keys_never_match():
    # SQL semantics: NULL = NULL is not true, so null-key rows from BOTH
    # sides must pass through unmatched (pandas merge would pair them)
    left = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                         "lv": [10.0, 99.0]})
    right = pd.DataFrame({"k": pd.array([1, None], dtype="Int64"),
                          "rv": [5, 7]})
    got = full_outer_join(
        rd.from_pandas(left), rd.from_pandas(right), "k",
        left_cols={"lv": "Float64"}, right_cols={"rv": "Int64"},
        size_bytes=1).to_pandas()
    assert len(got) == 3  # 1 matched + 2 unmatched null-key rows
    matched = got[got["k"].notna()]
    assert len(matched) == 1
    assert matched.iloc[0]["lv"] == 10.0 and matched.iloc[0]["rv"] == 5
    nulls = got[got["k"].isna()]
    assert sorted(
        (bool(pd.isna(r["lv"])), bool(pd.isna(r["rv"])))
        for _, r in nulls.iterrows()) == [(False, True), (True, False)]


# ------------------------------------------------------------ CMS

def test_cms_partials_are_associative():
    rng = np.random.default_rng(11)
    vals = pd.DataFrame({"v": rng.integers(0, 500, 3000)})
    whole = cms_merge(cms_partial(vals, "v"))
    split = cms_merge(pd.concat([cms_partial(vals.iloc[:1000], "v"),
                                 cms_partial(vals.iloc[1000:2100], "v"),
                                 cms_partial(vals.iloc[2100:], "v")],
                                ignore_index=True))
    pd.testing.assert_frame_equal(whole.reset_index(drop=True),
                                  split.reset_index(drop=True))


def test_cms_estimate_upper_bounds_true_count():
    rng = np.random.default_rng(13)
    vals = pd.DataFrame({"v": rng.integers(0, 200, 5000)})
    sketch = cms_merge(cms_partial(vals, "v"))
    true = vals["v"].value_counts()
    for v in [0, 17, 199]:
        t = int(true.get(v, 0))
        est = cms_estimate(sketch, v)
        assert est >= t  # CMS never under-counts
        assert est <= t + 5000  # sanity: bounded by total mass
    # with 200 distinct values in D=4 x W=1024 cells, at least one depth
    # is collision-free for most values -> estimates are usually exact
    exact = sum(cms_estimate(sketch, v) == int(true[v]) for v in true.index)
    assert exact / len(true) > 0.9


def test_cms_partial_is_bounded():
    rng = np.random.default_rng(17)
    big = pd.DataFrame({"v": rng.integers(0, 100_000, 20_000)})
    part = cms_partial(big, "v")
    assert len(part) <= CMS_D * CMS_W  # never O(batch), always O(sketch)


# ------------------------------------------------------------ bloom

def test_bloom_prune_has_no_false_negatives():
    from lauchy_ray.pipelines.queries import _bloom_positions
    rng = np.random.default_rng(19)
    members = rng.choice(10_000_000, size=2000, replace=False)
    probe = np.concatenate([members[:500],
                            rng.choice(10_000_000, size=5000)])
    pos = _bloom_positions(members)
    bitmap = np.zeros((1 << 20) >> 3, dtype=np.uint8)
    flat = pos.ravel()
    np.bitwise_or.at(bitmap, flat >> 3, np.uint8(1) << (flat & 7))
    ppos = _bloom_positions(probe)
    hit = np.ones(len(probe), dtype=bool)
    for i in range(ppos.shape[0]):
        p = ppos[i]
        hit &= (bitmap[p >> 3] >> (p & 7) & 1).astype(bool)
    in_set = np.isin(probe, members)
    assert (hit | ~in_set).all()  # every true member survives the prune
    # and the filter actually prunes (false-positive rate is tiny here)
    assert hit[~in_set].mean() < 0.01


# ------------------------------------------------------------ terms

def _naive_term_stats(docs: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for t in text.split():
            rows.append((t, doc_id))
    flat = pd.DataFrame(rows, columns=["term", "doc_id"])
    return (flat.groupby("term")
            .agg(tf=("doc_id", "size"), df=("doc_id", "nunique"))
            .reset_index())


def test_term_partial_fold_matches_naive():
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a c", "b b d", "", "a  a\ta\nc"]})
    parts = term_doc_partial(docs)
    # fold partials the way the bucket pass does, over ONE bucket
    folded = (parts.groupby("term")
              .agg(tf=("cnt", "sum"), df=("doc_id", "nunique"))
              .reset_index().sort_values("term").reset_index(drop=True))
    naive = _naive_term_stats(docs).sort_values("term").reset_index(drop=True)
    pd.testing.assert_frame_equal(folded, naive, check_dtype=False)


def test_term_bucket_topk_is_lossless_after_merge():
    rng = np.random.default_rng(23)
    vocab = [f"w{i:03d}" for i in range(120)]
    texts, ids = [], []
    for d in range(60):
        n = rng.integers(5, 40)
        texts.append(" ".join(rng.choice(vocab, size=n)))
        ids.append(d)
    docs = pd.DataFrame({"doc_id": ids, "text": texts})
    parts = term_doc_partial(docs)
    # split the TERM space across 3 buckets (as group_map_by_key would)
    bucket = pd.util.hash_array(parts["term"].to_numpy(object)) % 3
    tops = pd.concat([term_bucket_topk(parts[bucket == b], k=10)
                      for b in range(3)], ignore_index=True)
    got = merge_topk(tops, k=10)
    exp = (_naive_term_stats(docs)
           .sort_values(["tf", "term"], ascending=[False, True])
           .head(10).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[["term", "tf", "df"]],
                                  check_dtype=False)


def test_term_partial_empty_batch():
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "text": pd.Series(dtype=object)})
    out = term_doc_partial(empty)
    assert len(out) == 0 and list(out.columns) == ["term", "doc_id", "cnt"]
