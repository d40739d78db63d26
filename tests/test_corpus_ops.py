"""Unit tests for the training-corpus operators: decontamination
(planted leakage, broadcast ≡ shuffle path), chunking boundary policy,
tf-idf scoring/tie order, and the repetition ratio."""

import numpy as np
import pandas as pd
import pytest

import lauchy_ray.pipelines.queries as Q
from lauchy_ray.stages.decontam import (bucket_hits,
                                        count_shared_batch,
                                        doc_ngram_hashes,
                                        holdout_hash_partial,
                                        train_gram_rows)

# ------------------------------------------------------- decontam units


def test_doc_ngram_hashes_distinct_and_short_docs():
    assert len(doc_ngram_hashes("one two three four")) == 0  # < N tokens
    g = doc_ngram_hashes("a b c d e f")  # 2 distinct 5-grams
    assert len(g) == 2
    # repetition does not inflate the DISTINCT set
    g2 = doc_ngram_hashes("a b c d e a b c d e a b c d e")
    assert len(g2) == len(set(g2.tolist()))


def test_planted_contamination_detected():
    leak = "alpha beta gamma delta epsilon"
    train = pd.DataFrame({
        "doc_id": np.array([1, 2], np.int64),
        "text": [f"intro words {leak} outro words", "totally clean text here ok"]})
    holdout = pd.DataFrame({
        "doc_id": np.array([9], np.int64),
        "text": [f"the eval question contains {leak} verbatim"]})
    hold = np.unique(holdout_hash_partial(holdout)["g"].to_numpy(np.int64))
    got = count_shared_batch(train, hold).set_index("doc_id")
    assert bool(got.loc[1, "contaminated"]) is True
    assert int(got.loc[1, "n_shared"]) >= 1
    assert bool(got.loc[2, "contaminated"]) is False


def test_bucket_hits_counts_distinct_overlap():
    # grams 10,20 on holdout side; train doc 1 has 10,20,30 -> 2 hits
    df = pd.DataFrame({
        "g": np.array([10, 20, 30, 10, 20], np.int64),
        "doc_id": np.array([1, 1, 1, -1, -1], np.int64),
        "side": np.array([0, 0, 0, 1, 1], np.int64)})
    out = bucket_hits(df)
    assert out.to_dict("records") == [{"doc_id": 1, "n_shared": 2}]


def test_train_gram_rows_shapes():
    df = pd.DataFrame({"doc_id": np.array([5], np.int64),
                       "text": ["a b c d e f"]})
    rows = train_gram_rows(df)
    assert set(rows.columns) == {"g", "doc_id"}
    assert (rows["doc_id"] == 5).all() and len(rows) == 2


def test_decontam_broadcast_equals_shuffle(tmp_path):
    # same corpus through both paths -> identical row sets
    sf = "/root/testdata/sf0.001"
    a = Q.q_decontam(sf).to_pandas()
    b = Q.q_decontam(sf, gate_bytes=0).to_pandas()
    key = ["doc_id", "n_shared", "contaminated"]
    a = a[key].sort_values("doc_id").reset_index(drop=True)
    b = b[key].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ------------------------------------------------------- chunk policy


def test_chunk_boundaries_policy(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    n = Q.CHUNK_TOKENS + Q.CHUNK_STRIDE  # exactly 2 full-stride starts
    toks = [f"t{i}" for i in range(n)]
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": [" ".join(toks), "short doc", ""]})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = Q.q_doc_chunks(str(tmp_path)).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("chunk_id")
    # starts 0 and 48 emit; start 96 is skipped (previous chunk hit EOF)
    assert d1["chunk_id"].tolist() == [0, 1]
    assert d1["n_tokens"].tolist() == [Q.CHUNK_TOKENS, n - Q.CHUNK_STRIDE]
    first = d1.iloc[0]["chunk_text"].split()
    assert first == toks[:Q.CHUNK_TOKENS]
    d2 = out[out["doc_id"] == 2]
    assert len(d2) == 1 and d2.iloc[0]["n_tokens"] == 2
    assert (out["doc_id"] == 3).sum() == 0  # empty doc -> no chunks


# ------------------------------------------------------- tf-idf


def test_tfidf_scoring_and_rank_order(tmp_path):
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                     "text": ["rare common common", "common common",
                              "common unique unique unique"]})
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = Q.q_tf_idf(str(tmp_path)).to_pandas()
    d1 = out[out["doc_id"] == 1].sort_values("rank")
    # 'rare' (tf=1, df=1): 1*ln(3) beats 'common' (tf=2, df=3): 2*ln(1)=0
    assert d1.iloc[0]["term"] == "rare"
    assert d1.iloc[0]["score"] == pytest.approx(math.log(3.0))
    assert d1.iloc[1]["term"] == "common"
    assert d1.iloc[1]["score"] == 0.0
    d3 = out[out["doc_id"] == 3].sort_values("rank")
    assert d3.iloc[0]["term"] == "unique"
    assert d3.iloc[0]["score"] == pytest.approx(3 * math.log(3.0))


# ------------------------------------------------------- repetition


def test_repetition_ratio(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["a b c a b c a b c",   # heavy trigram repetition
                 "all words here fully distinct trigrams",
                 "x y"]})               # too short for trigrams
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = (Q.q_doc_repetition(str(tmp_path)).to_pandas()
           .set_index("doc_id"))
    assert out.loc[1, "n_trigrams"] == 7
    assert out.loc[1, "n_distinct"] == 3  # abc, bca, cab
    assert out.loc[1, "rep_ratio"] == pytest.approx(1 - 3 / 7)
    assert out.loc[2, "rep_ratio"] == 0.0
    assert out.loc[3, "n_trigrams"] == 0 and out.loc[3, "rep_ratio"] == 0.0


def test_bigram_partial_doc_boundaries():
    """No pair crosses a doc boundary; empty and single-token docs
    contribute nothing; counts sum to Σ(len_i − 1)."""
    import pandas as pd

    from lauchy_ray.stages.terms import bigram_partial

    df = pd.DataFrame({"text": ["a b c", "", "x", "c a b a b"]})
    out = bigram_partial(df)
    assert out["n12"].sum() == (3 - 1) + (5 - 1)
    got = dict(zip(zip(out["w1"], out["w2"]), out["n12"]))
    assert got == {("a", "b"): 3, ("b", "c"): 1, ("c", "a"): 1,
                   ("b", "a"): 1}


def test_dup_span_catches_phase_shifted_copy():
    """A copy offset by ONE token (phase-shifted) defeats non-overlapping
    chunk dedup but must light up the sliding-span detector."""
    import pandas as pd
    import ray.data as rd

    from lauchy_ray.stages.textops import dup_span_stats

    base = " ".join(f"w{i}" for i in range(40))
    shifted = "pre " + base          # same 40-token run, phase-shifted
    unique = " ".join(f"u{i}" for i in range(40))
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [base, shifted, unique]}))
    out = dup_span_stats(ds).to_pandas().set_index("doc_id")
    assert out.loc[1, "n_shared"] == out.loc[1, "n_spans"]  # fully covered
    assert out.loc[2, "n_shared"] == out.loc[1, "n_spans"]  # the shared run
    assert out.loc[3, "n_shared"] == 0
    assert out.loc[3, "shared_ratio"] == 0.0


def test_lm_doc_scores_flags_gibberish():
    """A doc of corpus-typical bigrams must outscore (higher loglik per
    bigram) a doc of bigrams never seen elsewhere."""
    import pandas as pd
    import ray.data as rd

    from lauchy_ray.stages.terms import lm_doc_scores

    common = "the cat sat on the mat"
    rows = [{"doc_id": i, "text": common} for i in range(10)]
    rows.append({"doc_id": 100, "text": common})
    rows.append({"doc_id": 101, "text": "zx qv pl mw ke ru"})
    out = lm_doc_scores(rd.from_pandas(pd.DataFrame(rows))).to_pandas()
    o = out.set_index("doc_id")
    per_common = o.loc[100, "lp_scaled"] / o.loc[100, "n_big"]
    per_gibber = o.loc[101, "lp_scaled"] / o.loc[101, "n_big"]
    assert per_common > per_gibber
    assert o.loc[100, "n_big"] == 5 and o.loc[101, "n_big"] == 5
