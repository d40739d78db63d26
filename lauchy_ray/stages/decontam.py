"""Train/test decontamination — the benchmark-leakage scan every serious
LLM training corpus needs: flag training documents that share any word
n-gram with the held-out evaluation split, so eval scores measure
generalization rather than memorization.

Scale shape: the HOLDOUT side is small by construction (an eval suite,
not a second corpus), so the default path builds its distinct-n-gram
hash set once — distributed per-batch hash partials, one driver union —
and broadcasts the sorted array via ray.put; every train batch then
counts its per-doc overlaps with one vectorized searchsorted pass,
touching each training document exactly once and shipping zero training
n-grams over the network. When the holdout set outgrows the broadcast
gate, the fallback co-locates (ngram_hash, doc_id, side) rows on a hash
bucket — the standard tagged-union semi-join shape — and a doc-keyed
sum folds per-bucket hit counts; fully distributed, two bounded
shuffles, still never all-pairs.

N-grams are space-joined runs of N lowercased [a-z0-9]+ tokens, hashed
with the repo's shared md5-60bit convention so the DuckDB oracle
re-derives the identical join keys (stages/dedup_near.py:677; string
n-grams on the SQL side — equal barring 2^-60-scale collisions).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .dedup_near import md5_60

NGRAM_N = 5
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def doc_ngram_hashes(text: str, n: int = NGRAM_N) -> np.ndarray:
    """One document → its DISTINCT word-n-gram md5-60 hashes (int64;
    60 bits always fit). Shorter-than-n docs have no n-grams."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < n:
        return np.empty(0, dtype=np.int64)
    grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
    return np.fromiter((md5_60(g) for g in grams), dtype=np.int64,
                       count=len(grams))


def holdout_hash_partial(df: pd.DataFrame, text_col: str = "text",
                         n: int = NGRAM_N) -> pd.DataFrame:
    """Holdout batch → the batch's distinct n-gram hashes (one deduped
    int64 column; the driver unions these bounded partials)."""
    if not len(df):
        return pd.DataFrame({"g": pd.Series(dtype="int64")})
    hs = [doc_ngram_hashes(t, n) for t in df[text_col]]
    return pd.DataFrame({"g": np.unique(np.concatenate(hs))
                         if hs else np.empty(0, np.int64)})


def count_shared_batch(df: pd.DataFrame, holdout_sorted: np.ndarray,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = NGRAM_N) -> pd.DataFrame:
    """Train batch → per-doc count of distinct n-grams present in the
    broadcast holdout array (one searchsorted per doc's gram set)."""
    ids = df[id_col].to_numpy(np.int64)
    shared = np.zeros(len(df), dtype=np.int64)
    for i, t in enumerate(df[text_col]):
        g = doc_ngram_hashes(t, n)
        if len(g) and len(holdout_sorted):
            idx = np.clip(np.searchsorted(holdout_sorted, g), 0,
                          len(holdout_sorted) - 1)
            shared[i] = int((holdout_sorted[idx] == g).sum())
    return pd.DataFrame({id_col: ids, "n_shared": shared,
                         "contaminated": shared > 0})


def train_gram_rows(df: pd.DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", n: int = NGRAM_N) -> pd.DataFrame:
    """Train batch → exploded DISTINCT (g, doc_id) rows for the shuffle
    fallback (per-doc distinct, so the downstream bucket count is the
    distinct-overlap count)."""
    gs, ids = [], []
    for i, t in zip(df[id_col].to_numpy(np.int64), df[text_col]):
        g = doc_ngram_hashes(t, n)
        gs.append(g)
        ids.append(np.full(len(g), i, np.int64))
    if not gs:
        return pd.DataFrame({"g": pd.Series(dtype="int64"),
                             id_col: pd.Series(dtype="int64")})
    return pd.DataFrame({"g": np.concatenate(gs),
                         id_col: np.concatenate(ids)})


def bucket_hits(df: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """One gram-hash bucket: count each train doc's grams that also occur
    on the holdout side of this bucket (a gram's rows all land here, so
    per-bucket counts sum to the exact global distinct-overlap count)."""
    have = df.loc[df["side"] == 1, "g"]
    hit = df[(df["side"] == 0) & df["g"].isin(have)]
    if not len(hit):
        return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                             "n_shared": pd.Series(dtype="int64")})
    g = hit.groupby(id_col, sort=False).size().reset_index(name="n_shared")
    g[id_col] = g[id_col].astype("int64")
    g["n_shared"] = g["n_shared"].astype("int64")
    return g


def decontam_sql(n: int = NGRAM_N, knuth: int = 2654435761,
                 docs_rel: str = "documents") -> str:
    """DuckDB oracle: identical split hash, tokenization and n-gram
    construction on STRINGS (the Ray side joins on md5-60 hashes of the
    same strings — equal results barring astronomically unlikely
    collisions). Every train doc appears exactly once, n_shared = count
    of its distinct n-grams present anywhere in the test split."""
    return f"""
WITH split AS (
  SELECT doc_id, text,
         ((doc_id * {knuth}) % 4294967296) % 100 AS h
  FROM {docs_rel}),
tok AS (
  SELECT doc_id, h,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM split),
ng AS (
  SELECT doc_id, h,
         CASE WHEN len(toks) < {n} THEN []
              ELSE list_distinct([array_to_string(toks[i:i+{n - 1}], ' ')
                                  for i in range(1, len(toks) - {n - 2})])
         END AS gs
  FROM tok),
te AS (SELECT DISTINCT unnest(gs) AS g FROM ng WHERE h >= 90),
tr AS (SELECT doc_id, unnest(gs) AS g FROM ng WHERE h < 80),
hits AS (
  SELECT tr.doc_id, count(*) AS n_shared
  FROM tr JOIN te USING (g) GROUP BY tr.doc_id)
SELECT s.doc_id, COALESCE(hits.n_shared, 0) AS n_shared,
       COALESCE(hits.n_shared, 0) > 0 AS contaminated
FROM (SELECT doc_id FROM ng WHERE h < 80) s
LEFT JOIN hits USING (doc_id)"""
