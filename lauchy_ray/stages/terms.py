"""Term explosion + vocabulary statistics (the flat_map face of the
engine: one row fans out to N token rows, then a grouped aggregate over a
key space that GROWS with the corpus).

Scale shape: a vocabulary is unbounded (new terms keep appearing at
100 TB), so unlike the bounded-key aggregates (_grouped_sums) the term
rollup must SHUFFLE — but never raw token rows. Each batch first folds
its explosion to (term, doc_id, cnt) partials (a document lives entirely
inside one input row, hence one batch, so per-(term, doc) counts are
exact locally), the shuffle co-locates each TERM on a hash bucket, one
vectorized pass per bucket computes exact tf (total occurrences) and df
(distinct docs), and only the per-bucket top-k survives to the driver
merge — O(buckets × k) rows, never O(vocabulary).

Tokenization is the repo-wide WS_TOKEN_RE ASCII-whitespace run class
(stages/textops.py) so the DuckDB oracle re-derives the identical token
stream via regexp_extract_all; term tie-order is byte order, which UTF-8
preserves across Python codepoint sort and DuckDB binary collation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .textops import WS_TOKEN_RE

TOP_TERMS_K = 50


def term_doc_partial(df: pd.DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """One batch → its (term, doc_id, cnt) explosion partial, vectorized:
    findall + numpy repeat + one groupby, no Python loop over rows."""
    toks = df[text_col].str.findall(WS_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    if lens.sum() == 0:
        return pd.DataFrame({"term": pd.Series(dtype=object),
                             id_col: pd.Series(dtype="int64"),
                             "cnt": pd.Series(dtype="int64")})
    flat = pd.DataFrame({
        "term": np.concatenate(toks.to_numpy()),
        id_col: df[id_col].to_numpy(np.int64).repeat(lens)})
    g = flat.groupby(["term", id_col], sort=False).size()
    out = g.reset_index()
    out.columns = ["term", id_col, "cnt"]
    out["cnt"] = out["cnt"].astype("int64")
    return out


def term_bucket_topk(df: pd.DataFrame, k: int = TOP_TERMS_K,
                     id_col: str = "doc_id") -> pd.DataFrame:
    """All partials of a term land in one bucket, so tf/df here are the
    EXACT global figures; any global top-k term is necessarily in its own
    bucket's top-k, so emitting k rows per bucket is lossless."""
    g = df.groupby("term", sort=False).agg(
        tf=("cnt", "sum"), df=(id_col, "nunique"))
    g = g.reset_index()
    g["tf"] = g["tf"].astype("int64")
    g["df"] = g["df"].astype("int64")
    return (g.sort_values(["tf", "term"], ascending=[False, True],
                          kind="stable").head(k))


def merge_topk(parts: pd.DataFrame, k: int = TOP_TERMS_K) -> pd.DataFrame:
    """Driver merge of the bounded per-bucket partials (buckets × k rows):
    global (tf DESC, term ASC) head — the same total order as the oracle's
    ORDER BY, so the k-boundary is deterministic."""
    out = (parts.sort_values(["tf", "term"], ascending=[False, True],
                             kind="stable").head(k))
    return out[["term", "tf", "df"]].reset_index(drop=True)


TFIDF_K = 3


def term_df_attach(df: pd.DataFrame, id_col: str = "doc_id") -> pd.DataFrame:
    """One term bucket: a term's rows are ALL here, so the per-term
    distinct-doc count is its exact global document frequency; attach it
    to every (term, doc) row for the doc-keyed scoring shuffle."""
    out = df[[id_col, "term", "cnt"]].copy()
    out["df"] = (df.groupby("term", sort=False)[id_col]
                 .transform("nunique").astype("int64"))
    return out


def doc_topk_tfidf(df: pd.DataFrame, n_docs: int, k: int = TFIDF_K,
                   id_col: str = "doc_id") -> pd.DataFrame:
    """One doc bucket: score = tf · ln(N/df), then the per-doc (score
    DESC, term ASC) top-k with a dense 1-based rank. ln MUST be
    ``math.log`` per DISTINCT df, not ``np.log`` — numpy's SIMD log
    diverges from DuckDB/libm by 1 ulp on some inputs (the HLL sketch
    documents the same constraint, sketches.py:16-18); distinct df
    values are bounded by the bucket's doc count, so the scalar calls
    are O(groups), not O(rows)."""
    import math
    dfv = df["df"].to_numpy(np.int64)
    uniq, inv = np.unique(dfv, return_inverse=True)
    logs = np.fromiter((math.log(n_docs / int(d)) for d in uniq),
                       dtype=np.float64, count=len(uniq))
    score = df["cnt"].to_numpy(np.float64) * logs[inv]
    out = df.assign(score=score).sort_values(
        [id_col, "score", "term"], ascending=[True, False, True],
        kind="stable")
    out = out.groupby(id_col, sort=False).head(k).reset_index(drop=True)
    out["rank"] = (out.groupby(id_col, sort=False).cumcount() + 1).astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    return out[[id_col, "rank", "term", "cnt", "df", "score"]]
