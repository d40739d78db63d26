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


BIGRAM_K = 50


def bigram_partial(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """One batch → its (w1, w2, n12) adjacent-bigram explosion partial.
    Vectorized: one findall per doc (C regex), one flat concatenate,
    doc-boundary pairs masked out by end-index — no Python loop over
    tokens."""
    toks = df[text_col].str.findall(WS_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    nz = lens > 0
    if nz.sum() == 0 or lens.sum() < 2:
        return pd.DataFrame({"w1": pd.Series(dtype=object),
                             "w2": pd.Series(dtype=object),
                             "n12": pd.Series(dtype="int64")})
    flat = np.concatenate(toks.to_numpy()[nz])
    lens = lens[nz]
    valid = np.ones(len(flat) - 1, dtype=bool)
    ends = np.cumsum(lens) - 1          # last-token index per doc
    valid[ends[:-1]] = False            # no pair crosses a doc boundary
    pairs = pd.DataFrame({"w1": flat[:-1][valid], "w2": flat[1:][valid]})
    g = pairs.groupby(["w1", "w2"], sort=False).size().reset_index()
    g.columns = ["w1", "w2", "n12"]
    g["n12"] = g["n12"].astype("int64")
    return g


def bigram_bucket_topk(df: pd.DataFrame, k: int = BIGRAM_K) -> pd.DataFrame:
    """All partials of a LEFT word land in one bucket, so both n12 and
    the left-context total n1 = Σ_w2 n12(w1, w2) are exact here; the
    conditional probability p = n12 / n1 is ONE double division (IEEE-
    identical to the oracle's CAST(n12 AS DOUBLE) / n1). Any global
    top-k bigram is in its own bucket's top-k, so k rows per bucket are
    lossless."""
    g = (df.groupby(["w1", "w2"], sort=False)["n12"].sum()
         .reset_index())
    g["n12"] = g["n12"].astype("int64")
    n1 = g.groupby("w1", sort=False)["n12"].transform("sum").astype("int64")
    g["n1"] = n1
    g = g.sort_values(["n12", "w1", "w2"],
                      ascending=[False, True, True], kind="stable").head(k)
    g["p"] = g["n12"].to_numpy(np.float64) / g["n1"].to_numpy(np.float64)
    return g.reset_index(drop=True)


def merge_bigram_topk(parts: pd.DataFrame, k: int = BIGRAM_K) -> pd.DataFrame:
    """Bounded merge of per-bucket candidates (O(buckets × k) rows)."""
    return (parts.sort_values(["n12", "w1", "w2"],
                              ascending=[False, True, True], kind="stable")
            .head(k).reset_index(drop=True))


def bigram_sql(k: int = BIGRAM_K, docs_rel: str = "documents") -> str:
    """DuckDB oracle: identical WS tokenization (regexp_extract_all),
    list_zip of shifted slices for adjacent pairs, same (n12 DESC, w1,
    w2) total order for the top-k cut. NB DuckDB list slicing is 1-based
    and INCLUSIVE of a negative end index (lst[:-1] is the WHOLE list),
    so "all but last" must be written lst[1:len(lst)-1] — the shorthand
    would make list_zip pad a spurious (w_last, NULL) pair per doc."""
    return rf"""
WITH lsts AS (SELECT regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS lst
              FROM {docs_rel}),
z AS (SELECT unnest(list_zip(lst[1:len(lst)-1], lst[2:len(lst)])) AS pr
      FROM lsts WHERE len(lst) >= 2),
big AS (SELECT pr[1] AS w1, pr[2] AS w2, count(*) AS n12
        FROM z GROUP BY 1, 2),
tot AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM big GROUP BY w1)
SELECT b.w1, b.w2, b.n12, t.n1, CAST(b.n12 AS DOUBLE) / t.n1 AS p
FROM big b JOIN tot t USING (w1)
ORDER BY b.n12 DESC, b.w1, b.w2 LIMIT {k}"""


# ---------------------------------------------------- windowed co-occurrence

COOC_WINDOW = 3  # token-distance window for co-occurrence pairs


def cooccur_partial(df: pd.DataFrame, window: int = COOC_WINDOW,
                    text_col: str = "text") -> pd.DataFrame:
    """One batch → its unordered within-window co-occurrence counts (the
    PMI / word-embedding co-occurrence matrix builder): every token pair
    at distance 1..window inside a doc, as (min, max) lexicographic so
    (a,b) and (b,a) fold together. Same vectorized shape as
    bigram_partial — one findall per doc, one flat concatenate, one
    shifted-compare per offset, doc boundaries masked by doc index; no
    Python loop over tokens. Output cardinality is bounded by distinct
    pairs (≤ vocab²) per batch, then folded again per bucket."""
    empty = pd.DataFrame({"w1": pd.Series(dtype=object),
                          "w2": pd.Series(dtype=object),
                          "n": pd.Series(dtype="int64")})
    toks = df[text_col].str.findall(WS_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    nz = lens > 0
    if nz.sum() == 0 or lens.sum() < 2:
        return empty
    flat = np.concatenate(toks.to_numpy()[nz])
    lens = lens[nz]
    doc_of = np.repeat(np.arange(len(lens)), lens)
    frames = []
    for off in range(1, window + 1):
        if len(flat) <= off:
            break
        valid = doc_of[off:] == doc_of[:-off]
        a, b = flat[:-off][valid], flat[off:][valid]
        le = a <= b  # np.minimum has no unicode loop; compare + select
        frames.append(pd.DataFrame({"w1": np.where(le, a, b),
                                    "w2": np.where(le, b, a)}))
    if not frames:
        return empty
    g = (pd.concat(frames, ignore_index=True)
         .groupby(["w1", "w2"], sort=False).size().reset_index(name="n"))
    g["n"] = g["n"].astype("int64")
    return g


def cooccur_fold(df: pd.DataFrame) -> pd.DataFrame:
    g = df.groupby(["w1", "w2"], sort=False)["n"].sum().reset_index()
    g["n"] = g["n"].astype("int64")
    return g


def cooccur_sql(window: int = COOC_WINDOW,
                docs_rel: str = "documents") -> str:
    """DuckDB oracle: identical WS tokenization, positional self-join
    within the token-distance window, least/greatest pair fold (binary
    collation ≡ numpy's codepoint comparison on the ASCII token class —
    the same parity class token_counts documents)."""
    return rf"""
WITH toks AS (SELECT doc_id,
                     regexp_extract_all(text, '[^ \t\n\r\f\v]+') AS lst
              FROM {docs_rel}),
pos AS (SELECT doc_id, unnest(lst) AS w,
               unnest(range(len(lst))) AS i
        FROM toks),
pairs AS (SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
          FROM pos a JOIN pos b
            ON a.doc_id = b.doc_id
           AND b.i > a.i AND b.i <= a.i + {window})
SELECT w1, w2, count(*) AS n FROM pairs GROUP BY 1, 2"""


# ------------------------------------------- bigram-LM document scoring

LM_LOG_SCALE = 1e12


def bigram_doc_partial(df: pd.DataFrame,
                       text_col: str = "text") -> pd.DataFrame:
    """One batch → (doc_id, w1, w2, cnt) adjacent-bigram partials (the
    per-doc sibling of bigram_partial; same vectorized shape — doc
    boundaries masked by end index, one groupby)."""
    toks = df[text_col].str.findall(WS_TOKEN_RE)
    lens = toks.str.len().to_numpy(np.int64)
    nz = lens > 0
    empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                          "w1": pd.Series(dtype=object),
                          "w2": pd.Series(dtype=object),
                          "cnt": pd.Series(dtype="int64")})
    if nz.sum() == 0 or lens.sum() < 2:
        return empty
    flat = np.concatenate(toks.to_numpy()[nz])
    lens_nz = lens[nz]
    ids = df["doc_id"].to_numpy(np.int64)[nz]
    valid = np.ones(len(flat) - 1, dtype=bool)
    ends = np.cumsum(lens_nz) - 1
    valid[ends[:-1]] = False
    doc_of = np.repeat(ids, lens_nz)[:-1][valid]
    pairs = pd.DataFrame({"doc_id": doc_of, "w1": flat[:-1][valid],
                          "w2": flat[1:][valid]})
    g = (pairs.groupby(["doc_id", "w1", "w2"], sort=False).size()
         .reset_index(name="cnt"))
    g["cnt"] = g["cnt"].astype("int64")
    return g


def lm_attach_counts(df: pd.DataFrame) -> pd.DataFrame:
    """One w1 bucket: every (w1, ·) row is here, so the global bigram
    count n12, the context total n1 = Σ_w2 n12, and the distinct-bigram
    first-flags (Σ first = B, the smoothing denominator's vocabulary
    term) are all exact in one pass."""
    out = df[["doc_id", "cnt"]].copy()
    out["n12"] = (df.groupby(["w1", "w2"], sort=False)["cnt"]
                  .transform("sum").astype("int64"))
    out["n1"] = (df.groupby("w1", sort=False)["cnt"]
                 .transform("sum").astype("int64"))
    out["first"] = (~df.duplicated(["w1", "w2"])).astype("int64")
    return out


def lm_doc_fold(df: pd.DataFrame, b: int) -> pd.DataFrame:
    """One doc bucket: integer log-prob fold. Add-1-smoothed bigram LM
    p(w2|w1) = (n12 + 1) / (n1 + B) with B = distinct-bigram count;
    the log is QUANTIZED to int64 (floor(ln·1e12 + 0.5), one libm call
    per DISTINCT (n12, n1) pair) so the per-doc sum is exact integer
    arithmetic — order-independent across engines (the dsir
    discipline). Score ≈ doc log-likelihood under the corpus LM — the
    CCNet/KenLM quality-filter signal."""
    import math
    n12 = df["n12"].to_numpy(np.int64)
    n1 = df["n1"].to_numpy(np.int64)
    if (len(n1) and int(n1.max()) >= (1 << 31)) or b >= (1 << 31):
        raise ValueError("bigram counts exceed the quantization pack bound")
    packed = (n12 << 31) | n1
    uniq, inv = np.unique(packed, return_inverse=True)
    qs = np.fromiter(
        (math.floor(math.log((int(p >> 31) + 1.0) / (int(p & ((1 << 31) - 1))
                                                     + b))
                    * LM_LOG_SCALE + 0.5) for p in uniq),
        dtype=np.int64, count=len(uniq))
    cnt = df["cnt"].to_numpy(np.int64)
    lq = qs[inv]
    # raise-before-wrap: |quantized log| ≤ ~3e13 at the 1e12 scale, so a
    # ~3e5-bigram doc could wrap the int64 fold. Float abs-sum bounds
    # every int64 partial sum (same guard as dsir_doc_weight).
    chk = (pd.Series(np.abs(lq).astype(np.float64) * cnt)
           .groupby(df["doc_id"].to_numpy(np.int64), sort=False).sum())
    if len(chk) and float(chk.max()) > float(1 << 62):
        raise ValueError("per-doc LM log-prob exceeds the int64 "
                         "quantized-log bound — lower LM_LOG_SCALE or "
                         "split the doc")
    part = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                         "n_big": cnt, "lp": cnt * lq})
    g = part.groupby("doc_id", sort=False).agg(
        n_big=("n_big", "sum"), lp_scaled=("lp", "sum")).reset_index()
    return g.astype({"doc_id": "int64", "n_big": "int64",
                     "lp_scaled": "int64"})


def lm_doc_scores(docs, size_ds=None):
    """documents Dataset (doc_id, text) → (doc_id, n_big, lp_scaled):
    per-doc log-likelihood under the corpus's own add-1 bigram LM.
    Two bucketed shuffles (w1-keyed count attach, doc-keyed fold), one
    row per distinct (doc, bigram) — never raw tokens."""
    from .bucketing import group_map_by_key
    size_ds = size_ds if size_ds is not None else docs
    parts = docs.map_batches(bigram_doc_partial, batch_format="pandas")
    pairs = group_map_by_key(parts, "w1", lm_attach_counts,
                             size_ds=size_ds).materialize()
    b = int(pairs.map_batches(
        lambda df: pd.DataFrame({"b": [int(df["first"].sum())]}),
        batch_format="pandas").to_pandas()["b"].sum())
    return group_map_by_key(pairs.drop_columns(["first"]), "doc_id",
                            lambda g: lm_doc_fold(g, b), size_ds=size_ds)


def lm_doc_scores_sql(docs_rel: str = "documents") -> str:
    """DuckDB oracle for :func:`lm_doc_scores` — identical tokenization
    and bigram construction (the bigram_sql slicing rules), identical
    quantized-log integer fold."""
    return rf"""
WITH lsts AS (SELECT doc_id, regexp_extract_all(text, '[^ \t\n\r\f\v]+')
                       AS lst
              FROM {docs_rel}),
z AS (SELECT doc_id,
             unnest(list_zip(lst[1:len(lst)-1], lst[2:len(lst)])) AS pr
      FROM lsts WHERE len(lst) >= 2),
bg AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2, count(*) AS cnt
       FROM z GROUP BY 1, 2, 3),
gl AS (SELECT w1, w2, CAST(sum(cnt) AS BIGINT) AS n12
       FROM bg GROUP BY 1, 2),
n1t AS (SELECT w1, CAST(sum(n12) AS BIGINT) AS n1 FROM gl GROUP BY 1),
scal AS (SELECT CAST(count(*) AS BIGINT) AS b FROM gl),
q AS (SELECT w1, w2,
             CAST(floor(ln((n12 + 1.0) / (n1 + b)) * 1e12 + 0.5)
               AS BIGINT) AS ql
      FROM gl JOIN n1t USING (w1), scal)
SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_big,
       CAST(sum(cnt * ql) AS BIGINT) AS lp_scaled
FROM bg JOIN q USING (w1, w2) GROUP BY doc_id"""
