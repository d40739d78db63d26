"""DSIR-style importance weighting for training-data selection
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023 — by name, not by code).

Given a TARGET slice of the corpus (here: the lang == target docs, the
stand-in for "looks like my high-quality domain"), every document gets
an importance weight

    w(doc) = Σ_f  cnt_f(doc) · ( ln p̂_target(f) − ln p̂_raw(f) )

over its word features f, with add-1 smoothed unigram language models
p̂(f) = (c(f) + 1) / (T + V) estimated on the target slice and on the
whole corpus. High-weight docs look like the target domain; selection
keeps the global top-k.

EXACTNESS CONTRACT (the SQL oracle hash-matches bit-for-bit): the two
log-probabilities are QUANTIZED to int64 — Q(c, den) =
floor(ln((c + 1.0)/den) · 1e12 + 0.5), one libm ln per DISTINCT count —
so the per-doc weight is an INTEGER sum, immune to float summation
order across engines (the tf_idf lesson: a float Σ over n-grams would
differ between numpy reduction order and DuckDB's).

Scale shape (the tf_idf two-shuffle pattern): batches fold to
(term, doc, cnt) partials, a term-keyed bucket shuffle attaches each
term's EXACT global (c_target, c_raw), a doc-keyed shuffle folds the
integer weight — both move one row per distinct (term, doc), never raw
tokens. The three global scalars (V, T_target, T_raw) are tiny
aggregates of per-term first-occurrence rows. Selection is the
partial-top-k + single-merge shape (no global sort shuffle for k rows).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .terms import term_doc_partial

LOG_SCALE = 1e12
DSIR_K = 200


def dsir_partial(df: pd.DataFrame, target_lang: str) -> pd.DataFrame:
    """One batch → (term, doc_id, cnt, tgt) explosion partial; tgt
    marks docs of the target slice (carried per pair so the term bucket
    can split counts without a lang join)."""
    out = term_doc_partial(df)
    if not len(out):
        out["tgt"] = pd.Series(dtype="int64")
        return out
    is_t = (df["lang"] == target_lang).to_numpy()
    tgt_of = pd.Series(is_t.astype(np.int64), index=df["doc_id"].to_numpy())
    out["tgt"] = tgt_of.reindex(out["doc_id"].to_numpy()).to_numpy()
    return out


def dsir_attach_counts(df: pd.DataFrame) -> pd.DataFrame:
    """One term bucket: every pair row of a term is here, so c_t / c_r
    are the exact global smoothing counts; ``first`` marks one row per
    term so Σ first = V, Σ c_t·first = T_target, Σ c_r·first = T_raw
    without a second vocabulary pass."""
    out = df[["doc_id", "term", "cnt"]].copy()
    out["c_t"] = ((df["cnt"] * df["tgt"])
                  .groupby(df["term"], sort=False)
                  .transform("sum").astype("int64"))
    out["c_r"] = (df.groupby("term", sort=False)["cnt"]
                  .transform("sum").astype("int64"))
    first = ~df["term"].duplicated()
    out["first"] = first.astype("int64")
    return out


def dsir_doc_weight(df: pd.DataFrame, t_t: int, t_r: int, v: int
                    ) -> pd.DataFrame:
    """One doc bucket: integer weight fold. One math.log per DISTINCT
    count value (libm scalar — numpy's SIMD log diverges by 1 ulp on
    some inputs, the doc_topk_tfidf constraint), quantized to int64
    BEFORE the sum so the fold is exact integer arithmetic."""
    den_t = t_t + v
    den_r = t_r + v

    def quant(counts: np.ndarray, den: int) -> np.ndarray:
        uniq, inv = np.unique(counts, return_inverse=True)
        qs = np.fromiter(
            (math.floor(math.log((int(c) + 1.0) / den) * LOG_SCALE + 0.5)
             for c in uniq), dtype=np.int64, count=len(uniq))
        return qs[inv]

    q_t = quant(df["c_t"].to_numpy(np.int64), den_t)
    q_r = quant(df["c_r"].to_numpy(np.int64), den_r)
    cnt = df["cnt"].to_numpy(np.int64)
    dq = q_t - q_r
    # raise-before-wrap (the lm_doc_fold pack-guard discipline): at the
    # 1e12 scale |q_t − q_r| can reach ~3e13, so a ~3e5-token doc's
    # integer fold would silently wrap int64 while the DuckDB oracle's
    # HUGEINT stays exact. The float abs-sum bounds every int64 partial
    # sum of the real fold, so ≤ 2^62 guarantees no wrap anywhere.
    chk = (pd.Series(np.abs(dq).astype(np.float64) * cnt)
           .groupby(df["doc_id"].to_numpy(np.int64), sort=False).sum())
    if len(chk) and float(chk.max()) > float(1 << 62):
        raise ValueError("per-doc dsir weight exceeds the int64 "
                         "quantized-log bound — lower LOG_SCALE or "
                         "split the doc")
    part = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                         "n_tok": cnt, "w": cnt * dq})
    g = part.groupby("doc_id", sort=False).agg(
        n_tok=("n_tok", "sum"), weight_scaled=("w", "sum")).reset_index()
    g["n_tok"] = g["n_tok"].astype("int64")
    g["weight_scaled"] = g["weight_scaled"].astype("int64")
    return g


SORT_KEYS = [("weight_scaled", "descending"), ("doc_id", "ascending")]


def dsir_topk_partial(t: pa.Table, k: int) -> pa.Table:
    return t.take(pc.select_k_unstable(t, k=k, sort_keys=SORT_KEYS))


def dsir_topk_merge(t: pa.Table, k: int) -> pa.Table:
    top = t.take(pc.select_k_unstable(t, k=k, sort_keys=SORT_KEYS)) \
        .sort_by(SORT_KEYS)
    return top.add_column(
        0, "rank", pa.array(np.arange(1, top.num_rows + 1), pa.int64()))


def dsir_weights(docs, target_lang: str = "en", k: int = DSIR_K,
                 size_ds=None):
    """documents Dataset (doc_id, text, lang) → top-k rows
    (rank, doc_id, n_tok, weight_scaled) by DSIR importance weight."""
    from .bucketing import group_map_by_key

    size_ds = size_ds if size_ds is not None else docs
    parts = docs.map_batches(
        lambda df: dsir_partial(df, target_lang), batch_format="pandas")
    pairs = group_map_by_key(parts, "term", dsir_attach_counts,
                             size_ds=size_ds).materialize()
    # global smoothing scalars: tiny sums over the first-occurrence rows
    scal = pairs.map_batches(
        lambda df: pd.DataFrame({
            "v": [int(df["first"].sum())],
            "t_t": [int((df["c_t"] * df["first"]).sum())],
            "t_r": [int((df["c_r"] * df["first"]).sum())]}),
        batch_format="pandas").to_pandas().sum()
    v, t_t, t_r = int(scal["v"]), int(scal["t_t"]), int(scal["t_r"])
    weights = group_map_by_key(
        pairs.drop_columns(["first"]), "doc_id",
        lambda g: dsir_doc_weight(g, t_t, t_r, v), size_ds=size_ds)
    return (weights.map_batches(lambda t: dsir_topk_partial(t, k),
                                batch_format="pyarrow")
            .repartition(1)
            .map_batches(lambda t: dsir_topk_merge(t, k),
                         batch_format="pyarrow", batch_size=None))


def dsir_sql(target_lang: str = "en", k: int = DSIR_K,
             docs_rel: str = "documents") -> str:
    """DuckDB oracle: identical WS tokenization, identical add-1
    quantized-log weight (floor(ln((c+1.0)/(T+V))·1e12 + 0.5) — one
    IEEE division, libm ln, exact integer sum), same (weight DESC,
    doc_id) top-k cut."""
    return rf"""
WITH toks AS (SELECT doc_id, lang,
                     unnest(regexp_extract_all(text, '[^ \t\n\r\f\v]+'))
                       AS term
              FROM {docs_rel}),
pairs AS (SELECT doc_id, lang, term, count(*) AS cnt
          FROM toks GROUP BY 1, 2, 3),
tc AS (SELECT term,
              CAST(coalesce(sum(cnt) FILTER (WHERE lang = '{target_lang}'),
                            0) AS BIGINT) AS c_t,
              CAST(sum(cnt) AS BIGINT) AS c_r
       FROM pairs GROUP BY term),
scal AS (SELECT CAST(count(*) AS BIGINT) AS v,
                CAST(sum(c_t) AS BIGINT) AS t_t,
                CAST(sum(c_r) AS BIGINT) AS t_r
         FROM tc),
q AS (SELECT term,
             CAST(floor(ln((c_t + 1.0) / (t_t + v)) * 1e12 + 0.5)
               AS BIGINT) AS q_t,
             CAST(floor(ln((c_r + 1.0) / (t_r + v)) * 1e12 + 0.5)
               AS BIGINT) AS q_r
      FROM tc, scal),
w AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_tok,
             CAST(sum(cnt * (q_t - q_r)) AS BIGINT) AS weight_scaled
      FROM pairs JOIN q USING (term) GROUP BY doc_id)
SELECT CAST(row_number() OVER (ORDER BY weight_scaled DESC, doc_id)
         AS BIGINT) AS rank,
       doc_id, n_tok, weight_scaled
FROM w ORDER BY weight_scaled DESC, doc_id LIMIT {k}"""
