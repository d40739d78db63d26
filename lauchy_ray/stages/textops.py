"""Text-analysis operators for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.
All vectorized (pandas str kernels / numpy) inside map_batches; the
lang-ID profile table is tiny constant state (module-level, compiled once
per worker process).

These run over the ``documents`` table (doc_id, text, lang, source,
n_chars) but work on any string column.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data as rd

TOKEN_RE = r"[A-Za-z0-9]+"
PUNCT_RE = r"[.!?,;:]"
# BPE-ish word/number/punct split (GPT-2 style simplification, public idiom)
BPE_RE = r"[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]+"

# Tiny per-language function-word profiles (public linguistic common
# knowledge); the heuristic votes by profile hits per token.
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "you", "that"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "fr": {"le", "la", "de", "et", "un", "les", "des", "en", "du", "est"},
    "de": {"der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"},
    "zh": set(),  # no-latin-token fallback bucket
}
_WORD_SPLIT = re.compile(r"[a-z0-9]+")


def lang_id_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Heuristic language ID: per-language function-word vote; 'und' when
    nothing matches. Deterministic; ties broken by language name order."""
    def detect(text: str) -> str:
        toks = _WORD_SPLIT.findall(text.lower())
        if not toks:
            return "und"
        best, best_hits = "und", 0
        for lang in sorted(_LANG_PROFILES):
            prof = _LANG_PROFILES[lang]
            if not prof:
                continue
            hits = sum(t in prof for t in toks)
            if hits > best_hits:
                best, best_hits = lang, hits
        return best

    out = df.copy()
    out["lang_pred"] = df[text_col].map(detect)
    return out


def quality_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Quality signals + a composite score in [0,1] (public heuristics:
    length band, alpha ratio, punctuation density, mean token length)."""
    text = df[text_col]
    n_chars = text.str.len().astype("int64")
    n_tokens = text.str.count(TOKEN_RE).astype("int64")
    n_alpha = text.str.count(r"[A-Za-z]").astype("int64")
    n_punct = text.str.count(PUNCT_RE).astype("int64")
    # single-op IEEE float64 expressions — bitwise-reproducible against the
    # DuckDB oracle (no accumulation-order variance), so no rounding needed
    alpha_ratio = (n_alpha / n_chars.clip(lower=1)).astype("float64")
    punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
    mean_tok_len = (n_alpha / n_tokens.clip(lower=1)).astype("float64")
    len_score = np.clip(n_chars / 200.0, 0.0, 1.0)
    score = (0.4 * len_score + 0.4 * alpha_ratio.clip(0, 1)
             + 0.2 * (1.0 - np.clip(punct_ratio * 5, 0, 1)))
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_chars": n_chars, "n_tokens": n_tokens,
        "alpha_ratio": alpha_ratio,
        "punct_ratio": punct_ratio,
        "mean_tok_len": mean_tok_len,
        "quality": pd.Series(score, index=df.index),
    })


WS_TOKEN_RE = r"[^ \t\n\r\f\v]+"  # EXPLICIT ASCII whitespace class: Python
# re treats \s as Unicode (NBSP etc.) while DuckDB/RE2 \s is ASCII-only, so
# \S+ is a latent Ray↔SQL parity break on Unicode whitespace (ADVICE r1).
# Both the pandas count and the SQL regex use THIS class byte-for-byte.


def token_count_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    """Whitespace tokens + BPE-ish subword-piece count (regex proxy).
    A run-of-non-whitespace count (not str.split) so the SQL oracle can
    mirror it exactly; see WS_TOKEN_RE for the RE2∩re whitespace policy."""
    return pd.DataFrame({
        "doc_id": df["doc_id"],
        "n_ws_tokens": df[text_col].str.count(WS_TOKEN_RE).astype("int64"),
        "n_bpe_pieces": df[text_col].str.count(BPE_RE).astype("int64"),
    })


_FP_BASE = 1_000_003  # rolling-hash base; arithmetic is uint64 wraparound


def _token_hashes(tokens: list[str]) -> np.ndarray:
    """Stable 64-bit token hashes (blake2b-8; deterministic cross-process)."""
    return np.array([int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(),
                                    "big") for t in tokens], dtype=np.uint64)


def fingerprint_batch(df: pd.DataFrame, text_col: str = "text",
                      window: int = 4, keep: int = 8) -> pd.DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): hash rolling
    token windows, keep the ``keep`` smallest → hex digest of the set.
    Robust to small edits away from changed regions. The window hash is
    ``window`` vectorized multiply-add passes (uint64 wraparound — only
    determinism matters for a fingerprint), not a per-window Python loop."""
    token_re = re.compile(TOKEN_RE)
    base = np.uint64(_FP_BASE)

    def fp(text: str) -> str:
        toks = token_re.findall(text.lower())
        if len(toks) < window:
            return hashlib.blake2b(" ".join(toks).encode(), digest_size=8).hexdigest()
        h = _token_hashes(toks)
        n_roll = len(toks) - window + 1
        acc = np.zeros(n_roll, dtype=np.uint64)
        for j in range(window):  # window is small: vector ops, not n_roll loops
            acc = acc * base + h[j:j + n_roll]
        smallest = np.sort(acc)[:keep]
        return hashlib.blake2b(smallest.astype(">u8").tobytes(),
                               digest_size=12).hexdigest()

    return pd.DataFrame({"doc_id": df["doc_id"], "fingerprint": df[text_col].map(fp)})


def doc_text_ops(ds: rd.Dataset) -> dict[str, rd.Dataset]:
    """Convenience: all four analyses over a documents Dataset."""
    return {
        "lang_id": ds.map_batches(lang_id_batch, batch_format="pandas"),
        "quality": ds.map_batches(quality_batch, batch_format="pandas"),
        "tokens": ds.map_batches(token_count_batch, batch_format="pandas"),
        "fingerprint": ds.map_batches(fingerprint_batch, batch_format="pandas"),
    }
