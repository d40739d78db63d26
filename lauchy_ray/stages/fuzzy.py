"""Fuzzy string matching: edit-distance self-join over a value space.

Beyond-reference operator (entity resolution / catalog reconciliation —
the string-similarity sibling of the near-dup family in dedup_near.py).

Scale shape — three stages, none of which touches raw rows twice:
1. **Value-space reduction**: distinct values + occurrence counts via
   per-batch pyarrow partials folded in a name-bucketed shuffle. A fuzzy
   join is a property of the DISTINCT value space (64 names in the test
   part table, not 2 000 rows); pair output is linear in value-space
   pairs, never row pairs.
2. **Lossless length-band blocking**: the operator's pair predicate is
   ``byte-ED ≤ k AND |cp_len(a) − cp_len(b)| ≤ k`` (for ASCII the
   second conjunct is implied by the first); each value replicates to
   the k+1 blocks ``[len−k, len]`` and a pair is generated ONLY in
   block ``min(len_a, len_b)`` — every qualifying pair is produced
   exactly once, no post-hoc dedup. Within a block, candidate generation is
   all-pairs over that block's values, capped by MAX_BLOCK_VALUES (the
   published scale path for adversarially hot blocks is PassJoin-style
   pigeonhole segment blocking — Li, Deng, Feng, VLDB'11; the cap fails
   loudly rather than running an unbounded quadratic silently).
3. **Vectorized banded DP**: one numpy dynamic program over ALL pairs
   of a block at once — the row-wise insertion dependency is resolved
   with the prefix-min trick ``min_{j'≤j}(row[j'] + (j−j'))`` via
   ``np.minimum.accumulate`` — no Python loop over pairs or cells
   (loop count = max string length, not pair count).

The unit-cost Levenshtein here is bit-for-bit the DuckDB
``levenshtein()`` the oracle recomputes (fuzzy_pairs_sql).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .bucketing import group_map_by_key, safe_size_bytes

# all-pairs guard per length block: 20k values in one block = 2·10^8
# banded-DP cells per DP row — past what one task should chew silently.
MAX_BLOCK_VALUES = 20_000


def levenshtein_many(a_vals: np.ndarray, b_vals: np.ndarray) -> np.ndarray:
    """Exact unit-cost Levenshtein over UTF-8 BYTES for P (a, b) string
    pairs — bit-for-bit DuckDB ``levenshtein()`` semantics (which edits
    bytes, not codepoints: levenshtein('héllo','hello') = 2). Vectorized
    across pairs AND DP columns; Python-level loop only over the max
    byte length of the left strings."""
    P = len(a_vals)
    if P == 0:
        return np.zeros(0, dtype=np.int64)
    a_b = [s.encode("utf-8") for s in a_vals]
    b_b = [s.encode("utf-8") for s in b_vals]
    la = np.fromiter((len(s) for s in a_b), np.int64, P)
    lb = np.fromiter((len(s) for s in b_b), np.int64, P)
    La, Lb = int(la.max()), int(lb.max())
    a = np.zeros((P, max(La, 1)), dtype=np.uint8)
    b = np.zeros((P, max(Lb, 1)), dtype=np.uint8)
    for i, s in enumerate(a_b):
        if s:
            a[i, :len(s)] = np.frombuffer(s, np.uint8)
    for i, s in enumerate(b_b):
        if s:
            b[i, :len(s)] = np.frombuffer(s, np.uint8)

    cols = np.arange(Lb + 1, dtype=np.int64)
    prev = np.broadcast_to(cols, (P, Lb + 1)).copy()
    res = np.where(la == 0, lb, -1)
    take = np.minimum(lb, Lb)[:, None]
    for i in range(1, La + 1):
        cost = (a[:, i - 1][:, None] != b).astype(np.int64)
        tail = np.minimum(prev[:, :-1] + cost, prev[:, 1:] + 1)
        cur = np.concatenate(
            [np.full((P, 1), i, dtype=np.int64), tail], axis=1)
        # left-to-right insertion closure: cur[j] = min over j' ≤ j of
        # cur[j'] + (j - j')
        g = np.minimum.accumulate(cur - cols, axis=1)
        cur = g + cols
        hit = la == i
        if hit.any():
            res = np.where(
                hit, np.take_along_axis(cur, take, axis=1)[:, 0], res)
        prev = cur
    return res.astype(np.int64)


def _distinct_counts(ds: rd.Dataset, col: str) -> rd.Dataset:
    """(name, n) over the distinct value space — per-batch pyarrow
    partials, then a name-bucketed vectorized fold (NOT the bounded-key
    single-task merge: value spaces grow with the corpus)."""
    def partial(t: pa.Table) -> pa.Table:
        # NULL values never match anything (the SQL oracle's
        # `a.name < b.name` predicate drops NULLs) — filter them here so
        # the length/blocking arithmetic downstream never sees NaN
        t = t.filter(pc.is_valid(t[col]))
        return (pa.TableGroupBy(t.select([col]), [col])
                .aggregate([([], "count_all")])
                .rename_columns(["name", "n"]))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("name", sort=False)["n"].sum()
                .reset_index(name="n"))

    parts = ds.map_batches(partial, batch_format="pyarrow")
    return group_map_by_key(parts, "name", fold, size_ds=ds)


def _replicate_blocks(df: pd.DataFrame, max_dist: int) -> pd.DataFrame:
    L = df["name"].str.len().to_numpy(np.int64)
    frames = []
    for d in range(max_dist + 1):
        blk = L - d
        keep = blk >= 0
        frames.append(pd.DataFrame({
            "name": df["name"].to_numpy()[keep],
            "n": df["n"].to_numpy(np.int64)[keep],
            "L": L[keep], "block": blk[keep]}))
    return pd.concat(frames, ignore_index=True)


def _block_kernel(df: pd.DataFrame, max_dist: int) -> pd.DataFrame:
    """All qualifying pairs whose SHORTER length equals the block key —
    key-agnostic (iterates the blocks present in this bucket)."""
    out = []
    for blk, g in df.groupby("block", sort=False):
        names = g["name"].to_numpy()
        ns = g["n"].to_numpy(np.int64)
        Ls = g["L"].to_numpy(np.int64)
        if len(names) > MAX_BLOCK_VALUES:
            raise ValueError(
                f"length block {blk}: {len(names)} distinct values exceeds "
                f"MAX_BLOCK_VALUES={MAX_BLOCK_VALUES}; use PassJoin-style "
                "segment blocking for hot blocks")
        # generate ONLY the pairs this block owns (shorter side length ==
        # block key): triu over the len==blk values plus their cross
        # product with the longer replicas — never the full block triu
        # (which would be mostly next-block-owned pairs discarded after
        # materializing O(block²) index arrays)
        short = np.flatnonzero(Ls == blk)
        longer = np.flatnonzero(Ls > blk)   # replicas: blk < L ≤ blk+k
        si, sj = np.triu_indices(len(short), k=1)
        ci, cj = (np.repeat(short, len(longer)),
                  np.tile(longer, len(short)))
        i = np.concatenate([short[si], ci])
        j = np.concatenate([short[sj], cj])
        if not len(i):
            continue
        # canonical lexicographic order
        swap = names[i] > names[j]
        ai = np.where(swap, j, i)
        bj = np.where(swap, i, j)
        dist = levenshtein_many(names[ai], names[bj])
        hit = dist <= max_dist
        out.append(pd.DataFrame({
            "name_a": names[ai][hit], "name_b": names[bj][hit],
            "dist": dist[hit],
            "n_a": ns[ai][hit], "n_b": ns[bj][hit]}))
    if not out:
        return pd.DataFrame({
            "name_a": pd.Series([], dtype=object),
            "name_b": pd.Series([], dtype=object),
            "dist": pd.Series([], dtype=np.int64),
            "n_a": pd.Series([], dtype=np.int64),
            "n_b": pd.Series([], dtype=np.int64)})
    return pd.concat(out, ignore_index=True)


def fuzzy_self_join(ds: rd.Dataset, col: str,
                    max_dist: int = 1) -> rd.Dataset:
    """(name_a < name_b, dist, n_a, n_b): all distinct-value pairs of
    ``col`` within edit distance ``max_dist``, with occurrence counts."""
    size = safe_size_bytes(ds)
    counts = _distinct_counts(ds, col)
    blocked = counts.map_batches(
        lambda d: _replicate_blocks(d, max_dist), batch_format="pandas")
    return group_map_by_key(
        blocked, "block", lambda d: _block_kernel(d, max_dist),
        size_bytes=size)


# ---------------------------------------------------------------- SQL side

def fuzzy_pairs_sql(col: str = "p_name", rel: str = "part",
                    max_dist: int = 1) -> str:
    """DuckDB oracle: exact all-pairs levenshtein over the distinct
    value space. The ``abs(length…)`` (codepoint-length) predicate is
    part of the operator contract on BOTH sides — for pure-ASCII data it
    is implied by the distance bound; for multibyte text it pins down
    the same relation the Ray side's codepoint-length blocking computes
    (DuckDB's levenshtein edits bytes, length() counts codepoints)."""
    return f"""
WITH names AS (SELECT {col} AS name, count(*) AS n FROM {rel} GROUP BY 1)
SELECT a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS dist, a.n AS n_a, b.n AS n_b
FROM names a JOIN names b
  ON a.name < b.name
 AND abs(length(a.name) - length(b.name)) <= {max_dist}
WHERE levenshtein(a.name, b.name) <= {max_dist}"""
