"""Distributed k-means over an embedding column, in EXACT integer fixed
point — the vector-clustering primitive of a training-data pipeline
(corpus bucketing, IVF coarse quantizers, diversity sampling).

Why fixed point: float Lloyd iterations accumulate in whatever order the
blocks arrive, so a float engine and a SQL oracle drift and assignments
flip on near-ties. Here every cell quantizes ONCE to
``floor(v * 2^20) + 2^21`` (the shift makes all values non-negative, so
DuckDB's TRUNCATING ``//`` and numpy's FLOORING ``//`` agree on the
centroid means — measured divergence on negative sums otherwise), and
every later step is exact int64 arithmetic: squared-L2 assignment with
min-cluster-id tie-break, centroid update ``sum // count``. The DuckDB
oracle (:func:`kmeans_sql`) re-derives the identical trajectory, so the
final assignment is value-checkable at any scale.

Bounds: |v| < 2 asserted (cells are < 2^22 after shift; per-dim squared
diff < 2^44; 64 dims < 2^50; cluster sums < 2^22 · n — int64-safe past
10^12 members). Non-finite cells quantize to the shift origin (= 0.0)
on both sides. Seeding: clusters init from the vectors with
``vec_id < k`` (deterministic, SQL-re-derivable — the ann_ivf
data-point-quantizer idea). Empty clusters drop out of later rounds on
both sides.

Scale shape: each Lloyd round is ONE streaming map_batches pass over the
vectors against a broadcast (k × dim) int64 centroid matrix, emitting a
per-batch (cluster, dim) partial sum — O(k · dim) rows per batch — and
the driver folds k·dim scalars. No shuffle, no per-row Python, vectors
never materialize.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .dedup_near import emb_matrix

KM_SCALE = 1 << 20
KM_SHIFT = 1 << 21


def _quantize(m: np.ndarray) -> np.ndarray:
    """float (n, dim) → shifted fixed-point int64; non-finite → origin."""
    fin = np.isfinite(m)
    if not bool((np.abs(m[fin]) < 2.0).all()):
        raise ValueError("|v| >= 2 exceeds the fixed-point design range")
    q = np.where(fin, np.floor(m.astype(np.float64) * KM_SCALE), 0.0)
    return q.astype(np.int64) + KM_SHIFT


def _assign(mq: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """argmin_c Σ_d (v − c)² (exact int64), ties → smallest cluster
    INDEX (centroid rows are ordered by cluster id, and np.argmin
    returns the first minimum)."""
    # (n, k): expand per cluster to keep the temp at n×k, not n×k×dim
    n = mq.shape[0]
    d = np.empty((n, cents.shape[0]), np.int64)
    for c in range(cents.shape[0]):       # k iterations, vectorized body
        diff = mq - cents[c]
        d[:, c] = np.einsum("ij,ij->i", diff, diff)
    return np.argmin(d, axis=1)


def kmeans_fp(vectors: rd.Dataset, k: int = 8, iters: int = 2,
              id_col: str = "vec_id",
              emb_col: str = "embedding") -> rd.Dataset:
    """(vec_id, cluster) after ``iters`` exact fixed-point Lloyd rounds
    plus a final assignment. ``cluster`` is the seed ordinal (0..k-1
    minus any cluster that emptied out along the way)."""
    seeds = (vectors.filter(expr=f"{id_col} < {k}")
             .to_pandas().sort_values(id_col))
    if not len(seeds):
        raise ValueError(f"no seed vectors with {id_col} < {k}")
    cents = _quantize(np.stack(
        [np.asarray(e, np.float64) for e in seeds[emb_col]]))
    cl_ids = seeds[id_col].to_numpy(np.int64)   # surviving cluster ids

    for _ in range(iters):
        ref = ray.put(cents)

        def partial(t: pa.Table) -> pd.DataFrame:
            c = ray.get(ref)
            mq = _quantize(emb_matrix(t))
            a = _assign(mq, c)
            kk, dim = c.shape
            sums = np.zeros((kk, dim), np.int64)
            np.add.at(sums, a, mq)
            cnt = np.bincount(a, minlength=kk).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pd.DataFrame({
                "cl": np.repeat(nz, dim),
                "dim": np.tile(np.arange(dim, dtype=np.int64), len(nz)),
                "s": sums[nz].reshape(-1),
                "n": np.repeat(cnt[nz], dim)})

        parts = (vectors.map_batches(partial, batch_format="pyarrow")
                 .to_pandas())
        g = (parts.groupby(["cl", "dim"], sort=True)
             .agg(s=("s", "sum"), n=("n", "sum")).reset_index())
        live = np.unique(g["cl"].to_numpy(np.int64))
        dim = int(g["dim"].max()) + 1
        new = np.empty((len(live), dim), np.int64)
        pos = {int(c): i for i, c in enumerate(live)}
        new[[pos[int(c)] for c in g["cl"]], g["dim"].to_numpy(np.int64)] \
            = g["s"].to_numpy(np.int64) // g["n"].to_numpy(np.int64)
        cents = new
        cl_ids = cl_ids[live]

    ref = ray.put((cents, cl_ids))

    def final(t: pa.Table) -> pd.DataFrame:
        c, ids = ray.get(ref)
        mq = _quantize(emb_matrix(t))
        a = _assign(mq, c)
        return pd.DataFrame({
            "vec_id": t[id_col].to_numpy().astype(np.int64),
            "cluster": ids[a]})

    return vectors.map_batches(final, batch_format="pyarrow")


def kmeans_sql(k: int = 8, iters: int = 2,
               table: str = "embeddings") -> str:
    """DuckDB oracle for :func:`kmeans_fp` — the identical integer
    trajectory, one CTE pair (assign, update) per Lloyd round."""
    cells = f"""
cells AS (SELECT vec_id,
                 unnest(range(len(embedding))) AS dim,
                 CASE WHEN isfinite(CAST(unnest(embedding) AS DOUBLE))
                      THEN CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                      * {KM_SCALE}) AS BIGINT)
                      ELSE 0 END + {KM_SHIFT} AS vf
          FROM {table}),
c0 AS (SELECT vec_id AS cl, dim, vf AS cf FROM cells
       WHERE vec_id < {k})"""
    steps = []
    prev = "c0"
    for i in range(1, iters + 1):
        steps.append(f"""
d{i} AS (SELECT cells.vec_id, c.cl,
                sum((cells.vf - c.cf) * (cells.vf - c.cf)) AS dist
         FROM cells JOIN {prev} c USING (dim) GROUP BY 1, 2),
a{i} AS (SELECT vec_id, min(cl) AS cl FROM (
           SELECT vec_id, cl, dist,
                  min(dist) OVER (PARTITION BY vec_id) AS md
           FROM d{i}) WHERE dist = md GROUP BY 1),
c{i} AS (SELECT a.cl, cells.dim,
                CAST(sum(cells.vf) // count(*) AS BIGINT) AS cf
         FROM cells JOIN a{i} a USING (vec_id) GROUP BY 1, 2)""")
        prev = f"c{i}"
    fi = iters + 1
    steps.append(f"""
d{fi} AS (SELECT cells.vec_id, c.cl,
                 sum((cells.vf - c.cf) * (cells.vf - c.cf)) AS dist
          FROM cells JOIN {prev} c USING (dim) GROUP BY 1, 2)""")
    return f"""
WITH {cells},{",".join(steps)}
SELECT vec_id, CAST(min(cl) AS BIGINT) AS cluster FROM (
  SELECT vec_id, cl, dist,
         min(dist) OVER (PARTITION BY vec_id) AS md
  FROM d{fi}) WHERE dist = md GROUP BY 1"""
