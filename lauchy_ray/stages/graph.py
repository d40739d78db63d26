"""Distributed graph operators: iterative connected components.

Beyond-reference operator family (training-data pipelines run identity
resolution / cross-record linking over general edge graphs — user↔item,
doc↔cluster — not just the near-dup pair relation that
``dedup_near.cluster_assignments`` union-finds driver-side).

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", ACM SoCC'14 — public
paper). Each half-round is ONE per-node co-location over the doubled
edge list (``group_map_by_key``), entirely vectorized inside each
bucket; the edge set converges to a star forest whose centers are the
component minima in O(log² n) rounds on any graph — no O(diameter)
propagation, no driver-side union-find over the full edge list. Per
round the driver holds only two scalars (edge count, star-violation
count); edges live in the object store and are re-shuffled by node
bucket, so the operator scales to edge lists far beyond driver memory.

Semantics (both passes preserve the connectivity relation exactly):
- large-star at node u: link every neighbor v > u to
  m = min(Γ(u) ∪ {u}).
- small-star at node u: over N = {v ∈ Γ(u): v < u} ∪ {u} (nonempty
  smaller-neighborhood only), link every member except the minimum to
  the minimum.

Termination is detected EXACTLY (no hash-of-edge-set heuristics): the
star-forest predicate "every node either has only larger neighbors
(root) or exactly one neighbor, which is smaller (leaf)" is evaluated
per node-segment during the same bucketed pass and summed; the paper
shows star forests are precisely the fixpoints, and at a star forest
labels read directly off the edges (leaf → center, center → itself).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .bucketing import group_map_by_key, safe_size_bytes

# One undirected edge, int64 endpoints. Self-loops are dropped on entry;
# duplicate edges and both-direction duplicates are tolerated anywhere.
_EDGE_COLS = ["u", "v"]


def _doubled(df: pd.DataFrame) -> pd.DataFrame:
    """Both directions of each edge, self-loops dropped."""
    u = df["u"].to_numpy(np.int64, copy=False)
    v = df["v"].to_numpy(np.int64, copy=False)
    keep = u != v
    u, v = u[keep], v[keep]
    return pd.DataFrame({"u": np.concatenate([u, v]),
                         "v": np.concatenate([v, u])})


def _segments(u: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(starts, lengths) of equal-u runs in a sorted key array."""
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    lengths = np.diff(np.r_[starts, len(u)])
    return starts, lengths


def _star_pass(df: pd.DataFrame, large: bool) -> pd.DataFrame:
    """One star half-round over ONE node bucket of the doubled edge list.

    Input rows (u, v) = "v is a neighbor of u"; every copy of a given u
    lands in the same bucket, so per-u neighborhoods are complete here.
    Output: emitted undirected edges (u, v) plus a ``viol`` counter
    column — per-node star-forest violations (0 on every row except one
    synthetic-free carrier: we attach the bucket's violation total to
    the first emitted row; an empty emission with violations emits one
    (min, min) self-loop-free sentinel is NOT needed because a node
    with violations always emits at least one edge in one of the two
    passes — see note below)."""
    u = df["u"].to_numpy(np.int64, copy=False)
    v = df["v"].to_numpy(np.int64, copy=False)
    order = np.lexsort((v, u))
    u, v = u[order], v[order]
    dup = np.zeros(len(u), dtype=bool)
    dup[1:] = (u[1:] == u[:-1]) & (v[1:] == v[:-1])
    u, v = u[~dup], v[~dup]
    if not len(u):
        return pd.DataFrame({"u": np.array([], np.int64),
                             "v": np.array([], np.int64),
                             "viol": np.array([], np.int64)})
    starts, lengths = _segments(u)
    u_seg = u[starts]
    vmin_seg = v[starts]                    # v ascending within segment
    vmax_seg = v[starts + lengths - 1]
    # star-forest predicate per node: root (all neighbors larger) or
    # leaf (exactly one neighbor, smaller).
    ok = (vmin_seg > u_seg) | ((lengths == 1) & (vmax_seg < u_seg))
    viol_total = int((~ok).sum())

    if large:
        # m = min(Γ(u) ∪ {u}); emit (v, m) for strictly larger neighbors
        m_seg = np.minimum(vmin_seg, u_seg)
        m = np.repeat(m_seg, lengths)
        sel = v > u
        out_u, out_v = v[sel], m[sel]
    else:
        # N = smaller neighbors ∪ {u}; m = min(N); emit N \ {m} → m
        has_small = vmin_seg < u_seg
        m_seg = np.where(has_small, vmin_seg, u_seg)
        m = np.repeat(m_seg, lengths)
        sel = (v < u) & (v != m)            # smaller neighbors except m
        out_u, out_v = v[sel], m[sel]
        # the node itself (u != m whenever it has a smaller neighbor)
        self_sel = has_small
        out_u = np.concatenate([out_u, u_seg[self_sel]])
        out_v = np.concatenate([out_v, m_seg[self_sel]])

    viol = np.zeros(len(out_u), dtype=np.int64)
    if len(viol):
        viol[0] = viol_total
    elif viol_total:
        # A bucket can emit nothing yet hold violations only if every
        # node here has exclusively smaller neighbors that all equal m —
        # impossible for viol (leaf predicate covers it) EXCEPT the
        # multi-smaller-neighbor corner; carry it on a (m, m) row that
        # _doubled() will drop as a self-loop next round but the sum
        # still sees this round.
        out_u = np.array([int(u_seg[~ok][0])], np.int64)
        out_v = out_u.copy()
        viol = np.array([viol_total], np.int64)
    return pd.DataFrame({"u": out_u, "v": out_v, "viol": viol})


def _half_round(edges: rd.Dataset, large: bool,
                measure: bool = True) -> tuple[rd.Dataset, int, int]:
    """Run one star half-round; returns (new_edges, n_edges, violations).

    ``edges`` must be materialized (so its size gates the bucket
    shuffle without re-executing lineage); the returned dataset is
    materialized too — each round's edges are read again as the next
    input. ``measure=False`` skips the (n, violations) aggregation pass
    (the convergence test only reads the small half-round's figures).
    The carried ``viol`` column is ignored by every downstream kernel
    (each rebuilds {u, v} from scratch)."""
    size = safe_size_bytes(edges)
    doubled = edges.map_batches(_doubled, batch_format="pandas")
    passed = group_map_by_key(
        doubled, "u", lambda g: _star_pass(g, large),
        size_bytes=(2 * size) if size else None)
    passed = passed.materialize()
    if not measure:
        return passed, 0, 0
    agg = passed.map_batches(
        lambda d: pd.DataFrame({"viol": [int(d["viol"].sum())],
                                "n": [len(d)]}),
        batch_format="pandas").to_pandas()
    viol = int(agg["viol"].sum()) if len(agg) else 0
    n = int(agg["n"].sum()) if len(agg) else 0
    return passed, n, viol


def connected_components(edges: rd.Dataset, max_rounds: int = 64,
                         return_rounds: bool = False):
    """(node_id, rep_id) for every node in ``edges`` — rep_id is the
    smallest node id in the node's connected component.

    ``edges``: Dataset with int64 columns ``u`` and ``v`` (undirected;
    duplicates / reversed duplicates / self-loops tolerated).
    ``max_rounds`` bounds the large+small round count (the algorithm
    needs O(log² n); 64 covers any physically storable graph) — raises
    RuntimeError instead of returning wrong labels if exceeded."""
    cur = edges.select_columns(_EDGE_COLS).materialize()
    rounds = 0
    converged = False
    while rounds < max_rounds:
        cur, _, _ = _half_round(cur, large=True, measure=False)
        cur, n2, v2 = _half_round(cur, large=False)
        rounds += 1
        if n2 == 0 or v2 == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    def labels(df: pd.DataFrame) -> pd.DataFrame:
        # star edges: u = leaf, v = center (small-star emits child→min);
        # centers label themselves.
        child = df["u"].to_numpy(np.int64, copy=False)
        rep = df["v"].to_numpy(np.int64, copy=False)
        lo, hi = np.minimum(child, rep), np.maximum(child, rep)
        return pd.DataFrame({
            "node_id": np.concatenate([hi, lo]),
            "rep_id": np.concatenate([lo, lo])})

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        # all duplicates agree (labels are functions of the component)
        return df.drop_duplicates(subset=["node_id"])

    size = safe_size_bytes(cur)
    lab = cur.map_batches(labels, batch_format="pandas")
    out = group_map_by_key(lab, "node_id", dedupe,
                           size_bytes=(2 * size) if size else None)
    if return_rounds:
        return out, rounds
    return out


# ---------------------------------------------------------------- SQL side

def user_item_edges_sql(mod: int = 101, n_items: int = 4093,
                        item_base: int = 1_000_000,
                        events_rel: str = "events") -> str:
    """Edge CTE body mirrored by :func:`q_user_item_components`'s
    edge derivation: a sparse deterministic user↔item interaction
    graph (every ``mod``-th event links its user to item
    ``event_id % n_items``, offset into a disjoint id space)."""
    return f"""
  SELECT DISTINCT user_id AS u,
         {item_base} + event_id % {n_items} AS v
  FROM {events_rel} WHERE event_id % {mod} = 0"""


def connected_components_sql(edges_body: str) -> str:
    """DuckDB oracle: recursive min-label reachability (transitive
    closure — oracle-scale only) over an edge query with columns
    (u, v); rep_id = least node id reachable. Mirrors the star-forest
    fixpoint of :func:`connected_components` exactly."""
    return f"""
WITH RECURSIVE edges0 AS ({edges_body}),
edges AS (SELECT u, v FROM edges0 WHERE u <> v
          UNION SELECT v, u FROM edges0 WHERE u <> v),
reach(u, v) AS (
  SELECT u, v FROM edges
  UNION
  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u),
comp AS (SELECT u AS node_id, least(u, min(v)) AS rep_id
         FROM reach GROUP BY u)
SELECT node_id, rep_id FROM comp"""


# ------------------------------------------------------ fixed-point PageRank

# Integer fixed point: SCALE = 1.0 of rank mass. All updates are integer
# floor arithmetic (r // deg per edge, (85 * S) // 100 damping), so every
# iteration is EXACTLY reproducible — no float accumulation-order drift —
# and the DuckDB oracle re-derives the identical trajectory. int64 bound:
# total mass never exceeds nodes * PR_SCALE (damping only shrinks sums),
# and the damping fold avoids the 85*S intermediate (split-form identity
# in fold()), so every value stays < 2^63 up to ~9e6 nodes at this SCALE;
# larger graphs lower PR_SCALE (mass / 2^63 of headroom) — documented.
PR_SCALE = 10**12
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact rational
PR_BASE = (PR_DAMP_DEN - PR_DAMP_NUM) * PR_SCALE // PR_DAMP_DEN


def _pr_dedupe_deg(df: pd.DataFrame) -> pd.DataFrame:
    """Per u-bucket: distinct neighbor lists + degree column (the doubled
    edge list co-locates every copy of a u here, so both are exact)."""
    df = df.drop_duplicates(subset=["u", "v"])
    return pd.DataFrame({
        "u": df["u"].to_numpy(np.int64),
        "v": df["v"].to_numpy(np.int64),
        "d": df.groupby("u", sort=False)["v"].transform("size")
               .to_numpy(np.int64),
    })


def pagerank(edges: rd.Dataset, iters: int = 5,
             size_ds: rd.Dataset | None = None) -> rd.Dataset:
    """(node_id, rank_fp) after ``iters`` synchronous PageRank rounds on
    the UNDIRECTED graph of ``edges`` (u, v int64; dups/self-loops
    tolerated), ranks in PR_SCALE fixed point, uniform init = PR_SCALE.

    r'(v) = PR_BASE + (85 · Σ_{u∈Γ(v)} r(u) // deg(u)) // 100

    Pregel-shaped dataflow, one edge-bucket join + one node-bucket sum
    per round (the classic MapReduce PageRank wire cost: edges re-ship
    each round; ranks are O(nodes)). The degree-annotated distinct edge
    list is built ONCE and materialized — iterations reuse it. No
    dangling-node term: an undirected doubled edge list gives every
    node degree ≥ 1. Driver holds no per-node state."""
    from .join import hash_inner_join

    # ``edges`` is usually transformed lineage whose safe_size_bytes is
    # None; without a figure every per-iteration keyed op would take the
    # full sort-shuffle path (~seconds of fixed cost × 2 × iters — the
    # r3 bench caught exactly this at 70s for a 14k-edge graph).
    # ``size_ds`` lets the caller hand in the raw source; after the
    # one-time degree build the MATERIALIZED edge list sizes the rest.
    size = safe_size_bytes(edges)
    if size is None and size_ds is not None:
        size = safe_size_bytes(size_ds)
    esize = (2 * size) if size else None
    doubled = edges.select_columns(_EDGE_COLS).map_batches(
        _doubled, batch_format="pandas")
    ed = group_map_by_key(doubled, "u", _pr_dedupe_deg,
                          size_bytes=esize).materialize()
    msize = safe_size_bytes(ed)
    if msize is not None:
        esize = msize  # exact figure from the materialized edge list

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["u"]].drop_duplicates().rename(columns={"u": "node"})
        out["r"] = np.int64(PR_SCALE)
        return out.astype({"node": "int64", "r": "int64"})

    ranks = group_map_by_key(
        ed.map_batches(lambda df: df[["u"]].drop_duplicates(),
                       batch_format="pandas"),
        "u", uniq, size_bytes=esize).materialize()

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        r = df["r"].to_numpy(np.int64)
        d = df["d"].to_numpy(np.int64)
        return pd.DataFrame({"node": df["v"].to_numpy(np.int64),
                             "c": r // d})

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", sort=False)["c"].sum().reset_index()
        s = g["c"].to_numpy(np.int64)
        # floor(85*S/100) WITHOUT the 85*S intermediate: a hub absorbing
        # most of the graph's mass makes 85*S wrap int64 around ~1e5
        # nodes (numpy wraps silently; DuckDB promotes to HUGEINT, so
        # engine and oracle would diverge). The split form is exact:
        # 85*(S//100) + (85*(S%100))//100, both terms < S < 2^63 for
        # any graph whose total mass fits int64 (~9e6 nodes @ PR_SCALE).
        damped = (PR_DAMP_NUM * (s // PR_DAMP_DEN)
                  + PR_DAMP_NUM * (s % PR_DAMP_DEN) // PR_DAMP_DEN)
        return pd.DataFrame({
            "node": g["node"].to_numpy(np.int64),
            "r": PR_BASE + damped,
        })

    for _ in range(iters):
        msgs = hash_inner_join(
            ed, ranks, "u", {"v": "Int64", "d": "Int64"}, {"r": "Int64"},
            right_key="node", size_bytes=esize)
        ranks = group_map_by_key(
            msgs.map_batches(contrib, batch_format="pandas"),
            "node", fold, size_bytes=esize).materialize()

    return ranks.map_batches(
        lambda df: df.rename(columns={"node": "node_id", "r": "rank_fp"}),
        batch_format="pandas")


def pagerank_sql(edges_body: str, iters: int = 5) -> str:
    """DuckDB oracle for :func:`pagerank` — the identical integer
    fixed-point trajectory, one unrolled CTE per iteration."""
    steps = []
    prev = "r0"
    for i in range(1, iters + 1):
        steps.append(f"""
r{i} AS (
  SELECT ed.v AS node,
         {PR_BASE} + ({PR_DAMP_NUM} * sum(p.r // deg.d)) // {PR_DAMP_DEN}
           AS r
  FROM ed JOIN {prev} p ON ed.u = p.node JOIN deg ON ed.u = deg.u
  GROUP BY ed.v)""")
        prev = f"r{i}"
    return f"""
WITH e0 AS ({edges_body}),
ed AS (SELECT u, v FROM e0 WHERE u <> v
       UNION SELECT v, u FROM e0 WHERE u <> v),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM ed GROUP BY u),
r0 AS (SELECT u AS node, CAST({PR_SCALE} AS BIGINT) AS r FROM deg),
{','.join(steps)}
SELECT node AS node_id, CAST(r AS BIGINT) AS rank_fp FROM {prev}"""


# ------------------------------------------------------- triangle counting

_PACK_SHIFT = 32  # packed (v, w) pair key; vertex ids must fit 31 bits


def _tri_dedupe(df: pd.DataFrame) -> pd.DataFrame:
    return df.drop_duplicates(subset=["u", "v"])


def _seg_pairs(t: np.ndarray, starts: np.ndarray,
               lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment index pairs (i < j) of a segmented sorted
    array, fully vectorized (no per-segment Python loop): element at
    within-segment position p pairs with the p elements before it."""
    n = len(t)
    pos = np.arange(n) - np.repeat(starts, lengths)      # within-seg pos
    total = int(pos.sum())
    if total == 0:
        return np.array([], np.int64), np.array([], np.int64)
    j_idx = np.repeat(np.arange(n), pos)                  # p pairs each
    run_start = np.repeat(np.cumsum(pos) - pos, pos)      # excl prefix
    within = np.arange(total) - run_start
    seg_start = np.repeat(np.repeat(starts, lengths), pos)
    i_idx = within + seg_start
    return i_idx, j_idx


def triangle_counts(edges: rd.Dataset,
                    size_ds: rd.Dataset | None = None) -> rd.Dataset:
    """(vid, n_tri) for every vertex in ≥ 1 triangle of the UNDIRECTED
    simple graph of ``edges`` (u, v int64 < 2^31; dups / reversed dups /
    self-loops tolerated).

    Degree-ordered wedge counting (Schank's *forward* algorithm in its
    MapReduce form, cf. Cohen, "Graph Twiddling in a MapReduce World",
    CiSE 2009 — public): orient each edge from its lower to its higher
    endpoint in the (degree, id) total order, generate wedges only at
    each vertex's OUT-neighborhood (Σ out-deg² = O(m^1.5) on any graph —
    a hub's quadratic blowup is capped by orientation, the 100-TB skew
    guard), then verify closing edges with ONE bucketed hash join on the
    packed pair key. Each triangle is found exactly once, at its
    (degree, id)-minimal corner.

    Stages (all keyed ops share the size-gated bucket machinery):
    edge dedup → degree fold → two degree joins → per-apex vectorized
    pair expansion → membership join → corner-count fold."""
    from .join import hash_inner_join

    size = safe_size_bytes(edges)
    if size is None and size_ds is not None:
        size = safe_size_bytes(size_ds)

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        a = df["u"].to_numpy(np.int64, copy=False)
        b = df["v"].to_numpy(np.int64, copy=False)
        # packed-pair-key precondition, validated (review finding: a
        # 60-bit-hash graph fed here would silently collide pk's and
        # fabricate triangles instead of erroring)
        for arr in (a, b):
            if len(arr) and (int(arr.min()) < 0
                             or int(arr.max()) >= (1 << (_PACK_SHIFT - 1))):
                raise ValueError(
                    "triangle_counts: vertex ids must be in [0, 2^31) "
                    "for the packed pair key — remap ids first")
        keep = a != b
        a, b = a[keep], b[keep]
        return pd.DataFrame({"u": np.minimum(a, b),
                             "v": np.maximum(a, b)}).drop_duplicates()

    e = group_map_by_key(edges.map_batches(norm, batch_format="pandas"),
                         "u", _tri_dedupe, size_bytes=size).materialize()
    # the materialized DISTINCT edge list's exact size is free and never
    # larger than the source estimate — use the tighter figure so a big
    # source with a sparse edge subset keeps the single-task fast path
    msize = safe_size_bytes(e)
    esize = msize if msize is not None else size

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        both = np.concatenate([df["u"].to_numpy(np.int64),
                               df["v"].to_numpy(np.int64)])
        vid, n = np.unique(both, return_counts=True)
        return pd.DataFrame({"vid": vid, "d": n.astype(np.int64)})

    def deg_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("vid", sort=False)["d"].sum().reset_index()
        return g.astype({"vid": "int64", "d": "int64"})

    deg = group_map_by_key(
        e.map_batches(deg_partial, batch_format="pandas"),
        "vid", deg_fold, size_bytes=esize).materialize()

    j1 = hash_inner_join(e, deg.map_batches(
        lambda d: d.rename(columns={"d": "du"}), batch_format="pandas"),
        "u", {"v": "Int64"}, {"du": "Int64"}, right_key="vid",
        size_bytes=esize)
    j2 = hash_inner_join(j1, deg.map_batches(
        lambda d: d.rename(columns={"d": "dv"}), batch_format="pandas"),
        "v", {"u": "Int64", "du": "Int64"}, {"dv": "Int64"},
        right_key="vid", size_bytes=esize)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(np.int64)
        v = df["v"].to_numpy(np.int64)
        du = df["du"].to_numpy(np.int64)
        dv = df["dv"].to_numpy(np.int64)
        fwd = (du < dv) | ((du == dv) & (u < v))
        return pd.DataFrame({"s": np.where(fwd, u, v),
                             "t": np.where(fwd, v, u)})

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["s", "t"], kind="stable")
        s = df["s"].to_numpy(np.int64)
        t = df["t"].to_numpy(np.int64)
        starts, lengths = _segments(s)
        ii, jj = _seg_pairs(t, starts, lengths)
        v = np.minimum(t[ii], t[jj])
        w = np.maximum(t[ii], t[jj])
        return pd.DataFrame({"pk": (v << _PACK_SHIFT) | w,
                             "apex": s[jj], "v": v, "w": w})

    # materialized so the downstream joins are sized by the TRUE wedge
    # volume (O(m^1.5), not derivable from edge bytes without executing;
    # a ×64 guess overshot the single-task gate and bought two needless
    # sort-shuffles at bench scale). The object store spills if a huge
    # graph's wedge list exceeds memory — same contract as every other
    # materialized intermediate here.
    wedge_ds = group_map_by_key(
        j2.map_batches(orient, batch_format="pandas"),
        "s", wedges, size_bytes=esize).materialize()

    packed_e = e.map_batches(
        lambda d: pd.DataFrame({
            "pk": (d["u"].to_numpy(np.int64) << _PACK_SHIFT)
                  | d["v"].to_numpy(np.int64),
            "closed": np.ones(len(d), np.int64)}),
        batch_format="pandas")
    wsize = safe_size_bytes(wedge_ds)
    tri = hash_inner_join(
        wedge_ds, packed_e, "pk",
        {"apex": "Int64", "v": "Int64", "w": "Int64"}, {"closed": "Int64"},
        size_bytes=wsize)

    def corner_partial(df: pd.DataFrame) -> pd.DataFrame:
        vid = np.concatenate([df["apex"].to_numpy(np.int64),
                              df["v"].to_numpy(np.int64),
                              df["w"].to_numpy(np.int64)])
        u, n = np.unique(vid, return_counts=True)
        return pd.DataFrame({"vid": u, "n_tri": n.astype(np.int64)})

    def corner_fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("vid", sort=False)["n_tri"].sum().reset_index()
        return g.astype({"vid": "int64", "n_tri": "int64"})

    return group_map_by_key(
        tri.map_batches(corner_partial, batch_format="pandas"),
        "vid", corner_fold, size_bytes=wsize)


def triangle_sql(edges_body: str) -> str:
    """DuckDB oracle for :func:`triangle_counts`: the same degree-ordered
    orientation ((d, id) row comparison), wedge join, and membership
    check — per-vertex triangle counts over corners."""
    return f"""
WITH raw AS ({edges_body}),
e AS (SELECT DISTINCT least(u, v) AS u, greatest(u, v) AS v
      FROM raw WHERE u <> v),
deg AS (SELECT x AS vid, CAST(count(*) AS BIGINT) AS d
        FROM (SELECT u AS x FROM e UNION ALL SELECT v AS x FROM e)
        GROUP BY 1),
o AS (SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS s,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS t
      FROM e JOIN deg du ON du.vid = e.u JOIN deg dv ON dv.vid = e.v),
w AS (SELECT a.s AS apex, least(a.t, b.t) AS v, greatest(a.t, b.t) AS w
      FROM o a JOIN o b ON a.s = b.s AND a.t < b.t),
tri AS (SELECT w.apex, w.v, w.w FROM w JOIN e ON e.u = w.v AND e.v = w.w)
SELECT vid, count(*) AS n_tri
FROM (SELECT apex AS vid FROM tri
      UNION ALL SELECT v FROM tri
      UNION ALL SELECT w FROM tri) corners
GROUP BY 1"""


# ------------------------------------------------- multi-source BFS levels

def bfs_levels(edges: rd.Dataset, seed_mod: int = 1000,
               max_rounds: int = 16,
               size_ds: rd.Dataset | None = None) -> rd.Dataset:
    """(node_id, level): hop distance to the NEAREST seed node over the
    UNDIRECTED graph of ``edges`` (u, v int64), level-synchronous
    multi-source BFS, capped at ``max_rounds`` (nodes further away are
    omitted — the recursive-CTE oracle carries the identical cap).
    Seeds are ALL nodes whose id is ≡ 0 (mod seed_mod) — including
    item-side ids that happen to divide (the oracle applies the same
    rule, so the two sides agree by construction).

    Pregel-shaped like :func:`pagerank`: the doubled distinct edge list
    is built once and MATERIALIZED; each round is one edge-bucket join
    (frontier → neighbors) and one node-bucket anti-merge (drop already-
    visited), terminating early when the frontier empties — rounds ≤
    graph diameter, wire cost O(edges) per round, the driver holds two
    scalars (round counter, frontier count), never per-node state."""
    from .bucketing import group_map_by_key, safe_size_bytes
    from .join import hash_inner_join

    size = safe_size_bytes(edges)
    if size is None and size_ds is not None:
        size = safe_size_bytes(size_ds)
    esize = (2 * size) if size else None
    doubled = edges.select_columns(_EDGE_COLS).map_batches(
        _doubled, batch_format="pandas")

    def dedupe(df: pd.DataFrame) -> pd.DataFrame:
        return (df.drop_duplicates(subset=["u", "v"])
                .astype({"u": "int64", "v": "int64"}))

    ed = group_map_by_key(doubled, "u", dedupe,
                          size_bytes=esize).materialize()
    msize = safe_size_bytes(ed)
    if msize is not None:
        esize = msize

    def seed_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = df["u"].to_numpy(np.int64)
        s = np.unique(n[(n % seed_mod) == 0])
        return pd.DataFrame({"node": s,
                             "level": np.zeros(len(s), np.int64)})

    # visited (node → level) and the current frontier both start as the
    # seed set; per-bucket dedup makes rows unique
    visited = group_map_by_key(
        ed.map_batches(seed_rows, batch_format="pandas"), "node",
        lambda df: df.drop_duplicates("node"),
        size_bytes=esize).materialize()
    frontier = visited
    n_front = frontier.count()

    for r in range(1, max_rounds + 1):
        if n_front == 0:
            break
        msgs = hash_inner_join(
            ed, frontier.select_columns(["node"]), "u",
            {"v": "Int64"}, {}, right_key="node", size_bytes=esize)
        cand = msgs.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["v"].to_numpy(np.int64)}).drop_duplicates(),
            batch_format="pandas")
        # anti-merge: candidates not yet visited become the next level.
        # Tagged union co-located per node bucket — lvl −1 marks a
        # candidate; a bucket keeps candidates with no visited row.
        tag_v = visited.map_batches(
            lambda df: df[["node", "level"]], batch_format="pandas")
        tag_c = cand.map_batches(
            lambda df: df.assign(level=np.int64(-1)),
            batch_format="pandas")
        lvl = np.int64(r)

        def merge(df: pd.DataFrame, lvl=lvl) -> pd.DataFrame:
            known = df.loc[df["level"] >= 0]
            new = df.loc[df["level"] < 0, ["node"]].drop_duplicates()
            new = new[~new["node"].isin(known["node"])]
            out = pd.concat(
                [known, new.assign(level=lvl)], ignore_index=True)
            return out.astype({"node": "int64", "level": "int64"})

        visited = group_map_by_key(tag_v.union(tag_c), "node", merge,
                                   size_bytes=esize).materialize()
        frontier = visited.filter(
            expr=f"level == {r}").materialize()
        n_front = frontier.count()

    return visited.map_batches(
        lambda df: df.rename(columns={"node": "node_id"}),
        batch_format="pandas")


def bfs_levels_sql(edges_body: str, seed_mod: int = 1000,
                   max_rounds: int = 16) -> str:
    """DuckDB oracle for :func:`bfs_levels` — recursive CTE over the
    same doubled edge list, UNION-dedup on (node, lvl) pairs (bounded
    by nodes × (max_rounds+1); UNION ALL would enumerate paths and
    explode on cyclic graphs), min(lvl) per node, identical cap."""
    return f"""
WITH RECURSIVE edges0 AS ({edges_body}),
edges AS (SELECT u, v FROM edges0 UNION SELECT v, u FROM edges0),
seeds AS (SELECT DISTINCT u AS node FROM edges
          WHERE u % {seed_mod} = 0),
walk(node, lvl) AS (
  SELECT node, 0 FROM seeds
  UNION
  SELECT e.v, w.lvl + 1 FROM walk w JOIN edges e ON e.u = w.node
  WHERE w.lvl < {max_rounds})
SELECT node AS node_id, CAST(min(lvl) AS BIGINT) AS level
FROM walk GROUP BY 1"""
