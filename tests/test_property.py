"""Property-based oracle equivalence (SURVEY.md §5.6): random transcripts →
the distributed engine and the pure-Python oracle must agree exactly."""

import pandas as pd
import numpy as np
import pyarrow as pa
import ray.data as rd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lauchy_ray.oracle import validate_table
from lauchy_ray.pipelines.validate import validated_stream
from lauchy_ray.schema import TURNS_SCHEMA

TOOLS = ["TOOL_TEXT", "TOOL_EMAIL", "TOOL_INT", "TOOL_DATE", "TOOL_MULTI",
         "TOOL_ABN", "TOOL_CC", "TOOL_LNK_PERSON", "TOOL_FORBIDDEN",
         "TOOL_UNKNOWN", ""]
ROLES = ["user", "assistant", "tool", "system", "intruder", "ghost"]

turn_strategy = st.fixed_dictionaries({
    "conv_id": st.sampled_from(["CONV_A", "CONV_B", "CONV_C"]),
    "turn_idx": st.integers(0, 100),
    "role": st.sampled_from(ROLES),
    "text": st.one_of(
        st.text(max_size=40),
        st.sampled_from(["", "[]", "Adamm x", "51824753556", "4539578763621486",
                         "123", "abc", "AB12", "user1@example.com", "2026-01-01",
                         "-42", "12.5", "héllo ©", "line\nbreak", "5182A753556"])),
    "tool": st.sampled_from(TOOLS),
    "ts": st.integers(1_700_000_000_000_000, 1_800_000_000_000_000),
})


@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=st.lists(turn_strategy, min_size=1, max_size=60))
def test_engine_matches_oracle_on_random_transcripts(rows):
    table = pa.table({
        "conv_id": [r["conv_id"] for r in rows],
        "turn_idx": pa.array([r["turn_idx"] for r in rows], pa.int32()),
        "role": [r["role"] for r in rows],
        "text": [r["text"] for r in rows],
        "tool": [r["tool"] for r in rows],
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)
    expected = validate_table([dict(r) for r in rows])
    got = validated_stream(rd.from_arrow(table), use_actors=False).to_pandas()
    key = ["conv_id", "turn_idx", "ts", "text", "role", "tool"]
    got = got.sort_values(key, kind="stable").reset_index(drop=True)
    exp = pd.DataFrame(expected)
    exp["ts"] = pd.to_datetime(exp["ts"], unit="us").astype("datetime64[us]")
    exp = exp.sort_values(key, kind="stable").reset_index(drop=True)
    for col in ["valid", "reject_reason", "side", "text"]:
        assert got[col].tolist() == exp[col].tolist(), f"{col} mismatch"


# ---------------------------------------------------------- streaming cores

# adversarial event-time streams: tight ts range + large lateness/gap
# ratios force late routing, mid-batch closures, session bridging and
# fast/slow-path interleavings the fixtures rarely hit
_stream_row = st.tuples(
    st.sampled_from(["CA", "CB", "CC"]),          # conv
    st.integers(0, 1000),                          # ts (small units)
    st.sampled_from(["user", "tool"]),             # role
)


def _to_table(rows, valid=True):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "tool": pa.array(["TOOL_X"] * len(rows)),
        "valid": pa.array([valid] * len(rows)),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })


@settings(max_examples=60, deadline=None)
@given(rows=st.lists(_stream_row, min_size=1, max_size=80),
       n_batches=st.integers(1, 5),
       gap=st.sampled_from([10, 50, 200]),
       lateness=st.sampled_from([0, 20, 100]))
def test_session_core_matches_oracle_property(rows, n_batches, gap, lateness):
    """SessionShardCore (vectorized fast path + per-row fallback) must
    equal the row-at-a-time oracle for ANY arrival order, batching, gap
    and lateness — single shard, so sharding is out of the picture."""
    from lauchy_ray import oracle as O
    from lauchy_ray.state.streaming import SessionShardCore

    core = SessionShardCore(gap, lateness)
    bounds = [round(i * len(rows) / n_batches) for i in range(n_batches + 1)]
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        if chunk:
            core.ingest(_to_table(chunk))
    got = core.finalize()

    dict_rows = [{"conv_id": r[0], "turn_idx": i, "ts": r[1]}
                 for i, r in enumerate(rows)]
    exp_sess, exp_late, exp_wms = O.streaming_sessions_rows(
        dict_rows, gap, lateness, 1)

    from lauchy_ray.state.streaming import rows_count, rows_list
    got_sess = {(e["conv_id"], e["start_us"], e["end_us"], e["n_turns"])
                for e in rows_list(got["emitted"])}
    exp_set = {(e["conv_id"], e["start_us"], e["end_us"], e["n_turns"])
               for e in exp_sess}
    assert got_sess == exp_set
    assert rows_count(got["late"]) == len(exp_late)
    # conservation: every row in exactly one session or late
    assert (sum(e["n_turns"] for e in rows_list(got["emitted"]))
            + rows_count(got["late"])) == len(rows)


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_stream_row, min_size=1, max_size=80),
       n_batches=st.integers(1, 4),
       width=st.sampled_from([16, 64]),
       lateness=st.sampled_from([0, 32]))
def test_window_core_matches_oracle_property(rows, n_batches, width, lateness):
    """WindowShardCore's vectorized prefix-watermark formulation must
    equal the row-at-a-time oracle for any arrival order and batching."""
    from lauchy_ray import oracle as O
    from lauchy_ray.state.streaming import WindowShardCore

    core = WindowShardCore(width, lateness)
    bounds = [round(i * len(rows) / n_batches) for i in range(n_batches + 1)]
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        if chunk:
            core.ingest(_to_table(chunk))
    got = core.finalize()

    dict_rows = [{"conv_id": r[0], "turn_idx": i, "ts": r[1], "role": r[2],
                  "tool": "TOOL_X", "valid": True}
                 for i, r in enumerate(rows)]
    exp_counts, exp_late, exp_wms = O.streaming_window_counts_rows(
        dict_rows, width, lateness, 1)

    def roll(entries):
        agg = {}
        for e in entries:
            k = (e["window_id"], e["role"], e["tool"])
            v = agg.setdefault(k, [0, 0])
            v[0] += e["n_valid"]
            v[1] += e["n_rejected"]
        return {k: tuple(v) for k, v in agg.items()}

    from lauchy_ray.state.streaming import rows_count
    assert roll(got["emitted"]) == roll(exp_counts)
    assert rows_count(got["late"]) == len(exp_late)


# ---------------------------------------------------- near-dup clusters

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

doc_strategy = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=6, max_size=12).map(" ".join),
    min_size=1, max_size=25)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(base=doc_strategy, dup_idx=st.lists(st.integers(0, 24), max_size=10))
def test_near_dup_clusters_equal_pair_components(base, dup_idx):
    """Property: cluster assignment ≡ connected components of the pair
    output, on random corpora with random duplications (small vocab →
    heavy shingle overlap exercises bands, caps and collapse)."""
    from lauchy_ray.stages import dedup_near

    texts = list(base) + [base[i % len(base)] for i in dup_idx]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df)
    pairs = dedup_near.minhash_lsh_dups(ds, threshold=0.9)
    clusters = dedup_near.near_dup_clusters(
        rd.from_pandas(df), method="minhash", threshold=0.9).to_pandas()
    assert len(clusters) == len(df)

    parent = {int(d): int(d) for d in df["doc_id"]}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["a"], pairs["b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {int(d): find(int(d)) for d in df["doc_id"]}
    got = dict(zip(clusters["doc_id"].astype(int),
                   clusters["rep_id"].astype(int)))
    assert got == exp


# ------------------------------- round-4 engines: quantiles + sample

_qrow = st.tuples(
    st.sampled_from(["CA", "CB", "CC"]),          # conv
    st.integers(0, 1000),                          # ts
    st.sampled_from(["user", "tool"]),             # role
    st.integers(0, 12),                            # text length
)


def _to_qtable(rows, valid_mod=3):
    return pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "turn_idx": pa.array(list(range(len(rows))), pa.int32()),
        "role": pa.array([r[2] for r in rows]),
        "tool": pa.array(["TOOL_X"] * len(rows)),
        "text": pa.array(["x" * r[3] for r in rows]),
        "valid": pa.array([i % valid_mod != 0 for i in range(len(rows))]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_qrow, min_size=1, max_size=80),
       n_batches=st.integers(1, 4),
       width=st.sampled_from([16, 64]),
       lateness=st.sampled_from([0, 32]))
def test_quantile_core_matches_oracle_property(rows, n_batches, width,
                                               lateness):
    """QuantileShardCore's packed-histogram state must equal the
    row-at-a-time oracle for any arrival order, batching, width and
    lateness (single shard)."""
    from lauchy_ray import oracle as O
    from lauchy_ray.state.streaming import QuantileShardCore

    core = QuantileShardCore(width, lateness)
    bounds = [round(i * len(rows) / n_batches) for i in range(n_batches + 1)]
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        if chunk:
            core.ingest(_to_qtable(chunk[:]))
    got = core.finalize()

    # the table builder numbers turn_idx AND the valid flag per BATCH —
    # build the oracle rows with the same per-batch indices
    dict_rows = []
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        for j, r in enumerate(chunk):
            dict_rows.append({"conv_id": r[0], "turn_idx": j, "ts": r[1],
                              "role": r[2], "text": "x" * r[3],
                              "valid": j % 3 != 0})
    exp_cells, exp_late, _ = O.streaming_quantiles_rows(
        dict_rows, width, lateness, 1)

    # engine emits per-shard histograms; roll them into final cells
    from lauchy_ray.stages.windows import quantiles_from_hist
    acc, nval = {}, {}
    for c in got["emitted"]:
        k = (c["window_id"], c["role"])
        h = acc.setdefault(k, {})
        for v, n in zip(np.asarray(c["vals"]).tolist(),
                        np.asarray(c["cnts"]).tolist()):
            h[v] = h.get(v, 0) + n
        nval[k] = nval.get(k, 0) + c["n_valid"]
    got_cells = {}
    for k, h in acc.items():
        vals = np.array(sorted(h))
        cnts = np.array([h[v] for v in vals.tolist()])
        q = quantiles_from_hist(vals, cnts)
        got_cells[k] = (nval[k], int(cnts.sum()) - nval[k],
                        q["p50"], q["p90"], q["p99"])
    exp_map = {(e["window_id"], e["role"]):
               (e["n_valid"], e["n_rejected"], e["p50"], e["p90"], e["p99"])
               for e in exp_cells}
    assert got_cells == exp_map
    from lauchy_ray.state.streaming import rows_count
    assert rows_count(got["late"]) == len(exp_late)


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_qrow, min_size=1, max_size=80),
       n_batches=st.integers(1, 4),
       width=st.sampled_from([16, 64]),
       k=st.sampled_from([1, 3]),
       lateness=st.sampled_from([0, 32]))
def test_sample_core_matches_oracle_property(rows, n_batches, width, k,
                                             lateness):
    """SampleShardCore's mergeable bottom-k must equal the oracle's
    global bottom-k over on-time rows for any batching."""
    from lauchy_ray import oracle as O
    from lauchy_ray.state.streaming import SampleShardCore

    core = SampleShardCore(width, k, lateness)
    bounds = [round(i * len(rows) / n_batches) for i in range(n_batches + 1)]
    pos = 0
    dict_rows = []
    for b in range(n_batches):
        chunk = rows[bounds[b]:bounds[b + 1]]
        if chunk:
            core.ingest(_to_qtable(chunk))
            for j, r in enumerate(chunk):
                dict_rows.append({"conv_id": r[0], "turn_idx": j,
                                  "ts": r[1]})
    got = core.finalize()
    exp_rows, exp_late, _ = O.streaming_sample_rows(
        dict_rows, width, k, lateness, 1)

    got_set = set()
    for b in got["emitted"]:
        for w, c, i, h in zip(np.asarray(b["window_id"]).tolist(),
                              list(b["conv_id"]),
                              np.asarray(b["turn_idx"]).tolist(),
                              np.asarray(b["h"]).tolist()):
            got_set.add((w, c, i, h))
    exp_set = {(e["window_id"], e["conv_id"], e["turn_idx"], e["h"])
               for e in exp_rows}
    assert got_set == exp_set
    from lauchy_ray.state.streaming import rows_count
    assert rows_count(got["late"]) == len(exp_late)
