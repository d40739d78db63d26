"""Pure-Python, single-threaded oracle for every engine operator.

This is the correctness anchor (SURVEY.md §5): it re-implements the
reference semantics (TopologyProducer.java, decomposed in SURVEY.md §2.3
as V1-V12) row-at-a-time with zero Ray/Arrow machinery, so the distributed
engine can be compared against it exactly. Check order:

1. tidy           — "Adamm"→"Adam" BEFORE everything, applied to every row
   (mapValues precedes validate, java:134-135, 148-151)
2. envelope gate  — tool == ""  → pass-through VALID (≙ non-DATA_MSG
   messages keep valid=true, TopologyProducer.java:169-172)
3. source identity — role "intruder" → source-mismatch (java:190-191)
4. source exists  — SRC_<role> ∉ entities → source-missing (java:194-199)
5. target exists  — conv_id ∉ entities → target-missing (java:201-202)
6. attr exists    — tool ∉ rules → attr-unknown (java:208-209)
7. attr allowed   — role ∉ allowed_roles[tool] → attr-not-allowed (java:204-206)
   (6 and 7 are swapped vs the reference's flow so the two causes stay
   distinguishable; row-level validity is identical either way.)
8. side output    — tool==TOOL_LNK_PERSON and text=="[]" → side=True,
   validity untouched (java:212-227)
9. value check    — kind abn/luhn checksum (java:228-231) else regex OR-any
   anchored full match, first success wins (java:233-251)
10. exception     — any per-row error → invalid "exception" (java:275-277)
11. blacklist kill switch — enable_blacklist=False flips invalid rows back
    to valid (pass-through mode, java:283-287)

Entity checks (4, 5) are skipped when ``entities`` is None (the
events-bridge profile has no entity dictionary).
"""

from __future__ import annotations

from . import rules as R
from .functions.text import tidy_scalar


def validate_row(role: str, text: str, tool: str, conv_id: str,
                 compiled: dict, entity_codes: set[str] | None,
                 enable_blacklist: bool = True) -> tuple[bool, str, bool, str]:
    """→ (valid, reject_reason, side, tidied_text)."""
    try:
        # tidy runs BEFORE the gate — the reference's mapValues applies to every
        # message, gated or not (TopologyProducer.java:134 precedes :135).
        text = tidy_scalar(text) if text is not None else ""
        if tool is None or tool == "":
            return True, "", False, text
        side = False
        valid, reason = True, ""
        if role == "intruder":
            valid, reason = False, R.R_SOURCE_MISMATCH
        elif entity_codes is not None and f"SRC_{role}" not in entity_codes:
            valid, reason = False, R.R_SOURCE_MISSING
        elif entity_codes is not None and conv_id not in entity_codes:
            valid, reason = False, R.R_TARGET_MISSING
        elif tool not in compiled:
            valid, reason = False, R.R_ATTR_UNKNOWN
        elif role not in compiled[tool]["allowed"]:
            valid, reason = False, R.R_ATTR_NOT_ALLOWED
        else:
            # side output fires only after source/target/allowed/attribute
            # checks all pass — it is nested inside them in the reference
            # (TopologyProducer.java:210-227) — and regardless of the value
            # check's outcome, which runs after.
            ent = compiled[tool]
            side = tool == R.SIDE_OUTPUT_TOOL and text == R.SIDE_OUTPUT_VALUE
            R._register_builtin_predicates()
            if ent["kind"] in R.PREDICATE_REGISTRY:
                import numpy as np
                import re as _re
                ok = bool(R.PREDICATE_REGISTRY[ent["kind"]](
                    np.array([text], dtype=object))[0])
                if not ok:
                    # abn/luhn distinguish the reference exception path
                    # (parseInt throw: non-digit input, or empty for ABN)
                    # from a checksum mismatch — see validator.py
                    if (ent["kind"] == "abn" and _re.fullmatch("[0-9]+", text) is None) or \
                       (ent["kind"] == "luhn" and _re.fullmatch("[0-9]*", text) is None):
                        valid, reason = False, R.R_EXCEPTION
                    else:
                        valid, reason = False, R.R_CHECKSUM_FAIL
            else:
                if not any(rx.fullmatch(text) for rx, _ in ent["checks"]):
                    valid, reason = False, R.R_REGEX_FAIL
        if not valid and not enable_blacklist:
            valid = True  # kill switch: pass-through, reason retained for observability
        return valid, reason, side, text
    except Exception:
        return (not enable_blacklist), R.R_EXCEPTION, False, text


def validate_table(rows: list[dict], rules=None, entity_codes: set[str] | None = None,
                   enable_blacklist: bool = True) -> list[dict]:
    """Oracle over a list of row dicts → rows + (valid, reject_reason, side).

    Rows with ``text is None`` are DROPPED, mirroring the engine's null
    filter (≙ TopologyProducer.java:133) — the oracle and the pipelines
    must agree on nullable input, not just on the fixtures."""
    compiled = R.compile_rules(rules)
    out = []
    for row in rows:
        if row.get("text") is None:
            continue
        valid, reason, side, text = validate_row(
            row["role"], row["text"], row["tool"], row["conv_id"],
            compiled, entity_codes, enable_blacklist)
        out.append({**row, "text": text, "valid": valid,
                    "reject_reason": reason, "side": side})
    return out


def dedup_rows(rows: list[dict]) -> list[dict]:
    """Keep the FIRST arrival of each (conv_id, turn_idx) — arrival order =
    input order (the fragment-sorted simulated stream)."""
    seen: set[tuple] = set()
    out = []
    for row in rows:
        key = (row["conv_id"], row["turn_idx"])
        if key not in seen:
            seen.add(key)
            out.append(row)
    return out


def sessionize_rows(rows: list[dict], gap_us: int = 30 * 60 * 1_000_000) -> list[dict]:
    """Session windows per conv_id: sort by (ts, turn_idx), split on ts-gap >
    gap_us → (conv_id, session_id, start_ts, end_ts, n_turns)."""
    by_conv: dict[str, list[dict]] = {}
    for row in rows:
        by_conv.setdefault(row["conv_id"], []).append(row)
    out = []
    for conv in sorted(by_conv):
        turns = sorted(by_conv[conv], key=lambda r: (r["ts"], r["turn_idx"]))
        sid, start, prev, n = 0, turns[0]["ts"], turns[0]["ts"], 0
        for t in turns:
            if t["ts"] - prev > gap_us:
                out.append({"conv_id": conv, "session_id": sid, "start_ts": start,
                            "end_ts": prev, "n_turns": n})
                sid, start, n = sid + 1, t["ts"], 0
            n += 1
            prev = t["ts"]
        out.append({"conv_id": conv, "session_id": sid, "start_ts": start,
                    "end_ts": prev, "n_turns": n})
    return out


def window_counts_rows(rows: list[dict], width_us: int = 3600 * 1_000_000,
                       slide_us: int | None = None) -> list[dict]:
    """Tumbling (or sliding, if slide_us) counts of valid vs rejected per
    (window_id, role, tool). window_id = floor(ts / slide) step index such
    that the row falls in [wid*slide, wid*slide + width)."""
    slide = slide_us or width_us
    n_per = width_us // slide
    acc: dict[tuple, list[int]] = {}
    for row in rows:
        last = row["ts"] // slide
        for wid in range(max(0, last - n_per + 1), last + 1):
            key = (wid, row["role"], row["tool"])
            cell = acc.setdefault(key, [0, 0])
            cell[0 if row["valid"] else 1] += 1
    return [{"window_id": k[0], "role": k[1], "tool": k[2],
             "n_valid": v[0], "n_rejected": v[1]}
            for k, v in sorted(acc.items())]


def shard_of(conv_id: str, n_shards: int) -> int:
    """Deterministic shard id (crc32 — not Python hash(), which is salted)."""
    import zlib
    return zlib.crc32(conv_id.encode()) % n_shards


def streaming_window_counts_rows(rows: list[dict], width_us: int,
                                 lateness_us: int, n_shards: int,
                                 slide_us: int | None = None):
    """Single-threaded mirror of state.streaming: per-shard sequential scan
    in arrival order, watermark wm = max(ts) - lateness, windows emitted
    when wm passes their end, late = arrival after ALL the row's windows
    closed. ``rows`` must already carry ``valid``.
    → (counts dict, late list, wms)."""
    slide_us = slide_us or width_us
    n_per = width_us // slide_us
    wm = [(-(1 << 62))] * n_shards
    open_cells: list[dict] = [dict() for _ in range(n_shards)]
    emitted: dict[tuple, list[int]] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        last = row["ts"] // slide_us
        any_open = False
        for wid in range(max(0, last - n_per + 1), last + 1):
            if wid * slide_us + width_us <= wm[s]:
                continue
            any_open = True
            cell = open_cells[s].setdefault((wid, row["role"], row["tool"]), [0, 0])
            cell[0 if row["valid"] else 1] += 1
        if not any_open:
            late.append({"conv_id": row["conv_id"], "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": last})
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
            closed = [k for k in open_cells[s]
                      if k[0] * slide_us + width_us <= wm[s]]
            for k in closed:
                ec = emitted.setdefault(k, [0, 0])
                cc = open_cells[s].pop(k)
                ec[0] += cc[0]
                ec[1] += cc[1]
    for s in range(n_shards):
        for k, cc in open_cells[s].items():
            ec = emitted.setdefault(k, [0, 0])
            ec[0] += cc[0]
            ec[1] += cc[1]
    counts = [{"window_id": k[0], "role": k[1], "tool": k[2],
               "n_valid": v[0], "n_rejected": v[1]}
              for k, v in sorted(emitted.items())]
    return counts, late, wm


def streaming_sessions_rows(rows: list[dict], gap_us: int, lateness_us: int,
                            n_shards: int):
    """Single-threaded mirror of state.streaming.SessionShardActor: per-
    shard sequential scan in arrival order; a row is LATE when even its
    singleton session would already be closed (ts + gap ≤ shard wm before
    the row); an on-time row merges into every open session within gap
    (bridging transitively); a session emits exactly once when wm passes
    end + gap. → (sessions list, late list, wms)."""
    neg_inf = -(1 << 62)
    wm = [neg_inf] * n_shards
    open_s: list[dict] = [dict() for _ in range(n_shards)]  # conv → [[s,e,n]]
    emitted: list[dict] = []
    late: list[dict] = []

    def close_due(s: int, conv: str, bound: int) -> None:
        lst = open_s[s].get(conv)
        if not lst:
            return
        keep = []
        for seg in lst:
            if seg[1] + gap_us <= bound:
                emitted.append({"conv_id": conv, "start_us": seg[0],
                                "end_us": seg[1], "n_turns": seg[2]})
            else:
                keep.append(seg)
        if keep:
            open_s[s][conv] = keep
        else:
            del open_s[s][conv]

    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        ts = row["ts"]
        if ts + gap_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"], "ts": ts})
        else:
            close_due(s, row["conv_id"], wm[s])
            lst = open_s[s].setdefault(row["conv_id"], [])
            lo, hi, n = ts, ts, 1
            keep = []
            for seg in lst:
                if seg[0] - gap_us <= ts <= seg[1] + gap_us:
                    lo, hi, n = min(lo, seg[0]), max(hi, seg[1]), n + seg[2]
                else:
                    keep.append(seg)
            keep.append([lo, hi, n])
            keep.sort(key=lambda seg: seg[0])
            open_s[s][row["conv_id"]] = keep
        if ts - lateness_us > wm[s]:
            wm[s] = ts - lateness_us
            for conv in list(open_s[s]):
                close_due(s, conv, wm[s])
    for s in range(n_shards):
        for conv in sorted(open_s[s]):
            for seg in open_s[s][conv]:
                emitted.append({"conv_id": conv, "start_us": seg[0],
                                "end_us": seg[1], "n_turns": seg[2]})
    return emitted, late, wm


def late_rows(rows: list[dict], lateness_us: int = 5 * 60 * 1_000_000) -> list[dict]:
    """Watermark late-flagging per conv: a row is late if its ts is older
    than (conv's running max ts at arrival) - lateness. Arrival order =
    input order."""
    max_ts: dict[str, int] = {}
    out = []
    for row in rows:
        wm = max_ts.get(row["conv_id"])
        is_late = wm is not None and row["ts"] < wm - lateness_us
        out.append({**row, "late": is_late})
        if wm is None or row["ts"] > wm:
            max_ts[row["conv_id"]] = row["ts"]
    return out


def streaming_quantiles_rows(rows: list[dict], width_us: int,
                             lateness_us: int, n_shards: int):
    """Single-threaded mirror of state.streaming.QuantileShardCore:
    per-shard sequential scan in arrival order with the window engine's
    late rule (row is late when its window already closed under the
    shard's wm-before-row); on-time rows accumulate len(text) into the
    (window_id, role) histogram plus a valid count. Final quantiles are
    DuckDB's quantile_disc — smallest value with cumulative count ≥
    ceil(q·n), ceil in integer arithmetic. ``rows`` must carry
    ``valid``. → (cells list, late list, wms)."""
    neg_inf = -(1 << 62)
    wm = [neg_inf] * n_shards
    hist: dict[tuple, dict[int, int]] = {}
    n_valid: dict[tuple, int] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        wid = row["ts"] // width_us
        if wid * width_us + width_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": wid})
        else:
            # the engine's _decode fill_nulls role to "" (out-of-contract
            # rows must route deterministically); mirror it here so a
            # null-role fragment row lands in the same (window, role) cell
            key = (wid, row["role"] if row["role"] is not None else "")
            h = hist.setdefault(key, {})
            ln = len(row["text"])
            h[ln] = h.get(ln, 0) + 1
            if row["valid"]:
                n_valid[key] = n_valid.get(key, 0) + 1
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
    cells = []
    for key in sorted(hist):
        h = hist[key]
        n = sum(h.values())
        vals = sorted(h)
        out = {"window_id": key[0], "role": key[1],
               "n_valid": n_valid.get(key, 0),
               "n_rejected": n - n_valid.get(key, 0)}
        for name, num, den in (("p50", 1, 2), ("p90", 9, 10),
                               ("p99", 99, 100)):
            target = (num * n + den - 1) // den
            cum = 0
            for v in vals:
                cum += h[v]
                if cum >= target:
                    out[name] = v
                    break
        cells.append(out)
    return cells, late, wm


def streaming_hll_rows(rows: list[dict], width_us: int, lateness_us: int,
                       n_shards: int):
    """Single-threaded mirror of state.streaming.HllShardCore: the
    per-shard late rule classifies rows; registers are a pure function
    of the on-time row set (max merges are shard-agnostic), estimated
    with the bit-exact sketch (stages/sketches). → (estimates list,
    late list, wms)."""
    import pandas as pd

    from .stages.dedup_near import md5_60
    from .stages.sketches import HLL_REM_BITS, hll_merge_registers, hll_rho
    neg_inf = -(1 << 62)
    wm = [neg_inf] * n_shards
    regs: dict[tuple, int] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        wid = row["ts"] // width_us
        if wid * width_us + width_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": wid})
        else:
            h = md5_60(str(row["conv_id"]))
            key = (wid, h >> HLL_REM_BITS)
            rho = hll_rho(h)
            if regs.get(key, 0) < rho:
                regs[key] = rho
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
    if regs:
        df = pd.DataFrame([(k[0], k[1], v) for k, v in regs.items()],
                          columns=["window_id", "bucket", "rho"])
        est = hll_merge_registers(df, "window_id")
        out = [{"window_id": int(w), "est_users": int(e)}
               for w, e in zip(est["window_id"], est["est_users"])]
    else:
        out = []
    return out, late, wm


def streaming_upsert_rows(rows: list[dict], lateness_us: int,
                          n_shards: int):
    """Single-threaded mirror of state.streaming.UpsertShardCore:
    per-shard arrival scan; a row is late when ts ≤ the shard's
    wm-before-row; otherwise it REPLACES the stored version of its
    (conv_id, turn_idx) key iff its ts ≥ the stored ts (equal ts →
    later arrival wins). → (latest rows, late list, wms)."""
    neg_inf = -(1 << 62)
    wm = [neg_inf] * n_shards
    latest: dict[tuple, tuple] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        if row["ts"] <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"], "ts": row["ts"]})
        else:
            key = (row["conv_id"], row["turn_idx"])
            cur = latest.get(key)
            if cur is None or row["ts"] >= cur[0]:
                latest[key] = (row["ts"], row["valid"])
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
    out = [{"conv_id": k[0], "turn_idx": k[1], "ts": v[0], "valid": v[1]}
           for k, v in sorted(latest.items())]
    return out, late, wm


def streaming_sample_rows(rows: list[dict], width_us: int, k: int,
                          lateness_us: int, n_shards: int):
    """Single-threaded mirror of state.streaming.SampleShardCore: the
    per-shard late rule classifies rows; the sample itself is a pure
    function of the on-time row SET (bottom-k by the total order
    (h, conv_id, turn_idx) per window — mergeable, so per-shard
    truncation cannot change the global answer). h = md5-60(conv) XOR
    ((idx % 65536)·KNUTH) % 2^32. → (sample list, late list, wms)."""
    import hashlib
    neg_inf = -(1 << 62)
    wm = [neg_inf] * n_shards
    ontime: dict[int, set] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        wid = row["ts"] // width_us
        if wid * width_us + width_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": wid})
        else:
            h = (int(hashlib.md5(row["conv_id"].encode())
                     .hexdigest()[:15], 16)
                 ^ (((row["turn_idx"] % 65536) * 2654435761) % 4294967296))
            ontime.setdefault(wid, set()).add(
                (h, row["conv_id"], row["turn_idx"]))
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
    sample = []
    for wid in sorted(ontime):
        for pos, (h, conv, idx) in enumerate(sorted(ontime[wid])[:k], 1):
            sample.append({"window_id": wid, "pos": pos, "conv_id": conv,
                           "turn_idx": idx, "h": h})
    return sample, late, wm


def streaming_distinct_rows(rows: list[dict], width_us: int,
                            lateness_us: int, n_shards: int):
    """Single-threaded mirror of state.streaming.DistinctShardCore:
    per-shard sequential scan in arrival order, per-window conv_id SET,
    emission when wm passes the window end, late = arrival after the
    row's window closed. Shard counts SUM because conv→shard is a
    partition. → (counts list, late list, wms)."""
    wm = [(-(1 << 62))] * n_shards
    open_sets: list[dict] = [dict() for _ in range(n_shards)]
    emitted: dict[int, int] = {}
    late = []
    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        wid = row["ts"] // width_us
        if wid * width_us + width_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": wid})
        else:
            open_sets[s].setdefault(wid, set()).add(row["conv_id"])
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
            closed = [w for w in open_sets[s]
                      if w * width_us + width_us <= wm[s]]
            for w in closed:
                emitted[w] = emitted.get(w, 0) + len(open_sets[s].pop(w))
    for s in range(n_shards):
        for w, cs in open_sets[s].items():
            emitted[w] = emitted.get(w, 0) + len(cs)
    counts = [{"window_id": w, "n_convs": n}
              for w, n in sorted(emitted.items())]
    return counts, late, wm


def streaming_topk_rows(rows: list[dict], width_us: int, k: int,
                        lateness_us: int, n_shards: int):
    """Single-threaded mirror of state.streaming.TopKShardCore +
    merge_topk_partials: per-shard sequential scan in arrival order,
    per-window conv→count dict, shard-local top-k emission at close
    ((n DESC, conv ASC) tiebreak), global merge = sort + head(k) per
    window. → (topk rows, late list, wms)."""
    import heapq

    wm = [(-(1 << 62))] * n_shards
    open_counts: list[dict] = [dict() for _ in range(n_shards)]
    emitted: list[dict] = []
    late = []

    def emit(s: int, w: int) -> None:
        d = open_counts[s].pop(w)
        for c, cnt in heapq.nsmallest(k, d.items(),
                                      key=lambda kv: (-kv[1], kv[0])):
            emitted.append({"window_id": w, "conv_id": c, "n": cnt})

    for row in rows:
        s = shard_of(row["conv_id"], n_shards)
        wid = row["ts"] // width_us
        if wid * width_us + width_us <= wm[s]:
            late.append({"conv_id": row["conv_id"],
                         "turn_idx": row["turn_idx"],
                         "ts": row["ts"], "window_id": wid})
        else:
            d = open_counts[s].setdefault(wid, {})
            d[row["conv_id"]] = d.get(row["conv_id"], 0) + 1
        if row["ts"] - lateness_us > wm[s]:
            wm[s] = row["ts"] - lateness_us
            for w in sorted(w for w in open_counts[s]
                            if w * width_us + width_us <= wm[s]):
                emit(s, w)
    for s in range(n_shards):
        for w in sorted(open_counts[s]):
            emit(s, w)
    merged: dict[int, list] = {}
    for r in emitted:
        merged.setdefault(r["window_id"], []).append(r)
    topk = []
    for w in sorted(merged):
        best = sorted(merged[w], key=lambda r: (-r["n"], r["conv_id"]))[:k]
        for rk, r in enumerate(best, 1):
            topk.append({**r, "rk": rk})
    return topk, late, wm


def streaming_approx_topk_rows(frag_rows: list[list[dict]], width_us: int,
                               k: int, capacity: int, lateness_us: int,
                               n_shards: int):
    """Single-threaded mirror of state.streaming.ApproxTopKShardCore:
    per-shard per-FRAGMENT scan (Misra-Gries results depend on
    micro-batch slicing, so the mirror consumes the same fragment
    boundaries the runner pumps), exact batch counts merged via
    mg_merge, shard-local top-k emission at close, global merge by
    estimate. → (topk rows, late list, wms)."""
    import heapq

    from .state.streaming import mg_merge

    wm = [(-(1 << 62))] * n_shards
    open_st: list[dict] = [dict() for _ in range(n_shards)]  # wid→[cnts,sub]
    emitted: list[dict] = []
    late = []

    def emit(s: int, w: int) -> None:
        counts, sub = open_st[s].pop(w)
        for c, cnt in heapq.nsmallest(k, counts.items(),
                                      key=lambda kv: (-kv[1], kv[0])):
            emitted.append({"window_id": w, "conv_id": c, "n_est": cnt,
                            "err_bound": sub})

    for frag in frag_rows:
        slices: dict[int, list[dict]] = {}
        for row in frag:
            slices.setdefault(shard_of(row["conv_id"], n_shards),
                              []).append(row)
        for s, rows in slices.items():
            batch: dict[int, dict] = {}
            run_wm = wm[s]
            for row in rows:
                wid = row["ts"] // width_us
                if wid * width_us + width_us <= run_wm:
                    late.append({"conv_id": row["conv_id"],
                                 "turn_idx": row["turn_idx"],
                                 "ts": row["ts"], "window_id": wid})
                else:
                    d = batch.setdefault(wid, {})
                    d[row["conv_id"]] = d.get(row["conv_id"], 0) + 1
                run_wm = max(run_wm, row["ts"] - lateness_us)
            for w, add in batch.items():
                counts, sub = open_st[s].setdefault(w, [{}, 0])
                counts, extra = mg_merge(counts, add, capacity)
                open_st[s][w] = [counts, sub + extra]
            wm[s] = run_wm
            for w in sorted(w for w in open_st[s]
                            if w * width_us + width_us <= wm[s]):
                emit(s, w)
    for s in range(n_shards):
        for w in sorted(open_st[s]):
            emit(s, w)
    merged: dict[int, list] = {}
    for r in emitted:
        merged.setdefault(r["window_id"], []).append(r)
    topk = []
    for w in sorted(merged):
        best = sorted(merged[w],
                      key=lambda r: (-r["n_est"], r["conv_id"]))[:k]
        for rk, r in enumerate(best, 1):
            topk.append({**r, "rk": rk})
    return topk, late, wm
