"""Deterministic synthetic fixtures (FIXTURES.md §1-§3). Pure function of
(seed, n_turns); no external data.

Produces the ``turns`` stream table (schema = BASELINE.json input_hint),
the ``entities`` existence dictionary (≙ BaseEntity lookups,
TopologyProducer.java:194-204), and writes fragment files with
zero-padded sorted names so simulated arrival order — and therefore
watermark evolution — is reproducible (FIXTURES.md determinism contract).

Generation highlights (all seeded, numpy default_rng):
- Zipf-ish hot-key skew: a few conversations own ~10% of turns.
- turn_idx contiguous per conv, then ~1% exact-duplicate rows (dedup
  exercise) and a global arrival shuffle (arrival order ≠ turn order).
- ~2% "intruder" roles (source-identity failure, TopologyProducer.java:190),
  ~1% "ghost" roles (source entity missing), ~2% conversations absent
  from the entities table (target missing).
- per-tool text mix ~70% valid / 30% invalid; ~1% contains "Adamm"
  (tidy exercise); includes "", "[]", unicode, and 1-10KB long strings.
- ts: per-conv monotone-ish +1-120s, session gaps >30min every ~20 turns,
  ~5% late turns (1-30 min behind the conv's running max).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.checksums import abn_valid, luhn_valid
from .schema import ENTITIES_SCHEMA, TURNS_SCHEMA

BASE_TS_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00Z in epoch-us

_WORDS = ("the fast key order sort table scan merge part window small hash "
          "join stream filter batch row group query data valid turn reply").split()


def _gen_valid_abns(rng: np.random.Generator, n: int) -> list[str]:
    out: list[str] = []
    while len(out) < n:
        cand = "".join(str(d) for d in rng.integers(0, 10, size=11))
        if cand[0] != "0" and abn_valid(cand):
            out.append(cand)
    return out


def _gen_valid_ccs(rng: np.random.Generator, n: int) -> list[str]:
    out: list[str] = []
    while len(out) < n:
        body = "".join(str(d) for d in rng.integers(0, 10, size=15))
        for check in "0123456789":
            if luhn_valid(body + check):
                out.append(body + check)
                break
    return out


def _text_for(tool: str, valid: bool, rng: np.random.Generator,
              abns: list[str], ccs: list[str]) -> str:
    r = rng.random()
    if tool == "TOOL_TEXT":
        if valid:
            words = " ".join(rng.choice(_WORDS, size=int(rng.integers(2, 9))))
            if r < 0.02:
                words = "Adamm " + words          # tidy fixes this to "Adam ..."
            elif r < 0.04:
                words = words + " " + "x" * int(rng.integers(1000, 10000))  # long payload
            return words
        return rng.choice(["", "héllo ©", "{bad json}", "tab\tchar", "line\nbreak"])
    if tool == "TOOL_EMAIL":
        if valid:
            return f"user{int(rng.integers(0, 10_000))}@example.com"
        return rng.choice(["not-an-email", "a@b", "@example.com", "user@@x.com"])
    if tool == "TOOL_INT":
        if valid:
            return str(int(rng.integers(-10_000, 10_000)))
        return rng.choice(["12.5", "abc", "", "1 2"])
    if tool == "TOOL_DATE":
        if valid:
            return f"2026-{int(rng.integers(1, 13)):02d}-{int(rng.integers(1, 29)):02d}"
        return rng.choice(["Jan 1 2026", "2026/01/01", "26-01-01"])
    if tool == "TOOL_MULTI":
        if valid:  # exercises OR-any early-exit: each alternative matches one rule
            return rng.choice(["123", "abc", "AB12", "999", "zzz"])
        return rng.choice(["xyz!", "AB1", "12", "ABCD"])
    if tool == "TOOL_ABN":
        if valid:
            return abns[int(rng.integers(0, len(abns)))]
        a = abns[int(rng.integers(0, len(abns)))]
        return rng.choice([a[:-1] + str((int(a[-1]) + 1) % 10),  # checksum off by one
                           a[:10],                                # wrong length
                           a[:5] + "X" + a[6:],                   # non-numeric → exception path
                           ""])
    if tool == "TOOL_CC":
        if valid:
            return ccs[int(rng.integers(0, len(ccs)))]
        c = ccs[int(rng.integers(0, len(ccs)))]
        return rng.choice([c[:-1] + str((int(c[-1]) + 1) % 10),
                           c[:8] + "x" + c[9:]])
    if tool == "TOOL_LNK_PERSON":
        if valid:
            return rng.choice(["[]", "[]", "person_link-1", "[PER_A]"])  # "[]" → side output
        return rng.choice(["bad value!", "p l"])
    # TOOL_FORBIDDEN / TOOL_UNKNOWN / "" — validity decided upstream of text
    return "whatever " + str(int(rng.integers(0, 100)))


def generate_turns(n_turns: int = 500, n_convs: int = 24, seed: int = 42,
                   p_dup: float = 0.01) -> pa.Table:
    """Deterministic turns table in ARRIVAL order (shuffled; ≠ turn order)."""
    rng = np.random.default_rng(seed)
    abns = _gen_valid_abns(rng, 50)
    ccs = _gen_valid_ccs(rng, 50)

    # Zipf-ish conv sizes: weight ∝ 1/rank^1.3, hot head keys
    ranks = np.arange(1, n_convs + 1, dtype=np.float64)
    weights = 1.0 / ranks ** 1.3
    weights /= weights.sum()
    sizes = rng.multinomial(n_turns, weights)

    tools_main = ["TOOL_TEXT", "TOOL_EMAIL", "TOOL_INT", "TOOL_DATE",
                  "TOOL_MULTI", "TOOL_ABN", "TOOL_CC", "TOOL_LNK_PERSON"]

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []
    walls: list[int] = []  # emission wall-clock — defines ARRIVAL order

    for ci, size in enumerate(sizes):
        conv = f"CONV_{ci:06d}"
        ts = BASE_TS_US + np.int64(rng.integers(0, 3600)) * 1_000_000
        max_ts = ts
        for ti in range(int(size)):
            r = rng.random()
            if r < 0.02:
                role = "intruder"          # V2 source-identity failure
            elif r < 0.03:
                role = "ghost"             # V3 source entity missing
            else:
                role = ("user", "assistant", "tool", "system")[int(rng.integers(0, 4))]
            r = rng.random()
            if r < 0.01:
                tool = "TOOL_UNKNOWN"      # V6 attr-unknown
            elif r < 0.02:
                tool = "TOOL_FORBIDDEN"    # V5 attr-not-allowed
            elif r < 0.04:
                tool = ""                  # envelope-gate pass-through (M7)
            else:
                tool = tools_main[int(rng.integers(0, len(tools_main)))]
            text = _text_for(tool, rng.random() < 0.7, rng, abns, ccs)

            # event time: gaps >30min every ~20 turns split sessions; 5% late
            if ti > 0 and ti % 20 == 0:
                ts = max_ts + np.int64(rng.integers(31 * 60, 120 * 60)) * 1_000_000
            else:
                ts = max_ts + np.int64(rng.integers(1, 120)) * 1_000_000
            max_ts = max(max_ts, ts)
            emit_ts = ts
            if ti > 2 and rng.random() < 0.05:
                emit_ts = max_ts - np.int64(rng.integers(60, 30 * 60)) * 1_000_000

            conv_ids.append(conv)
            turn_idxs.append(ti)
            roles.append(role)
            texts.append(str(text))
            tools.append(str(tool))
            tss.append(int(emit_ts))
            # arrival ≈ emission wall clock (the conv's running max, jittered a
            # little so convs interleave and arrival order ≠ turn order locally);
            # a LATE turn arrives "now" but carries its old event ts.
            walls.append(int(max_ts) + int(rng.integers(0, 30)) * 1_000_000)

    n = len(conv_ids)
    # ~1% exact duplicates (retransmissions: same row re-arrives a bit later)
    dup_idx = rng.choice(n, size=max(1, int(n * p_dup)), replace=False)
    dup_walls = [walls[i] + int(rng.integers(1, 300)) * 1_000_000 for i in dup_idx]
    all_walls = np.array(walls + dup_walls, dtype=np.int64)
    idx = np.concatenate([np.arange(n), dup_idx])[np.argsort(all_walls, kind="stable")]

    take = lambda xs: [xs[i] for i in idx]  # noqa: E731
    return pa.table({
        "conv_id": take(conv_ids),
        "turn_idx": pa.array(take(turn_idxs), type=pa.int32()),
        "role": take(roles),
        "text": take(texts),
        "tool": take(tools),
        "ts": pa.array(take(tss), type=pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)


def generate_entities(turns: pa.Table, seed: int = 42,
                      p_missing_conv: float = 0.02) -> pa.Table:
    """Existence dictionary: SRC_<role> rows for the four real roles plus
    ~98% of conversations (missing ones ⇒ target-missing)."""
    rng = np.random.default_rng(seed + 1)
    convs = sorted(set(turns["conv_id"].to_pylist()))
    keep = [c for c in convs if rng.random() >= p_missing_conv]
    codes = [f"SRC_{r}" for r in ("user", "assistant", "tool", "system")] + keep
    return pa.table({
        "code": codes,
        "name": [f"Entity {c}" for c in codes],
        "def_code": ["DEF_ROLE" if c.startswith("SRC_") else "DEF_CONV" for c in codes],
    }, schema=ENTITIES_SCHEMA)


def write_fixture(out_dir: str, n_turns: int = 500, n_convs: int = 24,
                  seed: int = 42, n_fragments: int = 4) -> dict[str, str]:
    """Write turns (as sorted fragment files = arrival order) + entities."""
    os.makedirs(os.path.join(out_dir, "turns"), exist_ok=True)
    turns = generate_turns(n_turns, n_convs, seed)
    ents = generate_entities(turns, seed)
    n = turns.num_rows
    bounds = np.linspace(0, n, n_fragments + 1).astype(int)
    for f in range(n_fragments):
        frag = turns.slice(bounds[f], bounds[f + 1] - bounds[f])
        pq.write_table(frag, os.path.join(out_dir, "turns", f"part-{f:05d}.parquet"))
    pq.write_table(ents, os.path.join(out_dir, "entities.parquet"))
    return {"turns": os.path.join(out_dir, "turns"),
            "entities": os.path.join(out_dir, "entities.parquet")}
