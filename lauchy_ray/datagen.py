"""Deterministic synthetic fixtures (FIXTURES.md §1-§3). Pure function of
(seed, n_turns); no external data. Fully vectorized (numpy) so multi-
million-turn bench tables generate in seconds.

Produces the ``turns`` stream table (schema = BASELINE.json input_hint),
the ``entities`` existence dictionary (≙ BaseEntity lookups,
TopologyProducer.java:194-204), and writes fragment files with
zero-padded sorted names so simulated arrival order — and therefore
watermark evolution — is reproducible (FIXTURES.md determinism contract).

Generation highlights (all seeded, numpy default_rng):
- Conversation sizes: lognormal body plus an explicitly hot head (~0.1%
  of convs at ~20x the mean) — FIXTURES.md skew (a few convs own ~10% of
  turns) without a degenerate Zipf head whose single conv would span
  months of event time and explode window cardinality.
- turn_idx contiguous per conv; ~1% exact-duplicate rows re-arrive later
  (retransmissions → dedup exercise).
- ~2% "intruder" roles (source-identity failure, TopologyProducer.java:190),
  ~1% "ghost" roles (source entity missing), ~2% conversations absent
  from the entities table (target missing).
- per-tool text pools ~70% valid / 30% invalid; pool entries include
  "Adamm" (tidy), "", "[]" (side output), unicode, and 1-8KB payloads.
- ts: per-conv monotone +1-120s, session gaps >30min every ~20 turns.
- ARRIVAL order = jittered wall-clock emission order: convs interleave,
  ~5% late turns carry an old event-ts but arrive "now", duplicates
  re-arrive after their original.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.checksums import abn_valid, luhn_valid
from .schema import ENTITIES_SCHEMA, TURNS_SCHEMA

BASE_TS_US = np.int64(1_767_225_600_000_000)  # 2026-01-01T00:00:00Z in epoch-us
US = 1_000_000

_WORDS = ("the fast key order sort table scan merge part window small hash "
          "join stream filter batch row group query data valid turn reply").split()

TOOLS_MAIN = ["TOOL_TEXT", "TOOL_EMAIL", "TOOL_INT", "TOOL_DATE",
              "TOOL_MULTI", "TOOL_ABN", "TOOL_CC", "TOOL_LNK_PERSON"]


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


def _obj(xs) -> np.ndarray:
    return np.array(list(xs), dtype=object)


def _text_pools(rng: np.random.Generator, pool: int = 512) -> dict[str, tuple]:
    """tool → (valid_pool, invalid_pool) of deterministic payload strings."""
    abns = _gen_valid_abns(rng, 50)
    ccs = _gen_valid_ccs(rng, 50)

    text_valid = []
    for i in range(pool):
        words = " ".join(rng.choice(_WORDS, size=int(rng.integers(2, 9))))
        if i % 50 == 0:
            words = "Adamm " + words                     # tidy exercise
        elif i % 50 == 1:
            words += " " + "x" * int(rng.integers(1000, 8000))  # long payload
        text_valid.append(words)
    pools = {
        "TOOL_TEXT": (_obj(text_valid),
                      _obj(["", "héllo ©", "{bad json}", "tab\tchar", "line\nbreak"])),
        "TOOL_EMAIL": (_obj([f"user{int(rng.integers(0, 10_000))}@example.com"
                             for _ in range(pool)]),
                       _obj(["not-an-email", "a@b", "@example.com", "user@@x.com"])),
        "TOOL_INT": (_obj([str(int(v)) for v in rng.integers(-10_000, 10_000, pool)]),
                     _obj(["12.5", "abc", "", "1 2"])),
        "TOOL_DATE": (_obj([f"2026-{int(m):02d}-{int(d):02d}"
                            for m, d in zip(rng.integers(1, 13, pool),
                                            rng.integers(1, 29, pool))]),
                      _obj(["Jan 1 2026", "2026/01/01", "26-01-01"])),
        "TOOL_MULTI": (_obj(["123", "abc", "AB12", "999", "zzz"]),
                       _obj(["xyz!", "AB1", "12", "ABCD"])),
        "TOOL_ABN": (_obj(abns),
                     _obj([a[:-1] + str((int(a[-1]) + 1) % 10) for a in abns[:10]]
                          + [a[:10] for a in abns[10:20]]
                          + [a[:5] + "X" + a[6:] for a in abns[20:30]]
                          + [""])),
        "TOOL_CC": (_obj(ccs),
                    _obj([c[:-1] + str((int(c[-1]) + 1) % 10) for c in ccs[:10]]
                         + [c[:8] + "x" + c[9:] for c in ccs[10:20]])),
        "TOOL_LNK_PERSON": (_obj(["[]", "[]", "person_link-1", "[PER_A]"]),
                            _obj(["bad value!", "p l"])),
        # validity decided upstream of text for these
        "TOOL_FORBIDDEN": (_obj([f"whatever {i}" for i in range(64)]),) * 2,
        "TOOL_UNKNOWN": (_obj([f"whatever {i}" for i in range(64)]),) * 2,
        "": (_obj([f"payload {i}" for i in range(64)]),) * 2,
    }
    return pools


def generate_turns(n_turns: int = 500, n_convs: int = 24, seed: int = 42,
                   p_dup: float = 0.01) -> pa.Table:
    """Deterministic turns table in ARRIVAL order (wall-clock interleaved)."""
    rng = np.random.default_rng(seed)
    pools = _text_pools(rng)

    n_hot = max(1, n_convs // 1000)
    weights = rng.lognormal(mean=0.0, sigma=0.8, size=n_convs)
    weights[:n_hot] *= 20.0
    weights /= weights.sum()
    sizes = rng.multinomial(n_turns, weights)
    n = int(sizes.sum())

    conv_idx = np.repeat(np.arange(n_convs), sizes)
    offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    ti = np.arange(n) - np.repeat(offsets, sizes)  # turn_idx, contiguous per conv

    # event time: +1-120s per turn, session gaps >30min every ~20 turns
    deltas = rng.integers(1, 120, size=n).astype(np.int64) * US
    gap_mask = (ti % 20 == 0) & (ti > 0)
    deltas[gap_mask] = rng.integers(31 * 60, 120 * 60, size=int(gap_mask.sum())) * US
    cs = np.cumsum(deltas)
    seg_base = cs - deltas  # cumsum exclusive
    ts = (BASE_TS_US
          + np.repeat(rng.integers(0, 3600, size=n_convs).astype(np.int64) * US, sizes)
          + cs - np.repeat(seg_base[offsets], sizes))

    # arrival wall-clock: jittered event time; late turns (5%, ti>2) arrive at
    # their wall slot but carry an event-ts 1-30min older.
    wall = ts + rng.integers(0, 30, size=n).astype(np.int64) * US
    late_mask = (ti > 2) & (rng.random(n) < 0.05)
    emit_ts = ts.copy()
    emit_ts[late_mask] -= rng.integers(60, 30 * 60, size=int(late_mask.sum())) * US

    role = _obj(["user", "assistant", "tool", "system"])[rng.integers(0, 4, size=n)]
    r = rng.random(n)
    role[r < 0.02] = "intruder"               # V2 source-identity failure
    role[(r >= 0.02) & (r < 0.03)] = "ghost"  # V3 source entity missing

    tool = _obj(TOOLS_MAIN)[rng.integers(0, len(TOOLS_MAIN), size=n)]
    r = rng.random(n)
    tool[r < 0.01] = "TOOL_UNKNOWN"           # V6 attr-unknown
    tool[(r >= 0.01) & (r < 0.02)] = "TOOL_FORBIDDEN"  # V5 attr-not-allowed
    tool[(r >= 0.02) & (r < 0.04)] = ""       # envelope-gate pass-through (M7)

    want_valid = rng.random(n) < 0.7
    pick = rng.integers(0, 1 << 30, size=n)
    text = np.empty(n, dtype=object)
    for t, (vp, ip) in pools.items():
        m = tool == t
        if not m.any():
            continue
        mv = m & want_valid
        mi = m & ~want_valid
        text[mv] = vp[pick[mv] % len(vp)]
        text[mi] = ip[pick[mi] % len(ip)]

    # ~1% exact duplicates (retransmissions re-arrive 1-300s later)
    dup_idx = rng.choice(n, size=max(1, int(n * p_dup)), replace=False)
    dup_walls = wall[dup_idx] + rng.integers(1, 300, size=len(dup_idx)).astype(np.int64) * US
    all_walls = np.concatenate([wall, dup_walls])
    order = np.concatenate([np.arange(n), dup_idx])[np.argsort(all_walls, kind="stable")]

    conv_names = _obj([f"CONV_{i:06d}" for i in range(n_convs)])
    return pa.table({
        "conv_id": pa.array(conv_names[conv_idx][order], type=pa.string()),
        "turn_idx": pa.array(ti[order], type=pa.int32()),
        "role": pa.array(role[order], type=pa.string()),
        "text": pa.array(text[order], type=pa.string()),
        "tool": pa.array(tool[order], type=pa.string()),
        "ts": pa.array(emit_ts[order], type=pa.timestamp("us")),
    }, schema=TURNS_SCHEMA)


def generate_entities(turns: pa.Table, seed: int = 42,
                      p_missing_conv: float = 0.02) -> pa.Table:
    """Existence dictionary: SRC_<role> rows for the four real roles plus
    ~98% of conversations (missing ones ⇒ target-missing)."""
    rng = np.random.default_rng(seed + 1)
    convs = sorted(set(turns["conv_id"].to_pylist()))
    keep_mask = rng.random(len(convs)) >= p_missing_conv
    keep = [c for c, k in zip(convs, keep_mask) if k]
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
