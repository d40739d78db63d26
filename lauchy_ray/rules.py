"""The validation-rule dictionary (≙ Attribute→DataType→Validation chain,
reference TopologyProducer.java:208-251, and the DEF ``ATT_``-allowance at
TopologyProducer.java:204-206).

The reference fetches this dictionary per record from Infinispan/MySQL
(TopologyProducer.java:196-208); here it is a small, fixed table that is
broadcast into validator-actor state once per actor (``Validator.__init__``)
— removing the reference's per-record network hop.

One module is the single source of truth for BOTH the engine (Python
structures, compiled once per actor) and the DuckDB oracle (a ``VALUES``
CTE emitted by :func:`rules_sql_cte`), so the two can never drift.

Kinds:
- ``regex``  — OR-any over the tool's rules ordered by rule_idx, anchored
  full match, first success wins (TopologyProducer.java:233-251).
- ``abn``    — weighted-digit checksum replaces the regex path
  (TopologyProducer.java:228-229, 304-317).
- ``luhn``   — Luhn mod-10 replaces the regex path
  (TopologyProducer.java:230-231, 325-340).

Regexes deliberately stay inside the RE2 ∩ Python-``re`` common subset
(explicit character classes, no ``\\w``/lookaround/backrefs) so the Arrow
kernel (`pc.match_substring_regex`, RE2), Python ``re.fullmatch`` (oracle)
and DuckDB ``regexp_full_match`` (driver oracle) agree byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

ROLES = ("user", "assistant", "tool", "system")
ALL_ROLES = list(ROLES)

# Reject-reason codes, in check order (see stages/validator.py docstring).
R_SOURCE_MISMATCH = "source-mismatch"   # ≙ V2  TopologyProducer.java:190-191
R_SOURCE_MISSING = "source-missing"     # ≙ V3  TopologyProducer.java:194-199
R_TARGET_MISSING = "target-missing"     # ≙ V4  TopologyProducer.java:201-202
R_ATTR_UNKNOWN = "attr-unknown"         # ≙ V6  TopologyProducer.java:208-209
R_ATTR_NOT_ALLOWED = "attr-not-allowed"  # ≙ V5 TopologyProducer.java:204-206
R_REGEX_FAIL = "regex-fail"             # ≙ V10 TopologyProducer.java:233-251
R_CHECKSUM_FAIL = "checksum-fail"       # ≙ V8/V9 TopologyProducer.java:228-231
R_EXCEPTION = "exception"               # ≙ V11 TopologyProducer.java:275-277


# User-extension surface (≙ SURVEY.md §2.9): new validator KINDS are
# data + a registered vectorized predicate, not engine changes. A predicate
# takes a numpy object array of strings and returns a bool array.
# "abn" and "luhn" are registered here too — the engine has no special
# cases. "regex" is the only built-in handled structurally (OR-any over the
# rule list with early exit).
from .functions.checksums import abn_valid_np, luhn_valid_np  # noqa: E402

PREDICATE_REGISTRY: dict = {"abn": abn_valid_np, "luhn": luhn_valid_np}


def register_predicate(kind: str):
    def deco(fn):
        PREDICATE_REGISTRY[kind] = fn
        return fn
    return deco


def _register_builtin_predicates() -> None:
    """Builtins are registered at module import; kept as a no-op hook so
    callers can force registration idempotently. MUST NOT do lazy relative
    imports: this function runs inside by-value-unpickled worker code,
    where `from .functions...` would need the package on sys.path — the
    exact failure by-value pickling exists to avoid."""


@dataclass(frozen=True)
class Rule:
    tool: str
    rule_idx: int
    regex: str | None
    errormsg: str
    dtt_code: str
    kind: str  # "regex" | "abn" | "luhn"
    allowed_roles: tuple[str, ...] = field(default=ROLES)


# The default dictionary (≙ FIXTURES.md §2 representative rows).
DEFAULT_RULES: list[Rule] = [
    Rule("TOOL_TEXT", 0, r"[A-Za-z0-9_][A-Za-z0-9_ .,!?'-]*", "text-invalid", "DTT_TEXT", "regex"),
    Rule("TOOL_EMAIL", 0, r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
         "email-invalid", "DTT_EMAIL", "regex", ("user", "assistant", "system")),
    Rule("TOOL_INT", 0, r"-?[0-9]+", "int-invalid", "DTT_INT", "regex"),
    Rule("TOOL_DATE", 0, r"[0-9]{4}-[0-9]{2}-[0-9]{2}", "date-invalid", "DTT_DATE", "regex"),
    # OR-any early-exit: only one of the three needs to match (first wins).
    Rule("TOOL_MULTI", 0, r"[0-9]{3}", "multi-num-invalid", "DTT_MULTI", "regex"),
    Rule("TOOL_MULTI", 1, r"[a-z]{3}", "multi-low-invalid", "DTT_MULTI", "regex"),
    Rule("TOOL_MULTI", 2, r"[A-Z]{2}[0-9]{2}", "multi-code-invalid", "DTT_MULTI", "regex"),
    Rule("TOOL_ABN", 0, None, "abn-invalid", "DTT_ABN", "abn", ("user", "assistant")),
    Rule("TOOL_CC", 0, None, "cc-invalid", "DTT_CC", "luhn", ("user", "assistant")),
    # Side-output special case (≙ LNK_PERSON/BKT_APPLICATIONS, TopologyProducer.java:212-227):
    # value "[]" triggers the side channel; validity untouched.
    Rule("TOOL_LNK_PERSON", 0, r"[A-Za-z0-9\[\]_-]*", "lnk-invalid", "DTT_LNK", "regex"),
    # In the dictionary but allowed for no role — ≙ DEF not containing ATT_<code>
    # (TopologyProducer.java:258-262).
    Rule("TOOL_FORBIDDEN", 0, r".*", "forbidden", "DTT_FORBIDDEN", "regex", ()),
]

# ≙ the LNK_PERSON/BKT_APPLICATIONS side-output trigger (TopologyProducer.java:212-214)
SIDE_OUTPUT_TOOL = "TOOL_LNK_PERSON"
SIDE_OUTPUT_VALUE = "[]"

RULES_SCHEMA = pa.schema([
    ("tool", pa.string()),
    ("rule_idx", pa.int32()),
    ("regex", pa.string()),
    ("errormsg", pa.string()),
    ("dtt_code", pa.string()),
    ("kind", pa.string()),
    ("allowed_roles", pa.list_(pa.string())),
])


def rules_table(rules: list[Rule] | None = None) -> pa.Table:
    """The rules dictionary as an Arrow table (broadcastable via ray.put)."""
    rules = DEFAULT_RULES if rules is None else rules
    return pa.table({
        "tool": [r.tool for r in rules],
        "rule_idx": [r.rule_idx for r in rules],
        "regex": [r.regex for r in rules],
        "errormsg": [r.errormsg for r in rules],
        "dtt_code": [r.dtt_code for r in rules],
        "kind": [r.kind for r in rules],
        "allowed_roles": [list(r.allowed_roles) for r in rules],
    }, schema=RULES_SCHEMA)


def compile_rules(rules: list[Rule] | None = None) -> dict[str, dict]:
    """tool → {kind, allowed(set), checks:[(compiled_fullmatch_regex, errormsg)]}.

    Regexes are compiled ONCE here (per actor) — fixing the reference's own
    TODO about per-record Pattern.compile (TopologyProducer.java:237).
    """
    import re

    rules = DEFAULT_RULES if rules is None else rules
    out: dict[str, dict] = {}
    for r in sorted(rules, key=lambda r: (r.tool, r.rule_idx)):
        ent = out.setdefault(r.tool, {"kind": r.kind, "allowed": set(r.allowed_roles), "checks": []})
        if r.kind == "regex" and r.regex is not None:
            ent["checks"].append((re.compile(r.regex), r.errormsg))
    return out


def _sql_quote(s: str | None) -> str:
    if s is None:
        return "NULL"
    return "'" + s.replace("'", "''") + "'"


def rules_sql_cte(rules: list[Rule] | None = None) -> str:
    """The same dictionary as a DuckDB ``VALUES`` CTE body named ``rules``."""
    rules = DEFAULT_RULES if rules is None else rules
    rows = ",\n    ".join(
        "({}, {}, {}, {}, {}, {}, [{}])".format(
            _sql_quote(r.tool), r.rule_idx, _sql_quote(r.regex), _sql_quote(r.errormsg),
            _sql_quote(r.dtt_code), _sql_quote(r.kind),
            ", ".join(_sql_quote(a) for a in r.allowed_roles) or "''",
        )
        for r in rules
    )
    return (
        "rules(tool, rule_idx, regex, errormsg, dtt_code, kind, allowed_roles) AS (\n"
        f"    VALUES {rows}\n)"
    )
