"""The validation stage — a stateful actor-pool `map_batches` callable.

≙ the reference's `validate` predicate (TopologyProducer.java:135,
159-294) plus its external dictionary lookups (java:196-208), rebuilt
Ray-Data-first:

- The rule dictionary and entity set are loaded ONCE per actor in
  ``__init__`` (broadcast via ``ray.put`` object refs), replacing the
  reference's per-record Infinispan/MySQL RPCs (its acknowledged
  bottleneck) and its per-record ``Pattern.compile`` (TODO at java:237).
- ``__call__`` is fully vectorized over zero-copy Arrow batches:
  `pc.is_in` hash-set membership for the entity / tool / role checks,
  `pc.match_substring_regex` (RE2, anchored) for the regex OR-any path
  with first-match early exit, numpy digit-matrix kernels for the
  ABN/Luhn checksums. No Python-per-row loop.
- Rather than filtering (the reference returns a Boolean from the
  predicate), the stage APPENDS ``valid`` / ``reject_reason`` / ``side``
  columns; the caller splits valid / rejected / side streams with cheap
  vectorized filters. This keeps the stage single-pass and lets the
  rejected branch carry its reason (≙ blacklist routing V12 + the
  webdata side output V7) without re-computing anything.

First-failure-wins reason cascade, in oracle.py's documented check order.
Usage::

    ds.map_batches(Validator, fn_constructor_kwargs=dict(rules_ref=...),
                   batch_format="pyarrow", concurrency=(2, 8), num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import rules as R
from ..functions.text import TIDY_FROM, TIDY_TO


class Validator:
    def __init__(self, rules_ref=None, entities_ref=None, enable_blacklist: bool = True,
                 rules: list | None = None, entity_codes: list[str] | None = None,
                 apply_tidy: bool = True, predicates: dict | None = None):
        """State setup, once per actor.

        rules_ref / entities_ref: ``ray.put`` object refs (preferred — one
        object-store copy per node); rules / entity_codes: direct values
        (tests, driver-side use).
        """
        import ray

        if rules_ref is not None:
            rules = ray.get(rules_ref)
        if entities_ref is not None:
            entity_codes = ray.get(entities_ref)
        self.compiled = R.compile_rules(rules)
        self.enable_blacklist = enable_blacklist
        self.apply_tidy = apply_tidy
        self.known_tools = pa.array(sorted(self.compiled), type=pa.string())
        # tool → pa.array of allowed roles (for pc.is_in per tool-group)
        self.allowed = {t: pa.array(sorted(e["allowed"]), type=pa.string())
                        for t, e in self.compiled.items()}
        # anchored RE2 patterns, compiled metadata once per actor (java:237 TODO fixed)
        self.regexes = {t: [("^(?:" + rx.pattern + ")$", msg) for rx, msg in e["checks"]]
                        for t, e in self.compiled.items()}
        self.entity_set = (pa.array(sorted(set(entity_codes)), type=pa.string())
                          if entity_codes is not None else None)
        self.entity_pyset = frozenset(entity_codes) if entity_codes is not None else None
        # registry snapshot: caller (driver) passes its registry so custom
        # kinds registered in the driver process reach the workers; fall back
        # to this process's registry for direct construction
        R._register_builtin_predicates()
        self.predicates = dict(R.PREDICATE_REGISTRY) if predicates is None else predicates
        unknown = {e["kind"] for e in self.compiled.values()
                   if e["kind"] != "regex" and e["kind"] not in self.predicates}
        if unknown:
            raise ValueError(
                f"rule kinds {sorted(unknown)} have no registered predicate — "
                "register them with lauchy_ray.rules.register_predicate() in "
                "the driver before building the pipeline")
        self.rows_seen = 0  # ≙ the reference's peek counters (java:132,136)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        self.rows_seen += n
        if n == 0:
            return _append(batch, np.zeros(0, bool), np.array([], object), np.zeros(0, bool))

        text = batch["text"].combine_chunks() if isinstance(batch["text"], pa.ChunkedArray) else batch["text"]
        if self.apply_tidy:
            text = pc.replace_substring(text, TIDY_FROM, TIDY_TO)
            if isinstance(text, pa.ChunkedArray):
                text = text.combine_chunks()
        tool = batch["tool"]
        role = batch["role"]

        ok = np.ones(n, dtype=bool)            # still-valid mask
        reason = np.full(n, "", dtype=object)  # first failure wins
        gate = _np(pc.or_kleene(pc.equal(tool, ""), pc.is_null(tool)))  # pass-through

        def fail(mask: np.ndarray, code: str) -> None:
            new = mask & ok & ~gate
            reason[new] = code
            ok[new] = False

        fail(_np(pc.equal(role, "intruder")), R.R_SOURCE_MISMATCH)
        if self.entity_set is not None:
            # source check: roles have tiny cardinality — test the DISTINCT
            # roles against the entity set instead of an is_in over the big
            # set per row (the per-batch hash build there is the cost)
            bad_roles = [r.as_py() for r in pc.unique(role)
                         if r.as_py() is not None
                         and f"SRC_{r.as_py()}" not in self.entity_pyset]
            if bad_roles:
                fail(_np(pc.is_in(role, value_set=pa.array(bad_roles))),
                     R.R_SOURCE_MISSING)
            # a NULL role has no SRC_ entity either (oracle: "SRC_None")
            fail(_np(pc.is_null(role)), R.R_SOURCE_MISSING)
            fail(~_np(pc.is_in(batch["conv_id"], value_set=self.entity_set)),
                 R.R_TARGET_MISSING)
        fail(~_np(pc.is_in(tool, value_set=self.known_tools)), R.R_ATTR_UNKNOWN)

        # per-tool checks: role allowance, then checksum/regex value check.
        # Loop is over DISTINCT tools in the batch (a handful), not rows; the
        # per-tool row selection stays in Arrow (no Python object arrays).
        side = np.zeros(n, dtype=bool)
        live = ok & ~gate
        for t_scalar in pc.unique(tool):
            t = t_scalar.as_py()
            ent = self.compiled.get(t) if t is not None else None
            if ent is None:
                continue
            sel = _np(pc.equal(tool, t)) & live
            idx = np.flatnonzero(sel)
            sub_role = role.take(pa.array(idx))
            bad_role = ~_np(pc.is_in(sub_role, value_set=self.allowed[t]))
            reason[idx[bad_role]] = R.R_ATTR_NOT_ALLOWED
            ok[idx[bad_role]] = False
            idx = idx[~bad_role]
            if len(idx) == 0:
                continue
            sub_text = text.take(pa.array(idx))
            if t == R.SIDE_OUTPUT_TOOL:
                side[idx] = _np(pc.equal(sub_text, R.SIDE_OUTPUT_VALUE))
            if ent["kind"] in self.predicates:
                # registry kinds (abn/luhn built-in; users add their own via
                # rules.register_predicate — SURVEY.md §2.9 extension surface)
                fn = self.predicates[ent["kind"]]
                bad = ~np.asarray(fn(sub_text.to_numpy(zero_copy_only=False)),
                                  dtype=bool)
                code = R.R_CHECKSUM_FAIL
                if ent["kind"] in ("abn", "luhn") and bad.any():
                    # distinguish the reference's EXCEPTION path (parseInt
                    # throw on non-digit / empty-ABN input, java:275-277,311)
                    # from an honest checksum mismatch — message-level
                    # last-writer-wins semantics depend on it (V-note).
                    exc_pat = "^[0-9]+$" if ent["kind"] == "abn" else "^[0-9]*$"
                    is_exc = ~_np(pc.match_substring_regex(sub_text, exc_pat))
                    exc_rows = idx[bad & is_exc]
                    reason[exc_rows] = R.R_EXCEPTION
                    ok[exc_rows] = False
                    bad = bad & ~is_exc
            else:
                # OR-any with first-match early exit (java:233-251): evaluate
                # rule k only on rows not yet matched by rules < k.
                matched = np.zeros(len(idx), dtype=bool)
                for pattern, _msg in self.regexes[t]:
                    rem = np.flatnonzero(~matched)
                    if len(rem) == 0:
                        break
                    hits = _np(pc.match_substring_regex(
                        sub_text.take(pa.array(rem)), pattern))
                    matched[rem[hits]] = True
                bad = ~matched
                code = R.R_REGEX_FAIL
            reason[idx[bad]] = code
            ok[idx[bad]] = False

        if not self.enable_blacklist:
            ok[:] = True  # kill switch: pass-through (java:283-287); reasons retained

        out = batch.set_column(batch.schema.get_field_index("text"), "text", text)
        return _append(out, ok, reason, side)


def _np(arr) -> np.ndarray:
    """Arrow boolean array/chunked → numpy bool (nulls → False)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return np.asarray(pc.fill_null(arr, False).to_numpy(zero_copy_only=False), dtype=bool)


def _append(batch: pa.Table, ok, reason, side) -> pa.Table:
    return (batch
            .append_column("valid", pa.array(ok, type=pa.bool_()))
            .append_column("reject_reason", pa.array(reason, type=pa.string()))
            .append_column("side", pa.array(side, type=pa.bool_())))


class SideRecordSynthesizer:
    """Side-output record synthesis (≙ TopologyProducer.java:215-221): the
    reference does not forward the raw answer to webdata — it wraps the
    TARGET entity in a QDataBaseEntityMessage with the attribute value set
    to "[]", total=1, returnCount=1 and the user token. This stage
    projects each ``side`` row into that record shape; the entity-name
    dictionary is actor state loaded once per actor from a broadcast ref
    (like the Validator's rule dictionary).

    Output columns: code (the target entity ≙ conv_id), name (dictionary
    lookup), attribute_code, value, total, return_count, token.
    """

    def __init__(self, names_ref=None, entity_names: dict | None = None,
                 token: str = ""):
        import ray

        if names_ref is not None:
            entity_names = ray.get(names_ref)
        self.names = entity_names or {}
        self.token = token

    def __call__(self, batch: pa.Table) -> pa.Table:
        sub = batch.filter(batch["side"])
        n = sub.num_rows
        codes = sub["conv_id"].to_pandas()
        names = codes.map(self.names).fillna("")
        return pa.table({
            "code": pa.array(codes, pa.string()),
            "name": pa.array(names, pa.string()),
            "attribute_code": pa.array([R.SIDE_OUTPUT_TOOL] * n, pa.string()),
            "value": pa.array([R.SIDE_OUTPUT_VALUE] * n, pa.string()),
            "total": pa.array(np.ones(n, np.int64)),         # setTotal(1L)
            "return_count": pa.array(np.ones(n, np.int64)),  # setReturnCount(1L)
            "token": pa.array([self.token] * n, pa.string()),
        })


def webdata_stream(validated, entity_names: dict, token: str = "",
                   concurrency=(1, 4)):
    """validated stream → synthesized webdata records (S4). The names
    dict is broadcast once; lookup happens in actor state."""
    import ray

    ref = ray.put(entity_names)
    return validated.map_batches(
        SideRecordSynthesizer,
        fn_constructor_kwargs={"names_ref": ref, "token": token},
        batch_format="pyarrow", concurrency=concurrency)


def split_streams(ds, blacklist_key: str = "conv_id"):
    """valid / rejected / side Datasets from a validated stream
    (≙ topics valid_data / blacklists / webdata, TopologyProducer.java:137,
    InternalProducer.java:11-19). Cheap vectorized filters; Ray Data fuses
    them with downstream stages."""
    valid = ds.map_batches(lambda t: t.filter(t["valid"]), batch_format="pyarrow")
    rejected = ds.map_batches(lambda t: t.filter(pc.invert(t["valid"])),
                              batch_format="pyarrow")
    side = ds.map_batches(lambda t: t.filter(t["side"]), batch_format="pyarrow")
    return valid, rejected, side
