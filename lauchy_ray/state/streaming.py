"""Watermark-driven streaming window engine (north_star: "ActorPoolStrategy
actors holding per-partition state stores and watermark trackers,
watermark-driven emission with late-turn handling").

This is the true STREAMING face of the engine: instead of a batch
groupby over a complete dataset, fragments arrive in order (micro-batches
≙ Kafka polls) and per-shard STATE ACTORS maintain:

- open-window partial counts  (bounded: only windows newer than the
  watermark are held — state is O(open windows), never O(rows)),
- a per-shard watermark  wm = max(event ts seen) − allowed lateness,
- emission: when wm passes a window's end the window is CLOSED and
  emitted exactly once; rows arriving for an already-closed window are
  handled per ``late_policy``: "route" (default) sends them to the LATE
  output and never counts them (≙ the reference's blacklist side-channel
  shape); "merge" counts them as CORRECTION rows merged into the final
  per-key rollup, so merged results equal a batch computation over the
  same rows (the standard upsert/retraction knob).

Sharding is hash(conv_id) % n_shards — deterministic, and each actor sees
its shard's rows in fragment (arrival) order because the driver submits
ingests in order and Ray preserves per-caller actor call order. Results
are therefore independent of actor scheduling — the property the batch
engine gets from order-insensitive row sets, the streaming engine gets
from per-shard FIFO.

At cluster scale the driver loop ships OBJECT REFS (one ray.put per
fragment shard), never row data, and fragments stream with
``max_pending`` in-flight micro-batches for backpressure.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..oracle import shard_of
from ..pipelines.validate import _drop_null_text
from ..sources.stream import list_fragments
from ..stages.dedup_near import md5_60
from ..stages.sketches import HLL_REM_BITS, hll_rho
from ..stages.validator import Validator
from ..stages.windows import topk_rank
from .sink import _atomic_write

NEG_INF = -(1 << 62)


class ShardActorBase:
    """Shared shard-actor state machinery: watermark, emitted/late delta
    buffers, and the delta-log + snapshot exactly-once commit protocol.
    Subclasses define ``_core_state()`` / ``_restore_core(core)`` for
    their bounded open-state (open windows / open sessions)."""

    def _init_shard_state(self, checkpoint_path: str | None, config: tuple) -> None:
        self.wm = NEG_INF                    # shard watermark (epoch us)
        # emitted/late hold only the CURRENT delta (since last checkpoint)
        # when checkpointing: full history lives in the append-only delta
        # log so snapshot size stays O(open state), never O(stream life)
        self.emitted: list[dict] = []
        self.late: list[dict] = []
        self.seq = -1                        # highest micro-batch seq applied
        self.checkpoint_path = checkpoint_path
        self._config = config
        if checkpoint_path:
            # a crash mid-append can leave a TORN record at the delta-log
            # tail; without repair, new appends land AFTER the torn bytes
            # and _read_deltas (which stops at the first unreadable record)
            # would silently drop every later delta — truncate to the last
            # whole record BEFORE this actor ever appends (ADVICE r1).
            self._repair_delta_log()
        if checkpoint_path and os.path.exists(checkpoint_path):
            import pickle
            try:
                with open(checkpoint_path, "rb") as f:
                    cfg, self.wm, core, self.seq = pickle.load(f)
            except Exception:
                # torn/corrupt snapshot (crash before fsync'd rename landed):
                # fresh state + full replay still converges exactly-once —
                # the delta log dedupes by seq at read time
                self.wm, self.seq = NEG_INF, -1
            else:
                if cfg != self._config:
                    raise ValueError(
                        f"checkpoint at {checkpoint_path} was written with "
                        f"config {cfg}, current run uses {self._config}"
                        " — delete the checkpoint dir or match the config")
                self._restore_core(core)

    def _core_state(self):
        raise NotImplementedError

    def _restore_core(self, core) -> None:
        raise NotImplementedError

    # ---- shared ingest machinery for the lateness-windowed cores
    # (WindowShardCore / DistinctShardCore / TopKShardCore). The seq
    # replay guard, the prefix-watermark computation and the late-row
    # routing are CONTRACT — the oracles mirror them row-at-a-time — so
    # they live once here and a semantics fix lands in every core
    # (round-3 review finding: three near-verbatim copies had grown).

    def _skip_replay(self, table: pa.Table, seq: int | None) -> bool:
        """True when this micro-batch needs no processing: a replay of an
        already-checkpointed seq, or an empty batch (which still bumps
        seq + checkpoint so resume skips it)."""
        if seq is not None and seq <= self.seq:
            return True
        if table.num_rows == 0:
            if seq is not None:
                self.seq = seq
                self._checkpoint()
            return True
        return False

    def _prefix_watermark(self, ts: np.ndarray):
        """(cummax(ts - lateness), wm-before-each-row): the watermark only
        ever advances, so wm before row i is max(incoming wm, cummax over
        prior rows) — one prefix max, batch-boundary invariant."""
        cm = np.maximum.accumulate(ts - self.lateness)
        prefix_wm = np.empty(len(ts), dtype=np.int64)
        prefix_wm[0] = self.wm
        if len(ts) > 1:
            np.maximum(self.wm, cm[:-1], out=prefix_wm[1:])
        return cm, prefix_wm

    @staticmethod
    def _decode_batch(table: pa.Table):
        """(ts, idx, codes, names, is_user, is_assistant): arrow-native
        batch decode. dictionary_encode factorizes conv_id in C and only
        the DISTINCT names cross into Python objects — the old
        to_pylist + pd.factorize + object-dtype role comparisons were
        one boxed PyObject per ROW and dominated columnar-engine ingest
        (2.4 s of a 3.0 s join pass at 1M rows)."""
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        idx = table["turn_idx"].to_numpy(
            zero_copy_only=False).astype(np.int64)
        # null conv_id rows (outside the input contract but shippable by
        # a raw fragment) become the "" key — deterministic, never a
        # NaN-index crash; null roles are neither user nor assistant
        # (fill_null keeps the comparison a plain bool array — a null in
        # pc.equal otherwise yields an OBJECT array that crashes `&`)
        conv = table["conv_id"].combine_chunks()
        if conv.null_count:
            conv = conv.fill_null("")
        enc = pc.dictionary_encode(conv)
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
        role = table["role"]
        is_u = pc.fill_null(pc.equal(role, "user"), False).to_numpy(
            zero_copy_only=False)
        is_a = pc.fill_null(pc.equal(role, "assistant"), False).to_numpy(
            zero_copy_only=False)
        return ts, idx, codes, names, is_u, is_a

    def _map_names(self, names: np.ndarray, idx: np.ndarray) -> np.ndarray:
        """Vectorized lookup of batch conv names against the persistent
        ``self._names`` index, appending the new ones; validates the
        dup-pack bounds (conv codes < 2^29, 0 ≤ turn_idx < 2^34 — a
        negative idx would smear sign bits over the code field and alias
        distinct keys). Shared by the dedup / absence / join engines."""
        g = self._names.get_indexer(names) if len(names) else \
            np.empty(0, np.int64)
        miss = g == -1
        if miss.any():
            start = len(self._names)
            self._names = self._names.append(pd.Index(names[miss]))
            g[miss] = np.arange(start, start + int(miss.sum()))
        if len(self._names) >= (1 << 29):
            raise ValueError("conv cardinality exceeds dup-pack bounds")
        if len(idx) and (int(idx.min()) < 0 or int(idx.max()) >= (1 << 34)):
            raise ValueError("turn_idx exceeds dup-pack bounds")
        return g

    def _compact_names(self, live_codes: list[np.ndarray]) -> list:
        """Rebuild ``self._names`` from the codes still referenced by
        state (the index otherwise grows with stream-LIFETIME distinct
        convs — the dict-based design evicted quiet convs with their
        state, and the horizon-bounded claim must stay true). Returns
        the remap arrays: new_code = searchsorted(live, old_code).
        Call when len(_names) outgrows the live set by 4x."""
        live = (np.unique(np.concatenate(live_codes)) if live_codes
                else np.empty(0, np.int64))
        self._names = pd.Index(np.asarray(self._names, dtype=object)[live])
        return [np.searchsorted(live, c) for c in live_codes]

    def _append_late(self, **cols) -> None:
        """Append late rows as ONE column block (equal-length arrays) —
        late volume can be O(rows) on late-heavy streams, and per-row
        dict emission measured 4-5x slower (JoinShardCore's columnar
        pattern generalized). Blocks ride the delta-log checkpoints like
        dict rows; rows_list/_mixed_rows_df normalize for consumers."""
        n = len(next(iter(cols.values())))
        if n:
            self.late.append({k: np.asarray(v) for k, v in cols.items()})

    def _route_late_rows(self, table: pa.Table, ts: np.ndarray,
                         wid: np.ndarray, late_mask: np.ndarray) -> None:
        """Append late rows to the late output — materializes ONLY the
        late rows' conv ids, not the whole batch."""
        late_idx = np.flatnonzero(late_mask)
        if not len(late_idx):
            return
        convs = table["conv_id"].take(pa.array(late_idx)) \
            .to_numpy(zero_copy_only=False)
        idxs = table["turn_idx"].to_numpy(zero_copy_only=False)
        self._append_late(conv_id=convs.astype(object),
                          turn_idx=idxs[late_idx].astype(np.int64),
                          ts=ts[late_idx].astype(np.int64),
                          window_id=wid[late_idx].astype(np.int64))

    def _advance_and_commit(self, cm_last: int, seq: int | None) -> None:
        """Advance the watermark, emit newly-closed windows, checkpoint."""
        if cm_last > self.wm:
            self.wm = int(cm_last)
        self._emit_closed()
        if seq is not None:
            self.seq = seq
            self._checkpoint()

    def _delta_path(self) -> str:
        return self.checkpoint_path + ".deltas.pkl"

    def _repair_delta_log(self) -> None:
        """Scan the append-only delta log and truncate at the first torn
        record (a crash mid-``pickle.dump`` leaves partial bytes at EOF).
        Safe by the commit protocol: the core snapshot that would make a
        torn delta's seq "applied" is only written AFTER the delta append
        succeeds, so a truncated tail seq will simply be re-ingested and
        re-appended on replay."""
        import pickle
        path = self._delta_path()
        if not os.path.exists(path):
            return
        good_end = 0
        with open(path, "rb") as f:
            while True:
                try:
                    pickle.load(f)
                except EOFError:
                    break
                except Exception:
                    break  # torn/corrupt tail starts here
                good_end = f.tell()
            f.seek(0, os.SEEK_END)
            total = f.tell()
        if good_end < total:
            with open(path, "rb+") as f:
                f.truncate(good_end)
                f.flush()
                os.fsync(f.fileno())

    def _checkpoint(self) -> None:
        """Commit protocol, AFTER applying a micro-batch:
        1. append this seq's (emitted, late) delta to the append-only log
           (fsync'd); duplicates from replay-after-crash are dropped at
           read time by keeping the FIRST record per seq;
        2. atomically (write+fsync+rename) snapshot the BOUNDED core state
           (config, wm, open windows/sessions, seq).
        A crash between the two replays the seq against the pre-apply
        snapshot and appends a duplicate delta — deduped on read."""
        if not self.checkpoint_path:
            return
        import pickle
        if self.emitted or self.late:
            # empty deltas carry nothing (_read_deltas only accumulates) —
            # skipping them saves one synchronous fsync barrier per quiet
            # micro-batch and keeps actors with no delta output (dedup)
            # from growing a log they never read
            with open(self._delta_path(), "ab") as f:
                pickle.dump({"seq": self.seq, "emitted": self.emitted,
                             "late": self.late}, f)
                f.flush()
                os.fsync(f.fileno())
            self.emitted, self.late = [], []
        tmp = f"{self.checkpoint_path}.tmp-{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump((self._config, self.wm, self._core_state(), self.seq), f)
            f.flush()
            os.fsync(f.fileno())
        os.rename(tmp, self.checkpoint_path)

    def _read_deltas(self) -> tuple[list[dict], list[dict]]:
        """All checkpointed deltas, first-record-per-seq (replay dedupe)."""
        import pickle
        emitted, late, seen = [], [], set()
        if self.checkpoint_path and os.path.exists(self._delta_path()):
            with open(self._delta_path(), "rb") as f:
                while True:
                    try:
                        rec = pickle.load(f)
                    except EOFError:
                        break
                    except Exception:
                        break  # trailing torn append from a crash: ignore
                    if rec["seq"] in seen:
                        continue
                    seen.add(rec["seq"])
                    emitted.extend(rec["emitted"])
                    late.extend(rec["late"])
        return emitted, late


class WindowShardCore(ShardActorBase):
    """One shard of streaming window-count state. Supports tumbling
    (slide == width, the default) and sliding windows (width a multiple of
    slide): a row belongs to width/slide windows; window w covers
    [w*slide, w*slide + width) and closes when wm ≥ its END."""

    def __init__(self, width_us: int, lateness_us: int, slide_us: int | None = None,
                 checkpoint_path: str | None = None, late_policy: str = "route"):
        self.width = width_us
        self.slide = slide_us or width_us
        assert width_us % self.slide == 0
        if late_policy not in ("route", "merge"):
            raise ValueError(f"late_policy must be 'route' or 'merge', "
                             f"got {late_policy!r}")
        self.late_policy = late_policy
        self.n_per = width_us // self.slide
        self.lateness = lateness_us
        self.open: dict[tuple, list[int]] = {}   # (wid, role, tool) → [ok, rej]
        self._init_shard_state(checkpoint_path,
                               (width_us, self.slide, lateness_us, late_policy))

    def _core_state(self):
        return self.open

    def _restore_core(self, core) -> None:
        self.open = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        """One micro-batch for this shard, rows in arrival order. ``seq``
        (the fragment ordinal) makes replay idempotent after a
        checkpoint-restore: already-applied micro-batches are skipped.

        VECTORIZED equivalent of the row-at-a-time scan (the oracle): the
        watermark only ever advances, so wm-before-row-i is
        max(incoming wm, cummax(ts - lateness) over prior rows) — a prefix
        max. Late/open decisions per row then become array expressions, and
        cell updates collapse to one pandas groupby per window offset (the
        work is O(distinct cells), not O(rows))."""
        if self._skip_replay(table, seq):
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        valids = table["valid"].to_numpy(zero_copy_only=False)
        cm, prefix_wm = self._prefix_watermark(ts)
        last = ts // self.slide
        late_mask = last * self.slide + self.width <= prefix_wm  # newest closed
        self._route_late_rows(table, ts, last, late_mask)

        roles = table["role"].to_pandas()  # C conversion, not row boxing
        tools = table["tool"].to_pandas()
        for k in range(self.n_per):
            wid = last - k
            closed_k = wid * self.slide + self.width <= prefix_wm
            if self.late_policy == "merge":
                # merge policy: contributions to already-closed windows are
                # not dropped — they become CORRECTION rows appended to the
                # emitted stream (same keys; the final per-key rollup sums
                # them), so merged results equal a batch computation and
                # per-shard state stays bounded (corrections flush with
                # every checkpoint delta like ordinary emissions)
                open_mask = (wid >= 0) & ~closed_k
                corr_mask = (wid >= 0) & closed_k
                if corr_mask.any():
                    sub = pd.DataFrame({
                        "wid": wid[corr_mask], "role": roles[corr_mask],
                        "tool": tools[corr_mask],
                        "ok": valids[corr_mask].astype(np.int64)})
                    g = sub.groupby(["wid", "role", "tool"], sort=False).agg(
                        ok=("ok", "sum"), total=("ok", "size"))
                    for (w, r, t2), ok_v, tot in zip(
                            g.index, g["ok"].to_numpy(), g["total"].to_numpy()):
                        self.emitted.append({
                            "window_id": int(w), "role": r, "tool": t2,
                            "n_valid": int(ok_v),
                            "n_rejected": int(tot - ok_v)})
            else:
                # route policy (default): late rows contribute to NO
                # window; partially-late sliding contributions are dropped
                open_mask = (~late_mask) & (wid >= 0) & ~closed_k
            if not open_mask.any():
                continue
            sub = pd.DataFrame({"wid": wid[open_mask], "role": roles[open_mask],
                                "tool": tools[open_mask],
                                "ok": valids[open_mask].astype(np.int64)})
            g = sub.groupby(["wid", "role", "tool"], sort=False).agg(
                ok=("ok", "sum"), total=("ok", "size"))
            for (w, r, t2), ok_v, tot in zip(
                    g.index, g["ok"].to_numpy(), g["total"].to_numpy()):
                cell = self.open.setdefault((int(w), r, t2), [0, 0])
                cell[0] += int(ok_v)
                cell[1] += int(tot - ok_v)
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _emit_closed(self) -> None:
        closed = [k for k in self.open
                  if k[0] * self.slide + self.width <= self.wm]
        for k in sorted(closed):
            ok, rej = self.open.pop(k)
            self.emitted.append({"window_id": k[0], "role": k[1], "tool": k[2],
                                 "n_valid": ok, "n_rejected": rej})

    def finalize(self) -> dict:
        """End of stream: flush remaining open windows (wm → ∞) and, when
        checkpointing, merge the delta-log history with the in-memory
        tail. finalize does NOT checkpoint — its flush is terminal, and a
        rerun after a completed run must replay to the same answer."""
        for k in sorted(self.open):
            ok, rej = self.open[k]
            self.emitted.append({"window_id": k[0], "role": k[1], "tool": k[2],
                                 "n_valid": ok, "n_rejected": rej})
        self.open.clear()
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


class SessionShardCore(ShardActorBase):
    """One shard of streaming SESSION-window state (north_star: session
    windows keyed on conv_id with ts-gap close, watermark-driven emission).

    State: COLUMNAR open-session arrays (conv, start, end, n), pairwise
    separated by > gap within a conv. A session closes (emits exactly
    once) when the watermark passes ``end + gap`` — no future on-time row
    can extend it, because extension needs ``ts ≤ end + gap ≤ wm`` while
    on-time means ``ts + gap > wm``. Closure is decided per ROW against
    the PREFIX watermark, so results are independent of micro-batch
    boundaries (the same property the window engine gets from its
    prefix-max formulation). Late rows (``ts + gap ≤ prefix wm`` — even a
    singleton session would already be closed) are routed to the late
    output, never merged (the window engine's route policy).

    The common case is FULLY VECTORIZED: the batch's mini-sessions and
    the whole open set merge in one sorted interval-union sweep (grouped
    cummax + reduceat), and closing is one mask — no per-conversation
    Python in the hot path (the prior per-conv dict merge was the
    sessions engine's bottleneck). Convs that could close MID-batch
    (rare) still replay per row against the prefix watermark, preserving
    batch-boundary invariance exactly. State is O(open sessions),
    bounded by lateness × arrival rate."""

    def __init__(self, gap_us: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.gap = gap_us
        self.lateness = lateness_us
        self.oc = np.empty(0, dtype=object)   # conv per open session
        self.olo = np.empty(0, dtype=np.int64)
        self.ohi = np.empty(0, dtype=np.int64)
        self.on_ = np.empty(0, dtype=np.int64)
        # lower bound on min(open hi) + gap: wm below it ⇒ nothing closable
        self._close_bound: int | None = None
        self._init_shard_state(checkpoint_path, (gap_us, lateness_us))

    def _core_state(self):
        return (self.oc, self.olo, self.ohi, self.on_)

    def _restore_core(self, core) -> None:
        if isinstance(core, dict):            # legacy dict-form snapshot
            rows = [(c, s[0], s[1], s[2]) for c, lst in core.items()
                    for s in lst]
            self.oc = np.array([r[0] for r in rows], dtype=object)
            self.olo = np.array([r[1] for r in rows], dtype=np.int64)
            self.ohi = np.array([r[2] for r in rows], dtype=np.int64)
            self.on_ = np.array([r[3] for r in rows], dtype=np.int64)
        else:
            self.oc, self.olo, self.ohi, self.on_ = (
                np.asarray(core[0], dtype=object),
                np.asarray(core[1], dtype=np.int64),
                np.asarray(core[2], dtype=np.int64),
                np.asarray(core[3], dtype=np.int64))
        self._close_bound = self._exact_close_bound()

    def _exact_close_bound(self) -> int | None:
        """min(open hi) + gap — the exact first watermark that can close
        anything; None when no session is open."""
        return int(self.ohi.min()) + self.gap if len(self.ohi) else None

    # ---- vectorized interval-union over (conv, lo, hi, n) rows --------

    def _gap_union(self, ac, alo, ahi, an):
        """Gap-merge the given rows: sort by (conv, lo), break where
        lo > running-max(hi) + gap, fold each run with reduceat. Rows of
        a conv already > gap apart fold to themselves. Returns the merged
        (conv, lo, hi, n) arrays."""
        uniq, codes = np.unique(ac, return_inverse=True)
        order = np.lexsort((alo, codes))
        sc = codes[order]
        slo = alo[order]
        shi = ahi[order]
        sn = an[order]
        first = np.ones(len(sc), dtype=bool)
        if len(sc) > 1:
            first[1:] = sc[1:] != sc[:-1]
        # grouped running max of hi (pandas cython cummax), EXCLUSIVE;
        # prev_run[first] is the PREVIOUS conv's max — masked by `first`
        run = (pd.Series(shi).groupby(pd.Series(sc), sort=False)
               .cummax().to_numpy())
        prev_run = np.empty_like(run)
        if len(run):
            prev_run[0] = 0
            prev_run[1:] = run[:-1]
        brk = first | (slo > prev_run + self.gap)
        starts = np.flatnonzero(brk)
        return (uniq[sc[starts]], slo[starts],
                np.maximum.reduceat(shi, starts),
                np.add.reduceat(sn, starts))

    def _append_open(self, ac, alo, ahi, an) -> None:
        """Append already-merged rows to the open set (no re-union) and
        lower the close bound to cover them."""
        if len(ac) == 0:
            return
        self.oc = np.concatenate([self.oc, ac])
        self.olo = np.concatenate([self.olo, alo])
        self.ohi = np.concatenate([self.ohi, ahi])
        self.on_ = np.concatenate([self.on_, an])
        nb = int(ahi.min()) + self.gap
        if self._close_bound is None or nb < self._close_bound:
            self._close_bound = nb

    def _merge_batch(self, seg_conv, seg_lo, seg_hi, seg_n) -> None:
        """Union the batch's mini-sessions into the open set, touching
        ONLY the convs present in the batch: untouched open rows (the
        bulk of a shard holding many concurrently open conversations)
        are carried over as-is, so per-batch sort cost scales with the
        batch, not with total open state."""
        if len(seg_conv) == 0:
            return
        touched = (pd.Series(self.oc).isin(seg_conv).to_numpy()
                   if len(self.oc) else np.empty(0, dtype=bool))
        if touched.any():
            keep = ~touched
            tc, tlo, thi, tn = (self.oc[touched], self.olo[touched],
                                self.ohi[touched], self.on_[touched])
            self.oc, self.olo, self.ohi, self.on_ = (
                self.oc[keep], self.olo[keep], self.ohi[keep],
                self.on_[keep])
        else:  # no overlap: leave the open arrays untouched (no copy)
            tc = np.empty(0, dtype=object)
            tlo = np.empty(0, dtype=np.int64)
            thi = np.empty(0, dtype=np.int64)
            tn = np.empty(0, dtype=np.int64)
        self._append_open(*self._gap_union(
            np.concatenate([tc, seg_conv]),
            np.concatenate([tlo, seg_lo.astype(np.int64)]),
            np.concatenate([thi, seg_hi.astype(np.int64)]),
            np.concatenate([tn, seg_n.astype(np.int64)])))

    def _emit_closed(self, wm: int) -> None:
        # _close_bound is a LOWER bound on min(hi)+gap (merging can only
        # raise a row's hi), so wm < bound ⇒ nothing closable: the usual
        # micro-batch skips the O(open) mask entirely
        if self._close_bound is None or wm < self._close_bound:
            return
        closed = self.ohi + np.int64(self.gap) <= wm
        if closed.any():
            # columnar: closed-session volume is O(sessions) ≈ O(rows)
            self.emitted.append({
                "conv_id": np.asarray(self.oc[closed], dtype=object),
                "start_us": self.olo[closed].astype(np.int64),
                "end_us": self.ohi[closed].astype(np.int64),
                "n_turns": self.on_[closed].astype(np.int64)})
            keep = ~closed
            self.oc, self.olo, self.ohi, self.on_ = (
                self.oc[keep], self.olo[keep], self.ohi[keep],
                self.on_[keep])
        # exact bound over survivors (the O(open) pass is already paid)
        self._close_bound = self._exact_close_bound()

    # ---- slow-path per-row helpers over a temp dict -------------------

    def _dict_close(self, tmp: dict, conv, wm: int) -> None:
        lst = tmp.get(conv)
        if not lst:
            return
        keep = []
        for s in lst:
            if s[1] + self.gap <= wm:
                self.emitted.append({"conv_id": conv, "start_us": s[0],
                                     "end_us": s[1], "n_turns": s[2]})
            else:
                keep.append(s)
        if keep:
            tmp[conv] = keep
        else:
            del tmp[conv]

    def _dict_merge(self, tmp: dict, conv, lo: int, hi: int, n: int) -> None:
        """Insert one segment: extend/merge every session within gap (a
        segment can bridge two sessions separated by ≤ 2·gap)."""
        lst = tmp.setdefault(conv, [])
        keep = []
        for s in lst:
            if s[0] - self.gap <= hi and lo <= s[1] + self.gap:
                lo = min(lo, s[0])
                hi = max(hi, s[1])
                n += s[2]
            else:
                keep.append(s)
        keep.append([lo, hi, n])
        tmp[conv] = keep

    def _segments_of(self, on: np.ndarray, convs: list, ts: np.ndarray):
        """Vectorized mini-sessions of the batch's on-time rows: sort by
        (conv, ts), break on conv change or ts gap; → (conv_of_seg,
        lo, hi, n) arrays."""
        sub_convs = np.asarray(convs, dtype=object)[on]
        sub_ts = ts[on]
        uniq, codes = np.unique(sub_convs, return_inverse=True)
        order = np.lexsort((sub_ts, codes))
        sc, st = codes[order], sub_ts[order]
        brk = np.ones(len(order), dtype=bool)
        if len(order) > 1:
            brk[1:] = (sc[1:] != sc[:-1]) | (np.diff(st) > self.gap)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(order)) - 1
        return uniq[sc[starts]], st[starts], st[ends], (ends - starts + 1)

    def _slow_convs(self, segs, final_cm: int) -> set:
        """Convs whose per-row close-before-merge interleave could matter
        this batch: any of their segments (open session or new mini)
        could close against a prefix watermark (all prefix wms ≤
        final_cm). Closure and merging are PER-CONV operations reading
        only the precomputed prefix wms, so every other conv can merge
        vectorized and order-independently."""
        bound = final_cm - self.gap
        slow = set(self.oc[self.ohi <= bound])
        seg_conv, seg_lo, _hi, _n = segs
        # the weakest INTERMEDIATE per-row state of a new segment is a
        # just-created singleton at some row ts ≥ lo, so a segment is
        # provably non-closable only when its MIN ts clears the bound
        # (checking the final hi misses mid-batch closures of partial
        # sessions — caught by a 153-session divergence at 8M rows)
        slow.update(seg_conv[seg_lo <= bound])
        return slow

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if seq is not None and seq <= self.seq:
            return 0  # replay of an already-checkpointed micro-batch
        n = table.num_rows
        if n == 0:
            if seq is not None:
                self.seq = seq
                self._checkpoint()
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        convs = table["conv_id"].to_pandas().to_numpy()  # C conversion
        idxs = table["turn_idx"].to_numpy(zero_copy_only=False)

        # prefix watermark per row (arrival order), as in WindowShardActor
        wm_cand = ts - self.lateness
        cm = np.maximum.accumulate(wm_cand)
        prefix_wm = np.empty(n, dtype=np.int64)
        prefix_wm[0] = self.wm
        if n > 1:
            np.maximum(self.wm, cm[:-1], out=prefix_wm[1:])

        late_mask = ts + np.int64(self.gap) <= prefix_wm
        lsel = np.flatnonzero(late_mask)
        if len(lsel):
            self._append_late(
                conv_id=np.asarray(convs, dtype=object)[lsel],
                turn_idx=np.asarray(idxs)[lsel].astype(np.int64),
                ts=ts[lsel].astype(np.int64))
        final_cm = int(cm[-1])
        on = np.flatnonzero(~late_mask)
        if len(on):
            segs = self._segments_of(on, convs, ts)
            slow = self._slow_convs(segs, final_cm)
            seg_conv, seg_lo, seg_hi, seg_n = segs
            if slow:
                # rare interleaved convs: pull their open rows into a
                # temp dict, exact per-row replay with close-before-merge
                # at each row's prefix watermark, fold remnants back
                sm = np.fromiter((c in slow for c in self.oc), dtype=bool,
                                 count=len(self.oc))
                tmp: dict = {}
                for c, l, h, nn in zip(self.oc[sm], self.olo[sm],
                                       self.ohi[sm], self.on_[sm]):
                    tmp.setdefault(c, []).append([int(l), int(h), int(nn)])
                ks = ~sm
                self.oc, self.olo, self.ohi, self.on_ = (
                    self.oc[ks], self.olo[ks], self.ohi[ks], self.on_[ks])
                for i in on:
                    conv = convs[i]
                    if conv in slow:
                        self._dict_close(tmp, conv, int(prefix_wm[i]))
                        self._dict_merge(tmp, conv, int(ts[i]), int(ts[i]), 1)
                fmask = np.fromiter((c not in slow for c in seg_conv),
                                    dtype=bool, count=len(seg_conv))
                seg_conv, seg_lo = seg_conv[fmask], seg_lo[fmask]
                seg_hi, seg_n = seg_hi[fmask], seg_n[fmask]
                rem = [(c, s[0], s[1], s[2]) for c, lst in tmp.items()
                       for s in lst]
                if rem:
                    # already per-conv merged by the dict replay; lowers
                    # _close_bound to cover the remnants
                    self._append_open(
                        np.array([r[0] for r in rem], object),
                        np.array([r[1] for r in rem], np.int64),
                        np.array([r[2] for r in rem], np.int64),
                        np.array([r[3] for r in rem], np.int64))
            # FAST PATH (the overwhelmingly common conv): no segment of
            # the conv can close against any prefix watermark, so the
            # per-row close-before-merge interleave is a no-op and its
            # merging is ORDER-INDEPENDENT (connected components under
            # the gap relation) — ONE vectorized interval-union over the
            # batch's mini-sessions plus ONLY the open rows of convs the
            # batch touches; untouched open state is carried over as-is.
            self._merge_batch(seg_conv, seg_lo, seg_hi, seg_n)
        if final_cm > self.wm:
            self.wm = final_cm
        self._emit_closed(self.wm)
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return n

    def finalize(self) -> dict:
        order = np.lexsort((self.olo, self.oc.astype(str)))
        if len(order):
            self.emitted.append({
                "conv_id": np.asarray(self.oc[order], dtype=object),
                "start_us": self.olo[order].astype(np.int64),
                "end_us": self.ohi[order].astype(np.int64),
                "n_turns": self.on_[order].astype(np.int64)})
        self.oc = np.empty(0, dtype=object)
        self.olo = self.ohi = self.on_ = np.empty(0, dtype=np.int64)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


def run_streaming_sessions(input_path: str, gap_us: int, lateness_us: int,
                           n_shards: int = 8,
                           validate_kwargs: dict | None = None,
                           max_pending: int = 4,
                           checkpoint_dir: str | None = None,
                           tail: bool = False,
                           poll_interval_s: float = 0.25,
                           idle_timeout_s: float = 10.0,
                           stop_file: str = "_EOS"):
    """Stream fragments through validator + session shard actors.

    → (sessions DataFrame (conv_id, start_us, end_us, n_turns),
       late DataFrame, per-shard watermarks). With lateness → ∞ no row is
    ever late and every session flushes at finalize, so the result equals
    batch sessionization of the same rows exactly (tested invariant).
    ``tail=True``: live directory-watch ingest (see
    run_streaming_window_counts)."""
    meta = {"kind": "sessions", "gap_us": gap_us, "lateness_us": lateness_us,
            "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [SessionShardActor.remote(
        gap_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    sess = _mixed_rows_df([b for f in finals for b in f["emitted"]],
                          ["conv_id", "start_us", "end_us", "n_turns"])
    late_df = _mixed_rows_df([b for f in finals for b in f["late"]],
                             ["conv_id", "turn_idx", "ts"])
    return sess, late_df, [f["watermark"] for f in finals]


class DedupShardCore(ShardActorBase):
    """Streaming exactly-once dedup by key (north_star core op: "dedup by
    key") with watermark-TTL'd state.

    Per shard: ``seen`` maps key → first-arrival event ts. A micro-batch's
    FIRST occurrence of each key is accepted and written as the shard's
    ``part-<seq>.parquet`` (write → fsync → atomic rename, then snapshot
    (seen, wm, seq)); re-arrivals are dropped. On crash-replay the seq is
    either skipped (snapshot survived) or recomputed deterministically and
    the rename overwrite is idempotent — the same commit discipline as
    state/sink.py.

    State is BOUNDED by ``retention_us``: keys whose first arrival is
    older than wm - retention are evicted (amortized sweep), so a
    duplicate arriving later than the retention horizon passes through —
    the standard bounded-state tradeoff; set retention ≥ the producer
    retry horizon for exact dedup. Eviction is safe for correctness of
    ACCEPTED rows (an evicted key's first occurrence was already
    emitted)."""

    def __init__(self, key_cols: list[str], retention_us: int,
                 lateness_us: int, out_dir: str | None = None,
                 checkpoint_path: str | None = None):
        self.key_cols = list(key_cols)
        self.retention = retention_us
        self.lateness = lateness_us
        self.out_dir = out_dir
        # COLUMNAR fast path for the canonical (conv_id, turn_idx) key:
        # sorted packed int64 keys + one searchsorted membership probe
        # per batch (the generic path hashes one Python tuple per ROW —
        # it remains for arbitrary key_cols). Same first-wins, same
        # amortized-sweep eviction timing, byte-identical output.
        self._fast = self.key_cols == ["conv_id", "turn_idx"]
        self.seen: dict[tuple, int] = {}
        self._names = pd.Index([], dtype=object)
        self._k = np.empty(0, np.int64)
        self._t = np.empty(0, np.int64)
        self._evict_mark = 64  # amortized sweep threshold
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        # out_dir is part of the guarded config: resuming into a DIFFERENT
        # output dir would skip applied seqs whose parts live elsewhere
        self._init_shard_state(checkpoint_path,
                               ("dedup", tuple(key_cols), retention_us,
                                lateness_us, out_dir))

    def _core_state(self):
        # _evict_mark rides the snapshot: a resume that reset it to the
        # initial threshold would sweep earlier than the clean run and
        # could accept a duplicate the clean run dropped (replay must be
        # byte-identical)
        if self._fast:
            return ("fast", self._names, self._k, self._t,
                    self._evict_mark)
        return (self.seen, self._evict_mark)

    def _restore_core(self, core) -> None:
        if len(core) == 5 and core[0] == "fast":
            _, self._names, self._k, self._t, self._evict_mark = core
        elif self._fast and core[0]:
            # checkpoint written by the pre-columnar code (same config
            # tuple, generic dict state): MIGRATE it — restoring into
            # the unused dict would silently re-accept every
            # previously-seen key on resume
            seen, self._evict_mark = core
            names, idxs, ts = zip(*((c, i, t) for (c, i), t
                                    in seen.items()))
            uniq = pd.Index(pd.unique(np.asarray(names, dtype=object)))
            self._names = uniq
            g = uniq.get_indexer(np.asarray(names, dtype=object))
            key = (g.astype(np.int64) << 34) | np.asarray(idxs, np.int64)
            o = np.argsort(key)
            self._k = key[o]
            self._t = np.asarray(ts, np.int64)[o]
        else:
            self.seen, self._evict_mark = core

    def _n_state(self) -> int:
        return len(self._k) if self._fast else len(self.seen)

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if seq is not None and seq <= self.seq:
            return 0
        n = table.num_rows
        accepted_idx = []
        if n:
            ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            if self._fast:
                idx = table["turn_idx"].to_numpy(
                    zero_copy_only=False).astype(np.int64)
                conv = table["conv_id"].combine_chunks()
                if conv.null_count:
                    conv = conv.fill_null("")
                enc = pc.dictionary_encode(conv)
                codes = enc.indices.to_numpy(
                    zero_copy_only=False).astype(np.int64)
                names = np.asarray(enc.dictionary.to_pylist(),
                                   dtype=object)
                g = self._map_names(names, idx)
                key = (g[codes] << 34) | idx
                first = np.zeros(n, bool)
                first[np.unique(key, return_index=True)[1]] = True
                if len(self._k):
                    pos = np.minimum(np.searchsorted(self._k, key),
                                     len(self._k) - 1)
                    acc_m = first & (self._k[pos] != key)
                else:
                    acc_m = first
                accepted_idx = np.flatnonzero(acc_m)
                k_new = key[acc_m]
                o = np.argsort(k_new)
                ins = np.searchsorted(self._k, k_new[o])
                self._k = np.insert(self._k, ins, k_new[o])
                self._t = np.insert(self._t, ins, ts[acc_m][o])
            else:
                key_arrays = [table[c].to_pylist() for c in self.key_cols]
                for i in range(n):
                    key = tuple(arr[i] for arr in key_arrays)
                    if key not in self.seen:
                        self.seen[key] = int(ts[i])
                        accepted_idx.append(i)
            wm_new = int(ts.max()) - self.lateness
            if wm_new > self.wm:
                self.wm = wm_new
            if self._n_state() > self._evict_mark:
                horizon = self.wm - self.retention
                if self._fast:
                    m = self._t > horizon
                    self._k, self._t = self._k[m], self._t[m]
                    # name-index compaction: without it the index grows
                    # with stream-lifetime distinct convs (the dict
                    # design evicted quiet convs with their state); the
                    # rank remap is monotone so _k stays sorted
                    if len(self._names) > max(1024, 4 * len(self._k)):
                        lo = self._k & ((1 << 34) - 1)
                        [c2] = self._compact_names([self._k >> 34])
                        self._k = (c2 << 34) | lo
                else:
                    self.seen = {k: t for k, t in self.seen.items()
                                 if t > horizon}
                self._evict_mark = max(64, 2 * self._n_state())
        out = table.take(pa.array(np.asarray(accepted_idx, np.int64)))
        if self.out_dir is not None and seq is not None:
            # sink.py's write→fsync(file)→rename→fsync(dir) discipline: the
            # snapshot below is the commit record, so the part's directory
            # entry must be durable FIRST or a power loss could make the
            # snapshot skip a seq whose part never landed
            _atomic_write(out, os.path.join(self.out_dir,
                                            f"part-{seq:06d}.parquet"))
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return out.num_rows

    def finalize(self) -> dict:
        return {"emitted": [], "late": [], "watermark": self.wm,
                "state_keys": self._n_state()}


def run_streaming_dedup(input_path: str, out_dir: str,
                        key_cols: list[str] | None = None,
                        retention_us: int = 3600 * 1_000_000,
                        lateness_us: int = 5 * 60 * 1_000_000,
                        n_shards: int = 8,
                        validate_kwargs: dict | None = None,
                        max_pending: int = 4,
                        checkpoint_dir: str | None = None,
                        tail: bool = False,
                        poll_interval_s: float = 0.25,
                        idle_timeout_s: float = 10.0,
                        stop_file: str = "_EOS") -> dict:
    """Streaming dedup-by-key over the fragment stream, writing the
    deduplicated stream as per-shard parquet parts (exactly-once: output
    part names are (shard, seq)-deterministic, replay skips applied seqs).
    → summary dict {rows_out, state_keys, watermarks}. ``tail=True``:
    live directory-watch ingest (see run_streaming_window_counts)."""
    import glob as _glob
    key_cols = key_cols or ["conv_id", "turn_idx"]
    # a run only legitimately APPENDS to a dirty out_dir when it resumes
    # from the checkpoint that wrote those parts — i.e. checkpoint_dir
    # holds PRIOR STATE (_meta.json, or shard ckpts from a crash that
    # died before meta landed). A genuinely fresh checkpoint dir pointed
    # at someone else's parts would silently interleave two datasets
    # (round-2 advice: the meta equality guard can't see that case).
    resuming = checkpoint_dir is not None and (
        os.path.exists(os.path.join(checkpoint_dir, "_meta.json"))
        or bool(_glob.glob(os.path.join(checkpoint_dir, "*.ckpt*"))))
    if not resuming and _glob.glob(
            os.path.join(out_dir, "shard-*", "part-*.parquet")):
        raise ValueError(
            f"out_dir {out_dir} already holds dedup parts but this run is "
            "not resuming from the checkpoint that wrote them "
            f"(checkpoint_dir={checkpoint_dir!r} "
            f"{'has no _meta.json yet' if checkpoint_dir else 'unset'}); "
            "appending would interleave two datasets — delete the out dir "
            "or resume with the original checkpoint_dir")
    meta = {"kind": "dedup", "key_cols": key_cols,
            "retention_us": retention_us, "lateness_us": lateness_us,
            "n_shards": n_shards, "out_dir": out_dir}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [DedupShardActor.remote(
        key_cols, retention_us, lateness_us,
        os.path.join(out_dir, f"shard-{s:03d}"),
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    import glob
    total = 0
    for f in glob.glob(os.path.join(out_dir, "shard-*", "part-*.parquet")):
        total += pq.ParquetFile(f).metadata.num_rows
    return {"rows_out": total,
            "state_keys": sum(f["state_keys"] for f in finals),
            "watermarks": [f["watermark"] for f in finals]}


class QuantileShardCore(ShardActorBase):
    """Streaming EXACT windowed quantiles (10th engine): per tumbling
    (window_id, role), the disc-quantiles of utf8 length(text) over the
    on-time stream, plus n_valid/n_rejected — watermark-driven emission
    with the window engine's prefix-wm late rule (batch-boundary
    invariant).

    Exactness at stream scale comes from the HISTOGRAM identity: a
    length column's domain is bounded, so per-shard state is a packed
    (window, role, len) → count array — O(open windows × roles ×
    distinct lengths), never O(rows) — and shard histograms merge at
    the driver by SUMMING counts (quantiles themselves don't merge;
    histograms do). Conv-sharding therefore needs no co-location of a
    window on one shard: each closed cell ships its compact histogram
    and the driver computes the global disc-quantile from the merged
    cumulative counts (exactly DuckDB's quantile_disc: smallest value
    with cum ≥ ceil(q·n), integer arithmetic).

    State layout (all flat sorted int64 arrays, merged per batch with
    one argsort + reduceat — no per-cell Python in ingest):
      _h_key = (wid << 28) | (rcode << 20) | len  → _h_cnt
      _v_key = (wid << 8)  | rcode               → _v_cnt  (valid rows)
    wid is the top field, so CLOSED cells (wid ≤ wm//width − 1) are a
    PREFIX of the sorted arrays — closure is two searchsorted cuts.
    """

    MAX_LEN = (1 << 20) - 1   # pack bound: text length field is 20 bits

    def __init__(self, width_us: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.width = int(width_us)
        self.lateness = int(lateness_us)
        self._roles = pd.Index([], dtype=object)
        self._h_key = np.empty(0, np.int64)
        self._h_cnt = np.empty(0, np.int64)
        self._v_key = np.empty(0, np.int64)
        self._v_cnt = np.empty(0, np.int64)
        self._init_shard_state(
            checkpoint_path, ("quantile", self.width, self.lateness))

    def _core_state(self):
        return (self._roles, self._h_key, self._h_cnt,
                self._v_key, self._v_cnt)

    def _restore_core(self, core) -> None:
        (self._roles, self._h_key, self._h_cnt,
         self._v_key, self._v_cnt) = core

    @staticmethod
    def _merge_sorted(key_state, cnt_state, key_new, cnt_new):
        """Merge (key → count) pairs into the sorted state arrays:
        concat + stable argsort + collapse equal keys with reduceat."""
        k2 = np.concatenate([key_state, key_new])
        c2 = np.concatenate([cnt_state, cnt_new])
        o = np.argsort(k2, kind="stable")
        k2 = k2[o]
        c2 = c2[o]
        first = np.empty(len(k2), bool)
        first[0] = True
        np.not_equal(k2[1:], k2[:-1], out=first[1:])
        idx = np.flatnonzero(first)
        return k2[idx], np.add.reduceat(c2, idx)

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        keep = np.flatnonzero(~late_mask)
        if len(keep):
            # arrow-native decode: dictionary_encode factorizes role in
            # C; utf8_length is one C kernel over the whole batch
            enc = pc.dictionary_encode(
                pc.fill_null(table["role"].combine_chunks(), ""))
            rnames = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            g = self._roles.get_indexer(rnames) if len(rnames) else \
                np.empty(0, np.int64)
            miss = g == -1
            if miss.any():
                start = len(self._roles)
                self._roles = self._roles.append(pd.Index(rnames[miss]))
                g[miss] = np.arange(start, start + int(miss.sum()))
            if len(self._roles) >= (1 << 8):
                raise ValueError("role cardinality exceeds pack bounds")
            rcode = g[enc.indices.to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]]
            lens = pc.fill_null(pc.utf8_length(table["text"]), 0).to_numpy(
                zero_copy_only=False).astype(np.int64)[keep]
            w_k = wid[keep]
            if int(w_k.min()) < 0 or int(w_k.max()) >= (1 << 35):
                raise ValueError("window_id exceeds pack bounds")
            if int(lens.max(initial=0)) > self.MAX_LEN:
                raise ValueError("text length exceeds pack bounds")
            hkey = (w_k << 28) | (rcode << 20) | lens
            u, c = np.unique(hkey, return_counts=True)
            self._h_key, self._h_cnt = self._merge_sorted(
                self._h_key, self._h_cnt, u, c)
            valid = table["valid"].to_numpy(zero_copy_only=False)[keep]
            if valid.any():
                vkey = ((w_k << 8) | rcode)[valid]
                u, c = np.unique(vkey, return_counts=True)
                self._v_key, self._v_cnt = self._merge_sorted(
                    self._v_key, self._v_cnt, u, c)
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _flush_prefix(self, w_bound: int) -> None:
        """Emit every cell with wid ≤ w_bound (a sorted-array prefix).
        Ingest enforces wid < 2^35, so w_bound ≥ 2^35 − 1 means "flush
        everything" — taken literally, the probe (w_bound + 1) << 28
        would exceed int64 (numpy ≥ 2.0 raises OverflowError on the
        oversized Python int; 1.26 happens to accept it)."""
        if w_bound >= (1 << 35) - 1:
            hpos = len(self._h_key)
            vpos = len(self._v_key)
        else:
            hpos = int(np.searchsorted(self._h_key, (w_bound + 1) << 28))
            vpos = int(np.searchsorted(self._v_key, (w_bound + 1) << 8))
        if not hpos:
            return
        vmap = {int(k): int(c) for k, c in
                zip(self._v_key[:vpos], self._v_cnt[:vpos])}
        hk = self._h_key[:hpos]
        hc = self._h_cnt[:hpos]
        cell = hk >> 20                      # (wid << 8) | rcode
        change = np.flatnonzero(cell[1:] != cell[:-1])
        starts = np.concatenate([[0], change + 1])
        ends = np.concatenate([change + 1, [len(hk)]])
        for s, e in zip(starts, ends):
            ck = int(cell[s])
            self.emitted.append({
                "window_id": ck >> 8,
                "role": self._roles[ck & 0xFF],
                "n_valid": vmap.get(ck, 0),
                "vals": (hk[s:e] & 0xFFFFF).astype(np.int64),
                "cnts": hc[s:e].copy()})
        self._h_key = self._h_key[hpos:]
        self._h_cnt = self._h_cnt[hpos:]
        self._v_key = self._v_key[vpos:]
        self._v_cnt = self._v_cnt[vpos:]

    def _emit_closed(self) -> None:
        # closed ⇔ wid·width + width ≤ wm ⇔ wid ≤ wm//width − 1 (floor
        # division is exact for negative wm too)
        self._flush_prefix(self.wm // self.width - 1)

    def finalize(self) -> dict:
        self._flush_prefix((1 << 35) - 1)    # wm → ∞: flush all open cells
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


class SampleShardCore(ShardActorBase):
    """Streaming per-window deterministic BOTTOM-K SAMPLE (11th engine):
    per tumbling window, the k rows with the smallest SQL-computable
    hash (md5-60(conv) XOR bounded Knuth idx mix) under the window
    engine's prefix-wm late rule — the watermark-driven form of
    reservoir sampling, with the reservoir replaced by a mergeable
    bottom-k set so reruns, resumes and any shard count pick the SAME
    rows.

    Mergeability: (h, conv_id, turn_idx) is a TOTAL order over distinct
    turns, so per-shard state can truncate to exactly k rows per open
    window and the driver's merge (bottom-k of the shard bottom-ks) is
    the global bottom-k. At-least-once duplicate arrivals of a (window,
    conv, idx) row are dropped by exact-row dedup inside the merge —
    set semantics, no separate dup-guard state needed.

    Per-batch cost is vectorized: one hash per DISTINCT conv (cached in
    ``_name_h`` for the shard's lifetime alongside the name index), a
    cheap (wid, h)-lexsort bottom-k cut with boundary-tie carry, and
    only the tiny survivor set (≤ open_windows × ~2k rows) pays the
    exact object-key tiebreak sort on conv NAMES (the SQL ORDER BY
    collation — conv codes are shard-local and would misorder the
    2^-60 cross-conv hash ties)."""

    def __init__(self, width_us: int, k: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.width = int(width_us)
        self.k = int(k)
        self.lateness = int(lateness_us)
        self._names = pd.Index([], dtype=object)
        self._name_h = np.empty(0, np.int64)
        self._s_wid = np.empty(0, np.int64)
        self._s_h = np.empty(0, np.int64)
        self._s_code = np.empty(0, np.int64)
        self._s_idx = np.empty(0, np.int64)
        self._init_shard_state(
            checkpoint_path, ("sample", self.width, self.k, self.lateness))

    def _core_state(self):
        return (self._names, self._name_h, self._s_wid, self._s_h,
                self._s_code, self._s_idx)

    def _restore_core(self, core) -> None:
        (self._names, self._name_h, self._s_wid, self._s_h,
         self._s_code, self._s_idx) = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        import hashlib
        if self._skip_replay(table, seq):
            return 0
        ts, idx, bcodes, names, _, _ = self._decode_batch(table)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        keep = np.flatnonzero(~late_mask)
        if len(keep):
            g_of_name = self._map_names(names, idx[keep])
            new_n = len(self._names) - len(self._name_h)
            if new_n:  # md5 once per NEW conv, cached for the shard's life
                fresh = np.fromiter(
                    (int(hashlib.md5(str(c).encode()).hexdigest()[:15], 16)
                     for c in self._names[len(self._name_h):]),
                    dtype=np.int64, count=new_n)
                self._name_h = np.concatenate([self._name_h, fresh])
            g = g_of_name[bcodes[keep]]
            k_arr = idx[keep]
            h = self._name_h[g] ^ (((k_arr % 65536) * 2654435761)
                                   % 4294967296)
            # candidates = state ∪ batch; cheap (wid, h) cut to ≤ k rows
            # per window WITH boundary-h ties carried (exact tiebreak on
            # names happens only on the survivors)
            c_wid = np.concatenate([self._s_wid, wid[keep]])
            c_h = np.concatenate([self._s_h, h])
            c_code = np.concatenate([self._s_code, g])
            c_idx = np.concatenate([self._s_idx, k_arr])
            # exact-row dedup FIRST (at-least-once arrivals): duplicate
            # rows inflate the rank cut below and could evict a
            # legitimate top-k row (caught by the shard-invariance test)
            o = np.lexsort((c_idx, c_code, c_wid))
            c_wid, c_h, c_code, c_idx = c_wid[o], c_h[o], c_code[o], c_idx[o]
            dup0 = np.concatenate([[False],
                                   (c_wid[1:] == c_wid[:-1])
                                   & (c_code[1:] == c_code[:-1])
                                   & (c_idx[1:] == c_idx[:-1])])
            if dup0.any():
                c_wid, c_h, c_code, c_idx = (c_wid[~dup0], c_h[~dup0],
                                             c_code[~dup0], c_idx[~dup0])
            o = np.lexsort((c_h, c_wid))
            c_wid, c_h, c_code, c_idx = c_wid[o], c_h[o], c_code[o], c_idx[o]
            starts = np.flatnonzero(np.concatenate(
                [[True], c_wid[1:] != c_wid[:-1]]))
            rank = np.arange(len(c_wid)) - np.repeat(
                starts, np.diff(np.concatenate([starts, [len(c_wid)]])))
            kth_pos = np.minimum(starts + self.k - 1, np.concatenate(
                [starts[1:], [len(c_wid)]]) - 1)
            kth_h = np.repeat(c_h[kth_pos], np.diff(np.concatenate(
                [starts, [len(c_wid)]])))
            cut = (rank < self.k) | (c_h <= kth_h)
            c_wid, c_h, c_code, c_idx = (c_wid[cut], c_h[cut],
                                         c_code[cut], c_idx[cut])
            # exact-row dedup (at-least-once arrivals) + NAME tiebreak,
            # on the tiny survivor set only
            nm = np.asarray(self._names, dtype=object)[c_code]
            o = np.lexsort((c_idx, nm, c_h, c_wid))
            c_wid, c_h, c_code, c_idx, nm = (c_wid[o], c_h[o], c_code[o],
                                             c_idx[o], nm[o])
            dup = np.concatenate([[False],
                                  (c_wid[1:] == c_wid[:-1])
                                  & (c_code[1:] == c_code[:-1])
                                  & (c_idx[1:] == c_idx[:-1])])
            c_wid, c_h, c_code, c_idx = (c_wid[~dup], c_h[~dup],
                                         c_code[~dup], c_idx[~dup])
            starts = np.flatnonzero(np.concatenate(
                [[True], c_wid[1:] != c_wid[:-1]]))
            rank = np.arange(len(c_wid)) - np.repeat(
                starts, np.diff(np.concatenate([starts, [len(c_wid)]])))
            fin = rank < self.k
            self._s_wid = c_wid[fin]
            self._s_h = c_h[fin]
            self._s_code = c_code[fin]
            self._s_idx = c_idx[fin]
        self._advance_and_commit(cm[-1], seq)
        self._trim_names()
        return table.num_rows

    def _flush_prefix(self, w_bound: int) -> None:
        pos = int(np.searchsorted(self._s_wid, w_bound + 1))
        if not pos:
            return
        names = np.asarray(self._names, dtype=object)[self._s_code[:pos]]
        self.emitted.append({
            "window_id": self._s_wid[:pos].copy(),
            "conv_id": names,
            "turn_idx": self._s_idx[:pos].copy(),
            "h": self._s_h[:pos].copy()})
        self._s_wid = self._s_wid[pos:]
        self._s_h = self._s_h[pos:]
        self._s_code = self._s_code[pos:]
        self._s_idx = self._s_idx[pos:]

    def _emit_closed(self) -> None:
        self._flush_prefix(self.wm // self.width - 1)

    def _trim_names(self) -> None:
        # the hash cache rides the name index; compact both when the
        # index outgrows the live state 4x (the join engine's rule)
        if len(self._names) > max(1024, 4 * len(self._s_code)):
            live = np.unique(self._s_code)
            self._name_h = self._name_h[live]
            (self._s_code,) = self._compact_names([self._s_code])

    def finalize(self) -> dict:
        self._flush_prefix(1 << 62)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


class HllShardCore(ShardActorBase):
    """Streaming WINDOWED HLL cardinality (13th engine): approximate
    distinct conversations per tumbling window with per-shard state
    BOUNDED at m=1024 registers per open window — the scale path next
    to the exact DistinctShardCore (whose per-window conv sets grow
    with cardinality). Registers use the repo's bit-exact md5-60 HLL
    (stages/sketches): the approximation is deterministic, shard
    registers merge by elementwise max at the driver, and the estimate
    (including the linear-counting branch) re-derives exactly in the
    scalar oracle.

    State: sorted packed (wid << 10 | bucket) keys + rho maxima, merged
    per batch with the upsert engine's searchsorted update-max + insert
    fold (no state re-sort). Per-conv hash/bucket/rho are cached for
    the shard's lifetime alongside the name index — md5 runs once per
    distinct conv. Late rule: the window engine's prefix-wm closure."""

    def __init__(self, width_us: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.width = int(width_us)
        self.lateness = int(lateness_us)
        self._names = pd.Index([], dtype=object)
        self._name_b = np.empty(0, np.int64)   # conv → HLL bucket
        self._name_r = np.empty(0, np.int64)   # conv → rho
        self._k = np.empty(0, np.int64)        # (wid << 10) | bucket
        self._rho = np.empty(0, np.int64)
        self._init_shard_state(
            checkpoint_path, ("hll", self.width, self.lateness))

    def _core_state(self):
        return (self._names, self._name_b, self._name_r,
                self._k, self._rho)

    def _restore_core(self, core) -> None:
        (self._names, self._name_b, self._name_r,
         self._k, self._rho) = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts, idx, bcodes, names, _, _ = self._decode_batch(table)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        keep = np.flatnonzero(~late_mask)
        if len(keep):
            g_of_name = self._map_names(names, idx[keep])
            new_n = len(self._names) - len(self._name_b)
            if new_n:
                hs = [md5_60(str(c))
                      for c in self._names[len(self._name_b):]]
                self._name_b = np.concatenate(
                    [self._name_b,
                     np.array([h >> HLL_REM_BITS for h in hs], np.int64)])
                self._name_r = np.concatenate(
                    [self._name_r,
                     np.array([hll_rho(h) for h in hs], np.int64)])
            g = g_of_name[bcodes[keep]]
            w_k = wid[keep]
            if int(w_k.min()) < 0 or int(w_k.max()) >= (1 << 52):
                raise ValueError("window_id exceeds pack bounds")
            pk = (w_k << 10) | self._name_b[g]
            rho = self._name_r[g]
            # batch fold: max rho per packed key (sort, take last)
            o = np.lexsort((rho, pk))
            pk, rho = pk[o], rho[o]
            last = np.concatenate([pk[1:] != pk[:-1], [True]])
            pk, rho = pk[last], rho[last]
            # merge: in-place max for existing registers, insert new
            if len(self._k):
                ins = np.searchsorted(self._k, pk)
                ins_c = np.minimum(ins, len(self._k) - 1)
                exist = self._k[ins_c] == pk
                upd = exist & (rho > self._rho[ins_c])
                if upd.any():
                    self._rho[ins_c[upd]] = rho[upd]
            else:
                ins = np.zeros(len(pk), np.int64)
                exist = np.zeros(len(pk), bool)
            new = ~exist
            if new.any():
                self._k = np.insert(self._k, ins[new], pk[new])
                self._rho = np.insert(self._rho, ins[new], rho[new])
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _flush_prefix(self, w_bound: int) -> None:
        pos = int(np.searchsorted(self._k, (w_bound + 1) << 10))
        if not pos:
            return
        self.emitted.append({"window_id": (self._k[:pos] >> 10),
                             "bucket": (self._k[:pos] & 0x3FF),
                             "rho": self._rho[:pos].copy()})
        self._k = self._k[pos:]
        self._rho = self._rho[pos:]

    def _emit_closed(self) -> None:
        self._flush_prefix(self.wm // self.width - 1)

    def finalize(self) -> dict:
        self._flush_prefix(1 << 52)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


HllShardActor = ray.remote(HllShardCore)


def run_streaming_window_hll(input_path: str, width_us: int,
                             lateness_us: int = 5 * 60 * 1_000_000,
                             n_shards: int = 8,
                             validate_kwargs: dict | None = None,
                             max_pending: int = 4,
                             checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming windowed HLL distinct-conversation estimates.
    → (estimates DataFrame (window_id, est_users), late DataFrame,
    watermarks)."""
    from ..stages.sketches import hll_merge_registers
    meta = {"kind": "hll", "width_us": width_us,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [HllShardActor.remote(
        width_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    blocks = [b for f in finals for b in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    if blocks:
        regs = pd.concat([pd.DataFrame(b) for b in blocks],
                         ignore_index=True)
        out = hll_merge_registers(regs, "window_id")
        out.columns = ["window_id", "est_users"]
    else:
        out = pd.DataFrame(columns=["window_id", "est_users"])
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return out, late_df, [f["watermark"] for f in finals]


class UpsertShardCore(ShardActorBase):
    """Streaming UPSERT / compaction (12th engine) — the KTable /
    compacted-topic face of the reference's own framework (Kafka
    Streams materializes exactly this): maintain the LATEST version per
    key (conv_id, turn_idx) under last-writer-wins by (ts, arrival
    order), discard corrections older than the watermark (route late —
    the "too late to correct" rule), emit the compacted table at
    finalize.

    Versions (at-least-once redeliveries AND genuine corrections with a
    newer ts) fold per batch in ONE pass: lexsort by (key, ts, position)
    and keep the last row per key — arrival position is the tiebreak at
    equal ts, exactly the scalar oracle's replace-if-ts-geq rule. State
    is O(distinct keys), the inherent size of a materialized view
    (unlike the horizon-bounded CEP engines).

    State layout is LOG-STRUCTURED sorted runs with geometric merging
    (the LSM discipline): each micro-batch's folded winners land as a
    new key-sorted run; whenever the newest run is at least as large as
    its predecessor the two merge with the same last-writer-wins fold.
    Amortized O(log K) work per arrival — the previous design's single
    sorted array paid an O(K)-memmove ``np.insert`` per micro-batch and
    was the slowest engine on the 8M bench (round-4 verdict #2).
    Because the arrival ordinal is globally increasing, deferring the
    fold is exact: max-by-(ts, ordinal) per key commutes with run
    merging, so in-place replacement is never needed.

    With ``out_dir`` set, finalize spills the compacted view as the
    shard's parquet file instead of returning the O(K) block to the
    driver (round-4 verdict #1, upsert face)."""

    def __init__(self, lateness_us: int,
                 checkpoint_path: str | None = None,
                 out_dir: str | None = None):
        self.lateness = int(lateness_us)
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self._names = pd.Index([], dtype=object)
        # sorted runs: list of (key, ts, valid, arrival) arrays, each
        # key-sorted and internally LWW-folded (one row per key per run)
        self._runs: list[tuple] = []
        self._arrivals = 0
        cfg = (("upsert", self.lateness) if out_dir is None
               else ("upsert", self.lateness, out_dir))
        self._init_shard_state(checkpoint_path, cfg)

    def _core_state(self):
        return ("runs", self._names, self._runs, self._arrivals)

    def _restore_core(self, core) -> None:
        if len(core) == 4 and isinstance(core[0], str) \
                and core[0] == "runs":
            _, self._names, self._runs, self._arrivals = core
        else:
            # snapshot from the pre-log-structured layout (same config
            # tuple): one key-sorted state array set becomes one run
            names, k, t, v, s, arrivals = core
            self._names = names
            self._runs = [(k, t, v, s)] if len(k) else []
            self._arrivals = arrivals

    @staticmethod
    def _lww_fold(k, t, v, s):
        """One winner per key by max (ts, arrival ordinal); key-sorted
        result. This IS the upsert rule: a later arrival replaces iff
        its ts ≥ the stored ts (ordinals break equal-ts ties toward the
        later arrival)."""
        if not len(k):
            return k, t, v, s
        o = np.lexsort((s, t, k))
        k, t, v, s = k[o], t[o], v[o], s[o]
        last = np.concatenate([k[1:] != k[:-1], [True]])
        return k[last], t[last], v[last], s[last]

    def _append_run(self, k, t, v, s) -> None:
        self._runs.append((k, t, v, s))
        while (len(self._runs) >= 2
               and len(self._runs[-1][0]) >= len(self._runs[-2][0])):
            k2, t2, v2, s2 = self._runs.pop()
            k1, t1, v1, s1 = self._runs.pop()
            self._runs.append(self._lww_fold(
                np.concatenate([k1, k2]), np.concatenate([t1, t2]),
                np.concatenate([v1, v2]), np.concatenate([s1, s2])))

    def _compacted(self):
        """Merge all runs to the materialized view (key-sorted)."""
        if not self._runs:
            return (np.empty(0, np.int64), np.empty(0, np.int64),
                    np.empty(0, bool), np.empty(0, np.int64))
        if len(self._runs) == 1:
            return self._runs[0]
        return self._lww_fold(
            *(np.concatenate([r[i] for r in self._runs])
              for i in range(4)))

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts, idx, bcodes, names, _, _ = self._decode_batch(table)
        cm, prefix_wm = self._prefix_watermark(ts)
        late_m = ts <= prefix_wm
        lsel = np.flatnonzero(late_m)
        if len(lsel):
            self._append_late(
                conv_id=np.asarray(names, dtype=object)[bcodes[lsel]],
                turn_idx=idx[lsel].astype(np.int64),
                ts=ts[lsel].astype(np.int64))
        keep = np.flatnonzero(~late_m)
        if len(keep):
            g_of_name = self._map_names(names, idx[keep])
            g = g_of_name[bcodes[keep]]
            key_b = (g << 34) | idx[keep]
            ts_b = ts[keep]
            valid = table["valid"].to_numpy(zero_copy_only=False)[keep]
            pos_b = self._arrivals + np.arange(len(keep), dtype=np.int64)
            self._arrivals += len(keep)
            # fold the batch to one winner per key, then log-append —
            # no membership probe against state, no O(K) memmove
            self._append_run(*self._lww_fold(key_b, ts_b,
                                             valid.astype(bool), pos_b))
        if int(cm[-1]) > self.wm:
            self.wm = int(cm[-1])
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return table.num_rows

    def finalize(self) -> dict:
        k, t, v, s = self._compacted()
        self._runs = [(k, t, v, s)] if len(k) else []
        hist_emitted, hist_late = self._read_deltas()
        names = np.asarray(self._names, dtype=object)[k >> 34]
        turn_idx = (k & ((1 << 34) - 1)).astype(np.int64)
        if self.out_dir is not None:
            # spill the compacted view — atomic overwrite, so finalize
            # (and a rerun's finalize) is idempotent
            tbl = pa.table({
                "conv_id": pa.array(names, pa.string()),
                "turn_idx": pa.array(turn_idx, pa.int64()),
                "ts": pa.array(t, pa.int64()),
                "valid": pa.array(v, pa.bool_())})
            _atomic_write(tbl, os.path.join(self.out_dir,
                                            "latest.parquet"))
            return {"emitted": hist_emitted,
                    "late": hist_late + self.late,
                    "watermark": self.wm, "state_keys": len(k)}
        block = {"conv_id": names, "turn_idx": turn_idx,
                 "ts": t.copy(), "valid": v.copy()}
        emitted = hist_emitted + ([block] if len(k) else [])
        return {"emitted": emitted, "late": hist_late + self.late,
                "watermark": self.wm, "state_keys": len(k)}


UpsertShardActor = ray.remote(UpsertShardCore)


def run_streaming_upsert(input_path: str,
                         lateness_us: int = 5 * 60 * 1_000_000,
                         n_shards: int = 8,
                         validate_kwargs: dict | None = None,
                         max_pending: int = 4,
                         checkpoint_dir: str | None = None,
                         out_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming upsert / compacted materialized view over the fragment
    stream. → (latest-version view (conv_id, turn_idx, ts, valid),
    late DataFrame, watermarks).

    The view is a driver DataFrame by default; pass ``out_dir`` for the
    SCALE path — each shard spills its compacted slice as
    shard-NNN/latest.parquet at finalize and the view is returned as a
    lazy ``ray.data.Dataset``, so the O(keys) table never lands on the
    driver."""
    import glob as _glob
    meta = {"kind": "upsert", "lateness_us": lateness_us,
            "n_shards": n_shards}
    if out_dir is not None:
        meta["out_dir"] = out_dir
        _guard_out_dir(out_dir, checkpoint_dir, "shard-*/latest.parquet")
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [UpsertShardActor.remote(
        lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None,
        os.path.join(out_dir, f"shard-{s:03d}") if out_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    late = [b for f in finals for b in f["late"]]
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts"])
    wms = [f["watermark"] for f in finals]
    cols = ["conv_id", "turn_idx", "ts", "valid"]
    if out_dir is not None:
        files = sorted(_glob.glob(
            os.path.join(out_dir, "shard-*", "latest.parquet")))
        if files:
            out = ray.data.read_parquet(files)
        else:
            out = ray.data.from_arrow(pa.table(
                {"conv_id": pa.array([], pa.string()),
                 "turn_idx": pa.array([], pa.int64()),
                 "ts": pa.array([], pa.int64()),
                 "valid": pa.array([], pa.bool_())}))
        return out, late_df, wms
    blocks = [b for f in finals for b in f["emitted"]]
    out = (pd.concat([pd.DataFrame(b) for b in blocks], ignore_index=True)
           [cols] if blocks else pd.DataFrame(columns=cols))
    return out, late_df, wms


SampleShardActor = ray.remote(SampleShardCore)


def run_streaming_sample(input_path: str, width_us: int, k: int = 5,
                         lateness_us: int = 5 * 60 * 1_000_000,
                         n_shards: int = 8,
                         validate_kwargs: dict | None = None,
                         max_pending: int = 4,
                         checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming per-window deterministic bottom-k sample.
    → (sample DataFrame (window_id, pos, conv_id, turn_idx, h),
       late DataFrame, watermarks)."""
    meta = {"kind": "sample", "width_us": width_us, "k": k,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [SampleShardActor.remote(
        width_us, k, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    blocks = [b for f in finals for b in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    cols = ["window_id", "pos", "conv_id", "turn_idx", "h"]
    if blocks:
        flat = pd.concat([pd.DataFrame(b) for b in blocks],
                         ignore_index=True)
        flat = flat.sort_values(["window_id", "h", "conv_id", "turn_idx"],
                                kind="stable")
        out = flat.groupby("window_id", sort=True).head(k).reset_index(
            drop=True)
        out["pos"] = (out.groupby("window_id", sort=False).cumcount() + 1
                      ).astype("int64")
        out = out[cols]
    else:
        out = pd.DataFrame(columns=cols)
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return out, late_df, [f["watermark"] for f in finals]


QuantileShardActor = ray.remote(QuantileShardCore)


def run_streaming_quantiles(input_path: str, width_us: int,
                            lateness_us: int = 5 * 60 * 1_000_000,
                            n_shards: int = 8,
                            validate_kwargs: dict | None = None,
                            max_pending: int = 4,
                            checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming exact windowed length-quantiles over the fragment
    stream. Shard cells merge by SUMMING their histograms; the global
    disc-quantile is computed from the merged cumulative counts.
    → (quantiles DataFrame, late DataFrame, watermarks)."""
    from ..stages.windows import quantiles_from_hist
    meta = {"kind": "quantile", "width_us": width_us,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [QuantileShardActor.remote(
        width_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    cells = [c for f in finals for c in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    cols = ["window_id", "role", "n_valid", "n_rejected",
            "p50", "p90", "p99"]
    rows = []
    if cells:
        # merge shard histograms per (window, role): flatten every cell
        # to (wid, role, len, cnt, n_valid) rows, one pandas groupby
        flat = pd.DataFrame({
            "window_id": np.repeat([c["window_id"] for c in cells],
                                   [len(c["vals"]) for c in cells]),
            "role": np.repeat(np.asarray([c["role"] for c in cells],
                                         dtype=object),
                              [len(c["vals"]) for c in cells]),
            "len": np.concatenate([c["vals"] for c in cells]),
            "cnt": np.concatenate([c["cnts"] for c in cells]),
        })
        nv = (pd.DataFrame([(c["window_id"], c["role"], c["n_valid"])
                            for c in cells],
                           columns=["window_id", "role", "n_valid"])
              .groupby(["window_id", "role"], sort=True)["n_valid"].sum())
        merged = (flat.groupby(["window_id", "role", "len"], sort=True)
                  ["cnt"].sum().reset_index())
        for (w, r), grp in merged.groupby(["window_id", "role"], sort=True):
            vals = grp["len"].to_numpy()
            cnts = grp["cnt"].to_numpy()
            total = int(cnts.sum())
            n_valid = int(nv.loc[(w, r)])
            rows.append({"window_id": int(w), "role": r,
                         "n_valid": n_valid, "n_rejected": total - n_valid,
                         **quantiles_from_hist(vals, cnts)})
    out = pd.DataFrame(rows, columns=cols) if rows else \
        pd.DataFrame(columns=cols)
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return out, late_df, [f["watermark"] for f in finals]


def _shard_tables(table: pa.Table, n_shards: int) -> dict[int, pa.Table]:
    """Split one fragment by conv shard. crc32 runs once per DISTINCT
    conv_id — arrow dictionary_encode factorizes in C, so only the
    distinct names cross into Python (to_pylist + object np.unique was
    0.23 s vs 0.06 s per 126k-row fragment, on the prepare hot path of
    every streaming engine)."""
    enc = pc.dictionary_encode(table["conv_id"].combine_chunks())
    inv = enc.indices.to_numpy(zero_copy_only=False)
    uniq = enc.dictionary.to_pylist()
    uniq_shards = np.array([shard_of(c, n_shards) for c in uniq],
                           dtype=np.int64)
    shards = uniq_shards[inv]
    out = {}
    for s in range(n_shards):
        idx = np.flatnonzero(shards == s)
        if len(idx):
            out[s] = table.take(pa.array(idx))
    return out


@ray.remote
def _prepare_fragment(path: str, n_shards: int, validate_kwargs) -> list:
    """Read + validate + shard-split one fragment — the PARALLEL front of
    the stream (the ordered part is only the per-shard ingest). Returns a
    list of n_shards ObjectRefs (None where the shard is empty) so each
    actor later fetches only its own slice. ``validate_kwargs`` arrives as
    a task arg (the driver passes one ray.put ref; Ray auto-resolves).
    NOTE: ``_drop_null_text``/``Validator`` are module-top imports —
    a lazy relative import here re-runs on the worker, where the package
    is not on sys.path when the driver runs from a foreign cwd."""
    validator = Validator(**(validate_kwargs or {}))
    table = pq.read_table(path)
    validated = validator(_drop_null_text(table))
    shards = _shard_tables(validated, n_shards)
    return [ray.put(shards[s]) if s in shards else None for s in range(n_shards)]


# Ray actor wrappers around the plain cores — the cores stay directly
# instantiable for single-process tests (hypothesis drives the state
# machines against the oracle without actor-spawn latency)
WindowShardActor = ray.remote(WindowShardCore)
SessionShardActor = ray.remote(SessionShardCore)
DedupShardActor = ray.remote(DedupShardCore)


def _guard_checkpoint_dir(checkpoint_dir: str | None, config_meta: dict,
                          fragments: list[str] | None) -> None:
    """Prepare a checkpoint dir: clean torn snapshot temps and refuse to
    replay against a dir written under a different config or input set.
    ``fragments=None`` (tail mode): the input set is open-ended, so input
    consistency is enforced by the _fragments.log prefix protocol instead
    of a whole-set sha."""
    if not checkpoint_dir:
        return
    import glob
    import hashlib
    import json
    os.makedirs(checkpoint_dir, exist_ok=True)
    for tmp in glob.glob(os.path.join(checkpoint_dir, "*.tmp-*")):
        os.remove(tmp)  # torn snapshot writes from a previous crash
    meta = dict(config_meta)
    if fragments is not None:
        meta["fragments_sha"] = hashlib.sha256(
            "\n".join(os.path.basename(f) for f in fragments).encode()).hexdigest()
    meta_path = os.path.join(checkpoint_dir, "_meta.json")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            prev = json.load(f)
        if prev != meta:
            raise ValueError(
                f"checkpoint dir {checkpoint_dir} was written by a run "
                f"with different config/inputs ({prev} != {meta}); "
                "replaying against it would corrupt results — delete "
                "the dir or rerun with the original config and input")
    else:
        with open(meta_path, "w") as f:
            json.dump(meta, f)


def _tail_fragment_source(input_path: str, checkpoint_dir: str | None,
                          poll_interval_s: float, idle_timeout_s: float,
                          stop_file: str):
    """Fragment iterator for tail mode honoring the exactly-once replay
    contract: fragments recorded in the checkpoint's ``_fragments.log``
    replay FIRST in logged order (same order ⇒ same seqs ⇒ shards skip
    already-applied micro-batches), then the directory watch continues.
    Each NEW fragment is appended to the log (flush+fsync) BEFORE it is
    fed, so a crash between logging and ingest replays it on resume."""
    from ..sources.stream import tail_fragments
    log_path = (os.path.join(checkpoint_dir, "_fragments.log")
                if checkpoint_dir else None)
    logged: list[str] = []
    if log_path and os.path.exists(log_path):
        with open(log_path) as f:
            logged = [ln.strip() for ln in f if ln.strip()]
        for name in logged:
            frag = os.path.join(input_path, name)
            if not os.path.exists(frag):
                raise ValueError(
                    f"checkpointed fragment {name} missing from "
                    f"{input_path} — replay requires the original "
                    "fragment sequence")
            yield frag
    log_f = open(log_path, "a") if log_path else None
    try:
        for frag in tail_fragments(input_path,
                                   poll_interval_s=poll_interval_s,
                                   idle_timeout_s=idle_timeout_s,
                                   stop_file=stop_file, skip=set(logged)):
            if log_f:
                log_f.write(os.path.basename(frag) + "\n")
                log_f.flush()
                os.fsync(log_f.fileno())
            yield frag
    finally:
        if log_f:
            log_f.close()


def _fragment_source(input_path: str, meta: dict,
                     checkpoint_dir: str | None, tail: bool,
                     poll_interval_s: float, idle_timeout_s: float,
                     stop_file: str):
    """Resolve a runner's fragment feed and guard its checkpoint dir:
    the static sorted listing, or (tail=True) the directory watch with
    the _fragments.log exactly-once replay protocol."""
    if tail:
        meta = dict(meta)
        meta["tail"] = True
        _guard_checkpoint_dir(checkpoint_dir, meta, None)
        return _tail_fragment_source(input_path, checkpoint_dir,
                                     poll_interval_s, idle_timeout_s,
                                     stop_file)
    fragments = list_fragments(input_path)
    _guard_checkpoint_dir(checkpoint_dir, meta, fragments)
    return fragments


def _guard_out_dir(out_dir: str | None, checkpoint_dir: str | None,
                   pattern: str) -> None:
    """Refuse to write into an out_dir that already holds parts unless
    this run resumes from the checkpoint that wrote them (same rule as
    run_streaming_dedup's inline guard): a fresh run pointed at someone
    else's parts would silently interleave two datasets."""
    import glob as _glob
    if out_dir is None:
        return
    resuming = checkpoint_dir is not None and (
        os.path.exists(os.path.join(checkpoint_dir, "_meta.json"))
        or bool(_glob.glob(os.path.join(checkpoint_dir, "*.ckpt*"))))
    if not resuming and _glob.glob(os.path.join(out_dir, pattern)):
        raise ValueError(
            f"out_dir {out_dir} already holds output parts but this run "
            "is not resuming from the checkpoint that wrote them "
            f"(checkpoint_dir={checkpoint_dir!r}); appending would "
            "interleave two datasets — delete the out dir or resume "
            "with the original checkpoint_dir")


def _mixed_rows_df(items: list, columns: list[str]) -> pd.DataFrame:
    """One DataFrame from an order-preserving mixed list of row dicts and
    column BLOCKS (dicts of equal-length numpy arrays): blocks come from
    _append_late and the columnar emitters, row dicts from the bounded
    aggregate paths and pre-upgrade checkpoint deltas."""
    frames: list[pd.DataFrame] = []
    run: list[dict] = []
    for it in items:
        if it and isinstance(next(iter(it.values())), np.ndarray):
            if run:
                frames.append(pd.DataFrame(run))
                run = []
            frames.append(pd.DataFrame(it))
        else:
            run.append(it)
    if run:
        frames.append(pd.DataFrame(run))
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame(columns=columns)
    return pd.concat(frames, ignore_index=True)[columns]


def rows_list(items: list) -> list[dict]:
    """Materialize a mixed rows/blocks list as row dicts (test/debug aid;
    runners go straight to _mixed_rows_df)."""
    out: list[dict] = []
    for it in items:
        if it and isinstance(next(iter(it.values())), np.ndarray):
            keys = list(it)
            for vals in zip(*(it[k].tolist() for k in keys)):
                out.append(dict(zip(keys, vals)))
        else:
            out.append(it)
    return out


def rows_count(items: list) -> int:
    """Row count of a mixed rows/blocks list without materializing."""
    n = 0
    for it in items:
        if it and isinstance(next(iter(it.values())), np.ndarray):
            n += len(next(iter(it.values())))
        else:
            n += 1
    return n


def _pump_fragments(actors: list, fragments, n_shards: int,
                    validate_kwargs: dict | None, max_pending: int) -> list[dict]:
    """The shared driver loop: parallel fragment prepare (read + validate +
    shard split) a bounded window ahead, shard slices forwarded to the
    actors IN FRAGMENT ORDER (deterministic per-shard arrival ⇒
    deterministic watermark evolution), bounded in-flight ingests for
    backpressure. Returns each actor's finalize() dict.

    ``fragments``: a list OR a (possibly blocking) iterator — the tailing
    source yields fragments as they appear; blocking in next() simply
    idles the pump while in-flight work drains."""
    vk_ref = ray.put(validate_kwargs)
    prep_window = max_pending * 4
    preps: list = []   # fragment-ordered queue of _prepare_fragment futures
    pending: list = []  # in-flight ingest futures (backpressure)
    frag_iter = iter(fragments)
    exhausted = False

    def launch_preps():
        nonlocal exhausted
        while not exhausted and len(preps) < prep_window:
            frag = next(frag_iter, None)
            if frag is None:
                exhausted = True
                return
            preps.append(_prepare_fragment.remote(frag, n_shards, vk_ref))

    launch_preps()
    seq = -1
    while preps:
        shard_refs = ray.get(preps.pop(0))  # strict fragment order
        seq += 1
        launch_preps()
        for s, ref in enumerate(shard_refs):
            if ref is not None:
                pending.append(actors[s].ingest.remote(ref, seq))
        # backpressure: cap in-flight ingests; ray.get the drained refs so
        # an errored ingest raises instead of silently undercounting
        while len(pending) > max_pending * n_shards:
            ready, pending = ray.wait(
                pending, num_returns=len(pending) - max_pending * n_shards)
            ray.get(ready)
    ray.get(pending)
    return ray.get([a.finalize.remote() for a in actors])


def run_streaming_window_counts(input_path: str, width_us: int,
                                lateness_us: int, n_shards: int = 8,
                                validate_kwargs: dict | None = None,
                                max_pending: int = 4,
                                slide_us: int | None = None,
                                checkpoint_dir: str | None = None,
                                late_policy: str = "route",
                                tail: bool = False,
                                poll_interval_s: float = 0.25,
                                idle_timeout_s: float = 10.0,
                                stop_file: str = "_EOS"):
    """Stream fragments through validator + shard actors (tumbling, or
    sliding when slide_us divides width_us).

    ``tail=True`` (≙ consuming a LIVE topic): watch the input directory
    and keep feeding fragments as they appear — name order is the offset
    order, enforced by the source. Results are identical to a static run
    over the final fragment set (tested invariant). With a checkpoint
    dir, consumed fragments are logged (_fragments.log) before ingest;
    a resume replays the logged prefix in order, then resumes tailing —
    the same exactly-once convergence as the static path.

    Fragment preparation (read + validate + shard split) runs as PARALLEL
    tasks a bounded window ahead; the driver then forwards each fragment's
    shard slices to the actors IN FRAGMENT ORDER, so per-shard arrival
    order — and therefore watermark evolution — stays deterministic while
    the embarrassingly-parallel work overlaps.

    With ``checkpoint_dir``, each shard snapshots its state (watermark,
    open windows, emitted, late, seq) atomically after every applied
    micro-batch; a rerun with the same dir restores the snapshots and
    REPLAYS the whole fragment sequence — already-applied seqs are skipped,
    so a crash anywhere (including mid-snapshot) converges exactly-once.

    → (window_counts DataFrame, late DataFrame, per-shard watermarks)."""
    meta = {"width_us": width_us, "slide_us": slide_us,
            "lateness_us": lateness_us, "n_shards": n_shards,
            "late_policy": late_policy}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [WindowShardActor.remote(
        width_us, lateness_us, slide_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir else None,
        late_policy)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [row for f in finals for row in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    wc = (pd.DataFrame(emitted) if emitted else
          pd.DataFrame(columns=["window_id", "role", "tool", "n_valid", "n_rejected"]))
    if len(wc):
        # merge shard-level cells (same window key can exist in many shards)
        wc = (wc.groupby(["window_id", "role", "tool"], as_index=False)
              [["n_valid", "n_rejected"]].sum())
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return wc, late_df, [f["watermark"] for f in finals]


class DistinctShardCore(ShardActorBase):
    """Streaming exact COUNT(DISTINCT conv_id) per tumbling window.

    Sharding is hash(conv_id) — a conversation's rows live entirely on
    ONE shard, so per-shard per-window distinct sets are DISJOINT and
    the driver merge simply SUMS shard counts: no set ever crosses the
    wire, and per-shard state is O(open windows × active convs on this
    shard), never O(rows). The same prefix-watermark late rule as
    WindowShardCore (batch-boundary invariant); rows landing in an
    already-closed window route to the late output (they can no longer
    change an emitted count)."""

    def __init__(self, width_us: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.width = width_us
        self.lateness = lateness_us
        self.open: dict[int, set] = {}    # window_id → conv_id set
        self._init_shard_state(checkpoint_path,
                               ("distinct", width_us, lateness_us))

    def _core_state(self):
        return self.open

    def _restore_core(self, core) -> None:
        self.open = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        ok = ~late_mask
        if ok.any():
            convs = table["conv_id"].to_pandas()  # C conversion, no boxing
            pairs = (pd.DataFrame({"wid": wid[ok],
                                   "conv": convs[ok].to_numpy()})
                     .drop_duplicates())
            # O(distinct windows in batch) Python calls, not O(rows)
            for w, grp in pairs.groupby("wid", sort=False)["conv"]:
                self.open.setdefault(int(w), set()).update(grp)
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _emit_closed(self) -> None:
        closed = [w for w in self.open
                  if w * self.width + self.width <= self.wm]
        for w in sorted(closed):
            self.emitted.append({"window_id": w,
                                 "n_convs": len(self.open.pop(w))})

    def finalize(self) -> dict:
        for w in sorted(self.open):
            self.emitted.append({"window_id": w,
                                 "n_convs": len(self.open[w])})
        self.open.clear()
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


DistinctShardActor = ray.remote(DistinctShardCore)


class TopKShardCore(ShardActorBase):
    """Streaming exact windowed top-k heavy hitters: per tumbling window,
    the k conversations with the most turns (ties broken by conv_id
    ascending — fully deterministic).

    EXACTNESS BY PARTITION: conv→shard is a partition, so a shard's
    per-window count for a conv IS its global count. A conv in the
    GLOBAL top-k has < k convs anywhere ranked above it, in particular
    on its own shard — so every global top-k row is inside the union of
    the shards' LOCAL top-k emissions, and the driver merge (sort by
    (n DESC, conv ASC), head k per window) is exact while only
    O(shards × k) rows per window ever cross the wire.

    Per-shard state is O(open windows × active convs on this shard) —
    the same bound as DistinctShardCore's sets (exact heavy hitters
    cannot do better; the bounded-memory APPROXIMATE alternative is a
    SpaceSaving/Misra-Gries summary per window, the published route when
    even per-shard key counts don't fit). Late rule, delta-log
    checkpointing and exactly-once emission are inherited unchanged."""

    def __init__(self, width_us: int, k: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.width = width_us
        self.k = int(k)
        self.lateness = lateness_us
        self.open: dict[int, dict] = {}    # window_id → {conv_id: count}
        self._init_shard_state(checkpoint_path,
                               ("topk", width_us, k, lateness_us))

    def _core_state(self):
        return self.open

    def _restore_core(self, core) -> None:
        self.open = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        ok = ~late_mask
        if ok.any():
            convs = table["conv_id"].to_pandas()  # C conversion, no boxing
            pairs = (pd.DataFrame({"wid": wid[ok],
                                   "conv": convs[ok].to_numpy()})
                     .groupby(["wid", "conv"], sort=False).size())
            # O(distinct (window, conv) pairs in the batch), not O(rows)
            for (w, c), cnt in pairs.items():
                d = self.open.setdefault(int(w), {})
                d[c] = d.get(c, 0) + int(cnt)
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _emit_window(self, w: int) -> None:
        import heapq
        d = self.open.pop(w)
        for c, cnt in heapq.nsmallest(self.k, d.items(),
                                      key=lambda kv: (-kv[1], kv[0])):
            self.emitted.append({"window_id": w, "conv_id": c,
                                 "n": int(cnt)})

    def _emit_closed(self) -> None:
        closed = [w for w in self.open
                  if w * self.width + self.width <= self.wm]
        for w in sorted(closed):
            self._emit_window(w)

    def finalize(self) -> dict:
        for w in sorted(self.open):
            self._emit_window(w)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


TopKShardActor = ray.remote(TopKShardCore)


def mg_merge(counts: dict, add: dict, capacity: int) -> tuple[dict, int]:
    """Misra-Gries summary merge (Agarwal, Cormode, Huang, Phillips,
    Wei, Yi — "Mergeable Summaries", PODS'12, public): sum the two count
    maps; if more than ``capacity`` keys survive, subtract the
    (capacity+1)-th largest count from every key and drop the
    non-positives. Returns (merged, subtracted) — ``subtracted``
    accumulates into the window's error bound: for every key,
    est ≤ true ≤ est + Σ subtracted, and any key with
    true > Σ subtracted is guaranteed present. Deterministic (pure
    arithmetic, no tie-dependent eviction choice)."""
    for c, n in add.items():
        counts[c] = counts.get(c, 0) + n
    if len(counts) <= capacity:
        return counts, 0
    vals = np.fromiter(counts.values(), np.int64, len(counts))
    # (capacity+1)-th largest = the largest count that must go to zero
    thresh = int(np.partition(vals, len(vals) - capacity - 1)
                 [len(vals) - capacity - 1])
    out = {c: n - thresh for c, n in counts.items() if n > thresh}
    return out, thresh


class ApproxTopKShardCore(ShardActorBase):
    """Streaming windowed heavy hitters in BOUNDED memory: per open
    window, a Misra-Gries summary of at most ``capacity`` keys instead
    of TopKShardCore's exact-but-O(active keys) count map — the scale
    path when even one shard's per-window key space doesn't fit.

    Per micro-batch the batch is counted EXACTLY (one vectorized
    groupby), then merged into the window summary with :func:`mg_merge`
    — O(capacity) work per (batch, window), O(capacity) state per open
    window, NEVER O(keys). Guarantee at emission (standard MG bound):
    every estimate is an undercount by at most ``err_bound`` (the
    window's accumulated subtractions, ≤ N_window/capacity), and any
    key whose true count exceeds ``err_bound`` is present. Results are
    deterministic for a given fragment order (the runner pumps
    fragments in order) but — unlike every exact core — DO depend on
    micro-batch slicing; the single-threaded oracle mirrors the same
    fragment stream. Late rule, checkpointing, exactly-once emission
    inherited unchanged."""

    def __init__(self, width_us: int, k: int, capacity: int,
                 lateness_us: int, checkpoint_path: str | None = None):
        if k > capacity:
            raise ValueError(f"k={k} exceeds capacity={capacity}")
        self.width = width_us
        self.k = int(k)
        self.capacity = int(capacity)
        self.lateness = lateness_us
        # window_id → [counts dict, subtracted total]
        self.open: dict[int, list] = {}
        self._init_shard_state(checkpoint_path,
                               ("approx_topk", width_us, k, capacity,
                                lateness_us))

    def _core_state(self):
        return self.open

    def _restore_core(self, core) -> None:
        self.open = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        cm, prefix_wm = self._prefix_watermark(ts)
        wid = ts // self.width
        late_mask = wid * self.width + self.width <= prefix_wm
        self._route_late_rows(table, ts, wid, late_mask)
        ok = ~late_mask
        if ok.any():
            convs = table["conv_id"].to_pandas()
            pairs = (pd.DataFrame({"wid": wid[ok],
                                   "conv": convs[ok].to_numpy()})
                     .groupby(["wid", "conv"], sort=False).size())
            batch_per_wid: dict[int, dict] = {}
            for (w, c), cnt in pairs.items():
                batch_per_wid.setdefault(int(w), {})[c] = int(cnt)
            for w, add in batch_per_wid.items():
                counts, sub = self.open.setdefault(w, [{}, 0])
                counts, s = mg_merge(counts, add, self.capacity)
                self.open[w] = [counts, sub + s]
        self._advance_and_commit(cm[-1], seq)
        return table.num_rows

    def _emit_window(self, w: int) -> None:
        import heapq
        counts, sub = self.open.pop(w)
        for c, cnt in heapq.nsmallest(self.k, counts.items(),
                                      key=lambda kv: (-kv[1], kv[0])):
            self.emitted.append({"window_id": w, "conv_id": c,
                                 "n_est": int(cnt),
                                 "err_bound": int(sub)})

    def _emit_closed(self) -> None:
        closed = [w for w in self.open
                  if w * self.width + self.width <= self.wm]
        for w in sorted(closed):
            self._emit_window(w)

    def finalize(self) -> dict:
        for w in sorted(self.open):
            self._emit_window(w)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm}


ApproxTopKShardActor = ray.remote(ApproxTopKShardCore)


def run_streaming_approx_topk(input_path: str, width_us: int, k: int,
                              capacity: int, lateness_us: int,
                              n_shards: int = 8,
                              validate_kwargs: dict | None = None,
                              max_pending: int = 4,
                              checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Bounded-memory streaming heavy hitters (Misra-Gries summaries per
    open window). → (topk DataFrame [window_id, conv_id, n_est,
    err_bound, rk], late DataFrame, per-shard watermarks). Shard
    summaries are disjoint by conv (conv→shard partition), so the merge
    ranks the union by estimate; each row's true count lies in
    [n_est, n_est + err_bound]."""
    meta = {"kind": "approx_topk", "width_us": width_us, "k": k,
            "capacity": capacity, "lateness_us": lateness_us,
            "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [ApproxTopKShardActor.remote(
        width_us, k, capacity, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt")
        if checkpoint_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [row for f in finals for row in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    if emitted:
        df = (pd.DataFrame(emitted)
              .sort_values(["window_id", "n_est", "conv_id"],
                           ascending=[True, False, True], kind="stable"))
        df = df.groupby("window_id", sort=True).head(k).reset_index(drop=True)
        df["rk"] = df.groupby("window_id", sort=False).cumcount() + 1
    else:
        df = pd.DataFrame(columns=["window_id", "conv_id", "n_est",
                                   "err_bound", "rk"])
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return df, late_df, [f["watermark"] for f in finals]


def merge_topk_partials(emitted: list[dict], k: int) -> pd.DataFrame:
    """Exact global per-window top-k from the shards' local top-k rows
    (disjoint convs ⇒ counts are already global)."""
    if not emitted:
        return pd.DataFrame(columns=["window_id", "conv_id", "n", "rk"])
    return topk_rank(pd.DataFrame(emitted), k)


def run_streaming_topk(input_path: str, width_us: int, k: int,
                       lateness_us: int, n_shards: int = 8,
                       validate_kwargs: dict | None = None,
                       max_pending: int = 4,
                       checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming exact windowed top-k heavy hitters over the fragment
    stream (same prepare/pump/checkpoint discipline as the other
    runners). → (topk DataFrame [window_id, conv_id, n, rk], late
    DataFrame, per-shard watermarks)."""
    meta = {"kind": "topk", "width_us": width_us, "k": k,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [TopKShardActor.remote(
        width_us, k, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt")
        if checkpoint_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [row for f in finals for row in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    topk = merge_topk_partials(emitted, k)
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return topk, late_df, [f["watermark"] for f in finals]


def run_streaming_distinct(input_path: str, width_us: int, lateness_us: int,
                           n_shards: int = 8,
                           validate_kwargs: dict | None = None,
                           max_pending: int = 4,
                           checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming windowed COUNT(DISTINCT conv_id) over the fragment
    stream (same prepare/pump/checkpoint discipline as the window-count
    runner). Shard counts sum exactly because conv→shard is a partition.
    → (counts DataFrame, late DataFrame, per-shard watermarks)."""
    meta = {"kind": "distinct", "width_us": width_us,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [DistinctShardActor.remote(
        width_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt")
        if checkpoint_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [row for f in finals for row in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    dc = (pd.DataFrame(emitted) if emitted else
          pd.DataFrame(columns=["window_id", "n_convs"]))
    if len(dc):
        dc = dc.groupby("window_id", as_index=False)["n_convs"].sum()
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts",
                                   "window_id"])
    return dc, late_df, [f["watermark"] for f in finals]


# ---------------------------------------------------------------- patterns

# role codes for the (A B+ C) row-pattern DFA; 3 = anything else
_PAT_A, _PAT_B, _PAT_C, _PAT_X = 0, 1, 2, 3
_PAT_CODE_OF = {"user": _PAT_A, "tool": _PAT_B, "assistant": _PAT_C}


class PatternShardCore(ShardActorBase):
    """Streaming row-pattern CEP engine: emit every (A B+ C) =
    user → tool+ → assistant match over per-conversation turn order,
    exactly-once, with watermark-driven lateness handling.

    Semantics: within a conversation, turn_idx order IS event-time order
    (the bridge ranks by ts), and pattern elements must be idx-ADJACENT —
    a gap (e.g. a turn the validator's null-text filter dropped) breaks
    both runs and neighbour checks, exactly like the batch kernel
    (stages/patterns.match_abplusc_bucket over the same filtered stream).

    Lateness is the windows engine's row-level prefix-watermark rule:
    a row is LATE iff ts ≤ wm-before-its-arrival (wm = running
    max(ts) − lateness). That rule is batch-slicing-invariant, and it
    PROVABLY implies no accepted row ever lands at-or-below its conv's
    consumed frontier: any consumed row had ts ≤ wm at consumption, so a
    later arrival ordered below it satisfies ts ≤ wm already. Accepted
    rows buffer in shard-global columnar pending arrays; each ingest
    CONSUMES the ts ≤ wm subset in (conv, turn_idx) order through ONE
    vectorized pass (boundary masks — no per-conv Python), with each
    conv's carried DFA state injected as a VIRTUAL head row (its last
    consumed (idx, role)); runs starting on a virtual row take their
    a_ok / length / start from the carry. A match emits when its closing
    C turn is consumed — everything at the frontier is final, so no
    emission is ever retracted and the match SET is independent of
    micro-batch boundaries.

    State is O(active convs + pending rows within the lateness horizon):
    per conv five scalars, plus the pending arrays. Emissions ride the
    ShardActorBase delta-log/snapshot protocol for exactly-once replay.

    Input contract: ts is non-decreasing with turn_idx within a
    conversation (the bridge invariant — turn_idx IS the ts rank); rows
    violating it may be conservatively stale-dropped. Duplicate
    (conv, idx) arrivals are resolved to the (min ts, earliest arrival)
    copy — the slicing-invariant winner — with losers routed to the late
    output marked ts = -1 (watermark drops carry their real ts).
    """

    def __init__(self, lateness_us: int, checkpoint_path: str | None = None):
        self.lateness = lateness_us
        # conv → [last_idx, prev_code, run_len, run_aok, run_start_idx]
        self.frontier: dict = {}
        self._pend = []          # list of (conv, idx, code, ts, seq#) column chunks
        self._arr = 0            # arrival counter (dedup tiebreak)
        self._init_shard_state(checkpoint_path, ("pattern", lateness_us))

    def _core_state(self):
        return (self.frontier, self._pend, self._arr)

    def _restore_core(self, core) -> None:
        self.frontier, self._pend, self._arr = core

    # ---------------------------------------------------------- ingest

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if seq is not None and seq <= self.seq:
            return 0
        n = table.num_rows
        if n:
            ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = table["turn_idx"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            # arrow-native decode (the boxed to_pylist + Series.map
            # prologue was one PyObject per row — see _decode_batch)
            enc = pc.dictionary_encode(table["conv_id"].combine_chunks())
            names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            conv = names[enc.indices.to_numpy(zero_copy_only=False)]
            role = table["role"]
            code = np.full(n, _PAT_X, np.int8)
            for r, pat in _PAT_CODE_OF.items():
                code[pc.equal(role, r).to_numpy(zero_copy_only=False)] = pat

            # row-level prefix watermark (windows-engine rule): late iff
            # ts ≤ wm computed over strictly-prior arrivals
            cand = ts - self.lateness
            cm = np.maximum.accumulate(cand)
            prefix_wm = np.empty(n, dtype=np.int64)
            prefix_wm[0] = self.wm
            if n > 1:
                np.maximum(self.wm, cm[:-1], out=prefix_wm[1:])
            late_m = ts <= prefix_wm
            lsel = np.flatnonzero(late_m)
            if len(lsel):
                self._append_late(
                    conv_id=np.asarray(conv, dtype=object)[lsel],
                    turn_idx=idx[lsel].astype(np.int64),
                    ts=ts[lsel].astype(np.int64))
            keep = ~late_m
            if keep.any():
                arr = np.arange(self._arr, self._arr + int(keep.sum()),
                                dtype=np.int64)
                self._arr += int(keep.sum())
                self._pend.append((conv[keep], idx[keep], code[keep],
                                   ts[keep], arr))
            if int(cm[-1]) > self.wm:
                self.wm = int(cm[-1])
            self._consume(self.wm)
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return n

    # --------------------------------------------------------- consume

    def _consume(self, bound: int) -> None:
        """Drain every pending row with ts ≤ bound through the DFA in
        (conv, turn_idx, arrival) order; retain the rest."""
        if not self._pend:
            return
        conv = np.concatenate([p[0] for p in self._pend])
        idx = np.concatenate([p[1] for p in self._pend])
        code = np.concatenate([p[2] for p in self._pend])
        ts = np.concatenate([p[3] for p in self._pend])
        arr = np.concatenate([p[4] for p in self._pend])
        take = ts <= bound
        if not take.any():
            self._pend = [(conv, idx, code, ts, arr)]
            return
        rest = ~take
        self._pend = ([(conv[rest], idx[rest], code[rest], ts[rest],
                        arr[rest])] if rest.any() else [])
        conv, idx, code, tss, arr = (conv[take], idx[take], code[take],
                                     ts[take], arr[take])
        # factorize convs once: lexsort and segment logic run on int codes
        uconv, cid = np.unique(conv, return_inverse=True)
        # ts before arrival in the tiebreak: among duplicate (conv, idx)
        # copies the MIN-ts copy is the one gradual watermark advance
        # would consume first, so keeping it is what makes the winner
        # independent of micro-batch slicing
        order = np.lexsort((arr, tss, idx, cid))
        cid, idx, code = cid[order], idx[order], code[order]
        # duplicate (conv, idx) arrivals: keep the (min ts, earliest) copy
        dup = np.zeros(len(cid), dtype=bool)
        if len(cid) > 1:
            dup[1:] = (cid[1:] == cid[:-1]) & (idx[1:] == idx[:-1])
        # stale guard: a copy of an ALREADY-CONSUMED (conv, idx) — e.g. a
        # duplicate with an inflated ts arriving after the original's
        # region was finalized — must never re-enter the DFA: it would
        # regress the frontier and could re-emit a match (exactly-once
        # violation). Routed like dup drops, marked ts = -1.
        last = np.full(len(uconv), NEG_INF, dtype=np.int64)
        for u, c in enumerate(uconv):
            st = self.frontier.get(c)
            if st is not None:
                last[u] = st[0]
        drop = dup | (idx <= last[cid])
        if drop.any():
            dsel = np.flatnonzero(drop)
            self._append_late(
                conv_id=np.asarray(uconv, dtype=object)[cid[dsel]],
                turn_idx=idx[dsel].astype(np.int64),
                ts=np.full(len(dsel), -1, dtype=np.int64))
            cid, idx, code = cid[~drop], idx[~drop], code[~drop]
        m = len(cid)
        if m == 0:
            return
        # virtual head row per conv WITH existing state: its last
        # consumed (idx, role) — adjacency and the A-neighbour check then
        # fall out of the uniform mask logic
        seg_first = np.ones(m, dtype=bool)
        seg_first[1:] = cid[1:] != cid[:-1]
        heads = np.flatnonzero(seg_first)
        v_rows = []           # (insert_pos, cid, idx, code)
        carry = {}            # cid → state list (only convs seen before)
        for h in heads:
            st = self.frontier.get(uconv[cid[h]])
            if st is not None:
                carry[int(cid[h])] = st
                v_rows.append((h, cid[h], st[0], st[1]))
        if v_rows:
            pos = np.array([v[0] for v in v_rows], dtype=np.int64)
            cid = np.insert(cid, pos, [v[1] for v in v_rows])
            idx = np.insert(idx, pos, [v[2] for v in v_rows])
            code = np.insert(code, pos, np.array([v[3] for v in v_rows],
                                                 dtype=np.int8))
            virt = np.zeros(len(cid), dtype=bool)
            virt[pos + np.arange(len(pos))] = True
        else:
            virt = np.zeros(m, dtype=bool)
        n2 = len(cid)
        adj = np.zeros(n2, dtype=bool)
        if n2 > 1:
            adj[1:] = (cid[1:] == cid[:-1]) & (idx[1:] == idx[:-1] + 1)
        is_b = code == _PAT_B
        prev_b = np.zeros(n2, dtype=bool)
        prev_b[1:] = is_b[:-1] & adj[1:]
        next_cont = np.zeros(n2, dtype=bool)
        next_cont[:-1] = is_b[1:] & adj[1:]
        starts = np.flatnonzero(is_b & ~prev_b)
        ends = np.flatnonzero(is_b & ~next_cont)
        run_of_end = {}
        if len(starts):
            sm1 = np.maximum(starts - 1, 0)
            aok = (starts > 0) & (code[sm1] == _PAT_A) & adj[starts]
            counts = ends - starts + 1
            estart = idx[starts] - 1
            # runs STARTING on a virtual row resume the carried run
            vsr = np.flatnonzero(virt[starts])
            for r in vsr:
                st = carry[int(cid[starts[r]])]
                aok[r] = st[3]
                counts[r] += st[2] - 1   # virtual row stands in for the
                estart[r] = st[4] - 1    # run's last consumed B
            ep1 = np.minimum(ends + 1, n2 - 1)
            emit = ((ends < n2 - 1) & adj[ep1] & (code[ep1] == _PAT_C)
                    & aok)
            esel = np.flatnonzero(emit)
            if len(esel):
                # columnar: match volume is O(rows) on pattern-dense data
                self.emitted.append({
                    "conv_id": np.asarray(uconv,
                                          dtype=object)[cid[starts[esel]]],
                    "start_idx": estart[esel].astype(np.int64),
                    "end_idx": idx[ends[esel] + 1].astype(np.int64),
                    "n_tool_turns": counts[esel].astype(np.int64)})
            run_of_end = {int(e): r for r, e in enumerate(ends)}
        # refresh per-conv carried state from each segment's LAST row
        seg_last = np.ones(n2, dtype=bool)
        seg_last[:-1] = cid[1:] != cid[:-1]
        for p in np.flatnonzero(seg_last):
            if virt[p]:
                continue  # all of this conv's rows were dup-dropped
            if is_b[p]:
                r = run_of_end[int(p)]
                s = starts[r]
                run_start = (carry[int(cid[p])][4] if virt[s]
                             else int(idx[s]))
                new = [int(idx[p]), int(code[p]), int(counts[r]),
                       bool(aok[r]), run_start]
            else:
                new = [int(idx[p]), int(code[p]), 0, False, -1]
            self.frontier[uconv[cid[p]]] = new

    def finalize(self) -> dict:
        """End of stream: drain ALL pending rows (wm → ∞); open tool-runs
        die unmatched. No checkpoint — terminal flush, replay-idempotent
        (mirrors WindowShardCore.finalize)."""
        self._consume(1 << 62)
        self._pend = []
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm,
                "state_convs": len(self.frontier)}


PatternShardActor = ray.remote(PatternShardCore)


def run_streaming_patterns(input_path: str,
                           lateness_us: int = 5 * 60 * 1_000_000,
                           n_shards: int = 8,
                           validate_kwargs: dict | None = None,
                           max_pending: int = 4,
                           checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming (A B+ C) row-pattern matching over the fragment stream
    (validated, null-text-dropped — the same stream every other CEP
    engine consumes). → (matches DataFrame, late DataFrame, watermarks)."""
    meta = {"kind": "pattern", "lateness_us": lateness_us,
            "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [PatternShardActor.remote(
        lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [b for f in finals for b in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    out = _mixed_rows_df(emitted, ["conv_id", "start_idx", "end_idx",
                                   "n_tool_turns"])
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts"])
    return out, late_df, [f["watermark"] for f in finals]


class FunnelShardCore(ShardActorBase):
    """Streaming ordered-stage conversation FUNNEL (14th engine): per
    conversation, has a user turn; has a tool turn AFTER the first user
    turn; has an assistant turn AFTER that first qualifying tool turn —
    the streaming face of stages/patterns.funnel_bucket_partial,
    exactly-once over the fragment stream.

    Same discipline as PatternShardCore: row-level prefix-watermark
    lateness, shard-global pending buffer, per-ingest consumption of the
    ts ≤ wm subset in (conv, turn_idx, arrival) order, duplicate /
    stale (idx ≤ consumed frontier) drops routed ts = -1. The cascade is
    MONOTONE over idx-ordered consumption, so per-conv carry is just
    (last consumed idx, stage ∈ 0..3): once a stage is attained every
    later row has idx above the attaining turn, so thresholds never
    need re-checking. One vectorized three-reduceat pass per consume —
    no per-conv Python.

    Emission: funnel attainment is a running property, so counts emit at
    finalize only (bounded: 3 rows per shard; convs never split across
    shards ⇒ driver SUMs are exact). State is O(active convs + pending
    rows in the lateness horizon)."""

    def __init__(self, lateness_us: int, checkpoint_path: str | None = None):
        self.lateness = lateness_us
        self.frontier: dict = {}   # conv → [last_idx, stage]
        self._pend = []
        self._arr = 0
        self._init_shard_state(checkpoint_path, ("funnel", lateness_us))

    def _core_state(self):
        return (self.frontier, self._pend, self._arr)

    def _restore_core(self, core) -> None:
        self.frontier, self._pend, self._arr = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if seq is not None and seq <= self.seq:
            return 0
        n = table.num_rows
        if n:
            ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            idx = table["turn_idx"].to_numpy(
                zero_copy_only=False).astype(np.int64)
            enc = pc.dictionary_encode(table["conv_id"].combine_chunks())
            names = np.asarray(enc.dictionary.to_pylist(), dtype=object)
            conv = names[enc.indices.to_numpy(zero_copy_only=False)]
            role = table["role"]
            code = np.full(n, _PAT_X, np.int8)
            for r, pat in _PAT_CODE_OF.items():
                code[pc.equal(role, r).to_numpy(zero_copy_only=False)] = pat

            cand = ts - self.lateness
            cm = np.maximum.accumulate(cand)
            prefix_wm = np.empty(n, dtype=np.int64)
            prefix_wm[0] = self.wm
            if n > 1:
                np.maximum(self.wm, cm[:-1], out=prefix_wm[1:])
            late_m = ts <= prefix_wm
            lsel = np.flatnonzero(late_m)
            if len(lsel):
                self._append_late(
                    conv_id=np.asarray(conv, dtype=object)[lsel],
                    turn_idx=idx[lsel].astype(np.int64),
                    ts=ts[lsel].astype(np.int64))
            keep = ~late_m
            if keep.any():
                arr = np.arange(self._arr, self._arr + int(keep.sum()),
                                dtype=np.int64)
                self._arr += int(keep.sum())
                self._pend.append((conv[keep], idx[keep], code[keep],
                                   ts[keep], arr))
            if int(cm[-1]) > self.wm:
                self.wm = int(cm[-1])
            self._consume(self.wm)
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return n

    def _consume(self, bound: int) -> None:
        if not self._pend:
            return
        conv = np.concatenate([p[0] for p in self._pend])
        idx = np.concatenate([p[1] for p in self._pend])
        code = np.concatenate([p[2] for p in self._pend])
        ts = np.concatenate([p[3] for p in self._pend])
        arr = np.concatenate([p[4] for p in self._pend])
        take = ts <= bound
        if not take.any():
            self._pend = [(conv, idx, code, ts, arr)]
            return
        rest = ~take
        self._pend = ([(conv[rest], idx[rest], code[rest], ts[rest],
                        arr[rest])] if rest.any() else [])
        conv, idx, code, tss, arr = (conv[take], idx[take], code[take],
                                     ts[take], arr[take])
        uconv, cid = np.unique(conv, return_inverse=True)
        order = np.lexsort((arr, tss, idx, cid))
        cid, idx, code = cid[order], idx[order], code[order]
        dup = np.zeros(len(cid), dtype=bool)
        if len(cid) > 1:
            dup[1:] = (cid[1:] == cid[:-1]) & (idx[1:] == idx[:-1])
        last = np.full(len(uconv), NEG_INF, dtype=np.int64)
        s0 = np.zeros(len(uconv), dtype=np.int64)
        for u, c in enumerate(uconv):
            st = self.frontier.get(c)
            if st is not None:
                last[u] = st[0]
                s0[u] = st[1]
        drop = dup | (idx <= last[cid])
        if drop.any():
            dsel = np.flatnonzero(drop)
            self._append_late(
                conv_id=np.asarray(uconv, dtype=object)[cid[dsel]],
                turn_idx=idx[dsel].astype(np.int64),
                ts=np.full(len(dsel), -1, dtype=np.int64))
            cid, idx, code = cid[~drop], idx[~drop], code[~drop]
        m = len(cid)
        if m == 0:
            return
        seg_first = np.ones(m, dtype=bool)
        seg_first[1:] = cid[1:] != cid[:-1]
        seg_starts = np.flatnonzero(seg_first)
        seg_id = np.cumsum(seg_first) - 1
        seg_conv = cid[seg_starts]          # uconv index per segment
        s0_seg = s0[seg_conv]
        pos = np.arange(m, dtype=np.int64)

        def first_pos(mask: np.ndarray) -> np.ndarray:
            return np.minimum.reduceat(np.where(mask, pos, m), seg_starts)

        # stage thresholds: attained-before ⇒ threshold -1 (all rows in
        # this consume are above the frontier, hence above the attaining
        # turn); not-attained ⇒ sentinel m (pos > m never true)
        u = first_pos(code == _PAT_A)
        u_eff = np.where(s0_seg >= 1, np.int64(-1), u)
        t = first_pos((code == _PAT_B) & (pos > u_eff[seg_id]))
        t_eff = np.where(s0_seg >= 2, np.int64(-1), t)
        a = first_pos((code == _PAT_C) & (pos > t_eff[seg_id]))
        new_stage = np.where(
            (s0_seg >= 3) | (a < m), 3,
            np.where((s0_seg >= 2) | (t < m), 2,
                     np.where((s0_seg >= 1) | (u < m), 1, 0)))
        # per-segment last consumed idx
        seg_end = np.r_[seg_starts[1:], m] - 1
        last_idx = idx[seg_end]
        for k in range(len(seg_starts)):
            self.frontier[uconv[seg_conv[k]]] = [int(last_idx[k]),
                                                 int(new_stage[k])]

    def finalize(self) -> dict:
        """Drain all pending rows (wm → ∞), then emit the bounded funnel
        counts: n_convs whose final stage ≥ s for s in 1..3."""
        self._consume(1 << 62)
        self._pend = []
        stages = np.fromiter((st[1] for st in self.frontier.values()),
                             dtype=np.int64, count=len(self.frontier))
        self.emitted.append({"stage": np.array([1, 2, 3], np.int64),
                             "n_convs": np.array(
                                 [(stages >= s).sum() for s in (1, 2, 3)],
                                 np.int64)})
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm,
                "state_convs": len(self.frontier)}


FunnelShardActor = ray.remote(FunnelShardCore)


def run_streaming_funnel(input_path: str,
                         lateness_us: int = 5 * 60 * 1_000_000,
                         n_shards: int = 8,
                         validate_kwargs: dict | None = None,
                         max_pending: int = 4,
                         checkpoint_dir: str | None = None,
                         tail: bool = False,
                         poll_interval_s: float = 0.25,
                         idle_timeout_s: float = 10.0,
                         stop_file: str = "_EOS"):
    """Streaming ordered-stage funnel over the fragment stream (the same
    validated stream every CEP engine consumes). → (funnel DataFrame
    (stage, n_convs), late DataFrame, watermarks). Conversations never
    split across shards, so summing shard counts is exact."""
    meta = {"kind": "funnel", "lateness_us": lateness_us,
            "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [FunnelShardActor.remote(
        lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = _mixed_rows_df([b for f in finals for b in f["emitted"]],
                             ["stage", "n_convs"])
    out = (emitted.groupby("stage", sort=True)["n_convs"].sum()
           .reset_index().astype({"stage": "int64", "n_convs": "int64"}))
    late_df = _mixed_rows_df([b for f in finals for b in f["late"]],
                             ["conv_id", "turn_idx", "ts"])
    return out, late_df, [f["watermark"] for f in finals]


def _range_exists(d_code: np.ndarray, d_ts: np.ndarray,
                  q_code: np.ndarray, q_t: np.ndarray,
                  window: int) -> np.ndarray:
    """For each query (code, t): does a data entry with the same code and
    ts in (t, t + window] exist? Data sorted by (code, ts); queries in
    any order. ONE vectorized searchsorted pair via compact-code +
    offset packing (data restricted to the queried codes keeps the pack
    small); falls back to a per-query bisect when the packed key would
    overflow int64 (pathological ts span only)."""
    n_q = len(q_code)
    out = np.zeros(n_q, bool)
    if n_q == 0 or len(d_code) == 0:
        return out
    un = np.unique(q_code)
    lo_c = np.searchsorted(d_code, un, side="left")
    hi_c = np.searchsorted(d_code, un, side="right")
    lens = hi_c - lo_c
    total = int(lens.sum())
    if total == 0:
        return out
    starts = np.repeat(lo_c, lens)
    offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    sub_ts = d_ts[starts + offs]
    sub_cc = np.repeat(np.arange(len(un)), lens)
    qc = np.searchsorted(un, q_code)
    base = int(min(sub_ts.min(), q_t.min()))
    top = int(max(int(sub_ts.max()), int(q_t.max()) + window))
    span = top - base + 2
    if len(un) * span >= (1 << 62):
        for i in range(n_q):
            seg = d_ts[lo_c[qc[i]]:hi_c[qc[i]]]   # O(1) slice per query
            lo = np.searchsorted(seg, q_t[i], side="right")
            hi = np.searchsorted(seg, q_t[i] + window, side="right")
            out[i] = lo < hi
        return out
    pk = sub_cc * span + (sub_ts - base)
    lo = np.searchsorted(pk, qc * span + (q_t - base), side="right")
    hi = np.searchsorted(pk, qc * span + (q_t + window - base),
                         side="right")
    return lo < hi


class AbsenceShardCore(ShardActorBase):
    """Streaming ABSENCE / timeout CEP (the `A not followed by B within
    W` face — Flink CEP's notFollowedBy().within()): emit every user
    turn with NO assistant turn in the same conversation within
    (ts, ts + window_us], exactly-once, watermark-driven.

    Late rule: the windows-engine row-level prefix watermark — late rows
    route to the late output and neither open nor answer timeouts.

    Emission rule: a pending user turn (conv, idx, t) emits as ABSENT
    when wm ≥ t + window. Final and slicing-invariant: a future
    non-late row has ts > wm ≥ t + window, so it can never land in the
    answer window (t, t + window]; an answering assistant inside the
    current batch is applied before the end-of-batch expiry; and a
    mid-batch split cannot add an expiry a whole batch would not
    perform — expiry depends only on wm, and any post-split answer
    would need ta ≤ t + window ≤ wm while being non-late (ta > wm).

    Answer rule is EXISTENCE-based (an assistant answers every pending
    user turn with ta − window ≤ t < ta; it is not consumed). New user
    turns must also see PAST assistants, so assistant timestamps with
    ta > wm are retained — trimming at wm is lossless: an assistant
    with ta ≤ wm could only answer a user turn with t < ta ≤ wm, which
    the late rule drops on arrival.

    Duplicate user-turn arrivals (the stream's at-least-once fragments)
    keep the FIRST copy — later copies route late with ts = −1, like
    the pattern engine. The seen-idx dup guard holds only entries with
    ts > wm: an at-least-once duplicate carries the SAME ts as its
    original, so once wm passes that ts the late rule itself rejects
    any further copy and the entry is evicted (state stays bounded by
    the lateness horizon, not stream life — the dedup engine's TTL
    idea). A dup with an INFLATED ts is out of the at-least-once
    contract (the pattern engine documents the same boundary).
    """

    def __init__(self, window_us: int, lateness_us: int,
                 checkpoint_path: str | None = None):
        self.window = int(window_us)
        self.lateness = int(lateness_us)
        # COLUMNAR state (r4: the per-conv dict/segment design ran a
        # Python loop body per conv per batch — ~600k tiny segments per
        # shard on the 8M bench — capping the engine at ~0.7M turns/s;
        # every structure below is a flat numpy array so each ingest is
        # a fixed number of vectorized kernels regardless of conv count):
        #   _names: conv_id → dense gcode (position in the Index)
        #   assist (ts > wm), sorted by (gcode, ts)
        #   seen dup-guard (ts > wm), sorted by packed (gcode<<34 | idx)
        #   pending unanswered user turns, insertion order (no sort
        #   needed: answer-removal and expiry are per-entry predicates)
        self._names = pd.Index([], dtype=object)
        self._a_code = np.empty(0, np.int64)
        self._a_ts = np.empty(0, np.int64)
        self._s_key = np.empty(0, np.int64)
        self._s_ts = np.empty(0, np.int64)
        self._p_code = np.empty(0, np.int64)
        self._p_idx = np.empty(0, np.int64)
        self._p_ts = np.empty(0, np.int64)
        self._p_dl = np.empty(0, np.int64)
        self._init_shard_state(
            checkpoint_path, ("absence", self.window, self.lateness))

    def _core_state(self):
        return (self._names, self._a_code, self._a_ts, self._s_key,
                self._s_ts, self._p_code, self._p_idx, self._p_ts,
                self._p_dl)

    def _restore_core(self, core) -> None:
        (self._names, self._a_code, self._a_ts, self._s_key, self._s_ts,
         self._p_code, self._p_idx, self._p_ts, self._p_dl) = core

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts, idx, bcodes, names, is_u_all, is_a_all = \
            self._decode_batch(table)
        cm, prefix_wm = self._prefix_watermark(ts)
        late_m = ts <= prefix_wm
        lsel = np.flatnonzero(late_m)
        if len(lsel):
            self._append_late(
                conv_id=np.asarray(names, dtype=object)[bcodes[lsel]],
                turn_idx=idx[lsel].astype(np.int64),
                ts=ts[lsel].astype(np.int64))
        keep = ~late_m
        u_rows = np.flatnonzero(keep & is_u_all)
        a_rows = np.flatnonzero(keep & is_a_all)

        # dense conv codes: arrow dictionary-encode factorized the batch
        # in C; vectorized lookup against the persistent name index,
        # append only the new names (bounds validated in _map_names)
        g_of_name = self._map_names(names, idx[u_rows])
        u_g = g_of_name[bcodes[u_rows]]
        a_g = g_of_name[bcodes[a_rows]]

        # assistants: ONE lexsort by (gcode, ts), then a single merge
        # into the state arrays (which share that sort order)
        a_ts_b = ts[a_rows]
        if len(a_rows):
            o = np.lexsort((a_ts_b, a_g))
            a_g = a_g[o]
            a_ts_b = a_ts_b[o]
            code2 = np.concatenate([self._a_code, a_g])
            ts2 = np.concatenate([self._a_ts, a_ts_b])
            o2 = np.lexsort((ts2, code2))
            self._a_code = code2[o2]
            self._a_ts = ts2[o2]

        # users: batch-global first-occurrence dup mask + ONE exact
        # searchsorted membership probe against the seen-guard keys
        k_arr = idx[u_rows]
        t_arr = ts[u_rows]
        if len(u_rows):
            q_key = (u_g << 34) | k_arr
            dup_m = np.ones(len(u_rows), bool)
            dup_m[np.unique(q_key, return_index=True)[1]] = False
            if len(self._s_key):
                pos = np.searchsorted(self._s_key, q_key)
                pos_c = np.minimum(pos, len(self._s_key) - 1)
                dup_m |= self._s_key[pos_c] == q_key
            dsel = np.flatnonzero(dup_m)   # at-least-once dups: keep 1st
            if len(dsel):
                self._append_late(
                    conv_id=np.asarray(names,
                                       dtype=object)[bcodes[u_rows[dsel]]],
                    turn_idx=k_arr[dsel].astype(np.int64),
                    ts=np.full(len(dsel), -1, dtype=np.int64))
            new_m = ~dup_m
            if new_m.any():
                g_new = u_g[new_m]
                k_new = k_arr[new_m]
                t_new = t_arr[new_m]
                key_new = q_key[new_m]
                o = np.argsort(key_new)
                ins = np.searchsorted(self._s_key, key_new[o])
                self._s_key = np.insert(self._s_key, ins, key_new[o])
                self._s_ts = np.insert(self._s_ts, ins, t_new[o])
                # unanswered at arrival (vs merged assist ⊇ this batch's
                # assistants) → open a pending timer
                open_m = ~_range_exists(self._a_code, self._a_ts,
                                        g_new, t_new, self.window)
                if open_m.any():
                    self._p_code = np.concatenate(
                        [self._p_code, g_new[open_m]])
                    self._p_idx = np.concatenate(
                        [self._p_idx, k_new[open_m]])
                    self._p_ts = np.concatenate([self._p_ts, t_new[open_m]])
                    self._p_dl = np.concatenate(
                        [self._p_dl, t_new[open_m] + self.window])

        # new assistants answer EXISTING pending turns (one vectorized
        # range-exists over all pending entries; entries inserted above
        # were already checked against the merged assist state)
        if len(a_rows) and len(self._p_code):
            answered = _range_exists(a_g, a_ts_b, self._p_code, self._p_ts,
                                     self.window)
            if answered.any():
                keep_p = ~answered
                self._p_code = self._p_code[keep_p]
                self._p_idx = self._p_idx[keep_p]
                self._p_ts = self._p_ts[keep_p]
                self._p_dl = self._p_dl[keep_p]

        if int(cm[-1]) > self.wm:
            self.wm = int(cm[-1])
        self._expire(self.wm)
        self._trim(self.wm)
        if seq is not None:
            self.seq = seq
            self._checkpoint()
        return table.num_rows

    def _expire(self, bound: int) -> None:
        if not len(self._p_dl):
            return
        m = self._p_dl <= bound
        if not m.any():
            return
        # columnar: timeout volume is O(convs) on absence-heavy streams
        self.emitted.append({
            "conv_id": np.asarray(self._names[self._p_code[m]],
                                  dtype=object),
            "turn_idx": self._p_idx[m].astype(np.int64),
            "ts": self._p_ts[m].astype(np.int64),
            "deadline": self._p_dl[m].astype(np.int64)})
        keep = ~m
        self._p_code = self._p_code[keep]
        self._p_idx = self._p_idx[keep]
        self._p_ts = self._p_ts[keep]
        self._p_dl = self._p_dl[keep]

    def _trim(self, bound: int) -> None:
        # assist horizon trim: compaction preserves the (gcode, ts) sort
        if len(self._a_ts):
            m = self._a_ts > bound
            if not m.all():
                self._a_code = self._a_code[m]
                self._a_ts = self._a_ts[m]
        # dup-guard eviction: once wm passes an entry's ts, any further
        # true copy (same ts) is wm-late-routed BEFORE the seen check,
        # so the entry is dead weight — state stays bounded by the
        # lateness horizon, not stream life (review finding)
        if len(self._s_ts):
            m = self._s_ts > bound
            if not m.all():
                self._s_key = self._s_key[m]
                self._s_ts = self._s_ts[m]
        # name-index compaction (quiet convs' ids otherwise accumulate
        # for stream life); the rank remap is monotone — sort orders of
        # the assist arrays and the packed guard keys are preserved
        live = len(self._a_code) + len(self._s_key) + len(self._p_code)
        if len(self._names) > max(1024, 4 * live):
            lo = self._s_key & ((1 << 34) - 1)
            a2, s2, p2 = self._compact_names(
                [self._a_code, self._s_key >> 34, self._p_code])
            self._a_code = a2
            self._s_key = (s2 << 34) | lo
            self._p_code = p2

    def finalize(self) -> dict:
        """End of stream: every still-pending user turn's window closes
        unanswered (wm → ∞) — finalize ≡ the batch absence query."""
        self._expire(1 << 62)
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm,
                "state_convs": len(self._names)}


AbsenceShardActor = ray.remote(AbsenceShardCore)


def _range_pairs(d_code: np.ndarray, d_ts: np.ndarray,
                 q_code: np.ndarray, q_lo: np.ndarray, q_hi: np.ndarray,
                 lo_side: str, hi_side: str):
    """(q_indices, d_indices) of every (query, data) pair with equal code
    and d_ts inside the query's [q_lo, q_hi] bounds under the given
    searchsorted sides (e.g. lo_side="right", hi_side="right" means
    q_lo < d_ts ≤ q_hi). Data sorted by (code, ts); queries any order.
    The pair-EXPANDING sibling of :func:`_range_exists` — same compact-
    code offset packing, same bisect fallback on pathological spans.
    Output size is the true pair count (never materializes a cross
    product)."""
    n_q = len(q_code)
    none = (np.empty(0, np.int64), np.empty(0, np.int64))
    if n_q == 0 or len(d_code) == 0:
        return none
    un = np.unique(q_code)
    lo_c = np.searchsorted(d_code, un, side="left")
    hi_c = np.searchsorted(d_code, un, side="right")
    lens = hi_c - lo_c
    total = int(lens.sum())
    if total == 0:
        return none
    starts = np.repeat(lo_c, lens)
    offs = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
    sub_idx = starts + offs          # global data indices, (code, ts)-sorted
    sub_ts = d_ts[sub_idx]
    sub_cc = np.repeat(np.arange(len(un)), lens)
    qc = np.searchsorted(un, q_code)
    base = int(min(int(sub_ts.min()), int(q_lo.min())))
    top = int(max(int(sub_ts.max()), int(q_hi.max())))
    span = top - base + 2
    if len(un) * span >= (1 << 62):
        out_q, out_d = [], []
        for i in range(n_q):
            l0, h0 = lo_c[qc[i]], hi_c[qc[i]]
            seg = d_ts[l0:h0]
            lo = np.searchsorted(seg, q_lo[i], side=lo_side)
            hi = np.searchsorted(seg, q_hi[i], side=hi_side)
            if hi > lo:
                out_d.append(np.arange(l0 + lo, l0 + hi))
                out_q.append(np.full(hi - lo, i, np.int64))
        if not out_q:
            return none
        return np.concatenate(out_q), np.concatenate(out_d)
    pk = sub_cc * span + (sub_ts - base)
    lo = np.searchsorted(pk, qc * span + (q_lo - base), side=lo_side)
    hi = np.searchsorted(pk, qc * span + (q_hi - base), side=hi_side)
    counts = hi - lo
    tot_p = int(counts.sum())
    if tot_p == 0:
        return none
    q_rep = np.repeat(np.arange(n_q, dtype=np.int64), counts)
    d_pos = (np.arange(tot_p) - np.repeat(np.cumsum(counts) - counts, counts)
             + np.repeat(lo, counts))
    return q_rep, sub_idx[d_pos]


class JoinShardCore(ShardActorBase):
    """Streaming stream-stream INTERVAL JOIN (Flink's intervalJoin /
    Kafka Streams' windowed stream-stream join face): emit every
    (user turn, assistant turn) pair of the same conversation with
    0 < a_ts − u_ts ≤ window_us, exactly-once, watermark-driven — the
    pairing complement of the absence engine (join ∪ absence covers
    every kept user turn exactly once).

    Emission rule (symmetric hash join): a pair emits when its LATER
    side is applied. Each micro-batch runs three disjoint vectorized
    passes — new users × retained assistants, new assistants × retained
    users, and new users × this batch's new assistants — so no pair can
    emit twice and a mid-batch split only moves rows between the
    "state" and "in-batch" sides of the passes (slicing-invariant).

    Late rule: the row-level prefix watermark shared by every engine —
    late rows route to the late output and join nothing.

    Retention is the lossless horizon trim: users with
    u_ts > wm − window (a future non-late assistant has a_ts > wm and
    needs u_ts ≥ a_ts − window), assistants with a_ts > wm (a future
    non-late user has u_ts > wm and needs a_ts > u_ts).

    Duplicates (at-least-once fragments) keep the FIRST copy per
    (conv, turn_idx) across BOTH roles, in arrival order; later copies
    route late with ts = −1. Unlike the absence engine — where a
    duplicate assistant is harmless because answers are existence-based
    — the join MUST dedup assistants too, or each copy would re-emit
    its pairs. The guard entry evicts once wm passes its ts (any further
    true copy is wm-late-routed before the guard is consulted).

    State is columnar throughout (flat numpy arrays, vectorized kernels
    per batch — the absence engine's round-4 design): per-side
    (code, idx, ts) sorted by (code, ts), plus the packed dup-guard.

    Output scale: a join emits O(pairs) rows — half the input volume on
    the 8M bench — so with ``out_dir`` set, each micro-batch's pairs are
    SPILLED as the shard's (shard, seq)-deterministic parquet part
    (DedupShardCore's write→fsync→rename discipline) instead of
    accumulating in actor memory and being pd.concat'd on the driver;
    actor pair memory is then bounded by one micro-batch and the driver
    holds only paths (round-4 verdict #1).
    """

    _PAIR_COLS = ("conv_id", "u_idx", "a_idx", "u_ts", "a_ts", "gap_us")

    def __init__(self, window_us: int, lateness_us: int,
                 checkpoint_path: str | None = None,
                 out_dir: str | None = None):
        self.window = int(window_us)
        self.lateness = int(lateness_us)
        self.out_dir = out_dir
        if out_dir:
            os.makedirs(out_dir, exist_ok=True)
        self._names = pd.Index([], dtype=object)
        self._u_code = np.empty(0, np.int64)
        self._u_idx = np.empty(0, np.int64)
        self._u_ts = np.empty(0, np.int64)
        self._a_code = np.empty(0, np.int64)
        self._a_idx = np.empty(0, np.int64)
        self._a_ts = np.empty(0, np.int64)
        self._s_key = np.empty(0, np.int64)
        self._s_ts = np.empty(0, np.int64)
        # out_dir joins the guarded config (dedup's rule): resuming into
        # a DIFFERENT output dir would skip applied seqs whose parts
        # live elsewhere. Kept out of the tuple when unset so existing
        # in-memory-mode checkpoints stay valid.
        cfg = (("sjoin", self.window, self.lateness) if out_dir is None
               else ("sjoin", self.window, self.lateness, out_dir))
        self._init_shard_state(checkpoint_path, cfg)

    def _core_state(self):
        return (self._names, self._u_code, self._u_idx, self._u_ts,
                self._a_code, self._a_idx, self._a_ts,
                self._s_key, self._s_ts)

    def _restore_core(self, core) -> None:
        (self._names, self._u_code, self._u_idx, self._u_ts,
         self._a_code, self._a_idx, self._a_ts,
         self._s_key, self._s_ts) = core

    def _emit_pairs(self, code: np.ndarray, u_idx: np.ndarray,
                    u_ts: np.ndarray, a_idx: np.ndarray,
                    a_ts: np.ndarray) -> None:
        # COLUMNAR emission: joins emit O(pairs) rows (3.8M on the 8M
        # bench — half the input volume), so each pass appends ONE block
        # of arrays; per-pair dict rows measured 4-5x slower end-to-end.
        # self.emitted here is a list of column BLOCKS, not row dicts —
        # run_streaming_join concatenates them.
        if not len(code):
            return
        self.emitted.append({
            "conv_id": np.asarray(self._names[code], dtype=object),
            "u_idx": u_idx.astype(np.int64), "a_idx": a_idx.astype(np.int64),
            "u_ts": u_ts.astype(np.int64), "a_ts": a_ts.astype(np.int64),
            "gap_us": (a_ts - u_ts).astype(np.int64)})

    def ingest(self, table: pa.Table, seq: int | None = None) -> int:
        if self._skip_replay(table, seq):
            return 0
        ts, idx, bcodes, names, is_u_all, is_a_all = \
            self._decode_batch(table)
        cm, prefix_wm = self._prefix_watermark(ts)
        late_m = ts <= prefix_wm
        lsel = np.flatnonzero(late_m)
        if len(lsel):
            self._append_late(
                conv_id=np.asarray(names, dtype=object)[bcodes[lsel]],
                turn_idx=idx[lsel].astype(np.int64),
                ts=ts[lsel].astype(np.int64))
        keep = ~late_m
        # sel ascending = ARRIVAL order, so keep-first dup semantics are
        # exactly the scalar oracle's regardless of role interleaving
        sel = np.flatnonzero(keep & (is_u_all | is_a_all))
        is_u = is_u_all[sel]
        g_of_name = self._map_names(names, idx[sel])
        g_sel = g_of_name[bcodes[sel]]
        k_sel = idx[sel]
        t_sel = ts[sel]

        if len(sel):
            q_key = (g_sel << 34) | k_sel
            dup_m = np.ones(len(sel), bool)
            dup_m[np.unique(q_key, return_index=True)[1]] = False
            if len(self._s_key):
                pos = np.searchsorted(self._s_key, q_key)
                pos_c = np.minimum(pos, len(self._s_key) - 1)
                dup_m |= self._s_key[pos_c] == q_key
            dsel = np.flatnonzero(dup_m)
            if len(dsel):
                self._append_late(
                    conv_id=np.asarray(names,
                                       dtype=object)[bcodes[sel[dsel]]],
                    turn_idx=k_sel[dsel].astype(np.int64),
                    ts=np.full(len(dsel), -1, dtype=np.int64))
            new_m = ~dup_m
            if new_m.any():
                key_new = q_key[new_m]
                o = np.argsort(key_new)
                ins = np.searchsorted(self._s_key, key_new[o])
                self._s_key = np.insert(self._s_key, ins, key_new[o])
                self._s_ts = np.insert(self._s_ts, ins, t_sel[new_m][o])

                W = self.window
                un_m = new_m & is_u
                an_m = new_m & ~is_u
                ug, uk, ut = g_sel[un_m], k_sel[un_m], t_sel[un_m]
                ag, ak, at = g_sel[an_m], k_sel[an_m], t_sel[an_m]
                oa = np.lexsort((at, ag))
                ag, ak, at = ag[oa], ak[oa], at[oa]

                # pass A: new users × RETAINED assistants, a ∈ (u, u+W]
                q, d = _range_pairs(self._a_code, self._a_ts,
                                    ug, ut, ut + W, "right", "right")
                self._emit_pairs(ug[q], uk[q], ut[q],
                                 self._a_idx[d], self._a_ts[d])
                # pass B: new assistants × RETAINED users, u ∈ [a−W, a)
                q, d = _range_pairs(self._u_code, self._u_ts,
                                    ag, at - W, at, "left", "left")
                self._emit_pairs(ag[q], self._u_idx[d], self._u_ts[d],
                                 ak[q], at[q])
                # pass C: new users × THIS BATCH's new assistants
                q, d = _range_pairs(ag, at, ug, ut, ut + W,
                                    "right", "right")
                self._emit_pairs(ug[q], uk[q], ut[q], ak[d], at[d])

                # merge the new rows into per-side state
                if len(ug):
                    c2 = np.concatenate([self._u_code, ug])
                    k2 = np.concatenate([self._u_idx, uk])
                    t2 = np.concatenate([self._u_ts, ut])
                    o2 = np.lexsort((t2, c2))
                    self._u_code, self._u_idx, self._u_ts = \
                        c2[o2], k2[o2], t2[o2]
                if len(ag):
                    c2 = np.concatenate([self._a_code, ag])
                    k2 = np.concatenate([self._a_idx, ak])
                    t2 = np.concatenate([self._a_ts, at])
                    o2 = np.lexsort((t2, c2))
                    self._a_code, self._a_idx, self._a_ts = \
                        c2[o2], k2[o2], t2[o2]

        if int(cm[-1]) > self.wm:
            self.wm = int(cm[-1])
        self._trim(self.wm)
        if seq is not None:
            if self.out_dir is not None:
                self._spill_pairs(seq)
            self.seq = seq
            self._checkpoint()
        return table.num_rows

    def _spill_pairs(self, seq: int) -> None:
        """Write this micro-batch's pair blocks as the shard's
        part-<seq>.parquet and drop them from memory — the part lands
        durably BEFORE the snapshot below marks the seq applied
        (DedupShardCore's commit discipline), so a crash in between
        simply replays the seq against the pre-apply state and
        idempotently overwrites an identical part. Empty batches write
        no part (seq completeness is tracked by the snapshot, not the
        part list)."""
        if not self.emitted:
            return
        cols = {c: np.concatenate([b[c] for b in self.emitted])
                for c in self._PAIR_COLS}
        tbl = pa.table({"conv_id": pa.array(cols["conv_id"], pa.string()),
                        **{c: pa.array(cols[c], pa.int64())
                           for c in self._PAIR_COLS[1:]}})
        _atomic_write(tbl, os.path.join(self.out_dir,
                                        f"part-{seq:06d}.parquet"))
        self.emitted = []

    def _trim(self, bound: int) -> None:
        if len(self._u_ts):
            m = self._u_ts > bound - self.window
            if not m.all():
                self._u_code = self._u_code[m]
                self._u_idx = self._u_idx[m]
                self._u_ts = self._u_ts[m]
        if len(self._a_ts):
            m = self._a_ts > bound
            if not m.all():
                self._a_code = self._a_code[m]
                self._a_idx = self._a_idx[m]
                self._a_ts = self._a_ts[m]
        if len(self._s_ts):
            m = self._s_ts > bound
            if not m.all():
                self._s_key = self._s_key[m]
                self._s_ts = self._s_ts[m]
        # name-index compaction — see AbsenceShardCore._trim
        live = len(self._u_code) + len(self._a_code) + len(self._s_key)
        if len(self._names) > max(1024, 4 * live):
            lo = self._s_key & ((1 << 34) - 1)
            u2, a2, s2 = self._compact_names(
                [self._u_code, self._a_code, self._s_key >> 34])
            self._u_code = u2
            self._a_code = a2
            self._s_key = (s2 << 34) | lo

    def finalize(self) -> dict:
        """End of stream: a join emits pairs as they complete, so there
        is nothing to flush — finalize ≡ the batch interval join over
        the kept, deduped rows."""
        hist_emitted, hist_late = self._read_deltas()
        return {"emitted": hist_emitted + self.emitted,
                "late": hist_late + self.late, "watermark": self.wm,
                "state_convs": len(self._names)}


JoinShardActor = ray.remote(JoinShardCore)


def run_streaming_join(input_path: str, window_us: int,
                       lateness_us: int = 5 * 60 * 1_000_000,
                       n_shards: int = 8,
                       validate_kwargs: dict | None = None,
                       max_pending: int = 4,
                       checkpoint_dir: str | None = None,
                       out_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming user→assistant interval join over the fragment stream
    (validated, null-text-dropped — the same stream every other CEP
    engine consumes). → (pairs, late DataFrame, watermarks).

    ``pairs`` is a driver DataFrame by default (fine for tests/small
    runs); pass ``out_dir`` for the SCALE path — each shard spills its
    pairs as (shard, seq)-deterministic parquet parts and ``pairs`` is
    returned as a lazy ``ray.data.Dataset`` over them, so neither the
    actors nor the driver ever hold the O(pairs) output."""
    import glob as _glob
    meta = {"kind": "sjoin", "window_us": window_us,
            "lateness_us": lateness_us, "n_shards": n_shards}
    if out_dir is not None:
        meta["out_dir"] = out_dir
        _guard_out_dir(out_dir, checkpoint_dir, "shard-*/part-*.parquet")
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [JoinShardActor.remote(
        window_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None,
        os.path.join(out_dir, f"shard-{s:03d}") if out_dir else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    late = [b for f in finals for b in f["late"]]
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts"])
    wms = [f["watermark"] for f in finals]
    cols = list(JoinShardCore._PAIR_COLS)
    if out_dir is not None:
        files = sorted(_glob.glob(
            os.path.join(out_dir, "shard-*", "part-*.parquet")))
        if files:
            pairs = ray.data.read_parquet(files)
        else:
            pairs = ray.data.from_arrow(pa.table(
                {"conv_id": pa.array([], pa.string()),
                 **{c: pa.array([], pa.int64()) for c in cols[1:]}}))
        return pairs, late_df, wms
    blocks = [b for f in finals for b in f["emitted"]]
    out = (pd.concat([pd.DataFrame(b) for b in blocks], ignore_index=True)
           [cols] if blocks else pd.DataFrame(columns=cols))
    return out, late_df, wms


def run_streaming_absence(input_path: str, window_us: int,
                          lateness_us: int = 5 * 60 * 1_000_000,
                          n_shards: int = 8,
                          validate_kwargs: dict | None = None,
                          max_pending: int = 4,
                          checkpoint_dir: str | None = None,
                  tail: bool = False,
                  poll_interval_s: float = 0.25,
                  idle_timeout_s: float = 10.0,
                  stop_file: str = "_EOS"):
    """Streaming unanswered-turn (absence) detection over the fragment
    stream (validated, null-text-dropped — the same stream every other
    CEP engine consumes). → (absences DataFrame, late DataFrame,
    watermarks)."""
    meta = {"kind": "absence", "window_us": window_us,
            "lateness_us": lateness_us, "n_shards": n_shards}
    fragments = _fragment_source(input_path, meta, checkpoint_dir, tail,
                                 poll_interval_s, idle_timeout_s, stop_file)
    actors = [AbsenceShardActor.remote(
        window_us, lateness_us,
        os.path.join(checkpoint_dir, f"shard-{s}.ckpt") if checkpoint_dir
        else None)
        for s in range(n_shards)]
    finals = _pump_fragments(actors, fragments, n_shards,
                             validate_kwargs, max_pending)
    emitted = [b for f in finals for b in f["emitted"]]
    late = [b for f in finals for b in f["late"]]
    out = _mixed_rows_df(emitted, ["conv_id", "turn_idx", "ts", "deadline"])
    late_df = _mixed_rows_df(late, ["conv_id", "turn_idx", "ts"])
    return out, late_df, [f["watermark"] for f in finals]
