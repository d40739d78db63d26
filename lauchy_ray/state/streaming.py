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
  routed to the LATE output (policy: route, don't merge — ≙ the
  reference's blacklist side-channel shape).

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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..oracle import shard_of
from ..sources.stream import list_fragments

NEG_INF = -(1 << 62)


@ray.remote
class WindowShardActor:
    """One shard of streaming window-count state. Supports tumbling
    (slide == width, the default) and sliding windows (width a multiple of
    slide): a row belongs to width/slide windows; window w covers
    [w*slide, w*slide + width) and closes when wm ≥ its END."""

    def __init__(self, width_us: int, lateness_us: int, slide_us: int | None = None):
        self.width = width_us
        self.slide = slide_us or width_us
        assert width_us % self.slide == 0
        self.n_per = width_us // self.slide
        self.lateness = lateness_us
        self.wm = NEG_INF                    # shard watermark (epoch us)
        self.open: dict[tuple, list[int]] = {}   # (wid, role, tool) → [ok, rej]
        self.emitted: list[dict] = []
        self.late: list[dict] = []

    def ingest(self, table: pa.Table) -> int:
        """One micro-batch for this shard, rows in arrival order."""
        ts = table["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
        roles = table["role"].to_pylist()
        tools = table["tool"].to_pylist()
        valids = table["valid"].to_numpy(zero_copy_only=False)
        convs = table["conv_id"].to_pylist()
        idxs = table["turn_idx"].to_numpy(zero_copy_only=False)
        for i in range(len(ts)):
            last = ts[i] // self.slide
            any_open = False
            for wid in range(max(0, last - self.n_per + 1), last + 1):
                if wid * self.slide + self.width <= self.wm:
                    continue  # this window already emitted
                any_open = True
                cell = self.open.setdefault((int(wid), roles[i], tools[i]), [0, 0])
                cell[0 if valids[i] else 1] += 1
            if not any_open:
                # every window of this row already closed at arrival → late
                self.late.append({"conv_id": convs[i], "turn_idx": int(idxs[i]),
                                  "ts": int(ts[i]), "window_id": int(last)})
            if ts[i] - self.lateness > self.wm:
                self.wm = ts[i] - self.lateness
        self._emit_closed()
        return len(ts)

    def _emit_closed(self) -> None:
        closed = [k for k in self.open
                  if k[0] * self.slide + self.width <= self.wm]
        for k in sorted(closed):
            ok, rej = self.open.pop(k)
            self.emitted.append({"window_id": k[0], "role": k[1], "tool": k[2],
                                 "n_valid": ok, "n_rejected": rej})

    def finalize(self) -> dict:
        """End of stream: flush remaining open windows (wm → ∞)."""
        for k in sorted(self.open):
            ok, rej = self.open[k]
            self.emitted.append({"window_id": k[0], "role": k[1], "tool": k[2],
                                 "n_valid": ok, "n_rejected": rej})
        self.open.clear()
        return {"emitted": self.emitted, "late": self.late, "watermark": self.wm}


def _shard_tables(table: pa.Table, n_shards: int) -> dict[int, pa.Table]:
    shards = np.array([shard_of(c, n_shards)
                       for c in table["conv_id"].to_pylist()])
    out = {}
    for s in range(n_shards):
        idx = np.flatnonzero(shards == s)
        if len(idx):
            out[s] = table.take(pa.array(idx))
    return out


def run_streaming_window_counts(input_path: str, width_us: int,
                                lateness_us: int, n_shards: int = 8,
                                validate_kwargs: dict | None = None,
                                max_pending: int = 4,
                                slide_us: int | None = None):
    """Stream fragments through validator + shard actors (tumbling, or
    sliding when slide_us divides width_us).

    → (window_counts DataFrame, late DataFrame, per-shard watermarks)."""
    from ..stages.validator import Validator

    actors = [WindowShardActor.remote(width_us, lateness_us, slide_us)
              for _ in range(n_shards)]
    validator = Validator(**(validate_kwargs or {}))

    pending: list = []
    from ..pipelines.validate import _drop_null_text
    for frag in list_fragments(input_path):
        table = pq.read_table(frag)
        validated = validator(_drop_null_text(table))
        for s, sub in _shard_tables(validated, n_shards).items():
            pending.append(actors[s].ingest.remote(sub))
        # backpressure: cap in-flight micro-batch ingests; ray.get the
        # drained refs so an errored ingest raises instead of being
        # silently dropped (undercounted windows would look "successful")
        while len(pending) > max_pending * n_shards:
            ready, pending = ray.wait(
                pending, num_returns=len(pending) - max_pending * n_shards)
            ray.get(ready)
    ray.get(pending)

    finals = ray.get([a.finalize.remote() for a in actors])
    emitted = [row for f in finals for row in f["emitted"]]
    late = [row for f in finals for row in f["late"]]
    wc = (pd.DataFrame(emitted) if emitted else
          pd.DataFrame(columns=["window_id", "role", "tool", "n_valid", "n_rejected"]))
    if len(wc):
        # merge shard-level cells (same window key can exist in many shards)
        wc = (wc.groupby(["window_id", "role", "tool"], as_index=False)
              [["n_valid", "n_rejected"]].sum())
    late_df = (pd.DataFrame(late) if late else
               pd.DataFrame(columns=["conv_id", "turn_idx", "ts", "window_id"]))
    return wc, late_df, [f["watermark"] for f in finals]
