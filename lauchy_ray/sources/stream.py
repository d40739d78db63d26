"""Micro-batch stream source over sorted Parquet fragments.

≙ the reference's Kafka source (TopologyProducer.java:131): a Kafka
partition's offset order becomes (fragment ordinal, row offset) over
fragment files sorted by name — the FIXTURES.md determinism contract.
``arrival_idx`` is a global arrival sequence number (fragment << 32 | row)
used by dedup keep-first and watermark tracking; it reproduces Kafka's
per-partition FIFO without relying on Ray block ordering (which shuffles
may destroy).

One read task per fragment ⇒ read parallelism scales with the fragment
count (the multi-node story: fragments are the unit of work + resume).
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def list_fragments(path: str) -> list[str]:
    if os.path.isfile(path):
        return [path]
    if not os.path.isdir(path):
        # a typo'd path must fail loudly: a silent [] here once produced
        # an empty stream AND stamped a checkpoint _meta.json with the
        # empty-input sha, poisoning later resumes against the real input
        raise FileNotFoundError(f"stream input not found: {path}")
    return sorted(glob.glob(os.path.join(path, "*.parquet")))


def tail_fragments(path: str, poll_interval_s: float = 0.25,
                   idle_timeout_s: float = 10.0, stop_file: str = "_EOS",
                   skip: set[str] | None = None,
                   enforce_order: bool = True):
    """Directory-watch fragment source (≙ consuming a LIVE Kafka topic,
    TopologyProducer.java:131): yields ``*.parquet`` paths in name order
    as they appear, including fragments landing mid-run.

    Order contract: fragment names must arrive in non-decreasing sorted
    order (a producer names fragments monotonically, like Kafka offsets);
    a newly-appeared fragment sorting BEFORE one already yielded raises —
    silently renumbering ordinals would break replay determinism.

    Termination: when ``stop_file`` exists in the directory the remaining
    fragments drain and the stream ends (producer-signaled EOS); without
    it the stream ends after ``idle_timeout_s`` with no new fragment.
    ``skip``: basenames already processed (checkpoint log replay) — they
    are not re-yielded but still count for the order contract.
    ``enforce_order=False`` relaxes the monotone-name contract for
    consumers whose fragments are independent units of work (the
    exactly-once validate sink: its manifest is per-fragment, no
    cross-fragment watermark state)."""
    import time
    if not os.path.isdir(path):
        raise FileNotFoundError(f"stream input not found: {path}")
    seen: set[str] = set(skip or ())
    last = max(seen) if seen else ""
    deadline = time.monotonic() + idle_timeout_s
    while True:
        names = sorted(os.path.basename(p)
                       for p in glob.glob(os.path.join(path, "*.parquet")))
        fresh = [n for n in names if n not in seen]
        stale = [n for n in fresh if n < last] if enforce_order else []
        if stale:
            raise ValueError(
                f"tail source: fragment(s) {stale} appeared AFTER "
                f"later-sorting fragment {last!r} was consumed — fragment "
                "names must be produced in sorted order (the Kafka-offset "
                "analog); cannot assign deterministic ordinals")
        for n in fresh:
            seen.add(n)
            last = n
            yield os.path.join(path, n)
        if fresh:
            deadline = time.monotonic() + idle_timeout_s
            continue   # re-list immediately: more may have landed
        if os.path.exists(os.path.join(path, stop_file)):
            return     # producer-signaled EOS, directory drained
        if time.monotonic() >= deadline:
            return     # idle timeout
        time.sleep(poll_interval_s)


def read_stream(path: str, columns: list[str] | None = None,
                arrival: bool = True) -> rd.Dataset:
    """Dataset over sorted fragments with an ``arrival_idx`` column."""
    files = list_fragments(path)
    if not arrival:
        return rd.read_parquet(files, columns=columns)
    items = [{"path": p, "ordinal": i} for i, p in enumerate(files)]

    def load(batch: dict) -> pa.Table:
        # batch_size=1 ⇒ exactly one fragment per task
        path, ordinal = batch["path"][0], int(batch["ordinal"][0])
        table = pq.read_table(path, columns=columns)
        arrival_idx = pa.array((ordinal << 32) + i for i in range(table.num_rows))
        return table.append_column("arrival_idx", arrival_idx.cast(pa.int64()))

    return rd.from_items(items).map_batches(load, batch_size=1, batch_format="numpy")
