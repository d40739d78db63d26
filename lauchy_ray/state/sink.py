"""Exactly-once Parquet sink with per-partition lineage manifests and
checkpoint-resume (north_rule; SURVEY.md §2.1 S2, §4, §7.3-4).

The reference is at-least-once (Kafka commit interval 1s, side emits
uncoupled from commits — application.properties:142, SURVEY.md §3.2); the
north_rule upgrades us to exactly-once. The unit of work and of recovery
is the INPUT FRAGMENT (one sorted parquet file ≙ a Kafka partition
segment; at 100 TB, one of ~10^5 shards):

  for each fragment not yet in the manifest:
      table = read(fragment)
      outputs = transform(table)            # pure, deterministic
      for sink, t in outputs: write t → <out>/<sink>/part-<frag>.tmp-<pid>
      atomic rename tmp → <out>/<sink>/part-<frag>.parquet
      write manifest/<frag>.json  {fragment, rows in/out, max_ts}  ← COMMIT

Crash semantics: the manifest write is the commit point. A crash before
it leaves either nothing or fully-renamed outputs; the retry recomputes
the SAME deterministic bytes and the rename overwrite is atomic, so
re-execution is invisible (idempotent). A fragment with a manifest entry
is skipped forever — that is the resumable offset (≙ committed Kafka
offsets, auto.offset.reset analog).

This is a raw-Ray-task stage by design (SURVEY.md guidance (c)): the
Dataset API cannot express per-input-shard atomic commit + lineage today;
each fragment is one remote task, scheduled ``max_in_flight`` at a time
so 10^5 shards never flood the scheduler. Driver state is O(#fragments),
never O(rows).
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..sources.stream import list_fragments, tail_fragments

MANIFEST_DIR = "_manifest"


def _manifest_path(out_dir: str, frag_name: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, frag_name + ".json")


def committed_fragments(out_dir: str) -> set[str]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return set()
    return {f[:-5] for f in os.listdir(mdir) if f.endswith(".json")}


def _fsync_file(path: str) -> None:
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


# persisting a rename = fsync the containing DIRECTORY (same syscall shape)
_fsync_dir = _fsync_file


def _atomic_write(table: pa.Table, final_path: str) -> None:
    """write → fsync file → rename → fsync dir. Without the fsyncs, a
    power loss can persist the manifest while the sink parquet is torn or
    missing, and resume would then skip the fragment forever (ADVICE r1);
    matches the discipline in state/streaming.py's _checkpoint."""
    tmp = f"{final_path}.tmp-{os.getpid()}"
    pq.write_table(table, tmp)
    _fsync_file(tmp)
    os.rename(tmp, final_path)  # atomic on the same filesystem
    _fsync_dir(os.path.dirname(final_path))


@ray.remote
def _process_fragment(frag_path: str, frag_name: str, out_dir: str,
                      transform, sinks: list[str]) -> dict:
    table = pq.read_table(frag_path)
    outputs = transform(table)
    entry = {
        "fragment": frag_path,
        "rows_in": table.num_rows,
        "outputs": {},
        "committed_at": time.time(),
    }
    if table.num_rows and "ts" in table.column_names:
        entry["max_ts_us"] = pc.max(table["ts"].cast(pa.int64())).as_py()
    for sink in sinks:
        t = outputs.get(sink)
        if t is None:
            t = pa.table({})
        out_path = os.path.join(out_dir, sink, f"{frag_name}.parquet")
        _atomic_write(t, out_path)
        entry["outputs"][sink] = {"file": out_path, "rows": t.num_rows}
    # COMMIT: manifest entry appears last, atomically AND durably — the
    # outputs above are already fsync'd, so the commit record can never
    # outlive its data on disk
    mpath = _manifest_path(out_dir, frag_name)
    tmp = f"{mpath}.tmp-{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(entry, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, mpath)
    _fsync_dir(os.path.dirname(mpath))
    return entry


def run_exactly_once(input_path: str, out_dir: str, transform,
                     sinks: list[str], resume: bool = True,
                     max_in_flight: int = 32, tail: bool = False,
                     poll_interval_s: float = 0.25,
                     idle_timeout_s: float = 10.0,
                     stop_file: str = "_EOS") -> dict:
    """Process every input fragment exactly once into ``sinks``.

    transform: pure fn ``pa.Table -> dict[sink_name, pa.Table]`` (must be
    deterministic — re-execution after a crash must produce identical
    bytes). Returns a summary {fragments_total, fragments_processed,
    fragments_skipped, rows}.

    ``tail=True`` (≙ running the reference validator as a SERVICE on a
    live topic): watch the input directory and keep committing fragments
    as they land, until ``stop_file`` appears or ``idle_timeout_s``
    passes with nothing new. The manifest is per-fragment and fragments
    are independent units of work, so arrival order is free
    (enforce_order=False) and exactly-once needs no extra protocol —
    committed fragments are skipped on any resume, tailing or static."""
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    for sink in sinks:
        os.makedirs(os.path.join(out_dir, sink), exist_ok=True)
    done = committed_fragments(out_dir) if resume else set()

    n_total = 0
    n_skipped = 0

    def pending_iter():
        nonlocal n_total, n_skipped
        if tail:
            source = tail_fragments(input_path,
                                    poll_interval_s=poll_interval_s,
                                    idle_timeout_s=idle_timeout_s,
                                    stop_file=stop_file,
                                    enforce_order=False)
        else:
            source = list_fragments(input_path)
        for path in source:
            n_total += 1
            name = os.path.splitext(os.path.basename(path))[0]
            if name in done:
                n_skipped += 1
            else:
                yield path, name

    # bounded-in-flight scheduling: never more than max_in_flight tasks live
    in_flight: list = []
    results = []
    it = pending_iter()
    exhausted = False
    while in_flight or not exhausted:
        while not exhausted and len(in_flight) < max_in_flight:
            nxt = next(it, None)
            if nxt is None:
                exhausted = True
                break
            path, name = nxt
            in_flight.append(_process_fragment.remote(
                path, name, out_dir, transform, sinks))
        if in_flight:
            ready, in_flight = ray.wait(in_flight, num_returns=1)
            results.extend(ray.get(ready))

    return {
        "fragments_total": n_total,
        "fragments_processed": len(results),
        "fragments_skipped": n_skipped,
        "rows": sum(r["rows_in"] for r in results),
    }


def read_sink(out_dir: str, sink: str) -> pa.Table:
    """Read back one sink directory (only committed, non-temp files)."""
    sdir = os.path.join(out_dir, sink)
    files = sorted(f for f in os.listdir(sdir)
                   if f.endswith(".parquet") and ".tmp-" not in f)
    tables = [pq.read_table(os.path.join(sdir, f)) for f in files]
    tables = [t for t in tables if t.num_rows > 0]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables)
