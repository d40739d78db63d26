"""CLI entry points (ray job submit compatible).

    python -m lauchy_ray.cli generate --out /tmp/turns --n-turns 1000000
    python -m lauchy_ray.cli validate --input /tmp/turns/turns \\
        --entities /tmp/turns/entities.parquet --out /tmp/out [--no-resume]
    python -m lauchy_ray.cli sessions --input /tmp/turns/turns --out /tmp/sess
    python -m lauchy_ray.cli windows  --input /tmp/turns/turns --out /tmp/wc \\
        [--slide-min 15]

Owns its Ray session (guarded — works standalone or under ray job submit).
"""

from __future__ import annotations

import argparse
import json
import sys


def _check_slide(width_min: int, slide_min: int | None) -> str | None:
    if slide_min is None:
        return None
    if slide_min <= 0:
        return "--slide-min must be a positive number of minutes"
    if width_min % slide_min != 0:
        return "--width-min must be a multiple of --slide-min"
    return None


def _init_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False


def main(argv: list[str] | None = None) -> int:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--num-cpus", type=int, default=None)
    p = argparse.ArgumentParser(prog="lauchy_ray", parents=[common])
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", parents=[common],
                       help="write a deterministic synthetic fixture")
    g.add_argument("--out", required=True)
    g.add_argument("--n-turns", type=int, default=100_000)
    g.add_argument("--n-convs", type=int, default=2_000)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--fragments", type=int, default=16)

    v = sub.add_parser("validate", parents=[common],
                       help="exactly-once checkpointed validation")
    v.add_argument("--input", required=True)
    v.add_argument("--entities", default=None)
    v.add_argument("--out", required=True)
    v.add_argument("--no-resume", action="store_true")
    v.add_argument("--no-blacklist", action="store_true")
    v.add_argument("--max-in-flight", type=int, default=32)
    v.add_argument("--tail", action="store_true",
                   help="run as a service: watch --input for new "
                        "fragments; ends on _EOS or --idle-timeout-s")
    v.add_argument("--idle-timeout-s", type=float, default=30.0)

    s = sub.add_parser("sessions", parents=[common],
                       help="sessionize a turns table")
    s.add_argument("--input", required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--gap-min", type=int, default=30)

    w = sub.add_parser("windows", parents=[common],
                       help="windowed valid/rejected counts")
    w.add_argument("--input", required=True)
    w.add_argument("--out", required=True)
    w.add_argument("--width-min", type=int, default=60)
    w.add_argument("--slide-min", type=int, default=None)

    st = sub.add_parser("stream", parents=[common],
                        help="watermark-driven streaming window engine")
    st.add_argument("--input", required=True)
    st.add_argument("--out", required=True)
    st.add_argument("--width-min", type=int, default=60)
    st.add_argument("--slide-min", type=int, default=None)
    st.add_argument("--lateness-min", type=int, default=5)
    st.add_argument("--shards", type=int, default=8)
    st.add_argument("--late-policy", choices=["route", "merge"],
                    default="route",
                    help="route: late rows go to the late output only; "
                         "merge: counted as corrections so results equal "
                         "a batch computation")
    st.add_argument("--checkpoint-dir", default=None,
                    help="snapshot shard state per micro-batch; rerun with "
                         "the same dir to resume exactly-once")
    st.add_argument("--tail", action="store_true",
                    help="watch --input for fragments appearing mid-run "
                         "(live-topic mode); ends on an _EOS file or after "
                         "--idle-timeout-s without a new fragment")
    st.add_argument("--idle-timeout-s", type=float, default=30.0)

    ss = sub.add_parser("stream-sessions", parents=[common],
                        help="watermark-driven streaming SESSION windows "
                             "(conv_id ts-gap close)")
    ss.add_argument("--input", required=True)
    ss.add_argument("--out", required=True)
    ss.add_argument("--gap-min", type=int, default=30)
    ss.add_argument("--lateness-min", type=int, default=5)
    ss.add_argument("--shards", type=int, default=8)
    ss.add_argument("--checkpoint-dir", default=None)
    ss.add_argument("--tail", action="store_true")
    ss.add_argument("--idle-timeout-s", type=float, default=30.0)

    sd = sub.add_parser("stream-dedup", parents=[common],
                        help="streaming exactly-once dedup by key with "
                             "watermark-TTL state")
    sd.add_argument("--input", required=True)
    sd.add_argument("--out", required=True)
    sd.add_argument("--retention-min", type=int, default=60)
    sd.add_argument("--lateness-min", type=int, default=5)
    sd.add_argument("--shards", type=int, default=8)
    sd.add_argument("--checkpoint-dir", default=None)
    sd.add_argument("--tail", action="store_true")
    sd.add_argument("--idle-timeout-s", type=float, default=30.0)

    sp = sub.add_parser("stream-patterns", parents=[common],
                        help="streaming row-pattern CEP matcher "
                             "(user → tool+ → assistant), exactly-once")
    sp.add_argument("--input", required=True)
    sp.add_argument("--out", required=True)
    sp.add_argument("--lateness-min", type=int, default=5)
    sp.add_argument("--shards", type=int, default=8)
    sp.add_argument("--checkpoint-dir", default=None)
    sp.add_argument("--tail", action="store_true")
    sp.add_argument("--idle-timeout-s", type=float, default=30.0)

    sf = sub.add_parser("stream-funnel", parents=[common],
                        help="streaming ordered-stage conversation "
                             "funnel (user -> tool-after -> "
                             "assistant-after), exactly-once")
    sf.add_argument("--input", required=True)
    sf.add_argument("--out", required=True)
    sf.add_argument("--lateness-min", type=int, default=5)
    sf.add_argument("--shards", type=int, default=8)
    sf.add_argument("--checkpoint-dir", default=None)
    sf.add_argument("--tail", action="store_true")
    sf.add_argument("--idle-timeout-s", type=float, default=30.0)

    sa = sub.add_parser("stream-absence", parents=[common],
                        help="streaming unanswered-turn timeout detector "
                             "(user turn with no assistant reply within "
                             "the window), exactly-once")
    sa.add_argument("--input", required=True)
    sa.add_argument("--out", required=True)
    sa.add_argument("--window-min", type=int, default=30)
    sa.add_argument("--lateness-min", type=int, default=5)
    sa.add_argument("--shards", type=int, default=8)
    sa.add_argument("--checkpoint-dir", default=None)
    sa.add_argument("--tail", action="store_true")
    sa.add_argument("--idle-timeout-s", type=float, default=30.0)

    sj = sub.add_parser("stream-join", parents=[common],
                        help="streaming user→assistant interval join "
                             "(pairs with 0 < a_ts − u_ts ≤ window), "
                             "exactly-once")
    sj.add_argument("--input", required=True)
    sj.add_argument("--out", required=True)
    sj.add_argument("--window-min", type=int, default=30)
    sj.add_argument("--lateness-min", type=int, default=5)
    sj.add_argument("--shards", type=int, default=8)
    sj.add_argument("--checkpoint-dir", default=None)
    sj.add_argument("--tail", action="store_true")
    sj.add_argument("--idle-timeout-s", type=float, default=30.0)

    tk = sub.add_parser("stream-topk", parents=[common],
                        help="streaming windowed top-k heavy hitters "
                             "(exact per-shard counts, or bounded-memory "
                             "Misra-Gries with --capacity), exactly-once")
    tk.add_argument("--input", required=True)
    tk.add_argument("--out", required=True)
    tk.add_argument("--width-min", type=int, default=60)
    tk.add_argument("--k", type=int, default=5)
    tk.add_argument("--capacity", type=int, default=None,
                    help="Misra-Gries summary size per open window; "
                         "omit for the exact core")
    tk.add_argument("--lateness-min", type=int, default=5)
    tk.add_argument("--shards", type=int, default=8)
    tk.add_argument("--checkpoint-dir", default=None)
    tk.add_argument("--tail", action="store_true")
    tk.add_argument("--idle-timeout-s", type=float, default=30.0)

    sq = sub.add_parser("stream-quantiles", parents=[common],
                        help="streaming exact windowed text-length "
                             "quantiles (p50/p90/p99 per window×role, "
                             "histogram-merge shards), exactly-once")
    sq.add_argument("--input", required=True)
    sq.add_argument("--out", required=True)
    sq.add_argument("--width-min", type=int, default=60)
    sq.add_argument("--lateness-min", type=int, default=5)
    sq.add_argument("--shards", type=int, default=8)
    sq.add_argument("--checkpoint-dir", default=None)
    sq.add_argument("--tail", action="store_true")
    sq.add_argument("--idle-timeout-s", type=float, default=30.0)

    sm = sub.add_parser("stream-sample", parents=[common],
                        help="streaming per-window deterministic bottom-k "
                             "sample (mergeable reservoir), exactly-once")
    sm.add_argument("--input", required=True)
    sm.add_argument("--out", required=True)
    sm.add_argument("--width-min", type=int, default=60)
    sm.add_argument("--k", type=int, default=5)
    sm.add_argument("--lateness-min", type=int, default=5)
    sm.add_argument("--shards", type=int, default=8)
    sm.add_argument("--checkpoint-dir", default=None)
    sm.add_argument("--tail", action="store_true")
    sm.add_argument("--idle-timeout-s", type=float, default=30.0)

    su = sub.add_parser("stream-upsert", parents=[common],
                        help="streaming upsert / KTable compaction: latest "
                             "version per (conv, turn) by (ts, arrival), "
                             "late corrections routed, exactly-once")
    su.add_argument("--input", required=True)
    su.add_argument("--out", required=True)
    su.add_argument("--lateness-min", type=int, default=5)
    su.add_argument("--shards", type=int, default=8)
    su.add_argument("--checkpoint-dir", default=None)
    su.add_argument("--tail", action="store_true")
    su.add_argument("--idle-timeout-s", type=float, default=30.0)

    sh = sub.add_parser("stream-hll", parents=[common],
                        help="streaming windowed HLL distinct-conversation "
                             "estimates (1024 bounded registers per open "
                             "window), exactly-once")
    sh.add_argument("--input", required=True)
    sh.add_argument("--out", required=True)
    sh.add_argument("--width-min", type=int, default=60)
    sh.add_argument("--lateness-min", type=int, default=5)
    sh.add_argument("--shards", type=int, default=8)
    sh.add_argument("--checkpoint-dir", default=None)
    sh.add_argument("--tail", action="store_true")
    sh.add_argument("--idle-timeout-s", type=float, default=30.0)

    nd = sub.add_parser("dedup-docs", parents=[common],
                        help="near-dup cluster assignment (doc_id, rep_id, "
                             "keep) written to a parquet sink — the LINEAR "
                             "output contract; the O(group^2) pair list is "
                             "an explicit --pairs-out opt-in sink")
    nd.add_argument("--input", required=True)
    nd.add_argument("--out", required=True)
    nd.add_argument("--method", choices=["minhash", "simhash"],
                    default="minhash")
    nd.add_argument("--threshold", type=float, default=0.9,
                    help="minhash jaccard threshold")
    nd.add_argument("--max-hamming", type=int, default=3,
                    help="simhash hamming radius")
    nd.add_argument("--n-blocks", type=int, default=4,
                    help="simhash bands; pigeonhole recall needs "
                         "n_blocks > max_hamming (and n_blocks | 60)")
    nd.add_argument("--id-col", default="doc_id")
    nd.add_argument("--text-col", default="text")
    nd.add_argument("--pairs-out", default=None,
                    help="ALSO write the expanded near-dup pair list to "
                         "this sink (quadratic in duplicate-group size; "
                         "guarded by --max-expand-pairs)")
    nd.add_argument("--max-expand-pairs", type=int, default=None)

    args = p.parse_args(argv)

    if args.cmd == "generate":
        from .datagen import write_fixture
        paths = write_fixture(args.out, n_turns=args.n_turns, n_convs=args.n_convs,
                              seed=args.seed, n_fragments=args.fragments)
        print(json.dumps(paths))
        return 0

    _init_ray(args.num_cpus)
    import ray

    try:
        if args.cmd in ("validate", "stream", "stream-sessions",
                        "stream-dedup", "stream-patterns", "sessions",
                        "windows"):
            from .sources.stream import list_fragments
            try:
                frags = list_fragments(args.input)
            except FileNotFoundError:
                frags = []
            if not frags:
                print(json.dumps({"error": f"no parquet fragments under {args.input}"}),
                      file=sys.stderr)
                return 2
        if args.cmd == "validate":
            entity_codes = None
            if args.entities:
                import pyarrow.parquet as pq
                entity_codes = pq.read_table(args.entities,
                                             columns=["code"])["code"].to_pylist()
            from .pipelines.checkpointed import run_checkpointed_validate
            summary = run_checkpointed_validate(
                args.input, args.out, entity_codes=entity_codes,
                enable_blacklist=not args.no_blacklist,
                resume=not args.no_resume, max_in_flight=args.max_in_flight,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            print(json.dumps(summary))
        elif args.cmd == "dedup-docs":
            import pyarrow as pa
            import pyarrow.compute as pc
            import ray.data as rd

            from .stages.dedup_near import (
                MAX_EXPAND_PAIRS, _expand_groups, cluster_assignments,
                collapse_and_pairs)
            docs = rd.read_parquet(args.input,
                                   columns=[args.id_col, args.text_col])
            if args.method == "simhash" and args.n_blocks <= args.max_hamming:
                print(json.dumps({"error": "pigeonhole recall needs "
                                  "--n-blocks > --max-hamming"}),
                      file=sys.stderr)
                return 2
            kw = ({"threshold": args.threshold} if args.method == "minhash"
                  else {"max_hamming": args.max_hamming,
                        "n_blocks": args.n_blocks})
            rep_pairs, multi = collapse_and_pairs(
                docs, args.method, args.id_col, args.text_col, **kw)
            clusters = cluster_assignments(docs, rep_pairs, multi,
                                           args.id_col)
            id_col = args.id_col

            def add_keep(t: pa.Table) -> pa.Table:
                # keep exactly the cluster representative; a 100-TB dedup
                # consumer filters on this column
                return t.append_column(
                    "keep", pc.equal(t[id_col], t["rep_id"]))

            clusters.map_batches(add_keep,
                                 batch_format="pyarrow").write_parquet(args.out)
            summary = {"out": args.out, "rep_pairs": int(len(rep_pairs)),
                       "dup_members": int(len(multi))}
            if args.pairs_out:
                pairs = _expand_groups(
                    rep_pairs, multi,
                    ["jaccard"] if args.method == "minhash" else [],
                    max_pairs=(args.max_expand_pairs
                               if args.max_expand_pairs is not None
                               else MAX_EXPAND_PAIRS))
                rd.from_pandas(pairs).write_parquet(args.pairs_out)
                summary["pairs_out"] = args.pairs_out
                summary["n_pairs"] = int(len(pairs))
            print(json.dumps(summary))
        elif args.cmd == "sessions":
            import ray.data as rd
            from .stages.sessionize import sessionize
            sessionize(rd.read_parquet(args.input),
                       gap_us=args.gap_min * 60 * 1_000_000).write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.cmd == "windows":
            import ray.data as rd
            from .pipelines.validate import validated_stream
            from .stages.windows import window_counts
            err = _check_slide(args.width_min, args.slide_min)
            if err:
                print(json.dumps({"error": err}), file=sys.stderr)
                return 2
            width = args.width_min * 60 * 1_000_000
            slide = args.slide_min * 60 * 1_000_000 if args.slide_min else None
            vds = validated_stream(rd.read_parquet(args.input), use_actors=False)
            window_counts(vds, width, slide).write_parquet(args.out)
            print(json.dumps({"out": args.out}))
        elif args.cmd == "stream":
            err = _check_slide(args.width_min, args.slide_min)
            if err:
                print(json.dumps({"error": err}), file=sys.stderr)
                return 2
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_window_counts
            wc, late, wms = run_streaming_window_counts(
                args.input, args.width_min * 60 * 1_000_000,
                args.lateness_min * 60 * 1_000_000, n_shards=args.shards,
                slide_us=(args.slide_min * 60 * 1_000_000
                          if args.slide_min else None),
                checkpoint_dir=args.checkpoint_dir,
                late_policy=args.late_policy,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(wc),
                           os.path.join(args.out, "window_counts.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "windows": len(wc),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-sessions":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_sessions
            sess, late, wms = run_streaming_sessions(
                args.input, args.gap_min * 60 * 1_000_000,
                args.lateness_min * 60 * 1_000_000, n_shards=args.shards,
                checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(sess),
                           os.path.join(args.out, "sessions.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "sessions": len(sess),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-patterns":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_patterns
            matches, late, wms = run_streaming_patterns(
                args.input, lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(matches),
                           os.path.join(args.out, "matches.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "matches": len(matches),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-funnel":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_funnel
            fn, late, wms = run_streaming_funnel(
                args.input, args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(fn),
                           os.path.join(args.out, "funnel.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out,
                              "stages": fn["n_convs"].astype(int).tolist(),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-absence":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_absence
            absences, late, wms = run_streaming_absence(
                args.input, args.window_min * 60 * 1_000_000,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(absences),
                           os.path.join(args.out, "absences.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "absences": len(absences),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-join":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_join
            # scale path: shards spill pairs as parquet parts directly
            # under out/pairs — the O(pairs) output never transits the
            # driver; the returned Dataset is lazy (count reads footers)
            pairs_ds, late, wms = run_streaming_join(
                args.input, args.window_min * 60 * 1_000_000,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                out_dir=os.path.join(args.out, "pairs"),
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out,
                              "pairs": int(pairs_ds.count()),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-quantiles":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_quantiles
            qdf, late, wms = run_streaming_quantiles(
                args.input, args.width_min * 60 * 1_000_000,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(qdf),
                           os.path.join(args.out, "quantiles.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "cells": len(qdf),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-sample":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_sample
            smp, late, wms = run_streaming_sample(
                args.input, args.width_min * 60 * 1_000_000, args.k,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(smp),
                           os.path.join(args.out, "sample.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "rows": len(smp),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-upsert":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_upsert
            # scale path: the compacted view spills per shard under
            # out/latest; the driver never holds the O(keys) table
            up_ds, late, wms = run_streaming_upsert(
                args.input,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                out_dir=os.path.join(args.out, "latest"),
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "keys": int(up_ds.count()),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-hll":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import run_streaming_window_hll
            est, late, wms = run_streaming_window_hll(
                args.input, args.width_min * 60 * 1_000_000,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(est),
                           os.path.join(args.out, "estimates.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "windows": len(est),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-topk":
            import os
            import pyarrow as pa
            import pyarrow.parquet as pq
            from .state.streaming import (run_streaming_approx_topk,
                                          run_streaming_topk)
            width = args.width_min * 60 * 1_000_000
            late_us = args.lateness_min * 60 * 1_000_000
            if args.capacity is None:
                tk, late, wms = run_streaming_topk(
                    args.input, width, args.k, late_us,
                    n_shards=args.shards,
                    checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            else:
                tk, late, wms = run_streaming_approx_topk(
                    args.input, width, args.k, args.capacity, late_us,
                    n_shards=args.shards,
                    checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            os.makedirs(args.out, exist_ok=True)
            pq.write_table(pa.Table.from_pandas(tk),
                           os.path.join(args.out, "topk.parquet"))
            pq.write_table(pa.Table.from_pandas(late),
                           os.path.join(args.out, "late.parquet"))
            print(json.dumps({"out": args.out, "rows": len(tk),
                              "late_rows": len(late),
                              "watermarks": [int(w) for w in wms]}))
        elif args.cmd == "stream-dedup":
            from .state.streaming import run_streaming_dedup
            summary = run_streaming_dedup(
                args.input, args.out,
                retention_us=args.retention_min * 60 * 1_000_000,
                lateness_us=args.lateness_min * 60 * 1_000_000,
                n_shards=args.shards, checkpoint_dir=args.checkpoint_dir,
                tail=args.tail, idle_timeout_s=args.idle_timeout_s)
            print(json.dumps({"out": args.out,
                              "rows_out": summary["rows_out"],
                              "state_keys": summary["state_keys"]}))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
