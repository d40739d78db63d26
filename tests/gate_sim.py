"""One-command driver-gate simulation (VERDICT r3 item #4).

Mirrors EXACTLY what the grading driver does: a fresh process with a
FOREIGN cwd (default /tmp — the only place sys.path/import bugs in
worker closures surface), `ray.init` first, `sys.path.insert(0, repo)`,
import `__ray_entry__`, then for every `queries()` entry run the Ray
pipeline AND its `oracle_sql()` on DuckDB over the same parquet tables
and value-compare (sorted columns, sorted rows, int64-normalized,
float atol 1e-9). Queries without an oracle get the weaker rows-only
check, as the driver records.

Usage (from anywhere):

    python -m tests.gate_sim                 # sf0.01, cwd=/tmp, all queries
    python -m tests.gate_sim --sf 0.001
    python -m tests.gate_sim --queries dedup_docs,ann_topk
    python -m tests.gate_sim --cwd /root/repo   # skip the foreign-cwd hop

Exit code = number of failing queries. Prints one line per query and a
JSON summary line at the end.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _normalize(df):
    import pandas as pd
    df = df.copy()
    for col in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[col]):
            df[col] = df[col].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_bool_dtype(df[col]):
            df[col] = df[col].astype(bool)
        elif pd.api.types.is_integer_dtype(df[col]):
            df[col] = df[col].astype("int64")
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _compare(got, exp) -> str | None:
    """None if equal under the driver's contract, else a short reason."""
    import numpy as np
    import pandas as pd
    if list(got.columns) != list(exp.columns):
        return f"columns {list(got.columns)} != {list(exp.columns)}"
    if len(got) != len(exp):
        return f"rows {len(got)} != {len(exp)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            if not np.allclose(got[c].to_numpy(dtype=float),
                               exp[c].to_numpy(dtype=float),
                               rtol=0, atol=1e-9, equal_nan=True):
                return f"float column {c} diverges"
        else:
            mism = (got[c] != exp[c]) & ~(got[c].isna() & exp[c].isna())
            if mism.any():
                return (f"column {c}: {int(mism.sum())} mismatches, sample "
                        f"got={got.loc[mism, c].head(2).tolist()} "
                        f"exp={exp.loc[mism, c].head(2).tolist()}")
    return None


def run_gate(sf_dir: str, only: list[str] | None) -> int:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get(
            "RAY_GRAFT_CPUS", "32")), include_dashboard=False,
            logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import logging
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, REPO)
    import duckdb

    import __ray_entry__ as em

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    queries = em.queries()
    oracles = em.oracle_sql()
    names = only or sorted(queries)
    fails, no_oracle = [], []
    for name in names:
        t0 = time.time()
        try:
            got = queries[name](sf_dir)
            if hasattr(got, "to_pandas"):
                got = got.to_pandas()
            sql = oracles.get(name)
            if sql is None:
                no_oracle.append(name)
                status = f"rows-only ({len(got)} rows)"
            else:
                reason = _compare(_normalize(got),
                                  _normalize(con.execute(sql).fetchdf()))
                status = reason or "ok"
                if reason:
                    fails.append(name)
        except Exception as e:  # noqa: BLE001 — gate must survey everything
            status = f"EXCEPTION {type(e).__name__}: {e}"
            fails.append(name)
        mark = "PASS" if name not in fails else "FAIL"
        print(f"{mark} {name:32s} {time.time() - t0:6.2f}s  {status}",
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "n": len(names),
                      "fails": fails, "rows_only": no_oracle}))
    ray.shutdown()
    return len(fails)


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--sf", default="0.01",
                    help="scale factor (maps to /root/testdata/sf{sf})")
    ap.add_argument("--sf-dir", default=None,
                    help="explicit parquet dir (overrides --sf)")
    ap.add_argument("--cwd", default="/tmp",
                    help="working directory for the gate process "
                         "(foreign cwd surfaces import bugs)")
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset to check")
    ap.add_argument("--inner", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()
    sf_dir = args.sf_dir or f"/root/testdata/sf{args.sf}"
    only = args.queries.split(",") if args.queries else None

    if args.inner or os.path.realpath(os.getcwd()) == os.path.realpath(args.cwd):
        return run_gate(sf_dir, only)

    # re-exec ourselves from the foreign cwd so worker-closure import bugs
    # reproduce exactly as under the driver
    cmd = [sys.executable, os.path.abspath(__file__), "--inner",
           "--sf-dir", sf_dir, "--cwd", args.cwd]
    if args.queries:
        cmd += ["--queries", args.queries]
    return subprocess.run(cmd, cwd=args.cwd).returncode


if __name__ == "__main__":
    sys.exit(main())
