"""Driver-faithful correctness harness (VERDICT r3 task #1).

Reproduces the driver's exact run shape: ONE Ray session at num_cpus=32,
queries() executed in REGISTRY order (not sorted) at sf0.01, each
oracle-backed query compared cell-wise against DuckDB. The two round-3
flaky reds (pack_sequences, prepare_training_data) never reproduced under
the sorted-order sf0.001 pytest harness — this one keeps every variable the
driver's session has: same scale, same ordering (state accumulation from
all earlier queries), same parallelism.

Usage:  python tools/driver_emulate.py [--loops N] [--sf DIR] [--cpus N]
        [--only name1,name2]
Mismatches dump both frames to /tmp/driver_emulate_dumps/ for bisection.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
DUMP_DIR = "/tmp/driver_emulate_dumps"


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _kind(dtype) -> str:
    k = np.dtype(dtype).kind if not isinstance(dtype, pd.api.types.CategoricalDtype) else "O"
    return {"i": "i", "u": "i", "f": "f", "b": "b", "M": "M", "m": "m"}.get(k, "O")


def dtype_problems(ours: pd.DataFrame, theirs_tbl: pa.Table) -> list[str]:
    """Dtype-faithful (hash-equivalent) layer (VERDICT r4 #2): the driver's
    value hash is dtype-sensitive; cell-wise compare after pandas coercion
    could never reproduce an oracle-side HUGEINT red. Flag decimal/HUGEINT
    oracle columns and any kind-level drift between the frames."""
    probs = []
    for field in theirs_tbl.schema:
        if pa.types.is_decimal(field.type):
            probs.append(f"oracle col {field.name!r} is {field.type} (HUGEINT/decimal — CAST in the SQL)")
    theirs = theirs_tbl.to_pandas()
    for c in sorted(set(ours.columns) & set(theirs.columns)):
        ka, kb = _kind(ours[c].dtype), _kind(theirs[c].dtype)
        if ka != kb:
            probs.append(f"dtype col {c!r}: engine kind {ka} ({ours[c].dtype}) vs oracle kind {kb} ({theirs[c].dtype})")
    return probs


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if list(ours.columns) != list(theirs.columns):
        problems.append(f"columns {list(ours.columns)} vs {list(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"rows {len(ours)} vs {len(theirs)}")
        return problems
    for c in ours.columns:
        a, b = ours[c].to_numpy(), theirs[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            bad = ~np.isclose(a.astype(np.float64), b.astype(np.float64),
                              rtol=0, atol=0, equal_nan=True)
        else:
            bad = a != b
        if bad.any():
            idx = np.flatnonzero(bad)[:5]
            problems.append(
                f"col {c}: {int(bad.sum())} diffs, first at rows {idx.tolist()}: "
                f"ours={a[idx].tolist()} theirs={b[idx].tolist()}"
            )
    return problems


def repeat_tail(sf_dir: str, names: list[str], reps: int, loop_i: int) -> int:
    """After a full registry pass (state accumulated), hammer the given
    queries ``reps`` more times in the SAME session — a higher sampling rate
    on the r3 flaky cells than whole-registry loops."""
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_bad = 0
    for r in range(reps):
        for name in names:
            ours_raw = _to_df(qs[name](sf_dir))
            theirs_tbl = con.execute(oracles[name]).fetch_arrow_table()
            ours = _normalize(ours_raw)
            theirs = _normalize(theirs_tbl.to_pandas())
            problems = dtype_problems(ours_raw, theirs_tbl)
            problems += compare(name, ours, theirs)
            if problems:
                n_bad += 1
                os.makedirs(DUMP_DIR, exist_ok=True)
                ours.to_csv(f"{DUMP_DIR}/{name}.tail{loop_i}.{r}.ours.csv", index=False)
                theirs.to_csv(f"{DUMP_DIR}/{name}.tail{loop_i}.{r}.oracle.csv", index=False)
                print(f"[{loop_i}] tail-rep {r} {name}: MISMATCH {problems}", flush=True)
            else:
                print(f"[{loop_i}] tail-rep {r} {name}: ok", flush=True)
    return n_bad


def run_once(sf_dir: str, only: set[str] | None, loop_i: int) -> int:
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    qs = entrymod.queries()       # REGISTRY order, like the driver
    oracles = entrymod.oracle_sql()
    n_bad = 0
    for pos, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours_raw = _to_df(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"[{loop_i}] {pos:3d} {name}: ERROR {type(e).__name__}: {e}", flush=True)
            n_bad += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"[{loop_i}] {pos:3d} {name}: rows-only {len(ours_raw)} rows ({dt:.1f}s)", flush=True)
            continue
        theirs_tbl = con.execute(oracles[name]).fetch_arrow_table()
        theirs_raw = theirs_tbl.to_pandas()
        problems = dtype_problems(ours_raw, theirs_tbl)
        problems += compare(name, _normalize(ours_raw), _normalize(theirs_raw))
        if problems:
            n_bad += 1
            os.makedirs(DUMP_DIR, exist_ok=True)
            ours_raw.to_csv(f"{DUMP_DIR}/{name}.loop{loop_i}.ours.csv", index=False)
            theirs_raw.to_csv(f"{DUMP_DIR}/{name}.loop{loop_i}.oracle.csv", index=False)
            print(f"[{loop_i}] {pos:3d} {name}: MISMATCH ({dt:.1f}s)", flush=True)
            for p in problems:
                print(f"      {p}", flush=True)
        else:
            print(f"[{loop_i}] {pos:3d} {name}: ok {len(ours_raw)} rows ({dt:.1f}s)", flush=True)
    return n_bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=1)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--only", default="")
    ap.add_argument("--tail-repeat", default="", help="comma-separated query names to re-run after each full pass")
    ap.add_argument("--tail-reps", type=int, default=10)
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    only = set(args.only.split(",")) if args.only else None
    total_bad = 0
    for i in range(1, args.loops + 1):
        t0 = time.time()
        bad = run_once(args.sf, only, i)
        if args.tail_repeat:
            bad += repeat_tail(args.sf, args.tail_repeat.split(","), args.tail_reps, i)
        total_bad += bad
        print(json.dumps({"loop": i, "bad": bad, "wall_sec": round(time.time() - t0, 1)}), flush=True)
        if bad:
            print(f"[{loop_msg(i)}] REPRODUCED — dumps in {DUMP_DIR}", flush=True)
            break
    ray.shutdown()
    return 1 if total_bad else 0


def loop_msg(i: int) -> str:
    return f"loop {i}"


if __name__ == "__main__":
    raise SystemExit(main())
