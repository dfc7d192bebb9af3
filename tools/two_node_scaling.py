"""Two-node-topology scaling evidence (VERDICT r4 #9).

`bench.py --scaling` oversubscribes ONE local Ray instance; this harness
instead stands up a REAL two-process Ray cluster on this box (`ray start
--head` + a second `ray start` worker node) and runs the headline encode
at 1 node (4 cpus) vs 2 nodes (8 cpus) — exercising the actual multi-node
code paths (cross-node object transfer, per-node plasma, the raw-exchange
tasks scheduling across nodes). Same pairing discipline as bench.py:
back-to-back legs per pair (ambient drift cancels), median of per-pair
efficiencies.

Shared-DRAM caveat (BASELINE.md): both "nodes" share one memory bus, so
this still underestimates a real cluster where every node adds bandwidth.

Usage: python tools/two_node_scaling.py [--pairs N] [--cpus-per-node N]
Prints one JSON line. Run EXCLUSIVELY (the box's variance rule).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEAD_PORT = 6411

WORKLOAD = r"""
import json, os, sys, time
sys.path.insert(0, os.environ["REPO"])
import ray
ray.init(address=os.environ["HEAD_ADDR"], ignore_reinit_error=True,
         logging_level="ERROR", log_to_driver=False)
import ray.data
ray.data.DataContext.get_current().enable_progress_bars = False
want = int(os.environ["WANT_CPUS"])
# wait for the expected node set to register
for _ in range(100):
    if int(ray.cluster_resources().get("CPU", 0)) >= want:
        break
    time.sleep(0.2)
have = int(ray.cluster_resources().get("CPU", 0))
assert have == want, f"cluster has {have} cpus, want {want}"
n_nodes = len([n for n in ray.nodes() if n["Alive"]])
import shutil
import pyarrow as pa, pyarrow.parquet as pq
from orc_format_ray.pipelines import tokens as tok, encode as enc
corpus = os.environ["CORPUS_DIR"]
paths = tok.write_synthetic_corpus(corpus, n_rows=int(os.environ["ROWS"]), n_shards=16, seed=2)
total_tokens = 0
for p in paths:
    total_tokens += int(pa.compute.sum(pq.read_table(p, columns=["n_tok"])["n_tok"]).as_py())
budget = min(4 * 1024 * 1024, max(2 * 1024 * 1024, total_tokens * 4 // 96))
warm = "/tmp/two_node_warm"; shutil.rmtree(warm, ignore_errors=True)
enc.encode_dataset(paths[:1], warm, budget_bytes=budget, resume=False)
out = f"/tmp/two_node_out_{want}"
best = None
for _ in range(int(os.environ.get("REPS", "2"))):
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.perf_counter()
    enc.encode_dataset(paths, out, budget_bytes=budget, resume=False)
    dt = time.perf_counter() - t0
    best = dt if best is None else min(best, dt)
print(json.dumps({"nodes": n_nodes, "cpus": want, "sec": round(best, 3),
                  "tokens_per_sec": round(total_tokens / best)}))
ray.shutdown()
"""


def sh(cmd: list[str]) -> None:
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def run_leg(want_cpus: int, rows: int, corpus: str) -> dict:
    env = dict(
        os.environ,
        REPO=REPO,
        HEAD_ADDR=f"127.0.0.1:{HEAD_PORT}",
        WANT_CPUS=str(want_cpus),
        ROWS=str(rows),
        CORPUS_DIR=corpus,
        PYTHONPATH=REPO + os.pathsep + os.environ.get("PYTHONPATH", ""),
    )
    env.pop("RAY_ADDRESS", None)
    out = subprocess.run([sys.executable, "-c", WORKLOAD], env=env,
                         capture_output=True, text=True)
    if out.returncode != 0:
        raise RuntimeError(f"leg failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=3)
    ap.add_argument("--cpus-per-node", type=int, default=4)
    ap.add_argument("--rows", type=int, default=int(os.environ.get("ROWS", "60000")))
    args = ap.parse_args()
    cpn = args.cpus_per_node
    corpus = f"/tmp/two_node_corpus_{args.rows}"

    subprocess.run(["ray", "stop", "--force"], capture_output=True)
    pairs = []
    try:
        for i in range(args.pairs):
            sh(["ray", "start", "--head", f"--port={HEAD_PORT}",
                f"--num-cpus={cpn}", "--include-dashboard=false",
                "--disable-usage-stats"])
            one = run_leg(cpn, args.rows, corpus)
            sh(["ray", "start", f"--address=127.0.0.1:{HEAD_PORT}",
                f"--num-cpus={cpn}", "--disable-usage-stats"])
            two = run_leg(2 * cpn, args.rows, corpus)
            subprocess.run(["ray", "stop", "--force"], capture_output=True)
            eff = (two["tokens_per_sec"] / one["tokens_per_sec"]) / 2.0
            pairs.append((eff, one, two))
            print(json.dumps({"pair": i, "one_node": one, "two_node": two,
                              "efficiency": round(eff, 3)}), flush=True)
    finally:
        subprocess.run(["ray", "stop", "--force"], capture_output=True)
    pairs.sort(key=lambda t: t[0])
    eff_med, one, two = pairs[len(pairs) // 2]
    print(json.dumps({
        "metric": "two_node_topology_scaling",
        "nodes": [1, 2],
        "cpus_per_node": cpn,
        f"tokens_per_sec_1node": one["tokens_per_sec"],
        f"tokens_per_sec_2node": two["tokens_per_sec"],
        "pair_efficiencies": [round(e, 3) for e, _o, _t in pairs],
        "scaling_efficiency": round(eff_med, 3),
    }))


if __name__ == "__main__":
    main()
