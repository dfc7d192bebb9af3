"""Consolidated lake index: ONE sidecar answering "which files can match?"

Footer statistics already prune files — but consulting them costs one tail
pread PER FILE, and a 100-TB lake holds millions of files: the planning
step itself becomes the bottleneck (and on object stores, a per-file
round-trip). This module collects every file's column min/max (and row
count / size) ONCE — a Ray task pool over tails — into a single
``_lake_index.json``, after which every query plans file pruning from ONE
small read, driver-side, zero per-file I/O. The same consolidation move
as Delta's stats in the transaction log or Hudi's column-stats index,
built on our ORC tails.

Staleness contract: the index records each file's SIZE; at plan time a
file whose size changed (or that the index never saw) is read
CONSERVATIVELY (never pruned) and counted in ``n_stale`` — a stale index
can only cost speed, never correctness. Deletes (files gone) drop out
naturally because planning starts from the live listing. Rebuild with
``build_lake_index`` after compaction/ingest waves.

Predicates use the same triple grammar as ``dv.py`` / ``read_orc_filtered``
(ops ==/!=/</<=/>/>=/in, AND-list); min/max pruning logic is shared with
``dv._file_may_match``'s rules. Values must be JSON-representable
(int/float/str); other column types are skipped at build time (never
pruned on).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

INDEX_FILE = "_lake_index.json"


def build_lake_index(lake_dir: str, columns: list[str]) -> dict:
    """Collect per-file footer stats for ``columns`` into
    ``<lake_dir>/_lake_index.json`` (atomic). One Ray task pool over file
    TAILS — the only time the lake pays per-file planning I/O. Returns
    ``{"n_files", "n_cols", "path"}``."""
    import glob

    import ray.data

    from ._rayutil import remote_args
    from .orcmerge import read_orc_statistics
    from .orcread import _parse_tail, _Source

    paths = sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")

    def tails(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            with _Source(p) as src:
                num_rows = int(_parse_tail(src)["num_rows"])
            stats = read_orc_statistics(p)
            cols = {}
            for c in columns:
                st = stats.get(c)
                if st is None or st.min is None or st.max is None:
                    continue
                if not isinstance(st.min, (int, float, str)):
                    continue  # no canonical JSON form — never prune on it
                cols[c] = [st.min, st.max]
            rows.append(
                {
                    "path": os.path.relpath(p, lake_dir),
                    "size": os.path.getsize(p),
                    "num_rows": num_rows,
                    "cols": json.dumps(cols, separators=(",", ":")),
                }
            )
        return pa.Table.from_pylist(rows)

    cells = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(tails, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    files = {
        rel: {"size": int(size), "num_rows": int(nr), "cols": json.loads(cols)}
        for rel, size, nr, cols in cells.itertuples(index=False)
    }
    index = {"version": 1, "columns": sorted(columns), "files": files}
    out = os.path.join(lake_dir, INDEX_FILE)
    tmp = out + f".tmp{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(index, f, separators=(",", ":"))
    os.replace(tmp, out)
    return {"n_files": len(files), "n_cols": len(columns), "path": out}


def _may_match_minmax(lo, hi, op: str, val) -> bool:
    try:
        if op == "==":
            return lo <= val <= hi
        if op == "<":
            return lo < val
        if op == "<=":
            return lo <= val
        if op == ">":
            return hi > val
        if op == ">=":
            return hi >= val
        if op == "in":
            return any(lo <= v <= hi for v in val)
    except TypeError:
        return True  # incomparable: stay conservative
    return True  # '!=' and anything else: cannot prune


def prune_files(lake_dir: str, predicate) -> dict:
    """Plan a pruned scan from the consolidated index (ONE small read, no
    per-file I/O). Returns ``{"paths", "n_total", "n_pruned", "n_stale"}``
    — ``paths`` are the absolute files a scan must read; stale/unknown
    files are always included (correctness over speed)."""
    import glob

    from .dv import _normalize_pred

    triples = _normalize_pred(predicate)
    idx_path = os.path.join(lake_dir, INDEX_FILE)
    if not os.path.exists(idx_path):
        raise FileNotFoundError(f"{idx_path} missing — run build_lake_index first")
    with open(idx_path, encoding="utf-8") as f:
        index = json.load(f)
    live = sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    keep, n_pruned, n_stale = [], 0, 0
    for p in live:
        rel = os.path.relpath(p, lake_dir)
        ent = index["files"].get(rel)
        if ent is None or ent["size"] != os.path.getsize(p):
            n_stale += 1
            keep.append(p)
            continue
        match = True
        for col, op, val in triples:
            mm = ent["cols"].get(col)
            if mm is None:
                continue
            if not _may_match_minmax(mm[0], mm[1], op, val):
                match = False
                break
        if match:
            keep.append(p)
        else:
            n_pruned += 1
    return {"paths": keep, "n_total": len(live), "n_pruned": n_pruned, "n_stale": n_stale}


def read_lake_indexed(lake_dir: str, predicate, columns: list[str] | None = None):
    """Index-pruned, predicate-pushdown lake scan: the consolidated index
    drops provably-clean files driver-side, surviving files stream through
    ``read_orc_filtered`` (ROW_INDEX pruning + exact filter) as one Ray
    task each. Returns ``(Dataset, plan)`` so callers can assert/log the
    pruning ratio."""
    import ray.data

    from ._rayutil import remote_args
    from .dv import _normalize_pred
    from .orcread import read_orc_filtered

    triples = _normalize_pred(predicate)
    plan = prune_files(lake_dir, triples)
    if not plan["paths"]:
        raise ValueError("read_lake_indexed: every file pruned — empty scan (check the predicate)")

    def load(batch: pa.Table):
        for p in batch["path"].to_pylist():
            tbl, _counters = read_orc_filtered(p, triples, columns=columns)
            if tbl.num_rows:
                yield tbl

    ds = ray.data.from_items([{"path": p} for p in plan["paths"]]).map_batches(
        load, batch_format="pyarrow", **remote_args()
    )
    return ds, plan
