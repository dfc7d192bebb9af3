"""Parquet small-file compaction — the parquet-side sibling of
orcmerge.py's raw-stripe-copy compaction: a lake directory accumulated
from many incremental writes (one file per task per run) is rewritten
into few target-sized parts.

Determinism + resume contract:
  * bins are planned DRIVER-SIDE from (sorted file name, on-disk size)
    only — greedy first-fit in name order, a file >= target_bytes forms
    its own bin — so the same input directory always yields the same
    bins, independent of cluster state;
  * one Ray task per bin streams its inputs row-group-by-row-group
    through a ParquetWriter (bounded memory — never a whole bin in RAM);
    row order within a part = input name order, row-group order;
  * parts are part-{bin:06d}.parquet written tmp+rename (atomic), and a
    re-run SKIPS bins whose part already exists after verifying the
    part's row count against the plan (loud on mismatch — a foreign or
    truncated file never silently survives).

Schemas must match exactly across inputs (loud error otherwise — schema
evolution belongs to the reader, see evolve.py)."""

from __future__ import annotations

import numpy as np  # noqa: F401  (kept for parity with sibling modules)
import pyarrow as pa
import pyarrow.parquet as pq

from .._rayutil import remote_args


def plan_compaction_bins(in_dir: str, target_bytes: int, pattern: str = "*.parquet"):
    """Deterministic greedy first-fit bins over (sorted name, size).
    Returns a list of bins, each a list of (path, bytes)."""
    import glob
    import os

    files = sorted(glob.glob(os.path.join(in_dir, pattern)))
    if not files:
        raise FileNotFoundError(f"no {pattern} files under {in_dir}")
    bins, cur, cur_bytes = [], [], 0
    for p in files:
        sz = os.path.getsize(p)
        if cur and cur_bytes + sz > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append((p, sz))
        cur_bytes += sz
        if cur_bytes >= target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
    if cur:
        bins.append(cur)
    return bins


def compact_parquet_dataset(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 256 << 20,
    pattern: str = "*.parquet",
    row_group_size: int = 1 << 20,
):
    """Compact ``in_dir``'s small parquet files into
    ``out_dir/part-{bin:06d}.parquet`` parts of ~``target_bytes`` input
    each. Returns the part manifest ``(path, n_rows, n_files, skipped)``
    (``skipped`` marks bins satisfied by an existing verified part —
    the resume path)."""
    import os

    import pandas as pd
    import ray

    os.makedirs(out_dir, exist_ok=True)
    bins = plan_compaction_bins(in_dir, target_bytes, pattern)

    # schema gate + per-bin expected rows from footers only (no data read)
    schema = None
    exp_rows = []
    for b in bins:
        n = 0
        for p, _sz in b:
            md = pq.read_metadata(p)
            n += md.num_rows
            s = pq.read_schema(p)
            if schema is None:
                schema = s
            elif not s.equals(schema):
                raise ValueError(
                    f"compact_parquet_dataset: schema mismatch at {p} — run the "
                    "reader-side evolution path first (evolve.py), then compact"
                )
        exp_rows.append(n)

    @ray.remote(**remote_args())
    def write_bin(bin_id: int, paths: list, expected_rows: int):
        out_path = os.path.join(out_dir, f"part-{bin_id:06d}.parquet")
        if os.path.exists(out_path):
            have = pq.read_metadata(out_path).num_rows
            if have != expected_rows:
                raise ValueError(
                    f"{out_path}: exists with {have} rows, plan expects {expected_rows} "
                    "— foreign or truncated part; remove it to recompact"
                )
            return (out_path, expected_rows, len(paths), True)
        tmp = out_path + f".tmp.{os.getpid()}"
        writer = None
        n = 0
        try:
            for p in paths:
                f = pq.ParquetFile(p)
                for rg in range(f.num_row_groups):
                    t = f.read_row_group(rg)
                    if writer is None:
                        writer = pq.ParquetWriter(tmp, t.schema)
                    writer.write_table(t, row_group_size=row_group_size)
                    n += t.num_rows
        finally:
            if writer is not None:
                writer.close()
        if n != expected_rows:  # pragma: no cover — footer vs data disagree
            os.remove(tmp)
            raise ValueError(f"{out_path}: wrote {n} rows, footers promised {expected_rows}")
        os.replace(tmp, out_path)
        return (out_path, n, len(paths), False)

    rows = ray.get(
        [
            write_bin.remote(i, [p for p, _ in b], exp_rows[i])
            for i, b in enumerate(bins)
        ]
    )
    return pd.DataFrame(rows, columns=["path", "n_rows", "n_files", "skipped"]).sort_values(
        "path"
    ).reset_index(drop=True)
