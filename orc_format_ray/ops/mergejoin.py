"""Shuffle-free join over key-clustered ORC lakes (stats-planned ranges).

The 100-TB join shape every general-purpose engine pays an all-to-all
shuffle for: when BOTH sides are key-clustered on disk (the natural output
of our sorted lake writes / compaction), the driver can co-partition the
key space from footer statistics alone — TAIL preads, a few KiB per file —
and hand each Ray task one key range plus the file subsets whose [min,
max] intersect it. No shuffle, no index, no repartition: bytes move once,
from disk into the task that joins them, and range pruning inside each
file rides the existing ROW_INDEX pushdown (`read_orc_filtered`).

Cost model: a task reads the intersecting files' projected streams and
row-group-prunes to its range. On key-clustered lakes each file intersects
O(1) ranges and every byte is read once; on an UNCLUSTERED lake every file
intersects every range and the plan degrades to n_ranges full scans — the
returned plan carries ``avg_files_per_range`` so callers can see that
before paying for it (`plan_only=True`).

The reference engine (blkerby/orc-format) has no joins at all; this is
new-engine surface, Ray-Data-first (driver plans, Dataset of range tasks
executes, streaming downstream).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args


def _file_key_ranges(lake_dir: str, key: str) -> list[tuple[str, int, int]]:
    import glob
    import os

    from ..orcmerge import read_orc_statistics

    paths = sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")
    out = []
    for p in paths:
        st = read_orc_statistics(p).get(key)
        if st is None or st.min is None or st.max is None:
            raise ValueError(
                f"sorted_merge_join: {p} has no usable {key!r} statistics — "
                "rewrite the file (or use hash_join)"
            )
        out.append((p, int(st.min), int(st.max)))
    return out


def plan_merge_join(lake_a: str, lake_b: str, key_a: str, key_b: str,
                    max_ranges: int = 64) -> dict:
    """Driver-side co-partition plan from TAILS ONLY. Returns
    ``{"ranges": [(lo, hi, files_a, files_b), ...], "avg_files_per_range",
    "n_files_a", "n_files_b"}`` — ranges half-open [lo, hi), only ranges
    where BOTH sides have intersecting files (an empty side can't produce
    inner-join rows)."""
    fa = _file_key_ranges(lake_a, key_a)
    fb = _file_key_ranges(lake_b, key_b)
    lo = min(min(mn for _, mn, _ in fa), min(mn for _, mn, _ in fb))
    hi = max(max(mx for _, _, mx in fa), max(mx for _, _, mx in fb)) + 1
    # boundaries from both sides' file minima: on clustered lakes these are
    # the natural cluster edges; capped by even subsampling
    bounds = sorted({mn for _, mn, _ in fa} | {mn for _, mn, _ in fb} | {lo})
    if len(bounds) > max_ranges:
        idx = np.linspace(0, len(bounds) - 1, max_ranges).astype(int)
        bounds = sorted({bounds[i] for i in idx})
    edges = bounds + [hi]
    ranges = []
    touch = 0
    for i in range(len(edges) - 1):
        rlo, rhi = edges[i], edges[i + 1]
        fas = [p for p, mn, mx in fa if mn < rhi and mx >= rlo]
        fbs = [p for p, mn, mx in fb if mn < rhi and mx >= rlo]
        touch += len(fas) + len(fbs)
        if fas and fbs:
            ranges.append((rlo, rhi, fas, fbs))
    return {
        "ranges": ranges,
        "avg_files_per_range": touch / max(1, len(edges) - 1),
        "n_files_a": len(fa),
        "n_files_b": len(fb),
    }


def sorted_merge_join(lake_a: str, lake_b: str, key_a: str, key_b: str,
                      columns_a: list[str] | None = None,
                      columns_b: list[str] | None = None,
                      max_ranges: int = 64, suffix: str = "_b",
                      plan_only: bool = False):
    """Inner join two key-clustered ORC lakes WITHOUT a shuffle: one Ray
    task per driver-planned key range reads both sides' intersecting files
    (projected columns; range predicate pushed into the ROW_INDEX) and
    joins locally. Keys must be integers with valid footer stats. Returns
    a streaming Dataset of the joined rows (side-b column collisions get
    ``suffix``); ``plan_only=True`` returns the plan dict instead."""
    import pandas as pd
    import ray.data

    from ..orcread import read_orc_filtered

    plan = plan_merge_join(lake_a, lake_b, key_a, key_b, max_ranges)
    if plan_only:
        return plan
    if not plan["ranges"]:
        raise ValueError("sorted_merge_join: key ranges never overlap — nothing to join")
    cols_a = None if columns_a is None else sorted(set(columns_a) | {key_a})
    cols_b = None if columns_b is None else sorted(set(columns_b) | {key_b})

    items = [
        {"lo": lo, "hi": hi, "files_a": ",".join(fas), "files_b": ",".join(fbs)}
        for lo, hi, fas, fbs in plan["ranges"]
    ]

    def join_range(batch: pa.Table):
        for row in batch.to_pylist():
            lo, hi = int(row["lo"]), int(row["hi"])
            ta = [
                read_orc_filtered(p, [(key_a, ">=", lo), (key_a, "<", hi)], columns=cols_a)[0]
                for p in row["files_a"].split(",")
            ]
            tb = [
                read_orc_filtered(p, [(key_b, ">=", lo), (key_b, "<", hi)], columns=cols_b)[0]
                for p in row["files_b"].split(",")
            ]
            da = pa.concat_tables(ta).to_pandas()
            db = pa.concat_tables(tb).to_pandas()
            if not len(da) or not len(db):
                continue
            merged = da.merge(
                db, left_on=key_a, right_on=key_b, how="inner", suffixes=("", suffix)
            )
            if len(merged):
                yield pa.Table.from_pandas(merged, preserve_index=False)

    return ray.data.from_items(items).map_batches(
        join_range, batch_size=1, batch_format="pyarrow", **remote_args()
    )
