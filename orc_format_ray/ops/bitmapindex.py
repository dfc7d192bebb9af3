"""Bitmap (bitset) secondary index for LOW-CARDINALITY string columns over
a parquet file — the classic warehouse-style index: one packed bitset per
(column, value, row-group) answers equality and AND-combination counts by
pure popcount, without ever re-scanning the data columns.

Layout (resumable, one part per row-group — the partitioned-output rule):

    index_dir/
      _bitmap_meta.json            {"source": path, "num_row_groups": N,
                                    "columns": [...], "row_group_rows": [...]}
      part-{rg:06d}.parquet        rows (col, value, rg, n_rows, bits)

``bits`` is ``np.packbits`` of the row mask within the row-group (bit i =
row i, MSB-first — numpy's default), so AND across columns is bytewise
``&`` and a count is one table-driven popcount. All access is per
row-group: build fans out one Ray task per group (reads ONLY the indexed
columns of that group), queries read only the (col, value) rows they need
— at 100 TB neither side ever materializes the table.

Reference scope note: the reference engine has no secondary indexes; this
extends the lake toolkit (same family as the IVF/_buckets.json sharding
and orcread's ROW_INDEX seeks).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .._rayutil import remote_args

from .fastagg import fast_groupby

META_FILE = "_bitmap_meta.json"

_POP = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1).astype(np.int64)


def _popcount(b: np.ndarray) -> int:
    return int(_POP[b].sum())


def build_bitmap_index(parquet_path: str, index_dir: str, columns: list[str]) -> dict:
    """Build the index: one Ray task per row-group, each reading only the
    indexed columns of its group. Idempotent: existing complete parts are
    verified (row count vs the plan) and skipped; a foreign part is
    refused (the compact_parquet_dataset resume rule)."""
    import ray
    import ray.data

    if not columns:
        raise ValueError("build_bitmap_index: need at least one column")
    pf = pq.ParquetFile(parquet_path)
    schema = pf.schema_arrow
    for c in columns:
        t = schema.field(c).type
        if not (pa.types.is_string(t) or pa.types.is_large_string(t)):
            raise ValueError(f"build_bitmap_index: column {c!r} is {t}; only string "
                             "columns index (stringify or bucket numerics upstream)")
    n_rg = pf.metadata.num_row_groups
    rg_rows = [pf.metadata.row_group(i).num_rows for i in range(n_rg)]
    os.makedirs(index_dir, exist_ok=True)
    meta = {"source": os.path.abspath(parquet_path), "num_row_groups": n_rg,
            "columns": list(columns), "row_group_rows": rg_rows}
    mpath = os.path.join(index_dir, META_FILE)
    if os.path.exists(mpath):
        with open(mpath) as f:
            old = json.load(f)
        if old != meta:
            raise ValueError(f"{index_dir} holds a different index (source/layout mismatch)")
    else:
        tmp = mpath + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, mpath)

    def one_group(batch: pa.Table) -> pa.Table:
        out = []
        for rg in batch["rg"].to_pylist():
            part = os.path.join(index_dir, f"part-{rg:06d}.parquet")
            if os.path.exists(part):
                have = pq.read_metadata(part).num_rows
                dv = pq.read_table(part, columns=["n_rows"])
                if dv.num_rows and dv["n_rows"][0].as_py() != rg_rows[rg]:
                    raise ValueError(f"{part}: foreign part (row count mismatch) — refuse to resume")
                out.append({"rg": rg, "n_values": have, "skipped": True})
                continue
            grp = pq.ParquetFile(parquet_path).read_row_group(rg, columns=list(columns))
            rows = []
            n = grp.num_rows
            for c in columns:
                col = grp[c].combine_chunks()
                vals = col.to_numpy(zero_copy_only=False)
                uniq = pd.unique(pd.Series(vals))
                for v in uniq:
                    if v is None:
                        continue
                    mask = vals == v
                    rows.append({"col": c, "value": str(v), "rg": rg, "n_rows": n,
                                 "bits": np.packbits(mask).tobytes()})
            tbl = pa.Table.from_pylist(rows, schema=pa.schema([
                ("col", pa.string()), ("value", pa.string()), ("rg", pa.int64()),
                ("n_rows", pa.int64()), ("bits", pa.binary())]))
            tmp = part + f".tmp{os.getpid()}"
            pq.write_table(tbl, tmp)
            os.replace(tmp, part)
            out.append({"rg": rg, "n_values": len(rows), "skipped": False})
        return pa.Table.from_pylist(out)

    res = (
        ray.data.from_items([{"rg": i} for i in range(n_rg)])
        .map_batches(one_group, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    return {"num_row_groups": n_rg, "parts_written": int((~res["skipped"]).sum()),
            "parts_skipped": int(res["skipped"].sum())}


def bitmap_crosstab(index_dir: str, col_a: str, col_b: str):
    """Full (col_a value, col_b value) co-occurrence counts by bitmap AND +
    popcount — no data-column scan. One Ray task per row-group part; ONE
    tiny (a, b) groupby sums. Returns a Dataset of (a, b, cnt), combos
    with cnt > 0 only (a bitmap AND that pops to zero emits nothing)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    with open(os.path.join(index_dir, META_FILE)) as f:
        meta = json.load(f)
    for c in (col_a, col_b):
        if c not in meta["columns"]:
            raise ValueError(f"bitmap_crosstab: {c!r} not in index columns {meta['columns']}")
    n_rg = meta["num_row_groups"]

    def one_part(batch: pa.Table) -> pa.Table:
        rows = []
        for rg in batch["rg"].to_pylist():
            part = os.path.join(index_dir, f"part-{rg:06d}.parquet")
            t = pq.read_table(part)
            col = t["col"].to_numpy(zero_copy_only=False)
            val = t["value"].to_numpy(zero_copy_only=False)
            bits = t["bits"].to_numpy(zero_copy_only=False)
            ia = np.flatnonzero(col == col_a)
            ib = np.flatnonzero(col == col_b)
            for i in ia:
                ba = np.frombuffer(bits[i], dtype=np.uint8)
                for j in ib:
                    bb = np.frombuffer(bits[j], dtype=np.uint8)
                    c = _popcount(ba & bb)
                    if c:
                        rows.append({"a": val[i], "b": val[j], "cnt": c})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("a", pa.string()), ("b", pa.string()), ("cnt", pa.int64())]))

    return (fast_groupby(
        ray.data.from_items([{"rg": i} for i in range(n_rg)])
        .map_batches(one_part, batch_format="pyarrow", **remote_args()),
        ["a", "b"],
        Sum("cnt", alias_name="cnt"),
    )
    )


def bitmap_count(index_dir: str, predicates: dict[str, str]) -> int:
    """Count rows matching the AND of {column: value} equality predicates,
    by popcount over the AND of the per-row-group bitsets. A (col, value)
    absent from a row-group contributes an all-zero bitset (count 0)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    if not predicates:
        raise ValueError("bitmap_count: need at least one predicate")
    with open(os.path.join(index_dir, META_FILE)) as f:
        meta = json.load(f)
    for c in predicates:
        if c not in meta["columns"]:
            raise ValueError(f"bitmap_count: {c!r} not in index columns {meta['columns']}")
    preds = sorted(predicates.items())
    n_rg = meta["num_row_groups"]

    def one_part(batch: pa.Table) -> pa.Table:
        total = 0
        for rg in batch["rg"].to_pylist():
            part = os.path.join(index_dir, f"part-{rg:06d}.parquet")
            t = pq.read_table(part)
            col = t["col"].to_numpy(zero_copy_only=False)
            val = t["value"].to_numpy(zero_copy_only=False)
            bits = t["bits"].to_numpy(zero_copy_only=False)
            acc = None
            for c, v in preds:
                hit = np.flatnonzero((col == c) & (val == v))
                if not len(hit):
                    acc = None
                    break
                b = np.frombuffer(bits[hit[0]], dtype=np.uint8)
                acc = b if acc is None else (acc & b)
            if acc is not None:
                total += _popcount(acc)
        return pa.table({"cnt": pa.array([total], pa.int64())})

    out = (
        ray.data.from_items([{"rg": i} for i in range(n_rg)])
        .map_batches(one_part, batch_format="pyarrow", **remote_args())
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    return int(out["cnt"])
