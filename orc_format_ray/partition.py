"""Skew-aware byte-budget partition planning over parquet inputs.

North-rule component: "a groupby-source repartition ... so no partition
exceeds a byte budget". Rather than shuffling raw token data through the
object store, partitions are *contiguous row-group ranges of input
fragments*, bin-packed by token-byte weight. This keeps the plan:

* deterministic + stable -> exact resume (manifest keys by partition id);
* shuffle-free -> at 100 TB no all-to-all exchange of token payloads ever
  happens; the only cross-node traffic is each encode task's column read;
* skew-aware -> a fragment with huge ``n_tok`` rows contributes more weight
  and is split at row-group granularity (and by row ranges when a single
  row group exceeds the budget).

Weight source: parquet row-group metadata ``total_byte_size`` (O(metadata),
scales to any corpus) or ``exact_ntok`` (reads only the n_tok column,
still cheap columnar I/O — right for small/benchmark runs).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow.parquet as pq

DEFAULT_BUDGET = 64 * 1024 * 1024  # mirror of the reference stripe_size (writer.rs:34)


@dataclass
class Slice:
    path: str
    row_group: int
    row_lo: int  # row offsets within the row group
    row_hi: int
    weight: int  # estimated token bytes


@dataclass
class PartitionSpec:
    pid: int
    slices: list = field(default_factory=list)

    @property
    def weight(self) -> int:
        return sum(s.weight for s in self.slices)

    def to_row(self) -> dict:
        import json

        # slices as a JSON string: keeps the spec Dataset a clean arrow block
        return {
            "pid": self.pid,
            "slices": json.dumps([[s.path, s.row_group, s.row_lo, s.row_hi, s.weight] for s in self.slices]),
        }

    @staticmethod
    def from_row(row: dict) -> "PartitionSpec":
        import json

        slices = row["slices"]
        if isinstance(slices, str):
            slices = json.loads(slices)
        return PartitionSpec(row["pid"], [Slice(*s) for s in slices])


def plan_partitions(
    paths: list[str],
    budget_bytes: int = DEFAULT_BUDGET,
    exact_ntok: bool = True,
    ntok_column: str = "n_tok",
) -> list[PartitionSpec]:
    """Bin-pack input row groups into byte-budget partitions (deterministic)."""
    specs: list[PartitionSpec] = []
    cur = PartitionSpec(pid=0)
    acc = 0

    def flush():
        nonlocal cur, acc
        if cur.slices:
            specs.append(cur)
            cur = PartitionSpec(pid=len(specs))
            acc = 0

    # prefetch exact per-row-group weights in parallel (pyarrow releases the
    # GIL; the planner itself stays serial + deterministic)
    weight_cache: dict[tuple[str, int], np.ndarray] = {}
    if exact_ntok:
        from concurrent.futures import ThreadPoolExecutor

        def _load(path: str):
            pf = pq.ParquetFile(path)
            if ntok_column not in pf.metadata.schema.to_arrow_schema().names:
                return
            for rg in range(pf.metadata.num_row_groups):
                col = pf.read_row_group(rg, columns=[ntok_column]).column(0)
                weight_cache[(path, rg)] = col.to_numpy(zero_copy_only=False).astype(np.int64) * 4

        with ThreadPoolExecutor(max_workers=8) as ex:
            list(ex.map(_load, sorted(paths)))

    for path in sorted(paths):
        pf = pq.ParquetFile(path)
        md = pf.metadata
        for rg in range(md.num_row_groups):
            rgmd = md.row_group(rg)
            nrows = rgmd.num_rows
            if nrows == 0:
                continue
            weights = weight_cache.get((path, rg))
            if weights is not None:
                total = int(weights.sum())
            else:
                total = rgmd.total_byte_size

            if total <= budget_bytes - acc:
                cur.slices.append(Slice(path, rg, 0, nrows, total))
                acc += total
                if acc >= budget_bytes:
                    flush()
            elif total <= budget_bytes:
                flush()
                cur.slices.append(Slice(path, rg, 0, nrows, total))
                acc = total
            else:
                # a single row group above budget: split by row ranges on the
                # exact prefix sums (skew guard for huge-n_tok docs)
                flush()
                if weights is None:
                    # metadata mode: split evenly by rows
                    n_parts = (total + budget_bytes - 1) // budget_bytes
                    bounds = np.linspace(0, nrows, n_parts + 1).astype(np.int64)
                else:
                    # greedy cuts on the exact prefix sums: every part is the
                    # longest row range with weight <= budget (so a part can
                    # exceed the budget only by its one trailing oversized row)
                    csum = np.cumsum(weights)
                    bounds = [0]
                    lo = 0
                    while lo < nrows:
                        base = csum[lo - 1] if lo else 0
                        hi = int(np.searchsorted(csum, base + budget_bytes, side="right"))
                        hi = max(lo + 1, min(hi, nrows))
                        bounds.append(hi)
                        lo = hi
                    bounds = np.array(bounds, dtype=np.int64)
                for lo, hi in zip(bounds[:-1], bounds[1:]):
                    if hi > lo:
                        w = int(weights[lo:hi].sum()) if weights is not None else total // max(1, len(bounds) - 1)
                        specs.append(PartitionSpec(len(specs), [Slice(path, rg, int(lo), int(hi), w)]))
                cur = PartitionSpec(pid=len(specs))
                acc = 0
    flush()
    # re-number sequentially (flush() above may have interleaved)
    for i, s in enumerate(specs):
        s.pid = i
    return specs


def read_partition(spec: PartitionSpec, columns: list[str] | None = None):
    """Read one partition's rows (inside the encode task, near the data)."""
    import pyarrow as pa

    tables = []
    for s in spec.slices:
        pf = pq.ParquetFile(s.path)
        t = pf.read_row_group(s.row_group, columns=columns)
        if s.row_lo != 0 or s.row_hi != t.num_rows:
            t = t.slice(s.row_lo, s.row_hi - s.row_lo)
        tables.append(t)
    return pa.concat_tables(tables) if len(tables) != 1 else tables[0]
