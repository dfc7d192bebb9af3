"""Distributed aggregation helpers beyond Ray Data's built-ins.

`quantiles_by_counts` — EXACT quantile_cont over a bounded-cardinality
column: per-batch (value, count) partials (vectorized), one groupby over
|distinct values| rows, then interpolation on the merged count distribution.
Memory is O(|distinct values|) no matter the row count — the right plan for
measure-like columns (quantities, prices at fixed scale, ordinal scores).
For genuinely continuous unbounded columns, swap the value key for a fixed
binning (or a mergeable sketch); the shuffle shape stays identical.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args


def quantile_cont_from_counts(values: np.ndarray, counts: np.ndarray, qs: list[float]) -> list[float]:
    """Exact quantile_cont (linear interpolation) from a sorted value/count
    distribution — the semantics of DuckDB/Postgres percentile_cont."""
    order = np.argsort(values)
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.int64)
    n = int(c.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    # cumulative ENDING index of each value run in the virtual sorted array
    cum = np.cumsum(c)
    out = []
    for q in qs:
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        frac = pos - lo
        v_lo = v[np.searchsorted(cum, lo, side="right")]
        v_hi = v[np.searchsorted(cum, hi, side="right")]
        out.append(float(v_lo + (v_hi - v_lo) * frac))
    return out


def quantiles_by_counts(ds, col: str, qs: list[float]) -> list[float]:
    """Exact quantile_cont of ``col`` over a Dataset via the value-count
    distribution (see module docstring for the scale contract)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by(col).aggregate([(col, "count")])
        return g.rename_columns([col, "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    dist = parts.groupby(col).aggregate(Sum("cnt", alias_name="cnt"))
    tbl = pa.concat_tables(list(dist.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    values = tbl[col].to_numpy(zero_copy_only=False)
    counts = tbl["cnt"].to_numpy(zero_copy_only=False)
    return quantile_cont_from_counts(values, counts, qs)
