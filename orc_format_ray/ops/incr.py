"""Incremental aggregate maintenance: mergeable per-group states.

The 100-TB answer to "the corpus grew by one shard — update the dashboard"
is NOT a rescan: keep a per-group STATE table (count / sum / min / max per
metric, all exact int64 units — quantize doubles first, the house rule),
fold each new delta shard into its own state with one metadata-only
groupby, and MERGE states (count/sum add, min/max fold; all commutative
and associative, so any merge tree gives bit-identical results). Finalize
derives means as ONE exact-int division per cell. The state table is
|groups| rows — persist it with ``write_parquet`` next to the data and the
incremental update never touches the base corpus again.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args


def agg_state(ds, group: str, cols: list[str]):
    """Per-group mergeable aggregate state of int64 unit columns: for each
    c in ``cols`` the state carries ``c_sum / c_min / c_max`` plus a shared
    ``n``. ONE metadata-only groupby; only (group, units) rows shuffle."""
    from ray.data.aggregate import Count, Max, Min, Sum

    if not cols:
        raise ValueError("agg_state: need at least one column")

    def to_units(batch: pa.Table) -> pa.Table:
        out = {group: batch[group]}
        for c in cols:
            v = batch[c].to_numpy(zero_copy_only=False)
            if v.dtype.kind not in "iu":
                raise TypeError(f"agg_state: {c!r} must be integer units (quantize first), got {v.dtype}")
            out[c] = pa.array(v.astype(np.int64), pa.int64())
        return pa.table(out)

    units = ds.map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    aggs = [Count(alias_name="n")]
    for c in cols:
        aggs += [Sum(c, alias_name=f"{c}_sum"), Min(c, alias_name=f"{c}_min"), Max(c, alias_name=f"{c}_max")]
    return units.groupby(group).aggregate(*aggs)


def merge_agg_states(states: list, group: str, cols: list[str]):
    """Merge state tables (base + any number of deltas): counts/sums ADD,
    mins/maxes FOLD — commutative/associative, so the merge is layout- and
    order-invariant. Returns the merged state Dataset."""
    from ray.data.aggregate import Max, Min, Sum

    if not states:
        raise ValueError("merge_agg_states: need at least one state")
    u = states[0]
    for s in states[1:]:
        u = u.union(s)
    aggs = [Sum("n", alias_name="n")]
    for c in cols:
        aggs += [
            Sum(f"{c}_sum", alias_name=f"{c}_sum"),
            Min(f"{c}_min", alias_name=f"{c}_min"),
            Max(f"{c}_max", alias_name=f"{c}_max"),
        ]
    return u.groupby(group).aggregate(*aggs)


def finalize_state(state, cols: list[str]):
    """Append ``c_mean = c_sum / n`` (ONE exact-int double division per
    cell — SQL-bitwise) to a state Dataset."""

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        for c in cols:
            s = batch[f"{c}_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
            batch = batch.append_column(
                f"{c}_mean", pa.array(s.astype(np.float64) / n.astype(np.float64), pa.float64())
            )
        return batch

    return state.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
