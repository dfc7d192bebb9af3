"""Stream-shaped windowed aggregation over an ordered event log.

Ray Data has no event-time windows/watermarks; the batch-native equivalent
treats the events table as a partitioned log: a vectorized stage assigns each
event its tumbling window id, then a grouped aggregate folds per
(key, window). Pre-aggregation happens inside each batch first (one partial
row per key-window per batch), so the shuffle input is near |distinct
windows|, not |events|. Ordering assumption: none needed for tumbling
aggregates (they are commutative folds); session/sliding variants would sort
within groups (documented in the module the day they're needed).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args


def assign_tumbling_window(batch: pa.Table, ts_col: str = "ts", window_sec: int = 3600, out: str = "window_start_ms") -> pa.Table:
    """Add the window start (epoch millis) for each event, vectorized.

    Division semantics: pc.divide truncates toward zero — deliberately, to
    match the DuckDB oracle, whose `epoch_ms` and `//` BOTH truncate toward
    zero (measured: epoch_ms('1969-12-31 23:59:59.9985') == -1, -3601//3600
    == -1). Pre-epoch events therefore land in the same window on both sides
    (pinned by test_window_agg_pre_epoch_matches_duckdb).
    """
    ms = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
    ms = pc.divide(ms, pa.scalar(1000, pa.int64()))
    w = pa.scalar(window_sec * 1000, pa.int64())
    start = pc.multiply(pc.divide(ms, w), w)
    return batch.append_column(out, start)


def tumbling_window_agg(ds, key: str = "event_type", ts_col: str = "ts", window_sec: int = 3600, value_col: str = "value"):
    """count + rounded sum(value) per (key, tumbling window)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = assign_tumbling_window(batch, ts_col, window_sec)
        t = pa.table({key: b[key], "window_start_ms": b["window_start_ms"], value_col: b[value_col]})
        g = t.group_by([key, "window_start_ms"]).aggregate([(value_col, "sum"), (value_col, "count")])
        return g.rename_columns([key, "window_start_ms", "sum_value", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    out = partials.groupby([key, "window_start_ms"]).aggregate(
        Sum("sum_value", alias_name="sum_value"), Sum("cnt", alias_name="cnt")
    )
    import numpy as np

    df = out.to_pandas()
    df["sum_value"] = np.round(df["sum_value"], 2)  # absorb fp summation order
    return df
