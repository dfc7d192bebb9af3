"""User-journey path mining: the "top first-k event paths" panel.

``top_user_paths`` groups each user's first ``k`` events (ordered by
``(ts, event_id)`` — event_id breaks timestamp ties deterministically) into
a ``'>'``-joined path string and counts users per path — the classic
onboarding-flow / funnel-discovery query.

Scale plan: a per-batch partial top-k (pandas sort + groupby.head(k))
shrinks every block to at most k rows per user BEFORE the shuffle, so only
(key, ts, id, type) metadata for candidate rows moves — the same
partial-fold idiom as etl.latest_by_key generalized to k. The global fold
buckets users by hash (``num_buckets`` groups, NOT one group per user) and
re-runs the identical vectorized pandas expression per bucket, so per-group
Python overhead is O(buckets), not O(users).

SQL parity: path equals ``string_agg(event_type, '>' ORDER BY ts,
event_id)`` over ``row_number() <= k``; counts are exact ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

_KNUTH = np.uint64(2654435761)


def top_user_paths(
    ds,
    k: int = 3,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Dataset of ``(path, n_users)``: users per first-k event-type path.

    Requires ``(key, ts_col, id_col)`` to order rows uniquely per key
    (``id_col`` must be unique — the events table's event_id is).
    Null keys drop (the SQL oracle filters ``key IS NOT NULL``).
    """
    from ray.data.aggregate import Count

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    cols = [key, ts_col, id_col, type_col]

    def firstk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[key]).sort_values([key, ts_col, id_col], kind="stable")
        return df.groupby(key, sort=False).head(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = firstk(batch[cols])
        out = out.copy()
        out["__bkt__"] = (
            (out[key].to_numpy(np.int64).view(np.uint64) * _KNUTH) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        top = firstk(g)
        paths = top.groupby(key, sort=False)[type_col].agg(">".join)
        return pd.DataFrame({"path": paths.to_numpy(dtype=object)})

    candidates = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas", **remote_args()
    )
    per_user = candidates.groupby("__bkt__").map_groups(
        fold, batch_format="pandas", **remote_args()
    )
    return per_user.groupby("path").aggregate(Count(alias_name="n_users"))
