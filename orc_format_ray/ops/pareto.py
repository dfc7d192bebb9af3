"""Concentration analysis: the Pareto / Lorenz cumulative-share curve.

``concentration_curve`` ranks entities (customers, sources, domains) by
their exact-integer value total and attaches each entity's cumulative
share of the grand total — the "top 20% of customers drive 80% of
revenue" panel, and for corpora the "how head-heavy is this source mix"
check before fixing training-mixture weights.

Scale plan: ONE distributed ``groupby(key)`` reduces the fact table to a
row per entity (values converted per-row to exact int64 units,
``floor(v*scale + 0.5)``, |unit| guarded < 2^31 so int64 sums cannot
wrap); the ranked cumulative fold then runs on that per-entity table,
which is bounded by entity cardinality, not fact rows (documented driver
materialization — same contract as ops/windows.py's keys×windows panels).

SQL parity (CLAUDE.md rules): ranking is ``row_number() OVER (ORDER BY
units DESC, key)``; the running sum is an exact-int cumsum; ``cum_share``
is ONE division of exact int64s cast to double — bitwise reproducible.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

from .fastagg import fast_groupby

_UNIT_LIMIT = np.int64(1) << 31
_SUM_LIMIT = float(1 << 53)


def concentration_curve(ds, key: str, value_col: str, value_scale: int = 100) -> pd.DataFrame:
    """Per-entity ranked cumulative share. Returns a driver DataFrame
    ``(key, units, rank, cum_share)`` sorted by rank ascending.
    Null keys/values drop (the SQL oracle filters both IS NOT NULL)."""
    from ray.data.aggregate import Sum

    def to_units(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = pa.table({key: batch[key], "v": batch[value_col]}).drop_null()
        v = t["v"].to_numpy(zero_copy_only=False).astype(np.float64)
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        if len(units) and np.abs(units).max() >= _UNIT_LIMIT:
            raise ValueError("per-row unit exceeds 2^31 — raise value_scale granularity guard")
        return pa.table({key: t[key], "units": pa.array(units)})

    agg = (fast_groupby(
        ds.map_batches(to_units, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        key,
        Sum("units", alias_name="units"),
    )
    )
    df = agg.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                key: pd.Series([], dtype=np.int64),
                "units": pd.Series([], dtype=np.int64),
                "rank": pd.Series([], dtype=np.int64),
                "cum_share": pd.Series([], dtype=np.float64),
            }
        )
    df["units"] = df["units"].astype(np.int64)
    df = df.sort_values(["units", key], ascending=[False, True], kind="stable").reset_index(drop=True)
    df["rank"] = np.arange(1, len(df) + 1, dtype=np.int64)
    cum = np.cumsum(df["units"].to_numpy(np.int64))
    total = int(cum[-1])
    if abs(total) >= _SUM_LIMIT:
        raise ValueError("grand total exceeds exact-double range (2^53)")
    df["cum_share"] = cum.astype(np.float64) / np.float64(total)
    return df[[key, "units", "rank", "cum_share"]]
