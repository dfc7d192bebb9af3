"""Z-order (Morton) clustering for multi-column row-group pruning.

At lake scale, min/max row-group statistics prune well only along the
column the data happens to be sorted by: a predicate on any OTHER column
sees near-full [min, max] ranges in every row group and reads everything.
Interleaving the bits of several columns' fixed-point positions into one
Morton key and sorting by IT gives every interleaved column locality, so a
2-D box predicate (k1 range AND k2 range) prunes row groups on BOTH
columns — the OPTIMIZE ZORDER technique of modern lake table formats,
expressed Ray-Data-first:

1. one metadata-only pass for global per-column [min, max] (per-batch
   partials, n_blocks tiny rows to the driver — full rows never move);
2. one vectorized Morton-key computation per batch (numpy bit ops, no
   Python rows);
3. ONE range-partitioned ``Dataset.sort`` on the 8-byte key — the same
   all-to-all exchange any global sort pays, and the only shuffle here;
4. the ordinary ORC sink (``write_orc_dataset``) then gets tight per-group
   statistics on every clustered column for free.

The key is a monotone LOCALITY device only — reads stay exact because the
pushdown path post-filters decoded groups — so linear fixed-point scaling
(not exact ranks) is sufficient, and heavy skew merely weakens pruning on
the skewed column, never correctness. Nulls quantize to the low corner.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args

ZKEY = "__zorder_key__"


def _as_float(col: pa.ChunkedArray) -> np.ndarray:
    """Column -> float64 positions (temporal types via their int64 epoch
    representation; nulls -> NaN). Monotone per column is all that matters."""
    t = col.type
    if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
        col = col.cast(pa.int64())
    elif pa.types.is_decimal(t):
        col = col.cast(pa.float64())
    elif not (pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_boolean(t)):
        raise TypeError(f"z-order needs a numeric/temporal column, got {t} (strings have no fixed-point position)")
    arr = col.to_numpy(zero_copy_only=False)
    return np.asarray(arr, dtype=np.float64)


def _quantize(x: np.ndarray, lo: float, hi: float, bits: int) -> np.ndarray:
    """Linear fixed-point position in [0, 2^bits - 1]; NaN (null) -> 0."""
    q = np.zeros(len(x), dtype=np.uint64)
    top = (1 << bits) - 1
    if hi > lo:
        scaled = (x - lo) * (top / (hi - lo))
        good = np.isfinite(scaled)
        q[good] = np.clip(scaled[good], 0, top).astype(np.uint64)
    return q


def morton_key(quantized: list[np.ndarray], bits: int) -> np.ndarray:
    """Interleave k quantized uint64 columns bit-by-bit into an int64 Morton
    key (vectorized over rows; bits*k <= 63 so the key never goes negative).
    Column j contributes bit b to key position b*k + j."""
    k = len(quantized)
    if bits * k > 63:
        raise ValueError(f"{k} columns x {bits} bits = {bits * k} > 63 key bits")
    key = np.zeros(len(quantized[0]), dtype=np.uint64)
    one = np.uint64(1)
    for j, q in enumerate(quantized):
        q = q.astype(np.uint64, copy=False)
        for bit in range(bits):
            key |= ((q >> np.uint64(bit)) & one) << np.uint64(bit * k + j)
    return key.astype(np.int64)


def _global_bounds(ds, columns: list[str]) -> list[tuple[float, float]]:
    """Per-column global [min, max] via the shared profiling bounds pass
    (``ops.profile.column_bounds`` with the temporal-aware ``_as_float``).
    An all-null column fails loudly — z-ordering on it is meaningless."""
    from .profile import column_bounds

    m = column_bounds(ds, columns, as_float=_as_float)
    return [m[c] for c in columns]


def cluster_by_zorder(ds, columns: list[str], bits_per_col: int | None = None):
    """Reorder ``ds`` along the Morton curve of ``columns`` (>= 2 numeric or
    temporal columns; for one column just ``ds.sort``). Returns a Dataset in
    z-order with the key column already dropped — feed it straight to
    ``write_orc_dataset`` / ``write_parquet`` so row-group statistics become
    selective on EVERY clustered column."""
    columns = list(columns)
    if len(columns) < 2:
        raise ValueError("z-ordering needs >= 2 columns; for one column use Dataset.sort directly")
    bits = bits_per_col if bits_per_col is not None else min(31, 63 // len(columns))
    if bits < 1:
        raise ValueError(f"bits_per_col must be >= 1, got {bits}")
    bounds = _global_bounds(ds, columns)

    def add_key(batch: pa.Table) -> pa.Table:
        qs = [_quantize(_as_float(batch[c]), lo, hi, bits) for c, (lo, hi) in zip(columns, bounds)]
        return batch.append_column(ZKEY, pa.array(morton_key(qs, bits), pa.int64()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return keyed.sort(ZKEY).map_batches(
        lambda t: t.drop_columns([ZKEY]), batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
