"""Deterministic sampling: hash splits and stratified samples.

Both use the Knuth multiplicative hash ``h(k) = (k * 2654435761) mod 2^32``
over an integer key — reproducible across runs, languages, and engines (the
same expression is plain SQL), unlike salted ``hash()`` or RNG state tied to
partitioning. Requires ``key * 2654435761 < 2^64`` (key < ~7e9); for wider
or string keys, hash to an int column first (``text.content_hash``) and
accept engine-specific parity.

``hash_split`` is embarrassingly parallel (a stateless vectorized filter —
the right shape for train/val/test splits at any scale). ``stratified_sample``
takes exactly ``k`` rows per stratum via one ``groupby(stratum)`` shuffle of
``(stratum, key)`` metadata; group sizes are per-stratum row counts, so for
very hot strata pre-filter with ``hash_split`` to bound group memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1) << np.uint64(32)


def knuth_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized ``((key + salt) * 2654435761) mod 2^32`` as uint64."""
    k = keys.astype(np.uint64) + np.uint64(salt)
    return (k * KNUTH) % _M32


def hash_split(ds, rate_pct: int, key: str = "doc_id", buckets: int = 100, salt: int = 0):
    """Keep rows whose hash bucket < ``rate_pct`` (of ``buckets``): a
    deterministic ~rate_pct% sample / split, as a stateless streaming
    filter."""
    if not 0 <= rate_pct <= buckets:
        raise ValueError(f"rate_pct must be in [0, {buckets}], got {rate_pct}")

    def keep(batch: pa.Table) -> pa.Table:
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        return batch.filter(pa.array((h % np.uint64(buckets)) < np.uint64(rate_pct)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def stratified_sample(ds, k: int, stratum: str = "source", key: str = "doc_id", salt: int = 0):
    """Exactly min(k, |stratum|) rows per stratum, chosen by ascending
    ``(hash(key), key)`` — a deterministic uniform draw within each stratum.
    Returns a Dataset of the sampled rows (all input columns)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        h = knuth_hash(group[key].to_numpy(), salt)
        order = np.lexsort((group[key].to_numpy(), h))
        return group.iloc[order[:k]]

    return ds.groupby(stratum).map_groups(pick, batch_format="pandas", **remote_args())


def mixture_sample(ds, rates: dict[str, int], stratum: str = "source", key: str = "doc_id", buckets: int = 100, salt: int = 0):
    """Composition-weighted mixture: keep each stratum at its own rate
    (``rates[stratum]`` of ``buckets``; strata absent from ``rates`` drop
    entirely) — the training-data mixing step (e.g. books at 100%, web at
    35%). Same Knuth hash as ``hash_split``, so a given row's fate is stable
    as rates change AND nested splits stay consistent across strata. The
    (tiny) rate dict ships inside the task closure; the filter itself is a
    stateless vectorized pass — no shuffle at any scale."""
    bad = {s: r for s, r in rates.items() if not 0 <= r <= buckets}
    if bad:
        raise ValueError(f"rates must be in [0, {buckets}]: {bad}")

    def keep(batch: pa.Table) -> pa.Table:
        pct = (
            pd.Series(batch[stratum].to_numpy(zero_copy_only=False))
            .map(rates)
            .fillna(0)
            .to_numpy(np.uint64)
        )
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        return batch.filter(pa.array((h % np.uint64(buckets)) < pct))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
