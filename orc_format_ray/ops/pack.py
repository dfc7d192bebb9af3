"""Sequence packing: assign pre-tokenized documents to fixed-capacity
training blocks via a distributed prefix sum.

GPT-style packing concatenates documents in a global key order into one
token stream and cuts it into blocks of ``capacity`` tokens; documents may
span block boundaries. The assignment for a doc is a pure function of the
exclusive prefix sum ``start = sum(n_tok of docs with smaller key)``:
``first_pack = start // capacity``, ``last_pack = (start + n_tok - 1) //
capacity`` (empty docs pin to ``first_pack``).

Distributed plan — two METADATA-ONLY stages; token payloads never move:

1. ``bucket = key // bucket_width`` groups contiguous key ranges.
   ``map_batches`` partials -> one small ``groupby(bucket).sum`` -> the
   driver computes the exclusive cumsum over the sorted bucket totals
   (n_buckets rows — bucket_width keeps this ~1e3..1e6 at any scale) and
   broadcasts the per-bucket global offsets once with ``ray.put``.
2. ``groupby(bucket).map_groups``: each group sorts its rows by key, adds
   the bucket's global offset to its local exclusive cumsum, and emits the
   pack assignment vectorized. Only ``(key, n_tok)`` pairs shuffle
   (~16 B/row) — at 10^12 docs that is an unavoidable metadata exchange for
   a global total order, sized well below the token payload it indexes.

Assumes an INTEGER total-order key (gaps are fine; duplicates are not —
the prefix sum needs a strict order). String keys need a sample-sort range
partitioner in front; compose with ``ds.sort`` + a dense id if needed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args


def pack_assignment(keys: np.ndarray, n_tok: np.ndarray, base: int, capacity: int) -> pd.DataFrame:
    """Vectorized single-bucket assignment: rows sorted by key, ``base`` is
    the bucket's global token offset (exclusive prefix sum of all earlier
    buckets)."""
    order = np.argsort(keys, kind="stable")
    k = keys[order]
    n = n_tok[order].astype(np.int64)
    start = base + np.concatenate(([0], np.cumsum(n)[:-1]))
    first = start // capacity
    last = np.maximum(first, (start + np.maximum(n, 1) - 1) // capacity)
    return pd.DataFrame(
        {
            "doc_id": k,
            "n_tok": n,
            "start_tok": start,
            "first_pack": first,
            "last_pack": last,
        }
    )


def pack_sequences(
    ds,
    capacity: int,
    key: str = "doc_id",
    ntok: str = "n_tok",
    bucket_width: int = 4096,
    materialize_meta: bool = False,
):
    """Pack documents into ``capacity``-token training blocks.

    Returns a Dataset of ``(doc_id, n_tok, start_tok, first_pack,
    last_pack)`` — one row per input doc, keys globally ordered by the
    integer ``key`` column. See the module docstring for the two-stage
    distributed prefix-sum plan and its shuffle contract.

    The metadata stream is consumed twice (bucket totals, then the
    assignment groupby). By default both passes re-execute the upstream
    plan — the right call when ``ds`` is a cheap columnar read of
    ``(key, n_tok)`` (the north-rule tokens table: two tiny columns).
    Set ``materialize_meta=True`` to pin the metadata in the object store
    instead when the upstream derivation is expensive (e.g. tokenizing
    raw text) — that costs ~24 B x n_docs of (spillable) object store.
    """
    import ray
    from ray.data.aggregate import Sum

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    def to_meta(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) and keys.min() < 0:
            raise ValueError(f"pack_sequences needs non-negative integer {key!r} keys")
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(toks) and toks.min() < 0:
            raise ValueError(f"negative {ntok!r} values corrupt the prefix sum")
        return pa.table(
            {
                "bucket": pa.array(keys // bucket_width, pa.int64()),
                "doc_id": pa.array(keys, pa.int64()),
                "n_tok": pa.array(toks, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if materialize_meta:
        meta = meta.materialize()
    # stage 1: small per-bucket totals -> driver exclusive cumsum -> broadcast
    totals = (
        meta.groupby("bucket")
        .aggregate(Sum("n_tok", alias_name="tok_sum"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    offsets = {
        int(b): int(o)
        for b, o in zip(totals["bucket"], np.concatenate(([0], np.cumsum(totals["tok_sum"].to_numpy())[:-1])))
    }
    offsets_ref = ray.put(offsets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        keys = group["doc_id"].to_numpy()
        if len(np.unique(keys)) != len(keys):
            raise ValueError(f"duplicate {key!r} keys break the prefix-sum order (bucket {group['bucket'].iloc[0]})")
        offs = ray.get(offsets_ref)
        base = offs[int(group["bucket"].iloc[0])]
        return pack_assignment(keys, group["n_tok"].to_numpy(), base, capacity)

    # stage 2: per-bucket local prefix sums under the broadcast global offset
    return meta.groupby("bucket").map_groups(assign, batch_format="pandas", **remote_args())
