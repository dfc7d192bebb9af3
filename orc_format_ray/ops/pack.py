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


# ------------------------------------------------- packed shard materialization


def write_packed_shards(
    ds,
    capacity: int,
    out_dir: str,
    packs_per_shard: int = 64,
    key: str = "doc_id",
    ntok: str = "n_tok",
    tokens_col: str = "tokens",
    bucket_width: int = 4096,
):
    """Materialize the packed training stream as resumable shard parts.

    The global token stream (docs concatenated in ``key`` order) is cut
    into shards of ``capacity * packs_per_shard`` tokens; each shard
    directory holds part files a loader concatenates (in part order) and
    slices into ``capacity``-token packs — see ``read_packed_shard``.

    ONE payload shuffle total: the same two-stage prefix sum as
    ``pack_sequences`` computes bucket offsets from metadata only, then a
    single ``groupby(bucket)`` moves token payloads once; because bucket
    (key-contiguous) and shard (token-prefix-contiguous) are both monotone
    in key order, each bucket group writes its stream slices straight into
    the shard directories it overlaps — no second shuffle. Group memory is
    bounded by bucket_width docs' payloads. Parts are written atomically
    (tmp + rename) and skipped when present, so a re-run resumes.

    Returns the part manifest as a pandas DataFrame:
    (shard, part, path, start_tok, n_tokens, n_docs).
    """
    import os

    import ray
    from ray.data.aggregate import Sum

    if capacity <= 0 or packs_per_shard <= 0:
        raise ValueError("capacity and packs_per_shard must be positive")
    os.makedirs(out_dir, exist_ok=True)
    shard_tokens = capacity * packs_per_shard

    def to_meta(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) and keys.min() < 0:
            raise ValueError(f"negative {key!r} keys")
        return pa.table(
            {
                "bucket": pa.array(keys // bucket_width, pa.int64()),
                "n_tok": pa.array(batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64), pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
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

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("bucket", pa.array(keys // bucket_width, pa.int64()))

    def write_bucket(group):
        import pyarrow.parquet as pq

        keys = group[key].to_numpy().astype(np.int64)
        order = np.argsort(keys, kind="stable")
        n = group[ntok].to_numpy().astype(np.int64)[order]
        toks = group[tokens_col].to_numpy()[order]
        bucket = int(group["bucket"].iloc[0])
        base = ray.get(offsets_ref)[bucket]
        starts = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        total = int(n.sum())
        if total == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=d) for c, d in
                 [("shard", "int64"), ("part", "int64"), ("path", "object"),
                  ("start_tok", "int64"), ("n_tokens", "int64"), ("n_docs", "int64")]}
            )
        flat = np.concatenate([np.asarray(t, dtype=np.int32) for t in toks if len(t)])
        rows = []
        for s in range(base // shard_tokens, (base + total - 1) // shard_tokens + 1):
            lo = max(base, s * shard_tokens)
            hi = min(base + total, (s + 1) * shard_tokens)
            n_docs = int(np.sum((np.maximum(starts, lo) < np.minimum(starts + n, hi)) & (n > 0)))
            sdir = os.path.join(out_dir, f"shard={s}")
            os.makedirs(sdir, exist_ok=True)
            path = os.path.join(sdir, f"part-{bucket:06d}.parquet")
            if not os.path.exists(path):  # resume: skip completed parts
                part_tbl = pa.table(
                    {
                        "start_tok": pa.array([lo], pa.int64()),
                        "tokens": pa.array([flat[lo - base : hi - base]], pa.list_(pa.int32())),
                    }
                )
                tmp = path + f".tmp.{os.getpid()}"
                pq.write_table(part_tbl, tmp)
                os.replace(tmp, path)
            rows.append({"shard": s, "part": bucket, "path": path,
                         "start_tok": lo, "n_tokens": hi - lo, "n_docs": n_docs})
        return pd.DataFrame(rows)

    payload = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    manifest = payload.groupby("bucket").map_groups(write_bucket, batch_format="pandas", **remote_args())
    return manifest.to_pandas().sort_values(["shard", "part"]).reset_index(drop=True)


def read_packed_shard(out_dir: str, shard: int, capacity: int) -> list[np.ndarray]:
    """Reassemble one shard's packs: concatenate its parts in part order,
    slice into capacity-token arrays (last pack may be short)."""
    import glob
    import os

    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(out_dir, f"shard={shard}", "part-*.parquet")))
    streams = []
    for p in parts:
        t = pq.read_table(p)
        streams.append(np.concatenate([np.asarray(x, np.int32) for x in t["tokens"].to_pylist()]))
    flat = np.concatenate(streams) if streams else np.zeros(0, np.int32)
    return [flat[i : i + capacity] for i in range(0, len(flat), capacity)]
