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


def _bucket_offsets(ds, key: str, ntok: str, bucket_width: int, materialize_meta: bool):
    """Stage 1 of the distributed prefix sum, shared by ``pack_sequences``
    and ``write_packed_shards``: validated (bucket, doc_id, n_tok) metadata
    plus the broadcast exclusive per-bucket token offsets. Returns
    ``(meta_ds, offsets_ref)``."""
    import ray
    from ray.data.aggregate import Count, Sum

    if bucket_width <= 0:
        raise ValueError(f"bucket_width must be positive, got {bucket_width}")

    def to_meta(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) and keys.min() < 0:
            raise ValueError(f"non-negative integer {key!r} keys required")
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
    totals = (
        meta.groupby("bucket")
        .aggregate(Sum("n_tok", alias_name="tok_sum"), Count(alias_name="n_docs"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    if totals["tok_sum"].isna().any():
        raise ValueError("null n_tok values corrupt the prefix sum")
    # pin int64 before the cumsum: a float-promoted partial sum would round
    tok_sums = totals["tok_sum"].to_numpy().astype(np.int64)
    excl = np.concatenate(([0], np.cumsum(tok_sums)[:-1]))
    offsets = {
        int(b): (int(o), int(t), int(c))
        for b, o, t, c in zip(totals["bucket"], excl, tok_sums, totals["n_docs"])
    }
    return meta, ray.put(offsets)


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

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    meta, offsets_ref = _bucket_offsets(ds, key, ntok, bucket_width, materialize_meta)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        keys = group["doc_id"].to_numpy()
        if len(np.unique(keys)) != len(keys):
            raise ValueError(f"duplicate {key!r} keys break the prefix-sum order (bucket {group['bucket'].iloc[0]})")
        offs = ray.get(offsets_ref)
        bucket = int(group["bucket"].iloc[0])
        base, total, count = offs[bucket]
        n = group["n_tok"].to_numpy()
        # Completeness guard (r3 driver flake): a locally-cumsum'd FRAGMENT of
        # a bucket (group split across blocks) would silently shift every
        # later start_tok — refuse loudly instead. write_packed_shards has
        # carried the same cross-check since r3 and never tripped.
        if len(keys) != count or int(n.sum()) != total:
            raise RuntimeError(
                f"bucket {bucket} arrived incomplete in map_groups: "
                f"{len(keys)}/{count} rows, {int(n.sum())}/{total} tokens — "
                "group split across blocks? (see ops/pack.py guard)"
            )
        return pack_assignment(keys, n, base, capacity)

    # stage 2: per-bucket local prefix sums under the broadcast global offset
    return meta.groupby("bucket").map_groups(assign, batch_format="pandas", **remote_args())


def pack_sequences_by_sort(
    ds,
    capacity: int,
    key: str = "doc_id",
    ntok: str = "n_tok",
    num_buckets: int = 256,
    materialize_meta: bool = True,
):
    """``pack_sequences`` for STRING (any lexicographically orderable) keys —
    the composed recipe the module docstring promises (VERDICT r3 #7): real
    corpora key on string doc ids.

    The global order is the binary/codepoint key order (numpy and DuckDB
    agree on ASCII). Plan: (1) one metadata pass samples per-batch min keys
    and the driver picks ``num_buckets - 1`` range boundaries —
    order-PRESERVING buckets, unlike a hash; boundary quality only affects
    load balance, never values; (2) a tiny groupby(bucket) computes per-
    bucket (token, rank) offsets via a driver cumsum, broadcast once;
    (3) groupby(bucket).map_groups sorts each bucket by key and emits the
    assignment plus the dense global ``rank``. Only (key, n_tok) metadata
    ever shuffles. Returns (doc_id, rank, n_tok, start_tok, first_pack,
    last_pack); duplicate keys raise (the prefix sum needs a strict order).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")

    def to_meta(batch: pa.Table) -> pa.Table:
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(toks) and toks.min() < 0:
            raise ValueError(f"negative {ntok!r} values corrupt the prefix sum")
        return pa.table({"doc_id": batch[key].cast(pa.string()), "n_tok": pa.array(toks, pa.int64())})

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if materialize_meta:
        meta = meta.materialize()

    def probe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"k": pa.array([], pa.string())})
        ks = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table({"k": pa.array([min(ks)], pa.string())})

    probe_tabs = list(
        meta.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
    )
    probes = (
        pa.concat_tables(probe_tabs) if probe_tabs else pa.table({"k": pa.array([], pa.string())})
    )["k"].to_numpy(zero_copy_only=False)
    probes = np.sort(probes)
    take = np.linspace(0, len(probes), num_buckets, endpoint=False)[1:].astype(np.int64)
    if len(probes) == 0:  # empty corpus -> empty (typed) assignment, not a groupby crash
        import pandas as pd_

        empty = pd_.DataFrame(
            {
                "doc_id": pd_.Series([], dtype=object),
                "rank": pd_.Series([], dtype="int64"),
                "n_tok": pd_.Series([], dtype="int64"),
                "start_tok": pd_.Series([], dtype="int64"),
                "first_pack": pd_.Series([], dtype="int64"),
                "last_pack": pd_.Series([], dtype="int64"),
            }
        )
        import ray.data as rd

        return rd.from_pandas(empty)
    boundaries = np.unique(probes[take]) if len(probes) else np.array([], dtype=object)
    boundaries_ref = ray.put(boundaries)

    def add_bucket(batch: pa.Table) -> pa.Table:
        bnd = ray.get(boundaries_ref)
        ks = batch["doc_id"].to_numpy(zero_copy_only=False)
        b = np.searchsorted(bnd, ks, side="right") if len(bnd) else np.zeros(len(ks), np.int64)
        return batch.append_column("bucket", pa.array(b.astype(np.int64), pa.int64()))

    bucketed = meta.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if materialize_meta:
        bucketed = bucketed.materialize()
    totals = (
        bucketed.groupby("bucket")
        .aggregate(Sum("n_tok", alias_name="tok_sum"), Count(alias_name="n_docs"))
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    tok_sums = totals["tok_sum"].to_numpy().astype(np.int64)
    cnts = totals["n_docs"].to_numpy().astype(np.int64)
    tok_base = np.concatenate(([0], np.cumsum(tok_sums)[:-1]))
    rank_base = np.concatenate(([0], np.cumsum(cnts)[:-1]))
    offsets = {
        int(b): (int(tb), int(rb), int(t), int(c))
        for b, tb, rb, t, c in zip(totals["bucket"], tok_base, rank_base, tok_sums, cnts)
    }
    offsets_ref = ray.put(offsets)

    def assign(group: pd.DataFrame) -> pd.DataFrame:
        keys = group["doc_id"].to_numpy()
        if len(np.unique(keys)) != len(keys):
            raise ValueError(f"duplicate {key!r} keys break the prefix-sum order")
        bucket = int(group["bucket"].iloc[0])
        tb, rb, total, count = ray.get(offsets_ref)[bucket]
        n = group["n_tok"].to_numpy().astype(np.int64)
        if len(keys) != count or int(n.sum()) != total:
            raise RuntimeError(
                f"bucket {bucket} arrived incomplete in map_groups: "
                f"{len(keys)}/{count} rows, {int(n.sum())}/{total} tokens"
            )
        out = pack_assignment(keys, n, tb, capacity)
        # pack_assignment emits key-sorted rows -> dense global rank
        out.insert(1, "rank", rb + np.arange(len(keys), dtype=np.int64))
        return out

    return bucketed.groupby("bucket").map_groups(assign, batch_format="pandas", **remote_args())


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
    materialize_input: bool = False,
    meta_source=None,
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
    (shard, part, path, start_tok, n_tokens, n_docs). The input is consumed
    twice (metadata pass, then the payload pass); by default both re-execute
    the upstream plan — right for a columnar read. Set
    ``materialize_input=True`` to pin the full payload in the (spillable)
    object store instead when the upstream derivation (e.g. tokenization)
    costs more than one corpus pass of storage. Best of all, pass
    ``meta_source``: a cheap Dataset with just ``(key, ntok)`` (e.g. a
    two-column parquet read) — the metadata pass then never touches token
    payloads at all. It must contain exactly the same (key, n_tok) rows as
    ``ds``; per-bucket token totals are cross-checked at write time and any
    disagreement raises before a byte hits disk.
    """
    import os

    import ray

    if capacity <= 0 or packs_per_shard <= 0:
        raise ValueError("capacity and packs_per_shard must be positive")
    os.makedirs(out_dir, exist_ok=True)
    shard_tokens = capacity * packs_per_shard
    if materialize_input:
        ds = ds.materialize()
    _meta, offsets_ref = _bucket_offsets(meta_source if meta_source is not None else ds, key, ntok, bucket_width, False)

    def add_bucket(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("bucket", pa.array(keys // bucket_width, pa.int64()))

    def write_bucket(group):
        import pyarrow.parquet as pq

        keys = group[key].to_numpy().astype(np.int64)
        if len(np.unique(keys)) != len(keys):
            raise ValueError(f"duplicate {key!r} keys break the stream order (bucket {group['bucket'].iloc[0]})")
        order = np.argsort(keys, kind="stable")
        n = group[ntok].to_numpy().astype(np.int64)[order]
        toks = group[tokens_col].to_numpy()[order]
        bucket = int(group["bucket"].iloc[0])
        base, meta_total, meta_count = ray.get(offsets_ref)[bucket]
        starts = base + np.concatenate(([0], np.cumsum(n)[:-1]))
        total = int(n.sum())
        if total != meta_total or len(keys) != meta_count:
            raise ValueError(
                f"meta disagrees with the payload for bucket {bucket}: "
                f"{meta_total} vs {total} tokens, {meta_count} vs {len(keys)} docs "
                "(wrong meta_source, or group split across blocks)"
            )
        if total == 0:
            return pd.DataFrame(
                {c: pd.Series(dtype=d) for c, d in
                 [("shard", "int64"), ("part", "int64"), ("path", "object"),
                  ("start_tok", "int64"), ("n_tokens", "int64"), ("n_docs", "int64")]}
            )
        nonempty = [np.asarray(t, dtype=np.int32) for t in toks if len(t)]
        flat = np.concatenate(nonempty) if nonempty else np.zeros(0, np.int32)
        if len(flat) != total:
            raise ValueError(f"{ntok!r} column disagrees with {tokens_col!r} lengths ({total} vs {len(flat)})")
        rows = []
        for s in range(base // shard_tokens, (base + total - 1) // shard_tokens + 1):
            lo = max(base, s * shard_tokens)
            hi = min(base + total, (s + 1) * shard_tokens)
            n_docs = int(np.sum((np.maximum(starts, lo) < np.minimum(starts + n, hi)) & (n > 0)))
            sdir = os.path.join(out_dir, f"shard={s}")
            os.makedirs(sdir, exist_ok=True)
            path = os.path.join(sdir, f"part-{bucket:018d}.parquet")  # wide enough for any int64 bucket
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


def read_packed_shards_dataset(out_dir: str, capacity: int, packs_per_shard: int = 64):
    """The packed stream as a Ray Dataset of (pack_id, shard, n_tokens,
    tokens) — the training-loader integration point: each task reassembles
    ONE shard (``read_packed_shard``'s contiguity guards included) and emits
    its packs, so the loader streams ``capacity``-token rows with
    backpressure instead of collecting shards driver-side. ``pack_id`` is
    the global pack index (shard * packs_per_shard + local)."""
    import glob
    import os
    import re

    import ray.data

    shard_ids = sorted(
        int(m.group(1))
        for p in glob.glob(os.path.join(out_dir, "shard=*"))
        if (m := re.fullmatch(r"shard=(\d+)", os.path.basename(p)))
    )
    if not shard_ids:
        raise FileNotFoundError(f"no shard=* directories under {out_dir}")

    def load(batch: pa.Table) -> pa.Table:
        out_ids, out_shard, out_toks = [], [], []
        for s in batch["shard"].to_pylist():
            packs = read_packed_shard(out_dir, s, capacity, packs_per_shard)
            for i, p in enumerate(packs):
                out_ids.append(s * packs_per_shard + i)
                out_shard.append(s)
                out_toks.append(p)
        return pa.table(
            {
                "pack_id": pa.array(out_ids, pa.int64()),
                "shard": pa.array(out_shard, pa.int64()),
                "n_tokens": pa.array([len(t) for t in out_toks], pa.int64()),
                "tokens": pa.array([t for t in out_toks], pa.list_(pa.int32())),
            }
        )

    ds = ray.data.from_items([{"shard": s} for s in shard_ids])
    return ds.map_batches(load, batch_format="pyarrow", batch_size=1, **remote_args())


def read_packed_shard(out_dir: str, shard: int, capacity: int, packs_per_shard: int = 64) -> list[np.ndarray]:
    """Reassemble one shard's packs: concatenate its parts in NUMERIC bucket
    order and slice into capacity-token arrays (last pack may be short).
    Each part's recorded start_tok is checked against the running stream
    position, so a shard directory with a missing/partial part (interrupted
    run) raises instead of returning silently shifted packs."""
    import glob
    import os

    import pyarrow.parquet as pq

    paths = glob.glob(os.path.join(out_dir, f"shard={shard}", "part-*.parquet"))
    paths.sort(key=lambda p: int(os.path.basename(p)[len("part-") : -len(".parquet")]))
    expected = shard * capacity * packs_per_shard
    streams = []
    for p in paths:
        t = pq.read_table(p)
        start = int(t["start_tok"][0].as_py())
        if start != expected:
            raise ValueError(f"shard {shard} is not contiguous at {p}: starts at {start}, expected {expected} — missing part?")
        chunk = t["tokens"].combine_chunks().flatten().to_numpy(zero_copy_only=False).astype(np.int32, copy=False)
        expected += len(chunk)
        streams.append(chunk)
    flat = np.concatenate(streams) if streams else np.zeros(0, np.int32)
    return [flat[i : i + capacity] for i in range(0, len(flat), capacity)]


def padding_waste(ds, batch_rows: int, length: str = "n_tok", key: str = "doc_id",
                  key_bits: int = 40, max_length: int | None = None):
    """Per-batch padding-waste report for length-sorted batch assembly: sort
    docs by ``(length DESC, key ASC)``, cut consecutive batches of
    ``batch_rows``, and for each batch report ``(n_rows, max_len, sum_len,
    waste = n_rows * max_len - sum_len)`` — the exact token padding cost of
    padding every sequence in a batch to the batch max (the
    length-bucketing question of training-batch assembly). All exact ints;
    SQL-equivalent: ``GROUP BY (row_number() OVER (ORDER BY length DESC,
    key) - 1) // batch_rows``.

    Plan (metadata-only, the `select_by_budget` pinned-block contract):
    project ``composite = (max_length - length) << key_bits | key`` whose
    ascending order IS the batch order; ONE range-partitioned sort +
    materialize pins the blocks; pass A emits one ``(lo, hi, n)`` row per
    block and the driver broadcasts exclusive ROW offsets keyed by each
    block's lo composite (value-keyed — completion order of the two passes
    cannot misalign them); pass B turns local row indices + offset into
    global batch ids and pre-aggregates per (block, batch); a tiny
    ``groupby(batch_id)`` merges straddling blocks. Requires unique
    ``(length, key)`` composites (keys unique suffices) and non-negative
    lengths/keys."""
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    if batch_rows <= 0:
        raise ValueError(f"batch_rows must be positive, got {batch_rows}")
    if max_length is None:
        max_length = ds.max(length)
        if max_length is None:
            return ray.data.from_arrow(pa.table({
                "batch_id": pa.array([], pa.int64()), "n_rows": pa.array([], pa.int64()),
                "max_len": pa.array([], pa.int64()), "sum_len": pa.array([], pa.int64()),
                "waste": pa.array([], pa.int64()),
            }))
    max_length = int(max_length)
    if (max_length + 1) << key_bits >= 1 << 63:
        raise ValueError(f"(max_length+1) << key_bits overflows int64: {max_length} << {key_bits}")

    def to_meta(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = batch[length].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            if keys.min() < 0 or keys.max() >= 1 << key_bits:
                raise ValueError(f"{key!r} must be in [0, 2**{key_bits})")
            if ln.min() < 0 or ln.max() > max_length:
                raise ValueError(f"{length!r} must be in [0, {max_length}]")
        comp = ((np.int64(max_length) - ln) << np.int64(key_bits)) | keys
        return pa.table({"composite": pa.array(comp, pa.int64())})

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort("composite").materialize()

    def block_range(batch: pa.Table) -> pa.Table:
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        if not len(comp):
            return pa.table({c: pa.array([], pa.int64()) for c in ("lo", "hi", "n")})
        return pa.table({
            "lo": pa.array([int(comp[0])], pa.int64()),
            "hi": pa.array([int(comp[-1])], pa.int64()),
            "n": pa.array([batch.num_rows], pa.int64()),
        })

    ranges = pinned.map_batches(
        block_range, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas().sort_values("lo").reset_index(drop=True)
    lo = ranges["lo"].to_numpy()
    hi = ranges["hi"].to_numpy()
    if len(lo) and (np.any(lo > hi) or np.any(hi[:-1] >= lo[1:])):
        raise ValueError("sorted metadata blocks overlap — duplicate (length, key) pairs break the row order")
    n_rows = ranges["n"].to_numpy().astype(np.int64)
    bases = {int(l): int(b) for l, b in zip(lo, np.concatenate(([0], np.cumsum(n_rows)[:-1])))}
    bases_ref = ray.put(bases)

    def per_block(batch: pa.Table) -> pa.Table:
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        out_empty = pa.table({c: pa.array([], pa.int64())
                              for c in ("batch_id", "n_rows", "sum_len", "max_len")})
        if not len(comp):
            return out_empty
        base = ray.get(bases_ref)[int(comp[0])]
        rn = base + np.arange(len(comp), dtype=np.int64)
        ln = np.int64(max_length) - (comp >> np.int64(key_bits))
        df = pd.DataFrame({"batch_id": rn // batch_rows, "ln": ln})
        g = df.groupby("batch_id", as_index=False).agg(
            n_rows=("ln", "size"), sum_len=("ln", "sum"), max_len=("ln", "max"))
        return pa.table({
            "batch_id": pa.array(g["batch_id"].to_numpy(), pa.int64()),
            "n_rows": pa.array(g["n_rows"].to_numpy().astype(np.int64), pa.int64()),
            "sum_len": pa.array(g["sum_len"].to_numpy().astype(np.int64), pa.int64()),
            "max_len": pa.array(g["max_len"].to_numpy().astype(np.int64), pa.int64()),
        })

    partials = pinned.map_batches(
        per_block, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    merged = partials.groupby("batch_id").aggregate(
        Sum("n_rows", alias_name="n_rows"),
        Max("max_len", alias_name="max_len"),
        Sum("sum_len", alias_name="sum_len"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        mx = batch["max_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        sm = batch["sum_len"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column("waste", pa.array(n * mx - sm, pa.int64()))

    return merged.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
