"""The flagship Ray Data pipeline: partition-parallel stripe encoding with
lineage + exact resume, and the decode/verify path.

Shape (SURVEY.md §3.4 / §7): plan byte-budget partitions from parquet
metadata (no shuffle of token payloads — see partition.py), then

    ray.data.from_items(partition specs)
      .map_batches(EncodePartition, batch_size=1, concurrency=N)   # actor pool
      -> lineage rows (tiny)                                        # consume

Each actor task reads its own row-group slice (read co-located with encode:
at cluster scale the raw tokens never transit the object store), encodes one
stripe with per-column auto-selected codecs, writes stripe + manifest record
atomically, and returns only the lineage row. Stats merge driver-side
(partial -> final, stats.py). Resume skips completed pids via the manifest.

Why not groupby(partition_id) over the raw Dataset: the rows are already
contiguous per partition on storage; repartition-by-key would move every
token through the object store to reconstruct locality the input had. The
explicit plan gives the same semantics (byte-budget partitions, skew split)
as a one-pass metadata computation. `encode_blocks` below is the
streaming-Dataset variant for mid-pipeline data that has no stable storage
layout.
"""

from __future__ import annotations

import glob
import os
import time

import numpy as np
import pyarrow as pa

from .. import manifest as mf
from .. import stats as stats_mod
from ..partition import DEFAULT_BUDGET, PartitionSpec, plan_partitions, read_partition
from ..stripe import decode_stripe, encode_table


class EncodePartition:
    """Actor-pool callable: one partition spec row -> one stripe + lineage row.

    Stateful per the north rule: the compressor and codec menus initialize
    once per actor; selector choices are remembered per (column) so stable
    columns skip re-sampling on subsequent partitions handled by this actor.
    """

    def __init__(self, out_dir: str, compression: str = "zstd", level: int = 3, row_index_stride: int | None = 10_000, archive: bool = False):
        self.out_dir = out_dir
        self.compression = compression
        self.level = level
        self.row_index_stride = row_index_stride
        self.archive = archive

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for row in rows:
            spec = PartitionSpec.from_row(row)
            t0 = time.perf_counter()
            tbl = read_partition(spec)
            t_read = time.perf_counter() - t0
            blob, meta = encode_table(tbl, self.compression, self.level, row_index_stride=self.row_index_stride, archive=self.archive)
            t_enc = time.perf_counter() - t0 - t_read
            sp = mf.stripe_path(self.out_dir, spec.pid)
            mf.write_blob_atomic(sp, blob)
            import zlib

            record = {
                "pid": spec.pid,
                "blob_crc32": zlib.crc32(blob),
                "input_fragments": [[s.path, s.row_group, s.row_lo, s.row_hi] for s in spec.slices],
                "codecs": meta["codecs"],
                "num_rows": meta["num_rows"],
                "encoded_bytes": meta["encoded_bytes"],
                "raw_stream_bytes": meta["raw_stream_bytes"],
                "checksum_crc32": meta["checksum_crc32"],
                "wall_sec": time.perf_counter() - t0,
                "read_sec": t_read,
                "encode_sec": t_enc,
            }
            mf.write_record(self.out_dir, record)
            out.append(
                {
                    "pid": spec.pid,
                    "num_rows": record["num_rows"],
                    "encoded_bytes": record["encoded_bytes"],
                    "raw_stream_bytes": record["raw_stream_bytes"],
                    "checksum_crc32": record["checksum_crc32"],
                    "wall_sec": record["wall_sec"],
                    "skipped": False,
                }
            )
        return pa.Table.from_pylist(out)


def _encode_spec_batch(batch: pa.Table, out_dir: str, compression: str, level: int, archive: bool = False) -> pa.Table:
    """Stateless task body: delegates to the same per-spec encode logic."""
    return EncodePartition(out_dir, compression, level, archive=archive)(batch)


def encode_dataset(
    input_paths: list[str] | str,
    out_dir: str,
    budget_bytes: int = DEFAULT_BUDGET,
    compression: str = "zstd",
    level: int = 3,
    resume: bool = True,
    concurrency: int | None = None,
    exact_ntok: bool = True,
    use_actors: bool = False,
    verify_crc: bool = False,
    archive: bool = False,
) -> dict:
    """Encode a tokens-table parquet corpus into stripes. Returns a summary.

    ``archive=True`` selects integer codecs from the cold-tier menu
    (full-column post-zstd argmin INCLUDING rANS entropy coding — smaller
    lakes, ~order-slower token decode; see codecs/rans.py). Default False
    keeps the hot-path menu and existing lakes bit-identical."""
    import ray.data

    if isinstance(input_paths, str):
        input_paths = sorted(glob.glob(os.path.join(input_paths, "*.parquet")) or [input_paths])
    os.makedirs(out_dir, exist_ok=True)
    specs = plan_partitions(input_paths, budget_bytes, exact_ntok=exact_ntok)
    done = mf.load_completed(out_dir, verify_crc=verify_crc) if resume else {}
    # a manifest record only counts as done if it was produced from the SAME
    # partition plan: a changed budget_bytes or changed input files re-plans,
    # and stale pid-matching stripes would otherwise mix two incompatible
    # plans (duplicated/missing rows)
    spec_frags = {s.pid: [[sl.path, sl.row_group, sl.row_lo, sl.row_hi] for sl in s.slices] for s in specs}
    done = {pid: rec for pid, rec in done.items() if rec.get("input_fragments") == spec_frags.get(pid)}
    todo = [s for s in specs if s.pid not in done]

    results: list[dict] = [
        {
            "pid": pid,
            "num_rows": rec["num_rows"],
            "encoded_bytes": rec["encoded_bytes"],
            "raw_stream_bytes": rec["raw_stream_bytes"],
            "checksum_crc32": rec["checksum_crc32"],
            "wall_sec": 0.0,
            "skipped": True,
        }
        for pid, rec in done.items()
    ]

    if todo:
        import functools

        import ray

        from .._rayutil import remote_args

        ds = ray.data.from_items([s.to_row() for s in todo])
        if use_actors:
            # actor-pool path: only worth it when encoders carry cross-batch
            # state (dict/FSST tables shared across stripes)
            if concurrency is None:
                concurrency = max(1, min(len(todo), int(ray.available_resources().get("CPU", 8))))
            lineage = ds.map_batches(
                EncodePartition,
                fn_constructor_kwargs={"out_dir": out_dir, "compression": compression, "level": level, "archive": archive},
                batch_format="pyarrow",
                batch_size=1,
                concurrency=concurrency,
                **remote_args(),
            )
        else:
            # default: stateless task pool. Measured 2.2x faster wall than the
            # ActorPool operator on this workload (per-stripe state resets
            # anyway, mirroring the reference's per-stripe reset at
            # src/writer/stripe.rs:109), and elastic with the cluster.
            fn = functools.partial(_encode_spec_batch, out_dir=out_dir, compression=compression, level=level, archive=archive)
            lineage = ds.map_batches(fn, batch_format="pyarrow", batch_size=1, **remote_args())
        results.extend(lineage.take_all())  # tiny: one row per partition

    summary = {
        "partitions": len(specs),
        "encoded": sum(1 for r in results if not r["skipped"]),
        "skipped": len(done),
        "num_rows": int(sum(r["num_rows"] for r in results)),
        "encoded_bytes": int(sum(r["encoded_bytes"] for r in results)),
        "raw_stream_bytes": int(sum(r["raw_stream_bytes"] for r in results)),
    }
    mf.write_summary(out_dir, summary)
    return summary


def _decode_stripe_batch(batch: pa.Table, columns=None) -> pa.Table:
    """One task = read + decode one stripe file (fused: the blob never
    transits the object store between a read op and a decode op)."""
    tables = [decode_stripe(open(p.as_py(), "rb").read(), columns=columns) for p in batch["path"]]
    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def decode_dataset(out_dir: str, columns: list[str] | None = None):
    """Stripe files -> Ray Dataset of decoded rows (streaming).

    ``columns`` pushes projection into the stripe reader: unselected columns'
    streams are never decompressed or decoded. Read happens INSIDE the
    decode task (one block per stripe path), mirroring the encode side's
    read-in-task design — measured ~25-40% faster than a separate
    read_binary_files stage shipping blobs through the object store. On a
    real cluster this assumes shared storage (same as every other stage).
    """
    import functools

    import ray.data

    from .._rayutil import remote_args

    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))
    ds = ray.data.from_items([{"path": p} for p in paths])
    fn = functools.partial(_decode_stripe_batch, columns=columns)
    return ds.map_batches(fn, batch_format="pyarrow", batch_size=1, **remote_args())


def compact_stripes(out_dir: str, target_bytes: int = 64 * 1024 * 1024, compression: str = "zstd", level: int = 3) -> dict:
    """Maintenance operator: merge many small stripes into target-sized ones.

    The composed streaming pipelines (encode_blocks on filtered survivors)
    can leave undersized stripes; at 100 TB that means too many files and
    per-stripe metadata. Bins are planned driver-side from file SIZES only
    (tiny metadata), each bin decodes+re-encodes in one task, new compacted
    stripes land first and the originals are deleted only after every bin
    succeeded — a crash mid-compaction leaves duplicates (re-runnable), never
    data loss.
    """
    import ray.data

    from .._rayutil import remote_args

    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))
    sizes = {p: os.path.getsize(p) for p in paths}
    bins: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for p in paths:
        if cur and acc + sizes[p] > target_bytes:
            bins.append(cur)
            cur, acc = [], 0
        cur.append(p)
        acc += sizes[p]
    if cur:
        bins.append(cur)
    multi = [b for b in bins if len(b) > 1]
    if not multi:
        return {"compacted": 0, "bins": 0, "num_rows": 0}

    def work(batch: pa.Table) -> pa.Table:
        import hashlib

        out = []
        for srcs in batch["paths"].to_pylist():
            tables = [decode_stripe(open(p, "rb").read()) for p in srcs]
            merged = pa.concat_tables(tables)
            blob, meta = encode_table(merged, compression, level)
            digest = hashlib.sha256(blob).hexdigest()[:32]
            sp = os.path.join(out_dir, f"compact-{digest}-{meta['num_rows']}.stripe")
            mf.write_blob_atomic(sp, blob)
            out.append({"path": sp, "sources": list(srcs), "num_rows": meta["num_rows"], "encoded_bytes": meta["encoded_bytes"]})
        return pa.Table.from_pylist(out)

    ds = ray.data.from_items([{"paths": b} for b in multi])
    lineage = ds.map_batches(work, batch_format="pyarrow", batch_size=1, **remote_args()).take_all()
    for rec in lineage:  # all bins succeeded: retire the originals
        for p in rec["sources"]:
            if os.path.exists(p):
                os.remove(p)
    return {
        "compacted": int(sum(len(r["sources"]) for r in lineage)),
        "bins": len(lineage),
        "num_rows": int(sum(r["num_rows"] for r in lineage)),
    }


class StripeWriter:
    """Push-style incremental writer for the native stripe container — the
    reference's Writer shape (reference src/writer.rs:62-114): push record
    batches, stripes auto-flush at the byte budget, close() flushes the tail
    and returns the lineage records. One writer per shard/actor; each flushed
    stripe is written atomically with a manifest record, so a crashed
    incremental producer loses at most its buffered (unflushed) batches."""

    def __init__(self, out_dir: str, compression: str = "zstd", level: int = 3, stripe_bytes: int = 64 * 1024 * 1024, tag: str = "push"):
        os.makedirs(out_dir, exist_ok=True)
        self.out_dir = out_dir
        self.compression = compression
        self.level = level
        self.stripe_bytes = stripe_bytes
        self.tag = tag
        self._parts: list[pa.Table] = []
        self._buffered = 0
        self._seq = 0
        self.records: list[dict] = []

    def write_batch(self, tbl: pa.Table) -> None:
        if tbl.num_rows == 0:
            return
        self._parts.append(tbl)
        self._buffered += tbl.nbytes
        if self._buffered > self.stripe_bytes:
            self._flush()

    def _flush(self) -> None:
        if not self._parts:
            return
        sub = pa.concat_tables(self._parts)
        self._parts = []
        self._buffered = 0
        blob, meta = encode_table(sub, self.compression, self.level)
        sp = os.path.join(self.out_dir, f"{self.tag}-{self._seq:05d}.stripe")
        mf.write_blob_atomic(sp, blob)
        rec = {"path": sp, "seq": self._seq, "num_rows": meta["num_rows"], "encoded_bytes": meta["encoded_bytes"], "checksum_crc32": meta["checksum_crc32"]}
        self.records.append(rec)
        self._seq += 1

    def close(self) -> dict:
        self._flush()
        return {
            "stripes": len(self.records),
            "num_rows": int(sum(r["num_rows"] for r in self.records)),
            "encoded_bytes": int(sum(r["encoded_bytes"] for r in self.records)),
            "records": self.records,
        }


def encode_blocks(ds, out_dir: str, compression: str = "zstd", level: int = 3, tag: str = "blocks", stripe_bytes: int = 64 * 1024 * 1024):
    """Streaming variant: stripes cut from Dataset blocks by byte budget (for
    mid-pipeline data without a stable storage layout; pids are
    block-order-dependent, so this path trades exact resume for generality).

    ``stripe_bytes`` is the auto-flush budget mirroring the reference's
    estimated_size-triggered stripe flush (reference src/writer.rs:84-90): a
    Dataset block bigger than the budget is sliced into several stripes
    instead of becoming one oversized blob."""
    import functools

    import ray.data  # noqa: F401

    os.makedirs(out_dir, exist_ok=True)

    def _emit(tbl: pa.Table) -> dict:
        import hashlib

        blob, meta = encode_table(tbl, compression, level)
        # content-derived name: deterministic across processes (no salted
        # hash()); identical blocks re-written idempotently. 128-bit
        # digest: a 32-bit CRC key birthday-collides (and silently
        # overwrites) around ~77k same-size blocks
        digest = hashlib.sha256(blob).hexdigest()[:32]
        sp = os.path.join(out_dir, f"block-{digest}-{meta['num_rows']}.stripe")
        mf.write_blob_atomic(sp, blob)
        return {"path": sp, "num_rows": meta["num_rows"], "encoded_bytes": meta["encoded_bytes"]}

    def _encode_block(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        per_row = max(1, batch.nbytes // max(n, 1))
        rows_per_stripe = max(1, int(stripe_bytes // per_row))
        out = []
        for lo in range(0, max(n, 1), rows_per_stripe):
            piece = batch.slice(lo, min(rows_per_stripe, n - lo)) if n else batch
            out.append(_emit(piece))
            if n == 0:
                break
        return pa.Table.from_pylist(out)

    from .._rayutil import remote_args

    # stateless TASK pool (no per-actor state to keep; measured faster than
    # the actor operator on this workload, and it composes safely: two fixed
    # actor pools in one pipeline can reserve more CPUs than a small cluster
    # has and deadlock the executor)
    return ds.map_batches(
        _encode_block,
        batch_format="pyarrow",
        batch_size=None,
        zero_copy_batch=True,
        **remote_args(),
    )


def value_counts_dataset(out_dir: str, column: str):
    """Distributed value histogram of one integer (or list-of-integer)
    column over an encoded stripe lake, WITHOUT materializing the column:
    each task folds one stripe through ``stripe.column_value_counts``
    (run-level RLEv1 pushdown where the codec allows) and ships only its
    (value, count) pairs; ONE groupby folds them. Returns a Ray Dataset of
    ``(value:int64, cnt:int64)`` — at 10^12 tokens the payload never
    re-expands and the shuffle carries |vocab| cells per stripe."""
    import functools

    import ray.data
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args
    from ..stripe import column_value_counts

    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))

    def partial(batch: pa.Table) -> pa.Table:
        vs, cs = [], []
        for p in batch["path"]:
            v, c = column_value_counts(open(p.as_py(), "rb").read(), column)
            vs.append(v)
            cs.append(c)
        v = np.concatenate(vs) if vs else np.zeros(0, np.int64)
        c = np.concatenate(cs) if cs else np.zeros(0, np.int64)
        return pa.table({"value": pa.array(v), "cnt_p": pa.array(c)})

    return (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(partial, batch_format="pyarrow", batch_size=1, **remote_args())
        .groupby("value")
        .aggregate(Sum("cnt_p", alias_name="cnt"))
    )


def column_agg_dataset(out_dir: str, column: str) -> dict:
    """Distributed non-null count/sum/min/max of one integer (or
    list-of-integer) column over an encoded stripe lake WITHOUT
    materializing it: each task folds one stripe through
    ``stripe.column_int_aggregates`` (run-level pushdown for
    RLEv1/RLEv2/dict streams) and ships ONE metadata row; the driver folds
    file rows in exact Python ints. Returns {n, sum, min, max}."""
    import ray.data

    from .._rayutil import remote_args
    from ..stripe import column_int_aggregates

    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))
    if not paths:
        raise FileNotFoundError(f"no .stripe files under {out_dir}")

    def partial(batch: pa.Table) -> pa.Table:
        rows = {"n_p": [], "sum_p": [], "min_p": [], "max_p": []}
        for p in batch["path"]:
            agg = column_int_aggregates(open(p.as_py(), "rb").read(), column)
            if abs(agg["sum"]) >= 1 << 62:
                raise ValueError(f"per-stripe sum of {column} exceeds 2^62 — fold driver-side")
            rows["n_p"].append(agg["n"])
            rows["sum_p"].append(agg["sum"])
            rows["min_p"].append(agg["min"] if agg["min"] is not None else np.iinfo(np.int64).max)
            rows["max_p"].append(agg["max"] if agg["max"] is not None else np.iinfo(np.int64).min)
        return pa.table({k: pa.array(v, pa.int64()) for k, v in rows.items()})

    per = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(partial, batch_format="pyarrow", batch_size=1, **remote_args())
        .to_pandas()
    )
    n = int(per["n_p"].sum())
    return {
        "n": n,
        "sum": sum(int(x) for x in per["sum_p"]),  # Python ints — exact
        "min": int(per["min_p"].min()) if n else None,
        "max": int(per["max_p"].max()) if n else None,
    }


def string_value_counts_dataset(out_dir: str, column: str):
    """Distributed non-null string histogram over an encoded stripe lake
    via the dict-index pushdown (stripe.column_string_value_counts): each
    task folds one stripe and ships only (value, count) cells plus its
    chunk-engagement stats; ONE tiny groupby merges. Returns a Dataset of
    ``(value, cnt, dict_p, direct_p)`` — sum dict_p/direct_p driver-side
    for engagement reporting (inflated by #values per stripe; treat as
    engagement>0 signals, not exact chunk counts)."""
    import ray.data
    from ray.data.aggregate import Max, Sum

    from .._rayutil import remote_args
    from ..stripe import column_string_value_counts_stats

    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))
    if not paths:
        raise FileNotFoundError(f"no .stripe files under {out_dir}")

    def partial(batch: pa.Table) -> pa.Table:
        vs, cs, dp, rp = [], [], [], []
        for p in batch["path"]:
            v, c, st = column_string_value_counts_stats(open(p.as_py(), "rb").read(), column)
            vs.extend(v)
            cs.extend(c.tolist())
            dp.extend([st["dict_chunks"]] * len(v))
            rp.extend([st["direct_chunks"]] * len(v))
        return pa.table(
            {
                "value": pa.array(vs, pa.string()),
                "cnt_p": pa.array(cs, pa.int64()),
                "dict_p": pa.array(dp, pa.int64()),
                "direct_p": pa.array(rp, pa.int64()),
            }
        )

    return (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(partial, batch_format="pyarrow", batch_size=1, **remote_args())
        .groupby("value")
        .aggregate(
            Sum("cnt_p", alias_name="cnt"),
            Max("dict_p", alias_name="dict_seen"),
            Max("direct_p", alias_name="direct_seen"),
        )
    )


# ------------------------------------------------- predicate pushdown reads

_PRED_OPS = ("==", "<", "<=", ">", ">=", "in")


def _pred_dnf(predicate):
    """Normalize the house predicate grammar (one triple / list-of-triples
    AND / list-of-lists DNF — the read_orc_filtered rules) to DNF."""
    if isinstance(predicate, tuple):
        return [[predicate]]
    if isinstance(predicate, list) and predicate and isinstance(predicate[0], tuple):
        return [list(predicate)]
    if isinstance(predicate, list) and predicate and isinstance(predicate[0], list):
        return [list(c) for c in predicate]
    raise ValueError("predicate must be a triple, a list of triples, or a DNF list of lists")


def _stats_may_match(op, value, st: dict) -> bool:
    """Conservative range check against a stripe/chunk stats dict. Unknown
    kinds (timestamp millis-floor, generic) never prune — correctness
    first; the exact post-filter decides."""
    kind = st.get("kind")
    mn, mx = st.get("min"), st.get("max")
    if kind not in ("long", "double", "string") or mn is None or mx is None:
        return True
    vals = value if op == "in" else [value]
    member = "==" if op == "in" else op
    for v in vals:
        try:
            if member == "==" and mn <= v <= mx:
                return True
            if member == "<" and mn < v:
                return True
            if member == "<=" and mn <= v:
                return True
            if member == ">" and mx > v:
                return True
            if member == ">=" and mx >= v:
                return True
        except TypeError:  # cross-type compare: never prune
            return True
    return False


def _read_stripe_header(path: str):
    """Header-only read: the native blob leads with magic + varint(len) +
    header JSON, so pruning needs no payload bytes."""
    from ..stripe import read_header

    size = os.path.getsize(path)
    want = min(size, 1 << 16)
    with open(path, "rb") as f:
        buf = f.read(want)
        while True:
            try:
                return read_header(buf)[0]
            except (ValueError, KeyError, Exception):
                if len(buf) >= size:
                    raise
                buf += f.read(min(size - len(buf), max(len(buf), 1 << 16)))


def decode_dataset_filtered(
    out_dir: str,
    predicate,
    columns: list[str] | None = None,
):
    """Predicate-pushdown streaming read of a stripe lake: files prune from
    HEADER-ONLY reads (stripe stats; payload bytes untouched), surviving
    stripes prune at CHUNK (row-group) level inside the task and decode
    only covering ranges, and an exact Arrow filter decides every row (the
    read_orc_filtered contract: stats only PRUNE, never admit). Returns
    ``(Dataset, plan)`` where plan reports files_total/files_read and the
    per-file decision, so callers can assert pruning engaged.

    Grammar: one ``(col, op, value)`` triple; a list of triples ANDs; a
    list of LISTS is DNF (OR of ANDs). Ops: == < <= > >= in. Timestamp
    columns never prune (their stats are floor-millis — conservative),
    but still filter exactly."""
    import functools

    import pyarrow.compute as pc
    import ray.data

    from .._rayutil import remote_args
    from ..stripe import decode_stripe, read_header

    dnf = _pred_dnf(predicate)
    for conj in dnf:
        for col, op, _v in conj:
            if op not in _PRED_OPS:
                raise ValueError(f"unsupported predicate op {op!r}")

    pred_cols = sorted({c for conj in dnf for c, _o, _v in conj})
    paths = sorted(glob.glob(os.path.join(out_dir, "*.stripe")))
    keep_paths = []
    for p in paths:
        header = _read_stripe_header(p)
        by_name = {r["name"]: r for r in header["columns"]}
        ok = any(
            all(
                _stats_may_match(op, v, by_name[col]["stats"]) if col in by_name else True
                for col, op, v in conj
            )
            for conj in dnf
        )
        if ok:
            keep_paths.append(p)
    plan = {"files_total": len(paths), "files_read": len(keep_paths)}

    read_cols = None
    if columns is not None:
        read_cols = sorted(set(columns) | set(pred_cols))

    def task(batch: pa.Table) -> pa.Table:
        outs = []
        for pth in batch["path"]:
            blob = open(pth.as_py(), "rb").read()
            header, _ = read_header(blob)
            by_name = {r["name"]: r for r in header["columns"]}
            n = header["num_rows"]
            # chunk-level prune where every referenced column is chunked
            # at one shared stride
            ranges = [(0, n)]
            chunked = [by_name[c] for c in pred_cols if c in by_name and "chunks" in by_name[c]]
            if chunked and all("chunks" in by_name.get(c, {}) for c in pred_cols if c in by_name):
                strides = {r["stride"] for r in chunked}
                counts = {len(r["chunks"]) for r in chunked}
                if len(strides) == 1 and len(counts) == 1:
                    stride = strides.pop()
                    n_chunks = counts.pop()
                    keep = []
                    for k in range(n_chunks):
                        ok = any(
                            all(
                                _stats_may_match(
                                    op, v, by_name[col]["chunks"][k]["stats"]
                                ) if col in by_name else True
                                for col, op, v in conj
                            )
                            for conj in dnf
                        )
                        keep.append(ok)
                    ranges = []
                    k = 0
                    while k < n_chunks:
                        if keep[k]:
                            j = k
                            while j + 1 < n_chunks and keep[j + 1]:
                                j += 1
                            ranges.append((k * stride, min((j + 1) * stride, n)))
                            k = j + 1
                        else:
                            k += 1
            for lo, hi in ranges:
                tbl = decode_stripe(blob, columns=read_cols, row_range=(lo, hi))
                mask = None
                for conj in dnf:
                    cmask = None
                    for col, op, v in conj:
                        if col not in tbl.column_names:
                            continue  # evolved-away column: no constraint
                        if op == "in":
                            m = pc.is_in(tbl[col], value_set=pa.array(v))
                        else:
                            ops = {"==": pc.equal, "<": pc.less, "<=": pc.less_equal,
                                   ">": pc.greater, ">=": pc.greater_equal}
                            m = ops[op](tbl[col], pa.scalar(v, tbl[col].type))
                        cmask = m if cmask is None else pc.and_kleene(cmask, m)
                    if cmask is None:
                        cmask = pa.array(np.ones(len(tbl), bool))
                    mask = cmask if mask is None else pc.or_kleene(mask, cmask)
                tbl = tbl.filter(pc.fill_null(mask, False))
                if columns is not None:
                    tbl = tbl.select([c for c in columns if c in tbl.column_names])
                outs.append(tbl)
        if not outs:
            # typed-empty: decode 0 rows of the first path's schema
            blob = open(batch["path"][0].as_py(), "rb").read()
            t0 = decode_stripe(blob, columns=read_cols, row_range=(0, 0))
            if columns is not None:
                t0 = t0.select([c for c in columns if c in t0.column_names])
            return t0
        return pa.concat_tables(outs, promote_options="default")

    if not keep_paths:
        # all files pruned: empty Dataset with the right schema from any header
        src = paths[0] if paths else None
        if src is None:
            raise FileNotFoundError(f"no .stripe files under {out_dir}")
        blob = open(src, "rb").read()
        t0 = decode_stripe(blob, columns=read_cols, row_range=(0, 0))
        if columns is not None:
            t0 = t0.select([c for c in columns if c in t0.column_names])
        return ray.data.from_arrow(t0), plan

    ds = ray.data.from_items([{"path": p} for p in keep_paths])
    return (
        ds.map_batches(task, batch_format="pyarrow", batch_size=1, **remote_args()),
        plan,
    )
