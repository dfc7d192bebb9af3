"""ORC file compaction by raw stripe copy — no decode, no re-encode.

Distributed writes produce one ORC file per Dataset block
(``orcfile.write_orc_dataset``); at 100 TB that is millions of smallish
files, and small files are the classic read-amplification killer for any
columnar store. ORC stripes are fully self-contained (each stripe carries
its own streams, dictionary, ROW_INDEX/bloom index region, StripeFooter and
writer timezone — reference src/writer/stripe.rs:81-111), so same-schema
files can be concatenated by copying stripe byte ranges verbatim and
rebuilding only the file tail (Metadata, Footer, PostScript). This is the
same trick as Java ORC's ``OrcFile.mergeFiles``; per-stripe statistics are
copied at the protobuf-wire level and file-level statistics are re-merged
through :mod:`orc_format_ray.stats` (stripe->file fold, reference
src/writer.rs:121-130).

Scale shape: a merge task streams input stripes in 8 MiB chunks (bounded
memory regardless of stripe size) and parses only file *tails* (a few KiB
per input). ``compact_orc_dataset`` bins files by SIZE, checks layout
drift with one tail read per file (the lone O(files) driver I/O step —
lift it into a Ray map if the file listing outgrows the driver), then fans
the merges out as stateless Ray tasks; output files are written
atomically, so a re-run skips finished parts (resume).
"""

from __future__ import annotations

import os
import struct
from decimal import Decimal

from . import stats as stats_mod
from .orcfile import _KIND_IDS, _orc_frame, _ORC_BLOCK, Msg
from .orcread import _COMP_NAMES, _deframe, _fields, _Source, _unzigzag

_COPY_CHUNK = 8 * 1024 * 1024

# ORC type kind -> stats.ColumnStats kind (orc_proto ColumnStatistics arms)
_STATS_KIND = {
    "BOOLEAN": "boolean",
    "BYTE": "long",
    "SHORT": "long",
    "INT": "long",
    "LONG": "long",
    "DATE": "long",
    "FLOAT": "double",
    "DOUBLE": "double",
    "STRING": "string",
    "VARCHAR": "string",
    "CHAR": "string",
    "BINARY": "binary",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_INSTANT": "timestamp",
    "DECIMAL": "decimal",
}


def _tail_raw(src: _Source) -> dict:
    """Parse PostScript + raw Footer fields + raw Metadata submessages.

    Unlike ``orcread._parse_tail`` this keeps the *wire bytes* of the type
    list, the file statistics and each per-stripe StripeStatistics message,
    so a merge can copy them without understanding every field."""
    tail_len = min(src.size, 64 * 1024)
    tail = src.read(src.size - tail_len, tail_len)
    ps_len = tail[-1]
    ps = _fields(tail[-1 - ps_len : -1])
    footer_len = ps[1][0]
    comp_id = ps.get(2, [0])[0]
    comp = _COMP_NAMES[comp_id]
    block = ps.get(3, [0])[0]
    meta_len = ps.get(5, [0])[0]
    if 1 + ps_len + footer_len <= tail_len:
        footer_raw = tail[tail_len - 1 - ps_len - footer_len : tail_len - 1 - ps_len]
    else:
        footer_raw = src.read(src.size - 1 - ps_len - footer_len, footer_len)
    f = _fields(_deframe(footer_raw, comp))
    meta_raw = src.read(src.size - 1 - ps_len - footer_len - meta_len, meta_len)
    stripe_stats = _fields(_deframe(meta_raw, comp)).get(1, []) if meta_len else []
    stripes = []
    for s in f.get(3, []):
        sf = _fields(s)
        stripes.append(
            (
                sf[1][0],  # offset
                sf.get(2, [0])[0],  # index length
                sf[3][0],  # data length
                sf[4][0],  # footer length
                sf[5][0],  # rows
            )
        )
    return {
        "compression": comp,
        "block_size": block,
        "stripes": stripes,
        "types_raw": f.get(4, []),
        "num_rows": f.get(6, [0])[0],
        "file_stats_raw": f.get(7, []),
        "stripe_stats_raw": stripe_stats,
        "row_index_stride": f.get(8, [0])[0],
        # readers key stats-trust workarounds on writerVersion (e.g. string
        # min/max are ignored below HIVE-8732), so a merge must carry the
        # weakest input claim forward, never upgrade it
        "file_version_raw": ps.get(4, []),
        "writer_version": ps.get(6, [0])[0],
    }


# ----------------------------------------------------------- stats wire parse


def _stats_parse(buf: bytes, orc_kind: str, scale: int | None) -> stats_mod.ColumnStats | None:
    """Inverse of ``orcfile._stats_proto`` for the fields this engine emits
    (which are the standard orc_proto arms, so foreign writers parse too).

    Returns None when the stats can't be merged faithfully — a typed arm is
    absent although values exist, so min/max are unknown for this slice and
    any merged min/max would be a lie. Callers must then omit file-level
    statistics entirely (omission is always valid ORC)."""
    f = _fields(buf)
    num_present = f.get(1, [0])[0]
    has_null = bool(f.get(10, [0])[0])
    kind = _STATS_KIND.get(orc_kind, "generic")
    s = stats_mod.ColumnStats(kind=kind, num_present=num_present)
    # hasNull is a bool on the wire; one phantom null row makes the
    # num_values != num_present property round-trip through merge()
    s.num_values = num_present + (1 if has_null else 0)
    if kind == "generic":
        return s
    if kind == "long":
        sub = f.get(2, []) or f.get(7, [])  # intStatistics | dateStatistics
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        if 1 in g:
            s.min = _unzigzag(g[1][0])
            s.max = _unzigzag(g[2][0])
        elif num_present:
            return None
        if 3 in g:
            s.sum = _unzigzag(g[3][0])
        elif num_present and f.get(2):  # dateStatistics has no sum arm
            s.sum_overflowed = True
    elif kind == "double":
        sub = f.get(3, [])
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        if 1 in g and (3 in g or not num_present):
            s.min = struct.unpack("<d", g[1][0])[0]
            s.max = struct.unpack("<d", g[2][0])[0]
            s.sum = struct.unpack("<d", g[3][0])[0] if 3 in g else None
        elif num_present:
            # no sum arm: ColumnStats has no double-overflow marker, so a
            # partial merged sum would be a lie — refuse
            return None
    elif kind == "string":
        sub = f.get(4, [])
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        if 1 in g:
            s.min = g[1][0].decode()
            s.max = g[2][0].decode()
        elif num_present:
            return None
        if 3 in g:
            s.sum_lengths = _unzigzag(g[3][0])
        elif num_present:
            return None  # merged sum(lengths) would understate
        else:
            s.sum_lengths = 0
    elif kind == "boolean":
        sub = f.get(5, [])
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        trues = g.get(1, [0])
        nt = trues[0]
        if isinstance(nt, bytes):  # packed repeated
            from .orcread import _packed_uvs

            nt = (_packed_uvs(trues) or [0])[0]
        s.num_true = int(nt)
        s.num_false = num_present - s.num_true
    elif kind == "binary":
        sub = f.get(8, [])
        g = _fields(sub[0]) if sub else {}
        if 1 in g:  # BinaryStatistics.sum = 1
            s.sum_lengths = _unzigzag(g[1][0])
        elif num_present:
            return None  # merged sum(lengths) would understate
        else:
            s.sum_lengths = 0
    elif kind == "timestamp":
        sub = f.get(9, [])
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        lo = g.get(3, g.get(1))  # prefer minimumUtc over minimum
        hi = g.get(4, g.get(2))
        if lo is not None and hi is not None:
            s.min = _unzigzag(lo[0])
            s.max = _unzigzag(hi[0])
        elif num_present:
            return None
    elif kind == "decimal":
        sub = f.get(6, [])
        if not sub:
            return None if num_present else s
        g = _fields(sub[0])
        if 1 not in g:
            return None if num_present else s
        if scale is None:
            return None

        def unscale(raw: bytes):
            d = Decimal(raw.decode()).scaleb(scale)
            if d != d.to_integral_value():
                raise ValueError(f"decimal stat {raw!r} not at scale {scale}")
            return str(int(d))

        s.min = unscale(g[1][0])
        s.max = unscale(g[2][0])
        if 3 in g:
            s.sum = unscale(g[3][0])
    return s


def _merge_file_stats(tails: list[dict]) -> list[bytes] | None:
    """Merge the per-file footer statistics of every input at the wire
    level. Returns the merged ColumnStatistics messages (bytes, column-id
    order), or None when any column of any input is unmergeable — repeated
    footer stats are positional, so it is all-or-nothing."""
    from .orcfile import _stats_proto

    live = [t for t in tails if t["num_rows"] > 0]
    if not live:
        return []
    n_cols = len(live[0]["types_raw"])
    kinds: list[str] = []
    scales: list[int | None] = []
    from .orcread import _KIND_NAMES

    for traw in live[0]["types_raw"]:
        tf = _fields(traw)
        kinds.append(_KIND_NAMES[tf.get(1, [0])[0]])
        scales.append(tf.get(6, [None])[0] if tf.get(1, [0])[0] == 14 else None)  # 14 = DECIMAL
    per_col: list[list[stats_mod.ColumnStats]] = [[] for _ in range(n_cols)]
    for t in live:
        raw = t["file_stats_raw"]
        if len(raw) != n_cols:
            return None  # a file without (or with misaligned) stats
        for i in range(n_cols):
            parsed = _stats_parse(raw[i], kinds[i], scales[i])
            if parsed is None:
                return None
            per_col[i].append(parsed)
    out = []
    for i in range(n_cols):
        merged = stats_mod.merge_all(per_col[i])
        out.append(_stats_proto(merged, scales[i]).tobytes())
    return out


# ------------------------------------------------------------------ the merge


def merge_orc_files(paths: list[str], out_path: str, level: int = 3) -> dict:
    """Concatenate same-schema ORC files into one by raw stripe copy.

    Every input must share the type list, compression kind, compression
    block size, rowIndexStride and file version (stripes are copied
    verbatim, so all five are baked into the copied bytes); the PostScript
    carries the weakest input writerVersion forward. The output is written
    atomically (tmp + rename; tmp removed on error). Returns {"num_rows",
    "file_bytes", "stripes", "has_file_stats"}."""
    if not paths:
        raise ValueError("merge_orc_files needs at least one input")
    tails = []
    for p in paths:
        with _Source(p) as src:
            tails.append(_tail_raw(src))
    t0 = tails[0]
    if t0["compression"] not in _KIND_IDS:
        raise NotImplementedError(f"cannot re-frame tail with read-only codec {t0['compression']!r}")
    ref_types = t0["types_raw"]
    for p, t in zip(paths[1:], tails[1:]):
        if t["types_raw"] != ref_types:
            raise ValueError(f"schema mismatch: {p!r} differs from {paths[0]!r}")
        if t["compression"] != t0["compression"] or t["block_size"] != t0["block_size"]:
            raise ValueError(f"compression mismatch: {p!r} ({t['compression']}/{t['block_size']})")
        if t["row_index_stride"] != t0["row_index_stride"]:
            raise ValueError(f"rowIndexStride mismatch: {p!r}")
        if t["file_version_raw"] != t0["file_version_raw"]:
            raise ValueError(f"file version mismatch: {p!r}")
    comp = t0["compression"]
    # tail frames must decode within the declared compressionBlockSize —
    # readers allocate buffers of exactly that size
    tail_block = min(_ORC_BLOCK, t0["block_size"]) if t0["block_size"] else _ORC_BLOCK
    # never claim a newer writer than the weakest input (stats-trust gates)
    writer_version = min(t["writer_version"] for t in tails)

    tmp = out_path + ".tmp"
    stripe_infos: list[tuple[int, int, int, int, int]] = []
    # per-stripe Metadata is all-or-nothing: one input without (or with
    # misaligned) StripeStatistics and the merged file carries none
    stats_ok = all(len(t["stripe_stats_raw"]) == len(t["stripes"]) for t in tails)
    stripe_stats: list[bytes] = []
    try:
        merged_stats = _write_merged(tmp, paths, tails, t0, ref_types, comp, level, tail_block, writer_version, stripe_infos, stripe_stats, stats_ok)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    num_rows = sum(si[4] for si in stripe_infos)
    os.replace(tmp, out_path)
    return {
        "num_rows": num_rows,
        "file_bytes": os.path.getsize(out_path),
        "stripes": len(stripe_infos),
        "has_file_stats": bool(merged_stats),
    }


def _write_merged(tmp, paths, tails, t0, ref_types, comp, level, tail_block, writer_version, stripe_infos, stripe_stats, stats_ok):
    num_rows = 0
    with open(tmp, "wb") as f:
        f.write(b"ORC")
        pos = 3
        for p, t in zip(paths, tails):
            if not t["stripes"]:
                continue
            if stats_ok:
                stripe_stats.extend(t["stripe_stats_raw"])
            with _Source(p) as src:
                for off, ilen, dlen, flen, rows in t["stripes"]:
                    total = ilen + dlen + flen
                    stripe_infos.append((pos, ilen, dlen, flen, rows))
                    copied = 0
                    while copied < total:
                        chunk = src.read(off + copied, min(_COPY_CHUNK, total - copied))
                        if not chunk:
                            raise IOError(f"{p!r}: short read copying stripe at {off}")
                        f.write(chunk)
                        copied += len(chunk)
                    pos += total
                    num_rows += rows
        content_length = pos - 3

        meta = Msg()
        if stats_ok:
            for ss in stripe_stats:
                meta.bytes_(1, ss)
        meta_bytes = _orc_frame(meta.tobytes(), comp, level, block_size=tail_block)
        f.write(meta_bytes)
        pos += len(meta_bytes)

        footer = Msg()
        footer.varint(1, 3).varint(2, content_length)
        for off, ilen, dlen, flen, rows in stripe_infos:
            footer.msg(3, Msg().varint(1, off).varint(2, ilen).varint(3, dlen).varint(4, flen).varint(5, rows))
        for traw in ref_types:
            footer.bytes_(4, traw)
        footer.varint(6, num_rows)
        merged_stats = _merge_file_stats(tails)
        if merged_stats is not None:
            for sb in merged_stats:
                footer.bytes_(7, sb)
        footer.varint(8, t0["row_index_stride"])
        footer_out = _orc_frame(footer.tobytes(), comp, level, block_size=tail_block)
        f.write(footer_out)
        pos += len(footer_out)

        ps = Msg()
        ps.varint(1, len(footer_out)).varint(2, _KIND_IDS[comp])
        ps.varint(3, t0["block_size"])
        for v in t0["file_version_raw"]:  # carry the inputs' version verbatim
            if isinstance(v, bytes):
                ps.bytes_(4, v)
            else:
                ps.varint(4, v)
        ps.varint(5, len(meta_bytes)).varint(6, writer_version)
        ps.string(8000, "ORC")
        ps_bytes = ps.tobytes()
        if len(ps_bytes) > 255:
            raise ValueError("postscript too long")
        f.write(ps_bytes)
        f.write(bytes([len(ps_bytes)]))
    return merged_stats


def read_orc_statistics(path_or_bytes) -> dict[str, stats_mod.ColumnStats]:
    """Parse a file's footer column statistics into ColumnStats BY NAME —
    min/max/sum/counts for every top-level column from the TAIL only (the
    inspect-without-reading API; works on foreign ORC files too). Columns
    whose stats are absent or unparseable are omitted."""
    from .orcread import _parse_tail

    with _Source(path_or_bytes) as src:
        tail = _parse_tail(src)
        raw = _tail_raw(src)
    types = tail["types"]
    root = types[0]
    spans = list(root.subtypes) + [len(types)]
    out: dict[str, stats_mod.ColumnStats] = {}
    for i, name in enumerate(root.field_names):
        col_id = spans[i]
        if col_id >= len(raw["file_stats_raw"]):
            continue
        t = types[col_id]
        parsed = _stats_parse(raw["file_stats_raw"][col_id], t.kind, t.scale if t.kind == "DECIMAL" else None)
        if parsed is not None:
            out[name] = parsed
    return out


def lake_stats(in_dir: str):
    """Per-partition inventory of an ORC directory from file TAILS only:
    one row per file with its partition values (raw strings), row count and
    size — each Ray task preads a few KiB per file, no stripe data moves.
    Aggregate downstream (e.g. groupby partition columns) for the usual
    'rows per partition' health check of a 100-TB lake."""
    import glob

    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .orcfile import _hive_unquote

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")
    items = []
    for p in paths:
        rel = os.path.relpath(os.path.dirname(p), in_dir)
        kvs = {}
        for seg in rel.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                kvs[k] = _hive_unquote(v)
        items.append({"path": p, **{f"part:{k}": v for k, v in kvs.items()}})

    _RESERVED = {"path", "num_rows", "file_bytes", "stripes"}

    def _stat(batch: pa.Table) -> pa.Table:
        rows = []
        for i in range(batch.num_rows):
            p = batch["path"][i].as_py()
            with _Source(p) as src:
                t = _tail_raw(src)
            row = {}
            for c in batch.column_names:
                if c.startswith("part:"):
                    k = c.removeprefix("part:")
                    # a foreign partition key colliding with a reserved output
                    # column keeps its "part:" prefix instead of vanishing
                    row[k if k not in _RESERVED else c] = batch[c][i].as_py()
            row.update({"path": p, "num_rows": t["num_rows"], "file_bytes": os.path.getsize(p), "stripes": len(t["stripes"])})
            rows.append(row)
        return pa.Table.from_pylist(rows)

    return ray.data.from_items(items).map_batches(_stat, batch_format="pyarrow", **remote_args())


# --------------------------------------------------------------- Ray fan-out


def plan_compaction(paths: list[str], target_bytes: int) -> list[list[str]]:
    """Group files into merge bins of ~target_bytes from SIZES only (first-fit
    over the sorted listing — deterministic, so re-runs build the same plan)."""
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for p in sorted(paths):
        sz = os.path.getsize(p)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(p)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


def compact_orc_dataset(
    in_dir: str,
    out_dir: str,
    target_bytes: int = 512 * 1024 * 1024,
    level: int = 3,
    on_schema_drift: str = "error",
    recursive: bool = False,
):
    """Compact a directory of small ORC files into ~target_bytes parts.
    Returns the lineage Dataset (path, num_rows, file_bytes, n_inputs,
    skipped, reencoded).

    Same-schema directories compact by parallel raw stripe copy (no decode).
    When the files drifted across writer generations (schema / compression /
    stride differ), the copy is impossible; ``on_schema_drift`` picks the
    fallback: ``"error"`` (default) raises with the offending file, while
    ``"reencode"`` resolves EVERY file against the unified schema
    (evolve.py) and re-encodes each output part — slower, but the compacted
    directory always comes out single-schema. The drift check is driver-side
    from file TAILS only.

    ``recursive=True`` compacts a Hive-partitioned lake in one call: each
    subdirectory (e.g. ``source=web/lang=en``) compacts independently into
    the mirrored subdirectory of ``out_dir`` — drift checks, bin plans and
    the re-encode target schema are all PER SUBDIRECTORY (partitions of a
    lake written by write_orc_dataset are same-schema by construction, so
    they take the copy path) — and the partition-schema sidecar is carried
    over, so ``read_orc_dataset`` sees the compacted lake identically.

    Parts are named by group index over the deterministic plan and written
    atomically, so a rerun after a failure re-plans identically and skips
    parts that already exist (resume). A skipped part is validated against
    the current plan — its row count must equal its group's input row count
    (tail reads only), so a changed input set fails loudly instead of
    silently keeping stale parts."""
    import glob
    import shutil

    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args

    if on_schema_drift not in ("error", "reencode"):
        raise ValueError(f"on_schema_drift must be 'error' or 'reencode', got {on_schema_drift!r}")
    abs_in, abs_out = os.path.abspath(in_dir), os.path.abspath(out_dir)
    if abs_in == abs_out:
        raise ValueError("out_dir must differ from in_dir (a rerun would consume its own parts)")
    if recursive and os.path.commonpath([abs_in, abs_out]) == abs_in:
        # the recursive glob would pick up the first run's parts as inputs
        raise ValueError("out_dir must not be nested inside in_dir with recursive=True (a rerun would consume its own parts)")
    if recursive:
        all_paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    else:
        all_paths = sorted(glob.glob(os.path.join(in_dir, "*.orc")))
    if not all_paths:
        raise ValueError(f"no .orc files under {in_dir!r}")
    by_subdir: dict[str, list[str]] = {}
    for p in all_paths:
        rel = os.path.relpath(os.path.dirname(p), in_dir)
        by_subdir.setdefault("" if rel == "." else rel, []).append(p)

    # drift detection: the raw-copy invariants are the copied bytes' type
    # list + compression + block size + stride + file version. This is ONE
    # 64 KiB tail read per file on the driver (the only step beyond the
    # sizes-only bin planning); the Arrow schema is then derived per DISTINCT
    # signature, not per file, so unification cost is O(generations)
    targets: dict[str, object] = {}  # subdir -> target schema (None = raw copy)
    items = []
    for subdir, paths in sorted(by_subdir.items()):
        rep_of_sig: dict[tuple, str] = {}
        for p in paths:
            with _Source(p) as src:
                t = _tail_raw(src)
            sig = (tuple(t["types_raw"]), t["compression"], t["block_size"], t["row_index_stride"], tuple(t["file_version_raw"]))
            rep_of_sig.setdefault(sig, p)
        targets[subdir] = None
        if len(rep_of_sig) > 1:
            reps = list(rep_of_sig.values())
            if on_schema_drift == "error":
                raise ValueError(
                    f"schema/layout drift across {os.path.join(in_dir, subdir)!r} ({reps[0]!r} vs {reps[1]!r}); "
                    "pass on_schema_drift='reencode' to unify via schema evolution"
                )
            from .evolve import orc_file_schema, unify_schemas

            targets[subdir] = unify_schemas([orc_file_schema(p) for p in reps])
        for i, g in enumerate(plan_compaction(paths, target_bytes)):
            items.append({"subdir": subdir, "group": i, "paths": g})

    os.makedirs(out_dir, exist_ok=True)
    sidecar = os.path.join(in_dir, "_partition_schema.arrow")
    if recursive and os.path.exists(sidecar):
        dst = os.path.join(out_dir, "_partition_schema.arrow")
        tmp_sc = dst + f".tmp{os.getpid()}"
        shutil.copyfile(sidecar, tmp_sc)
        os.replace(tmp_sc, dst)  # never expose a truncated sidecar

    def _tail_rows(path: str) -> int:
        with _Source(path) as src:
            return int(_tail_raw(src)["num_rows"])

    def _merge_group(batch: pa.Table) -> pa.Table:
        rows = []
        for sub, gid, ps in zip(batch["subdir"], batch["group"], batch["paths"]):
            target_schema = targets[sub.as_py()]
            part_dir = os.path.join(out_dir, sub.as_py()) if sub.as_py() else out_dir
            os.makedirs(part_dir, exist_ok=True)
            out_path = os.path.join(part_dir, f"part-{gid.as_py():05d}.orc")
            inputs = [p for p in ps.as_py()]
            if os.path.exists(out_path):  # atomic rename => existing is complete
                part_rows = _tail_rows(out_path)
                want_rows = sum(_tail_rows(p) for p in inputs)
                if part_rows != want_rows:
                    raise ValueError(
                        f"{out_path!r} holds {part_rows} rows but the current plan's "
                        f"inputs hold {want_rows} — the input set changed since it was "
                        "written; clear out_dir (or point at a fresh one) and rerun"
                    )
                rows.append({"path": out_path, "num_rows": part_rows, "file_bytes": os.path.getsize(out_path), "n_inputs": len(inputs), "skipped": True, "reencoded": False})
                continue
            if target_schema is None:
                info = merge_orc_files(inputs, out_path, level=level)
            else:
                # drift: decode + evolve + re-encode, STREAMED one input at a
                # time through the push writer (auto-flushing stripes) — the
                # group never materializes as one Arrow table
                from .evolve import evolve_table
                from .orcfile import OrcWriter
                from .orcread import read_orc_native

                w = OrcWriter(out_path, target_schema, level=level)
                try:
                    for p in inputs:
                        w.write_batch(evolve_table(read_orc_native(p), target_schema))
                    info = w.close()
                except BaseException:
                    w.abort()
                    raise
            rows.append({"path": out_path, "num_rows": info["num_rows"], "file_bytes": info["file_bytes"], "n_inputs": len(inputs), "skipped": False, "reencoded": target_schema is not None})
        return pa.Table.from_pylist(rows)

    ds = ray.data.from_items(items)
    return ds.map_batches(_merge_group, batch_format="pyarrow", batch_size=1, **remote_args())


def delete_rows(lake_dir: str, key: str, ids, compression: str = "zstd",
                level: int = 3, stripe_rows: int = 250_000,
                row_index_stride: int = 10_000,
                max_broadcast_ids: int = 1 << 26) -> dict:
    """Targeted row deletion across an ORC lake (the GDPR-forget / tombstone
    rewrite): remove every row whose ``key`` is in ``ids``, rewriting ONLY
    the files whose footer ``key`` statistics overlap the tombstone set —
    untouched files keep their bytes and paths (resume- and cache-friendly).
    Works on Hive-partitioned lakes (partition dirs and the schema sidecar
    are preserved; data files don't carry partition columns).

    Plan: one Ray task per file preads the TAIL ONLY and range-checks the
    sorted tombstone array against the footer min/max (``searchsorted`` —
    a file with no overlapping id is provably clean); overlapping files
    re-read natively, filter, and rewrite under a new content-hashed name
    before the old file unlinks (a crashed run leaves both — idempotent
    re-run converges). The tombstone set broadcasts once via ``ray.put``
    (guarded by ``max_broadcast_ids``; shard it beyond that).

    Returns ``{"n_files", "n_rewritten", "n_deleted_rows", "files"}`` where
    ``files`` lists (path, action) — action in {"kept", "rewritten",
    "removed"} ("removed" = every row matched, no replacement written).
    """
    import glob
    import os

    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from ._rayutil import remote_args
    from .orcfile import _content_hash_name, write_orc
    from .orcread import read_orc_native

    id_arr = np.unique(np.asarray(list(ids), dtype=np.int64))
    if id_arr.size > max_broadcast_ids:
        raise ValueError(
            f"{id_arr.size} tombstones exceed max_broadcast_ids={max_broadcast_ids}; "
            "shard the tombstone set (range-partition ids and run per shard)"
        )
    paths = sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    summary = {"n_files": len(paths), "n_rewritten": 0, "n_deleted_rows": 0, "files": []}
    if not paths or not id_arr.size:
        summary["files"] = [(p, "kept") for p in paths]
        return summary
    ids_ref = ray.put(id_arr)

    def probe(batch: pa.Table) -> pa.Table:
        tomb = ray.get(ids_ref)
        out = []
        for p in batch["path"].to_pylist():
            st = read_orc_statistics(p).get(key)
            if st is None or st.min is None or st.max is None:
                touch = True  # stats missing: cannot prove clean — rewrite path decides
            else:
                lo = int(np.searchsorted(tomb, int(st.min), side="left"))
                hi = int(np.searchsorted(tomb, int(st.max), side="right"))
                touch = hi > lo
            out.append({"path": p, "touch": touch})
        return pa.Table.from_pylist(out)

    plan = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(probe, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )

    def rewrite(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc_

        tomb = ray.get(ids_ref)
        rows = []
        for p in batch["path"].to_pylist():
            tbl = read_orc_native(p)
            k = tbl[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
            pos = np.searchsorted(tomb, k)
            pos[pos == len(tomb)] = 0
            hit = tomb[pos] == k
            n_del = int(hit.sum())
            if n_del == 0:
                rows.append({"path": p, "action": "kept", "n_deleted": 0})
                continue
            keep = tbl.filter(pa.array(~hit))
            if keep.num_rows:
                newp = os.path.join(os.path.dirname(p), _content_hash_name(keep))
                if os.path.abspath(newp) != os.path.abspath(p):
                    write_orc(keep, newp, compression, level, stripe_rows=stripe_rows,
                              row_index_stride=row_index_stride)
                    os.remove(p)
                rows.append({"path": newp, "action": "rewritten", "n_deleted": n_del})
            else:
                os.remove(p)
                rows.append({"path": p, "action": "removed", "n_deleted": n_del})
        return pa.Table.from_pylist(rows)

    touched = plan[plan["touch"]]["path"].tolist()
    for p in plan[~plan["touch"]]["path"]:
        summary["files"].append((p, "kept"))
    if touched:
        res = (
            ray.data.from_items([{"path": p} for p in touched])
            .map_batches(rewrite, batch_format="pyarrow", **remote_args())
            .to_pandas()
        )
        for path, action, n_del in res[["path", "action", "n_deleted"]].itertuples(index=False):
            summary["files"].append((path, action))
            summary["n_deleted_rows"] += int(n_del)
            if action in ("rewritten", "removed"):
                summary["n_rewritten"] += 1
    summary["files"].sort()
    return summary


def upsert_rows(lake_dir: str, key: str, ds_new, partition_by: list[str] | None = None,
                compression: str = "zstd", level: int = 3, stripe_rows: int = 250_000,
                row_index_stride: int = 10_000,
                max_broadcast_ids: int = 1 << 26) -> dict:
    """MERGE INTO for an ORC lake: rows of ``ds_new`` REPLACE existing lake
    rows with the same ``key`` (update) and append otherwise (insert) —
    composed as stats-pruned ``delete_rows`` of the incoming key set
    followed by an idempotent ``write_orc_dataset`` append (content-hashed
    names; the partition sidecar is reused). The upsert batch is the SMALL
    side by design (a CDC tick, not a re-load): its keys broadcast once,
    guarded by ``max_broadcast_ids`` — shard the batch beyond that.

    ``ds_new`` is a ``ray.data.Dataset`` or a ``pyarrow.Table``; its schema
    must match the lake's write schema (same columns incl. ``partition_by``)
    — reader-side evolution handles additive drift, but a silently narrower
    upsert file would null-fill on read. Keys must be unique WITHIN the
    batch (two updates for one key in a single merge are ambiguous —
    rejected loudly, the apply_changes rule). Crash between the delete and
    the append loses no base data (deletes are key-targeted rewrites) but
    can drop the in-flight upsert rows — re-run the same batch; both legs
    are idempotent.

    Returns ``{"n_deleted_rows", "n_rewritten", "n_files_before",
    "n_appended_rows", "n_new_files"}``."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from .orcfile import write_orc_dataset

    if isinstance(ds_new, pa.Table):
        ds_new = ray.data.from_arrow(ds_new)
    key_df = ds_new.select_columns([key]).to_pandas()
    keys = key_df[key].to_numpy()
    if len(keys) > max_broadcast_ids:
        raise ValueError(
            f"upsert batch has {len(keys)} keys > max_broadcast_ids={max_broadcast_ids}; "
            "shard the batch (range-partition keys and merge per shard)"
        )
    uniq = np.unique(keys.astype(np.int64))
    if uniq.size != len(keys):
        raise ValueError("upsert keys must be unique within the batch — two updates for one key are ambiguous")
    dsum = delete_rows(
        lake_dir, key, uniq, compression=compression, level=level,
        stripe_rows=stripe_rows, row_index_stride=row_index_stride,
        max_broadcast_ids=max_broadcast_ids,
    )
    lineage = write_orc_dataset(
        ds_new, lake_dir, compression=compression, level=level, stripe_rows=stripe_rows,
        row_index_stride=row_index_stride, partition_by=partition_by,
    ).to_pandas()
    return {
        "n_deleted_rows": dsum["n_deleted_rows"],
        "n_rewritten": dsum["n_rewritten"],
        "n_files_before": dsum["n_files"],
        "n_appended_rows": int(lineage["num_rows"].sum()),
        "n_new_files": len(lineage),
    }


def snapshot_lake(lake_dir: str, snap_root: str, name: str | None = None) -> dict:
    """Zero-copy snapshot of an ORC lake for time travel: hard-link every
    file (data + partition sidecar) into ``snap_root/<name>``, preserving
    the directory layout, plus a manifest JSON. The snapshot is itself a
    fully readable lake (``read_orc_dataset`` works on it directly).

    Why hard links are CORRECT here, not just cheap: lake files are
    write-once under content-hashed names — ``delete_rows`` / ``upsert_rows``
    / compaction always write a NEW name and unlink the old, never mutate
    in place — so a linked inode can never change under the snapshot, and
    the live lake's rewrites don't free the snapshot's bytes until vacuum.
    Requires ``snap_root`` on the same filesystem (hard links don't cross
    devices; the loud EXDEV surfaces otherwise).

    Returns ``{"name", "dir", "n_files", "total_bytes"}``.
    ``drop_snapshot(snap_root, name)`` vacuums one snapshot."""
    import glob
    import json
    import os

    if name is None:
        existing = sorted(
            d for d in (os.listdir(snap_root) if os.path.isdir(snap_root) else [])
            if d.startswith("v")
        )
        name = f"v{len(existing) + 1:05d}"
    snap_dir = os.path.join(snap_root, name)
    if os.path.exists(snap_dir):
        raise ValueError(f"snapshot {name!r} already exists")
    files = sorted(
        p for p in glob.glob(os.path.join(lake_dir, "**", "*"), recursive=True)
        if os.path.isfile(p)
    )
    total = 0
    tmp_dir = snap_dir + f".tmp{os.getpid()}"
    for p in files:
        rel = os.path.relpath(p, lake_dir)
        dst = os.path.join(tmp_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(p, dst)
        total += os.path.getsize(p)
    os.makedirs(tmp_dir, exist_ok=True)  # empty lake still snapshots
    manifest = {
        "name": name,
        "lake_dir": os.path.abspath(lake_dir),
        "files": [os.path.relpath(p, lake_dir) for p in files],
        "total_bytes": total,
    }
    with open(os.path.join(tmp_dir, "_snapshot.json"), "w") as f:
        json.dump(manifest, f)
    os.rename(tmp_dir, snap_dir)  # commit marker: snapshots appear atomically
    return {"name": name, "dir": snap_dir, "n_files": len(files), "total_bytes": total}


def list_snapshots(snap_root: str) -> list[dict]:
    """Manifests of every committed snapshot under ``snap_root``, oldest
    first (in-flight ``.tmp`` dirs are invisible)."""
    import json
    import os

    out = []
    if not os.path.isdir(snap_root):
        return out
    for d in sorted(os.listdir(snap_root)):
        mf = os.path.join(snap_root, d, "_snapshot.json")
        if os.path.isfile(mf):
            with open(mf) as f:
                out.append(json.load(f))
    return out


def drop_snapshot(snap_root: str, name: str) -> None:
    """Vacuum one snapshot: unlink its hard links (bytes free once no other
    snapshot or the live lake still references the inode)."""
    import os
    import shutil

    d = os.path.join(snap_root, name)
    if not os.path.isfile(os.path.join(d, "_snapshot.json")):
        raise ValueError(f"{name!r} is not a committed snapshot under {snap_root}")
    shutil.rmtree(d)


def lake_schema_report(in_dir: str):
    """Schema-drift audit of an ORC lake from file TAILS only: unify every
    file's footer schema (evolve.unify_schemas — the reader-side evolution
    contract), then report one row per file: its relative path, its column
    count, and the comma-joined sorted names it is MISSING relative to the
    lake-wide union (empty string when current). The "which files predate
    the column add?" check that decides whether a lake needs evolve-on-read
    or a rewrite. Each Ray task preads a few KiB of tail per file — no
    stripe data moves; the driver sees only (path, schema-names) metadata.
    """
    import glob

    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .evolve import orc_file_schema, unify_schemas

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")

    def _names(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            names = list(orc_file_schema(p).names)
            with _Source(p) as src:
                n_rows = _tail_raw(src)["num_rows"]
            rows.append(
                {
                    "path": os.path.relpath(p, in_dir),
                    "names": "\x00".join(names),
                    "num_rows": int(n_rows),
                }
            )
        return pa.Table.from_pylist(rows)

    per_file = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(_names, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    union: set[str] = set()
    for s in per_file["names"]:
        union.update(s.split("\x00"))
    rows = []
    for _, r in per_file.sort_values("path").iterrows():
        have = set(r["names"].split("\x00"))
        rows.append(
            {
                "path": r["path"],
                "n_cols": len(have),
                "missing": ",".join(sorted(union - have)),
                "num_rows": int(r["num_rows"]),
            }
        )
    import pandas as pd

    return pd.DataFrame(rows, columns=["path", "n_cols", "missing", "num_rows"])


def lake_fsck(in_dir: str, deep: bool = False):
    """Integrity scan ("fsck") of an ORC lake from structural metadata: per
    file, parse the tail, then check that (a) stripe extents are ordered,
    non-overlapping and inside the file, (b) stripe row counts sum to the
    footer's total, and — with ``deep=True`` — (c) each stripe footer
    deframes and its stream lengths sum exactly to the stripe's index+data
    extent. Returns a driver DataFrame ``(path, num_rows, n_stripes, ok,
    err)`` sorted by path. Corruption never raises — it lands in ``err``
    (truncated tails, overlapping extents, short stripes). Shallow mode
    preads only tails; deep mode adds one stripe-footer pread per stripe
    (never stream payloads) — both stay metadata-bounded at lake scale.
    """
    import glob

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")

    def _check(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            rel = os.path.relpath(p, in_dir)
            num_rows = 0
            n_stripes = 0
            err = ""
            try:
                size = os.path.getsize(p)
                with _Source(p) as src:
                    t = _tail_raw(src)
                    num_rows = int(t["num_rows"])
                    stripes = t["stripes"]
                    n_stripes = len(stripes)
                    prev_end = 3  # content starts after the "ORC" magic
                    got_rows = 0
                    for off, ilen, dlen, flen, srows in stripes:
                        if off < prev_end:
                            raise ValueError(f"stripe at {off} overlaps previous extent")
                        end = off + ilen + dlen + flen
                        if end > size:
                            raise ValueError(f"stripe extent {off}..{end} beyond file size {size}")
                        prev_end = end
                        got_rows += int(srows)
                        if deep:
                            raw = src.read(off + ilen + dlen, flen)
                            sf = _fields(_deframe(raw, t["compression"]))
                            stream_sum = 0
                            for s in sf.get(1, []):
                                stream_sum += _fields(s).get(3, [0])[0]
                            if stream_sum != ilen + dlen:
                                raise ValueError(
                                    f"stripe at {off}: stream lengths {stream_sum} != extent {ilen + dlen}"
                                )
                    if got_rows != num_rows:
                        raise ValueError(f"stripe rows {got_rows} != footer num_rows {num_rows}")
            except Exception as ex:  # corruption is a RESULT, not a crash
                err = f"{type(ex).__name__}: {ex}"
            rows.append(
                {
                    "path": rel,
                    "num_rows": num_rows,
                    "n_stripes": n_stripes,
                    "ok": 0 if err else 1,
                    "err": err,
                }
            )
        return pa.Table.from_pylist(rows)

    out = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(_check, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    out["num_rows"] = out["num_rows"].astype("int64")
    out["n_stripes"] = out["n_stripes"].astype("int64")
    out["ok"] = out["ok"].astype("int64")
    return out.sort_values("path").reset_index(drop=True)


def lake_agg_from_stats(in_dir: str, column: str):
    """Aggregate a numeric column over an entire ORC lake WITHOUT reading
    any data stream: min/max/sum/count come from each file's footer
    statistics (TAIL preads only — the stats-only aggregation pushdown a
    columnar engine owes its users). Returns a one-row driver DataFrame
    ``(n_files, n_rows, n_values, min, max, sum)`` where n_values counts
    non-null values (SQL ``count(col)``) and n_rows is the footer total
    (``count(*)``). Raises loudly when any file's stats are missing or its
    long-sum overflowed (sticky None) — a partial answer would be a lie,
    the orcmerge omission-over-invention rule."""
    import glob

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")

    def _stat(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            st = read_orc_statistics(p).get(column)
            with _Source(p) as src:
                n_rows = int(_tail_raw(src)["num_rows"])
            if st is None or (st.num_present and (st.min is None or st.max is None)):
                raise ValueError(f"{p}: no usable footer stats for {column!r}")
            if st.num_present and (st.sum is None or getattr(st, "sum_overflowed", False)):
                raise ValueError(f"{p}: {column!r} sum missing/overflowed — stats-only agg would lie")
            rows.append(
                {
                    "n_rows": n_rows,
                    "n_values": int(st.num_present),
                    "vmin": int(st.min) if st.num_present else None,
                    "vmax": int(st.max) if st.num_present else None,
                    "vsum": int(st.sum) if st.num_present else 0,
                }
            )
        return pa.Table.from_pylist(rows)

    parts = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(_stat, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    nonempty = parts[parts["n_values"] > 0]
    return pd.DataFrame(
        {
            "n_files": [len(paths)],
            "n_rows": [int(parts["n_rows"].sum())],
            "n_values": [int(parts["n_values"].sum())],
            "min": [int(nonempty["vmin"].min()) if len(nonempty) else None],
            "max": [int(nonempty["vmax"].max()) if len(nonempty) else None],
            "sum": [sum(int(v) for v in parts["vsum"])],
        }
    )


def lake_zone_map(in_dir: str, column: str):
    """Zone-map export: one row per (file, stripe) with the stripe's row
    count and the column's per-stripe min/max, parsed from the Metadata
    section's StripeStatistics at the protobuf-wire level — TAIL preads
    only, no stripe data moves. The table external planners (or
    bucketed-join pre-pruning) consume to skip stripes. Returns a driver
    DataFrame ``(path, stripe, n_rows, min, max)`` sorted by (path,
    stripe). Raises loudly when a file lacks usable per-stripe stats for
    the column (omission over invention)."""
    import glob

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .orcread import _parse_tail

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")

    def _zones(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            with _Source(p) as src:
                tail = _parse_tail(src)
                raw = _tail_raw(src)
            root = tail["types"][0]
            spans = list(root.subtypes) + [len(tail["types"])]
            try:
                col_id = spans[list(root.field_names).index(column)]
            except ValueError:
                raise ValueError(f"{p}: no column {column!r}")
            t = tail["types"][col_id]
            for si, (ss_raw, st) in enumerate(zip(raw["stripe_stats_raw"], raw["stripes"])):
                cols = _fields(ss_raw).get(1, [])
                if col_id >= len(cols):
                    raise ValueError(f"{p}: stripe {si} lacks stats for {column!r}")
                parsed = _stats_parse(cols[col_id], t.kind, t.scale if t.kind == "DECIMAL" else None)
                if parsed is None or (parsed.num_present and parsed.min is None):
                    raise ValueError(f"{p}: stripe {si} stats for {column!r} unusable")
                rows.append(
                    {
                        "path": os.path.relpath(p, in_dir),
                        "stripe": si,
                        "n_rows": int(st[4]),
                        "min": int(parsed.min) if parsed.num_present else None,
                        "max": int(parsed.max) if parsed.num_present else None,
                    }
                )
        return pa.Table.from_pylist(rows)

    out = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(_zones, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    for c in ("stripe", "n_rows", "min", "max"):
        out[c] = out[c].astype("int64")
    return out.sort_values(["path", "stripe"]).reset_index(drop=True)


NDV_META_PREFIX = "ndv:"
NDV_DEFAULT_CAP = 1024


def ndv_meta(tbl, columns: list[str], cap: int = NDV_DEFAULT_CAP) -> dict[str, bytes]:
    """Bounded distinct-value dictionaries for footer user metadata: for
    each column, the sorted distinct values (JSON) while they fit ``cap``,
    else an overflow marker. Attach at write time
    (``write_orc(..., user_metadata=ndv_meta(tbl, [...]))``) and read
    merged NDV statistics back from TAILS ONLY via ``lake_ndv`` — the
    optimizer-grade cardinality stat ORC's own footer lacks. Low-
    cardinality columns (languages, sources, categories) stay EXACT under
    set-union across any number of files; high-cardinality columns degrade
    loudly to a lower bound instead of a silent wrong answer.

    Supported: string and integer columns (the dictionary must serialize
    canonically; floats have no canonical JSON round-trip)."""
    import json

    import pyarrow as pa
    import pyarrow.compute as pc

    out: dict[str, bytes] = {}
    for col in columns:
        c = tbl[col]
        t = c.type
        if pa.types.is_integer(t):
            vals = sorted(int(v) for v in pc.unique(c).to_pylist() if v is not None)
        elif pa.types.is_string(t) or pa.types.is_large_string(t):
            vals = sorted(v for v in pc.unique(c).to_pylist() if v is not None)
        else:
            raise ValueError(f"ndv_meta supports string/integer columns, {col!r} is {t}")
        if len(vals) <= cap:
            payload = {"exact": True, "values": vals}
        else:
            payload = {"exact": False, "n_seen": len(vals)}
        out[NDV_META_PREFIX + col] = json.dumps(payload, separators=(",", ":")).encode()
    return out


def lake_ndv(in_dir: str, columns: list[str]):
    """Merged distinct-value statistics for an ORC lake from TAILS ONLY:
    one Ray task per file preads the footer user metadata (a few KiB),
    ships the bounded dictionaries, and the driver set-unions them.
    Returns a DataFrame ``(col, n_files, exact, ndv)`` — ``exact=1`` only
    when EVERY file carries an exact dictionary for the column (``ndv`` is
    then the true count(DISTINCT)); otherwise ``exact=0`` and ``ndv`` is
    the lower bound from the dictionaries that exist."""
    import glob
    import json

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .orcread import read_orc_user_metadata

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {in_dir}")

    def tails(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            um = read_orc_user_metadata(p)
            for col in columns:
                raw = um.get(NDV_META_PREFIX + col)
                rows.append(
                    {"path": p, "col": col, "payload": "" if raw is None else raw.decode()}
                )
        return pa.Table.from_pylist(rows)

    cells = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(tails, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    rows = []
    for col in columns:
        sub = cells[cells["col"] == col]
        exact = len(sub) == len(paths)
        seen: set = set()
        floor = 0  # best single-file lower bound when dictionaries overflowed
        for payload in sub["payload"]:
            if not payload:
                exact = False
                continue
            d = json.loads(payload)
            if d.get("exact"):
                seen.update(d["values"])
            else:
                exact = False
                floor = max(floor, int(d.get("n_seen", 0)))
        rows.append((col, len(paths), int(exact), max(len(seen), floor)))
    return pd.DataFrame(rows, columns=["col", "n_files", "exact", "ndv"])


HIST_META_PREFIX = "hist:"


def hist_meta(tbl, columns: list[str], value_scale: int = 100,
              cap: int = 4096) -> dict[str, bytes]:
    """Bounded (units, count) histograms for footer user metadata: exact
    integer-unit value counts (``floor(v*scale + 0.5)``) while the distinct
    count fits ``cap``, else an overflow marker. The quantile companion of
    ``ndv_meta`` — attach at write time and answer EXACT discrete
    quantiles for bounded-cardinality measures (quantities, prices at
    fixed scale, ordinal scores) from TAILS ONLY via
    ``lake_quantile_disc``. Numeric columns only."""
    import json

    import pyarrow as pa

    out: dict[str, bytes] = {}
    for col in columns:
        import numpy as np

        c = tbl[col]
        if not (pa.types.is_integer(c.type) or pa.types.is_floating(c.type)):
            raise ValueError(f"hist_meta needs a numeric column, {col!r} is {c.type}")
        v = c.to_numpy(zero_copy_only=False).astype(np.float64)
        if np.isnan(v).any():
            raise ValueError(f"hist_meta: {col!r} must be non-null/non-NaN")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        vals, counts = np.unique(u, return_counts=True)
        if len(vals) <= cap:
            payload = {"exact": True, "scale": value_scale,
                       "values": vals.tolist(), "counts": counts.tolist()}
        else:
            payload = {"exact": False, "scale": value_scale, "n_seen": int(len(vals))}
        out[HIST_META_PREFIX + col] = json.dumps(payload, separators=(",", ":")).encode()
    return out


def _merged_lake_hist(in_dir: str, column: str, op_name: str):
    """Union the exact (units, count) footer histograms of a lake from
    TAILS ONLY (one Ray task per file). Loud when ANY file lacks an exact
    histogram or scales disagree — a silent approximate answer would
    masquerade as exact. Returns (vals int64[], counts int64[], scale)."""
    import glob
    import json

    import numpy as np
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .orcread import read_orc_user_metadata

    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {in_dir}")

    def tails(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            raw = read_orc_user_metadata(p).get(HIST_META_PREFIX + column)
            rows.append({"path": p, "payload": "" if raw is None else raw.decode()})
        return pa.Table.from_pylist(rows)

    cells = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(tails, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    merged: dict[int, int] = {}
    scale = None
    for p, payload in cells.itertuples(index=False):
        if not payload:
            raise ValueError(f"{op_name}: {p} has no histogram for {column!r}")
        d = json.loads(payload)
        if not d.get("exact"):
            raise ValueError(
                f"{op_name}: {p}'s histogram overflowed "
                f"({d.get('n_seen')} distinct units) — rebuild with a larger cap"
            )
        if scale is None:
            scale = d["scale"]
        elif scale != d["scale"]:
            raise ValueError(f"{op_name}: mixed scales {scale} vs {d['scale']}")
        for v, c in zip(d["values"], d["counts"]):
            merged[v] = merged.get(v, 0) + c
    vals = np.array(sorted(merged), dtype=np.int64)
    counts = np.array([merged[v] for v in vals.tolist()], dtype=np.int64)
    return vals, counts, scale


def lake_quantile_disc(in_dir: str, column: str, qs: list[float]):
    """EXACT discrete quantiles for an ORC lake from TAILS ONLY: merge the
    footer histograms and apply ``quantile_disc_from_counts`` (the pinned
    DuckDB rank rule — keep qs short decimals). Returns a DataFrame
    ``(q, units)``."""
    import numpy as np
    import pandas as pd

    from .ops.agg import quantile_disc_from_counts

    vals, counts, _scale = _merged_lake_hist(in_dir, column, "lake_quantile_disc")
    picks = quantile_disc_from_counts(vals, counts, qs)
    return pd.DataFrame({"q": np.array(qs, dtype=np.float64),
                         "units": np.array(picks, dtype=np.int64)})


def lake_psi(dir_a: str, dir_b: str, column: str):
    """Population Stability Index between TWO LAKES from TAILS ONLY — the
    distribution-drift monitor that never touches data bytes: both sides'
    exact footer histograms merge driver-side, then per-unit

        term = (pa - pb) * ln(pa / pb),  pa = c_a/n_a, pb = c_b/n_b

    with psi_drift's exact parity rules (single divisions of exact ints,
    math.log == libm ln, units where either side is empty yield a NULL
    term — never epsilon-fudged). Scales must agree across BOTH lakes.
    Returns a DataFrame ``(units, c_a, c_b, psi_term)`` over the union of
    units; sum(psi_term) is the PSI."""
    import math

    import numpy as np
    import pandas as pd

    va, ca, sa = _merged_lake_hist(dir_a, column, "lake_psi")
    vb, cb, sb = _merged_lake_hist(dir_b, column, "lake_psi")
    if sa != sb:
        raise ValueError(f"lake_psi: scales disagree across lakes ({sa} vs {sb})")
    na, nb = int(ca.sum()), int(cb.sum())
    da = dict(zip(va.tolist(), ca.tolist()))
    db = dict(zip(vb.tolist(), cb.tolist()))
    rows = []
    for u in sorted(set(da) | set(db)):
        a, b = da.get(u, 0), db.get(u, 0)
        if a > 0 and b > 0:
            # mirrored op-for-op by the SQL oracle (the psi_drift rule)
            p = np.float64(a) / np.float64(na)
            q = np.float64(b) / np.float64(nb)
            term = float((p - q) * np.float64(math.log(p / q)))
        else:
            term = None
        rows.append((u, a, b, term))
    out = pd.DataFrame(rows, columns=["units", "c_a", "c_b", "psi_term"])
    out["units"] = out["units"].astype("int64")
    out["c_a"] = out["c_a"].astype("int64")
    out["c_b"] = out["c_b"].astype("int64")
    return out


def rename_orc_columns(path: str, out_path: str, renames: dict[str, str],
                       level: int = 3) -> dict:
    """Rename TOP-LEVEL columns of an ORC file WITHOUT touching data bytes:
    stripes copy verbatim (the merge machinery), only the root STRUCT's
    fieldNames in the rebuilt tail change — a schema migration that costs
    tail-rewrite I/O, not a decode/re-encode of the lake. Column ids (and
    with them statistics, bloom filters, ROW_INDEX) are positional, so
    every index keeps working under the new names.

    Idempotence contract: if NO rename key is present but every TARGET
    name already is, the file is already migrated and copies through
    unchanged (re-runs converge). Missing-and-not-applied names, target
    collisions, and nested paths are loud. Returns merge_orc_files'
    summary dict."""
    from .orcread import _packed_uvs

    with _Source(path) as src:
        t = _tail_raw(src)
    root = _fields(t["types_raw"][0])
    kind_code = root.get(1, [0])[0]
    subs = _packed_uvs(root.get(2, []))
    names = [v.decode() for v in root.get(3, [])]
    for old, new in renames.items():
        if "." in old or "." in new:
            raise ValueError("rename_orc_columns renames top-level columns only")
    applied = {o for o in renames if o in names}
    if not applied:
        if all(n in names for n in renames.values()):
            pass  # already migrated — idempotent re-run
        else:
            raise ValueError(f"rename_orc_columns: none of {sorted(renames)} present in {names}")
    new_names = [renames.get(n, n) for n in names]
    if len(set(new_names)) != len(new_names):
        raise ValueError(f"rename_orc_columns: target names collide: {new_names}")
    m = Msg()
    m.varint(1, kind_code)
    m.packed(2, subs)
    for n in new_names:
        m.string(3, n)
    patched = list(t["types_raw"])
    patched[0] = m.tobytes()

    if t["compression"] not in _KIND_IDS:
        raise NotImplementedError(f"cannot re-frame tail with read-only codec {t['compression']!r}")
    tail_block = min(_ORC_BLOCK, t["block_size"]) if t["block_size"] else _ORC_BLOCK
    tmp = out_path + ".tmp"
    stripe_infos: list[tuple[int, int, int, int, int]] = []
    stripe_stats: list[bytes] = []
    stats_ok = len(t["stripe_stats_raw"]) == len(t["stripes"])
    try:
        _write_merged(tmp, [path], [t], t, patched, t["compression"], level, tail_block,
                      t["writer_version"], stripe_infos, stripe_stats, stats_ok)
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise
    os.replace(tmp, out_path)
    return {
        "num_rows": sum(si[4] for si in stripe_infos),
        "file_bytes": os.path.getsize(out_path),
        "stripes": len(stripe_infos),
        "renamed": sorted(applied),
    }


def rename_lake_columns(lake_dir: str, renames: dict[str, str], level: int = 3) -> dict:
    """Lake-wide zero-decode column rename: one Ray task per file rewrites
    its TAIL in place (atomic tmp + os.replace under the SAME filename —
    re-runs converge via rename_orc_columns' idempotence). Partitioned
    lakes: renaming a PARTITION column is rejected (those names live in
    directory paths and the sidecar, not file tails). Returns
    ``{"n_files", "n_renamed"}``."""
    import glob

    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args
    from .orcfile import PARTITION_SCHEMA_FILE

    sc = os.path.join(lake_dir, PARTITION_SCHEMA_FILE)
    if os.path.exists(sc):
        with open(sc, "rb") as f:
            pschema = pa.ipc.read_schema(pa.py_buffer(f.read()))
        hit = set(renames) & set(pschema.names)
        if hit:
            raise ValueError(f"rename_lake_columns: {sorted(hit)} are partition columns")
    paths = sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")

    def work(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            res = rename_orc_columns(p, p, renames, level=level)
            rows.append({"path": p, "n_renamed": len(res["renamed"])})
        return pa.Table.from_pylist(rows)

    res = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(work, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    return {"n_files": len(paths), "n_renamed": int((res["n_renamed"] > 0).sum())}


def cluster_advisor(in_dir: str, columns: list[str]):
    """Clustering advisor for an ORC lake, from file TAILS only: for each
    candidate integer column, parse every file's footer min/max and score
    how well the lake is clustered on that column with two EXACT-INT
    interval metrics —

    - ``max_depth``: the maximum stacking depth of the per-file [min, max]
      ranges (how many files a worst-case point lookup must open). Depth
      is maximized at some interval's own lower endpoint, so it equals
      ``max over files a of |{g : g.min <= a.min <= g.max}|`` — the form a
      SQL self-join reproduces verbatim;
    - ``pair_overlaps``: the number of file PAIRS whose ranges intersect
      (``a.min <= b.max AND b.min <= a.max``, a < b by file order) — 0 for
      a perfectly clustered lake, C(n,2) for a fully unsorted one.

    The recommended cluster key (``best = 1``) is the candidate with the
    lowest ``(pair_overlaps, max_depth, column-name)`` — i.e. the column
    the lake is ALREADY best sorted by; a high-overlap report for every
    candidate is the signal to rewrite via ``write_clustered_lake`` +
    ``sorted_merge_join``'s O(1)-files contract. Tails are parsed in a Ray
    task pool (a few KiB pread per file — nothing else moves); the metric
    fold runs driver-side over ``n_files × n_columns`` metadata cells.
    Files lacking usable int min/max for a candidate raise loudly
    (omission over invention — a silent skip would misreport depth).

    Returns a driver DataFrame ``(column, n_files, max_depth,
    pair_overlaps, best)`` sorted by column name.
    """
    import glob

    import pandas as pd
    import pyarrow as pa
    import ray.data

    from ._rayutil import remote_args

    if not columns:
        raise ValueError("cluster_advisor: need at least one candidate column")
    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise ValueError(f"no .orc files under {in_dir!r}")
    cols = list(columns)

    def _minmax(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            st = read_orc_statistics(p)
            row: dict = {"path": os.path.relpath(p, in_dir)}
            for c in cols:
                s = st.get(c)
                if s is None or s.min is None or s.max is None:
                    raise ValueError(f"{p}: no usable min/max footer stats for {c!r}")
                row[f"min:{c}"] = int(s.min)
                row[f"max:{c}"] = int(s.max)
            rows.append(row)
        return pa.Table.from_pylist(rows)

    meta = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(_minmax, batch_format="pyarrow", **remote_args())
        .to_pandas()
    )
    import numpy as np

    out_rows = []
    for c in sorted(cols):
        lo = meta[f"min:{c}"].to_numpy().astype(np.int64)
        hi = meta[f"max:{c}"].to_numpy().astype(np.int64)
        n = len(lo)
        lo_s = np.sort(lo)
        hi_s = np.sort(hi)
        # depth at point p = |{g: lo_g <= p}| - |{g: hi_g < p}|; the max over
        # all p is attained at some interval's own lo — O(n log n), exact
        depth = np.searchsorted(lo_s, lo, side="right") - np.searchsorted(hi_s, lo, side="left")
        max_depth = int(depth.max())
        # overlapping pairs = C(n,2) - disjoint pairs; a pair is disjoint
        # iff one's hi < the other's lo (intervals are valid: lo <= hi)
        disjoint = int(np.searchsorted(hi_s, lo, side="left").sum())
        pair_overlaps = n * (n - 1) // 2 - disjoint
        out_rows.append((c, n, max_depth, pair_overlaps))
    out = pd.DataFrame(out_rows, columns=["column", "n_files", "max_depth", "pair_overlaps"])
    rank = out.sort_values(["pair_overlaps", "max_depth", "column"]).index[0]
    out["best"] = 0
    out.loc[rank, "best"] = 1
    for c in ("n_files", "max_depth", "pair_overlaps", "best"):
        out[c] = out[c].astype("int64")
    return out.sort_values("column").reset_index(drop=True)
