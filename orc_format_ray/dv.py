"""Deletion vectors: merge-on-read logical deletes for ORC lakes.

The lakehouse delete primitive the rewrite path (`orcmerge.delete_rows`)
is too heavy for: instead of rewriting every touched file, a DELETE writes
a tiny SIDECAR per file — the sorted row ordinals to hide — and readers
subtract it on the fly. A 100-TB lake absorbs a targeted delete in seconds
(bytes written ∝ deleted rows, not file sizes), and `vacuum_dv` folds the
vectors into a physical rewrite whenever compaction would run anyway.

Reference parity note: the reference writer (blkerby/orc-format
``src/writer.rs``) has no delete story at all — this module is part of the
new engine's lake surface, designed Ray-Data-first: the predicate scan is
one Ray task per candidate file (tail-stats pruned driver-side, column-
projected native reads), the sidecar write is atomic (tmp + rename), and
merge-on-read is a stateless vectorized mask inside each read task.

Sidecar format ``<file>.orc.dv``:

    magic b"ODV1" | uint64le raw_len
    | zstd( varint num_rows | varint n | delta-varints(positions) )

``num_rows`` pins the sidecar to the exact file layout it was written
against — a compacted/rewritten file fails LOUDLY instead of silently
mis-masking (content-hash renames make stale paths impossible anyway).

Invariants:
- Footer statistics are NOT rewritten on logical delete, so stats-based
  pruning stays CONSERVATIVE (deletes only remove rows; min/max can only
  overstate the range). Stats-trusting AGGREGATES (`lake_agg_from_stats`)
  must not be used on a lake with live deletion vectors — vacuum first.
- `vacuum_dv` follows `delete_rows`'s crash contract: the replacement file
  lands under a content-hash name BEFORE the old file and its sidecar
  unlink, so a crashed run re-converges on re-run (reads in the crash
  window can see both copies — run vacuum in a maintenance window).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

_DV_MAGIC = b"ODV1"


def _dv_path(orc_path: str) -> str:
    return orc_path + ".dv"


def _encode_dv(num_rows: int, positions: np.ndarray) -> bytes:
    from .codecs.varint import varint_encode_unsigned

    pos = np.asarray(positions, dtype=np.int64)
    if pos.size:
        pos = np.unique(pos)
        if pos[0] < 0 or pos[-1] >= num_rows:
            raise ValueError(
                f"deletion positions out of range [0, {num_rows}): "
                f"min={int(pos[0])} max={int(pos[-1])}"
            )
    deltas = np.empty(pos.size, dtype=np.uint64)
    if pos.size:
        deltas[0] = np.uint64(pos[0])
        deltas[1:] = np.diff(pos).astype(np.uint64)
    head, _ = varint_encode_unsigned(np.array([num_rows, pos.size], dtype=np.uint64))
    body, _ = varint_encode_unsigned(deltas)
    raw = head + body
    comp = bytes(pa.Codec("zstd", compression_level=3).compress(raw))
    # pyarrow's zstd decompress needs the exact raw size — carry it plain
    return _DV_MAGIC + len(raw).to_bytes(8, "little") + comp


def _decode_dv(buf: bytes) -> tuple[int, np.ndarray]:
    from .codecs.varint import varint_decode_all

    if buf[:4] != _DV_MAGIC:
        raise ValueError("not a deletion vector (bad magic)")
    raw_len = int.from_bytes(buf[4:12], "little")
    raw = bytes(pa.Codec("zstd").decompress(buf[12:], raw_len))
    vals = varint_decode_all(raw)
    num_rows, n = int(vals[0]), int(vals[1])
    deltas = vals[2 : 2 + n]
    if len(deltas) != n:
        raise ValueError(f"deletion vector truncated: {len(deltas)} of {n} positions")
    return num_rows, np.cumsum(deltas.astype(np.int64))


def read_deletion_vector(orc_path: str) -> tuple[int | None, np.ndarray]:
    """Return ``(num_rows_pinned, sorted positions)`` for the file's
    sidecar — ``(None, empty)`` when no vector exists."""
    p = _dv_path(orc_path)
    if not os.path.exists(p):
        return None, np.zeros(0, dtype=np.int64)
    with open(p, "rb") as f:
        return _decode_dv(f.read())


def write_deletion_vector(orc_path: str, positions, merge: bool = True) -> int:
    """Write (or merge into) the file's deletion vector. Positions are row
    ordinals within the ORC file. Atomic (tmp + rename). Returns the total
    number of deleted positions after the merge."""
    from .orcread import _parse_tail, _Source

    with _Source(orc_path) as src:
        num_rows = int(_parse_tail(src)["num_rows"])
    pos = np.asarray(list(positions) if not isinstance(positions, np.ndarray) else positions,
                     dtype=np.int64)
    if merge:
        pinned, existing = read_deletion_vector(orc_path)
        if pinned is not None and pinned != num_rows:
            raise ValueError(
                f"stale deletion vector for {orc_path}: pinned num_rows={pinned}, "
                f"file has {num_rows} — vacuum or remove the sidecar"
            )
        pos = np.union1d(existing, pos)
    buf = _encode_dv(num_rows, pos)
    tmp = _dv_path(orc_path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(buf)
    os.replace(tmp, _dv_path(orc_path))
    return int(np.unique(pos).size)


_PRED_OPS = ("==", "!=", "<", "<=", ">", ">=", "in")


def _normalize_pred(predicate) -> list[tuple]:
    if isinstance(predicate, tuple):
        triples = [predicate]
    elif isinstance(predicate, list) and all(isinstance(t, tuple) for t in predicate):
        triples = list(predicate)
    else:
        raise ValueError("predicate must be a (col, op, value) triple or an AND-list of triples")
    for t in triples:
        if len(t) != 3:
            raise ValueError(f"predicate triple must be (col, op, value), got {t!r}")
        if t[1] not in _PRED_OPS:
            raise ValueError(f"unsupported predicate op {t[1]!r} (one of {_PRED_OPS})")
    return triples


def _eval_mask(tbl: pa.Table, triples: list[tuple]) -> np.ndarray:
    """AND-fold of vectorized comparisons -> boolean delete mask."""
    import pyarrow.compute as pc

    mask = None
    for col, op, val in triples:
        c = tbl[col]
        if pa.types.is_timestamp(c.type) and not isinstance(val, (int, np.integer)):
            raise ValueError("timestamp predicates take exact integer micros")
        if op == "==":
            m = pc.equal(c, val)
        elif op == "!=":
            m = pc.not_equal(c, val)
        elif op == "<":
            m = pc.less(c, val)
        elif op == "<=":
            m = pc.less_equal(c, val)
        elif op == ">":
            m = pc.greater(c, val)
        elif op == ">=":
            m = pc.greater_equal(c, val)
        elif op == "in":
            m = pc.is_in(c, value_set=pa.array(list(val)))
        else:
            raise ValueError(f"unsupported predicate op {op!r}")
        m = pc.fill_null(m, False)
        mask = m if mask is None else pc.and_(mask, m)
    out = mask.to_numpy(zero_copy_only=False)
    return np.asarray(out, dtype=bool)


def _file_may_match(orc_path: str, triples: list[tuple]) -> bool:
    """Conservative tail-only file pruning: False only when the footer
    min/max PROVE no row satisfies the AND of triples."""
    from .orcmerge import read_orc_statistics

    try:
        stats = read_orc_statistics(orc_path)
    except Exception:  # noqa: BLE001 — unreadable stats: cannot prove clean
        return True
    for col, op, val in triples:
        st = stats.get(col)
        if st is None or st.min is None or st.max is None:
            continue
        lo, hi = st.min, st.max
        try:
            if op == "==" and (val < lo or val > hi):
                return False
            if op == "<" and lo >= val:
                return False
            if op == "<=" and lo > val:
                return False
            if op == ">" and hi <= val:
                return False
            if op == ">=" and hi < val:
                return False
            if op == "in" and all(v < lo or v > hi for v in val):
                return False
        except TypeError:  # incomparable stat/value types: stay conservative
            continue
    return True


def _lake_files(lake_dir: str) -> list[str]:
    import glob

    if os.path.isdir(lake_dir):
        return sorted(glob.glob(os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    return [lake_dir]


def delete_where_dv(lake_dir: str, predicate) -> dict:
    """Logical DELETE over an ORC lake: rows matching the predicate (one
    ``(col, op, value)`` triple or an AND-list; ops ==/!=/</<=/>/>=/in) are
    recorded in per-file deletion vectors — no data file is rewritten.

    Plan: footer-stats pruning driver-side (tail preads only) skips files
    that provably can't match; each surviving file is ONE Ray task that
    reads ONLY the predicate columns natively, evaluates the mask
    vectorized, and merges the sidecar. Returns ``{"n_files",
    "n_scanned", "n_deleted", "files"}`` (files = (path, n_new_deletes)).
    """
    import ray
    import ray.data

    from ._rayutil import remote_args
    from .orcread import read_orc_native

    triples = _normalize_pred(predicate)
    cols = sorted({t[0] for t in triples})
    paths = _lake_files(lake_dir)
    candidates = [p for p in paths if _file_may_match(p, triples)]

    def scan(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            tbl = read_orc_native(p, columns=cols)
            hit = _eval_mask(tbl, triples)
            n_new = 0
            if hit.any():
                before = read_deletion_vector(p)[1].size
                total = write_deletion_vector(p, np.flatnonzero(hit))
                n_new = total - before
            rows.append({"path": p, "n_new": n_new})
        return pa.Table.from_pylist(rows)

    files: list[tuple[str, int]] = []
    n_deleted = 0
    if candidates:
        res = (
            ray.data.from_items([{"path": p} for p in candidates])
            .map_batches(scan, batch_format="pyarrow", **remote_args())
            .to_pandas()
        )
        for p, n_new in res.itertuples(index=False):
            files.append((p, int(n_new)))
            n_deleted += int(n_new)
    files.sort()
    return {
        "n_files": len(paths),
        "n_scanned": len(candidates),
        "n_deleted": n_deleted,
        "files": files,
    }


def read_orc_masked(path: str, columns: list[str] | None = None) -> pa.Table:
    """Native single-file read with the deletion vector applied (merge-on-
    read). Loud on a stale sidecar."""
    from .orcread import read_orc_native

    tbl = read_orc_native(path, columns=columns)
    pinned, pos = read_deletion_vector(path)
    if pinned is None:
        return tbl
    if pinned != tbl.num_rows:
        raise ValueError(
            f"stale deletion vector for {path}: pinned num_rows={pinned}, "
            f"file has {tbl.num_rows}"
        )
    if not pos.size:
        return tbl
    keep = np.ones(tbl.num_rows, dtype=bool)
    keep[pos] = False
    return tbl.filter(pa.array(keep))


def read_lake_dv(lake_dir: str, columns: list[str] | None = None):
    """ORC lake -> streaming Ray Dataset with deletion vectors applied:
    one task per file, column-projected native read, vectorized mask.
    The merge-on-read counterpart of ``orcfile.read_orc_dataset``."""
    import ray.data

    from ._rayutil import remote_args

    paths = _lake_files(lake_dir)
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")

    def load(batch: pa.Table):
        for p in batch["path"].to_pylist():
            yield read_orc_masked(p, columns=columns)

    return ray.data.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", **remote_args()
    )


def vacuum_dv(lake_dir: str, compression: str = "zstd", level: int = 3,
              stripe_rows: int = 250_000, row_index_stride: int = 10_000) -> dict:
    """Fold deletion vectors into physical rewrites: every file with a
    non-empty sidecar is re-read (masked), rewritten under a content-hash
    name, then the old file and its sidecar unlink — after which
    stats-trusting readers (`lake_agg_from_stats`, zone maps) are safe
    again. Files whose vector hides EVERY row are removed outright.
    Idempotent under crashes (see module docstring). Returns
    ``{"n_files", "n_vacuumed", "n_rows_dropped", "files"}``.
    """
    import ray
    import ray.data

    from ._rayutil import remote_args
    from .orcfile import _content_hash_name, write_orc

    paths = _lake_files(lake_dir)
    dirty = [p for p in paths if read_deletion_vector(p)[1].size]

    def rewrite(batch: pa.Table) -> pa.Table:
        rows = []
        for p in batch["path"].to_pylist():
            pinned, pos = read_deletion_vector(p)
            keep_tbl = read_orc_masked(p)
            dropped = int(pos.size)
            if keep_tbl.num_rows:
                newp = os.path.join(os.path.dirname(p), _content_hash_name(keep_tbl))
                if os.path.abspath(newp) != os.path.abspath(p):
                    write_orc(keep_tbl, newp, compression, level, stripe_rows=stripe_rows,
                              row_index_stride=row_index_stride)
                    os.remove(p)
                os.remove(_dv_path(p))
                rows.append({"path": newp, "dropped": dropped, "action": "rewritten"})
            else:
                os.remove(p)
                os.remove(_dv_path(p))
                rows.append({"path": p, "dropped": dropped, "action": "removed"})
        return pa.Table.from_pylist(rows)

    files: list[tuple[str, str]] = []
    n_dropped = 0
    if dirty:
        res = (
            ray.data.from_items([{"path": p} for p in dirty])
            .map_batches(rewrite, batch_format="pyarrow", **remote_args())
            .to_pandas()
        )
        for p, dropped, action in res[["path", "dropped", "action"]].itertuples(index=False):
            files.append((p, action))
            n_dropped += int(dropped)
    files.sort()
    return {
        "n_files": len(paths),
        "n_vacuumed": len(dirty),
        "n_rows_dropped": n_dropped,
        "files": files,
    }
