"""Per-partition lineage manifest: checkpoint/resume for the encode pipeline.

North-rule component: "each partition emits lineage records (input fragment,
codec chosen, encoded bytes, checksum) to a checkpoint manifest enabling
exact resume". One JSON file per partition, written atomically (tmp +
rename) next to its stripe, so a rerun can trust any manifest it finds;
`load_completed` cross-checks the stripe file exists with the recorded size.
The reference has no equivalent (a crashed reference write is unreadable —
reference: src/writer.rs:92-114 writes the footer last).
"""

from __future__ import annotations

import json
import os


def manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest")


def stripe_path(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}.stripe")


def _part_path(out_dir: str, pid: int) -> str:
    return os.path.join(manifest_dir(out_dir), f"part-{pid:05d}.json")


def write_record(out_dir: str, record: dict) -> None:
    os.makedirs(manifest_dir(out_dir), exist_ok=True)
    path = _part_path(out_dir, record["pid"])
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(record, f)
    os.replace(tmp, path)


def write_blob_atomic(path: str, blob: bytes) -> None:
    tmp = path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_completed(out_dir: str, verify_crc: bool = False) -> dict[int, dict]:
    """pid -> lineage record, for partitions whose stripe file checks out.

    The cheap check is size equality; ``verify_crc=True`` additionally
    re-hashes the stripe bytes against the recorded blob checksum, so silent
    on-disk corruption forces a re-encode of exactly that partition.
    """
    import zlib

    candidates: dict[int, dict] = _load_consolidated(out_dir)
    mdir = manifest_dir(out_dir)
    names = os.listdir(mdir) if os.path.isdir(mdir) else []
    for name in names:
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        candidates[rec["pid"]] = rec  # per-part records win over consolidated

    done: dict[int, dict] = {}
    for pid, rec in candidates.items():
        sp = stripe_path(out_dir, pid)
        if not (os.path.exists(sp) and os.path.getsize(sp) == rec["encoded_bytes"]):
            continue
        if verify_crc and "blob_crc32" in rec:
            with open(sp, "rb") as f:
                if zlib.crc32(f.read()) != rec["blob_crc32"]:
                    continue
        done[pid] = rec
    return done


def consolidate(out_dir: str, keep_parts: bool = False) -> str:
    """Merge per-partition records into one manifest.parquet.

    At 10^12-sequence scale a 64 MiB budget means ~10^6 partitions; one JSON
    file each is fine during the run (atomic, contention-free) but poor to
    keep. Consolidation compacts them into a single parquet keyed by pid;
    `load_completed` reads the compact file first, so resume stays exact.
    """
    import json as _json

    import pyarrow as pa
    import pyarrow.parquet as pq

    records = load_completed(out_dir)
    path = os.path.join(out_dir, "manifest.parquet")
    rows = [{"pid": pid, "record": _json.dumps(rec, sort_keys=True)} for pid, rec in sorted(records.items())]
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(pa.Table.from_pylist(rows or [{"pid": -1, "record": "{}"}]), tmp)
    os.replace(tmp, path)
    if not keep_parts:
        mdir = manifest_dir(out_dir)
        for name in os.listdir(mdir):
            if name.startswith("part-") and name.endswith(".json"):
                os.remove(os.path.join(mdir, name))
    return path


def _load_consolidated(out_dir: str) -> dict[int, dict]:
    import json as _json

    import pyarrow.parquet as pq

    path = os.path.join(out_dir, "manifest.parquet")
    if not os.path.exists(path):
        return {}
    out: dict[int, dict] = {}
    t = pq.read_table(path)
    for pid, rec in zip(t["pid"].to_pylist(), t["record"].to_pylist()):
        if pid >= 0:
            out[pid] = _json.loads(rec)
    return out


def write_summary(out_dir: str, summary: dict) -> None:
    tmp = os.path.join(out_dir, "_summary.json.tmp")
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_summary.json"))
