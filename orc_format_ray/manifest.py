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

    mdir = manifest_dir(out_dir)
    done: dict[int, dict] = {}
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not (name.startswith("part-") and name.endswith(".json")):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                rec = json.load(f)
        except (json.JSONDecodeError, OSError):
            continue
        sp = stripe_path(out_dir, rec["pid"])
        if not (os.path.exists(sp) and os.path.getsize(sp) == rec["encoded_bytes"]):
            continue
        if verify_crc and "blob_crc32" in rec:
            with open(sp, "rb") as f:
                if zlib.crc32(f.read()) != rec["blob_crc32"]:
                    continue
        done[rec["pid"]] = rec
    return done


def write_summary(out_dir: str, summary: dict) -> None:
    tmp = os.path.join(out_dir, "_summary.json.tmp")
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_summary.json"))
