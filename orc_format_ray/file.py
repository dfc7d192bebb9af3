"""Single-file container: stripes + footer, mirroring the reference's file
assembly (reference src/writer.rs:92-114: header -> stripes -> metadata ->
footer -> postscript -> trailing length byte).

Layout:
    b"ORYF" | stripe blobs back-to-back | footer JSON | uint32 LE footer_len | b"ORYF"

The footer carries the stripe directory (offset/length/rows per stripe, like
StripeInformation — reference src/writer.rs:256-293), merged file-level
column statistics (reference Writer::merge_statistics, writer.rs:121-130),
and the schema spec. Readers parse from the tail, so a partially written
file is detectably invalid — and the distributed pipeline never depends on
this: per-partition stripes + manifest remain the resumable source of truth;
a file is an optional final packaging step.
"""

from __future__ import annotations

import glob
import json
import os
import struct

import pyarrow as pa

from . import stats as stats_mod
from .stripe import decode_stripe, read_header

MAGIC = b"ORYF"


def write_file(stripe_blobs, path: str) -> dict:
    """Assemble stripes (iterable of bytes) into one file. Returns the footer."""
    directory = []
    merged: dict[str, stats_mod.ColumnStats] = {}
    schema_spec = None
    num_rows = 0
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(MAGIC)
        offset = len(MAGIC)
        for blob in stripe_blobs:
            header, _ = read_header(blob)
            directory.append({"offset": offset, "length": len(blob), "num_rows": header["num_rows"]})
            num_rows += header["num_rows"]
            if schema_spec is None:
                schema_spec = [[c["name"], c["type"]] for c in header["columns"]]
            for c in header["columns"]:
                s = stats_mod.ColumnStats.from_dict(c["stats"])
                merged[c["name"]] = stats_mod.merge(merged[c["name"]], s) if c["name"] in merged else s
            f.write(blob)
            offset += len(blob)
        footer = {
            "version": 1,
            "num_rows": num_rows,
            "stripes": directory,
            "schema": schema_spec,
            "statistics": {k: v.to_dict() for k, v in merged.items()},
        }
        fj = json.dumps(footer).encode()
        f.write(fj)
        f.write(struct.pack("<I", len(fj)))
        f.write(MAGIC)
    os.replace(tmp, path)
    return footer


def assemble_dir(stripes_dir: str, path: str) -> dict:
    """Package an encode_dataset output directory into one file."""
    paths = sorted(glob.glob(os.path.join(stripes_dir, "*.stripe")))

    def gen():
        for p in paths:
            with open(p, "rb") as f:
                yield f.read()

    return write_file(gen(), path)


class FileReader:
    """Tail-parsed reader with stripe directory + ranged/projected reads."""

    def __init__(self, path: str):
        self.path = path
        with open(path, "rb") as f:
            f.seek(0, os.SEEK_END)
            end = f.tell()
            f.seek(end - 8)
            tail = f.read(8)
            if tail[4:] != MAGIC:
                raise ValueError("not an ORYF file (bad trailing magic)")
            flen = struct.unpack("<I", tail[:4])[0]
            f.seek(end - 8 - flen)
            self.footer = json.loads(f.read(flen).decode())
        self.num_rows = self.footer["num_rows"]
        self.stripes = self.footer["stripes"]

    def read_stripe(self, i: int, columns=None, row_range=None) -> pa.Table:
        info = self.stripes[i]
        with open(self.path, "rb") as f:
            f.seek(info["offset"])
            blob = f.read(info["length"])
        return decode_stripe(blob, columns=columns, row_range=row_range)

    def to_table(self, columns=None) -> pa.Table:
        return pa.concat_tables(self.read_stripe(i, columns=columns) for i in range(len(self.stripes)))

    def statistics(self) -> dict:
        return self.footer["statistics"]
