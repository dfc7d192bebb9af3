"""Block compression framing over pyarrow codecs (zstd / snappy / none).

Mirrors the reference's stream framing (reference: src/writer/compression.rs:95-218):
streams are cut into blocks of ``block_size`` (default 262,144 B, hard max
0x7fffff from the 23-bit length field); each block is emitted as a 3-byte LE
header ``length*2 + is_original`` followed by the payload, with the
incompressible-block fallback (compressed >= original -> store original,
``is_original=1`` — reference compression.rs:146-158).

One deliberate deviation: pyarrow's zstd decompressor requires the exact
uncompressed size, so compressed blocks carry an extra uncompressed-length
varint after the header (<= 3 bytes per 256 KiB block). The reference-size
oracle (reference_orc.py) does NOT add these bytes when computing the
reference's size, so the "ours <= reference" comparison stays conservative.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MAX_BLOCK_SIZE = 0x7FFFFF  # reference: src/writer/compression/common.rs:4
DEFAULT_BLOCK_SIZE = 262144  # reference: src/writer/compression/snappy.rs:14
DEFAULT_ZSTD_LEVEL = 3  # reference: src/writer/compression/zstd.rs:18


def _varint(z: int) -> bytes:
    out = bytearray()
    while True:
        if z < 0x80:
            out.append(z)
            return bytes(out)
        out.append(0x80 | (z & 0x7F))
        z >>= 7


def _read_varint_bytes(b: bytes, p: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        byte = b[p]
        p += 1
        z |= (byte & 0x7F) << shift
        if byte < 0x80:
            return z, p
        shift += 7


class BlockCompressor:
    """Reference-style framed block compression for stream payloads."""

    def __init__(self, kind: str = "zstd", level: int = DEFAULT_ZSTD_LEVEL, block_size: int = DEFAULT_BLOCK_SIZE):
        if block_size > MAX_BLOCK_SIZE:
            raise ValueError(f"block_size {block_size} exceeds 23-bit header limit")
        self.kind = kind
        self.level = level
        self.block_size = block_size
        if kind == "none":
            self._codec = None
        elif kind == "zstd":
            self._codec = pa.Codec("zstd", compression_level=level)
        elif kind == "snappy":
            self._codec = pa.Codec("snappy")
        else:
            raise ValueError(f"unknown compression kind {kind!r}")

    def compress(self, data: bytes) -> bytes:
        if self._codec is None:
            return data
        out: list[bytes] = []
        for s in range(0, len(data), self.block_size):
            block = data[s : s + self.block_size]
            comp = self._codec.compress(block).to_pybytes()
            if len(comp) >= len(block):
                # incompressible fallback: store the original
                out.append(int(len(block) * 2 + 1).to_bytes(3, "little"))
                out.append(block)
            else:
                out.append(int(len(comp) * 2).to_bytes(3, "little"))
                out.append(_varint(len(block)))
                out.append(comp)
        return b"".join(out)

    def decompress(self, data: bytes) -> bytes:
        if self._codec is None:
            return data
        out: list[bytes] = []
        p = 0
        n = len(data)
        while p < n:
            header = int.from_bytes(data[p : p + 3], "little")
            p += 3
            length = header >> 1
            if header & 1:  # original
                out.append(data[p : p + length])
                p += length
            else:
                usize, p = _read_varint_bytes(data, p)
                out.append(self._codec.decompress(data[p : p + length], decompressed_size=usize).to_pybytes())
                p += length
        return b"".join(out)
