"""Big-endian bit packing (ORC-style), fully vectorized via np.packbits.

New-engine codec (no counterpart in the reference, which only has RLE v1 —
reference: src/writer/encoder/int_rle_v1.rs); required by the north rule and
shared by rle_v2, frame_of_reference and dictionary index streams.
"""

from __future__ import annotations

import numpy as np


def bit_width(max_value: int) -> int:
    """Minimal bits to represent max_value (>=1 even for 0, like ORC)."""
    return max(1, int(max_value).bit_length())


def pack(values: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into `width`-bit big-endian fields, zero-padded to a byte."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = len(v)
    if n == 0 or width == 0:
        return b""
    if width > 64:
        raise ValueError(f"width {width} > 64")
    be = v.astype(">u8").view(np.uint8).reshape(n, 8)
    bits = np.unpackbits(be, axis=1, bitorder="big")  # (n, 64)
    sel = bits[:, 64 - width :].reshape(-1)
    return np.packbits(sel, bitorder="big").tobytes()


def unpack(buf: bytes | np.ndarray, width: int, count: int) -> np.ndarray:
    """Unpack `count` `width`-bit big-endian fields into uint64."""
    if count == 0 or width == 0:
        return np.zeros(count, dtype=np.uint64)
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    bits = np.unpackbits(b, bitorder="big")[: count * width].reshape(count, width)
    full = np.zeros((count, 64), dtype=np.uint8)
    full[:, 64 - width :] = bits
    return np.packbits(full, axis=1, bitorder="big").view(">u8").reshape(count).astype(np.uint64)


def packed_size(count: int, width: int) -> int:
    return (count * width + 7) // 8
