"""Frame-of-reference codec: per-block min subtraction + bit packing.

New-engine codec (north rule; no reference counterpart). Ideal for int32
token-id streams whose values sit in a narrow band. Block layout:

    varint(count) | zigzag-varint(min) | width byte | bitpacked(values - min)

Blocks of BLOCK values keep the width local (one outlier only widens its own
block). Everything vectorized; the per-block loop is O(n / 4096).
"""

from __future__ import annotations

import numpy as np

from . import bitpack
from .varint import varint_decode_all, varint_encode_unsigned, zigzag_decode, zigzag_encode

BLOCK = 4096


def encode(values: np.ndarray, block: int = BLOCK) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    out: list[bytes] = []
    for s in range(0, n, block):
        c = v[s : s + block]
        mn = int(c.min())
        reduced = (c.astype(np.int64) - mn).astype(np.uint64)
        w = bitpack.bit_width(int(reduced.max()))
        hdr, _ = varint_encode_unsigned(
            np.array([len(c), int(zigzag_encode(np.array([mn], dtype=np.int64))[0])], dtype=np.uint64)
        )
        out.append(hdr)
        out.append(bytes([w]))
        out.append(bitpack.pack(reduced, w))
    return b"".join(out)


def decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    parts: list[np.ndarray] = []
    p = 0
    nb = len(b)
    while p < nb:
        # parse two varints (count, zigzag min)
        vals = []
        for _ in range(2):
            z = 0
            shift = 0
            while True:
                byte = int(b[p])
                p += 1
                z |= (byte & 0x7F) << shift
                if byte < 0x80:
                    break
                shift += 7
            vals.append(z)
        count = vals[0]
        mn = int(zigzag_decode(np.array([vals[1]], dtype=np.uint64))[0])
        w = int(b[p])
        p += 1
        nbytes = bitpack.packed_size(count, w)
        reduced = bitpack.unpack(b[p : p + nbytes], w, count)
        p += nbytes
        parts.append(reduced.astype(np.int64) + mn)
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)


def estimate_size(values: np.ndarray, block: int = BLOCK) -> int:
    """Cheap size estimate without materializing output bytes."""
    v = np.asarray(values, dtype=np.int64)
    total = 0
    for s in range(0, len(v), block):
        c = v[s : s + block]
        w = bitpack.bit_width(int(c.max() - c.min()))
        total += 12 + bitpack.packed_size(len(c), w)
    return total
