"""ORC BooleanRLE: MSB-first bit packing (zero-padded final byte) over ByteRLE.

Reference: src/writer/encoder/boolean_rle.rs:44-61 — bits accumulate MSB-first
(`buf = buf << 1 | x`), the final partial byte is left-shifted so the packed
bits occupy the high end, then the byte stream is ByteRLE-encoded.

Used for PRESENT (validity) streams and boolean DATA streams. Note the bit
order is the opposite of Arrow validity bitmaps (LSB-first) — `np.packbits`
with ``bitorder="big"`` handles the conversion.
"""

from __future__ import annotations

import numpy as np

from . import byte_rle


def encode(bits: np.ndarray) -> bytes:
    """Encode a boolean array (numpy bool_ or 0/1 ints)."""
    a = np.asarray(bits, dtype=np.uint8)
    if len(a) == 0:
        return b""
    packed = np.packbits(a, bitorder="big")  # zero-pads the final byte low
    return byte_rle.encode(packed)


def decode(buf: bytes, count: int) -> np.ndarray:
    """Decode `count` booleans."""
    packed = byte_rle.decode(buf)
    bits = np.unpackbits(packed, bitorder="big")
    return bits[:count].astype(bool)
