"""Byte-stream-split codec for fixed-width numeric columns (the technique
behind Parquet's BYTE_STREAM_SPLIT encoding, public spec): transpose the
value array's bytes into per-position planes so that slowly-varying
exponent/high-order bytes group together, then let the block compressor
(zstd) exploit the now-homogeneous runs. The transform itself is
size-neutral and BIT-EXACT (NaN payloads, signed zeros, infinities all
round-trip untouched); all the win comes post-compression — so the codec
auto-selector compares it POST-zstd like every other menu entry
(CLAUDE.md: pre-compression sizes pick the wrong side).

Fully vectorized both ways: one reshape + transpose + copy per direction,
no per-value work — the right shape for a map_batches hot path.

Reference scope note: the reference engine (blkerby/orc-format) writes
doubles as raw IEEE little-endian with no float codec menu
(`reference src/writer/data/double.rs`); this module extends the codec
selector beyond it. The NATIVE container's pinned stripe formats are NOT
changed — byte_split is an opt-in menu entry.
"""

from __future__ import annotations

import numpy as np

from .varint import varint_encode_unsigned

_DTYPE_CODES = {
    np.dtype("<f8"): 1,
    np.dtype("<f4"): 2,
    np.dtype("<i8"): 3,
    np.dtype("<i4"): 4,
    np.dtype("<u8"): 5,
    np.dtype("<u4"): 6,
}
_CODE_DTYPES = {v: k for k, v in _DTYPE_CODES.items()}


def encode(arr: np.ndarray) -> bytes:
    """Byte-plane transpose of a little-endian fixed-width array. Header:
    varint(n) + 1-byte dtype code; body: itemsize planes of n bytes."""
    a = np.ascontiguousarray(arr)
    code = _DTYPE_CODES.get(a.dtype.newbyteorder("<"))
    if code is None:
        raise ValueError(f"byte_split: unsupported dtype {a.dtype}")
    n = len(a)
    head, _ = varint_encode_unsigned(np.array([n], dtype=np.uint64))
    if n == 0:
        return bytes(head) + bytes([code])
    planes = a.view(np.uint8).reshape(n, a.dtype.itemsize).T
    return bytes(head) + bytes([code]) + np.ascontiguousarray(planes).tobytes()


def decode(b: bytes) -> np.ndarray:
    """Inverse of :func:`encode`; dtype restored from the header code."""
    buf = np.frombuffer(b, dtype=np.uint8)
    n = 0
    p = 0
    shift = 0
    while True:
        byte = int(buf[p])
        p += 1
        n |= (byte & 0x7F) << shift
        if byte < 0x80:
            break
        shift += 7
    dtype = _CODE_DTYPES.get(int(buf[p]))
    if dtype is None:
        raise ValueError(f"byte_split: unknown dtype code {int(buf[p])}")
    p += 1
    w = dtype.itemsize
    body = buf[p:]
    if len(body) != n * w:
        raise ValueError(f"byte_split: body holds {len(body)} bytes, want {n * w}")
    planes = body.reshape(w, n)
    return np.ascontiguousarray(planes.T).view(dtype).reshape(n)
