"""Vectorized LEB128 varint + zigzag codecs.

Semantics match the reference encoder (reference: src/writer/encoder/varint.rs:10-58):
unsigned base-128 varint, 7 bits per byte little-endian-first, high bit =
continuation; signed values are zigzag-transformed ``(x << 1) ^ (x >> 63)`` first.

All kernels are numpy-vectorized over whole arrays (no per-value Python loop);
they are the building blocks for the RLE codecs and the decimal stream.
"""

from __future__ import annotations

import numpy as np

_U1 = np.uint64(1)
_U7 = np.uint64(7)
_U0x7F = np.uint64(0x7F)


def zigzag_encode(x: np.ndarray) -> np.ndarray:
    """int64 array -> uint64 zigzag representation ((x<<1) ^ (x>>63))."""
    x = np.ascontiguousarray(x, dtype=np.int64)
    # views reinterpret bits for free; only the shift allocates
    return (x.view(np.uint64) << _U1) ^ (x >> np.int64(63)).view(np.uint64)


def zigzag_decode(u: np.ndarray) -> np.ndarray:
    """uint64 zigzag array -> int64."""
    u = np.asarray(u, dtype=np.uint64)
    return (u >> _U1).astype(np.int64) ^ -((u & _U1).astype(np.int64))


def varint_byte_lengths(v: np.ndarray) -> np.ndarray:
    """Per-value encoded byte length of unsigned varints (1..10)."""
    v = np.asarray(v, dtype=np.uint64)
    nb = np.ones(len(v), dtype=np.int64)
    for k in range(1, 10):
        m = v >= (_U1 << np.uint64(7 * k))
        if not m.any():
            break
        nb += m.astype(np.int64)
    return nb


def varint_encode_unsigned(v: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Encode a uint64 array as concatenated varints.

    Returns (bytes, per-value byte lengths). The lengths let callers slice
    individual varints out of the concatenation (used by the RLE group
    assemblers).
    """
    v = np.asarray(v, dtype=np.uint64)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = varint_byte_lengths(v)
    max_nb = int(nb.max())
    if max_nb <= 4:
        # dense fast path: all-short varints (the common case) write a
        # (n, max_nb) byte matrix with pure vector stores, then one boolean
        # compress — no fancy gather/scatter (~3x on token-like data)
        dense = np.empty((n, max_nb), dtype=np.uint8)
        for k in range(max_nb):
            col = ((v >> np.uint64(7 * k)) & _U0x7F).astype(np.uint8)
            if k + 1 < 10:
                col |= np.where(nb > (k + 1), np.uint8(0x80), np.uint8(0))
            dense[:, k] = col
        keep = (np.arange(max_nb, dtype=np.int64)[None, :] < nb[:, None]).ravel()
        return dense.ravel()[keep].tobytes(), nb
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    for k in range(10):
        mask = nb > k
        if not mask.any():
            break
        idx = pos[mask] + k
        vals = (v[mask] >> np.uint64(7 * k)) & _U0x7F
        cont = np.where(nb[mask] > (k + 1), np.uint8(0x80), np.uint8(0))
        out[idx] = vals.astype(np.uint8) | cont
    return out.tobytes(), nb


def varint_encode_signed(x: np.ndarray) -> tuple[bytes, np.ndarray]:
    """Zigzag + varint encode an int64 array."""
    return varint_encode_unsigned(zigzag_encode(x))


def varint_encode_unsigned32(v: np.ndarray) -> tuple[bytes, np.ndarray]:
    """uint32 fast path: byte-identical to the 64-bit encoder for values < 2^32
    but half the memory traffic (the hot path for int32 token streams)."""
    v = np.ascontiguousarray(v, dtype=np.uint32)
    n = len(v)
    if n == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nb = np.ones(n, dtype=np.int32)
    one = np.uint32(1)
    for k in range(1, 5):
        m = v >= (one << np.uint32(7 * k))
        if not m.any():
            break
        nb += m.astype(np.int32)
    max_nb = int(nb.max())
    if max_nb <= 4:
        # dense fast path (see varint_encode_unsigned): vector stores + one
        # boolean compress beat per-byte fancy scatter on the token hot path
        dense = np.empty((n, max_nb), dtype=np.uint8)
        for k in range(max_nb):
            col = ((v >> np.uint32(7 * k)) & np.uint32(0x7F)).astype(np.uint8)
            col |= np.where(nb > (k + 1), np.uint8(0x80), np.uint8(0))
            dense[:, k] = col
        keep = (np.arange(max_nb, dtype=np.int32)[None, :] < nb[:, None]).ravel()
        return dense.ravel()[keep].tobytes(), nb.astype(np.int64)
    total = int(nb.sum())
    out = np.empty(total, dtype=np.uint8)
    pos = np.zeros(n, dtype=np.int64)
    np.cumsum(nb[:-1], out=pos[1:])
    for k in range(5):
        mask = nb > k
        if not mask.any():
            break
        idx = pos[mask] + k
        vals = (v[mask] >> np.uint32(7 * k)) & np.uint32(0x7F)
        cont = np.where(nb[mask] > (k + 1), np.uint8(0x80), np.uint8(0))
        out[idx] = vals.astype(np.uint8) | cont
    return out.tobytes(), nb.astype(np.int64)


def zigzag_encode32(x: np.ndarray) -> np.ndarray:
    """int32 -> uint32 zigzag; numerically equal to the 64-bit zigzag of the
    same values (2x for x>=0, -2x-1 for x<0), so varints match bit-for-bit."""
    x = np.ascontiguousarray(x, dtype=np.int32)
    return (x.view(np.uint32) << np.uint32(1)) ^ (x >> np.int32(31)).view(np.uint32)


def varint_decode_all(buf: np.ndarray | bytes) -> np.ndarray:
    """Decode a buffer consisting solely of back-to-back unsigned varints.

    Fully vectorized forward scheme: value starts are the bytes after each
    terminator; iteration k ORs byte k of every still-open varint into its
    value slot. The active set shrinks with k (most varints are 1-3 bytes),
    so traffic concentrates on the first iterations — this is the decode hot
    path for token streams and is memory-bandwidth sensitive.
    """
    b = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray, memoryview)) else np.asarray(buf, dtype=np.uint8)
    nb = len(b)
    if nb == 0:
        return np.zeros(0, dtype=np.uint64)
    cont = b >= 0x80
    starts = np.flatnonzero(np.concatenate(([True], ~cont[:-1])))  # first byte of each varint (follows a terminator)
    vals = (b[starts] & np.uint8(0x7F)).astype(np.uint64)
    idx = starts + 1
    live = np.flatnonzero(cont[starts])  # varints longer than 1 byte
    k = 1
    while len(live):
        pos = idx[live]
        vals[live] |= (b[pos] & np.uint8(0x7F)).astype(np.uint64) << np.uint64(7 * k)
        live = live[cont[pos]]
        idx[live] += 1
        k += 1
    return vals


def varint_decode_signed_all(buf) -> np.ndarray:
    return zigzag_decode(varint_decode_all(buf))


def varint_encode_bigint(values: list[int]) -> bytes:
    """Arbitrary-precision signed varints (Python ints; for decimal128 paths).

    Zigzag is applied at 128-bit width like the reference i128 impl
    (reference: src/writer/encoder/varint.rs:89-108).
    """
    out = bytearray()
    for x in values:
        z = (x << 1) ^ (x >> 127)
        z &= (1 << 128) - 1
        while True:
            if z < 0x80:
                out.append(z)
                break
            out.append(0x80 | (z & 0x7F))
            z >>= 7
    return bytes(out)


def varint_decode_bigint(buf: bytes, count: int) -> list[int]:
    """Decode `count` 128-bit zigzag varints into Python ints."""
    vals = []
    z = 0
    shift = 0
    for byte in buf:
        z |= (byte & 0x7F) << shift
        if byte < 0x80:
            sign = z & 1
            mag = z >> 1
            vals.append(~mag if sign else mag)  # zigzag inverse: (z>>1) ^ -(z&1)
            z = 0
            shift = 0
            if len(vals) == count:
                break
        else:
            shift += 7
    return vals
