"""ORC bloom filters (BLOOM_FILTER_UTF8, stream kind 8) per the public ORC
spec and the published Java ``org.apache.orc.util.BloomFilter`` algorithm:

* value hash = first 64 bits of Murmur3 x64_128 with ORC's seed 104729;
* k probe positions via 32-bit double hashing — ``h1 + i * h2`` with Java
  int wraparound, bit-flipped when negative, mod numBits;
* sizing: ``m = -n ln(p) / ln(2)^2`` rounded up to a multiple of 64 bits,
  ``k = max(1, round(m / n * ln 2))``;
* serialization: ``BloomFilterIndex { repeated BloomFilter { uint32
  numHashFunctions = 1; bytes utf8bitset = 3; } }`` — the bitset longs as
  little-endian bytes.

Cross-implementation bit parity follows the published algorithm, but no
Java/C++ ORC build exists in this sandbox to pin it; our reader is the
consuming implementation (the same honesty caveat as the lzo decoder).
The murmur kernel is therefore implemented twice (block-wise and
straight-line transliterations) and cross-checked by fuzz in tests.
"""

from __future__ import annotations

import math

import numpy as np

ORC_SEED = 104729  # org.apache.orc.util.Murmur3.DEFAULT_SEED
_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _MASK64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _MASK64
    h ^= h >> 33
    return h


def murmur3_x64_128(data: bytes, seed: int = ORC_SEED) -> tuple[int, int]:
    """Reference transliteration of Murmur3 x64_128 (public domain spec)."""
    h1 = h2 = seed & _MASK64
    n = len(data)
    nblocks = n // 16
    for b in range(nblocks):
        k1 = int.from_bytes(data[b * 16 : b * 16 + 8], "little")
        k2 = int.from_bytes(data[b * 16 + 8 : b * 16 + 16], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    # tail
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    t = len(tail)
    if t > 8:
        k2 = int.from_bytes(tail[8:].ljust(8, b"\0"), "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if t > 0:
        k1 = int.from_bytes(tail[:8][: min(t, 8)].ljust(8, b"\0"), "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
    h1 ^= n
    h2 ^= n
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def murmur3_hash64_alt(data: bytes, seed: int = ORC_SEED) -> int:
    """Independent straight-line restatement of the h1 half (processes the
    same 16-byte rounds with explicit temporaries) — exists purely to
    cross-check ``murmur3_x64_128`` by fuzz, since no third-party
    implementation is available in-sandbox."""
    h = [seed & _MASK64, seed & _MASK64]
    i, n = 0, len(data)
    while n - i >= 16:
        a = int.from_bytes(data[i : i + 8], "little")
        b = int.from_bytes(data[i + 8 : i + 16], "little")
        a = _rotl((a * _C1) & _MASK64, 31) * _C2 & _MASK64
        h[0] = ((_rotl(h[0] ^ a, 27) + h[1]) * 5 + 0x52DCE729) & _MASK64
        b = _rotl((b * _C2) & _MASK64, 33) * _C1 & _MASK64
        h[1] = ((_rotl(h[1] ^ b, 31) + h[0]) * 5 + 0x38495AB5) & _MASK64
        i += 16
    rem = data[i:]
    if len(rem) > 8:
        b = int.from_bytes(rem[8:].ljust(8, b"\0"), "little")
        h[1] ^= _rotl((b * _C2) & _MASK64, 33) * _C1 & _MASK64
    if rem:
        a = int.from_bytes(rem[:8].ljust(8, b"\0"), "little")
        h[0] ^= _rotl((a * _C1) & _MASK64, 31) * _C2 & _MASK64
    h[0] ^= n
    h[1] ^= n
    h[0] = (h[0] + h[1]) & _MASK64
    h[1] = (h[1] + h[0]) & _MASK64
    h[0] = _fmix(h[0])
    h[1] = _fmix(h[1])
    return (h[0] + h[1]) & _MASK64


def wang_long_hash(v: int) -> int:
    """Java ORC ``BloomFilter.getLongHash`` — Thomas Wang's published 64-bit
    integer mix; integer columns (tinyint..bigint, date) hash their long
    value through this instead of Murmur3."""
    k = v & _MASK64
    k = ((~k) + (k << 21)) & _MASK64
    k ^= k >> 24
    k = (k + (k << 3) + (k << 8)) & _MASK64
    k ^= k >> 14
    k = (k + (k << 2) + (k << 4)) & _MASK64
    k ^= k >> 28
    k = (k + (k << 31)) & _MASK64
    return k


def wang_long_hashes(vals: np.ndarray) -> np.ndarray:
    """Vectorized restatement of ``wang_long_hash`` over an int64 array
    (uint64 wraparound arithmetic) — the encode path, cross-checked against
    the scalar transliteration by fuzz."""
    with np.errstate(over="ignore"):
        k = vals.astype(np.int64).view(np.uint64).copy()
        k = (~k) + (k << np.uint64(21))
        k ^= k >> np.uint64(24)
        k = k + (k << np.uint64(3)) + (k << np.uint64(8))
        k ^= k >> np.uint64(14)
        k = k + (k << np.uint64(2)) + (k << np.uint64(4))
        k ^= k >> np.uint64(28)
        k = k + (k << np.uint64(31))
    return k


def murmur3_h1_many(data: np.ndarray, starts: np.ndarray, lengths: np.ndarray, seed: int = ORC_SEED) -> np.ndarray:
    """Vectorized Murmur3 x64_128 h1 over variable-length byte slices of a
    flat uint8 buffer (``[starts[i], starts[i]+lengths[i])`` per value) —
    the bloom write path for string/binary columns without a Python loop
    over rows. Bit parity with the scalar ``murmur3_x64_128`` is pinned by
    fuzz (tests), the same dual-implementation pattern as the wang hash.

    Shape: one vectorized round per 16-byte block DEPTH (masked to the
    values still having blocks), so the Python-level loop count is
    ``max(len) // 16``, not the row count."""
    m = len(starts)
    starts = np.asarray(starts, np.int64)
    lengths = np.asarray(lengths, np.int64)
    h1 = np.full(m, seed, np.uint64)
    h2 = np.full(m, seed, np.uint64)
    if m == 0:
        return h1
    C1 = np.uint64(_C1)
    C2 = np.uint64(_C2)

    def rotl(x, r):
        return (x << np.uint64(r)) | (x >> np.uint64(64 - r))

    nblocks = lengths // 16
    idx16 = np.arange(16, dtype=np.int64)
    with np.errstate(over="ignore"):
        for r in range(int(nblocks.max()) if m else 0):
            sel = np.nonzero(nblocks > r)[0]
            gather = np.ascontiguousarray(data[(starts[sel] + 16 * r)[:, None] + idx16])
            words = gather.view(np.uint64)  # little-endian platform
            k1 = rotl(words[:, 0] * C1, 31) * C2
            k2 = rotl(words[:, 1] * C2, 33) * C1
            a = h1[sel] ^ k1
            a = (rotl(a, 27) + h2[sel]) * np.uint64(5) + np.uint64(0x52DCE729)
            b = h2[sel] ^ k2
            b = (rotl(b, 31) + a) * np.uint64(5) + np.uint64(0x38495AB5)
            h1[sel] = a
            h2[sel] = b
        # tails: gather up to 16 bytes zero-padded past each value's end
        t = lengths - 16 * nblocks
        tstart = starts + 16 * nblocks
        pos = tstart[:, None] + idx16
        valid = idx16[None, :] < t[:, None]
        safe = np.minimum(pos, max(len(data) - 1, 0))
        tail = np.where(valid, data[safe] if len(data) else np.uint8(0), np.uint8(0)).astype(np.uint8)
        words = np.ascontiguousarray(tail).view(np.uint64)
        sel2 = t > 8
        if sel2.any():
            k2 = rotl(words[sel2, 1] * C2, 33) * C1
            h2[sel2] ^= k2
        sel1 = t > 0
        if sel1.any():
            k1 = rotl(words[sel1, 0] * C1, 31) * C2
            h1[sel1] ^= k1
        h1 ^= lengths.view(np.uint64) if lengths.dtype == np.int64 else lengths.astype(np.uint64)
        h2 ^= lengths.view(np.uint64) if lengths.dtype == np.int64 else lengths.astype(np.uint64)
        h1 += h2
        h2 += h1
        for h in (h1, h2):
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xFF51AFD7ED558CCD)
            h ^= h >> np.uint64(33)
            h *= np.uint64(0xC4CEB9FE1A85EC53)
            h ^= h >> np.uint64(33)
        h1 += h2
    return h1


def bloom_build_bytes(arr, expected_entries: int, fpp: float = 0.05) -> tuple[int, bytes]:
    """Vectorized filter build over an Arrow binary-like array (no nulls):
    murmur h1 per value via ``murmur3_h1_many`` over the array's own
    buffers (zero-copy), then the same vectorized double-hash bit stores as
    the long path. Bit-identical to ``bloom_build`` over the same values."""
    import pyarrow as pa

    arr = arr.cast(pa.large_binary())
    n = len(arr)
    num_bits, k = _sizing(expected_entries, fpp)
    bits = np.zeros(num_bits // 64, dtype=np.uint64)
    if n:
        offs = np.frombuffer(arr.buffers()[1], np.int64)[arr.offset : arr.offset + n + 1]
        data = np.frombuffer(arr.buffers()[2], np.uint8)
        h = murmur3_h1_many(data, offs[:-1], np.diff(offs))
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h1[h1 >= 1 << 31] -= 1 << 32
        h2 = (h >> np.uint64(32)).astype(np.int64)
        h2[h2 >= 1 << 31] -= 1 << 32
        for i in range(1, k + 1):
            c = (h1 + i * h2) & 0xFFFFFFFF
            c = np.where(c >= 1 << 31, c - (1 << 32), c)
            c = np.where(c < 0, ~c, c)
            pos = c % num_bits
            np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return k, bits.tobytes()


def _sizing(expected_entries: int, fpp: float) -> tuple[int, int]:
    n = max(1, int(expected_entries))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    num_bits = ((m + 63) // 64) * 64
    k = max(1, int(round(num_bits / n * math.log(2))))
    return num_bits, k


def _positions(hash64: int, k: int, num_bits: int) -> list[int]:
    """Java BloomFilter.addHash: 32-bit double hashing with int wraparound."""
    h1 = hash64 & 0xFFFFFFFF
    h2 = (hash64 >> 32) & 0xFFFFFFFF
    if h1 >= 1 << 31:
        h1 -= 1 << 32
    if h2 >= 1 << 31:
        h2 -= 1 << 32
    out = []
    for i in range(1, k + 1):
        c = (h1 + i * h2) & 0xFFFFFFFF
        if c >= 1 << 31:
            c -= 1 << 32
        if c < 0:
            c = ~c
        out.append(c % num_bits)
    return out


def bloom_build(values, expected_entries: int, fpp: float = 0.05) -> tuple[int, bytes]:
    """Build one filter over an iterable of ``bytes`` values. Returns
    (numHashFunctions, utf8bitset bytes: little-endian uint64 words)."""
    num_bits, k = _sizing(expected_entries, fpp)
    bits = np.zeros(num_bits // 64, dtype=np.uint64)
    for v in values:
        h1, _ = murmur3_x64_128(v)
        for pos in _positions(h1, k, num_bits):
            bits[pos >> 6] |= np.uint64(1) << np.uint64(pos & 63)
    return k, bits.tobytes()


def bloom_build_longs(vals: np.ndarray, expected_entries: int, fpp: float = 0.05) -> tuple[int, bytes]:
    """Vectorized filter build over int64 values (no Python loop over rows:
    hashes, probe positions and bit stores are all numpy)."""
    num_bits, k = _sizing(expected_entries, fpp)
    bits = np.zeros(num_bits // 64, dtype=np.uint64)
    if len(vals):
        h = wang_long_hashes(np.asarray(vals, dtype=np.int64))
        h1 = (h & np.uint64(0xFFFFFFFF)).astype(np.int64)
        h1[h1 >= 1 << 31] -= 1 << 32
        h2 = (h >> np.uint64(32)).astype(np.int64)
        h2[h2 >= 1 << 31] -= 1 << 32
        for i in range(1, k + 1):
            c = (h1 + i * h2) & 0xFFFFFFFF  # |h1 + k*h2| << 2^63: exact in int64
            c = np.where(c >= 1 << 31, c - (1 << 32), c)  # Java int wraparound
            c = np.where(c < 0, ~c, c)
            pos = c % num_bits
            np.bitwise_or.at(bits, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
    return k, bits.tobytes()


def bloom_might_contain_hash(k: int, bitset: bytes, hash64: int) -> bool:
    bits = np.frombuffer(bitset, dtype=np.uint64)
    num_bits = len(bits) * 64
    if num_bits == 0:
        return False
    for pos in _positions(hash64, k, num_bits):
        if not (int(bits[pos >> 6]) >> (pos & 63)) & 1:
            return False
    return True


def bloom_might_contain(k: int, bitset: bytes, value: bytes) -> bool:
    h1, _ = murmur3_x64_128(value)
    return bloom_might_contain_hash(k, bitset, h1)
