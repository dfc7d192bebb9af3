"""Decimal-scaling float codec ("dec_scale" float-menu entry): many real
float columns are decimal-scaled integers in disguise (prices in cents,
2-decimal discounts, integral quantities stored as doubles — the
observation behind the ALP family, "ALP: Adaptive Lossless floating-Point
compression", SIGMOD 2024). Multiplying by 10^s and rounding yields small
integers whose zigzag varints compress far better than raw IEEE bytes.

BIT-EXACT by construction: a value is stored as a scaled integer ONLY if
the decoder's exact expression — ``int.astype(dtype) / dtype(10^s)``, one
correctly-rounded division — reproduces its bit pattern; everything else
(NaN payloads, infinities, negative zero, true reals, |i| >= 2^53) lands
in a raw-bytes exception list behind a packed bitmap. The scale is chosen
per call: the candidate s with the most exact hits (ties -> smallest s),
so mixed columns degrade gracefully toward all-exceptions raw.

Reference scope note: the reference engine writes doubles as raw IEEE
little-endian with no float codec menu (`reference src/writer/data/
double.rs`); like byte_split/xor_split this is an OPT-IN menu entry — the
native container's pinned stripe formats are unchanged, and the
auto-selector compares it POST-zstd like every other entry.
"""

from __future__ import annotations

import numpy as np

from .byte_split import _CODE_DTYPES, _DTYPE_CODES
from .varint import varint_decode_all, varint_encode_signed, zigzag_decode

_SCALES = (0, 1, 2, 3, 4, 6)
_I_LIMIT = np.float64(2.0**53)


def _recon(i: np.ndarray, s: int, dtype: np.dtype) -> np.ndarray:
    """The decoder's exact reconstruction — encode gates on THIS expression."""
    if dtype == np.dtype("<f4"):
        return (i.astype(np.float32) / np.float32(10.0**s)).astype("<f4")
    return i.astype("<f8") / np.float64(10.0**s)


def encode(arr: np.ndarray) -> bytes:
    a = np.ascontiguousarray(arr)
    code = _DTYPE_CODES.get(a.dtype.newbyteorder("<"))
    if a.dtype.newbyteorder("<") not in (np.dtype("<f8"), np.dtype("<f4")):
        raise ValueError(f"dec_scale encodes float32/float64 only, got {a.dtype}")
    a = a.astype(a.dtype.newbyteorder("<"), copy=False)
    n = len(a)
    bits = a.view(np.uint64 if a.itemsize == 8 else np.uint32)

    best_s, best_exact = 0, None
    af8 = a.astype(np.float64)
    finite = np.isfinite(af8)
    for s in _SCALES:
        scaled = np.where(finite, af8 * np.float64(10.0**s), 0.0)
        ok = finite & (np.abs(scaled) < _I_LIMIT)
        i = np.round(np.where(ok, scaled, 0.0)).astype(np.int64)
        rec = _recon(i, s, a.dtype)
        exact = ok & (rec.view(bits.dtype) == bits)
        if best_exact is None or int(exact.sum()) > int(best_exact.sum()):
            best_s, best_exact = s, exact
    exact = best_exact if best_exact is not None else np.zeros(n, bool)
    i = np.round(np.where(exact, af8 * np.float64(10.0**best_s), 0.0)).astype(np.int64)

    from .varint import varint_encode_unsigned

    head_vals = np.array([n, int((~exact).sum())], np.uint64)
    head, _ = varint_encode_unsigned(head_vals)
    bitmap = np.packbits(~exact) if n else np.zeros(0, np.uint8)
    exc_raw = a[~exact].tobytes()
    ints, _ = varint_encode_signed(i[exact])
    return bytes([code, best_s]) + head + bitmap.tobytes() + exc_raw + ints


def decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, np.uint8)
    dtype = _CODE_DTYPES[int(b[0])]
    s = int(b[1])
    p = 2
    vals = []
    for _ in range(2):  # n, n_exc
        u = 0
        shift = 0
        while True:
            byte = int(b[p]); p += 1
            u |= (byte & 0x7F) << shift
            if byte < 0x80:
                break
            shift += 7
        vals.append(u)
    n, n_exc = vals
    nb_bitmap = (n + 7) // 8
    exc_mask = np.unpackbits(b[p : p + nb_bitmap], count=n).astype(bool) if n else np.zeros(0, bool)
    p += nb_bitmap
    exc_bytes = n_exc * dtype.itemsize
    exc = np.frombuffer(buf, dtype, count=n_exc, offset=p)
    p += exc_bytes
    ints = zigzag_decode(varint_decode_all(b[p:]))[: n - n_exc].view(np.int64)
    out = np.empty(n, dtype)
    out[exc_mask] = exc
    out[~exc_mask] = _recon(ints, s, dtype).astype(dtype)
    return out
