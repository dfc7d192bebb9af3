"""ORC-RLEv2-style integer codec: SHORT_REPEAT / DIRECT / PATCHED_BASE / DELTA.

New-engine codec required by the north rule (the reference implements only
RLE v1 — reference: src/writer/encoder/int_rle_v1.rs); modeled on the public
ORC v2 run-length spec (512-value chunks, 2-bit mode tag in the header MSBs,
the 32-entry closest-fixed-bit-width table). Cross-implementation byte compat
is NOT a goal — our own decoder is the contract (round-trip property tests);
the layout follows the spec so sizes are honest.

Chunk modes
-----------
* SHORT_REPEAT ``00``: 3..10 repeats of one value; header ``00 WWW RRR``
  (W = value byte width - 1, R = repeats - 3), then W+1 bytes big-endian
  (zigzag when signed).
* DIRECT ``01``: header ``01 wwwww L`` + len byte (9-bit len-1, <=512), then
  len values bit-packed at table width (zigzag when signed).
* PATCHED_BASE ``10``: 4-byte header (width code, 9-bit len-1, base byte
  width, patch width code, patch gap width, patch list length <=31);
  sign-magnitude base, reduced values bit-packed at the ~p95 width, and a
  patch list of (gap, high-bits) entries for the outliers.
* DELTA ``11``: header ``11 wwwww L`` + len byte; varint base + zigzag varint
  first-delta; remaining |deltas| bit-packed (monotonic chunks only); width
  code 0 = constant delta (no packed payload).
"""

from __future__ import annotations

import numpy as np

from . import bitpack

WIDTH_TABLE = list(range(1, 25)) + [26, 28, 30, 32, 40, 48, 56, 64]
_CODE_OF = {}
for _i, _w in enumerate(WIDTH_TABLE):
    _CODE_OF[_w] = _i

CHUNK = 512
MAX_PATCHES = 31

_U64 = np.uint64
_MASK = (1 << 64) - 1


def _round_width(w: int) -> int:
    for t in WIDTH_TABLE:
        if t >= w:
            return t
    return 64


def _zigzag(v: np.ndarray) -> np.ndarray:
    x = v.astype(np.int64, copy=False)
    return (x.astype(np.uint64) << _U64(1)) ^ (x >> np.int64(63)).astype(np.uint64)


def _unzigzag(u: np.ndarray) -> np.ndarray:
    return (u >> _U64(1)).astype(np.int64) ^ -((u & _U64(1)).astype(np.int64))


def _varint(z: int) -> bytes:
    out = bytearray()
    z &= _MASK
    while True:
        if z < 0x80:
            out.append(z)
            return bytes(out)
        out.append(0x80 | (z & 0x7F))
        z >>= 7


def _zigzag_int(x: int) -> int:
    return ((x << 1) ^ (x >> 63)) & _MASK


def _unzigzag_int(z: int) -> int:
    return (z >> 1) ^ -(z & 1)


RUN_MIN = 16  # constant stretches at least this long get their own chunks


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    """Encode with run-aware segmentation: long constant stretches become
    dedicated DELTA(width 0) / SHORT_REPEAT chunks instead of being diced by
    fixed 512 boundaries (which would force DIRECT mode on mixed chunks)."""
    v = np.asarray(values)
    v = v.astype(np.int64, copy=False) if signed else v.astype(np.uint64, copy=False).view(np.int64)
    n = len(v)
    out: list[bytes] = []
    if n == 0:
        return b""
    if n > RUN_MIN:
        change = np.flatnonzero(v[1:] != v[:-1])
        starts = np.concatenate(([0], change + 1))
        lens = np.diff(np.concatenate((starts, [n])))
        bigidx = np.flatnonzero(lens >= RUN_MIN)
        prev = 0
        for i in bigidx:
            a = int(starts[i])
            b = a + int(lens[i])
            for s in range(prev, a, CHUNK):
                _encode_chunk(out, v[s : min(s + CHUNK, a)], signed)
            for s in range(a, b, CHUNK):
                _encode_chunk(out, v[s : min(s + CHUNK, b)], signed)
            prev = b
        for s in range(prev, n, CHUNK):
            _encode_chunk(out, v[s : min(s + CHUNK, n)], signed)
    else:
        for s in range(0, n, CHUNK):
            _encode_chunk(out, v[s : s + CHUNK], signed)
    return b"".join(out)


def _encode_chunk(out: list, c: np.ndarray, signed: bool) -> None:
    n = len(c)
    if n == 0:
        return
    cu = c.view(np.uint64)
    first = int(c[0])

    if n == 1:
        _emit_direct(out, c, signed)
        return

    d = cu[1:] - cu[:-1]  # wrapping deltas
    d_i = d.view(np.int64)
    const = bool((d == d[0]).all())

    # all-equal short chunk -> SHORT_REPEAT; longer constant -> DELTA w0
    if const and int(d[0]) == 0 and 3 <= n <= 10:
        _emit_short_repeat(out, first, n, signed)
        return
    if const and _delta_ok(d_i):
        _emit_delta_fixed(out, first, int(d_i[0]), n, signed)
        return

    # candidate sizes
    size_direct, w_direct, zz = _direct_plan(c, signed)
    best = ("direct", size_direct)

    if _monotonic(d_i) and _delta_ok(d_i):
        size_delta, w_delta = _delta_plan(first, d_i, signed)
        if size_delta < best[1]:
            best = ("delta", size_delta)

    pb = _patched_plan(c, cu, signed)
    if pb is not None and pb[0] < best[1]:
        best = ("patched", pb[0])

    kind = best[0]
    if kind == "direct":
        _emit_direct(out, c, signed, w_direct, zz)
    elif kind == "delta":
        _emit_delta(out, first, d_i, n, signed)
    else:
        _emit_patched(out, c, cu, pb)


def _monotonic(d_i: np.ndarray) -> bool:
    # the decoder infers the direction from the sign of the first delta, so a
    # descending chunk must open with a strictly negative delta
    if (d_i >= 0).all():
        return True
    return bool((d_i <= 0).all() and d_i[0] < 0)


def _delta_ok(d_i: np.ndarray) -> bool:
    # |delta| must be representable; avoid the int64-min edge
    return bool((d_i != np.iinfo(np.int64).min).all())


def _direct_plan(c: np.ndarray, signed: bool):
    zz = _zigzag(c) if signed else c.view(np.uint64)
    w = _round_width(int(zz.max()).bit_length() or 1)
    return 2 + bitpack.packed_size(len(c), w), w, zz


def _delta_plan(first: int, d_i: np.ndarray, signed: bool):
    base_b = _varint(_zigzag_int(first)) if signed else _varint(first & _MASK)
    db_b = _varint(_zigzag_int(int(d_i[0])))
    rest = np.abs(d_i[1:]).astype(np.uint64)
    if len(rest):
        w = _round_width(int(rest.max()).bit_length() or 1)
        if w == 1:
            w = 2  # width code must be >=1 distinct from the const-delta code 0
        size = 2 + len(base_b) + len(db_b) + bitpack.packed_size(len(rest), w)
    else:
        w = 0
        size = 2 + len(base_b) + len(db_b)
    return size, w


def _patched_plan(c: np.ndarray, cu: np.ndarray, signed: bool):
    n = len(c)
    if n < 16:
        return None
    mn = int(c.min())
    if mn == np.iinfo(np.int64).min:
        return None
    reduced = cu - _U64(mn & _MASK)  # wrapping, always correct as uint64
    wmax = int(reduced.max()).bit_length() or 1
    # choose packing width at ~p95 so <=31 outliers carry high bits in patches
    widths = _bit_lengths(reduced)
    w_sorted = np.sort(widths)
    w95 = int(w_sorted[max(0, int(n * 0.95) - 1)])
    w = _round_width(max(1, w95))
    if w >= _round_width(wmax):
        return None
    patch_idx = np.flatnonzero(widths > w)
    if not 0 < len(patch_idx) <= MAX_PATCHES:
        return None
    gaps = np.concatenate(([patch_idx[0]], np.diff(patch_idx)))
    if int(gaps.max()) > 255:
        return None
    pgw = max(1, int(gaps.max()).bit_length())
    patch_vals = reduced[patch_idx] >> _U64(w)
    pw = _round_width(max(1, int(patch_vals.max()).bit_length()))
    if pgw + pw > 64:
        return None
    mag = abs(mn)
    bw = max(1, (mag.bit_length() + 1 + 7) // 8)  # +1 sign bit
    if bw > 8:
        return None
    # spec (and the ORC Java/C++ writers): patch entries pack at the CLOSEST
    # FIXED width of pgw+pw, not the raw sum
    ew = _round_width(pgw + pw)
    size = 4 + bw + bitpack.packed_size(n, w) + bitpack.packed_size(len(patch_idx), ew)
    return size, mn, reduced, w, patch_idx, gaps, patch_vals, pgw, pw, bw


def _bit_lengths(u: np.ndarray) -> np.ndarray:
    """Vectorized bit_length for uint64 (0 -> 0)."""
    out = np.zeros(len(u), dtype=np.int64)
    x = u.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        m = x >= (_U64(1) << _U64(shift))
        out[m] += shift
        x[m] >>= _U64(shift)
    out[u > 0] += 1
    return out


def _emit_short_repeat(out: list, value: int, n: int, signed: bool) -> None:
    z = _zigzag_int(value) if signed else value & _MASK
    nb = max(1, (z.bit_length() + 7) // 8)
    out.append(bytes([(0 << 6) | ((nb - 1) << 3) | (n - 3)]))
    out.append(z.to_bytes(nb, "big"))


def _emit_direct(out: list, c: np.ndarray, signed: bool, w: int | None = None, zz=None) -> None:
    if zz is None:
        zz = _zigzag(c) if signed else c.view(np.uint64)
        w = _round_width(int(zz.max()).bit_length() or 1)
    n = len(c)
    code = _CODE_OF[w]
    out.append(bytes([(1 << 6) | (code << 1) | ((n - 1) >> 8), (n - 1) & 0xFF]))
    out.append(bitpack.pack(zz, w))


def _emit_delta_fixed(out: list, first: int, delta: int, n: int, signed: bool) -> None:
    out.append(bytes([(3 << 6) | (0 << 1) | ((n - 1) >> 8), (n - 1) & 0xFF]))
    out.append(_varint(_zigzag_int(first)) if signed else _varint(first & _MASK))
    out.append(_varint(_zigzag_int(delta)))


def _emit_delta(out: list, first: int, d_i: np.ndarray, n: int, signed: bool) -> None:
    rest = np.abs(d_i[1:]).astype(np.uint64)
    w = _round_width(int(rest.max()).bit_length() or 1) if len(rest) else 0
    if w == 1:
        w = 2
    code = _CODE_OF[w] if w else 0
    out.append(bytes([(3 << 6) | (code << 1) | ((n - 1) >> 8), (n - 1) & 0xFF]))
    out.append(_varint(_zigzag_int(first)) if signed else _varint(first & _MASK))
    out.append(_varint(_zigzag_int(int(d_i[0]))))
    if w:
        out.append(bitpack.pack(rest, w))


def _emit_patched(out: list, c: np.ndarray, cu: np.ndarray, plan) -> None:
    _, mn, reduced, w, patch_idx, gaps, patch_vals, pgw, pw, bw = plan
    n = len(c)
    code = _CODE_OF[w]
    b0 = (2 << 6) | (code << 1) | ((n - 1) >> 8)
    b1 = (n - 1) & 0xFF
    b2 = ((bw - 1) << 5) | _CODE_OF[pw]
    b3 = ((pgw - 1) << 5) | len(patch_idx)
    out.append(bytes([b0, b1, b2, b3]))
    mag = abs(mn)
    base_bytes = bytearray(mag.to_bytes(bw, "big"))
    if mn < 0:
        base_bytes[0] |= 0x80
    out.append(bytes(base_bytes))
    low = reduced & ((_U64(1) << _U64(w)) - _U64(1)) if w < 64 else reduced
    out.append(bitpack.pack(low, w))
    entries = (gaps.astype(np.uint64) << _U64(pw)) | patch_vals
    out.append(bitpack.pack(entries, _round_width(pgw + pw)))  # spec: closest fixed width


def decode(buf: bytes, signed: bool = True) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    nb = len(b)
    parts: list[np.ndarray] = []
    p = 0
    while p < nb:
        h = int(b[p])
        mode = h >> 6
        if mode == 0:  # SHORT_REPEAT
            w = ((h >> 3) & 0x7) + 1
            n = (h & 0x7) + 3
            z = int.from_bytes(b[p + 1 : p + 1 + w].tobytes(), "big")
            val = _unzigzag_int(z) if signed else z
            parts.append(np.full(n, val, dtype=np.int64))
            p += 1 + w
        elif mode == 1:  # DIRECT
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            w = WIDTH_TABLE[code]
            p += 2
            nbytes = bitpack.packed_size(n, w)
            zz = bitpack.unpack(b[p : p + nbytes], w, n)
            p += nbytes
            parts.append(_unzigzag(zz) if signed else zz.view(np.int64))
        elif mode == 3:  # DELTA
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            p += 2
            z, p = _read_varint(b, p)
            first = _unzigzag_int(z) if signed else z
            z, p = _read_varint(b, p)
            d0 = _unzigzag_int(z)
            if code == 0:
                seq = _U64(first & _MASK) + np.arange(n, dtype=np.uint64) * _U64(d0 & _MASK)
                parts.append(seq.view(np.int64))
            else:
                w = WIDTH_TABLE[code]
                nbytes = bitpack.packed_size(n - 2, w)
                mags = bitpack.unpack(b[p : p + nbytes], w, n - 2)
                p += nbytes
                sign = 1 if d0 >= 0 else -1
                deltas = np.concatenate(
                    ([np.uint64(d0 & _MASK)], (mags.view(np.int64) * sign).astype(np.int64).view(np.uint64))
                )
                vals = np.concatenate(([np.uint64(first & _MASK)], deltas)).cumsum(dtype=np.uint64)
                parts.append(vals.view(np.int64))
        else:  # PATCHED_BASE
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            w = WIDTH_TABLE[code]
            b2, b3 = int(b[p + 2]), int(b[p + 3])
            bw = (b2 >> 5) + 1
            pw = WIDTH_TABLE[b2 & 0x1F]
            pgw = (b3 >> 5) + 1
            pll = b3 & 0x1F
            p += 4
            raw = bytearray(b[p : p + bw].tobytes())
            neg = raw[0] & 0x80
            raw[0] &= 0x7F
            mn = int.from_bytes(bytes(raw), "big")
            if neg:
                mn = -mn
            p += bw
            nbytes = bitpack.packed_size(n, w)
            low = bitpack.unpack(b[p : p + nbytes], w, n)
            p += nbytes
            ew = _round_width(pgw + pw)  # spec: entries pack at closest fixed width
            ebytes = bitpack.packed_size(pll, ew)
            entries = bitpack.unpack(b[p : p + ebytes], ew, pll)
            p += ebytes
            gaps = (entries >> _U64(pw)).astype(np.int64)
            pvals = entries & ((_U64(1) << _U64(pw)) - _U64(1))
            # a gap of 255 with patch value 0 is a spec'd continuation entry
            # (real gap > 2^pgw-1); cumsum handles it, OR-ing 0 is harmless
            idx = np.cumsum(gaps)
            low[idx] |= pvals << _U64(w)
            parts.append((low + _U64(mn & _MASK)).view(np.int64))
    res = np.concatenate(parts) if parts else np.zeros(0, dtype=np.int64)
    return res if signed else res.view(np.uint64)


def _read_varint(b: np.ndarray, p: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        byte = int(b[p])
        p += 1
        z |= (byte & 0x7F) << shift
        if byte < 0x80:
            return z, p
        shift += 7


def decode_runs(buf: bytes, signed: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Run-level decode: ``(values, counts)`` preserving the stream's value
    multiset without expanding constant runs (the aggregate-pushdown
    contract of ``int_rle_v1.decode_runs``): SHORT_REPEAT chunks and
    constant-delta-0 DELTA chunks collapse to ONE ``(value, n)`` pair;
    every other chunk's values expand with count 1 (their values carry no
    repetition the header can prove). Pairs are NOT merged across chunks —
    fold with ``np.unique``/groupby downstream. ``np.repeat(values,
    counts)`` equals ``decode(buf)`` up to ordering of equal values
    (pinned by tests)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    nb = len(b)
    vs: list[np.ndarray] = []
    cs: list[np.ndarray] = []

    def _push_run(val: int, n: int) -> None:
        vs.append(np.array([val], np.int64))
        cs.append(np.array([n], np.int64))

    def _push_all(a: np.ndarray) -> None:
        vs.append(a.view(np.int64) if a.dtype != np.int64 else a)
        cs.append(np.ones(len(a), np.int64))

    p = 0
    while p < nb:
        h = int(b[p])
        mode = h >> 6
        if mode == 0:  # SHORT_REPEAT -> one pair
            w = ((h >> 3) & 0x7) + 1
            n = (h & 0x7) + 3
            z = int.from_bytes(b[p + 1 : p + 1 + w].tobytes(), "big")
            _push_run(_unzigzag_int(z) if signed else z, n)
            p += 1 + w
        elif mode == 1:  # DIRECT -> expand
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            w = WIDTH_TABLE[code]
            p += 2
            nbytes = bitpack.packed_size(n, w)
            zz = bitpack.unpack(b[p : p + nbytes], w, n)
            p += nbytes
            _push_all(_unzigzag(zz) if signed else zz.view(np.int64))
        elif mode == 3:  # DELTA
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            p += 2
            z, p = _read_varint(b, p)
            first = _unzigzag_int(z) if signed else z
            z, p = _read_varint(b, p)
            d0 = _unzigzag_int(z)
            if code == 0:
                if d0 == 0:  # constant run -> one pair
                    _push_run(first, n)
                else:  # arithmetic sequence: all distinct, expand
                    seq = _U64(first & _MASK) + np.arange(n, dtype=np.uint64) * _U64(d0 & _MASK)
                    _push_all(seq.view(np.int64))
            else:
                w = WIDTH_TABLE[code]
                nbytes = bitpack.packed_size(n - 2, w)
                mags = bitpack.unpack(b[p : p + nbytes], w, n - 2)
                p += nbytes
                sign = 1 if d0 >= 0 else -1
                deltas = np.concatenate(
                    ([np.uint64(d0 & _MASK)], (mags.view(np.int64) * sign).astype(np.int64).view(np.uint64))
                )
                vals = np.concatenate(([np.uint64(first & _MASK)], deltas)).cumsum(dtype=np.uint64)
                _push_all(vals.view(np.int64))
        else:  # PATCHED_BASE -> expand (reuse the full decoder's parse)
            code = (h >> 1) & 0x1F
            n = (((h & 1) << 8) | int(b[p + 1])) + 1
            w = WIDTH_TABLE[code]
            b2, b3 = int(b[p + 2]), int(b[p + 3])
            bw = (b2 >> 5) + 1
            pw = WIDTH_TABLE[b2 & 0x1F]
            pgw = (b3 >> 5) + 1
            pll = b3 & 0x1F
            p += 4
            raw = bytearray(b[p : p + bw].tobytes())
            neg = raw[0] & 0x80
            raw[0] &= 0x7F
            mn = int.from_bytes(bytes(raw), "big")
            if neg:
                mn = -mn
            p += bw
            nbytes = bitpack.packed_size(n, w)
            low = bitpack.unpack(b[p : p + nbytes], w, n)
            p += nbytes
            ew = _round_width(pgw + pw)
            ebytes = bitpack.packed_size(pll, ew)
            entries = bitpack.unpack(b[p : p + ebytes], ew, pll)
            p += ebytes
            gaps = (entries >> _U64(pw)).astype(np.int64)
            pvals = entries & ((_U64(1) << _U64(pw)) - _U64(1))
            idx = np.cumsum(gaps)
            low[idx] |= pvals << _U64(w)
            _push_all((low + _U64(mn & _MASK)).view(np.int64))
    if not vs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    return np.concatenate(vs), np.concatenate(cs)
