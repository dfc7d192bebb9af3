"""Static-frequency interleaved rANS entropy codec — an OPT-IN int-menu
entry for cold/archival tiers (register via ``selector.register_int_codec
("rans", rans.encode, rans.decode)``; it is deliberately NOT in the
default menu: decode is lane-vectorized but still ~an order slower than
RLE, the wrong trade for the hot decode path).

Published algorithm (J. Duda, "Asymmetric numeral systems", 2013; the
tANS/rANS family FSE/zstd builds on). This implementation:

- models the TRUE symbol distribution at 16-bit precision (M = 2^16),
  which beats byte-oriented entropy coding when the alphabet is larger
  than a byte (token ids) — varint+zstd splits a token across bytes and
  loses the symbol identity;
- interleaves K = 256 independent rANS lanes round-robin over the value
  stream, so encode AND decode run as numpy ops across all lanes per
  step (the standard SIMD-rANS trick, expressed in numpy);
- 32-bit states, 16-bit renormalization words, per-lane word streams
  concatenated with a varint offset directory.

Layout: varint(n) varint(n_syms) [sym,freq varint pairs] varint(K)
[per-lane word counts] [lane word streams, little-endian uint16].
Symbols are the array's distinct values (any int64 range — zigzagged);
frequencies quantize to sum EXACTLY M with every present symbol >= 1.
"""

from __future__ import annotations

import numpy as np

from .varint import (
    varint_decode_all,
    varint_encode_signed,
    varint_encode_unsigned,
    zigzag_decode,
    zigzag_encode,
)

_PREC = 16
_M = 1 << _PREC
_LANES = 256
_STATE_LO = np.uint64(1 << 16)  # renorm lower bound
_WORD = np.uint64(0xFFFF)


def _quantize_freqs(counts: np.ndarray) -> np.ndarray:
    """Scale counts to sum EXACTLY M with every entry >= 1 (largest-
    remainder; deterministic). Alphabets near M can't be modeled — loud."""
    if len(counts) > _M // 4:
        raise ValueError(f"{len(counts)} distinct symbols exceed rANS alphabet capacity")
    n = counts.sum()
    raw = counts.astype(np.float64) * (_M / n)
    f = np.maximum(1, np.floor(raw).astype(np.int64))
    diff = _M - int(f.sum())
    if diff > 0:
        # hand the shortfall to the largest remainders (ties -> lowest index)
        order = np.argsort(-(raw - np.floor(raw)), kind="stable")
        f[order[:diff]] += 1
    elif diff < 0:
        # take back from the largest entries that stay >= 1
        order = np.argsort(-f, kind="stable")
        k = 0
        while diff < 0:
            i = order[k % len(f)]
            if f[i] > 1:
                f[i] -= 1
                diff += 1
            k += 1
    assert int(f.sum()) == _M and f.min() >= 1
    return f


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    v = np.asarray(values, dtype=np.int64)
    n = len(v)
    head_parts = []
    nbuf, _ = varint_encode_unsigned(np.array([n], np.uint64))
    head_parts.append(nbuf)
    if n == 0:
        return b"".join(head_parts)
    u = zigzag_encode(v) if signed else v.view(np.uint64)
    syms, inv, counts = np.unique(u, return_inverse=True, return_counts=True)
    freqs = _quantize_freqs(counts)
    cum = np.zeros(len(syms) + 1, np.int64)
    np.cumsum(freqs, out=cum[1:])

    sbuf, _ = varint_encode_unsigned(np.array([len(syms)], np.uint64))
    head_parts.append(sbuf)
    # symbol ids are sorted (np.unique) — delta-encode them so dense
    # alphabets cost ~1 byte/symbol before compression
    dsyms = np.diff(np.concatenate(([np.uint64(0)], syms.astype(np.uint64))).view(np.int64)).view(np.uint64)
    table, _ = varint_encode_unsigned(
        np.stack([dsyms, freqs.astype(np.uint64)], axis=1).reshape(-1)
    )
    head_parts.append(table)

    # lane l owns value indices l, l+K, l+2K, ... ; each lane encodes its
    # subsequence in REVERSE (rANS decodes forward)
    K = min(_LANES, max(1, n))
    kbuf, _ = varint_encode_unsigned(np.array([K], np.uint64))
    head_parts.append(kbuf)

    f_of = freqs[inv].astype(np.uint64)   # per-value freq
    c_of = cum[inv].astype(np.uint64)     # per-value cumulative start

    states = np.full(K, _STATE_LO, np.uint64)
    lane_words: list[list[np.ndarray]] = [[] for _ in range(K)]
    steps = (n + K - 1) // K
    # exact renorm threshold (ryg rans_word formulation): x_max =
    # ((L >> PREC) << 16) * f = f << (16 + 16 - PREC). Renorming at a
    # SMALLER bound would let post-encode states dip below L and desync
    # the decoder's while-x<L word pulls.
    shift = np.uint64(16 + 16 - _PREC)
    prec = np.uint64(_PREC)
    for t in range(steps - 1, -1, -1):
        idx = t * K + np.arange(K, dtype=np.int64)
        live = idx < n
        li = idx[live]
        f = f_of[li]
        c = c_of[li]
        s = states[live]
        bound = f << shift
        need = s >= bound
        while need.any():
            emit_lanes = np.flatnonzero(live)[need]
            for j, lane in zip(np.flatnonzero(need), emit_lanes):
                lane_words[lane].append(np.uint16(s[j] & _WORD))
            s[need] >>= np.uint64(16)
            need = s >= bound
        # encode step: s' = (s // f) << PREC + (s % f) + c
        s = ((s // f) << prec) + (s % f) + c
        states[live] = s

    # flush final states (32 bits each, as two words hi/lo)
    word_counts = np.array([len(w) for w in lane_words], np.uint64)
    wcbuf, _ = varint_encode_unsigned(word_counts)
    head_parts.append(wcbuf)
    body = []
    for lane in range(K):
        ws = lane_words[lane][::-1]  # decoder reads forward
        body.append(np.array(ws, np.uint16).astype("<u2").tobytes())
    states_buf = states.astype("<u8").tobytes()
    return b"".join(head_parts) + states_buf + b"".join(body)


def decode(buf: bytes, signed: bool = True) -> np.ndarray:
    b = np.frombuffer(buf, np.uint8)
    p = 0

    def rv():
        nonlocal p
        u = 0
        shift = 0
        while True:
            byte = int(b[p]); p += 1
            u |= (byte & 0x7F) << shift
            if byte < 0x80:
                return u
            shift += 7

    n = rv()
    if n == 0:
        return np.zeros(0, np.int64 if signed else np.uint64)
    n_syms = rv()
    table = np.empty(2 * n_syms, np.uint64)
    for i in range(2 * n_syms):
        table[i] = rv()
    syms = np.cumsum(table[0::2].view(np.int64)).view(np.uint64)
    freqs = table[1::2].astype(np.int64)
    K = rv()
    word_counts = np.empty(K, np.int64)
    for i in range(K):
        word_counts[i] = rv()

    cum = np.zeros(n_syms + 1, np.int64)
    np.cumsum(freqs, out=cum[1:])
    # slot -> symbol index lookup (M entries)
    slot_sym = np.repeat(np.arange(n_syms, dtype=np.int64), freqs)

    states = np.frombuffer(buf, "<u8", count=int(K), offset=p).astype(np.uint64)
    p += int(K) * 8
    lane_off = np.zeros(K + 1, np.int64)
    np.cumsum(word_counts, out=lane_off[1:])
    words = np.frombuffer(buf, "<u2", count=int(lane_off[-1]), offset=p).astype(np.uint64)
    wpos = lane_off[:-1].copy()  # next word per lane

    out_u = np.empty(n, np.uint64)
    steps = (n + K - 1) // K
    mask = np.uint64(_M - 1)
    prec = np.uint64(_PREC)
    for t in range(steps):
        idx = t * K + np.arange(K, dtype=np.int64)
        live = idx < n
        s = states[live]
        slot = (s & mask).astype(np.int64)
        si = slot_sym[slot]
        out_u[idx[live]] = syms[si]
        f = freqs[si].astype(np.uint64)
        c = cum[si].astype(np.uint64)
        s = f * (s >> prec) + (s & mask) - c
        # renormalize: pull words while state < 2^16
        lanes = np.flatnonzero(live)
        need = s < _STATE_LO
        while need.any():
            ln = lanes[need]
            have = wpos[ln] < lane_off[ln + 1]
            if not have.all():
                raise ValueError("rANS stream exhausted (corrupt)")
            s[need] = (s[need] << np.uint64(16)) | words[wpos[ln]]
            wpos[ln] += 1
            need = s < _STATE_LO
        states[live] = s
    u = out_u
    return zigzag_decode(u).view(np.int64) if signed else u
