"""ORC Integer RLE v1 — exact byte parity with the reference encoder.

Reference semantics (reference: src/writer/encoder/int_rle_v1.rs:48-97):

* greedy left-to-right grouping;
* a *run* is >=3 consecutive values with a constant wrapping delta that fits
  in i8; encoded as ``[run_len-3, delta_u8, varint(first_value)]``;
  max run = 130 values;
* a *literal group* is <=128 values encoded as ``[-(len) as u8, varints...]``;
* retroactive conversion: when the incoming value extends the delta of the
  last two buffered literals, those two are popped, the remaining literals are
  flushed, and a run of 3 begins (reference int_rle_v1.rs:68-75);
* the literal buffer force-flushes at 128 values and a run force-flushes at
  130 (reference int_rle_v1.rs:51), which means a run triple can never span a
  forced literal-flush boundary.

Signed values use zigzag varints; unsigned use plain varints. Run/delta
arithmetic is 64-bit wrapping in both cases.

``encode`` is the vectorized fast path (event-jumping over constant-delta
segments — O(#groups) Python iterations, all byte assembly via numpy slices);
``encode_slow`` is a direct port of the reference automaton used as the
equivalence oracle in tests.
"""

from __future__ import annotations

import numpy as np

from .varint import (
    varint_decode_all,
    varint_encode_signed,
    varint_encode_unsigned,
    zigzag_decode,
)

MAX_LITERAL = 128
MAX_RUN = 130


def _to_u64(values: np.ndarray, signed: bool) -> np.ndarray:
    a = np.ascontiguousarray(values)
    if signed:
        return a.astype(np.int64, copy=False).view(np.uint64)
    return a.astype(np.uint64, copy=False)


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    """Encode an int array; byte-identical to the reference automaton."""
    v = _to_u64(values, signed)
    n = len(v)
    if n == 0:
        return b""
    # Pre-encode every value's varint once; groups slice into this buffer.
    if signed:
        vbytes, nb = varint_encode_signed(v.view(np.int64))
    else:
        vbytes, nb = varint_encode_unsigned(v)
    voff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=voff[1:])
    vbuf = np.frombuffer(vbytes, dtype=np.uint8)

    if n == 1:
        return bytes([0xFF]) + vbytes

    # deltas (wrapping 64-bit), i8-fit flags, run-triple eligibility
    d = v[1:] - v[:-1]  # uint64 wrapping subtract
    d_i64 = d.view(np.int64)
    fits = (d_i64 >= -128) & (d_i64 < 128)
    # elig[i] (value index i >= 2): d[i-1] == d[i-2] and fits(d[i-1])
    elig_idx = np.flatnonzero((d[1:] == d[:-1]) & fits[1:]) + 2

    # constant-delta segment end: seg_end_of[k] = last delta index of the
    # maximal constant-delta stretch containing delta index k (O(1) lookup)
    change_flags = np.empty(n - 1, dtype=bool)
    change_flags[0] = False
    np.not_equal(d[1:], d[:-1], out=change_flags[1:])  # True = segment starts here
    seg_id = np.cumsum(change_flags, dtype=np.int32)
    seg_bounds = np.flatnonzero(np.concatenate((change_flags[1:], [True])))  # final index per segment

    # scan loop: records (kind, start, count) per group; all byte assembly is
    # vectorized afterwards (one gather/scatter for every payload)
    g_kind: list[int] = []  # 0 = literal, 1 = run
    g_start: list[int] = []
    g_count: list[int] = []
    ka = g_kind.append
    sa = g_start.append
    ca = g_count.append

    q = 0  # literal start
    n_elig = len(elig_idx)
    elig_list = elig_idx.tolist()  # python ints: fast monotonic cursor scan
    ei = 0  # monotonic cursor (amortized O(n_elig) total)

    while q < n:
        # find next eligible run-triple end i with i >= q+2 whose first two
        # values sit inside one forced-flush literal chunk of [q, ...):
        # (i-q)%128 == 1 -> the pair straddles the 128-value flush;
        # (i-q)%128 == 0 -> the buffer flushes right before processing v[i]
        # (reference int_rle_v1.rs:50-52 flush-at-top semantics)
        i = -1
        qq = q + 2
        while ei < n_elig:
            cand = elig_list[ei]
            if cand < qq:
                ei += 1
                continue
            r = (cand - q) % MAX_LITERAL
            if r == 0 or r == 1:
                ei += 1
                continue
            i = cand
            break
        if i < 0:
            while q < n:  # literal chunks of up to 128 to the end
                k = MAX_LITERAL if n - q > MAX_LITERAL else n - q
                ka(0)
                sa(q)
                ca(k)
                q += k
            break

        # literals [q, i-2) — full 128-chunks, then the remainder as one group
        start = i - 2
        while q < start:
            k = MAX_LITERAL if start - q > MAX_LITERAL else start - q
            ka(0)
            sa(q)
            ca(k)
            q += k
        # the run: starts at i-2, delta = d[i-2], extends to its segment end
        run_total = int(seg_bounds[seg_id[start]]) + 2 - start  # values in the stretch
        while run_total >= 3:
            L = MAX_RUN if run_total > MAX_RUN else run_total
            ka(1)
            sa(start)
            ca(L)
            start += L
            run_total -= L
        q = start  # 0..2 leftover values re-enter literal mode at q

    # ---- vectorized assembly ----
    # Key fact: group payloads appear in source (varint-buffer) order, so the
    # payload stream is simply vbuf minus the run tails (a run stores only its
    # base varint), and the output is that stream with headers interleaved.
    kind = np.array(g_kind, dtype=np.int8)
    gs = np.array(g_start, dtype=np.int64)
    gc = np.array(g_count, dtype=np.int64)
    is_lit = kind == 0
    pay_a = voff[gs]
    pay_b = np.where(is_lit, voff[gs + gc], voff[gs + 1])
    pay_len = pay_b - pay_a
    head_len = np.where(is_lit, 1, 2)
    sizes = head_len + pay_len
    dst = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=dst[1:])
    out = np.empty(int(dst[-1]), dtype=np.uint8)
    lit_dst = dst[:-1][is_lit]
    run_dst = dst[:-1][~is_lit]
    # payload bytes = vbuf with run tails deleted (boolean mask, O(bytes))
    rs = gs[~is_lit]
    rl = gc[~is_lit]
    if len(rs):
        marks = np.zeros(len(vbuf) + 1, dtype=np.int32)
        np.add.at(marks, voff[rs + 1], 1)
        np.add.at(marks, voff[rs + rl], -1)
        deleted = np.cumsum(marks[:-1]) > 0
        kept = vbuf[~deleted]
    else:
        kept = vbuf
    hdr_mask = np.zeros(len(out), dtype=bool)
    hdr_mask[lit_dst] = True
    hdr_mask[run_dst] = True
    hdr_mask[run_dst + 1] = True
    out[~hdr_mask] = kept
    out[lit_dst] = ((-gc[is_lit]) & 0xFF).astype(np.uint8)
    out[run_dst] = (gc[~is_lit] - 3).astype(np.uint8)
    out[run_dst + 1] = (d[rs] & np.uint64(0xFF)).astype(np.uint8)
    return out.tobytes()


def encode_slow(values, signed: bool = True) -> bytes:
    """Direct port of the reference per-value automaton (test oracle only)."""
    mask = (1 << 64) - 1

    def varint_u(z: int) -> bytes:
        out = bytearray()
        while True:
            if z < 0x80:
                out.append(z)
                return bytes(out)
            out.append(0x80 | (z & 0x7F))
            z >>= 7

    def varint_of(x_u64: int) -> bytes:
        if signed:
            x = x_u64 - (1 << 64) if x_u64 >= (1 << 63) else x_u64
            return varint_u(((x << 1) ^ (x >> 63)) & mask)
        return varint_u(x_u64)

    out = bytearray()
    buf: list[int] = []
    run_len = 0
    last_val = 0
    delta = 0

    def fits_i8(u: int) -> bool:
        x = u - (1 << 64) if u >= (1 << 63) else u
        return -128 <= x < 128

    def finish_group():
        nonlocal run_len
        if run_len > 0:
            out.append(run_len - 3)
            out.append(delta & 0xFF)
            out.extend(varint_of(buf[0]))
            buf.clear()
            run_len = 0
        elif buf:
            out.append((-len(buf)) & 0xFF)
            for x in buf:
                out.extend(varint_of(x))
            buf.clear()

    for x in values:
        x = int(x) & mask
        if len(buf) == 128 or run_len == 130:
            finish_group()
        if run_len > 0:
            if (x - last_val) & mask == delta:
                run_len += 1
            else:
                finish_group()
                buf.append(x)
        else:
            if not buf:
                buf.append(x)
                last_val = x
                continue
            d = (x - buf[-1]) & mask
            if len(buf) >= 2 and d == delta and fits_i8(d):
                buf.pop()
                y = buf.pop()
                finish_group()
                run_len = 3
                buf.append(y)
            else:
                buf.append(x)
                delta = d
        last_val = x
    finish_group()
    return bytes(out)


def decode(buf: bytes, signed: bool = True) -> np.ndarray:
    """Decode an IntRLEv1 stream. Vectorized varint decode; O(#groups) loop."""
    b = np.frombuffer(buf, dtype=np.uint8)
    nbytes = len(b)
    if nbytes == 0:
        return np.zeros(0, dtype=np.int64 if signed else np.uint64)
    term = np.flatnonzero(b < 0x80)  # varint terminator positions

    # Parse group headers; collect literal varint regions + run specs.
    lit_regions: list[tuple[int, int]] = []  # (byte_start, byte_end)
    parts: list[tuple[str, int, int]] = []  # ('lit', n, -) | ('run', len, spec_idx)
    run_specs: list[tuple[int, int]] = []  # (delta_i8, base_byte_start)
    p = 0
    while p < nbytes:
        h = int(b[p])
        if h < 0x80:  # run: h+3 values
            delta = int(b[p + 1])
            if delta >= 128:
                delta -= 256
            vstart = p + 2
            ti = int(np.searchsorted(term, vstart, side="left"))
            vend = int(term[ti]) + 1
            parts.append(("run", h + 3, len(run_specs)))
            run_specs.append((delta, vstart))
            lit_regions.append((vstart, vend))  # base value decoded with the rest
            p = vend
        else:  # literal group of 256-h varints
            k = 256 - h
            vstart = p + 1
            ti = int(np.searchsorted(term, vstart, side="left"))
            vend = int(term[ti + k - 1]) + 1
            parts.append(("lit", k, -1))
            lit_regions.append((vstart, vend))
            p = vend

    # Vectorized decode of all varints (literals + run bases) in one pass
    concat = np.concatenate([b[a:e] for a, e in lit_regions]) if lit_regions else b[:0]
    allvals = varint_decode_all(concat)

    out_parts: list[np.ndarray] = []
    vi = 0  # cursor into allvals
    for kind, cnt, spec in parts:
        if kind == "lit":
            out_parts.append(allvals[vi : vi + cnt])
            vi += cnt
        else:
            base = allvals[vi]
            vi += 1
            delta, _ = run_specs[spec]
            if signed:
                base = int(zigzag_decode(np.array([base], dtype=np.uint64))[0])
            else:
                base = int(base)
            seq = (np.uint64(base & ((1 << 64) - 1)) + np.arange(cnt, dtype=np.uint64) * np.uint64(delta & ((1 << 64) - 1)))
            out_parts.append(seq)

    res = np.concatenate(out_parts) if out_parts else np.zeros(0, dtype=np.uint64)
    if signed:
        # literals are zigzag; runs were already materialized as raw u64.
        # Re-do: decode literals via zigzag, runs are raw. Handle by building
        # a mask of which outputs came from literal groups.
        out = np.empty(len(res), dtype=np.int64)
        pos = 0
        vi = 0
        for kind, cnt, spec in parts:
            if kind == "lit":
                out[pos : pos + cnt] = zigzag_decode(res[pos : pos + cnt])
            else:
                out[pos : pos + cnt] = res[pos : pos + cnt].view(np.int64)
            pos += cnt
        return out
    return res
