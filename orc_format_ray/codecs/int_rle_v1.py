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


_I32_KINDS = (np.int8, np.int16, np.int32, np.uint8, np.uint16)


def encode(values: np.ndarray, signed: bool = True) -> bytes:
    """Encode an int array; byte-identical to the reference automaton.

    Narrow inputs (int8/16/32) take a 32-bit-wide fast path with identical
    output: varints of int32 values are the same bytes at either width, and
    delta equality is tracked as (32-bit wrapped delta, wrap direction) pairs
    which uniquely determine the 64-bit delta.
    """
    a = np.ascontiguousarray(values)
    n = len(a)
    if n == 0:
        return b""

    if signed and a.dtype in _I32_KINDS:
        x = a.astype(np.int32, copy=False)
        from .varint import varint_encode_unsigned32, zigzag_encode32

        vbytes, nb = varint_encode_unsigned32(zigzag_encode32(x))
        if n == 1:
            return bytes([0xFF]) + vbytes
        xa, xb = x[1:], x[:-1]
        d32 = xa - xb  # wrapping int32
        ovf = ((xa ^ xb) & (xa ^ d32)) < 0  # true 64-bit delta wrapped past int32
        wrap = np.where(ovf, np.where(d32 < 0, np.int8(1), np.int8(-1)), np.int8(0))
        fits = (d32 >= -128) & (d32 < 128) & ~ovf
        eq = (d32[1:] == d32[:-1]) & (wrap[1:] == wrap[:-1])
        d_low = d32.view(np.uint32)  # for the run delta byte (& 0xFF safe)
    else:
        v = _to_u64(a, signed)
        if signed:
            vbytes, nb = varint_encode_signed(v.view(np.int64))
        else:
            vbytes, nb = varint_encode_unsigned(v)
        if n == 1:
            return bytes([0xFF]) + vbytes
        d = v[1:] - v[:-1]  # uint64 wrapping subtract
        d_i64 = d.view(np.int64)
        fits = (d_i64 >= -128) & (d_i64 < 128)
        eq = d[1:] == d[:-1]
        d_low = d

    voff = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(nb, out=voff[1:])
    vbuf = np.frombuffer(vbytes, dtype=np.uint8)

    # elig[i] (value index i >= 2): d[i-1] == d[i-2] and fits(d[i-1])
    elig_idx = np.flatnonzero(eq & fits[1:]) + 2

    # constant-delta segment end: seg_end_of[k] = last delta index of the
    # maximal constant-delta stretch containing delta index k (O(1) lookup)
    change_flags = np.empty(n - 1, dtype=bool)
    change_flags[0] = False
    np.logical_not(eq, out=change_flags[1:])  # True = segment starts here
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
    out[run_dst + 1] = d_low[rs].astype(np.uint8)  # unsigned astype = low byte
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
    """Decode an IntRLEv1 stream. O(#groups) header scan, vectorized assembly."""
    b = np.frombuffer(buf, dtype=np.uint8)
    nbytes = len(b)
    if nbytes == 0:
        return np.zeros(0, dtype=np.int64 if signed else np.uint64)
    data = bytes(buf) if not isinstance(buf, bytes) else buf  # O(1) int indexing
    term_mask = b < 0x80
    term_pos = np.flatnonzero(term_mask)
    # prefix terminator counts: tcount[i] = #terminators at positions <= i.
    # Gives O(1) varint-region resolution per group header (the first
    # terminator >= vstart is term_pos[tcount[vstart-1]]), so the header scan
    # does constant Python work per group with no inner cursor loop.
    tcount = np.cumsum(term_mask, dtype=np.int64)

    # header scan: group kinds/counts/deltas + varint byte regions (in order)
    g_lit: list[bool] = []
    g_cnt: list[int] = []
    g_delta: list[int] = []
    reg_a: list[int] = []
    reg_b: list[int] = []
    p = 0
    while p < nbytes:
        h = data[p]
        if h < 0x80:  # run of h+3 values; payload = delta byte + base varint
            delta = data[p + 1]
            vstart = p + 2
            vend = int(term_pos[tcount[vstart - 1]]) + 1
            g_lit.append(False)
            g_cnt.append(h + 3)
            g_delta.append(delta - 256 if delta >= 128 else delta)
            reg_a.append(vstart)
            reg_b.append(vend)
            p = vend
        else:  # literal group of 256-h varints
            k = 256 - h
            vstart = p + 1
            vend = int(term_pos[tcount[vstart - 1] + k - 1]) + 1
            g_lit.append(True)
            g_cnt.append(k)
            g_delta.append(0)
            reg_a.append(vstart)
            reg_b.append(vend)
            p = vend

    # one vectorized varint decode over all regions (ordered ranges -> mask)
    ra = np.array(reg_a, dtype=np.int64)
    rb = np.array(reg_b, dtype=np.int64)
    marks = np.zeros(nbytes + 1, dtype=np.int32)
    marks[ra] += 1  # regions are disjoint and non-adjacent (headers between)
    marks[rb] -= 1
    inside = np.cumsum(marks[:-1], dtype=np.int32) > 0
    allvals = varint_decode_all(b[inside])
    vals = zigzag_decode(allvals).view(np.uint64) if signed else allvals

    is_lit = np.array(g_lit)
    cnt = np.array(g_cnt, dtype=np.int64)
    nvals_per_group = np.where(is_lit, cnt, 1)
    # split decoded varints into literal values and run bases
    val_is_lit = np.repeat(is_lit, nvals_per_group)
    lit_vals = vals[val_is_lit]
    base_vals = vals[~val_is_lit]

    total = int(cnt.sum())
    out = np.empty(total, dtype=np.uint64)
    out_is_lit = np.repeat(is_lit, cnt)
    out[out_is_lit] = lit_vals
    run_cnt = cnt[~is_lit]
    if len(run_cnt):
        deltas = np.array(g_delta, dtype=np.int64)[~is_lit].view(np.uint64)
        total_run = int(run_cnt.sum())
        excl = np.zeros(len(run_cnt), dtype=np.int64)
        np.cumsum(run_cnt[:-1], out=excl[1:])
        rep = np.repeat(np.arange(len(run_cnt)), run_cnt)
        ramp = (np.arange(total_run, dtype=np.int64) - excl[rep]).view(np.uint64)
        out[~out_is_lit] = np.repeat(base_vals, run_cnt) + ramp * deltas[rep]
    return out.view(np.int64) if signed else out


def decode_runs(buf: bytes, signed: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """Run-level decode: ``(values, counts)`` with ``sum(counts) == n`` and
    the stream's value multiset preserved — WITHOUT expanding constant runs
    (aggregate pushdown INTO the codec: a histogram over a Zipf-heavy token
    stream touches one entry per run, not one per token).

    Groups map as: constant runs (delta 0) -> one ``(base, cnt)`` pair;
    delta runs -> expanded (their values are all distinct anyway); literal
    groups -> their values with count 1 each. Pairs are NOT merged across
    groups — fold with ``np.unique``/groupby downstream. The expansion
    ``np.repeat(values, counts)`` equals ``decode(buf)`` up to ordering of
    equal values (pinned by tests/test_codecs_roundtrip.py)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    nbytes = len(b)
    empty_t = np.int64 if signed else np.uint64
    if nbytes == 0:
        return np.zeros(0, empty_t), np.zeros(0, np.int64)
    data = bytes(buf) if not isinstance(buf, bytes) else buf
    term_mask = b < 0x80
    term_pos = np.flatnonzero(term_mask)
    tcount = np.cumsum(term_mask, dtype=np.int64)

    g_lit: list[bool] = []
    g_cnt: list[int] = []
    g_delta: list[int] = []
    reg_a: list[int] = []
    reg_b: list[int] = []
    p = 0
    while p < nbytes:
        h = data[p]
        if h < 0x80:
            delta = data[p + 1]
            vstart = p + 2
            vend = int(term_pos[tcount[vstart - 1]]) + 1
            g_lit.append(False)
            g_cnt.append(h + 3)
            g_delta.append(delta - 256 if delta >= 128 else delta)
            reg_a.append(vstart)
            reg_b.append(vend)
            p = vend
        else:
            k = 256 - h
            vstart = p + 1
            vend = int(term_pos[tcount[vstart - 1] + k - 1]) + 1
            g_lit.append(True)
            g_cnt.append(k)
            g_delta.append(0)
            reg_a.append(vstart)
            reg_b.append(vend)
            p = vend

    ra = np.array(reg_a, dtype=np.int64)
    rb = np.array(reg_b, dtype=np.int64)
    marks = np.zeros(nbytes + 1, dtype=np.int32)
    marks[ra] += 1
    marks[rb] -= 1
    inside = np.cumsum(marks[:-1], dtype=np.int32) > 0
    allvals = varint_decode_all(b[inside])
    vals = zigzag_decode(allvals).view(np.uint64) if signed else allvals

    is_lit = np.array(g_lit)
    cnt = np.array(g_cnt, dtype=np.int64)
    deltas = np.array(g_delta, dtype=np.int64)
    nvals_per_group = np.where(is_lit, cnt, 1)
    val_is_lit = np.repeat(is_lit, nvals_per_group)
    lit_vals = vals[val_is_lit]
    base_vals = vals[~val_is_lit]
    run_cnt = cnt[~is_lit]
    run_delta = deltas[~is_lit]

    out_v: list[np.ndarray] = []
    out_c: list[np.ndarray] = []
    if len(lit_vals):
        out_v.append(lit_vals)
        out_c.append(np.ones(len(lit_vals), np.int64))
    const = run_delta == 0
    if const.any():
        out_v.append(base_vals[const])
        out_c.append(run_cnt[const])
    if (~const).any():  # delta runs: values distinct — expand, count 1 each
        rc = run_cnt[~const]
        rb_ = base_vals[~const]
        rd = run_delta[~const].view(np.uint64)
        total = int(rc.sum())
        excl = np.zeros(len(rc), dtype=np.int64)
        np.cumsum(rc[:-1], out=excl[1:])
        rep = np.repeat(np.arange(len(rc)), rc)
        ramp = (np.arange(total, dtype=np.int64) - excl[rep]).view(np.uint64)
        out_v.append(np.repeat(rb_, rc) + ramp * rd[rep])
        out_c.append(np.ones(total, np.int64))
    if not out_v:
        return np.zeros(0, empty_t), np.zeros(0, np.int64)
    v = np.concatenate(out_v)
    return (v.view(np.int64) if signed else v), np.concatenate(out_c)
