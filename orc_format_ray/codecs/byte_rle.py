"""ORC ByteRLE — exact byte parity with the reference encoder.

Reference semantics (reference: src/writer/encoder/byte_rle.rs:46-88):
runs of >=3 identical bytes encode as ``[run_len-3, byte]`` (max run 130);
literal groups of <=128 bytes encode as ``[-(len) as u8, bytes...]``;
retroactive conversion of the last two buffered literals + current byte into a
run of 3; literal buffer force-flushes at 128.

Used for union tags and (via BooleanRLE) PRESENT/validity streams.
"""

from __future__ import annotations

import numpy as np

MAX_LITERAL = 128
MAX_RUN = 130


def encode(values: np.ndarray | bytes) -> bytes:
    """Vectorized greedy grouping identical to the reference automaton."""
    v = np.frombuffer(values, dtype=np.uint8) if isinstance(values, (bytes, bytearray)) else np.asarray(values, dtype=np.uint8)
    n = len(v)
    if n == 0:
        return b""
    if n == 1:
        return bytes([0xFF, int(v[0])])

    eq = v[1:] == v[:-1]
    # elig[i] (i>=2): v[i]==v[i-1]==v[i-2]
    elig_idx = np.flatnonzero(eq[1:] & eq[:-1]) + 2
    n_elig = len(elig_idx)
    # a run starting at value s extends while eq[k] stays True; segment ends
    # are the change points of the eq flag array (delta-index space)
    change = np.flatnonzero(eq[1:] != eq[:-1])
    seg_ends = np.concatenate((change, [n - 2]))

    pieces: list = []
    ap = pieces.append
    q = 0
    while q < n:
        i = -1
        ei = int(np.searchsorted(elig_idx, q + 2, side="left"))
        while ei < n_elig:
            cand = int(elig_idx[ei])
            r = (cand - q) % MAX_LITERAL
            if r == 0 or r == 1:
                # the candidate's first two bytes straddle a forced 128-flush
                ei += 1
                continue
            i = cand
            break
        if i < 0:
            _emit_literals(ap, v, q, n)
            break
        if i - 2 > q:
            _emit_literals(ap, v, q, i - 2)
        start = i - 2
        si = int(np.searchsorted(seg_ends, start, side="left"))
        run_total = int(seg_ends[si]) + 2 - start
        byte = int(v[start])
        while run_total >= 3:
            L = min(run_total, MAX_RUN)
            ap(bytes([L - 3, byte]))
            start += L
            run_total -= L
        q = start

    return b"".join(pieces)


def _emit_literals(ap, v: np.ndarray, a: int, b: int) -> None:
    p = a
    while p < b:
        k = min(MAX_LITERAL, b - p)
        ap(bytes([(-k) & 0xFF]))
        ap(v[p : p + k].tobytes())
        p += k


def encode_slow(values) -> bytes:
    """Direct port of the reference per-byte automaton (test oracle only)."""
    out = bytearray()
    buf = bytearray()
    run_len = 0

    def finish_group():
        nonlocal run_len
        if run_len > 0:
            out.append(run_len - 3)
            out.append(buf[0])
            buf.clear()
            run_len = 0
        elif buf:
            out.append((-len(buf)) & 0xFF)
            out.extend(buf)
            buf.clear()

    for x in values:
        x = int(x) & 0xFF
        if len(buf) == 128 or run_len == 130:
            finish_group()
        if run_len > 0:
            if x == buf[0]:
                run_len += 1
            else:
                finish_group()
                buf.append(x)
        else:
            if len(buf) >= 2 and x == buf[-1] and x == buf[-2]:
                del buf[-2:]
                finish_group()
                run_len = 3
                buf.append(x)
            else:
                buf.append(x)
    finish_group()
    return bytes(out)


def decode(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    n = len(b)
    parts: list[np.ndarray] = []
    p = 0
    while p < n:
        h = int(b[p])
        if h < 0x80:  # run of h+3 copies of the next byte
            parts.append(np.full(h + 3, b[p + 1], dtype=np.uint8))
            p += 2
        else:  # literal group of 256-h raw bytes
            k = 256 - h
            parts.append(b[p + 1 : p + 1 + k])
            p += 1 + k
    return np.concatenate(parts) if parts else np.zeros(0, dtype=np.uint8)
