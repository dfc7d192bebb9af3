"""FSST-style symbol-table string compression (vectorized, deterministic).

New-engine codec (north rule; no reference counterpart). Follows the public
FSST idea (Boncz/Neumann/Leis, VLDB'20): a table of up to 254 symbols of 1-8
bytes; each input byte range is greedily rewritten as symbol codes; code 255
escapes a literal byte. This implementation trains a deterministic greedy
table from a bounded sample (rolling-hash substring counts), matches symbols
vectorized (per-length uint64 rolling keys + searchsorted), and walks strings
in lock-step rounds so the per-round work is one numpy gather across ALL
strings (no per-byte Python loop).

Layout:
    varint(n_symbols) | sym_len bytes | sym blob
    varint(n_strings)
    varint(len(enc_lengths_stream)) | rle_v2-unsigned per-string code lengths
    code stream
"""

from __future__ import annotations

import numpy as np

from . import rle_v2
from .varint import varint_encode_unsigned

ESCAPE = 255
MAX_SYMBOLS = 254
MAX_SYM_LEN = 8
SAMPLE_BYTES = 1 << 16


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


def _rolling_keys(b: np.ndarray, L: int) -> np.ndarray:
    """uint64 key of b[p:p+L] for every window start p (len n-L+1)."""
    n = len(b)
    if n < L:
        return np.zeros(0, dtype=np.uint64)
    k = np.zeros(n - L + 1, dtype=np.uint64)
    for i in range(L):
        k |= b[i : n - L + 1 + i].astype(np.uint64) << np.uint64(8 * (L - 1 - i))
    return k


def train(concat: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Build a deterministic symbol table from a bounded sample.

    All single bytes present in the sample become symbols (escape-free for
    in-distribution data); remaining slots go to the substrings of length 2..8
    with the highest saving = (len-1) * occurrence count.
    """
    sample = concat[: min(len(concat), SAMPLE_BYTES)]
    singles = [bytes([v]) for v in np.unique(sample)]
    budget = MAX_SYMBOLS - len(singles)
    cands: list[tuple[int, bytes]] = []
    for L in range(2, MAX_SYM_LEN + 1):
        keys = _rolling_keys(sample, L)
        if len(keys) == 0:
            break
        uniq, counts = np.unique(keys, return_counts=True)
        gain = counts.astype(np.int64) * (L - 1)
        take = np.argsort(gain)[::-1][: budget * 2]
        for j in take:
            if counts[j] < 2:
                break
            cands.append((int(gain[j]), int(uniq[j]).to_bytes(L, "big")))
    cands.sort(key=lambda t: (-t[0], t[1]))
    table = singles + [s for _, s in cands[:budget]]
    return table[:MAX_SYMBOLS]


class SymbolTable:
    def __init__(self, symbols: list[bytes]):
        self.symbols = symbols
        self.sym_lens = np.array([len(s) for s in symbols], dtype=np.int64)
        self.blob = b"".join(symbols)
        offs = np.zeros(len(symbols) + 1, dtype=np.int64)
        np.cumsum(self.sym_lens, out=offs[1:])
        self.sym_offs = offs
        # per-length sorted key arrays for vectorized matching
        self.by_len: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for L in range(1, MAX_SYM_LEN + 1):
            ids = [i for i, s in enumerate(symbols) if len(s) == L]
            if not ids:
                continue
            keys = np.array([int.from_bytes(symbols[i], "big") for i in ids], dtype=np.uint64)
            order = np.argsort(keys)
            self.by_len[L] = (keys[order], np.array(ids, dtype=np.int64)[order])

    def serialize(self) -> bytes:
        head, _ = varint_encode_unsigned(np.array([len(self.symbols)], dtype=np.uint64))
        return head + self.sym_lens.astype(np.uint8).tobytes() + self.blob

    @staticmethod
    def deserialize(b: np.ndarray, p: int) -> tuple["SymbolTable", int]:
        n, p = _read_varint(b, p)
        lens = b[p : p + n].astype(np.int64)
        p += n
        symbols = []
        for L in lens:
            symbols.append(b[p : p + int(L)].tobytes())
            p += int(L)
        return SymbolTable(symbols), p


def _match_tables(st: SymbolTable, concat: np.ndarray, ends_at: np.ndarray):
    """best (match_len, sym_id) at every byte position, vectorized per length.

    One pass builds the 8-byte rolling key; shorter window keys are derived
    by right-shifting (top L bytes of key8), avoiding per-length passes.
    """
    n = len(concat)
    mlen = np.zeros(n, dtype=np.int64)
    mid = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return mlen, mid
    cu = concat.astype(np.uint64)
    # key8[p] = bytes p..p+7 big-endian packed (positions 0..n-8)
    n8 = max(n - MAX_SYM_LEN + 1, 0)
    key8 = np.zeros(n8, dtype=np.uint64)
    for i in range(MAX_SYM_LEN):
        key8 |= cu[i : n8 + i] << np.uint64(8 * (MAX_SYM_LEN - 1 - i))
    pos_all = np.arange(n, dtype=np.int64)
    for L in sorted(st.by_len):  # ascending; longer lengths overwrite
        keys_sorted, ids_sorted = st.by_len[L]
        n_w = n - L + 1
        if n_w <= 0:
            continue
        wk = np.empty(n_w, dtype=np.uint64)
        wk[:n8] = key8 >> np.uint64(8 * (MAX_SYM_LEN - L))
        # tail windows (fewer than 8 bytes ahead): direct packing
        for p in range(max(n8, 0), n_w):
            wk[p] = int.from_bytes(concat[p : p + L].tobytes(), "big")
        pos = np.searchsorted(keys_sorted, wk)
        pos[pos >= len(keys_sorted)] = len(keys_sorted) - 1
        hit = keys_sorted[pos] == wk
        # window must not cross its string's end
        hit &= (pos_all[:n_w] + L) <= ends_at[:n_w]
        idx = np.flatnonzero(hit)
        mlen[idx] = L
        mid[idx] = ids_sorted[pos[idx]]
    return mlen, mid


def encode(strings_concat: np.ndarray, offsets: np.ndarray, table: list[bytes] | None = None) -> bytes:
    """Encode strings given as a concatenated uint8 buffer + int64 offsets."""
    concat = np.asarray(strings_concat, dtype=np.uint8)
    offsets = np.asarray(offsets, dtype=np.int64)
    n_strings = len(offsets) - 1
    if table is None:
        table = train(concat, offsets)
    st = SymbolTable(table)

    n = len(concat)
    lens_per_string = np.diff(offsets)
    ends_at = np.repeat(offsets[1:], lens_per_string) if n else np.zeros(0, dtype=np.int64)
    mlen, mid = _match_tables(st, concat, ends_at)

    # lock-step rounds: advance every live string by one symbol per round
    pos = offsets[:-1].copy()
    ends = offsets[1:]
    out_codes: list[np.ndarray] = []
    out_owner: list[np.ndarray] = []
    live = np.flatnonzero(pos < ends)
    while len(live):
        p = pos[live]
        ml = mlen[p]
        matched = ml > 0
        codes = np.where(matched, mid[p], ESCAPE).astype(np.uint8)
        out_codes.append(codes)
        out_owner.append(live)
        # escapes also emit the literal byte
        esc = np.flatnonzero(~matched)
        if len(esc):
            out_codes.append(concat[p[esc]])
            out_owner.append(live[esc])
        pos[live] = p + np.where(matched, ml, 1)
        live = live[pos[live] < ends[live]]

    if out_codes:
        codes_all = np.concatenate(out_codes)
        owner_all = np.concatenate(out_owner)
        # stable order: by (owner string, emission round order). Rounds were
        # appended in order, and within a round owners are sorted, so a stable
        # sort by owner reconstructs per-string code sequences.
        order = np.argsort(owner_all, kind="stable")
        codes_all = codes_all[order]
        enc_lens = np.bincount(owner_all, minlength=n_strings).astype(np.uint64)
    else:
        codes_all = np.zeros(0, dtype=np.uint8)
        enc_lens = np.zeros(n_strings, dtype=np.uint64)

    head, _ = varint_encode_unsigned(np.array([n_strings], dtype=np.uint64))
    lens_stream = rle_v2.encode(enc_lens, signed=False)
    lhead, _ = varint_encode_unsigned(np.array([len(lens_stream)], dtype=np.uint64))
    return b"".join([st.serialize(), head, lhead, lens_stream, codes_all.tobytes()])


def decode(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode to (concatenated uint8 buffer, int64 offsets)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    st, p = SymbolTable.deserialize(b, 0)
    n_strings, p = _read_varint(b, p)
    ln, p = _read_varint(b, p)
    enc_lens = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_strings].astype(np.int64)
    p += ln
    codes = b[p:]

    # resolve escape pairs (rare by construction: all sampled single bytes are
    # symbols). A 255 is an escape only if not itself an escaped literal.
    cand = np.flatnonzero(codes == ESCAPE)
    esc_pos = []
    skip = -1
    for c in cand:
        if c == skip:
            continue
        esc_pos.append(c)
        skip = c + 1
    esc_pos = np.array(esc_pos, dtype=np.int64)
    is_lit = np.zeros(len(codes), dtype=bool)
    if len(esc_pos):
        is_lit[esc_pos + 1] = True
    is_esc = np.zeros(len(codes), dtype=bool)
    if len(esc_pos):
        is_esc[esc_pos] = True
    is_code = ~is_lit & ~is_esc

    # per code-stream byte: how many output bytes it contributes + source slice
    contrib = np.zeros(len(codes), dtype=np.int64)
    contrib[is_code] = st.sym_lens[codes[is_code]]
    contrib[is_lit] = 1
    src_start = np.zeros(len(codes), dtype=np.int64)
    src_start[is_code] = st.sym_offs[codes[is_code]]
    blob = np.frombuffer(st.blob, dtype=np.uint8)
    # literals source from an appended pseudo-blob
    lit_vals = codes[is_lit]
    src_start[is_lit] = len(blob) + np.arange(len(lit_vals))
    full_blob = np.concatenate([blob, lit_vals])

    total = int(contrib.sum())
    reps = np.repeat(src_start, contrib)
    local = np.arange(total, dtype=np.int64)
    cum = np.zeros(len(codes) + 1, dtype=np.int64)
    np.cumsum(contrib, out=cum[1:])
    local -= np.repeat(cum[:-1], contrib)
    out = full_blob[reps + local]

    # per-string output offsets: code-stream boundaries -> output boundaries
    code_bounds = np.zeros(n_strings + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=code_bounds[1:])
    out_offs = cum[code_bounds]
    return out, out_offs
