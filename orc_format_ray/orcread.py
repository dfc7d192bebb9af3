"""Native Apache ORC reader — no pyarrow.orc involved.

Parses the protobuf tail (PostScript/Footer/StripeFooter per the public
schema the reference vendors, reference protos/orc_proto.proto:108-277) with
a hand-rolled proto2 wire parser and decodes the streams with this repo's
gold-pinned codec kernels. Two jobs:

1. read back this engine's own ORC output without an external library;
2. CONFORMANCE: read files written by the Apache ORC C++ writer (pyarrow),
   which uses DIRECT_V2 (RLEv2) and DICTIONARY_V2 encodings — decoding those
   with our RLEv2/dictionary kernels is the strongest available evidence the
   kernels implement the public spec, not just our own dialect.

Supported: CompressionKind none/zlib/snappy/zstd/lz4/lzo (lz4 and lzo via
pure-Python block/stream decoders — neither format stores a decompressed
size and neither library exists in this environment; the lzo decoder is
pinned by hand-computed spec vectors per instruction class); encodings DIRECT,
DIRECT_V2, DICTIONARY_V2; types boolean/byte/short/int/long/float/double/
string/char/varchar/binary/date/timestamp/decimal/list/map/struct/union
(dense, null-free at the union level — Arrow has no top-level union
validity). ``row_groups=[...]`` decodes selected rowIndexStride groups via
the ROW_INDEX positions without touching the rest of the stripe.
"""

from __future__ import annotations

import zlib as _zlib

import numpy as np
import pyarrow as pa

from .codecs import boolean_rle, byte_rle, int_rle_v1, rle_v2
from .codecs.varint import varint_decode_bigint
from .stripe import TS_EPOCH_SECONDS, _assemble_list, _assemble_map, _assemble_varlen, _decimal_from_int64, _scatter_primitive

# ---------------------------------------------------------------- proto2 read


def _uv(buf: bytes, p: int) -> tuple[int, int]:
    z = 0
    shift = 0
    while True:
        b = buf[p]
        p += 1
        z |= (b & 0x7F) << shift
        if b < 0x80:
            return z, p
        shift += 7


def _fields(buf: bytes) -> dict[int, list]:
    """field number -> list of raw values (int for varint, bytes for len-delim)."""
    out: dict[int, list] = {}
    p = 0
    n = len(buf)
    while p < n:
        tag, p = _uv(buf, p)
        f, wire = tag >> 3, tag & 7
        if wire == 0:
            v, p = _uv(buf, p)
        elif wire == 1:
            v = buf[p : p + 8]
            p += 8
        elif wire == 2:
            ln, p = _uv(buf, p)
            v = buf[p : p + ln]
            p += ln
        elif wire == 5:
            v = buf[p : p + 4]
            p += 4
        else:  # pragma: no cover
            raise ValueError(f"wire type {wire}")
        out.setdefault(f, []).append(v)
    return out


def _packed_uvs(vals: list) -> list[int]:
    """repeated uint32 [packed=true] — may arrive packed or as single varints."""
    out: list[int] = []
    for v in vals:
        if isinstance(v, int):
            out.append(v)
        else:
            p = 0
            while p < len(v):
                z, p = _uv(v, p)
                out.append(z)
    return out


_KIND_NAMES = [
    "BOOLEAN", "BYTE", "SHORT", "INT", "LONG", "FLOAT", "DOUBLE", "STRING",
    "BINARY", "TIMESTAMP", "LIST", "MAP", "STRUCT", "UNION", "DECIMAL",
    "DATE", "VARCHAR", "CHAR", "TIMESTAMP_INSTANT",
]
_COMP_NAMES = {0: "none", 1: "zlib", 2: "snappy", 3: "lzo", 4: "lz4", 5: "zstd"}


def _lz4_block_decompress(block: bytes) -> bytes:
    """Pure-Python LZ4 *block* format decoder (public spec: token nibbles,
    15-extension length bytes, 2-byte little-endian match offsets, matches
    >= 4). Needed because ORC lz4 chunks carry no decompressed size and
    pyarrow's lz4_raw zero-pads when given an oversized output bound.
    Overlapping matches replicate via pattern tiling, so short-period runs
    stay O(length) instead of byte-at-a-time."""
    out = bytearray()
    p = 0
    n = len(block)
    while p < n:
        token = block[p]
        p += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = block[p]
                p += 1
                lit += b
                if b != 255:
                    break
        out += block[p : p + lit]
        p += lit
        if p >= n:
            break  # final sequence is literals-only
        off = block[p] | (block[p + 1] << 8)
        p += 2
        if off == 0:
            raise ValueError("corrupt lz4 block: zero match offset")
        ml = token & 15
        if ml == 15:
            while True:
                b = block[p]
                p += 1
                ml += b
                if b != 255:
                    break
        ml += 4
        start = len(out) - off
        if off >= ml:
            out += out[start : start + ml]
        else:  # overlapping match: tile the period
            pattern = out[start:]
            out += (pattern * (ml // off + 1))[:ml]
    return bytes(out)


def _lzo1x_decompress(block: bytes) -> bytes:
    """Pure-Python LZO1X stream decoder (public format: LZO's documented
    bitstream, also specified in the Linux kernel's lzo.rst). Instruction
    classes: first-byte literal runs (18..255), state-dependent opcodes
    0..15 (long literal run / 2-byte near match / 3-byte far match),
    M2 2kB matches (64..255), M3 16kB matches (32..63), M4 48kB matches
    (16..31) with the distance-16384 end-of-stream marker. The S bits
    (low 2 of the last distance byte / opcode) carry 0..3 trailing
    literals into the next instruction's interpretation."""
    out = bytearray()
    p = 0
    n = len(block)
    state = 0

    def run_ext(t: int, bits: int) -> tuple[int, int]:
        # length extension: L==0 -> (2^bits - 1) + 255 per zero byte + nonzero
        nonlocal p
        if t:
            return t, p
        ext = (1 << bits) - 1
        while block[p] == 0:
            ext += 255
            p += 1
        ext += block[p]
        p += 1
        return ext, p

    def copy_match(dist: int, length: int) -> None:
        start = len(out) - dist
        if start < 0:
            raise ValueError("corrupt lzo stream: match before start")
        if dist >= length:
            out.extend(out[start : start + length])
        else:  # overlapping match: tile the period
            pattern = out[start:]
            out.extend((pattern * (length // dist + 1))[:length])

    def copy_lit(lit: int) -> None:
        # slices silently truncate — a short read means a corrupt stream
        nonlocal p
        if p + lit > n:
            raise ValueError("corrupt lzo stream: truncated literal run")
        out.extend(block[p : p + lit])
        p += lit

    if p >= n:
        return bytes(out)
    fb = block[p]
    if fb >= 18:
        p += 1
        lit = fb - 17
        copy_lit(lit)
        state = 4 if lit >= 4 else lit
    elif fb == 17:
        raise ValueError("lzo bitstream-version byte unsupported")

    while p < n:
        t = block[p]
        p += 1
        if t >= 64:  # M2: 3..8 bytes within 2kB
            length = (t >> 5) + 1
            dist = ((t >> 2) & 7) + (block[p] << 3) + 1
            p += 1
            s = t & 3
        elif t >= 32:  # M3: within 16kB
            length, _ = run_ext(t & 31, 5)
            length += 2
            le16 = block[p] | (block[p + 1] << 8)
            s = le16 & 3
            dist = (le16 >> 2) + 1
            p += 2
        elif t >= 16:  # M4: 16..48kB
            length, _ = run_ext(t & 7, 3)
            length += 2
            le16 = block[p] | (block[p + 1] << 8)
            s = le16 & 3
            dist = ((t & 8) << 11) + (le16 >> 2)
            p += 2
            if dist == 0:
                break  # end-of-stream marker (distance 16384 exactly)
            dist += 16384
        else:  # 0..15: depends on literals copied by the LAST instruction
            if state == 0:  # long literal run: 3 + L (extended)
                lit, _ = run_ext(t, 4)
                copy_lit(lit + 3)
                state = 4
                continue
            if state == 4:  # 3-byte match at 2049..3072
                dist = (t >> 2) + (block[p] << 2) + 2049
                length = 3
            else:  # state 1..3: 2-byte match at 1..1024
                dist = (t >> 2) + (block[p] << 2) + 1
                length = 2
            p += 1
            s = t & 3
            copy_match(dist, length)
            copy_lit(s)
            state = s
            continue
        copy_match(dist, length)
        copy_lit(s)
        state = s
    return bytes(out)


def _decompress_block(kind: str, block: bytes) -> bytes:
    if kind == "zlib":
        return _zlib.decompressobj(-15).decompress(block)
    if kind == "zstd":
        import pyarrow as pa_

        # streaming decompress: pyarrow-written frames omit the content size
        return pa_.input_stream(pa_.BufferReader(block), compression="zstd").read()
    if kind == "snappy":
        import pyarrow as pa_

        # raw snappy embeds the uncompressed length as a leading varint
        usize, _ = _uv(block, 0)
        return pa_.Codec("snappy").decompress(block, decompressed_size=usize).to_pybytes()
    if kind == "lz4":
        return _lz4_block_decompress(block)
    if kind == "lzo":
        return _lzo1x_decompress(block)
    raise NotImplementedError(f"compression {kind}")


def _deframe(data: bytes, kind: str) -> bytes:
    """Inverse of the ORC 3-byte block framing (spec; no size-hint varint)."""
    if kind == "none":
        return data
    out = []
    p = 0
    n = len(data)
    while p < n:
        header = int.from_bytes(data[p : p + 3], "little")
        p += 3
        ln = header >> 1
        if header & 1:
            out.append(data[p : p + ln])
        else:
            out.append(_decompress_block(kind, data[p : p + ln]))
        p += ln
    return b"".join(out)


# ------------------------------------------------------------------ metadata


class _Source:
    """Ranged-read abstraction over bytes or a file path.

    File paths use os.pread — a reader task touching one row group of a
    multi-GB ORC file reads only the tail + that group's stream slices,
    never the whole file (the 100-TB read-amplification difference)."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            self._b: bytes | None = bytes(path_or_bytes)
            self._fd = -1
            self.size = len(self._b)
        else:
            import os

            self._b = None
            self._fd = os.open(path_or_bytes, os.O_RDONLY)
            self.size = os.fstat(self._fd).st_size

    def read(self, off: int, ln: int) -> bytes:
        if ln <= 0:
            return b""
        if self._b is not None:
            return self._b[off : off + ln]
        import os

        return os.pread(self._fd, ln, off)

    def close(self) -> None:
        if self._fd >= 0:
            import os

            os.close(self._fd)
            self._fd = -1

    def __enter__(self) -> "_Source":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class _Type:
    def __init__(self, kind: str, subtypes: list[int], field_names: list[str], precision: int, scale: int):
        self.kind = kind
        self.subtypes = subtypes
        self.field_names = field_names
        self.precision = precision
        self.scale = scale


def _parse_tail(src: _Source):
    # one ranged read of the last 64 KiB covers PostScript+Footer for
    # ordinary schemas; re-read exactly if the footer is larger
    if src.size < 4:
        raise ValueError(f"not an ORC file: {src.size} bytes is too short for header+postscript")
    tail_len = min(src.size, 64 * 1024)
    tail = src.read(src.size - tail_len, tail_len)
    ps_len = tail[-1]
    if ps_len == 0 or ps_len >= tail_len:
        raise ValueError(f"not an ORC file: implausible postscript length {ps_len}")
    ps = _fields(tail[-1 - ps_len : -1])
    # postscript magic (field 8000, ORC >= 0.12); files predating it are
    # accepted via the 3-byte header magic instead — never silently decode
    # a non-ORC file whose tail happens to parse
    magic = ps.get(8000, [None])[0]
    if magic is not None:
        if magic != b"ORC":
            raise ValueError(f"not an ORC file: postscript magic {magic!r}")
    elif src.read(0, 3) != b"ORC":
        raise ValueError("not an ORC file: header magic missing")
    footer_len = ps[1][0]
    comp = _COMP_NAMES[ps.get(2, [0])[0]]
    meta_len = ps.get(5, [0])[0]
    if 1 + ps_len + footer_len <= tail_len:
        footer_raw = tail[tail_len - 1 - ps_len - footer_len : tail_len - 1 - ps_len]
    else:
        footer_raw = src.read(src.size - 1 - ps_len - footer_len, footer_len)
    footer_buf = _deframe(footer_raw, comp)
    f = _fields(footer_buf)
    stripes = []
    for s in f.get(3, []):
        sf = _fields(s)
        stripes.append(
            {
                "offset": sf[1][0],
                "index_length": sf.get(2, [0])[0],
                "data_length": sf[3][0],
                "footer_length": sf[4][0],
                "num_rows": sf[5][0],
            }
        )
    types = []
    for t in f.get(4, []):
        tf = _fields(t)
        types.append(
            _Type(
                _KIND_NAMES[tf.get(1, [0])[0]],
                _packed_uvs(tf.get(2, [])),
                [v.decode() for v in tf.get(3, [])],
                tf.get(5, [0])[0],
                tf.get(6, [0])[0],
            )
        )
    user_meta = {}
    for item in f.get(5, []):  # repeated UserMetadataItem {name=1, value=2}
        mf = _fields(item)
        if 1 in mf:
            user_meta[mf[1][0].decode()] = mf.get(2, [b""])[0]
    return {
        "compression": comp,
        "stripes": stripes,
        "types": types,
        "num_rows": f.get(6, [0])[0],
        "meta_len": meta_len,
        "row_index_stride": f.get(8, [0])[0],
        "user_metadata": user_meta,
    }


def read_orc_user_metadata(path_or_bytes) -> dict[str, bytes]:
    """Footer UserMetadataItem pairs (name -> bytes) from the TAIL only —
    the inspect-without-reading API for writer-attached annotations
    (NDV dictionaries, provenance tags). Empty dict when none."""
    with _Source(path_or_bytes) as src:
        return _parse_tail(src)["user_metadata"]


# ------------------------------------------------------------- stream decode

_PRESENT, _DATA, _LENGTH, _DICT_DATA, _SECONDARY, _ROW_INDEX = 0, 1, 2, 3, 5, 6


def _read_uints(buf: bytes, encoding: int, n: int) -> np.ndarray:
    if encoding in (0, 1):  # DIRECT / DICTIONARY -> RLEv1
        return int_rle_v1.decode(buf, signed=False)[:n]
    return rle_v2.decode(buf, signed=False)[:n].astype(np.uint64)


def _read_ints(buf: bytes, encoding: int, n: int) -> np.ndarray:
    if encoding in (0, 1):
        return int_rle_v1.decode(buf, signed=True)[:n]
    return rle_v2.decode(buf, signed=True)[:n]


def _decode_column(col_id: int, types: list[_Type], streams: dict, encodings: list[tuple[int, int]], n: int) -> tuple[pa.Array, int]:
    """Decode column subtree rooted at col_id with n rows. Returns (array,
    next column id)."""
    t = types[col_id]
    my = streams.get(col_id, {})
    enc_kind, dict_size = encodings[col_id]
    valid = boolean_rle.decode(my[_PRESENT], n) if _PRESENT in my else None
    n_present = int(valid.sum()) if valid is not None else n
    nxt = col_id + 1

    def scatter(vals, ptype):
        return _scatter_primitive(np.asarray(vals), valid, n, ptype)

    if t.kind == "BOOLEAN":
        v = boolean_rle.decode(my.get(_DATA, b""), n_present)
        return scatter(v, pa.bool_()), nxt
    if t.kind == "BYTE":
        v = byte_rle.decode(my.get(_DATA, b""))[:n_present].view(np.int8)
        return scatter(v, pa.int8()), nxt
    if t.kind in ("SHORT", "INT", "LONG"):
        v = _read_ints(my.get(_DATA, b""), enc_kind, n_present)
        ptype = {"SHORT": pa.int16(), "INT": pa.int32(), "LONG": pa.int64()}[t.kind]
        return _scatter_primitive(np.asarray(v, dtype=np.int64), valid, n, pa.int64()).cast(ptype), nxt
    if t.kind == "DATE":
        v = _read_ints(my.get(_DATA, b""), enc_kind, n_present)
        base = _scatter_primitive(np.asarray(v, dtype=np.int64), valid, n, pa.int64())
        return base.cast(pa.int32()).view(pa.date32()), nxt
    if t.kind == "FLOAT":
        v = np.frombuffer(my.get(_DATA, b""), dtype=np.float32)[:n_present]
        return scatter(v, pa.float32()), nxt
    if t.kind == "DOUBLE":
        v = np.frombuffer(my.get(_DATA, b""), dtype=np.float64)[:n_present]
        return scatter(v, pa.float64()), nxt
    if t.kind in ("STRING", "BINARY", "VARCHAR", "CHAR"):
        out_t = pa.binary() if t.kind == "BINARY" else pa.string()
        if enc_kind in (1, 3):  # DICTIONARY(_V2)
            idx = _read_uints(my.get(_DATA, b""), 2 if enc_kind == 3 else 0, n_present).astype(np.int64)
            dlens = _read_uints(my.get(_LENGTH, b""), 2 if enc_kind == 3 else 0, dict_size).astype(np.int64)
            doffs = np.zeros(dict_size + 1, dtype=np.int64)
            np.cumsum(dlens, out=doffs[1:])
            dconcat = np.frombuffer(my.get(_DICT_DATA, b""), dtype=np.uint8)
            # gather per-row bytes from the dictionary
            lens = dlens[idx]
            offs = np.zeros(n_present + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            gather = np.repeat(doffs[idx], lens) + (np.arange(int(lens.sum())) - np.repeat(offs[:-1], lens))
            return _assemble_varlen(dconcat[gather], offs, valid, n, out_t), nxt
        lens = _read_uints(my.get(_LENGTH, b""), enc_kind, n_present).astype(np.int64)
        offs = np.zeros(n_present + 1, dtype=np.int64)
        np.cumsum(lens, out=offs[1:])
        concat = np.frombuffer(my.get(_DATA, b""), dtype=np.uint8)[: offs[-1]]
        return _assemble_varlen(concat, offs, valid, n, out_t), nxt
    if t.kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
        secs = np.asarray(_read_ints(my.get(_DATA, b""), enc_kind, n_present), dtype=np.int64) + TS_EPOCH_SECONDS
        packed = np.asarray(_read_uints(my.get(_SECONDARY, b""), enc_kind, n_present), dtype=np.uint64)
        tzc = (packed & np.uint64(7)).astype(np.int64)
        base = (packed >> np.uint64(3)).astype(np.int64)
        nanos = np.where(tzc > 0, base * np.power(10, tzc + 1), base)
        # the spec'd reader adjustment for pre-epoch values
        secs = secs - ((secs < 0) & (nanos > 999_999))
        v = secs * 1_000_000 + np.sign(nanos) * (np.abs(nanos) // 1000)
        # INSTANT values are timezone-independent; surface the tz so a
        # round-trip preserves instant semantics
        out_ts = pa.timestamp("us", tz="UTC") if t.kind == "TIMESTAMP_INSTANT" else pa.timestamp("us")
        return _scatter_primitive(v, valid, n, pa.int64()).cast(out_ts), nxt
    if t.kind == "DECIMAL":
        buf = np.frombuffer(my.get(_DATA, b""), dtype=np.uint8)
        dt = pa.decimal128(t.precision or 38, t.scale)
        if n_present == 0 or len(buf) == 0:
            return _decimal_from_int64(np.zeros(0, np.int64), valid, n, dt), nxt
        term = buf < 0x80
        starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
        vlens = np.diff(np.concatenate((starts, [len(buf)])))
        if vlens.max() <= 9:
            from .codecs.varint import varint_decode_all, zigzag_decode

            vals = zigzag_decode(varint_decode_all(buf))[:n_present]
            return _decimal_from_int64(vals, valid, n, dt), nxt
        ints = varint_decode_bigint(my.get(_DATA, b""), n_present)
        from decimal import Decimal

        py = iter([Decimal(x).scaleb(-t.scale) for x in ints])
        vals = [next(py) if (valid is None or valid[i]) else None for i in range(n)]
        return pa.array(vals, type=dt), nxt
    if t.kind == "LIST":
        lens = _read_uints(my.get(_LENGTH, b""), enc_kind, n_present).astype(np.int64)
        child, nxt2 = _decode_column(t.subtypes[0], types, streams, encodings, int(lens.sum()))
        return _assemble_list(lens, child, valid, n, pa.list_(child.type)), nxt2
    if t.kind == "MAP":
        lens = _read_uints(my.get(_LENGTH, b""), enc_kind, n_present).astype(np.int64)
        total = int(lens.sum())
        keys, mid = _decode_column(t.subtypes[0], types, streams, encodings, total)
        items, nxt2 = _decode_column(t.subtypes[1], types, streams, encodings, total)
        return _assemble_map(lens, keys, items, valid, n, pa.map_(keys.type, items.type)), nxt2
    if t.kind == "STRUCT":
        children = []
        names = t.field_names
        for sub in t.subtypes:
            ch, _ = _decode_column(sub, types, streams, encodings, n_present)
            children.append(ch)
        if valid is None:
            arr = pa.StructArray.from_arrays(children, names=names)
            return arr, (t.subtypes[-1] if t.subtypes else col_id) + 1
        import pyarrow.compute as pc

        vidx = np.flatnonzero(valid)
        full_children = []
        for ch in children:
            idx = np.full(n, 0, dtype=np.int64)
            idx[vidx] = np.arange(len(ch))
            full_children.append(pc.take(ch, pa.array(idx, type=pa.int64())))
        st = pa.struct([pa.field(nm, c.type) for nm, c in zip(names, full_children)])
        vb = np.packbits(valid.astype(np.uint8), bitorder="little")
        arr = pa.StructArray.from_buffers(
            st, n, [pa.py_buffer(vb.tobytes())],
            children=[c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in full_children],
        )
        return arr, (t.subtypes[-1] if t.subtypes else col_id) + 1
    if t.kind == "UNION":
        # DATA = ByteRLE child-index tags; each child holds its values in
        # order of appearance (reference union.rs:59-129)
        if valid is not None and n_present != n:
            # Arrow dense unions carry no top-level validity bitmap
            raise NotImplementedError("ORC UNION with nulls has no Arrow representation")
        tags = byte_rle.decode(my.get(_DATA, b""))[:n_present].astype(np.int8)
        children = []
        offsets = np.zeros(n, dtype=np.int32)
        nxt2 = col_id + 1
        for ci, sub in enumerate(t.subtypes):
            sel = tags == ci
            cnt = int(sel.sum())
            ch, nxt2 = _decode_column(sub, types, streams, encodings, cnt)
            children.append(ch.combine_chunks() if isinstance(ch, pa.ChunkedArray) else ch)
            offsets[sel] = np.arange(cnt, dtype=np.int32)
        arr = pa.UnionArray.from_dense(pa.array(tags, type=pa.int8()), pa.array(offsets, type=pa.int32()), children)
        return arr, nxt2
    raise NotImplementedError(f"ORC type {t.kind}")


def _parse_stripe_footer(src: _Source, si: dict, comp: str):
    """-> (stream_list [(kind, col, len)], encodings [(kind, dict_size)],
    raw_spans [(abs_offset, len)] aligned with stream_list)."""
    sf_raw = src.read(si["offset"] + si["index_length"] + si["data_length"], si["footer_length"])
    sf = _fields(_deframe(sf_raw, comp))
    stream_list = []
    for s in sf.get(1, []):
        f = _fields(s)
        stream_list.append((f.get(1, [0])[0], f.get(2, [0])[0], f.get(3, [0])[0]))
    encodings = []
    for e in sf.get(2, []):
        f = _fields(e)
        encodings.append((f.get(1, [0])[0], f.get(2, [0])[0]))
    raw_spans = []
    pos = si["offset"]
    for _kind, _col, ln in stream_list:
        raw_spans.append((pos, ln))
        pos += ln
    return stream_list, encodings, raw_spans


def read_orc_native(path_or_bytes, columns: list[str] | None = None, row_groups: list[int] | None = None) -> pa.Table:
    """Read a real ORC file with this repo's own parser + codec kernels.

    ``columns`` prunes at the BYTE level: only projected columns' streams
    are pread + decompressed. A ``"parent.child"`` entry projects INSIDE a
    top-level struct (one level): the returned struct carries only the
    selected children, and the unselected children's streams never leave
    disk. ``"parent"`` alongside wins (full struct); unknown children are
    loud.

    ``row_groups`` selects file-global row groups (``rowIndexStride`` rows
    each, per the footer) and decodes ONLY those: stripes without a selected
    group are skipped entirely, and within a stripe each stream is sliced at
    the ROW_INDEX positions before deframing — a selected group never
    decompresses or decodes the rest of the stripe."""
    with _Source(path_or_bytes) as src:
        return _read_orc_src(src, columns, row_groups)


def _read_orc_src(src: _Source, columns: list[str] | None, row_groups: list[int] | None, stripe_idxs: list[int] | None = None) -> pa.Table:
    tail = _parse_tail(src)
    comp = tail["compression"]
    types = tail["types"]
    if not types or types[0].kind != "STRUCT":
        raise ValueError("ORC root must be a struct")
    root = types[0]

    # subtree span per top-level field (pre-order ids): [sub_i, next_sub)
    spans = list(root.subtypes) + [len(types)]
    wanted = list(range(len(root.field_names)))
    nested: dict[str, set[str]] = {}  # top-level struct name -> child names
    if columns is not None:
        flat_cols = set()
        for c in columns:
            if "." in c:
                top, child = c.split(".", 1)
                if "." in child:
                    raise NotImplementedError(
                        f"struct projection supports one level ('a.b'), got {c!r}"
                    )
                nested.setdefault(top, set()).add(child)
            else:
                flat_cols.add(c)
        for t_ in list(nested):  # a full 'a' selection wins over 'a.b'
            if t_ in flat_cols:
                nested.pop(t_)
        wanted = [
            i for i, nm in enumerate(root.field_names) if nm in flat_cols or nm in nested
        ]
        if nested and row_groups is not None:
            raise NotImplementedError("struct projection with row_groups is not supported")
        if not wanted:
            # none of the projected columns exist in THIS file (schema
            # evolution): the row count must survive so evolve_table can
            # null-fill — a 0-column Table carries num_rows
            if row_groups is not None:
                n = sum(_group_rows(tail, g) for g in row_groups)
            elif stripe_idxs is not None:
                n = sum(tail["stripes"][i]["num_rows"] for i in stripe_idxs)
            else:
                n = tail["num_rows"]
            return pa.table({"__rows": pa.nulls(n)}).select([])

    if row_groups is not None:
        return _read_row_groups(src, tail, wanted, spans, row_groups)

    # needed col-id set (projection pushdown): only these columns' streams
    # are ever pread + deframed. A nested 'a.b' selection prunes the struct
    # to its PRESENT stream + the selected children's subtrees, expressed
    # as a pruned _Type copy — the decoder itself stays projection-blind.
    dec_types = types
    want_ids: set[int] = set()
    for i in wanted:
        sel = nested.get(root.field_names[i])
        st = types[spans[i]]
        if sel is None or st.kind != "STRUCT":
            if sel is not None:
                raise ValueError(
                    f"column {root.field_names[i]!r} is {st.kind}, not STRUCT — "
                    "dotted projection needs a struct"
                )
            want_ids.update(range(spans[i], spans[i + 1]))
            continue
        missing = sel - set(st.field_names)
        if missing:
            raise KeyError(f"struct {root.field_names[i]!r} has no children {sorted(missing)}")
        child_spans = list(st.subtypes) + [spans[i + 1]]
        keep_ids, keep_names = [], []
        for j, nm in enumerate(st.field_names):
            if nm in sel:
                keep_ids.append(st.subtypes[j])
                keep_names.append(nm)
                want_ids.update(range(child_spans[j], child_spans[j + 1]))
        want_ids.add(spans[i])  # the struct's own PRESENT stream
        if dec_types is types:
            dec_types = list(types)
        dec_types[spans[i]] = _Type("STRUCT", keep_ids, keep_names, 0, 0)

    stripes = tail["stripes"] if stripe_idxs is None else [tail["stripes"][i] for i in stripe_idxs]
    per_stripe_arrays: list[list[pa.Array]] = []
    for si in stripes:
        stream_list, encodings, raw_spans = _parse_stripe_footer(src, si, comp)
        streams: dict[int, dict[int, bytes]] = {}
        for (kind, col, ln), (pos, _ln) in zip(stream_list, raw_spans):
            # whitelist only the kinds _decode_column consumes:
            # 0 PRESENT, 1 DATA, 2 LENGTH, 3 DICTIONARY_DATA, 5 SECONDARY.
            # (4 DICTIONARY_COUNT / 6 ROW_INDEX / 7 BLOOM_FILTER / 8+ are
            # skipped — deframing them would be wasted work, and a kind-7
            # stream must never alias into the dict keyed by kind.)
            # Only projected columns' streams are fetched at all.
            if kind in (0, 1, 2, 3, 5) and col in want_ids:
                streams.setdefault(col, {})[kind] = _deframe(src.read(pos, ln), comp)
        arrays = []
        for i in wanted:
            arr, _ = _decode_column(spans[i], dec_types, streams, encodings, si["num_rows"])
            arrays.append(arr)
        per_stripe_arrays.append(arrays)

    names = [root.field_names[i] for i in wanted]
    if not per_stripe_arrays:
        # 0-stripe file: build empty arrays of the schema's types
        empties = []
        for i in wanted:
            arr, _ = _decode_column(spans[i], dec_types, {}, [(0, 0)] * len(types), 0)
            empties.append(arr)
        return pa.table(empties, names=names)
    cols = [
        pa.concat_arrays([psa[j].combine_chunks() if isinstance(psa[j], pa.ChunkedArray) else psa[j] for psa in per_stripe_arrays])
        for j in range(len(wanted))
    ]
    return pa.table(cols, names=names)


def _group_rows(tail: dict, group: int) -> int:
    """Row count of file-global row group ``group`` (last group of a stripe
    may be short)."""
    stride = int(tail["row_index_stride"])
    if stride <= 0:
        raise ValueError("file has no row index")
    base = 0
    for si in tail["stripes"]:
        n = si["num_rows"]
        groups = (n + stride - 1) // stride
        if group < base + groups:
            k = group - base
            return min(stride, n - k * stride)
        base += groups
    raise IndexError(f"row group {group} out of range")


# -------------------------------------------------------- row-group seeking


def _position_extras(t_kind: str, stream_kind: int, enc_kind: int) -> int:
    """Value-state position slots a stream's row-index entry carries AFTER
    the compression position(s) (reference: rle_offset int_rle_v1.rs:13-24,
    +bit offset boolean_rle.rs:13-26, none for raw streams)."""
    if stream_kind == _PRESENT:
        return 2  # ByteRLE run offset + bit offset
    if stream_kind == _DATA:
        if t_kind == "BOOLEAN":
            return 2
        if t_kind in ("BYTE", "SHORT", "INT", "LONG", "DATE", "TIMESTAMP", "TIMESTAMP_INSTANT", "UNION"):
            return 1  # RLE run offset
        if t_kind in ("STRING", "VARCHAR", "CHAR") and enc_kind in (1, 3):
            return 1  # dictionary index stream is RLE
        return 0  # raw bytes: float/double/string-direct/binary/decimal varints
    if stream_kind in (_LENGTH, _SECONDARY):
        return 1
    raise ValueError(f"stream kind {stream_kind} carries no positions")


def _entry_offsets(positions: list[int], kinds: list[int], t_kind: str, enc_kind: int, compressed: bool) -> dict[int, tuple[int, int]]:
    """One row-index entry's positions -> {stream_kind: (framed_start,
    in_block_offset)} for the position-consuming streams ``kinds`` (ascending
    stream-kind order = the writers' record order for every column type)."""
    out: dict[int, tuple[int, int]] = {}
    p = 0
    for sk in kinds:
        start = positions[p]
        p += 1
        off = 0
        if compressed:
            off = positions[p]
            p += 1
        ex = _position_extras(t_kind, sk, enc_kind)
        if any(positions[p : p + ex]):
            # a run/bit offset > 0 means the RLE run started before this
            # group; decoding mid-run needs the prior run header. Files from
            # this repo's writer always restart codecs at group boundaries.
            raise NotImplementedError("row-group starts mid-RLE-run (foreign writer); read without row_groups")
        p += ex
        out[sk] = (start, off)
    return out


def _read_row_groups(
    src: _Source,
    tail: dict,
    wanted: list[int],
    spans: list[int],
    row_groups: list[int],
    footers: dict[int, tuple] | None = None,
    ri_raw: dict[tuple[int, int], dict] | None = None,
) -> pa.Table:
    """``footers`` ({stripe idx: parsed stripe footer}) and ``ri_raw``
    ({(stripe idx, col id): parsed ROW_INDEX fields}) let a caller that
    already parsed stripe metadata (read_orc_filtered's selection loop) hand
    it over instead of re-reading and re-deframing it here."""
    comp = tail["compression"]
    compressed = comp != "none"
    types = tail["types"]
    root = types[0]
    stride = int(tail["row_index_stride"])
    if stride <= 0:
        raise ValueError("file has no row index (rowIndexStride=0)")

    # map file-global row-group index -> (stripe idx, group-in-stripe)
    locs: list[tuple[int, int]] = []
    for sidx, si in enumerate(tail["stripes"]):
        for k in range((si["num_rows"] + stride - 1) // stride):
            locs.append((sidx, k))
    per_stripe: dict[int, list[int]] = {}
    for rg in row_groups:
        if not (0 <= rg < len(locs)):
            raise IndexError(f"row group {rg} out of range (file has {len(locs)})")
        sidx, k = locs[rg]
        per_stripe.setdefault(sidx, []).append(k)

    want_ids: set[int] = set()
    for i in wanted:
        want_ids.update(range(spans[i], spans[i + 1]))

    pieces: list[list[pa.Array]] = []
    for sidx in sorted(per_stripe):
        si = tail["stripes"][sidx]
        if footers is not None and sidx in footers:
            stream_list, encodings, raw_spans = footers[sidx]
        else:
            stream_list, encodings, raw_spans = _parse_stripe_footer(src, si, comp)
        # parse ROW_INDEX entries for the columns we will decode
        rowindex: dict[int, list[list[int]]] = {}
        for (kind, col, ln), (pos, _l) in zip(stream_list, raw_spans):
            if kind == _ROW_INDEX and col in want_ids:
                ri = None if ri_raw is None else ri_raw.get((sidx, col))
                if ri is None:
                    ri = _fields(_deframe(src.read(pos, ln), comp))
                rowindex[col] = [_packed_uvs(_fields(e).get(1, [])) for e in ri.get(1, [])]
        # position-consuming stream kinds per column, ascending kind order
        consuming: dict[int, list[int]] = {}
        for kind, col, _ln in stream_list:
            if col in want_ids and kind in (0, 1, 2, 5):
                if kind == _LENGTH and encodings[col][0] in (1, 3):
                    continue  # dictionary-entry lengths are stripe-global
                consuming.setdefault(col, []).append(kind)
        for c in consuming:
            consuming[c].sort()

        for k in sorted(per_stripe[sidx]):
            n_rg = min(stride, si["num_rows"] - k * stride)
            streams: dict[int, dict[int, bytes]] = {}
            for (kind, col, ln), (pos, _l) in zip(stream_list, raw_spans):
                if col not in want_ids or kind not in (0, 1, 2, 3, 5):
                    continue
                enc_kind = encodings[col][0]
                if kind == _DICT_DATA or (kind == _LENGTH and enc_kind in (1, 3)):
                    # dictionary blob/lengths are whole-stripe state
                    streams.setdefault(col, {})[kind] = _deframe(src.read(pos, ln), comp)
                    continue
                entries = rowindex[col]
                t_kind = types[col].kind
                offs = _entry_offsets(entries[k], consuming[col], t_kind, enc_kind, compressed)
                start, inoff = offs[kind]
                end = ln
                if k + 1 < len(entries):
                    nxt = _entry_offsets(entries[k + 1], consuming[col], t_kind, enc_kind, compressed)
                    ns, noff = nxt[kind]
                    if noff == 0:
                        end = ns
                data = _deframe(src.read(pos + start, end - start), comp)
                streams.setdefault(col, {})[kind] = data[inoff:] if inoff else data
            arrays = []
            for i in wanted:
                arr, _ = _decode_column(spans[i], types, streams, encodings, n_rg)
                arrays.append(arr)
            pieces.append(arrays)

    names = [root.field_names[i] for i in wanted]
    if not pieces:
        empties = []
        for i in wanted:
            arr, _ = _decode_column(spans[i], types, {}, [(0, 0)] * len(types), 0)
            empties.append(arr)
        return pa.table(empties, names=names)
    cols = [
        pa.concat_arrays([p[j].combine_chunks() if isinstance(p[j], pa.ChunkedArray) else p[j] for p in pieces])
        for j in range(len(wanted))
    ]
    return pa.table(cols, names=names)


def seekable_row_groups(src: _Source, tail: dict) -> bool:
    """True when the file's row groups can be seek-decoded: every row-index
    position's RLE-run/bit-offset slots are zero (chunk-aligned groups, as
    this repo's writer emits). Foreign writers record mid-run positions the
    chunk reader cannot honor. Checks the first stripe's index only — a
    writer either chunk-aligns all groups or none."""
    comp = tail["compression"]
    compressed = comp != "none"
    types = tail["types"]
    if not tail["stripes"] or tail["row_index_stride"] <= 0:
        return False
    si = tail["stripes"][0]
    stream_list, encodings, raw_spans = _parse_stripe_footer(src, si, comp)
    consuming: dict[int, list[int]] = {}
    for kind, col, _ln in stream_list:
        if kind in (0, 1, 2, 5):
            if kind == _LENGTH and encodings[col][0] in (1, 3):
                continue
            consuming.setdefault(col, []).append(kind)
    for c in consuming:
        consuming[c].sort()
    for (kind, col, ln), (pos, _l) in zip(stream_list, raw_spans):
        if kind != _ROW_INDEX or col not in consuming:
            continue
        ri = _fields(_deframe(src.read(pos, ln), comp))
        for e in ri.get(1, []):
            try:
                _entry_offsets(_packed_uvs(_fields(e).get(1, [])), consuming[col], types[col].kind, encodings[col][0], compressed)
            except NotImplementedError:
                return False
    return True


# -------------------------------------------------------- predicate pushdown


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _entry_minmax(stats_bytes: bytes, t_kind: str):
    """(min, max) from a RowIndexEntry's ColumnStatistics; None only when the
    group PROVABLY has no non-null values (numberOfValues == 0 — comparison
    predicates can never match); "unprunable" when the writer simply emitted
    no ordered stats for this kind (pruning on absence would drop real
    rows)."""
    import struct

    f = _fields(stats_bytes)
    num_present = f.get(1, [None])[0]  # numberOfValues counts non-nulls
    if t_kind in ("SHORT", "INT", "LONG", "DATE"):
        sub = f.get(2)  # intStatistics: sint64 min=1 max=2
        if sub:
            g = _fields(sub[0])
            if 1 in g and 2 in g:
                return _unzigzag(g[1][0]), _unzigzag(g[2][0])
    elif t_kind in ("FLOAT", "DOUBLE"):
        sub = f.get(3)  # doubleStatistics: double min=1 max=2
        if sub:
            g = _fields(sub[0])
            if 1 in g and 2 in g:
                return struct.unpack("<d", g[1][0])[0], struct.unpack("<d", g[2][0])[0]
    elif t_kind in ("STRING", "VARCHAR", "CHAR"):
        sub = f.get(4)  # stringStatistics: min=1 max=2
        if sub:
            g = _fields(sub[0])
            if 1 in g and 2 in g:
                return g[1][0].decode(), g[2][0].decode()
    elif t_kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
        # timestampStatistics: sint64 millis min=1 max=2 (writer-local),
        # minimumUtc=3 maximumUtc=4 — prefer Utc when emitted. Millis stats
        # FLOOR the true values, so the group's true range is
        # [min_ms, max_ms + 1ms): widen the upper bound by one millisecond
        # and prune conservatively (the exact post-filter corrects).
        sub = f.get(9)
        if sub:
            g = _fields(sub[0])
            lo_f, hi_f = (3, 4) if (3 in g and 4 in g) else (1, 2)
            if lo_f in g and hi_f in g:
                return float(_unzigzag(g[lo_f][0])), float(_unzigzag(g[hi_f][0]) + 1)
    elif t_kind == "DECIMAL":
        sub = f.get(6)  # decimalStatistics: display strings min=1 max=2
        if sub:
            from decimal import Decimal, InvalidOperation

            g = _fields(sub[0])
            if 1 in g and 2 in g:
                try:
                    return Decimal(g[1][0].decode()), Decimal(g[2][0].decode())
                except (InvalidOperation, UnicodeDecodeError):
                    return "unprunable"
    elif t_kind == "BOOLEAN":
        sub = f.get(5)  # bucketStatistics: packed uint64 count[0] = trueCount
        if sub and num_present is not None:
            counts = _packed_uvs(_fields(sub[0]).get(1, []))
            if counts:
                n_true = counts[0]
                # as an ordered range with False=0, True=1
                return (0 if n_true < num_present else 1, 1 if n_true > 0 else 0)
    else:
        return "unprunable"  # kinds without ordered index stats: never prune
    if num_present == 0:
        return None  # provably all-null group
    # non-null values exist but no min/max emitted (e.g. a writer that keeps
    # only counts for this column) — must not prune
    return "unprunable"


def _range_may_match(op: str, value, mm) -> bool:
    if mm == "unprunable" or value is None:
        return True
    if mm is None:
        return False  # all-null group: comparisons are never true
    lo, hi = mm
    if op == "==":
        return lo <= value <= hi
    if op == "<":
        return lo < value
    if op == "<=":
        return lo <= value
    if op == ">":
        return hi > value
    if op == ">=":
        return hi >= value
    raise ValueError(f"op {op!r}")


def read_orc_filtered(path_or_bytes, predicate, columns: list[str] | None = None):
    """Predicate-pushdown read via the ROW_INDEX statistics.

    ``predicate`` is (column, op, literal) with op in ==/</<=/>/>=/in , a
    LIST of such triples combined conjunctively (AND) — e.g. a range scan
    ``[("ts", ">=", lo), ("ts", "<", hi), ("kind", "==", k)]`` — or a list
    of LISTS of triples in disjunctive normal form (OR of ANDs) — e.g.
    ``[[("kind", "==", "click")], [("v", ">=", 100), ("v", "<", 200)]]``.
    ``"in"`` takes a non-empty list/tuple/set literal and prunes a group
    unless SOME member may match. A row group is read only when SOME
    conjunct may fully match its per-group [min, max] (and, for
    ``==``/``"in"`` on bloom-bearing columns, its bloom filter); survivors
    are decoded and exact-filtered. Returns (table, {"groups_total",
    "groups_read"}) so callers can assert the pruning. Files without a row
    index fall back to a full scan + filter."""
    import pyarrow.compute as pc

    if isinstance(predicate, tuple):
        dnf = [[predicate]]
    else:
        preds = list(predicate)
        if not preds:
            raise ValueError("need at least one predicate")
        if all(isinstance(p, (list,)) for p in preds):
            dnf = [list(c) for c in preds]  # DNF: OR of conjunctions
        elif any(isinstance(p, list) for p in preds):
            raise ValueError("predicate mixes triples and conjunct lists — use full DNF (list of lists)")
        else:
            dnf = [preds]  # one conjunction
    if any(not conj for conj in dnf):
        raise ValueError("empty conjunct in DNF predicate")
    with _Source(path_or_bytes) as src:
        tail = _parse_tail(src)
        comp = tail["compression"]
        types = tail["types"]
        root = types[0]
        spans = list(root.subtypes) + [len(types)]

        def _stat_value(value, t_kind):
            # stringStatistics min/max decode to str; a bytes literal (BINARY
            # or CHAR columns, which we stat as strings) compares against them
            # via UTF-8 decode — byte order == codepoint order under UTF-8, so
            # the pruning bound is exact. Undecodable bytes -> never prune.
            if t_kind in ("STRING", "VARCHAR", "CHAR") and isinstance(value, bytes):
                try:
                    return value.decode()
                except UnicodeDecodeError:
                    return None
            if t_kind == "BOOLEAN":
                # bucket stats compare as 0/1 (see _entry_minmax)
                return int(value) if isinstance(value, (bool, np.bool_)) else None
            if t_kind == "DATE":
                # date32 stats are epoch DAYS; a datetime.date literal
                # converts exactly (datetime is a date subclass — check it
                # first in the timestamp arm below, never here)
                import datetime as _dt

                if isinstance(value, _dt.date) and not isinstance(value, _dt.datetime):
                    return (value - _dt.date(1970, 1, 1)).days
                return value if isinstance(value, (int, np.integer)) else None
            if t_kind == "DECIMAL":
                from decimal import Decimal

                if isinstance(value, Decimal):
                    return value
                if isinstance(value, (int, np.integer)) and not isinstance(value, bool):
                    return Decimal(int(value))
                return None  # float literals don't compare exactly: no prune
            if t_kind in ("TIMESTAMP", "TIMESTAMP_INSTANT"):
                # timestamp stats are FLOAT MILLIS here (see _entry_minmax);
                # convert the literal exactly via integer microseconds.
                # Unrecognized literal types never prune (the exact
                # post-filter still applies — or raises on a bad literal).
                import datetime as _dt

                if isinstance(value, np.datetime64):
                    us = int(value.astype("datetime64[us]").astype(np.int64))
                elif isinstance(value, _dt.datetime):
                    # tz-aware literals diff against the UTC epoch (the
                    # subtraction converts zones exactly); naive against naive
                    epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc if value.tzinfo else None)
                    td = value - epoch
                    us = td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
                else:
                    return None
                return us / 1000.0
            return value

        def _probe_hash(value, t_kind):
            # equality literals also consult per-group BLOOM_FILTER_UTF8
            # streams (kind 8) when the writer emitted them (see bloom.py):
            # strings hash via Murmur3, integer kinds via the Java addLong
            # wang hash — probe hashes are computed ONCE, tested per group
            if isinstance(value, (str, bytes)) and t_kind in ("STRING", "VARCHAR", "CHAR", "BINARY"):
                from .bloom import murmur3_x64_128

                return murmur3_x64_128(value.encode() if isinstance(value, str) else value)[0]
            if isinstance(value, (int, np.integer)) and not isinstance(value, bool) and t_kind in ("BYTE", "SHORT", "INT", "LONG", "DATE"):
                from .bloom import wang_long_hash

                return wang_long_hash(int(value))
            return None

        # per predicate: (col, op, values, col_id, t_kind, stat_values,
        # bloom_hashes) — ==/</<=/>/>= carry one value, "in" several; a
        # group survives an "in" when SOME member may match
        def _info(col, op, value):
            if col not in root.field_names:
                raise KeyError(f"column {col!r} not in {root.field_names}")
            col_id = spans[root.field_names.index(col)]
            t_kind = types[col_id].kind
            if op == "in":
                values = list(value)
                if not values:
                    raise ValueError(f"empty IN list for column {col!r}")
                hashes = [_probe_hash(v, t_kind) for v in values]
                # bloom-prune only when every member is hashable (an
                # unhashable member could hide anywhere)
                if any(h is None for h in hashes):
                    hashes = None
                return (col, "in", values, col_id, t_kind, [_stat_value(v, t_kind) for v in values], hashes)
            bloom_hash = _probe_hash(value, t_kind) if op == "==" else None
            return (col, op, [value], col_id, t_kind, [_stat_value(value, t_kind)], [bloom_hash] if bloom_hash is not None else None)

        conj_infos = [[_info(*triple) for triple in conj] for conj in dnf]
        infos = [i for conj in conj_infos for i in conj]

        pred_col_ids = {i[3] for i in infos}
        want_bloom_ids = {i[3] for i in infos if i[6] is not None}
        read_cols = columns
        if columns is not None:
            read_cols = list(columns) + sorted({i[0] for i in infos} - set(columns))

        stride = int(tail["row_index_stride"])
        if stride <= 0:
            tbl = _read_orc_src(src, read_cols, None)
            total = scanned = max(1, len(tail["stripes"]))
        else:
            selected: list[int] = []
            sel_stripes: set[int] = set()
            footers: dict[int, tuple] = {}
            ri_raw: dict[tuple[int, int], dict] = {}
            gbase = 0
            for sidx, si in enumerate(tail["stripes"]):
                groups = (si["num_rows"] + stride - 1) // stride
                stream_list, _enc, raw_spans = _parse_stripe_footer(src, si, comp)
                footers[sidx] = (stream_list, _enc, raw_spans)
                entries_stats: dict[int, list[bytes]] = {}
                blooms: dict[int, list[tuple[int, bytes]]] = {}
                for (kind, c, ln), (pos, _l) in zip(stream_list, raw_spans):
                    if kind == _ROW_INDEX and c in pred_col_ids:
                        ri = _fields(_deframe(src.read(pos, ln), comp))
                        ri_raw[(sidx, c)] = ri
                        entries_stats[c] = [(_fields(e).get(2) or [b""])[0] for e in ri.get(1, [])]
                    elif kind == 8 and c in want_bloom_ids:  # BLOOM_FILTER_UTF8
                        bfi = _fields(_deframe(src.read(pos, ln), comp))
                        blooms[c] = [((g := _fields(ent)).get(1, [1])[0], (g.get(3) or [b""])[0]) for ent in bfi.get(1, [])]
                def _triple_may_match(k, info):
                    _col, op, _values, col_id, t_kind, stat_values, bloom_hashes = info
                    es = entries_stats.get(col_id, [])
                    mm = _entry_minmax(es[k], t_kind) if k < len(es) else "unprunable"
                    bl = blooms.get(col_id)
                    bloom_entry = bl[k] if bl is not None and k < len(bl) and bl[k][1] else None
                    member_op = "==" if op == "in" else op
                    for j, sv in enumerate(stat_values):
                        if not _range_may_match(member_op, sv, mm):
                            continue
                        if bloom_entry is not None and bloom_hashes is not None:
                            from .bloom import bloom_might_contain_hash

                            if not bloom_might_contain_hash(bloom_entry[0], bloom_entry[1], bloom_hashes[j]):
                                continue  # definitely-absent per the bloom
                        return True
                    return False

                for k in range(groups):
                    # DNF: a group survives when SOME conjunct may FULLY match
                    if any(all(_triple_may_match(k, info) for info in conj) for conj in conj_infos):
                        selected.append(gbase + k)
                        sel_stripes.add(sidx)
                gbase += groups
            total = gbase
            scanned = len(selected)
            wanted = list(range(len(root.field_names)))
            if read_cols is not None:
                wanted = [i for i, nm in enumerate(root.field_names) if nm in read_cols]
            if selected:
                try:
                    tbl = _read_row_groups(src, tail, wanted, spans, selected, footers=footers, ri_raw=ri_raw)
                except NotImplementedError:
                    # foreign writer: groups start mid-RLE-run, so seek at
                    # group granularity is impossible — still prune at STRIPE
                    # granularity (the exact post-filter keeps correctness)
                    tbl = _read_orc_src(src, read_cols, None, stripe_idxs=sorted(sel_stripes))
            else:
                empties = []
                for i in wanted:
                    arr, _ = _decode_column(spans[i], types, {}, [(0, 0)] * len(types), 0)
                    empties.append(arr)
                tbl = pa.table(empties, names=[root.field_names[i] for i in wanted])

    ops = {"==": pc.equal, "<": pc.less, "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}

    def _typed_scalar(v, col_type):
        # prefer the column's own type (int epoch-days vs date32, int vs
        # decimal, datetime vs timestamp); fall back to inference when the
        # literal doesn't convert (e.g. bytes vs a CHAR-as-string column)
        try:
            return pa.scalar(v, col_type)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError, OverflowError):
            return pa.scalar(v)

    mask = None
    for conj in conj_infos:
        cmask = None
        for col, op, values, *_rest in conj:
            if op == "in":
                m = pc.is_in(tbl[col], value_set=pa.array(values))
            else:
                m = ops[op](tbl[col], _typed_scalar(values[0], tbl[col].type))
            cmask = m if cmask is None else pc.and_kleene(cmask, m)
        mask = cmask if mask is None else pc.or_kleene(mask, cmask)
    tbl = tbl.filter(mask)
    if columns is not None and list(tbl.column_names) != list(columns):
        # drop appended predicate columns; a requested column the file lacks
        # (schema evolution) stays absent for the caller to null-fill
        tbl = tbl.select([c for c in columns if c in tbl.column_names])
    return tbl, {"groups_total": total, "groups_read": scanned}


def orc_string_value_counts(path_or_bytes, column: str):
    """Non-null value histogram of one top-level STRING/CHAR/VARCHAR column
    of a real ORC file — aggregate pushdown into the reader: a
    DICTIONARY(_V2)-encoded stripe answers from a bincount of its index
    stream plus the (tiny) dictionary, so per-row strings never
    materialize; DIRECT stripes fall back to a full column decode. NULLs
    are not counted (SQL mirror: ``WHERE col IS NOT NULL``).

    Returns ``(counts, stats)``: counts is a value-sorted list of
    ``(value: str, cnt: int)``; stats reports ``dict_stripes`` /
    ``direct_stripes`` so callers can assert the pushdown engaged.
    """
    from collections import Counter

    with _Source(path_or_bytes) as src:
        tail = _parse_tail(src)
        comp = tail["compression"]
        types = tail["types"]
        root = types[0]
        if root.kind != "STRUCT":
            raise ValueError("ORC root must be a struct")
        spans = list(root.subtypes) + [len(types)]
        try:
            fi = root.field_names.index(column)
        except ValueError:
            raise KeyError(f"column {column!r} not in {root.field_names}")
        cid = spans[fi]
        t = types[cid]
        if t.kind not in ("STRING", "VARCHAR", "CHAR"):
            raise ValueError(f"orc_string_value_counts needs a string column, got {t.kind}")

        agg: Counter = Counter()
        n_dict = n_direct = 0
        for si in tail["stripes"]:
            stream_list, encodings, raw_spans = _parse_stripe_footer(src, si, comp)
            my: dict[int, bytes] = {}
            for (kind, col, ln), (pos, _l) in zip(stream_list, raw_spans):
                if col == cid and kind in (_PRESENT, _DATA, _LENGTH, _DICT_DATA):
                    my[kind] = _deframe(src.read(pos, ln), comp)
            enc_kind, dict_size = encodings[cid]
            n = si["num_rows"]
            valid = boolean_rle.decode(my[_PRESENT], n) if _PRESENT in my else None
            n_present = int(valid.sum()) if valid is not None else n
            if enc_kind in (1, 3):  # DICTIONARY(_V2): index bincount, no gather
                n_dict += 1
                variant = 2 if enc_kind == 3 else 0
                idx = _read_uints(my.get(_DATA, b""), variant, n_present).astype(np.int64)
                dlens = _read_uints(my.get(_LENGTH, b""), variant, dict_size).astype(np.int64)
                doffs = np.zeros(dict_size + 1, dtype=np.int64)
                np.cumsum(dlens, out=doffs[1:])
                dconcat = bytes(my.get(_DICT_DATA, b""))
                counts = np.bincount(idx, minlength=dict_size)
                for j in range(dict_size):
                    c = int(counts[j])
                    if c:
                        agg[dconcat[doffs[j]:doffs[j + 1]].decode("utf-8")] += c
            else:  # DIRECT: decode the stripe's strings, then count
                n_direct += 1
                lens = _read_uints(my.get(_LENGTH, b""), enc_kind, n_present).astype(np.int64)
                offs = np.zeros(n_present + 1, dtype=np.int64)
                np.cumsum(lens, out=offs[1:])
                concat = np.frombuffer(my.get(_DATA, b""), dtype=np.uint8)[: offs[-1]]
                arr = _assemble_varlen(concat, offs, None, n_present, pa.string())
                vc = arr.value_counts()
                for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                    agg[v] += int(c)
        return sorted(agg.items()), {"dict_stripes": n_dict, "direct_stripes": n_direct}


def orc_lake_string_value_counts(lake_dir: str, column: str):
    """Distributed non-null string histogram over an ORC lake via the
    dict-pushdown reader: one Ray task per file folds
    ``orc_string_value_counts`` and ships only (value, count) cells; ONE
    tiny groupby merges. Returns ``(df, stats)`` — df is (value, cnt)
    sorted by value, stats sums dict/direct stripe engagement across the
    lake (callers can assert the pushdown did the work)."""
    import glob as _glob
    import os as _os

    import ray.data
    from ray.data.aggregate import Sum

    from ._rayutil import remote_args

    paths = sorted(_glob.glob(_os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")

    def per_file(batch: pa.Table) -> pa.Table:
        vs, cs, nd, nr = [], [], 0, 0
        for p in batch["path"]:
            counts, stats = orc_string_value_counts(p.as_py(), column)
            nd += stats["dict_stripes"]
            nr += stats["direct_stripes"]
            for v, c in counts:
                vs.append(v)
                cs.append(c)
        return pa.table(
            {
                "value": pa.array(vs, pa.string()),
                "cnt_p": pa.array(cs, pa.int64()),
                "dict_p": pa.array([nd] * len(vs), pa.int64()),
                "direct_p": pa.array([nr] * len(vs), pa.int64()),
            }
        )

    folded = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(per_file, batch_format="pyarrow", batch_size=1, **remote_args())
        .groupby("value")
        .aggregate(
            Sum("cnt_p", alias_name="cnt"),
            Sum("dict_p", alias_name="dicts"),
            Sum("direct_p", alias_name="directs"),
        )
        .to_pandas()
    )
    import pandas as pd

    if len(folded) == 0:
        return (
            pd.DataFrame({"value": pd.Series([], dtype=object), "cnt": pd.Series([], dtype="int64")}),
            {"dict_stripes": 0, "direct_stripes": 0},
        )
    stats = {
        "dict_stripes": int(folded["dicts"].sum()),
        "direct_stripes": int(folded["directs"].sum()),
    }
    out = folded[["value", "cnt"]].copy()
    out["cnt"] = out["cnt"].astype("int64")
    return out.sort_values("value", kind="mergesort").reset_index(drop=True), stats


from .stripe import exact_pair_sum as _exact_int_fold  # one impl, both containers


def orc_int_column_aggregates(path_or_bytes, column: str):
    """``{n, sum, min, max}`` of one top-level SHORT/INT/LONG column's
    non-null values — aggregate pushdown INTO the RLE codec: stripes whose
    DATA stream is RLEv1 (encoding DIRECT — this engine's int format) fold
    at RUN level via ``int_rle_v1.decode_runs`` (a constant run contributes
    ``value*count`` without expanding); DIRECT_V2 stripes (foreign writers)
    fall back to a full decode. NULL rows never enter the DATA stream, so
    DATA-stream aggregates ARE the non-null aggregates (SQL mirror:
    ``count/sum/min/max(col)``). Sums fold exactly (int64 fast path with a
    loud-safe bound check, Python ints beyond). ``min``/``max`` are None
    when the column has no non-null values.

    Returns ``(agg, stats)`` — stats reports ``runlevel_stripes`` /
    ``decoded_stripes`` so callers can assert the pushdown engaged.
    """
    from .codecs import int_rle_v1 as _rle1

    with _Source(path_or_bytes) as src:
        tail = _parse_tail(src)
        comp = tail["compression"]
        types = tail["types"]
        root = types[0]
        if root.kind != "STRUCT":
            raise ValueError("ORC root must be a struct")
        spans = list(root.subtypes) + [len(types)]
        try:
            fi = root.field_names.index(column)
        except ValueError:
            raise KeyError(f"column {column!r} not in {root.field_names}")
        cid = spans[fi]
        t = types[cid]
        if t.kind not in ("SHORT", "INT", "LONG"):
            raise ValueError(f"orc_int_column_aggregates needs an integer column, got {t.kind}")

        total_n = 0
        total_sum = 0
        vmin = None
        vmax = None
        n_run = n_dec = 0
        for si in tail["stripes"]:
            stream_list, encodings, raw_spans = _parse_stripe_footer(src, si, comp)
            my: dict[int, bytes] = {}
            for (kind, col, ln), (pos, _l) in zip(stream_list, raw_spans):
                if col == cid and kind in (_PRESENT, _DATA):
                    my[kind] = _deframe(src.read(pos, ln), comp)
            enc_kind, _ds = encodings[cid]
            data = my.get(_DATA, b"")
            if enc_kind in (0, 1):  # RLEv1: run-level fold, no expansion
                n_run += 1
                v, c = _rle1.decode_runs(data, signed=True)
                v = v.astype(np.int64)
            elif enc_kind in (2, 3) and _PRESENT not in my:
                # DIRECT_V2 without nulls: RLEv2 run-level fold (short-repeat
                # and constant-delta chunks never expand). With PRESENT the
                # stream still holds only present values, but foreign writers
                # may pad the final chunk — decode exactly n_present instead.
                n_run += 1
                from .codecs import rle_v2 as _rle2

                v, c = _rle2.decode_runs(data, signed=True)
                v = v.astype(np.int64)
            else:  # DIRECT_V2 with PRESENT: full decode
                n_dec += 1
                n = si["num_rows"]
                valid = boolean_rle.decode(my[_PRESENT], n) if _PRESENT in my else None
                n_present = int(valid.sum()) if valid is not None else n
                v = np.asarray(_read_ints(data, enc_kind, n_present), dtype=np.int64)
                c = np.ones(len(v), np.int64)
            if len(v):
                total_n += int(c.sum())
                total_sum += _exact_int_fold(v, c)
                mn, mx = int(v.min()), int(v.max())
                vmin = mn if vmin is None else min(vmin, mn)
                vmax = mx if vmax is None else max(vmax, mx)
        agg = {"n": total_n, "sum": total_sum, "min": vmin, "max": vmax}
        return agg, {"runlevel_stripes": n_run, "decoded_stripes": n_dec}


def orc_lake_int_aggregates(lake_dir: str, columns: list[str]):
    """Distributed non-null count/sum/min/max per integer column over an ORC
    lake via the run-level pushdown: one Ray task per file ships ONE row of
    (column, n, sum, min, max) cells per requested column — token payloads
    never materialize; the driver folds file rows in exact Python ints.

    Returns ``(df, stats)``: df has one row per column (column, cnt, total,
    vmin, vmax) sorted by column name; stats sums run-level vs decoded
    stripe engagement. Columns with zero non-null values keep None min/max
    (callers decide their SQL mirror)."""
    import glob as _glob
    import os as _os

    import pandas as pd
    import ray.data

    from ._rayutil import remote_args

    paths = sorted(_glob.glob(_os.path.join(lake_dir, "**", "*.orc"), recursive=True))
    if not paths:
        raise FileNotFoundError(f"no .orc files under {lake_dir}")
    cols = list(columns)

    def per_file(batch: pa.Table) -> pa.Table:
        rows = {"column": [], "n_p": [], "sum_p": [], "min_p": [], "max_p": [],
                "run_p": [], "dec_p": []}
        for p in batch["path"]:
            for c in cols:
                agg, st = orc_int_column_aggregates(p.as_py(), c)
                if abs(agg["sum"]) >= 1 << 62:
                    raise ValueError(f"per-file sum of {c} exceeds 2^62 — fold driver-side")
                rows["column"].append(c)
                rows["n_p"].append(agg["n"])
                rows["sum_p"].append(agg["sum"])
                rows["min_p"].append(agg["min"] if agg["min"] is not None else np.iinfo(np.int64).max)
                rows["max_p"].append(agg["max"] if agg["max"] is not None else np.iinfo(np.int64).min)
                rows["run_p"].append(st["runlevel_stripes"])
                rows["dec_p"].append(st["decoded_stripes"])
        return pa.table(
            {
                "column": pa.array(rows["column"], pa.string()),
                "n_p": pa.array(rows["n_p"], pa.int64()),
                "sum_p": pa.array(rows["sum_p"], pa.int64()),
                "min_p": pa.array(rows["min_p"], pa.int64()),
                "max_p": pa.array(rows["max_p"], pa.int64()),
                "run_p": pa.array(rows["run_p"], pa.int64()),
                "dec_p": pa.array(rows["dec_p"], pa.int64()),
            }
        )

    per = (
        ray.data.from_items([{"path": p} for p in paths])
        .map_batches(per_file, batch_format="pyarrow", batch_size=1, **remote_args())
        .to_pandas()
    )
    out_rows = []
    n_run = n_dec = 0
    for c in cols:
        sl = per[per["column"] == c] if len(per) else per
        if len(sl) == 0:
            out_rows.append((c, 0, 0, None, None))
            continue
        n = int(sl["n_p"].sum())
        s = sum(int(x) for x in sl["sum_p"])  # Python ints — exact at any scale
        mn = int(sl["min_p"].min())
        mx = int(sl["max_p"].max())
        n_run += int(sl["run_p"].sum())
        n_dec += int(sl["dec_p"].sum())
        out_rows.append((c, n, s, mn if n else None, mx if n else None))
    df = pd.DataFrame(out_rows, columns=["column", "cnt", "total", "vmin", "vmax"])
    df = df.sort_values("column", kind="mergesort").reset_index(drop=True)
    return df, {"runlevel_stripes": n_run, "decoded_stripes": n_dec}
