"""Stripe container: encode a pyarrow Table into one self-describing blob.

The stripe is this engine's unit of horizontal partitioning, mirroring the
reference's stripe/stream model (reference: src/writer/stripe.rs:23-111) in a
Ray-native shape: one stripe per output partition, produced inside a
`map_batches` task, written to its own file, described by a lineage row.

Layout:  b"ORY1" | varint(header_len) | header JSON | stream bytes

Per column the stream kinds follow the reference's writers
(reference: src/writer/data/*.rs): PRESENT (BooleanRLE over validity),
DATA, LENGTH, SECONDARY, TAGS — but DATA codecs are auto-selected from the
north-rule menu (rle_v1 / rle_v2 / for / bitpack / dict / fsst / direct) by
`codecs.selector`, and every stream is block-compressed with the reference's
3-byte-header framing (compression.py). Decoding restores columns
bit-identical to the input (round-trip contract).

Type transforms preserved from the reference:
* timestamp -> rebased seconds (epoch 2015-01-01, reference
  src/writer/data/timestamp.rs:62-63) + nanos with trailing-zero packing
  (timestamp.rs:107-126);
* decimal128 -> unbounded zigzag varints + constant scale SECONDARY
  (reference src/writer/data/decimal.rs:14-127);
* list/map -> LENGTH stream over present rows (list.rs:104-110);
* struct nulls -> children carry only present rows' values (struct_.rs:57-103);
* dense union -> ByteRLE tag stream + per-variant children (union.rs:59-129).
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import stats as stats_mod
from .codecs import boolean_rle, byte_rle, int_rle_v1, rle_v2, selector
from .codecs.varint import varint_encode_bigint, varint_decode_bigint
from .compression import BlockCompressor

MAGIC = b"ORY1"  # uncompressed-header stripes (still readable)
MAGIC2 = b"ORY2"  # zstd-compressed header JSON
TS_EPOCH_SECONDS = 1420070400  # 2015-01-01T00:00:00Z, reference timestamp.rs:62-63
MIN_COMPRESS_BYTES = 64


from dataclasses import dataclass


@dataclass
class EncoderConfig:
    """Mirror of the reference Config builder (reference src/writer.rs:22-52):
    compression kind + level + block size, row-index stride for seekability,
    and the stripe byte budget used by the partition planner."""

    compression: str = "zstd"
    level: int = 3  # reference zstd.rs:18
    block_size: int = 262144  # reference snappy.rs:14
    row_index_stride: int | None = 10_000  # reference writer.rs:33
    stripe_size: int = 64 * 1024 * 1024  # reference writer.rs:34

_TS_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}


# ------------------------------------------------------------------ type spec


def type_to_spec(t: pa.DataType):
    if pa.types.is_list(t):
        return {"t": "list", "item": type_to_spec(t.value_type)}
    if pa.types.is_large_list(t):
        return {"t": "large_list", "item": type_to_spec(t.value_type)}
    if pa.types.is_struct(t):
        return {"t": "struct", "fields": [[f.name, type_to_spec(f.type)] for f in t]}
    if pa.types.is_map(t):
        return {"t": "map", "key": type_to_spec(t.key_type), "item": type_to_spec(t.item_type)}
    if pa.types.is_union(t):
        return {"t": "dense_union", "fields": [[f.name, type_to_spec(f.type)] for f in t], "type_codes": list(t.type_codes)}
    if pa.types.is_decimal128(t):
        return {"t": "decimal128", "precision": t.precision, "scale": t.scale}
    if pa.types.is_decimal(t):
        # decimal256 would silently misparse through the 2-uint64-limb reader
        raise NotImplementedError(f"{t}: only decimal128 is supported")
    if pa.types.is_timestamp(t):
        return {"t": "timestamp", "unit": t.unit, "tz": t.tz}
    return {"t": str(t)}


def spec_to_type(s) -> pa.DataType:
    k = s["t"]
    if k == "list":
        return pa.list_(spec_to_type(s["item"]))
    if k == "large_list":
        return pa.large_list(spec_to_type(s["item"]))
    if k == "struct":
        return pa.struct([pa.field(n, spec_to_type(ts)) for n, ts in s["fields"]])
    if k == "map":
        return pa.map_(spec_to_type(s["key"]), spec_to_type(s["item"]))
    if k == "dense_union":
        return pa.union([pa.field(n, spec_to_type(ts)) for n, ts in s["fields"]], mode="dense", type_codes=s["type_codes"])
    if k == "decimal128":
        return pa.decimal128(s["precision"], s["scale"])
    if k == "timestamp":
        return pa.timestamp(s["unit"], s["tz"])
    return pa.type_for_alias(k)


# -------------------------------------------------------------- column encode


def _validity(arr: pa.Array) -> np.ndarray:
    return arr.is_valid().to_numpy(zero_copy_only=False)


def _string_block(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Non-null string/binary array -> (concat uint8, int64 offsets)."""
    big = arr.cast(pa.large_binary())
    offs = np.frombuffer(big.buffers()[1], dtype=np.int64)[big.offset : big.offset + len(big) + 1]
    buf = big.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8)[offs[0] : offs[-1]] if buf is not None and len(big) else np.zeros(0, np.uint8)
    return data, (offs - offs[0]).astype(np.int64)


def decimal_unscaled(valid: pa.Array) -> tuple[np.ndarray | None, list[int] | None]:
    """Unscaled ints of a non-null decimal128 array, via the two-uint64-limb
    buffer (no per-row as_py()/Decimal). Returns (int64 array, None) when all
    values fit int64 — the overwhelmingly common precision<=18 case — else
    (None, Python bigints)."""
    if not pa.types.is_decimal128(valid.type):
        # decimal256 has a 4-limb layout; reading it as 2 limbs misparses
        raise NotImplementedError(f"{valid.type}: only decimal128 is supported")
    raw = np.frombuffer(valid.buffers()[1], dtype=np.uint64)
    raw = raw[valid.offset * 2 : (valid.offset + len(valid)) * 2]
    lo = np.ascontiguousarray(raw[0::2])
    hi = np.ascontiguousarray(raw[1::2]).view(np.int64)
    lo64 = lo.view(np.int64)
    if np.array_equal(hi, lo64 >> 63):
        return lo64, None
    return None, [int(h) * (1 << 64) + int(l) for h, l in zip(hi, lo)]


def _decimal_from_int64(vals: np.ndarray, valid: np.ndarray | None, n: int, t: pa.DataType) -> pa.Array:
    """int64 unscaled values -> decimal128 array via limb buffers (vectorized)."""
    full = np.zeros(n, dtype=np.int64)
    full[np.flatnonzero(valid) if valid is not None else slice(None)] = vals
    data = np.empty((n, 2), dtype=np.uint64)
    data[:, 0] = full.view(np.uint64)
    data[:, 1] = (full >> 63).view(np.uint64)
    bufs = [None, pa.py_buffer(data.tobytes())]
    if valid is not None:
        bufs[0] = pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little").tobytes())
    return pa.Array.from_buffers(t, n, bufs)


def map_entries(arr: pa.Array) -> tuple[np.ndarray, pa.Array, pa.Array]:
    """(valid-row lengths, keys, items) of a map array, slice-safe.

    MapArray.keys/.items return the FULL underlying child and ignore both the
    array's slice offset and null rows — encoding them directly corrupts any
    sliced map column (e.g. row-index chunks). Rebuilding the entries as a
    list<struct> over the same offsets buffer lets drop_null()/flatten() do
    the bookkeeping correctly.
    """
    t = arr.type
    moffs = np.frombuffer(arr.buffers()[1], dtype=np.int32)[arr.offset : arr.offset + len(arr) + 1]
    lens_all = np.diff(moffs).astype(np.int64)
    vmask = _validity(arr) if arr.null_count else np.ones(len(arr), bool)
    entry_type = pa.struct([t.key_field, t.item_field])
    full_entries = pa.StructArray.from_arrays([arr.keys, arr.items], fields=[t.key_field, t.item_field])
    lst = pa.Array.from_buffers(
        pa.list_(pa.field("entries", entry_type, nullable=False)),
        len(arr),
        [arr.buffers()[0], arr.buffers()[1]],
        offset=arr.offset,
        children=[full_entries],
    )
    valid = lst.drop_null() if arr.null_count else lst
    flat = valid.flatten()
    return lens_all[vmask], flat.field(0), flat.field(1)


def encode_decimal_stream(valid: pa.Array) -> bytes:
    """DATA stream of a non-null decimal column: 128-bit zigzag varints.

    64-bit zigzag+varint is numerically identical to the 128-bit encoding for
    values that fit int64, so the fast path is byte-identical to the bigint
    path (pinned by test_decimal_fast_path_bit_identical)."""
    from .codecs.varint import varint_encode_signed

    fast, slow = decimal_unscaled(valid)
    if fast is not None:
        return varint_encode_signed(fast)[0]
    return varint_encode_bigint(slow)


def encode_column(arr: pa.Array, name: str, force: dict | None = None,
                  archive: bool = False) -> dict:
    """Encode one column (recursively) -> node dict with raw stream bytes.

    ``force`` optionally pins codec choices ({"DATA": name}) so row-group
    chunks of one column share the selection made on the first chunk.
    ``archive`` switches integer DATA selection to the cold-tier menu
    (``selector.select_archive_int_codec``: full-column post-zstd argmin
    including rANS — best sizes, slower decode; hot lakes keep False).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    t = arr.type
    node: dict = {
        "name": name,
        "type": type_to_spec(t),
        "num_values": len(arr),
        "num_present": len(arr) - arr.null_count,
        "encoding": {},
        "streams": {},
        "children": [],
        "stats": stats_mod.compute(arr).to_dict(),
    }
    if arr.null_count:
        node["streams"]["PRESENT"] = boolean_rle.encode(_validity(arr))
    valid = arr.drop_null() if arr.null_count else arr

    if pa.types.is_integer(t) or pa.types.is_date32(t):
        if pa.types.is_date32(t):
            valid = valid.view(pa.int32())
        # keep the native width: int32 token streams take the 32-bit-wide
        # encoder fast path (half the memory traffic, identical bytes)
        v = valid.to_numpy(zero_copy_only=False)
        codec = (force or {}).get("DATA") or (
            selector.select_archive_int_codec(v) if archive else selector.select_int_codec(v)
        )
        node["encoding"]["DATA"] = codec
        node["streams"]["DATA"] = selector.encode_ints(v, codec)
    elif pa.types.is_boolean(t):
        node["streams"]["DATA"] = boolean_rle.encode(valid.to_numpy(zero_copy_only=False))
        node["encoding"]["DATA"] = "boolean_rle"
    elif pa.types.is_floating(t):
        # raw little-endian IEEE like the reference float writer (float.rs:95-100)
        node["streams"]["DATA"] = valid.to_numpy(zero_copy_only=False).tobytes()
        node["encoding"]["DATA"] = "raw"
    elif pa.types.is_timestamp(t):
        per_ns = _TS_UNIT_NS[t.unit]
        # divmod in the column's NATIVE unit: multiplying to ns first wraps
        # int64 for values beyond ~±292 years of epoch (easy with unit 's')
        units_per_sec = 1_000_000_000 // per_ns
        raw_units = valid.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        secs = np.floor_divide(raw_units, units_per_sec)
        nanos = ((raw_units - secs * units_per_sec) * per_ns).astype(np.uint64)
        node["streams"]["DATA"] = rle_v2.encode(secs - TS_EPOCH_SECONDS, signed=True)
        node["encoding"]["DATA"] = "rle_v2"
        # trailing-decimal-zero packing (reference timestamp.rs:107-126)
        packed = np.empty(len(nanos), dtype=np.uint64)
        nz = nanos.copy()
        tz = np.zeros(len(nanos), dtype=np.uint64)
        for _ in range(8):
            m = (nz % 10 == 0) & (nz > 0) & (tz < 8)
            if not m.any():
                break
            nz[m] //= 10
            tz[m] += 1
        use = tz > 1
        packed[use] = (nz[use] << np.uint64(3)) | (tz[use] - np.uint64(1))
        packed[~use] = nanos[~use] << np.uint64(3)
        node["streams"]["SECONDARY"] = rle_v2.encode(packed, signed=False)
        node["encoding"]["SECONDARY"] = "rle_v2"
    elif pa.types.is_decimal(t):
        node["streams"]["DATA"] = encode_decimal_stream(valid)
        node["encoding"]["DATA"] = "varint128"
        node["streams"]["SECONDARY"] = rle_v2.encode(np.full(len(valid), t.scale, dtype=np.int64), signed=True)
        node["encoding"]["SECONDARY"] = "rle_v2"
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        concat, offs = _string_block(valid)
        codec = (force or {}).get("DATA") or selector.select_string_codec(concat, offs)
        node["encoding"]["DATA"] = codec
        node["streams"]["DATA"] = selector.encode_strings(concat, offs, codec)
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        concat, offs = _string_block(valid)
        node["streams"]["DATA"] = concat.tobytes()
        lv = np.diff(offs)
        lcodec = (force or {}).get("LENGTH") or selector.select_int_codec(lv)
        node["streams"]["LENGTH"] = selector.encode_ints(lv, lcodec)
        node["encoding"]["DATA"] = "raw"
        node["encoding"]["LENGTH"] = lcodec
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        lens = pc.list_value_length(arr)
        lens = lens.drop_null() if lens.null_count else lens
        lv = lens.cast(pa.int64()).to_numpy(zero_copy_only=False)
        lcodec = (force or {}).get("LENGTH") or selector.select_int_codec(lv)
        node["streams"]["LENGTH"] = selector.encode_ints(lv, lcodec)
        node["encoding"]["LENGTH"] = lcodec
        node["children"].append(encode_column(valid.combine_chunks().flatten() if isinstance(valid, pa.ChunkedArray) else valid.flatten(), "item", _child_force(force, 0), archive=archive))
    elif pa.types.is_struct(t):
        for i, f in enumerate(t):
            child = valid.field(i) if hasattr(valid, "field") else pc.struct_field(valid, i)
            node["children"].append(encode_column(child, f.name, _child_force(force, i), archive=archive))
    elif pa.types.is_map(t):
        lv, keys, items = map_entries(arr)
        lcodec = (force or {}).get("LENGTH") or selector.select_int_codec(lv)
        node["streams"]["LENGTH"] = selector.encode_ints(lv, lcodec)
        node["encoding"]["LENGTH"] = lcodec
        node["children"].append(encode_column(keys, "key", _child_force(force, 0), archive=archive))
        node["children"].append(encode_column(items, "value", _child_force(force, 1), archive=archive))
    elif pa.types.is_union(t):
        # dense union: ByteRLE over child-index tags (reference union.rs:117-126)
        type_codes = np.frombuffer(arr.buffers()[1], dtype=np.int8)[arr.offset : arr.offset + len(arr)]
        code_to_child = {c: i for i, c in enumerate(t.type_codes)}
        tags = np.array([code_to_child[c] for c in type_codes], dtype=np.uint8)
        node["streams"]["TAGS"] = byte_rle.encode(tags)
        node["encoding"]["TAGS"] = "byte_rle"
        for i, f in enumerate(t):
            node["children"].append(encode_column(arr.field(i), f.name, _child_force(force, i), archive=archive))
    else:
        raise NotImplementedError(f"column type {t} not supported")
    return node


# -------------------------------------------------------------- column decode


def _scatter_primitive(vals: np.ndarray, valid: np.ndarray | None, n: int, ptype: pa.DataType) -> pa.Array:
    if valid is None:
        return pa.array(vals, type=ptype)
    out = np.zeros(n, dtype=vals.dtype if len(vals) else np.int64)
    out[np.flatnonzero(valid)] = vals
    return pa.array(out, type=ptype, mask=~valid)


def decode_column(node: dict, streams: dict) -> pa.Array:
    t = spec_to_type(node["type"])
    n = node["num_values"]
    my = streams[id(node)]
    valid = boolean_rle.decode(my["PRESENT"], n) if "PRESENT" in my else None
    n_present = node["num_present"]

    if pa.types.is_integer(t) or pa.types.is_date32(t):
        v = selector.decode_ints(my["DATA"], node["encoding"]["DATA"])[:n_present]
        if pa.types.is_uint64(t):
            # values > 2^63-1 round-trip as wrapped int64; reinterpret bits
            out = np.zeros(n, dtype=np.int64)
            out[np.flatnonzero(valid) if valid is not None else slice(None)] = np.asarray(v, dtype=np.int64)
            return pa.array(out.view(np.uint64), type=t, mask=(~valid) if valid is not None else None)
        base = _scatter_primitive(v, valid, n, pa.int64())
        if pa.types.is_date32(t):
            return base.cast(pa.int32()).view(t)
        return base.cast(t)
    if pa.types.is_boolean(t):
        v = boolean_rle.decode(my["DATA"], n_present)
        return _scatter_primitive(v, valid, n, pa.bool_())
    if pa.types.is_floating(t):
        dtype = np.float32 if pa.types.is_float32(t) else np.float64
        v = np.frombuffer(my["DATA"], dtype=dtype)[:n_present]
        return _scatter_primitive(v, valid, n, t)
    if pa.types.is_timestamp(t):
        secs = rle_v2.decode(my["DATA"], signed=True)[:n_present] + TS_EPOCH_SECONDS
        packed = rle_v2.decode(my["SECONDARY"], signed=False)[:n_present]
        tzc = (packed & np.uint64(7)).astype(np.int64)
        base = (packed >> np.uint64(3)).astype(np.int64)
        # tz code c>0 means c+1 decimal zeros were stripped (reference timestamp.rs:107-126)
        nanos = np.where(tzc > 0, base * np.power(10, tzc + 1), base)
        # reconstruct in the native unit (secs*1e9 would wrap int64 for
        # far-from-epoch values); nanos//per_ns == the original sub-second
        # remainder exactly, so v == the encoded value with no overflow
        per_ns = _TS_UNIT_NS[t.unit]
        units_per_sec = 1_000_000_000 // per_ns
        v = secs * units_per_sec + nanos // per_ns
        return _scatter_primitive(v.astype(np.int64), valid, n, pa.int64()).cast(t)
    if pa.types.is_decimal(t):
        buf = np.frombuffer(my["DATA"], dtype=np.uint8)
        # fast path: every varint <=9 bytes means every zigzag fits uint64
        term = buf < 0x80
        if len(buf) == 0 or n_present == 0:
            return _decimal_from_int64(np.zeros(0, np.int64), valid, n, t)
        starts = np.flatnonzero(np.concatenate(([True], term[:-1])))
        vlens = np.diff(np.concatenate((starts, [len(buf)])))
        if vlens.max() <= 9:
            from .codecs.varint import varint_decode_all, zigzag_decode

            vals = zigzag_decode(varint_decode_all(buf))[:n_present]
            return _decimal_from_int64(vals, valid, n, t)
        ints = varint_decode_bigint(my["DATA"], n_present)
        from decimal import Decimal

        vals = [Decimal(x).scaleb(-t.scale) for x in ints]
        if valid is None:
            return pa.array(vals, type=t)
        out = []
        it = iter(vals)
        for ok in valid:
            out.append(next(it) if ok else None)
        return pa.array(out, type=t)
    if pa.types.is_string(t) or pa.types.is_large_string(t) or pa.types.is_binary(t) or pa.types.is_large_binary(t):
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            lens = selector.decode_ints(my["LENGTH"], node["encoding"]["LENGTH"])[:n_present].astype(np.int64)
            offs = np.zeros(n_present + 1, dtype=np.int64)
            np.cumsum(lens, out=offs[1:])
            concat = np.frombuffer(my["DATA"], dtype=np.uint8)
        else:
            concat, offs = selector.decode_strings(my["DATA"], node["encoding"]["DATA"])
        return _assemble_varlen(concat, offs, valid, n, t)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        lens = selector.decode_ints(my["LENGTH"], node["encoding"]["LENGTH"])[:n_present].astype(np.int64)
        child = decode_column(node["children"][0], streams)
        return _assemble_list(lens, child, valid, n, t)
    if pa.types.is_struct(t):
        children = [decode_column(c, streams) for c in node["children"]]
        if valid is None:
            return pa.StructArray.from_arrays(children, names=[f.name for f in t])
        full_children = []
        vidx = np.flatnonzero(valid)
        for ch in children:
            idx = np.full(n, -1, dtype=np.int64)
            idx[vidx] = np.arange(len(ch))
            full_children.append(pc.take(ch, pa.array(np.where(idx >= 0, idx, 0), type=pa.int64())))
        vb = np.packbits(valid.astype(np.uint8), bitorder="little")
        return pa.StructArray.from_buffers(t, n, [pa.py_buffer(vb.tobytes())], children=[c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in full_children])
    if pa.types.is_map(t):
        lens = selector.decode_ints(my["LENGTH"], node["encoding"]["LENGTH"])[:n_present].astype(np.int64)
        keys = decode_column(node["children"][0], streams)
        items = decode_column(node["children"][1], streams)
        return _assemble_map(lens, keys, items, valid, n, t)
    if pa.types.is_union(t):
        tags = byte_rle.decode(my["TAGS"])[:n]
        children = [decode_column(c, streams) for c in node["children"]]
        type_codes = np.array(t.type_codes, dtype=np.int8)[tags]
        value_offsets = np.zeros(n, dtype=np.int32)
        for ci in range(len(children)):
            m = tags == ci
            value_offsets[m] = np.arange(int(m.sum()), dtype=np.int32)
        return pa.UnionArray.from_dense(
            pa.array(type_codes, type=pa.int8()),
            pa.array(value_offsets, type=pa.int32()),
            [c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in children],
            [f.name for f in t],
            list(t.type_codes),
        )
    raise NotImplementedError(f"decode for {t}")


def _assemble_varlen(concat: np.ndarray, offs: np.ndarray, valid: np.ndarray | None, n: int, t: pa.DataType) -> pa.Array:
    lens = np.diff(offs)
    if valid is not None:
        full = np.zeros(n, dtype=np.int64)
        full[np.flatnonzero(valid)] = lens
        lens = full
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    bufs = [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(concat.tobytes())]
    if valid is not None:
        vb = np.packbits(valid.astype(np.uint8), bitorder="little")
        bufs[0] = pa.py_buffer(vb.tobytes())
    base = pa.Array.from_buffers(pa.large_binary(), n, bufs)
    return base.cast(t)


def _assemble_list(lens: np.ndarray, child: pa.Array, valid: np.ndarray | None, n: int, t: pa.DataType) -> pa.Array:
    if valid is not None:
        full = np.zeros(n, dtype=np.int64)
        full[np.flatnonzero(valid)] = lens
        lens = full
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    child = child.combine_chunks() if isinstance(child, pa.ChunkedArray) else child
    big = pa.large_list(child.type)
    bufs = [None, pa.py_buffer(offsets.tobytes())]
    if valid is not None:
        bufs[0] = pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little").tobytes())
    out = pa.Array.from_buffers(big, n, bufs, children=[child])
    return out.cast(t)


def _assemble_map(lens, keys, items, valid, n, t) -> pa.Array:
    # Built via from_buffers (packed validity bitmap + scattered offsets),
    # mirroring _assemble_list: MapArray.from_arrays' null-offset convention
    # anchors nulls at offsets[i] (shifting them onto the wrong rows) and
    # rejects a null final row, so it cannot express this layout.
    if valid is not None:
        full = np.zeros(n, dtype=np.int64)
        full[np.flatnonzero(valid)] = lens
        lens = full
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(lens, out=offsets[1:])
    keys = keys.combine_chunks() if isinstance(keys, pa.ChunkedArray) else keys
    items = items.combine_chunks() if isinstance(items, pa.ChunkedArray) else items
    entries = pa.StructArray.from_arrays(
        [keys.cast(t.key_field.type), items.cast(t.item_field.type)],
        fields=[t.key_field, t.item_field],
    )
    bufs = [None, pa.py_buffer(offsets.tobytes())]
    if valid is not None:
        bufs[0] = pa.py_buffer(np.packbits(valid.astype(np.uint8), bitorder="little").tobytes())
    return pa.Array.from_buffers(t, n, bufs, children=[entries])


# ------------------------------------------------------------ stripe assembly


def _child_force(force: dict | None, i: int):
    if not force:
        return None
    ch = force.get("children")
    return ch[i] if ch and i < len(ch) else None


def _extract_force(node: dict) -> dict:
    """Codec choices of an encoded node, reusable to pin sibling chunks."""
    return {
        "DATA": node["encoding"].get("DATA"),
        "LENGTH": node["encoding"].get("LENGTH"),
        "children": [_extract_force(c) for c in node["children"]],
    }


def _collect_nodes(node: dict, out: list) -> None:
    if "chunks" in node:
        for c in node["chunks"]:
            _collect_nodes(c, out)
        return
    out.append(node)
    for c in node["children"]:
        _collect_nodes(c, out)


def encode_table(
    tbl: pa.Table,
    compression: str = "zstd",
    level: int = 3,
    row_index_stride: int | None = None,
    config: EncoderConfig | None = None,
    archive: bool = False,
) -> tuple[bytes, dict]:
    """Encode a Table into a stripe blob. Returns (bytes, meta summary).

    With ``row_index_stride`` (or a config that sets one), each column is
    encoded as independent row-group chunks of stride rows — the row-index /
    position-tracking parity feature (reference src/writer/data/common.rs:24-48):
    ``decode_stripe(columns=..., row_range=...)`` then touches only the chunks
    covering the range. Chunks share the codec selected on the first chunk.
    """
    if config is not None:
        compression = config.compression
        level = config.level
        row_index_stride = config.row_index_stride
    comp = BlockCompressor(compression, level)

    n_rows = tbl.num_rows
    roots: list[dict] = []
    for i in range(tbl.num_columns):
        col = tbl.column(i).combine_chunks()
        name = tbl.schema.names[i]
        if row_index_stride and n_rows > row_index_stride:
            chunks = []
            force = None
            for lo in range(0, n_rows, row_index_stride):
                sub = encode_column(col.slice(lo, min(row_index_stride, n_rows - lo)), name, force, archive=archive)
                if force is None:
                    force = _extract_force(sub)
                chunks.append(sub)
            root = {
                "name": name,
                "type": chunks[0]["type"],
                "chunks": chunks,
                "stride": row_index_stride,
                "num_values": n_rows,
                "encoding": chunks[0]["encoding"],
                "children": [],
                "stats": stats_mod.merge_all([stats_mod.ColumnStats.from_dict(c["stats"]) for c in chunks]).to_dict(),
            }
            roots.append(root)
        else:
            roots.append(encode_column(col, name, archive=archive))

    all_nodes: list[dict] = []
    for r in roots:
        _collect_nodes(r, all_nodes)

    payload: list[bytes] = []
    offset = 0
    crc = 0
    raw_total = 0
    for nd in all_nodes:
        meta_streams = {}
        for kind, raw in nd["streams"].items():
            crc = zlib.crc32(raw, crc)
            raw_total += len(raw)
            if comp._codec is not None and len(raw) >= MIN_COMPRESS_BYTES:
                blob = comp.compress(raw)
                ckind = compression
            else:
                blob = raw
                ckind = "none"
            meta_streams[kind] = {"off": offset, "len": len(blob), "raw_len": len(raw), "comp": ckind}
            payload.append(blob)
            offset += len(blob)
        nd["streams_meta"] = meta_streams
        del nd["streams"]

    header = {
        "version": 1,
        "num_rows": tbl.num_rows,
        "compression": {"kind": compression, "level": level},
        "columns": roots,
        "checksum_crc32": crc,
        "raw_stream_bytes": raw_total,
    }
    hjson = json.dumps(header).encode()

    def _vint(z: int) -> bytes:
        out = bytearray()
        while True:
            if z < 0x80:
                out.append(z)
                return bytes(out)
            out.append(0x80 | (z & 0x7F))
            z >>= 7

    # headers are highly repetitive JSON; compressing them keeps the metadata
    # overhead of many small stripes negligible vs the reference's protobuf
    hcomp = pa.Codec("zstd", compression_level=3).compress(hjson).to_pybytes()
    blob = b"".join([MAGIC2, _vint(len(hcomp)), _vint(len(hjson)), hcomp] + payload)
    meta = {
        "num_rows": tbl.num_rows,
        "encoded_bytes": len(blob),
        "raw_stream_bytes": raw_total,
        "checksum_crc32": crc,
        "codecs": {nd["name"]: nd["encoding"] for nd in all_nodes if nd["encoding"]},
    }
    return blob, meta


def read_header(blob: bytes) -> tuple[dict, int]:
    magic = blob[:4]
    if magic not in (MAGIC, MAGIC2):
        raise ValueError("bad stripe magic")
    p = 4

    def _rv(p: int) -> tuple[int, int]:
        z = 0
        shift = 0
        while True:
            byte = blob[p]
            p += 1
            z |= (byte & 0x7F) << shift
            if byte < 0x80:
                return z, p
            shift += 7

    if magic == MAGIC2:
        clen, p = _rv(p)
        rlen, p = _rv(p)
        hjson = pa.Codec("zstd").decompress(blob[p : p + clen], decompressed_size=rlen).to_pybytes()
        return json.loads(hjson.decode()), p + clen
    z, p = _rv(p)
    return json.loads(blob[p : p + z].decode()), p + z


def decode_stripe(
    blob: bytes,
    columns: list[str] | None = None,
    row_range: tuple[int, int] | None = None,
) -> pa.Table:
    """Decode a stripe; optionally project columns and/or a [lo, hi) row range.

    With a row-indexed stripe, a row range touches only the covering chunks
    (seekability); otherwise the column decodes fully and is sliced.
    """
    header, p = read_header(blob)
    comp_cfg = header["compression"]

    def load(node: dict, streams: dict):
        my = {}
        for kind, m in node["streams_meta"].items():
            raw = blob[p + m["off"] : p + m["off"] + m["len"]]
            if m["comp"] != "none":
                raw = BlockCompressor(m["comp"], comp_cfg.get("level", 3)).decompress(raw)
            my[kind] = raw
        streams[id(node)] = my
        for c in node["children"]:
            load(c, streams)

    def decode_root(root: dict) -> pa.Array:
        streams: dict[int, dict[str, bytes]] = {}
        if "chunks" in root:
            stride = root["stride"]
            chunks = root["chunks"]
            if row_range is not None:
                lo, hi = row_range
                c_lo = max(0, lo // stride)
                c_hi = min(len(chunks), (max(hi, lo + 1) + stride - 1) // stride)
            else:
                c_lo, c_hi = 0, len(chunks)
            parts = []
            for c in chunks[c_lo:c_hi]:
                load(c, streams)
                parts.append(decode_column(c, streams))
            arr = pa.concat_arrays([x.combine_chunks() if isinstance(x, pa.ChunkedArray) else x for x in parts])
            if row_range is not None:
                lo, hi = row_range
                arr = arr.slice(lo - c_lo * stride, hi - lo)
            return arr
        load(root, streams)
        arr = decode_column(root, streams)
        if row_range is not None:
            lo, hi = row_range
            arr = arr.slice(lo, hi - lo)
        return arr

    arrays = []
    names = []
    for root in header["columns"]:
        if columns is not None and root["name"] not in columns:
            continue
        arrays.append(decode_root(root))
        names.append(root["name"])
    return pa.table(arrays, names=names)


def column_value_counts(blob: bytes, column: str) -> tuple[np.ndarray, np.ndarray]:
    """Value histogram ``(values, counts)`` of one integer column — or a
    list column's ELEMENTS — from a stripe, pushing the aggregate INTO the
    codec where possible: chunks whose DATA stream is RLEv1 with no nulls
    fold at RUN level (``int_rle_v1.decode_runs`` — constant runs never
    expand), everything else falls back to a full ``decode_column``. The
    two paths are multiset-identical (pinned in tests); counts are exact.

    The scale story: a 10^12-token lake's vocabulary histogram reads only
    the tokens column's streams and ships |distinct values| pairs per
    stripe — the token payload never re-materializes.
    """
    from .codecs import dictionary, int_rle_v1, rle_v2

    header, p = read_header(blob)
    comp_cfg = header["compression"]
    root = next((r for r in header["columns"] if r["name"] == column), None)
    if root is None:
        raise KeyError(f"column {column!r} not in stripe (have "
                       f"{[r['name'] for r in header['columns']]})")

    def load(node: dict, streams: dict):
        my = {}
        for kind, m in node["streams_meta"].items():
            raw = blob[p + m["off"] : p + m["off"] + m["len"]]
            if m["comp"] != "none":
                raw = BlockCompressor(m["comp"], comp_cfg.get("level", 3)).decompress(raw)
            my[kind] = raw
        streams[id(node)] = my
        for c in node["children"]:
            load(c, streams)

    vs: list[np.ndarray] = []
    cs: list[np.ndarray] = []
    for node in (root["chunks"] if "chunks" in root else [root]):
        tgt = node
        while tgt["type"]["t"] in ("list", "large_list"):
            tgt = tgt["children"][0]
        if tgt["type"]["t"] not in ("int8", "int16", "int32", "int64",
                                    "uint8", "uint16", "uint32"):
            raise ValueError(f"column_value_counts needs an integer leaf, got {tgt['type']}")
        codec = tgt["encoding"].get("DATA")
        # element counts never depend on the list LENGTHS stream, and null
        # lists contribute no child elements (the encoder flattens only
        # present rows) — so the pushdown path needs only a null-free LEAF
        push_ok = codec in ("rle_v1", "rle_v2", "dict_int") and tgt["num_present"] == tgt["num_values"]
        if push_ok:
            streams: dict = {}
            load(tgt, streams)
            if codec == "rle_v1":
                v, c = int_rle_v1.decode_runs(streams[id(tgt)]["DATA"], signed=True)
            elif codec == "rle_v2":
                v, c = rle_v2.decode_runs(streams[id(tgt)]["DATA"], signed=True)
            else:
                v, c = dictionary.value_counts_ints(streams[id(tgt)]["DATA"])
            vs.append(v.astype(np.int64))
            cs.append(c)
        else:
            streams = {}
            load(node, streams)
            arr = decode_column(node, streams)
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            while pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
                arr = arr.flatten()  # null lists contribute no elements
            arr = arr.drop_null()
            v = arr.to_numpy(zero_copy_only=False).astype(np.int64)
            uv, uc = np.unique(v, return_counts=True)
            vs.append(uv)
            cs.append(uc.astype(np.int64))
    if not vs:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    allv = np.concatenate(vs)
    allc = np.concatenate(cs)
    uv, inv = np.unique(allv, return_inverse=True)
    uc = np.zeros(len(uv), np.int64)
    np.add.at(uc, inv, allc)
    return uv, uc


def exact_pair_sum(v: "np.ndarray", c: "np.ndarray") -> int:
    """Exact sum(v*c) over run pairs: int64 fast path behind conservative
    float bounds, Python-int fold beyond (never wraps at any magnitude)."""
    if len(v) == 0:
        return 0
    va = np.abs(v.astype(np.float64))
    ca = c.astype(np.float64)
    if float(va.max()) < 2**31 and float(ca.max()) < 2**31 and float((va * ca).sum()) < 2**61:
        return int(np.sum(v * c))
    return int(sum(int(a) * int(b) for a, b in zip(v.tolist(), c.tolist())))


def column_int_aggregates(blob: bytes, column: str) -> dict:
    """``{n, sum, min, max}`` of one integer column (or a list column's
    elements) from a stripe, folded over ``column_value_counts``' run
    pairs — RLEv1/RLEv2/dict streams never expand their constant runs, and
    the sum is exact (``exact_pair_sum``). ``min``/``max`` are None when
    the column holds no values."""
    v, c = column_value_counts(blob, column)
    if len(v) == 0:
        return {"n": 0, "sum": 0, "min": None, "max": None}
    return {
        "n": int(c.sum()),
        "sum": exact_pair_sum(v, c),
        "min": int(v.min()),
        "max": int(v.max()),
    }


def column_string_value_counts(blob: bytes, column: str) -> tuple[list[str], np.ndarray]:
    """Non-null value histogram ``(values, counts)`` of one STRING column —
    or a list column's string elements — from a stripe, pushing the
    aggregate into the dictionary codec where the selector chose it
    (index-stream run fold + bincount; per-row strings never gather) and
    falling back to a codec-level DATA decode otherwise. The DATA stream
    holds only PRESENT values, so NULLs are never counted on either path
    (SQL mirror: ``WHERE col IS NOT NULL``). Returns values sorted
    lexicographically with exact counts, plus nothing else — callers that
    need engagement stats use ``column_string_value_counts_stats``."""
    values, counts, _stats = column_string_value_counts_stats(blob, column)
    return values, counts


def column_string_value_counts_stats(blob: bytes, column: str):
    from collections import Counter

    from .codecs import dictionary, selector

    header, p = read_header(blob)
    comp_cfg = header["compression"]
    root = next((r for r in header["columns"] if r["name"] == column), None)
    if root is None:
        raise KeyError(f"column {column!r} not in stripe (have "
                       f"{[r['name'] for r in header['columns']]})")

    def load(node: dict) -> dict:
        my = {}
        for kind, m in node["streams_meta"].items():
            raw = blob[p + m["off"] : p + m["off"] + m["len"]]
            if m["comp"] != "none":
                raw = BlockCompressor(m["comp"], comp_cfg.get("level", 3)).decompress(raw)
            my[kind] = raw
        return my

    agg: Counter = Counter()
    n_dict = n_direct = 0
    for node in (root["chunks"] if "chunks" in root else [root]):
        tgt = node
        while tgt["type"]["t"] in ("list", "large_list"):
            tgt = tgt["children"][0]
        if tgt["type"]["t"] not in ("string", "large_string"):
            raise ValueError(
                f"column_string_value_counts needs a string leaf, got {tgt['type']}"
            )
        codec = tgt["encoding"].get("DATA")
        my = load(tgt)
        if codec == "dict":  # pushdown: run-fold the index stream
            n_dict += 1
            ents, cnts = dictionary.value_counts_strings(my["DATA"])
            for e, c in zip(ents, cnts):
                agg[e.decode("utf-8")] += int(c)
        else:  # direct / fsst: codec-level decode of present values only
            n_direct += 1
            concat, offs = selector.decode_strings(my["DATA"], codec)
            arr = pa.Array.from_buffers(
                pa.large_binary(), len(offs) - 1,
                [None, pa.py_buffer(np.ascontiguousarray(offs, np.int64).tobytes()),
                 pa.py_buffer(np.ascontiguousarray(concat, np.uint8).tobytes())],
            ).cast(pa.string())
            vc = arr.value_counts()
            for v, c in zip(vc.field("values").to_pylist(), vc.field("counts").to_pylist()):
                agg[v] += int(c)
    items = sorted(agg.items())
    return (
        [k for k, _ in items],
        np.array([c for _, c in items], np.int64),
        {"dict_chunks": n_dict, "direct_chunks": n_direct},
    )
