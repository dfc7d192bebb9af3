"""Pinned oracle of the reference encoder's output size.

The reference (/root/reference) is a write-only Rust library with no runnable
binary here, so the "compressed size <= the reference's ORC stripe output"
criterion (BASELINE.json) is checked against this oracle: it encodes a table
with exactly the reference's algorithms and framing —

* per-column streams as the reference writers emit them
  (PRESENT BooleanRLE; ints SignedIntRLEv1 zigzag, long.rs:96-101; strings
  LENGTH UnsignedIntRLEv1 + raw DATA, string.rs:83-89; lists LENGTH + child,
  list.rs:104-110; floats raw LE; binary DATA+LENGTH; timestamp rebased
  seconds + packed nanos; decimal zigzag varint128 + scale stream);
* each stream wrapped in the reference's compression framing: 256 KiB zstd
  level-3 blocks behind 3-byte ``length*2+is_original`` headers with the
  incompressible-original fallback (compression.rs:95-218, zstd.rs:17-18) —
  WITHOUT our extra uncompressed-size varints, so the oracle size is exactly
  what the reference would write for stream payloads (footers excluded,
  which is conservative in the reference's favor).

The RLE kernels used here are the gold-vector-verified parity codecs, i.e.
bit-identical to the reference's encoders.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .codecs import boolean_rle, int_rle_v1
from .codecs.varint import varint_encode_bigint
from .stripe import TS_EPOCH_SECONDS, _string_block, _TS_UNIT_NS

_ZSTD_BLOCK = 262144


def _ref_compressed_len(raw: bytes) -> int:
    """Reference framing size: 3-byte header + min(compressed, original) per block."""
    codec = pa.Codec("zstd", compression_level=3)
    total = 0
    for s in range(0, len(raw), _ZSTD_BLOCK):
        block = raw[s : s + _ZSTD_BLOCK]
        clen = len(codec.compress(block))
        total += 3 + min(clen, len(block))
    return total


def _column_streams(arr: pa.Array) -> list[bytes]:
    t = arr.type
    streams: list[bytes] = []
    if arr.null_count:
        streams.append(boolean_rle.encode(arr.is_valid().to_numpy(zero_copy_only=False)))
    valid = arr.drop_null() if arr.null_count else arr

    if pa.types.is_integer(t) or pa.types.is_date32(t):
        if pa.types.is_date32(t):
            valid = valid.view(pa.int32())
        v = valid.cast(pa.int64()).to_numpy(zero_copy_only=False)
        streams.append(int_rle_v1.encode(v, signed=True))
    elif pa.types.is_boolean(t):
        streams.append(boolean_rle.encode(valid.to_numpy(zero_copy_only=False)))
    elif pa.types.is_floating(t):
        streams.append(valid.to_numpy(zero_copy_only=False).tobytes())
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        concat, offs = _string_block(valid)
        streams.append(int_rle_v1.encode(np.diff(offs).astype(np.uint64), signed=False))
        streams.append(concat.tobytes())
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        concat, offs = _string_block(valid)
        streams.append(concat.tobytes())
        streams.append(int_rle_v1.encode(np.diff(offs).astype(np.uint64), signed=False))
    elif pa.types.is_timestamp(t):
        per_ns = _TS_UNIT_NS[t.unit]
        # native-unit divmod (ns-first multiply wraps int64 far from epoch)
        units_per_sec = 1_000_000_000 // per_ns
        raw_units = valid.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.int64)
        secs = np.floor_divide(raw_units, units_per_sec)
        nanos = ((raw_units - secs * units_per_sec) * per_ns).astype(np.uint64)
        streams.append(int_rle_v1.encode(secs - TS_EPOCH_SECONDS, signed=True))
        packed = np.empty(len(nanos), dtype=np.uint64)
        nz = nanos.copy()
        tzc = np.zeros(len(nanos), dtype=np.uint64)
        for _ in range(8):
            m = (nz % 10 == 0) & (nz > 0) & (tzc < 8)
            if not m.any():
                break
            nz[m] //= 10
            tzc[m] += 1
        use = tzc > 1
        packed[use] = (nz[use] << np.uint64(3)) | (tzc[use] - np.uint64(1))
        packed[~use] = nanos[~use] << np.uint64(3)
        streams.append(int_rle_v1.encode(packed, signed=False))
    elif pa.types.is_decimal(t):
        ints = [int(v.as_py().scaleb(t.scale)) for v in valid]
        streams.append(varint_encode_bigint(ints))
        streams.append(int_rle_v1.encode(np.full(len(ints), t.scale, dtype=np.int64), signed=True))
    elif pa.types.is_list(t) or pa.types.is_large_list(t):
        lens = pc.list_value_length(arr)
        lens = lens.drop_null() if lens.null_count else lens
        streams.append(int_rle_v1.encode(lens.cast(pa.int64()).to_numpy(zero_copy_only=False).astype(np.uint64), signed=False))
        streams.extend(_column_streams(valid.flatten()))
    elif pa.types.is_struct(t):
        for i in range(t.num_fields):
            streams.extend(_column_streams(valid.field(i)))
    else:
        raise NotImplementedError(f"reference oracle: type {t}")
    return streams


def reference_encoded_size(tbl: pa.Table) -> int:
    """Total stream bytes the reference would write for this table (zstd-3)."""
    total = 0
    for i in range(tbl.num_columns):
        col = tbl.column(i).combine_chunks()
        for s in _column_streams(col):
            total += _ref_compressed_len(s)
    return total
