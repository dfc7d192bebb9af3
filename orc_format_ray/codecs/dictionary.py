"""Dictionary encoding for string / integer columns (DICTIONARY_V2-style).

New-engine codec (north rule). The reference has NO dictionary path — its
column encodings are always DIRECT (reference: src/writer/data/string.rs:173-177)
— so this is a pure addition. Sort-free layout, like ORC DICTIONARY_V2:

    varint(n_dict) varint(n_values)
    varint(len(lengths_stream))  lengths_stream   # RLEv2-unsigned dict entry lengths
    varint(len(blob))            blob             # concatenated dict bytes
    varint(len(index_stream))    index_stream     # RLEv2-unsigned value indexes

Dictionary build uses pyarrow's hash-based `dictionary_encode` (first-
occurrence order, vectorized); index + length streams reuse rle_v2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import rle_v2
from .varint import varint_encode_unsigned


def _lp(b: bytes) -> list[bytes]:
    """Length-prefix a byte string with a varint."""
    hdr, _ = varint_encode_unsigned(np.array([len(b)], dtype=np.uint64))
    return [hdr, b]


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


def encode_strings(arr: pa.Array) -> bytes:
    """Dictionary-encode a non-null string/binary array."""
    if arr.null_count:
        raise ValueError("nulls must be stripped before codec level")
    dict_arr = pc.dictionary_encode(arr)
    dictionary = dict_arr.dictionary
    indices = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    # dict entry lengths + blob from the arrow buffers (zero-copy offsets)
    flat = dictionary.cast(pa.large_binary()) if not pa.types.is_large_binary(dictionary.type) else dictionary
    offs = np.frombuffer(flat.buffers()[1], dtype=np.int64)[flat.offset : flat.offset + len(flat) + 1]
    lens = np.diff(offs).astype(np.uint64)
    blob = flat.buffers()[2].to_pybytes()[offs[0] : offs[-1]] if len(flat) else b""

    head, _ = varint_encode_unsigned(np.array([len(dictionary), len(arr)], dtype=np.uint64))
    parts = [head]
    parts += _lp(rle_v2.encode(lens, signed=False))
    parts += _lp(blob)
    parts += _lp(rle_v2.encode(indices, signed=False))
    return b"".join(parts)


def decode_strings(buf: bytes) -> pa.Array:
    b = np.frombuffer(buf, dtype=np.uint8)
    p = 0
    n_dict, p = _read_varint(b, p)
    n_vals, p = _read_varint(b, p)
    ln, p = _read_varint(b, p)
    lens = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_dict].astype(np.int64)
    p += ln
    ln, p = _read_varint(b, p)
    blob = b[p : p + ln].tobytes()
    p += ln
    ln, p = _read_varint(b, p)
    idx = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_vals].astype(np.int64)
    offs = np.zeros(n_dict + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    dictionary = pa.Array.from_buffers(
        pa.large_binary(), n_dict, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(blob)]
    ).cast(pa.string())
    return pc.take(dictionary, pa.array(idx, type=pa.int64()))


def encode_ints(values: np.ndarray) -> bytes:
    """Dictionary-encode an int64 array (low-cardinality token/label streams)."""
    v = np.asarray(values, dtype=np.int64)
    dict_arr = pc.dictionary_encode(pa.array(v))
    dictionary = dict_arr.dictionary.to_numpy(zero_copy_only=False).astype(np.int64)
    indices = dict_arr.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    head, _ = varint_encode_unsigned(np.array([len(dictionary), len(v)], dtype=np.uint64))
    parts = [head]
    parts += _lp(rle_v2.encode(dictionary, signed=True))
    parts += _lp(rle_v2.encode(indices, signed=False))
    return b"".join(parts)


def decode_ints(buf: bytes) -> np.ndarray:
    b = np.frombuffer(buf, dtype=np.uint8)
    p = 0
    n_dict, p = _read_varint(b, p)
    n_vals, p = _read_varint(b, p)
    ln, p = _read_varint(b, p)
    dictionary = rle_v2.decode(b[p : p + ln].tobytes(), signed=True)[:n_dict]
    p += ln
    ln, p = _read_varint(b, p)
    idx = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_vals].astype(np.int64)
    return dictionary[idx]


def value_counts_ints(buf: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Histogram ``(values, counts)`` straight from a dict_int stream: the
    dictionary IS the distinct-value set and counts are a bincount of the
    index stream — the values never gather (aggregate pushdown; pairs are
    already unique). Multiset-identical to ``decode_ints`` (pinned)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    p = 0
    n_dict, p = _read_varint(b, p)
    n_vals, p = _read_varint(b, p)
    ln, p = _read_varint(b, p)
    dictionary = rle_v2.decode(b[p : p + ln].tobytes(), signed=True)[:n_dict]
    p += ln
    ln, p = _read_varint(b, p)
    idx = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_vals].astype(np.int64)
    counts = np.bincount(idx, minlength=len(dictionary)).astype(np.int64)
    keep = counts > 0  # pyarrow dictionary_encode emits only used values, but stay safe
    v, c = dictionary[keep].astype(np.int64), counts[keep]
    order = np.argsort(v, kind="stable")  # dict is first-occurrence order; sort the contract
    return v[order], c[order]


def value_counts_strings(buf: bytes) -> tuple[list[bytes], np.ndarray]:
    """Value histogram of a dict-encoded string stream WITHOUT gathering
    per-row strings (the ORC-side orc_string_value_counts rule, applied to
    the native container): the index stream folds at RUN level
    (``rle_v2.decode_runs``) into a bincount over dictionary slots; only
    the (tiny) dictionary materializes. Returns (dict entry bytes, counts)
    for slots with count > 0, in first-occurrence dictionary order."""
    b = np.frombuffer(buf, dtype=np.uint8)
    p = 0
    n_dict, p = _read_varint(b, p)
    n_vals, p = _read_varint(b, p)
    ln, p = _read_varint(b, p)
    lens = rle_v2.decode(b[p : p + ln].tobytes(), signed=False)[:n_dict].astype(np.int64)
    p += ln
    ln, p = _read_varint(b, p)
    blob = b[p : p + ln].tobytes()
    p += ln
    ln, p = _read_varint(b, p)
    iv, ic = rle_v2.decode_runs(b[p : p + ln].tobytes(), signed=False)
    counts = np.zeros(n_dict, np.int64)
    np.add.at(counts, iv.astype(np.int64), ic)
    assert int(counts.sum()) == n_vals, "index stream length drift"
    offs = np.zeros(n_dict + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    entries = [blob[offs[i] : offs[i + 1]] for i in range(n_dict)]
    keep = counts > 0
    return [e for e, k in zip(entries, keep) if k], counts[keep]
