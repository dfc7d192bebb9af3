"""Per-partition codec auto-selection by sampled size estimation.

North-rule component. Generalizes the reference's only adaptive decision —
the per-block compressed-vs-original fallback
(reference: src/writer/compression.rs:146-158) — into a menu selector: sample
the stream, actually encode the sample with every applicable codec,
extrapolate bytes/value, pick the argmin. The chosen codec name is recorded
in the stripe header and the partition lineage record.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import dictionary, frame_of_reference, fsst, int_rle_v1, rle_v2
from .varint import varint_encode_unsigned
from . import bitpack as bitpack_mod

SAMPLE_VALUES = 4096
SAMPLE_STRINGS = 1024

# ---------------------------------------------------------------- int codecs


def _bitpack_encode(v: np.ndarray) -> bytes:
    """Plain fixed-width bit-packing of zigzag values (menu entry 'bitpack')."""
    x = np.asarray(v, dtype=np.int64)
    zz = (x.astype(np.uint64) << np.uint64(1)) ^ (x >> np.int64(63)).astype(np.uint64)
    w = bitpack_mod.bit_width(int(zz.max())) if len(zz) else 1
    head, _ = varint_encode_unsigned(np.array([len(zz)], dtype=np.uint64))
    return head + bytes([w]) + bitpack_mod.pack(zz, w)


def _bitpack_decode(b: bytes) -> np.ndarray:
    buf = np.frombuffer(b, dtype=np.uint8)
    n = 0
    p = 0
    shift = 0
    while True:
        byte = int(buf[p])
        p += 1
        n |= (byte & 0x7F) << shift
        if byte < 0x80:
            break
        shift += 7
    w = int(buf[p])
    p += 1
    zz = bitpack_mod.unpack(buf[p:], w, n)
    return (zz >> np.uint64(1)).astype(np.int64) ^ -((zz & np.uint64(1)).astype(np.int64))


INT_CODECS = {
    "rle_v1": (lambda v: int_rle_v1.encode(v, signed=True), lambda b: int_rle_v1.decode(b, signed=True)),
    "rle_v2": (lambda v: rle_v2.encode(v, signed=True), lambda b: rle_v2.decode(b, signed=True)),
    "for": (frame_of_reference.encode, frame_of_reference.decode),
    "bitpack": (_bitpack_encode, _bitpack_decode),
    "dict_int": (dictionary.encode_ints, dictionary.decode_ints),
}


_NON_DEFAULT_INT = set()  # decodable always, selected only by explicit menu


def register_int_codec(name: str, encode_fn, decode_fn, selectable: bool = True) -> None:
    """Extension surface (parity with the reference's pluggable
    CompressionTrait, reference src/writer/compression/common.rs:6-14):
    registered codecs join the auto-selection menu and stripe decode.
    ``selectable=False`` registers decode/encode WITHOUT joining the
    default menu (archival-tier codecs like rANS: best-in-class sizes but
    the wrong decode-speed trade for the hot path — callers opt in via
    ``menu=ARCHIVE_INT_MENU``)."""
    INT_CODECS[name] = (encode_fn, decode_fn)
    if not selectable:
        _NON_DEFAULT_INT.add(name)
    else:
        _NON_DEFAULT_INT.discard(name)


def register_string_codec(name: str, encode_fn, decode_fn) -> None:
    STRING_CODECS[name] = (encode_fn, decode_fn)


def _sample_ints(v: np.ndarray, k: int = SAMPLE_VALUES) -> np.ndarray:
    n = len(v)
    if n <= k:
        return v
    # head + tail + strided middle: catches sortedness, runs and outliers
    h = k // 4
    stride = max(1, (n - 2 * h) // (k - 2 * h))
    return np.concatenate([v[:h], v[h : n - h : stride][: k - 2 * h], v[n - h :]])


_est_codec = None


def _post_compression_size(b: bytes) -> int:
    """Estimated on-disk size: streams are zstd-framed downstream, so rank
    codecs by compressed size (matches the actual minimization target)."""
    global _est_codec
    if _est_codec is None:
        _est_codec = pa.Codec("zstd", compression_level=3)
    if len(b) < 64:
        return len(b)
    return min(len(b), len(_est_codec.compress(b)))


def select_int_codec(v: np.ndarray, menu: list[str] | None = None) -> str:
    """Pick the int codec minimizing estimated post-compression bytes on a sample."""
    menu = menu or [n for n in INT_CODECS if n not in _NON_DEFAULT_INT]
    if len(v) == 0:
        return "rle_v2"
    s = _sample_ints(np.asarray(v))  # keep native width for the fast paths
    best_name, best_size = None, None
    for name in menu:
        enc, _ = INT_CODECS[name]
        try:
            size = _post_compression_size(enc(s))
        except Exception:
            continue
        if best_size is None or size < best_size:
            best_name, best_size = name, size
    return best_name or "rle_v2"


def encode_ints(v: np.ndarray, codec: str) -> bytes:
    # native width passes through: each codec coerces only if it needs to,
    # and rle_v1 has a 32-bit-wide fast path for int32 token streams
    return INT_CODECS[codec][0](np.asarray(v))


def decode_ints(b: bytes, codec: str) -> np.ndarray:
    return INT_CODECS[codec][1](b)


# ------------------------------------------------------------- string codecs
# String codecs work on (concat uint8 buffer, int64 offsets) blocks.


def _direct_encode(concat: np.ndarray, offs: np.ndarray) -> bytes:
    lens = np.diff(offs).astype(np.uint64)
    ls = rle_v2.encode(lens, signed=False)
    head, _ = varint_encode_unsigned(np.array([len(offs) - 1, len(ls)], dtype=np.uint64))
    return head + ls + concat.tobytes()


def _direct_decode(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    buf = np.frombuffer(b, dtype=np.uint8)
    vals = []
    p = 0
    for _ in range(2):
        z = 0
        shift = 0
        while True:
            byte = int(buf[p])
            p += 1
            z |= (byte & 0x7F) << shift
            if byte < 0x80:
                break
            shift += 7
        vals.append(z)
    n, ls_len = vals
    lens = rle_v2.decode(buf[p : p + ls_len].tobytes(), signed=False)[:n].astype(np.int64)
    p += ls_len
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    return buf[p:].copy(), offs


def _dict_encode(concat: np.ndarray, offs: np.ndarray) -> bytes:
    arr = pa.Array.from_buffers(
        pa.large_binary(), len(offs) - 1, [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(concat.tobytes())]
    ).cast(pa.string())
    return dictionary.encode_strings(arr)


def _dict_decode(b: bytes) -> tuple[np.ndarray, np.ndarray]:
    arr = dictionary.decode_strings(b)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = arr.cast(pa.large_binary())
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64)[arr.offset : arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)[offs[0] : offs[-1]].copy()
    offs = (offs - offs[0]).copy()
    return data, offs


STRING_CODECS = {
    "direct": (_direct_encode, _direct_decode),
    "dict": (_dict_encode, _dict_decode),
    "fsst": (lambda c, o: fsst.encode(c, o), fsst.decode),
}


def _sample_strings(concat: np.ndarray, offs: np.ndarray, k: int = SAMPLE_STRINGS):
    n = len(offs) - 1
    if n <= k:
        return concat, offs
    stride = max(1, n // k)
    idx = np.arange(0, n, stride)[:k]
    lens = (offs[idx + 1] - offs[idx]).astype(np.int64)
    new_offs = np.zeros(len(idx) + 1, dtype=np.int64)
    np.cumsum(lens, out=new_offs[1:])
    gather = np.repeat(offs[idx], lens) + (np.arange(int(lens.sum())) - np.repeat(new_offs[:-1], lens))
    return concat[gather], new_offs


def select_string_codec(concat: np.ndarray, offs: np.ndarray, menu: list[str] | None = None) -> str:
    menu = menu or list(STRING_CODECS)
    n = len(offs) - 1
    if n == 0:
        return "direct"
    sc, so = _sample_strings(concat, offs)
    best_name, best_size = None, None
    for name in menu:
        enc, _ = STRING_CODECS[name]
        try:
            size = _post_compression_size(enc(sc, so))
        except Exception:
            continue
        if best_size is None or size < best_size:
            best_name, best_size = name, size
    return best_name or "direct"


def encode_strings(concat: np.ndarray, offs: np.ndarray, codec: str) -> bytes:
    return STRING_CODECS[codec][0](concat, offs)


def decode_strings(b: bytes, codec: str) -> tuple[np.ndarray, np.ndarray]:
    return STRING_CODECS[codec][1](b)


# -------------------------------------------------------------- float codecs
# Float codecs work on little-endian fixed-width numeric arrays. Like the
# int/string menus the decision metric is POST-compression size (byte-stream
# split is size-neutral raw; all its win appears under zstd).

from . import byte_split as _byte_split
from . import dec_scale as _dec_scale
from . import xor_split as _xor_split


def _raw_float_encode(v: np.ndarray) -> bytes:
    a = np.ascontiguousarray(v)
    code = _byte_split._DTYPE_CODES.get(a.dtype.newbyteorder("<"))
    if code is None:
        raise ValueError(f"raw float codec: unsupported dtype {a.dtype}")
    head, _ = varint_encode_unsigned(np.array([len(a)], dtype=np.uint64))
    return bytes(head) + bytes([code]) + a.tobytes()


def _raw_float_decode(b: bytes) -> np.ndarray:
    buf = np.frombuffer(b, dtype=np.uint8)
    n = 0
    p = 0
    shift = 0
    while True:
        byte = int(buf[p])
        p += 1
        n |= (byte & 0x7F) << shift
        if byte < 0x80:
            break
        shift += 7
    dtype = _byte_split._CODE_DTYPES[int(buf[p])]
    p += 1
    return np.frombuffer(b, dtype=dtype, count=n, offset=p)


from . import rans as _rans

register_int_codec(
    "rans",
    lambda v: _rans.encode(v, signed=True),
    lambda b: _rans.decode(b, signed=True),
    selectable=False,
)

def archive_int_menu() -> list[str]:
    """The cold-tier menu: every default codec plus rANS entropy coding
    (rANS wins high-entropy token streams by ~10-35% post-zstd, at
    ~5 M values/s decode; see codecs/rans.py)."""
    return list(INT_CODECS)


def select_archive_int_codec(v: np.ndarray) -> str:
    """Cold-tier codec pick: post-zstd argmin over the FULL column (no
    sampling). Table-bearing codecs (rANS) amortize their symbol table
    over the whole column, so a small sample systematically undercounts
    them — and archival writes can afford one full trial encode per menu
    entry."""
    v = np.asarray(v)
    if len(v) == 0:
        return "rle_v2"
    best_name, best_size = None, None
    for name in archive_int_menu():
        enc, _ = INT_CODECS[name]
        try:
            size = _post_compression_size(enc(v))
        except Exception:
            continue
        if best_size is None or size < best_size:
            best_name, best_size = name, size
    return best_name or "rle_v2"


FLOAT_CODECS = {
    "raw": (_raw_float_encode, _raw_float_decode),
    "byte_split": (_byte_split.encode, _byte_split.decode),
    "xor_split": (_xor_split.encode, _xor_split.decode),
    "dec_scale": (_dec_scale.encode, _dec_scale.decode),
}


def register_float_codec(name: str, encode_fn, decode_fn) -> None:
    FLOAT_CODECS[name] = (encode_fn, decode_fn)


def _sample_runs(v: np.ndarray, k: int = SAMPLE_VALUES) -> np.ndarray:
    """Three CONTIGUOUS runs (head/middle/tail) instead of the int menu's
    strided sample: delta-family codecs (xor_split) win on value ADJACENCY,
    which a stride destroys — a strided sample would never pick them even
    on a perfectly smooth series. Contiguous runs keep both signals: the
    run interiors show adjacency, the three distinct regions show drift."""
    n = len(v)
    if n <= k:
        return v
    r = k // 3
    mid = (n - r) // 2
    return np.concatenate([v[:r], v[mid : mid + r], v[n - r :]])


def select_float_codec(v: np.ndarray, menu: list[str] | None = None) -> str:
    """Pick the float codec minimizing estimated post-compression bytes on
    a contiguous head/middle/tail run sample (adjacency-preserving — see
    :func:`_sample_runs`; decision metric is post-zstd like every menu)."""
    menu = menu or list(FLOAT_CODECS)
    if len(v) == 0:
        return "raw"
    s = _sample_runs(np.asarray(v))
    best_name, best_size = None, None
    for name in menu:
        enc, _ = FLOAT_CODECS[name]
        try:
            size = _post_compression_size(enc(s))
        except Exception:
            continue
        if best_size is None or size < best_size:
            best_name, best_size = name, size
    return best_name or "raw"


def encode_floats(v: np.ndarray, codec: str) -> bytes:
    return FLOAT_CODECS[codec][0](np.asarray(v))


def decode_floats(b: bytes, codec: str) -> np.ndarray:
    return FLOAT_CODECS[codec][1](b)
