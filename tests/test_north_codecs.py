"""Round-trip property tests for the north-rule codecs (FIXTURES.md F4):
rle_v2 (short-repeat/direct/patched-base/delta), bitpack, frame-of-reference,
dictionary, FSST."""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_ray.codecs import bitpack, dictionary, frame_of_reference as for_, fsst, rle_v2

rng = np.random.default_rng(123)


def _int_cases():
    return [
        ("empty", np.zeros(0, np.int64)),
        ("single", np.array([-7], np.int64)),
        ("pair", np.array([3, 9], np.int64)),
        ("all_equal_5", np.full(5, 42, np.int64)),
        ("all_equal_600", np.full(600, -3, np.int64)),
        ("asc_delta", np.arange(2000, dtype=np.int64) * 7 + 11),
        ("desc_delta", np.arange(2000, 0, -1, dtype=np.int64) * 3),
        ("monotonic_jitter", np.sort(rng.integers(0, 10**9, 1000)).astype(np.int64)),
        ("tight_range", rng.integers(0, 16, 3000).astype(np.int64)),
        ("patched_outliers", np.where(rng.random(2000) < 0.01, 2**40, rng.integers(0, 512, 2000)).astype(np.int64)),
        ("high_card", rng.integers(-(2**62), 2**62, 3000).astype(np.int64)),
        ("zipf_tokens", (rng.zipf(1.3, 5000) % 50257).astype(np.int64)),
        ("extremes", np.array([np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max] * 7, np.int64)),
        ("alternating", np.array([0, 1] * 600, np.int64)),
        ("bounds_511_513", rng.integers(0, 100, 513).astype(np.int64)),
        ("desc_zero_first", np.array([5, 5, 4, 3, 2, 1, 1, 0] * 10, np.int64)),
    ]


@pytest.mark.parametrize("name,arr", _int_cases())
def test_rle_v2_roundtrip(name, arr):
    for signed in (True, False):
        a = arr if signed else arr.astype(np.uint64)
        enc = rle_v2.encode(a, signed=signed)
        dec = rle_v2.decode(enc, signed=signed)
        np.testing.assert_array_equal(dec, a, err_msg=f"{name} signed={signed}")


def test_rle_v2_compresses_patterns():
    # constant -> ~4 bytes per 512 chunk; ascending -> delta; tight -> direct small
    assert len(rle_v2.encode(np.full(512, 1000, np.int64))) < 10
    assert len(rle_v2.encode(np.arange(512, dtype=np.int64))) < 12
    tight = rng.integers(0, 16, 512).astype(np.int64)
    assert len(rle_v2.encode(tight)) < 512 * 8 / 8  # <= ~5 bits/val + header


def test_rle_v2_random_sweep():
    for trial in range(25):
        n = int(rng.integers(0, 1200))
        kind = trial % 4
        if kind == 0:
            a = rng.integers(-100, 100, n).astype(np.int64)
        elif kind == 1:
            a = rng.integers(0, 5, n).astype(np.int64).cumsum()
        elif kind == 2:
            a = np.repeat(rng.integers(0, 50, max(n // 8, 1)), 8)[:n].astype(np.int64)
        else:
            a = np.where(rng.random(n) < 0.02, 2**50, rng.integers(0, 1000, n)).astype(np.int64)
        enc = rle_v2.encode(a)
        np.testing.assert_array_equal(rle_v2.decode(enc), a, err_msg=f"trial={trial}")


def test_bitpack_roundtrip():
    for w in (1, 2, 3, 5, 7, 8, 13, 17, 24, 31, 32, 47, 63, 64):
        hi = 2**w - 1
        v = rng.integers(0, hi, 777, dtype=np.uint64) if w < 64 else rng.integers(0, 2**63, 777, dtype=np.uint64) * 2 + 1
        v[v > hi] = hi
        np.testing.assert_array_equal(bitpack.unpack(bitpack.pack(v, w), w, len(v)), v)


def test_frame_of_reference_roundtrip():
    cases = [
        np.zeros(0, np.int64),
        np.array([5], np.int64),
        rng.integers(10**6, 10**6 + 100, 10000).astype(np.int64),
        rng.integers(-(2**40), 2**40, 5000).astype(np.int64),
        (rng.zipf(1.3, 9000) % 50257).astype(np.int64),
    ]
    for a in cases:
        np.testing.assert_array_equal(for_.decode(for_.encode(a)), a)
    # narrow band: near-theoretical size
    narrow = rng.integers(1000, 1128, 8192).astype(np.int64)  # 7-bit span
    assert len(for_.encode(narrow)) < 8192 + 64


def test_dictionary_strings_roundtrip():
    vals = [f"src{i % 8}" for i in range(5000)] + ["", "x" * 300]
    arr = pa.array(vals, type=pa.string())
    enc = dictionary.encode_strings(arr)
    dec = dictionary.decode_strings(enc)
    assert dec.to_pylist() == vals
    assert len(enc) < 6000  # low-cardinality wins big


def test_dictionary_ints_roundtrip():
    v = rng.integers(0, 30, 20000).astype(np.int64) * 1000003
    enc = dictionary.encode_ints(v)
    np.testing.assert_array_equal(dictionary.decode_ints(enc), v)
    assert len(enc) < len(v)  # ~5 bits/value


def _str_block(strings):
    concat = np.frombuffer(b"".join(s.encode() for s in strings), dtype=np.uint8)
    offs = np.zeros(len(strings) + 1, dtype=np.int64)
    np.cumsum([len(s.encode()) for s in strings], out=offs[1:])
    return concat, offs


@pytest.mark.parametrize(
    "strings",
    [
        [],
        [""],
        ["", "", ""],
        ["hello"],
        [f"web/{i//100:04d}/doc-{i:08d}" for i in range(2000)],
        ["the quick brown fox"] * 100 + ["jumps over the lazy dog"] * 100,
        ["ünïcödé\x00bytes", "\xff" * 10, "mixed ascii"],
    ],
)
def test_fsst_roundtrip(strings):
    concat, offs = _str_block(strings)
    enc = fsst.encode(concat, offs)
    out, out_offs = fsst.decode(enc)
    np.testing.assert_array_equal(out, concat)
    np.testing.assert_array_equal(out_offs, offs)


def test_fsst_compresses_shared_prefixes():
    strings = [f"web/{i//100:04d}/doc-{i:08d}" for i in range(5000)]
    concat, offs = _str_block(strings)
    enc = fsst.encode(concat, offs)
    assert len(enc) < len(concat) * 0.6, (len(enc), len(concat))


def test_fsst_escape_path():
    # train on ascii, then encode bytes outside the sample -> escape pairs
    strings = ["aaaa"] * 300
    concat, offs = _str_block(strings)
    table = fsst.train(concat, offs)
    odd = np.frombuffer(b"\xf7\xf8\xff\xff\x00zz", dtype=np.uint8)
    offs2 = np.array([0, len(odd)], dtype=np.int64)
    enc = fsst.encode(odd, offs2, table=table)
    out, oo = fsst.decode(enc)
    np.testing.assert_array_equal(out, odd)
