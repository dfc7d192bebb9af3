"""Exact-byte gold vectors ported from the reference encoder unit tests.

Every expected byte string below is copied verbatim from the reference test
suites (file:line cited per case) — these pin bit-level conformance of the
parity codecs (SURVEY.md §5.2-1, FIXTURES.md F2).
"""

import numpy as np
import pytest

from orc_format_ray.codecs import byte_rle, boolean_rle, int_rle_v1, varint


# reference: src/writer/encoder/byte_rle.rs:106-128
BYTE_RLE_CASES = [
    ([], []),
    ([10], [255, 10]),
    ([10, 20, 30], [253, 10, 20, 30]),
    ([10, 10, 10], [0, 10]),
    ([10, 20, 20, 20, 20], [255, 10, 1, 20]),
    ([10, 10, 10, 10, 10, 20, 30], [2, 10, 254, 20, 30]),
    ([10, 20, 20, 30], [252, 10, 20, 20, 30]),
    ([10] * 131, [127, 10, 255, 10]),
    (list(range(140)), [128] + list(range(128)) + [244] + list(range(128, 140))),
]

# reference: src/writer/encoder/int_rle_v1.rs:165-184
SIGNED_RLE_CASES = [
    ([], []),
    ([10], [255, 20]),
    ([0, -1, 1, -2, 2], [251, 0, 1, 2, 3, 4]),
    ([10, 10, 10, 10], [1, 0, 20]),
    ([10, 15, 20, 25], [1, 5, 20]),
    ([10, 15, 20, 25, 0], [1, 5, 20, 255, 0]),
]

# reference: src/writer/encoder/int_rle_v1.rs:186-200
UNSIGNED_RLE_CASES = [
    ([7] * 100, [97, 0, 7]),
]

# reference: src/writer/encoder/boolean_rle.rs:73-89
BOOLEAN_RLE_CASES = [
    ([], []),
    ([True, False, True, False, True, False, False, False, True], [254, 0b10101000, 0b10000000]),
    ([False] * 80, [7, 0]),
]

# reference: src/writer/encoder/varint.rs:115-134
VARINT_U64_CASES = [
    (0, [0x00]),
    (1, [0x01]),
    (127, [0x7F]),
    (128, [0x80, 0x01]),
    (129, [0x81, 0x01]),
    (16383, [0xFF, 0x7F]),
    (16384, [0x80, 0x80, 0x01]),
    (16385, [0x81, 0x80, 0x01]),
]

# reference: src/writer/encoder/varint.rs:137-152 (zigzag)
VARINT_I64_CASES = [(0, [0]), (-1, [1]), (1, [2]), (-2, [3]), (2, [4])]


@pytest.mark.parametrize("inp,expected", BYTE_RLE_CASES)
def test_byte_rle_gold(inp, expected):
    out = byte_rle.encode(np.array(inp, dtype=np.uint8))
    assert list(out) == expected
    assert byte_rle.encode_slow(inp) == bytes(expected)
    assert list(byte_rle.decode(bytes(expected))) == inp


@pytest.mark.parametrize("inp,expected", SIGNED_RLE_CASES)
def test_signed_int_rle_v1_gold(inp, expected):
    out = int_rle_v1.encode(np.array(inp, dtype=np.int64), signed=True)
    assert list(out) == expected
    assert int_rle_v1.encode_slow(inp, signed=True) == bytes(expected)
    assert list(int_rle_v1.decode(bytes(expected), signed=True)) == inp


@pytest.mark.parametrize("inp,expected", UNSIGNED_RLE_CASES)
def test_unsigned_int_rle_v1_gold(inp, expected):
    out = int_rle_v1.encode(np.array(inp, dtype=np.uint64), signed=False)
    assert list(out) == expected
    assert int_rle_v1.encode_slow(inp, signed=False) == bytes(expected)
    assert list(int_rle_v1.decode(bytes(expected), signed=False)) == inp


@pytest.mark.parametrize("inp,expected", BOOLEAN_RLE_CASES)
def test_boolean_rle_gold(inp, expected):
    out = boolean_rle.encode(np.array(inp, dtype=bool))
    assert list(out) == expected
    assert list(boolean_rle.decode(bytes(expected), len(inp))) == inp


@pytest.mark.parametrize("inp,expected", VARINT_U64_CASES)
def test_varint_u64_gold(inp, expected):
    b, nb = varint.varint_encode_unsigned(np.array([inp], dtype=np.uint64))
    assert list(b) == expected
    assert list(varint.varint_decode_all(b)) == [inp]


@pytest.mark.parametrize("inp,expected", VARINT_I64_CASES)
def test_varint_i64_gold(inp, expected):
    b, nb = varint.varint_encode_signed(np.array([inp], dtype=np.int64))
    assert list(b) == expected
    assert list(varint.varint_decode_signed_all(b)) == [inp]
