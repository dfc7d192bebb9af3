"""Stripe container round-trip tests: encode_table -> decode_stripe equality,
covering the reference demo writer's 13-type schema (FIXTURES.md F3) and the
north-rule tokens table shape (F1)."""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_ray import stripe

rng = np.random.default_rng(42)


def _roundtrip(tbl: pa.Table):
    blob, meta = stripe.encode_table(tbl)
    out = stripe.decode_stripe(blob)
    assert out.schema == tbl.schema, f"\n{out.schema}\nvs\n{tbl.schema}"
    assert out.equals(tbl), "data mismatch"
    return blob, meta


def test_tokens_table_roundtrip():
    n = 2000
    lens = np.clip(rng.zipf(1.5, n), 1, 500)
    tokens = [rng.integers(0, 50257, k).astype(np.int32) for k in lens]
    tbl = pa.table(
        {
            "doc_id": [f"web/{i//100:04d}/doc-{i:08d}" for i in range(n)],
            "tokens": pa.array([t.tolist() for t in tokens], type=pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32), type=pa.int32()),
            "source": pa.array([["web", "books", "code"][i % 3] for i in range(n)]),
        }
    )
    blob, meta = _roundtrip(tbl)
    raw = sum(len(t) * 4 for t in tokens)
    assert meta["encoded_bytes"] < raw * 1.1  # tokens dominate; should compress
    assert meta["codecs"]["source"]["DATA"] == "dict"


def test_tokens_edge_rows():
    tbl = pa.table(
        {
            "doc_id": ["a", "b", "c", "d"],
            "tokens": pa.array([[], [7], None, list(range(1000))], type=pa.list_(pa.int32())),
            "n_tok": pa.array([0, 1, None, 1000], type=pa.int32()),
            "source": ["w", None, "w", "x"],
        }
    )
    _roundtrip(tbl)


def test_all_types_roundtrip():
    # mirror of the reference demo schema (reference src/bin/test_writer.rs:9-23)
    n = 500
    x = rng.integers(-(2**40), 2**40, n)
    y = [int(v) if i % 7 else None for i, v in enumerate(rng.integers(0, 100, n))]
    z = [f"hello {i//3}" for i in range(n)]
    a = rng.random(n)
    b = rng.random(n).astype(np.float32)
    c = rng.integers(0, 20000, n).astype(np.int32)
    d = rng.integers(0, 2, n).astype(bool)
    e = [None if i % 13 == 0 else f"{rng.integers(0, 10**13) / 100:.2f}" for i in range(n)]
    f = [[int(j) for j in rng.integers(0, 1000, 3)] for _ in range(n)]
    g = [[(f"k{j}", bool(j % 2)) for j in range(2)] for _ in range(n)]
    h = [1420070400_000_000_000 + int(i) * 1_000_000_000 + 10 ** (i % 9) for i in range(n)]
    i_col = [b"abc"] * n

    import decimal

    tbl = pa.table(
        {
            "x": pa.array(x, type=pa.int64()),
            "y": pa.array(y, type=pa.int64()),
            "z": pa.array(z),
            "a": pa.array(a, type=pa.float64()),
            "b": pa.array(b, type=pa.float32()),
            "c": pa.array(c, type=pa.date32()),
            "d": pa.array(d),
            "e": pa.array([None if v is None else decimal.Decimal(v) for v in e], type=pa.decimal128(15, 2)),
            "f": pa.array(f, type=pa.list_(pa.int64())),
            "g": pa.array(g, type=pa.map_(pa.string(), pa.bool_())),
            "h": pa.array(h, type=pa.timestamp("ns")),
            "i": pa.array(i_col, type=pa.binary()),
        }
    )
    _roundtrip(tbl)


def test_struct_roundtrip():
    n = 300
    tbl = pa.table(
        {
            "s": pa.array(
                [None if i % 11 == 0 else {"u": int(i), "v": f"s{i%5}"} for i in range(n)],
                type=pa.struct([pa.field("u", pa.int64()), pa.field("v", pa.string())]),
            )
        }
    )
    _roundtrip(tbl)


def test_union_roundtrip():
    ints = pa.array([10, 20, 30], type=pa.int64())
    floats = pa.array([1.5, 2.5], type=pa.float32())
    types = pa.array([0, 1, 0, 1, 0], type=pa.int8())
    offsets = pa.array([0, 0, 1, 1, 2], type=pa.int32())
    arr = pa.UnionArray.from_dense(types, offsets, [ints, floats], ["i", "f"], [0, 1])
    tbl = pa.table({"u": arr})
    _roundtrip(tbl)


def test_nulls_heavy():
    n = 1000
    vals = [None if rng.random() < 0.5 else int(v) for v in rng.integers(0, 100, n)]
    svals = [None if rng.random() < 0.5 else f"v{v}" for v in rng.integers(0, 10, n)]
    tbl = pa.table({"i": pa.array(vals, type=pa.int32()), "s": pa.array(svals)})
    _roundtrip(tbl)


def test_all_null_and_empty():
    tbl = pa.table({"i": pa.array([None, None, None], type=pa.int64()), "s": pa.array([None, None, None], type=pa.string())})
    _roundtrip(tbl)
    empty = pa.table({"i": pa.array([], type=pa.int64()), "s": pa.array([], type=pa.string())})
    _roundtrip(empty)


def test_nested_list_of_list():
    tbl = pa.table({"ll": pa.array([[[1, 2], [3]], [], None, [[], [4, 5, 6]]], type=pa.list_(pa.list_(pa.int32())))})
    _roundtrip(tbl)


def test_compression_framing_effective():
    n = 20000
    tbl = pa.table({"t": pa.array([list(rng.integers(0, 100, 50))] * 1, type=pa.list_(pa.int32()))})
    data = pa.table({"v": pa.array(np.repeat(rng.integers(0, 5, n // 10), 10).astype(np.int64))})
    blob, meta = stripe.encode_table(data)
    assert len(blob) < n  # runny data compresses far below 8 B/row
    out = stripe.decode_stripe(blob)
    assert out.equals(data)


def test_row_index_stride_roundtrip_and_seek():
    """Row-indexed stripes: full decode identical; ranged decode touches only
    covering chunks; column projection works (reference common.rs:24-48 parity)."""
    n = 5000
    lens = np.clip(rng.zipf(1.5, n), 1, 80)
    tbl = pa.table(
        {
            "doc_id": [f"d{i:06d}" for i in range(n)],
            "tokens": pa.array([list(map(int, rng.integers(0, 50257, k))) for k in lens], type=pa.list_(pa.int32())),
            "n_tok": pa.array(lens.astype(np.int32)),
            "source": pa.array([["a", "b"][i % 2] for i in range(n)]),
        }
    )
    blob, meta = stripe.encode_table(tbl, row_index_stride=1000)
    out = stripe.decode_stripe(blob)
    assert out.equals(tbl)
    # ranged decode across chunk boundaries
    for lo, hi in [(0, 10), (995, 1005), (2500, 4200), (4990, 5000), (0, 5000)]:
        part = stripe.decode_stripe(blob, row_range=(lo, hi))
        assert part.equals(tbl.slice(lo, hi - lo)), (lo, hi)
    # column projection
    proj = stripe.decode_stripe(blob, columns=["n_tok", "doc_id"])
    assert proj.schema.names == ["doc_id", "n_tok"]
    assert proj["n_tok"].to_pylist() == tbl["n_tok"].to_pylist()
    # projection + range together
    pr = stripe.decode_stripe(blob, columns=["n_tok"], row_range=(1500, 1600))
    assert pr["n_tok"].to_pylist() == tbl["n_tok"].slice(1500, 100).to_pylist()
    # size overhead vs unchunked stays modest
    blob0, _ = stripe.encode_table(tbl)
    assert len(blob) < len(blob0) * 1.35, (len(blob), len(blob0))


def test_row_index_with_nulls_and_config():
    n = 3000
    vals = [None if i % 7 == 0 else int(i) for i in range(n)]
    tbl = pa.table({"v": pa.array(vals, type=pa.int64()), "s": pa.array([None if i % 11 == 0 else f"s{i%5}" for i in range(n)])})
    cfg = stripe.EncoderConfig(row_index_stride=500)
    blob, _ = stripe.encode_table(tbl, config=cfg)
    assert stripe.decode_stripe(blob).equals(tbl)
    part = stripe.decode_stripe(blob, row_range=(499, 1501))
    assert part.equals(tbl.slice(499, 1002))


def test_snappy_compression_roundtrip():
    n = 5000
    tbl = pa.table({"v": pa.array(np.repeat(rng.integers(0, 9, n // 10), 10).astype(np.int64)), "s": pa.array([f"s{i%7}" for i in range(n)])})
    blob, meta = stripe.encode_table(tbl, compression="snappy")
    assert stripe.decode_stripe(blob).equals(tbl)
    blob_none, _ = stripe.encode_table(tbl, compression="none")
    assert stripe.decode_stripe(blob_none).equals(tbl)


def test_uint64_extremes_roundtrip():
    tbl = pa.table({"u": pa.array([0, 2**63, 2**64 - 1, 5, None], type=pa.uint64())})
    blob, _ = stripe.encode_table(tbl)
    assert stripe.decode_stripe(blob).equals(tbl)
    from orc_format_ray import stats as st

    s = st.compute(tbl["u"].combine_chunks())
    assert s.max == 2**64 - 1 and s.min == 0
    assert s.sum is None  # exceeds int64 -> overflow semantics


def test_map_with_nulls_roundtrip():
    """ADVICE r1 (high): nulls must land on the right map rows, incl. a null
    final row (MapArray.from_arrays' null-offset convention cannot express
    either)."""
    mt = pa.map_(pa.string(), pa.int64())
    for rows in (
        [None, [("a", 1)], [("b", 2), ("c", 3)], [("d", 4)]],
        [[("a", 1)], None, [("b", 2), ("c", 3)], [("d", 4)]],
        [[("a", 1)], [("b", 2)], None],
        [None, None, None],
        [[], None, [("x", 9)], None],
    ):
        tbl = pa.table({"m": pa.array(rows, type=mt)})
        blob, _ = stripe.encode_table(tbl)
        out = stripe.decode_stripe(blob)
        out["m"].combine_chunks().validate(full=True)
        assert out.equals(tbl), rows


def test_timestamp_far_from_epoch_roundtrip():
    """ADVICE r1 (medium): unit-s/ms values beyond ±292 years of epoch must
    not wrap through an intermediate ns multiply."""
    for unit in ("s", "ms", "us", "ns"):
        vals = [0, 1, -1, 2**40, -(2**40), 2**60 if unit in ("s", "ms") else 2**62, None]
        tbl = pa.table({"t": pa.array(vals, type=pa.timestamp(unit))})
        blob, _ = stripe.encode_table(tbl)
        assert stripe.decode_stripe(blob).equals(tbl), unit


def test_timestamp_stats_floor_pre_epoch():
    """Reference timestamp.rs:131: epoch-ms = floored seconds * 1000 + positive
    nanos -> floor(total ms), so -1.5 ms is -2, not -1."""
    from orc_format_ray import stats as st

    arr = pa.array([-1500, 1500, -1], type=pa.timestamp("us"))
    s = st.compute(arr)
    assert s.min == -2 and s.max == 1


def test_decimal_fast_path_bit_identical():
    """VERDICT r1 #7: the vectorized int64-limb decimal encoder must produce
    the exact bytes of the bigint reference path."""
    from decimal import Decimal

    from orc_format_ray.codecs.varint import varint_encode_bigint
    from orc_format_ray.stripe import encode_decimal_stream

    vals = [Decimal("0.00"), Decimal("1.23"), Decimal("-1.23"), Decimal("92233720368547758.07"),
            Decimal("-92233720368547758.08"), Decimal("55.55")]
    arr = pa.array(vals, type=pa.decimal128(20, 2))
    ints = [int(v.scaleb(2)) for v in vals]
    assert encode_decimal_stream(arr) == varint_encode_bigint(ints)


def test_decimal_beyond_int64_roundtrip():
    from decimal import Decimal

    # unscaled > 2^63 but < 28 digits (beyond that, Decimal's default context
    # precision rounds during conversions — the retired as_py().scaleb() path
    # silently hit this; the limb path is exact for all 38 digits)
    big = Decimal("12345678901234567890123.45")
    vals = [big, None, -big, Decimal("0.01")]
    tbl = pa.table({"d": pa.array(vals, type=pa.decimal128(38, 2))})
    for stride in (None, 2):
        blob, _ = stripe.encode_table(tbl, row_index_stride=stride)
        assert stripe.decode_stripe(blob).equals(tbl), stride


def test_decimal_nulls_vectorized_decode():
    from decimal import Decimal

    vals = [None if i % 3 == 0 else Decimal(i).scaleb(-2) for i in range(5000)]
    tbl = pa.table({"d": pa.array(vals, type=pa.decimal128(18, 2))})
    blob, _ = stripe.encode_table(tbl)
    out = stripe.decode_stripe(blob)
    out["d"].combine_chunks().validate(full=True)
    assert out.equals(tbl)
