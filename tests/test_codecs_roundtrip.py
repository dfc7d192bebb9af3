"""Property tests: fast vectorized encoders == reference-port automatons,
and encode→decode round-trips (FIXTURES.md F4 adversarial shapes)."""

import numpy as np
import pytest

from orc_format_ray.codecs import byte_rle, boolean_rle, int_rle_v1, varint

rng = np.random.default_rng(42)


def _int_cases():
    cases = [
        np.zeros(0, np.int64),
        np.array([5], np.int64),
        np.full(1000, 42, np.int64),
        np.arange(1000, dtype=np.int64),                      # delta +1
        np.arange(1000, 0, -1, dtype=np.int64),               # delta -1
        np.array([1, 2] * 300, np.int64),                     # alternating
        rng.integers(-(2**62), 2**62, 5000).astype(np.int64),  # high-card random
        rng.integers(0, 16, 5000).astype(np.int64),           # tight range
        np.repeat(rng.integers(0, 100, 200), rng.integers(1, 20, 200)).astype(np.int64),  # mixed runs
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max] * 10, np.int64),
    ]
    # boundary lengths around group limits (reference int_rle_v1.rs:51)
    for L in (127, 128, 129, 130, 131, 132, 133, 256, 259, 260, 261):
        cases.append(np.full(L, 7, np.int64))
        cases.append(np.arange(L, dtype=np.int64) * 3)
        cases.append(rng.integers(-1000, 1000, L).astype(np.int64))
    # run exactly at the 128-literal flush boundary (chunk-straddle cases)
    for pad in (125, 126, 127, 128, 129):
        cases.append(np.concatenate([rng.integers(0, 10**9, pad), np.full(10, 3)]).astype(np.int64))
        cases.append(np.concatenate([rng.integers(0, 10**9, pad), np.arange(50) * 5]).astype(np.int64))
    # deltas exactly at the i8 fit boundary
    cases.append(np.arange(20, dtype=np.int64) * 127)
    cases.append(np.arange(20, dtype=np.int64) * 128)
    cases.append(np.arange(20, dtype=np.int64) * -128)
    cases.append(np.arange(20, dtype=np.int64) * -129)
    # interleaved runs/literals stress
    cases.append(np.concatenate([np.full(3, i) if i % 2 else rng.integers(0, 10**6, 4) for i in range(200)]).astype(np.int64))
    return cases


@pytest.mark.parametrize("arr", _int_cases())
def test_int_rle_v1_fast_equals_slow_and_roundtrips(arr):
    for signed in (True, False):
        a = arr if signed else arr.astype(np.uint64)
        fast = int_rle_v1.encode(a, signed=signed)
        slow = int_rle_v1.encode_slow(list(a), signed=signed)
        assert fast == slow, f"signed={signed} len={len(a)}"
        dec = int_rle_v1.decode(fast, signed=signed)
        np.testing.assert_array_equal(dec.astype(a.dtype), a)


def test_int_rle_v1_randomized_sweep():
    for trial in range(30):
        n = int(rng.integers(0, 400))
        # mixture: small alphabet => frequent short runs and delta segments
        a = rng.integers(-5, 5, n).astype(np.int64).cumsum() if trial % 2 else rng.integers(0, 6, n).astype(np.int64)
        fast = int_rle_v1.encode(a, signed=True)
        assert fast == int_rle_v1.encode_slow(list(a), signed=True), f"trial={trial} n={n}"
        np.testing.assert_array_equal(int_rle_v1.decode(fast, signed=True), a)


def _byte_cases():
    cases = [
        np.zeros(0, np.uint8),
        rng.integers(0, 256, 1000).astype(np.uint8),
        rng.integers(0, 3, 1000).astype(np.uint8),
        np.full(1000, 255, np.uint8),
        np.array([1, 1, 2, 2, 3, 3] * 100, np.uint8),
    ]
    for L in (127, 128, 129, 130, 131, 258, 259, 260, 261):
        cases.append(np.full(L, 9, np.uint8))
        cases.append((np.arange(L) % 251).astype(np.uint8))
    for pad in (125, 126, 127, 128, 129):
        cases.append(np.concatenate([rng.integers(0, 250, pad), np.full(10, 3)]).astype(np.uint8))
    return cases


@pytest.mark.parametrize("arr", _byte_cases())
def test_byte_rle_fast_equals_slow_and_roundtrips(arr):
    fast = byte_rle.encode(arr)
    assert fast == byte_rle.encode_slow(list(arr))
    np.testing.assert_array_equal(byte_rle.decode(fast), arr)


def test_byte_rle_randomized_sweep():
    for trial in range(40):
        n = int(rng.integers(0, 500))
        a = rng.integers(0, 4, n).astype(np.uint8)
        fast = byte_rle.encode(a)
        assert fast == byte_rle.encode_slow(list(a)), f"trial={trial} n={n}"
        np.testing.assert_array_equal(byte_rle.decode(fast), a)


def test_boolean_rle_roundtrip():
    for n in (0, 1, 7, 8, 9, 63, 64, 65, 1000):
        a = rng.integers(0, 2, n).astype(bool)
        np.testing.assert_array_equal(boolean_rle.decode(boolean_rle.encode(a), n), a)
    # heavily null-ish patterns (PRESENT streams)
    a = np.ones(10000, bool); a[::97] = False
    np.testing.assert_array_equal(boolean_rle.decode(boolean_rle.encode(a), len(a)), a)


def test_varint_roundtrip_random():
    v = rng.integers(0, 2**63, 10000, dtype=np.uint64) * rng.integers(1, 3, 10000).astype(np.uint64)
    b, nb = varint.varint_encode_unsigned(v)
    np.testing.assert_array_equal(varint.varint_decode_all(b), v)
    s = rng.integers(-(2**62), 2**62, 10000).astype(np.int64)
    b2, _ = varint.varint_encode_signed(s)
    np.testing.assert_array_equal(varint.varint_decode_signed_all(b2), s)


def test_varint_bigint_roundtrip():
    vals = [0, 1, -1, 2**100, -(2**100), (2**127) - 1, -(2**127)]
    b = varint.varint_encode_bigint(vals)
    assert varint.varint_decode_bigint(b, len(vals)) == vals


def test_int32_fast_path_bit_identical():
    """int32 inputs must produce exactly the bytes of the 64-bit automaton,
    including wrap-around deltas that alias small values in 32-bit space."""
    cases = [
        np.array([2**31 - 1, -(2**31), 2**31 - 1, -(2**31)], np.int32),  # d64=±(2^32-1), d32 aliases ∓1
        np.array([-(2**31), 2**31 - 1, -(2**31) + 127], np.int32),
        np.array([0, 2**31 - 1, -(2**31), -1, 1], np.int32),
        np.arange(-300, 300, dtype=np.int32),
        np.full(500, -(2**31), np.int32),
        (rng.zipf(1.3, 20000) % 50257).astype(np.int32),
        rng.integers(-(2**31), 2**31, 5000).astype(np.int32),
        np.array([], np.int32),
        np.array([7], np.int32),
        # wrap at boundary: delta exactly -2^31 / +2^31-ish
        np.array([2**30, -(2**30) - 1, 2**30, -(2**30)], np.int32),
    ]
    for a32 in cases:
        fast = int_rle_v1.encode(a32, signed=True)
        ref = int_rle_v1.encode(a32.astype(np.int64), signed=True)
        assert fast == ref, f"case len={len(a32)}"
        np.testing.assert_array_equal(int_rle_v1.decode(fast, signed=True), a32.astype(np.int64))
    # randomized sweep over small alphabets (heavy runs) at int32 width
    for trial in range(20):
        n = int(rng.integers(0, 600))
        a = rng.integers(-6, 6, n).astype(np.int32).cumsum(dtype=np.int32)
        assert int_rle_v1.encode(a) == int_rle_v1.encode(a.astype(np.int64)), trial


# ------------------------------------------------ run-level decode pushdown


def test_decode_runs_multiset_equals_decode():
    """decode_runs (values, counts) is multiset-identical to full decode on
    boundary lengths, extremes, constant/delta runs, and zipf streams."""
    import numpy as np

    from orc_format_ray.codecs import int_rle_v1

    rng = np.random.default_rng(7)
    cases = [
        np.zeros(0, np.int64),
        np.array([5], np.int64),
        np.full(1000, -3, np.int64),
        np.arange(-500, 500, dtype=np.int64),
        (rng.zipf(1.3, 30000) % 50257).astype(np.int64),
        np.concatenate(
            [np.full(130, 7), np.arange(127, 131), rng.integers(-(2**62), 2**62, 50)]
        ).astype(np.int64),
        rng.integers(0, 3, 10000).astype(np.int64),
    ]
    for signed in (True, False):
        for i, c in enumerate(cases):
            if not signed:
                c = np.abs(c)
            enc = int_rle_v1.encode(c, signed=signed)
            full = int_rle_v1.decode(enc, signed=signed)
            v, n = int_rle_v1.decode_runs(enc, signed=signed)
            assert int(n.sum()) == len(full), (signed, i)
            fv, fc = np.unique(full, return_counts=True)
            uv, inv = np.unique(v, return_inverse=True)
            uc = np.zeros(len(uv), np.int64)
            np.add.at(uc, inv, n)
            assert np.array_equal(fv, uv) and np.array_equal(fc, uc), (signed, i)


def test_decode_runs_collapses_constant_runs():
    import numpy as np

    from orc_format_ray.codecs import int_rle_v1

    c = np.full(10000, 42, np.int64)
    v, n = int_rle_v1.decode_runs(int_rle_v1.encode(c, signed=True), signed=True)
    # 10000 values in <=100 run pairs (130-value max groups): never expanded
    assert len(v) <= 100 and int(n.sum()) == 10000 and set(v.tolist()) == {42}


def test_column_value_counts_stripe_paths():
    """Stripe-level histogram: run-level path (rle_v1, list child) and
    full-decode fallback (nulls / other codecs) both equal brute force,
    chunked and unchunked."""
    import numpy as np
    import pyarrow as pa

    from orc_format_ray.stripe import column_value_counts, encode_table

    rng = np.random.default_rng(3)
    toks = []
    for _ in range(300):
        toks.append(
            np.concatenate(
                [rng.zipf(1.3, 40) % 50257, np.full(rng.integers(1, 50), int(rng.integers(0, 90)))]
            ).astype(np.int32)
        )
    nulls = [None if i % 17 == 0 else int(v) for i, v in enumerate(rng.integers(0, 9, 300))]
    tbl = pa.table(
        {
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "v": pa.array(nulls, pa.int64()),
        }
    )
    brute_t = np.concatenate(toks).astype(np.int64)
    brute_v = np.array([x for x in nulls if x is not None], np.int64)
    for stride in (None, 100):
        blob, _ = encode_table(tbl, row_index_stride=stride)
        for col, brute in (("tokens", brute_t), ("v", brute_v)):
            v, c = column_value_counts(blob, col)
            bv, bc = np.unique(brute, return_counts=True)
            assert np.array_equal(v, bv) and np.array_equal(c, bc), (stride, col)
    import pytest

    with pytest.raises(KeyError):
        column_value_counts(blob, "missing")
    blob2, _ = encode_table(pa.table({"s": pa.array(["a", "b"])}))
    with pytest.raises(ValueError, match="integer leaf"):
        column_value_counts(blob2, "s")


def test_dict_int_value_counts_matches_decode():
    import numpy as np

    from orc_format_ray.codecs import dictionary

    rng = np.random.default_rng(5)
    for case in (
        rng.integers(0, 8, 5000),
        np.full(300, -7),
        (rng.zipf(1.5, 4000) % 100),
        np.array([3], np.int64),
    ):
        v = np.asarray(case, np.int64)
        enc = dictionary.encode_ints(v)
        dv, dc = dictionary.value_counts_ints(enc)
        bv, bc = np.unique(dictionary.decode_ints(enc), return_counts=True)
        assert np.array_equal(dv, bv) and np.array_equal(dc, bc)


def test_column_value_counts_dict_int_path(monkeypatch):
    """Force the selector to dict_int so the stripe-level dict pushdown
    branch (dictionary + index bincount, values never gather) is exercised."""
    import numpy as np
    import pyarrow as pa

    from orc_format_ray.codecs import selector
    from orc_format_ray.stripe import column_value_counts, encode_table, read_header

    monkeypatch.setattr(selector, "select_int_codec", lambda v, menu=None: "dict_int")
    rng = np.random.default_rng(11)
    low = rng.integers(-3, 5, 20000).astype(np.int64)
    blob, _ = encode_table(pa.table({"lab": pa.array(low)}), row_index_stride=4096)
    h, _ = read_header(blob)
    assert h["columns"][0]["encoding"]["DATA"] == "dict_int"
    v, c = column_value_counts(blob, "lab")
    bv, bc = np.unique(low, return_counts=True)
    assert np.array_equal(v, bv) and np.array_equal(c, bc)


def test_rle_v2_decode_runs_multiset_equals_decode():
    """rle_v2.decode_runs preserves the value multiset across every chunk
    mode (short-repeat, direct, patched, constant/arith/general delta)."""
    from orc_format_ray.codecs import rle_v2

    rng = np.random.default_rng(5)
    cases = [
        np.zeros(0, np.int64),
        np.full(1000, 7, np.int64),
        np.arange(2000, dtype=np.int64) * 3 + 11,
        rng.integers(-(10**9), 10**9, 1500),
        np.concatenate(
            [np.full(600, -5), np.arange(100), rng.zipf(1.3, 3000) % 50000]
        ).astype(np.int64),
        np.concatenate([rng.integers(0, 100, 500), np.array([10**14])]).astype(np.int64),
    ]
    for v in cases:
        for signed in (True, False):
            vv = np.abs(v) if not signed else v
            enc = rle_v2.encode(vv, signed=signed)
            rv, rc = rle_v2.decode_runs(enc, signed=signed)
            assert int(rc.sum()) == len(vv)
            got = np.sort(np.repeat(rv, rc).view(np.int64))
            exp = np.sort(np.asarray(rle_v2.decode(enc, signed=signed)).view(np.int64))
            assert np.array_equal(got, exp)


def test_rle_v2_decode_runs_collapses_constant_runs():
    from orc_format_ray.codecs import rle_v2

    c = np.full(5000, 42, np.int64)
    v, n = rle_v2.decode_runs(rle_v2.encode(c, signed=True), signed=True)
    assert len(v) < 50  # 512-value chunks -> ~10 pairs, never 5000
    assert int(n.sum()) == 5000 and (v == 42).all()


def test_stripe_column_int_aggregates_matches_pairs():
    """column_int_aggregates == folds over column_value_counts, across
    rle_v1 / rle_v2 / dict / fallback codecs and list-element columns."""
    import pyarrow as pa

    from orc_format_ray.stripe import (
        column_int_aggregates,
        column_value_counts,
        encode_table,
    )

    rng = np.random.default_rng(9)
    toks = [rng.integers(0, 500, rng.integers(1, 40)).astype(np.int64).tolist()
            for _ in range(400)]
    tbl = pa.table(
        {
            "n_tok": pa.array([len(t) for t in toks], pa.int64()),
            "tokens": pa.array(toks, pa.list_(pa.int64())),
            "const": pa.array(np.full(400, -3, np.int64)),
        }
    )
    blob, _ = encode_table(tbl)
    for col in ("n_tok", "tokens", "const"):
        agg = column_int_aggregates(blob, col)
        v, c = column_value_counts(blob, col)
        exp_vals = np.repeat(v, c)
        assert agg["n"] == len(exp_vals)
        assert agg["sum"] == int(exp_vals.sum())
        assert agg["min"] == int(exp_vals.min()) and agg["max"] == int(exp_vals.max())
    flat = np.concatenate([np.asarray(t) for t in toks])
    assert column_int_aggregates(blob, "tokens")["sum"] == int(flat.sum())
    assert column_int_aggregates(blob, "const") == {
        "n": 400, "sum": -1200, "min": -3, "max": -3}


def test_rans_roundtrip_and_archive_selection():
    """Interleaved static-rANS: exact round-trips across shapes and signs,
    loud on over-capacity alphabets; the archive menu picks it on token
    streams (post-zstd argmin over the FULL column) while the DEFAULT menu
    never does (hot-path decode speed contract)."""
    import zlib

    from orc_format_ray.codecs import int_rle_v1, rans, selector

    rng = np.random.default_rng(5)
    cases = [
        np.zeros(0, np.int64),
        np.array([7], np.int64),
        np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max], np.int64),
        (rng.zipf(1.3, 100_000) % 50257).astype(np.int64),
        rng.integers(-1000, 1000, 50_000),
        np.full(10_000, -3, np.int64),
        rng.integers(0, 2, 30_000),
    ]
    for v in cases:
        assert np.array_equal(rans.decode(rans.encode(v)), v)
    toks = cases[3]
    # the entropy win is real post-compression
    assert len(zlib.compress(rans.encode(toks), 6)) < 0.95 * len(
        zlib.compress(int_rle_v1.encode(toks, signed=True), 6)
    )
    assert selector.select_int_codec(toks) != "rans"  # default menu: never
    assert selector.select_archive_int_codec(toks) == "rans"
    # registered for decode regardless of menu membership
    assert np.array_equal(
        selector.decode_ints(selector.encode_ints(toks, "rans"), "rans"), toks
    )
    with pytest.raises(ValueError, match="alphabet capacity"):
        rans.encode(np.arange(1 << 15, dtype=np.int64))  # 32768 distinct > M/4


def test_rans_lane_interleave_edge_counts():
    """Lane coverage: lengths around the K=256 lane count and non-multiples."""
    from orc_format_ray.codecs import rans

    rng = np.random.default_rng(9)
    for n in (1, 2, 255, 256, 257, 511, 513, 1000):
        v = rng.integers(-50, 50, n)
        assert np.array_equal(rans.decode(rans.encode(v)), v), n
