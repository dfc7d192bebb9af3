"""Property-based fuzz: random tables (types x nulls x sizes) must round-trip
through the stripe container bit-identically, with and without row-index."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

from orc_format_ray import stripe

_rng = np.random.default_rng(99)


@st.composite
def tables(draw):
    n = draw(st.integers(min_value=0, max_value=300))
    cols = {}
    null_p = draw(st.sampled_from([0.0, 0.1, 0.6]))

    def maybe_null(vals):
        return [None if _rng.random() < null_p else v for v in vals]

    kinds = draw(st.lists(st.sampled_from(["i32", "i64", "f64", "str", "bool", "list_i32", "ts", "map"]), min_size=1, max_size=4))
    for i, k in enumerate(kinds):
        name = f"c{i}_{k}"
        if k == "i32":
            cols[name] = pa.array(maybe_null([int(x) for x in _rng.integers(-(2**31), 2**31, n)]), type=pa.int32())
        elif k == "i64":
            cols[name] = pa.array(maybe_null([int(x) for x in _rng.integers(-(2**62), 2**62, n)]), type=pa.int64())
        elif k == "f64":
            cols[name] = pa.array(maybe_null([float(x) for x in _rng.random(n)]), type=pa.float64())
        elif k == "str":
            cols[name] = pa.array(maybe_null([f"s{int(x)}" * int(x % 4) for x in _rng.integers(0, 50, n)]), type=pa.string())
        elif k == "bool":
            cols[name] = pa.array(maybe_null([bool(x) for x in _rng.integers(0, 2, n)]), type=pa.bool_())
        elif k == "list_i32":
            cols[name] = pa.array(
                maybe_null([[int(v) for v in _rng.integers(0, 1000, int(x))] for x in _rng.integers(0, 6, n)]),
                type=pa.list_(pa.int32()),
            )
        elif k == "ts":
            cols[name] = pa.array(
                maybe_null([int(x) for x in _rng.integers(0, 2**48, n)]), type=pa.timestamp("us")
            )
        elif k == "map":
            cols[name] = pa.array(
                maybe_null([[(f"k{j}", int(v)) for j, v in enumerate(_rng.integers(0, 99, int(x)))] for x in _rng.integers(0, 4, n)]),
                type=pa.map_(pa.string(), pa.int64()),
            )
    return pa.table(cols)


@given(tables(), st.sampled_from([None, 50]))
@settings(max_examples=40, deadline=None)
def test_fuzz_roundtrip(tbl, stride):
    blob, _ = stripe.encode_table(tbl, row_index_stride=stride)
    out = stripe.decode_stripe(blob)
    assert out.equals(tbl)
