"""Session-15 wave: xor_split float codec, exact-int count anomaly,
neighborhood Jaccard link prediction, clustering advisor."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

# ------------------------------------------------------- xor_split codec


def test_xor_split_bit_exact_and_wins_on_walks(ray_session):
    from orc_format_ray.codecs import byte_split, selector, xor_split

    rng = np.random.default_rng(15)
    cases = [
        rng.normal(1000, 1, 50_000),                      # smooth doubles
        np.array([np.nan, -0.0, 0.0, np.inf, -np.inf]),   # special bit patterns
        np.array([], dtype=np.float64),
        np.array([1.5]),
        rng.normal(size=999).astype(np.float32),
        rng.integers(-5, 5, 777).astype(np.int64),
        np.cumsum(rng.normal(0, 1e-3, 10_000)),           # random walk
    ]
    for arr in cases:
        dec = xor_split.decode(xor_split.encode(arr))
        assert dec.dtype == arr.dtype
        assert np.array_equal(arr.view(np.uint8), dec.view(np.uint8))
    # iid data: byte_split still wins (residues randomize nothing useful);
    # walk data: adjacency makes xor residues near-zero in the high planes
    iid = rng.normal(1000, 1, 100_000)
    walk = np.cumsum(rng.normal(0, 1e-3, 100_000)) + 1000.0
    assert selector.select_float_codec(iid) == "byte_split"
    assert selector.select_float_codec(walk) == "xor_split"
    z = pa.Codec("zstd", compression_level=3)
    assert len(z.compress(xor_split.encode(walk))) < len(z.compress(byte_split.encode(walk)))
    # truncated body is loud
    with pytest.raises(ValueError, match="body holds"):
        xor_split.decode(xor_split.encode(walk)[:-3])
    for name in ("raw", "byte_split", "xor_split"):
        rt = selector.decode_floats(selector.encode_floats(walk, name), name)
        assert np.array_equal(rt, walk)
