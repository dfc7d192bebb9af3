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


# ------------------------------------------------- count_anomaly_by_key


def _anomaly_brute(df: pd.DataFrame, z_num=2, z_den=1, day_us=86_400_000_000):
    rows = []
    d = df.assign(day=df["ts"] // day_us)
    for k, g in d.groupby("k", sort=True):
        by = g.groupby("day", sort=True).size()
        cnts = [int(x) for x in by.to_numpy()]
        days = [int(x) for x in by.index]
        n, s = len(cnts), sum(cnts)
        q = sum(c * c for c in cnts)
        rhs = z_num * z_num * (n * q - s * s)
        for day, c in zip(days, cnts):
            if z_den * z_den * (n * c - s) * (n * c - s) > rhs:
                rows.append((k, day, c, n, s))
    return pd.DataFrame(rows, columns=["k", "day", "cnt", "n_days", "sum_cnt"])


def test_count_anomaly_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import count_anomaly_by_key

    rng = np.random.default_rng(7)
    day = 86_400_000_000
    ks, tss = [], []
    for k in ["a", "b", "c", "d"]:
        for d in range(20):
            n = int(rng.integers(1, 6))
            if k == "b" and d == 7:
                n = 200  # planted spike
            ks += [k] * n
            tss += [d * day + int(rng.integers(0, day))] * 1 * n
    df = pd.DataFrame({"k": ks, "ts": np.array(tss, dtype=np.int64)})
    ds = ray.data.from_pandas(df.sample(frac=1.0, random_state=3).reset_index(drop=True)).repartition(7)
    got = (
        count_anomaly_by_key(ds, key="k", ts_col="ts")
        .to_pandas()
        .sort_values(["k", "day"])
        .reset_index(drop=True)
    )
    want = _anomaly_brute(df).sort_values(["k", "day"]).reset_index(drop=True)
    got = got.rename(columns={"k": "k"})
    pd.testing.assert_frame_equal(
        got.astype({"day": "int64", "cnt": "int64", "n_days": "int64", "sum_cnt": "int64"}),
        want,
    )
    # the planted spike is flagged
    assert ("b", 7) in set(zip(got["k"], got["day"]))


def test_count_anomaly_zero_variance_never_flags(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import count_anomaly_by_key

    day = 86_400_000_000
    df = pd.DataFrame(
        {"k": ["x"] * 30, "ts": np.repeat(np.arange(10, dtype=np.int64) * day, 3)}
    )
    got = count_anomaly_by_key(ray.data.from_pandas(df).repartition(4), key="k", ts_col="ts").to_pandas()
    assert len(got) == 0


def test_count_anomaly_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import count_anomaly_by_key

    with pytest.raises(ValueError, match="bad z"):
        count_anomaly_by_key(None, z_num=0)
    with pytest.raises(ValueError, match="bad z"):
        count_anomaly_by_key(None, z_num=2, z_den=1001)


# ------------------------------------------------ link_predict_jaccard


def _ljp_brute(edges):
    # edges: list of (s, d); undirected simple graph
    from collections import defaultdict

    nb = defaultdict(set)
    eset = set()
    for s, d in edges:
        if s == d:
            continue
        a, b = min(s, d), max(s, d)
        eset.add((a, b))
        nb[a].add(b)
        nb[b].add(a)
    rows = []
    nodes = sorted(nb)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1:]:
            if (x, y) in eset:
                continue
            cn = len(nb[x] & nb[y])
            if cn >= 1:
                rows.append((x, y, cn, len(nb[x]), len(nb[y]),
                             cn / (len(nb[x]) + len(nb[y]) - cn)))
    return pd.DataFrame(rows, columns=["x", "y", "cn", "deg_a", "deg_b", "jaccard"])


def test_link_predict_jaccard_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import link_predict_jaccard

    rng = np.random.default_rng(42)
    edges = [(int(rng.integers(0, 40)), int(rng.integers(0, 40))) for _ in range(150)]
    # include duplicates and both orientations on purpose
    edges += [(d, s) for s, d in edges[:30]]
    df = pd.DataFrame(edges, columns=["src", "dst"]).astype("int64")
    ds = ray.data.from_pandas(df).repartition(6)
    got = (
        link_predict_jaccard(ds)
        .to_pandas()
        .sort_values(["x", "y"])
        .reset_index(drop=True)
    )
    want = _ljp_brute(edges).sort_values(["x", "y"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({c: "int64" for c in ["x", "y", "cn", "deg_a", "deg_b"]}), want
    )


def test_link_predict_jaccard_planted_and_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import link_predict_jaccard

    # star: center 0 with leaves 1..5 — every leaf pair shares exactly {0},
    # jaccard = 1/(1+1-1) = 1.0; the center pairs with nobody (its only
    # 2-hop partners ARE its neighbors... none: leaves only reach leaves)
    df = pd.DataFrame({"src": [0] * 5, "dst": [1, 2, 3, 4, 5]}).astype("int64")
    got = link_predict_jaccard(ray.data.from_pandas(df)).to_pandas()
    assert len(got) == 10  # C(5,2) leaf pairs
    assert (got["cn"] == 1).all() and (got["jaccard"] == 1.0).all()

    with pytest.raises(ValueError, match="min_common"):
        link_predict_jaccard(None, min_common=0)
    big = pd.DataFrame({"src": [0] * 20, "dst": np.arange(1, 21, dtype=np.int64)})
    with pytest.raises(Exception, match="max_degree"):
        link_predict_jaccard(ray.data.from_pandas(big), max_degree=10).to_pandas()


# ---------------------------------------------------- cluster_advisor


def test_cluster_advisor_depth_and_overlaps(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import cluster_advisor

    # 4 files: 'a' contiguous (clustered), 'b' all-overlapping (unsorted)
    ranges_a = [(0, 9), (10, 19), (20, 29), (30, 39)]
    ranges_b = [(0, 100), (5, 90), (50, 200), (7, 60)]
    for i, ((alo, ahi), (blo, bhi)) in enumerate(zip(ranges_a, ranges_b)):
        t = pa.table({"a": pa.array([alo, ahi], pa.int64()),
                      "b": pa.array([blo, bhi], pa.int64())})
        write_orc(t, str(tmp_path / f"f{i}.orc"))
    out = cluster_advisor(str(tmp_path), ["a", "b"]).set_index("column")
    assert out.loc["a", "max_depth"] == 1 and out.loc["a", "pair_overlaps"] == 0
    assert out.loc["a", "best"] == 1 and out.loc["b", "best"] == 0
    # brute-force the 'b' metrics
    n = len(ranges_b)
    brute_ov = sum(
        1 for i in range(n) for j in range(i + 1, n)
        if ranges_b[i][0] <= ranges_b[j][1] and ranges_b[j][0] <= ranges_b[i][1]
    )
    brute_depth = max(
        sum(1 for lo, hi in ranges_b if lo <= p <= hi) for p, _ in ranges_b
    )
    assert out.loc["b", "pair_overlaps"] == brute_ov == 6
    assert out.loc["b", "max_depth"] == brute_depth == 4
    assert (out["n_files"] == 4).all()


def test_cluster_advisor_matches_brute_random(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import cluster_advisor

    rng = np.random.default_rng(9)
    ivals = []
    for i in range(12):
        lo = int(rng.integers(0, 100))
        hi = lo + int(rng.integers(0, 40))
        ivals.append((lo, hi))
        write_orc(pa.table({"x": pa.array([lo, hi], pa.int64())}),
                  str(tmp_path / f"r{i:02d}.orc"))
    out = cluster_advisor(str(tmp_path), ["x"])
    n = len(ivals)
    brute_ov = sum(
        1 for i in range(n) for j in range(i + 1, n)
        if ivals[i][0] <= ivals[j][1] and ivals[j][0] <= ivals[i][1]
    )
    # depth is maximized at some interval's lo
    brute_depth = max(sum(1 for lo, hi in ivals if lo <= p <= hi) for p, _ in ivals)
    assert int(out.loc[0, "pair_overlaps"]) == brute_ov
    assert int(out.loc[0, "max_depth"]) == brute_depth


def test_cluster_advisor_guards(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import cluster_advisor

    with pytest.raises(ValueError, match="at least one"):
        cluster_advisor(str(tmp_path), [])
    with pytest.raises(ValueError, match="no .orc files"):
        cluster_advisor(str(tmp_path / "empty"), ["x"])
    write_orc(pa.table({"x": pa.array([1, 2], pa.int64())}), str(tmp_path / "f.orc"))
    with pytest.raises(Exception, match="no usable min/max"):
        cluster_advisor(str(tmp_path), ["missing_col"])


def test_dec_scale_bit_exact_and_selector_pick():
    """Decimal-scaling float codec: bit-exact across specials, wins the
    menu on decimal-scaled data, loses it on true reals."""
    import zlib

    from orc_format_ray.codecs import dec_scale, selector

    rng = np.random.default_rng(7)
    cases = [
        np.round(rng.uniform(1, 100000, 5000), 2),          # price-like
        rng.integers(1, 51, 4000).astype(np.float64),       # integral doubles
        rng.normal(size=2000),                              # true reals
        np.array([np.nan, np.inf, -np.inf, -0.0, 0.0, 2.25e300, 5e-324, 1.5]),
        np.zeros(0),
        np.round(rng.uniform(1, 100, 3000), 2).astype(np.float32),
    ]
    for v in cases:
        dec = dec_scale.decode(dec_scale.encode(v))
        assert dec.dtype == v.dtype and len(dec) == len(v)
        assert np.array_equal(dec.view(np.uint8), v.view(np.uint8))
    price = np.round(rng.uniform(1, 100000, 30000), 2)
    assert selector.select_float_codec(price) == "dec_scale"
    assert selector.select_float_codec(rng.normal(size=30000)) != "dec_scale"
    # the win is real post-compression, not just post-selection
    assert len(zlib.compress(dec_scale.encode(price), 6)) < 0.9 * len(
        zlib.compress(price.tobytes(), 6)
    )


def test_dec_scale_mixed_column_uses_exceptions():
    """A mostly-decimal column with a few true reals stays bit-exact via
    the exception list, and the chosen scale still serves the majority."""
    from orc_format_ray.codecs import dec_scale

    rng = np.random.default_rng(11)
    v = np.round(rng.uniform(1, 1000, 10_000), 2)
    idx = rng.choice(len(v), 50, replace=False)
    v[idx] = rng.normal(size=50)  # contaminate
    dec = dec_scale.decode(dec_scale.encode(v))
    assert np.array_equal(dec.view(np.uint64), v.view(np.uint64))
