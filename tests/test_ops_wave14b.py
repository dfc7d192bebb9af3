"""Session-14 wave B: ORC footer user metadata (spec Footer field 5),
tail-only NDV dictionaries, as-of join tolerance, rebase-to-first index."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orc_format_ray.orcfile import write_orc

# ------------------------------------------------------------- user metadata


def test_user_metadata_roundtrip_both_readers(tmp_path):
    from orc_format_ray.orcread import read_orc_native, read_orc_user_metadata

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
    p = str(tmp_path / "um.orc")
    write_orc(t, p, user_metadata={"engine": "x", "blob": b"\x00\xff", "s": "café"})
    um = read_orc_user_metadata(p)
    assert um == {"engine": b"x", "blob": b"\x00\xff", "s": "café".encode()}
    assert read_orc_native(p).equals(t)
    # ORC C++ (pyarrow) sees the same keys — conformance
    import pyarrow.orc as po

    f = po.ORCFile(p)
    assert f.metadata[b"engine"] == b"x"
    assert f.read().equals(t)


def test_user_metadata_absent_is_empty_and_validated(tmp_path):
    from orc_format_ray.orcread import read_orc_user_metadata

    t = pa.table({"a": pa.array([1], pa.int64())})
    p = str(tmp_path / "plain.orc")
    write_orc(t, p)
    assert read_orc_user_metadata(p) == {}
    with pytest.raises(ValueError, match="user_metadata"):
        write_orc(t, str(tmp_path / "bad.orc"), user_metadata={"k": 3})


# ---------------------------------------------------------------- ndv / lake


def test_ndv_meta_exact_and_overflow(tmp_path):
    from orc_format_ray.orcmerge import ndv_meta

    import json

    t = pa.table(
        {
            "g": pa.array(["a", "b", "a", None]),
            "k": pa.array([7, 7, 8, 9], pa.int64()),
        }
    )
    m = ndv_meta(t, ["g", "k"], cap=10)
    assert json.loads(m["ndv:g"]) == {"exact": True, "values": ["a", "b"]}  # nulls excluded
    assert json.loads(m["ndv:k"]) == {"exact": True, "values": [7, 8, 9]}
    big = pa.table({"k": pa.array(np.arange(50), pa.int64())})
    assert json.loads(ndv_meta(big, ["k"], cap=10)["ndv:k"]) == {"exact": False, "n_seen": 50}
    with pytest.raises(ValueError, match="string/integer"):
        ndv_meta(pa.table({"f": pa.array([1.5])}), ["f"])


def test_lake_ndv_merges_and_degrades_loudly(tmp_path, ray_session):
    from orc_format_ray.orcmerge import lake_ndv, ndv_meta

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    t1 = pa.table({"g": pa.array(["a", "b"]), "i": pa.array([1, 2], pa.int64())})
    t2 = pa.table({"g": pa.array(["b", "c"]), "i": pa.array([2, 3], pa.int64())})
    write_orc(t1, f"{lake}/1.orc", user_metadata=ndv_meta(t1, ["g"]))
    write_orc(t2, f"{lake}/2.orc", user_metadata=ndv_meta(t2, ["g"]))
    out = lake_ndv(lake, ["g", "i"]).set_index("col")
    assert out.loc["g", "exact"] == 1 and out.loc["g", "ndv"] == 3
    # no dictionaries written for i -> inexact, bound 0
    assert out.loc["i", "exact"] == 0


def test_lake_ndv_overflow_keeps_best_lower_bound(tmp_path, ray_session):
    from orc_format_ray.orcmerge import lake_ndv, ndv_meta

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    big = pa.table({"k": pa.array(np.arange(100), pa.int64())})
    small = pa.table({"k": pa.array([1, 2], pa.int64())})
    write_orc(big, f"{lake}/big.orc", user_metadata=ndv_meta(big, ["k"], cap=10))
    write_orc(small, f"{lake}/small.orc", user_metadata=ndv_meta(small, ["k"], cap=10))
    out = lake_ndv(lake, ["k"]).set_index("col")
    assert out.loc["k", "exact"] == 0
    assert out.loc["k", "ndv"] == 100  # the overflowed file's n_seen floor wins


# ------------------------------------------------------------ asof tolerance


def test_asof_tolerance_matches_pandas_merge_asof(ray_session):
    import ray.data

    from orc_format_ray.ops.join import asof_join

    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {
            "by": rng.integers(0, 4, 80),
            "on": np.sort(rng.choice(10_000, 80, replace=False)).astype(np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "by": rng.integers(0, 4, 40),
            "on": np.sort(rng.choice(10_000, 40, replace=False)).astype(np.int64),
            "val": np.arange(40, dtype=np.int64),
        }
    )
    for direction in ["backward", "forward", "nearest"]:
        got = (
            asof_join(
                ray.data.from_pandas(left).repartition(3),
                ray.data.from_pandas(right).repartition(2),
                on="on", by="by", right_value_cols=["on", "val"],
                direction=direction, tolerance=500,
            )
            .to_pandas()
            .sort_values(["by", "on"])
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.sort_values("on"), right.sort_values("on"),
            on="on", by="by", direction=direction, tolerance=500,
            suffixes=("", "_r"),
        ).sort_values(["by", "on"]).reset_index(drop=True)
        assert got["val"].fillna(-1).tolist() == want["val"].fillna(-1).tolist(), direction


def test_asof_without_tolerance_unchanged(ray_session):
    import ray.data

    from orc_format_ray.ops.join import asof_join

    left = pd.DataFrame({"by": [1, 1], "on": np.array([100, 200], dtype=np.int64)})
    right = pd.DataFrame(
        {"by": [1], "on": np.array([5], dtype=np.int64), "val": np.array([7], dtype=np.int64)}
    )
    got = asof_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="on", by="by", right_value_cols=["on", "val"],
    ).to_pandas()
    assert got["val"].tolist() == [7, 7]  # far matches stay without tolerance


# ------------------------------------------------------------ rebase_to_first


def test_rebase_to_first_hand_computation(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import rebase_to_first

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2, 2],
            "ts": pd.to_datetime([3, 1, 2, 10, 11], unit="us"),
            "v": [3.0, 2.0, 4.0, 5.0, 2.5],
        }
    )
    got = (
        rebase_to_first(ray.data.from_pandas(df).repartition(2), "k", "ts", "v")
        .to_pandas()
        .sort_values(["k", "ts_us"])
        .reset_index(drop=True)
    )
    # key 1 first (by ts) is v=2.0 -> 100, 200, 150; key 2: 100, 50
    assert got["idx"].tolist() == [100.0, 200.0, 150.0, 100.0, 50.0]
    assert got["u"].tolist() == [200, 400, 300, 500, 250]


def test_rebase_to_first_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import rebase_to_first

    dup = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime([5, 5], unit="us"), "v": [1.0, 2.0]}
    )
    with pytest.raises(Exception, match="duplicate"):
        rebase_to_first(ray.data.from_pandas(dup), "k", "ts", "v").to_pandas()
    zero = pd.DataFrame({"k": [1], "ts": pd.to_datetime([5], unit="us"), "v": [0.0]})
    with pytest.raises(Exception, match="first unit is 0"):
        rebase_to_first(ray.data.from_pandas(zero), "k", "ts", "v").to_pandas()


# ------------------------------------------------------ personalized pagerank


def test_personalized_pagerank_hand_graph(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import personalized_pagerank

    T = 10**12
    edges = pd.DataFrame({"src": [1, 2], "dst": [2, 3]})
    got = personalized_pagerank(
        ray.data.from_pandas(edges), seeds=[1], iterations=1
    ).set_index("node")["rank_units"]
    # init: all mass T on seed 1; one step: 1 -> 2 contributes (850*T)//1000
    assert got[1] == (150 * T) // 1000
    assert got[2] == (850 * T) // 1000
    assert got[3] == 0


def test_personalized_pagerank_rejects_unknown_seed(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import personalized_pagerank

    edges = pd.DataFrame({"src": [1], "dst": [2]})
    with pytest.raises(ValueError, match="seeds not in the graph"):
        personalized_pagerank(ray.data.from_pandas(edges), seeds=[99])


def test_personalized_pagerank_mass_concentrates_near_seeds(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import personalized_pagerank

    rng = np.random.default_rng(8)
    # two disconnected cliques; seeding one leaves the other at zero
    a = [(i, j) for i in range(5) for j in range(5) if i != j]
    b = [(i, j) for i in range(10, 15) for j in range(10, 15) if i != j]
    edges = pd.DataFrame(a + b, columns=["src", "dst"])
    got = personalized_pagerank(
        ray.data.from_pandas(edges), seeds=[0, 1], iterations=3
    )
    other = got[got["node"] >= 10]["rank_units"]
    assert (other == 0).all()
    assert got[got["node"] < 5]["rank_units"].sum() > 0


# -------------------------------------------------------- U-shaped attribution


def test_attribution_position_hand_splits(ray_session):
    import ray.data

    from orc_format_ray.ops.paths import attribution_position

    rows = []
    # user 1: 5 touches a,b,c,d,e then one conversion of 2.00
    for i, ch in enumerate(["a", "b", "c", "d", "e"]):
        rows.append((1, i, ch, 0.0))
    rows.append((1, 9, "purchase", 2.0))
    # user 2: single touch f then conversion of 1.00 -> f gets all 10000
    rows.append((2, 0, "f", 0.0))
    rows.append((2, 5, "purchase", 1.0))
    # user 3: conversion with NO prior touch -> dropped
    rows.append((3, 0, "purchase", 9.0))
    df = pd.DataFrame(rows, columns=["user_id", "ts_i", "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts_i"], unit="us")
    got = (
        attribution_position(ray.data.from_pandas(df.drop(columns=["ts_i"])).repartition(3))
        .to_pandas()
        .set_index("channel")
    )
    # k=5: mid = 2000//3 = 666, rem = 2; first 4002, last 4000
    assert got.loc["a", "units_bp"] == 4002 * 200
    assert got.loc["b", "units_bp"] == 666 * 200
    assert got.loc["c", "units_bp"] == 666 * 200
    assert got.loc["d", "units_bp"] == 666 * 200
    assert got.loc["e", "units_bp"] == 4000 * 200
    assert got.loc["f", "units_bp"] == 10000 * 100
    assert "purchase" not in got.index
    assert got.loc["f", "value_credit"] == 1.0
    # total credited bp*units conserves per conversion (k>=1 only)
    assert got["units_bp"].sum() == 10000 * 200 + 10000 * 100


def test_attribution_position_two_touch_split_and_guard(ray_session):
    import ray.data

    from orc_format_ray.ops.paths import attribution_position

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([0, 1, 2], unit="us"),
            "event_type": ["x", "y", "purchase"],
            "value": [0.0, 0.0, 3.0],
        }
    )
    got = attribution_position(ray.data.from_pandas(df)).to_pandas().set_index("channel")
    assert got.loc["x", "units_bp"] == 5000 * 300
    assert got.loc["y", "units_bp"] == 5000 * 300
    dup = pd.DataFrame(
        {
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime([0, 0, 2], unit="us"),
            "event_type": ["x", "y", "purchase"],
            "value": [0.0, 0.0, 3.0],
        }
    )
    with pytest.raises(Exception, match="duplicate"):
        attribution_position(ray.data.from_pandas(dup)).to_pandas()


# --------------------------------------------------- tail-only lake quantiles


def test_lake_quantile_disc_exact_and_loud(tmp_path, ray_session):
    from orc_format_ray.orcmerge import hist_meta, lake_quantile_disc

    rng = np.random.default_rng(12)
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    vals = rng.integers(1, 40, size=500).astype(np.float64)
    for i in range(4):
        part = pa.table({"v": pa.array(vals[i * 125 : (i + 1) * 125])})
        write_orc(part, f"{lake}/p{i}.orc", user_metadata=hist_meta(part, ["v"]))
    got = lake_quantile_disc(lake, "v", [0.5, 0.9])
    u = np.sort(np.floor(vals * 100 + 0.5).astype(np.int64))
    for q, units in got.itertuples(index=False):
        rank = int(np.ceil(np.float64(q) * len(u)))  # the pinned rank rule
        assert units == u[rank - 1]
    # a file without a histogram is loud
    write_orc(pa.table({"v": pa.array([1.0])}), f"{lake}/naked.orc")
    with pytest.raises(ValueError, match="no histogram"):
        lake_quantile_disc(lake, "v", [0.5])


def test_lake_quantile_disc_overflow_is_loud(tmp_path, ray_session):
    from orc_format_ray.orcmerge import hist_meta, lake_quantile_disc

    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    part = pa.table({"v": pa.array(np.arange(100, dtype=np.float64))})
    write_orc(part, f"{lake}/p0.orc", user_metadata=hist_meta(part, ["v"], cap=10))
    with pytest.raises(ValueError, match="overflowed"):
        lake_quantile_disc(lake, "v", [0.5])


def test_hist_meta_rejects_non_numeric_and_nan():
    from orc_format_ray.orcmerge import hist_meta

    with pytest.raises(ValueError, match="numeric"):
        hist_meta(pa.table({"s": pa.array(["a"])}), ["s"])
    with pytest.raises(ValueError, match="non-null"):
        hist_meta(pa.table({"v": pa.array([1.0, float("nan")])}), ["v"])


# ----------------------------------------------------------------- pct_change


def test_pct_change_hand_computation(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import pct_change_over

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ts": pd.to_datetime([0, 1, 2, 0], unit="us"),
            "v": [2.0, 3.0, 1.5, 9.0],
        }
    )
    got = (
        pct_change_over(ray.data.from_pandas(df).repartition(2), "k", "ts", "v")
        .to_pandas()
        .sort_values(["k", "ts_us"])
        .reset_index(drop=True)
    )
    # key 1: 200 -> 300 (+50%), 300 -> 150 (-50%); key 2 single row drops
    assert got["pct"].tolist() == [50.0, -50.0]
    assert got["prev_u"].tolist() == [200, 300]
    assert 2 not in got["k"].tolist()


def test_pct_change_zero_prev_is_loud(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import pct_change_over

    df = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime([0, 1], unit="us"), "v": [0.0, 1.0]}
    )
    with pytest.raises(Exception, match="zero previous"):
        pct_change_over(ray.data.from_pandas(df), "k", "ts", "v").to_pandas()


# ------------------------------------------------------------ windowed funnel


def test_funnel_within_window_gates_later_steps(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import funnel

    df = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2],
            "ts": pd.to_datetime([0, 5, 8, 0, 100, 105], unit="us"),
            "event_type": ["view", "click", "purchase"] * 2,
        }
    )
    # window 10us: user 1 completes (gaps 5, 3); user 2's click is 100us late
    got = (
        funnel(ray.data.from_pandas(df), ["view", "click", "purchase"], within_us=10)
        .to_pandas()
        .set_index("user_id")["depth"]
    )
    assert got[1] == 3 and got[2] == 1
    # without the window both complete (regression: default unchanged)
    got2 = (
        funnel(ray.data.from_pandas(df), ["view", "click", "purchase"])
        .to_pandas()
        .set_index("user_id")["depth"]
    )
    assert got2[1] == 3 and got2[2] == 3
    with pytest.raises(ValueError, match="within_us"):
        funnel(ray.data.from_pandas(df), ["view"], within_us=0)


# ------------------------------------------------------------------ term_scan


def test_term_scan_positions_and_counts(ray_session):
    import ray.data

    from orc_format_ray.ops.text import term_scan

    df = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["abc needle xx needle", "no match here", "needle at start"],
        }
    )
    got = (
        term_scan(ray.data.from_pandas(df).repartition(2), "needle")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["doc_id"].tolist() == [1, 3]
    assert got["first_pos"].tolist() == [5, 1]  # 1-based, SQL position()
    assert got["n_occurrences"].tolist() == [2, 1]


def test_term_scan_non_ascii_is_loud(ray_session):
    import ray.data

    from orc_format_ray.ops.text import term_scan

    df = pd.DataFrame({"doc_id": [1], "text": ["café needle"]})
    with pytest.raises(Exception, match="non-ASCII"):
        term_scan(ray.data.from_pandas(df), "needle").to_pandas()


# --------------------------------------------------------- clustered lake write


def test_write_clustered_lake_produces_mergeable_ranges(tmp_path, ray_session):
    import ray.data

    from orc_format_ray.ops.mergejoin import plan_merge_join
    from orc_format_ray.orcfile import read_orc_dataset, write_clustered_lake
    from orc_format_ray.orcmerge import lake_ndv, ndv_meta

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "k": rng.permutation(600).astype(np.int64),
            "g": rng.choice(["a", "b"], 600),
        }
    )
    lake = str(tmp_path / "cl")
    write_clustered_lake(
        ray.data.from_pandas(df).repartition(6), "k", lake,
        user_metadata_fn=lambda t: ndv_meta(t, ["g"]),
    ).materialize()
    plan = plan_merge_join(lake, lake, "k", "k")
    assert plan["avg_files_per_range"] <= 4
    ndv = lake_ndv(lake, ["g"]).set_index("col")
    assert ndv.loc["g", "exact"] == 1 and ndv.loc["g", "ndv"] == 2
    back = read_orc_dataset(lake, native=True).to_pandas()
    assert sorted(back["k"]) == sorted(df["k"])


# ----------------------------------------------------------- jsonl quarantine


def test_read_jsonl_quarantine_side_output(tmp_path, ray_session):
    import ray.data

    from orc_format_ray.ops.jsonl import read_jsonl, write_jsonl

    df = pd.DataFrame({"k": np.arange(20, dtype=np.int64), "v": [f"s{i}" for i in range(20)]})
    d = str(tmp_path / "shards")
    write_jsonl(ray.data.from_pandas(df), d, key_col="k", columns=["k", "v"],
                rows_per_shard=10)
    import glob

    shards = sorted(glob.glob(d + "/*.jsonl"))
    with open(shards[0], "ab") as f:
        f.write(b"{broken\n[]\n")
    q = str(tmp_path / "bad")
    back = read_jsonl(d, {"k": "int64", "v": "string"}, quarantine_dir=q).to_pandas()
    assert sorted(back["k"]) == list(range(20))
    bads = glob.glob(q + "/*.bad")
    assert len(bads) == 1
    assert open(bads[0], "rb").read() == b"{broken\n[]\n"


def test_read_jsonl_without_quarantine_stays_loud(tmp_path, ray_session):
    import ray.data

    from orc_format_ray.ops.jsonl import read_jsonl, write_jsonl

    df = pd.DataFrame({"k": np.arange(5, dtype=np.int64)})
    d = str(tmp_path / "shards")
    write_jsonl(ray.data.from_pandas(df), d, key_col="k", columns=["k"])
    import glob

    with open(sorted(glob.glob(d + "/*.jsonl"))[0], "ab") as f:
        f.write(b"oops\n")
    with pytest.raises(Exception):
        read_jsonl(d, {"k": "int64"}).to_pandas()


# ----------------------------------------------------------- global row ids


def test_with_global_row_ids_dense_and_ordered(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import with_global_row_ids

    rng = np.random.default_rng(21)
    keys = rng.permutation(300).astype(np.int64)
    df = pd.DataFrame({"k": keys, "payload": keys * 2})
    out = (
        with_global_row_ids(ray.data.from_pandas(df).repartition(7), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["rid"].tolist() == list(range(300))  # rid == rank of k
    assert (out["payload"] == out["k"] * 2).all()


def test_with_global_row_ids_duplicate_keys_loud(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import with_global_row_ids

    df = pd.DataFrame({"k": np.array([1, 2, 2, 3], dtype=np.int64)})
    with pytest.raises(Exception, match="duplicate|overlap"):
        with_global_row_ids(ray.data.from_pandas(df).repartition(2), "k").to_pandas()


# --------------------------------------------------- exact nearest neighbor


def test_nearest_neighbor_exact_matches_brute_force(ray_session):
    import ray.data

    from orc_format_ray.ops.similarity import nearest_neighbor_exact

    rng = np.random.default_rng(17)
    n, d = 60, 8
    m = rng.normal(scale=0.3, size=(n, d)).astype(np.float32)
    df = pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64), "embedding": list(m)})
    got = (
        nearest_neighbor_exact(ray.data.from_pandas(df).repartition(4))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    q = np.floor(m.astype(np.float64) * (1 << 20) + 0.5).astype(np.int64)
    dots = q @ q.T
    np.fill_diagonal(dots, np.iinfo(np.int64).min)
    want_nn = dots.argmax(axis=1)  # first max == smallest id on ties
    assert got["nn_id"].tolist() == want_nn.tolist()
    assert got["dot"].tolist() == dots[np.arange(n), want_nn].tolist()


def test_nearest_neighbor_exact_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.similarity import nearest_neighbor_exact

    one = pd.DataFrame({"vec_id": [1], "embedding": [np.zeros(4, np.float32)]})
    with pytest.raises(ValueError, match="at least 2"):
        nearest_neighbor_exact(ray.data.from_pandas(one))
    dup = pd.DataFrame(
        {"vec_id": [1, 1], "embedding": [np.zeros(4, np.float32)] * 2}
    )
    with pytest.raises(ValueError, match="duplicate"):
        nearest_neighbor_exact(ray.data.from_pandas(dup))
    big = pd.DataFrame(
        {"vec_id": [1, 2], "embedding": [np.full(4, 4000.0, np.float32)] * 2}
    )
    with pytest.raises(ValueError, match="2\\^53"):
        nearest_neighbor_exact(ray.data.from_pandas(big))


# -------------------------------------------------------------- lake PSI


def test_lake_psi_matches_direct_computation(tmp_path, ray_session):
    import math

    from orc_format_ray.orcmerge import hist_meta, lake_psi

    rng = np.random.default_rng(23)
    a = rng.integers(1, 10, 300).astype(np.float64)
    b = rng.integers(3, 14, 200).astype(np.float64)  # shifted: some one-sided units
    for name, vals in [("a", a), ("b", b)]:
        d = str(tmp_path / name)
        os.makedirs(d)
        for i in range(2):
            part = pa.table({"v": pa.array(vals[i::2])})
            write_orc(part, f"{d}/p{i}.orc", user_metadata=hist_meta(part, ["v"]))
    got = lake_psi(str(tmp_path / "a"), str(tmp_path / "b"), "v").set_index("units")
    ua, ca = np.unique(np.floor(a * 100 + 0.5).astype(np.int64), return_counts=True)
    ub, cb = np.unique(np.floor(b * 100 + 0.5).astype(np.int64), return_counts=True)
    da, db = dict(zip(ua.tolist(), ca.tolist())), dict(zip(ub.tolist(), cb.tolist()))
    na, nb = len(a), len(b)
    for u in sorted(set(da) | set(db)):
        row = got.loc[u]
        assert row["c_a"] == da.get(u, 0) and row["c_b"] == db.get(u, 0)
        if da.get(u, 0) and db.get(u, 0):
            p, q = np.float64(da[u]) / na, np.float64(db[u]) / nb
            assert row["psi_term"] == float((p - q) * np.float64(math.log(p / q)))
        else:
            assert pd.isna(row["psi_term"])  # one-sided units: NULL, not fudged


def test_lake_psi_scale_mismatch_is_loud(tmp_path, ray_session):
    from orc_format_ray.orcmerge import hist_meta, lake_psi

    for name, scale in [("a", 100), ("b", 10)]:
        d = str(tmp_path / name)
        os.makedirs(d)
        part = pa.table({"v": pa.array([1.0, 2.0])})
        write_orc(part, f"{d}/p.orc",
                  user_metadata=hist_meta(part, ["v"], value_scale=scale))
    with pytest.raises(ValueError, match="scales disagree"):
        lake_psi(str(tmp_path / "a"), str(tmp_path / "b"), "v")
