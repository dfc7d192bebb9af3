"""Session-13 operator wave: uniqueness audit, sequence-gap detection,
two-proportion z-test, Lorenz concentration curve, out-of-order (late)
event detection, model-eval lift table, ORC lake schema-drift report. Each
test pins the op against an independent local recompute at tiny scale."""

import numpy as np
import pandas as pd
import pytest

# --------------------------------------------------------- uniqueness_audit


def test_uniqueness_audit_finds_duplicate_keys(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import uniqueness_audit

    df = pd.DataFrame(
        {
            "a": [1, 1, 1, 2, 2, 3, 4, 4],
            "b": ["x", "x", "y", "z", "z", "z", "w", "w"],
            "payload": np.arange(8),
        }
    )
    got = (
        uniqueness_audit(ray.data.from_pandas(df).repartition(3), ["a", "b"])
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want = (
        df.groupby(["a", "b"], as_index=False)
        .size()
        .rename(columns={"size": "n_rows"})
        .query("n_rows > 1")
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    want["n_rows"] = want["n_rows"].astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_uniqueness_audit_clean_key_returns_empty(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import uniqueness_audit

    df = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100)})
    got = uniqueness_audit(ray.data.from_pandas(df).repartition(4), ["k"]).to_pandas()
    assert len(got) == 0


# ----------------------------------------------------------- sequence_gaps


def _brute_gaps(keys):
    ks = sorted(keys)
    out = []
    for a, b in zip(ks, ks[1:]):
        if b > a + 1:
            out.append((a + 1, b - 1))
    return pd.DataFrame(out, columns=["gap_start", "gap_end"]).astype("int64")


def test_sequence_gaps_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import sequence_gaps

    rng = np.random.default_rng(13)
    keys = np.unique(rng.integers(0, 5000, 900)).astype(np.int64)
    df = pd.DataFrame({"k": rng.permutation(keys)})
    got = (
        sequence_gaps(ray.data.from_pandas(df).repartition(6), "k")
        .to_pandas()
        .sort_values("gap_start")
        .reset_index(drop=True)
    )
    want = _brute_gaps(keys.tolist())
    pd.testing.assert_frame_equal(got, want)


def test_sequence_gaps_rejects_duplicates(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import sequence_gaps

    df = pd.DataFrame({"k": [1, 2, 2, 5]})
    with pytest.raises(Exception, match="not a key"):
        sequence_gaps(ray.data.from_pandas(df), "k").to_pandas()


def test_sequence_gaps_dense_sequence_is_gapless(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import sequence_gaps

    df = pd.DataFrame({"k": np.arange(500, dtype=np.int64)})
    got = sequence_gaps(ray.data.from_pandas(df).repartition(5), "k").to_pandas()
    assert len(got) == 0


# ------------------------------------------------------ prop_ztest_by_group


def test_prop_ztest_matches_scalar_recompute(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import prop_ztest_by_group

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n, p=[0.5, 0.3, 0.2]),
            "hit": (rng.random(n) < 0.3).astype(np.int64),
        }
    )
    got = prop_ztest_by_group(ray.data.from_pandas(df).repartition(5), "g", "hit")
    N = len(df)
    X = int(df["hit"].sum())
    for _, r in got.iterrows():
        sub = df[df["g"] == r["g"]]
        n1, x1 = len(sub), int(sub["hit"].sum())
        n2, x2 = N - n1, X - x1
        assert (r["n"], r["x"], r["n_rest"], r["x_rest"]) == (n1, x1, n2, x2)
        p1, p2, pp = x1 / n1, x2 / n2, X / N
        z = (p1 - p2) / np.sqrt(pp * (1 - pp) * (1 / n1 + 1 / n2))
        assert r["z"] == pytest.approx(z, rel=1e-12)


def test_prop_ztest_degenerate_pool_yields_zero(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import prop_ztest_by_group

    df = pd.DataFrame({"g": ["a", "a", "b"], "hit": [0, 0, 0]})
    got = prop_ztest_by_group(ray.data.from_pandas(df), "g", "hit")
    assert (got["z"] == 0.0).all()


# --------------------------------------------------------------- lorenz_curve


def test_lorenz_curve_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import lorenz_curve

    rng = np.random.default_rng(3)
    n = 1000
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "units": rng.integers(1, 10_000, n).astype(np.int64),
        }
    )
    got = lorenz_curve(ray.data.from_pandas(df).repartition(4), "id", "units", n_buckets=10)
    # brute: sort by (units, id), front-loaded ntile, cumulative exact share
    s = df.sort_values(["units", "id"]).reset_index(drop=True)
    size, rem = divmod(n, 10)
    bucket = np.repeat(np.arange(1, 11), [size + 1 if i < rem else size for i in range(10)])
    s["bucket"] = bucket
    per = s.groupby("bucket")["units"].agg(["count", "sum"])
    total = int(df["units"].sum())
    assert got["n"].tolist() == per["count"].tolist()
    assert got["units"].tolist() == [int(v) for v in per["sum"]]
    cums = np.cumsum([int(v) for v in per["sum"]])
    for i in range(10):
        assert got["share"][i] == np.float64(int(per["sum"].iloc[i])) / np.float64(total)
        assert got["cum_share"][i] == np.float64(int(cums[i])) / np.float64(total)
    assert got["cum_share"].iloc[-1] == 1.0
    # concentration: the top decile holds more than 10% of units
    assert got["share"].iloc[-1] > 0.1


# -------------------------------------------------------- out_of_order_events


def _brute_late(df, lateness_us=0):
    rows = []
    for k, g in df.sort_values(["k", "o"]).groupby("k"):
        seen = None
        for _, r in g.iterrows():
            t = int(r["t"].value) // 1000
            late = int(seen is not None and t < seen - lateness_us)
            rows.append((int(k), int(r["o"]), t, late))
            seen = t if seen is None else max(seen, t)
    return pd.DataFrame(rows, columns=["k", "o", "ts_us", "late"]).astype(
        {"k": "int64", "o": "int64", "ts_us": "int64", "late": "int64"}
    )


def test_out_of_order_matches_sequential_replay(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import out_of_order_events

    rng = np.random.default_rng(11)
    n = 3000
    df = pd.DataFrame(
        {
            "k": rng.integers(0, 25, n).astype(np.int64),
            "o": np.arange(n, dtype=np.int64),
            "t": pd.to_datetime(rng.permutation(n) * 997, unit="us"),
        }
    )
    got = (
        out_of_order_events(
            ray.data.from_pandas(df).repartition(7), key="k", seq_col="o", ts_col="t"
        )
        .to_pandas()
        .sort_values(["k", "o"])
        .reset_index(drop=True)
    )
    want = _brute_late(df)
    pd.testing.assert_frame_equal(got, want)
    assert got["late"].sum() > 0  # the permutation genuinely scrambles


def test_out_of_order_lateness_tolerance(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import out_of_order_events

    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 1],
            "o": [1, 2, 3, 4],
            "t": pd.to_datetime([100, 50, 95, 10], unit="us"),
        }
    )
    got = (
        out_of_order_events(
            ray.data.from_pandas(df), key="k", seq_col="o", ts_col="t", lateness_us=10
        )
        .to_pandas()
        .sort_values("o")
        .reset_index(drop=True)
    )
    # 50 < 100-10 late; 95 >= 100-10 on-time; 10 < 100-10 late
    assert got["late"].tolist() == [0, 1, 0, 1]


def test_out_of_order_rejects_duplicate_seq(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import out_of_order_events

    df = pd.DataFrame(
        {"k": [1, 1], "o": [7, 7], "t": pd.to_datetime([1, 2], unit="us")}
    )
    with pytest.raises(Exception, match="duplicate"):
        out_of_order_events(ray.data.from_pandas(df), key="k", seq_col="o", ts_col="t").to_pandas()


# ----------------------------------------------------------------- lift_table


def test_lift_table_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.infer import lift_table

    rng = np.random.default_rng(17)
    n = 2000
    scores = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            # correlated: positives score higher on average
            "score_units": rng.integers(0, 1000, n).astype(np.int64),
        }
    )
    labels = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "label": (rng.random(n) < (scores["score_units"] / 1500)).astype(np.int32),
        }
    )
    got = lift_table(
        ray.data.from_pandas(scores).repartition(4),
        ray.data.from_pandas(labels).repartition(3),
        pos_label=1,
        n_buckets=10,
    )
    s = scores.merge(labels, on="vec_id").sort_values(["score_units", "vec_id"]).reset_index(drop=True)
    size, rem = divmod(n, 10)
    s["bucket"] = np.repeat(np.arange(1, 11), [size + 1 if i < rem else size for i in range(10)])
    per = s.groupby("bucket").agg(n=("label", "size"), n_pos=("label", "sum"))
    assert got["n"].tolist() == per["n"].tolist()
    assert got["n_pos"].tolist() == [int(v) for v in per["n_pos"]]
    X, N = int(labels["label"].sum()), n
    base = np.float64(X) / np.float64(N)
    for i in range(10):
        r = np.float64(int(per["n_pos"].iloc[i])) / np.float64(int(per["n"].iloc[i]))
        assert got["rate"][i] == r
        assert got["lift"][i] == r / base
    # monotone-ish: top decile lift above bottom decile
    assert got["lift"].iloc[-1] > got["lift"].iloc[0]


# --------------------------------------------------------- lake_schema_report


def test_lake_schema_report_flags_missing_columns(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_schema_report

    full = pa.table(
        {"a": pa.array([1, 2], pa.int64()), "b": pa.array(["x", "y"]), "c": pa.array([1.5, 2.5])}
    )
    old = full.select(["a", "b"])
    older = full.select(["a"])
    write_orc(full, str(tmp_path / "f_full.orc"))
    write_orc(old, str(tmp_path / "f_old.orc"))
    sub = tmp_path / "part=1"
    sub.mkdir()
    write_orc(older, str(sub / "f_older.orc"))

    got = lake_schema_report(str(tmp_path)).sort_values("path").reset_index(drop=True)
    by_path = {r["path"]: r for _, r in got.iterrows()}
    assert by_path["f_full.orc"]["missing"] == ""
    assert by_path["f_full.orc"]["n_cols"] == 3
    assert by_path["f_old.orc"]["missing"] == "c"
    assert by_path["part=1/f_older.orc"]["missing"] == "b,c"
    assert by_path["part=1/f_older.orc"]["n_cols"] == 1
    assert got["num_rows"].tolist() == [2, 2, 2]


# ------------------------------------------------------------------ auc_exact


def _brute_auc(scores, labels):
    pos = [s for s, l in zip(scores, labels) if l == 1]
    neg = [s for s, l in zip(scores, labels) if l == 0]
    wins = sum((p > n) + 0.5 * (p == n) for p in pos for n in neg)
    return wins / (len(pos) * len(neg))


def test_auc_exact_matches_pairwise_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.infer import auc_exact

    rng = np.random.default_rng(23)
    n = 1500
    df = pd.DataFrame(
        {
            "score_units": rng.integers(0, 40, n).astype(np.int64),  # heavy ties
            "pos": (rng.random(n) < 0.4).astype(np.int64),
        }
    )
    got = auc_exact(ray.data.from_pandas(df).repartition(5))
    assert got["n"][0] == n
    assert got["npos"][0] == int(df["pos"].sum())
    assert got["auc"][0] == pytest.approx(_brute_auc(df["score_units"], df["pos"]), abs=1e-12)


def test_auc_exact_perfect_and_inverted(ray_session):
    import ray.data

    from orc_format_ray.ops.infer import auc_exact

    df = pd.DataFrame({"score_units": [1, 2, 3, 10, 11, 12], "pos": [0, 0, 0, 1, 1, 1]})
    assert auc_exact(ray.data.from_pandas(df))["auc"][0] == 1.0
    df["pos"] = 1 - df["pos"]
    assert auc_exact(ray.data.from_pandas(df))["auc"][0] == 0.0


def test_auc_exact_rejects_single_class(ray_session):
    import ray.data

    from orc_format_ray.ops.infer import auc_exact

    df = pd.DataFrame({"score_units": [1, 2], "pos": [1, 1]})
    with pytest.raises(Exception, match="positive and negative"):
        auc_exact(ray.data.from_pandas(df))


# -------------------------------------------------------- quantile_cont exact


def test_quantile_cont_exact_matches_duckdb_bitwise(ray_session):
    import duckdb
    import ray.data

    from orc_format_ray.ops.agg import grouped_quantiles_cont

    rng = np.random.default_rng(31)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": np.round(rng.random(n) * 1000, 2),  # cents-like doubles
        }
    )
    qs = [0.1, 0.25, 0.5, 0.75, 0.9]
    got = (
        grouped_quantiles_cont(ray.data.from_pandas(df).repartition(6), "g", "v", qs)
        .to_pandas()
        .sort_values(["g", "q"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        " UNION ALL ".join(
            f"SELECT g, CAST({q} AS DOUBLE) AS q, quantile_cont(v, {q}) AS value FROM t GROUP BY g"
            for q in qs
        )
        + " ORDER BY g, q"
    ).fetchdf()
    assert got["value"].tolist() == want["value"].tolist()  # BITWISE, no rounding


# -------------------------------------------------------------------- lake_fsck


def test_lake_fsck_clean_and_corrupt(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_fsck

    tbl = pa.table({"a": pa.array(range(250), type=pa.int64())})
    write_orc(tbl, str(tmp_path / "good.orc"), stripe_rows=100)
    write_orc(tbl, str(tmp_path / "trunc.orc"), stripe_rows=100)
    raw = (tmp_path / "trunc.orc").read_bytes()
    (tmp_path / "trunc.orc").write_bytes(raw[: len(raw) // 2])
    (tmp_path / "junk.orc").write_bytes(b"ORC not really an orc file")

    got = lake_fsck(str(tmp_path), deep=True)
    by = {r["path"]: r for _, r in got.iterrows()}
    assert by["good.orc"]["ok"] == 1 and by["good.orc"]["err"] == ""
    assert by["good.orc"]["num_rows"] == 250 and by["good.orc"]["n_stripes"] == 3
    assert by["trunc.orc"]["ok"] == 0 and by["trunc.orc"]["err"] != ""
    assert by["junk.orc"]["ok"] == 0


# ------------------------------------------------------------------ dow_profile


def test_dow_profile_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.etl import dow_profile

    rng = np.random.default_rng(41)
    n = 2000
    df = pd.DataFrame(
        {
            "event_type": rng.choice(["x", "y"], n),
            "ts": pd.to_datetime(rng.integers(0, 90 * 86400, n), unit="s"),
        }
    )
    got = (
        dow_profile(ray.data.from_pandas(df).repartition(4), "event_type")
        .to_pandas()
        .sort_values(["event_type", "isodow"])
        .reset_index(drop=True)
    )
    df["isodow"] = df["ts"].dt.dayofweek + 1  # pandas 0=Mon -> iso 1=Mon
    want = (
        df.groupby(["event_type", "isodow"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
        .sort_values(["event_type", "isodow"])
        .reset_index(drop=True)
    )
    tot = want.groupby("event_type")["n"].transform("sum")
    assert got["n"].tolist() == want["n"].tolist()
    assert got["isodow"].tolist() == [int(v) for v in want["isodow"]]
    fr = want["n"].to_numpy(np.int64).astype(np.float64) / tot.to_numpy(np.int64).astype(np.float64)
    assert got["frac"].tolist() == fr.tolist()


# ------------------------------------------------------- asof directions


def test_asof_join_forward_and_nearest(ray_session):
    import ray.data

    from orc_format_ray.ops.join import asof_join

    rng = np.random.default_rng(53)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 400).astype(np.int64),
            "t": rng.integers(0, 1000, 400).astype(np.int64),
            "lv": np.arange(400, dtype=np.int64),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 120).astype(np.int64),
            "t": rng.choice(np.arange(0, 1000, 7), 120, replace=False).astype(np.int64),
            "rv": np.arange(120, dtype=np.int64),
        }
    )
    right = right.drop_duplicates(["k", "t"]).reset_index(drop=True)
    for direction in ("backward", "forward", "nearest"):
        got = (
            asof_join(
                ray.data.from_pandas(left).repartition(4),
                ray.data.from_pandas(right).repartition(3),
                on="t",
                by="k",
                right_value_cols=["t", "rv"],
                direction=direction,
            )
            .to_pandas()
            .sort_values(["k", "t", "lv"])
            .reset_index(drop=True)
        )
        want = []
        for _, r in left.sort_values(["k", "t", "lv"]).iterrows():
            sub = right[right["k"] == r["k"]]
            back = sub[sub["t"] <= r["t"]].sort_values("t").tail(1)
            fwd = sub[sub["t"] >= r["t"]].sort_values("t").head(1)
            if direction == "backward":
                pick = back
            elif direction == "forward":
                pick = fwd
            else:
                if len(back) and len(fwd):
                    db = r["t"] - back["t"].iloc[0]
                    df_ = fwd["t"].iloc[0] - r["t"]
                    pick = fwd if df_ < db else back
                else:
                    pick = back if len(back) else fwd
            want.append(int(pick["rv"].iloc[0]) if len(pick) else None)
        got_rv = [None if pd.isna(v) else int(v) for v in got["rv"]]
        assert got_rv == want, direction


# ----------------------------------------------------------------- ks_test


def test_ks_test_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import ks_test

    rng = np.random.default_rng(61)
    n = 3000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "v": np.round(np.where(rng.random(n) < 0.5, rng.random(n) * 50, rng.random(n) * 80), 2),
        }
    )
    # shift group b so D is clearly nonzero
    df.loc[df["g"] == "b", "v"] += 5.0
    got = ks_test(ray.data.from_pandas(df).repartition(5), "g", "v", "a", "b")
    a = np.sort(np.floor(df.loc[df["g"] == "a", "v"].to_numpy() * 100 + 0.5).astype(np.int64))
    b = np.sort(np.floor(df.loc[df["g"] == "b", "v"].to_numpy() * 100 + 0.5).astype(np.int64))
    xs = np.unique(np.concatenate([a, b]))
    ca = np.searchsorted(a, xs, side="right") / len(a)
    cb = np.searchsorted(b, xs, side="right") / len(b)
    assert got["n_a"][0] == len(a) and got["n_b"][0] == len(b)
    assert got["d"][0] == pytest.approx(np.abs(ca - cb).max(), abs=1e-12)
    assert got["d"][0] > 0.1


# -------------------------------------------------------------- mutual_info


def test_mutual_info_terms_sum_to_mi(ray_session):
    import math

    import ray.data

    from orc_format_ray.ops.agg import mutual_info

    rng = np.random.default_rng(71)
    n = 2000
    x = rng.choice(["p", "q"], n)
    # y correlates with x -> MI > 0
    y = np.where(rng.random(n) < 0.8, x, rng.choice(["p", "q"], n))
    df = pd.DataFrame({"a": x, "b": y})
    got = mutual_info(ray.data.from_pandas(df).repartition(4), "a", "b")
    joint = df.groupby(["a", "b"]).size()
    mi = 0.0
    for (xa, yb), cxy in joint.items():
        cx = (df["a"] == xa).sum()
        cy = (df["b"] == yb).sum()
        mi += (cxy / n) * math.log(cxy * n / (cx * cy))
    assert got["term"].sum() == pytest.approx(mi, abs=1e-12)
    assert got["term"].sum() > 0.05
    assert got["n_xy"].sum() == n


# ------------------------------------------------------------- tpch q6 / q10


def test_tpch_q6_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from orc_format_ray.pipelines.tpch import q6_forecast_revenue

    sf = "/root/testdata/sf0.001"
    got = q6_forecast_revenue(sf)
    li = pq.read_table(sf + "/lineitem.parquet").to_pandas()
    sd = li["l_shipdate"].astype("datetime64[us]")
    keep = (
        (sd >= pd.Timestamp("1996-01-01"))
        & (sd < pd.Timestamp("1997-01-01"))
        & (li["l_discount"] >= 0.05)
        & (li["l_discount"] <= 0.07)
        & (li["l_quantity"] < 24)
    )
    sub = li[keep]
    units = int(
        (
            np.floor(sub["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
            * np.floor(sub["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
        ).sum()
    )
    assert got["n_rows"][0] == int(keep.sum())
    assert got["revenue_units"][0] == units
    assert got["revenue"][0] == units / 10000.0


def test_tpch_q10_matches_brute(ray_session):
    import pyarrow.parquet as pq

    from orc_format_ray.pipelines.tpch import q10_returned_items

    sf = "/root/testdata/sf0.001"
    got = q10_returned_items(sf, k=10)
    li = pq.read_table(sf + "/lineitem.parquet").to_pandas()
    od = pq.read_table(sf + "/orders.parquet").to_pandas()
    cu = pq.read_table(sf + "/customer.parquet").to_pandas()
    na = pq.read_table(sf + "/nation.parquet").to_pandas()
    j = li[li["l_returnflag"] == "R"].merge(od, left_on="l_orderkey", right_on="o_orderkey")
    ts = j["o_orderdate"].astype("datetime64[us]")
    j = j[(ts >= pd.Timestamp("1996-01-01")) & (ts < pd.Timestamp("1996-04-01"))]
    units = np.floor(j["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64) * (
        100 - np.floor(j["l_discount"].to_numpy() * 100 + 0.5).astype(np.int64)
    )
    j = j.assign(u=units)
    per = j.groupby("o_custkey", as_index=False)["u"].sum()
    per = per.sort_values(["u", "o_custkey"], ascending=[False, True]).head(10)
    want = per.merge(cu, left_on="o_custkey", right_on="c_custkey").merge(
        na, left_on="c_nationkey", right_on="n_nationkey"
    )
    want = want.sort_values(["u", "c_custkey"], ascending=[False, True]).reset_index(drop=True)
    assert got["c_custkey"].tolist() == want["c_custkey"].tolist()
    assert got["revenue_units"].tolist() == [int(v) for v in want["u"]]
    assert got["c_name"].tolist() == want["c_name"].tolist()
    assert got["n_name"].tolist() == want["n_name"].tolist()


# ---------------------------------------------------------- boolean search


def test_boolean_and_search_matches_brute(ray_session, tmp_path):
    import ray.data

    from orc_format_ray.ops.search import boolean_and_search, build_inverted_index

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(6, dtype=np.int64),
            "text": [
                "the quick brown fox",
                "the lazy dog",
                "quick dog runs",
                "  the   quick dog  ",
                "",
                "fox dog quick the",
            ],
        }
    )
    idx = str(tmp_path / "bidx")
    build_inverted_index(ray.data.from_pandas(docs).repartition(3), idx, num_buckets=4)
    got = sorted(
        boolean_and_search(idx, ["quick", "dog"]).to_pandas()["doc_id"].tolist()
    )
    want = sorted(
        int(r["doc_id"])
        for _, r in docs.iterrows()
        if {"quick", "dog"} <= set(r["text"].split())
    )
    assert got == want == [2, 3, 5]
    # single term + no-hit term
    assert sorted(boolean_and_search(idx, ["fox"]).to_pandas()["doc_id"].tolist()) == [0, 5]
    assert boolean_and_search(idx, ["quick", "zebra"]).to_pandas().empty


# -------------------------------------------------------------- assoc_rules


def test_assoc_rules_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.basket import assoc_rules

    rng = np.random.default_rng(83)
    n = 3000
    df = pd.DataFrame(
        {
            "b": rng.integers(0, 200, n).astype(np.int64),
            "i": rng.choice(["x", "y", "z", "w"], n, p=[0.4, 0.3, 0.2, 0.1]),
        }
    )
    got = assoc_rules(ray.data.from_pandas(df).repartition(5), "b", "i", min_count=2)
    d = df.drop_duplicates(["b", "i"])
    nb = d["b"].nunique()
    ci = d.groupby("i")["b"].nunique()
    pair_counts = {}
    for _, g in d.groupby("b"):
        items = sorted(g["i"])
        for x in range(len(items)):
            for y in range(x + 1, len(items)):
                pair_counts[(items[x], items[y])] = pair_counts.get((items[x], items[y]), 0) + 1
    for _, r in got.iterrows():
        key = tuple(sorted((r["antecedent"], r["consequent"])))
        c_ab = pair_counts[key]
        assert r["c_pair"] == c_ab
        assert r["c_ant"] == ci[r["antecedent"]]
        assert r["confidence"] == c_ab / ci[r["antecedent"]]
        assert r["lift"] == pytest.approx(
            c_ab * nb / (ci[r["antecedent"]] * ci[r["consequent"]]), rel=1e-15
        )
        assert r["support"] == c_ab / nb
    # every qualifying unordered pair appears in BOTH directions
    want_pairs = {k for k, v in pair_counts.items() if v >= 2}
    got_pairs = {tuple(sorted((a, c))) for a, c in zip(got["antecedent"], got["consequent"])}
    assert got_pairs == want_pairs
    assert len(got) == 2 * len(want_pairs)


# ------------------------------------------------------- lake_agg_from_stats


def test_lake_agg_from_stats_matches_scan(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_agg_from_stats

    rng = np.random.default_rng(91)
    vals = rng.integers(-500, 2000, 700).astype(np.int64)
    for i in range(3):
        part = vals[i * 250 : (i + 1) * 250]
        write_orc(
            pa.table({"v": pa.array(part, pa.int64())}),
            str(tmp_path / f"p{i}.orc"),
            stripe_rows=100,
        )
    got = lake_agg_from_stats(str(tmp_path), "v")
    assert got["n_files"][0] == 3
    assert got["n_rows"][0] == 700
    assert got["n_values"][0] == 700
    assert got["min"][0] == int(vals[:700].min())
    assert got["max"][0] == int(vals[:700].max())
    assert got["sum"][0] == int(vals[:700].sum())


def test_lake_agg_from_stats_rejects_missing_column(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_agg_from_stats

    write_orc(pa.table({"v": pa.array([1, 2], pa.int64())}), str(tmp_path / "a.orc"))
    with pytest.raises(Exception, match="no usable footer stats"):
        lake_agg_from_stats(str(tmp_path), "missing_col")


# ------------------------------------------------------------- cheapest_path


def test_cheapest_path_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import cheapest_path

    rng = np.random.default_rng(97)
    n_edges = 600
    df = pd.DataFrame(
        {
            "src": rng.integers(0, 60, n_edges).astype(np.int64),
            "dst": rng.integers(0, 60, n_edges).astype(np.int64),
            "w": rng.integers(1, 100, n_edges).astype(np.int64),
        }
    )
    seeds = [0, 7]
    max_hops = 3
    got = cheapest_path(ray.data.from_pandas(df).repartition(4), seeds, max_hops=max_hops)
    # brute Bellman-Ford over the symmetrized min-weight edge set
    emin = {}
    for s, d, w in df.itertuples(index=False):
        for a, b in ((int(s), int(d)), (int(d), int(s))):
            emin[(a, b)] = min(emin.get((a, b), 1 << 62), int(w))
    dist = {s: 0 for s in seeds}
    for _ in range(max_hops):
        nd = dict(dist)
        for (a, b), w in emin.items():
            if a in dist and dist[a] + w < nd.get(b, 1 << 62):
                nd[b] = dist[a] + w
        dist = nd
    want = pd.DataFrame(
        {"node": sorted(dist), "min_cost": [dist[k] for k in sorted(dist)]}
    ).astype("int64")
    pd.testing.assert_frame_equal(got, want)


def test_cheapest_path_rejects_negative_weight(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import cheapest_path

    df = pd.DataFrame({"src": [1], "dst": [2], "w": [-5]})
    with pytest.raises(Exception, match="non-negative"):
        cheapest_path(ray.data.from_pandas(df), [1])


# -------------------------------------------------------------- lake_zone_map


def test_lake_zone_map_matches_layout(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_zone_map

    ids = np.arange(730, dtype=np.int64)
    write_orc(pa.table({"k": pa.array(ids)}), str(tmp_path / "z.orc"), stripe_rows=200)
    got = lake_zone_map(str(tmp_path), "k")
    assert got["stripe"].tolist() == [0, 1, 2, 3]
    assert got["n_rows"].tolist() == [200, 200, 200, 130]
    assert got["min"].tolist() == [0, 200, 400, 600]
    assert got["max"].tolist() == [199, 399, 599, 729]


def test_lake_zone_map_missing_column_raises(ray_session, tmp_path):
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_zone_map

    write_orc(pa.table({"k": pa.array([1, 2], pa.int64())}), str(tmp_path / "a.orc"))
    with pytest.raises(Exception, match="no column"):
        lake_zone_map(str(tmp_path), "nope")
