"""Session-15 TPC-H completion wave: Q8 market share, Q13 customer
distribution, Q15 top supplier (all ties), Q17 small-quantity revenue
(exact-integer 0.2*avg cut), Q19 DNF revenue, Q22 idle high-balance
customers. Each test pins the Ray pipeline against an independent pandas
recompute at sf0.001; guards get their own probes."""

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _load(name, cols=None):
    import pyarrow.parquet as pq

    return pq.read_table(f"{SF}/{name}.parquet", columns=cols).to_pandas()


def _units(price: pd.Series, disc: pd.Series) -> np.ndarray:
    return np.floor(price.to_numpy() * 100 + 0.5).astype(np.int64) * (
        100 - np.floor(disc.to_numpy() * 100 + 0.5).astype(np.int64)
    )


def test_q8_market_share_matches_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q8_market_share

    got = q8_market_share(SF)
    li, od = _load("lineitem"), _load("orders")
    pt, su, cu, na, re = _load("part"), _load("supplier"), _load("customer"), _load("nation"), _load("region")
    rk = int(re.loc[re["r_name"] == "ASIA", "r_regionkey"].iloc[0])
    region_nat = set(na.loc[na["n_regionkey"] == rk, "n_nationkey"].astype(int))
    target = int(na.loc[na["n_name"] == "NATION_12", "n_nationkey"].iloc[0])
    j = (
        li.merge(pt[pt["p_type"] == "PROMO"][["p_partkey"]], left_on="l_partkey", right_on="p_partkey")
        .merge(su[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(od[["o_orderkey", "o_custkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
        .merge(cu[["c_custkey", "c_nationkey"]], left_on="o_custkey", right_on="c_custkey")
    )
    ts = j["o_orderdate"].astype("datetime64[us]")
    j = j[(ts >= pd.Timestamp("1995-01-01")) & (ts < pd.Timestamp("1997-01-01"))]
    j = j[j["c_nationkey"].astype(int).isin(region_nat)]
    u = _units(j["l_extendedprice"], j["l_discount"])
    j = j.assign(u=u, tgt=(j["s_nationkey"].astype(int) == target).astype(np.int64))
    j["year"] = j["o_orderdate"].dt.year.astype(np.int64)
    per = j.groupby("year").apply(
        lambda g: pd.Series({"nat": int((g["u"] * g["tgt"]).sum()), "tot": int(g["u"].sum())}),
        include_groups=False,
    ).reset_index()
    per = per.sort_values("year").reset_index(drop=True)
    assert got["o_year"].tolist() == per["year"].tolist()
    assert got["units_nation"].tolist() == per["nat"].tolist()
    assert got["units_total"].tolist() == per["tot"].tolist()
    assert got["mkt_share"].tolist() == [
        float(np.float64(n) / np.float64(t)) for n, t in zip(per["nat"], per["tot"])
    ]


def test_q8_unknown_nation_and_region_loud(ray_session):
    from orc_format_ray.pipelines.tpch import q8_market_share

    with pytest.raises(ValueError, match="unknown nation"):
        q8_market_share(SF, nation="ATLANTIS")
    with pytest.raises(ValueError, match="unknown region"):
        q8_market_share(SF, region="PACIFICA")


def test_q13_distribution_matches_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q13_customer_distribution

    got = q13_customer_distribution(SF)
    cu, od = _load("customer", ["c_custkey"]), _load("orders", ["o_custkey"])
    counts = od.groupby("o_custkey").size()
    per = cu["c_custkey"].map(counts).fillna(0).astype(np.int64)
    dist = per.value_counts().rename_axis("c_count").reset_index(name="custdist")
    dist = dist.sort_values(["custdist", "c_count"], ascending=[False, False]).reset_index(drop=True)
    assert got["c_count"].tolist() == dist["c_count"].tolist()
    assert got["custdist"].tolist() == dist["custdist"].tolist()
    # the distribution accounts for EVERY customer exactly once
    assert int(got["custdist"].sum()) == len(cu)


def test_q15_top_supplier_keeps_all_ties(ray_session):
    from orc_format_ray.pipelines.tpch import q15_top_supplier

    got = q15_top_supplier(SF)
    li, su = _load("lineitem"), _load("supplier")
    sd = li["l_shipdate"].astype("datetime64[us]")
    sub = li[(sd >= pd.Timestamp("1996-01-01")) & (sd < pd.Timestamp("1996-04-01"))]
    per = sub.assign(u=_units(sub["l_extendedprice"], sub["l_discount"])).groupby("l_suppkey")["u"].sum()
    mx = int(per.max())
    winners = sorted(int(k) for k, v in per.items() if int(v) == mx)
    assert got["s_suppkey"].tolist() == winners
    assert set(got["total_units"]) == {mx}
    names = su.set_index("s_suppkey")["s_name"]
    assert got["s_name"].tolist() == [names[k] for k in winners]
    assert got["total_revenue"].tolist() == [mx / 10000.0] * len(winners)


def test_q15_empty_quarter_typed_empty(ray_session):
    from orc_format_ray.pipelines.tpch import q15_top_supplier

    got = q15_top_supplier(SF, date_lo="1990-01-01", date_hi="1990-04-01")
    assert len(got) == 0
    assert list(got.columns) == ["s_suppkey", "s_name", "total_units", "total_revenue"]
    assert got["total_units"].dtype == np.int64 and got["total_revenue"].dtype == np.float64


def test_q17_small_quantity_matches_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q17_small_quantity_revenue

    got = q17_small_quantity_revenue(SF, brand="Brand#23")
    li, pt = _load("lineitem"), _load("part")
    pk = set(pt.loc[pt["p_brand"] == "Brand#23", "p_partkey"].astype(int))
    sub = li[li["l_partkey"].isin(pk)]
    agg = sub.groupby("l_partkey")["l_quantity"].agg(["sum", "count"])
    sq = agg["sum"].astype(np.int64)
    cnt = agg["count"].astype(np.int64)
    qi = sub["l_quantity"].astype(np.int64)
    small = 5 * qi.to_numpy() * cnt[sub["l_partkey"]].to_numpy() < sq[sub["l_partkey"]].to_numpy()
    cents = int(np.floor(sub["l_extendedprice"].to_numpy()[small] * 100 + 0.5).astype(np.int64).sum())
    assert int(got["price_cents"][0]) == cents and cents > 0
    assert float(got["avg_yearly"][0]) == float(np.float64(cents) / np.float64(700.0))


def test_q17_unknown_brand_zero_row(ray_session):
    from orc_format_ray.pipelines.tpch import q17_small_quantity_revenue

    got = q17_small_quantity_revenue(SF, brand="Brand#999")
    assert int(got["price_cents"][0]) == 0 and float(got["avg_yearly"][0]) == 0.0


def test_q19_dnf_matches_brute_and_rejects_dup_brands(ray_session):
    from orc_format_ray.pipelines.tpch import q19_dnf_revenue

    branches = (
        ("Brand#12", 1, 15, 1, 21),
        ("Brand#23", 1, 25, 10, 30),
        ("Brand#34", 1, 35, 20, 40),
    )
    got = q19_dnf_revenue(SF, branches=branches)
    li = _load("lineitem").merge(_load("part"), left_on="l_partkey", right_on="p_partkey")
    keep = np.zeros(len(li), bool)
    for b, slo, shi, qlo, qhi in branches:
        keep |= (
            (li["p_brand"] == b)
            & (li["p_size"] >= slo) & (li["p_size"] <= shi)
            & (li["l_quantity"] >= qlo) & (li["l_quantity"] <= qhi)
        ).to_numpy()
    sub = li[keep]
    units = int(_units(sub["l_extendedprice"], sub["l_discount"]).sum())
    assert int(got["revenue_units"][0]) == units and units > 0
    assert float(got["revenue"][0]) == float(np.float64(units) / np.float64(10000.0))
    with pytest.raises(ValueError, match="distinct brands"):
        q19_dnf_revenue(SF, branches=(("Brand#12", 1, 5, 1, 11), ("Brand#12", 1, 10, 10, 20)))


def test_q22_idle_customers_matches_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q22_idle_customers

    got = q22_idle_customers(SF, idle_since="1999-01-01")
    cu, od = _load("customer"), _load("orders")
    cents = np.floor(cu["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
    pos = cu["c_acctbal"].to_numpy() > 0.0
    s, n = int(cents[pos].sum()), int(pos.sum())
    ts = od["o_orderdate"].astype("datetime64[us]")
    recent = set(od.loc[ts >= pd.Timestamp("1999-01-01"), "o_custkey"].astype(int))
    keep = (cents * n > s) & ~cu["c_custkey"].astype(int).isin(recent).to_numpy()
    sub = cu[keep].assign(cents=cents[keep])
    per = sub.groupby(sub["c_nationkey"].astype(np.int64)).agg(
        numcust=("c_custkey", "size"), acctbal_cents=("cents", "sum")
    ).reset_index().sort_values("c_nationkey").reset_index(drop=True)
    assert len(got) > 0
    assert got["c_nationkey"].tolist() == per["c_nationkey"].tolist()
    assert got["numcust"].tolist() == per["numcust"].tolist()
    assert got["acctbal_cents"].tolist() == per["acctbal_cents"].tolist()
    assert got["totacctbal"].tolist() == [
        float(np.float64(v) / np.float64(100.0)) for v in per["acctbal_cents"]
    ]


def test_q22_no_idle_window_typed_empty(ray_session):
    from orc_format_ray.pipelines.tpch import q22_idle_customers

    # cutoff before all data: every customer has a "recent" order -> empty
    got = q22_idle_customers(SF, idle_since="1990-01-01")
    assert len(got) == 0
    assert list(got.columns) == ["c_nationkey", "numcust", "acctbal_cents", "totacctbal"]
    assert got["numcust"].dtype == np.int64 and got["totacctbal"].dtype == np.float64


# ---------------------------------------------------------- param fuzz vs SQL


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders", "lineitem"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    return con


def _assert_bitwise(got: pd.DataFrame, want: pd.DataFrame):
    got = got[sorted(got.columns)].sort_values(sorted(got.columns), kind="mergesort").reset_index(drop=True)
    want = want[sorted(want.columns)].sort_values(sorted(want.columns), kind="mergesort").reset_index(drop=True)
    assert list(got.columns) == list(want.columns) and len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.uint64), b.astype(np.float64).view(np.uint64)), c
        else:
            assert list(map(str, a)) == list(map(str, b)), c


def test_q19_random_branches_fuzz_vs_sql(ray_session):
    from orc_format_ray.pipelines.tpch import q19_dnf_revenue

    con = _duck(SF)
    rng = np.random.default_rng(19)
    for _ in range(5):
        nb = int(rng.integers(1, 4))
        brands = rng.choice(np.arange(1, 26), size=nb, replace=False)
        branches, conds = [], []
        for b in brands:
            slo, shi = sorted(map(int, rng.integers(1, 51, 2)))
            qlo, qhi = sorted(map(int, rng.integers(1, 51, 2)))
            branches.append((f"Brand#{b}", slo, shi, qlo, qhi))
            conds.append(
                f"(p_brand = 'Brand#{b}' AND p_size BETWEEN {slo} AND {shi} "
                f"AND l_quantity BETWEEN {qlo} AND {qhi})"
            )
        got = q19_dnf_revenue(SF, branches=tuple(branches))
        want = con.execute(
            "WITH sel AS (SELECT l_extendedprice, l_discount FROM lineitem "
            "JOIN part ON p_partkey = l_partkey WHERE " + " OR ".join(conds) + ") "
            "SELECT COALESCE(CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) "
            "* (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT), 0) AS revenue_units, "
            "CAST(COALESCE(CAST(sum(CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) "
            "* (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT))) AS BIGINT), 0) AS DOUBLE) "
            "/ 10000.0 AS revenue FROM sel"
        ).fetchdf()
        _assert_bitwise(got, want)


def test_q8_random_params_fuzz_vs_sql(ray_session):
    from orc_format_ray.pipelines.tpch import q8_market_share

    con = _duck(SF)
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    types = ["MEDIUM", "STANDARD", "LARGE", "PROMO", "SMALL"]
    rng = np.random.default_rng(8)
    for _ in range(4):
        nation = f"NATION_{int(rng.integers(0, 25))}"
        region = regions[int(rng.integers(0, 5))]
        ptype = types[int(rng.integers(0, 5))]
        got = q8_market_share(SF, nation=nation, region=region, p_type=ptype)
        want = con.execute(
            "WITH v AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, "
            "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) "
            "* (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS u, "
            f"CASE WHEN ns.n_name = '{nation}' THEN 1 ELSE 0 END AS tgt "
            "FROM lineitem JOIN part ON p_partkey = l_partkey "
            "JOIN supplier ON s_suppkey = l_suppkey "
            "JOIN nation ns ON ns.n_nationkey = s_nationkey "
            "JOIN orders ON o_orderkey = l_orderkey "
            "JOIN customer ON c_custkey = o_custkey "
            "JOIN nation nc ON nc.n_nationkey = c_nationkey "
            "JOIN region ON r_regionkey = nc.n_regionkey "
            f"WHERE r_name = '{region}' AND p_type = '{ptype}' "
            "AND o_orderdate >= TIMESTAMP '1995-01-01' "
            "AND o_orderdate < TIMESTAMP '1997-01-01') "
            "SELECT o_year, CAST(sum(u*tgt) AS BIGINT) AS units_nation, "
            "CAST(sum(u) AS BIGINT) AS units_total, "
            "CAST(CAST(sum(u*tgt) AS BIGINT) AS DOUBLE) "
            "/ CAST(CAST(sum(u) AS BIGINT) AS DOUBLE) AS mkt_share "
            "FROM v GROUP BY 1 ORDER BY 1"
        ).fetchdf()
        _assert_bitwise(got, want)


def test_q18_threshold_dataset_side_and_empty_typed(ray_session):
    """q18 thresholds Dataset-side (only qualifying orders reach the driver)
    and returns a typed empty frame when nothing qualifies (the empty
    to_pandas drops-columns rule)."""
    from orc_format_ray.pipelines.tpch import q18_large_orders

    got = q18_large_orders(SF, qty_units_threshold=10**9)
    assert len(got) == 0
    assert list(got.columns) == [
        "c_name", "o_custkey", "o_orderkey", "o_orderdate_us", "o_totalprice", "sum_qty_units"
    ]
    assert got["sum_qty_units"].dtype == np.int64

    # default threshold still matches the brute recompute
    li, od = _load("lineitem"), _load("orders")
    per = li.assign(u=np.floor(li["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)).groupby(
        "l_orderkey"
    )["u"].sum()
    big = set(per[per > 30_000].index.astype(int))
    got2 = q18_large_orders(SF)
    assert set(got2["o_orderkey"].astype(int)) <= big and len(got2) == min(len(big), 100)


def test_q1_orc_lake_matches_parquet_source(ray_session):
    """Storage independence: Q1 off the engine's own ORC lake (native
    projected read) must equal Q1 off parquet, bitwise."""
    import __ray_entry__ as entry_mod

    got = entry_mod.queries()["tpch_q1_orc_lake"](SF)
    from orc_format_ray.pipelines.tpch import q1_pricing_summary

    want = q1_pricing_summary(SF)
    assert list(got.columns) == list(want.columns) and len(got) == len(want)
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if a.dtype.kind == "f":
            assert np.array_equal(a.view(np.uint64), b.view(np.uint64)), c
        else:
            assert list(map(str, a)) == list(map(str, b)), c


def test_join_size_estimate_skewed_and_nulls(ray_session):
    """NDV estimate vs exact size on a skewed many-to-many join with null
    keys: nulls never match (SQL inner join), true = sum of count products,
    est = n_l*n_r // max(ndv)."""
    import ray.data

    from orc_format_ray.ops.profile import join_size_estimate

    left = pd.DataFrame({"k": [1, 1, 1, 1, 2, 3, None, None]}).astype({"k": "Int64"})
    right = pd.DataFrame({"k": [1, 1, 2, 4, None]}).astype({"k": "Int64"})
    got = join_size_estimate(
        ray.data.from_pandas(left).repartition(3),
        ray.data.from_pandas(right).repartition(2),
        key_left="k",
    )
    # non-null: left n=6 ndv=3, right n=4 ndv=3; true = 4*2 (k=1) + 1*1 (k=2) = 9
    assert got.iloc[0].to_dict() == {
        "n_left": 6, "n_right": 4, "ndv_left": 3, "ndv_right": 3,
        "est_rows": 8, "true_rows": 9,
        "est_over_true": float(np.float64(8) / np.float64(9)),
    }


def test_join_size_estimate_disjoint_zero_true(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import join_size_estimate

    got = join_size_estimate(
        ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3]})),
        ray.data.from_pandas(pd.DataFrame({"k": [7, 8]})),
        key_left="k",
    )
    row = got.iloc[0]
    assert row["true_rows"] == 0 and row["est_over_true"] == 0.0 and row["est_rows"] == 2


def test_shared_scan_equals_standalone_q1_q6(ray_session):
    """The one-pass shared scan reproduces BOTH standalone queries bitwise."""
    from orc_format_ray.pipelines.tpch import (
        q1_pricing_summary, q6_forecast_revenue, shared_scan_q1_q6,
    )

    long = shared_scan_q1_q6(SF)
    q1 = q1_pricing_summary(SF)
    q6 = q6_forecast_revenue(SF)
    for _, r in q1.iterrows():
        sub = long[
            (long["query"] == "q1")
            & (long["l_returnflag"] == r["l_returnflag"])
            & (long["l_linestatus"] == r["l_linestatus"])
        ].set_index("metric")["value"]
        for m in ("sum_qty", "sum_base_price", "sum_disc_price", "sum_charge",
                  "avg_qty", "avg_price", "avg_disc"):
            assert np.float64(sub[m]).view(np.uint64) == np.float64(r[m]).view(np.uint64), m
        assert sub["count_order"] == float(r["count_order"])
    s6 = long[long["query"] == "q6"].set_index("metric")["value"]
    assert np.float64(s6["revenue"]).view(np.uint64) == np.float64(q6["revenue"][0]).view(np.uint64)
    assert s6["n_rows"] == float(q6["n_rows"][0])
    assert len(long) == 8 * len(q1) + 2


def test_multi_agg_scan_matches_brute_with_nulls(ray_session):
    """One pass, two specs; null predicate values drop rows (SQL WHERE);
    quantize-then-sum units; keyless spec gets the '(all)' group."""
    import ray.data

    from orc_format_ray.ops.agg import multi_agg_scan

    df = pd.DataFrame(
        {
            "k": ["a", "b", "a", "c", "b", "a"],
            "x": [1.25, None, 3.5, 0.75, 2.0, None],
            "m": [10, 20, 30, 40, 50, 60],
        }
    )
    got = multi_agg_scan(
        ray.data.from_pandas(df).repartition(3),
        [
            {"name": "pos", "where": "x > 1.0", "keys": ["k"],
             "aggs": {"xc": ("x", 100), "n": ("count",)}},
            {"name": "tot", "where": None, "keys": [],
             "aggs": {"m_sum": ("m", None), "n": ("count",)}},
        ],
    )
    sub = df[df["x"] > 1.0]  # pandas > drops NaN like SQL WHERE
    want = {
        ("pos", g, "xc"): int(np.floor(s["x"].to_numpy() * 100 + 0.5).sum())
        for g, s in sub.groupby("k")
    } | {("pos", g, "n"): len(s) for g, s in sub.groupby("k")} | {
        ("tot", "(all)", "m_sum"): int(df["m"].sum()),
        ("tot", "(all)", "n"): len(df),
    }
    gotmap = {(r["query"], r["grp"], r["agg"]): int(r["value"]) for _, r in got.iterrows()}
    assert gotmap == want


def test_multi_agg_scan_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import multi_agg_scan

    ds = ray.data.from_pandas(pd.DataFrame({"k": [1.5], "x": [1.0]}))
    with pytest.raises(ValueError, match="unique"):
        multi_agg_scan(ds, [{"name": "a", "keys": [], "aggs": {"n": ("count",)}},
                            {"name": "a", "keys": [], "aggs": {"n": ("count",)}}])
    with pytest.raises(Exception, match="float group key"):
        multi_agg_scan(ds, [{"name": "a", "keys": ["k"], "aggs": {"n": ("count",)}}])
    with pytest.raises(Exception, match="quantize scale"):
        multi_agg_scan(ds, [{"name": "a", "keys": [], "aggs": {"s": ("x", None)}}])


def test_multi_agg_scan_empty_filter_semantics(ray_session):
    """A keyed spec whose filter matches nothing emits NO rows (SQL GROUP
    BY); a keyless spec still emits its '(all)' zero rows."""
    import ray.data

    from orc_format_ray.ops.agg import multi_agg_scan

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a"], "x": [1]}))
    got = multi_agg_scan(
        ds,
        [
            {"name": "none", "where": "x > 99", "keys": ["k"], "aggs": {"n": ("count",)}},
            {"name": "none_all", "where": "x > 99", "keys": [], "aggs": {"n": ("count",), "s": ("x", None)}},
        ],
    )
    gotmap = {(r["query"], r["grp"], r["agg"]): int(r["value"]) for _, r in got.iterrows()}
    assert gotmap == {("none_all", "(all)", "n"): 0, ("none_all", "(all)", "s"): 0}


def test_multi_agg_scan_random_specs_fuzz_vs_sql(ray_session):
    """Random (predicate, keys, quantized-agg) specs over lineitem vs
    mechanically generated SQL — pins the expr-compiler + shared-scan
    composition. Literals stay short decimals (the session-13 DECIMAL
    parse rule)."""
    import duckdb
    import ray.data

    from orc_format_ray.ops.agg import multi_agg_scan

    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF}/lineitem.parquet')")
    rng = np.random.default_rng(42)
    num_cols = ["l_quantity", "l_discount", "l_tax", "l_extendedprice"]
    lits = {"l_quantity": ["10", "25", "40"], "l_discount": ["0.02", "0.05", "0.08"],
            "l_tax": ["0.03", "0.06"], "l_extendedprice": ["20000", "50000"]}
    key_pool = ["l_returnflag", "l_linestatus"]
    for trial in range(5):
        specs, branches = [], []
        for si in range(int(rng.integers(1, 4))):
            col = num_cols[int(rng.integers(0, len(num_cols)))]
            op = [">=", "<", ">", "<="][int(rng.integers(0, 4))]
            lit = lits[col][int(rng.integers(0, len(lits[col])))]
            pred = f"{col} {op} {lit}"
            nk = int(rng.integers(0, 3))
            keys = list(rng.choice(key_pool, size=nk, replace=False))
            scol = num_cols[int(rng.integers(0, len(num_cols)))]
            kind = ["sum", "min", "max"][int(rng.integers(0, 3))]
            name = f"s{si}"
            specs.append({"name": name, "where": pred, "keys": keys,
                          "aggs": {"u": (scol, 100, kind), "n": ("count",)}})
            grp = (" || '|' || ".join(f"CAST({k} AS VARCHAR)" for k in keys)
                   if keys else "'(all)'")
            gb = f" GROUP BY {', '.join(keys)}" if keys else ""
            u_expr = f"CAST(floor({scol}*100 + 0.5) AS BIGINT)"
            if kind == "sum":
                co = (f"COALESCE(CAST(sum({u_expr}) AS BIGINT), 0)" if not keys
                      else f"CAST(sum({u_expr}) AS BIGINT)")
                having = ""
            else:
                co = f"CAST({kind}({u_expr}) AS BIGINT)"
                # keyless min/max over an empty selection: the engine emits
                # no row; HAVING mirrors that (keyed GROUP BY already does)
                having = " HAVING count(*) > 0" if not keys else ""
            branches.append(
                f"SELECT '{name}' AS query, {grp} AS grp, 'u' AS agg, {co} AS value "
                f"FROM lineitem WHERE {pred}{gb}{having}"
            )
            branches.append(
                f"SELECT '{name}', {grp}, 'n', CAST(count(*) AS BIGINT) "
                f"FROM lineitem WHERE {pred}{gb}"
            )
        ds = ray.data.read_parquet(f"{SF}/lineitem.parquet")
        got = multi_agg_scan(ds, specs)
        want = con.execute(
            "WITH lf AS (" + " UNION ALL ".join(branches) + ") "
            "SELECT query, grp, agg, value FROM lf ORDER BY query, grp, agg"
        ).fetchdf()
        _assert_bitwise(got, want)


def test_multi_agg_scan_min_max_kinds(ray_session):
    """min/max aggs fold exactly; keyless min/max over an EMPTY selection
    emits no row (SQL would yield NULL) while sum/count still emit 0."""
    import ray.data

    from orc_format_ray.ops.agg import multi_agg_scan

    df = pd.DataFrame({"k": ["a", "a", "b", "b", "b"], "x": [3.25, -1.5, 7.0, 2.0, 9.75]})
    got = multi_agg_scan(
        ray.data.from_pandas(df).repartition(3),
        [
            {"name": "mm", "where": None, "keys": ["k"],
             "aggs": {"lo": ("x", 100, "min"), "hi": ("x", 100, "max"), "s": ("x", 100, "sum")}},
            {"name": "none", "where": "x > 99", "keys": [],
             "aggs": {"lo": ("x", 100, "min"), "n": ("count",)}},
        ],
    )
    m = {(r["query"], r["grp"], r["agg"]): int(r["value"]) for _, r in got.iterrows()}
    assert m == {
        ("mm", "a", "lo"): -150, ("mm", "a", "hi"): 325, ("mm", "a", "s"): 175,
        ("mm", "b", "lo"): 200, ("mm", "b", "hi"): 975, ("mm", "b", "s"): 1875,
        ("none", "(all)", "n"): 0,  # no ('none','(all)','lo') row
    }
    with pytest.raises(ValueError, match="unknown agg kind"):
        multi_agg_scan(ray.data.from_pandas(df), [{"name": "z", "keys": [], "aggs": {"v": ("x", 100, "avg")}}])


# --- session-16 completion wave: Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21 --------------
# Oracle parity for all eight is pinned by test_driver_contract; these tests
# pin the engine-side invariants and edge behavior the SQL can't see.


def test_q2_keeps_all_min_ties_and_order(ray_session):
    from orc_format_ray.pipelines.tpch import q2_min_cost_supplier

    got = q2_min_cost_supplier(SF)
    assert len(got) > 0
    # per-part: every kept row carries that part's min cost
    mins = got.groupby("p_partkey")["cost_cents"].transform("min")
    assert (got["cost_cents"] == mins).all()
    # (p_partkey, s_suppkey) unique -> deterministic order
    assert not got.duplicated(["p_partkey", "s_suppkey"]).any()
    key = list(zip(-got["s_acctbal_cents"], got["n_name"], got["s_name"], got["p_partkey"]))
    assert key == sorted(key)


def test_q2_unknown_type_typed_empty(ray_session):
    from orc_format_ray.pipelines.tpch import q2_min_cost_supplier

    got = q2_min_cost_supplier(SF, ptype="NOSUCH")
    assert len(got) == 0 and list(got.columns)[0] == "s_acctbal_cents"


def test_q4_counts_match_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q4_priority_check

    got = q4_priority_check(SF)
    li, od = _load("lineitem", ["l_orderkey", "l_shipdate"]), _load("orders")
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1997-04-01")
    win = od[(od["o_orderdate"] >= lo) & (od["o_orderdate"] < hi)]
    m = li.merge(win[["o_orderkey", "o_orderdate"]], left_on="l_orderkey", right_on="o_orderkey")
    late = m[m["l_shipdate"] >= m["o_orderdate"] + pd.Timedelta(days=30)]["o_orderkey"].unique()
    exp = (
        win[win["o_orderkey"].isin(late)].groupby("o_orderpriority").size().sort_index()
    )
    assert dict(zip(got["o_orderpriority"], got["order_count"])) == exp.to_dict()


def test_q9_amount_is_rev_minus_retail_cost(ray_session):
    from orc_format_ray.pipelines.tpch import q9_product_profit

    got = q9_product_profit(SF)
    li = _load("lineitem")
    pt = _load("part")
    sup = _load("supplier")
    nat = _load("nation")
    od = _load("orders", ["o_orderkey", "o_orderdate"])
    pt = pt[pt["p_name"].str.contains("widget", regex=False)]
    m = (
        li.merge(pt[["p_partkey", "p_retailprice"]], left_on="l_partkey", right_on="p_partkey")
        .merge(sup[["s_suppkey", "s_nationkey"]], left_on="l_suppkey", right_on="s_suppkey")
        .merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
        .merge(od, left_on="l_orderkey", right_on="o_orderkey")
    )
    rev = _units(m["l_extendedprice"], m["l_discount"])
    cost = (
        np.floor(m["p_retailprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        * 100
        * m["l_quantity"].to_numpy().astype(np.int64)
    )
    m2 = pd.DataFrame(
        {
            "n_name": m["n_name"],
            "o_year": m["o_orderdate"].dt.year.astype(np.int64),
            "u": rev - cost,
        }
    )
    exp = m2.groupby(["n_name", "o_year"])["u"].sum()
    gmap = {(r.n_name, r.o_year): r.amount_units for r in got.itertuples()}
    assert gmap == exp.to_dict()


def test_q11_cut_scales_with_part_count(ray_session):
    from orc_format_ray.pipelines.tpch import q11_important_parts

    got = q11_important_parts(SF)
    assert len(got) > 0
    # every kept part's share strictly exceeds 1.5/nparts of the total;
    # recompute the threshold from the returned values' own distribution
    all_parts = q11_important_parts(SF, mult_num=0, mult_den=1)  # keep all
    total = int(all_parts["value_cents"].sum())
    nparts = len(all_parts)
    for v in got["value_cents"]:
        assert int(v) * nparts * 2 > total * 3
    kept = set(got["p_partkey"])
    for r in all_parts.itertuples():
        if int(r.value_cents) * nparts * 2 > total * 3:
            assert r.p_partkey in kept


def test_q12_high_low_partition(ray_session):
    from orc_format_ray.pipelines.tpch import q12_priority_lines

    got = q12_priority_lines(SF)
    li = _load("lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])
    od = _load("orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    m = li[(li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)].merge(
        od, left_on="l_orderkey", right_on="o_orderkey"
    )
    m = m[m["l_shipdate"] >= m["o_orderdate"] + pd.Timedelta(days=60)]
    assert int(got["high_line_count"].sum() + got["low_line_count"].sum()) == len(m)


def test_q16_excluded_supplier_never_counted(ray_session):
    from orc_format_ray.pipelines.tpch import q16_supplier_counts

    sup = _load("supplier")
    bad = set(sup.loc[sup["s_acctbal"] < 0, "s_suppkey"])
    got_all = q16_supplier_counts(SF)
    if not bad:
        # force an exclusion by flipping the filter via a direct recount
        assert (got_all["supplier_cnt"] > 0).all()
        return
    li = _load("lineitem", ["l_partkey", "l_suppkey"])
    pt = _load("part")
    size_set = {1, 4, 9, 14, 19, 23, 36, 45}
    pt = pt[(pt["p_brand"] != "Brand#5") & (pt["p_type"] != "PROMO") & (pt["p_size"].isin(size_set))]
    m = li.merge(pt, left_on="l_partkey", right_on="p_partkey")
    m = m[~m["l_suppkey"].isin(bad)]
    exp = (
        m.drop_duplicates(["p_brand", "p_type", "p_size", "l_suppkey"])
        .groupby(["p_brand", "p_type", "p_size"])
        .size()
    )
    gmap = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in got_all.itertuples()}
    assert gmap == {k: v for k, v in exp.to_dict().items()}


def test_q20_dominance_cut_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q20_excess_suppliers

    got = q20_excess_suppliers(SF)
    li = _load("lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    pt = _load("part", ["p_partkey", "p_name"])
    keys = set(pt.loc[pt["p_name"].str.contains("bolt", regex=False), "p_partkey"])
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    w = li[li["l_partkey"].isin(keys) & (li["l_shipdate"] >= lo) & (li["l_shipdate"] < hi)]
    pair = w.groupby(["l_partkey", "l_suppkey"])["l_quantity"].sum()
    tot = w.groupby("l_partkey")["l_quantity"].sum()
    good = {
        sk for (pk, sk), q in pair.items() if 2 * int(q) > int(tot[pk])
    }
    sup = _load("supplier")
    nat = _load("nation")
    reg = _load("region")
    rk = set(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"])
    nk = set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"])
    exp = sorted(
        sup.loc[sup["s_suppkey"].isin(good) & sup["s_nationkey"].isin(nk), "s_suppkey"]
    )
    assert sorted(got["s_suppkey"]) == exp


def test_q21_unique_late_blame_brute(ray_session):
    from orc_format_ray.pipelines.tpch import q21_waiting_suppliers

    got = q21_waiting_suppliers(SF)
    li = _load("lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])
    od = _load("orders", ["o_orderkey", "o_orderstatus"])
    fkeys = set(od.loc[od["o_orderstatus"] == "F", "o_orderkey"])
    pair = li.groupby(["l_orderkey", "l_suppkey"])["l_shipdate"].max().reset_index()
    pair = pair[pair["l_orderkey"].isin(fkeys)]
    blamed = {}
    for ok, g in pair.groupby("l_orderkey"):
        if len(g) < 2:
            continue
        mx = g["l_shipdate"].max()
        winners = g[g["l_shipdate"] == mx]
        if len(winners) == 1:
            sk = int(winners["l_suppkey"].iloc[0])
            blamed[sk] = blamed.get(sk, 0) + 1
    sup = _load("supplier")
    nat = _load("nation")
    reg = _load("region")
    rk = set(reg.loc[reg["r_name"] == "EUROPE", "r_regionkey"])
    nk = set(nat.loc[nat["n_regionkey"].isin(rk), "n_nationkey"])
    region_sk = set(sup.loc[sup["s_nationkey"].isin(nk), "s_suppkey"])
    exp = {k: v for k, v in blamed.items() if k in region_sk}
    assert dict(zip(got["s_suppkey"], got["numwait"])) == exp
