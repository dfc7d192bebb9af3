"""Composed multi-join analytics: TPC-H Q3 and Q5 shapes over the
synthetic star schema — the proof that the engine's join/agg primitives
compose into classic warehouse pipelines, with exact-integer revenue so
the driver can hash-compare against DuckDB running the literal SQL.

Revenue parity rule: ``rev_units = floor(l_extendedprice*100 + 0.5) *
(100 - floor(l_discount*100 + 0.5))`` — exact int64 per row (price cents
x discount-complement percent, guarded < 2^40), summed in int64 (guarded
< 2^53), divided ONCE by 10^4 for the dollar figure. Date cuts compare
exact integer microseconds (never float seconds — CLAUDE.md).

Scale shape (both queries):
- lineitem — the 100-TB table — is filtered and PARTIALLY PRE-AGGREGATED
  by its join key inside each batch before anything shuffles; only
  (orderkey, units[, nation]) metadata reaches the ONE bucketed
  ``hash_join`` against the date-filtered orders slice.
- true dimensions (customer segment slice, ASIA suppliers/customers,
  nation x region) broadcast once via ``ray.put`` with loud size guards
  (``max_broadcast_keys``) — at a scale where a "dimension" outgrows the
  guard, swap the broadcast for ops/join.semi_join_streaming /
  hash_join; the guard names that switch.
- the Q3 top-10 folds per-batch partial top-k, so the driver sees k rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from ..ops.fastagg import fast_groupby
from ..ops.join import hash_join

_UNIT_LIMIT = np.int64(1) << 40
_SUM_LIMIT = np.int64(1) << 53


def _ts_us(date_str: str) -> int:
    """Exact integer microseconds for a YYYY-MM-DD cut (never float)."""
    return int(pd.Timestamp(date_str).value // 1000)


def _rev_units(price: np.ndarray, disc: np.ndarray) -> np.ndarray:
    cents = np.floor(price * 100 + 0.5).astype(np.int64)
    dpct = np.floor(disc * 100 + 0.5).astype(np.int64)
    units = cents * (100 - dpct)
    if len(units) and np.abs(units).max() >= _UNIT_LIMIT:
        raise ValueError("per-row revenue unit exceeds 2^40 — price out of modeled range")
    return units


def _guard_sum(units: np.ndarray) -> None:
    if len(units) and np.abs(units).max() >= _SUM_LIMIT:
        raise ValueError("revenue sum exceeds exact-double range (2^53)")


def q3_shipping_priority(
    sf_dir: str,
    segment: str = "BUILDING",
    cut_date: str = "1998-01-01",
    k: int = 10,
    max_broadcast_keys: int = 1 << 26,
):
    """Top-k orders by pre-discount-adjusted revenue for one customer
    segment: lineitem shipped AFTER the cut, orders placed BEFORE it.
    Returns a driver DataFrame (o_orderkey, revenue_units, revenue,
    o_orderdate_ms, o_orderpriority) ordered by (units DESC, date, key).

    o_orderpriority stands in for TPC-H's o_shippriority (the synthetic
    orders table carries no shippriority column)."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(cut_date)

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).filter(lambda r: r["c_mktsegment"] == segment, **remote_args())
    cust_pdf = cust.to_pandas()
    # fully-empty Datasets drop columns in to_pandas (CLAUDE.md guard)
    cust_keys = (
        np.sort(cust_pdf["c_custkey"].to_numpy(np.int64))
        if len(cust_pdf)
        else np.zeros(0, np.int64)
    )
    if len(cust_keys) > max_broadcast_keys:
        raise ValueError(
            f"{len(cust_keys)} segment customers exceed max_broadcast_keys; "
            "switch the customer side to semi_join_streaming"
        )
    cust_ref = ray.put(cust_keys)

    def orders_sel(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, ck)
        np.clip(pos, 0, max(len(keys) - 1, 0), out=pos)
        hit = (keys[pos] == ck) if len(keys) else np.zeros(len(ck), bool)
        keep = (od < cut) & hit
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_orderdate_ms": pa.array((od[keep] // 1000).astype(np.int64)),
                "o_orderpriority": batch["o_orderpriority"].filter(pa.array(keep)),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def li_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = sd > cut
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(price, disc)
        uk, inv = np.unique(ok, return_inverse=True)
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table({"o_orderkey": pa.array(uk), "units_p": pa.array(partial)})

    li = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "o_orderkey",
        Sum("units_p", alias_name="revenue_units"),
    )
    )

    joined = hash_join(li, orders, key="o_orderkey")

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _guard_sum(batch["revenue_units"].to_numpy(np.int64))
        return batch.sort_values(
            ["revenue_units", "o_orderdate_ms", "o_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        ).head(k)

    cand = joined.map_batches(topk_partial, batch_format="pandas", **remote_args()).to_pandas()
    if len(cand) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame(
            {
                "o_orderkey": pd.Series([], dtype=np.int64),
                "revenue_units": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64),
                "o_orderdate_ms": pd.Series([], dtype=np.int64),
                "o_orderpriority": pd.Series([], dtype=object),
            }
        )
    out = (
        cand.sort_values(
            ["revenue_units", "o_orderdate_ms", "o_orderkey"],
            ascending=[False, True, True],
            kind="stable",
        )
        .head(k)
        .reset_index(drop=True)
    )
    out["revenue_units"] = out["revenue_units"].astype(np.int64)
    out["revenue"] = out["revenue_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    return out[["o_orderkey", "revenue_units", "revenue", "o_orderdate_ms", "o_orderpriority"]]


def q5_local_supplier_volume(
    sf_dir: str,
    region: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    max_broadcast_keys: int = 1 << 26,
):
    """Revenue by nation where supplier and customer share the nation,
    within one region and order-date year. Returns a driver DataFrame
    (n_name, revenue_units, revenue)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkeys = reg.loc[reg["r_name"] == region, "r_regionkey"]
    asia = nat[nat["n_regionkey"].isin(rkeys)]
    nation_name = dict(zip(asia["n_nationkey"].astype(np.int64), asia["n_name"]))
    nation_keys = np.sort(asia["n_nationkey"].to_numpy(np.int64))

    def _key_map(path: str, key: str, nk: str):
        t = pq.read_table(path, columns=[key, nk]).to_pandas()
        t = t[t[nk].isin(nation_keys)]
        if len(t) > max_broadcast_keys:
            raise ValueError(
                f"{len(t)} {key} rows exceed max_broadcast_keys; "
                "switch this dimension to hash_join"
            )
        keys = t[key].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        return keys[order], t[nk].to_numpy(np.int64)[order]

    supp_keys, supp_nat = _key_map(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey")
    cust_keys, cust_nat = _key_map(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey")
    import ray as _ray

    supp_ref = _ray.put((supp_keys, supp_nat))
    cust_ref = _ray.put((cust_keys, cust_nat))

    def li_partial(batch: pa.Table) -> pa.Table:
        skeys, snat = ray.get(supp_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(skeys, sk)
        np.clip(pos, 0, max(len(skeys) - 1, 0), out=pos)
        hit = (skeys[pos] == sk) if len(skeys) else np.zeros(len(sk), bool)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        nation = snat[pos[hit]]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[hit]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[hit]
        units = _rev_units(price, disc)
        # partial pre-agg by (orderkey, nation) shrinks the join shuffle
        grp = np.stack([ok, nation], axis=1)
        uk, inv = np.unique(grp, axis=0, return_inverse=True) if len(ok) else (
            np.zeros((0, 2), np.int64), np.zeros(0, np.int64))
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table(
            {
                "o_orderkey": pa.array(uk[:, 0]),
                "s_nation": pa.array(uk[:, 1]),
                "units_p": pa.array(partial),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def orders_sel(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    joined = hash_join(li, orders, key="o_orderkey")

    def local_only(batch: pa.Table) -> pa.Table:
        ckeys, cnat = ray.get(cust_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(ckeys, ck)
        np.clip(pos, 0, max(len(ckeys) - 1, 0), out=pos)
        hit = (ckeys[pos] == ck) if len(ckeys) else np.zeros(len(ck), bool)
        snat = batch["s_nation"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = hit & (cnat[pos] == snat) if len(ckeys) else np.zeros(len(ck), bool)
        return pa.table(
            {
                "nation": pa.array(snat[keep]),
                "units_p": batch["units_p"].filter(pa.array(keep)),
            }
        )

    per_nation = (fast_groupby(
        joined.map_batches(local_only, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "nation",
        Sum("units_p", alias_name="revenue_units"),
    )
        .to_pandas()
    )
    if len(per_nation) == 0:
        return pd.DataFrame(
            {
                "n_name": pd.Series([], dtype=object),
                "revenue_units": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64),
            }
        )
    per_nation["revenue_units"] = per_nation["revenue_units"].astype(np.int64)
    _guard_sum(per_nation["revenue_units"].to_numpy(np.int64))
    per_nation["n_name"] = per_nation["nation"].map(nation_name)
    per_nation["revenue"] = per_nation["revenue_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    per_nation = per_nation.sort_values(
        ["revenue_units", "n_name"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    return per_nation[["n_name", "revenue_units", "revenue"]]


def q1_pricing_summary(sf_dir: str, cut_date: str = "1998-09-02", source_ds=None):
    """TPC-H Q1 pricing summary: per (l_returnflag, l_linestatus) over rows
    shipped at-or-before the cut. Exact-int parity (the tpch revenue rule):
    every measure is cents / basis-point units ``floor(x*100 + 0.5)``
    summed in int64, with ONE float division per output cell —
    disc_price units = cents*(100-d), charge units = cents*(100-d)*(100+t),
    averages divide by ``count * 100.0``. Per-row unit guards back the
    int64 sums (numpy products wrap silently). Returns a driver DataFrame
    of |flags x statuses| rows ordered by (l_returnflag, l_linestatus).

    ``source_ds`` swaps the parquet scan for any Dataset carrying the seven
    Q1 columns (e.g. a projected native-ORC lake read) — storage-agnostic:
    the result must be identical whatever the source format.
    """
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(cut_date)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = sd <= cut
        tbl = batch.filter(pa.array(keep))
        q = tbl["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = tbl["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = tbl["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = tbl["l_tax"].to_numpy(zero_copy_only=False).astype(np.float64)
        qc = np.floor(q * 100 + 0.5).astype(np.int64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        db = np.floor(d * 100 + 0.5).astype(np.int64)
        tb = np.floor(t * 100 + 0.5).astype(np.int64)
        disc_u = cents * (100 - db)
        charge_u = disc_u * (100 + tb)
        if len(charge_u) and np.abs(charge_u).max() >= (np.int64(1) << 50):
            raise ValueError("per-row charge unit exceeds 2^50 — price out of modeled range")
        # pre-aggregate in-batch: the groupby input shrinks from O(rows)
        # to O(groups x blocks) — identical int64 sums, smaller shuffle
        flags = np.asarray(tbl["l_returnflag"].to_numpy(zero_copy_only=False), dtype="U")
        stats = np.asarray(tbl["l_linestatus"].to_numpy(zero_copy_only=False), dtype="U")
        combo = np.char.add(np.char.add(flags, "\x1f"), stats)
        uk, inv = np.unique(combo, return_inverse=True)
        cols = {}
        for name, vals in (
            ("qc", qc), ("pc", cents), ("db", db), ("du", disc_u), ("cu", charge_u),
            ("n_p", np.ones(len(combo), np.int64)),
        ):
            acc = np.zeros(len(uk), np.int64)
            np.add.at(acc, inv, vals)
            cols[name] = pa.array(acc)
        parts = [u.split("\x1f") for u in uk]
        return pa.table(
            {
                "l_returnflag": pa.array([x[0] for x in parts]),
                "l_linestatus": pa.array([x[1] for x in parts]),
                **cols,
            }
        )

    ds = source_ds if source_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=[
            "l_returnflag", "l_linestatus", "l_shipdate",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        ],
    )
    out = fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["l_returnflag", "l_linestatus"],
        Sum("qc", alias_name="sum_qc"),
        Sum("pc", alias_name="sum_pc"),
        Sum("db", alias_name="sum_db"),
        Sum("du", alias_name="sum_du"),
        Sum("cu", alias_name="sum_cu"),
        Sum("n_p", alias_name="count_order"),
    )
    df = out.to_pandas()
    if len(df) == 0:
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series(dtype=object),
                "l_linestatus": pd.Series(dtype=object),
                "sum_qty": pd.Series(dtype="float64"),
                "sum_base_price": pd.Series(dtype="float64"),
                "sum_disc_price": pd.Series(dtype="float64"),
                "sum_charge": pd.Series(dtype="float64"),
                "avg_qty": pd.Series(dtype="float64"),
                "avg_price": pd.Series(dtype="float64"),
                "avg_disc": pd.Series(dtype="float64"),
                "count_order": pd.Series(dtype="int64"),
            }
        )
    for c in ("sum_qc", "sum_pc", "sum_db", "sum_du", "sum_cu", "count_order"):
        df[c] = df[c].astype("int64")
        _guard_sum(df[c].to_numpy(np.int64))
    n100 = df["count_order"].to_numpy(np.int64) * np.float64(100.0)
    res = pd.DataFrame(
        {
            "l_returnflag": df["l_returnflag"],
            "l_linestatus": df["l_linestatus"],
            "sum_qty": df["sum_qc"].to_numpy(np.int64) / np.float64(100.0),
            "sum_base_price": df["sum_pc"].to_numpy(np.int64) / np.float64(100.0),
            "sum_disc_price": df["sum_du"].to_numpy(np.int64) / np.float64(10000.0),
            "sum_charge": df["sum_cu"].to_numpy(np.int64) / np.float64(1000000.0),
            "avg_qty": df["sum_qc"].to_numpy(np.int64) / n100,
            "avg_price": df["sum_pc"].to_numpy(np.int64) / n100,
            "avg_disc": df["sum_db"].to_numpy(np.int64) / n100,
            "count_order": df["count_order"],
        }
    )
    return res.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def q6_forecast_revenue(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_cut: float = 24.0,
    source_ds=None,
):
    """TPC-H Q6 forecasting revenue change: one global sum over lineitem
    rows in a ship-date year with discount in a band and small quantity.
    Returns a one-row driver DataFrame (n_rows, revenue_units, revenue).

    Parity: the discount/quantity filters compare the RAW stored doubles
    (exactly what SQL BETWEEN does — never the quantized units); revenue
    units = cents(price) * bp(discount) in exact int64, folded in Python
    ints on the driver, ONE /10000.0 division. Stateless single pass —
    each block reduces to one partial row; no shuffle at all.
    ``source_ds`` substitutes any Dataset carrying the four columns (the
    storage-independence hook, like q1_pricing_summary's)."""
    import ray.data

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        d = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = (sd >= lo) & (sd < hi) & (d >= disc_lo) & (d <= disc_hi) & (q < qty_cut)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        db = np.floor(d[keep] * 100 + 0.5).astype(np.int64)
        cents = np.floor(p * 100 + 0.5).astype(np.int64)
        units = cents * db
        if len(units) and np.abs(units).max() >= _UNIT_LIMIT:
            raise ValueError("per-row discount-revenue unit exceeds 2^40")
        return pa.table(
            {
                "n": pa.array([int(keep.sum())], pa.int64()),
                "u": pa.array([int(units.sum())], pa.int64()),
            }
        )

    src_ds = source_ds if source_ds is not None else ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    parts = (
        src_ds
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    n = int(parts["n"].sum())
    units = sum(int(v) for v in parts["u"])  # exact Python-int fold
    return pd.DataFrame(
        {
            "n_rows": [n],
            "revenue_units": [units],
            "revenue": [float(np.float64(units) / np.float64(10000.0))],
        }
    )


def q10_returned_items(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    k: int = 20,
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q10 returned-item reporting: top-k customers by revenue lost to
    'R'-flag returns for orders placed in one quarter. Returns a driver
    DataFrame (c_custkey, c_name, n_name, revenue_units, revenue) ordered
    by (units DESC, custkey) — the deterministic tie rule both sides.

    Plan (the q3 shape): the quarter's orders broadcast as sorted
    (o_orderkey -> o_custkey) arrays (guarded); lineitem filters 'R' rows,
    maps order->customer inside each task and pre-aggregates per batch;
    ONE small groupby(custkey); per-block top-k prune feeds the driver
    pick; names/nations attach driver-side for the k winners only."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)

    opdf = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).to_pandas()
    od = opdf["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
    win = opdf[(od >= lo) & (od < hi)]
    if len(win) > max_broadcast_keys:
        raise ValueError(
            f"{len(win)} quarter orders exceed max_broadcast_keys; "
            "switch the orders side to hash_join"
        )
    okeys = win["o_orderkey"].to_numpy(np.int64)
    order = np.argsort(okeys, kind="stable")
    okeys = okeys[order]
    ocust = win["o_custkey"].to_numpy(np.int64)[order]
    omap_ref = ray.put((okeys, ocust))

    def li_partial(batch: pa.Table) -> pa.Table:
        keys, cust = ray.get(omap_ref)
        flag = pc.equal(batch["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(keys, ok)
        np.clip(pos, 0, max(len(keys) - 1, 0), out=pos)
        hit = (keys[pos] == ok) if len(keys) else np.zeros(len(ok), bool)
        keep = flag & hit
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(price, disc)
        ck = cust[pos[keep]]
        uk, inv = np.unique(ck, return_inverse=True)
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table({"c_custkey": pa.array(uk), "units_p": pa.array(partial)})

    rev = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )
        .map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "c_custkey",
        Sum("units_p", alias_name="revenue_units"),
    )
    )

    def topk_partial(batch: pd.DataFrame) -> pd.DataFrame:
        _guard_sum(batch["revenue_units"].to_numpy(np.int64))
        return batch.sort_values(
            ["revenue_units", "c_custkey"], ascending=[False, True], kind="stable"
        ).head(k)

    cand = rev.map_batches(topk_partial, batch_format="pandas", **remote_args()).to_pandas()
    empty = pd.DataFrame(
        {
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "revenue_units": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64),
        }
    )
    if len(cand) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return empty
    top = (
        cand.sort_values(["revenue_units", "c_custkey"], ascending=[False, True], kind="stable")
        .head(k)
        .reset_index(drop=True)
    )
    cpdf = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name", "c_nationkey"]
    ).to_pandas()
    cpdf = cpdf[cpdf["c_custkey"].isin(top["c_custkey"])]
    npdf = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    out = top.merge(cpdf, on="c_custkey").merge(
        npdf, left_on="c_nationkey", right_on="n_nationkey"
    )
    out = out.sort_values(["revenue_units", "c_custkey"], ascending=[False, True], kind="stable")
    out["revenue_units"] = out["revenue_units"].astype(np.int64)
    out["revenue"] = out["revenue_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    return out[["c_custkey", "c_name", "n_name", "revenue_units", "revenue"]].reset_index(drop=True)


def q14_promo_revenue(sf_dir: str, date_lo: str = "1995-09-01", date_hi: str = "1995-10-01"):
    """TPC-H Q14 promotion effect: the share of one ship-month's revenue
    on PROMO parts. Returns a one-row DataFrame
    (promo_units, total_units, promo_pct).

    Scale shape: part is the SMALL side — the PROMO partkey set broadcasts
    once via ray.put and every lineitem batch probes it vectorized
    (np.isin); no shuffle at all. Parity: revenue units are the exact
    tpch cents*(100-bp) ints (per-row < 2^40 guarded, Python-int fold);
    promo_pct is the mirrored ``100.0 * CAST(p AS DOUBLE) / CAST(t AS
    DOUBLE)`` expression."""
    import ray
    import ray.data

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)

    promo = (
        ray.data.read_parquet(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
        .map_batches(
            lambda b: b.filter(
                __import__("pyarrow").compute.starts_with(b["p_type"], "PROMO")
            ).select(["p_partkey"]),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        )
        .to_pandas()
    )
    promo_ref = ray.put(np.sort(promo["p_partkey"].to_numpy(dtype=np.int64)))

    def partial(batch: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(promo_ref)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False)[keep]
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        d = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(p, d)
        _guard_sum(units)
        is_promo = np.isin(pk, keys)
        return pa.table(
            {
                "pu": pa.array([int(units[is_promo].sum())], pa.int64()),
                "tu": pa.array([int(units.sum())], pa.int64()),
            }
        )

    parts = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_shipdate", "l_partkey", "l_extendedprice", "l_discount"],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    pu = sum(int(v) for v in parts["pu"])
    tu = sum(int(v) for v in parts["tu"])
    if tu == 0:
        raise ValueError("q14: no rows in the ship-date window")
    # mirrored op-for-op by the SQL oracle (left-assoc: (100.0 * p) / t)
    pct = float(np.float64(100.0) * np.float64(pu) / np.float64(tu))
    return pd.DataFrame({"promo_units": [pu], "total_units": [tu], "promo_pct": [pct]})


def q18_large_orders(sf_dir: str, qty_units_threshold: int = 30_000, k: int = 100):
    """TPC-H Q18 large-volume customers: orders whose line quantities sum
    past the threshold (exact cent-units — 300.0 == 30_000 units), top-k
    by (o_totalprice DESC, o_orderdate, o_orderkey — the extra key makes
    the cut deterministic where the spec leaves ties open; keep the SQL
    mirror's ORDER BY in sync). Returns (c_name, o_custkey, o_orderkey,
    o_orderdate_us, o_totalprice, sum_qty_units).

    Scale shape: per-order quantity partials pre-aggregate inside every
    batch, ONE metadata groupby folds them, the qualifying key set (tiny
    by construction) broadcasts, and orders/customer stream filtered —
    lineitem payloads never shuffle."""
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    def qty_partial(batch: pa.Table) -> pa.Table:
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        u = np.floor(q * 100 + 0.5).astype(np.int64)
        t = pa.table({"k": batch["l_orderkey"], "u": pa.array(u, pa.int64())})
        return t.group_by("k").aggregate([("u", "sum")]).rename_columns(["k", "u"])

    def over_threshold(batch: pa.Table) -> pa.Table:
        u = batch["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(u > qty_units_threshold))

    # threshold Dataset-side: only the qualifying orders (tiny by
    # construction) reach the driver, never the full per-order table
    big = (fast_groupby(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "k",
        Sum("u", alias_name="u"),
    )
        .map_batches(over_threshold, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    if len(big) == 0:  # empty to_pandas drops columns (CLAUDE.md)
        big = pd.DataFrame({"k": pd.Series([], dtype=np.int64), "u": pd.Series([], dtype=np.int64)})
    qty_map = dict(zip(big["k"].astype("int64"), big["u"].astype("int64")))
    keys_ref = ray.put(np.sort(big["k"].to_numpy(dtype=np.int64)))

    def orders_sel(batch: pa.Table) -> pa.Table:
        import ray as _ray

        keys = _ray.get(keys_ref)
        ok = batch["o_orderkey"].to_numpy(zero_copy_only=False)
        keep = np.isin(ok, keys)
        return batch.filter(pa.array(keep)).select(
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
        )

    orders = (
        ray.data.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
        )
        .map_batches(orders_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    if len(orders) == 0:  # zero qualifying orders: typed empty (to_pandas drops columns)
        return pd.DataFrame(
            {
                "c_name": pd.Series([], dtype=object),
                "o_custkey": pd.Series([], dtype=np.int64),
                "o_orderkey": pd.Series([], dtype=np.int64),
                "o_orderdate_us": pd.Series([], dtype=np.int64),
                "o_totalprice": pd.Series([], dtype=np.float64),
                "sum_qty_units": pd.Series([], dtype=np.int64),
            }
        )
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    out = orders.merge(cust, left_on="o_custkey", right_on="c_custkey", how="left")
    out["o_orderdate_us"] = out["o_orderdate"].astype("datetime64[us]").astype("int64")
    out["sum_qty_units"] = out["o_orderkey"].map(qty_map).astype("int64")
    out = out.sort_values(
        ["o_totalprice", "o_orderdate_us", "o_orderkey"],
        ascending=[False, True, True], kind="mergesort",
    ).head(k)
    return out[
        ["c_name", "o_custkey", "o_orderkey", "o_orderdate_us", "o_totalprice", "sum_qty_units"]
    ].reset_index(drop=True)


def _sorted_lookup(keys: np.ndarray, probe: np.ndarray) -> np.ndarray:
    """Membership mask of `probe` in the sorted key array `keys`."""
    if len(keys) == 0:
        return np.zeros(len(probe), bool)
    pos = np.searchsorted(keys, probe)
    np.clip(pos, 0, len(keys) - 1, out=pos)
    return keys[pos] == probe


def _sorted_map(keys: np.ndarray, vals: np.ndarray, probe: np.ndarray):
    """(hit mask, mapped values at hits' positions) for sorted keys→vals."""
    if len(keys) == 0:
        return np.zeros(len(probe), bool), np.zeros(0, vals.dtype)
    pos = np.searchsorted(keys, probe)
    np.clip(pos, 0, len(keys) - 1, out=pos)
    hit = keys[pos] == probe
    return hit, vals[pos[hit]]


def q7_nation_volume(
    sf_dir: str,
    nation_a: str = "NATION_10",
    nation_b: str = "NATION_12",
    date_lo: str = "1996-01-01",
    date_hi: str = "1998-01-01",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q7 shape: shipping volume between two nations by ship-year —
    supplier nation on the lineitem side, customer nation on the orders
    side, keep only the two cross pairs. Revenue follows the exact-cents
    unit rule (cents * (100-d), int64 sums, ONE /10000 division).
    Returns (supp_nation, cust_nation, l_year, revenue_units, revenue)
    sorted by the three keys. Scale: dimensions broadcast once (guarded);
    lineitem partially pre-aggregates by (orderkey, nation, year) before
    the single bucketed hash_join against the projected orders slice."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    ids = {n: k for k, n in zip(nat["n_nationkey"].astype(np.int64), nat["n_name"])}
    if nation_a not in ids or nation_b not in ids:
        raise ValueError(f"unknown nation(s): {nation_a!r}, {nation_b!r}")
    na, nb = ids[nation_a], ids[nation_b]
    names = {na: nation_a, nb: nation_b}

    def _dim(path: str, key: str, nk: str):
        t = pq.read_table(path, columns=[key, nk]).to_pandas()
        t = t[t[nk].isin([na, nb])]
        if len(t) > max_broadcast_keys:
            raise ValueError(f"{len(t)} {key} rows exceed max_broadcast_keys")
        keys = t[key].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        return keys[order], t[nk].to_numpy(np.int64)[order]

    supp_ref = ray.put(_dim(f"{sf_dir}/supplier.parquet", "s_suppkey", "s_nationkey"))
    cust_ref = ray.put(_dim(f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey"))

    def li_partial(batch: pa.Table) -> pa.Table:
        skeys, snat = ray.get(supp_ref)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit = _sorted_lookup(skeys, sk) & keep
        nation = _sorted_map(skeys, snat, sk[hit])[1]
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        year = pc.year(batch["l_shipdate"]).to_numpy(zero_copy_only=False).astype(np.int64)[hit]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[hit]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[hit]
        units = _rev_units(price, disc)
        grp = np.stack([ok, nation, year], axis=1) if len(ok) else np.zeros((0, 3), np.int64)
        uk, inv = (np.unique(grp, axis=0, return_inverse=True) if len(ok)
                   else (np.zeros((0, 3), np.int64), np.zeros(0, np.int64)))
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table(
            {
                "o_orderkey": pa.array(uk[:, 0]),
                "s_nation": pa.array(uk[:, 1]),
                "l_year": pa.array(uk[:, 2]),
                "units_p": pa.array(partial),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    joined = hash_join(li, orders, key="o_orderkey")

    def cross_pairs(batch: pa.Table) -> pa.Table:
        ckeys, cnat = ray.get(cust_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ckeys):
            pos = np.searchsorted(ckeys, ck)
            np.clip(pos, 0, len(ckeys) - 1, out=pos)
            hit = ckeys[pos] == ck
            cn = np.where(hit, cnat[pos], np.int64(-1))
        else:
            cn = np.full(len(ck), -1, np.int64)
        sn = batch["s_nation"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ((sn == na) & (cn == nb)) | ((sn == nb) & (cn == na))
        return pa.table(
            {
                "s_nation": pa.array(sn[keep]),
                "c_nation": pa.array(cn[keep]),
                "l_year": batch["l_year"].filter(pa.array(keep)),
                "units_p": batch["units_p"].filter(pa.array(keep)),
            }
        )

    per = (fast_groupby(
        joined.map_batches(cross_pairs, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["s_nation", "c_nation", "l_year"],
        Sum("units_p", alias_name="revenue_units"),
    )
        .to_pandas()
    )
    if len(per) == 0:
        return pd.DataFrame(
            {
                "supp_nation": pd.Series([], dtype=object),
                "cust_nation": pd.Series([], dtype=object),
                "l_year": pd.Series([], dtype=np.int64),
                "revenue_units": pd.Series([], dtype=np.int64),
                "revenue": pd.Series([], dtype=np.float64),
            }
        )
    per["revenue_units"] = per["revenue_units"].astype(np.int64)
    _guard_sum(per["revenue_units"].to_numpy(np.int64))
    per["supp_nation"] = per["s_nation"].map(names)
    per["cust_nation"] = per["c_nation"].map(names)
    per["l_year"] = per["l_year"].astype(np.int64)
    per["revenue"] = per["revenue_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    per = per.sort_values(["supp_nation", "cust_nation", "l_year"], kind="stable").reset_index(drop=True)
    return per[["supp_nation", "cust_nation", "l_year", "revenue_units", "revenue"]]


def q8_market_share(
    sf_dir: str,
    nation: str = "NATION_12",
    region: str = "ASIA",
    p_type: str = "PROMO",
    date_lo: str = "1995-01-01",
    date_hi: str = "1997-01-01",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q8 shape: a supplier nation's market share of a part-type's
    revenue sold into one region, by order year. Share is ONE double
    division of two exact-int64 unit sums (the cents*(100-d) rule) so the
    driver hash-compares bitwise against DuckDB.

    Scale shape: three dims broadcast once with loud guards (the type's
    partkeys, supplier->nation, the region's custkeys); lineitem partially
    pre-aggregates by (orderkey, is-target-nation) inside each batch so
    only that metadata reaches the ONE bucketed hash_join against the
    date-filtered orders slice. Returns (o_year, units_nation,
    units_total, mkt_share) sorted by year."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    if nation not in set(nat["n_name"]):
        raise ValueError(f"unknown nation {nation!r}")
    if region not in set(reg["r_name"]):
        raise ValueError(f"unknown region {region!r}")
    target = int(nat.loc[nat["n_name"] == nation, "n_nationkey"].iloc[0])
    rkey = int(reg.loc[reg["r_name"] == region, "r_regionkey"].iloc[0])
    region_nations = set(
        nat.loc[nat["n_regionkey"] == rkey, "n_nationkey"].astype(int)
    )

    def _bcast_sorted(path: str, key: str, mask_col: str | None, keep) -> "np.ndarray":
        cols = [key] + ([mask_col] if mask_col else [])
        t = pq.read_table(path, columns=cols).to_pandas()
        if mask_col is not None:
            t = t[t[mask_col].map(keep)]
        k = np.sort(t[key].to_numpy(np.int64))
        if len(k) > max_broadcast_keys:
            raise ValueError(f"{len(k)} {key} keys exceed max_broadcast_keys")
        return k

    parts_ref = ray.put(
        _bcast_sorted(f"{sf_dir}/part.parquet", "p_partkey", "p_type", lambda v: v == p_type)
    )
    cust_ref = ray.put(
        _bcast_sorted(
            f"{sf_dir}/customer.parquet", "c_custkey", "c_nationkey",
            lambda v: int(v) in region_nations,
        )
    )
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]).to_pandas()
    sk = sup["s_suppkey"].to_numpy(np.int64)
    order = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[order], sup["s_nationkey"].to_numpy(np.int64)[order]))

    def li_partial(batch: pa.Table) -> pa.Table:
        pkeys = ray.get(parts_ref)
        skeys, snat = ray.get(supp_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _sorted_lookup(pkeys, pk)
        sup_k = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit, snk = _sorted_map(skeys, snat, sup_k)
        keep &= hit
        nk = np.zeros(len(pk), np.int64)
        nk[hit] = snk
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        tgt = (nk[keep] == target).astype(np.int64)
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(price, disc)
        grp = np.stack([ok, tgt], axis=1) if len(ok) else np.zeros((0, 2), np.int64)
        uk, inv = (np.unique(grp, axis=0, return_inverse=True) if len(ok)
                   else (np.zeros((0, 2), np.int64), np.zeros(0, np.int64)))
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table(
            {
                "o_orderkey": pa.array(uk[:, 0]),
                "tgt": pa.array(uk[:, 1]),
                "units_p": pa.array(partial),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def orders_sel(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (od >= lo) & (od < hi)
        year = pc.year(batch["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "o_custkey": batch["o_custkey"].filter(pa.array(keep)),
                "o_year": pa.array(year),
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(orders_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    joined = hash_join(li, orders, key="o_orderkey")

    def region_filter(batch: pa.Table) -> pa.Table:
        ckeys = ray.get(cust_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _sorted_lookup(ckeys, ck)
        u = batch["units_p"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        tgt = batch["tgt"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        return pa.table(
            {
                "o_year": batch["o_year"].filter(pa.array(keep)),
                "units_nat_p": pa.array(u * tgt),
                "units_tot_p": pa.array(u),
            }
        )

    per = (fast_groupby(
        joined.map_batches(region_filter, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "o_year",
        Sum("units_nat_p", alias_name="units_nation"),
            Sum("units_tot_p", alias_name="units_total"),
    )
        .to_pandas()
    )
    if len(per) == 0:
        return pd.DataFrame(
            {
                "o_year": pd.Series([], dtype=np.int64),
                "units_nation": pd.Series([], dtype=np.int64),
                "units_total": pd.Series([], dtype=np.int64),
                "mkt_share": pd.Series([], dtype=np.float64),
            }
        )
    per["units_nation"] = per["units_nation"].astype(np.int64)
    per["units_total"] = per["units_total"].astype(np.int64)
    _guard_sum(per["units_total"].to_numpy(np.int64))
    per["o_year"] = per["o_year"].astype(np.int64)
    per["mkt_share"] = (
        per["units_nation"].to_numpy(np.int64).astype(np.float64)
        / per["units_total"].to_numpy(np.int64).astype(np.float64)
    )
    per = per.sort_values("o_year", kind="stable").reset_index(drop=True)
    return per[["o_year", "units_nation", "units_total", "mkt_share"]]


def q13_customer_distribution(sf_dir: str, max_broadcast_keys: int = 1 << 26):
    """TPC-H Q13 shape: distribution of per-customer order counts,
    including the zero bucket (customers with no orders). All-integer
    counts — hash-exact against the SQL LEFT JOIN + two GROUP BYs.

    Scale shape: orders pre-count by custkey inside each batch, ONE
    metadata groupby folds per-customer counts, a SECOND per-batch
    partial counts-of-counts feeds the (tiny) distribution groupby;
    order payloads never shuffle. The customer keyset broadcasts once
    (guarded) to mirror the join's FK semantics and to size the zero
    bucket. Returns (c_count, custdist) sorted custdist DESC, c_count
    DESC (deterministic: c_count is unique per row)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ckeys = np.sort(
        pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])["c_custkey"]
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    n_customers = len(ckeys)
    if n_customers > max_broadcast_keys:
        raise ValueError(f"{n_customers} customer keys exceed max_broadcast_keys")
    cust_ref = ray.put(ckeys)

    def count_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(cust_ref)
        ck = batch["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck = ck[_sorted_lookup(keys, ck)]
        uk, cnt = np.unique(ck, return_counts=True)
        return pa.table({"c_custkey": pa.array(uk), "n_p": pa.array(cnt.astype(np.int64))})

    def dist_partial(batch: pa.Table) -> pa.Table:
        c = batch["c_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        uk, cnt = np.unique(c, return_counts=True)
        return pa.table({"c_count": pa.array(uk), "d_p": pa.array(cnt.astype(np.int64))})

    # ONE chained execution: orders -> per-customer counts -> counts-of-counts.
    # No materialize/count() round-trips — customers-with-orders is just the
    # distribution's total (every positive c_count row counts one customer).
    dist = (fast_groupby(
        fast_groupby(
        ray.data.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
        .map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "c_custkey",
        Sum("n_p", alias_name="c_count"),
    )
        .map_batches(dist_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "c_count",
        Sum("d_p", alias_name="custdist"),
    )
        .to_pandas()
    )
    if len(dist) == 0:  # no orders at all: typed empty (to_pandas drops columns)
        dist = pd.DataFrame(
            {"c_count": pd.Series([], dtype=np.int64), "custdist": pd.Series([], dtype=np.int64)}
        )
    dist["c_count"] = dist["c_count"].astype(np.int64)
    dist["custdist"] = dist["custdist"].astype(np.int64)
    zero = n_customers - int(dist["custdist"].sum())
    if zero > 0:
        dist = pd.concat(
            [dist, pd.DataFrame({"c_count": [np.int64(0)], "custdist": [np.int64(zero)]})],
            ignore_index=True,
        )
    dist = dist.sort_values(
        ["custdist", "c_count"], ascending=[False, False], kind="mergesort"
    ).reset_index(drop=True)
    return dist[["c_count", "custdist"]]


def q15_top_supplier(
    sf_dir: str,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q15 shape: supplier(s) with the maximum quarter revenue —
    ALL ties kept, exactly like the spec's `= (select max(...))`. The
    exact-int unit rule makes the max comparison exact (no float ties).

    Scale shape: lineitem pre-aggregates revenue units by suppkey per
    batch; ONE metadata groupby folds them; the folded table stays a
    Dataset (rows = suppliers with sales) — the global max folds via a
    per-batch partial max and only the winners' rows reach the driver.
    Supplier names come from a broadcast dim lookup (guarded). Returns
    (s_suppkey, s_name, total_units, total_revenue) sorted by suppkey."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Max, Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)

    def rev_partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(price, disc)
        uk, inv = np.unique(sk, return_inverse=True)
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, units)
        return pa.table({"s_suppkey": pa.array(uk), "u_p": pa.array(partial)})

    per_supp = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
        )
        .map_batches(rev_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "s_suppkey",
        Sum("u_p", alias_name="total_units"),
    )
        .materialize()
    )
    if per_supp.count() == 0:
        return pd.DataFrame(
            {
                "s_suppkey": pd.Series([], dtype=np.int64),
                "s_name": pd.Series([], dtype=object),
                "total_units": pd.Series([], dtype=np.int64),
                "total_revenue": pd.Series([], dtype=np.float64),
            }
        )
    mx = int(per_supp.aggregate(Max("total_units"))["max(total_units)"])

    def winners_only(batch: pa.Table) -> pa.Table:
        u = batch["total_units"].to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(u == mx))

    win = (
        per_supp.map_batches(winners_only, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    sup = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]).to_pandas()
    if len(sup) > max_broadcast_keys:
        raise ValueError(f"{len(sup)} supplier rows exceed max_broadcast_keys")
    out = win.merge(sup, on="s_suppkey", how="left")
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["total_units"] = out["total_units"].astype(np.int64)
    _guard_sum(out["total_units"].to_numpy(np.int64))
    out["total_revenue"] = out["total_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    out = out.sort_values("s_suppkey", kind="mergesort").reset_index(drop=True)
    return out[["s_suppkey", "s_name", "total_units", "total_revenue"]]


def q17_small_quantity_revenue(
    sf_dir: str,
    brand: str = "Brand#23",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q17 shape: yearly revenue lost if small-quantity orders for
    one brand's parts were dropped. The spec's `l_quantity < 0.2 *
    avg(l_quantity)` becomes the EXACT integer inequality `5 * qty * cnt
    < sum_qty` (quantities are integral — guarded loudly) so the cut is
    bit-identical on both sides; the SQL oracle uses the same integer
    form. Returns ONE row (price_cents, avg_yearly) where avg_yearly =
    CAST(cents AS DOUBLE) / 700.0 (the one division).

    Scale shape: the brand's partkeys broadcast once; pass A folds
    per-part (sum_qty, cnt) via per-batch partials + ONE metadata
    groupby (rows = parts of one brand — tiny, guarded); pass B streams
    lineitem again filtering each row against the broadcast per-part
    stats. Lineitem never shuffles."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]).to_pandas()
    pkeys = np.sort(pt.loc[pt["p_brand"] == brand, "p_partkey"].to_numpy(np.int64))
    if len(pkeys) > max_broadcast_keys:
        raise ValueError(f"{len(pkeys)} brand partkeys exceed max_broadcast_keys")
    parts_ref = ray.put(pkeys)

    def qty_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(parts_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _sorted_lookup(keys, pk)
        pk = pk[keep]
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        if len(q) and not np.all(q == np.floor(q)):
            raise ValueError("q17 exact-integer cut needs integral quantities")
        qi = q.astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, qi)
        cnt = np.bincount(inv, minlength=len(uk)).astype(np.int64)
        return pa.table(
            {"l_partkey": pa.array(uk), "sq_p": pa.array(sq), "cnt_p": pa.array(cnt)}
        )

    li_cols = ["l_partkey", "l_quantity", "l_extendedprice"]
    stats = (fast_groupby(
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols[:2])
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "l_partkey",
        Sum("sq_p", alias_name="sq"), Sum("cnt_p", alias_name="cnt"),
    )
        .to_pandas()
    )
    if len(stats) == 0:  # empty Dataset to_pandas drops columns (CLAUDE.md)
        stats = pd.DataFrame(
            {
                "l_partkey": pd.Series([], dtype=np.int64),
                "sq": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64),
            }
        )
    skeys = stats["l_partkey"].to_numpy(np.int64)
    order = np.argsort(skeys, kind="stable")
    stats_ref = ray.put(
        (skeys[order], stats["sq"].to_numpy(np.int64)[order], stats["cnt"].to_numpy(np.int64)[order])
    )

    def pick_partial(batch: pa.Table) -> pa.Table:
        keys, sq, cnt = ray.get(stats_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0:
            return pa.table({"cents_p": pa.array(np.zeros(0, np.int64))})
        pos = np.searchsorted(keys, pk)
        np.clip(pos, 0, len(keys) - 1, out=pos)
        hit = keys[pos] == pk
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        if len(q) and not np.all(q[hit] == np.floor(q[hit])):
            raise ValueError("q17 exact-integer cut needs integral quantities")
        qi = q.astype(np.int64)
        small = hit & (5 * qi * cnt[pos] < sq[pos])
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[small]
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        return pa.table({"cents_p": pa.array(np.array([cents.sum()], np.int64))})

    parts_sum = (
        ray.data.read_parquet(f"{sf_dir}/lineitem.parquet", columns=li_cols)
        .map_batches(pick_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    total = np.int64(parts_sum["cents_p"].to_numpy(np.int64).sum()) if len(parts_sum) else np.int64(0)
    _guard_sum(np.array([total], np.int64))
    return pd.DataFrame(
        {
            "price_cents": pd.Series([total], dtype=np.int64),
            "avg_yearly": pd.Series(
                [np.float64(total) / np.float64(700.0)], dtype=np.float64
            ),
        }
    )


def q19_dnf_revenue(
    sf_dir: str,
    branches: tuple = (
        ("Brand#12", 1, 15, 1, 21),
        ("Brand#23", 1, 25, 10, 30),
        ("Brand#34", 1, 35, 20, 40),
    ),
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q19 shape: revenue from a DNF of (brand, size range,
    quantity range) branches — the classic multi-predicate OR that
    pushdown engines special-case. Each branch is (brand, size_lo,
    size_hi, qty_lo, qty_hi), all bounds inclusive. Exact-cent unit
    rule; returns ONE row (revenue_units, revenue).

    Scale shape: only the named brands' (partkey -> branch-id, size)
    rows broadcast (guarded); lineitem streams once, evaluates the DNF
    vectorized per batch, and emits ONE partial sum per batch — nothing
    shuffles."""
    import pyarrow.parquet as pq
    import ray
    import ray.data

    brands = [b[0] for b in branches]
    if len(set(brands)) != len(brands):
        raise ValueError("q19 branches must name distinct brands")
    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    pt = pt[pt["p_brand"].isin(brands)]
    if len(pt) > max_broadcast_keys:
        raise ValueError(f"{len(pt)} brand part rows exceed max_broadcast_keys")
    bid = {b: i for i, b in enumerate(brands)}
    keys = pt["p_partkey"].to_numpy(np.int64)
    order = np.argsort(keys, kind="stable")
    parts_ref = ray.put(
        (
            keys[order],
            pt["p_brand"].map(bid).to_numpy(np.int64)[order],
            pt["p_size"].to_numpy(np.int64)[order],
        )
    )
    bounds = np.array([b[1:] for b in branches], np.int64)  # (n, 4): slo shi qlo qhi

    def branch_partial(batch: pa.Table) -> pa.Table:
        keys, bids, sizes = ray.get(parts_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys) == 0:
            return pa.table({"units_p": pa.array(np.zeros(0, np.int64))})
        pos = np.searchsorted(keys, pk)
        np.clip(pos, 0, len(keys) - 1, out=pos)
        hit = keys[pos] == pk
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        b = bids[pos]
        s = sizes[pos]
        keep = (
            hit
            & (s >= bounds[b, 0]) & (s <= bounds[b, 1])
            & (q >= bounds[b, 2]) & (q <= bounds[b, 3])
        )
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        units = _rev_units(price, disc)
        return pa.table({"units_p": pa.array(np.array([units.sum()], np.int64))})

    parts_sum = (
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        .map_batches(branch_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    total = np.int64(parts_sum["units_p"].to_numpy(np.int64).sum()) if len(parts_sum) else np.int64(0)
    _guard_sum(np.array([total], np.int64))
    return pd.DataFrame(
        {
            "revenue_units": pd.Series([total], dtype=np.int64),
            "revenue": pd.Series([np.float64(total) / np.float64(10000.0)], dtype=np.float64),
        }
    )


def q22_idle_customers(sf_dir: str, idle_since: str = "1999-01-01"):
    """TPC-H Q22 shape adapted to this schema (no phone country codes):
    high-balance customers with NO orders since a cutoff, grouped by
    nation. "High balance" is the spec's `> avg positive balance`,
    evaluated as the EXACT integer inequality `cents * n > sum_cents`
    (balances are 2-decimal — the floor(x*100+0.5) cents rule); the SQL
    oracle uses the same form. Returns (c_nationkey, numcust,
    acctbal_cents, totacctbal) sorted by nation; totacctbal is the ONE
    /100.0 division.

    Scale shape: pass A folds (sum_cents, n) over positive balances via
    per-batch partials; the two ints broadcast by closure. The anti-join
    against recent orders reuses semi_join_streaming (left side — the
    selected customers — NEVER shuffles; only distinct order custkeys
    move, broadcast-or-sharded). The final per-nation groupby moves
    (nationkey, cents) metadata only."""
    import ray
    import ray.data
    from ray.data.aggregate import Count, Sum

    from ..ops.join import semi_join_streaming

    cutoff = _ts_us(idle_since)

    def cents_partial(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        pos = bal > 0.0
        cents = np.floor(bal[pos] * 100 + 0.5).astype(np.int64)
        return pa.table(
            {
                "s_p": pa.array(np.array([cents.sum()], np.int64)),
                "n_p": pa.array(np.array([int(pos.sum())], np.int64)),
            }
        )

    cust = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )
    pos_stats = (
        cust.map_batches(cents_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    s_cents = int(pos_stats["s_p"].sum())
    n_pos = int(pos_stats["n_p"].sum())
    if n_pos and abs(s_cents) >= (1 << 40):
        raise ValueError("q22 balance sum exceeds modeled range (2^40 cents)")

    def rich_only(batch: pa.Table) -> pa.Table:
        bal = batch["c_acctbal"].to_numpy(zero_copy_only=False).astype(np.float64)
        cents = np.floor(bal * 100 + 0.5).astype(np.int64)
        keep = (cents * n_pos) > s_cents if n_pos else np.zeros(len(cents), bool)
        return pa.table(
            {
                "c_custkey": batch["c_custkey"].filter(pa.array(keep)),
                "c_nationkey": batch["c_nationkey"].filter(pa.array(keep)).cast(pa.int64()),
                "cents": pa.array(cents[keep]),
            }
        )

    rich = cust.map_batches(rich_only, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def recent_orders(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = od >= cutoff
        return pa.table({"c_custkey": batch["o_custkey"].filter(pa.array(keep))})

    recent = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(recent_orders, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    idle = semi_join_streaming(rich, recent, key="c_custkey", how="anti")
    per = (fast_groupby(
        idle,
        "c_nationkey",
        Count(alias_name="numcust"), Sum("cents", alias_name="acctbal_cents"),
    )
        .to_pandas()
    )
    if len(per) == 0:
        return pd.DataFrame(
            {
                "c_nationkey": pd.Series([], dtype=np.int64),
                "numcust": pd.Series([], dtype=np.int64),
                "acctbal_cents": pd.Series([], dtype=np.int64),
                "totacctbal": pd.Series([], dtype=np.float64),
            }
        )
    per["c_nationkey"] = per["c_nationkey"].astype(np.int64)
    per["numcust"] = per["numcust"].astype(np.int64)
    per["acctbal_cents"] = per["acctbal_cents"].astype(np.int64)
    per["totacctbal"] = per["acctbal_cents"].to_numpy(np.int64).astype(np.float64) / np.float64(100.0)
    per = per.sort_values("c_nationkey", kind="mergesort").reset_index(drop=True)
    return per[["c_nationkey", "numcust", "acctbal_cents", "totacctbal"]]


def shared_scan_q1_q6(
    sf_dir: str,
    q1_cut: str = "1998-09-02",
    q6_lo: str = "1996-01-01",
    q6_hi: str = "1997-01-01",
    q6_disc_lo: float = 0.05,
    q6_disc_hi: float = 0.07,
    q6_qty_cut: float = 24.0,
):
    """Multi-query shared scan: TPC-H Q1 AND Q6 answered from ONE pass over
    lineitem — at 100 TB the scan dominates, so co-running queries that
    share a table must share its read. Each batch emits Q1 unit partials
    PRE-AGGREGATED by (returnflag, linestatus) plus one Q6 partial row,
    tagged by query; ONE tiny groupby folds both. Results are returned
    long-form ``(query, l_returnflag, l_linestatus, metric, value)`` —
    every value derives from exact-int sums via the SAME one-division
    expressions as the standalone q1_pricing_summary / q6_forecast_revenue
    (bitwise parity with a UNION ALL SQL oracle). Q6 rows carry '' for the
    group columns."""
    import ray.data
    from ray.data.aggregate import Sum

    cut = _ts_us(q1_cut)
    lo, hi = _ts_us(q6_lo), _ts_us(q6_hi)

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        p = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)
        t = batch["l_tax"].to_numpy(zero_copy_only=False).astype(np.float64)
        qc_all = np.floor(q * 100 + 0.5).astype(np.int64)
        pc_all = np.floor(p * 100 + 0.5).astype(np.int64)
        db_all = np.floor(d * 100 + 0.5).astype(np.int64)
        tb_all = np.floor(t * 100 + 0.5).astype(np.int64)

        # --- Q1 slice: shipped at-or-before the cut, grouped in-batch
        k1 = sd <= cut
        du = pc_all[k1] * (100 - db_all[k1])
        cu = du * (100 + tb_all[k1])
        if len(cu) and np.abs(cu).max() >= (np.int64(1) << 50):
            raise ValueError("per-row charge unit exceeds 2^50 — price out of modeled range")
        flags = batch["l_returnflag"].to_numpy(zero_copy_only=False)[k1]
        stats = batch["l_linestatus"].to_numpy(zero_copy_only=False)[k1]
        # dtype="U" auto-sizes (an explicit U<n> cap would truncate silently)
        combo = np.char.add(
            np.char.add(np.asarray(flags, dtype="U"), "\x1f"), np.asarray(stats, dtype="U")
        )
        uk, inv = np.unique(combo, return_inverse=True)
        cols = {}
        for name, vals in (
            ("qc", qc_all[k1]), ("pc", pc_all[k1]), ("db", db_all[k1]),
            ("du", du), ("cu", cu), ("n", np.ones(int(k1.sum()), np.int64)),
        ):
            acc = np.zeros(len(uk), np.int64)
            np.add.at(acc, inv, vals)
            cols[name] = acc
        qk = [u.split("\x1f") for u in uk]

        # --- Q6 slice: raw-double band filters (SQL BETWEEN semantics)
        k6 = (sd >= lo) & (sd < hi) & (d >= q6_disc_lo) & (d <= q6_disc_hi) & (q < q6_qty_cut)
        u6 = pc_all[k6] * db_all[k6]
        if len(u6) and np.abs(u6).max() >= _UNIT_LIMIT:
            raise ValueError("per-row discount-revenue unit exceeds 2^40")

        return pa.table(
            {
                "q": pa.array(["q1"] * len(uk) + ["q6"]),
                "l_returnflag": pa.array([x[0] for x in qk] + [""]),
                "l_linestatus": pa.array([x[1] for x in qk] + [""]),
                "qc": pa.array(np.append(cols["qc"], 0)),
                "pc": pa.array(np.append(cols["pc"], 0)),
                "db": pa.array(np.append(cols["db"], 0)),
                "du": pa.array(np.append(cols["du"], int(u6.sum()))),
                "cu": pa.array(np.append(cols["cu"], 0)),
                "n": pa.array(np.append(cols["n"], int(k6.sum()))),
            }
        )

    folded = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=[
                "l_returnflag", "l_linestatus", "l_shipdate",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            ],
        )
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["q", "l_returnflag", "l_linestatus"],
        Sum("qc", alias_name="qc"), Sum("pc", alias_name="pc"),
            Sum("db", alias_name="db"), Sum("du", alias_name="du"),
            Sum("cu", alias_name="cu"), Sum("n", alias_name="n"),
    )
        .to_pandas()
    )
    rows = []
    for _, r in folded.iterrows():
        for c in ("qc", "pc", "db", "du", "cu", "n"):
            _guard_sum(np.array([np.int64(r[c])], np.int64))
        if r["q"] == "q1":
            n100 = np.int64(r["n"]) * np.float64(100.0)
            metrics = {
                "sum_qty": np.int64(r["qc"]) / np.float64(100.0),
                "sum_base_price": np.int64(r["pc"]) / np.float64(100.0),
                "sum_disc_price": np.int64(r["du"]) / np.float64(10000.0),
                "sum_charge": np.int64(r["cu"]) / np.float64(1000000.0),
                "avg_qty": np.int64(r["qc"]) / n100,
                "avg_price": np.int64(r["pc"]) / n100,
                "avg_disc": np.int64(r["db"]) / n100,
                "count_order": np.float64(np.int64(r["n"])),
            }
        else:
            metrics = {
                "revenue": np.int64(r["du"]) / np.float64(10000.0),
                "n_rows": np.float64(np.int64(r["n"])),
            }
        for m, v in metrics.items():
            rows.append((r["q"], r["l_returnflag"], r["l_linestatus"], m, np.float64(v)))
    out = pd.DataFrame(rows, columns=["query", "l_returnflag", "l_linestatus", "metric", "value"])
    out["value"] = out["value"].astype(np.float64)
    return out.sort_values(
        ["query", "l_returnflag", "l_linestatus", "metric"], kind="mergesort"
    ).reset_index(drop=True)


# ---------------------------------------------------------------------------
# Session-16 wave: the remaining TPC-H shapes (Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21),
# adapted to the synthetic star schema (no partsupp table; no commit/receipt
# dates or shipmodes on lineitem — see each docstring for the stand-in).
# Every money figure follows the exact-cent-units rule; every threshold is an
# exact integer inequality mirrored verbatim in the SQL oracle.
# ---------------------------------------------------------------------------

_PAIR_ID_LIMIT = np.int64(1) << 31


def _pack_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pack two non-negative int64 id arrays into one int64 key
    (the triangle_count rule: both ids must be < 2^31 — loud)."""
    if len(a) and (a.max() >= _PAIR_ID_LIMIT or b.max() >= _PAIR_ID_LIMIT or a.min() < 0 or b.min() < 0):
        raise ValueError("pair ids must be in [0, 2^31) to pack into one int64")
    return (a << np.int64(32)) | b


def q2_min_cost_supplier(
    sf_dir: str,
    size_max: int = 25,
    ptype: str = "STANDARD",
    region: str = "EUROPE",
    max_offer_rows: int = 1 << 26,
):
    """TPC-H Q2 shape: for each part of one size-range+type, the region supplier(s)
    offering it at minimum cost. The schema has no partsupp, so the "supply
    offer" is derived from lineitem: offer_cents(part, supp) = min over that
    pair's lineitems of floor(l_extendedprice*100 + 0.5) — an exact-int
    quantity both sides compute identically. ALL min-achieving (part,
    supplier) pairs are kept (exact ints make the tie set exact). Returns
    (s_acctbal_cents, s_acctbal, s_name, n_name, p_partkey, p_name,
    s_suppkey, cost_cents, cost) ordered by (acctbal_cents DESC, n_name,
    s_name, p_partkey) — deterministic because (p_partkey, s_suppkey) is
    unique per row.

    Scale shape: lineitem pre-aggregates per-batch min per packed
    (partkey<<32|suppkey) pair, then ONE metadata groupby at partsupp
    cardinality (pairs, not rows). The part/supplier dimension filters
    broadcast once; only eligible offers (a dimension-sized slice, guarded
    by max_offer_rows) reach the driver for the per-part min fold."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Min

    ppdf = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_size", "p_type"]
    ).to_pandas()
    ppdf = ppdf[(ppdf["p_size"] <= size_max) & (ppdf["p_type"] == ptype)]
    pkeys = np.sort(ppdf["p_partkey"].to_numpy(np.int64))

    spdf = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).to_pandas()
    npdf = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rpdf = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = rpdf.loc[rpdf["r_name"] == region, "r_regionkey"]
    nat = npdf[npdf["n_regionkey"].isin(rkey)]
    spdf = spdf.merge(nat, left_on="s_nationkey", right_on="n_nationkey")
    skeys = np.sort(spdf["s_suppkey"].to_numpy(np.int64))
    pkeys_ref = ray.put(pkeys)
    skeys_ref = ray.put(skeys)

    def offer_partial(batch: pa.Table) -> pa.Table:
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _sorted_lookup(ray.get(pkeys_ref), pk) & _sorted_lookup(ray.get(skeys_ref), sk)
        pk, sk = pk[keep], sk[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        pair = _pack_pair(pk, sk)
        uk, inv = np.unique(pair, return_inverse=True)
        mn = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(mn, inv, cents)
        return pa.table({"pair": pa.array(uk), "cents_p": pa.array(mn)})

    offers = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(offer_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "pair",
        Min("cents_p", alias_name="cost_cents"),
    )
        .to_pandas()
    )
    out_cols = {
        "s_acctbal_cents": np.int64, "s_acctbal": np.float64, "s_name": object,
        "n_name": object, "p_partkey": np.int64, "p_name": object,
        "s_suppkey": np.int64, "cost_cents": np.int64, "cost": np.float64,
    }
    empty = pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    if len(offers) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return empty
    if len(offers) > max_offer_rows:
        raise ValueError(
            f"{len(offers)} eligible offers exceed max_offer_rows; "
            "fold the per-part min with a second Dataset groupby instead"
        )
    pair = offers["pair"].to_numpy(np.int64)
    odf = pd.DataFrame(
        {
            "p_partkey": pair >> np.int64(32),
            "s_suppkey": pair & np.int64((1 << 32) - 1),
            "cost_cents": offers["cost_cents"].to_numpy(np.int64),
        }
    )
    mn = odf.groupby("p_partkey")["cost_cents"].transform("min")
    odf = odf[odf["cost_cents"] == mn]
    out = odf.merge(ppdf[["p_partkey", "p_name"]], on="p_partkey").merge(
        spdf[["s_suppkey", "s_name", "s_acctbal", "n_name"]], on="s_suppkey"
    )
    bal = out["s_acctbal"].to_numpy(np.float64)
    out["s_acctbal_cents"] = np.floor(bal * 100 + 0.5).astype(np.int64)
    out["s_acctbal"] = out["s_acctbal_cents"].to_numpy(np.int64).astype(np.float64) / np.float64(100.0)
    out["cost"] = out["cost_cents"].to_numpy(np.int64).astype(np.float64) / np.float64(100.0)
    out = out.sort_values(
        ["s_acctbal_cents", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).reset_index(drop=True)
    for c, t in out_cols.items():
        out[c] = out[c].astype(t)
    return out[list(out_cols)]


def q4_priority_check(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1997-04-01",
    late_days: int = 30,
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q4 shape: per-priority count of one quarter's orders that had at
    least one problem lineitem. The schema has no commit/receipt dates, so
    the EXISTS predicate is adapted to "some lineitem shipped >= late_days
    after the order date" — an exact integer-microsecond cut both sides
    share. Returns (o_orderpriority, order_count) ordered by priority.

    Scale shape: the quarter's (orderkey -> orderdate) map broadcasts once
    (guarded — swap to hash_join beyond it); lineitem emits per-batch
    DISTINCT late orderkeys; ONE metadata groupby dedups them (<= quarter
    orders); the per-priority count folds driver-side over the tiny
    distinct-orderkey frame."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Count

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)
    late_us = np.int64(late_days) * np.int64(86_400_000_000)

    opdf = pq.read_table(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    ).to_pandas()
    od = opdf["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()
    win = opdf[(od >= lo) & (od < hi)].reset_index(drop=True)
    if len(win) > max_broadcast_keys:
        raise ValueError(
            f"{len(win)} quarter orders exceed max_broadcast_keys; "
            "switch the orders side to hash_join"
        )
    okeys = win["o_orderkey"].to_numpy(np.int64)
    order = np.argsort(okeys, kind="stable")
    okeys = okeys[order]
    odates = win["o_orderdate"].astype("datetime64[us]").astype("int64").to_numpy()[order]
    omap_ref = ray.put((okeys, odates))

    def late_partial(batch: pa.Table) -> pa.Table:
        keys, dates = ray.get(omap_ref)
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({"o_orderkey": pa.array(np.zeros(0, np.int64))})
        pos = np.searchsorted(keys, ok)
        np.clip(pos, 0, len(keys) - 1, out=pos)
        hit = keys[pos] == ok
        late = hit & (sd >= dates[pos] + late_us)
        return pa.table({"o_orderkey": pa.array(np.unique(ok[late]))})

    hits = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_shipdate"]
        )
        .map_batches(late_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "o_orderkey",
        Count(alias_name="n_batches"),
    )
        .to_pandas()
    )
    late_keys = (
        hits["o_orderkey"].to_numpy(np.int64) if len(hits) else np.zeros(0, np.int64)
    )
    win_late = win[win["o_orderkey"].isin(late_keys)]
    counts = win_late.groupby("o_orderpriority").size()
    out = pd.DataFrame(
        {
            "o_orderpriority": counts.index.to_numpy(object),
            "order_count": counts.to_numpy(np.int64),
        }
    )
    out = out.sort_values("o_orderpriority", kind="mergesort").reset_index(drop=True)
    out["order_count"] = out["order_count"].astype(np.int64)
    return out


def q9_product_profit(
    sf_dir: str,
    name_substr: str = "widget",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q9 shape: profit by supplier nation and order year for parts
    whose name contains one word. The schema has no partsupp, so the unit
    cost is the part's retail price: amount_units = cents*(100-dpct)
    - retail_cents*100*qty (both terms at the 10^-4-dollar scale, exact
    int64 per row, guarded). Returns (n_name, o_year, amount_units, amount)
    ordered by (n_name, o_year DESC) with ONE /10000.0 division.

    Scale shape (the q8 plan): part match-set (partkey -> retail_cents) and
    supplier -> nationkey broadcast once (guarded); lineitem pre-aggregates
    per (orderkey, nationkey) inside each batch; ONE bucketed hash_join
    attaches the order year; ONE small groupby folds (nation, year)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    ppdf = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    ).to_pandas()
    ppdf = ppdf[ppdf["p_name"].str.contains(name_substr, regex=False)]
    if len(ppdf) > max_broadcast_keys:
        raise ValueError(f"{len(ppdf)} matched parts exceed max_broadcast_keys")
    pk = ppdf["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk, kind="stable")
    retail_cents = np.floor(
        ppdf["p_retailprice"].to_numpy(np.float64) * 100 + 0.5
    ).astype(np.int64)
    parts_ref = ray.put((pk[order], retail_cents[order]))

    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    sk = sup["s_suppkey"].to_numpy(np.int64)
    sorder = np.argsort(sk, kind="stable")
    supp_ref = ray.put((sk[sorder], sup["s_nationkey"].to_numpy(np.int64)[sorder]))

    def li_partial(batch: pa.Table) -> pa.Table:
        pkeys, rcents = ray.get(parts_ref)
        skeys, snat = ray.get(supp_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        phit, pcost = _sorted_map(pkeys, rcents, lpk)
        shit, snk = _sorted_map(skeys, snat, lsk)
        keep = phit & shit
        cost_at = np.zeros(len(lpk), np.int64)
        cost_at[phit] = pcost
        nk_at = np.zeros(len(lsk), np.int64)
        nk_at[shit] = snk
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        disc = batch["l_discount"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        qty = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        if len(qty) and not np.all(qty == np.floor(qty)):
            raise ValueError("q9 exact cost units need integral quantities")
        rev = _rev_units(price, disc)
        cost = cost_at[keep] * np.int64(100) * qty.astype(np.int64)
        amount = rev - cost
        if len(amount) and np.abs(amount).max() >= _UNIT_LIMIT:
            raise ValueError("q9 per-row amount exceeds 2^40 — price out of modeled range")
        grp = np.stack([ok, nk_at[keep]], axis=1) if len(ok) else np.zeros((0, 2), np.int64)
        uk, inv = (np.unique(grp, axis=0, return_inverse=True) if len(ok)
                   else (np.zeros((0, 2), np.int64), np.zeros(0, np.int64)))
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, amount)
        return pa.table(
            {
                "o_orderkey": pa.array(uk[:, 0]),
                "n_nationkey": pa.array(uk[:, 1]),
                "amount_p": pa.array(partial),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def orders_year(batch: pa.Table) -> pa.Table:
        year = pc.year(batch["o_orderdate"]).cast(pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"], "o_year": year})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"]
    ).map_batches(orders_year, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    joined = hash_join(li, orders, key="o_orderkey")

    per = (fast_groupby(
        joined,
        ["n_nationkey", "o_year"],
        Sum("amount_p", alias_name="amount_units"),
    )
        .to_pandas()
    )
    out_cols = {"n_name": object, "o_year": np.int64,
                "amount_units": np.int64, "amount": np.float64}
    if len(per) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    _guard_sum(per["amount_units"].to_numpy(np.int64))
    npdf = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]).to_pandas()
    out = per.merge(npdf, on="n_nationkey")
    out["o_year"] = out["o_year"].astype(np.int64)
    out["amount_units"] = out["amount_units"].astype(np.int64)
    out["amount"] = out["amount_units"].to_numpy(np.int64).astype(np.float64) / np.float64(10000.0)
    out = out.sort_values(
        ["n_name", "o_year"], ascending=[True, False], kind="mergesort"
    ).reset_index(drop=True)
    return out[list(out_cols)]


def q11_important_parts(
    sf_dir: str,
    region: str = "EUROPE",
    mult_num: int = 3,
    mult_den: int = 2,
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q11 shape: parts representing a significant fraction of one
    region's supplied value. No partsupp, so a part's value for the region
    is the exact-cent sum of its lineitems shipped by the region's
    suppliers. The spec scales its HAVING fraction by 1/SF so the output
    stays a stable share of parts at every scale; we mirror that by cutting
    relative to the observed part count: keep parts where `value_cents *
    nparts * mult_den > total_cents * mult_num` (share > (mult_num/
    mult_den)/nparts) — an exact integer inequality on both sides (the
    driver fold runs it in Python ints; no float fraction anywhere).
    Returns (p_partkey, value_cents, value) ordered by (value_cents DESC,
    p_partkey) with ONE /100.0 division.

    Scale shape: region suppkeys broadcast once; lineitem pre-aggregates
    cents per partkey in-batch; ONE metadata groupby at part cardinality;
    the global total folds over the group sums (exact ints, guarded)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    npdf = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rpdf = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = rpdf.loc[rpdf["r_name"] == region, "r_regionkey"]
    nkeys = set(npdf.loc[npdf["n_regionkey"].isin(rkey), "n_nationkey"].astype(int))
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    skeys = np.sort(
        sup.loc[sup["s_nationkey"].astype(int).isin(nkeys), "s_suppkey"].to_numpy(np.int64)
    )
    if len(skeys) > max_broadcast_keys:
        raise ValueError(f"{len(skeys)} region suppliers exceed max_broadcast_keys")
    skeys_ref = ray.put(skeys)

    def value_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(skeys_ref)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = _sorted_lookup(keys, sk)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        price = batch["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        cents = np.floor(price * 100 + 0.5).astype(np.int64)
        uk, inv = np.unique(pk, return_inverse=True)
        partial = np.zeros(len(uk), np.int64)
        np.add.at(partial, inv, cents)
        return pa.table({"p_partkey": pa.array(uk), "cents_p": pa.array(partial)})

    per = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(value_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "p_partkey",
        Sum("cents_p", alias_name="value_cents"),
    )
        .to_pandas()
    )
    out_cols = {"p_partkey": np.int64, "value_cents": np.int64, "value": np.float64}
    if len(per) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    vals = per["value_cents"].to_numpy(np.int64)
    _guard_sum(vals)
    total = int(vals.sum())
    nparts = len(vals)
    keep = (
        vals.astype(object) * (nparts * int(mult_den)) > total * int(mult_num)
    )  # Python-int products — no 2^63 wrap at any scale
    out = per[np.asarray(keep, bool)].copy()
    out["p_partkey"] = out["p_partkey"].astype(np.int64)
    out["value_cents"] = out["value_cents"].astype(np.int64)
    out["value"] = out["value_cents"].to_numpy(np.int64).astype(np.float64) / np.float64(100.0)
    out = out.sort_values(
        ["value_cents", "p_partkey"], ascending=[False, True], kind="mergesort"
    ).reset_index(drop=True)
    return out[list(out_cols)]


def q12_priority_lines(
    sf_dir: str,
    date_lo: str = "1997-01-01",
    date_hi: str = "1998-01-01",
    slow_days: int = 60,
    high_priorities: tuple = ("1-URGENT", "2-HIGH"),
):
    """TPC-H Q12 shape: per-group counts of high- vs low-priority orders
    among one year's problem lineitems. The schema has no
    shipmode/commit/receipt dates, so the group key is l_returnflag and
    "problem" is adapted to "shipped >= slow_days after the order date"
    (exact integer-microsecond cut). Returns (l_returnflag,
    high_line_count, low_line_count) ordered by flag.

    Scale shape: the year's lineitem slice ships (orderkey, flag, shipdate)
    into ONE bucketed hash_join against orders (the per-row slow cut needs
    each line's own order date — no broadcast of a fact table); counts
    pre-aggregate per batch after the join; ONE tiny groupby folds them."""
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)
    slow_us = np.int64(slow_days) * np.int64(86_400_000_000)
    high_set = set(high_priorities)

    def li_sel(batch: pa.Table) -> pa.Table:
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = (sd >= lo) & (sd < hi)
        return pa.table(
            {
                "o_orderkey": batch["l_orderkey"].filter(pa.array(keep)),
                "l_returnflag": batch["l_returnflag"].filter(pa.array(keep)),
                "sd_us": pa.array(sd[keep]),
            }
        )

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(li_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def orders_sel(batch: pa.Table) -> pa.Table:
        od = batch["o_orderdate"].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"],
                "od_us": od,
                "o_orderpriority": batch["o_orderpriority"],
            }
        )

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(orders_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    joined = hash_join(li, orders, key="o_orderkey")

    def count_partial(batch: pa.Table) -> pa.Table:
        sd = batch["sd_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        od = batch["od_us"].to_numpy(zero_copy_only=False).astype(np.int64)
        slow = sd >= od + slow_us
        flag = batch["l_returnflag"].to_numpy(zero_copy_only=False)[slow]
        prio = batch["o_orderpriority"].to_numpy(zero_copy_only=False)[slow]
        high = np.array([p in high_set for p in prio], dtype=np.int64)
        uf, inv = np.unique(flag, return_inverse=True)
        h = np.zeros(len(uf), np.int64)
        l = np.zeros(len(uf), np.int64)
        np.add.at(h, inv, high)
        np.add.at(l, inv, 1 - high)
        return pa.table(
            {"l_returnflag": pa.array(uf), "high_p": pa.array(h), "low_p": pa.array(l)}
        )

    per = (fast_groupby(
        joined.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "l_returnflag",
        Sum("high_p", alias_name="high_line_count"),
            Sum("low_p", alias_name="low_line_count"),
    )
        .to_pandas()
    )
    out_cols = {"l_returnflag": object, "high_line_count": np.int64,
                "low_line_count": np.int64}
    if len(per) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    per["high_line_count"] = per["high_line_count"].astype(np.int64)
    per["low_line_count"] = per["low_line_count"].astype(np.int64)
    return (
        per.sort_values("l_returnflag", kind="mergesort")
        .reset_index(drop=True)[list(out_cols)]
    )


def q16_supplier_counts(
    sf_dir: str,
    excl_brand: str = "Brand#5",
    excl_type: str = "PROMO",
    sizes: tuple = (1, 4, 9, 14, 19, 23, 36, 45),
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size) for
    qualifying parts, excluding flagged suppliers. No partsupp, so the
    part-supplier relation is the set of DISTINCT lineitem pairs; the
    spec's complaint filter becomes s_acctbal < 0 (deterministic stand-in).
    Returns (p_brand, p_type, p_size, supplier_cnt) ordered by
    (supplier_cnt DESC, brand, type, size).

    Scale shape: qualifying parts map to a dense attr id broadcast once
    (guarded); excluded suppkeys broadcast once; lineitem emits per-batch
    DISTINCT packed (attr_id << 32 | suppkey) keys; ONE metadata groupby
    dedups pairs globally; the per-attr distinct count is a bincount over
    the deduped pairs (attr space is the small dimension product)."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Count

    ppdf = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type", "p_size"]
    ).to_pandas()
    size_set = set(int(s) for s in sizes)
    ppdf = ppdf[
        (ppdf["p_brand"] != excl_brand)
        & (ppdf["p_type"] != excl_type)
        & (ppdf["p_size"].astype(int).isin(size_set))
    ].reset_index(drop=True)
    if len(ppdf) > max_broadcast_keys:
        raise ValueError(f"{len(ppdf)} qualifying parts exceed max_broadcast_keys")
    attrs = (
        ppdf[["p_brand", "p_type", "p_size"]]
        .drop_duplicates()
        .sort_values(["p_brand", "p_type", "p_size"], kind="mergesort")
        .reset_index(drop=True)
    )
    attr_of = {
        (b, t, int(s)): i
        for i, (b, t, s) in enumerate(
            zip(attrs["p_brand"], attrs["p_type"], attrs["p_size"])
        )
    }
    pk = ppdf["p_partkey"].to_numpy(np.int64)
    order = np.argsort(pk, kind="stable")
    aid = np.array(
        [attr_of[(b, t, int(s))] for b, t, s in
         zip(ppdf["p_brand"], ppdf["p_type"], ppdf["p_size"])],
        np.int64,
    )
    parts_ref = ray.put((pk[order], aid[order]))

    spdf = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).to_pandas()
    bad = np.sort(
        spdf.loc[spdf["s_acctbal"].to_numpy(np.float64) < 0.0, "s_suppkey"].to_numpy(np.int64)
    )
    bad_ref = ray.put(bad)

    def pair_partial(batch: pa.Table) -> pa.Table:
        pkeys, aids = ray.get(parts_ref)
        badk = ray.get(bad_ref)
        lpk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        lsk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        hit, a = _sorted_map(pkeys, aids, lpk)
        keep = hit & ~_sorted_lookup(badk, lsk)
        a_at = np.zeros(len(lpk), np.int64)
        a_at[hit] = a
        packed = _pack_pair(a_at[keep], lsk[keep])
        return pa.table({"pair": pa.array(np.unique(packed))})

    pairs = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"]
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "pair",
        Count(alias_name="n_batches"),
    )
        .to_pandas()
    )
    out_cols = {"p_brand": object, "p_type": object, "p_size": np.int64,
                "supplier_cnt": np.int64}
    if len(pairs) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    a_ids = (pairs["pair"].to_numpy(np.int64) >> np.int64(32)).astype(np.int64)
    cnt = np.bincount(a_ids, minlength=len(attrs)).astype(np.int64)
    out = attrs.copy()
    out["supplier_cnt"] = cnt
    out = out[out["supplier_cnt"] > 0].copy()
    out["p_size"] = out["p_size"].astype(np.int64)
    out = out.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).reset_index(drop=True)
    return out[list(out_cols)]


def q20_excess_suppliers(
    sf_dir: str,
    name_substr: str = "bolt",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
    region: str = "EUROPE",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q20 shape: region suppliers who dominated some matched part's
    shipped volume in one year. No partsupp availqty, so "excess" is
    adapted to `2 * supplier_qty > part_total_qty` over the window — an
    exact integer inequality (quantities integral, guarded). Returns
    (s_suppkey, s_name) ordered by (s_name, s_suppkey).

    Scale shape: matched partkeys broadcast once; lineitem pre-aggregates
    qty per packed (partkey, suppkey) pair in-batch; ONE metadata groupby
    folds pairs; per-part totals fold from the pair table (matched-part
    dimension, guarded broadcast back); survivors intersect the region's
    supplier dimension driver-side."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Sum

    lo, hi = _ts_us(date_lo), _ts_us(date_hi)
    ppdf = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]).to_pandas()
    pkeys = np.sort(
        ppdf.loc[ppdf["p_name"].str.contains(name_substr, regex=False), "p_partkey"].to_numpy(np.int64)
    )
    if len(pkeys) > max_broadcast_keys:
        raise ValueError(f"{len(pkeys)} matched parts exceed max_broadcast_keys")
    pkeys_ref = ray.put(pkeys)

    def qty_partial(batch: pa.Table) -> pa.Table:
        keys = ray.get(pkeys_ref)
        pk = batch["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        keep = _sorted_lookup(keys, pk) & (sd >= lo) & (sd < hi)
        pk = pk[keep]
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        q = batch["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)[keep]
        if len(q) and not np.all(q == np.floor(q)):
            raise ValueError("q20 exact-integer cut needs integral quantities")
        packed = _pack_pair(pk, sk)
        uk, inv = np.unique(packed, return_inverse=True)
        sq = np.zeros(len(uk), np.int64)
        np.add.at(sq, inv, q.astype(np.int64))
        return pa.table({"pair": pa.array(uk), "sq_p": pa.array(sq)})

    pairs = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "pair",
        Sum("sq_p", alias_name="sq"),
    )
        .to_pandas()
    )
    out_cols = {"s_suppkey": np.int64, "s_name": object}
    if len(pairs) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    pair = pairs["pair"].to_numpy(np.int64)
    pk = pair >> np.int64(32)
    sk = pair & np.int64((1 << 32) - 1)
    sq = pairs["sq"].to_numpy(np.int64)
    _guard_sum(sq)
    tot = pd.Series(sq).groupby(pk).transform("sum").to_numpy(np.int64)
    good_sk = np.unique(sk[2 * sq > tot])

    spdf = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas()
    npdf = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rpdf = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = rpdf.loc[rpdf["r_name"] == region, "r_regionkey"]
    nkeys = npdf.loc[npdf["n_regionkey"].isin(rkey), "n_nationkey"]
    spdf = spdf[spdf["s_nationkey"].isin(nkeys) & spdf["s_suppkey"].isin(good_sk)]
    out = spdf[["s_suppkey", "s_name"]].sort_values(
        ["s_name", "s_suppkey"], kind="mergesort"
    ).reset_index(drop=True)
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    return out[list(out_cols)]


def q21_waiting_suppliers(
    sf_dir: str,
    region: str = "EUROPE",
    max_broadcast_keys: int = 1 << 26,
):
    """TPC-H Q21 shape: region suppliers who were the UNIQUE latest shipper
    on multi-supplier finalized orders. No commit/receipt dates, so "kept
    the order waiting" is adapted to: on an o_orderstatus='F' order with
    >= 2 distinct suppliers, the supplier whose per-order max shipdate is
    strictly later than every other supplier's. Returns (s_suppkey,
    s_name, numwait) ordered by (numwait DESC, s_name, s_suppkey).

    Scale shape: lineitem pre-aggregates max shipdate per packed (orderkey,
    suppkey) pair in-batch; ONE metadata groupby folds pairs; ONE bucketed
    hash_join gates on 'F' orders; the per-order blame fold is pure
    vectorized aggregation (Max/Count per order, join back, then a
    Count+Min fold over the at-max candidates — no per-order Python, the
    triangle_count rule); region suppliers attach driver-side."""
    import pyarrow.parquet as pq
    import ray
    import ray.data
    from ray.data.aggregate import Max

    def pair_partial(batch: pa.Table) -> pa.Table:
        ok = batch["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sd = batch["l_shipdate"].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        packed = _pack_pair(ok, sk)
        uk, inv = np.unique(packed, return_inverse=True)
        ms = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
        np.maximum.at(ms, inv, sd)
        return pa.table({"pair": pa.array(uk), "ms_p": pa.array(ms)})

    pairs = (fast_groupby(
        ray.data.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_shipdate"],
        )
        .map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "pair",
        Max("ms_p", alias_name="ms"),
    )
    )

    def unpack(batch: pa.Table) -> pa.Table:
        pair = batch["pair"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "o_orderkey": pa.array(pair >> np.int64(32)),
                "s_suppkey": pa.array(pair & np.int64((1 << 32) - 1)),
                "ms": batch["ms"],
            }
        )

    pairs = pairs.map_batches(unpack, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def orders_f(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["o_orderstatus"], "F")
        return pa.table({"o_orderkey": batch["o_orderkey"].filter(keep)})

    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(orders_f, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    # fpairs feeds BOTH the per-order stats groupby and the join-back below;
    # without materialize Ray re-executes the lineitem scan + bucket join
    # once per consumer (shared sub-DAGs are not cached). The table is
    # metadata-scale: (orderkey, suppkey, max_ship) per 'F'-order pair.
    fpairs = hash_join(pairs, orders, key="o_orderkey").materialize()

    from ray.data.aggregate import Count, Min, Sum

    stats = fast_groupby(
        fpairs,
        "o_orderkey",
        Max("ms", alias_name="om"), Count(alias_name="nsupp"),
    )
    j = hash_join(fpairs, stats, key="o_orderkey")

    def at_max_sel(batch: pa.Table) -> pa.Table:
        ms = batch["ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        om = batch["om"].to_numpy(zero_copy_only=False).astype(np.int64)
        ns = batch["nsupp"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ms == om) & (ns >= 2)
        return pa.table(
            {
                "o_orderkey": batch["o_orderkey"].filter(pa.array(keep)),
                "s_suppkey": batch["s_suppkey"].filter(pa.array(keep)),
            }
        )

    cand = j.map_batches(at_max_sel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    # a blamed supplier is the SOLE at-max candidate of its order:
    # Count==1 makes Min(s_suppkey) that candidate
    per_order = fast_groupby(
        cand,
        "o_orderkey",
        Count(alias_name="natmax"), Min("s_suppkey", alias_name="sk0"),
    )

    def blame_count(batch: pa.Table) -> pa.Table:
        nat = batch["natmax"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = batch["sk0"].to_numpy(zero_copy_only=False).astype(np.int64)[nat == 1]
        uk, cnt = np.unique(sk, return_counts=True)
        return pa.table({"s_suppkey": pa.array(uk), "n_p": pa.array(cnt.astype(np.int64))})

    per = (fast_groupby(
        per_order.map_batches(blame_count, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "s_suppkey",
        Sum("n_p", alias_name="numwait"),
    )
        .to_pandas()
    )
    out_cols = {"s_suppkey": np.int64, "s_name": object, "numwait": np.int64}
    if len(per) == 0:  # empty to_pandas drops columns (CLAUDE.md guard)
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    spdf = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name", "s_nationkey"]
    ).to_pandas()
    npdf = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    rpdf = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    rkey = rpdf.loc[rpdf["r_name"] == region, "r_regionkey"]
    nkeys = npdf.loc[npdf["n_regionkey"].isin(rkey), "n_nationkey"]
    spdf = spdf[spdf["s_nationkey"].isin(nkeys)]
    out = per.merge(spdf[["s_suppkey", "s_name"]], on="s_suppkey")
    if len(out) == 0:
        return pd.DataFrame({c: pd.Series([], dtype=t) for c, t in out_cols.items()})
    out["s_suppkey"] = out["s_suppkey"].astype(np.int64)
    out["numwait"] = out["numwait"].astype(np.int64)
    out = out.sort_values(
        ["numwait", "s_name", "s_suppkey"], ascending=[False, True, True], kind="mergesort"
    ).reset_index(drop=True)
    return out[list(out_cols)]
