"""User-journey path mining: the "top first-k event paths" panel.

``top_user_paths`` groups each user's first ``k`` events (ordered by
``(ts, event_id)`` — event_id breaks timestamp ties deterministically) into
a ``'>'``-joined path string and counts users per path — the classic
onboarding-flow / funnel-discovery query.

Scale plan: a per-batch partial top-k (pandas sort + groupby.head(k))
shrinks every block to at most k rows per user BEFORE the shuffle, so only
(key, ts, id, type) metadata for candidate rows moves — the same
partial-fold idiom as etl.latest_by_key generalized to k. The global fold
buckets users by hash (``num_buckets`` groups, NOT one group per user) and
re-runs the identical vectorized pandas expression per bucket, so per-group
Python overhead is O(buckets), not O(users).

SQL parity: path equals ``string_agg(event_type, '>' ORDER BY ts,
event_id)`` over ``row_number() <= k``; counts are exact ints.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

from .fastagg import fast_groupby

_KNUTH = np.uint64(2654435761)


def top_user_paths(
    ds,
    k: int = 3,
    key: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    num_buckets: int = 64,
):
    """Dataset of ``(path, n_users)``: users per first-k event-type path.

    Requires ``(key, ts_col, id_col)`` to order rows uniquely per key
    (``id_col`` must be unique — the events table's event_id is).
    Null keys drop (the SQL oracle filters ``key IS NOT NULL``).
    """
    from ray.data.aggregate import Count

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    cols = [key, ts_col, id_col, type_col]

    def firstk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.dropna(subset=[key]).sort_values([key, ts_col, id_col], kind="stable")
        return df.groupby(key, sort=False).head(k)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        out = firstk(batch[cols])
        out = out.copy()
        out["__bkt__"] = (
            (out[key].to_numpy(np.int64).view(np.uint64) * _KNUTH) % np.uint64(num_buckets)
        ).astype(np.int64)
        return out

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        top = firstk(g)
        paths = top.groupby(key, sort=False)[type_col].agg(">".join)
        return pd.DataFrame({"path": paths.to_numpy(dtype=object)})

    candidates = ds.select_columns(cols).map_batches(
        partial, batch_format="pandas", **remote_args()
    )
    per_user = candidates.groupby("__bkt__").map_groups(
        fold, batch_format="pandas", **remote_args()
    )
    return per_user.groupby("path").aggregate(Count(alias_name="n_users"))


def attribution(
    ds,
    conversion_type: str = "purchase",
    model: str = "last",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Marketing-style conversion attribution over an event log: each
    ``conversion_type`` event is credited to ONE prior touch channel of the
    same user — the latest touch at-or-before the conversion (``model=
    'last'``, ASOF semantics) or the user's earliest touch if it is
    at-or-before (``model='first'``). Conversions with no qualifying touch
    credit the literal channel ``'(none)'``.

    Scale plan: only ``(bucket, user, ts_us, is_conv, channel, units)``
    metadata shuffles (never props/payloads); users are hash-bucketed into
    ``num_buckets`` groups, each folded with ONE vectorized
    ``pd.merge_asof`` (last) or keep-first dedup (first) — per-group Python
    is O(buckets). Each bucket emits per-channel partials; a tiny final
    groupby folds them. Value parity is the tpch-revenue rule: per-row
    exact-int units ``floor(value*100 + 0.5)``, int64 sums, ONE ``/100.0``
    division per output row.

    Determinism guard: duplicate ``(user, ts)`` among touch events is
    tie-ambiguous (which touch is "the" last?) and raises loudly — the
    bucket fold sees every row of a user, so the in-bucket check is global.

    Returns a Dataset of ``(channel, conversions, value_total)``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if model not in ("last", "first"):
        raise ValueError(f"model must be 'last' or 'first', got {model!r}")

    def to_meta(batch: pa.Table) -> pa.Table:
        et = batch[type_col].combine_chunks()
        u = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = (
            batch[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = batch[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        is_conv = pc.equal(et, conversion_type).to_numpy(zero_copy_only=False)
        units = np.where(is_conv, np.floor(v * 100.0 + 0.5).astype(np.int64), 0)
        bucket = ((u.view(np.uint64) * _KNUTH) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(bucket, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "conv": pa.array(is_conv),
                "ch": et.cast(pa.string()),
                "units": pa.array(units, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "ch": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "units": pd.Series(dtype="int64"),
            }
        )
        conv = g.loc[g["conv"], ["u", "t", "units"]]
        if conv.empty:
            return empty
        tch = g.loc[~g["conv"], ["u", "t", "ch"]]
        if not tch.empty and tch.duplicated(["u", "t"]).any():
            raise ValueError(
                "attribution: duplicate (user, ts) among touch events — tie-ambiguous; "
                "dedup or add a tiebreaker column first"
            )
        if tch.empty:
            channel = np.full(len(conv), "(none)", dtype=object)
        elif model == "last":
            conv = conv.sort_values("t", kind="stable")
            tch = tch.sort_values("t", kind="stable")
            m = pd.merge_asof(conv, tch, on="t", by="u", direction="backward", allow_exact_matches=True)
            channel = m["ch"].fillna("(none)").to_numpy(dtype=object)
            conv = m  # units column rides along in conv order
        else:
            first = tch.sort_values("t", kind="stable").drop_duplicates("u", keep="first")
            m = conv.merge(first.rename(columns={"t": "ft"}), on="u", how="left")
            ok = m["ft"].notna() & (m["ft"] <= m["t"])
            channel = np.where(ok, m["ch"].to_numpy(dtype=object), "(none)")
            conv = m
        out = pd.DataFrame(
            {"ch": channel, "n": np.ones(len(conv), dtype=np.int64), "units": conv["units"].to_numpy(np.int64)}
        )
        r = out.groupby("ch", as_index=False).agg(n=("n", "sum"), units=("units", "sum"))
        return r if not r.empty else empty

    meta = ds.select_columns([user_col, ts_col, type_col, value_col]).map_batches(
        to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    partials = meta.groupby("b").map_groups(fold, batch_format="pandas", **remote_args())
    folded = fast_groupby(
        partials,
        "ch",
        Sum("n", alias_name="conversions"), Sum("units", alias_name="units"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        units = batch["units"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "channel": batch["ch"].cast(pa.string()),
                "conversions": batch["conversions"].combine_chunks().cast(pa.int64()),
                "value_total": pa.array(units / 100.0, pa.float64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def conversion_lag(ds, step_a: str, step_b: str, user_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type",
                   max_broadcast_users: int = 1 << 24):
    """Time from each user's FIRST ``step_a`` event to their first
    ``step_b`` event at-or-after it — the conversion-latency metric behind
    funnel timing dashboards. Returns a Dataset of
    ``(user_col, ta_us, tb_us, lag_us)`` for converting users only; all
    integer microseconds, hash-exact vs the two-phase min SQL.

    Plan: pass 1 folds per-user min(ts of step_a) from per-batch partials
    (ONE metadata groupby); the (user, ta) map broadcasts (`ray.put`,
    guarded by ``max_broadcast_users`` — switch to a bucketed hash_join
    beyond it); pass 2 re-streams only step_b rows, filters ts >= ta
    vectorized, and folds the same way. Raw events never shuffle."""
    import ray
    from ray.data.aggregate import Min

    def partial_a(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch[type_col], pa.scalar(step_a))
        sub = batch.filter(m)
        t = pa.table({
            "u": sub[user_col].cast(pa.int64()),
            "us": sub[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
        })
        return t.group_by("u").aggregate([("us", "min")]).rename_columns(["u", "ta"])

    ta_df = (fast_groupby(
        ds.map_batches(partial_a, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "u",
        Min("ta", alias_name="ta"),
    )
        .to_pandas()
    )
    if len(ta_df) > max_broadcast_users:
        raise ValueError(
            f"{len(ta_df)} users exceed max_broadcast_users={max_broadcast_users}; "
            "switch pass 2 to a bucketed hash_join"
        )
    users = np.sort(ta_df["u"].to_numpy(np.int64))
    ta_by_user = ta_df.set_index("u")["ta"].to_dict()
    ta_sorted = np.array([ta_by_user[int(u)] for u in users], dtype=np.int64)
    bcast = ray.put((users, ta_sorted))

    def partial_b(batch: pa.Table) -> pa.Table:
        us_arr, ta_arr = ray.get(bcast)
        m = pc.equal(batch[type_col], pa.scalar(step_b))
        sub = batch.filter(m)
        u = sub[user_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = sub[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(us_arr, u), max(len(us_arr) - 1, 0))
        ok = len(us_arr) > 0
        good = (us_arr[pos] == u) & (ts >= ta_arr[pos]) if ok else np.zeros(len(u), bool)
        t = pa.table({"u": pa.array(u[good], pa.int64()), "tb": pa.array(ts[good], pa.int64())})
        return t.group_by("u").aggregate([("tb", "min")]).rename_columns(["u", "tb"])

    tb_df = (fast_groupby(
        ds.map_batches(partial_b, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "u",
        Min("tb", alias_name="tb"),
    )
        .to_pandas()
    )
    import pandas as pd

    if tb_df.empty:
        return pd.DataFrame({user_col: pd.Series(dtype="int64"),
                             "ta_us": pd.Series(dtype="int64"),
                             "tb_us": pd.Series(dtype="int64"),
                             "lag_us": pd.Series(dtype="int64")})
    out = tb_df.merge(ta_df, on="u")
    out = pd.DataFrame({user_col: out["u"].astype("int64"),
                        "ta_us": out["ta"].astype("int64"),
                        "tb_us": out["tb"].astype("int64"),
                        "lag_us": (out["tb"] - out["ta"]).astype("int64")})
    return out.sort_values(user_col).reset_index(drop=True)


def attribution_position(
    ds,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    num_buckets: int = 64,
):
    """Position-based (U-shaped) attribution: every conversion splits
    10,000 basis points across ALL of the user's touches at-or-before it —
    first touch 40%, last touch 40%, middles share 20% — the
    multi-touch model between the first/last extremes of ``attribution``.

    Deterministic integer rule (mirrored by the SQL CASE — keep in sync):
    k = 1 -> 10000; k = 2 -> 5000/5000; k >= 3 -> last 4000, middles
    ``2000 // (k-2)`` each, first ``4000 + the floor-div remainder``.
    Credits are exact ints; per-credit products ``bp * units`` stay
    < 2^62 (bp <= 10^4, cent units guarded); value_credit is ONE double
    division ``sum(bp*units) / 1000000.0`` per channel. Conversions with
    no prior touch credit nothing (the SQL inner join drops them).

    Same metadata/bucket plan and duplicate-(user, ts) touch guard as
    ``attribution``. Returns a Dataset of ``(channel, n_credits,
    units_bp, value_credit)``.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def to_meta(batch: pa.Table) -> pa.Table:
        et = batch[type_col].combine_chunks()
        u = batch[user_col].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        ts = (
            batch[ts_col].combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        v = batch[value_col].combine_chunks().cast(pa.float64()).to_numpy(zero_copy_only=False)
        is_conv = pc.equal(et, conversion_type).to_numpy(zero_copy_only=False)
        units = np.where(is_conv, np.floor(v * 100.0 + 0.5).astype(np.int64), 0)
        if np.abs(units).max(initial=0) >= 1 << 40:
            raise ValueError("attribution_position: cent units exceed the bp-product guard")
        bucket = ((u.view(np.uint64) * _KNUTH) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "b": pa.array(bucket, pa.int64()),
                "u": pa.array(u, pa.int64()),
                "t": pa.array(ts, pa.int64()),
                "conv": pa.array(is_conv),
                "ch": et.cast(pa.string()),
                "units": pa.array(units, pa.int64()),
            }
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "ch": pd.Series(dtype=object),
                "n": pd.Series(dtype="int64"),
                "units_bp": pd.Series(dtype="int64"),
            }
        )
        conv = g.loc[g["conv"], ["u", "t", "units"]].sort_values(["u", "t"], kind="stable")
        tch = g.loc[~g["conv"], ["u", "t", "ch"]].sort_values(["u", "t"], kind="stable")
        if conv.empty or tch.empty:
            return empty
        if tch.duplicated(["u", "t"]).any():
            raise ValueError(
                "attribution_position: duplicate (user, ts) among touch events — "
                "tie-ambiguous; dedup or add a tiebreaker column first"
            )
        tu = tch["u"].to_numpy(np.int64)
        tt = tch["t"].to_numpy(np.int64)
        tc = tch["ch"].to_numpy(object)
        cu = conv["u"].to_numpy(np.int64)
        ct = conv["t"].to_numpy(np.int64)
        cunits = conv["units"].to_numpy(np.int64)
        starts = np.searchsorted(tu, cu, side="left")
        ends = np.searchsorted(tu, cu, side="right")
        idx_parts, bp_parts, unit_parts = [], [], []
        for i in range(len(cu)):
            s, e = int(starts[i]), int(ends[i])
            k = s + int(np.searchsorted(tt[s:e], ct[i], side="right"))
            k -= s
            if k == 0:
                continue
            # the deterministic U-shape split — keep the SQL CASE in sync
            if k == 1:
                bps = np.array([10000], dtype=np.int64)
            elif k == 2:
                bps = np.array([5000, 5000], dtype=np.int64)
            else:
                mid = 2000 // (k - 2)
                rem = 2000 - (k - 2) * mid
                bps = np.full(k, mid, dtype=np.int64)
                bps[0] = 4000 + rem
                bps[-1] = 4000
            idx_parts.append(np.arange(s, s + k))
            bp_parts.append(bps)
            unit_parts.append(np.full(k, cunits[i], dtype=np.int64))
        if not idx_parts:
            return empty
        idx = np.concatenate(idx_parts)
        bp = np.concatenate(bp_parts)
        un = np.concatenate(unit_parts)
        out = pd.DataFrame({"ch": tc[idx], "n": 1, "units_bp": bp * un})
        r = out.groupby("ch", as_index=False).agg(n=("n", "sum"), units_bp=("units_bp", "sum"))
        r["n"] = r["n"].astype("int64")
        r["units_bp"] = r["units_bp"].astype("int64")
        return r

    meta = ds.select_columns([user_col, ts_col, type_col, value_col]).map_batches(
        to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    partials = meta.groupby("b").map_groups(fold, batch_format="pandas", **remote_args())
    folded = fast_groupby(
        partials,
        "ch",
        Sum("n", alias_name="n_credits"), Sum("units_bp", alias_name="units_bp"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        ub = batch["units_bp"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        # ONE double division per channel (mirror sum(bp*units) / 1000000.0)
        val = ub.astype(np.float64) / np.float64(1_000_000.0)
        return pa.table(
            {
                "channel": batch["ch"].cast(pa.string()),
                "n_credits": batch["n_credits"].combine_chunks().cast(pa.int64()),
                "units_bp": pa.array(ub, pa.int64()),
                "value_credit": pa.array(val, pa.float64()),
            }
        )

    return folded.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
