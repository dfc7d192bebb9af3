"""Distributed aggregation helpers beyond Ray Data's built-ins.

`quantiles_by_counts` — EXACT quantile_cont over a bounded-cardinality
column: per-batch (value, count) partials (vectorized), one groupby over
|distinct values| rows, then interpolation on the merged count distribution.
Memory is O(|distinct values|) no matter the row count — the right plan for
measure-like columns (quantities, prices at fixed scale, ordinal scores).
For genuinely continuous unbounded columns, swap the value key for a fixed
binning (or a mergeable sketch); the shuffle shape stays identical.

`grouped_quantiles` — the same count-distribution plan PER GROUP: only
(key, value, count) partials shuffle (never full rows), each group's
interpolation runs in a worker over its own |distinct values| rows, and the
result is one row per (key, q). Hot keys cost their distinct-value count,
not their row count.

`pivot` — long -> wide reshaping with distributive aggregates: per-batch
partial aggregation over (index, column) shrinks every block to at most
|index x column| cells BEFORE the one small groupby; the column universe is
discovered from the aggregated cells (|columns| rows to the driver) and the
widening `map_groups` emits one row per index key. The pivot contract is
|columns| small (wide schemas cap out); |index| may be huge — it stays
distributed end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

from .fastagg import fast_groupby


def quantile_cont_from_counts(values: np.ndarray, counts: np.ndarray, qs: list[float]) -> list[float]:
    """Exact quantile_cont (linear interpolation) from a sorted value/count
    distribution — the semantics of DuckDB/Postgres percentile_cont."""
    order = np.argsort(values)
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.int64)
    n = int(c.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    # cumulative ENDING index of each value run in the virtual sorted array
    cum = np.cumsum(c)
    out = []
    for q in qs:
        pos = q * (n - 1)
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        frac = pos - lo
        v_lo = v[np.searchsorted(cum, lo, side="right")]
        v_hi = v[np.searchsorted(cum, hi, side="right")]
        out.append(float(v_lo + (v_hi - v_lo) * frac))
    return out


def quantiles_by_counts(ds, col: str, qs: list[float]) -> list[float]:
    """Exact quantile_cont of ``col`` over a Dataset via the value-count
    distribution (see module docstring for the scale contract)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([col]).group_by(col).aggregate([(col, "count")])
        return g.rename_columns([col, "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    dist = fast_groupby(
        parts,
        col,
        Sum("cnt", alias_name="cnt"),
    )
    tbl = pa.concat_tables(list(dist.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    values = tbl[col].to_numpy(zero_copy_only=False)
    counts = tbl["cnt"].to_numpy(zero_copy_only=False)
    return quantile_cont_from_counts(values, counts, qs)


def grouped_quantiles(ds, key: str, col: str, qs: list[float]):
    """Exact per-group quantile_cont: per-batch (key, value, count) partials,
    one groupby(key, value) merge, then per-key interpolation in map_groups.
    Returns a Dataset of (key, q, value) rounded to 6 decimals (the float
    interpolation is the same v_lo + (v_hi - v_lo) * frac both here and in
    SQL quantile_cont; rounding absorbs sub-ulp engine differences)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    qs = list(qs)
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, col]).group_by([key, col]).aggregate([(col, "count")])
        return g.rename_columns([key, col, "__gq_cnt__"])

    dist = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        [key, col],
        Sum("__gq_cnt__", alias_name="__gq_cnt__"),
    )
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        vals = quantile_cont_from_counts(g[col].to_numpy(), g["__gq_cnt__"].to_numpy(), qs)
        return pd.DataFrame({key: [g[key].iloc[0]] * len(qs), "q": qs, "value": np.round(vals, 6)})

    return dist.groupby(key).map_groups(per_key, **remote_args())


_PIVOT_AGGS = ("sum", "count", "min", "max", "mean")


def pivot(ds, index: str, column: str, value: str, agg: str = "sum", round_to: int | None = None):
    """Long -> wide: one output row per ``index`` key, one output column per
    distinct ``column`` value (named by its string form), cells =
    ``agg(value)``. Cells with no rows are null. ``agg`` must be
    distributive (one of %s) so per-batch partials merge exactly; ``mean``
    folds (sum, count) pairs. ``round_to`` rounds float cells (np.round)
    for oracle-stable output. Returns a Dataset, one row per index key.""" % (
        _PIVOT_AGGS,
    )
    from ray.data.aggregate import Max, Min, Sum

    if agg not in _PIVOT_AGGS:
        raise ValueError(f"agg must be one of {_PIVOT_AGGS}, got {agg!r}")

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.select([index, column, value])
        if agg == "mean":
            g = sel.group_by([index, column]).aggregate([(value, "sum"), (value, "count")])
            return g.rename_columns([index, column, "__pv_s__", "__pv_c__"])
        g = sel.group_by([index, column]).aggregate([(value, agg)])
        return g.rename_columns([index, column, "__pv_p__"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if agg == "mean":
        cells = fast_groupby(
        parts,
        [index, column],
        Sum("__pv_s__", alias_name="__pv_s__"), Sum("__pv_c__", alias_name="__pv_c__"),
    )
    elif agg == "sum":
        cells = fast_groupby(
        parts,
        [index, column],
        Sum("__pv_p__", alias_name="__pv_p__"),
    )
    elif agg == "count":
        cells = fast_groupby(
        parts,
        [index, column],
        Sum("__pv_p__", alias_name="__pv_p__"),
    )
    elif agg == "min":
        cells = fast_groupby(
        parts,
        [index, column],
        Min("__pv_p__", alias_name="__pv_p__"),
    )
    else:
        cells = fast_groupby(
        parts,
        [index, column],
        Max("__pv_p__", alias_name="__pv_p__"),
    )
    cells = cells.materialize()  # |index x column| rows; read twice below

    # column universe: |columns| tiny values to the driver, deterministic order
    universe = sorted(str(v) for v in cells.unique(column))
    if not universe:
        raise ValueError("pivot over an empty dataset (no (index, column) cells)")

    import pandas as pd

    # uniform cell dtypes across groups (Ray unifies per-group blocks):
    # count -> int64 with 0 for missing (SQL count(CASE ...) = 0);
    # sum/mean/min/max -> float64 with NaN for missing (SQL NULL)
    def widen(g: pd.DataFrame) -> pd.DataFrame:
        row = {index: [g[index].iloc[0]]}
        lookup = {str(c): i for i, c in enumerate(g[column])}
        for name in universe:
            if name in lookup:
                i = lookup[name]
                if agg == "mean":
                    cell = float(g["__pv_s__"].iloc[i]) / float(g["__pv_c__"].iloc[i])
                elif agg == "count":
                    cell = np.int64(g["__pv_p__"].iloc[i])
                else:
                    cell = float(g["__pv_p__"].iloc[i])
                if round_to is not None and agg != "count":
                    cell = np.round(float(cell), round_to)
            else:
                cell = np.int64(0) if agg == "count" else np.nan
            row[name] = pd.array([cell], dtype="int64" if agg == "count" else "float64")
        return pd.DataFrame(row)

    return cells.groupby(index).map_groups(widen, **remote_args())


def _grouping_cells(ds, keys: list[str], value: str, agg: str):
    """Finest-level (all-keys) aggregate cells as a driver DataFrame —
    the shared first pass of rollup/cube: per-batch partials, ONE
    groupby, |distinct key combos| rows (small by contract). Keys are
    stringified so every grouping level shares one dtype."""
    from ray.data.aggregate import Max, Min, Sum

    def partial(batch: pa.Table) -> pa.Table:
        sel = batch.select([*keys, value])
        cast = [pc.cast(sel[k], pa.string()) for k in keys]
        sel = pa.table({**{k: c for k, c in zip(keys, cast)}, value: sel[value]})
        if agg == "mean":
            g = sel.group_by(keys).aggregate([(value, "sum"), (value, "count")])
            return g.rename_columns([*keys, "__ru_s__", "__ru_c__"])
        g = sel.group_by(keys).aggregate([(value, agg)])
        return g.rename_columns([*keys, "__ru_p__"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if agg == "mean":
        cells = fast_groupby(
        parts,
        keys,
        Sum("__ru_s__", alias_name="s"), Sum("__ru_c__", alias_name="c"),
    )
    elif agg in ("sum", "count"):
        cells = fast_groupby(
        parts,
        keys,
        Sum("__ru_p__", alias_name="p"),
    )
    elif agg == "min":
        cells = fast_groupby(
        parts,
        keys,
        Min("__ru_p__", alias_name="p"),
    )
    else:
        cells = fast_groupby(
        parts,
        keys,
        Max("__ru_p__", alias_name="p"),
    )
    return cells.materialize().to_pandas()


def _reaggregate_cells(cdf, active: list[str], agg: str):
    """Re-aggregate finest cells to the ``active`` key subset — cheap
    driver-side pandas over |combos| rows, valid because every supported
    agg is distributive over the finest cells (mean folds (s, c))."""
    grouped = cdf.groupby(active, as_index=False) if active else cdf.assign(__g__=0).groupby("__g__", as_index=False)
    if agg == "mean":
        return grouped[["s", "c"]].sum()
    if agg in ("sum", "count"):
        return grouped[["p"]].sum()
    if agg == "min":
        return grouped[["p"]].min()
    return grouped[["p"]].max()


def _level_frame(df, keys: list[str], active: list[str], agg: str, round_to: int | None):
    """One grouping level as the output frame: rolled-up key positions
    carry '(all)', ``level`` = number of active keys. The frame is built
    with an explicit index — a scalar assigned to an empty DataFrame
    silently yields 0 rows (CLAUDE.md round-4 invariant)."""
    import pandas as pd

    n = len(df)
    out = pd.DataFrame(index=range(n))
    for k in keys:
        out[k] = df[k].astype(str).to_numpy() if k in active else np.full(n, "(all)", dtype=object)
    out["level"] = np.full(n, len(active), dtype=np.int64)
    if agg == "mean":
        v = df["s"].to_numpy(np.float64) / df["c"].to_numpy(np.float64)
    elif agg == "count":
        out["value"] = df["p"].to_numpy(np.int64)
        return out
    else:
        v = df["p"].to_numpy(np.float64)
    out["value"] = np.round(v, round_to) if round_to is not None else v
    return out


def rollup(ds, keys: list[str], value: str, agg: str = "sum", round_to: int | None = None):
    """SQL ROLLUP: aggregates at every prefix level of ``keys`` —
    (k1..kn), (k1..kn-1), ..., () — in ONE corpus pass. The finest-level
    cells are computed with the same per-batch partial plan as ``pivot``
    and materialized (|distinct key combos| rows); every coarser level is a
    cheap re-aggregation OVER THE CELLS, never over the corpus. Rolled-up
    key positions carry the string '(all)' (COALESCE-matched in SQL), all
    key columns are emitted as strings, plus ``level`` (number of active
    keys) and ``value``."""
    import pandas as pd

    if agg not in _PIVOT_AGGS:
        raise ValueError(f"agg must be one of {_PIVOT_AGGS}, got {agg!r}")
    if not keys:
        raise ValueError("rollup needs at least one key")

    cdf = _grouping_cells(ds, keys, value, agg)
    levels = []
    for i in range(len(keys), -1, -1):
        active = keys[:i]
        if i == len(keys):
            levels.append(_level_frame(cdf, keys, active, agg, round_to))
        else:
            levels.append(_level_frame(_reaggregate_cells(cdf, active, agg), keys, active, agg, round_to))
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(["level", *keys], ascending=[False] + [True] * len(keys)).reset_index(drop=True)


def cube(ds, keys: list[str], value: str, agg: str = "sum", round_to: int | None = None):
    """SQL CUBE: aggregates at EVERY subset of ``keys`` (2^k grouping
    sets) in ONE corpus pass — the finest cells shuffle once, every other
    grouping set is a driver-side re-aggregation over those |combos|
    rows. Output schema matches ``rollup``: stringified keys with
    '(all)' at inactive positions, ``level`` = number of active keys,
    ``value``. ``len(keys)`` capped at 10 (1024 grouping sets) — beyond
    that, a cube stops being an explainable report."""
    import pandas as pd

    if agg not in _PIVOT_AGGS:
        raise ValueError(f"agg must be one of {_PIVOT_AGGS}, got {agg!r}")
    if not keys:
        raise ValueError("cube needs at least one key")
    if len(keys) > 10:
        raise ValueError(f"cube over {len(keys)} keys = {2 ** len(keys)} grouping sets; cap is 10 keys")

    cdf = _grouping_cells(ds, keys, value, agg)
    levels = []
    for mask in range((1 << len(keys)) - 1, -1, -1):
        active = [k for i, k in enumerate(keys) if mask & (1 << i)]
        if len(active) == len(keys):
            levels.append(_level_frame(cdf, keys, active, agg, round_to))
        else:
            levels.append(_level_frame(_reaggregate_cells(cdf, active, agg), keys, active, agg, round_to))
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(["level", *keys], ascending=[False] + [True] * len(keys)).reset_index(drop=True)


def grouping_sets(ds, keys: list[str], sets: list[list[str]], value: str,
                  agg: str = "sum", round_to: int | None = None):
    """SQL GROUPING SETS: aggregate at exactly the requested key subsets in
    ONE corpus pass — the generalization rollup/cube specialize. The
    finest-level (all-keys) cells shuffle once (`_grouping_cells`); every
    requested set is a driver-side re-aggregation over those |combos| rows,
    valid because each supported agg is distributive over the cells.

    ``sets`` must be distinct subsets of ``keys`` (order within a set is
    ignored — key columns always emit in ``keys`` order, matching SQL's
    column-position semantics). Output schema matches rollup/cube:
    stringified keys with '(all)' at inactive positions, ``level`` = number
    of active keys, ``value``. SQL mirror: ``GROUP BY GROUPING SETS (...)``
    with ``COALESCE(k, '(all)')`` per key and
    ``level = n - (GROUPING(k1) + ... + GROUPING(kn))``.
    """
    import pandas as pd

    if agg not in _PIVOT_AGGS:
        raise ValueError(f"agg must be one of {_PIVOT_AGGS}, got {agg!r}")
    if not keys:
        raise ValueError("grouping_sets needs at least one key")
    norm, seen = [], set()
    for s in sets:
        extra = set(s) - set(keys)
        if extra:
            raise ValueError(f"grouping set {s!r} references unknown keys {sorted(extra)}")
        canon = tuple(k for k in keys if k in set(s))
        if canon in seen:
            raise ValueError(f"duplicate grouping set {list(canon)!r}")
        seen.add(canon)
        norm.append(list(canon))
    if not norm:
        raise ValueError("grouping_sets needs at least one set")

    cdf = _grouping_cells(ds, keys, value, agg)
    levels = []
    for active in norm:
        if len(active) == len(keys):
            levels.append(_level_frame(cdf, keys, active, agg, round_to))
        else:
            levels.append(_level_frame(_reaggregate_cells(cdf, active, agg), keys, active, agg, round_to))
    out = pd.concat(levels, ignore_index=True)
    return out.sort_values(["level", *keys], ascending=[False] + [True] * len(keys)).reset_index(drop=True)


def mode_by_group(ds, group: str, col: str):
    """Exact statistical mode per group: the most frequent non-null value
    of ``col`` within each ``group``, ties broken toward the SMALLEST value
    (a deterministic rule DuckDB's ``mode()`` does not guarantee — the SQL
    mirror is ``row_number() OVER (PARTITION BY g ORDER BY cnt DESC, v)``).

    Shuffle shape: per-batch Arrow ``group_by`` shrinks every block to its
    local (group, value, count) cells, ONE groupby merges the cells, and a
    per-group pick runs over |distinct values in group| rows — hot groups
    cost their value cardinality, never their row count. Null values are
    excluded (mirror with ``WHERE col IS NOT NULL``).

    Returns a Dataset of ``(group, mode_value, mode_count)``.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select([group, col]).filter(pc.is_valid(batch[col]))
        cells = t.group_by([group, col]).aggregate([([], "count_all")])
        return cells.rename_columns([group, col, "__mode_c__"])

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    merged = fast_groupby(
        cells,
        [group, col],
        Sum("__mode_c__", alias_name="cnt"),
    )

    def pick(df):
        df = df.sort_values(["cnt", col], ascending=[False, True], kind="mergesort")
        top = df.iloc[:1]
        out = top[[group]].copy()
        out["mode_value"] = top[col].to_numpy()
        out["mode_count"] = top["cnt"].astype("int64").to_numpy()
        return out.reset_index(drop=True)

    return merged.groupby(group).map_groups(pick, batch_format="pandas", **remote_args())


def ndistinct_by_group(ds, group: str, col: str):
    """Exact ``count(DISTINCT col)`` per group at scale. Three-stage
    dedupe so raw rows never shuffle twice and hot groups never
    materialize: per-batch local distinct (one Arrow group_by, emits each
    (group, value) pair once per block), ONE global groupby over the
    distinct pairs, then a per-group count whose input is already one row
    per distinct value. Only the two named columns ever move. Exact — no
    hash sketch, no collision risk (the pair groupby carries the value
    itself); for approximate-but-smaller state see ops/sketch.py:HLL.
    Returns a Dataset of (group, n_distinct)."""
    from ray.data.aggregate import Count

    def local_distinct(batch: pa.Table) -> pa.Table:
        return batch.select([group, col]).group_by([group, col]).aggregate([])

    pairs = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    dist = fast_groupby(
        pairs,
        [group, col],
        Count(alias_name="__nd_c__"),
    ).select_columns([group, col])
    return fast_groupby(
        dist,
        group,
        Count(alias_name="n_distinct"),
    )


def topk_by_group(ds, group: str, order_col: str, id_col: str, k: int = 10,
                  value_scale: int = 100):
    """Generic exact top-k rows per group by a numeric column (descending),
    ties broken toward the SMALLEST id — SQL
    ``row_number() OVER (PARTITION BY g ORDER BY units DESC, id)`` kept
    where ``<= k``. The order value quantizes to exact integer units
    (``floor(value * value_scale + 0.5)``) so ordering is bit-stable.

    Shuffle shape: every batch prunes locally to its own k best
    (units, id) cells per group (no batch can contribute more than k
    winners), so the ONE groupby carries at most k rows per group per
    block; the per-group final pick runs over <= k * n_blocks rows. Full
    rows never move — join the ids back for payloads.

    Returns a Dataset of ``(group, id_col, units, rk)``.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def local_prune(batch: pa.Table) -> pd.DataFrame:
        v = batch[order_col].to_numpy(zero_copy_only=False)
        if batch[order_col].null_count or np.isnan(v).any():
            raise ValueError(f"{order_col!r} must be non-null for top-k")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        df = pd.DataFrame(
            {
                "g": batch[group].to_pandas(),
                "i": batch[id_col].cast(pa.int64()).to_pandas(),
                "u": units,
            }
        )
        df = df.sort_values(["g", "u", "i"], ascending=[True, False, True], kind="mergesort")
        return df.groupby("g", sort=False).head(k).reset_index(drop=True)

    cells = ds.map_batches(local_prune, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["u", "i"], ascending=[False, True], kind="mergesort").head(k)
        out = pd.DataFrame(
            {
                group: df["g"].to_numpy(),
                id_col: df["i"].astype("int64").to_numpy(),
                "units": df["u"].astype("int64").to_numpy(),
                "rk": np.arange(1, len(df) + 1, dtype=np.int64),
            }
        )
        return out

    return cells.groupby("g").map_groups(pick, batch_format="pandas", **remote_args())


def quantile_bucketize(ds, order_col: str, id_col: str, n: int,
                       value_scale: int = 100):
    """Global equi-depth bucketing — SQL ``ntile(n) OVER (ORDER BY units,
    id)`` with SQL's front-loaded remainder rule (the first ``N mod n``
    buckets get one extra row). The unique ``id`` tiebreak makes the
    assignment deterministic; values quantize to exact integer units.
    Returns a Dataset of ``(id_col, units, bucket)`` (1-based buckets).

    Plan (the select_by_budget pinned-block shape): only (units, id)
    metadata sorts; pass A ships one (block-lo, count) row per block, the
    driver orders blocks, checks disjointness, and folds exclusive row
    offsets; pass B turns offset + arange into global row numbers and
    applies the ntile formula per row — full rows never shuffle.
    """
    import ray

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[order_col].to_numpy(zero_copy_only=False)
        if batch[order_col].null_count or np.isnan(v).any():
            raise ValueError(f"{order_col!r} must be non-null for bucketing")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                "u": pa.array(units, pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["u", "i"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_u", "blo_i", "bhi_u", "bhi_i", "cnt")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        return pa.table(
            {
                "blo_u": pa.array([batch["u"][0].as_py()], pa.int64()),
                "blo_i": pa.array([batch["i"][0].as_py()], pa.int64()),
                "bhi_u": pa.array([batch["u"][-1].as_py()], pa.int64()),
                "bhi_i": pa.array([batch["i"][-1].as_py()], pa.int64()),
                "cnt": pa.array([batch.num_rows], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    parts = parts.sort_values(["blo_u", "blo_i"]).reset_index(drop=True)
    his = list(zip(parts["bhi_u"], parts["bhi_i"]))
    los = list(zip(parts["blo_u"], parts["blo_i"]))
    for prev_hi, nxt_lo in zip(his, los[1:]):
        if not (prev_hi < nxt_lo):
            raise ValueError(
                "sorted metadata blocks overlap — duplicate (units, id) pairs or a non-disjoint sort"
            )
    offs = np.concatenate(([0], np.cumsum(parts["cnt"].to_numpy(dtype=np.int64))[:-1]))
    offsets = {(int(u), int(i)): int(o) for (u, i), o in zip(los, offs)}
    total = int(parts["cnt"].sum())
    offsets_ref = ray.put(offsets)
    size, rem = divmod(total, n)
    cut = rem * (size + 1)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                "units": pa.array([], pa.int64()),
                "bucket": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        off = ray.get(offsets_ref)[(batch["u"][0].as_py(), batch["i"][0].as_py())]
        rn0 = off + np.arange(batch.num_rows, dtype=np.int64)
        if size == 0:
            bucket = rn0 + 1
        else:
            bucket = np.where(rn0 < cut, rn0 // (size + 1), rem + (rn0 - cut) // size) + 1
        return pa.table(
            {
                id_col: batch["i"],
                "units": batch["u"],
                "bucket": pa.array(bucket.astype(np.int64), pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def string_agg_by_group(ds, group: str, col: str, sep: str = ",", distinct: bool = False,
                        max_group_values: int = 1 << 20):
    """SQL ``string_agg(col, sep ORDER BY col)`` per group (optionally
    DISTINCT): the report-friendly "collapse the members into one cell"
    aggregate. Values order by their STRING form (binary codepoint order —
    DuckDB's default collation), so parity is exact.

    The (group, value) pairs must shuffle — that's inherent to an
    order-sensitive string fold — but with ``distinct=True`` each block
    pre-dedupes locally and ONE pair groupby collapses globally first, so
    a hot group costs its value cardinality. Groups larger than
    ``max_group_values`` fail loudly (a group's members must fit a worker
    to concatenate). Returns a Dataset of ``(group, agg)``.
    """
    import pandas as pd

    def prep(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {group: batch[group].combine_chunks(), col: batch[col].combine_chunks().cast(pa.string())}
        ).drop_null()
        if distinct:
            t = t.group_by([group, col]).aggregate([])
        return t

    pairs = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if distinct:
        from ray.data.aggregate import Count

        pairs = fast_groupby(
        pairs,
        [group, col],
        Count(alias_name="__sa_c__"),
    ).select_columns([group, col])

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) > max_group_values:
            raise ValueError(
                f"group {df[group].iloc[0]!r} holds {len(df)} values > max_group_values={max_group_values}"
            )
        vals = sorted(df[col].astype(str))
        return pd.DataFrame({group: [df[group].iloc[0]], "agg": [sep.join(vals)]})

    return pairs.groupby(group).map_groups(fold, batch_format="pandas", **remote_args())


def frequency_histogram(ds, key: str):
    """Frequency-of-frequencies: how many keys occur exactly f times — the
    activity-distribution / heavy-tail audit (users by event count, tokens
    by occurrence). Two metadata-only groupbys: per-batch (key, count)
    cells merge into exact per-key counts, then the counts themselves
    aggregate. Returns a Dataset of ``(freq, n_keys)``; null keys drop.
    """
    from ray.data.aggregate import Count, Sum

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"k": pc.drop_null(batch[key].combine_chunks())})
        g = t.group_by("k").aggregate([([], "count_all")])
        return g.rename_columns(["k", "c"])

    per_key = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "k",
        Sum("c", alias_name="freq"),
    )
    )
    return fast_groupby(
        per_key,
        "freq",
        Count(alias_name="n_keys"),
    )


def quantile_disc_from_counts(values: np.ndarray, counts: np.ndarray, qs: list[float]) -> list[int]:
    """DuckDB/Postgres ``quantile_disc``: the element at (1-based) rank
    ``ceil(q * n)`` of the sorted multiset (clamped to >= 1) — probed and
    pinned against DuckDB. The rank product runs in float64, the SAME ieee
    multiply SQL performs, so edge flips (0.1*10 -> 1.0000000000000002)
    agree on both engines."""
    order = np.argsort(values)
    v = values[order]
    c = counts[order].astype(np.int64)
    n = int(c.sum())
    if n == 0:
        raise ValueError("quantile_disc over an empty distribution")
    cum = np.cumsum(c)
    out = []
    for q in qs:
        rank = max(1, int(np.ceil(np.float64(q) * n)))
        out.append(int(v[np.searchsorted(cum, rank, side="left")]))
    return out


def robust_stats_by_group(ds, group: str, col: str, value_scale: int = 100):
    """Outlier-robust per-group statistics in exact integer units: count,
    discrete median, Q1/Q3/IQR, and the median absolute deviation — the
    pre-training distribution health check that means/stds get wrong under
    heavy tails. All values are ``quantile_disc`` picks over units
    (``floor(value*scale + 0.5)``), so every output is an int64 and the
    SQL compare is exact.

    ONE data pass: per-batch (group, units, count) cells -> one groupby.
    Each group's worker derives the |u - median| distribution from its own
    (units, count) cells — the MAD costs no second corpus pass. Hot groups
    cost their distinct-unit count. Returns
    ``(group, n, med, q1, q3, iqr, mad)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for robust stats")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u, pa.int64())})
        g = t.group_by(["g", "u"]).aggregate([([], "count_all")])
        return g.rename_columns(["g", "u", "c"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "u"],
        Sum("c", alias_name="c"),
    )
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.int64)
        c = df["c"].to_numpy(dtype=np.int64)
        med, q1, q3 = quantile_disc_from_counts(u, c, [0.5, 0.25, 0.75])
        dev = np.abs(u - med)
        # collapse duplicate deviations (u below/above median can collide)
        dd = pd.DataFrame({"d": dev, "c": c}).groupby("d", as_index=False)["c"].sum()
        (mad,) = quantile_disc_from_counts(dd["d"].to_numpy(), dd["c"].to_numpy(), [0.5])
        return pd.DataFrame(
            {
                group: [df["g"].iloc[0]],
                "n": [np.int64(c.sum())],
                "med": [np.int64(med)],
                "q1": [np.int64(q1)],
                "q3": [np.int64(q3)],
                "iqr": [np.int64(q3 - q1)],
                "mad": [np.int64(mad)],
            }
        )

    return dist.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())


def winsorize(ds, col: str, id_cols: list[str], q_lo: float = 0.05, q_hi: float = 0.95,
              value_scale: int = 100):
    """Clip a column to its discrete [q_lo, q_hi] quantiles — the outlier
    winsorization step before loss-sensitive training. Bounds come from
    ONE metadata pass over the (units, count) distribution
    (``quantile_disc`` semantics, exact integers), broadcast once; the
    clip itself is a stateless vectorized second pass. Returns a Dataset
    of ``(*id_cols, units, w_units)``.
    """
    from ray.data.aggregate import Sum

    if not (0.0 <= q_lo <= q_hi <= 1.0):
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got {q_lo}, {q_hi}")

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for winsorization")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"u": pa.array(u, pa.int64())})
        return t.group_by("u").aggregate([([], "count_all")]).rename_columns(["u", "c"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "u",
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    lo, hi = quantile_disc_from_counts(
        dist["u"].to_numpy(dtype=np.int64), dist["c"].to_numpy(dtype=np.int64), [q_lo, q_hi]
    )

    def clip(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        w = np.clip(u, lo, hi)
        out = {c: batch[c] for c in id_cols}
        out["units"] = pa.array(u, pa.int64())
        out["w_units"] = pa.array(w, pa.int64())
        return pa.table(out)

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def hhi_by_group(ds, group: str, key: str, max_group_rows: int = 1 << 31):
    """Herfindahl–Hirschman concentration index of ``key`` within each
    ``group`` — "is this source dominated by a handful of domains?", the
    concentration audit run before mixing corpus sources. HHI = sum over
    keys of (share^2) = (sum cnt^2) / total^2, so the whole statistic is
    ONE division of two exact integers: bitwise-reproducible on any plan
    and bitwise-equal to the SQL oracle.

    Plan: per-batch (group, key) count cells -> one cell groupby -> square
    -> one per-group groupby of (cnt^2, cnt). Only metadata moves; full
    rows never shuffle. Guarded at ``max_group_rows`` (default 2^31) so
    total^2 and the sum of squares stay inside int64; beyond that, sample
    or sub-partition the group first.

    Returns a Dataset of ``(group, n_keys, n_rows, hhi)``.
    """
    from ray.data.aggregate import Count, Sum

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group].combine_chunks(), "k": batch[key].combine_chunks()})
        if t["g"].null_count or t["k"].null_count:
            raise ValueError("hhi_by_group: null group/key values")
        out = t.group_by(["g", "k"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "k", "c"])

    counts = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "k"],
        Sum("c", alias_name="c"),
    )
    )

    def squares(batch: pa.Table) -> pa.Table:
        c = batch["c"].to_numpy(zero_copy_only=False).astype(np.int64)
        if c.max(initial=0) > max_group_rows:
            raise ValueError(
                f"hhi_by_group: a (group, key) cell holds {c.max()} rows "
                f"(> {max_group_rows}); int64 squares would overflow"
            )
        return pa.table({"g": batch["g"].combine_chunks(),
                         "c": batch["c"].combine_chunks(),
                         "c2": pa.array(c * c, pa.int64())})

    folded = (fast_groupby(
        counts.map_batches(squares, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Count(alias_name="n_keys"), Sum("c", alias_name="n_rows"),
                   Sum("c2", alias_name="s2"),
    )
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].to_numpy(zero_copy_only=False).astype(np.int64)
        s2 = batch["s2"].to_numpy(zero_copy_only=False).astype(np.int64)
        if n.max(initial=0) > max_group_rows:
            raise ValueError(f"hhi_by_group: group holds {n.max()} rows (> {max_group_rows})")
        # ONE float division of exact ints — bitwise SQL parity
        hhi = s2.astype(np.float64) / (n * n).astype(np.float64)
        return pa.table({group: batch["g"].combine_chunks(),
                         "n_keys": batch["n_keys"].combine_chunks(),
                         "n_rows": batch["n_rows"].combine_chunks(),
                         "hhi": pa.array(hhi, pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def mad_outliers(ds, group: str, col: str, k: int = 5, value_scale: int = 100):
    """Flag per-group robust outliers: rows with
    ``|units - median| > k * MAD`` (median absolute deviation), the
    heavy-tail-safe outlier rule (means/stds are themselves dragged by the
    outliers they should catch). Composes `robust_stats_by_group` — the
    (median, MAD) table is tiny (one row per group), collected once and
    broadcast; the flagging pass is stateless and vectorized. All
    comparisons are exact int64 (units = floor(value*scale + 0.5), integer
    k) — bitwise-identical to the SQL oracle on any plan.

    Returns the outlier rows as ``(*original columns, units, dev)``.
    """
    import ray

    stats = robust_stats_by_group(ds, group, col, value_scale=value_scale).to_pandas()
    med_of = dict(zip(stats[group], stats["med"].astype(np.int64)))
    mad_of = dict(zip(stats[group], stats["mad"].astype(np.int64)))
    med_ref = ray.put((med_of, mad_of))

    def flag(batch: pa.Table) -> pa.Table:
        med_of, mad_of = ray.get(med_ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        g = batch[group].to_pandas()
        med = g.map(med_of).to_numpy(dtype=np.int64)
        mad = g.map(mad_of).to_numpy(dtype=np.int64)
        dev = np.abs(u - med)
        keep = dev > k * mad
        out = batch.append_column("units", pa.array(u, pa.int64()))
        out = out.append_column("dev", pa.array(dev, pa.int64()))
        return out.filter(pa.array(keep))

    return ds.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def regression_by_group(ds, group: str, x_col: str, y_col: str,
                        x_scale: int = 100, y_scale: int = 100,
                        max_abs_sum: int = 1 << 62):
    """Per-group simple OLS regression (slope / intercept / r^2) from ONE
    metadata pass. Per batch: exact int64 unit conversions and per-group
    partial sums (n, Sx, Sy, Sxx, Syy, Sxy); one small groupby merges the
    partials; the closed-form fold runs per group on the driver-side-free
    final map_batches.

    Float parity contract (the BM25 rule): every sum is an exact int64
    (loudly guarded at ``max_abs_sum``), each is cast to float64 ONCE, and
    the slope/intercept/r2 expression trees below are mirrored op-for-op
    by the SQL oracle (which must CAST its HUGEINT sums back to BIGINT,
    then to DOUBLE):

        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx*Sx)
        icept = (Sy - slope*Sx) / n
        r2    = ((n*Sxy - Sx*Sy) * (n*Sxy - Sx*Sy))
                / ((n*Sxx - Sx*Sx) * (n*Syy - Sy*Sy))

    Returns a Dataset of ``(group, n, slope, icept, r2)``.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        x = batch[x_col].to_numpy(zero_copy_only=False)
        y = batch[y_col].to_numpy(zero_copy_only=False)
        if batch[x_col].null_count or batch[y_col].null_count:
            raise ValueError("regression_by_group: null x/y values")
        ux = np.floor(x * x_scale + 0.5).astype(np.int64)
        uy = np.floor(y * y_scale + 0.5).astype(np.int64)
        big = max(np.abs(ux).max(initial=0), np.abs(uy).max(initial=0))
        if big >= 1 << 31:
            raise ValueError(
                f"regression_by_group: |units| {big} >= 2^31; int64 per-row "
                "products would overflow — reduce the unit scales"
            )
        t = pa.table({
            "g": batch[group].combine_chunks(),
            "n": pa.array(np.ones(len(ux), np.int64)),
            "sx": pa.array(ux), "sy": pa.array(uy),
            "sxx": pa.array(ux * ux), "syy": pa.array(uy * uy),
            "sxy": pa.array(ux * uy),
        })
        out = t.group_by("g").aggregate(
            [("n", "sum"), ("sx", "sum"), ("sy", "sum"),
             ("sxx", "sum"), ("syy", "sum"), ("sxy", "sum")]
        )
        return out.rename_columns(["g", "n", "sx", "sy", "sxx", "syy", "sxy"])

    folded = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxx", alias_name="sxx"),
                   Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    )

    def finish(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
                for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        worst = max(abs(int(v.min(initial=0))) if len(v) else 0 for v in cols.values())
        worst = max(worst, max(int(v.max(initial=0)) if len(v) else 0 for v in cols.values()))
        if worst > max_abs_sum:
            raise ValueError(
                f"regression_by_group: |sum| {worst} > {max_abs_sum}; int64 partial "
                "sums can no longer be trusted — reduce the unit scales"
            )
        n = cols["n"].astype(np.float64)
        sx = cols["sx"].astype(np.float64)
        sy = cols["sy"].astype(np.float64)
        sxx = cols["sxx"].astype(np.float64)
        syy = cols["syy"].astype(np.float64)
        sxy = cols["sxy"].astype(np.float64)
        # mirrored op-for-op by the SQL oracle — keep both sides in sync
        cov_n = n * sxy - sx * sy
        var_n = n * sxx - sx * sx
        vary_n = n * syy - sy * sy
        slope = cov_n / var_n
        icept = (sy - slope * sx) / n
        r2 = (cov_n * cov_n) / (var_n * vary_n)
        return pa.table({group: batch["g"].combine_chunks(),
                         "n": batch["n"].combine_chunks(),
                         "slope": pa.array(slope, pa.float64()),
                         "icept": pa.array(icept, pa.float64()),
                         "r2": pa.array(r2, pa.float64())})

    return folded.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def standardize_by_group(ds, group: str, col: str, id_cols: list[str],
                         value_scale: int = 100):
    """Per-group z-score standardization with BITWISE SQL parity. The
    population z-score algebraically reduces to a single division of exact
    integers:

        z = (u - S/n) / (sqrt(n*Q - S*S) / n) = (n*u - S) / sqrt(n*Q - S*S)

    with u = floor(value*scale + 0.5), n = group count, S = sum(u),
    Q = sum(u*u), all exact int64 (loudly guarded). One int64->float64
    cast each side, one correctly-rounded sqrt, ONE division — the same
    IEEE expression tree the SQL oracle evaluates, so results are
    bit-identical on any plan.

    Two passes: a metadata-only (group, n, S, Q) fold (broadcast once —
    one row per group), then a stateless vectorized transform. Returns
    ``(*id_cols, group, units, z)``; single-row / zero-variance groups
    yield z = NaN on both sides (0/0).
    """
    import ray
    from ray.data.aggregate import Count, Sum

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for standardization")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        if np.abs(u).max(initial=0) >= 1 << 31:
            raise ValueError("standardize_by_group: |units| >= 2^31 — squares overflow")
        t = pa.table({"g": batch[group].combine_chunks(),
                      "u": pa.array(u), "q": pa.array(u * u)})
        out = t.group_by("g").aggregate([("u", "count"), ("u", "sum"), ("q", "sum")])
        return out.rename_columns(["g", "n", "s", "q"])

    stats = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("s", alias_name="s"), Sum("q", alias_name="q"),
    )
        .to_pandas()
    )
    lookup = {}
    for _, r in stats.iterrows():
        n, s, q = int(r["n"]), int(r["s"]), int(r["q"])
        if abs(n * q) >= 1 << 63 or abs(s * s) >= 1 << 63:
            raise ValueError("standardize_by_group: n*Q or S*S exceeds int64 — reduce the scale")
        lookup[r["g"]] = (np.int64(n), np.int64(s), np.int64(n * q - s * s))
    ref = ray.put(lookup)

    def transform(batch: pa.Table) -> pa.Table:
        import pandas as pd

        table = ray.get(ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        gs = batch[group].to_pandas()
        n = gs.map({k: t[0] for k, t in table.items()}).to_numpy(dtype=np.int64)
        s = gs.map({k: t[1] for k, t in table.items()}).to_numpy(dtype=np.int64)
        var_n = gs.map({k: t[2] for k, t in table.items()}).to_numpy(dtype=np.int64)
        # mirrored op-for-op by the SQL oracle — keep both sides in sync
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (n * u - s).astype(np.float64) / np.sqrt(var_n.astype(np.float64))
        out = {c: batch[c] for c in id_cols}
        out[group] = batch[group]
        out["units"] = pa.array(u, pa.int64())
        out["z"] = pa.array(z, pa.float64())
        return pa.table(out)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def quantile_transform(ds, col: str, id_cols: list[str], value_scale: int = 100,
                       max_distinct: int = 1 << 26):
    """Corpus-wide quantile (rank) transform: each row gets its SQL
    ``percent_rank() OVER (ORDER BY units)`` — (count of strictly smaller
    values) / (n - 1), ties share the min rank — turning any skewed score
    into a uniform [0, 1] feature. BITWISE SQL parity: the numerator and
    denominator are exact ints, ONE division.

    Plan: one metadata (units, count) groupby (bounded by |distinct units|,
    guarded at ``max_distinct``); the sorted distribution broadcasts once;
    the transform pass is a stateless searchsorted per batch. Returns
    ``(*id_cols, units, pct)``; a 1-row corpus yields pct = 0.0 (the SQL
    percent_rank convention, special-cased to dodge 0/0).
    """
    import ray
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for quantile transform")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"u": pa.array(u)})
        return t.group_by("u").aggregate([([], "count_all")]).rename_columns(["u", "c"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "u",
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    if len(dist) > max_distinct:
        raise ValueError(
            f"quantile_transform: {len(dist)} distinct units (> {max_distinct}) — "
            "coarsen value_scale or switch to a KLL-sketch approximation"
        )
    order = np.argsort(dist["u"].to_numpy(dtype=np.int64))
    su = dist["u"].to_numpy(dtype=np.int64)[order]
    sc = dist["c"].to_numpy(dtype=np.int64)[order]
    below = np.zeros(len(sc), dtype=np.int64)
    np.cumsum(sc[:-1], out=below[1:])
    n = int(sc.sum())
    ref = ray.put((su, below))

    def transform(batch: pa.Table) -> pa.Table:
        su, below = ray.get(ref)  # zero-copy plasma views
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        rank_below = below[np.searchsorted(su, u)]
        if n <= 1:
            pct = np.zeros(len(u), np.float64)
        else:
            # ONE float division of exact ints — bitwise SQL parity
            pct = rank_below.astype(np.float64) / np.float64(n - 1)
        out = {c: batch[c] for c in id_cols}
        out["units"] = pa.array(u, pa.int64())
        out["pct"] = pa.array(pct, pa.float64())
        return pa.table(out)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def minmax_scale_by_group(ds, group: str, col: str, id_cols: list[str],
                          value_scale: int = 100):
    """Per-group min-max scaling to [0, 1] with BITWISE SQL parity:
    ``scaled = (u - min) / (max - min)`` over exact int64 units — one
    int->double cast per operand, ONE division. The (min, max) table is
    one metadata groupby (one row per group), broadcast once; the rewrite
    is stateless. Constant groups (max == min) yield NaN (0/0), matching
    the SQL expression. Returns ``(*id_cols, group, units, scaled)``."""
    import ray
    from ray.data.aggregate import Max, Min

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for min-max scaling")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u)})
        out = t.group_by("g").aggregate([("u", "min"), ("u", "max")])
        return out.rename_columns(["g", "lo", "hi"])

    stats = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Min("lo", alias_name="lo"), Max("hi", alias_name="hi"),
    )
        .to_pandas()
    )
    lookup = {r["g"]: (np.int64(r["lo"]), np.int64(r["hi"])) for _, r in stats.iterrows()}
    ref = ray.put(lookup)

    def transform(batch: pa.Table) -> pa.Table:
        table = ray.get(ref)
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        gs = batch[group].to_pandas()
        lo = gs.map({k: t[0] for k, t in table.items()}).to_numpy(dtype=np.int64)
        hi = gs.map({k: t[1] for k, t in table.items()}).to_numpy(dtype=np.int64)
        with np.errstate(invalid="ignore", divide="ignore"):
            scaled = (u - lo).astype(np.float64) / (hi - lo).astype(np.float64)
        out = {c: batch[c] for c in id_cols}
        out[group] = batch[group]
        out["units"] = pa.array(u, pa.int64())
        out["scaled"] = pa.array(scaled, pa.float64())
        return pa.table(out)

    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def entropy_by_group(ds, group: str, key: str, terms: bool = False):
    """Shannon entropy of the ``key`` distribution within each ``group`` —
    the mixture-diversity audit ("is src3 all one language?") run next to
    [[hhi_by_group]] before weighting corpus sources.

    Parity contract (the BM25/psi rule): each per-key term is ONE float
    expression over exact int64 counts — ``term = -(c/n) * ln(c/n)`` with
    single divisions and ``math.log`` (libm, the correctly-rounded ln
    DuckDB calls) — so with ``terms=True`` every row is bitwise-equal to
    the SQL oracle. The folded per-group ``entropy`` (``terms=False``)
    sums those terms ascending by key seeded at 0.0 — deterministic on
    any plan, but SQL SUM() order is not pinnable, so hash-check the
    terms form and treat the fold as tolerance-stable (~1e-15).

    Plan: per-batch (group, key) count cells -> one metadata groupby;
    raw rows never shuffle. Returns a driver DataFrame (|cells| or
    |groups| rows — small by contract).
    """
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group].combine_chunks(), "k": batch[key].combine_chunks()})
        if t["g"].null_count or t["k"].null_count:
            raise ValueError("entropy_by_group: null group/key values")
        out = t.group_by(["g", "k"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "k", "c"])

    counts = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "k"],
        Sum("c", alias_name="c"),
    )
        .to_pandas()
        .sort_values(["g", "k"])
        .reset_index(drop=True)
    )
    tot = {g: int(s) for g, s in counts.groupby("g")["c"].sum().items()}
    n = counts["g"].map(tot).astype(np.int64)
    # mirrored op-for-op by the SQL oracle — keep both sides in sync
    p = counts["c"].to_numpy(dtype=np.int64).astype(np.float64) / n.to_numpy().astype(np.float64)
    term = np.array([(-pi) * np.float64(math.log(pi)) for pi in p], dtype=np.float64)
    if terms:
        return pd.DataFrame({group: counts["g"], key: counts["k"],
                             "c": counts["c"].astype(np.int64), "n": n, "term": term})
    rows = []
    for g, grp in pd.DataFrame({"g": counts["g"], "t": term}).groupby("g", sort=True):
        h = np.float64(0.0)
        for t in grp["t"]:  # ascending-key 0.0-seeded fold (deterministic on any plan)
            h = h + np.float64(t)
        rows.append((g, int((counts["g"] == g).sum()), tot[g], float(h)))
    return pd.DataFrame(rows, columns=[group, "n_keys", "n_rows", "entropy"])


def gini_by_group(ds, group: str, col: str, value_scale: int = 100):
    """Per-group Gini coefficient of a non-negative measure — the
    inequality audit ("how skewed is revenue across orders?") beside
    [[hhi_by_group]]. Exact-integer end to end until ONE division:

        gini = (2*S_ru - (n+1)*S_u) / (n*S_u)

    with ``S_ru = sum(rank_i * u_i)`` over ranks assigned ascending by
    unit value (ties rank arbitrarily — S_ru is tie-permutation
    invariant, so SQL row_number() reproduces it exactly). The rank
    product fold runs per group over the (value -> count) distribution
    with PYTHON ints (no int64 wrap); the final int64-range guard mirrors
    the overflow error DuckDB's BIGINT arithmetic would raise.

    Plan: per-batch (group, unit, count) cells -> one metadata groupby
    over |groups x distinct units| rows -> driver fold. Raw rows never
    shuffle. Returns a driver DataFrame (group, n, sum_units, gini).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"gini_by_group: {col!r} must be non-null")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        if u.min(initial=0) < 0:
            raise ValueError("gini_by_group: negative units — Gini needs a non-negative measure")
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u)})
        out = t.group_by(["g", "u"]).aggregate([([], "count_all")])
        return out.rename_columns(["g", "u", "c"])

    counts = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "u"],
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    rows = []
    for g, grp in counts.sort_values(["g", "u"]).groupby("g", sort=True):
        n = 0
        s_u = 0
        s_ru = 0
        for u, c in zip(grp["u"], grp["c"]):  # ascending-unit exact-int fold
            u, c = int(u), int(c)
            s_ru += u * (c * n + c * (c + 1) // 2)  # ranks n+1 .. n+c
            n += c
            s_u += u * c
        num = 2 * s_ru - (n + 1) * s_u
        den = n * s_u
        if max(abs(num), den, 2 * s_ru, (n + 1) * s_u) >= 1 << 63:
            raise ValueError(f"gini_by_group: group {g!r} sums exceed int64 "
                             "(DuckDB BIGINT would overflow) — reduce value_scale")
        # ONE float division of exact ints — bitwise SQL parity
        gini = float(np.float64(num) / np.float64(den)) if den else float("nan")
        rows.append((g, n, s_u, gini))
    return pd.DataFrame(rows, columns=[group, "n", "sum_units", "gini"])


def chi_square(ds, col_a: str, col_b: str):
    """Pearson chi-square contingency terms between two categorical
    columns — the independence audit ("does language depend on source?")
    run before stratifying a mixture on either. Per observed cell:

        e = (row_total * col_total) / n ;  d = o - e ;  term = d*d / e

    every operand an exact int64 cast to double ONCE, single divisions —
    bitwise-equal to the SQL oracle per cell (sum the terms for the
    statistic; df = (|a|-1)*(|b|-1)). Only ONE metadata groupby over
    |a x b| cells; raw rows never shuffle. Row/column totals stay Python
    ints (exact) with an int64-range guard mirroring DuckDB's BIGINT
    overflow error. Returns a driver DataFrame
    ``(col_a, col_b, observed, expected, term)`` — observed cells only.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"a": batch[col_a].combine_chunks(), "b": batch[col_b].combine_chunks()})
        if t["a"].null_count or t["b"].null_count:
            raise ValueError("chi_square: null category values")
        out = t.group_by(["a", "b"]).aggregate([([], "count_all")])
        return out.rename_columns(["a", "b", "c"])

    counts = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["a", "b"],
        Sum("c", alias_name="c"),
    )
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    ra = {a: int(s) for a, s in counts.groupby("a")["c"].sum().items()}
    cb = {b: int(s) for b, s in counts.groupby("b")["c"].sum().items()}
    n = int(counts["c"].sum())
    prod = counts["a"].map(ra).astype(object) * counts["b"].map(cb).astype(object)
    if n >= 1 << 63 or (len(prod) and max(int(x) for x in prod) >= 1 << 63):
        raise ValueError("chi_square: row*col totals exceed int64 (DuckDB BIGINT would overflow)")
    # mirrored op-for-op by the SQL oracle — keep both sides in sync
    e = np.array([np.float64(int(x)) for x in prod], dtype=np.float64) / np.float64(n)
    o = counts["c"].to_numpy(dtype=np.int64).astype(np.float64)
    d = o - e
    term = d * d / e
    return pd.DataFrame({col_a: counts["a"], col_b: counts["b"],
                         "observed": counts["c"].astype(np.int64),
                         "expected": e, "term": term})


def welch_ttest(ds, group: str, col: str, group_a, group_b, value_scale: int = 100,
                max_abs_sum: int = 1 << 62):
    """Welch's unequal-variance t-test between two named groups — the A/B
    experiment readout ("did the new pipeline change mean quality?").
    Returns a one-row driver DataFrame
    ``(n_a, n_b, mean_a, mean_b, t, df)`` over exact int64 units.

    Parity contract (the regression_by_group rule): n/Sx/Sxx per side are
    exact integers (per-row |unit| < 2^31 guard, loud final-sum guard),
    each cast to float64 ONCE; then the whole statistic is this mirrored
    expression tree (keep the SQL oracle in sync op-for-op):

        m  = sx/n                 v  = (sxx - sx*sx/n) / (n-1)
        s2 = v/n  (per side)      t  = (m_a - m_b) / sqrt(s2_a + s2_b)
        df = (s2_a + s2_b)^2 / (s2_a^2/(n_a-1) + s2_b^2/(n_b-1))

    (squares written as x*x, never pow — DuckDB ^ is libm pow and not
    parity-safe; np.sqrt == libm sqrt, both correctly rounded).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch[group], value_set=pa.array([group_a, group_b]))
        t = batch.filter(keep)
        if not t.num_rows:
            return pa.table({"g": pa.array([], batch[group].type),
                             "n": pa.array([], pa.int64()),
                             "sx": pa.array([], pa.int64()),
                             "sxx": pa.array([], pa.int64())})
        v = t[col].to_numpy(zero_copy_only=False)
        if t[col].null_count or np.isnan(v).any():
            raise ValueError(f"welch_ttest: {col!r} must be non-null")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        if np.abs(u).max(initial=0) >= 1 << 31:
            raise ValueError("welch_ttest: |units| >= 2^31; int64 squares would overflow")
        cells = pa.table({"g": t[group].combine_chunks(),
                          "n": pa.array(np.ones(len(u), np.int64)),
                          "sx": pa.array(u), "sxx": pa.array(u * u)})
        out = cells.group_by("g").aggregate([("n", "sum"), ("sx", "sum"), ("sxx", "sum")])
        return out.rename_columns(["g", "n", "sx", "sxx"])

    stats = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sxx", alias_name="sxx"),
    )
        .to_pandas()
        .set_index("g")
    )
    for g in (group_a, group_b):
        if g not in stats.index:
            raise ValueError(f"welch_ttest: group {g!r} absent")
        if int(stats.loc[g, "n"]) < 2:
            raise ValueError(f"welch_ttest: group {g!r} has < 2 rows")
        if max(abs(int(stats.loc[g, c])) for c in ("n", "sx", "sxx")) > max_abs_sum:
            raise ValueError(f"welch_ttest: group {g!r} sums exceed {max_abs_sum}")

    def side(g):
        n = np.float64(int(stats.loc[g, "n"]))
        sx = np.float64(int(stats.loc[g, "sx"]))
        sxx = np.float64(int(stats.loc[g, "sxx"]))
        m = sx / n
        v = (sxx - sx * sx / n) / (n - np.float64(1.0))
        return n, m, v / n

    # mirrored op-for-op by the SQL oracle — keep both sides in sync
    na, ma, s2a = side(group_a)
    nb, mb, s2b = side(group_b)
    t_stat = (ma - mb) / np.sqrt(s2a + s2b)
    dof = ((s2a + s2b) * (s2a + s2b)) / (
        s2a * s2a / (na - np.float64(1.0)) + s2b * s2b / (nb - np.float64(1.0)))
    return pd.DataFrame({"n_a": [int(na)], "n_b": [int(nb)],
                         "mean_a": [float(ma)], "mean_b": [float(mb)],
                         "t": [float(t_stat)], "df": [float(dof)]})


def target_encode(ds, category: str, target: str, prior_weight: int = 20,
                  value_scale: int = 100):
    """Smoothed mean-target encoding of a categorical column:
    ``enc(cat) = (sum_cat + w * global_mean) / (n_cat + w)`` — the
    leakage-lite categorical featurizer. All sums are EXACT int64 units
    (``floor(target*scale + 0.5)``) and the blend is lifted to ONE double
    division, ``(su*N + w*S) / (N*(n + w))`` — mathematically identical to
    the classic nested-float form but bitwise-reproducible and mirrored
    op-for-op in SQL (the session-5d single-division rule). Returns a
    pandas DataFrame ``(category, n, sum_units, enc)`` — |categories| rows,
    driver-resident by design.

    Scale shape: per-batch Arrow group_by partials, ONE (category) cell
    groupby; the target payload never shuffles. int64 products are guarded
    (< 2^62) because numpy wraps silently."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    if prior_weight < 0:
        raise ValueError(f"prior_weight must be >= 0, got {prior_weight}")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[target].to_numpy(zero_copy_only=False)
        if batch[target].null_count or np.isnan(v).any():
            raise ValueError(f"target_encode: {target!r} must be non-null, non-NaN")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        if len(units) and np.abs(units).max() >= 1 << 31:
            raise ValueError("target_encode: |unit| >= 2^31 — raise value granularity guard")
        t = pa.table({"cat": batch[category].cast(pa.string()), "u": pa.array(units, pa.int64()),
                      "one": pa.array(np.ones(len(units), dtype=np.int64), pa.int64())})
        g = t.group_by("cat").aggregate([("u", "sum"), ("one", "sum")])
        return g.rename_columns(["cat", "su", "n"])

    cells = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "cat",
        Sum("su", alias_name="su"), Sum("n", alias_name="n"),
    )
        .to_pandas()
    )
    if cells.empty:
        return pd.DataFrame({"category": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "sum_units": pd.Series(dtype="int64"),
                             "enc": pd.Series(dtype="float64")})
    su = cells["su"].to_numpy(dtype=np.int64)
    n = cells["n"].to_numpy(dtype=np.int64)
    S = int(su.sum())
    N = int(n.sum())
    w = int(prior_weight)
    for name, val in (("su*N", int(np.abs(su).max()) * N), ("w*S", abs(w * S)),
                      ("N*(n+w)", N * (int(n.max()) + w))):
        if val >= 1 << 62:
            raise ValueError(f"target_encode: {name} would overflow int64 — reduce value_scale")
    num = su * np.int64(N) + np.int64(w) * np.int64(S)
    den = np.int64(N) * (n + np.int64(w))
    enc = num.astype(np.float64) / den.astype(np.float64)
    out = pd.DataFrame({"category": cells["cat"], "n": n, "sum_units": su, "enc": enc})
    return out.sort_values("category").reset_index(drop=True)


def rfm_segments(ds, user_col: str = "user_id", ts_col: str = "ts",
                 value_col: str = "value", n: int = 4, value_scale: int = 100):
    """RFM segmentation: per-key Recency (whole days since the key's last
    event, vs the corpus max), Frequency (event count) and Monetary
    (exact-int value units), each equi-depth-bucketed 1..n by
    ``quantile_bucketize`` (SQL ntile's front-loaded remainder, unique-id
    tiebreak). Returns a pandas DataFrame ``(user_col, r_days, f_cnt,
    m_units, r_bucket, f_bucket, m_bucket)`` — |keys| rows, driver-merged
    by design (shard the merge through hash_join when |keys| outgrows the
    driver).

    Scale shape: per-batch (key, max-ts/count/sum) partials, ONE key
    groupby; the three bucketize passes ride the pinned-block ntile plan
    over |keys|-sized metadata — raw events never shuffle."""
    import pandas as pd
    from ray.data.aggregate import Max, Sum

    def partial(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"rfm_segments: {value_col!r} must be non-null, non-NaN")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"k": batch[user_col].cast(pa.int64()), "us": us,
                      "u": pa.array(units, pa.int64()),
                      "one": pa.array(np.ones(len(units), dtype=np.int64), pa.int64())})
        g = t.group_by("k").aggregate([("us", "max"), ("u", "sum"), ("one", "sum")])
        return g.rename_columns(["k", "last_us", "su", "cnt"])

    metrics = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "k",
        Max("last_us", alias_name="last_us"),
                   Sum("su", alias_name="m_units"),
                   Sum("cnt", alias_name="f_cnt"),
    )
        .materialize()
    )
    tmax = metrics.max("last_us")

    def add_recency(batch: pa.Table) -> pa.Table:
        last = batch["last_us"].to_numpy(zero_copy_only=False)
        r = (np.int64(tmax) - last) // np.int64(86_400_000_000)
        return pa.table({
            user_col: batch["k"].cast(pa.int64()),
            "r_days": pa.array(r, pa.int64()),
            "f_cnt": batch["f_cnt"].cast(pa.int64()),
            "m_units": batch["m_units"].cast(pa.int64()),
        })

    met = metrics.map_batches(add_recency, batch_format="pyarrow", zero_copy_batch=True,
                              **remote_args()).materialize()

    def bucket_frame(col: str, out_name: str) -> pd.DataFrame:
        b = quantile_bucketize(met, col, user_col, n, value_scale=1).to_pandas()
        return b[[user_col, "bucket"]].rename(columns={"bucket": out_name})

    base = met.to_pandas()
    out = (
        base.merge(bucket_frame("r_days", "r_bucket"), on=user_col)
        .merge(bucket_frame("f_cnt", "f_bucket"), on=user_col)
        .merge(bucket_frame("m_units", "m_bucket"), on=user_col)
    )
    return out.sort_values(user_col).reset_index(drop=True)


def label_centroid_sums(ds, label_col: str = "label", vec_col: str = "embedding",
                        scale: int = 1 << 20):
    """Per-label embedding centroid in EXACT integer arithmetic: for every
    (label, dimension), the count and the sum of ``floor(x * scale + 0.5)``
    units (int64) — the mergeable form of a centroid (divide sum/n/scale
    downstream for the float centroid; the division is the only inexact
    step, so it stays out of the distributed fold). float32 components cast
    to float64 BEFORE the quantize expression — bit-identical to SQL's
    ``floor(CAST(val AS DOUBLE) * scale + 0.5)``.

    Returns a Dataset of ``(label, pos, n, sum_units)``. Scale shape:
    per-batch vectorized quantize + local (label) fold flattened to
    (label, pos) cells; ONE |labels x dims| cell groupby — embeddings
    never shuffle. Per-row |units| guarded < 2^31 (unit-norm embeddings
    at 2^20 scale are ~2^20; the guard catches mis-scaled inputs)."""
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        col = batch[vec_col].combine_chunks()
        if col.null_count:
            raise ValueError("label_centroid_sums: embeddings must be non-null")
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if len(widths) and (widths != widths[0]).any():
            raise ValueError("label_centroid_sums: ragged embedding lengths")
        d = int(widths[0]) if len(widths) else 0
        units = np.floor(flat * scale + 0.5)
        if len(units) and np.abs(units).max() >= 1 << 31:
            raise ValueError("label_centroid_sums: |unit| >= 2^31 — lower the scale")
        u = units.astype(np.int64).reshape(-1, d) if d else units.astype(np.int64).reshape(0, 0)
        labels = batch[label_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(uniq), d), dtype=np.int64)
        np.add.at(sums, inv, u)
        cnt = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        lab = np.repeat(uniq, d)
        pos = np.tile(np.arange(d, dtype=np.int64), len(uniq))
        return pa.table({
            "label": pa.array(lab, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "n": pa.array(np.repeat(cnt, d), pa.int64()),
            "sum_units": pa.array(sums.ravel(), pa.int64()),
        })

    return (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["label", "pos"],
        Sum("n", alias_name="n"), Sum("sum_units", alias_name="sum_units"),
    )
    )


def winsorize_by_group(ds, group: str, col: str, id_cols: list[str],
                       q_lo: float = 0.05, q_hi: float = 0.95,
                       value_scale: int = 100, max_broadcast_groups: int = 1 << 22):
    """Per-GROUP winsorization: clip each row's units to ITS group's
    discrete [q_lo, q_hi] quantiles (``quantile_disc`` semantics over
    exact integer units — the robust_stats_by_group rank rule, so the
    bounds are bitwise-equal to SQL's). The global ``winsorize`` clips
    every source with one corpus-wide band; the grouped form preserves
    per-source scale. Returns ``(*id_cols, group, units, w_units)``.

    Plan: per-batch (group, units) count cells -> ONE cell groupby ->
    per-group bounds fold (|groups| rows, broadcast once, guarded by
    ``max_broadcast_groups``); the clip is a stateless second pass —
    full rows never shuffle."""
    import ray
    from ray.data.aggregate import Sum

    if not (0.0 <= q_lo <= q_hi <= 1.0):
        raise ValueError(f"need 0 <= q_lo <= q_hi <= 1, got {q_lo}, {q_hi}")

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for winsorization")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u, pa.int64())})
        return t.group_by(["g", "u"]).aggregate([([], "count_all")]).rename_columns(["g", "u", "c"])

    import pandas as pd

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        lo, hi = quantile_disc_from_counts(
            df["u"].to_numpy(dtype=np.int64), df["c"].to_numpy(dtype=np.int64), [q_lo, q_hi]
        )
        return pd.DataFrame({group: [df["g"].iloc[0]], "lo": [np.int64(lo)], "hi": [np.int64(hi)]})

    bounds = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "u"],
        Sum("c", alias_name="c"),
    )
        .groupby("g")
        .map_groups(fold, batch_format="pandas", **remote_args())
        .to_pandas()
    )
    if len(bounds) > max_broadcast_groups:
        raise ValueError(f"{len(bounds)} groups exceed max_broadcast_groups={max_broadcast_groups}")
    bmap = {r[0]: (int(r[1]), int(r[2])) for r in bounds.itertuples(index=False)}
    bref = ray.put(bmap)

    def clip(batch: pa.Table) -> pa.Table:
        bm = ray.get(bref)
        v = batch[col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        gvals = batch[group].to_pylist()
        lo = np.array([bm[g][0] for g in gvals], dtype=np.int64)
        hi = np.array([bm[g][1] for g in gvals], dtype=np.int64)
        w = np.minimum(np.maximum(u, lo), hi)
        out = {c: batch[c] for c in id_cols}
        out[group] = batch[group]
        out["units"] = pa.array(u, pa.int64())
        out["w_units"] = pa.array(w, pa.int64())
        return pa.table(out)

    return ds.map_batches(clip, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def weighted_quantile_by_group(ds, group: str, col: str, weight_col: str,
                               qs: list[float] | None = None, value_scale: int = 100):
    """WEIGHT-weighted discrete quantiles per group — "the token-weighted
    median document length", where heavy rows should pull the quantile by
    their weight, not their row count. Weights quantize to exact integers
    (``floor(w + 0.5)``, must be >= 0) and the pick reuses
    ``quantile_disc_from_counts`` with weights AS counts — the rank
    product stays the float64 multiply DuckDB's ceil(q * total) performs,
    so every output is bitwise SQL-equal. Returns a pandas DataFrame
    ``(group, total_w, q_<q>...)``.

    Plan: per-batch (group, units) weight-sum cells -> ONE cell groupby ->
    per-group fold. Only metadata moves."""
    import pandas as pd
    from ray.data.aggregate import Sum

    qs = qs if qs is not None else [0.5, 0.9]

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or batch[weight_col].null_count or np.isnan(v).any() or np.isnan(w).any():
            raise ValueError("weighted_quantile_by_group: value/weight must be non-null")
        wu = np.floor(w + 0.5).astype(np.int64)
        if len(wu) and wu.min() < 0:
            raise ValueError("weighted_quantile_by_group: weights must be >= 0")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u, pa.int64()),
                      "w": pa.array(wu, pa.int64())})
        return t.group_by(["g", "u"]).aggregate([("w", "sum")]).rename_columns(["g", "u", "w"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "u"],
        Sum("w", alias_name="w"),
    )
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.int64)
        w = df["w"].to_numpy(dtype=np.int64)
        keep = w > 0  # zero-weight rows never hold rank mass
        picks = quantile_disc_from_counts(u[keep], w[keep], qs)
        out = {group: [df["g"].iloc[0]], "total_w": [np.int64(w.sum())]}
        for q, p in zip(qs, picks):
            out[f"q_{str(q).replace('.', '_')}"] = [np.int64(p)]
        return pd.DataFrame(out)

    return dist.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())


def apportion_largest_remainder(ds, group: str, units_col: str, seats: int):
    """Hamilton / largest-remainder apportionment: split ``seats`` integer
    seats across groups proportional to exact-int64 weights. Every group
    gets ``floor(seats * w / W)``; the leftover seats go to the largest
    remainders ``(seats * w) mod W`` (ties broken by ascending group key —
    deterministic). Returns a driver DataFrame of ``(group, w, seats)``
    ordered by group; sum(seats) == ``seats`` exactly.

    All arithmetic is exact integer: products are guarded < 2^62 so the
    same BIGINT expressions evaluate identically in SQL (DuckDB errors
    loudly on BIGINT overflow rather than wrapping). Weights must be
    non-negative (clamp upstream).

    Scale shape: per-batch partial unit sums pre-aggregate before ONE
    groupby over |groups|; the allocation itself is a driver-side numpy
    pass over |groups| rows (bounded by the group-key cardinality, not the
    row count)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if seats < 1:
        raise ValueError(f"seats must be >= 1, got {seats}")

    def partial(batch: pa.Table) -> pa.Table:
        u = batch[units_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(u) and u.min() < 0:
            raise ValueError("weights must be non-negative — clamp upstream")
        t = pa.table({"g": batch[group], "u": pa.array(u, pa.int64())})
        out = t.group_by("g").aggregate([("u", "sum")])
        return out.rename_columns(["g", "u"])

    totals = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("u", alias_name="w"),
    )
        .to_pandas()
        .sort_values("g", kind="stable")
        .reset_index(drop=True)
    )
    w = totals["w"].to_numpy(np.int64)
    W = int(w.sum())
    if W <= 0:
        raise ValueError("total weight must be positive")
    if seats * int(w.max()) >= 1 << 62:
        raise ValueError("seats * max(weight) must stay < 2^62 (exact-int guard)")
    prod = w * np.int64(seats)
    base = prod // W
    rem = prod % W
    extra = seats - int(base.sum())
    # rank remainders DESC, group key ASC == np.lexsort on (g asc, -rem)...
    # lexsort keys: last key is primary
    order = np.lexsort((np.arange(len(w)), -rem))
    alloc = base.copy()
    alloc[order[:extra]] += 1
    out = pd.DataFrame({group: totals["g"], "w": w, "seats": alloc.astype(np.int64)})
    assert int(out["seats"].sum()) == seats
    return out


def prop_ztest_by_group(ds, group: str, cond_col: str):
    """Per-group two-proportion z-test against the REST of the corpus — the
    categorical A/B readout ("does this event type convert more than
    everything else?"). ``cond_col`` must be a precomputed 0/1 int column
    (build the indicator upstream so the cut is explicit). Returns a driver
    DataFrame ``(group, n, x, n_rest, x_rest, z)`` sorted by group.

    Parity contract (the welch_ttest rule): n/x per group and the corpus
    totals are exact int64 counts, each cast to float64 ONCE; then

        p1 = x/n    p2 = x_rest/n_rest    pp = X/N
        z  = (p1 - p2) / sqrt(pp*(1-pp)*(1/n + 1/n_rest))

    mirrored op-for-op by the SQL oracle (np.sqrt == libm sqrt, both
    correctly rounded; every division a single IEEE op). Groups where the
    pooled rate is degenerate (pp == 0 or pp == 1) or one side is empty get
    z = 0.0 (mirror the SQL CASE). Only (group, n, x) cells shuffle.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        x = batch[cond_col].cast(pa.int64())
        xn = x.to_numpy(zero_copy_only=False)
        if batch[cond_col].null_count or ((xn != 0) & (xn != 1)).any():
            raise ValueError(f"prop_ztest_by_group: {cond_col!r} must be 0/1 non-null")
        cells = pa.table(
            {
                "g": batch[group].combine_chunks()
                if isinstance(batch[group], pa.ChunkedArray)
                else batch[group],
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "x": x,
            }
        )
        out = cells.group_by("g").aggregate([("n", "sum"), ("x", "sum")])
        return out.rename_columns(["g", "n", "x"])

    stats = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("x", alias_name="x"),
    )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    N = int(stats["n"].sum())
    X = int(stats["x"].sum())
    rows = []
    for g, n, x in stats.itertuples(index=False):
        n, x = int(n), int(x)
        n_rest, x_rest = N - n, X - x
        # mirrored op-for-op by the SQL oracle — keep both sides in sync
        if n_rest == 0 or n == 0 or X == 0 or X == N:
            z = 0.0
        else:
            p1 = np.float64(x) / np.float64(n)
            p2 = np.float64(x_rest) / np.float64(n_rest)
            pp = np.float64(X) / np.float64(N)
            z = float(
                (p1 - p2)
                / np.sqrt(
                    pp
                    * (np.float64(1.0) - pp)
                    * (np.float64(1.0) / np.float64(n) + np.float64(1.0) / np.float64(n_rest))
                )
            )
        rows.append((g, n, x, n_rest, x_rest, z))
    return pd.DataFrame(rows, columns=[group, "n", "x", "n_rest", "x_rest", "z"])


def lorenz_curve(ds, id_col: str, units_col: str, n_buckets: int = 10):
    """Concentration (Lorenz) curve over exact integer units: bucket the
    population into ``n_buckets`` equi-depth tiles ordered by ``(units,
    id)`` (SQL ntile's front-loaded rule via quantile_bucketize), then per
    tile report the member count, the exact unit sum, its share of the
    total, and the cumulative share — "the top decile holds X% of revenue".
    Returns a driver DataFrame of ``n_buckets`` rows (tiny by construction).

    ``units_col`` must already be exact int64 (quantize upstream — the
    tpch cents rule); shares are single divisions of exact int64 sums
    (cumulative sums fold in Python ints), so the doubles are bitwise
    reproducible against the SQL mirror. Only (units, id) metadata sorts.
    """
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    buck = quantile_bucketize(ds, order_col=units_col, id_col=id_col, n=n_buckets, value_scale=1)
    per = (fast_groupby(
        buck,
        "bucket",
        Count(alias_name="n"), Sum("units", alias_name="units"),
    )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    total = int(per["units"].sum())
    if total <= 0:
        raise ValueError("lorenz_curve: total units must be positive")
    cum = 0
    share, cum_share = [], []
    for u in per["units"]:
        u = int(u)
        cum += u
        share.append(float(np.float64(u) / np.float64(total)))
        cum_share.append(float(np.float64(cum) / np.float64(total)))
    return pd.DataFrame(
        {
            "bucket": per["bucket"].astype("int64"),
            "n": per["n"].astype("int64"),
            "units": per["units"].astype("int64"),
            "share": share,
            "cum_share": cum_share,
        }
    )


def quantile_cont_exact_from_counts(values: np.ndarray, counts: np.ndarray,
                                    qs: list[float]) -> list[float]:
    """quantile_cont with DuckDB's EXACT interpolation rule (pinned by
    bound-param fuzz, CLAUDE.md session-13):

        RN  = q * (n-1)            (float64 multiply)
        v   = (CRN-RN)*v[floor(RN)] + (RN-FRN)*v[ceil(RN)]

    — NOT the lerp ``lo + d*(hi-lo)`` (differs by 1 ulp on ~25% of inputs).
    Bitwise-equal to SQL quantile_cont when the q literal parses to the
    same double (use short decimals; 17-digit literals parse via DECIMAL
    and round differently)."""
    order = np.argsort(values, kind="stable")
    v = values[order].astype(np.float64)
    c = counts[order].astype(np.int64)
    n = int(c.sum())
    if n == 0:
        return [float("nan")] * len(qs)
    cum = np.cumsum(c)  # cumulative ENDING count of each value run
    out = []
    for q in qs:
        rn = np.float64(q) * np.float64(n - 1)
        frn = np.floor(rn)
        crn = np.ceil(rn)
        v_lo = v[np.searchsorted(cum, int(frn), side="right")]
        if crn == frn:
            out.append(float(v_lo))
        else:
            v_hi = v[np.searchsorted(cum, int(crn), side="right")]
            out.append(float((crn - rn) * v_lo + (rn - frn) * v_hi))
    return out


def grouped_quantiles_cont(ds, key: str, col: str, qs: list[float]):
    """Per-group quantile_cont with BITWISE SQL parity (no rounding —
    contrast grouped_quantiles' round-6): the count-distribution plan of
    grouped_quantiles with quantile_cont_exact_from_counts as the
    interpolator. Only (key, value, count) cells shuffle; each group's
    interpolation runs over its own |distinct values| rows. ``qs`` must be
    short-decimal literals (the DECIMAL-parse rule in the module docstring
    of quantile_cont_exact_from_counts)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    qs = list(qs)
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([key, col]).group_by([key, col]).aggregate([(col, "count")])
        return g.rename_columns([key, col, "__qc_cnt__"])

    dist = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        [key, col],
        Sum("__qc_cnt__", alias_name="__qc_cnt__"),
    )
    )

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        vals = quantile_cont_exact_from_counts(
            g[col].to_numpy(), g["__qc_cnt__"].to_numpy(), qs
        )
        return pd.DataFrame({key: [g[key].iloc[0]] * len(qs), "q": qs, "value": vals})

    return dist.groupby(key).map_groups(per_key, **remote_args())


def ks_test(ds, group: str, col: str, group_a, group_b, value_scale: int = 100):
    """Two-sample Kolmogorov–Smirnov D statistic between two named groups
    over exact integer units: D = max over distinct values of
    |cumA/nA - cumB/nB|. Returns a one-row driver DataFrame
    ``(n_a, n_b, d)``.

    Parity contract: counts and cumulative counts are exact ints; each
    per-value term is (cumA cast DOUBLE)/(nA cast DOUBLE) minus the same on
    the B side, abs'd — three IEEE ops — and the max over doubles is
    order-invariant, so the statistic is bitwise reproducible against the
    SQL window mirror. Memory is O(|distinct units|) (the
    quantiles_by_counts contract)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(batch[group], value_set=pa.array([group_a, group_b]))
        t = batch.filter(keep)
        if not t.num_rows:
            return pa.table({"u": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        v = t[col].to_numpy(zero_copy_only=False)
        if t[col].null_count or np.isnan(v).any():
            raise ValueError(f"ks_test: {col!r} must be non-null")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        is_a = pc.equal(t[group], group_a).to_numpy(zero_copy_only=False)
        cells = pa.table({"u": pa.array(u),
                          "a": pa.array(is_a.astype(np.int64)),
                          "b": pa.array((~is_a).astype(np.int64))})
        g = cells.group_by("u").aggregate([("a", "sum"), ("b", "sum")])
        return g.rename_columns(["u", "a", "b"])

    dist = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "u",
        Sum("a", alias_name="a"), Sum("b", alias_name="b"),
    )
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    na = int(dist["a"].sum())
    nb = int(dist["b"].sum())
    if na == 0 or nb == 0:
        raise ValueError("ks_test: both groups need rows")
    cum_a = 0
    cum_b = 0
    d = np.float64(0.0)
    for _, a, b in dist[["u", "a", "b"]].itertuples(index=False):
        cum_a += int(a)
        cum_b += int(b)
        term = abs(np.float64(cum_a) / np.float64(na) - np.float64(cum_b) / np.float64(nb))
        if term > d:
            d = term
    return pd.DataFrame({"n_a": [na], "n_b": [nb], "d": [float(d)]})


def mutual_info(ds, col_a: str, col_b: str):
    """Mutual information between two categorical columns, emitted as
    per-cell TERMS (the entropy_by_group rule — the fold is a sum of
    floats, so the hash-checkable form is the terms):

        term(x, y) = (c_xy / N) * ln( (c_xy * N) / (c_x * c_y) )

    with c_xy/c_x/c_y/N exact int64 counts, the products guarded < 2^62,
    each cast to double ONCE, one division per factor and math.log (libm —
    the BM25 rule). Returns a Dataset-backed driver DataFrame of
    ``(col_a, col_b, n_xy, term)`` sorted by (col_a, col_b); sum(term) is
    the MI in nats (fold downstream, tolerance-only)."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        t = batch.select([col_a, col_b]).group_by([col_a, col_b]).aggregate([([], "count_all")])
        return t.rename_columns([col_a, col_b, "n_xy"])

    joint = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        [col_a, col_b],
        Sum("n_xy", alias_name="n_xy"),
    )
        .to_pandas()
    )
    n_total = int(joint["n_xy"].sum())
    ca = joint.groupby(col_a)["n_xy"].sum().astype("int64")
    cb = joint.groupby(col_b)["n_xy"].sum().astype("int64")
    terms = []
    for _, r in joint.iterrows():
        cxy = int(r["n_xy"])
        cx = int(ca[r[col_a]])
        cy = int(cb[r[col_b]])
        if cxy * n_total >= 1 << 62 or cx * cy >= 1 << 62:
            raise ValueError("mutual_info: count products exceed the exact-int guard")
        # mirrored op-for-op by the SQL oracle (math.log == libm ln)
        term = (np.float64(cxy) / np.float64(n_total)) * np.float64(
            math.log(np.float64(cxy * n_total) / np.float64(cx * cy))
        )
        terms.append(float(term))
    out = joint.copy()
    out["n_xy"] = out["n_xy"].astype("int64")
    out["term"] = terms
    return out.sort_values([col_a, col_b]).reset_index(drop=True)


def wilson_lower_bound_by_group(ds, group: str, cond_col: str, z: str = "1.96"):
    """Wilson score lower bound of the per-group success rate — the ranking
    statistic that beats raw CTR for low-volume groups (a 1/1 group must not
    outrank a 480/500 group). ``cond_col`` must be a precomputed 0/1 int
    column. Returns a driver DataFrame ``(group, n, k, wilson_lb)`` sorted
    by group.

    Parity contract (the welch_ttest mirrored-expression rule): n/k are
    exact int64 counts, each cast to float64 ONCE; ``z`` is a DECIMAL
    STRING parsed with np.float64(z) == SQL ``CAST('z' AS DOUBLE)`` (both
    correctly-rounded decimal parses); then with p = k/n, nd = n:

        lb = (p + (z*z)/(2.0*nd) - z*sqrt((p*(1.0-p) + (z*z)/(4.0*nd))/nd))
             / (1.0 + (z*z)/nd)

    every op a single IEEE-correctly-rounded step (np.sqrt == libm sqrt),
    mirrored op-for-op by the SQL oracle. Only (group, n, k) cells shuffle.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        x = batch[cond_col].cast(pa.int64())
        xn = x.to_numpy(zero_copy_only=False)
        if batch[cond_col].null_count or ((xn != 0) & (xn != 1)).any():
            raise ValueError(f"wilson_lower_bound_by_group: {cond_col!r} must be 0/1 non-null")
        cells = pa.table(
            {
                "g": batch[group].combine_chunks()
                if isinstance(batch[group], pa.ChunkedArray)
                else batch[group],
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "k": x,
            }
        )
        out = cells.group_by("g").aggregate([("n", "sum"), ("k", "sum")])
        return out.rename_columns(["g", "n", "k"])

    stats = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("k", alias_name="k"),
    )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    zf = np.float64(z)
    one, two, four = np.float64(1.0), np.float64(2.0), np.float64(4.0)
    rows = []
    for g, n, k in stats.itertuples(index=False):
        n, k = int(n), int(k)
        nd = np.float64(n)
        p = np.float64(k) / nd
        # mirrored op-for-op by the SQL oracle — keep both sides in sync
        lb = (
            p + (zf * zf) / (two * nd) - zf * np.sqrt((p * (one - p) + (zf * zf) / (four * nd)) / nd)
        ) / (one + (zf * zf) / nd)
        rows.append((g, n, k, float(lb)))
    return pd.DataFrame(rows, columns=[group, "n", "k", "wilson_lb"])


def cvar_by_group(ds, group: str, col: str, q: float = 0.95, value_scale: int = 100):
    """Conditional value-at-risk per group: the discrete q-quantile of the
    column (in exact integer units) and the mean of everything AT OR ABOVE
    it — the tail-severity readout ("when this group's cost is bad, how bad
    on average?"). Same (group, units, count) cell plan as
    robust_stats_by_group: only the distinct-unit distribution shuffles,
    never rows; hot groups cost their distinct-unit count.

    Parity contract: ``var_u`` follows quantile_disc_from_counts's pinned
    DuckDB rank rule (``ceil(float64(q)*n)`` — keep q a short decimal);
    ``tail_sum``/``tail_n`` are exact int64 (products guarded < 2^62);
    ``cvar`` is CAST(tail_sum AS DOUBLE)/CAST(tail_n AS DOUBLE)/scale,
    mirrored op-for-op by the SQL oracle. Returns a Dataset of
    ``(group, n, var_u, tail_n, tail_sum, cvar)``.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        v = batch[col].to_numpy(zero_copy_only=False)
        if batch[col].null_count or np.isnan(v).any():
            raise ValueError(f"{col!r} must be non-null for cvar")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"g": batch[group].combine_chunks(), "u": pa.array(u, pa.int64())})
        g = t.group_by(["g", "u"]).aggregate([([], "count_all")])
        return g.rename_columns(["g", "u", "c"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "u"],
        Sum("c", alias_name="c"),
    )
    )

    scale_d = np.float64(value_scale)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        u = df["u"].to_numpy(dtype=np.int64)
        c = df["c"].to_numpy(dtype=np.int64)
        (var_u,) = quantile_disc_from_counts(u, c, [q])
        mask = u >= var_u
        tail_n = int(c[mask].sum())
        tail_sum = 0
        for uu, cc in zip(u[mask].tolist(), c[mask].tolist()):
            tail_sum += uu * cc
        if abs(tail_sum) >= 1 << 62:
            raise ValueError("cvar_by_group: tail_sum exceeds the exact-int guard")
        # mirrored op-for-op by the SQL oracle (left-assoc double divisions)
        cvar = float(np.float64(tail_sum) / np.float64(tail_n) / scale_d)
        return pd.DataFrame(
            {
                group: [df["g"].iloc[0]],
                "n": [np.int64(c.sum())],
                "var_u": [np.int64(var_u)],
                "tail_n": [np.int64(tail_n)],
                "tail_sum": [np.int64(tail_sum)],
                "cvar": [cvar],
            }
        )

    return dist.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())


def multi_agg_scan(ds, specs: list[dict]):
    """N filtered aggregates from ONE pass over the table — the generalized
    shared scan (the 100-TB rule: co-running queries that share a table
    must share its read). Each spec is::

        {"name": str,                  # query tag (unique)
         "where": str | None,          # ops.expr predicate (SQL-WHERE nulls)
         "keys": [str, ...],           # group columns (ints/strings only)
         "aggs": {out: ("count",) | (expr_src, scale | None)            # sum
                       | (expr_src, scale | None, "sum"|"min"|"max"), ...}}

    An agg is a row count, or a SUM / MIN / MAX of ``floor(expr * scale +
    0.5)`` int64 units (``scale`` None means the expression must already
    evaluate to integers) — the repo's quantize-then-sum rule, so every
    output value is an exact int64 and the SQL oracle can run the
    IDENTICAL expression text (the ops/expr contract). Returns a long-form
    driver DataFrame ``(query, grp, agg, value)`` where ``grp`` joins the
    stringified key values with '|' ('(all)' for keyless specs — mirror
    with concat_ws). A keyless sum/count over an empty selection emits its
    0 row (SQL keyless aggregates return one row — COALESCE the oracle);
    a keyless MIN/MAX over an empty selection emits NO row (SQL would
    yield NULL — add ``HAVING count(*) > 0`` to the oracle branch, or
    pair with a count agg).

    Scale shape: one read; each batch evaluates every spec's mask + units
    and emits |groups x aggs| partial cells; ONE tiny groupby folds them.
    Float group keys are rejected (NaN breaks equality on both sides).
    """
    import pandas as pd
    from ray.data.aggregate import Max, Min, Sum

    from .expr import compile_expr

    names = [s["name"] for s in specs]
    if len(set(names)) != len(names):
        raise ValueError("multi_agg_scan: spec names must be unique")
    compiled = []
    kind_of: dict[tuple[str, str], str] = {}
    for s in specs:
        where = compile_expr(s["where"]) if s.get("where") else None
        aggs = {}
        for out, a in s["aggs"].items():
            if a[0] == "count":
                aggs[out] = ("count", None, None)
            else:
                kind = a[2] if len(a) > 2 else "sum"
                if kind not in ("sum", "min", "max"):
                    raise ValueError(f"multi_agg_scan: unknown agg kind {kind!r}")
                aggs[out] = (kind, compile_expr(a[0]), a[1])
            kind_of[(s["name"], out)] = aggs[out][0]
        compiled.append((s["name"], where, list(s.get("keys", ())), aggs))

    def partial(batch: pa.Table) -> pa.Table:
        q_out, g_out, a_out, v_out = [], [], [], []
        for name, where, keys, aggs in compiled:
            if where is not None:
                mask = where.evaluate(batch)
                sub = batch.filter(pc.fill_null(mask, False))
            else:
                sub = batch
            if len(keys):
                parts = []
                for k in keys:
                    col = sub[k]
                    if pa.types.is_floating(col.type):
                        raise ValueError(f"multi_agg_scan: float group key {k!r} rejected")
                    # dtype="U" auto-sizes to the longest value — an explicit
                    # U<n> cap would TRUNCATE long keys silently
                    parts.append(
                        np.asarray(col.cast(pa.string()).to_numpy(zero_copy_only=False), dtype="U")
                    )
                combo = parts[0]
                for p in parts[1:]:
                    combo = np.char.add(np.char.add(combo, "|"), p)
                uk, inv = np.unique(combo, return_inverse=True)
            else:
                uk = np.array(["(all)"])
                inv = np.zeros(sub.num_rows, np.int64)
            for out, (kind, e, scale) in aggs.items():
                if kind == "count":
                    units = np.ones(sub.num_rows, np.int64)
                else:
                    arr = e.evaluate(sub)
                    if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                        arr = pa.array([arr] * sub.num_rows)
                    v = arr.to_numpy(zero_copy_only=False)
                    if scale is None:
                        if v.dtype.kind not in "iu":
                            raise ValueError(
                                f"multi_agg_scan: agg {out!r} yields {v.dtype} — pass a "
                                "quantize scale or make the expression integer"
                            )
                        units = v.astype(np.int64)
                    else:
                        units = np.floor(v.astype(np.float64) * scale + 0.5).astype(np.int64)
                    if len(units) and np.abs(units).max() >= (np.int64(1) << 50):
                        raise ValueError(f"multi_agg_scan: {out!r} unit exceeds 2^50")
                if kind in ("min", "max"):
                    if len(units) == 0:
                        continue  # empty selection: min/max emits no row
                    if kind == "min":
                        acc = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
                        np.minimum.at(acc, inv, units)
                    else:
                        acc = np.full(len(uk), np.iinfo(np.int64).min, np.int64)
                        np.maximum.at(acc, inv, units)
                else:
                    acc = np.zeros(len(uk), np.int64)
                    np.add.at(acc, inv, units)
                q_out += [name] * len(uk)
                g_out += list(uk)
                a_out += [out] * len(uk)
                v_out += list(acc)
        v = np.array(v_out, np.int64)
        # each (query, grp, agg) key has exactly ONE kind — the other two
        # fold columns are never read for it, so all three carry the partial
        return pa.table(
            {
                "query": pa.array(q_out, pa.string()),
                "grp": pa.array(g_out, pa.string()),
                "agg": pa.array(a_out, pa.string()),
                "v_s": pa.array(v),
                "v_m": pa.array(v),
                "v_x": pa.array(v),
            }
        )

    folded = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["query", "grp", "agg"],
        Sum("v_s", alias_name="value_sum"),
            Min("v_m", alias_name="value_min"),
            Max("v_x", alias_name="value_max"),
    )
        .to_pandas()
    )
    if len(folded) == 0:
        return pd.DataFrame(
            {
                "query": pd.Series([], dtype=object),
                "grp": pd.Series([], dtype=object),
                "agg": pd.Series([], dtype=object),
                "value": pd.Series([], dtype=np.int64),
            }
        )
    picked = [
        int(r["value_min"]) if kind_of[(r["query"], r["agg"])] == "min"
        else int(r["value_max"]) if kind_of[(r["query"], r["agg"])] == "max"
        else int(r["value_sum"])
        for _, r in folded.iterrows()
    ]
    folded = folded.assign(value=pd.Series(picked, dtype=np.int64))[
        ["query", "grp", "agg", "value"]
    ]
    if np.abs(folded["value"].to_numpy(np.int64)).max() >= (np.int64(1) << 53):
        raise ValueError("multi_agg_scan: folded value exceeds exact-double range")
    return folded.sort_values(["query", "grp", "agg"], kind="mergesort").reset_index(drop=True)
