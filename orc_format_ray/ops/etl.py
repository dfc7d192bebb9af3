"""Ingest-side ETL ops: semi-structured column extraction and snapshot diff.

* ``parse_json_column`` — promote a JSON-string column (event properties,
  API payloads) to typed top-level columns. Each batch feeds its rows as one
  NDJSON buffer to ``pyarrow.json.read_json`` — Arrow's C++ parser, not a
  Python loop — with an optional explicit schema so every block lands on
  the same types (schema inference per block can disagree at scale).
* ``table_diff`` — classify every key across two snapshots of a table as
  added / removed / changed / unchanged, the incremental-ingest audit.
  Only (key, 8-byte row hash, side) metadata shuffles — payload columns
  never move — and the classification is a vectorized decode of ONE
  groupby's count/sum aggregates (no per-key Python, no join of full rows).
  Duplicate keys on either side fail loudly (a diff over non-unique keys is
  meaningless).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import content_hash

from .fastagg import fast_groupby


def parse_json_column(ds, col: str, *, schema: pa.Schema | None = None, prefix: str = ""):
    """Parse the JSON objects in ``ds[col]`` and append each top-level field
    as a typed column (named ``prefix + field``). Null/blank cells parse as
    ``{}`` (all fields null). Pass ``schema`` (a pyarrow schema of the
    expected fields) for type stability across blocks; without it each
    block infers independently. Collides loudly with existing column names;
    a cell holding anything but one JSON object fails loudly."""

    def fn(batch: pa.Table) -> pa.Table:
        import io

        import pyarrow.json as pj

        s = batch[col].combine_chunks().cast(pa.string())
        vals = s.to_pylist()
        lines = [(v if v is not None and v.strip() else "{}") for v in vals]
        data = ("\n".join(lines)).encode()
        po = pj.ParseOptions(explicit_schema=schema) if schema is not None else pj.ParseOptions()
        parsed = pj.read_json(io.BytesIO(data), parse_options=po)
        if parsed.num_rows != len(vals):
            raise ValueError(
                f"JSON column {col!r}: parsed {parsed.num_rows} objects from {len(vals)} rows "
                "(a cell must hold exactly one JSON object)"
            )
        for name in parsed.column_names:
            out = prefix + name
            if out in batch.column_names:
                raise ValueError(f"parsed field {out!r} collides with an existing column")
            batch = batch.append_column(out, parsed[name])
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def _row_hash(batch: pa.Table, cols: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash of the row's compare columns. Every column
    is framed as ``<N|V><byte-length>:<value>`` before joining, so neither
    a separator byte INSIDE a value nor a value equal to a null marker can
    alias a column boundary — the frame is a prefix code. Both diff sides
    run this exact code, so equality is representation-stable."""
    framed = []
    for c in cols:
        p = pc.cast(batch[c], pa.string())
        flag = pc.if_else(pc.is_null(p), pa.scalar("N"), pa.scalar("V"))
        val = pc.fill_null(p, "")
        ln = pc.cast(pc.binary_length(val), pa.string())
        framed.append(pc.binary_join_element_wise(flag, ln, ":", val, ""))
    if len(framed) == 1:
        joined = framed[0]
    else:
        joined = pc.binary_join_element_wise(*framed, "")
    if isinstance(joined, pa.ChunkedArray):
        joined = joined.combine_chunks()
    return content_hash(joined).view(np.int64)


def table_diff(ds_a, ds_b, key: str, cols: list[str]):
    """Diff two snapshots by unique ``key`` over compare columns ``cols``.
    Returns a Dataset of (key, status) with status in
    {'added', 'removed', 'changed', 'unchanged'} — 'added' = only in
    ``ds_b``, 'removed' = only in ``ds_a``. See module docstring for the
    shuffle contract."""
    if not cols:
        raise ValueError("table_diff needs at least one compare column")
    from ray.data.aggregate import Count, Sum

    def meta(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            h = _row_hash(batch, cols)
            k = batch[key].combine_chunks()
            return pa.table(
                {
                    key: k,
                    "__td_cnt_a__": pa.array(np.full(len(h), 1 - side, dtype=np.int64)),
                    "__td_cnt_b__": pa.array(np.full(len(h), side, dtype=np.int64)),
                    "__td_ha__": pa.array(h * (1 - side)),
                    "__td_hb__": pa.array(h * side),
                }
            )

        return fn

    ma = ds_a.map_batches(meta(0), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    mb = ds_b.map_batches(meta(1), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    agg = fast_groupby(
        ma.union(mb),
        key,
        Sum("__td_cnt_a__", alias_name="na"),
        Sum("__td_cnt_b__", alias_name="nb"),
        Sum("__td_ha__", alias_name="ha"),
        Sum("__td_hb__", alias_name="hb"),
    )

    def classify(batch: pa.Table) -> pa.Table:
        na = batch["na"].to_numpy(zero_copy_only=False)
        nb = batch["nb"].to_numpy(zero_copy_only=False)
        if (na > 1).any() or (nb > 1).any():
            bad = batch[key].to_numpy(zero_copy_only=False)[(na > 1) | (nb > 1)][:5]
            raise ValueError(f"table_diff requires unique keys per side; duplicates e.g. {bad.tolist()}")
        ha = batch["ha"].to_numpy(zero_copy_only=False)
        hb = batch["hb"].to_numpy(zero_copy_only=False)
        status = np.where(
            na == 0, "added", np.where(nb == 0, "removed", np.where(ha != hb, "changed", "unchanged"))
        )
        return pa.table({key: batch[key], "status": pa.array(status.tolist(), pa.string())})

    return agg.map_batches(classify, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def apply_changes(base_ds, changes_ds, key: str, op_col: str = "op",
                  seq_col: str | None = None, max_broadcast_keys: int = 1 << 26):
    """CDC merge: apply a change table onto a base snapshot — the
    incremental-ingest upsert. ``changes_ds`` carries the base's columns
    plus ``op_col`` in {'U', 'D'} ('U' = insert-or-replace by ``key``,
    'D' = delete) and optionally ``seq_col`` (a change sequence number;
    the LATEST change per key wins). Without ``seq_col``, more than one
    change per key fails loudly. Returns a Dataset with the base schema.

    Scale shape: the BASE — the 100-TB side — never shuffles. Changes
    (the small side) dedupe to latest in one groupby of tiny groups, the
    changed-key set broadcasts once via ``ray.put`` (guarded by
    ``max_broadcast_keys``), and base rows stream through a vectorized
    ``pc.is_in`` anti-filter; surviving upserts append as a second task
    branch. Beyond the guard, route keys through the sharded survivor
    filter of ops/dedup.py instead of raising it."""
    import pandas as pd
    import ray

    base_cols = base_ds.schema().names
    for c in (op_col,) + ((seq_col,) if seq_col else ()):
        if c in base_cols:
            raise ValueError(f"{c!r} collides with a base column")

    def latest(g: pd.DataFrame) -> pd.DataFrame:
        bad = set(g[op_col]) - {"U", "D"}
        if bad:
            raise ValueError(f"unknown {op_col!r} values {sorted(bad)} (want 'U'/'D')")
        if seq_col is None:
            if len(g) > 1:
                raise ValueError(
                    f"{len(g)} changes for key {g[key].iloc[0]!r}; pass seq_col to order them"
                )
            return g
        s = g[seq_col].to_numpy()
        if len(np.unique(s)) != len(s):
            raise ValueError(f"duplicate {seq_col!r} for key {g[key].iloc[0]!r} — latest is ambiguous")
        return g.iloc[[int(np.argmax(s))]]

    picked = changes_ds.groupby(key).map_groups(latest, batch_format="pandas", **remote_args()).materialize()

    n_changed = picked.count()
    if n_changed > max_broadcast_keys:
        raise ValueError(
            f"{n_changed} changed keys exceed max_broadcast_keys={max_broadcast_keys}; "
            "shard the key set (see ops/dedup.py _ShardedSurvivorFilter) instead of broadcasting"
        )
    if n_changed == 0:
        return base_ds
    key_tbl = pa.concat_tables(list(picked.select_columns([key]).iter_batches(batch_format="pyarrow")))
    keys_ref = ray.put(pa.concat_arrays(key_tbl.column(key).chunks))

    def drop_changed(batch: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        return batch.filter(pc.invert(pc.is_in(batch[key], value_set=ks)))

    kept = base_ds.map_batches(drop_changed, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def upserts(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch[op_col], "U")
        return batch.filter(m).select(base_cols)

    ups = picked.map_batches(upserts, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return kept.union(ups)


def regex_extract(ds, col: str, pattern: str):
    """Extract structured fields from a string column with a compiled
    regular expression: one new column per NAMED group in ``pattern``
    (``(?P<name>...)``), null where the pattern does not match — the
    log-parsing / scrape-cleanup step of an ingest pipeline. Vectorized
    ``pc.extract_regex`` (RE2) per batch, the SAME regex engine DuckDB's
    ``regexp_extract`` uses, so oracles match pattern-for-pattern.
    Collides loudly with existing column names."""
    import re as _re

    if not _re.findall(r"\(\?P<", pattern):
        raise ValueError("pattern needs at least one named group (?P<name>...)")

    def fn(batch: pa.Table) -> pa.Table:
        st = pc.extract_regex(batch[col], pattern)
        if isinstance(st, pa.ChunkedArray):
            st = st.combine_chunks()
        for field in st.type:
            if field.name in batch.column_names:
                raise ValueError(f"extracted group {field.name!r} collides with an existing column")
            batch = batch.append_column(field.name, pc.struct_field(st, field.name))
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def latest_by_key(ds, key: str, order_col: str):
    """Log compaction: keep each key's row with the greatest ``order_col``
    (SQL ``DISTINCT ON (key) ... ORDER BY order_col DESC``) — collapse an
    append-only change log to its current snapshot, the read-side
    complement of ``apply_changes``. Ties on (key, order_col) fail loudly
    (which row survives would be layout-dependent).

    Scale shape: each block first reduces LOCALLY to one row per key (an
    Arrow sort + head-of-run take, vectorized), so the global groupby
    shuffles at most |keys-per-block| rows per block, never the log; each
    group then holds at most |blocks touching that key| rows."""
    import pandas as pd

    def local_latest(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        idx = pc.sort_indices(batch, sort_keys=[(key, "ascending"), (order_col, "descending")])
        s = batch.take(idx)
        k = s[key].to_numpy(zero_copy_only=False)
        o = s[order_col].to_numpy(zero_copy_only=False)
        first = np.concatenate(([True], k[1:] != k[:-1]))
        # an in-block tie on (key, max order) would be silently collapsed
        # here, invisible to the global check — catch it before reducing
        tie = first[:-1] & (k[1:] == k[:-1]) & (o[1:] == o[:-1])
        if tie.any():
            bad = k[:-1][tie][:5]
            raise ValueError(f"latest_by_key: duplicate ({key}, {order_col}) for keys e.g. {bad.tolist()}")
        return s.filter(pa.array(first))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        o = g[order_col].to_numpy()
        top = np.max(o)
        if (o == top).sum() > 1:
            raise ValueError(
                f"latest_by_key: duplicate ({key}, {order_col}) = ({g[key].iloc[0]!r}, {top!r}) — "
                "the surviving row would be arbitrary"
            )
        return g.iloc[[int(np.argmax(o))]]

    local = ds.map_batches(local_latest, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return local.groupby(key).map_groups(pick, batch_format="pandas", **remote_args())


def explode_list(ds, col: str, id_cols: list[str], pos_col: str = "pos", val_col: str = "val"):
    """UNNEST WITH ORDINALITY: one output row per list element, carrying
    the parent's ``id_cols``, the element's 0-based position, and the
    element value (type preserved — floats pass through bit-unchanged).
    Null/empty lists contribute no rows. Pure Arrow-buffer arithmetic per
    batch: ``flatten`` for the values, offset diffs + ``np.repeat``/
    ``arange`` for parents and positions — no per-row Python. A stateless
    streaming stage: no shuffle, composes anywhere.
    """

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch[col].combine_chunks()
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if not pa.types.is_list(arr.type) and not pa.types.is_large_list(arr.type):
            raise TypeError(f"{col!r} must be a list column, got {arr.type}")
        # per-row lengths (null lists count 0): list_value_length is null for
        # null rows — fill to 0
        lens = pc.fill_null(pc.list_value_length(arr), 0).to_numpy(zero_copy_only=False).astype(np.int64)
        parent = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        pos = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        values = pc.list_flatten(arr)  # drops null/empty parents' slots
        out = {}
        take = pa.array(parent, pa.int64())
        for c in id_cols:
            out[c] = batch[c].combine_chunks().take(take)
        out[pos_col] = pa.array(pos, pa.int64())
        out[val_col] = values
        return pa.table(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def collapse_rare(ds, col: str, min_count: int, other, out: str | None = None,
                  max_keep: int = 1 << 24):
    """Rare-category collapsing: values of ``col`` seen fewer than
    ``min_count`` times become ``other`` — the long-tail feature-eng step
    (one-hot/embedding tables can't carry ten million singleton domains).
    ONE metadata (value, count) groupby finds the KEEP set (the frequent
    values — small by construction, guarded at ``max_keep``); it
    broadcasts once and the rewrite pass is stateless and vectorized.
    Appends ``out`` (default ``{col}_collapsed``). ``other`` must match
    the column type (e.g. -1 for ints, '(other)' for strings)."""
    import ray
    from ray.data.aggregate import Sum

    out = out or f"{col}_collapsed"

    def cells(batch: pa.Table) -> pa.Table:
        c = batch[col].combine_chunks()
        if c.null_count:
            raise ValueError(f"collapse_rare: {col!r} contains nulls")
        t = pa.table({"v": c})
        return t.group_by("v").aggregate([([], "count_all")]).rename_columns(["v", "c"])

    counts = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "v",
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    keep = counts.loc[counts["c"] >= min_count, "v"]
    if len(keep) > max_keep:
        raise ValueError(
            f"collapse_rare: {len(keep)} frequent values (> {max_keep}) — "
            "raise min_count; a keep set this large defeats the collapse"
        )
    keep_np = keep.to_numpy()
    keep_np = np.sort(keep_np.astype(np.int64)) if keep_np.dtype.kind in "iu" else np.sort(keep_np.astype(str))
    ref = ray.put(keep_np)

    def rewrite(batch: pa.Table) -> pa.Table:
        ks = ray.get(ref)
        c = batch[col].combine_chunks()
        v = c.to_numpy(zero_copy_only=False)
        v = v.astype(np.int64) if ks.dtype.kind in "iu" else v.astype(str)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, v), len(ks) - 1)
            member = ks[pos] == v
        else:
            member = np.zeros(len(v), dtype=bool)
        if ks.dtype.kind in "iu":
            res = np.where(member, v, np.int64(other))
            arr = pa.array(res, pa.int64())
        else:
            res = np.where(member, v, str(other))
            arr = pa.array(res, pa.string())
        return batch.append_column(out, arr)

    return ds.map_batches(rewrite, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def melt(ds, id_cols: list[str], value_cols: list[str],
         var_name: str = "variable", value_name: str = "value"):
    """UNPIVOT / pandas-melt: widen-to-long reshaping — one output row per
    (input row x value column), ``(id_cols..., variable, value)``. The
    stateless inverse of ``pivot``; value columns cast to float64 (the one
    common arithmetic type — mirror the SQL UNION-ALL with DOUBLE casts).

    Pure per-batch transform: no shuffle, no state; at 100 TB this is a
    streaming map with output = |value_cols| x input rows."""
    if not value_cols:
        raise ValueError("melt: need at least one value column")

    def fn(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        parts = []
        for vc in value_cols:
            cols = {c: batch[c] for c in id_cols}
            cols[var_name] = pa.array([vc] * n, pa.string())
            cols[value_name] = batch[vc].cast(pa.float64())
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def period_over_period(ds, key: str = "event_type", ts_col: str = "ts",
                       value_col: str = "value", period_us: int = 86_400_000_000,
                       value_scale: int = 100):
    """Period-over-period deltas: per (key, period) exact-int value-unit
    totals plus the previous period's total and the delta — the WoW/DoD
    dashboard primitive. Periods with no rows contribute nothing and the
    lag looks at the PREVIOUS EXISTING period (SQL lag over the aggregated
    frame — mirror exactly; a calendar-dense variant is resample_ffill's
    job). Returns ``(key, period, units, prev_units, delta_units)`` with
    -1001 sentinel never used — prev of the first period is 0 by the SQL
    ``coalesce(lag(units) OVER w, 0)`` convention.

    Scale shape: per-batch (key, period) partial sums, ONE cell groupby,
    then a per-key ordered fold in ``map_groups`` over the (key, period)
    cells — bounded by the calendar, not the row count."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    if period_us < 1:
        raise ValueError(f"period_us must be >= 1, got {period_us}")

    def partial(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"period_over_period: {value_col!r} must be non-null")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        per = np.floor_divide(us, np.int64(period_us))
        t = pa.table({"k": batch[key], "period": pa.array(per, pa.int64()),
                      "u": pa.array(units, pa.int64())})
        return t.group_by(["k", "period"]).aggregate([("u", "sum")]).rename_columns(
            ["k", "period", "u"])

    cells = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["k", "period"],
        Sum("u", alias_name="units"),
    )
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("period")
        u = g["units"].to_numpy(np.int64)
        prev = np.concatenate(([0], u[:-1]))
        return pd.DataFrame({key: g["k"].to_numpy(),
                             "period": g["period"].to_numpy(np.int64),
                             "units": u, "prev_units": prev,
                             "delta_units": u - prev})

    out = cells.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())
    return out.map_batches(
        lambda t: pa.table({key: t[key], "period": t["period"].cast(pa.int64()),
                            "units": t["units"].cast(pa.int64()),
                            "prev_units": t["prev_units"].cast(pa.int64()),
                            "delta_units": t["delta_units"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )


def global_dict_encode(ds, column: str, max_broadcast_values: int = 1 << 24):
    """GLOBAL dictionary encoding of a string column: every distinct value
    gets one corpus-wide id (0-based rank in lexicographic order — SQL's
    ``dense_rank() OVER (ORDER BY value) - 1``), and the column is replaced
    by ``<column>_id`` int32. Unlike the per-stripe dictionaries the codec
    layer builds, a global dictionary survives joins/shuffles and shrinks
    downstream exchanges to 4 B/value.

    Plan: per-batch distinct cells -> ONE metadata groupby -> the sorted
    value array broadcasts once (`ray.put`, guarded by
    ``max_broadcast_values``) -> stateless vectorized ``searchsorted``
    encode. Returns ``(encoded_ds, mapping)`` where mapping is a pandas
    DataFrame ``(value, id)``. Null values are rejected (a null id would
    need a sentinel convention — filter or fill upstream)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    def cells(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if col.null_count:
            raise ValueError(f"global_dict_encode: {column!r} must be non-null")
        return pa.table({"v": col.cast(pa.string()).combine_chunks().unique()})

    vals = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "v",
        Count(alias_name="_c"),
    )
        .select_columns(["v"])
        .to_pandas()
    )
    if len(vals) > max_broadcast_values:
        raise ValueError(
            f"{len(vals)} distinct values exceed max_broadcast_values={max_broadcast_values}; "
            "a dictionary that large should stay sharded (hash_join the mapping instead)"
        )
    sorted_vals = np.sort(vals["v"].to_numpy(dtype=object))
    vref = ray.put(sorted_vals)
    id_name = f"{column}_id"

    def encode(batch: pa.Table) -> pa.Table:
        sv = ray.get(vref)
        v = batch[column].cast(pa.string()).to_numpy(zero_copy_only=False)
        ids = np.searchsorted(sv, v)
        # a value unseen at build time means the two passes saw different data
        if len(ids):
            ids_c = np.minimum(ids, len(sv) - 1)
            if (sv[ids_c] != v).any():
                raise ValueError("global_dict_encode: value absent from the dictionary")
        out = {c: batch[c] for c in batch.schema.names if c != column}
        out[id_name] = pa.array(ids.astype(np.int32), pa.int32())
        return pa.table(out)

    mapping = pd.DataFrame({"value": sorted_vals,
                            "id": np.arange(len(sorted_vals), dtype=np.int64)})
    enc = ds.map_batches(encode, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return enc, mapping


def dow_profile(ds, key: str, ts_col: str = "ts"):
    """Day-of-week seasonality profile per key: ``(key, isodow, n, frac)``
    with isodow 1=Monday..7=Sunday (SQL isodow; Arrow day_of_week + 1) and
    ``frac`` the day's share of the key's rows — ONE exact-int division per
    row (bitwise reproducible). Per-batch (key, isodow) count partials
    shrink every block to <= |keys|*7 cells before the one metadata
    groupby; the per-key totals fold inside the same small result."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def cells(batch: pa.Table) -> pa.Table:
        dow = pc.add(pc.day_of_week(batch[ts_col]), 1).cast(pa.int64())
        t = pa.table({"k": batch[key], "isodow": dow})
        g = t.group_by(["k", "isodow"]).aggregate([([], "count_all")])
        return g.rename_columns(["k", "isodow", "n"])

    merged = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["k", "isodow"],
        Sum("n", alias_name="n"),
    )
    )

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        tot = int(df["n"].sum())
        out = df.sort_values("isodow").reset_index(drop=True)
        out["n"] = out["n"].astype("int64")
        out["frac"] = out["n"].to_numpy(np.int64).astype(np.float64) / np.float64(tot)
        return out.rename(columns={"k": key})

    return merged.groupby("k").map_groups(finish, **remote_args())


def with_global_row_ids(ds, order_col: str, out: str = "rid"):
    """Attach a dense global row id 0..n-1 in ``order_col`` order — exactly
    SQL ``row_number() OVER (ORDER BY order_col) - 1``. The primitive
    under sequence packing / budget selection, exposed standalone: shard
    numbering, stable pagination, reproducible epoch ordering.

    Plan (the select_by_budget pinned-block contract): ONE range-
    partitioning sort pins value-keyed blocks; pass A reads only block
    (min, max, count) metadata; the driver orders blocks by min value,
    PROVES them strictly disjoint (max_i < min_{i+1} — overlapping or
    duplicate-spanning blocks raise), and broadcasts {min -> start
    offset}; pass B attaches ``start + arange`` per block. Rows never
    shuffle twice; ``order_col`` values must be globally unique (loud —
    SQL row_number under ties matches no particular engine).

    Both passes MUST run over the same materialized Dataset (stale
    offsets otherwise — the select_by_budget rule). Returns the sorted
    Dataset plus the ``out`` int64 column.
    """
    import numpy as np
    import ray

    from .._rayutil import remote_args

    pinned = ds.sort(order_col).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        v = batch[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(v) > 1 and (np.diff(v) == 0).any():
            raise ValueError(f"with_global_row_ids: duplicate {order_col!r} values")
        return pa.table(
            {
                "lo": pa.array([int(v[0])] if len(v) else [], pa.int64()),
                "hi": pa.array([int(v[-1])] if len(v) else [], pa.int64()),
                "n": pa.array([len(v)] if len(v) else [], pa.int64()),
            }
        )

    meta = (
        pinned.map_batches(
            block_meta, batch_size=None, batch_format="pyarrow",
            zero_copy_batch=True, **remote_args()
        )
        .to_pandas()
        .sort_values("lo")
        .reset_index(drop=True)
    )
    los = meta["lo"].to_numpy(dtype=np.int64)
    his = meta["hi"].to_numpy(dtype=np.int64)
    ns = meta["n"].to_numpy(dtype=np.int64)
    if (his[:-1] >= los[1:]).any():
        raise ValueError(
            f"with_global_row_ids: blocks overlap on {order_col!r} — duplicate "
            "values span a block boundary"
        )
    starts = np.zeros(len(ns), dtype=np.int64)
    np.cumsum(ns[:-1], out=starts[1:])
    table_ref = ray.put({int(lo): (int(st), int(n)) for lo, st, n in zip(los, starts, ns)})

    def attach(batch: pa.Table) -> pa.Table:
        import numpy as _np

        import ray as _ray

        if batch.num_rows == 0:
            return batch.append_column(out, pa.array([], pa.int64()))
        v = batch[order_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        start, n = _ray.get(table_ref)[int(v[0])]
        if n != batch.num_rows:
            raise ValueError("with_global_row_ids: block layout changed between passes")
        return batch.append_column(
            out, pa.array(start + _np.arange(batch.num_rows, dtype=_np.int64), pa.int64())
        )

    return pinned.map_batches(
        attach, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
