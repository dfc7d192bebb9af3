"""Stream-shaped windowed aggregation over an ordered event log.

Ray Data has no event-time windows/watermarks; the batch-native equivalent
treats the events table as a partitioned log: a vectorized stage assigns each
event its tumbling window id, then a grouped aggregate folds per
(key, window). Pre-aggregation happens inside each batch first (one partial
row per key-window per batch), so the shuffle input is near |distinct
windows|, not |events|. Ordering assumption: none needed for tumbling
aggregates (they are commutative folds); session/sliding variants would sort
within groups (documented in the module the day they're needed).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

from .fastagg import fast_groupby


def assign_tumbling_window(batch: pa.Table, ts_col: str = "ts", window_sec: int = 3600, out: str = "window_start_ms") -> pa.Table:
    """Add the window start (epoch millis) for each event, vectorized.

    Division semantics: pc.divide truncates toward zero — deliberately, to
    match the DuckDB oracle, whose `epoch_ms` and `//` BOTH truncate toward
    zero (measured: epoch_ms('1969-12-31 23:59:59.9985') == -1, -3601//3600
    == -1). Pre-epoch events therefore land in the same window on both sides
    (pinned by test_window_agg_pre_epoch_matches_duckdb).
    """
    ms = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
    ms = pc.divide(ms, pa.scalar(1000, pa.int64()))
    w = pa.scalar(window_sec * 1000, pa.int64())
    start = pc.multiply(pc.divide(ms, w), w)
    return batch.append_column(out, start)


def _round_sum_value(batch: pa.Table) -> pa.Table:
    """np.round(sum_value, 2) — NOT pc.round, which lands an ulp off the
    decimal-nearest double (49.019999... vs 49.02) and breaks oracle
    parity; np.round matches DuckDB's round()."""
    import numpy as np

    i = batch.schema.get_field_index("sum_value")
    rounded = np.round(batch["sum_value"].to_numpy(zero_copy_only=False), 2)
    return batch.set_column(i, "sum_value", pa.array(rounded, pa.float64()))


def tumbling_window_agg(ds, key: str = "event_type", ts_col: str = "ts", window_sec: int = 3600, value_col: str = "value"):
    """count + rounded sum(value) per (key, tumbling window)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        b = assign_tumbling_window(batch, ts_col, window_sec)
        t = pa.table({key: b[key], "window_start_ms": b["window_start_ms"], value_col: b[value_col]})
        g = t.group_by([key, "window_start_ms"]).aggregate([(value_col, "sum"), (value_col, "count")])
        return g.rename_columns([key, "window_start_ms", "sum_value", "cnt"])

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    out = fast_groupby(
        partials,
        [key, "window_start_ms"],
        Sum("sum_value", alias_name="sum_value"), Sum("cnt", alias_name="cnt"),
    )
    # round in a final map_batches (absorbs fp summation order) so the op
    # returns a composable Dataset, not a driver DataFrame
    return out.map_batches(_round_sum_value, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def sliding_window_agg(ds, key: str = "event_type", ts_col: str = "ts", window_sec: int = 7200, slide_sec: int = 3600, value_col: str = "value"):
    """count + rounded sum per (key, sliding window [w, w+window) at slide
    boundaries). Each event explodes into <= window/slide window rows INSIDE
    the batch (vectorized), partials pre-aggregate per batch, then one small
    groupby — shuffle input is near |keys x windows|, not |events| x k."""
    import numpy as np
    from ray.data.aggregate import Sum

    k_max = (window_sec + slide_sec - 1) // slide_sec
    p_ms = slide_sec * 1000
    w_ms = window_sec * 1000

    def partial(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        # trunc-toward-zero divisions to match DuckDB epoch_ms and //
        ms = np.sign(us) * (np.abs(us) // 1000)
        keys = batch[key].combine_chunks()
        base = np.sign(ms) * (np.abs(ms) // p_ms) * p_ms
        outs = []
        for k in range(k_max):
            w = base - k * p_ms
            m = (w <= ms) & (ms < w + w_ms)
            if not m.any():
                continue
            t = pa.table(
                {
                    key: keys.filter(pa.array(m)),
                    "window_start_ms": pa.array(w[m]),
                    value_col: batch[value_col].combine_chunks().filter(pa.array(m)),
                }
            )
            g = t.group_by([key, "window_start_ms"]).aggregate([(value_col, "sum"), (value_col, "count")])
            outs.append(g.rename_columns([key, "window_start_ms", "sum_value", "cnt"]))
        if not outs:
            return pa.table({key: pa.array([], pa.string()), "window_start_ms": pa.array([], pa.int64()), "sum_value": pa.array([], pa.float64()), "cnt": pa.array([], pa.int64())})
        return pa.concat_tables(outs)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    out = fast_groupby(
        partials,
        [key, "window_start_ms"],
        Sum("sum_value", alias_name="sum_value"), Sum("cnt", alias_name="cnt"),
    )
    return out.map_batches(_round_sum_value, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def session_window_agg(ds, key: str = "event_type", ts_col: str = "ts", gap_sec: int = 1800, value_col: str = "value"):
    """Session windows per key: events sorted by time; a gap > gap_sec starts
    a new session. Returns (key, session_start_ms, session_end_ms, n_events,
    sum_value).

    Partitioning assumption: one key's events fit a worker (sessionization is
    inherently per-key-sequential). For web-scale keys, pre-split by
    (key, day) first — sessions never span the split if gap < split size.
    """
    import numpy as np
    import pandas as pd

    gap_ms = gap_sec * 1000

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(g["_ms"].to_numpy())
        order = np.argsort(g["_ms"].to_numpy(), kind="stable")
        vals = g[value_col].to_numpy()[order]
        brk = np.concatenate(([True], np.diff(t) > gap_ms))
        sid = np.cumsum(brk) - 1
        n_sessions = int(sid[-1]) + 1 if len(sid) else 0
        starts = t[brk]
        ends = np.concatenate((t[np.flatnonzero(brk)[1:] - 1], [t[-1]])) if n_sessions else np.zeros(0, np.int64)
        cnt = np.bincount(sid, minlength=n_sessions)
        sv = np.bincount(sid, weights=vals, minlength=n_sessions)
        return pd.DataFrame(
            {
                key: g[key].iloc[0],
                "session_start_ms": starts,
                "session_end_ms": ends,
                "n_events": cnt.astype(np.int64),
                "sum_value": np.round(sv, 2),
            }
        )

    def prep(batch: pa.Table) -> pa.Table:
        ms = pc.divide(batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()), pa.scalar(1000, pa.int64()))
        return pa.table({key: batch[key], "_ms": ms, value_col: batch[value_col]})

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return prepped.groupby(key).map_groups(sessions, batch_format="pandas", **remote_args())


def funnel(ds, steps: list[str], user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type", within_us: int | None = None):
    """Ordered-step funnel depth per user: step i counts as reached when an
    event of type ``steps[i]`` occurs STRICTLY after the timestamp at which
    step i-1 was reached (step 0 = the user's first ``steps[0]`` event).
    ``within_us`` additionally requires each later step to land WITHIN that
    many microseconds of the previous step's reach time (the
    session-bounded funnel) — semantics stay GREEDY earliest-match per
    step (the SQL mirror's nested min(ts) chain reproduces exactly this,
    not a max-depth search over alternative paths).
    Returns a Dataset of (user_col, depth) covering every user seen.

    Only the (user, micros, type) metadata columns shuffle — one
    groupby(user).map_groups whose per-group scan is a vectorized
    masked-min per step, never a Python loop over events. Timestamps keep
    full microsecond precision so the strict-after comparison matches SQL
    exactly.
    """
    import numpy as np
    import pandas as pd

    if not steps:
        raise ValueError("funnel needs at least one step")
    if within_us is not None and within_us <= 0:
        raise ValueError(f"within_us must be positive, got {within_us}")

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({user_col: batch[user_col], "_ms": us, type_col: batch[type_col]})

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        t = g["_ms"].to_numpy()
        ty = g[type_col].to_numpy()
        depth = 0
        t_prev = -np.inf
        for i, s in enumerate(steps):
            m = (ty == s) & (t > t_prev)
            if within_us is not None and i > 0:
                m &= t <= t_prev + within_us
            if not m.any():
                break
            t_prev = t[m].min()
            depth += 1
        return pd.DataFrame({user_col: [g[user_col].iloc[0]], "depth": np.array([depth], dtype=np.int64)})

    prepped = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return prepped.groupby(user_col).map_groups(per_user, batch_format="pandas", **remote_args())


def cohort_retention(ds, user_col: str = "user_id", ts_col: str = "ts",
                     period_ms: int = 7 * 86_400_000, num_buckets: int = 64):
    """Cohort retention: users are cohorted by the period of their FIRST
    event (floor(epoch_ms / period_ms)); each (cohort, period-offset) cell
    counts the cohort's users active in that period. Returns a Dataset of
    (cohort_week, week_offset, n_users).

    Scale shape: per-batch (user, period) pairs dedupe locally, ONE groupby
    dedupes globally (|user x active periods| rows, never raw events), the
    per-user first period comes from a Min aggregate, and the two metadata
    tables meet in the bucketed ``hash_join`` — no driver-side user map,
    no broadcast of an unbounded user set.
    """
    import numpy as np

    from ray.data.aggregate import Count, Min

    from .join import hash_join

    if period_ms < 1:
        raise ValueError(f"period_ms must be >= 1, got {period_ms}")

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        wk = np.floor_divide(np.floor_divide(us, 1000), period_ms)
        t = pa.table({user_col: batch[user_col], "wk": pa.array(wk, pa.int64())})
        return t.group_by([user_col, "wk"]).aggregate([])  # local distinct

    act = (fast_groupby(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        [user_col, "wk"],
        Count(alias_name="_c"),
    )
        .select_columns([user_col, "wk"])
        .materialize()  # consumed twice (cohorts + join); don't re-shuffle
    )
    cohorts = fast_groupby(
        act,
        user_col,
        Min("wk", alias_name="cohort"),
    )
    joined = hash_join(act, cohorts, user_col, num_buckets=num_buckets)

    def finish(batch: pa.Table) -> pa.Table:
        wk = batch["wk"].to_numpy(zero_copy_only=False)
        co = batch["cohort"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "cohort_week": pa.array(co, pa.int64()),
                "week_offset": pa.array(wk - co, pa.int64()),
            }
        )

    return (fast_groupby(
        joined.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["cohort_week", "week_offset"],
        Count(alias_name="n_users"),
    )
    )


def analytic_over(ds, key: str = "user_id", order_col: str = "ts",
                  id_col: str = "event_id", value_col: str = "value",
                  value_scale: int = 100):
    """SQL analytic window functions over ``PARTITION BY key ORDER BY
    order_col``: row_number, lag(id_col), and a running sum of the value —
    the per-entity sequence features (visit index, previous event, running
    spend) of an event-log pipeline. Returns a Dataset of
    ``(key, ts_us, id_col, rn, prev_<id_col>, run_units)``.

    The running sum is EXACT-integer: each value quantizes to
    ``floor(value * value_scale + 0.5)`` units (int64) so the fold is
    associative and bit-equal to the SQL window
    ``sum(CAST(floor(value*scale + 0.5) AS BIGINT)) OVER w`` — never a
    float cumsum, whose grouping order would diverge from SQL's.

    Plan (metadata-only, the select_by_budget shape — full rows never
    shuffle; join the ids back if you need payloads):

    1. project ``(key, ord_us, id, units)``;
    2. range-partitioned ``sort([key, ord])`` + ``materialize`` to pin the
       sorted blocks;
    3. pass A: one row per (block, key present in block) with the block's
       lo tuple and the key's in-block (count, unit sum, last id). The
       driver orders blocks by lo, checks lexicographic disjointness
       (duplicate (key, ord) defense — a dup would silently shift every
       later row_number), and folds per-key exclusive bases;
    4. pass B over the SAME pinned blocks: vectorized segment cumsums +
       the broadcast per-key base (count, sum, prev id).

    ``(key, order_col)`` must be globally unique; ``value`` non-null.
    Driver-side state is one (block x distinct-keys-per-block) dict —
    bounded by the sort's block count, not the row count.
    """
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        ous = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64())
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for the running sum")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": ous,
                "i": batch[id_col].cast(pa.int64()),
                "v": pa.array(units, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("blo_k", "blo_o", "k", "cnt", "vsum", "last_i")})
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        c = np.concatenate(([0], np.cumsum(v)))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), batch["o"][0].as_py()), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "cnt": pa.array(ends - starts, pa.int64()),
                "vsum": pa.array(c[ends] - c[starts], pa.int64()),
                "last_i": pa.array(i[ends - 1], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, cnt, vsum, last_i in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), int(cnt), int(vsum), int(last_i))
        )
    order = sorted(blocks)
    # Lexicographic disjointness: each block's last (k, o) must precede the
    # next block's first. The last key's hi-ord isn't shipped, so check the
    # sufficient condition (last k, -inf) vs next lo after verifying keys
    # are non-decreasing across the boundary; equal boundary keys are fine
    # (a key may span blocks), but an equal (k, o) pair is not detectable
    # here — enforce key+ord uniqueness upstream.
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    acc: dict[int, tuple[int, int, int | None]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, int, int | None]]] = {}
    for lo in order:
        snap = {k: acc.get(k, (0, 0, None)) for k, _, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, cnt, vsum, last_i in blocks[lo]:
            pc_, pv, _ = acc.get(k, (0, 0, None))
            acc[k] = (pc_ + cnt, pv + vsum, last_i)
    bases_ref = ray.put(bases)

    prev_name = f"prev_{id_col}"

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "rn": pa.array([], pa.int64()),
                prev_name: pa.array([], pa.int64()),
                "run_units": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        lengths = np.diff(np.concatenate((starts, [n])))
        seg_of = np.repeat(np.arange(len(starts)), lengths)
        c = np.cumsum(v)
        seg_base_sum = np.concatenate(([0], c[starts[1:] - 1]))
        within_sum = c - seg_base_sum[seg_of]
        rn_local = np.arange(n, dtype=np.int64) - starts[seg_of] + 1
        kb_cnt = np.array([base[int(kk)][0] for kk in k[starts]], dtype=np.int64)
        kb_sum = np.array([base[int(kk)][1] for kk in k[starts]], dtype=np.int64)
        kb_prev = [base[int(kk)][2] for kk in k[starts]]
        rn = rn_local + kb_cnt[seg_of]
        run = within_sum + kb_sum[seg_of]
        prev = np.empty(n, dtype=np.int64)
        prev[1:] = i[:-1]
        # -1 sentinel instead of NULL: a nullable int64 round-trips through
        # pandas as float64+NaN on BOTH compare sides, which is hash-fragile;
        # SQL mirrors with coalesce(lag(id) OVER w, -1).
        for s_idx, s in enumerate(starts):
            p = kb_prev[s_idx]
            prev[s] = -1 if p is None else p
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "rn": pa.array(rn, pa.int64()),
                prev_name: pa.array(prev, pa.int64()),
                "run_units": pa.array(run, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def sessionize(ds, key: str = "user_id", order_col: str = "ts",
               id_col: str = "event_id", gap_us: int = 1_800_000_000):
    """Assign every event its per-key session id (gaps-and-islands): a new
    session starts at the key's first event and whenever the gap to the
    previous event exceeds ``gap_us`` microseconds. Returns a Dataset of
    ``(key, ts_us, id_col, session_id)`` with 1-based per-key session ids —
    the event-level complement of ``session_window_agg`` (which emits one
    row per session) and exactly SQL's
    ``SUM(CASE WHEN prev IS NULL OR ts - prev > gap THEN 1 ELSE 0 END)
    OVER (PARTITION BY key ORDER BY ts)``.

    Same metadata-only pinned-sorted-block plan as ``analytic_over``:
    pass A ships one row per (block, key) — first/last timestamps and the
    count of in-block session starts — the driver folds per-key exclusive
    bases (sessions so far, previous event's ts) in block order, pass B
    re-reads the SAME pinned blocks and cumsums the start indicators.
    ``(key, order_col)`` must be globally unique. All arithmetic is
    integer microseconds — hash-exact against the SQL oracle."""
    import ray

    if gap_us <= 0:
        raise ValueError(f"gap_us must be positive, got {gap_us}")

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
            }
        )

    import numpy as np

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "first_o", "last_o", "internal")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        # in-block session starts EXCLUDING each segment's first row
        gap = np.zeros(len(k), dtype=np.int64)
        gap[1:] = (o[1:] - o[:-1] > gap_us).astype(np.int64)
        gap[starts] = 0
        c = np.concatenate(([0], np.cumsum(gap)))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "first_o": pa.array(o[starts], pa.int64()),
                "last_o": pa.array(o[ends - 1], pa.int64()),
                "internal": pa.array(c[ends] - c[starts], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, first_o, last_o, internal in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), int(first_o), int(last_o), int(internal))
        )
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    # per-key fold: (sessions started so far, last ts) — snapshot BEFORE each block
    acc: dict[int, tuple[int, int]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, int] | None]] = {}
    for lo in order:
        snap = {k: acc.get(k) for k, _, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, first_o, last_o, internal in blocks[lo]:
            prev = acc.get(k)
            boundary = 1 if prev is None or (first_o - prev[1] > gap_us) else 0
            acc[k] = ((prev[0] if prev else 0) + boundary + internal, last_o)
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "session_id": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        lengths = np.diff(np.concatenate((starts, [n])))
        seg_of = np.repeat(np.arange(len(starts)), lengths)
        ind = np.zeros(n, dtype=np.int64)
        ind[1:] = (o[1:] - o[:-1] > gap_us).astype(np.int64)
        base_cnt = np.empty(len(starts), dtype=np.int64)
        for s_idx, s in enumerate(starts):
            prev = base[int(k[s])]
            if prev is None:
                ind[s] = 1
                base_cnt[s_idx] = 0
            else:
                ind[s] = 1 if (o[s] - prev[1] > gap_us) else 0
                base_cnt[s_idx] = prev[0]
        c = np.cumsum(ind)
        seg_base = np.concatenate(([0], c[starts[1:] - 1]))
        within = c - seg_base[seg_of]
        session = within + base_cnt[seg_of]
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "session_id": pa.array(session, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def rank_over(ds, key: str = "event_type", value_col: str = "value",
              value_scale: int = 100, max_broadcast_pairs: int = 1 << 24,
              include_dist: bool = False):
    """SQL ``rank()`` / ``dense_rank() OVER (PARTITION BY key ORDER BY
    units)`` with REAL tie semantics (equal units share a rank; rank skips,
    dense_rank doesn't). ``units = floor(value * value_scale + 0.5)`` —
    the exact-integer quantization shared with ``analytic_over``, so the
    fold is associative and hash-exact against the SQL window.

    Plan — rank-by-counting, never a per-row window:

    1. one metadata pass projects (key, units) and nothing else;
    2. ONE groupby merges per-batch Arrow-local (key, units, count) cells —
       the shuffle carries |distinct (key, units)| rows, not |rows|;
    3. per-key exclusive cumsum over its distinct units (rank = 1 + rows
       strictly below, dense_rank = unit index + 1) — hot keys cost their
       VALUE CARDINALITY, not their row count;
    4. the pair->rank table broadcasts once (ray.put, guarded by
       ``max_broadcast_pairs``) and a vectorized pandas merge attaches both
       ranks back to every row.

    Contract: designed for tie-heavy / bounded-cardinality order values
    (prices at fixed scale, scores, star ratings). A near-unique float
    column makes |pairs| ~ |rows| — quantize coarser or use
    ``analytic_over``'s row_number instead. Null values fail loudly.
    Returns a Dataset of ``(key, units, rnk, drnk)`` — one row per INPUT
    row (tied rows repeat).
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for ranking")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = pa.table({"k": batch[key], "u": pa.array(units, pa.int64())})
        cells = t.group_by(["k", "u"]).aggregate([([], "count_all")])
        return cells.rename_columns(["k", "u", "c"])

    cells = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pairs = fast_groupby(
        cells,
        ["k", "u"],
        Sum("c", alias_name="c"),
    )

    def per_key_ranks(df):
        df = df.sort_values("u", kind="mergesort").reset_index(drop=True)
        c = df["c"].to_numpy(dtype=np.int64)
        excl = np.concatenate(([0], np.cumsum(c)[:-1]))
        df["rnk"] = excl + 1
        df["drnk"] = np.arange(1, len(df) + 1, dtype=np.int64)
        if include_dist:
            # both are SINGLE float64 divisions of exact ints — the same
            # IEEE op SQL percent_rank()/cume_dist() performs, so the
            # doubles compare bitwise. percent_rank of a 1-row partition
            # is 0 by SQL definition (never 0/0).
            n = int(c.sum())
            df["pct_rank"] = (df["rnk"].to_numpy(np.int64) - 1) / (n - 1) if n > 1 else 0.0
            df["cume_dist"] = (excl + c) / n
        return df

    ranked = pairs.groupby("k").map_groups(per_key_ranks, batch_format="pandas", **remote_args()).materialize()
    n_pairs = ranked.count()
    if n_pairs > max_broadcast_pairs:
        raise ValueError(
            f"{n_pairs} distinct (key, units) pairs exceed max_broadcast_pairs="
            f"{max_broadcast_pairs}; quantize coarser or raise the guard"
        )
    keep = ["k", "u", "rnk", "drnk"] + (["pct_rank", "cume_dist"] if include_dist else [])
    rank_df = ranked.to_pandas()[keep]
    rank_ref = ray.put(rank_df)

    def attach(batch: pa.Table):
        import pandas as pd

        v = batch[value_col].to_numpy(zero_copy_only=False)
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        rows = pd.DataFrame({"k": batch[key].to_pandas(), "u": units})
        out = rows.merge(ray.get(rank_ref), on=["k", "u"], how="left", sort=False)
        if out["rnk"].isna().any():
            raise AssertionError("rank table is missing observed (key, units) pairs")
        res = {
            key: out["k"],
            "units": out["u"].astype("int64"),
            "rnk": out["rnk"].astype("int64"),
            "drnk": out["drnk"].astype("int64"),
        }
        if include_dist:
            res["pct_rank"] = out["pct_rank"].astype("float64")
            res["cume_dist"] = out["cume_dist"].astype("float64")
        return pd.DataFrame(res)

    return ds.map_batches(attach, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def moving_agg(ds, key: str = "user_id", order_col: str = "ts",
               value_col: str = "value", value_scale: int = 100, frame: int = 5,
               max_frame: int = 512):
    """Moving-frame aggregates per key: SQL ``sum/min/max/count(*) OVER
    (PARTITION BY key ORDER BY order_col ROWS BETWEEN frame-1 PRECEDING AND
    CURRENT ROW)`` over exact integer units (``floor(value*scale + 0.5)``).
    Returns a Dataset of ``(key, ts_us, w_cnt, w_sum, w_min, w_max)``.

    Same metadata-only pinned-sorted-block plan as ``analytic_over``:
    pass A ships per (block, key) the row count and the key's LAST
    ``frame-1`` units (everything any later window can reach back for —
    driver state is blocks x keys x frame ints, bounded by ``max_frame``);
    the driver folds per-key carry tails in block order; pass B re-reads
    the SAME pinned blocks, prepends each segment's carry, and computes the
    rolling sums with one cumsum and the rolling min/max with ONE pandas
    groupby-rolling call per block (Cython loop, no per-row Python).

    ``(key, order_col)`` must be globally unique (ties make the SQL frame
    nondeterministic); null values fail loudly.
    """
    import numpy as np
    import ray

    if not (1 <= frame <= max_frame):
        raise ValueError(f"frame must be in [1, {max_frame}], got {frame}")

    def to_meta(batch: pa.Table) -> pa.Table:
        ous = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64())
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for the moving frame")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        if np.abs(units).max(initial=0) >= 1 << 53:
            # rolling min/max go through pandas' float64 kernel; beyond
            # 2^53 that kernel silently loses integer exactness.
            raise ValueError("unit magnitudes >= 2^53 break float64-exact rolling min/max")
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": ous,
                "v": pa.array(units, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "blo_k": pa.array([], pa.int64()),
                    "blo_o": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "tail": pa.array([], pa.list_(pa.int64())),
                }
            )
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        tails = [v[max(int(s), int(e) - (frame - 1)): int(e)].tolist() for s, e in zip(starts, ends)]
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), batch["o"][0].as_py()), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "cnt": pa.array(ends - starts, pa.int64()),
                "tail": pa.array(tails, pa.list_(pa.int64())),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, cnt, tail in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(cnt), list(tail)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    # per-key fold: (rows so far, last frame-1 units) BEFORE each block
    acc: dict[int, tuple[int, list]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, list]]] = {}
    for lo in order:
        snap = {k: acc.get(k, (0, [])) for k, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, cnt, tail in blocks[lo]:
            pc_, pt = acc.get(k, (0, []))
            acc[k] = (pc_ + cnt, (pt + tail)[-(frame - 1):] if frame > 1 else [])
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "w_cnt": pa.array([], pa.int64()),
                "w_sum": pa.array([], pa.int64()),
                "w_min": pa.array([], pa.int64()),
                "w_max": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        # Build ONE extended array: [carry_0, seg_0, carry_1, seg_1, ...]
        ext_vals, ext_seg, real_mask, prior_cnt = [], [], [], []
        for s_idx, (s, e) in enumerate(zip(starts, ends)):
            pc_, pt = base[int(k[s])]
            ext_vals.append(np.asarray(pt, dtype=np.int64))
            ext_vals.append(v[s:e])
            m = len(pt)
            ext_seg.append(np.full(m + (e - s), s_idx, dtype=np.int64))
            real_mask.append(np.concatenate((np.zeros(m, bool), np.ones(e - s, bool))))
            prior_cnt.append(np.full(e - s, pc_, dtype=np.int64))
        ext = np.concatenate(ext_vals)
        seg = np.concatenate(ext_seg)
        real = np.concatenate(real_mask)
        g = pd.DataFrame({"g": seg, "x": ext}).groupby("g", sort=False)["x"]
        roll = g.rolling(frame, min_periods=1)
        w_min = roll.min().to_numpy()[real].astype(np.int64)
        w_max = roll.max().to_numpy()[real].astype(np.int64)
        # exact-integer rolling sum: cumsum diff with the window start
        # clamped to the segment start (never pandas' float64 kernel)
        idx = np.arange(len(ext), dtype=np.int64)
        seg_first = np.concatenate(([0], np.flatnonzero(seg[1:] != seg[:-1]) + 1))
        seg_of_ext = np.repeat(np.arange(len(seg_first)), np.diff(np.concatenate((seg_first, [len(ext)]))))
        w_start = np.maximum(seg_first[seg_of_ext], idx - frame + 1)
        csum = np.concatenate(([0], np.cumsum(ext)))
        w_sum = (csum[idx + 1] - csum[w_start])[real]
        rn_local = np.concatenate([np.arange(1, e - s + 1, dtype=np.int64) for s, e in zip(starts, ends)])
        rn = rn_local + np.concatenate(prior_cnt)
        w_cnt = np.minimum(rn, frame)
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                "w_cnt": pa.array(w_cnt, pa.int64()),
                "w_sum": pa.array(w_sum, pa.int64()),
                "w_min": pa.array(w_min, pa.int64()),
                "w_max": pa.array(w_max, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def resample_ffill(ds, key: str = "user_id", order_col: str = "ts",
                   value_col: str = "value", value_scale: int = 100,
                   step_us: int = 86_400_000_000, max_grid_per_segment: int = 1 << 22):
    """Per-key time-series resampling with forward fill: emit one row for
    every multiple of ``step_us`` inside the key's [min ts, max ts] span,
    carrying the last observation at or before each grid instant — the
    gap-fill step in front of any fixed-cadence feature pipeline. Exactly
    SQL's per-key ``generate_series`` + ``ASOF JOIN`` (grid_t >= event_t).
    Returns a Dataset of ``(key, grid_us, units)`` with
    ``units = floor(value * value_scale + 0.5)`` (exact integers).

    Same metadata-only pinned-sorted-block plan as ``analytic_over``:
    pass A ships per (block, key) the first/last event timestamp and the
    last unit value; the driver folds a per-key (last ts, last unit) carry
    in block order; pass B re-reads the SAME pinned blocks and emits each
    block's OWN grid slice — multiples of ``step_us`` in
    ``(carry ts, block-last ts]`` (or ``[first ts, last ts]`` for the
    key's first block) — via one ``np.arange`` + ``searchsorted`` per
    segment. Blocks never emit overlapping grid points, so the union over
    blocks is exactly the key's full grid.

    ``(key, order_col)`` must be globally unique; nulls fail loudly. A
    segment expanding to more than ``max_grid_per_segment`` points fails
    loudly (step too fine for the span).
    """
    import numpy as np
    import ray

    if step_us <= 0:
        raise ValueError(f"step_us must be positive, got {step_us}")

    def to_meta(batch: pa.Table) -> pa.Table:
        ous = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64())
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for forward fill")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": ous,
                "v": pa.array(units, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "first_o", "last_o", "last_v")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "first_o": pa.array(o[starts], pa.int64()),
                "last_o": pa.array(o[ends - 1], pa.int64()),
                "last_v": pa.array(v[ends - 1], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, first_o, last_o, last_v in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), int(first_o), int(last_o), int(last_v))
        )
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    acc: dict[int, tuple[int, int]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, int] | None]] = {}
    for lo in order:
        snap = {k: acc.get(k) for k, _, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, _first_o, last_o, last_v in blocks[lo]:
            acc[k] = (last_o, last_v)
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "grid_us": pa.array([], pa.int64()),
                "units": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        out_k, out_t, out_u = [], [], []
        for s, e in zip(starts, ends):
            carry = base[int(k[s])]
            if carry is None:
                g0 = -(-o[s] // step_us)  # ceil
                ev_o, ev_v = o[s:e], v[s:e]
            else:
                g0 = -(-(carry[0] + 1) // step_us)  # first multiple > carry ts
                ev_o = np.concatenate(([carry[0]], o[s:e]))
                ev_v = np.concatenate(([carry[1]], v[s:e]))
            g1 = o[e - 1] // step_us
            if g1 < g0:
                continue
            if g1 - g0 + 1 > max_grid_per_segment:
                raise ValueError(
                    f"segment expands to {g1 - g0 + 1} grid points > "
                    f"max_grid_per_segment={max_grid_per_segment}; coarsen step_us"
                )
            ts = np.arange(g0, g1 + 1, dtype=np.int64) * step_us
            idx = np.searchsorted(ev_o, ts, side="right") - 1
            out_k.append(np.full(len(ts), k[s], dtype=np.int64))
            out_t.append(ts)
            out_u.append(ev_v[idx])
        if not out_k:
            return empty
        return pa.table(
            {
                key: pa.array(np.concatenate(out_k), pa.int64()),
                "grid_us": pa.array(np.concatenate(out_t), pa.int64()),
                "units": pa.array(np.concatenate(out_u), pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def lead_over(ds, key: str = "user_id", order_col: str = "ts", id_col: str = "event_id"):
    """SQL ``lead(...) OVER (PARTITION BY key ORDER BY order_col)`` — each
    event annotated with the NEXT event's timestamp and id, -1 sentinels on
    the partition's last row (same hash-stable convention as
    ``analytic_over``'s lag). This is the SCD2 validity-interval builder:
    ``(ts_us, next_ts_us)`` is the row's [valid_from, valid_to) range.

    Same pinned-sorted-block plan as ``analytic_over``, folded in REVERSE
    block order: pass A ships each (block, key)'s FIRST (ts, id); the
    driver hands every block the next block's first pair per key; pass B
    shifts within segments and patches each segment's last row from the
    carry. ``(key, order_col)`` must be globally unique.
    """
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "first_o", "first_i")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "first_o": pa.array(o[starts], pa.int64()),
                "first_i": pa.array(i[starts], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, first_o, first_i in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(first_o), int(first_i)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    # reverse fold: for each block, the NEXT (first_o, first_i) per key
    nxt: dict[int, tuple[int, int]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, int] | None]] = {}
    for lo in reversed(order):
        snap = {k: nxt.get(k) for k, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, first_o, first_i in blocks[lo]:
            nxt[k] = (first_o, first_i)
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "next_ts_us": pa.array([], pa.int64()),
                f"next_{id_col}": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        n = len(k)
        next_o = np.full(n, -1, dtype=np.int64)
        next_i = np.full(n, -1, dtype=np.int64)
        same = k[1:] == k[:-1]
        next_o[:-1][same] = o[1:][same]
        next_i[:-1][same] = i[1:][same]
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n])) - 1  # segment last rows
        for e in ends:
            carried = base[int(k[e])]
            if carried is not None:
                next_o[e], next_i[e] = carried
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "next_ts_us": pa.array(next_o, pa.int64()),
                f"next_{id_col}": pa.array(next_i, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def ohlc_bars(ds, key: str = "user_id", ts_col: str = "ts", value_col: str = "value",
              window_us: int = 86_400_000_000, value_scale: int = 100):
    """Time-bucketed OHLC bars per key: for every (key, tumbling window)
    the OPEN (first value by timestamp), HIGH, LOW, CLOSE (last value) and
    count — the finance/metrics roll-up, in exact integer units. Exactly
    SQL ``arg_min(u, ts) / max / min / arg_max(u, ts) GROUP BY key,
    (ts // window) * window``. Timestamps must be unique per key (arg_min
    under ties matches no particular engine).

    Mergeable-partial plan: each batch folds its rows to per-(key, window)
    cells carrying (first_ts, open, last_ts, close, lo, hi, cnt) — ONE
    vectorized pandas groupby per batch — then one global cell groupby and
    a per-cell combine. Rows never shuffle; hot keys cost their window
    count. Returns ``(key, window_start_us, open_u, high_u, low_u,
    close_u, cnt)``.
    """
    import numpy as np
    import pandas as pd

    if window_us <= 0:
        raise ValueError(f"window_us must be positive, got {window_us}")

    def partial(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for OHLC")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        w = np.sign(us) * (np.abs(us) // window_us) * window_us  # trunc-to-zero == SQL //
        df = pd.DataFrame(
            {"k": batch[key].cast(pa.int64()).to_pandas(), "w": w, "us": us, "u": u}
        ).sort_values(["k", "w", "us"], kind="mergesort")
        g = df.groupby(["k", "w"], sort=False)
        out = g.agg(
            first_ts=("us", "first"), open_u=("u", "first"),
            last_ts=("us", "last"), close_u=("u", "last"),
            low_u=("u", "min"), high_u=("u", "max"), cnt=("u", "size"),
        ).reset_index()
        return pa.Table.from_pandas(out, preserve_index=False)

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        fi = int(df["first_ts"].to_numpy().argmin())
        la = int(df["last_ts"].to_numpy().argmax())
        return pd.DataFrame(
            {
                key: [np.int64(df["k"].iloc[0])],
                "window_start_us": [np.int64(df["w"].iloc[0])],
                "open_u": [np.int64(df["open_u"].iloc[fi])],
                "high_u": [np.int64(df["high_u"].max())],
                "low_u": [np.int64(df["low_u"].min())],
                "close_u": [np.int64(df["close_u"].iloc[la])],
                "cnt": [np.int64(df["cnt"].sum())],
            }
        )

    return cells.groupby(["k", "w"]).map_groups(combine, batch_format="pandas", **remote_args())


def transition_counts(ds, key: str = "user_id", order_col: str = "ts",
                      state_col: str = "event_type"):
    """First-order Markov transition counts: how often state A is followed
    by state B within a key's ordered event sequence — SQL
    ``lead(state) OVER (PARTITION BY key ORDER BY ts)`` + GROUP BY. The
    behavioral-model / next-event-prediction input table. Returns a
    Dataset of ``(from_state, to_state, cnt)``.

    Pinned-sorted-block plan over (key, ts, state) metadata; the
    cross-block boundary pair comes from a reverse fold handing every
    block its successor's FIRST state per key (the ``lead_over`` shape);
    in-block pairs pre-aggregate to cells before the ONE final groupby.
    ``(key, order_col)`` must be globally unique.
    """
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "s": batch[state_col].cast(pa.string()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table(
                {
                    "blo_k": pa.array([], pa.int64()),
                    "blo_o": pa.array([], pa.int64()),
                    "k": pa.array([], pa.int64()),
                    "first_s": pa.array([], pa.string()),
                }
            )
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_pandas().to_numpy()
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "first_s": pa.array([str(x) for x in s[starts]], pa.string()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, first_s in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), str(first_s)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    nxt: dict[int, str] = {}
    bases: dict[tuple[int, int], dict[int, str | None]] = {}
    for lo in reversed(order):
        snap = {k: nxt.get(k) for k, _ in blocks[lo]}
        bases[lo] = snap
        for k, first_s in blocks[lo]:
            nxt[k] = first_s
    bases_ref = ray.put(bases)

    def cells(batch: pa.Table) -> pa.Table:
        import pandas as pd

        empty = pa.table(
            {
                "from_state": pa.array([], pa.string()),
                "to_state": pa.array([], pa.string()),
                "c": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_pandas().to_numpy()
        n = len(k)
        frm, to = [], []
        same = k[1:] == k[:-1]
        frm.append(s[:-1][same])
        to.append(s[1:][same])
        ends = np.concatenate((np.flatnonzero(k[1:] != k[:-1]), [n - 1]))
        for e in ends:
            carried = base[int(k[e])]
            if carried is not None:
                frm.append(np.array([s[e]], dtype=object))
                to.append(np.array([carried], dtype=object))
        f = np.concatenate(frm) if frm else np.array([], dtype=object)
        t = np.concatenate(to) if to else np.array([], dtype=object)
        if not len(f):
            return empty
        df = pd.DataFrame({"from_state": f.astype(str), "to_state": t.astype(str)})
        g = df.groupby(["from_state", "to_state"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(g, preserve_index=False)

    out = pinned.map_batches(
        cells, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    return fast_groupby(
        out,
        ["from_state", "to_state"],
        Sum("c", alias_name="cnt"),
    )


def _ewma_chunk_len(beta: float) -> int:
    """Largest chunk whose beta^-j stays finite in float64."""
    import math

    if beta <= 0.0:
        return 1 << 20
    return max(8, int(280.0 / max(1e-12, -math.log10(beta))))


def _ewma_scan(x: "np.ndarray", seed: float | None, alpha: float) -> "np.ndarray":
    """Vectorized EWMA recurrence (adjust=False): e_t = a*x_t + (1-a)*e_{t-1},
    seeded with e_{-1} = seed, or e_0 = x_0 when seed is None. Runs in
    chunks so the beta^-j scan weights never overflow; O(chunks) Python
    iterations per call, all math in numpy."""
    import numpy as np

    beta = 1.0 - alpha
    n = len(x)
    e = np.empty(n, dtype=np.float64)
    start = 0
    prev = seed
    if seed is None:
        e[0] = x[0]
        prev = float(x[0])
        start = 1
    L = _ewma_chunk_len(beta)
    for s in range(start, n, L):
        c = x[s:s + L]
        m = len(c)
        if beta == 0.0:
            e[s:s + m] = c
            prev = float(c[-1])
            continue
        q = beta ** np.arange(m, dtype=np.float64)          # beta^t
        r = beta ** -np.arange(m, dtype=np.float64)         # beta^-j (finite by L)
        e[s:s + m] = beta * q * prev + alpha * q * np.cumsum(c * r)
        prev = float(e[s + m - 1])
    return e


def ewma_over(ds, key: str = "user_id", order_col: str = "ts",
              value_col: str = "value", alpha: float = 0.3):
    """Exponentially-weighted moving average per key (pandas
    ``ewm(alpha, adjust=False)`` semantics: ``e_0 = x_0``,
    ``e_i = alpha*x_i + (1-alpha)*e_{i-1}``) — the smoothed-metric /
    anomaly-baseline transform. Returns a Dataset of ``(key, ts_us, ewma)``.

    Pinned-sorted-block plan. Each (block, key) partial ships the LINEAR
    MAP its segment applies to an incoming state — ``e_out = decay*e_in +
    w`` with ``decay = beta^m`` and ``w`` the zero-seeded fold — plus the
    segment's first value (seeding ``e_0 = x_0`` is exactly ``e_in = x_0``
    through that map). The driver composes maps per key in block order so
    every block knows its entry state; pass B re-runs the recurrence from
    that seed, vectorized in overflow-safe chunks.

    Floats: the map composition rounds differently from a single
    sequential pass at the ~1e-15 relative level — results are
    layout-stable only to that tolerance (pinned by test); round before
    hashing. No SQL oracle exists (no product-scan aggregate); the query
    registers rows-only. Nulls fail loudly; ``(key, order_col)`` must be
    globally unique.
    """
    import numpy as np
    import ray

    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    beta = 1.0 - alpha

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for EWMA")
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "v": pa.array(v.astype(np.float64), pa.float64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = {
            "blo_k": pa.array([], pa.int64()),
            "blo_o": pa.array([], pa.int64()),
            "k": pa.array([], pa.int64()),
            "decay": pa.array([], pa.float64()),
            "w": pa.array([], pa.float64()),
            "first_v": pa.array([], pa.float64()),
        }
        if not batch.num_rows:
            return pa.table(cols)
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        decays, ws = [], []
        L = _ewma_chunk_len(beta)
        for s, e in zip(starts, ends):
            c = v[s:e]
            m = len(c)
            decays.append(beta ** m)
            # zero-seeded fold, vectorized in the same overflow-safe chunks
            w = 0.0
            for cs in range(0, m, L):
                cc = c[cs:cs + L]
                mm = len(cc)
                if beta == 0.0:
                    w = float(cc[-1])
                    continue
                q = beta ** np.arange(mm, dtype=np.float64)
                r = beta ** -np.arange(mm, dtype=np.float64)
                seg = beta * q * w + alpha * q * np.cumsum(cc * r)
                w = float(seg[-1])
            ws.append(w)
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), batch["o"][0].as_py()), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "decay": pa.array(decays, pa.float64()),
                "w": pa.array(ws, pa.float64()),
                "first_v": pa.array(v[starts], pa.float64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, decay, w, first_v in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), float(decay), float(w), float(first_v))
        )
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    acc: dict[int, float] = {}
    bases: dict[tuple[int, int], dict[int, float | None]] = {}
    for lo in order:
        snap = {k: acc.get(k) for k, _, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, decay, w, first_v in blocks[lo]:
            e_in = acc.get(k)
            if e_in is None:
                e_in = first_v  # adjust=False seeding == entering with x_0
            acc[k] = decay * e_in + w
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "ewma": pa.array([], pa.float64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        e = np.empty(n, dtype=np.float64)
        for s, en in zip(starts, ends):
            e[s:en] = _ewma_scan(v[s:en], base[int(k[s])], alpha)
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                "ewma": pa.array(e, pa.float64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def first_per_window(ds, key_cols: list[str], ts_col: str, window_sec: int,
                     tiebreak_col: str):
    """Ingest-time event dedup: keep the EARLIEST row per (keys, tumbling
    window) — "one signup event per user per hour", the at-least-once
    stream compaction rule. Ties on ts break by smallest ``tiebreak_col``
    (must be unique within a tie set), so the survivor is deterministic on
    any plan — SQL ``row_number() OVER (PARTITION BY keys, window ORDER BY
    ts, tiebreak) = 1`` verbatim.

    Scale shape (the `latest_by_key` plan): each block reduces LOCALLY to
    one row per (keys, window) via one Arrow sort + head-of-run take, so
    the global groupby ships at most |cells-per-block| rows; each group
    then picks its min (ts, tiebreak) lexicographically. Appends a
    ``window`` column (epoch-micros window start, exact ints)."""
    import numpy as np
    import pandas as pd

    win_us = int(window_sec) * 1_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        win = (ts // win_us) * win_us
        return batch.append_column("window", pa.array(win, pa.int64()))

    keys = list(key_cols) + ["window"]

    def local_first(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return batch
        sort_keys = [(k, "ascending") for k in keys] + [
            (ts_col, "ascending"), (tiebreak_col, "ascending")]
        s = batch.take(pc.sort_indices(batch, sort_keys=sort_keys))
        same = np.ones(len(s), dtype=bool)
        first = np.zeros(len(s), dtype=bool)
        first[0] = True
        for k in keys:
            v = s[k].to_numpy(zero_copy_only=False)
            same[1:] &= v[1:] == v[:-1]
        # a full (keys, ts, tiebreak) duplicate would be collapsed silently
        # here, invisible to the global tie check — catch it before reducing
        full = same.copy()
        for k in (ts_col, tiebreak_col):
            v = s[k].to_numpy(zero_copy_only=False)
            full[1:] &= v[1:] == v[:-1]
        if full[1:].any():
            raise ValueError(
                f"first_per_window: duplicate (keys, {ts_col}, {tiebreak_col}) rows "
                "— the survivor would be arbitrary"
            )
        first[1:] = ~same[1:]
        return s.filter(pa.array(first))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((g[tiebreak_col].to_numpy(), g[ts_col].to_numpy()))
        if len(order) > 1:
            a, b = g.iloc[int(order[0])], g.iloc[int(order[1])]
            if a[ts_col] == b[ts_col] and a[tiebreak_col] == b[tiebreak_col]:
                raise ValueError(
                    f"first_per_window: duplicate ({ts_col}, {tiebreak_col}) = "
                    f"({a[ts_col]!r}, {a[tiebreak_col]!r}) — the survivor would be arbitrary"
                )
        return g.iloc[[int(order[0])]]

    local = (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .map_batches(local_first, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    )
    return local.groupby(keys).map_groups(pick, batch_format="pandas", **remote_args())


def time_rollup(ds, ts_col: str, value_col: str, value_scale: int = 100,
                grains: tuple = (("hour", 3_600_000_000),
                                 ("day", 86_400_000_000),
                                 ("week", 604_800_000_000))):
    """Multi-granularity time rollup in ONE corpus pass: per-batch cells at
    the FINEST grain only, one groupby, then coarser grains re-aggregate
    from the materialized finest cells (|hours| rows, not |rows|) — the
    rollup-hierarchy trick (`ops/agg.rollup`) applied to time. All buckets
    are exact integer epoch-micros floors; sums are exact units. Returns a
    Dataset of ``(grain, bucket, cnt, sum_units)`` over all grains.
    """
    import numpy as np
    from ray.data.aggregate import Sum

    grains = list(grains)
    if not grains or any(g[1] <= 0 for g in grains):
        raise ValueError("grains must be (name, positive micros) pairs")
    grains.sort(key=lambda g: g[1])
    finest_name, finest_us = grains[0]
    for name, us in grains[1:]:
        if us % finest_us:
            raise ValueError(
                f"grain {name!r} ({us}) is not a multiple of the finest ({finest_us}) — "
                "coarser cells could not re-aggregate exactly"
            )

    def cells(batch: pa.Table) -> pa.Table:
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype("datetime64[us]").view("i8")
        v = batch[value_col].to_numpy(zero_copy_only=False)
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        b = (ts // finest_us) * finest_us
        t = pa.table({"bucket": pa.array(b), "n": pa.array(np.ones(len(b), np.int64)),
                      "s": pa.array(u)})
        out = t.group_by("bucket").aggregate([("n", "sum"), ("s", "sum")])
        return out.rename_columns(["bucket", "cnt", "sum_units"])

    finest = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "bucket",
        Sum("cnt", alias_name="cnt"), Sum("sum_units", alias_name="sum_units"),
    )
        .materialize()  # |finest buckets| rows; re-read per coarser grain
    )

    def tag(name: str, us: int):
        def fn(batch: pa.Table) -> pa.Table:
            b = batch["bucket"].to_numpy(zero_copy_only=False)
            g = (b // us) * us
            return pa.table({"grain": pa.array([name] * len(b), pa.string()),
                             "bucket": pa.array(g, pa.int64()),
                             "cnt": batch["cnt"], "sum_units": batch["sum_units"]})

        return fn

    outs = []
    for name, us in grains:
        lvl = finest.map_batches(tag(name, us), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        lvl = fast_groupby(
        lvl,
        ["grain", "bucket"],
        Sum("cnt", alias_name="cnt"), Sum("sum_units", alias_name="sum_units"),
    )
        outs.append(lvl)
    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out

def lag_autocorr(ds, key: str = "event_type", order_col: str = "ts",
                 value_col: str = "value", value_scale: int = 100,
                 max_abs_sum: int = 1 << 62):
    """Per-key lag-1 autocorrelation of a time-ordered measure — the
    "is this metric a random walk or noise?" audit over an event log.
    Pearson r over consecutive pairs (x_t, x_{t+1}) within each key:

        r = (n*Sxy - Sx*Sy) / (sqrt(n*Sxx - Sx*Sx) * sqrt(n*Syy - Sy*Sy))

    Parity contract (the regression_by_group rule): every sum is an exact
    integer over int64 units (per-row |unit| < 2^31 guard; merged in
    PYTHON ints, no wrap), each is cast to float64 ONCE, and the
    expression tree above is mirrored op-for-op by the SQL oracle
    (np.sqrt and libm sqrt are both IEEE correctly-rounded, so sqrt is
    parity-safe, unlike log). Keys with < 2 pairs are dropped (the SQL
    HAVING). Keys may be strings (no int cast — the block fold orders by
    Python comparison, same collation as the sort).

    Plan: metadata-only (key, order, unit) projection -> global sort ->
    pinned blocks (batch_size=None = one batch per block); pass A
    computes per-key IN-BLOCK pair partials plus each block's first/last
    row; the driver stitches the ONE boundary pair per adjacent same-key
    block pair and merges per key. Payloads never move;
    ``(key, order_col)`` must be globally unique (duplicate order values
    would make lead() nondeterministic on the SQL side). Returns a
    driver DataFrame ``(key, n, r)``.
    """
    import numpy as np
    import pandas as pd

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"lag_autocorr: {value_col!r} must be non-null")
        if batch[key].null_count:
            raise ValueError("lag_autocorr: null keys")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        if np.abs(u).max(initial=0) >= 1 << 31:
            raise ValueError("lag_autocorr: |units| >= 2^31; int64 per-row products would overflow")
        return pa.table({
            "k": batch[key].combine_chunks(),
            "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
            "x": pa.array(u),
        })

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    SUMS = ("n", "sx", "sy", "sxx", "syy", "sxy")

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = {"kind": pa.string(), "k": pa.string(), "o": pa.int64(), "x": pa.int64(),
                "k2": pa.string(), "o2": pa.int64(), "x2": pa.int64(),
                **{s: pa.int64() for s in SUMS}}
        if not batch.num_rows:
            return pa.table({c: pa.array([], t) for c, t in cols.items()})
        k = batch["k"].to_pandas().astype(str).to_numpy()
        o = batch["o"].to_numpy(zero_copy_only=False)
        x = batch["x"].to_numpy(zero_copy_only=False)
        if ((k[1:] == k[:-1]) & (o[1:] == o[:-1])).any():
            raise ValueError("lag_autocorr: duplicate (key, order) — lead() would be nondeterministic")
        mask = k[1:] == k[:-1]
        xt, yt, kk = x[:-1][mask], x[1:][mask], k[:-1][mask]
        part = pd.DataFrame({
            "k": kk, "n": np.ones(len(kk), np.int64),
            "sx": xt, "sy": yt, "sxx": xt * xt, "syy": yt * yt, "sxy": xt * yt,
        }).groupby("k", sort=True, as_index=False).sum()
        part.insert(0, "kind", "part")
        for c in ("o", "x", "o2", "x2"):
            part[c] = np.int64(0)
        part["k2"] = ""
        # ONE edge row per block: (first k/o/x, last k/o/x) stay paired
        edge = pd.DataFrame({
            "kind": ["edge"], "k": [k[0]], "o": [o[0]], "x": [x[0]],
            "k2": [k[-1]], "o2": [o[-1]], "x2": [x[-1]],
            **{s: [np.int64(0)] for s in SUMS},
        })
        out = pd.concat([edge, part], ignore_index=True)
        return pa.Table.from_pandas(out[list(cols)], preserve_index=False)

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()

    acc: dict[str, list[int]] = {}

    def bump(k, n, sx, sy, sxx, syy, sxy):
        a = acc.setdefault(k, [0, 0, 0, 0, 0, 0])
        for i, v in enumerate((n, sx, sy, sxx, syy, sxy)):
            a[i] += v

    for row in parts[parts["kind"] == "part"].itertuples(index=False):
        bump(row.k, int(row.n), int(row.sx), int(row.sy), int(row.sxx), int(row.syy), int(row.sxy))

    edges = sorted(
        ((r.k, int(r.o), int(r.x), r.k2, int(r.o2), int(r.x2))
         for r in parts[parts["kind"] == "edge"].itertuples(index=False)),
    )
    for a, b in zip(edges, edges[1:]):
        if (a[3], a[4]) >= (b[0], b[1]):
            raise ValueError("lag_autocorr: sorted metadata blocks overlap")
        if a[3] == b[0]:  # boundary pair (block a's last row, block b's first row)
            xa, xb = a[5], b[2]
            bump(a[3], 1, xa, xb, xa * xa, xb * xb, xa * xb)

    rows = []
    for k in sorted(acc):
        n, sx, sy, sxx, syy, sxy = acc[k]
        if n < 2:
            continue
        if max(abs(v) for v in (n, sx, sy, sxx, syy, sxy)) > max_abs_sum:
            raise ValueError(f"lag_autocorr: key {k!r} sums exceed {max_abs_sum} — reduce value_scale")
        nf, sxf, syf = np.float64(n), np.float64(sx), np.float64(sy)
        sxxf, syyf, sxyf = np.float64(sxx), np.float64(syy), np.float64(sxy)
        # mirrored op-for-op by the SQL oracle — keep both sides in sync
        r = (nf * sxyf - sxf * syf) / (np.sqrt(nf * sxxf - sxf * sxf) * np.sqrt(nf * syyf - syf * syf))
        rows.append((k, n, float(r)))
    return pd.DataFrame(rows, columns=[key, "n", "r"])


def trailing_window_agg(ds, key: str = "user_id", order_col: str = "ts",
                        value_col: str = "value", value_scale: int = 100,
                        window_us: int = 3_600_000_000, max_window_rows: int = 4096):
    """Time-RANGE trailing-window aggregates per key: SQL ``count/sum OVER
    (PARTITION BY key ORDER BY order_col RANGE BETWEEN INTERVAL window
    PRECEDING AND CURRENT ROW)`` over exact integer units — the event-time
    companion to ``moving_agg``'s ROWS frames (a row's frame is every
    same-key row with ``ts in [ts_i - window_us, ts_i]``, however many
    that is). Returns a Dataset of ``(key, ts_us, w_cnt, w_sum)``.

    Same metadata-only pinned-sorted-block plan as ``moving_agg``, with a
    time-bounded carry: pass A ships per (block, key) the row count the
    block adds and the key's trailing ``(ts, unit)`` pairs newer than
    ``last_ts - window_us`` (everything any LATER row can reach back for —
    later rows have ts >= last_ts, so their window starts >= last_ts -
    window_us); the driver folds per-key carries in block order (pruning
    by the same rule, size guarded at ``max_window_rows``); pass B
    re-reads the SAME pinned blocks, prepends each segment's carry, and
    answers every row with one cumsum + searchsorted (window start is
    INCLUSIVE, matching SQL RANGE ... PRECEDING).

    ``(key, order_col)`` must be globally unique (with RANGE frames a tie
    would also make two rows peers — the loud guard protects both rules);
    null values fail loudly.
    """
    import numpy as np
    import ray

    if window_us < 0:
        raise ValueError(f"window_us must be non-negative, got {window_us}")

    def to_meta(batch: pa.Table) -> pa.Table:
        ous = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64())
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for the trailing window")
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": ous,
                "v": pa.array(units, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "blo_k": pa.array([], pa.int64()),
                "blo_o": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64()),
                "tail_t": pa.array([], pa.list_(pa.int64())),
                "tail_v": pa.array([], pa.list_(pa.int64())),
            }
        )
        if not batch.num_rows:
            return empty
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        tt, tv = [], []
        for s, e in zip(starts, ends):
            seg_t = o[s:e]
            if len(seg_t) > 1 and (np.diff(seg_t) <= 0).any():
                raise ValueError("trailing_window_agg: duplicate (key, order_col) — RANGE peers are ambiguous")
            keep = seg_t >= seg_t[-1] - window_us
            tt.append(seg_t[keep].tolist())
            tv.append(v[s:e][keep].tolist())
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "cnt": pa.array(ends - starts, pa.int64()),
                "tail_t": pa.array(tt, pa.list_(pa.int64())),
                "tail_v": pa.array(tv, pa.list_(pa.int64())),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, cnt, tail_t, tail_v in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), int(cnt), list(tail_t), list(tail_v))
        )
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    # per-key carry: (ts, unit) pairs any later block might still reach
    acc: dict[int, tuple[list, list]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[list, list]]] = {}
    for lo in order:
        snap = {k: acc.get(k, ([], [])) for k, _, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, _cnt, tail_t, tail_v in blocks[lo]:
            pt, pv = acc.get(k, ([], []))
            if pt and tail_t and pt[-1] >= tail_t[0]:
                raise ValueError("trailing_window_agg: block carries out of order — duplicate (key, ts)?")
            nt, nv = pt + tail_t, pv + tail_v
            if tail_t:
                cut = tail_t[-1] - window_us
                first = 0
                while first < len(nt) and nt[first] < cut:
                    first += 1
                nt, nv = nt[first:], nv[first:]
            if len(nt) > max_window_rows:
                raise ValueError(
                    f"trailing_window_agg: {len(nt)} rows inside one window exceed "
                    f"max_window_rows={max_window_rows} — widen the guard or narrow the window"
                )
            acc[k] = (nt, nv)
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "w_cnt": pa.array([], pa.int64()),
                "w_sum": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        out_cnt = np.empty(len(k), dtype=np.int64)
        out_sum = np.empty(len(k), dtype=np.int64)
        for s, e in zip(starts, ends):
            ct, cv = base[int(k[s])]
            ext_t = np.concatenate((np.asarray(ct, np.int64), o[s:e]))
            ext_v = np.concatenate((np.asarray(cv, np.int64), v[s:e]))
            m = len(ct)
            csum = np.concatenate(([0], np.cumsum(ext_v)))
            idx = m + np.arange(e - s, dtype=np.int64)
            w_start = np.searchsorted(ext_t, o[s:e] - window_us, side="left")
            out_cnt[s:e] = idx + 1 - w_start
            out_sum[s:e] = csum[idx + 1] - csum[w_start]
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                "w_cnt": pa.array(out_cnt, pa.int64()),
                "w_sum": pa.array(out_sum, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def interval_coverage(ds, key: str = "user_id", order_col: str = "ts",
                      dur_us: int = 1_800_000_000):
    """Union-of-intervals coverage per key (gaps-and-islands): each event
    opens the interval ``[ts, ts + dur_us)``; overlapping or touching
    intervals merge into islands. Returns a Dataset of ``(key, n_islands,
    covered_us, span_us)`` — exact int64 end to end (SQL mirror: the
    classic running-max island construction).

    Plan: per batch, ONE pandas groupby-cummax finds in-batch islands
    vectorized and emits merged ``(key, s, e)`` island rows (a big batch
    of back-to-back events collapses to a handful of islands before
    anything shuffles); one ``groupby(key).map_groups`` merges the
    per-batch islands (numpy running max — islands per key are bounded by
    that key's event count, the same bound `sessionize` lives with) and
    emits the coverage row."""
    import pandas as pd
    import numpy as np

    if dur_us <= 0:
        raise ValueError(f"dur_us must be positive, got {dur_us}")

    def local_islands(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({key: pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "e": pa.array([], pa.int64())})
        s = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        k = batch[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"k": k, "s": s, "e": s + np.int64(dur_us)}).sort_values(["k", "s", "e"])
        prev_max = df.groupby("k", sort=False)["e"].cummax().shift(1)
        first = df["k"].ne(df["k"].shift(1))
        new_isl = (first | (df["s"] > prev_max)).to_numpy()
        isl = np.cumsum(new_isl)
        g = df.assign(isl=isl).groupby(["k", "isl"], as_index=False).agg(s=("s", "min"), e=("e", "max"))
        return pa.table({key: pa.array(g["k"].to_numpy(), pa.int64()),
                         "s": pa.array(g["s"].to_numpy(), pa.int64()),
                         "e": pa.array(g["e"].to_numpy(), pa.int64())})

    parts = ds.map_batches(local_islands, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["s", "e"])
        s = g["s"].to_numpy(np.int64)
        e = g["e"].to_numpy(np.int64)
        run_max = np.maximum.accumulate(e)
        new_isl = np.concatenate(([True], s[1:] > run_max[:-1]))
        isl = np.cumsum(new_isl) - 1
        n_isl = int(isl[-1]) + 1
        s0 = s[np.flatnonzero(new_isl)]  # s sorted: island start = first s
        e1 = np.zeros(n_isl, dtype=np.int64)
        np.maximum.at(e1, isl, e)
        return pd.DataFrame({
            key: [int(g[key].iloc[0])],
            "n_islands": [n_isl],
            "covered_us": [int((e1 - s0).sum())],
            "span_us": [int(run_max[-1]) - int(s[0])],
        })

    return parts.groupby(key).map_groups(fold, batch_format="pandas", **remote_args())


def decayed_contributions(ds, key: str = "user_id", order_col: str = "ts",
                          value_col: str = "value", value_scale: int = 100,
                          tau_hours: float = 24.0, t_ref_us: int | None = None):
    """Exponentially time-decayed per-event contribution TERMS — the
    recency-weighted activity feature: ``term = units * exp(-age_hours /
    tau_hours)`` with ``age_hours = (t_ref - ts) // 3600e6`` (INTEGER
    hours, so the decay argument is exact and ``exp`` runs once per
    distinct age via ``math.exp`` — the libm rule; np.exp's SIMD path
    drifts an ulp). Per-row terms are hash-exact against the mirrored SQL
    expression; fold them per key downstream with an explicit tolerance
    (float summation order is plan-dependent — the entropy_by_group
    terms-vs-fold rule).

    Returns a Dataset of ``(key, ts_us, units, term)``. ``t_ref_us``
    defaults to the corpus max timestamp (one metadata aggregate)."""
    import math

    import numpy as np

    if tau_hours <= 0:
        raise ValueError(f"tau_hours must be positive, got {tau_hours}")
    if t_ref_us is None:
        mx = ds.max(order_col)
        # exact integer micros — float .timestamp() loses precision (the
        # timestamp-literal invariant: never go through seconds-as-float)
        import datetime as _dt

        if hasattr(mx, "value"):  # pandas Timestamp: ns ticks
            t_ref_us = int(mx.value) // 1000
        elif isinstance(mx, _dt.datetime):
            epoch = _dt.datetime(1970, 1, 1, tzinfo=mx.tzinfo)
            t_ref_us = (mx - epoch) // _dt.timedelta(microseconds=1)
        else:
            t_ref_us = int(mx)

    def terms(batch: pa.Table) -> pa.Table:
        us = batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False)
        units = np.floor(v * value_scale + 0.5).astype(np.int64)
        age_h = (np.int64(t_ref_us) - us) // np.int64(3_600_000_000)
        if len(age_h) and age_h.min() < 0:
            raise ValueError("decayed_contributions: events newer than t_ref_us")
        uniq = np.unique(age_h)
        decay_map = {int(a): math.exp(-(float(a) / float(tau_hours))) for a in uniq}
        decay = np.array([decay_map[int(a)] for a in age_h], dtype=np.float64)
        return pa.table({
            key: batch[key].cast(pa.int64()),
            "ts_us": pa.array(us, pa.int64()),
            "units": pa.array(units, pa.int64()),
            "term": pa.array(units.astype(np.float64) * decay, pa.float64()),
        })

    return ds.map_batches(terms, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def scd2_intervals(ds, key: str = "user_id", order_col: str = "ts",
                   attr_col: str = "event_type"):
    """Slowly-changing-dimension type-2 history: collapse each key's
    ordered attribute stream to its CHANGE rows and attach validity
    intervals. Returns a Dataset of ``(key, attr_col, valid_from_us,
    valid_to_us)`` — one row per (key, run of equal attr values), where
    ``valid_from_us`` is the run's first timestamp and ``valid_to_us`` is
    the NEXT run's first timestamp (-1 sentinel on the key's current run;
    nullable int64 is hash-fragile, see analytic_over).

    SQL mirror::

        WITH x AS (SELECT key, o, a, lag(a) OVER w AS pa FROM t),
        ch AS (SELECT key, o, a FROM x WHERE pa IS NULL OR a <> pa)
        SELECT key, a, o AS valid_from_us,
               coalesce(lead(o) OVER w2, -1) AS valid_to_us FROM ch

    Same metadata-only pinned-sorted-block plan as ``analytic_over``:
    pass A ships one row per (block, key) — first/last attr, first ts, and
    the block's first INTERNAL change ts; the driver folds prev-attr
    forward (to decide each block's boundary change) and next-change-ts
    backward; pass B re-reads the SAME pinned blocks and emits change rows
    vectorized. ``(key, order_col)`` must be globally unique (in-block
    strictly-increasing guard is loud; cross-block dups are excluded by
    the sort's disjointness check). ``attr_col`` must be non-null.
    """
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        a = batch[attr_col]
        if a.null_count:
            raise ValueError(f"scd2_intervals: {attr_col!r} must be non-null")
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "a": a.cast(pa.string()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({
                "blo_k": pa.array([], pa.int64()), "blo_o": pa.array([], pa.int64()),
                "k": pa.array([], pa.int64()), "first_o": pa.array([], pa.int64()),
                "first_a": pa.array([], pa.string()), "last_a": pa.array([], pa.string()),
                "ichg_o": pa.array([], pa.int64()),
            })
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        a = batch["a"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        chg = np.zeros(len(k), dtype=bool)
        chg[1:] = a[1:] != a[:-1]
        chg[starts] = False  # internal changes only
        ichg = np.full(len(starts), -1, dtype=np.int64)
        for si in range(len(starts)):
            idx = np.flatnonzero(chg[starts[si]:ends[si]])
            if idx.size:
                ichg[si] = o[starts[si] + idx[0]]
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "first_o": pa.array(o[starts], pa.int64()),
                "first_a": pa.array(a[starts], pa.string()),
                "last_a": pa.array(a[ends - 1], pa.string()),
                "ichg_o": pa.array(ichg, pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, first_o, first_a, last_a, ichg_o in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append(
            (int(k), int(first_o), first_a, last_a, int(ichg_o))
        )
    order = sorted(blocks)
    for x, y in zip(order, order[1:]):
        if blocks[x][-1][0] > y[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")

    # forward fold: prev attr per key entering each block -> per-(block,key)
    # boundary-change flag and the block's first change ts (or None)
    prev_a: dict[int, str] = {}
    first_change: dict[tuple[int, int], dict[int, int | None]] = {}
    bound_chg: dict[tuple[int, int], dict[int, bool]] = {}
    for lo in order:
        fc: dict[int, int | None] = {}
        bc: dict[int, bool] = {}
        for k, first_o, fa, la, ichg_o in blocks[lo]:
            b = prev_a.get(k) is None or prev_a[k] != fa
            bc[k] = b
            fc[k] = first_o if b else (ichg_o if ichg_o >= 0 else None)
            prev_a[k] = la
        first_change[lo] = fc
        bound_chg[lo] = bc
    # reverse fold: next change ts per key AFTER each block
    nxt: dict[int, int] = {}
    nxt_after: dict[tuple[int, int], dict[int, int]] = {}
    for lo in reversed(order):
        snap = {k: nxt.get(k, -1) for k, *_ in blocks[lo]}
        nxt_after[lo] = snap
        for k, *_ in blocks[lo]:
            fc = first_change[lo][k]
            if fc is not None:
                nxt[k] = fc
    carry_ref = ray.put((bound_chg, nxt_after))

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                attr_col: pa.array([], pa.string()),
                "valid_from_us": pa.array([], pa.int64()),
                "valid_to_us": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        bound_chg_m, nxt_after_m = ray.get(carry_ref)
        lo = (batch["k"][0].as_py(), batch["o"][0].as_py())
        bc = bound_chg_m[lo]
        na = nxt_after_m[lo]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        a = batch["a"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.concatenate((starts, [n]))))
        same_seg = np.zeros(n, dtype=bool)
        same_seg[1:] = k[1:] == k[:-1]
        if (o[1:][same_seg[1:]] <= o[:-1][same_seg[1:]]).any():
            raise ValueError("scd2_intervals: duplicate or unordered (key, order) rows")
        chg = np.zeros(n, dtype=bool)
        chg[1:] = a[1:] != a[:-1]
        chg[starts] = np.array([bc[int(k[s])] for s in starts], dtype=bool)
        idx = np.flatnonzero(chg)
        if not idx.size:
            return empty
        vfrom = o[idx]
        vto = np.full(len(idx), -1, dtype=np.int64)
        same_key_next = np.zeros(len(idx), dtype=bool)
        same_key_next[:-1] = k[idx[:-1]] == k[idx[1:]]
        vto[:-1][same_key_next[:-1]] = o[idx[1:]][same_key_next[:-1]]
        last_of_key = ~same_key_next
        for j in np.flatnonzero(last_of_key):
            vto[j] = na[int(k[idx[j]])]
        return pa.table(
            {
                key: pa.array(k[idx], pa.int64()),
                attr_col: pa.array(a[idx], pa.string()),
                "valid_from_us": pa.array(vfrom, pa.int64()),
                "valid_to_us": pa.array(vto, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def debounce(ds, key: str = "user_id", order_col: str = "ts",
             id_col: str = "event_id", min_gap_us: int = 60_000_000):
    """Lag-based event debouncing: keep a row iff it is its key's first or
    arrived MORE than ``min_gap_us`` microseconds after the PREVIOUS row
    (kept or not — the SQL-replayable convention; a greedy keep-relative
    throttle needs recursion and has no window mirror). Returns a Dataset
    of ``(key, ts_us, id_col)`` — exactly SQL's
    ``QUALIFY prev IS NULL OR ts - prev > gap``.

    Same pinned-sorted-block plan as ``sessionize``: pass A ships each
    (block, key)'s last timestamp, the driver folds the previous-row carry
    per block boundary, pass B filters vectorized. ``(key, order_col)``
    must be globally unique."""
    import numpy as np
    import ray

    if min_gap_us <= 0:
        raise ValueError(f"min_gap_us must be positive, got {min_gap_us}")

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "last_o")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "last_o": pa.array(o[ends - 1], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, last_o in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(last_o)))
    order = sorted(blocks)
    for x, y in zip(order, order[1:]):
        if blocks[x][-1][0] > y[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    prev: dict[int, int] = {}
    bases: dict[tuple[int, int], dict[int, int]] = {}
    for lo in order:
        snap = {k: prev.get(k, -1) for k, _ in blocks[lo]}
        bases[lo] = snap
        for k, last_o in blocks[lo]:
            prev[k] = last_o
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        prev_o = np.empty(n, dtype=np.int64)
        prev_o[1:] = o[:-1]
        for s in starts:
            prev_o[s] = base[int(k[s])]
        same_seg = np.ones(n, dtype=bool)
        same_seg[starts] = np.array([base[int(k[s])] >= 0 for s in starts], dtype=bool)
        if (o[np.flatnonzero(same_seg)] <= prev_o[np.flatnonzero(same_seg)]).any():
            raise ValueError("debounce: duplicate or unordered (key, order) rows")
        keep = ~same_seg | (o - prev_o > min_gap_us)
        idx = np.flatnonzero(keep)
        return pa.table(
            {
                key: pa.array(k[idx], pa.int64()),
                "ts_us": pa.array(o[idx], pa.int64()),
                id_col: pa.array(i[idx], pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def longest_streak(ds, key: str = "user_id", ts_col: str = "ts"):
    """Longest run of CONSECUTIVE active days per key (gaps-and-islands
    over the distinct-day calendar): returns a Dataset of
    ``(key, n_days, longest_streak)`` — n_days = distinct active days,
    longest_streak = max consecutive-day run, both int64 and hash-exact
    vs SQL's ``day - row_number()`` island trick.

    Scale shape: per-batch (key, epoch-day) pairs dedupe locally, ONE cell
    groupby dedupes globally (|key x active days| rows, never raw events),
    then a per-key ``map_groups`` fold over day lists — bounded by the
    calendar span, not the event count."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(us, np.int64(86_400_000_000))
        t = pa.table({"k": batch[key].cast(pa.int64()), "day": pa.array(day, pa.int64())})
        return t.group_by(["k", "day"]).aggregate([])

    cells = (fast_groupby(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["k", "day"],
        Count(alias_name="_c"),
    )
        .select_columns(["k", "day"])
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        days = np.sort(g["day"].to_numpy(np.int64))
        breaks = np.flatnonzero(np.diff(days) != 1)
        run_ends = np.concatenate((breaks, [len(days) - 1]))
        run_starts = np.concatenate(([0], breaks + 1))
        longest = int((run_ends - run_starts + 1).max())
        return pd.DataFrame({key: [int(g["k"].iloc[0])],
                             "n_days": [len(days)],
                             "longest_streak": [longest]})

    out = cells.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())
    # normalize lineage to arrow so downstream union()/groupby compose
    return out.map_batches(
        lambda t: pa.table({key: t[key].cast(pa.int64()),
                            "n_days": t["n_days"].cast(pa.int64()),
                            "longest_streak": t["longest_streak"].cast(pa.int64())}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )


def rolling_active_users(ds, key: str = "user_id", ts_col: str = "ts",
                         window_days: int = 7):
    """Trailing-window distinct-actor count: for every epoch day ``D``,
    how many distinct keys were active in ``[D - window_days + 1, D]`` —
    the rolling-DAU/WAU metric. Returns a Dataset of ``(wday, n_users)``
    over every day inside some key's trailing window (including the
    run-out days after the last event, exactly like the SQL expansion).

    Scale shape: per-batch (key, day) pairs dedupe locally, expand to
    ``window_days`` (key, window-day) cells, and ONE global cell groupby
    dedupes them; a per-batch partial count + ONE tiny (day) groupby sums.
    Raw events never shuffle; cell volume is bounded by
    ``window_days x |key x active-day|``."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        day = np.floor_divide(us, np.int64(86_400_000_000))
        k = batch[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        t = pa.table({"k": pa.array(k, pa.int64()), "day": pa.array(day, pa.int64())})
        d = t.group_by(["k", "day"]).aggregate([])
        kk = np.repeat(d["k"].to_numpy(zero_copy_only=False), window_days)
        dd = np.repeat(d["day"].to_numpy(zero_copy_only=False), window_days)
        off = np.tile(np.arange(window_days, dtype=np.int64), d.num_rows)
        w = pa.table({"k": pa.array(kk, pa.int64()), "wday": pa.array(dd + off, pa.int64())})
        return w.group_by(["k", "wday"]).aggregate([])

    cells = (fast_groupby(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["k", "wday"],
        Count(alias_name="_c"),
    )
        .select_columns(["wday"])
    )

    def partial_count(batch: pa.Table) -> pa.Table:
        g = batch.group_by("wday").aggregate([("wday", "count")])
        return g.rename_columns(["wday", "c"])

    return (fast_groupby(
        cells.map_batches(partial_count, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "wday",
        Sum("c", alias_name="n_users"),
    )
    )


def cumulative_distinct(ds, key: str = "user_id", order_col: str = "ts",
                        val_col: str = "event_type", id_col: str = "event_id"):
    """Running ``COUNT(DISTINCT val) OVER (PARTITION BY key ORDER BY
    order_col)`` — per event, how many distinct values the key has seen so
    far (breadth-of-engagement curves, vocabulary growth). Returns a
    Dataset of ``(key, ts_us, id_col, n_distinct)``, hash-exact vs the SQL
    first-occurrence-flag + running-sum rewrite (DuckDB has no
    COUNT(DISTINCT) window).

    Two metadata-only pinned-block passes:

    1. sort ``(k, v, o)`` — the FIRST row of each (k, v) run is the
       value's introduction; the driver folds a per-(block-edge) carry of
       whether the boundary (k, v) continues from the previous block
       (same shape as debounce's prev-carry).
    2. re-sort the flagged rows by ``(k, o)`` and running-sum the flags
       (exclusive per-key bases folded driver-side, the sessionize plan).

    ``(key, order_col)`` must be globally unique; ``val_col`` non-null.
    """
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[val_col]
        if v.null_count:
            raise ValueError(f"cumulative_distinct: {val_col!r} must be non-null")
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "v": v.cast(pa.string()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    p1 = meta.sort(["k", "v", "o"]).materialize()

    def kv_edges(batch: pa.Table) -> pa.Table:
        cols = {"blo_k": pa.int64(), "blo_v": pa.string(), "blo_o": pa.int64(),
                "lk": pa.int64(), "lv": pa.string()}
        if not batch.num_rows:
            return pa.table({c: pa.array([], t) for c, t in cols.items()})
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "blo_k": pa.array([int(k[0])], pa.int64()),
                "blo_v": pa.array([str(v[0])], pa.string()),
                "blo_o": pa.array([batch["o"][0].as_py()], pa.int64()),
                "lk": pa.array([int(k[-1])], pa.int64()),
                "lv": pa.array([str(v[-1])], pa.string()),
            }
        )

    edges = p1.map_batches(
        kv_edges, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    rows = sorted(edges.itertuples(index=False), key=lambda r: (r.blo_k, r.blo_v, r.blo_o))
    # carry: does each block's FIRST (k, v) continue the previous block's last?
    cont: dict[tuple[int, str, int], bool] = {}
    prev_kv: tuple[int, str] | None = None
    for r in rows:
        cont[(int(r.blo_k), str(r.blo_v), int(r.blo_o))] = prev_kv == (int(r.blo_k), str(r.blo_v))
        prev_kv = (int(r.lk), str(r.lv))
    cont_ref = ray.put(cont)

    def flag(batch: pa.Table) -> pa.Table:
        empty = pa.table({"k": pa.array([], pa.int64()), "o": pa.array([], pa.int64()),
                          "i": pa.array([], pa.int64()), "f": pa.array([], pa.int64())})
        if not batch.num_rows:
            return empty
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        first = np.ones(len(k), dtype=bool)
        first[1:] = (k[1:] != k[:-1]) | (v[1:] != v[:-1])
        if ray.get(cont_ref)[(int(k[0]), str(v[0]), batch["o"][0].as_py())]:
            first[0] = False
        return pa.table({"k": batch["k"], "o": batch["o"], "i": batch["i"],
                         "f": pa.array(first.astype(np.int64), pa.int64())})

    flagged = p1.map_batches(
        flag, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    p2 = flagged.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "fsum")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        f = batch["f"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        c = np.concatenate(([0], np.cumsum(f)))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), batch["o"][0].as_py()), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "fsum": pa.array(c[ends] - c[starts], pa.int64()),
            }
        )

    parts = p2.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, fsum in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(fsum)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    acc: dict[int, int] = {}
    bases: dict[tuple[int, int], dict[int, int]] = {}
    for lo in order:
        snap = {k: acc.get(k, 0) for k, _ in blocks[lo]}
        bases[lo] = snap
        for k, fsum in blocks[lo]:
            acc[k] = acc.get(k, 0) + fsum
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({key: pa.array([], pa.int64()), "ts_us": pa.array([], pa.int64()),
                          id_col: pa.array([], pa.int64()), "n_distinct": pa.array([], pa.int64())})
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        f = batch["f"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        seg_of = np.repeat(np.arange(len(starts)), np.diff(np.concatenate((starts, [n]))))
        c = np.cumsum(f)
        seg_base = np.concatenate(([0], c[starts[1:] - 1]))
        within = c - seg_base[seg_of]
        kb = np.array([base[int(kk)] for kk in k[starts]], dtype=np.int64)
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "n_distinct": pa.array(within + kb[seg_of], pa.int64()),
            }
        )

    return p2.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def churned_users(ds, key: str = "user_id", ts_col: str = "ts",
                  period_us: int = 7 * 86_400_000_000):
    """Per-period churn: how many keys were active in period ``p`` but NOT
    in ``p + 1`` (the complement of cohort retention's diagonal). Returns
    a Dataset of ``(period, n_active, n_churned)`` — for the corpus' last
    active period every key counts as churned, exactly like the SQL
    anti-join mirror (filter the last period downstream if you prefer the
    censored convention).

    Scale shape: per-batch (key, period) pairs dedupe locally, ONE cell
    groupby dedupes globally, then a per-key ``map_groups`` fold over the
    key's period list (calendar-bounded) emits (period, churn) flags and
    ONE tiny (period) groupby sums."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    if period_us < 1:
        raise ValueError(f"period_us must be >= 1, got {period_us}")

    def prep(batch: pa.Table) -> pa.Table:
        us = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        per = np.floor_divide(us, np.int64(period_us))
        t = pa.table({"k": batch[key].cast(pa.int64()), "p": pa.array(per, pa.int64())})
        return t.group_by(["k", "p"]).aggregate([])

    cells = (fast_groupby(
        ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["k", "p"],
        Count(alias_name="_c"),
    )
        .select_columns(["k", "p"])
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        p = np.sort(g["p"].to_numpy(np.int64))
        nxt = np.zeros(len(p), dtype=bool)
        nxt[:-1] = p[1:] == p[:-1] + 1
        return pd.DataFrame({"p": p, "act": np.ones(len(p), dtype=np.int64),
                             "churn": (~nxt).astype(np.int64)})

    flags = cells.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())
    out = (fast_groupby(
        flags.map_batches(
            lambda t: pa.table({"period": t["p"].cast(pa.int64()),
                                "act": t["act"].cast(pa.int64()),
                                "churn": t["churn"].cast(pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "period",
        Sum("act", alias_name="n_active"), Sum("churn", alias_name="n_churned"),
    )
    )
    return out


def clamped_running_balance(ds, key: str = "user_id", order_col: str = "ts",
                            id_col: str = "event_id", units_col: str = "units"):
    """Floor-at-zero running balance per key: ``b_i = max(b_{i-1} + x_i, 0)``
    over ``PARTITION BY key ORDER BY order_col`` — the inventory/wallet scan
    (withdrawals can't take the balance negative). Returns a Dataset of
    ``(key, ts_us, id_col, balance_units)``.

    The clamp looks sequential, but the reflection identity

        b_i = S_i - min(0, min_{j<=i} S_j)

    (S = plain running sum) rewrites it as TWO associative scans — a running
    sum and a running min — so the op reuses ``analytic_over``'s
    metadata-only pinned-sorted-block plan: pass A ships one row per
    (block, key) with the block's unit sum and the min of its within-block
    prefix sums; the driver folds per-key exclusive bases (S_base,
    m_base = min(0, global prefix-min so far)); pass B re-reads the SAME
    pinned blocks and emits ``(S_base + p_t) - min(m_base, S_base + r_t)``
    with p/r the vectorized in-block prefix sum / prefix min.

    ``units_col`` must be a pre-signed exact int64 flow (quantize floats
    upstream — the analytic_over rule; never a float cumsum). ``(key,
    order_col)`` must be globally unique. Per-row |units| < 2^31 guards the
    int64 prefix sums (loud)."""
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[units_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if len(v) and np.abs(v).max() >= np.int64(1) << 31:
            raise ValueError("|units| must stay < 2^31 per row (int64 prefix-sum guard)")
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[order_col].cast(pa.timestamp("us")).cast(pa.int64()),
                "i": batch[id_col].cast(pa.int64()),
                "v": pa.array(v, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "vsum", "minp")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [len(k)]))
        c = np.cumsum(v)
        seg_base = np.concatenate(([0], c[starts[1:] - 1]))
        p = c - np.repeat(seg_base, ends - starts)  # in-segment inclusive prefix sums
        minp = np.minimum.reduceat(p, starts)
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), batch["o"][0].as_py()), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "vsum": pa.array(c[ends - 1] - seg_base, pa.int64()),
                "minp": pa.array(minp, pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, vsum, minp in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(vsum), int(minp)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    # per-key fold state: (S = prefix sum so far, m = min(0, prefix-min so far))
    acc: dict[int, tuple[int, int]] = {}
    bases: dict[tuple[int, int], dict[int, tuple[int, int]]] = {}
    for lo in order:
        snap = {k: acc.get(k, (0, 0)) for k, _, _ in blocks[lo]}
        bases[lo] = snap
        for k, vsum, minp in blocks[lo]:
            s_prev, m_prev = acc.get(k, (0, 0))
            acc[k] = (s_prev + vsum, min(m_prev, s_prev + minp))
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "balance_units": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        i = batch["i"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        lengths = ends - starts
        seg_of = np.repeat(np.arange(len(starts)), lengths)
        c = np.cumsum(v)
        seg_base = np.concatenate(([0], c[starts[1:] - 1]))
        p = c - seg_base[seg_of]
        r = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):  # per-segment running min (bounded by keys-per-block)
            np.minimum.accumulate(p[s:e], out=r[s:e])
        s_base = np.array([base[int(kk)][0] for kk in k[starts]], dtype=np.int64)[seg_of]
        m_base = np.array([base[int(kk)][1] for kk in k[starts]], dtype=np.int64)[seg_of]
        bal = (s_base + p) - np.minimum(m_base, s_base + r)
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                "ts_us": pa.array(o, pa.int64()),
                id_col: pa.array(i, pa.int64()),
                "balance_units": pa.array(bal, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def out_of_order_events(ds, key: str = "user_id", seq_col: str = "event_id",
                        ts_col: str = "ts", lateness_us: int = 0):
    """Watermark-style disorder detection: replaying each key's stream in
    ``seq_col`` (arrival) order, flag every event whose timestamp sits more
    than ``lateness_us`` BEHIND the running max of the timestamps that
    arrived before it — the events a streaming window with that allowed
    lateness would drop. Returns a Dataset of
    ``(key, seq_col, ts_us, late)`` with ``late`` an int64 0/1 flag.

    Plan (the clamped_running_balance shape): only (key, seq, ts) int64
    metadata sorts by (key, seq); pass A ships one row per (block,
    key-segment) with the segment's max ts; the driver folds per-key
    exclusive running maxima (INT64_MIN seed — a key's first-ever event is
    never late); pass B re-reads the SAME pinned blocks and compares each
    ts against max(base, exclusive in-segment prefix max). ``(key,
    seq_col)`` must be globally unique (loud guards at both stages).
    """
    import numpy as np
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "o": batch[seq_col].cast(pa.int64()),
                "t": batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["k", "o"]).materialize()
    lo_seed = np.iinfo(np.int64).min

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("blo_k", "blo_o", "k", "tmax")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        t = batch["t"].to_numpy(zero_copy_only=False)
        if len(k) > 1 and ((k[1:] == k[:-1]) & (o[1:] == o[:-1])).any():
            raise ValueError(f"out_of_order_events: duplicate ({key!r}, {seq_col!r}) pairs")
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        return pa.table(
            {
                "blo_k": pa.array(np.full(len(starts), k[0]), pa.int64()),
                "blo_o": pa.array(np.full(len(starts), o[0]), pa.int64()),
                "k": pa.array(k[starts], pa.int64()),
                "tmax": pa.array(np.maximum.reduceat(t, starts), pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    blocks: dict[tuple[int, int], list] = {}
    for blo_k, blo_o, k, tmax in parts.itertuples(index=False):
        blocks.setdefault((int(blo_k), int(blo_o)), []).append((int(k), int(tmax)))
    order = sorted(blocks)
    for a, b in zip(order, order[1:]):
        if blocks[a][-1][0] > b[0]:
            raise ValueError("sorted metadata blocks overlap — sort produced non-disjoint ranges")
    acc: dict[int, int] = {}
    bases: dict[tuple[int, int], dict[int, int]] = {}
    for lo in order:
        bases[lo] = {k: acc.get(k, lo_seed) for k, _ in blocks[lo]}
        for k, tmax in blocks[lo]:
            acc[k] = max(acc.get(k, lo_seed), tmax)
    bases_ref = ray.put(bases)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                key: pa.array([], pa.int64()),
                seq_col: pa.array([], pa.int64()),
                "ts_us": pa.array([], pa.int64()),
                "late": pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        base = ray.get(bases_ref)[(batch["k"][0].as_py(), batch["o"][0].as_py())]
        k = batch["k"].to_numpy(zero_copy_only=False)
        o = batch["o"].to_numpy(zero_copy_only=False)
        t = batch["t"].to_numpy(zero_copy_only=False)
        n = len(k)
        starts = np.concatenate(([0], np.flatnonzero(k[1:] != k[:-1]) + 1))
        ends = np.concatenate((starts[1:], [n]))
        run = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):  # per-segment inclusive running max (bounded by keys-per-block)
            np.maximum.accumulate(t[s:e], out=run[s:e])
        excl = np.empty(n, dtype=np.int64)
        b = np.array([base[int(kk)] for kk in k[starts]], dtype=np.int64)
        for j, (s, e) in enumerate(zip(starts, ends)):
            excl[s] = b[j]
            if e - s > 1:
                excl[s + 1:e] = np.maximum(run[s:e - 1], b[j])
        # lateness in exact int64 us; the INT64_MIN seed can never flag (and
        # the subtraction only runs on seeded rows — no int64 wrap)
        late = np.zeros(n, dtype=np.int64)
        m = excl != lo_seed
        late[m] = (t[m] < excl[m] - np.int64(lateness_us)).astype(np.int64)
        return pa.table(
            {
                key: pa.array(k, pa.int64()),
                seq_col: pa.array(o, pa.int64()),
                "ts_us": pa.array(t, pa.int64()),
                "late": pa.array(late, pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def time_weighted_avg(ds, key: str = "user_id", ts_col: str = "ts",
                      value_col: str = "value", value_scale: int = 100):
    """Time-weighted average per key (TWAP): each value holds until the
    key's NEXT event, so the average weights every value by its duration —
    the metric that raw AVG gets wrong on irregular sampling. Exactly SQL
    ``sum(u * (lead(t) - t)) / sum(lead(t) - t)`` per key over exact
    integer units ``u = floor(value*scale + 0.5)`` and microsecond epochs.

    Plan: only ``(key, ts_us, u)`` meta cells shuffle (rows never move);
    each key folds in its own worker over its sorted events — a key costs
    its event count, not the corpus. Timestamps must be unique per key
    (loud guard). Exact-int contract: sum(u*dt) <= max(u) * span(key), so
    ONE guard max_u * total_dt < 2^62 covers every partial; the two sums
    stay int64 and ``twap = CAST(num AS DOUBLE)/CAST(dt AS DOUBLE)/scale``
    is mirrored op-for-op by the SQL oracle. Keys with a single event emit
    no row (SQL's ``WHERE lead IS NOT NULL`` drops them). Returns a Dataset
    of ``(key, n_seg, dt_us, num_units, twap)``.
    """
    import numpy as np
    import pandas as pd

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for time_weighted_avg")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "t": pa.array(t, pa.int64()),
                "u": pa.array(u, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    scale_d = np.float64(value_scale)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("t", kind="mergesort")
        t = df["t"].to_numpy(dtype=np.int64)
        u = df["u"].to_numpy(dtype=np.int64)
        if len(t) > 1 and (np.diff(t) == 0).any():
            raise ValueError(
                f"time_weighted_avg: duplicate {ts_col!r} within key {df['k'].iloc[0]!r}"
            )
        if len(t) < 2:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype="int64"),
                    "n_seg": pd.Series([], dtype="int64"),
                    "dt_us": pd.Series([], dtype="int64"),
                    "num_units": pd.Series([], dtype="int64"),
                    "twap": pd.Series([], dtype="float64"),
                }
            )
        dt = t[1:] - t[:-1]
        total_dt = int(t[-1] - t[0])
        max_u = int(np.abs(u).max())
        if max_u * total_dt >= 1 << 62:
            raise ValueError("time_weighted_avg: max(u) * span exceeds the exact-int guard")
        num = int((u[:-1] * dt).sum())  # bounded by max_u * total_dt — no wrap
        # mirrored op-for-op by the SQL oracle (left-assoc double divisions)
        twap = float(np.float64(num) / np.float64(total_dt) / scale_d)
        return pd.DataFrame(
            {
                key: [np.int64(df["k"].iloc[0])],
                "n_seg": [np.int64(len(t) - 1)],
                "dt_us": [np.int64(total_dt)],
                "num_units": [np.int64(num)],
                "twap": [twap],
            }
        )

    return meta.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())


def rebase_to_first(ds, key: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", value_scale: int = 100):
    """Index a per-key series to its FIRST value (first = 100.0) — the
    comparable-growth normalization for cohorts/tickers whose absolute
    levels differ. Exactly SQL ``CAST(u AS DOUBLE) /
    CAST(first_value(u) OVER (PARTITION BY key ORDER BY ts) AS DOUBLE)
    * 100.0`` over exact integer units.

    Same meta plan as time_weighted_avg: only ``(key, ts_us, u)`` cells
    shuffle, each key folds sorted in its own worker. Timestamps must be
    unique per key and the first unit non-zero (both loud). Returns a
    Dataset of ``(key, ts_us, u, idx)``.
    """
    import numpy as np
    import pandas as pd

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for rebase_to_first")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "ts_us": pa.array(t, pa.int64()),
                "u": pa.array(u, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    hundred = np.float64(100.0)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
        t = df["ts_us"].to_numpy(dtype=np.int64)
        u = df["u"].to_numpy(dtype=np.int64)
        if len(t) > 1 and (np.diff(t) == 0).any():
            raise ValueError(
                f"rebase_to_first: duplicate {ts_col!r} within key {df['k'].iloc[0]!r}"
            )
        base = int(u[0])
        if base == 0:
            raise ValueError(f"rebase_to_first: first unit is 0 for key {df['k'].iloc[0]!r}")
        # mirrored op-for-op by the SQL oracle: (u / first) * 100.0
        idx = (u.astype(np.float64) / np.float64(base)) * hundred
        return pd.DataFrame(
            {key: df["k"].astype("int64"), "ts_us": t, "u": u, "idx": idx}
        )

    return meta.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())


def pct_change_over(ds, key: str = "user_id", ts_col: str = "ts",
                    value_col: str = "value", value_scale: int = 100):
    """Per-key percent change between consecutive observations — exactly
    SQL ``(CAST(u AS DOUBLE) / CAST(lag(u) OVER w AS DOUBLE) - 1.0) *
    100.0`` over exact integer units; each key's FIRST row emits no output
    (lag is null). Same (key, ts_us, u) meta-cell plan and unique-(key,
    ts) guard as rebase_to_first; zero previous units raise loudly (the
    SQL division would be inf/NaN — hash-fragile). Returns a Dataset of
    ``(key, ts_us, u, prev_u, pct)``.
    """
    import numpy as np
    import pandas as pd

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        if batch[value_col].null_count or np.isnan(v).any():
            raise ValueError(f"{value_col!r} must be non-null for pct_change_over")
        u = np.floor(v * value_scale + 0.5).astype(np.int64)
        t = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": batch[key].cast(pa.int64()),
                "ts_us": pa.array(t, pa.int64()),
                "u": pa.array(u, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    hundred = np.float64(100.0)
    one = np.float64(1.0)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("ts_us", kind="mergesort").reset_index(drop=True)
        t = df["ts_us"].to_numpy(dtype=np.int64)
        u = df["u"].to_numpy(dtype=np.int64)
        if len(t) > 1 and (np.diff(t) == 0).any():
            raise ValueError(
                f"pct_change_over: duplicate {ts_col!r} within key {df['k'].iloc[0]!r}"
            )
        if len(t) < 2:
            return pd.DataFrame(
                {
                    key: pd.Series([], dtype="int64"),
                    "ts_us": pd.Series([], dtype="int64"),
                    "u": pd.Series([], dtype="int64"),
                    "prev_u": pd.Series([], dtype="int64"),
                    "pct": pd.Series([], dtype="float64"),
                }
            )
        prev = u[:-1]
        cur = u[1:]
        if (prev == 0).any():
            raise ValueError(
                f"pct_change_over: zero previous unit within key {df['k'].iloc[0]!r}"
            )
        # mirrored op-for-op by the SQL oracle
        pct = (cur.astype(np.float64) / prev.astype(np.float64) - one) * hundred
        return pd.DataFrame(
            {
                key: df["k"].iloc[1:].astype("int64").to_numpy(),
                "ts_us": t[1:],
                "u": cur,
                "prev_u": prev,
                "pct": pct,
            }
        )

    return meta.groupby("k").map_groups(fold, batch_format="pandas", **remote_args())
