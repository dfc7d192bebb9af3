"""Deterministic sampling: hash splits and stratified samples.

Both use the Knuth multiplicative hash ``h(k) = (k * 2654435761) mod 2^32``
over an integer key — reproducible across runs, languages, and engines (the
same expression is plain SQL), unlike salted ``hash()`` or RNG state tied to
partitioning. Requires ``key * 2654435761 < 2^64`` (key < ~7e9); for wider
or string keys, hash to an int column first (``text.content_hash``) and
accept engine-specific parity.

``hash_split`` is embarrassingly parallel (a stateless vectorized filter —
the right shape for train/val/test splits at any scale). ``stratified_sample``
takes exactly ``k`` rows per stratum with a METADATA-ONLY shuffle: per-batch
top-k partials (``<= k`` rows per stratum per batch, (stratum, key, hash)
triples only) feed a tiny per-stratum groupby, and the winners are broadcast
back as a semi-join filter — full rows never shuffle and no group ever holds
a whole stratum, so a hot stratum (half the corpus from one source) costs
the same as a cold one.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

from .fastagg import fast_groupby

KNUTH = np.uint64(2654435761)
_M32 = np.uint64(1) << np.uint64(32)


def knuth_hash(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized ``((key + salt) * 2654435761) mod 2^32`` as uint64."""
    k = keys.astype(np.uint64) + np.uint64(salt)
    return (k * KNUTH) % _M32


def hash_split(ds, rate_pct: int, key: str = "doc_id", buckets: int = 100, salt: int = 0):
    """Keep rows whose hash bucket < ``rate_pct`` (of ``buckets``): a
    deterministic ~rate_pct% sample / split, as a stateless streaming
    filter."""
    if not 0 <= rate_pct <= buckets:
        raise ValueError(f"rate_pct must be in [0, {buckets}], got {rate_pct}")

    def keep(batch: pa.Table) -> pa.Table:
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        return batch.filter(pa.array((h % np.uint64(buckets)) < np.uint64(rate_pct)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def _topk_per_stratum(strata: np.ndarray, keys: np.ndarray, hashes: np.ndarray, k) -> np.ndarray:
    """Row indices of the ``k`` smallest ``(hash, key)`` pairs per stratum
    (vectorized: one lexsort + group-boundary ranks, no Python loop).
    ``k`` is a scalar, or an int array indexed by stratum CODE for
    per-stratum quotas (temperature_sample)."""
    order = np.lexsort((keys, hashes, strata))
    s = strata[order]
    group_start = np.zeros(len(s), dtype=np.int64)
    if len(s) > 1:
        boundaries = np.flatnonzero(s[1:] != s[:-1]) + 1
        group_start[boundaries] = boundaries
        np.maximum.accumulate(group_start, out=group_start)
    rank = np.arange(len(s)) - group_start
    cut = k if np.isscalar(k) else np.asarray(k, dtype=np.int64)[s]
    return order[rank < cut]


def stratified_sample(ds, k: int, stratum: str = "source", key: str = "doc_id", salt: int = 0):
    """Exactly min(k, |stratum|) rows per stratum, chosen by ascending
    ``(hash(key), key)`` — a deterministic uniform draw within each stratum.
    Returns a Dataset of the sampled rows (all input columns).

    Plan (metadata-only; see module docstring): (1) per-batch combiner emits
    at most ``k`` (stratum, key, hash) triples per stratum per batch;
    (2) one groupby over those partials (``<= k x n_blocks`` rows per
    stratum) picks the global winners; (3) the winner (stratum, key) pairs —
    ``n_strata x k`` ints, small by the semantics of the op — broadcast once
    via ``ray.put`` and filter the full rows as a vectorized semi-join.
    Keys must be unique within a stratum (duplicate keys would make "the k-th
    smallest" ambiguous and the filter would return every tied row).

    ``k`` may also be a ``{stratum_value: quota}`` dict for per-stratum
    quotas (strata missing from the dict contribute nothing) — the
    mechanism behind `temperature_sample`."""
    import ray

    k_by_name = None
    if isinstance(k, dict):
        if any(v < 0 for v in k.values()):
            raise ValueError("per-stratum quotas must be >= 0")
        k_by_name = k
    elif k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # keep the empty-block schema typed
            return pa.table({stratum: batch[stratum], key: batch[key], "_h": pa.array([], pa.uint64())})
        if batch[stratum].null_count:
            # a null stratum would silently vanish (factorize gives it -1,
            # the winner groupby drops it) — refuse loudly instead of
            # returning a biased sample; fill or filter nulls first
            raise ValueError(f"stratified_sample: stratum column {stratum!r} contains nulls")
        keys_np = batch[key].to_numpy(zero_copy_only=False)
        strata_np = batch[stratum].to_numpy(zero_copy_only=False)
        h = knuth_hash(keys_np, salt)
        codes, uniques = pd.factorize(strata_np)
        kk = k if k_by_name is None else np.array(
            [k_by_name.get(u, 0) for u in uniques], dtype=np.int64
        )
        idx = _topk_per_stratum(codes, keys_np, h, kk)
        return pa.table(
            {
                stratum: pa.array(strata_np[idx]),
                key: pa.array(keys_np[idx]),
                "_h": pa.array(h[idx], pa.uint64()),
            }
        )

    def pick(group: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((group[key].to_numpy(), group["_h"].to_numpy()))
        kk = k if k_by_name is None else k_by_name.get(group[stratum].iloc[0], 0)
        return group.iloc[order[:kk]][[stratum, key]]

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    winners = partials.groupby(stratum).map_groups(pick, batch_format="pandas", **remote_args())
    win_tables = list(winners.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not win_tables:  # empty input -> empty sample, not a concat crash
        return ds.map_batches(
            lambda t: t.slice(0, 0), batch_format="pyarrow", zero_copy_batch=True, **remote_args()
        )
    win_df = pa.concat_tables(win_tables).to_pandas()
    by_stratum = {
        s: np.sort(g[key].to_numpy())
        for s, g in win_df.groupby(stratum, sort=False)
    }
    ref = ray.put(by_stratum)

    def keep(batch: pa.Table) -> pa.Table:
        chosen = ray.get(ref)
        keys_np = batch[key].to_numpy(zero_copy_only=False)
        strata_np = batch[stratum].to_numpy(zero_copy_only=False)
        mask = np.zeros(len(keys_np), dtype=bool)
        for s in pd.unique(strata_np):
            ids = chosen.get(s)
            if ids is None or not len(ids):
                continue
            sel = np.flatnonzero(strata_np == s)
            pos = np.minimum(np.searchsorted(ids, keys_np[sel]), len(ids) - 1)
            mask[sel] = ids[pos] == keys_np[sel]
        return batch.filter(pa.array(mask))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


_W_SCALE = 1 << 20  # sqrt weights quantized to 2^-20 — exact in float64


def temperature_quotas(counts: dict, budget: int) -> dict:
    """Per-stratum quotas for temperature-0.5 mixture sampling: quota_s =
    min(n_s, ceil(budget * w_s / W)) with INTEGER weights w_s =
    floor(sqrt(n_s) * 2^20). Every step is exact and engine-reproducible:
    sqrt is IEEE-correctly-rounded in numpy AND DuckDB, multiply by 2^20 is
    exact, floor exact, and the sum/ceil-div are integer arithmetic (no
    float summation order to disagree on) — so plain SQL derives the same
    quotas from the same counts. Up-weights rare strata relative to
    proportional sampling (the multilingual data-mixing rule)."""
    import math

    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    ws = {s: int(math.floor(math.sqrt(float(n)) * _W_SCALE)) for s, n in counts.items()}
    total_w = sum(ws.values())
    if total_w == 0:
        return {s: 0 for s in counts}
    if budget * max(ws.values()) >= 1 << 62:
        raise ValueError("temperature_quotas: budget * weight would overflow int64")
    return {
        s: min(int(counts[s]), (budget * ws[s] + total_w - 1) // total_w)
        for s in counts
    }


def temperature_sample(ds, budget: int, stratum: str = "source", key: str = "doc_id", salt: int = 0):
    """Temperature-scaled mixture sampling (alpha = 0.5): draw ~budget rows
    total with per-stratum quotas proportional to sqrt(stratum size) —
    rare sources keep more of their data than proportional sampling would
    give them, hot sources are capped (the standard multilingual-corpus
    mixing rule). Selection within a stratum is the deterministic
    ``(knuth_hash(key), key)`` draw of `stratified_sample`; quotas come
    from `temperature_quotas` (integer-exact, SQL-replayable — see its
    docstring).

    Plan: ONE metadata-only count groupby (|strata| rows to the driver),
    then the stratified top-k plan with a per-stratum quota dict — full
    rows never shuffle. Returns the sampled Dataset."""
    counts_df = ds.groupby(stratum).count().to_pandas()
    counts = dict(zip(counts_df[stratum], counts_df["count()"].astype(int)))
    quotas = temperature_quotas(counts, budget)
    return stratified_sample(ds, quotas, stratum=stratum, key=key, salt=salt)


def deterministic_shuffle(ds, key: str = "doc_id", salt: int = 0):
    """Seeded, reproducible global shuffle — the per-epoch corpus reorder of
    a training pipeline. Rows are ordered by ``(knuth_hash(key + salt),
    key)``: the same salt reproduces the byte-identical permutation on any
    cluster size / block layout (unlike ``random_shuffle``, whose RNG state
    is tied to partitioning), and each salt gives an independent epoch
    order. Cost is ONE range-partitioned sort over a 4-byte derived key —
    the same exchange ``random_shuffle`` pays, but resumable and auditable
    (the order is plain SQL: ``ORDER BY ((key+salt)*2654435761) % 2^32,
    key``). Ties (hash collisions) break by ``key``, so the order is total
    whenever keys are unique."""

    def add_h(batch: pa.Table) -> pa.Table:
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        return batch.append_column("_epoch_h", pa.array(h.astype(np.int64), pa.int64()))

    out = ds.map_batches(add_h, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return out.sort(["_epoch_h", key]).drop_columns(["_epoch_h"])


def select_by_budget(
    ds,
    budget: int,
    score: str = "score",
    key: str = "doc_id",
    ntok: str = "n_tok",
    key_bits: int = 40,
    max_score: int | None = None,
):
    """Greedy best-score-first data selection under a global token budget:
    take whole documents in ``(score DESC, key ASC)`` order while the
    running token total stays ``<= budget`` — the "spend N tokens on the
    highest-quality data" step of corpus curation. SQL-equivalent:
    ``SUM(n_tok) OVER (ORDER BY score DESC, key) <= budget``.

    Plan (metadata-only; full rows never shuffle — semi-join the returned
    keys back if you need the text):

    1. project ``(composite, key, n_tok)`` where ``composite = (max_score -
       score) << key_bits | key`` (one int64 whose ascending order IS the
       selection order);
    2. range-partitioned ``sort`` of the metadata + ``materialize`` to pin
       the sorted blocks (~24 B/doc of spillable object store);
    3. pass A: one ``(lo, hi, tok_sum, n)`` row per block — the driver sees
       ``n_blocks`` rows, checks the ranges are disjoint (duplicate-key /
       split-block defense), and broadcasts the exclusive per-block token
       offsets;
    4. pass B over the SAME pinned blocks: local cumsum + offset, keep rows
       with ``cum <= budget``.

    ``score`` must be int64 in ``[0, max_score]`` (quantize floats first,
    e.g. ``floor(q * 10**6)``); ``key`` non-negative ``< 2**key_bits``.
    ``max_score=None`` costs one extra aggregate pass over ``ds`` — pass
    the known quantization bound to skip it. Returns a Dataset of
    ``(key, score, n_tok)`` for the selected docs."""
    import ray
    import ray.data

    if budget < 0:
        raise ValueError(f"budget must be non-negative, got {budget}")
    if max_score is None:
        max_score = ds.max(score)
        if max_score is None:
            return ray.data.from_arrow(
                pa.table({key: pa.array([], pa.int64()), score: pa.array([], pa.int64()), ntok: pa.array([], pa.int64())})
            )
    max_score = int(max_score)
    if (max_score + 1) << key_bits >= 1 << 63:
        raise ValueError(f"(max_score+1) << key_bits overflows int64: {max_score} << {key_bits}")

    def to_meta(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)
        sc = batch[score].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(keys):
            if keys.min() < 0 or keys.max() >= 1 << key_bits:
                raise ValueError(f"{key!r} must be in [0, 2**{key_bits})")
            if sc.min() < 0 or sc.max() > max_score:
                raise ValueError(f"{score!r} must be in [0, {max_score}]")
            if toks.min() < 0:
                raise ValueError(f"negative {ntok!r} values corrupt the prefix sum")
        comp = ((np.int64(max_score) - sc) << np.int64(key_bits)) | keys
        return pa.table(
            {
                "composite": pa.array(comp, pa.int64()),
                key: pa.array(keys, pa.int64()),
                ntok: pa.array(toks, pa.int64()),
            }
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort("composite").materialize()

    def block_range(batch: pa.Table) -> pa.Table:
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        if not len(comp):
            return pa.table({c: pa.array([], pa.int64()) for c in ("lo", "hi", "tok_sum", "n")})
        return pa.table(
            {
                "lo": pa.array([int(comp[0])], pa.int64()),
                "hi": pa.array([int(comp[-1])], pa.int64()),
                "tok_sum": pa.array([int(batch[ntok].to_numpy(zero_copy_only=False).sum())], pa.int64()),
                "n": pa.array([batch.num_rows], pa.int64()),
            }
        )

    ranges = pinned.map_batches(
        block_range, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    ranges = ranges.sort_values("lo").reset_index(drop=True)
    lo = ranges["lo"].to_numpy()
    hi = ranges["hi"].to_numpy()
    if len(lo) and (np.any(lo > hi) or np.any(hi[:-1] >= lo[1:])):
        raise ValueError("sorted metadata blocks overlap — duplicate (score, key) pairs break the prefix sum")
    tok = ranges["tok_sum"].to_numpy().astype(np.int64)
    bases = {int(l): int(b) for l, b in zip(lo, np.concatenate(([0], np.cumsum(tok)[:-1])))}
    bases_ref = ray.put(bases)

    def pick(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({key: pa.array([], pa.int64()), score: pa.array([], pa.int64()), ntok: pa.array([], pa.int64())})
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        if np.any(comp[1:] <= comp[:-1]):
            raise ValueError("block not sorted by composite — pinned block drifted")
        base = ray.get(bases_ref)[int(comp[0])]
        toks = batch[ntok].to_numpy(zero_copy_only=False)
        cum = base + np.cumsum(toks)
        sel = cum <= budget
        return pa.table(
            {
                key: pa.array(comp[sel] & ((np.int64(1) << np.int64(key_bits)) - 1), pa.int64()),
                score: pa.array(np.int64(max_score) - (comp[sel] >> np.int64(key_bits)), pa.int64()),
                ntok: pa.array(toks[sel].astype(np.int64), pa.int64()),
            }
        )

    return pinned.map_batches(
        pick, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def mixture_sample(ds, rates: dict[str, int], stratum: str = "source", key: str = "doc_id", buckets: int = 100, salt: int = 0):
    """Composition-weighted mixture: keep each stratum at its own rate
    (``rates[stratum]`` of ``buckets``; strata absent from ``rates`` drop
    entirely) — the training-data mixing step (e.g. books at 100%, web at
    35%). Same Knuth hash as ``hash_split``, so a given row's fate is stable
    as rates change AND nested splits stay consistent across strata. The
    (tiny) rate dict ships inside the task closure; the filter itself is a
    stateless vectorized pass — no shuffle at any scale."""
    bad = {s: r for s, r in rates.items() if not 0 <= r <= buckets}
    if bad:
        raise ValueError(f"rates must be in [0, {buckets}]: {bad}")

    def keep(batch: pa.Table) -> pa.Table:
        pct = (
            pd.Series(batch[stratum].to_numpy(zero_copy_only=False))
            .map(rates)
            .fillna(0)
            .to_numpy(np.uint64)
        )
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        return batch.filter(pa.array((h % np.uint64(buckets)) < pct))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def weighted_sample(ds, key: str = "doc_id", weight_col: str = "w", salt: int = 0):
    """Deterministic per-row weighted (importance) sampling: keep a row iff
    ``knuth_hash(key + salt) < floor(weight * 2^32)`` — each row survives
    independently with probability ~``weight`` (clip weights to [0, 1]),
    reproducibly on any cluster size, auditable in plain SQL with the SAME
    integer compare (``((key+salt)*2654435761) % 4294967296 <
    CAST(floor(weight * 4294967296) AS BIGINT)``). The threshold is ONE
    float64 multiply + floor — identical doubles on both engines, so parity
    is exact. A stateless vectorized filter: no shuffle, no state, streams.
    """

    def fn(batch: pa.Table) -> pa.Table:
        k = batch[key].cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = batch[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        thr = np.floor(w * 4294967296.0).astype(np.int64)
        keep = knuth_hash(k, salt).astype(np.int64) < thr
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def split_leakage_report(ds, rate_pct: int, key: str = "doc_id", attr: str = "text",
                         buckets: int = 100, salt: int = 0):
    """Train/test contamination audit for a [[hash_split]] partition: the
    ``attr`` values that land on BOTH sides of the split. With attr=text
    this catches duplicate documents leaking eval text into training; with
    an entity column (user id, part key) it catches ENTITY leakage — the
    classic eval-inflation bug where the same entity's rows straddle the
    split. Returns a Dataset of ``(attr, n_train, n_test)`` — leaked
    values only.

    Same Knuth multiplicative hash as hash_split (exact SQL parity; never
    salted hash() or RNG). Plan: per-batch (attr, in_split) count cells
    pre-aggregate duplicates BEFORE the one groupby (distinct attr values
    move once, at most once per batch); the both-sides filter is a
    stateless map. Counts are exact ints.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    if not 0 <= rate_pct <= buckets:
        raise ValueError(f"rate_pct must be in [0, {buckets}], got {rate_pct}")

    def cells(batch: pa.Table) -> pa.Table:
        if batch[attr].null_count or batch[key].null_count:
            raise ValueError("split_leakage_report: null attr/key values")
        h = knuth_hash(batch[key].to_numpy(zero_copy_only=False), salt)
        tr = ((h % np.uint64(buckets)) < np.uint64(rate_pct)).astype(np.int64)
        t = pa.table({attr: batch[attr].combine_chunks(),
                      "n_train": pa.array(tr), "n_test": pa.array(1 - tr)})
        out = t.group_by(attr).aggregate([("n_train", "sum"), ("n_test", "sum")])
        return out.rename_columns([attr, "n_train", "n_test"])

    folded = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        attr,
        Sum("n_train", alias_name="n_train"), Sum("n_test", alias_name="n_test"),
    )
    )

    def leaked(batch: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater(batch["n_train"], 0), pc.greater(batch["n_test"], 0))
        return batch.filter(keep)

    return folded.map_batches(leaked, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def select_by_budget_grouped(
    ds,
    budgets: dict,
    group: str = "source",
    score: str = "score",
    key: str = "doc_id",
    ntok: str = "n_tok",
    key_bits: int = 36,
    max_score: int | None = None,
):
    """Per-group budgeted selection: within EACH group, take whole docs in
    ``(score DESC, key ASC)`` order while that group's running token total
    stays ``<= budgets[group]`` — the mixture-construction step ("spend 2B
    tokens on web, 500M on code, ...") of corpus curation. SQL-equivalent:
    ``SUM(n_tok) OVER (PARTITION BY group ORDER BY score DESC, key) <=
    budget``.

    Same pinned-sorted-block plan as ``select_by_budget`` (metadata only;
    value-keyed offsets, order-safe under completion-order execution) with
    the group index in the composite's TOP bits, so one global sort yields
    per-group contiguous runs; pass A emits one (run_lo, tok_sum) row per
    group-run per block, the driver folds per-group exclusive offsets
    keyed by the run's first composite (unique — composites are), pass B
    cumsums each run locally. Rows whose group is not in ``budgets`` drop.

    Bit budget: ``len(budgets) * (max_score+1) << key_bits`` must stay
    below 2^63 — with the default 36 key bits there is room for ~1e6
    quantized score levels x ~100 groups. Returns a Dataset of
    ``(group, key, score, n_tok)``."""
    import ray
    import ray.data

    if not budgets:
        raise ValueError("budgets must name at least one group")
    for g, b in budgets.items():
        if b < 0:
            raise ValueError(f"budget for group {g!r} is negative")
    groups = sorted(budgets)
    gidx_of = {g: i for i, g in enumerate(groups)}
    budget_by_idx = np.array([int(budgets[g]) for g in groups], np.int64)

    if max_score is None:
        max_score = ds.max(score)
        if max_score is None:
            return ray.data.from_arrow(
                pa.table(
                    {
                        group: pa.array([], pa.string()),
                        key: pa.array([], pa.int64()),
                        score: pa.array([], pa.int64()),
                        ntok: pa.array([], pa.int64()),
                    }
                )
            )
    max_score = int(max_score)
    span = (max_score + 1) << key_bits
    if len(groups) * span >= 1 << 63:
        raise ValueError(
            f"{len(groups)} groups x (max_score+1)<<{key_bits} overflows int64 — "
            "lower key_bits or quantize scores coarser"
        )
    maps_ref = ray.put((gidx_of, np.asarray(groups, dtype=object), budget_by_idx))

    def to_meta(batch: pa.Table) -> pa.Table:
        gmap, _, _ = ray.get(maps_ref)
        gcol = batch[group].to_pylist()
        gi = np.array([gmap.get(g, -1) for g in gcol], np.int64)
        keep = gi >= 0
        keys = batch[key].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        sc = batch[score].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
        gi = gi[keep]
        if len(keys):
            if keys.min() < 0 or keys.max() >= 1 << key_bits:
                raise ValueError(f"{key!r} must be in [0, 2**{key_bits})")
            if sc.min() < 0 or sc.max() > max_score:
                raise ValueError(f"{score!r} must be in [0, {max_score}]")
            if toks.min() < 0:
                raise ValueError(f"negative {ntok!r} values corrupt the prefix sum")
        comp = gi * np.int64(span) + (
            ((np.int64(max_score) - sc) << np.int64(key_bits)) | keys
        )
        return pa.table(
            {"composite": pa.array(comp, pa.int64()), ntok: pa.array(toks, pa.int64())}
        )

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort("composite").materialize()

    def run_bounds(comp: np.ndarray) -> np.ndarray:
        g = comp // np.int64(span)
        return np.flatnonzero(np.r_[True, g[1:] != g[:-1], True])

    def block_runs(batch: pa.Table) -> pa.Table:
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        cols = ("run_lo", "run_hi", "tok_sum")
        if not len(comp):
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)
        b = run_bounds(comp)
        rows = {c: [] for c in cols}
        for s, e in zip(b[:-1], b[1:]):
            rows["run_lo"].append(int(comp[s]))
            rows["run_hi"].append(int(comp[e - 1]))
            rows["tok_sum"].append(int(toks[s:e].sum()))
        return pa.table({c: pa.array(rows[c], pa.int64()) for c in cols})

    runs = pinned.map_batches(
        block_runs, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    if len(runs) == 0:
        return ray.data.from_arrow(
            pa.table(
                {
                    group: pa.array([], pa.string()),
                    key: pa.array([], pa.int64()),
                    score: pa.array([], pa.int64()),
                    ntok: pa.array([], pa.int64()),
                }
            )
        )
    runs = runs.sort_values("run_lo").reset_index(drop=True)
    lo = runs["run_lo"].to_numpy(np.int64)
    hi = runs["run_hi"].to_numpy(np.int64)
    if np.any(lo > hi) or np.any(hi[:-1] >= lo[1:]):
        raise ValueError("sorted metadata runs overlap — duplicate (group, score, key) rows")
    g_of_run = lo // span
    tok = runs["tok_sum"].to_numpy(np.int64)
    bases = np.zeros(len(runs), np.int64)
    for gi in np.unique(g_of_run):
        m = g_of_run == gi
        t = tok[m]
        bases[m] = np.concatenate(([0], np.cumsum(t)[:-1]))
    bases_ref = ray.put({int(l): int(b) for l, b in zip(lo, bases)})

    def pick(batch: pa.Table) -> pa.Table:
        _, gnames, gbud = ray.get(maps_ref)
        empty = pa.table(
            {
                group: pa.array([], pa.string()),
                key: pa.array([], pa.int64()),
                score: pa.array([], pa.int64()),
                ntok: pa.array([], pa.int64()),
            }
        )
        if not batch.num_rows:
            return empty
        comp = batch["composite"].to_numpy(zero_copy_only=False)
        if np.any(comp[1:] <= comp[:-1]):
            raise ValueError("block not sorted by composite — pinned block drifted")
        toks = batch[ntok].to_numpy(zero_copy_only=False).astype(np.int64)
        base_map = ray.get(bases_ref)
        b = run_bounds(comp)
        sel = np.zeros(len(comp), bool)
        for s, e in zip(b[:-1], b[1:]):
            gi = int(comp[s] // span)
            cum = base_map[int(comp[s])] + np.cumsum(toks[s:e])
            sel[s:e] = cum <= gbud[gi]
        if not sel.any():
            return empty
        comp_s = comp[sel]
        gi_s = comp_s // np.int64(span)
        rem = comp_s - gi_s * np.int64(span)
        return pa.table(
            {
                group: pa.array(gnames[gi_s].astype(object), pa.string()),
                key: pa.array(rem & ((np.int64(1) << np.int64(key_bits)) - 1), pa.int64()),
                score: pa.array(np.int64(max_score) - (rem >> np.int64(key_bits)), pa.int64()),
                ntok: pa.array(toks[sel], pa.int64()),
            }
        )

    return pinned.map_batches(
        pick, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def group_split(ds, rate_pct: int, group: str = "source", key: str = "doc_id",
                buckets: int = 100, salt: int = 0,
                max_broadcast_groups: int = 1 << 22):
    """Group-aware deterministic holdout split: EVERY row of a group lands
    on the same side (the leakage-safe alternative to ``hash_split`` when
    rows within a group are correlated — all pages of a domain, all docs
    of a crawl source). A group is kept iff
    ``knuth_hash(min(key) of the group) % buckets < rate_pct`` — the
    representative is data-derived (smallest key), so STRING group names
    need no string-hash rule and the SQL mirror is a plain join on the
    per-group min.

    Plan: one (group, min key) metadata groupby (|groups| rows — never the
    payload), kept-group set broadcast once (`ray.put`, guarded by
    ``max_broadcast_groups``), then a stateless streaming filter. At
    larger-than-broadcast group cardinality, shard the group set and reuse
    the sharded-survivor filter of ops/dedup.py.
    """
    import ray
    from ray.data.aggregate import Min

    if not 0 <= rate_pct <= buckets:
        raise ValueError(f"rate_pct must be in [0, {buckets}], got {rate_pct}")

    def local_min(batch: pa.Table) -> pa.Table:
        t = pa.table({group: batch[group], "k": batch[key].cast(pa.int64())})
        if t[group].null_count or t["k"].null_count:
            raise ValueError("group_split: group and key must be non-null")
        return t.group_by(group).aggregate([("k", "min")]).rename_columns([group, "k"])

    reps = (fast_groupby(
        ds.map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        group,
        Min("k", alias_name="rep"),
    )
        .to_pandas()
    )
    if len(reps) > max_broadcast_groups:
        raise ValueError(
            f"{len(reps)} groups exceed max_broadcast_groups={max_broadcast_groups}; "
            "shard the group set (see docstring) or raise the guard"
        )
    h = knuth_hash(reps["rep"].to_numpy(dtype=np.int64), salt)
    kept = set(reps[group][(h % np.uint64(buckets)) < np.uint64(rate_pct)])
    kept_ref = ray.put(kept)

    def keep(batch: pa.Table) -> pa.Table:
        ks = ray.get(kept_ref)
        import pyarrow.compute as pc_

        return batch.filter(pc_.is_in(batch[group], value_set=pa.array(sorted(ks), pa.string())))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def systematic_sample(ds, every: int, value_col: str = "value", id_col: str = "event_id"):
    """Every ``every``-th row of the GLOBAL ``(value_col, id_col)`` order
    (systematic sampling — even coverage of the value distribution, unlike
    a hash sample's uniform-random coverage). Returns a Dataset of
    ``(id_col, value_col, rn)`` where rn is the 1-based global rank and
    ``(rn - 1) % every == 0`` — exactly SQL's row_number QUALIFY.

    Same pinned-sorted-block plan as ``select_by_budget``: metadata
    ``(v, i)`` sorts once; pass A ships per-block (first composite, row
    count) and the driver folds exclusive row offsets keyed by the block's
    FIRST COMPOSITE (value-keyed — completion-order-safe); pass B re-reads
    the same pinned blocks and filters by global rank. ``id_col`` must be
    globally unique and both columns non-null (NaN would break the sort's
    total order — loud guard)."""
    import ray

    if every < 1:
        raise ValueError(f"every must be >= 1, got {every}")

    def to_meta(batch: pa.Table) -> pa.Table:
        v = batch[value_col].cast(pa.float64())
        i = batch[id_col].cast(pa.int64())
        vn = v.to_numpy(zero_copy_only=False)
        if v.null_count or i.null_count or np.isnan(vn).any():
            raise ValueError("systematic_sample: value/id must be non-null, non-NaN")
        return pa.table({"v": v, "i": i})

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort(["v", "i"]).materialize()

    def block_counts(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return pa.table({"lo_v": pa.array([], pa.float64()),
                             "lo_i": pa.array([], pa.int64()),
                             "hi_v": pa.array([], pa.float64()),
                             "hi_i": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return pa.table({
            "lo_v": pa.array([batch["v"][0].as_py()], pa.float64()),
            "lo_i": pa.array([batch["i"][0].as_py()], pa.int64()),
            "hi_v": pa.array([batch["v"][-1].as_py()], pa.float64()),
            "hi_i": pa.array([batch["i"][-1].as_py()], pa.int64()),
            "cnt": pa.array([batch.num_rows], pa.int64()),
        })

    parts = pinned.map_batches(
        block_counts, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    rows = sorted(parts.itertuples(index=False), key=lambda r: (r.lo_v, r.lo_i))
    for a, b in zip(rows, rows[1:]):
        if (a.hi_v, a.hi_i) >= (b.lo_v, b.lo_i):
            raise ValueError("systematic_sample: sorted blocks overlap — duplicate (value, id)?")
    offsets: dict[tuple[float, int], int] = {}
    acc = 0
    for r in rows:
        offsets[(float(r.lo_v), int(r.lo_i))] = acc
        acc += int(r.cnt)
    off_ref = ray.put(offsets)

    def pick(batch: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], pa.int64()),
                          value_col: pa.array([], pa.float64()),
                          "rn": pa.array([], pa.int64())})
        if not batch.num_rows:
            return empty
        base = ray.get(off_ref)[(batch["v"][0].as_py(), batch["i"][0].as_py())]
        rn = np.arange(base + 1, base + 1 + batch.num_rows, dtype=np.int64)
        keep = (rn - 1) % every == 0
        idx = np.flatnonzero(keep)
        return pa.table({
            id_col: pa.array(batch["i"].to_numpy(zero_copy_only=False)[idx], pa.int64()),
            value_col: pa.array(batch["v"].to_numpy(zero_copy_only=False)[idx], pa.float64()),
            "rn": pa.array(rn[idx], pa.int64()),
        })

    return pinned.map_batches(
        pick, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def temporal_split(ds, ts_col: str = "ts", train_num: int = 7, train_den: int = 10,
                   embargo_us: int = 3_600_000_000):
    """Purged temporal train/test split: one boundary at the train_num/
    train_den point of the observed time range, with an EMBARGO window
    after it — rows inside [boundary, boundary + embargo_us) are dropped so
    leakage from near-boundary correlation (label lookahead, session
    spillover) can't cross the split. The time-series answer to random
    splits.

    Pass 1 is metadata-only (global min/max of ``ts``); the boundary is
    EXACT integer arithmetic on microsecond epochs —
    ``lo + (hi - lo) * train_num // train_den`` — so SQL reproduces it
    bit-for-bit (no float fractions). Pass 2 is a stateless vectorized
    filter+label; rows never shuffle. Returns the input Dataset plus a
    ``split`` column ('train' | 'test'), embargo rows removed.
    """
    import numpy as np
    from ray.data.aggregate import Max, Min

    if not (0 < train_num < train_den):
        raise ValueError(f"need 0 < train_num < train_den, got {train_num}/{train_den}")
    if embargo_us < 0:
        raise ValueError(f"embargo_us must be >= 0, got {embargo_us}")

    def to_us(batch: pa.Table) -> pa.Table:
        t = batch[ts_col].cast(pa.timestamp("us")).cast(pa.int64())
        return pa.table({"t": t})

    mm = (
        ds.map_batches(to_us, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .aggregate(Min("t", alias_name="lo"), Max("t", alias_name="hi"))
    )
    lo, hi = int(mm["lo"]), int(mm["hi"])
    boundary = lo + (hi - lo) * train_num // train_den
    test_from = boundary + embargo_us

    def label(batch: pa.Table) -> pa.Table:
        t = (
            batch[ts_col]
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        train = t < boundary
        test = t >= test_from
        keep = train | test
        out = batch.filter(pa.array(keep))
        split = np.where(train[keep], "train", "test")
        return out.append_column("split", pa.array(split.tolist(), pa.string()))

    return ds.map_batches(label, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
