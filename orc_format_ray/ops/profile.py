"""Corpus profiling: histograms, numeric summaries, correlation matrices.

The "what is in this 100 TB table" pass that precedes every curation
decision — binning thresholds, quality-score cutoffs, mixture weights.
Every op here is a single streaming ``map_batches`` pass whose per-batch
partial is a FIXED-SIZE row (bin counts / moment sums), folded on the
driver: the corpus never shuffles and driver traffic is n_blocks tiny rows
regardless of data size.

Exact-parity notes (these make the ops SQL-auditable):
* histogram bin = ``floor((x - lo) / width)`` computed in float64, last bin
  right-closed — identical doubles to the SQL expression, so counts match
  the oracle bit-for-bit;
* means/stds/correlations are ratios of float64 sums; queries round to 6
  decimals (sum order differs between engines at ~1e-15 relative).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

from .fastagg import fast_groupby


def _numeric(col: pa.ChunkedArray) -> np.ndarray:
    """Column -> float64 with NaN for nulls."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    arr = col.to_numpy(zero_copy_only=False).astype(np.float64)
    if col.null_count:
        arr = arr.copy()
        arr[~np.asarray(col.is_valid())] = np.nan
    return arr


def column_bounds(ds, cols: list[str], as_float=None) -> dict[str, tuple[float, float]]:
    """Global per-column [min, max] over non-null values in ONE pass
    (per-batch partials; n_blocks tiny rows to the driver). ``as_float``
    overrides the column -> float64 conversion (zorder passes its
    temporal-aware variant); default is the plain numeric cast."""
    conv = as_float or _numeric

    def partial(batch: pa.Table) -> pa.Table:
        row = {}
        for c in cols:
            x = conv(batch[c])
            good = x[np.isfinite(x)]
            row[f"lo_{c}"] = [float(good.min()) if len(good) else np.nan]
            row[f"hi_{c}"] = [float(good.max()) if len(good) else np.nan]
        return pa.table(row)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    out = {}
    for c in cols:
        los = [p[f"lo_{c}"] for p in parts if p[f"lo_{c}"] == p[f"lo_{c}"]]
        his = [p[f"hi_{c}"] for p in parts if p[f"hi_{c}"] == p[f"hi_{c}"]]
        if not los:
            raise ValueError(f"column {c!r} has no non-null values to bound")
        out[c] = (min(los), max(his))
    return out


def histogram(ds, col: str, bins: int = 10, lo: float | None = None, hi: float | None = None) -> pa.Table:
    """Fixed-width histogram of ``ds[col]``: bin i covers
    ``[lo + i*w, lo + (i+1)*w)`` with the LAST bin right-closed (so ``hi``
    lands in bin ``bins-1``, exactly like ``least(floor((x-lo)/w), bins-1)``
    in SQL). Bounds default to the global min/max (one extra metadata pass).
    Values outside [lo, hi] are clipped into the edge bins; nulls are
    dropped. Returns (bin, lo, hi, cnt) with exact int64 counts."""
    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    if lo is None or hi is None:
        blo, bhi = column_bounds(ds, [col])[col]
        lo = blo if lo is None else lo
        hi = bhi if hi is None else hi
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        # degenerate span: everything in bin 0
        width = 1.0
    else:
        width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        x = _numeric(batch[col])
        x = x[np.isfinite(x)]
        idx = np.floor((x - lo) / width)
        idx = np.clip(idx, 0, bins - 1).astype(np.int64)
        return pa.table({"counts": pa.array([np.bincount(idx, minlength=bins)], pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    total = np.zeros(bins, dtype=np.int64)
    for p in parts:
        total += np.asarray(p["counts"], dtype=np.int64)
    edges = lo + width * np.arange(bins + 1, dtype=np.float64)
    return pa.table(
        {
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "lo": pa.array(edges[:-1], pa.float64()),
            "hi": pa.array(edges[1:], pa.float64()),
            "cnt": pa.array(total),
        }
    )


def numeric_profile(ds, cols: list[str]) -> pa.Table:
    """Per-column summary in ONE pass: non-null count, null count, min,
    max, float64 sum and sum-of-squares (mean/std derive on the driver).
    Partials are mergeable across any block layout. Returns one row per
    column: (col, cnt, nulls, min_v, max_v, mean, std) — std is the
    POPULATION deviation (ddof=0), matching SQL stddev_pop."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"col": [], "n": [], "nulls": [], "mn": [], "mx": [], "s1": [], "s2": []}
        for c in cols:
            x = _numeric(batch[c])
            good = x[np.isfinite(x)]
            out["col"].append(c)
            out["n"].append(len(good))
            out["nulls"].append(len(x) - len(good))
            out["mn"].append(float(good.min()) if len(good) else np.nan)
            out["mx"].append(float(good.max()) if len(good) else np.nan)
            out["s1"].append(float(good.sum()))
            out["s2"].append(float((good * good).sum()))
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    rows = {c: dict(n=0, nulls=0, mn=np.inf, mx=-np.inf, s1=0.0, s2=0.0) for c in cols}
    for p in parts:
        r = rows[p["col"]]
        r["n"] += int(p["n"])
        r["nulls"] += int(p["nulls"])
        if p["mn"] == p["mn"]:
            r["mn"] = min(r["mn"], p["mn"])
            r["mx"] = max(r["mx"], p["mx"])
        r["s1"] += p["s1"]
        r["s2"] += p["s2"]
    mean = {c: (r["s1"] / r["n"] if r["n"] else np.nan) for c, r in rows.items()}
    var = {c: (max(r["s2"] / r["n"] - mean[c] ** 2, 0.0) if r["n"] else np.nan) for c, r in rows.items()}
    return pa.table(
        {
            "col": pa.array(list(cols)),
            "cnt": pa.array([rows[c]["n"] for c in cols], pa.int64()),
            "nulls": pa.array([rows[c]["nulls"] for c in cols], pa.int64()),
            "min_v": pa.array([rows[c]["mn"] for c in cols], pa.float64()),
            "max_v": pa.array([rows[c]["mx"] for c in cols], pa.float64()),
            "mean": pa.array([mean[c] for c in cols], pa.float64()),
            "std": pa.array([float(np.sqrt(var[c])) for c in cols], pa.float64()),
        }
    )


def corr_matrix(ds, cols: list[str]) -> pa.Table:
    """Pairwise Pearson correlation over rows where BOTH columns are
    non-null: per-batch partials carry (n, sx, sy, sxx, syy, sxy) for each
    of the p*(p-1)/2 pairs — a fixed-size row per batch — folded on the
    driver. Returns (col_x, col_y, n, corr) for x < y in ``cols`` order."""
    pairs = [(i, j) for i in range(len(cols)) for j in range(i + 1, len(cols))]
    if not pairs:
        raise ValueError("corr_matrix needs >= 2 columns")

    def partial(batch: pa.Table) -> pa.Table:
        xs = [_numeric(batch[c]) for c in cols]
        out = {"pair": [], "n": [], "sx": [], "sy": [], "sxx": [], "syy": [], "sxy": []}
        for pi, (i, j) in enumerate(pairs):
            x, y = xs[i], xs[j]
            m = np.isfinite(x) & np.isfinite(y)
            xg, yg = x[m], y[m]
            out["pair"].append(pi)
            out["n"].append(len(xg))
            out["sx"].append(float(xg.sum()))
            out["sy"].append(float(yg.sum()))
            out["sxx"].append(float((xg * xg).sum()))
            out["syy"].append(float((yg * yg).sum()))
            out["sxy"].append(float((xg * yg).sum()))
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    acc = [dict(n=0, sx=0.0, sy=0.0, sxx=0.0, syy=0.0, sxy=0.0) for _ in pairs]
    for p in parts:
        a = acc[int(p["pair"])]
        a["n"] += int(p["n"])
        for k in ("sx", "sy", "sxx", "syy", "sxy"):
            a[k] += p[k]
    rows = {"col_x": [], "col_y": [], "n": [], "corr": []}
    for (i, j), a in zip(pairs, acc):
        n = a["n"]
        if n:
            cov = a["sxy"] / n - (a["sx"] / n) * (a["sy"] / n)
            vx = max(a["sxx"] / n - (a["sx"] / n) ** 2, 0.0)
            vy = max(a["syy"] / n - (a["sy"] / n) ** 2, 0.0)
            corr = cov / np.sqrt(vx * vy) if vx > 0 and vy > 0 else np.nan
        else:
            corr = np.nan
        rows["col_x"].append(cols[i])
        rows["col_y"].append(cols[j])
        rows["n"].append(n)
        rows["corr"].append(float(corr))
    return pa.table(
        {
            "col_x": pa.array(rows["col_x"]),
            "col_y": pa.array(rows["col_y"]),
            "n": pa.array(rows["n"], pa.int64()),
            "corr": pa.array(rows["corr"], pa.float64()),
        }
    )


def string_profile(ds, cols: list[str]) -> pa.Table:
    """Per-string-column summary in ONE pass: non-null count, null count,
    min/max byte length, total bytes (avg derives on the driver), empty and
    whitespace-only counts. Fixed-size per-batch partials (one row per
    column per block), exact integer folds — every output column is plain
    SQL, so the oracle is exact. Returns one row per column:
    (col, cnt, nulls, min_len, max_len, sum_len, n_empty, n_blank)."""

    def partial(batch: pa.Table) -> pa.Table:
        out = {"col": [], "n": [], "nulls": [], "mn": [], "mx": [], "s": [], "emp": [], "blank": []}
        for c in cols:
            arr = batch[c]
            if isinstance(arr, pa.ChunkedArray):
                arr = arr.combine_chunks()
            nulls = arr.null_count
            good = arr.drop_null()
            ln = pc.binary_length(good)
            out["col"].append(c)
            out["n"].append(len(good))
            out["nulls"].append(nulls)
            out["mn"].append(int(pc.min(ln).as_py()) if len(good) else -1)
            out["mx"].append(int(pc.max(ln).as_py()) if len(good) else -1)
            out["s"].append(int(pc.sum(ln).as_py()) if len(good) else 0)
            out["emp"].append(int(pc.sum(pc.equal(ln, 0)).as_py()) if len(good) else 0)
            trimmed = pc.utf8_trim_whitespace(good)
            out["blank"].append(int(pc.sum(pc.equal(trimmed, "")).as_py()) if len(good) else 0)
        return pa.table(
            {
                "col": pa.array(out["col"]),
                "n": pa.array(out["n"], pa.int64()),
                "nulls": pa.array(out["nulls"], pa.int64()),
                "mn": pa.array(out["mn"], pa.int64()),
                "mx": pa.array(out["mx"], pa.int64()),
                "s": pa.array(out["s"], pa.int64()),
                "emp": pa.array(out["emp"], pa.int64()),
                "blank": pa.array(out["blank"], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    acc = {c: dict(n=0, nulls=0, mn=None, mx=None, s=0, emp=0, blank=0) for c in cols}
    for p in parts:
        r = acc[p["col"]]
        r["n"] += int(p["n"])
        r["nulls"] += int(p["nulls"])
        if int(p["mn"]) >= 0:
            r["mn"] = int(p["mn"]) if r["mn"] is None else min(r["mn"], int(p["mn"]))
            r["mx"] = int(p["mx"]) if r["mx"] is None else max(r["mx"], int(p["mx"]))
        r["s"] += int(p["s"])
        r["emp"] += int(p["emp"])
        r["blank"] += int(p["blank"])
    return pa.table(
        {
            "col": pa.array(list(cols)),
            "cnt": pa.array([acc[c]["n"] for c in cols], pa.int64()),
            "nulls": pa.array([acc[c]["nulls"] for c in cols], pa.int64()),
            "min_len": pa.array([acc[c]["mn"] for c in cols], pa.int64()),
            "max_len": pa.array([acc[c]["mx"] for c in cols], pa.int64()),
            "sum_len": pa.array([acc[c]["s"] for c in cols], pa.int64()),
            "n_empty": pa.array([acc[c]["emp"] for c in cols], pa.int64()),
            "n_blank": pa.array([acc[c]["blank"] for c in cols], pa.int64()),
        }
    )


_VALID_CHECKS = ("not_null", "range", "in_set", "regex", "unique")


def validate(ds, rules: list[dict]) -> "object":
    """Data-quality expectations over a Dataset — the pre-ingest contract
    check (nulls, ranges, accepted domains, format regexes, key
    uniqueness). Each rule is a dict:

    * ``{"check": "not_null", "col": c}`` — violation = NULL cell;
    * ``{"check": "range", "col": c, "lo": x, "hi": y}`` — violation =
      non-null value outside ``[lo, hi]`` (nulls belong to not_null);
    * ``{"check": "in_set", "col": c, "values": [...]}`` — violation =
      non-null value outside the set;
    * ``{"check": "regex", "col": c, "pattern": p}`` — violation = non-null
      string not FULLY matching ``p`` (RE2 via Arrow — same engine family
      as DuckDB's regexp_full_match, so oracles agree);
    * ``{"check": "unique", "col": c}`` — violations = non-null rows minus
      distinct non-null values (each extra copy counts once).

    Counting rules (not_null/range/in_set/regex) fold in ONE streaming
    ``map_batches`` pass emitting a fixed-size partial row per batch — the
    table never shuffles. Each unique rule adds one metadata-only distinct
    count (per-block local distinct + one groupby over distinct values,
    the ``ndistinct_by_group`` shape). Returns a pandas DataFrame
    ``(rule, col, violations, total, passed)`` with one row per rule in
    input order; ``total`` is the table's row count.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Count, Sum

    if not rules:
        raise ValueError("validate needs at least one rule")
    for r in rules:
        if r.get("check") not in _VALID_CHECKS:
            raise ValueError(f"unknown check {r.get('check')!r}; pick from {_VALID_CHECKS}")

    counting = [(i, r) for i, r in enumerate(rules) if r["check"] != "unique"]
    uniques = [(i, r) for i, r in enumerate(rules) if r["check"] == "unique"]

    def partial(batch: pa.Table) -> pa.Table:
        out = {"__rows__": pa.array([batch.num_rows], pa.int64())}
        for i, r in counting:
            col = batch[r["col"]].combine_chunks()
            kind = r["check"]
            if kind == "not_null":
                v = col.null_count
            elif kind == "range":
                bad = pc.or_(pc.less(col, r["lo"]), pc.greater(col, r["hi"]))
                v = pc.sum(bad).as_py() or 0  # nulls drop out of the sum
            elif kind == "in_set":
                ok = pc.is_in(col, value_set=pa.array(r["values"], col.type))
                v = pc.sum(pc.and_(pc.invert(ok), pc.is_valid(col))).as_py() or 0
            else:  # regex (full match)
                m = pc.match_substring_regex(col.cast(pa.string()), f"^(?:{r['pattern']})$")
                v = pc.sum(pc.and_(pc.invert(m), pc.is_valid(col))).as_py() or 0
            out[f"__v{i}__"] = pa.array([int(v)], pa.int64())
        for i, r in uniques:
            col = batch[r["col"]]
            out[f"__nn{i}__"] = pa.array([batch.num_rows - col.null_count], pa.int64())
        return pa.table(out)

    partials = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    sums = partials.sum([c for c in partials.schema().names])

    ndistinct: dict[int, int] = {}
    for i, r in uniques:
        col = r["col"]

        def local_distinct(batch: pa.Table, _c=col) -> pa.Table:
            keys = pc.drop_null(batch[_c].combine_chunks())
            return pa.table({"k": keys}).group_by("k").aggregate([])

        dist = ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        cnt = fast_groupby(
        dist,
        "k",
        Count(alias_name="c"),
    ).count()
        ndistinct[i] = int(cnt)

    total = int(sums["sum(__rows__)"])
    rows = []
    for i, r in enumerate(rules):
        if r["check"] == "unique":
            v = int(sums[f"sum(__nn{i}__)"]) - ndistinct[i]
        else:
            v = int(sums[f"sum(__v{i}__)"])
        label = r["check"] + ":" + r["col"]
        rows.append((label, r["col"], v, total, v == 0))
    return pd.DataFrame(rows, columns=["rule", "col", "violations", "total", "passed"])


def grouped_histogram(ds, group: str, col: str, bins: int, lo: float, hi: float):
    """Fixed-width histogram PER GROUP over a shared [lo, hi] span — the
    distribution-drift monitor (one histogram per source/day/model run).
    Bin semantics are identical to ``histogram`` (floor((x-lo)/w), last bin
    right-closed, out-of-span values clipped into the edge bins, the exact
    float64 expression SQL computes — counts match bit-for-bit). Only
    (group, bin, count) cells shuffle: each batch bincounts locally, ONE
    groupby sums. Empty (group, bin) cells are emitted as zero so every
    group carries exactly ``bins`` rows. Returns a Dataset of
    ``(group, bin, cnt)``.
    """
    from ray.data.aggregate import Sum

    if bins < 1:
        raise ValueError(f"bins must be >= 1, got {bins}")
    lo, hi = float(lo), float(hi)
    width = (hi - lo) / bins if hi > lo else 1.0

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        x = _numeric(batch[col])
        ok = np.isfinite(x)
        g = batch[group].to_pandas()[ok].reset_index(drop=True)
        idx = np.clip(np.floor((x[ok] - lo) / width), 0, bins - 1).astype(np.int64)
        df = pd.DataFrame({group: g, "bin": idx})
        cells = df.groupby([group, "bin"], sort=False).size().reset_index(name="c")
        return pa.Table.from_pandas(cells, preserve_index=False)

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    merged = fast_groupby(
        cells,
        [group, "bin"],
        Sum("c", alias_name="cnt"),
    )

    def densify(df):
        import pandas as pd

        full = pd.DataFrame({group: df[group].iloc[0], "bin": np.arange(bins, dtype=np.int64)})
        out = full.merge(df[[group, "bin", "cnt"]], on=[group, "bin"], how="left")
        out["cnt"] = out["cnt"].fillna(0).astype("int64")
        return out

    return merged.groupby(group).map_groups(densify, batch_format="pandas", **remote_args())


def psi_drift(ds_a, ds_b, col: str, bins: int, lo: float, hi: float) -> pa.Table:
    """Population Stability Index terms between two corpus snapshots — THE
    distribution-drift audit run before swapping a training mixture. Both
    sides histogram over the SAME explicit fixed bins (one streaming
    bincount pass each; only `bins` integers leave a block), then the
    per-bin term

        term = (pa - pb) * ln(pa / pb),  pa = c_a/n_a, pb = c_b/n_b

    is evaluated with ONE float expression per bin — `math.log` (libm, the
    same correctly-rounded ln DuckDB calls), single divisions of exact
    ints — so every term is bitwise-equal to the SQL oracle. Bins where
    either side is empty yield a NULL term (the SQL CASE rule; standard
    PSI epsilon-fudging would break exactness). Rows in [lo, hi] only —
    out-of-range rows are excluded on BOTH sides (the SQL WHERE).
    Returns (bin, c_a, c_b, psi_term); `sum of terms` is the PSI.
    """
    import math

    if bins < 1 or not hi > lo:
        raise ValueError(f"need bins >= 1 and hi > lo, got bins={bins} [{lo}, {hi}]")
    width = (float(hi) - float(lo)) / bins

    def counts_of(ds) -> np.ndarray:
        def partial(batch: pa.Table) -> pa.Table:
            x = _numeric(batch[col])
            x = x[np.isfinite(x) & (x >= lo) & (x <= hi)]
            idx = np.minimum(np.floor((x - lo) / width), bins - 1).astype(np.int64)
            return pa.table({"counts": pa.array([np.bincount(idx, minlength=bins)], pa.list_(pa.int64()))})

        rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
        acc = np.zeros(bins, dtype=np.int64)
        for r in rows:
            acc += np.asarray(r["counts"], dtype=np.int64)
        return acc

    ca, cb = counts_of(ds_a), counts_of(ds_b)
    na, nb = int(ca.sum()), int(cb.sum())
    terms = []
    for i in range(bins):
        if ca[i] > 0 and cb[i] > 0:
            # mirrored op-for-op by the SQL oracle — keep both sides in sync
            p = np.float64(ca[i]) / np.float64(na)
            q = np.float64(cb[i]) / np.float64(nb)
            terms.append(float((p - q) * np.float64(math.log(p / q))))
        else:
            terms.append(None)
    return pa.table({
        "bin": pa.array(np.arange(bins, dtype=np.int64)),
        "c_a": pa.array(ca), "c_b": pa.array(cb),
        "psi_term": pa.array(terms, pa.float64()),
    })


def corpus_report(ds, group: str = "source", text: str = "text",
                  distinct_col: str = "lang", short_threshold: int = 100):
    """One-pass per-group corpus health report — the dataset-card table:
    doc count, total characters, short-doc count, whitespace-token total,
    distinct ``distinct_col`` values, and mean chars/doc (ONE division of
    exact ints — bitwise SQL parity). A single map_batches computes all
    numeric partials per batch (raw text never shuffles; only |groups|-row
    cells move) plus (group, distinct) cells for the exact distinct count;
    two small groupbys merge. Returns a driver DataFrame (|groups| rows).
    """
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    def partials(batch: pa.Table) -> pa.Table:
        t = batch[text]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        chars = pc.utf8_length(t).cast(pa.int64())
        trimmed = pc.utf8_trim_whitespace(t)
        words = pc.split_pattern_regex(trimmed, r"\s+")
        tok = pc.if_else(pc.equal(trimmed, ""), pa.scalar(0, pa.int32()),
                         pc.list_value_length(words)).cast(pa.int64())
        short = pc.cast(pc.less(chars, short_threshold), pa.int64())
        tbl = pa.table({"g": batch[group].combine_chunks(), "chars": chars,
                        "tok": tok, "short": short})
        out = tbl.group_by("g").aggregate(
            [("chars", "count"), ("chars", "sum"), ("short", "sum"), ("tok", "sum")]
        )
        return out.rename_columns(["g", "n_docs", "sum_chars", "n_short", "sum_tok"])

    stats = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n_docs", alias_name="n_docs"), Sum("sum_chars", alias_name="sum_chars"),
                   Sum("n_short", alias_name="n_short"), Sum("sum_tok", alias_name="sum_tok"),
    )
        .to_pandas()
    )

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"g": batch[group].combine_chunks(), "d": batch[distinct_col].combine_chunks()})
        return t.group_by(["g", "d"]).aggregate([]).select(["g", "d"])

    nd = (fast_groupby(
        fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["g", "d"],
        Count(alias_name="_n"),
    ),
        "g",
        Count(alias_name="n_distinct"),
    )
        .to_pandas()
    )
    df = stats.merge(nd, on="g", how="left")
    df["n_distinct"] = df["n_distinct"].fillna(0).astype(np.int64)
    for c in ("n_docs", "sum_chars", "n_short", "sum_tok"):
        df[c] = df[c].astype(np.int64)
    # ONE float division of exact ints — bitwise SQL parity
    df["mean_chars"] = df["sum_chars"].to_numpy(np.int64).astype(np.float64) / df[
        "n_docs"
    ].to_numpy(np.int64).astype(np.float64)
    df = df.rename(columns={"g": group})
    return df.sort_values(group).reset_index(drop=True)


CHECKSUM_MOD = (1 << 31) - 1  # Mersenne prime: SQL-expressible, square-safe


def checksum_weights(n_cols: int) -> list[int]:
    """Deterministic per-column weights 2654435761^(j+1) mod CHECKSUM_MOD —
    computed identically here and inlined into the SQL oracle."""
    w, out = 1, []
    for _ in range(n_cols):
        w = (w * 2654435761) % CHECKSUM_MOD
        out.append(w)
    return out


def table_checksum(ds, cols: list[str], max_rows: int = 1 << 32):
    """Order-independent content checksum over integer columns — the
    "did the migration/compaction/re-shard preserve every row?" audit that
    needs no sort and no shuffle: per row
    ``sum_j weight_j * ((c_j % M + M) % M) mod M`` (M = 2^31 - 1), then a
    plain SUM of the row values — commutative, so ANY plan/layout/cluster
    size produces the same number, and the whole expression is plain
    modular arithmetic a SQL oracle evaluates verbatim. One streaming
    pass; only (count, sum) partials leave each block.

    Returns ``(n_rows, checksum)`` as exact ints. The row-value sum is
    guarded: n_rows * M must stay inside int64 (max_rows default 2^32).
    """
    from ray.data.aggregate import Sum

    ws = checksum_weights(len(cols))

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(len(batch), dtype=np.int64)
        for w, c in zip(ws, cols):
            v = batch[c].to_numpy(zero_copy_only=False).astype(np.int64)
            acc = (acc + w * ((v % CHECKSUM_MOD) + CHECKSUM_MOD) % CHECKSUM_MOD) % CHECKSUM_MOD
        return pa.table({"n": pa.array([len(batch)], pa.int64()),
                         "s": pa.array([int(acc.sum())], pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).to_pandas()
    n = int(parts["n"].sum())
    if n > max_rows:
        raise ValueError(f"table_checksum: {n} rows > {max_rows}; int64 row-value sum could overflow")
    return n, int(parts["s"].sum())


def block_profile(ds):
    """Physical layout audit of a Dataset: one row per materialized block
    with (block, num_rows, size_bytes) plus rows/byte skew — what you read
    BEFORE picking batch_size / concurrency / repartition counts (a 10x
    rows skew across blocks means one task runs 10x longer than the pool).
    Zero execution beyond the materialize: counts and byte sizes come from
    block METADATA (the `_shardwrite.block_offsets` rule — never a
    map_batches pass whose output order is completion order).

    Returns a driver DataFrame sorted by block index, with a final
    ``__total__`` row carrying sums.
    """
    import pandas as pd

    mat = ds.materialize()
    rows, sizes = [], []
    for bundle in mat.iter_internal_ref_bundles():
        for meta in bundle.metadata:
            rows.append(int(meta.num_rows) if meta.num_rows is not None else -1)
            sizes.append(int(meta.size_bytes) if meta.size_bytes is not None else -1)
    df = pd.DataFrame({
        "block": np.arange(len(rows), dtype=np.int64),
        "num_rows": np.asarray(rows, dtype=np.int64),
        "size_bytes": np.asarray(sizes, dtype=np.int64),
    })
    total = pd.DataFrame({"block": [np.int64(-1)],
                          "num_rows": [df["num_rows"].clip(lower=0).sum()],
                          "size_bytes": [df["size_bytes"].clip(lower=0).sum()]})
    return pd.concat([df, total], ignore_index=True)


def skew_report(ds, key: str, k: int = 10):
    """Hot-key profile for join/shuffle planning: the top ``k`` keys by
    frequency with each key's ``share = cnt / n`` and ``skew = cnt * nd /
    n`` (how many times hotter than the uniform per-key average — the
    number that decides between `hash_join` and `skew_join`). Exact ints
    until ONE double division per output cell (SQL-bitwise).

    Plan: one metadata-only ``groupby(key).count()`` (only (key, cnt)
    pairs shuffle), the tiny totals fold, then a sort+limit over the count
    table. At vocabularies past ~1e9 distinct keys swap the exact count
    for `sketch.heavy_hitters` (the Misra-Gries superset rule) — the
    report fields are the same."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = fast_groupby(
        ds,
        key,
        Count(alias_name="cnt"),
    )
    tot = counts.aggregate(Sum("cnt", alias_name="n"), Count(alias_name="nd"))
    n, nd = int(tot["n"]), int(tot["nd"])
    top = counts.sort(["cnt", key], descending=[True, False]).limit(k).to_pandas()
    cnt = top["cnt"].to_numpy().astype(np.int64)
    if n and (cnt.astype(object) * nd > (1 << 53)).any():
        raise ValueError("skew_report: cnt * ndistinct exceeds 2^53 — the double cast would round")
    top["cnt"] = cnt
    top["share"] = cnt.astype(np.float64) / np.float64(n)
    top["skew"] = (cnt * np.int64(nd)).astype(np.float64) / np.float64(n)
    return top.reset_index(drop=True)


def fd_audit(ds, cols: list[str]):
    """Functional-dependency discovery across every ordered column pair
    (det → dep): for each pair, how many distinct determinant values map to
    MORE than one dependent value (violations). A pair with 0 violations is
    an exact FD — the schema-profiling signal for normalization, dedup keys
    and dictionary-encoding candidates. Returns a Dataset of
    ``(det_col, dep_col, n_det, n_violating)``; ``holds`` is
    ``n_violating == 0`` downstream.

    Null handling: rows where either side IS NULL are excluded (mirrors
    SQL ``count(DISTINCT dep) GROUP BY det`` semantics). Values compare by
    their Arrow string cast — injective for ints/strings/timestamps/
    doubles (shortest repr), so distinctness is preserved.

    Scale shape: ONE read feeds all m(m-1) pairs; per-batch (det, dep)
    pairs dedupe locally, then one groupby over distinct
    (pair, det, dep) triples, one over (pair, det), one tiny per-pair
    reduce — shuffle volume is the distinct-pair count, never rows x m^2."""
    import pandas as pd
    from ray.data.aggregate import Count, Sum

    if len(cols) < 2:
        raise ValueError("fd_audit needs at least two columns")

    pairs = [(a, b) for a in cols for b in cols if a != b]

    def expand(batch: pa.Table) -> pa.Table:
        outs = []
        for det, dep in pairs:
            t = pa.table(
                {
                    "det": batch[det].cast(pa.string()),
                    "dep": batch[dep].cast(pa.string()),
                }
            )
            t = t.filter(pc.and_(pc.is_valid(t["det"]), pc.is_valid(t["dep"])))
            d = t.group_by(["det", "dep"]).aggregate([])
            outs.append(
                d.append_column("pair", pa.array([f"{det}\x00{dep}"] * d.num_rows, pa.string()))
            )
        return pa.concat_tables(outs)

    triples = (fast_groupby(
        ds.map_batches(expand, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["pair", "det", "dep"],
        Count(alias_name="_c"),
    )
        .select_columns(["pair", "det"])
    )
    per_det = fast_groupby(
        triples,
        ["pair", "det"],
        Count(alias_name="n_dep"),
    )

    def flag(batch: pa.Table) -> pa.Table:
        viol = pc.cast(pc.greater(batch["n_dep"], pa.scalar(1, pa.int64())), pa.int64())
        return pa.table({"pair": batch["pair"], "one": pa.array([1] * batch.num_rows, pa.int64()), "viol": viol})

    per_pair = (fast_groupby(
        per_det.map_batches(flag, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "pair",
        Sum("one", alias_name="n_det"), Sum("viol", alias_name="n_violating"),
    )
    )

    def finish(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch["pair"], "\x00")
        det_col = pc.list_element(parts, 0)
        dep_col = pc.list_element(parts, 1)
        return pa.table(
            {
                "det_col": det_col,
                "dep_col": dep_col,
                "n_det": batch["n_det"].cast(pa.int64()),
                "n_violating": batch["n_violating"].cast(pa.int64()),
            }
        )

    return per_pair.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def uniqueness_audit(ds, key_cols: list[str]):
    """Key-uniqueness audit: every ``key_cols`` combination that appears on
    more than one row, with its duplicate count — the "is this really a
    primary key?" check (lineitem's (l_orderkey, l_linenumber) famously is
    NOT unique in this testdata; CLAUDE.md pins that). Returns a Dataset of
    ``(*key_cols, n_rows)`` with ``n_rows >= 2``.

    Plan: per-batch groupby-count partials shrink each block to its distinct
    key combos BEFORE the one metadata groupby — only (keys, count) cells
    shuffle, never payload columns. Output is at most |duplicate keys| rows.
    """
    from ray.data.aggregate import Sum

    if not key_cols:
        raise ValueError("key_cols must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(key_cols).group_by(key_cols).aggregate([([], "count_all")])
        return g.rename_columns(list(key_cols) + ["__ua_cnt__"])

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    merged = fast_groupby(
        cells,
        key_cols,
        Sum("__ua_cnt__", alias_name="n_rows"),
    )

    def keep_dups(batch: pa.Table) -> pa.Table:
        n = batch["n_rows"].cast(pa.int64())
        out = batch.set_column(batch.schema.get_field_index("n_rows"), "n_rows", n)
        return out.filter(pc.greater(n, pa.scalar(1, pa.int64())))

    return merged.map_batches(keep_dups, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def sequence_gaps(ds, col: str):
    """Missing-range detection over a globally unique integer key: every
    maximal run of absent values between two present ones, as
    ``(gap_start, gap_end)`` inclusive — the "which ids never arrived?"
    audit (gaps-and-islands' complement). Duplicate keys are rejected
    loudly (a gap scan over a non-key is meaningless).

    Plan (the pinned-sorted-block shape, value-keyed): only the int64 key
    column sorts; pass A ships one (first, last, count) row per block; the
    driver orders blocks, checks disjointness/duplicates, and broadcasts
    each block's NEXT block head; pass B emits in-block gaps from a
    vectorized diff plus the one boundary gap toward the next block. Full
    rows never shuffle and the driver never sees data rows.
    """
    import ray

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table({"k": batch[col].cast(pa.int64())})

    meta = ds.map_batches(to_meta, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    pinned = meta.sort("k").materialize()

    def block_partials(batch: pa.Table) -> pa.Table:
        cols = ("lo", "hi", "cnt")
        if not batch.num_rows:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        k = batch["k"].to_numpy(zero_copy_only=False)
        if len(k) > 1 and (k[1:] == k[:-1]).any():
            raise ValueError(f"sequence_gaps: duplicate {col!r} values — not a key")
        return pa.table(
            {
                "lo": pa.array([int(k[0])], pa.int64()),
                "hi": pa.array([int(k[-1])], pa.int64()),
                "cnt": pa.array([len(k)], pa.int64()),
            }
        )

    parts = pinned.map_batches(
        block_partials, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    parts = parts.sort_values("lo").reset_index(drop=True)
    for prev_hi, nxt_lo in zip(parts["hi"], parts["lo"][1:]):
        if not (int(prev_hi) < int(nxt_lo)):
            raise ValueError(f"sequence_gaps: duplicate {col!r} values across blocks — not a key")
    # each block's successor head, keyed by the block's own first value
    nxt = {int(lo): int(nlo) for lo, nlo in zip(parts["lo"], parts["lo"][1:])}
    nxt_ref = ray.put(nxt)

    def finish(batch: pa.Table) -> pa.Table:
        empty = pa.table({"gap_start": pa.array([], pa.int64()), "gap_end": pa.array([], pa.int64())})
        if not batch.num_rows:
            return empty
        k = batch["k"].to_numpy(zero_copy_only=False)
        starts = k[:-1][np.diff(k) > 1] + 1
        ends = k[1:][np.diff(k) > 1] - 1
        nlo = ray.get(nxt_ref).get(int(k[0]))
        if nlo is not None and nlo > int(k[-1]) + 1:
            starts = np.concatenate((starts, [int(k[-1]) + 1]))
            ends = np.concatenate((ends, [nlo - 1]))
        return pa.table(
            {
                "gap_start": pa.array(starts.astype(np.int64), pa.int64()),
                "gap_end": pa.array(ends.astype(np.int64), pa.int64()),
            }
        )

    return pinned.map_batches(
        finish, batch_size=None, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )


def count_anomaly_by_key(ds, key: str = "event_type", ts_col: str = "ts",
                         z_num: int = 2, z_den: int = 1,
                         day_us: int = 86_400_000_000):
    """Per-key event-rate anomaly detection in EXACT int64 arithmetic:
    bucket events into days (``epoch_us // day_us``), and flag a day ``d``
    of key ``k`` whose count ``c`` deviates from the key's own mean by more
    than ``z = z_num/z_den`` standard deviations. With ``n`` days,
    ``S = sum(c)``, ``Q = sum(c^2)``, the float test
    ``|c - S/n| > z * sqrt((n*Q - S^2)) / n`` is EQUIVALENT to the pure
    integer comparison (the ``n`` cancels after squaring)::

        z_den^2 * (n*c - S)^2  >  z_num^2 * (n*Q - S^2)

    so the flags are bitwise-reproducible by the SQL oracle with no float
    expression at all (the strongest form of the repo's exact-parity rule).
    Zero-variance keys (all days equal) never flag: both sides are 0 and
    the comparison is strict.

    Scale shape: one streaming pass emits per-batch ``(key, day, cnt)``
    partials (fixed-size metadata — the corpus never shuffles), one
    metadata groupby per key folds the partials, and the anomaly test runs
    per key over its tiny day vector IN PYTHON INTS (numpy int64 products
    wrap silently; day counts per key are bounded by the calendar, not the
    data). Guards: ``n * max(c) < 2^31`` bounds every square below 2^62.

    Returns a Dataset of ``(key, day, cnt, n_days, sum_cnt)`` for the
    anomalous cells only — legally empty, so downstream consumers must
    apply the typed-empty guard.
    """
    import pandas as pd

    if z_num <= 0 or z_den <= 0 or z_num > 1000 or z_den > 1000:
        raise ValueError(f"count_anomaly_by_key: bad z = {z_num}/{z_den}")

    def partial(batch: pa.Table) -> pa.Table:
        k = batch[key].to_pandas()
        d = batch[ts_col].cast(pa.int64()).to_numpy(zero_copy_only=False) // day_us
        g = pd.DataFrame({"k": k, "d": d}).groupby(["k", "d"], sort=False).size()
        idx = g.index.to_frame(index=False)
        return pa.table({
            key: pa.array(idx["k"]),
            "day": pa.array(idx["d"].to_numpy().astype(np.int64), pa.int64()),
            "cnt": pa.array(g.to_numpy().astype(np.int64), pa.int64()),
        })

    meta = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True,
                          **remote_args())

    zn2, zd2 = z_num * z_num, z_den * z_den

    def flag(g: pd.DataFrame) -> pd.DataFrame:
        by_day = g.groupby("day", sort=True)["cnt"].sum()
        days = [int(x) for x in by_day.index]
        cnts = [int(x) for x in by_day.to_numpy()]
        n, s = len(cnts), sum(cnts)
        # (n*c - s)^2 and (n*q - s^2) are both bounded by (n*max)^2; requiring
        # max(zn2, zd2) * (n*max)^2 < 2^62 keeps EVERY term in BIGINT range so
        # the SQL oracle evaluates the identical integer comparison.
        nm = n * max(cnts)
        if max(zn2, zd2) * nm * nm >= (1 << 62):
            raise ValueError(
                "count_anomaly_by_key: z^2 * (n_days * max(cnt))^2 >= 2^62 — rescale day_us"
            )
        q = sum(c * c for c in cnts)
        rhs = zn2 * (n * q - s * s)
        keep = [(d, c) for d, c in zip(days, cnts) if zd2 * (n * c - s) * (n * c - s) > rhs]
        return pd.DataFrame({
            key: pd.Series([g[key].iloc[0]] * len(keep), dtype=g[key].dtype),
            "day": pd.Series([d for d, _ in keep], dtype="int64"),
            "cnt": pd.Series([c for _, c in keep], dtype="int64"),
            "n_days": pd.Series([n] * len(keep), dtype="int64"),
            "sum_cnt": pd.Series([s] * len(keep), dtype="int64"),
        })

    out = meta.groupby(key).map_groups(flag, **remote_args())
    # normalize lineage so downstream union()/groupby compose (session-10 rule)
    return out.map_batches(lambda b: b, batch_format="pyarrow", **remote_args())


def join_size_estimate(left_ds, right_ds, key_left: str, key_right: str | None = None):
    """Optimizer-style join cardinality check: the classic NDV estimate
    ``|A ⋈ B| ≈ n_a * n_b / max(ndv_a, ndv_b)`` next to the EXACT join
    size — the number every distributed planner wants BEFORE committing to
    a shuffle strategy (broadcast vs bucketed vs sorted-merge).

    Exact-parity rules: counts and NDVs are exact ints; ``est_rows`` is the
    integer floor division ``n_l * n_r // max(ndv)`` (SQL ``//``, guarded
    < 2^62); ``true_rows`` = Σ cnt_l(k)·cnt_r(k) over matched keys (exact
    products, guarded); ``est_over_true`` is the ONE double division (0.0
    when the true size is 0 — mirror the SQL CASE).

    Scale shape: each side pre-counts by key per batch, ONE metadata
    groupby folds (key, cnt) per side — payloads never shuffle; the two
    count tables join via the bucketed ``hash_join`` and the products fold
    as per-batch partial sums. Driver traffic is O(1).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .join import hash_join

    key_right = key_right or key_left

    def counts(ds, key, out_key):
        def partial(batch: pa.Table) -> pa.Table:
            k = batch[key].combine_chunks()
            if k.null_count:
                k = k.drop_null()  # SQL inner join: null keys never match
            vc = k.value_counts()
            return pa.table(
                {
                    out_key: vc.field("values"),
                    "cnt": vc.field("counts").cast(pa.int64()),
                }
            )

        return (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        out_key,
        Sum("cnt", alias_name="cnt"),
    )
            .materialize()  # counted below AND joined — must not re-run the scan
        )

    lc = counts(left_ds, key_left, "k")
    rc = counts(right_ds, key_right, "k")
    ndv_l, ndv_r = lc.count(), rc.count()

    def side_n(cds):
        t = cds.map_batches(
            lambda b: pa.table({"n_p": pa.array([int(pc.sum(b["cnt"]).as_py() or 0)], pa.int64())}),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        ).to_pandas()
        return int(t["n_p"].sum()) if len(t) else 0

    n_l, n_r = side_n(lc), side_n(rc)
    if n_l * n_r >= (1 << 62):
        raise ValueError("join_size_estimate: n_l * n_r >= 2^62 — rescale before estimating")
    est = (n_l * n_r) // max(ndv_l, ndv_r) if max(ndv_l, ndv_r) else 0

    rc2 = rc.map_batches(
        lambda b: pa.table({"k": b["k"], "cnt_r": b["cnt"]}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    joined = hash_join(lc, rc2, key="k")

    def prod_partial(batch: pa.Table) -> pa.Table:
        a = batch["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["cnt_r"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and int(a.max()) * int(b.max()) * len(a) >= (1 << 62):
            raise ValueError("join_size_estimate: product sum may exceed 2^62 — hot key")
        return pa.table({"t_p": pa.array([int((a * b).sum())], pa.int64())})

    tp = joined.map_batches(
        prod_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    true_rows = int(tp["t_p"].sum()) if len(tp) else 0
    ratio = float(np.float64(est) / np.float64(true_rows)) if true_rows else 0.0
    return pd.DataFrame(
        {
            "n_left": pd.Series([n_l], dtype="int64"),
            "n_right": pd.Series([n_r], dtype="int64"),
            "ndv_left": pd.Series([ndv_l], dtype="int64"),
            "ndv_right": pd.Series([ndv_r], dtype="int64"),
            "est_rows": pd.Series([est], dtype="int64"),
            "true_rows": pd.Series([true_rows], dtype="int64"),
            "est_over_true": pd.Series([ratio], dtype="float64"),
        }
    )
