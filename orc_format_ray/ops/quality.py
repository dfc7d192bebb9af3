"""Document quality gates: the Gopher-style rule bundle and the
deflate-compression-ratio signal (CCNet / Gopher "repetitive or
low-entropy text compresses too well" heuristic).

Both are single-pass, embarrassingly parallel map_batches stages — no
shuffle at any scale; per-doc outputs stream straight to the next stage.

``gopher_rules`` mirrors the published Gopher quality filters (Rae et al.
2021, Table A1 subset) that are exactly reproducible in ANSI SQL: word
count bounds, mean word length bounds, alphabetic-word fraction, stopword
hits, and bullet-line fraction. Parity rules (CLAUDE.md): tokenization is
the shared trim + ``\\s+`` split; every fraction is ONE division of exact
int64 counts cast to double (bitwise == the SQL oracle); the ``keep`` flag
is boolean algebra over those bit-identical doubles.

``compression_signal`` has no SQL equivalent (DuckDB has no per-row
deflate) — it registers as a rows-only driver query; the pytest oracle
recomputes the exact zlib byte counts row by row.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import split_nonempty_docs

from .fastagg import fast_groupby

STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def _per_doc_sums(flags: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Sum int64 ``flags`` per document given doc start offsets."""
    if len(flags) == 0:
        return np.zeros(len(offsets), np.int64)
    return np.add.reduceat(flags.astype(np.int64), offsets)


def gopher_rules(
    batch: pa.Table,
    column: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    keep_cols: tuple = (),
) -> pa.Table:
    """Per-doc Gopher quality features + composite ``keep`` flag.

    Docs empty after trim are dropped (no words to measure — the SQL
    oracle filters ``trim(text) <> ''``). Returns
    (doc_id, n_words, mean_word_len, frac_alpha_words, stop_hits,
    frac_bullet_lines, keep) plus any ``keep_cols`` passed through
    (filtered to the surviving docs) for downstream grouping.
    """
    ids, words = split_nonempty_docs(batch, column, id_col)
    n_docs = len(ids)
    if n_docs == 0:
        cols = {
            id_col: pa.array([], pa.int64()),
            "n_words": pa.array([], pa.int64()),
            "mean_word_len": pa.array([], pa.float64()),
            "frac_alpha_words": pa.array([], pa.float64()),
            "stop_hits": pa.array([], pa.int64()),
            "frac_bullet_lines": pa.array([], pa.float64()),
            "keep": pa.array([], pa.bool_()),
        }
        for c in keep_cols:
            cols[c] = batch[c].combine_chunks().slice(0, 0)
        return pa.table(cols)
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    offsets = np.r_[0, np.cumsum(counts)[:-1]]
    flat = words.flatten()

    wlen = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    alpha = pc.match_substring_regex(flat, "[A-Za-z]").to_numpy(zero_copy_only=False)
    stop = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)

    sum_len = _per_doc_sums(wlen, offsets)
    alpha_words = _per_doc_sums(alpha, offsets)
    stop_hits = _per_doc_sums(stop, offsets)

    # line stats over the SAME trimmed text the word split saw
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(text)
    nonempty = pc.not_equal(trimmed, "")
    lines = pc.split_pattern(trimmed.filter(nonempty), "\n")
    n_lines = pc.list_value_length(lines).to_numpy(zero_copy_only=False).astype(np.int64)
    loff = np.r_[0, np.cumsum(n_lines)[:-1]]
    lflat = pc.utf8_ltrim(lines.flatten(), characters=" ")
    bullet = pc.or_(
        pc.or_(pc.starts_with(lflat, pattern="-"), pc.starts_with(lflat, pattern="*")),
        pc.starts_with(lflat, pattern="•"),
    ).to_numpy(zero_copy_only=False)
    bullet_lines = _per_doc_sums(bullet, loff)

    # each fraction: ONE division of exact int64 counts as doubles
    mean_word_len = sum_len.astype(np.float64) / counts.astype(np.float64)
    frac_alpha = alpha_words.astype(np.float64) / counts.astype(np.float64)
    frac_bullet = bullet_lines.astype(np.float64) / n_lines.astype(np.float64)

    keep = (
        (counts >= min_words)
        & (counts <= max_words)
        & (mean_word_len >= min_mean_word_len)
        & (mean_word_len <= max_mean_word_len)
        & (frac_alpha >= min_alpha_frac)
        & (stop_hits >= min_stop_hits)
    )
    cols = {
        id_col: ids.cast(pa.int64()),
        "n_words": pa.array(counts),
        "mean_word_len": pa.array(mean_word_len),
        "frac_alpha_words": pa.array(frac_alpha),
        "stop_hits": pa.array(stop_hits),
        "frac_bullet_lines": pa.array(frac_bullet),
        "keep": pa.array(keep),
    }
    for c in keep_cols:
        extra = batch[c]
        if isinstance(extra, pa.ChunkedArray):
            extra = extra.combine_chunks()
        cols[c] = extra.filter(nonempty)
    return pa.table(cols)


def compression_signal(
    batch: pa.Table, column: str = "text", id_col: str = "doc_id", level: int = 6
) -> pa.Table:
    """Per-doc deflate ratio ``comp_bytes / raw_bytes`` (UTF-8 bytes,
    zlib level fixed for determinism). Low ratios flag repetitive /
    templated text; high ratios flag noise. The per-row loop is C-bound
    in zlib (the actual compression dominates, like any real pipeline's
    per-record codec call). Empty texts get ratio over max(raw, 1)."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    raw = pc.binary_length(text.cast(pa.binary())).to_numpy(zero_copy_only=False).astype(np.int64)
    comp = np.empty(len(raw), np.int64)
    for i, s in enumerate(text):
        v = s.as_py()
        comp[i] = len(zlib.compress(v.encode("utf-8"), level)) if v is not None else 0
    ratio = comp.astype(np.float64) / np.maximum(raw, 1).astype(np.float64)
    ids = batch[id_col]
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    return pa.table(
        {
            id_col: ids.cast(pa.int64()),
            "raw_bytes": pa.array(raw),
            "comp_bytes": pa.array(comp),
            "compress_ratio": pa.array(ratio, pa.float64()),
        }
    )


def curation_report(ds, group: str = "source", column: str = "text", id_col: str = "doc_id"):
    """Per-group curation dashboard: docs, Gopher-keep docs, distinct
    content hashes (exact-dedup survivors), and token totals — the one
    table a curator reads before fixing mixture weights.

    Composition of three metadata-only passes over one scan family:
    (1) per-batch gopher_rules + content-hash + token-count partials,
    (2) a (group, hash) groupby for the distinct-content count,
    (3) a (group) groupby folding counts/sums. Driver sees |groups| rows.
    All counts exact ints (the SQL oracle mirrors each aggregate).
    """
    from ray.data.aggregate import Count, Sum

    from .text import content_hash, token_count

    def partial(batch: pa.Table) -> pa.Table:
        g = gopher_rules(batch, column=column, id_col=id_col, keep_cols=(group,))
        tk = token_count(batch, column, "_cr_ntok")
        # token counts align to the ORIGINAL batch; re-filter to survivors
        text = batch[column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        nonempty = pc.not_equal(trimmed, "")
        ntok = tk["_cr_ntok"].combine_chunks().filter(nonempty)
        h = content_hash(text.filter(nonempty))
        return pa.table(
            {
                group: g[group],
                "keep_i": pc.cast(g["keep"], pa.int64()),
                "ntok": ntok.cast(pa.int64()),
                "chash": pa.array(h.view(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    per_group = fast_groupby(
        parts,
        group,
        Count(alias_name="n_docs"),
        Sum("keep_i", alias_name="n_keep"),
        Sum("ntok", alias_name="sum_tok"),
    )
    uniq = (fast_groupby(
        fast_groupby(
        parts.select_columns([group, "chash"]),
        [group, "chash"],
        Count(alias_name="_c"),
    ),
        group,
        Count(alias_name="n_unique"),
    )
    )
    a = per_group.to_pandas()
    b = uniq.to_pandas()
    if len(a) == 0:
        import pandas as pd

        return pd.DataFrame(
            {
                group: pd.Series([], dtype=object),
                "n_docs": pd.Series([], dtype=np.int64),
                "n_keep": pd.Series([], dtype=np.int64),
                "n_unique": pd.Series([], dtype=np.int64),
                "sum_tok": pd.Series([], dtype=np.int64),
            }
        )
    out = a.merge(b, on=group, how="left")
    for c in ("n_docs", "n_keep", "n_unique", "sum_tok"):
        out[c] = out[c].fillna(0).astype(np.int64)
    return out[[group, "n_docs", "n_keep", "n_unique", "sum_tok"]].sort_values(group).reset_index(drop=True)


ENTITY_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("url", r"https?://[^ \t\n]+"),
    ("iso_date", r"\d{4}-\d{2}-\d{2}"),
    ("number", r"\b\d+\b"),
)


def entity_counts(ds, group: str = "source", column: str = "text"):
    """Per-group occurrence counts of regex entity classes (emails, URLs,
    ISO dates, bare numbers) — the corpus-profiling panel behind PII risk
    and markup-noise triage. One stateless pass (Arrow RE2 kernels, the
    same engine DuckDB's regexp_extract_all uses — exact count parity),
    one tiny groupby. Returns a Dataset of (group, n_email, n_url,
    n_iso_date, n_number)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = batch[column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        cols = {group: batch[group]}
        for name, pat in ENTITY_PATTERNS:
            cols[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(pa.int64())
        return pa.table(cols)

    aggs = [Count(alias_name="n_docs")] + [
        Sum(f"n_{name}", alias_name=f"n_{name}") for name, _ in ENTITY_PATTERNS
    ]
    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .groupby(group)
        .aggregate(*aggs)
    )


def benford_digits(ds, group: str, value_col: str, scale: int = 100):
    """Benford's-law first-digit audit per group: quantize ``value_col`` to
    exact integer units (``floor(v*scale + 0.5)``, the established cents
    rule), keep units > 0, and count rows by the first decimal digit of the
    unit value. Returns a Dataset of ``(group, digit, cnt, frac)`` — at most
    9 rows per group; ``frac`` is ONE exact-int division ``cnt / n_group``
    (bitwise reproducible). Fabricated/synthetic numeric columns show up as
    a flat digit histogram instead of Benford's log curve.

    Scale shape: per-batch (group, digit) partial counts pre-aggregate
    before ONE tiny groupby; the frac division runs inside a per-group
    ``map_groups`` over <= 9-row groups. The first digit is integer-only
    arithmetic (repeated //10, <= 19 vectorized passes) — no float log10,
    whose SIMD drift would break oracle parity."""
    import pandas as pd
    from ray.data.aggregate import Sum

    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")

    def partial(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy(zero_copy_only=False)
        u = np.floor(v * scale + 0.5).astype(np.int64)
        keep = u > 0
        u = u[keep]
        d = u.copy()
        m = d >= 10
        while m.any():
            d[m] //= 10
            m = d >= 10
        g = batch[group].combine_chunks().filter(pa.array(keep))
        t = pa.table({group: g, "digit": pa.array(d, pa.int64())})
        out = t.group_by([group, "digit"]).aggregate([([], "count_all")])
        return out.rename_columns([group, "digit", "cnt"])

    counts = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        [group, "digit"],
        Sum("cnt", alias_name="cnt"),
    )
    )

    def frac(gdf: pd.DataFrame) -> pd.DataFrame:
        n = int(gdf["cnt"].sum())
        out = gdf.sort_values("digit").reset_index(drop=True)
        out["cnt"] = out["cnt"].astype("int64")
        out["frac"] = out["cnt"].to_numpy(np.float64) / np.float64(n)
        return out

    return counts.groupby(group).map_groups(frac, batch_format="pandas", **remote_args())


def k_anonymity(ds, qi_cols: list[str], k: int):
    """Privacy k-anonymity audit: every combination of the quasi-identifier
    columns whose equivalence class holds FEWER than ``k`` rows (those rows
    are re-identifiable). Returns a Dataset of ``(*qi_cols, grp_n)``.

    Band / quantize continuous quasi-identifiers UPSTREAM (a raw float is
    its own singleton class and the audit degenerates); when mirroring a
    DuckDB ``//`` band remember it truncates toward zero, not floor.

    Scale shape: per-batch (qi...) partial counts pre-aggregate before ONE
    groupby over |distinct QI combos| (<< rows when the audit is
    meaningful); the ``< k`` filter is a stateless map_batches."""
    from ray.data.aggregate import Sum

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not qi_cols:
        raise ValueError("qi_cols must be non-empty")

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(qi_cols)
        out = t.group_by(qi_cols).aggregate([([], "count_all")])
        return out.rename_columns(list(qi_cols) + ["cnt"])

    counts = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        list(qi_cols),
        Sum("cnt", alias_name="grp_n"),
    )
    )

    def violating(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.less(batch["grp_n"], pa.scalar(k, pa.int64())))

    return counts.map_batches(violating, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


MOJIBAKE_PATTERNS = ("\u00c3", "\u00e2\u20ac", "\ufffd")
"""Default double-encoding tells: '\\u00c3' (UTF-8 bytes re-decoded as
latin-1), '\\u00e2\\u20ac' (the cp1252 smart-quote family mangled the same way),
and the U+FFFD replacement char a lossy decode leaves behind."""


def encoding_audit(ds, group: str = "source", text_col: str = "text",
                   patterns: tuple[str, ...] = MOJIBAKE_PATTERNS):
    """Mojibake / double-encoding audit per group: how many documents carry
    any of the classic encoding-damage substrings — the corpus-health check
    that catches a bad extraction job before training sees it. A doc is
    "bad" if ANY pattern occurs (vectorized ``pc.match_substring`` OR-fold;
    exact substring semantics so SQL ``contains()`` reproduces it).

    Only (group, n, n_bad) cells shuffle. ``frac_bad`` is ONE double
    division of exact int64 counts (mirror ``CAST(n_bad AS
    DOUBLE)/CAST(n AS DOUBLE)`` in the oracle). Returns a driver DataFrame
    ``(group, n, n_bad, frac_bad)`` sorted by group.
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    if not patterns:
        raise ValueError("encoding_audit: need at least one pattern")

    def partials(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        bad = pc.match_substring(txt, patterns[0])
        for p in patterns[1:]:
            bad = pc.or_(bad, pc.match_substring(txt, p))
        cells = pa.table(
            {
                "g": batch[group].combine_chunks()
                if isinstance(batch[group], pa.ChunkedArray)
                else batch[group],
                "n": pa.array(np.ones(batch.num_rows, np.int64)),
                "n_bad": bad.cast(pa.int64()),
            }
        )
        out = cells.group_by("g").aggregate([("n", "sum"), ("n_bad", "sum")])
        return out.rename_columns(["g", "n", "n_bad"])

    stats = (fast_groupby(
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "g",
        Sum("n", alias_name="n"), Sum("n_bad", alias_name="n_bad"),
    )
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    n = stats["n"].astype("int64")
    nb = stats["n_bad"].astype("int64")
    frac = np.array(
        [float(np.float64(int(b)) / np.float64(int(t))) for b, t in zip(nb, n)], dtype=np.float64
    )
    return pd.DataFrame({group: stats["g"], "n": n, "n_bad": nb, "frac_bad": frac})


def pseudonymize_keys(ds, cols: list[str], key: str, length: int = 16):
    """Keyed pseudonymization of identifier columns: each value maps to
    ``sha256(key || ':' || col || ':' || str(value))[:length]`` (hex) — a
    deterministic, stateless per-value function, so equal ids map to equal
    tokens EVERYWHERE (joins and group-bys survive pseudonymization) with
    no shuffle, no shared state, and no reversible mapping stored anywhere.
    The per-column domain separator keeps tokens from colliding across
    columns that share raw values.

    SQL mirror (DuckDB): ``substr(sha256(key || ':' || col || ':' ||
    CAST(v AS VARCHAR)), 1, length)`` — the oracle runs the identical
    expression, so pseudonymized outputs hash-compare exactly.

    Hashing is per-distinct-value Python (crypto hashes have no numpy
    kernel): each batch dedups first, hashes only its unique values, and
    gathers back — on id-like columns (many repeats per batch) the hash
    cost amortizes; the op stays a single map_batches pass."""
    import hashlib

    import numpy as np
    import pyarrow as pa

    from .._rayutil import remote_args

    cols = list(cols)

    def scrub(batch: pa.Table) -> pa.Table:
        out = batch
        for col in cols:
            arr = batch[col]
            if pa.types.is_floating(arr.type):
                raise ValueError(
                    f"pseudonymize_keys({col!r}): float keys are not identifier-"
                    "stable (CAST formatting differs); cast or quantize first"
                )
            vals = arr.cast(pa.string()).to_numpy(zero_copy_only=False)
            null_mask = np.array([v is None for v in vals], bool)
            uniq, inv = np.unique(vals[~null_mask].astype(str), return_inverse=True)
            tokens = np.array(
                [
                    hashlib.sha256(f"{key}:{col}:{u}".encode()).hexdigest()[:length]
                    for u in uniq
                ],
                dtype=object,
            )
            mapped = np.empty(len(vals), dtype=object)
            mapped[~null_mask] = tokens[inv] if len(uniq) else []
            mapped[null_mask] = None  # null ids stay null, never a token
            idx = out.schema.get_field_index(col)
            out = out.set_column(idx, col, pa.array(mapped, pa.string()))
        return out

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
