"""Text analysis stages: token counting, fingerprinting, language ID,
quality scoring. All vectorized over Arrow batches (no per-row Python in the
hot path); stages that need compiled state (stopword tables) are callable
classes for `map_batches` actor pools."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .fastagg import fast_groupby

FNV_PRIME = np.uint64(1099511628211)
FNV_BASIS = np.uint64(14695981039346656037)


def _utf8_block(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    big = arr.cast(pa.large_binary())
    offs = np.frombuffer(big.buffers()[1], dtype=np.int64)[big.offset : big.offset + len(big) + 1]
    buf = big.buffers()[2]
    data = np.frombuffer(buf, dtype=np.uint8)[offs[0] : offs[-1]] if buf is not None and len(big) else np.zeros(0, np.uint8)
    return data, (offs - offs[0]).astype(np.int64)


def content_hash(arr: pa.Array) -> np.ndarray:
    """Deterministic 64-bit polynomial hash per string, fully vectorized.

    h(s) = sum_i s[i] * P^(len-1-i)  (mod 2^64), P = FNV prime. Position
    weights come from a precomputed powers table + np.add.reduceat — no
    Python loop over rows or bytes.
    """
    concat, offs = _utf8_block(arr)
    n = len(offs) - 1
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    lens = np.diff(offs)
    max_len = int(lens.max()) if n else 0
    powers = np.ones(max_len + 1, dtype=np.uint64)
    with np.errstate(over="ignore"):  # mod-2^64 wraparound IS the hash spec
        for i in range(1, max_len + 1):
            powers[i] = powers[i - 1] * FNV_PRIME
    ends_at = np.repeat(offs[1:], lens)
    pos = np.arange(len(concat), dtype=np.int64)
    weighted = concat.astype(np.uint64) * powers[ends_at - pos - 1]
    # reduceat needs non-empty segments; guard empties then zero them
    starts = offs[:-1].copy()
    empty = lens == 0
    starts_safe = np.minimum(starts, max(len(concat) - 1, 0))
    if len(concat):
        sums = np.add.reduceat(weighted, starts_safe)
        sums[empty] = 0
    else:
        sums = np.zeros(n, dtype=np.uint64)
    # mix in the length to distinguish prefixes
    return sums * FNV_PRIME + lens.astype(np.uint64) + FNV_BASIS


def add_content_hash(batch: pa.Table, column: str = "text", out: str = "content_hash") -> pa.Table:
    h = content_hash(batch[column].combine_chunks())
    return batch.append_column(out, pa.array(h.view(np.int64), type=pa.int64()))


def token_count(batch: pa.Table, column: str = "text", out: str = "n_tok") -> pa.Table:
    """Whitespace token count; matches len(string_split_regex(trim(text),'\\s+'))."""
    text = batch[column]
    trimmed = pc.utf8_trim_whitespace(text)
    words = pc.split_pattern_regex(trimmed, r"\s+")
    counts = pc.list_value_length(words)
    # empty-after-trim text counts 0, not 1
    is_empty = pc.equal(trimmed, "")
    counts = pc.if_else(is_empty, pa.scalar(0, pa.int32()), counts)
    return batch.append_column(out, counts.cast(pa.int64()))


# GPT-2-style pre-tokenizer, RE2-safe (the upstream pattern's negative
# lookahead `\s+(?!\S)` is dropped — trailing-space runs count as one token
# instead of splitting; every other class is the published pattern). Both
# Arrow and DuckDB run RE2, so counts agree exactly across engines.
BPE_SPLIT_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_token_count(batch: pa.Table, column: str = "text", out: str = "n_bpe_tok") -> pa.Table:
    """Pre-tokenizer token count — a closer LLM-token proxy than whitespace
    words (contractions, punctuation runs, and digit runs count separately).
    One vectorized RE2 pass per batch (``pc.count_substring_regex``); no
    per-row Python."""
    counts = pc.count_substring_regex(batch[column], BPE_SPLIT_PATTERN)
    return batch.append_column(out, counts.cast(pa.int64()))


def fingerprint(batch: pa.Table, column: str = "text", out: str = "fingerprint") -> pa.Table:
    """Document fingerprint = content rolling hash (for shard-level dedup joins)."""
    return add_content_hash(batch, column, out)


_STOPWORDS = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"},
    "fr": {"le", "la", "les", "et", "de", "un", "une", "est", "pour", "dans"},
    "es": {"el", "la", "los", "y", "de", "un", "una", "es", "para", "en"},
    "zh": {"的", "是", "了", "在", "和", "有", "我", "不", "这", "他"},
}


class LangId:
    """Heuristic language ID: stopword-hit voting per language.

    Actor-pool stage: the per-language stopword hash sets build once per actor
    (``__init__``), scoring is a vectorized membership test per batch.
    """

    def __init__(self):
        self.tables = {lang: pa.array(sorted(ws)) for lang, ws in _STOPWORDS.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch["text"]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_trim_whitespace(pc.utf8_lower(text)), r"\s+")
        flat = words.flatten()  # ListArray.flatten -> word values (NOT chunk merge)
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        best_lang = np.zeros(len(counts), dtype=object)
        best_hits = np.full(len(counts), -1, dtype=np.int64)
        for lang, table in self.tables.items():
            hit = pc.is_in(flat, value_set=table).to_numpy(zero_copy_only=False)
            hits = np.bincount(doc_of[hit], minlength=len(counts))
            better = hits > best_hits
            best_hits[better] = hits[better]
            best_lang[better] = lang
        out = pa.array([str(x) if x else "unk" for x in best_lang], type=pa.string())
        return batch.append_column("lang_pred", out)


def quality_score(batch: pa.Table, column: str = "text") -> pa.Table:
    """Quality features: char length, punct ratio, mean word length, token count."""
    text = batch[column]
    n_chars = pc.utf8_length(text).cast(pa.float64())
    punct = pc.count_substring_regex(text, r"[.!?,;:]").cast(pa.float64())
    safe = pc.max_element_wise(n_chars, pa.scalar(1.0))
    punct_ratio = pc.round(pc.divide(punct, safe), ndigits=6)
    b = token_count(batch, column, "_q_ntok")
    ntok = b["_q_ntok"].cast(pa.float64())
    mean_word_len = pc.round(pc.divide(n_chars, pc.max_element_wise(ntok, pa.scalar(1.0))), ndigits=6)
    return (
        batch.append_column("n_chars_f", n_chars)
        .append_column("punct_ratio", punct_ratio)
        .append_column("mean_word_len", mean_word_len)
        .append_column("tok_count", ntok.cast(pa.int64()))
    )


# ------------------------------------------------------- vocabulary build


def word_count_partial(batch: pa.Table, column: str = "text") -> pa.Table:
    """Per-batch (word, cnt) partial counts — the combiner half of a
    vocabulary build. Vectorized: split -> flatten -> value_counts; empty
    split artifacts from blank texts are dropped."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    vc = words.flatten().value_counts()
    vals, cnts = vc.field("values"), vc.field("counts")
    keep = pc.greater(pc.utf8_length(vals), 0)
    return pa.table({"word": vals.filter(keep), "cnt": cnts.filter(keep).cast(pa.int64())})


def vocab_topk(ds, k: int = 100, column: str = "text") -> pa.Table:
    """Top-k corpus vocabulary by frequency (ties broken by word asc).

    Plan: per-batch partial counts (only distinct-word partials shuffle,
    never raw text) -> one groupby over |vocab| rows -> per-block partial
    top-k (k rows leave each block) -> tiny driver fold of k x n_blocks
    rows. Returns a pyarrow Table (rank, word, cnt)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    parts = ds.map_batches(
        lambda b: word_count_partial(b, column), batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    tot = fast_groupby(
        parts,
        "word",
        Sum("cnt", alias_name="cnt"),
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[("cnt", "descending"), ("word", "ascending")])
        return batch.take(idx[:k])

    tops = tot.map_batches(block_topk, batch_format="pyarrow", **remote_args())
    parts_tbls = list(tops.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts_tbls:
        return pa.table({"rank": pa.array([], pa.int64()), "word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    df: pd.DataFrame = pa.concat_tables(parts_tbls).to_pandas()
    df = df.sort_values(["cnt", "word"], ascending=[False, True]).head(k).reset_index(drop=True)
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------------- decontamination


class Decontaminate:
    """Benchmark decontamination: drop documents containing any
    contamination phrase as a substring.

    Actor-pool stage: phrases ship once (``ray.put`` ref in
    ``fn_constructor_kwargs``) and each actor compiles ONE re2 alternation in
    ``__init__``, so matching is a single vectorized
    ``match_substring_regex`` pass per batch regardless of phrase count.
    For benchmark sets beyond re2's pattern size (~millions of n-grams),
    shard the phrase list across sequential passes, or switch to word-shingle
    hash probing (rolling hash per n-gram + ``np.isin`` against a broadcast
    hash array) at the cost of word-boundary rather than substring semantics.
    """

    def __init__(self, phrases_ref=None, phrases=None, column: str = "text", invert: bool = False):
        import re as _re

        if phrases_ref is not None:
            import ray

            phrases = ray.get(phrases_ref)
        # drop empty phrases: '' is a substring of everything, and 'foo|'
        # as an alternation arm would silently match every document
        # longest-first so overlapping alternatives can't shadow each other
        self.pattern = "|".join(_re.escape(p) for p in sorted({p for p in phrases if p}, key=lambda s: (-len(s), s)))
        self.column = column
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.pattern:  # empty benchmark set: nothing is contaminated
            return batch if not self.invert else batch.slice(0, 0)
        text = batch[self.column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        hit = pc.match_substring_regex(text, self.pattern)
        return batch.filter(hit if self.invert else pc.invert(hit))


def decontaminate(ds, phrases: list[str], column: str = "text", invert: bool = False, use_actors: bool = True):
    """Filter out docs containing any of ``phrases`` (``invert=True`` keeps
    ONLY contaminated docs, for audits). See ``Decontaminate`` for the scale
    contract. ``use_actors=False`` runs the same filter as a stateless task
    pool — the pattern compiles ONCE on the driver and pickles into each
    task — the right choice inside compositions that feed a downstream
    groupby, per the actor-pool/groupby deadlock rule in CLAUDE.md."""
    import ray

    from .._rayutil import pool_size, remote_args

    if not use_actors:
        # build ONCE on the driver (state is just the pattern string, cheap
        # to pickle into each task) instead of re-sorting/escaping per batch
        fn = Decontaminate(phrases=list(phrases), column=column, invert=invert)
        return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    ref = ray.put(list(phrases))
    return ds.map_batches(
        Decontaminate,
        fn_constructor_kwargs={"phrases_ref": ref, "column": column, "invert": invert},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        **remote_args(),
    )


# ------------------------------------------------------- repetition signal


def split_nonempty_docs(batch: pa.Table, column: str = "text", id_col: str = "doc_id") -> tuple[pa.Array, pa.Array]:
    """Shared word-split preamble: drop docs empty after trim, return
    (filtered ids, per-doc word lists). The trim + ASCII ``\\s+`` split here
    is THE tokenization every word-level SQL oracle mirrors
    (string_split_regex(trim(text), '\\s+')) — change both together."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(text)
    nonempty = pc.not_equal(trimmed, "")
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    return ids.filter(nonempty), pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")


def word_repetition(batch: pa.Table, column: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Per-doc duplicate-word ratio (a Gopher-style repetition quality
    signal): ``1 - distinct_words / total_words``. Exact — distinct counts
    come from Arrow dictionary codes (no hash collisions) — and vectorized:
    one lexsort + bincount over the flat word buffer per batch. Docs that
    are empty after trim are dropped (no words to measure)."""
    ids, words = split_nonempty_docs(batch, column, id_col)
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(counts)
    flat = words.flatten()
    codes = pc.dictionary_encode(flat).indices.to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(n_docs), counts)
    order = np.lexsort((codes, doc_of))
    c, d = codes[order], doc_of[order]
    newgrp = np.ones(len(c), dtype=bool)
    newgrp[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    distinct = np.bincount(d[newgrp], minlength=n_docs).astype(np.int64)
    ratio = 1.0 - distinct.astype(np.float64) / counts.astype(np.float64)
    return pa.table(
        {
            "doc_id": ids,
            "n_words": pa.array(counts, pa.int64()),
            "n_distinct": pa.array(distinct, pa.int64()),
            "dup_ratio": pc.round(pa.array(ratio, pa.float64()), ndigits=6),
        }
    )


# ------------------------------------------------------- familiarity score


def word_familiarity(ds, column: str = "text", id_col: str = "doc_id", num_buckets: int = 64):
    """Per-doc corpus-familiarity score — the perplexity-proxy quality
    filter: ``familiarity = sum over word occurrences of corpus_count(word)``
    (rare-word-heavy docs score low). Returns a Dataset of
    (doc_id, n_words, familiarity, mean_freq).

    ONE pass over the corpus, metadata-only shuffle: per-batch unique
    (word_hash, doc_id, cnt) partials bucket on ``content_hash(word)``
    (injectivity over observed words is the same assumption
    ``duplicate_spans`` pins by test), so ALL of a word's rows co-locate in
    its bucket — the bucket fold derives the word's global corpus frequency
    as the plain sum of its per-doc counts, no separate vocabulary pass or
    join needed. A tiny groupby(doc_id) then folds per-bucket partials.
    Raw text never shuffles; shuffle rows are 4 int64s per unique
    (word, doc) pair. ``doc_id`` must be integer (any sign).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")

    def doc_word_rows(batch: pa.Table) -> pa.Table:
        ids, words = split_nonempty_docs(batch, column, id_col)
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = words.flatten()
        h = content_hash(flat).view(np.int64)
        doc_of = np.repeat(np.arange(len(counts)), counts)
        pairs = np.stack([h, ids_np[doc_of]], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(uniq[:, 0].view(np.uint64) % np.uint64(num_buckets), pa.int64()),
                "word_h": pa.array(uniq[:, 0], pa.int64()),
                "doc_id": pa.array(uniq[:, 1], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    doc_side = ds.map_batches(doc_word_rows, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        docs = g.groupby(["word_h", "doc_id"], as_index=False)["cnt"].sum()
        # all rows of a word are in this bucket -> its corpus frequency is
        # just the sum of its per-doc counts
        freq = docs.groupby("word_h")["cnt"].transform("sum").to_numpy(np.int64)
        docs["fam"] = docs["cnt"].to_numpy(np.int64) * freq
        return docs.groupby("doc_id", as_index=False).agg(n_words=("cnt", "sum"), familiarity=("fam", "sum"))

    from .fastagg import fast_map_groups

    merged = fast_map_groups(doc_side, "bucket", merge_bucket)
    tot = fast_groupby(
        merged,
        "doc_id",
        Sum("n_words", alias_name="n_words"), Sum("familiarity", alias_name="familiarity"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch["n_words"].to_numpy(zero_copy_only=False).astype(np.float64)
        f = batch["familiarity"].to_numpy(zero_copy_only=False).astype(np.float64)
        return batch.append_column("mean_freq", pc.round(pa.array(f / n, pa.float64()), ndigits=6))

    return tot.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


# ------------------------------------------------- grouped vocabulary top-k


def vocab_topk_by_group(ds, k: int = 5, group: str = "source", column: str = "text") -> pa.Table:
    """Top-k words per group (ties by word asc) — the per-stratum variant of
    ``vocab_topk`` for corpus composition reports.

    Plan: per-batch (group, word, cnt) Arrow partials -> one multi-key
    groupby over |groups x vocab| rows -> per-block per-group top-k (at most
    k x |groups| rows leave each block) -> tiny driver fold. Returns a
    pyarrow Table (group col, rank, word, cnt) ordered by (group, rank)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        # the shared tokenizer keeps this null-safe and oracle-aligned
        grp, words = split_nonempty_docs(batch, column, id_col=group)
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                group: grp.take(pa.array(np.repeat(np.arange(len(counts)), counts), pa.int64())),
                "word": words.flatten(),
            }
        )
        agg = t.group_by([group, "word"]).aggregate([("word", "count")])
        return pa.table({group: agg[group], "word": agg["word"], "cnt": agg["word_count"].cast(pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    tot = fast_groupby(
        parts,
        [group, "word"],
        Sum("cnt", alias_name="cnt"),
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:  # empty shuffle block: keep the schema intact
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["cnt", "word"], ascending=[False, True]).groupby(group, sort=False).head(k)
        return pa.Table.from_pandas(df, schema=batch.schema, preserve_index=False)

    tops = tot.map_batches(block_topk, batch_format="pyarrow", **remote_args())
    blocks = list(tops.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not blocks:
        return pa.table({group: pa.array([], pa.string()), "rank": pa.array([], pa.int64()),
                         "word": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    df: pd.DataFrame = pa.concat_tables(blocks).to_pandas()
    df = df.sort_values(["cnt", "word"], ascending=[False, True]).groupby(group, sort=False).head(k)
    df["rank"] = df.groupby(group)["cnt"].rank(method="first", ascending=False).astype(np.int64)
    df = df.sort_values([group, "rank"]).reset_index(drop=True)
    return pa.Table.from_pandas(df[[group, "rank", "word", "cnt"]], preserve_index=False)


def tfidf_top_terms(ds, k: int = 5, group: str = "source", column: str = "text",
                    num_buckets: int = 128) -> pa.Table:
    """Per-group TF-IDF signature terms: score(word, g) = tf(word, g) *
    ln(n_groups / df(word)) — the classic "what words characterize this
    source" report (df counts GROUPS containing the word, so corpus-wide
    boilerplate scores 0). Returns a pyarrow Table (group, word, tf, df,
    score) with the top ``k`` terms per group by (score DESC, word ASC).

    Bitwise SQL parity: tf/df/n_groups are exact ints; the score is the
    mirrored expression CAST(tf AS DOUBLE) * ln(CAST(n AS DOUBLE) / df)
    with ln via ``math.log`` per distinct df (the BM25 libm rule — never
    np.log's SIMD path).

    Plan: per-batch (group, word, cnt) Arrow partials (the
    `vocab_topk_by_group` combiner — raw text never shuffles); ONE
    ``groupby(bucket)`` (bucket = content_hash(word) mod num_buckets)
    folds each bucket VECTORIZED in pandas — cross-batch tf re-agg, df =
    per-word distinct-group count (every occurrence of a word lands in
    one bucket), score; then per-block per-group top-k partials and a
    tiny driver fold."""
    import math

    import pandas as pd

    from .._rayutil import remote_args

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    n_groups = ds.groupby(group).count().count()
    if n_groups == 0:
        return pa.table({group: pa.array([], pa.string()), "word": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64()), "df": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})

    def partial(batch: pa.Table) -> pa.Table:
        grp, words = split_nonempty_docs(batch, column, id_col=group)
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table(
            {
                group: grp.take(pa.array(np.repeat(np.arange(len(counts)), counts), pa.int64())),
                "word": words.flatten(),
            }
        )
        agg = t.group_by([group, "word"]).aggregate([("word", "count")])
        bucket = (content_hash(agg["word"].combine_chunks()) % np.uint64(num_buckets)).astype(np.int64)
        return pa.table({
            "bucket": pa.array(bucket, pa.int64()),
            group: agg[group],
            "word": agg["word"],
            "cnt": agg["word_count"].cast(pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        tf = g.groupby(["word", group], as_index=False)["cnt"].sum().rename(columns={"cnt": "tf"})
        df_ = tf.groupby("word")[group].transform("count").to_numpy().astype(np.int64)
        idf = {int(d): math.log(float(n_groups) / float(d)) for d in np.unique(df_)}
        tf["df"] = df_
        tf["tf"] = tf["tf"].astype("int64")
        tf["score"] = tf["tf"].to_numpy().astype(np.float64) * np.array([idf[int(d)] for d in df_])
        return tf[[group, "word", "tf", "df", "score"]]

    scored = parts.groupby("bucket").map_groups(bucket_fold, batch_format="pandas", **remote_args())

    def block_topk(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        df = batch.to_pandas()
        df = df.sort_values(["score", "word"], ascending=[False, True]).groupby(group, sort=False).head(k)
        return pa.Table.from_pandas(df, schema=batch.schema, preserve_index=False)

    tops = scored.map_batches(block_topk, batch_format="pyarrow", **remote_args())
    blocks = list(tops.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not blocks:
        return pa.table({group: pa.array([], pa.string()), "word": pa.array([], pa.string()),
                         "tf": pa.array([], pa.int64()), "df": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    out: pd.DataFrame = pa.concat_tables(blocks).to_pandas()
    out = out.sort_values(["score", "word"], ascending=[False, True]).groupby(group, sort=False).head(k)
    out = out.sort_values([group, "score", "word"], ascending=[True, False, True]).reset_index(drop=True)
    return pa.Table.from_pandas(out[[group, "word", "tf", "df", "score"]], preserve_index=False)


# ------------------------------------------------------------- PII redaction

# RE2 syntax, shared verbatim by pyarrow.compute (RE2) and DuckDB (also
# RE2), so the SQL oracle can apply the IDENTICAL patterns. Order matters:
# emails redact before phone-ish digit runs so an address's digits don't
# get half-eaten by the phone pattern. The phone pattern requires phone
# STRUCTURE — a leading "+", or NANP 3-3-4 grouping with separators — so
# year ranges ("2010 - 2020"), datetimes and plain digit runs survive;
# the ipv4 pattern cannot distinguish dotted version strings from
# addresses (both are four dotted octets) — pass a custom ``patterns``
# list to opt out of any class.
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("phone", r"(\+\d[\d() \-]{7,}\d|\(?\d{3}\)?[ \-.]\d{3}[ \-.]\d{4})"),
]


def redact_pii(
    batch: pa.Table,
    column: str = "text",
    replacement: str = "[PII]",
    out: str = "redacted",
    patterns: list[tuple[str, str]] | None = None,
) -> pa.Table:
    """Vectorized PII scrub for training corpora: replace email / IPv4 /
    phone-shaped spans with ``replacement`` and count the redactions.

    Pure compiled-RE2 Arrow kernels per batch (no Python over rows) — a
    stateless ``map_batches`` stage. Appends ``out`` (scrubbed text) and
    ``n_pii`` (total spans redacted per row). ``patterns`` defaults to the
    module-level ``PII_PATTERNS`` so tests and oracles share it; pass a
    subset (or additions) to tune the scrub."""
    text = batch[column]
    total = None
    for _name, pat in patterns if patterns is not None else PII_PATTERNS:
        n = pc.count_substring_regex(text, pat)
        total = n if total is None else pc.add(total, n)
        text = pc.replace_substring_regex(text, pat, replacement)
    return batch.append_column(out, text).append_column("n_pii", total.cast(pa.int64()))


def dedup_lines(batch: pa.Table, column: str = "text", sep: str = "\n",
                out: str = "text_dedup") -> pa.Table:
    """Remove duplicate ``sep``-separated segments WITHIN each document,
    keeping the first occurrence in order — the C4/RefinedWeb-style
    boilerplate scrub (repeated nav lines, footers) expressed per-batch and
    embarrassingly parallel: no shuffle, no cross-document state.

    Vectorized end to end: one Arrow split, one hash-based keep-first mask
    over (doc, segment) pairs (pandas ``duplicated``), ListArray re-offset,
    one Arrow ``binary_join``. Appends ``out`` (the deduped text) and
    ``{out}_dropped`` (segments removed). Splitting semantics match SQL
    ``str_split`` exactly (consecutive separators yield empty segments,
    which dedup like any other value).
    """
    import pandas as pd

    col = batch[column].combine_chunks()
    if col.null_count:
        raise ValueError(f"dedup_lines: {column!r} contains nulls — filter or fill first")
    parts = pc.split_pattern(col, sep)
    flat = pc.list_flatten(parts)  # slice-offset-safe (never .values)
    counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    dup = pd.DataFrame({"d": doc_idx, "s": flat.to_pandas()}).duplicated(["d", "s"]).to_numpy()
    kept = flat.filter(pa.array(~dup))
    kept_counts = np.bincount(doc_idx[~dup], minlength=len(counts)).astype(np.int64)
    offsets = np.zeros(len(counts) + 1, dtype=np.int32)
    np.cumsum(kept_counts, out=offsets[1:])
    rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
    joined = pc.binary_join(rebuilt, sep)
    dropped = (counts - kept_counts).astype(np.int64)
    return batch.append_column(out, joined).append_column(
        f"{out}_dropped", pa.array(dropped, pa.int64())
    )


def normalize_text(batch: pa.Table, column: str = "text", out: str = "text_norm") -> pa.Table:
    """Canonical text normalization before hashing/dedup: lowercase,
    collapse every whitespace run to a single space, trim. Three Arrow
    kernels, zero per-row Python; SQL mirror is
    ``lower(trim(regexp_replace(col, '\\s+', ' ', 'g')))`` (both engines
    run RE2, so the ``\\s`` classes agree)."""
    col = batch[column]
    t = pc.replace_substring_regex(col, r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    t = pc.utf8_lower(t)
    return batch.append_column(out, t)


# entity decode order matters: '&amp;' must decode LAST so '&amp;lt;' yields
# the literal '&lt;' rather than double-decoding to '<' (HTML spec order).
MARKUP_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def strip_markup(batch: pa.Table, column: str = "text", out: str = "text_plain") -> pa.Table:
    """C4-style markup scrub for web-scraped corpora: drop HTML/XML tags
    (``<[^>]*>`` → space), decode the six common entities (``&amp;`` last —
    see ``MARKUP_ENTITIES``), collapse whitespace runs, trim. Pure Arrow
    RE2 kernels per batch — a stateless ``map_batches`` stage, no shuffle.

    Appends ``out`` (plain text) and ``n_tags`` (tags stripped per row).
    SQL mirror (both engines run RE2, so the classes agree):
    ``trim(regexp_replace(replace(... regexp_replace(text, '<[^>]*>', ' ',
    'g') ...), '\\s+', ' ', 'g'))`` with the replaces nested in
    ``MARKUP_ENTITIES`` order, and
    ``len(regexp_extract_all(text, '<[^>]*>'))`` for the tag count."""
    text = batch[column]
    n_tags = pc.count_substring_regex(text, r"<[^>]*>")
    t = pc.replace_substring_regex(text, r"<[^>]*>", " ")
    for ent, rep in MARKUP_ENTITIES:
        t = pc.replace_substring(t, ent, rep)
    t = pc.replace_substring_regex(t, r"\s+", " ")
    t = pc.utf8_trim(t, " ")
    return batch.append_column(out, t).append_column("n_tags", n_tags.cast(pa.int64()))


def _word_ngram_strings(arr: pa.Array, n: int) -> tuple[pa.Array, np.ndarray]:
    """Per-doc word n-gram STRINGS (space-joined n consecutive words; plain
    single-space split so SQL ``str_split(text, ' ')`` reproduces the
    tokenization exactly). Vectorized: one split, one gather of n shifted
    index arrays, one ``binary_join``. Returns (flat n-grams, per-doc
    n-gram counts). Docs with < n words contribute none."""
    words = pc.split_pattern(arr, " ")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    doc_offs = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(counts, out=doc_offs[1:])
    ng_counts = np.maximum(counts - n + 1, 0)
    total = int(ng_counts.sum())
    if total == 0:
        return pa.array([], pa.string()), ng_counts
    starts = np.repeat(doc_offs[:-1], ng_counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(np.r_[0, ng_counts[:-1]]), ng_counts)
    )
    idx = (starts[:, None] + np.arange(n, dtype=np.int64)).ravel()
    gathered = flat.take(pa.array(idx, pa.int64()))
    offsets = pa.array(np.arange(0, (total + 1) * n, n, dtype=np.int32), pa.int32())
    lists = pa.ListArray.from_arrays(offsets, gathered)
    return pc.binary_join(lists, " "), ng_counts


class DecontaminateNgrams:
    """Benchmark decontamination by word n-gram OVERLAP (the industry rule:
    a doc sharing any 13-gram with an eval set is contaminated) — stricter
    than phrase substring matching and robust to partial overlaps.

    Actor-pool stage: the benchmark's DISTINCT n-gram strings ship once
    (`ray.put`; pandas hash-set probe per batch is exact — no hash-collision
    false positives, so the SQL oracle reproduces it cell-for-cell). Per
    batch: vectorized n-gram construction (`_word_ngram_strings`), one
    `isin`, one per-doc any-fold. Docs with < n words are never
    contaminated. At benchmark sets beyond driver memory (~10^8 n-grams),
    swap the broadcast set for the sharded key-file probe of
    `semi_join_streaming` over rolling hashes — documented trade: 64-bit
    collisions become possible.
    """

    def __init__(self, ngrams_ref=None, ngrams=None, n: int = 13,
                 column: str = "text", invert: bool = False):
        import pandas as pd

        if ngrams_ref is not None:
            import ray

            ngrams = ray.get(ngrams_ref)
        self.index = pd.Index(np.asarray(ngrams, dtype=object)).unique()
        self.n = n
        self.column = column
        self.invert = invert

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        col = batch[self.column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ngrams, ng_counts = _word_ngram_strings(col, self.n)
        if len(ngrams) == 0 or len(self.index) == 0:
            contaminated = np.zeros(len(batch), dtype=bool)
        else:
            member = pd.Series(ngrams.to_pandas()).isin(self.index).to_numpy()
            doc_idx = np.repeat(np.arange(len(ng_counts), dtype=np.int64), ng_counts)
            contaminated = np.bincount(doc_idx[member], minlength=len(ng_counts)).astype(bool)
        return batch.filter(pa.array(contaminated if self.invert else ~contaminated))


def decontaminate_ngrams(ds, bench_texts, n: int = 13, column: str = "text",
                         invert: bool = False, max_bench_ngrams: int = 1 << 27):
    """Drop documents sharing any word n-gram with the benchmark texts
    (``invert=True`` keeps only the contaminated docs, for audits).
    ``bench_texts`` is a list/array of benchmark strings — eval sets are
    small relative to the corpus; their distinct n-grams broadcast once.
    Guarded at ``max_bench_ngrams`` (the broadcast-or-shard boundary)."""
    import ray

    bench_arr = pa.array(list(bench_texts), pa.string())
    ngrams, _ = _word_ngram_strings(bench_arr, n)
    uniq = pc.unique(ngrams)
    if len(uniq) > max_bench_ngrams:
        raise ValueError(
            f"benchmark set has {len(uniq)} distinct {n}-grams (> {max_bench_ngrams}): "
            "broadcast would not fit — shard the n-gram set (see semi_join_streaming)"
        )
    ref = ray.put(uniq.to_numpy(zero_copy_only=False))
    from .._rayutil import pool_size, remote_args

    return ds.map_batches(
        DecontaminateNgrams,
        fn_constructor_kwargs={"ngrams_ref": ref, "n": n, "column": column, "invert": invert},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        **remote_args(),
    )


def ngram_topk(ds, n: int = 2, k: int = 100, column: str = "text") -> pa.Table:
    """Top-k most frequent word n-grams corpus-wide (ties broken by n-gram
    asc) — collocation mining / repeated-boilerplate discovery. Same scale
    plan as `vocab_topk`: per-batch (n-gram, cnt) partials (raw text never
    shuffles), one groupby over |distinct n-grams| rows, per-block top-k,
    tiny driver fold. N-gram construction is `_word_ngram_strings` — the
    plain-space-split semantics SQL reproduces exactly."""
    import pandas as pd
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ngrams, _ = _word_ngram_strings(col, n)
        if len(ngrams) == 0:
            return pa.table({"ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        vc = ngrams.value_counts()
        return pa.table({"ngram": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())})

    tot = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "ngram",
        Sum("cnt", alias_name="cnt"),
    )
    )

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[("cnt", "descending"), ("ngram", "ascending")])
        return batch.take(idx[:k])

    tops = tot.map_batches(block_topk, batch_format="pyarrow", **remote_args())
    parts = list(tops.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    if not parts:
        return pa.table({"rank": pa.array([], pa.int64()), "ngram": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
    df: pd.DataFrame = pa.concat_tables(parts).to_pandas()
    df = df.sort_values(["cnt", "ngram"], ascending=[False, True]).head(k).reset_index(drop=True)
    df.insert(0, "rank", np.arange(1, len(df) + 1, dtype=np.int64))
    return pa.Table.from_pandas(df, preserve_index=False)


def _char_trigram_codes(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc uint32 codes of consecutive UTF-8 byte trigrams
    (b0<<16 | b1<<8 | b2), never crossing doc boundaries. Returns
    (flat codes, per-doc trigram counts). Vectorized over the batch's
    concatenated byte buffer."""
    data, offs = _utf8_block(arr)
    lens = np.diff(offs)
    tri_counts = np.maximum(lens - 2, 0)
    total = int(tri_counts.sum())
    if total == 0:
        return np.zeros(0, np.uint32), tri_counts
    starts = np.repeat(offs[:-1], tri_counts) + (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(np.r_[0, tri_counts[:-1]]), tri_counts)
    )
    d = data.astype(np.uint32)
    codes = (d[starts] << np.uint32(16)) | (d[starts + 1] << np.uint32(8)) | d[starts + 2]
    return codes, tri_counts


def train_trigram_lm(ds, column: str = "text", min_count: int = 1):
    """Corpus byte-trigram frequency model: ONE metadata pass — per-batch
    (trigram code, count) cells (|distinct| <= alphabet^3, thousands in
    practice, never row-scale), one groupby — then UNCONDITIONAL log-probs
    lp(t) = ln(cnt(t) / total) from exact integer counts. (Unconditional,
    deliberately: an unsmoothed conditional P(c3|c1c2) scores a gibberish
    trigram whose bigram prefix is unique as probability 1.0 — the
    opposite of a quality signal.) Returns (codes sorted asc, logprobs,
    floor_lp) where floor_lp = ln(1 / (total + 1)) scores unseen trigrams."""
    import math

    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    def cells(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, _ = _char_trigram_codes(col)
        u, c = np.unique(codes, return_counts=True)
        return pa.table({"code": pa.array(u.astype(np.int64)), "c": pa.array(c.astype(np.int64))})

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "code",
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    codes = dist["code"].to_numpy(dtype=np.int64)
    cnt = dist["c"].to_numpy(dtype=np.int64)
    keep = cnt >= min_count
    codes, cnt = codes[keep], cnt[keep]
    order = np.argsort(codes)
    codes, cnt = codes[order], cnt[order]
    total = float(cnt.sum())
    lp = np.log(cnt.astype(np.float64) / total)
    floor_lp = math.log(1.0 / (total + 1.0))
    return codes, lp, floor_lp


def trigram_lm_score(ds, lm, column: str = "text", out: str = "lm_score"):
    """Per-document mean trigram log-prob under a `train_trigram_lm` model —
    the cheap model-based quality gate (gibberish, wrong-language, and
    binary-junk docs score far below corpus-like text). The model
    broadcasts once (`ray.put`); scoring is stateless and vectorized, and
    each doc's sum folds its own trigrams in position order — the score is
    a pure per-row function, bit-identical on any plan. Docs with < 3
    bytes score the floor. Appends ``out`` (float64)."""
    import ray

    from .._rayutil import remote_args

    lm_ref = ray.put(lm)

    def score(batch: pa.Table) -> pa.Table:
        codes_s, lp, floor_lp = ray.get(lm_ref)
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        codes, tri_counts = _char_trigram_codes(col)
        vals = np.full(len(codes), floor_lp, dtype=np.float64)
        if len(codes):
            pos = np.searchsorted(codes_s, codes.astype(np.int64))
            pos_c = np.minimum(pos, len(codes_s) - 1) if len(codes_s) else pos
            hit = (codes_s[pos_c] == codes) if len(codes_s) else np.zeros(len(codes), bool)
            vals[hit] = lp[pos_c[hit]]
        doc_offs = np.zeros(len(tri_counts) + 1, dtype=np.int64)
        np.cumsum(tri_counts, out=doc_offs[1:])
        # clip: a trailing zero-trigram doc's offset == len(vals), which
        # reduceat rejects; those lanes are overwritten by the where below
        starts = np.minimum(doc_offs[:-1], max(len(vals) - 1, 0))
        sums = np.add.reduceat(vals, starts) if len(vals) else np.zeros(len(tri_counts))
        sums = np.where(tri_counts > 0, sums, floor_lp)
        mean = np.where(tri_counts > 0, sums / np.maximum(tri_counts, 1), floor_lp)
        return batch.append_column(out, pa.array(mean, pa.float64()))

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def _deletion_variants(words: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """FastSS deletion neighborhood: for each word, itself plus every
    single-character deletion. Returns (variant strings, word index per
    variant). Vectorized per (length) class — the Python loop is over
    distinct LENGTHS and deletion positions, never over words."""
    out_v: list[np.ndarray] = []
    out_i: list[np.ndarray] = []
    lens = np.char.str_len(words.astype(str))
    words = words.astype(str)
    idx_all = np.arange(len(words), dtype=np.int64)
    out_v.append(words)  # the word itself (covers pure insert/delete pairs)
    out_i.append(idx_all)
    for L in np.unique(lens):
        if L < 2:
            continue
        sel = idx_all[lens == L]
        w = words[sel]
        # (n, L) char matrix
        m = w.view("U1").reshape(len(w), -1)[:, :L]
        for i in range(L):
            var = np.hstack([m[:, :i], m[:, i + 1:]]).view(f"U{L-1}").ravel()
            out_v.append(var)
            out_i.append(sel)
    return np.concatenate(out_v), np.concatenate(out_i)


def _editdist1(a: str, b: str) -> bool:
    """Exact edit-distance <= 1 check (lengths differ by at most 1)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def spelling_variants(ds, column: str = "text", min_len: int = 4,
                      max_vocab: int = 1 << 24):
    """Typo/spelling-variant pairs in the corpus vocabulary: distinct word
    pairs at edit distance <= 1 (substitution, insertion, or deletion) —
    normalization-table mining for noisy web text. Words shorter than
    ``min_len`` are skipped (short words collide constantly and aren't
    typos).

    Scale shape: the corpus reduces to its DISTINCT vocabulary first (the
    `vocab_topk` metadata plan — raw text never shuffles; guarded at
    ``max_vocab``); the FastSS deletion neighborhood blocks candidates
    (|word|+1 variants per word, vectorized per length class), one
    variant-bucket groupby pairs them, and each candidate is verified with
    the exact edit-distance-1 check — no all-pairs anywhere. Returns a
    driver DataFrame (w1, w2) with w1 < w2."""
    import pandas as pd
    from ray.data.aggregate import Count

    from .._rayutil import remote_args

    def vocab_cells(batch: pa.Table) -> pa.Table:
        t = batch[column]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_trim_whitespace(t), r"\s+")
        flat = pc.list_flatten(words)
        flat = flat.filter(pc.greater_equal(pc.utf8_length(flat), min_len))
        return pa.table({"w": flat.unique()})

    vocab_ds = (fast_groupby(
        ds.map_batches(vocab_cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "w",
        Count(alias_name="_n"),
    )
    )

    def variants(batch: pa.Table) -> pa.Table:
        w = batch["w"].to_numpy(zero_copy_only=False).astype(str)
        if len(w) > max_vocab:
            raise ValueError(f"spelling_variants: vocab block {len(w)} > {max_vocab}")
        v, i = _deletion_variants(w)
        return pa.table({"variant": pa.array(v), "word": pa.array(w[i])})

    var_ds = vocab_ds.map_batches(variants, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def pair_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ws = np.unique(g["word"].to_numpy().astype(str))
        if len(ws) > 4096:
            raise ValueError(
                f"spelling_variants: variant bucket {g['variant'].iloc[0]!r} holds "
                f"{len(ws)} words — raise min_len to block the hot collisions"
            )
        if len(ws) < 2:
            return pd.DataFrame({"w1": pd.Series(dtype=str), "w2": pd.Series(dtype=str)})
        a, b = np.triu_indices(len(ws), k=1)
        keep = [(ws[x], ws[y]) for x, y in zip(a, b) if _editdist1(ws[x], ws[y])]
        if not keep:
            return pd.DataFrame({"w1": pd.Series(dtype=str), "w2": pd.Series(dtype=str)})
        return pd.DataFrame(keep, columns=["w1", "w2"])

    pairs = var_ds.groupby("variant").map_groups(pair_bucket, batch_format="pandas", **remote_args())
    df = pairs.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({"w1": pd.Series(dtype=str), "w2": pd.Series(dtype=str)})
    return df.drop_duplicates().sort_values(["w1", "w2"]).reset_index(drop=True)


def log_odds_words(ds, group: str, a: str, b: str, column: str = "text",
                   min_count: int = 10):
    """Differential vocabulary: per-word smoothed log-odds ratio between
    two corpus slices — "what words distinguish source A from B", the
    mixture/contamination forensics view. Counts are exact int64 from one
    metadata (word, group) groupby (raw text never shuffles); the score

        lo = ln((ca + 0.5) / (A - ca + 0.5)) - ln((cb + 0.5) / (B - cb + 0.5))

    is a FIXED float expression over exact ints (libm ln both engines) —
    bitwise-equal to the SQL oracle. Words with total count < ``min_count``
    across both slices drop. Returns a driver DataFrame
    ``(word, ca, cb, log_odds)`` sorted by word."""
    import math

    import pandas as pd
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    def cells(batch: pa.Table) -> pa.Table:
        g = batch[group].combine_chunks()
        keep = pc.is_in(g, value_set=pa.array([a, b]))
        sub = batch.filter(keep)
        t = sub[column]
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        words = pc.split_pattern_regex(pc.utf8_trim_whitespace(t), r"\s+")
        counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(words)
        gg = sub[group].combine_chunks().take(
            pa.array(np.repeat(np.arange(len(counts)), counts), pa.int64())
        )
        tbl = pa.table({"w": flat, "g": gg}).filter(pc.greater(pc.utf8_length(flat), 0))
        out = tbl.group_by(["w", "g"]).aggregate([([], "count_all")])
        return out.rename_columns(["w", "g", "c"])

    dist = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["w", "g"],
        Sum("c", alias_name="c"),
    )
        .to_pandas()
    )
    wide = dist.pivot_table(index="w", columns="g", values="c",
                            aggfunc="sum", fill_value=0)
    ca = wide[a].to_numpy(dtype=np.int64) if a in wide else np.zeros(len(wide), np.int64)
    cb = wide[b].to_numpy(dtype=np.int64) if b in wide else np.zeros(len(wide), np.int64)
    A, B = int(ca.sum()), int(cb.sum())  # totals over the FULL slices, pre-filter
    keep = (ca + cb) >= min_count
    words = wide.index.to_numpy().astype(str)[keep]
    ca, cb = ca[keep], cb[keep]
    # mirrored op-for-op by the SQL oracle (math.log per word — libm ln)
    lo = np.array([
        math.log((int(x) + 0.5) / (A - int(x) + 0.5)) - math.log((int(y) + 0.5) / (B - int(y) + 0.5))
        for x, y in zip(ca, cb)
    ], dtype=np.float64) if len(ca) else np.zeros(0, np.float64)
    out = pd.DataFrame({"word": words, "ca": ca, "cb": cb, "log_odds": lo})
    return out.sort_values("word").reset_index(drop=True)


def remove_boilerplate_lines(
    ds,
    min_occurrences: int = 3,
    column: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    max_broadcast_lines: int = 1 << 22,
):
    """CROSS-document boilerplate scrub (the C4 rule): drop every line
    whose exact text appears in >= ``min_occurrences`` line slots across
    the whole corpus — repeated navs, footers, cookie banners. Complements
    ``dedup_lines`` (within-doc keep-first).

    Scale plan: pass 1 pre-aggregates each batch to its DISTINCT
    (line, count) rows before ONE groupby(line) — the vocab_topk idiom, so
    repeated boilerplate collapses before it ships; only lines crossing the
    threshold broadcast back (guarded by ``max_broadcast_lines`` — if a
    corpus exceeds it, raise ``min_occurrences``). Pass 2 re-splits each
    batch and drops members with a vectorized exact-string ``Index.isin``
    probe (the decontaminate rule: probe exact STRINGS, never hashes —
    hash collisions would silently diverge from the SQL oracle).

    Returns a Dataset of ``(id_col, text_clean, n_dropped)``; a doc whose
    every line is boilerplate comes back as ''. Counting includes empty
    lines (consecutive separators), exactly like SQL string_split.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    from .._rayutil import remote_args

    if min_occurrences < 2:
        raise ValueError(f"min_occurrences must be >= 2, got {min_occurrences}")

    def line_counts(batch: pa.Table) -> pa.Table:
        col = batch[column].combine_chunks()
        if col.null_count:
            raise ValueError(f"remove_boilerplate_lines: {column!r} contains nulls")
        flat = pc.list_flatten(pc.split_pattern(col, sep))
        t = pa.table({"line": flat})
        return t.group_by("line").aggregate([([], "count_all")]).rename_columns(["line", "c_p"])

    freq = (fast_groupby(
        ds.map_batches(line_counts, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "line",
        Sum("c_p", alias_name="c"),
    )
        .filter(lambda r: r["c"] >= min_occurrences, **remote_args())
    )
    fpd = freq.to_pandas()
    if len(fpd) > max_broadcast_lines:
        raise ValueError(
            f"{len(fpd)} boilerplate lines exceed max_broadcast_lines="
            f"{max_broadcast_lines}; raise min_occurrences"
        )
    boiler = fpd["line"].to_numpy(dtype=object) if len(fpd) else np.zeros(0, object)
    boiler_ref = ray.put(pd.Index(boiler.astype(str)) if len(boiler) else pd.Index([], dtype=object))

    def scrub(batch: pa.Table) -> pa.Table:
        bindex = ray.get(boiler_ref)
        col = batch[column].combine_chunks()
        parts = pc.split_pattern(col, sep)
        flat = pc.list_flatten(parts)
        counts = pc.list_value_length(parts).to_numpy(zero_copy_only=False).astype(np.int64)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        drop = (
            pd.Index(flat.to_pandas().astype(str)).isin(bindex)
            if len(bindex) and len(doc_idx)
            else np.zeros(len(doc_idx), bool)
        )
        kept = flat.filter(pa.array(~drop))
        kept_counts = np.bincount(doc_idx[~drop], minlength=len(counts)).astype(np.int64)
        offsets = np.zeros(len(counts) + 1, dtype=np.int32)
        np.cumsum(kept_counts, out=offsets[1:])
        rebuilt = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        ids = batch[id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                id_col: ids.cast(pa.int64()),
                "text_clean": pc.binary_join(rebuilt, sep),
                "n_dropped": pa.array((counts - kept_counts).astype(np.int64)),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def readability(ds, id_col: str = "doc_id", column: str = "text"):
    """Flesch-style readability score per document from three exact integer
    counts — words (nonempty ``\\s+`` split tokens), sentence marks
    (``[.!?]+`` runs, floored at 1), and syllable proxies (``[aeiouy]+``
    vowel runs in the lowercased text). Returns a Dataset of
    ``(id, n_words, n_sentences, n_syllables, score)`` where

        score = 206.835 - 1.015*(words/sentences) - 84.6*(syllables/max(words,1))

    Every division is a single exact-int double division and the constant
    expression tree mirrors the SQL oracle op-for-op (bitwise reproducible;
    the per-row-division rule). Counting regexes run on RE2 semantics both
    sides. Stateless vectorized map_batches — no shuffle."""
    from .._rayutil import remote_args

    def score(batch: pa.Table) -> pa.Table:
        text = batch[column]
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        w = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        # an all-whitespace doc splits to [''] (1 token) — zero it like SQL's
        # CASE WHEN trim = '' THEN 0
        empty = pc.equal(trimmed, "").to_numpy(zero_copy_only=False)
        w[empty] = 0
        s = pc.count_substring_regex(text, r"[.!?]+").to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.maximum(s, 1)
        sy = (
            pc.count_substring_regex(pc.utf8_lower(text), r"[aeiouy]+")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        wmax = np.maximum(w, 1)
        sc = (
            np.float64(206.835)
            - np.float64(1.015) * (w.astype(np.float64) / s.astype(np.float64))
            - np.float64(84.6) * (sy.astype(np.float64) / wmax.astype(np.float64))
        )
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(w, pa.int64()),
                "n_sentences": pa.array(s, pa.int64()),
                "n_syllables": pa.array(sy, pa.int64()),
                "score": pa.array(sc, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def term_scan(ds, term: str, text_col: str = "text", id_col: str = "doc_id",
              group: str | None = None):
    """Corpus-wide literal term scan: for every document containing
    ``term``, its FIRST occurrence position (1-based, SQL ``position()``
    semantics) and total occurrence count — the grep-with-statistics pass
    a curation run uses to locate contamination or boilerplate before
    deciding on a removal rule. Fully vectorized (``pc.find_substring`` +
    ``pc.count_substring``); rows never shuffle.

    Positions are byte offsets, equal to SQL's CHARACTER positions only on
    ASCII text — non-ASCII documents raise loudly rather than silently
    drifting (scan those with a char-aware pass). Empty terms rejected.
    ``group`` optionally carries a group column through. Returns a Dataset
    of ``(id_col[, group], first_pos, n_occurrences)`` for matching docs.
    """
    if not term:
        raise ValueError("term_scan needs a non-empty term")

    def scan(batch: pa.Table) -> pa.Table:
        txt = batch[text_col]
        if not pc.all(pc.string_is_ascii(txt)).as_py():
            raise ValueError(
                "term_scan: non-ASCII document — byte positions would diverge "
                "from SQL character positions"
            )
        pos0 = pc.find_substring(txt, term)  # -1 when absent
        hit = pc.greater_equal(pos0, 0)
        out = {id_col: batch[id_col].filter(hit)}
        if group is not None:
            out[group] = batch[group].filter(hit)
        out["first_pos"] = pc.add(pos0.filter(hit).cast(pa.int64()), 1)  # 1-based
        out["n_occurrences"] = pc.count_substring(txt, term).filter(hit).cast(pa.int64())
        return pa.table(out)

    from .._rayutil import remote_args

    return ds.map_batches(scan, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
