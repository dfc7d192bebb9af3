"""Cross-document duplicate-span detection (word-level substring dedup,
the Lee-et-al "deduplicating training data" signal).

A span is a ``k``-word gram; a doc's ``n_dup_grams`` counts its gram
occurrences whose gram also appears in at least one OTHER document. Docs
with high counts are boilerplate/template suspects to drop or trim.

Scale plan — only ~32 B/gram metadata (4 int64 columns per unique
(gram, doc) row) ever shuffles, never text:

1. per batch (vectorized): hash each word (``content_hash``), roll a
   k-word polynomial gram hash over the flat word buffer (k vector passes,
   doc-boundary positions masked out), pre-aggregate to unique
   ``(bucket, gram, doc_id, cnt)`` rows with one np.unique.
2. ``groupby(bucket)`` (bucket = gram mod num_buckets): each bucket folds
   VECTORIZED in pandas — re-aggregate cross-batch (gram, doc) rows, keep
   grams whose distinct-doc count > 1, sum per doc. No per-gram Python.
3. a final tiny ``groupby(doc_id)`` sums the per-bucket partials.

Exactness rides on 64-bit gram-hash injectivity over the observed grams
(collision odds ~n^2/2^64; the oracle test asserts distinct hash count ==
distinct gram-string count at test scale). For forensic output with the
gram text, re-scan matched docs — don't shuffle strings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import FNV_PRIME, content_hash, split_nonempty_docs


def gram_hashes(words: pa.ListArray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(gram_hash uint64, doc_index int64) for every k-word window that
    stays inside one doc. Vectorized: k shifted multiply-adds over the flat
    word-hash buffer."""
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    h = content_hash(flat)
    n = len(h)
    if n < k:
        return np.zeros(0, np.uint64), np.zeros(0, np.int64)
    with np.errstate(over="ignore"):
        g = h[: n - k + 1].copy()
        for j in range(1, k):
            g = g * FNV_PRIME + h[j : n - k + 1 + j]
    # a window starting at p is valid iff p and p+k-1 fall in the same doc
    doc_of = np.repeat(np.arange(len(counts)), counts)
    starts = doc_of[: n - k + 1]
    valid = starts == doc_of[k - 1 :]
    return g[valid], starts[valid]


def duplicate_spans(ds, k: int = 8, column: str = "text", id_col: str = "doc_id", num_buckets: int = 64):
    """Per-doc count of k-gram occurrences shared with >= 1 other doc.
    Returns a Dataset of (doc_id, n_dup_grams), docs with zero omitted.
    See the module docstring for the three-stage metadata-only plan."""
    from ray.data.aggregate import Sum

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")

    def partial(batch: pa.Table) -> pa.Table:
        ids_arr, words = split_nonempty_docs(batch, column, id_col)
        ids = ids_arr.to_numpy(zero_copy_only=False).astype(np.int64)
        g, doc_idx = gram_hashes(words, k)
        if len(g) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "gram": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                }
            )
        pairs = np.stack([g.view(np.int64), ids[doc_idx]], axis=1)
        uniq, cnt = np.unique(pairs, axis=0, return_counts=True)
        return pa.table(
            {
                "bucket": pa.array(uniq[:, 0].view(np.uint64) % np.uint64(num_buckets), pa.int64()),
                "gram": pa.array(uniq[:, 0], pa.int64()),
                "doc_id": pa.array(uniq[:, 1], pa.int64()),
                "cnt": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        gb = g.groupby(["gram", "doc_id"], as_index=False)["cnt"].sum()
        ndocs = gb.groupby("gram")["doc_id"].transform("count")
        dup = gb[ndocs > 1]
        if len(dup) == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"), "n_dup_grams": pd.Series(dtype="int64")})
        return dup.groupby("doc_id", as_index=False)["cnt"].sum().rename(columns={"cnt": "n_dup_grams"})

    folded = parts.groupby("bucket").map_groups(bucket_fold, batch_format="pandas", **remote_args())
    return folded.groupby("doc_id").aggregate(Sum("n_dup_grams", alias_name="n_dup_grams"))


def cross_doc_shared_fraction(ds, n: int = 5, column: str = "text",
                              id_col: str = "doc_id", num_buckets: int = 64):
    """Per-doc fraction of DISTINCT word n-grams shared with >= 1 other
    document — the audit-grade companion to `duplicate_spans`: exact gram
    STRINGS (plain single-space split, so SQL ``str_split(text, ' ')`` +
    1-based-inclusive list slices replay every cell), distinct-gram
    semantics (a gram repeated inside one doc counts once), and the output
    fraction is ONE exact-int division.

    Returns a Dataset of ``(doc_id, n_ngrams, n_shared, shared_frac)`` for
    docs with >= 1 n-gram (docs shorter than n words are omitted — callers
    zero-fill against the corpus id list if they need every doc).

    Scale plan mirrors `duplicate_spans`' three stages, but rows carry the
    gram string (needed for exactness): (1) per batch, vectorized n-gram
    construction (`_word_ngram_strings`) + one drop_duplicates to unique
    (gram, doc) pairs; (2) ``groupby(bucket)`` (bucket = content_hash(gram)
    mod num_buckets) folds each bucket vectorized in pandas — distinct-doc
    counts per gram, then per-doc (total, shared) partials; (3) a tiny
    ``groupby(doc_id)`` sums the per-bucket partials and emits the
    division. Only unique (gram, doc) pairs ever shuffle, never documents;
    at 100 TB prefer `duplicate_spans` (8-byte hashes) unless the exact
    audit is the point."""
    from ray.data.aggregate import Sum

    from .text import _word_ngram_strings

    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    if num_buckets <= 0:
        raise ValueError(f"num_buckets must be positive, got {num_buckets}")

    def partial(batch: pa.Table) -> pa.Table:
        col = batch[column]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ngrams, ng_counts = _word_ngram_strings(col, n)
        empty = pa.table(
            {
                "bucket": pa.array([], pa.int64()),
                "ng": pa.array([], pa.string()),
                "doc_id": pa.array([], pa.int64()),
            }
        )
        if len(ngrams) == 0:
            return empty
        doc_idx = np.repeat(np.arange(len(ng_counts), dtype=np.int64), ng_counts)
        df = pd.DataFrame({"ng": ngrams.to_pandas(), "doc_id": ids[doc_idx]})
        df = df.drop_duplicates()
        bucket = (content_hash(pa.array(df["ng"].to_numpy(), pa.string()))
                  % np.uint64(num_buckets)).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(bucket, pa.int64()),
                "ng": pa.array(df["ng"].to_numpy(), pa.string()),
                "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def bucket_fold(g: pd.DataFrame) -> pd.DataFrame:
        gb = g[["ng", "doc_id"]].drop_duplicates()  # re-dedup across batches
        nd = gb.groupby("ng")["doc_id"].transform("count")
        per = gb.assign(shared=(nd >= 2).astype("int64")).groupby("doc_id", as_index=False).agg(
            n_ngrams=("ng", "size"), n_shared=("shared", "sum")
        )
        per["n_ngrams"] = per["n_ngrams"].astype("int64")
        return per

    folded = parts.groupby("bucket").map_groups(bucket_fold, batch_format="pandas", **remote_args())
    sums = folded.groupby("doc_id").aggregate(
        Sum("n_ngrams", alias_name="n_ngrams"), Sum("n_shared", alias_name="n_shared")
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["n_ngrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = sh.astype(np.float64) / tot.astype(np.float64)  # tot >= 1 here
        return batch.append_column("shared_frac", pa.array(frac, pa.float64()))

    return sums.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
