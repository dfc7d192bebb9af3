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
