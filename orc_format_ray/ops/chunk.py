"""Passage chunking: split documents into fixed-size word windows.

The flat_map-shaped transform of a training-data pipeline (rows out >
rows in): each doc's words tile into consecutive ``window``-word passages
(last one short). Entirely per-batch and stateless — embarrassingly
parallel, no shuffle — and fully vectorized: chunk boundaries partition the
flat word buffer contiguously, so ONE ``ListArray.from_arrays`` over the
flattened words plus ``binary_join`` rebuilds every passage with zero
Python per row. Memory per task is ~2x the text batch (words + joined
passages); size ``batch_size`` down for huge docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args


def chunk_batch(batch: pa.Table, window: int, column: str = "text", id_col: str = "doc_id") -> pa.Table:
    """One batch of docs -> (doc_id, chunk_id, n_words, passage) rows."""
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(text)
    nonempty = pc.not_equal(trimmed, "")
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    ids = ids.filter(nonempty)
    words = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(counts)
    n_chunks = -(-counts // window)  # ceil; counts >= 1 here
    doc_of = np.repeat(np.arange(n_docs), n_chunks)
    first_of = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=first_of[1:])
    chunk_id = np.arange(len(doc_of), dtype=np.int64) - first_of[doc_of]
    word_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=word_offs[1:])
    starts = word_offs[doc_of] + chunk_id * window
    # chunks tile each doc's words contiguously -> starts + total form a
    # valid monotonic ListArray offset vector over the flat word buffer
    offsets = np.append(starts, word_offs[-1]).astype(np.int64)
    flat = words.flatten()
    chunks = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()), flat)
    passage = pc.binary_join(chunks, " ")
    return pa.table(
        {
            "doc_id": ids.take(pa.array(doc_of, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_words": pa.array(np.diff(offsets), pa.int64()),
            "passage": passage,
        }
    )


def chunk_passages(ds, window: int, column: str = "text", id_col: str = "doc_id"):
    """Docs -> fixed-``window``-word passages (see module docstring)."""
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    return ds.map_batches(
        lambda b: chunk_batch(b, window, column, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **remote_args(),
    )


def sliding_chunk_batch(
    batch: pa.Table, window: int, stride: int, column: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """One batch of docs -> OVERLAPPING (doc_id, chunk_id, n_words, passage)
    rows: chunk i covers words [i*stride, min(i*stride + window, n)) — the
    retrieval-indexing chunker (overlap = window - stride keeps boundary
    context in some chunk). A doc emits ceil(max(n - window, 0)/stride) + 1
    chunks; the tail chunk may be shorter, never empty.

    Unlike the non-overlapping chunker, the output words are NOT a tiling
    of the flat buffer, so passages gather via one vectorized take()
    (output size ~ n * window/stride — the overlap factor is the real
    storage cost, size batches accordingly)."""
    if stride <= 0 or window <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would skip words")
    text = batch[column]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    trimmed = pc.utf8_trim_whitespace(text)
    nonempty = pc.not_equal(trimmed, "")
    ids = batch[id_col].combine_chunks() if isinstance(batch[id_col], pa.ChunkedArray) else batch[id_col]
    ids = ids.filter(nonempty)
    words = pc.split_pattern_regex(trimmed.filter(nonempty), r"\s+")
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(counts)
    if n_docs == 0:
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "chunk_id": pa.array([], pa.int64()),
                "n_words": pa.array([], pa.int64()),
                "passage": pa.array([], pa.string()),
            }
        )
    n_chunks = -(-np.maximum(counts - window, 0) // stride) + 1
    doc_of = np.repeat(np.arange(n_docs), n_chunks)
    first_of = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(n_chunks, out=first_of[1:])
    chunk_id = np.arange(len(doc_of), dtype=np.int64) - first_of[doc_of]
    starts_local = chunk_id * stride
    lens = np.minimum(starts_local + window, counts[doc_of]) - starts_local
    word_offs = np.zeros(n_docs + 1, dtype=np.int64)
    np.cumsum(counts, out=word_offs[1:])
    starts_global = word_offs[doc_of] + starts_local
    # vectorized gather indices: arange over the total output length,
    # rebased per chunk (the standard repeat/arange segment idiom)
    total = int(lens.sum())
    out_offs = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=out_offs[1:])
    idx = np.arange(total, dtype=np.int64) - np.repeat(out_offs[:-1], lens) + np.repeat(starts_global, lens)
    flat = words.flatten()
    gathered = flat.take(pa.array(idx, pa.int64()))
    chunks = pa.LargeListArray.from_arrays(pa.array(out_offs, pa.int64()), gathered)
    return pa.table(
        {
            "doc_id": ids.take(pa.array(doc_of, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_words": pa.array(lens, pa.int64()),
            "passage": pc.binary_join(chunks, " "),
        }
    )


def sliding_chunks(ds, window: int, stride: int, column: str = "text", id_col: str = "doc_id"):
    """Docs -> overlapping ``window``-word passages every ``stride`` words."""
    if stride <= 0 or window <= 0:
        raise ValueError(f"window and stride must be positive, got {window}, {stride}")
    if stride > window:
        raise ValueError(f"stride {stride} > window {window} would skip words")
    return ds.map_batches(
        lambda b: sliding_chunk_batch(b, window, stride, column, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **remote_args(),
    )
