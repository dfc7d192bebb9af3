"""Shared block-order shard-writing core for the interchange sinks.

Why raw block refs and not two map_batches passes: Ray Data does NOT
guarantee output ORDER of an executed pass unless preserve_order is set —
results arrive in task-completion order. The original webdataset writer
aligned a row-count pass with a first-key pass POSITIONALLY, which under
CPU contention paired one block's count with another block's key and
produced overlapping shard parts (caught by test_jsonl_roundtrip under
load). A materialized Dataset's `iter_internal_ref_bundles()` is the
canonical driver-side block order, and BlockMetadata carries exact
num_rows for free — so global row offsets need NO execution at all, and
each block is written by one explicit Ray task that knows its own offset.
"""

from __future__ import annotations

import numpy as np


def block_offsets(mat):
    """Canonical (block_refs, exclusive_row_offsets) of a MATERIALIZED
    Dataset. Zero execution: offsets come from block metadata."""
    refs, counts = [], []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows is None:
                raise ValueError("block metadata lacks num_rows — dataset not materialized?")
            refs.append(ref)
            counts.append(int(meta.num_rows))
    offsets = np.zeros(len(counts) + 1, dtype=np.int64)
    np.cumsum(np.asarray(counts, dtype=np.int64), out=offsets[1:])
    return refs, counts, offsets


def shard_spans(start: int, n_rows: int, rows_per_shard: int):
    """Yield (global_start, local_lo, local_hi, shard_index) part spans of a
    block beginning at global row ``start`` — shards cut every
    ``rows_per_shard`` rows of the GLOBAL order."""
    done = 0
    while done < n_rows:
        g = start + done
        shard = g // rows_per_shard
        take = min(n_rows - done, (shard + 1) * rows_per_shard - g)
        yield g, done, done + take, shard
        done += take
