"""Tokens-table sources: the north-rule input shape
(doc_id:string, tokens:list<int32>, n_tok:int32, source:string).

Two deterministic producers:

* ``tokenize_documents`` — a Ray Data pipeline turning the driver testdata
  ``documents`` table into a tokens table with a vectorized whitespace +
  rolling-hash tokenizer. ``n_tok`` is SQL-checkable against DuckDB
  (``len(string_split_regex(trim(text), '\\s+'))``); token ids are a stable
  31-polynomial hash mod VOCAB (no salted Python hash).
* ``synthetic_corpus`` — the FIXTURES.md F1 generator (seed=42 zipf mixture:
  70% zipf ids / 20% ascending runs / 10% constant runs) used by bench.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

VOCAB = 50257
_SEED = 42


def _hash_words(concat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """Vectorized 31-polynomial rolling hash per word -> int32 token ids."""
    n = len(offs) - 1
    lens = np.diff(offs)
    h = np.zeros(n, dtype=np.uint64)
    max_len = int(lens.max()) if n else 0
    starts = offs[:-1]
    for k in range(max_len):
        m = lens > k
        h[m] = h[m] * np.uint64(31) + concat[starts[m] + k].astype(np.uint64)
    return (h % np.uint64(VOCAB)).astype(np.int32)


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> tokens batch (vectorized, zero Python per-row work)."""
    text = batch["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    words = pc.split_pattern_regex(pc.utf8_trim_whitespace(text), r"\s+")
    # empty text -> [''] from the split; normalize to an empty list
    word_counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    big = flat.cast(pa.large_binary())
    woffs = np.frombuffer(big.buffers()[1], dtype=np.int64)[big.offset : big.offset + len(big) + 1]
    wbuf = big.buffers()[2]
    concat = np.frombuffer(wbuf, dtype=np.uint8)[woffs[0] : woffs[-1]] if wbuf is not None else np.zeros(0, np.uint8)
    woffs = woffs - woffs[0]
    ids = _hash_words(concat, woffs)

    # drop zero-length words (the ['']-for-empty-text artifact)
    wlens = np.diff(woffs)
    keep = wlens > 0
    if not keep.all():
        # recompute per-doc counts excluding empties
        doc_of_word = np.repeat(np.arange(len(word_counts)), word_counts)
        word_counts = np.bincount(doc_of_word[keep], minlength=len(word_counts)).astype(np.int64)
        ids = ids[keep]

    offsets = np.zeros(len(word_counts) + 1, dtype=np.int32)
    np.cumsum(word_counts, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), pa.array(ids, type=pa.int32()))
    doc_id = pc.binary_join_element_wise(
        batch["source"].cast(pa.string()), pc.cast(batch["doc_id"], pa.string()), "/"
    )
    return pa.table(
        {
            "doc_id": doc_id,
            "tokens": tokens,
            "n_tok": pa.array(word_counts.astype(np.int32), type=pa.int32()),
            "source": batch["source"],
        }
    )


def tokenize_documents(sf_dir: str):
    """documents.parquet -> tokens Dataset (lazy; column-pruned read)."""
    import ray.data

    from .._rayutil import remote_args

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    return ds.map_batches(tokenize_batch, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def synthetic_batch(n_rows: int, seed: int, shard: int) -> pa.Table:
    """One deterministic FIXTURES.md F1 batch (seeded per shard)."""
    rng = np.random.default_rng(np.random.SeedSequence([_SEED, seed, shard]))
    # lognormal shaped to FIXTURES.md F1: median ~700, p99 ~16k, capped 128k
    n_tok = np.clip(rng.lognormal(np.log(700), 1.345, n_rows), 1, 128_000).astype(np.int64)
    # edge rows (FIXTURES.md F1): empty doc, single token, one max outlier
    if n_rows >= 3:
        n_tok[0] = 0
        n_tok[1] = 1
        if shard == 0:
            n_tok[2] = 128_000
    kinds = rng.random(n_rows)
    sources = np.array(["web", "books", "code", "wiki", "news", "forums", "papers", "social"])
    src_idx = rng.choice(8, n_rows, p=np.array([0.35, 0.2, 0.15, 0.1, 0.08, 0.06, 0.04, 0.02]))
    total = int(n_tok.sum())
    flat = np.empty(total, dtype=np.int32)
    offs = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offs[1:])
    # vectorized fill by kind over row spans
    zipf_rows = np.flatnonzero(kinds < 0.7)
    asc_rows = np.flatnonzero((kinds >= 0.7) & (kinds < 0.9))
    const_rows = np.flatnonzero(kinds >= 0.9)
    zipf_total = int(n_tok[zipf_rows].sum())
    zipf_vals = (rng.zipf(1.3, zipf_total) % VOCAB).astype(np.int32)
    zp = 0
    for r in zipf_rows:
        k = int(n_tok[r])
        flat[offs[r] : offs[r + 1]] = zipf_vals[zp : zp + k]
        zp += k
    for r in asc_rows:
        k = int(n_tok[r])
        start = int(rng.integers(0, VOCAB - 1))
        flat[offs[r] : offs[r + 1]] = (start + np.arange(k)) % VOCAB
    for r in const_rows:
        flat[offs[r] : offs[r + 1]] = int(rng.integers(0, VOCAB))
    o32 = offs if total < 2**31 else None
    tokens = pa.LargeListArray.from_arrays(pa.array(offs, type=pa.int64()), pa.array(flat, type=pa.int32())).cast(
        pa.list_(pa.int32())
    )
    doc_id = [f"{sources[src_idx[i]]}/{shard:04d}/doc-{i:08d}" for i in range(n_rows)]
    return pa.table(
        {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok.astype(np.int32), type=pa.int32()),
            "source": pa.array(sources[src_idx], type=pa.string()),
        }
    )


def _write_shard(out_dir: str, rows: int, seed: int, sh: int) -> str:
    import os

    import pyarrow.parquet as pq

    path = os.path.join(out_dir, f"tokens-{sh:04d}.parquet")
    if not os.path.exists(path):
        tbl = synthetic_batch(rows, seed, sh)
        # ~512 rows/group ~= 3.5 MB of tokens: partitions align to whole
        # row groups, so encode tasks read without row-group amplification
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(tbl, tmp, row_group_size=512)
        os.replace(tmp, path)
    return path


def write_synthetic_corpus(out_dir: str, n_rows: int, n_shards: int = 8, seed: int = 0) -> list[str]:
    """Write a deterministic corpus as parquet shards (seeded per shard, so
    output is identical regardless of parallelism); returns file paths."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    plan = []
    per = (n_rows + n_shards - 1) // n_shards
    for sh in range(n_shards):
        rows = min(per, n_rows - sh * per)
        if rows <= 0:
            break
        plan.append((rows, sh))
    missing = [(r, sh) for r, sh in plan if not os.path.exists(os.path.join(out_dir, f"tokens-{sh:04d}.parquet"))]
    if len(missing) > 1:
        try:
            import ray

            from .._rayutil import remote_args

            if ray.is_initialized():
                fn = ray.remote(_write_shard).options(**remote_args())
                ray.get([fn.remote(out_dir, r, seed, sh) for r, sh in missing])
                missing = []
        except Exception:
            pass  # fall through to serial generation
    for r, sh in missing:
        _write_shard(out_dir, r, seed, sh)
    return [os.path.join(out_dir, f"tokens-{sh:04d}.parquet") for _, sh in plan]
