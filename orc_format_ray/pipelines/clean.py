"""Composed training-data cleaning pipeline: quality filter -> exact dedup ->
tokenize -> stripe-encode.

The end-to-end shape a 100 TB corpus run takes: every stage is a streaming
Ray Data transform; the only shuffle is the dedup groupby over content
hashes (raw text pre-aggregated per batch first); encode output is resumable
per partition via the lineage manifest.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from ..ops import dedup, text as tx

MAX_PUNCT_RATIO = 0.2
MIN_TOKENS = 5


def quality_filter(batch: pa.Table) -> pa.Table:
    """Keep docs with punct_ratio < MAX_PUNCT_RATIO and >= MIN_TOKENS tokens."""
    scored = tx.quality_score(batch)
    keep = pc.and_(
        pc.less(scored["punct_ratio"], MAX_PUNCT_RATIO),
        pc.greater_equal(scored["tok_count"], MIN_TOKENS),
    )
    return batch.filter(keep)


def clean_documents(sf_dir: str):
    """documents -> quality-filtered, exact-deduped survivor rows (Dataset)."""
    import ray.data

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    filtered = ds.map_batches(quality_filter, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    return dedup.exact_dedup(filtered, column="text")


def clean_summary_by_source(sf_dir: str) -> pa.Table:
    """Survivor counts + token sums per source (the SQL-checkable view)."""
    from ray.data.aggregate import Count, Sum

    survivors = clean_documents(sf_dir)
    counted = survivors.map_batches(tx.token_count, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    out = counted.groupby("source").aggregate(Count(alias_name="n_docs"), Sum("n_tok", alias_name="sum_tok"))
    return out


def clean_and_encode(sf_dir: str, out_dir: str, budget_bytes: int = 8 * 1024 * 1024) -> dict:
    """Full pipeline: clean -> tokenize -> encode to stripes, streaming
    end-to-end.

    Nothing materializes on the driver: survivors stream through the
    vectorized tokenizer straight into `encode_blocks`, whose byte-budget
    flush slices oversized blocks; only the tiny lineage rows (one per
    stripe) are collected. No global sort — stripe contents are
    self-describing and the downstream consumers (decode, aggregates) are
    order-insensitive.
    """
    import os

    from . import encode as enc
    from . import tokens as tok

    survivors = clean_documents(sf_dir)
    tokens_ds = survivors.map_batches(tok.tokenize_batch, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    stripes_dir = os.path.join(out_dir, "stripes")
    lineage = enc.encode_blocks(tokens_ds, stripes_dir, stripe_bytes=budget_bytes).take_all()  # 1 row/stripe
    return {
        "stripes": len(lineage),
        "num_rows": int(sum(r["num_rows"] for r in lineage)),
        "encoded_bytes": int(sum(r["encoded_bytes"] for r in lineage)),
        "out_dir": stripes_dir,
    }


def repetition_gate(batch: pa.Table, max_repetition: float, column: str = "text") -> pa.Table:
    """Drop docs whose duplicate-word count exceeds ``max_repetition`` of
    their words: keep iff ``n_words - n_distinct <= max_repetition *
    n_words`` — an integer-vs-(int*double) compare, bitwise identical in
    numpy and SQL. Empty-after-trim docs have no words to measure and pass
    (the token-count quality gate already handles them)."""
    rep = tx.word_repetition(batch, column=column)
    n_words = rep["n_words"].to_numpy(zero_copy_only=False)
    n_distinct = rep["n_distinct"].to_numpy(zero_copy_only=False)
    bad_ids = rep["doc_id"].to_numpy(zero_copy_only=False)[
        (n_words - n_distinct) > max_repetition * n_words
    ]
    keep = ~np.isin(batch["doc_id"].to_numpy(zero_copy_only=False), bad_ids)
    return batch.filter(pa.array(keep))


def prepare_training_data(sf_dir: str, capacity: int = 2048, mixture_rates: dict | None = None,
                          benchmark_phrases: list[str] | None = None,
                          max_repetition: float | None = None,
                          min_mean_familiarity: float | None = None):
    """The full training-data preparation chain, every stage streaming:

    decontaminate (benchmark phrase filter) -> quality filter [-> repetition
    gate -> familiarity gate] -> exact dedup -> composition-weighted mixture
    sample -> token count -> sequence packing.

    Optional quality gates (VERDICT r3 #9): ``max_repetition`` drops docs
    whose duplicate-word fraction exceeds it (Gopher-style, stateless per
    batch); ``min_mean_familiarity`` drops docs whose corpus-familiarity
    (sum of corpus frequencies of their word occurrences) is below
    ``min_mean_familiarity`` per word — the vocabulary statistics come from
    the FULL corpus (one extra metadata-only pass via
    ``text.word_familiarity``), and the passing id set broadcasts once as a
    semi-join filter (8 B/doc; beyond ~2^26 docs route it through the
    range-sharded survivor files of ``ops.dedup`` instead, same recipe as
    ``exact_dedup``'s sharded path).

    Shuffle inventory at 100 TB: ONE content-hash groupby (dedup, text
    pre-aggregated per batch), ONE (key, n_tok) metadata groupby (packing),
    plus (familiarity gate only) one (word_hash, doc_id, cnt) metadata
    groupby; every other stage is a stateless vectorized filter. Returns the
    per-doc pack assignment Dataset (doc_id, n_tok, start_tok, first_pack,
    last_pack) — the manifest a downstream loader reads blocks from.
    """
    import functools

    import ray
    import ray.data

    from ..ops import pack, sample
    from ..ops.dedup import _keep_survivors

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"])
    if benchmark_phrases:
        # stateless task pool: this feeds the dedup groupby downstream
        ds = tx.decontaminate(ds, benchmark_phrases, use_actors=False)
    filtered = ds.map_batches(quality_filter, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    if max_repetition is not None:
        filtered = filtered.map_batches(
            functools.partial(repetition_gate, max_repetition=max_repetition),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        )
    if min_mean_familiarity is not None:
        fam = tx.word_familiarity(
            ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        )

        def passing(batch: pa.Table) -> pa.Table:
            f = batch["familiarity"].to_numpy(zero_copy_only=False)
            w = batch["n_words"].to_numpy(zero_copy_only=False)
            return pa.table({"doc_id": batch["doc_id"].filter(pa.array(f >= min_mean_familiarity * w))})

        id_tabs = list(
            fam.map_batches(passing, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
        ids = (
            pa.concat_tables(id_tabs) if id_tabs else pa.table({"doc_id": pa.array([], pa.int64())})
        )["doc_id"].to_numpy(zero_copy_only=False)
        ref = ray.put(np.sort(ids))
        filtered = filtered.map_batches(
            functools.partial(_keep_survivors, survivors_ref=ref),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        )
    survivors = dedup.exact_dedup(filtered, column="text")
    if mixture_rates:
        survivors = sample.mixture_sample(survivors, mixture_rates)
    counted = survivors.map_batches(tx.token_count, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    # meta derives from the whole upstream chain -> pin it (it is survivor-sized)
    return pack.pack_sequences(counted.select_columns(["doc_id", "n_tok"]), capacity, materialize_meta=True)
