"""Collocation mining: PMI over within-document word co-occurrence.

Pointwise mutual information ``ln(P(a,b) / (P(a)P(b)))`` over *document*
co-occurrence (a pair counts once per doc containing both words) is the
classic collocation / related-terms signal (Church & Hanks 1990) used for
phrase mining, query expansion, and topic drift checks on training corpora.

Scale plan — text never shuffles, only word/pair count metadata:

1. doc-frequency pass: per batch, distinct words per doc via the Arrow
   dictionary-code lexsort idiom (no hash collisions), pre-aggregated to
   ``(word, df_partial)`` rows; ONE ``groupby(word)`` sums. Words below
   ``min_word_docs`` drop — the surviving vocabulary is broadcast once via
   ``ray.put`` (guarded by ``max_broadcast_vocab``), never re-shipped.
2. pair pass: per batch, each doc's distinct *eligible* words expand to
   sorted unordered pairs (``np.triu_indices`` per doc — the same bounded
   expansion idiom as ops/basket.py; ``max_words_per_doc`` guards a
   pathological doc), pre-aggregated with one np.unique per batch; ONE
   ``groupby(item_a, item_b)`` sums, ``min_pair_docs`` filters.
3. the surviving pair table is small; a final map_batches attaches
   ``pmi = ln((pair_docs * n_docs) / (df_a * df_b))``.

SQL-parity rules (see CLAUDE.md): tokenization is the shared
``split_nonempty_docs`` trim + ``\\s+`` split; numerator/denominator are
exact int64 products (guarded < 2^53) cast to double ONCE each, one
division, then per-scalar ``math.log`` (libm ln == DuckDB ln — the BM25
rule; np.log drifts 1 ulp).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import split_nonempty_docs

from .fastagg import fast_groupby

_MAX_EXACT = float(1 << 53)


def _distinct_words_per_doc(batch: pa.Table, column: str, id_col: str):
    """(doc_row_index, word_string) arrays with per-doc duplicates removed.
    Vectorized: dictionary codes + one lexsort over the flat word buffer."""
    _ids, words = split_nonempty_docs(batch, column, id_col)
    counts = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = words.flatten()
    if len(flat) == 0:
        return np.zeros(0, np.int64), np.zeros(0, dtype=object)
    enc = pc.dictionary_encode(flat)
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    dictionary = np.asarray(enc.dictionary.to_pylist(), dtype=object)
    doc_of = np.repeat(np.arange(len(counts)), counts)
    order = np.lexsort((codes, doc_of))
    c, d = codes[order], doc_of[order]
    keep = np.ones(len(c), dtype=bool)
    keep[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    return d[keep], dictionary[c[keep]]


def doc_frequency(ds, column: str = "text", id_col: str = "doc_id"):
    """Dataset of ``(w, df)`` — number of documents containing each word."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        _doc, w = _distinct_words_per_doc(batch, column, id_col)
        if len(w) == 0:
            return pa.table({"w": pa.array([], pa.string()), "df_p": pa.array([], pa.int64())})
        uniq, cnt = np.unique(w.astype(str), return_counts=True)
        return pa.table({"w": pa.array(uniq), "df_p": pa.array(cnt.astype(np.int64))})

    agg = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "w",
        Sum("df_p", alias_name="df"),
    )
    )
    return agg


def pmi_collocations(
    ds,
    min_word_docs: int = 4,
    min_pair_docs: int = 4,
    column: str = "text",
    id_col: str = "doc_id",
    max_broadcast_vocab: int = 1 << 22,
    max_words_per_doc: int = 4096,
):
    """Unordered word pairs co-occurring in >= ``min_pair_docs`` documents,
    scored by document-level PMI. Returns a Dataset of
    ``(item_a, item_b, pair_docs, pmi)`` with ``item_a < item_b``.

    ``n_docs`` is the TOTAL table row count (empty docs included) so the
    probabilities share one denominator with the SQL oracle's count(*).
    """
    import ray
    from ray.data.aggregate import Sum

    n_docs = ds.count()

    dfpd = doc_frequency(ds, column, id_col).to_pandas()
    dfpd = dfpd[dfpd["df"] >= int(min_word_docs)]
    if len(dfpd) > max_broadcast_vocab:
        raise ValueError(
            f"eligible vocabulary {len(dfpd)} exceeds max_broadcast_vocab="
            f"{max_broadcast_vocab}; raise min_word_docs"
        )
    vocab_words = dfpd["w"].to_numpy(dtype=str)
    vocab_df = dfpd["df"].to_numpy(dtype=np.int64)
    # sort with numpy's own comparator so searchsorted sees its ordering
    vorder = np.argsort(vocab_words, kind="stable")
    vocab_words, vocab_df = vocab_words[vorder], vocab_df[vorder]
    vocab_ref = ray.put((vocab_words, vocab_df))

    def pair_partial(batch: pa.Table) -> pa.Table:
        vocab_words, _ = ray.get(vocab_ref)
        doc_idx, w = _distinct_words_per_doc(batch, column, id_col)
        empty = pa.table(
            {
                "item_a": pa.array([], pa.string()),
                "item_b": pa.array([], pa.string()),
                "cnt": pa.array([], pa.int64()),
            }
        )
        if len(w) == 0:
            return empty
        w = w.astype(str)
        elig = np.isin(w, vocab_words)
        doc_idx, w = doc_idx[elig], w[elig]
        if len(w) == 0:
            return empty
        order = np.lexsort((w, doc_idx))
        doc_idx, w = doc_idx[order], w[order]
        bounds = np.flatnonzero(np.r_[True, doc_idx[1:] != doc_idx[:-1], True])
        a_parts, b_parts = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            m = e - s
            if m > max_words_per_doc:
                raise ValueError(
                    f"doc holds {m} eligible distinct words > "
                    f"max_words_per_doc={max_words_per_doc}"
                )
            if m < 2:
                continue
            ii, jj = np.triu_indices(m, k=1)
            a_parts.append(w[s:e][ii])
            b_parts.append(w[s:e][jj])
        if not a_parts:
            return empty
        a = np.concatenate(a_parts)
        b = np.concatenate(b_parts)
        key = np.char.add(np.char.add(a.astype(str), "\x00"), b.astype(str))
        uniq, idx, cnt = np.unique(key, return_index=True, return_counts=True)
        return pa.table(
            {
                "item_a": pa.array(a[idx].astype(object)),
                "item_b": pa.array(b[idx].astype(object)),
                "cnt": pa.array(cnt.astype(np.int64)),
            }
        )

    pairs = (fast_groupby(
        ds.map_batches(pair_partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["item_a", "item_b"],
        Sum("cnt", alias_name="pair_docs"),
    )
        .filter(lambda r: r["pair_docs"] >= int(min_pair_docs), **remote_args())
    )

    def score(batch: pa.Table) -> pa.Table:
        vocab_words, vocab_df = ray.get(vocab_ref)
        a = np.asarray(batch["item_a"].to_pylist(), dtype=str)
        b = np.asarray(batch["item_b"].to_pylist(), dtype=str)
        cab = batch["pair_docs"].to_numpy(zero_copy_only=False).astype(np.int64)
        ca = vocab_df[np.searchsorted(vocab_words, a)]
        cb = vocab_df[np.searchsorted(vocab_words, b)]
        pmi = np.empty(len(a), np.float64)
        for i in range(len(a)):
            num = int(cab[i]) * int(n_docs)
            den = int(ca[i]) * int(cb[i])
            if num >= _MAX_EXACT or den >= _MAX_EXACT:
                raise ValueError("PMI counts exceed exact-double range (2^53)")
            pmi[i] = math.log(float(num) / float(den))
        return batch.append_column("pmi", pa.array(pmi, pa.float64()))

    return pairs.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
