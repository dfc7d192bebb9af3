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

from .fastagg import fast_groupby


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
    sums = fast_groupby(
        folded,
        "doc_id",
        Sum("n_ngrams", alias_name="n_ngrams"), Sum("n_shared", alias_name="n_shared"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        tot = batch["n_ngrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        sh = batch["n_shared"].to_numpy(zero_copy_only=False).astype(np.int64)
        frac = sh.astype(np.float64) / tot.astype(np.float64)  # tot >= 1 here
        return batch.append_column("shared_frac", pa.array(frac, pa.float64()))

    return sums.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def substring_containment(ds, column: str = "text", id_col: str = "doc_id",
                          gram_words: int = 8, max_bucket_pairs: int = 1 << 16,
                          max_candidates: int = 1 << 20):
    """WORD-ALIGNED substring containment between documents: every pair
    ``(contained_id, container_id)`` where the contained doc's full word
    sequence appears as a contiguous word run inside the container (the
    quote / mirror / excerpt detector that exact-hash dedup misses).
    Word-aligned is the deliberate semantics — it equals space-padded
    character containment ``' '+a+' ' IN ' '+b+' '`` on single-space
    tokenized text, which is exactly the SQL mirror.

    Plan (complete blocking, then exact verify):

    1. containee anchor = the doc's FIRST ``gram_words``-gram; container
       side = ALL its ``gram_words``-grams (`_word_ngram_strings`, deduped
       per doc). If A is word-contained in B, A's first gram IS one of
       B's grams — the block never misses a true pair.
    2. one (gram) groupby expands anchor x container candidates (capped at
       ``max_bucket_pairs`` per bucket — a boilerplate gram that anchors
       thousands of docs is the blow-up; raise the gram size instead).
       A doc has ONE anchor, so no pair duplicates across buckets.
    3. exact verify: candidate texts fetch by broadcast id set (bounded by
       ``max_candidates``) and each pair checks the padded containment.

    Docs with < ``gram_words`` words don't participate (they can't anchor;
    they also can't contain a longer doc). Returns a pandas DataFrame
    ``(contained_id, container_id)`` — typed-empty when nothing matches.
    """
    import pandas as pd
    import ray

    from .text import _word_ngram_strings

    if gram_words < 1:
        raise ValueError(f"gram_words must be >= 1, got {gram_words}")

    def _empty():
        return pd.DataFrame({"contained_id": pd.Series(dtype="int64"),
                             "container_id": pd.Series(dtype="int64")})

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        col = batch[column].cast(pa.string()).combine_chunks()
        grams, ng_counts = _word_ngram_strings(col, gram_words)
        rep_ids = np.repeat(ids, ng_counts)
        cont = pa.table({
            "gram": grams,
            "id": pa.array(rep_ids, pa.int64()),
        }).group_by(["gram", "id"]).aggregate([])
        has = ng_counts > 0
        first_idx = np.concatenate(([0], np.cumsum(ng_counts)[:-1]))[has]
        anch = pa.table({
            "gram": grams.take(pa.array(first_idx, pa.int64())),
            "id": pa.array(ids[has], pa.int64()),
        })
        side = pa.array(np.concatenate([np.zeros(anch.num_rows, np.int64),
                                        np.ones(cont.num_rows, np.int64)]), pa.int64())
        both = pa.table({
            "gram": pa.concat_arrays([anch["gram"].combine_chunks(), cont["gram"].combine_chunks()]),
            "id": pa.concat_arrays([anch["id"].combine_chunks(), cont["id"].combine_chunks()]),
            "side": side,
        })
        return both

    cells = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def expand(g: pd.DataFrame) -> pd.DataFrame:
        a = np.unique(g.loc[g["side"] == 0, "id"].to_numpy(np.int64))
        b = np.unique(g.loc[g["side"] == 1, "id"].to_numpy(np.int64))
        if not len(a) or not len(b):
            return pd.DataFrame({"ca": pd.Series(dtype="int64"), "cb": pd.Series(dtype="int64")})
        if len(a) * len(b) > max_bucket_pairs:
            raise ValueError(
                f"substring_containment: gram bucket {g['gram'].iloc[0]!r} expands to "
                f"{len(a) * len(b)} pairs > max_bucket_pairs={max_bucket_pairs}"
            )
        ai = np.repeat(a, len(b))
        bi = np.tile(b, len(a))
        keep = ai != bi
        return pd.DataFrame({"ca": ai[keep], "cb": bi[keep]})

    pairs = (
        cells.groupby("gram").map_groups(expand, batch_format="pandas", **remote_args())
        .materialize()
    )
    pdf = pairs.to_pandas()
    if pdf.empty:
        return _empty()
    pdf = pdf.drop_duplicates()
    cand = np.unique(np.concatenate([pdf["ca"].to_numpy(np.int64), pdf["cb"].to_numpy(np.int64)]))
    if len(cand) > max_candidates:
        raise ValueError(f"{len(cand)} candidate docs exceed max_candidates={max_candidates}")
    cand_ref = ray.put(cand)

    def fetch(batch: pa.Table) -> pa.Table:
        want = ray.get(cand_ref)
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pos = np.minimum(np.searchsorted(want, ids), len(want) - 1)
        m = want[pos] == ids
        got = batch.filter(pa.array(m))
        return pa.table({"id": pa.array(ids[m], pa.int64()),
                         "text": got[column].cast(pa.string())})

    texts = (
        ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
    )
    tmap = dict(zip(texts["id"].astype("int64"), texts["text"]))
    out_a, out_b = [], []
    for ca, cb in pdf[["ca", "cb"]].itertuples(index=False):
        if (" " + tmap[int(ca)] + " ") in (" " + tmap[int(cb)] + " "):
            out_a.append(int(ca))
            out_b.append(int(cb))
    out = pd.DataFrame({"contained_id": pd.Series(out_a, dtype="int64"),
                        "container_id": pd.Series(out_b, dtype="int64")})
    return out.sort_values(["contained_id", "container_id"]).reset_index(drop=True)
