"""BPE tokenizer training + encoding over a Ray Dataset.

The LLM-pipeline core loop: learn a byte-pair-encoding vocabulary FROM the
corpus, then encode the corpus with it. Split the way the classic algorithm
actually scales:

* **word counting is distributed** — whitespace-pre-tokenize every batch
  (one vectorized RE2 split; the same tokenization as `vocab_topk`, which
  keeps it SQL-auditable) and fold (word, count) partials through one
  bounded-cardinality groupby: the corpus is touched once, and only the
  word-frequency table (|word types|, not |tokens|) leaves it;
* **merge learning runs on the word-count table** — the textbook
  frequency-weighted best-pair loop (count desc, pair-lexicographic
  tie-break, fully deterministic) is a |word types|-sized driver job, the
  same split HuggingFace's trainer makes. The first round's pair counts
  are plain SQL over character bigrams, which is how the distributed
  counting machinery gets an exact oracle;
* **encoding is an actor pool** — merge ranks compile once per actor in
  ``__init__``; each distinct word encodes once and memoizes (Zipf's law
  makes the cache hit rate ~1), so the per-batch cost is a dict lookup per
  word, not a merge loop per occurrence.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import pool_size, remote_args

from .fastagg import fast_groupby

_END = " "  # end-of-word sentinel (words are whitespace-split, so no word contains it)


def word_counts(ds, col: str = "text") -> pa.Table:
    """Distributed (word, count) table over the RE2 pre-tokenization of
    ``ds[col]`` — per-batch partial counts, one groupby over word types."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        toks = pc.list_flatten(
            pc.split_pattern_regex(pc.utf8_trim_whitespace(batch[col]), r"\s+")
        )
        toks = toks.filter(pc.not_equal(toks, ""))
        t = pa.table({"word": toks})
        g = t.group_by("word").aggregate([("word", "count")])
        return g.rename_columns(["word", "cnt"])

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    agg = fast_groupby(
        parts,
        "word",
        Sum("cnt", alias_name="cnt"),
    )
    return pa.concat_tables(list(agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))


def _pairs_of(sym: tuple[str, ...]):
    return zip(sym[:-1], sym[1:])


def pair_counts_from_words(words: list[str], counts: np.ndarray) -> dict[tuple[str, str], int]:
    """Frequency-weighted adjacent-symbol-pair counts for the FIRST merge
    round (symbols = characters + the end-of-word sentinel). This is the
    SQL-auditable stage: a character bigram count over the word table."""
    out: dict[tuple[str, str], int] = {}
    for w, c in zip(words, counts):
        sym = tuple(w) + (_END,)
        for p in _pairs_of(sym):
            out[p] = out.get(p, 0) + int(c)
    return out


class BPEModel:
    """Learned merges (rank order) + the derived piece vocabulary."""

    def __init__(self, merges: list[tuple[str, str]]):
        self.merges = list(merges)
        self.ranks = {p: i for i, p in enumerate(self.merges)}

    def encode_word(self, word: str, _cache: dict | None = None) -> tuple[str, ...]:
        """GPT-2-style greedy lowest-rank merge loop for one word."""
        if _cache is not None and word in _cache:
            return _cache[word]
        sym = list(word) + [_END]
        while len(sym) > 1:
            best, best_rank = None, None
            for i in range(len(sym) - 1):
                r = self.ranks.get((sym[i], sym[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best, best_rank = i, r
            if best is None:
                break
            # merge ALL occurrences of the best pair left-to-right
            pair = (sym[best], sym[best + 1])
            merged, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and (sym[i], sym[i + 1]) == pair:
                    merged.append(sym[i] + sym[i + 1])
                    i += 2
                else:
                    merged.append(sym[i])
                    i += 1
            sym = merged
        out = tuple(sym)
        if _cache is not None:
            _cache[word] = out
        return out


def learn_bpe(wc: pa.Table, n_merges: int) -> BPEModel:
    """Textbook BPE merge learning over a (word, cnt) table: each round
    merges the most frequent adjacent symbol pair (ties broken by the
    lexicographically smallest pair — fully deterministic), rewriting only
    the words that contain it. Driver-side by design: the input is the
    |word types| frequency table, not the corpus."""
    words = wc["word"].to_pylist()
    counts = wc["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    syms = [tuple(w) + (_END,) for w in words]
    pair_cnt: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (s, c) in enumerate(zip(syms, counts)):
        for p in _pairs_of(s):
            pair_cnt[p] = pair_cnt.get(p, 0) + int(c)
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_cnt:
            break
        best = min(pair_cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_cnt[best] <= 0:
            break
        merges.append(best)
        touched = list(where.get(best, ()))
        for i in touched:
            s, c = syms[i], int(counts[i])
            for p in _pairs_of(s):
                pair_cnt[p] -= c
                if pair_cnt.get(p, 0) <= 0:
                    pair_cnt.pop(p, None)
                w = where.get(p)
                if w is not None:
                    w.discard(i)
            merged, j = [], 0
            while j < len(s):
                if j < len(s) - 1 and (s[j], s[j + 1]) == best:
                    merged.append(s[j] + s[j + 1])
                    j += 2
                else:
                    merged.append(s[j])
                    j += 1
            syms[i] = tuple(merged)
            for p in _pairs_of(syms[i]):
                pair_cnt[p] = pair_cnt.get(p, 0) + c
                where.setdefault(p, set()).add(i)
    return BPEModel(merges)


def train_bpe(ds, n_merges: int, col: str = "text") -> BPEModel:
    """Distributed word counting + driver-side merge learning (see module
    docstring for why this is the honest scale split)."""
    return learn_bpe(word_counts(ds, col), n_merges)


class _Encoder:
    """Actor-pool encode stage: ranks compiled once, per-word memoization."""

    def __init__(self, merges_ref, col: str, out: str):
        import ray

        merges = ray.get(merges_ref) if not isinstance(merges_ref, list) else merges_ref
        self.model = BPEModel(merges)
        self.cache: dict[str, tuple[str, ...]] = {}
        self.col, self.out = col, out

    def __call__(self, batch: pa.Table) -> pa.Table:
        trimmed = pc.utf8_trim_whitespace(batch[self.col])
        words = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.list_flatten(words).to_pylist()  # skips null rows...
        # ...so null rows must contribute 0 to the offset walk too — a null
        # list_value_length is null, and int64-casting that NaN would poison
        # every later row's slice (null text -> empty pieces, loudly aligned)
        lens = pc.fill_null(pc.list_value_length(words), 0)
        offs = np.asarray(lens.to_numpy(zero_copy_only=False), dtype=np.int64)
        if int(offs.sum()) != len(flat):
            raise AssertionError(f"BPE offset walk desynchronized: {offs.sum()} != {len(flat)}")
        pieces, n_pieces = [], np.zeros(len(offs), dtype=np.int64)
        pos = 0
        enc = self.model.encode_word
        cache = self.cache
        for row in range(len(offs)):
            row_pieces = []
            for w in flat[pos : pos + offs[row]]:
                if w:
                    row_pieces.extend(enc(w, cache))
            pieces.append(row_pieces)
            n_pieces[row] = len(row_pieces)
            pos += offs[row]
        return batch.append_column(self.out, pa.array(pieces, pa.list_(pa.string()))).append_column(
            self.out + "_n", pa.array(n_pieces)
        )


def bpe_encode(ds, model: BPEModel, col: str = "text", out: str = "pieces"):
    """Encode ``ds[col]`` with a learned model: appends ``out`` (the piece
    list, end-of-word sentinel attached to each word's final piece) and
    ``{out}_n`` (the piece count). Stateful actor pool — ranks ship once."""
    import ray

    merges_ref = ray.put(model.merges)
    return ds.map_batches(
        _Encoder,
        fn_constructor_args=(merges_ref, col, out),
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        **remote_args(),
    )
