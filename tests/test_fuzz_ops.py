"""Property-based fuzz for the pure batch kernels of the training-data ops
(no Ray session needed): packing arithmetic, chunk tiling, repetition
counts, gram hashing, and the Knuth hash. Each is pinned against a naive
Python reference over randomized inputs."""

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
from hypothesis import given, settings
from hypothesis import strategies as st

from orc_format_ray.ops import chunk, pack, sample, spans, text

WORD = st.text(alphabet="abcdefg", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=0, max_size=40)


@settings(max_examples=60, deadline=None)
@given(
    st.lists(st.integers(0, 500), min_size=1, max_size=60, unique=True),
    st.data(),
    st.integers(1, 64),
)
def test_pack_assignment_matches_naive(keys, data, capacity):
    keys = np.array(keys, dtype=np.int64)
    n_tok = np.array(data.draw(st.lists(st.integers(0, 40), min_size=len(keys), max_size=len(keys))), dtype=np.int64)
    base = data.draw(st.integers(0, 1000))
    out = pack.pack_assignment(keys, n_tok, base, capacity)
    order = np.argsort(keys)
    running = base
    for row, i in zip(out.itertuples(index=False), order):
        assert row.doc_id == keys[i] and row.n_tok == n_tok[i]
        assert row.start_tok == running
        assert row.first_pack == running // capacity
        end = running + max(int(n_tok[i]), 1) - 1
        assert row.last_pack == max(running // capacity, end // capacity)
        running += int(n_tok[i])


@settings(max_examples=40, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=12), st.integers(1, 9))
def test_chunk_batch_tiles_exactly(docs, window):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs], pa.string()),
        }
    )
    out = chunk.chunk_batch(batch, window).to_pandas()
    for i, d in enumerate(docs):
        rows = out[out["doc_id"] == i].sort_values("chunk_id")
        if not d:
            assert len(rows) == 0
            continue
        assert rows["chunk_id"].tolist() == list(range(-(-len(d) // window)))
        assert rows["n_words"].sum() == len(d)
        assert all(n == window for n in rows["n_words"].tolist()[:-1])
        assert " ".join(rows["passage"]) == " ".join(d)  # reassembles the doc


@settings(max_examples=40, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=12))
def test_word_repetition_matches_counter(docs):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array([" ".join(d) for d in docs], pa.string()),
        }
    )
    out = text.word_repetition(batch).to_pandas().set_index("doc_id")
    for i, d in enumerate(docs):
        if not d:
            assert i not in out.index
            continue
        assert out.loc[i, "n_words"] == len(d)
        assert out.loc[i, "n_distinct"] == len(Counter(d))
        assert out.loc[i, "dup_ratio"] == round(1.0 - len(Counter(d)) / len(d), 6)


@settings(max_examples=40, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=10), st.integers(1, 6))
def test_gram_hashes_window_count_and_equality(docs, k):
    words = pa.array([d for d in docs], pa.list_(pa.string()))
    g, doc_idx = spans.gram_hashes(words, k)
    expect = sum(max(0, len(d) - k + 1) for d in docs)
    assert len(g) == expect and len(doc_idx) == expect
    # equal word windows hash equal; the reference groups by gram tuple
    by_gram = {}
    pos = 0
    for i, d in enumerate(docs):
        for j in range(max(0, len(d) - k + 1)):
            by_gram.setdefault(tuple(d[j : j + k]), []).append(pos)
            pos += 1
    for positions in by_gram.values():
        assert len({int(g[p]) for p in positions}) == 1  # same gram -> same hash


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(0, 2**31 - 1), min_size=0, max_size=50), st.integers(0, 1000))
def test_knuth_hash_matches_python(keys, salt):
    got = sample.knuth_hash(np.array(keys, dtype=np.int64), salt)
    exp = [((k + salt) * 2654435761) % (2**32) for k in keys]
    assert got.tolist() == exp
