"""Full-text search over the corpus: a sharded inverted index + BM25.

* ``build_inverted_index`` — ONE corpus pass builds term-hash-bucketed
  postings shards (term, doc_id, tf, dl): each block splits its docs with
  the shared oracle-aligned tokenizer (ops/text.py:split_nonempty_docs),
  folds per-(doc, term) frequencies vectorized, and writes one
  content-hashed shard file per (bucket, block) — the IVF shard idiom
  (ops/similarity.py), so rebuilds overwrite identically and a failed run
  resumes by re-running blocks. Corpus stats (n_docs, total_len) fold from
  per-block lineage rows, never a second scan.
* ``bm25_contributions`` — per-(query term, doc) BM25 contribution. Reads
  ONLY the buckets the query terms hash to. Every float op mirrors the SQL
  oracle's expression tree exactly (IEEE ops are deterministic given the
  same tree), and idf uses ``math.log`` — NOT ``np.log``, whose SIMD
  implementation drifts 1 ulp from libm/DuckDB ``ln`` on some inputs
  (measured: ln(3.7)).
* ``bm25_topk`` — rank docs by summed contributions. The per-doc sum runs
  in ascending-term order starting from 0.0, which is bit-identical to the
  SQL plan ``COALESCE(c_t1, 0.0) + COALESCE(c_t2, 0.0) + ...`` (left-to-
  right adds; contributions are positive so the 0.0 identity is exact).

Scale shape: postings are metadata (two ints + a term) — raw text never
shuffles; a query moves |matched postings| rows, not the corpus; the
per-doc score groups are at most |query terms| rows each.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import content_hash, split_nonempty_docs

from .fastagg import fast_groupby

_META = "_meta.json"


def _term_bucket(terms: pa.Array, num_buckets: int) -> np.ndarray:
    return (content_hash(terms) % np.uint64(num_buckets)).astype(np.int64)


def build_inverted_index(ds, index_dir: str, column: str = "text", id_col: str = "doc_id",
                         num_buckets: int = 8) -> dict:
    """Build the postings shards + ``_meta.json`` under ``index_dir``.
    Returns the meta dict. Docs empty after trim are not indexed and do
    not count toward n_docs/avgdl (the SQL mirror filters
    ``trim(text) <> ''``). Stale bucket files from a previous build are
    removed first (same rebuild rule as the IVF shard writer)."""
    import ray.data

    if num_buckets < 1:
        raise ValueError(f"num_buckets must be >= 1, got {num_buckets}")
    os.makedirs(index_dir, exist_ok=True)
    for f in os.listdir(index_dir):
        if f.startswith("bucket-"):
            os.unlink(os.path.join(index_dir, f))

    def split_write(batch: pa.Table) -> pa.Table:
        import hashlib

        import pyarrow.parquet as pq

        ids, words = split_nonempty_docs(batch, column, id_col)
        out = {"bucket": [], "rows": [], "path": [], "n_docs": [], "total_len": []}
        dl = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(dl):
            flat = words.flatten()
            doc_of = np.repeat(np.arange(len(dl)), dl)
            # per-(doc, term) tf: dictionary codes + lexsort + run-length
            codes = pc.dictionary_encode(flat)
            terms_dict = codes.dictionary
            code = codes.indices.to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((code, doc_of))
            d_s, c_s = doc_of[order], code[order]
            is_start = np.concatenate(([True], (d_s[1:] != d_s[:-1]) | (c_s[1:] != c_s[:-1])))
            starts = np.flatnonzero(is_start)
            tf = np.diff(np.concatenate((starts, [len(c_s)]))).astype(np.int64)
            p_doc = d_s[starts]
            p_code = c_s[starts]
            ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
            post = pa.table(
                {
                    "term": terms_dict.take(pa.array(p_code, pa.int64())),
                    id_col: pa.array(ids_np[p_doc], pa.int64()),
                    "tf": pa.array(tf, pa.int64()),
                    "dl": pa.array(dl[p_doc], pa.int64()),
                }
            )
            buckets = _term_bucket(post["term"].combine_chunks(), num_buckets)
            for b in np.unique(buckets):
                sub = post.filter(pa.array(buckets == b)).sort_by([("term", "ascending"), (id_col, "ascending")])
                digest = hashlib.sha256(
                    sub[id_col].to_numpy(zero_copy_only=False).tobytes()
                    + sub["tf"].to_numpy(zero_copy_only=False).tobytes()
                ).hexdigest()[:16]
                path = os.path.join(index_dir, f"bucket-{int(b):05d}-{digest}.parquet")
                tmp = path + f".tmp.{os.getpid()}"
                pq.write_table(sub, tmp)
                os.replace(tmp, path)
                out["bucket"].append(int(b))
                out["rows"].append(sub.num_rows)
                out["path"].append(path)
                out["n_docs"].append(0)
                out["total_len"].append(0)
        # one stats row per block (whole docs live in one block, so the
        # per-block (n_docs, sum dl) partials fold exactly)
        out["bucket"].append(-1)
        out["rows"].append(0)
        out["path"].append("")
        out["n_docs"].append(int(len(dl)))
        out["total_len"].append(int(dl.sum()) if len(dl) else 0)
        return pa.table(
            {
                "bucket": pa.array(out["bucket"], pa.int64()),
                "rows": pa.array(out["rows"], pa.int64()),
                "path": pa.array(out["path"], pa.string()),
                "n_docs": pa.array(out["n_docs"], pa.int64()),
                "total_len": pa.array(out["total_len"], pa.int64()),
            }
        )

    lineage = ds.map_batches(split_write, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).to_pandas()
    files: dict[str, list[str]] = {}
    for b, p in zip(lineage["bucket"], lineage["path"]):
        if int(b) >= 0:
            files.setdefault(str(int(b)), []).append(p)
    meta = {
        "num_buckets": int(num_buckets),
        "n_docs": int(lineage["n_docs"].sum()),
        "total_len": int(lineage["total_len"].sum()),
        "column": column,
        "id_col": id_col,
        "files": {b: sorted(v) for b, v in sorted(files.items())},
    }
    tmp = os.path.join(index_dir, _META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(index_dir, _META))
    return meta


def _load_meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, _META)) as f:
        return json.load(f)


def bm25_contributions(index_dir: str, terms: list[str], k1: float = 1.2, b: float = 0.75):
    """Dataset of (term, doc_id, tf, dl, contribution) for each (query
    term, matching doc). Reads only the probed buckets. See module doc for
    the float-parity contract."""
    import ray
    import ray.data

    meta = _load_meta(index_dir)
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("bm25 needs at least one query term")
    id_col = meta["id_col"]

    empty = pa.table(
        {
            "term": pa.array([], pa.string()),
            id_col: pa.array([], pa.int64()),
            "tf": pa.array([], pa.int64()),
            "dl": pa.array([], pa.int64()),
            "contribution": pa.array([], pa.float64()),
        }
    )
    want = np.unique(_term_bucket(pa.array(terms, pa.string()), meta["num_buckets"]))
    paths = sorted(p for bnum in want for p in meta["files"].get(str(int(bnum)), []))
    if not paths or meta["n_docs"] == 0:
        return ray.data.from_arrow(empty)

    tset = pa.array(terms, pa.string())
    probed = (
        ray.data.read_parquet(paths)
        .map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=tset)),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        )
        .materialize()  # consumed twice: df aggregate + contribution pass
    )
    from ray.data.aggregate import Count

    df_rows = fast_groupby(
        probed,
        "term",
        Count(alias_name="df"),
    ).take_all()
    df = {r["term"]: int(r["df"]) for r in df_rows}
    n = meta["n_docs"]
    avgdl = meta["total_len"] / n  # int/int -> double, == CAST(total)/CAST(n)
    # math.log, not np.log: see module doc
    idf = {t: math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1.0) for t in df}
    idf_ref = ray.put(idf)
    kk = k1 + 1.0
    one_b = 1.0 - b

    def score(batch: pa.Table) -> pa.Table:
        if not batch.num_rows:
            return empty
        w = ray.get(idf_ref)
        tvals = batch["term"].to_pylist()
        idf_row = np.array([w[t] for t in tvals], dtype=np.float64)
        tf = batch["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        dl = batch["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        # expression TREE mirrors the SQL oracle exactly:
        # idf * ((tf * (k1+1.0)) / (tf + k1 * ((1.0-b) + b * (dl / avgdl))))
        contrib = idf_row * ((tf * kk) / (tf + k1 * (one_b + b * (dl / avgdl))))
        return pa.table(
            {
                "term": batch["term"],
                id_col: batch[id_col],
                "tf": batch["tf"],
                "dl": batch["dl"],
                "contribution": pa.array(contrib, pa.float64()),
            }
        )

    return probed.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def bm25_topk(index_dir: str, terms: list[str], k: int = 10, k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """Top-k docs by BM25 score (ties by doc id asc). Returns a pyarrow
    Table (rank, doc_id, score, n_terms). Per-doc groups hold at most
    |query terms| rows; only k rows per block reach the driver fold."""
    import pandas as pd

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    meta = _load_meta(index_dir)
    id_col = meta["id_col"]
    contr = bm25_contributions(index_dir, terms, k1=k1, b=b)

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        g2 = g.sort_values("term")
        s = 0.0
        for c in g2["contribution"].to_numpy():
            s = s + float(c)  # sequential adds == SQL's left-to-right COALESCE sum
        return pd.DataFrame(
            {id_col: [g2[id_col].iloc[0]], "score": [s], "n_terms": np.array([len(g2)], dtype=np.int64)}
        )

    scored = contr.groupby(id_col).map_groups(per_doc, batch_format="pandas", **remote_args()).materialize()

    def block_topk(batch: pa.Table) -> pa.Table:
        idx = pc.sort_indices(batch, sort_keys=[("score", "descending"), (id_col, "ascending")])
        return batch.take(idx[:k])

    tops = list(
        scored.map_batches(block_topk, batch_format="pyarrow", **remote_args()).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        )
    )
    if not tops:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "score": pa.array([], pa.float64()),
                "n_terms": pa.array([], pa.int64()),
            }
        )
    dfp = pa.concat_tables(tops).to_pandas()
    dfp = dfp.sort_values(["score", id_col], ascending=[False, True]).head(k).reset_index(drop=True)
    dfp.insert(0, "rank", np.arange(1, len(dfp) + 1, dtype=np.int64))
    return pa.Table.from_pandas(dfp, preserve_index=False)


def boolean_and_search(index_dir: str, terms: list[str]):
    """Conjunctive (AND) boolean retrieval over the inverted index: doc ids
    whose word set contains EVERY query term. Reads only the probed term
    buckets (the bm25 pushdown path); postings are unique per (term, doc)
    by construction, so a doc matches iff its filtered posting count equals
    |distinct terms|. Returns a Dataset of ``(id_col,)`` — filter/sort
    downstream. Exact-count semantics, no floats anywhere."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    meta = _load_meta(index_dir)
    terms = sorted(set(terms))
    if not terms:
        raise ValueError("boolean_and_search needs at least one query term")
    id_col = meta["id_col"]
    empty = pa.table({id_col: pa.array([], pa.int64())})
    want = np.unique(_term_bucket(pa.array(terms, pa.string()), meta["num_buckets"]))
    paths = sorted(p for bnum in want for p in meta["files"].get(str(int(bnum)), []))
    if not paths:
        return ray.data.from_arrow(empty)
    tset = pa.array(terms, pa.string())
    need = len(terms)

    matched = (fast_groupby(
        ray.data.read_parquet(paths)
        .map_batches(
            lambda t: t.filter(pc.is_in(t["term"], value_set=tset)).select([id_col]),
            batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
        ),
        id_col,
        Count(alias_name="__ba_hits__"),
    )
    )

    def keep(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["__ba_hits__"].cast(pa.int64()), pa.scalar(need, pa.int64()))
        return batch.filter(m).select([id_col])

    return matched.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
