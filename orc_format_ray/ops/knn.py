"""k-nearest-neighbor label prediction over an embedding column — the
label-propagation / weak-supervision primitive ("tag the unlabeled pool
from its nearest labeled examples").

Exactness rides on the same integer-quantization trick as ops/infer.py:
activations quantize to ``floor(x*scale + 0.5)`` int64 units, so every
dot product is an exact integer — products < 2^38, 4096-dim sums < 2^50,
below 2^53, so even a float64 evaluation (DuckDB's list_dot_product over
integer-valued doubles) reproduces it bit-for-bit. Top-k order is
``(dot DESC, vec_id ASC)``; the majority vote breaks ties by smallest
label — both total orders, both SQL row_number-reproducible.

Scale plan: the query matrix broadcasts once via ``ray.put`` (guarded);
each corpus batch computes one exact int64 matmul and keeps only its
LOCAL top-k rows per query (k x n_queries metadata per block), ONE small
groupby folds the global top-k and votes. Corpus vectors never shuffle.
For corpus-scale query sets, switch to the IVF index (ops/similarity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .._rayutil import remote_args

from .fastagg import fast_groupby

_ACT_LIMIT = np.int64(1) << 19


def _quantize(x: np.ndarray, scale: int) -> np.ndarray:
    q = np.floor(x.astype(np.float64) * scale + 0.5).astype(np.int64)
    if q.size and np.abs(q).max() >= _ACT_LIMIT:
        raise ValueError("quantized activation exceeds 2^19 units — lower act_scale")
    return q


def knn_label_predict(
    ds,
    queries: np.ndarray,
    query_ids: np.ndarray,
    k: int = 5,
    act_scale: int = 4096,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    exclude_self: bool = True,
    max_broadcast_queries: int = 1 << 16,
):
    """Predict a label for each query vector by majority vote of its k
    nearest corpus neighbors under the exact quantized dot product.
    Returns a driver DataFrame ``(qid, label_pred, votes)``.

    ``queries``: float (nq, dim) matrix; ``query_ids``: int64 ids aligned
    to its rows. With ``exclude_self`` a corpus row whose ``id_col`` equals
    the query id never votes (leave-one-out evaluation)."""
    import ray

    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    nq, dim = queries.shape
    if nq > max_broadcast_queries:
        raise ValueError(
            f"{nq} queries exceed max_broadcast_queries — batch the query set "
            "or use the IVF index for corpus-scale query sets"
        )
    qm = _quantize(np.asarray(queries), act_scale)
    qids = np.asarray(query_ids, np.int64)
    q_ref = ray.put((qm, qids))

    def local_topk(batch: pa.Table) -> pa.Table:
        qmat, qid_arr = ray.get(q_ref)
        col = batch[vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        n = len(batch)
        empty = pa.table(
            {
                "qid": pa.array([], pa.int64()),
                "dot": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                label_col: pa.array([], pa.int64()),
            }
        )
        if n == 0:
            return empty
        if len(flat) != n * dim:
            raise ValueError(f"expected fixed {dim}-dim vectors, got {len(flat)} values for {n} rows")
        cm = _quantize(flat.reshape(n, dim), act_scale)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        dots = cm @ qmat.T  # (n, nq) exact int64
        rows_q, rows_dot, rows_id, rows_lab = [], [], [], []
        for j in range(len(qid_arr)):
            d = dots[:, j]
            mask = ids != qid_arr[j] if exclude_self else np.ones(n, bool)
            idx = np.flatnonzero(mask)
            if len(idx) == 0:
                continue
            # local top-k by (dot DESC, id ASC): lexsort on (-order keys)
            order = idx[np.lexsort((ids[idx], -d[idx]))][:k]
            rows_q.append(np.full(len(order), qid_arr[j], np.int64))
            rows_dot.append(d[order])
            rows_id.append(ids[order])
            rows_lab.append(labels[order])
        if not rows_q:
            return empty
        return pa.table(
            {
                "qid": pa.array(np.concatenate(rows_q)),
                "dot": pa.array(np.concatenate(rows_dot)),
                id_col: pa.array(np.concatenate(rows_id)),
                label_col: pa.array(np.concatenate(rows_lab)),
            }
        )

    cand = ds.map_batches(local_topk, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def vote(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["dot", id_col], ascending=[False, True], kind="stable").head(k)
        counts = g.groupby(label_col).size().reset_index(name="votes")
        counts = counts.sort_values(["votes", label_col], ascending=[False, True], kind="stable")
        top = counts.iloc[0]
        return pd.DataFrame(
            {
                "qid": [int(g["qid"].iloc[0])],
                "label_pred": [int(top[label_col])],
                "votes": [int(top["votes"])],
            }
        )

    out = cand.groupby("qid").map_groups(vote, batch_format="pandas", **remote_args()).to_pandas()
    if len(out) == 0:
        return pd.DataFrame(
            {
                "qid": pd.Series([], dtype=np.int64),
                "label_pred": pd.Series([], dtype=np.int64),
                "votes": pd.Series([], dtype=np.int64),
            }
        )
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out.sort_values("qid").reset_index(drop=True)


NEG_MIX = np.uint64(1000003)
NEG_KNUTH = np.uint64(2654435761)
_NEG_M32 = np.uint64(1) << np.uint64(32)


def negative_samples(ds, k: int = 5, id_col: str = "vec_id", label_col: str = "label",
                     max_broadcast_pool: int = 1 << 24):
    """Deterministic contrastive negative sampling: for every anchor row,
    the ``k`` candidates with a DIFFERENT label ranked by the integer hash
    ``((anchor*1000003 + cand) % 2^32) * 2654435761 % 2^32`` (ties by
    candidate id) — reproducible across any shuffle plan and mirrored
    verbatim in SQL (HUGEINT-lifted there; the product tops 2^63). Returns
    a Dataset of ``(anchor_id, neg_id, rank)``, rank 1..k.

    Plan: the (id, label) candidate pool is metadata — ONE cell groupby
    dedupes it, then it broadcasts once (`ray.put`, guarded by
    ``max_broadcast_pool``); each anchor batch ranks against the pool
    vectorized (m x P hash matrix in uint64, argpartition per row). Ids
    must be in [0, 2^31) so the (hash << 31 | id) tie key fits uint64."""
    import ray
    from ray.data.aggregate import Count

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def cells(batch: pa.Table) -> pa.Table:
        t = pa.table({"i": batch[id_col].cast(pa.int64()), "l": batch[label_col].cast(pa.int64())})
        if t["i"].null_count or t["l"].null_count:
            raise ValueError("negative_samples: id/label must be non-null")
        return t.group_by(["i", "l"]).aggregate([])

    pool = (fast_groupby(
        ds.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["i", "l"],
        Count(alias_name="_c"),
    )
        .select_columns(["i", "l"])
        .to_pandas()
    )
    if len(pool) > max_broadcast_pool:
        raise ValueError(f"{len(pool)} pool rows exceed max_broadcast_pool={max_broadcast_pool}")
    pids = pool["i"].to_numpy(np.int64)
    if len(pids) and (pids.min() < 0 or pids.max() >= 1 << 31):
        raise ValueError("negative_samples: ids must be in [0, 2^31)")
    order = np.argsort(pids)
    pool_ref = ray.put((pids[order].astype(np.uint64), pool["l"].to_numpy(np.int64)[order]))

    def pick(batch: pa.Table) -> pa.Table:
        cand, clab = ray.get(pool_ref)
        a = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        al = batch[label_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        empty = pa.table({"anchor_id": pa.array([], pa.int64()),
                          "neg_id": pa.array([], pa.int64()),
                          "rank": pa.array([], pa.int64())})
        if not len(a) or not len(cand):
            return empty
        if a.min() < 0 or a.max() >= 1 << 31:
            raise ValueError("negative_samples: ids must be in [0, 2^31)")
        au = a.astype(np.uint64)
        h = ((au[:, None] * NEG_MIX + cand[None, :]) % _NEG_M32 * NEG_KNUTH) % _NEG_M32
        key = (h << np.uint64(31)) | cand[None, :]
        same = clab[None, :] == al[:, None]
        key = np.where(same, np.uint64(0xFFFFFFFFFFFFFFFF), key)
        kk = min(k, key.shape[1])
        part = np.argpartition(key, kk - 1, axis=1)[:, :kk]
        rows = np.arange(len(a))[:, None]
        sel_keys = key[rows, part]
        srt = np.argsort(sel_keys, axis=1)
        top = part[rows, srt]
        top_keys = sel_keys[rows, srt]
        valid = top_keys != np.uint64(0xFFFFFFFFFFFFFFFF)
        anchor = np.repeat(a, kk)[valid.ravel()]
        neg = cand[top].astype(np.int64).ravel()[valid.ravel()]
        rank = np.tile(np.arange(1, kk + 1, dtype=np.int64), len(a))[valid.ravel()]
        return pa.table({"anchor_id": pa.array(anchor, pa.int64()),
                         "neg_id": pa.array(neg, pa.int64()),
                         "rank": pa.array(rank, pa.int64())})

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
