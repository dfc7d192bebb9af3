"""Batched model inference over an embedding column — the actor-pool
"load model once, score batches forever" pattern every production scorer
(quality classifiers, reward models, toxicity heads) follows.

The model here is a QUANTIZED linear head: weights and activations are
converted to integer units (``floor(x*scale + 0.5)``) and the dot product
runs in exact int64 — the int8-quantized-inference idiom, chosen so the
score is *bitwise reproducible* and SQL-checkable (float dot products are
not: DuckDB's ``list_dot_product`` matches no deterministic fold order —
measured 1e-7 drift; see CLAUDE.md round-4 notes).

Overflow math: |activation| and |weight| are clamped-guarded to 2^19
units, so each product < 2^38 and a 4096-dim sum < 2^50 — exact in int64
AND as a double. The deterministic weight vector is a Knuth-hash formula
of the dimension index, reproducible in ANSI SQL without shipping a
weights table: ``qw(j) = ((j*2654435761) % 2^32) % 8193 - 4096``.

Scale: stateless per-batch compute after a once-per-actor weight
materialization in ``__init__`` — no shuffle, streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import pool_size, remote_args

from .fastagg import fast_groupby

_KNUTH = 2654435761
_ACT_LIMIT = np.int64(1) << 19


def knuth_weights(dim: int, modulus: int = 8193) -> np.ndarray:
    """Deterministic int64 weight vector: ((j*K) % 2^32) % modulus - modulus//2
    for j = 1..dim (1-based to match SQL's WITH ORDINALITY)."""
    j = np.arange(1, dim + 1, dtype=np.uint64)
    h = (j * np.uint64(_KNUTH)) % np.uint64(1 << 32)
    return (h % np.uint64(modulus)).astype(np.int64) - np.int64(modulus // 2)


class LinearScorer:
    """Actor-pool stage: quantized linear head over ``vec_col``.

    ``__init__`` materializes the weight vector ONCE per actor (the stand-in
    for a real model load); ``__call__`` scores a batch with one exact
    integer matmul. Emits (id, score_units, score, label)."""

    def __init__(self, dim: int, act_scale: int = 4096, bias_units: int = 0,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
        self.qw = knuth_weights(dim)
        self.dim = dim
        self.act_scale = int(act_scale)
        self.bias_units = int(bias_units)
        self.vec_col = vec_col
        self.id_col = id_col
        # score = units / (act_scale * 1) — weights are already integer units
        self.denom = np.float64(act_scale)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.vec_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(batch)
        if len(flat) != n * self.dim:
            raise ValueError(
                f"expected fixed {self.dim}-dim vectors, got {len(flat)} values for {n} rows"
            )
        x = flat.reshape(n, self.dim)
        qx = np.floor(x * self.act_scale + 0.5).astype(np.int64)
        if n and np.abs(qx).max() >= _ACT_LIMIT:
            raise ValueError("quantized activation exceeds 2^19 units — lower act_scale")
        units = qx @ self.qw + np.int64(self.bias_units)
        score = units.astype(np.float64) / self.denom
        ids = batch[self.id_col]
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        return pa.table(
            {
                self.id_col: ids.cast(pa.int64()),
                "score_units": pa.array(units),
                "score": pa.array(score, pa.float64()),
                "label_pred": pa.array((units >= 0).astype(np.int64)),
            }
        )


def linear_score(ds, dim: int, act_scale: int = 4096, bias_units: int = 0,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 batch_size: int = 1024):
    """Score every row with the quantized linear head (actor pool sized by
    ``pool_size()`` — never the whole cluster; see CLAUDE.md)."""
    return ds.map_batches(
        LinearScorer,
        fn_constructor_kwargs=dict(
            dim=dim, act_scale=act_scale, bias_units=bias_units,
            vec_col=vec_col, id_col=id_col,
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=pool_size(),
        **remote_args(),
    )


def lift_table(scores_ds, labels_ds, pos_label: int, n_buckets: int = 10,
               score_col: str = "score_units", id_col: str = "vec_id",
               label_col: str = "label", num_join_buckets: int = 64):
    """Model-eval lift/gains table: tile the scored population into
    ``n_buckets`` equi-depth score buckets (ntile's front-loaded rule via
    quantile_bucketize, ``(score, id)`` order), join the labels back by id
    (hash join — both sides stream), and per tile report the positive-class
    rate and its lift over the base rate. Returns a driver DataFrame of
    ``(bucket, n, n_pos, rate, lift)`` — ``n_buckets`` rows.

    ``score_col`` must be exact int64 (linear_score's integer-quantized
    score_units). rate/base/lift are divisions of exact int64 counts —
    ``rate = x/n``, ``lift = (x/n) / (X/N)`` — every step one IEEE op,
    mirrored op-for-op by the SQL oracle (bitwise reproducible).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    from .agg import quantile_bucketize
    from .join import hash_join

    buck = quantile_bucketize(
        scores_ds, order_col=score_col, id_col=id_col, n=n_buckets, value_scale=1
    )
    joined = hash_join(buck, labels_ds, key=id_col, num_buckets=num_join_buckets)

    def cells(batch: pa.Table) -> pa.Table:
        pos = pc.cast(
            pc.equal(batch[label_col].cast(pa.int64()), pa.scalar(pos_label, pa.int64())),
            pa.int64(),
        )
        return pa.table(
            {
                "bucket": batch["bucket"].cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "pos": pos,
            }
        )

    per = (fast_groupby(
        joined.map_batches(cells, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "bucket",
        Sum("one", alias_name="n"), Sum("pos", alias_name="n_pos"),
    )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    N = int(per["n"].sum())
    X = int(per["n_pos"].sum())
    if N == 0 or X == 0:
        raise ValueError("lift_table: needs a non-empty population with positives")
    base = np.float64(X) / np.float64(N)
    rate = per["n_pos"].astype(np.int64).to_numpy().astype(np.float64) / per["n"].astype(
        np.int64
    ).to_numpy().astype(np.float64)
    return pd.DataFrame(
        {
            "bucket": per["bucket"].astype("int64"),
            "n": per["n"].astype("int64"),
            "n_pos": per["n_pos"].astype("int64"),
            "rate": rate,
            "lift": rate / base,
        }
    )


def auc_exact(ds, score_col: str = "score_units", pos_col: str = "pos"):
    """Exact ROC-AUC from integer scores and a 0/1 label column — the
    rank-statistic identity with proper tie handling (average ranks):

        2U  = 2*sum(ranks of positives) - npos*(npos+1)
        AUC = 2U / (2 * npos * nneg)

    computed entirely in exact Python ints from the (score, count,
    pos_count) value distribution — ONE double division at the end
    (bitwise reproducible vs the SQL window mirror). Returns a one-row
    driver DataFrame ``(n, npos, nneg, auc)``.

    Plan: per-batch (score, n, pos) partials, one groupby over |distinct
    scores| rows, ascending driver fold. Memory is O(|distinct scores|) —
    the quantiles_by_counts contract (integer-quantized scores bound it).
    """
    import pandas as pd
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        p = batch[pos_col].cast(pa.int64())
        pn = p.to_numpy(zero_copy_only=False)
        if batch[pos_col].null_count or ((pn != 0) & (pn != 1)).any():
            raise ValueError(f"auc_exact: {pos_col!r} must be 0/1 non-null")
        t = pa.table(
            {
                "s": batch[score_col].cast(pa.int64()),
                "one": pa.array(np.ones(batch.num_rows, np.int64)),
                "p": p,
            }
        )
        g = t.group_by("s").aggregate([("one", "sum"), ("p", "sum")])
        return g.rename_columns(["s", "n", "pos"])

    dist = (fast_groupby(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "s",
        Sum("n", alias_name="n"), Sum("pos", alias_name="pos"),
    )
        .to_pandas()
        .sort_values("s")
        .reset_index(drop=True)
    )
    cum = 0  # rows strictly below the current score value
    two_sumranks = 0  # 2 * sum of average 1-based ranks of positives
    npos = 0
    ntot = 0
    for _, cg, pg in dist[["s", "n", "pos"]].itertuples(index=False):
        cg, pg = int(cg), int(pg)
        two_sumranks += pg * (2 * cum + cg + 1)
        cum += cg
        npos += pg
        ntot += cg
    nneg = ntot - npos
    if npos == 0 or nneg == 0:
        raise ValueError("auc_exact: needs both positive and negative rows")
    if two_sumranks >= 1 << 62 or 2 * npos * nneg >= 1 << 62:
        raise ValueError("auc_exact: rank sums exceed the exact-int guard")
    auc = float(np.float64(two_sumranks - npos * (npos + 1)) / np.float64(2 * npos * nneg))
    return pd.DataFrame({"n": [ntot], "npos": [npos], "nneg": [nneg], "auc": [auc]})
