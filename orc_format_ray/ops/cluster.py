"""Distributed k-means over an embedding column (list<float>).

The curation workhorse behind semantic dedup, topic balancing, and IVF
coarse-quantizer training — expressed Ray-Data-first so the corpus never
moves:

* each Lloyd iteration broadcasts the (k, dim) centroid matrix once
  (``ray.put``) and runs ONE ``map_batches`` pass; every batch assigns its
  vectors with a single float64 matmul and emits k tiny partial rows
  (cluster, count, sum-vector, squared-error sum);
* the driver folds n_blocks x k partial rows (metadata-only traffic — at
  10^6 blocks and k=1024 this is still just numbers, never vectors of the
  corpus) and updates centroids; empty clusters keep their previous
  centroid so k never silently shrinks;
* assignment of the final model is one more stateless ``map_batches``
  (``assign_clusters``) that appends an int32 ``cluster`` column.

Determinism: ``init="min-ids"`` seeds from the k smallest ``id_col`` values
(reproducible on any block layout and expressible in plain SQL, which is how
the ``kmeans_embeddings`` oracle certifies two full Lloyd rounds);
assignment breaks distance ties toward the lowest cluster index, matching
``row_number() OVER (ORDER BY distance, cluster)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args
from .similarity import _embedding_matrix


class KMeansModel:
    """Result of :func:`kmeans`: final centroids (float64 ``(k, dim)``),
    the member count of each cluster under the LAST assignment, and the
    per-iteration inertia (sum of squared distances to the assigned
    centroid — non-increasing across iterations by Lloyd's guarantee)."""

    def __init__(self, centroids: np.ndarray, counts: np.ndarray, sums: np.ndarray, inertia: list[float]):
        self.centroids = centroids
        self.counts = counts
        self.sums = sums  # per-cluster float64 sum-vectors of the last assignment
        self.inertia = inertia

    @property
    def k(self) -> int:
        return len(self.centroids)


def _assign(emb: np.ndarray, cents: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized nearest-centroid assignment: argmin of the squared L2
    distance, computed as ||x||^2 - 2 x.C^T + ||c||^2 (one matmul, float64).
    np.argmin takes the FIRST minimum, i.e. ties go to the lowest cluster
    index. Returns (assignment int64, squared distance float64 clipped >=0).
    """
    d2 = (emb * emb).sum(axis=1, keepdims=True) - 2.0 * (emb @ cents.T) + (cents * cents).sum(axis=1)
    a = np.argmin(d2, axis=1)
    return a, np.maximum(d2[np.arange(len(a)), a], 0.0)


def _unit64(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _partials(cent_ref, col: str, normalize: bool):
    """Stateless per-batch partial: k rows of (cluster, n, sumvec, sq_err)."""

    def fn(batch: pa.Table) -> pa.Table:
        import ray

        cents = ray.get(cent_ref) if not isinstance(cent_ref, np.ndarray) else cent_ref
        emb = _embedding_matrix(batch, col)
        if normalize and emb.shape[0]:
            emb = _unit64(emb)
        k, dim = cents.shape
        if emb.shape[0] == 0:
            return pa.table(
                {
                    "cluster": pa.array([], pa.int32()),
                    "n": pa.array([], pa.int64()),
                    "sumvec": pa.array([], pa.list_(pa.float64())),
                    "sq_err": pa.array([], pa.float64()),
                }
            )
        if emb.shape[1] != dim:
            raise ValueError(f"embedding dim {emb.shape[1]} != centroid dim {dim}")
        a, d2 = _assign(emb, cents)
        counts = np.bincount(a, minlength=k).astype(np.int64)
        sums = np.zeros((k, dim), dtype=np.float64)
        np.add.at(sums, a, emb)
        errs = np.bincount(a, weights=d2, minlength=k)
        return pa.table(
            {
                "cluster": pa.array(np.arange(k, dtype=np.int32)),
                "n": pa.array(counts),
                "sumvec": pa.array(list(sums), pa.list_(pa.float64())),
                "sq_err": pa.array(errs, pa.float64()),
            }
        )

    return fn


def kmeans(
    ds,
    k: int = 8,
    *,
    col: str = "embedding",
    id_col: str = "vec_id",
    iters: int = 10,
    init: str | np.ndarray = "min-ids",
    tol: float = 0.0,
    normalize: bool = False,
) -> KMeansModel:
    """Lloyd's k-means over ``ds[col]``. ``init`` is ``"min-ids"`` (the
    embeddings of the k smallest ``id_col`` values — deterministic and
    SQL-auditable) or an explicit ``(k, dim)`` array. Stops after ``iters``
    iterations or when no centroid moves more than ``tol`` (L2). Each
    iteration is one streaming pass; only k-row partials reach the driver.

    ``normalize=True`` runs SPHERICAL k-means (cosine geometry): vectors
    and seeds are unit-normalized and every updated centroid is
    re-normalized, so L2-argmin == cosine-argmax each round — the trainer
    IVF coarse quantizers want (see ``IVFIndex.train_distributed``).
    """
    import ray

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if isinstance(init, np.ndarray):
        cents = np.asarray(init, dtype=np.float64)
        if cents.shape[0] != k:
            raise ValueError(f"init has {cents.shape[0]} rows, expected k={k}")
    elif init == "min-ids":
        # each batch forwards only its own k smallest rows (metadata-sized);
        # the driver folds n_blocks x k candidates
        def head(batch: pa.Table) -> pa.Table:
            ids = batch[id_col].to_numpy(zero_copy_only=False)
            take = np.argsort(ids, kind="stable")[:k]
            return batch.select([id_col, col]).take(pa.array(take))

        rows = ds.map_batches(head, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
        if len(rows) < k:
            raise ValueError(f"k={k} but dataset has only {len(rows)} rows")
        ids = np.array([r[id_col] for r in rows])
        order = np.argsort(ids, kind="stable")[:k]
        cents = np.array([np.asarray(rows[i][col], dtype=np.float64) for i in order])
    else:
        raise ValueError(f"unknown init {init!r}")
    if normalize:
        cents = _unit64(cents)

    counts = np.zeros(k, dtype=np.int64)
    sums = np.zeros_like(cents)
    inertia: list[float] = []
    for _ in range(max(iters, 1)):
        cent_ref = ray.put(cents)
        parts = ds.map_batches(
            _partials(cent_ref, col, normalize), batch_format="pyarrow", zero_copy_batch=True, **remote_args()
        ).take_all()
        counts = np.zeros(k, dtype=np.int64)
        sums = np.zeros_like(cents)
        err = 0.0
        for row in parts:
            c = int(row["cluster"])
            counts[c] += int(row["n"])
            sums[c] += np.asarray(row["sumvec"], dtype=np.float64)
            err += float(row["sq_err"])
        inertia.append(err)
        new = cents.copy()  # empty clusters keep their previous centroid
        nz = counts > 0
        new[nz] = sums[nz] / counts[nz, None]
        if normalize:
            new[nz] = _unit64(new[nz])
        shift = float(np.linalg.norm(new - cents, axis=1).max()) if k else 0.0
        cents = new
        if shift <= tol:
            break
    return KMeansModel(cents, counts, sums, inertia)


def assign_clusters(ds, centroids: np.ndarray, *, col: str = "embedding", out_col: str = "cluster"):
    """Append an int32 ``out_col`` = nearest-centroid index (and a float64
    ``{out_col}_dist2`` squared distance) to every row — one stateless
    vectorized pass; the centroid matrix is broadcast once."""
    import ray

    cents = np.asarray(centroids, dtype=np.float64)
    cent_ref = ray.put(cents)

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        if batch.num_rows == 0:  # (0, 0) emb would break the matmul
            return batch.append_column(out_col, pa.array([], pa.int32())).append_column(
                f"{out_col}_dist2", pa.array([], pa.float64())
            )
        c = _ray.get(cent_ref)
        emb = _embedding_matrix(batch, col)
        a, d2 = _assign(emb, c)
        return batch.append_column(out_col, pa.array(a.astype(np.int32))).append_column(
            f"{out_col}_dist2", pa.array(d2, pa.float64())
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


class PCAModel:
    """Principal components of an embedding column: ``mean`` (dim,),
    ``components`` (n_components, dim) row-orthonormal, ``explained``
    (n_components,) eigenvalue share of total variance. Component sign is
    fixed (largest-|coef| coordinate positive) so results are deterministic
    across runs and block layouts."""

    def __init__(self, mean: np.ndarray, components: np.ndarray, explained: np.ndarray):
        self.mean = mean
        self.components = components
        self.explained = explained


def pca(ds, n_components: int, *, col: str = "embedding") -> PCAModel:
    """Distributed PCA: ONE streaming pass folds per-batch (n, sum, X^T X)
    moment partials — a fixed (dim x dim) matrix per block, never the rows —
    then the driver eigendecomposes the (dim x dim) covariance. Exactly the
    textbook covariance PCA; dim is assumed driver-small (embeddings are
    64..4096 wide), the ROW count is what scales."""

    def partial(batch: pa.Table) -> pa.Table:
        from .similarity import _embedding_matrix

        x = _embedding_matrix(batch, col)
        if x.shape[0] == 0:
            return pa.table({"n": pa.array([], pa.int64()), "s": pa.array([], pa.list_(pa.float64())),
                             "xx": pa.array([], pa.list_(pa.float64()))})
        return pa.table(
            {
                "n": pa.array([x.shape[0]], pa.int64()),
                "s": pa.array([x.sum(axis=0)], pa.list_(pa.float64())),
                "xx": pa.array([(x.T @ x).ravel()], pa.list_(pa.float64())),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    if not parts:
        raise ValueError("pca over an empty dataset")
    n = sum(int(p["n"]) for p in parts)
    s = np.zeros(len(parts[0]["s"]), dtype=np.float64)
    xx = np.zeros(len(parts[0]["xx"]), dtype=np.float64)
    for p in parts:
        s += np.asarray(p["s"], dtype=np.float64)
        xx += np.asarray(p["xx"], dtype=np.float64)
    dim = len(s)
    if not 1 <= n_components <= dim:
        raise ValueError(f"n_components must be in [1, {dim}], got {n_components}")
    mean = s / n
    cov = xx.reshape(dim, dim) / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    # deterministic sign: make the largest-|coef| coordinate positive
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    total = float(np.maximum(evals.sum(), 1e-300))
    return PCAModel(mean, comps, np.maximum(evals[order], 0.0) / total)


def pca_transform(ds, model: PCAModel, *, col: str = "embedding", out: str = "pca"):
    """Project every row onto the learned components (one matmul per batch;
    mean/components broadcast once): appends ``out`` = list<float64> of
    length n_components."""
    import ray

    ref = ray.put((model.mean, model.components))

    def fn(batch: pa.Table) -> pa.Table:
        import ray as _ray

        from .similarity import _embedding_matrix

        if batch.num_rows == 0:  # (0, 0) emb would break the broadcast
            return batch.append_column(out, pa.array([], pa.list_(pa.float64())))
        mean, comps = _ray.get(ref)
        x = _embedding_matrix(batch, col)
        z = (x - mean) @ comps.T
        return batch.append_column(out, pa.array(list(z), pa.list_(pa.float64())))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def cap_per_cluster(ds, centroids: np.ndarray, cap: int, *, col: str = "embedding",
                    id_col: str = "vec_id", salt: int = 0):
    """Semantic diversity cap: keep at most ``cap`` rows per
    nearest-centroid cluster — the "no topic dominates the mixture" pass of
    a curation pipeline. Winners are drawn deterministically by ascending
    (knuth_hash(id), id) within each cluster (the same SQL-auditable rule
    as ``stratified_sample``, which does the metadata-only heavy lifting:
    per-batch top-cap combiners, tiny per-cluster groupby, broadcast
    semi-join back). The assignment pass runs twice (winner selection +
    final filter) — one extra matmul per batch, cheaper than materializing
    the assigned corpus."""
    from .sample import stratified_sample

    assigned = assign_clusters(ds, centroids, col=col)
    return stratified_sample(assigned, cap, stratum="cluster", key=id_col, salt=salt)


def label_centroid_cosine(ds, label_col: str = "label", vec_col: str = "embedding"):
    """Pairwise cosine similarity between per-label centroid embeddings —
    the class-separation audit before using labels for curriculum or
    eval splits. Per batch: one (label, vector-sum, count) partial per
    label (float64 accumulation, |labels| x dim values move — never rows);
    the driver folds partials in sorted-label order and emits the
    |labels|^2/2 cosine matrix. Float sums are layout-sensitive at the
    1-ulp level -> rows-only oracle; accuracy pinned by numpy tests.
    Returns a driver DataFrame (label_a, label_b, cosine)."""
    import pandas as pd
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        emb = batch[vec_col].combine_chunks()
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
        counts = pc.list_value_length(emb).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(np.unique(counts[counts >= 0])) > 1:
            raise ValueError("label_centroid_cosine: ragged embedding lengths")
        dim = int(counts[0]) if len(counts) else 0
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        mat = flat.reshape(-1, dim) if dim else flat.reshape(0, 0)
        out_l, out_s, out_n = [], [], []
        for lv in np.unique(labels):
            m = labels == lv
            out_l.append(int(lv))
            out_s.append(mat[m].sum(axis=0))
            out_n.append(int(m.sum()))
        return pa.table({
            "label": pa.array(out_l, pa.int64()),
            "s": pa.array([x.tolist() for x in out_s], pa.list_(pa.float64())),
            "n": pa.array(out_n, pa.int64()),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).to_pandas()
    if len(parts) == 0:
        return pd.DataFrame({"label_a": pd.Series(dtype=np.int64),
                             "label_b": pd.Series(dtype=np.int64),
                             "cosine": pd.Series(dtype=np.float64)})
    sums: dict[int, np.ndarray] = {}
    ns: dict[int, int] = {}
    for _, r in parts.sort_values("label").iterrows():
        v = np.asarray(r["s"], dtype=np.float64)
        sums[r["label"]] = sums.get(r["label"], 0) + v
        ns[r["label"]] = ns.get(r["label"], 0) + int(r["n"])
    labels = sorted(sums)
    cents = {lv: sums[lv] / ns[lv] for lv in labels}
    rows = []
    for i, la in enumerate(labels):
        for lb in labels[i + 1:]:
            va, vb = cents[la], cents[lb]
            denom = float(np.linalg.norm(va) * np.linalg.norm(vb))
            rows.append((la, lb, float(va @ vb) / denom if denom else float("nan")))
    return pd.DataFrame(rows, columns=["label_a", "label_b", "cosine"])
