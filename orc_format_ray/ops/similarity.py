"""Similarity search over an embedding column (list<float>).

* `brute_force_topk` — exact cosine top-k: the query matrix is broadcast once
  (`ray.put`), each batch does one numpy matmul and emits only its local
  top-k rows; a distributed groupby(query_id) k-merge folds the partials
  (the driver only collects the k x nq final rows). No corpus shuffle.
* `IVFIndex` / `ivf_topk` — the scale path: coarse centroids trained on a
  sample (driver-side k-means, a few Lloyd iterations), every batch assigns
  its vectors to nearest centroids, search probes only the closest nprobe
  buckets. Trades recall for a |probe|/|nlist| fraction of the work.
* `build_ivf_index` / `ivf_topk_indexed` — the index materialized: shard
  files per (bucket, input block), no shuffle, per-task memory bounded by
  block size even under centroid skew; queries read only probed buckets.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import pool_size, remote_args


def _embedding_matrix(batch: pa.Table, col: str = "embedding", dtype=np.float64) -> np.ndarray:
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(dtype)
    offs = np.asarray(arr.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(len(arr), dim)


def _unit(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


class BruteForceScorer:
    """Actor-pool stage: per batch, cosine vs the broadcast query matrix."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = _unit(np.asarray(q, dtype=np.float64))  # (nq, dim), fetched once per actor
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = _unit(_embedding_matrix(batch))
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        sims = emb @ self.q.T  # (n, nq)
        k = min(self.k, len(ids))
        out_q, out_id, out_s = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            top = np.argpartition(-s, k - 1)[:k] if k < len(s) else np.arange(len(s))
            out_q.append(np.full(len(top), qi, dtype=np.int32))
            out_id.append(ids[top])
            out_s.append(s[top].astype(np.float64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int32()),
                "vec_id": pa.array(np.concatenate(out_id)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )


def _fold_topk(partials_ds, k: int) -> pa.Table:
    """Distributed final fold of per-block top-k partials: a groupby on
    query_id k-merges each query's candidates in a worker (the partial set
    is k x nq x n_blocks rows — at 10^6 blocks a driver-side concat+sort
    would be a 10^7-row pandas job; each group here is only k x n_blocks).
    The driver collects just the k x nq final rows.
    """
    import pandas as pd

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"], ascending=[False, True]).head(k)

    # partials are candidate-sized; materialize before the groupby so the
    # actor-pool producer and the shuffle never contend for the same CPU
    # slots (CLAUDE.md: actor-pool -> groupby DAGs deadlock on small clusters)
    folded = partials_ds.materialize().groupby("query_id").map_groups(merge, batch_format="pandas", **remote_args())
    parts = list(folded.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
    tbl = pa.concat_tables(parts) if parts else pa.table({"query_id": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
    df = tbl.to_pandas().sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)
    df["score"] = np.round(df["score"], 6)
    return pa.Table.from_pandas(df, preserve_index=False)


def brute_force_topk(ds, queries: np.ndarray, k: int = 10):
    """Exact cosine top-k per query. Returns a small pyarrow Table."""
    import ray

    qref = ray.put(np.asarray(queries, dtype=np.float32))
    partials = ds.map_batches(
        BruteForceScorer,
        fn_constructor_kwargs={"queries_ref": qref, "k": k},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=pool_size(),
        **remote_args(),
    )
    return _fold_topk(partials, k)


class IVFIndex:
    """Coarse IVF centroids trained driver-side on a sample."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _unit(centroids.astype(np.float32))

    @staticmethod
    def train(ds, nlist: int = 16, sample_rows: int = 4096, iters: int = 5, seed: int = 3) -> "IVFIndex":
        sample = ds.random_sample(1.0, seed=seed).limit(sample_rows)
        tbl = pa.concat_tables(list(sample.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
        x = _unit(_embedding_matrix(tbl))
        rng = np.random.default_rng(seed)
        cent = x[rng.choice(len(x), min(nlist, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cent.T, axis=1)
            for c in range(len(cent)):
                m = assign == c
                if m.any():
                    v = x[m].mean(axis=0)
                    cent[c] = v / max(np.linalg.norm(v), 1e-12)
        return IVFIndex(cent)

    @staticmethod
    def train_distributed(ds, nlist: int = 16, iters: int = 5, id_col: str = "vec_id") -> "IVFIndex":
        """FULL-corpus spherical k-means (``ops.cluster.kmeans`` with
        ``normalize=True``): each Lloyd round is one streaming map_batches
        pass emitting nlist tiny partial rows per block — no sample cap,
        no driver-side vector collection. Prefer this over ``train`` when
        the corpus is too large for a 4096-row sample to represent its
        cluster structure; the deterministic min-ids init also makes
        rebuilt indexes reproducible."""
        from .cluster import kmeans

        model = kmeans(ds, nlist, id_col=id_col, iters=iters, normalize=True)
        return IVFIndex(model.centroids.astype(np.float32))


def _make_shard_writer(cent_ref, out_dir: str, cb_ref=None):
    """Shared assign-and-write stage for IVF index builds AND incremental
    adds: each input block assigns its vectors to the (broadcast) centroids
    and writes one content-hashed shard file per (bucket, block) — raw rows,
    or PQ codes when ``cb_ref`` carries a codebook. Returns lineage rows."""

    class AssignWrite:
        def __init__(self):
            import ray

            self.cent = ray.get(cent_ref)
            self.cb = ray.get(cb_ref) if cb_ref is not None else None

        def __call__(self, batch: pa.Table) -> pa.Table:
            import hashlib
            import os

            import pyarrow.parquet as pq

            emb = _unit(_embedding_matrix(batch, dtype=np.float32))
            assign = np.argmax(emb @ self.cent.T, axis=1).astype(np.int32)
            rows_b, rows_n, rows_p = [], [], []
            for b in np.unique(assign):
                mask = assign == b
                sub = batch.filter(pa.array(mask)).sort_by("vec_id")
                ids = sub["vec_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
                if self.cb is None:
                    tbl = sub
                else:
                    m = self.cb.m
                    order = np.argsort(batch["vec_id"].to_numpy(zero_copy_only=False)[mask], kind="stable")
                    codes = self.cb.encode(emb[mask][order])
                    buf = codes.tobytes()
                    tbl = pa.table(
                        {
                            "vec_id": pa.array(ids, pa.int64()),
                            "code": pa.array([buf[i * m : (i + 1) * m] for i in range(len(codes))], pa.binary()),
                        }
                    )
                # content-hashed shard name: re-runs overwrite identically
                digest = hashlib.sha256(ids.tobytes()).hexdigest()[:16]
                path = os.path.join(out_dir, f"bucket-{int(b):05d}-{digest}.parquet")
                tmp = path + f".tmp.{os.getpid()}"
                pq.write_table(tbl, tmp)
                os.replace(tmp, path)
                rows_b.append(int(b))
                rows_n.append(tbl.num_rows)
                rows_p.append(path)
            return pa.table({"bucket": pa.array(rows_b, pa.int32()), "rows": pa.array(rows_n, pa.int64()), "path": pa.array(rows_p)})

    return AssignWrite


def _write_bucket_manifest(out_dir: str, per_bucket: dict, shard_paths: dict, pq_m: int | None):
    from .. import manifest as mf

    payload = {
        "rows": sorted((int(b), int(n)) for b, n in per_bucket.items()),
        "shards": {str(b): sorted(ps) for b, ps in shard_paths.items()},
    }
    if pq_m is not None:
        payload["pq_m"] = pq_m
    mf.write_blob_atomic(
        __import__("os").path.join(out_dir, "_buckets.json"), __import__("json").dumps(payload).encode()
    )


def build_ivf_index(ds, index: IVFIndex, out_dir: str):
    """Materialize the IVF index: corpus bucket-partitioned by centroid.

    NO shuffle: each input block assigns its vectors to centroids and writes
    one SHARD file per (bucket, block) — ``bucket-{b:05d}-{hash}.parquet`` —
    so a hot centroid never materializes as a single task's DataFrame (the
    per-task footprint is bounded by the input block size, whatever the
    skew). Queries via `ivf_topk_indexed` read ONLY the probed buckets'
    shard files — bytes read scale with nprobe/nlist, not corpus size.
    """
    import glob as _glob
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    # a rebuild over changed data/blocking would otherwise leave stale
    # content-hashed shards that queries glob alongside the new ones
    for stale in _glob.glob(os.path.join(out_dir, "bucket-*.parquet")):
        os.remove(stale)
    cent_ref = ray.put(index.centroids)

    stage = _make_shard_writer(cent_ref, out_dir)
    lineage = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()).take_all()
    np.save(os.path.join(out_dir, "centroids.npy"), index.centroids)
    per_bucket: dict[int, int] = {}
    shard_paths: dict[int, list[str]] = {}
    for r in lineage:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["rows"]
        shard_paths.setdefault(int(r["bucket"]), []).append(os.path.basename(r["path"]))
    # the manifest is the source of truth for which shards belong to this
    # build (queries read it; the glob is only a legacy fallback)
    _write_bucket_manifest(out_dir, per_bucket, shard_paths, None)
    return {"buckets": len(per_bucket), "rows": int(sum(per_bucket.values())), "shards": len(lineage)}


def add_to_ivf_index(ds, index_dir: str):
    """Incrementally add vectors to an EXISTING IVF or IVF+PQ index — the
    growing-corpus path: no rebuild, no re-train. New vectors are assigned
    by the index's STORED coarse centroids (and encoded with its stored PQ
    codebook when present), written as new content-hashed shard files per
    (bucket, block), and the ``_buckets.json`` manifest is extended
    atomically (set-union of shard names; row counts grow only by shards
    not already listed, so re-running the same add is idempotent).

    The coarse quantizer is FROZEN: recall for the added vectors matches
    what a fresh build over the union would give as long as the new data's
    distribution resembles the training sample — re-train + rebuild when it
    drifts. Duplicate vec_ids against the existing index are the caller's
    concern (compose ``exact_dedup_against`` upstream)."""
    import json
    import os

    import ray

    mfp = os.path.join(index_dir, "_buckets.json")
    if not os.path.exists(mfp):
        raise FileNotFoundError(f"no index manifest at {mfp} — build_ivf_index/build_ivf_pq_index first")
    manifest = json.loads(open(mfp, "rb").read())
    cent = np.load(os.path.join(index_dir, "centroids.npy"))
    pq_path = os.path.join(index_dir, "pq_centroids.npy")
    cb = PQCodebook(np.load(pq_path)) if os.path.exists(pq_path) else None
    pq_m = manifest.get("pq_m")
    if (cb is None) != (pq_m is None):
        raise ValueError(f"index at {index_dir} is inconsistent: pq_m={pq_m} but pq_centroids.npy {'missing' if cb is None else 'present'}")

    stage = _make_shard_writer(ray.put(cent), index_dir, ray.put(cb) if cb is not None else None)
    lineage = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()).take_all()

    per_bucket = {int(b): int(n) for b, n in manifest["rows"]}
    shard_paths = {int(b): set(ps) for b, ps in manifest["shards"].items()}
    added = 0
    for r in lineage:
        b, name = int(r["bucket"]), os.path.basename(r["path"])
        known = shard_paths.setdefault(b, set())
        if name in known:  # same content re-added: shard overwritten in place
            continue
        known.add(name)
        per_bucket[b] = per_bucket.get(b, 0) + int(r["rows"])
        added += int(r["rows"])
    _write_bucket_manifest(index_dir, per_bucket, shard_paths, pq_m)
    return {"buckets": len(per_bucket), "rows": int(sum(per_bucket.values())), "added": added}


def _probed_bucket_paths(index_dir: str, q: np.ndarray, nprobe: int) -> tuple[list[str], int]:
    """Shard files of the nprobe closest buckets per query (manifest-exact,
    glob fallback for legacy indexes) and their total on-disk bytes."""
    import glob
    import os

    cent = _unit(np.load(os.path.join(index_dir, "centroids.npy")).astype(np.float32))
    probe = np.argsort(-(q @ cent.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    want = sorted(set(int(b) for b in probe.reshape(-1)))
    shard_map = None
    bj = os.path.join(index_dir, "_buckets.json")
    if os.path.exists(bj):
        import json as _json

        man = _json.loads(open(bj).read())
        if isinstance(man, dict) and "shards" in man:
            shard_map = man["shards"]
    paths: list[str] = []
    for b in want:
        if shard_map is not None:  # manifest names this build's shards exactly
            paths.extend(os.path.join(index_dir, nm) for nm in shard_map.get(str(b), []))
        else:  # legacy index without a shard manifest: glob (the [.-] class
            # also accepts pre-shard single-file indexes)
            paths.extend(sorted(glob.glob(os.path.join(index_dir, f"bucket-{b:05d}[.-]*parquet"))))
    paths = [p for p in paths if os.path.exists(p)]
    return paths, sum(os.path.getsize(p) for p in paths)


_EMPTY_TOPK = {"query_id": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())}


def ivf_topk_indexed(index_dir: str, queries: np.ndarray, k: int = 10, nprobe: int = 4):
    """ANN top-k over a built IVF index: reads ONLY the probed bucket files.

    Returns (result Table, bytes_read) so callers/tests can assert the
    nprobe/nlist read-scaling property."""
    import ray.data

    q = _unit(np.asarray(queries, dtype=np.float32))
    paths, bytes_read = _probed_bucket_paths(index_dir, q, nprobe)
    if not paths:
        return pa.table(_EMPTY_TOPK), 0
    import ray

    q_ref = ray.put(q)

    class Scorer:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _unit(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            sims = emb @ self.q.T.astype(np.float64)
            kk = min(k, len(ids))
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                s = sims[:, qi]
                top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
                out_q.append(np.full(len(top), qi, dtype=np.int32))
                out_id.append(ids[top])
                out_s.append(s[top].astype(np.float64))
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int32()),
                    "vec_id": pa.array(np.concatenate(out_id)),
                    "score": pa.array(np.concatenate(out_s)),
                }
            )

    ds = ray.data.read_parquet(paths, columns=["vec_id", "embedding"])
    partials = ds.map_batches(Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args())
    return _fold_topk(partials, k), bytes_read


def ivf_topk(ds, index: IVFIndex, queries: np.ndarray, k: int = 10, nprobe: int = 4):
    """ANN top-k probing only the nprobe closest centroid buckets per query."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    probe = np.argsort(-(q @ index.centroids.T), axis=1)[:, :nprobe]  # (nq, nprobe)
    cent_ref = ray.put(index.centroids)
    q_ref = ray.put(q)
    probe_ref = ray.put(probe)

    class Scorer:
        def __init__(self):
            self.cent = ray.get(cent_ref)
            self.q = ray.get(q_ref)
            self.probe = ray.get(probe_ref)
            self.k = k

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = _unit(_embedding_matrix(batch))
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            assign = np.argmax(emb @ self.cent.T, axis=1)
            out_q, out_id, out_s = [], [], []
            for qi in range(self.q.shape[0]):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                s = emb[m] @ self.q[qi]
                kk = min(self.k, len(s))
                top = np.argpartition(-s, kk - 1)[:kk] if kk < len(s) else np.arange(len(s))
                out_q.append(np.full(len(top), qi, dtype=np.int32))
                out_id.append(ids[m][top])
                out_s.append(s[top].astype(np.float64))
            if not out_q:
                return pa.table({"query_id": pa.array([], pa.int32()), "vec_id": pa.array([], pa.int64()), "score": pa.array([], pa.float64())})
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int32()),
                    "vec_id": pa.array(np.concatenate(out_id)),
                    "score": pa.array(np.concatenate(out_s)),
                }
            )

    partials = ds.map_batches(Scorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args())
    return _fold_topk(partials, k)


# --------------------------------------------------- product quantization


class PQCodebook:
    """Product-quantization codebooks: ``m`` subspaces x ``2^nbits``
    centroids each, trained per subspace by k-means on a driver-side sample
    (the same sampling contract as ``IVFIndex.train``).

    PQ is vector COMPRESSION — ``m`` bytes per vector instead of
    ``4 * dim`` — which makes it this engine's codec family applied to
    embeddings. Search is asymmetric (ADC): queries stay exact float,
    database vectors are scored by summing per-subspace lookup tables, and
    the standard production pattern re-ranks the ADC top candidates with
    exact vectors (see ``pq_topk(..., exact_rerank_ds=...)``).
    """

    def __init__(self, centroids: np.ndarray):
        c = np.asarray(centroids, dtype=np.float32)
        if c.ndim != 3:
            raise ValueError(f"centroids must be (m, K, dsub), got {c.shape}")
        if c.shape[1] > 256:
            raise ValueError(f"K={c.shape[1]} centroids do not fit uint8 codes (nbits <= 8)")
        self.centroids = c
        self.m, self.k, self.dsub = c.shape

    @staticmethod
    def train(ds, m: int = 8, nbits: int = 6, sample_rows: int = 4096, iters: int = 8, seed: int = 5) -> "PQCodebook":
        """Codes are uint8 (nbits <= 8). Training is deterministic whenever
        the corpus fits in ``sample_rows`` (rows are pinned by vec_id sort);
        above that, ``limit`` keeps whichever blocks arrive first — pass a
        deterministically pre-sampled ``ds`` if bit-stable retraining at
        scale matters."""
        if not 1 <= nbits <= 8:
            raise ValueError(f"nbits must be in [1, 8] for uint8 codes, got {nbits}")
        sample = ds.random_sample(1.0, seed=seed).limit(sample_rows)
        tbl = pa.concat_tables(list(sample.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
        if "vec_id" in tbl.schema.names:  # Ray block order varies run-to-run; pin it
            tbl = tbl.sort_by("vec_id")
        x = _unit(_embedding_matrix(tbl)).astype(np.float32)
        dim = x.shape[1]
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by m={m}")
        dsub, kk = dim // m, 1 << nbits
        rng = np.random.default_rng(seed)
        cents = np.empty((m, min(kk, len(x)), dsub), dtype=np.float32)
        for s in range(m):
            xs = x[:, s * dsub : (s + 1) * dsub]
            c = xs[rng.choice(len(xs), min(kk, len(xs)), replace=False)].copy()
            for _ in range(iters):
                d = ((xs[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d, axis=1)
                for j in range(len(c)):
                    mask = assign == j
                    if mask.any():
                        c[j] = xs[mask].mean(axis=0)
            cents[s] = c
        return PQCodebook(cents)

    def encode(self, x: np.ndarray) -> np.ndarray:
        """(n, dim) float -> (n, m) uint8 codes (nearest centroid per subspace)."""
        x = _unit(np.asarray(x, dtype=np.float32))
        codes = np.empty((len(x), self.m), dtype=np.uint8)
        for s in range(self.m):
            xs = x[:, s * self.dsub : (s + 1) * self.dsub]
            d = ((xs[:, None, :] - self.centroids[s][None, :, :]) ** 2).sum(axis=2)
            codes[:, s] = np.argmin(d, axis=1).astype(np.uint8)
        return codes

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """(n, m) codes -> (n, dim) reconstructed float32 vectors."""
        return np.concatenate([self.centroids[s][codes[:, s]] for s in range(self.m)], axis=1)


def pq_encode(ds, codebook: PQCodebook):
    """Compress an embedding Dataset to (vec_id, code: binary(m)) —
    ``m`` bytes/vector, a ``4*dim/m``x size reduction before zstd."""
    import ray

    cb_ref = ray.put(codebook)

    class Encoder:
        def __init__(self):
            self.cb = ray.get(cb_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            codes = self.cb.encode(_embedding_matrix(batch))
            buf = codes.tobytes()  # one serialization for the whole batch
            m = self.cb.m
            return pa.table(
                {
                    "vec_id": batch["vec_id"],
                    "code": pa.array([buf[i * m : (i + 1) * m] for i in range(len(codes))], pa.binary()),
                }
            )

    return ds.map_batches(
        Encoder, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()
    )


def pq_topk(codes_ds, codebook: PQCodebook, queries: np.ndarray, k: int = 10, exact_rerank_ds=None, rerank_depth: int = 32):
    """ADC top-k over PQ codes: each actor builds the (nq, m, K) lookup
    tables once in ``__init__``; scoring a batch is one np.take + sum per
    subspace. With ``exact_rerank_ds`` (the original embeddings), the ADC
    top ``rerank_depth`` candidates per query are re-scored with exact
    cosine — the standard PQ + re-rank pattern. Returns the same
    (query_id, vec_id, score) table as ``brute_force_topk``."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    cb_ref = ray.put(codebook)
    q_ref = ray.put(q)
    depth = max(k, rerank_depth) if exact_rerank_ds is not None else k

    class ADCScorer:
        def __init__(self):
            cb = ray.get(cb_ref)
            qq = ray.get(q_ref)
            self.m, self.dsub = cb.m, cb.dsub
            # tables[s]: (nq, K) = q_sub @ centroids[s].T
            self.tables = [qq[:, s * cb.dsub : (s + 1) * cb.dsub] @ cb.centroids[s].T for s in range(cb.m)]
            self.nq = len(qq)

        def __call__(self, batch: pa.Table) -> pa.Table:
            raw = np.frombuffer(b"".join(batch["code"].to_pylist()), dtype=np.uint8).reshape(-1, self.m)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            scores = np.zeros((self.nq, len(raw)), dtype=np.float32)
            for s in range(self.m):
                scores += self.tables[s][:, raw[:, s]]
            kk = min(depth, len(raw))
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
            rows_q = np.repeat(np.arange(self.nq, dtype=np.int32), kk)
            cand = top.ravel()
            return pa.table(
                {
                    "query_id": pa.array(rows_q, pa.int32()),
                    "vec_id": pa.array(ids[cand], pa.int64()),
                    "score": pa.array(scores[rows_q, cand].astype(np.float64), pa.float64()),
                }
            )

    partials = codes_ds.map_batches(
        ADCScorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()
    )
    adc = _fold_topk(partials, depth)
    if exact_rerank_ds is None:
        return adc  # depth == k here, already k sorted rows per query
    return _exact_rerank(adc, queries, exact_rerank_ds, k)


def _exact_rerank(adc: pa.Table, queries: np.ndarray, exact_rerank_ds, k: int) -> pa.Table:
    """Shared exact re-rank tail (PQ / SQ8): fetch ONLY the approximate
    top candidates (broadcast id set), score with float64 cosine, keep
    top-k per query — the standard compress-then-rerank pattern."""
    import ray

    cand_ids = set(adc["vec_id"].to_pylist())
    ids_ref = ray.put(np.array(sorted(cand_ids), dtype=np.int64))

    def fetch(batch: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, wanted)
        return batch.filter(pa.array(keep))

    vec_tbl = pa.concat_tables(
        list(
            exact_rerank_ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
            .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        )
    )
    vecs = _unit(_embedding_matrix(vec_tbl))
    vid = vec_tbl["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    pos = {int(v): i for i, v in enumerate(vid)}
    missing = cand_ids - pos.keys()
    if missing:
        raise ValueError(
            f"exact_rerank_ds is missing {len(missing)} ADC candidate vec_ids (e.g. {sorted(missing)[:3]}): "
            "it must cover every encoded vector"
        )
    df = adc.to_pandas()
    exact = np.einsum(
        "ij,ij->i", _unit(np.asarray(queries, dtype=np.float64))[df["query_id"].to_numpy()], vecs[[pos[int(v)] for v in df["vec_id"]]]
    )
    # sort on FULL precision (the _fold_topk rule), round only for output
    df["_exact"] = exact
    df = df.sort_values(["query_id", "_exact", "vec_id"], ascending=[True, False, True])
    df = df.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
    df["score"] = np.round(df.pop("_exact"), 6)
    return pa.Table.from_pandas(df, preserve_index=False)


# -------------------------------------------------------------- IVF + PQ


def build_ivf_pq_index(ds, index: IVFIndex, codebook: PQCodebook, out_dir: str):
    """Composed IVF+PQ index — the billion-vector production shape: corpus
    bucket-partitioned by coarse centroid (same no-shuffle sharding as
    ``build_ivf_index``) but each shard stores PQ CODES (vec_id, code:
    binary(m)) — ``m`` bytes/vector instead of ``4*dim`` — so the whole
    index is ~32x smaller on disk and a probe reads ~32x fewer bytes.
    Queries via ``ivf_pq_topk`` ADC-score only the probed buckets and
    optionally exact-re-rank from the raw embeddings."""
    import glob as _glob
    import os

    import ray

    os.makedirs(out_dir, exist_ok=True)
    for stale in _glob.glob(os.path.join(out_dir, "bucket-*.parquet")):
        os.remove(stale)

    stage = _make_shard_writer(ray.put(index.centroids), out_dir, ray.put(codebook))
    lineage = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()).take_all()
    np.save(os.path.join(out_dir, "centroids.npy"), index.centroids)
    np.save(os.path.join(out_dir, "pq_centroids.npy"), codebook.centroids)
    per_bucket: dict[int, int] = {}
    shard_paths: dict[int, list[str]] = {}
    for r in lineage:
        per_bucket[r["bucket"]] = per_bucket.get(r["bucket"], 0) + r["rows"]
        shard_paths.setdefault(int(r["bucket"]), []).append(os.path.basename(r["path"]))
    _write_bucket_manifest(out_dir, per_bucket, shard_paths, codebook.m)
    return {"buckets": len(per_bucket), "rows": int(sum(per_bucket.values())), "shards": len(lineage)}


def ivf_pq_topk(index_dir: str, queries: np.ndarray, k: int = 10, nprobe: int = 4,
                exact_rerank_ds=None, rerank_depth: int = 32):
    """ANN top-k over an IVF+PQ index: probe the nprobe closest buckets,
    ADC-score ONLY their code shards (bytes read scale with nprobe/nlist AND
    are ~32x smaller than raw-embedding shards), optionally exact-re-rank
    the ADC top ``rerank_depth`` candidates from ``exact_rerank_ds``.
    Returns (result Table, bytes_read). With nprobe = nlist and full-depth
    re-rank this equals brute force exactly — the oracle equivalence."""
    import os

    import ray.data

    q = _unit(np.asarray(queries, dtype=np.float32))
    paths, bytes_read = _probed_bucket_paths(index_dir, q, nprobe)
    if not paths:
        return pa.table(_EMPTY_TOPK), 0
    codebook = PQCodebook(np.load(os.path.join(index_dir, "pq_centroids.npy")))
    codes_ds = ray.data.read_parquet(paths, columns=["vec_id", "code"])
    out = pq_topk(codes_ds, codebook, queries, k=k, exact_rerank_ds=exact_rerank_ds, rerank_depth=rerank_depth)
    return out, bytes_read


def ann_recall_report(
    ds,
    queries: np.ndarray,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    index_dir: str | None = None,
):
    """Retrieval-quality audit: recall@k of the IVF index path vs the exact
    brute-force cosine top-k over the SAME queries — the standard acceptance
    gate before pointing a retrieval pipeline at an approximate index.

    Both sides are the existing distributed paths (BruteForceScorer actor
    pool; bucket-pruned `ivf_topk_indexed` reads only nprobe buckets); the
    comparison itself runs driver-side over the two k x nq result tables
    (tiny by construction). Recall counts ID-set overlap |exact ∩ ivf| /
    |exact| per query — sets, not ranks, because score ties at the k
    boundary can legitimately order differently on the two sides.
    ``nprobe >= nlist`` probes every bucket, so recall must be exactly 1.0
    (pinned in pytest).

    Returns a pandas DataFrame (query_id, n_exact, n_hit, recall) with a
    final macro row ``query_id = -1`` (summed counts, mean recall). When
    ``index_dir`` is None a scratch index is built and removed.
    """
    import shutil
    import tempfile

    import pandas as pd

    own_dir = index_dir is None
    if own_dir:
        index_dir = tempfile.mkdtemp(prefix="ivf_recall_")
    try:
        index = IVFIndex.train(ds, nlist=nlist)
        build_ivf_index(ds, index, index_dir)
        exact = brute_force_topk(ds, queries, k).to_pandas()
        approx_tbl, _ = ivf_topk_indexed(index_dir, queries, k=k, nprobe=nprobe)
        adf = approx_tbl.to_pandas()
    finally:
        if own_dir:
            shutil.rmtree(index_dir, ignore_errors=True)

    rows = []
    for qi in range(np.asarray(queries).shape[0]):
        es = set(exact.loc[exact["query_id"] == qi, "vec_id"].tolist())
        av = set(adf.loc[adf["query_id"] == qi, "vec_id"].tolist())
        hit = len(es & av)
        rows.append((qi, len(es), hit, round(hit / max(1, len(es)), 6)))
    df = pd.DataFrame(rows, columns=["query_id", "n_exact", "n_hit", "recall"])
    macro = round(float(df["recall"].mean()), 6) if len(df) else 0.0
    df.loc[len(df)] = (-1, int(df["n_exact"].sum()), int(df["n_hit"].sum()), macro)
    for c in ("query_id", "n_exact", "n_hit"):
        df[c] = df[c].astype("int64")
    df["recall"] = df["recall"].astype("float64")
    return df


# ------------------------------------------------------------------- SQ8


class SQ8Params:
    """Per-dimension uint8 scalar quantization of UNIT-normalized
    embeddings: 4x smaller than float32 (before zstd) with a far simpler
    codec than PQ — the first rung of the embedding-compression ladder
    (SQ8 -> PQ -> IVF+PQ). ``lo``/``hi`` are exact per-dimension bounds;
    codes are ``round((x - lo) / span * 255)``.

    Train is ONE streaming pass of per-block min/max partials folded by
    elementwise min/max on the driver — commutative, so the params are
    layout- and cluster-size-invariant."""

    def __init__(self, lo: np.ndarray, hi: np.ndarray):
        self.lo = np.asarray(lo, dtype=np.float32)
        hi = np.asarray(hi, dtype=np.float32)
        if self.lo.shape != hi.shape or self.lo.ndim != 1:
            raise ValueError("SQ8Params: lo/hi must be matching 1-D arrays")
        span = hi - self.lo
        span[span == 0] = 1.0  # constant dims decode exactly to lo
        self.span = span
        self.dim = len(self.lo)

    @staticmethod
    def train(ds, col: str = "embedding") -> "SQ8Params":
        def bounds(batch: pa.Table) -> pa.Table:
            x = _unit(_embedding_matrix(batch, col))
            return pa.table({
                "lo": pa.array([x.min(axis=0)], pa.list_(pa.float32())),
                "hi": pa.array([x.max(axis=0)], pa.list_(pa.float32())),
            })

        rows = ds.map_batches(bounds, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
        if not rows:
            raise ValueError("SQ8Params.train: empty dataset")
        lo = np.min([np.asarray(r["lo"], np.float32) for r in rows], axis=0)
        hi = np.max([np.asarray(r["hi"], np.float32) for r in rows], axis=0)
        return SQ8Params(lo, hi)

    def encode(self, x: np.ndarray) -> np.ndarray:
        x = _unit(np.asarray(x, dtype=np.float32))
        q = np.rint((x - self.lo[None, :]) / self.span[None, :] * 255.0)
        return np.clip(q, 0, 255).astype(np.uint8)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        return self.lo[None, :] + codes.astype(np.float32) * (self.span[None, :] / np.float32(255.0))


def sq8_encode(ds, params: SQ8Params):
    """Compress an embedding Dataset to (vec_id, code: binary(dim)) —
    1 byte/dimension. Exact duplicates quantize to IDENTICAL codes."""
    import ray

    p_ref = ray.put(params)

    class Encoder:
        def __init__(self):
            self.p = ray.get(p_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            codes = self.p.encode(_embedding_matrix(batch))
            buf = codes.tobytes()
            d = self.p.dim
            return pa.table({
                "vec_id": batch["vec_id"],
                "code": pa.array([buf[i * d : (i + 1) * d] for i in range(len(codes))], pa.binary()),
            })

    return ds.map_batches(
        Encoder, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()
    )


def sq8_topk(codes_ds, params: SQ8Params, queries: np.ndarray, k: int = 10,
             exact_rerank_ds=None, rerank_depth: int = 32):
    """Asymmetric top-k over SQ8 codes: queries stay exact float, database
    vectors decode per batch (one broadcast multiply-add) and score by
    matmul; per-block partials k-merge through `_fold_topk`. With
    ``exact_rerank_ds``, the approximate top ``rerank_depth`` re-score with
    exact float64 cosine (`_exact_rerank` — the PQ pattern). Returns the
    same (query_id, vec_id, score) table as ``brute_force_topk``."""
    import ray

    q = _unit(np.asarray(queries, dtype=np.float32))
    p_ref = ray.put(params)
    q_ref = ray.put(q)
    depth = max(k, rerank_depth) if exact_rerank_ds is not None else k

    class SQScorer:
        def __init__(self):
            self.p = ray.get(p_ref)
            self.q = ray.get(q_ref)
            self.nq = len(self.q)

        def __call__(self, batch: pa.Table) -> pa.Table:
            d = self.p.dim
            raw = np.frombuffer(b"".join(batch["code"].to_pylist()), dtype=np.uint8).reshape(-1, d)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            recon = self.p.decode(raw)
            scores = (self.q @ recon.T).astype(np.float32)  # (nq, n)
            kk = min(depth, len(raw))
            top = np.argpartition(-scores, kk - 1, axis=1)[:, :kk] if kk < len(raw) \
                else np.tile(np.arange(len(raw)), (self.nq, 1))
            rows_q = np.repeat(np.arange(self.nq, dtype=np.int32), top.shape[1])
            cand = top.ravel()
            return pa.table({
                "query_id": pa.array(rows_q, pa.int32()),
                "vec_id": pa.array(ids[cand], pa.int64()),
                "score": pa.array(scores[rows_q, cand].astype(np.float64), pa.float64()),
            })

    partials = codes_ds.map_batches(
        SQScorer, batch_format="pyarrow", zero_copy_batch=True, concurrency=pool_size(), **remote_args()
    )
    approx = _fold_topk(partials, depth)
    if exact_rerank_ds is None:
        return approx
    return _exact_rerank(approx, queries, exact_rerank_ds, k)


def nearest_neighbor_exact(ds, id_col: str = "vec_id", vec_col: str = "embedding",
                           scale: int = 1 << 20, max_broadcast_vectors: int = 1 << 18):
    """EXACT nearest neighbor for EVERY vector by integer-quantized dot
    product — the SQL-checkable member of the similarity family (the
    float ANN ops are planted/rows-only because no float dot-product fold
    matches any deterministic SQL evaluation; measured ~1e-7 drift).

    Quantization ``q = floor(float64(x) * scale + 0.5)`` makes the dot an
    exact int64 (|q| and dims guarded so |dot| < 2^53 — DuckDB's
    list_dot_product over BIGINT lists evaluates in doubles, exact below
    that). Ties break to the SMALLEST neighbor id (rows pre-sorted by id;
    np.argmax takes the first maximum == row_number ORDER BY dot DESC,
    id). Self-matches excluded.

    Plan: the quantized matrix broadcasts ONCE via ray.put (guarded by
    ``max_broadcast_vectors`` — beyond that, route through the IVF bucket
    path and verify candidates exactly); each batch computes one int64
    matmul block against it. Returns a Dataset of
    ``(id_col, nn_id, dot)``.
    """
    import numpy as np
    import ray

    def quantize(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = np.stack(batch[vec_col].to_pylist()).astype(np.float64)
        q = np.floor(m * np.float64(scale) + np.float64(0.5)).astype(np.int64)
        return pa.table(
            {
                "id": pa.array(ids, pa.int64()),
                "q": pa.array(list(q), pa.list_(pa.int64())),
            }
        )

    qdf = (
        ds.map_batches(quantize, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    n = len(qdf)
    if n > max_broadcast_vectors:
        raise ValueError(
            f"{n} vectors exceed max_broadcast_vectors={max_broadcast_vectors}; "
            "use the IVF bucket path with exact candidate verification"
        )
    if n < 2:
        raise ValueError("nearest_neighbor_exact needs at least 2 vectors")
    ids = qdf["id"].to_numpy(dtype=np.int64)
    if (np.diff(ids) == 0).any():
        raise ValueError(f"duplicate {id_col!r} values")
    Q = np.stack(qdf["q"].to_numpy())
    dims = Q.shape[1]
    if int(np.abs(Q).max()) ** 2 * dims >= 1 << 53:
        raise ValueError("quantized dot product may exceed 2^53 — lower `scale`")
    mat_ref = ray.put((ids, Q))

    def best(batch: pa.Table) -> pa.Table:
        import numpy as _np

        import ray as _ray

        all_ids, M = _ray.get(mat_ref)
        bids = batch["id"].to_numpy(zero_copy_only=False)
        B = _np.stack(batch["q"].to_pylist()).astype(_np.int64)
        dots = M @ B.T  # (n, batch) exact int64
        self_pos = _np.searchsorted(all_ids, bids)
        dots[self_pos, _np.arange(len(bids))] = _np.iinfo(_np.int64).min
        arg = _np.argmax(dots, axis=0)  # first max == smallest id on ties
        return pa.table(
            {
                id_col: pa.array(bids, pa.int64()),
                "nn_id": pa.array(all_ids[arg], pa.int64()),
                "dot": pa.array(dots[arg, _np.arange(len(bids))], pa.int64()),
            }
        )

    import ray.data

    qds = ray.data.from_pandas(qdf)
    return qds.map_batches(best, batch_format="pyarrow", **remote_args())
