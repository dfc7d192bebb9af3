"""WebDataset-style tar shard interchange over Ray Data.

The de-facto training-loader format: samples are files inside plain .tar
shards ("{key}.{ext}" members; all members sharing a key form one sample),
consumed sequentially by loaders. This module writes a Dataset into
size-budgeted tar shards (one write task per block — no payload shuffle:
shards are cut along the pinned block order) and reads them back as a
streaming Dataset (one read task per shard).

Scale shape: shard assignment is metadata-only — a per-block count pass
plus broadcast prefix offsets (the `pack.py` two-phase plan without the
payload shuffle). Writes are atomic (tmp + rename) and deterministically
named (shard-S.part-G.tar where G is the global first-sample index), so
re-runs are idempotent and readers recover global order from filenames
alone. Tar members are stored uncompressed (the WebDataset norm; compress
payload columns upstream if needed) with mtime 0 — byte-deterministic
output for a given input layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args


def write_webdataset(ds, path: str, key_col: str, columns: dict[str, str],
                     samples_per_shard: int = 10_000):
    """Write ``ds`` as WebDataset tar shards under ``path``.

    ``columns`` maps column name -> member extension (e.g. ``{"text":
    "txt", "meta": "json"}``); string/binary columns only. ``key_col``
    values become member basenames — they must be unique across the
    dataset (duplicate keys would silently merge samples at load time; a
    duplicate FIRST key between blocks or within a block is rejected
    loudly, which catches the common all-duplicates mistakes). Returns the
    shard-part manifest (path, n_samples) as a pandas DataFrame.

    Plan: materialize pins the block layout; a metadata-only count pass
    builds global row offsets; each block writes its own rows into the
    shard files its offset range covers (a shard spanning blocks becomes
    multiple part files, merged by filename order at read time). Rows
    never move between blocks.
    """
    import os

    import ray

    if not columns:
        raise ValueError("write_webdataset: need at least one column -> extension mapping")
    os.makedirs(path, exist_ok=True)

    mat = ds.materialize()  # pin: count pass and write pass must see one layout
    sizes = mat.map_batches(
        lambda b: pa.table({"n": pa.array([b.num_rows], pa.int64())}),
        batch_format="pyarrow", batch_size=None, **remote_args(),
    ).to_pandas()["n"].to_numpy(dtype=np.int64)
    offsets = np.zeros(len(sizes) + 1, dtype=np.int64)
    np.cumsum(sizes, out=offsets[1:])

    first_keys = mat.map_batches(
        lambda b: pa.table({"first": pa.array(
            [str(b[key_col][0].as_py()) if b.num_rows else None])}),
        batch_size=None, batch_format="pyarrow", **remote_args(),
    ).to_pandas()["first"].tolist()
    first_to_off: dict[str, int] = {}
    for i, fk in enumerate(first_keys):
        if fk is None:
            continue
        if fk in first_to_off:
            raise ValueError("write_webdataset: two blocks share a first key — keys must be unique")
        first_to_off[fk] = int(offsets[i])
    f2o_ref = ray.put(first_to_off)

    def write_block(batch: pa.Table) -> pa.Table:
        import io
        import tarfile

        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_samples": pa.array([], pa.int64())})
        start = ray.get(f2o_ref)[str(batch[key_col][0].as_py())]
        keys = [str(k) for k in batch[key_col].to_pylist()]
        if len(set(keys)) != len(keys):
            raise ValueError("write_webdataset: duplicate keys within a block")
        cols = {c: batch[c].to_pylist() for c in columns}
        rows_done = 0
        out_paths, out_counts = [], []
        while rows_done < batch.num_rows:
            g = start + rows_done
            shard = g // samples_per_shard
            take = min(batch.num_rows - rows_done, (shard + 1) * samples_per_shard - g)
            fname = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}.tar")
            tmp = fname + f".tmp.{os.getpid()}"
            with tarfile.open(tmp, "w") as tf:
                for r in range(rows_done, rows_done + take):
                    for c, ext in columns.items():
                        v = cols[c][r]
                        data = v.encode() if isinstance(v, str) else bytes(v)
                        info = tarfile.TarInfo(name=f"{keys[r]}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # byte-deterministic shards
                        tf.addfile(info, io.BytesIO(data))
            os.replace(tmp, fname)
            out_paths.append(fname)
            out_counts.append(take)
            rows_done += take
        return pa.table({"path": pa.array(out_paths, pa.string()),
                         "n_samples": pa.array(out_counts, pa.int64())})

    manifest = mat.map_batches(
        write_block, batch_size=None, batch_format="pyarrow", **remote_args()
    ).to_pandas()
    return manifest.sort_values("path").reset_index(drop=True)


def read_webdataset(path: str, columns: dict[str, str]):
    """Read WebDataset tar shards back as a streaming Dataset: one task per
    tar part (filename order == global sample order), each yielding a
    batch of (key, *columns) with large_binary payloads. ``columns`` maps
    output column -> extension, the inverse of `write_webdataset`."""
    import glob
    import os

    import ray.data

    files = sorted(glob.glob(os.path.join(path, "*.tar")))
    if not files:
        raise FileNotFoundError(f"no .tar shards under {path}")

    def load(batch: pa.Table):
        import tarfile

        for p in batch["p"].to_pylist():
            samples: dict[str, dict[str, bytes]] = {}
            order: list[str] = []
            with tarfile.open(p, "r") as tf:
                for m in tf:
                    if not m.isfile():
                        continue
                    base, ext = m.name.rsplit(".", 1)
                    if base not in samples:
                        samples[base] = {}
                        order.append(base)
                    samples[base][ext] = tf.extractfile(m).read()
            cols = {"key": pa.array(order, pa.string())}
            for c, ext in columns.items():
                cols[c] = pa.array([samples[k].get(ext, b"") for k in order], pa.large_binary())
            yield pa.table(cols)

    src = ray.data.from_arrow(pa.table({"p": pa.array(files, pa.string())}))
    return src.repartition(len(files)).map_batches(load, batch_format="pyarrow", **remote_args())
