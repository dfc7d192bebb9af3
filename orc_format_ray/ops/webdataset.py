"""WebDataset-style tar shard interchange over Ray Data.

The de-facto training-loader format: samples are files inside plain .tar
shards ("{key}.{ext}" members; all members sharing a key form one sample),
consumed sequentially by loaders. This module writes a Dataset into
size-budgeted tar shards (one write task per block — no payload shuffle:
shards are cut along the pinned block order) and reads them back as a
streaming Dataset (one read task per shard).

Scale shape: shard assignment is metadata-only — global row offsets come
straight from the materialized dataset's block metadata (zero execution;
see `_shardwrite.py` for why it must NOT be a pair of map_batches passes:
Ray Data output order is completion order). Writes are atomic (tmp +
rename) and deterministically
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
    dataset (duplicate keys would silently merge samples at load time; an
    in-block duplicate is rejected loudly, which catches the common
    all-duplicates mistakes). Returns the shard-part manifest
    (path, n_samples) as a pandas DataFrame.

    Plan: materialize pins the block layout; global row offsets come from
    BLOCK METADATA (zero execution — see `_shardwrite.block_offsets` for
    why two map_batches passes cannot be order-aligned); one explicit Ray
    task per block writes that block's rows into the shard files its
    offset range covers (a shard spanning blocks becomes multiple part
    files, merged by filename order at read time). Rows never move
    between blocks; payloads stay in the object store.
    """
    import os

    import ray

    from ._shardwrite import block_offsets, shard_spans

    if not columns:
        raise ValueError("write_webdataset: need at least one column -> extension mapping")
    os.makedirs(path, exist_ok=True)

    mat = ds.materialize()  # pin the block layout the offsets describe
    refs, counts, offsets = block_offsets(mat)

    @ray.remote(**remote_args())
    def write_block(block, start: int):
        import io
        import tarfile

        from ray.data.block import BlockAccessor

        batch = BlockAccessor.for_block(block).to_arrow()
        keys = [str(k) for k in batch[key_col].to_pylist()]
        if len(set(keys)) != len(keys):
            raise ValueError("write_webdataset: duplicate keys within a block")
        cols = {c: batch[c].to_pylist() for c in columns}
        out = []
        for g, lo, hi, shard in shard_spans(start, batch.num_rows, samples_per_shard):
            fname = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}.tar")
            tmp = fname + f".tmp.{os.getpid()}"
            with tarfile.open(tmp, "w") as tf:
                for r in range(lo, hi):
                    for c, ext in columns.items():
                        v = cols[c][r]
                        data = v.encode() if isinstance(v, str) else bytes(v)
                        info = tarfile.TarInfo(name=f"{keys[r]}.{ext}")
                        info.size = len(data)
                        info.mtime = 0  # byte-deterministic shards
                        tf.addfile(info, io.BytesIO(data))
            os.replace(tmp, fname)
            out.append((fname, hi - lo))
        return out

    import pandas as pd

    parts = ray.get([
        write_block.remote(ref, int(offsets[i]))
        for i, ref in enumerate(refs) if counts[i]
    ])
    manifest = pd.DataFrame(
        [(p, n) for chunk in parts for p, n in chunk], columns=["path", "n_samples"]
    )
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
