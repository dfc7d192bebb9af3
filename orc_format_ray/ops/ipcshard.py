"""Arrow IPC (stream-format) shard interchange over Ray Data — the
zero-parse leg of the interchange matrix (WebDataset tar for multimodal,
JSONL for LLM corpora, CSV for the warehouse boundary, .bin/.idx for
Megatron loaders; IPC for full-fidelity Arrow hand-off between engines).

Unlike the text formats, IPC keeps the exact Arrow schema — nested lists,
timestamps, large binary — with no per-row serialization at all: each part
is one `pyarrow.ipc` stream whose record batch is a zero-copy slice of the
pinned block. Same deterministic shard plan as ops/jsonl.py
(`_shardwrite.py`): the block layout pins once, global row offsets come
from block METADATA (two executed passes can never be order-aligned — Ray
output order is completion order), one explicit Ray task per block writes
the part files its offset range covers, writes are atomic tmp+rename, and
part names shard-S.part-G.arrow (G = global first-row index) make re-runs
byte-identical for the same block layout and let resume skip by name.
"""

from __future__ import annotations

import pyarrow as pa

from .._rayutil import remote_args


def write_ipc_shards(ds, path: str, key_col: str, columns: list[str] | None = None,
                     rows_per_shard: int = 100_000, compress: bool = False):
    """Write ``ds`` as Arrow IPC stream shards under ``path``.

    ``columns`` selects (and orders) the serialized columns; None keeps the
    full schema. ``key_col`` values should be unique across the dataset
    (an in-block duplicate is rejected loudly). ``compress=True`` enables
    zstd buffer compression inside the IPC frames (still deterministic).
    Returns the shard-part manifest ``(path, n_rows)`` as a pandas
    DataFrame. Plan: see the module docstring — payloads never shuffle,
    one write task per pinned block."""
    import os

    import ray

    from ._shardwrite import block_offsets, shard_spans

    os.makedirs(path, exist_ok=True)
    mat = ds.materialize()
    refs, counts, offsets = block_offsets(mat)

    @ray.remote(**remote_args())
    def write_block(block, start: int):
        from ray.data.block import BlockAccessor

        # IpcWriteOptions is not picklable — build it inside the task
        opts = pa.ipc.IpcWriteOptions(compression="zstd") if compress else None

        batch = BlockAccessor.for_block(block).to_arrow().combine_chunks()
        if columns is not None:
            batch = batch.select(columns)
        keys = batch[key_col].to_pylist()
        if len(set(keys)) != len(keys):
            raise ValueError("write_ipc_shards: duplicate keys within a block")
        out = []
        for g, lo, hi, shard in shard_spans(start, batch.num_rows, rows_per_shard):
            fname = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}.arrow")
            tmp = fname + f".tmp.{os.getpid()}"
            sink = pa.BufferOutputStream()
            with pa.ipc.new_stream(sink, batch.schema, options=opts) as w:
                w.write_table(batch.slice(lo, hi - lo))
            with open(tmp, "wb") as f:
                f.write(sink.getvalue().to_pybytes())
            os.replace(tmp, fname)
            out.append((fname, hi - lo))
        return out

    import pandas as pd

    parts = ray.get([
        write_block.remote(ref, int(offsets[i]))
        for i, ref in enumerate(refs) if counts[i]
    ])
    manifest = pd.DataFrame(
        [(p, n) for chunk in parts for p, n in chunk], columns=["path", "n_rows"]
    )
    return manifest.sort_values("path").reset_index(drop=True)


def read_ipc_shards(path: str, columns: list[str] | None = None):
    """Read IPC shards back as a streaming Dataset: one task per part file
    (filename order == global row order). The FILE is the schema authority
    (full Arrow fidelity — no dtype whitelist); ``columns`` projects after
    decode (IPC streams are not column-seekable — write separate column
    groups if projection must skip IO)."""
    import glob
    import os

    import ray.data

    files = sorted(glob.glob(os.path.join(path, "*.arrow")))
    if not files:
        raise FileNotFoundError(f"no .arrow shards under {path}")

    def load(batch: pa.Table):
        for p in batch["p"].to_pylist():
            with pa.memory_map(p, "r") as src:
                tbl = pa.ipc.open_stream(src).read_all()
            yield tbl.select(columns) if columns is not None else tbl

    src = ray.data.from_arrow(pa.table({"p": pa.array(files, pa.string())}))
    return src.repartition(len(files)).map_batches(load, batch_format="pyarrow", **remote_args())
