"""Token .bin/.idx shard interchange — the fourth leg of the interchange
matrix (WebDataset tar for multimodal, JSONL for LLM corpora, CSV for the
warehouse boundary, .bin/.idx for trainer-facing token streams, the
Megatron-style layout: a flat little-endian int32 token file plus a
sidecar index).

Same deterministic shard plan as ops/csvshard.py (`_shardwrite.py`): the
block layout pins once, global row offsets come from block METADATA (two
executed passes can never be order-aligned — Ray output order is
completion order), one explicit Ray task per block writes the part files
its offset range covers, and part names shard-S.part-G.bin/.idx (G =
global first-row index) make re-runs byte-identical and resume
skip-by-name. Writes are atomic tmp+rename with the .idx renamed LAST —
the commit marker: a part exists iff its .idx does, so a killed run never
leaves a readable half-part.

Part layout:
  part.bin  = the part's docs' tokens, concatenated, little-endian int32.
  part.idx  = magic ``OFRTIDX1`` (8 bytes) | n_docs u64-LE
            | n_tok  i64-LE[n_docs]
            | id_len i32-LE[n_docs] | doc_id utf-8 bytes, concatenated.
Token offsets within .bin are the exclusive cumsum of n_tok — derived,
never stored, so the two files cannot disagree.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args

MAGIC = b"OFRTIDX1"


def _encode_idx(doc_ids: list[str], n_tok: np.ndarray) -> bytes:
    ids_b = [d.encode("utf-8") for d in doc_ids]
    return b"".join(
        [
            MAGIC,
            np.uint64(len(ids_b)).tobytes(),
            n_tok.astype("<i8").tobytes(),
            np.asarray([len(b) for b in ids_b], dtype="<i4").tobytes(),
            b"".join(ids_b),
        ]
    )


def _decode_idx(buf: bytes) -> tuple[list[str], np.ndarray]:
    if buf[:8] != MAGIC:
        raise ValueError(f"bad .idx magic {buf[:8]!r} (want {MAGIC!r})")
    n = int(np.frombuffer(buf, dtype="<u8", count=1, offset=8)[0])
    off = 16
    n_tok = np.frombuffer(buf, dtype="<i8", count=n, offset=off)
    off += 8 * n
    id_len = np.frombuffer(buf, dtype="<i4", count=n, offset=off)
    off += 4 * n
    ids, p = [], off
    for ln in id_len:
        ids.append(buf[p : p + int(ln)].decode("utf-8"))
        p += int(ln)
    return ids, n_tok.astype(np.int64)


def write_bin_shards(ds, path: str, rows_per_shard: int = 100_000,
                     id_col: str = "doc_id", tokens_col: str = "tokens"):
    """Write a tokens Dataset (doc_id:string, tokens:list<int32>) as
    .bin/.idx shards under ``path``; returns the part manifest
    ``(path, n_docs, n_tokens)`` (paths name the .bin side)."""
    import os

    import ray

    from ._shardwrite import block_offsets, shard_spans

    os.makedirs(path, exist_ok=True)
    mat = ds.materialize()
    refs, counts, offsets = block_offsets(mat)

    @ray.remote(**remote_args())
    def write_block(block, start: int):
        from ray.data.block import BlockAccessor

        batch = BlockAccessor.for_block(block).to_arrow()
        toks = batch[tokens_col]
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        if toks.null_count:
            raise ValueError("write_bin_shards: null token lists are not writable")
        flat = toks.flatten().to_numpy(zero_copy_only=False).astype("<i4")
        import pyarrow.compute as pc

        n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        tok_offs = np.zeros(len(n_tok) + 1, np.int64)
        np.cumsum(n_tok, out=tok_offs[1:])
        ids = batch[id_col].cast(pa.string()).to_pylist()
        out = []
        for g, lo, hi, shard in shard_spans(start, batch.num_rows, rows_per_shard):
            base = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}")
            tmp_bin, tmp_idx = f"{base}.bin.tmp.{os.getpid()}", f"{base}.idx.tmp.{os.getpid()}"
            with open(tmp_bin, "wb") as f:
                f.write(flat[tok_offs[lo] : tok_offs[hi]].tobytes())
            with open(tmp_idx, "wb") as f:
                f.write(_encode_idx(ids[lo:hi], n_tok[lo:hi]))
            os.replace(tmp_bin, base + ".bin")
            os.replace(tmp_idx, base + ".idx")  # commit marker: LAST
            out.append((base + ".bin", hi - lo, int(tok_offs[hi] - tok_offs[lo])))
        return out

    import pandas as pd

    parts = ray.get(
        [write_block.remote(ref, int(offsets[i])) for i, ref in enumerate(refs) if counts[i]]
    )
    manifest = pd.DataFrame(
        [(p, d, t) for chunk in parts for p, d, t in chunk],
        columns=["path", "n_docs", "n_tokens"],
    )
    return manifest.sort_values("path").reset_index(drop=True)


def read_bin_shards(path: str):
    """Stream .bin/.idx shards back as a Dataset (doc_id:string,
    tokens:list<int32>, n_tok:int32). One task per part; .idx presence is
    the completeness contract, and the .bin byte size must equal
    sum(n_tok) * 4 (loud corruption guard). Filename order == global row
    order."""
    import glob
    import os

    import ray.data

    idxs = sorted(glob.glob(os.path.join(path, "shard-*.part-*.idx")))
    if not idxs:
        raise FileNotFoundError(f"no .idx shards under {path}")

    def load(batch: pa.Table):
        for idx_path in batch["p"].to_pylist():
            with open(idx_path, "rb") as f:
                ids, n_tok = _decode_idx(f.read())
            bin_path = idx_path[: -len(".idx")] + ".bin"
            want = int(n_tok.sum()) * 4
            got = os.path.getsize(bin_path)
            if got != want:
                raise ValueError(f"{bin_path}: {got} bytes, index implies {want}")
            flat = np.fromfile(bin_path, dtype="<i4")
            total = int(n_tok.sum())
            if total >= (1 << 31):  # int32 list offsets — cut smaller shards
                raise ValueError(f"{bin_path}: {total} tokens exceeds int32 list offsets")
            offs = np.zeros(len(n_tok) + 1, np.int64)
            np.cumsum(n_tok, out=offs[1:])
            arr = pa.ListArray.from_arrays(
                pa.array(offs.astype(np.int32), pa.int32()),
                pa.array(flat.astype(np.int32), pa.int32()),
            )
            yield pa.table(
                {
                    "doc_id": pa.array(ids, pa.string()),
                    "tokens": arr,
                    "n_tok": pa.array(n_tok.astype(np.int32), pa.int32()),
                }
            )

    src = ray.data.from_arrow(pa.table({"p": pa.array(idxs, pa.string())}))
    return src.repartition(len(idxs)).map_batches(load, batch_format="pyarrow", **remote_args())
