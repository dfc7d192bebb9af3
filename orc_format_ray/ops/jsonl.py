"""JSONL corpus shard interchange over Ray Data.

THE de-facto LLM-corpus exchange format: one JSON object per line, sharded
into size-budgeted part files. This module writes a Dataset into JSONL
shards (one write task per block — no payload shuffle: shards are cut
along the pinned block order with offsets from block METADATA, the
`_shardwrite.py` plan) and reads them back as a streaming Dataset (one
read task per part).

Determinism contract: objects are serialized with sorted keys, compact
separators and ensure_ascii=False (Python's shortest-repr floats), shards
are named shard-S.part-G.jsonl[.gz] where G is the global first-row index,
writes are atomic (tmp + rename), and gzip members carry mtime 0 — so a
re-run over the same block layout reproduces every shard byte-identically
and resumable writers can skip finished parts by name.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args

_DTYPES = {
    "string": pa.string(),
    "int64": pa.int64(),
    "float64": pa.float64(),
    "bool": pa.bool_(),
}


def write_jsonl(ds, path: str, key_col: str, columns: list[str],
                rows_per_shard: int = 100_000, compress: bool = False):
    """Write ``ds`` as JSONL shards under ``path``.

    ``columns`` lists the fields serialized into each object (scalars
    only: str/int/float/bool/None). ``key_col`` values should be unique
    across the dataset (an in-block duplicate is rejected loudly).
    Returns the shard-part manifest ``(path, n_rows)`` as a pandas
    DataFrame.

    Plan: materialize pins the block layout; global row offsets come from
    BLOCK METADATA (zero execution — see `_shardwrite.block_offsets` for
    why two map_batches passes cannot be order-aligned); one explicit Ray
    task per block writes that block's rows into the part files its
    offset range covers (a shard spanning blocks becomes multiple part
    files, concatenated by filename order at read time). Rows never move
    between blocks; payloads stay in the object store.
    """
    import os

    import ray

    from ._shardwrite import block_offsets, shard_spans

    if not columns:
        raise ValueError("write_jsonl: need at least one column")
    os.makedirs(path, exist_ok=True)

    mat = ds.materialize()  # pin the block layout the offsets describe
    refs, counts, offsets = block_offsets(mat)
    ext = ".jsonl.gz" if compress else ".jsonl"

    @ray.remote(**remote_args())
    def write_block(block, start: int):
        import gzip
        import json

        from ray.data.block import BlockAccessor

        batch = BlockAccessor.for_block(block).to_arrow()
        keys = batch[key_col].to_pylist()
        if len(set(keys)) != len(keys):
            raise ValueError("write_jsonl: duplicate keys within a block")
        cols = {c: batch[c].to_pylist() for c in columns}
        lines = [
            json.dumps({c: cols[c][r] for c in columns},
                       sort_keys=True, ensure_ascii=False,
                       separators=(",", ":")).encode("utf-8") + b"\n"
            for r in range(batch.num_rows)
        ]
        out = []
        for g, lo, hi, shard in shard_spans(start, batch.num_rows, rows_per_shard):
            fname = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}{ext}")
            tmp = fname + f".tmp.{os.getpid()}"
            payload = b"".join(lines[lo:hi])
            buf = gzip.compress(payload, mtime=0) if compress else payload
            with open(tmp, "wb") as f:
                f.write(buf)
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


def read_jsonl(path: str, schema: dict[str, str], quarantine_dir: str | None = None):
    """Read JSONL shards back as a streaming Dataset: one task per part
    file (filename order == global row order), each yielding an Arrow
    batch with the columns of ``schema`` (column -> one of "string",
    "int64", "float64", "bool"). Missing fields become nulls; unknown
    fields are ignored — the reader is the schema authority, matching
    the evolve_table null-fill convention.

    ``quarantine_dir`` flips the malformed-line contract from fail-loud to
    SIDE-OUTPUT: lines that don't parse as a JSON object are written to
    ``quarantine_dir/<shard-name>.bad`` (atomic tmp+rename per shard task;
    re-runs overwrite, never double-append) and the good rows stream on —
    the ingest posture for web-scale feeds where one mangled record must
    not kill a 100-TB job. Without it, a bad line raises (pipeline bug =
    loud). The .bad files ARE the report: count/inspect them after the
    read materializes."""
    import glob
    import os

    import ray.data

    bad = [t for t in schema.values() if t not in _DTYPES]
    if bad:
        raise ValueError(f"read_jsonl: unsupported dtypes {bad}; pick from {sorted(_DTYPES)}")
    files = sorted(glob.glob(os.path.join(path, "*.jsonl"))
                   + glob.glob(os.path.join(path, "*.jsonl.gz")))
    if not files:
        raise FileNotFoundError(f"no .jsonl[.gz] shards under {path}")
    if quarantine_dir is not None:
        os.makedirs(quarantine_dir, exist_ok=True)

    def load(batch: pa.Table):
        import gzip
        import json

        for p in batch["p"].to_pylist():
            opener = gzip.open if p.endswith(".gz") else open
            objs = []
            rejects = []
            with opener(p, "rb") as f:
                for line in f:
                    if not line.strip():
                        continue
                    try:
                        o = json.loads(line)
                        if not isinstance(o, dict):
                            raise ValueError("not a JSON object")
                        objs.append(o)
                    except Exception:
                        if quarantine_dir is None:
                            raise
                        rejects.append(line)
            if rejects:
                qp = os.path.join(quarantine_dir, os.path.basename(p) + ".bad")
                tmp = qp + f".tmp{os.getpid()}"
                with open(tmp, "wb") as qf:
                    qf.writelines(rejects)
                os.replace(tmp, qp)
            yield pa.table({
                c: pa.array([o.get(c) for o in objs], _DTYPES[t])
                for c, t in schema.items()
            })

    src = ray.data.from_arrow(pa.table({"p": pa.array(files, pa.string())}))
    return src.repartition(len(files)).map_batches(load, batch_format="pyarrow", **remote_args())
