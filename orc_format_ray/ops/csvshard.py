"""CSV corpus shard interchange over Ray Data — the third leg of the
interchange matrix (WebDataset tar for multimodal, JSONL for LLM corpora,
CSV for the spreadsheet/warehouse boundary).

Same deterministic shard plan as ops/jsonl.py (`_shardwrite.py`): the
block layout pins once, global row offsets come from block METADATA (two
executed passes can never be order-aligned — Ray output order is
completion order), one explicit Ray task per block writes the part files
its offset range covers, writes are atomic tmp+rename, and part names
shard-S.part-G.csv[.gz] (G = global first-row index) make re-runs
byte-identical and resume skip-by-name.

CSV determinism contract: header row always present, minimal quoting with
'"' doubling (RFC 4180), '\n' line terminator, floats via repr (shortest
round-trip), None as the empty field. The reader is the schema authority
(missing columns null-fill; extra columns ignored) and distinguishes
None from '' for strings via the quoting rule: an UNQUOTED empty field is
null, a quoted '""' is the empty string."""

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


def _field(v) -> str:
    """Serialize one scalar: RFC-4180 minimal quoting, repr floats.
    None -> truly empty (unquoted); '' -> '""' so the reader can tell.
    Embedded newlines are REJECTED (this is a line-oriented shard format —
    the reader splits on '\\n'; multi-line text belongs in JSONL)."""
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        s = repr(v)
    else:
        s = str(v)
    if "\n" in s or "\r" in s:
        raise ValueError(
            "write_csv_shards: embedded newline in a field — use write_jsonl "
            "for multi-line text"
        )
    if s == "":
        return '""'
    if "," in s or '"' in s:
        return '"' + s.replace('"', '""') + '"'
    return s


def write_csv_shards(ds, path: str, key_col: str, columns: list[str],
                     rows_per_shard: int = 100_000, compress: bool = False):
    """Write ``ds`` as CSV shards under ``path``; returns the part
    manifest ``(path, n_rows)``. ``columns`` order fixes the header."""
    import os

    import ray

    from ._shardwrite import block_offsets, shard_spans

    if not columns:
        raise ValueError("write_csv_shards: need at least one column")
    os.makedirs(path, exist_ok=True)

    mat = ds.materialize()
    refs, counts, offsets = block_offsets(mat)
    ext = ".csv.gz" if compress else ".csv"
    header = (",".join(_field(c) for c in columns) + "\n").encode("utf-8")

    @ray.remote(**remote_args())
    def write_block(block, start: int):
        import gzip

        from ray.data.block import BlockAccessor

        batch = BlockAccessor.for_block(block).to_arrow()
        keys = batch[key_col].to_pylist()
        if len(set(keys)) != len(keys):
            raise ValueError("write_csv_shards: duplicate keys within a block")
        cols = {c: batch[c].to_pylist() for c in columns}
        lines = [
            (",".join(_field(cols[c][r]) for c in columns) + "\n").encode("utf-8")
            for r in range(batch.num_rows)
        ]
        out = []
        for g, lo, hi, shard in shard_spans(start, batch.num_rows, rows_per_shard):
            fname = os.path.join(path, f"shard-{shard:08d}.part-{g:012d}{ext}")
            tmp = fname + f".tmp.{os.getpid()}"
            payload = header + b"".join(lines[lo:hi])
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


def read_csv_shards(path: str, schema: dict[str, str]):
    """Stream CSV shards back: one task per part (filename order == global
    row order). ``schema`` maps column -> "string"/"int64"/"float64"/
    "bool". Header-absent columns null-fill; extra header columns are
    ignored. Unquoted empty fields decode as null; '""' as ''."""
    import glob
    import os

    import ray.data

    bad = [t for t in schema.values() if t not in _DTYPES]
    if bad:
        raise ValueError(f"read_csv_shards: unsupported dtypes {bad}; pick from {sorted(_DTYPES)}")
    files = sorted(glob.glob(os.path.join(path, "*.csv"))
                   + glob.glob(os.path.join(path, "*.csv.gz")))
    if not files:
        raise FileNotFoundError(f"no .csv[.gz] shards under {path}")

    def _parse_line(line: str) -> list:
        """RFC-4180 field split preserving the null-vs-'' distinction
        (csv.reader collapses both to '' — so parse by hand; C-speed is
        irrelevant next to the decompress + Arrow build)."""
        fields, i, n = [], 0, len(line)
        while True:
            if i < n and line[i] == '"':
                buf, i = [], i + 1
                while i < n:
                    if line[i] == '"':
                        if i + 1 < n and line[i + 1] == '"':
                            buf.append('"')
                            i += 2
                        else:
                            i += 1
                            break
                    else:
                        buf.append(line[i])
                        i += 1
                fields.append("".join(buf))
            else:
                j = i
                while j < n and line[j] != ",":
                    j += 1
                fields.append(None if j == i else line[i:j])
                i = j
            if i < n and line[i] == ",":
                i += 1
            else:
                break
        return fields

    def _cast(v, t):
        if v is None:
            return None
        if t == "int64":
            return int(v)
        if t == "float64":
            return float(v)
        if t == "bool":
            return v == "true"
        return v

    def load(batch: pa.Table):
        import gzip

        for p in batch["p"].to_pylist():
            opener = gzip.open if p.endswith(".gz") else open
            with opener(p, "rb") as f:
                text = f.read().decode("utf-8")
            lines = text.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            if not lines:
                continue
            hdr = [h if h is not None else "" for h in _parse_line(lines[0])]
            idx = {c: (hdr.index(c) if c in hdr else None) for c in schema}
            rows = [_parse_line(ln) for ln in lines[1:]]
            yield pa.table({
                c: pa.array(
                    [
                        _cast(r[i], t) if (i := idx[c]) is not None and i < len(r) else None
                        for r in rows
                    ],
                    _DTYPES[t],
                )
                for c, t in schema.items()
            })

    src = ray.data.from_arrow(pa.table({"p": pa.array(files, pa.string())}))
    return src.repartition(len(files)).map_batches(load, batch_format="pyarrow", **remote_args())
