"""Single-file container tests: assembly, tail-parsed footer, stripe reads,
merged file statistics (reference Writer::finish parity)."""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_ray import file as fmod
from orc_format_ray import stripe

rng = np.random.default_rng(7)


def _tbl(n, base):
    return pa.table(
        {
            "v": pa.array((np.arange(n) + base).astype(np.int64)),
            "s": pa.array([f"s{(i + base) % 5}" for i in range(n)]),
        }
    )


def test_file_roundtrip_and_footer(tmp_path):
    tables = [_tbl(1000, 0), _tbl(500, 1000), _tbl(250, 1500)]
    blobs = [stripe.encode_table(t)[0] for t in tables]
    path = str(tmp_path / "out.ory")
    footer = fmod.write_file(blobs, path)
    assert footer["num_rows"] == 1750
    r = fmod.FileReader(path)
    assert r.num_rows == 1750
    assert len(r.stripes) == 3
    whole = r.to_table()
    assert whole.equals(pa.concat_tables(tables))
    # per-stripe + projection + range
    s1 = r.read_stripe(1, columns=["v"], row_range=(10, 20))
    assert s1["v"].to_pylist() == list(range(1010, 1020))
    # merged file stats
    st = r.statistics()
    assert st["v"]["min"] == 0 and st["v"]["max"] == 1749
    assert st["v"]["sum"] == sum(range(1750))
    assert st["s"]["num_values"] == 1750


def test_file_rejects_garbage(tmp_path):
    p = tmp_path / "bad.ory"
    p.write_bytes(b"not a real file at all")
    with pytest.raises(ValueError):
        fmod.FileReader(str(p))


def test_assemble_dir(tmp_path):
    out = tmp_path / "stripes"
    out.mkdir()
    for i, t in enumerate([_tbl(100, 0), _tbl(100, 100)]):
        (out / f"part-{i:05d}.stripe").write_bytes(stripe.encode_table(t)[0])
    path = str(tmp_path / "all.ory")
    fmod.assemble_dir(str(out), path)
    r = fmod.FileReader(path)
    assert r.num_rows == 200
    assert r.to_table()["v"].to_pylist() == list(range(200))
