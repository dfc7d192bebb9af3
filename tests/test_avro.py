"""Avro object-container interchange (ops/avro.py): spec-structural checks
(magic, metadata map, sync markers, raw-deflate codec), bit-exact
round-trips across the supported profile (nullable unions, sliced blocks,
doubles with exact payloads), deterministic re-writes, loud corruption
and unsupported-type rejection, and the Ray shard/Dataset plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from orc_format_ray.ops.avro import (
    avro_schema_of,
    read_avro,
    read_avro_dataset,
    write_avro,
    write_avro_shards,
)


def _profile_table(n=20_000, seed=3):
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n, dtype=np.int64)),
            "small": pa.array(rng.integers(-300, 300, n).astype(np.int16), pa.int16()),
            "val": pa.array(rng.normal(size=n)),
            "flag": pa.array(rng.random(n) < 0.5),
            "name": pa.array([f"row-{i}" if i % 7 else None for i in range(n)], pa.string()),
            "blob": pa.array(
                [bytes([i % 256, (i * 3) % 256]) if i % 5 else None for i in range(n)],
                pa.binary(),
            ),
            "ts": pa.array((np.arange(n, dtype=np.int64) * 1_000_003) % 10**15, pa.timestamp("us")),
            "nv": pa.array([None if i % 3 == 0 else float(i) for i in range(n)], pa.float64()),
        }
    )


def _widened(t: pa.Table) -> pa.Table:
    # the profile widens small ints to long and floats to double
    return t.set_column(1, "small", t["small"].cast(pa.int64()))


def test_avro_roundtrip_deflate_and_null_codecs(tmp_path):
    t = _profile_table()
    exp = _widened(t)
    for codec in ("deflate", "null"):
        p = str(tmp_path / f"t_{codec}.avro")
        info = write_avro(t, p, codec=codec, block_rows=6_000)  # forces sliced blocks
        assert info["rows"] == len(t) and info["blocks"] == 4
        assert read_avro(p).equals(exp)


def test_avro_header_structure_and_determinism(tmp_path):
    t = _profile_table(500)
    p1, p2 = str(tmp_path / "a.avro"), str(tmp_path / "b.avro")
    write_avro(t, p1, sync_seed="s")
    write_avro(t, p2, sync_seed="s")
    b = open(p1, "rb").read()
    assert b == open(p2, "rb").read()  # byte-identical re-runs
    assert b[:4] == b"Obj\x01"
    assert b.count(b"avro.schema") == 1 and b.count(b"avro.codec") == 1


def test_avro_empty_and_all_null_column(tmp_path):
    e = pa.table({"a": pa.array([], pa.int64())})
    p = str(tmp_path / "e.avro")
    write_avro(e, p)
    assert read_avro(p).equals(e)
    t = pa.table({"x": pa.array([None, None, None], pa.float64())})
    p2 = str(tmp_path / "n.avro")
    write_avro(t, p2)
    assert read_avro(p2).equals(t)


def test_avro_corruption_and_type_rejection(tmp_path):
    t = _profile_table(100)
    p = str(tmp_path / "c.avro")
    write_avro(t, p)
    blob = bytearray(open(p, "rb").read())
    blob[-1] ^= 0xFF  # clobber the final sync marker
    with pytest.raises(ValueError, match="sync marker"):
        read_avro(bytes(blob))
    with pytest.raises(ValueError, match="does not support"):
        write_avro(pa.table({"l": pa.array([[1]], pa.list_(pa.int64()))}), str(tmp_path / "x.avro"))
    with pytest.raises(ValueError, match="timestamps"):
        write_avro(
            pa.table({"t": pa.array([0], pa.timestamp("us", tz="UTC"))}), str(tmp_path / "y.avro")
        )


def test_avro_schema_json_shape():
    t = pa.table(
        {
            "a": pa.array([1], pa.int64()),
            "s": pa.array(["x"], pa.string()),
            "ts": pa.array([0], pa.timestamp("us")),
        }
    )
    s = avro_schema_of(t.schema)
    assert s["type"] == "record"
    by_name = {f["name"]: f["type"] for f in s["fields"]}
    assert by_name["a"] == ["null", "long"]
    assert by_name["ts"] == ["null", {"type": "long", "logicalType": "timestamp-micros"}]


def test_avro_shards_roundtrip_and_resume_names(ray_session, tmp_path):
    import ray.data

    t = _profile_table(30_000, seed=9)
    exp = _widened(t)
    out = str(tmp_path / "shards")
    ds = ray.data.from_arrow(t).repartition(5)
    _mat, man = write_avro_shards(ds, out, codec="deflate")
    assert int(man["rows"].sum()) == len(t)
    assert all(p.startswith("part-") and p.endswith(".avro") for p in man["part"])
    # name-ordered concat reproduces the table bit-exactly (metadata-keyed
    # offsets, never completion order)
    import os

    back = pa.concat_tables([read_avro(os.path.join(out, p)) for p in man["part"]])
    assert back.equals(exp)
    # Dataset read path sees every row
    ds2 = read_avro_dataset(out)
    assert ds2.count() == len(t)
    assert int(ds2.sum("id")) == int(exp["id"].to_numpy().sum())
