"""Hive-partitioned ORC sink + partition-pruned read (orcfile.py).

write_orc_dataset(partition_by=...) writes col=value directories with the
partition columns dropped from the data files and a serialized-schema
sidecar; read_orc_dataset re-injects them typed and prunes whole files on
partition predicates driver-side."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray

from orc_format_ray.orcfile import (
    _hive_quote,
    _hive_unquote,
    read_orc_dataset,
    write_orc_dataset,
)


def _table(n=6000, seed=3):
    r = np.random.default_rng(seed)
    return pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "source": pa.array([f"src{v}" for v in r.integers(0, 4, n)]),
            "lang": pa.array(r.integers(0, 3, n), pa.int32()),
            "val": pa.array(r.normal(size=n)),
        }
    )


@pytest.fixture(scope="module")
def part_dir(tmp_path_factory, ray_session):
    d = str(tmp_path_factory.mktemp("hive") / "data")
    t = _table()
    write_orc_dataset(ray.data.from_arrow(t).repartition(3), d, partition_by=["source", "lang"], stripe_rows=500).materialize()
    return {"dir": d, "t": t}


def test_hive_quoting_roundtrip():
    for v in ("plain", "a/b=c d%e", "", "__HIVE_DEFAULT_PARTITION__x"):
        assert _hive_unquote(_hive_quote(v)) == v
    assert _hive_quote(None) == "__HIVE_DEFAULT_PARTITION__"
    assert _hive_unquote("__HIVE_DEFAULT_PARTITION__") is None
    assert "/" not in _hive_quote("a/b") and "=" not in _hive_quote("a=b")


def test_partitioned_layout_and_sidecar(part_dir):
    files = glob.glob(os.path.join(part_dir["dir"], "**", "*.orc"), recursive=True)
    assert files and all("source=" in f and "lang=" in f for f in files)
    assert os.path.exists(os.path.join(part_dir["dir"], "_partition_schema.arrow"))


@pytest.mark.parametrize("native", [True, False])
def test_partitioned_roundtrip(part_dir, native, ray_session):
    ds = read_orc_dataset(part_dir["dir"], native=native)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    want = part_dir["t"].sort_by("id")
    assert got["lang"].type == pa.int32()  # typed via the sidecar
    assert got.select(["id", "source", "lang", "val"]).cast(want.schema).equals(want)


def test_partition_predicate_prunes_files(part_dir, ray_session):
    t = part_dir["t"]
    # == on a partition column: works WITHOUT native (no data pushdown left)
    ds = read_orc_dataset(part_dir["dir"], predicate=("source", "==", "src2"))
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got.num_rows == pc.sum(pc.equal(t["source"], "src2").cast(pa.int64())).as_py()
    assert set(got["source"].to_pylist()) == {"src2"}
    # IN + typed comparison on the int partition column
    ds = read_orc_dataset(part_dir["dir"], predicate=[("lang", ">=", 1), ("source", "in", ["src0", "src3"])])
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    m = pc.and_(pc.greater_equal(t["lang"], 1), pc.is_in(t["source"], value_set=pa.array(["src0", "src3"])))
    assert got.num_rows == t.filter(m).num_rows
    # nothing matches -> empty Dataset but not an error
    ds = read_orc_dataset(part_dir["dir"], predicate=("source", "==", "nope"))
    assert pa.concat_tables(ray.get(ds.to_arrow_refs()) or [pa.table({})]).num_rows == 0


def test_partition_dnf_predicates(part_dir, ray_session):
    """DNF over partition columns prunes FILES (a file survives when ANY
    conjunct fully matches); data-only DNF pushes down per file; mixing
    partition and data columns in a DNF is rejected loudly."""
    t = part_dir["t"]
    dnf = [[("source", "==", "src1"), ("lang", ">=", 2)], [("source", "==", "src3")]]
    ds = read_orc_dataset(part_dir["dir"], predicate=dnf)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    m = pc.or_(
        pc.and_(pc.equal(t["source"], "src1"), pc.greater_equal(t["lang"], 2)),
        pc.equal(t["source"], "src3"),
    )
    assert got.num_rows == t.filter(m).num_rows
    assert set(got["source"].to_pylist()) <= {"src1", "src3"}
    # data-only DNF pushes into the per-file reader (native required)
    ds = read_orc_dataset(part_dir["dir"], predicate=[[("id", "<", 100)], [("id", ">=", 1900)]], native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    ids = got["id"].to_numpy()
    want_n = int(pc.sum(pc.or_(pc.less(t["id"], 100), pc.greater_equal(t["id"], 1900)).cast(pa.int64())).as_py())
    assert got.num_rows == want_n and ((ids < 100) | (ids >= 1900)).all()
    with pytest.raises(ValueError, match="mixing partition columns"):
        read_orc_dataset(part_dir["dir"], predicate=[[("source", "==", "src1"), ("id", "<", 700)]], native=True)


def test_mixed_partition_and_data_predicate(part_dir, ray_session):
    t = part_dir["t"]
    ds = read_orc_dataset(part_dir["dir"], predicate=[("source", "==", "src1"), ("id", "<", 700)], native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    m = pc.and_(pc.equal(t["source"], "src1"), pc.less(t["id"], 700))
    assert got.num_rows == t.filter(m).num_rows
    assert pc.max(got["id"]).as_py() < 700


@pytest.mark.parametrize("native", [True, False])
def test_partition_projection(part_dir, native, ray_session):
    ds = read_orc_dataset(part_dir["dir"], columns=["source", "id"], native=native)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got.column_names == ["source", "id"] and got.num_rows == 6000
    ds = read_orc_dataset(part_dir["dir"], columns=["lang"], native=native)  # partition-only
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got.column_names == ["lang"] and got.num_rows == 6000 and got["lang"].type == pa.int32()


def test_partitioned_split_row_groups(part_dir, ray_session):
    ds = read_orc_dataset(part_dir["dir"], native=True, split_row_groups=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    want = part_dir["t"].sort_by("id")
    assert got.select(["id", "source", "lang", "val"]).cast(want.schema).equals(want)


def test_null_partition_value(tmp_path, ray_session):
    t = pa.table({"k": pa.array(["a", None, "b", None]), "v": pa.array([1, 2, 3, 4], pa.int64())})
    d = str(tmp_path / "nulls")
    write_orc_dataset(ray.data.from_arrow(t), d, partition_by=["k"]).materialize()
    assert os.path.isdir(os.path.join(d, "k=__HIVE_DEFAULT_PARTITION__"))
    ds = read_orc_dataset(d, native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("v")
    assert got["k"].to_pylist() == ["a", None, "b", None]
    # null partitions never satisfy predicates
    ds = read_orc_dataset(d, predicate=("k", "==", "a"))
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got["v"].to_pylist() == [1]


def test_foreign_hive_layout_without_sidecar(tmp_path, ray_session):
    """key=value dirs written by another engine (no sidecar): partition
    columns come back as strings."""
    from orc_format_ray.orcfile import write_orc

    os.makedirs(tmp_path / "year=2024")
    write_orc(pa.table({"v": pa.array([1, 2], pa.int64())}), str(tmp_path / "year=2024" / "a.orc"))
    ds = read_orc_dataset(str(tmp_path), native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got["year"].type == pa.string() and got["year"].to_pylist() == ["2024", "2024"]


def test_partition_bloom_conflict_raises(ray_session):
    with pytest.raises(ValueError, match="bloom"):
        write_orc_dataset(ray.data.from_arrow(_table(10)), "/tmp/x_unused", partition_by=["source"], bloom_columns=["source"])


def test_float_partition_column_rejected(tmp_path, ray_session):
    """NaN != NaN would silently drop rows from the split mask; floats are
    rejected as partition keys."""
    t = pa.table({"k": pa.array([1.0, float("nan")]), "v": pa.array([1, 2], pa.int64())})
    with pytest.raises(Exception, match="floating-point"):
        write_orc_dataset(ray.data.from_arrow(t), str(tmp_path / "f"), partition_by=["k"]).materialize()


def test_sentinel_string_partition_value_roundtrips(tmp_path, ray_session):
    """A literal '__HIVE_DEFAULT_PARTITION__' string value must not read
    back as null."""
    t = pa.table({"k": pa.array(["__HIVE_DEFAULT_PARTITION__", None]), "v": pa.array([1, 2], pa.int64())})
    d = str(tmp_path / "sent")
    write_orc_dataset(ray.data.from_arrow(t), d, partition_by=["k"]).materialize()
    ds = read_orc_dataset(d, native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("v")
    assert got["k"].to_pylist() == ["__HIVE_DEFAULT_PARTITION__", None]


def test_foreign_layout_keeping_partition_column_in_data(tmp_path, ray_session):
    """A foreign engine that keeps the partition column inside the data
    files must not produce duplicate columns — the data copy wins."""
    from orc_format_ray.orcfile import write_orc

    os.makedirs(tmp_path / "year=2024")
    write_orc(pa.table({"year": pa.array(["2024", "2024"]), "v": pa.array([1, 2], pa.int64())}), str(tmp_path / "year=2024" / "a.orc"))
    ds = read_orc_dataset(str(tmp_path), native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert got.column_names.count("year") == 1
    assert got["year"].to_pylist() == ["2024", "2024"]


def test_pushdown_projection_of_missing_column_survives(tmp_path, ray_session):
    """Evolution + projection + pushdown: a projected column absent from an
    old file stays absent for evolve_table to null-fill (no KeyError)."""
    from orc_format_ray.orcfile import write_orc

    old = pa.table({"id": pa.array([1, 2], pa.int64())})
    new = pa.table({"id": pa.array([3, 4], pa.int64()), "score": pa.array([0.5, 1.5])})
    d = tmp_path / "evp"
    d.mkdir()
    write_orc(old, str(d / "old.orc"))
    write_orc(new, str(d / "new.orc"))
    ds = read_orc_dataset(str(d), columns=["id", "score"], predicate=("id", "<", 4), native=True, target_schema="unify")
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    assert got.column_names == ["id", "score"]
    assert got["id"].to_pylist() == [1, 2, 3]
    assert got["score"].to_pylist() == [None, None, 0.5]


def test_partitioned_with_evolution(tmp_path, ray_session):
    """Partitioning and schema evolution compose: drifted data files inside
    partition dirs unify, partition columns inject after."""
    from orc_format_ray.orcfile import write_orc

    for src, tbl in (
        ("a", pa.table({"id": pa.array([1, 2], pa.int32())})),
        ("b", pa.table({"id": pa.array([3], pa.int64()), "score": pa.array([0.5])})),
    ):
        os.makedirs(tmp_path / f"source={src}", exist_ok=True)
        write_orc(tbl, str(tmp_path / f"source={src}" / "part.orc"))
    ds = read_orc_dataset(str(tmp_path), native=True, target_schema="unify")
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    assert got["id"].type == pa.int64() and got["id"].to_pylist() == [1, 2, 3]
    assert got["score"].to_pylist() == [None, None, 0.5]
    assert got["source"].to_pylist() == ["a", "a", "b"]
    with pytest.raises(ValueError, match="partition columns"):
        read_orc_dataset(str(tmp_path), native=True, target_schema=pa.schema([("source", pa.string())]))


def test_compact_within_partition(part_dir, tmp_path, ray_session):
    """Compaction composes: each partition directory holds same-schema files
    and compacts by raw stripe copy."""
    from orc_format_ray.orcmerge import compact_orc_dataset

    one = glob.glob(os.path.join(part_dir["dir"], "source=src0", "lang=1"))[0]
    n_in = len(glob.glob(os.path.join(one, "*.orc")))
    lineage = compact_orc_dataset(one, str(tmp_path / "compacted"), target_bytes=1 << 30).materialize()
    rows = lineage.take_all()
    assert len(rows) == 1 and rows[0]["n_inputs"] == n_in


def test_lake_stats_tail_only(part_dir, ray_session):
    """Per-file inventory from tails: summed per partition it must equal the
    original group sizes."""
    from orc_format_ray.orcmerge import lake_stats

    stats = lake_stats(part_dir["dir"])
    df = stats.to_pandas()
    assert {"source", "lang", "path", "num_rows", "file_bytes", "stripes"} <= set(df.columns)
    got = df.groupby(["source", "lang"])["num_rows"].sum().sort_index()
    t = part_dir["t"]
    want = (
        t.select(["source", "lang"]).to_pandas().assign(lang=lambda d: d["lang"].astype(str))
        .groupby(["source", "lang"]).size().sort_index()
    )
    # lake_stats reports partition values as raw strings (pre-typing)
    assert dict(got) == dict(want)
    assert (df["file_bytes"] > 0).all() and (df["stripes"] >= 1).all()


def test_recursive_compaction_rejects_nested_out_dir(part_dir, ray_session):
    """out_dir inside in_dir would make the recursive glob consume the first
    run's parts on rerun — silent row duplication."""
    from orc_format_ray.orcmerge import compact_orc_dataset

    with pytest.raises(ValueError, match="nested"):
        compact_orc_dataset(part_dir["dir"], os.path.join(part_dir["dir"], "compacted"), recursive=True)


def test_lake_stats_reserved_name_collision(tmp_path, ray_session):
    """A foreign partition key named like a reserved output column keeps its
    'part:' prefix instead of being overwritten."""
    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import lake_stats

    os.makedirs(tmp_path / "num_rows=5")
    write_orc(pa.table({"v": pa.array([1, 2, 3], pa.int64())}), str(tmp_path / "num_rows=5" / "a.orc"))
    df = lake_stats(str(tmp_path)).to_pandas()
    assert df["part:num_rows"].tolist() == ["5"]
    assert df["num_rows"].tolist() == [3]  # the file's actual row count


def test_compact_whole_lake_recursive(part_dir, tmp_path, ray_session):
    """recursive=True compacts every partition directory in one call,
    mirrors the hive layout + sidecar, and the compacted lake reads back
    identically (typed partitions, same rows)."""
    from orc_format_ray.orcmerge import compact_orc_dataset

    out = str(tmp_path / "lake")
    lineage = compact_orc_dataset(part_dir["dir"], out, target_bytes=1 << 30, recursive=True).materialize()
    rows = lineage.take_all()
    n_parts = 4 * 3  # one part per (source, lang) partition
    assert len(rows) == n_parts and sum(r["num_rows"] for r in rows) == 6000
    assert all(not r["reencoded"] for r in rows)  # same-schema => raw copy
    assert os.path.exists(os.path.join(out, "_partition_schema.arrow"))
    before = len(glob.glob(os.path.join(part_dir["dir"], "**", "*.orc"), recursive=True))
    after = len(glob.glob(os.path.join(out, "**", "*.orc"), recursive=True))
    assert after == n_parts < before
    ds = read_orc_dataset(out, native=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    want = part_dir["t"].sort_by("id")
    assert got["lang"].type == pa.int32()
    assert got.select(["id", "source", "lang", "val"]).cast(want.schema).equals(want)
    # partition predicate still prunes the compacted lake
    ds = read_orc_dataset(out, predicate=("source", "==", "src3"))
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert set(got["source"].to_pylist()) == {"src3"}
    # resume over the lake
    again = compact_orc_dataset(part_dir["dir"], out, target_bytes=1 << 30, recursive=True).materialize()
    assert all(r["skipped"] for r in again.take_all())
