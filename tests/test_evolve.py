"""Reader-side schema evolution (evolve.py + read_orc_dataset target_schema).

Pins the ORC evolution semantics we support: name-based resolution,
numeric/string/timestamp promotion, null-fill of missing columns, and the
"unify" mode that computes the widest compatible schema from file tails."""

import pyarrow as pa
import pytest

from orc_format_ray.evolve import (
    can_promote,
    evolve_table,
    orc_file_schema,
    unified_orc_schema,
    unify_schemas,
    unify_types,
)
from orc_format_ray.orcfile import write_orc


def test_can_promote_matrix():
    assert can_promote(pa.int8(), pa.int64())
    assert can_promote(pa.int16(), pa.int32())
    assert not can_promote(pa.int64(), pa.int32())  # narrowing
    assert can_promote(pa.int64(), pa.float64())
    assert can_promote(pa.float32(), pa.float64())
    assert not can_promote(pa.float64(), pa.float32())
    assert can_promote(pa.string(), pa.large_string())
    assert can_promote(pa.large_string(), pa.string())
    assert can_promote(pa.timestamp("ms"), pa.timestamp("us"))
    assert not can_promote(pa.timestamp("ns"), pa.timestamp("ms"))  # truncates
    assert not can_promote(pa.string(), pa.int64())
    assert not can_promote(pa.uint32(), pa.int64())  # unsigned not in lattice
    assert can_promote(pa.bool_(), pa.bool_())  # identity always


def test_unify_types_and_schemas():
    assert unify_types(pa.int32(), pa.int64()) == pa.int64()
    assert unify_types(pa.int64(), pa.float32()) == pa.float64()  # meet
    with pytest.raises(ValueError, match="incompatible"):
        unify_types(pa.string(), pa.int64())
    s1 = pa.schema([("id", pa.int32()), ("name", pa.string())])
    s2 = pa.schema([("name", pa.string()), ("id", pa.int64()), ("score", pa.float64())])
    u = unify_schemas([s1, s2])
    assert u.names == ["id", "name", "score"]  # first-appearance order
    assert u.field("id").type == pa.int64()
    with pytest.raises(ValueError, match="column 'id'"):
        unify_schemas([s1, pa.schema([("id", pa.string())])])


def test_evolve_table():
    t = pa.table({"b": pa.array([1, 2], pa.int32()), "extra": pa.array(["x", "y"])})
    target = pa.schema([("a", pa.string()), ("b", pa.int64())])
    out = evolve_table(t, target)
    assert out.schema == target
    assert out["a"].null_count == 2  # missing -> nulls
    assert out["b"].to_pylist() == [1, 2]  # promoted int32 -> int64
    assert "extra" not in out.column_names
    with pytest.raises(ValueError, match="cannot promote"):
        evolve_table(pa.table({"a": pa.array([1], pa.int64())}), pa.schema([("a", pa.string())]))


def _drifted_dir(tmp_path):
    """Three writer generations of the same logical table."""
    d = tmp_path / "drift"
    d.mkdir()
    v1 = pa.table({"id": pa.array([1, 2], pa.int32()), "name": pa.array(["a", "b"])})
    v2 = pa.table(
        {
            "id": pa.array([3, 4], pa.int64()),
            "name": pa.array(["c", "d"]),
            "score": pa.array([0.5, 1.5], pa.float64()),
        }
    )
    v3 = pa.table(  # reordered + a new bool column
        {
            "name": pa.array(["e"]),
            "id": pa.array([5], pa.int32()),
            "flag": pa.array([True]),
        }
    )
    write_orc(v1, str(d / "gen1.orc"))
    write_orc(v2, str(d / "gen2.orc"))
    write_orc(v3, str(d / "gen3.orc"))
    return str(d)


def test_unified_orc_schema_from_tails(tmp_path):
    d = _drifted_dir(tmp_path)
    import glob

    paths = sorted(glob.glob(d + "/*.orc"))
    u = unified_orc_schema(paths)
    assert u.names == ["id", "name", "score", "flag"]
    assert u.field("id").type == pa.int64()
    assert u.field("flag").type == pa.bool_()
    # single-file schema comes from the tail only
    assert orc_file_schema(paths[0]).names == ["id", "name"]


@pytest.mark.parametrize("native", [True, False])
def test_read_orc_dataset_unify(ray_session, tmp_path, native):
    from orc_format_ray.orcfile import read_orc_dataset

    d = _drifted_dir(tmp_path)
    ds = read_orc_dataset(d, native=native, target_schema="unify")
    import ray

    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    assert tbl.column_names == ["id", "name", "score", "flag"]
    assert tbl["id"].type == pa.int64()
    assert tbl["id"].to_pylist() == [1, 2, 3, 4, 5]
    assert tbl["name"].to_pylist() == ["a", "b", "c", "d", "e"]
    assert tbl["score"].to_pylist() == [None, None, 0.5, 1.5, None]
    assert tbl["flag"].to_pylist() == [None, None, None, None, True]


@pytest.mark.parametrize("native", [True, False])
def test_read_orc_dataset_unify_with_projection(ray_session, tmp_path, native):
    import ray

    from orc_format_ray.orcfile import read_orc_dataset

    d = _drifted_dir(tmp_path)
    ds = read_orc_dataset(d, columns=["id", "score"], native=native, target_schema="unify")
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    assert tbl.column_names == ["id", "score"]
    assert tbl["score"].to_pylist() == [None, None, 0.5, 1.5, None]


@pytest.mark.parametrize("native", [True, False])
def test_projection_of_entirely_missing_columns_keeps_rows(ray_session, tmp_path, native):
    """Projecting ONLY columns a file predates must still contribute that
    file's rows as nulls (a 0-column read carries num_rows)."""
    import ray

    from orc_format_ray.orcfile import read_orc_dataset

    d = _drifted_dir(tmp_path)  # gen1 (2 rows) + gen3 (1 row) lack "score"
    ds = read_orc_dataset(d, columns=["score"], native=native, target_schema="unify")
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert tbl.num_rows == 5
    assert tbl["score"].null_count == 3
    assert sorted(v for v in tbl["score"].to_pylist() if v is not None) == [0.5, 1.5]


def test_unify_pyarrow_path_with_timestamps(ray_session, tmp_path):
    """pyarrow's ORC reader materializes timestamps as ns where the native
    reader keeps us; 'unify' must build the target from the types the
    chosen reader actually produces."""
    import datetime

    import ray

    from orc_format_ray.orcfile import read_orc_dataset

    d = tmp_path / "ts"
    d.mkdir()
    t = pa.table({"ts": pa.array([datetime.datetime(2024, 1, 1), datetime.datetime(2024, 6, 1)], pa.timestamp("us"))})
    write_orc(t, str(d / "a.orc"))
    write_orc(t, str(d / "b.orc"))
    for native, unit in ((True, "us"), (False, "ns")):
        ds = read_orc_dataset(str(d), native=native, target_schema="unify")
        tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
        assert tbl.num_rows == 4
        assert tbl["ts"].type == pa.timestamp(unit)


def test_predicate_with_evolution_missing_column(ray_session, tmp_path):
    """Evolution semantics for a predicate on a column a file predates:
    all-null never matches, so the file contributes zero rows instead of a
    KeyError."""
    import ray

    from orc_format_ray.orcfile import read_orc_dataset

    d = _drifted_dir(tmp_path)
    ds = read_orc_dataset(d, predicate=("score", "==", 1.5), native=True, target_schema="unify")
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    assert tbl.num_rows == 1
    assert tbl["id"].to_pylist() == [4]


def test_read_orc_dataset_explicit_schema(ray_session, tmp_path):
    import ray

    from orc_format_ray.orcfile import read_orc_dataset

    d = _drifted_dir(tmp_path)
    target = pa.schema([("id", pa.int64()), ("missing_everywhere", pa.string())])
    ds = read_orc_dataset(d, native=True, target_schema=target)
    tbl = pa.concat_tables(ray.get(ds.to_arrow_refs())).sort_by("id")
    assert tbl.schema == target
    assert tbl["missing_everywhere"].null_count == 5
