"""Stripe-copy ORC compaction (orcmerge.py).

Stripes are self-contained, so merging same-schema files is a byte copy
plus a rebuilt tail; these tests pin that the merged file is
indistinguishable from a single-shot write for every consumer we have:
pyarrow.orc, the native reader, row-group seek, predicate pushdown, and
the footer statistics (re-merged at the wire level)."""

import datetime
import decimal
import struct

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.orc as po
import pytest

from orc_format_ray import stats as stats_mod
from orc_format_ray.orcfile import _stats_proto, write_orc
from orc_format_ray.orcmerge import (
    _stats_parse,
    _tail_raw,
    merge_orc_files,
    plan_compaction,
)
from orc_format_ray.orcread import _fields, _Source, read_orc_filtered, read_orc_native


def _part(n, seed):
    r = np.random.default_rng(seed)
    return pa.table(
        {
            "i": pa.array(r.integers(-1000, 1000, n), pa.int64()),
            "s": pa.array([None if x % 7 == 0 else f"doc-{x % 50}" for x in range(n)], pa.string()),
            "d": pa.array(r.normal(size=n)),
            "b": pa.array(r.integers(0, 2, n) == 1),
            "bin": pa.array([bytes([x % 256, (x * 7) % 256]) for x in range(n)], pa.binary()),
            "dec": pa.array(
                [decimal.Decimal(int(v)).scaleb(-2) for v in r.integers(-(10**6), 10**6, n)],
                pa.decimal128(12, 2),
            ),
            "ts": pa.array(
                [datetime.datetime(2023, 1, 1) + datetime.timedelta(seconds=int(v)) for v in r.integers(0, 10**7, n)],
                pa.timestamp("us"),
            ),
        }
    )


@pytest.fixture(scope="module")
def merged(tmp_path_factory):
    d = tmp_path_factory.mktemp("orcmerge")
    parts = [_part(2500, s) for s in (1, 2, 3)]
    paths = []
    for i, t in enumerate(parts):
        p = str(d / f"in_{i}.orc")
        write_orc(t, p, stripe_rows=1000)
        paths.append(p)
    out = str(d / "merged.orc")
    info = merge_orc_files(paths, out)
    return {"paths": paths, "out": out, "info": info, "expect": pa.concat_tables(parts).combine_chunks(), "dir": d}


def test_merge_roundtrip_both_readers(merged):
    expect = merged["expect"]
    assert merged["info"]["num_rows"] == expect.num_rows
    assert merged["info"]["stripes"] == 9  # 1000,1000,500 per input
    got = po.ORCFile(merged["out"]).read()
    assert got.cast(expect.schema).equals(expect)
    nat = read_orc_native(merged["out"])
    assert nat.cast(expect.schema).equals(expect)


def test_merge_file_stats_match_single_write(merged, tmp_path):
    """Merged footer stats byte-equal a single-shot write of the concat
    table — except the double sum, where addition order drifts the ulp."""
    single = str(tmp_path / "single.orc")
    write_orc(merged["expect"], single, stripe_rows=1000)
    with _Source(merged["out"]) as s:
        tm = _tail_raw(s)
    with _Source(single) as s:
        ts = _tail_raw(s)
    assert merged["info"]["has_file_stats"]
    assert len(tm["file_stats_raw"]) == len(ts["file_stats_raw"]) > 0
    for i, (a, b) in enumerate(zip(tm["file_stats_raw"], ts["file_stats_raw"])):
        if a == b:
            continue
        fa, fb = _fields(a), _fields(b)
        assert fa.keys() == fb.keys() and 3 in fa, f"col {i}: non-double stats differ"
        ga, gb = _fields(fa[3][0]), _fields(fb[3][0])
        assert ga[1] == gb[1] and ga[2] == gb[2], f"col {i}: double min/max differ"
        sa = struct.unpack("<d", ga[3][0])[0]
        sb = struct.unpack("<d", gb[3][0])[0]
        assert abs(sa - sb) <= 1e-9 * max(1.0, abs(sb)), f"col {i}: double sums diverge"
    # per-stripe Metadata: the inputs' StripeStatistics, verbatim, in order
    # (the single-shot write cuts different stripe boundaries, so compare
    # against the inputs rather than against it)
    inputs_ss = []
    for p in merged["paths"]:
        with _Source(p) as s:
            inputs_ss.extend(_tail_raw(s)["stripe_stats_raw"])
    assert tm["stripe_stats_raw"] == inputs_ss
    assert len(tm["stripe_stats_raw"]) == merged["info"]["stripes"]


def test_merge_row_group_seek_and_pushdown(merged):
    expect = merged["expect"]
    spans = []
    off = 0
    for _ in range(3):
        for n in (1000, 1000, 500):
            spans.append((off, n))
            off += n
    for g in (0, 2, 5, 8):
        t = read_orc_native(merged["out"], row_groups=[g])
        lo, n = spans[g]
        want = expect.slice(lo, n).combine_chunks()
        assert t.cast(want.schema).equals(want)
    tbl, info = read_orc_filtered(merged["out"], ("i", "==", 999))
    want_n = pc.sum(pc.equal(expect["i"], 999).cast(pa.int64())).as_py() or 0
    got_n = (pc.sum(pc.equal(tbl["i"], 999).cast(pa.int64())).as_py() or 0) if tbl.num_rows else 0
    assert got_n == want_n
    assert info["groups_read"] < info["groups_total"]  # index pruning survived the copy


def test_merge_mismatches_raise(merged, tmp_path):
    other_schema = str(tmp_path / "other.orc")
    write_orc(pa.table({"x": pa.array([1, 2], pa.int64())}), other_schema)
    with pytest.raises(ValueError, match="schema"):
        merge_orc_files([merged["paths"][0], other_schema], str(tmp_path / "o1.orc"))
    other_comp = str(tmp_path / "comp.orc")
    write_orc(_part(100, 9), other_comp, compression="snappy")
    with pytest.raises(ValueError, match="compression"):
        merge_orc_files([merged["paths"][0], other_comp], str(tmp_path / "o2.orc"))
    other_stride = str(tmp_path / "stride.orc")
    write_orc(_part(100, 9), other_stride, row_index_stride=5000)
    with pytest.raises(ValueError, match="rowIndexStride"):
        merge_orc_files([merged["paths"][0], other_stride], str(tmp_path / "o3.orc"))
    with pytest.raises(ValueError, match="at least one"):
        merge_orc_files([], str(tmp_path / "o4.orc"))


def test_merge_with_empty_input(merged, tmp_path):
    empty = str(tmp_path / "empty.orc")
    write_orc(_part(0, 0), empty)
    out = str(tmp_path / "with_empty.orc")
    info = merge_orc_files([merged["paths"][0], empty, merged["paths"][1]], out)
    assert info["num_rows"] == 5000 and info["stripes"] == 6
    expect = pa.concat_tables([_part(2500, 1), _part(2500, 2)]).combine_chunks()
    assert po.ORCFile(out).read().cast(expect.schema).equals(expect)


def test_merge_preserves_dictionary_and_bloom(tmp_path):
    """DICTIONARY_V2 and BLOOM_FILTER_UTF8 streams live inside the stripe
    byte range, so the copy keeps them working."""
    paths = []
    for i in range(2):
        r = np.random.default_rng(100 + i)
        t = pa.table(
            {
                "k": pa.array([f"key-{v}" for v in r.integers(0, 2000, 4000)], pa.string()),
                "cat": pa.array([f"c{v}" for v in r.integers(0, 5, 4000)], pa.string()),
            }
        )
        p = str(tmp_path / f"db_{i}.orc")
        write_orc(t, p, stripe_rows=1000, bloom_columns=["k"], dictionary_ratio=0.5)
        paths.append(p)
    out = str(tmp_path / "db_merged.orc")
    info = merge_orc_files(paths, out)
    assert info["stripes"] == 8
    got = po.ORCFile(out).read()
    assert got.num_rows == 8000
    # equality probe for an absent key: blooms must prune every group even
    # though min/max ("key-0".."key-999x") ranges cover the probe
    tbl, pinfo = read_orc_filtered(out, ("k", "==", "key-nonexistent-xyz"))
    assert tbl.num_rows == 0
    assert pinfo["groups_read"] == 0


def test_merge_foreign_pyarrow_files(tmp_path):
    """Inputs written by the Apache ORC C++ writer (pyarrow.orc): zstd with
    64 KiB compression blocks (not our 256 KiB). The merged tail must be
    framed within the inputs' declared block size, the writerVersion must
    carry forward, and the C++-emitted statistics must survive the wire
    parse + merge."""

    def mk(n, seed):
        r = np.random.default_rng(seed)
        return pa.table(
            {
                "a": pa.array(r.integers(0, 10**6, n), pa.int64()),
                "t": pa.array([None if i % 9 == 0 else f"text-{i % 100}" for i in range(n)], pa.string()),
                "v": pa.array(r.normal(size=n)),
            }
        )

    parts = [mk(5000, s) for s in (1, 2)]
    paths = []
    for i, t in enumerate(parts):
        p = str(tmp_path / f"f_{i}.orc")
        po.write_table(t, p, compression="zstd", compression_block_size=65536, stripe_size=64 * 1024)
        paths.append(p)
    out = str(tmp_path / "f_merged.orc")
    info = merge_orc_files(paths, out)
    expect = pa.concat_tables(parts)
    assert po.ORCFile(out).read().equals(expect)
    assert read_orc_native(out).cast(expect.schema).equals(expect)
    assert info["has_file_stats"]
    with _Source(out) as s:
        tm = _tail_raw(s)
    with _Source(paths[0]) as s:
        ti = _tail_raw(s)
    assert tm["block_size"] == ti["block_size"] == 65536
    assert tm["writer_version"] == ti["writer_version"]
    assert tm["file_version_raw"] == ti["file_version_raw"]


def test_orc_frame_respects_block_size():
    """Framed chunks must never decode larger than the declared
    compressionBlockSize (readers allocate buffers of exactly that size)."""
    from orc_format_ray.orcfile import _orc_frame

    data = bytes(range(256)) * 1024  # 256 KiB, incompressible-ish pattern
    framed = _orc_frame(data, "zstd", 3, block_size=65536)
    pos = 0
    n_chunks = 0
    while pos < len(framed):
        hdr = int.from_bytes(framed[pos : pos + 3], "little")
        ln, original = hdr >> 1, hdr & 1
        assert ln <= 65536  # compressed-or-original payload within a block
        if original:
            assert ln <= 65536
        pos += 3 + ln
        n_chunks += 1
    assert n_chunks == 4  # 256 KiB / 64 KiB


def test_merge_removes_tmp_on_error(merged, tmp_path, monkeypatch):
    import orc_format_ray.orcmerge as om

    def boom(tails):
        raise RuntimeError("injected")

    monkeypatch.setattr(om, "_merge_file_stats", boom)
    out = str(tmp_path / "fail.orc")
    with pytest.raises(RuntimeError, match="injected"):
        merge_orc_files(merged["paths"], out)
    import os

    assert not os.path.exists(out) and not os.path.exists(out + ".tmp")


def test_stats_parse_refuses_partial_sums():
    """A typed arm with min/max but no sum must be unmergeable for kinds
    where ColumnStats can't mark the sum unknown (double/string/binary) —
    a partially-merged sum would be an invented statistic."""
    from orc_format_ray.orcfile import Msg

    no_sum_double = Msg().varint(1, 5).msg(3, Msg().double(1, 0.0).double(2, 9.0)).varint(10, 0).tobytes()
    assert _stats_parse(no_sum_double, "DOUBLE", None) is None
    no_sum_string = Msg().varint(1, 5).msg(4, Msg().string(1, "a").string(2, "z")).varint(10, 0).tobytes()
    assert _stats_parse(no_sum_string, "STRING", None) is None
    no_arm_binary = Msg().varint(1, 5).varint(10, 0).tobytes()
    assert _stats_parse(no_arm_binary, "BINARY", None) is None
    # with zero values all three are mergeable empty partials
    for orc_kind in ("DOUBLE", "STRING", "BINARY"):
        got = _stats_parse(Msg().varint(1, 0).varint(10, 0).tobytes(), orc_kind, None)
        assert got is not None and got.num_present == 0
    # long CAN mark it: sum_overflowed survives (sticky through merge)
    no_sum_long = Msg().varint(1, 5).msg(2, Msg().svarint(1, -1).svarint(2, 4)).varint(10, 0).tobytes()
    got = _stats_parse(no_sum_long, "LONG", None)
    assert got is not None and got.sum is None and got.sum_overflowed


@pytest.mark.parametrize(
    "kind,orc_kind,cs",
    [
        ("long", "LONG", dict(min=-5, max=99, sum=1234)),
        ("long", "LONG", dict(min=-5, max=99, sum=None, sum_overflowed=True)),
        ("double", "DOUBLE", dict(min=-1.5, max=2.25, sum=10.75)),
        ("string", "STRING", dict(min="aa", max="zz", sum_lengths=400)),
        ("boolean", "BOOLEAN", dict(num_true=7, num_false=13)),
        ("binary", "BINARY", dict(sum_lengths=321)),
        ("timestamp", "TIMESTAMP", dict(min=-1000, max=123456789)),
        ("decimal", "DECIMAL", dict(min="-12345", max="67890", sum="55545")),
    ],
)
def test_stats_parse_roundtrip(kind, orc_kind, cs):
    s = stats_mod.ColumnStats(kind=kind, num_values=21, num_present=20, **cs)
    scale = 2 if kind == "decimal" else None
    buf = _stats_proto(s, scale).tobytes()
    back = _stats_parse(buf, orc_kind, scale)
    assert back is not None
    assert back.num_present == 20 and back.has_null
    assert back.min == s.min and back.max == s.max
    if kind == "long":
        if cs.get("sum_overflowed"):
            assert back.sum is None and back.sum_overflowed
        else:
            assert back.sum == s.sum
    elif kind == "double":
        assert back.sum == s.sum
    elif kind in ("string", "binary"):
        assert back.sum_lengths == s.sum_lengths
    elif kind == "boolean":
        assert back.num_true == 7 and back.num_false == 13
    elif kind == "decimal":
        assert back.sum == s.sum


def test_stats_parse_absent_arm_is_unmergeable():
    # values exist but the typed arm is missing: merging would invent min/max
    from orc_format_ray.orcfile import Msg

    buf = Msg().varint(1, 10).varint(10, 0).tobytes()
    assert _stats_parse(buf, "LONG", None) is None
    # no values at all: mergeable as an empty partial
    empty = Msg().varint(1, 0).varint(10, 0).tobytes()
    got = _stats_parse(empty, "LONG", None)
    assert got is not None and got.num_present == 0


def test_read_orc_statistics_api(merged, tmp_path):
    """Inspect-without-reading: footer stats by column name, for our own
    files AND foreign (pyarrow C++-written) ones; all-null columns report
    num_present=0; columns without parseable stats are omitted."""
    from orc_format_ray.orcmerge import read_orc_statistics

    st = read_orc_statistics(merged["out"])
    expect = merged["expect"]
    assert st["i"].min == pc.min(expect["i"]).as_py()
    assert st["i"].max == pc.max(expect["i"]).as_py()
    assert st["i"].sum == pc.sum(expect["i"]).as_py()
    assert st["i"].num_present == expect.num_rows
    assert st["s"].has_null and st["s"].min == pc.min(expect["s"]).as_py()
    assert st["b"].num_true == pc.sum(expect["b"].cast(pa.int64())).as_py()
    fpath = str(tmp_path / "foreign_stats.orc")
    po.write_table(pa.table({"x": pa.array([3, None, 1], pa.int64())}), fpath, compression="zstd")
    fst = read_orc_statistics(fpath)
    assert fst["x"].min == 1 and fst["x"].max == 3 and fst["x"].has_null


def test_plan_compaction_deterministic(tmp_path):
    for i in range(5):
        (tmp_path / f"f{i}.orc").write_bytes(b"x" * (100 * (i + 1)))
    paths = [str(tmp_path / f"f{i}.orc") for i in range(5)]
    g1 = plan_compaction(paths, 350)
    g2 = plan_compaction(list(reversed(paths)), 350)
    assert g1 == g2  # listing order doesn't matter
    assert [p for g in g1 for p in g] == sorted(paths)
    assert all(sum(1 for _ in g) >= 1 for g in g1)
    # an oversized file still lands in its own group
    big = plan_compaction(paths, 1)
    assert [len(g) for g in big] == [1] * 5


def test_compact_orc_dataset(ray_session, tmp_path):
    import ray

    from orc_format_ray.orcfile import read_orc_dataset, write_orc_dataset
    from orc_format_ray.orcmerge import compact_orc_dataset

    t = _part(6000, 42).set_column(0, "i", pa.array(np.random.default_rng(0).permutation(6000), pa.int64()))
    src = str(tmp_path / "many")
    ds = ray.data.from_arrow(t).repartition(6)
    write_orc_dataset(ds, src, stripe_rows=500).materialize()
    lineage = compact_orc_dataset(src, str(tmp_path / "compacted"), target_bytes=80 * 1024).materialize()
    rows = lineage.take_all()
    assert all(not r["skipped"] for r in rows)
    assert 1 < len(rows) < 6  # actually packed multiple inputs per part
    assert sum(r["num_rows"] for r in rows) == 6000
    back = read_orc_dataset(str(tmp_path / "compacted"), native=True).materialize()
    got = pa.concat_tables(ray.get(back.to_arrow_refs())).sort_by("i")  # "i" unique
    want = t.sort_by("i")
    assert got.cast(want.schema).select(["i", "s", "d"]).equals(want.select(["i", "s", "d"]))
    # resume: a second run over the same plan skips every finished part
    again = compact_orc_dataset(src, str(tmp_path / "compacted"), target_bytes=80 * 1024).materialize()
    skipped = again.take_all()
    assert all(r["skipped"] for r in skipped)
    assert sum(r["num_rows"] for r in skipped) == 6000  # real counts, not sentinels
    # guard: compacting a directory into itself would consume its own parts
    with pytest.raises(ValueError, match="out_dir"):
        compact_orc_dataset(src, src)
    # guard: a changed input set invalidates existing parts loudly
    # sorts first, so every group's membership shifts and part-00000 mismatches
    write_orc(_part(50, 77), str(tmp_path / "many" / "aaa-extra.orc"))
    with pytest.raises(Exception, match="input set changed"):
        compact_orc_dataset(src, str(tmp_path / "compacted"), target_bytes=80 * 1024).materialize()


def test_compact_orc_dataset_schema_drift(ray_session, tmp_path):
    """A drifted directory (narrow int key, missing column, reorder) refuses
    raw copy by default and compacts via evolve + re-encode on request,
    producing a single-schema output with exactly the input rows."""
    import glob

    from orc_format_ray.orcmerge import compact_orc_dataset

    d = tmp_path / "drifted"
    d.mkdir()
    g1 = pa.table({"id": pa.array([1, 2], pa.int32()), "name": pa.array(["a", "b"])})
    g2 = pa.table({"name": pa.array(["c"]), "id": pa.array([3], pa.int64()), "score": pa.array([1.5])})
    write_orc(g1, str(d / "gen1.orc"))
    write_orc(g2, str(d / "gen2.orc"))
    with pytest.raises(ValueError, match="drift"):
        compact_orc_dataset(str(d), str(tmp_path / "out_err"))
    lineage = compact_orc_dataset(str(d), str(tmp_path / "out_re"), on_schema_drift="reencode").materialize()
    rows = lineage.take_all()
    assert all(r["reencoded"] for r in rows) and sum(r["num_rows"] for r in rows) == 3
    (part,) = glob.glob(str(tmp_path / "out_re" / "*.orc"))
    got = po.ORCFile(part).read().sort_by("id")
    assert got.column_names == ["id", "name", "score"]
    assert got["id"].type == pa.int64()
    assert got["id"].to_pylist() == [1, 2, 3]
    assert got["score"].to_pylist() == [None, None, 1.5]
    # resume applies to re-encoded parts too
    again = compact_orc_dataset(str(d), str(tmp_path / "out_re"), on_schema_drift="reencode").materialize()
    assert all(r["skipped"] for r in again.take_all())


def test_sink_bloom_columns_survive_compaction(ray_session, tmp_path):
    """write_orc_dataset(bloom_columns=...) -> compact -> equality pushdown
    still prunes on the compacted parts (bloom streams ride the stripe copy)."""
    import glob

    import ray

    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcmerge import compact_orc_dataset

    r = np.random.default_rng(7)
    t = pa.table({"k": pa.array([f"key-{v}" for v in r.integers(0, 5000, 8000)], pa.string())})
    src = str(tmp_path / "bloom_many")
    write_orc_dataset(ray.data.from_arrow(t).repartition(4), src, stripe_rows=1000, bloom_columns=["k"]).materialize()
    compact_orc_dataset(src, str(tmp_path / "bloom_compacted"), target_bytes=1 << 30).materialize()
    (part,) = glob.glob(str(tmp_path / "bloom_compacted" / "*.orc"))
    tbl, info = read_orc_filtered(part, ("k", "==", "key-definitely-absent"))
    assert tbl.num_rows == 0
    assert info["groups_read"] == 0  # every group bloom-pruned


# ------------------------------------------------------------- column rename


def test_rename_orc_columns_zero_decode(tmp_path, ray_session):
    import numpy as np

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import read_orc_statistics, rename_orc_columns
    from orc_format_ray.orcread import read_orc_filtered, read_orc_native

    t = pa.table(
        {
            "a": pa.array(np.arange(100), pa.int64()),
            "b": pa.array([f"s{i}" for i in range(100)]),
        }
    )
    p = str(tmp_path / "f.orc")
    write_orc(t, p, stripe_rows=40, row_index_stride=20)
    res = rename_orc_columns(p, p, {"a": "key"})
    assert res["renamed"] == ["a"] and res["num_rows"] == 100
    back = read_orc_native(p)
    assert back.column_names == ["key", "b"]
    assert back["key"].to_pylist() == list(range(100))
    # positional stats + ROW_INDEX still work under the new name
    st = read_orc_statistics(p)
    assert st["key"].min == 0 and st["key"].max == 99
    out, counters = read_orc_filtered(p, ("key", ">=", 90))
    assert out.num_rows == 10 and counters["groups_read"] < counters["groups_total"]
    # pyarrow C++ conformance
    import pyarrow.orc as po

    f = po.ORCFile(p)
    assert f.schema.names == ["key", "b"] and f.read().num_rows == 100


def test_rename_orc_columns_guards(tmp_path, ray_session):
    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcmerge import rename_orc_columns

    t = pa.table({"a": pa.array([1], pa.int64()), "b": pa.array([2], pa.int64())})
    p = str(tmp_path / "f.orc")
    write_orc(t, p)
    with pytest.raises(ValueError, match="collide"):
        rename_orc_columns(p, p, {"a": "b"})
    with pytest.raises(ValueError, match="none of"):
        rename_orc_columns(p, p, {"zzz": "y"})
    with pytest.raises(ValueError, match="top-level"):
        rename_orc_columns(p, p, {"a.x": "y"})
    # idempotent: applying {a -> c} twice converges
    rename_orc_columns(p, p, {"a": "c"})
    res = rename_orc_columns(p, p, {"a": "c"})
    assert res["renamed"] == []


def test_rename_lake_columns_rejects_partition_cols(tmp_path, ray_session):
    import pandas as pd
    import ray.data

    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcmerge import rename_lake_columns

    df = pd.DataFrame({"k": [1, 2, 3, 4], "g": ["a", "a", "b", "b"]})
    lake = str(tmp_path / "plake")
    write_orc_dataset(ray.data.from_pandas(df), lake, partition_by=["g"]).materialize()
    with pytest.raises(ValueError, match="partition columns"):
        rename_lake_columns(lake, {"g": "grp"})
    out = rename_lake_columns(lake, {"k": "key"})
    assert out["n_renamed"] == out["n_files"]
