"""Native ORC reader conformance: files written by the Apache ORC C++ writer
(pyarrow) — DIRECT_V2/DICTIONARY_V2 encodings — must decode exactly with this
repo's own proto parser + codec kernels, and our own writer's files must
round-trip through the native reader without pyarrow.orc involved."""

from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.orc as po
import pytest

from orc_format_ray import orcfile
from orc_format_ray.orcread import read_orc_native


def _cmp(path, exp=None):
    got = read_orc_native(path)
    exp = exp if exp is not None else po.read_table(path)
    assert got.num_rows == exp.num_rows
    for c in exp.schema.names:
        g, e = got[c].combine_chunks(), exp[c].combine_chunks()
        if g.type != e.type:
            g = g.cast(e.type)
        assert g.equals(e), c
    return got


_NULLS_TBL = pa.table(
    {
        "v": pa.array([None if i % 11 == 0 else i for i in range(30000)], type=pa.int64()),
        "s": pa.array([None if i % 7 == 0 else f"k{i % 37}" for i in range(30000)]),
        "f": pa.array([None if i % 5 == 0 else i / 7 for i in range(30000)], type=pa.float64()),
        "b": pa.array([None if i % 13 == 0 else bool(i & 1) for i in range(30000)]),
        "lst": pa.array([None if i % 17 == 0 else list(range(i % 4)) for i in range(30000)], type=pa.list_(pa.int32())),
        "st": pa.array(
            [None if i % 19 == 0 else {"x": i, "y": f"s{i % 5}"} for i in range(30000)],
            type=pa.struct([("x", pa.int64()), ("y", pa.string())]),
        ),
    }
)


@pytest.mark.parametrize("comp", ["uncompressed", "zlib", "snappy", "zstd", "lz4"])
def test_native_reads_orc_cpp_files(tmp_path, comp):
    """The conformance anchor: Apache C++ writes RLEv2 + dictionary encodings;
    our kernels must decode them (multi-stripe via tiny stripe_size)."""
    path = str(tmp_path / f"pw_{comp}.orc")
    po.write_table(_NULLS_TBL, path, compression=comp, stripe_size=64 * 1024)
    _cmp(path)


def test_native_reads_cpp_maps_and_timestamps(tmp_path):
    p1 = str(tmp_path / "m.orc")
    po.write_table(
        pa.table(
            {
                "m": pa.array(
                    [None if i % 6 == 0 else [(f"k{j}", i + j) for j in range(i % 3)] for i in range(5000)],
                    type=pa.map_(pa.string(), pa.int64()),
                )
            }
        ),
        p1,
        compression="zstd",
    )
    _cmp(p1)
    p2 = str(tmp_path / "t.orc")
    po.write_table(
        pa.table({"ts": pa.array([0, 1_500_000, None, -5_000_000, 1_700_000_000_000_000], type=pa.timestamp("us"))}),
        p2,
    )
    _cmp(p2)


@pytest.mark.parametrize("comp", ["none", "zlib", "zstd", "snappy"])
def test_native_reads_own_writer(tmp_path, comp):
    mine = pa.table(
        {
            "i32": pa.array([None if i % 9 == 0 else i for i in range(10000)], type=pa.int32()),
            "dec": pa.array([None if i % 4 == 0 else Decimal(i).scaleb(-2) for i in range(10000)], type=pa.decimal128(18, 2)),
            "dt": pa.array([None if i % 8 == 0 else i - 5000 for i in range(10000)], type=pa.date32()),
            "bin": pa.array([None if i % 10 == 0 else bytes([i % 256]) * (i % 5) for i in range(10000)], type=pa.binary()),
        }
    )
    path = str(tmp_path / f"own_{comp}.orc")
    orcfile.write_orc(mine, path, compression=comp, stripe_rows=3000)
    _cmp(path, exp=mine)


def test_native_projection_and_tokens(tmp_path):
    from orc_format_ray.pipelines import tokens as tok

    tbl = tok.synthetic_batch(800, seed=6, shard=0)
    path = str(tmp_path / "tok.orc")
    orcfile.write_orc(tbl, path, compression="zstd", stripe_rows=300)
    got = _cmp(path, exp=tbl)
    proj = read_orc_native(path, columns=["source", "n_tok"])
    assert set(proj.schema.names) == {"source", "n_tok"}  # file order, like pyarrow
    assert proj["n_tok"].combine_chunks().cast(pa.int32()).equals(tbl["n_tok"].combine_chunks())


def test_lz4_block_decoder_matches_pyarrow_compressor():
    """The pure-Python LZ4 block decoder round-trips pyarrow's lz4_raw
    compressor output, incl. overlapping matches (short-period runs)."""
    from orc_format_ray.orcread import _lz4_block_decompress

    cases = [
        b"",
        b"x",
        b"hello world " * 500,
        bytes(range(256)) * 20,
        b"a" * 10000,  # period-1 overlap
        b"ab" * 5000,  # period-2 overlap
        np.random.default_rng(1).integers(0, 256, 4096, dtype=np.uint8).tobytes(),  # incompressible
    ]
    for raw in cases:
        comp = pa.Codec("lz4_raw").compress(raw).to_pybytes()
        assert _lz4_block_decompress(comp) == raw, len(raw)


_LZO_EOF = bytes([17, 0, 0])  # M4 opcode, length 3, distance 16384 exactly


def test_lzo1x_decoder_hand_vectors():
    """LZO1X conformance against HAND-COMPUTED vectors for every instruction
    class of the public bitstream spec (LZO docs / kernel lzo.rst) — no
    compressor exists in this sandbox, so each stream is assembled byte by
    byte and the expected output derived manually from the spec."""
    from orc_format_ray.orcread import _lzo1x_decompress

    d = _lzo1x_decompress
    # 1. first-byte literal run (fb = len+17), EOF marker
    assert d(bytes([30]) + b"hello world!!" + _LZO_EOF) == b"hello world!!"
    # 2. fb=21 -> 4 literals, then M2 len3 dist1 (t=64, H=0): tiles "d"
    assert d(bytes([21]) + b"abcd" + bytes([64, 0]) + _LZO_EOF) == b"abcdddd"
    # 3. M2 len4 dist4 with S=2 trailing literals, then state-2 opcode<16
    #    (2-byte match dist 2): t=110 = 0b01101110 -> len 4, D=3, S=2
    s = bytes([21]) + b"abcd" + bytes([110, 0]) + b"xy" + bytes([4, 0]) + _LZO_EOF
    assert d(s) == b"abcdabcdxyxy"
    # 4. long literal run at state 0 (fb<18): len 3+10=13, then M3 len3
    #    dist13 (le16 = 12<<2 = 48)
    lits = b"0123456789abc"
    assert d(bytes([10]) + lits + bytes([33, 48, 0]) + _LZO_EOF) == lits + b"012"
    # 5. literal-run length extension: L=0, one zero ext byte, nonzero 5
    #    -> 3 + 15 + 255 + 5 = 278 literals
    big = bytes(i % 251 for i in range(278))
    assert d(bytes([0, 0, 5]) + big + _LZO_EOF) == big
    # 6. M3 length extension: t=32 (L=0), ext nonzero 4 -> len 31+4+2=37,
    #    dist 40 (le16 = 39<<2 = 156)
    base = bytes(i % 97 for i in range(40))
    s = bytes([40 + 17]) + base[:40] + bytes([32, 4, 156, 0]) + _LZO_EOF
    assert d(s) == base + base[:37]
    # 7. M4 far match: 17000 literals via one extended run (15+255*66+152),
    #    then len-3 match at dist 16385 (t=17, le16 = 1<<2 = 4)
    pay = bytes(i % 253 for i in range(17000))
    s = bytes([0] + [0] * 66 + [152]) + pay + bytes([17, 4, 0]) + _LZO_EOF
    assert d(s) == pay + pay[17000 - 16385 : 17000 - 16385 + 3]
    # 8. overlap tiling: 1 literal then M2 len8 dist1 (t=224)
    assert d(bytes([18]) + b"a" + bytes([224, 0]) + _LZO_EOF) == b"a" * 9
    # 9. state-4 opcode<16: 3-byte match at 2049+ needs >2kB of history
    hist = bytes(i % 199 for i in range(2060))
    #    run: 3+15+255*8+2 = 2060 literals; then t=0 (state 4): dist =
    #    (0>>2)+(H=0)<<2+2049 = 2049, len 3
    s = bytes([0] + [0] * 8 + [2]) + hist + bytes([0, 0]) + _LZO_EOF
    assert d(s) == hist + hist[2060 - 2049 : 2060 - 2049 + 3]
    # 10. truncated stream raises
    with pytest.raises(Exception):
        d(bytes([30]) + b"short")
    # 11. empty stream
    assert d(b"") == b""


def test_lzo1x_decoder_instruction_fuzz():
    """Executable-spec fuzz: compose random instruction sequences with an
    in-test emitter that writes bytes AND tracks expected output straight
    from the spec rules — exercises state transitions (S-bit literal carry
    into opcode<16 interpretation) the fixed vectors can't enumerate."""
    from orc_format_ray.orcread import _lzo1x_decompress

    rng = np.random.default_rng(42)
    for trial in range(30):
        stream = bytearray()
        exp = bytearray()
        payload = rng.integers(0, 256, 4000, dtype=np.uint8).tobytes()
        pp = 0
        # opening literal run via first byte (5..238 literals, state=4)
        lit = int(rng.integers(5, 200))
        stream.append(lit + 17)
        stream += payload[pp : pp + lit]
        exp += payload[pp : pp + lit]
        pp += lit
        for _ in range(int(rng.integers(3, 12))):
            kind = rng.integers(0, 3)
            s_bits = int(rng.integers(0, 4))
            if kind == 0:  # M2: len 3..8, dist 1..2048, S in opcode
                length = int(rng.integers(3, 9))
                dist = int(rng.integers(1, min(2048, len(exp)) + 1))
                t = ((length - 1) << 5) | (((dist - 1) & 7) << 2) | s_bits
                stream += bytes([t, (dist - 1) >> 3])
            elif kind == 1:  # M3: len 3..33 (l>=1 direct), dist 1..16384
                length = int(rng.integers(3, 34))
                dist = int(rng.integers(1, min(16384, len(exp)) + 1))
                stream.append(32 | (length - 2))
                le16 = ((dist - 1) << 2) | s_bits
                stream += bytes([le16 & 255, le16 >> 8])
            else:  # M3 with length extension: l==0, ext byte -> len 33+x
                length = 33 + int(rng.integers(1, 20))
                dist = int(rng.integers(1, min(16384, len(exp)) + 1))
                stream += bytes([32, length - 2 - 31])
                le16 = ((dist - 1) << 2) | s_bits
                stream += bytes([le16 & 255, le16 >> 8])
            # expected match bytes (with overlap tiling semantics)
            start = len(exp) - dist
            for i in range(length):
                exp.append(exp[start + i])
            # S trailing literals
            stream += payload[pp : pp + s_bits]
            exp += payload[pp : pp + s_bits]
            pp += s_bits
            if s_bits in (1, 2, 3) and rng.integers(0, 2):
                # exercise the state-S 2-byte match (opcode<16)
                dist = int(rng.integers(1, min(1024, len(exp)) + 1))
                t = (((dist - 1) & 3) << 2) | 0
                stream += bytes([t, (dist - 1) >> 2])
                start = len(exp) - dist
                exp.append(exp[start])
                exp.append(exp[start + 1])  # valid at dist 1 after 1st append
        stream += bytes([17, 0, 0])
        got = _lzo1x_decompress(bytes(stream))
        assert got == bytes(exp), f"trial {trial}: {len(got)} vs {len(exp)}"


def test_row_group_seek_exact_and_sliced(tmp_path):
    """Every row group of a multi-stripe row-indexed file decodes exactly,
    via ROW_INDEX positions, without deframing the rest of the stripe."""
    from orc_format_ray import orcread

    tbl = pa.table(
        {
            "v": pa.array([None if i % 11 == 0 else i for i in range(53000)], type=pa.int64()),
            "s": pa.array([None if i % 7 == 0 else f"k{i % 37}x{i % 101}" for i in range(53000)]),
            "lst": pa.array([None if i % 17 == 0 else list(range(i % 4)) for i in range(53000)], type=pa.list_(pa.int32())),
        }
    )
    path = str(tmp_path / "rg.orc")
    orcfile.write_orc(tbl, path, compression="zstd", stripe_rows=25000)  # stripes 25k/25k/3k
    # global groups: (start,rows) per stride-10k group across stripes
    groups = [(0, 10000), (10000, 10000), (20000, 5000), (25000, 10000), (35000, 10000), (45000, 5000), (50000, 3000)]
    for rg, (lo, n) in enumerate(groups):
        got = read_orc_native(path, row_groups=[rg])
        exp = tbl.slice(lo, n)
        assert got.num_rows == n
        for c in tbl.schema.names:
            g = got[c].combine_chunks()
            e = exp[c].combine_chunks()
            if g.type != e.type:
                g = g.cast(e.type)
            assert g.equals(e), (rg, c)
    # cross-stripe selection + projection
    got = read_orc_native(path, columns=["v"], row_groups=[2, 3])
    assert got.schema.names == ["v"]
    assert got["v"].combine_chunks().equals(tbl.slice(20000, 15000)["v"].combine_chunks())

    # decompression accounting: one group must deframe a small slice only
    calls = {"full": 0, "one": 0}
    orig = orcread._decompress_block

    def counting(kind, block):
        calls[key] += len(block)
        return orig(kind, block)

    orcread._decompress_block = counting
    try:
        key = "full"
        read_orc_native(path)
        key = "one"
        read_orc_native(path, row_groups=[4])
    finally:
        orcread._decompress_block = orig
    assert calls["one"] < calls["full"] / 4, calls


def test_row_group_seek_requires_index(tmp_path):
    tbl = pa.table({"v": pa.array(range(100), type=pa.int64())})
    noidx = str(tmp_path / "noidx.orc")
    orcfile.write_orc(tbl, noidx, row_index_stride=0)
    assert read_orc_native(noidx)["v"].to_pylist() == list(range(100))  # plain read unaffected
    with pytest.raises(ValueError):
        read_orc_native(noidx, row_groups=[0])
    withidx = str(tmp_path / "idx.orc")
    orcfile.write_orc(tbl, withidx)
    with pytest.raises(IndexError):
        read_orc_native(withidx, row_groups=[5])


def test_predicate_pushdown_prunes_row_groups(tmp_path):
    """read_orc_filtered consults ROW_INDEX statistics and never reads row
    groups whose [min,max] cannot match; all-null groups are pruned too."""
    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    tbl = pa.table(
        {
            "v": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"k{i // 1000:03d}" for i in range(n)]),
            "f": pa.array([i / 3 for i in range(n)], type=pa.float64()),
            "nul": pa.array([None if i < 25000 else i for i in range(n)], type=pa.int64()),
        }
    )
    path = str(tmp_path / "pred.orc")
    orcfile.write_orc(tbl, path, compression="zstd", stripe_rows=20000)  # groups: 2+2+1

    t, st = read_orc_filtered(path, ("v", ">=", 45000))
    assert t["v"].to_pylist() == list(range(45000, 50000))
    assert st == {"groups_total": 5, "groups_read": 1}
    t, st = read_orc_filtered(path, ("v", "==", 12345), columns=["s"])
    assert t.schema.names == ["s"] and t["s"].to_pylist() == ["k012"] and st["groups_read"] == 1
    t, st = read_orc_filtered(path, ("s", "==", "k033"))
    assert t.num_rows == 1000 and st["groups_read"] == 1
    t, st = read_orc_filtered(path, ("f", "<", 10.0))
    assert t.num_rows == 30 and st["groups_read"] == 1
    t, st = read_orc_filtered(path, ("nul", "<", 100))
    assert t.num_rows == 0 and st["groups_read"] == 0  # all-null + min>=25000 groups pruned
    t, st = read_orc_filtered(path, ("v", ">", 10**9))
    assert t.num_rows == 0 and st["groups_read"] == 0

    # stride=0 file: falls back to scan+filter, same answer
    noidx = str(tmp_path / "pred0.orc")
    orcfile.write_orc(tbl, noidx, compression="zstd", row_index_stride=0)
    t, _ = read_orc_filtered(noidx, ("v", ">=", 45000))
    assert t["v"].to_pylist() == list(range(45000, 50000))


def test_predicate_pushdown_conjunction(tmp_path):
    """A list of predicates ANDs: a group survives only when every predicate
    may match — range pruning intersects, and an == consults blooms."""
    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    tbl = pa.table(
        {
            "v": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"k{i // 1000:03d}" for i in range(n)]),
        }
    )
    path = str(tmp_path / "conj.orc")
    orcfile.write_orc(tbl, path, stripe_rows=20000, bloom_columns=["s"])  # 5 groups

    # range AND range: [12000, 13000) lives in one group
    t, st = read_orc_filtered(path, [("v", ">=", 12000), ("v", "<", 13000)])
    assert t["v"].to_pylist() == list(range(12000, 13000))
    assert st == {"groups_total": 5, "groups_read": 1}
    # contradictory ranges prune everything
    t, st = read_orc_filtered(path, [("v", ">=", 30000), ("v", "<", 1000)])
    assert t.num_rows == 0 and st["groups_read"] == 0
    # range AND bloom equality: key absent from the range's group
    t, st = read_orc_filtered(path, [("v", ">=", 0), ("s", "==", "zzz")])
    assert t.num_rows == 0 and st["groups_read"] == 0  # bloom prunes
    # mixed: exact answer + projection appends then drops pred columns
    t, st = read_orc_filtered(path, [("v", ">=", 12000), ("v", "<", 13000), ("s", "==", "k012")])
    assert t.num_rows == 1000 and st["groups_read"] == 1
    t, _ = read_orc_filtered(path, [("v", ">=", 12000), ("s", "==", "k012")], columns=["s"])
    assert t.column_names == ["s"] and t.num_rows == 1000
    # single-tuple form still works (back-compat)
    t, _ = read_orc_filtered(path, ("v", "==", 7))
    assert t["v"].to_pylist() == [7]
    with pytest.raises(ValueError, match="at least one"):
        read_orc_filtered(path, [])


def test_predicate_pushdown_disjunction(tmp_path):
    """DNF (OR of ANDs, VERDICT r3 #5): a group survives when SOME conjunct
    may fully match; the exact post-filter ORs the conjunct masks; bloom
    probes still apply inside each conjunct."""
    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    tbl = pa.table(
        {
            "v": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"k{i // 1000:03d}" for i in range(n)]),
        }
    )
    path = str(tmp_path / "dnf.orc")
    orcfile.write_orc(tbl, path, stripe_rows=20000, bloom_columns=["s"])  # 5 groups of 10k

    # two disjoint ranges in different groups: both groups read, union exact
    t, st = read_orc_filtered(path, [[("v", ">=", 1000), ("v", "<", 2000)],
                                     [("v", ">=", 41000), ("v", "<", 42000)]])
    assert sorted(t["v"].to_pylist()) == list(range(1000, 2000)) + list(range(41000, 42000))
    assert st == {"groups_total": 5, "groups_read": 2}
    # OR with an always-false conjunct degrades to the true side only
    t, st = read_orc_filtered(path, [[("v", ">", 10**9)], [("v", "<", 500)]])
    assert t["v"].to_pylist() == list(range(500)) and st["groups_read"] == 1
    # bloom prunes one side; range keeps the other
    t, st = read_orc_filtered(path, [[("s", "==", "zzz")], [("v", "==", 12345)]])
    assert t["v"].to_pylist() == [12345] and st["groups_read"] == 1
    # a conjunct of range+equality inside the OR stays exact
    t, _ = read_orc_filtered(path, [[("v", ">=", 12000), ("s", "==", "k012")],
                                    [("s", "in", ["k030", "k031"])]], columns=["s"])
    assert t.column_names == ["s"] and t.num_rows == 3000
    # degenerate one-conjunct DNF == plain conjunction
    a, _ = read_orc_filtered(path, [[("v", ">=", 12000), ("v", "<", 13000)]])
    b, _ = read_orc_filtered(path, [("v", ">=", 12000), ("v", "<", 13000)])
    assert a.equals(b)
    with pytest.raises(ValueError, match="mixes"):
        read_orc_filtered(path, [("v", ">=", 0), [("v", "<", 10)]])
    with pytest.raises(ValueError, match="empty conjunct"):
        read_orc_filtered(path, [[("v", ">=", 0)], []])


def test_predicate_pushdown_timestamp_range(tmp_path):
    """Timestamp predicates prune via the millis index stats (floor-widened
    by 1 ms so truncation can never drop real rows); datetime and
    np.datetime64 literals both work, incl. tz-aware vs TIMESTAMP_INSTANT."""
    import datetime as dt

    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    base = 1_700_000_000_000_000  # epoch us
    us = base + np.arange(n, dtype=np.int64) * 1_000_500  # ~1.0005 s apart
    tbl = pa.table({"ts": pa.array(us, pa.timestamp("us")), "v": pa.array(np.arange(n))})
    path = str(tmp_path / "ts.orc")
    orcfile.write_orc(tbl, path, stripe_rows=20000)  # 5 groups of 10k

    lo = dt.datetime.utcfromtimestamp((base + 12_000 * 1_000_500) / 1e6)
    hi = dt.datetime.utcfromtimestamp((base + 13_000 * 1_000_500) / 1e6)
    t, st = read_orc_filtered(path, [("ts", ">=", lo), ("ts", "<", hi)])
    assert t.num_rows == 1000 and t["v"].to_pylist() == list(range(12000, 13000))
    assert st == {"groups_total": 5, "groups_read": 1}
    # np.datetime64 literal, equality on an exact value
    t, st = read_orc_filtered(path, ("ts", "==", np.datetime64(int(us[34567]), "us")))
    assert t["v"].to_pylist() == [34567] and st["groups_read"] == 1
    # out-of-range prunes everything
    t, st = read_orc_filtered(path, ("ts", ">", np.datetime64(int(us[-1]) + 10**9, "us")))
    assert t.num_rows == 0 and st["groups_read"] == 0
    # unrecognized literal type: no pruning, exact filter still runs
    t, st = read_orc_filtered(path, ("v", ">=", 0), columns=["v"])  # control
    assert st["groups_read"] == 5

    # tz-aware column (TIMESTAMP_INSTANT) with a tz-aware literal
    tz_tbl = pa.table({"ts": pa.array(us, pa.timestamp("us", tz="UTC")), "v": pa.array(np.arange(n))})
    path2 = str(tmp_path / "ts_inst.orc")
    orcfile.write_orc(tz_tbl, path2, stripe_rows=20000)
    lo_utc = dt.datetime.fromtimestamp((base + 40_000 * 1_000_500) / 1e6, tz=dt.timezone.utc)
    t, st = read_orc_filtered(path2, ("ts", ">=", lo_utc))
    assert t.num_rows == 10000 and st["groups_read"] == 1


def test_predicate_pushdown_boolean_buckets(tmp_path):
    """BOOLEAN groups prune via trueCount: an ==True predicate skips
    all-False groups (and vice versa); all-null groups never match."""
    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    flags = np.zeros(n, dtype=bool)
    flags[20000:30000] = True  # group 2 all-True; groups 0,1,3,4 all-False
    col = pa.array(flags).to_pylist()
    col[40000:] = [None] * 10000  # group 4 all-null
    tbl = pa.table({"flag": pa.array(col, pa.bool_()), "v": pa.array(np.arange(n))})
    path = str(tmp_path / "b.orc")
    orcfile.write_orc(tbl, path, stripe_rows=25000)  # 5 groups? 10k stride -> 2+2+... check totals

    # 25k-row stripes at stride 10k -> 6 groups with boundaries at 25k/35k/45k:
    # all-False, all-False, all-True, mixed, False+null, all-null
    t, st = read_orc_filtered(path, ("flag", "==", True))
    assert t["v"].to_pylist() == list(range(20000, 30000))
    assert st == {"groups_total": 6, "groups_read": 2}
    t, st = read_orc_filtered(path, ("flag", "==", False))
    assert t.num_rows == 30000 and st["groups_read"] == 4, st
    t, st = read_orc_filtered(path, [("flag", "==", True), ("v", ">=", 40000)])
    assert t.num_rows == 0 and st["groups_read"] == 0


def test_predicate_pushdown_date_and_decimal(tmp_path):
    """DATE predicates accept datetime.date literals (exact epoch-days
    conversion); DECIMAL predicates prune via the display-string stats with
    Decimal/int literals; float decimal literals never prune but still
    exact-filter."""
    import datetime as dt
    from decimal import Decimal

    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    days = 19000 + np.arange(n, dtype=np.int32) // 10  # ~5000 distinct days
    dec = [Decimal(i).scaleb(-2) for i in range(n)]  # 0.00 .. 499.99
    tbl = pa.table(
        {
            "d": pa.array(days, pa.date32()),
            "x": pa.array(dec, pa.decimal128(12, 2)),
            "v": pa.array(np.arange(n)),
        }
    )
    path = str(tmp_path / "dd.orc")
    orcfile.write_orc(tbl, path, stripe_rows=20000)  # 5 groups of 10k

    lo = dt.date(1970, 1, 1) + dt.timedelta(days=19000 + 1200)
    hi = dt.date(1970, 1, 1) + dt.timedelta(days=19000 + 1300)
    t, st = read_orc_filtered(path, [("d", ">=", lo), ("d", "<", hi)])
    assert t.num_rows == 1000 and st == {"groups_total": 5, "groups_read": 1}
    assert t["v"].to_pylist() == list(range(12000, 13000))
    # int literal (epoch days) still works on DATE
    t, st = read_orc_filtered(path, ("d", "==", 19000))
    assert t.num_rows == 10 and st["groups_read"] == 1

    t, st = read_orc_filtered(path, [("x", ">=", Decimal("123.00")), ("x", "<", Decimal("124.00"))])
    assert t.num_rows == 100 and st["groups_read"] == 1
    assert t["v"].to_pylist() == list(range(12300, 12400))
    t, st = read_orc_filtered(path, ("x", ">", Decimal("999999")))
    assert t.num_rows == 0 and st["groups_read"] == 0
    # int literal promotes to Decimal for pruning
    t, st = read_orc_filtered(path, ("x", "<", 1))
    assert t.num_rows == 100 and st["groups_read"] == 1


def test_predicate_pushdown_in_list(tmp_path):
    """IN-list pushdown: a group survives when SOME member may match; bloom
    probes apply per member; composes inside conjunctions."""
    from orc_format_ray.orcread import read_orc_filtered

    n = 50000
    tbl = pa.table(
        {
            "v": pa.array(range(n), type=pa.int64()),
            "s": pa.array([f"k{i // 1000:03d}" for i in range(n)]),
        }
    )
    path = str(tmp_path / "inlist.orc")
    orcfile.write_orc(tbl, path, stripe_rows=20000, bloom_columns=["s"])  # 5 groups

    t, st = read_orc_filtered(path, ("v", "in", [5, 25000, 25001]))
    assert t["v"].to_pylist() == [5, 25000, 25001]
    assert st == {"groups_total": 5, "groups_read": 2}  # groups 0 and 2 only
    t, st = read_orc_filtered(path, ("s", "in", ["zzz", "yyy"]))
    assert t.num_rows == 0 and st["groups_read"] == 0  # all members bloom-absent
    t, st = read_orc_filtered(path, ("s", "in", ["k001", "zzz"]))
    assert t.num_rows == 1000 and st["groups_read"] == 1
    t, st = read_orc_filtered(path, [("v", ">=", 20000), ("s", "in", ["k001", "k021"])])
    assert t.num_rows == 1000 and t["s"][0].as_py() == "k021" and st["groups_read"] == 1
    t, _ = read_orc_filtered(path, ("v", "in", [7, 9]), columns=["s"])
    assert t.column_names == ["s"] and t.num_rows == 2
    with pytest.raises(ValueError, match="empty IN"):
        read_orc_filtered(path, ("v", "in", []))


def test_predicate_pushdown_foreign_file_stripe_fallback(tmp_path):
    """Pushdown on an Apache-C++-written file: its row groups start mid-RLE-
    run (group seek impossible), so pruning falls back to STRIPE granularity
    — still correct, still skipping most of the decompression."""
    from orc_format_ray import orcread
    from orc_format_ray.orcread import read_orc_filtered

    n = 120000
    rng2 = np.random.default_rng(4)
    tbl = pa.table(
        {
            "v": pa.array(range(n), type=pa.int64()),
            "s": pa.array(["".join(chr(97 + c) for c in rng2.integers(0, 26, 40)) for _ in range(n)]),
        }
    )
    path = str(tmp_path / "cpp_pred.orc")
    po.write_table(tbl, path, compression="zstd", stripe_size=512 * 1024)
    assert po.ORCFile(path).nstripes >= 3

    calls = {"x": 0}
    orig = orcread._decompress_block

    def counting(kind, block):
        calls["x"] += len(block)
        return orig(kind, block)

    orcread._decompress_block = counting
    try:
        t, st = read_orc_filtered(path, ("v", ">=", n - 5000))
        pruned = calls["x"]
        calls["x"] = 0
        orcread.read_orc_native(path)
        full = calls["x"]
    finally:
        orcread._decompress_block = orig
    assert t["v"].to_pylist() == list(range(n - 5000, n))
    assert st["groups_read"] < st["groups_total"]
    assert pruned < full / 3, (pruned, full)


def test_native_reads_cpp_file_with_bloom_filters(tmp_path):
    """Files carrying BLOOM_FILTER (kind 7/8) streams must read correctly —
    the stream whitelist (orcread kinds 0,1,2,3,5) must neither deframe nor
    alias them into the consumed-stream dict."""
    path = str(tmp_path / "bloom.orc")
    po.write_table(_NULLS_TBL, path, compression="zstd", bloom_filter_columns=[0, 1])
    _cmp(path)


def test_native_rlev2_all_submodes_from_cpp(tmp_path):
    """Spec conformance for every RLEv2 sub-encoding: shapes chosen to push
    the ORC C++ writer into SHORT_REPEAT / DELTA(fixed+var) / PATCHED_BASE /
    DIRECT, decoded by our kernels. Caught a real dialect bug: patch entries
    pack at getClosestFixedBits(pgw+pw), not raw pgw+pw."""
    rng2 = np.random.default_rng(5)
    N = 50000
    cases = {
        "short_repeat": np.repeat(rng2.integers(0, 100, 20000), rng2.integers(3, 10, 20000))[:N],
        "delta_monotonic": np.cumsum(rng2.integers(1, 5, N)),
        "delta_fixed": np.arange(N) * 10,
        "patched_base": np.where(rng2.random(N) < 0.02, rng2.integers(1 << 40, 1 << 50, N), rng2.integers(0, 512, N)),
        "patched_sparse": np.where(rng2.random(N) < 0.0005, rng2.integers(1 << 30, 1 << 40, N), rng2.integers(0, 64, N)),
        "direct_random": rng2.integers(-(2**45), 2**45, N),
        "negatives": -np.cumsum(rng2.integers(1, 100, N)),
        "extremes": np.concatenate([np.array([2**63 - 1, -(2**63), 0, -1, 1]), rng2.integers(-(2**62), 2**62, N - 5)]),
    }
    tbl = pa.table({k: pa.array(v, type=pa.int64()) for k, v in cases.items()})
    path = str(tmp_path / "rlev2.orc")
    po.write_table(tbl, path, compression="zstd")
    got = read_orc_native(path)
    exp = po.read_table(path)
    for c in cases:
        assert got[c].combine_chunks().equals(exp[c].combine_chunks()), c


def test_corrupt_file_rejection(tmp_path):
    """The native reader fails LOUDLY on non-ORC / corrupt inputs — most
    importantly it validates the magic (postscript field 8000, falling back
    to the header bytes) so a non-ORC file whose tail happens to parse is
    never silently decoded as data."""
    import pyarrow as pa

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import read_orc_native

    tbl = pa.table({"a": pa.array(np.arange(500), pa.int64())})
    path = str(tmp_path / "good.orc")
    write_orc(tbl, path)
    data = open(path, "rb").read()
    assert read_orc_native(path).equals(tbl)

    def expect_raise(blob, why):
        p = str(tmp_path / f"bad_{why}.orc")
        with open(p, "wb") as f:
            f.write(blob)
        with pytest.raises(Exception):
            read_orc_native(p)

    expect_raise(b"", "empty")
    expect_raise(b"OR", "too_short")
    expect_raise(b"PAR1" + b"\x00" * 100 + b"PAR1", "parquet_ish")
    expect_raise(data[: len(data) // 2], "truncated_half")
    expect_raise(data[:-1], "truncated_tail")
    expect_raise(data[:-1] + bytes([0]), "zero_pslen")
    expect_raise(data[:-1] + bytes([255]), "huge_pslen")
    # corrupt the magic in the postscript: ps is the last (ps_len+1) bytes
    ps_len = data[-1]
    ps = bytearray(data[-1 - ps_len : -1])
    i = bytes(ps).find(b"ORC")
    assert i >= 0
    ps[i : i + 3] = b"XXX"
    expect_raise(data[: -1 - ps_len] + bytes(ps) + data[-1:], "bad_ps_magic")
    # header-magic fallback: blank BOTH magics -> rejected even though the
    # postscript would otherwise parse (pre-0.12 files keep working via the
    # header check, which this clears too)
    noms = bytearray(data)
    noms[0:3] = b"XXX"
    # drop the 8000 field entirely by rewriting the ps without its tag
    # (tag 8000 wiretype 2 varint = 0x82 0xf4 0x03): find and excise
    tag = bytes([0x82, 0xF4, 0x03, 3]) + b"ORC"
    j = bytes(noms).rfind(tag)
    assert j >= 0
    del noms[j : j + len(tag)]
    noms[-1] = data[-1] - len(tag)
    expect_raise(bytes(noms), "no_magic_anywhere")


# ------------------------------------------------- struct / stream projection


def test_projection_prunes_stream_bytes_and_struct_children(tmp_path):
    """Projection pushdown is BYTE-level: unprojected columns' streams are
    never pread; a dotted 'parent.child' selection prunes inside a struct
    (pruned output type, untouched sibling streams)."""
    import numpy as np

    from orc_format_ray import orcread
    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import read_orc_native

    rng = np.random.default_rng(2)
    n = 3000
    payload = ["".join(chr(97 + c) for c in rng.integers(0, 26, 120)) for _ in range(n)]
    t = pa.table(
        {
            "id": pa.array(np.arange(n), pa.int64()),
            "s": pa.StructArray.from_arrays(
                [
                    pa.array(rng.integers(0, 9, n), pa.int64()),
                    pa.array(rng.normal(size=n)),
                ],
                names=["x", "score"],
            ),
            "payload": pa.array(payload),
        }
    )
    p = str(tmp_path / "sp.orc")
    write_orc(t, p, stripe_rows=1500)

    reads = {"n": 0}
    orig = orcread._Source.read

    def spy(self, off, ln):
        reads["n"] += ln
        return orig(self, off, ln)

    orcread._Source.read = spy
    try:
        reads["n"] = 0
        got = read_orc_native(p, columns=["id", "s.x"])
        b_proj = reads["n"]
        reads["n"] = 0
        full = read_orc_native(p)
        b_full = reads["n"]
    finally:
        orcread._Source.read = orig

    assert full.equals(t)
    assert got.column_names == ["id", "s"]
    assert got["s"].type == pa.struct([("x", pa.int64())])
    assert got["s"].combine_chunks().field("x").to_pylist() == t["s"].combine_chunks().field("x").to_pylist()
    tail = 64 * 1024 + 3  # fixed tail pread + header magic
    assert (b_proj - tail) < (b_full - tail) / 5


def test_struct_projection_error_paths(tmp_path):
    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import read_orc_native

    t = pa.table(
        {
            "id": pa.array([1, 2], pa.int64()),
            "s": pa.StructArray.from_arrays([pa.array([1, 2], pa.int64())], names=["x"]),
        }
    )
    p = str(tmp_path / "err.orc")
    write_orc(t, p)
    with pytest.raises(KeyError, match="no children"):
        read_orc_native(p, columns=["s.nope"])
    with pytest.raises(ValueError, match="not STRUCT"):
        read_orc_native(p, columns=["id.x"])
    with pytest.raises(NotImplementedError, match="one level"):
        read_orc_native(p, columns=["s.a.b"])
    # full selection wins over nested; nulls in the struct survive pruning
    both = read_orc_native(p, columns=["s", "s.x"])
    assert both["s"].type == t["s"].type


# ----------------------------------------------- reader-side dict pushdown


def test_orc_string_value_counts_both_paths(tmp_path):
    """Dictionary stripes answer from index bincounts (no per-row strings);
    direct stripes fall back to a full decode; nulls are never counted —
    both paths multiset-equal a pandas recompute on a mixed file."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pytest

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import orc_string_value_counts

    rng = np.random.default_rng(9)
    src = rng.choice(["web", "books", "code", "wiki"], 50000).tolist()
    for i in range(0, 50000, 97):
        src[i] = None
    # first half low-cardinality (dict wins), second half unique (direct wins)
    mixed = [f"u{i}" for i in range(30000)] + rng.choice(["a", "b"], 20000).tolist()
    t = pa.table({"source": pa.array(src, pa.string()), "mixed": pa.array(mixed, pa.string())})
    path = str(tmp_path / "vc.orc")
    write_orc(t, path, stripe_rows=8000)

    counts, stats = orc_string_value_counts(path, "source")
    want = pd.Series([s for s in src if s is not None]).value_counts().sort_index()
    assert counts == list(zip(want.index, want.values))
    assert stats["dict_stripes"] > 0  # low-cardinality: dict path engaged

    c2, s2 = orc_string_value_counts(path, "mixed")
    want2 = pd.Series(mixed).value_counts().sort_index()
    assert c2 == list(zip(want2.index, want2.values))
    assert s2["direct_stripes"] > 0  # unique stripes: fallback engaged

    with pytest.raises(KeyError):
        orc_string_value_counts(path, "nope")
    t2 = pa.table({"n": pa.array([1, 2, 3], pa.int64())})
    p2 = str(tmp_path / "int.orc")
    write_orc(t2, p2)
    with pytest.raises(ValueError, match="string column"):
        orc_string_value_counts(p2, "n")


def test_orc_int_aggregates_runlevel_matches_decode(tmp_path):
    """Run-level RLEv1 aggregate pushdown == pyarrow aggregates on the same
    data, nulls excluded, across multi-stripe multi-row-group layouts."""
    import numpy as np
    import pyarrow.compute as pc

    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import orc_int_column_aggregates

    rng = np.random.default_rng(11)
    vals = np.concatenate(
        [np.full(25_000, -7), rng.integers(-10**6, 10**6, 9_000), np.arange(6_000)]
    ).astype(np.int64)
    mask = rng.random(len(vals)) < 0.07
    arr = pa.array([None if m else int(v) for v, m in zip(vals, mask)], pa.int64())
    t = pa.table({"x": arr, "y": pa.array(np.arange(len(vals), dtype=np.int32))})
    path = str(tmp_path / "agg.orc")
    write_orc(t, path, stripe_rows=15_000)  # >1 stripe, row groups restart RLE

    agg, stats = orc_int_column_aggregates(path, "x")
    assert stats["runlevel_stripes"] > 0 and stats["decoded_stripes"] == 0
    assert agg == {
        "n": len(arr) - arr.null_count,
        "sum": pc.sum(arr).as_py(),
        "min": pc.min(arr).as_py(),
        "max": pc.max(arr).as_py(),
    }
    agg2, _ = orc_int_column_aggregates(path, "y")
    assert agg2["n"] == len(vals)
    assert agg2["sum"] == int(np.arange(len(vals), dtype=np.int64).sum())


def test_orc_int_aggregates_foreign_file_falls_back(tmp_path):
    import numpy as np
    import pyarrow.orc as po

    from orc_format_ray.orcread import orc_int_column_aggregates

    t = pa.table({"x": pa.array([5, None, -3, 5, 5], pa.int64())})
    path = str(tmp_path / "foreign.orc")
    po.write_table(t, path)
    agg, stats = orc_int_column_aggregates(path, "x")
    assert stats["decoded_stripes"] > 0  # pyarrow writes DIRECT_V2
    assert agg == {"n": 4, "sum": 12, "min": -3, "max": 5}


def test_orc_int_aggregates_all_null_and_type_guard(tmp_path):
    from orc_format_ray.orcfile import write_orc
    from orc_format_ray.orcread import orc_int_column_aggregates

    t = pa.table(
        {"z": pa.array([None, None], pa.int64()), "s": pa.array(["a", "b"])}
    )
    path = str(tmp_path / "nulls.orc")
    write_orc(t, path)
    agg, _ = orc_int_column_aggregates(path, "z")
    assert agg == {"n": 0, "sum": 0, "min": None, "max": None}
    with pytest.raises(ValueError, match="integer column"):
        orc_int_column_aggregates(path, "s")
    with pytest.raises(KeyError):
        orc_int_column_aggregates(path, "nope")


def test_exact_int_fold_beyond_int64_safe_bounds():
    """The slow path folds in Python ints — products past 2^62 never wrap."""
    import numpy as np

    from orc_format_ray.orcread import _exact_int_fold

    v = np.array([2**40, -(2**40), 3], np.int64)
    c = np.array([2**25, 2**24, 1], np.int64)
    assert _exact_int_fold(v, c) == (2**40) * (2**25) - (2**40) * (2**24) + 3
    assert _exact_int_fold(np.zeros(0, np.int64), np.zeros(0, np.int64)) == 0


def test_orc_lake_int_aggregates_folds_files(ray_session, tmp_path):
    import numpy as np
    import ray.data

    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcread import orc_lake_int_aggregates

    n = 30_000
    tbl = pa.table(
        {
            "a": pa.array(np.arange(n, dtype=np.int64)),
            "b": pa.array(np.full(n, 9, dtype=np.int32)),
        }
    )
    lake = str(tmp_path / "lake")
    write_orc_dataset(
        ray.data.from_arrow(tbl).repartition(4), lake, stripe_rows=10_000
    ).materialize()
    df, stats = orc_lake_int_aggregates(lake, ["a", "b"])
    assert stats["runlevel_stripes"] > 0 and stats["decoded_stripes"] == 0
    row_a = df[df["column"] == "a"].iloc[0]
    assert (row_a["cnt"], row_a["total"], row_a["vmin"], row_a["vmax"]) == (
        n, int(np.arange(n, dtype=np.int64).sum()), 0, n - 1)
    row_b = df[df["column"] == "b"].iloc[0]
    assert (row_b["cnt"], row_b["total"], row_b["vmin"], row_b["vmax"]) == (n, 9 * n, 9, 9)
