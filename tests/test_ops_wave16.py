"""Session-16 op pins: keyed pseudonymization semantics and the
three-way storage-independence composition's engine-side contracts."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_pseudonymize_deterministic_and_join_preserving(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table(
        {
            "uid": pa.array([1, 2, 1, None, 3], pa.int64()),
            "other": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "val": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid", "other"], key="k1"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    # equal ids -> equal tokens (rows 0 and 2 share uid=1)
    assert out.loc[0, "uid"] == out.loc[2, "uid"]
    # nulls stay null, never a token
    assert out.loc[3, "uid"] is None or out.loc[3, "uid"] != out.loc[3, "uid"]
    # per-column domain separation: same raw value 1 maps differently per column
    assert out.loc[0, "uid"] != out.loc[0, "other"]
    # stateless determinism across independent runs
    out2 = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid", "other"], key="k1"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    assert out["uid"].tolist()[:3] == out2["uid"].tolist()[:3]
    # different key -> different tokens
    out3 = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid"], key="k2"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    assert out.loc[0, "uid"] != out3.loc[0, "uid"]


def test_pseudonymize_matches_reference_expression(ray_session):
    import hashlib

    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table({"uid": pa.array([42], pa.int64())})
    out = pseudonymize_keys(ray.data.from_arrow(t), ["uid"], key="K").to_pandas()
    assert out.loc[0, "uid"] == hashlib.sha256(b"K:uid:42").hexdigest()[:16]


def test_pseudonymize_rejects_float_keys(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table({"x": pa.array([1.5], pa.float64())})
    with pytest.raises(Exception):  # raised inside the Ray task
        pseudonymize_keys(ray.data.from_arrow(t), ["x"], key="k").to_pandas()


def test_q6_source_ds_hook_matches_default(ray_session):
    import ray.data

    from orc_format_ray.pipelines.tpch import q6_forecast_revenue

    base = q6_forecast_revenue(SF)
    cols = ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    via_ds = q6_forecast_revenue(
        SF, source_ds=ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=cols)
    )
    assert base.values.tolist() == via_ds.values.tolist()


def test_string_value_counts_pushdown_both_paths(monkeypatch):
    """Dict index-run pushdown == direct decode fallback, nulls never
    counted, list-of-string elements flatten; each codec path pinned by
    forcing the selector's choice."""
    import collections

    from orc_format_ray.codecs import selector
    from orc_format_ray.stripe import column_string_value_counts_stats, encode_table

    rng = np.random.default_rng(4)
    vals = rng.choice(["alpha", "beta", "gamma", "delta"], 5000, p=[0.5, 0.3, 0.15, 0.05]).tolist()
    nulls = [None if i % 13 == 0 else v for i, v in enumerate(vals)]
    exp = collections.Counter(v for v in nulls if v is not None)
    tbl = pa.table(
        {
            "s": pa.array(nulls, pa.string()),
            "ls": pa.array([[v, v] if v else [] for v in nulls], pa.list_(pa.string())),
        }
    )
    for forced in (None, "direct", "dict", "fsst"):
        if forced is not None:
            monkeypatch.setattr(selector, "select_string_codec",
                                lambda c, o, menu=None, _f=forced: _f)
        blob, _ = encode_table(tbl)
        v, c, st = column_string_value_counts_stats(blob, "s")
        assert dict(zip(v, c.tolist())) == dict(exp), (forced, st)
        if forced == "dict":
            assert st["dict_chunks"] > 0 and st["direct_chunks"] == 0
        if forced in ("direct", "fsst"):
            assert st["direct_chunks"] > 0 and st["dict_chunks"] == 0
        v2, c2, _ = column_string_value_counts_stats(blob, "ls")
        assert dict(zip(v2, c2.tolist())) == {k: 2 * n for k, n in exp.items()}
    monkeypatch.undo()
    with pytest.raises(ValueError, match="string leaf"):
        column_string_value_counts_stats(
            encode_table(pa.table({"i": pa.array([1], pa.int64())}))[0], "i"
        )


def test_dictionary_value_counts_strings_matches_decode():
    from orc_format_ray.codecs import dictionary

    rng = np.random.default_rng(8)
    vals = rng.choice(["x", "yy", "zzz", ""], 8000).tolist()
    enc = dictionary.encode_strings(pa.array(vals, pa.string()))
    ents, counts = dictionary.value_counts_strings(enc)
    import collections

    exp = collections.Counter(vals)
    assert {e.decode(): int(c) for e, c in zip(ents, counts)} == dict(exp)


def test_png_roundtrip_all_color_types_and_filters():
    """Real PNG codec: round-trips gray/RGB/RGBA, decodes a hand-filtered
    file through every scanline filter, resolves palettes, and is loud on
    CRC corruption and interlace."""
    import struct
    import zlib

    from orc_format_ray.ops.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(2)
    for shape in [(7, 5), (16, 9, 3), (4, 4, 4)]:
        px = rng.integers(0, 256, shape).astype(np.uint8)
        assert np.array_equal(decode_png(encode_png(px)), px)
    # every filter type, against an independent per-pixel reference
    w, h, ch = 4, 5, 3
    px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    stride = w * ch
    rows, prior = [], np.zeros(stride, np.int64)
    ref = px.reshape(h, stride).astype(np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        cur, filt = ref[y], np.zeros(stride, np.int64)
        for x in range(stride):
            a = cur[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
            filt[x] = (cur[x] - pred) % 256
        rows.append(bytes([f]) + bytes(filt.astype(np.uint8)))
        prior = cur
    blob = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + _png_chunk(b"IDAT", zlib.compress(b"".join(rows), 6))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), px)
    # palette
    plte = rng.integers(0, 256, (4, 3)).astype(np.uint8)
    idx = rng.integers(0, 4, (3, 6)).astype(np.uint8)
    raw = np.zeros((3, 7), np.uint8)
    raw[:, 1:] = idx
    blob = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 6, 3, 8, 3, 0, 0, 0))
        + _png_chunk(b"PLTE", plte.tobytes())
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(blob), plte[idx])
    bad = bytearray(encode_png(px))
    bad[20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))
    inter = (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError, match="Adam7"):
        decode_png(inter)


def test_decode_image_dispatches_png(ray_session):
    from orc_format_ray.ops import multimodal

    tbl = multimodal.synthetic_media_table(18)
    assert "image/png" in set(tbl["media_type"].to_pylist())
    import ray.data

    out = (
        ray.data.from_arrow(tbl)
        .map_batches(
            multimodal.DecodeImage(strict=True),
            batch_size=8,
            batch_format="pyarrow",
            concurrency=2,
        )
        .to_pandas()
    )
    assert len(out) == 18
    # strict=True proves every payload (incl. PNG) decoded natively;
    # pixel byte count matches h*w*3 per row
    for r in out.itertuples():
        assert len(r.pixels) == r.width * r.height * 3


def test_archive_encode_roundtrip_and_smaller(ray_session, tmp_path):
    """encode_dataset(archive=True): cold-tier codec selection (rANS in
    the menu, full-column argmin) round-trips bit-exact through the
    standard decode path and lands a smaller lake on zipf token data."""
    import pyarrow.parquet as pq

    from orc_format_ray.pipelines import encode as enc

    rng = np.random.default_rng(6)
    toks = [
        (rng.zipf(1.3, int(rng.integers(30, 120))) % 50257).astype(np.int32)
        for _ in range(1500)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([f"d{i:05d}" for i in range(len(toks))]),
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": pa.array(["s" + str(i % 3) for i in range(len(toks))]),
        }
    )
    src = str(tmp_path / "tokens.parquet")
    pq.write_table(tbl, src, row_group_size=256)

    out_hot = str(tmp_path / "hot")
    out_cold = str(tmp_path / "cold")
    enc.encode_dataset([src], out_hot, budget_bytes=1 << 20)
    enc.encode_dataset([src], out_cold, budget_bytes=1 << 20, archive=True)

    import glob as g

    hot_bytes = sum(len(open(p, "rb").read()) for p in g.glob(out_hot + "/*.stripe"))
    cold_bytes = sum(len(open(p, "rb").read()) for p in g.glob(out_cold + "/*.stripe"))
    assert cold_bytes <= hot_bytes  # rANS wins or ties on zipf tokens

    back = (
        enc.decode_dataset(out_cold)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(back) == len(tbl)
    want = tbl.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["n_tok"].tolist() == want["n_tok"].tolist()
    assert all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(back["tokens"], want["tokens"])
    )


def test_decode_dataset_filtered_prunes_and_filters(ray_session, tmp_path):
    """Native-lake predicate pushdown: header-only file pruning + chunk
    pruning + exact post-filter; DNF grammar; typed-empty all-pruned."""
    import glob

    import pyarrow.parquet as pq

    from orc_format_ray.pipelines import encode as enc

    rng = np.random.default_rng(3)
    rows = 40_000
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(rows, dtype=np.int64)),
            "tokens": pa.array(
                [[int(x)] * 3 for x in rng.integers(0, 100, rows)], pa.list_(pa.int64())
            ),
            "n_tok": pa.array(np.full(rows, 3, np.int64)),
            "source": pa.array([f"s{i % 4}" for i in range(rows)]),
        }
    )
    src = str(tmp_path / "t.parquet")
    pq.write_table(tbl, src, row_group_size=2048)
    out = str(tmp_path / "stripes")
    enc.encode_dataset([src], out, budget_bytes=60_000)
    assert len(glob.glob(out + "/*.stripe")) > 3

    ds, plan = enc.decode_dataset_filtered(
        out, ("doc_id", ">=", 39_000), columns=["doc_id", "source"]
    )
    df = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == list(range(39_000, rows))
    assert list(df.columns) == ["doc_id", "source"]
    assert plan["files_read"] < plan["files_total"]  # sorted lake: stats prune

    ds2, _ = enc.decode_dataset_filtered(
        out, [[("doc_id", "<", 10), ("source", "==", "s1")], [("doc_id", "in", [39999, 5])]]
    )
    got = sorted(ds2.to_pandas()["doc_id"].tolist())
    assert got == sorted({1, 5, 9, 39999})

    ds3, plan3 = enc.decode_dataset_filtered(out, ("doc_id", ">", 10**9), columns=["doc_id"])
    assert ds3.schema().names == ["doc_id"] and ds3.count() == 0
    assert plan3["files_read"] == 0

    with pytest.raises(ValueError, match="predicate"):
        enc.decode_dataset_filtered(out, "doc_id > 5")
    with pytest.raises(ValueError, match="op"):
        enc.decode_dataset_filtered(out, ("doc_id", "!=", 5))


def test_value_counts_falls_back_exactly_on_rans_columns():
    """A column the archive selector hands to rANS is outside the run-pair
    pushdown list — column_value_counts / column_int_aggregates must fold
    it through the registry's exact decode fallback."""
    from orc_format_ray.stripe import (
        column_int_aggregates,
        column_value_counts,
        encode_table,
    )

    rng = np.random.default_rng(13)
    v = (rng.zipf(1.4, 30_000) % 5000).astype(np.int64)
    tbl = pa.table({"x": pa.array(v)})
    blob, _ = encode_table(tbl, archive=True)
    vals, cnts = column_value_counts(blob, "x")
    ev, ec = np.unique(v, return_counts=True)
    assert np.array_equal(vals, ev) and np.array_equal(cnts, ec)
    agg = column_int_aggregates(blob, "x")
    assert agg == {"n": len(v), "sum": int(v.sum()), "min": int(v.min()), "max": int(v.max())}
