"""Session-9 operator wave: GROUPING SETS, markup stripping, conversion
attribution, incremental MinHash near-dedup. Each test pins the op against
an independent local recompute (DuckDB SQL or construction) at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "events", "lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _sorted(a), _sorted(b)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype(np.float64), bv.astype(np.float64)), c
        else:
            assert (av == bv).all(), c


# ------------------------------------------------------------ grouping sets


def test_grouping_sets_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.agg import grouping_sets

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"])
    got = grouping_sets(ds, ["lang", "source"], [["lang", "source"], ["source"], []], "n_chars", agg="sum")
    want = _con().execute(
        """
SELECT COALESCE(lang, '(all)') AS lang, COALESCE(source, '(all)') AS source,
       CAST(2 - GROUPING(lang) - GROUPING(source) AS BIGINT) AS level,
       CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE) AS value
FROM documents GROUP BY GROUPING SETS ((lang, source), (source), ())
ORDER BY level DESC, lang, source
"""
    ).fetchdf()
    assert (got["level"].to_numpy()[:1] == 2).all() and len(got) > 3
    _assert_frames_equal(got, want)


def test_grouping_sets_set_order_ignored(ray_session):
    import ray

    from orc_format_ray.ops.agg import grouping_sets

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"])
    a = grouping_sets(ds, ["lang", "source"], [["source", "lang"]], "n_chars", agg="mean", round_to=4)
    b = grouping_sets(ds, ["lang", "source"], [["lang", "source"]], "n_chars", agg="mean", round_to=4)
    _assert_frames_equal(a, b)


def test_grouping_sets_rejects_bad_sets(ray_session):
    import ray

    from orc_format_ray.ops.agg import grouping_sets

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["lang", "source", "n_chars"])
    with pytest.raises(ValueError, match="unknown keys"):
        grouping_sets(ds, ["lang"], [["nope"]], "n_chars")
    with pytest.raises(ValueError, match="duplicate grouping set"):
        grouping_sets(ds, ["lang", "source"], [["lang"], ["lang"]], "n_chars")
    with pytest.raises(ValueError, match="at least one set"):
        grouping_sets(ds, ["lang"], [], "n_chars")


# ------------------------------------------------------------- strip markup


def test_strip_markup_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops import text as tx

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def plant_and_strip(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        planted = pc.binary_join_element_wise(
            pa.scalar('<p class="x">'),
            batch["text"],
            pa.scalar("</p> &amp;lt; &gt;&nbsp;tail<br/>"),
            "",
        )
        out = tx.strip_markup(pa.table({"doc_id": batch["doc_id"], "text": planted}))
        return out.select(["doc_id", "text_plain", "n_tags"])

    got = (
        ds.map_batches(plant_and_strip, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()
    )
    got["n_tags"] = got["n_tags"].astype("int64")
    want = _con().execute(
        r"""
WITH planted AS (
  SELECT doc_id, '<p class="x">' || text || '</p> &amp;lt; &gt;&nbsp;tail<br/>' AS t
  FROM documents
)
SELECT doc_id,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(
      regexp_replace(t, '<[^>]*>', ' ', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
    '\s+', ' ', 'g'), ' ') AS text_plain,
  CAST(len(regexp_extract_all(t, '<[^>]*>')) AS BIGINT) AS n_tags
FROM planted
"""
    ).fetchdf()
    _assert_frames_equal(got, want)


def test_strip_markup_entity_order_and_edges():
    from orc_format_ray.ops.text import strip_markup

    t = pa.table({"text": pa.array([
        "&amp;lt; stays escaped",          # &amp; decodes LAST -> literal '&lt;'
        "<a href='x'>link</a>  text",
        "",
        "no markup at all",
    ])})
    out = strip_markup(t)
    plain = out["text_plain"].to_pylist()
    assert plain[0] == "&lt; stays escaped"
    assert plain[1] == "link text"
    assert plain[2] == ""
    assert plain[3] == "no markup at all"
    assert out["n_tags"].to_pylist() == [0, 2, 0, 0]


# -------------------------------------------------------------- attribution

_ATT_SQL = """
WITH conv AS (
  SELECT user_id, ts, CAST(floor(value * 100 + 0.5) AS BIGINT) AS u
  FROM events WHERE event_type = 'purchase'
), tch AS (
  SELECT user_id, ts, event_type FROM events WHERE event_type <> 'purchase'
), att AS ({attr})
SELECT channel, CAST(count(*) AS BIGINT) AS conversions,
       CAST(CAST(sum(u) AS BIGINT) AS DOUBLE) / 100.0 AS value_total
FROM att GROUP BY channel ORDER BY channel
"""

_ATT_LAST = """
  SELECT c.u, COALESCE(t.event_type, '(none)') AS channel
  FROM conv c LEFT JOIN LATERAL (
    SELECT event_type FROM tch t
    WHERE t.user_id = c.user_id AND t.ts <= c.ts
    ORDER BY t.ts DESC LIMIT 1
  ) t ON true
"""

_ATT_FIRST = """
  SELECT c.u,
    CASE WHEN f.ft IS NOT NULL AND f.ft <= c.ts THEN f.ch ELSE '(none)' END AS channel
  FROM conv c LEFT JOIN (
    SELECT user_id, arg_min(event_type, ts) AS ch, min(ts) AS ft FROM tch GROUP BY user_id
  ) f ON f.user_id = c.user_id
"""


@pytest.mark.parametrize("model,attr", [("last", _ATT_LAST), ("first", _ATT_FIRST)])
def test_attribution_matches_sql(ray_session, model, attr):
    import ray

    from orc_format_ray.ops.paths import attribution

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = attribution(ev, "purchase", model=model).to_pandas()
    got["conversions"] = got["conversions"].astype("int64")
    want = _con().execute(_ATT_SQL.format(attr=attr)).fetchdf()
    assert len(got) > 1 and got["conversions"].sum() == 202
    _assert_frames_equal(got, want)


def test_attribution_duplicate_touch_raises(ray_session):
    import ray

    from orc_format_ray.ops.paths import attribution

    ts = pa.array([1_000_000, 1_000_000, 2_000_000], pa.timestamp("us"))
    t = pa.table(
        {
            "user_id": pa.array([7, 7, 7], pa.int64()),
            "ts": ts,
            "event_type": pa.array(["click", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 10.0], pa.float64()),
        }
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="tie-ambiguous"):
        attribution(ds, "purchase").to_pandas()


def test_attribution_no_touch_credits_none(ray_session):
    import ray

    from orc_format_ray.ops.paths import attribution

    t = pa.table(
        {
            "user_id": pa.array([1, 2, 2], pa.int64()),
            "ts": pa.array([5_000_000, 1_000_000, 9_000_000], pa.timestamp("us")),
            "event_type": pa.array(["purchase", "purchase", "click"]),
            "value": pa.array([3.5, 2.25, 0.0], pa.float64()),
        }
    )
    for model in ("last", "first"):
        df = attribution(ray.data.from_arrow(t), "purchase", model=model).to_pandas()
        # user 1 has no touches; user 2's only touch is AFTER the purchase
        assert df["channel"].tolist() == ["(none)"]
        assert int(df["conversions"].iloc[0]) == 2
        assert float(df["value_total"].iloc[0]) == 5.75


# ---------------------------------------------- incremental MinHash dedup


def _fresh_docs(n: int = 5) -> pa.Table:
    texts = [
        " ".join(f"zzfresh{i}w{j}" for j in range(12)) for i in range(n)
    ]
    return pa.table(
        {
            "doc_id": pa.array([2_000_000 + i for i in range(n)], pa.int64()),
            "text": pa.array(texts),
        }
    )


def _planted_new_shard(con) -> tuple[pa.Table, list[int]]:
    chosen = con.execute(
        "WITH uniq AS (SELECT text FROM documents GROUP BY text HAVING count(*) = 1) "
        "SELECT d.doc_id, d.text FROM documents d JOIN uniq u ON d.text = u.text "
        "ORDER BY d.doc_id LIMIT 5"
    ).fetchdf()
    copies = pa.table(
        {
            "doc_id": pa.array((chosen["doc_id"] + 1_000_000).to_numpy(np.int64), pa.int64()),
            "text": pa.array(chosen["text"].tolist()),
        }
    )
    new = pa.concat_tables([copies, _fresh_docs()])
    return new, chosen["doc_id"].astype(np.int64).tolist()


def test_minhash_dedup_against_planted(ray_session):
    import ray

    from orc_format_ray.ops.dedup import minhash_dedup_against

    new_tbl, orig_ids = _planted_new_shard(_con())
    reference = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    kept, pairs = minhash_dedup_against(ray.data.from_arrow(new_tbl), reference, threshold=0.99)
    pdf = pairs.to_pandas()
    planted = pdf[pdf["new_doc"] < 2_000_000].drop_duplicates(["ref_doc", "new_doc"])
    assert sorted(planted["ref_doc"].tolist()) == sorted(orig_ids)
    assert sorted(planted["new_doc"].tolist()) == sorted(i + 1_000_000 for i in orig_ids)
    assert (planted.groupby("new_doc")["jaccard"].max() == 1.0).all()
    kept_ids = sorted(kept.to_pandas()["doc_id"].tolist())
    assert kept_ids == [2_000_000 + i for i in range(5)]


def test_minhash_dedup_against_id_guard(ray_session):
    import ray

    from orc_format_ray.ops.dedup import REF_TAG, minhash_dedup_against

    bad = pa.table(
        {
            "doc_id": pa.array([int(REF_TAG) + 1], pa.int64()),
            "text": pa.array(["some words here for shingles to chew on"]),
        }
    )
    ok = pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["other words entirely different tokens"])})
    with pytest.raises(Exception, match="bit 62"):
        kept, _ = minhash_dedup_against(ray.data.from_arrow(bad), ray.data.from_arrow(ok))
        kept.to_pandas()


# -------------------------------------------------------------- dedup report


def test_dedup_report_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.dedup import dedup_report

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    got = dedup_report(ds).to_pandas()
    for c in got.columns:
        if c != "cluster_size":
            got[c] = got[c].astype("int64")
    want = _con().execute(
        """
WITH c AS (SELECT count(*) AS sz, length(text) AS ln FROM documents GROUP BY text)
SELECT CAST(sz AS BIGINT) AS cluster_size, count(*) AS n_clusters,
       CAST(sz * count(*) AS BIGINT) AS n_docs,
       CAST(sum((sz - 1) * ln) AS BIGINT) AS dup_chars
FROM c GROUP BY sz ORDER BY sz
"""
    ).fetchdf()
    assert got["n_docs"].sum() == 500
    _assert_frames_equal(got, want)


def test_dedup_report_synthetic(ray_session):
    import ray

    from orc_format_ray.ops.dedup import dedup_report

    t = pa.table({"text": pa.array(["aaaa", "aaaa", "aaaa", "bb", "c"])})
    df = dedup_report(ray.data.from_arrow(t)).to_pandas().sort_values("cluster_size").reset_index(drop=True)
    assert df["cluster_size"].tolist() == [1, 3]
    assert df["n_clusters"].tolist() == [2, 1]
    assert df["n_docs"].tolist() == [2, 3]
    assert df["dup_chars"].tolist() == [0, 8]  # (3-1) * len("aaaa")


# --------------------------------------------------------------- ANN recall


def test_ann_recall_report(ray_session):
    import ray

    from orc_format_ray.ops.similarity import ann_recall_report

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    q = np.ones((3, 64), dtype=np.float64)
    q[0, 1::2] = -1.0
    q[1, ::3] = -1.0
    # full probe: every bucket read -> recall must be exactly 1.0
    full = ann_recall_report(ds, q, k=10, nlist=8, nprobe=8)
    assert len(full) == 4  # 3 queries + macro row
    assert (full["recall"] == 1.0).all()
    assert full.loc[full["query_id"] == -1, "n_hit"].iloc[0] == 30
    # partial probe: recall is monotone in nprobe (candidate supersets)
    lo = ann_recall_report(ds, q, k=10, nlist=8, nprobe=1)
    hi = ann_recall_report(ds, q, k=10, nlist=8, nprobe=4)
    assert (hi.set_index("query_id")["recall"] >= lo.set_index("query_id")["recall"] - 1e-12).all()


# ------------------------------------------------------------ bin/idx shards


def test_bin_shard_roundtrip_bit_identical(ray_session, tmp_path):
    import ray

    from orc_format_ray.ops.binshard import read_bin_shards, write_bin_shards
    from orc_format_ray.pipelines.tokens import tokenize_documents

    ds = tokenize_documents(SF)
    manifest = write_bin_shards(ds, str(tmp_path), rows_per_shard=128)
    assert manifest["n_docs"].sum() == 500
    assert len(manifest) >= 4  # multiple parts at 128 rows/shard
    back = read_bin_shards(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    orig = ds.to_pandas()[["doc_id", "tokens", "n_tok"]].sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == orig["doc_id"].tolist()
    assert back["n_tok"].tolist() == orig["n_tok"].tolist()
    for a, b in zip(back["tokens"], orig["tokens"]):
        assert np.array_equal(np.asarray(a, np.int32), np.asarray(b, np.int32))
    assert int(manifest["n_tokens"].sum()) == int(orig["n_tok"].astype("int64").sum())


def test_bin_shard_rewrite_is_byte_identical(ray_session, tmp_path):
    import hashlib

    from orc_format_ray.ops.binshard import write_bin_shards
    from orc_format_ray.pipelines.tokens import tokenize_documents

    def digest(d):
        h = hashlib.sha256()
        for p in sorted(d.iterdir()):
            h.update(p.name.encode())
            h.update(p.read_bytes())
        return h.hexdigest()

    a, b = tmp_path / "a", tmp_path / "b"
    write_bin_shards(tokenize_documents(SF), str(a), rows_per_shard=200)
    write_bin_shards(tokenize_documents(SF), str(b), rows_per_shard=200)
    assert digest(a) == digest(b)


def test_bin_shard_corruption_guard(ray_session, tmp_path):
    import ray

    from orc_format_ray.ops.binshard import read_bin_shards, write_bin_shards

    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"], pa.string()),
            "tokens": pa.array([[1, 2, 3], [4]], pa.list_(pa.int32())),
        }
    )
    write_bin_shards(ray.data.from_arrow(t), str(tmp_path), rows_per_shard=10)
    bins = sorted(tmp_path.glob("*.bin"))
    bins[0].write_bytes(bins[0].read_bytes()[:-4])  # truncate one token
    with pytest.raises(Exception, match="index implies"):
        read_bin_shards(str(tmp_path)).to_pandas()


# ------------------------------------------------------------------ TPC-H Q1

_Q1_SQL = """
WITH u AS (SELECT l_returnflag, l_linestatus,
  CAST(floor(l_quantity*100 + 0.5) AS BIGINT) AS qc,
  CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) AS pc,
  CAST(floor(l_discount*100 + 0.5) AS BIGINT) AS db,
  CAST(floor(l_tax*100 + 0.5) AS BIGINT) AS tb
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00')
SELECT l_returnflag, l_linestatus,
  CAST(sum(qc) AS BIGINT)/100.0 AS sum_qty,
  CAST(sum(pc) AS BIGINT)/100.0 AS sum_base_price,
  CAST(sum(pc*(100-db)) AS BIGINT)/10000.0 AS sum_disc_price,
  CAST(sum(pc*(100-db)*(100+tb)) AS BIGINT)/1000000.0 AS sum_charge,
  CAST(sum(qc) AS BIGINT)/(count(*)*100.0) AS avg_qty,
  CAST(sum(pc) AS BIGINT)/(count(*)*100.0) AS avg_price,
  CAST(sum(db) AS BIGINT)/(count(*)*100.0) AS avg_disc,
  count(*) AS count_order
FROM u GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def test_tpch_q1_matches_sql(ray_session):
    from orc_format_ray.pipelines.tpch import q1_pricing_summary

    got = q1_pricing_summary(SF)
    want = _con().execute(_Q1_SQL).fetchdf()
    assert len(got) > 1 and got["count_order"].sum() > 0
    _assert_frames_equal(got, want)


def test_tpch_q1_empty_cut(ray_session):
    from orc_format_ray.pipelines.tpch import q1_pricing_summary

    got = q1_pricing_summary(SF, cut_date="1900-01-01")
    assert len(got) == 0
    assert list(got.columns)[:2] == ["l_returnflag", "l_linestatus"]


# -------------------------------------------------------- parquet compaction


def _small_files(tmp_path, n_files=12):
    import pyarrow.parquet as pq

    src = pq.read_table(f"{SF}/orders.parquet")
    per = src.num_rows // n_files
    d = tmp_path / "in"
    d.mkdir()
    for i in range(n_files):
        lo = i * per
        hi = src.num_rows if i == n_files - 1 else (i + 1) * per
        pq.write_table(src.slice(lo, hi - lo), d / f"shard-{i:04d}.parquet")
    return d, src


def test_compact_parquet_roundtrip_and_resume(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from orc_format_ray.ops.parquetlake import compact_parquet_dataset

    d, src = _small_files(tmp_path)
    out = tmp_path / "out"
    total = sum(f.stat().st_size for f in d.iterdir())
    m1 = compact_parquet_dataset(str(d), str(out), target_bytes=total // 3)
    assert 2 <= len(m1) <= 6
    assert not m1["skipped"].any()
    assert m1["n_rows"].sum() == src.num_rows
    back = pq.read_table(str(out)).sort_by("o_orderkey")
    assert back.equals(src.sort_by("o_orderkey"))
    # resume: identical plan, every part skipped, bytes untouched
    sig = {p.name: (p.stat().st_mtime_ns, p.stat().st_size) for p in out.iterdir()}
    m2 = compact_parquet_dataset(str(d), str(out), target_bytes=total // 3)
    assert m2["skipped"].all()
    assert {p.name: (p.stat().st_mtime_ns, p.stat().st_size) for p in out.iterdir()} == sig


def test_compact_parquet_rejects_foreign_part(ray_session, tmp_path):
    from orc_format_ray.ops.parquetlake import compact_parquet_dataset

    d, _ = _small_files(tmp_path, n_files=4)
    out = tmp_path / "out"
    compact_parquet_dataset(str(d), str(out), target_bytes=1 << 40)  # one part
    # corrupt the plan: append a new input file -> row counts shift
    import pyarrow.parquet as pq

    extra = pq.read_table(f"{SF}/orders.parquet").slice(0, 7)
    pq.write_table(extra, d / "zz-extra.parquet")
    with pytest.raises(Exception, match="remove it to recompact"):
        compact_parquet_dataset(str(d), str(out), target_bytes=1 << 40)


def test_compact_parquet_rejects_schema_mismatch(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from orc_format_ray.ops.parquetlake import compact_parquet_dataset

    d = tmp_path / "in"
    d.mkdir()
    pq.write_table(pa.table({"a": pa.array([1, 2], pa.int64())}), d / "a.parquet")
    pq.write_table(pa.table({"a": pa.array([1.5], pa.float64())}), d / "b.parquet")
    with pytest.raises(ValueError, match="schema mismatch"):
        compact_parquet_dataset(str(d), str(tmp_path / "out"), target_bytes=1 << 40)


# ----------------------------------------------------- keep-best near dedup


def _scored_corpus():
    ta = "alpha beta gamma delta epsilon zeta"
    tb = "one two three four five six seven"
    tc = "totally unrelated words in this document here"
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 10, 11, 20], pa.int64()),
            "text": pa.array([ta, ta, ta, tb, tb, tc]),
            "score": pa.array([5.0, 9.0, 9.0, 1.0, 0.0, 7.0], pa.float64()),
        }
    )


def test_near_dedup_keep_best_max_and_min(ray_session):
    import ray

    from orc_format_ray.ops.dedup import near_dedup_keep_best

    ds = ray.data.from_arrow(_scored_corpus())
    # max: cluster {1,2,3} -> score tie 9.0 breaks to min id 2; {10,11} -> 10
    kept = near_dedup_keep_best(ds, "score", method="jaccard", threshold=0.99).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [2, 10, 20]
    # min: {1,2,3} -> score 5.0 is doc 1; {10,11} -> 11
    kept = near_dedup_keep_best(ds, "score", method="jaccard", threshold=0.99, prefer="min").to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [1, 11, 20]


def test_cluster_survivors_by_score_guards(ray_session):
    import ray

    from orc_format_ray.ops.dedup import cluster_survivors_by_score

    assignment = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "root": pa.array([1, 1], pa.int64())})
    dup = pa.table(
        {
            "doc_id": pa.array([1, 1, 2], pa.int64()),
            "text": pa.array(["x", "y", "z"]),
            "score": pa.array([1.0, 2.0, 3.0], pa.float64()),
        }
    )
    with pytest.raises(Exception, match="duplicate doc_id"):
        cluster_survivors_by_score(ray.data.from_arrow(dup), assignment, "score").to_pandas()
    missing = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array(["x"]), "score": pa.array([1.0])}
    )
    with pytest.raises(Exception, match="missing from corpus"):
        cluster_survivors_by_score(ray.data.from_arrow(missing), assignment, "score").to_pandas()
    with pytest.raises(ValueError, match="prefer must be"):
        cluster_survivors_by_score(ray.data.from_arrow(missing), assignment, "score", prefer="best")


# ---------------------------------------------------------------- Count-Min


def test_countmin_never_undercounts_and_is_layout_invariant(ray_session):
    import ray

    from orc_format_ray.ops.sketch import countmin_counts, countmin_estimate

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["source"])
    sk_a = countmin_counts(ds.repartition(3), "source")
    sk_b = countmin_counts(ds.repartition(17), "source")
    assert np.array_equal(sk_a.m, sk_b.m) and sk_a.n == sk_b.n  # commutative adds
    truth = _con().execute("SELECT source, count(*) c FROM documents GROUP BY source").fetchdf()
    est = countmin_estimate(sk_a, pa.array(truth["source"].tolist()))
    true = truth["c"].to_numpy(np.int64)
    assert (est >= true).all()
    assert sk_a.n == 500
    # wide sketch vs tiny vocab: estimates should be exact here
    assert (est == true).all()


def test_countmin_merge_and_guards():
    from orc_format_ray.ops.sketch import CountMin

    a = CountMin(w=64, d=3, seed=5)
    b = CountMin(w=64, d=3, seed=5)
    h1 = np.array([1, 2, 3, 1], dtype=np.uint64)
    h2 = np.array([1, 9], dtype=np.uint64)
    a.add_hashes(h1)
    b.add_hashes(h2)
    both = CountMin(w=64, d=3, seed=5).add_hashes(h1).add_hashes(h2)
    a.merge(b)
    assert np.array_equal(a.m, both.m) and a.n == both.n == 6
    assert a.estimate_hashes(np.array([1], np.uint64))[0] >= 3
    with pytest.raises(ValueError, match="incompatible"):
        a.merge(CountMin(w=32, d=3, seed=5))
    with pytest.raises(ValueError, match="w >= 2"):
        CountMin(w=1)
