"""Session-10 operator wave: cross-doc shared-gram fractions, temperature
mixture sampling, padding-waste report, Arrow-IPC shards, skew report,
incremental aggregate maintenance, triangle counting, SQ8 ANN. Each test
pins the op against an independent local recompute (DuckDB SQL or exact
construction) at sf0.001."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "events", "lineitem", "orders", "customer", "supplier", "part"]:
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


# ------------------------------------------- cross-doc shared-gram fraction


def test_cross_doc_shared_fraction_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.spans import cross_doc_shared_fraction

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "a b c d e",            # grams: "a b c","b c d","c d e" — 2 shared
                "x a b c d y",          # shares "a b c","b c d"
                "c d e c d e",          # within-doc repeat counts ONCE; "c d e" shared with doc 0
                "short",                # < n words: omitted
            ],
        }
    )
    out = (
        cross_doc_shared_fraction(ray.data.from_pandas(df), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [0, 1, 2]
    # doc0: {abc,bcd,cde} all shared; doc1: {xab,abc,bcd,cdy} 2 shared;
    # doc2: words c d e c d e -> grams cde,dec,ecd,cde -> 3 DISTINCT, 1 shared
    assert out["n_ngrams"].tolist() == [3, 4, 3]
    assert out["n_shared"].tolist() == [3, 2, 1]
    assert out["shared_frac"].tolist() == [1.0, 0.5, 1.0 / 3.0]
    with pytest.raises(ValueError):
        cross_doc_shared_fraction(ray.data.from_pandas(df), n=0)


def test_cross_doc_shared_fraction_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.spans import cross_doc_shared_fraction

    n = 5
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = cross_doc_shared_fraction(ds, n=n).to_pandas()
    want = _con().execute(
        f"""
        WITH parts AS (SELECT doc_id, str_split(text, ' ') AS ws FROM documents),
        dg AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+{n - 1}], ' ') AS ng FROM parts d,
          LATERAL (SELECT unnest(generate_series(1, greatest(len(d.ws)-{n - 1}, 0))) AS i) g),
        cnt AS (SELECT ng, CAST(count(*) AS BIGINT) AS nd FROM dg GROUP BY ng)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_ngrams,
          CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
          CAST(sum(CASE WHEN c.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS shared_frac
        FROM dg JOIN cnt c USING (ng) GROUP BY doc_id
        """
    ).fetchdf()
    for c in ("doc_id", "n_ngrams", "n_shared"):
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)


# -------------------------------------------------- temperature sampling


def test_temperature_quotas_exact_math():
    from orc_format_ray.ops.sample import temperature_quotas

    counts = {"a": 100, "b": 400, "c": 1}
    q = temperature_quotas(counts, budget=50)
    # ws: floor(sqrt)*2^20 -> a: 10*2^20, b: 20*2^20, c: 1*2^20; tw = 31*2^20
    # quotas: ceil(50*10/31)=17, ceil(50*20/31)=33, min(1, ceil(50/31)=2)=1
    assert q == {"a": 17, "b": 33, "c": 1}
    assert temperature_quotas({"x": 0}, 10) == {"x": 0}
    with pytest.raises(ValueError):
        temperature_quotas(counts, 0)


def test_temperature_sample_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.sample import temperature_sample

    B = 120
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "source"])
    got = temperature_sample(ds, budget=B).to_pandas().sort_values("doc_id").reset_index(drop=True)
    want = _con().execute(
        f"""
        WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS ns FROM documents GROUP BY source),
        w AS (SELECT source, ns, CAST(floor(sqrt(CAST(ns AS DOUBLE)) * 1048576.0) AS BIGINT) AS ws FROM n),
        t AS (SELECT CAST(sum(ws) AS BIGINT) AS tw FROM w),
        k AS (SELECT source, least(ns, ({B} * ws + tw - 1) // tw) AS ks FROM w, t),
        r AS (SELECT doc_id, lang, source,
              row_number() OVER (PARTITION BY source
                ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
              FROM documents)
        SELECT r.doc_id, r.lang, r.source FROM r JOIN k USING (source)
        WHERE r.rn <= k.ks ORDER BY r.doc_id
        """
    ).fetchdf()
    want["doc_id"] = want["doc_id"].astype("int64")
    _assert_frames_equal(got, want)
    # per-stratum quota dict path: a quota of 0 excludes the stratum
    from orc_format_ray.ops.sample import stratified_sample

    only = stratified_sample(ds, {"src0": 3}, stratum="source").to_pandas()
    assert set(only["source"]) == {"src0"} and len(only) == 3


# ----------------------------------------------------- padding-waste report


def test_padding_waste_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.pack import padding_waste

    B = 32
    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "n_chars"])
    got = (
        padding_waste(ds.repartition(7), batch_rows=B, length="n_chars")
        .to_pandas().sort_values("batch_id").reset_index(drop=True)
    )
    want = _con().execute(
        f"""
        WITH r AS (SELECT n_chars,
          row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn FROM documents)
        SELECT (rn - 1) // {B} AS batch_id, CAST(count(*) AS BIGINT) AS n_rows,
          CAST(max(n_chars) AS BIGINT) AS max_len, CAST(sum(n_chars) AS BIGINT) AS sum_len,
          CAST(count(*) * max(n_chars) - sum(n_chars) AS BIGINT) AS waste
        FROM r GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    want["batch_id"] = want["batch_id"].astype("int64")
    _assert_frames_equal(got, want)
    # waste of a batch of identical lengths is 0; total rows preserved
    assert got["n_rows"].sum() == 500
    with pytest.raises(ValueError):
        padding_waste(ds, batch_rows=0, length="n_chars")


def test_padding_waste_small_semantics(ray_session):
    import ray.data

    from orc_format_ray.ops.pack import padding_waste

    df = pd.DataFrame({"doc_id": [0, 1, 2, 3, 4], "n_tok": [10, 7, 7, 3, 1]})
    out = (
        padding_waste(ray.data.from_pandas(df), batch_rows=2)
        .to_pandas().sort_values("batch_id").reset_index(drop=True)
    )
    # order: 10,7,7,3,1 -> batches [10,7] [7,3] [1]
    assert out["batch_id"].tolist() == [0, 1, 2]
    assert out["n_rows"].tolist() == [2, 2, 1]
    assert out["max_len"].tolist() == [10, 7, 1]
    assert out["waste"].tolist() == [2 * 10 - 17, 2 * 7 - 10, 0]


# ------------------------------------------------------- Arrow IPC shards


def test_ipc_shards_full_fidelity_roundtrip(ray_session):
    import glob
    import shutil

    import ray.data

    from orc_format_ray.ops.ipcshard import read_ipc_shards, write_ipc_shards

    scratch = "/tmp/orc_test_ipc"
    shutil.rmtree(scratch, ignore_errors=True)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    man = write_ipc_shards(ds.repartition(5), scratch, key_col="vec_id", rows_per_shard=128)
    assert man["n_rows"].sum() == 500
    back = read_ipc_shards(scratch).to_pandas().sort_values("vec_id").reset_index(drop=True)
    orig = ds.to_pandas().sort_values("vec_id").reset_index(drop=True)
    assert back["label"].tolist() == orig["label"].tolist()
    assert all(np.array_equal(a, b) for a, b in zip(back["embedding"], orig["embedding"]))
    # nested list<float> survives EXACTLY (no JSON float round-trip), and
    # int32 label keeps its width (file is the schema authority)
    sch = read_ipc_shards(scratch).schema()
    assert str(dict(zip(sch.names, sch.types))["label"]) == "int32"

    # byte-identical re-run over the same pinned layout
    files = sorted(glob.glob(f"{scratch}/*.arrow"))
    before = {f: open(f, "rb").read() for f in files}
    mat = ds.repartition(5)
    write_ipc_shards(mat, scratch, key_col="vec_id", rows_per_shard=128)
    for f in files:
        assert open(f, "rb").read() == before[f], f

    # compressed variant round-trips too
    shutil.rmtree(scratch)
    write_ipc_shards(ds.repartition(3), scratch, key_col="vec_id",
                     rows_per_shard=200, compress=True)
    back_z = read_ipc_shards(scratch, columns=["vec_id"]).to_pandas()
    assert sorted(back_z["vec_id"]) == sorted(orig["vec_id"])

    # duplicate keys rejected loudly
    dup = ray.data.from_pandas(pd.DataFrame({"vec_id": [1, 1], "x": [2, 3]}))
    with pytest.raises(Exception):
        write_ipc_shards(dup, scratch + "_dup", key_col="vec_id")


# ------------------------------------------------------------- skew report


def test_skew_report_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import skew_report

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    got = skew_report(ds.repartition(5), "user_id", k=10)
    want = _con().execute(
        """
        WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1),
        t AS (SELECT CAST(sum(cnt) AS BIGINT) AS n, CAST(count(*) AS BIGINT) AS nd FROM c)
        SELECT user_id, cnt, CAST(cnt AS DOUBLE)/n AS share, CAST(cnt*nd AS DOUBLE)/n AS skew
        FROM c, t ORDER BY cnt DESC, user_id LIMIT 10
        """
    ).fetchdf()
    for c in ("user_id", "cnt"):
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)
    with pytest.raises(ValueError):
        skew_report(ds, "user_id", k=0)


# ------------------------------------------- incremental aggregate states


def test_incremental_agg_equals_full_recompute(ray_session):
    import pyarrow.compute as pc
    import ray.data

    from orc_format_ray.ops.incr import agg_state, finalize_state, merge_agg_states

    ev = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_id", "event_type", "value"])

    def cents(b: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(b["value"], 100.0), 0.5)), pa.int64())
        return pa.table({"event_id": b["event_id"], "event_type": b["event_type"], "cents": c})

    u = ev.map_batches(cents, batch_format="pyarrow", zero_copy_batch=True)
    base = u.filter(lambda r: r["event_id"] % 10 != 0)
    delta = u.filter(lambda r: r["event_id"] % 10 == 0)
    merged = merge_agg_states(
        [agg_state(base, "event_type", ["cents"]), agg_state(delta, "event_type", ["cents"])],
        "event_type", ["cents"],
    )
    got = finalize_state(merged, ["cents"]).to_pandas().sort_values("event_type").reset_index(drop=True)
    full = finalize_state(agg_state(u, "event_type", ["cents"]), ["cents"]).to_pandas() \
        .sort_values("event_type").reset_index(drop=True)
    _assert_frames_equal(got, full)  # incremental == full recompute, bitwise
    want = _con().execute(
        """
        WITH u AS (SELECT event_type, CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(c) AS BIGINT) AS cents_sum,
          CAST(min(c) AS BIGINT) AS cents_min, CAST(max(c) AS BIGINT) AS cents_max,
          CAST(CAST(sum(c) AS BIGINT) AS DOUBLE) / count(*) AS cents_mean
        FROM u GROUP BY 1
        """
    ).fetchdf()
    for c in ("n", "cents_sum", "cents_min", "cents_max"):
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)
    # float columns rejected loudly (quantize first)
    with pytest.raises(Exception):
        agg_state(ev, "event_type", ["value"]).to_pandas()


# --------------------------------------------------------- triangle count


def test_triangle_count_small(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import triangle_count

    # K4 on {0,1,2,3} has 4 triangles; extra pendant edge adds none;
    # duplicates/self-loops/reversed edges collapse
    edges = pd.DataFrame({
        "src": [0, 0, 0, 1, 1, 2, 2, 3, 4, 5, 5],
        "dst": [1, 2, 3, 2, 3, 3, 1, 0, 5, 4, 5],
    })
    out = triangle_count(ray.data.from_pandas(edges)).to_pandas().sort_values("node")
    assert dict(zip(out["node"], out["n_triangles"])) == {0: 3, 1: 1}
    assert out["n_triangles"].sum() == 4


def test_triangle_count_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import triangle_count

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def derive(b: pa.Table) -> pa.Table:
        o = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (o + p) % 5 == 0
        return pa.table({"src": pa.array(o[keep] % 499, pa.int64()),
                         "dst": pa.array(p[keep] % 499, pa.int64())})

    ed = li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    got = triangle_count(ed).to_pandas().sort_values("node").reset_index(drop=True)
    want = _con().execute(
        """
        WITH raw AS (SELECT l_orderkey % 499 AS x, l_partkey % 499 AS y FROM lineitem
                     WHERE (l_orderkey + l_partkey) % 5 = 0),
        e AS (SELECT DISTINCT least(x,y) AS a, greatest(x,y) AS b FROM raw WHERE x <> y)
        SELECT e1.a AS node, CAST(count(*) AS BIGINT) AS n_triangles
        FROM e e1 JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
        GROUP BY e1.a ORDER BY node
        """
    ).fetchdf()
    want["node"] = want["node"].astype("int64")
    _assert_frames_equal(got, want)


# ----------------------------------------------------------------- SQ8 ANN


def test_sq8_roundtrip_error_bound_and_recall(ray_session):
    import ray.data

    from orc_format_ray.ops import similarity as sim

    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    p = sim.SQ8Params.train(ds)
    # params are layout-invariant (min/max fold is commutative)
    p2 = sim.SQ8Params.train(ds.repartition(7))
    assert np.array_equal(p.lo, p2.lo) and np.array_equal(p.span, p2.span)

    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    x = np.array(tbl["embedding"].to_pylist(), dtype=np.float32)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    codes = p.encode(x)
    recon = p.decode(codes)
    # per-dim quantization error <= half a step
    assert np.max(np.abs(recon - xn)) <= (p.span.max() / 255.0) / 2 + 1e-6

    # SQ8 approximate top-1 (excluding self) matches brute force on >= 90%
    # of probes — embedding-quality gate, pinned loosely
    q = xn[:20]
    codes_ds = sim.sq8_encode(ds, p).materialize()
    approx = sim.sq8_topk(codes_ds, p, q, k=2).to_pandas()
    exact = sim.brute_force_topk(ds, q, k=2).to_pandas()

    def top_nonself(df, qi):
        sub = df[df["query_id"] == qi].sort_values(["score", "vec_id"], ascending=[False, True])
        sub = sub[sub["vec_id"] != tbl["vec_id"][qi].as_py()]
        return int(sub.iloc[0]["vec_id"]) if len(sub) else -1

    agree = sum(top_nonself(approx, i) == top_nonself(exact, i) for i in range(20))
    assert agree >= 18, agree


def test_sq8_planted_duplicates_exact_after_rerank(ray_session):
    import pyarrow.parquet as pq
    import ray.data

    from orc_format_ray.ops import similarity as sim

    head = pq.read_table(
        f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"], filters=[("vec_id", "<", 5)]
    ).sort_by("vec_id")
    copies = pa.table({
        "vec_id": pa.array([v + 100_000 for v in head["vec_id"].to_pylist()], pa.int64()),
        "embedding": head["embedding"],
    })
    aug = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"]).union(
        ray.data.from_arrow(copies)
    ).materialize()
    p = sim.SQ8Params.train(aug)
    codes = sim.sq8_encode(aug, p).materialize()
    q = np.array(head["embedding"].to_pylist(), dtype=np.float64)
    top = sim.sq8_topk(codes, p, q, k=10, exact_rerank_ds=aug, rerank_depth=64).to_pandas()
    for qi, orig in enumerate(head["vec_id"].to_pylist()):
        cand = top[(top["query_id"] == qi) & (top["vec_id"] >= 100_000)]
        assert int(cand.iloc[0]["vec_id"]) == orig + 100_000
        assert cand.iloc[0]["score"] == 1.0


# ------------------------------------------------ trailing RANGE window


def test_trailing_window_agg_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import trailing_window_agg

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    got = (
        trailing_window_agg(ds.repartition(9), window_us=3_600_000_000)
        .to_pandas().sort_values(["user_id", "ts_us"]).reset_index(drop=True)
    )
    want = _con().execute(
        """
        WITH u AS (SELECT user_id, ts, CAST(floor(value*100 + 0.5) AS BIGINT) AS c FROM events)
        SELECT user_id, epoch_us(ts) AS ts_us,
          CAST(count(*) OVER w AS BIGINT) AS w_cnt,
          CAST(sum(c) OVER w AS BIGINT) AS w_sum
        FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
        ORDER BY user_id, ts_us
        """
    ).fetchdf()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)


def test_trailing_window_agg_carry_across_blocks(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import trailing_window_agg

    # one key, many tiny blocks: every window straddles block boundaries
    n = 200
    df = pd.DataFrame({
        "user_id": np.zeros(n, dtype=np.int64),
        "ts": pd.to_datetime(np.arange(n) * 1_000_000, unit="us"),
        "value": np.arange(n, dtype=np.float64) / 100.0,  # units = row index
    })
    ds = ray.data.from_pandas(df).repartition(23)
    out = trailing_window_agg(ds, window_us=5_000_000).to_pandas().sort_values("ts_us")
    # window = trailing 5 seconds + current = up to 6 rows at 1s cadence
    expect_cnt = np.minimum(np.arange(n) + 1, 6)
    assert out["w_cnt"].tolist() == expect_cnt.tolist()
    i = np.arange(n)
    lo = np.maximum(i - 5, 0)
    expect_sum = (i * (i + 1)) // 2 - (lo * (lo - 1)) // 2 - lo * 0  # sum lo..i
    expect_sum = np.array([np.arange(l, j + 1).sum() for l, j in zip(lo, i)])
    assert out["w_sum"].tolist() == expect_sum.tolist()
    # duplicate (key, ts) rejected loudly
    dup = pd.concat([df.iloc[:3], df.iloc[2:3]], ignore_index=True)
    with pytest.raises(Exception):
        trailing_window_agg(ray.data.from_pandas(dup), window_us=5_000_000).to_pandas()


# ------------------------------------------------------------------ TF-IDF


def test_tfidf_top_terms_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.text import tfidf_top_terms

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["source", "text"])
    got = tfidf_top_terms(ds.repartition(7), k=5).to_pandas()
    want = _con().execute(
        r"""
        WITH w AS (SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS word
          FROM documents WHERE trim(text) <> ''),
        c AS (SELECT source, word, CAST(count(*) AS BIGINT) AS tf FROM w GROUP BY 1, 2),
        d AS (SELECT word, CAST(count(*) AS BIGINT) AS df
          FROM (SELECT DISTINCT source, word FROM w) GROUP BY 1),
        n AS (SELECT CAST(count(DISTINCT source) AS BIGINT) AS ns FROM documents),
        s AS (SELECT c.source, c.word, c.tf, d.df,
          CAST(c.tf AS DOUBLE) * ln(CAST(ns AS DOUBLE) / d.df) AS score
          FROM c JOIN d USING (word), n),
        r AS (SELECT *, row_number() OVER (PARTITION BY source ORDER BY score DESC, word) rn FROM s)
        SELECT source, word, tf, df, score FROM r WHERE rn <= 5
        ORDER BY source, score DESC, word
        """
    ).fetchdf()
    for c in ("tf", "df"):
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)
    # corpus-wide words (df == n_groups) score exactly 0
    assert (got.loc[got["df"] == got["df"].max(), "score"] >= 0).all()


# ------------------------------------------------------ HLL overlap matrix


def test_hll_overlap_matrix_accuracy_and_invariance(ray_session):
    import ray.data

    from orc_format_ray.ops.sketch import hll_overlap_matrix

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    m1 = hll_overlap_matrix(ds.repartition(3), "event_type", "user_id")
    m2 = hll_overlap_matrix(ds.repartition(17), "event_type", "user_id")
    # layout-invariant: register max is commutative/idempotent
    pd.testing.assert_frame_equal(m1, m2)

    exact = _con().execute(
        """
        WITH p AS (SELECT DISTINCT event_type, user_id FROM events)
        SELECT a.event_type AS ga, b.event_type AS gb,
          CAST(count(*) AS BIGINT) AS inter
        FROM p a JOIN p b ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
        """
    ).fetchdf()
    ex = {(r.ga, r.gb): int(r.inter) for r in exact.itertuples()}
    for r in m1.itertuples():
        true = ex.get((r.group_a, r.group_b), 0)
        # tiny cardinalities ride linear counting: estimates land within 5%+2
        assert abs(r.est_intersection - true) <= 0.05 * max(true, 1) + 2, (r, true)
        assert 0.0 <= r.jaccard_est <= 1.0


# -------------------------------------------------------------------- k-core


def _peel_exact(pairs: set, k: int) -> dict:
    """Reference k-core by naive peeling over a canonical edge set."""
    adj: dict = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return {n: len(s) for n, s in adj.items()}


def test_kcore_vs_exact_peel(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import kcore

    # K4 (nodes 0-3) + a tail 3-4-5: 3-core is exactly the K4
    edges = pd.DataFrame({
        "src": [0, 0, 0, 1, 1, 2, 3, 4],
        "dst": [1, 2, 3, 2, 3, 3, 4, 5],
    })
    out = kcore(ray.data.from_pandas(edges), k=3).to_pandas().sort_values("node")
    assert out["node"].tolist() == [0, 1, 2, 3]
    assert out["degree"].tolist() == [3, 3, 3, 3]

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey", "l_partkey"])

    def derive(b: pa.Table) -> pa.Table:
        o = b["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        p = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (o + p) % 5 == 0
        return pa.table({"src": pa.array(o[keep] % 499, pa.int64()),
                         "dst": pa.array(p[keep] % 499, pa.int64())})

    ed = li.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    got = kcore(ed, k=4).to_pandas().sort_values("node").reset_index(drop=True)
    raw = _con().execute(
        """SELECT DISTINCT least(l_orderkey % 499, l_partkey % 499) a,
           greatest(l_orderkey % 499, l_partkey % 499) b FROM lineitem
           WHERE (l_orderkey + l_partkey) % 5 = 0 AND l_orderkey % 499 <> l_partkey % 499"""
    ).fetchall()
    want = _peel_exact({(int(a), int(b)) for a, b in raw}, k=4)
    assert dict(zip(got["node"], got["degree"])) == want
    # empty core comes back typed
    none = kcore(ray.data.from_pandas(edges), k=10).to_pandas()
    assert len(none) == 0


# ------------------------------------------------------- interval coverage


def test_interval_coverage_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import interval_coverage

    D = 1_800_000_000
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts"])
    got = (
        interval_coverage(ds.repartition(9), dur_us=D)
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    )
    want = _con().execute(
        f"""
        WITH iv AS (SELECT user_id, epoch_us(ts) AS s, epoch_us(ts) + {D} AS e FROM events),
        o AS (SELECT user_id, s, e, max(e) OVER (PARTITION BY user_id ORDER BY s, e
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm FROM iv),
        g AS (SELECT *, sum(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY s, e ROWS UNBOUNDED PRECEDING) AS isl FROM o),
        m AS (SELECT user_id, isl, min(s) AS s0, max(e) AS e1 FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_islands,
          CAST(sum(e1 - s0) AS BIGINT) AS covered_us,
          CAST(max(e1) - min(s0) AS BIGINT) AS span_us
        FROM m GROUP BY 1 ORDER BY 1
        """
    ).fetchdf()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)

    # hand-checked: [0,10) [5,15) merge; [20,30) separate; touching [15,25) merges
    df = pd.DataFrame({
        "user_id": [1, 1, 1, 2],
        "ts": pd.to_datetime([0, 5, 20, 15], unit="us"),
    })
    out = interval_coverage(ray.data.from_pandas(df), dur_us=10).to_pandas().sort_values("user_id")
    assert out[out.user_id == 1].iloc[0].tolist() == [1, 2, 25, 30]
    assert out[out.user_id == 2].iloc[0].tolist() == [2, 1, 10, 10]


# ----------------------------------------------------- bipartite projection


def test_bipartite_projection_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import bipartite_projection

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_suppkey", "l_partkey"])
    got = (
        bipartite_projection(li.repartition(7), left="l_suppkey", right="l_partkey")
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    )
    want = _con().execute(
        """
        WITH c AS (SELECT DISTINCT l_partkey AS r, l_suppkey AS l FROM lineitem),
        p AS (SELECT a.l AS a, b.l AS b, CAST(count(*) AS BIGINT) AS weight
              FROM c a JOIN c b ON a.r = b.r AND a.l < b.l GROUP BY 1, 2)
        SELECT a, b, weight FROM p ORDER BY a, b
        """
    ).fetchdf()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)
    # hot-right-node guard fires
    hot = pd.DataFrame({"src": np.arange(100, dtype=np.int64),
                        "dst": np.zeros(100, dtype=np.int64)})
    with pytest.raises(Exception):
        bipartite_projection(ray.data.from_pandas(hot), max_right_degree=10).to_pandas()


# ------------------------------------------------------- referential audit


def test_referential_audit(ray_session):
    import ray.data

    from orc_format_ray.ops.join import referential_audit

    li = ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=["l_orderkey"])
    od = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey"])
    out = referential_audit(li, od, fk="l_orderkey", pk="o_orderkey")
    want = _con().execute(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_child_rows,
          CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_child_keys,
          CAST(count(DISTINCT CASE WHEN o IS NULL THEN l_orderkey END) AS BIGINT) AS n_orphan_keys,
          CAST(sum(CASE WHEN o IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_orphan_rows
        FROM (SELECT l.l_orderkey, o.o_orderkey AS o FROM lineitem l
              LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey)
        """
    ).fetchdf()
    for c in want.columns:
        want[c] = want[c].astype("int64")
    _assert_frames_equal(out, want)

    # planted orphans are counted at both key and row granularity
    child = ray.data.from_pandas(pd.DataFrame({"fk": [1, 1, 2, 3, 3, 3]}))
    parent = ray.data.from_pandas(pd.DataFrame({"pk": [1, 2]}))
    got = referential_audit(child, parent, fk="fk", pk="pk")
    assert got.iloc[0].tolist() == [6, 3, 1, 3]


# --------------------------------------------------- decayed contributions


def test_decayed_contributions_vs_sql(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import decayed_contributions

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["user_id", "ts", "value"])
    got = (
        decayed_contributions(ds.repartition(5), tau_hours=24.0)
        .to_pandas().sort_values(["user_id", "ts_us"]).reset_index(drop=True)
    )
    want = _con().execute(
        """
        WITH t AS (SELECT max(epoch_us(ts)) AS tr FROM events),
        u AS (SELECT user_id, epoch_us(ts) AS ts_us,
              CAST(floor(value*100 + 0.5) AS BIGINT) AS units,
              (t.tr - epoch_us(ts)) // 3600000000 AS age_h FROM events, t)
        SELECT user_id, ts_us, units,
          CAST(units AS DOUBLE) * exp(-(CAST(age_h AS DOUBLE) / 24.0)) AS term
        FROM u ORDER BY user_id, ts_us
        """
    ).fetchdf()
    for c in ("user_id", "ts_us", "units"):
        want[c] = want[c].astype("int64")
    _assert_frames_equal(got, want)  # bitwise: libm exp on exact int hours


# ---------------------------------------------- per-group heavy hitters


def test_heavy_hitters_by_group_mg_bound(ray_session):
    import ray.data

    from orc_format_ray.ops.sketch import heavy_hitters_by_group

    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    k = 8
    out = heavy_hitters_by_group(ds.repartition(7), "event_type", "user_id", k=k).to_pandas()
    truth = _con().execute(
        "SELECT event_type, user_id, CAST(count(*) AS BIGINT) c FROM events GROUP BY 1,2"
    ).fetchdf()
    n_per_g = truth.groupby("event_type")["c"].sum().to_dict()
    t = {(r.event_type, r.user_id): int(r.c) for r in truth.itertuples()}
    assert (out.groupby("event_type").size() <= k).all()
    for r in out.itertuples():
        true = t.get((r.event_type, r.item), 0)
        # MG bound within the group: true - n_g/(k+1) <= est <= true
        assert r.est <= true, (r, true)
        assert r.est >= true - n_per_g[r.event_type] // (k + 1) - 1, (r, true)
