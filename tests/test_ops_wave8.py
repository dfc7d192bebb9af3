"""Session-8 operator wave: PMI collocations, Gopher quality rules,
compression-ratio signal, top user paths, concentration curve, quantized
linear inference. Each test pins the op against an independent local
recompute (DuckDB SQL or direct Python) at sf0.001."""

import zlib

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in [
        "documents", "orders", "events", "embeddings",
        "customer", "lineitem", "supplier", "nation", "region",
    ]:
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
        elif av.dtype == object or bv.dtype == object:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c
        else:
            assert np.array_equal(av, bv), c


def test_pmi_collocations_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.colloc import pmi_collocations

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = pmi_collocations(docs, min_word_docs=4, min_pair_docs=4).to_pandas()
    want = _con().execute(
        r"""
WITH w AS (
  SELECT DISTINCT d.doc_id, t.w
  FROM documents d, unnest(string_split_regex(trim(d.text), '\s+')) AS t(w)
  WHERE trim(d.text) <> ''
), n AS (SELECT count(*) AS n_docs FROM documents),
df AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY w),
elig AS (SELECT w, c FROM df WHERE c >= 4),
pairs AS (
  SELECT a.w AS item_a, b.w AS item_b, CAST(count(*) AS BIGINT) AS pair_docs
  FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
  JOIN elig ea ON ea.w = a.w JOIN elig eb ON eb.w = b.w
  GROUP BY a.w, b.w HAVING count(*) >= 4
)
SELECT p.item_a, p.item_b, p.pair_docs,
  ln(CAST(p.pair_docs * n.n_docs AS DOUBLE) / CAST(ea.c * eb.c AS DOUBLE)) AS pmi
FROM pairs p CROSS JOIN n
JOIN elig ea ON ea.w = p.item_a JOIN elig eb ON eb.w = p.item_b
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)


def test_pmi_symmetric_pair_invariants(ray_session):
    import ray

    from orc_format_ray.ops.colloc import pmi_collocations

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    df = pmi_collocations(docs, min_word_docs=4, min_pair_docs=4).to_pandas()
    # pairs are canonical (a < b) and unique
    assert (df["item_a"] < df["item_b"]).all()
    assert not df.duplicated(subset=["item_a", "item_b"]).any()


def test_gopher_rules_matches_sql(ray_session):
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops.quality import gopher_rules

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = docs.map_batches(
        gopher_rules, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    ).to_pandas()
    want = _con().execute(
        r"""
WITH base AS (SELECT doc_id, trim(text) AS t FROM documents WHERE trim(text) <> ''),
words AS (SELECT doc_id, w FROM base, unnest(string_split_regex(t, '\s+')) AS u(w)),
ws AS (SELECT doc_id, CAST(count(*) AS BIGINT) nw, CAST(sum(length(w)) AS BIGINT) sl,
       CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) aw,
       CAST(sum(CASE WHEN w IN ('the','be','to','of','and','that','have','with') THEN 1 ELSE 0 END) AS BIGINT) sh
   FROM words GROUP BY doc_id),
ls AS (SELECT doc_id, CAST(count(*) AS BIGINT) nl,
       CAST(sum(CASE WHEN ltrim(l, ' ') LIKE '-%' OR ltrim(l, ' ') LIKE '*%' OR ltrim(l, ' ') LIKE '•%' THEN 1 ELSE 0 END) AS BIGINT) bl
   FROM (SELECT doc_id, l FROM base, unnest(string_split(t, chr(10))) AS u(l)) GROUP BY doc_id)
SELECT ws.doc_id, nw AS n_words,
   CAST(sl AS DOUBLE)/CAST(nw AS DOUBLE) AS mean_word_len,
   CAST(aw AS DOUBLE)/CAST(nw AS DOUBLE) AS frac_alpha_words,
   sh AS stop_hits,
   CAST(bl AS DOUBLE)/CAST(nl AS DOUBLE) AS frac_bullet_lines,
   (nw >= 5 AND nw <= 100000
    AND CAST(sl AS DOUBLE)/CAST(nw AS DOUBLE) >= 3.0 AND CAST(sl AS DOUBLE)/CAST(nw AS DOUBLE) <= 10.0
    AND CAST(aw AS DOUBLE)/CAST(nw AS DOUBLE) >= 0.8 AND sh >= 2) AS keep
FROM ws JOIN ls ON ws.doc_id = ls.doc_id
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)


def test_gopher_rules_synthetic_edges(ray_session):
    """Bullet lines, short docs, and symbol-heavy docs hit the intended rules."""
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops.quality import gopher_rules

    rows = {
        "doc_id": [1, 2, 3, 4],
        "text": [
            "- one\n- two\n- three",  # all bullet lines, 6 words
            "the and to of be that have with more words here now",  # stopword-rich
            "xx",  # 1 short word -> fails min_words
            "   ",  # empty after trim -> dropped
        ],
    }
    ds = ray.data.from_arrow(pa.table(rows))
    df = (
        ds.map_batches(gopher_rules, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .to_pandas()
        .set_index("doc_id")
    )
    assert 4 not in df.index
    assert df.loc[1, "frac_bullet_lines"] == 1.0
    assert df.loc[2, "stop_hits"] == 8
    assert df.loc[3, "n_words"] == 1 and not df.loc[3, "keep"]


def test_compression_signal_exact(ray_session):
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops.quality import compression_signal

    docs = ray.data.read_parquet(f"{SF}/documents.parquet")
    got = (
        docs.map_batches(
            compression_signal, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pdf = _con().execute("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchdf()
    raw = pdf["text"].str.encode("utf-8").str.len().to_numpy(np.int64)
    comp = np.fromiter(
        (len(zlib.compress(t.encode("utf-8"), 6)) for t in pdf["text"]),
        count=len(pdf),
        dtype=np.int64,
    )
    assert np.array_equal(got["doc_id"].to_numpy(np.int64), pdf["doc_id"].to_numpy(np.int64))
    assert np.array_equal(got["raw_bytes"].to_numpy(np.int64), raw)
    assert np.array_equal(got["comp_bytes"].to_numpy(np.int64), comp)
    expect_ratio = comp.astype(np.float64) / np.maximum(raw, 1).astype(np.float64)
    assert np.array_equal(got["compress_ratio"].to_numpy(np.float64), expect_ratio)
    # repetitive text compresses much better than typical prose
    rep = len(zlib.compress(b"spam " * 200, 6)) / 1000.0
    assert rep < got["compress_ratio"].median()


def test_top_user_paths_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.paths import top_user_paths

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    got = top_user_paths(ev, k=3).to_pandas()
    want = _con().execute(
        """
WITH ranked AS (
  SELECT user_id, event_type, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) rn
  FROM events WHERE user_id IS NOT NULL),
paths AS (
  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
  FROM ranked WHERE rn <= 3 GROUP BY user_id)
SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM paths GROUP BY path
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)


def test_top_user_paths_partial_fold_boundary(ray_session):
    """A user whose first-k events straddle blocks must still fold to ONE
    path: repartition to many tiny blocks and require identical output."""
    import ray

    from orc_format_ray.ops.paths import top_user_paths

    ev = ray.data.read_parquet(f"{SF}/events.parquet")
    base = top_user_paths(ev, k=3).to_pandas()
    shredded = top_user_paths(ev.repartition(37), k=3).to_pandas()
    _assert_frames_equal(base, shredded)


def test_concentration_curve_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.pareto import concentration_curve

    orders = ray.data.read_parquet(f"{SF}/orders.parquet")
    got = concentration_curve(orders, key="o_custkey", value_col="o_totalprice")
    want = _con().execute(
        """
WITH agg AS (
  SELECT o_custkey, CAST(sum(CAST(floor(o_totalprice*100 + 0.5) AS BIGINT)) AS BIGINT) units
  FROM orders WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL GROUP BY o_custkey),
r AS (SELECT o_custkey, units,
      row_number() OVER (ORDER BY units DESC, o_custkey) AS rank,
      CAST(sum(units) OVER (ORDER BY units DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS BIGINT) cum
      FROM agg),
t AS (SELECT CAST(sum(units) AS BIGINT) total FROM agg)
SELECT o_custkey, units, rank, CAST(cum AS DOUBLE)/CAST(total AS DOUBLE) AS cum_share
FROM r CROSS JOIN t
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)
    # curve invariants: rank 1..n, monotone nondecreasing share ending at 1.0
    assert got["rank"].tolist() == list(range(1, len(got) + 1))
    cs = got["cum_share"].to_numpy()
    assert (np.diff(cs) >= 0).all() and cs[-1] == 1.0


def test_linear_score_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.infer import linear_score

    emb = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    dim = len(_con().execute("SELECT embedding FROM embeddings LIMIT 1").fetchone()[0])
    got = linear_score(emb, dim=dim).to_pandas()
    want = _con().execute(
        """
WITH q AS (
  SELECT vec_id, j,
    CAST(floor(CAST(embedding[j] AS DOUBLE)*4096 + 0.5) AS BIGINT) AS qx,
    CAST(((j * 2654435761) % 4294967296) % 8193 AS BIGINT) - 4096 AS qw
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS u(j))
SELECT vec_id, CAST(sum(qx*qw) AS BIGINT) AS score_units,
  CAST(CAST(sum(qx*qw) AS BIGINT) AS DOUBLE)/4096.0 AS score,
  CASE WHEN CAST(sum(qx*qw) AS BIGINT) >= 0 THEN 1 ELSE 0 END AS label_pred
FROM q GROUP BY vec_id
"""
    ).fetchdf()
    assert len(got) == 500
    _assert_frames_equal(got, want)


def test_linear_score_rejects_ragged_vectors(ray_session):
    import ray

    from orc_format_ray.ops.infer import linear_score

    t = pa.table(
        {"vec_id": [0, 1], "embedding": [[0.1, 0.2], [0.3, 0.4, 0.5]]}
    )
    ds = ray.data.from_arrow(t)
    with pytest.raises(Exception, match="fixed"):
        linear_score(ds, dim=2).to_pandas()


def test_knuth_weights_formula():
    from orc_format_ray.ops.infer import knuth_weights

    w = knuth_weights(8)
    expect = [((j * 2654435761) % (1 << 32)) % 8193 - 4096 for j in range(1, 9)]
    assert w.tolist() == expect
    assert w.dtype == np.int64


def test_tpch_q3_matches_sql(ray_session):
    from orc_format_ray.pipelines.tpch import q3_shipping_priority

    got = q3_shipping_priority(SF)
    want = _con().execute(
        """
WITH li AS (
  SELECT l_orderkey,
    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS u
  FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-01-01'),
agg AS (SELECT l_orderkey, CAST(sum(u) AS BIGINT) AS revenue_units FROM li GROUP BY l_orderkey)
SELECT o.o_orderkey, a.revenue_units,
  CAST(a.revenue_units AS DOUBLE)/10000.0 AS revenue,
  epoch_ms(o.o_orderdate) AS o_orderdate_ms, o.o_orderpriority
FROM agg a JOIN orders o ON a.l_orderkey = o.o_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < TIMESTAMP '1998-01-01'
ORDER BY a.revenue_units DESC, o_orderdate_ms, o.o_orderkey LIMIT 10
"""
    ).fetchdf()
    assert len(got) == 10
    # ordered comparison: top-k output order is part of the contract
    for c in got.columns:
        av, bv = got[c].to_numpy(), want[c].to_numpy()
        if av.dtype == object:
            assert (got[c].astype(str) == want[c].astype(str)).all(), c
        else:
            assert np.array_equal(av, bv), c


def test_tpch_q5_matches_sql(ray_session):
    from orc_format_ray.pipelines.tpch import q5_local_supplier_volume

    got = q5_local_supplier_volume(SF)
    want = _con().execute(
        """
WITH li AS (
  SELECT l_orderkey, l_suppkey,
    CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount*100 + 0.5) AS BIGINT)) AS u
  FROM lineitem)
SELECT n.n_name, CAST(sum(li.u) AS BIGINT) AS revenue_units,
  CAST(CAST(sum(li.u) AS BIGINT) AS DOUBLE)/10000.0 AS revenue
FROM li JOIN orders o ON li.l_orderkey = o.o_orderkey
JOIN supplier s ON li.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA' AND o.o_orderdate >= TIMESTAMP '1996-01-01' AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name ORDER BY revenue_units DESC, n.n_name
"""
    ).fetchdf()
    assert len(got) == len(want) and len(got) >= 1
    for c in got.columns:
        av, bv = got[c].to_numpy(), want[c].to_numpy()
        if av.dtype == object:
            assert (got[c].astype(str) == want[c].astype(str)).all(), c
        else:
            assert np.array_equal(av, bv), c


def test_tpch_empty_selections_keep_columns(ray_session):
    """Empty segment/region/date selections must return typed empty frames
    (fully-empty Datasets drop columns in to_pandas — CLAUDE.md guard)."""
    from orc_format_ray.pipelines.tpch import q3_shipping_priority, q5_local_supplier_volume

    e1 = q3_shipping_priority(SF, segment="NO_SUCH_SEGMENT")
    assert len(e1) == 0
    assert list(e1.columns) == ["o_orderkey", "revenue_units", "revenue", "o_orderdate_ms", "o_orderpriority"]
    e2 = q5_local_supplier_volume(SF, region="ATLANTIS")
    assert len(e2) == 0
    assert list(e2.columns) == ["n_name", "revenue_units", "revenue"]
    e3 = q3_shipping_priority(SF, cut_date="1990-01-01")
    assert len(e3) == 0


def test_select_by_budget_grouped_matches_sql(ray_session):
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops import sample, text as tx

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    meta = ds.map_batches(tx.quality_score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def to_cols(batch):
        return pa.table(
            {
                "source": batch["source"],
                "doc_id": batch["doc_id"],
                "score": batch["tok_count"],
                "n_tok": batch["tok_count"],
            }
        )

    meta = meta.map_batches(to_cols, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    budgets = {"src0": 800, "src1": 500, "src2": 300, "src3": 1000}
    got = sample.select_by_budget_grouped(meta, budgets).to_pandas()
    tok = r"CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END"
    want = _con().execute(
        f"""
WITH b(source, budget) AS (VALUES ('src0', 800), ('src1', 500), ('src2', 300), ('src3', 1000)),
m AS (SELECT source, doc_id, CAST({tok} AS BIGINT) AS n_tok FROM documents),
c AS (SELECT source, doc_id, n_tok AS score, n_tok,
      SUM(n_tok) OVER (PARTITION BY source ORDER BY n_tok DESC, doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM m)
SELECT c.source, c.doc_id, c.score, c.n_tok FROM c JOIN b ON c.source = b.source WHERE c.cum <= b.budget
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)
    # every selected group stays within its budget
    tot = got.groupby("source")["n_tok"].sum()
    for g, t in tot.items():
        assert t <= budgets[g], (g, t)


def test_select_by_budget_grouped_block_invariance(ray_session):
    """Many tiny blocks (group runs straddling blocks) must not change the
    selection — the per-run offsets are value-keyed, not positional."""
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops import sample, text as tx

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    meta = ds.map_batches(tx.quality_score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def to_cols(batch):
        return pa.table(
            {
                "source": batch["source"],
                "doc_id": batch["doc_id"],
                "score": batch["tok_count"],
                "n_tok": batch["tok_count"],
            }
        )

    meta = meta.map_batches(to_cols, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    budgets = {"src0": 800, "src5": 650}
    base = sample.select_by_budget_grouped(meta, budgets).to_pandas()
    shredded = sample.select_by_budget_grouped(meta.repartition(41), budgets).to_pandas()
    _assert_frames_equal(base, shredded)


def test_curation_report_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.quality import curation_report

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    got = curation_report(ds)
    tok = r"CASE WHEN trim(text) = '' THEN 0 ELSE len(string_split_regex(trim(text), '\s+')) END"
    want = _con().execute(
        f"""
WITH base AS (SELECT source, doc_id, trim(text) AS t, CAST({tok} AS BIGINT) AS ntok, text FROM documents),
words AS (SELECT doc_id, w FROM base, unnest(string_split_regex(t, '\\s+')) AS u(w) WHERE t <> ''),
ws AS (SELECT doc_id, CAST(count(*) AS BIGINT) nw, CAST(sum(length(w)) AS BIGINT) sl,
   CAST(sum(CASE WHEN regexp_matches(w, '[A-Za-z]') THEN 1 ELSE 0 END) AS BIGINT) aw,
   CAST(sum(CASE WHEN w IN ('the','be','to','of','and','that','have','with') THEN 1 ELSE 0 END) AS BIGINT) sh
   FROM words GROUP BY doc_id),
k AS (SELECT b.source, b.doc_id, b.ntok, b.text,
   CASE WHEN ws.nw >= 5 AND ws.nw <= 100000
    AND CAST(ws.sl AS DOUBLE)/CAST(ws.nw AS DOUBLE) >= 3.0 AND CAST(ws.sl AS DOUBLE)/CAST(ws.nw AS DOUBLE) <= 10.0
    AND CAST(ws.aw AS DOUBLE)/CAST(ws.nw AS DOUBLE) >= 0.8 AND ws.sh >= 2 THEN 1 ELSE 0 END AS keep_i
   FROM base b JOIN ws ON b.doc_id = ws.doc_id WHERE b.t <> '')
SELECT source, CAST(count(*) AS BIGINT) n_docs, CAST(sum(keep_i) AS BIGINT) n_keep,
   CAST(count(DISTINCT text) AS BIGINT) n_unique, CAST(sum(ntok) AS BIGINT) sum_tok
FROM k GROUP BY source
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)


def test_entity_counts_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.quality import entity_counts

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["text", "source"])
    got = entity_counts(ds).to_pandas()
    want = _con().execute(
        r"""
SELECT source, CAST(count(*) AS BIGINT) n_docs,
 CAST(sum(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))) AS BIGINT) n_email,
 CAST(sum(len(regexp_extract_all(text, 'https?://[^ \t\n]+'))) AS BIGINT) n_url,
 CAST(sum(len(regexp_extract_all(text, '\d{4}-\d{2}-\d{2}'))) AS BIGINT) n_iso_date,
 CAST(sum(len(regexp_extract_all(text, '\b\d+\b'))) AS BIGINT) n_number
FROM documents GROUP BY source
"""
    ).fetchdf()
    assert len(got) > 0
    _assert_frames_equal(got, want)


def test_entity_counts_planted(ray_session):
    """Planted entities count exactly once each."""
    import ray

    from orc_format_ray.ops.quality import entity_counts

    t = pa.table(
        {
            "source": ["a", "a", "b"],
            "text": [
                "mail bob@example.com and visit https://x.io/page",
                "due 2024-01-31, pay 42 dollars",
                "no entities here",
            ],
        }
    )
    df = entity_counts(ray.data.from_arrow(t)).to_pandas().set_index("source")
    assert df.loc["a", "n_email"] == 1
    assert df.loc["a", "n_url"] == 1
    assert df.loc["a", "n_iso_date"] == 1
    # "42" plus the date components 2024/01/31 are bare numbers
    assert df.loc["a", "n_number"] == 4
    assert df.loc["b"].drop("n_docs").sum() == 0


def test_gopher_rules_keep_cols_passthrough(ray_session):
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops.quality import gopher_rules

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text", "source"])
    df = docs.map_batches(
        lambda b: gopher_rules(b, keep_cols=("source",)),
        batch_format="pyarrow",
        zero_copy_batch=True,
        **remote_args(),
    ).to_pandas()
    ref = _con().execute("SELECT doc_id, source FROM documents WHERE trim(text) <> ''").fetchdf()
    m = df[["doc_id", "source"]].sort_values("doc_id").reset_index(drop=True)
    r = ref.sort_values("doc_id").reset_index(drop=True)
    assert m.equals(r)


def test_remove_boilerplate_lines_matches_sql(ray_session):
    """Planted universal footer must drop from every doc; exact-string
    parity with the SQL line-frequency oracle."""
    import ray

    from orc_format_ray._rayutil import remote_args
    from orc_format_ray.ops.text import remove_boilerplate_lines

    docs = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])

    def plant(b):
        import pyarrow.compute as pc

        t = b["text"].combine_chunks()
        planted = pc.binary_join_element_wise(t, pa.array(["COMMON FOOTER LINE"] * len(t)), "\n")
        return pa.table({"doc_id": b["doc_id"].combine_chunks(), "text": planted})

    planted = docs.map_batches(plant, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    got = remove_boilerplate_lines(planted, min_occurrences=3).to_pandas()
    want = _con().execute(
        """
WITH planted AS (SELECT doc_id, text || chr(10) || 'COMMON FOOTER LINE' AS t FROM documents),
ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM planted),
lines AS (SELECT doc_id, i, l[i] AS line FROM ls, unnest(generate_series(1, len(l))) AS u(i)),
freq AS (SELECT line, CAST(count(*) AS BIGINT) c FROM lines GROUP BY line)
SELECT li.doc_id,
  COALESCE(string_agg(CASE WHEN f.c < 3 THEN li.line END, chr(10) ORDER BY li.i), '') AS text_clean,
  CAST(sum(CASE WHEN f.c >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM lines li JOIN freq f ON li.line = f.line GROUP BY li.doc_id
"""
    ).fetchdf()
    assert len(got) == len(want) and (got["n_dropped"] >= 1).all()
    _assert_frames_equal(got, want)


def test_remove_boilerplate_all_lines_dropped(ray_session):
    """A doc made ENTIRELY of boilerplate comes back as empty string."""
    import ray

    from orc_format_ray.ops.text import remove_boilerplate_lines

    t = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["spam", "spam", "spam", "keep me\nspam"],
        }
    )
    df = (
        remove_boilerplate_lines(ray.data.from_arrow(t), min_occurrences=3)
        .to_pandas()
        .set_index("doc_id")
        .sort_index()
    )
    assert df.loc[1, "text_clean"] == "" and df.loc[1, "n_dropped"] == 1
    assert df.loc[4, "text_clean"] == "keep me" and df.loc[4, "n_dropped"] == 1


def test_sliding_chunks_matches_sql(ray_session):
    import ray

    from orc_format_ray.ops.chunk import sliding_chunks

    ds = ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = sliding_chunks(ds, window=20, stride=12).to_pandas()
    want = _con().execute(
        r"""
WITH base AS (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents WHERE trim(text) <> ''),
n AS (SELECT doc_id, ws, len(ws) AS cnt FROM base),
c AS (SELECT doc_id, ws, cnt, i AS chunk_id, i*12 AS start
      FROM n, unnest(generate_series(0, CAST(ceil(greatest(cnt - 20, 0) / 12.0) AS BIGINT))) AS u(i))
SELECT doc_id, chunk_id,
  least(start + 20, cnt) - start AS n_words,
  array_to_string(ws[start+1 : least(start + 20, cnt)], ' ') AS passage
FROM c
"""
    ).fetchdf()
    assert len(got) > 500
    _assert_frames_equal(got, want)


def test_sliding_chunks_overlap_semantics(ray_session):
    """Adjacent chunks overlap by window - stride words; full coverage."""
    import ray

    from orc_format_ray.ops.chunk import sliding_chunks

    t = pa.table({"doc_id": [7], "text": ["w0 w1 w2 w3 w4 w5 w6 w7 w8 w9"]})
    df = (
        sliding_chunks(ray.data.from_arrow(t), window=4, stride=2)
        .to_pandas()
        .sort_values("chunk_id")
        .reset_index(drop=True)
    )
    assert df["passage"].tolist() == [
        "w0 w1 w2 w3",
        "w2 w3 w4 w5",
        "w4 w5 w6 w7",
        "w6 w7 w8 w9",
    ]
    assert df["n_words"].tolist() == [4, 4, 4, 4]
    with pytest.raises(ValueError, match="stride"):
        sliding_chunks(ray.data.from_arrow(t), window=4, stride=5).to_pandas()


def test_knn_label_predict_matches_sql(ray_session):
    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from orc_format_ray.ops.knn import knn_label_predict

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    qmask = t["vec_id"] < 8
    Q = np.stack(t.loc[qmask, "embedding"].to_numpy())
    qids = t.loc[qmask, "vec_id"].to_numpy(np.int64)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = knn_label_predict(ds, Q, qids, k=5)
    want = _con().execute(
        r"""
WITH q AS (SELECT vec_id AS qid, list_transform(embedding, x -> floor(CAST(x AS DOUBLE)*4096 + 0.5)) AS qv
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, label, list_transform(embedding, x -> floor(CAST(x AS DOUBLE)*4096 + 0.5)) AS cv
      FROM embeddings),
d AS (SELECT q.qid, c.vec_id, c.label, list_dot_product(q.qv, c.cv) AS dot
      FROM q JOIN c ON c.vec_id <> q.qid),
r AS (SELECT qid, vec_id, label, dot, row_number() OVER (PARTITION BY qid ORDER BY dot DESC, vec_id) rn FROM d),
k AS (SELECT qid, CAST(label AS BIGINT) AS label, CAST(count(*) AS BIGINT) votes FROM r WHERE rn <= 5 GROUP BY qid, label),
w AS (SELECT qid, label, votes, row_number() OVER (PARTITION BY qid ORDER BY votes DESC, label) rn FROM k)
SELECT qid, label AS label_pred, votes FROM w WHERE rn = 1
"""
    ).fetchdf()
    assert len(got) == 8
    _assert_frames_equal(got, want)
    # plan invariance: shredded blocks fold to the same winners
    got2 = knn_label_predict(ds.repartition(23), Q, qids, k=5)
    assert got.equals(got2)


def test_knn_self_match_excluded(ray_session):
    """With exclude_self, a query can never vote for itself even though its
    self-dot is maximal; without it, the self row dominates."""
    import numpy as np
    import ray

    from orc_format_ray.ops.knn import knn_label_predict

    t = pa.table(
        {
            "vec_id": [0, 1, 2, 3],
            "embedding": [[1.0, 0.0], [1.0, 0.01], [0.0, 1.0], [0.0, 0.9]],
            "label": [10, 11, 12, 13],
        }
    )
    ds = ray.data.from_arrow(t)
    Q = np.array([[1.0, 0.0]])
    qids = np.array([0], np.int64)
    loo = knn_label_predict(ds, Q, qids, k=1)
    assert loo.loc[0, "label_pred"] == 11  # nearest OTHER row
    selfin = knn_label_predict(ds, Q, qids, k=1, exclude_self=False)
    assert selfin.loc[0, "label_pred"] == 10


def test_csv_shards_roundtrip(ray_session, tmp_path):
    import ray

    from orc_format_ray.ops.csvshard import read_csv_shards, write_csv_shards

    out = str(tmp_path / "csv")
    ds = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
    )
    man = write_csv_shards(
        ds, out, key_col="o_orderkey",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"],
        rows_per_shard=500,
    )
    assert man["n_rows"].sum() == ds.count()
    back = read_csv_shards(
        out,
        {"o_orderkey": "int64", "o_custkey": "int64",
         "o_totalprice": "float64", "o_orderpriority": "string"},
    ).to_pandas()
    src = ds.to_pandas()
    a = back.sort_values("o_orderkey").reset_index(drop=True)
    b = src.sort_values("o_orderkey").reset_index(drop=True)[a.columns]
    assert len(a) == len(b)
    for c in a.columns:
        av = a[c].to_numpy()
        if av.dtype == object:
            assert (a[c].astype(str) == b[c].astype(str)).all(), c
        else:
            assert np.array_equal(av, b[c].to_numpy()), c  # repr floats: exact


def test_csv_shards_null_empty_quoting(ray_session, tmp_path):
    """Unquoted empty field decodes null; '\"\"' decodes ''; commas and
    quotes survive RFC-4180 doubling; embedded newlines reject loudly."""
    import ray

    from orc_format_ray.ops.csvshard import read_csv_shards, write_csv_shards

    out = str(tmp_path / "csvq")
    t = pa.table({"k": [1, 2, 3], "s": ["", None, 'he said "hi", ok']})
    write_csv_shards(ray.data.from_arrow(t), out, key_col="k", columns=["k", "s"])
    back = read_csv_shards(out, {"k": "int64", "s": "string"}).to_pandas().sort_values("k").reset_index(drop=True)
    assert back.loc[0, "s"] == ""
    assert pd.isna(back.loc[1, "s"])
    assert back.loc[2, "s"] == 'he said "hi", ok'
    bad = pa.table({"k": [1], "s": ["two\nlines"]})
    with pytest.raises(Exception, match="newline"):
        write_csv_shards(ray.data.from_arrow(bad), str(tmp_path / "csvbad"), key_col="k", columns=["k", "s"])


def test_csv_shards_deterministic_rewrite(ray_session, tmp_path):
    import hashlib
    import glob
    import shutil

    import ray

    from orc_format_ray.ops.csvshard import write_csv_shards

    out = str(tmp_path / "csvdet")
    ds = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    write_csv_shards(ds, out, key_col="o_orderkey", columns=["o_orderkey", "o_totalprice"], rows_per_shard=500)
    h1 = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest() for p in glob.glob(out + "/*.csv")}
    shutil.rmtree(out)
    write_csv_shards(ds, out, key_col="o_orderkey", columns=["o_orderkey", "o_totalprice"], rows_per_shard=500)
    h2 = {p.split("/")[-1]: hashlib.sha256(open(p, "rb").read()).hexdigest() for p in glob.glob(out + "/*.csv")}
    assert h1 == h2


def test_csv_shards_missing_column_null_fills(ray_session, tmp_path):
    import ray

    from orc_format_ray.ops.csvshard import read_csv_shards, write_csv_shards

    out = str(tmp_path / "csvmiss")
    t = pa.table({"k": [1, 2], "v": [10, 20]})
    write_csv_shards(ray.data.from_arrow(t), out, key_col="k", columns=["k", "v"])
    back = read_csv_shards(out, {"k": "int64", "absent": "string"}).to_pandas()
    assert back["absent"].isna().all() and len(back) == 2
