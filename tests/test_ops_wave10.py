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
