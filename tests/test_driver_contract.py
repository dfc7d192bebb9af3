"""Emulates the driver's correctness harness: run every queries() entry at
sf0.001 and compare against oracle_sql() via DuckDB (row count + sorted-value
equality), plus smoke entry(). Catches name/type/value drift before the
driver does."""

import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings"]


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _kind(dtype) -> str:
    """Hash-equivalence classes for the driver's dtype-sensitive value hash."""
    k = np.dtype(dtype).kind if not isinstance(dtype, pd.api.types.CategoricalDtype) else "O"
    return {"i": "i", "u": "i", "f": "f", "b": "b", "M": "M", "m": "m"}.get(k, "O")


def _dtype_problems(ours: pd.DataFrame, theirs_tbl: pa.Table) -> list[str]:
    """VERDICT r4 #2: the driver's value hash is dtype-sensitive, but the
    `.df()` + sorted-value compare here was blind to it (the two persistent
    reds were oracle-side HUGEINT -> float64, cell-exact after coercion).
    Flag (a) any HUGEINT/decimal column in the oracle's Arrow output and
    (b) any int-vs-float (kind-level) drift between the two frames."""
    probs = []
    for field in theirs_tbl.schema:
        if pa.types.is_decimal(field.type):
            probs.append(
                f"oracle col {field.name!r} is {field.type} (DuckDB HUGEINT/decimal"
                " — CAST the SQL expression to BIGINT/DOUBLE)"
            )
    theirs = theirs_tbl.to_pandas()
    for c in sorted(set(ours.columns) & set(theirs.columns)):
        ka, kb = _kind(ours[c].dtype), _kind(theirs[c].dtype)
        if ka != kb:
            probs.append(f"col {c!r}: engine kind {ka} ({ours[c].dtype}) vs oracle kind {kb} ({theirs[c].dtype})")
    return probs


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return c


@pytest.fixture(scope="module")
def _ray(ray_session):
    return True


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(name, con, _ray):
    q = entrymod.queries()[name]
    ours_raw = _to_df(q(SF))
    theirs_tbl = con.execute(entrymod.oracle_sql()[name]).fetch_arrow_table()
    dtype_probs = _dtype_problems(ours_raw, theirs_tbl)
    assert not dtype_probs, f"{name}: {dtype_probs}"
    ours = _normalize(ours_raw)
    theirs = _normalize(theirs_tbl.to_pandas())
    assert list(ours.columns) == list(theirs.columns), f"{name}: columns {list(ours.columns)} vs {list(theirs.columns)}"
    assert len(ours) == len(theirs), f"{name}: rows {len(ours)} vs {len(theirs)}"
    for c in ours.columns:
        a, b = ours[c].to_numpy(), theirs[c].to_numpy()
        if a.dtype.kind == "f" or b.dtype.kind == "f":
            np.testing.assert_allclose(a.astype(np.float64), b.astype(np.float64), rtol=0, atol=0, err_msg=f"{name}.{c}")
        else:
            assert (a == b).all(), f"{name}.{c}: first diff {a[a != b][:3]} vs {b[a != b][:3]}"


def test_rows_only_queries_run(_ray):
    qs = entrymod.queries()
    for name in sorted(set(qs) - set(ORACLE_KEYS)):
        res = _to_df(qs[name](SF))
        assert res is not None, name
        assert len(res.columns) > 0, name


def test_entry_smoke(_ray):
    ds = entrymod.entry()
    tbl = pa.concat_tables(list(ds.iter_batches(batch_size=1 << 22, batch_format="pyarrow")))
    assert tbl.num_rows >= 0
    assert set(tbl.schema.names) == {"doc_id", "tokens", "n_tok", "source"}
