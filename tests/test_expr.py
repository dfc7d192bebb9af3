"""Expression compiler (ops/expr.py): grammar, precedence, SQL-parity
semantics (Kleene logic, null-drops-row filters, double division, checked
int arithmetic), and the Dataset-level filter/project stages."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orc_format_ray.ops.expr import Expr, compile_expr, filter_expr, project_expr


def _t(**cols):
    return pa.table(cols)


# ------------------------------------------------------------------- parsing


def test_precedence_and_binds_tighter_than_or():
    e = compile_expr("a = 1 OR b = 2 AND c = 3")
    assert e.explain() == "(or (== a 1) (and (== b 2) (== c 3)))"


def test_precedence_mul_over_add_and_unary():
    e = compile_expr("a + b * -2 - 1")
    assert e.explain() == "(- (+ a (* b -2)) 1)"


def test_string_literal_escaping():
    e = compile_expr("s = 'it''s'")
    got = e.evaluate(_t(s=pa.array(["it's", "its"])))
    assert got.to_pylist() == [True, False]


def test_columns_set_collects_all_references():
    e = compile_expr("floor(a * 2) > b AND contains(s, 'x') OR c IN (1, 2)")
    assert e.columns == frozenset({"a", "b", "s", "c"})


@pytest.mark.parametrize("bad", [
    "a <", "f(", "a ~~ 3", "1 + 'x' +", "a IN (b)", "unknownfn(a)", "a = 1) x",
])
def test_parse_errors_are_loud(bad):
    with pytest.raises(ValueError):
        compile_expr(bad)


# ----------------------------------------------------------------- semantics


def test_in_list_strings_and_ints():
    t = _t(g=pa.array(["a", "b", "c"]), k=pa.array([1, 5, 9]))
    assert compile_expr("g IN ('a', 'c')").evaluate(t).to_pylist() == [True, False, True]
    assert compile_expr("k IN (5, 9)").evaluate(t).to_pylist() == [False, True, True]


def test_division_is_always_double():
    t = _t(a=pa.array([7, 3], pa.int64()))
    got = compile_expr("a / 2").evaluate(t)
    assert got.type == pa.float64()
    assert got.to_pylist() == [3.5, 1.5]


def test_int_arithmetic_is_checked_loud_on_overflow():
    t = _t(a=pa.array([2**62], pa.int64()))
    with pytest.raises(Exception, match="overflow"):
        compile_expr("a * 4").evaluate(t)


def test_kleene_null_semantics_and_filter_drop(ray_session):
    import ray.data

    df = pd.DataFrame({"a": [1.0, None, 3.0], "b": ["x", "y", None]})
    # null < 2 -> null; SQL WHERE drops it
    out = filter_expr(ray.data.from_pandas(df), "a < 2").to_pandas()
    assert out["a"].tolist() == [1.0]
    # null OR true -> true (Kleene): row 2 survives via b = 'y'
    out = filter_expr(ray.data.from_pandas(df), "a < 2 OR b = 'y'").to_pandas()
    assert len(out) == 2


def test_unknown_column_is_loud():
    with pytest.raises(KeyError, match="unknown column"):
        compile_expr("zzz > 1").evaluate(_t(a=pa.array([1])))


def test_functions_match_python_semantics():
    t = _t(v=pa.array([-2.5, 1.2]), s=pa.array(["Hello World", "abc"]))
    assert compile_expr("abs(v)").evaluate(t).to_pylist() == [2.5, 1.2]
    assert compile_expr("floor(v)").evaluate(t).to_pylist() == [-3.0, 1.0]
    assert compile_expr("ceil(v)").evaluate(t).to_pylist() == [-2.0, 2.0]
    assert compile_expr("lower(s)").evaluate(t).to_pylist() == ["hello world", "abc"]
    assert compile_expr("upper(s)").evaluate(t).to_pylist() == ["HELLO WORLD", "ABC"]
    assert compile_expr("length(s)").evaluate(t).to_pylist() == [11, 3]
    assert compile_expr("contains(s, 'World')").evaluate(t).to_pylist() == [True, False]


# ------------------------------------------------------------- dataset stages


def test_filter_expr_matches_pandas(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "q": rng.integers(1, 50, 300),
            "f": rng.choice(["A", "N", "R"], 300),
            "d": np.round(rng.uniform(0, 0.1, 300), 2),
        }
    )
    got = (
        filter_expr(
            ray.data.from_pandas(df).repartition(4),
            "q < 24 AND (f = 'R' OR d >= 0.05)",
        )
        .to_pandas()
        .sort_values(["q", "f", "d"])
        .reset_index(drop=True)
    )
    want = (
        df[(df.q < 24) & ((df.f == "R") | (df.d >= 0.05))]
        .sort_values(["q", "f", "d"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_project_expr_adds_columns_with_keep(ray_session):
    import ray.data

    df = pd.DataFrame({"p": [1.25, 2.5], "disc": [0.1, 0.2], "id": [1, 2]})
    out = (
        project_expr(
            ray.data.from_pandas(df),
            {"rev": "p * (1 - disc)", "cents": "floor(p * 100 + 0.5)"},
            keep=["id"],
        )
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert list(out.columns) == ["id", "rev", "cents"]
    assert out["rev"].tolist() == [1.25 * (1 - 0.1), 2.5 * (1 - 0.2)]
    assert out["cents"].tolist() == [125.0, 250.0]


# ------------------------------------------------ random-grammar SQL parity


def test_random_expression_trees_match_duckdb():
    """Random expression trees (ints, short decimals, + - * /, abs/floor,
    comparisons, Kleene and/or/not, IN lists) evaluated by the compiler vs
    DuckDB on the same table — bitwise for doubles, exact for ints/bools.
    Division denominators are (abs(e) + 1) so neither side divides by zero;
    literals stay short decimals (the session-13 DECIMAL parse rule)."""
    import duckdb
    import pyarrow.compute as pc

    from orc_format_ray.ops.expr import compile_expr

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame(
        {
            "id": np.arange(n, dtype=np.int64),
            "a": rng.integers(-100, 101, n),
            "b": pd.array(
                [None if i % 7 == 0 else int(v) for i, v in enumerate(rng.integers(-50, 51, n))],
                dtype="Int64",
            ),
            "x": np.round(rng.uniform(-20, 20, n), 2),
            "s": rng.choice(["red", "green", "blue", "x"], n),
        }
    )
    con = duckdb.connect()
    con.register("t", df)

    # NOTE: no bare decimal literals inside arithmetic — DuckDB keeps them
    # in exact DECIMAL arithmetic while the compiler computes in double
    # (the session-13 literal rule); decimals appear only as direct
    # comparison operands, where both sides cast them identically.
    def num(depth):
        r = rng.integers(0, 7 if depth > 0 else 2)
        if r == 0:
            return ["a", "b", "x"][rng.integers(0, 3)]
        if r == 1:
            return str(int(rng.integers(-50, 51)))
        if r == 2:
            return f"({num(depth-1)} + {num(depth-1)})"
        if r == 3:
            return f"({num(depth-1)} - {num(depth-1)})"
        if r == 4:
            return f"({num(depth-1)} * {num(depth-1)})"
        if r == 5:
            return f"({num(depth-1)} / (abs({num(depth-1)}) + 1))"
        return f"floor({num(depth-1)})"

    def pred(depth):
        r = rng.integers(0, 6 if depth > 0 else 3)
        if r == 0:
            op = [">", "<", ">=", "<=", "=", "!="][rng.integers(0, 6)]
            if rng.integers(0, 3) == 0:
                return f"x {op} {rng.integers(-99, 100) / 10:.1f}"
            return f"{num(1)} {op} {num(1)}"
        if r == 1:
            return f"s = '{['red', 'green', 'blue'][rng.integers(0, 3)]}'"
        if r == 2:
            return "a in (1, 2, 3, 5, 8, 13, 21)"
        if r == 3:
            return f"({pred(depth-1)} and {pred(depth-1)})"
        if r == 4:
            return f"({pred(depth-1)} or {pred(depth-1)})"
        return f"(not {pred(depth-1)})"

    tbl = pa.Table.from_pandas(df)
    for _ in range(25):
        src = pred(2)
        e = compile_expr(src)
        mask = e.evaluate(tbl)
        if not isinstance(mask, (pa.Array, pa.ChunkedArray)):  # constant predicate
            mask = pa.array([mask.as_py()] * len(df), pa.bool_())
        got = df["id"].to_numpy()[pc.fill_null(mask, False).to_numpy(zero_copy_only=False)]
        want = con.execute(f"SELECT id FROM t WHERE {src} ORDER BY id").fetchdf()["id"].to_numpy()
        assert np.array_equal(np.sort(got), want), src
    for _ in range(15):
        src = num(2)
        e = compile_expr(src)
        arr = e.evaluate(tbl)
        if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
            arr = pa.array([arr] * len(df))
        got = arr.cast(pa.float64()).to_numpy(zero_copy_only=False)
        want = con.execute(
            f"SELECT CAST({src} AS DOUBLE) AS v FROM t ORDER BY id"
        ).fetchdf()["v"].to_numpy()
        gn, wn = np.isnan(got), np.isnan(want)
        assert np.array_equal(gn, wn), src
        assert np.array_equal(
            got[~gn].astype(np.float64).view(np.uint64),
            want[~wn].astype(np.float64).view(np.uint64),
        ), src
