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
