"""Tiny SQL-ish expression compiler -> vectorized pyarrow.compute plans.

The missing glue for config-driven pipelines: a filter or derived column
arrives as a STRING (from a job spec, a curation recipe, a CLI flag), and
the engine must run it vectorized — not eval() Python per row. This module
parses a small, SQL-compatible expression grammar once (driver-side) and
compiles it to a closure of pyarrow.compute kernel calls that every
map_batches task applies zero-copy.

Grammar (precedence low -> high):

    expr     := or
    or       := and (OR and)*
    and      := not (AND not)*
    not      := NOT not | cmp
    cmp      := add ((= | == | != | <> | < | <= | > | >=) add
                     | IN '(' literal (',' literal)* ')')?
    add      := mul (('+' | '-') mul)*
    mul      := add_u (('*' | '/') add_u)*
    add_u    := '-' add_u | atom
    atom     := literal | ident | ident '(' args ')' | '(' expr ')'

Literals: integers, decimal floats, single-quoted strings. Functions:
abs, floor, ceil, length, lower, upper, contains(col, 'lit').

SQL-parity contract: the compiled plan evaluates the SAME operator tree
DuckDB builds for the same text — int arithmetic stays int64 with CHECKED
kernels (loud on overflow, where SQL would widen silently), ``/`` is
always double division (DuckDB semantics), comparisons/AND/OR use Kleene
(three-valued) logic, and a FILTER treats null as false (SQL WHERE). Float
literals parse with ``float()`` (short decimals land on the same double
DuckDB's DECIMAL->DOUBLE path produces — keep literals short, the
session-13 rule). So a filter + exact-integer aggregate downstream is
bit-reproducible against the oracle running the identical text.

Scale notes: parsing happens ONCE on the driver; the closure ships to
workers (no re-parse per batch); evaluation is pure Arrow kernels (no
Python rows). ``columns`` exposes the referenced set so readers can
project-push.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

_TOKEN_RE = re.compile(
    r"\s*(?:"
    r"(?P<float>\d+\.\d+(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)"
    r"|(?P<int>\d+)"
    r"|(?P<str>'(?:[^']|'')*')"
    r"|(?P<name>[A-Za-z_][A-Za-z_0-9]*)"
    r"|(?P<op><=|>=|!=|<>|==|=|<|>|\+|-|\*|/|\(|\)|,)"
    r")"
)

_KEYWORDS = {"AND", "OR", "NOT", "IN"}

_FUNCS = {
    "abs": lambda a: pc.abs_checked(a),
    "floor": lambda a: pc.floor(a),
    "ceil": lambda a: pc.ceil(a),
    "length": lambda a: pc.utf8_length(a),
    "lower": lambda a: pc.utf8_lower(a),
    "upper": lambda a: pc.utf8_upper(a),
}


def _tokenize(src: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(src):
        m = _TOKEN_RE.match(src, pos)
        if not m or m.end() == pos:
            if src[pos:].strip() == "":
                break
            raise ValueError(f"expr: cannot tokenize at ...{src[pos:pos+20]!r}")
        pos = m.end()
        if m.lastgroup == "float":
            out.append(("lit", float(m.group("float"))))
        elif m.lastgroup == "int":
            out.append(("lit", int(m.group("int"))))
        elif m.lastgroup == "str":
            out.append(("lit", m.group("str")[1:-1].replace("''", "'")))
        elif m.lastgroup == "name":
            name = m.group("name")
            up = name.upper()
            out.append(("kw", up) if up in _KEYWORDS else ("name", name))
        else:
            out.append(("op", m.group("op")))
    out.append(("end", None))
    return out


# AST nodes are plain tuples: ("lit", v) | ("col", name) | ("call", fn, args)
# | ("un", op, a) | ("bin", op, a, b) | ("in", a, [literals])


class _Parser:
    def __init__(self, src: str):
        self.toks = _tokenize(src)
        self.i = 0
        self.src = src

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind, val=None):
        k, v = self.next()
        if k != kind or (val is not None and v != val):
            raise ValueError(f"expr: expected {val or kind}, got {v!r} in {self.src!r}")
        return v

    def parse(self):
        node = self.p_or()
        if self.peek()[0] != "end":
            raise ValueError(f"expr: trailing tokens at {self.peek()[1]!r} in {self.src!r}")
        return node

    def p_or(self):
        node = self.p_and()
        while self.peek() == ("kw", "OR"):
            self.next()
            node = ("bin", "or", node, self.p_and())
        return node

    def p_and(self):
        node = self.p_not()
        while self.peek() == ("kw", "AND"):
            self.next()
            node = ("bin", "and", node, self.p_not())
        return node

    def p_not(self):
        if self.peek() == ("kw", "NOT"):
            self.next()
            return ("un", "not", self.p_not())
        return self.p_cmp()

    def p_cmp(self):
        node = self.p_add()
        k, v = self.peek()
        if k == "op" and v in ("=", "==", "!=", "<>", "<", "<=", ">", ">="):
            self.next()
            op = {"=": "==", "<>": "!="}.get(v, v)
            return ("bin", op, node, self.p_add())
        if (k, v) == ("kw", "IN"):
            self.next()
            self.expect("op", "(")
            lits = []
            while True:
                lk, lv = self.next()
                if lk != "lit":
                    raise ValueError(f"expr: IN list takes literals, got {lv!r}")
                lits.append(lv)
                nk, nv = self.next()
                if (nk, nv) == ("op", ")"):
                    break
                if (nk, nv) != ("op", ","):
                    raise ValueError(f"expr: bad IN list near {nv!r}")
            return ("in", node, lits)
        return node

    def p_add(self):
        node = self.p_mul()
        while self.peek()[0] == "op" and self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            node = ("bin", op, node, self.p_mul())
        return node

    def p_mul(self):
        node = self.p_unary()
        while self.peek()[0] == "op" and self.peek()[1] in ("*", "/"):
            op = self.next()[1]
            node = ("bin", op, node, self.p_unary())
        return node

    def p_unary(self):
        if self.peek() == ("op", "-"):
            self.next()
            inner = self.p_unary()
            if inner[0] == "lit":  # fold negative literals driver-side
                return ("lit", -inner[1])
            return ("un", "neg", inner)
        return self.p_atom()

    def p_atom(self):
        k, v = self.next()
        if k == "lit":
            return ("lit", v)
        if k == "op" and v == "(":
            node = self.p_or()
            self.expect("op", ")")
            return node
        if k == "name":
            if self.peek() == ("op", "("):
                self.next()
                fname = v.lower()
                args = []
                if self.peek() != ("op", ")"):
                    args.append(self.p_or())
                    while self.peek() == ("op", ","):
                        self.next()
                        args.append(self.p_or())
                self.expect("op", ")")
                if fname == "contains":
                    if len(args) != 2 or args[1][0] != "lit" or not isinstance(args[1][1], str):
                        raise ValueError("expr: contains(col, 'literal')")
                    return ("call", "contains", args)
                if fname not in _FUNCS:
                    raise ValueError(f"expr: unknown function {fname!r}")
                if len(args) != 1:
                    raise ValueError(f"expr: {fname} takes 1 argument")
                return ("call", fname, args)
            return ("col", v)
        raise ValueError(f"expr: unexpected token {v!r} in {self.src!r}")


def _collect_columns(node, out: set):
    tag = node[0]
    if tag == "col":
        out.add(node[1])
    elif tag == "call":
        for a in node[2]:
            _collect_columns(a, out)
    elif tag == "un":
        _collect_columns(node[2], out)
    elif tag == "bin":
        _collect_columns(node[2], out)
        _collect_columns(node[3], out)
    elif tag == "in":
        _collect_columns(node[1], out)


def _is_int(arr) -> bool:
    t = arr.type if isinstance(arr, (pa.Array, pa.ChunkedArray)) else None
    return t is not None and (pa.types.is_integer(t))


def _eval(node, tbl: pa.Table):
    tag = node[0]
    if tag == "lit":
        return node[1]
    if tag == "col":
        if node[1] not in tbl.column_names:
            raise KeyError(f"expr: unknown column {node[1]!r}")
        return tbl[node[1]]
    if tag == "call":
        fname = node[1]
        if fname == "contains":
            return pc.match_substring(_eval(node[2][0], tbl), node[2][1][1])
        return _FUNCS[fname](_eval(node[2][0], tbl))
    if tag == "un":
        a = _eval(node[2], tbl)
        if node[1] == "not":
            return pc.invert(a)
        return pc.negate_checked(a) if _is_int(a) else pc.negate(a)
    if tag == "in":
        return pc.is_in(_eval(node[1], tbl), value_set=pa.array(node[2]))
    op, a, b = node[1], _eval(node[2], tbl), _eval(node[3], tbl)
    if op == "and":
        return pc.and_kleene(a, b)
    if op == "or":
        return pc.or_kleene(a, b)
    if op in ("==", "!=", "<", "<=", ">", ">="):
        fn = {"==": pc.equal, "!=": pc.not_equal, "<": pc.less,
              "<=": pc.less_equal, ">": pc.greater, ">=": pc.greater_equal}[op]
        return fn(a, b)
    both_int = (_is_int(a) or isinstance(a, int)) and (_is_int(b) or isinstance(b, int))
    if op == "+":
        return pc.add_checked(a, b) if both_int else pc.add(a, b)
    if op == "-":
        return pc.subtract_checked(a, b) if both_int else pc.subtract(a, b)
    if op == "*":
        return pc.multiply_checked(a, b) if both_int else pc.multiply(a, b)
    if op == "/":  # SQL '/': always double division
        af = pc.cast(a, pa.float64()) if not isinstance(a, (int, float)) else float(a)
        bf = pc.cast(b, pa.float64()) if not isinstance(b, (int, float)) else float(b)
        return pc.divide(af, bf)
    raise AssertionError(f"unhandled op {op!r}")


def _sexpr(node) -> str:
    tag = node[0]
    if tag == "lit":
        return repr(node[1])
    if tag == "col":
        return node[1]
    if tag == "call":
        return f"({node[1]} " + " ".join(_sexpr(a) for a in node[2]) + ")"
    if tag == "un":
        return f"({node[1]} {_sexpr(node[2])})"
    if tag == "in":
        return f"(in {_sexpr(node[1])} {node[2]!r})"
    return f"({node[1]} {_sexpr(node[2])} {_sexpr(node[3])})"


class Expr:
    """A parsed expression: ``evaluate(table)`` runs the kernel plan,
    ``columns`` is the referenced-column set (for projection pushdown),
    ``explain()`` prints the operator tree."""

    def __init__(self, src: str):
        self.src = src
        self.node = _Parser(src).parse()
        cols: set = set()
        _collect_columns(self.node, cols)
        self.columns = frozenset(cols)

    def evaluate(self, tbl: pa.Table):
        out = _eval(self.node, tbl)
        if isinstance(out, pa.ChunkedArray):
            out = out.combine_chunks()
        return out

    def explain(self) -> str:
        return _sexpr(self.node)


def compile_expr(src: str) -> Expr:
    return Expr(src)


def filter_expr(ds, src: str):
    """SQL-WHERE semantics: keep rows where the expression is TRUE (null ->
    dropped). One parse driver-side; workers run pure Arrow kernels."""
    e = compile_expr(src)

    def fn(batch: pa.Table) -> pa.Table:
        mask = e.evaluate(batch)
        return batch.filter(pc.fill_null(mask, False))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def project_expr(ds, exprs: dict[str, str], keep: list[str] | None = None):
    """Attach computed columns ``{out_name: expression}`` (evaluated
    vectorized per batch); ``keep`` optionally projects the output to
    keep + computed columns."""
    compiled = {name: compile_expr(s) for name, s in exprs.items()}

    def fn(batch: pa.Table) -> pa.Table:
        out = batch if keep is None else batch.select(keep)
        for name, e in compiled.items():
            arr = e.evaluate(batch)
            if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                arr = pa.array([arr] * batch.num_rows)
            out = out.append_column(name, arr)
        return out

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
