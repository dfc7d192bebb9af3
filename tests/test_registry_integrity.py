"""Registry integrity (VERDICT r4 #3): the queries() dict literal must have
no duplicate string keys. Python silently keeps the LAST value for a
duplicate key, so a future duplicate bound to a *different* function would
silently replace a driver-window query — make the class unrepresentable by
AST-scanning the source, where duplicates ARE visible.
"""

import ast
import sys

sys.path.insert(0, "/root/repo")
import __ray_entry__ as entrymod

SRC_PATH = "/root/repo/__ray_entry__.py"


def _dict_literal_keys_of(func_name: str) -> list[str]:
    tree = ast.parse(open(SRC_PATH).read())
    fn = next(
        n for n in ast.walk(tree)
        if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef)) and n.name == func_name
    )
    keys: list[str] = []
    for node in ast.walk(fn):
        if isinstance(node, ast.Dict):
            for k in node.keys:
                if isinstance(k, ast.Constant) and isinstance(k.value, str):
                    keys.append(k.value)
    return keys


def test_queries_dict_literal_has_no_duplicate_keys():
    keys = _dict_literal_keys_of("queries")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate keys in queries() dict literal: {dupes}"
    # the AST scan must actually see the registry (guard against refactors
    # that move the literal out of reach of this test)
    assert len(keys) >= len(entrymod.queries()), (len(keys), len(entrymod.queries()))


def test_oracle_sql_dict_literal_has_no_duplicate_keys():
    keys = _dict_literal_keys_of("oracle_sql")
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate keys in oracle_sql() dict literal: {dupes}"


def test_every_oracle_key_has_a_query():
    qs = set(entrymod.queries())
    orphans = sorted(set(entrymod.oracle_sql()) - qs)
    assert not orphans, f"oracle_sql keys with no queries() entry: {orphans}"
