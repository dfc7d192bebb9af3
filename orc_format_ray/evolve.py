"""Reader-side schema evolution for ORC datasets.

At 100-TB scale a directory accumulates files written across schema
versions: columns get added, dropped, reordered, and integer types widened.
The ORC readers' published evolution rules (the "Schema Evolution" section
of the public ORC spec / the C++ SchemaEvolution class) resolve the file
schema against a *reader* schema by column name, promoting numeric types
and null-filling missing columns. This module applies those semantics on
Arrow tables so that `read_orc_dataset(..., target_schema=...)` can stream
a mixed-schema directory as ONE well-typed Dataset:

* per-file work happens inside each read task (a `map_batches` stage) —
  the driver only unifies schemas from tail reads (a few KiB per file);
* `target_schema="unify"` computes the widest compatible schema across
  the files' footers, erroring loudly on genuinely incompatible drift
  (e.g. a column that is int64 in one file and string in another).
"""

from __future__ import annotations

import pyarrow as pa

# promotion lattice per the public ORC evolution rules we support losslessly:
# signed int widening, float widening, ints into double (exact to 2^53 —
# beyond that ORC itself accepts the loss; we follow suit), string family.
_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3}


def _is_string(t: pa.DataType) -> bool:
    return pa.types.is_string(t) or pa.types.is_large_string(t)


def can_promote(src: pa.DataType, dst: pa.DataType) -> bool:
    """True when a value of ``src`` reads losslessly as ``dst`` under the
    ORC evolution rules this engine supports."""
    if src.equals(dst):
        return True
    if src in _INT_ORDER and dst in _INT_ORDER:
        return _INT_ORDER[src] < _INT_ORDER[dst]
    if src in _INT_ORDER and pa.types.is_float64(dst):
        return True
    if pa.types.is_float32(src) and pa.types.is_float64(dst):
        return True
    if _is_string(src) and _is_string(dst):
        return True
    if pa.types.is_timestamp(src) and pa.types.is_timestamp(dst):
        # finer -> coarser truncates; only widen toward finer units
        order = {"s": 0, "ms": 1, "us": 2, "ns": 3}
        return order[src.unit] <= order[dst.unit] and src.tz == dst.tz
    return False


def unify_types(a: pa.DataType, b: pa.DataType) -> pa.DataType:
    if can_promote(a, b):
        return b
    if can_promote(b, a):
        return a
    # two ints of mixed order already handled; int + float32 meet at float64
    if (a in _INT_ORDER and pa.types.is_float32(b)) or (b in _INT_ORDER and pa.types.is_float32(a)):
        return pa.float64()
    raise ValueError(f"incompatible column types {a} vs {b}")


def unify_schemas(schemas: list[pa.Schema]) -> pa.Schema:
    """Widest compatible schema across inputs; field order is first
    appearance. Raises on name collisions with non-promotable types."""
    if not schemas:
        raise ValueError("unify_schemas needs at least one schema")
    names: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                names.append(f.name)
                types[f.name] = f.type
            else:
                try:
                    types[f.name] = unify_types(types[f.name], f.type)
                except ValueError as e:
                    raise ValueError(f"column {f.name!r}: {e}") from e
    return pa.schema([(n, types[n]) for n in names])


def evolve_table(tbl: pa.Table, target: pa.Schema) -> pa.Table:
    """Resolve ``tbl`` against the reader schema: match columns BY NAME,
    promote types, null-fill missing columns, drop extras, emit the target
    order. Raises on a present column whose type can't promote."""
    n = tbl.num_rows
    cols = []
    for f in target:
        idx = tbl.schema.get_field_index(f.name)
        if idx < 0:
            cols.append(pa.nulls(n, f.type))
            continue
        col = tbl.column(idx)
        if col.type.equals(f.type):
            cols.append(col)
        elif can_promote(col.type, f.type):
            cols.append(col.cast(f.type))
        else:
            raise ValueError(f"column {f.name!r}: cannot promote {col.type} -> {f.type}")
    return pa.table(cols, schema=target)


def orc_file_schema(path: str) -> pa.Schema:
    """A file's Arrow schema from its TAIL only (footer types -> 0-row
    decode) — never touches stripe data."""
    from .orcread import _read_orc_src, _Source

    with _Source(path) as src:
        return _read_orc_src(src, None, None, stripe_idxs=[]).schema


def unified_orc_schema(paths: list[str]) -> pa.Schema:
    return unify_schemas([orc_file_schema(p) for p in paths])
