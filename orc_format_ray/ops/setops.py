"""Distributed set operations over key columns (SQL INTERSECT / EXCEPT /
UNION DISTINCT).

``key_set_op`` computes the distinct keys of two Datasets combined with set
semantics. Only (key, side-flag) metadata moves: each batch pre-dedupes its
keys with an Arrow ``group_by`` before anything shuffles, so the single
``groupby`` exchange carries at most one row per distinct key per block —
never the payload columns, never duplicate rows. Both branches are plain
task pools, so the union-into-groupby is safe (the actor-pool deadlock rule
from CLAUDE.md does not apply; same shape as ``ops.etl.table_diff``).

Reference scope note: the reference engine (blkerby/orc-format) has no set
operators at all; this is part of the Ray-native query surface built on top
of its storage format.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args

from .fastagg import fast_groupby

_OPS = ("intersect", "except", "union")


def key_set_op(ds_a, ds_b, key_a: str, key_b: str | None = None, op: str = "intersect"):
    """Distinct keys of ``ds_a[key_a]`` combined with ``ds_b[key_b]`` under
    ``op``:

    * ``"intersect"`` — keys present in BOTH inputs (SQL ``INTERSECT``);
    * ``"except"``    — keys present in ``ds_a`` but not ``ds_b``
      (SQL ``EXCEPT``);
    * ``"union"``     — keys present in EITHER input (SQL ``UNION``).

    Returns a Dataset with one column named ``key_a``. Null keys are
    dropped on both sides (SQL set ops treat NULL = NULL, but a null key is
    almost always ingest noise; filter upstream if you need them).
    """
    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    key_b = key_b or key_a
    from ray.data.aggregate import Sum

    def meta(col: str, side: int):
        def fn(batch: pa.Table) -> pa.Table:
            keys = pc.drop_null(batch[col].combine_chunks())
            distinct = pa.table({"k": keys}).group_by("k").aggregate([])
            n = distinct.num_rows
            return pa.table(
                {
                    "k": distinct["k"],
                    "__in_a__": pa.array([1 - side] * n, pa.int64()),
                    "__in_b__": pa.array([side] * n, pa.int64()),
                }
            )

        return fn

    ma = ds_a.map_batches(meta(key_a, 0), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    mb = ds_b.map_batches(meta(key_b, 1), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    agg = fast_groupby(
        ma.union(mb),
        "k",
        Sum("__in_a__", alias_name="na"), Sum("__in_b__", alias_name="nb"),
    )

    def pick(batch: pa.Table) -> pa.Table:
        na = batch["na"]
        nb = batch["nb"]
        if op == "intersect":
            mask = pc.and_(pc.greater(na, 0), pc.greater(nb, 0))
        elif op == "except":
            mask = pc.and_(pc.greater(na, 0), pc.equal(nb, 0))
        else:  # union
            mask = pc.greater(pc.add(na, nb), 0)
        return pa.table({key_a: batch.filter(mask)["k"]})

    return agg.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
