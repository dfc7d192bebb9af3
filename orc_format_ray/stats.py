"""Column statistics with the reference's partial-update + merge shape.

Mirrors the three-level hierarchy (row-group -> stripe -> file) of the
reference (reference: src/writer/statistics.rs:23-175, src/writer.rs:121-130)
as the Ray-Data-native partial-aggregate + final-merge pattern: stats are
computed vectorized per batch (update), carried in stripe manifests, and
folded on the driver (merge).

Semantics preserved from the reference:
* ``num_values`` counts all rows, ``num_present`` the non-null ones;
  ``has_null = num_values != num_present``
  (reference: src/writer/statistics/common.rs:1-10).
* LongStatistics.sum overflows to None and stays None
  (reference: src/writer/statistics/long.rs:36-46). We track the exact sum as
  a Python int and null it when it leaves int64 range (the reference's
  per-push checked_add could null on a transient mid-stream overflow that a
  batch-exact sum would miss — documented simplification).
* TimestampStatistics min/max are epoch millis ``sec*1000 + nanos/1e6``
  (reference: src/writer/data/timestamp.rs:131).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1


@dataclass
class ColumnStats:
    kind: str = "generic"  # long | double | string | boolean | binary | timestamp | decimal | generic
    num_values: int = 0
    num_present: int = 0
    min: Any = None
    max: Any = None
    sum: Any = None
    sum_overflowed: bool = False
    sum_lengths: int | None = None
    num_true: int | None = None
    num_false: int | None = None

    @property
    def has_null(self) -> bool:
        return self.num_values != self.num_present

    def to_dict(self) -> dict:
        return {
            "kind": self.kind,
            "num_values": self.num_values,
            "num_present": self.num_present,
            "min": self.min,
            "max": self.max,
            "sum": None if self.sum_overflowed else self.sum,
            "sum_lengths": self.sum_lengths,
            "num_true": self.num_true,
            "num_false": self.num_false,
            "has_null": self.has_null,
        }

    @staticmethod
    def from_dict(d: dict) -> "ColumnStats":
        s = ColumnStats(kind=d.get("kind", "generic"))
        s.num_values = d.get("num_values", 0)
        s.num_present = d.get("num_present", 0)
        s.min = d.get("min")
        s.max = d.get("max")
        s.sum = d.get("sum")
        s.sum_overflowed = d.get("sum") is None and s.kind == "long" and s.num_present > 0 and d.get("sum_overflowed_hint", False)
        s.sum_lengths = d.get("sum_lengths")
        s.num_true = d.get("num_true")
        s.num_false = d.get("num_false")
        return s


def _check_i64(total: int | None) -> tuple[Any, bool]:
    if total is None:
        return None, True
    if total < I64_MIN or total > I64_MAX:
        return None, True
    return total, False


def compute(arr: pa.Array | pa.ChunkedArray) -> ColumnStats:
    """Vectorized per-batch stats (the 'update' side of the pattern)."""
    t = arr.type
    s = ColumnStats(num_values=len(arr), num_present=len(arr) - arr.null_count)
    valid = arr.drop_null() if arr.null_count else arr
    if pa.types.is_integer(t) or pa.types.is_date(t):
        s.kind = "long"
        if pa.types.is_date32(t):
            valid = valid.view(pa.int32())
        elif pa.types.is_date64(t):
            valid = valid.view(pa.int64())
        if len(valid):
            # native-type kernels (no cast): uint64 extremes stay exact, and
            # sums outside int64 range become None (reference overflow rule)
            mm = pc.min_max(valid)
            s.min = int(mm["min"].as_py())
            s.max = int(mm["max"].as_py())
            s.sum, s.sum_overflowed = _check_i64(int(pc.sum(valid).as_py()))
    elif pa.types.is_floating(t):
        s.kind = "double"
        if len(valid):
            mm = pc.min_max(valid)
            s.min = float(mm["min"].as_py())
            s.max = float(mm["max"].as_py())
            s.sum = float(pc.sum(valid.cast(pa.float64())).as_py())
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        s.kind = "string"
        if len(valid):
            mm = pc.min_max(valid)
            s.min = mm["min"].as_py()
            s.max = mm["max"].as_py()
        s.sum_lengths = int(pc.sum(pc.binary_length(valid)).as_py() or 0)
    elif pa.types.is_boolean(t):
        s.kind = "boolean"
        nt = int(pc.sum(valid.cast(pa.int64())).as_py() or 0)
        s.num_true = nt
        s.num_false = len(valid) - nt
    elif pa.types.is_binary(t) or pa.types.is_large_binary(t):
        s.kind = "binary"
        s.sum_lengths = int(pc.sum(pc.binary_length(valid)).as_py() or 0)
    elif pa.types.is_timestamp(t):
        s.kind = "timestamp"
        if len(valid):
            # epoch millis = sec*1000 + nanos/1e6 with FLOORED seconds and
            # positive nanos (reference timestamp.rs:131) == floor(total ms);
            # pc.divide truncates toward zero, which lands pre-epoch values
            # 1 ms high, so use numpy floor_divide
            unit_per_ms = {"s": None, "ms": 1, "us": 1000, "ns": 1_000_000}[t.unit]
            raw = valid.view(pa.int64()).to_numpy(zero_copy_only=False)
            if t.unit == "s":
                ms = raw.astype(object) * 1000  # object avoids int64 wrap at extremes
            else:
                ms = np.floor_divide(raw, unit_per_ms)
            s.min = int(ms.min())
            s.max = int(ms.max())
    elif pa.types.is_decimal(t):
        s.kind = "decimal"
        if len(valid):
            from .stripe import decimal_unscaled

            fast, slow = decimal_unscaled(valid.combine_chunks() if isinstance(valid, pa.ChunkedArray) else valid)
            if fast is not None:
                s.min = str(int(fast.min()))
                s.max = str(int(fast.max()))
                s.sum = str(int(fast.astype(object).sum()))  # exact (no int64 wrap)
            else:
                s.min = str(min(slow))
                s.max = str(max(slow))
                s.sum = str(sum(slow))
    else:
        s.kind = "generic"
    return s


def merge(a: ColumnStats, b: ColumnStats) -> ColumnStats:
    """Merge two partials (the stripe->file fold; reference long.rs:60-78)."""
    if a.kind == "generic" and b.kind != "generic":
        a, b = b, a
    out = ColumnStats(kind=a.kind)
    out.num_values = a.num_values + b.num_values
    out.num_present = a.num_present + b.num_present

    def _mn(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return min(x, y)

    def _mx(x, y):
        if x is None:
            return y
        if y is None:
            return x
        return max(x, y)

    if a.kind == "decimal":
        am = None if a.min is None else int(a.min)
        bm = None if b.min is None else int(b.min)
        out.min = None if _mn(am, bm) is None else str(_mn(am, bm))
        aM = None if a.max is None else int(a.max)
        bM = None if b.max is None else int(b.max)
        out.max = None if _mx(aM, bM) is None else str(_mx(aM, bM))
        if a.sum is not None and b.sum is not None:
            out.sum = str(int(a.sum) + int(b.sum))
    else:
        out.min = _mn(a.min, b.min)
        out.max = _mx(a.max, b.max)
        if a.kind == "long":
            if a.sum_overflowed or b.sum_overflowed or (a.sum is None and a.num_present > 0) or (b.sum is None and b.num_present > 0):
                out.sum, out.sum_overflowed = None, True
            else:
                out.sum, out.sum_overflowed = _check_i64((a.sum or 0) + (b.sum or 0))
        elif a.kind == "double":
            out.sum = (a.sum or 0.0) + (b.sum or 0.0) if (a.sum is not None or b.sum is not None) else None
    if a.sum_lengths is not None or b.sum_lengths is not None:
        out.sum_lengths = (a.sum_lengths or 0) + (b.sum_lengths or 0)
    if a.num_true is not None or b.num_true is not None:
        out.num_true = (a.num_true or 0) + (b.num_true or 0)
        out.num_false = (a.num_false or 0) + (b.num_false or 0)
    return out


def merge_all(stats_list: list[ColumnStats]) -> ColumnStats:
    if not stats_list:
        return ColumnStats()
    acc = stats_list[0]
    for s in stats_list[1:]:
        acc = merge(acc, s)
    return acc
