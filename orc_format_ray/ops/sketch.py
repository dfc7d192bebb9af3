"""Mergeable sketches: HyperLogLog cardinality and Misra-Gries heavy hitters.

The unbounded-cardinality answers to "how many distinct?" and "what are the
hot items?" — the exact groupby plans (`vocab_topk`, `exact_dedup`) shuffle
|distinct| rows, which is right up to ~10^9 distincts; past that, a sketch
whose size is FIXED regardless of the data is the only plan that still
fits. Both sketches here fold as per-batch partials (one fixed-size row per
block to the driver) and merge exactly:

* **HLL**: registers combine by element-wise max — commutative and
  associative, so the estimate is IDENTICAL on any block layout or cluster
  size. 64-bit splitmix-mixed hashes; standard bias + linear-counting
  corrections; error ~1.04/sqrt(2^p).
* **Misra-Gries**: each block compresses its exact counts to k counters;
  summaries merge by count-sum then subtract-the-(k+1)th (the mergeable-
  summaries construction), preserving the deviation bound
  ``true - n/(k+1) <= est <= true``.
* **Exact heavy hitters in two passes** (`heavy_hitters_exact`): the MG
  bound makes the summary a GUARANTEED superset of every item with
  frequency >= min_count when k >= n/min_count, so one MG pass + one
  exact recount restricted to the candidate set (broadcast, tiny) returns
  provably exact results without ever shuffling the full vocabulary —
  and is therefore plain-SQL auditable (GROUP BY ... HAVING count >= t).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._rayutil import remote_args
from .text import content_hash

from .fastagg import fast_groupby

def _bit_length64(w: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length of uint64 lanes (0 for w == 0):
    six shift-compare rounds, no float conversion (float64 rounds near
    2^53 boundaries and would off-by-one the HLL rho)."""
    bl = np.zeros(len(w), dtype=np.int64)
    x = w.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x = np.where(big, x >> np.uint64(s), x)
    bl[w > 0] += 1
    return bl


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer: full-avalanche mix of 64-bit lanes (the
    polynomial content_hash alone has weak low-bit diffusion for HLL)."""
    h = h.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        h ^= h >> np.uint64(30)
        h *= np.uint64(0xBF58476D1CE4E5B9)
        h ^= h >> np.uint64(27)
        h *= np.uint64(0x94D049BB133111EB)
        h ^= h >> np.uint64(31)
    return h


def _column_hashes(col: pa.ChunkedArray) -> np.ndarray:
    """64-bit mixed hashes of a string or integer column (nulls dropped)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.drop_null()
    t = col.type
    if pa.types.is_integer(t):
        h = col.cast(pa.int64()).to_numpy(zero_copy_only=False).view(np.uint64)
    elif pa.types.is_string(t) or pa.types.is_large_string(t):
        h = content_hash(col)
    else:
        raise TypeError(f"sketches hash string/integer columns, got {t}")
    return _mix64(h)


class HLL:
    """Dense HyperLogLog with 2^p registers (p in [4, 18])."""

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        if not 4 <= p <= 18:
            raise ValueError(f"p must be in [4, 18], got {p}")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8) if registers is None else registers

    def update_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = (h << np.uint64(self.p)).astype(np.uint64)  # remaining bits, top-aligned
        # rho = (leading zeros of the 64-bit lane) + 1 = 64 - bit_length + 1
        rho = 64 - _bit_length64(w) + 1  # w == 0 lanes get 65, clipped below
        rho = np.minimum(rho, 64 - self.p + 1)
        np.maximum.at(self.registers, idx, rho.astype(np.uint8))
        return self

    def merge(self, other: "HLL") -> "HLL":
        if other.p != self.p:
            raise ValueError(f"cannot merge HLL(p={other.p}) into HLL(p={self.p})")
        return HLL(self.p, np.maximum(self.registers, other.registers))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m) if self.m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}[self.m]
        e = alpha * m * m / np.sum(np.exp2(-self.registers.astype(np.float64)))
        if e <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return float(m * np.log(m / zeros))
        return float(e)


def approx_ndistinct(ds, col: str, p: int = 14) -> tuple[float, HLL]:
    """Approximate distinct count of ``ds[col]`` — ONE streaming pass, one
    2^p-byte register row per block to the driver, max-merged. The result is
    layout- and cluster-size-invariant (register max is commutative)."""

    def partial(batch: pa.Table) -> pa.Table:
        h = HLL(p).update_hashes(_column_hashes(batch[col]))
        return pa.table({"regs": pa.array([h.registers], pa.list_(pa.uint8()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    acc = HLL(p)
    for row in parts:
        acc.registers = np.maximum(acc.registers, np.asarray(row["regs"], dtype=np.uint8))
    return acc.estimate(), acc


def _mg_compress(items: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Keep the top k counters, subtracting the (k+1)-th count from the
    survivors (the mergeable-summaries rule that preserves the MG bound)."""
    if len(items) <= k:
        return items, counts
    order = np.argsort(-counts, kind="stable")
    pivot = counts[order[k]]
    keep = order[:k]
    kept = counts[keep] - pivot
    good = kept > 0
    return items[keep][good], kept[good]


def mg_partials(ds, col: str, k: int):
    """Per-block Misra-Gries summaries: exact in-block counts compressed to
    k counters — at most k (item, cnt) rows per block ever move."""

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({col: batch[col]})
        g = t.drop_null().group_by(col).aggregate([(col, "count")])
        items = g[col].to_numpy(zero_copy_only=False)
        counts = g[f"{col}_count"].to_numpy(zero_copy_only=False).astype(np.int64)
        items, counts = _mg_compress(items, counts, k)
        return pa.table({"item": pa.array(items), "cnt": pa.array(counts, pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())


def heavy_hitters(ds, col: str, k: int) -> pa.Table:
    """Merged Misra-Gries summary of ``ds[col]``: <= k (item, est) rows with
    ``true - n/(k+1) <= est <= true``, sorted by est desc."""
    from ray.data.aggregate import Sum

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    merged = fast_groupby(
        mg_partials(ds, col, k),
        "item",
        Sum("cnt", alias_name="cnt"),
    )
    tbl = pa.concat_tables(list(merged.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    items = tbl["item"].to_numpy(zero_copy_only=False)
    counts = tbl["cnt"].to_numpy(zero_copy_only=False).astype(np.int64)
    items, counts = _mg_compress(items, counts, k)
    order = np.argsort(-counts, kind="stable")
    return pa.table({"item": pa.array(items[order]), "est": pa.array(counts[order], pa.int64())})


def heavy_hitters_exact(ds, col: str, min_count: int, n_total: int | None = None) -> pa.Table:
    """EXACT items with frequency >= min_count in two passes, vocabulary
    never shuffled: (1) a Misra-Gries pass with k >= n/min_count — the MG
    bound guarantees every qualifying item survives as a candidate; (2) an
    exact recount restricted to the broadcast candidate set (tiny), then
    the HAVING filter. Plain-SQL equivalent: GROUP BY col HAVING count(*)
    >= min_count. Returns (item, cnt) sorted by (cnt desc, item)."""
    import ray
    from ray.data.aggregate import Sum

    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    if n_total is None:
        def sizes(batch: pa.Table) -> pa.Table:
            return pa.table({"n": pa.array([len(batch[col].drop_null())], pa.int64())})

        n_total = sum(
            int(r["n"])
            for r in ds.map_batches(sizes, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
        )
    k = max(int(np.ceil(n_total / min_count)), 1)
    summary = heavy_hitters(ds, col, k)
    cand_ref = ray.put(summary["item"].combine_chunks())

    def recount(batch: pa.Table) -> pa.Table:
        import ray as _ray

        cands = _ray.get(cand_ref)
        t = pa.table({col: batch[col]}).drop_null()
        t = t.filter(pc.is_in(t[col], value_set=cands))
        g = t.group_by(col).aggregate([(col, "count")])
        return g.rename_columns(["item", "cnt"])

    merged = (fast_groupby(
        ds.map_batches(recount, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        "item",
        Sum("cnt", alias_name="cnt"),
    )
    )
    tbl = pa.concat_tables(list(merged.iter_batches(batch_size=1 << 20, batch_format="pyarrow")))
    keep = pc.greater_equal(tbl["cnt"], pa.scalar(min_count, pa.int64()))
    out = tbl.filter(keep)
    return out.sort_by([("cnt", "descending"), ("item", "ascending")])


class KLLSketch:
    """KLL quantile sketch: fixed-size mergeable summary for rank/quantile
    queries over unbounded continuous columns — the companion to the EXACT
    value-count quantile plans (ops/agg.py), which stop fitting when
    |distinct values| explodes. Level-i items carry weight 2^i; a full
    level sorts and keeps alternating items (deterministic alternation via
    a per-level toggle seeded by ``seed`` — reproducible for the same
    update/merge sequence). Rank error is O(1/k) with k items of state per
    level and ~log2(n/k) levels."""

    def __init__(self, k: int = 200, seed: int = 1):
        if k < 8:
            raise ValueError(f"k must be >= 8, got {k}")
        self.k = k
        self.compactors: list[list[float]] = [[]]
        self.n = 0
        self._toggle = int(seed) & 1

    def _capacity(self, level: int) -> int:
        # top levels get full k, lower levels shrink by (2/3)^depth, min 2
        depth = len(self.compactors) - level - 1
        return max(2, int(self.k * (2.0 / 3.0) ** depth))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self.compactors)))

    def _size(self) -> int:
        return sum(len(c) for c in self.compactors)

    def _compress(self) -> None:
        while self._size() > self._total_capacity():
            for h in range(len(self.compactors)):
                if len(self.compactors[h]) > self._capacity(h):
                    if h + 1 == len(self.compactors):
                        self.compactors.append([])
                    buf = sorted(self.compactors[h])
                    self._toggle ^= 1
                    self.compactors[h + 1].extend(buf[self._toggle :: 2])
                    self.compactors[h] = []
                    break
            else:
                break

    def update_many(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if not len(v):
            return
        self.n += len(v)
        self.compactors[0].extend(v.tolist())
        self._compress()

    def merge(self, other: "KLLSketch") -> None:
        while len(self.compactors) < len(other.compactors):
            self.compactors.append([])
        for h, c in enumerate(other.compactors):
            self.compactors[h].extend(c)
        self.n += other.n
        self._toggle ^= other._toggle
        self._compress()

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for h, c in enumerate(self.compactors):
            vals.extend(c)
            wts.extend([1 << h] * len(c))
        v = np.array(vals, dtype=np.float64)
        w = np.array(wts, dtype=np.int64)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantiles(self, qs: list[float]) -> list[float]:
        if self.n == 0:
            return [float("nan")] * len(qs)
        v, w = self._weighted()
        cum = np.cumsum(w)
        total = int(cum[-1])
        out = []
        for q in qs:
            if not 0.0 <= q <= 1.0:
                raise ValueError(f"quantile fractions must be in [0, 1], got {q}")
            target = q * total
            i = int(np.searchsorted(cum, target, side="left"))
            out.append(float(v[min(i, len(v) - 1)]))
        return out

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        if self.n == 0:
            return float("nan")
        v, w = self._weighted()
        return float(w[v <= x].sum() / w.sum())

    def to_rows(self) -> pa.Table:
        return pa.table(
            {
                "level": pa.array(range(len(self.compactors)), pa.int64()),
                "values": pa.array([list(c) for c in self.compactors], pa.list_(pa.float64())),
                "n": pa.array([self.n] + [0] * (len(self.compactors) - 1), pa.int64()),
                "k": pa.array([self.k] * len(self.compactors), pa.int64()),
            }
        )

    @staticmethod
    def from_rows(tbl: pa.Table) -> "KLLSketch":
        s = KLLSketch(k=int(tbl["k"][0].as_py()))
        levels = tbl["level"].to_pylist()
        s.compactors = [[] for _ in range(max(levels) + 1)]
        for lv, vals in zip(levels, tbl["values"].to_pylist()):
            s.compactors[lv] = list(vals)
        s.n = int(sum(tbl["n"].to_pylist()))
        return s


def kll_quantiles(ds, col: str, qs: list[float], k: int = 200) -> tuple[list[float], "KLLSketch"]:
    """Distributed quantile estimation: one KLL partial per block (a few
    KB each regardless of rows), a deterministic driver fold (partials
    sorted before merging, so the estimate is reproducible for a given
    block layout), then the quantile read-off. Returns (estimates, the
    merged sketch) — keep the sketch to answer more quantiles/ranks
    without another pass."""

    def partial(batch: pa.Table) -> pa.Table:
        s = KLLSketch(k=k)
        s.update_many(batch[col].to_numpy(zero_copy_only=False))
        return s.to_rows()

    rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).to_pandas()
    master = KLLSketch(k=k)
    # deterministic fold order: group rows back into per-block sketches
    # keyed by (n at level 0, level-0 payload head)
    import pandas as pd  # noqa: F401

    parts: list[KLLSketch] = []
    cur: dict[int, list] = {}
    # rows arrive block-contiguous (level restarts at 0 per block)
    block_rows: list[list] = []
    for lv, vals, n, kk in rows.itertuples(index=False):
        if int(lv) == 0:
            block_rows.append([])
        block_rows[-1].append((int(lv), list(vals), int(n), int(kk)))
    for br in block_rows:
        t = pa.table(
            {
                "level": pa.array([r[0] for r in br], pa.int64()),
                "values": pa.array([r[1] for r in br], pa.list_(pa.float64())),
                "n": pa.array([r[2] for r in br], pa.int64()),
                "k": pa.array([r[3] for r in br], pa.int64()),
            }
        )
        parts.append(KLLSketch.from_rows(t))
    parts.sort(key=lambda s: (s.n, s.compactors[0][:4] if s.compactors[0] else []))
    for p in parts:
        master.merge(p)
    return master.quantiles(list(qs)), master


def kll_by_group(ds, group: str, col: str, qs: list[float], k: int = 200):
    """Per-group KLL quantile estimation — one mergeable fixed-size sketch
    per (block, group) moves (a few KB each), NEVER the rows: the per-group
    answer for unbounded continuous columns where `grouped_quantiles`'
    distinct-value plan stops fitting. Partial sketches serialize to one
    (group, blob) row each; one groupby ships them; each group's fold
    merges in sorted-blob order (deterministic for a fixed block layout —
    estimates are layout-stable, not bit-stable: rows-only oracle).
    Returns a Dataset of ``(group, q, est)``."""
    import pickle

    import pandas as pd

    qs = list(qs)
    if not qs or any(not (0.0 <= q <= 1.0) for q in qs):
        raise ValueError(f"qs must be fractions in [0, 1], got {qs}")

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "g": batch[group].to_pandas(),
            "v": batch[col].to_numpy(zero_copy_only=False),
        })
        gs, blobs = [], []
        for gval, sub in df.groupby("g", sort=True):
            s = KLLSketch(k=k)
            s.update_many(sub["v"].to_numpy())
            gs.append(gval)
            blobs.append(pickle.dumps(s))
        return pa.table({"g": pa.array(gs), "blob": pa.array(blobs, pa.large_binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        blobs = sorted(g["blob"])  # deterministic merge order
        master: KLLSketch | None = None
        for b in blobs:
            s = pickle.loads(b)
            if master is None:
                master = s
            else:
                master.merge(s)
        est = master.quantiles(qs)
        return pd.DataFrame({group: [g["g"].iloc[0]] * len(qs), "q": qs, "est": est})

    return parts.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())


def approx_ndistinct_by_group(ds, group: str, col: str, p: int = 12):
    """Approximate per-group distinct counts — one 2^p-byte HLL register
    row per (block, group) moves, never the values: the per-group NDV
    answer when `ndistinct_by_group`'s exact (group, value) cell shuffle
    stops fitting (e.g. distinct user ids per source at 100 TB). Register
    max is commutative and idempotent, so the estimate is LAYOUT-INVARIANT
    (bit-identical on any plan / cluster size) — but approximate, so the
    driver check is rows-only; accuracy is pinned by unit tests against
    exact counts. Returns a Dataset of ``(group, est)``."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        h_all = _column_hashes(batch[col])
        gs = batch[group].to_pandas()
        groups, regs = [], []
        for gval, idx in gs.groupby(gs, sort=True).groups.items():
            h = HLL(p).update_hashes(h_all[np.asarray(idx, dtype=np.int64)])
            groups.append(gval)
            regs.append(h.registers)
        return pa.table({"g": pa.array(groups), "regs": pa.array(regs, pa.list_(pa.uint8()))})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        acc = HLL(p)
        for row in g["regs"]:
            acc.registers = np.maximum(acc.registers, np.asarray(row, dtype=np.uint8))
        return pd.DataFrame({group: [g["g"].iloc[0]], "est": [acc.estimate()]})

    return parts.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())


# --------------------------------------------------------------- Count-Min


class CountMin:
    """Count-Min sketch: a ``d x w`` int64 counter matrix, mergeable by
    elementwise ADDITION (fully commutative — layout- and cluster-size-
    invariant results). Point estimates NEVER undercount; the overcount is
    <= eps*N with probability 1-delta at w = ceil(e/eps), d = ceil(ln 1/delta).
    Row hashes are splitmix64 over (item_hash XOR per-row odd seed)."""

    def __init__(self, w: int = 2048, d: int = 5, seed: int = 11):
        if w < 2 or d < 1:
            raise ValueError(f"CountMin needs w >= 2, d >= 1 (got w={w}, d={d})")
        self.w, self.d = int(w), int(d)
        rng = np.random.default_rng(seed)
        self.row_seeds = rng.integers(1, np.iinfo(np.int64).max, self.d, dtype=np.uint64) | np.uint64(1)
        self.m = np.zeros((self.d, self.w), dtype=np.int64)
        self.n = 0

    def _slots(self, h: np.ndarray) -> np.ndarray:
        return np.stack([(_mix64(h ^ s) % np.uint64(self.w)).astype(np.int64) for s in self.row_seeds])

    def add_hashes(self, h: np.ndarray) -> "CountMin":
        if len(h):
            slots = self._slots(h)
            for i in range(self.d):
                np.add.at(self.m[i], slots[i], 1)
            self.n += int(len(h))
        return self

    def merge(self, other: "CountMin") -> "CountMin":
        if (self.w, self.d) != (other.w, other.d) or not np.array_equal(self.row_seeds, other.row_seeds):
            raise ValueError("CountMin merge: incompatible shapes/seeds")
        self.m += other.m
        self.n += other.n
        return self

    def estimate_hashes(self, h: np.ndarray) -> np.ndarray:
        if not len(h):
            return np.zeros(0, np.int64)
        slots = self._slots(h)
        return np.min(np.stack([self.m[i][slots[i]] for i in range(self.d)]), axis=0)


def countmin_counts(ds, col: str, w: int = 2048, d: int = 5, seed: int = 11) -> CountMin:
    """ONE streaming pass: per-block CountMin partials (d*w*8 bytes each)
    added on the driver. Addition is commutative, so the merged sketch is
    bit-identical on any plan / cluster size."""

    def partial(batch: pa.Table) -> pa.Table:
        sk = CountMin(w, d, seed).add_hashes(_column_hashes(batch[col]))
        return pa.table(
            {
                "m": pa.array([sk.m.reshape(-1)], pa.list_(pa.int64())),
                "n": pa.array([sk.n], pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    acc = CountMin(w, d, seed)
    for row in parts:
        acc.m += np.asarray(row["m"], dtype=np.int64).reshape(d, w)
        acc.n += int(row["n"])
    return acc


def countmin_estimate(sk: CountMin, items: pa.Array) -> np.ndarray:
    """Point estimates for ``items`` (string or integer array) — never
    below the true count."""
    if isinstance(items, pa.ChunkedArray):
        items = items.combine_chunks()
    return sk.estimate_hashes(_column_hashes(pa.chunked_array([items])))


def hll_by_group(ds, group: str, col: str, p: int = 14) -> dict:
    """Per-group HLL register sets (the reusable state behind
    `approx_ndistinct_by_group` and `hll_overlap_matrix`): one 2^p-byte
    register row per (block, group) moves, never the values; the driver
    max-folds per group. Returns {group_value: HLL} — layout- and
    cluster-size-invariant (register max is commutative/idempotent)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        h_all = _column_hashes(batch[col])
        gs = batch[group].to_pandas()
        groups, regs = [], []
        for gval, idx in gs.groupby(gs, sort=True).groups.items():
            h = HLL(p).update_hashes(h_all[np.asarray(idx, dtype=np.int64)])
            groups.append(gval)
            regs.append(h.registers)
        return pa.table({"g": pa.array(groups), "regs": pa.array(regs, pa.list_(pa.uint8()))})

    rows = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args()).take_all()
    out: dict = {}
    for row in rows:
        h = out.setdefault(row["g"], HLL(p))
        h.registers = np.maximum(h.registers, np.asarray(row["regs"], dtype=np.uint8))
    return out


def hll_overlap_matrix(ds, group: str, col: str, p: int = 14):
    """Pairwise distinct-value overlap between groups WITHOUT shuffling the
    values: per-group HLLs fold once (fixed-size state), then every pair
    answers by sketch algebra — est(A ∪ B) from the register max,
    est(A ∩ B) by inclusion-exclusion, Jaccard from the two. The exact
    plan (`key_set_op` / distinct-pair groupby) ships every (group, value)
    cell; this ships |groups| * 2^p bytes TOTAL, the only plan that still
    fits when values are unbounded (e.g. user overlap across 10^5 shards).
    Estimates are approximate (rows-only oracle; accuracy pinned in
    pytest) but layout-invariant. Returns a pandas DataFrame
    (group_a, group_b, est_a, est_b, est_union, est_intersection,
    jaccard_est) for group_a < group_b."""
    import pandas as pd

    sketches = hll_by_group(ds, group, col, p=p)
    names = sorted(sketches)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1:]:
            ea, eb = sketches[a].estimate(), sketches[b].estimate()
            eu = sketches[a].merge(sketches[b]).estimate()
            inter = max(ea + eb - eu, 0.0)
            rows.append({
                "group_a": a, "group_b": b,
                "est_a": ea, "est_b": eb, "est_union": eu,
                "est_intersection": inter,
                "jaccard_est": inter / eu if eu > 0 else 0.0,
            })
    return pd.DataFrame(rows)


def heavy_hitters_by_group(ds, group: str, col: str, k: int):
    """Per-group Misra-Gries heavy hitters — the per-stratum variant of
    `heavy_hitters` for vocabularies that don't fit an exact per-group
    groupby (e.g. top URLs per source at 100 TB). Each (block, group)
    contributes at most ``k`` (item, cnt) counters; one groupby ships
    them; each group's fold sums then re-compresses with the mergeable-
    summaries rule, preserving ``true - n_g/(k+1) <= est <= true`` within
    the group. Returns a Dataset of ``(group, item, est)``, at most k rows
    per group, sorted within the fold by (est desc, item)."""
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({group: batch[group], col: batch[col]})
        t = t.drop_null()
        g = t.group_by([group, col]).aggregate([(col, "count")])
        df = pd.DataFrame({
            "g": g[group].to_numpy(zero_copy_only=False),
            "item": g[col].to_numpy(zero_copy_only=False),
            "cnt": g[f"{col}_count"].to_numpy(zero_copy_only=False).astype(np.int64),
        })
        outs = []
        for gv, sub in df.groupby("g", sort=True):
            items, counts = _mg_compress(sub["item"].to_numpy(), sub["cnt"].to_numpy(), k)
            outs.append(pd.DataFrame({"g": gv, "item": items, "cnt": counts}))
        out = pd.concat(outs, ignore_index=True) if outs else df.iloc[:0]
        return pa.table({"g": pa.array(out["g"]), "item": pa.array(out["item"]),
                         "cnt": pa.array(out["cnt"].to_numpy(), pa.int64())})

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("item", as_index=False)["cnt"].sum()
        items, counts = _mg_compress(s["item"].to_numpy(), s["cnt"].to_numpy().astype(np.int64), k)
        order = np.lexsort((items, -counts))
        return pd.DataFrame({group: g["g"].iloc[0], "item": items[order],
                             "est": counts[order].astype(np.int64)})

    return parts.groupby("g").map_groups(fold, batch_format="pandas", **remote_args())
