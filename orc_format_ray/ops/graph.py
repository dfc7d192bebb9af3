"""Graph analytics over edge tables (the link-analysis complement of
ops/dedup.py's connected components).

``pagerank`` — power-iteration PageRank in EXACT-INTEGER arithmetic so a
distributed run is bit-identical to the SQL oracle: ranks live in int64
"units" of ``scale`` (default 1e12 = whole graph mass), every contribution
is the floor division ``(damping_num * r_src) // (damping_den * outdeg)``,
and each iteration's new rank is ``base + sum(contributions)`` with
``base = ((damping_den - damping_num) * scale) // (damping_den * n)``.
Float PageRank is summation-order-dependent; integer floor-div PageRank is
associative, so any shuffle plan gives the same bits.

Semantics notes (mirror these in any oracle):
* dangling nodes (no out-edges) contribute nothing — their mass decays
  rather than redistributing (the "drop dangling mass" convention);
* duplicate edges collapse first (DISTINCT src,dst);
* node ids share ONE id space — offset one side yourself for bipartite
  graphs.

Scale plan: edges dedupe through one (src,dst) cell groupby and then stay
put, materialized; each iteration is one map_batches over the edge blocks
(per-batch local group-by on dst) + ONE (dst, partial-sum) cell groupby.
The rank vector itself rides the driver <-> object store each iteration
(``ray.put`` broadcast, |nodes| bounded by ``max_broadcast_nodes``) — the
right trade while ranks fit in one machine's memory (16M nodes ~ 256 MB).
Above the guard, ``pagerank`` and ``bfs_hops`` switch to the SHARDED plan
(VERDICT r4 #5): the rank vector / visited set becomes a hash-bucketed
Dataset ``state`` joined per round via ``hash_join`` — no |nodes|-sized
driver or broadcast object anywhere; the integer arithmetic is identical
term-for-term, so both plans are bit-equal (pinned by pytest). State
repartitions EVERY round (the iterative-Dataset rule — groupby/union
outputs compound block counts otherwise).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args
from .fastagg import fast_groupby


def pagerank(edges_ds, src: str = "src", dst: str = "dst", iterations: int = 3,
             scale: int = 10**12, damping_num: int = 850, damping_den: int = 1000,
             max_broadcast_nodes: int = 1 << 24, mode: str = "auto"):
    """Exact-integer PageRank over a directed edge Dataset. Returns a
    pandas DataFrame ``(node, rank_units)`` — int64, one row per distinct
    node.

    ``mode``: ``"broadcast"`` keeps the rank vector driver-resident
    (fastest while |nodes| fits — see module doc); ``"sharded"`` keeps it
    as a hash-bucketed Dataset joined per round (no |nodes|-sized object
    anywhere — the 10^9-node plan); ``"auto"`` (default) picks broadcast
    up to ``max_broadcast_nodes`` and sharded beyond. The two plans are
    bit-identical (integer floor-div arithmetic is shuffle-invariant).
    """
    import ray
    from ray.data.aggregate import Sum

    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"mode must be auto|broadcast|sharded, got {mode!r}")

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "s": batch[src].cast(pa.int64()),
                "d": batch[dst].cast(pa.int64()),
            }
        )
        if t["s"].null_count or t["d"].null_count:
            raise ValueError("edge endpoints must be non-null")
        return t.group_by(["s", "d"]).aggregate([])

    cells = edges_ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    from ray.data.aggregate import Count

    edges = fast_groupby(cells, ["s", "d"], Count(alias_name="__pr_c__")).select_columns(["s", "d"]).materialize()

    # node universe + out-degrees (both |nodes|-sized — driver-resident)
    ends = edges.map_batches(
        lambda b: pa.table({"id": pa.concat_arrays([b["s"].combine_chunks(), b["d"].combine_chunks()]).unique()}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    nodes_ds = fast_groupby(ends, "id", Count(alias_name="__pr_n__")).select_columns(["id"]).materialize()
    n = nodes_ds.count()
    if n == 0:  # fully-empty Datasets drop columns in to_pandas
        import pandas as pd

        return pd.DataFrame({"node": pd.Series([], dtype="int64"), "rank_units": pd.Series([], dtype="int64")})
    if mode == "auto":
        mode = "broadcast" if n <= max_broadcast_nodes else "sharded"
    if mode == "sharded":
        return _pagerank_sharded(edges, nodes_ds, n, iterations, scale, damping_num, damping_den)
    if n > max_broadcast_nodes:
        raise ValueError(
            f"{n} nodes exceed max_broadcast_nodes={max_broadcast_nodes}; "
            "use mode='sharded' (or 'auto') or raise the guard"
        )
    node_ids = np.sort(nodes_ds.to_pandas()["id"].to_numpy(dtype=np.int64))
    deg_df = fast_groupby(edges, "s", Count(alias_name="deg")).to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    deg_idx = np.searchsorted(node_ids, deg_df["s"].to_numpy(dtype=np.int64))
    deg[deg_idx] = deg_df["deg"].to_numpy(dtype=np.int64)

    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    ranks = np.full(n, scale // n, dtype=np.int64)
    nodes_ref = ray.put(node_ids)
    deg_ref = ray.put(deg)

    for _ in range(iterations):
        ranks_ref = ray.put(ranks)

        def contribs(batch: pa.Table) -> pa.Table:
            ids = ray.get(nodes_ref)
            r = ray.get(ranks_ref)
            dg = ray.get(deg_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids, s)
            c = (damping_num * r[si]) // (damping_den * dg[si])
            t = pa.table({"d": pa.array(d, pa.int64()), "c": pa.array(c, pa.int64())})
            g = t.group_by("d").aggregate([("c", "sum")])
            return g.rename_columns(["d", "c"])

        sums = fast_groupby(
            edges.map_batches(contribs, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
            "d", Sum("c", alias_name="c"),
        ).to_pandas()
        nxt = np.full(n, base, dtype=np.int64)
        di = np.searchsorted(node_ids, sums["d"].to_numpy(dtype=np.int64))
        nxt[di] += sums["c"].to_numpy(dtype=np.int64)
        ranks = nxt

    import pandas as pd

    return pd.DataFrame({"node": node_ids, "rank_units": ranks})


def _pagerank_sharded(edges, nodes_ds, n: int, iterations: int,
                      scale: int, damping_num: int, damping_den: int):
    """Sharded-state power iteration (module doc, VERDICT r4 #5): state
    ``(node, deg, rank_units)`` is a hash-bucketed Dataset; each round is
    TWO bucketed joins (contribs: edges ⋈ state on src; refresh: state ⟕
    contrib-sums on node) plus one (dst) groupby — no |nodes|-sized driver
    or broadcast object anywhere. Exact-int parity with the broadcast plan:
    the floor-div terms are identical and every value stays < 2^53
    (guarded) so the left join's NaN-float round-trip is lossless. State
    repartitions every round (the iterative-Dataset rule)."""
    import pandas as pd

    from ray.data.aggregate import Count, Sum

    from .._rayutil import pool_size
    from .join import hash_join

    if scale >= 1 << 50:
        raise ValueError(
            f"sharded pagerank needs scale < 2^50 (exact NaN round-trip bound), got {scale}"
        )
    base = ((damping_den - damping_num) * scale) // (damping_den * n)
    init = scale // n
    nblocks = max(8, pool_size())

    def _ren(col_from: str, col_to: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([col_to if c == col_from else c for c in b.column_names])

        return fn

    nodes_n = nodes_ds.map_batches(_ren("id", "node"), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    deg_n = (
        fast_groupby(edges, "s", Count(alias_name="deg"))
        .map_batches(_ren("s", "node"), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    )

    _empty_state = pa.table({
        "node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64()),
        "rank_units": pa.array([], pa.int64()),
    })

    def seed(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:  # empty bucket -> column-less block
            return _empty_state
        deg = np.nan_to_num(b["deg"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0).astype(np.int64)
        node = b["node"].combine_chunks().cast(pa.int64())
        return pa.table({
            "node": node,
            "deg": pa.array(deg, pa.int64()),
            "rank_units": pa.array(np.full(len(node), init, dtype=np.int64)),
        })

    state = (
        hash_join(nodes_n, deg_n, key="node", how="left")
        .map_batches(seed, batch_format="pyarrow", **remote_args())
        .repartition(nblocks)
        .materialize()
    )

    for _ in range(iterations):
        state_s = state.map_batches(_ren("node", "s"), batch_format="pyarrow", zero_copy_batch=True, **remote_args())

        def contrib(b: pa.Table) -> pa.Table:
            if "d" not in b.column_names:  # empty inner-join bucket
                return pa.table({"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
            r = b["rank_units"].to_numpy(zero_copy_only=False).astype(np.int64)
            dg = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (damping_num * r) // (damping_den * dg)  # dg >= 1: rows joined via out-edges
            t = pa.table({"node": pa.array(d), "c": pa.array(c)})
            g = t.group_by("node").aggregate([("c", "sum")])
            return g.rename_columns(["node", "c"])

        sums = (
            hash_join(edges, state_s, key="s")
            .map_batches(contrib, batch_format="pyarrow", **remote_args())
            .groupby("node")
            .aggregate(Sum("c", alias_name="c"))
        )

        def refresh(b: pa.Table) -> pa.Table:
            if "node" not in b.column_names:
                return _empty_state
            c = np.nan_to_num(b["c"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
            if np.any(np.abs(c) >= float(1 << 53)):
                raise ValueError("pagerank sharded: contribution sum exceeds exact-float bound")
            return pa.table({
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "deg": b["deg"].combine_chunks().cast(pa.int64()),
                "rank_units": pa.array(base + c.astype(np.int64), pa.int64()),
            })

        state = (
            hash_join(state.select_columns(["node", "deg"]), sums, key="node", how="left")
            .map_batches(refresh, batch_format="pyarrow", **remote_args())
            .repartition(nblocks)
            .materialize()
        )

    out = state.select_columns(["node", "rank_units"]).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node": out["node"].astype("int64"), "rank_units": out["rank_units"].astype("int64")})


def triangle_count(edges_ds, src: str = "src", dst: str = "dst",
                   max_forward_degree: int = 1 << 14, num_buckets: int = 256):
    """Distributed triangle counting (the clustering-coefficient numerator
    and spam/community signal). Each triangle ``a < b < c`` is counted
    exactly once, at its SMALLEST vertex; returns a Dataset of
    ``(node, n_triangles)`` for nodes that close >= 1 triangle — sum the
    column for the global count. SQL mirror: the classic three-way
    self-join over canonical edges.

    Plan (the standard node-iterator-with-orientation scheme):

    1. canonicalize ``(min, max)``, drop self-loops, ONE (a, b) cell
       groupby dedupes — after orientation every node keeps only its
       FORWARD (larger-id) neighbors, which bounds wedge fan-out by the
       forward degree, not the raw degree;
    2. ``groupby(a).map_groups`` emits the wedges ``(b, c, apex=a)`` for
       each forward-neighbor pair ``b < c`` — guarded at
       ``max_forward_degree`` (fan-out is d*(d-1)/2; orient-by-degree
       before raising the guard);
    3. wedges UNION the edge rows (both tagged, same task-pool lineage)
       and ONE ``groupby(bucket)`` (bucket = packed pair mod 256) closes
       each bucket VECTORIZED (np.isin of wedge pairs against edge pairs —
       no per-pair Python); a tiny ``groupby(node)`` sum finishes.

    Node ids must be in [0, 2^31) (pairs pack into one int64). Only
    (int64 pair) metadata ever shuffles; wedge volume (sum of
    forward-degree^2 / 2) is the inherent cost of exact triangle
    enumeration."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) and (s.min() < 0 or d.min() < 0 or max(s.max(), d.max()) >= 1 << 31):
            raise ValueError("triangle_count: node ids must be in [0, 2^31) — pairs pack into int64")
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0], pa.int64()), "b": pa.array(u[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .groupby("a").map_groups(
            lambda g: g.drop_duplicates(), batch_format="pandas", **remote_args()
        )
    )
    # pin the deduped edge table: wedge generation AND closure both read it
    edges = edges.materialize()

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.unique(g["b"].to_numpy())
        d = len(nb)
        if d > max_forward_degree:
            raise ValueError(
                f"triangle_count: forward degree {d} exceeds max_forward_degree={max_forward_degree}"
            )
        if d < 2:
            return pd.DataFrame({"x": pd.Series(dtype="int64"), "y": pd.Series(dtype="int64"),
                                 "apex": pd.Series(dtype="int64")})
        i, j = np.triu_indices(d, k=1)
        pair = (nb[i].astype(np.int64) << np.int64(32)) | nb[j].astype(np.int64)
        return pd.DataFrame({
            "bucket": pair % np.int64(num_buckets),
            "pair": pair,
            "apex": np.full(len(i), int(g["a"].iloc[0]), dtype=np.int64),
        })

    wedge_ds = edges.groupby("a").map_groups(wedges, batch_format="pandas", **remote_args())
    # normalize to Arrow blocks: union() refuses mixed pandas/arrow lineages
    wedge_ds = wedge_ds.map_batches(
        lambda t: t, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )

    def tag_edge(batch: pa.Table) -> pa.Table:
        pair = (batch["a"].to_numpy(zero_copy_only=False).astype(np.int64) << np.int64(32)) \
            | batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(pair % np.int64(num_buckets), pa.int64()),
            "pair": pa.array(pair, pa.int64()),
            "apex": pa.array(np.full(batch.num_rows, -1, dtype=np.int64), pa.int64()),
        })

    tagged_edges = edges.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def bucket_close(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy()
        apex = g["apex"].to_numpy()
        is_edge = apex == -1
        hits = apex[~is_edge][np.isin(pair[~is_edge], pair[is_edge])]
        if not len(hits):
            return pd.DataFrame({"node": pd.Series(dtype="int64"), "n": pd.Series(dtype="int64")})
        u, c = np.unique(hits, return_counts=True)
        return pd.DataFrame({"node": u.astype(np.int64), "n": c.astype(np.int64)})

    closed = (
        wedge_ds.union(tagged_edges)
        .groupby("bucket")
        .map_groups(bucket_close, batch_format="pandas", **remote_args())
    )
    return fast_groupby(closed, "node", Sum("n", alias_name="n_triangles"))


def kcore(edges_ds, k: int, src: str = "src", dst: str = "dst",
          max_iters: int = 200, max_broadcast_nodes: int = 1 << 24,
          mode: str = "auto"):
    """k-core decomposition: iteratively peel nodes of degree < k until the
    survivor graph is stable — the standard community/spam-core filter.
    Returns a Dataset of ``(node, degree)`` for the k-core members
    (degree measured INSIDE the core). Iterative peeling is not
    SQL-expressible; pin with an exact local recompute.

    Plan: symmetric (node, nbr) rows dedupe once and materialize; each
    round is ONE metadata groupby (degrees) + one broadcast filter (the
    peeled-node set ships via ray.put, guarded by ``max_broadcast_nodes``
    — beyond that swap in the sharded survivor filter of ops/dedup.py).
    The state table REPARTITIONS every round before materialize (the
    iterative-Dataset invariant: groupby outputs compound block counts
    ~4x/round otherwise). Converges in <= max_iters rounds or fails
    loudly."""
    import ray
    import ray.data
    from ray.data.aggregate import Count

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"mode must be auto|broadcast|sharded, got {mode!r}")

    def sym(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        both = np.concatenate([u, u[:, ::-1]], axis=0)
        return pa.table({"node": pa.array(both[:, 0], pa.int64()),
                         "nbr": pa.array(both[:, 1], pa.int64())})

    state = (
        edges_ds.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .groupby("node").map_groups(lambda g: g.drop_duplicates(), batch_format="pandas", **remote_args())
        .map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .materialize()
    )
    n_blocks = max(state.num_blocks(), 1)
    if mode == "sharded":
        return _kcore_sharded(state, k, max_iters, n_blocks)
    empty = pa.table({"node": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())})
    for _ in range(max_iters):
        if state.count() == 0:
            return ray.data.from_arrow(empty)
        deg = fast_groupby(state, "node", Count(alias_name="deg")).to_pandas()
        weak = deg.loc[deg["deg"] < k, "node"].to_numpy(np.int64)
        if len(weak) == 0:
            out = deg.rename(columns={"deg": "degree"})
            out["node"] = out["node"].astype("int64")
            out["degree"] = out["degree"].astype("int64")
            return ray.data.from_pandas(out)
        if len(weak) > max_broadcast_nodes:
            if mode == "auto":
                # continue peeling with Dataset-resident weak sets (peeling
                # is monotone — resuming from the current state is exact)
                return _kcore_sharded(state, k, max_iters, n_blocks)
            raise ValueError(
                f"kcore: {len(weak)} peeled nodes exceed max_broadcast_nodes; "
                "use mode='sharded' (or 'auto') or raise the guard"
            )
        weak_ref = ray.put(np.sort(weak))

        def peel(batch: pa.Table) -> pa.Table:
            w = ray.get(weak_ref)
            nodes = batch["node"].to_numpy(zero_copy_only=False)
            nbrs = batch["nbr"].to_numpy(zero_copy_only=False)
            keep = ~(np.isin(nodes, w) | np.isin(nbrs, w))
            return batch.filter(pa.array(keep))

        state = (
            state.map_batches(peel, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
            .repartition(n_blocks)
            .materialize()
        )
    raise ValueError(f"kcore: did not converge in {max_iters} rounds")


def _kcore_sharded(state, k: int, max_iters: int, n_blocks: int):
    """Sharded-state k-core peeling (VERDICT r4 #5 family): the per-round
    weak set stays a Dataset; peeling = TWO bucketed anti-joins (drop rows
    whose node OR nbr is weak) instead of a ray.put broadcast — no
    |peeled|-sized driver object. Monotone peeling makes resuming from any
    partially-peeled state exact. State repartitions every round."""
    import pandas as pd
    import ray.data

    from .fastagg import hash_aggregate
    from .join import hash_join

    empty = pa.table({"node": pa.array([], pa.int64()), "degree": pa.array([], pa.int64())})

    def _ren(mapping: dict):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([mapping.get(c, c) for c in b.column_names])

        return fn

    def _anti(ds, weak, col: str):
        """Rows of ds whose ``col`` does NOT appear in weak's node set."""
        left = ds if col == "node" else ds.map_batches(
            _ren({"node": "__kc_n", "nbr": "node"}), batch_format="pyarrow",
            zero_copy_batch=True, **remote_args())

        def keep_unmatched(b: "pd.DataFrame") -> "pd.DataFrame":
            if "node" not in b.columns:
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "nbr": pd.Series([], dtype="int64")})
            out = b.loc[b["deg"].isna()]
            if col == "node":
                out = out[["node", "nbr"]].copy()
            else:
                out = out[["__kc_n", "node"]].copy()
                out.columns = ["node", "nbr"]
            return out.astype({"node": "int64", "nbr": "int64"})

        return (
            hash_join(left, weak, key="node", how="left")
            .map_batches(keep_unmatched, batch_format="pandas", **remote_args())
            .map_batches(lambda b: b, batch_format="pyarrow", **remote_args())
        )

    for _ in range(max_iters):
        if state.count() == 0:
            return ray.data.from_arrow(empty)
        deg = hash_aggregate(state, "node", [("nbr", "count_all", "deg")]).materialize()
        weak = deg.filter(expr=f"deg < {k}").materialize()
        if weak.count() == 0:
            def fin(b: pa.Table) -> pa.Table:
                if "node" not in b.column_names:
                    return empty
                return pa.table({"node": b["node"].combine_chunks().cast(pa.int64()),
                                 "degree": b["deg"].combine_chunks().cast(pa.int64())})

            return deg.map_batches(fin, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        state = (
            _anti(_anti(state, weak, "node"), weak, "nbr")
            .repartition(n_blocks)
            .materialize()
        )
    raise ValueError(f"kcore: did not converge in {max_iters} rounds")


def bipartite_projection(edges_ds, left: str = "src", right: str = "dst",
                         max_right_degree: int = 1 << 12, num_buckets: int = 256):
    """Project a bipartite edge table onto its LEFT node set: emit one
    ``(a, b, weight)`` row per left pair ``a < b`` sharing >= 1 right
    neighbor, weight = number of shared rights (the co-purchase /
    co-occurrence graph builder — feeds `triangle_count` / `kcore` /
    `pagerank`). Left and right ids live in separate id spaces.

    Plan: distinct ``(right, left)`` cells dedupe once; ``groupby(right)``
    emits each right node's left-pair fan-out (d*(d-1)/2, guarded at
    ``max_right_degree`` — a hot right node is the classic projection
    blow-up, drop or sample it first); ONE packed-pair bucket groupby sums
    weights VECTORIZED. Left ids must be in [0, 2^31) (pair packing)."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def canon(batch: pa.Table) -> pa.Table:
        l = batch[left].to_numpy(zero_copy_only=False).astype(np.int64)
        r = batch[right].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(l) and (l.min() < 0 or l.max() >= 1 << 31):
            raise ValueError("bipartite_projection: left ids must be in [0, 2^31)")
        u = np.unique(np.stack([r, l], axis=1), axis=0)
        return pa.table({"r": pa.array(u[:, 0], pa.int64()), "l": pa.array(u[:, 1], pa.int64())})

    cells = edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ls = np.unique(g["l"].to_numpy(np.int64))
        d = len(ls)
        if d > max_right_degree:
            raise ValueError(
                f"bipartite_projection: right-node degree {d} exceeds max_right_degree={max_right_degree}"
            )
        if d < 2:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "pair": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        i, j = np.triu_indices(d, k=1)
        pair = (ls[i] << np.int64(32)) | ls[j]
        return pd.DataFrame({"bucket": pair % np.int64(num_buckets), "pair": pair,
                             "w": np.ones(len(pair), dtype=np.int64)})

    pair_ds = cells.groupby("r").map_groups(pairs, batch_format="pandas", **remote_args())

    def bucket_sum(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("pair", as_index=False)["w"].sum()
        return pd.DataFrame({
            "a": (s["pair"].to_numpy(np.int64) >> 32).astype(np.int64),
            "b": (s["pair"].to_numpy(np.int64) & ((1 << 32) - 1)).astype(np.int64),
            "weight": s["w"].to_numpy(np.int64),
        })

    return pair_ds.groupby("bucket").map_groups(bucket_sum, batch_format="pandas", **remote_args())


def bfs_hops(edges_ds, seeds, src: str = "src", dst: str = "dst",
             max_hops: int = 4, directed: bool = False,
             max_broadcast_nodes: int = 1 << 24, mode: str = "auto"):
    """Multi-source breadth-first search: minimum hop distance from any
    seed to every reachable node, bounded at ``max_hops``. Returns a pandas
    DataFrame ``(node, hops)`` — int64, seeds included at 0 even when
    isolated (mirror the oracle's VALUES seed list). Undirected mode
    symmetrizes the edge set first.

    Plan: distinct edge cells dedupe once and stay put (materialized);
    each BFS round is ONE map_batches over the edge blocks probing the
    broadcast frontier with a sorted ``np.searchsorted`` membership test,
    then ONE (node) cell groupby of the newly-reached candidates. The
    visited map is driver-resident like ``pagerank``'s rank vector
    (bounded by ``max_broadcast_nodes``). ``mode="sharded"`` keeps
    visited/frontier as hash-bucketed Datasets joined per round instead
    (no |nodes|-sized driver object — the 10^9-node plan); ``"auto"``
    starts broadcast and restarts sharded from scratch if the guard would
    trip (correctness identical; the restart costs one partial pass at the
    boundary). Rounds are bounded by ``max_hops``, and a round with an
    empty frontier exits early — dense graphs saturate in 2-3 rounds.

    SQL parity: equal to a WITH RECURSIVE walk enumeration with
    ``hops < max_hops`` and ``min(hops)`` per node — the shortest walk IS
    the shortest path, so the bounded recursion and BFS agree exactly on
    every node with distance <= max_hops.
    """
    import pandas as pd
    import ray
    from ray.data.aggregate import Count

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"mode must be auto|broadcast|sharded, got {mode!r}")
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seed_arr.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "hops": pd.Series([], dtype="int64")})

    def local_distinct(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.int64())
        d = batch[dst].cast(pa.int64())
        if s.null_count or d.null_count:
            raise ValueError("bfs_hops: edge endpoints must be non-null")
        t = pa.table({"s": s, "d": d})
        if not directed:
            t = pa.concat_tables([t, pa.table({"s": d, "d": s})])
        return t.group_by(["s", "d"]).aggregate([])

    edges = (
        fast_groupby(
            edges_ds.map_batches(local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
            ["s", "d"], Count(alias_name="__bfs_c__"),
        )
        .select_columns(["s", "d"])
        .materialize()
    )

    if mode == "sharded":
        return _bfs_sharded(edges, seed_arr, max_hops)

    visited: dict[int, int] = {int(n): 0 for n in seed_arr}
    frontier = seed_arr
    for hop in range(1, max_hops + 1):
        if frontier.size == 0:
            break
        frontier_ref = ray.put(np.sort(frontier))

        def reach(batch: pa.Table) -> pa.Table:
            f = ray.get(frontier_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(f, s)
            pos[pos == len(f)] = 0
            hit = f[pos] == s
            return pa.table({"n": pa.array(np.unique(d[hit]), pa.int64())})

        reached = fast_groupby(
            edges.map_batches(reach, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
            "n", Count(alias_name="__bfs_c__"),
        ).select_columns(["n"]).to_pandas()
        if reached.empty:
            break
        cand = reached["n"].to_numpy(dtype=np.int64)
        new = np.array([n for n in cand if int(n) not in visited], dtype=np.int64)
        if len(visited) + new.size > max_broadcast_nodes:
            if mode == "auto":
                # restart with Dataset-resident state; correctness identical
                return _bfs_sharded(edges, seed_arr, max_hops)
            raise ValueError(
                f"bfs_hops: visited set would exceed max_broadcast_nodes={max_broadcast_nodes}; "
                "use mode='sharded' (or 'auto') or raise the guard"
            )
        for n in new:
            visited[int(n)] = hop
        frontier = new

    nodes = np.array(sorted(visited), dtype=np.int64)
    return pd.DataFrame({"node": nodes,
                         "hops": np.array([visited[int(n)] for n in nodes], dtype=np.int64)})


def _bfs_sharded(edges, seed_arr: np.ndarray, max_hops: int):
    """Sharded-state BFS (VERDICT r4 #5): visited ``(node, hops)`` and the
    frontier are hash-bucketed Datasets; each round is one bucketed join
    (edges ⋈ frontier on src), one distinct-dst groupby, and one anti-join
    against visited (left join, keep hops-null) — no |nodes|-sized driver
    or broadcast object. BFS order guarantees the first time a node is
    reached IS its min hop count, so no min-fold is needed. State
    repartitions every round (the iterative-Dataset rule); union operands
    are normalized to arrow blocks first (mixed-lineage union rule)."""
    import pandas as pd
    import ray.data as rd
    from ray.data.aggregate import Count

    from .._rayutil import pool_size
    from .join import hash_join

    nblocks = max(8, pool_size())

    def _ren(col_from: str, col_to: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([col_to if c == col_from else c for c in b.column_names])

        return fn

    _arrow_pass = dict(batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    state = (
        rd.from_arrow(pa.table({
            "node": pa.array(seed_arr, pa.int64()),
            "hops": pa.array(np.zeros(seed_arr.size, dtype=np.int64)),
        }))
        .repartition(nblocks)
        .materialize()
    )
    frontier = state.select_columns(["node"])

    for hop in range(1, max_hops + 1):
        f_s = frontier.map_batches(_ren("node", "s"), **_arrow_pass)

        def local_d(b: pa.Table) -> pa.Table:
            if "d" not in b.column_names:  # empty inner-join bucket
                return pa.table({"node": pa.array([], pa.int64())})
            return pa.table({"node": b["d"].combine_chunks().unique().cast(pa.int64())})

        cand = (
            hash_join(edges, f_s, key="s")
            .map_batches(local_d, batch_format="pyarrow", **remote_args())
            .groupby("node")
            .aggregate(Count(alias_name="__bfs_c__"))
            .select_columns(["node"])
        )

        def keep_new(b: "pd.DataFrame") -> "pd.DataFrame":
            if "node" not in b.columns:  # empty bucket -> column-less block
                return pd.DataFrame({"node": pd.Series([], dtype="int64")})
            out = b.loc[b["hops"].isna(), ["node"]].copy()
            out["node"] = out["node"].astype("int64")
            return out

        new = (
            hash_join(cand, state, key="node", how="left")
            .map_batches(keep_new, batch_format="pandas", **remote_args())
            .map_batches(lambda b: b, batch_format="pyarrow", **remote_args())
            .repartition(nblocks)
            .materialize()
        )
        if new.count() == 0:
            break

        def with_hop(b: pa.Table, h=hop) -> pa.Table:
            node = b["node"].combine_chunks().cast(pa.int64())
            return pa.table({"node": node, "hops": pa.array(np.full(len(node), h, dtype=np.int64))})

        new_rows = new.map_batches(with_hop, **_arrow_pass).materialize()
        state = state.union(new_rows).repartition(nblocks).materialize()
        frontier = new

    out = state.to_pandas()
    if out.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "hops": pd.Series([], dtype="int64")})
    out = out.sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node": out["node"].astype("int64"), "hops": out["hops"].astype("int64")})


def cheapest_path(edges_ds, seeds, src: str = "src", dst: str = "dst",
                  weight: str = "w", max_hops: int = 4, directed: bool = False,
                  max_broadcast_nodes: int = 1 << 24, mode: str = "auto"):
    """Multi-source cheapest path with non-negative integer edge weights,
    bounded at ``max_hops`` edges — Bellman-Ford relaxation rounds (the
    bfs_hops plan with costs). Returns a pandas DataFrame
    ``(node, min_cost)`` — int64, seeds at 0.

    Plan: distinct edges reduce to per-(s, d) MIN weight once and stay put
    (materialized); each round is ONE map_batches probing the broadcast
    frontier costs (sorted searchsorted) emitting per-block best
    candidates, then ONE (node) min-groupby; the driver keeps the dist map
    (bounded by ``max_broadcast_nodes``) and the next frontier is only the
    nodes that improved. Exact int64 arithmetic end to end.

    SQL parity: equal to a WITH RECURSIVE walk enumeration bounded at
    ``max_hops`` with ``min(cost)`` per node — relaxation with <= k edges
    computes exactly the min walk cost over <= k edges."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Min

    if max_hops < 0:
        raise ValueError(f"max_hops must be >= 0, got {max_hops}")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"mode must be auto|broadcast|sharded, got {mode!r}")
    seed_arr = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seed_arr.size == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "min_cost": pd.Series([], dtype="int64")})

    def local_min(batch: pa.Table) -> pa.Table:
        s = batch[src].cast(pa.int64())
        d = batch[dst].cast(pa.int64())
        w = batch[weight].cast(pa.int64())
        wn = w.to_numpy(zero_copy_only=False)
        if s.null_count or d.null_count or w.null_count:
            raise ValueError("cheapest_path: edge fields must be non-null")
        if len(wn) and wn.min() < 0:
            raise ValueError("cheapest_path: weights must be non-negative")
        if len(wn) and wn.max() >= np.int64(1) << 40:
            raise ValueError("cheapest_path: per-edge weight >= 2^40 (cost-sum guard)")
        t = pa.table({"s": s, "d": d, "w": w})
        if not directed:
            t = pa.concat_tables([t, pa.table({"s": d, "d": s, "w": w})])
        g = t.group_by(["s", "d"]).aggregate([("w", "min")])
        return g.rename_columns(["s", "d", "w"])

    edges = fast_groupby(
        edges_ds.map_batches(local_min, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
        ["s", "d"], Min("w", alias_name="w"),
    ).materialize()

    if mode == "sharded":
        return _cheapest_sharded(edges, seed_arr, max_hops)

    dist: dict[int, int] = {int(n): 0 for n in seed_arr}
    frontier = {int(n): 0 for n in seed_arr}
    for _ in range(max_hops):
        if not frontier:
            break
        fk = np.array(sorted(frontier), dtype=np.int64)
        fc = np.array([frontier[int(k)] for k in fk], dtype=np.int64)
        f_ref = ray.put((fk, fc))

        def relax(batch: pa.Table) -> pa.Table:
            keys, costs = ray.get(f_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            w = batch["w"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(keys, s)
            pos[pos == len(keys)] = 0
            hit = (keys[pos] == s) if len(keys) else np.zeros(len(s), bool)
            cand = costs[pos[hit]] + w[hit]
            dd = d[hit]
            uk, inv = np.unique(dd, return_inverse=True)
            best = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, inv, cand)
            return pa.table({"n": pa.array(uk, pa.int64()), "c": pa.array(best, pa.int64())})

        cand = fast_groupby(
            edges.map_batches(relax, batch_size=None, batch_format="pyarrow",
                              zero_copy_batch=True, **remote_args()),
            "n", Min("c", alias_name="c"),
        ).to_pandas()
        nxt: dict[int, int] = {}
        for n, c in cand.itertuples(index=False):
            n, c = int(n), int(c)
            if c < dist.get(n, 1 << 62):
                dist[n] = c
                nxt[n] = c
        if len(dist) > max_broadcast_nodes:
            if mode == "auto":
                # restart with Dataset-resident state (the bfs_hops rule)
                return _cheapest_sharded(edges, seed_arr, max_hops)
            raise ValueError(
                f"cheapest_path: dist map would exceed max_broadcast_nodes={max_broadcast_nodes}; "
                "use mode='sharded' (or 'auto') or raise the guard"
            )
        frontier = nxt

    nodes = np.array(sorted(dist), dtype=np.int64)
    return pd.DataFrame({"node": nodes,
                         "min_cost": np.array([dist[int(n)] for n in nodes], dtype=np.int64)})


def _cheapest_sharded(edges, seed_arr: np.ndarray, max_hops: int):
    """Sharded-state Bellman-Ford (the bfs_hops recipe with a Min fold):
    dist ``(node, min_cost)`` and the frontier are hash-bucketed Datasets;
    each round is one bucketed join (edges ⋈ frontier on src), one
    (node, min) groupby of candidates, and one left join against dist
    keeping only improvements. Costs stay < max_hops·2^40 < 2^53 (the
    per-edge weight guard), so NaN-float round-trips are lossless. State
    repartitions every round (the iterative-Dataset rule)."""
    import pandas as pd
    import ray.data as rd

    from .._rayutil import pool_size
    from .fastagg import hash_aggregate
    from .join import hash_join

    nblocks = max(8, pool_size())

    def _ren(col_from: str, col_to: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([col_to if c == col_from else c for c in b.column_names])

        return fn

    _arrow_pass = dict(batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    state = (
        rd.from_arrow(pa.table({
            "node": pa.array(seed_arr, pa.int64()),
            "min_cost": pa.array(np.zeros(seed_arr.size, dtype=np.int64)),
        }))
        .repartition(nblocks)
        .materialize()
    )
    frontier = state  # (node, min_cost) — seeds at 0

    for _ in range(max_hops):
        f_s = frontier.map_batches(_ren("node", "s"), **_arrow_pass)

        def local_relax(b: pa.Table) -> pa.Table:
            if "d" not in b.column_names:  # empty inner-join bucket
                return pa.table({"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (b["min_cost"].to_numpy(zero_copy_only=False).astype(np.int64)
                 + b["w"].to_numpy(zero_copy_only=False).astype(np.int64))
            uk, inv = np.unique(d, return_inverse=True)
            best = np.full(len(uk), np.iinfo(np.int64).max, np.int64)
            np.minimum.at(best, inv, c)
            return pa.table({"node": pa.array(uk, pa.int64()), "c": pa.array(best, pa.int64())})

        cand = hash_aggregate(
            hash_join(edges, f_s, key="s").map_batches(local_relax, batch_format="pyarrow", **remote_args()),
            "node", [("c", "min", "c")], num_buckets=nblocks if nblocks <= 64 else None,
        )

        def keep_improved(b: "pd.DataFrame") -> "pd.DataFrame":
            if "node" not in b.columns:  # empty bucket -> column-less block
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "min_cost": pd.Series([], dtype="int64")})
            c = b["c"].to_numpy(np.float64)
            if np.any(np.abs(c) >= float(1 << 53)):
                raise ValueError("cheapest_path sharded: cost exceeds exact-float bound")
            old = b["min_cost"].to_numpy(np.float64)  # NaN for unseen nodes
            take = np.isnan(old) | (c < old)
            out = pd.DataFrame({"node": b["node"].to_numpy(np.int64)[take],
                                "min_cost": c[take].astype(np.int64)})
            return out

        improved = (
            hash_join(cand, state, key="node", how="left")
            .map_batches(keep_improved, batch_format="pandas", **remote_args())
            .map_batches(lambda b: b, batch_format="pyarrow", **remote_args())
            .repartition(nblocks)
            .materialize()
        )
        if improved.count() == 0:
            break

        def merge_dist(b: "pd.DataFrame") -> "pd.DataFrame":
            if "node" not in b.columns:
                return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                                     "min_cost": pd.Series([], dtype="int64")})
            old = b["min_cost"].to_numpy(np.float64)
            new = b["min_cost_r"].to_numpy(np.float64)
            best = np.where(np.isnan(new), old, np.where(np.isnan(old), new, np.minimum(old, new)))
            return pd.DataFrame({"node": b["node"].to_numpy(np.int64),
                                 "min_cost": best.astype(np.int64)})

        state = (
            hash_join(state, improved, key="node", how="full")
            .map_batches(merge_dist, batch_format="pandas", **remote_args())
            .map_batches(lambda b: b, batch_format="pyarrow", **remote_args())
            .repartition(nblocks)
            .materialize()
        )
        frontier = improved

    out = state.to_pandas()
    if out.empty:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"),
                             "min_cost": pd.Series([], dtype="int64")})
    out = out.sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node": out["node"].astype("int64"),
                         "min_cost": out["min_cost"].astype("int64")})


def personalized_pagerank(edges_ds, seeds, src: str = "src", dst: str = "dst",
                          iterations: int = 2, scale: int = 10**12,
                          damping_num: int = 850, damping_den: int = 1000,
                          max_broadcast_nodes: int = 1 << 24, mode: str = "auto"):
    """Personalized (seeded-restart) PageRank: the random walk TELEPORTS
    back to the seed set instead of the whole graph — the
    similar-items / local-importance variant recommendation systems run.
    Same exact-integer contract as ``pagerank`` (every step is int64
    multiply + floor-div, mirrored by an unrolled SQL CTE chain): the
    initial mass ``scale // len(seeds)`` and the per-iteration restart
    ``((den-num)*scale) // (den*len(seeds))`` land ONLY on seeds.

    Seeds must exist in the edge-derived node universe (loud — a typo'd
    seed would silently drain its mass). Rank vector is driver-resident
    (the pagerank rule); contributions flow through one metadata groupby
    per iteration. Returns ``(node, rank_units)`` sorted by node.
    """
    import ray
    from ray.data.aggregate import Count, Sum

    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if mode not in ("auto", "broadcast", "sharded"):
        raise ValueError(f"mode must be auto|broadcast|sharded, got {mode!r}")
    seed_ids = np.unique(np.asarray(list(seeds), dtype=np.int64))
    if seed_ids.size == 0:
        raise ValueError("personalized_pagerank needs at least one seed")

    def local_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"s": batch[src].cast(pa.int64()), "d": batch[dst].cast(pa.int64())}
        )
        if t["s"].null_count or t["d"].null_count:
            raise ValueError("edge endpoints must be non-null")
        return t.group_by(["s", "d"]).aggregate([])

    cells = edges_ds.map_batches(
        local_distinct, batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )
    edges = fast_groupby(cells, ["s", "d"], Count(alias_name="__pr_c__")).select_columns(["s", "d"]).materialize()

    ends = edges.map_batches(
        lambda b: pa.table({"id": pa.concat_arrays([b["s"].combine_chunks(), b["d"].combine_chunks()]).unique()}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    nodes_ds = fast_groupby(ends, "id", Count(alias_name="__pr_n__")).select_columns(["id"]).materialize()
    import pandas as pd

    n = nodes_ds.count()
    if n == 0:
        return pd.DataFrame({"node": pd.Series([], dtype="int64"), "rank_units": pd.Series([], dtype="int64")})
    if mode == "auto":
        mode = "broadcast" if n <= max_broadcast_nodes else "sharded"
    if mode == "sharded":
        return _ppr_sharded(edges, nodes_ds, seed_ids, n, iterations, scale, damping_num, damping_den)
    if n > max_broadcast_nodes:
        raise ValueError(
            f"{n} nodes exceed max_broadcast_nodes={max_broadcast_nodes}; "
            "use mode='sharded' (or 'auto') or raise the guard"
        )
    node_ids = np.sort(nodes_ds.to_pandas()["id"].to_numpy(dtype=np.int64))
    pos = np.searchsorted(node_ids, seed_ids)
    if (pos >= n).any() or (node_ids[np.minimum(pos, n - 1)] != seed_ids).any():
        missing = [int(x) for x in seed_ids if x not in set(node_ids.tolist())]
        raise ValueError(f"seeds not in the graph: {missing}")

    deg_df = fast_groupby(edges, "s", Count(alias_name="deg")).to_pandas()
    deg = np.zeros(n, dtype=np.int64)
    deg[np.searchsorted(node_ids, deg_df["s"].to_numpy(dtype=np.int64))] = deg_df["deg"].to_numpy(dtype=np.int64)

    k = int(seed_ids.size)
    seed_base = ((damping_den - damping_num) * scale) // (damping_den * k)
    ranks = np.zeros(n, dtype=np.int64)
    ranks[pos] = scale // k
    nodes_ref = ray.put(node_ids)
    deg_ref = ray.put(deg)

    for _ in range(iterations):
        ranks_ref = ray.put(ranks)

        def contribs(batch: pa.Table) -> pa.Table:
            ids = ray.get(nodes_ref)
            r = ray.get(ranks_ref)
            dg = ray.get(deg_ref)
            s = batch["s"].to_numpy(zero_copy_only=False)
            d = batch["d"].to_numpy(zero_copy_only=False)
            si = np.searchsorted(ids, s)
            c = (damping_num * r[si]) // (damping_den * dg[si])
            t = pa.table({"d": pa.array(d, pa.int64()), "c": pa.array(c, pa.int64())})
            return t.group_by("d").aggregate([("c", "sum")]).rename_columns(["d", "c"])

        sums = fast_groupby(
            edges.map_batches(contribs, batch_format="pyarrow", zero_copy_batch=True, **remote_args()),
            "d", Sum("c", alias_name="c"),
        ).to_pandas()
        nxt = np.zeros(n, dtype=np.int64)
        nxt[pos] = seed_base
        if len(sums):
            di = np.searchsorted(node_ids, sums["d"].to_numpy(dtype=np.int64))
            nxt[di] += sums["c"].to_numpy(dtype=np.int64)
        ranks = nxt

    return pd.DataFrame({"node": node_ids, "rank_units": ranks})


def _ppr_sharded(edges, nodes_ds, seed_ids: np.ndarray, n: int, iterations: int,
                 scale: int, damping_num: int, damping_den: int):
    """Sharded-state personalized PageRank (_pagerank_sharded with the
    restart mass landing ONLY on seeds): state ``(node, deg, is_seed,
    rank_units)`` is a hash-bucketed Dataset; seeds ship via ray.put (they
    are caller-provided and driver-resident by definition). Exact-int
    parity with the broadcast plan term-for-term."""
    import pandas as pd
    import ray

    from .._rayutil import pool_size
    from .fastagg import hash_aggregate
    from .join import hash_join

    if scale >= 1 << 50:
        raise ValueError(
            f"sharded personalized_pagerank needs scale < 2^50, got {scale}"
        )
    k = int(seed_ids.size)
    seed_base = ((damping_den - damping_num) * scale) // (damping_den * k)
    init = scale // k
    nblocks = max(8, pool_size())
    seeds_ref = ray.put(np.sort(seed_ids))

    def _ren(col_from: str, col_to: str):
        def fn(b: pa.Table) -> pa.Table:
            return b.rename_columns([col_to if c == col_from else c for c in b.column_names])

        return fn

    nodes_n = nodes_ds.map_batches(_ren("id", "node"), batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    deg_n = hash_aggregate(edges, "s", [("d", "count_all", "deg")]).map_batches(
        _ren("s", "node"), batch_format="pyarrow", zero_copy_batch=True, **remote_args()
    )

    _empty_state = pa.table({
        "node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64()),
        "is_seed": pa.array([], pa.int8()), "rank_units": pa.array([], pa.int64()),
    })

    def _seed_mask(node: np.ndarray) -> np.ndarray:
        sk = ray.get(seeds_ref)
        p = np.searchsorted(sk, node)
        p[p == len(sk)] = 0
        return (sk[p] == node) if len(sk) else np.zeros(len(node), bool)

    def seed(b: pa.Table) -> pa.Table:
        if "node" not in b.column_names:
            return _empty_state
        deg = np.nan_to_num(b["deg"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0).astype(np.int64)
        node = b["node"].combine_chunks().cast(pa.int64()).to_numpy(zero_copy_only=False)
        m = _seed_mask(node)
        return pa.table({
            "node": pa.array(node),
            "deg": pa.array(deg, pa.int64()),
            "is_seed": pa.array(m.astype(np.int8)),
            "rank_units": pa.array(np.where(m, np.int64(init), np.int64(0))),
        })

    state = (
        hash_join(nodes_n, deg_n, key="node", how="left")
        .map_batches(seed, batch_format="pyarrow", **remote_args())
        .repartition(nblocks)
        .materialize()
    )
    # seeds must exist in the node universe (loud — a typo'd seed silently
    # drains its mass); count the seeded rows distributedly
    n_seeded = sum(
        int(b["is_seed"].to_numpy(zero_copy_only=False).astype(np.int64).sum())
        for b in state.iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if "is_seed" in b.column_names
    )
    if n_seeded != k:
        raise ValueError(f"seeds not in the graph: {k - n_seeded} of {k} missing")

    for _ in range(iterations):
        state_s = state.map_batches(_ren("node", "s"), batch_format="pyarrow", zero_copy_batch=True, **remote_args())

        def contrib(b: pa.Table) -> pa.Table:
            if "d" not in b.column_names:
                return pa.table({"node": pa.array([], pa.int64()), "c": pa.array([], pa.int64())})
            r = b["rank_units"].to_numpy(zero_copy_only=False).astype(np.int64)
            dg = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (damping_num * r) // (damping_den * dg)
            t = pa.table({"node": pa.array(d), "c": pa.array(c)})
            return t.group_by("node").aggregate([("c", "sum")]).rename_columns(["node", "c"])

        sums = hash_aggregate(
            hash_join(edges, state_s, key="s").map_batches(contrib, batch_format="pyarrow", **remote_args()),
            "node", [("c", "sum", "c")], num_buckets=nblocks if nblocks <= 64 else None,
        )

        def refresh(b: pa.Table) -> pa.Table:
            if "node" not in b.column_names:
                return _empty_state
            c = np.nan_to_num(b["c"].to_numpy(zero_copy_only=False).astype(np.float64), nan=0.0)
            if np.any(np.abs(c) >= float(1 << 53)):
                raise ValueError("personalized_pagerank sharded: contribution sum exceeds exact-float bound")
            m = b["is_seed"].to_numpy(zero_copy_only=False).astype(np.int8).astype(bool)
            rank = np.where(m, np.int64(seed_base), np.int64(0)) + c.astype(np.int64)
            return pa.table({
                "node": b["node"].combine_chunks().cast(pa.int64()),
                "deg": b["deg"].combine_chunks().cast(pa.int64()),
                "is_seed": pa.array(m.astype(np.int8)),
                "rank_units": pa.array(rank, pa.int64()),
            })

        state = (
            hash_join(state.select_columns(["node", "deg", "is_seed"]), sums, key="node", how="left")
            .map_batches(refresh, batch_format="pyarrow", **remote_args())
            .repartition(nblocks)
            .materialize()
        )

    out = state.select_columns(["node", "rank_units"]).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    return pd.DataFrame({"node": out["node"].astype("int64"), "rank_units": out["rank_units"].astype("int64")})


def link_predict_jaccard(edges_ds, src: str = "src", dst: str = "dst",
                         min_common: int = 1, max_degree: int = 1 << 13,
                         num_buckets: int = 256):
    """Neighborhood-Jaccard link prediction: for every NON-edge pair
    ``(x, y)`` with at least ``min_common`` common neighbors, score
    ``jaccard = |N(x) ∩ N(y)| / |N(x) ∪ N(y)|`` — the classic
    common-neighbors baseline for "which links are missing" (recommender /
    knowledge-graph completion). Returns a Dataset of
    ``(x, y, cn, deg_a, deg_b, jaccard)``, x < y; the score is ONE IEEE
    division of exact int64 counts (``cn / (deg_a + deg_b - cn)``), so the
    SQL self-join oracle reproduces it bitwise.

    Plan (all metadata-only — int64 pairs and counts; payloads never move):

    1. canonicalize + dedupe undirected edges (ids < 2^31, pairs pack into
       one int64), pin the edge table (wedges, exclusion, and degrees all
       read it);
    2. every center ``c`` emits each neighbor pair once, so a
       ``groupby(bucket)`` sum of wedge multiplicity IS the common-neighbor
       count — fan-out is the FULL degree choose 2 (common-neighbor
       counting cannot orient the way triangle counting does: the center
       must pair ALL its neighbors), guarded at ``max_degree``;
    3. the same bucket groupby drops pairs that are already edges
       (vectorized np.isin — the triangle_count closure idiom);
    4. two hash_joins attach deg(x) / deg(y) (large-large safe; degree
       tables scale with the node count, never broadcast).

    Zero-variance note: a pair sharing ALL neighbors of both endpoints
    (deg_a == deg_b == cn) scores exactly 1.0.
    """
    import pandas as pd
    from ray.data.aggregate import Count

    from .join import hash_join

    if min_common < 1:
        raise ValueError(f"link_predict_jaccard: min_common must be >= 1, got {min_common}")

    def canon(batch: pa.Table) -> pa.Table:
        s = batch[src].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = s != d
        s, d = s[keep], d[keep]
        if len(s) and (s.min() < 0 or d.min() < 0 or max(s.max(), d.max()) >= 1 << 31):
            raise ValueError("link_predict_jaccard: node ids must be in [0, 2^31)")
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        u = np.unique(np.stack([a, b], axis=1), axis=0)
        return pa.table({"a": pa.array(u[:, 0], pa.int64()), "b": pa.array(u[:, 1], pa.int64())})

    edges = (
        edges_ds.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .groupby("a").map_groups(
            lambda g: g.drop_duplicates(), batch_format="pandas", **remote_args()
        )
        .map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    ).materialize()

    def sym(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "node": pa.array(np.concatenate([a, b]), pa.int64()),
            "nb": pa.array(np.concatenate([b, a]), pa.int64()),
        })

    adj = edges.map_batches(sym, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    deg = adj.groupby("node").aggregate(Count(alias_name="deg"))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        nb = np.unique(g["nb"].to_numpy())
        d = len(nb)
        if d > max_degree:
            raise ValueError(
                f"link_predict_jaccard: degree {d} exceeds max_degree={max_degree}"
            )
        if d < 2:
            return pd.DataFrame({"bucket": pd.Series(dtype="int64"),
                                 "pair": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64")})
        i, j = np.triu_indices(d, k=1)
        pair = (nb[i].astype(np.int64) << np.int64(32)) | nb[j].astype(np.int64)
        return pd.DataFrame({"bucket": pair % np.int64(num_buckets),
                             "pair": pair,
                             "n": np.ones(len(i), dtype=np.int64)})

    wedge_ds = (
        adj.groupby("node").map_groups(wedges, batch_format="pandas", **remote_args())
        .map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    )

    def tag_edge(batch: pa.Table) -> pa.Table:
        pair = (batch["a"].to_numpy(zero_copy_only=False).astype(np.int64) << np.int64(32)) \
            | batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(pair % np.int64(num_buckets), pa.int64()),
            "pair": pa.array(pair, pa.int64()),
            "n": pa.array(np.full(batch.num_rows, -1, dtype=np.int64), pa.int64()),
        })

    tagged = edges.map_batches(tag_edge, batch_format="pyarrow", zero_copy_batch=True, **remote_args())

    def bucket_close(g: pd.DataFrame) -> pd.DataFrame:
        pair = g["pair"].to_numpy()
        n = g["n"].to_numpy()
        is_edge = n == -1
        wp, wn = pair[~is_edge], n[~is_edge]
        keep = ~np.isin(wp, pair[is_edge])
        wp, wn = wp[keep], wn[keep]
        if not len(wp):
            return pd.DataFrame({"x": pd.Series(dtype="int64"), "y": pd.Series(dtype="int64"),
                                 "cn": pd.Series(dtype="int64")})
        s = pd.Series(wn).groupby(wp).sum()
        p = s.index.to_numpy().astype(np.int64)
        cn = s.to_numpy().astype(np.int64)
        m = cn >= min_common
        p, cn = p[m], cn[m]
        return pd.DataFrame({"x": (p >> np.int64(32)).astype(np.int64),
                             "y": (p & np.int64(0xFFFFFFFF)).astype(np.int64),
                             "cn": cn})

    cand = (
        wedge_ds.union(tagged)
        .groupby("bucket")
        .map_groups(bucket_close, batch_format="pandas", **remote_args())
        .map_batches(lambda t: t, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
    )

    degx = deg.map_batches(
        lambda t: t.rename_columns(["x", "deg_a"]),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    degy = deg.map_batches(
        lambda t: t.rename_columns(["y", "deg_b"]),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    joined = hash_join(hash_join(cand, degx, key="x"), degy, key="y")

    def score(batch: pa.Table) -> pa.Table:
        cn = batch["cn"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = batch["deg_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        db = batch["deg_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "x": batch["x"].cast(pa.int64()),
            "y": batch["y"].cast(pa.int64()),
            "cn": pa.array(cn, pa.int64()),
            "deg_a": pa.array(da, pa.int64()),
            "deg_b": pa.array(db, pa.int64()),
            "jaccard": pa.array(cn.astype(np.float64) / (da + db - cn).astype(np.float64),
                                pa.float64()),
        })

    return joined.map_batches(score, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
