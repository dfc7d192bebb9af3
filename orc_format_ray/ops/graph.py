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
right trade while ranks fit in one machine's memory (16M nodes ~ 256 MB);
beyond that, shard the rank vector by node-id range and turn the contrib
fold into a bucketed join (same recipe as ops/dedup.py's sharded survivor
filter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .._rayutil import remote_args


def pagerank(edges_ds, src: str = "src", dst: str = "dst", iterations: int = 3,
             scale: int = 10**12, damping_num: int = 850, damping_den: int = 1000,
             max_broadcast_nodes: int = 1 << 24):
    """Exact-integer PageRank over a directed edge Dataset. Returns a
    pandas DataFrame ``(node, rank_units)`` — int64, one row per distinct
    node (the rank vector is driver-resident by design, see module doc).
    """
    import ray
    from ray.data.aggregate import Sum

    if iterations < 0:
        raise ValueError(f"iterations must be >= 0, got {iterations}")
    if not (0 < damping_num < damping_den):
        raise ValueError("need 0 < damping_num < damping_den")

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

    edges = (
        cells.groupby(["s", "d"]).aggregate(Count(alias_name="__pr_c__")).select_columns(["s", "d"])
    ).materialize()

    # node universe + out-degrees (both |nodes|-sized — driver-resident)
    ends = edges.map_batches(
        lambda b: pa.table({"id": pa.concat_arrays([b["s"].combine_chunks(), b["d"].combine_chunks()]).unique()}),
        batch_format="pyarrow", zero_copy_batch=True, **remote_args(),
    )
    node_df = ends.groupby("id").aggregate(Count(alias_name="__pr_n__")).select_columns(["id"]).to_pandas()
    if node_df.empty:  # fully-empty Datasets drop columns in to_pandas
        import pandas as pd

        return pd.DataFrame({"node": pd.Series([], dtype="int64"), "rank_units": pd.Series([], dtype="int64")})
    node_ids = np.sort(node_df["id"].to_numpy(dtype=np.int64))
    n = len(node_ids)
    if n > max_broadcast_nodes:
        raise ValueError(
            f"{n} nodes exceed max_broadcast_nodes={max_broadcast_nodes}; "
            "shard the rank vector (see module doc) or raise the guard"
        )
    deg_df = edges.groupby("s").aggregate(Count(alias_name="deg")).to_pandas()
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

        sums = (
            edges.map_batches(contribs, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
            .groupby("d")
            .aggregate(Sum("c", alias_name="c"))
            .to_pandas()
        )
        nxt = np.full(n, base, dtype=np.int64)
        di = np.searchsorted(node_ids, sums["d"].to_numpy(dtype=np.int64))
        nxt[di] += sums["c"].to_numpy(dtype=np.int64)
        ranks = nxt

    import pandas as pd

    return pd.DataFrame({"node": node_ids, "rank_units": ranks})
