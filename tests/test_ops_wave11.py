"""Session-11 operator wave: multi-source BFS, SCD2 validity intervals,
event debouncing, bloom-prefiltered semi join, group-aware holdout split,
smoothed target encoding, longest activity streaks, inverted index,
systematic sampling. Each test pins the op against an independent local
recompute (DuckDB SQL or exact construction) at tiny scale."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["documents", "events", "lineitem", "orders", "customer", "supplier", "part"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _assert_frames_equal(a: pd.DataFrame, b: pd.DataFrame):
    a, b = _sorted(a), _sorted(b)
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            assert np.array_equal(av.astype(np.float64), bv.astype(np.float64)), c
        else:
            assert (av == bv).all(), c


# ------------------------------------------------------- multi-source BFS


def _brute_bfs(edges, seeds, max_hops, directed):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        nxt = set()
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = h
                    nxt.add(m)
        frontier = nxt
    return dist


def test_bfs_hops_matches_brute_force(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import bfs_hops

    rng = np.random.default_rng(7)
    n_edges = 300
    edges = np.unique(rng.integers(0, 40, size=(n_edges, 2)), axis=0)
    edges = edges[edges[:, 0] != edges[:, 1]]
    ds = ray.data.from_pandas(pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]}))
    for directed in (False, True):
        for hops in (0, 1, 3):
            out = bfs_hops(ds, seeds=[0, 5], max_hops=hops, directed=directed)
            want = _brute_bfs([tuple(e) for e in edges], [0, 5], hops, directed)
            got = dict(zip(out["node"], out["hops"]))
            assert got == want, (directed, hops)


def test_bfs_hops_isolated_seed_and_empty(ray_session):
    import ray.data

    from orc_format_ray.ops.graph import bfs_hops

    ds = ray.data.from_pandas(pd.DataFrame({"src": [1, 2], "dst": [2, 3]}))
    out = bfs_hops(ds, seeds=[99], max_hops=2)
    assert list(out["node"]) == [99] and list(out["hops"]) == [0]
    out = bfs_hops(ds, seeds=[], max_hops=2)
    assert out.empty and list(out.columns) == ["node", "hops"]
