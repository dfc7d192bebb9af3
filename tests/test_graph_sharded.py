"""Sharded graph state (VERDICT r4 #5): pagerank/bfs_hops above
max_broadcast_nodes keep rank/visited as hash-bucketed Datasets joined per
round instead of a ray.put vector. The integer arithmetic is term-identical,
so sharded must be BIT-EQUAL to broadcast on any graph; auto mode must
engage the sharded path when the guard would trip (forced here with a tiny
guard so toy graphs exercise the big-graph plan)."""

import numpy as np
import pandas as pd
import pytest
import ray

from orc_format_ray.ops import graph as G


def _edges(n_nodes: int, n_edges: int, seed: int):
    rng = np.random.default_rng(seed)
    import pyarrow as pa
    return ray.data.from_arrow(pa.table({
        "src": pa.array(rng.integers(0, n_nodes, n_edges), type=pa.int64()),
        "dst": pa.array(rng.integers(0, n_nodes, n_edges), type=pa.int64()),
    }))


@pytest.mark.parametrize("iterations", [0, 1, 3])
def test_pagerank_sharded_bit_equals_broadcast(ray_session, iterations):
    bc = G.pagerank(_edges(200, 900, 5), iterations=iterations, mode="broadcast")
    sh = G.pagerank(_edges(200, 900, 5), iterations=iterations, mode="sharded")
    pd.testing.assert_frame_equal(bc, sh)
    assert bc["rank_units"].dtype == sh["rank_units"].dtype == np.dtype("int64")


def test_pagerank_auto_engages_sharded_above_guard(ray_session):
    bc = G.pagerank(_edges(150, 600, 9), mode="broadcast")
    auto = G.pagerank(_edges(150, 600, 9), max_broadcast_nodes=10, mode="auto")
    pd.testing.assert_frame_equal(bc, auto)


def test_pagerank_broadcast_mode_still_guards(ray_session):
    with pytest.raises(ValueError, match="max_broadcast_nodes"):
        G.pagerank(_edges(150, 600, 9), max_broadcast_nodes=10, mode="broadcast")


@pytest.mark.parametrize("directed", [True, False])
def test_bfs_sharded_bit_equals_broadcast(ray_session, directed):
    seeds = [0, 3, 17]
    bc = G.bfs_hops(_edges(300, 700, 11), seeds, max_hops=4, directed=directed, mode="broadcast")
    sh = G.bfs_hops(_edges(300, 700, 11), seeds, max_hops=4, directed=directed, mode="sharded")
    pd.testing.assert_frame_equal(bc, sh)


def test_bfs_auto_restarts_sharded_when_guard_trips(ray_session):
    seeds = [0]
    bc = G.bfs_hops(_edges(250, 900, 13), seeds, max_hops=3, mode="broadcast")
    auto = G.bfs_hops(_edges(250, 900, 13), seeds, max_hops=3,
                      max_broadcast_nodes=5, mode="auto")
    pd.testing.assert_frame_equal(bc, auto)


def _wedges(n_nodes: int, n_edges: int, seed: int):
    rng = np.random.default_rng(seed)
    import pyarrow as pa
    return ray.data.from_arrow(pa.table({
        "src": pa.array(rng.integers(0, n_nodes, n_edges), type=pa.int64()),
        "dst": pa.array(rng.integers(0, n_nodes, n_edges), type=pa.int64()),
        "w": pa.array(rng.integers(0, 100, n_edges), type=pa.int64()),
    }))


@pytest.mark.parametrize("directed", [True, False])
def test_cheapest_sharded_bit_equals_broadcast(ray_session, directed):
    seeds = [0, 5]
    bc = G.cheapest_path(_wedges(200, 800, 21), seeds, max_hops=4, directed=directed, mode="broadcast")
    sh = G.cheapest_path(_wedges(200, 800, 21), seeds, max_hops=4, directed=directed, mode="sharded")
    pd.testing.assert_frame_equal(bc, sh)


def test_cheapest_auto_restarts_sharded_when_guard_trips(ray_session):
    bc = G.cheapest_path(_wedges(150, 700, 23), [1], max_hops=3, mode="broadcast")
    auto = G.cheapest_path(_wedges(150, 700, 23), [1], max_hops=3,
                           max_broadcast_nodes=5, mode="auto")
    pd.testing.assert_frame_equal(bc, auto)


@pytest.mark.parametrize("iterations", [0, 2])
def test_ppr_sharded_bit_equals_broadcast(ray_session, iterations):
    seeds = [1, 4, 9]
    bc = G.personalized_pagerank(_edges(180, 800, 31), seeds, iterations=iterations, mode="broadcast")
    sh = G.personalized_pagerank(_edges(180, 800, 31), seeds, iterations=iterations, mode="sharded")
    pd.testing.assert_frame_equal(bc, sh)


def test_ppr_sharded_rejects_missing_seed(ray_session):
    with pytest.raises(ValueError, match="seeds not in the graph"):
        G.personalized_pagerank(_edges(50, 200, 33), [999_999], iterations=1, mode="sharded")


@pytest.mark.parametrize("k", [2, 4])
def test_kcore_sharded_equals_broadcast(ray_session, k):
    bc = G.kcore(_edges(120, 500, 41), k, mode="broadcast").to_pandas()
    sh = G.kcore(_edges(120, 500, 41), k, mode="sharded").to_pandas()
    def nrm(df):
        if df.empty:
            return pd.DataFrame({"node": pd.Series([], dtype="int64"), "degree": pd.Series([], dtype="int64")})
        return df.sort_values("node").reset_index(drop=True).astype({"node": "int64", "degree": "int64"})
    pd.testing.assert_frame_equal(nrm(bc), nrm(sh))


def test_kcore_sharded_fully_peeled_returns_typed_empty(ray_session):
    out = G.kcore(_edges(60, 80, 43), 40, mode="sharded").to_pandas()
    assert len(out) == 0


def test_bfs_sharded_isolated_seeds_kept_at_zero(ray_session):
    # seeds with no out-edges still appear at hop 0 (mirror the VALUES list)
    out = G.bfs_hops(_edges(50, 100, 17), [999_999], max_hops=3, mode="sharded")
    assert out.to_dict("list") == {"node": [999_999], "hops": [0]}
