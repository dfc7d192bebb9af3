"""hash_join scale sizing (VERDICT r4 #4): num_buckets derives from the two
sides' lazily-estimated bytes (no execution), and a bucket whose shuffled
payload exceeds the sub-split budget is partitioned by a secondary key hash
inside the worker so the pandas-merge peak stays bounded. The sub-split
tests shrink the budget to a few KiB so the path engages on toy data; the
row multiset must be identical to the plain merge."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from orc_format_ray.ops import join as j


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _mk(n_left: int, n_right: int, seed: int):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "k": pa.array(rng.integers(0, 50, n_left), type=pa.int64()),
        "lv": pa.array(rng.integers(0, 1000, n_left), type=pa.int64()),
    })
    right = pa.table({
        "k": pa.array(rng.integers(0, 50, n_right), type=pa.int64()),
        "rv": pa.array(rng.integers(0, 1000, n_right), type=pa.int64()),
    })
    return left, right


def test_auto_num_buckets_scales_with_estimated_bytes(ray_session, monkeypatch):
    lds = ray.data.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    rds = ray.data.read_parquet("/root/testdata/sf0.001/orders.parquet")
    est_l, est_r = j._estimate_bytes(lds), j._estimate_bytes(rds)
    assert est_l and est_l > 0 and est_r and est_r > 0  # reads know their bytes lazily
    assert j._auto_num_buckets(lds, rds) == 8  # tiny inputs floor at 8
    # shrink the per-bucket budget: the count must track ceil(total*EXPANSION/budget)
    monkeypatch.setattr(j, "_BUCKET_MEM_BUDGET", 1 << 14)
    import math
    want = min(4096, max(8, math.ceil((est_l + est_r) * j._JOIN_EXPANSION / (1 << 14))))
    assert j._auto_num_buckets(lds, rds) == want
    assert want > 8


def test_estimate_walks_past_transforms(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/lineitem.parquet").map_batches(
        lambda b: b, batch_format="pyarrow"
    )
    est = j._estimate_bytes(ds)
    assert est and est > 0  # the map reports None; the walk reaches the read


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_subsplit_matches_plain_merge(ray_session, how):
    left, right = _mk(3000, 2000, seed=7)
    expect = left.to_pandas().merge(
        right.to_pandas(), on="k", how={"full": "outer"}.get(how, how), suffixes=("", "_r")
    )
    out = j.hash_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        num_buckets=2, how=how, subsplit_budget=1 << 12,  # ~4 KiB: every bucket sub-splits
    ).to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(expect), check_dtype=False)


@pytest.mark.parametrize("how", ["inner", "left", "full"])
def test_raw_and_sortshuffle_paths_row_identical(ray_session, how):
    # >_RAW_EXCHANGE_MAX_BUCKETS forces the Dataset sort-shuffle path; the
    # two implementations share _bucket_join_tables and must agree exactly
    left, right = _mk(2000, 1500, seed=17)
    raw = j.hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
                      num_buckets=8, how=how).to_pandas()
    slow = j.hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
                       num_buckets=j._RAW_EXCHANGE_MAX_BUCKETS + 1, how=how).to_pandas()
    pd.testing.assert_frame_equal(_norm(raw), _norm(slow), check_dtype=False)


def test_default_auto_join_matches_pandas(ray_session):
    left, right = _mk(500, 400, seed=11)
    expect = left.to_pandas().merge(right.to_pandas(), on="k", how="inner", suffixes=("", "_r"))
    out = j.hash_join(ray.data.from_arrow(left), ray.data.from_arrow(right), "k").to_pandas()
    pd.testing.assert_frame_equal(_norm(out), _norm(expect), check_dtype=False)
