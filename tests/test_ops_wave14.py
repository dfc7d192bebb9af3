"""Session-14 operator wave: Wilson lower bound, per-group CVaR,
time-weighted average, mojibake/encoding audit, purged temporal split.
Each test pins the op against an independent local recompute at tiny
scale (the DuckDB mirrors run in test_driver_contract)."""

import math

import numpy as np
import pandas as pd
import pytest

# ------------------------------------------------ wilson_lower_bound_by_group


def test_wilson_lower_bound_matches_scalar_formula(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import wilson_lower_bound_by_group

    df = pd.DataFrame(
        {
            "g": ["a"] * 500 + ["b"] * 1 + ["c"] * 10,
            "hit": [1] * 480 + [0] * 20 + [1] + [1] * 3 + [0] * 7,
        }
    )
    got = wilson_lower_bound_by_group(
        ray.data.from_pandas(df).repartition(4), "g", "hit"
    ).set_index("g")

    def wilson(k, n, z=1.96):
        p = k / n
        return (p + z * z / (2 * n) - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (
            1 + z * z / n
        )

    for g, k, n in [("a", 480, 500), ("b", 1, 1), ("c", 3, 10)]:
        assert got.loc[g, "n"] == n and got.loc[g, "k"] == k
        assert got.loc[g, "wilson_lb"] == pytest.approx(wilson(k, n), abs=1e-12)
    # the ranking property the raw rate gets wrong: 1/1 must NOT outrank 480/500
    assert got.loc["b", "wilson_lb"] < got.loc["a", "wilson_lb"]


def test_wilson_rejects_non_binary_indicator(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import wilson_lower_bound_by_group

    df = pd.DataFrame({"g": ["a", "a"], "hit": [0, 2]})
    with pytest.raises(Exception, match="0/1"):
        wilson_lower_bound_by_group(ray.data.from_pandas(df), "g", "hit")


# --------------------------------------------------------------- cvar_by_group


def test_cvar_matches_brute_force(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import cvar_by_group

    rng = np.random.default_rng(7)
    df = pd.DataFrame(
        {
            "g": rng.choice(["x", "y"], size=400),
            "v": np.round(rng.exponential(50.0, size=400), 2),
        }
    )
    got = (
        cvar_by_group(ray.data.from_pandas(df).repartition(5), "g", "v", q=0.9)
        .to_pandas()
        .set_index("g")
    )
    for g, sub in df.groupby("g"):
        u = np.floor(sub["v"].to_numpy() * 100 + 0.5).astype(np.int64)
        n = len(u)
        rank = int(np.ceil(np.float64(0.9) * n))  # the pinned DuckDB rank rule
        var_u = int(np.sort(u)[rank - 1])
        tail = u[u >= var_u]
        assert got.loc[g, "n"] == n
        assert got.loc[g, "var_u"] == var_u
        assert got.loc[g, "tail_n"] == len(tail)
        assert got.loc[g, "tail_sum"] == int(tail.sum())
        assert got.loc[g, "cvar"] == float(
            np.float64(int(tail.sum())) / np.float64(len(tail)) / np.float64(100)
        )


# ----------------------------------------------------------- time_weighted_avg


def test_twap_matches_hand_computation(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import time_weighted_avg

    # key 1: value 10.0 for 3us, 20.0 for 1us -> twap = (1000*3+2000*1)/4/100
    # key 2: single event -> no row
    df = pd.DataFrame(
        {
            "k": [1, 1, 1, 2],
            "ts": pd.to_datetime([0, 3, 4, 9], unit="us", utc=False),
            "v": [10.0, 20.0, 5.0, 1.0],
        }
    )
    got = time_weighted_avg(
        ray.data.from_pandas(df).repartition(2), "k", "ts", "v"
    ).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert r["k"] == 1 and r["n_seg"] == 2 and r["dt_us"] == 4
    assert r["num_units"] == 1000 * 3 + 2000 * 1
    assert r["twap"] == pytest.approx(5000 / 4 / 100)


def test_twap_rejects_duplicate_timestamps(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import time_weighted_avg

    df = pd.DataFrame(
        {"k": [1, 1], "ts": pd.to_datetime([5, 5], unit="us"), "v": [1.0, 2.0]}
    )
    with pytest.raises(Exception, match="duplicate"):
        time_weighted_avg(ray.data.from_pandas(df), "k", "ts", "v").to_pandas()


def test_twap_guard_bound_is_sharp(ray_session):
    """sum(u*dt) really is bounded by max(u)*span — the single-guard
    argument the docstring makes."""
    rng = np.random.default_rng(3)
    t = np.sort(rng.choice(10**9, size=50, replace=False)).astype(np.int64)
    u = rng.integers(0, 10**6, size=50).astype(np.int64)
    dt = t[1:] - t[:-1]
    assert (u[:-1] * dt).sum() <= int(np.abs(u).max()) * int(t[-1] - t[0])


# --------------------------------------------------------------- encoding_audit


def test_encoding_audit_counts_docs_not_occurrences(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import encoding_audit

    bad1 = "cafÃ© twice Ã©"  # two hits, one doc
    bad2 = "broken â€™ quote"
    bad3 = "lossy � char"
    df = pd.DataFrame(
        {
            "source": ["s1", "s1", "s2", "s2", "s2"],
            "text": [bad1, "clean text", bad2, bad3, "also clean"],
        }
    )
    got = encoding_audit(ray.data.from_pandas(df).repartition(3), "source", "text").set_index(
        "source"
    )
    assert got.loc["s1", "n"] == 2 and got.loc["s1", "n_bad"] == 1
    assert got.loc["s2", "n"] == 3 and got.loc["s2", "n_bad"] == 2
    assert got.loc["s2", "frac_bad"] == pytest.approx(2 / 3)


def test_encoding_audit_clean_corpus_is_all_zero(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import encoding_audit

    df = pd.DataFrame({"source": ["a"] * 4, "text": ["plain ascii text"] * 4})
    got = encoding_audit(ray.data.from_pandas(df), "source", "text")
    assert got["n_bad"].sum() == 0 and (got["frac_bad"] == 0.0).all()


# --------------------------------------------------------------- temporal_split


def test_temporal_split_boundary_and_embargo(ray_session):
    import ray.data

    from orc_format_ray.ops.sample import temporal_split

    # range [0, 100us): boundary = 0 + 100*7//10 = 70; embargo 10us
    df = pd.DataFrame(
        {
            "i": np.arange(101, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(101), unit="us"),
        }
    )
    got = (
        temporal_split(ray.data.from_pandas(df).repartition(4), "ts", 7, 10, embargo_us=10)
        .to_pandas()
        .sort_values("i")
    )
    train = got[got["split"] == "train"]["i"].to_numpy()
    test = got[got["split"] == "test"]["i"].to_numpy()
    assert train.max() == 69 and train.min() == 0 and len(train) == 70
    assert test.min() == 80 and test.max() == 100 and len(test) == 21
    # embargo rows [70, 80) are gone entirely
    assert not np.isin(np.arange(70, 80), got["i"].to_numpy()).any()


def test_temporal_split_rejects_bad_fraction(ray_session):
    import ray.data

    from orc_format_ray.ops.sample import temporal_split

    df = pd.DataFrame({"ts": pd.to_datetime([1, 2], unit="us")})
    with pytest.raises(ValueError, match="train_num"):
        temporal_split(ray.data.from_pandas(df), "ts", 10, 10)
