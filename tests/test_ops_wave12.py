"""Session-12 operator wave: clamped running balance (reflection scan),
Benford first-digit audit, k-anonymity audit, largest-remainder
apportionment, functional-dependency audit, ORC lake upsert. Each test pins
the op against an independent local recompute at tiny scale."""

import numpy as np
import pandas as pd
import pytest

# ------------------------------------------------ clamped running balance


def _brute_clamped(df: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for k, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        b = 0
        for _, r in g.iterrows():
            b = max(b + int(r["units"]), 0)
            rows.append((int(k), int(r["ts"].value) // 1000, int(r["event_id"]), b))
    return pd.DataFrame(rows, columns=["user_id", "ts_us", "event_id", "balance_units"])


def test_clamped_balance_matches_sequential_fold(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import clamped_running_balance

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame(
        {
            "user_id": rng.integers(0, 40, n),
            "ts": pd.to_datetime(rng.permutation(n) * 1_000_003, unit="us"),
            "event_id": np.arange(n, dtype=np.int64),
            "units": rng.integers(-500, 400, n),  # withdrawal-heavy: clamp fires often
        }
    )
    # (user_id, ts) must be unique: permutation of distinct micros guarantees it
    ds = ray.data.from_pandas(df).repartition(7)
    got = (
        clamped_running_balance(ds)
        .to_pandas()
        .sort_values(["user_id", "ts_us"])
        .reset_index(drop=True)
    )
    want = _brute_clamped(df).sort_values(["user_id", "ts_us"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert (got["balance_units"] >= 0).all()


def test_clamped_balance_single_rows_and_all_negative(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import clamped_running_balance

    df = pd.DataFrame(
        {
            "user_id": [1, 2, 2, 2],
            "ts": pd.to_datetime([10, 5, 6, 7], unit="us"),
            "event_id": [0, 1, 2, 3],
            "units": [-7, -1, -2, -3],
        }
    )
    got = (
        clamped_running_balance(ray.data.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values(["user_id", "ts_us"])
        .reset_index(drop=True)
    )
    assert got["balance_units"].tolist() == [0, 0, 0, 0]


def test_clamped_balance_unit_guard(ray_session):
    import ray.data

    from orc_format_ray.ops.windows import clamped_running_balance

    df = pd.DataFrame(
        {
            "user_id": [1],
            "ts": pd.to_datetime([1], unit="us"),
            "event_id": [0],
            "units": [1 << 31],
        }
    )
    with pytest.raises(Exception, match="2\\^31"):
        clamped_running_balance(ray.data.from_pandas(df)).to_pandas()

# -------------------------------------------------- Benford digit audit


def test_benford_digits_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import benford_digits

    rng = np.random.default_rng(3)
    # log-uniform magnitudes => non-trivial digit spread; include sub-cent
    # values (quantize to 0, excluded) and negatives (excluded)
    v = np.concatenate(
        [
            10.0 ** rng.uniform(-1, 5, 4000),
            np.full(50, 0.004),
            -10.0 ** rng.uniform(0, 3, 100),
        ]
    )
    g = rng.choice(["a", "b", "c"], len(v))
    df = pd.DataFrame({"grp": g, "val": v})
    got = (
        benford_digits(ray.data.from_pandas(df).repartition(5), "grp", "val")
        .to_pandas()
        .sort_values(["grp", "digit"])
        .reset_index(drop=True)
    )
    u = np.floor(v * 100 + 0.5).astype(np.int64)
    keep = u > 0
    digit = np.array([int(str(x)[0]) for x in u[keep]])
    exp = (
        pd.DataFrame({"grp": g[keep], "digit": digit})
        .groupby(["grp", "digit"])
        .size()
        .rename("cnt")
        .reset_index()
    )
    tot = exp.groupby("grp")["cnt"].transform("sum")
    exp["frac"] = exp["cnt"].to_numpy(np.float64) / tot.to_numpy(np.float64)
    exp = exp.sort_values(["grp", "digit"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert np.allclose(got.groupby("grp")["frac"].sum(), 1.0)

# ---------------------------------------------------- k-anonymity audit


def test_k_anonymity_matches_brute(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import k_anonymity

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "zip": rng.integers(0, 30, 2000),
            "seg": rng.choice(["x", "y"], 2000),
        }
    )
    got = (
        k_anonymity(ray.data.from_pandas(df).repartition(6), ["zip", "seg"], k=30)
        .to_pandas()
        .sort_values(["zip", "seg"])
        .reset_index(drop=True)
    )
    exp = df.groupby(["zip", "seg"]).size().rename("grp_n").reset_index()
    exp = exp[exp["grp_n"] < 30].sort_values(["zip", "seg"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_k_anonymity_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import k_anonymity

    ds = ray.data.from_pandas(pd.DataFrame({"a": [1]}))
    with pytest.raises(ValueError, match="k must be"):
        k_anonymity(ds, ["a"], k=1)
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity(ds, [], k=5)

# ------------------------------------- largest-remainder apportionment


def test_apportionment_exact_and_ties(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import apportion_largest_remainder

    # weights engineered for remainder ties: equal weights split a seat
    df = pd.DataFrame({"g": list("abcde"), "units": [10, 10, 10, 10, 7]})
    out = apportion_largest_remainder(
        ray.data.from_pandas(df).repartition(3), "g", "units", seats=10
    )
    assert int(out["seats"].sum()) == 10
    # W=47, base = floor(10*w/47): a..d floor(100/47)=2, e floor(70/47)=1
    # rem: a..d 100-94=6, e 70-47=23 -> e gets the 1 extra seat (rem 23 > 6)
    got = dict(zip(out["g"], out["seats"]))
    assert got == {"a": 2, "b": 2, "c": 2, "d": 2, "e": 2}

    # pure tie: 3 equal groups, 4 seats -> base 1 each, extra 1 -> 'a' wins
    df2 = pd.DataFrame({"g": list("abc"), "units": [5, 5, 5]})
    out2 = apportion_largest_remainder(ray.data.from_pandas(df2), "g", "units", seats=4)
    assert dict(zip(out2["g"], out2["seats"])) == {"a": 2, "b": 1, "c": 1}


def test_apportionment_guards(ray_session):
    import ray.data

    from orc_format_ray.ops.agg import apportion_largest_remainder

    ds = ray.data.from_pandas(pd.DataFrame({"g": ["a"], "units": [-1]}))
    with pytest.raises(Exception, match="non-negative"):
        apportion_largest_remainder(ds, "g", "units", seats=5)
    ds0 = ray.data.from_pandas(pd.DataFrame({"g": ["a"], "units": [0]}))
    with pytest.raises(ValueError, match="positive"):
        apportion_largest_remainder(ds0, "g", "units", seats=5)

# ------------------------------------------ functional-dependency audit


def test_fd_audit_detects_exact_fd(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import fd_audit

    rng = np.random.default_rng(5)
    code = rng.integers(0, 20, 1500)
    df = pd.DataFrame(
        {
            "code": code,
            "name": np.array([f"n{c}" for c in code]),  # code -> name exact FD
            "noise": rng.integers(0, 4, 1500),
        }
    )
    got = (
        fd_audit(ray.data.from_pandas(df).repartition(5), ["code", "name", "noise"])
        .to_pandas()
        .set_index(["det_col", "dep_col"])
    )
    assert got.loc[("code", "name"), "n_violating"] == 0  # the planted FD
    assert got.loc[("name", "code"), "n_violating"] == 0  # bijection -> both hold
    assert got.loc[("noise", "code"), "n_violating"] == 4  # every noise value violates
    assert got.loc[("code", "noise"), "n_det"] == 20
    # brute-force cross-check of every cell
    for (a, b), row in got.iterrows():
        nd = df.groupby(a)[b].nunique()
        assert row["n_det"] == len(nd)
        assert row["n_violating"] == int((nd > 1).sum())


def test_fd_audit_null_excluded(ray_session):
    import ray.data

    from orc_format_ray.ops.profile import fd_audit

    df = pd.DataFrame({"a": ["x", "x", None], "b": ["1", None, "2"]})
    got = fd_audit(ray.data.from_pandas(df), ["a", "b"]).to_pandas().set_index(["det_col", "dep_col"])
    # only the ("x","1") row survives null filtering on both sides
    assert got.loc[("a", "b"), "n_det"] == 1
    assert got.loc[("a", "b"), "n_violating"] == 0

# -------------------------------------------------------- ORC lake upsert


def test_upsert_rows_update_insert_and_idempotent(ray_session, tmp_path):
    import ray.data

    from orc_format_ray.orcfile import read_orc_dataset
    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcmerge import upsert_rows

    lake = str(tmp_path / "lake")
    base = pd.DataFrame({"k": np.arange(100, dtype=np.int64), "v": np.arange(100, dtype=np.int64) * 10})
    write_orc_dataset(ray.data.from_pandas(base).repartition(4), lake).materialize()

    up = pd.DataFrame({"k": [3, 50, 99, 200, 201], "v": [-1, -2, -3, -4, -5]})
    s1 = upsert_rows(lake, "k", ray.data.from_pandas(up))
    assert s1["n_deleted_rows"] == 3 and s1["n_appended_rows"] == 5

    def read_lake():
        return (
            read_orc_dataset(lake, native=True)
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    exp = base[~base["k"].isin([3, 50, 99])]
    exp = pd.concat([exp, up]).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(read_lake(), exp, check_dtype=False)

    # re-running the same merge converges to the same state
    s2 = upsert_rows(lake, "k", ray.data.from_pandas(up))
    assert s2["n_deleted_rows"] == 5  # previous upsert's rows delete then re-append
    pd.testing.assert_frame_equal(read_lake(), exp, check_dtype=False)


def test_upsert_rows_duplicate_keys_rejected(ray_session, tmp_path):
    import ray.data

    from orc_format_ray.orcfile import write_orc_dataset
    from orc_format_ray.orcmerge import upsert_rows

    lake = str(tmp_path / "lake")
    write_orc_dataset(
        ray.data.from_pandas(pd.DataFrame({"k": [1, 2], "v": [1, 2]})), lake
    ).materialize()
    dup = pd.DataFrame({"k": [5, 5], "v": [1, 2]})
    with pytest.raises(ValueError, match="unique within the batch"):
        upsert_rows(lake, "k", ray.data.from_pandas(dup))

# ------------------------------------------------------------ readability


def test_readability_counts_and_edges(ray_session):
    import ray.data

    from orc_format_ray.ops.text import readability

    df = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "The cat sat. The dog ran!",  # 6 words, 2 sentences
                "",  # empty: 0 words, sentences floored to 1
                "   ",  # whitespace-only
                "Yyy aeiou xyz?!?",  # vowel-run edge: y counts
            ],
        }
    )
    got = (
        readability(ray.data.from_pandas(df))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got["n_words"].tolist() == [6, 0, 0, 3]
    assert got["n_sentences"].tolist() == [2, 1, 1, 1]
    # doc 0: vowel runs e,a,a,e,o,a -> 6; doc 3: 'yyy','aeiou','y' -> 3
    assert got["n_syllables"].tolist() == [6, 0, 0, 3]
    exp0 = 206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6)
    assert got.loc[0, "score"] == exp0
    assert got.loc[1, "score"] == 206.835  # 0/1 and 0/1 terms

# ----------------------------------------------------- lake time travel


def test_snapshot_survives_upsert_and_vacuum(ray_session, tmp_path):
    import os

    import ray.data

    from orc_format_ray.orcfile import read_orc_dataset, write_orc_dataset
    from orc_format_ray.orcmerge import (drop_snapshot, list_snapshots,
                                         snapshot_lake, upsert_rows)

    lake = str(tmp_path / "lake")
    snaps = str(tmp_path / "snaps")
    base = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50, dtype=np.int64)})
    write_orc_dataset(ray.data.from_pandas(base).repartition(3), lake).materialize()

    s1 = snapshot_lake(lake, snaps)
    assert s1["name"] == "v00001" and s1["n_files"] >= 3

    up = pd.DataFrame({"k": [0, 1, 100], "v": [-1, -2, -3]})
    upsert_rows(lake, "k", ray.data.from_pandas(up))
    s2 = snapshot_lake(lake, snaps)
    assert [m["name"] for m in list_snapshots(snaps)] == ["v00001", "v00002"]

    def rd(d):
        return read_orc_dataset(d, native=True).to_pandas().sort_values("k").reset_index(drop=True)

    pd.testing.assert_frame_equal(rd(s1["dir"]), base, check_dtype=False)  # pre-upsert
    live = rd(lake)
    assert live.loc[live["k"] == 0, "v"].iloc[0] == -1 and len(live) == 51
    pd.testing.assert_frame_equal(rd(s2["dir"]), live, check_dtype=False)

    drop_snapshot(snaps, "v00001")
    assert [m["name"] for m in list_snapshots(snaps)] == ["v00002"]
    pd.testing.assert_frame_equal(rd(s2["dir"]), live, check_dtype=False)  # bytes still alive
    with pytest.raises(ValueError, match="not a committed snapshot"):
        drop_snapshot(snaps, "v00001")
    with pytest.raises(ValueError, match="already exists"):
        snapshot_lake(lake, snaps, name="v00002")
    assert not any(d.endswith(".tmp" + str(os.getpid())) for d in os.listdir(snaps))
