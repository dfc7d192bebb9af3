"""Stats-planned sorted-merge join (ops/mergejoin.py): tails-only range
planning, shuffle-free execution parity, degradation observability."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orc_format_ray.orcfile import write_orc


def _lake(tmp_path, name, df, key, n_files, clustered=True):
    d = str(tmp_path / name)
    os.makedirs(d)
    if clustered:
        df = df.sort_values(key).reset_index(drop=True)
    step = (len(df) + n_files - 1) // n_files
    for i in range(n_files):
        part = df.iloc[i * step : (i + 1) * step]
        if len(part):
            write_orc(pa.Table.from_pandas(part, preserve_index=False),
                      f"{d}/p{i}.orc", stripe_rows=50, row_index_stride=25)
    return d


def _sides(rng, n_a=200, n_b=500):
    a = pd.DataFrame(
        {
            "k": rng.choice(300, n_a, replace=False).astype(np.int64),
            "grp": rng.choice(["x", "y", "z"], n_a),
        }
    )
    b = pd.DataFrame(
        {
            "k": rng.integers(0, 300, n_b).astype(np.int64),  # dupes: many-to-many
            "v": rng.integers(0, 100, n_b).astype(np.int64),
        }
    )
    return a, b


def test_merge_join_matches_pandas(tmp_path, ray_session):
    from orc_format_ray.ops.mergejoin import sorted_merge_join

    rng = np.random.default_rng(4)
    a, b = _sides(rng)
    la = _lake(tmp_path, "a", a, "k", 4)
    lb = _lake(tmp_path, "b", b, "k", 7)
    got = (
        sorted_merge_join(la, lb, "k", "k", max_ranges=8)
        .to_pandas()
        .sort_values(["k", "grp", "v"])
        .reset_index(drop=True)
    )
    want = (
        a.merge(b, on="k", how="inner")
        .sort_values(["k", "grp", "v"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[["k", "grp", "v"]], want[["k", "grp", "v"]])


def test_merge_join_projection_and_suffix(tmp_path, ray_session):
    from orc_format_ray.ops.mergejoin import sorted_merge_join

    rng = np.random.default_rng(5)
    a = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(50, dtype=np.int64), "v": np.arange(50, 100, dtype=np.int64)})
    la = _lake(tmp_path, "a", a, "k", 2)
    lb = _lake(tmp_path, "b", b, "k", 3)
    got = sorted_merge_join(la, lb, "k", "k", columns_a=["v"], columns_b=["v"]).to_pandas()
    assert sorted(got.columns) == ["k", "v", "v_b"]
    got = got.sort_values("k").reset_index(drop=True)
    assert (got["v_b"] - got["v"] == 50).all()


def test_plan_reports_clustering_quality(tmp_path, ray_session):
    from orc_format_ray.ops.mergejoin import plan_merge_join

    rng = np.random.default_rng(6)
    df = pd.DataFrame({"k": np.arange(400, dtype=np.int64), "v": np.arange(400)})
    clustered = _lake(tmp_path, "cl", df, "k", 8)
    shuffled = df.sample(frac=1.0, random_state=1).reset_index(drop=True)
    unclustered = _lake(tmp_path, "uncl", shuffled, "k", 8, clustered=False)
    good = plan_merge_join(clustered, clustered, "k", "k")
    bad = plan_merge_join(unclustered, unclustered, "k", "k")
    # clustered: ~O(1) files per range; unclustered: most files, every range
    assert good["avg_files_per_range"] < 4
    assert bad["avg_files_per_range"] > good["avg_files_per_range"] * 3


def test_merge_join_loud_failures(tmp_path, ray_session):
    from orc_format_ray.ops.mergejoin import sorted_merge_join

    a = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    b = pd.DataFrame({"k": np.arange(1000, 1010, dtype=np.int64)})
    la = _lake(tmp_path, "a", a, "k", 1)
    lb = _lake(tmp_path, "b", b, "k", 1)
    with pytest.raises(ValueError, match="never overlap"):
        sorted_merge_join(la, lb, "k", "k")
    with pytest.raises(FileNotFoundError):
        sorted_merge_join(str(tmp_path / "missing"), lb, "k", "k")
