"""Consolidated lake index (lakeindex.py): build, prune, staleness
contract, indexed scan parity."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orc_format_ray.orcfile import write_orc


def _lake(tmp_path, n_files=5, rows=80):
    lake = str(tmp_path / "lake")
    os.makedirs(lake)
    df = pd.DataFrame(
        {
            "id": np.arange(n_files * rows, dtype=np.int64),
            "g": (["a", "b"] * (n_files * rows))[: n_files * rows],
            "v": np.arange(n_files * rows, dtype=np.int64) % 97,
        }
    )
    for i in range(n_files):
        part = df.iloc[i * rows : (i + 1) * rows]
        write_orc(pa.Table.from_pandas(part, preserve_index=False),
                  f"{lake}/p{i}.orc", stripe_rows=40, row_index_stride=20)
    return lake, df


def test_build_and_prune(tmp_path, ray_session):
    from orc_format_ray.lakeindex import build_lake_index, prune_files

    lake, df = _lake(tmp_path)
    info = build_lake_index(lake, ["id", "v", "g"])
    assert info["n_files"] == 5
    plan = prune_files(lake, ("id", "<", 80))
    assert plan["n_pruned"] == 4 and plan["n_stale"] == 0
    assert len(plan["paths"]) == 1
    # string min/max prune too
    plan2 = prune_files(lake, ("g", "==", "zzz"))
    assert plan2["n_pruned"] == 5


def test_indexed_scan_matches_filter(tmp_path, ray_session):
    from orc_format_ray.lakeindex import build_lake_index, read_lake_indexed

    lake, df = _lake(tmp_path)
    build_lake_index(lake, ["id"])
    ds, plan = read_lake_indexed(lake, [("id", ">=", 100), ("id", "<", 220)], columns=["id", "v"])
    got = ds.to_pandas().sort_values("id").reset_index(drop=True)
    want = df[(df.id >= 100) & (df.id < 220)][["id", "v"]].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert plan["n_pruned"] >= 2


def test_stale_and_unknown_files_never_pruned(tmp_path, ray_session):
    from orc_format_ray.lakeindex import build_lake_index, prune_files

    lake, df = _lake(tmp_path, n_files=3)
    build_lake_index(lake, ["id"])
    # rewrite p0 with different content (size changes) + add a new file
    write_orc(pa.Table.from_pandas(df.iloc[:5], preserve_index=False), f"{lake}/p0.orc")
    write_orc(pa.Table.from_pandas(df.iloc[:7], preserve_index=False), f"{lake}/new.orc")
    plan = prune_files(lake, ("id", ">=", 10**9))  # matches nothing indexed
    stale_or_new = {os.path.basename(p) for p in plan["paths"]}
    assert plan["n_stale"] == 2
    assert stale_or_new == {"p0.orc", "new.orc"}


def test_missing_index_and_empty_scan_are_loud(tmp_path, ray_session):
    from orc_format_ray.lakeindex import build_lake_index, prune_files, read_lake_indexed

    lake, df = _lake(tmp_path, n_files=2)
    with pytest.raises(FileNotFoundError, match="build_lake_index"):
        prune_files(lake, ("id", "<", 5))
    build_lake_index(lake, ["id"])
    with pytest.raises(ValueError, match="every file pruned"):
        read_lake_indexed(lake, ("id", ">=", 10**9))
