"""Deletion vectors (orc_format_ray/dv.py): sidecar codec round-trip,
merge semantics, predicate delete with tail-stats file pruning,
merge-on-read equivalence, vacuum physical fold, stale-sidecar guards."""

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from orc_format_ray.dv import (
    _decode_dv,
    _encode_dv,
    delete_where_dv,
    read_deletion_vector,
    read_lake_dv,
    read_orc_masked,
    vacuum_dv,
    write_deletion_vector,
)
from orc_format_ray.orcfile import write_orc


def _mk_lake(tmp_path, n_files=3, rows=60):
    lake = str(tmp_path / "lake")
    os.makedirs(lake, exist_ok=True)
    rng = np.random.default_rng(11)
    frames = []
    for i in range(n_files):
        df = pd.DataFrame(
            {
                "id": np.arange(i * rows, (i + 1) * rows, dtype=np.int64),
                "grp": rng.choice(["a", "b", "c"], size=rows),
                "v": rng.integers(0, 1000, size=rows).astype(np.int64),
            }
        )
        write_orc(pa.Table.from_pandas(df, preserve_index=False),
                  f"{lake}/part-{i}.orc", stripe_rows=25, row_index_stride=10)
        frames.append(df)
    return lake, pd.concat(frames, ignore_index=True)


# ------------------------------------------------------------- sidecar codec


@pytest.mark.parametrize("pos", [
    [], [0], [41], list(range(42)), [0, 1, 5, 40, 41],
])
def test_dv_codec_roundtrip(pos):
    buf = _encode_dv(42, np.array(pos, dtype=np.int64))
    n, got = _decode_dv(buf)
    assert n == 42
    assert got.tolist() == sorted(set(pos))


def test_dv_codec_roundtrip_large_sparse():
    rng = np.random.default_rng(5)
    pos = np.unique(rng.choice(10**7, size=5000, replace=False))
    n, got = _decode_dv(_encode_dv(10**7, pos))
    assert n == 10**7 and np.array_equal(got, np.sort(pos))


def test_dv_encode_rejects_out_of_range():
    with pytest.raises(ValueError, match="out of range"):
        _encode_dv(10, np.array([10]))
    with pytest.raises(ValueError, match="out of range"):
        _encode_dv(10, np.array([-1]))


def test_dv_decode_rejects_bad_magic():
    with pytest.raises(ValueError, match="magic"):
        _decode_dv(b"XXXX" + b"\x00" * 16)


# ------------------------------------------------------- write/read sidecars


def test_write_deletion_vector_merges_union(tmp_path, ray_session):
    lake, _ = _mk_lake(tmp_path, n_files=1)
    p = f"{lake}/part-0.orc"
    assert write_deletion_vector(p, [3, 7]) == 2
    assert write_deletion_vector(p, [7, 11]) == 3
    pinned, pos = read_deletion_vector(p)
    assert pinned == 60 and pos.tolist() == [3, 7, 11]


def test_write_deletion_vector_rejects_out_of_range(tmp_path, ray_session):
    lake, _ = _mk_lake(tmp_path, n_files=1)
    with pytest.raises(ValueError, match="out of range"):
        write_deletion_vector(f"{lake}/part-0.orc", [60])


# --------------------------------------------------------- delete_where_dv


def test_delete_where_dv_matches_brute_force(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path)
    res = delete_where_dv(lake, ("v", ">=", 500))
    want_deleted = int((df["v"] >= 500).sum())
    assert res["n_deleted"] == want_deleted
    got = (
        read_lake_dv(lake)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = df[df["v"] < 500].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)


def test_delete_where_dv_prunes_files_by_stats(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path, n_files=4)
    # ids are range-partitioned across files: only file 0 can match id < 30
    res = delete_where_dv(lake, ("id", "<", 30))
    assert res["n_files"] == 4 and res["n_scanned"] == 1
    assert res["n_deleted"] == 30


def test_delete_where_dv_and_list_and_in(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path)
    res = delete_where_dv(lake, [("grp", "in", ["a", "b"]), ("v", "<", 100)])
    want = int((df["grp"].isin(["a", "b"]) & (df["v"] < 100)).sum())
    assert res["n_deleted"] == want
    # second delete merges; totals are cumulative and idempotent
    res2 = delete_where_dv(lake, [("grp", "in", ["a", "b"]), ("v", "<", 100)])
    assert res2["n_deleted"] == 0


def test_delete_where_dv_rejects_bad_predicate(tmp_path, ray_session):
    lake, _ = _mk_lake(tmp_path, n_files=1)
    with pytest.raises(ValueError, match="predicate"):
        delete_where_dv(lake, "v > 3")
    with pytest.raises(ValueError, match="unsupported"):
        delete_where_dv(lake, ("v", "~", 3))


# --------------------------------------------------------------- merge-on-read


def test_read_orc_masked_projection(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path, n_files=1)
    p = f"{lake}/part-0.orc"
    write_deletion_vector(p, [0, 59])
    tbl = read_orc_masked(p, columns=["id"])
    assert tbl.column_names == ["id"]
    assert tbl.num_rows == 58
    assert tbl["id"].to_pylist() == list(range(1, 59))


def test_read_orc_masked_stale_sidecar_is_loud(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path, n_files=1)
    p = f"{lake}/part-0.orc"
    write_deletion_vector(p, [5])
    sub = pa.Table.from_pandas(df.head(30), preserve_index=False)
    write_orc(sub, p)  # rewrite under the sidecar's back
    with pytest.raises(ValueError, match="stale"):
        read_orc_masked(p)
    with pytest.raises(ValueError, match="stale"):
        write_deletion_vector(p, [1])


# --------------------------------------------------------------------- vacuum


def test_vacuum_folds_and_is_idempotent(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path)
    delete_where_dv(lake, ("v", ">=", 800))
    want = df[df["v"] < 800].sort_values("id").reset_index(drop=True)
    v = vacuum_dv(lake)
    assert v["n_rows_dropped"] == int((df["v"] >= 800).sum())
    assert not any(f.endswith(".dv") for f in os.listdir(lake))
    from orc_format_ray.orcfile import read_orc_dataset

    got = (
        read_orc_dataset(lake, native=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
    v2 = vacuum_dv(lake)
    assert v2["n_vacuumed"] == 0 and v2["n_rows_dropped"] == 0


def test_vacuum_removes_fully_deleted_file(tmp_path, ray_session):
    lake, df = _mk_lake(tmp_path, n_files=2)
    p = f"{lake}/part-0.orc"
    write_deletion_vector(p, np.arange(60))
    v = vacuum_dv(lake)
    assert ("part-0.orc" not in "".join(os.listdir(lake)))
    assert v["n_rows_dropped"] == 60
    got = read_lake_dv(lake).to_pandas()
    assert sorted(got["id"]) == list(range(60, 120))
