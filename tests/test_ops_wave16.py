"""Session-16 op pins: keyed pseudonymization semantics and the
three-way storage-independence composition's engine-side contracts."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def test_pseudonymize_deterministic_and_join_preserving(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table(
        {
            "uid": pa.array([1, 2, 1, None, 3], pa.int64()),
            "other": pa.array([1, 1, 2, 2, 3], pa.int64()),
            "val": pa.array([10, 20, 30, 40, 50], pa.int64()),
        }
    )
    out = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid", "other"], key="k1"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    # equal ids -> equal tokens (rows 0 and 2 share uid=1)
    assert out.loc[0, "uid"] == out.loc[2, "uid"]
    # nulls stay null, never a token
    assert out.loc[3, "uid"] is None or out.loc[3, "uid"] != out.loc[3, "uid"]
    # per-column domain separation: same raw value 1 maps differently per column
    assert out.loc[0, "uid"] != out.loc[0, "other"]
    # stateless determinism across independent runs
    out2 = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid", "other"], key="k1"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    assert out["uid"].tolist()[:3] == out2["uid"].tolist()[:3]
    # different key -> different tokens
    out3 = pseudonymize_keys(
        ray.data.from_arrow(t), ["uid"], key="k2"
    ).to_pandas().sort_values("val").reset_index(drop=True)
    assert out.loc[0, "uid"] != out3.loc[0, "uid"]


def test_pseudonymize_matches_reference_expression(ray_session):
    import hashlib

    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table({"uid": pa.array([42], pa.int64())})
    out = pseudonymize_keys(ray.data.from_arrow(t), ["uid"], key="K").to_pandas()
    assert out.loc[0, "uid"] == hashlib.sha256(b"K:uid:42").hexdigest()[:16]


def test_pseudonymize_rejects_float_keys(ray_session):
    import ray.data

    from orc_format_ray.ops.quality import pseudonymize_keys

    t = pa.table({"x": pa.array([1.5], pa.float64())})
    with pytest.raises(Exception):  # raised inside the Ray task
        pseudonymize_keys(ray.data.from_arrow(t), ["x"], key="k").to_pandas()


def test_q6_source_ds_hook_matches_default(ray_session):
    import ray.data

    from orc_format_ray.pipelines.tpch import q6_forecast_revenue

    base = q6_forecast_revenue(SF)
    cols = ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"]
    via_ds = q6_forecast_revenue(
        SF, source_ds=ray.data.read_parquet(f"{SF}/lineitem.parquet", columns=cols)
    )
    assert base.values.tolist() == via_ds.values.tolist()
