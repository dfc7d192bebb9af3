"""Small Ray helpers shared by the pipeline stages."""

from __future__ import annotations

import os
from pathlib import Path

_REPO_PARENT = str(Path(__file__).resolve().parents[1])


def remote_args() -> dict:
    """ray_remote_args ensuring workers can import this package.

    Workers inherit the raylet's cwd, not the driver's sys.path, so a driver
    running outside the repo dir would spawn workers that cannot unpickle our
    actor classes. Propagating PYTHONPATH via runtime_env env_vars fixes that
    deterministically (no code shipping; the package is on shared storage on
    a real cluster).
    """
    py_path = _REPO_PARENT + os.pathsep + os.environ.get("PYTHONPATH", "")
    return {"runtime_env": {"env_vars": {"PYTHONPATH": py_path}}}


def pool_size(frac: float = 0.75, minimum: int = 1) -> int:
    """Actor-pool concurrency that leaves CPU slots for the read/write stages.

    A pool reserving every CPU starves the upstream read tasks and the
    pipeline deadlocks (each actor holds 1 CPU; the read task waits forever).
    Cap pools at ``frac`` of the cluster CPUs.
    """
    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        cpus = 4
    return max(minimum, int(cpus * frac))
