"""Small shared helpers for Ray Data stages."""

from __future__ import annotations

import os


def default_concurrency(cap: int = 32) -> tuple[int, int]:
    """Autoscaling actor-pool bounds (min, max) sized to the cluster.

    Ray Data requires explicit ``concurrency`` for callable-class stages; an
    autoscaling (1, N) pool lets the streaming executor balance this stage
    against the read/write stages instead of starving them (ray_guide:
    'a pool that reserves every CPU starves the read and write stages')."""
    try:
        import ray
        if ray.is_initialized():
            cpus = int(ray.cluster_resources().get("CPU", 0)) or \
                (os.cpu_count() or 4)
        else:
            cpus = os.cpu_count() or 4
    except Exception:  # pragma: no cover
        cpus = os.cpu_count() or 4
    return (1, max(2, min(cap, cpus)))
