"""Small shared runtime helpers."""

from __future__ import annotations


def auto_concurrency(lo: int = 1, cap: int | None = None) -> tuple[int, int]:
    """Actor-pool sizing for ``map_batches`` stages: autoscale between
    ``lo`` and the cluster CPU count (queried at call time), so stateful
    stages neither starve a 32-CPU box with a fixed 2-actor pool nor
    oversubscribe a small one.  On a multi-node cluster
    ``ray.cluster_resources()`` reflects every node, so pools grow with
    the cluster without config changes."""
    try:
        import ray

        ncpu = int(ray.cluster_resources().get("CPU", 0)) if ray.is_initialized() else 0
    except Exception:  # pragma: no cover - ray missing entirely
        ncpu = 0
    hi = max(lo, ncpu or 8)
    if cap is not None:
        hi = min(hi, max(lo, cap))
    return (lo, hi)
