"""Small shared helpers."""

from __future__ import annotations


def default_pool(max_fraction: float = 0.5, floor: int = 1) -> tuple[int, int]:
    """Autoscaling actor-pool bounds that leave CPUs for the read/write and
    shuffle stages: an actor pool that reserves every CPU starves its
    upstream task stages and the pipeline deadlocks (observed at
    num_cpus=4 with a fixed pool of 4).

    Returns ``(1, max(floor+1, int(ncpu * max_fraction)))``.
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    hi = max(floor + 1, int(ncpu * max_fraction))
    return (floor, hi)


def shuffle_partitions() -> int:
    """Shuffle (groupby/sort) partition count scaled to the session's CPUs.

    Ray's default partitioning targets much larger datasets; for the
    pre-aggregated partials our constraint shuffles move, a
    cores-proportional count cuts fixed task overhead ~3-30x at small
    scale while still scaling with cluster size (more nodes -> more CPUs
    -> more reducers).
    """
    import ray

    ncpu = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, ncpu)
