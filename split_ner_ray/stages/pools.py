"""Actor-pool sizing for stateful map_batches stages.

A hard-coded ``concurrency=2`` caps a stage at ~1-2 cores regardless of the
cluster (measured directly as the dedup_minhash_docs 24.6 s pathology in
round 1). Stateful stages that genuinely need an actor pool size it from
the cluster instead; stateless stages should be plain task pools (no class,
no concurrency argument) and need nothing from here.
"""

from __future__ import annotations


def pool_size(num_cpus: float = 0.5) -> int:
    """Default actor-pool size: ~3/4 of the cluster's CPUs (divided by the
    per-actor reservation), never the whole cluster — an actor pool that
    reserves every CPU starves the upstream/downstream task operators of
    the same pipeline and deadlocks the streaming executor."""
    import ray

    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 4)
    else:
        import os

        cpus = os.cpu_count() or 4
    return max(2, int((cpus * 0.75) / num_cpus))
