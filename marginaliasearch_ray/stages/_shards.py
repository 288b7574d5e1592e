"""Shared bootstrap for stateful shard-actor stages (BPE vocab shards,
k-means vec shards): round-robin a materialized Dataset's Arrow block
refs into one group per actor, sized to half the CPU pool so the
iterative driver loop leaves headroom for the rest of the node."""

from __future__ import annotations

import ray


def group_block_refs(block_refs: list) -> list[list]:
    n_cpus = max(4, int(ray.cluster_resources().get("CPU", 8)))
    n_actors = max(1, min(len(block_refs), n_cpus // 2))
    groups: list[list] = [[] for _ in range(n_actors)]
    for i, ref in enumerate(block_refs):
        groups[i % n_actors].append(ref)
    return groups
