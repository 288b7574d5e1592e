"""Deterministic 64-bit hashing: URL-seen keys and partition routing.

The reference keys its per-domain seen-set on a 64-bit murmur of
(domain, path, param) (``DomainCrawlFrontier.hashUrl``,
DomainCrawlFrontier.java:144-151).  We use blake2b-8 over the same identity
tuple — the hash function itself is internal state, not output data, so
only determinism and collision resistance matter; the IDENTITY (which
fields participate) matches the reference: proto and port are excluded.

Partition routing for the sharded frontier hashes the *top domain* so a
top-domain's sub-domains co-locate on one shard — that is what lets a
single shard own the politeness budget for a shared host
(reference: per-topDomain semaphores, LocalDomainCoordinator.java:22-100).
"""

from __future__ import annotations

from hashlib import blake2b

from ..model.urls import CanonUrl, split_domain


def url_seen_hash(host: str, path: str, param: str | None) -> int:
    """64-bit seen-set key over the canonical URL identity tuple."""
    h = blake2b(digest_size=8)
    h.update(host.encode("utf-8"))
    h.update(b"\x00")
    h.update(path.encode("utf-8"))
    if param:
        h.update(b"\x00")
        h.update(param.encode("utf-8"))
    return int.from_bytes(h.digest(), "little")


def url_seen_hash_u(u: CanonUrl) -> int:
    return url_seen_hash(u.host, u.path, u.param)


def stable_hash64(s: str) -> int:
    return int.from_bytes(blake2b(s.encode("utf-8"), digest_size=8).digest(), "little")


# Known multi-tenant shared hosts: thousands of independent sub-domains
# under one top-domain.  The reference grants these elevated concurrent-
# fetch permits (LocalDomainCoordinator.java:25) — i.e. it explicitly
# does NOT serialize them behind one politeness owner — so sharding them
# by FULL host ("salted sub-partitioning" per the scale plan) spreads the
# hottest key across the cluster without weakening any per-domain
# politeness guarantee (each sub-domain still has exactly one owner for
# its queue/seen-set/clock; host-level permits remain a real-fetch
# dispatch concern, see state.frontier.topdomain_permits).
SALTED_TOP_DOMAINS = frozenset(
    (
        "wordpress.com",
        "blogspot.com",
        "tumblr.com",
        "neocities.org",
        "github.io",
        "substack.com",
        # the synthetic web's shared hosts
        "shared-host.com",
        "blogfarm.net",
    )
)


def partition_of_domain(host: str, num_partitions: int, extra_salted=None) -> int:
    """Frontier shard for a host: hash(top_domain) % P, except shared
    hosts (static list + adaptively detected hot tops), which spread by
    full host (salted sub-partitioning)."""
    _, top = split_domain(host)
    if top in SALTED_TOP_DOMAINS or (extra_salted is not None and top in extra_salted):
        return stable_hash64(host) % num_partitions
    return stable_hash64(top) % num_partitions


def hot_tops_from_seeds(domains, num_partitions: int) -> frozenset:
    """Adaptive skew detection (the north-star's frontier rebalancing):
    any top-domain whose seed-domain count alone would fill more than
    half a frontier shard gets salted sub-partitioning.  Deterministic in
    the seed list, so a resumed run recomputes the identical mapping."""
    counts: dict[str, int] = {}
    n = 0
    for d in domains:
        _, top = split_domain(d)
        counts[top] = counts.get(top, 0) + 1
        n += 1
    threshold = max(16, n // (2 * max(1, num_partitions)))
    return frozenset(t for t, c in counts.items() if c > threshold)
