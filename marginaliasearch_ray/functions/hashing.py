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


def partition_of_domain(host: str, num_partitions: int) -> int:
    """Frontier shard for a host: hash(top_domain) % P."""
    _, top = split_domain(host)
    return stable_hash64(top) % num_partitions
