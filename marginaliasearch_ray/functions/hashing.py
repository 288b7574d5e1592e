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

import re
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


# ---------------------------------------------------------------------------
# Exact MurmurHash3_128 keyword identity (third-party/commons-codec
# MurmurHash3_128.java:23-299).  The reference's index identifies every
# keyword by ``hashKeyword`` = the 128-bit murmur folded to 64 bits by
# ``h1 ^ h2`` (java:174, a non-standard fold), seeded with Java
# ``String.hashCode()`` and fed the LOW BYTE of each UTF-16 code unit
# (the "nearly ASCII" variant, KeywordHasher.java AsciiIsh — the default
# configuration).  These term ids are what IndexJournalSlopWriter.java:76
# writes to the journal and SearchContext.java resolves queries against,
# so exact parity here is exact index-identity parity.

_MC1 = 0x87C37B91114253D5
_MC2 = 0x4CF5AD432745937F
_M64 = (1 << 64) - 1


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * 0xFF51AFD7ED558CCD) & _M64
    h ^= h >> 33
    h = (h * 0xC4CEB9FE1A85EC53) & _M64
    h ^= h >> 33
    return h


def murmur128_fold64(data: bytes, seed: int) -> int:
    """MurmurHash3_128.hash64 (java:177-267): canonical murmur3 x64_128
    body/tail/finalization, returning the reference's h1^h2 fold as an
    UNSIGNED 64-bit int (mask the caller's way to signed if needed)."""
    h1 = h2 = seed & _M64
    ln = len(data)
    nblocks = ln >> 4
    for i in range(nblocks):
        idx = i << 4
        k1 = int.from_bytes(data[idx : idx + 8], "little")
        k2 = int.from_bytes(data[idx + 8 : idx + 16], "little")
        k1 = _rotl64((k1 * _MC1) & _M64, 31)
        k1 = (k1 * _MC2) & _M64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = _rotl64((k2 * _MC2) & _M64, 33)
        k2 = (k2 * _MC1) & _M64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks << 4 :]
    tl = len(tail)
    if tl > 8:
        k2 = 0
        for j in range(tl - 1, 7, -1):
            k2 = (k2 << 8) | tail[j]
        k2 = _rotl64((k2 * _MC2) & _M64, 33)
        k2 = (k2 * _MC1) & _M64
        h2 ^= k2
    if tl > 0:
        k1 = 0
        for j in range(min(tl, 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[j]
        k1 = _rotl64((k1 * _MC1) & _M64, 31)
        k1 = (k1 * _MC2) & _M64
        h1 ^= k1
    h1 ^= ln
    h2 ^= ln
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1 ^ h2


def _utf16_units(s: str) -> bytes:
    """Per-unit low bytes: charAt(i) & 0xff over the UTF-16 code units
    (getLittleEndianLong(CharSequence), java:269-278)."""
    return s.encode("utf-16-be")[1::2]


def java_string_hashcode(s: str) -> int:
    """Java String.hashCode(): h = 31*h + charAt(i) over UTF-16 units,
    32-bit signed overflow."""
    h = 0
    units = s.encode("utf-16-be")
    for i in range(0, len(units), 2):
        h = (31 * h + int.from_bytes(units[i : i + 2], "big")) & 0xFFFFFFFF
    return h - (1 << 32) if h & 0x80000000 else h


MURMUR_DEFAULT_SEED = 104729  # MurmurHash3_128.DEFAULT_SEED


def _signed64(v: int) -> int:
    return v - (1 << 64) if v & (1 << 63) else v


def hash_lower_bytes(s: str) -> int:
    """hashLowerBytes (java:48-50): DEFAULT_SEED over char low bytes
    (AtagExporter.java:177 dedup key).  Signed 64-bit like Java long."""
    return _signed64(murmur128_fold64(_utf16_units(s), MURMUR_DEFAULT_SEED))


def hash_nearly_ascii(s: str) -> int:
    """hashNearlyASCII (java:56-58): seeded with String.hashCode()
    (sign-extended to 64 bits) over char low bytes."""
    return _signed64(murmur128_fold64(_utf16_units(s), java_string_hashcode(s)))


def hash_keyword(s: str) -> int:
    """KeywordHasher.AsciiIsh / MurmurHash3_128.hashKeyword in the
    default (flatten-unicode) configuration: the reference's 64-bit
    keyword term id."""
    return hash_nearly_ascii(s)


# ---------------------------------------------------------------------------
# TermFrequencyDict.longHash (language-processing term_frequency_dict/
# TermFrequencyDict.java:106-128) — the polynomial string hash keying
# the query service's term-frequency dictionary (freqs.dat).  Java
# arithmetic reproduced exactly: SIGNED bytes (UTF-8), 64-bit wrapping
# multiply/add, and Java's truncated-toward-zero % (which can go
# negative once a multiply has wrapped).


def _wrap64_signed(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x & (1 << 63) else x


def _jmod(x: int, m: int) -> int:
    # Java % truncates toward zero
    r = abs(x) % m
    return -r if x < 0 else r


def tfd_long_hash(*byte_sets: bytes) -> int:
    """longHash(byte[]...) — p=127 polynomial over signed bytes mod
    2^61-1, with the p-power stream continuing across byte sets."""
    p = 127
    m = (1 << 61) - 1
    p_power = 1
    hash_val = 0
    for bs in byte_sets:
        for b in bs:
            e = b - 256 if b >= 128 else b
            hash_val = _jmod(
                _wrap64_signed(hash_val + _wrap64_signed((e + 1) * p_power)), m
            )
            p_power = _jmod(_wrap64_signed(p_power * p), m)
    return hash_val


# per-process memo: the polynomial hash is pure Python and the tf-idf
# extractor probes it once per candidate stem per document — the same
# stems recur across a corpus (vocabulary-bounded; cleared on overflow)
_TFD_HASH_CACHE: dict[str, int] = {}
_TFD_HASH_CACHE_MAX = 500_000


def tfd_term_freq_hash_stemmed(stem: str) -> int:
    """getTermFreqStemmed's key: longHash over the UTF-8 bytes of the
    already-stemmed term (TermFrequencyDict.java:83-85)."""
    hit = _TFD_HASH_CACHE.get(stem)
    if hit is None:
        if len(_TFD_HASH_CACHE) >= _TFD_HASH_CACHE_MAX:
            _TFD_HASH_CACHE.clear()
        hit = _TFD_HASH_CACHE[stem] = tfd_long_hash(stem.encode("utf-8"))
    return hit


def tfd_string_hash(s: str) -> int:
    """getStringHash (TermFrequencyDict.java:92-104): multi-part terms
    split on space/underscore and stem per part, continuing one rolling
    hash; single terms hash their raw bytes UNstemmed."""
    from .stem import porter_stem

    if " " in s or "_" in s:
        parts = [p for p in re.split(r"[ _]+", s) if p]
        return tfd_long_hash(*(porter_stem(p).encode("utf-8") for p in parts))
    return tfd_long_hash(s.encode("utf-8"))
