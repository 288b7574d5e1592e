"""64-bit locality-sensitive hashes (reference EasyLSH semantics).

Two variants from the reference, both numpy-vectorized here:

- ``content_hash(body)``: naive tag-stripped byte-stream LSH used for
  recrawl "is the content the same" checks (hamming < 4 => same);
  reference ``CrawlDataReference.java:84-121``. A rolling 4-byte window
  over non-tag bytes is avalanche-hashed; each hash votes +-1 into one of
  64 counters; the sign bits form the 64-bit LSH (``EasyLSH.java:12-87``).

- ``doc_lsh(words)``: unordered word-set LSH used for within-domain
  near-dup detection (hamming < 2 => dup, reference
  ``LshDocumentDeduplicator.java:11-41``, word hashing per
  ``DocumentLanguageData.localitySensitiveHashCode``). We hash lowercase
  word tokens with Java's String.hashCode for parity of spirit.
"""

from __future__ import annotations

import numpy as np

_U32 = np.uint32
_MUL = _U32(0x45D9F3B)


def _hash_int_vec(x: np.ndarray) -> np.ndarray:
    """Integer avalanche hash (CrawlDataReference.hashInt), vectorized."""
    x = x.astype(_U32, copy=False)
    with np.errstate(over="ignore"):
        x = ((x >> _U32(16)) ^ x) * _MUL
        x = ((x >> _U32(16)) ^ x) * _MUL
        x = (x >> _U32(16)) ^ x
    return x


def _fold_lsh(hashes: np.ndarray) -> int:
    """EasyLSH.addHashUnordered folding: value=1-(h&2) into field index
    derived from xor-shifted bits; result = 64 sign bits."""
    if hashes.size == 0:
        return 0
    h = hashes.astype(_U32, copy=False)
    value = np.int64(1) - (h & _U32(2)).astype(np.int64)  # +1 or -1
    field = (
        (h >> _U32(2))
        ^ (h >> _U32(8))
        ^ (h >> _U32(14))
        ^ (h >> _U32(20))
        ^ (h >> _U32(26))
    ) & _U32(63)
    # Java: bit = (int fields[i]) >>> 31 — set iff the vote sum is
    # negative.  One weighted bincount (exact: ±1 sums in float64).
    sums = np.bincount(field, weights=value, minlength=64)
    return int.from_bytes(np.packbits(sums < 0).tobytes(), "big")


def content_hash(body: bytes) -> int:
    """Tag-stripped byte-stream LSH (CrawlDataReference.contentHash)."""
    if not body:
        return 0
    arr = np.frombuffer(body, dtype=np.uint8)
    # mark tag regions: depth toggles at '<' ... '>'
    lt = arr == 0x3C  # '<'
    gt = arr == 0x3E  # '>'
    # The reference toggles an in-tag flag: set on '<', cleared on '>'.
    # in_tag(i) = (index of latest '<' at or before i) > (latest '>').
    idx = np.arange(arr.size, dtype=np.int64)
    last_lt = np.maximum.accumulate(np.where(lt, idx, np.int64(-1)))
    last_gt = np.maximum.accumulate(np.where(gt, idx, np.int64(-1)))
    keep = (last_lt <= last_gt) & ~gt  # '<'/'>' bytes and tag interiors skipped
    f = arr[keep].astype(_U32)
    if f.size == 0:
        return 0
    # rolling 32-bit window: next_i = b[i] | b[i-1]<<8 | b[i-2]<<16 | b[i-3]<<24
    # built with in-place shifted-slice ORs (no zeros_like scratch arrays)
    nxt = f.copy()
    if f.size > 1:
        nxt[1:] |= f[:-1] << _U32(8)
    if f.size > 2:
        nxt[2:] |= f[:-2] << _U32(16)
    if f.size > 3:
        nxt[3:] |= f[:-3] << _U32(24)
    return _fold_lsh(_hash_int_vec(nxt))


def java_string_hash(s: str) -> int:
    """Java String.hashCode (int32)."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - 0x100000000 if h >= 0x80000000 else h


# word -> uint32 Java hash memo: natural-language vocabulary is Zipfian,
# so across a converter actor's lifetime the hit rate is ~99%; bounded to
# keep long-lived actors from growing without limit
_WORD_HASH_CACHE: dict = {}
_WORD_HASH_CACHE_MAX = 1 << 20


def doc_lsh(words: list[str]) -> int:
    """Unordered word LSH over lowercase tokens."""
    if not words:
        return 0
    cache = _WORD_HASH_CACHE
    if len(cache) > _WORD_HASH_CACHE_MAX:
        cache.clear()
    misses = [w for w in words if w not in cache]
    for w in misses:
        cache[w] = java_string_hash(w) & 0xFFFFFFFF
    hashes = np.fromiter((cache[w] for w in words), dtype=np.uint32, count=len(words))
    return _fold_lsh(hashes)


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def hamming64_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized hamming distance between uint64 arrays (popcount via
    uint8 view + unpackbits)."""
    x = (np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))
    v = x.view(np.uint8).reshape(len(x), 8)
    return np.unpackbits(v, axis=1).sum(axis=1).astype(np.int64)
