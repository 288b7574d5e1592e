"""Exact MurmurHash3_128 keyword-identity parity.

The reference folds canonical murmur3 x64_128 (Austin Appleby's public-
domain MurmurHash3.cpp) to 64 bits via h1^h2 and seeds the keyword
variant with Java String.hashCode() (third-party/commons-codec
MurmurHash3_128.java).  Here the port in functions/hashing.py is pinned
against:

- an INDEPENDENT translation of the canonical x64_128 algorithm written
  below directly from the public reference (struct-based, returns the
  full 128-bit pair) — two independently-derived implementations must
  agree on the fold across random byte strings;
- known Java String.hashCode() vectors ("hello" = 99162322, the famous
  "Aa"/"BB" = 2112 collision);
- hand-checked tail/length edge cases (0..33 bytes crosses every switch
  arm and the two-block boundary).
"""

from __future__ import annotations

import random
import struct

from hypothesis import given, settings
from hypothesis import strategies as st

from marginaliasearch_ray.functions.hashing import (
    MURMUR_DEFAULT_SEED,
    hash_keyword,
    hash_lower_bytes,
    hash_nearly_ascii,
    java_string_hashcode,
    murmur128_fold64,
)

M64 = (1 << 64) - 1


def _canonical_x64_128(key: bytes, seed: int) -> tuple[int, int]:
    """Independent translation of MurmurHash3_x64_128 from the public
    reference implementation (MurmurHash3.cpp), full 128-bit result."""

    def rotl(x, r):
        return ((x << r) & M64) | (x >> (64 - r))

    def fmix(k):
        k ^= k >> 33
        k = (k * 0xFF51AFD7ED558CCD) & M64
        k ^= k >> 33
        k = (k * 0xC4CEB9FE1A85EC53) & M64
        k ^= k >> 33
        return k

    c1, c2 = 0x87C37B91114253D5, 0x4CF5AD432745937F
    h1 = h2 = seed & M64
    nblocks = len(key) // 16
    for k1, k2 in struct.iter_unpack("<qq", key[: nblocks * 16]):
        k1 &= M64
        k2 &= M64
        k1 = (rotl((k1 * c1) & M64, 31) * c2) & M64
        h1 = ((rotl(h1 ^ k1, 27) + h2) * 5 + 0x52DCE729) & M64
        k2 = (rotl((k2 * c2) & M64, 33) * c1) & M64
        h2 = ((rotl(h2 ^ k2, 31) + h1) * 5 + 0x38495AB5) & M64
    tail = key[nblocks * 16 :]
    k1 = k2 = 0
    for i in range(len(tail) - 1, 7, -1):
        k2 = (k2 << 8) | tail[i]
    if len(tail) > 8:
        h2 ^= (rotl((k2 * c2) & M64, 33) * c1) & M64
    for i in range(min(len(tail), 8) - 1, -1, -1):
        k1 = (k1 << 8) | tail[i]
    if tail:
        h1 ^= (rotl((k1 * c1) & M64, 31) * c2) & M64
    h1 ^= len(key)
    h2 ^= len(key)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    h1, h2 = fmix(h1), fmix(h2)
    h1 = (h1 + h2) & M64
    h2 = (h2 + h1) & M64
    return h1, h2


def test_java_string_hashcode_vectors():
    assert java_string_hashcode("") == 0
    assert java_string_hashcode("a") == 97
    assert java_string_hashcode("hello") == 99162322
    # the classic collision pair
    assert java_string_hashcode("Aa") == 2112
    assert java_string_hashcode("BB") == 2112
    # 32-bit overflow wraps negative
    assert java_string_hashcode("zzzzzzzzzz") == -1580979136


def test_fold_matches_independent_implementation_edges():
    rng = random.Random(99)
    for ln in range(0, 34):
        for seed in (0, MURMUR_DEFAULT_SEED, -1 & M64, 99162322):
            data = bytes(rng.randrange(256) for _ in range(ln))
            h1, h2 = _canonical_x64_128(data, seed)
            assert murmur128_fold64(data, seed) == h1 ^ h2, (ln, seed)


@settings(max_examples=300, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(0, M64))
def test_fold_matches_independent_implementation(data, seed):
    h1, h2 = _canonical_x64_128(data, seed)
    assert murmur128_fold64(data, seed) == h1 ^ h2


def test_keyword_hash_is_signed_and_low_byte_fed():
    for w in ("hello", "", "a", "the quick brown fox", "xn--sm-lka"):
        v = hash_keyword(w)
        assert -(1 << 63) <= v < (1 << 63)
        # ascii words: low bytes of UTF-16 units == latin-1 bytes
        h1, h2 = _canonical_x64_128(
            w.encode("latin-1"), java_string_hashcode(w) & M64
        )
        expect = h1 ^ h2
        if expect >= 1 << 63:
            expect -= 1 << 64
        assert v == expect


def test_non_ascii_uses_utf16_low_bytes():
    # 'é' = U+00E9 -> one UTF-16 unit, low byte 0xE9;
    # '𝄞' = U+1D11E -> surrogate pair D834/DD1E -> low bytes 0x34, 0x1E
    s = "é𝄞"
    seed = java_string_hashcode(s) & M64
    h1, h2 = _canonical_x64_128(bytes([0xE9, 0x34, 0x1E]), seed)
    expect = h1 ^ h2
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert hash_nearly_ascii(s) == expect


def test_lower_bytes_variant_uses_default_seed():
    h1, h2 = _canonical_x64_128(b"anchor text", MURMUR_DEFAULT_SEED)
    expect = h1 ^ h2
    if expect >= 1 << 63:
        expect -= 1 << 64
    assert hash_lower_bytes("anchor text") == expect
