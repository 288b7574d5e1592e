"""Numpy-backed cuckoo filter for frontier URL-seen fast-path checks.

At 10^10-URL scale an exact per-URL hash set costs ~80 GB+ per full
frontier; a cuckoo filter with 16-bit fingerprints and 4-way buckets at
95% load holds the same membership approximately in ~2.4 bytes/URL with a
~2^-13 false-positive rate.  The engine uses the filter as a fast-path
pre-check, confirming positives against the shard's exact per-domain sets
(mirroring the reference's exact Long2BooleanOpenHashMap,
DomainCrawlFrontier.java:29-34) so a false positive can never drop a URL
— see SURVEY.md §7 "Mid-superstep determinism".

Serializable to bytes for per-partition checkpointing.
"""

from __future__ import annotations

import numpy as np

_SLOTS = 4
_MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        # buckets sized to next power of two of capacity/slots at ~95% load
        n_buckets = max(16, int(capacity / (_SLOTS * 0.95)))
        n_buckets = 1 << (n_buckets - 1).bit_length()
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        self.count = 0
        self.seed = seed
        self._rng = np.random.default_rng(seed)

    # fingerprint: 16 bits, nonzero
    @staticmethod
    def _fingerprint(h: np.ndarray) -> np.ndarray:
        fp = ((h >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _index1(self, h: np.ndarray) -> np.ndarray:
        return (h & np.uint64(self.n_buckets - 1)).astype(np.int64)

    def _index2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partner bucket: i XOR hash(fp)
        fph = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & np.uint64(
            self.n_buckets - 1
        )
        return (i1.astype(np.uint64) ^ fph).astype(np.int64)

    def add_many(self, hashes: np.ndarray) -> int:
        """Insert 64-bit hashes; returns number inserted (drops on overflow
        are acceptable: the exact set is authoritative)."""
        h = np.asarray(hashes, dtype=np.uint64)
        fps = self._fingerprint(h)
        i1s = self._index1(h)
        inserted = 0
        for fp, i1 in zip(fps, i1s):
            if self._add_one(int(fp), int(i1)):
                inserted += 1
        self.count += inserted
        return inserted

    def _add_one(self, fp: int, i1: int) -> bool:
        i2 = int(self._index2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        # kick loop
        idx = i1 if self._rng.integers(2) else i2
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = int(
                self._index2(np.array([idx]), np.array([fp], dtype=np.uint16))[0]
            )
            row = self.table[idx]
            empty = np.where(row == 0)[0]
            if empty.size:
                row[empty[0]] = fp
                return True
        return False  # table too full; caller falls back to exact set

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership check -> bool array (false positives possible)."""
        h = np.asarray(hashes, dtype=np.uint64)
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._index2(i1, fp)
        t = self.table
        hit = np.zeros(h.shape, dtype=bool)
        for s in range(_SLOTS):
            hit |= t[i1, s] == fp
            hit |= t[i2, s] == fp
        return hit

    # -- scalar fast paths (hot in the frontier admission loop: creating a
    # numpy array per single membership test costs ~10x the test itself) --

    def contains_one(self, h: int) -> bool:
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        mask = self.n_buckets - 1
        i1 = h & mask
        i2 = i1 ^ ((fp * 0x5BD1E995) & mask)
        t = self.table
        row1 = t[i1]
        row2 = t[i2]
        return (
            row1[0] == fp or row1[1] == fp or row1[2] == fp or row1[3] == fp
            or row2[0] == fp or row2[1] == fp or row2[2] == fp or row2[3] == fp
        )

    def add_one(self, h: int) -> bool:
        fp = (h >> 48) & 0xFFFF
        if fp == 0:
            fp = 1
        mask = self.n_buckets - 1
        i1 = h & mask
        if self._add_one(fp, i1):
            self.count += 1
            return True
        return False

    # -- checkpointing -----------------------------------------------------

    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, self.count, self.seed], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CuckooFilter":
        head = np.frombuffer(data[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets = int(head[0])
        obj.count = int(head[1])
        obj.seed = int(head[2])
        obj.table = (
            np.frombuffer(data[24:], dtype=np.uint16)
            .reshape(obj.n_buckets, _SLOTS)
            .copy()
        )
        obj._rng = np.random.default_rng(obj.seed)
        return obj
