"""Cuckoo filter: the deletable alternative to the Bloom pre-filter
(north rule: "sharded Bloom/cuckoo URL-seen filter").

Same contract as operators.bloom — approximate membership with NO false
negatives, broadcast as the URL-seen pre-filter while the partitioned
``seen`` table stays the exactness path — plus O(1) deletion, which a
recrawl scheduler needs when URLs are re-enqueued after TTL expiry
(a Bloom cannot unlearn).

Layout: ``m`` buckets x 4 slots of uint16 fingerprints (0 = empty).
An item hashes to bucket ``i1 = h(x) % m`` and its partner
``i2 = i1 XOR h(fp) % m`` (partial-key cuckoo hashing, Fan et al. 2014
— the XOR trick lets relocation work from the fingerprint alone, which
also makes filters mergeable slot-by-slot).  Lookups are fully
vectorized (fancy indexing over both candidate buckets); inserts do a
bounded random-walk eviction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_HASH_KEY = "0123456789123456"
_FP_KEY = "abcdefabcdefabcd"
BUCKET_SLOTS = 4
MAX_KICKS = 500


def _hash_u64(values: pd.Series, key: str) -> np.ndarray:
    return pd.util.hash_pandas_object(
        values.astype("object"), index=False, hash_key=key
    ).to_numpy()


class CuckooFilter:
    def __init__(self, capacity: int, seed: int = 7):
        # ~95% load max for b=4; headroom so inserts don't thrash
        n_buckets = max(8, int(capacity / (BUCKET_SLOTS * 0.84)))
        self.m = 1 << int(np.ceil(np.log2(n_buckets)))  # power of two: XOR stays in range
        self.buckets = np.zeros((self.m, BUCKET_SLOTS), dtype=np.uint16)
        self.rng = np.random.default_rng(seed)
        self.n_items = 0
        # no-false-negatives contract: once any insert fails (table
        # full), the filter degrades to all-pass — dropping a
        # fingerprint would make might_contain return False for a
        # present key, and the frontier routes ~might_contain rows
        # around the exact anti-join (plans/frontier.py candidate
        # admission), so a false negative would re-admit a seen URL
        self.overflowed = False

    # -- hashing -----------------------------------------------------------
    def _fingerprints(self, values: pd.Series) -> np.ndarray:
        fp = (_hash_u64(values, _FP_KEY) % np.uint64(65535)).astype(np.uint16)
        return fp + 1  # never 0 (0 = empty slot)

    def _index1(self, values: pd.Series) -> np.ndarray:
        return (_hash_u64(values, _HASH_KEY) % np.uint64(self.m)).astype(np.int64)

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        # partner bucket from fingerprint alone (works during relocation)
        fp_hash = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) % np.uint64(self.m)
        return (idx.astype(np.uint64) ^ fp_hash).astype(np.int64) % self.m

    # -- ops ---------------------------------------------------------------
    def _insert_fp(self, i1: int, fp: int) -> bool:
        i2 = int(self._alt_index(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            row = self.buckets[i]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                return True
        i = int(self.rng.choice((i1, i2)))
        for _ in range(MAX_KICKS):
            slot = int(self.rng.integers(BUCKET_SLOTS))
            fp, self.buckets[i, slot] = int(self.buckets[i, slot]), fp
            i = int(self._alt_index(np.array([i]), np.array([fp], dtype=np.uint16))[0])
            row = self.buckets[i]
            free = np.nonzero(row == 0)[0]
            if len(free):
                row[free[0]] = fp
                return True
        return False  # table full — caller should have sized capacity

    def add(self, values: pd.Series) -> int:
        """Insert a batch; returns number successfully placed.  A failed
        placement sets ``overflowed`` (filter degrades to all-pass)."""
        if len(values) == 0:
            return 0
        fps = self._fingerprints(values)
        i1s = self._index1(values)
        ok = 0
        for i1, fp in zip(i1s, fps):
            if self._insert_fp(int(i1), int(fp)):
                ok += 1
            else:
                self.overflowed = True
        self.n_items += ok
        return ok

    def might_contain(self, values: pd.Series) -> np.ndarray:
        if self.overflowed:
            # degrade to pass-through: every probe takes the exact
            # anti-join path, preserving correctness at reduced speed
            return np.ones(len(values), dtype=bool)
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fingerprints(values)
        i1 = self._index1(values)
        i2 = self._alt_index(i1, fps)
        hit1 = (self.buckets[i1] == fps[:, None]).any(axis=1)
        hit2 = (self.buckets[i2] == fps[:, None]).any(axis=1)
        return hit1 | hit2

    def delete(self, values: pd.Series) -> int:
        """Remove one matching fingerprint per value; returns removals.
        (Only delete values that were actually added — cuckoo semantics.)"""
        removed = 0
        if len(values) == 0:
            return 0
        fps = self._fingerprints(values)
        i1s = self._index1(values)
        i2s = self._alt_index(i1s, fps)
        for i1, i2, fp in zip(i1s, i2s, fps):
            for i in (int(i1), int(i2)):
                slots = np.nonzero(self.buckets[i] == fp)[0]
                if len(slots):
                    self.buckets[i, slots[0]] = 0
                    removed += 1
                    break
        self.n_items -= removed
        return removed

    def merge(self, other: "CuckooFilter") -> "CuckooFilter":
        """Fold another filter's fingerprints in (slot-level re-insert;
        possible because the partner index derives from fp alone).
        Only successful placements count; a failure overflows self."""
        assert self.m == other.m
        if other.overflowed:
            self.overflowed = True
        idx, slot = np.nonzero(other.buckets)
        for i, s in zip(idx, slot):
            if self._insert_fp(int(i), int(other.buckets[i, s])):
                self.n_items += 1
            else:
                self.overflowed = True
        return self

    @property
    def nbytes(self) -> int:
        return self.buckets.nbytes
