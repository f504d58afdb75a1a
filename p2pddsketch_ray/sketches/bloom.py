"""Bloom filter -- north-star addition (BASELINE.json); mergeable
accumulator (merge = bitwise OR: associative, commutative, idempotent,
bit-identical under any merge order).

Primary engine use: broadcast semi-join prefilter -- build over the small
side's keys, ``ray.put`` the (m/8)-byte bitmap once, probe inside
``map_batches`` on the big side, then exact-confirm the survivors (so false
positives never reach the output; see pipelines.bloom_join).
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import md5_uint64, murmur64, splitmix64


class BloomFilter:
    __slots__ = ("n_bits", "k", "bits", "n_added")

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        if n_bits % 8:
            raise ValueError("n_bits must be a multiple of 8")
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)
        self.n_added = 0

    @staticmethod
    def sized_for(n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        """Standard sizing: m = -n ln p / (ln 2)^2, k = (m/n) ln 2."""
        import math
        m = max(64, int(-n_items * math.log(fp_rate) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / max(1, n_items) * math.log(2)))
        return BloomFilter(m, k)

    def _base_hashes(self, values) -> np.ndarray:
        if np.issubdtype(np.asarray(values).dtype, np.integer):
            return murmur64(np.asarray(values, dtype=np.int64))
        return md5_uint64(values)

    def _positions(self, h: np.ndarray, i: int) -> np.ndarray:
        return (splitmix64(h.view(np.int64), seed=i)
                % np.uint64(self.n_bits)).astype(np.int64)

    # -- build -------------------------------------------------------------

    def add_batch(self, values) -> None:
        if len(values) == 0:
            return
        h = self._base_hashes(values)
        for i in range(self.k):
            pos = self._positions(h, i)
            np.bitwise_or.at(self.bits, pos >> 3,
                             np.left_shift(np.uint8(1),
                                           (pos & 7).astype(np.uint8)))
        self.n_added += len(values)

    # -- query -------------------------------------------------------------

    def contains_batch(self, values) -> np.ndarray:
        """Boolean array: True = possibly present, False = definitely not."""
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        h = self._base_hashes(values)
        out = np.ones(len(values), dtype=bool)
        for i in range(self.k):
            pos = self._positions(h, i)
            bit = (self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
            out &= bit.astype(bool)
        return out

    # -- merge -------------------------------------------------------------

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (other.n_bits, other.k) != (self.n_bits, self.k):
            raise ValueError("cannot merge Bloom filters with different "
                             "parameters")
        np.bitwise_or(self.bits, other.bits, out=self.bits)
        self.n_added += other.n_added
        return self

    def copy(self) -> "BloomFilter":
        c = BloomFilter(self.n_bits, self.k)
        c.bits = self.bits.copy()
        c.n_added = self.n_added
        return c

    # -- serialization -----------------------------------------------------

    def to_row(self) -> dict:
        return {"n_bits": self.n_bits, "k": self.k, "n_added": self.n_added,
                "bits": self.bits.copy()}

    @classmethod
    def from_row(cls, row: dict) -> "BloomFilter":
        b = cls(int(row["n_bits"]), int(row["k"]))
        b.bits = np.asarray(row["bits"], dtype=np.uint8).copy()
        b.n_added = int(row["n_added"])
        return b

    def to_bytes(self) -> bytes:
        return struct.pack("<qqq", self.n_bits, self.k,
                           self.n_added) + self.bits.tobytes()

    def __repr__(self) -> str:
        fill = float((np.unpackbits(self.bits) == 1).mean())
        return (f"BloomFilter(n_bits={self.n_bits}, k={self.k}, "
                f"fill={fill:.3f})")
