"""Count-min sketch (Cormode & Muthukrishnan, J.Alg 2005) -- north-star
addition (BASELINE.json); same mergeable-accumulator protocol as DDSketch.

Counter state is a linear function of the input multiset (every cell is a
sum), so merge = elementwise addition: associative, commutative, and with
integer counts bit-identical for any merge order.

Row d's cell for key x is ``murmur64(x XOR seed_d) % width`` -- murmur64
is the DuckDB ``hash()`` replica, and XOR/modulo are exactly expressible in
SQL, so the driver's oracle can rebuild the identical counter cells with
``hash(xor(col, seed_d)) % width``.
"""

from __future__ import annotations

import struct

import numpy as np

from ..hashing import murmur64

# fixed per-row xor seeds (arbitrary odd constants, mirrored in oracle SQL)
DEFAULT_SEEDS = (0x1B873593, 0xCC9E2D51, 0x85EBCA6B, 0xC2B2AE35)


class CountMinSketch:
    __slots__ = ("width", "depth", "seeds", "table", "n")

    def __init__(self, width: int = 8192, depth: int = 4,
                 seeds: tuple[int, ...] = DEFAULT_SEEDS):
        if depth > len(seeds):
            raise ValueError("need one seed per row")
        self.width = int(width)
        self.depth = int(depth)
        self.seeds = tuple(int(s) for s in seeds[:depth])
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0

    def _cells(self, keys: np.ndarray, d: int) -> np.ndarray:
        k = np.asarray(keys, dtype=np.int64)
        return (murmur64(k ^ np.int64(self.seeds[d]))
                % np.uint64(self.width)).astype(np.int64)

    # -- build -------------------------------------------------------------

    def add_batch(self, keys, counts=None) -> None:
        keys = np.asarray(keys, dtype=np.int64)
        if keys.size == 0:
            return
        if counts is None:
            counts = np.ones(keys.shape[0], dtype=np.int64)
        else:
            counts = np.asarray(counts, dtype=np.int64)
        for d in range(self.depth):
            np.add.at(self.table[d], self._cells(keys, d), counts)
        self.n += int(counts.sum())

    # -- merge -------------------------------------------------------------

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (other.width, other.depth, other.seeds) != (self.width, self.depth,
                                                       self.seeds):
            raise ValueError("cannot merge count-min sketches with "
                             "different parameters")
        self.table += other.table
        self.n += other.n
        return self

    def copy(self) -> "CountMinSketch":
        c = CountMinSketch(self.width, self.depth, self.seeds)
        c.table = self.table.copy()
        c.n = self.n
        return c

    # -- query -------------------------------------------------------------

    def estimate(self, keys) -> np.ndarray:
        """Point-query estimates: min over rows (>= true count)."""
        keys = np.asarray(keys, dtype=np.int64)
        ests = np.stack([self.table[d][self._cells(keys, d)]
                         for d in range(self.depth)])
        return ests.min(axis=0)

    # -- serialization -----------------------------------------------------

    def to_row(self) -> dict:
        return {"width": self.width, "depth": self.depth,
                "seeds": list(self.seeds), "n": self.n,
                "table": self.table.reshape(-1).copy()}

    @classmethod
    def from_row(cls, row: dict) -> "CountMinSketch":
        c = cls(int(row["width"]), int(row["depth"]), tuple(row["seeds"]))
        c.table = np.asarray(row["table"], dtype=np.int64).reshape(
            c.depth, c.width).copy()
        c.n = int(row["n"])
        return c

    def to_bytes(self) -> bytes:
        header = struct.pack(f"<qqq{self.depth}q", self.width, self.depth,
                             self.n, *self.seeds)
        return header + self.table.tobytes()

    def __repr__(self) -> str:
        return (f"CountMinSketch(width={self.width}, depth={self.depth}, "
                f"n={self.n})")
