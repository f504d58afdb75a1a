"""Count-sketch (Charikar, Chen & Farach-Colton, ICALP 2002) -- the
SIGNED cousin of count-min: each key adds +-1 x count to one cell per
row, and the estimate is the MEDIAN of the signed cell reads.  Unlike
count-min's one-sided overestimate, collisions cancel in expectation,
so the estimator is unbiased (error ~ L2 norm instead of L1).

Same mergeable-accumulator protocol as DDSketch / CountMinSketch: cell
state is a linear function of the input multiset, merge = elementwise
addition -- associative, commutative, bit-identical in any order.

Determinism / oracle contract: row d's cell for key x is
``murmur64(x XOR seed_d) % width`` (murmur64 == DuckDB ``hash()``),
and the sign is bit 40 of the SAME hash value (independent of the
low-bits cell index for any width <= 2^40), so the DuckDB oracle can
rebuild identical cells AND signs in SQL.  With odd depth the median
is the exact middle order statistic (for depth 3:
sum - max - min), an integer expressible in SQL via
greatest/least -- no interpolation anywhere.
"""

from __future__ import annotations

import numpy as np

from ..hashing import murmur64

# one xor seed per row (mirrored in oracle SQL); odd count -> exact median
DEFAULT_SEEDS = (0x9E3779B9, 0x7F4A7C15, 0x2545F491)

SIGN_BIT = 40


class CountSketch:
    __slots__ = ("width", "depth", "seeds", "table", "n")

    def __init__(self, width: int = 1024, depth: int = 3,
                 seeds: tuple[int, ...] = DEFAULT_SEEDS):
        if depth > len(seeds):
            raise ValueError("need one seed per row")
        if depth % 2 == 0:
            raise ValueError("depth must be odd (exact median)")
        self.width = int(width)
        self.depth = int(depth)
        self.seeds = tuple(int(s) for s in seeds[:depth])
        self.table = np.zeros((self.depth, self.width), dtype=np.int64)
        self.n = 0

    def _cells_signs(self, keys: np.ndarray, d: int):
        k = np.asarray(keys, dtype=np.int64)
        h = murmur64(k ^ np.int64(self.seeds[d]))
        cells = (h % np.uint64(self.width)).astype(np.int64)
        signs = 1 - 2 * ((h >> np.uint64(SIGN_BIT))
                         & np.uint64(1)).astype(np.int64)
        return cells, signs

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
            cells, signs = self._cells_signs(keys, d)
            np.add.at(self.table[d], cells, signs * counts)
        self.n += int(counts.sum())

    # -- merge -------------------------------------------------------------

    def merge(self, other: "CountSketch") -> "CountSketch":
        if (other.width, other.depth, other.seeds) != (
                self.width, self.depth, self.seeds):
            raise ValueError("cannot merge count sketches with "
                             "different parameters")
        self.table += other.table
        self.n += other.n
        return self

    def copy(self) -> "CountSketch":
        c = CountSketch(self.width, self.depth, self.seeds)
        c.table = self.table.copy()
        c.n = self.n
        return c

    # -- query -------------------------------------------------------------

    def estimate(self, keys) -> np.ndarray:
        """Unbiased point estimates: exact median over the depth signed
        cell reads (odd depth -> an integer order statistic)."""
        keys = np.asarray(keys, dtype=np.int64)
        reads = np.empty((self.depth, keys.shape[0]), dtype=np.int64)
        for d in range(self.depth):
            cells, signs = self._cells_signs(keys, d)
            reads[d] = signs * self.table[d][cells]
        return np.sort(reads, axis=0)[self.depth // 2]

    # -- (de)serialisation for shuffle rows ---------------------------------

    def to_row(self) -> dict:
        return {"width": self.width, "depth": self.depth,
                "seeds": list(self.seeds), "n": self.n,
                "table": self.table.tobytes()}

    @classmethod
    def from_row(cls, row: dict) -> "CountSketch":
        s = cls(row["width"], row["depth"], tuple(row["seeds"]))
        s.table = np.frombuffer(
            row["table"], dtype=np.int64).reshape(
            row["depth"], row["width"]).copy()
        s.n = int(row["n"])
        return s
