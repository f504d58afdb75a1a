"""KLL rank/quantile sketch (Karnin, Lang, Liberty, FOCS 2016) -- the
comparison-based quantile sketch complementing DDSketch (north-star
addition, BASELINE.json): uniform RANK error vs DDSketch's relative VALUE
error, works for any totally ordered data, no distribution assumptions.

Compaction coin flips use a counter-seeded splitmix64, so a single
instance is reproducible run-to-run; unlike DDSketch/HLL/CMS/Bloom the
final state depends on merge ORDER (inherent to randomized compaction) --
only statistical guarantees, not bit-identity, are promised or tested.
"""

from __future__ import annotations

import math

import numpy as np

from ..hashing import splitmix64


class KLLSketch:
    __slots__ = ("k", "seed", "compactors", "n", "_coin_counter")

    def __init__(self, k: int = 200, seed: int = 1):
        self.k = int(k)
        self.seed = int(seed)
        self.compactors: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self._coin_counter = 0

    # -- internals ---------------------------------------------------------

    def _capacity(self, level: int) -> int:
        h = len(self.compactors)
        return max(2, int(math.ceil(self.k * (2.0 / 3.0) ** (h - 1 - level))))

    def _total(self) -> int:
        return sum(c.shape[0] for c in self.compactors)

    def _coin(self) -> int:
        self._coin_counter += 1
        return int(splitmix64(np.asarray([self._coin_counter], dtype=np.int64),
                              seed=self.seed)[0] & np.uint64(1))

    def _compress(self) -> None:
        while self._total() > sum(self._capacity(l)
                                  for l in range(len(self.compactors))):
            for level in range(len(self.compactors)):
                if self.compactors[level].shape[0] > self._capacity(level):
                    self._compact_level(level)
                    break
            else:
                break

    def _compact_level(self, level: int) -> None:
        items = np.sort(self.compactors[level])
        if items.shape[0] < 2:
            return
        if level + 1 == len(self.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        if items.shape[0] % 2 == 1:
            # odd count: the last unpaired item stays at this level
            leftover, items = items[-1:], items[:-1]
        else:
            leftover = np.empty(0, dtype=np.float64)
        promoted = items[self._coin()::2]
        self.compactors[level] = leftover
        self.compactors[level + 1] = np.concatenate(
            [self.compactors[level + 1], promoted])

    # -- build / merge ------------------------------------------------------

    def add_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self.compactors[0] = np.concatenate([self.compactors[0], v])
        self.n += int(v.size)
        self._compress()

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        if other.k != self.k:
            raise ValueError("cannot merge KLL sketches with different k")
        while len(self.compactors) < len(other.compactors):
            self.compactors.append(np.empty(0, dtype=np.float64))
        for level, items in enumerate(other.compactors):
            self.compactors[level] = np.concatenate(
                [self.compactors[level], items])
        self.n += other.n
        self._compress()
        return self

    def copy(self) -> "KLLSketch":
        c = KLLSketch(self.k, self.seed)
        c.compactors = [a.copy() for a in self.compactors]
        c.n = self.n
        c._coin_counter = self._coin_counter
        return c

    # -- query --------------------------------------------------------------

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals, wts = [], []
        for level, items in enumerate(self.compactors):
            if items.shape[0]:
                vals.append(items)
                wts.append(np.full(items.shape[0], 1 << level,
                                   dtype=np.int64))
        if not vals:
            raise ValueError("empty sketch")
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="mergesort")
        return v[order], w[order]

    def quantile(self, q: float) -> float:
        if not (0.0 <= q <= 1.0):
            raise ValueError("q must be in [0, 1]")
        v, w = self._weighted()
        cum = np.cumsum(w)
        target = q * (self.n - 1)
        idx = int(np.searchsorted(cum, target, side="right"))
        return float(v[min(idx, v.shape[0] - 1)])

    def rank(self, value: float) -> float:
        """Estimated fraction of items <= value."""
        v, w = self._weighted()
        return float(w[v <= value].sum() / max(1, self.n))

    # -- serialization ------------------------------------------------------

    def to_row(self) -> dict:
        return {"k": self.k, "seed": self.seed, "n": self.n,
                "coin": self._coin_counter,
                "levels": [a.copy() for a in self.compactors]}

    @classmethod
    def from_row(cls, row: dict) -> "KLLSketch":
        s = cls(int(row["k"]), int(row["seed"]))
        s.compactors = [np.asarray(a, dtype=np.float64).copy()
                        for a in row["levels"]]
        s.n = int(row["n"])
        s._coin_counter = int(row["coin"])
        return s

    def __repr__(self) -> str:
        return (f"KLLSketch(k={self.k}, n={self.n}, "
                f"levels={len(self.compactors)}, stored={self._total()})")
