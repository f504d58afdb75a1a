"""Misra-Gries frequent-items summary (deterministic heavy hitters).

Completes the mergeable-accumulator family (SURVEY.md section 2.4's
``Sketch`` protocol, generalizing the reference's compile-time strategy
families, /root/reference/ddsketch.h:154-251) with the deterministic
counter-based counterpart of count-min: bounded state of at most ``k``
(item, counter) pairs, no hashing, no randomness.

Guarantees (Misra & Gries 1982; batched/merge form per Agarwal et al.,
"Mergeable Summaries", PODS 2012): after any sequence of ``add_batch``
and ``merge`` operations over a multiset of ``n`` items,

* ``estimate(x) <= true_count(x) <= estimate(x) + err`` for every item
  ``x`` (``estimate`` is 0 for items not retained),
* ``err <= n / (k + 1)``,
* therefore every item with ``true_count > err`` (in particular every
  item with ``true_count > n/(k+1)``) is retained in the summary.

The REDUCE step is the batched form: after combining counters, subtract
the (k+1)-th largest counter value from every counter and drop the
non-positive ones -- equivalent to running the classic one-at-a-time
decrement to quiescence, and exactly the PODS'12 mergeable-summary
MERGE, so the guarantee composes across Ray's partial+final tree
combine the same way DDSketch's merge replaces the reference's gossip
rounds (/root/reference/main.cpp:475-658).

Unlike DDSketch/KMV the retained-set is not bit-identical across merge
orders (only the guarantee is order-invariant); pipelines therefore use
the summary as a CANDIDATE GENERATOR and confirm counts with one exact
streaming pass (see pipelines/approx.mg_heavy_users), which makes the
final answer exact and order-independent.
"""

from __future__ import annotations

import numpy as np


class MisraGries:
    """Frequent-items summary over int64 keys with at most k counters."""

    __slots__ = ("k", "keys", "counts", "n", "err")

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("MisraGries needs k >= 1")
        self.k = int(k)
        self.keys = np.empty(0, dtype=np.int64)    # sorted ascending
        self.counts = np.empty(0, dtype=np.int64)  # aligned with keys
        self.n = 0        # total items observed
        self.err = 0      # max undercount of any estimate

    # -- Sketch protocol -------------------------------------------------
    def add_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.int64)
        if v.size == 0:
            return
        uk, cnt = np.unique(v, return_counts=True)
        self.n += int(v.size)
        self._combine(uk, cnt.astype(np.int64))

    def merge(self, other: "MisraGries") -> "MisraGries":
        if other.k != self.k:
            raise ValueError("MisraGries merge requires equal k")
        self.n += other.n
        self.err += other.err
        self._combine(other.keys, other.counts)
        return self

    def _combine(self, keys: np.ndarray, counts: np.ndarray) -> None:
        if keys.size:
            allk = np.concatenate([self.keys, keys])
            allc = np.concatenate([self.counts, counts])
            uk, inv = np.unique(allk, return_inverse=True)
            merged = np.zeros(uk.size, dtype=np.int64)
            np.add.at(merged, inv, allc)
            self.keys, self.counts = uk, merged
        if self.keys.size > self.k:
            # batched decrement: subtract the (k+1)-th largest counter
            pivot = int(np.partition(self.counts,
                                     self.counts.size - self.k - 1)
                        [self.counts.size - self.k - 1])
            keep = self.counts > pivot
            self.keys = self.keys[keep]
            self.counts = self.counts[keep] - pivot
            self.err += pivot

    def estimate(self, key: int) -> int:
        i = np.searchsorted(self.keys, key)
        if i < self.keys.size and self.keys[i] == key:
            return int(self.counts[i])
        return 0

    def items(self) -> tuple[np.ndarray, np.ndarray]:
        """Retained (keys, lower-bound counts), keys ascending."""
        return self.keys.copy(), self.counts.copy()

    def candidates(self, min_count: int) -> np.ndarray:
        """Keys whose TRUE count could be >= min_count (superset
        guarantee: contains every such key whenever min_count > err)."""
        return self.keys[self.counts + self.err >= min_count].copy()
