"""KMV (k-minimum-values / bottom-k theta) distinct-count sketch.

The fourth member of the mergeable-accumulator family (SURVEY.md section
2.4's ``Sketch`` protocol, generalizing the reference's compile-time
strategy families, /root/reference/ddsketch.h:154-251): state is the k
smallest DISTINCT 64-bit hash values seen.  Unlike HLL it supports set
ALGEBRA -- union (= merge) and intersection estimates between sketches
-- and unlike HLL's harmonic-mean estimator its whole state is an exact
function of the input value set under a fixed hash, so with the
DuckDB-bit-equal ``murmur64`` the sketch is fully SQL-replicable
(``row_number() OVER (ORDER BY hash(v)) <= k``) and the driver oracle
can verify it hash-for-hash (see ``pipelines/approx.py``).

Merge is associative, commutative AND idempotent (set union + truncate),
the same contract the reference's gossip exchange needed
(/root/reference/ddsketch.cc:559-647) -- so Ray's partial+final tree
combine replaces the P2P rounds exactly as for DDSketch.

Estimator (Bar-Yossef et al. 2002; Beyer et al. SIGMOD 2007 unbiased
form): with U(k) the k-th smallest of the unit-mapped hashes,
``D ~= (k-1) / (U(k))`` where ``U(k) = kth_hash / 2^64``; exact count
when fewer than k distinct hashes were seen.
"""

from __future__ import annotations

import numpy as np

from ..hashing import murmur64

_TWO64 = 18446744073709551616.0  # 2^64 as float64 (exact)


class KMVSketch:
    """Bottom-k sketch over int64 keys hashed with murmur64."""

    __slots__ = ("k", "mins")

    def __init__(self, k: int = 64):
        if k < 2:
            raise ValueError("KMV needs k >= 2")
        self.k = int(k)
        self.mins = np.empty(0, dtype=np.uint64)  # sorted ascending

    # -- Sketch protocol -------------------------------------------------
    def add_batch(self, values) -> None:
        h = murmur64(np.asarray(values))
        self._absorb(h)

    def add_hashes(self, hashes: np.ndarray) -> None:
        """Add pre-hashed values (for callers that batch the hash)."""
        self._absorb(np.asarray(hashes, dtype=np.uint64))

    def _absorb(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        self.mins = np.unique(np.concatenate([self.mins, h]))[: self.k]

    def merge(self, other: "KMVSketch") -> "KMVSketch":
        if other.k != self.k:
            raise ValueError("KMV merge requires equal k")
        out = KMVSketch(self.k)
        out.mins = np.unique(np.concatenate([self.mins, other.mins]))[: self.k]
        return out

    def to_row(self) -> dict:
        return {"k": self.k, "mins": self.mins.tobytes()}

    @classmethod
    def from_row(cls, row: dict) -> "KMVSketch":
        s = cls(int(row["k"]))
        s.mins = np.frombuffer(row["mins"], dtype=np.uint64).copy()
        return s

    def to_bytes(self) -> bytes:
        import pickle
        return pickle.dumps(self.to_row())

    # -- estimators ------------------------------------------------------
    @property
    def n_mins(self) -> int:
        return int(self.mins.shape[0])

    @property
    def kth(self) -> int:
        """Largest stored hash (the k-th minimum once saturated)."""
        return int(self.mins[-1]) if self.mins.size else 0

    def estimate_f(self) -> float:
        """Distinct-count estimate BEFORE rounding (op order replicated
        verbatim in the SQL oracle -- keep in sync)."""
        n = self.n_mins
        if n < self.k:
            return float(n)
        return (self.k - 1) * (_TWO64 / np.float64(self.mins[-1]))

    def estimate(self) -> int:
        return int(np.floor(self.estimate_f() + 0.5))

    def checksum(self) -> int:
        """sum(h mod 2^31) over stored mins -- lets an oracle verify the
        full stored set, register-level style (fits int64: k * 2^31)."""
        return int((self.mins % np.uint64(2147483648)).astype(np.int64)
                   .sum())

    # -- set algebra -----------------------------------------------------
    def a_not_b(self, other: "KMVSketch"):
        """Theta-sketch A-not-B (DataSketches-style set difference):
        estimate |A \\ B| from the two bottom-k states.

        theta = min over the SATURATED sides of their k-th hash (a
        sketch with fewer than k mins is an exact record, contributing
        no bound).  Both stored sets are complete records of their
        input's distinct hashes <= theta, so
        ``keep = {h in mins_a : h <= theta, h not in mins_b}`` is the
        exact sampled difference and scales by the inclusion rate
        theta / 2^64.  Returns (n_keep, theta, est_f) with theta == 0
        when neither side is saturated (est exact).  Float op order is
        replicated verbatim in the SQL oracle -- keep in sync."""
        thetas = []
        if self.n_mins >= self.k:
            thetas.append(int(self.mins[-1]))
        if other.n_mins >= other.k:
            thetas.append(int(other.mins[-1]))
        if thetas:
            theta = min(thetas)
            keep = self.mins[self.mins <= np.uint64(theta)]
        else:
            theta = 0
            keep = self.mins
        n_keep = int(np.isin(keep, other.mins, invert=True).sum())
        if thetas:
            est_f = np.float64(n_keep) * (_TWO64
                                          / np.float64(np.uint64(theta)))
        else:
            est_f = np.float64(n_keep)
        return n_keep, theta, est_f

    def union_intersection(self, other: "KMVSketch"):
        """(est_union_f, n_common, nL) for self vs other.

        L = the k smallest of mins_a UNION mins_b (= merged state);
        n_common = |{h in L : h in a and h in b}|; Jaccard ~= n_common/nL;
        est_intersection_f = (n_common / nL) * est_union_f (computed by
        the caller to keep float op order visible in one place)."""
        m = self.merge(other)
        common = np.intersect1d(self.mins, other.mins)
        n_common = int(np.isin(common, m.mins).sum())
        return m.estimate_f(), n_common, m.n_mins
