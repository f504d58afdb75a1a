"""t-digest: mergeable quantile sketch with strong tail accuracy.

From-scratch implementation of the merging t-digest (Dunning & Ertl,
"Computing extremely accurate quantiles using t-digests", 2019) -- the
other half of BASELINE.md's "t-digest/KLL" north-star pair (KLL covers
the comparison-based side; t-digest the moment-based side with better
extreme-tail behavior).

Variant: clustering by FIXED boundaries in k-space (the k1 scale
``k(q) = (delta/2pi) * asin(2q-1)``, section 2.2 of the paper) instead of
the sequential greedy merge.  Fixed boundaries make compression one
vectorized sort + segmented mean (no per-centroid Python loop), keep the
centroid count <= delta/2 + 2, and -- unlike the greedy variant -- give a
canonical centroid set for a given weighted value multiset, so compress
is idempotent.  Like KLL (and unlike DDSketch's integer-count exact
merge), results are deterministic for a fixed merge tree but not
bit-identical across merge orders; tests assert rank-error bounds.

Accumulator protocol: add_batch / merge / quantile / to_row / from_row.
"""

from __future__ import annotations

import numpy as np

_BUFFER_LIMIT = 8192


class TDigest:
    def __init__(self, compression: float = 100.0):
        if compression < 20:
            raise ValueError("compression must be >= 20")
        self.compression = float(compression)
        # fixed k-space cluster boundaries in q: q_j = (sin(2*pi*j/d)+1)/2
        # for integer k steps j in [-d/4, d/4]
        d = self.compression
        j = np.arange(-int(np.ceil(d / 4.0)), int(np.ceil(d / 4.0)) + 1)
        q = (np.sin(2.0 * np.pi * j / d) + 1.0) / 2.0
        self._bounds = np.clip(q, 0.0, 1.0)
        self.means = np.zeros(0, dtype=np.float64)
        self.weights = np.zeros(0, dtype=np.float64)
        self.n = 0.0
        self.min = np.inf
        self.max = -np.inf
        self._buf: list[np.ndarray] = []
        self._buf_n = 0

    # -- build -------------------------------------------------------------

    def add_batch(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return
        self._buf.append(v)
        self._buf_n += v.size
        self.n += float(v.size)
        self.min = min(self.min, float(v.min()))
        self.max = max(self.max, float(v.max()))
        if self._buf_n >= _BUFFER_LIMIT:
            self._compress()

    def merge(self, other: "TDigest") -> "TDigest":
        if other.compression != self.compression:
            raise ValueError("cannot merge t-digests with different "
                             "compression")
        o = other.to_row()  # compresses other's buffer (content-preserving)
        if o["means"].size:
            self._buf.append(o["means"])
            self._compress(extra_weights=o["weights"])
            self.n += o["n"]
            self.min = min(self.min, o["min"])
            self.max = max(self.max, o["max"])
        return self

    def _compress(self, extra_weights: np.ndarray | None = None) -> None:
        """Fold buffered values (and optionally a weighted tail batch)
        into the canonical fixed-boundary centroid set."""
        if not self._buf and extra_weights is None:
            return
        parts_m = [self.means]
        parts_w = [self.weights]
        if self._buf:
            if extra_weights is not None:
                *plain, weighted = self._buf
            else:
                plain, weighted = self._buf, None
            if plain:
                flat = np.concatenate(plain)
                parts_m.append(flat)
                parts_w.append(np.ones(flat.shape[0], dtype=np.float64))
            if weighted is not None:
                parts_m.append(weighted)
                parts_w.append(extra_weights)
        m = np.concatenate(parts_m)
        w = np.concatenate(parts_w)
        self._buf, self._buf_n = [], 0
        if m.size == 0:
            return
        order = np.argsort(m, kind="mergesort")
        m, w = m[order], w[order]
        total = w.sum()
        qmid = (np.cumsum(w) - w / 2.0) / total
        bins = np.searchsorted(self._bounds, qmid, side="right")
        uniq, inv = np.unique(bins, return_inverse=True)
        new_w = np.zeros(uniq.shape[0], dtype=np.float64)
        new_wm = np.zeros(uniq.shape[0], dtype=np.float64)
        np.add.at(new_w, inv, w)
        np.add.at(new_wm, inv, w * m)
        self.means = new_wm / new_w
        self.weights = new_w

    # -- query -------------------------------------------------------------

    def quantile(self, q: float) -> float:
        if not (0.0 <= q <= 1.0):
            raise ValueError("q must be in [0, 1]")
        self._compress()
        if self.weights.size == 0:
            raise ValueError("empty sketch")
        if self.weights.size == 1:
            return float(self.means[0])
        cum = np.cumsum(self.weights)
        total = cum[-1]
        mid = cum - self.weights / 2.0
        target = q * total
        if target <= mid[0]:
            # interpolate between the true min and the first centroid
            frac = target / mid[0] if mid[0] > 0 else 1.0
            return float(self.min + frac * (self.means[0] - self.min))
        if target >= mid[-1]:
            span = total - mid[-1]
            frac = (target - mid[-1]) / span if span > 0 else 0.0
            return float(self.means[-1] + frac * (self.max - self.means[-1]))
        return float(np.interp(target, mid, self.means))

    def quantiles(self, qs) -> list[float]:
        return [self.quantile(q) for q in qs]

    # -- serialization -----------------------------------------------------

    def to_row(self) -> dict:
        self._compress()
        return {
            "compression": self.compression,
            "means": self.means.copy(),
            "weights": self.weights.copy(),
            "n": float(self.n),
            "min": float(self.min),
            "max": float(self.max),
        }

    @classmethod
    def from_row(cls, row: dict) -> "TDigest":
        t = cls(row["compression"])
        t.means = np.asarray(row["means"], dtype=np.float64)
        t.weights = np.asarray(row["weights"], dtype=np.float64)
        t.n = float(row["n"])
        t.min = float(row["min"])
        t.max = float(row["max"])
        return t

    def __repr__(self) -> str:
        return (f"TDigest(compression={self.compression}, "
                f"centroids={self.means.size}, n={self.n})")
