"""Frequent Directions matrix sketch (Liberty, KDD 2013; Ghashami,
Liberty, Phillips, Woodruff, SIAM J. Comput. 2016): a deterministic
streaming sketch B (ell x d) of a tall matrix A (n x d) with the
covariance guarantee

    0 <= x^T (A^T A - B^T B) x <= ||A||_F^2 / ell   for any unit x,

i.e. the sketch's Gram matrix underestimates every direction's energy
by at most the Frobenius mass over the sketch size.  FD is MERGEABLE
(append the two B blocks, re-shrink) with the SAME bound regardless of
merge order -- the matrix analogue of the mergeable-accumulator
dataflow the reference runs for DDSketch (/root/reference/ddsketch.cc
DDS_MergeCollapse), which is why it slots straight into the
build_and_merge tree reduce.

The shrink step is the textbook one: SVD of the 2*ell-row buffer,
subtract sigma_ell^2 from every squared singular value, keep the top
ell right-singular directions.
"""

from __future__ import annotations

import numpy as np


class FrequentDirections:
    def __init__(self, ell: int, d: int):
        self.ell = int(ell)
        self.d = int(d)
        self.rows = np.zeros((0, d), dtype=np.float64)
        self.n_rows = 0          # rows of A consumed
        self.fro2 = 0.0          # ||A||_F^2, exact running sum

    def _shrink(self) -> None:
        if self.rows.shape[0] <= self.ell:
            return
        # economy SVD of the buffer; s is descending
        _, s, vt = np.linalg.svd(self.rows, full_matrices=False)
        s2 = s * s
        cut = s2[self.ell - 1] if s2.shape[0] >= self.ell else 0.0
        keep = np.sqrt(np.maximum(s2[: self.ell] - cut, 0.0))
        self.rows = keep[:, None] * vt[: self.ell]
        # drop all-zero rows so merge buffers stay small
        nz = np.flatnonzero((self.rows != 0.0).any(axis=1))
        self.rows = self.rows[nz]

    def add_batch(self, x: np.ndarray) -> None:
        x = np.asarray(x, dtype=np.float64)
        if x.size == 0:
            return
        self.n_rows += x.shape[0]
        self.fro2 += float((x * x).sum())
        # consume in buffer-sized chunks: never hold more than 2*ell rows
        pos = 0
        while pos < x.shape[0]:
            take = min(x.shape[0] - pos, 2 * self.ell - self.rows.shape[0])
            if take <= 0:
                self._shrink()
                continue
            self.rows = np.vstack([self.rows, x[pos: pos + take]])
            pos += take
            if self.rows.shape[0] >= 2 * self.ell:
                self._shrink()
        return

    def merge(self, other: "FrequentDirections") -> "FrequentDirections":
        assert self.ell == other.ell and self.d == other.d
        self.n_rows += other.n_rows
        self.fro2 += other.fro2
        self.rows = np.vstack([self.rows, other.rows])
        while self.rows.shape[0] > self.ell:
            self._shrink()
        return self

    def gram(self) -> np.ndarray:
        """B^T B -- the sketched covariance."""
        return self.rows.T @ self.rows

    def cov_error_vs(self, gram_exact: np.ndarray) -> tuple[float, float]:
        """(||A^T A - B^T B||_2, bound ||A||_F^2 / ell): the published
        guarantee, checkable in one call when the exact Gram is known."""
        diff = gram_exact - self.gram()
        err = float(np.linalg.norm(diff, 2))
        return err, self.fro2 / self.ell
