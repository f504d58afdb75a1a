"""HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet, Meunier,
AofA 2007) -- a north-star addition beyond the reference (BASELINE.json):
same mergeable-accumulator shape as DDSketch (SURVEY.md section 2.4
user-extension surface), so it plugs into the identical Ray Data
build/merge stages.

Register state is a pure function of the input *set* (per-register max),
so merges are associative, commutative, idempotent, and bit-identical for
every merge order -- stronger than DDSketch's multiset property.

Hash tiers (see hashing.py):
* ``murmur64`` (default for integers): bit-replica of DuckDB ``hash()``,
  so the driver's SQL oracle reproduces the EXACT same registers and
  estimate.
* ``md5`` for strings (DuckDB-replicable via md5()); slower, oracle tier.
* ``splitmix64``-of-pandas-hash for the 100 TB fast path over strings.

rho (leading-zero rank of the low 64-p bits) is deliberately computed via
the float path ``(64-p) - floor(log2(w))`` IN BOTH this implementation and
the SQL replica, so any float rounding is identical on both sides.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from ..hashing import md5_uint64, murmur64, splitmix64


def register_updates(h, p: int) -> tuple[np.ndarray, np.ndarray]:
    """(register index, rho) pairs for a batch of 64-bit hashes -- the
    vectorized core of add_hashes, exposed so composite-keyed callers
    (e.g. the sliding-window per-hour matrix) can scatter-max directly
    without per-group HyperLogLog objects."""
    h = np.asarray(h, dtype=np.uint64)
    shift = np.uint64(64 - p)
    idx = (h >> shift).astype(np.int64)
    w = h & np.uint64((1 << (64 - p)) - 1)
    rho = np.empty(h.shape[0], dtype=np.uint8)
    zero = w == 0
    rho[zero] = 64 - p + 1
    nz = ~zero
    # float path on purpose -- must match the SQL replica bit-for-bit
    rho[nz] = (64 - p) - np.floor(
        np.log2(w[nz].astype(np.float64))).astype(np.int64)
    return idx, rho


def _alpha_m(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


class HyperLogLog:
    __slots__ = ("p", "m", "registers", "hash_kind")

    def __init__(self, p: int = 12, hash_kind: str = "murmur64"):
        if not (4 <= p <= 18):
            raise ValueError("p must be in [4, 18]")
        if hash_kind not in ("murmur64", "md5", "fast"):
            raise ValueError(f"unknown hash_kind {hash_kind!r}")
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        self.hash_kind = hash_kind

    # -- build -------------------------------------------------------------

    def _hash(self, values) -> np.ndarray:
        if self.hash_kind == "murmur64":
            return murmur64(np.asarray(values, dtype=np.int64))
        if self.hash_kind == "md5":
            return md5_uint64(values)
        # "fast": pandas SipHash (stable) avalanched once more
        import pandas as pd
        arr = np.asarray(values, dtype=object)
        return splitmix64(pd.util.hash_array(arr, categorize=False).view(np.int64))

    def add_hashes(self, h: np.ndarray) -> None:
        idx, rho = register_updates(h, self.p)
        np.maximum.at(self.registers, idx, rho)

    def add_batch(self, values) -> None:
        if len(values) == 0:
            return
        self.add_hashes(self._hash(values))

    # -- merge -------------------------------------------------------------

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        if other.p != self.p or other.hash_kind != self.hash_kind:
            raise ValueError("cannot merge HLLs with different parameters")
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def copy(self) -> "HyperLogLog":
        c = HyperLogLog(self.p, self.hash_kind)
        c.registers = self.registers.copy()
        return c

    # -- query -------------------------------------------------------------

    def estimate(self) -> float:
        regs = self.registers
        zeros = int((regs == 0).sum())
        s = float(np.sum(np.power(2.0, -regs.astype(np.float64))))
        raw = _alpha_m(self.m) * self.m * self.m / s
        if raw <= 2.5 * self.m and zeros > 0:
            # linear counting (small-range correction): exact integer
            # inputs -> bit-identical to the SQL replica
            return self.m * math.log(self.m / zeros)
        return raw

    # -- serialization -----------------------------------------------------

    def to_row(self) -> dict:
        return {"p": self.p, "hash_kind": self.hash_kind,
                "registers": self.registers.copy()}

    @classmethod
    def from_row(cls, row: dict) -> "HyperLogLog":
        h = cls(int(row["p"]), row["hash_kind"])
        h.registers = np.asarray(row["registers"], dtype=np.uint8).copy()
        return h

    def to_bytes(self) -> bytes:
        return (struct.pack("<q", self.p) + self.hash_kind.encode("ascii")
                + b"|" + self.registers.tobytes())

    def __repr__(self) -> str:
        return f"HyperLogLog(p={self.p}, est={self.estimate():.1f})"
