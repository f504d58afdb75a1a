"""Deterministic, cross-process hash kernels.

Three tiers, chosen per use:

* ``murmur64`` -- bitwise replica of DuckDB's ``hash(BIGINT)`` finalizer
  (murmur64 from the public DuckDB source: xor-shift-32 / multiply by
  0xd6e8feb86659fd93, twice, then a final xor-shift).  Fully vectorized in
  numpy uint64.  Used by HLL / count-min over integer keys so the driver's
  DuckDB oracle can reproduce the EXACT same estimates with SQL
  ``hash(col)``.
* ``md5_uint64`` / ``md5_hex`` -- first 8 bytes of MD5; oracle-replicable
  for strings (DuckDB ``md5(col)``), C-speed per row but not vectorized;
  use for correctness-gate queries, not the 100 TB hot path.
* ``splitmix64`` -- fast seeded avalanche for derived hash families
  (MinHash permutations, Bloom probes, count-min rows): h_i = splitmix64
  (x ^ seed_i).

All functions ignore Python's randomized ``hash()`` -- nothing here varies
across processes, which is what makes retried Ray tasks reproduce identical
partials (SURVEY.md section 4 determinism requirement).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_U64 = np.uint64
_MURMUR_C = _U64(0xD6E8FEB86659FD93)
_SPLITMIX_1 = _U64(0xBF58476D1CE4E5B9)
_SPLITMIX_2 = _U64(0x94D049BB133111EB)
_GOLDEN = _U64(0x9E3779B97F4A7C15)


def murmur64(x: np.ndarray) -> np.ndarray:
    """DuckDB-compatible hash of int64/uint64 arrays (vectorized).

    murmur64(v) == duckdb ``SELECT hash(v::BIGINT)`` for every v.
    """
    with np.errstate(over="ignore"):
        x = np.asarray(x).astype(np.int64, copy=False).view(_U64).copy()
        x ^= x >> _U64(32)
        x *= _MURMUR_C
        x ^= x >> _U64(32)
        x *= _MURMUR_C
        x ^= x >> _U64(32)
    return x


def splitmix64(x: np.ndarray, seed: int = 0) -> np.ndarray:
    """Fast seeded 64-bit avalanche (public-domain splitmix64 constants)."""
    with np.errstate(over="ignore"):
        z = (np.asarray(x).astype(np.int64, copy=False).view(_U64)
             + _U64(seed) * _GOLDEN + _GOLDEN)
        z = (z ^ (z >> _U64(30))) * _SPLITMIX_1
        z = (z ^ (z >> _U64(27))) * _SPLITMIX_2
        z = z ^ (z >> _U64(31))
    return z


def md5_uint64(values) -> np.ndarray:
    """First 8 MD5 bytes (big-endian) of each value's UTF-8 bytes, as
    uint64.  Matches DuckDB: ``('0x' || substr(md5(col), 1, 16))::UBIGINT``
    semantics (verified in tests)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v or b"")
        out[i] = int.from_bytes(hashlib.md5(b).digest()[:8], "big")
    return out


def md5_hex(values) -> list[str]:
    """Full MD5 hex digest per value (== DuckDB ``md5(col)``)."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    return [hashlib.md5(v.encode("utf-8") if isinstance(v, str)
                        else bytes(v or b"")).hexdigest() for v in values]


def md5_pair_uint64(values) -> tuple[np.ndarray, np.ndarray]:
    """Both 8-byte halves of each value's MD5 (big-endian), as uint64.
    Matches DuckDB ``('0x' || substr(md5(col), 1, 16))::UBIGINT`` and
    ``('0x' || substr(md5(col), 17, 16))::UBIGINT`` -- the two
    independent-enough hashes Kirsch-Mitzenmacher double hashing needs
    from a single digest pass."""
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        values = values.to_pylist()
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        b = v.encode("utf-8") if isinstance(v, str) else bytes(v or b"")
        d = hashlib.md5(b).digest()
        h1[i] = int.from_bytes(d[:8], "big")
        h2[i] = int.from_bytes(d[8:], "big")
    return h1, h2
