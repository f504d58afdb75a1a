"""Engine-wide defaults.

Mirrors the reference workload-defining defaults (see /root/reference/main.cpp:38-52):
offset=2^30, bin_limit=500, alpha=0.000161167, and the default quantile list
q in {0.01, 0.1, 0.2, ..., 0.9, 0.99} (main.cpp:778).

The "practical" alpha tier (0.01) is used for fast tests and SQL-oracle
queries where the key space must stay well under bin_limit (no collapse),
so a DuckDB replica of the bucket math stays simple.
"""

from __future__ import annotations

from dataclasses import dataclass, field

# Reference defaults (main.cpp:49-51)
DEFAULT_OFFSET = 2**30
DEFAULT_BIN_LIMIT = 500
DEFAULT_ALPHA = 0.000161167

# Practical tier for tests / oracle queries (keys span << bin_limit)
PRACTICAL_ALPHA = 0.01

# Reference default quantile list (main.cpp:778)
DEFAULT_QUANTILES = (0.01, 0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 0.99)

# Headline quantiles from BASELINE.json north star
HEADLINE_QUANTILES = (0.5, 0.95, 0.99)


@dataclass(frozen=True)
class SketchConfig:
    alpha: float = DEFAULT_ALPHA
    bin_limit: int = DEFAULT_BIN_LIMIT
    offset: int = DEFAULT_OFFSET
    mode: str = "uniform"  # "uniform" (gamma^2), "last", "first"
    quantiles: tuple[float, ...] = field(default=DEFAULT_QUANTILES)
