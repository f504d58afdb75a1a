"""Seeded scalar-distribution fixtures (FIXTURES.md F2) -- the engine twin
of the reference's generateDataset (main.cpp:1002-1039: seeded normal /
exponential / uniform draws) plus the adversarial sorted-range-partitioned
variant (main.cpp:285 sort + main.cpp:691-748 jittered contiguous slices).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# reference defaults: normal(mean=1, stddev=3) (main.cpp:39-40)
DISTRIBUTIONS = {
    "normal": lambda rng, n: rng.normal(1.0, 3.0, n),
    "exponential": lambda rng, n: rng.exponential(1.0, n),
    "uniform": lambda rng, n: rng.uniform(0.0, 1000.0, n),
}


def generate_scalars(dist: str, n: int, seed: int = 1) -> np.ndarray:
    if dist not in DISTRIBUTIONS:
        raise ValueError(f"unknown distribution {dist!r}; "
                         f"choose from {sorted(DISTRIBUTIONS)}")
    return DISTRIBUTIONS[dist](np.random.default_rng(seed), n)


def read_scalar_text(paths, column: str = "value"):
    """The reference's native input format -- a newline-delimited text file
    of doubles (loadDataset, main.cpp:967-1000; line count via
    getDatasetSize, main.cpp:950-965) -- as a Ray Dataset: ``read_text``
    splits lines across blocks and a vectorized Arrow string->float64 cast
    replaces the per-line ``stod`` loop.  Blank lines are skipped."""
    import pyarrow.compute as pc

    import ray.data

    def parse(t: pa.Table) -> pa.Table:
        col = pc.utf8_trim_whitespace(t["text"])
        col = col.filter(pc.not_equal(col, ""))
        return pa.table({column: pc.cast(col, pa.float64())})

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True)


def jittered_boundaries(n: int, parts: int, seed: int = 0) -> list[int]:
    """Contiguous slice boundaries with +/-10% jitter (the reference
    partitioner's shape, main.cpp:707-714)."""
    import random
    rng = random.Random(seed)
    bounds = [round(i * n / parts) for i in range(parts + 1)]
    span = max(1, n // parts)
    for i in range(1, parts):
        bounds[i] = min(max(bounds[i] + rng.randint(-span // 10, span // 10),
                            bounds[i - 1]), n)
    return bounds


def write_scalar_shards(out_dir: str, dist: str, n: int, parts: int,
                        seed: int = 1, *, sort_first: bool = False) -> list[str]:
    """Write the stream as ``parts`` parquet shards.  ``sort_first=True``
    reproduces the reference's adversarial regime: globally sorted, so
    each shard holds a disjoint value range (worst case for
    collapse-on-merge, ddsketch.cc:625-638)."""
    import os
    os.makedirs(out_dir, exist_ok=True)
    data = generate_scalars(dist, n, seed)
    if sort_first:
        data = np.sort(data)
    bounds = jittered_boundaries(n, parts, seed)
    paths = []
    for i in range(parts):
        p = os.path.join(out_dir, f"{dist}-{i:04d}.parquet")
        pq.write_table(pa.table({"value": data[bounds[i]:bounds[i + 1]]}), p)
        paths.append(p)
    return paths


def read_scalar_csv(paths, column: str = "value"):
    """CSV source for scalar streams: one float column (header row
    ``value`` by default).  Beyond the reference's text format (D5) --
    ``read_csv`` splits files/blocks and Arrow parses natively; the
    selected column is cast to float64 like the text path."""
    import pyarrow.compute as pc

    import ray.data

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({column: pc.cast(t[column], pa.float64())})

    return ray.data.read_csv(paths).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)


def read_scalar_jsonl(paths, column: str = "value"):
    """JSON-lines source for scalar streams: one object per line with a
    numeric ``column`` field.  ``read_json`` handles newline-delimited
    JSON natively; the field is cast to float64."""
    import pyarrow.compute as pc

    import ray.data

    def pick(t: pa.Table) -> pa.Table:
        return pa.table({column: pc.cast(t[column], pa.float64())})

    return ray.data.read_json(paths).map_batches(
        pick, batch_format="pyarrow", zero_copy_batch=True)
