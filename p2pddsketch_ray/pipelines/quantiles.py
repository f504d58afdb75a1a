"""Quantile pipelines: the engine's flagship flow.

Replaces the reference's whole main() simulation (main.cpp:214-396):

    read -> project metric column -> map_batches(partial sketches)
         -> groupby(keys).map_groups(merge + quantile)      # grouped
         -> (or) distributed tree reduce of partial rows    # global

The only shuffle moves serialized partials (<= ~6 KB per (block, group)):
classic partial aggregation, so a Zipf-skewed group key (lang ~ 60% 'en')
cannot hot-spot -- the hot group still contributes one row per input block.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa

import ray.data

from ..config import (DEFAULT_ALPHA, DEFAULT_BIN_LIMIT, DEFAULT_OFFSET,
                      HEADLINE_QUANTILES)
from ..sketches.ddsketch import DDSketch
from ..stages.sketch_build import partial_builder, quantile_finalizer


def build_partials_ds(ds: "ray.data.Dataset", value_col: str,
                      group_cols: Sequence[str] | None = None,
                      *, alpha: float = DEFAULT_ALPHA,
                      bin_limit: int = DEFAULT_BIN_LIMIT,
                      offset: int = DEFAULT_OFFSET, mode: str = "uniform",
                      batch_size: int | None = 65536) -> "ray.data.Dataset":
    """Stage 1: per-(block, group) partial sketch rows (stateless tasks)."""
    cols = [value_col] + list(group_cols or ())
    return ds.select_columns(cols).map_batches(
        partial_builder(value_col, group_cols, alpha=alpha,
                        bin_limit=bin_limit, offset=offset, mode=mode),
        batch_format="pyarrow", batch_size=batch_size, zero_copy_batch=True)


def dds_quantiles_global(ds: "ray.data.Dataset", value_col: str,
                         quantiles: Sequence[float] = HEADLINE_QUANTILES,
                         *, round_digits: int | None = None,
                         **sketch_kwargs) -> pa.Table:
    """Global quantiles: distributed partial build + distributed tree
    merge; only the single merged sketch row reaches the driver."""
    sketch = dds_sketch_global(ds, value_col, **sketch_kwargs)
    keys = [sketch.quantile_key(q) for q in quantiles]
    ests = [sketch._bucket_estimate(k) for k in keys]
    if round_digits is not None:
        ests = [round(e, round_digits) for e in ests]
    return pa.table({"q": pa.array(list(quantiles), type=pa.float64()),
                     "bucket_key": pa.array(keys, type=pa.int64()),
                     "est": pa.array(ests, type=pa.float64())})


def dds_sketch_global(ds: "ray.data.Dataset", value_col: str,
                      **sketch_kwargs) -> DDSketch:
    """The merged global sketch itself (for callers that want the full
    accumulator, e.g. checkpointing or repeated queries).

    The merge is a distributed tree reduce (stages.sketch_build.
    tree_merge_sketches): the driver deserializes exactly one row."""
    from ..stages.sketch_build import tree_merge_sketches
    partials = build_partials_ds(ds, value_col, None, **sketch_kwargs)
    return tree_merge_sketches(partials)


def dds_quantiles_grouped(ds: "ray.data.Dataset", value_col: str,
                          group_cols: Sequence[str],
                          quantiles: Sequence[float] = HEADLINE_QUANTILES,
                          *, round_digits: int | None = None,
                          **sketch_kwargs) -> "ray.data.Dataset":
    """Grouped quantiles: shuffle only the partial rows, then merge+query
    per group.  Output: one row per (group, q) with columns
    group_cols + [q, bucket_key, est]."""
    partials = build_partials_ds(ds, value_col, group_cols, **sketch_kwargs)
    return partials.groupby(list(group_cols)).map_groups(
        quantile_finalizer(group_cols, quantiles, round_digits),
        batch_format="pyarrow")
