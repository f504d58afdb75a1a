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


def rank_errors(ds: "ray.data.Dataset", value_col: str,
                quantiles: Sequence[float], estimates: Sequence[float],
                *, max_rank_err: float | None = None) -> list[float]:
    """Distributed exact-rank self-check for quantile estimates.

    One extra map pass computes per-block counts of values strictly below
    / at-or-below each estimate (3 vectorized compares per row); the tiny
    per-block count rows are summed by Ray.  The rank error of estimate
    e_i for target q_i is then

        err_i = max(0, q_i - rank_le(e_i), rank_lt(e_i) - q_i)

    (zero whenever q_i lies inside [count(x < e)/n, count(x <= e)/n] --
    the standard containment interval for discrete data with ties).

    Raises ValueError when ``max_rank_err`` is given and exceeded: a
    mis-configured or broken sketch (KLL / t-digest / DDSketch) fails at
    the pipeline boundary instead of silently emitting bad estimates.
    """
    import numpy as np
    est = np.asarray(list(estimates), dtype=np.float64)
    qs = np.asarray(list(quantiles), dtype=np.float64)

    def counts(t: pa.Table) -> pa.Table:
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        lt = (v[:, None] < est[None, :]).sum(axis=0)
        le = (v[:, None] <= est[None, :]).sum(axis=0)
        cols = {f"lt_{i}": pa.array([int(lt[i])], type=pa.int64())
                for i in range(est.shape[0])}
        cols.update({f"le_{i}": pa.array([int(le[i])], type=pa.int64())
                     for i in range(est.shape[0])})
        cols["cnt"] = pa.array([int(v.shape[0])], type=pa.int64())
        return pa.table(cols)

    names = ([f"lt_{i}" for i in range(est.shape[0])]
             + [f"le_{i}" for i in range(est.shape[0])] + ["cnt"])
    sums = (ds.select_columns([value_col])
            .map_batches(counts, batch_format="pyarrow",
                         zero_copy_batch=True)
            .sum(names))
    n = max(int(sums["sum(cnt)"]), 1)
    errs = []
    for i, q in enumerate(qs):
        r_lt = sums[f"sum(lt_{i})"] / n
        r_le = sums[f"sum(le_{i})"] / n
        errs.append(max(0.0, q - r_le, r_lt - q))
    if max_rank_err is not None and max(errs) > max_rank_err:
        raise ValueError(
            f"quantile self-check failed: rank errors {errs} exceed "
            f"{max_rank_err} for quantiles {list(qs)} -- the sketch "
            "configuration does not meet its accuracy bound")
    return errs


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
