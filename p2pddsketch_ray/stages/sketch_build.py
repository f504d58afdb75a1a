"""Ray Data stages that build and merge sketch partials.

This is the architectural replacement for the reference's distributed
phases (SURVEY.md section 3.3):

* ``distributedAdd`` (main.cpp:432-472, one sketch per simulated peer)
  becomes ``map_batches(partial_sketch_builder)`` -- stateless tasks that
  emit ONE serialized-sketch row per (block, group).  Stateless-per-block
  is deliberately chosen over a long-lived actor accumulator: a retried
  task reproduces the identical partial, which is what makes the pipeline
  deterministic and resumable (SURVEY.md section 4).
* ``distributedCommunication`` (main.cpp:475-658, gossip rounds until
  convergence) becomes one deterministic reduction over those tiny rows:
  either ``groupby(keys).map_groups(merge)`` / ``AggregateFnV2`` (shuffle
  tree merge) or a driver-side fold for the global (single-group) case --
  partials are <= bin_limit bins ~ 6 KB each, so the merge stage moves
  kilobytes, not data.

All hot-path math is vectorized numpy over zero-copy Arrow columns.
"""

from __future__ import annotations

from functools import partial
from typing import Iterable, Sequence

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_ALPHA, DEFAULT_BIN_LIMIT, DEFAULT_OFFSET
from ..sketches.ddsketch import DDSketch

SKETCH_FIELDS = [
    ("keys", pa.list_(pa.int64())),
    ("counts", pa.list_(pa.float64())),
    ("n", pa.float64()),
    ("generation", pa.int64()),
    ("alpha0", pa.float64()),
    ("bin_limit", pa.int64()),
    ("offset", pa.int64()),
    ("mode", pa.string()),
    ("kmin", pa.int64()),
    ("kmax", pa.int64()),
]


def sketch_rows_to_table(rows: Sequence[dict], group_values: dict | None = None) -> pa.Table:
    """Pack DDSketch.to_row() dicts (plus optional group-key columns) into
    an Arrow table."""
    cols: dict[str, pa.Array] = {}
    if group_values:
        for name, values in group_values.items():
            cols[name] = pa.array(values)
    for name, typ in SKETCH_FIELDS:
        cols[name] = pa.array([r[name] for r in rows], type=typ)
    return pa.table(cols)


def _sketch_from_table_row(table: pa.Table, i: int) -> DDSketch:
    return DDSketch.from_row({
        "keys": np.asarray(table["keys"][i].as_py(), dtype=np.int64),
        "counts": np.asarray(table["counts"][i].as_py(), dtype=np.float64),
        "n": table["n"][i].as_py(),
        "generation": table["generation"][i].as_py(),
        "alpha0": table["alpha0"][i].as_py(),
        "bin_limit": table["bin_limit"][i].as_py(),
        "offset": table["offset"][i].as_py(),
        "mode": table["mode"][i].as_py(),
        "kmin": table["kmin"][i].as_py(),
        "kmax": table["kmax"][i].as_py(),
    })


def sketches_from_table(table: pa.Table) -> list[DDSketch]:
    """Decode every serialized-sketch row of a table with columnar
    operations (one offsets/values buffer pair per list column instead of
    per-row as_py round-trips)."""
    keys_col = table["keys"].combine_chunks()
    counts_col = table["counts"].combine_chunks()
    koffs = keys_col.offsets.to_numpy(zero_copy_only=False)
    kvals = keys_col.values.to_numpy(zero_copy_only=False)
    coffs = counts_col.offsets.to_numpy(zero_copy_only=False)
    cvals = counts_col.values.to_numpy(zero_copy_only=False)
    scalars = {name: table[name].to_pylist()
               for name, _ in SKETCH_FIELDS if name not in ("keys", "counts")}
    out = []
    for i in range(table.num_rows):
        row = {name: vals[i] for name, vals in scalars.items()}
        row["keys"] = np.asarray(kvals[koffs[i]:koffs[i + 1]],
                                 dtype=np.int64)
        row["counts"] = np.asarray(cvals[coffs[i]:coffs[i + 1]],
                                   dtype=np.float64)
        out.append(DDSketch.from_row(row))
    return out


def merge_sketch_table(table: pa.Table) -> DDSketch:
    """Fold all serialized-sketch rows of an Arrow table into one sketch."""
    if table.num_rows == 0:
        raise ValueError("no sketch rows to merge")
    acc = _sketch_from_table_row(table, 0)
    for i in range(1, table.num_rows):
        acc.merge(_sketch_from_table_row(table, i))
    return acc


_SKETCH_COL_NAMES = [name for name, _ in SKETCH_FIELDS]


def _merge_block_to_row(t: pa.Table) -> pa.Table:
    """map_batches body: fold a block of partial-sketch rows into one row
    (group columns, if any, are dropped -- this is the global path)."""
    empty = pa.table({name: pa.array([], type=typ)
                      for name, typ in SKETCH_FIELDS})
    if t.num_rows == 0:
        return empty
    return sketch_rows_to_table(
        [merge_sketch_table(t.select(_SKETCH_COL_NAMES)).to_row()])


def tree_merge_sketches(partials_ds, *, fanin: int = 32) -> DDSketch:
    """Distributed tree reduce over serialized-sketch rows.

    Replaces the driver-side sequential fold (at 10^6 input blocks the
    old fold held and merged 10^6 sketches serially on the driver):

    1. leaf: a block-local merge FUSED into the build stage (no shuffle,
       no barrier) folds each block's partial rows to one row, so the
       dataset shrinks to <= 1 row per block;
    2. reduce rounds: while more than ``fanin`` blocks remain, one
       repartition(fanin) + per-block merge folds them remotely (tiny
       rows -- the shuffle moves kilobytes);
    3. root: the driver folds the <= ``fanin`` remaining single-row
       tables -- bounded by the constant fanin, independent of input
       size.

    The common case (blocks <= fanin after the leaf merge) therefore pays
    ZERO extra shuffle barriers over the build itself.
    """
    import ray as _ray
    leaves = partials_ds.map_batches(
        _merge_block_to_row, batch_format="pyarrow",
        batch_size=None).materialize()
    while leaves.num_blocks() > fanin:
        leaves = leaves.repartition(fanin).map_batches(
            _merge_block_to_row, batch_format="pyarrow",
            batch_size=None).materialize()
    tables = [t for t in map(_ray.get, leaves.to_arrow_refs())
              if t.num_rows]
    if not tables:
        raise ValueError("empty dataset")
    return merge_sketch_table(pa.concat_tables(tables))


def build_partials(batch: pa.Table, *, value_col: str,
                   group_cols: Sequence[str] | None = None,
                   weight_col: str | None = None,
                   alpha: float = DEFAULT_ALPHA,
                   bin_limit: int = DEFAULT_BIN_LIMIT,
                   offset: int = DEFAULT_OFFSET,
                   mode: str = "uniform") -> pa.Table:
    """map_batches body: one partial-sketch row per (batch, group).

    Nulls in the value column are dropped (the reference's scalar stream
    has no notion of null, main.cpp:967-1000).  ``weight_col`` makes the
    partials weighted (each row adds its weight to its bucket).
    """
    col = batch[value_col]
    if col.null_count:
        keep = col.is_valid()
        batch = batch.filter(keep)
        col = batch[value_col]
    values = col.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    weights = (batch[weight_col].to_numpy(zero_copy_only=False)
               .astype(np.float64, copy=False) if weight_col else None)

    if not group_cols:
        s = DDSketch(alpha, bin_limit, offset, mode)
        s.add_batch(values, weights)
        return sketch_rows_to_table([s.to_row()])

    if len(group_cols) == 1:
        gv = batch[group_cols[0]].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(gv, return_inverse=True)
        group_values = {group_cols[0]: uniq.tolist()}
    else:
        arrs = [batch[c].to_numpy(zero_copy_only=False) for c in group_cols]
        combined = np.core.records.fromarrays(arrs)
        uniq, inv = np.unique(combined, return_inverse=True)
        group_values = {c: [u[j] for u in uniq.tolist()]
                        for j, c in enumerate(group_cols)}

    order = np.argsort(inv, kind="stable")
    bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
    rows = []
    for g in range(len(uniq)):
        sel = order[bounds[g]:bounds[g + 1]]
        s = DDSketch(alpha, bin_limit, offset, mode)
        s.add_batch(values[sel],
                    weights[sel] if weights is not None else None)
        rows.append(s.to_row())
    return sketch_rows_to_table(rows, group_values)


def partial_builder(value_col: str, group_cols: Sequence[str] | None = None,
                    **sketch_kwargs):
    """Picklable map_batches callable (stateless task)."""
    return partial(build_partials, value_col=value_col,
                   group_cols=tuple(group_cols) if group_cols else None,
                   **sketch_kwargs)


def quantile_finalizer(group_cols: Sequence[str] | None,
                       quantiles: Sequence[float],
                       round_digits: int | None = None):
    """map_groups body factory: merge a group's partial rows and emit one
    row per quantile: group keys + (q, bucket_key, est)."""
    group_cols = tuple(group_cols) if group_cols else ()
    qs = tuple(quantiles)

    def finalize(group: pa.Table) -> pa.Table:
        sketch = merge_sketch_table(group)
        out: dict[str, list] = {c: [group[c][0].as_py()] * len(qs)
                                for c in group_cols}
        out["q"] = list(qs)
        out["bucket_key"] = [sketch.quantile_key(q) for q in qs]
        ests = [sketch._bucket_estimate(k) for k in out["bucket_key"]]
        if round_digits is not None:
            ests = [round(e, round_digits) for e in ests]
        out["est"] = ests
        return pa.table(out)

    return finalize


def actor_pool_sketch_build(ds, value_col: str, *, n_actors: int = 8,
                            alpha: float = DEFAULT_ALPHA,
                            bin_limit: int = DEFAULT_BIN_LIMIT,
                            offset: int = DEFAULT_OFFSET,
                            mode: str = "uniform",
                            weight_col: str | None = None) -> DDSketch:
    """Stateful ACTOR-POOL build: ``n_actors`` long-lived Ray actors each
    hold ONE DDSketch and stream their share of the dataset through it
    (``streaming_split`` iterators), so exactly ``n_actors`` partial rows
    exist no matter how many blocks the input has -- the "per-partition
    sketch held in actor state" execution shape (north-star phrasing;
    the reference's per-peer accumulation, main.cpp:432-472).

    This is the raw-actor escape hatch the Dataset API needs here: a
    map_batches callable class cannot flush accumulated state after its
    last batch, so cross-batch accumulation genuinely requires actors
    consuming split iterators.  The default path (build_partials +
    tree_merge_sketches) stays stateless-per-block -- identical results
    (merge associativity), better retry semantics; this pool variant
    wins when per-block partial rows dominate (tiny blocks, huge block
    counts) or when the accumulator is expensive to construct.

    Returns the merged global sketch; bit-identical to the stateless
    path by merge-order invariance (asserted in tests).
    """
    import ray as _ray

    @_ray.remote
    class _SketchActor:
        def __init__(self):
            self.sketch = DDSketch(alpha, bin_limit, offset, mode)

        def consume(self, it) -> dict:
            for batch in it.iter_batches(batch_format="pyarrow",
                                         batch_size=65536):
                col = batch[value_col]
                if col.null_count:
                    batch = batch.filter(col.is_valid())
                    col = batch[value_col]
                v = col.to_numpy(zero_copy_only=False).astype(
                    np.float64, copy=False)
                w = (batch[weight_col].to_numpy(zero_copy_only=False)
                     .astype(np.float64, copy=False)
                     if weight_col else None)
                self.sketch.add_batch(v, w)
            return self.sketch.to_row()

    cols = [value_col] + ([weight_col] if weight_col else [])
    splits = ds.select_columns(cols).streaming_split(
        n_actors, equal=False)
    actors = [_SketchActor.remote() for _ in range(n_actors)]
    rows = _ray.get([a.consume.remote(it)
                     for a, it in zip(actors, splits)])
    for a in actors:
        _ray.kill(a)
    merged = DDSketch.from_row(rows[0])
    for r in rows[1:]:
        merged.merge(DDSketch.from_row(r))
    return merged
