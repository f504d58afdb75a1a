"""Any Sketch-protocol accumulator as a native Ray Data AggregateFnV2.

Generalizes stages.sketch_agg's DDSketch wrapper to the whole sketch
family (SURVEY.md section 2.4: one protocol, many sketches), so

    ds.groupby("lang").aggregate(SketchAggregate(
        on="user_id", factory=lambda: HyperLogLog(p=12),
        add=lambda s, col: s.add_batch(col),
        finalize=lambda s: s.estimate()))

runs HLL (or count-min, Bloom, KLL, DDSketch) through Ray's partial+final
combine exactly like a built-in aggregation.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa

try:
    from ray.data.aggregate import AggregateFnV2
except ImportError:  # pragma: no cover
    AggregateFnV2 = None


def _default_add(sketch, col: pa.Array) -> None:
    sketch.add_batch(col.to_numpy(zero_copy_only=False))


if AggregateFnV2 is not None:

    class SketchAggregate(AggregateFnV2):
        """Grouped aggregation of any mergeable accumulator."""

        def __init__(self, on: str, factory: Callable[[], object],
                     add: Callable[[object, pa.Array], None] = _default_add,
                     finalize: Callable[[object], object] = None,
                     alias_name: str | None = None):
            self._on_col = on
            self._factory = factory
            self._add = add
            self._finalize_fn = finalize
            super().__init__(alias_name or f"sketch({on})",
                             zero_factory=factory, on=on, ignore_nulls=True)

        def aggregate_block(self, block: pa.Table):
            acc = self._factory()
            col = block[self._on_col]
            if col.null_count:
                col = col.drop_null()
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            self._add(acc, col)
            return acc

        def combine(self, current, new):
            return current.merge(new)

        def finalize(self, acc):
            return self._finalize_fn(acc) if self._finalize_fn else acc

else:  # pragma: no cover
    SketchAggregate = None
