"""DDSketch as a native Ray Data ``AggregateFnV2``.

``ds.groupby(key).aggregate(DDSketchQuantiles(on=...))`` -- Ray Data's hash
aggregate does the per-block partial (aggregate_block ~ DDS_AddCollapse over
a block, ddsketch.cc:213-257) and the cross-block tree combine (combine ~
the exact-sum merge replacing DDS_MergeCollapse, ddsketch.cc:559-647).
This maps the reference's init/add/merge/query lifecycle (SURVEY.md
section 2.1 K1/K9/K16/K15) directly onto Ray's partial+final UDAF shape.

The explicit two-stage path in ``stages.sketch_build`` remains the default
for pipelines (it exposes the partial rows for checkpointing); this wrapper
is the idiomatic one-liner and is cross-checked against it in tests.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

from ..config import DEFAULT_ALPHA, DEFAULT_BIN_LIMIT, DEFAULT_OFFSET, HEADLINE_QUANTILES
from ..sketches.ddsketch import DDSketch

try:  # AggregateFnV2 is present in Ray >= 2.44; gate for portability
    from ray.data.aggregate import AggregateFnV2
except ImportError:  # pragma: no cover
    AggregateFnV2 = None


def _zero(alpha: float, bin_limit: int, offset: int, mode: str) -> DDSketch:
    return DDSketch(alpha, bin_limit, offset, mode)


if AggregateFnV2 is not None:

    class DDSketchQuantiles(AggregateFnV2):
        """Grouped DDSketch quantiles as one aggregate column.

        The output column holds a fixed-length list of quantile estimates
        (one per q in ``quantiles``), optionally rounded.
        """

        def __init__(self, on: str, quantiles: Sequence[float] = HEADLINE_QUANTILES,
                     alpha: float = DEFAULT_ALPHA,
                     bin_limit: int = DEFAULT_BIN_LIMIT,
                     offset: int = DEFAULT_OFFSET, mode: str = "uniform",
                     round_digits: int | None = None,
                     alias_name: str | None = None):
            from functools import partial
            self._on_col = on
            self._qs = tuple(quantiles)
            self._round = round_digits
            self._factory = partial(_zero, alpha, bin_limit, offset, mode)
            super().__init__(
                alias_name or f"dds_quantiles({on})",
                zero_factory=self._factory,
                on=on, ignore_nulls=True)

        def aggregate_block(self, block: pa.Table) -> DDSketch:
            acc = self._factory()
            col = block[self._on_col]
            if col.null_count:
                col = col.drop_null()
            acc.add_batch(col.to_numpy(zero_copy_only=False).astype(np.float64,
                                                                    copy=False))
            return acc

        def combine(self, current: DDSketch, new: DDSketch) -> DDSketch:
            return current.merge(new)

        def finalize(self, acc: DDSketch) -> list[float]:
            ests = acc.quantiles(self._qs)
            if self._round is not None:
                ests = [round(e, self._round) for e in ests]
            return ests

else:  # pragma: no cover
    DDSketchQuantiles = None
