"""Per-block top-k prereduce before a global sort+limit.

``ds.sort(...).limit(k)`` is an all-to-all exchange of every row; a
block-local top-k first shrinks the shuffle input from O(rows) to
O(blocks * k) -- at 10^9-row tables the sort then moves kilobytes.
Correct for any batch granularity because top-k is a semigroup reduction:
topk(concat(A, B)) == topk(concat(topk(A), topk(B))).  Sort keys must
make the global order total (include a tiebreaker column) for the result
to be deterministic.
"""

from __future__ import annotations

from typing import Sequence

import pyarrow as pa


def topk_prereduce(sort_keys: Sequence[tuple[str, str]], k: int):
    """map_batches body factory: keep each batch's top-k rows under
    ``sort_keys`` (pyarrow sort_by order tuples: (col, 'ascending' |
    'descending'))."""
    keys = list(sort_keys)

    def fn(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.sort_by(keys).slice(0, k)

    return fn


def topk(ds, sort_keys: Sequence[tuple[str, str]], k: int):
    """Distributed deterministic top-k: block-local prereduce, then the
    (now tiny) global sort + limit."""
    cols = [c for c, _ in sort_keys]
    desc = [d == "descending" for _, d in sort_keys]
    return (ds.map_batches(topk_prereduce(sort_keys, k),
                           batch_format="pyarrow", zero_copy_batch=True)
            .sort(cols, descending=desc).limit(k))
