"""Zero-copy Arrow list-column <-> numpy matrix conversion.

Every embedding-consuming stage (knn, IVF, embedding dedup) needs the
``list<float>`` column as a 2-D numpy matrix.  ``to_pylist()`` round-trips
every vector through Python objects (measured: dominates per-batch cost);
this helper reshapes the flat Arrow values buffer instead -- zero-copy for
the common float64 case, one vectorized cast otherwise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_to_matrix(col: pa.Array | pa.ChunkedArray,
                   dtype=np.float64) -> np.ndarray:
    """Convert a list/large_list/fixed_size_list column of numbers to an
    (n, d) numpy matrix without per-row Python.

    Raises ValueError on ragged rows (embedding columns are fixed-width by
    contract) or nulls.
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        raise ValueError("null embeddings not supported")
    n = len(col)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    t = col.type
    if pa.types.is_fixed_size_list(t):
        width = t.list_size
        flat = col.values.to_numpy(zero_copy_only=False)
        start = col.offset * width
        mat = flat[start:start + n * width].reshape(n, width)
        return mat.astype(dtype, copy=False)
    # variable-length list: offsets are int32 (list) or int64 (large_list);
    # col.offsets already accounts for any slice offset
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    widths = np.diff(offsets)
    width = int(widths[0])
    if not (widths == width).all():
        raise ValueError("ragged list column; expected fixed-width vectors")
    flat = col.values.to_numpy(zero_copy_only=False)
    mat = flat[offsets[0]:offsets[-1]].reshape(n, width)
    return mat.astype(dtype, copy=False)
