"""Multimodal (binary-payload) stages.

Images/audio/video are opaque ``binary`` columns with typed metadata; the
decode / feature-extract stages are actor-pool ``map_batches`` callables
(state built once per actor in __init__).  The image/audio codec libraries
are NOT in this container, so the decode step is STUBBED: ``decode="real"``
raises NotImplementedError at actor construction; the default
``decode="fake"`` computes deterministic features from the raw bytes with
fully real Ray-side plumbing (schema, batch sizing, actor signature,
output layout), so swapping in a real decoder is a one-function change.

Usage:
    ds.map_batches(BinaryFeatureExtract, batch_format="pyarrow",
                   batch_size=256,        # binary payloads are wide: small batches
                   concurrency=8, num_cpus=1)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _byte_histogram_features(payloads: pa.Array, n_bins: int = 16) -> np.ndarray:
    """Deterministic stand-in 'embedding': n_bins byte-histogram fractions
    per payload, vectorized over the flat Arrow binary buffer
    (np.add.reduceat over value bytes -- no per-byte Python)."""
    arr = payloads.combine_chunks() if isinstance(payloads, pa.ChunkedArray) else payloads
    arr = arr.fill_null(b"") if arr.null_count else arr
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off_dtype, off_width = np.int64, 8
    else:
        off_dtype, off_width = np.int32, 4
    buffers = arr.buffers()
    offs = np.frombuffer(buffers[1], dtype=off_dtype, count=len(arr) + 1,
                         offset=arr.offset * off_width).astype(np.int64)
    data = np.frombuffer(buffers[2], dtype=np.uint8) if buffers[2] else \
        np.empty(0, dtype=np.uint8)
    binned = (data >> np.uint8(4)).astype(np.int64) if n_bins == 16 else \
        (data.astype(np.int64) * n_bins) // 256
    lengths = np.diff(offs)
    row_idx = np.repeat(np.arange(len(arr), dtype=np.int64), lengths)
    counts = np.bincount(row_idx * n_bins + binned,
                         minlength=len(arr) * n_bins).astype(np.float64)
    out = counts.reshape(len(arr), n_bins)
    nonempty = lengths > 0
    out[nonempty] /= lengths[nonempty, None]
    return out


class BinaryFeatureExtract:
    """Actor-pool stage: binary column -> size + deterministic features.

    Parameters are bound via functools.partial-style fn_constructor_kwargs
    or a subclass; ``decode="real"`` marks where a genuine image/audio
    decoder would load (unavailable in this container).
    """

    def __init__(self, column: str = "html", decode: str = "fake",
                 n_bins: int = 16):
        if decode == "real":
            raise NotImplementedError(
                "real media decoding requires codec libraries not present "
                "in this environment; use decode='fake' (deterministic "
                "byte-histogram features with identical plumbing)")
        self.column = column
        self.n_bins = n_bins
        # actor-lifetime state (built once): bin lookup table
        self._bin_edges = np.arange(n_bins)

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch[self.column]
        feats = _byte_histogram_features(col, self.n_bins)
        sizes = pa.compute.cast(pa.compute.binary_length(col), pa.int64())
        return pa.table({
            "payload_size": sizes,
            "features": pa.array(list(feats), type=pa.list_(pa.float64())),
        })
