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


def binary_features_by_group(ds, payload_col: str, group_col: str,
                             *, n_bins: int = 16, batch_size: int = 256):
    """Multimodal pipeline shape over any table: treat ``payload_col`` as
    an opaque binary payload, decode/feature-extract in an actor pool
    (small batches -- payloads are wide), and aggregate per group.

    Output: one row per group with ``n_docs``, ``sum_payload_bytes``
    (both exactly SQL-replicable -- the oracle checks the plumbing), and
    ``mean_features`` (the decoder output, verified by unit tests; a real
    image/audio decoder drops in via ``decode="real"``).
    """
    import numpy as np

    import ray.data  # noqa: F401  (Dataset API)
    from ray.data.aggregate import Count, Sum

    def to_payload(t: pa.Table) -> pa.Table:
        col = t[payload_col]
        if pa.types.is_string(col.type):
            col = pa.compute.cast(col, pa.binary())
        elif pa.types.is_large_string(col.type):
            col = pa.compute.cast(col, pa.large_binary())
        return pa.table({group_col: t[group_col], "payload": col})

    extract = BinaryFeatureExtract(column="payload", n_bins=n_bins)

    def featurize(t: pa.Table) -> pa.Table:
        out = extract(t)
        feats = out["features"]
        flat = np.asarray(feats.combine_chunks().values.to_numpy(
            zero_copy_only=False)).reshape(t.num_rows, n_bins)
        cols = {group_col: t[group_col],
                "payload_size": out["payload_size"]}
        # integer micro-units so the grouped mean is exactly reproducible
        for b in range(n_bins):
            cols[f"f{b}_micro"] = pa.array(
                np.floor(flat[:, b] * 1e6 + 0.5).astype(np.int64))
        return pa.table(cols)

    aggs = [Count(alias_name="n_docs"),
            Sum("payload_size", alias_name="sum_payload_bytes")]
    aggs += [Sum(f"f{b}_micro", alias_name=f"f{b}_micro")
             for b in range(n_bins)]
    agg = (ds.map_batches(to_payload, batch_format="pyarrow",
                          zero_copy_batch=True)
           .map_batches(featurize, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby(group_col).aggregate(*aggs))

    def finalize(t: pa.Table) -> pa.Table:
        n = pa.compute.cast(t["n_docs"], pa.float64())
        mean_cols = [
            pa.compute.divide(
                pa.compute.divide(
                    pa.compute.cast(t[f"f{b}_micro"], pa.float64()),
                    pa.scalar(1e6)), n)
            for b in range(n_bins)]
        mat = np.stack([np.asarray(c) for c in mean_cols], axis=1)
        return pa.table({
            group_col: t[group_col],
            "n_docs": pa.compute.cast(t["n_docs"], pa.int64()),
            "sum_payload_bytes": pa.compute.cast(t["sum_payload_bytes"],
                                                 pa.int64()),
            "mean_features": pa.FixedSizeListArray.from_arrays(
                mat.reshape(-1), n_bins),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


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
        # FixedSizeListArray.from_arrays on the flat buffer: zero-copy
        # (pa.array over a list of numpy rows is orders slower)
        return pa.table({
            "payload_size": sizes,
            "features": pa.FixedSizeListArray.from_arrays(
                feats.reshape(-1), self.n_bins),
        })
