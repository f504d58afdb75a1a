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


def _flat_binary(col) -> tuple[np.ndarray, np.ndarray]:
    """(bytes, rebased offsets) view of a binary/large_binary column."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    arr = arr.fill_null(b"") if arr.null_count else arr
    bufs = arr.buffers()
    if pa.types.is_large_binary(arr.type) or pa.types.is_large_string(arr.type):
        off = np.frombuffer(bufs[1], dtype=np.int64)
    else:
        off = np.frombuffer(bufs[1], dtype=np.int32).astype(np.int64)
    off = off[arr.offset: arr.offset + len(arr) + 1]
    if bufs[2] is None:
        return np.zeros(0, dtype=np.uint8), off - off[0]
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    return data[off[0]: off[-1]], off - off[0]


class FrameSample:
    """Actor-pool stage: sample every ``every``-th fixed-size frame from a
    binary payload (the video-ingest shape: container -> frame subset).
    The real demuxer is stubbed exactly like BinaryFeatureExtract
    (``decode="real"`` raises; codec libs absent); the default treats the
    payload as a raw sequence of ``frame_bytes``-byte frames, which keeps
    ALL the Ray-side plumbing real: ragged per-row output sizes, flat
    zero-copy gather (one fancy-index over the batch's byte buffer, no
    per-row Python), LargeBinary offset construction, actor signature.

    Output per row: n_frames, n_sampled, sampled (the sampled frames'
    bytes, concatenated).
    """

    def __init__(self, column: str = "payload", frame_bytes: int = 256,
                 every: int = 4, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real video demuxing requires codec libraries not present "
                "in this environment; use decode='fake' (fixed-stride "
                "frames with identical plumbing)")
        if frame_bytes < 1 or every < 1:
            raise ValueError("frame_bytes and every must be >= 1")
        self.column = column
        self.fb = frame_bytes
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        fb, every = self.fb, self.every
        data, off = _flat_binary(batch[self.column])
        lengths = np.diff(off)
        n_frames = lengths // fb
        n_sampled = (n_frames + every - 1) // every
        total = int(n_sampled.sum())
        if total:
            doc_rep = np.repeat(np.arange(batch.num_rows), n_sampled)
            excl = np.concatenate([[0], np.cumsum(n_sampled)[:-1]])
            local = np.arange(total) - np.repeat(excl, n_sampled)
            starts = off[:-1][doc_rep] + local * np.int64(every * fb)
            idx = starts[:, None] + np.arange(fb)[None, :]
            out_bytes = np.ascontiguousarray(data[idx.ravel()])
        else:
            out_bytes = np.zeros(0, dtype=np.uint8)
        out_off = np.concatenate(
            [[0], np.cumsum(n_sampled * np.int64(fb))]).astype(np.int64)
        sampled = pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), batch.num_rows,
            [None, pa.py_buffer(out_off), pa.py_buffer(out_bytes)])
        return pa.table({
            "n_frames": pa.array(n_frames, type=pa.int64()),
            "n_sampled": pa.array(n_sampled, type=pa.int64()),
            "sampled": sampled,
        })


class Resize:
    """Actor-pool stage: nearest-neighbor "resize" of a binary payload
    interpreted as a ``stride``-bytes-per-row grayscale raster down to a
    fixed ``target x target`` thumbnail (the image-preprocess shape).
    Real image decoding is stubbed (``decode="real"`` raises); the fake
    keeps the plumbing real: per-row ragged heights, one broadcasted
    integer index grid per batch, clipped tail gather, FixedSizeList
    uint8 output (zero-copy from the flat thumbnail matrix).
    """

    def __init__(self, column: str = "payload", stride: int = 64,
                 target: int = 8, decode: str = "fake"):
        if decode == "real":
            raise NotImplementedError(
                "real image decoding requires codec libraries not present "
                "in this environment; use decode='fake' (raster-stride "
                "resize with identical plumbing)")
        if stride < 1 or target < 1:
            raise ValueError("stride and target must be >= 1")
        self.column = column
        self.stride = stride
        self.target = target
        # actor-lifetime state: the fixed column sample positions
        self._cols = (np.arange(target) * stride) // target

    def __call__(self, batch: pa.Table) -> pa.Table:
        t_, stride = self.target, self.stride
        data, off = _flat_binary(batch[self.column])
        lengths = np.diff(off)
        heights = np.maximum((lengths + stride - 1) // stride, 1)
        # per-doc sampled row indices: r[i, j] = (j * H_i) // target
        rows = (np.arange(t_)[None, :] * heights[:, None]) // t_
        # absolute byte index, clipped into each doc's span (ragged tail)
        idx = (off[:-1, None, None] + rows[:, :, None] * stride
               + self._cols[None, None, :])
        hi = np.maximum(off[1:], off[:-1] + 1) - 1
        idx = np.minimum(idx, hi[:, None, None])
        # an empty trailing doc clips to off[-1] == len(data): bound the
        # gather globally too (its row is zeroed below anyway)
        idx = np.minimum(idx, max(data.size - 1, 0))
        if data.size:
            thumb = data[idx.ravel()]
        else:
            thumb = np.zeros(idx.size, dtype=np.uint8)
        empty = lengths == 0
        if empty.any():
            thumb = thumb.reshape(batch.num_rows, t_ * t_)
            thumb[empty] = 0
            thumb = thumb.ravel()
        return pa.table({
            "payload_size": pa.array(lengths, type=pa.int64()),
            "thumb": pa.FixedSizeListArray.from_arrays(
                pa.array(thumb, type=pa.uint8()), t_ * t_),
        })


def frame_sample_stats_by_group(ds, payload_col: str, group_col: str,
                                *, frame_bytes: int = 256, every: int = 4,
                                batch_size: int = 256):
    """Frame-sampling pipeline shape over any table: payload -> actor-pool
    FrameSample -> per-group rollup (docs, frames, sampled frames,
    sampled bytes).  All four outputs are exact integer arithmetic on
    payload lengths, so the plumbing is fully SQL-replicable."""
    from ray.data.aggregate import Count, Sum

    def to_payload(t: pa.Table) -> pa.Table:
        col = t[payload_col]
        if pa.types.is_string(col.type):
            col = pa.compute.cast(col, pa.binary())
        elif pa.types.is_large_string(col.type):
            col = pa.compute.cast(col, pa.large_binary())
        return pa.table({group_col: t[group_col], "payload": col})

    sampler = FrameSample(column="payload", frame_bytes=frame_bytes,
                          every=every)

    def sample(t: pa.Table) -> pa.Table:
        out = sampler(t)
        return pa.table({
            group_col: t[group_col],
            "n_frames": out["n_frames"],
            "n_sampled": out["n_sampled"],
            "sampled_bytes": pa.compute.cast(
                pa.compute.binary_length(out["sampled"]), pa.int64()),
        })

    agg = (ds.map_batches(to_payload, batch_format="pyarrow",
                          zero_copy_batch=True)
           .map_batches(sample, batch_format="pyarrow",
                        batch_size=batch_size)
           .groupby(group_col)
           .aggregate(Count(alias_name="n_docs"),
                      Sum("n_frames", alias_name="sum_frames"),
                      Sum("n_sampled", alias_name="sum_sampled"),
                      Sum("sampled_bytes", alias_name="sum_sampled_bytes")))

    def finalize(t: pa.Table) -> pa.Table:
        cols = {group_col: t[group_col]}
        for c in ("n_docs", "sum_frames", "sum_sampled",
                  "sum_sampled_bytes"):
            cols[c] = pa.compute.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")


def resize_stats_by_group(ds, payload_col: str, group_col: str, *,
                          stride: int = 64, target: int = 8,
                          batch_size: int = 256):
    """Resize pipeline shape over any table: payload -> actor-pool
    ``Resize`` (map_batches over a callable CLASS: the index grid is
    actor-lifetime state) -> per-group rollup (docs, payload bytes, and
    a position-weighted THUMBNAIL CHECKSUM -- sum over thumbnail cells
    of byte * (cell index + 1)).  The checksum pins every sampled byte
    of every thumbnail, so the whole ragged gather (per-doc heights,
    clipped tails) is SQL-replicable cell by cell."""
    from ray.data.aggregate import Count, Sum

    def to_payload(t: pa.Table) -> pa.Table:
        col = t[payload_col]
        if pa.types.is_string(col.type):
            col = pa.compute.cast(col, pa.binary())
        elif pa.types.is_large_string(col.type):
            col = pa.compute.cast(col, pa.large_binary())
        return pa.table({group_col: t[group_col], "payload": col})

    weights = np.arange(1, target * target + 1, dtype=np.int64)

    class _ResizeChecksum(Resize):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            flat = out["thumb"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False).astype(np.int64)
            mat = flat.reshape(batch.num_rows, target * target)
            return pa.table({
                group_col: batch[group_col],
                "payload_size": out["payload_size"],
                "checksum": pa.array(mat @ weights, type=pa.int64()),
            })

    agg = (ds.map_batches(to_payload, batch_format="pyarrow",
                          zero_copy_batch=True)
           .map_batches(_ResizeChecksum, batch_format="pyarrow",
                        batch_size=batch_size, concurrency=2,
                        fn_constructor_kwargs={"column": "payload",
                                               "stride": stride,
                                               "target": target})
           .groupby(group_col)
           .aggregate(Count(alias_name="n_docs"),
                      Sum("payload_size", alias_name="sum_payload"),
                      Sum("checksum", alias_name="thumb_checksum")))

    def finalize(t: pa.Table) -> pa.Table:
        cols = {group_col: t[group_col]}
        for c in ("n_docs", "sum_payload", "thumb_checksum"):
            cols[c] = pa.compute.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finalize, batch_format="pyarrow")
