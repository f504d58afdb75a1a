"""Sliding-window quantiles: the turnstile use of the DDSketch kernel.

The reference supports deletes at the data-structure level
(DDS_DeleteCollapse*, ddsketch.cc:343-518) but its driver never uses
them (SURVEY.md section 2.4: "a sliding-window build is possible but
unimplemented").  This module implements it: quantiles over the trailing
W hours at every hour boundary, in ONE distributed pass.

Dataflow (no per-event streaming state, no reprocessing):

    events -> map_batches: per-(block, hour-bucket) partial sketches
           -> groupby(bucket).map_groups(merge)   # one sketch per hour
           -> driver: for each hour h, window sketch = window sketch
              + sketch[h] - sketch[h-W]  (exact add/delete of whole
              buckets -- integer bin counts make this lossless)

    The per-hour sketches are kilobytes, so the sliding pass over
    buckets is driver-trivial no matter how many events each hour holds;
    the heavy lifting stays in the distributed partial build.

Window semantics: window(h) covers buckets (h-W, h] (trailing W hours
inclusive of the current hour).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..config import DEFAULT_BIN_LIMIT, DEFAULT_OFFSET, PRACTICAL_ALPHA
from ..sketches.ddsketch import DDSketch
from ..stages.sketch_build import merge_sketch_table


def sliding_window_quantiles(ds: "ray.data.Dataset", ts_col: str,
                             value_col: str, *,
                             window_hours: int = 24,
                             quantiles: Sequence[float] = (0.5, 0.95, 0.99),
                             alpha: float = PRACTICAL_ALPHA,
                             bin_limit: int = DEFAULT_BIN_LIMIT,
                             offset: int = DEFAULT_OFFSET,
                             include_bucket_key: bool = False) -> pa.Table:
    """One row per (hour, q): quantile estimates over the trailing
    ``window_hours`` at every hour boundary present in the data.

    The subtraction step requires uniform mode with NO gamma^2 collapse
    drift between buckets: all bucket sketches share (alpha, generation
    0) by construction here (bin_limit is sized for the key span), so
    delete == exact bin-wise subtraction.
    """
    from ..stages.sketch_build import partial_builder

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())
        return pa.table({
            "bucket": pc.divide(us, pa.scalar(3_600_000_000)),
            value_col: t[value_col],
        })

    from ..stages.partition import fit_partitions, partition_by
    from ..stages.sketch_build import SKETCH_FIELDS

    partials = (ds.map_batches(bucketize, batch_format="pyarrow",
                               zero_copy_batch=True)
                .map_batches(partial_builder(value_col, ["bucket"],
                                             alpha=alpha,
                                             bin_limit=bin_limit,
                                             offset=offset),
                             batch_format="pyarrow", batch_size=65536,
                             zero_copy_batch=True))
    empty = pa.table({"bucket": pa.array([], type=pa.int64()),
                      **{name: pa.array([], type=typ)
                         for name, typ in SKETCH_FIELDS}})
    # one coarse partition per worker, many buckets per call -- NOT
    # groupby().map_groups (one Python call per bucket: ~10 ms x
    # thousands of hour buckets of pure overhead)
    per_bucket = partition_by(partials, ["bucket"], fit_partitions(32),
                              _merge_partition_buckets, empty)

    tables = [t for t in map(ray.get,
                             per_bucket.materialize().to_arrow_refs())
              if t.num_rows]
    if not tables:
        raise ValueError("empty dataset")
    all_rows = pa.concat_tables(tables)
    bucket_vals = all_rows["bucket"].to_numpy(zero_copy_only=False)
    buckets = np.sort(bucket_vals)
    from ..stages.sketch_build import sketches_from_table
    decoded = sketches_from_table(all_rows)  # columnar batch decode
    sketches = {int(b): s for b, s in zip(bucket_vals, decoded)}

    _validate_turnstile(decoded, alpha, bin_limit,
                        "sliding_window_quantiles")
    out_hour, out_q, out_est, out_n, out_key = _window_walk(
        sketches, tuple(quantiles), window_hours, alpha, bin_limit,
        offset)
    cols = {
        "window_end": pa.array(out_hour, type=pa.int64()),
        "q": pa.array(out_q, type=pa.float64()),
        "est": pa.array(out_est, type=pa.float64()),
        "n": pa.array(out_n, type=pa.float64()),
    }
    if include_bucket_key:
        cols["bucket_key"] = pa.array(out_key, type=pa.int64())
    return pa.table(cols)


def _validate_turnstile(decoded, alpha, bin_limit, label: str) -> None:
    """Validate the turnstile contract up front (ADVICE r2): the
    sliding subtraction needs every bucket sketch at generation 0 AND
    the merged key span within bin_limit, else a collapse (generation
    bump) during the walk would raise an opaque generation-mismatch
    mid-loop."""
    if any(s.generation != 0 for s in decoded):
        raise ValueError(
            f"{label}: bin_limit={bin_limit} is too small "
            f"for a single hour bucket at alpha={alpha} (a bucket sketch "
            "already collapsed); raise bin_limit or alpha")
    distinct_keys = len(set().union(*(s.bins.keys() for s in decoded)))
    if distinct_keys > bin_limit:
        raise ValueError(
            f"{label}: the union of bucket sketches has "
            f"{distinct_keys} distinct bins, exceeding bin_limit="
            f"{bin_limit} at alpha={alpha}; the accumulating window would "
            f"collapse mid-walk -- raise bin_limit (to >= {distinct_keys}) "
            "or increase alpha")


def _window_walk(sketches: dict[int, DDSketch], qs: tuple,
                 window_hours: int, alpha: float, bin_limit: int,
                 offset: int):
    """The driver-side trailing-window walk: merge the entering hour,
    subtract the leaving one, read the quantile keys.  Per-hour
    sketches are kilobytes, so this is driver-trivial for any event
    volume (the distributed build did the heavy lifting)."""
    out_hour, out_q, out_est, out_n, out_key = [], [], [], [], []
    window = DDSketch(alpha, bin_limit, offset, "uniform")
    lo, hi = min(sketches), max(sketches)
    for h in range(lo, hi + 1):
        s_in = sketches.get(h)
        if s_in is not None:
            window.merge(s_in.copy())
        drop = sketches.get(h - window_hours)
        if drop is not None:
            _subtract(window, drop)
        if window.n <= 0:
            continue
        for q in qs:
            key = window.quantile_key(q)
            out_hour.append(h * 3600)
            out_q.append(q)
            out_est.append(window._bucket_estimate(key))
            out_n.append(window.n)
            out_key.append(key)
    return out_hour, out_q, out_est, out_n, out_key


def sliding_window_quantiles_grouped(
        ds: "ray.data.Dataset", ts_col: str, value_col: str,
        group_col: str, *, window_hours: int = 24,
        quantiles: Sequence[float] = (0.5, 0.95, 0.99),
        alpha: float = PRACTICAL_ALPHA,
        bin_limit: int = DEFAULT_BIN_LIMIT,
        offset: int = DEFAULT_OFFSET) -> pa.Table:
    """GROUPED turnstile: the sliding-window quantile walk PER GROUP
    (e.g. per event type) -- completes the window x sketch x group
    composition matrix (VERDICT r3 item 8).  One row per (group, hour,
    q) covering the trailing ``window_hours`` of that group's events.

    Scale shape: per-(block, group, hour) partial sketches (the group
    rides as an int64 fingerprint so the co-partition key stays
    numeric); one coarse (gfp, bucket) co-partition merge; the driver
    holds groups x hours kilobyte sketch rows and walks each group
    independently -- the same driver bound as the global walk times the
    (bounded) group count.  Group-name lookup is a separate tiny
    column-pruned distinct, never a corpus-sized structure.
    """
    from ..functions.text import fingerprint64
    from ..stages.partition import fit_partitions, partition_by
    from ..stages.sketch_build import (SKETCH_FIELDS, partial_builder,
                                       sketch_rows_to_table,
                                       sketches_from_table)

    def bucketize(t: pa.Table) -> pa.Table:
        us = pc.cast(t[ts_col], pa.int64())
        return pa.table({
            "gfp": fingerprint64(t[group_col]),
            "bucket": pc.divide(us, pa.scalar(3_600_000_000)),
            value_col: t[value_col],
        })

    partials = (ds.map_batches(bucketize, batch_format="pyarrow",
                               zero_copy_batch=True)
                .map_batches(partial_builder(value_col,
                                             ["gfp", "bucket"],
                                             alpha=alpha,
                                             bin_limit=bin_limit,
                                             offset=offset),
                             batch_format="pyarrow", batch_size=65536,
                             zero_copy_batch=True))
    empty = pa.table({"gfp": pa.array([], type=pa.int64()),
                      "bucket": pa.array([], type=pa.int64()),
                      **{name: pa.array([], type=typ)
                         for name, typ in SKETCH_FIELDS}})

    def merge_runs(part: pa.Table) -> pa.Table:
        g = part["gfp"].to_numpy(zero_copy_only=False)
        b = part["bucket"].to_numpy(zero_copy_only=False)
        order = np.lexsort((b, g))
        part = part.take(pa.array(order))
        g, b = g[order], b[order]
        new = np.ones(g.size, dtype=bool)
        new[1:] = (g[1:] != g[:-1]) | (b[1:] != b[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], g.size)
        rows, gs, bs = [], [], []
        for s, e in zip(starts.tolist(), ends.tolist()):
            rows.append(merge_sketch_table(part.slice(s, e - s)).to_row())
            gs.append(int(g[s]))
            bs.append(int(b[s]))
        out = sketch_rows_to_table(rows)
        out = out.add_column(0, "bucket", pa.array(bs, type=pa.int64()))
        return out.add_column(0, "gfp", pa.array(gs, type=pa.int64()))

    per_gb = partition_by(partials, ["gfp", "bucket"],
                          fit_partitions(32), merge_runs, empty)
    tables = [t for t in map(ray.get,
                             per_gb.materialize().to_arrow_refs())
              if t.num_rows]
    if not tables:
        raise ValueError("empty dataset")
    all_rows = pa.concat_tables(tables)
    gfp_vals = all_rows["gfp"].to_numpy(zero_copy_only=False)
    bucket_vals = all_rows["bucket"].to_numpy(zero_copy_only=False)
    decoded = sketches_from_table(all_rows)
    _validate_turnstile(decoded, alpha, bin_limit,
                        "sliding_window_quantiles_grouped")

    # group-name lookup: bounded distinct over the pruned group column
    names = (ds.map_batches(
        lambda t: pa.table({
            "g": pc.unique(t[group_col].combine_chunks()),
        }).append_column("gfp", fingerprint64(pc.unique(
            t[group_col].combine_chunks()))),
        batch_format="pyarrow")
        .to_pandas().drop_duplicates("gfp"))
    name_of = dict(zip(names["gfp"].astype(np.int64), names["g"]))

    qs = tuple(quantiles)
    out = {"group": [], "window_end": [], "q": [], "est": [], "n": []}
    for gfp in sorted(set(gfp_vals.tolist())):
        sel = gfp_vals == gfp
        sketches = {int(b): s for b, s, m in
                    zip(bucket_vals, decoded, sel) if m}
        hrs, qq, est, n, _ = _window_walk(sketches, qs, window_hours,
                                          alpha, bin_limit, offset)
        out["group"].extend([name_of[gfp]] * len(hrs))
        out["window_end"].extend(hrs)
        out["q"].extend(qq)
        out["est"].extend(est)
        out["n"].extend(n)
    return pa.table({
        group_col: pa.array(out["group"], type=pa.string()),
        "window_end": pa.array(out["window_end"], type=pa.int64()),
        "q": pa.array(out["q"], type=pa.float64()),
        "est": pa.array(out["est"], type=pa.float64()),
        "n": pa.array(out["n"], type=pa.float64()),
    })


def _merge_partition_buckets(part: pa.Table) -> pa.Table:
    """partition_by body: fold each bucket's partial rows within this
    partition to one row per bucket (vectorized run detection over the
    sorted bucket column; one Python merge loop per bucket, zero Ray
    per-group overhead)."""
    from ..stages.sketch_build import sketch_rows_to_table
    b = part["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(b, kind="mergesort")
    part = part.take(pa.array(order))
    b = b[order]
    starts = np.concatenate([[0], np.nonzero(np.diff(b) != 0)[0] + 1])
    ends = np.concatenate([starts[1:], [b.shape[0]]])
    rows, vals = [], []
    for s, e in zip(starts.tolist(), ends.tolist()):
        rows.append(merge_sketch_table(part.slice(s, e - s)).to_row())
        vals.append(int(b[s]))
    out = sketch_rows_to_table(rows)
    return out.add_column(0, "bucket", pa.array(vals, type=pa.int64()))


def _subtract(acc: DDSketch, other: DDSketch) -> None:
    """Exact bin-wise subtraction (the bulk form of DDS_DeleteCollapse,
    ddsketch.cc:343-393): every bin of ``other`` was previously merged
    into ``acc`` and bin counts are integers, so this is lossless."""
    if acc.generation != other.generation:
        raise ValueError("subtract requires equal collapse generation")
    bins = acc.bins
    for k, c in other.bins.items():
        cur = bins.get(k, 0.0)
        if cur - c <= 0:
            bins.pop(k, None)
        else:
            bins[k] = cur - c
    acc.n -= other.n


def hll_sliding_users(sf_dir: str, *, window_hours: int = 24,
                      p: int = 12) -> pa.Table:
    """Sliding-window DISTINCT: HLL estimate of unique users over the
    trailing ``window_hours`` at every hour boundary -- the
    streaming-window x sketch composition for a register-max sketch
    (the DDSketch version above subtracts whole buckets; HLL cannot
    subtract, so the window merge is a per-window MAX over the hourly
    register matrix -- one vectorized sliding_window_view pass).

    Distributed part: per-(block, hour) register rows built with ONE
    composite scatter-max per batch -> coarse-partitioned per-hour
    register-max merge; the driver holds only the hours x m uint8
    register matrix (90 days x 4 KB = ~9 MB), same driver bound as the
    DDSketch sliding walk.  Window semantics match: window(h) covers
    hours (h - W, h]."""
    from ..sketches.hll import HyperLogLog

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "user_id"])

    from ..hashing import murmur64
    from ..sketches.hll import register_updates

    m = 1 << p

    def partials(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks() if isinstance(
            t["ts"], pa.ChunkedArray) else t["ts"]
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uh, inv = np.unique(hour, return_inverse=True)
        idx, rho = register_updates(murmur64(uid), p)
        # one composite scatter-max builds every hour's registers at once
        # (no per-hour Python, no per-hour HLL objects)
        mat = np.zeros((uh.shape[0], m), dtype=np.uint8)
        np.maximum.at(mat, (inv, idx), rho)
        return pa.table({
            "hour": pa.array(uh.astype(np.int64)),
            "blob": pa.array([mat[i].tobytes()
                              for i in range(uh.shape[0])],
                             type=pa.binary()),
        })

    merge_empty = pa.table({"hour": pa.array([], type=pa.int64()),
                            "regs": pa.array([], type=pa.binary())})

    def merge_partition(t: pa.Table) -> pa.Table:
        # vectorized per-hour register max: one coarse partition holds
        # many hours (groupby().map_groups at ~10 ms/group is the
        # measured Ray 2.49 pathology this avoids)
        hrs = t["hour"].to_numpy(zero_copy_only=False)
        blobs = t["blob"].to_pylist()
        regs = np.frombuffer(b"".join(blobs),
                             dtype=np.uint8).reshape(len(blobs), -1)
        order = np.argsort(hrs, kind="stable")
        hrs_s, regs_s = hrs[order], regs[order]
        new = np.ones(hrs_s.shape[0], dtype=bool)
        new[1:] = hrs_s[1:] != hrs_s[:-1]
        starts = np.nonzero(new)[0]
        merged = np.maximum.reduceat(regs_s, starts, axis=0)
        return pa.table({
            "hour": pa.array(hrs_s[starts]),
            "regs": pa.array([m.tobytes() for m in merged],
                             type=pa.binary()),
        })

    from ..stages.partition import fit_partitions, partition_by
    hourly = partition_by(
        events.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["hour"], fit_partitions(16), merge_partition, merge_empty)

    m = 1 << p
    rows = []
    for ref in hourly.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        hs = t["hour"].to_numpy(zero_copy_only=False)
        for i in range(t.num_rows):
            rows.append((int(hs[i]), np.frombuffer(
                t["regs"][i].as_py(), dtype=np.uint8)))
    rows.sort(key=lambda r: r[0])
    mn, mx = rows[0][0], rows[-1][0]
    span = mx - mn + 1
    mat = np.zeros((span + window_hours - 1, m), dtype=np.uint8)
    for hr, regs in rows:
        mat[hr - mn + window_hours - 1] = regs
    # window(h) = max over the trailing W rows (leading zero-padding
    # covers the clipped first windows)
    win = np.lib.stride_tricks.sliding_window_view(
        mat, window_hours, axis=0).max(axis=2)

    sketch = HyperLogLog(p, "murmur64")
    out_hours = np.arange(mn, mx + 1, dtype=np.int64)
    nonzero = (win > 0).sum(axis=1).astype(np.int64)
    sumr = win.astype(np.int64).sum(axis=1)
    ests = []
    for i in range(span):
        sketch.registers = win[i]
        ests.append(round(sketch.estimate(), 6))
    return pa.table({
        "window_start": pa.array(out_hours * 3600, type=pa.int64()),
        "m": pa.array(np.full(span, m, dtype=np.int64)),
        "nonzero_registers": pa.array(nonzero),
        "sum_registers": pa.array(sumr),
        "hll_estimate": pa.array(ests, type=pa.float64()),
    })


def hll_sliding_users_grouped(sf_dir: str, group_col: str = "event_type",
                              *, window_hours: int = 24,
                              p: int = 12) -> pa.Table:
    """GROUPED sliding-window DISTINCT: the trailing-``window_hours``
    HLL user estimate at every hour boundary PER GROUP (event type) --
    the window x sketch x group composition for the register-max sketch
    (VERDICT r3 item 8; the DDSketch version subtracts buckets, HLL
    windows by per-window register max).

    Distributed part: per-(block, group, hour) register rows from ONE
    composite scatter-max per batch; coarse (gfp, hour) co-partitioned
    register-max merge.  The driver holds groups x hours x m uint8
    registers (bounded groups x the global walk's bound) and runs one
    vectorized sliding_window_view per group."""
    from ..functions.text import fingerprint64
    from ..hashing import murmur64
    from ..sketches.hll import HyperLogLog, register_updates
    from ..stages.partition import fit_partitions, partition_by

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "user_id", group_col])
    m = 1 << p

    def partials(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks() if isinstance(
            t["ts"], pa.ChunkedArray) else t["ts"]
        us = ts.cast(pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        gfp = fingerprint64(t[group_col]).to_numpy(zero_copy_only=False)
        uid = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        uh, hinv = np.unique(hour, return_inverse=True)
        ug, ginv = np.unique(gfp, return_inverse=True)
        comb = ginv.astype(np.int64) * uh.size + hinv
        uc, cinv = np.unique(comb, return_inverse=True)
        idx, rho = register_updates(murmur64(uid), p)
        mat = np.zeros((uc.size, m), dtype=np.uint8)
        np.maximum.at(mat, (cinv, idx), rho)
        return pa.table({
            "gfp": pa.array(ug[uc // uh.size]),
            "hour": pa.array(uh[uc % uh.size].astype(np.int64)),
            "blob": pa.array([mat[i].tobytes()
                              for i in range(uc.size)],
                             type=pa.binary()),
        })

    merge_empty = pa.table({"gfp": pa.array([], type=pa.int64()),
                            "hour": pa.array([], type=pa.int64()),
                            "regs": pa.array([], type=pa.binary())})

    def merge_partition(t: pa.Table) -> pa.Table:
        g = t["gfp"].to_numpy(zero_copy_only=False)
        hrs = t["hour"].to_numpy(zero_copy_only=False)
        blobs = t["blob"].to_pylist()
        regs = np.frombuffer(b"".join(blobs),
                             dtype=np.uint8).reshape(len(blobs), -1)
        order = np.lexsort((hrs, g))
        g_s, hrs_s, regs_s = g[order], hrs[order], regs[order]
        new = np.ones(g_s.size, dtype=bool)
        new[1:] = (g_s[1:] != g_s[:-1]) | (hrs_s[1:] != hrs_s[:-1])
        starts = np.nonzero(new)[0]
        merged = np.maximum.reduceat(regs_s, starts, axis=0)
        return pa.table({
            "gfp": pa.array(g_s[starts]),
            "hour": pa.array(hrs_s[starts]),
            "regs": pa.array([r.tobytes() for r in merged],
                             type=pa.binary()),
        })

    hourly = partition_by(
        events.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["gfp", "hour"], fit_partitions(16), merge_partition,
        merge_empty)

    per_group: dict[int, list] = {}
    for ref in hourly.to_arrow_refs():
        t = ray.get(ref)
        if t.num_rows == 0:
            continue
        gs = t["gfp"].to_numpy(zero_copy_only=False)
        hs = t["hour"].to_numpy(zero_copy_only=False)
        for i in range(t.num_rows):
            per_group.setdefault(int(gs[i]), []).append(
                (int(hs[i]), np.frombuffer(t["regs"][i].as_py(),
                                           dtype=np.uint8)))
    if not per_group:
        raise ValueError("empty dataset")

    # group-name lookup: bounded distinct over the pruned group column
    names = (events.map_batches(
        lambda t: pa.table({
            "g": pc.unique(t[group_col].combine_chunks()),
        }).append_column("gfp", fingerprint64(pc.unique(
            t[group_col].combine_chunks()))),
        batch_format="pyarrow")
        .to_pandas().drop_duplicates("gfp"))
    name_of = dict(zip(names["gfp"].astype(np.int64), names["g"]))

    out = {"g": [], "w": [], "nz": [], "sr": [], "est": []}
    sketch = HyperLogLog(p, "murmur64")
    for gfp in sorted(per_group):
        rows = sorted(per_group[gfp], key=lambda r: r[0])
        mn, mx = rows[0][0], rows[-1][0]
        span = mx - mn + 1
        mat = np.zeros((span + window_hours - 1, m), dtype=np.uint8)
        for hr, regs in rows:
            mat[hr - mn + window_hours - 1] = regs
        win = np.lib.stride_tricks.sliding_window_view(
            mat, window_hours, axis=0).max(axis=2)
        name = name_of[gfp]
        for i in range(span):
            sketch.registers = win[i]
            out["g"].append(name)
            out["w"].append((mn + i) * 3600)
            out["nz"].append(int((win[i] > 0).sum()))
            out["sr"].append(int(win[i].astype(np.int64).sum()))
            out["est"].append(round(sketch.estimate(), 6))
    n = len(out["g"])
    return pa.table({
        group_col: pa.array(out["g"], type=pa.string()),
        "window_start": pa.array(out["w"], type=pa.int64()),
        "m": pa.array(np.full(n, m, dtype=np.int64)),
        "nonzero_registers": pa.array(out["nz"], type=pa.int64()),
        "sum_registers": pa.array(out["sr"], type=pa.int64()),
        "hll_estimate": pa.array(out["est"], type=pa.float64()),
    })


def sliding_anomaly_counts(sf_dir: str, *, window_hours: int = 24,
                           q: float = 0.99, alpha: float = 0.01,
                           bin_limit: int = 2048) -> pa.Table:
    """Sketch-driven ANOMALY DETECTION: count, per event type, the
    events whose value exceeds the trailing-``window_hours`` q-quantile
    of their own hour's window -- the alerting composition a streaming
    analytics pipeline runs on top of the turnstile sliding sketch.

    The comparison happens in BUCKET-KEY space (event bucket key >
    window's quantile bucket key): pure integer compares, immune to
    float estimate rounding, and exactly replicable by composing the
    sliding-walk SQL with the key math.  The per-window threshold table
    is O(hours) int64 pairs -- ray.put once, searchsorted per batch."""
    import ray as _ray

    from ..sketches.ddsketch import compute_keys

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "value"])
    win = sliding_window_quantiles(events, "ts", "value",
                                   window_hours=window_hours,
                                   quantiles=(q,), alpha=alpha,
                                   bin_limit=bin_limit,
                                   include_bucket_key=True)
    hours = (win["window_end"].to_numpy(zero_copy_only=False)
             // 3600).astype(np.int64)
    thr = win["bucket_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    thr_ref = _ray.put((hours, thr))
    from ..sketches.ddsketch import DDSketch
    probe = DDSketch(alpha, bin_limit, 1073741824, "uniform")
    ln_gamma, offset = probe.ln_gamma, probe.offset

    typed = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                  columns=["event_type", "ts", "value"])

    empty = pa.table({"event_type": pa.array([], type=pa.string()),
                      "n_events": pa.array([], type=pa.int64()),
                      "n_anomalies": pa.array([], type=pa.int64())})

    def flag(t: pa.Table) -> pa.Table:
        if t["value"].null_count:
            t = t.filter(pc.is_valid(t["value"]))
        if t.num_rows == 0:
            return empty
        hs, th = _ray.get(thr_ref)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        k = compute_keys(t["value"].to_numpy(zero_copy_only=False),
                         ln_gamma, offset)
        pos = np.searchsorted(hs, hour)
        # every event's hour has a window row by construction
        anom = k > th[pos]
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(et, return_inverse=True)
        return pa.table({
            "event_type": pa.array(ut, type=pa.string()),
            "n_events": pa.array(np.bincount(inv).astype(np.int64)),
            "n_anomalies": pa.array(np.bincount(
                inv, weights=anom.astype(np.int64)).astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    agg = (typed.map_batches(flag, batch_format="pyarrow",
                             zero_copy_batch=True)
           .groupby("event_type")
           .aggregate(Sum("n_events", alias_name="n_events"),
                      Sum("n_anomalies", alias_name="n_anomalies")))
    out = agg.to_pandas().sort_values("event_type").reset_index(drop=True)
    return pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "n_events": pa.array(out["n_events"].astype("int64")),
        "n_anomalies": pa.array(out["n_anomalies"].astype("int64")),
    })


def cms_sliding_user_est(sf_dir: str, *, window_hours: int = 24,
                         width: int = 1024, depth: int = 4,
                         topk: int = 10) -> pa.Table:
    """Sliding-window COUNT-MIN: trailing-``window_hours`` event-count
    estimate for the global top-``topk`` users at every hour boundary
    -- the window x sketch composition for a LINEAR sketch.  Count-min
    cells are sums, so the window merge is a prefix-sum DIFFERENCE
    (cum[h] - cum[h-W]); contrast hll_sliding_users, whose register-max
    state cannot subtract and needs a per-window max instead.

    Scale shape: probing a CMS reads ``depth`` cells per key, so only
    the probe set's cell SERIES ever leave the fact stream: the
    stateless map folds each block to (hour, probed-cell, count) rows
    (collisions from OTHER users mapping into a probed cell are
    counted, exactly as a full CMS would); the hour co-partition merge
    leaves O(hours x depth x topk) rows and the driver walk holds the
    dense hours x cells int64 matrix (~hours x 40 cells).  The probe
    set itself is the exact distributed top-k census (per-block
    prereduce, O(users) groupby, bounded driver pull).

    Window semantics match the DDSketch/HLL walks: window(h) covers
    hours (h - W, h].
    """
    from ray.data.aggregate import Sum

    from ..hashing import murmur64
    from ..sketches.countmin import DEFAULT_SEEDS
    from ..stages.partition import fit_partitions, partition_by

    seeds = DEFAULT_SEEDS[:depth]
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "user_id"])

    # exact top-k users (count desc, user_id asc), distributed census
    cnt_empty = pa.table({"user_id": pa.array([], type=pa.int64()),
                          "n": pa.array([], type=pa.int64())})

    def user_partial(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        uk, cnts = np.unique(uid, return_counts=True)
        return pa.table({"user_id": pa.array(uk),
                         "n": pa.array(cnts.astype(np.int64))})

    def local_top(t: pa.Table) -> pa.Table:
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        n = t["n"].to_numpy(zero_copy_only=False)
        order = np.lexsort((uid, -n))[:topk]
        return pa.table({"user_id": pa.array(uid[order]),
                         "n": pa.array(n[order])})

    per_user = (events.map_batches(user_partial,
                                   batch_format="pyarrow",
                                   zero_copy_batch=True)
                .groupby("user_id").aggregate(Sum("n", alias_name="n"))
                .map_batches(local_top, batch_format="pyarrow")
                .to_pandas())
    uid = per_user["user_id"].to_numpy(dtype=np.int64)
    n = per_user["n"].to_numpy(dtype=np.int64)
    order = np.lexsort((uid, -n))[:topk]
    probe_users = np.sort(uid[order])

    # probed cell ids per depth row; dense column layout d * width + cell
    probe_cells = []
    user_col = np.empty((probe_users.shape[0], depth), dtype=np.int64)
    for d, seed in enumerate(seeds):
        cell = (murmur64(probe_users ^ np.int64(seed))
                % np.uint64(width)).astype(np.int64)
        user_col[:, d] = d * width + cell
        probe_cells.append(d * width + np.unique(cell))
    dcells = np.unique(np.concatenate(probe_cells))
    lut_ref = ray.put((dcells, np.asarray(seeds, dtype=np.int64)))

    sp_empty = pa.table({"hour": pa.array([], type=pa.int64()),
                         "dcell": pa.array([], type=pa.int64()),
                         "c": pa.array([], type=pa.int64())})

    def partials(t: pa.Table) -> pa.Table:
        dc_lut, sds = ray.get(lut_ref)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(
            zero_copy_only=False)
        hour = us // 3_600_000_000
        u = t["user_id"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        hs, cs = [], []
        for d, seed in enumerate(sds):
            dcell = d * width + (murmur64(u ^ np.int64(seed))
                                 % np.uint64(width)).astype(np.int64)
            pos = np.searchsorted(dc_lut, dcell)
            pos = np.minimum(pos, dc_lut.shape[0] - 1)
            hit = dc_lut[pos] == dcell
            hs.append(hour[hit])
            cs.append(dcell[hit])
        h = np.concatenate(hs)
        c = np.concatenate(cs)
        if h.size == 0:
            return sp_empty
        comp = h * np.int64(depth * width) + c
        uk, cnts = np.unique(comp, return_counts=True)
        return pa.table({
            "hour": pa.array(uk // (depth * width)),
            "dcell": pa.array(uk % (depth * width)),
            "c": pa.array(cnts.astype(np.int64)),
        })

    def merge_cells(t: pa.Table) -> pa.Table:
        h = t["hour"].to_numpy(zero_copy_only=False)
        dc = t["dcell"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        comp = h * np.int64(depth * width) + dc
        order = np.argsort(comp, kind="stable")
        comp, c = comp[order], c[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], comp[1:] != comp[:-1])))
        comp = comp[starts]
        return pa.table({
            "hour": pa.array(comp // (depth * width)),
            "dcell": pa.array(comp % (depth * width)),
            "c": pa.array(np.add.reduceat(c, starts)),
        })

    sparse = partition_by(
        events.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["hour"], fit_partitions(16), merge_cells, sp_empty
    ).to_pandas()

    hrs = sparse["hour"].to_numpy(dtype=np.int64)
    dc = sparse["dcell"].to_numpy(dtype=np.int64)
    c = sparse["c"].to_numpy(dtype=np.int64)
    mn, mx = int(hrs.min()), int(hrs.max())
    span = mx - mn + 1
    mat = np.zeros((span, dcells.shape[0]), dtype=np.int64)
    mat[hrs - mn, np.searchsorted(dcells, dc)] = c
    cum = np.cumsum(mat, axis=0)
    win = cum.copy()
    if span > window_hours:
        win[window_hours:] -= cum[:-window_hours]

    # est(user, h) = min over depth rows of the windowed cell counts
    ucols = np.searchsorted(dcells, user_col)      # users x depth
    ests = win[:, ucols].min(axis=2)               # span x users
    hours_out = np.repeat(np.arange(mn, mx + 1, dtype=np.int64),
                          probe_users.shape[0])
    users_out = np.tile(probe_users, span)
    return pa.table({
        "window_start": pa.array(hours_out * 3600, type=pa.int64()),
        "user_id": pa.array(users_out),
        "est_count": pa.array(ests.reshape(-1)),
    })


def dgim_sliding_count(sf_dir: str, event_type: str = "click",
                       window_hours: Sequence[int] = (6, 24, 72)
                       ) -> pa.Table:
    """DGIM sliding-window counting (Datar, Gionis, Indyk, Motwani,
    SIAM J. Comput. 2002): approximate the number of events in the
    trailing W using O(log^2 N) state -- exponentially growing buckets,
    at most TWO of each size, oldest qualifying bucket counted half.

    The distributed twist: for an append-only stream the DGIM
    invariant ("merge the two oldest size-2^j buckets when a third
    appears") leaves a CANONICAL end state that depends only on N --
    with m the unique integer such that 2^m - 1 <= N <= 2(2^m - 1),
    the number of size-2^j buckets is 1 + bit_j(N - (2^m - 1)).
    (Uniqueness: digits d_j in {1,2} with sum d_j 2^j = N force
    d_j - 1 to be the binary representation of N - (2^m - 1); the
    simulation-equality is asserted in tests.)  So the sketch is
    REBUILDABLE from (N, bucket-boundary timestamps) alone:

      1. one distributed count  -> N, bucket sizes in closed form;
      2. one exact_rank_select  -> the newest-element timestamp of
         each bucket (histogram-bisection rank lookup, no sort);
      3. per probe window, the classic estimate: every qualifying
         bucket full except the oldest at half weight.

    The exact windowed counts ride the same pass and the published
    <= 50% relative-error guarantee is ASSERTED per window (rows-only
    query: the bound audit replaces the SQL oracle).

    Scale shape: state is O(log N) rows on the driver; the heavy work
    is the bisection's mergeable histograms -- 10^12 rows resolve in
    ~3 histogram rounds, nothing materializes.
    """
    import pyarrow.dataset as pads

    from ray.data.aggregate import Max, Sum

    from .quantiles import exact_rank_select

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"],
        filter=(pads.field("event_type") == event_type))

    def us_col(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"us": pc.cast(us, pa.float64())})

    stream = ds.map_batches(us_col, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    agg = stream.aggregate(Max("us", alias_name="mx"))
    n = stream.count()
    if n == 0:
        raise ValueError("dgim_sliding_count: empty stream")
    max_us = int(agg["mx"])

    # canonical DGIM bucket state in closed form (shared helper)
    sizes, pos = _dgim_canonical_buckets(n)
    ranks = [n - p for p in pos]  # 0-based rank from the start
    newest_ts = exact_rank_select(stream, "us", ranks)
    newest_ts = [int(v) for v in newest_ts]

    cutoffs = {w: max_us - w * 3_600_000_000 for w in window_hours}

    def exact_pass(t: pa.Table) -> pa.Table:
        us = t["us"].to_numpy(zero_copy_only=False)
        return pa.table({
            f"w{w}": pa.array([int((us > c).sum())], type=pa.int64())
            for w, c in cutoffs.items()})

    ex = stream.map_batches(exact_pass, batch_format="pyarrow") \
        .aggregate(*[Sum(f"w{w}", alias_name=f"w{w}")
                     for w in window_hours])

    out = {"window_hours": [], "n_buckets": [], "dgim_estimate": [],
           "exact_count": [], "bound_ok": []}
    for w in window_hours:
        c = cutoffs[w]
        qual = [i for i, ts in enumerate(newest_ts) if ts > c]
        if not qual:
            est = 0
        else:
            tot = sum(sizes[i] for i in qual)
            est = tot - sizes[max(qual)] // 2
        exact = int(ex[f"w{w}"] or 0)
        ok = abs(est - exact) <= exact // 2 + 1
        assert ok, f"DGIM bound violated: w={w} est={est} exact={exact}"
        out["window_hours"].append(w)
        out["n_buckets"].append(len(qual))
        out["dgim_estimate"].append(est)
        out["exact_count"].append(exact)
        out["bound_ok"].append(True)
    return pa.table({
        "window_hours": pa.array(out["window_hours"], type=pa.int64()),
        "n_buckets": pa.array(out["n_buckets"], type=pa.int64()),
        "dgim_estimate": pa.array(out["dgim_estimate"], type=pa.int64()),
        "exact_count": pa.array(out["exact_count"], type=pa.int64()),
        "bound_ok": pa.array(out["bound_ok"], type=pa.bool_()),
    })


def _dgim_canonical_buckets(n: int) -> tuple[list[int], list[int]]:
    """Canonical DGIM end state for an append-only stream of length n
    (two-bucket-per-size variant): with m the unique integer such that
    2^m - 1 <= n <= 2(2^m - 1), size 2^j occurs 1 + bit_j(n - (2^m-1))
    times.  Returns (sizes, pos) newest -> oldest, pos = 1-based
    newest-element position from the stream end.  Shared by the global
    and grouped queries (and mirrored by both SQL twins' mm/buckets/
    posed CTEs) so the closed form exists in exactly one place."""
    m = 1
    while not ((1 << m) - 1 <= n <= 2 * ((1 << m) - 1)):
        m += 1
    extra = n - ((1 << m) - 1)
    digits = [1 + ((extra >> j) & 1) for j in range(m)]
    assert sum(d << j for j, d in enumerate(digits)) == n
    sizes, pos = [], []
    cum = 0
    for j in range(m):
        for _ in range(digits[j]):
            sizes.append(1 << j)
            pos.append(cum + 1)
            cum += 1 << j
    return sizes, pos


def dgim_sliding_count_by_type(sf_dir: str,
                               window_hours: Sequence[int] = (6, 24, 72)
                               ) -> pa.Table:
    """Grouped DGIM (VERDICT r4 item 7): one canonical DGIM bucket
    state PER event_type, all types resolved together -- the grouped
    member of the window x sketch x group matrix alongside
    sliding_window_quantiles_by_type / hll_sliding_users_by_type.

    Same rebuild-from-closed-form trick as dgim_sliding_count, batched
    across groups: (1) one grouped stats pass gives every type's N and
    max timestamp; (2) the digit vectors and bucket positions are
    driver math; (3) ALL (type, rank) boundary lookups resolve in
    SHARED histogram-bisection rounds (_resolve_exact_targets with a
    group column -- one data pass per round regardless of type count);
    (4) the exact windowed counts ride one combiner pass.  Windows are
    anchored at each type's own max timestamp, mirroring the global
    query's stream-end anchor.

    Scale shape: driver state is O(types * log N) rows; the exchanges
    are kilobyte histogram blobs and O(types * windows) count partials.
    """
    from ray.data.aggregate import Max, Min, Sum

    from .quantiles import _float_order_keys, _resolve_exact_targets

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def us_col(t: pa.Table) -> pa.Table:
        us = pc.cast(pc.cast(t["ts"], pa.int64()), pa.float64())
        return pa.table({"ty": t["event_type"], "us": us})

    stream = ds.map_batches(us_col, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()

    def block_stats(t: pa.Table) -> pa.Table:
        v = t["us"].to_numpy(zero_copy_only=False)
        keys = _float_order_keys(v)
        enc = t["ty"].combine_chunks().dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        uniq = enc.dictionary
        cnt = np.bincount(codes, minlength=len(uniq))
        kmin = np.full(len(uniq), np.iinfo(np.uint64).max,
                       dtype=np.uint64)
        kmax = np.zeros(len(uniq), dtype=np.uint64)
        mxus = np.full(len(uniq), -np.inf, dtype=np.float64)
        np.minimum.at(kmin, codes, keys)
        np.maximum.at(kmax, codes, keys)
        np.maximum.at(mxus, codes, v)
        return pa.table({"ty": uniq,
                         "cnt": pa.array(cnt, type=pa.int64()),
                         "kmin": pa.array(kmin, type=pa.uint64()),
                         "kmax": pa.array(kmax, type=pa.uint64()),
                         "mx": pa.array(mxus)})

    stats = (stream.map_batches(block_stats, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("ty")
             .aggregate(Sum("cnt", alias_name="n"),
                        Min("kmin", alias_name="kmin"),
                        Max("kmax", alias_name="kmax"),
                        Max("mx", alias_name="mx"))
             .take_all())
    stats.sort(key=lambda r: r["ty"])

    # driver math per type: canonical bucket state (shared helper;
    # groupby rows always have n >= 1)
    targets, meta = [], {}
    for row in stats:
        ty, n = row["ty"], int(row["n"])
        sizes, pos = _dgim_canonical_buckets(n)
        meta[ty] = {"n": n, "max_us": int(row["mx"]), "sizes": sizes}
        for p in pos:
            targets.append({"group": ty, "rank": n - p,
                            "lo": int(row["kmin"]),
                            "hi": int(row["kmax"]), "below": 0,
                            "in_interval": n, "value": None})

    _resolve_exact_targets(stream, "us", targets, bins=4096,
                           collect_limit=2_000_000, max_rounds=8,
                           group_col="ty")
    by_ty: dict = {}
    for t in targets:
        by_ty.setdefault(t["group"], []).append(int(t["value"]))
    for ty, info in meta.items():
        # targets were appended newest->oldest per type, in order
        info["newest_ts"] = by_ty[ty]

    # exact windowed counts: per-block bincount partials per (type, w)
    tys = sorted(meta)
    cut = np.array([[meta[ty]["max_us"] - w * 3_600_000_000
                     for w in window_hours] for ty in tys],
                   dtype=np.float64)               # (types, windows)
    ty_arr = pa.array(tys)

    def exact_pass(t: pa.Table) -> pa.Table:
        us = t["us"].to_numpy(zero_copy_only=False)
        codes = pc.index_in(t["ty"], value_set=ty_arr).to_numpy(
            zero_copy_only=False).astype(np.int64)
        cols = {}
        for wi, w in enumerate(window_hours):
            above = us > cut[codes, wi]
            cols[f"w{w}"] = pa.array(
                np.bincount(codes[above], minlength=len(tys)),
                type=pa.int64())
        return pa.table({"ty": ty_arr, **cols})

    ex = (stream.map_batches(exact_pass, batch_format="pyarrow",
                             zero_copy_batch=True)
          .groupby("ty")
          .aggregate(*[Sum(f"w{w}", alias_name=f"w{w}")
                       for w in window_hours])
          .take_all())
    ex_by_ty = {r["ty"]: r for r in ex}

    out = {"event_type": [], "window_hours": [], "n_buckets": [],
           "dgim_estimate": [], "exact_count": [], "bound_ok": []}
    for ty in tys:
        info = meta[ty]
        sizes, newest_ts = info["sizes"], info["newest_ts"]
        for w in window_hours:
            c = info["max_us"] - w * 3_600_000_000
            qual = [i for i, ts in enumerate(newest_ts) if ts > c]
            if not qual:
                est = 0
            else:
                tot = sum(sizes[i] for i in qual)
                est = tot - sizes[max(qual)] // 2
            exact = int(ex_by_ty[ty][f"w{w}"] or 0)
            ok = abs(est - exact) <= exact // 2 + 1
            assert ok, f"DGIM bound violated: ty={ty} w={w}"
            out["event_type"].append(ty)
            out["window_hours"].append(w)
            out["n_buckets"].append(len(qual))
            out["dgim_estimate"].append(est)
            out["exact_count"].append(exact)
            out["bound_ok"].append(True)
    return pa.table({
        "event_type": pa.array(out["event_type"], type=pa.string()),
        "window_hours": pa.array(out["window_hours"], type=pa.int64()),
        "n_buckets": pa.array(out["n_buckets"], type=pa.int64()),
        "dgim_estimate": pa.array(out["dgim_estimate"],
                                  type=pa.int64()),
        "exact_count": pa.array(out["exact_count"], type=pa.int64()),
        "bound_ok": pa.array(out["bound_ok"], type=pa.bool_()),
    })


def _dgim_by_type_sql(window_hours: Sequence[int] = (6, 24, 72)) -> str:
    """Grouped DuckDB replica: the global _dgim_sliding_sql with every
    window function partitioned by event_type."""
    wins = ", ".join(f"({int(w)})" for w in window_hours)
    return f"""
WITH s AS (
  SELECT event_type AS ty, epoch_us(ts) AS us FROM events
), stats AS (
  SELECT ty, CAST(count(*) AS BIGINT) AS n,
         CAST(max(us) AS BIGINT) AS mx
  FROM s GROUP BY 1
), mm AS (
  SELECT ty, n, mx, CAST(j.range AS BIGINT) AS m,
         n - ((1::BIGINT << CAST(j.range AS INT)) - 1) AS extra
  FROM stats, range(1, 63) j
  WHERE (1::BIGINT << CAST(j.range AS INT)) - 1 <= n
    AND n <= 2 * ((1::BIGINT << CAST(j.range AS INT)) - 1)
), buckets AS (
  SELECT ty, CAST(rj.range AS BIGINT) AS j,
         1::BIGINT << CAST(rj.range AS INT) AS size,
         CAST(rc.range AS BIGINT) AS copy
  FROM mm, range(0, 63) rj, range(0, 2) rc
  WHERE rj.range < mm.m
    AND rc.range <= ((mm.extra >> CAST(rj.range AS INT)) & 1)
), posed AS (
  SELECT ty, j, size,
         1 + coalesce(sum(size) OVER (PARTITION BY ty ORDER BY j, copy
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS pos
  FROM buckets
), ranked AS (
  SELECT ty, us,
         row_number() OVER (PARTITION BY ty ORDER BY us) - 1 AS rnk
  FROM s
), bts AS (
  SELECT p.ty, p.pos, p.size, CAST(r.us AS BIGINT) AS newest_ts
  FROM posed p
  JOIN stats st ON st.ty = p.ty
  JOIN ranked r ON r.ty = p.ty AND r.rnk = st.n - p.pos
), windows(w) AS (VALUES {wins}), cut AS (
  SELECT ty, CAST(w AS BIGINT) AS w, mx - w * 3600000000 AS c
  FROM windows, stats
), qual AS (
  SELECT cut.ty, cut.w, b.size, b.pos FROM cut
  JOIN bts b ON b.ty = cut.ty AND b.newest_ts > cut.c
), est AS (
  SELECT ty, w, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(size) - max_by(size, pos) // 2 AS BIGINT) AS est
  FROM qual GROUP BY 1, 2
), ex AS (
  SELECT cut.ty, cut.w, CAST(count(s.us) AS BIGINT) AS exact_count
  FROM cut LEFT JOIN s ON s.ty = cut.ty AND s.us > cut.c
  GROUP BY 1, 2
)
SELECT cut.ty AS event_type, cut.w AS window_hours,
       coalesce(est.n_buckets, 0) AS n_buckets,
       coalesce(est.est, 0) AS dgim_estimate,
       ex.exact_count,
       abs(coalesce(est.est, 0) - ex.exact_count)
         <= ex.exact_count // 2 + 1 AS bound_ok
FROM cut
JOIN ex ON ex.ty = cut.ty AND ex.w = cut.w
LEFT JOIN est ON est.ty = cut.ty AND est.w = cut.w
ORDER BY 1, 2
"""


DGIM_BY_TYPE_SQL = _dgim_by_type_sql()


def _dgim_sliding_sql(event_type: str = "click",
                      window_hours: Sequence[int] = (6, 24, 72)) -> str:
    """Deterministic DuckDB replica of dgim_sliding_count (VERDICT r4
    item 3): nothing in the canonical DGIM end state is randomized --
    the digit vector is a closed form of N and the bucket boundaries
    are rank lookups -- so the whole estimate replays as window
    functions and bit arithmetic, upgrading the query from rows-only
    to a full hash oracle."""
    wins = ", ".join(f"({int(w)})" for w in window_hours)
    return f"""
WITH s AS (
  SELECT epoch_us(ts) AS us FROM events
  WHERE event_type = '{event_type}'
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n, CAST(max(us) AS BIGINT) AS mx
  FROM s
), mm AS (
  -- unique m with 2^m - 1 <= N <= 2(2^m - 1); digit vector offset
  SELECT n, mx, CAST(j.range AS BIGINT) AS m,
         n - ((1::BIGINT << CAST(j.range AS INT)) - 1) AS extra
  FROM stats, range(1, 63) j
  WHERE (1::BIGINT << CAST(j.range AS INT)) - 1 <= n
    AND n <= 2 * ((1::BIGINT << CAST(j.range AS INT)) - 1)
), buckets AS (
  -- 1 + bit_j(extra) buckets of size 2^j, j in 0..m-1
  SELECT CAST(rj.range AS BIGINT) AS j,
         1::BIGINT << CAST(rj.range AS INT) AS size,
         CAST(rc.range AS BIGINT) AS copy
  FROM mm, range(0, 63) rj, range(0, 2) rc
  WHERE rj.range < mm.m
    AND rc.range <= ((mm.extra >> CAST(rj.range AS INT)) & 1)
), posed AS (
  -- 1-based newest-element position from the stream end
  SELECT j, size,
         1 + coalesce(sum(size) OVER (ORDER BY j, copy
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS pos
  FROM buckets
), ranked AS (
  SELECT us, row_number() OVER (ORDER BY us) - 1 AS rnk FROM s
), bts AS (
  SELECT p.pos, p.size, CAST(r.us AS BIGINT) AS newest_ts
  FROM posed p JOIN ranked r
    ON r.rnk = (SELECT n FROM stats) - p.pos
), windows(w) AS (VALUES {wins}), cut AS (
  SELECT CAST(w AS BIGINT) AS w, mx - w * 3600000000 AS c
  FROM windows, stats
), qual AS (
  SELECT cut.w, b.size, b.pos FROM cut
  JOIN bts b ON b.newest_ts > cut.c
), est AS (
  -- every qualifying bucket full, oldest (max pos) at half weight
  SELECT w, CAST(count(*) AS BIGINT) AS n_buckets,
         CAST(sum(size) - max_by(size, pos) // 2 AS BIGINT) AS est
  FROM qual GROUP BY 1
), ex AS (
  SELECT cut.w, CAST(count(s.us) AS BIGINT) AS exact_count
  FROM cut LEFT JOIN s ON s.us > cut.c GROUP BY 1
)
SELECT cut.w AS window_hours,
       coalesce(est.n_buckets, 0) AS n_buckets,
       coalesce(est.est, 0) AS dgim_estimate,
       ex.exact_count,
       abs(coalesce(est.est, 0) - ex.exact_count)
         <= ex.exact_count // 2 + 1 AS bound_ok
FROM cut JOIN ex ON ex.w = cut.w
LEFT JOIN est ON est.w = cut.w
ORDER BY 1
"""


DGIM_SLIDING_SQL = _dgim_sliding_sql()


def cms_sliding_user_est_by_type(sf_dir: str, *, window_hours: int = 24,
                                 width: int = 1024, depth: int = 4,
                                 topk: int = 5) -> pa.Table:
    """Grouped sliding COUNT-MIN: one independent CMS cell series PER
    event_type, probing each type's own exact top-``topk`` users over
    that type's trailing-``window_hours`` window -- the linear-sketch
    member of the window x sketch x group matrix
    (sliding_window_quantiles_by_type / hll_sliding_users_by_type /
    dgim_sliding_count_by_type are the quantile / register-max /
    bucket-state members).

    Same dataflow as cms_sliding_user_est with a type dimension folded
    into the composite cell id (ty * depth*width + d*width + cell):
    the stateless map emits only probed-cell partials, the hour
    co-partition merge leaves O(hours x types x depth x topk) rows,
    and the driver walks one prefix-sum matrix per type over that
    type's own hour span (per-type stream-end anchors, mirroring the
    grouped DGIM).  Probe sets come from one exact distributed census
    with a per-type block top-k prereduce.
    """
    from ray.data.aggregate import Sum

    from ..hashing import murmur64
    from ..sketches.countmin import DEFAULT_SEEDS
    from ..stages.partition import fit_partitions, partition_by

    seeds = DEFAULT_SEEDS[:depth]
    dw = depth * width
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["ts", "user_id", "event_type"])

    def user_partial(t: pa.Table) -> pa.Table:
        g = pa.table({"ty": t["event_type"], "u": t["user_id"]}) \
            .group_by(["ty", "u"]).aggregate([([], "count_all")])
        return pa.table({"ty": g["ty"], "u": g["u"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    def local_top(t: pa.Table) -> pa.Table:
        # per-type block top-k prereduce (run-rank arithmetic)
        ty = t["ty"].combine_chunks().dictionary_encode()
        codes = ty.indices.to_numpy(zero_copy_only=False).astype(
            np.int64)
        u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
        n = t["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((u, -n, codes))
        c_s = codes[order]
        new_run = np.ones(c_s.size, dtype=bool)
        new_run[1:] = c_s[1:] != c_s[:-1]
        starts = np.nonzero(new_run)[0]
        rlen = np.diff(np.append(starts, c_s.size))
        rank = np.arange(c_s.size) - np.repeat(starts, rlen)
        keep = order[rank < topk]
        return pa.table({"ty": t["ty"].take(pa.array(keep)),
                         "u": pa.array(u[keep]),
                         "n": pa.array(n[keep])})

    census = (events.map_batches(user_partial, batch_format="pyarrow",
                                 zero_copy_batch=True)
              .groupby(["ty", "u"]).aggregate(Sum("n", alias_name="n"))
              .map_batches(local_top, batch_format="pyarrow")
              .to_pandas())
    types = sorted(census["ty"].unique())
    tcode = {ty: i for i, ty in enumerate(types)}

    probe_users: dict = {}
    comp_cells = []
    user_col: dict = {}
    for ty in types:
        g = census[census["ty"] == ty]
        uid = g["u"].to_numpy(dtype=np.int64)
        n = g["n"].to_numpy(dtype=np.int64)
        order = np.lexsort((uid, -n))[:topk]
        pu = np.sort(uid[order])
        probe_users[ty] = pu
        ucol = np.empty((pu.shape[0], depth), dtype=np.int64)
        cells = []
        for d, seed in enumerate(seeds):
            cell = (murmur64(pu ^ np.int64(seed))
                    % np.uint64(width)).astype(np.int64)
            ucol[:, d] = tcode[ty] * dw + d * width + cell
            cells.append(tcode[ty] * dw + d * width + np.unique(cell))
        user_col[ty] = ucol
        comp_cells.append(np.concatenate(cells))
    dcells = np.unique(np.concatenate(comp_cells))
    ty_arr = pa.array(types)
    lut_ref = ray.put((dcells, np.asarray(seeds, dtype=np.int64)))

    sp_empty = pa.table({"hour": pa.array([], type=pa.int64()),
                         "comp": pa.array([], type=pa.int64()),
                         "c": pa.array([], type=pa.int64())})

    def partials(t: pa.Table) -> pa.Table:
        dc_lut, sds = ray.get(lut_ref)
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        hour = us // 3_600_000_000
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        tc = pc.fill_null(pc.index_in(t["event_type"],
                                      value_set=ty_arr), -1).to_numpy(
            zero_copy_only=False).astype(np.int64)
        hs, cs = [], []
        for d, seed in enumerate(sds):
            comp = tc * dw + d * width + (
                murmur64(u ^ np.int64(seed))
                % np.uint64(width)).astype(np.int64)
            pos = np.minimum(np.searchsorted(dc_lut, comp),
                             dc_lut.shape[0] - 1)
            hit = (dc_lut[pos] == comp) & (tc >= 0)
            hs.append(hour[hit])
            cs.append(comp[hit])
        h = np.concatenate(hs)
        c = np.concatenate(cs)
        if h.size == 0:
            return sp_empty
        key = h * np.int64(len(types) * dw) + c
        uk, cnts = np.unique(key, return_counts=True)
        return pa.table({
            "hour": pa.array(uk // (len(types) * dw)),
            "comp": pa.array(uk % (len(types) * dw)),
            "c": pa.array(cnts.astype(np.int64)),
        })

    def merge_cells(t: pa.Table) -> pa.Table:
        h = t["hour"].to_numpy(zero_copy_only=False)
        comp = t["comp"].to_numpy(zero_copy_only=False)
        c = t["c"].to_numpy(zero_copy_only=False)
        key = h * np.int64(len(types) * dw) + comp
        order = np.argsort(key, kind="stable")
        key, c = key[order], c[order]
        starts = np.flatnonzero(np.concatenate(
            ([True], key[1:] != key[:-1])))
        key = key[starts]
        return pa.table({
            "hour": pa.array(key // (len(types) * dw)),
            "comp": pa.array(key % (len(types) * dw)),
            "c": pa.array(np.add.reduceat(c, starts)),
        })

    # per-type hour spans (stream-end anchors per group): one tiny agg
    from ray.data.aggregate import Max, Min

    def hour_partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"ty": t["event_type"],
                         "hr": pc.divide(us, pa.scalar(3_600_000_000))})

    spans = (events.map_batches(hour_partial, batch_format="pyarrow",
                                zero_copy_batch=True)
             .groupby("ty").aggregate(Min("hr", alias_name="mn"),
                                      Max("hr", alias_name="mx"))
             .take_all())
    span_of = {r["ty"]: (int(r["mn"]), int(r["mx"])) for r in spans}

    sparse = partition_by(
        events.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["hour"], fit_partitions(16), merge_cells, sp_empty
    ).to_pandas()
    hrs = sparse["hour"].to_numpy(dtype=np.int64)
    comp = sparse["comp"].to_numpy(dtype=np.int64)
    cnt = sparse["c"].to_numpy(dtype=np.int64)

    out_ty, out_ws, out_u, out_e = [], [], [], []
    for ty in types:
        mn, mx = span_of[ty]
        span = mx - mn + 1
        sel = (comp // dw) == tcode[ty]
        # this type's cell columns within the global dcell list
        my_cells = dcells[(dcells // dw) == tcode[ty]]
        mat = np.zeros((span, my_cells.shape[0]), dtype=np.int64)
        h_in = np.clip(hrs[sel] - mn, 0, span - 1)
        mat[h_in, np.searchsorted(my_cells, comp[sel])] = cnt[sel]
        cum = np.cumsum(mat, axis=0)
        win = cum.copy()
        if span > window_hours:
            win[window_hours:] -= cum[:-window_hours]
        ucols = np.searchsorted(my_cells, user_col[ty])
        ests = win[:, ucols].min(axis=2)           # span x users
        pu = probe_users[ty]
        out_ty.extend([ty] * span * pu.shape[0])
        out_ws.extend((np.repeat(np.arange(mn, mx + 1, dtype=np.int64),
                                 pu.shape[0]) * 3600).tolist())
        out_u.extend(np.tile(pu, span).tolist())
        out_e.extend(ests.reshape(-1).tolist())
    return pa.table({
        "event_type": pa.array(out_ty, type=pa.string()),
        "window_start": pa.array(out_ws, type=pa.int64()),
        "user_id": pa.array(out_u, type=pa.int64()),
        "est_count": pa.array(out_e, type=pa.int64()),
    })


def _cms_by_type_sql(window_hours: int = 24, width: int = 1024,
                     depth: int = 4, topk: int = 5) -> str:
    """Grouped DuckDB replica: the cms_sliding_user_est twin with every
    stage partitioned by event_type and per-type hour anchors."""
    from ..sketches.countmin import DEFAULT_SEEDS
    seeds = ", ".join(f"({d}, {s})"
                      for d, s in enumerate(DEFAULT_SEEDS[:depth]))
    return f"""
WITH seeds(d, s) AS (VALUES {seeds}),
tu AS (SELECT ty, u FROM (
         SELECT event_type AS ty, CAST(user_id AS BIGINT) AS u,
                row_number() OVER (PARTITION BY event_type
                                   ORDER BY count(*) DESC, user_id)
                  AS rn
         FROM events GROUP BY event_type, user_id)
       WHERE rn <= {topk}),
pcell AS (SELECT DISTINCT tu.ty, s.d,
                 hash(xor(tu.u, CAST(s.s AS BIGINT))) % {width} AS cell
          FROM tu CROSS JOIN seeds s),
hourly AS (SELECT event_type AS ty,
                  CAST(epoch_us(ts) AS BIGINT)//3600000000 AS hr, s.d,
                  hash(xor(CAST(user_id AS BIGINT),
                           CAST(s.s AS BIGINT))) % {width} AS cell,
                  CAST(count(*) AS BIGINT) AS c
           FROM events CROSS JOIN seeds s GROUP BY 1, 2, 3, 4),
bounds AS (SELECT event_type AS ty,
                  min(CAST(epoch_us(ts) AS BIGINT)//3600000000) AS mn,
                  max(CAST(epoch_us(ts) AS BIGINT)//3600000000) AS mx
           FROM events GROUP BY 1),
nums AS (SELECT CAST(range AS BIGINT) AS i FROM range(0, 1048576)),
hrs AS (SELECT b.ty, b.mn + i AS hr FROM bounds b
        JOIN nums ON i <= b.mx - b.mn),
series AS (SELECT h2.ty, h2.hr, p.d, p.cell, COALESCE(hh.c, 0) AS c
           FROM hrs h2 JOIN pcell p ON p.ty = h2.ty
           LEFT JOIN hourly hh ON hh.ty = h2.ty AND hh.hr = h2.hr
                              AND hh.d = p.d AND hh.cell = p.cell),
w AS (SELECT ty, hr, d, cell,
             CAST(sum(c) OVER (PARTITION BY ty, d, cell ORDER BY hr
                  ROWS BETWEEN {window_hours - 1} PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS wc
      FROM series),
est AS (SELECT w.ty, w.hr, tu.u, min(w.wc) AS est_count
        FROM tu CROSS JOIN seeds s
        JOIN w ON w.ty = tu.ty AND w.d = s.d
              AND w.cell = hash(xor(tu.u, CAST(s.s AS BIGINT)))
                           % {width}
        GROUP BY 1, 2, 3)
SELECT ty AS event_type, CAST(hr * 3600 AS BIGINT) AS window_start,
       u AS user_id, CAST(est_count AS BIGINT) AS est_count
FROM est ORDER BY 1, 2, 3
"""


CMS_BY_TYPE_SQL = _cms_by_type_sql()


def dds_decayed_value(sf_dir: str, *, halflife_hours: int = 12,
                      kcap: int = 20,
                      quantiles: Sequence[float] = (0.5, 0.9, 0.99),
                      alpha: float = PRACTICAL_ALPHA,
                      bin_limit: int = DEFAULT_BIN_LIMIT) -> pa.Table:
    """HALF-LIFE-DECAYED DDSketch quantiles: the time-decay member of
    the window x sketch matrix -- recent events dominate, each event's
    weight halving every ``halflife_hours`` of age relative to the
    stream end.  The power-of-two half-life makes the decay EXACT in
    integers: age k half-lives => weight 2^(kcap - k) (0 beyond kcap,
    a deterministic cutoff both engines apply), so the weighted bucket
    counts, the rank rule cum > q * (W - 1), and the picked bucket
    keys hash-match the DuckDB replica bit-for-bit -- no float decay
    drift, unlike exp(-lambda * age) weighting.

    Composition, not new machinery: one tiny max-hour aggregate, a
    stateless weight map, then the standard weighted DDSketch build
    (per-block partials, distributed tree merge -- kilobyte sketch
    rows are the only exchange).  Weight sums stay exact in float64's
    integer range for N * 2^kcap < 2^53 (10^12 rows at kcap=20 needs
    the limb treatment documented in BASELINE.md).
    """
    from ray.data.aggregate import Max

    from .quantiles import dds_quantiles_global

    ev = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "value"])

    def hr_col(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"hr": pc.divide(us, pa.scalar(3_600_000_000))})

    mx = ev.map_batches(hr_col, batch_format="pyarrow",
                        zero_copy_batch=True).aggregate(
        Max("hr", alias_name="m"))
    hr_max = int(mx["m"])

    def weighted(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        k = (hr_max - us // 3_600_000_000) // halflife_hours
        w = np.where(k <= kcap,
                     np.int64(1) << np.minimum(np.maximum(kcap - k, 0),
                                               np.int64(62)),
                     np.int64(0)).astype(np.float64)
        return pa.table({"value": t["value"], "w": pa.array(w)})

    return dds_quantiles_global(
        ev.map_batches(weighted, batch_format="pyarrow",
                       zero_copy_batch=True),
        "value", quantiles, weight_col="w", alpha=alpha,
        bin_limit=bin_limit, round_digits=6)
