"""Temporal joins: as-of join (latest right row at or before each left
row's timestamp, per key) as a first-class distributed operator.

The reference engine has no join machinery at all (it is a quantile
gossip simulator -- main.cpp drives sketch exchange only); an as-of join
is one of the "operators Ray Data lacks" the engine adds for
training-data pipelines (BASELINE.md north star: event/feature alignment
at Common-Crawl scale).

Dataflow (Ray-Data-first, no driver materialization):

1. both sides are projected to a shared schema (`_key`, `_ts`, `_side`,
   payload columns null-padded on the other side) and unioned -- the
   union stays lazy, blocks stream;
2. coarse hash co-partitioning on `_key` (`stages/partition.partition_by`
   -- ONE vectorized call per partition, not per group);
3. per partition, a fully vectorized as-of kernel: dense-rank the union
   of timestamps (rank order == value order, so `>=` semantics survive),
   build the composite sort key ``key_rank * (n_ts_ranks+1) + ts_rank``,
   and one ``np.searchsorted(right_composites, left_composites, 'right')
   - 1`` finds every left row's match -- no per-key Python loop.

Partitioning assumption (documented like sessionization's): all right
rows of one key fit in one partition.  Right sides are dimension-like
(orders per customer, checkpoints per shard), so a key's history is
millions of rows at most while partitions hold billions; a key whose
history exceeds a partition would need a secondary time-split + boundary
broadcast of each split's last row.

Tie handling: if several right rows share (key, ts), searchsorted picks
whichever sorted last -- nondeterministic under shuffle.  Callers that
need bit-stable output (the driver's oracle gate) must pre-deduplicate
the right side to one row per (key, ts) with a deterministic rule;
`events_asof_orders` keeps the max `o_orderkey` and its DuckDB oracle
replicates that with a row_number() CTE, because SQL ASOF JOIN leaves
the same tie unspecified.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..stages.partition import fit_partitions, partition_by


def _as_int64(col) -> np.ndarray:
    """int64 view of an int/timestamp column (timestamps: epoch micros)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(arr.type):
        arr = arr.cast(pa.int64())
    return arr.to_numpy(zero_copy_only=False).astype(np.int64, copy=False)


def asof_join(left_ds, right_ds, *, left_on: str, right_on: str,
              left_ts: str, right_ts: str,
              left_cols: Sequence[str], right_cols: Sequence[str],
              num_partitions: int | None = None,
              left_schema: pa.Schema | None = None,
              right_schema: pa.Schema | None = None):
    """events-style as-of join: for every left row, attach the right row
    with the greatest ``right_ts`` <= ``left_ts`` among rows whose
    ``right_on`` key equals the left row's ``left_on`` key (inclusive
    match, LEFT join -- unmatched rows keep nulls).

    Returns a Dataset with ``left_cols`` + ``right_cols`` (+ ``_matched``
    bool).  Only the named columns ride the shuffle -- project before
    calling.  ``on``/ts columns must be int64 or timestamp[us].

    Pass ``left_schema``/``right_schema`` when a side is a derived
    dataset: ``Dataset.schema()`` on an unexecuted derived plan triggers
    a limit-1 execution of the whole plan just to learn the dtypes.
    """
    left_cols = list(left_cols)
    right_cols = list(right_cols)
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(f"left/right payload column collision: {overlap}")

    if left_schema is None:
        left_schema = left_ds.schema()
    if right_schema is None:
        right_schema = right_ds.schema()
    l_types = {n: t for n, t in zip(left_schema.names, left_schema.types)}
    r_types = {n: t for n, t in zip(right_schema.names, right_schema.types)}
    payload = ([(c, l_types[c]) for c in left_cols]
               + [(c, r_types[c]) for c in right_cols])

    def norm(side: int, key_col: str, ts_col: str, own: list[str]):
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {
                "_key": pc.cast(t[key_col], pa.int64()),
                "_ts": pa.array(_as_int64(t[ts_col]), type=pa.int64()),
                "_side": pa.array(np.full(n, side, dtype=np.int8)),
            }
            for name, typ in payload:
                cols[name] = (t[name] if name in own
                              else pa.nulls(n, type=typ))
            return pa.table(cols)
        return f

    lhs = left_ds.map_batches(norm(0, left_on, left_ts, left_cols),
                              batch_format="pyarrow", zero_copy_batch=True)
    rhs = right_ds.map_batches(norm(1, right_on, right_ts, right_cols),
                               batch_format="pyarrow", zero_copy_batch=True)
    both = lhs.union(rhs)

    out_fields = ([(name, typ) for name, typ in payload]
                  + [("_matched", pa.bool_())])
    empty = pa.table({name: pa.array([], type=typ)
                      for name, typ in out_fields})

    def join_partition(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        key = t["_key"].to_numpy(zero_copy_only=False)
        ts = t["_ts"].to_numpy(zero_copy_only=False)
        li = np.nonzero(side == 0)[0]
        ri = np.nonzero(side == 1)[0]
        if li.shape[0] == 0:
            return empty
        # dense ranks preserve <=, so the composite is a faithful
        # lexicographic (key, ts) order that fits one int64
        ukey, key_rank = np.unique(key, return_inverse=True)
        uts, ts_rank = np.unique(ts, return_inverse=True)
        comp = key_rank.astype(np.int64) * np.int64(uts.shape[0] + 1) \
            + ts_rank
        rc = comp[ri]
        order_r = np.argsort(rc, kind="stable")
        rc_sorted = rc[order_r]
        pos = np.searchsorted(rc_sorted, comp[li], side="right") - 1
        safe = np.maximum(pos, 0)
        matched = (pos >= 0) & (key_rank[ri[order_r[safe]]] == key_rank[li])
        src = ri[order_r[safe]]
        cols = {}
        for name in left_cols:
            cols[name] = t[name].take(pa.array(li))
        take_idx = np.where(matched, src, -1)
        idx_arr = pa.array(np.where(take_idx < 0, None, take_idx),
                           type=pa.int64())
        for name in right_cols:
            cols[name] = t[name].take(idx_arr)
        cols["_matched"] = pa.array(matched)
        return pa.table(cols)

    parts = (num_partitions if num_partitions is not None
             else fit_partitions(32))
    return partition_by(both, ["_key"], parts, join_partition, empty)


def events_asof_orders(sf_dir: str) -> pa.Table:
    """Driver query: align every event with that user's most recent order
    at event time (inclusive), then roll up per (event_type,
    o_orderpriority): match count, order value in integer cents, and the
    total event-to-order lag in integer microseconds.  Integer sums keep
    the aggregate associative, so the result hash-matches the DuckDB
    ASOF JOIN oracle regardless of merge order."""
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                                   columns=["ts", "user_id", "event_type"])
    orders = ray.data.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice",
                 "o_orderpriority"])

    # deterministic tie-break: one order per (custkey, orderdate), max
    # o_orderkey wins (mirrored by the oracle's row_number() CTE)
    def dedup_ties(t: pa.Table) -> pa.Table:
        kk = t["o_custkey"].to_numpy(zero_copy_only=False)
        dd = _as_int64(t["o_orderdate"])
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-ok, dd, kk))
        kk_s, dd_s = kk[order], dd[order]
        first = np.ones(order.shape[0], dtype=bool)
        first[1:] = (kk_s[1:] != kk_s[:-1]) | (dd_s[1:] != dd_s[:-1])
        return t.take(pa.array(order[first]))

    # the tie-dedup must see all rows of a (custkey, orderdate) pair:
    # co-partition by custkey first (same key routing as the join)
    o_empty = pa.table({n: pa.array([], type=t)
                        for n, t in zip(orders.schema().names,
                                        orders.schema().types)})
    orders_uniq = partition_by(orders, ["o_custkey"], fit_partitions(32),
                               dedup_ties, o_empty)

    joined = asof_join(
        events, orders_uniq, left_on="user_id", right_on="o_custkey",
        left_ts="ts", right_ts="o_orderdate",
        left_cols=["ts", "user_id", "event_type"],
        right_cols=["o_orderdate", "o_orderkey", "o_totalprice",
                    "o_orderpriority"],
        right_schema=orders.schema())  # orders_uniq preserves the schema

    # per-batch combiner: fold each joined batch to (type, priority)
    # partial sums, then one tiny groupby finishes -- the shuffle moves
    # O(types x priorities) rows per block
    def combine(t: pa.Table) -> pa.Table:
        t = t.filter(t["_matched"])  # matched rows only: no nulls remain
        et = t["event_type"].to_numpy(zero_copy_only=False)
        op = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        cents = np.floor(price * 100.0 + 0.5).astype(np.int64)
        lag = _as_int64(t["ts"]) - _as_int64(t["o_orderdate"])
        pair = np.char.add(np.char.add(et.astype(str), "\x1f"),
                           op.astype(str))
        upair, inv = np.unique(pair, return_inverse=True)
        n = np.bincount(inv, minlength=upair.shape[0]).astype(np.int64)
        # int64 scatter-add, NOT bincount(weights=...): bincount sums in
        # float64 and microsecond lags overflow exact-integer range 2^53
        c = np.zeros(upair.shape[0], dtype=np.int64)
        np.add.at(c, inv, cents)
        lg = np.zeros(upair.shape[0], dtype=np.int64)
        np.add.at(lg, inv, lag)
        parts = [p.split("\x1f") for p in upair.tolist()]
        return pa.table({
            "event_type": pa.array([p[0] for p in parts], type=pa.string()),
            "o_orderpriority": pa.array([p[1] for p in parts],
                                        type=pa.string()),
            "n": pa.array(n), "sum_price_cents": pa.array(c),
            "sum_lag_us": pa.array(lg),
        })

    from ray.data.aggregate import Sum
    agg = (joined
           .map_batches(combine, batch_format="pyarrow")
           .groupby(["event_type", "o_orderpriority"])
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sum_price_cents", alias_name="sum_price_cents"),
                      Sum("sum_lag_us", alias_name="sum_lag_us")))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "o_orderpriority": t["o_orderpriority"],
            "n": pc.cast(t["n"], pa.int64()),
            "sum_price_cents": pc.cast(t["sum_price_cents"], pa.int64()),
            "sum_lag_us": pc.cast(t["sum_lag_us"], pa.int64()),
        })

    return agg.map_batches(finalize, batch_format="pyarrow")


EVENTS_ASOF_ORDERS_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice, o_orderpriority,
         row_number() OVER (PARTITION BY o_custkey, o_orderdate
                            ORDER BY o_orderkey DESC) AS rn
  FROM orders
), uniq AS (
  SELECT * FROM ranked WHERE rn = 1
)
SELECT e.event_type,
       o.o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS sum_price_cents,
       CAST(sum(date_diff('microsecond', o.o_orderdate, e.ts))
            AS BIGINT) AS sum_lag_us
FROM events e
ASOF JOIN uniq o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
GROUP BY 1, 2
ORDER BY 1, 2
"""
