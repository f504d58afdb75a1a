"""TPC-H-shaped reporting pipelines (Q4/Q12/Q14/Q18/Q19 shapes).

Complements the Q1/Q3/Q6/Q10 shapes in ``relational.py``: each query
here exercises a distinct distributed-join/aggregation pattern --
EXISTS semi-join (Q4), join + conditional counts (Q12), broadcast-dim
conditional share (Q14), HAVING-filtered join-back (Q18), disjunctive
bracket predicates pushed into a broadcast lookup (Q19) -- re-expressed
Ray-Data-first over the driver testdata (which lacks l_shipmode /
l_commitdate / p_container, so the predicates are adapted to the
columns that exist while keeping each query's canonical plan shape).

All money math is exact integer cents (per-row floor(x*100+0.5) is
bit-identical between numpy and DuckDB; int64 sums are
order-independent), so every query is value-hash comparable to its SQL
twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from ..stages.partition import fit_partitions, partition_by


def _read(sf_dir: str, table: str, columns=None) -> "ray.data.Dataset":
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet",
                                 columns=columns)


def _cents(col) -> np.ndarray:
    x = col.to_numpy(zero_copy_only=False)
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join + grouped count
# ---------------------------------------------------------------------------

def tpch_q4_priority_counts(sf_dir: str, date_lo: str = "1997-07-01",
                            date_hi: str = "1997-10-01") -> pa.Table:
    """TPC-H Q4 shape (order priority checking): count orders per
    priority placed in one quarter that have at least one returned
    lineitem (EXISTS semi-join; the testdata has no
    l_commitdate/l_receiptdate, so `l_returnflag = 'R'` stands in for
    the late-delivery predicate -- same plan shape).

    Scale shape: lineitem collapses per block to distinct qualifying
    orderkeys (no payload), orders stream with the date filter pushed
    down; both sides co-partition on orderkey and the semi-join is one
    vectorized membership probe per partition; output is the bounded
    5-row priority census.
    """
    lo_us = int(np.datetime64(date_lo, "us").astype(np.int64))
    hi_us = int(np.datetime64(date_hi, "us").astype(np.int64))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])

    def o_prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["o_orderdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        keep = (us >= lo_us) & (us < hi_us)
        t = t.filter(pa.array(keep))
        n = t.num_rows
        return pa.table({"key": pc.cast(t["o_orderkey"], pa.int64()),
                         "side": pa.array(np.zeros(n, dtype=np.int64)),
                         "prio": t["o_orderpriority"]})

    def l_prep(t: pa.Table) -> pa.Table:
        keep = pc.equal(t["l_returnflag"], pa.scalar("R"))
        k = np.unique(t.filter(keep)["l_orderkey"].to_numpy(
            zero_copy_only=False).astype(np.int64))
        return pa.table({"key": pa.array(k),
                         "side": pa.array(np.ones(k.size,
                                                  dtype=np.int64)),
                         "prio": pa.array([""] * k.size,
                                          type=pa.string())})

    both = (orders.map_batches(o_prep, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(li.map_batches(l_prep, batch_format="pyarrow",
                                  zero_copy_batch=True)))

    part_empty = pa.table({"o_orderpriority": pa.array([],
                                                       type=pa.string()),
                           "n": pa.array([], type=pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        rkeys = np.unique(key[side == 1])
        omask = side == 0
        ok, oprio = key[omask], t["prio"].to_numpy(
            zero_copy_only=False)[omask]
        if ok.size == 0 or rkeys.size == 0:
            return part_empty
        pos = np.searchsorted(rkeys, ok)
        safe = np.minimum(pos, rkeys.size - 1)
        has = (pos < rkeys.size) & (rkeys[safe] == ok)
        staged = pa.table({"o_orderpriority": pa.array(
            oprio[has].astype(object), type=pa.string())})
        g = staged.group_by("o_orderpriority").aggregate([([], "count_all")])
        return pa.table({"o_orderpriority": g["o_orderpriority"],
                         "n": pc.cast(g["count_all"], pa.int64())})

    pre = partition_by(both, ["key"], fit_partitions(16), resolve,
                       part_empty)
    out = (pre.groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="order_count"))
           .to_pandas().sort_values("o_orderpriority"))
    return pa.table({
        "o_orderpriority": pa.array(out["o_orderpriority"].to_numpy(
            dtype=object), type=pa.string()),
        "order_count": pa.array(out["order_count"].to_numpy(
            dtype=np.int64)),
    })


TPCH_Q4_SQL = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-07-01'
  AND o.o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_returnflag = 'R')
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q12 shape: join + conditional counts
# ---------------------------------------------------------------------------

def tpch_q12_priority_by_status(sf_dir: str,
                                year: int = 1997) -> pa.Table:
    """TPC-H Q12 shape (shipping-mode priority split): for lineitems
    shipped in one year, per l_linestatus (stand-in for the missing
    l_shipmode), how many belong to high-priority orders (1-URGENT /
    2-HIGH) vs low-priority ones.

    Scale shape: orders collapse to (orderkey, is_high) bit pairs;
    lineitems filter on the ship-year and carry only (orderkey,
    status); co-partition on orderkey, one vectorized lookup per
    partition, bounded (status x 2) partial counts.
    """
    lo_us = int(np.datetime64(f"{year}-01-01", "us").astype(np.int64))
    hi_us = int(np.datetime64(f"{year + 1}-01-01", "us")
                .astype(np.int64))

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linestatus", "l_shipdate"])

    def o_prep(t: pa.Table) -> pa.Table:
        prio = t["o_orderpriority"]
        hi = pc.or_(pc.equal(prio, pa.scalar("1-URGENT")),
                    pc.equal(prio, pa.scalar("2-HIGH")))
        n = t.num_rows
        return pa.table({"key": pc.cast(t["o_orderkey"], pa.int64()),
                         "side": pa.array(np.zeros(n, dtype=np.int64)),
                         "hi": pc.cast(hi, pa.int64()),
                         "status": pa.array([""] * n,
                                            type=pa.string())})

    def l_prep(t: pa.Table) -> pa.Table:
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        t = t.filter(pa.array((us >= lo_us) & (us < hi_us)))
        n = t.num_rows
        return pa.table({"key": pc.cast(t["l_orderkey"], pa.int64()),
                         "side": pa.array(np.ones(n, dtype=np.int64)),
                         "hi": pa.array(np.zeros(n, dtype=np.int64)),
                         "status": t["l_linestatus"]})

    both = (orders.map_batches(o_prep, batch_format="pyarrow",
                               zero_copy_batch=True)
            .union(li.map_batches(l_prep, batch_format="pyarrow",
                                  zero_copy_batch=True)))

    part_empty = pa.table({"l_linestatus": pa.array([],
                                                    type=pa.string()),
                           "hl": pa.array([], type=pa.int64()),
                           "ll": pa.array([], type=pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        key = t["key"].to_numpy(zero_copy_only=False)
        om = side == 0
        ok = key[om]
        ohi = t["hi"].to_numpy(zero_copy_only=False)[om]
        order = np.argsort(ok, kind="stable")
        ok, ohi = ok[order], ohi[order]
        lm = side == 1
        lk = key[lm]
        lstat = t["status"].to_numpy(zero_copy_only=False)[lm]
        if lk.size == 0 or ok.size == 0:
            return part_empty
        pos = np.searchsorted(ok, lk)
        safe = np.minimum(pos, ok.size - 1)
        has = (pos < ok.size) & (ok[safe] == lk)
        hi = ohi[safe[has]]
        staged = pa.table({
            "l_linestatus": pa.array(lstat[has].astype(object),
                                     type=pa.string()),
            "hl": pa.array(hi.astype(np.int64)),
            "ll": pa.array((1 - hi).astype(np.int64))})
        g = staged.group_by("l_linestatus").aggregate(
            [("hl", "sum"), ("ll", "sum")])
        return pa.table({"l_linestatus": g["l_linestatus"],
                         "hl": pc.cast(g["hl_sum"], pa.int64()),
                         "ll": pc.cast(g["ll_sum"], pa.int64())})

    pre = partition_by(both, ["key"], fit_partitions(16), resolve,
                       part_empty)
    out = (pre.groupby("l_linestatus")
           .aggregate(Sum("hl", alias_name="high_line_count"),
                      Sum("ll", alias_name="low_line_count"))
           .to_pandas().sort_values("l_linestatus"))
    return pa.table({
        "l_linestatus": pa.array(out["l_linestatus"].to_numpy(
            dtype=object), type=pa.string()),
        "high_line_count": pa.array(
            out["high_line_count"].to_numpy(dtype=np.int64)),
        "low_line_count": pa.array(
            out["low_line_count"].to_numpy(dtype=np.int64)),
    })


TPCH_Q12_SQL = """
SELECT l.l_linestatus,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Q14 shape: broadcast-dim conditional revenue share
# ---------------------------------------------------------------------------

def tpch_q14_promo_share(sf_dir: str,
                         month: str = "1997-09") -> pa.Table:
    """TPC-H Q14 shape (promotion effect): the ppm share of one ship
    month's revenue that comes from PROMO-type parts.

    Scale shape: part is the bounded dim -- one pass collapses it to a
    broadcast sorted partkey array + promo bitmask (`ray.put` once);
    lineitem streams with the month filter, each block contributing two
    int64 cells (promo cents, total cents); the ratio is computed from
    the two folded integers.
    """
    lo_us = int(np.datetime64(month, "us").astype(np.int64))
    hi_np = (np.datetime64(month, "M") + 1).astype("datetime64[us]")
    hi_us = int(hi_np.astype(np.int64))

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def pkeys(t: pa.Table) -> pa.Table:
        return pa.table({
            "key": pc.cast(t["p_partkey"], pa.int64()),
            "promo": pc.cast(pc.equal(t["p_type"], pa.scalar("PROMO")),
                             pa.int64())})

    pdim = part.map_batches(pkeys, batch_format="pyarrow").to_pandas()
    pk = pdim["key"].to_numpy(dtype=np.int64)
    order = np.argsort(pk)
    pk = pk[order]
    promo = pdim["promo"].to_numpy(dtype=np.int64)[order]
    dim_ref = ray.put((pk, promo))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount",
                "l_shipdate"])

    empty = pa.table({"promo_cents": pa.array([], type=pa.int64()),
                      "total_cents": pa.array([], type=pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        keys, flags = ray.get(dim_ref)
        us = pc.cast(t["l_shipdate"], pa.int64()).to_numpy(
            zero_copy_only=False)
        t = t.filter(pa.array((us >= lo_us) & (us < hi_us)))
        if t.num_rows == 0:
            return empty
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5) \
            .astype(np.int64)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(keys, lp)
        safe = np.minimum(pos, keys.size - 1)
        has = (pos < keys.size) & (keys[safe] == lp)
        is_promo = np.zeros(lp.size, dtype=np.int64)
        is_promo[has] = flags[safe[has]]
        return pa.table({
            "promo_cents": pa.array([int((rev * is_promo).sum())],
                                    type=pa.int64()),
            "total_cents": pa.array([int(rev[has].sum())],
                                    type=pa.int64())})

    folded = (li.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .sum(["promo_cents", "total_cents"]))
    promo_c = int(folded["sum(promo_cents)"])
    total_c = int(folded["sum(total_cents)"])
    ppm = promo_c * 1_000_000 // total_c if total_c else 0
    return pa.table({"promo_cents": pa.array([promo_c],
                                             type=pa.int64()),
                     "total_cents": pa.array([total_c],
                                             type=pa.int64()),
                     "promo_ppm": pa.array([ppm], type=pa.int64())})


TPCH_Q14_SQL = """
WITH j AS (
  SELECT CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                    + 0.5) AS BIGINT) AS rev,
         CASE WHEN p.p_type = 'PROMO' THEN 1 ELSE 0 END AS promo
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
    AND l.l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT CAST(COALESCE(sum(rev * promo), 0) AS BIGINT) AS promo_cents,
       CAST(COALESCE(sum(rev), 0) AS BIGINT) AS total_cents,
       CAST(COALESCE(CAST(sum(rev * promo) AS HUGEINT) * 1000000
            // NULLIF(sum(rev), 0), 0) AS BIGINT) AS promo_ppm
FROM j
"""


# ---------------------------------------------------------------------------
# Q18 shape: HAVING-filtered aggregation + join-back
# ---------------------------------------------------------------------------

def tpch_q18_large_orders(sf_dir: str, min_qty: int = 250,
                          k: int = 100) -> pa.Table:
    """TPC-H Q18 shape (large-volume customers): orders whose total
    lineitem quantity exceeds ``min_qty``, joined back to the order
    header, top-k by total price.

    Scale shape: lineitem pre-aggregates (orderkey, qty) per block,
    co-partitions on orderkey, and each partition emits only qualifying
    orders (HAVING pushed into the partition fold); the qualifying set
    is a tiny data-dependent fraction (bounded by total_qty/min_qty),
    broadcast as a sorted array for the orders-side filter; per-block
    top-k prereduce before the final k-row fold.
    """
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    part_empty = pa.table({"key": pa.array([], type=pa.int64()),
                           "qty": pa.array([], type=pa.int64())})

    def l_partial(t: pa.Table) -> pa.Table:
        qty = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                       + 0.5).astype(np.int64)
        staged = pa.table({"key": pc.cast(t["l_orderkey"], pa.int64()),
                           "qty": pa.array(qty)})
        g = staged.group_by("key").aggregate([("qty", "sum")])
        return pa.table({"key": g["key"],
                         "qty": pc.cast(g["qty_sum"], pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        qty = t["qty"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        tot = np.bincount(inv, weights=qty.astype(np.float64)) \
            .astype(np.int64)
        big = tot > min_qty
        return pa.table({"key": pa.array(uk[big]),
                         "qty": pa.array(tot[big])})

    pre = partition_by(
        li.map_batches(l_partial, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["key"], fit_partitions(16), resolve, part_empty).to_pandas()
    qk = pre["key"].to_numpy(dtype=np.int64)
    order = np.argsort(qk)
    qk = qk[order]
    qq = pre["qty"].to_numpy(dtype=np.int64)[order]
    q_ref = ray.put((qk, qq))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate",
                    "o_totalprice"])

    out_empty = pa.table({
        "o_custkey": pa.array([], type=pa.int64()),
        "o_orderkey": pa.array([], type=pa.int64()),
        "o_orderdate": pa.array([], type=pa.int64()),
        "total_cents": pa.array([], type=pa.int64()),
        "sum_qty": pa.array([], type=pa.int64())})

    def o_join(t: pa.Table) -> pa.Table:
        keys, qtys = ray.get(q_ref)
        ok = t["o_orderkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(keys, ok)
        safe = np.minimum(pos, max(keys.size - 1, 0))
        has = (pos < keys.size) if keys.size else \
            np.zeros(ok.size, dtype=bool)
        if keys.size:
            has &= keys[safe] == ok
        t = t.filter(pa.array(has))
        if t.num_rows == 0:
            return out_empty
        cents = _cents_col(t["o_totalprice"])
        sq = qtys[safe[has]]
        order = np.lexsort((ok[has], -cents))[:k]
        return pa.table({
            "o_custkey": pc.cast(t["o_custkey"], pa.int64())
            .take(pa.array(order)),
            "o_orderkey": pa.array(ok[has][order]),
            "o_orderdate": pc.cast(t["o_orderdate"], pa.int64())
            .take(pa.array(order)),
            "total_cents": pa.array(cents[order]),
            "sum_qty": pa.array(sq[order])})

    pre2 = orders.map_batches(o_join, batch_format="pyarrow",
                              zero_copy_batch=True).to_pandas()
    order = np.lexsort((pre2["o_orderkey"].to_numpy(),
                        -pre2["total_cents"].to_numpy()))[:k]
    cols = {}
    for c in ["o_custkey", "o_orderkey", "o_orderdate", "total_cents",
              "sum_qty"]:
        cols[c] = pa.array(pre2[c].to_numpy(dtype=np.int64)[order])
    return pa.table(cols)


def _cents_col(col) -> np.ndarray:
    return np.floor(col.to_numpy(zero_copy_only=False) * 100.0
                    + 0.5).astype(np.int64)


TPCH_Q18_SQL = """
SELECT CAST(o.o_custkey AS BIGINT) AS o_custkey,
       CAST(o.o_orderkey AS BIGINT) AS o_orderkey,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate,
       CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)
         AS total_cents,
       CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_qty
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1, 2, 3, 4
HAVING sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) > 250
ORDER BY total_cents DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 shape: disjunctive bracket predicates via broadcast lookup
# ---------------------------------------------------------------------------

_Q19_BRACKETS = (
    # (brand, size_lo, size_hi, qty_lo, qty_hi)
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)


def tpch_q19_bracket_revenue(sf_dir: str) -> pa.Table:
    """TPC-H Q19 shape (discounted revenue from bracketed parts): sum
    revenue over a disjunction of (brand, size-range, quantity-range)
    brackets -- the canonical OR-of-ANDs predicate that a naive plan
    evaluates as three separate joins (the testdata has no p_container
    / l_shipmode, so those conjuncts are dropped; plan shape intact).

    Scale shape: part collapses to a broadcast sorted partkey array +
    per-part bracket id (0 = no bracket matches); lineitem streams
    once, resolving the quantity bracket per row against the looked-up
    id -- the disjunction costs one probe, not three joins; one int64
    cell per block.
    """
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])

    def pprep(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_numpy(zero_copy_only=False)
        size = t["p_size"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        grp = np.zeros(t.num_rows, dtype=np.int64)
        for gi, (b, slo, shi, _, _) in enumerate(_Q19_BRACKETS, 1):
            m = (brand == b) & (size >= slo) & (size <= shi)
            grp[m & (grp == 0)] = gi
        return pa.table({
            "key": pc.cast(t["p_partkey"], pa.int64()),
            "grp": pa.array(grp)})

    pdim = part.map_batches(pprep, batch_format="pyarrow").to_pandas()
    pk = pdim["key"].to_numpy(dtype=np.int64)
    order = np.argsort(pk)
    dim_ref = ray.put((pk[order],
                       pdim["grp"].to_numpy(dtype=np.int64)[order]))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice",
                "l_discount"])

    empty = pa.table({"revenue_cents": pa.array([], type=pa.int64()),
                      "n_lineitems": pa.array([], type=pa.int64())})

    def partial(t: pa.Table) -> pa.Table:
        keys, grps = ray.get(dim_ref)
        lp = t["l_partkey"].to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        pos = np.searchsorted(keys, lp)
        safe = np.minimum(pos, keys.size - 1)
        has = (pos < keys.size) & (keys[safe] == lp)
        grp = np.zeros(lp.size, dtype=np.int64)
        grp[has] = grps[safe[has]]
        qty = np.floor(t["l_quantity"].to_numpy(zero_copy_only=False)
                       + 0.5).astype(np.int64)
        keep = np.zeros(lp.size, dtype=bool)
        for gi, (_, _, _, qlo, qhi) in enumerate(_Q19_BRACKETS, 1):
            keep |= (grp == gi) & (qty >= qlo) & (qty <= qhi)
        if not keep.any():
            return empty
        price = t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[keep]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[keep]
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5) \
            .astype(np.int64)
        return pa.table({
            "revenue_cents": pa.array([int(rev.sum())],
                                      type=pa.int64()),
            "n_lineitems": pa.array([int(keep.sum())],
                                    type=pa.int64())})

    folded = (li.map_batches(partial, batch_format="pyarrow",
                             zero_copy_batch=True)
              .sum(["revenue_cents", "n_lineitems"]))
    return pa.table({
        "revenue_cents": pa.array([int(folded["sum(revenue_cents)"])],
                                  type=pa.int64()),
        "n_lineitems": pa.array([int(folded["sum(n_lineitems)"])],
                                type=pa.int64())})


TPCH_Q19_SQL = """
SELECT CAST(COALESCE(sum(CAST(floor(l.l_extendedprice
                                    * (1.0 - l.l_discount)
                                    * 100.0 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents,
       CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND CAST(floor(l.l_quantity + 0.5) AS BIGINT) BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND CAST(floor(l.l_quantity + 0.5) AS BIGINT) BETWEEN 10
           AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
       AND CAST(floor(l.l_quantity + 0.5) AS BIGINT) BETWEEN 20
           AND 30)
"""
