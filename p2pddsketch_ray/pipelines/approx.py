"""Approximate-aggregation pipelines: HLL distinct count, count-min point
queries, Bloom-prefiltered semi-join.

Each is the distributed build/merge of a mergeable accumulator (the same
dataflow as DDSketch, SURVEY.md section 3.3) with an exact-SQL-replicable
estimator, wired into __ray_entry__ as oracle-matched queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sketches.bloom import BloomFilter
from ..sketches.countmin import CountMinSketch
from ..sketches.hll import HyperLogLog
from ..stages.generic_build import build_and_merge


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def hll_build(ds, col: str, p: int = 12,
              hash_kind: str = "murmur64") -> HyperLogLog:
    def add(s: HyperLogLog, t: pa.Table) -> None:
        c = t[col]
        if c.null_count:
            c = c.drop_null()
        s.add_batch(c.to_numpy(zero_copy_only=False))
    return build_and_merge(ds, [col], lambda: HyperLogLog(p, hash_kind), add)


def hll_distinct_users(sf_dir: str) -> pa.Table:
    """HLL distinct-count of events.user_id with register-level stats so the
    DuckDB oracle can verify the whole sketch state, not just the estimate."""
    h = hll_build(_read(sf_dir, "events", ["user_id"]), "user_id", p=12)
    regs = h.registers
    return pa.table({
        "m": pa.array([h.m], type=pa.int64()),
        "nonzero_registers": pa.array([int((regs > 0).sum())], type=pa.int64()),
        "sum_registers": pa.array([int(regs.astype(np.int64).sum())],
                                  type=pa.int64()),
        "hll_estimate": pa.array([round(h.estimate(), 6)], type=pa.float64()),
    })


def cms_build(ds, col: str, width: int = 8192,
              depth: int = 4) -> CountMinSketch:
    def add(s: CountMinSketch, t: pa.Table) -> None:
        c = t[col]
        if c.null_count:
            c = c.drop_null()
        s.add_batch(c.to_numpy(zero_copy_only=False))
    return build_and_merge(ds, [col], lambda: CountMinSketch(width, depth), add)


def cms_user_counts(sf_dir: str) -> pa.Table:
    """Count-min estimated event count per distinct user: integer counters
    + DuckDB-replicable cells make the estimates exactly hash-matchable."""
    ds = _read(sf_dir, "events", ["user_id"])
    cms = cms_build(ds, "user_id", width=8192, depth=4)
    keys = np.asarray(sorted(ds.unique("user_id")), dtype=np.int64)
    est = cms.estimate(keys)
    return pa.table({
        "user_id": pa.array(keys, type=pa.int64()),
        "est_count": pa.array(est.astype(np.int64), type=pa.int64()),
    })


def bloom_semijoin_orders(sf_dir: str, min_acctbal: float = 7000.0) -> "ray.data.Dataset":
    """Semi-join via Bloom prefilter + exact confirm.

    Small side: customers with c_acctbal > min_acctbal.  A Bloom filter of
    their keys is broadcast (ray.put) and probed inside map_batches over
    orders -- at 100 TB this prunes the stream before the exact
    confirmation set is consulted, and false positives are removed by the
    exact set, so the output equals the plain semi-join (the SQL oracle).
    """
    import pyarrow.parquet as pq
    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_acctbal"])
    keys = cust.filter(pc.greater(cust["c_acctbal"],
                                  min_acctbal))["c_custkey"].to_numpy()
    bloom = BloomFilter.sized_for(max(64, len(keys)), fp_rate=0.01)
    bloom.add_batch(keys.astype(np.int64))
    bloom_ref = ray.put(bloom.to_row())
    # exact-confirm side: broadcast sorted int64 array, probed with np.isin
    exact_ref = ray.put(np.unique(keys.astype(np.int64)))

    ds = _read(sf_dir, "orders", ["o_custkey", "o_orderstatus"])

    def probe(t: pa.Table) -> pa.Table:
        b = BloomFilter.from_row(ray.get(bloom_ref))
        cand = b.contains_batch(t["o_custkey"].to_numpy(zero_copy_only=False)
                                .astype(np.int64))
        t = t.filter(pa.array(cand))
        confirm = ray.get(exact_ref)
        ok = np.isin(t["o_custkey"].to_numpy(zero_copy_only=False), confirm)
        return t.filter(pa.array(ok))

    from ray.data.aggregate import Count
    agg = (ds.map_batches(probe, batch_format="pyarrow")
           .groupby("o_orderstatus").aggregate(Count(alias_name="n_orders")))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderstatus": t["o_orderstatus"],
                         "n_orders": pc.cast(t["n_orders"], pa.int64())})

    return agg.map_batches(finalize, batch_format="pyarrow")


def hll_users_by_type(sf_dir: str, p: int = 12) -> "ray.data.Dataset":
    """GROUPED HLL: approximate distinct users per event_type -- the
    generic-sketch dataflow with a group key (one partial accumulator per
    (block, group), merged per group), emitting register-level stats so
    the DuckDB replica verifies the whole per-group sketch state.

    Scale shape: the shuffle moves one ~2^p-byte blob per (block, group)
    -- classic partial aggregation, skew-immune like the DDSketch path
    (a hot group still contributes one blob per block)."""
    import pickle

    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def partials(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        uid = (t["user_id"].drop_null().to_numpy(zero_copy_only=False)
               .astype(np.int64)
               if t["user_id"].null_count else
               t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        ut, inv = np.unique(et, return_inverse=True)
        names, blobs = [], []
        for g in range(ut.shape[0]):   # bounded by group cardinality
            h = HyperLogLog(p, "murmur64")
            h.add_batch(uid[inv == g])
            names.append(ut[g])
            blobs.append(pickle.dumps(h))
        return pa.table({"event_type": pa.array(names, type=pa.string()),
                         "blob": pa.array(blobs, type=pa.binary())})

    def merge_group(group: pa.Table) -> pa.Table:
        merged = None
        for b in group["blob"].to_pylist():
            s = pickle.loads(b)
            merged = s if merged is None else merged.merge(s)
        regs = merged.registers
        return pa.table({
            "event_type": pa.array([group["event_type"][0].as_py()],
                                   type=pa.string()),
            "m": pa.array([merged.m], type=pa.int64()),
            "nonzero_registers": pa.array([int((regs > 0).sum())],
                                          type=pa.int64()),
            "sum_registers": pa.array([int(regs.astype(np.int64).sum())],
                                      type=pa.int64()),
            "hll_estimate": pa.array([round(merged.estimate(), 6)],
                                     type=pa.float64()),
        })

    return (ds.map_batches(partials, batch_format="pyarrow",
                           zero_copy_batch=True)
            .groupby("event_type")
            .map_groups(merge_group, batch_format="pyarrow"))
