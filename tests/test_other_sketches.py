"""HyperLogLog / CountMin / Bloom: accuracy, merge properties, and
DuckDB-SQL replicability of the estimates (the basis for their oracle
entries in __ray_entry__)."""

import numpy as np
import pytest

from p2pddsketch_ray.sketches.bloom import BloomFilter
from p2pddsketch_ray.sketches.countmin import CountMinSketch
from p2pddsketch_ray.sketches.hll import HyperLogLog


# -- HyperLogLog -----------------------------------------------------------

def test_hll_accuracy_int_keys():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 10_000, 200_000)
    true = len(np.unique(keys))
    h = HyperLogLog(p=12)
    h.add_batch(keys)
    est = h.estimate()
    assert abs(est - true) / true < 0.05  # ~1.04/sqrt(4096) ~ 1.6%


def test_hll_merge_bit_identity_and_idempotence():
    rng = np.random.default_rng(2)
    keys = rng.integers(0, 50_000, 100_000)
    whole = HyperLogLog(p=10)
    whole.add_batch(keys)
    parts = []
    for chunk in np.array_split(keys, 7):
        s = HyperLogLog(p=10)
        s.add_batch(chunk)
        parts.append(s)
    import random
    for seed in (1, 2, 3):
        order = list(range(7))
        random.Random(seed).shuffle(order)
        acc = parts[order[0]].copy()
        for i in order[1:]:
            acc.merge(parts[i])
        assert acc.to_bytes() == whole.to_bytes()
    # idempotent: merging the same partial twice changes nothing
    acc2 = whole.copy().merge(parts[0])
    assert acc2.to_bytes() == whole.to_bytes()


def test_hll_matches_duckdb_replica():
    """The SQL in __ray_entry__ must reproduce registers + estimate."""
    import duckdb
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 3000, 20_000)
    h = HyperLogLog(p=12)
    h.add_batch(keys)
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"k": keys}))
    p, m = 12, 4096
    row = con.execute(f"""
WITH hashes AS (SELECT hash(k::BIGINT) AS hv FROM t),
regs AS (SELECT CAST(hv >> {64 - p} AS BIGINT) AS idx,
                CASE WHEN (hv & {(1 << (64 - p)) - 1}::UBIGINT) = 0 THEN {64 - p + 1}
                     ELSE {64 - p} - CAST(floor(log2(CAST(hv & {(1 << (64 - p)) - 1}::UBIGINT AS DOUBLE))) AS BIGINT)
                END AS rho
         FROM hashes),
mx AS (SELECT idx, max(rho) AS r FROM regs GROUP BY idx)
SELECT count(*) AS nreg, sum(r) AS sumr FROM mx""").fetchone()
    nreg, sumr = row
    ours = h.registers[h.registers > 0]
    assert len(ours) == nreg
    assert int(ours.astype(np.int64).sum()) == int(sumr)
    # small-range estimate path: integers only -> bit-identical
    zeros = int((h.registers == 0).sum())
    import math
    expect = m * math.log(m / zeros)
    assert h.estimate() == expect


def test_hll_string_hash_kinds():
    vals = [f"doc-{i}" for i in range(5000)]
    for kind in ("md5", "fast"):
        h = HyperLogLog(p=12, hash_kind=kind)
        h.add_batch(vals)
        assert abs(h.estimate() - 5000) / 5000 < 0.05
    with pytest.raises(ValueError):
        HyperLogLog(p=12, hash_kind="md5").merge(HyperLogLog(p=12))


# -- CountMin --------------------------------------------------------------

def test_cms_overestimates_and_is_accurate_for_heavy_hitters():
    rng = np.random.default_rng(5)
    # zipf-ish: heavy hitter 0 plus a long tail
    keys = np.concatenate([np.zeros(50_000, dtype=np.int64),
                           rng.integers(1, 100_000, 50_000)])
    c = CountMinSketch(width=8192, depth=4)
    c.add_batch(keys)
    true = np.bincount(keys[keys < 10], minlength=10)
    est = c.estimate(np.arange(10))
    assert (est >= true).all()          # one-sided error guarantee
    assert est[0] == pytest.approx(50_000, rel=0.01)
    assert c.n == 100_000


def test_cms_merge_bit_identity():
    rng = np.random.default_rng(6)
    keys = rng.integers(0, 1000, 30_000)
    whole = CountMinSketch(width=1024, depth=4)
    whole.add_batch(keys)
    a, b = CountMinSketch(1024, 4), CountMinSketch(1024, 4)
    a.add_batch(keys[:11_111]); b.add_batch(keys[11_111:])
    ab = a.copy().merge(b)
    ba = b.copy().merge(a)
    assert ab.to_bytes() == ba.to_bytes() == whole.to_bytes()
    with pytest.raises(ValueError):
        whole.merge(CountMinSketch(width=512, depth=4))


def test_cms_cells_match_duckdb():
    import duckdb
    import pandas as pd
    keys = np.arange(-50, 50, dtype=np.int64)
    c = CountMinSketch(width=4096, depth=4)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    for d, seed in enumerate(c.seeds):
        sql_cells = con.execute(
            f"SELECT hash(xor(k, {seed}::BIGINT)) % 4096 FROM t").df().iloc[:, 0]
        assert c._cells(keys, d).tolist() == sql_cells.astype(int).tolist()


# -- Bloom -----------------------------------------------------------------

def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(7)
    present = rng.choice(10**9, 20_000, replace=False).astype(np.int64)
    absent = (rng.choice(10**9, 20_000, replace=False) + 2 * 10**9).astype(np.int64)
    b = BloomFilter.sized_for(20_000, fp_rate=0.01)
    b.add_batch(present)
    assert b.contains_batch(present).all()         # zero false negatives
    fp = b.contains_batch(absent).mean()
    assert fp < 0.03


def test_bloom_merge_or_semantics():
    a, b = BloomFilter(1 << 12, 3), BloomFilter(1 << 12, 3)
    a.add_batch(np.arange(100, dtype=np.int64))
    b.add_batch(np.arange(100, 200, dtype=np.int64))
    m = a.copy().merge(b)
    assert m.contains_batch(np.arange(200, dtype=np.int64)).all()
    m2 = b.copy().merge(a)
    assert m.to_bytes() == m2.to_bytes()


def test_bloom_string_values_roundtrip():
    b = BloomFilter(1 << 14, 4)
    vals = [f"url-{i}" for i in range(1000)]
    b.add_batch(vals)
    assert b.contains_batch(vals).all()
    r = BloomFilter.from_row(b.to_row())
    assert r.to_bytes() == b.to_bytes()


# -- t-digest --------------------------------------------------------------

def exact_q(vals, q):
    return float(np.quantile(vals, q, method="lower"))


def rank_of(vals_sorted, x):
    return np.searchsorted(vals_sorted, x, side="left") / len(vals_sorted)


def test_tdigest_rank_error_bound():
    from p2pddsketch_ray.sketches.tdigest import TDigest
    rng = np.random.default_rng(9)
    vals = rng.lognormal(0, 2, 200_000)
    t = TDigest(compression=100)
    for chunk in np.array_split(vals, 37):
        t.add_batch(chunk)
    s = np.sort(vals)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99, 0.999):
        est = t.quantile(q)
        assert abs(rank_of(s, est) - q) <= 0.02, (q, est)
    # tails should be tighter than the middle (the t-digest promise)
    for q in (0.001, 0.999):
        est = t.quantile(q)
        assert abs(rank_of(s, est) - q) <= 0.005, (q, est)


def test_tdigest_merge_partitions_preserves_accuracy():
    from p2pddsketch_ray.sketches.tdigest import TDigest
    rng = np.random.default_rng(10)
    vals = rng.normal(100, 15, 120_000)
    parts = np.array_split(vals, 16)
    digests = []
    for p in parts:
        d = TDigest(compression=100)
        d.add_batch(p)
        digests.append(d)
    merged = digests[0]
    for d in digests[1:]:
        merged = merged.merge(d)
    assert merged.n == len(vals)
    s = np.sort(vals)
    for q in (0.05, 0.5, 0.95):
        assert abs(rank_of(s, merged.quantile(q)) - q) <= 0.03


def test_tdigest_row_roundtrip_and_bounds():
    from p2pddsketch_ray.sketches.tdigest import TDigest
    rng = np.random.default_rng(11)
    vals = rng.uniform(-50, 50, 30_000)
    t = TDigest(compression=64)
    t.add_batch(vals)
    t2 = TDigest.from_row(t.to_row())
    assert t2.quantile(0.5) == t.quantile(0.5)
    assert t.quantile(0.0) == vals.min()
    assert t.quantile(1.0) == vals.max()
    # centroid count bounded by the fixed k-space boundary count
    assert t.to_row()["means"].size <= len(t._bounds) + 1


# -- gossip compat mode ----------------------------------------------------

def test_merge_averaged_matches_reference_semantics():
    from p2pddsketch_ray.sketches.ddsketch import DDSketch
    a = DDSketch(alpha=0.01)
    b = DDSketch(alpha=0.01)
    a.add_batch(np.array([1.0, 2.0, 3.0]))
    b.add_batch(np.array([3.0, 100.0]))
    bins_a = dict(a.bins)
    bins_b = dict(b.bins)
    a.merge_averaged(b)
    for k in set(bins_a) | set(bins_b):
        want = (bins_a.get(k, 0.0) + bins_b.get(k, 0.0)) / 2.0
        assert a.bins.get(k, 0.0) == want
    assert a.n == (3 + 2) / 2.0


def test_gossip_converges_to_exact_global():
    """The compat harness reproduces the reference's convergence claim:
    every finalized peer approximates the exact global sketch, and
    1/weight[0] estimates the peer count (main.cpp:640)."""
    from p2pddsketch_ray.sketches.ddsketch import DDSketch
    from p2pddsketch_ray.sketches.gossip import gossip_simulate
    rng = np.random.default_rng(12)
    vals = rng.lognormal(0, 2, 50_000)
    peers = 10
    parts = np.array_split(np.sort(vals), peers)  # adversarial sorted split
    finalized, weights = gossip_simulate(parts, alpha=0.01, rounds=30,
                                         fan_out=2, seed=42)
    exact = DDSketch(alpha=0.01)
    exact.add_batch(vals)
    assert abs(1.0 / weights[0] - peers) / peers < 0.05
    for s in finalized:
        assert abs(s.n - exact.n) / exact.n < 1e-6
        for q in (0.1, 0.5, 0.9, 0.99):
            assert abs(s.quantile(q) - exact.quantile(q)) \
                <= 0.03 * abs(exact.quantile(q))


def test_hll_users_by_type_grouped(ray_session):
    """Grouped HLL: per-group estimates within the ~1.04/sqrt(m) rank
    error of exact distinct counts, and register state matching the
    per-group SQL replica."""
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as E
    from p2pddsketch_ray.pipelines.approx import hll_users_by_type
    sf = "/root/testdata/sf0.001"
    got = (hll_users_by_type(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(E.oracle_sql()["hll_users_by_type"]).df()
    assert got.equals(want.reset_index(drop=True))
    exact = con.execute("SELECT event_type, count(DISTINCT user_id) AS n "
                        "FROM events GROUP BY 1 ORDER BY 1").df()
    rel = abs(got["hll_estimate"].to_numpy()
              - exact["n"].to_numpy()) / exact["n"].to_numpy()
    assert (rel < 0.05).all()   # 3 sigma of 1.04/sqrt(4096) ~ 0.049


# --------------------------------------------------------------- KMV


def test_kmv_merge_equals_bulk_and_is_idempotent():
    from p2pddsketch_ray.sketches.kmv import KMVSketch
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 10_000, size=50_000).astype(np.int64)
    bulk = KMVSketch(64)
    bulk.add_batch(vals)
    parts = np.array_split(vals, 9)
    merged = None
    for p in parts:
        s = KMVSketch(64)
        s.add_batch(p)
        merged = s if merged is None else merged.merge(s)
    assert np.array_equal(merged.mins, bulk.mins)
    # idempotent: merging a sketch with itself changes nothing
    again = merged.merge(merged)
    assert np.array_equal(again.mins, merged.mins)
    # row round-trip
    rt = KMVSketch.from_row(merged.to_row())
    assert rt.k == merged.k and np.array_equal(rt.mins, merged.mins)


def test_kmv_estimate_accuracy_and_exact_below_k():
    from p2pddsketch_ray.sketches.kmv import KMVSketch
    rng = np.random.default_rng(5)
    # below k: exact
    small = KMVSketch(64)
    small.add_batch(np.arange(40, dtype=np.int64))
    assert small.estimate() == 40
    # above k: within 4 sigma of 1/sqrt(k-2)
    vals = rng.integers(0, 1 << 40, size=30_000).astype(np.int64)
    exact = np.unique(vals).shape[0]
    big = KMVSketch(256)
    big.add_batch(vals)
    rel = abs(big.estimate() - exact) / exact
    assert rel < 4.0 / np.sqrt(256 - 2)


def test_kmv_union_intersection_estimates():
    from p2pddsketch_ray.sketches.kmv import KMVSketch
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4000, size=20_000).astype(np.int64)
    b = rng.integers(2000, 6000, size=20_000).astype(np.int64)
    sa, sb = KMVSketch(512), KMVSketch(512)
    sa.add_batch(a)
    sb.add_batch(b)
    est_u, c, nl = sa.union_intersection(sb)
    exact_u = np.union1d(a, b).shape[0]
    exact_i = np.intersect1d(a, b).shape[0]
    assert abs(est_u - exact_u) / exact_u < 4.0 / np.sqrt(512 - 2)
    est_i = (c / nl) * est_u
    # intersection error scales with union/intersection ratio; loose bound
    assert abs(est_i - exact_i) / exact_i < 0.3


def test_kmv_queries_match_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as E
    from p2pddsketch_ray.pipelines.approx import (kmv_distinct_users,
                                                  kmv_user_overlap)
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    for name, fn in [("kmv_distinct_users", kmv_distinct_users),
                     ("kmv_user_overlap", kmv_user_overlap)]:
        got = fn(sf).to_pandas().reset_index(drop=True)
        want = con.execute(E.oracle_sql()[name]).df()
        assert got.equals(want.reset_index(drop=True)), name


# -- Misra-Gries ------------------------------------------------------------

def _zipf_stream(seed: int, n: int, n_keys: int = 5000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    z = rng.zipf(1.3, n)
    return np.minimum(z, n_keys).astype(np.int64)


def test_mg_estimate_bounds_and_error_guarantee():
    from p2pddsketch_ray.sketches.misragries import MisraGries
    v = _zipf_stream(7, 200_000)
    k = 64
    mg = MisraGries(k)
    for chunk in np.array_split(v, 37):  # uneven batched adds
        mg.add_batch(chunk)
    assert mg.n == v.size
    assert mg.err <= v.size // (k + 1) + 1
    true_keys, true_cnt = np.unique(v, return_counts=True)
    true = dict(zip(true_keys.tolist(), true_cnt.tolist()))
    keys, counts = mg.items()
    assert keys.size <= k
    for key, est in zip(keys.tolist(), counts.tolist()):
        t = true[key]
        assert est <= t <= est + mg.err
    # every item with true count > err is retained
    retained = set(keys.tolist())
    for key, t in true.items():
        if t > mg.err:
            assert key in retained


def test_mg_merge_guarantee_holds_for_any_merge_order():
    from p2pddsketch_ray.sketches.misragries import MisraGries
    v = _zipf_stream(11, 120_000)
    k = 32
    parts = np.array_split(v, 9)

    def build(order):
        sketches = []
        for p in parts:
            s = MisraGries(k)
            s.add_batch(p)
            sketches.append(s)
        merged = sketches[order[0]]
        for i in order[1:]:
            merged = merged.merge(sketches[i])
        return merged

    true_keys, true_cnt = np.unique(v, return_counts=True)
    true = dict(zip(true_keys.tolist(), true_cnt.tolist()))
    rng = np.random.default_rng(3)
    for _ in range(4):
        order = rng.permutation(len(parts)).tolist()
        m = build(order)
        assert m.n == v.size
        assert m.err <= v.size // (k + 1) + 1
        keys, counts = m.items()
        for key, est in zip(keys.tolist(), counts.tolist()):
            t = true[key]
            assert est <= t <= est + m.err
        retained = set(keys.tolist())
        for key, t in true.items():
            if t > m.err:
                assert key in retained


def test_mg_candidates_superset_of_true_heavy_hitters():
    from p2pddsketch_ray.sketches.misragries import MisraGries
    v = _zipf_stream(13, 80_000)
    mg = MisraGries(100)
    mg.add_batch(v)
    min_count = mg.err + 1  # smallest threshold the guarantee covers
    cand = set(mg.candidates(min_count).tolist())
    true_keys, true_cnt = np.unique(v, return_counts=True)
    heavy = set(true_keys[true_cnt >= min_count].tolist())
    assert heavy <= cand


def test_mg_exact_when_under_capacity():
    from p2pddsketch_ray.sketches.misragries import MisraGries
    v = np.repeat(np.arange(20, dtype=np.int64), 50)
    mg = MisraGries(64)
    mg.add_batch(v)
    assert mg.err == 0
    keys, counts = mg.items()
    assert keys.tolist() == list(range(20))
    assert counts.tolist() == [50] * 20


def test_join_size_estimate_never_underestimates(ray_session):
    """The CM inner-product estimate upper-bounds the exact join size
    and the audit matches a direct DuckDB count."""
    import duckdb
    from p2pddsketch_ray.pipelines.approx import join_size_estimate
    sf = "/root/testdata/sf0.001"
    out = join_size_estimate(sf).to_pydict()
    assert out["cms_estimate"][0] >= out["exact_join_size"][0]
    assert out["over_ppm"][0] >= 0
    con = duckdb.connect()
    want = con.execute(f"""
        SELECT count(*) FROM
          (SELECT user_id FROM read_parquet('{sf}/events.parquet')
           WHERE event_type = 'click') a
        JOIN
          (SELECT user_id FROM read_parquet('{sf}/events.parquet')
           WHERE event_type = 'view') b
        USING (user_id)""").fetchone()[0]
    assert out["exact_join_size"][0] == want


def test_mg_heavy_users_empty_answer_keeps_schema(ray_session, tmp_path):
    """When no user reaches the threshold the result is an EMPTY table
    WITH the output schema (the sf0.1 regime that used to drop it)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.approx import mg_heavy_users
    t = pa.table({"user_id": pa.array(list(range(400)) * 2,
                                      type=pa.int64())})
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = mg_heavy_users(str(tmp_path), k=390, inv_phi=100.0)
    df = out.to_pandas()
    assert len(df) == 0
    assert sorted(df.columns) == ["n_events", "user_id"]


def test_oracle_bloom_no_false_negatives_and_merge(ray_session):
    """Members always hit; merge ORs bitmaps; FP rate is plausible for
    the load factor."""
    from p2pddsketch_ray.pipelines.approx import _OracleBloom
    rng = np.random.default_rng(3)
    members = rng.choice(100000, 300, replace=False).astype(np.int64)
    b1 = _OracleBloom(2048, 2)
    b2 = _OracleBloom(2048, 2)
    b1.add_batch(members[:150])
    b2.add_batch(members[150:])
    b = b1.merge(b2)
    assert b.contains_batch(members).all()          # no false negatives
    probes = np.arange(200000, 201000, dtype=np.int64)
    fpr = b.contains_batch(probes).mean()
    assert fpr < 0.25                               # ~ (fill)^k


def test_bloom_fpr_audit_counts(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.approx import (_OracleBloom,
                                                  bloom_fpr_audit)
    keys = np.arange(1, 201, dtype=np.int64)
    bal = np.where(keys <= 50, 9000.0, 100.0)       # 50 members
    pq.write_table(pa.table({
        "c_custkey": pa.array(keys),
        "c_name": pa.array([f"c{k}" for k in keys]),
        "c_nationkey": pa.array(np.zeros(200, dtype=np.int32)),
        "c_acctbal": pa.array(bal),
        "c_mktsegment": pa.array(["x"] * 200),
    }), str(tmp_path / "customer.parquet"))
    out = bloom_fpr_audit(str(tmp_path)).to_pydict()
    ref = _OracleBloom(2048, 2)
    ref.add_batch(keys[:50])
    hits = ref.contains_batch(keys[50:])
    assert out["n_probes"] == [150]
    assert out["n_fp"] == [int(hits.sum())]
    assert out["fill_bits"] == [int(ref.bits.sum())]


def test_cms_error_report_never_underestimates(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.approx import cms_error_report
    rng = np.random.default_rng(5)
    uid = rng.integers(0, 50, 5000).astype(np.int64)
    pq.write_table(pa.table({"user_id": pa.array(uid)}),
                   str(tmp_path / "events.parquet"))
    out = cms_error_report(str(tmp_path)).to_pandas()
    assert (out["overestimate"] >= 0).all()
    assert (out["cms_est"] == out["exact"] + out["overestimate"]).all()
    # top-k by exact count, descending
    assert list(out["exact"]) == sorted(out["exact"], reverse=True)


def test_kmv_a_not_b_exact_when_unsaturated():
    from p2pddsketch_ray.sketches.kmv import KMVSketch
    a = np.arange(0, 40, dtype=np.int64)       # 40 distinct < k
    b = np.arange(30, 60, dtype=np.int64)      # overlap 30..39
    sa, sb = KMVSketch(64), KMVSketch(64)
    sa.add_batch(a)
    sb.add_batch(b)
    n_keep, theta, est_f = sa.a_not_b(sb)
    assert theta == 0                          # neither saturated
    assert n_keep == 30 and est_f == 30.0      # exact |A \ B|


def test_kmv_a_not_b_estimate_accuracy():
    from p2pddsketch_ray.sketches.kmv import KMVSketch
    rng = np.random.default_rng(11)
    a = rng.integers(0, 50_000, size=200_000).astype(np.int64)
    b = rng.integers(25_000, 75_000, size=200_000).astype(np.int64)
    sa, sb = KMVSketch(1024), KMVSketch(1024)
    sa.add_batch(a)
    sb.add_batch(b)
    n_keep, theta, est_f = sa.a_not_b(sb)
    assert theta > 0
    exact = np.setdiff1d(a, b).shape[0]
    assert abs(est_f - exact) / exact < 0.15
    # anti-symmetry sanity: |A\B| + |A&B| ~= |A|
    est_i = (sa.union_intersection(sb)[1]
             / sa.union_intersection(sb)[2]) \
        * sa.union_intersection(sb)[0]
    exact_a = np.unique(a).shape[0]
    assert abs((est_f + est_i) - exact_a) / exact_a < 0.2


def test_cms_weighted_overestimates_and_is_exact_when_sparse():
    from p2pddsketch_ray.sketches.countmin import CountMinSketch
    keys = np.array([1, 2, 3, 1, 2, 1], dtype=np.int64)
    w = np.array([10, 20, 30, 5, 5, 5], dtype=np.int64)
    s = CountMinSketch(8192, 4)
    s.add_batch(keys, w)
    est = s.estimate(np.array([1, 2, 3], dtype=np.int64))
    # 3 keys in 8192 cells: no collisions, estimates exact
    assert est.tolist() == [20, 25, 30]
    # CMS never underestimates
    s2 = CountMinSketch(16, 2)
    s2.add_batch(keys, w)
    est2 = s2.estimate(np.array([1, 2, 3], dtype=np.int64))
    assert (est2 >= np.array([20, 25, 30])).all()


# ---------------------------------------------------------------------------
# CountSketch (signed median)
# ---------------------------------------------------------------------------

def test_countsketch_exact_when_sparse():
    """With far fewer keys than cells, every estimate is exact (median
    read hits an uncollided cell)."""
    from p2pddsketch_ray.sketches.countsketch import CountSketch
    rng = np.random.default_rng(7)
    keys = rng.choice(10_000, size=20, replace=False).astype(np.int64)
    counts = rng.integers(1, 50, size=20).astype(np.int64)
    s = CountSketch(width=4096, depth=3)
    s.add_batch(np.repeat(keys, counts))
    est = s.estimate(keys)
    assert (est == counts).all()


def test_countsketch_merge_bit_identical():
    """Merge = elementwise add: any merge order gives identical cells."""
    from p2pddsketch_ray.sketches.countsketch import CountSketch
    rng = np.random.default_rng(11)
    parts = [rng.integers(0, 500, size=300).astype(np.int64)
             for _ in range(4)]
    a = CountSketch(width=256, depth=3)
    for p in parts:
        a.add_batch(p)
    b = None
    for p in reversed(parts):
        s = CountSketch(width=256, depth=3)
        s.add_batch(p)
        b = s if b is None else b.merge(s)
    assert (a.table == b.table).all()
    assert a.n == b.n
    # row-level round trip for the shuffle representation
    c = CountSketch.from_row(a.to_row())
    assert (c.table == a.table).all()


def test_countsketch_median_is_middle_order_statistic():
    """depth-3 estimate equals sum - max - min of the signed reads
    (the SQL twin's formula)."""
    from p2pddsketch_ray.sketches.countsketch import CountSketch
    rng = np.random.default_rng(3)
    keys = rng.integers(0, 64, size=2000).astype(np.int64)
    s = CountSketch(width=32, depth=3)   # force heavy collisions
    s.add_batch(keys)
    probe = np.arange(64, dtype=np.int64)
    reads = np.empty((3, 64), dtype=np.int64)
    for d in range(3):
        cells, signs = s._cells_signs(probe, d)
        reads[d] = signs * s.table[d][cells]
    manual = reads.sum(axis=0) - reads.max(axis=0) - reads.min(axis=0)
    assert (s.estimate(probe) == manual).all()


def test_countsketch_unbiased_vs_cms_onesided():
    """Under heavy collisions CMS only overestimates while count-sketch
    errors are two-sided and centred (sanity property, fixed seed)."""
    from p2pddsketch_ray.sketches.countmin import CountMinSketch
    from p2pddsketch_ray.sketches.countsketch import CountSketch
    rng = np.random.default_rng(5)
    keys = rng.integers(0, 4096, size=40_000).astype(np.int64)
    truth = np.bincount(keys, minlength=4096).astype(np.int64)
    probe = np.arange(4096, dtype=np.int64)
    cm = CountMinSketch(width=512, depth=4)
    cm.add_batch(keys)
    cs = CountSketch(width=512, depth=3)
    cs.add_batch(keys)
    cm_err = cm.estimate(probe) - truth
    cs_err = cs.estimate(probe) - truth
    assert (cm_err >= 0).all()                    # one-sided
    assert (cs_err < 0).any() and (cs_err > 0).any()   # two-sided
    assert abs(float(np.median(cs_err))) <= 2.0   # centred


def test_countsketch_topk_confirm_exact_counts(ray_session):
    """The confirmed column is the TRUE count for every surfaced key,
    and errors are two-sided (count-sketch, not count-min)."""
    import duckdb
    from p2pddsketch_ray.pipelines.approx import countsketch_topk_confirm
    sf = "/root/testdata/sf0.001"
    got = countsketch_topk_confirm(sf).to_pandas()
    con = duckdb.connect()
    truth = dict(con.execute(
        f"SELECT user_id, count(*) FROM "
        f"read_parquet('{sf}/events.parquet') GROUP BY 1").fetchall())
    for r in got.itertuples():
        assert int(r.exact_count) == truth[int(r.user_id)]
        assert int(r.err) == int(r.est_count) - int(r.exact_count)


def test_bloom_intersection_estimates_are_close(ray_session):
    """Fill-count estimates land within 15% of the true distinct user
    counts at sf0.001 (m=4096 is generously sized for ~50 users)."""
    import duckdb
    from p2pddsketch_ray.pipelines.approx import bloom_intersection_estimate
    sf = "/root/testdata/sf0.001"
    got = bloom_intersection_estimate(sf).to_pandas().iloc[0]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    na, nb, ni = con.execute("""
        SELECT (SELECT count(DISTINCT user_id) FROM events
                WHERE event_type='click'),
               (SELECT count(DISTINCT user_id) FROM events
                WHERE event_type='view'),
               (SELECT count(*) FROM
                  (SELECT DISTINCT user_id FROM events
                   WHERE event_type='click'
                   INTERSECT
                   SELECT DISTINCT user_id FROM events
                   WHERE event_type='view'))""").fetchone()
    assert abs(got["est_a_micro"] / 1e6 - na) <= 0.15 * na
    assert abs(got["est_b_micro"] / 1e6 - nb) <= 0.15 * nb
    assert abs(got["est_inter_micro"] / 1e6 - ni) <= 0.25 * max(ni, 1)


def test_bloom_intersection_raises_when_saturated(ray_session):
    """An undersized bitmap (every bit set) must raise a sizing error,
    not return ln(0)."""
    import pytest as _pytest
    from p2pddsketch_ray.pipelines.approx import bloom_intersection_estimate
    with _pytest.raises(ValueError, match="saturated"):
        bloom_intersection_estimate("/root/testdata/sf0.001",
                                    m_bits=4, k=2)


def test_decayed_cms_matches_duckdb_and_prefers_recent(ray_session):
    import duckdb
    import __ray_entry__ as entrymod
    from p2pddsketch_ray.pipelines.approx import decayed_cms_user_scores
    sf = "/root/testdata/sf0.001"
    got = decayed_cms_user_scores(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(
        entrymod.oracle_sql()["decayed_cms_user_scores"]).df()
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["est_decayed_micro"].astype("int64").tolist() \
        == want["est_decayed_micro"].astype("int64").tolist()
    # decay sanity: the top decayed score can't exceed 1e6 x the user's
    # raw event count (every weight <= 1e6), and is positive
    truth = dict(con.execute(
        "SELECT user_id, count(*) FROM events GROUP BY 1").fetchall())
    top = got.iloc[0]
    assert 0 < int(top["est_decayed_micro"]) \
        <= 1_000_000 * max(truth.values()) * 2  # CMS one-sided slack


def test_cms_join_size_never_underestimates(ray_session):
    import duckdb
    import __ray_entry__ as entrymod
    from p2pddsketch_ray.pipelines.approx import cms_join_size_estimate
    sf = "/root/testdata/sf0.001"
    got = cms_join_size_estimate(sf).to_pandas().iloc[0]
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(
        entrymod.oracle_sql()["cms_join_size_estimate"]).df().iloc[0]
    for c in ("est_join_size", "exact_join_size", "overestimate"):
        assert int(got[c]) == int(want[c]), c
    # inner-product bound is one-sided and the exact side is the
    # true join cardinality
    true = con.execute("SELECT count(*) FROM orders JOIN events "
                       "ON o_custkey = user_id").fetchone()[0]
    assert int(got["exact_join_size"]) == true
    assert int(got["est_join_size"]) >= true


# -- Linear counting / counting Bloom ---------------------------------------

def test_linear_counter_merge_and_accuracy():
    from p2pddsketch_ray.pipelines.approx import _LinearCounter
    rng = np.random.default_rng(7)
    keys = rng.integers(0, 900, 20_000)
    true = len(np.unique(keys))
    whole = _LinearCounter(4096)
    whole.add_batch(keys)
    # split/merge in any order == bulk (OR is commutative+idempotent)
    parts = []
    for chunk in np.array_split(keys, 5):
        s = _LinearCounter(4096)
        s.add_batch(chunk)
        parts.append(s)
    for order in ([0, 1, 2, 3, 4], [4, 2, 0, 3, 1]):
        acc = _LinearCounter(4096)
        for i in order:
            acc.merge(parts[i])
        assert (acc.bits == whole.bits).all()
    zeros = 4096 - int(whole.bits.sum())
    est = -4096 * np.log(zeros / 4096)
    # published regime: std err ~ sqrt(m*(exp(t)-t-1))/n with t=n/m
    assert abs(est - true) / true < 0.05


def test_counting_bloom_delete_restores_empty_and_membership():
    from p2pddsketch_ray.pipelines.approx import _CountingBloom
    keys = np.arange(500, dtype=np.int64)
    b = _CountingBloom(2048, 2)
    b.update_batch(keys, +1)
    assert b.contains_batch(keys).all()          # no false negatives
    b.update_batch(keys, -1)
    assert (b.cells == 0).all()                  # full delete restores zero
    # partial delete: remaining keys still all present
    b.update_batch(keys, +1)
    b.update_batch(keys[:250], -1)
    assert b.contains_batch(keys[250:]).all()
    # merge is additive and order-independent
    p1, p2 = _CountingBloom(2048, 2), _CountingBloom(2048, 2)
    p1.update_batch(keys[:250], +1)
    p2.update_batch(keys[250:], +1)
    merged = _CountingBloom(2048, 2)
    merged.merge(p2).merge(p1)
    whole = _CountingBloom(2048, 2)
    whole.update_batch(keys, +1)
    assert (merged.cells == whole.cells).all()


def test_linear_counting_and_counting_bloom_queries(ray_session):
    sf_dir = "/root/testdata/sf0.001"
    from p2pddsketch_ray.pipelines.approx import (
        counting_bloom_delete_audit, linear_counting_users)
    lc = linear_counting_users(sf_dir).to_pydict()
    assert lc["nonzero_bits"][0] > 0
    assert abs(lc["lc_estimate"][0] - lc["exact_distinct"][0]) \
        <= 0.1 * lc["exact_distinct"][0] + 3
    cb = counting_bloom_delete_audit(sf_dir).to_pydict()
    assert cb["n_remaining_present"][0] == cb["n_remaining"][0]
    assert cb["sum_cells"][0] == cb["k"][0] * cb["n_remaining"][0]


# -- Frequent Directions -----------------------------------------------------

def test_frequent_directions_bound_any_merge_order():
    from p2pddsketch_ray.sketches.freqdirs import FrequentDirections
    rng = np.random.default_rng(11)
    A = rng.normal(size=(3000, 32)) @ np.diag(np.linspace(4, 0.05, 32))
    gram = A.T @ A
    whole = FrequentDirections(8, 32)
    whole.add_batch(A)
    err, bound = whole.cov_error_vs(gram)
    assert 0 < err <= bound
    import random
    parts = []
    for c in np.array_split(A, 9):
        p = FrequentDirections(8, 32)
        p.add_batch(c)
        parts.append(p)
    for seed in (0, 1, 2):
        order = list(range(9))
        random.Random(seed).shuffle(order)
        acc = FrequentDirections(8, 32)
        for i in order:
            q = FrequentDirections(8, 32)
            q.rows = parts[i].rows.copy()
            q.n_rows, q.fro2 = parts[i].n_rows, parts[i].fro2
            acc.merge(q)
        err, bound = acc.cov_error_vs(gram)
        assert err <= bound
        assert acc.n_rows == 3000
        assert acc.rows.shape[0] <= 8 + 1  # post-merge shrink to ell


def test_frequent_directions_sketch_dominated_by_exact():
    # B^T B <= A^T A in the PSD order: x'(A'A - B'B)x >= 0
    from p2pddsketch_ray.sketches.freqdirs import FrequentDirections
    rng = np.random.default_rng(12)
    A = rng.normal(size=(800, 16))
    fd = FrequentDirections(6, 16)
    fd.add_batch(A)
    diff = A.T @ A - fd.gram()
    eig = np.linalg.eigvalsh(diff)
    assert eig.min() >= -1e-6


def test_frequent_directions_query_runs(ray_session):
    from p2pddsketch_ray.pipelines.knn import frequent_directions_embed
    t = frequent_directions_embed("/root/testdata/sf0.001").to_pydict()
    assert len(t["component"]) == 8
    assert all(t["spectral_err"][i] <= t["err_bound"][i]
               for i in range(8))
    # sketched spectrum never exceeds exact by more than fp noise
    assert all(s <= e + 1e-3
               for s, e in zip(t["sketched_eig"], t["exact_eig"]))


def test_bloom_partition_pruning_audit(ray_session, tmp_path):
    from p2pddsketch_ray.pipelines.approx import (
        bloom_partition_pruning_audit)
    t = bloom_partition_pruning_audit(
        "/root/testdata/sf0.001",
        out_dir=str(tmp_path / "parts")).to_pydict()
    # every probe is claimed at least by its true partition
    assert t["partitions_claiming"][0] >= t["n_probes"][0]
    assert t["false_partition_hits"][0] >= 0
    assert t["rows_found"][0] == t["n_probes"][0]
    assert 1 <= t["max_claims_one_probe"][0] <= t["n_partitions"][0]


def test_cmm_user_counts_matches_duckdb(ray_session):
    import duckdb
    from p2pddsketch_ray.pipelines.approx import (CMM_USER_COUNTS_SQL,
                                                  cmm_user_counts)
    sf = "/root/testdata/sf0.001"
    got = cmm_user_counts(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(CMM_USER_COUNTS_SQL).df()
    assert len(got) == len(want)
    for c in got.columns:
        assert (got[c].to_numpy()
                == want[c].to_numpy().astype("int64")).all(), c
    # count-min never undercounts; count-mean-min debiases downward
    assert (got["cm_est"] >= got["exact_count"]).all()
    assert (got["cmm_est_milli"] <= got["cm_est"] * 1000).all()
