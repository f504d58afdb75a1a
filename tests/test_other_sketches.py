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
