"""Hand cases for the Q4/Q12/Q14/Q18/Q19-shaped pipelines."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _ts(date: str) -> int:
    return int(np.datetime64(date, "us").astype(np.int64))


def _write_ts(vals):
    return pa.array(np.array(vals, dtype=np.int64)).cast(
        pa.timestamp("us"))


def test_tpch_q4_exists_semijoin(ray_session, tmp_path):
    """Only in-quarter orders with >=1 returned line are counted."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q4_priority_counts
    IN, OUT = _ts("1997-08-01"), _ts("1997-11-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderdate": _write_ts([IN, IN, IN, OUT]),
        "o_orderpriority": pa.array(
            ["1-URGENT", "1-URGENT", "5-LOW", "1-URGENT"]),
    }), str(tmp_path / "orders.parquet"))
    # order 1: returned line; order 2: only 'N' lines; order 3:
    # returned; order 4: returned but out of the quarter.
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 4], type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "N", "R", "R"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q4_priority_counts(str(tmp_path)).to_pydict()
    assert out["o_orderpriority"] == ["1-URGENT", "5-LOW"]
    assert out["order_count"] == [1, 1]


def test_tpch_q12_priority_split(ray_session, tmp_path):
    """High/low counts split by order priority within the ship year."""
    from p2pddsketch_ray.pipelines.tpch import (
        tpch_q12_priority_by_status)
    IN, OUT = _ts("1997-06-01"), _ts("1998-06-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_orderpriority": pa.array(["2-HIGH", "5-LOW"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 2, 2], type=pa.int64()),
        "l_linestatus": pa.array(["O", "F", "O", "O"]),
        "l_shipdate": _write_ts([IN, IN, IN, OUT]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q12_priority_by_status(str(tmp_path)).to_pydict()
    assert out["l_linestatus"] == ["F", "O"]
    assert out["high_line_count"] == [1, 1]
    assert out["low_line_count"] == [0, 1]


def test_tpch_q14_promo_share(ray_session, tmp_path):
    """Promo ppm = promo cents over total cents of the ship month."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q14_promo_share
    IN, OUT = _ts("1997-09-10"), _ts("1997-10-10")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_type": pa.array(["PROMO", "STANDARD"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 2, 1], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 300.0, 50.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0]),
        "l_shipdate": _write_ts([IN, IN, OUT]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q14_promo_share(str(tmp_path)).to_pydict()
    assert out["promo_cents"] == [10000]
    assert out["total_cents"] == [40000]
    assert out["promo_ppm"] == [250000]


def test_tpch_q18_having_joinback(ray_session, tmp_path):
    """Only orders whose qty sum crosses the threshold survive, sorted
    by total price."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q18_large_orders
    D = _ts("1997-01-01")
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], type=pa.int64()),
        "o_custkey": pa.array([10, 20, 30], type=pa.int64()),
        "o_orderdate": _write_ts([D, D, D]),
        "o_totalprice": pa.array([100.0, 900.0, 500.0]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 2, 2, 3], type=pa.int64()),
        "l_quantity": pa.array([5.0, 4.0, 3.0, 9.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q18_large_orders(str(tmp_path), min_qty=6).to_pydict()
    # orders 2 (qty 7) and 3 (qty 9) qualify; sorted by price desc
    assert out["o_orderkey"] == [2, 3]
    assert out["sum_qty"] == [7, 9]
    assert out["total_cents"] == [90000, 50000]


def test_tpch_q13_zero_bucket(ray_session, tmp_path):
    """Customers with no (qualifying) orders land in the c_count=0
    bucket -- the LEFT-JOIN semantics the arithmetic zero bucket
    replaces."""
    from p2pddsketch_ray.pipelines.relational import q13_custdist
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 30, 40], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    # cust 10: two kept orders; cust 20: one kept + one URGENT
    # (excluded); cust 30: only URGENT (-> zero bucket); cust 40:
    # no orders at all (-> zero bucket).
    pq.write_table(pa.table({
        "o_custkey": pa.array([10, 10, 20, 20, 30], type=pa.int64()),
        "o_orderpriority": pa.array(
            ["5-LOW", "5-LOW", "5-LOW", "1-URGENT", "1-URGENT"]),
    }), str(tmp_path / "orders.parquet"))
    out = q13_custdist(str(tmp_path)).to_pydict()
    # custdist desc, then c_count desc: (0,2), (2,1), (1,1)
    assert out["c_count"] == [0, 2, 1]
    assert out["custdist"] == [2, 1, 1]


def test_tpch_q17_threshold_cross_multiplication(ray_session, tmp_path):
    """Only brand lines strictly below 20% of the part's mean quantity
    count; the comparison is exact integer cross-multiplication."""
    from p2pddsketch_ray.pipelines.relational import (
        q17_small_quantity_revenue)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#99"]),
    }), str(tmp_path / "part.parquet"))
    # part 1: quantities 1, 10, 10 -> mean 7, threshold 1.4; only the
    # qty-1 line (price 50.00) qualifies.  Boundary check: qty 1.4
    # would NOT qualify (strict <).  part 2 is out of brand.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 2], type=pa.int64()),
        "l_quantity": pa.array([1.0, 10.0, 10.0, 0.5]),
        "l_extendedprice": pa.array([50.0, 70.0, 70.0, 90.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = q17_small_quantity_revenue(str(tmp_path)).to_pydict()
    assert out["n_rows"] == [1]
    assert out["total_cents"] == [5000]
    assert out["avg_yearly_cents"] == [5000 // 7]


def test_tpch_q19_bracket_disjunction(ray_session, tmp_path):
    """Each bracket applies its own quantity range; non-bracket parts
    contribute nothing."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q19_bracket_revenue
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_brand": pa.array(["Brand#12", "Brand#23", "Brand#99"]),
        "p_size": pa.array([3, 8, 1], type=pa.int64()),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        # part 1 qty 5 (in 1..11: keep), part 1 qty 20 (out),
        # part 2 qty 15 (in 10..20: keep), part 3 qty 5 (no bracket)
        "l_partkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_quantity": pa.array([5.0, 20.0, 15.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 100.0, 200.0, 400.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q19_bracket_revenue(str(tmp_path)).to_pydict()
    # 100.00 + 200*0.5 = 200.00
    assert out["revenue_cents"] == [20000]
    assert out["n_lineitems"] == [2]


def test_tpch_q7_direction_split(ray_session, tmp_path):
    """Revenue is attributed to the (supp, cust) direction; same-nation
    and third-nation flows are excluded."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q7_volume_shipping
    Y97 = _ts("1997-05-01")
    Y98 = _ts("1998-05-01")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_nationkey": pa.array([1, 2, 3], type=pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20, 30], type=pa.int64()),
        "c_nationkey": pa.array([1, 2, 3], type=pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([100, 200, 300], type=pa.int64()),
        "o_custkey": pa.array([10, 20, 30], type=pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2, 3], type=pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2", "NATION_3"]),
        "n_regionkey": pa.array([0, 0, 0], type=pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    # supp2 -> cust1 (B->A, 1997); supp1 -> cust2 (A->B, 1997 and
    # 1998); supp1 -> cust1 (same nation, excluded);
    # supp3 -> cust2 (third nation, excluded)
    pq.write_table(pa.table({
        "l_orderkey": pa.array([100, 200, 200, 100, 200],
                               type=pa.int64()),
        "l_suppkey": pa.array([2, 1, 1, 1, 3], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 400.0, 800.0,
                                     1600.0]),
        "l_discount": pa.array([0.0, 0.0, 0.5, 0.0, 0.0]),
        "l_shipdate": _write_ts([Y97, Y97, Y98, Y97, Y97]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q7_volume_shipping(
        str(tmp_path), "NATION_1", "NATION_2").to_pydict()
    assert out["supp_nation"] == ["NATION_1", "NATION_1", "NATION_2"]
    assert out["cust_nation"] == ["NATION_2", "NATION_2", "NATION_1"]
    assert out["l_year"] == [1997, 1998, 1997]
    assert out["revenue_c"] == [20000, 20000, 10000]


def test_tpch_q15_ties_all_returned(ray_session, tmp_path):
    """Every supplier attaining the max revenue is returned, not a
    LIMIT-1 winner."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q15_top_supplier
    IN = _ts("1997-02-01")
    OUT = _ts("1997-06-01")
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
    }), str(tmp_path / "supplier.parquet"))
    # supp 1 and 3 tie at 300.00 in-window; supp 2 leads only if the
    # out-of-window line leaked in
    pq.write_table(pa.table({
        "l_suppkey": pa.array([1, 1, 3, 2, 2], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 200.0, 300.0, 250.0,
                                     900.0]),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0, 0.0]),
        "l_shipdate": _write_ts([IN, IN, IN, IN, OUT]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q15_top_supplier(str(tmp_path)).to_pydict()
    assert out["s_suppkey"] == [1, 3]
    assert out["s_name"] == ["S1", "S3"]
    assert out["total_revenue_c"] == [30000, 30000]


def test_tpch_q21_only_failing_supplier(ray_session, tmp_path):
    """Counted only when: F order, >=2 suppliers, exactly one supplier
    has a returned line, and it is this supplier."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q21_waiting_supplier
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_name": pa.array(["S1", "S2"]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "o_orderstatus": pa.array(["F", "F", "F", "O"]),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        # order 1: S1 returned, S2 clean -> count S1
        # order 2: both returned -> nobody (nr=2)
        # order 3: only S1 participates -> nobody (nsupp=1)
        # order 4: qualifies except status O -> nobody
        "l_orderkey": pa.array([1, 1, 2, 2, 3, 4, 4],
                               type=pa.int64()),
        "l_suppkey": pa.array([1, 2, 1, 2, 1, 1, 2],
                              type=pa.int64()),
        "l_returnflag": pa.array(["R", "N", "R", "R", "R", "R", "N"]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q21_waiting_supplier(str(tmp_path)).to_pydict()
    assert out["s_name"] == ["S1"]
    assert out["numwait"] == [1]


def test_tpch_q22_threshold_and_antijoin(ray_session, tmp_path):
    """Keeps only no-order customers strictly above the positive-mean
    balance of the code set."""
    from p2pddsketch_ray.pipelines.tpch import (
        tpch_q22_sales_opportunity)
    pq.write_table(pa.table({
        # codes {3, 8}: balances 100, 300 (+ a negative that is
        # excluded from the mean but still a candidate row) -> mean
        # of positives = 200.  cust 13 (bal 300, no orders) kept;
        # cust 11 (bal 300) has an order; cust 12 (bal 100) below;
        # cust 99 outside the code set.
        "c_custkey": pa.array([11, 12, 13, 14, 99],
                              type=pa.int64()),
        "c_nationkey": pa.array([3, 3, 8, 8, 1], type=pa.int64()),
        "c_acctbal": pa.array([300.0, 100.0, 300.0, -50.0, 900.0]),
    }), str(tmp_path / "customer.parquet"))
    # cust 11 ordered recently; cust 13's only order predates the
    # cutoff, so it still counts as lapsed
    REC, OLD = _ts("2000-06-01"), _ts("1998-06-01")
    pq.write_table(pa.table({
        "o_custkey": pa.array([11, 11, 13, 99], type=pa.int64()),
        "o_orderdate": _write_ts([REC, REC, OLD, REC]),
    }), str(tmp_path / "orders.parquet"))
    out = tpch_q22_sales_opportunity(
        str(tmp_path), codes=(3, 8)).to_pydict()
    assert out["cntrycode"] == [8]
    assert out["numcust"] == [1]
    assert out["totacctbal_c"] == [30000]


def test_tpch_q2_argmin_tiebreak(ray_session, tmp_path):
    """Per-part minimum unit price wins; ties break to the lowest
    suppkey; out-of-region suppliers never win."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q2_min_cost_supplier
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_size": pa.array([5, 5], type=pa.int64()),
        "p_type": pa.array(["STANDARD", "STANDARD"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "r_regionkey": pa.array([0, 1], type=pa.int64()),
        "r_name": pa.array(["EUROPE", "ASIA"]),
    }), str(tmp_path / "region.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], type=pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2"]),
        "n_regionkey": pa.array([0, 1], type=pa.int64()),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3"]),
        "s_nationkey": pa.array([1, 1, 2], type=pa.int64()),
        "s_acctbal": pa.array([10.0, 50.0, 99.0]),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        # part 1: S1 and S2 both at unit 2.00 -> tie to S1; S3
        # cheaper but out of region.  part 2: S2 at unit 1.00 beats
        # S1 at 3.00.
        "l_partkey": pa.array([1, 1, 1, 2, 2], type=pa.int64()),
        "l_suppkey": pa.array([2, 1, 3, 1, 2], type=pa.int64()),
        "l_quantity": pa.array([2.0, 4.0, 10.0, 1.0, 3.0]),
        "l_extendedprice": pa.array([4.0, 8.0, 1.0, 3.0, 3.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q2_min_cost_supplier(str(tmp_path)).to_pydict()
    # ordered by acctbal desc: S2 (part 2) then S1 (part 1)
    assert out["s_name"] == ["S2", "S1"]
    assert out["p_partkey"] == [2, 1]
    assert out["unit_price_tm"] == [1_000_000, 2_000_000]
    assert out["s_acctbal_c"] == [5000, 1000]


def test_tpch_q9_profit_cost_proration(ray_session, tmp_path):
    """Profit = revenue minus retail-prorated cost, per supplier
    nation and order year; non-matching part names are out."""
    from p2pddsketch_ray.pipelines.tpch import tpch_q9_product_profit
    Y97, Y98 = _ts("1997-03-01"), _ts("1998-03-01")
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_name": pa.array(["red widget", "blue bolt"]),
        "p_retailprice": pa.array([10.0, 99.0]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([1, 2], type=pa.int64()),
        "n_name": pa.array(["NATION_1", "NATION_2"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2], type=pa.int64()),
        "s_nationkey": pa.array([1, 2], type=pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([10, 20], type=pa.int64()),
        "o_orderdate": _write_ts([Y97, Y98]),
    }), str(tmp_path / "orders.parquet"))
    # S1/1997: rev 100.00, cost 10.00*3 = 30.00 -> profit 70.00
    # S2/1998: rev 50.00 at 50% disc = 25.00, cost 10.00*1 -> 15.00
    # part 2 line: name does not match -> excluded
    pq.write_table(pa.table({
        "l_orderkey": pa.array([10, 20, 10], type=pa.int64()),
        "l_partkey": pa.array([1, 1, 2], type=pa.int64()),
        "l_suppkey": pa.array([1, 2, 1], type=pa.int64()),
        "l_quantity": pa.array([3.0, 1.0, 5.0]),
        "l_extendedprice": pa.array([100.0, 50.0, 777.0]),
        "l_discount": pa.array([0.0, 0.5, 0.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q9_product_profit(str(tmp_path)).to_pydict()
    assert out["nation"] == ["NATION_1", "NATION_2"]
    assert out["o_year"] == [1997, 1998]
    assert out["profit_c"] == [7000, 1500]


def test_tpch_q20_mean_multiple_dominance(ray_session, tmp_path):
    """A supplier qualifies only when its pair share exceeds mult x
    the mean supplier share of that part, and it sits in the target
    nation."""
    from p2pddsketch_ray.pipelines.tpch import (
        tpch_q20_dominant_suppliers)
    pq.write_table(pa.table({
        "p_partkey": pa.array([1, 2], type=pa.int64()),
        "p_brand": pa.array(["Brand#23", "Brand#23"]),
    }), str(tmp_path / "part.parquet"))
    pq.write_table(pa.table({
        "n_nationkey": pa.array([5, 6], type=pa.int64()),
        "n_name": pa.array(["NATION_5", "NATION_6"]),
    }), str(tmp_path / "nation.parquet"))
    pq.write_table(pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "s_name": pa.array(["S1", "S2", "S3", "S4"]),
        "s_nationkey": pa.array([5, 5, 5, 6], type=pa.int64()),
    }), str(tmp_path / "supplier.parquet"))
    # part 1: 4 suppliers, qty 90/4/3/3 -> only S1 (90 * 4 > 2*100).
    # part 2: S4 dominates but is in NATION_6 -> excluded; S2 at
    # 10/110 of part 2 does not qualify there (10*2 < 2*110... wait
    # np=2: 10*2=20 < 2*120) -> out.
    pq.write_table(pa.table({
        "l_partkey": pa.array([1, 1, 1, 1, 2, 2], type=pa.int64()),
        "l_suppkey": pa.array([1, 2, 3, 4, 4, 2], type=pa.int64()),
        "l_quantity": pa.array([90.0, 4.0, 3.0, 3.0, 110.0, 10.0]),
    }), str(tmp_path / "lineitem.parquet"))
    out = tpch_q20_dominant_suppliers(str(tmp_path)).to_pydict()
    assert out["s_name"] == ["S1"]
