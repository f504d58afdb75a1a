"""As-of join: vectorized partition kernel edge cases + DuckDB
ASOF JOIN oracle parity of the driver query."""

import numpy as np
import pyarrow as pa
import pytest


def _make_ds(table: pa.Table):
    import ray.data
    return ray.data.from_arrow(table)


def _run_join(left: pa.Table, right: pa.Table, **kw):
    from p2pddsketch_ray.pipelines.temporal import asof_join
    out = asof_join(_make_ds(left), _make_ds(right), **kw)
    return pa.concat_tables(
        [t for t in map(__import__("ray").get,
                        out.materialize().to_arrow_refs()) if t.num_rows]
    ).sort_by([("eid", "ascending")])


def test_asof_basic_semantics(ray_session):
    left = pa.table({
        "eid": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "k": pa.array([10, 10, 10, 20, 30], type=pa.int64()),
        "t": pa.array([100, 50, 5, 100, 100], type=pa.int64()),
    })
    right = pa.table({
        "k2": pa.array([10, 10, 20], type=pa.int64()),
        "t2": pa.array([10, 100, 60], type=pa.int64()),
        "val": pa.array([111, 222, 333], type=pa.int64()),
    })
    out = _run_join(left, right, left_on="k", right_on="k2",
                    left_ts="t", right_ts="t2",
                    left_cols=["eid", "k", "t"],
                    right_cols=["val"], num_partitions=2)
    # eid1: t=100 -> inclusive match at t2=100 (val 222)
    # eid2: t=50  -> t2=10 (val 111)
    # eid3: t=5   -> no right row at/before -> unmatched
    # eid4: key 20, t=100 -> t2=60 (val 333)
    # eid5: key 30 -> no right rows at all -> unmatched
    assert out["eid"].to_pylist() == [1, 2, 3, 4, 5]
    assert out["val"].to_pylist() == [222, 111, None, 333, None]
    assert out["_matched"].to_pylist() == [True, True, False, True, False]


def test_asof_all_rows_one_match_per_left(ray_session):
    rng = np.random.default_rng(7)
    n_l, n_r = 2000, 500
    left = pa.table({
        "eid": pa.array(np.arange(n_l), type=pa.int64()),
        "k": pa.array(rng.integers(0, 40, n_l), type=pa.int64()),
        "t": pa.array(rng.integers(0, 10_000, n_l), type=pa.int64()),
    })
    right = pa.table({
        "k2": pa.array(rng.integers(0, 40, n_r), type=pa.int64()),
        "t2": pa.array(rng.integers(0, 10_000, n_r), type=pa.int64()),
        "val": pa.array(np.arange(n_r), type=pa.int64()),
    })
    out = _run_join(left, right, left_on="k", right_on="k2",
                    left_ts="t", right_ts="t2",
                    left_cols=["eid", "k", "t"], right_cols=["t2", "val"],
                    num_partitions=4)
    assert out.num_rows == n_l                      # LEFT join: all rows
    # brute-force reference
    k2 = right["k2"].to_numpy(); t2 = right["t2"].to_numpy()
    val = right["val"].to_numpy()
    for row in out.slice(0, 300).to_pylist():
        cand = np.nonzero((k2 == row["k"]) & (t2 <= row["t"]))[0]
        if cand.shape[0] == 0:
            assert not row["_matched"]
        else:
            best_t = t2[cand].max()
            assert row["_matched"] and row["t2"] == best_t


def test_events_asof_orders_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.temporal import (EVENTS_ASOF_ORDERS_SQL,
                                                    events_asof_orders)
    sf = "/root/testdata/sf0.001"
    got = (events_asof_orders(sf).to_pandas()
           .sort_values(["event_type", "o_orderpriority"])
           .reset_index(drop=True))
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    want = con.execute(EVENTS_ASOF_ORDERS_SQL).df()
    assert got.equals(want.reset_index(drop=True))
