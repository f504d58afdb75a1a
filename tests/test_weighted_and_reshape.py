"""Weighted DDSketch inserts + winsorized mean, per-group distinct,
and crosstab pivot operators."""

import numpy as np
import pyarrow as pa
import pytest

from p2pddsketch_ray.sketches.ddsketch import DDSketch


def test_weighted_add_equals_repetition():
    """Integer weights must behave exactly like repeating each value
    weight-many times (same bins, same n, same quantiles)."""
    rng = np.random.default_rng(7)
    vals = rng.lognormal(3.0, 1.0, size=500)
    wts = rng.integers(0, 6, size=500)
    a = DDSketch(alpha=0.01)
    a.add_batch(vals, wts)
    b = DDSketch(alpha=0.01)
    b.add_batch(np.repeat(vals, wts))
    assert a.bins == b.bins and a.n == b.n
    for q in (0.1, 0.5, 0.9, 0.99):
        assert a.quantile(q) == b.quantile(q)


def test_weighted_quantile_within_alpha():
    rng = np.random.default_rng(11)
    vals = rng.lognormal(2.0, 0.8, size=4000)
    wts = rng.integers(1, 9, size=4000)
    s = DDSketch(alpha=0.01)
    s.add_batch(vals, wts)
    expanded = np.sort(np.repeat(vals, wts))
    for q in (0.5, 0.95, 0.99):
        exact = expanded[int(q * (expanded.size - 1))]
        assert abs(s.quantile(q) - exact) / exact <= 0.0101


def test_weighted_add_rejects_bad_weights():
    s = DDSketch(alpha=0.01)
    with pytest.raises(ValueError):
        s.add_batch([1.0, 2.0], [1.0])
    with pytest.raises(ValueError):
        s.add_batch([1.0, 2.0], [1.0, -0.5])


def test_weighted_pipeline_matches_oracle(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as E
    sf = "/root/testdata/sf0.001"
    got = E.queries()["dds_weighted_price"](sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(E.oracle_sql()["dds_weighted_price"]).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))


def test_winsorized_price_stats(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.relational import (
        WINSORIZED_PRICE_SQL, winsorized_price_stats)
    sf = "/root/testdata/sf0.001"
    got = winsorized_price_stats(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(WINSORIZED_PRICE_SQL).df()
    assert got.reset_index(drop=True).equals(want.reset_index(drop=True))
    # ~1% of rows clamped on each side (quantile_disc rank semantics)
    n = got["n"][0]
    assert got["n_clamped_lo"][0] <= 0.011 * n
    assert got["n_clamped_hi"][0] <= 0.011 * n
    assert got["n_clamped_hi"][0] > 0


def test_distinct_users_per_type(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.relational import (
        DISTINCT_USERS_PER_TYPE_SQL, distinct_users_per_type)
    sf = "/root/testdata/sf0.001"
    got = (distinct_users_per_type(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(DISTINCT_USERS_PER_TYPE_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    assert (got["n_users"] <= got["n_events"]).all()


def test_docs_lang_source_pivot(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.relational import (DOC_SOURCES,
                                                      DOCS_PIVOT_SQL,
                                                      docs_lang_source_pivot)
    sf = "/root/testdata/sf0.001"
    got = (docs_lang_source_pivot(sf).to_pandas()
           .sort_values("lang").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(DOCS_PIVOT_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    # row sums reproduce the per-lang doc counts
    per_lang = con.execute("SELECT lang, count(*) AS n FROM documents "
                           "GROUP BY 1 ORDER BY 1").df()
    assert (got[list(DOC_SOURCES)].sum(axis=1).to_numpy()
            == per_lang["n"].to_numpy()).all()


def test_label_centroids_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.relational import (LABEL_CENTROIDS_SQL,
                                                      label_centroids)
    sf = "/root/testdata/sf0.001"
    got = (label_centroids(sf).to_pandas()
           .sort_values(["label", "dim"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                f"read_parquet('{sf}/embeddings.parquet')")
    want = con.execute(LABEL_CENTROIDS_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    # centroid recovery: sum_units / n_vecs / 1e6 ~= the numpy mean
    import pyarrow.parquet as pq
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["label", "embedding"])
    from p2pddsketch_ray.functions.vectors import list_to_matrix
    mat = list_to_matrix(t["embedding"])
    lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    for label in np.unique(lab):
        mean = mat[lab == label].mean(axis=0)
        rows = got[got["label"] == label].sort_values("dim")
        rec = rows["sum_units"].to_numpy() / rows["n_vecs"].to_numpy() / 1e6
        assert np.abs(rec - mean).max() < 1e-5
