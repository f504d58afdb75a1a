"""Connected components: small-star/large-star vs a union-find oracle,
plus the composed near-dup clustering driver query vs its recursive-CTE
replica."""

import numpy as np
import pyarrow as pa
import pytest


def _uf_oracle(n, edges):
    p = list(range(n))

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    lab = {}
    for members in comp.values():
        m = min(members)
        for x in members:
            lab[x] = m
    return lab


@pytest.mark.parametrize("n,ne,seed", [
    (200, 150, 17),   # forest-ish: many small components
    (100, 300, 1),    # dense: one giant component
    (50, 0, 2),       # no edges: all singletons
    (400, 200, 3),    # long chains (sparse random)
])
def test_connected_components_matches_union_find(ray_session, n, ne, seed):
    import ray.data
    from p2pddsketch_ray.pipelines.components import connected_components

    rng = np.random.default_rng(seed)
    e = rng.integers(0, n, size=(ne, 2)).astype(np.int64)
    edges = ray.data.from_arrow(pa.table({"a": e[:, 0], "b": e[:, 1]}))
    nodes = ray.data.from_arrow(
        pa.table({"node": np.arange(n, dtype=np.int64)}))
    got = (connected_components(edges, nodes).to_pandas()
           .sort_values("node").reset_index(drop=True))
    want = _uf_oracle(n, e.tolist())
    assert len(got) == n
    assert all(want[int(r.node)] == int(r.component)
               for r in got.itertuples())


def test_connected_components_path_graph_needs_multiple_rounds(ray_session):
    """A single path 0-1-2-...-63 exercises the O(log n) round loop (a
    one-round algorithm would leave distant nodes unlabeled)."""
    import ray.data
    from p2pddsketch_ray.pipelines.components import connected_components

    n = 64
    a = np.arange(n - 1, dtype=np.int64)
    edges = ray.data.from_arrow(pa.table({"a": a, "b": a + 1}))
    nodes = ray.data.from_arrow(
        pa.table({"node": np.arange(n, dtype=np.int64)}))
    got = connected_components(edges, nodes).to_pandas()
    assert (got["component"] == 0).all() and len(got) == n


def test_neardup_components_matches_recursive_cte(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as E
    from p2pddsketch_ray.pipelines.components import neardup_components

    sf = "/root/testdata/sf0.001"
    got = neardup_components(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["neardup_components"]).df()
    assert got.equals(want.reset_index(drop=True))


def test_neardup_keep_stats_matches_recursive_cte(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as E
    from p2pddsketch_ray.pipelines.components import neardup_keep_stats

    sf = "/root/testdata/sf0.001"
    got = neardup_keep_stats(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(E.oracle_sql()["neardup_keep_stats"]).df()
    assert got.equals(want.reset_index(drop=True))
    # kept corpus = number of components (one survivor per cluster)
    n_comp = con.execute(E.oracle_sql()["neardup_components"]).df()[
        "component"].nunique()
    assert got["n_kept"].sum() == n_comp


def test_pagerank_matches_duckdb_and_sums_to_mass(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.components import (PAGERANK_SQL,
                                                      pagerank_part_supplier)
    sf = "/root/testdata/sf0.001"
    got = pagerank_part_supplier(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    want = con.execute(PAGERANK_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    assert len(got) == 20
    # ranks are a probability mass (ppt scale): every entry positive and
    # below the total mass; top-ranked first
    assert (got["rank_ppt"] > 0).all()
    assert (got["rank_ppt"] <= 1_000_000_000_000).all()
    r = got["rank_ppt"].to_numpy()
    assert (r[:-1] >= r[1:]).all()


def test_order_skyline_matches_duckdb_and_is_pareto(ray_session):
    duckdb = pytest.importorskip("duckdb")
    import numpy as np
    from p2pddsketch_ray.pipelines.relational import (ORDER_SKYLINE_SQL,
                                                      order_skyline)
    sf = "/root/testdata/sf0.001"
    got = order_skyline(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                f"read_parquet('{sf}/orders.parquet')")
    want = con.execute(ORDER_SKYLINE_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    # Pareto property vs the raw table: nothing in the table strictly
    # dominates any skyline point (<= day and >= price with one strict)
    raw = con.execute("""
        SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS price_c
        FROM orders""").df()
    rd, rp = raw["day"].to_numpy(), raw["price_c"].to_numpy()
    for day, price in got[["day", "price_c"]].itertuples(index=False):
        dom = (rd <= day) & (rp >= price) & ((rd < day) | (rp > price))
        assert not dom.any()


def test_pagerank_mass_conservation(ray_session):
    """Total rank mass stays within the floor-loss bound of SCALE: each
    of the 3 iterations floors once per edge and once in the base term,
    so the loss is < |E| + |V| units per iteration -- parts-per-trillion
    of the total.  Catches any double-count or dropped-edge regression."""
    import duckdb
    import numpy as np
    from p2pddsketch_ray.pipelines.components import pagerank_part_supplier
    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                f"read_parquet('{sf}/lineitem.parquet')")
    n_edges2 = con.execute("""SELECT 2 * count(*) FROM (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)""").fetchone()[0]
    n_nodes = con.execute("""SELECT count(*) FROM (
        SELECT l_partkey*2 AS v FROM lineitem UNION
        SELECT l_suppkey*2+1 FROM lineitem)""").fetchone()[0]
    # top_k = all nodes so the full mass is visible
    got = pagerank_part_supplier(sf, top_k=10**9).to_pandas()
    assert len(got) == n_nodes
    total = int(got["rank_ppt"].sum())
    SCALE = 1_000_000_000_000
    max_loss = 3 * (n_edges2 + n_nodes) + n_nodes  # per-iter floors + init
    assert SCALE - max_loss <= total <= SCALE


@pytest.mark.parametrize("n,p,seed", [(12, 0.4, 1), (30, 0.2, 2),
                                      (20, 0.9, 3)])
def test_triangle_stats_matches_brute_force(ray_session, n, p, seed):
    import itertools
    import ray.data
    from p2pddsketch_ray.pipelines.components import triangle_stats
    rng = np.random.default_rng(seed)
    adj = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(i + 1, n):
            if rng.random() < p:
                adj[i, j] = adj[j, i] = True
    a, b = np.nonzero(np.triu(adj, 1))
    edges = ray.data.from_arrow(pa.table({
        "a": pa.array(a.astype(np.int64)),
        "b": pa.array(b.astype(np.int64))}))
    got = triangle_stats(edges)
    tri = sum(1 for x, y, z in itertools.combinations(range(n), 3)
              if adj[x, y] and adj[y, z] and adj[x, z])
    deg = adj.sum(axis=1).astype(int)
    assert got["n_triangles"] == tri
    assert got["n_edges"] == int(a.size)
    assert got["n_vertices"] == int((deg > 0).sum())
    assert got["n_wedges"] == int((deg * (deg - 1) // 2).sum())


def test_copresence_triangles_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.components import (
        COPRESENCE_TRIANGLES_SQL, copresence_triangles)
    sf = "/root/testdata/sf0.001"
    got = copresence_triangles(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(COPRESENCE_TRIANGLES_SQL).df()
    assert got.equals(want)


def test_assortativity_star_is_negative(ray_session, tmp_path):
    """A star graph (hub co-present with every spoke in distinct
    cells) is maximally disassortative: r == -1e6 exactly for a star
    (all degree-1 spokes attach to the one hub)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.components import (
        copresence_assortativity)
    HOUR_US = 3_600_000_000
    # hub user 0 shares a distinct (type, hour) cell with each of 6
    # spokes (users 3, 6, ..., 18 to survive the user_mod=3 panel)
    rows_u, rows_ts = [], []
    for i, spoke in enumerate(range(3, 21, 3)):
        rows_u += [0, spoke]
        rows_ts += [i * HOUR_US, i * HOUR_US]
    pq.write_table(pa.table({
        "ts": pa.array(np.array(rows_ts, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "event_type": pa.array(["view"] * len(rows_u)),
        "user_id": pa.array(np.array(rows_u, dtype=np.int64)),
    }), str(tmp_path / "events.parquet"))
    out = copresence_assortativity(str(tmp_path)).to_pydict()
    assert out["n_directed_edges"] == [12]
    assert out["assortativity_ppm"] == [-1_000_000]


def test_assortativity_clique_is_degenerate_zero(ray_session,
                                                 tmp_path):
    """A clique (all users share one cell) has constant degree ->
    zero variance -> the sign-safe division yields 0."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    from p2pddsketch_ray.pipelines.components import (
        copresence_assortativity)
    users = np.array([0, 3, 6, 9], dtype=np.int64)
    pq.write_table(pa.table({
        "ts": pa.array(np.zeros(4, dtype=np.int64)).cast(
            pa.timestamp("us")),
        "event_type": pa.array(["view"] * 4),
        "user_id": pa.array(users),
    }), str(tmp_path / "events.parquet"))
    out = copresence_assortativity(str(tmp_path)).to_pydict()
    assert out["n_directed_edges"] == [12]
    assert out["assortativity_ppm"] == [0]


def test_neardup_keep_best_quality_matches_duckdb(ray_session):
    """Quality-keep parity with the recursive-CTE oracle at sf0.001,
    plus the structural invariant: component count is preserved (one
    keeper per component, whatever the keep rule)."""
    duckdb = pytest.importorskip("duckdb")
    import __ray_entry__ as entrymod
    from p2pddsketch_ray.pipelines.components import (
        neardup_keep_best_quality, neardup_keep_stats)
    sf = "/root/testdata/sf0.001"
    got = neardup_keep_best_quality(sf).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(
        entrymod.oracle_sql()["neardup_keep_best_quality"]).df()
    assert got["lang"].tolist() == want["lang"].tolist()
    for c in ("n_kept", "sum_chars"):
        assert got[c].astype("int64").tolist() \
            == want[c].astype("int64").tolist(), c
    # same number of survivors as the min-id keep rule: both keep
    # exactly one doc per component
    base = neardup_keep_stats(sf).to_pandas()
    assert int(got["n_kept"].sum()) == int(base["n_kept"].sum())
    # quality rule can only hold MORE characters than min-id keep
    assert int(got["sum_chars"].sum()) >= int(base["sum_chars"].sum())


def test_kcore_matches_bruteforce_peel(ray_session):
    import duckdb
    import numpy as np
    from p2pddsketch_ray.pipelines.components import kcore_part_graph
    sf = "/root/testdata/sf0.001"
    k, rounds = 8, 6
    got = kcore_part_graph(sf, k=k, rounds=rounds).to_pydict()
    # brute force: same distinct-pair graph, python peel
    con = duckdb.connect()
    e = con.execute(f"""
      WITH m AS (SELECT DISTINCT l_orderkey o, l_partkey p
                 FROM read_parquet('{sf}/lineitem.parquet')) 
      SELECT DISTINCT a.p, b.p FROM m a JOIN m b
      ON a.o = b.o AND a.p < b.p""").fetchnumpy()
    a = e["p"].astype(np.int64)
    b = e["p_1"].astype(np.int64)
    exp_nodes, exp_edges = [], []
    for r in range(rounds + 1):
        nodes, counts = np.unique(np.concatenate([a, b]),
                                  return_counts=True)
        exp_nodes.append(len(nodes))
        exp_edges.append(len(a))
        surv = set(nodes[counts >= k].tolist())
        keep = np.array([x in surv and y in surv
                         for x, y in zip(a.tolist(), b.tolist())],
                        dtype=bool) if len(a) else np.zeros(0, bool)
        a, b = a[keep], b[keep]
    assert got["n_nodes"] == exp_nodes
    assert got["n_edges"] == exp_edges
    # peeling is monotone
    assert all(x >= y for x, y in zip(exp_nodes, exp_nodes[1:]))
