"""Distributed connected components over an edge Dataset -- the cluster-
canonicalization step a production dedup pipeline runs AFTER candidate
pairs are found (near-dup pairs say "a ~ b"; keeping one doc per
duplicate CLUSTER needs the transitive closure).

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce and
Beyond", SoCC 2014).  Each round is ONE coarse hash co-partition of the
(both-direction) edge list keyed on the center node with a fully
vectorized per-partition kernel -- no joins, no per-node Python -- and
the edge set provably converges to stars (every node linked to its
component minimum) in O(log n) rounds.  Shuffle traffic per round is
O(|E|) 16-byte rows and shrinks monotonically after the first small-star;
the only driver-side state is a (count, checksum) convergence scalar per
round.  This is the scale path for 10^12-document corpora where even the
candidate-pair graph can be billions of edges.

The reference has no graph operators (its igraph topologies,
/root/reference/graph.cpp:7-135, simulate gossip peers, not data); this
is a north-star addition in the same spirit as the dedup stack.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..stages.partition import fit_partitions, partition_by

_EMPTY_EDGES = pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64())})


def _canonical_dedup(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Drop self-loops, canonicalize lo<hi, sort + unique."""
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo != hi
    lo, hi = lo[keep], hi[keep]
    if lo.shape[0] == 0:
        return _EMPTY_EDGES
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    uniq = np.ones(lo.shape[0], dtype=bool)
    uniq[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    return pa.table({"a": pa.array(lo[uniq]), "b": pa.array(hi[uniq])})


def _star_round(edges: "ray.data.Dataset", large: bool,
                nparts: int) -> "ray.data.Dataset":
    """One large-star (connect every v>u neighbor to min(N+(u))) or
    small-star (connect every v<=u neighbor, and u itself, to the min)
    round: both-direction expansion + center-keyed co-partition +
    vectorized run kernel."""

    def both(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"u": pa.array([], type=pa.int64()),
                             "v": pa.array([], type=pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(np.concatenate([a, b])),
                         "v": pa.array(np.concatenate([b, a]))})

    def kernel(t: pa.Table) -> pa.Table:
        u = t["u"].to_numpy(zero_copy_only=False)
        v = t["v"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, u))
        u, v = u[order], v[order]
        n = u.shape[0]
        new = np.ones(n, dtype=bool)
        new[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new)[0]
        rlen = np.diff(np.append(starts, n))
        m_run = np.minimum(np.minimum.reduceat(v, starts), u[starts])
        m_row = np.repeat(m_run, rlen)
        if large:
            mask = v > u
            out_a, out_b = v[mask], m_row[mask]
        else:
            mask = v <= u
            out_a = np.concatenate([v[mask], u[starts]])
            out_b = np.concatenate([m_row[mask], m_run])
        return _canonical_dedup(out_a, out_b)

    # dedup happens within each partition only: a canonical pair can
    # survive in at most two partitions (its two centers), so the edge
    # multiset stays within 2x of the distinct set -- and because the
    # kernels and hash partitioning are deterministic, the multiset
    # still reaches a fixpoint the signature detects.  Skipping a
    # global-distinct exchange halves the executions per round.
    return partition_by(edges.map_batches(both, batch_format="pyarrow"),
                        ["u"], nparts, kernel, _EMPTY_EDGES)


def _edge_signature(edges: "ray.data.Dataset") -> tuple[int, int]:
    """(count, order-independent checksum) of the canonical edge set --
    the two scalars the driver keeps per round for convergence."""
    from ..hashing import splitmix64

    def cks(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"n": pa.array([0], type=pa.int64()),
                             "s": pa.array([0], type=pa.int64())})
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        h = splitmix64(a * np.int64(1_000_003) + b)
        s = int((h >> np.uint64(1)).astype(np.int64).sum() % (1 << 62))
        return pa.table({"n": pa.array([t.num_rows], type=pa.int64()),
                         "s": pa.array([s], type=pa.int64())})

    from ray.data.aggregate import Sum
    agg = edges.map_batches(cks, batch_format="pyarrow").aggregate(
        Sum("n", alias_name="n"), Sum("s", alias_name="s"))
    return int(agg["n"] or 0), int((agg["s"] or 0) % (1 << 62))


def connected_components(edges: "ray.data.Dataset",
                         nodes: "ray.data.Dataset",
                         max_rounds: int = 64) -> "ray.data.Dataset":
    """Labels every node with the minimum node id of its connected
    component.  ``edges``: columns (a, b) int64, undirected, self-loops
    and duplicates tolerated.  ``nodes``: column (node) -- isolated
    nodes keep their own id.  Returns columns (node, component)."""
    nparts = fit_partitions(16)
    edges = edges.materialize()
    sig = _edge_signature(edges)
    for _ in range(max_rounds):
        edges = _star_round(edges, large=True, nparts=nparts).materialize()
        edges = _star_round(edges, large=False, nparts=nparts).materialize()
        new_sig = _edge_signature(edges)
        if new_sig == sig:
            break
        sig = new_sig
    else:
        raise RuntimeError(f"connected_components did not converge in "
                           f"{max_rounds} rounds")

    def leaf_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["b"], "component": t["a"]})

    def self_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["node"], "component": t["node"]})

    from ray.data.aggregate import Min
    lab = edges.map_batches(leaf_labels, batch_format="pyarrow").union(
        nodes.map_batches(self_labels, batch_format="pyarrow"))
    return lab.groupby("node").aggregate(Min("component",
                                             alias_name="component"))


def neardup_components(sf_dir: str, k: int = 9, max_doc_id: int = 40,
                       jacc_den: int = 16) -> pa.Table:
    """Driver query: connected components of the exact n-gram Jaccard
    similarity graph (edge iff jacc_den * |inter| >= |union|, i.e.
    Jaccard >= 1/jacc_den) over documents with doc_id < max_doc_id --
    composing the verification-tier pair finder with the cluster
    canonicalizer.  Output: (doc_id, component) one row per document;
    oracle = the same pairs CTE + a recursive-CTE transitive closure."""
    from .dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(sf_dir, k=k, max_doc_id=max_doc_id)
    good = pa.compute.greater_equal(
        pa.compute.multiply(pairs["inter"], pa.scalar(jacc_den,
                                                      type=pa.int64())),
        pairs["uni"])
    sel = pairs.filter(good)
    edges = ray.data.from_arrow(pa.table({"a": sel["doc_a"],
                                          "b": sel["doc_b"]}))
    import pyarrow.dataset as pads
    nodes = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"],
        filter=(pads.field("doc_id") < max_doc_id)).map_batches(
        lambda t: pa.table({"node": t["doc_id"]}), batch_format="pyarrow")

    out = connected_components(edges, nodes).to_pandas()
    out = out.sort_values("node").reset_index(drop=True)
    return pa.table({
        "doc_id": pa.array(out["node"].to_numpy().astype(np.int64)),
        "component": pa.array(out["component"].to_numpy()
                              .astype(np.int64)),
    })


def neardup_keep_stats(sf_dir: str, k: int = 9, max_doc_id: int = 40,
                       jacc_den: int = 16) -> pa.Table:
    """The near-dup KEEP step: after clustering the similarity graph,
    keep exactly one document per connected component (the component's
    min doc_id) and report the surviving corpus per lang -- the
    composition that turns candidate pairs into an actual deduplicated
    training corpus (exact-dedup's dedup_exact_keep, near-dup edition).

    Keep rule: a doc survives iff it IS its component's label (the
    component id is already the min doc_id by construction)."""
    comp = neardup_components(sf_dir, k=k, max_doc_id=max_doc_id,
                              jacc_den=jacc_den)
    keep_mask = pa.compute.equal(comp["doc_id"], comp["component"])
    keep_ids = comp.filter(keep_mask)["doc_id"].to_numpy(
        zero_copy_only=False)

    import pyarrow.dataset as pads
    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "lang", "n_chars"],
        filter=(pads.field("doc_id") < max_doc_id))
    ids_ref = ray.put(np.sort(keep_ids.astype(np.int64)))

    empty = pa.table({"lang": pa.array([], type=pa.string()),
                      "n_kept": pa.array([], type=pa.int64()),
                      "sum_chars": pa.array([], type=pa.int64())})

    def rollup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return empty
        keep = ray.get(ids_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        sel = np.isin(ids, keep)
        kept = t.filter(pa.array(sel))
        if kept.num_rows == 0:
            return empty
        lang = kept["lang"].to_numpy(zero_copy_only=False)
        chars = kept["n_chars"].to_numpy(zero_copy_only=False)
        ul, inv = np.unique(lang, return_inverse=True)
        return pa.table({
            "lang": pa.array(ul, type=pa.string()),
            "n_kept": pa.array(np.bincount(inv).astype(np.int64)),
            "sum_chars": pa.array(np.bincount(
                inv, weights=chars).astype(np.int64)),
        })

    from ray.data.aggregate import Sum
    agg = (docs.map_batches(rollup, batch_format="pyarrow",
                            zero_copy_batch=True)
           .groupby("lang")
           .aggregate(Sum("n_kept", alias_name="n_kept"),
                      Sum("sum_chars", alias_name="sum_chars")))
    out = agg.to_pandas().sort_values("lang").reset_index(drop=True)
    return pa.table({
        "lang": pa.array(out["lang"], type=pa.string()),
        "n_kept": pa.array(out["n_kept"].astype("int64")),
        "sum_chars": pa.array(out["sum_chars"].astype("int64")),
    })


def pagerank_part_supplier(sf_dir: str, iters: int = 3,
                           top_k: int = 20) -> pa.Table:
    """Fixed-iteration PAGERANK over the part<->supplier bipartite graph
    (edges = distinct (l_partkey, l_suppkey) pairs of lineitem) -- the
    engine's iterative-numeric message-passing class, complementing the
    label-propagation class above.  All arithmetic is INTEGER
    (rank mass in parts-per-trillion, damping 85/100 applied as
    ``(r * 85) // (100 * deg)`` with per-edge flooring), so the result
    is bit-exact against a chained-CTE DuckDB replica -- no float
    summation order anywhere.

    Scale shape: the distinct-edge build is a composite-key groupby
    (O(|E|) 16-byte rows); node degrees attach to edges ONCE via a
    src-keyed co-partition (static across iterations, materialized).
    The node set here is DIMENSION-sized (parts + suppliers), so each
    round broadcasts the sorted (v, r) vector once via ray.put and every
    edge batch looks ranks up by searchsorted, pre-combining per-dst
    contributions in-batch -- the single O(|E|-combined) integer Sum
    exchange is the only shuffle per round.  For a corpus-sized node set
    (a web graph) swap the broadcast for the same src-keyed co-partition
    ``attach_deg`` uses; the iteration body is otherwise identical."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Sum

    SCALE = np.int64(1_000_000_000_000)
    ds = ray.data.read_parquet(f"{sf_dir}/lineitem.parquet",
                               columns=["l_partkey", "l_suppkey"])

    def edge_partial(t: pa.Table) -> pa.Table:
        p = pc.cast(t["l_partkey"], pa.int64()).to_numpy(
            zero_copy_only=False) * np.int64(2)
        s = pc.cast(t["l_suppkey"], pa.int64()).to_numpy(
            zero_copy_only=False) * np.int64(2) + np.int64(1)
        comp = np.unique((p << np.int64(32)) | s)
        return pa.table({"pair": pa.array(comp)})

    pairs = (ds.map_batches(edge_partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .groupby("pair").aggregate(Count(alias_name="_c")))

    def expand(t: pa.Table) -> pa.Table:
        comp = t["pair"].to_numpy(zero_copy_only=False)
        a = comp >> np.int64(32)
        b = comp & np.int64((1 << 32) - 1)
        return pa.table({
            "src": pa.array(np.concatenate([a, b])),
            "dst": pa.array(np.concatenate([b, a])),
        })

    # edges and deg are each consumed by several stages -- pin them
    edges = pairs.map_batches(expand,
                              batch_format="pyarrow").materialize()
    deg = edges.groupby("src").aggregate(
        Count(alias_name="d")).materialize()

    # attach static degree to edges once (src-keyed co-partition)
    ewd_empty = pa.table({"src": pa.array([], type=pa.int64()),
                          "dst": pa.array([], type=pa.int64()),
                          "d": pa.array([], type=pa.int64())})

    def attach_deg(t: pa.Table) -> pa.Table:
        flag = t["flag"].to_numpy(zero_copy_only=False)
        src = t["src"].to_numpy(zero_copy_only=False)
        val = t["dst"].to_numpy(zero_copy_only=False)  # deg rides dst col
        isd = flag == 1
        dv, dd = src[isd], val[isd]
        o = np.argsort(dv)
        pos = np.searchsorted(dv[o], src[~isd])
        return pa.table({
            "src": pa.array(src[~isd]),
            "dst": pa.array(val[~isd]),
            "d": pa.array(dd[o][pos]),
        })

    nparts = fit_partitions(16)
    deg_rows = deg.map_batches(lambda t: pa.table({
        "src": pc.cast(t["src"], pa.int64()),
        "dst": pc.cast(t["d"], pa.int64()),
        "flag": pa.array(np.ones(t.num_rows, np.int64)),
    }), batch_format="pyarrow")
    edge_rows = edges.map_batches(
        lambda t: t.append_column("flag",
                                  pa.array(np.zeros(t.num_rows, np.int64))),
        batch_format="pyarrow")
    ewd = partition_by(edge_rows.union(deg_rows), ["src"], nparts,
                       attach_deg, ewd_empty).materialize()

    # dimension-sized node vector, broadcast per round
    v_sorted = np.sort(deg.to_pandas()["src"].to_numpy(dtype=np.int64))
    n_nodes = v_sorted.shape[0]
    base = np.int64((int(SCALE) * 15) // (100 * n_nodes))
    ranks = np.full(n_nodes, np.int64(int(SCALE) // n_nodes), np.int64)

    for _ in range(iters):
        ref = ray.put((v_sorted, ranks))

        def contribute(t: pa.Table) -> pa.Table:
            vs, rs = ray.get(ref)
            src = t["src"].to_numpy(zero_copy_only=False)
            dst = t["dst"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False)
            r_of_src = rs[np.searchsorted(vs, src)]
            c = (r_of_src * np.int64(85)) // (np.int64(100) * d)
            # in-batch combiner: one row per distinct dst per block
            ud, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(ud.shape[0], np.int64)
            np.add.at(acc, inv, c)     # exact int64 (bincount is float)
            return pa.table({"dst": pa.array(ud), "c": pa.array(acc)})

        summed = (ewd.map_batches(contribute, batch_format="pyarrow")
                  .groupby("dst").aggregate(Sum("c", alias_name="c"))
                  .to_pandas())
        # every node of this undirected graph receives >= 1 contribution
        pos = np.searchsorted(v_sorted,
                              summed["dst"].to_numpy(dtype=np.int64))
        new_r = np.full(n_nodes, base, np.int64)
        new_r[pos] = base + summed["c"].to_numpy(dtype=np.int64)
        ranks = new_r

    o = np.lexsort((v_sorted, -ranks))[:top_k]
    return pa.table({
        "node_id": pa.array(v_sorted[o]),
        "rank_ppt": pa.array(ranks[o]),
    })


def _pagerank_sql(iters: int = 3, top_k: int = 20) -> str:
    prev = "r0"
    its = ""
    for i in range(1, iters + 1):
        its += f""", r{i} AS (
  SELECT e.dst AS v,
         CAST((SELECT b FROM base)
              + sum(({prev}.r * 85) // (100 * deg.d)) AS BIGINT) AS r
  FROM edges e JOIN {prev} ON {prev}.v = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY 1
)"""
        prev = f"r{i}"
    return f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey * 2 AS a, l_suppkey * 2 + 1 AS b FROM lineitem
), edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b AS src, a AS dst FROM pairs
), deg AS (
  SELECT src, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY 1
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n FROM deg
), base AS (
  SELECT CAST((1000000000000 * 15) // (100 * n.n) AS BIGINT) AS b FROM n
), r0 AS (
  SELECT src AS v, CAST(1000000000000 // n.n AS BIGINT) AS r
  FROM deg CROSS JOIN n
){its}
SELECT v AS node_id, r AS rank_ppt FROM {prev}
QUALIFY row_number() OVER (ORDER BY r DESC, v) <= {top_k}
ORDER BY 2 DESC, 1
"""


PAGERANK_SQL = _pagerank_sql()
