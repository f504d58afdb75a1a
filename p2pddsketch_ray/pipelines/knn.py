"""Similarity search over embedding columns.

* Brute-force cosine top-k (pipelines.relational.knn_cosine_topk): the
  correctness baseline -- one float64 matmul per batch against a broadcast
  query matrix.
* IVF (inverted-file) index here: the scale path.  Deterministic k-means
  (seeded init, fixed Lloyd iterations) fits centroids on a sample;
  vectors are bucketed by nearest centroid (one shuffle-free map_batches
  pass with the centroid matrix broadcast); a query probes only the
  n_probe nearest clusters.  At 10^12 rows the cluster id becomes the
  partition key of the written index, so a query touches
  n_probe/n_clusters of the data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..hashing import splitmix64


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def kmeans_fit(vectors: np.ndarray, n_clusters: int, n_iter: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means (unit vectors, cosine metric)."""
    unit = _unit_rows(np.asarray(vectors, dtype=np.float64))
    n = unit.shape[0]
    n_clusters = min(n_clusters, n)
    # seeded distinct init: rank rows by a per-index hash, take the first k
    order = np.argsort(splitmix64(np.arange(n, dtype=np.int64), seed=seed),
                       kind="mergesort")
    centroids = unit[order[:n_clusters]].copy()
    for _ in range(n_iter):
        assign = np.argmax(unit @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = unit[assign == c]
            if members.shape[0]:
                v = members.sum(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    centroids[c] = v / nv
    return centroids


class IVFIndex:
    """Driver-held centroids + a Ray Dataset of (vec_id, cluster,
    embedding) rows.  ``search`` probes n_probe clusters."""

    def __init__(self, centroids: np.ndarray, assigned: "ray.data.Dataset"):
        self.centroids = centroids
        self.assigned = assigned

    @staticmethod
    def build(ds: "ray.data.Dataset", n_clusters: int = 16,
              sample_size: int = 10_000, seed: int = 42) -> "IVFIndex":
        sample = ds.limit(sample_size).to_pandas()
        vectors = np.asarray(sample["embedding"].to_list(), dtype=np.float64)
        centroids = kmeans_fit(vectors, n_clusters, seed=seed)
        cref = ray.put(centroids)

        def assign(t: pa.Table) -> pa.Table:
            from ..functions.vectors import list_to_matrix
            cents = ray.get(cref)
            mat = _unit_rows(list_to_matrix(t["embedding"]))
            cluster = np.argmax(mat @ cents.T, axis=1).astype(np.int64)
            return t.append_column("cluster", pa.array(cluster))

        return IVFIndex(centroids,
                        ds.map_batches(assign, batch_format="pyarrow"))

    def search(self, query: np.ndarray, k: int = 10,
               n_probe: int = 4) -> pa.Table:
        q = np.asarray(query, dtype=np.float64)
        q = q / (np.linalg.norm(q) or 1.0)
        probes = np.argsort(-(self.centroids @ q))[:n_probe].tolist()
        qref = ray.put(q)

        def score(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            from ..functions.vectors import list_to_matrix
            t = t.filter(pc.is_in(t["cluster"],
                                  value_set=pa.array(probes, type=pa.int64())))
            if t.num_rows == 0:
                return pa.table({"vec_id": pa.array([], type=pa.int64()),
                                 "cos_sim": pa.array([], type=pa.float64())})
            qv = ray.get(qref)
            mat = _unit_rows(list_to_matrix(t["embedding"]))
            sims = mat @ qv
            return pa.table({
                "vec_id": pa.compute.cast(t["vec_id"], pa.int64()),
                "cos_sim": pa.array(np.round(sims, 6), type=pa.float64()),
            })

        return (self.assigned
                .map_batches(score, batch_format="pyarrow")
                .sort(["cos_sim", "vec_id"], descending=[True, False])
                .limit(k))
