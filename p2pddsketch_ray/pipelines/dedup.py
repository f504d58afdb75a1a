"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, and embedding-cosine near-dup.

Dataflow shape (the scalable pattern for 100 TB):

    docs -> map_batches(signatures)              # vectorized, no shuffle
         -> flat band rows (band_id, band_hash, doc_id, signature)
         -> groupby(band_hash)                   # the ONE shuffle;
                                                 # band rows are tiny
         -> map_groups: candidate pairs within bucket
         -> estimate/verify similarity -> dedupe pair list

The signature travels with the band row, so pair verification needs no
join back to the documents table (signatures are ~0.5 KB vs multi-KB
texts).  Exact dedup is in pipelines.relational.dedup_exact_docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sketches.minhash import (band_hashes, estimate_jaccard, hamming64,
                                minhash_signatures, simhash64)


def minhash_band_rows(batch: pa.Table, *, id_col: str, text_col: str,
                      num_perm: int = 64, bands: int = 16,
                      k: int = 5) -> pa.Table:
    sig = minhash_signatures(batch[text_col], num_perm=num_perm, k=k)
    bh = band_hashes(sig, bands)
    n = sig.shape[0]
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "band_id": pa.array(np.repeat(np.arange(bands, dtype=np.int64), n)),
        "band_hash": pa.array(bh.T.reshape(-1).view(np.int64),
                              type=pa.int64()),
        "doc_id": pa.array(np.tile(ids, bands), type=pa.int64()),
        "signature": pa.array(list(np.tile(sig.view(np.int64), (bands, 1))),
                              type=pa.list_(pa.int64())),
    })


def _partition_pairs(group: pa.Table, threshold: float) -> pa.Table:
    """All candidate pairs inside one coarse partition: sort its band rows
    by bucket key, detect multi-row buckets vectorized (one Python call
    per PARTITION, not per bucket -- groupby().map_groups over millions of
    near-singleton LSH buckets would be per-group Python overhead)."""
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64()),
                      "est_jaccard": pa.array([], type=pa.float64())})
    if group.num_rows < 2:
        return empty
    band = group["band_id"].to_numpy(zero_copy_only=False)
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bh, band))
    band, bh, ids = band[order], bh[order], ids[order]
    # composite bucket key: runs of equal (band_id, band_hash)
    key_change = (np.diff(band) != 0) | (np.diff(bh) != 0)
    starts = np.concatenate([[0], np.nonzero(key_change)[0] + 1])
    ends = np.concatenate([starts[1:], [ids.shape[0]]])
    multi = ends - starts >= 2
    if not multi.any():
        return empty
    sigs = None
    out_a, out_b, out_j = [], [], []
    for s, e in zip(starts[multi], ends[multi]):
        if sigs is None:  # lazy: only decode signatures if needed
            sigs = np.asarray(group["signature"].to_pylist(),
                              dtype=np.int64)[order]
        ai, bi = np.triu_indices(e - s, k=1)
        est = estimate_jaccard(sigs[s + ai], sigs[s + bi])
        keep = est >= threshold
        out_a.append(ids[s + ai[keep]])
        out_b.append(ids[s + bi[keep]])
        out_j.append(est[keep])
    return pa.table({
        "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
        "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
        "est_jaccard": pa.array(np.round(np.concatenate(out_j), 6),
                                type=pa.float64()),
    })


def minhash_near_dups(ds: "ray.data.Dataset", id_col: str, text_col: str,
                      *, num_perm: int = 64, bands: int = 16, k: int = 5,
                      threshold: float = 0.7,
                      num_partitions: int = 64) -> "ray.data.Dataset":
    """Near-duplicate pairs via MinHash + LSH banding.

    Partitioning assumptions: (a) a duplicate pair collides in >= 1 band
    bucket (probability 1-(1-j^r)^b); (b) same bucket => same coarse
    partition (band_hash % num_partitions), so pair extraction is local to
    a partition.  Bucket skew only arises from genuinely identical
    content, which is exactly what belongs in one bucket; partitions are
    balanced because band_hash is a 64-bit hash.
    """
    from functools import partial
    band_rows = ds.map_batches(
        partial(minhash_band_rows, id_col=id_col, text_col=text_col,
                num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)

    def add_part(t: pa.Table) -> pa.Table:
        part = (t["band_hash"].to_numpy(zero_copy_only=False)
                % num_partitions).astype(np.int64)
        return t.append_column("part", pa.array(part, type=pa.int64()))

    pairs = (band_rows.map_batches(add_part, batch_format="pyarrow")
             .groupby("part")
             .map_groups(partial(_partition_pairs, threshold=threshold),
                         batch_format="pyarrow"))
    # a pair may collide in several bands: dedupe on (doc_a, doc_b)
    from ray.data.aggregate import Max
    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Max("est_jaccard", alias_name="est_jaccard")))


def simhash_near_dups(ds: "ray.data.Dataset", id_col: str, text_col: str,
                      *, k: int = 5, max_hamming: int = 3) -> "ray.data.Dataset":
    """Near-duplicate pairs via 64-bit SimHash, bucketed by 16-bit chunks
    (two docs within hamming distance 3 share >= 1 of the 4 chunks)."""

    def rows(batch: pa.Table) -> pa.Table:
        sh = simhash64(batch[text_col], k=k)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ids)
        chunks = np.stack([(sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)
                           for c in range(4)])
        return pa.table({
            "chunk_id": pa.array(np.repeat(np.arange(4, dtype=np.int64), n)),
            "chunk_val": pa.array(chunks.reshape(-1).astype(np.int64)),
            "doc_id": pa.array(np.tile(ids, 4), type=pa.int64()),
            "simhash": pa.array(np.tile(sh.view(np.int64), 4),
                                type=pa.int64()),
        })

    def partition_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        if group.num_rows < 2:
            return empty
        cid = group["chunk_id"].to_numpy(zero_copy_only=False)
        cval = group["chunk_val"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, cval, cid))
        cid, cval, ids, sh = cid[order], cval[order], ids[order], sh[order]
        change = (np.diff(cid) != 0) | (np.diff(cval) != 0)
        starts = np.concatenate([[0], np.nonzero(change)[0] + 1])
        ends = np.concatenate([starts[1:], [ids.shape[0]]])
        out_a, out_b, out_h = [], [], []
        for s, e in zip(starts[ends - starts >= 2],
                        ends[ends - starts >= 2]):
            ai, bi = np.triu_indices(e - s, k=1)
            dist = hamming64(sh[s + ai], sh[s + bi])
            keep = dist <= max_hamming
            out_a.append(ids[s + ai[keep]])
            out_b.append(ids[s + bi[keep]])
            out_h.append(dist[keep].astype(np.int64))
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
        })

    def add_part(t: pa.Table) -> pa.Table:
        part = ((t["chunk_id"].to_numpy(zero_copy_only=False) * 65536
                 + t["chunk_val"].to_numpy(zero_copy_only=False)) % 64)
        return t.append_column("part", pa.array(part.astype(np.int64)))

    band_rows = ds.map_batches(rows, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True)
    pairs = (band_rows.map_batches(add_part, batch_format="pyarrow")
             .groupby("part").map_groups(partition_pairs,
                                         batch_format="pyarrow"))
    from ray.data.aggregate import Min
    return (pairs.groupby(["doc_a", "doc_b"])
            .aggregate(Min("hamming", alias_name="hamming")))


def ngram_jaccard_verify(texts_a, texts_b, k: int = 5) -> np.ndarray:
    """Exact n-gram Jaccard for candidate pairs (the verification tier
    above signature estimates)."""
    from ..sketches.minhash import shingle_hashes
    out = np.zeros(len(texts_a), dtype=np.float64)
    ha, oa = shingle_hashes(pa.array(list(texts_a), type=pa.string()), k)
    hb, ob = shingle_hashes(pa.array(list(texts_b), type=pa.string()), k)
    for i in range(len(texts_a)):
        sa = set(ha[oa[i]:oa[i + 1]].tolist())
        sb = set(hb[ob[i]:ob[i + 1]].tolist())
        if not sa and not sb:
            out[i] = 1.0
        else:
            out[i] = len(sa & sb) / len(sa | sb)
    return out


def embedding_near_dup_pairs(sf_dir: str, threshold: float = 0.9) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (brute force against a
    broadcast normalized matrix -- the small-side pattern; the scale path
    buckets by IVF cluster first, see pipelines.knn)."""
    import pyarrow.parquet as pq
    emb = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy()
    mat = np.asarray(emb["embedding"].to_pylist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    unit = mat / norms[:, None]
    ref = ray.put((ids, unit))

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        all_ids, all_unit = ray.get(ref)
        bids = t["vec_id"].to_numpy(zero_copy_only=False)
        bmat = np.asarray(t["embedding"].to_pylist(), dtype=np.float64)
        bnorm = np.linalg.norm(bmat, axis=1)
        bnorm[bnorm == 0] = 1.0
        sims = (bmat / bnorm[:, None]) @ all_unit.T
        bi, ai = np.nonzero(sims >= threshold)
        keep = bids[bi] < all_ids[ai]          # a < b, no self-pairs
        return pa.table({
            "vec_a": pa.array(bids[bi[keep]].astype(np.int64)),
            "vec_b": pa.array(all_ids[ai[keep]].astype(np.int64)),
            "cos_sim": pa.array(np.round(sims[bi[keep], ai[keep]], 4),
                                type=pa.float64()),
        })

    out = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                        ("cos_sim", pa.float64())])
    if out.empty:  # an all-empty result loses column dtypes via pandas
        return schema.empty_table()
    return pa.Table.from_pandas(out, preserve_index=False, schema=schema)
