"""Deduplication pipelines: exact, MinHash+LSH, SimHash, n-gram Jaccard
verification, and embedding-cosine near-dup.

Dataflow shape (the scalable pattern for 100 TB):

    docs -> map_batches(signatures)             # vectorized, no shuffle
         -> 16-byte (band_hash, doc_id) rows    # signatures DON'T ride
         -> coarse-partition shuffle            # the one (tiny) shuffle
         -> vectorized bucket-run pair extraction per partition
         -> verify: second signature map over candidate docs only

Keeping the signatures out of the shuffle is the load-bearing choice:
shipping a 128-512B signature with each of bands x n_docs rows made the
exchange ~30x heavier than the 16-byte candidate rows.  Exact dedup is in
pipelines.relational.dedup_exact_docs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..sketches.minhash import (band_hashes, estimate_jaccard, hamming64,
                                minhash_signatures, simhash64)


def _fit_partitions(requested: int) -> int:
    """Cap the coarse partition count to the cluster CPU count -- more
    groups than workers only adds per-group overhead."""
    try:
        import ray as _ray
        cpus = int(_ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(2, min(requested, cpus))


def _partition_by(ds, cols: list[str], num_partitions: int,
                  fn, out_empty: pa.Table):
    """Co-locate rows by hash(cols) % num_partitions and apply ``fn`` to
    each whole partition: an explicit coarse repartition via a partition
    column + groupby().map_groups.

    This deliberately uses the default sort-based shuffle on the small
    integer partition key instead of Ray's keyed repartition: measured on
    Ray 2.49 local mode, HASH_SHUFFLE aggregator actors throttle the
    upstream map stage (~1.3 of 8 CPUs busy), while sorting a single int64
    column scales normally."""

    def add_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("_part", pa.array([], type=pa.int64()))
        acc = np.zeros(t.num_rows, dtype=np.int64)
        for c in cols:
            acc = acc * 1_000_003 + t[c].to_numpy(zero_copy_only=False)
        part = (acc % num_partitions + num_partitions) % num_partitions
        return t.append_column("_part", pa.array(part, type=pa.int64()))

    def apply(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_empty
        return fn(group.drop_columns(["_part"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_part").map_groups(apply, batch_format="pyarrow"))


def minhash_band_rows(batch: pa.Table, *, id_col: str, text_col: str,
                      num_perm: int = 64, bands: int = 16,
                      k: int = 5) -> pa.Table:
    """(band_hash, doc_id) rows -- the candidate-generation shuffle
    payload (16 bytes/row).

    Signatures deliberately do NOT ride the shuffle: candidate pairs are
    verified in a second, tiny signature pass over just the candidate
    docs.  band_id is omitted: band hashes are seeded per band, so a
    cross-band bucket collision is ~2^-64 and would only yield a duplicate
    candidate pair, which dedup removes."""
    sig = minhash_signatures(batch[text_col], num_perm=num_perm, k=k)
    bh = band_hashes(sig, bands)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "band_hash": pa.array(bh.T.reshape(-1).view(np.int64),
                              type=pa.int64()),
        "doc_id": pa.array(np.tile(ids, bands), type=pa.int64()),
    })


MAX_BUCKET_QUADRATIC = 512


def _candidate_pairs(group: pa.Table) -> pa.Table:
    """Candidate pairs inside one coarse partition: sort its (band_hash,
    doc_id) rows, detect multi-row buckets vectorized -- one Python call
    per PARTITION, not per bucket (groupby().map_groups over millions of
    near-singleton LSH buckets would be per-group Python overhead)."""
    empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                      "doc_b": pa.array([], type=pa.int64())})
    if group.num_rows < 2:
        return empty
    bh = group["band_hash"].to_numpy(zero_copy_only=False)
    ids = group["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, bh))
    bh, ids = bh[order], ids[order]
    key_change = np.diff(bh) != 0
    starts = np.concatenate([[0], np.nonzero(key_change)[0] + 1])
    ends = np.concatenate([starts[1:], [ids.shape[0]]])
    multi = ends - starts >= 2
    if not multi.any():
        return empty
    out_a, out_b = [], []
    for s, e in zip(starts[multi], ends[multi]):
        n_b = e - s
        if n_b <= MAX_BUCKET_QUADRATIC:
            ai, bi = np.triu_indices(n_b, k=1)
        else:
            # oversized bucket (pathological corpus-wide similarity or a
            # giant identical-content cluster): quadratic pair emission
            # would be O(n_b^2).  Compare each doc to its W successors in
            # doc_id order instead -- keeps identical clusters connected
            # (for a connected-components pass) at O(n_b * W).
            W = 16
            base_ = np.arange(n_b)
            ai = np.repeat(base_, W)
            bi = ai + np.tile(np.arange(1, W + 1), n_b)
            keep_w = bi < n_b
            ai, bi = ai[keep_w], bi[keep_w]
        out_a.append(ids[s + ai])
        out_b.append(ids[s + bi])
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    # dedupe within the partition (same pair can collide in many bands)
    pair_key = a * np.int64(2_000_003) + b
    _, first = np.unique(pair_key, return_index=True)
    return pa.table({
        "doc_a": pa.array(a[first], type=pa.int64()),
        "doc_b": pa.array(b[first], type=pa.int64()),
    })


def minhash_near_dups(ds: "ray.data.Dataset", id_col: str, text_col: str,
                      *, num_perm: int = 64, bands: int = 16, k: int = 9,
                      threshold: float = 0.7,
                      num_partitions: int = 64) -> pa.Table:
    """Near-duplicate pairs via MinHash + LSH banding, two-pass:

    1. Candidates: one map computes signatures and emits 16-byte
       (band_hash, doc_id) rows; one coarse-partition shuffle co-locates
       buckets; vectorized run detection emits candidate pairs.  The
       signature never rides the shuffle.
    2. Verify: a second map recomputes signatures for just the candidate
       docs (the candidate id set is broadcast via ray.put) and the pairs
       are Jaccard-estimated vectorized on the driver.

    Partitioning assumptions: a duplicate pair collides in >= 1 band
    bucket (probability 1-(1-j^r)^b); same bucket => same coarse
    partition.  The candidate set is assumed driver-sized (O(duplicate
    pairs), enforced upstream by the per-bucket chain cap); at larger
    candidate volumes pass 2 becomes a doc_id-keyed distributed join.

    Returns a pa.Table (doc_a, doc_b, est_jaccard), pairs with
    est >= threshold.
    """
    from functools import partial
    band_rows = ds.map_batches(
        partial(minhash_band_rows, id_col=id_col, text_col=text_col,
                num_perm=num_perm, bands=bands, k=k),
        batch_format="pyarrow", batch_size=4096, zero_copy_batch=True)

    num_partitions = _fit_partitions(num_partitions)
    _CAND_EMPTY = pa.table({"doc_a": pa.array([], type=pa.int64()),
                            "doc_b": pa.array([], type=pa.int64())})
    cand = _partition_by(band_rows, ["band_hash"], num_partitions,
                         _candidate_pairs, _CAND_EMPTY).to_arrow_refs()
    cand_tables = [t for t in map(ray.get, cand) if t.num_rows]
    empty_out = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "est_jaccard": pa.array([], type=pa.float64())})
    if not cand_tables:
        return empty_out
    cand_t = pa.concat_tables(cand_tables)
    a = cand_t["doc_a"].to_numpy(zero_copy_only=False)
    b = cand_t["doc_b"].to_numpy(zero_copy_only=False)
    pair_key = a * np.int64(2_000_003) + b
    _, first = np.unique(pair_key, return_index=True)
    a, b = a[first], b[first]

    # pass 2: signatures for candidate docs only
    need = frozenset(np.union1d(a, b).tolist())
    need_ref = ray.put(need)

    def sigs_for_candidates(t: pa.Table) -> pa.Table:
        wanted = ray.get(need_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        mask = np.fromiter((int(i) in wanted for i in ids), dtype=bool,
                           count=len(ids))
        if not mask.any():
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "sig": pa.array([], type=pa.large_binary())})
        sub = t.filter(pa.array(mask))
        sig = minhash_signatures(sub[text_col], num_perm=num_perm, k=k)
        return pa.table({
            "doc_id": pa.compute.cast(sub[id_col], pa.int64()),
            "sig": pa.array([s.tobytes() for s in sig],
                            type=pa.large_binary()),
        })

    sig_map: dict[int, np.ndarray] = {}
    sig_ds = ds.map_batches(sigs_for_candidates, batch_format="pyarrow",
                            batch_size=4096, zero_copy_batch=True)
    for ref in sig_ds.to_arrow_refs():
        t = ray.get(ref)
        for did, blob in zip(t["doc_id"].to_pylist(), t["sig"].to_pylist()):
            sig_map[did] = np.frombuffer(blob, dtype=np.uint64)
    sa = np.stack([sig_map[int(x)] for x in a]) if len(a) else np.zeros((0, num_perm))
    sb = np.stack([sig_map[int(x)] for x in b]) if len(a) else np.zeros((0, num_perm))
    est = estimate_jaccard(sa, sb)
    keep = est >= threshold
    return pa.table({
        "doc_a": pa.array(a[keep], type=pa.int64()),
        "doc_b": pa.array(b[keep], type=pa.int64()),
        "est_jaccard": pa.array(np.round(est[keep], 6), type=pa.float64()),
    })


def simhash_near_dups(ds: "ray.data.Dataset", id_col: str, text_col: str,
                      *, k: int = 9, max_hamming: int = 3) -> "ray.data.Dataset":
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
        """Windowed comparison within each (chunk_id, chunk_val) bucket
        (the sorted-fingerprint technique of Manku, Jain, Sarma, WWW 2007):
        rows sorted by full simhash, each compared to its next W
        neighbors -- O(bucket * W), never quadratic.  Near-identical
        fingerprints sort adjacently, so planted dups are found; recall on
        arbitrary hamming<=3 pairs inside giant buckets is best-effort."""
        empty = pa.table({"doc_a": pa.array([], type=pa.int64()),
                          "doc_b": pa.array([], type=pa.int64()),
                          "hamming": pa.array([], type=pa.int64())})
        if group.num_rows < 2:
            return empty
        cid = group["chunk_id"].to_numpy(zero_copy_only=False)
        cval = group["chunk_val"].to_numpy(zero_copy_only=False)
        ids = group["doc_id"].to_numpy(zero_copy_only=False)
        sh = group["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.lexsort((ids, sh, cval, cid))
        cid, cval, ids, sh = cid[order], cval[order], ids[order], sh[order]
        W = 32
        same_bucket = (np.diff(cid.astype(np.int64)) == 0) & \
            (np.diff(cval.astype(np.int64)) == 0)
        out_a, out_b, out_h = [], [], []
        n = ids.shape[0]
        in_bucket_run = np.concatenate([[0], np.cumsum(~same_bucket)])
        for d in range(1, W + 1):
            if d >= n:
                break
            ok = in_bucket_run[:-d] == in_bucket_run[d:]
            if not ok.any():
                break
            ai = np.nonzero(ok)[0]
            bi = ai + d
            dist = hamming64(sh[ai], sh[bi])
            keep = dist <= max_hamming
            if keep.any():
                a_ids, b_ids = ids[ai[keep]], ids[bi[keep]]
                lo = np.minimum(a_ids, b_ids)
                hi = np.maximum(a_ids, b_ids)
                out_a.append(lo)
                out_b.append(hi)
                out_h.append(dist[keep].astype(np.int64))
        if not out_a:
            return empty
        return pa.table({
            "doc_a": pa.array(np.concatenate(out_a), type=pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), type=pa.int64()),
            "hamming": pa.array(np.concatenate(out_h), type=pa.int64()),
        })

    band_rows = ds.map_batches(rows, batch_format="pyarrow",
                               batch_size=2048, zero_copy_batch=True)
    nparts = _fit_partitions(64)
    _EMPTY = pa.table({"doc_a": pa.array([], type=pa.int64()),
                       "doc_b": pa.array([], type=pa.int64()),
                       "hamming": pa.array([], type=pa.int64())})
    pairs = _partition_by(band_rows, ["chunk_id", "chunk_val"], nparts,
                          partition_pairs, _EMPTY)

    def dedupe_min(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        a = block["doc_a"].to_numpy(zero_copy_only=False)
        b = block["doc_b"].to_numpy(zero_copy_only=False)
        h = block["hamming"].to_numpy(zero_copy_only=False)
        order = np.lexsort((-h, b, a))
        a, b, h = a[order], b[order], h[order]
        change = (np.diff(a) != 0) | (np.diff(b) != 0)
        ends = np.concatenate([np.nonzero(change)[0] + 1, [a.shape[0]]]) - 1
        return pa.table({
            "doc_a": pa.array(a[ends], type=pa.int64()),
            "doc_b": pa.array(b[ends], type=pa.int64()),
            "hamming": pa.array(h[ends], type=pa.int64()),
        })

    return _partition_by(pairs, ["doc_a", "doc_b"], max(2, nparts // 4),
                         dedupe_min, _EMPTY)


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
