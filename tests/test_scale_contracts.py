"""Scale contracts: the dedup pipelines must never materialize an
O(corpus)/O(candidates) id set on the driver (VERDICT r2 findings 1-2).

The contract is asserted mechanically: ``Dataset.to_arrow_refs`` (the
only driver-collection entry point these pipelines ever used) is patched
to raise for the duration of the pipeline, so any regression that
re-introduces a driver-side collect fails loudly while the semi-join
dataflow passes.
"""

from __future__ import annotations

import contextlib

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@contextlib.contextmanager
def forbid_driver_collect():
    import ray.data

    def boom(self, *a, **k):
        raise AssertionError(
            "to_arrow_refs called: pipeline materialized a dataset on "
            "the driver")

    orig = ray.data.Dataset.to_arrow_refs
    ray.data.Dataset.to_arrow_refs = boom
    try:
        yield
    finally:
        ray.data.Dataset.to_arrow_refs = orig


def test_dedup_exact_keep_stays_in_cluster(ray_session):
    from p2pddsketch_ray.pipelines.relational import dedup_exact_keep
    with forbid_driver_collect():
        out = dedup_exact_keep(SF, hash_tier="md5").to_pandas()
    import duckdb
    want = duckdb.sql(f"""
        SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
        WHERE doc_id IN (SELECT min(doc_id)
                         FROM read_parquet('{SF}/documents.parquet')
                         GROUP BY md5(text))""").df()
    assert sorted(out["doc_id"]) == sorted(want["doc_id"])
    assert list(out.columns) == ["doc_id", "lang", "n_chars"]


def test_dedup_hash_tiers_agree(ray_session):
    """The fp64 fast tier must produce the same dedup groups as the md5
    oracle tier on collision-free data (the 100 TB default is fp64)."""
    from p2pddsketch_ray.pipelines.relational import (dedup_exact_docs,
                                                      dedup_exact_keep)
    md5 = dedup_exact_docs(SF, hash_tier="md5").to_pandas()
    fp = dedup_exact_docs(SF).to_pandas()  # default tier
    assert "text_fp64" in fp.columns and "text_md5" in md5.columns
    a = md5[["first_doc_id", "dup_count"]].sort_values(
        "first_doc_id").reset_index(drop=True)
    b = fp[["first_doc_id", "dup_count"]].sort_values(
        "first_doc_id").reset_index(drop=True)
    assert a.equals(b)
    keep_md5 = dedup_exact_keep(SF, hash_tier="md5").to_pandas()
    keep_fp = dedup_exact_keep(SF).to_pandas()
    assert sorted(keep_md5["doc_id"]) == sorted(keep_fp["doc_id"])


def test_minhash_candidates_stay_in_cluster(ray_session, tmp_path):
    import pyarrow.parquet as pq
    import ray.data
    from p2pddsketch_ray.pipelines.dedup import minhash_near_dups
    from p2pddsketch_ray.sources.webpages import generate_webpages_local
    pages = generate_webpages_local(2_000, seed=42)
    p = tmp_path / "pages.parquet"
    pq.write_table(pages.append_column(
        "doc_id", pa.array(np.arange(pages.num_rows), type=pa.int64())),
        str(p))
    ds = ray.data.read_parquet(str(p), columns=["doc_id", "text"],
                               override_num_blocks=8)
    with forbid_driver_collect():
        out = minhash_near_dups(ds, "doc_id", "text",
                                threshold=0.7).to_pandas()
    # planted near-dups at i%37==1 (see sources/webpages.py) must be found
    assert len(out) > 0
    assert (out["doc_a"] < out["doc_b"]).all()
