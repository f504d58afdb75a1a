"""Persisted inverted index (pipelines/search.py)."""

import glob

import numpy as np
import pyarrow.parquet as pq
import pytest


def test_inverted_index_lookup_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.search import (
        INVERTED_INDEX_SQL, inverted_index_lookup)
    sf = "/root/testdata/sf0.001"
    got = inverted_index_lookup(sf).to_pandas().reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    want = con.execute(INVERTED_INDEX_SQL).df()
    assert got.equals(want.reset_index(drop=True))


def test_inverted_index_probes_strict_subset(ray_session, tmp_path):
    """The lookup's probed bucket set is smaller than the index, and
    reading ONLY those buckets loses no postings for the query terms."""
    from p2pddsketch_ray.pipelines.search import (
        QUERY_TERMS, _term_buckets, build_inverted_index)
    sf = "/root/testdata/sf0.001"
    root = str(tmp_path / "idx")
    build_inverted_index(sf, root, n_buckets=8)
    written = {int(p.rsplit("=", 1)[1])
               for p in glob.glob(f"{root}/bucket=*")}
    need = set(np.unique(_term_buckets(QUERY_TERMS, 8)).tolist())
    assert need < written  # strict subset: foreign buckets exist unread
    # every posting for a query term lives in its term's bucket
    for b in written - need:
        t = pq.read_table(f"{root}/bucket={b}", columns=["term"])
        assert not set(QUERY_TERMS) & set(t["term"].to_pylist())


def test_inverted_index_postings_are_exact_tf(ray_session, tmp_path):
    """Postings hold exact per-(doc, term) counts; a doc repeating a
    token k times yields one row with tf=k in the term's bucket."""
    import pyarrow as pa
    from p2pddsketch_ray.pipelines.search import build_inverted_index
    t = pa.table({
        "doc_id": pa.array([7, 9], type=pa.int64()),
        "text": pa.array(["zap zap zap bop", "bop zap"]),
    })
    src = tmp_path / "src"
    src.mkdir()
    pq.write_table(t, str(src / "documents.parquet"))
    root = str(tmp_path / "idx")
    build_inverted_index(str(src), root, n_buckets=4)
    allp = pq.read_table(root).to_pandas()
    rows = {(r.term, r.doc_id): r.tf for r in allp.itertuples()}
    assert rows == {("zap", 7): 3, ("bop", 7): 1,
                    ("bop", 9): 1, ("zap", 9): 1}
