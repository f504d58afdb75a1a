"""Text-analysis kernels and hash parity with DuckDB (the oracle engine)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from p2pddsketch_ray.functions import text as T
from p2pddsketch_ray.hashing import md5_hex, md5_uint64, murmur64, splitmix64

SAMPLES = [
    "The quick brown fox, and the lazy dog!",
    "a to in is it that for...",
    "",
    "no stopwords here xyzzy",
    "Der schnelle braune Fuchs und der faule Hund",
    "123 456 abc",
]


def test_murmur64_matches_duckdb_hash():
    con = duckdb.connect()
    vals = np.array([0, 1, -1, 42, 2**62, -2**62, 123456789], dtype=np.int64)
    ours = murmur64(vals)
    theirs = [con.execute(f"select hash({int(v)}::BIGINT)").fetchone()[0]
              for v in vals]
    assert ours.tolist() == theirs


def test_md5_matches_duckdb():
    con = duckdb.connect()
    for s in SAMPLES:
        want_hex = con.execute("select md5(?)", [s]).fetchone()[0]
        assert md5_hex([s])[0] == want_hex
        assert md5_uint64([s])[0] == int(want_hex[:16], 16)


def test_splitmix64_deterministic_and_seed_sensitive():
    x = np.arange(1000, dtype=np.int64)
    a, b = splitmix64(x, 1), splitmix64(x, 2)
    assert (a == splitmix64(x, 1)).all()
    assert (a != b).mean() > 0.99


def test_token_counts_match_duckdb():
    con = duckdb.connect()
    arr = pa.array(SAMPLES)
    ours = T.token_count(arr).to_pylist()
    theirs = [con.execute(
        r"select length(regexp_extract_all(?, '[A-Za-z0-9]+'))", [s]
    ).fetchone()[0] for s in SAMPLES]
    assert ours == theirs


def test_stopword_count_matches_duckdb_token_filter():
    con = duckdb.connect()
    arr = pa.array(SAMPLES)
    ours = T.stopword_count(arr).to_pylist()
    stoplist = ",".join(f"'{w}'" for w in T.STOPWORDS)
    theirs = [con.execute(
        rf"select length(list_filter(regexp_extract_all(lower(?), '[a-z0-9]+'),"
        rf" t -> t in ({stoplist})))", [s]).fetchone()[0] for s in SAMPLES]
    assert ours == theirs


def test_quality_score_range_and_determinism():
    arr = pa.array(SAMPLES)
    s1 = T.quality_score(arr).to_pylist()
    s2 = T.quality_score(arr).to_pylist()
    assert s1 == s2
    assert all(0.0 <= v <= 1.0 for v in s1)


def test_lang_id_heuristic():
    # NOTE: the driver testdata documents' `lang` column is a label over
    # English-ish synthetic word salad, so it cannot validate language ID;
    # use genuine per-language sentences instead.
    samples = {
        "en": "The cat sat on the mat and looked at the dog in the garden.",
        "de": "Der Hund und die Katze spielen im Garten mit einem Ball und schauen sich um.",
        "fr": "Le chat est dans le jardin et il regarde le chien qui mange quelque chose.",
        "es": "El gato está en el jardín y mira que el perro come la comida de la casa.",
        "nl": "De kat zit in de tuin en kijkt naar een hond van de buren die een bal heeft.",
    }
    pred = T.lang_id(pa.array(list(samples.values()))).to_pylist()
    assert pred == list(samples.keys())


def test_fingerprint_stable_and_collision_free_on_docs():
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                      columns=["text"])
    arr = t["text"].combine_chunks()
    f1 = T.fingerprint64(arr).to_pylist()
    f2 = T.fingerprint64(arr).to_pylist()
    assert f1 == f2
    uniq_texts = len(set(arr.to_pylist()))
    assert len(set(f1)) == uniq_texts


def test_redact_props_stats_matches_duckdb(ray_session):
    duckdb = pytest.importorskip("duckdb")
    from p2pddsketch_ray.pipelines.relational import (REDACT_PROPS_SQL,
                                                      redact_props_stats)
    sf = "/root/testdata/sf0.001"
    got = (redact_props_stats(sf).to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf}/events.parquet')")
    want = con.execute(REDACT_PROPS_SQL).df()
    assert got.equals(want.reset_index(drop=True))
    # redaction accounting: each match shrinks its run to a single '#'
    # so len_after == len_before - matched_chars + n_matches and every
    # group actually matched something on this fixture
    assert (got["n_matches"] > 0).all()
    assert (got["len_after"] < got["len_before"]).all()
