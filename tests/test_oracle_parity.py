"""numpy-vs-DuckDB determinism parity: the driver's correctness gate
compares Ray pipelines against DuckDB SQL by exact value hash, which only
works because the float kernels used on both sides are bit-identical.
These tests pin that contract (referenced from __ray_entry__'s module
docstring)."""

import duckdb
import numpy as np
import pyarrow as pa

OFFSET = 1073741824
ALPHA = 0.01
GAMMA = (1.0 + ALPHA) / (1.0 - ALPHA)


def _numpy_keys(x: np.ndarray) -> np.ndarray:
    ln_gamma = np.log(GAMMA)
    out = np.zeros(x.shape[0], dtype=np.int64)
    pos, neg = x > 0, x < 0
    out[pos] = np.ceil(np.log(x[pos]) / ln_gamma).astype(np.int64) + OFFSET
    out[neg] = -(np.ceil(np.log(-x[neg]) / ln_gamma).astype(np.int64)
                 + OFFSET)
    return out


def test_bucket_keys_bit_identical_numpy_vs_duckdb():
    rng = np.random.default_rng(7)
    x = np.concatenate([
        rng.lognormal(3, 2, 20_000),
        -rng.lognormal(1, 1, 5_000),
        rng.uniform(1e-9, 1e9, 20_000),
        np.array([0.0, 1.0, -1.0, 1e-300, 1e300]),
    ])
    got = _numpy_keys(x)
    con = duckdb.connect()
    con.register("t", pa.table({"x": pa.array(x, type=pa.float64())}))
    g = f"(({1.0 + ALPHA})/({1.0 - ALPHA}))"
    want = con.execute(f"""
        SELECT CASE WHEN x > 0 THEN CAST(ceil(ln(x)/ln({g})) AS BIGINT) + {OFFSET}
                    WHEN x < 0 THEN -CAST(ceil(ln(-x)/ln({g})) AS BIGINT) - {OFFSET}
                    ELSE 0 END AS k FROM t""").df()["k"].to_numpy()
    assert (got == want).all()


def test_midpoint_estimate_bit_identical():
    keys = np.array([OFFSET + 5, OFFSET + 700, -(OFFSET + 3), 0],
                    dtype=np.int64)
    est = np.zeros(keys.shape[0])
    pos, neg = keys > 0, keys < 0
    est[pos] = 2 * GAMMA ** (keys[pos] - OFFSET) / (GAMMA + 1)
    est[neg] = -2 * GAMMA ** (-keys[neg] - OFFSET) / (GAMMA + 1)
    con = duckdb.connect()
    con.register("k", pa.table({"key": pa.array(keys)}))
    g = f"(({1.0 + ALPHA})/({1.0 - ALPHA}))"
    want = con.execute(f"""
        SELECT CASE WHEN key > 0 THEN 2*pow({g}, key - {OFFSET})/({g}+1)
                    WHEN key < 0 THEN -2*pow({g}, -key - {OFFSET})/({g}+1)
                    ELSE 0.0 END AS est FROM k""").df()["est"].to_numpy()
    assert (est == want).all()


def test_murmur64_replicates_duckdb_hash():
    from p2pddsketch_ray.hashing import murmur64
    keys = np.array([0, 1, -1, 42, 2**62, -(2**61)], dtype=np.int64)
    got = murmur64(keys)
    con = duckdb.connect()
    con.register("t", pa.table({"k": pa.array(keys)}))
    want = con.execute(
        "SELECT hash(k::BIGINT) AS h FROM t").df()["h"].to_numpy(
            dtype=np.uint64)
    assert (got == want).all()


def test_count_substring_replicates_duckdb_replace_arith():
    """The lang_id oracle counts trigrams in SQL as
    (strlen(t)-strlen(replace(t,tri,'')))//bytelen; pc.count_substring
    must agree (both are left-to-right non-overlapping) on every
    configured trigram, including multi-byte ones and self-overlapping
    patterns."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from p2pddsketch_ray.functions.text import _LANG_TRIGRAMS

    docs = ["the theatre of the thing", "aaaa", "", " de der dent ",
            "これは日本語のの文です", "на нане наты", "què que quelle",
            "ión alción ión"]
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ",".join(f"($${t}$$)" for t in docs) + ") v(text)")
    lower = pc.utf8_lower(pa.array(docs))
    tris = sorted({t for v in _LANG_TRIGRAMS.values() for t in v} | {"aa"})
    for tri in tris:
        esc = tri.replace("'", "''")
        blen = len(tri.encode("utf-8"))
        want = con.execute(
            f"SELECT (strlen(lower(text))-strlen(replace(lower(text),"
            f"'{esc}','')))//{blen} FROM d").df().iloc[:, 0].to_numpy()
        got = pc.count_substring(lower, tri).to_numpy(zero_copy_only=False)
        assert np.array_equal(got.astype(np.int64), want.astype(np.int64)), tri
