"""Hypothesis property tests for the pure kernels (no Ray).

These pin the contracts the distributed layers rely on: bit-identical
merge-order independence for DDSketch, set-semantics pair dedup for the
LSH layer, t-digest quantile sanity, and the numpy/Arrow vs DuckDB text
tokenization parity that the driver's value-hash gate depends on.
"""

import duckdb
import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from p2pddsketch_ray.sketches.ddsketch import DDSketch


@st.composite
def value_arrays(draw):
    n = draw(st.integers(1, 300))
    scale = draw(st.sampled_from([1e-6, 1.0, 1e6]))
    vals = draw(st.lists(
        st.floats(min_value=-1e9, max_value=1e9,
                  allow_nan=False, allow_infinity=False),
        min_size=n, max_size=n))
    return np.asarray(vals) * scale


@given(vals=value_arrays(), n_parts=st.integers(1, 8),
       seed=st.integers(0, 2**31))
@settings(max_examples=60, deadline=None)
def test_ddsketch_merge_order_bit_identity(vals, n_parts, seed):
    """Any partitioning and any merge order yields the bit-identical
    serialized sketch (the property that makes the shuffle merge safe)."""
    direct = DDSketch(alpha=0.01, bin_limit=128)
    direct.add_batch(vals)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(vals))
    parts = np.array_split(vals[perm], n_parts)
    sketches = []
    for p in parts:
        s = DDSketch(alpha=0.01, bin_limit=128)
        s.add_batch(p)
        sketches.append(s)
    order = rng.permutation(len(sketches))
    acc = sketches[order[0]]
    for i in order[1:]:
        acc.merge(sketches[i])
    assert acc.to_bytes() == direct.to_bytes()


@given(vals=value_arrays())
@settings(max_examples=40, deadline=None)
def test_ddsketch_add_then_delete_is_empty(vals):
    s = DDSketch(alpha=0.02, bin_limit=4096)
    s.add_batch(vals)
    s.delete_batch(vals)
    assert s.n == 0 and s.sum_bins() == 0


@given(pairs=st.lists(st.tuples(st.integers(-2**62, 2**62),
                                st.integers(-2**62, 2**62)),
                      min_size=0, max_size=200))
@settings(max_examples=80, deadline=None)
def test_unique_pairs_set_semantics(pairs):
    """_unique_pairs == set() semantics even for int64 ids near the
    range edges (the a*K+b key it replaced silently collided there)."""
    from p2pddsketch_ray.pipelines.dedup import _unique_pairs
    a = np.asarray([p[0] for p in pairs], dtype=np.int64)
    b = np.asarray([p[1] for p in pairs], dtype=np.int64)
    ua, ub = _unique_pairs(a, b)
    assert set(zip(ua.tolist(), ub.tolist())) == set(pairs)
    assert len(ua) == len(set(pairs))


@given(vals=st.lists(st.floats(-1e6, 1e6, allow_nan=False),
                     min_size=2, max_size=5000),
       qs=st.lists(st.floats(0, 1), min_size=2, max_size=6))
@settings(max_examples=40, deadline=None)
def test_tdigest_quantiles_monotone_and_bounded(vals, qs):
    from p2pddsketch_ray.sketches.tdigest import TDigest
    t = TDigest(compression=64)
    t.add_batch(np.asarray(vals))
    lo, hi = min(vals), max(vals)
    ests = [t.quantile(q) for q in sorted(qs)]
    for e in ests:
        assert lo - 1e-9 <= e <= hi + 1e-9
    assert all(e2 >= e1 - 1e-9 for e1, e2 in zip(ests, ests[1:]))


_TEXT_ALPHABET = st.sampled_from(
    list("abc XYZ 019 _-.,;:!?\t\n'\"()") + ["é", "ü", "中", "の"])


@given(texts=st.lists(st.text(_TEXT_ALPHABET, max_size=60),
                      min_size=1, max_size=8))
@settings(max_examples=50, deadline=None)
def test_text_kernels_match_duckdb_on_adversarial_text(texts):
    """token/punct/stopword counts must equal the oracle SQL definitions
    for arbitrary text incl. underscores and non-ASCII -- the exact
    contract the driver's hash gate checks."""
    from p2pddsketch_ray.functions.text import (STOPWORDS, punct_count,
                                                stopword_count, token_count)
    arr = pa.array(texts, type=pa.string())
    con = duckdb.connect()
    con.register("t", pa.table({"s": arr}))
    stop = ",".join(f"'{w}'" for w in STOPWORDS)
    df = con.execute(f"""
        SELECT length(regexp_extract_all(s, '[A-Za-z0-9]+')) AS tok,
               length(regexp_extract_all(s, '[.,;:!?]')) AS pun,
               length(list_filter(regexp_extract_all(lower(s), '[a-z0-9]+'),
                                  t -> t IN ({stop}))) AS stp
        FROM t""").df()
    assert token_count(arr).to_pylist() == df["tok"].tolist()
    assert punct_count(arr).to_pylist() == df["pun"].tolist()
    assert stopword_count(arr).to_pylist() == df["stp"].tolist()
