"""Merge-order property tests -- the engine's analog of the reference's
gossip-convergence checks (main.cpp:596-640: "every peer ends with the same
global sketch"), strengthened to exact bit-identity as BASELINE.json
requires: merges are associative/commutative and the serialized sketch is
bit-identical for every merge order."""

import math
import random

import numpy as np
import pytest

from p2pddsketch_ray.config import DEFAULT_ALPHA, PRACTICAL_ALPHA
from p2pddsketch_ray.sketches.ddsketch import DDSketch

from .test_ddsketch import exact_quantile, rel_err


def build_partials(data: np.ndarray, k: int, alpha: float, bin_limit: int,
                   jitter_seed: int | None = None) -> list[DDSketch]:
    """Split data into k contiguous slices (the reference's partitioner,
    main.cpp:691-748, incl. optional +/-10% jittered boundaries) and build
    one partial sketch per slice."""
    n = len(data)
    bounds = [round(i * n / k) for i in range(k + 1)]
    if jitter_seed is not None:
        rng = random.Random(jitter_seed)
        span = n // k
        for i in range(1, k):
            bounds[i] = min(max(bounds[i] + rng.randint(-span // 10, span // 10),
                                bounds[i - 1]), n)
    out = []
    for i in range(k):
        s = DDSketch(alpha=alpha, bin_limit=bin_limit)
        s.add_batch(data[bounds[i]:bounds[i + 1]])
        out.append(s)
    return out


def merge_in_order(partials: list[DDSketch], order: list[int]) -> DDSketch:
    acc = partials[order[0]].copy()
    for i in order[1:]:
        acc.merge(partials[i])
    return acc


def merge_tree(partials: list[DDSketch]) -> DDSketch:
    """Balanced binary tree merge (the shape Ray's partial+final combine
    produces)."""
    layer = [p.copy() for p in partials]
    while len(layer) > 1:
        nxt = []
        for i in range(0, len(layer) - 1, 2):
            nxt.append(layer[i].merge(layer[i + 1]))
        if len(layer) % 2:
            nxt.append(layer[-1])
        layer = nxt
    return layer[0]


@pytest.mark.parametrize("k", [2, 5, 16])
@pytest.mark.parametrize("presort", [False, True])
def test_merge_order_bit_identity(k, presort):
    rng = np.random.default_rng(23)
    data = rng.lognormal(0, 4, 20000)
    if presort:
        # the reference sorts before partitioning (main.cpp:285): each
        # partial holds a disjoint value range -- max disjoint bins, the
        # hard case for collapse-on-merge (ddsketch.cc:625-638)
        data = np.sort(data)
    partials = build_partials(data, k, PRACTICAL_ALPHA, bin_limit=96,
                              jitter_seed=42)
    sequential = merge_in_order(partials, list(range(k)))
    ref_bytes = sequential.to_bytes()
    pyrng = random.Random(99)
    for _ in range(4):
        order = list(range(k))
        pyrng.shuffle(order)
        assert merge_in_order(partials, order).to_bytes() == ref_bytes
    assert merge_tree(partials).to_bytes() == ref_bytes


def test_merged_equals_sequential_when_no_collapse():
    # With a roomy bin_limit no collapse triggers: merging partials must be
    # bit-identical to one sketch built over the whole stream.
    rng = np.random.default_rng(29)
    data = rng.normal(1, 3, 30000)
    whole = DDSketch(alpha=PRACTICAL_ALPHA)
    whole.add_batch(data)
    partials = build_partials(data, 7, PRACTICAL_ALPHA,
                              bin_limit=whole.bin_limit, jitter_seed=1)
    merged = merge_tree(partials)
    assert merged.to_bytes() == whole.to_bytes()


def test_merge_collapse_on_merge_boundary():
    # Disjoint-range partials where neither input collapses but the union
    # exceeds bin_limit: the merged sketch must collapse (the while loops at
    # ddsketch.cc:625-638) and still answer within the new alpha.
    rng = np.random.default_rng(31)
    data = np.sort(rng.lognormal(0, 3, 40000))
    partials = build_partials(data, 16, PRACTICAL_ALPHA, bin_limit=400)
    assert all(p.generation == 0 for p in partials)
    merged = merge_tree(partials)
    assert merged.size <= 400
    assert merged.generation > 0
    assert merged.n == 40000
    for q in (0.1, 0.5, 0.9, 0.99):
        real = exact_quantile(data, q)
        assert rel_err(merged.quantile(q), real) <= merged.alpha + 1e-12


def test_merge_mixed_generations():
    rng = np.random.default_rng(37)
    a = DDSketch(alpha=PRACTICAL_ALPHA, bin_limit=64)
    a.add_batch(rng.lognormal(0, 6, 10000))  # will have collapsed
    b = DDSketch(alpha=PRACTICAL_ALPHA, bin_limit=64)
    b.add_batch(rng.normal(5, 1, 1000))      # narrow, gen 0
    assert a.generation > 0 and b.generation == 0
    b_copy_bytes = b.to_bytes()
    ab = a.copy().merge(b)
    ba = b.copy().merge(a)
    assert ab.to_bytes() == ba.to_bytes()
    assert b.to_bytes() == b_copy_bytes  # merge must not mutate its argument
    assert ab.n == a.n + b.n


def test_merge_parameter_mismatch_raises():
    a = DDSketch(alpha=PRACTICAL_ALPHA)
    b = DDSketch(alpha=DEFAULT_ALPHA)
    with pytest.raises(ValueError):
        a.merge(b)
    c = DDSketch(alpha=PRACTICAL_ALPHA, mode="last")
    with pytest.raises(ValueError):
        a.merge(c)


@pytest.mark.parametrize("mode", ["last", "first"])
def test_fold_mode_merge_counts(mode):
    rng = np.random.default_rng(41)
    data = rng.lognormal(0, 3, 20000)
    n = len(data)
    partials = []
    for i in range(5):
        s = DDSketch(alpha=PRACTICAL_ALPHA, bin_limit=80, mode=mode)
        s.add_batch(data[i * n // 5:(i + 1) * n // 5])
        partials.append(s)
    merged = merge_tree(partials)
    assert merged.size <= 80
    assert merged.sum_bins() == pytest.approx(merged.n)
    assert merged.n == 20000
