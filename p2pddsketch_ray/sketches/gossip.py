"""Gossip push-sum simulation -- COMPAT/VALIDATION harness.

Deterministic re-creation of the reference's distributedCommunication loop
(main.cpp:475-658): per round, each peer exchanges its sketch with <=
``fan_out`` random neighbors via the symmetric averaging merge
(``DDSketch.merge_averaged`` == DDS_MergeCollapse, ddsketch.cc:559-647 +
``DDS_replaceSketch``, ddsketch.cc:1004-1020) and averages scalar push-sum
weights (main.cpp:576-589; weight 1 at peer 0, 0 elsewhere,
main.cpp:506-513).  After convergence ``finalize_gossip`` (K25) recovers
the global sum at every peer and ``1/weight[0]`` estimates the peer count
(main.cpp:640).

The production engine replaces all of this with one exact shuffle merge
(SURVEY.md section 3.3); this module exists so the reference binary's
converged-average numbers can be reproduced and validated side by side.
The topology here is the complete graph (the reference's k-regular
type 4 with k = n-1, graph.cpp:109-135); random graph generation itself
is topology simulation the engine deliberately does not carry over.
"""

from __future__ import annotations

import random
from typing import Sequence

import numpy as np

from ..config import DEFAULT_ALPHA, DEFAULT_BIN_LIMIT, DEFAULT_OFFSET
from .ddsketch import DDSketch


def gossip_simulate(partitions: Sequence[np.ndarray], *,
                    alpha: float = DEFAULT_ALPHA,
                    bin_limit: int = DEFAULT_BIN_LIMIT,
                    offset: int = DEFAULT_OFFSET,
                    rounds: int = 10, fan_out: int = 1,
                    seed: int = 42) -> tuple[list[DDSketch], list[float]]:
    """Run ``rounds`` of symmetric averaging gossip over one sketch per
    partition.  Returns (finalized sketches, final weights): every
    finalized sketch approximates the exact global sketch (the longer it
    runs, the closer -- push-sum converges geometrically)."""
    peers = len(partitions)
    sketches = []
    for part in partitions:
        s = DDSketch(alpha, bin_limit, offset, "uniform")
        s.add_batch(np.asarray(part, dtype=np.float64))
        sketches.append(s)
    weights = [1.0 if i == 0 else 0.0 for i in range(peers)]

    rng = random.Random(seed)
    others = [[j for j in range(peers) if j != i] for i in range(peers)]
    for _ in range(rounds):
        for i in range(peers):
            # neighbor subsample (main.cpp:556-564: shuffle, truncate)
            neigh = others[i][:]
            rng.shuffle(neigh)
            for j in neigh[:fan_out]:
                sketches[i].merge_averaged(sketches[j])
                sketches[j] = sketches[i].copy()     # DDS_replaceSketch
                w = (weights[i] + weights[j]) / 2.0  # main.cpp:587-589
                weights[i] = weights[j] = w

    finalized = [s.finalize_gossip(w) for s, w in zip(sketches, weights)]
    return finalized, weights
