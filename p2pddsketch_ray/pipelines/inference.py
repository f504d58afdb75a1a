"""Batched model inference as Ray Data actor-pool stages.

The training-data-pipeline shape the reference never had: a trained
model's parameters are broadcast (``ray.put`` once), each actor of a
``map_batches(Cls, concurrency=N)`` pool fetches them ONCE in
``__init__`` (never per batch), and inference is a vectorized kernel
over the whole Arrow batch.  The demo model is a deterministic integer
linear classifier over SQL-replicable text features, so the driver's
DuckDB oracle can replay the exact scores; a real sentiment/quality
model drops into the same stage by replacing ``_features``/``predict``
(the plumbing -- broadcast, pooling, batching, combiner -- is what this
module exercises).

Determinism: features and weights are integers, the logit is an exact
int64 dot product, and class thresholds compare integers -- no float
crosses an engine boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum

# "trained" model: integer weights over (bias, n_chars, n_toks, n_a, n_e)
MODEL_WEIGHTS = {"bias": 2000, "w_chars": -3, "w_toks": 40,
                 "w_a": 7, "w_e": -5}
CLS_LO, CLS_HI = 3000, 3700  # integer logit thresholds
CLASS_NAMES = np.array(["low", "mid", "high"])


def _letter_count(txt: pa.ChunkedArray, ch: str,
                  total: np.ndarray) -> np.ndarray:
    """Occurrences of ``ch`` per string via length arithmetic (the same
    length(x) - length(replace(x, ch, '')) the SQL oracle uses)."""
    stripped = pc.utf8_length(pc.replace_substring(txt, ch, ""))
    return total - stripped.to_numpy(zero_copy_only=False)


class LinearDocScorer:
    """Actor-pool inference stage: broadcast weights -> per-batch logits.

    ``weights_ref`` is a ``ray.put`` handle; each pool actor resolves it
    once here (model load happens per ACTOR, not per batch -- swap in a
    real model deserialization and the economics stay right).  The
    callable emits a per-(lang, class) partial rollup so the downstream
    shuffle moves O(langs x classes) rows per block, never documents.
    """

    def __init__(self, weights_ref):
        w = ray.get(weights_ref) if not isinstance(weights_ref, dict) \
            else weights_ref
        self.w = {k: np.int64(v) for k, v in w.items()}

    def predict(self, t: pa.Table) -> np.ndarray:
        """Exact int64 logits for every row of the batch."""
        txt = t["text"]
        total = pc.utf8_length(txt).to_numpy(zero_copy_only=False)
        nch = pc.cast(t["n_chars"], pa.int64()).to_numpy(
            zero_copy_only=False)
        ntok = pc.list_value_length(
            pc.split_pattern(txt, pattern=" ")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        n_a = _letter_count(txt, "a", total)
        n_e = _letter_count(txt, "e", total)
        w = self.w
        return (w["bias"] + w["w_chars"] * nch + w["w_toks"] * ntok
                + w["w_a"] * n_a + w["w_e"] * n_e)

    def __call__(self, t: pa.Table) -> pa.Table:
        logit = self.predict(t)
        cls = (logit >= CLS_LO).astype(np.int64) + (logit >= CLS_HI)
        lang = np.asarray(t["lang"].to_pylist(), dtype=np.str_)
        ul, linv = np.unique(lang, return_inverse=True)
        comp = linv * np.int64(3) + cls
        ukey, inv = np.unique(comp, return_inverse=True)
        n = np.bincount(inv).astype(np.int64)
        s = np.zeros(ukey.shape[0], np.int64)
        np.add.at(s, inv, logit)
        mx = np.full(ukey.shape[0], np.iinfo(np.int64).min)
        np.maximum.at(mx, inv, logit)
        return pa.table({
            "lang": pa.array(ul[ukey // 3].tolist(), type=pa.string()),
            "cls": pa.array(CLASS_NAMES[ukey % 3].tolist(),
                            type=pa.string()),
            "n": pa.array(n), "s": pa.array(s), "mx": pa.array(mx),
        })


def model_score_stats(sf_dir: str) -> "ray.data.Dataset":
    """Batched model inference over documents: broadcast-weight linear
    classifier scored by an actor pool, rolled up per (lang, class).

    Scale shape: the model ships to the object store ONCE (``ray.put``)
    and each of the pool's actors fetches it once in ``__init__`` -- at
    a real model size (GBs) this is the only layout that works; the
    per-batch work is one vectorized feature pass + integer dot product;
    the in-batch combiner bounds the shuffle at O(langs x 3) rows per
    block regardless of corpus size."""
    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["lang", "text", "n_chars"])
    weights_ref = ray.put(dict(MODEL_WEIGHTS))
    agg = (ds.map_batches(LinearDocScorer, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=2,
                          fn_constructor_kwargs={
                              "weights_ref": weights_ref})
           .groupby(["lang", "cls"])
           .aggregate(Sum("n", alias_name="n_docs"),
                      Sum("s", alias_name="sum_logit"),
                      Max("mx", alias_name="max_logit")))

    def finalize(t: pa.Table) -> pa.Table:
        return pa.table({
            "lang": t["lang"], "cls": t["cls"],
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "sum_logit": pc.cast(t["sum_logit"], pa.int64()),
            "max_logit": pc.cast(t["max_logit"], pa.int64()),
        })

    return agg.map_batches(finalize,
                           batch_format="pyarrow").sort(["lang", "cls"])


MODEL_SCORE_SQL = f"""
WITH feat AS (
  SELECT lang,
         {MODEL_WEIGHTS['bias']}
         + {MODEL_WEIGHTS['w_chars']} * n_chars
         + {MODEL_WEIGHTS['w_toks']} * len(string_split(text, ' '))
         + {MODEL_WEIGHTS['w_a']} *
             (length(text) - length(replace(text, 'a', '')))
         + {MODEL_WEIGHTS['w_e']} *
             (length(text) - length(replace(text, 'e', '')))
         AS logit
  FROM documents
)
SELECT lang,
       CASE WHEN logit >= {CLS_HI} THEN 'high'
            WHEN logit >= {CLS_LO} THEN 'mid' ELSE 'low' END AS cls,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(logit) AS BIGINT) AS sum_logit,
       CAST(max(logit) AS BIGINT) AS max_logit
FROM feat GROUP BY 1, 2 ORDER BY 1, 2
"""
