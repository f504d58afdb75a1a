"""The flagship 100-TB-shaped pipeline over Common-Crawl-style webpages
(BASELINE.json north star): per-document metric quantiles, globally and
per lang.

    read_parquet(webpages, columns pruned)
      -> map_batches: project text_len / html_size (zero-copy Arrow,
         html dropped immediately after -- the binary column dominates
         bytes and must not travel further, SURVEY.md section 7.3)
      -> map_batches(partial DDSketches per (block, lang))
      -> groupby(lang).map_groups(merge + quantile)  /  driver fold

Optionally re-extracts text from html and enforces the per-url
byte-identity invariant inline.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import HEADLINE_QUANTILES, PRACTICAL_ALPHA
from ..stages.extract import extract_text_column
from .quantiles import dds_quantiles_global, dds_quantiles_grouped


def project_metrics(batch: pa.Table, verify_extraction: bool = False) -> pa.Table:
    """webpage rows -> (lang, text_len, html_size); drops html/text."""
    text = batch["text"]
    if verify_extraction:
        got = extract_text_column(batch["html"])
        stored = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
        if not pc.all(pc.equal(got, stored)).as_py():
            import numpy as np
            eq = np.asarray(pc.equal(got, stored).to_pandas(), dtype=bool)
            bad = batch["url"][int(np.argmin(eq))].as_py()
            raise AssertionError(f"extraction mismatch at url={bad}")
    return pa.table({
        "lang": batch["lang"],
        "text_len": pc.cast(pc.utf8_length(text), pa.int64()),
        "html_size": pc.cast(pc.binary_length(batch["html"]), pa.int64()),
    })


def webpage_metrics_ds(paths, *, verify: bool = False,
                       batch_size: int | None = 8192) -> "ray.data.Dataset":
    ds = ray.data.read_parquet(
        paths, columns=["url", "lang", "html", "text"] if verify
        else ["lang", "html", "text"])
    from functools import partial
    return ds.map_batches(partial(project_metrics, verify_extraction=verify),
                          batch_format="pyarrow", batch_size=batch_size,
                          zero_copy_batch=True)


def fused_sketch_build(paths, quantiles: Sequence[float] = HEADLINE_QUANTILES,
                       *, alpha: float = PRACTICAL_ALPHA,
                       bin_limit: int = 2048, verify: bool = True,
                       num_perm: int = 64, bands: int = 16, k: int = 9,
                       batch_size: int = 512,
                       signature_tier: str = "classic") -> dict:
    """The flagship sketch-build workload as ONE dataset execution -- the
    scaling-bench pipeline (BASELINE.md): per batch of webpages, one map

      1. re-extracts text from html and enforces the per-url
         byte-identity invariant (input_hint contract),
      2. computes the text-analysis metrics (tokens/punct/stopwords/
         quality micro-units),
      3. builds per-(batch, lang) DDSketch partials over text_len,
      4. computes MinHash signatures + LSH band hashes (the heaviest
         per-doc sketch kernel; results are folded to a checksum -- the
         candidate shuffle is measured elsewhere and is O(blocks) light),
      5. accumulates its own cpu-time (time.thread_time) so the caller
         can report work conservation across parallelism levels,

    then a single groupby(lang) merges sketch rows and sums the metric
    counters (one tiny row per (block, lang) rides the only shuffle), and
    the driver folds the <= n_lang merged rows into the global answer.
    Fusing the phases removes two driver planning/barrier rounds vs
    running them as separate pipelines -- fixed costs that otherwise
    dilute the measured scaling ratio.

    Returns {"global": pa.Table, "per_lang": pa.Table, "docs": int,
    "cpu_sec": float, "band_checksum": int}.
    """
    import time as _time

    from ..sketches.ddsketch import DDSketch
    from ..sketches.minhash import (band_hashes, minhash_signatures,
                                    oph_signatures)
    from ..functions.text import (punct_count, quality_score_from_counts,
                                  stopword_count, token_count)
    from ..stages.sketch_build import (SKETCH_FIELDS, merge_sketch_table,
                                       sketch_rows_to_table)

    if signature_tier not in ("classic", "oph"):
        raise ValueError(f"unknown signature_tier {signature_tier!r}; "
                         "expected 'classic' or 'oph'")
    qs = tuple(quantiles)

    def fused(batch: pa.Table) -> pa.Table:
        t0 = _time.thread_time_ns()
        m = project_metrics(batch, verify_extraction=verify)
        texts = batch["text"].combine_chunks() if isinstance(
            batch["text"], pa.ChunkedArray) else batch["text"]
        toks = token_count(texts)
        punct = punct_count(texts)
        stops = stopword_count(texts)
        q_micro = pc.cast(pc.floor(pc.add(pc.multiply(
            quality_score_from_counts(
                toks.to_numpy(zero_copy_only=False),
                punct.to_numpy(zero_copy_only=False),
                stops.to_numpy(zero_copy_only=False)),
            pa.scalar(1e6)), pa.scalar(0.5))), pa.int64())
        # signature_tier="oph": ONE-pass densified OPH registers in
        # place of the num_perm permutation passes (same band contract)
        sig = (oph_signatures(texts, n_bins=num_perm, k=k)
               if signature_tier == "oph"
               else minhash_signatures(texts, num_perm=num_perm, k=k))
        bh = band_hashes(sig, bands)
        checksum = int(bh.sum(dtype=np.uint64) & np.uint64(0x3FFFFFFF))

        # per-lang partial sketch + metric sums (vectorized group split)
        lang = m["lang"].to_numpy(zero_copy_only=False)
        tl = m["text_len"].to_numpy(zero_copy_only=False).astype(np.float64)
        stat = np.stack([c.to_numpy(zero_copy_only=False)
                         for c in (toks, punct, stops, q_micro)], axis=1)
        uniq, inv = np.unique(lang, return_inverse=True)
        order = np.argsort(inv, kind="stable")
        bounds = np.searchsorted(inv[order], np.arange(len(uniq) + 1))
        rows, sums, counts = [], [], []
        for g in range(len(uniq)):
            sel = order[bounds[g]:bounds[g + 1]]
            s = DDSketch(alpha, bin_limit, mode="uniform")
            s.add_batch(tl[sel])
            rows.append(s.to_row())
            sums.append(stat[sel].sum(axis=0))
            counts.append(sel.shape[0])
        sums = np.asarray(sums, dtype=np.int64)
        cpu_us = np.zeros(len(uniq), dtype=np.int64)
        cpu_us[0] = (_time.thread_time_ns() - t0) // 1000
        out = sketch_rows_to_table(rows, {"lang": uniq.tolist()})
        for name, col in (("n_docs", counts), ("tokens", sums[:, 0]),
                          ("punct", sums[:, 1]), ("stops", sums[:, 2]),
                          ("q_micro", sums[:, 3]),
                          ("band_checksum",
                           [checksum] + [0] * (len(uniq) - 1)),
                          ("cpu_us", cpu_us)):
            out = out.append_column(name, pa.array(np.asarray(col),
                                                   type=pa.int64()))
        return out

    _EXTRA = ["n_docs", "tokens", "punct", "stops", "q_micro",
              "band_checksum", "cpu_us"]

    def merge_lang(group: pa.Table) -> pa.Table:
        sketch = merge_sketch_table(group.select(
            [name for name, _ in SKETCH_FIELDS]))
        out = sketch_rows_to_table([sketch.to_row()],
                                   {"lang": [group["lang"][0].as_py()]})
        for name in _EXTRA:
            out = out.append_column(name, pa.array(
                [int(pc.sum(group[name]).as_py())], type=pa.int64()))
        return out

    ds = ray.data.read_parquet(
        paths, columns=["url", "lang", "html", "text"] if verify
        else ["lang", "html", "text"])
    per_lang_rows = (ds.map_batches(fused, batch_format="pyarrow",
                                    batch_size=batch_size,
                                    zero_copy_batch=True)
                     .groupby("lang")
                     .map_groups(merge_lang, batch_format="pyarrow"))
    import ray as _ray
    # materialize BEFORE to_arrow_refs: on an unmaterialized dataset the
    # latter fetches the schema with a second (limit=1) execution of the
    # whole plan -- doubling the measured cost of the scaling child
    tables = [t for t in map(_ray.get,
                             per_lang_rows.materialize().to_arrow_refs())
              if t.num_rows]
    merged = pa.concat_tables(tables)

    # driver fold over <= n_lang rows: global sketch + totals
    glob_sketch = merge_sketch_table(merged.select(
        [name for name, _ in SKETCH_FIELDS]))
    keys = [glob_sketch.quantile_key(q) for q in qs]
    glob = pa.table({
        "q": pa.array(list(qs), type=pa.float64()),
        "bucket_key": pa.array(keys, type=pa.int64()),
        "est": pa.array([glob_sketch._bucket_estimate(kk) for kk in keys],
                        type=pa.float64()),
    })
    lang_keys = [(merged["lang"][i].as_py(), q)
                 for i in range(merged.num_rows) for q in qs]
    from ..stages.sketch_build import sketches_from_table
    per_sketches = sketches_from_table(merged)
    per_lang = pa.table({
        "lang": pa.array([lk for lk, _ in lang_keys], type=pa.string()),
        "q": pa.array([q for _, q in lang_keys], type=pa.float64()),
        "est": pa.array([s._bucket_estimate(s.quantile_key(q))
                         for s in per_sketches for q in qs],
                        type=pa.float64()),
    }).sort_by([("lang", "ascending"), ("q", "ascending")])
    return {
        "global": glob,
        "per_lang": per_lang,
        "docs": int(pc.sum(merged["n_docs"]).as_py()),
        "cpu_sec": float(pc.sum(merged["cpu_us"]).as_py()) / 1e6,
        "band_checksum": int(pc.sum(merged["band_checksum"]).as_py()),
        "tokens": int(pc.sum(merged["tokens"]).as_py()),
    }


def webpage_quantiles(paths, metric: str = "text_len",
                      quantiles: Sequence[float] = HEADLINE_QUANTILES,
                      by_lang: bool = True, *, alpha: float = PRACTICAL_ALPHA,
                      bin_limit: int = 2048, verify: bool = False):
    """Returns (global pa.Table, per-lang pa.Table or None).

    ONE distributed build pass: per-(block, lang) partial sketches are
    built once and materialized (kilobyte rows); the per-lang answers come
    from a ``groupby(lang).map_groups`` shuffle-merge over those rows and
    the global answer from a distributed tree reduce of the same rows
    (identical to an ungrouped build because the exact-sum merge is
    associative over any partitioning of the multiset).  The driver only
    receives the final answer rows, never the partial set."""
    import ray
    from ..stages.sketch_build import (quantile_finalizer,
                                       tree_merge_sketches)
    from .quantiles import build_partials_ds

    metrics = webpage_metrics_ds(paths, verify=verify)
    partials = build_partials_ds(metrics, metric,
                                 ["lang"] if by_lang else None,
                                 alpha=alpha, bin_limit=bin_limit)
    if by_lang:
        partials = partials.materialize()  # built once, consumed twice

    glob_sketch = tree_merge_sketches(partials)
    keys = [glob_sketch.quantile_key(q) for q in quantiles]
    glob = pa.table({
        "q": pa.array(list(quantiles), type=pa.float64()),
        "bucket_key": pa.array(keys, type=pa.int64()),
        "est": pa.array([glob_sketch._bucket_estimate(k) for k in keys],
                        type=pa.float64()),
    })

    grouped = None
    if by_lang:
        grouped_ds = partials.groupby("lang").map_groups(
            quantile_finalizer(["lang"], quantiles), batch_format="pyarrow")
        tables = [t for t in map(ray.get,
                                 grouped_ds.materialize().to_arrow_refs())
                  if t.num_rows]
        grouped = pa.concat_tables(tables).sort_by(
            [("lang", "ascending"), ("q", "ascending")])
    return glob, grouped
