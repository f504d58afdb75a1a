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
        tables = [t for t in map(ray.get, grouped_ds.to_arrow_refs())
                  if t.num_rows]
        grouped = pa.concat_tables(tables).sort_by(
            [("lang", "ascending"), ("q", "ascending")])
    return glob, grouped
