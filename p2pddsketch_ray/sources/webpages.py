"""Deterministic Common-Crawl-style webpages fixture (FIXTURES.md F1).

Schema per BASELINE.json input_hint:
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Everything is a pure function of (seed, row index): generation is
reproducible row-by-row whether run inline (tests) or as a Ray pipeline
``range(n) -> map_batches(make_rows)`` (bench scale), mirroring the
reference's seeded generators (generateDataset, main.cpp:1002-1039) --
the reference draws scalars from seeded normal/exponential/uniform; we
draw documents whose *lengths* are log-normal(mu=7, sigma=1.2) so the
sketched metrics (text_len, html_size) have the heavy tail q0.95/q0.99
testing needs.

Planted near-duplicates: every row with ``i % 37 == 1`` is a copy of row
i-1's text with one word appended -- deterministic ground truth for the
MinHash/SimHash near-dup pipelines.  Exact duplicates: rows with
``i % 53 == 3`` reuse row i-3's text verbatim (different url).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import splitmix64
from ..stages.extract import extract_text

LANGS = ("en", "de", "fr", "es", "it", "pt", "nl", "pl", "ru", "ja")
# Zipf-ish weights: en ~ 60% (FIXTURES.md: force groupby skew)
_LANG_WEIGHTS = np.array([0.60, 0.10, 0.08, 0.07, 0.045, 0.035, 0.025,
                          0.02, 0.015, 0.01])
_LANG_CUM = np.cumsum(_LANG_WEIGHTS / _LANG_WEIGHTS.sum())

_VOCAB = np.array([f"w{i:03d}" for i in range(500)]
                  + "the and of a to in is it that for data web page "
                    "crawl text query index rank score model".split(),
                  dtype=object)

_EPOCH_2025 = 1735689600_000_000  # 2025-01-01T00:00:00Z in microseconds

SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])


def _doc_words(i: int, n_words: int, seed: int) -> np.ndarray:
    h = splitmix64(np.arange(n_words, dtype=np.int64) + i * 1_000_003,
                   seed=seed)
    return _VOCAB[(h % np.uint64(len(_VOCAB))).astype(np.int64)]


def _render_html(title: str, paragraphs: list[str]) -> bytes:
    body = "".join(f"<p>{p}</p>" for p in paragraphs)
    return (f"<html><head><title>{title}</title></head>"
            f"<body>{body}</body></html>").encode("utf-8")


def _n_words_for(i: int, seed: int) -> int:
    idx = np.asarray([i], dtype=np.int64)
    u = splitmix64(idx, seed=seed + 1).astype(np.float64)[0] / 2.0**64
    z = splitmix64(idx, seed=seed + 3).astype(np.float64)[0] / 2.0**64
    normal = np.sqrt(-2.0 * np.log(max(u, 1e-12))) * np.cos(2.0 * np.pi * z)
    return max(3, int(np.exp(7.0 + 1.2 * normal) / 5.5))


def _is_base(i: int) -> bool:
    return not (i % 53 == 3 or i % 37 == 1)


def _base_text(i: int, seed: int) -> str:
    return " ".join(_doc_words(i, _n_words_for(i, seed), seed).tolist())


def _body_text(i: int, seed: int) -> str:
    """Deterministic per-index body text with planted duplicates -- pure
    function of (i, seed): identical whether generated inline, in any Ray
    block partitioning, or by a retried task."""
    if i % 53 == 3 and i >= 3 and _is_base(i - 3):
        return _base_text(i - 3, seed)               # planted exact dup
    if i % 37 == 1 and i >= 1 and _is_base(i - 1):
        return _base_text(i - 1, seed) + " extra"    # planted near-dup
    return _base_text(i, seed)


def make_rows(indices: np.ndarray, seed: int = 42) -> pa.Table:
    """Build webpage rows for the given global row indices (deterministic
    per index -- a retried Ray task reproduces identical rows)."""
    indices = np.asarray(indices, dtype=np.int64)
    n = indices.shape[0]
    u_lang = splitmix64(indices, seed=seed + 2).astype(np.float64) / 2.0**64
    lang_idx = np.searchsorted(_LANG_CUM, u_lang, side="right")
    lang_idx = np.minimum(lang_idx, len(LANGS) - 1)

    urls, tss, htmls, texts, langs = [], [], [], [], []
    for j in range(n):
        i = int(indices[j])
        body_text = _body_text(i, seed)
        title = f"Page {i}"
        # split body into ~60-word paragraphs
        ws = body_text.split(" ")
        paragraphs = [" ".join(ws[k:k + 60]) for k in range(0, len(ws), 60)]
        html = _render_html(title, paragraphs)
        urls.append(f"https://site{i % 1000}.example/page/{i}")
        tss.append(_EPOCH_2025 + i * 1_000_000)
        htmls.append(html)
        texts.append(extract_text(html))  # byte-identity by construction
        langs.append(LANGS[lang_idx[j]])

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def generate_webpages_local(n_rows: int, seed: int = 42) -> pa.Table:
    """Small-scale inline generation (tests)."""
    return make_rows(np.arange(n_rows), seed)


def generate_webpages(out_dir: str, n_rows: int, seed: int = 42,
                      num_blocks: int = 32) -> str:
    """Bench-scale generation as a Ray pipeline: range -> map_batches ->
    partitioned parquet (one file per block: resumable layout)."""
    import ray.data

    def build(batch) -> pa.Table:
        return make_rows(np.asarray(batch["id"], dtype=np.int64), seed)

    (ray.data.range(n_rows, override_num_blocks=num_blocks)
     .map_batches(build, batch_format="numpy")
     .write_parquet(out_dir))
    return out_dir
