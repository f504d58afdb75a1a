"""The reference text extractor (FIXTURES.md F1a).

One deterministic pure function, imported by BOTH the fixture generator
(to populate the ``text`` column) and the pipeline (to re-extract from
``html``), so the per-url byte-identity invariant
``extract_text(row.html) == row.text`` is testable end-to-end
(BASELINE.json: "extracted text must be byte-identical per url versus the
reference extractor").

Spec: the text content of the <title> element and of each <p> element, in
document order, joined with "\\n".  No entity decoding, no whitespace
normalization (the generator never emits entities or nested tags).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa

_BLOCK_RE = re.compile(rb"<(title|p)>(.*?)</\1>", re.DOTALL)


def extract_text(html: bytes) -> str:
    return b"\n".join(m[1] for m in _BLOCK_RE.findall(html)).decode("utf-8")


def extract_text_column(html_col) -> pa.Array:
    """Column-wise extraction for map_batches (binary -> string)."""
    if isinstance(html_col, pa.ChunkedArray):
        html_col = html_col.combine_chunks()
    return pa.array([extract_text(v) for v in html_col.to_pylist()],
                    type=pa.string())


def verify_extraction(batch: pa.Table) -> pa.Table:
    """map_batches body: re-extract from html and assert byte-identity
    against the stored text column (the driver's per-row invariant)."""
    got = extract_text_column(batch["html"])
    stored = batch["text"]
    if isinstance(stored, pa.ChunkedArray):
        stored = stored.combine_chunks()
    eq = np.asarray(
        pa.compute.equal(got, stored).to_pandas(), dtype=bool)
    if not eq.all():
        bad = batch["url"][int(np.argmin(eq))].as_py()
        raise AssertionError(f"extraction mismatch at url={bad}")
    return batch
