"""Sketch-state sinks/sources -- the engine twin of DDS_PrintCSV
(ddsketch.cc:913-954: dump bins as ``key, count, max, min, length``) plus
a parquet round-trip used by checkpointing.

A serialized sketch is ordinary data: one row per bin for CSV inspection,
or one row per sketch (list columns) for parquet state tables
(stages.sketch_build.SKETCH_FIELDS).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

from ..sketches.ddsketch import DDSketch
from .sketch_build import merge_sketch_table, sketch_rows_to_table


def sketch_bins_table(sketch: DDSketch) -> pa.Table:
    """One row per occupied bin, ascending key order (the reference CSV's
    information content: key, count, plus the collapsed-range markers and
    bin count as table metadata columns)."""
    row = sketch.to_row()
    n = len(row["keys"])
    return pa.table({
        "key": pa.array(row["keys"], type=pa.int64()),
        "count": pa.array(row["counts"], type=pa.float64()),
        "kmax": pa.array([row["kmax"]] * n, type=pa.int64()),
        "kmin": pa.array([row["kmin"]] * n, type=pa.int64()),
        "length": pa.array([n] * n, type=pa.int64()),
    })


def dump_sketch_csv(sketch: DDSketch, path: str) -> str:
    """CSV dump of the bins (DDS_PrintCSV parity artifact)."""
    import pyarrow.csv as pacsv
    pacsv.write_csv(sketch_bins_table(sketch), path)
    return path


def write_sketch_parquet(sketch: DDSketch, path: str) -> str:
    """One-sketch state table (the checkpoint format)."""
    pq.write_table(sketch_rows_to_table([sketch.to_row()]), path)
    return path


def read_sketch_parquet(path: str) -> DDSketch:
    return merge_sketch_table(pq.read_table(path))
