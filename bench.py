"""Benchmark driver.

Plain run: executes the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) in one Ray session with
num_cpus=$RAY_GRAFT_CPUS (default 32) and prints ONE JSON line:

    {"metric": ..., "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "throughput_rows_per_sec": ..., "headline_rows": ...}

--scaling: runs the same suite in TWO fresh processes (num_cpus=8 and 32)
on the same input -- the sandbox proxy for the north rule's two-cluster-
size criterion (BASELINE.md) -- and prints one JSON line with both
throughputs and the scaling efficiency (T8/T32)/(32/8).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _sf_label(sf_dir: str) -> float | str:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return base


def run_suite(sf_dir: str) -> tuple[dict[str, float], int]:
    """Headline pipelines; returns (per-query seconds, headline row count)."""
    import ray.data
    from p2pddsketch_ray.pipelines import relational as R
    from p2pddsketch_ray.pipelines.quantiles import (dds_quantiles_global,
                                                     dds_quantiles_grouped)

    lineitem_path = f"{sf_dir}/lineitem.parquet"
    import pyarrow.parquet as pq
    headline_rows = pq.read_metadata(lineitem_path).num_rows

    # warm the OS page cache AND the Ray worker pool once, untimed
    # (count() alone uses the metadata fast path and starts no workers)
    ray.data.range(256, override_num_blocks=128).map_batches(
        lambda b: b).materialize()
    ray.data.read_parquet(lineitem_path).map_batches(
        lambda b: b.slice(0, 1), batch_format="pyarrow").materialize()

    timings: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        res = fn()
        if hasattr(res, "to_pandas"):
            res.to_pandas()  # force full execution of lazy Datasets
        timings[name] = round(time.perf_counter() - t0, 4)

    # headline: DDSketch build+merge+quantile over the biggest table
    timed("dds_price_global", lambda: dds_quantiles_global(
        ray.data.read_parquet(lineitem_path, columns=["l_extendedprice"]),
        "l_extendedprice", (0.5, 0.95, 0.99), alpha=0.01, bin_limit=2048))
    timed("dds_price_by_flag", lambda: dds_quantiles_grouped(
        ray.data.read_parquet(lineitem_path,
                              columns=["l_returnflag", "l_extendedprice"]),
        "l_extendedprice", ["l_returnflag"], (0.5, 0.95, 0.99),
        alpha=0.01, bin_limit=2048))
    timed("dds_event_value", lambda: dds_quantiles_global(
        ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["value"]),
        "value", (0.5, 0.95, 0.99), alpha=0.01, bin_limit=2048))
    timed("pricing_summary", lambda: R.pricing_summary(sf_dir))
    timed("events_hourly_window", lambda: R.events_hourly_window(sf_dir))
    timed("dedup_exact_docs", lambda: R.dedup_exact_docs(sf_dir))
    timed("token_stats_by_lang", lambda: R.token_stats_by_lang(sf_dir))
    timed("knn_cosine_topk", lambda: R.knn_cosine_topk(sf_dir))

    return timings, headline_rows


def run_once() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    timings, headline_rows = run_suite(SF_DIR)
    total = round(sum(timings.values()), 4)
    result = {
        "metric": "headline pipeline suite wall-clock (DDSketch build/merge/"
                  "quantile + grouped agg + window + dedup + text + knn)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_label(SF_DIR),
        "num_cpus": NUM_CPUS,
        "headline_rows": headline_rows,
        "throughput_rows_per_sec": round(
            headline_rows / max(timings["dds_price_global"], 1e-9), 1),
    }
    import ray
    ray.shutdown()
    return result


def run_scaling() -> dict:
    def child(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                             env=env, capture_output=True, text=True,
                             check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo_cpus, hi_cpus = 8, 32
    lo, hi = child(lo_cpus), child(hi_cpus)
    thr_lo = lo["throughput_rows_per_sec"]
    thr_hi = hi["throughput_rows_per_sec"]
    eff = (lo["value"] / hi["value"]) / (hi_cpus / lo_cpus)
    return {
        "metric": "scaling efficiency (suite) from 8 to 32 CPUs, fresh "
                  "processes, same input",
        "sf": lo["sf"],
        "sec_8": lo["value"], "sec_32": hi["value"],
        "dds_rows_per_sec_8": thr_lo, "dds_rows_per_sec_32": thr_hi,
        "suite_scaling_efficiency": round(eff, 3),
        "dds_scaling_efficiency": round((thr_hi / thr_lo) / (hi_cpus / lo_cpus), 3),
        "queries_8": lo["queries"], "queries_32": hi["queries"],
    }


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_once()))
