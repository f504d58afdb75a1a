"""CLI entry point -- the engine twin of the reference's option surface
(parse, main.cpp:797-938): choose an input (parquet dataset OR a seeded
synthetic distribution, mutually exclusive like the reference's
conflicting_options, main.cpp:783-795), sketch parameters (--alpha --off
--bl, main.cpp:804-821), a collapse strategy, and a quantile list (--q);
run the distributed build+merge and print the accuracy table the
reference's testQuantile prints (main.cpp:1041-1082).

Gossip-topology options (--peer --f --graph --ct --cr --re) have no
equivalent: the shuffle replaces the topology (SURVEY.md section 2.3).

    python -m p2pddsketch_ray.cli --normal --ni 100000 --q 0.5 0.99
    python -m p2pddsketch_ray.cli --dataset /data/pages/*.parquet \
        --column text_len --group-by lang --out result.json
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np
import pyarrow as pa

from .config import (DEFAULT_ALPHA, DEFAULT_BIN_LIMIT, DEFAULT_OFFSET,
                     DEFAULT_QUANTILES)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="p2pddsketch_ray",
        description="Ray-Data-native DDSketch quantile pipeline")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--dataset",
                     help="input path(s) to sketch: parquet, or the "
                          "reference's newline-delimited-doubles text "
                          "format for *.txt (main.cpp:967-1000)")
    src.add_argument("--normal", action="store_true",
                     help="seeded normal(1,3) synthetic stream")
    src.add_argument("--exponential", action="store_true",
                     help="seeded exponential(1) synthetic stream")
    src.add_argument("--uniform", action="store_true",
                     help="seeded uniform(0,1000) synthetic stream")
    p.add_argument("--ni", type=int, default=508,
                   help="synthetic stream length (reference default 508)")
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--column", default="value", help="column to sketch")
    p.add_argument("--group-by", default=None, help="grouped quantiles key")
    p.add_argument("--alpha", type=float, default=DEFAULT_ALPHA)
    p.add_argument("--off", type=int, default=DEFAULT_OFFSET,
                   dest="offset", help="bucket key offset")
    p.add_argument("--bl", type=int, default=DEFAULT_BIN_LIMIT,
                   dest="bin_limit", help="bin limit before collapse")
    p.add_argument("--mode", choices=["uniform", "last", "first"],
                   default="uniform", help="collapse strategy")
    p.add_argument("--q", type=float, nargs="+",
                   default=list(DEFAULT_QUANTILES))
    p.add_argument("--out", default=None, help="write JSON result here")
    p.add_argument("--accuracy", action="store_true",
                   help="also compute the exact-oracle accuracy table for "
                        "a --dataset input (collects the column to the "
                        "driver -- test-scale only; synthetic streams "
                        "always print it, like the reference)")
    p.add_argument("--num-cpus", type=int, default=None)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, ignore_reinit_error=True,
                 logging_level="ERROR")
    from . import configure_for_cluster
    configure_for_cluster(args.num_cpus)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    import ray.data

    from .pipelines.quantiles import dds_quantiles_global, dds_quantiles_grouped

    sketch_kwargs = dict(alpha=args.alpha, bin_limit=args.bin_limit,
                         offset=args.offset, mode=args.mode)

    oracle_values = None
    if args.dataset:
        if args.dataset.endswith(".txt"):
            from .sources.scalars import read_scalar_text
            ds = read_scalar_text(args.dataset, column=args.column)
        elif args.dataset.endswith(".csv"):
            from .sources.scalars import read_scalar_csv
            ds = read_scalar_csv(args.dataset, column=args.column)
        elif args.dataset.endswith((".jsonl", ".json")):
            from .sources.scalars import read_scalar_jsonl
            ds = read_scalar_jsonl(args.dataset, column=args.column)
        else:
            ds = ray.data.read_parquet(
                args.dataset, columns=[c for c in (args.column, args.group_by)
                                       if c])
        if args.accuracy and not args.group_by:
            vals = pa.concat_tables(
                [ray.get(r) for r in
                 ds.select_columns([args.column])
                 .materialize().to_arrow_refs()])
            oracle_values = vals[args.column].to_numpy(zero_copy_only=False)
    else:
        from .sources.scalars import generate_scalars
        dist = ("normal" if args.normal else
                "exponential" if args.exponential else "uniform")
        data = generate_scalars(dist, args.ni, args.seed)
        oracle_values = data
        import pandas as pd
        ds = ray.data.from_pandas(pd.DataFrame({args.column: data}))

    result: dict = {"params": {**sketch_kwargs, "q": args.q}}
    if args.group_by:
        out = dds_quantiles_grouped(ds, args.column, [args.group_by],
                                    args.q, **sketch_kwargs).to_pandas()
        result["grouped"] = out.to_dict(orient="records")
        print(out.to_string(index=False))
    else:
        out = dds_quantiles_global(ds, args.column, args.q, **sketch_kwargs)
        rows = []
        for q, key, est in zip(out["q"].to_pylist(),
                               out["bucket_key"].to_pylist(),
                               out["est"].to_pylist()):
            row = {"q": q, "bucket_key": key, "est": est}
            if oracle_values is not None:
                # the reference's accuracy table (main.cpp:1062-1076):
                # exact order statistic + relative error per q
                idx = int(np.floor(1 + q * (len(oracle_values) - 1))) - 1
                real = float(np.partition(oracle_values, idx)[idx])
                row["real"] = real
                row["rel_error"] = (abs(est - real) / abs(real)
                                    if real else abs(est))
            rows.append(row)
        result["quantiles"] = rows
        hdr = "q          estimate          real          rel_error"
        print(hdr)
        for r in rows:
            print(f'{r["q"]:<10g} {r["est"]:<17.6f} '
                  f'{r.get("real", float("nan")):<13.6f} '
                  f'{r.get("rel_error", float("nan")):.3e}')

    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
