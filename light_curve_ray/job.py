"""`ray job submit` entry point — the north rule's deployment surface.

On a real cluster:

    ray job submit --working-dir . -- \\
        python -m light_curve_ray.job \\
            --input s3://bucket/pages/ --input-kind pages \\
            --out /mnt/shared/rollup --tiers 1h,1d,30d \\
            --checkpoint /mnt/shared/ckpt --salt-hot-domains

In this sandbox the same module runs standalone (Ray Data auto-inits a
local cluster; an explicit pre-initialised session is respected — the
module NEVER calls ray.init itself unless Ray is uninitialised, per the
driver contract).

The job prints ONE JSON line to stdout (row counts, phase walls, output
paths) and, with --out, writes partitioned Parquet per retention tier
plus metrics.json.  With --checkpoint it runs the resume-safe points
stage (state/manifest.py lineage manifests): re-submitting the same
command after a mid-run kill skips every committed shard.
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_config(args) -> "object":
    from .pipelines.rollup import RollupConfig

    kw = dict(
        input_paths=(args.input if len(args.input) > 1 else args.input[0]),
        input_kind=args.input_kind,
        tiers=tuple(args.tiers.split(",")),
        n_std=args.n_std,
        gapfill=not args.no_gapfill,
        gorilla=not args.no_gorilla,
        out_dir=args.out,
        salt_hot_domains=args.salt_hot_domains,
        dedup_pages=args.dedup_pages,
    )
    if args.input_kind == "table":
        kw.update(key_cols=args.key_cols.split(","), ts_col=args.ts_col,
                  value_col=args.value_col)
    if args.extract_mode:
        kw["extract_mode"] = args.extract_mode
    return RollupConfig(**kw)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m light_curve_ray.job",
        description="Tiered time-series rollup over web-page Parquet")
    p.add_argument("--input", nargs="+", default=None,
                   help="parquet file(s)/dir(s) (rollup mode)")
    p.add_argument("--query", default=None,
                   help="run one registered analytics query by name "
                        "(see pipelines.queries.build_queries) instead "
                        "of the rollup")
    p.add_argument("--sf-dir", default=None,
                   help="query mode: table directory (the parquet "
                        "tables the query reads)")
    p.add_argument("--out-parquet", default=None,
                   help="query mode: also write the result table here")
    p.add_argument("--input-kind", default="pages",
                   choices=["pages", "points", "table"])
    p.add_argument("--out", default=None,
                   help="output root (partitioned parquet per tier)")
    p.add_argument("--tiers", default="1h,1d,30d")
    p.add_argument("--key-cols", default="lang,domain",
                   help="table kind: grouping columns")
    p.add_argument("--ts-col", default="ts")
    p.add_argument("--value-col", default="value")
    p.add_argument("--n-std", type=float, default=1.0)
    p.add_argument("--no-gapfill", action="store_true")
    p.add_argument("--no-gorilla", action="store_true")
    p.add_argument("--salt-hot-domains", action="store_true")
    p.add_argument("--dedup-pages", action="store_true")
    p.add_argument("--extract-mode", default=None)
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir: resume-safe points stage with "
                        "per-shard lineage manifests")
    p.add_argument("--shard-size", type=int, default=8)
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only honoured when Ray is NOT already "
                        "initialised (standalone runs)")
    p.add_argument("--compact", default=None, metavar="DIR",
                   help="compaction mode: bin-pack the *.parquet files "
                        "under DIR into --out (resumable per bucket)")
    p.add_argument("--target-mb", type=int, default=128,
                   help="compaction target output size")
    args = p.parse_args(argv)
    if args.query is None and args.input is None and args.compact is None:
        p.error("one of --input (rollup), --query, or --compact "
                "is required")
    if args.compact is not None and not args.out:
        p.error("--compact requires --out")

    import ray

    if not ray.is_initialized():
        init_kw = dict(address="local", include_dashboard=False,
                       logging_level="ERROR")
        if args.num_cpus:
            init_kw["num_cpus"] = args.num_cpus
        ray.init(**init_kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    if args.compact is not None:
        from .sources.compact import compact_parquet

        info = compact_parquet(args.compact, args.out,
                               target_bytes=args.target_mb << 20)
        print(json.dumps({"mode": "compact", "in_dir": args.compact,
                          "out_dir": args.out, **info}), flush=True)
        return 0

    if args.query is not None:
        import time

        import pyarrow.parquet as pq

        from .pipelines.queries import build_queries

        qs = build_queries()
        if args.query not in qs:
            p.error(f"unknown query {args.query!r}; known: "
                    + ", ".join(sorted(qs)))
        if not args.sf_dir:
            p.error("--query requires --sf-dir")
        t0 = time.monotonic()
        res = qs[args.query](args.sf_dir)
        wall = time.monotonic() - t0
        # queries() returns a pa.Table / DataFrame / small Dataset
        import pandas as pd
        import pyarrow as pa

        if isinstance(res, pa.Table):
            tbl = res
        elif isinstance(res, pd.DataFrame):
            tbl = pa.Table.from_pandas(res, preserve_index=False)
        else:
            tbl = pa.Table.from_pandas(res.to_pandas(),
                                       preserve_index=False)
        if args.out_parquet:
            pq.write_table(tbl, args.out_parquet)
        print(json.dumps({
            "query": args.query,
            "rows": tbl.num_rows,
            "columns": tbl.column_names,
            "wall_s": round(wall, 3),
            "out": args.out_parquet,
        }), flush=True)
        return 0

    cfg = _build_config(args)
    if args.checkpoint:
        from .pipelines.resume import run_rollup_resumable

        res = run_rollup_resumable(cfg, args.checkpoint,
                                   shard_size=args.shard_size)
    else:
        from .pipelines.rollup import run_rollup

        res = run_rollup(cfg)

    rollup_rows = res["rollup"].count()
    series_rows = res["series"].count() if res.get("series") is not None \
        else 0
    print(json.dumps({
        "rollup_rows": rollup_rows,
        "series_rows": series_rows,
        "tiers": cfg.tiers,
        "phases": res.get("phases", {}),
        "out": res.get("out"),
        "checkpoint": args.checkpoint,
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
