"""One-off experiment: points-stage wall vs fused task-span sizing.

Usage: python tools/span_exp.py <num_cpus> <tasks_per_slot> [max_span] [n_pages]
Prints one JSON line.  Owns its Ray session (experiment script).
"""
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

num_cpus = int(sys.argv[1])
tps = int(sys.argv[2])
max_span = int(sys.argv[3]) if len(sys.argv) > 3 else 32
n_pages = int(sys.argv[4]) if len(sys.argv) > 4 else 1_200_000
mode = sys.argv[5] if len(sys.argv) > 5 else "fused"

import ray  # noqa: E402

ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
         logging_level="ERROR")
from ray.data import DataContext  # noqa: E402

DataContext.get_current().enable_progress_bars = False

from light_curve_ray.pipelines.rollup import RollupConfig, points_dataset  # noqa: E402

d = f"/tmp/lcr_bench_pages_{n_pages}_200_6kb_rg2500"
files = sorted(glob.glob(os.path.join(d, "*.parquet")))
conc = max(2, num_cpus - 1)


def cfg(paths):
    return RollupConfig(input_paths=paths, input_kind="pages",
                        extract_mode=mode, extract_concurrency=conc,
                        fused_tasks_per_slot=tps, fused_max_span=max_span)


points_dataset(cfg(files[:max(2, conc // 3)])).materialize()  # warm pool
t0 = time.monotonic()
pts = points_dataset(cfg(files)).materialize()
wall = time.monotonic() - t0
print(json.dumps({"num_cpus": num_cpus, "mode": mode,
                  "tasks_per_slot": tps,
                  "max_span": max_span, "pages": n_pages,
                  "wall_s": round(wall, 3), "rows": pts.count(),
                  "pages_per_s": round(n_pages / wall, 1)}))
ray.shutdown()
