"""Control experiment 2: the EXACT fused read+extract+project work executed
by a plain multiprocessing pool over row-group spans — no Ray. Isolates
actor-pool/driver overhead from the work itself.

Usage: python tools/mp_fused.py <nprocs> [n_pages]
"""
import glob
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_STAGE = None


def worker(span):
    global _STAGE
    import pyarrow as pa

    from light_curve_ray.stages.extract import FusedPagesToPointsStage

    if _STAGE is None:
        _STAGE = FusedPagesToPointsStage()
    path, s, e = span
    batch = pa.table({"path": [path], "rg_start": [s], "rg_end": [e]})
    return len(_STAGE(batch))


if __name__ == "__main__":
    import pyarrow.parquet as pq

    nprocs = int(sys.argv[1])
    n_pages = int(sys.argv[2]) if len(sys.argv) > 2 else 1_200_000
    d = f"/tmp/lcr_bench_pages_{n_pages}_200_6kb_rg2500"
    files = sorted(glob.glob(os.path.join(d, "*.parquet")))
    spans = []
    span_len = 5
    for p in files:
        n_rg = pq.ParquetFile(p).metadata.num_row_groups
        for s in range(0, n_rg, span_len):
            spans.append((p, s, min(s + span_len, n_rg)))
    with mp.Pool(nprocs) as pool:
        pool.map(worker, spans[:nprocs])  # warm: imports + first read
        t0 = time.monotonic()
        rows = pool.map(worker, spans)
        wall = time.monotonic() - t0
    print(json.dumps({"nprocs": nprocs, "pages": n_pages,
                      "tasks": len(spans), "wall_s": round(wall, 3),
                      "rows": sum(rows),
                      "pages_per_s": round(n_pages / wall, 1)}))
