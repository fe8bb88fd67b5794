"""Control experiment: extraction-kernel throughput vs process count,
NO Ray — isolates the hardware ceiling (memory bandwidth / host contention)
from Ray scheduling overhead.

Usage: python tools/mp_ceiling.py <nprocs> [pages_per_proc]
"""
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def worker(args):
    n_pages, seed = args
    from light_curve_ray.kernels.textkit import extract_text

    # deterministic synthetic page, same shape as the bench corpus (~6KB)
    body = " ".join(f"word{(seed * 7 + i) % 997}" for i in range(700))
    html = ("<html><head><title>t</title><script>var x=1;</script></head>"
            f"<body><p>{body}</p><div>{body}</div></body></html>").encode()
    t0 = time.monotonic()
    for _ in range(n_pages):
        extract_text(html)
    return time.monotonic() - t0


if __name__ == "__main__":
    nprocs = int(sys.argv[1])
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    with mp.Pool(nprocs) as pool:
        pool.map(worker, [(50, i) for i in range(nprocs)])  # warm
        t0 = time.monotonic()
        walls = pool.map(worker, [(per, i) for i in range(nprocs)])
    wall = time.monotonic() - t0
    total = nprocs * per
    print(json.dumps({
        "nprocs": nprocs, "pages": total, "wall_s": round(wall, 3),
        "pages_per_s": round(total / wall, 1),
        "per_proc_pages_per_s": round(per / (sum(walls) / nprocs), 1),
    }))
