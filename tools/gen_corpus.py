"""Parallel synthetic-corpus generator.

Produces EXACTLY the same shards as
light_curve_ray.sources.pages.write_pages_parquet (per-shard seed =
seed + shard_index, 10k rows/file, 2500-row groups) but fans shards out
over worker processes — corpus generation is embarrassingly parallel and
the sequential path is ~0.5 ms/page.

Usage: python tools/gen_corpus.py N_PAGES [PAGE_KB] [N_PROCS]
Writes to the bench cache location
/tmp/lcr_bench_pages_{n}_{200}_{kb}kb_rg2500.
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOMAINS = 200
ROWS_PER_FILE = 10_000
ROW_GROUP = 2500


def _one_shard(args):
    out_dir, shard, n, seed, page_kb = args
    import pyarrow.parquet as pq

    from light_curve_ray.sources.pages import generate_pages_table

    path = os.path.join(out_dir, f"pages-{shard:05d}.parquet")
    if os.path.exists(path):
        return path
    tbl = generate_pages_table(n, N_DOMAINS, seed=seed + shard,
                               page_kb=page_kb)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp, row_group_size=ROW_GROUP)
    os.rename(tmp, path)
    return path


def main():
    n_pages = int(sys.argv[1])
    page_kb = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
    n_procs = int(sys.argv[3]) if len(sys.argv) > 3 else max(
        4, mp.cpu_count() // 2)
    out_dir = f"/tmp/lcr_bench_pages_{n_pages}_{N_DOMAINS}_{page_kb:g}kb_rg2500"
    os.makedirs(out_dir, exist_ok=True)
    jobs = []
    shard = 0
    for start in range(0, n_pages, ROWS_PER_FILE):
        jobs.append((out_dir, shard,
                     min(ROWS_PER_FILE, n_pages - start), 42, page_kb))
        shard += 1
    # progress goes to STDERR: bench.py runs this as a subprocess with an
    # inherited stdout, and the driver parses bench stdout's tail as ONE
    # JSON line — a late-flushed "done:" on the shared pipe corrupted a
    # captured bench line once (round-3 session)
    with mp.Pool(n_procs) as pool:
        for i, _ in enumerate(pool.imap_unordered(_one_shard, jobs)):
            if i % 100 == 0:
                print(f"{i}/{len(jobs)} shards", file=sys.stderr, flush=True)
    open(os.path.join(out_dir, "_DONE"), "w").write("ok")
    print("done:", out_dir, file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
