"""Small-file compaction — the table-maintenance op every long-lived
parquet lake needs: streaming writers emit one file per block, and after
enough incremental runs a partition holds thousands of KB-scale files
whose open/footer costs dominate reads.  Compaction bin-packs them into
~target-size outputs and rewrites, preserving every row.

Topology: the driver only LISTS files (names + sizes — metadata scale,
never data); first-fit-decreasing packs them into buckets of
``target_bytes``; ONE Ray task per bucket reads its files and writes one
output file — embarrassingly parallel, no exchange, resumable per bucket
(each bucket's output is named by its stable index; a re-run skips
buckets whose output exists).  Row content is untouched (read -> concat
-> write), so any aggregate over the compacted copy equals the same
aggregate over the input — the correctness contract the driver query
checks.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq


def plan_buckets(sizes: dict, target_bytes: int) -> list:
    """First-fit-decreasing bin packing: {path: bytes} -> [[path, ...]].
    Deterministic (ties broken by path) so re-runs produce identical
    bucket assignments — the resume requirement."""
    items = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))
    buckets, loads = [], []
    for path, sz in items:
        for i, load in enumerate(loads):
            if load + sz <= target_bytes:
                buckets[i].append(path)
                loads[i] += sz
                break
        else:
            buckets.append([path])
            loads.append(sz)
    return buckets


def compact_parquet(in_dir: str, out_dir: str,
                    target_bytes: int = 128 << 20,
                    overwrite_incomplete: bool = True) -> dict:
    """Compact every ``*.parquet`` under ``in_dir`` into
    ``out_dir/compact-<i>.parquet`` files of ~``target_bytes``.
    Returns {"n_in": ..., "n_out": ..., "buckets": [...]}.  Buckets
    whose output already exists are SKIPPED (resume); set
    ``overwrite_incomplete`` to rewrite a torn file from a killed run
    (output is written to a .tmp name and atomically renamed, so an
    existing final name is always complete)."""
    import ray

    names = sorted(f for f in os.listdir(in_dir) if f.endswith(".parquet"))
    sizes = {os.path.join(in_dir, f): os.path.getsize(
        os.path.join(in_dir, f)) for f in names}
    buckets = plan_buckets(sizes, target_bytes)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote
    def _compact_one(paths: list, out_path: str) -> int:
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        tmp = out_path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out_path)  # atomic publish
        return len(tbl)

    futures, skipped = [], 0
    for i, bucket in enumerate(buckets):
        out_path = os.path.join(out_dir, f"compact-{i:05d}.parquet")
        if os.path.exists(out_path):
            skipped += 1
            continue
        futures.append(_compact_one.remote(bucket, out_path))
    rows = sum(ray.get(futures)) if futures else 0
    return {"n_in": len(names), "n_out": len(buckets),
            "rows_written": rows, "skipped": skipped}
