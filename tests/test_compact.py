"""Small-file compaction (sources/compact): deterministic bin packing,
row preservation, and bucket-level resume (skip existing outputs)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from light_curve_ray.sources.compact import compact_parquet, plan_buckets


def test_plan_buckets_deterministic_and_bounded():
    sizes = {f"f{i}": s for i, s in enumerate(
        [700, 300, 300, 500, 200, 100, 900])}
    b1 = plan_buckets(sizes, 1000)
    b2 = plan_buckets(dict(reversed(list(sizes.items()))), 1000)
    assert b1 == b2  # insertion order must not matter
    for bucket in b1:
        # a bucket over target only if it is a single oversized file
        assert len(bucket) == 1 or sum(sizes[p] for p in bucket) <= 1000
    assert sorted(p for b in b1 for p in b) == sorted(sizes)


def test_compact_preserves_rows_and_resumes(ray_session, tmp_path):
    rng = np.random.default_rng(2)
    src = tmp_path / "in"
    out = tmp_path / "out"
    src.mkdir()
    total = 0
    for i in range(12):
        n = int(rng.integers(10, 60))
        total += n
        pq.write_table(
            pa.table({"x": pa.array(rng.integers(0, 1000, n)),
                      "s": pa.array([f"r{i}_{j}" for j in range(n)])}),
            src / f"part-{i}.parquet")

    info = compact_parquet(str(src), str(out), target_bytes=8 << 10)
    assert info["n_in"] == 12 and info["n_out"] < 12
    assert info["rows_written"] == total
    back = pq.read_table(str(out))
    assert len(back) == total
    # content identity, order-insensitive
    orig = pq.read_table(str(src))
    assert sorted(back["s"].to_pylist()) == sorted(orig["s"].to_pylist())

    # resume: second run rewrites nothing
    info2 = compact_parquet(str(src), str(out), target_bytes=8 << 10)
    assert info2["skipped"] == info["n_out"]
    assert info2["rows_written"] == 0
