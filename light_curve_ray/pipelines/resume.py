"""Resumable rollup (SURVEY §2b-O11): per-partition lineage + checkpoint
manifests enabling resume mid-rollup.

Ray Data retries tasks within a run but has no cross-run job resume, so the
engine checkpoints the one stage whose work dominates and is perfectly
fragment-parallel: pages -> points (extract + project).  Input fragments are
grouped into shards; each shard's points table is written to the checkpoint
directory with an ATOMIC commit protocol (write to a temp dir -> fsync ->
rename -> THEN write the manifest; POSIX rename is atomic, so a crash never
leaves a manifest pointing at partial data).  On restart, shards with
committed manifests are skipped — their points parquet is read back instead
of re-extracting pages.  The rollup/gap-fill/Gorilla tail re-runs from the
points checkpoint (it is ~10^3x smaller than the input; re-running it is
the cheap, always-consistent choice).

Shard identity is a deterministic function of the shard's input fragment
list (state/manifest.partition_id_for), so re-running the same job is
idempotent: a finished shard is never re-extracted, a half-finished one is
re-done from scratch.

Scale note: each shard executes as its own (internally parallel) Dataset
run, so size shards to minutes of cluster work — large enough to amortize
per-run scheduling, small enough that a crash loses little.  Manifests
carry per-partition metrics (rows, wall time) per the north rule.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

from ..state.manifest import (
    Manifest,
    partition_done,
    partition_id_for,
    write_manifest,
)
from .rollup import RollupConfig, points_dataset, run_rollup


def _input_fragments(input_paths) -> list:
    if isinstance(input_paths, (list, tuple)):
        out = []
        for p in input_paths:
            out.extend(_input_fragments(p))
        return sorted(out)
    if os.path.isdir(input_paths):
        return sorted(glob.glob(os.path.join(input_paths, "*.parquet")))
    return [input_paths]


def _shards(fragments: list, shard_size: int) -> list:
    return [fragments[i:i + shard_size]
            for i in range(0, len(fragments), shard_size)]


def checkpoint_points(cfg: RollupConfig, ckpt_dir: str,
                      shard_size: int = 8, on_shard=None) -> list:
    """Extract+project each pending shard to points parquet + manifest.

    Returns the list of committed points directories (all shards).
    ``on_shard`` is a test hook called after each shard commit (e.g. to
    simulate a crash).
    """
    manifest_dir = os.path.join(ckpt_dir, "manifests")
    points_root = os.path.join(ckpt_dir, "points")
    os.makedirs(points_root, exist_ok=True)
    done_dirs = []
    for shard in _shards(_input_fragments(cfg.input_paths), shard_size):
        pid = partition_id_for(shard)
        final_dir = os.path.join(points_root, pid)
        if partition_done(manifest_dir, pid):
            done_dirs.append(final_dir)
            continue
        t0 = time.monotonic()
        shard_cfg = RollupConfig(
            **{**cfg.__dict__, "input_paths": shard, "out_dir": None})
        pts = points_dataset(shard_cfg)
        tmp_dir = final_dir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        pts.write_parquet(tmp_dir)
        import pyarrow.parquet as pq

        n_rows = sum(pq.ParquetFile(p).metadata.num_rows
                     for p in glob.glob(os.path.join(tmp_dir, "*.parquet")))
        # durability before visibility: fsync every data file and the temp
        # dir so the subsequently-committed manifest can never point at
        # non-durable bytes after a power loss (rename alone only orders
        # the NAMESPACE, not the data)
        for p in glob.glob(os.path.join(tmp_dir, "*.parquet")):
            fd = os.open(p, os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        dfd = os.open(tmp_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp_dir, final_dir)  # atomic commit of the data...
        pfd = os.open(points_root, os.O_RDONLY)
        try:
            os.fsync(pfd)  # persist the rename before the manifest
        finally:
            os.close(pfd)
        write_manifest(manifest_dir, Manifest(  # ...then the manifest
            partition_id=pid,
            input_fragments=shard,
            row_count=n_rows,
            content_hash="",
            wall_time_s=round(time.monotonic() - t0, 3),
            metrics={"stage": "points", "fragments": len(shard)},
        ))
        done_dirs.append(final_dir)
        if on_shard is not None:
            on_shard(pid)
    return done_dirs


def run_rollup_resumable(cfg: RollupConfig, ckpt_dir: str,
                         shard_size: int = 8, on_shard=None) -> dict:
    """Checkpointed rollup: resume-safe points stage, then the rollup tail
    over the points checkpoint."""
    points_dirs = checkpoint_points(cfg, ckpt_dir, shard_size, on_shard)
    points_files = []
    for d in points_dirs:
        points_files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    tail_cfg = RollupConfig(
        **{**cfg.__dict__, "input_paths": points_files,
           "input_kind": "points"})
    return run_rollup(tail_cfg)
