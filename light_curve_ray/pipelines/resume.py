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

Rollup-stage checkpoint tier (round 3): alongside each shard's points the
shard's FINE-TIER partial states (KEY_COLS + packed ``state``, already
map-side combined to ≤1 row per key per block) are checkpointed too.  On
resume the tail merges those directly (RollupConfig.partials_paths) —
skipping the points-scale partial scan, the dominant cost of the tail
re-run when the crawl has billions of series.  Points remain checkpointed
because the beyond pass (beyond_1_std / stetson_k) needs a second look at
raw points once the final mean/std are known.  Both artifacts commit under
the same manifest, and the partials directory is named by the fine tier
(``partials_1h``) so a resume with different ``tiers`` simply misses it
and recomputes from points.

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


def _fsync_tree(d: str) -> None:
    """fsync every parquet file in ``d``, then ``d`` itself — durability
    before visibility: the subsequently-committed manifest can never point
    at non-durable bytes after a power loss (rename alone only orders the
    NAMESPACE, not the data)."""
    for p in glob.glob(os.path.join(d, "*.parquet")):
        fd = os.open(p, os.O_RDONLY)
        try:
            os.fsync(fd)
        finally:
            os.close(fd)
    dfd = os.open(d, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)


def _fine_tier(cfg: RollupConfig) -> str:
    from .rollup import TIER_STEP_US

    return min(cfg.tiers, key=lambda t: TIER_STEP_US[t])


def checkpoint_points(cfg: RollupConfig, ckpt_dir: str,
                      shard_size: int = 8, on_shard=None,
                      partials: bool = True) -> list:
    """Extract+project each pending shard to points parquet + manifest;
    with ``partials`` (default) also checkpoint the shard's fine-tier
    partial-state table (the rollup-stage checkpoint tier, see module doc).

    Returns the list of committed points directories (all shards).
    ``on_shard`` is a test hook called after each shard commit (e.g. to
    simulate a crash).
    """
    manifest_dir = os.path.join(ckpt_dir, "manifests")
    points_root = os.path.join(ckpt_dir, "points")
    partials_root = os.path.join(ckpt_dir, f"partials_{_fine_tier(cfg)}")
    os.makedirs(points_root, exist_ok=True)
    if partials:
        os.makedirs(partials_root, exist_ok=True)
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
        _fsync_tree(tmp_dir)
        part_final = os.path.join(partials_root, pid)
        part_tmp = part_final + ".tmp"
        if partials:
            # fine-tier partial states from the just-written points (local
            # parquet read — no second extraction), map-side combined to
            # ≤1 row per key per block by make_partial_stats_fn itself
            import ray.data as rd

            from ..stages.aggregate import make_partial_stats_fn
            from .rollup import TIER_STEP_US

            shutil.rmtree(part_tmp, ignore_errors=True)
            rd.read_parquet(
                sorted(glob.glob(os.path.join(tmp_dir, "*.parquet")))
            ).map_batches(
                make_partial_stats_fn(TIER_STEP_US[_fine_tier(cfg)]),
                batch_format="pyarrow", batch_size=cfg.points_batch_size,
                zero_copy_batch=True,
            ).write_parquet(part_tmp)
            _fsync_tree(part_tmp)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.rename(tmp_dir, final_dir)  # atomic commit of the data...
        if partials:
            shutil.rmtree(part_final, ignore_errors=True)
            os.rename(part_tmp, part_final)
            pfd = os.open(partials_root, os.O_RDONLY)
            try:
                os.fsync(pfd)
            finally:
                os.close(pfd)
        pfd = os.open(points_root, os.O_RDONLY)
        try:
            os.fsync(pfd)  # persist the renames before the manifest
        finally:
            os.close(pfd)
        write_manifest(manifest_dir, Manifest(  # ...then the manifest
            partition_id=pid,
            input_fragments=shard,
            row_count=n_rows,
            content_hash="",
            wall_time_s=round(time.monotonic() - t0, 3),
            metrics={"stage": "points", "fragments": len(shard),
                     "partials": bool(partials)},
        ))
        done_dirs.append(final_dir)
        if on_shard is not None:
            on_shard(pid)
    return done_dirs


def run_rollup_resumable(cfg: RollupConfig, ckpt_dir: str,
                         shard_size: int = 8, on_shard=None,
                         partials: bool = True) -> dict:
    """Checkpointed rollup: resume-safe points stage, then the rollup tail
    over the checkpoints.

    When every committed shard also has a fine-partials checkpoint the
    tail merges those (RollupConfig.partials_paths fast path) and the
    points checkpoint feeds only the beyond pass; if ANY shard's partials
    are missing (older checkpoint, or ``partials=False`` earlier) the
    tail falls back to recomputing partials from points — correctness
    never depends on the fast path."""
    points_dirs = checkpoint_points(cfg, ckpt_dir, shard_size, on_shard,
                                    partials=partials)
    partials_root = os.path.join(ckpt_dir, f"partials_{_fine_tier(cfg)}")
    points_files, partials_files = [], []
    for d in points_dirs:
        points_files.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        pd_ = os.path.join(partials_root, os.path.basename(d))
        pfiles = sorted(glob.glob(os.path.join(pd_, "*.parquet")))
        if not pfiles:
            partials_files = None  # incomplete tier -> recompute from points
        elif partials_files is not None:
            partials_files.extend(pfiles)
    tail_cfg = RollupConfig(
        **{**cfg.__dict__, "input_paths": points_files,
           "input_kind": "points",
           "partials_paths": partials_files if partials else None})
    return run_rollup(tail_cfg)
