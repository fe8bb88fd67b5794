"""The rollup pipeline (SURVEY §3.2): pages/points -> tiered feature rollups
-> gap-fill -> Gorilla -> partitioned Parquet.

Dataflow (streaming end-to-end; the only materialized intermediates are
rollup-scale, ~10^3-10^4x smaller than the input):

    read_parquet (O1, column-pruned)
      -> map_batches ExtractTextStage         (O2, actor pool, arrow, stateful)
      -> map_batches pages_to_points          (O3-O5, stateless, vectorized)
      -> map_batches partial stats [1h]       (map-side combine, arrow C++)
      -> groupby(lang,domain,bucket).Sum/Min/Max   (THE shuffle — partial rows)
      -> per tier: shift_stats + re-merge     (cascade: 1d/30d from 1h stats)
      -> finalize features                    (vectorized)
      -> beyond_1_std second pass             (broadcast stats, map-side counts)
      -> groupby(lang,domain,tier).map_groups gapfill + gorilla  (small shuffle)
      -> write_parquet partitioned by tier    (O9, resumable layout)

Never calls ray.init() — sessions belong to the caller (driver contract).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..kernels.grid import TIER_STEP_US
from ..stages.aggregate import (
    finalize_stats_batch,
    make_beyond_partial_fn,
    make_partial_stats_fn,
    merge_partials,
    shift_stats,
)
from ..stages.extract import ExtractTextStage
from ..stages.gapfill import gapfill_group, gorilla_group
from ..stages.project import pages_to_points, table_to_points

ROLLUP_KEY = ["lang", "domain", "tier", "bucket_ts_us"]
SERIES_KEY = ["lang", "domain", "tier"]


@dataclass
class RollupConfig:
    input_paths: object  # str | list[str]
    input_kind: str = "pages"  # "pages" | "points" | "table"
    # for input_kind="table": map arbitrary timestamped tables onto points
    key_cols: list = field(default_factory=lambda: ["lang", "domain"])
    ts_col: str = "warc_ts"
    value_col: str = "v"
    weight_col: str | None = None
    read_columns: list | None = None
    tiers: tuple = ("1h", "1d", "30d")
    n_std: float = 1.0
    gapfill: bool = True
    gorilla: bool = True
    compute_beyond: bool = True
    out_dir: str | None = None
    extract_concurrency: tuple = (2, 8)
    extract_batch_size: int = 512
    points_batch_size: int = 65536
    # read fan-out hint: small page shards default to one read task per
    # couple of files, serializing the parquet+html decode; raise this to
    # ~#files (or #cpus) for small-file inputs
    read_num_blocks: int | None = None
    # broadcast threshold for the beyond pass: above this many rollup rows
    # the stats lookup table should switch to a hash-partitioned Dataset.join
    # of points with stats instead of a driver broadcast (documented scale
    # path; the sandbox datasets stay far below it).
    beyond_broadcast_limit: int = 5_000_000


def points_dataset(cfg: RollupConfig):
    """O1-O5: read -> (extract) -> project to the points table."""
    import ray.data as rd

    if cfg.input_kind == "points":
        ds = rd.read_parquet(cfg.input_paths, columns=cfg.read_columns)
        return ds
    if cfg.input_kind == "pages":
        ds = rd.read_parquet(cfg.input_paths,
                             override_num_blocks=cfg.read_num_blocks)
        ds = ds.map_batches(
            ExtractTextStage,
            batch_format="pyarrow",
            batch_size=cfg.extract_batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
        )
        return ds.map_batches(
            pages_to_points,
            batch_format="pyarrow",
            batch_size=cfg.points_batch_size,
            zero_copy_batch=True,
        )
    # generic timestamped table
    cols = cfg.read_columns
    if cols is None:
        cols = list(dict.fromkeys(
            cfg.key_cols + [cfg.ts_col, cfg.value_col]
            + ([cfg.weight_col] if cfg.weight_col else [])
        ))
    ds = rd.read_parquet(cfg.input_paths, columns=cols)
    key_cols, ts_col, value_col, weight_col = (
        cfg.key_cols, cfg.ts_col, cfg.value_col, cfg.weight_col,
    )

    def _project(batch: pa.Table) -> pa.Table:
        return table_to_points(batch, key_cols, ts_col, value_col, weight_col)

    return ds.map_batches(
        _project,
        batch_format="pyarrow",
        batch_size=cfg.points_batch_size,
        zero_copy_batch=True,
    )


def tier_stats(points_ds, tiers: tuple):
    """O6 merge stage: dict tier -> merged sufficient-stats Dataset.

    Raw points are scanned and shuffled ONCE, at the finest requested tier;
    coarser tiers cascade from the merged fine stats (shift + re-merge) —
    the re-merge input is rollup-scale, so those shuffles are tiny.
    """
    ordered = sorted(tiers, key=lambda t: TIER_STEP_US[t])
    fine = ordered[0]
    fine_partials = points_ds.map_batches(
        make_partial_stats_fn(TIER_STEP_US[fine]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    stats = {fine: merge_partials(fine_partials).materialize()}
    for tier in ordered[1:]:
        step = TIER_STEP_US[tier]

        def _shift(batch: pa.Table, _step=step) -> pa.Table:
            return shift_stats(batch, _step)

        shifted = stats[fine].map_batches(
            _shift, batch_format="pyarrow", zero_copy_batch=True
        )
        stats[tier] = merge_partials(shifted)
    return stats


def finalize_tiers(stats_by_tier: dict):
    """Finalized per-tier feature Datasets (without beyond_1_std)."""
    out = {}
    for tier, ds in stats_by_tier.items():
        def _fin(batch: pa.Table, _tier=tier) -> pa.Table:
            return finalize_stats_batch(batch, _tier)

        out[tier] = ds.map_batches(_fin, batch_format="pyarrow", zero_copy_batch=True)
    return out


def attach_beyond(features_by_tier: dict, points_ds, n_std: float, cfg: RollupConfig):
    """beyond_n_std second pass (exact by definition needs final mean/std).

    Broadcast path: the per-bucket (mean, std) lookup — the SMALL side — is
    ray.put() once and read inside every map task; points stream through a
    partial-count map_batches, then a rollup-scale groupby-sum.  The final
    combine is a driver-side pandas merge because both sides are rollup-scale
    (the features table was already collected to build the broadcast).  Above
    ``cfg.beyond_broadcast_limit`` rows the design switches to
    Dataset.join(points, stats) — documented, not needed at sandbox scale.
    """
    import ray
    import ray.data as rd

    feats_pd = {tier: ds.to_pandas() for tier, ds in features_by_tier.items()}
    total = sum(len(df) for df in feats_pd.values())
    if total > cfg.beyond_broadcast_limit:
        raise NotImplementedError(
            "rollup table too large for broadcast beyond-pass; "
            "switch to the Dataset.join scale path"
        )
    stats_small = {
        tier: df[["lang", "domain", "bucket_ts_us", "mean", "std"]]
        for tier, df in feats_pd.items()
    }
    ref = ray.put(stats_small)
    beyond = points_ds.map_batches(
        make_beyond_partial_fn(ref, n_std=n_std),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    # The partial counts are ≤ one row per (key, tier) per block — the same
    # rollup scale as the feature table that is ALREADY driver-side for the
    # broadcast (guarded by beyond_broadcast_limit above), so the final
    # integer-sum combine is a driver-side pandas groupby: a distributed
    # groupby here would pay Ray's per-group dispatch for a plain int sum.
    counts = (
        beyond.to_pandas()
        .groupby(["lang", "domain", "tier", "bucket_ts_us"], sort=False,
                 as_index=False)["n_beyond"]
        .sum()
    )
    out = {}
    for tier, df in feats_pd.items():
        c = counts[counts["tier"] == tier].drop(columns=["tier"])
        m = df.merge(c, on=["lang", "domain", "bucket_ts_us"], how="left")
        nb = m["n_beyond"].fillna(0).to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore"):
            frac = nb / m["n"].to_numpy(dtype=np.float64)
        m["beyond_1_std"] = frac
        m = m.drop(columns=["n_beyond"])
        out[tier] = rd.from_pandas(m)
    return out


def gapfilled(rollup_ds):
    """O7: densify each (lang, domain, tier) series over its bucket grid."""
    return rollup_ds.groupby(SERIES_KEY).map_groups(
        gapfill_group, batch_format="pandas"
    )


def gorilla_series(rollup_ds):
    """O8: one Gorilla blob per (lang, domain, tier) series."""
    return rollup_ds.groupby(SERIES_KEY).map_groups(
        gorilla_group, batch_format="pandas"
    )


def run_rollup(cfg: RollupConfig) -> dict:
    """Full pipeline; returns {'rollup': Dataset, 'series': Dataset|None,
    'wall_time_s': float, 'out': paths|None}."""
    t0 = time.monotonic()
    points = points_dataset(cfg)
    if cfg.compute_beyond:
        # points are consumed by two passes (stats + beyond); materialize the
        # compact points table so extraction/projection run once.  At cluster
        # scale this would be a parquet checkpoint (state/manifest.py); in
        # object-store terms points are ~1000x smaller than raw pages.
        points = points.materialize()
    stats = tier_stats(points, cfg.tiers)
    features = finalize_tiers(stats)
    if cfg.compute_beyond:
        features = attach_beyond(features, points, cfg.n_std, cfg)
    else:
        import ray.data as rd

        features = {
            tier: ds.map_batches(
                lambda b: b.append_column(
                    "beyond_1_std", pa.array([None] * len(b), pa.float64())
                ),
                batch_format="pyarrow",
            )
            for tier, ds in features.items()
        }
    rollup = features[cfg.tiers[0]]
    for tier in cfg.tiers[1:]:
        rollup = rollup.union(features[tier])
    if cfg.gapfill:
        rollup = gapfilled(rollup)
    if cfg.gorilla or cfg.out_dir:
        # two+ consumers (series branch / parquet sink / caller) — pin the
        # rollup-scale result so the gap-fill chain executes once, not per
        # consumer (lazy Datasets re-execute shared upstream otherwise)
        rollup = rollup.materialize()
    series = gorilla_series(rollup) if cfg.gorilla else None

    out_paths = None
    if cfg.out_dir:
        rollup_dir = f"{cfg.out_dir}/rollup"
        rollup.write_parquet(rollup_dir, partition_cols=["tier"])
        out_paths = {"rollup": rollup_dir}
        if series is not None:
            series_dir = f"{cfg.out_dir}/series"
            series.write_parquet(series_dir, partition_cols=["tier"])
            out_paths["series"] = series_dir
    return {
        "rollup": rollup,
        "series": series,
        "wall_time_s": time.monotonic() - t0,
        "out": out_paths,
    }
