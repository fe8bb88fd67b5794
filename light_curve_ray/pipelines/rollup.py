"""The rollup pipeline (SURVEY §3.2): pages/points -> tiered feature rollups
-> gap-fill -> Gorilla -> partitioned Parquet.

Dataflow (streaming end-to-end; the only materialized intermediates are
rollup-scale, ~10^3-10^4x smaller than the input):

    read_parquet (O1, column-pruned)
      -> map_batches ExtractTextStage         (O2, actor pool, arrow, stateful)
      -> map_batches pages_to_points          (O3-O5, stateless, vectorized)
      -> map_batches partial stats [1h]       (map-side combine, packed state,
                                               optional hot-domain salting)
      -> sort(key) + vectorized Pébay merge   (THE shuffle — partial rows)
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
    # O10: drop duplicate (url, warc_ts) pages (re-crawled in overlapping
    # dumps) before extraction.  Costs a pages-scale sort shuffle, so it is
    # opt-in; requires the split extract path (the fused reader never
    # materializes a pages dataset to dedup).
    dedup_pages: bool = False
    # skew handling (north rule: explicit salting for hot domains): when
    # True, a cheap sampling pre-pass finds Zipf-head domains and their
    # points get salted partial keys (stages/aggregate.make_partial_stats_fn)
    salt_hot_domains: bool = False
    n_salt: int = 16
    n_std: float = 1.0
    gapfill: bool = True
    gorilla: bool = True
    compute_beyond: bool = True
    out_dir: str | None = None
    extract_concurrency: tuple = (2, 8)
    # "actors": fixed/autoscaling actor pool (stateful-stage pattern;
    # required when per-worker state is expensive).  "tasks": stateless
    # map_batches with a once-per-worker-process cached stage — lets reads
    # and extraction share the whole CPU budget instead of a static slot
    # split (better throughput when stage state is cheap, like this parser).
    # "fused"/"fused_tasks": read+extract+project fused into one stage over
    # row-group spans (only points enter the object store); fused_tasks
    # runs it on reusable workers — actor pools respawn per execution,
    # which costs seconds of spawn+import at 31 actors (measured; see
    # BASELINE.md) — so fused_tasks is the headline/bench topology.
    extract_mode: str = "actors"
    extract_batch_size: int = 512
    # map-side combine batch: the partial collapse ratio is
    # batch_size / keys-touched-per-batch, so big batches matter when key
    # cardinality is high (65k keys x 65k batch -> almost no collapse).
    # 1M rows x ~40 B/row x n_workers comfortably fits worker heaps and
    # quarters the partial-row count entering the merge sort vs 256k.
    points_batch_size: int = 1_048_576
    # read fan-out hint: small page shards default to one read task per
    # couple of files, serializing the parquet+html decode; raise this to
    # ~#files (or #cpus) for small-file inputs
    read_num_blocks: int | None = None
    # fused-path task sizing: tasks ≈ pool_slots * fused_tasks_per_slot,
    # each task a span of ≤ fused_max_span contiguous row groups (streamed
    # one row group at a time, so span length ≠ heap usage).  Driver
    # bookkeeping is ~30-40 ms/task and does NOT shrink with cluster size,
    # so task count must track the POOL, not the input.
    fused_tasks_per_slot: int = 3
    fused_max_span: int = 32
    # beyond-pass path switch: at or below this many rollup rows the
    # (mean, std) lookup is broadcast (ray.put once, driver-side combine);
    # above it attach_beyond_join runs the fully distributed
    # hash-partitioned Dataset.join path (0 forces the join path in tests)
    beyond_broadcast_limit: int = 5_000_000
    # adaptive tail: once the POINTS have been aggregated, the rollup is
    # ~10^3-10^4x smaller.  When the merged fine-tier stats are under this
    # many rows, the cascade/finalize/gap-fill/Gorilla tail runs vectorized
    # in-process (same kernels) instead of as 6+ distributed stages whose
    # scheduling overhead (~7 s) dwarfs their sub-second compute.  A
    # 10^12-doc crawl produces >> this many series-buckets and takes the
    # distributed tail.  0 forces the distributed tail (tests).  Sized so
    # the driver tail's per-series pandas applies stay ~seconds — beyond
    # this the distributed tail's scheduling cost is the cheaper side.
    small_rollup_limit: int = 150_000
    # adaptive merge: under this many map-side-combined partial rows the
    # fine merge runs in-process (same vectorized kernel) instead of as a
    # distributed sort whose fixed cost (~3 s) dwarfs the work; 0 forces
    # the distributed sort-merge (tests)
    driver_merge_limit: int = 2_000_000
    # O11 rollup-stage checkpoint tier: parquet files holding ALREADY
    # map-side-combined fine-tier partial states (KEY_COLS + packed
    # ``state``), written per shard by pipelines/resume.checkpoint_points.
    # When set, run_rollup skips the points -> fine-partials scan entirely
    # (the dominant cost of the tail re-run at crawl scale) and merges
    # these instead; ``points`` (input_kind="points" checkpoint parquet)
    # is then consumed lazily only by the beyond pass.  Skew salting is
    # unnecessary on this path: each shard contributes at most one partial
    # row per key, so merge fan-in per key is bounded by the SHARD count,
    # not the point count.
    partials_paths: list | None = None


def points_dataset(cfg: RollupConfig):
    """O1-O5: read -> (extract) -> project to the points table."""
    import ray.data as rd

    if cfg.input_kind == "points":
        ds = rd.read_parquet(cfg.input_paths, columns=cfg.read_columns)
        return ds
    if cfg.input_kind == "pages":
        if cfg.dedup_pages and cfg.extract_mode.startswith("fused"):
            raise ValueError("dedup_pages requires extract_mode "
                             "'actors' or 'tasks' (split read path)")
        if cfg.extract_mode in ("fused", "fused_tasks"):
            import glob as _glob
            import os as _os

            from ..stages.extract import FusedPagesToPointsStage

            paths = cfg.input_paths
            if not isinstance(paths, (list, tuple)):
                if _os.path.isdir(paths):
                    paths = sorted(_glob.glob(_os.path.join(paths,
                                                            "*.parquet")))
                else:
                    paths = [paths]
            conc = cfg.extract_concurrency
            if isinstance(conc, int):
                conc = max(2, conc)
            # Work items are SPANS of contiguous row groups.  One item per
            # row group (round 1) made the driver the bottleneck at scale:
            # ~4000 tasks x 30-40 ms of serial scheduling bookkeeping is
            # minutes of driver wall, and it grows with input size but NOT
            # with cluster size — the measured 8->32-cpu efficiency ceiling.
            # Spans are sized so the task count tracks the POOL (~tasks_per
            # _slot waves per actor), capped so a single span stays a
            # sub-file unit (tail load-balance + per-task read granularity).
            # The stage streams one row group at a time inside the span, so
            # span length does not change worker heap usage.
            import pyarrow.parquet as _pq

            # footer scan parallelized: at 100 TB this is thousands of
            # S3/posix footer reads — serial enumeration was a driver-side
            # serial tail in round 1
            from concurrent.futures import ThreadPoolExecutor

            def _n_rg(p):
                return _pq.ParquetFile(p).metadata.num_row_groups

            if len(paths) > 4:
                with ThreadPoolExecutor(max_workers=16) as ex:
                    metas = list(zip(paths, ex.map(_n_rg, paths)))
            else:
                metas = [(p, _n_rg(p)) for p in paths]
            total_rg = sum(max(1, n) for _, n in metas)
            if cfg.extract_mode == "fused_tasks":
                import ray

                pool_slots = max(
                    2, int(ray.cluster_resources().get("CPU", 8)) - 1)
            else:
                pool_slots = conc if isinstance(conc, int) else conc[1]
            target_tasks = max(1, pool_slots * cfg.fused_tasks_per_slot)
            span = min(cfg.fused_max_span,
                       max(1, total_rg // target_tasks))
            items = []
            for p, n_rg in metas:
                if n_rg <= 1:
                    items.append({"path": p, "rg_start": 0, "rg_end": -1})
                else:
                    for s in range(0, n_rg, span):
                        items.append({"path": p, "rg_start": s,
                                      "rg_end": min(s + span, n_rg)})
            # Blocks = TASKS here (batch_size=None): pack multiple file
            # spans per block so the task count tracks target_tasks even
            # when files are small — one block per item meant >=1 task per
            # FILE (a 1000-shard corpus ran 1000 tasks at any cluster
            # size; at ~35 ms driver bookkeeping each that serial cost was
            # the measured 32-cpu e2e scaling ceiling).  Items stay in
            # path order, so a packed block is a time-contiguous span —
            # the map-side combine keeps its collapse ratio.
            src = rd.from_items(
                items,
                override_num_blocks=min(len(items), target_tasks))
            if cfg.extract_mode == "fused_tasks":
                # reusable-worker tasks: no per-execution actor spawn
                from ..stages.extract import fused_pages_to_points_task

                return src.map_batches(
                    fused_pages_to_points_task,
                    batch_format="pyarrow",
                    batch_size=None,
                    num_cpus=1,
                )
            return src.map_batches(
                FusedPagesToPointsStage,
                batch_format="pyarrow",
                batch_size=None,
                concurrency=conc,
                num_cpus=1,
            )
        ds = rd.read_parquet(cfg.input_paths,
                             override_num_blocks=cfg.read_num_blocks)
        if cfg.dedup_pages:
            # slim two-pass dedup: fat html rows never shuffle unless the
            # key is actually duplicated (stages/dedup.dedup_pages_slim)
            from ..stages.dedup import dedup_pages_slim

            ds = dedup_pages_slim(ds, ["url", "warc_ts"])
        if cfg.extract_mode == "tasks":
            from ..stages.extract import extract_text_task

            ds = ds.map_batches(
                extract_text_task,
                batch_format="pyarrow",
                batch_size=cfg.extract_batch_size,
            )
        else:
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


def tier_stats(points_ds, tiers: tuple, hot_domains: frozenset | None = None,
               n_salt: int = 16):
    """O6 merge stage: dict tier -> merged sufficient-stats Dataset.

    Raw points are scanned and shuffled ONCE, at the finest requested tier;
    coarser tiers cascade from the merged fine stats (shift + re-merge) —
    the re-merge input is rollup-scale, so those shuffles are tiny.
    ``hot_domains``: Zipf-head domains whose partials get salted keys.
    """
    ordered = sorted(tiers, key=lambda t: TIER_STEP_US[t])
    fine = ordered[0]
    fine_partials = points_ds.map_batches(
        make_partial_stats_fn(TIER_STEP_US[fine], hot_domains=hot_domains,
                              n_salt=n_salt),
        batch_format="pyarrow",
        batch_size=65536,  # bundle small upstream blocks: the map-side
        zero_copy_batch=True,  # combine collapses per BATCH, and the sort
    )                          # cost scales with partial-row count
    stats = {fine: merge_partials(
        fine_partials, salted=bool(hot_domains)).materialize()}
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


def _stetson_k(sad: np.ndarray, n: np.ndarray, std: np.ndarray) -> np.ndarray:
    """StetsonK (Malanchev et al. 2021 catalog; Stetson 1996):
    (mean |v - mean|) / sqrt(population variance), computed here as
    (sad/n) / (std * sqrt((n-1)/n)) from the SAMPLE std already finalized —
    the oracle SQL mirrors this exact expression.  NaN (-> NULL) when
    std is NULL (n < 2) or zero."""
    with np.errstate(invalid="ignore", divide="ignore"):
        k = (sad / n) / (std * np.sqrt((n - 1.0) / n))
    return np.where(std > 0.0, k, np.nan)


def attach_beyond(features_by_tier: dict, points_ds, n_std: float, cfg: RollupConfig):
    """beyond_n_std second pass (exact by definition needs final mean/std).

    Broadcast path (rollup fits the driver): the per-bucket (mean, std)
    lookup — the SMALL side — is ray.put() once and read inside every map
    task; points stream through a partial-count map_batches and the final
    combine is a driver-side pandas merge.  Above
    ``cfg.beyond_broadcast_limit`` rows the JOIN path engages:
    ``attach_beyond_join`` (hash-partitioned Dataset.join of points against
    the stats, fully distributed)."""
    import ray.data as rd

    # pin the rollup-scale feature chains before counting: count() executes
    # the lazy chain, and the un-pinned chain would re-execute when the
    # chosen path consumes it again (lazy Datasets re-run shared upstream)
    features_by_tier = {t: f.materialize()
                        for t, f in features_by_tier.items()}
    total = sum(f.count() for f in features_by_tier.values())
    if total > cfg.beyond_broadcast_limit:
        return attach_beyond_join(features_by_tier, points_ds, n_std, cfg)
    feats_pd = {tier: ds.to_pandas() for tier, ds in features_by_tier.items()}
    out_pd = attach_beyond_pd(feats_pd, points_ds, n_std, cfg)
    return {tier: rd.from_pandas(df) for tier, df in out_pd.items()}


def attach_beyond_join(features_by_tier: dict, points_ds, n_std: float,
                       cfg: RollupConfig, num_partitions: int | None = None):
    """Scale path of the beyond pass: no driver-side materialization.

    Per tier: bucket the points, hash-join them against the (rollup-scale)
    per-bucket (mean, std) stats, count |v-mean| > n_std·std per key with a
    vectorized map-side combine, then left-join the counts back onto the
    feature table and finalize the fraction.  Two Dataset.join exchanges
    per tier, both keyed on (lang, domain, bucket_ts_us)."""

    if num_partitions is None:
        # hash-join aggregators are actors; oversubscribing CPUs deadlocks
        # small clusters, so size partitions to the cluster
        import ray

        num_partitions = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    out = {}
    for tier, feats in features_by_tier.items():
        step = TIER_STEP_US[tier]
        stats_small = feats.select_columns(
            ["lang", "domain", "bucket_ts_us", "mean", "std"])

        def _bucket(batch: pa.Table, _step=step) -> pa.Table:
            t_us = batch["t_us"].to_numpy(zero_copy_only=False)
            bucket = (t_us // _step) * _step
            return pa.table({
                "lang": batch["lang"],
                "domain": batch["domain"],
                "bucket_ts_us": pa.array(bucket, pa.int64()),
                "v": batch["v"],
            })

        pts = points_ds.map_batches(_bucket, batch_format="pyarrow",
                                    batch_size=min(262144,
                                                   cfg.points_batch_size),
                                    zero_copy_batch=True)
        joined = pts.join(stats_small, "inner", num_partitions,
                          on=("lang", "domain", "bucket_ts_us"))

        def _count(batch: pa.Table) -> pa.Table:
            from ..kernels.moments import _group_codes

            if len(batch) == 0:
                return pa.table({"lang": pa.array([], pa.string()),
                                 "domain": pa.array([], pa.string()),
                                 "bucket_ts_us": pa.array([], pa.int64()),
                                 "n_beyond": pa.array([], pa.int64()),
                                 "sum_abs_dev": pa.array([], pa.float64())})
            v = batch["v"].to_numpy(zero_copy_only=False)
            mean = batch["mean"].to_numpy(zero_copy_only=False)
            std = batch["std"].to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                absdev = np.abs(v - mean)
                beyond = (absdev > n_std * std).astype(np.int64)
            inv, first = _group_codes(
                batch, ["lang", "domain", "bucket_ts_us"])
            counts = np.bincount(inv, weights=beyond,
                                 minlength=len(first)).astype(np.int64)
            sad = np.bincount(inv, weights=absdev, minlength=len(first))
            idx = pa.array(first, pa.int64())
            return pa.table({
                "lang": batch["lang"].take(idx),
                "domain": batch["domain"].take(idx),
                "bucket_ts_us": batch["bucket_ts_us"].take(idx),
                "n_beyond": pa.array(counts, pa.int64()),
                "sum_abs_dev": pa.array(sad, pa.float64()),
            })

        partial_counts = joined.map_batches(
            _count, batch_format="pyarrow",
            batch_size=min(262144, cfg.points_batch_size))
        # merge partial counts: sorted segmented sum (no per-group dispatch)
        from ray.data.aggregate import Sum

        counts = partial_counts.groupby(
            ["lang", "domain", "bucket_ts_us"]).aggregate(
            Sum("n_beyond", alias_name="n_beyond"),
            Sum("sum_abs_dev", alias_name="sum_abs_dev"))
        merged = feats.join(counts, "left_outer", num_partitions,
                            on=("lang", "domain", "bucket_ts_us"))

        def _finalize(batch: pa.Table) -> pa.Table:
            nb = batch["n_beyond"].to_numpy(zero_copy_only=False)
            nb = np.nan_to_num(np.asarray(nb, dtype=np.float64), nan=0.0)
            sad = batch["sum_abs_dev"].to_numpy(zero_copy_only=False)
            sad = np.nan_to_num(np.asarray(sad, dtype=np.float64), nan=0.0)
            n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
            std = batch["std"].to_numpy(zero_copy_only=False)
            with np.errstate(invalid="ignore", divide="ignore"):
                frac = nb / n
                k = _stetson_k(sad, n, std)
            out_t = batch.drop_columns(["n_beyond", "sum_abs_dev"])
            out_t = out_t.append_column(
                "beyond_1_std", pa.array(frac, pa.float64()))
            return out_t.append_column(
                "stetson_k", pa.array(k, pa.float64(),
                                      mask=~np.isfinite(k)))

        out[tier] = merged.map_batches(_finalize, batch_format="pyarrow")
    return out


def attach_beyond_pd(feats_pd: dict, points_ds, n_std: float,
                     cfg: RollupConfig) -> dict:
    """Core of the beyond pass over driver-side feature frames; the points
    partial-count map stays distributed."""
    import ray

    total = sum(len(df) for df in feats_pd.values())
    if total > cfg.beyond_broadcast_limit:
        raise NotImplementedError(
            "rollup table too large for broadcast beyond-pass; "
            "switch to the Dataset.join scale path"
        )
    from ..stages.aggregate import build_beyond_lookup

    ref = ray.put(build_beyond_lookup(feats_pd))
    # smaller batches than the combine pass: the beyond scan is a cheap
    # per-row compare whose collapse ratio doesn't improve past ~256k rows,
    # while task-count (parallelism) does — 1M batches left a 31-worker
    # pool 2/3 idle on the 10M-row proxy corpus (measured +3 s)
    beyond = points_ds.map_batches(
        make_beyond_partial_fn(ref, n_std=n_std),
        batch_format="pyarrow",
        batch_size=min(262144, cfg.points_batch_size),
        zero_copy_batch=True,
    )
    # Partials are keyed (tier, rollup-row-index): the final combine is a
    # bincount per tier aligned to the feature frame — no string groupby,
    # no merge.  Partial volume is ≤ one row per (rollup row, block) — the
    # same rollup scale already driver-side for the broadcast (guarded by
    # beyond_broadcast_limit above).
    tbls = [t for t in ray.get(beyond.to_arrow_refs()) if len(t)]
    if tbls:  # all-empty partials (every point equals its bucket mean)
        parts = pa.concat_tables(tbls).combine_chunks()
        tier_arr = parts["tier"].to_numpy(zero_copy_only=False)
        idx_arr = parts["idx"].to_numpy(zero_copy_only=False)
        nb_arr = parts["n_beyond"].to_numpy(zero_copy_only=False)
        sad_arr = parts["sum_abs_dev"].to_numpy(zero_copy_only=False)
    else:
        tier_arr = np.empty(0, dtype=object)
        idx_arr = np.empty(0, dtype=np.int64)
        nb_arr = sad_arr = np.empty(0, dtype=np.float64)
    out = {}
    for tier, df in feats_pd.items():
        sel = tier_arr == tier
        nb = np.bincount(idx_arr[sel], weights=nb_arr[sel],
                         minlength=len(df))
        sad = np.bincount(idx_arr[sel], weights=sad_arr[sel],
                          minlength=len(df))
        n = df["n"].to_numpy(dtype=np.float64)
        std = df["std"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore"):
            frac = nb / n
            k = _stetson_k(sad, n, std)
        m = df.copy()
        m["beyond_1_std"] = frac
        m["stetson_k"] = np.where(np.isfinite(k), k, np.nan)
        out[tier] = m
    return out


def gapfilled(rollup_ds):
    """O7: densify each (lang, domain, tier) series over its bucket grid.

    Runs via sorted_group_map (sort + in-block apply + boundary residual)
    instead of groupby().map_groups — no per-series Ray dispatch — with
    the VECTORIZED whole-block kernel (gapfill_block_arrow: one Python
    call + O(1) numpy ops per block, not per series; parity-pinned
    against the per-group kernel), which matters when series count
    reaches web scale."""
    from ..stages.gapfill import (
        GAPFILL_SCHEMA,
        gapfill_block_arrow,
        gapfill_group_arrow,
    )
    from ..stages.sorted_groups import sorted_group_map

    return sorted_group_map(rollup_ds, SERIES_KEY, gapfill_group_arrow,
                            GAPFILL_SCHEMA, block_fn=gapfill_block_arrow)


def gorilla_series(rollup_ds, groups_whole: bool = False):
    """O8: one Gorilla blob per (lang, domain, tier) series.

    ``groups_whole=True`` (set when ``rollup_ds`` just came out of the
    gap-fill ``sorted_group_map``, whose output blocks hold only whole
    groups): skip the second sort entirely and encode per group with a
    plain map_batches — the gap-fill/Gorilla tail then pays ONE series
    exchange, not two."""
    from ..stages.gapfill import GORILLA_SCHEMA, gorilla_group_arrow
    from ..stages.sorted_groups import grouped_block_map, sorted_group_map

    if groups_whole:
        return grouped_block_map(rollup_ds, SERIES_KEY,
                                 gorilla_group_arrow, GORILLA_SCHEMA)
    return sorted_group_map(rollup_ds, SERIES_KEY, gorilla_group_arrow,
                            GORILLA_SCHEMA)


def _skew_metrics_pd(df) -> dict:
    """Per-partition skew metrics (north rule): point share of the hottest
    domains, from a frame with (domain, n)."""
    if len(df) == 0:
        return {"n_domains": 0, "top_domain_share": 0.0,
                "top5_domain_share": 0.0}
    per = df.groupby("domain", sort=False)["n"].sum().sort_values(
        ascending=False)
    total = float(per.sum()) or 1.0
    return {
        "n_domains": int(per.size),
        "top_domain_share": round(float(per.iloc[0]) / total, 6),
        "top5_domain_share": round(float(per.head(5).sum()) / total, 6),
    }


def _build_metrics(cfg: RollupConfig, phases: dict, rows: dict,
                   skew: dict) -> dict:
    """O12 stage metrics: rows in/out per stage, throughput, skew share.
    Returned with the result and persisted next to the sink output."""
    pts = rows.get("points", 0)
    m = {
        "rows": rows,
        "phase_wall_s": {k: v for k, v in phases.items()
                        if isinstance(v, (int, float))},
        "points_per_s": round(pts / phases["points"], 1)
        if phases.get("points") else None,
        "reduction_points_to_rollup": round(
            pts / rows["rollup"], 1) if rows.get("rollup") else None,
        "skew": skew,
        "tail_mode": phases.get("tail_mode", "distributed"),
    }
    return m


def _persist_metrics(out_dir: str | None, metrics: dict) -> None:
    if not out_dir:
        return
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=1, sort_keys=True)


def _empty_result(cfg: RollupConfig, phases: dict, t0: float) -> dict:
    """Zero valid input points: a well-typed empty result (the gap-filled
    rollup schema, which is a superset of the plain one)."""
    import ray.data as rd

    from ..stages.gapfill import GAPFILL_SCHEMA, GORILLA_SCHEMA

    rollup = rd.from_arrow(GAPFILL_SCHEMA.empty_table())
    series = (rd.from_arrow(GORILLA_SCHEMA.empty_table())
              if cfg.gorilla else None)
    metrics = _build_metrics(
        cfg, phases, rows={"points": 0, "fine_stats": 0, "rollup": 0,
                           "series": 0},
        skew=_skew_metrics_pd(pd.DataFrame(columns=["domain", "n"])))
    _persist_metrics(cfg.out_dir, metrics)
    return {"rollup": rollup, "series": series,
            "wall_time_s": time.monotonic() - t0, "phases": phases,
            "metrics": metrics, "out": None}


def _small_tail(cfg: RollupConfig, fine_tbl: pa.Table, points,
                ordered: list, phases: dict, t0: float) -> dict:
    """Adaptive in-process tail (cfg.small_rollup_limit): cascade,
    finalize, beyond, gap-fill and Gorilla run vectorized on the driver
    with the SAME kernels as the distributed tail — the merged rollup is
    orders of magnitude smaller than the input, and six sub-second
    distributed stages otherwise cost ~7 s of pure scheduling.  The
    distributed tail (forced with small_rollup_limit=0) is pinned equal by
    tests/test_rollup.py.  ``fine_tbl``: the merged fine-tier stats,
    already driver-side."""
    import ray.data as rd

    from ..stages.aggregate import driver_merge_states

    t1 = time.monotonic()
    fine = ordered[0]
    stats_tbl = {fine: fine_tbl}
    for tier in ordered[1:]:
        shifted = shift_stats(fine_tbl, TIER_STEP_US[tier])
        stats_tbl[tier] = driver_merge_states(shifted)
    feats_pd = {tier: finalize_stats_batch(tbl, tier).to_pandas()
                for tier, tbl in stats_tbl.items()}
    phases["tier_stats"] = round(time.monotonic() - t1, 3)
    t1 = time.monotonic()
    if cfg.compute_beyond:
        feats_pd = attach_beyond_pd(feats_pd, points, cfg.n_std, cfg)
        phases["beyond"] = round(time.monotonic() - t1, 3)
    else:
        for df in feats_pd.values():
            # both beyond-pass outputs are absent when the pass is skipped
            df["beyond_1_std"] = np.nan
            df["stetson_k"] = np.nan
    rollup_df = pd.concat([feats_pd[t] for t in cfg.tiers],
                          ignore_index=True)

    def _per_series(df: pd.DataFrame, group_fn) -> pd.DataFrame:
        # driver-side run-sliced apply: one stable sort + contiguous-run
        # slices through the NUMPY group kernels — replaces pandas
        # groupby.apply (a per-group merge + frame construction that
        # dominated the driver tail at high series counts)
        from ..kernels.moments import _group_codes
        from ..stages.sorted_groups import _runs

        tbl = pa.Table.from_pandas(df, preserve_index=False)
        inv, _ = _group_codes(tbl, SERIES_KEY)
        order = np.argsort(inv, kind="stable")
        tbl = tbl.take(pa.array(order, pa.int64())).combine_chunks()
        starts, ends = _runs(tbl, SERIES_KEY)
        outs = [group_fn(tbl.slice(s, e - s))
                for s, e in zip(starts, ends)]
        return pa.concat_tables(outs).to_pandas()

    t1 = time.monotonic()
    if cfg.gapfill:
        from ..stages.gapfill import gapfill_group_arrow

        rollup_df = _per_series(rollup_df, gapfill_group_arrow)
    phases["gapfill"] = round(time.monotonic() - t1, 3)
    t1 = time.monotonic()
    series_df = None
    if cfg.gorilla:
        from ..stages.gapfill import gorilla_group_arrow

        series_df = _per_series(rollup_df, gorilla_group_arrow)
    phases["gorilla"] = round(time.monotonic() - t1, 3)
    phases["tail_mode"] = "driver"
    rollup = rd.from_pandas(rollup_df)
    series = rd.from_pandas(series_df) if series_df is not None else None
    out_paths = None
    if cfg.out_dir:
        rollup_dir = f"{cfg.out_dir}/rollup"
        rollup.write_parquet(rollup_dir, partition_cols=["tier"])
        out_paths = {"rollup": rollup_dir}
        if series is not None:
            series_dir = f"{cfg.out_dir}/series"
            series.write_parquet(series_dir, partition_cols=["tier"])
            out_paths["series"] = series_dir
    # point count derives from the merged fine states (sum of the packed
    # state's n component): every point lands in exactly one fine bucket,
    # and fine_tbl is already in hand — points.count() would re-execute the
    # read/extract chain when compute_beyond=False left it lazy.
    from ..kernels.moments import N_, state_matrix

    n_points = int(state_matrix(fine_tbl["state"])[:, N_].sum()) \
        if len(fine_tbl) else 0
    metrics = _build_metrics(
        cfg, phases,
        rows={"points": n_points,
              "fine_stats": len(fine_tbl),
              "rollup": len(rollup_df),
              "series": len(series_df) if series_df is not None else 0},
        skew=_skew_metrics_pd(rollup_df[rollup_df.tier == ordered[0]]
                              [["domain", "n"]]))
    try:
        metrics["ray_data_stats"] = {"points": points.stats()}
    except Exception:
        pass
    _persist_metrics(cfg.out_dir, metrics)
    return {
        "rollup": rollup,
        "series": series,
        "wall_time_s": time.monotonic() - t0,
        "phases": phases,
        "metrics": metrics,
        "out": out_paths,
    }


def run_rollup(cfg: RollupConfig) -> dict:
    """Full pipeline; returns {'rollup': Dataset, 'series': Dataset|None,
    'wall_time_s': float, 'out': paths|None}."""
    t0 = time.monotonic()
    phases = {}
    points = points_dataset(cfg)
    if cfg.compute_beyond and not cfg.partials_paths:
        # points are consumed by two passes (stats + beyond); materialize the
        # compact points table so extraction/projection run once.  At cluster
        # scale this would be a parquet checkpoint (state/manifest.py); in
        # object-store terms points are ~1000x smaller than raw pages.
        # With a partials checkpoint the stats pass is already done, so
        # points stay a lazy parquet read consumed only by the beyond pass
        # (re-reading the points checkpoint beats pinning it in the store).
        points = points.materialize()
    phases["points"] = round(time.monotonic() - t0, 3)
    hot = None
    if cfg.salt_hot_domains and not cfg.partials_paths:
        from ..stages.aggregate import detect_hot_domains

        hot = detect_hot_domains(points)
    # fine-tier partials + merge: THE distributed all-to-all, always
    ordered = sorted(cfg.tiers, key=lambda t: TIER_STEP_US[t])
    fine = ordered[0]
    t1 = time.monotonic()
    # Combine batch sizing: points_batch_size is the collapse-ratio CAP;
    # when the materialized point count is known (count() is metadata-only
    # there), shrink batches so the combine pass fans out to one wave
    # across the pool — a fixed 1M batch ran ~10 tasks on 10M points and
    # left a 31-slot pool two-thirds idle (fine_merge barely scaled 8->32).
    # More tasks do multiply partial rows when every shard spans the full
    # time range (partials ≈ tasks × keys), but the k-way reduceat merge
    # clears ~6M rows/s single-threaded, so one-wave parallelism wins.
    if cfg.partials_paths:
        # resume fast path: fine-tier partial states were checkpointed per
        # shard (pipelines/resume) — merge them directly, skipping the
        # points-scale partial scan
        import ray.data as rd

        fine_partials = rd.read_parquet(
            list(cfg.partials_paths)).materialize()
    else:
        combine_bs = cfg.points_batch_size
        if cfg.compute_beyond:  # materialized above
            import ray as _ray

            slots = max(2, int(_ray.cluster_resources().get("CPU", 8)) - 1)
            combine_bs = int(max(65536, min(
                cfg.points_batch_size,
                -(-points.count() // slots))))
        fine_partials = points.map_batches(
            make_partial_stats_fn(TIER_STEP_US[fine], hot_domains=hot,
                                  n_salt=cfg.n_salt),
            batch_format="pyarrow", batch_size=combine_bs,
            zero_copy_batch=True,
        ).materialize()
    # Adaptive merge: the map-side combine already collapsed each batch to
    # ≤ |keys| rows, so the partial table is blocks × keys — usually 10³-
    # 10⁴× smaller than points.  Under driver_merge_limit rows the
    # distributed sort (fixed ~3 s of sampling + 2-stage exchange) costs
    # more than pulling the slim partials and running the SAME vectorized
    # segmented Pébay kernel in-process; above it (real cluster scale) the
    # sort-merge path runs.  Salted partials skip the driver path only
    # because salting implies a scale where it would never apply.
    import ray

    n_partials = fine_partials.count()
    if n_partials == 0:
        phases["fine_merge"] = round(time.monotonic() - t1, 3)
        return _empty_result(cfg, phases, t0)
    if not hot and 0 < n_partials <= cfg.driver_merge_limit:
        from ..stages.aggregate import driver_merge_states

        if n_partials > 262144:
            # distributed pre-merge: collapse the ~slots partial blocks to
            # ≤8 key-complete states in parallel (same kernel, warm
            # workers) so the driver's serial final merge touches 8×keys
            # rows, not tasks×keys — the cold driver-side merge of >1M
            # partial rows was ~2-3 s of the fine_merge phase at 10M pages
            fine_partials = fine_partials.map_batches(
                driver_merge_states, batch_format="pyarrow",
                batch_size=-(-n_partials // 8), zero_copy_batch=True,
            ).materialize()
        tables = [t for t in ray.get(fine_partials.to_arrow_refs())
                  if len(t)]
        fine_tbl = driver_merge_states(
            pa.concat_tables(tables).combine_chunks())
        phases["fine_merge"] = round(time.monotonic() - t1, 3)
        if len(fine_tbl) <= cfg.small_rollup_limit:
            return _small_tail(cfg, fine_tbl, points, ordered, phases, t0)
        import ray.data as rd

        fine_stats = rd.from_arrow(fine_tbl).materialize()
    else:
        fine_stats = merge_partials(
            fine_partials, salted=bool(hot)).materialize()
        phases["fine_merge"] = round(time.monotonic() - t1, 3)
        n_fine = fine_stats.count()
        if 0 < n_fine <= cfg.small_rollup_limit:
            tables = [t for t in ray.get(fine_stats.to_arrow_refs())
                      if len(t)]
            fine_tbl = pa.concat_tables(tables).combine_chunks()
            return _small_tail(cfg, fine_tbl, points, ordered, phases, t0)

    # distributed tail: cascade + finalize + beyond + gapfill + gorilla
    t1 = time.monotonic()
    stats = {fine: fine_stats}
    for tier in ordered[1:]:
        step = TIER_STEP_US[tier]

        def _shift(batch: pa.Table, _step=step) -> pa.Table:
            return shift_stats(batch, _step)

        shifted = fine_stats.map_batches(
            _shift, batch_format="pyarrow", zero_copy_batch=True)
        stats[tier] = merge_partials(shifted)
    phases["tier_stats"] = round(time.monotonic() - t1, 3)
    features = finalize_tiers(stats)
    t1 = time.monotonic()
    if cfg.compute_beyond:
        features = attach_beyond(features, points, cfg.n_std, cfg)
        phases["beyond"] = round(time.monotonic() - t1, 3)
    else:
        import ray.data as rd

        def _null_beyond_cols(b: pa.Table) -> pa.Table:
            # both beyond-pass outputs are absent when the pass is skipped
            nulls = pa.array([None] * len(b), pa.float64())
            return b.append_column("beyond_1_std", nulls) \
                    .append_column("stetson_k", nulls)

        features = {
            tier: ds.map_batches(_null_beyond_cols, batch_format="pyarrow")
            for tier, ds in features.items()
        }
    rollup = features[cfg.tiers[0]]
    for tier in cfg.tiers[1:]:
        rollup = rollup.union(features[tier])
    t1 = time.monotonic()
    if cfg.gapfill:
        rollup = gapfilled(rollup)
    if cfg.gorilla or cfg.out_dir:
        # two+ consumers (series branch / parquet sink / caller) — pin the
        # rollup-scale result so the gap-fill chain executes once, not per
        # consumer (lazy Datasets re-execute shared upstream otherwise)
        rollup = rollup.materialize()
    phases["gapfill"] = round(time.monotonic() - t1, 3)
    t1 = time.monotonic()
    series = (gorilla_series(rollup, groups_whole=cfg.gapfill)
              .materialize() if cfg.gorilla else None)
    phases["gorilla"] = round(time.monotonic() - t1, 3)

    out_paths = None
    if cfg.out_dir:
        rollup_dir = f"{cfg.out_dir}/rollup"
        rollup.write_parquet(rollup_dir, partition_cols=["tier"])
        out_paths = {"rollup": rollup_dir}
        if series is not None:
            series_dir = f"{cfg.out_dir}/series"
            series.write_parquet(series_dir, partition_cols=["tier"])
            out_paths["series"] = series_dir
    # O12 metrics: counts only touch PINNED datasets (points, fine_stats,
    # and rollup when materialized above) — never re-execute a lazy chain.
    # point count = sum of per-bucket n over the MATERIALIZED fine states —
    # points.count() would re-run the read/extract chain when
    # compute_beyond=False left points lazy (every point is in exactly one
    # fine bucket, so the sums agree by construction).
    def _state_nsum(batch: pa.Table) -> pa.Table:
        from ..kernels.moments import N_, state_matrix

        tot = float(state_matrix(batch["state"])[:, N_].sum()) \
            if len(batch) else 0.0
        return pa.table({"pn": pa.array([tot], pa.float64())})

    rows = {"points": int(fine_stats.map_batches(
                _state_nsum, batch_format="pyarrow").sum("pn") or 0),
            "fine_stats": fine_stats.count()}
    skew = {}
    if cfg.gorilla or cfg.out_dir:  # rollup is materialized
        rows["rollup"] = rollup.count()
        rows["series"] = series.count() if series is not None else 0

        def _dom_n(batch: pa.Table) -> pa.Table:
            from ..kernels.moments import _group_codes

            if len(batch) == 0:
                return pa.table({"domain": pa.array([], pa.string()),
                                 "n": pa.array([], pa.int64())})
            inv, first = _group_codes(batch, ["domain"])
            n = batch["n"].to_numpy(zero_copy_only=False)
            sums = np.bincount(inv, weights=n,
                               minlength=len(first)).astype(np.int64)
            return pa.table({
                "domain": batch["domain"].take(pa.array(first, pa.int64())),
                "n": pa.array(sums, pa.int64())})

        per_dom = rollup.map_batches(
            _dom_n, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
        skew = _skew_metrics_pd(per_dom)
    metrics = _build_metrics(cfg, phases, rows=rows, skew=skew)
    # Ray Data's own per-operator stats (wall / cpu / rows / object-store
    # bytes per stage) for the pinned datasets — the O12 "per-stage
    # metrics" surface in Ray-native form
    try:
        metrics["ray_data_stats"] = {"points": points.stats()}
        if cfg.gorilla or cfg.out_dir:
            metrics["ray_data_stats"]["rollup"] = rollup.stats()
    except Exception:
        pass
    _persist_metrics(cfg.out_dir, metrics)
    return {
        "rollup": rollup,
        "series": series,
        "wall_time_s": time.monotonic() - t0,
        "phases": phases,
        "metrics": metrics,
        "out": out_paths,
    }
