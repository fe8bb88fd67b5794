"""Grouped feature aggregation (SURVEY §2b-O6) as map-side partials + a
mergeable shuffle-side reduce.

Scale design: a bare ``groupby().aggregate()`` shuffles every point row.
Here every block first collapses to one row per (lang, domain, bucket) via
vectorized segmented reduction (kernels/moments.point_stats_arrow), so the
all-to-all exchange moves partial-stat rows (≤ one per key per block).  The
shuffle-side merge is Ray's built-in vectorized Sum/Min/Max for the plain
sums plus ONE custom mergeable aggregate — ``MomentMerge``, the streaming
Welford/Pébay central-moment combiner (north_star: "streaming
Welford/moment accumulators") — for (n, mean, M2, M3, M4), packed into a
single fixed_size_list<double,5> ``mstate`` column.  Central-moment form is
a correctness requirement, not a style choice: raw power sums cancel
catastrophically when |mean| >> std (see kernels/moments.py docstring).

This map-side combine is also the skew mitigation: a Zipf-hot domain
contributes at most #blocks partial rows to its key, never #points, so no
explicit salting is needed on this path (SURVEY §4; documented hot-key
bound).

Tier cascade (1h -> 1d -> 30d): coarser tiers re-bucket the *hourly
partials*, not the raw points — moment states and sums merge unchanged, and
the time-shifted OLS terms are re-based from hour start to the coarser
bucket start with exact algebra (``shift_stats``), so raw points shuffle
once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.moments import (
    POINT_STAT_COLUMNS,
    finalize_features,
    merge_moments_pair,
    merge_moments_rows,
    pack_mstate,
    point_stats_arrow,
    unpack_mstate,
)

KEY_COLS = ["lang", "domain", "bucket_ts_us"]

# Columns finalized to NULL (not NaN) when undefined, so Arrow/parquet/DuckDB
# NULL semantics line up between engine output and oracle SQL.
_NULLABLE_FEATURES = ("wmean", "std", "skew", "kurtosis", "linear_trend_slope")

# plain-sum / min / max partial columns (cancellation-free, built-in merge)
_SUM_COLS = ("sum_w", "sum_wv", "st1", "st2", "stv")


def make_partial_stats_fn(step_us: int):
    """map_batches fn: points block -> per-(lang,domain,bucket) partials
    with the moment state packed for the custom merge."""

    def partial_stats(batch: pa.Table) -> pa.Table:
        # exact int64 floor-to-bucket (kernels/grid.bucket_floor semantics);
        # float division would misround near bucket boundaries at epoch-µs
        # magnitudes, so this stays in integer arithmetic
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        bucket = (t_us // step_us) * step_us
        batch = batch.append_column("bucket_ts_us", pa.array(bucket, pa.int64()))
        stats = point_stats_arrow(batch, KEY_COLS, bucket_col="bucket_ts_us")
        return pack_mstate(stats)

    return partial_stats


class MomentMerge:
    """Ray AggregateFnV2: Pébay merge of packed (n, mean, M2, M3, M4).

    One Python-level merge per (group, block) — the partial rows are already
    one-per-key-per-block, so this is rollup-scale work, never point-scale.
    """

    def __new__(cls, on: str = "mstate", alias_name: str = "mstate"):
        from ray.data.aggregate import AggregateFnV2
        from ray.data.block import BlockAccessor

        class _MomentMerge(AggregateFnV2):
            def __init__(self):
                super().__init__(
                    alias_name,
                    zero_factory=lambda: (0.0, 0.0, 0.0, 0.0, 0.0),
                    on=on,
                    ignore_nulls=True,
                )

            def aggregate_block(self, block):
                tbl = BlockAccessor.for_block(block).to_arrow()
                col = tbl[on]
                if isinstance(col, pa.ChunkedArray):
                    col = col.combine_chunks()
                mat = np.asarray(col.to_pylist(), dtype=np.float64)
                if mat.size == 0:
                    return (0.0, 0.0, 0.0, 0.0, 0.0)
                return merge_moments_rows(mat.reshape(-1, 5))

            def combine(self, current, new):
                return merge_moments_pair(tuple(current), tuple(new))

            def finalize(self, acc):
                return list(acc)

        return _MomentMerge()


def merge_partials(ds):
    """Shuffle-side merge: groupby key; built-in Sum/Min/Max for plain
    sums, MomentMerge for the packed central-moment state."""
    from ray.data.aggregate import Max, Min, Sum

    aggs = [Sum("n", alias_name="n")]
    for col in _SUM_COLS:
        aggs.append(Sum(col, alias_name=col))
    aggs.append(Min("vmin", alias_name="vmin"))
    aggs.append(Max("vmax", alias_name="vmax"))
    aggs.append(MomentMerge())
    return ds.groupby(KEY_COLS).aggregate(*aggs)


def shift_stats(batch: pa.Table, to_step_us: int) -> pa.Table:
    """Re-bucket merged stats to a coarser tier.

    Fine-bucket time sums are relative to the fine bucket start; re-base to
    the coarse start with c = (fine_start - coarse_start)/1e6 s:
        st1' = st1 + n·c,  st2' = st2 + 2c·st1 + n·c²,  stv' = stv + c·s1
    (s1 = n·mean).  The value-moment state is shift-invariant.  Exact
    algebra — cascading 1h -> 1d -> 30d merges the same accumulators as
    bucketing the raw points directly (test_rollup.py pins this).
    """
    fine = batch["bucket_ts_us"].to_numpy(zero_copy_only=False)
    coarse = (fine // to_step_us) * to_step_us
    c = (fine - coarse) / 1e6
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    st1 = batch["st1"].to_numpy(zero_copy_only=False)
    st2 = batch["st2"].to_numpy(zero_copy_only=False)
    stv = batch["stv"].to_numpy(zero_copy_only=False)
    mstate = batch["mstate"]
    if isinstance(mstate, pa.ChunkedArray):
        mstate = mstate.combine_chunks()
    mean = np.asarray(mstate.to_pylist(), dtype=np.float64).reshape(-1, 5)[:, 1]
    s1 = mean * n
    out = {name: batch[name] for name in batch.column_names}
    out["bucket_ts_us"] = pa.array(coarse, pa.int64())
    out["st1"] = pa.array(st1 + n * c, pa.float64())
    out["st2"] = pa.array(st2 + 2.0 * c * st1 + n * c * c, pa.float64())
    out["stv"] = pa.array(stv + c * s1, pa.float64())
    return pa.table(out)


def finalize_stats_batch(batch: pa.Table, tier: str) -> pa.Table:
    """Merged stats -> feature columns (+ tier tag); NaN -> Arrow null."""
    batch = unpack_mstate(batch)
    stats = {c: batch[c].to_numpy(zero_copy_only=False)
             for c in POINT_STAT_COLUMNS}
    feats = finalize_features(stats)
    cols = {
        "lang": batch["lang"],
        "domain": batch["domain"],
        "tier": pa.array([tier] * len(batch), pa.string()),
        "bucket_ts_us": batch["bucket_ts_us"],
    }
    for name, arr in feats.items():
        if name in _NULLABLE_FEATURES:
            mask = ~np.isfinite(arr)
            cols[name] = pa.array(arr, pa.float64(), mask=mask)
        elif name == "n":
            cols[name] = pa.array(arr, pa.int64())
        else:
            cols[name] = pa.array(arr, pa.float64())
    return pa.table(cols)


def make_beyond_partial_fn(stats_by_tier_ref, n_std: float = 1.0):
    """map_batches fn for the beyond_1_std second pass (SURVEY §2b-O6).

    ``stats_by_tier_ref``: ray.ObjectRef of {tier: pandas DataFrame with
    (lang, domain, bucket_ts_us, mean, std)} — the small side, broadcast via
    ray.put once and read zero-copy in every task (never re-shipped per
    batch).  Emits partial beyond-counts per (lang, domain, tier, bucket);
    the follow-up groupby sums them.  Uses the final per-bucket mean/std, so
    the fraction is exact (not streamable in one pass by definition).
    """
    from ..kernels.grid import TIER_STEP_US

    def beyond_partials(batch: pa.Table) -> pa.Table:
        import pandas as pd
        import ray

        stats_by_tier = ray.get(stats_by_tier_ref)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        domain = batch["domain"].to_numpy(zero_copy_only=False)
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)

        outs = []
        for tier, stats_df in stats_by_tier.items():
            step = TIER_STEP_US[tier]
            bucket = (t_us // step) * step
            df = pd.DataFrame(
                {"lang": lang, "domain": domain, "bucket_ts_us": bucket, "v": v}
            )
            m = df.merge(stats_df, on=["lang", "domain", "bucket_ts_us"], how="left")
            beyond = (
                (np.abs(m["v"].to_numpy() - m["mean"].to_numpy())
                 > n_std * m["std"].to_numpy())
                .astype(np.int64)
            )
            df["n_beyond"] = beyond  # NaN std (n<2) compares False -> 0
            g = (
                df.groupby(["lang", "domain", "bucket_ts_us"], sort=False)["n_beyond"]
                .sum()
                .reset_index()
            )
            g.insert(2, "tier", tier)
            outs.append(pa.Table.from_pandas(g, preserve_index=False))
        return pa.concat_tables(outs)

    return beyond_partials
