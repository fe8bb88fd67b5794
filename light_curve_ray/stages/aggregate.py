"""Grouped feature aggregation (SURVEY §2b-O6) as map-side partials + a
built-in-aggregate merge.

Scale design: a bare ``groupby().aggregate()`` shuffles every point row.
Here every block first collapses to one row per (lang, domain, bucket) via
pyarrow hash group_by (C++ kernels, kernels/moments.point_stats_arrow), so
the all-to-all exchange moves partial-stat rows (≤ one per key per block),
then Ray's built-in vectorized Sum/Min/Max aggregates merge them — the
sufficient statistics are plain sums by construction (kernels/moments.py).
This map-side combine is also the skew mitigation: a Zipf-hot domain
contributes at most #blocks partial rows to its key, never #points, so no
explicit salting is needed on this path (SURVEY §4: partial aggregation
happens map-side; documented hot-key bound).

Tier cascade (1h -> 1d -> 30d): coarser tiers re-bucket the *hourly partial
stats*, not the raw points — sums/min/max merge unchanged, and the
time-shifted OLS terms are re-based from hour start to the coarser bucket
start with exact algebra (``shift_stats``), so raw points shuffle once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.grid import TIER_STEP_US
from ..kernels.moments import POINT_STAT_COLUMNS, finalize_features, point_stats_arrow

KEY_COLS = ["lang", "domain", "bucket_ts_us"]

# Columns finalized to NULL (not NaN) when undefined, so Arrow/parquet/DuckDB
# NULL semantics line up between engine output and oracle SQL.
_NULLABLE_FEATURES = ("wmean", "std", "skew", "kurtosis", "linear_trend_slope")


def make_partial_stats_fn(step_us: int):
    """map_batches fn: points block -> per-(lang,domain,bucket) partials."""

    def partial_stats(batch: pa.Table) -> pa.Table:
        # exact int64 floor-to-bucket (kernels/grid.bucket_floor semantics);
        # float division would misround near bucket boundaries at epoch-µs
        # magnitudes, so this stays in integer arithmetic
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        bucket = (t_us // step_us) * step_us
        batch = batch.append_column("bucket_ts_us", pa.array(bucket, pa.int64()))
        return point_stats_arrow(batch, KEY_COLS, bucket_col="bucket_ts_us")

    return partial_stats


def merge_partials(ds):
    """Shuffle-side merge: groupby key, plain Sum / Min / Max per stat."""
    from ray.data.aggregate import Max, Min, Sum

    aggs = []
    for col in POINT_STAT_COLUMNS:
        if col == "vmin":
            aggs.append(Min(col, alias_name=col))
        elif col == "vmax":
            aggs.append(Max(col, alias_name=col))
        else:
            aggs.append(Sum(col, alias_name=col))
    return ds.groupby(KEY_COLS).aggregate(*aggs)


def shift_stats(batch: pa.Table, to_step_us: int) -> pa.Table:
    """Re-bucket merged stats to a coarser tier.

    Fine-bucket time sums are relative to the fine bucket start; re-base to
    the coarse start with c = (fine_start - coarse_start)/1e6 s:
        st1' = st1 + n·c,  st2' = st2 + 2c·st1 + n·c²,  stv' = stv + c·s1.
    Exact algebra — cascading 1h -> 1d -> 30d gives the same sums as
    bucketing the raw points directly (test_rollup.py pins this).
    """
    fine = batch["bucket_ts_us"].to_numpy(zero_copy_only=False)
    coarse = (fine // to_step_us) * to_step_us
    c = (fine - coarse) / 1e6
    n = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    st1 = batch["st1"].to_numpy(zero_copy_only=False)
    st2 = batch["st2"].to_numpy(zero_copy_only=False)
    stv = batch["stv"].to_numpy(zero_copy_only=False)
    s1 = batch["s1"].to_numpy(zero_copy_only=False)
    out = {name: batch[name] for name in batch.column_names}
    out["bucket_ts_us"] = pa.array(coarse, pa.int64())
    out["st1"] = pa.array(st1 + n * c, pa.float64())
    out["st2"] = pa.array(st2 + 2.0 * c * st1 + n * c * c, pa.float64())
    out["stv"] = pa.array(stv + c * s1, pa.float64())
    return pa.table(out)


def finalize_stats_batch(batch: pa.Table, tier: str) -> pa.Table:
    """Merged stats -> feature columns (+ tier tag); NaN -> Arrow null."""
    stats = {c: batch[c].to_numpy(zero_copy_only=False) for c in POINT_STAT_COLUMNS}
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
    import pandas as _pd  # noqa: F401 (documents the pandas dependency)

    def beyond_partials(batch: pa.Table) -> pa.Table:
        import ray

        stats_by_tier = ray.get(stats_by_tier_ref)
        lang = batch["lang"].to_numpy(zero_copy_only=False)
        domain = batch["domain"].to_numpy(zero_copy_only=False)
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)
        import pandas as pd

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
