"""Grouped feature aggregation (SURVEY §2b-O6) as map-side partials + a
mergeable shuffle-side reduce.

Scale design: a bare ``groupby().aggregate()`` shuffles every point row.
Here every block first collapses to one row per (lang, domain, bucket) via
vectorized segmented reduction (kernels/moments.point_stats_arrow), so the
all-to-all exchange moves partial-stat rows (≤ one per key per block), each
carrying ALL 12 sufficient statistics packed into one
fixed_size_list<double,12> ``state`` column.  The shuffle-side merge is ONE
custom mergeable aggregate — ``StateMerge``, plain sums + min/max + the
streaming Welford/Pébay central-moment combiner (north_star: "streaming
Welford/moment accumulators").  Central-moment form is a correctness
requirement, not a style choice: raw power sums cancel catastrophically
when |mean| >> std (see kernels/moments.py docstring).

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
import pyarrow.compute as pc

from ..kernels.moments import (
    N_,
    POINT_STAT_COLUMNS,
    ST1_,
    ST2_,
    STATE_WIDTH,
    STV_,
    MEAN_,
    finalize_features,
    merge_state_pair,
    merge_state_rows,
    pack_state,
    point_stats_arrow,
    state_matrix,
    unpack_state,
)

KEY_COLS = ["lang", "domain", "bucket_ts_us"]

# Columns finalized to NULL (not NaN) when undefined, so Arrow/parquet/DuckDB
# NULL semantics line up between engine output and oracle SQL.
_NULLABLE_FEATURES = ("wmean", "std", "skew", "kurtosis", "linear_trend_slope")

def make_partial_stats_fn(step_us: int):
    """map_batches fn: points block -> per-(lang,domain,bucket) partials
    with ALL sufficient statistics packed into the ``state`` column."""

    def partial_stats(batch: pa.Table) -> pa.Table:
        # exact int64 floor-to-bucket (kernels/grid.bucket_floor semantics);
        # float division would misround near bucket boundaries at epoch-µs
        # magnitudes, so this stays in integer arithmetic
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        bucket = (t_us // step_us) * step_us
        batch = batch.append_column("bucket_ts_us", pa.array(bucket, pa.int64()))
        stats = point_stats_arrow(batch, KEY_COLS, bucket_col="bucket_ts_us")
        return pack_state(stats, KEY_COLS)

    return partial_stats


class StateMerge:
    """Ray AggregateFnV2: merge the packed 12-wide sufficient-statistic
    state (plain sums + min/max + Pébay central moments) in ONE aggregate.

    A single aggregate object means one Python-level call per (group,
    block) at the shuffle merge — with ten separate aggregates the
    per-group dispatch overhead dominated the merge stage ~10x.  The
    partial rows are already one-per-key-per-block, so this is
    rollup-scale work, never point-scale.
    """

    def __new__(cls, on: str = "state", alias_name: str = "state"):
        from ray.data.aggregate import AggregateFnV2
        from ray.data.block import BlockAccessor

        zero = np.zeros(STATE_WIDTH, dtype=np.float64)

        class _StateMerge(AggregateFnV2):
            def __init__(self):
                super().__init__(
                    alias_name,
                    zero_factory=lambda: zero,
                    on=on,
                    ignore_nulls=True,
                )

            def aggregate_block(self, block):
                tbl = BlockAccessor.for_block(block).to_arrow()
                mat = state_matrix(tbl[on])
                if mat.shape[0] == 0:
                    return zero
                return merge_state_rows(mat)

            def combine(self, current, new):
                return merge_state_pair(np.asarray(current),
                                        np.asarray(new))

            def finalize(self, acc):
                return list(acc)

        return _StateMerge()


def _block_state_merge(batch: pa.Table) -> pa.Table:
    """Vectorized within-block merge: one state row per key in the block,
    plus a ``boundary`` flag on each block's first/last key (the only keys
    whose partial rows can continue into a neighboring sorted block)."""
    from ..kernels.moments import _group_codes, segmented_state_merge

    if len(batch) == 0:
        return batch.append_column("boundary", pa.array([], pa.bool_()))
    inv, _ = _group_codes(batch, KEY_COLS)
    # rows arrive key-sorted, so equal keys are contiguous; rebuild
    # positional run codes (equal inv <-> equal key) for the segmented merge
    changed = np.empty(len(batch), dtype=bool)
    changed[0] = True
    changed[1:] = inv[1:] != inv[:-1]
    order_codes = np.cumsum(changed) - 1
    mat = state_matrix(batch["state"])
    merged, codes = segmented_state_merge(mat, order_codes)
    first_rows = np.nonzero(changed)[0]
    keys = {k: pc.take(batch[k], pa.array(first_rows, pa.int64()))
            for k in KEY_COLS}
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(merged.ravel(), pa.float64()), STATE_WIDTH)
    g = len(first_rows)
    boundary = np.zeros(g, dtype=bool)
    boundary[0] = True
    boundary[-1] = True
    return pa.table({**keys, "state": state,
                     "boundary": pa.array(boundary, pa.bool_())})


def merge_partials(ds):
    """Shuffle-side merge: sort by key (the one all-to-all exchange), then
    a fully VECTORIZED segmented Pébay reduce per sorted block.

    Sorted order makes every key's partial rows contiguous, so a key that
    is not its block's first or last key is completely merged inside that
    block (exact, no cross-block traffic).  Only the ≤2 boundary keys per
    block need resolution; that residual is ~2 rows/block — collapsed in a
    single partition with the same vectorized kernel.  This avoids Ray's
    per-group Python dispatch in groupby().aggregate(), which dominated the
    merge stage ~3x at 45k groups.  (The single-partition residual merge
    holds to ~1e6-block jobs ≈ 300 MB; beyond that, repeat the sort-merge
    pass hierarchically.)
    """
    merged = ds.sort(KEY_COLS).map_batches(
        _block_state_merge, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()

    def _interior(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch["boundary"])
        return batch.filter(mask).drop_columns(["boundary"])

    def _boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["boundary"]).drop_columns(["boundary"])

    def _final_merge(batch: pa.Table) -> pa.Table:
        out = _block_state_merge(batch)
        return out.drop_columns(["boundary"])

    interior = merged.map_batches(_interior, batch_format="pyarrow",
                                  zero_copy_batch=True)
    residual = (
        merged.map_batches(_boundary, batch_format="pyarrow",
                           zero_copy_batch=True)
        .repartition(1)
        .map_batches(_final_merge, batch_format="pyarrow", batch_size=None)
    )
    return interior.union(residual)


def merge_partials_agg(ds):
    """Alternative merge via Ray groupby + the StateMerge aggregate.

    Same algebra, Ray-native topology; kept for cross-checking (tests) and
    as the fallback when inputs are not sortable."""
    return ds.groupby(KEY_COLS).aggregate(StateMerge())


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
    mat = state_matrix(batch["state"]).copy()
    n = mat[:, N_]
    st1 = mat[:, ST1_].copy()
    s1 = mat[:, MEAN_] * n
    mat[:, ST1_] = st1 + n * c
    mat[:, ST2_] = mat[:, ST2_] + 2.0 * c * st1 + n * c * c
    mat[:, STV_] = mat[:, STV_] + c * s1
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.float64()), STATE_WIDTH)
    out = {name: batch[name] for name in batch.column_names}
    out["bucket_ts_us"] = pa.array(coarse, pa.int64())
    out["state"] = state
    return pa.table(out)


def finalize_stats_batch(batch: pa.Table, tier: str) -> pa.Table:
    """Merged stats -> feature columns (+ tier tag); NaN -> Arrow null."""
    batch = unpack_state(batch)
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
