"""Gap-fill + Gorilla stages (SURVEY §2b-O7/O8).

Second, much smaller shuffle: after aggregation the rollup table is ~10^3-10^4x
smaller than the input, and it re-groups WITHOUT bucket_ts so each group is
one whole (lang, domain, tier) series.  Inside the group:

1. co-sort buckets by time (R1 semantics — kernels/cosort, stable);
2. build the full tier grid, endpoints inclusive (R3 linspace contract —
   kernels/grid.bucket_grid);
3. linearly interpolate the per-bucket ``mean`` onto missing buckets with the
   reference-exact kernel (R5 — kernels/interp.interpolate); rows synthesized
   this way carry filled=true, n=0 and NULL for the other features;
4. Gorilla-encode the dense (bucket_ts, mean) stream into one binary blob
   per series (kernels/gorilla).

Gap-fill fills *interior* gaps; the grid spans first..last observed bucket,
so the reference's left/right constant fills never fire on this path (they
are exercised by the standalone interpolate query, SURVEY §2b-O15).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..kernels.cosort import argsort_time
from ..kernels.gorilla import gorilla_encode
from ..kernels.grid import TIER_STEP_US, bucket_grid
from ..kernels.interp import interpolate

ROLLUP_FEATURES = [
    "n", "mean", "wmean", "std", "skew", "kurtosis", "amplitude",
    "beyond_1_std", "linear_trend_slope", "linear_trend_sigma",
    "mean_variance",
    "reduced_chi2", "excess_variance", "stetson_k",
]

import pyarrow as pa

GAPFILL_SCHEMA = pa.schema(
    [("lang", pa.string()), ("domain", pa.string()), ("tier", pa.string()),
     ("bucket_ts_us", pa.int64()), ("n", pa.int64())]
    + [(c, pa.float64()) for c in ROLLUP_FEATURES if c != "n"]
    + [("filled", pa.bool_())]
)

GORILLA_SCHEMA = pa.schema([
    ("lang", pa.string()), ("domain", pa.string()), ("tier", pa.string()),
    ("n_buckets", pa.int64()), ("n_filled", pa.int64()),
    ("points_gorilla", pa.binary()),
])


def _f64(arr: np.ndarray) -> pa.Array:
    """float64 numpy -> Arrow with NaN mapped to NULL (schema parity with
    the pandas path, where NaN became null via from_pandas)."""
    return pa.array(arr, pa.float64(), mask=~np.isfinite(arr))


def gapfill_group_arrow(group: pa.Table) -> pa.Table:
    """Numpy-native per-group gap-fill for sorted_group_map — no pandas
    round-trip per series (per-group overhead matters at web-scale series
    counts; pinned equal to the pandas kernel by tests/test_rollup.py)."""
    tier = group["tier"][0].as_py()
    step = TIER_STEP_US[tier]
    ts = group["bucket_ts_us"].to_numpy(zero_copy_only=False)
    order = argsort_time(ts)
    have = ts[order]
    grid = bucket_grid(have[0], have[-1], step)
    n_out = grid.size
    feats = {c: group[c].to_numpy(zero_copy_only=False).astype(
        np.float64)[order] for c in ROLLUP_FEATURES if c != "n"}
    n_col = group["n"].to_numpy(zero_copy_only=False).astype(np.int64)[order]
    if n_out == have.size:  # dense already
        filled = np.zeros(n_out, dtype=bool)
        out_ts, out_n = have, n_col
        out_feats = feats
    else:
        pos = ((have - grid[0]) // step).astype(np.int64)
        out_feats = {}
        for c, v in feats.items():
            full = np.full(n_out, np.nan)
            full[pos] = v
            out_feats[c] = full
        out_n = np.zeros(n_out, dtype=np.int64)
        out_n[pos] = n_col
        filled = np.ones(n_out, dtype=bool)
        filled[pos] = False
        mean_on_grid = interpolate(
            have.astype(np.float64), feats["mean"],
            grid.astype(np.float64), left=np.nan, right=np.nan)
        out_feats["mean"] = np.where(filled, mean_on_grid,
                                     out_feats["mean"])
        out_ts = grid
    cols = {
        "lang": pa.array([group["lang"][0].as_py()] * n_out, pa.string()),
        "domain": pa.array([group["domain"][0].as_py()] * n_out,
                           pa.string()),
        "tier": pa.array([tier] * n_out, pa.string()),
        "bucket_ts_us": pa.array(out_ts, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
    }
    for c in ROLLUP_FEATURES:
        if c != "n":
            cols[c] = _f64(out_feats[c])
    cols["filled"] = pa.array(filled, pa.bool_())
    return pa.table(cols).cast(GAPFILL_SCHEMA)


def gapfill_block_arrow(batch: pa.Table) -> pa.Table:
    """ALL series of a key-sorted block in ONE vectorized pass — the
    block_fn form of gapfill_group_arrow for sorted_group_map.

    At web-scale series counts the per-series dispatch (one Python call +
    ~15 numpy ops per series) dominates gap-fill wall; here the whole
    block is processed with O(1) numpy calls: one lexsort by (series,
    ts), cumsum run offsets, one scatter per feature, and the linear
    interpolation of ``mean`` at every filled position of every series at
    once via prefix/suffix max/min present-index propagation (each run's
    first and last grid point is present by construction, so propagation
    never crosses a series boundary).  Numerically IDENTICAL to the
    per-group kernel: same grid arithmetic (kernels/grid.bucket_grid
    floor semantics), same interpolation formula and operand order as
    kernels/interp.interpolate's interior branch (pinned by
    tests/test_rollup.py parity test)."""
    from ..kernels.moments import _group_codes

    n = len(batch)
    if n == 0:
        return GAPFILL_SCHEMA.empty_table()
    inv, _first = _group_codes(batch, ["lang", "domain", "tier"])
    ts_all = batch["bucket_ts_us"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ts_all, inv))
    inv_s, ts_s = inv[order], ts_all[order]
    changed = np.empty(n, dtype=bool)
    changed[0] = True
    changed[1:] = inv_s[1:] != inv_s[:-1]
    starts = np.nonzero(changed)[0]
    ends = np.append(starts[1:], n)
    r = starts.size
    run_of_row = np.cumsum(changed) - 1
    first_rows = pa.array(order[starts], pa.int64())
    tiers = batch["tier"].take(first_rows).to_pylist()
    steps = np.array([TIER_STEP_US[t] for t in tiers], dtype=np.int64)
    lo = (ts_s[starts] // steps) * steps      # bucket_grid floor contract
    hi = (ts_s[ends - 1] // steps) * steps
    n_out_r = (hi - lo) // steps + 1
    off = np.zeros(r + 1, dtype=np.int64)
    np.cumsum(n_out_r, out=off[1:])
    total = int(off[-1])
    within = np.arange(total, dtype=np.int64) - np.repeat(off[:-1], n_out_r)
    out_ts = np.repeat(lo, n_out_r) + within * np.repeat(steps, n_out_r)
    pos = off[run_of_row] + (ts_s - lo[run_of_row]) // steps[run_of_row]
    # per-group parity: a DENSE run (grid size == row count) emits its
    # ORIGINAL timestamps (gapfill_group_arrow's dense shortcut), which
    # differ from the floored grid only when bucket ts are not step
    # multiples (never in production, pinned by the parity test)
    dense_rows = (n_out_r == (ends - starts))[run_of_row]
    if dense_rows.any():
        out_ts[pos[dense_rows]] = ts_s[dense_rows]
    filled = np.ones(total, dtype=bool)
    filled[pos] = False
    out_n = np.zeros(total, dtype=np.int64)
    out_n[pos] = batch["n"].to_numpy(
        zero_copy_only=False).astype(np.int64)[order]
    out_feats = {}
    for c in ROLLUP_FEATURES:
        if c == "n":
            continue
        v = batch[c].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        full = np.full(total, np.nan)
        full[pos] = v
        out_feats[c] = full
    if filled.any():
        gidx = np.arange(total, dtype=np.int64)
        prev = np.maximum.accumulate(np.where(~filled, gidx, -1))
        nxt = np.minimum.accumulate(
            np.where(~filled, gidx, total)[::-1])[::-1]
        f = filled
        # knot x = ORIGINAL present ts (what the per-group kernel passes
        # to interpolate), target x = grid ts; identical arrays when
        # buckets are step multiples
        x_knot = np.full(total, np.nan)
        x_knot[pos] = ts_s.astype(np.float64)
        xp, xn = x_knot[prev[f]], x_knot[nxt[f]]
        tt = out_ts[f].astype(np.float64)
        mean = out_feats["mean"]
        # interp.interpolate interior branch, operand-for-operand
        alpha = (xn - tt) / (xn - xp)
        mean[f] = alpha * mean[prev[f]] + (1.0 - alpha) * mean[nxt[f]]
    rep_idx = pa.array(np.repeat(order[starts], n_out_r), pa.int64())
    cols = {
        "lang": batch["lang"].take(rep_idx),
        "domain": batch["domain"].take(rep_idx),
        "tier": batch["tier"].take(rep_idx),
        "bucket_ts_us": pa.array(out_ts, pa.int64()),
        "n": pa.array(out_n, pa.int64()),
    }
    for c in ROLLUP_FEATURES:
        if c != "n":
            cols[c] = _f64(out_feats[c])
    cols["filled"] = pa.array(filled, pa.bool_())
    return pa.table(cols).cast(GAPFILL_SCHEMA)


def gorilla_group_arrow(group: pa.Table) -> pa.Table:
    """Numpy-native per-group Gorilla encode (no pandas round-trip)."""
    ts = group["bucket_ts_us"].to_numpy(zero_copy_only=False)
    order = argsort_time(ts)
    mean = group["mean"].to_numpy(zero_copy_only=False).astype(np.float64)
    blob = gorilla_encode(ts[order], mean[order])
    n_filled = 0
    if "filled" in group.column_names:
        f = group["filled"].to_numpy(zero_copy_only=False)
        n_filled = int(np.nansum(np.asarray(f, dtype=np.float64)))
    return pa.table({
        "lang": pa.array([group["lang"][0].as_py()], pa.string()),
        "domain": pa.array([group["domain"][0].as_py()], pa.string()),
        "tier": pa.array([group["tier"][0].as_py()], pa.string()),
        "n_buckets": pa.array([len(group)], pa.int64()),
        "n_filled": pa.array([n_filled], pa.int64()),
        "points_gorilla": pa.array([blob], pa.binary()),
    }).cast(GORILLA_SCHEMA)


def gapfill_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn over (lang, domain, tier): densify the bucket grid."""
    tier = g["tier"].iloc[0]
    step = TIER_STEP_US[tier]
    order = argsort_time(g["bucket_ts_us"].to_numpy())
    g = g.iloc[order]
    have = g["bucket_ts_us"].to_numpy()
    grid = bucket_grid(have[0], have[-1], step)
    if grid.size == have.size:  # dense already — same column order as below
        out = g.copy()
        out["filled"] = False
        return out[
            ["lang", "domain", "tier", "bucket_ts_us"] + ROLLUP_FEATURES + ["filled"]
        ]
    mean_on_grid = interpolate(
        have.astype(np.float64),
        g["mean"].to_numpy(),
        grid.astype(np.float64),
        left=np.nan,
        right=np.nan,  # never hit: grid spans [first, last]
    )
    dense = pd.DataFrame({"bucket_ts_us": grid})
    dense["lang"] = g["lang"].iloc[0]
    dense["domain"] = g["domain"].iloc[0]
    dense["tier"] = tier
    merged = dense.merge(g, on=["lang", "domain", "tier", "bucket_ts_us"], how="left")
    filled = merged["n"].isna().to_numpy()
    merged["filled"] = filled
    merged["mean"] = np.where(filled, mean_on_grid, merged["mean"].to_numpy())
    merged["n"] = merged["n"].fillna(0).astype(np.int64)
    return merged[
        ["lang", "domain", "tier", "bucket_ts_us"] + ROLLUP_FEATURES + ["filled"]
    ]


def gorilla_group(g: pd.DataFrame) -> pd.DataFrame:
    """map_groups fn over (lang, domain, tier): one Gorilla blob per series
    from the (gap-filled, dense) (bucket_ts, mean) stream."""
    order = argsort_time(g["bucket_ts_us"].to_numpy())
    g = g.iloc[order]
    blob = gorilla_encode(g["bucket_ts_us"].to_numpy(), g["mean"].to_numpy())
    return pd.DataFrame(
        {
            "lang": [g["lang"].iloc[0]],
            "domain": [g["domain"].iloc[0]],
            "tier": [g["tier"].iloc[0]],
            "n_buckets": [len(g)],
            "n_filled": [int(g["filled"].sum()) if "filled" in g else 0],
            "points_gorilla": [blob],
        }
    )
