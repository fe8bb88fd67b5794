"""Mergeable per-bucket sufficient statistics -> light-curve-style features.

The reference computes whole-series features in memory (the light-curve-feature
extractor family pointed at by /root/reference/README.md:18; definitions are
public knowledge, Malanchev et al. 2021, MNRAS 502:5147).  Ray Data delivers a
series in *blocks*, so the engine's aggregates must be mergeable: every block
emits per-(series, bucket) sufficient statistics that merge ASSOCIATIVELY by
plain Sum / Min / Max — which lets the shuffle-side combine be Ray Data's
built-in vectorized aggregates, with no custom reducers on the hot path.

Sufficient statistics per group (all float64 except n):

    n       point count
    sum_w   Σw                (weights)
    sum_wv  Σw·v
    s1..s4  Σv, Σv², Σv³, Σv⁴ (raw power sums)
    vmin/vmax
    st1     Σt'    where t' = (t_us - bucket_ts_us)/1e6 seconds — shifting by
    st2     Σt'²   the bucket start is deterministic per group, needs no
    stv     Σt'·v  pre-pass, and keeps the OLS normal equations conditioned
                   (raw epoch-µs² would cancel catastrophically in float64)

Finalized features (nine, north_star list):

    mean      s1/n
    wmean     sum_wv/sum_w
    std       sample std (ddof=1), NULL when n < 2
    skew      population skewness m3/m2^1.5, NULL when m2 ≈ 0
    kurtosis  population excess kurtosis m4/m2² − 3, NULL when m2 ≈ 0
    amplitude (max−min)/2   (light-curve Amplitude definition)
    beyond_1_std  computed in a second pass (needs final mean/std; see
                  stages/aggregate.py) — fraction of |v−mean| > std
    linear_trend_slope  OLS slope of v over t' seconds
    (count n is the ninth)

Raw power sums instead of Welford/Pébay central-moment merges: the merge
becomes a plain sum (associative, expressible as Ray built-in aggregates AND
as ANSI SQL for the DuckDB oracle — identical algebra on both sides).  The
classic cancellation risk of raw moments is bounded here because v is a
per-page scalar metric with O(1) coefficient of variation, and the one badly
conditioned axis (absolute epoch time) is shifted per bucket.  Near-constant
series degrade to m2 ≈ 0 and are reported as NULL skew/kurtosis explicitly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

POINT_STAT_COLUMNS = (
    "n",
    "sum_w",
    "sum_wv",
    "s1",
    "s2",
    "s3",
    "s4",
    "vmin",
    "vmax",
    "st1",
    "st2",
    "stv",
)

FEATURE_COLUMNS = (
    "n",
    "mean",
    "wmean",
    "std",
    "skew",
    "kurtosis",
    "amplitude",
    "linear_trend_slope",
)


def point_stats_arrow(
    tbl: pa.Table,
    key_cols: list,
    t_us_col: str = "t_us",
    v_col: str = "v",
    w_col: str = "w",
    bucket_col: str = "bucket_ts_us",
) -> pa.Table:
    """Block-local partial aggregation: one row per distinct key in ``tbl``.

    Vectorized end-to-end with pyarrow compute + hash group_by (C++ kernels).
    ``key_cols`` must include ``bucket_col``.  Output columns: key_cols +
    POINT_STAT_COLUMNS.  This is the map-side combiner that shrinks the
    groupby shuffle from raw points to one row per (key, block).
    """
    v = pc.cast(tbl[v_col], pa.float64())
    w = pc.cast(tbl[w_col], pa.float64())
    t_us = pc.cast(tbl[t_us_col], pa.int64())
    b_us = pc.cast(tbl[bucket_col], pa.int64())
    tp = pc.divide(pc.cast(pc.subtract(t_us, b_us), pa.float64()), 1e6)

    v2 = pc.multiply(v, v)
    work = pa.table(
        {
            **{k: tbl[k] for k in key_cols},
            "v": v,
            "wv": pc.multiply(w, v),
            "w": w,
            "v2": v2,
            "v3": pc.multiply(v2, v),
            "v4": pc.multiply(v2, v2),
            "tp": tp,
            "tp2": pc.multiply(tp, tp),
            "tpv": pc.multiply(tp, v),
        }
    )
    agg = work.group_by(key_cols).aggregate(
        [
            ("v", "count"),
            ("w", "sum"),
            ("wv", "sum"),
            ("v", "sum"),
            ("v2", "sum"),
            ("v3", "sum"),
            ("v4", "sum"),
            ("v", "min"),
            ("v", "max"),
            ("tp", "sum"),
            ("tp2", "sum"),
            ("tpv", "sum"),
        ]
    )
    rename = {
        "v_count": "n",
        "w_sum": "sum_w",
        "wv_sum": "sum_wv",
        "v_sum": "s1",
        "v2_sum": "s2",
        "v3_sum": "s3",
        "v4_sum": "s4",
        "v_min": "vmin",
        "v_max": "vmax",
        "tp_sum": "st1",
        "tp2_sum": "st2",
        "tpv_sum": "stv",
    }
    agg = agg.rename_columns([rename.get(c, c) for c in agg.column_names])
    agg = agg.set_column(
        agg.column_names.index("n"), "n", pc.cast(agg["n"], pa.int64())
    )
    # Stable column order: keys first, then stats.
    return agg.select(list(key_cols) + list(POINT_STAT_COLUMNS))


# Guard for "variance is numerically zero": m2 below this fraction of the
# mean-square magnitude is treated as a constant series (NULL skew/kurt).
_M2_EPS = 1e-12


def finalize_features(stats: dict) -> dict:
    """Finalize merged sufficient statistics into the feature columns.

    ``stats``: mapping of POINT_STAT_COLUMNS -> 1-D numpy arrays (one element
    per group).  Returns dict of numpy arrays; non-finite/undefined entries
    are NaN (converted to Arrow nulls by the caller so SQL NULL semantics
    match — see oracle notes in pipelines/queries.py).
    """
    n = np.asarray(stats["n"], dtype=np.float64)
    s1 = np.asarray(stats["s1"], dtype=np.float64)
    s2 = np.asarray(stats["s2"], dtype=np.float64)
    s3 = np.asarray(stats["s3"], dtype=np.float64)
    s4 = np.asarray(stats["s4"], dtype=np.float64)
    sum_w = np.asarray(stats["sum_w"], dtype=np.float64)
    sum_wv = np.asarray(stats["sum_wv"], dtype=np.float64)
    vmin = np.asarray(stats["vmin"], dtype=np.float64)
    vmax = np.asarray(stats["vmax"], dtype=np.float64)
    st1 = np.asarray(stats["st1"], dtype=np.float64)
    st2 = np.asarray(stats["st2"], dtype=np.float64)
    stv = np.asarray(stats["stv"], dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        mean = s1 / n
        wmean = np.where(sum_w > 0, sum_wv / sum_w, np.nan)
        m2 = s2 / n - mean * mean
        m2 = np.maximum(m2, 0.0)
        # sample variance via M2 = s2 - n*mean^2
        M2 = np.maximum(s2 - n * mean * mean, 0.0)
        std = np.where(n > 1, np.sqrt(M2 / np.maximum(n - 1, 1)), np.nan)
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean**3
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean**4
        )
        scale = np.maximum(s2 / np.maximum(n, 1), 1.0)  # magnitude of v²
        degenerate = m2 <= _M2_EPS * scale
        skew = np.where(degenerate, np.nan, m3 / np.power(np.where(degenerate, 1.0, m2), 1.5))
        kurt = np.where(degenerate, np.nan, m4 / np.square(np.where(degenerate, 1.0, m2)) - 3.0)
        amplitude = (vmax - vmin) / 2.0
        denom = n * st2 - st1 * st1
        tscale = np.maximum(st2, 1.0)
        flat_t = denom <= _M2_EPS * n * tscale
        slope = np.where(flat_t, np.nan, (n * stv - st1 * s1) / np.where(flat_t, 1.0, denom))

    return {
        "n": np.asarray(stats["n"], dtype=np.int64),
        "mean": mean,
        "wmean": wmean,
        "std": std,
        "skew": skew,
        "kurtosis": kurt,
        "amplitude": amplitude,
        "linear_trend_slope": slope,
    }


def merge_stats_numpy(stats: dict, group_codes: np.ndarray, n_groups: int) -> dict:
    """Segmented merge of stat rows by group code (plain sums / min / max).

    Used by the single-process oracle and tests; the distributed path uses
    Ray's built-in Sum/Min/Max aggregates which compute the same algebra.
    """
    out = {}
    for col in POINT_STAT_COLUMNS:
        arr = np.asarray(stats[col], dtype=np.float64)
        if col == "vmin":
            acc = np.full(n_groups, np.inf)
            np.minimum.at(acc, group_codes, arr)
        elif col == "vmax":
            acc = np.full(n_groups, -np.inf)
            np.maximum.at(acc, group_codes, arr)
        else:
            acc = np.zeros(n_groups)
            np.add.at(acc, group_codes, arr)
        out[col] = acc
    out["n"] = out["n"].astype(np.int64)
    return out
