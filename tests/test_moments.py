"""Moment-accumulator tests: block partials + plain-sum merge must equal a
direct whole-series computation regardless of how the points are split into
blocks (SURVEY §5 property tests: merge associativity / order independence)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from light_curve_ray.kernels.moments import (
    POINT_STAT_COLUMNS,
    finalize_features,
    merge_stats_numpy,
    point_stats_arrow,
)


def _points_table(key, t_us, v, w, bucket_us):
    return pa.table(
        {
            "key": pa.array(key, pa.string()),
            "bucket_ts_us": pa.array(bucket_us, pa.int64()),
            "t_us": pa.array(t_us, pa.int64()),
            "v": pa.array(v, pa.float64()),
            "w": pa.array(w, pa.float64()),
        }
    )


def _direct_features(t_us, v, w, bucket_us):
    """Single-group oracle computed the naive two-pass way."""
    v = np.asarray(v, float)
    n = len(v)
    tp = (np.asarray(t_us) - bucket_us) / 1e6
    mean = v.mean()
    out = {
        "n": n,
        "mean": mean,
        "wmean": np.sum(np.asarray(w) * v) / np.sum(w),
        "std": v.std(ddof=1) if n > 1 else np.nan,
        "amplitude": (v.max() - v.min()) / 2,
    }
    m2 = ((v - mean) ** 2).mean()
    if m2 > 1e-12 * max((v ** 2).mean(), 1.0):
        out["skew"] = ((v - mean) ** 3).mean() / m2 ** 1.5
        out["kurtosis"] = ((v - mean) ** 4).mean() / m2 ** 2 - 3
    else:
        out["skew"] = np.nan
        out["kurtosis"] = np.nan
    denom = n * np.sum(tp ** 2) - np.sum(tp) ** 2
    out["linear_trend_slope"] = (
        (n * np.sum(tp * v) - np.sum(tp) * np.sum(v)) / denom if denom > 1e-12 * n * max(np.sum(tp**2), 1.0) else np.nan
    )
    return out


def test_partials_merge_equals_direct():
    rng = np.random.RandomState(42)
    n = 500
    bucket = 1_700_000_000_000_000
    t = bucket + np.sort(rng.randint(0, 3_600_000_000, n)).astype(np.int64)
    v = rng.lognormal(7.0, 1.0, n)
    w = rng.choice([1.0, 2.0], n)
    tbl = _points_table(["k"] * n, t, v, w, [bucket] * n)

    # Split into arbitrary blocks, compute partials per block, merge by sums.
    splits = [0, 37, 100, 101, 333, n]
    partial_tables = [
        point_stats_arrow(tbl.slice(a, b - a), ["key", "bucket_ts_us"])
        for a, b in zip(splits, splits[1:])
    ]
    allp = pa.concat_tables(partial_tables)
    stats = {c: allp[c].to_numpy(zero_copy_only=False) for c in POINT_STAT_COLUMNS}
    merged = merge_stats_numpy(stats, np.zeros(len(allp), dtype=np.int64), 1)
    feats = finalize_features(merged)

    expected = _direct_features(t, v, w, bucket)
    for k, exp in expected.items():
        got = feats[k][0]
        if np.isnan(exp):
            assert np.isnan(got), k
        else:
            assert abs(got - exp) < 1e-8 * max(1.0, abs(exp)), (k, got, exp)


def test_merge_order_independence():
    rng = np.random.RandomState(7)
    n = 300
    bucket = 0
    t = np.sort(rng.randint(0, 10**9, n)).astype(np.int64)
    v = rng.normal(50.0, 10.0, n)
    w = np.ones(n)
    tbl = _points_table(["k"] * n, t, v, w, [bucket] * n)
    p1 = point_stats_arrow(tbl.slice(0, 150), ["key", "bucket_ts_us"])
    p2 = point_stats_arrow(tbl.slice(150), ["key", "bucket_ts_us"])

    def run(order):
        allp = pa.concat_tables(order)
        stats = {c: allp[c].to_numpy(zero_copy_only=False) for c in POINT_STAT_COLUMNS}
        merged = merge_stats_numpy(stats, np.zeros(len(allp), dtype=np.int64), 1)
        return finalize_features(merged)

    f_ab, f_ba = run([p1, p2]), run([p2, p1])
    for k in f_ab:
        np.testing.assert_allclose(f_ab[k], f_ba[k], rtol=1e-12)


def test_multi_group_partials():
    tbl = _points_table(
        ["a", "a", "b", "b", "b"],
        [0, 1_000_000, 0, 2_000_000, 4_000_000],
        [1.0, 3.0, 10.0, 20.0, 60.0],
        [1.0, 1.0, 1.0, 2.0, 1.0],
        [0, 0, 0, 0, 0],
    )
    p = point_stats_arrow(tbl, ["key", "bucket_ts_us"])
    df = p.to_pandas().set_index("key").sort_index()
    assert df.loc["a", "n"] == 2 and df.loc["b", "n"] == 3
    assert df.loc["a", "mean"] == 2.0
    assert df.loc["b", "vmin"] == 10.0 and df.loc["b", "vmax"] == 60.0
    assert df.loc["b", "sum_wv"] == 10.0 + 40.0 + 60.0


def test_degenerate_constant_series():
    tbl = _points_table(["k"] * 3, [0, 1, 2], [5.0, 5.0, 5.0], [1.0] * 3, [0] * 3)
    p = point_stats_arrow(tbl, ["key", "bucket_ts_us"])
    stats = {c: p[c].to_numpy(zero_copy_only=False) for c in POINT_STAT_COLUMNS}
    f = finalize_features(stats)
    assert np.isnan(f["skew"][0]) and np.isnan(f["kurtosis"][0])
    assert f["std"][0] == 0.0
    assert f["amplitude"][0] == 0.0
