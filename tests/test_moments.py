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
    slope_ok = denom > 1e-12 * n * max(np.sum(tp**2), 1.0)
    out["linear_trend_slope"] = (
        (n * np.sum(tp * v) - np.sum(tp) * np.sum(v)) / denom if slope_ok else np.nan
    )
    # OLS slope standard error via the independent residual form:
    # sigma^2 = SSres / ((n-2) * Sxx) with SSres from actual residuals
    if slope_ok and n > 2:
        b = out["linear_trend_slope"]
        a = mean - b * tp.mean()
        ss_res = np.sum((v - (a + b * tp)) ** 2)
        sxx = np.sum((tp - tp.mean()) ** 2)
        out["linear_trend_sigma"] = np.sqrt(ss_res / (n - 2) / sxx)
    else:
        out["linear_trend_sigma"] = np.nan
    # weighted features (w = 1/sigma^2 convention; see kernels/moments doc)
    w = np.asarray(w, float)
    wmean = out["wmean"]
    if n > 1:
        out["reduced_chi2"] = np.sum(w * (v - wmean) ** 2) / (n - 1)
        s2 = ((v - mean) ** 2).sum() / (n - 1)
        out["excess_variance"] = (
            (s2 - np.sum(1.0 / w) / n) / mean ** 2 if mean != 0 else np.nan)
    else:
        out["reduced_chi2"] = np.nan
        out["excess_variance"] = np.nan
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


def test_salted_rollup_equals_unsalted(ray_session):
    """Explicit hot-domain salting (north rule) is a pure partitioning
    change: salted and unsalted paths produce identical features on a
    Zipf-skewed corpus."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.pipelines.rollup import tier_stats
    from light_curve_ray.stages.aggregate import finalize_stats_batch

    rng = np.random.RandomState(5)
    n = 20000
    # 90% of points on one hot domain
    domains = np.where(rng.rand(n) < 0.9, "hot.example.org",
                       rng.choice(["a.org", "b.org", "c.org"], n))
    t_us = (1_700_000_000_000_000
            + rng.randint(0, 3 * 86_400_000_000, n)).astype(np.int64)
    pts = pa.table({
        "lang": pa.array(["en"] * n), "domain": pa.array(domains),
        "t_us": pa.array(t_us, pa.int64()),
        "v": pa.array(rng.lognormal(5, 1, n), pa.float64()),
        "w": pa.array(np.ones(n), pa.float64()),
    })
    ds = rd.from_arrow(pts).repartition(8).materialize()

    def run(hot):
        stats = tier_stats(ds, ("1h",), hot_domains=hot, n_salt=8)
        out = stats["1h"].map_batches(
            lambda b: finalize_stats_batch(b, "1h"), batch_format="pyarrow"
        ).to_pandas()
        return out.sort_values(["domain", "bucket_ts_us"]).reset_index(
            drop=True)

    plain = run(None)
    salted = run(frozenset({"hot.example.org"}))
    assert len(plain) == len(salted)
    np.testing.assert_array_equal(plain["n"], salted["n"])
    for col in ["mean", "std", "skew", "kurtosis", "linear_trend_slope"]:
        g = plain[col].to_numpy(np.float64)
        e = salted[col].to_numpy(np.float64)
        ok = (np.isnan(g) & np.isnan(e)) | (np.abs(g - e) <= 1e-9 * np.maximum(1, np.abs(e)))
        assert bool(np.all(ok)), col


def test_statemerge_agg_matches_sort_merge(ray_session):
    """The groupby+StateMerge fallback computes the same merged stats as
    the primary sort-based vectorized merge."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.aggregate import (
        make_partial_stats_fn,
        merge_partials,
        merge_partials_agg,
        unpack_state,
    )

    rng = np.random.RandomState(9)
    n = 5000
    pts = pa.table({
        "lang": pa.array(rng.choice(["en", "de"], n)),
        "domain": pa.array(rng.choice(["a.org", "b.org", "c.org"], n)),
        "t_us": pa.array(rng.randint(0, 10 * 3_600_000_000, n), pa.int64()),
        "v": pa.array(rng.normal(100, 10, n), pa.float64()),
        "w": pa.array(np.ones(n), pa.float64()),
    })
    partials = (rd.from_arrow(pts).repartition(6)
                .map_batches(make_partial_stats_fn(3_600_000_000),
                             batch_format="pyarrow")
                .materialize())

    def collect(ds):
        out = ds.map_batches(unpack_state, batch_format="pyarrow").to_pandas()
        return out.sort_values(["lang", "domain", "bucket_ts_us"]).reset_index(drop=True)

    a = collect(merge_partials(partials))
    b = collect(merge_partials_agg(partials))
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["n"], b["n"])
    for c in ["mean", "M2", "M3", "M4", "vmin", "vmax", "st1", "st2", "stv"]:
        np.testing.assert_allclose(a[c], b[c], rtol=1e-9, atol=1e-9)


def test_hierarchical_residual_merge(ray_session):
    """Forcing residual_cap below the residual size engages the
    hierarchical level(s); output must be identical to the direct merge
    (the ~1e6-block scale path, exercised here with a tiny cap)."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.aggregate import (
        make_partial_stats_fn,
        merge_partials,
        unpack_state,
    )

    rng = np.random.RandomState(13)
    n = 8000
    pts = pa.table({
        "lang": pa.array(rng.choice(["en", "de"], n)),
        "domain": pa.array(rng.choice([f"d{i}.org" for i in range(20)], n)),
        "t_us": pa.array(rng.randint(0, 20 * 3_600_000_000, n), pa.int64()),
        "v": pa.array(rng.normal(50, 5, n), pa.float64()),
        "w": pa.array(np.ones(n), pa.float64()),
    })
    # many small input blocks -> many boundary keys in the residual
    partials = (rd.from_arrow(pts).repartition(64)
                .map_batches(make_partial_stats_fn(3_600_000_000),
                             batch_format="pyarrow")
                .materialize())

    def collect(ds):
        out = ds.map_batches(unpack_state,
                             batch_format="pyarrow").to_pandas()
        return out.sort_values(
            ["lang", "domain", "bucket_ts_us"]).reset_index(drop=True)

    direct = collect(merge_partials(partials))
    hier = collect(merge_partials(partials, residual_cap=8))
    assert len(direct) == len(hier)
    np.testing.assert_array_equal(direct["n"], hier["n"])
    for c in ["mean", "M2", "M3", "M4", "vmin", "vmax", "st1", "st2",
              "stv"]:
        np.testing.assert_allclose(direct[c], hier[c], rtol=0, atol=0)


def test_merge_split_invariance_property():
    """Hypothesis: for RANDOM values and RANDOM block splits, the merged
    Pébay features equal the direct single-pass computation — the algebra
    the whole distributed merge rests on (any block partition a scheduler
    produces must yield the same rollup)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(min_value=2, max_value=400),
           st.integers(min_value=0, max_value=2**31 - 1),
           st.integers(min_value=1, max_value=6))
    def prop(n, seed, n_splits):
        rng = np.random.RandomState(seed)
        bucket = 0
        t = np.sort(rng.randint(0, 10**9, n)).astype(np.int64)
        # mix of scales incl. |mean| >> std (the cancellation regime)
        v = rng.normal(rng.choice([0.0, 1e5]), rng.uniform(0.1, 100.0), n)
        w = rng.choice([1.0, 2.0], n)
        tbl = _points_table(["k"] * n, t, v, w, [bucket] * n)
        splits = np.unique(
            np.concatenate([[0, n], rng.randint(0, n + 1, n_splits)]))
        partials = [
            point_stats_arrow(tbl.slice(a, b - a), ["key", "bucket_ts_us"])
            for a, b in zip(splits, splits[1:]) if b > a
        ]
        allp = pa.concat_tables(partials)
        stats = {c: allp[c].to_numpy(zero_copy_only=False)
                 for c in POINT_STAT_COLUMNS}
        merged = merge_stats_numpy(
            stats, np.zeros(len(allp), dtype=np.int64), 1)
        feats = finalize_features(merged)
        expected = _direct_features(t, v, w, bucket)
        for k, exp in expected.items():
            got = feats[k][0]
            if np.isnan(exp):
                assert np.isnan(got), k
            else:
                assert abs(got - exp) < 1e-7 * max(1.0, abs(exp)), (
                    k, got, exp, n, seed)

    prop()


def test_kway_merge_matches_pairwise():
    """The one-pass k-way reduceat merge must agree with the pairwise
    Pébay sweep to float noise on every state component, including the
    |mean| >> std cancellation regime and empty (n=0) accumulator rows."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from light_curve_ray.kernels.moments import (
        STATE_WIDTH,
        N_,
        MEAN_,
        segmented_state_merge,
        segmented_state_merge_kway,
    )

    @settings(max_examples=25, deadline=None)
    @given(st.integers(min_value=1, max_value=300),
           st.integers(min_value=0, max_value=2**31 - 1),
           st.integers(min_value=1, max_value=20))
    def prop(rows, seed, n_groups):
        rng = np.random.RandomState(seed)
        inv = np.sort(rng.randint(0, n_groups, rows))
        base = rng.choice([0.0, 1e5])
        mat = np.zeros((rows, STATE_WIDTH))
        for i in range(rows):
            n = rng.randint(0, 5)
            if n == 0:
                continue
            v = rng.normal(base, rng.uniform(0.1, 50.0), n)
            mat[i, N_] = n
            mat[i, MEAN_] = v.mean()
            d = v - v.mean()
            mat[i, 4:7] = [(d**2).sum(), (d**3).sum(), (d**4).sum()]
            mat[i, 1] = n * 1.0
            mat[i, 2] = v.sum()
            mat[i, 7], mat[i, 8] = v.min(), v.max()
            mat[i, 9:12] = rng.uniform(-10, 10, 3)
            # w == 1 per point: wM2 == M2, sum_invw == n (consistent state)
            mat[i, 12] = (d**2).sum()
            mat[i, 13] = n * 1.0
        pw, codes_pw = segmented_state_merge(mat.copy(), inv.copy())
        kw, codes_kw = segmented_state_merge_kway(mat, inv)
        np.testing.assert_array_equal(codes_pw, codes_kw)
        assert pw.shape == kw.shape
        scale = np.maximum(1.0, np.abs(pw))
        tol = np.full(pw.shape[1], 1e-9)
        # wM2's delta is a DIFFERENCE OF RATIOS (sum_wv/sum_w) rather than
        # a carried mean, so the |mean| >> std regime costs ~an extra digit
        # of cancellation noise — still 100x inside the 1e-6 relative
        # granularity the sig-round oracle contract tolerates.
        from light_curve_ray.kernels.moments import M3_, M4_, WM2_
        tol[WM2_] = 1e-7
        # M3/M4 true values can cancel to ~0 in that same regime while the
        # δ³/δ⁴ merge terms are ~1e3-1e5, so merge-order ulps leave a few
        # 1e-9 ABSOLUTE residue (scale clamps at 1.0 there); skew/kurtosis
        # finalization divides by M2^k where the 6-dp oracle rounding
        # absorbs it.  Same 100x margin under the oracle granularity.
        tol[M3_] = tol[M4_] = 1e-7
        assert (np.abs(pw - kw) <= tol * scale).all(), (
            np.abs((pw - kw) / scale).max())

    prop()
