"""Shape-feature kernel tests (kernels/shape.py): hand-computed oracles,
order independence, and degenerate-series NULL semantics.  The distributed
path is oracle-checked end-to-end by the shape_features driver query."""

import numpy as np

from light_curve_ray.kernels.shape import shape_features


def test_hand_computed_small_series():
    t = np.array([1_000_000, 2_000_000, 3_000_000])
    v = np.array([1.0, 2.0, 3.0])
    f = shape_features(t, v)
    assert f["n"] == 3
    # cum - k*mean = [-1, -1, 0]; range 1; n*sigma = 3*1
    assert np.isclose(f["cusum"], 1.0 / 3.0)
    # sum diff^2 = 2; (n-1)*var = 2*1
    assert np.isclose(f["eta"], 1.0)
    assert np.isclose(f["maximum_slope"], 1.0)
    assert f["median"] == 2.0
    assert np.isclose(f["percent_amplitude"], 1.0)
    # q90 - q10 with linear interpolation over [1,2,3]: 2.8 - 1.2
    assert np.isclose(f["inter_percentile_range_10"], 1.6)


def test_input_order_independence():
    rng = np.random.RandomState(7)
    t = rng.permutation(100).astype(np.int64) * 1_000_000
    v = rng.normal(10, 3, 100)
    f1 = shape_features(t, v)
    perm = rng.permutation(100)
    f2 = shape_features(t[perm], v[perm])
    for k in f1:
        np.testing.assert_equal(f1[k], f2[k])


def test_degenerate_series():
    # single point: order-dependent features undefined
    f = shape_features(np.array([1_000_000]), np.array([5.0]))
    assert f["n"] == 1 and f["median"] == 5.0
    assert np.isnan(f["cusum"]) and np.isnan(f["eta"])
    assert np.isnan(f["maximum_slope"])
    assert f["percent_amplitude"] == 0.0
    # constant series: sigma == 0 -> cusum/eta NULL, slope 0
    f = shape_features(np.arange(5) * 1_000_000, np.full(5, 2.5))
    assert np.isnan(f["cusum"]) and np.isnan(f["eta"])
    assert f["maximum_slope"] == 0.0
    # all points at the SAME timestamp: no valid dt pair -> slope NULL
    f = shape_features(np.zeros(4, dtype=np.int64),
                       np.array([1.0, 2.0, 3.0, 4.0]))
    assert np.isnan(f["maximum_slope"])
    assert not np.isnan(f["eta"])


def test_equal_timestamp_tiebreak_deterministic():
    """Points sharing t_us order by v (the lexsort tie-break), so cusum/eta
    are deterministic for tied series."""
    t = np.array([1, 1, 2, 2], dtype=np.int64) * 1_000_000
    v = np.array([4.0, 1.0, 3.0, 2.0])
    f1 = shape_features(t, v)
    f2 = shape_features(t[::-1], v[::-1])
    for k in f1:
        np.testing.assert_equal(f1[k], f2[k])


def test_median_features():
    """MAD and median-buffer-range pinned on a hand-computable series."""
    t = np.arange(5, dtype=np.int64) * 1_000_000
    v = np.array([1.0, 2.0, 3.0, 4.0, 100.0])
    f = shape_features(t, v)
    # median 3, absdev [2,1,0,1,97] -> sorted [0,1,1,2,97], median 1
    assert f["median_abs_deviation"] == 1.0
    # amplitude (100-1)/2 = 49.5; 0.1*49.5 = 4.95 -> |v-3| < 4.95 for
    # 1,2,3,4 (4 of 5 points)
    assert f["median_buffer_range_percentage"] == 0.8
    # constant series: amplitude 0, strict < never true
    fc = shape_features(t, np.full(5, 7.0))
    assert fc["median_abs_deviation"] == 0.0
    assert fc["median_buffer_range_percentage"] == 0.0


def test_lomb_scargle_finds_planted_period():
    """A pure sine at grid frequency k0 must dominate the periodogram
    (P ~ n/2 normalized), and the statistic must be invariant to time
    translation (the tau offset's whole point)."""
    import numpy as np

    from light_curve_ray.kernels.periodogram import lomb_scargle

    rng = np.random.RandomState(12)
    T = 2_592_000.0
    omegas = 2.0 * np.pi * np.arange(1, 9) / T
    t = np.sort(rng.uniform(0, T, 400))
    k0 = 5
    v = 2.0 * np.sin(omegas[k0 - 1] * t + 0.7) + rng.normal(0, 0.3, 400)
    p = lomb_scargle(t, v, omegas)
    assert np.argmax(p) == k0 - 1
    assert p[k0 - 1] > 5 * np.delete(p, k0 - 1).max()
    # translation invariance (kernel shifts to t - min internally);
    # modest shift: exact double arithmetic, bit-level identical
    np.testing.assert_allclose(lomb_scargle(t + 1.0e7, v, omegas), p,
                               rtol=1e-9)
    # epoch-scale shift: t+9.9e14 costs ~0.1 s of double precision per
    # sample, so only statistical agreement is expected
    np.testing.assert_allclose(lomb_scargle(t + 9.9e14, v, omegas), p,
                               rtol=0.05, atol=0.05)
    # degenerate inputs
    assert np.isnan(lomb_scargle(t[:1], v[:1], omegas)).all()
    assert np.isnan(lomb_scargle(t[:5], np.full(5, 3.0), omegas)).all()


def test_otsu_split_brute():
    import numpy as np

    from light_curve_ray.kernels.shape import otsu_split

    rng = np.random.default_rng(3)
    for _ in range(30):
        n = int(rng.integers(2, 60))
        v = np.round(rng.normal(size=n) * rng.choice([0.1, 1, 100]), 4)
        got = otsu_split(v)
        x = np.sort(v)
        best, besti = None, None
        for i in range(1, n):
            mu0, mu1 = x[:i].mean(), x[i:].mean()
            c = (mu0 - mu1) ** 2 * i * (n - i)
            if best is None or c > best + 1e-9 * max(1.0, abs(best)):
                best, besti = c, i
        assert abs(got["otsu_lower_ratio"] - besti / n) < 1e-12
        assert abs(got["otsu_mean_diff"]
                   - (x[besti:].mean() - x[:besti].mean())) < 1e-9


def test_otsu_split_edge_cases():
    import numpy as np

    from light_curve_ray.kernels.shape import otsu_split

    const = otsu_split(np.array([5.0, 5.0, 5.0, 5.0]))
    assert const["otsu_lower_ratio"] == 0.25  # all-zero crit -> first i
    assert const["otsu_mean_diff"] == 0.0
    assert np.isnan(const["otsu_std_lower"])  # class of 1
    assert const["otsu_std_upper"] == 0.0
    single = otsu_split(np.array([1.0]))
    assert np.isnan(single["otsu_mean_diff"])
    two = otsu_split(np.array([1.0, 3.0]))
    assert two["otsu_mean_diff"] == 2.0
    assert two["otsu_lower_ratio"] == 0.5


def test_anderson_darling_properties():
    import numpy as np

    from light_curve_ray.kernels.shape import anderson_darling_normal as ad

    rng = np.random.default_rng(17)
    x = rng.normal(size=4000)
    a = ad(x)
    assert a < 1.092  # 1% critical value for the corrected statistic
    # shift/scale invariance (standardized internally)
    assert abs(ad(5.0 + 3.0 * x) - a) < 1e-9
    # clearly non-normal data scores far above the critical value
    assert ad(rng.uniform(size=4000)) > 10.0
    assert ad(np.exp(rng.normal(size=4000))) > 10.0
    # guards
    assert np.isnan(ad(np.ones(50)))
    assert np.isnan(ad(np.array([1.0, 2.0, 3.0])))


def test_anderson_darling_matches_direct_formula():
    import math

    import numpy as np

    from light_curve_ray.kernels.shape import anderson_darling_normal as ad

    rng = np.random.default_rng(23)
    v = rng.normal(size=37)
    n = len(v)
    y = np.sort((v - v.mean()) / v.std(ddof=1))
    cdf = np.array([0.5 * (1 + math.erf(t / math.sqrt(2))) for t in y])
    s = sum((2 * (i + 1) - 1) * (math.log(cdf[i])
                                 + math.log(1 - cdf[n - 1 - i]))
            for i in range(n))
    expect = (-n - s / n) * (1 + 4 / n - 25 / n ** 2)
    assert abs(ad(v) - expect) < 1e-10


def test_gls_power_recovers_true_frequency():
    import numpy as np

    from light_curve_ray.kernels.periodogram import gls_power

    rng = np.random.default_rng(7)
    t = np.sort(rng.uniform(0, 100.0, 300))
    f0 = 0.35  # Hz
    v = 5.0 + 2.0 * np.sin(2 * np.pi * f0 * t + 0.4)
    freqs = np.linspace(0.05, 1.0, 96)
    p = gls_power(t, v, 2 * np.pi * freqs)
    assert abs(freqs[int(np.nanargmax(p))] - f0) < 0.02
    # normalized to [0, 1]; a clean sinusoid saturates the statistic
    assert 0.95 < np.nanmax(p) <= 1.0 + 1e-9


def test_gls_power_offset_invariance_and_edge_cases():
    import numpy as np

    from light_curve_ray.kernels.periodogram import gls_power

    rng = np.random.default_rng(8)
    t = np.sort(rng.uniform(0, 50.0, 120))
    v = np.sin(2 * np.pi * 0.2 * t) + 0.3 * rng.normal(size=120)
    om = 2 * np.pi * np.linspace(0.05, 0.5, 40)
    p1 = gls_power(t, v, om)
    # the floating mean makes the statistic exactly offset-invariant
    p2 = gls_power(t, v + 123.456, om)
    assert np.allclose(p1, p2, atol=1e-9, equal_nan=True)
    # degenerate inputs -> NaN, not crashes
    assert np.isnan(gls_power(t[:2], v[:2], om)).all()
    # constant series: float cancellation may leave yy a few ulps above
    # zero, in which case power is ~1e-15 noise rather than NaN
    pc_ = gls_power(t[:10], np.full(10, 3.0), om)
    assert np.all(np.isnan(pc_) | (np.abs(pc_) < 1e-9))
