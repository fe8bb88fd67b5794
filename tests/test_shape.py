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
