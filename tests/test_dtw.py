"""DTW kernel vs a brute-force recursion oracle + classic properties."""

from __future__ import annotations

import functools

import numpy as np


def _brute(a, b):
    @functools.lru_cache(None)
    def f(i, j):
        if i == 0 and j == 0:
            return abs(a[0] - b[0])
        if i < 0 or j < 0:
            return float("inf")
        return abs(a[i] - b[j]) + min(f(i - 1, j), f(i, j - 1),
                                      f(i - 1, j - 1))
    return f(len(a) - 1, len(b) - 1)


def test_dtw_identity_and_symmetry():
    from light_curve_ray.kernels.dtw import dtw_distance

    a = np.array([1.0, 2, 3, 4, 3, 2, 1])
    assert dtw_distance(a, a) == 0.0
    b = np.array([2.0, 4, 4, 1])
    assert dtw_distance(a, b) == dtw_distance(b, a)


def test_dtw_shift_tolerance_beats_euclid():
    from light_curve_ray.kernels.dtw import dtw_distance

    a = np.array([1.0, 2, 3, 4, 3, 2, 1])
    b = np.array([1.0, 1, 2, 3, 4, 3, 2])   # one-step delayed copy
    assert dtw_distance(a, b) < np.abs(a - b).sum()


def test_dtw_vs_brute_recursion():
    from light_curve_ray.kernels.dtw import dtw_distance

    rng = np.random.RandomState(2)
    for _ in range(10):
        x = tuple(rng.randint(0, 9, rng.randint(3, 9)).tolist())
        y = tuple(rng.randint(0, 9, rng.randint(3, 9)).tolist())
        got = dtw_distance(np.array(x, float), np.array(y, float))
        assert abs(got - _brute(x, y)) < 1e-12


def test_dtw_band_semantics():
    from light_curve_ray.kernels.dtw import dtw_distance

    rng = np.random.RandomState(3)
    a = rng.standard_normal(30)
    b = rng.standard_normal(30)
    full = dtw_distance(a, b)
    banded = dtw_distance(a, b, band=5)
    # constraining alignments can only raise cost
    assert banded >= full - 1e-12
    # band == n recovers the unconstrained value
    assert abs(dtw_distance(a, b, band=30) - full) < 1e-12
    # band smaller than the length mismatch disconnects the corners
    assert dtw_distance(a, b[:10], band=3) == float("inf")


def test_dtw_matrix_pairs():
    from light_curve_ray.kernels.dtw import (
        dtw_distance,
        dtw_distance_matrix,
    )

    rng = np.random.RandomState(4)
    series = [rng.standard_normal(12) for _ in range(4)]
    ii, jj, dd = dtw_distance_matrix(series)
    assert len(ii) == 6 and (ii < jj).all()
    for i, j, d in zip(ii, jj, dd):
        assert abs(d - dtw_distance(series[i], series[j])) < 1e-12


def test_jenks_vs_brute_force_all_splits():
    import itertools

    import numpy as np

    from light_curve_ray.pipelines.queries import _jenks_breaks

    rng = np.random.RandomState(5)
    for _ in range(6):
        v = np.sort(rng.randint(0, 100, 14).astype(np.float64))

        def ssd(seg):
            return ((seg - seg.mean()) ** 2).sum()

        best, bcuts = float("inf"), None
        n = len(v)
        for cuts in itertools.combinations(range(1, n), 3):
            parts = np.split(v, list(cuts))
            c = sum(ssd(p) for p in parts)
            if c < best - 1e-12:
                best, bcuts = c, cuts
        uppers, gvf = _jenks_breaks(v, 4)
        want = [float(v[c - 1]) for c in bcuts]
        assert uppers == want, (uppers, want)
        total = ssd(v)
        assert abs(gvf - (1.0 - best / total)) < 1e-9


def test_jenks_separated_clusters_exact():
    import numpy as np

    from light_curve_ray.pipelines.queries import _jenks_breaks

    v = np.concatenate([np.full(5, 1.0), np.full(5, 100.0),
                        np.full(5, 200.0), np.full(5, 300.0)])
    uppers, gvf = _jenks_breaks(v, 4)
    assert uppers == [1.0, 100.0, 200.0]
    assert abs(gvf - 1.0) < 1e-12
