"""Unit oracles for kernels/features.py: conditional entropy against a
brute-force occupancy grid, weighted features against direct formulas,
and NULL/edge semantics."""

from __future__ import annotations

import math

import numpy as np

from light_curve_ray.kernels.features import (
    CE_N_MAG,
    CE_N_PHASE,
    CE_PERIOD_US,
    conditional_entropy,
    weighted_features,
)


def test_conditional_entropy_bruteforce():
    rng = np.random.RandomState(5)
    n = 500
    t = np.cumsum(rng.randint(1, 10**10, n)).astype(np.int64)
    v = rng.normal(50, 20, n)
    got = conditional_entropy(t, v)

    # brute force over explicit cells
    vmin, vmax = v.min(), v.max()
    cells: dict = {}
    for ti, vi in zip(t, v):
        phi = int((ti % CE_PERIOD_US) * CE_N_PHASE // CE_PERIOD_US)
        mag = min(CE_N_MAG - 1,
                  int(math.floor((vi - vmin) / (vmax - vmin) * CE_N_MAG)))
        cells[(phi, mag)] = cells.get((phi, mag), 0) + 1
    phase_tot: dict = {}
    for (phi, _), c in cells.items():
        phase_tot[phi] = phase_tot.get(phi, 0) + c
    exp = sum(c / n * math.log(phase_tot[phi] / c)
              for (phi, _), c in cells.items())
    assert abs(got - exp) < 1e-12
    # bounded by ln(n_mag_bins); uniform-in-phase constant series is NaN
    assert 0.0 <= got <= math.log(CE_N_MAG) + 1e-12
    assert np.isnan(conditional_entropy(t, np.full(n, 3.0)))


def test_weighted_features_formulas():
    rng = np.random.RandomState(9)
    n = 300
    t = np.cumsum(rng.randint(10**6, 10**9, n)).astype(np.int64)
    v = rng.normal(10, 4, n)
    sg = 0.5 + rng.uniform(0, 1, n)
    f = weighted_features(t, v, sg)

    w = 1.0 / sg**2
    wmean = (w * v).sum() / w.sum()
    assert abs(f["weighted_mean"] - wmean) < 1e-12
    assert abs(f["reduced_chi2"]
               - (w * (v - wmean) ** 2).sum() / (n - 1)) < 1e-9
    s2 = v.var(ddof=1)
    assert abs(f["excess_variance"]
               - (s2 - (sg**2).mean()) / v.mean() ** 2) < 1e-12
    assert abs(f["mean_variance"] - np.sqrt(s2) / v.mean()) < 1e-12
    d = (v - wmean) / sg
    assert abs(f["stetson_k"]
               - np.abs(d).mean() / np.sqrt((d**2).mean())) < 1e-12
    # eta_e: direct Kim et al. 2014 formula on the time-sorted series
    order = np.argsort(t)
    ts, xs = t[order], v[order]
    dt = np.diff(ts) / 1e6
    dv = np.diff(xs)
    span = (ts[-1] - ts[0]) / 1e6
    exp_ee = span**2 * ((dv / dt) ** 2).sum() / (s2 * (n - 1) ** 3)
    assert abs(f["eta_e"] - exp_ee) / exp_ee < 1e-12

    # linear fit recovers a planted line exactly when sigma is constant
    slope_true, icpt = 3.5e-4, 7.0
    x = (t - t[0]) / 1e6
    y = icpt + slope_true * x
    g = weighted_features(t, y, np.full(n, 2.0))
    assert abs(g["slope"] - slope_true) / slope_true < 1e-9
    assert g["fit_reduced_chi2"] < 1e-12
    # slope_sigma = sqrt(1/sum(w dx^2))
    wq = np.full(n, 1 / 4.0)
    dx = x - (wq * x).sum() / wq.sum()
    assert abs(g["slope_sigma"] - np.sqrt(1.0 / (wq * dx * dx).sum())) < 1e-12


def test_weighted_features_nulls():
    t = np.array([10**12], np.int64)
    f = weighted_features(t, np.array([5.0]), np.array([1.0]))
    assert f["n"] == 1 and np.isnan(f["reduced_chi2"])
    assert np.isnan(f["eta_e"]) and np.isnan(f["slope"])
    # constant series: stetson undefined (all-zero residuals)
    t3 = np.array([1, 2, 3], np.int64) * 10**10
    g = weighted_features(t3, np.full(3, 2.0), np.full(3, 1.0))
    assert np.isnan(g["stetson_k"]) and np.isnan(g["eta_e"])
    assert g["reduced_chi2"] == 0.0


def test_stetson_j_l_formulas():
    rng = np.random.RandomState(21)
    n = 200
    t = np.cumsum(rng.randint(10**6, 10**9, n)).astype(np.int64)
    v = rng.normal(5, 2, n)
    sg = 0.5 + rng.uniform(0, 1, n)
    f = weighted_features(t, v, sg)

    order = np.argsort(t)
    xs, ss = v[order], sg[order]
    w = 1.0 / sg**2
    wmean = (w * v).sum() / w.sum()
    g = np.sqrt(n / (n - 1.0)) * (xs - wmean) / ss
    p = g[:-1] * g[1:]
    exp_j = (np.sign(p) * np.sqrt(np.abs(p))).sum() / (n - 1)
    assert abs(f["stetson_j"] - exp_j) < 1e-12
    d = (v - wmean) / sg
    exp_k = np.abs(d).mean() / np.sqrt((d**2).mean())
    assert abs(f["stetson_l"] - exp_j * exp_k / 0.798) < 1e-12
    # single point: J/L undefined
    f1 = weighted_features(t[:1], v[:1], sg[:1])
    assert np.isnan(f1["stetson_j"]) and np.isnan(f1["stetson_l"])


def test_time_features_formulas():
    from light_curve_ray.kernels.features import time_features

    rng = np.random.RandomState(11)
    t = np.cumsum(rng.randint(1, 10**9, 200)).astype(np.int64)
    shuffled = t.copy()
    rng.shuffle(shuffled)  # kernel must sort internally
    f = time_features(shuffled)

    assert f["n"] == 200
    assert f["duration_s"] == float(t[-1] - t[0]) / 1e6
    dt = np.diff(t) / 1e6
    assert f["min_time_interval_s"] == dt.min()
    assert f["max_time_interval_s"] == dt.max()
    rel = (t - t[0]) / 1e6
    assert abs(f["time_mean_s"] - rel.mean()) < 1e-9 * abs(rel.mean())
    assert abs(f["time_standard_deviation_s"] - rel.std(ddof=1)) \
        < 1e-9 * rel.std(ddof=1)


def test_time_features_edges():
    from light_curve_ray.kernels.features import time_features

    # single point: duration/mean exact zeros, intervals and std NULL
    f1 = time_features(np.array([10**15], dtype=np.int64))
    assert f1["n"] == 1 and f1["duration_s"] == 0.0
    assert f1["time_mean_s"] == 0.0
    assert math.isnan(f1["min_time_interval_s"])
    assert math.isnan(f1["time_standard_deviation_s"])
    # empty
    f0 = time_features(np.array([], dtype=np.int64))
    assert f0["n"] == 0 and math.isnan(f0["duration_s"])
    # duplicate timestamps give a legal 0.0 minimum interval
    f2 = time_features(np.array([5, 5, 9], dtype=np.int64) * 10**6)
    assert f2["min_time_interval_s"] == 0.0
    assert f2["max_time_interval_s"] == 4.0


def test_roms_formula_and_edges():
    from light_curve_ray.kernels.features import roms

    rng = np.random.RandomState(7)
    v = rng.normal(100.0, 5.0, 101)
    sigma = np.full(101, 5.0)
    med = np.percentile(v, 50.0)
    exp = (np.abs(v - med) / 5.0).sum() / 100
    assert abs(roms(v, sigma) - exp) < 1e-12
    # even-n median must be np.percentile's lerp (QUANTILE_CONT parity),
    # not (a+b)/2 — pin with values whose lerp and midpoint forms differ
    v2 = np.array([0.1, 0.2, 0.3, 0.7])
    med2 = np.percentile(v2, 50.0)
    exp2 = (np.abs(v2 - med2)).sum() / 3
    assert roms(v2, np.ones(4)) == exp2
    # n < 2 -> NaN (NULL)
    assert math.isnan(roms(np.array([1.0]), np.array([1.0])))
    # non-variable series with correct sigma ~ 1 (sanity, not exact)
    assert 0.5 < roms(v, sigma) < 1.5


def test_lttb_matches_bruteforce():
    """LTTB vs a literal reference implementation (Steinarsson 2013
    pseudocode with explicit loops)."""
    from light_curve_ray.kernels.features import lttb

    def reference(t, v, n_out):
        n = len(t)
        if n_out >= n:
            return list(range(n))
        if n_out < 3 or n <= 2:
            return sorted(set([0, n - 1]))
        edges = np.linspace(1, n - 1, n_out - 1).astype(int)
        sel = [0]
        a = 0
        for i in range(n_out - 2):
            s, e = edges[i], edges[i + 1]
            ns = edges[i + 1]
            ne = n if i == n_out - 3 else edges[i + 2]
            cx = sum(t[ns:ne]) / (ne - ns)
            cy = sum(v[ns:ne]) / (ne - ns)
            best, best_area = None, -1.0
            for j in range(s, e):
                area = abs((t[a] - cx) * (v[j] - v[a])
                           - (t[a] - t[j]) * (cy - v[a]))
                if area > best_area:
                    best, best_area = j, area
            sel.append(best)
            a = best
        sel.append(n - 1)
        return sel

    rng = np.random.default_rng(23)
    for n, n_out in [(200, 20), (57, 10), (30, 3), (10, 24), (3, 3),
                     (2, 5), (500, 24)]:
        t = np.sort(rng.uniform(0, 1000, n))
        v = rng.standard_normal(n) * 10
        got = lttb(t, v, n_out).tolist()
        want = reference(t.tolist(), v.tolist(), n_out)
        assert got == want, (n, n_out)
        assert got[0] == 0 and got[-1] == n - 1
        assert all(b > a for a, b in zip(got, got[1:]))
