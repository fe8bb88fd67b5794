"""VillarFit unit oracle: planted-parameter recovery on synthetic
supernova-shaped curves, determinism, edge semantics (same contract as
tests/test_bazin.py — nonlinear fits are rows-only by design)."""

from __future__ import annotations

import numpy as np

from light_curve_ray.kernels.villar import villar_fit, villar_model


def _curve(params, n=150, t_max=250.0, noise=0.0, seed=2):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0.0, t_max, n))
    y = villar_model(t, np.asarray(params))
    if noise:
        y = y + rng.normal(0.0, noise, n)
    return t, y


def test_villar_recovers_planted_parameters():
    # A b t0 gamma beta tau_rise tau_fall
    true = np.array([15.0, 1.0, 50.0, 30.0, 0.3, 6.0, 25.0])
    t, y = _curve(true)
    f = villar_fit(t, y)
    assert f["rss"] < 1e-6
    assert abs(f["a"] - true[0]) / true[0] < 0.02
    assert abs(f["b"] - true[1]) < 0.2
    assert abs(f["t0"] - true[2]) < 1.0
    assert abs(f["gamma"] - true[3]) / true[3] < 0.1
    assert abs(f["beta"] - true[4]) < 0.05
    assert abs(f["tau_fall"] - true[6]) / true[6] < 0.1


def test_villar_determinism_and_order_invariance():
    true = np.array([8.0, 0.2, 80.0, 40.0, 0.5, 10.0, 30.0])
    t, y = _curve(true, noise=0.1, seed=7)
    f1 = villar_fit(t, y)
    assert f1 == villar_fit(t, y)
    perm = np.random.RandomState(1).permutation(len(t))
    assert villar_fit(t[perm], y[perm]) == f1
    assert f1["rss"] / len(t) < 4 * 0.1**2


def test_villar_edges():
    t = np.linspace(0, 10, 7)
    f = villar_fit(t, np.arange(7.0))
    assert f["n"] == 7 and np.isnan(f["a"])  # n < 8
    f2 = villar_fit(np.linspace(0, 10, 20), np.full(20, 3.0))
    assert np.isnan(f2["a"])  # constant series
    # beta stays inside (0, 1) by construction
    true = np.array([15.0, 1.0, 50.0, 30.0, 0.3, 6.0, 25.0])
    t3, y3 = _curve(true, noise=0.5, seed=11)
    g = villar_fit(t3, y3)
    assert 0.0 < g["beta"] < 1.0
