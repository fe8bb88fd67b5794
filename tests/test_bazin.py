"""BazinFit unit oracle: the LM fit must recover PLANTED parameters on
synthetic transient curves (no SQL oracle exists for a nonlinear fit —
this is the rows-only contract's evidence), be deterministic, and honor
the n/constant-series NULL edges."""

from __future__ import annotations

import numpy as np

from light_curve_ray.kernels.bazin import bazin_fit, bazin_model


def _curve(params, n=80, t_max=200.0, noise=0.0, seed=1):
    rng = np.random.RandomState(seed)
    t = np.sort(rng.uniform(0.0, t_max, n))
    y = bazin_model(t, np.asarray(params))
    if noise:
        y = y + rng.normal(0.0, noise, n)
    return t, y


def test_bazin_recovers_planted_parameters():
    true = np.array([12.0, 1.5, 60.0, 8.0, 40.0])  # A B t0 tau_r tau_f
    t, y = _curve(true, noise=0.0)
    f = bazin_fit(t, y)
    assert abs(f["a"] - true[0]) / true[0] < 1e-3
    assert abs(f["b"] - true[1]) < 0.05
    assert abs(f["t0"] - true[2]) < 0.5
    assert abs(f["tau_rise"] - true[3]) / true[3] < 0.05
    assert abs(f["tau_fall"] - true[4]) / true[4] < 0.05
    assert f["rss"] < 1e-6


def test_bazin_noisy_fit_and_determinism():
    true = np.array([20.0, 0.5, 90.0, 12.0, 55.0])
    t, y = _curve(true, n=120, t_max=300.0, noise=0.2, seed=3)
    f1 = bazin_fit(t, y)
    f2 = bazin_fit(t, y)
    assert f1 == f2  # bit-identical reruns
    assert abs(f1["t0"] - true[2]) < 5.0
    assert abs(f1["tau_fall"] - true[4]) / true[4] < 0.25
    # fit residual should be noise-scale, far below signal variance
    assert f1["rss"] / len(t) < 4 * 0.2**2
    # input order must not matter (kernel sorts internally)
    perm = np.random.RandomState(0).permutation(len(t))
    assert bazin_fit(t[perm], y[perm]) == f1


def test_bazin_edges():
    t = np.linspace(0, 10, 5)
    f = bazin_fit(t, np.ones(5))
    assert f["n"] == 5 and np.isnan(f["a"])  # n < 6
    f2 = bazin_fit(np.linspace(0, 10, 20), np.full(20, 7.0))
    assert np.isnan(f2["a"])  # constant series
