"""Golden tests for the interpolation kernel — transliterated verbatim from
/root/reference/light-curve-interpol/src/lib.rs:79-197 (FIXTURES.md F4)."""

import numpy as np
import pytest

from light_curve_ray.kernels import all_close, interpolate
from light_curve_ray.kernels.ztf_bench_data import (
    BENCH_X,
    BENCH_Y,
    FILL_LEFT,
    FILL_RIGHT,
    GRID_END,
    GRID_SIZE,
    GRID_START,
)
from light_curve_ray.kernels.grid import linspace


def test_empty_target():
    # src/lib.rs:79-91
    out = interpolate([0.0, 1.0], [0.0, 1.0], [], left=0.0, right=0.0)
    assert out.size == 0


def test_zero_points_raises():
    # src/lib.rs:93-105 (should_panic)
    with pytest.raises(ValueError):
        interpolate([], [], [1.0, 2.0, 3.0], left=0.0, right=0.0)


def test_length_mismatch_raises():
    # src/lib.rs:33
    with pytest.raises(ValueError):
        interpolate([0.0, 1.0], [0.0], [0.5], left=0.0, right=0.0)


def test_one_point():
    # src/lib.rs:107-122
    out = interpolate([0.0], [1.0], [-2.0, -1.0, 0.0, 1.0, 2.0], left=-3.0, right=-8.0)
    all_close([-3.0, -3.0, 1.0, -8.0, -8.0], out, 1e-6)


def test_two_points():
    # src/lib.rs:124-139
    out = interpolate(
        [0.0, 1.0], [1.0, 2.0],
        [-1.25, -0.75, -0.25, 0.25, 0.75, 1.25, 1.75],
        left=-3.0, right=-8.0,
    )
    all_close([-3.0, -3.0, -3.0, 1.25, 1.75, -8.0, -8.0], out, 1e-6)


def test_equal_time_duplicates():
    # src/lib.rs:141-154 — last duplicate is the left knot for interpolation
    out = interpolate([0.0, 1.0, 1.0, 2.0], [1.0, 2.0, 3.0, 4.0], [0.5, 1.5], left=-1.0, right=-1.0)
    all_close([1.5, 3.5], out, 1e-6)


def test_exact_hit_first_duplicate_wins():
    # src/lib.rs:55 — target == right.x returns the FIRST duplicate's y
    out = interpolate([0.0, 1.0, 1.0, 2.0], [1.0, 2.0, 3.0, 4.0], [1.0], left=-1.0, right=-1.0)
    all_close([2.0], out, 1e-6)


def test_broken_line():
    # src/lib.rs:156-197
    x = [-7/3, -4/3, -1.0, -1/3, 1.0, 4/3, 7/3]
    y = [2.5, 2.0, 0.5, 1.0, 0.5, 1.5, 3.0]
    t = [-2.0, -5/3, -4/3, -1.0, -2/3, -1/3, 0.0, 1/3, 2/3, 1.0, 4/3, 5/3, 2.0]
    expected = [7/3, 13/6, 2.0, 0.5, 0.75, 1.0, 0.875, 0.75, 0.625, 0.5, 1.5, 2.0, 2.5]
    out = interpolate(x, y, t, left=-1.0, right=-1.0)
    all_close(expected, out, 1e-6)


def test_ztf_bench_curve():
    # benches/lib.rs:10-337 — the reference's only end-to-end workload; pin
    # structural properties + spot values against a scalar re-implementation.
    grid = linspace(GRID_START, GRID_END, GRID_SIZE)
    out = interpolate(BENCH_X, BENCH_Y, grid, left=FILL_LEFT, right=FILL_RIGHT)
    assert out.shape == (GRID_SIZE,)
    # Targets before the first knot (58197.5) get the left fill
    assert np.all(out[grid < BENCH_X[0]] == FILL_LEFT)
    assert np.all(out[grid > BENCH_X[-1]] == FILL_RIGHT)
    # Scalar oracle: forward merge exactly as the reference's loop
    def scalar(t):
        if t < BENCH_X[0]:
            return FILL_LEFT
        if t > BENCH_X[-1]:
            return FILL_RIGHT
        i = int(np.searchsorted(BENCH_X, t, side="left"))
        if BENCH_X[i] == t:
            return BENCH_Y[i]
        a = (BENCH_X[i] - t) / (BENCH_X[i] - BENCH_X[i - 1])
        return a * BENCH_Y[i - 1] + (1 - a) * BENCH_Y[i]
    expected = np.array([scalar(t) for t in grid])
    all_close(expected, out, 1e-18)


def test_random_vs_scalar_oracle():
    rng = np.random.RandomState(42)
    for _ in range(20):
        x = np.sort(rng.uniform(0, 100, size=rng.randint(1, 50)))
        # inject duplicates
        if x.size > 3:
            x[2] = x[1]
        y = rng.uniform(-5, 5, size=x.size)
        t = np.sort(rng.uniform(-10, 110, size=30))
        out = interpolate(x, y, t, left=-7.0, right=9.0)
        for ti, oi in zip(t, out):
            i = int(np.searchsorted(x, ti, side="left"))
            if i == x.size:
                exp = 9.0
            elif x[i] == ti:
                exp = y[i]
            elif i == 0:
                exp = -7.0
            else:
                a = (x[i] - ti) / (x[i] - x[i - 1])
                exp = a * y[i - 1] + (1 - a) * y[i]
            assert abs(exp - oi) < 1e-12
