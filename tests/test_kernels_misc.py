"""Golden tests for linspace / sort_multiple / all_close / grid —
transliterated from the reference (FIXTURES.md F4 items 7-9)."""

import numpy as np
import pytest

from light_curve_ray.kernels import all_close, bucket_floor, bucket_grid, linspace, sort_multiple
from light_curve_ray.kernels.grid import TIER_STEP_US


class TestLinspace:
    def test_doctest(self):
        # linspace.rs:8-16
        a = linspace(0.0, 1.0, 3)
        assert a[0] == 0.0 and a[1] == 0.5 and a[2] == 1.0

    def test_two_points(self):
        # linspace.rs:34-39
        all_close([0.0, 1.0], linspace(0.0, 1.0, 2), 1e-6)

    def test_three_points(self):
        # linspace.rs:41-46
        all_close([-1.0, 0.0, 1.0], linspace(-1.0, 1.0, 3), 1e-12)

    def test_many_points(self):
        # linspace.rs:48-53
        all_close(np.arange(101, dtype=np.float64), linspace(0.0, 100.0, 101), 1e-6)

    def test_size_edge_cases_fixed(self):
        # The reference's size==0/1 hazards are fixed (SURVEY §2a-R3)
        assert linspace(0.0, 1.0, 0).size == 0
        np.testing.assert_array_equal(linspace(5.0, 9.0, 1), [5.0])


class TestSortMultiple:
    def test_doctest(self):
        # sort_multiple.rs:5-19
        a, b = [1, 2, 3, 0, 4], [3, 2, 1, 4, 0]
        sa, sb = sort_multiple([a, b])
        np.testing.assert_array_equal(sa, [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(sb, [4, 3, 2, 1, 0])

    def test_three(self):
        # sort_multiple.rs:67-81
        out = sort_multiple([[5, 4, 3, 2, 1, 0], [5, 4, 3, 2, 1, 0], [0, 1, 2, 3, 4, 5]])
        np.testing.assert_array_equal(out[0], [0, 1, 2, 3, 4, 5])
        np.testing.assert_array_equal(out[1], [0, 1, 2, 3, 4, 5])
        np.testing.assert_array_equal(out[2], [5, 4, 3, 2, 1, 0])

    def test_random_vs_zip_sort_unzip(self):
        # sort_multiple.rs:56-65
        rng = np.random.RandomState(42)
        a = rng.rand(100)
        b = rng.rand(100)
        pairs = sorted(zip(a, b))
        sa, sb = sort_multiple([a, b])
        np.testing.assert_array_equal(sa, [p[0] for p in pairs])
        np.testing.assert_array_equal(sb, [p[1] for p in pairs])

    def test_empty_input(self):
        # sort_multiple.rs:21-23
        assert sort_multiple([]) == []

    def test_length_mismatch(self):
        # sort_multiple.rs:28-31
        with pytest.raises(ValueError):
            sort_multiple([[1, 2], [1]])

    def test_nan_key_raises(self):
        # reference panics via partial_cmp().unwrap() (sort_multiple.rs:34)
        with pytest.raises(ValueError):
            sort_multiple([[1.0, np.nan], [1.0, 2.0]])


class TestAllClose:
    def test_happy(self):
        # allclose.rs:9-13
        all_close([0.0, 1.0], [0.0001, 0.9998], 1e-2)

    def test_length_mismatch(self):
        # allclose.rs:15-19 (should_panic)
        with pytest.raises(AssertionError):
            all_close([0.0], [0.0, 1.0], 1e-6)

    def test_tolerance_violation(self):
        # allclose.rs:21-25 (should_panic); strict <, absolute only
        with pytest.raises(AssertionError):
            all_close([1e-3, 1.0], [0.0, 1.0], 1e-4)

    def test_nan_fails(self):
        with pytest.raises(AssertionError):
            all_close([np.nan], [0.0], 1.0)


class TestBucketing:
    def test_floor(self):
        h = TIER_STEP_US["1h"]
        ts = np.array([0, h - 1, h, h + 1, 3 * h + 7], dtype=np.int64)
        np.testing.assert_array_equal(bucket_floor(ts, h), [0, 0, h, h, 3 * h])

    def test_floor_negative(self):
        h = TIER_STEP_US["1h"]
        np.testing.assert_array_equal(bucket_floor(np.array([-1], dtype=np.int64), h), [-h])

    def test_grid_inclusive_endpoints(self):
        # inclusive both ends — the linspace contract (linspace.rs:21-25)
        h = TIER_STEP_US["1h"]
        g = bucket_grid(h + 5, 3 * h + 5, h)
        np.testing.assert_array_equal(g, [h, 2 * h, 3 * h])

    def test_grid_single_bucket(self):
        h = TIER_STEP_US["1h"]
        g = bucket_grid(5, 10, h)
        np.testing.assert_array_equal(g, [0])
