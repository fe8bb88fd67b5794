"""Gorilla codec property tests: encode -> decode == identity, including
NaN / -0.0 payloads and all delta-of-delta classes (SURVEY §5)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from light_curve_ray.kernels import gorilla_decode, gorilla_encode


def _roundtrip(t, v):
    t = np.asarray(t, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    dt, dv = gorilla_decode(gorilla_encode(t, v))
    np.testing.assert_array_equal(dt, t)
    np.testing.assert_array_equal(dv.view(np.uint64), v.view(np.uint64))


def test_empty():
    _roundtrip([], [])


def test_single():
    _roundtrip([1_700_000_000_000_000], [3.14])


def test_uniform_grid_compresses_well():
    h = 3_600_000_000
    t = np.arange(0, 720 * h, h, dtype=np.int64)
    v = np.full(720, 42.5)
    blob = gorilla_encode(t, v)
    # constant deltas + constant values -> ~1 bit/point each stream
    assert len(blob) < 720  # vs 11520 bytes raw
    _roundtrip(t, v)


def test_all_dod_classes():
    # deltas engineered to hit the 0 / 7-bit / 9-bit / 12-bit / 64-bit classes
    deltas = [100, 100, 164, 40, 300, 50, 2000, 10, 10**10, 5]
    t = np.cumsum([0] + deltas).astype(np.int64)
    v = np.linspace(0, 1, len(t))
    _roundtrip(t, v)


def test_special_floats():
    t = np.arange(6, dtype=np.int64) * 1000
    v = np.array([0.0, -0.0, np.nan, np.inf, -np.inf, 1e-300])
    _roundtrip(t, v)


def test_negative_timestamps():
    _roundtrip([-10**15, -10**14, 0, 10**15], [1.0, 2.0, 3.0, 4.0])


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10**12), min_size=0, max_size=200),
    st.integers(min_value=0, max_value=2**32),
)
def test_roundtrip_property(deltas, seed):
    t = np.cumsum([1_600_000_000_000_000] + deltas).astype(np.int64)
    rng = np.random.RandomState(seed % 2**31)
    v = rng.normal(1000.0, 250.0, len(t))
    v[rng.rand(len(t)) < 0.05] = np.nan
    _roundtrip(t, v)


def test_deterministic_bytes():
    t = np.arange(10, dtype=np.int64) * 3_600_000_000
    v = np.arange(10, dtype=np.float64) * 1.5
    assert gorilla_encode(t, v) == gorilla_encode(t, v)
