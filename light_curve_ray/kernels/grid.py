"""Uniform grids and time bucketing.

Reference: ``linspace`` at /root/reference/light-curve-common/src/linspace.rs:17-26 —
``size`` points, both endpoints inclusive, ``step = (end-start)/(size-1)``,
value ``start + step*i``.  The reference's edge hazards (size==0 underflow,
size==1 division by zero -> NaN) are deliberately fixed here: size==0 -> empty,
size==1 -> [start].

Bucketing extends the same fixed-step-grid idea to retention tiers: a tier's
bucket for time ``t`` is ``floor(t / step) * step`` and a series' grid is every
bucket from the first to the last observed one, endpoints inclusive (the
linspace contract).
"""

from __future__ import annotations

import numpy as np

# Retention tiers (microseconds) — north_star: 1h / 1d / 30d.
TIER_STEP_US = {
    "1h": 3_600_000_000,
    "1d": 86_400_000_000,
    "30d": 2_592_000_000_000,
}
TIERS = tuple(TIER_STEP_US)


def linspace(start: float, end: float, size: int) -> np.ndarray:
    """linspace.rs:17-26 semantics with the size 0/1 hazards fixed."""
    if size <= 0:
        return np.empty(0, dtype=np.float64)
    if size == 1:
        return np.array([start], dtype=np.float64)
    step = (end - start) / (size - 1)
    return start + step * np.arange(size, dtype=np.float64)


def bucket_floor(t_us, step_us: int):
    """Floor epoch-microsecond times onto a fixed-step grid.

    Integer floor division (rounds toward -inf for int64 in NumPy), so
    pre-epoch timestamps bucket consistently too.
    """
    t = np.asarray(t_us, dtype=np.int64)
    return (t // step_us) * step_us


def bucket_grid(tmin_us: int, tmax_us: int, step_us: int) -> np.ndarray:
    """All buckets from floor(tmin) to floor(tmax), endpoints inclusive
    (the linspace inclusive-endpoint contract, linspace.rs:21-25)."""
    lo = (int(tmin_us) // step_us) * step_us
    hi = (int(tmax_us) // step_us) * step_us
    return np.arange(lo, hi + step_us, step_us, dtype=np.int64)
