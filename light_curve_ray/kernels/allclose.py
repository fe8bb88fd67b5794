"""Absolute-tolerance comparison.

Reference: ``all_close`` at /root/reference/light-curve-common/src/allclose.rs:26-41 —
length check first, then strict ``|x - y| < tol`` for every pair (absolute
tolerance only, no rtol); any NaN fails the comparison.
"""

from __future__ import annotations

import numpy as np


def all_close(actual, desired, tol: float) -> None:
    """Raise AssertionError unless ``actual`` and ``desired`` are elementwise
    within absolute tolerance ``tol`` (strict ``<``, as the reference).

    Mirrors allclose.rs:30 (length assert) and allclose.rs:31-40 (strict
    absolute comparison with both slices in the failure message).
    """
    a = np.asarray(actual, dtype=np.float64)
    d = np.asarray(desired, dtype=np.float64)
    if a.shape != d.shape:
        raise AssertionError(f"length mismatch: {a.shape} vs {d.shape}")
    ok = np.abs(a - d) < tol
    # NaN comparisons are False, matching the reference's Float semantics.
    if not bool(np.all(ok)):
        raise AssertionError(f"Slices are not close:\n{a!r}\n{d!r}\n")
