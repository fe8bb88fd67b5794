"""Reference-exact linear interpolation / gap-fill kernel.

Reference: ``Interpolator::interpolate`` at
/root/reference/light-curve-interpol/src/lib.rs:27-72.  Semantics pinned by the
reference's own tests (src/lib.rs:79-197, transliterated in
tests/test_kernels_interp.py):

- one forward merge of ascending knots ``x``/``y`` against ascending targets;
- exact hit ``target == x[i]`` returns that knot's ``y``; with duplicated
  timestamps the FIRST duplicate wins (src/lib.rs:55 + test :141-154);
- interpolation between duplicates uses the LAST duplicate as the left knot
  (test :142-154: x=[0,1,1,2], y=[1,2,3,4] -> f(0.5)=1.5, f(1.5)=3.5);
- ``target < x[0]`` -> constant ``left`` fill (src/lib.rs:56);
- ``target > x[-1]`` -> constant ``right`` fill (src/lib.rs:68);
- interior: ``alpha = (x[r]-t)/(x[r]-x[l])``, result
  ``alpha*y[l] + (1-alpha)*y[r]`` (src/lib.rs:60-65);
- empty targets -> empty output (test :79-91); empty knots -> error
  (src/lib.rs:34, test :93-105); length mismatch -> error (src/lib.rs:33).

NOTE ``np.interp`` does NOT match these semantics (it clamps edges instead of
constant-filling with configurable values, and its behavior at duplicated x
differs), hence this explicit vectorized implementation via searchsorted:
``i = searchsorted(x, t, side="left")`` is exactly the reference's "advance
while target > right.x" stop index (smallest i with x[i] >= t).
"""

from __future__ import annotations

import numpy as np


def interpolate(
    x: np.ndarray,
    y: np.ndarray,
    target_x: np.ndarray,
    left: float,
    right: float,
) -> np.ndarray:
    """Vectorized equivalent of Interpolator::interpolate (src/lib.rs:32-71).

    ``x`` must be ascending (duplicates allowed), ``target_x`` ascending —
    the reference's implicit precondition (SURVEY §1.1).
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    t = np.asarray(target_x, dtype=np.float64)
    if x.shape != y.shape:
        raise ValueError("x and y should have same size")  # src/lib.rs:33
    if x.size == 0:
        raise ValueError("input arrays should have not zero-length")  # src/lib.rs:34
    out = np.empty(t.shape, dtype=np.float64)
    if t.size == 0:
        return out

    # Smallest i with x[i] >= t  ==  the knot where the forward merge stops.
    i = np.searchsorted(x, t, side="left")

    past_end = i == x.size  # target > every knot -> right fill (src/lib.rs:68)
    i_safe = np.where(past_end, x.size - 1, i)
    exact = (~past_end) & (x[i_safe] == t)  # first duplicate wins (src/lib.rs:55)
    before = (~past_end) & (~exact) & (i == 0)  # target < x[0] (src/lib.rs:56)
    interior = (~past_end) & (~exact) & (i > 0)

    out[past_end] = right
    out[before] = left
    out[exact] = y[i_safe[exact]]

    ii = i[interior]
    # x[ii-1] < t < x[ii] strictly (searchsorted side="left"), so the left
    # knot is automatically the LAST duplicate and the denominator is > 0.
    alpha = (x[ii] - t[interior]) / (x[ii] - x[ii - 1])  # src/lib.rs:61-63
    out[interior] = alpha * y[ii - 1] + (1.0 - alpha) * y[ii]  # src/lib.rs:64
    return out
