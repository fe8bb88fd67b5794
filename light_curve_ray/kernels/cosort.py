"""Co-sort parallel arrays by the first one.

Reference: ``sort_multiple`` at
/root/reference/light-curve-common/src/sort_multiple.rs:20-37 — argsort of the
first slice, same permutation gathered through every slice (``reorder``,
sort_multiple.rs:39-41).  The reference uses an *unstable* sort and panics on
NaN keys; we improve on both for distributed determinism: stable argsort
(ties keep input order, so repeated runs and the oracle agree bit-for-bit)
and an explicit error on NaN keys.
"""

from __future__ import annotations

import numpy as np


def argsort_time(t: np.ndarray) -> np.ndarray:
    """Stable argsort of the time key; raises on NaN (reference panics,
    sort_multiple.rs:34 ``partial_cmp().unwrap()``)."""
    t = np.asarray(t)
    if t.dtype.kind == "f" and bool(np.isnan(t).any()):
        raise ValueError("NaN in sort key")
    return np.argsort(t, kind="stable")


def sort_multiple(arrays) -> list:
    """Sort every array by the first one; returns a list of new arrays.

    Empty input list -> [] (sort_multiple.rs:21-23); unequal lengths raise
    (sort_multiple.rs:28-31).
    """
    arrays = [np.asarray(a) for a in arrays]
    if not arrays:
        return []
    n = len(arrays[0])
    for a in arrays[1:]:
        if len(a) != n:
            raise ValueError("all arrays must have the same length")
    order = argsort_time(arrays[0])
    return [a[order] for a in arrays]
