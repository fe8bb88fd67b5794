"""Dynamic Time Warping — THE classic elastic similarity measure for
time series (Sakoe & Chiba 1978; Berndt & Clifford 1994): the minimal
cumulative |a_i − b_j| cost over monotone alignments, tolerant to local
time shifts/stretches that defeat pointwise (Euclidean) comparison.

Kernel layer: pure numpy DP, no Ray imports.  The DP is O(n·m) with an
optional Sakoe-Chiba band (|i−j| ≤ band) that makes it O(n·band) — the
standard accuracy/cost trade for long series.  Deterministic: the DP
recurrence min(up, left, diag) on identical doubles is order-free.
"""

from __future__ import annotations

import numpy as np


def dtw_distance(a: np.ndarray, b: np.ndarray,
                 band: int | None = None) -> float:
    """DTW distance with |.| local cost; ``band`` = Sakoe-Chiba radius
    (None = unconstrained).  Returns inf when the band disconnects the
    corner cells (band < |n−m|)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return float("inf")
    if band is not None and band < abs(n - m):
        return float("inf")
    prev = np.full(m + 1, np.inf)
    prev[0] = 0.0
    cur = np.empty(m + 1)
    for i in range(1, n + 1):
        cur[:] = np.inf
        lo, hi = 1, m
        if band is not None:
            lo = max(1, i - band)
            hi = min(m, i + band)
        cost = np.abs(a[i - 1] - b[lo - 1:hi])
        # vectorized over j is impossible (cur[j-1] dependency), but the
        # row loop touches only the band window
        for j in range(lo, hi + 1):
            c = cost[j - lo]
            cur[j] = c + min(prev[j], cur[j - 1], prev[j - 1])
        prev, cur = cur, prev
        prev[0] = np.inf if i > 0 else 0.0
    return float(prev[m])


def dtw_distance_matrix(series: list, band: int | None = None):
    """Unordered-pair DTW matrix over a list of 1-D arrays; returns
    (i_idx, j_idx, dist) arrays with i < j."""
    k = len(series)
    ii, jj, dd = [], [], []
    for i in range(k):
        for j in range(i + 1, k):
            ii.append(i)
            jj.append(j)
            dd.append(dtw_distance(series[i], series[j], band=band))
    return (np.asarray(ii, np.int64), np.asarray(jj, np.int64),
            np.asarray(dd, np.float64))
