"""dm-dt kernel oracles: the lag-loop grid must equal a brute-force
O(n^2) pair enumeration, be order-independent, and respect the
integer-edge/off-grid drop contract (kernels/dmdt.py)."""

from __future__ import annotations

import numpy as np

from light_curve_ray.kernels.dmdt import (
    DM_MIN,
    DM_WIDTH,
    DT_EDGES_US,
    N_DM,
    N_DT,
    dmdt_counts,
)


def _brute(t_us, v):
    order = np.lexsort((v, t_us))
    ts, x = np.asarray(t_us)[order], np.asarray(v)[order]
    grid = np.zeros((N_DT, N_DM), np.int64)
    edges = np.asarray(DT_EDGES_US)
    n = len(ts)
    for i in range(n):
        for j in range(i + 1, n):
            dt = ts[j] - ts[i]
            dm = x[j] - x[i]
            db = int(np.searchsorted(edges, dt, side="right")) - 1
            mb = int(np.floor((dm - DM_MIN) / DM_WIDTH))
            if 0 <= db < N_DT and dt < edges[-1] and 0 <= mb < N_DM:
                grid[db, mb] += 1
    return grid


def test_dmdt_matches_bruteforce():
    rng = np.random.RandomState(7)
    n = 120
    t = np.cumsum(rng.randint(1, 10**8, n)).astype(np.int64)
    v = rng.normal(0, 100, n)
    got = dmdt_counts(t, v)
    assert np.array_equal(got, _brute(t, v))
    # some pairs must actually land on-grid for the test to mean anything
    assert got.sum() > 0


def test_dmdt_order_independent_and_edges():
    rng = np.random.RandomState(11)
    n = 60
    t = np.cumsum(rng.randint(1, 10**9, n)).astype(np.int64)
    v = rng.normal(0, 50, n)
    base = dmdt_counts(t, v)
    perm = rng.permutation(n)
    assert np.array_equal(base, dmdt_counts(t[perm], v[perm]))

    # sub-second pairs, equal-timestamp pairs and >=30d pairs are dropped
    t2 = np.array([0, 0, 500_000, 10**13], np.int64)  # 0, 0, 0.5s, ~115d
    v2 = np.array([1.0, 2.0, 3.0, 4.0])
    assert dmdt_counts(t2, v2).sum() == 0

    # a pair EXACTLY on a bin's lower edge lands in that bin
    t3 = np.array([0, DT_EDGES_US[3]], np.int64)
    v3 = np.array([0.0, 1.0])
    g = dmdt_counts(t3, v3)
    assert g.sum() == 1
    assert g[3, int((1.0 - DM_MIN) // DM_WIDTH)] == 1

    # |dm| >= 512 is off-grid
    t4 = np.array([0, 10**10], np.int64)
    v4 = np.array([0.0, 512.0])
    assert dmdt_counts(t4, v4).sum() == 0


def test_dmdt_gausses_small_sigma_limit_and_mass():
    from light_curve_ray.kernels.dmdt import dmdt_gausses

    rng = np.random.RandomState(13)
    n = 100
    t = np.cumsum(rng.randint(1, 10**8, n)).astype(np.int64)
    v = rng.normal(0, 100, n)
    counts = dmdt_counts(t, v)

    # sigma -> 0: the smeared grid converges on the count grid wherever
    # dm is not within ~4 sigma of a bin edge (tiny sigma makes that all
    # cells here)
    tiny = dmdt_gausses(t, v, np.full(n, 1e-6))
    assert np.abs(tiny - counts).max() < 1e-6

    # moderate sigma: mass is conserved up to grid-border clipping and
    # the ±4-sigma window (pairs whose dm center is off-grid may now
    # leak mass INTO the grid, so totals can exceed the count total a
    # little; bound both sides loosely)
    g = dmdt_gausses(t, v, np.full(n, 5.0))
    per_dt_counts = counts.sum(axis=1)
    per_dt_mass = g.sum(axis=1)
    assert np.all(per_dt_mass <= per_dt_counts + 2.0 + 1e-9)
    assert np.all(per_dt_mass >= per_dt_counts * 0.8 - 2.0)

    # order invariance
    perm = rng.permutation(n)
    g2 = dmdt_gausses(t[perm], v[perm], np.full(n, 5.0))
    assert np.allclose(g, g2, atol=1e-12)


def test_dmdt_gausses_single_pair_exact_mass():
    import math

    from light_curve_ray.kernels.dmdt import dmdt_gausses

    # one pair: dm = 10, sigma_pair = sqrt(2)*3; mass in bin k must be
    # Phi((edge_hi-10)/s) - Phi((edge_lo-10)/s) computed directly
    t = np.array([0, 10**10], np.int64)
    v = np.array([0.0, 10.0])
    g = dmdt_gausses(t, v, np.full(2, 3.0))
    s = math.sqrt(18.0)
    db = int(np.searchsorted(np.asarray(DT_EDGES_US), 10**10, "right")) - 1

    def phi(z):
        return 0.5 * (1 + math.erf(z / math.sqrt(2)))

    for k in range(N_DM):
        lo = DM_MIN + k * DM_WIDTH
        hi = lo + DM_WIDTH
        exp = phi((hi - 10.0) / s) - phi((lo - 10.0) / s)
        if exp > 1e-5:  # inside the evaluated ±4-sigma window
            assert abs(g[db, k] - exp) < 1e-6, k
    assert abs(g.sum() - 1.0) < 1e-4  # whole pair mass on-grid


def test_dmdt_lag_stride_partitions_exactly():
    rng = np.random.RandomState(23)
    n = 150
    t = np.cumsum(rng.randint(1, 10**8, n)).astype(np.int64)
    v = rng.normal(0, 100, n)
    full = dmdt_counts(t, v)
    for step in (2, 3, 7):
        acc = np.zeros_like(full)
        for off in range(1, step + 1):
            acc += dmdt_counts(t, v, lag_stride=(off, step))
        assert np.array_equal(acc, full), step
