"""dm-dt map kernel: per-series 2-D histogram of (magnitude change,
time lag) over all time-ordered point pairs.

The reference ecosystem ships this as the light-curve-dmdt crate
(/root/reference/README.md:17; Mahabal et al. 2017, arXiv 1709.06257):
each light curve maps to a small image whose cell (j, k) counts pairs
with dt in log-spaced bin j and dm in linear bin k — the standard
variability fingerprint fed to CNN classifiers.

Grid contract (shared with the SQL oracle): dt bins are PRECOMPUTED
INTEGER microsecond edges (log10-spaced from 1 s to 30 d), so binning is
pure int64 comparison on both sides — no transcendental (log10) is ever
evaluated on data, eliminating libm-vs-DuckDB float-edge risk.  dm bins
are linear over [DM_MIN, DM_MAX) via floor((dm - DM_MIN) / DM_WIDTH) —
plain IEEE subtract/divide/floor, bit-deterministic across both engines.
Out-of-grid pairs (dt < 1 s, including equal-timestamp pairs; dt >= 30 d;
dm < -512 or dm >= 512 — the half-open grid keeps dm == -512 exactly in
bin 0) are dropped, matching light-curve-dmdt's drop-off-grid semantics.

The pair enumeration is a LAG LOOP over the time-sorted series: for lag
L, dt = t[L:] - t[:-L] vectorized over the whole series (memory O(n),
work O(pairs)).  Because the series is sorted, per-index dt is
nondecreasing in L, so the loop STOPS at the first lag whose minimum dt
exceeds the last edge — total work is proportional to pairs WITHIN the
30-day window, not n^2, which is what makes long archival series
tractable.
"""

from __future__ import annotations

import math

import numpy as np

N_DT = 16
N_DM = 16
LG_DT_MIN = 0.0                        # 10^0 s = 1 second
LG_DT_MAX = math.log10(2_592_000.0)    # 30 days in seconds
DM_MIN = -512.0
DM_MAX = 512.0
DM_WIDTH = (DM_MAX - DM_MIN) / N_DM

# integer microsecond edges, len N_DT+1; bin j holds EDGES[j] <= dt < EDGES[j+1]
DT_EDGES_US = tuple(
    int(round(10.0 ** (LG_DT_MIN + j * (LG_DT_MAX - LG_DT_MIN) / N_DT) * 1e6))
    for j in range(N_DT + 1))


def dmdt_counts(t_us: np.ndarray, v: np.ndarray,
                lag_stride: tuple | None = None) -> np.ndarray:
    """(N_DT, N_DM) int64 pair-count grid for one series.

    Input need not be sorted; points are ordered by (t, v) internally so
    the result is independent of Ray block order.  dm is later-minus-
    earlier value.

    ``lag_stride=(offset, step)`` counts only lags ≡ offset (mod step),
    offset in [1, step] — the lag set partitions disjointly across
    offsets, so the per-offset grids SUM to the full grid exactly
    (integer counts).  This is the few-big-series parallelism hook: the
    pipeline fans one series out as `step` strided partials so a handful
    of giant series can use the whole pool (q_dmdt_map); many-small-
    series inputs keep the one-call-per-series path."""
    t_us = np.asarray(t_us, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    order = np.lexsort((v, t_us))
    ts = t_us[order]
    x = v[order]
    n = len(ts)
    edges = np.asarray(DT_EDGES_US, dtype=np.int64)
    flat = np.zeros(N_DT * N_DM, dtype=np.int64)
    start, step = (1, 1) if lag_stride is None else (
        lag_stride[0], lag_stride[1])
    for lag in range(start, n, step):
        dt = ts[lag:] - ts[:-lag]
        if dt.min() >= edges[-1]:
            break  # sorted series: every larger lag is also off-grid
        # in-window mask FIRST: at large lags most pairs sit beyond the
        # 30-day edge, and compressing before the searchsorted/floor work
        # cuts the dense-series constant ~3x (dm is only gathered for
        # surviving indices)
        m0 = (dt >= edges[0]) & (dt < edges[-1])
        k = int(np.count_nonzero(m0))
        if k == 0:
            continue
        if 2 * k > len(dt):
            # dense window: one full-vector subtract beats two gathers
            dtm = dt[m0]
            dm = (x[lag:] - x[:-lag])[m0]
        else:
            idx = np.nonzero(m0)[0]
            dtm = dt[idx]
            dm = x[idx + lag] - x[idx]
        db = np.searchsorted(edges, dtm, side="right") - 1
        mb = np.floor((dm - DM_MIN) / DM_WIDTH)
        valid = (mb >= 0.0) & (mb < N_DM)
        if valid.any():
            code = db[valid] * N_DM + mb[valid].astype(np.int64)
            flat += np.bincount(code, minlength=N_DT * N_DM)
    return flat.reshape(N_DT, N_DM)


def dt_edges_sql_values() -> str:
    """`(bin, lo_us, hi_us)` VALUES rows for the oracle's edge join —
    the SAME integer literals the kernel compares against."""
    return ", ".join(
        f"({j}, {DT_EDGES_US[j]}, {DT_EDGES_US[j + 1]})"
        for j in range(N_DT))


def _norm_cdf(z: np.ndarray) -> np.ndarray:
    """Standard normal CDF via the Abramowitz & Stegun 7.1.26 erf
    polynomial (|error| < 1.5e-7), vectorized — numpy has no erf and
    scipy is not in the runtime.  Deterministic; used only by the
    rows-only gausses kernel (never by an SQL-paired query)."""
    x = z / np.sqrt(2.0)
    ax = np.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf = 1.0 - poly * np.exp(-ax * ax)
    return 0.5 * (1.0 + np.sign(x) * erf)


def dmdt_gausses(t_us: np.ndarray, v: np.ndarray,
                 sigma: np.ndarray) -> np.ndarray:
    """(N_DT, N_DM) float64 Gaussian-smeared dm-dt map — the
    light-curve-dmdt crate's `gausses` mode: each in-dt-window pair
    contributes, instead of a unit count, the normal probability mass
    it places in each dm bin, with per-pair spread
    sigma_pair = sqrt(sigma_i^2 + sigma_j^2) (photometric errors add in
    quadrature).  mass(bin k) = Phi((edge_{k+1}-dm)/s) - Phi((edge_k-dm)/s).

    Only bins within ±4 sigma of each pair's dm are evaluated (the rest
    carry < 3e-5 mass; with survey-scale errors << the 64-wide dm bins
    that is 1-3 bins per pair), so the cost stays a small constant over
    the count kernel's.  Same lag-loop window bound as dmdt_counts.
    Rows-only BY DESIGN: erf has no SQL mirror; unit oracles pin the
    sigma->0 limit against dmdt_counts, per-pair mass conservation and
    order invariance (tests/test_dmdt.py)."""
    t_us = np.asarray(t_us, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    order = np.lexsort((v, t_us))
    ts, x, sg = t_us[order], v[order], sigma[order]
    n = len(ts)
    edges = np.asarray(DT_EDGES_US, dtype=np.int64)
    grid = np.zeros((N_DT, N_DM), dtype=np.float64)
    for lag in range(1, n):
        dt = ts[lag:] - ts[:-lag]
        if dt.min() >= edges[-1]:
            break
        idx = np.nonzero((dt >= edges[0]) & (dt < edges[-1]))[0]
        if len(idx) == 0:
            continue
        db = np.searchsorted(edges, dt[idx], side="right") - 1
        dm = x[idx + lag] - x[idx]
        sp = np.sqrt(sg[idx + lag] ** 2 + sg[idx] ** 2)
        c = (dm - DM_MIN) / DM_WIDTH        # float dm-bin coordinate
        sb = sp / DM_WIDTH                  # spread in bin units
        kc = np.floor(c).astype(np.int64)
        kmax = int(np.ceil(4.0 * sb.max()))
        prev_cdf = _norm_cdf((kc - kmax - c) / sb)
        for off in range(-kmax, kmax + 1):
            k = kc + off
            cur_cdf = _norm_cdf((k + 1 - c) / sb)
            mass = cur_cdf - prev_cdf
            prev_cdf = cur_cdf
            ok = (k >= 0) & (k < N_DM)
            if ok.any():
                code = db[ok] * N_DM + k[ok]
                grid += np.bincount(
                    code, weights=mass[ok],
                    minlength=N_DT * N_DM).reshape(N_DT, N_DM)
    return grid
