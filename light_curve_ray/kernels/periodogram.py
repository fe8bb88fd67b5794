"""Lomb-Scargle periodogram kernel — THE classic irregular-time-series
spectral statistic (Lomb 1976, Scargle 1982; the `light-curve-feature`
catalog's Periodogram family pointed at by the reference README).

Classic form with the tau phase offset that makes the statistic
invariant to time translation:

    tan(2 w tau) = sum sin(2 w t_i) / sum cos(2 w t_i)
    theta_i = w (t_i - tau)
    P(w) = [ (sum d_i cos theta_i)^2 / sum cos^2 theta_i
           + (sum d_i sin theta_i)^2 / sum sin^2 theta_i ] / 2

with d_i = v_i - mean(v), normalized by the sample variance
sum d^2 / (n-1) so white noise gives E[P] ~ 1.  Times are shifted to
t - min(t) before any trig (epoch-microsecond magnitudes would throw
away all the precision libm needs).

No Ray imports (kernel layer); vectorized over the whole frequency grid
in one (n_freq, n_points) broadcast.  The SQL oracle evaluates the same
formula operation-for-operation with DuckDB's SIN/COS/ATAN2 (same libm).
"""

from __future__ import annotations

import numpy as np


def lomb_scargle(t_sec: np.ndarray, v: np.ndarray,
                 omegas: np.ndarray) -> np.ndarray:
    """Normalized Lomb-Scargle power at each angular frequency.

    ``t_sec``: sample times in seconds (any offset; shifted internally),
    ``v``: values, ``omegas``: angular frequencies (rad/s).  Returns
    float64[len(omegas)]; NaN when n < 2 or variance is 0.
    """
    t = np.asarray(t_sec, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    n = t.size
    out = np.full(len(omegas), np.nan)
    if n < 2:
        return out
    t = t - t.min()
    ybar = v.mean()
    d = v - ybar
    s2 = (d * d).sum() / (n - 1)
    if not np.isfinite(s2) or s2 <= 0.0:
        return out
    w = np.asarray(omegas, dtype=np.float64)[:, None]  # (F, 1)
    two_wt = 2.0 * w * t[None, :]
    tau = np.arctan2(np.sin(two_wt).sum(axis=1),
                     np.cos(two_wt).sum(axis=1)) / (2.0 * w[:, 0])
    theta = w * (t[None, :] - tau[:, None])
    c = np.cos(theta)
    s = np.sin(theta)
    cd = (d[None, :] * c).sum(axis=1)
    sd = (d[None, :] * s).sum(axis=1)
    cc = (c * c).sum(axis=1)
    ss = (s * s).sum(axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        p = 0.5 * (cd * cd / cc + sd * sd / ss) / s2
    return p


def gls_power(t_sec: np.ndarray, v: np.ndarray,
              omegas: np.ndarray) -> np.ndarray:
    """GENERALIZED Lomb-Scargle power (Zechmeister & Kürsten 2009,
    A&A 496, 577): the floating-mean variant — the constant offset is
    fit TOGETHER with the sinusoid at every frequency, so the
    statistic stays correct when the sampling window biases the sample
    mean away from the true mean (the classic LS failure mode on
    gappy astronomical cadences; the `light-curve-feature` catalog's
    periodogram family ships exactly this fix).  Uniform weights
    w_i = 1/n; normalized to [0, 1]:

        P(w) = [SS·YC² + CC·YS² − 2·CS·YC·YS] / (YY·D),  D = CC·SS − CS²

    with the hatted (mean-subtracted) second moments of ZK09 eq. 5-12.
    Returns float64[len(omegas)]; NaN when n < 3 or variance is 0.
    The SQL oracle evaluates the identical expression tree."""
    t = np.asarray(t_sec, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    n = t.size
    out = np.full(len(omegas), np.nan)
    if n < 3:
        return out
    t = t - t.min()
    wgt = 1.0 / n
    y = (wgt * v).sum()
    yy = (wgt * v * v).sum() - y * y
    if not np.isfinite(yy) or yy <= 0.0:
        return out
    w = np.asarray(omegas, dtype=np.float64)[:, None]  # (F, 1)
    th = w * t[None, :]
    cth = np.cos(th)
    sth = np.sin(th)
    c = (wgt * cth).sum(axis=1)
    s = (wgt * sth).sum(axis=1)
    yc = (wgt * v[None, :] * cth).sum(axis=1) - y * c
    ys = (wgt * v[None, :] * sth).sum(axis=1) - y * s
    cc = (wgt * cth * cth).sum(axis=1) - c * c
    ss = (wgt * sth * sth).sum(axis=1) - s * s
    cs = (wgt * cth * sth).sum(axis=1) - c * s
    d = cc * ss - cs * cs
    with np.errstate(divide="ignore", invalid="ignore"):
        p = (ss * yc * yc + cc * ys * ys - 2.0 * cs * yc * ys) / (yy * d)
    return p
