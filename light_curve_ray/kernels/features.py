"""Entropy- and error-based whole-series features from the
light-curve-feature catalog (/root/reference/README.md:18; public
definitions: Malanchev et al. 2021, MNRAS 502:5147, Table 1):
ConditionalEntropy (fixed-fold variant), EtaE, ExcessVariance,
MeanVariance, StetsonK, ReducedChi2 and LinearFit.

Cross-engine determinism contract (same discipline as kernels/shape.py):
phase bins are PURE INT64 arithmetic ((t mod P) * NPHI // P); magnitude
bins use the literally identical float expression on both sides
(floor((v - vmin) / (vmax - vmin) * NMAG)); sums that feed a slope are
computed around per-series means to avoid catastrophic cancellation, so
DuckDB-vs-numpy summation-order differences stay ulp-scale and the
shared two-step rounding (round(round(x, 9), 6)) collapses them.
"""

from __future__ import annotations

import numpy as np

# conditional-entropy grid: phase-fold period (1 day) and bin counts.
# The full Graham et al. 2013 period SEARCH composes this kernel over
# trial periods (the periodogram query's discipline); the feature row
# pins the fixed-fold entropy, which is what the SQL oracle can mirror.
CE_PERIOD_US = 86_400_000_000
CE_N_PHASE = 8
CE_N_MAG = 8


def conditional_entropy(t_us: np.ndarray, v: np.ndarray) -> float:
    """H(mag | phase) over the CE_N_PHASE x CE_N_MAG occupancy grid of
    the series folded at CE_PERIOD_US: sum p(phi,m) * ln(p(phi)/p(phi,m))
    (Graham et al. 2013).  NaN for a constant series (no mag bins)."""
    t_us = np.asarray(t_us, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    n = len(v)
    vmin = v.min()
    vmax = v.max()
    if not vmax > vmin:
        return float("nan")
    phase = (t_us % CE_PERIOD_US) * CE_N_PHASE // CE_PERIOD_US
    mag = np.minimum(CE_N_MAG - 1,
                     np.floor((v - vmin) / (vmax - vmin) * float(CE_N_MAG))
                     .astype(np.int64))
    code = phase * CE_N_MAG + mag
    cell = np.bincount(code, minlength=CE_N_PHASE * CE_N_MAG).astype(
        np.float64).reshape(CE_N_PHASE, CE_N_MAG)
    cphi = cell.sum(axis=1, keepdims=True)
    nz = cell > 0
    # p(phi,m) * ln(p(phi)/p(phi,m)) = (c/n) * ln(cphi/c)
    return float((cell[nz] / n
                  * np.log(np.broadcast_to(cphi, cell.shape)[nz]
                           / cell[nz])).sum())


TIME_FEATURES = (
    "n", "duration_s", "min_time_interval_s", "max_time_interval_s",
    "time_mean_s", "time_standard_deviation_s",
)


def time_features(t_us: np.ndarray) -> dict:
    """Sampling-cadence feature family over one series' time column
    (light-curve-feature catalog: ObservationCount, Duration,
    MinimumTimeInterval, MaximumTimeInterval, TimeMean,
    TimeStandardDeviation; Malanchev et al. 2021 Table 1):

    - ``n``: observation count.
    - ``duration_s``: t_max - t_min in seconds (exact: int64 diff then
      one divide — 0.0 for a single point, never NULL).
    - ``min_time_interval_s`` / ``max_time_interval_s``: extreme gaps
      between time-consecutive points (exact; duplicate timestamps give
      a legal 0.0 minimum, §1.1 of SURVEY; NULL when n < 2).
    - ``time_mean_s`` / ``time_standard_deviation_s``: mean and ddof=1
      std of (t - t_min) in seconds.  Relative-to-first-point keeps the
      summed magnitudes bounded (epoch-µs sums would exceed 2^53) and
      mirrors the oracle expression term-for-term; both are
      summation-order sensitive, so they ride the significant-digit
      rounding contract (_SIG_ROUND_COLS), not plain 6-dp.

    Returns python floats with NaN for NULL."""
    t_us = np.sort(np.asarray(t_us, dtype=np.int64))
    n = len(t_us)
    out = {"n": int(n), "duration_s": np.nan,
           "min_time_interval_s": np.nan, "max_time_interval_s": np.nan,
           "time_mean_s": np.nan, "time_standard_deviation_s": np.nan}
    if n == 0:
        return out
    out["duration_s"] = float(t_us[-1] - t_us[0]) / 1e6
    rel = (t_us - t_us[0]).astype(np.float64) / 1e6
    out["time_mean_s"] = float(rel.mean())
    if n < 2:
        return out
    dt = np.diff(t_us).astype(np.float64) / 1e6
    out["min_time_interval_s"] = float(dt.min())
    out["max_time_interval_s"] = float(dt.max())
    out["time_standard_deviation_s"] = float(rel.std(ddof=1))
    return out


def roms(v: np.ndarray, sigma: np.ndarray) -> float:
    """Roms — robust median statistic (Rose & Hintz 2007; in the
    light-curve-feature catalog): sum(|v_i - median(v)| / sigma_i)
    / (n - 1).  ~1 for non-variable series under correct errors, larger
    for genuine variability.  Median via np.percentile's lerp form
    (a + 0.5*(b - a)), not np.median's (a+b)/2 — the QUANTILE_CONT(0.5)
    expression shape, so even-n midpoints agree with the SQL oracle to
    the last ulp (the parity the percentile family pins).  NaN (NULL)
    when n < 2."""
    v = np.asarray(v, dtype=np.float64)
    if len(v) < 2:
        return float("nan")
    med = float(np.percentile(v, 50.0))
    return float((np.abs(v - med)
                  / np.asarray(sigma, dtype=np.float64)).sum()
                 / (len(v) - 1))


WEIGHTED_FEATURES = (
    "n", "weighted_mean", "reduced_chi2", "excess_variance",
    "mean_variance", "stetson_k", "stetson_j", "stetson_l", "eta_e",
    "slope", "slope_sigma", "fit_reduced_chi2",
)


def weighted_features(t_us: np.ndarray, v: np.ndarray,
                      sigma: np.ndarray) -> dict:
    """Error-aware feature family over one series with per-point
    uncertainties ``sigma`` (w = 1/sigma^2):

    - ``weighted_mean``: sum(w v) / sum(w).
    - ``reduced_chi2``: sum(w (v - wmean)^2) / (n - 1)  (NULL n < 2).
    - ``excess_variance``: (s^2 - <sigma^2>) / mean^2, s^2 the ddof=1
      sample variance, mean the PLAIN mean (NULL n < 2 or mean == 0).
    - ``mean_variance``: s / mean (NULL n < 2 or mean == 0).
    - ``stetson_k``: mean|d| / sqrt(mean d^2), d = (v - wmean) / sigma
      (Stetson 1996; the sqrt(n/(n-1)) factor cancels in the ratio;
      NULL when all residuals are zero).
    - ``stetson_j``: (1/(n-1)) * sum over TIME-consecutive pairs of
      sgn(P) * sqrt|P|, P = g_i * g_{i+1},
      g = sqrt(n/(n-1)) * (v - wmean) / sigma (Stetson 1996 J with the
      consecutive-pair kernel; NULL n < 2).
    - ``stetson_l``: J * K / 0.798 (Stetson 1996; NULL when either is).
    - ``eta_e``: Kim et al. 2014 irregular-sampling von Neumann ratio
      (t_n - t_1)^2 * sum((dv/dt)^2) / (s^2 (n-1)^3), dt in seconds,
      equal-timestamp pairs skipped (NULL n < 2, s == 0 or no valid pair).
    - ``slope`` / ``slope_sigma`` / ``fit_reduced_chi2``: weighted
      least-squares line v = a + b x, x = seconds since the series' first
      point; slope b = sum(w dx dy) / sum(w dx^2) around the weighted
      means, slope_sigma = sqrt(1 / sum(w dx^2)), chi2/(n-2)
      (light-curve-feature LinearFit; NULL n < 3 or degenerate x).

    Points are ordered by (t, v) internally; returns python floats with
    NaN for NULL."""
    t_us = np.asarray(t_us, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    sigma = np.asarray(sigma, dtype=np.float64)
    order = np.lexsort((v, t_us))
    ts, x, sg = t_us[order], v[order], sigma[order]
    n = len(x)
    w = 1.0 / (sg * sg)
    sw = w.sum()
    wmean = (w * x).sum() / sw
    out = {"n": int(n), "weighted_mean": float(wmean),
           "reduced_chi2": np.nan, "excess_variance": np.nan,
           "mean_variance": np.nan, "stetson_k": np.nan,
           "stetson_j": np.nan, "stetson_l": np.nan, "eta_e": np.nan,
           "slope": np.nan, "slope_sigma": np.nan,
           "fit_reduced_chi2": np.nan}
    d = (x - wmean) / sg
    msq = (d * d).mean()
    if msq > 0.0:
        out["stetson_k"] = float(np.abs(d).mean() / np.sqrt(msq))
    if n < 2:
        return out
    g = np.sqrt(n / (n - 1.0)) * d
    pk = g[:-1] * g[1:]
    out["stetson_j"] = float(
        (np.sign(pk) * np.sqrt(np.abs(pk))).sum() / (n - 1))
    if msq > 0.0:
        out["stetson_l"] = out["stetson_j"] * out["stetson_k"] / 0.798
    out["reduced_chi2"] = float((w * (x - wmean) ** 2).sum() / (n - 1))
    mean = x.mean()
    s2 = x.var(ddof=1)
    if mean != 0.0:
        out["excess_variance"] = float((s2 - (sg * sg).mean())
                                       / (mean * mean))
        out["mean_variance"] = float(np.sqrt(s2) / mean)
    # eta_e — dt from integer µs diffs divided once (shape.py discipline)
    dt = np.diff(ts).astype(np.float64) / 1e6
    dv = np.diff(x)
    ok = dt > 0.0
    if s2 > 0.0 and ok.any():
        span = float(ts[-1] - ts[0]) / 1e6
        out["eta_e"] = float(
            span * span * ((dv[ok] / dt[ok]) ** 2).sum()
            / (s2 * float(n - 1) ** 3))
    # weighted linear fit around the weighted means
    if n >= 3:
        xt = (ts - ts[0]).astype(np.float64) / 1e6
        mx = (w * xt).sum() / sw
        dx = xt - mx
        sxx = (w * dx * dx).sum()
        if sxx > 0.0:
            b = (w * dx * (x - wmean)).sum() / sxx
            a = wmean - b * mx
            resid = x - (a + b * xt)
            out["slope"] = float(b)
            out["slope_sigma"] = float(np.sqrt(1.0 / sxx))
            out["fit_reduced_chi2"] = float(
                (w * resid * resid).sum() / (n - 2))
    return out


def lttb(t: np.ndarray, v: np.ndarray, n_out: int):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — the canonical PLOT-grade reduction: keeps the first and last
    points, splits the interior into n_out-2 equal-count buckets, and
    from each bucket keeps the point forming the largest triangle with
    the previously SELECTED point and the NEXT bucket's centroid.  The
    left-anchor dependency makes the bucket loop inherently
    sequential (and not SQL-expressible — rows-only oracle), but each
    bucket's area evaluation is vectorized; the loop runs n_out-2
    times, i.e. OUTPUT-size iterations, never input-size.

    Inputs must be sorted by ``t``.  Returns the selected indices
    (int64, ascending).  n_out >= the series length returns all
    indices; n_out < 3 returns the endpoints.
    """
    n = len(t)
    if n_out >= n:
        return np.arange(n, dtype=np.int64)
    if n_out < 3 or n <= 2:
        return np.unique([0, n - 1]).astype(np.int64)
    t = np.asarray(t, np.float64)
    v = np.asarray(v, np.float64)
    # equal-count interior buckets over points 1..n-2 (the reference
    # formulation: linspace edges over the interior index range)
    edges = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
    out = np.empty(n_out, dtype=np.int64)
    out[0] = 0
    out[-1] = n - 1
    a = 0  # previously selected index
    for i in range(n_out - 2):
        s, e = edges[i], edges[i + 1]
        ns, ne = edges[i + 1], (n if i == n_out - 3 else edges[i + 2])
        cx, cy = t[ns:ne].mean(), v[ns:ne].mean()
        # twice the triangle area with anchor (a) and centroid (c)
        area = np.abs((t[a] - cx) * (v[s:e] - v[a])
                      - (t[a] - t[s:e]) * (cy - v[a]))
        a = s + int(np.argmax(area))  # first max wins ties
        out[i + 1] = a
    return out
