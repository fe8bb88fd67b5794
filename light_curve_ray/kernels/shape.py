"""Order-dependent whole-series shape features (Cusum, Eta, MaximumSlope,
percentile features) — the light-curve-feature extractor family the
reference README delegates to (/root/reference/README.md:17-18; public
definitions: Malanchev et al. 2021, MNRAS 502:5147, Table 1).

These features depend on the TIME ORDER of the observations, so they are
not mergeable from the packed per-bucket moment state
(kernels/moments.py): an unordered block's partial cannot know which
points are adjacent in time.  The engine therefore computes them on the
sorted-series path (one all-to-all sort co-locating each series, the same
exchange the gap-fill/Gorilla tail already pays), with each group's rows
re-ordered in-kernel by (t, v) so the result is independent of Ray's
block order.  Everything below is vectorized numpy per series — no Python
per-point loops.
"""

from __future__ import annotations

import numpy as np

SHAPE_FEATURES = (
    "n",
    "cusum",
    "eta",
    "maximum_slope",
    "median",
    "percent_amplitude",
    "inter_percentile_range_10",
    "median_abs_deviation",
    "median_buffer_range_percentage",
)


def shape_features(t_us: np.ndarray, v: np.ndarray) -> dict:
    """Whole-series shape features over one series' points.

    Input need not be sorted; points are ordered by (t_us, v) internally
    (the v tie-break makes equal-timestamp series deterministic).  Returns
    a dict of python floats (NaN where undefined, converted to NULL by the
    caller):

    - ``cusum``: max-min range of standardized cumulative sums
      S_m = (sum_{i<=m} v_i - m*mean) / (n*sigma), sample sigma
      (Kim et al. 2014 via Malanchev et al. 2021).  NULL when n < 2 or
      sigma == 0.
    - ``eta``: von Neumann ratio  sum (v_{i+1}-v_i)^2 / ((n-1) sigma^2).
      NULL when n < 2 or sigma == 0.
    - ``maximum_slope``: max |dv/dt| over time-consecutive points, dt in
      seconds; equal-timestamp pairs are skipped (dt == 0).  NULL when no
      valid pair exists.
    - ``median``, ``inter_percentile_range_10`` (q90 - q10) and
      ``percent_amplitude`` (max(vmax - median, median - vmin)): linear-
      interpolation quantiles (numpy default == SQL QUANTILE_CONT).
    - ``median_abs_deviation``: median(|v - median|) (Richards et al.
      2011 via Malanchev et al. 2021).
    - ``median_buffer_range_percentage``: fraction of points with
      |v - median| < 0.1 * amplitude, amplitude = (vmax - vmin)/2
      (Richards et al. 2011); 0.0 for a constant series.
    """
    t_us = np.asarray(t_us, dtype=np.int64)
    v = np.asarray(v, dtype=np.float64)
    order = np.lexsort((v, t_us))
    ts = t_us[order]
    x = v[order]
    n = len(x)
    mean = x.mean()
    med, q10, q90 = np.percentile(x, [50.0, 10.0, 90.0])
    absdev = np.abs(x - med)
    out = {
        "n": int(n),
        "median": float(med),
        "inter_percentile_range_10": float(q90 - q10),
        "percent_amplitude": float(max(x.max() - med, med - x.min())),
        "median_abs_deviation": float(np.percentile(absdev, 50.0)),
        # strict <, same float comparison the SQL mirror evaluates
        "median_buffer_range_percentage": float(
            np.mean(absdev < 0.1 * (x.max() - x.min()) / 2.0)),
        "cusum": np.nan,
        "eta": np.nan,
        "maximum_slope": np.nan,
    }
    if n < 2:
        return out
    var = x.var(ddof=1)
    sigma = np.sqrt(var)
    if sigma > 0.0:
        cum = np.cumsum(x) - np.arange(1, n + 1) * mean
        out["cusum"] = float((cum.max() - cum.min()) / (n * sigma))
        dv = np.diff(x)
        out["eta"] = float((dv * dv).sum() / ((n - 1) * var))
    # dt from INTEGER microsecond diffs, divided once — same algebra as
    # the SQL (t_us - pt)/1e6; converting each t to float seconds first
    # rounds the operands and shifts the slope in the 5th decimal
    dt = np.diff(ts).astype(np.float64) / 1e6
    dv = np.diff(x)
    valid = dt > 0.0
    if valid.any():
        out["maximum_slope"] = float(np.abs(dv[valid] / dt[valid]).max())
    return out


OTSU_FEATURES = ("n", "otsu_mean_diff", "otsu_std_lower",
                 "otsu_std_upper", "otsu_lower_ratio")


def otsu_split(v: np.ndarray) -> dict:
    """OtsuSplit (Otsu 1979 thresholding, in the light-curve-feature
    catalog per Malanchev et al. 2021): split the sorted values at the
    boundary maximizing the between-class variance
    w0*w1*(mu0-mu1)^2 (equivalently d*d*i*(n-i) with prefix-sum means —
    the /n^2 constant is monotone and dropped on BOTH sides), then report

    - ``otsu_mean_diff``:  mu_upper - mu_lower at the chosen split,
      computed FROM THE SAME prefix-sum expression the argmax used
      (exactly what the SQL oracle outputs);
    - ``otsu_std_lower`` / ``otsu_std_upper``: sample std of each class
      (NULL when the class has < 2 points — VAR_SAMP semantics);
    - ``otsu_lower_ratio``: lower-class fraction i/n.

    Argmax determinism across engines: the criterion is rounded at 9
    SIGNIFICANT digits (kernels/rounding.round_sig_away — the SQL mirror
    is pipelines/queries._sig_round_sql) before comparison, ties resolve
    to the smallest split index; prefix sums are SEQUENTIAL on both
    sides (np.cumsum here, ROWS UNBOUNDED PRECEDING running sum there),
    so the candidate values agree bit-for-bit given the same sorted
    multiset."""
    from .rounding import round_sig_away

    v = np.asarray(v, dtype=np.float64)
    n = len(v)
    out = {"n": int(n), "otsu_mean_diff": np.nan,
           "otsu_std_lower": np.nan, "otsu_std_upper": np.nan,
           "otsu_lower_ratio": np.nan}
    if n < 2:
        return out
    x = np.sort(v)
    cum = np.cumsum(x)
    total = cum[-1]
    i = np.arange(1, n, dtype=np.float64)
    cpre = cum[:-1]
    d = cpre / i - (total - cpre) / (n - i)
    crit = d * d * i * (n - i)
    # 9-significant-digit rounding collapses engine-vs-oracle ulps
    # BEFORE the argmax; ties -> smallest i (np.argmax takes the first)
    i_star = int(np.argmax(round_sig_away(crit, 9))) + 1
    out["otsu_mean_diff"] = float(-d[i_star - 1])
    out["otsu_lower_ratio"] = float(i_star) / n
    if i_star >= 2:
        out["otsu_std_lower"] = float(np.std(x[:i_star], ddof=1))
    if n - i_star >= 2:
        out["otsu_std_upper"] = float(np.std(x[i_star:], ddof=1))
    return out


def anderson_darling_normal(v: np.ndarray) -> float:
    """Anderson-Darling normality statistic with the finite-sample
    correction (1 + 4/n - 25/n^2) — light-curve-feature's
    AndersonDarlingNormal (catalog: Malanchev et al. 2021).

    A^2 = -n - (1/n) * sum_i (2i-1) [ln F(y_(i)) + ln(1 - F(y_(n+1-i)))]
    with y standardized by the sample mean/std and F the standard normal
    CDF.  NaN when n < 4 (the correction's usual validity floor) or the
    series is constant.  The normal CDF uses stdlib math.erf (libm) —
    there is no SQL mirror (DuckDB has no erf), so this feature is
    unit-oracle-only by design."""
    import math

    v = np.asarray(v, dtype=np.float64)
    n = len(v)
    if n < 4:
        return float("nan")
    sd = v.std(ddof=1)
    if not sd > 0.0:
        return float("nan")
    y = np.sort((v - v.mean()) / sd)
    erf = np.frompyfunc(math.erf, 1, 1)
    cdf = 0.5 * (1.0 + erf(y / math.sqrt(2.0)).astype(np.float64))
    eps = np.finfo(np.float64).tiny
    cdf = np.clip(cdf, eps, 1.0 - 1e-16)
    i = np.arange(1, n + 1, dtype=np.float64)
    a2 = -n - np.sum((2.0 * i - 1.0)
                     * (np.log(cdf) + np.log1p(-cdf[::-1]))) / n
    return float(a2 * (1.0 + 4.0 / n - 25.0 / (n * n)))
