"""Decimal rounding that is bit-identical to DuckDB's ROUND(DOUBLE, n).

DuckDB rounds half AWAY from zero via the scaled floor/ceil formula below;
numpy/pyarrow round half to EVEN.  The difference is not theoretical: data
with short decimal representations (prices, integer weights) regularly
produces quotients that are exact binary ties at the 6th decimal
(e.g. 4675.4140625), and the driver's value-hash comparison needs the
engine and the SQL oracle to agree on every digit.  Verified empirically
against DuckDB 1.0 on 2000+ random and adversarial values
(tools/check_queries.py development history).
"""

from __future__ import annotations

import numpy as np


def round_decimals_away(x: np.ndarray, ndigits: int = 6) -> np.ndarray:
    """Round half away from zero at ``ndigits`` decimals (DuckDB ROUND)."""
    x = np.asarray(x, dtype=np.float64)
    p = 10.0 ** ndigits
    y = x * p
    with np.errstate(invalid="ignore"):
        out = np.where(x >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) / p
    # Normalize -0.0 -> +0.0: a tiny-negative value rounds to -0.0, which is
    # ==-equal but BYTE-different from +0.0, so the driver's value hash
    # diverges from the oracle unless both sides collapse the sign (the
    # oracle SQL appends `+ 0.0` for the same reason, see
    # pipelines/queries._tie_robust_sql).
    out = out + 0.0
    return np.where(np.isfinite(x), out, x)


def round_sig_away(x: np.ndarray, digits: int) -> np.ndarray:
    """Round half away from zero at ``digits`` SIGNIFICANT digits.

    For unbounded-magnitude features (reduced_chi2 reaches ~1e10 on
    price-scale data) a fixed 6-DECIMAL round demands ~17 agreeing digits
    — beyond double precision — so engine-vs-oracle merge-order ulps flip
    the last digit.  Relative rounding keeps the granularity a fixed 1e-6
    of the value.  The formula is the same scaled floor/ceil half-away
    DuckDB uses, with the scale anchored at floor(log10|x|); the oracle
    SQL mirrors it operation-for-operation (FLOOR/CEIL/POWER/LOG10 all hit
    the same libm on this host) — see pipelines/queries._sig_round_sql.

    The scale 10^k is computed with math.pow (libm — what DuckDB's POWER
    calls), NOT np.power: numpy special-cases integer-valued exponents via
    repeated multiplication and returns e.g. 10^-5 one ulp BELOW the
    correctly-rounded double, which shifts the rounded representative
    (verified bit-level against DuckDB this round)."""
    import math

    x = np.asarray(x, dtype=np.float64)
    out = x + 0.0  # also normalizes -0.0 for untouched entries
    m = np.isfinite(x) & (x != 0.0)
    if not m.any():
        return out
    xm = x[m]
    e = np.floor(np.log10(np.abs(xm)))
    ks, inv = np.unique(e - (digits - 1), return_inverse=True)
    p = np.array([math.pow(10.0, float(k)) for k in ks])[inv]
    y = xm / p
    r = np.where(xm >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)) * p
    out[m] = r + 0.0
    return out


def round_sig6_tie_robust(x: np.ndarray) -> np.ndarray:
    """Two-step 9-sig→6-sig half-away rounding (the relative-granularity
    twin of round6_tie_robust, same tie-collapse rationale)."""
    return round_sig_away(round_sig_away(x, 9), 6)


def round6_tie_robust(x: np.ndarray) -> np.ndarray:
    """Two-step 9-dp→6-dp half-away rounding, mirrored by the oracle SQL's
    ROUND(ROUND(x, 9), 6).

    The engine and the SQL oracle sum doubles in different orders, so a
    value can land a last-ulp APART across an exact 6-dp tie boundary
    (x.xxxxxx5): half-away rounding then flips the 6th digit on one side
    only — observed on real data (price-like values, ~1 cell in 10⁵ at
    sf0.1).  Rounding to 9 dp first collapses any ≤5e-10 discrepancy onto
    the same representative on BOTH sides before the 6-dp round, shrinking
    the exposure window by ~10³ (now only exact 9-dp ties — none observed
    — remain sensitive)."""
    return round_decimals_away(round_decimals_away(x, 9), 6)
