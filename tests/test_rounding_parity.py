"""Property tests for the DuckDB rounding-parity contract
(kernels/rounding): the driver's value-hash comparison requires the
engine's final rounding to agree with the oracle SQL's ROUND on every
digit, including exact binary ties at the 6th decimal — the class of
values that actually flipped a hash at sf0.1 (BASELINE.md round-2 notes).
"""

import duckdb
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from light_curve_ray.kernels.rounding import (
    round6_tie_robust,
    round_decimals_away,
)


def _duck_round(vals, expr):
    con = duckdb.connect()
    out = con.execute(
        f"SELECT {expr} FROM (SELECT UNNEST(?::DOUBLE[]) AS x)",
        [list(map(float, vals))],
    ).fetchnumpy()
    con.close()
    return next(iter(out.values()))


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e8, max_value=1e8,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_round_away_matches_duckdb(vals):
    got = round_decimals_away(np.asarray(vals), 6)
    want = _duck_round(vals, "ROUND(x, 6)")
    np.testing.assert_array_equal(got, want)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e8, max_value=1e8,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_tie_robust_matches_duckdb_double_round(vals):
    got = round6_tie_robust(np.asarray(vals))
    want = _duck_round(vals, "ROUND(ROUND(x, 9), 6)")
    np.testing.assert_array_equal(got, want)


def test_exact_tie_values():
    """Representable 6-dp half-ties (the adversarial class): parity with
    DuckDB on both the single and double rounding."""
    ties = [4675.4140625, -4675.4140625, 0.0000005, -0.0000005,
            52633.7203125, 1.5e-6, 2.5e-6, 123.4567895]
    for expr, fn in (("ROUND(x, 6)",
                      lambda v: round_decimals_away(v, 6)),
                     ("ROUND(ROUND(x, 9), 6)", round6_tie_robust)):
        got = fn(np.asarray(ties))
        want = _duck_round(ties, expr)
        np.testing.assert_array_equal(got, want)


def test_tie_robust_collapses_ulp_neighbours():
    """Values a few ulps apart across a 6-dp tie boundary round the SAME
    way after the 9-dp pre-round — the property that fixed the sf0.1
    lineitem hash mismatch."""
    base = 52633.7203125  # exact 6-dp tie
    lo = np.nextafter(base, -np.inf)  # a hair below the tie
    hi = np.nextafter(base, np.inf)
    got = round6_tie_robust(np.array([lo, base, hi]))
    assert got[0] == got[1] == got[2] == 52633.720313


def test_no_negative_zero_on_either_side():
    """Tiny-negative inputs (e.g. skew = cm3/m2^1.5 where symmetric deltas
    cancel to ~-1e-18) must round to +0.0 — not -0.0 — on BOTH the engine
    and the oracle side, or the driver's byte-level value hash diverges
    (round-2 regression on rollup_1h / rollup_lineitem_1d)."""
    tiny = np.array([-1e-18, -5e-10, -0.0, 0.0, -4.9e-7, 1e-18])
    got = round6_tie_robust(tiny)
    assert not np.signbit(got).any(), got
    got_single = round_decimals_away(tiny, 6)
    assert not np.signbit(got_single).any(), got_single
    # Oracle side: the mechanical rewrite appends `+ 0.0` to the final round.
    want = _duck_round(tiny, "(ROUND(ROUND(x, 9), 6) + 0.0)")
    assert not np.signbit(want).any(), want
    np.testing.assert_array_equal(got, want)


def test_tie_robust_sql_rewrite_normalizes_zero_sign():
    """The _tie_robust_sql rewrite must emit the `+ 0.0` wrapper (the SQL
    half of the -0.0 contract)."""
    from light_curve_ray.pipelines.queries import _tie_robust_sql
    out = _tie_robust_sql("SELECT ROUND(x / y, 6) AS skew FROM t")
    assert out == "SELECT (ROUND(ROUND(x / y, 9), 6) + 0.0) AS skew FROM t"


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(min_value=-1e12, max_value=1e12,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_sig_round_matches_duckdb(vals):
    """Significant-digit rounding (reduced_chi2's relative-granularity
    contract) must match the oracle's FLOOR/CEIL/POWER/LOG10 mirror
    bit-for-bit — including the np.power-vs-libm-pow one-ulp trap on
    integer exponents (kernels/rounding.round_sig_away docstring)."""
    from light_curve_ray.kernels.rounding import (
        round_sig6_tie_robust,
        round_sig_away,
    )
    from light_curve_ray.pipelines.queries import _sig_round_sql

    got9 = round_sig_away(np.asarray(vals), 9)
    want9 = _duck_round(vals, _sig_round_sql("x", 9))
    np.testing.assert_array_equal(got9, want9)
    got = round_sig6_tie_robust(np.asarray(vals))
    want = _duck_round(vals, _sig_round_sql(_sig_round_sql("x", 9), 6))
    np.testing.assert_array_equal(got, want)


def test_sig_round_adversarial():
    """Powers of ten, near-boundary values, half-ties at the 6th
    significant digit, zeros and sign symmetry."""
    from light_curve_ray.kernels.rounding import round_sig6_tie_robust
    from light_curve_ray.pipelines.queries import _sig_round_sql

    vals = [1e10, -1e10, 9.999999999e9, 1.0000000001e10, 13.67645,
            -13.67645, 3314.6082000000006, 1e-7, 123456.5, -123456.5,
            0.0, -0.0, 7.6303925e9, 1.0, 10.0, 999999.5]
    got = round_sig6_tie_robust(np.asarray(vals))
    want = _duck_round(vals, _sig_round_sql(_sig_round_sql("x", 9), 6))
    np.testing.assert_array_equal(got, want)
    # -0.0 must normalize to +0.0 on the engine side
    assert not np.signbit(got[vals.index(-0.0)])
