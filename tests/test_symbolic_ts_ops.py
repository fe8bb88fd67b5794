"""Symbolic / ordinal timeseries feature pins vs independent pandas
references at sf0.001: von Neumann eta, permutation entropy, runs test
and SAX words must equal a from-scratch derivation (the SQL oracles
are checked separately by tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _daily_milli() -> dict:
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    g = ev.groupby(["event_type", "day"])["value"].agg(["sum", "count"])
    g["mi"] = np.floor((g["sum"] / g["count"]).round(6) * 1000
                       + 0.5).astype(np.int64)
    out = {}
    for et, sub in g.reset_index().groupby("event_type"):
        out[et] = sub.sort_values("day")["mi"].values
    return out


def test_vonneumann_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_vonneumann_daily

    got = q_vonneumann_daily(SF).to_pandas().set_index("event_type")
    for et, mi in _daily_milli().items():
        x = mi.astype(np.float64)
        eta = (np.diff(x) ** 2).sum() / (
            len(x) * x.var())  # n*sd2 / (n*sxx - sx^2) == sd2/(n*var/n)
        row = got.loc[et]
        assert int(row["n_days"]) == len(x)
        assert abs(float(row["eta"]) - eta) < 1e-5


def test_perm_entropy_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_perm_entropy

    got = q_perm_entropy(SF).to_pandas().set_index("event_type")
    for et, mi in _daily_milli().items():
        a, b, c = mi[:-2], mi[1:-1], mi[2:]
        pat = 4 * (b > a) + 2 * (c > b) + (c > a)
        _, cnt = np.unique(pat, return_counts=True)
        p = cnt / cnt.sum()
        row = got.loc[et]
        assert int(row["n_windows"]) == int(cnt.sum())
        assert abs(float(row["pattern_entropy"])
                   - (-p * np.log(p)).sum()) < 1e-5


def test_runs_test_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_runs_test

    got = q_runs_test(SF).to_pandas().set_index("event_type")
    for et, mi in _daily_milli().items():
        n, sx = len(mi), mi.sum()
        lhs = mi.astype(np.int64) * n
        sgn = np.where(lhs > sx, 1, -1)[lhs != sx]
        row = got.loc[et]
        assert int(row["n_plus"]) == int((sgn == 1).sum())
        assert int(row["n_minus"]) == int((sgn == -1).sum())
        assert int(row["n_runs"]) == 1 + int((sgn[1:] != sgn[:-1]).sum())


def test_runs_test_known_case():
    # alternating signs -> runs == length; constant -> one run
    s = np.array([1, -1, 1, -1, 1])
    assert 1 + int((s[1:] != s[:-1]).sum()) == 5
    s = np.array([1, 1, 1])
    assert 1 + int((s[1:] != s[:-1]).sum()) == 1


def test_sax_words_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_sax_words

    got = q_sax_words(SF).to_pandas()
    total = 0
    for et, mi in _daily_milli().items():
        mn, mx = mi.min(), mi.max()
        s = ((mi - mn) * 4) // (mx - mn + 1)
        assert s.min() >= 0 and s.max() <= 3
        word = 16 * s[:-2] + 4 * s[1:-1] + s[2:]
        wv, cnt = np.unique(word, return_counts=True)
        sub = got[got["event_type"] == et].set_index("word")
        assert len(sub) == len(wv)
        for w, c in zip(wv, cnt):
            assert int(sub.loc[int(w)]["n"]) == int(c)
        total += len(wv)
    assert total == len(got)
