"""OHLC / contingency / source-similarity / rank-test operator pins
vs independent pandas references at sf0.001 (SQL oracles are checked
separately by tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_ohlc_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_ohlc_daily

    got = q_ohlc_daily(SF).to_pandas().set_index(["event_type", "day"])
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_type", "ts", "value", "event_id"]).dropna()
    ev["t_us"] = ev["ts"].astype("int64")
    ev["day"] = ev["t_us"] // 86_400_000_000
    ev["vi"] = np.floor(ev["value"].round(6).values * 1e6
                        + 0.5).astype(np.int64)
    for (et, day), sub in ev.groupby(["event_type", "day"]):
        sub = sub.sort_values(["t_us", "event_id"])
        row = got.loc[(et, day)]
        assert int(row["n"]) == len(sub)
        assert int(row["open_micro"]) == int(sub["vi"].iloc[0])
        assert int(row["close_micro"]) == int(sub["vi"].iloc[-1])
        assert int(row["high_micro"]) == int(sub["vi"].max())
        assert int(row["low_micro"]) == int(sub["vi"].min())
        assert row["low_micro"] <= row["open_micro"] <= row["high_micro"]


def test_contingency_residuals_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_contingency_residuals

    got = q_contingency_residuals(SF).to_pandas().set_index(
        ["event_type", "dow"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"]).dropna()
    ev["dow"] = (ev["ts"].astype("int64") // 86_400_000_000) % 7
    o = ev.groupby(["event_type", "dow"]).size()
    rt = o.groupby(level=0).sum()
    ct = o.groupby(level=1).sum()
    t = o.sum()
    ss = 0.0
    for (et, dw), n in o.items():
        exp = rt[et] * ct[dw] / t
        want = (n - exp) / np.sqrt(exp)
        row = got.loc[(et, dw)]
        assert int(row["n"]) == int(n)
        assert abs(float(row["residual"]) - want) < 1e-5
        ss += want ** 2
    # sum of squared residuals == the chi-squared statistic
    assert ss >= 0


def test_source_lang_cosine_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_source_lang_cosine

    got = q_source_lang_cosine(SF).to_pandas().set_index(
        ["source_a", "source_b"])
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["source", "lang"]).dropna()
    c = d.groupby(["source", "lang"]).size().unstack(fill_value=0)
    srcs = sorted(c.index)
    n_pairs = 0
    for i in range(len(srcs)):
        for j in range(i + 1, len(srcs)):
            a, b = c.loc[srcs[i]].values, c.loc[srcs[j]].values
            want = (a @ b) / np.sqrt((a @ a) * (b @ b))
            assert abs(float(got.loc[(srcs[i], srcs[j])]["cosine"])
                       - want) < 1e-5
            n_pairs += 1
    assert len(got) == n_pairs
    assert ((got["cosine"] >= -1e-9) & (got["cosine"] <= 1 + 1e-9)).all()


def test_mannwhitney_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_mannwhitney_u

    got = q_mannwhitney_u(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    thr = (ev["day"].min() + ev["day"].max()) // 2
    ev["vi"] = np.floor(ev["value"].round(6).values * 1e6
                        + 0.5).astype(np.int64)
    for et, sub in ev.groupby("event_type"):
        x1 = sub[sub["day"] <= thr]["vi"].values
        x2 = sub[sub["day"] > thr]["vi"].values
        # brute-force pair count (sf0.001 is small enough)
        u2 = int(2 * (x1[:, None] > x2[None, :]).sum()
                 + (x1[:, None] == x2[None, :]).sum())
        row = got.loc[et]
        assert int(row["n1"]) == len(x1)
        assert int(row["n2"]) == len(x2)
        assert int(row["u_times_2"]) == u2
        # U/ (n1*n2) is a probability: 0 <= 2U <= 2*n1*n2
        assert 0 <= u2 <= 2 * len(x1) * len(x2)
