"""Quantile-band / char-class / dup-rate operator pins vs independent
pandas references at sf0.001 (SQL oracles are checked separately by
tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_quantile_bands_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_quantile_bands_daily

    got = q_quantile_bands_daily(SF).to_pandas().set_index(
        ["event_type", "day"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    ev["vi"] = np.floor(ev["value"].round(6).values * 1e6
                        + 0.5).astype(np.int64)
    for (et, day), sub in ev.groupby(["event_type", "day"]):
        x = np.sort(sub["vi"].values)
        n = len(x)
        row = got.loc[(et, day)]
        assert int(row["n"]) == n
        assert int(row["p10_micro"]) == int(x[(n + 9) // 10 - 1])
        assert int(row["p50_micro"]) == int(x[(n + 1) // 2 - 1])
        assert int(row["p90_micro"]) == int(x[(9 * n + 9) // 10 - 1])
        assert (row["p10_micro"] <= row["p50_micro"]
                <= row["p90_micro"])


def test_charclass_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_charclass_stats

    got = q_charclass_stats(SF).to_pandas().set_index("lang")
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["lang", "text"]).dropna()
    import re
    for lang, sub in d.groupby("lang"):
        row = got.loc[lang]
        assert int(row["n_docs"]) == len(sub)
        assert int(row["n_chars"]) == sum(len(t) for t in sub["text"])
        assert int(row["letters"]) == sum(
            len(re.findall("[a-zA-Z]", t)) for t in sub["text"])
        assert int(row["digits"]) == sum(
            len(re.findall("[0-9]", t)) for t in sub["text"])
        assert int(row["spaces"]) == sum(
            t.count(" ") for t in sub["text"])


def test_dup_rate_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_dup_rate_by_source

    got = q_dup_rate_by_source(SF).to_pandas().set_index("source")
    d = pd.read_parquet(f"{SF}/documents.parquet",
                        columns=["source", "text"]).dropna()
    copies = d.groupby("text").size()
    d["dup"] = d["text"].map(copies) > 1
    for src, sub in d.groupby("source"):
        row = got.loc[src]
        assert int(row["n_docs"]) == len(sub)
        assert int(row["n_dup_docs"]) == int(sub["dup"].sum())
    assert got["n_docs"].sum() == len(d)
