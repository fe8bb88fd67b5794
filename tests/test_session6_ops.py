"""Session-6 operators vs independent single-process references at
sf0.001: Jarque–Bera moments, Mann–Kendall trend, ARI readability and
Chao1 vocabulary richness must equal a from-scratch pandas/numpy
derivation (the SQL oracles are checked separately by
tools/check_queries.py; these pins are engine-internal and survive
oracle edits)."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
_DAY_US = 86_400_000_000


def _events():
    df = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["event_type", "ts", "value"])
    df["t_us"] = df["ts"].astype("int64")
    return df


def _vi(values):
    from light_curve_ray.kernels.rounding import round6_tie_robust

    return np.floor(round6_tie_robust(np.asarray(values, np.float64))
                    * 1000.0 + 0.5).astype(np.int64)


def test_jarque_bera_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_jarque_bera

    got = q_jarque_bera(SF).to_pandas().set_index("event_type")
    df = _events()
    df["vi"] = _vi(df["value"].values)
    for et, sub in df.groupby("event_type"):
        x = sub["vi"].to_numpy(np.float64)
        n = len(x)
        mu = x.mean()
        m2 = ((x - mu) ** 2).mean()
        m3 = ((x - mu) ** 3).mean()
        m4 = ((x - mu) ** 4).mean()
        skew = m3 / m2 ** 1.5
        exk = m4 / m2 ** 2 - 3.0
        jb = n / 6.0 * (skew ** 2 + exk ** 2 / 4.0)
        row = got.loc[et]
        assert row["n"] == n
        assert abs(row["skewness"] - skew) < 1e-5
        assert abs(row["ex_kurtosis"] - exk) < 1e-5
        assert abs(row["jb_stat"] - jb) < max(1e-4, 1e-5 * abs(jb))
        # and the engine's own rounding contract holds
        assert row["skewness"] == float(round6_tie_robust(
            np.array([row["skewness"]]))[0])


def test_mann_kendall_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_mann_kendall

    got = q_mann_kendall(SF).to_pandas().set_index("event_type")
    df = _events()
    df["day"] = df["t_us"] // _DAY_US
    g = df.groupby(["event_type", "day"])["value"].agg(["sum", "count"])
    g = g.reset_index()
    g["mi"] = _vi((g["sum"] / g["count"]).values)
    for et, sub in g.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy(np.int64)
        n = len(mi)
        s = int(np.sign(mi[None, :] - mi[:, None])[
            np.triu_indices(n, 1)].sum())
        _, tn = np.unique(mi, return_counts=True)
        tsum = int((tn * (tn - 1) * (2 * tn + 5)).sum())
        var_s = (n * (n - 1) * (2 * n + 5) - tsum) / 18.0
        if var_s <= 0:
            assert et not in got.index
            continue
        z = ((s - 1) / math.sqrt(var_s) if s > 0
             else (s + 1) / math.sqrt(var_s) if s < 0 else 0.0)
        row = got.loc[et]
        assert row["n_days"] == n
        assert row["s_stat"] == s
        assert abs(row["var_s"] - var_s) < 1e-5
        assert abs(row["z"] - z) < 1e-6


def test_readability_ari_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_readability_ari

    got = q_readability_ari(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["text"])
    checked = 0
    for _, r in docs.iterrows():
        chars = len(re.findall(r"[A-Za-z0-9]", r["text"]))
        words = len(re.findall(r"\S+", r["text"]))
        sents = len(re.findall(r"[.!?]+", r["text"]))
        if words == 0:
            assert r["doc_id"] not in got.index
            continue
        ari = (4.71 * (chars / words)
               + 0.5 * (words / max(1, sents)) - 21.43)
        row = got.loc[r["doc_id"]]
        assert row["chars"] == chars
        assert row["words"] == words
        assert row["sentences"] == sents
        assert abs(row["ari"] - ari) < 1e-6
        checked += 1
    assert checked >= 10


def test_chao1_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_chao1_richness

    got = q_chao1_richness(SF).to_pandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    counts: dict = {}
    for t in docs["text"].dropna():
        for tok in re.split(r"[^a-z0-9]+", t.lower()):
            if tok:
                counts[tok] = counts.get(tok, 0) + 1
    cnt = np.array(list(counts.values()), np.int64)
    v = len(cnt)
    f1 = int((cnt == 1).sum())
    f2 = int((cnt == 2).sum())
    n_tok = int(cnt.sum())
    chao1 = v + f1 * (f1 - 1) / (2.0 * (f2 + 1.0))
    assert got["v_types"] == v
    assert got["f1"] == f1
    assert got["f2"] == f2
    assert got["n_tokens"] == n_tok
    assert abs(got["chao1"] - chao1) < 1e-4
    assert abs(got["coverage"] - (1.0 - f1 / n_tok)) < 1e-6
