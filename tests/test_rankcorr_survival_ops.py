"""Batch-13 operators vs independent single-process references at
sf0.001: Kendall tau-b (Knight's algorithm vs O(n^2) brute force),
discrete mutual information, Kaplan-Meier survival and the
feature-hashing collision audit (the SQL oracles are checked separately
by tools/check_queries.py; these pins are engine-internal)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_kendall_tau_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_kendall_tau

    got = q_kendall_tau(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["event_type", "ts", "value", "event_id"])
    for etype, grp in ev.groupby("event_type"):
        t = grp.ts.values.astype("datetime64[us]").astype(np.int64)
        v = grp.value.values.astype(np.float64)
        n = len(t)
        dt = np.sign(t[:, None] - t[None, :])
        dv = np.sign(v[:, None] - v[None, :])
        prod = dt * dv
        iu = np.triu_indices(n, 1)
        c = int((prod[iu] > 0).sum())
        d = int((prod[iu] < 0).sum())
        n0 = n * (n - 1) // 2
        xtie = sum(m * (m - 1) // 2
                   for m in pd.Series(t).value_counts())
        ytie = sum(m * (m - 1) // 2
                   for m in pd.Series(v).value_counts())
        tau = (c - d) / np.sqrt(float((n0 - xtie) * (n0 - ytie)))
        row = got.loc[etype]
        assert row.n == n
        assert row.concordant == c
        assert row.discordant == d
        assert abs(row.tau_b - tau) < 1e-6


def test_mutual_information_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_mutual_information

    got = q_mutual_information(SF).to_pandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"]).dropna()
    ct = docs.groupby(["lang", "source"]).size()
    n = ct.sum()
    pij = ct / n
    pi = ct.groupby("lang").sum() / n
    pj = ct.groupby("source").sum() / n
    mi = sum(pij[(l, s)] * np.log(pij[(l, s)] / (pi[l] * pj[s]))
             for l, s in ct.index)
    hl = -sum(p * np.log(p) for p in pi)
    hs = -sum(p * np.log(p) for p in pj)
    assert abs(got.mi - mi) < 1e-6
    assert abs(got.h_lang - hl) < 1e-6
    assert abs(got.h_source - hs) < 1e-6
    assert abs(got.nmi - mi / np.sqrt(hl * hs)) < 1e-6


def test_kaplan_meier_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_kaplan_meier

    got = q_kaplan_meier(SF).to_pandas().sort_values(
        "day").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"]).dropna()
    day = ev.ts.values.astype("datetime64[us]").astype(
        np.int64) // 86400000000
    u = pd.DataFrame({"user_id": ev.user_id.values, "day": day})
    per = u.groupby("user_id")["day"].agg(["min", "max"])
    gmax = per["max"].max()
    life = (per["max"] - per["min"]).values
    cens = (per["max"] == gmax).values
    s = 1.0
    for d in range(int(life.max()) + 1):
        at_risk = int((life >= d).sum())
        deaths = int(((life == d) & ~cens).sum())
        s *= 1.0 - deaths / at_risk
        row = got.iloc[d]
        assert row.day == d
        assert row.at_risk == at_risk
        assert row.deaths == deaths
        assert abs(row.survival - s) < 1e-6
    assert len(got) == int(life.max()) + 1


def test_feature_hashing_matches_manual(ray_session):
    import re

    from light_curve_ray.pipelines.queries import (_FH_BUCKETS, _FH_POWS,
                                                   q_feature_hashing)

    got = q_feature_hashing(SF).to_pandas().set_index("load")[
        "n_buckets"]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text"]).dropna()
    terms = set()
    for t in docs.text:
        terms.update(w for w in re.split(r"[^a-z0-9]+", t.lower()) if w)
    loads = np.zeros(_FH_BUCKETS, dtype=int)
    for term in terms:
        pre = term[:8].encode("ascii").ljust(8, b"\0")
        h = sum(c * p for c, p in zip(pre, _FH_POWS))
        loads[h % _FH_BUCKETS] += 1
    want = pd.Series(loads).value_counts()
    assert got.sum() == _FH_BUCKETS
    for load, cnt in want.items():
        assert got[load] == cnt
