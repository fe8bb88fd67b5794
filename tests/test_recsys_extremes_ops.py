"""Recommender / seasonal / shift / extreme-value operator pins vs
independent pandas references at sf0.001 (SQL oracles are checked
separately by tools/check_queries.py)."""

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
        sub = sub.sort_values("day")
        out[et] = (sub["day"].values, sub["mi"].values)
    return out


def test_item_cosine_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_item_cosine

    got = q_item_cosine(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    op = li.drop_duplicates()
    cu = op.groupby("l_partkey")["l_orderkey"].nunique()
    j = op.merge(op, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    c = j.groupby(["l_partkey_x", "l_partkey_y"]).size()
    sym = {}
    for (u, v), n in c.items():
        cos = n / np.sqrt(cu[u] * cu[v])
        sym.setdefault(u, []).append((v, cos))
        sym.setdefault(v, []).append((u, cos))
    for item, lst in sym.items():
        lst.sort(key=lambda t: (-t[1], t[0]))
        sub = got[got["item"] == item].sort_values("rn")
        assert len(sub) == min(3, len(lst))
        for (partner, cos), row in zip(lst[:3], sub.itertuples()):
            assert row.partner == partner
            assert abs(row.cosine - cos) < 1e-5
    assert set(got["item"]) == set(sym)


def test_seasonal_decompose_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_seasonal_decompose

    got = q_seasonal_decompose(SF).to_pandas().set_index(
        ["event_type", "dow"])
    for et, (day, mi) in _daily_milli().items():
        overall = mi.mean() / 1000.0
        for dw in np.unique(day % 7):
            m = (day % 7) == dw
            want = mi[m].mean() / 1000.0 - overall
            row = got.loc[(et, int(dw))]
            assert int(row["n_days"]) == int(m.sum())
            assert abs(float(row["seasonal"]) - want) < 1e-5
    # seasonal indices are deviations: weighted by n they sum to ~0
    for et in got.index.get_level_values(0).unique():
        sub = got.loc[et]
        assert abs((sub["seasonal"] * sub["n_days"]).sum()) < 1e-2


def test_shift_weights_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_shift_weights

    got = q_shift_weights(SF).to_pandas().set_index(
        ["event_type", "bin"])
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    thr = (ev["day"].min() + ev["day"].max()) // 2
    vi = np.floor(ev["value"].round(6).values * 1e6 + 0.5).astype(
        np.int64)
    ev["bin"] = vi // 25_000_000
    ev["p"] = np.where(ev["day"] <= thr, 1, 2)
    c = ev.groupby(["event_type", "bin", "p"]).size().unstack(
        "p", fill_value=0)
    for et in c.index.get_level_values(0).unique():
        sub = c.loc[et]
        t1, t2 = sub[1].sum(), sub[2].sum()
        for b in sub.index:
            n1, n2 = int(sub.loc[b, 1]), int(sub.loc[b, 2])
            if n1 == 0:
                assert (et, b) not in got.index
                continue
            row = got.loc[(et, int(b))]
            assert int(row["n_source"]) == n1
            assert int(row["n_target"]) == n2
            assert abs(float(row["weight"])
                       - (n2 * t1) / (n1 * t2)) < 1e-5


def test_pot_clusters_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_pot_clusters

    got = q_pot_clusters(SF).to_pandas().set_index("event_type")
    for et, (day, mi) in _daily_milli().items():
        n = len(mi)
        k = (n + 9) // 10
        thr = int(np.sort(mi)[::-1][k - 1])
        ex = mi >= thr
        n_clusters = int((ex & np.concatenate(
            [[True], ~ex[:-1]])).sum())
        run = mx = 0
        for e in ex:
            run = run + 1 if e else 0
            mx = max(mx, run)
        row = got.loc[et]
        assert int(row["thr_milli"]) == thr
        assert int(row["n_exceed"]) == int(ex.sum())
        assert int(row["n_clusters"]) == n_clusters
        assert int(row["max_len"]) == mx
        # at least k exceedances by construction of the order statistic
        assert int(row["n_exceed"]) >= k
