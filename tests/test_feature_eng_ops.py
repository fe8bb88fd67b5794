"""Feature-engineering / drift operator pins vs independent pandas
references at sf0.001: WOE/IV binning, leave-one-out target encoding,
PSI drift and the calibration decile table must equal a from-scratch
derivation (the SQL oracles are checked separately by
tools/check_queries.py; these pins are engine-internal)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_woe_iv_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_woe_iv

    got = q_woe_iv(SF).to_pandas().set_index("bin")
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_totalprice", "o_orderstatus"])
    bins = np.floor(o["o_totalprice"].values / 50000).astype(int)
    bad = (o["o_orderstatus"] == "F").values
    for b in np.unique(bins):
        m = bins == b
        n_bad = int(bad[m].sum())
        n_good = int(m.sum()) - n_bad
        gt = int((~bad).sum())
        bt = int(bad.sum())
        pg, pb = (n_good + 0.5) / gt, (n_bad + 0.5) / bt
        row = got.loc[b]
        assert int(row["n"]) == int(m.sum())
        assert int(row["n_bad"]) == n_bad
        assert abs(float(row["woe"]) - np.log(pg / pb)) < 1e-5
        assert abs(float(row["iv_term"])
                   - (pg - pb) * np.log(pg / pb)) < 1e-5


def test_target_encode_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_target_encode

    got = q_target_encode(SF).to_pandas().set_index("o_orderkey")
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_mktsegment"])
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j["o_totalprice"].round(6) * 100 + 0.5).astype(
        np.int64)
    seg = j.groupby("c_mktsegment")["cents"].agg(["sum", "count"])
    for r in j.itertuples():
        s, n = seg.loc[r.c_mktsegment]
        want = (int(s) - r.cents) / (100.0 * (int(n) - 1))
        row = got.loc[r.o_orderkey]
        assert row["segment"] == r.c_mktsegment
        assert abs(float(row["loo_price"]) - want) < 1e-5


def test_psi_drift_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_psi_drift

    got = q_psi_drift(SF).to_pandas().set_index("bin")
    e = pd.read_parquet(f"{SF}/events.parquet",
                        columns=["ts", "value"]).dropna()
    t_us = e["ts"].astype("int64").values
    vi = np.floor(e["value"].round(6).values * 1e6 + 0.5).astype(np.int64)
    t0, mn, mx = t_us.min(), vi.min(), vi.max()
    is_base = ((t_us - t0) // 86_400_000_000) < 15
    bins = ((vi - mn) * 10) // (mx - mn + 1)
    nb = np.bincount(bins[is_base], minlength=10)
    nc = np.bincount(bins[~is_base], minlength=10)
    tb, tc = nb.sum(), nc.sum()
    for b in range(10):
        if nb[b] + nc[b] == 0:
            assert b not in got.index
            continue
        p = (nb[b] + 0.5) / (tb + 5.0)
        q = (nc[b] + 0.5) / (tc + 5.0)
        row = got.loc[b]
        assert int(row["n_base"]) == nb[b]
        assert int(row["n_curr"]) == nc[b]
        assert abs(float(row["psi_term"]) - (p - q) * np.log(p / q)) < 1e-5


def test_calibration_deciles_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_calibration_deciles

    got = q_calibration_deciles(SF).to_pandas().set_index("decile")
    o = pd.read_parquet(f"{SF}/orders.parquet",
                        columns=["o_custkey", "o_totalprice"])
    pos = set(o.loc[o["o_totalprice"] > 300000, "o_custkey"])
    c = pd.read_parquet(f"{SF}/customer.parquet",
                        columns=["c_custkey", "c_acctbal"])
    cents = np.floor(c["c_acctbal"].round(6).values * 100 + 0.5).astype(
        np.int64)
    y = c["c_custkey"].isin(pos).values.astype(np.int64)
    order = np.lexsort((c["c_custkey"].values, cents))
    cents, y = cents[order], y[order]
    n = len(cents)
    dec = (np.arange(n) * 10) // n
    for d in range(10):
        m = dec == d
        row = got.loc[d]
        assert int(row["n"]) == int(m.sum())
        assert int(row["n_pos"]) == int(y[m].sum())
        assert abs(float(row["pos_rate"]) - y[m].mean()) < 1e-5
        assert abs(float(row["mean_acctbal"])
                   - cents[m].sum() / (100.0 * m.sum())) < 1e-5
