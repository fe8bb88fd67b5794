"""Session-5 operators vs independent single-process references at
sf0.001: drift tests (Welch t, Cramér's V, behavioral kappa), R/S
Hurst, robust scale/median family, privacy EMD, inequality indices,
circular hour stats, OOV rate, geometric median, Markov entropy rate,
EVT block maxima, record/streak statistics, order-span histogram, the
TPC-H Q7/Q14/Q10/Q16 joins and label separation must equal a
from-scratch pandas/numpy derivation (the SQL oracles are checked
separately by tools/check_queries.py; these pins are engine-internal
and survive oracle edits)."""

from __future__ import annotations

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


def _milli_daily(df):
    """The shared daily-mean milli series contract."""
    from light_curve_ray.kernels.rounding import round6_tie_robust

    df = df.copy()
    df["day"] = df["t_us"] // _DAY_US
    g = df.groupby(["event_type", "day"])["value"].agg(["sum", "count"])
    mi = np.floor(round6_tie_robust(
        (g["sum"] / g["count"]).values) * 1000.0 + 0.5).astype(np.int64)
    g = g.reset_index()
    g["mi"] = mi
    return g


def test_welch_ttest_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_welch_ttest

    got = q_welch_ttest(SF).to_pandas().set_index("event_type")
    df = _events()
    df["day"] = df["t_us"] // _DAY_US
    thr = (df["day"].min() + df["day"].max()) // 2
    df["vi"] = np.floor(round6_tie_robust(df["value"].values) * 1000.0
                        + 0.5).astype(np.int64)
    for et, sub in df.groupby("event_type"):
        a = sub.loc[sub["day"] <= thr, "vi"].to_numpy()
        b = sub.loc[sub["day"] > thr, "vi"].to_numpy()
        n1, n2 = len(a), len(b)
        va = a.var(ddof=1) / n1
        vb = b.var(ddof=1) / n2
        t = (a.mean() - b.mean()) / np.sqrt(va + vb)
        df_w = (va + vb) ** 2 / (va * va / (n1 - 1) + vb * vb / (n2 - 1))
        row = got.loc[et]
        assert row["n1"] == n1 and row["n2"] == n2
        assert abs(row["t_stat"] - t) < 1e-5
        assert abs(row["df"] - df_w) < 1e-3


def test_cramers_v_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_cramers_v

    got = q_cramers_v(SF).to_pandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "source"]).dropna()
    ct = pd.crosstab(docs["lang"], docs["source"]).values.astype(float)
    n = ct.sum()
    exp = np.outer(ct.sum(1), ct.sum(0)) / n
    chi2 = ((ct - exp) ** 2 / exp).sum()
    v = np.sqrt(chi2 / (n * (min(ct.shape) - 1)))
    assert int(got["n_docs"]) == int(n)
    assert abs(got["chi2"] - chi2) < 1e-4
    assert abs(got["cramers_v"] - v) < 1e-6


def test_hurst_rs_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_hurst_rs

    got = q_hurst_rs(SF).to_pandas()
    daily = _milli_daily(_events())
    for et, sub in daily.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy()
        for w in (5, 10, 15):
            vals = []
            for b in range(len(mi) // w):
                x = mi[b * w:(b + 1) * w].astype(float)
                cum = np.cumsum(x - x.mean())
                r = cum.max() - cum.min()
                s = x.std()  # population std
                if s > 0:
                    vals.append(r / s)
            if not vals:
                continue
            row = got[(got["event_type"] == et) & (got["w_size"] == w)]
            assert len(row) == 1
            assert abs(row["avg_rs"].iloc[0] - np.mean(vals)) < 1e-4


def test_rolling_median_and_pairwise_scale(ray_session):
    from light_curve_ray.pipelines.queries import (q_pairwise_scale,
                                                   q_rolling_median_7d)

    med = q_rolling_median_7d(SF).to_pandas()
    scale = q_pairwise_scale(SF).to_pandas().set_index("event_type")
    daily = _milli_daily(_events())
    for et, sub in daily.groupby("event_type"):
        sub = sub.sort_values("day")
        days = sub["day"].to_numpy()
        mi = sub["mi"].to_numpy()
        for i in range(len(days)):
            win = mi[(days > days[i] - 7) & (days <= days[i])]
            row = med[(med["event_type"] == et)
                      & (med["day"] == days[i])]
            assert abs(row["med7"].iloc[0]
                       - np.median(win) / 1000.0) < 1e-9
        diffs = np.abs(mi[:, None] - mi[None, :])[
            np.triu_indices(len(mi), 1)]
        assert abs(scale.loc[et, "median_pair_diff"]
                   - np.median(diffs) / 1000.0) < 1e-9
        assert abs(scale.loc[et, "mean_pair_diff"]
                   - diffs.mean() / 1000.0) < 1e-6


def test_oov_rate_matches_re(ray_session):
    from light_curve_ray.pipelines.queries import q_oov_rate

    got = q_oov_rate(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    tok = {int(d): [t for t in re.split(r"[^a-z0-9]+", str(x).lower())
                    if t]
           for d, x in zip(docs["doc_id"], docs["text"])}
    cnt: dict = {}
    for ts in tok.values():
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    vocab = {t for t, n in cnt.items() if n >= 5}
    for d, ts in tok.items():
        if not ts:
            assert d not in got.index
            continue
        oov = sum(1 for t in ts if t not in vocab)
        assert int(got.loc[d, "n_tok"]) == len(ts)
        assert int(got.loc[d, "n_oov"]) == oov


def test_geometric_median_descends(ray_session):
    """The Weiszfeld iterate must not increase the objective
    Σ‖x−y‖ vs the mean start (the defining property)."""
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_geometric_median

    got = q_geometric_median(SF).to_pandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").dropna(
        subset=["vec_id", "label"])
    for lab, sub in emb.groupby("label"):
        mat = np.vstack(sub["embedding"].values).astype(np.float64)
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64)
        g = got[got["label"] == lab].sort_values("dim")
        if not len(g):
            continue
        y = g["geomedian"].to_numpy() * 1000.0
        mean = vi.mean(axis=0)
        obj_y = np.sqrt(((vi - y) ** 2).sum(axis=1)).sum()
        obj_m = np.sqrt(((vi - mean) ** 2).sum(axis=1)).sum()
        assert obj_y <= obj_m + 1e-6


def test_markov_entropy_rate_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_markov_entropy_rate

    got = q_markov_entropy_rate(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["user_id", "ts", "event_id", "event_type"])
    df = df.sort_values(["user_id", "ts", "event_id"])
    pairs: dict = {}
    for _, sub in df.groupby("user_id"):
        et = sub["event_type"].tolist()
        for a, b in zip(et[:-1], et[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    n_all = sum(pairs.values())
    nf: dict = {}
    for (a, _), n in pairs.items():
        nf[a] = nf.get(a, 0) + n
    rate = 0.0
    for (a, b), n in pairs.items():
        p = n / nf[a]
        rate += (nf[a] / n_all) * (-p * np.log(p))
    rate /= np.log(2.0)
    assert np.allclose(got["entropy_rate_bits"].values, rate,
                       atol=1e-5)
    for _, row in got.iterrows():
        h = -sum((n / nf[row["event_type"]])
                 * np.log(n / nf[row["event_type"]])
                 for (a, _), n in pairs.items()
                 if a == row["event_type"])
        assert abs(row["row_entropy"] - h) < 1e-5


def test_record_streak_gumbel(ray_session):
    from light_curve_ray.pipelines.queries import (q_gumbel_maxima,
                                                   q_record_days,
                                                   q_streak_stats)

    rec = q_record_days(SF).to_pandas().set_index("event_type")
    stk = q_streak_stats(SF).to_pandas().set_index("event_type")
    gum = q_gumbel_maxima(SF).to_pandas().set_index("event_type")
    daily = _milli_daily(_events())
    for et, sub in daily.groupby("event_type"):
        sub = sub.sort_values("day")
        mi = sub["mi"].to_numpy()
        days = sub["day"].to_numpy()
        run = np.maximum.accumulate(mi)
        is_rec = np.r_[True, mi[1:] > run[:-1]]
        assert int(rec.loc[et, "n_records"]) == int(is_rec.sum())
        assert int(rec.loc[et, "last_record_day"]) == int(
            days[np.nonzero(is_rec)[0][-1]])
        above = mi > np.median(mi)
        best_a = best_b = cur = 0
        nruns = 0
        prev = None
        for a in above:
            if a != prev:
                if a:
                    nruns += 1
                cur = 0
            cur += 1
            if a:
                best_a = max(best_a, cur)
            else:
                best_b = max(best_b, cur)
            prev = a
        assert int(stk.loc[et, "n_runs_above"]) == nruns
        assert int(stk.loc[et, "longest_above"]) == best_a
        assert int(stk.loc[et, "longest_below"]) == best_b
        bm = pd.Series(mi).groupby(days // 7).max().to_numpy(
            dtype=float)
        if len(bm) > 1:
            s = bm.std(ddof=1)
            beta = s * np.sqrt(6.0) / np.pi
            mu = bm.mean() - 0.5772156649015329 * beta
            assert abs(gum.loc[et, "gumbel_beta"]
                       - beta / 1000.0) < 1e-5
            assert abs(gum.loc[et, "gumbel_mu"] - mu / 1000.0) < 1e-5


def test_churn_and_kappa(ray_session):
    from light_curve_ray.pipelines.queries import (q_behavior_kappa,
                                                   q_churn_labels)

    ch = q_churn_labels(SF).to_pandas().set_index("user_id")
    df = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["user_id", "ts"])
    df["day"] = df["ts"].astype("int64") // _DAY_US
    thr = (df["day"].min() + df["day"].max()) // 2
    for u, sub in df.groupby("user_id"):
        da = sub.loc[sub["day"] <= thr, "day"].nunique()
        db = sub.loc[sub["day"] > thr, "day"].nunique()
        if da == 0:
            assert u not in ch.index
            continue
        assert int(ch.loc[u, "days_a"]) == da
        assert int(ch.loc[u, "days_b"]) == db
        assert int(ch.loc[u, "churned"]) == int(db == 0)

    kap = q_behavior_kappa(SF).to_pandas().iloc[0]
    df2 = pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["user_id", "ts", "event_type"])
    df2["day"] = df2["ts"].astype("int64") // _DAY_US
    thr2 = (df2["day"].min() + df2["day"].max()) // 2
    df2["period"] = np.where(df2["day"] <= thr2, 1, 2)
    la, lb = {}, {}
    for (u, p), sub in df2.groupby(["user_id", "period"]):
        c = sub.groupby("event_type").size()
        modal = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        (la if p == 1 else lb)[u] = modal
    both = sorted(set(la) & set(lb))
    po = np.mean([la[u] == lb[u] for u in both])
    classes = sorted(set(la.values()) | set(lb.values()))
    nu = len(both)
    pe = sum(
        (sum(la[u] == c for u in both) / nu)
        * (sum(lb[u] == c for u in both) / nu) for c in classes)
    assert int(kap["n_users"]) == nu
    assert abs(kap["po"] - po) < 1e-6
    assert abs(kap["pe"] - pe) < 1e-6
    assert abs(kap["kappa"] - (po - pe) / (1 - pe)) < 1e-5


def test_inequality_and_circular(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import (
        q_circular_hour_stats, q_inequality_indices)

    ineq = q_inequality_indices(SF).to_pandas().set_index("event_type")
    circ = q_circular_hour_stats(SF).to_pandas().set_index("event_type")
    df = _events()
    df["vi"] = np.floor(round6_tie_robust(df["value"].values) * 1000.0
                        + 0.5).astype(np.int64)
    df["hour"] = (df["t_us"] % _DAY_US) // 3_600_000_000
    for et, sub in df.groupby("event_type"):
        v = sub.loc[sub["vi"] > 0, "vi"].to_numpy(dtype=float)
        mu = v.mean()
        theil = (v / v.sum() * np.log(v / mu)).sum()
        hoover = np.abs(v - mu).sum() / (2 * v.sum())
        cv = v.std(ddof=1) / mu
        assert abs(ineq.loc[et, "theil_t"] - theil) < 1e-5
        assert abs(ineq.loc[et, "hoover"] - hoover) < 1e-6
        assert abs(ineq.loc[et, "cv"] - cv) < 1e-6
        ang = 2 * np.pi * sub["hour"].to_numpy(dtype=float) / 24
        c, s = np.cos(ang).sum(), np.sin(ang).sum()
        r = np.hypot(c, s) / len(sub)
        ph = (np.arctan2(s, c) / (2 * np.pi) * 24 + 24) % 24
        assert abs(circ.loc[et, "resultant"] - r) < 1e-6
        assert abs(circ.loc[et, "peak_hour"] - ph) < 1e-4


def test_sentence_stats_matches_re(ray_session):
    from light_curve_ray.pipelines.queries import q_sentence_stats

    got = q_sentence_stats(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "text"]).dropna()
    ref: dict = {}
    for lang, text in zip(docs["lang"], docs["text"]):
        for sent in re.split(r"[.!?]+", str(text)):
            nw = len([t for t in
                      re.split(r"[^a-z0-9]+", sent.lower()) if t])
            if nw > 0:
                ref.setdefault(lang, []).append(nw)
    for lang, ws in ref.items():
        assert int(got.loc[lang, "n_sentences"]) == len(ws)
        assert abs(got.loc[lang, "mean_words"] - np.mean(ws)) < 1e-6
        assert int(got.loc[lang, "max_words"]) == max(ws)


def test_order_ship_span_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_order_ship_span

    got = q_order_ship_span(SF).to_pandas().set_index("span_weeks")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"]).dropna()
    li["day"] = li["l_shipdate"].astype("int64") // _DAY_US
    span = li.groupby("l_orderkey")["day"].agg(["min", "max"])
    sd = (span["max"] - span["min"]).to_numpy()
    ref = pd.Series(sd).groupby(sd // 7).agg(["count", "mean"])
    for wk, row in ref.iterrows():
        assert int(got.loc[wk, "n_orders"]) == int(row["count"])
        assert abs(got.loc[wk, "mean_span_days"] - row["mean"]) < 1e-6


def test_tpch_joins_match_pandas(ray_session):
    from light_curve_ray.pipelines.queries import (q_brand_suppliers,
                                                   q_promo_share,
                                                   q_returns_topk)

    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    part = pd.read_parquet(f"{SF}/part.parquet",
                           columns=["p_partkey", "p_type", "p_brand"])
    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")

    ps = q_promo_share(SF).to_pandas().set_index("month")
    win = j[(j["l_shipdate"] >= "1997-01-01")
            & (j["l_shipdate"] < "1998-01-01")].copy()
    win["rev"] = win["l_extendedprice"] * (1 - win["l_discount"])
    win["month"] = (win["l_shipdate"].dt.year * 100
                    + win["l_shipdate"].dt.month)
    for m, sub in win.groupby("month"):
        tot = sub["rev"].sum()
        pro = sub.loc[sub["p_type"] == "PROMO", "rev"].sum()
        assert abs(ps.loc[m, "total_rev"] - tot) < 1e-3
        assert abs(ps.loc[m, "promo_share"] - 100 * pro / tot) < 1e-5

    bs = q_brand_suppliers(SF).to_pandas().set_index("p_brand")
    for brand, sub in j.groupby("p_brand"):
        assert int(bs.loc[brand, "supplier_cnt"]) == sub[
            "l_suppkey"].nunique()
        assert int(bs.loc[brand, "part_cnt"]) == sub[
            "l_partkey"].nunique()

    rt = q_returns_topk(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    ow = orders[(orders["o_orderdate"] >= "1997-01-01")
                & (orders["o_orderdate"] < "1997-04-01")]
    jr = li[li["l_returnflag"] == "R"].merge(
        ow, left_on="l_orderkey", right_on="o_orderkey")
    jr["rev"] = jr["l_extendedprice"] * (1 - jr["l_discount"])
    ref = jr.groupby("o_custkey")["rev"].sum().sort_values(
        ascending=False)
    top = rt.sort_values("rn")
    assert len(top) == min(20, len(ref))
    for rev_got, rev_ref in zip(top["return_rev"],
                                ref.head(len(top)).values):
        assert abs(rev_got - rev_ref) < 1e-3


def test_label_separation_matches_bruteforce(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_label_separation

    got = q_label_separation(SF).to_pandas().set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").dropna(
        subset=["vec_id", "label"])
    mats = {}
    for lab, sub in emb.groupby("label"):
        mat = np.vstack(sub["embedding"].values).astype(np.float64)
        vi = np.floor(round6_tie_robust(mat) * 1000.0
                      + 0.5).astype(np.int64).astype(float)
        nr = np.linalg.norm(vi, axis=1)
        mats[int(lab)] = vi[nr > 0] / nr[nr > 0, None]
    for lab, xn in mats.items():
        n = len(xn)
        if n < 2:
            continue
        cos = xn @ xn.T
        within = (cos.sum() - n) / (n * (n - 1))
        assert abs(got.loc[lab, "within_cos"] - within) < 1e-6
        betw = np.mean([
            (xn.sum(0) @ mats[o].sum(0)) / (n * len(mats[o]))
            for o in mats if o != lab])
        assert abs(got.loc[lab, "between_cos"] - betw) < 1e-6


def test_quantile_normalize_equal_marginals(ray_session):
    from light_curve_ray.pipelines.queries import q_quantile_normalize

    got = q_quantile_normalize(SF).to_pandas()
    # after normalization every series carries the identical sorted
    # qnorm vector (the defining property), and rank order follows mi
    ref = None
    for _, sub in got.groupby("event_type"):
        qs = sub.sort_values("rank")["qnorm"].to_numpy()
        assert (np.diff(sub.sort_values("rank")["mi"]) >= 0).all()
        if ref is None:
            ref = qs
        else:
            assert np.array_equal(ref, qs)
    # qnorm at each rank is the cross-series mean of order stats
    daily = _milli_daily(_events())
    mats = [np.sort(sub["mi"].to_numpy())
            for _, sub in daily.groupby("event_type")]
    rmax = min(len(m) for m in mats)
    mean_os = np.mean([m[:rmax] for m in mats], axis=0) / 1000.0
    assert np.allclose(ref, mean_os, atol=1e-6)


def test_term_burstiness_matches_re(ray_session):
    from light_curve_ray.pipelines.queries import q_term_burstiness

    got = q_term_burstiness(SF).to_pandas().set_index("term")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).dropna()
    cf: dict = {}
    df_: dict = {}
    for text in docs["text"]:
        toks = [t for t in re.split(r"[^a-z0-9]+", str(text).lower())
                if t]
        for t in set(toks):
            df_[t] = df_.get(t, 0) + 1
        for t in toks:
            cf[t] = cf.get(t, 0) + 1
    keep = {t for t, n in cf.items() if n >= 10}
    assert set(got.index) == keep
    for t in keep:
        assert int(got.loc[t, "cf"]) == cf[t]
        assert int(got.loc[t, "df"]) == df_[t]
        assert abs(got.loc[t, "burstiness"] - cf[t] / df_[t]) < 1e-6


def test_char_entropy_matches_counter(ray_session):
    from collections import Counter

    from light_curve_ray.pipelines.queries import q_char_entropy

    got = q_char_entropy(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["lang", "text"]).dropna()
    for lang, sub in docs.groupby("lang"):
        cnt = Counter()
        for text in sub["text"]:
            cnt.update(c for c in str(text).lower()
                       if "a" <= c <= "z")
        tot = sum(cnt.values())
        h = -sum((n / tot) * np.log(n / tot) for n in cnt.values())
        assert int(got.loc[lang, "n_letters"]) == tot
        assert abs(got.loc[lang, "char_entropy"] - h) < 1e-5
        assert int(got.loc[lang, "n_distinct"]) == len(cnt)


def test_reorder_gaps_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_reorder_gaps

    got = q_reorder_gaps(SF).to_pandas().set_index("gap_weeks")
    orders = pd.read_parquet(f"{SF}/orders.parquet",
                             columns=["o_custkey",
                                      "o_orderdate"]).dropna()
    orders["day"] = orders["o_orderdate"].astype("int64") // _DAY_US
    gaps = []
    for _, sub in orders.groupby("o_custkey"):
        d = np.sort(sub["day"].unique())
        gaps.extend(np.diff(d).tolist())
    ref = pd.Series(gaps).groupby(np.array(gaps) // 7).agg(
        ["count", "mean"])
    assert len(got) == len(ref)
    for wk, row in ref.iterrows():
        assert int(got.loc[wk, "n_gaps"]) == int(row["count"])
        assert abs(got.loc[wk, "mean_gap_days"] - row["mean"]) < 1e-6


def test_wilson_and_kw_and_huber(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import (q_huber_location,
                                                   q_kruskal_wallis,
                                                   q_wilson_ci)

    df = _events()
    df["vi"] = np.floor(round6_tie_robust(df["value"].values) * 1000.0
                        + 0.5).astype(np.int64)

    wil = q_wilson_ci(SF).to_pandas().set_index("event_type")
    med = np.median(df["vi"])
    z = 1.959963984540054
    for et, sub in df.groupby("event_type"):
        n = len(sub)
        k = int((sub["vi"] > med).sum())
        p = k / n
        cen = p + z * z / (2 * n)
        half = z * np.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
        den = 1 + z * z / n
        assert int(wil.loc[et, "k"]) == k
        assert abs(wil.loc[et, "wilson_lo"] - (cen - half) / den) < 1e-6
        assert abs(wil.loc[et, "wilson_hi"] - (cen + half) / den) < 1e-6

    kw = q_kruskal_wallis(SF).to_pandas().set_index("event_type")
    df["dow"] = (df["t_us"] // _DAY_US + 4) % 7
    for et, sub in df.groupby("event_type"):
        r = sub["vi"].rank(method="average").to_numpy()
        nn = len(sub)
        srr = sum(r[sub["dow"].to_numpy() == d].sum() ** 2
                  / (sub["dow"] == d).sum()
                  for d in sub["dow"].unique())
        h = 12.0 / (nn * (nn + 1)) * srr - 3 * (nn + 1)
        _, t = np.unique(sub["vi"], return_counts=True)
        c = 1 - (t.astype(float) ** 3 - t).sum() / (nn ** 3 - nn)
        assert abs(kw.loc[et, "h_stat"] - h) < 1e-4
        assert abs(kw.loc[et, "h_adj"] - h / c) < 1e-4

    hub = q_huber_location(SF).to_pandas().set_index("event_type")
    for et, sub in df.groupby("event_type"):
        v = sub["vi"].to_numpy(dtype=float)
        m = np.median(v)
        mad = np.median(np.abs(v - m))
        c = 1.345 * 1.4826 * mad
        mu = m
        for _ in range(2):
            ad = np.abs(v - mu)
            w = np.where(ad == 0, 1.0,
                         np.minimum(1.0, c / np.where(ad == 0, 1, ad)))
            mu = (w * v).sum() / w.sum()
        assert abs(hub.loc[et, "median_v"] - m / 1000.0) < 1e-9
        assert abs(hub.loc[et, "mad_scale"]
                   - 1.4826 * mad / 1000.0) < 1e-9
        # engine quantizes the iterate to milli between passes — agree
        # to half a milli
        assert abs(hub.loc[et, "huber_mu"] - mu / 1000.0) < 5e-4


def test_tail_effective_richclub_discount(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import (q_discount_bands,
                                                   q_effective_dim,
                                                   q_rich_club,
                                                   q_tail_codependence)

    tc = q_tail_codependence(SF).to_pandas()
    daily = _milli_daily(_events())
    piv = daily.pivot_table(index="day", columns="event_type",
                            values="mi")
    for _, row in tc.iterrows():
        a, b = row["type_a"], row["type_b"]
        sub = piv[[a, b]].dropna()
        pa_ = np.quantile(daily[daily["event_type"] == a]["mi"], 0.9)
        pb_ = np.quantile(daily[daily["event_type"] == b]["mi"], 0.9)
        fa = sub[a].to_numpy() > pa_
        fb = sub[b].to_numpy() > pb_
        assert int(row["nboth"]) == int((fa & fb).sum())
        assert abs(row["tail_lift"]
                   - (fa & fb).sum() * len(sub)
                   / (fa.sum() * fb.sum())) < 1e-5

    ed = q_effective_dim(SF).to_pandas().iloc[0]
    emb = pd.read_parquet(f"{SF}/embeddings.parquet").dropna(
        subset=["vec_id"])
    vi = np.floor(round6_tie_robust(
        np.vstack(emb["embedding"].values).astype(np.float64))
        * 1000.0 + 0.5)
    n = len(vi)
    C = n * (vi.T @ vi) - np.outer(vi.sum(0), vi.sum(0))
    tr = np.trace(C)
    assert abs(ed["effective_dim"] - tr * tr / (C * C).sum()) < 1e-3

    db = q_discount_bands(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet").dropna(
        subset=["l_discount", "l_quantity", "l_extendedprice"])
    assert int(db["n_items"].sum()) == len(li)

    rc = q_rich_club(SF).to_pandas().set_index("k")
    for k, row in rc.iterrows():
        nk, mk = int(row["n_nodes"]), int(row["n_edges"])
        assert 0 <= mk <= nk * (nk - 1) // 2
        assert abs(row["phi"] - 2.0 * mk / (nk * (nk - 1))) < 1e-6
