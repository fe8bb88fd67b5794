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


def _milli_daily():
    df = _events()
    df["day"] = df["t_us"] // _DAY_US
    g = df.groupby(["event_type", "day"])["value"].agg(
        ["sum", "count"]).reset_index()
    g["mi"] = _vi((g["sum"] / g["count"]).values)
    return g


def test_friedman_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_friedman_test

    got = q_friedman_test(SF).to_pandas().set_index("event_type")
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        sub = sub.sort_values("day")
        week = sub["day"].to_numpy(np.int64) // 7
        dow = sub["day"].to_numpy(np.int64) % 7
        mi = sub["mi"].to_numpy(np.int64)
        uw, cnts = np.unique(week, return_counts=True)
        full = uw[cnts == 7]
        if len(full) == 0:
            assert et not in got.index
            continue
        r2sum: dict = {}
        a2 = 0
        n = 0
        for wv in full:
            mask = week == wv
            x, dw = mi[mask], dow[mask]
            cl = (x[:, None] > x[None, :]).sum(axis=1)
            ce = (x[:, None] == x[None, :]).sum(axis=1)
            r2 = 2 * cl + ce + 1
            for p, rv in zip(dw, r2):
                r2sum[int(p)] = r2sum.get(int(p), 0) + int(rv)
            a2 += int((r2.astype(np.int64) ** 2).sum())
            n += 1
        s2 = sum((rv - 8 * n) ** 2 for rv in r2sum.values())
        den = a2 - 448 * n
        if den <= 0:
            assert et not in got.index
            continue
        row = got.loc[et]
        assert row["n_weeks"] == n
        assert abs(row["q_stat"] - 6.0 * s2 / den) < 1e-6
        # sanity: with 7 untied treatments, 0 <= Q <= 6n(k-1)/n bound-ish
        assert row["q_stat"] >= 0


def test_brown_forsythe_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_brown_forsythe

    got = q_brown_forsythe(SF).to_pandas().set_index("event_type")
    df = _events()
    df["dow"] = (df["t_us"] // _DAY_US + 4) % 7
    df["vi"] = _vi(df["value"].values)
    for et, sub in df.groupby("event_type"):
        zs = []
        for dow, d in sub.groupby("dow"):
            x = np.sort(d["vi"].to_numpy(np.int64))
            nj = len(x)
            m2 = int(x[(nj - 1) // 2]) + int(x[nj // 2])
            zs.append(np.abs(2 * d["vi"].to_numpy(np.int64) - m2)
                      .astype(np.float64))
        k = len(zs)
        if k < 2:
            assert et not in got.index or got.loc[et]["k"] >= 2
            continue
        allz = np.concatenate(zs)
        nn = len(allz)
        gm = allz.mean()
        ssb = sum(len(z) * (z.mean() - gm) ** 2 for z in zs)
        ssw = sum(((z - z.mean()) ** 2).sum() for z in zs)
        f = (ssb / (k - 1)) / (ssw / (nn - k))
        row = got.loc[et]
        assert row["k"] == k
        assert row["n"] == nn
        assert abs(row["f_bf"] - f) < 1e-4


def test_sample_entropy_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_sample_entropy

    got = q_sample_entropy(SF).to_pandas().set_index("event_type")
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy(np.int64)
        n = len(mi)
        if n < 4:
            assert et not in got.index
            continue
        x = np.sort(mi)
        med2 = int(x[(n - 1) // 2]) + int(x[n // 2])
        dev2 = np.sort(np.abs(2 * mi - med2))
        mad4 = int(dev2[(n - 1) // 2]) + int(dev2[n // 2])
        b = a = 0
        for i in range(n - 1):
            for j in range(i + 1, n - 1):
                if 4 * max(abs(int(mi[i]) - int(mi[j])),
                           abs(int(mi[i + 1]) - int(mi[j + 1]))) \
                        <= mad4:
                    b += 1
        for i in range(n - 2):
            for j in range(i + 1, n - 2):
                if 4 * max(abs(int(mi[i]) - int(mi[j])),
                           abs(int(mi[i + 1]) - int(mi[j + 1])),
                           abs(int(mi[i + 2]) - int(mi[j + 2]))) \
                        <= mad4:
                    a += 1
        if a == 0 or b == 0:
            assert et not in got.index
            continue
        row = got.loc[et]
        assert row["n_days"] == n
        assert row["b_count"] == b
        assert row["a_count"] == a
        assert abs(row["sampen"] - (-math.log(a / b))) < 1e-6


def test_bollinger_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_bollinger_daily

    got = q_bollinger_daily(SF).to_pandas().set_index("event_type")
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy(np.int64)
        n = len(mi)
        if n < 7:
            assert et not in got.index
            continue
        na = nb = 0
        widths = []
        for i in range(6, n):
            w = mi[i - 6:i + 1].astype(np.float64)
            m = w.mean()
            sd = w.std()  # population std over the 7-day window
            if mi[i] > m + 2 * sd:
                na += 1
            elif mi[i] < m - 2 * sd:
                nb += 1
            widths.append(4 * sd / 1000.0)
        row = got.loc[et]
        assert row["n_windows"] == n - 6
        assert row["n_above"] == na
        assert row["n_below"] == nb
        assert abs(row["mean_band_width"]
                   - float(np.mean(widths))) < 1e-5


def test_ndcg_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_ndcg_eval

    got = q_ndcg_eval(SF).to_pandas().set_index("event_type")
    df = _events().dropna(subset=["user_id"])
    u = df.groupby(["event_type", "user_id"])["value"].agg(
        ["sum", "count"]).reset_index()
    for et, sub in u.groupby("event_type"):
        svi = np.floor(round6_tie_robust(sub["sum"].to_numpy(np.float64))
                       * 1e6 + 0.5).astype(np.int64)
        cnt = sub["count"].to_numpy(np.int64)
        uid = sub["user_id"].to_numpy(np.int64)
        pred = np.lexsort((uid, -svi))[:10]
        ideal = np.lexsort((uid, -cnt))[:10]
        dcg = sum(int(cnt[j]) * (2520 // (i + 1))
                  for i, j in enumerate(pred))
        idcg = sum(int(cnt[j]) * (2520 // (i + 1))
                   for i, j in enumerate(ideal))
        row = got.loc[et]
        assert row["n_users"] == len(sub)
        assert row["dcg_num"] == dcg
        assert row["idcg_num"] == idcg
        # NDCG in (0, 1]; ideal ranking of the gains is an upper bound
        assert 0 < row["ndcg"] <= 1.0
        assert abs(row["ndcg"] - dcg / idcg) < 1e-6


def test_adjusted_rand_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_adjusted_rand

    got = q_adjusted_rand(SF).to_pandas()
    df = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["source", "n_chars"])
    band = ((df["n_chars"] >= 150).astype(int)
            + (df["n_chars"] >= 300) + (df["n_chars"] >= 450))
    ct = pd.crosstab(df["source"], band)
    n = int(ct.values.sum())
    comb2 = lambda v: int(v) * (int(v) - 1) // 2
    sij = sum(comb2(v) for v in ct.values.ravel())
    sa = sum(comb2(v) for v in ct.sum(axis=1))
    sb = sum(comb2(v) for v in ct.sum(axis=0))
    p = comb2(n)
    exp = (sij - sa * sb / p) / ((sa + sb) / 2 - sa * sb / p)
    assert len(got) == 1
    row = got.iloc[0]
    assert row["n_docs"] == n
    assert row["k_source"] == ct.shape[0]
    assert row["k_band"] == (band.nunique())
    assert row["sum_pair_cells"] == sij
    assert abs(row["ari"] - exp) < 1e-6
    assert -0.5 <= row["ari"] <= 1.0


def test_adjusted_rand_perfect_agreement():
    # identical partitions => ARI == 1 by the exact-int formula
    nij = [5, 7, 9]  # diagonal contingency
    sij = sum(v * (v - 1) // 2 for v in nij)
    n = sum(nij)
    p = n * (n - 1) // 2
    sa = sb = sij
    ari = (2 * p * sij - 2 * sa * sb) / (p * (sa + sb) - 2 * sa * sb)
    assert ari == 1.0


def test_haar_energy_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_haar_energy

    got = q_haar_energy(SF).to_pandas().set_index(
        ["event_type", "level"])
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        x = sub.sort_values("day")["mi"].to_numpy(np.int64)
        for level in (1, 2, 3):
            m = len(x) // 2
            if m == 0:
                assert (et, level) not in got.index
                break
            ev, od = x[0:2 * m:2], x[1:2 * m:2]
            dd = (ev - od).astype(np.int64)
            x = ev + od
            row = got.loc[(et, level)]
            assert row["n_coef"] == m
            exp = float((dd ** 2).sum()) / (2.0 ** level * 1e6)
            assert abs(row["energy"] - exp) < max(1e-5, 1e-6 * exp)
    # Parseval sanity: total detail energy <= series variance * n
    # (orthonormal Haar partitions variance across levels)


def test_haar_energy_parseval_identity():
    # full dyadic series: sum of level energies + coarse energy
    # equals total sum of squares (orthonormal decomposition)
    rng = np.random.RandomState(7)
    x = rng.randint(0, 1000, size=8).astype(np.int64)
    total = float((x.astype(np.float64) ** 2).sum())
    acc = 0.0
    cur = x
    for level in (1, 2, 3):
        ev, od = cur[0::2], cur[1::2]
        dd = ev - od
        acc += float((dd ** 2).sum()) / 2.0 ** level
        cur = ev + od
    acc += float((cur ** 2).sum()) / 8.0  # coarse scaling energy
    assert abs(acc - total) < 1e-9


def test_roc_auc_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_roc_auc

    got = q_roc_auc(SF).to_pandas().set_index("event_type")
    df = _events().dropna(subset=["user_id"])
    u = df.groupby(["event_type", "user_id"])["value"].agg(
        ["count", "sum"]).reset_index()
    for et, sub in u.groupby("event_type"):
        cnt = sub["count"].to_numpy(np.int64)
        svi = np.floor(round6_tie_robust(
            sub["sum"].to_numpy(np.float64)) * 1e6
            + 0.5).astype(np.int64)
        tots, totn = int(svi.sum()), int(cnt.sum())
        pos = np.array([int(a) * totn > tots * int(b)
                        for a, b in zip(svi, cnt)], bool)
        n_pos, n_neg = int(pos.sum()), int((~pos).sum())
        if n_pos == 0 or n_neg == 0:
            assert et not in got.index
            continue
        # independent AUC: pairwise win fraction with half ties
        wins = 0.0
        for cp in cnt[pos]:
            wins += float((cp > cnt[~pos]).sum())
            wins += 0.5 * float((cp == cnt[~pos]).sum())
        row = got.loc[et]
        assert row["n_pos"] == n_pos
        assert row["n_neg"] == n_neg
        assert abs(row["auc"] - wins / (n_pos * n_neg)) < 1e-6
        assert row["u_stat_x2"] == int(round(2 * wins))


def test_naive_bayes_matches_direct(ray_session):
    from fractions import Fraction

    from light_curve_ray.pipelines.queries import q_naive_bayes

    got = q_naive_bayes(SF).to_pandas().set_index("event_type")
    df = _events()
    df["dow"] = (df["t_us"] // _DAY_US + 4) % 7
    v = df["value"].to_numpy(np.float64)
    df["band"] = ((v >= 50.0).astype(int) + (v >= 100.0)
                  + (v >= 200.0) + (v >= 400.0))
    df["hb"] = (df["t_us"] % _DAY_US) // 21_600_000_000
    classes = sorted(df["event_type"].unique())
    n_c = df.groupby("event_type").size().to_dict()
    t1 = df.groupby(["event_type", "dow"]).size().to_dict()
    t2 = df.groupby(["event_type", "band"]).size().to_dict()
    t3 = df.groupby(["event_type", "hb"]).size().to_dict()

    def predict(dow, band, hb):
        best = None
        for c in classes:
            n = int(n_c[c])
            score = Fraction(
                n * (t1.get((c, dow), 0) + 1)
                * (t2.get((c, band), 0) + 1)
                * (t3.get((c, hb), 0) + 1),
                (n + 7) * (n + 5) * (n + 4))
            if best is None or score > best[0]:
                best = (score, c)
        return best[1]

    correct = {}
    total = {}
    for row in df.itertuples():
        p = predict(int(row.dow), int(row.band), int(row.hb))
        total[row.event_type] = total.get(row.event_type, 0) + 1
        if p == row.event_type:
            correct[row.event_type] = correct.get(
                row.event_type, 0) + 1
    for et in classes:
        row = got.loc[et]
        assert row["n"] == total[et]
        assert row["n_correct"] == correct.get(et, 0)
        assert abs(row["recall"]
                   - correct.get(et, 0) / total[et]) < 1e-6


def test_matrix_profile_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_matrix_profile

    got = q_matrix_profile(SF).to_pandas().set_index("event_type")
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        sub = sub.sort_values("day")
        mi = sub["mi"].to_numpy(np.int64)
        days = sub["day"].to_numpy(np.int64)
        nw = len(mi) - 3
        if nw < 3:
            assert et not in got.index
            continue
        mp = []
        for i in range(nw):
            best = None
            for j in range(nw):
                if abs(i - j) < 2:
                    continue
                d2 = sum((int(mi[i + t]) - int(mi[j + t])) ** 2
                         for t in range(4))
                best = d2 if best is None else min(best, d2)
            mp.append(best)
        disc = max(range(nw), key=lambda i: (mp[i], -i))
        row = got.loc[et]
        assert row["n_windows"] == nw
        assert row["discord_idx"] == disc + 1
        assert row["discord_day"] == days[disc]
        assert abs(row["discord_d2"] - mp[disc] / 1e6) < 1e-5
        assert abs(row["motif_d2"] - min(mp) / 1e6) < 1e-5
        assert abs(row["mean_mp"] - sum(mp) / (1e6 * nw)) < 1e-5


def test_label_propagation_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_label_propagation

    got = q_label_propagation(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]].dropna().drop_duplicates()
    from collections import Counter, defaultdict
    pairs = Counter()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pairs[(ps[i], ps[j])] += 1
    edges = [e for e, c in pairs.items() if c >= 2]
    adj = defaultdict(list)
    for u, v in edges:
        adj[u].append(v)
        adj[v].append(u)
    lab = {n: n for n in adj}
    for _ in range(2):
        new = {}
        for n, nbrs in adj.items():
            cnt = Counter(lab[x] for x in nbrs)
            best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            new[n] = best[0]
        lab = new
    sizes = Counter(lab.values())
    exp = pd.DataFrame(sorted(sizes.items()),
                       columns=["label", "size"])
    gs = got.sort_values("label").reset_index(drop=True)
    assert len(gs) == len(exp)
    assert (gs["label"].to_numpy() == exp["label"].to_numpy()).all()
    assert (gs["size"].to_numpy() == exp["size"].to_numpy()).all()


def test_ngram_novelty_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_ngram_novelty

    got = q_ngram_novelty(SF).to_pandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["doc_id", "source", "text"]).sort_values("doc_id")
    first = {}
    per_src = {}
    for row in docs.itertuples():
        toks = [t for t in re.split(r"[^a-z0-9]+", row.text.lower())
                if t]
        grams = {" ".join(toks[i:i + 3])
                 for i in range(len(toks) - 2)}
        tot, nov = per_src.get(row.source, (0, 0))
        for gm in grams:
            if gm not in first or first[gm] > row.doc_id:
                first[gm] = row.doc_id
    # second pass now that global first-doc is known
    for row in docs.itertuples():
        toks = [t for t in re.split(r"[^a-z0-9]+", row.text.lower())
                if t]
        grams = {" ".join(toks[i:i + 3])
                 for i in range(len(toks) - 2)}
        tot, nov = per_src.get(row.source, (0, 0))
        tot += len(grams)
        nov += sum(1 for gm in grams if first[gm] == row.doc_id)
        per_src[row.source] = (tot, nov)
    for src, (tot, nov) in per_src.items():
        row = got.loc[src]
        assert row["n_grams"] == tot
        assert row["n_novel"] == nov
        assert abs(row["novelty_rate"] - nov / tot) < 1e-6


def test_large_orders_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_large_orders

    got = q_large_orders(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_quantity"]].dropna()
    tot = li.groupby("l_orderkey")["l_quantity"].sum()
    big = tot[tot > 300]
    orders = pd.read_parquet(f"{SF}/orders.parquet").set_index(
        "o_orderkey")
    assert len(got) == len(big)
    g = got.set_index("o_orderkey")
    for ok, q in big.items():
        row = g.loc[ok]
        assert row["total_qty"] == int(q)
        assert row["o_custkey"] == orders.loc[ok, "o_custkey"]
        assert row["orderdate_us"] == int(
            orders.loc[ok, "o_orderdate"].value) // 1000
        assert abs(row["o_totalprice"]
                   - orders.loc[ok, "o_totalprice"]) < 1e-5


def test_small_qty_revenue_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_small_qty_revenue

    got = q_small_qty_revenue(SF).to_pandas().set_index("p_brand")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_partkey", "l_quantity", "l_extendedprice"]].dropna()
    st = li.groupby("l_partkey")["l_quantity"].agg(["count", "sum"])
    part = pd.read_parquet(f"{SF}/part.parquet")[
        ["p_partkey", "p_brand"]].dropna().set_index("p_partkey")
    m = li.join(st, on="l_partkey")
    small = m[5 * m["l_quantity"].astype(np.int64)
              * m["count"] < m["sum"]]
    small = small.join(part, on="l_partkey").dropna(
        subset=["p_brand"])
    for brand, sub in small.groupby("p_brand"):
        row = got.loc[brand]
        assert row["n_items"] == len(sub)
        assert abs(row["avg_yearly"]
                   - sub["l_extendedprice"].sum() / 7.0) < 1e-4


def test_idle_balance_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import (_IDLE_CUTOFF_US,
                                                   q_idle_balance)

    got = q_idle_balance(SF).to_pandas().set_index("c_nationkey")
    cust = pd.read_parquet(f"{SF}/customer.parquet").dropna(
        subset=["c_custkey", "c_nationkey", "c_acctbal"])
    pos = cust[cust["c_acctbal"] > 0].copy()
    avi = np.floor(round6_tie_robust(
        pos["c_acctbal"].to_numpy(np.float64)) * 1e6
        + 0.5).astype(np.int64)
    s, n = int(avi.sum()), len(avi)
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    recent = set(orders[orders["o_orderdate"]
                        >= pd.Timestamp("2000-07-01")]["o_custkey"])
    pos["above"] = [int(a) * n > s for a in avi]
    idle = pos[pos["above"]
               & ~pos["c_custkey"].isin(recent)]
    assert int(got["n_custs"].sum()) == len(idle)
    for nk, sub in idle.groupby("c_nationkey"):
        row = got.loc[nk]
        assert row["n_custs"] == len(sub)
        assert abs(row["total_acctbal"]
                   - sub["c_acctbal"].sum()) < 1e-4


def test_dfa_matches_direct(ray_session):
    import math

    from light_curve_ray.pipelines.queries import q_dfa_fluctuation

    got = q_dfa_fluctuation(SF).to_pandas().set_index(
        ["event_type", "scale"])
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy(np.int64)
        n = len(mi)
        x = np.sort(mi)
        med2 = int(x[(n - 1) // 2]) + int(x[n // 2])
        prof = np.cumsum(2 * mi - med2)
        for s in (4, 8, 16):
            nb = n // s
            if nb < 2:
                assert (et, s) not in got.index
                continue
            # independent reference: float least squares per box
            total = 0.0
            for b in range(nb):
                y = prof[b * s:(b + 1) * s].astype(np.float64)
                xs = np.arange(s, dtype=np.float64)
                A = np.vstack([xs, np.ones(s)]).T
                res = y - A @ np.linalg.lstsq(A, y, rcond=None)[0]
                total += float((res ** 2).sum())
            exp = math.sqrt(total / (nb * s)) / 2000.0
            row = got.loc[(et, s)]
            assert row["n_boxes"] == nb
            assert abs(row["fluct"] - exp) < max(1e-4, 1e-5 * exp)


def test_lis_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_lis_daily

    got = q_lis_daily(SF).to_pandas().set_index("event_type")
    g = _milli_daily()
    for et, sub in g.groupby("event_type"):
        mi = sub.sort_values("day")["mi"].to_numpy(np.int64)
        n = len(mi)
        # O(n^2) DP reference
        dp = [1] * n
        for i in range(n):
            for j in range(i):
                if mi[j] < mi[i]:
                    dp[i] = max(dp[i], dp[j] + 1)
        row = got.loc[et]
        assert row["n_days"] == n
        assert row["lis_len"] == max(dp)


def test_source_gram_overlap_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_source_gram_overlap

    got = q_source_gram_overlap(SF).to_pandas()
    docs = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["source", "text"])
    sets: dict = {}
    for row in docs.itertuples():
        toks = [t for t in re.split(r"[^a-z0-9]+", row.text.lower())
                if t]
        grams = {" ".join(toks[i:i + 3])
                 for i in range(len(toks) - 2)}
        sets.setdefault(row.source, set()).update(grams)
    srcs = sorted(sets)
    exp = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            sh = len(sets[a] & sets[b])
            if sh:
                exp[(a, b)] = (len(sets[a]), len(sets[b]), sh)
    assert len(got) == len(exp)
    for row in got.itertuples():
        na, nb, sh = exp[(row.source_a, row.source_b)]
        assert row.n_a == na and row.n_b == nb and row.n_shared == sh
        assert abs(row.jaccard - sh / (na + nb - sh)) < 1e-6


def test_wasserstein_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_wasserstein_weekend

    got = q_wasserstein_weekend(SF).to_pandas().set_index(
        "event_type")
    df = _events()
    df["vi"] = _vi(df["value"].values)
    dow = (df["t_us"] // _DAY_US + 4) % 7
    df["wk"] = ((dow == 0) | (dow == 6)).astype(int)
    for et, sub in df.groupby("event_type"):
        a = np.sort(sub[sub["wk"] == 1]["vi"].to_numpy(np.float64))
        b = np.sort(sub[sub["wk"] == 0]["vi"].to_numpy(np.float64))
        if len(a) == 0 or len(b) == 0:
            assert et not in got.index
            continue
        # independent reference: quantile-function integral form
        allv = np.sort(np.concatenate([a, b]))
        # piecewise-constant CDF difference integral
        support = np.unique(allv)
        Fa = np.searchsorted(a, support, side="right") / len(a)
        Fb = np.searchsorted(b, support, side="right") / len(b)
        w1 = float(np.sum(np.abs(Fa[:-1] - Fb[:-1])
                          * np.diff(support))) / 1000.0
        row = got.loc[et]
        assert row["n_weekend"] == len(a)
        assert row["n_weekday"] == len(b)
        assert abs(row["w1"] - w1) < 1e-5


def test_edge_support_hist_matches_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_edge_support_hist

    got = q_edge_support_hist(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[
        ["l_orderkey", "l_partkey"]].dropna().drop_duplicates()
    edges = set()
    for _, grp in li.groupby("l_orderkey"):
        ps = sorted(grp["l_partkey"].unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                edges.add((ps[i], ps[j]))
    from collections import Counter, defaultdict
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    sup = Counter()
    for u, v in edges:
        sup[(u, v)] = len(adj[u] & adj[v])
    hist = Counter(sup.values())
    exp = pd.DataFrame(sorted(hist.items()),
                       columns=["support", "n_edges"])
    gs = got.sort_values("support").reset_index(drop=True)
    assert len(gs) == len(exp)
    assert (gs["support"].to_numpy() == exp["support"].to_numpy()
            ).all()
    assert (gs["n_edges"].to_numpy() == exp["n_edges"].to_numpy()
            ).all()
    # identity: sum over edges of support == 3 * n_triangles
    assert int((gs["support"] * gs["n_edges"]).sum()) % 3 == 0


def test_mrr_matches_direct(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_mrr_eval

    got = q_mrr_eval(SF).to_pandas().set_index("event_type")
    df = _events().dropna(subset=["user_id"])
    u = df.groupby(["event_type", "user_id"])["value"].agg(
        ["count", "sum"]).reset_index()
    for et, sub in u.groupby("event_type"):
        cnt = sub["count"].to_numpy(np.int64)
        svi = np.floor(round6_tie_robust(
            sub["sum"].to_numpy(np.float64)) * 1e6
            + 0.5).astype(np.int64)
        uid = sub["user_id"].to_numpy(np.int64)
        tots, totn = int(svi.sum()), int(cnt.sum())
        rel = np.array([int(a) * totn > tots * int(b)
                        for a, b in zip(svi, cnt)], bool)
        if not rel.any():
            assert et not in got.index
            continue
        order = np.lexsort((uid, -svi))
        rs = rel[order]
        fr = int(np.nonzero(rs)[0][0]) + 1
        row = got.loc[et]
        assert row["n_rel"] == int(rel.sum())
        assert row["first_rel_rank"] == fr
        assert abs(row["mrr"] - 1.0 / fr) < 1e-9
        assert row["hits10"] == int(rs[:10].sum())
        assert abs(row["recall_at_10"]
                   - int(rs[:10].sum()) / int(rel.sum())) < 1e-6
