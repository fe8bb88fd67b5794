"""Peak-census / privacy / covariance / sweep-line operator pins vs
independent pandas references at sf0.001 (SQL oracles are checked
separately by tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_local_peaks_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_local_peaks

    got = q_local_peaks(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    g = ev.groupby(["event_type", "day"])["value"].agg(["sum", "count"])
    g["mi"] = np.floor((g["sum"] / g["count"]).round(6) * 1000
                       + 0.5).astype(np.int64)
    for et, sub in g.reset_index().groupby("event_type"):
        mi = sub.sort_values("day")["mi"].values
        a, b, c = mi[:-2], mi[1:-1], mi[2:]
        row = got.loc[et]
        assert int(row["n_peaks"]) == int(((b > a) & (b > c)).sum())
        assert int(row["n_valleys"]) == int(((b < a) & (b < c)).sum())


def test_ldiversity_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_ldiversity_audit

    got = q_ldiversity_audit(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "user_id"]).dropna()
    t = ev["ts"].astype("int64")
    ev["hour"] = (t % 86_400_000_000) // 3_600_000_000
    l = ev.groupby(["event_type", "hour"])["user_id"].nunique()
    for et, sub in l.groupby(level=0):
        row = got.loc[et]
        assert int(row["groups_pass"]) == int((sub >= 3).sum())
        assert int(row["groups_fail"]) == int((sub < 3).sum())
        assert int(row["min_diversity"]) == int(sub.min())


def test_embedding_covariance_matches_numpy(ray_session):
    from light_curve_ray.pipelines.queries import q_embedding_covariance

    got = q_embedding_covariance(SF).to_pandas().set_index(["i", "j"])
    e = pd.read_parquet(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).dropna()
    mat = np.stack(e["embedding"].values).astype(np.float64)
    vi = np.floor(mat.round(6) * 1000.0 + 0.5)
    n, d = vi.shape
    assert len(got) == d * (d + 1) // 2
    # exact definition: (n*Sij - Si*Sj) / (1e6 * n * (n-1))
    want = (n * (vi.T @ vi) - np.outer(vi.sum(0), vi.sum(0))) / (
        1e6 * n * (n - 1))
    # spot-check diag + a band of off-diagonals
    for i in range(d):
        assert abs(float(got.loc[(i + 1, i + 1)]["cov"])
                   - want[i, i]) < 1e-5
    for i in range(0, d - 1, 7):
        assert abs(float(got.loc[(i + 1, i + 2)]["cov"])
                   - want[i, i + 1]) < 1e-5
    # diagonal of a covariance matrix is non-negative
    diag = np.array([float(got.loc[(i + 1, i + 1)]["cov"])
                     for i in range(d)])
    assert (diag >= -1e-9).all()


def test_max_concurrency_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_max_concurrency

    got = q_max_concurrency(SF).to_pandas().set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts"]).dropna()
    ev["t_us"] = ev["ts"].astype("int64")
    # sessionize: 30-min gap per user
    iv = []
    for _, sub in ev.groupby("user_id"):
        t = np.sort(sub["t_us"].values)
        brk = np.concatenate([[True], np.diff(t) > 1_800_000_000])
        sid = np.cumsum(brk)
        for s in np.unique(sid):
            ts = t[sid == s]
            iv.append((ts.min(), ts.max() + 1))
    deltas = {}
    for st, en in iv:
        deltas[st] = deltas.get(st, 0) + 1
        deltas[en] = deltas.get(en, 0) - 1
    ts = np.array(sorted(deltas))
    conc = np.cumsum([deltas[t] for t in ts])
    day = ts // 86_400_000_000
    for u in np.unique(day):
        assert int(got.loc[int(u)]["max_concurrent"]) == int(
            conc[day == u].max())
    assert len(got) == len(np.unique(day))
