"""Clustering / drift / smoothing operator pins vs independent
references at sf0.001: fixed-round k-means, Jensen-Shannon drift and
Holt smoothing must equal a from-scratch derivation (SQL oracles are
checked separately by tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _milli_vectors():
    e = pd.read_parquet(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).dropna()
    e = e.sort_values("vec_id")
    mat = np.stack(e["embedding"].values).astype(np.float64)
    vi = np.floor(mat.round(6) * 1000.0 + 0.5).astype(np.int64)
    return e["vec_id"].values, vi


def test_kmeans_matches_bruteforce_lloyd(ray_session):
    from light_curve_ray.pipelines.queries import q_kmeans_embeddings

    got = q_kmeans_embeddings(SF).to_pandas()
    vid, vi = _milli_vectors()
    cents = vi[:4].copy()              # init = 4 lowest vec_ids
    cls = np.arange(4)
    sizes = None
    for _ in range(3):
        d = ((vi[:, None, :] - cents[None]) ** 2).sum(axis=2)
        a = cls[np.argmin(d, axis=1)]
        live = np.unique(a)
        cents = np.stack([
            np.floor(vi[a == c].sum(axis=0).astype(np.float64)
                     / (a == c).sum() + 0.5).astype(np.int64)
            for c in live])
        sizes = {int(c): int((a == c).sum()) for c in live}
        cls = live
    assert len(got) == len(cls) * vi.shape[1]
    g = got.set_index(["cluster", "dim"])
    for i, c in enumerate(cls):
        for dim in range(vi.shape[1]):
            row = g.loc[(int(c), dim + 1)]
            assert int(row["centroid_milli"]) == int(cents[i, dim])
            assert int(row["n"]) == sizes[int(c)]
    # partition property: sizes sum to the corpus
    assert sum(sizes.values()) == len(vi)


def test_jsd_drift_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_jsd_drift

    got = q_jsd_drift(SF).to_pandas().set_index("day")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    cnt = ev.groupby(["day", "event_type"]).size().unstack(
        fill_value=0).sort_index()
    mat = cnt.values.astype(np.float64)
    pr = mat / mat.sum(axis=1, keepdims=True)
    assert len(got) == len(cnt) - 1
    for i in range(1, len(cnt)):
        p, q = pr[i - 1], pr[i]
        m = (p + q) / 2
        jsd = 0.0
        for t in range(len(p)):
            if p[t] > 0:
                jsd += 0.5 * p[t] * np.log(p[t] / m[t])
            if q[t] > 0:
                jsd += 0.5 * q[t] * np.log(q[t] / m[t])
        assert abs(float(got.loc[int(cnt.index[i])]["jsd"]) - jsd) < 1e-5
        # JSD is bounded by ln 2 and non-negative
        assert -1e-9 <= jsd <= np.log(2) + 1e-9


def test_holt_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_holt_daily

    got = q_holt_daily(SF).to_pandas()
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts", "value"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    g = ev.groupby(["event_type", "day"])["value"].agg(["sum", "count"])
    g["mi"] = np.floor((g["sum"] / g["count"]).round(6) * 1000
                       + 0.5).astype(np.int64)
    for et, sub in g.reset_index().groupby("event_type"):
        sub = sub.sort_values("day")
        x = sub["mi"].values.astype(np.float64)
        lv, tr = x[0], 0.0
        want_l, want_b = [lv], [tr]
        for i in range(1, len(x)):
            l_new = 0.5 * x[i] + 0.5 * (lv + tr)
            tr = 0.5 * (l_new - lv) + 0.5 * tr
            lv = l_new
            want_l.append(lv)
            want_b.append(tr)
        fit = got[got["event_type"] == et].sort_values("day")
        assert list(fit["day"]) == list(sub["day"])
        assert np.allclose(fit["level"].values,
                           np.array(want_l) / 1000.0, atol=1e-5)
        assert np.allclose(fit["trend"].values,
                           np.array(want_b) / 1000.0, atol=1e-5)


def test_holt_known_case():
    # constant series: level stays at the constant, trend stays 0
    x = np.array([5.0, 5.0, 5.0])
    lv, tr = x[0], 0.0
    for i in range(1, len(x)):
        l_new = 0.5 * x[i] + 0.5 * (lv + tr)
        tr = 0.5 * (l_new - lv) + 0.5 * tr
        lv = l_new
    assert lv == 5.0 and tr == 0.0
