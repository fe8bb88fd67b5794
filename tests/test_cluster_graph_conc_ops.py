"""Cluster-purity / graph-census / dispersion / concentration pins vs
independent pandas references at sf0.001 (SQL oracles are checked
separately by tools/check_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_cluster_label_mix_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_cluster_label_mix

    got = q_cluster_label_mix(SF).to_pandas()
    e = pd.read_parquet(f"{SF}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding"]).sort_values("vec_id")
    mat = np.stack(e["embedding"].values).astype(np.float64)
    vi = np.floor(mat.round(6) * 1000.0 + 0.5).astype(np.int64)
    cents = vi[:4].copy()
    cls = np.arange(4)
    a = None
    for _ in range(3):
        d = ((vi[:, None, :] - cents[None]) ** 2).sum(axis=2)
        a = cls[np.argmin(d, axis=1)]
        live = np.unique(a)
        cents = np.stack([
            np.floor(vi[a == c].sum(axis=0).astype(np.float64)
                     / (a == c).sum() + 0.5).astype(np.int64)
            for c in live])
        cls = live
    lab = e["label"].values
    ok = pd.notna(lab)
    ref = pd.DataFrame({"cluster": a[ok],
                        "label": lab[ok].astype(np.int64)}).groupby(
        ["cluster", "label"]).size()
    g = got.set_index(["cluster", "label"])["n"]
    assert len(g) == len(ref)
    for (c, l), n in ref.items():
        assert int(g.loc[(int(c), int(l))]) == int(n)
    # mix totals equal the labeled-corpus size
    assert got["n"].sum() == int(ok.sum())


def test_degree_hist_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_degree_hist

    got = q_degree_hist(SF).to_pandas().set_index("degree")
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    op = li.drop_duplicates()
    j = op.merge(op, on="l_orderkey")
    j = j[j["l_partkey_x"] < j["l_partkey_y"]]
    e = j[["l_partkey_x", "l_partkey_y"]].drop_duplicates()
    nodes, deg = np.unique(
        np.concatenate([e["l_partkey_x"].values,
                        e["l_partkey_y"].values]), return_counts=True)
    dv, cnt = np.unique(deg, return_counts=True)
    assert len(got) == len(dv)
    for d, c in zip(dv, cnt):
        assert int(got.loc[int(d)]["n_nodes"]) == int(c)
    # histogram mass equals node count
    assert got["n_nodes"].sum() == len(nodes)


def test_overdispersion_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_overdispersion

    got = q_overdispersion(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "ts"]).dropna()
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    c = ev.groupby(["event_type", "day"]).size()
    for et, sub in c.groupby(level=0):
        cnt = sub.values.astype(np.float64)
        row = got.loc[et]
        assert int(row["n_days"]) == len(cnt)
        assert abs(float(row["mean_count"]) - cnt.mean()) < 1e-5
        want = cnt.var(ddof=1) / cnt.mean()
        assert abs(float(row["dispersion"]) - want) < 1e-5


def test_hhi_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_hhi_users

    got = q_hhi_users(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "user_id"]).dropna()
    c = ev.groupby(["event_type", "user_id"]).size()
    for et, sub in c.groupby(level=0):
        n = sub.values.astype(np.int64)
        row = got.loc[et]
        assert int(row["n_users"]) == len(n)
        want = (n.astype(object) ** 2).sum() / int(n.sum()) ** 2
        assert abs(float(row["hhi"]) - float(want)) < 1e-6
        # HHI bounds: [1/n_users, 1]
        assert 1.0 / len(n) - 1e-9 <= float(row["hhi"]) <= 1 + 1e-9
