"""Batch-14 operators vs independent single-process references at
sf0.001: local clustering coefficient and HITS on the co-purchase
graph, one-way ANOVA over event values, and global NTILE decile stats
(the SQL oracles are checked separately by tools/check_queries.py;
these pins are engine-internal)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _op_pairs():
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    return li.drop_duplicates()


def _supported_edges():
    counts = {}
    for _, grp in _op_pairs().groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        for pair in itertools.combinations(parts, 2):
            counts[pair] = counts.get(pair, 0) + 1
    return {p for p, n in counts.items() if n >= 2}


def test_clustering_coef_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_clustering_coef

    got = q_clustering_coef(SF).to_pandas().set_index("node")
    edges = _supported_edges()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want_nodes = {n for n, s in adj.items() if len(s) >= 2}
    assert set(got.index) == want_nodes
    for x in want_nodes:
        nbrs = sorted(adj[x])
        tri = sum(1 for u, v in itertools.combinations(nbrs, 2)
                  if (u, v) in edges)
        row = got.loc[x]
        assert row.degree == len(nbrs)
        assert row.triangles == tri
        want = 2.0 * tri / (len(nbrs) * (len(nbrs) - 1))
        assert abs(row.clustering - want) < 1e-6


def test_anova_events_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_anova_events

    got = q_anova_events(SF).to_pandas().iloc[0]
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"]).dropna()
    g = ev.groupby("event_type")["value"]
    n, k = len(ev), g.ngroups
    grand = ev.value.mean()
    ssb = float((g.count() * (g.mean() - grand) ** 2).sum())
    ssw = float(sum(((grp - grp.mean()) ** 2).sum()
                    for _, grp in g))
    assert got.k == k and got.n == n
    assert abs(got.ssb - ssb) < 1e-4
    assert abs(got.ssw - ssw) < 1e-3
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert abs(got.f_stat - f) < 1e-5


def test_ntile_stats_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_ntile_stats

    got = q_ntile_stats(SF).to_pandas().sort_values(
        "tile").reset_index(drop=True)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "value"]).dropna()
    ev = ev.sort_values(["value", "event_id"]).reset_index(drop=True)
    n = len(ev)
    q, r = divmod(n, 10)
    rk = np.arange(n)
    big = r * (q + 1)
    tile = np.where(rk < big, rk // (q + 1) + 1,
                    r + (rk - big) // q + 1)
    ev["tile"] = tile
    want = ev.groupby("tile")["value"].agg(["count", "min", "max",
                                            "mean"])
    assert got.tile.tolist() == list(want.index)
    assert got.n.tolist() == want["count"].tolist()
    assert np.allclose(got.vmin.values, want["min"].values, atol=1e-6)
    assert np.allclose(got.vmax.values, want["max"].values, atol=1e-6)
    assert np.allclose(got.vmean.values, want["mean"].values,
                       atol=1e-6)


def test_hits_scores_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_hits_scores

    got = q_hits_scores(SF).to_pandas().set_index("part")
    op = _op_pairs()
    a1 = op.groupby("l_partkey").size()
    h1 = op.merge(a1.rename("a1"), left_on="l_partkey",
                  right_index=True).groupby("l_orderkey")["a1"].sum()
    a2 = op.merge(h1.rename("h1"), left_on="l_orderkey",
                  right_index=True).groupby("l_partkey")["h1"].sum()
    m = a2.max()
    assert set(got.index) == set(a2.index)
    for part in a2.index:
        row = got.loc[part]
        assert row.degree == a1[part]
        assert row.authority_raw == a2[part]
        assert abs(row.authority - a2[part] / m) < 1e-6
