"""Batch-12 operators vs independent single-process references at
sf0.001: Adamic-Adar link prediction over the supported co-purchase
graph, the TPC-H Q3/Q5-shaped join analytics, and the Gini decision
stump must equal a from-scratch pandas/numpy derivation (the SQL
oracles are checked separately by tools/check_queries.py; these pins
are engine-internal and survive oracle edits)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"

CUTOFF = pd.Timestamp("1998-01-01")


def _supported_edges():
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    counts = {}
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        for pair in itertools.combinations(parts, 2):
            counts[pair] = counts.get(pair, 0) + 1
    return {p for p, n in counts.items() if n >= 2}


def test_adamic_adar_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_adamic_adar

    got = q_adamic_adar(SF).to_pandas()
    edges = _supported_edges()
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(s) for n, s in adj.items()}
    want = {}
    for w, nbrs in adj.items():
        for u, v in itertools.combinations(sorted(nbrs), 2):
            if (u, v) in edges:
                continue
            s, c = want.get((u, v), (0.0, 0))
            want[(u, v)] = (s + 1.0 / np.log(deg[w]), c + 1)
    assert len(got) == len(want)
    for row in got.itertuples():
        s, c = want[(row.u, row.v)]
        assert row.n_common == c
        assert abs(row.adamic_adar - s) < 1e-5


def test_shipping_priority_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_shipping_priority

    got = q_shipping_priority(SF).to_pandas()
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    bld = set(cust.loc[cust.c_mktsegment == "BUILDING", "c_custkey"])
    o = orders[(orders.o_orderdate < CUTOFF)
               & orders.o_custkey.isin(bld)]
    l = li[li.l_shipdate > CUTOFF]
    j = l.merge(o, left_on="l_orderkey", right_on="o_orderkey")
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    g = j.groupby(["l_orderkey"]).agg(
        rev=("rev", "sum"),
        od=("o_orderdate", "first"),
        pri=("o_orderpriority", "first")).reset_index()
    g["micro"] = np.floor(g.rev.round(6) * 1e6 + 0.5).astype(np.int64)
    g = g.sort_values(["micro", "l_orderkey"],
                      ascending=[False, True]).head(10)
    assert len(got) == min(10, len(g))
    got = got.sort_values("rn").reset_index(drop=True)
    assert got.l_orderkey.tolist() == g.l_orderkey.tolist()
    assert np.allclose(got.rev_total.values, g.rev.round(6).values,
                       atol=1e-5)
    want_us = g.od.values.astype("datetime64[us]").astype(np.int64)
    assert (got.orderdate_us.values == want_us).all()
    assert got.o_orderpriority.tolist() == g.pri.tolist()
    assert got.rn.tolist() == list(range(1, len(got) + 1))


def test_regional_volume_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_regional_volume

    got = q_regional_volume(SF).to_pandas().set_index("nation")["volume"]
    region = pd.read_parquet(f"{SF}/region.parquet")
    nation = pd.read_parquet(f"{SF}/nation.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    supp = pd.read_parquet(f"{SF}/supplier.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    asia = nation.merge(region, left_on="n_regionkey",
                        right_on="r_regionkey")
    asia = asia[asia.r_name == "ASIA"]
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    o = orders[(orders.o_orderdate >= lo) & (orders.o_orderdate < hi)]
    j = (li.merge(o, left_on="l_orderkey", right_on="o_orderkey")
           .merge(cust, left_on="o_custkey", right_on="c_custkey")
           .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
           .merge(asia, left_on="s_nationkey", right_on="n_nationkey"))
    j = j[j.c_nationkey == j.s_nationkey]
    j["rev"] = j.l_extendedprice * (1 - j.l_discount)
    want = j.groupby("n_name")["rev"].sum()
    assert set(got.index) == set(want.index)
    for k in want.index:
        assert abs(got[k] - want[k]) < 1e-4


def test_gini_stump_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_gini_stump

    got = q_gini_stump(SF).to_pandas().iloc[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["text", "lang"]).dropna()
    b = np.minimum(docs.text.str.len().values // 16, 63).astype(int)
    y = (docs.lang == "en").values.astype(int)
    nt, pt = len(b), int(y.sum())
    best = None
    for c in sorted(set(b)):
        m = b <= c
        nl, pl = int(m.sum()), int(y[m].sum())
        nr, pr = nt - nl, pt - pl
        if nr == 0:
            continue
        ql, qr = nl - pl, nr - pr
        h = float(pl * pl + ql * ql) / nl + float(pr * pr + qr * qr) / nr
        if best is None or h > best[0]:
            best = (h, c, nl, nr, pl, pr)
    h, c, nl, nr, pl, pr = best
    assert got.threshold == (c + 1) * 16
    assert (got.n_left, got.n_right) == (nl, nr)
    assert (got.pos_left, got.pos_right) == (pl, pr)
    assert abs(got.gini - (nt - h) / nt) < 1e-6
