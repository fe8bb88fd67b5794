"""Batch-15 operators vs independent single-process references at
sf0.001: Pythagorean means, per-doc lexical richness, Grubbs
studentized outliers, and the blocklist hit-rate audit (SQL oracles
are checked separately by tools/check_queries.py)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pyth_means_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_pyth_means

    got = q_pyth_means(SF).to_pandas().set_index("event_type")
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_type", "value"]).dropna()
    ev = ev[ev.value > 0]
    for etype, grp in ev.groupby("event_type"):
        v = grp.value.values.astype(np.float64)
        row = got.loc[etype]
        assert row.n == len(v)
        assert abs(row.mean_arith - v.mean()) < 1e-6
        assert abs(row.mean_geo - np.exp(np.log(v).mean())) < 1e-6
        assert abs(row.mean_harm - len(v) / (1.0 / v).sum()) < 1e-6


def test_lexical_richness_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_lexical_richness

    got = q_lexical_richness(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"]).dropna()
    for row in docs.itertuples():
        toks = [w for w in re.split(r"[^a-z0-9]+", row.text.lower())
                if w]
        if not toks:
            assert row.doc_id not in got.index
            continue
        tf = pd.Series(toks).value_counts()
        g = got.loc[row.doc_id]
        assert g.n_tokens == len(toks)
        assert g.n_types == len(tf)
        assert g.n_hapax == int((tf == 1).sum())
        assert abs(g.ttr - len(tf) / len(toks)) < 1e-6
        assert abs(g.hapax_share - int((tf == 1).sum()) / len(toks)) \
            < 1e-6


def test_grubbs_outliers_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import q_grubbs_outliers

    got = q_grubbs_outliers(SF).to_pandas()
    ev = pd.read_parquet(
        f"{SF}/events.parquet",
        columns=["event_type", "event_id", "value"]).dropna()
    for etype, grp in ev.groupby("event_type"):
        v = grp.value.values.astype(np.float64)
        mu, sd = v.mean(), v.std(ddof=1)
        score = np.round(np.abs(v - mu) / sd, 6)
        micro = np.floor(score * 1e6 + 0.5).astype(np.int64)
        order = np.lexsort((grp.event_id.values, -micro))[:3]
        want_ids = grp.event_id.values[order]
        sub = got[got.event_type == etype].sort_values("rn")
        assert sub.event_id.tolist() == want_ids.tolist()
        assert np.allclose(sub.score.values, score[order], atol=2e-6)
        assert sub.rn.tolist() == [1, 2, 3]


def test_blocklist_rate_matches_manual(ray_session):
    from light_curve_ray.pipelines.queries import (_BLOCKLIST_PAT,
                                                   q_blocklist_rate)

    got = q_blocklist_rate(SF).to_pandas().set_index("source")
    docs = pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["source", "text"]).dropna()
    pat = re.compile(_BLOCKLIST_PAT)
    docs["hit"] = [bool(pat.search(t.lower())) for t in docs.text]
    want = docs.groupby("source")["hit"].agg(["count", "sum"])
    assert set(got.index) == set(want.index)
    for s in want.index:
        g = got.loc[s]
        assert g.n_docs == want.loc[s, "count"]
        assert g.n_flagged == want.loc[s, "sum"]
        assert abs(g.flag_rate
                   - want.loc[s, "sum"] / want.loc[s, "count"]) < 1e-6
    assert got.n_flagged.sum() > 0  # the pattern actually fires
