"""Session-4 operators vs independent single-process references at
sf0.001: graph kernels (triangles, PageRank), series metrics (max
drawdown, burstiness, backtest, lag features), weighted median,
temporal motifs, negative sampling and 1-NN accuracy must equal a
from-scratch pandas/numpy derivation (the SQL oracles are checked
separately by tools/check_queries.py; these pins are engine-internal
and survive oracle edits)."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet").dropna(
        subset=["event_type", "ts"])


def test_emit_run_pairs_small():
    from light_curve_ray.pipelines.queries import _emit_run_pairs

    vals = np.array([1, 5, 9, 2, 7, 3], dtype=np.int64)
    starts = np.array([0, 3, 5])
    lens = np.array([3, 2, 1])
    u, v = _emit_run_pairs(vals, starts, lens)
    got = sorted(zip(u.tolist(), v.tolist()))
    assert got == [(1, 5), (1, 9), (2, 7), (5, 9)]


def test_triangle_count_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_triangle_count

    got = q_triangle_count(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        edges.update(itertools.combinations(parts, 2))
    assert int(got["n_edges"][0]) == len(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = sum(len(adj[a] & adj[b]) for a, b in edges)
    assert int(got["n_triangles"][0]) * 3 == tri


def test_pagerank_matches_numpy(ray_session):
    from light_curve_ray.pipelines.queries import q_pagerank_parts

    got = q_pagerank_parts(SF).to_pandas().set_index("part")["pagerank"]
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).dropna()
    edges = set()
    for _, grp in li.drop_duplicates().groupby("l_orderkey"):
        parts = sorted(grp["l_partkey"].unique())
        edges.update(itertools.combinations(parts, 2))
    nodes = sorted({n for e in edges for n in e})
    idx = {n: i for i, n in enumerate(nodes)}
    deg = np.zeros(len(nodes))
    for a, b in edges:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    r = np.ones(len(nodes))
    for _ in range(2):
        contrib = np.zeros(len(nodes))
        for a, b in edges:
            contrib[idx[a]] += r[idx[b]] / deg[idx[b]]
            contrib[idx[b]] += r[idx[a]] / deg[idx[a]]
        r = np.round(0.15 + 0.85 * contrib, 6)
    ref = pd.Series(r, index=nodes)
    assert set(got.index) == set(ref.index)
    np.testing.assert_allclose(got.loc[ref.index], ref, atol=2e-6)


def test_max_drawdown_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_max_drawdown

    got = q_max_drawdown(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["value"])
    day = ev["ts"].astype("int64") // 86_400_000_000  # ts is us
    daily = (pd.DataFrame({"et": ev["event_type"], "day": day,
                           "v": ev["value"]})
             .groupby(["et", "day"])["v"].sum().round(6))
    for et, s in daily.groupby(level=0):
        cum = s.droplevel(0).sort_index().cumsum()
        dd = cum.cummax() - cum
        assert abs(got.loc[et, "max_drawdown"] - dd.max()) < 2e-6
        assert got.loc[et, "trough_day"] == dd.idxmax()


def test_forecast_backtest_matches_shift(ray_session):
    from light_curve_ray.pipelines.queries import q_forecast_backtest

    got = q_forecast_backtest(SF).to_pandas().set_index("event_type")
    ev = _events()
    day = ev["ts"].astype("int64") // 86_400_000_000  # ts is us
    daily = (pd.DataFrame({"et": ev["event_type"], "day": day})
             .groupby(["et", "day"]).size())
    for et, s in daily.groupby(level=0):
        s = s.droplevel(0).sort_index()
        pred = s.reindex(s.index - 7).to_numpy()
        ok = ~np.isnan(pred)
        if not ok.any():
            assert et not in got.index
            continue
        err = np.abs(s.to_numpy()[ok] - pred[ok])
        assert got.loc[et, "n_days"] == int(ok.sum())
        assert abs(got.loc[et, "mae"] - err.mean()) < 2e-6


def test_burstiness_formula(ray_session):
    from light_curve_ray.pipelines.queries import q_burstiness

    got = q_burstiness(SF).to_pandas().set_index("event_type")
    ev = _events()
    secs = ev["ts"].astype("int64") // 10**6  # ts is us
    for et, s in secs.groupby(ev["event_type"]):
        gap = np.diff(np.sort(s.to_numpy()))
        mu, sig = gap.mean(), gap.std()  # population std
        assert got.loc[et, "n_gaps"] == len(gap)
        assert abs(got.loc[et, "mean_gap_s"] - mu) < 2e-6
        assert abs(got.loc[et, "burstiness"]
                   - (sig - mu) / (sig + mu)) < 1e-4


def test_weighted_median_direct(ray_session):
    from light_curve_ray.pipelines.queries import q_weighted_median

    got = q_weighted_median(SF).to_pandas().set_index("l_returnflag")
    li = pd.read_parquet(f"{SF}/lineitem.parquet").dropna(
        subset=["l_returnflag", "l_extendedprice", "l_quantity"])
    for rf, grp in li.groupby("l_returnflag"):
        g = grp.sort_values("l_extendedprice")
        w = np.floor(g["l_quantity"].to_numpy()).astype(np.int64)
        cw = np.cumsum(w)
        k = int(np.searchsorted(2 * cw, cw[-1]))
        med = round(float(g["l_extendedprice"].to_numpy()[k]), 6)
        assert abs(got.loc[rf, "wmedian_price"] - med) < 2e-6
        assert got.loc[rf, "total_weight"] == int(cw[-1])


def test_temporal_motifs_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_temporal_motifs

    got = (q_temporal_motifs(SF).to_pandas()
           .set_index(["type_a", "type_b"])["n_pairs"])
    ev = _events().dropna(subset=["user_id"])
    t = ev["ts"].astype("int64")  # already us resolution
    df = pd.DataFrame({"u": ev["user_id"], "t": t,
                       "et": ev["event_type"]})
    ref: dict = {}
    for _, g in df.groupby("u"):
        g = g.sort_values("t")
        tv = g["t"].to_numpy()
        etv = g["et"].to_numpy()
        for i in range(len(g)):
            for j in range(i + 1, len(g)):
                if tv[j] <= tv[i]:
                    continue
                if tv[j] > tv[i] + 3_600_000_000:
                    break
                ref[(etv[i], etv[j])] = ref.get((etv[i], etv[j]), 0) + 1
    assert dict(got) == ref


def test_negative_sampling_is_deterministic_and_disjoint(ray_session):
    from light_curve_ray.pipelines.queries import q_negative_sampling

    a = q_negative_sampling(SF).to_pandas()
    b = q_negative_sampling(SF).to_pandas()
    key = ["user_id", "week", "neg_type", "rank"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    ev = _events().dropna(subset=["user_id"])
    week = ev["ts"].astype("int64") // 604_800_000_000  # ts is us
    pos = set(zip(ev["user_id"], week, ev["event_type"]))
    for row in a.itertuples():
        assert (row.user_id, row.week, row.neg_type) not in pos
        assert row.rank in (1, 2)


def test_knn_accuracy_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_knn_accuracy

    got = q_knn_accuracy(SF).to_pandas().set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ids = emb["vec_id"].to_numpy()
    labs = emb["label"].to_numpy()
    order = np.argsort(ids)
    ids, labs, mat = ids[order], labs[order], mat[order]
    sims = np.round(mat @ mat.T, 6)
    np.fill_diagonal(sims, -np.inf)
    best = np.argmax(sims, axis=1)  # first max = smallest vec_id
    correct = labs[best] == labs
    for lab in np.unique(labs):
        m = labs == lab
        assert got.loc[lab, "n"] == int(m.sum())
        assert got.loc[lab, "n_correct"] == int(correct[m].sum())


def test_lag_features_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_lag_features

    got = (q_lag_features(SF).to_pandas()
           .sort_values(["event_type", "day"]).reset_index(drop=True))
    ev = _events().dropna(subset=["value"])
    day = ev["ts"].astype("int64") // 86_400_000_000  # ts is us
    daily = (pd.DataFrame({"et": ev["event_type"], "day": day,
                           "v": ev["value"]})
             .groupby(["et", "day"])["v"].sum().round(6)
             .reset_index().sort_values(["et", "day"]))
    g = daily.groupby("et")["v"]
    ref = daily.assign(lag1=g.shift(1), lag7=g.shift(7),
                       rmean7=g.rolling(7, min_periods=1).mean()
                       .reset_index(drop=True))
    np.testing.assert_allclose(got["v"], ref["v"], atol=2e-6)
    np.testing.assert_allclose(got["lag1"], ref["lag1"], atol=2e-6)
    np.testing.assert_allclose(got["lag7"], ref["lag7"], atol=2e-6)
    np.testing.assert_allclose(got["rmean7"], ref["rmean7"], atol=2e-6)


def test_text_normalize_reference(ray_session):
    from light_curve_ray.pipelines.queries import q_text_normalize

    got = q_text_normalize(SF).to_pandas().set_index("doc_id")
    docs = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["doc_id", "text"])
    import unicodedata

    for row in docs.head(50).itertuples():
        ref = " ".join(unicodedata.normalize(
            "NFC", row.text).lower().split())
        assert got.loc[row.doc_id, "text_norm"] == ref
        assert got.loc[row.doc_id, "n_chars_norm"] == len(ref)


def test_embedding_quantize_reference(ray_session):
    from light_curve_ray.pipelines.queries import q_embedding_quantize

    got = q_embedding_quantize(SF).to_pandas().set_index("label")
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    mat = np.vstack(emb["embedding"].to_numpy()).astype(np.float64)
    lo, hi = mat.min(axis=0), mat.max(axis=0)
    span = hi - lo
    t = (mat - lo) / np.where(span > 0, span, 1.0)
    recon = np.where(span > 0,
                     lo + np.floor(t * 255.0 + 0.5) * span / 255.0, mat)
    se = ((mat - recon) ** 2)
    labs = emb["label"].to_numpy()
    for lab in np.unique(labs):
        m = labs == lab
        mse = se[m].mean() * 1e6
        assert got.loc[lab, "n_vecs"] == int(m.sum())
        assert abs(got.loc[lab, "mse_e6"] - mse) < 1e-4
