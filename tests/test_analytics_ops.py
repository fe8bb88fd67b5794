"""Round-4 analytics operators vs independent pandas references at
sf0.001: the distributed kernels (regex JSON scan, Markov pairs,
co-visitation expansion, Benford digits, rolling-MAD anomalies) must
equal a from-scratch single-process derivation."""

from __future__ import annotations

import json

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def _events():
    return pd.read_parquet(f"{SF}/events.parquet")


def test_json_props_matches_json_loads(ray_session):
    from light_curve_ray.pipelines.queries import q_json_props

    got = q_json_props(SF).to_pandas().sort_values("event_type"
                                                   ).reset_index(drop=True)
    ev = _events().dropna(subset=["event_type", "props"])
    ks = ev["props"].map(lambda s: json.loads(s).get("k"))
    ref = (pd.DataFrame({"event_type": ev["event_type"], "k": ks})
           .dropna().groupby("event_type")["k"]
           .agg(["count", "sum"]).reset_index()
           .sort_values("event_type").reset_index(drop=True))
    assert list(got["n"]) == list(ref["count"])
    assert list(got["sum_k"]) == list(ref["sum"].astype(int))
    np.testing.assert_allclose(
        got["mean_k"], ref["sum"] / ref["count"], atol=5e-7)


def test_markov_transitions_matches_shift(ray_session):
    from light_curve_ray.pipelines.queries import q_markov_transitions

    got = q_markov_transitions(SF).to_pandas()
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    nxt = ev.groupby("user_id")["event_type"].shift(-1)
    ref = (pd.DataFrame({"from_type": ev["event_type"], "to_type": nxt})
           .dropna().groupby(["from_type", "to_type"])
           .size().rename("n").reset_index())
    m = got.merge(ref, on=["from_type", "to_type"],
                  suffixes=("", "_ref"), how="outer")
    assert not m.isna().any().any()
    assert (m["n"] == m["n_ref"]).all()
    # row-normalized probabilities sum to 1 per from_type
    sums = got.groupby("from_type")["p"].sum()
    np.testing.assert_allclose(sums, 1.0, atol=5e-6)


def test_covisit_pairs_matches_selfjoin(ray_session):
    from light_curve_ray.pipelines.queries import q_covisit_pairs

    got = q_covisit_pairs(SF).to_pandas()
    d = (_events().dropna(subset=["user_id", "event_type"])
         [["user_id", "event_type"]].drop_duplicates())
    j = d.merge(d, on="user_id")
    j = j[j["event_type_x"] < j["event_type_y"]]
    ref = (j.groupby(["event_type_x", "event_type_y"])
           .size().rename("n_users").reset_index())
    m = got.merge(ref, left_on=["type_a", "type_b"],
                  right_on=["event_type_x", "event_type_y"],
                  suffixes=("", "_ref"), how="outer")
    assert not m["n_users"].isna().any()
    assert not m["n_users_ref"].isna().any()
    assert (m["n_users"] == m["n_users_ref"]).all()


def test_benford_digits_match_string_extract(ray_session):
    from light_curve_ray.pipelines.queries import q_benford_prices

    got = q_benford_prices(SF).to_pandas().sort_values("digit"
                                                       ).reset_index(drop=True)
    li = pd.read_parquet(f"{SF}/lineitem.parquet")["l_extendedprice"
                                                   ].dropna()
    first = li.map(lambda v: next((c for c in repr(float(v))
                                   if c in "123456789"), None)).dropna()
    ref = first.value_counts().sort_index()
    assert list(got["digit"]) == list(ref.index)
    assert list(got["n"]) == list(ref.values)
    assert int(got["n"].sum()) == len(first)
    np.testing.assert_allclose(got["freq"], ref.values / len(first),
                               atol=5e-7)


def test_anomaly_mad_matches_pandas_rolling(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_anomaly_mad

    got = q_anomaly_mad(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    daily = (ev.groupby(["event_type", "day"])["value"]
             .agg(["sum", "count"]).reset_index()
             .sort_values(["event_type", "day"]))
    for et, grp in daily.groupby("event_type"):
        m = round6_tie_robust(
            grp["sum"].to_numpy() / grp["count"].to_numpy())
        rolmed = (pd.Series(m).rolling(7, center=True, min_periods=1)
                  .median().to_numpy())
        mad = np.median(np.abs(m - np.median(m)))
        dev = np.abs(m - rolmed)
        row = got.loc[et]
        assert row["n_days"] == len(m)
        assert row["n_anomalies"] == int((dev > 3.0 * mad).sum())
        np.testing.assert_allclose(row["max_dev"], dev.max(), atol=5e-7)


def test_rfm_segments_ntile_marginals(ray_session):
    from light_curve_ray.pipelines.queries import q_rfm_segments

    got = q_rfm_segments(SF).to_pandas()
    orders = pd.read_parquet(f"{SF}/orders.parquet").dropna(
        subset=["o_custkey", "o_orderdate", "o_totalprice"])
    n_cust = orders["o_custkey"].nunique()
    assert int(got["n_customers"].sum()) == n_cust
    size, rem = divmod(n_cust, 4)
    expected = [size + (1 if i < rem else 0) for i in range(4)]
    # each dimension's marginal must be EXACTLY the SQL NTILE sizes
    for dim in ("r", "f", "m"):
        marg = got.groupby(dim)["n_customers"].sum().sort_index()
        assert list(marg) == expected, dim


def test_kanon_rollup_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_kanon_rollup

    got = q_kanon_rollup(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["event_type", "user_id"])
    g = ev.groupby(["event_type", "user_id"]).size().rename("n"
                                                            ).reset_index()
    for et, grp in g.groupby("event_type"):
        kept = grp["n"] >= 3
        row = got.loc[et]
        assert row["groups_kept"] == int(kept.sum())
        assert row["groups_suppressed"] == int((~kept).sum())
        assert row["rows_kept"] == int(grp["n"][kept].sum())
        assert row["rows_suppressed"] == int(grp["n"][~kept].sum())


def test_weighted_sample_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_weighted_sample
    from light_curve_ray.stages.sampling import hash_bucket_fine

    got = q_weighted_sample(SF).to_pandas()
    ev = _events().dropna(subset=["event_type", "event_id", "value"])
    ev = ev[ev["value"] > 0].copy()
    u = (hash_bucket_fine(ev["event_id"].to_numpy(), salt=5)
         .astype(np.float64) + 1.0) / 1_000_000.0
    ev["prio"] = u / ev["value"].to_numpy()
    ref = (ev.sort_values(["event_type", "prio", "event_id"])
           .groupby("event_type").head(20))
    for et, grp in ref.groupby("event_type"):
        sel = got[got["event_type"] == et].sort_values("rn")
        assert list(sel["event_id"]) == list(grp["event_id"])
        assert list(sel["rn"]) == list(range(1, len(grp) + 1))


def test_dow_profile_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_dow_profile

    got = q_dow_profile(SF).to_pandas().sort_values(
        ["event_type", "dow"]).reset_index(drop=True)
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    day = ev["ts"].astype("int64") // 86_400_000_000
    ev = ev.assign(dow=(day + 4) % 7)
    ref = (ev.groupby(["event_type", "dow"])["value"]
           .agg(["count", "sum"]).reset_index()
           .sort_values(["event_type", "dow"]).reset_index(drop=True))
    assert list(got["n"]) == list(ref["count"])
    np.testing.assert_allclose(got["mean_value"],
                               ref["sum"] / ref["count"], atol=5e-7)
    shares = got.groupby("event_type")["share"].sum()
    np.testing.assert_allclose(shares, 1.0, atol=5e-6)


def test_attribution_matches_pandas_ffill(ray_session):
    from light_curve_ray.pipelines.queries import q_attribution

    got = q_attribution(SF).to_pandas().set_index("channel")
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    ch = ev["event_type"].where(ev["event_type"] != "purchase")
    last = ch.groupby(ev["user_id"]).transform(
        lambda s: s.shift(1).ffill())
    ref = (last[ev["event_type"] == "purchase"].fillna("(none)")
           .value_counts())
    assert got["n_purchases"].sum() == ref.sum()
    for channel, n in ref.items():
        assert got.loc[channel, "n_purchases"] == n


def test_scd2_intervals_are_consistent(ray_session):
    from light_curve_ray.pipelines.queries import q_scd2_history

    got = q_scd2_history(SF).to_pandas().sort_values(
        ["user_id", "valid_from_us"]).reset_index(drop=True)
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    # interval chain: within a user, valid_to == next valid_from,
    # exactly one open interval, consecutive states always differ
    for uid, grp in got.groupby("user_id"):
        vt = grp["valid_to_us"].to_numpy()
        vf = grp["valid_from_us"].to_numpy()
        st = grp["state"].to_numpy()
        assert np.isnan(vt[-1]) or vt[-1] is None or pd.isna(vt[-1])
        assert (vt[:-1] == vf[1:]).all()
        assert (st[1:] != st[:-1]).all()
    # row count == number of state change points
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    prev = ev.groupby("user_id")["event_type"].shift(1)
    n_changes = int((prev.isna() | (prev != ev["event_type"])).sum())
    assert len(got) == n_changes


def test_changepoint_cusum_matches_bruteforce(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_changepoint_cusum

    got = q_changepoint_cusum(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    daily = (ev.groupby(["event_type", "day"])["value"]
             .agg(["sum", "count"]).reset_index()
             .sort_values(["event_type", "day"]))
    for et, grp in daily.groupby("event_type"):
        m = round6_tie_robust(
            grp["sum"].to_numpy() / grp["count"].to_numpy())
        mi = np.floor(m * 1_000_000.0 + 0.5).astype(np.int64)
        cum = np.cumsum(mi)
        n = len(mi)
        k = np.arange(1, n)
        stat_i = np.abs(n * cum[:-1] - k * cum[-1])
        best = int(np.argmax(stat_i))
        row = got.loc[et]
        assert row["change_day"] == grp["day"].to_numpy()[best]
        np.testing.assert_allclose(
            row["stat"], stat_i[best] / (n * 1e6), atol=5e-7)


def test_vocab_build_ids_are_frequency_ordered(ray_session):
    from light_curve_ray.pipelines.queries import q_vocab_build

    got = q_vocab_build(SF).to_pandas().sort_values("vocab_id"
                                                    ).reset_index(drop=True)
    assert (got["tf"] >= 10).all()
    assert list(got["vocab_id"]) == list(range(1, len(got) + 1))
    # ids follow (tf desc, term asc) exactly
    ref = got.sort_values(["tf", "term"],
                          ascending=[False, True]).reset_index(drop=True)
    assert list(ref["vocab_id"]) == list(range(1, len(got) + 1))
    # cross-check one frequency against a direct count
    docs = pd.read_parquet(f"{SF}/documents.parquet")["text"].dropna()
    import re
    toks = re.split(r"[^a-z0-9]+", " ".join(docs).lower())
    from collections import Counter
    c = Counter(t for t in toks if t)
    top = got.iloc[0]
    assert c[top["term"]] == top["tf"]


def test_embedding_dim_stats_matches_numpy(ray_session):
    from light_curve_ray.pipelines.queries import q_embedding_dim_stats

    got = q_embedding_dim_stats(SF).to_pandas().sort_values("dim"
                                                            ).reset_index(drop=True)
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")["embedding"]
    mat = np.stack(emb.to_numpy()).astype(np.float64)
    assert list(got["n"]) == [len(mat)] * mat.shape[1]
    np.testing.assert_allclose(got["mean"], mat.mean(axis=0), atol=5e-7)
    np.testing.assert_allclose(got["var"], mat.var(axis=0, ddof=1),
                               atol=5e-7)


def test_range_splits_are_exact_rank_boundaries(ray_session):
    from light_curve_ray.pipelines.queries import q_range_splits

    got = q_range_splits(SF).to_pandas().sort_values("split_idx")
    ev = _events().dropna(subset=["value", "event_id"])
    v = ev.sort_values(["value", "event_id"])["value"].to_numpy()
    n = len(v)
    ref = [v[(i * n) // 8 - 1] for i in range(1, 8)]
    np.testing.assert_array_equal(got["split_value"].to_numpy(), ref)
    assert (np.diff(got["split_value"]) >= 0).all()


def test_snapshot_ffill_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_snapshot_ffill

    got = q_snapshot_ffill(SF).to_pandas()
    ev = _events().dropna(subset=["event_type", "ts", "event_id",
                                  "value"])
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    closes = (ev.sort_values(["ts", "event_id"])
              .groupby(["event_type", "day"])["value"].last())
    for et, grp in got.groupby("event_type"):
        grp = grp.sort_values("day").reset_index(drop=True)
        c = closes.loc[et]
        spine = pd.RangeIndex(c.index.min(), c.index.max() + 1)
        ref = c.reindex(spine)
        filled = ref.isna().to_numpy()
        ref = ref.ffill().to_numpy()
        assert (grp["day"].to_numpy() == spine.to_numpy()).all()
        np.testing.assert_allclose(grp["close"], ref, atol=5e-7)
        assert (grp["filled"].to_numpy() == filled).all()


def test_bounce_rate_matches_pandas_sessions(ray_session):
    from light_curve_ray.pipelines.queries import q_bounce_rate

    got = q_bounce_rate(SF).to_pandas().set_index("entry_type")
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("int64")
    new_user = ev["user_id"].ne(ev["user_id"].shift())
    gap = t.diff() > 1_800_000_000
    brk = (new_user | gap).to_numpy()
    sid = np.cumsum(brk)
    sizes = pd.Series(sid).value_counts().sort_index().to_numpy()
    entries = ev["event_type"].to_numpy()[brk]
    ref = pd.DataFrame({"entry": entries, "bounce": sizes == 1})
    agg = ref.groupby("entry")["bounce"].agg(["count", "sum"])
    for et, row in agg.iterrows():
        assert got.loc[et, "n_sessions"] == row["count"]
        assert got.loc[et, "n_bounces"] == row["sum"]


def test_gap_quantiles_matches_numpy(ray_session):
    from light_curve_ray.pipelines.queries import q_gap_quantiles

    got = q_gap_quantiles(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "event_type", "ts", "event_id"])
    t = ev["ts"].astype("int64")
    same = (ev["user_id"].eq(ev["user_id"].shift())
            & ev["event_type"].eq(ev["event_type"].shift()))
    gaps = (t.diff()[same] / 1e6)
    key = ev["event_type"][same]
    for et, grp in gaps.groupby(key):
        row = got.loc[et]
        assert row["n_gaps"] == len(grp)
        q = np.percentile(grp.to_numpy(), [50, 90, 99])
        np.testing.assert_allclose(
            [row["p50_s"], row["p90_s"], row["p99_s"]], q, atol=5e-7)


def test_pareto_share_matches_bruteforce(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_pareto_share

    got = q_pareto_share(SF).to_pandas().iloc[0]
    orders = pd.read_parquet(f"{SF}/orders.parquet").dropna(
        subset=["o_custkey", "o_totalprice"])
    rev = orders.groupby("o_custkey")["o_totalprice"].sum()
    r = np.floor(round6_tie_robust(rev.to_numpy()) * 1e6
                 + 0.5).astype(np.int64)
    order = np.lexsort((rev.index.to_numpy(), -r))
    n = len(r)
    k = n // 10
    top = int(r[order[:k]].sum())
    assert got["n_customers"] == n
    assert got["top_k"] == k
    np.testing.assert_allclose(got["top_decile_share"],
                               top / r.sum(), atol=5e-7)
    assert got["top_decile_share"] > 0.1  # top decile is above-average


def test_ipc_roundtrip_preserves_docs(ray_session):
    from light_curve_ray.pipelines.queries import q_ipc_roundtrip

    got = q_ipc_roundtrip(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    ref = docs.groupby("lang").agg(
        n_docs=("doc_id", "size"), min_id=("doc_id", "min"),
        max_id=("doc_id", "max"), sum_chars=("n_chars", "sum"))
    for lang, row in ref.iterrows():
        assert got.loc[lang, "n_docs"] == row["n_docs"]
        assert got.loc[lang, "min_id"] == row["min_id"]
        assert got.loc[lang, "max_id"] == row["max_id"]
        assert got.loc[lang, "sum_chars"] == row["sum_chars"]


def test_chi2_independence_matches_scipy_free_formula(ray_session):
    from light_curve_ray.pipelines.queries import q_chi2_independence

    got = q_chi2_independence(SF).to_pandas().iloc[0]
    ev = _events().dropna(subset=["event_type", "ts"])
    dow = (ev["ts"].astype("int64") // 86_400_000_000 + 4) % 7
    ct = pd.crosstab(ev["event_type"], dow)
    exp = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / ct.to_numpy().sum()
    chi2 = float((((ct.to_numpy() - exp) ** 2) / exp).sum())
    assert got["n_cells"] == int((ct.to_numpy() > 0).size)
    assert got["dof"] == (ct.shape[0] - 1) * (ct.shape[1] - 1)
    np.testing.assert_allclose(got["chi2"], chi2, atol=5e-7)


def test_time_to_convert_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_time_to_convert

    got = q_time_to_convert(SF).to_pandas().iloc[0]
    ev = _events().dropna(subset=["user_id", "ts", "event_type"])
    t = ev["ts"].astype("int64")
    s = t.where(ev["event_type"] == "signup").groupby(
        ev["user_id"]).min()
    p = t.where(ev["event_type"] == "purchase").groupby(
        ev["user_id"]).min()
    d = ((p - s)[(p >= s)].dropna() / 86_400_000_000.0).to_numpy()
    assert got["n_converted"] == len(d)
    np.testing.assert_allclose(
        [got["p50_days"], got["p90_days"], got["max_days"]],
        [np.percentile(d, 50), np.percentile(d, 90), d.max()],
        atol=5e-7)


def test_rolling_corr_matches_pandas(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_rolling_corr

    got = q_rolling_corr(SF).to_pandas()
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    ev = ev[ev["event_type"].isin(["click", "purchase"])]
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    daily = ev.groupby(["event_type", "day"])["value"].mean().unstack(0)
    daily = daily.dropna()
    x = np.floor(round6_tie_robust(daily["click"].to_numpy())
                 * 1e6 + 0.5).astype(np.int64)
    y = np.floor(round6_tie_robust(daily["purchase"].to_numpy())
                 * 1e6 + 0.5).astype(np.int64)
    ref = (pd.Series(x).rolling(14).corr(pd.Series(y.astype(float)))
           .to_numpy()[13:])
    assert len(got) == len(ref)
    assert (got["day"].to_numpy() == daily.index.to_numpy()[13:]).all()
    np.testing.assert_allclose(got["corr14"], ref, atol=1e-6)
    assert got["corr14"].abs().max() <= 1.0 + 1e-9


def test_session_path_topk_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_session_path_topk

    got = q_session_path_topk(SF).to_pandas()
    ev = _events().dropna(subset=["user_id", "ts", "event_id",
                                  "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"])
    t = ev["ts"].astype("int64")
    brk = (ev["user_id"].ne(ev["user_id"].shift())
           | (t.diff() > 1_800_000_000)).to_numpy()
    sid = np.cumsum(brk)
    et = ev["event_type"].to_numpy()
    paths = pd.Series(et).groupby(sid).apply(
        lambda s: ">".join(s.iloc[:3]))
    ref = paths.value_counts()
    top = ref.reset_index()
    top.columns = ["path", "n"]
    top = top.sort_values(["n", "path"],
                          ascending=[False, True]).head(10)
    assert list(got["path"]) == list(top["path"])
    assert list(got["n_sessions"]) == list(top["n"])


def test_dedup_keep_best_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_dedup_keep_best

    got = q_dedup_keep_best(SF).to_pandas().set_index("lang")
    docs = pd.read_parquet(f"{SF}/documents.parquet").dropna(
        subset=["text"])
    docs = docs.sort_values(["n_chars", "doc_id"],
                            ascending=[False, True])
    kept_mask = ~docs.duplicated("text", keep="first")
    agg = docs.assign(kept=kept_mask).groupby("lang")["kept"].agg(
        ["sum", "count"])
    for lang, row in agg.iterrows():
        assert got.loc[lang, "n_kept"] == row["sum"]
        assert got.loc[lang, "n_dropped"] == row["count"] - row["sum"]


def test_wow_change_matches_pandas(ray_session):
    from light_curve_ray.pipelines.queries import q_wow_change

    got = q_wow_change(SF).to_pandas().sort_values(
        ["event_type", "week"]).reset_index(drop=True)
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    ev["week"] = ev["ts"].astype("int64") // 604_800_000_000
    w = (ev.groupby(["event_type", "week"])["value"]
         .agg(["count", "sum"]).reset_index()
         .sort_values(["event_type", "week"]))
    w["pn"] = w.groupby("event_type")["count"].shift()
    w = w.dropna(subset=["pn"])
    assert len(got) == len(w)
    np.testing.assert_allclose(
        got["n_wow"],
        (w["count"] - w["pn"]) / w["pn"], atol=5e-7)


def test_lines_per_order_hist_sums_to_orders(ray_session):
    from light_curve_ray.pipelines.queries import q_lines_per_order_hist

    got = q_lines_per_order_hist(SF).to_pandas()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")["l_orderkey"
                                                   ].dropna()
    sizes = li.value_counts()
    ref = sizes.value_counts().sort_index()
    got = got.sort_values("n_lines").reset_index(drop=True)
    assert list(got["n_lines"]) == list(ref.index)
    assert list(got["n_orders"]) == list(ref.values)
    assert int((got["n_lines"] * got["n_orders"]).sum()) == len(li)


def test_theilsen_trend_matches_bruteforce(ray_session):
    from light_curve_ray.kernels.rounding import round6_tie_robust
    from light_curve_ray.pipelines.queries import q_theilsen_trend

    got = q_theilsen_trend(SF).to_pandas().set_index("event_type")
    ev = _events().dropna(subset=["event_type", "ts", "value"])
    ev["day"] = ev["ts"].astype("int64") // 86_400_000_000
    daily = (ev.groupby(["event_type", "day"])["value"]
             .agg(["sum", "count"]).reset_index())
    for et, grp in daily.groupby("event_type"):
        grp = grp.sort_values("day")
        m = round6_tie_robust(
            grp["sum"].to_numpy() / grp["count"].to_numpy())
        d = grp["day"].to_numpy()
        ii, jj = np.triu_indices(len(m), 1)
        slopes = (m[jj] - m[ii]) / (d[jj] - d[ii])
        row = got.loc[et]
        assert row["n_pairs"] == len(slopes)
        np.testing.assert_allclose(row["theil_sen_slope"],
                                   np.median(slopes), atol=5e-7)


def test_integrity_audit_counts(ray_session):
    from light_curve_ray.pipelines.queries import q_integrity_audit

    got = q_integrity_audit(SF).to_pandas().set_index("relation")
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF}/orders.parquet")
    cust = pd.read_parquet(f"{SF}/customer.parquet")
    ok = set(orders["o_orderkey"].dropna())
    ck = set(cust["c_custkey"].dropna())
    lk = set(li["l_orderkey"].dropna())
    assert got.loc["lineitem_without_order", "n_orphans"] == int(
        (~li["l_orderkey"].dropna().isin(ok)).sum())
    assert got.loc["order_without_customer", "n_orphans"] == int(
        (~orders["o_custkey"].dropna().isin(ck)).sum())
    assert got.loc["order_without_lineitem", "n_orphans"] == int(
        (~orders["o_orderkey"].dropna().isin(lk)).sum())
