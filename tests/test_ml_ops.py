"""Pins for the distributed-ML-training query family (ols_fit has a SQL
oracle; logreg_gd is rows-only — sigmoid is transcendental — so it pins
here against a single-process numpy reference on the same parquet)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _logreg_reference(rounds=3, lr=1.0):
    tbl = pq.read_table(f"{SF}/lineitem.parquet",
                        columns=["l_quantity", "l_discount",
                                 "l_returnflag"]).to_pandas().dropna()
    q = tbl["l_quantity"].to_numpy(np.float64)
    d = tbl["l_discount"].to_numpy(np.float64)
    y = (tbl["l_returnflag"].to_numpy(object) == "R").astype(np.float64)
    x = np.column_stack([np.ones(len(q)), q / 50.0, d * 10.0])
    w = np.zeros(3)
    for _ in range(rounds):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w = w - lr * ((p - y) @ x) / len(y)
    acc = float(((x @ w >= 0.0) == (y > 0.5)).mean())
    return w, acc, len(y)


def test_logreg_gd_matches_numpy_reference(ray_session):
    from light_curve_ray.pipelines.queries import q_logreg_gd

    out = q_logreg_gd(SF).to_pandas()
    w_ref, acc_ref, n_ref = _logreg_reference()
    assert int(out["n"].iloc[0]) == n_ref
    got = np.array([out["w_bias"].iloc[0], out["w_qty"].iloc[0],
                    out["w_disc"].iloc[0]])
    # block-partial vs sequential sums differ in last ulps; outputs are
    # 6-dp rounded, so agreement is exact-after-round up to one tie
    assert np.allclose(got, np.round(w_ref, 6), atol=2e-6), (got, w_ref)
    assert abs(float(out["train_acc"].iloc[0]) - acc_ref) < 1e-3


def test_logreg_gd_weights_move_toward_separation(ray_session):
    # 3 GD steps from w=0 must produce a nonzero weight vector and a
    # train accuracy no worse than the majority class
    from light_curve_ray.pipelines.queries import q_logreg_gd

    out = q_logreg_gd(SF).to_pandas()
    w = np.array([out["w_bias"].iloc[0], out["w_qty"].iloc[0],
                  out["w_disc"].iloc[0]])
    assert np.abs(w).max() > 0.0
    tbl = pq.read_table(f"{SF}/lineitem.parquet",
                        columns=["l_returnflag"]).to_pandas().dropna()
    share_r = float((tbl["l_returnflag"] == "R").mean())
    majority = max(share_r, 1.0 - share_r)
    assert float(out["train_acc"].iloc[0]) >= majority - 1e-9


def _bpe_reference(texts, n_merges):
    """Independent BPE: re-tokenizes and re-counts from scratch with
    plain Python (collections.Counter over regex tokens), merges with
    string replace over space-joined symbol strings."""
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                words[w] += 1
    vocab = Counter({" ".join(w): c for w, c in words.items()})
    merges = []
    for rank in range(1, n_merges + 1):
        pairs = Counter()
        for sym, c in vocab.items():
            toks = sym.split(" ")
            for a, b in zip(toks, toks[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), cnt = best
        merges.append((rank, left, right, cnt))
        pat = re.compile(
            r"(?<!\S)" + re.escape(left + " " + right) + r"(?!\S)")
        vocab = Counter({pat.sub(left + right, sym): c
                         for sym, c in vocab.items()})
    return merges


def test_bpe_merges_matches_independent_reference(ray_session):
    from light_curve_ray.pipelines.queries import q_bpe_merges

    out = q_bpe_merges(SF, n_merges=6).to_pandas()
    texts = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["text"]).to_pandas()["text"].dropna().tolist()
    ref = _bpe_reference(texts, 6)
    assert len(out) == len(ref)
    for i, (rank, left, right, cnt) in enumerate(ref):
        row = out.iloc[i]
        assert (int(row["rank"]), row["left"], row["right"],
                int(row["pair_count"])) == (rank, left, right, cnt)


def test_bpe_kernel_known_corpus():
    from light_curve_ray.kernels.bpe import bpe_train

    # "low" x5, "lower" x2: first merge is ('l','o') count 7,
    # then ('lo','w') count 7
    merges = bpe_train(["low", "lower"], [5, 2], 2)
    assert merges[0] == (1, "l", "o", 7)
    assert merges[1] == (2, "lo", "w", 7)


def test_ols_fit_matches_lstsq(ray_session):
    from light_curve_ray.pipelines.queries import q_ols_fit

    out = q_ols_fit(SF).to_pandas()
    tbl = pq.read_table(f"{SF}/lineitem.parquet",
                        columns=["l_quantity", "l_discount",
                                 "l_extendedprice"]).to_pandas().dropna()
    x = np.column_stack([np.ones(len(tbl)),
                         tbl["l_quantity"].to_numpy(np.float64),
                         tbl["l_discount"].to_numpy(np.float64)])
    y = tbl["l_extendedprice"].to_numpy(np.float64)
    coef, *_ = np.linalg.lstsq(x, y, rcond=None)
    assert int(out["n"].iloc[0]) == len(y)
    # lstsq centers differently (and the query pre-rounds means), so
    # compare loosely in coefficient space and tightly on fit quality
    assert np.allclose(
        [out["intercept"].iloc[0], out["slope_qty"].iloc[0],
         out["slope_disc"].iloc[0]], coef, rtol=1e-4, atol=1e-3)
    resid = y - x @ coef
    r2_ref = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert abs(float(out["r2"].iloc[0]) - r2_ref) < 1e-6
