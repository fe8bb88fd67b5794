"""Wordcount + top terms (stages/wordcount) vs in-process oracles."""

from __future__ import annotations

import re
from collections import Counter

import pyarrow as pa


def _brute_counts(rows):
    c = Counter()
    for lang, text in rows:
        if text is None:
            continue
        for t in re.split("[^a-z0-9]+", text.lower()):
            if t:
                c[(lang, t)] += 1
    return c


def test_term_counts_vs_brute(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.wordcount import term_counts

    rows = [("en", "The cat and the hat!"),
            ("en", "Cat, CAT... 42 cats"),
            ("fr", "le chat; le chat, le"),
            ("fr", None),
            ("de", "")]
    tbl = pa.table({"lang": [r[0] for r in rows],
                    "text": [r[1] for r in rows]})
    out = term_counts(rd.from_arrow(tbl).repartition(3),
                      ["lang"], "text").to_pandas()
    got = {(r.lang, r.term): r.n for r in out.itertuples()}
    assert got == dict(_brute_counts(rows))


def test_top_terms_rank_deterministic_on_ties(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.wordcount import top_terms

    # every term appears exactly twice -> full tie, order must be
    # alphabetical (the ROW_NUMBER tie-break contract)
    tbl = pa.table({"lang": ["en", "en"],
                    "text": ["zeta alpha mid", "mid zeta alpha"]})
    out = top_terms(rd.from_arrow(tbl), ["lang"], "text",
                    k=2).to_pandas().sort_values("rn")
    assert list(out["term"]) == ["alpha", "mid"]
    assert list(out["rn"]) == [1, 2]
    assert list(out["n"]) == [2, 2]


def test_combiner_partials_smaller_than_tokens(ray_session):
    """The block combiner must emit distinct (lang, term) rows, not raw
    tokens — the scale property the exchange depends on."""
    from light_curve_ray.stages.wordcount import _tokenize_count_block

    text = " ".join(["word%d" % (i % 20) for i in range(1000)])
    t = pa.table({"lang": ["en"], "text": [text]})
    out = _tokenize_count_block(t, ["lang"], "text")
    assert len(out) == 20  # 1000 tokens -> 20 partial rows
    assert out["n"].to_pylist() == [50] * 20


def test_tfidf_vs_brute(ray_session):
    import math

    import ray.data as rd

    from light_curve_ray.stages.wordcount import tfidf_top_terms

    rows = [(1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "apple cherry cherry dates")]
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows]})
    out = tfidf_top_terms(rd.from_arrow(tbl).repartition(2),
                          k=2).to_pandas()

    tf = _brute_counts([(r[0], r[1]) for r in rows])
    df = Counter(t for (_, t) in tf)
    n_docs = len(rows)
    brute = {}
    for (d, t), n in tf.items():
        brute[(d, t)] = n * math.log((n_docs + 1.0) / (df[t] + 1.0))
    for d in (1, 2, 3):
        mine = sorted(((v, k[1]) for k, v in brute.items() if k[0] == d),
                      key=lambda x: (-x[0], x[1]))[:2]
        got = out[out["doc_id"] == d].sort_values("rn")
        assert list(got["term"]) == [t for _, t in mine]
        for (v, _), g in zip(mine, got["tfidf"]):
            assert abs(v - g) < 1e-5


def test_unigram_logprob_vs_brute(ray_session):
    import math

    import ray.data as rd

    from light_curve_ray.stages.wordcount import unigram_logprob_scores

    rows = [(1, "aa bb aa"), (2, "bb cc"), (3, "!!"), (4, "aa")]
    tbl = pa.table({"doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": [r[1] for r in rows]})
    out = unigram_logprob_scores(
        rd.from_arrow(tbl).repartition(2)).to_pandas()
    # corpus: aa x3, bb x2, cc x1 -> T=6
    lp = {"aa": math.log(3 / 6), "bb": math.log(2 / 6),
          "cc": math.log(1 / 6)}
    expect = {1: (3, (2 * lp["aa"] + lp["bb"]) / 3),
              2: (2, (lp["bb"] + lp["cc"]) / 2),
              4: (1, lp["aa"])}
    got = {int(r.doc_id): (int(r.n_tokens), float(r.avg_logp))
           for r in out.itertuples()}
    assert set(got) == set(expect)  # doc 3 (no tokens) absent
    for d, (n, v) in expect.items():
        assert got[d][0] == n
        assert abs(got[d][1] - v) < 1e-5


def test_kneser_ney_vs_brute(ray_session):
    import re
    from collections import Counter

    import ray.data as rd

    from light_curve_ray.stages.wordcount import kneser_ney_bigrams

    docs = ["the cat sat on the mat",
            "the cat ate the fish",
            "a cat and the cat sat",
            "the dog sat on a log the cat sat"]
    tbl = pa.table({"doc_id": list(range(len(docs))), "text": docs})
    out = kneser_ney_bigrams(
        rd.from_arrow(tbl).repartition(3), "text", k=5,
        min_count=2).to_pandas().sort_values("rn")

    # brute-force KN over the same tokenizer
    bc = Counter()
    for d in docs:
        toks = [t for t in re.split("[^a-z0-9]+", d.lower()) if t]
        for a, b in zip(toks, toks[1:]):
            bc[(a, b)] += 1
    cw = Counter()
    n1f = Counter()
    n1b = Counter()
    for (a, b), n in bc.items():
        cw[a] += n
        n1f[a] += 1
        n1b[b] += 1
    T = float(len(bc))
    scored = []
    for (a, b), n in bc.items():
        if n < 2:
            continue
        p = (n - 0.75) / cw[a] + 0.75 * n1f[a] / cw[a] * (n1b[b] / T)
        scored.append((round(p, 6), f"{a} {b}", n))
    scored.sort(key=lambda r: (-r[0], r[1]))
    want = scored[:5]
    got = list(zip(out["p_kn"], out["bigram"], out["n_ab"]))
    assert [(w[1], w[2]) for w in want] == [(g[1], g[2]) for g in got]
    for w, g in zip(want, got):
        assert abs(w[0] - g[0]) < 1e-9


def test_kneser_ney_probabilities_sum_below_one(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.wordcount import kneser_ney_bigrams

    docs = ["x y x z x y x w", "x y x z"]
    tbl = pa.table({"doc_id": [0, 1], "text": docs})
    out = kneser_ney_bigrams(rd.from_arrow(tbl), "text", k=50,
                             min_count=1).to_pandas()
    # all probabilities are valid and the discount keeps them below 1
    assert (out["p_kn"] > 0).all() and (out["p_kn"] < 1).all()
