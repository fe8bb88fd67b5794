"""IR-operator pins vs independent single-process references at
sf0.001: BM25 scoring, reciprocal-rank fusion, the Zipf-slope fit and
the Heaps vocabulary-growth curve must equal a from-scratch
pandas/numpy derivation (tokenizer: lowercase, split [^a-z0-9]+, drop
empties — the corpus-wide contract).  The SQL oracles are checked
separately by tools/check_queries.py; these pins are engine-internal
and survive oracle edits."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"
_TOK = re.compile(r"[^a-z0-9]+")


def _docs() -> pd.DataFrame:
    return pd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "lang", "text"])


def _tokens(text: str) -> list:
    return [t for t in _TOK.split(text.lower()) if t]


def test_bm25_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import (_BM25_QUERY_TERMS,
                                                   q_bm25_scores)

    got = q_bm25_scores(SF).to_pandas().set_index("doc_id")
    docs = _docs()
    toks = {r.doc_id: _tokens(r.text) for r in docs.itertuples()}
    n_docs = len(docs)
    tot = sum(len(v) for v in toks.values())
    df = {q: sum(1 for v in toks.values() if q in v)
          for q in _BM25_QUERY_TERMS}
    k1, b = 1.2, 0.75
    for doc_id, tl in toks.items():
        score, hits = 0.0, 0
        for q in _BM25_QUERY_TERMS:
            tf = tl.count(q)
            if tf == 0:
                continue
            hits += 1
            idf = np.log((n_docs - df[q] + 0.5) / (df[q] + 0.5) + 1.0)
            norm = 1.0 - b + b * (len(tl) * n_docs) / tot
            score += idf * (tf * (k1 + 1)) / (tf + k1 * norm)
        if hits == 0:
            assert doc_id not in got.index
            continue
        row = got.loc[doc_id]
        assert int(row["n_hit"]) == hits
        assert abs(float(row["bm25"]) - score) < 1e-5


def test_rrf_fusion_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_rrf_fusion

    got = q_rrf_fusion(SF).to_pandas()
    docs = _docs()
    st = pd.DataFrame({
        "doc_id": docs["doc_id"],
        "n_tok": [len(_tokens(t)) for t in docs["text"]],
        "n_terms": [len(set(_tokens(t))) for t in docs["text"]],
    })
    # deterministic ranks: order by (-key, doc_id)
    for key, col in (("n_tok", "ra"), ("n_terms", "rb")):
        order = np.lexsort((st["doc_id"].values, -st[key].values))
        rank = np.empty(len(st), dtype=np.int64)
        rank[order] = np.arange(1, len(st) + 1)
        st[col] = rank
    st["rrf"] = (1.0 / (60 + st["ra"]) + 1.0 / (60 + st["rb"])).round(6)
    top = st.sort_values(["rrf", "doc_id"],
                         ascending=[False, True]).head(20)
    assert got["doc_id"].tolist() == top["doc_id"].tolist()
    assert got["rank_len"].tolist() == top["ra"].tolist()
    assert got["rank_vocab"].tolist() == top["rb"].tolist()
    np.testing.assert_allclose(got["rrf"].values, top["rrf"].values,
                               atol=1e-6)


def test_zipf_slope_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_zipf_slope

    got = q_zipf_slope(SF).to_pandas().set_index("lang")
    docs = _docs()
    for lang, grp in docs.groupby("lang"):
        counts = {}
        for t in grp["text"]:
            for tok in _tokens(t):
                counts[tok] = counts.get(tok, 0) + 1
        items = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
        k = len(items)
        x = np.log(np.arange(1, k + 1, dtype=np.float64))
        y = np.log(np.array([n for _, n in items], dtype=np.float64))
        slope = ((k * (x * y).sum() - x.sum() * y.sum())
                 / (k * (x * x).sum() - x.sum() ** 2))
        row = got.loc[lang]
        assert int(row["n_terms"]) == k
        assert abs(float(row["zipf_slope"]) - slope) < 1e-5


def test_heaps_law_matches_bruteforce(ray_session):
    from light_curve_ray.pipelines.queries import q_heaps_law

    got = q_heaps_law(SF).to_pandas()
    docs = _docs().sort_values("doc_id")
    m = int(docs["doc_id"].max()) + 1
    docs_n = np.zeros(10, dtype=np.int64)
    toks_n = np.zeros(10, dtype=np.int64)
    voc_n = np.zeros(10, dtype=np.int64)
    seen = {}
    for r in docs.itertuples():
        tl = _tokens(r.text)
        dec = (r.doc_id * 10) // m
        if tl:
            docs_n[dec] += 1
            toks_n[dec] += len(tl)
        for t in tl:
            if t not in seen:
                seen[t] = dec
    for d in seen.values():
        voc_n[d] += 1
    assert got["docs_cum"].tolist() == np.cumsum(docs_n).tolist()
    assert got["tokens_cum"].tolist() == np.cumsum(toks_n).tolist()
    assert got["vocab_cum"].tolist() == np.cumsum(voc_n).tolist()
