"""Dedup-stage tests: exact dedup vs a hand-built oracle; MinHash/SimHash
LSH pipelines must find planted near-duplicates; n-gram Jaccard verify must
score exact copies at 1.0 (SURVEY §5 oracle-test pattern applied to the
training-data operators)."""

import numpy as np
import pyarrow as pa
import pytest


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }))


@pytest.fixture(scope="module")
def dup_corpus():
    """60 base docs; ids 1000+ are exact copies of 0-19; ids 2000+ are
    near-copies (one word changed) of 0-9."""
    rng = np.random.RandomState(3)
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(60):
        n = 30 + int(rng.randint(0, 20))
        rows.append((i, " ".join(words[j] for j in rng.randint(0, 10, n))))
    for i in range(20):
        rows.append((1000 + i, rows[i][1]))  # exact copies
    for i in range(10):
        toks = rows[i][1].split()
        toks[5] = "CHANGED"
        rows.append((2000 + i, " ".join(toks)))  # near copies
    return rows


def test_exact_dedup(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import exact_dedup

    out = exact_dedup(_docs_ds(dup_corpus)).to_pandas()
    # 60 distinct texts + 10 near-copies (distinct) = 70 groups
    assert len(out) == 70
    dups = out[out["n_copies"] > 1].sort_values("doc_id")
    assert len(dups) == 20
    assert list(dups["doc_id"]) == list(range(20))  # min id kept
    assert (dups["n_copies"] == 2).all()


def test_minhash_finds_exact_and_near_copies(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(_docs_ds(dup_corpus),
                                threshold=0.5).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    # every exact copy pair must be found with est ~1.0
    for i in range(20):
        assert (i, 1000 + i) in found, i
    exact = pairs[pairs["doc_a"] < 20]
    exact = exact[exact["doc_b"] == exact["doc_a"] + 1000]
    assert (exact["est_jaccard"] == 1.0).all()
    # near-copies (1 of ~40 words changed -> J ~ 0.85) mostly found
    near_found = sum((i, 2000 + i) in found for i in range(10))
    assert near_found >= 8


def test_ngram_jaccard_verify(ray_session, dup_corpus):
    import ray

    from light_curve_ray.stages.dedup import (
        minhash_dedup_pairs,
        ngram_jaccard_verify,
    )

    lookup = ray.put({i: t for i, t in dup_corpus})
    cand = minhash_dedup_pairs(_docs_ds(dup_corpus), threshold=0.5)
    verified = ngram_jaccard_verify(cand, lookup).to_pandas()
    exact = verified[(verified["doc_a"] < 20)
                     & (verified["doc_b"] == verified["doc_a"] + 1000)]
    assert len(exact) == 20
    assert (exact["jaccard"] == 1.0).all()
    near = verified[(verified["doc_a"] < 10)
                    & (verified["doc_b"] == verified["doc_a"] + 2000)]
    assert (near["jaccard"] < 1.0).all()
    assert (near["jaccard"] > 0.5).all()


def test_simhash_pairs(ray_session, dup_corpus):
    from light_curve_ray.stages.dedup import simhash_dedup_pairs

    pairs = simhash_dedup_pairs(_docs_ds(dup_corpus),
                                max_hamming=3).to_pandas()
    found = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    for i in range(20):  # exact copies -> hamming 0 -> always found
        assert (i, 1000 + i) in found, i
    h0 = pairs[(pairs["doc_a"] < 20)
               & (pairs["doc_b"] == pairs["doc_a"] + 1000)]
    assert len(h0) == 20 and (h0["hamming"] == 0).all()


def test_minhash_stage_matches_kernel(ray_session, dup_corpus):
    """Distributed signatures byte-match the single-process kernel."""
    from light_curve_ray.kernels.hashing import (
        minhash_signature,
        shingle_hashes,
    )
    from light_curve_ray.stages.dedup import MinHashStage

    stage = MinHashStage(num_perm=64)
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in dup_corpus[:10]], pa.int64()),
        "text": pa.array([r[1] for r in dup_corpus[:10]], pa.string()),
    })
    out = stage(tbl)
    for i in range(10):
        expected = minhash_signature(
            shingle_hashes(dup_corpus[i][1].split(), k=3), num_perm=64)
        got = np.frombuffer(out["sig"][i].as_py(), dtype=np.uint64)
        np.testing.assert_array_equal(got, expected)


def test_pages_dedup_rows(ray_session, tmp_path):
    """O10: duplicate (url, warc_ts) pages dropped before rollup; the
    synthetic corpus plants ~1% duplicates."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from light_curve_ray.sources.pages import generate_pages_table
    from light_curve_ray.stages.dedup import dedup_rows_sorted

    tbl = generate_pages_table(n_rows=800, n_domains=10, seed=7,
                               dup_frac=0.05)
    f = str(tmp_path / "pages.parquet")
    pq.write_table(tbl, f)
    n_unique = len({(u, t) for u, t in
                    zip(tbl["url"].to_pylist(), tbl["warc_ts"].to_pylist())})
    assert n_unique < len(tbl)  # duplicates planted
    out = dedup_rows_sorted(rd.read_parquet(f), ["url", "warc_ts"])
    df = out.to_pandas()
    assert len(df) == n_unique
    assert not df.duplicated(["url", "warc_ts"]).any()

    # end-to-end: rollup over deduped pages counts each page once
    from light_curve_ray.pipelines.rollup import RollupConfig, run_rollup

    res = run_rollup(RollupConfig(input_paths=f, input_kind="pages",
                                  dedup_pages=True, tiers=("30d",),
                                  gapfill=False, gorilla=False,
                                  extract_concurrency=2))
    total_n = res["rollup"].to_pandas()["n"].sum()
    assert total_n == n_unique
