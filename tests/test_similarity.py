"""Similarity-search tests: brute-force top-k vs a numpy oracle; LSH recall
vs the brute-force baseline; embedding near-dup pair completeness."""

import numpy as np
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def emb_corpus():
    rng = np.random.RandomState(11)
    n, d = 300, 32
    mat = rng.standard_normal((n, d)).astype(np.float32)
    # plant near-duplicates: 290-299 are tiny perturbations of 0-9
    for i in range(10):
        mat[290 + i] = mat[i] + 0.01 * rng.standard_normal(d).astype(np.float32)
    ids = np.arange(n, dtype=np.int64)
    return ids, mat


def _emb_ds(ids, mat):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
    }))


def _brute_topk(ids, mat, qidx, k):
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m[qidx] @ m.T
    out = {}
    for r, q in enumerate(qidx):
        s = sims[r].copy()
        s[q] = -np.inf
        order = np.lexsort((ids, -np.round(s, 6)))[:k]
        out[ids[q]] = list(ids[order])
    return out


def test_ann_topk_matches_numpy_oracle(ray_session, emb_corpus):
    from light_curve_ray.stages.similarity import ann_topk, load_corpus

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    cids, cmat = load_corpus(ds)
    got = ann_topk(ds, cids[:5], cmat[:5], k=4).to_pandas()
    exp = _brute_topk(ids, mat, list(range(5)), k=4)
    for q in range(5):
        rows = got[got["query_id"] == q]
        assert len(rows) == 4
        assert set(rows["vec_id"]) == set(exp[q]), q


def test_ann_topk_finds_planted_neighbor(ray_session, emb_corpus):
    from light_curve_ray.stages.similarity import ann_topk, load_corpus

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    cids, cmat = load_corpus(ds)
    got = ann_topk(ds, cids[:10], cmat[:10], k=1).to_pandas()
    for i in range(10):  # nearest neighbor of i is its perturbed copy
        top = got[got["query_id"] == i]["vec_id"].iloc[0]
        assert top == 290 + i, i


def test_ann_lsh_recall(ray_session, emb_corpus):
    """LSH top-k recall vs brute force ≥ 0.5 at nbits=4 + Hamming-1 probes
    (~31% of corpus scanned).  Random Gaussian corpora have near-orthogonal
    neighbors — the worst case for hyperplane LSH — so this pins the
    approximation trade, not an exactness claim; planted near-dups (cos
    ~0.9999) must ALWAYS be found, at any nbits."""
    from light_curve_ray.stages.similarity import (
        ann_topk,
        ann_topk_lsh,
        load_corpus,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    cids, cmat = load_corpus(ds)
    nq = 20
    exact = ann_topk(ds, cids[:nq], cmat[:nq], k=5).to_pandas()
    approx = ann_topk_lsh(ds, cids[:nq], cmat[:nq], k=5, nbits=4).to_pandas()
    hits = total = 0
    for q in range(nq):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5, hits / total
    # a 0.01-perturbed copy has cos ~ 0.9999 -> same bucket, always found
    for i in range(10):
        a = approx[approx["query_id"] == i]["vec_id"]
        assert len(a) > 0 and a.iloc[0] == 290 + i


def test_embedding_pairs_complete(ray_session, emb_corpus):
    """Every pair with cos >= tau appears exactly once with a < b."""
    from light_curve_ray.stages.similarity import embedding_pairs

    ids, mat = emb_corpus
    got = embedding_pairs(_emb_ds(ids, mat), tau=0.9).to_pandas()
    m = mat.astype(np.float64)
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = m @ m.T
    iu = np.triu_indices(len(ids), 1)
    expected = {(int(ids[i]), int(ids[j]))
                for i, j in zip(*iu) if sims[i, j] >= 0.9}
    assert {(a, b) for a, b in zip(got["vec_a"], got["vec_b"])} == expected
    assert len(got) == len(expected)  # once each
    assert (got["vec_a"] < got["vec_b"]).all()


def test_embedding_pairs_lsh_recall(ray_session, emb_corpus):
    """T6 scale path: LSH-banded pairs are a SUBSET of the exact pairs
    (no false positives — cosine is scored exactly within buckets) and
    recall the planted near-duplicates (cos ~ 0.9999 -> same bucket in
    every band with overwhelming probability)."""
    from light_curve_ray.stages.similarity import (
        _embedding_pairs_broadcast,
        embedding_pairs_lsh,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    exact = _embedding_pairs_broadcast(ds, tau=0.9).to_pandas()
    lsh = embedding_pairs_lsh(ds, tau=0.9, nbits=8, bands=8).to_pandas()
    ex = set(zip(exact["vec_a"], exact["vec_b"]))
    ls = set(zip(lsh["vec_a"], lsh["vec_b"]))
    assert ls <= ex  # exact-cos scoring in buckets: no false positives
    planted = {(i, 290 + i) for i in range(10)} & ex
    assert planted <= ls  # near-identical vectors collide in some band
    assert len(ls) / max(1, len(ex)) >= 0.8
    assert (lsh["vec_a"] < lsh["vec_b"]).all()
    assert not lsh.duplicated(["vec_a", "vec_b"]).any()  # multi-band dedup


def test_embedding_pairs_dispatch(ray_session, emb_corpus):
    """The explicit path switch: small corpus -> exact path; tiny
    broadcast_limit forces the LSH path."""
    from light_curve_ray.stages.similarity import (
        _embedding_pairs_broadcast,
        embedding_pairs,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    exact = _embedding_pairs_broadcast(ds, tau=0.9).to_pandas()
    small = embedding_pairs(ds, tau=0.9).to_pandas()
    assert set(zip(small["vec_a"], small["vec_b"])) == set(
        zip(exact["vec_a"], exact["vec_b"]))
    forced = embedding_pairs(ds, tau=0.9, broadcast_limit=10,
                             nbits=8, bands=8).to_pandas()
    assert set(zip(forced["vec_a"], forced["vec_b"])) <= set(
        zip(exact["vec_a"], exact["vec_b"]))


def test_ann_topk_ivf_recall(ray_session, emb_corpus):
    """IVF top-k: recall vs the exact baseline, and planted near-identical
    vectors (same cell with overwhelming probability) always found."""
    from light_curve_ray.stages.similarity import (
        ann_topk,
        ann_topk_ivf,
        load_corpus,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    cids, cmat = load_corpus(ds)
    nq = 20
    exact = ann_topk(ds, cids[:nq], cmat[:nq], k=5).to_pandas()
    approx = ann_topk_ivf(ds, cids[:nq], cmat[:nq], k=5, n_centroids=8,
                          nprobe=3).to_pandas()
    hits = total = 0
    for q in range(nq):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.5, hits / total
    for i in range(10):
        a = approx[approx["query_id"] == i]["vec_id"]
        assert len(a) > 0 and a.iloc[0] == 290 + i


def test_ivf_spread_sampling_clustered(ray_session):
    """Quantizer training must not head-sample: a corpus written in cluster
    order (domain-sharded embeddings) makes a contiguous head sample see
    only the leading clusters — demonstrated here — while the spread-block
    sample covers all of them (VERDICT r2 'What's wrong' #5)."""
    from light_curve_ray.stages.similarity import (
        _kmeans_cosine,
        _normalize,
        train_ivf_centroids,
    )

    rng = np.random.RandomState(7)
    d, per = 16, 2000
    cluster_dirs = np.zeros((4, d))
    blocks = []
    for c in range(4):
        cluster_dirs[c, c * 4] = 1.0
        pts = cluster_dirs[c] + 0.05 * rng.standard_normal((per, d))
        blocks.append(pts.astype(np.float32))
    mat = np.vstack(blocks)  # clustered storage order
    ids = np.arange(len(mat), dtype=np.int64)

    def coverage(cent):
        return (cluster_dirs @ cent.T).max(axis=1)

    # a contiguous head sample (old behavior) provably misses the trailing
    # clusters: the first two clusters fill the whole window
    head_cent = _kmeans_cosine(
        _normalize(mat[: 2 * per].astype(np.float64)), 8)
    assert coverage(head_cent)[2:].max() < 0.5
    # the spread-block sample covers every cluster
    ds = _emb_ds(ids, mat).repartition(32).materialize()
    cent = train_ivf_centroids(ds, n_centroids=8, sample_size=512)
    assert (coverage(cent) > 0.8).all(), coverage(cent)


def test_attach_cosine_join_matches_broadcast(ray_session, emb_corpus):
    """T6 scoring path switch: the two-join exact-cosine scoring must
    produce the same scored pairs as the broadcast gather path."""
    from light_curve_ray.stages.similarity import embedding_pairs_lsh

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat)
    bcast = embedding_pairs_lsh(ds, tau=0.9).to_pandas()
    joined = embedding_pairs_lsh(ds, tau=0.9,
                                 broadcast_limit=0).to_pandas()
    a = sorted(map(tuple, bcast[["vec_a", "vec_b"]].to_numpy()))
    b = sorted(map(tuple, joined[["vec_a", "vec_b"]].to_numpy()))
    assert a == b
    sa = bcast.sort_values(["vec_a", "vec_b"])["cos_sim"].to_numpy()
    sb = joined.sort_values(["vec_a", "vec_b"])["cos_sim"].to_numpy()
    import numpy as np

    np.testing.assert_array_equal(sa, sb)  # identical row-dot both paths


def test_ann_pq_planted_and_recall(ray_session, emb_corpus):
    """PQ-ADC top-k: planted near-copies (cos ~0.9999) must always
    surface as the nearest code, and recall@5 vs brute force stays
    above the random-Gaussian worst-case floor at m=8, ksub=32."""
    from light_curve_ray.stages.similarity import (
        ann_topk,
        ann_topk_pq,
        load_corpus,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat).materialize()
    cids, cmat = load_corpus(ds)
    nq = 20
    exact = ann_topk(ds, cids[:nq], cmat[:nq], k=5).to_pandas()
    approx = ann_topk_pq(ds, cids[:nq], cmat[:nq], k=5, m=8,
                         ksub=32).to_pandas()
    hits = total = 0
    for q in range(nq):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.4, hits / total
    # a 0.01-perturbed copy quantizes to (nearly) the same codes ->
    # smallest ADC distance
    for i in range(10):
        a = approx[approx["query_id"] == i]["vec_id"]
        assert len(a) > 0 and a.iloc[0] == 290 + i


def test_ann_pq_partition_invariance(ray_session, emb_corpus):
    """Same codebooks => identical results at any block layout."""
    from light_curve_ray.stages.similarity import (
        ann_topk_pq,
        load_corpus,
        train_pq_codebooks,
    )

    ids, mat = emb_corpus
    ds1 = _emb_ds(ids, mat).materialize()
    cids, cmat = load_corpus(ds1)
    cbs = train_pq_codebooks(ds1, m=8, ksub=32)
    a = ann_topk_pq(ds1, cids[:8], cmat[:8], k=5,
                    codebooks=cbs).to_pandas()
    ds2 = _emb_ds(ids, mat).repartition(7).materialize()
    b = ann_topk_pq(ds2, cids[:8], cmat[:8], k=5,
                    codebooks=cbs).to_pandas()
    key = ["query_id", "vec_id"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a[key].equals(b[key])
    assert np.allclose(a["approx_dist2"], b["approx_dist2"], atol=1e-12)


def test_pq_clustered_data_exact():
    """On perfectly clustered data the sub-quantizers reproduce the
    cluster structure and ADC distance 0 identifies exact copies."""
    from light_curve_ray.stages.similarity import _kmeans_l2

    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 8))
    sample = np.repeat(centers, 50, axis=0)
    cent = _kmeans_l2(sample, 4, iters=5, seed=1)
    d2 = ((centers[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    assert np.allclose(d2.min(axis=1), 0.0, atol=1e-18)


def test_ann_ivfpq_planted_and_recall(ray_session, emb_corpus):
    """IVF-PQ: at nprobe=all, planted near-copies (cos ~0.9999 so the
    residual codes coincide) rank first; at nprobe=4/16 recall vs
    brute force stays above a conservative floor despite the double
    approximation (cell routing + residual codes)."""
    from light_curve_ray.stages.similarity import (
        ann_topk,
        ann_topk_ivfpq,
        load_corpus,
    )

    ids, mat = emb_corpus
    ds = _emb_ds(ids, mat).materialize()
    cids, cmat = load_corpus(ds)
    nq = 20
    exact = ann_topk(ds, cids[:nq], cmat[:nq], k=5).to_pandas()
    full = ann_topk_ivfpq(ds, cids[:nq], cmat[:nq], k=5,
                          n_centroids=8, nprobe=8, m=8,
                          ksub=32).to_pandas()
    for i in range(10):
        a = full[full["query_id"] == i]["vec_id"]
        assert len(a) > 0 and a.iloc[0] == 290 + i
    approx = ann_topk_ivfpq(ds, cids[:nq], cmat[:nq], k=5,
                            n_centroids=8, nprobe=4, m=8,
                            ksub=32).to_pandas()
    hits = total = 0
    for q in range(nq):
        e = set(exact[exact["query_id"] == q]["vec_id"])
        a = set(approx[approx["query_id"] == q]["vec_id"])
        hits += len(e & a)
        total += len(e)
    assert hits / total >= 0.3, hits / total
    # probing fewer cells can only reduce the candidate pool
    assert len(approx) <= len(full) + 1e-9
