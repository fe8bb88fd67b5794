"""Similarity search over an embedding column (list<float>).

Two paths, per the standard ANN playbook:

- **Brute-force cosine top-k** (the exactness baseline): the query matrix is
  the SMALL side — normalized once, ``ray.put`` once, read zero-copy inside
  every ``map_batches`` task (never re-shipped per batch).  Each block does
  one numpy matmul (Q · Bᵀ) and keeps only its block-local top-k per query,
  so the follow-up groupby shuffles ≤ k·n_blocks candidate rows, not n·q
  scores.  Final per-query merge sorts by (rounded cos desc, vec_id) — the
  deterministic tie-break that makes output stable across block orders.
- **LSH-bucketed variant** (the scale path): random-hyperplane signatures
  (Charikar 2002) bucket the corpus; a query probes its own bucket plus all
  Hamming-1 neighbors, so each query scans ~(1+nbits)/2^nbits of the corpus
  instead of all of it.  Recall vs the brute-force baseline is pinned by
  tests (tests/test_similarity.py), not guaranteed — the classic ANN trade.

Near-duplicate detection by embedding cosine (``embedding_pairs``) reuses
the brute-force machinery: block rows vs the broadcast corpus, emitting each
unordered pair exactly once via the id_a < id_b predicate evaluated on the
block side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.rounding import round6_tie_robust


def _normalize(mat: np.ndarray) -> np.ndarray:
    mat = np.asarray(mat, dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    # list<float32> -> (n, d) float64, via flat values (zero Python loop)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def load_corpus(ds, id_col: str = "vec_id", emb_col: str = "embedding"):
    """Materialize (ids, normalized matrix) of a SMALL dataset for broadcast.

    Only valid for the broadcast side (queries / sub-million corpora); the
    big side always streams through map_batches.
    """
    ids_chunks, mats = [], []
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=8192):
        ids_chunks.append(batch[id_col].to_numpy(zero_copy_only=False))
        mats.append(_emb_matrix(batch, emb_col))
    ids = np.concatenate(ids_chunks)
    mat = _normalize(np.vstack(mats))
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def ann_topk(ds, query_ids: np.ndarray, query_mat: np.ndarray, k: int = 5,
             id_col: str = "vec_id", emb_col: str = "embedding",
             exclude_self: bool = True):
    """Exact cosine top-k per query: Dataset of (query_id, vec_id, cos_sim).

    ``query_mat`` must be L2-normalized (load_corpus does this).
    """
    import ray

    qref = ray.put((np.asarray(query_ids), np.asarray(query_mat)))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        sims = qmat @ bmat.T  # (q, nblock)
        if exclude_self:
            sims[qids[:, None] == vids[None, :]] = -np.inf
        kk = min(k, sims.shape[1])
        idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(qids, kk)
        rows_v = vids[idx.ravel()]
        rows_s = np.take_along_axis(sims, idx, axis=1).ravel()
        keep = np.isfinite(rows_s)
        return pa.table({
            "query_id": pa.array(rows_q[keep], pa.int64()),
            "vec_id": pa.array(rows_v[keep], pa.int64()),
            "cos_sim": pa.array(rows_s[keep], pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        q = group["query_id"].to_numpy(zero_copy_only=False)
        # deterministic: rounded cos desc, then vec_id asc
        order = np.lexsort((v, -round6_tie_robust(s)))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_sim": pa.array(s[order], pa.float64()),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")


def embedding_pairs(ds, tau: float, id_col: str = "vec_id",
                    emb_col: str = "embedding",
                    broadcast_limit: int = 200_000, nbits: int = 8,
                    bands: int = 8, seed: int = 42):
    """Near-duplicate pairs by cosine ≥ tau: (vec_a < vec_b, cos_sim).

    Explicit path switch (mirrors rollup's beyond_broadcast_limit): at or
    under ``broadcast_limit`` rows the EXACT all-pairs path runs (corpus
    broadcast + block×corpus matmul — O(N²/block) compute, fine for small
    dedup sides and the correctness oracle); above it the LSH-banded path
    (``embedding_pairs_lsh``) engages — bucketed pair emission with no
    all-pairs matmul and no whole-corpus broadcast.
    """
    if ds.count() <= broadcast_limit:
        return _embedding_pairs_broadcast(ds, tau, id_col, emb_col)
    return embedding_pairs_lsh(ds, tau, id_col, emb_col, nbits=nbits,
                               bands=bands, seed=seed,
                               broadcast_limit=broadcast_limit)


def _embedding_pairs_broadcast(ds, tau: float, id_col: str = "vec_id",
                               emb_col: str = "embedding"):
    """Exact all-pairs path (small corpora): corpus broadcast once via
    ray.put, each block matmuls against it, pairs emitted where the block
    side holds the smaller id (each unordered pair exactly once)."""
    import ray

    corpus_ids, corpus_mat = load_corpus(ds, id_col, emb_col)
    cref = ray.put((corpus_ids, corpus_mat))

    def _pairs(batch: pa.Table) -> pa.Table:
        cids, cmat = ray.get(cref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        sims = bmat @ cmat.T  # (nblock, ncorpus)
        hit = (sims >= tau) & (vids[:, None] < cids[None, :])
        bi, cj = np.nonzero(hit)
        return pa.table({
            "vec_a": pa.array(vids[bi], pa.int64()),
            "vec_b": pa.array(cids[cj], pa.int64()),
            "cos_sim": pa.array(sims[bi, cj], pa.float64()),
        })

    return ds.map_batches(_pairs, batch_format="pyarrow",
                          zero_copy_batch=True)


_PLANE_CACHE: dict = {}


def _band_planes(dim: int, nbits: int, band: int, seed: int) -> np.ndarray:
    """Per-band hyperplanes, deterministic in (dim, nbits, band, seed);
    cached per process (construct-once/apply-many)."""
    key = (dim, nbits, band, seed)
    if key not in _PLANE_CACHE:
        _PLANE_CACHE[key] = _hyperplanes(dim, nbits, seed * 1000 + band)
    return _PLANE_CACHE[key]


def embedding_pairs_lsh(ds, tau: float, id_col: str = "vec_id",
                        emb_col: str = "embedding", nbits: int = 8,
                        bands: int = 8, seed: int = 42,
                        max_bucket: int = 2000,
                        broadcast_limit: int = 200_000):
    """Scale path for embedding near-dup: LSH-banded bucketing, the same
    SLIM topology as minhash banding (stages/dedup._bucket_pairs_slim).

    Round 2 carried the normalized embedding as an 8·d-byte blob per
    banded row (bands × 8·d bytes/doc ≈ 49 KB/vec at d=768 through the
    shuffle) and collapsed multi-band duplicate pairs in an extra
    pair-keyed dedup exchange.  Now each banded row carries only its
    8·bands-byte bucket-key VECTOR, so a bucket emits a pair ONLY in the
    lowest band where the two vectors collide (no duplicate pairs, no
    dedup exchange), and exact-cosine scoring joins the slim pairs back
    to the corpus (``_attach_cosine``: corpus broadcast under
    ``broadcast_limit``, two hash-partitioned joins beyond — embeddings
    move once per PAIR SIDE instead of ``bands`` times per corpus row).
    Recall < 1 by design (the classic ANN trade; pinned by
    tests/test_similarity.py against the exact path).  Hot buckets cap
    at ``max_bucket`` rows (deterministic min-id subset).
    """
    from .dedup import _bucket_pairs_slim
    from .sorted_groups import sorted_group_map

    ds = ds.materialize()  # consumed by the band pass AND the score join
    n_docs = ds.count()

    def _band_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        mat = _normalize(_emb_matrix(batch, emb_col))
        n, d = mat.shape
        keys = np.empty((n, bands), dtype=np.int64)
        for b in range(bands):
            keys[:, b] = _bucket_of(mat, _band_planes(d, nbits, b, seed))
        key_rows = np.repeat(keys.view(np.uint8).reshape(n, bands * 8),
                             bands, axis=0)
        keys_arr = pa.Array.from_buffers(
            pa.binary(bands * 8), n * bands,
            [None, pa.py_buffer(np.ascontiguousarray(key_rows).tobytes())])
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "band_key": pa.array(np.ascontiguousarray(keys.reshape(-1)),
                                 pa.int64()),
            id_col: pa.array(np.repeat(ids, bands), pa.int64()),
            "keys": keys_arr,
        })

    banded = ds.map_batches(_band_rows, batch_format="pyarrow",
                            zero_copy_batch=True)

    def _pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs_slim(group, id_col, bands, max_bucket)

    pairs_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    pairs = sorted_group_map(banded, ["band", "band_key"], _pairs,
                             pairs_schema, min_group_size=2)
    return _attach_cosine(pairs, ds, id_col, emb_col, tau, n_docs,
                          broadcast_limit=broadcast_limit)


def _blob_matrix(col) -> np.ndarray:
    """Fixed-width float64 binary column -> (n, d) matrix, zero-copy from
    the Arrow data buffer (the embedding twin of dedup._sig_matrix)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=np.float64)
    import pyarrow.compute as pc

    col = pc.cast(col, pa.large_binary())
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                         offset=col.offset * 8)
    widths = np.diff(offs)
    if not (widths == widths[0]).all():
        raise ValueError("embedding blob column is not fixed-width")
    d = int(widths[0]) // 8
    return np.frombuffer(bufs[2], dtype=np.float64, count=n * d,
                         offset=int(offs[0])).reshape(n, d)


def _attach_cosine(pairs_ds, corpus_ds, id_col: str, emb_col: str,
                   tau: float, n_docs: int,
                   broadcast_limit: int = 200_000,
                   num_partitions: int | None = None):
    """Exact-cosine scoring of slim (doc_a, doc_b) candidate pairs — the
    join-back that replaces carrying embeddings through the band shuffle
    (same path-switch pattern as dedup._attach_est_jaccard).

    - ``n_docs <= broadcast_limit``: (sorted ids, normalized matrix)
      broadcast once via ray.put; each pair batch scores with two
      searchsorted gathers + one row-wise dot.
    - beyond: two hash-partitioned joins attach each side's normalized
      embedding blob (written zero-copy as large_binary), then the same
      row-wise dot; the corpus streams through the join keyed on the
      uniform vec id.
    """
    import ray

    out_schema = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                            ("cos_sim", pa.float64())])

    def _emit(a, b, cos):
        keep = cos >= tau
        return pa.table({
            "vec_a": pa.array(a[keep], pa.int64()),
            "vec_b": pa.array(b[keep], pa.int64()),
            "cos_sim": pa.array(cos[keep], pa.float64()),
        })

    if n_docs <= broadcast_limit:
        sid, mat = load_corpus(corpus_ds, id_col, emb_col)
        ref = ray.put((sid, mat))

        def _score(batch: pa.Table) -> pa.Table:
            if len(batch) == 0:
                return out_schema.empty_table()
            ids_s, m = ray.get(ref)
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(ids_s, a)
            ib = np.searchsorted(ids_s, b)
            return _emit(a, b, np.einsum("ij,ij->i", m[ia], m[ib]))

        return pairs_ds.map_batches(_score, batch_format="pyarrow")

    pairs_ds = pairs_ds.materialize()
    if num_partitions is None:
        n_pairs = pairs_ds.count()
        cpu_cap = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        num_partitions = int(min(cpu_cap, max(2, n_pairs // 25_000 + 2)))

    def _side(side: str):
        def _m(batch: pa.Table) -> pa.Table:
            mat = np.ascontiguousarray(_normalize(_emb_matrix(batch,
                                                              emb_col)))
            n, d = mat.shape
            offs = np.arange(0, (n + 1) * 8 * d, 8 * d, dtype=np.int64)
            blob = pa.Array.from_buffers(
                pa.large_binary(), n,
                [None, pa.py_buffer(offs.tobytes()),
                 pa.py_buffer(mat.tobytes())])
            return pa.table({f"doc_{side}": batch[id_col],
                             f"emb_{side}": blob})
        return _m

    docs_a = corpus_ds.map_batches(_side("a"), batch_format="pyarrow",
                                   zero_copy_batch=True)
    docs_b = corpus_ds.map_batches(_side("b"), batch_format="pyarrow",
                                   zero_copy_batch=True)
    joined = pairs_ds.join(docs_a, "inner", num_partitions, on=("doc_a",))
    joined = joined.join(docs_b, "inner", num_partitions, on=("doc_b",))

    def _score_joined(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        ma = _blob_matrix(batch["emb_a"])
        mb = _blob_matrix(batch["emb_b"])
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        return _emit(a, b, np.einsum("ij,ij->i", ma, mb))

    return joined.map_batches(_score_joined, batch_format="pyarrow")


# ------------------------------------------------------------------ IVF path

def _kmeans_cosine(sample: np.ndarray, k: int, iters: int = 10,
                   seed: int = 42) -> np.ndarray:
    """Deterministic spherical k-means on an L2-normalized sample
    (driver-side; the sample is small by construction).  Standard IVF
    coarse quantizer (Jégou et al., "Product Quantization", TPAMI 2011 —
    the inverted-file part, not PQ)."""
    rng = np.random.RandomState(seed)
    k = min(k, len(sample))
    cent = sample[rng.choice(len(sample), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                m = members.mean(axis=0)
                norm = np.linalg.norm(m)
                if norm > 0:
                    cent[j] = m / norm
    return cent


def train_ivf_centroids(ds, n_centroids: int = 16, sample_size: int = 4096,
                        iters: int = 10, seed: int = 42,
                        emb_col: str = "embedding",
                        sample_blocks: int = 16) -> np.ndarray:
    """Train the IVF coarse quantizer on a SPREAD corpus sample.

    Embedding corpora are routinely written in clustered order (domain
    shards, topic batches), so a head sample sees a few clusters and the
    quantizer packs all centroids there — the same hazard fixed for
    ``detect_hot_domains`` with spread-block sampling, reused here: on a
    MaterializedDataset pick evenly spaced block refs across the whole
    corpus and evenly spaced rows inside each (only the sampled blocks are
    fetched); on a lazy dataset ``to_arrow_refs`` would trigger full
    execution, so take a bounded streamed scan thinned by striding —
    8x the sample window, keeping every 8th row — which still spans far
    more of the corpus than a contiguous head."""
    from ray.data.dataset import MaterializedDataset

    rows = []
    if isinstance(ds, MaterializedDataset):
        import ray

        refs = ds.to_arrow_refs()
        if len(refs) > sample_blocks:
            idx = np.linspace(0, len(refs) - 1, sample_blocks,
                              dtype=np.int64)
            refs = [refs[i] for i in dict.fromkeys(idx.tolist())]
        per_block = max(1, sample_size // max(1, len(refs)))
        for tbl in ray.get(refs):
            if not len(tbl):
                continue
            pos = np.unique(np.linspace(0, len(tbl) - 1,
                                        min(per_block, len(tbl)),
                                        dtype=np.int64))
            rows.append(_emb_matrix(
                tbl.take(pa.array(pos, pa.int64())), emb_col))
    else:
        stride, seen = 8, 0
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=2048):
            mat = _emb_matrix(batch, emb_col)
            rows.append(mat[(np.arange(len(mat)) + seen) % stride == 0])
            seen += len(batch)
            if seen >= sample_size * stride:
                break
    sample = np.vstack(rows)
    if len(sample) > sample_size:
        pos = np.unique(np.linspace(0, len(sample) - 1, sample_size,
                                    dtype=np.int64))
        sample = sample[pos]
    sample = _normalize(sample)
    return _kmeans_cosine(sample, n_centroids, iters=iters, seed=seed)


def ann_topk_ivf(ds, query_ids: np.ndarray, query_mat: np.ndarray,
                 k: int = 5, n_centroids: int = 16, nprobe: int = 4,
                 sample_size: int = 4096, seed: int = 42,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 exclude_self: bool = True):
    """IVF approximate top-k: corpus vectors are assigned to their nearest
    spherical-k-means centroid (the inverted file); each query scans only
    its ``nprobe`` nearest cells, ~nprobe/n_centroids of the corpus.

    Same broadcast-small-side / stream-big-side topology as ann_topk:
    centroids + per-cell query lists are ray.put once; corpus batches
    assign themselves vectorized (one matmul vs centroids) and emit
    block-local partial top-k only for (cell, query) matches.  Recall is
    pinned vs the exact path by tests, not guaranteed — the IVF trade.
    """
    import ray

    qids = np.asarray(query_ids)
    qmat = np.asarray(query_mat)
    cent = train_ivf_centroids(ds, n_centroids, sample_size, seed=seed,
                               emb_col=emb_col)
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    probes: dict = {}
    for qi, cells in enumerate(qcells):
        for c in cells:
            probes.setdefault(int(c), []).append(qi)
    qref = ray.put((qids, qmat, cent, probes))

    def _partial(batch: pa.Table) -> pa.Table:
        _qids, _qmat, _cent, _probes = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        vcells = np.argmax(bmat @ _cent.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for cell in np.unique(vcells):
            qidx = _probes.get(int(cell))
            if not qidx:
                continue
            sel = vcells == cell
            sims = _qmat[qidx] @ bmat[sel].T
            svids = vids[sel]
            for r, qi in enumerate(qidx):
                srow = sims[r]
                if exclude_self:
                    srow = np.where(svids == _qids[qi], -np.inf, srow)
                kk = min(k, len(srow))
                top = np.argpartition(-srow, kk - 1)[:kk]
                for t in top:
                    if np.isfinite(srow[t]):
                        out_q.append(_qids[qi])
                        out_v.append(svids[t])
                        out_s.append(srow[t])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(np.asarray(out_s, dtype=np.float64),
                                pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        q = group["query_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -round6_tie_robust(s)))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_sim": pa.array(s[order], pa.float64()),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")


# ------------------------------------------------------------------ LSH path

def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((nbits, dim))


def _bucket_of(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (mat @ planes.T) > 0  # (n, nbits)
    weights = (1 << np.arange(planes.shape[0])).astype(np.int64)
    return bits.astype(np.int64) @ weights


def ann_topk_lsh(ds, query_ids: np.ndarray, query_mat: np.ndarray,
                 k: int = 5, nbits: int = 8, seed: int = 42,
                 id_col: str = "vec_id", emb_col: str = "embedding",
                 exclude_self: bool = True):
    """Approximate top-k: scan only buckets within Hamming 1 of the query's
    random-hyperplane bucket.  Same output schema as ann_topk."""
    import ray

    qids = np.asarray(query_ids)
    qmat = np.asarray(query_mat)
    dim = qmat.shape[1]
    planes = _hyperplanes(dim, nbits, seed)
    qbuckets = _bucket_of(qmat, planes)
    # probe set per query: own bucket + flip each bit
    probes = {}
    for i, b in enumerate(qbuckets):
        s = {int(b)} | {int(b) ^ (1 << j) for j in range(nbits)}
        for bucket in s:
            probes.setdefault(bucket, []).append(i)
    qref = ray.put((qids, qmat, planes, probes))

    def _partial(batch: pa.Table) -> pa.Table:
        _qids, _qmat, _planes, _probes = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        vbuckets = _bucket_of(bmat, _planes)
        out_q, out_v, out_s = [], [], []
        for bucket in np.unique(vbuckets):
            qidx = _probes.get(int(bucket))
            if not qidx:
                continue
            sel = vbuckets == bucket
            sims = _qmat[qidx] @ bmat[sel].T
            svids = vids[sel]
            for r, qi in enumerate(qidx):
                srow = sims[r]
                if exclude_self:
                    srow = np.where(svids == _qids[qi], -np.inf, srow)
                kk = min(k, len(srow))
                top = np.argpartition(-srow, kk - 1)[:kk]
                for t in top:
                    if np.isfinite(srow[t]):
                        out_q.append(_qids[qi])
                        out_v.append(svids[t])
                        out_s.append(srow[t])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "cos_sim": pa.array(np.asarray(out_s, dtype=np.float64),
                                pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        s = group["cos_sim"].to_numpy(zero_copy_only=False)
        q = group["query_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -round6_tie_robust(s)))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
            "cos_sim": pa.array(s[order], pa.float64()),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")


# ------------------------------------------------ product quantization

def _kmeans_l2(sample: np.ndarray, k: int, iters: int = 10,
               seed: int = 42) -> np.ndarray:
    """Deterministic L2 k-means (driver-side, small sample): farthest-
    first (maximin) init — start at the first sample row, repeatedly
    add the point with the largest min-distance to the chosen set
    (ties -> lowest index), which covers every well-separated cluster
    by construction where a random init can double-cover one — then
    argmin assignment / mean update; empty clusters keep their old
    centroid.  The PQ sub-quantizer trainer (Jégou et al., TPAMI 2011
    — the PQ part this time).  ``seed`` kept for signature stability;
    the init is fully deterministic."""
    k = min(k, len(sample))
    picks = [0]
    mind = ((sample - sample[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))
        picks.append(nxt)
        mind = np.minimum(mind, ((sample - sample[nxt]) ** 2).sum(axis=1))
    cent = sample[picks].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(k):
            members = sample[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return cent


def train_pq_codebooks(ds, m: int = 4, ksub: int = 16,
                       sample_size: int = 4096, iters: int = 10,
                       seed: int = 42, emb_col: str = "embedding",
                       sample_blocks: int = 16) -> list:
    """Train PQ sub-codebooks on a SPREAD corpus sample (same
    clustered-write hazard and spread-block fix as the IVF trainer).
    Vectors are L2-NORMALIZED before splitting into ``m`` contiguous
    subspaces (PQ over normalized vectors makes the asymmetric L2
    distance a monotone proxy for cosine: ||a−b||² = 2 − 2·cos).
    Returns a list of m (ksub, d_sub) float64 codebooks."""
    sample = _normalize(_pq_spread_sample(ds, sample_size, emb_col,
                                          sample_blocks))
    subs = np.array_split(sample, m, axis=1)
    return [_kmeans_l2(np.ascontiguousarray(s), ksub, iters=iters,
                       seed=seed + 17 * j)
            for j, s in enumerate(subs)]


def _pq_spread_sample(ds, sample_size: int, emb_col: str,
                      sample_blocks: int) -> np.ndarray:
    """Spread-block sample collection (the train_ivf_centroids
    discipline, shared): evenly spaced blocks, evenly spaced rows
    inside each on a materialized dataset; strided bounded scan on a
    lazy one."""
    from ray.data.dataset import MaterializedDataset

    rows = []
    if isinstance(ds, MaterializedDataset):
        import ray

        refs = ds.to_arrow_refs()
        if len(refs) > sample_blocks:
            idx = np.linspace(0, len(refs) - 1, sample_blocks,
                              dtype=np.int64)
            refs = [refs[i] for i in dict.fromkeys(idx.tolist())]
        per_block = max(1, sample_size // max(1, len(refs)))
        for tbl in ray.get(refs):
            if not len(tbl):
                continue
            pos = np.unique(np.linspace(0, len(tbl) - 1,
                                        min(per_block, len(tbl)),
                                        dtype=np.int64))
            rows.append(_emb_matrix(
                tbl.take(pa.array(pos, pa.int64())), emb_col))
    else:
        stride, seen = 8, 0
        for batch in ds.iter_batches(batch_format="pyarrow",
                                     batch_size=2048):
            mat = _emb_matrix(batch, emb_col)
            rows.append(mat[(np.arange(len(mat)) + seen) % stride == 0])
            seen += len(batch)
            if seen >= sample_size * stride:
                break
    sample = np.vstack(rows)
    if len(sample) > sample_size:
        pos = np.unique(np.linspace(0, len(sample) - 1, sample_size,
                                    dtype=np.int64))
        sample = sample[pos]
    return sample


def ann_topk_pq(ds, query_ids: np.ndarray, query_mat: np.ndarray,
                k: int = 5, m: int = 4, ksub: int = 16,
                id_col: str = "vec_id", emb_col: str = "embedding",
                exclude_self: bool = True, codebooks: list = None,
                seed: int = 42):
    """Approximate cosine top-k via PRODUCT QUANTIZATION with
    asymmetric distance computation (ADC, Jégou et al. 2011) — the
    memory-scale ANN path: each corpus vector compresses to ``m``
    bytes (codes), each query precomputes m × ksub distance tables
    ONCE, and the per-vector distance is m table lookups + adds
    instead of a d-dim dot product.  At 100 TB this is the difference
    between holding 64-float vectors and holding 4-byte codes in the
    scan.

    Encode + ADC are FUSED in one streaming pass (codes never
    materialize corpus-wide); per-block partial top-k then the same
    deterministic grouped merge as brute force (rounded distance asc,
    vec_id tie-break).  Returns (query_id, vec_id, approx_dist2).
    ``codebooks``: pass pre-trained ones (train_pq_codebooks) or None
    to train on the spread sample here."""
    import ray

    from ..kernels.rounding import round6_tie_robust

    if codebooks is None:
        codebooks = train_pq_codebooks(ds, m=m, ksub=ksub, seed=seed,
                                       emb_col=emb_col)
    m = len(codebooks)          # pre-trained codebooks define the split
    qmat = _normalize(np.asarray(query_mat, np.float64))
    qsubs = np.array_split(qmat, m, axis=1)
    # per-query distance tables: tabs[j][q, c] = ||q_sub - c||^2
    tabs = [((qs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            for qs, cb in zip(qsubs, codebooks)]
    qref = ray.put((np.asarray(query_ids), codebooks, tabs))

    def _partial(batch: pa.Table) -> pa.Table:
        qids, cbs, dtabs = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        bsubs = np.array_split(bmat, len(cbs), axis=1)
        nq, nb = len(qids), len(vids)
        adist = np.zeros((nq, nb))
        for j, (bs, cb) in enumerate(zip(bsubs, cbs)):
            d2 = ((bs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
            codes = np.argmin(d2, axis=1)        # (nb,) uint8-range
            adist += dtabs[j][:, codes]
        if exclude_self:
            adist[qids[:, None] == vids[None, :]] = np.inf
        kk = min(k, nb)
        idx = np.argpartition(adist, kk - 1, axis=1)[:, :kk]
        rows_q = np.repeat(qids, kk)
        rows_v = vids[idx.ravel()]
        rows_d = np.take_along_axis(adist, idx, axis=1).ravel()
        keep = np.isfinite(rows_d)
        return pa.table({
            "query_id": pa.array(rows_q[keep], pa.int64()),
            "vec_id": pa.array(rows_v[keep], pa.int64()),
            "approx_dist2": pa.array(rows_d[keep], pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        d = group["approx_dist2"].to_numpy(zero_copy_only=False)
        q = group["query_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, round6_tie_robust(d)))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
            "approx_dist2": pa.array(d[order], pa.float64()),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")


def ann_topk_ivfpq(ds, query_ids: np.ndarray, query_mat: np.ndarray,
                   k: int = 5, n_centroids: int = 16, nprobe: int = 4,
                   m: int = 8, ksub: int = 32, sample_size: int = 4096,
                   seed: int = 42, id_col: str = "vec_id",
                   emb_col: str = "embedding",
                   exclude_self: bool = True):
    """IVF-PQ with residual encoding — the canonical FAISS-style
    billion-scale index (Jégou et al. 2011 §IV): the IVF coarse
    quantizer routes each vector to a cell, the RESIDUAL x − c(x) is
    product-quantized to ``m`` codes, and a query probes ``nprobe``
    cells with per-cell ADC tables over the residual codebooks
    (table[j][code] = ||(q − c)_j − cb_j[code]||²).  At 100 TB the
    corpus holds 1 cell id + m bytes per vector; the scan is table
    lookups, never a d-dim dot product.

    Train on the spread-block sample (coarse centroids, then residual
    sub-codebooks); scan FUSES assign + encode + ADC per batch.
    Returns (query_id, vec_id, approx_dist2); deterministic merge on
    the rounded distance with vec_id tie-break."""
    import ray

    from ..kernels.rounding import round6_tie_robust

    qids = np.asarray(query_ids)
    qmat = _normalize(np.asarray(query_mat, np.float64))
    cent = train_ivf_centroids(ds, n_centroids, sample_size, seed=seed,
                               emb_col=emb_col)
    # residual sub-codebooks from the SAME spread sample discipline
    sample = _normalize(_pq_spread_sample(ds, sample_size, emb_col, 16))
    sassign = np.argmax(sample @ cent.T, axis=1)
    resid = sample - cent[sassign]
    rsubs = np.array_split(resid, m, axis=1)
    codebooks = [_kmeans_l2(np.ascontiguousarray(s), ksub, seed=seed
                            + 31 * j)
                 for j, s in enumerate(rsubs)]

    # per-(query, probed cell) ADC tables
    qcells = np.argsort(-(qmat @ cent.T), axis=1)[:, :nprobe]
    tabs: dict = {}          # (qi, cell) -> list of m (ksub,) tables
    probes: dict = {}        # cell -> [qi, ...]
    for qi in range(len(qids)):
        for c in qcells[qi]:
            c = int(c)
            probes.setdefault(c, []).append(qi)
            qr = qmat[qi] - cent[c]
            qrs = np.array_split(qr, m)
            tabs[(qi, c)] = [((qs[None, :] - cb) ** 2).sum(axis=1)
                             for qs, cb in zip(qrs, codebooks)]
    qref = ray.put((qids, cent, codebooks, probes, tabs))

    def _partial(batch: pa.Table) -> pa.Table:
        _qids, _cent, _cbs, _probes, _tabs = ray.get(qref)
        vids = batch[id_col].to_numpy(zero_copy_only=False)
        bmat = _normalize(_emb_matrix(batch, emb_col))
        vcells = np.argmax(bmat @ _cent.T, axis=1)
        mm = len(_cbs)
        out_q, out_v, out_d = [], [], []
        for cell in np.unique(vcells):
            cell = int(cell)
            qidx = _probes.get(cell)
            if not qidx:
                continue
            sel = vcells == cell
            svids = vids[sel]
            rm = bmat[sel] - _cent[cell]
            rsub = np.array_split(rm, mm, axis=1)
            codes = [np.argmin(((s[:, None, :] - cb[None, :, :]) ** 2)
                               .sum(axis=2), axis=1)
                     for s, cb in zip(rsub, _cbs)]
            for qi in qidx:
                t = _tabs[(qi, cell)]
                dist = np.zeros(len(svids))
                for j in range(mm):
                    dist += t[j][codes[j]]
                if exclude_self:
                    dist = np.where(svids == _qids[qi], np.inf, dist)
                kk = min(k, len(dist))
                top = np.argpartition(dist, kk - 1)[:kk]
                for ti in top:
                    if np.isfinite(dist[ti]):
                        out_q.append(_qids[qi])
                        out_v.append(svids[ti])
                        out_d.append(dist[ti])
        return pa.table({
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(out_v, pa.int64()),
            "approx_dist2": pa.array(np.asarray(out_d, np.float64),
                                     pa.float64()),
        })

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v = group["vec_id"].to_numpy(zero_copy_only=False)
        d = group["approx_dist2"].to_numpy(zero_copy_only=False)
        q = group["query_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, round6_tie_robust(d)))[:k]
        return pa.table({
            "query_id": pa.array(q[order], pa.int64()),
            "vec_id": pa.array(v[order], pa.int64()),
            "approx_dist2": pa.array(d[order], pa.float64()),
        })

    return partials.groupby("query_id").map_groups(
        _final, batch_format="pyarrow")
