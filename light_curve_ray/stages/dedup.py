"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Core training-data-pipeline operators built on the hashing kernels
(kernels/hashing.py — Broder MinHash, Charikar SimHash, banding LSH per
Leskovec-Rajaraman-Ullman MMDS ch.3; all deterministic uint64 arithmetic).

Scale design notes (the part the reference cannot seed — it is single
process — so this is engine design, SURVEY §2b "not built from reference"):

- **Exact dedup** is hash-partition + keyed aggregate: fingerprint each text
  (blake2b, 64-bit, C-speed) in a stateless ``map_batches``, then
  ``groupby(fp).aggregate(Min(id), Count())`` — the shuffle moves only
  (fp, id) pairs, never the text.  One all-to-all on a uniform 64-bit key:
  no skew by construction.
- **MinHash LSH** is shingle → signature table, PINNED once (the
  permutation parameters are built once per worker process) → SLIM band-row
  expansion (×``bands`` rows of band, band_key, doc_id + the 8·bands-byte
  band-key vector — ~148 B/row; the round-2 design carried the full 1 KB
  signature per banded row, ~16 KB/doc of shuffle weight) → sort by band
  key → vectorized bucket pair emit in the LOWEST matching band only (so
  multi-band duplicate pairs never exist and no pair-dedupe exchange is
  needed) → est_jaccard attached from the pinned signature table
  (broadcast gather small / two partitioned joins at scale).  Hot buckets
  (m docs in one bucket → m²/2 pairs) are capped at ``max_bucket`` docs
  with a deterministic min-id selection; at web scale an all-equal
  boilerplate cluster otherwise explodes quadratically.
- **SimHash** mirrors the MinHash topology with 16-bit bands of the 64-bit
  signature (any pair within Hamming distance d collides in ≥1 of 4 bands
  when d ≤ 3 by pigeonhole).
- **n-gram Jaccard verify** re-scores candidate pairs with shingle-set
  Jaccard (exact over the token-hash shingle sets; token hashes sample
  head+tail bytes — kernels/hashing.token_hashes documents the residual
  collision class).  Default/scale path: two hash-partitioned
  ``Dataset.join`` exchanges of the slim pairs against the corpus on doc
  id (``ngram_jaccard_verify_join``); a broadcast id → text variant
  remains for small corpus slices.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import (
    jaccard,
    minhash_signatures_batch,
    shingle_hashes,
    simhash64,
)
from ..kernels.textkit import fingerprint

_U64_TO_I64 = np.int64  # bitcast view for Arrow int64 keys


def _as_i64(u: np.ndarray) -> np.ndarray:
    return u.astype(np.uint64).view(np.int64)


# ------------------------------------------------------------------ exact

def add_fingerprint(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """(id, text, ...) -> (id, fp) — blake2b-64 of whitespace-normalized
    text (kernels/textkit.fingerprint; C-speed digest, so the stage is
    text-normalization-bound, not hash-bound)."""
    texts = batch[text_col].to_pylist()
    fp = np.fromiter(
        (fingerprint(t or "") for t in texts),
        dtype=np.uint64, count=len(texts),
    )
    return pa.table({id_col: batch[id_col],
                     "fp": pa.array(_as_i64(fp), pa.int64())})


def exact_dedup(ds, id_col: str = "doc_id", text_col: str = "text"):
    """One row per distinct text: (doc_id = min id, n_copies).

    groupby on the 64-bit fingerprint — the shuffle moves 16-byte rows.
    """
    from ray.data.aggregate import Count, Min

    def _fp(batch: pa.Table) -> pa.Table:
        return add_fingerprint(batch, id_col, text_col)

    keyed = ds.map_batches(_fp, batch_format="pyarrow", zero_copy_batch=True)
    out = keyed.groupby("fp").aggregate(
        Min(id_col, alias_name=id_col),
        Count(alias_name="n_copies"),
    )
    return out.select_columns([id_col, "n_copies"])


def exact_dup_chain_edges(ds, id_col: str = "doc_id",
                          text_col: str = "text"):
    """Duplicate-pair EDGES for component clustering: within each
    identical-text group, consecutive id pairs in id order — a CHAIN, not
    a clique, so a k-copy group ships k-1 edges (not k^2/2) and the
    downstream connected-components stage (stages/components) does the
    transitive closure.  One 16-byte-row keyed exchange on the text
    fingerprint."""
    from .sorted_groups import _runs, sorted_group_map

    edge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])

    def _fp(batch: pa.Table) -> pa.Table:
        return add_fingerprint(batch, id_col, text_col)

    keyed = ds.map_batches(_fp, batch_format="pyarrow",
                           zero_copy_batch=True)

    def _chains(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return edge_schema.empty_table()
        starts, ends = _runs(batch, ["fp"])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        inv = np.repeat(np.arange(len(starts)), ends - starts)
        order = np.lexsort((ids, inv))
        ids_s, inv_s = ids[order], inv[order]
        adjacent = inv_s[1:] == inv_s[:-1]
        return pa.table({"a": ids_s[:-1][adjacent],
                         "b": ids_s[1:][adjacent]}, schema=edge_schema)

    return sorted_group_map(keyed, ["fp"], None, edge_schema,
                            block_fn=_chains)


def exact_dedup_filter(ds, id_col: str = "doc_id", text_col: str = "text",
                       num_partitions: int | None = None):
    """Corpus-level dedup: the corpus restricted to each distinct text's
    canonical (min-id) representative — what a training-data pipeline
    actually feeds downstream.

    Winners come from ``exact_dedup`` (16-byte-row shuffle); the corpus is
    then hash-joined to the slim winner-id set, so full documents move
    through exactly one partitioned exchange keyed on the uniform doc id.
    """
    import ray

    winners = exact_dedup(ds, id_col, text_col).select_columns([id_col])
    if num_partitions is None:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 8)) // 2)
    return ds.join(winners, "inner", num_partitions, on=(id_col,))


def dedup_rows_sorted(ds, key_cols: list, tiebreak_cols: list | None = None):
    """Drop duplicate rows by ``key_cols``, keeping one row per key —
    the O10 row dedup (same (url, warc_ts) re-crawled in overlapping
    dumps), scalable form.

    Same topology as the stats merge (stages/aggregate.merge_partials):
    sort by key (the one all-to-all), drop duplicates inside each sorted
    block vectorized, and resolve only each block's first/last key — the
    only keys that can straddle block boundaries — in a single tiny
    residual partition.  No per-group Python, no full-row groupby.

    ``tiebreak_cols``: extra sort columns appended to the key, making the
    SURVIVING row deterministic when duplicate keys carry differing
    payloads (kept = min by tiebreak).  Without them, Ray's sort order
    among equal keys — and therefore the survivor — is run-dependent.
    """
    import pyarrow.compute as pc

    sort_cols = key_cols + list(tiebreak_cols or [])

    def _first_per_key(batch: pa.Table, mark_boundary: bool) -> pa.Table:
        if len(batch) == 0:
            if mark_boundary:
                return batch.append_column("boundary",
                                           pa.array([], pa.bool_()))
            return batch
        from ..kernels.moments import _group_codes

        inv, _ = _group_codes(batch, key_cols)
        changed = np.empty(len(batch), dtype=bool)
        changed[0] = True
        changed[1:] = inv[1:] != inv[:-1]
        first_rows = np.nonzero(changed)[0]
        out = batch.take(pa.array(first_rows, pa.int64()))
        if mark_boundary:
            boundary = np.zeros(len(first_rows), dtype=bool)
            boundary[0] = True
            boundary[-1] = True
            out = out.append_column("boundary",
                                    pa.array(boundary, pa.bool_()))
        return out

    deduped = ds.sort(sort_cols).map_batches(
        lambda b: _first_per_key(b, True), batch_format="pyarrow",
        batch_size=None, zero_copy_batch=True,
    ).materialize()
    interior = deduped.map_batches(
        lambda b: b.filter(pc.invert(b["boundary"])).drop_columns(
            ["boundary"]),
        batch_format="pyarrow", zero_copy_batch=True)
    residual = (
        deduped.map_batches(
            lambda b: b.filter(b["boundary"]).drop_columns(["boundary"]),
            batch_format="pyarrow", zero_copy_batch=True)
        .repartition(1)
        .map_batches(lambda b: _first_per_key(b, False),
                     batch_format="pyarrow", batch_size=None)
    )
    return interior.union(residual)


def _key_fps(batch: pa.Table, key_cols: list) -> np.ndarray:
    """Deterministic 64-bit fingerprint per row over ``key_cols`` — fully
    vectorized for short keys (kernels/hashing.hash_columns_u64: pyarrow
    concat + column-wise FNV-1a, no per-row Python).  Equal keys always
    hash equal, so dedup routing stays exact; 64-bit collisions only send
    extra rows to the sorted minority path."""
    from ..kernels.hashing import hash_columns_u64

    return hash_columns_u64(batch, key_cols)


def _content_fps(batch: pa.Table, content_cols: tuple) -> np.ndarray:
    """64-bit content fingerprint per row (payload bytes, blake2b over the
    pyarrow-concatenated columns — deterministic survivor tie-break)."""
    from ..kernels.hashing import hash_columns_blake2b

    cols = [c for c in content_cols if c in batch.column_names]
    return hash_columns_blake2b(batch, cols)


def dedup_pages_slim(ds, key_cols: list | None = None,
                     content_cols: tuple = ("html", "text"),
                     stats_out: dict | None = None):
    """O10 pages dedup WITHOUT shuffling fat rows: two-pass semi-join.

    Round 1 sorted the full pages table — ~7 KB of html per row through
    the all-to-all — to drop re-crawled (url, warc_ts) duplicates.  The
    scale form exploits that the duplicate FRACTION of a crawl is small:

    1. **Slim count pass**: stream only 8-byte key fingerprints into a
       map-side-combined count, ``groupby(kfp).sum`` — the only full
       all-to-all, at ~16 B/row.  Keys seen more than once (plus any
       64-bit fp collisions — harmless: they just route extra rows to
       pass 2b) come back to the driver and broadcast via ``ray.put``
       as a sorted array (np.searchsorted membership per batch).
    2. **Split pass**: rows whose key is NOT in the duplicate set stream
       straight through — no shuffle at all.  Only the duplicate-keyed
       minority (2a) is sorted, with a deterministic min-content-hash
       tie-break, so the survivor among differing re-crawled payloads is
       run-independent.

    Documented assumption: the duplicated-key set fits the object store
    (dup_fraction ≪ 1).  A crawl where MOST keys are duplicated should
    use ``dedup_rows_sorted`` on a projected slim table + join instead.
    """
    import ray

    from ray.data.aggregate import Sum

    if key_cols is None:
        key_cols = ["url", "warc_ts"]

    def _partial_counts(batch: pa.Table) -> pa.Table:
        fp = _key_fps(batch, key_cols).view(np.int64)
        uniq, counts = np.unique(fp, return_counts=True)
        return pa.table({"kfp": pa.array(uniq, pa.int64()),
                         "n": pa.array(counts, pa.int64())})

    counts = ds.map_batches(_partial_counts, batch_format="pyarrow",
                            zero_copy_batch=True)
    merged = counts.groupby("kfp").aggregate(Sum("n", alias_name="n"))

    import pyarrow.compute as pc

    # Filter n>1 DISTRIBUTED (map_batches on the merged counts) so only the
    # duplicate-key minority streams through the driver — not every distinct
    # key in the crawl (round-2 ADVICE: the full distinct-key table through
    # one process defeats the dup_fraction<<1 design).
    dup_tbls = list(
        merged.map_batches(
            lambda b: b.filter(pc.greater(b["n"], 1)),
            batch_format="pyarrow", zero_copy_batch=True,
        ).iter_batches(batch_format="pyarrow"))
    dup_fps = np.sort(np.concatenate(
        [t["kfp"].to_numpy(zero_copy_only=False) for t in dup_tbls]
        or [np.empty(0, dtype=np.int64)]))
    if stats_out is not None:
        stats_out["dup_keys"] = int(len(dup_fps))
    if len(dup_fps) == 0:
        return ds
    ref = ray.put(dup_fps)

    def _split(batch: pa.Table, keep_dups: bool) -> pa.Table:
        dup = ray.get(ref)
        fp = _key_fps(batch, key_cols).view(np.int64)
        idx = np.searchsorted(dup, fp)
        idx[idx >= len(dup)] = len(dup) - 1
        isdup = dup[idx] == fp
        out = batch.filter(pa.array(isdup if keep_dups else ~isdup))
        if keep_dups:
            cfp = _content_fps(out, content_cols)
            # uint64 column: the sort tie-break must order UNSIGNED hashes
            out = out.append_column("_cfp", pa.array(cfp, pa.uint64()))
        return out

    uniques = ds.map_batches(lambda b: _split(b, False),
                             batch_format="pyarrow", zero_copy_batch=True)
    dups = ds.map_batches(lambda b: _split(b, True),
                          batch_format="pyarrow", zero_copy_batch=True)
    winners = dedup_rows_sorted(dups, key_cols, tiebreak_cols=["_cfp"])
    winners = winners.map_batches(lambda b: b.drop_columns(["_cfp"]),
                                  batch_format="pyarrow",
                                  zero_copy_batch=True)
    return uniques.union(winners)


# ------------------------------------------------------------------ minhash

class MinHashStage:
    """documents batch -> (doc_id, sig: fixed 8*num_perm bytes), or — when
    ``bands`` is set — directly the banded LSH rows
    (band, band_key, doc_id, sig), fusing signature + band expansion into
    ONE stage (a separate band map_batches pass was pure fixed cost in the
    round-1 five-stage chain).

    Permutation parameters (a_i, b_i) are derived from ``seed`` once per
    actor in ``__init__`` — construct-once / apply-many.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 128, shingle_k: int = 3, seed: int = 42,
                 bands: int | None = None):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.seed = seed
        self.bands = bands
        # warm the parameter cache (kernels derive a,b from seed each call;
        # cheap, but touching it here keeps first-batch latency flat)
        minhash_signatures_batch([np.array([1], dtype=np.uint64)],
                                 num_perm=num_perm, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..kernels.hashing import band_key_matrix

        texts = batch[self.text_col].to_pylist()
        hash_sets = [shingle_hashes((t or "").split(), k=self.shingle_k)
                     for t in texts]
        sigs = minhash_signatures_batch(hash_sets, num_perm=self.num_perm,
                                        seed=self.seed)
        blobs = [sigs[i].tobytes() for i in range(len(texts))]
        if self.bands is None:
            return pa.table({
                self.id_col: batch[self.id_col],
                "sig": pa.array(blobs, pa.binary()),
            })
        n = len(texts)
        bands = self.bands
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        keys = band_key_matrix(sigs, bands)  # (n, bands) uint64
        # NOTE: bytes must NOT round-trip through numpy ('S' dtype strips
        # trailing null bytes); repeat in Python, aligned with np.repeat
        rep_sigs = [b for b in blobs for _ in range(bands)]
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "band_key": pa.array(keys.reshape(-1).view(np.int64),
                                 pa.int64()),
            self.id_col: pa.array(np.repeat(ids, bands)),
            "sig": pa.array(rep_sigs, pa.binary()),
        })


def _keys_matrix(col, bands: int) -> np.ndarray:
    """Fixed-size-binary band-key-vector column -> (n, bands) uint64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, bands), dtype=np.uint64)
    data = col.buffers()[1]
    return np.frombuffer(data, dtype=np.uint64, count=n * bands,
                         offset=col.offset * bands * 8).reshape(n, bands)


def _bucket_pairs_slim(group: pa.Table, id_col: str, bands: int,
                       max_bucket: int) -> pa.Table:
    """One LSH bucket -> candidate id pairs (doc_a < doc_b), VECTORIZED
    (one triu_indices + one (pairs, bands) equality matrix per bucket — no
    per-row Python, no signature payload).

    Each banded row carries its doc's full band-key VECTOR (8*bands B), so
    the bucket can emit a pair ONLY in the lowest band where the two docs
    collide — multi-band duplicate pairs never exist, removing the
    pair-dedupe exchange entirely (round-2 chain: emit per band -> global
    sort to dedupe).  Trade, documented: a pair truncated out of its
    lowest-band bucket by the hot-bucket cap is dropped rather than
    rescued by a later band (hot buckets are near-identical boilerplate
    clusters where the cap already sheds pairs by design)."""
    ids = group[id_col].to_numpy(zero_copy_only=False)
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    keys = _keys_matrix(group["keys"], bands)[order]
    band = int(group["band"][0].as_py())
    if len(ids) > max_bucket:  # hot-bucket cap: deterministic min-id subset
        ids, keys = ids[:max_bucket], keys[:max_bucket]
    ai, bj = np.triu_indices(len(ids), k=1)
    keep = ids[ai] != ids[bj]
    ai, bj = ai[keep], bj[keep]
    if band > 0 and len(ai):
        # drop pairs that already collided in an earlier band
        earlier = (keys[ai, :band] == keys[bj, :band]).any(axis=1)
        ai, bj = ai[~earlier], bj[~earlier]
    return pa.table({
        "doc_a": pa.array(ids[ai], pa.int64()),
        "doc_b": pa.array(ids[bj], pa.int64()),
    })


def _sig_matrix(col, num_perm: int) -> np.ndarray:
    """Fixed-width binary signature column -> (n, num_perm) uint64 matrix,
    zero-copy from the Arrow data buffer."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, num_perm), dtype=np.uint64)
    import pyarrow.compute as pc

    col = pc.cast(col, pa.large_binary())
    bufs = col.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int64, count=n + 1,
                         offset=col.offset * 8)
    width = 8 * num_perm
    if not ((np.diff(offs) == width).all()):
        raise ValueError("signature column is not fixed-width")
    return np.frombuffer(bufs[2], dtype=np.uint64, count=n * num_perm,
                         offset=int(offs[0])).reshape(n, num_perm)


def _attach_est_jaccard(pairs_ds, sigs_ds, id_col: str, num_perm: int,
                        threshold: float, n_docs: int,
                        broadcast_limit: int = 200_000,
                        num_partitions: int | None = None):
    """Attach est_jaccard = mean-equal-positions of the two docs'
    signatures to candidate pairs, fully vectorized.

    Path switch (same pattern as stages/similarity.embedding_pairs):

    - ``n_docs <= broadcast_limit``: the pinned sig table is broadcast
      ONCE via ray.put as (sorted ids, (n, num_perm) uint64 matrix) —
      ~8*num_perm B/doc, 200 MB at the 200k default cap — and each pair
      batch scores with two searchsorted gathers + one matrix
      equality-mean.  No join, no extra shuffle.
    - beyond: two hash-partitioned joins attach sig_a/sig_b to the slim
      pairs (the corpus-scale sig table streams through the join keyed on
      the uniform doc id; pairs are the small side), then the same matrix
      scoring.
    """
    import ray

    if n_docs <= broadcast_limit:
        ids_list, mats = [], []
        for b in sigs_ds.iter_batches(batch_format="pyarrow"):
            ids_list.append(b[id_col].to_numpy(zero_copy_only=False))
            mats.append(_sig_matrix(b["sig"], num_perm))
        ids = np.concatenate(ids_list) if ids_list else np.empty(0, np.int64)
        mat = (np.vstack(mats) if mats
               else np.empty((0, num_perm), np.uint64))
        order = np.argsort(ids, kind="stable")
        ref = ray.put((ids[order], mat[order]))

        def _score(batch: pa.Table) -> pa.Table:
            s_ids, s_mat = ray.get(ref)
            a = batch["doc_a"].to_numpy(zero_copy_only=False)
            b = batch["doc_b"].to_numpy(zero_copy_only=False)
            ia = np.searchsorted(s_ids, a)
            ib = np.searchsorted(s_ids, b)
            est = (s_mat[ia] == s_mat[ib]).mean(axis=1)
            out = batch.append_column("est_jaccard",
                                      pa.array(est, pa.float64()))
            return out.filter(pa.array(est >= threshold))

        return pairs_ds.map_batches(_score, batch_format="pyarrow",
                                    zero_copy_batch=True)

    if num_partitions is None:
        num_partitions = max(
            2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    def _as_side(batch: pa.Table, side: str) -> pa.Table:
        return pa.table({f"doc_{side}": batch[id_col],
                         f"sig_{side}": batch["sig"]})

    sigs_a = sigs_ds.map_batches(lambda b: _as_side(b, "a"),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    sigs_b = sigs_ds.map_batches(lambda b: _as_side(b, "b"),
                                 batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = pairs_ds.join(sigs_a, "inner", num_partitions, on=("doc_a",))
    joined = joined.join(sigs_b, "inner", num_partitions, on=("doc_b",))

    def _score_joined(batch: pa.Table) -> pa.Table:
        ma = _sig_matrix(batch["sig_a"], num_perm)
        mb = _sig_matrix(batch["sig_b"], num_perm)
        est = (ma == mb).mean(axis=1) if len(batch) else np.empty(0)
        out = batch.select(["doc_a", "doc_b"]).append_column(
            "est_jaccard", pa.array(est, pa.float64()))
        return out.filter(pa.array(est >= threshold))

    return joined.map_batches(_score_joined, batch_format="pyarrow")


_TASK_STAGE_CACHE: dict = {}


def _cached_stage(cls, **kwargs):
    """Per-worker-process stage cache: lets cheap-state stages run as plain
    map_batches TASKS on Ray's reusable workers (construct-once per
    process) instead of an actor pool, which respawns processes on every
    dataset execution — ~2 s of spawn+import ahead of each query at pool
    size 8.  Expensive-state stages (models, big indexes) should still use
    the actor-pool class form."""
    key = (cls.__name__, tuple(sorted(kwargs.items())))
    if key not in _TASK_STAGE_CACHE:
        _TASK_STAGE_CACHE[key] = cls(**kwargs)
    return _TASK_STAGE_CACHE[key]


def minhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        num_perm: int = 128, bands: int = 16,
                        threshold: float = 0.5, max_bucket: int = 1000,
                        seed: int = 42, broadcast_limit: int = 200_000):
    """Near-duplicate candidate pairs (doc_a < doc_b, est_jaccard).

    shingle -> signature table (PINNED once: doc_id + 8*num_perm-byte sig)
    -> SLIM band rows (band, band_key, doc_id, 8*bands-byte key vector —
    ~148 B/row; round 2 carried the full 1 KB sig x ``bands`` rows through
    the sort, ~16 KB/doc of pure shuffle weight) -> sorted-bucket pair
    emit (one vectorized triu per bucket, lowest-matching-band only so
    multi-band duplicates never exist and no pair-dedupe exchange is
    needed) -> est_jaccard attach from the pinned sig table (broadcast
    gather under ``broadcast_limit`` docs, hash-partitioned joins beyond —
    ``_attach_est_jaccard``) -> threshold filter.
    """
    # signatures once, on reusable-worker tasks (cached stage)
    def _sig(batch: pa.Table) -> pa.Table:
        stage = _cached_stage(MinHashStage, id_col=id_col,
                              text_col=text_col, num_perm=num_perm,
                              seed=seed, bands=None)
        return stage(batch)

    sigs = ds.map_batches(_sig, batch_format="pyarrow",
                          batch_size=1024).materialize()
    n_docs = sigs.count()

    from ..kernels.hashing import band_key_matrix

    def _band_rows(batch: pa.Table) -> pa.Table:
        n = len(batch)
        sig_mat = _sig_matrix(batch["sig"], num_perm)
        keys = band_key_matrix(sig_mat, bands)  # (n, bands) uint64
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        # each row also carries its doc's full key vector (fixed binary,
        # 8*bands B) so buckets can suppress non-lowest-band pairs locally
        key_rows = np.repeat(keys.view(np.uint8).reshape(n, bands * 8),
                             bands, axis=0)
        keys_arr = pa.Array.from_buffers(
            pa.binary(bands * 8), n * bands,
            [None, pa.py_buffer(np.ascontiguousarray(key_rows).tobytes())])
        return pa.table({
            "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                             pa.int32()),
            "band_key": pa.array(keys.reshape(-1).view(np.int64),
                                 pa.int64()),
            id_col: pa.array(np.repeat(ids, bands)),
            "keys": keys_arr,
        })

    banded = sigs.map_batches(_band_rows, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs_slim(group, id_col, bands, max_bucket)

    from .sorted_groups import sorted_group_map

    pairs_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    pairs = sorted_group_map(banded, ["band", "band_key"], _pairs,
                             pairs_schema, min_group_size=2)
    return _attach_est_jaccard(pairs, sigs, id_col, num_perm, threshold,
                               n_docs, broadcast_limit=broadcast_limit)


# ------------------------------------------------------------------ simhash

class SimHashStage:
    """documents batch -> (doc_id, simhash int64-bitcast)."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col
        simhash64(["warm"])

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        sh = np.fromiter((simhash64((t or "").split()) for t in texts),
                         dtype=np.uint64, count=len(texts))
        return pa.table({
            self.id_col: batch[self.id_col],
            "simhash": pa.array(_as_i64(sh), pa.int64()),
        })


def simhash_dataset(ds, id_col: str = "doc_id", text_col: str = "text",
                    mode: str = "tasks"):
    if mode == "actors":
        return ds.map_batches(
            SimHashStage,
            fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
            batch_format="pyarrow", batch_size=1024,
            concurrency=(2, 8), num_cpus=1,
        )

    def _sig(batch: pa.Table) -> pa.Table:
        return _cached_stage(SimHashStage, id_col=id_col,
                             text_col=text_col)(batch)

    return ds.map_batches(_sig, batch_format="pyarrow", batch_size=1024)


def _band_rows64(ids: np.ndarray, hashes_u64: np.ndarray,
                 id_col: str) -> pa.Table:
    """(id, 64-bit hash) -> 4 slim band rows per item (16-bit exact band
    keys): any pair within Hamming distance 3 shares at least one band
    (pigeonhole), so bucket-local comparison finds all such pairs."""
    n = len(ids)
    out_band = np.repeat(np.arange(4, dtype=np.int32), n)
    out_key = np.empty(4 * n, dtype=np.int64)
    for b in range(4):
        out_key[b * n:(b + 1) * n] = (
            (hashes_u64 >> np.uint64(16 * b))
            & np.uint64(0xFFFF)).view(np.int64)
    return pa.table({
        "band": pa.array(out_band, pa.int32()),
        "band_key": pa.array(out_key, pa.int64()),
        id_col: pa.array(np.tile(ids, 4)),
        "h64": pa.array(np.tile(hashes_u64.view(np.int64), 4), pa.int64()),
    })


def _banded_hamming_pairs(banded, id_col: str, max_hamming: int,
                          max_bucket: int):
    """Band-bucketed all-pairs Hamming over _band_rows64 output."""
    if max_hamming > 3:
        raise ValueError("4x16-bit banding is complete only for "
                         "max_hamming <= 3 (pigeonhole)")

    def _pairs(group: pa.Table) -> pa.Table:
        from ..kernels.hashing import hamming_matrix64

        ids = group[id_col].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sh = group["h64"].to_numpy(zero_copy_only=False)[order]
        if len(ids) > max_bucket:
            ids, sh = ids[:max_bucket], sh[:max_bucket]
        # all-pairs Hamming in one xor outer + LUT popcount (the round-1
        # per-pair Python loop was O(m²) interpreter iterations per bucket)
        d = hamming_matrix64(sh.view(np.uint64))
        ai, bj = np.triu_indices(len(ids), k=1)
        keep = (d[ai, bj] <= max_hamming) & (ids[ai] != ids[bj])
        ai, bj = ai[keep], bj[keep]
        return pa.table({
            "doc_a": pa.array(ids[ai], pa.int64()),
            "doc_b": pa.array(ids[bj], pa.int64()),
            "hamming": pa.array(d[ai, bj], pa.int64()),
        })

    from .sorted_groups import sorted_group_map

    pairs_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("hamming", pa.int64())])
    pairs = sorted_group_map(banded, ["band", "band_key"], _pairs,
                             pairs_schema, min_group_size=2)
    # identical pair -> identical signatures -> identical hamming; keep one
    return dedup_rows_sorted(pairs, ["doc_a", "doc_b"])


def hamming_pairs_banded(ds, id_col: str = "doc_id",
                         hash_col: str = "h64",
                         max_hamming: int = 3, max_bucket: int = 1000):
    """GENERIC near-dup pairs over ANY 64-bit hash column (SimHash,
    image perceptual dHash, audio fingerprints...): 4x16-bit banding,
    bucket-local vectorized Hamming, same scale story as the SimHash
    chain — slim band rows, one keyed exchange, hot buckets capped."""
    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch[hash_col].to_numpy(zero_copy_only=False).view(np.uint64)
        return _band_rows64(ids, sh, id_col)

    banded = ds.map_batches(_bands, batch_format="pyarrow",
                            batch_size=1024)
    return _banded_hamming_pairs(banded, id_col, max_hamming, max_bucket)


def simhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        max_hamming: int = 3, max_bucket: int = 1000):
    """Pairs within Hamming distance ``max_hamming`` of 64-bit SimHash.

    Banding: 4 bands of 16 bits; any pair with d ≤ 3 shares ≥1 exact band
    (pigeonhole), so bucket-local comparison finds all such pairs.
    """
    def _sig_bands(batch: pa.Table) -> pa.Table:
        # fused signature+banding (one reusable-worker task stage)
        sig_tbl = _cached_stage(SimHashStage, id_col=id_col,
                                text_col=text_col)(batch)
        ids = sig_tbl[id_col].to_numpy(zero_copy_only=False)
        sh = sig_tbl["simhash"].to_numpy(
            zero_copy_only=False).view(np.uint64)
        return _band_rows64(ids, sh, id_col)

    banded = ds.map_batches(_sig_bands, batch_format="pyarrow",
                            batch_size=1024)
    return _banded_hamming_pairs(banded, id_col, max_hamming, max_bucket)


# -------------------------------------------------------- jaccard verify

def _score_pair_texts(batch: pa.Table, shingle_k: int,
                      min_jaccard: float) -> pa.Table:
    """(doc_a, doc_b, text_a, text_b) -> (doc_a, doc_b, jaccard).

    Jaccard is exact over the token-hash shingle sets (token hashes are
    head+tail sampled — see kernels/hashing.token_hashes for the residual
    collision class).  Shingle sets are cached per doc within the batch:
    a doc in many candidate pairs is shingled once."""
    a_ids = batch["doc_a"].to_pylist()
    b_ids = batch["doc_b"].to_pylist()
    a_tx = batch["text_a"].to_pylist()
    b_tx = batch["text_b"].to_pylist()
    jc = np.empty(len(a_ids), dtype=np.float64)
    cache: dict = {}

    def _sh(doc_id, text):
        if doc_id not in cache:
            cache[doc_id] = shingle_hashes((text or "").split(), k=shingle_k)
        return cache[doc_id]

    for i in range(len(a_ids)):
        jc[i] = jaccard(_sh(a_ids[i], a_tx[i]), _sh(b_ids[i], b_tx[i]))
    out = batch.select(["doc_a", "doc_b"]).append_column(
        "jaccard", pa.array(jc, pa.float64()))
    if min_jaccard > 0.0:
        import pyarrow.compute as pc
        out = out.filter(pc.greater_equal(out["jaccard"], min_jaccard))
    return out


def ngram_jaccard_verify_join(pairs_ds, docs_ds, id_col: str = "doc_id",
                              text_col: str = "text", shingle_k: int = 3,
                              min_jaccard: float = 0.0,
                              num_partitions: int | None = None,
                              broadcast_limit: int = 200_000):
    """Re-score candidate pairs with n-gram-set Jaccard.

    Path switch on corpus size (same discipline as
    ``beyond_broadcast_limit`` / ``_attach_est_jaccard``): at or below
    ``broadcast_limit`` docs the {id: text} lookup is broadcast once
    (``ray.put``, zero-copy read per task) and scoring is a single
    map_batches — the two join exchanges cost ~4 s of fixed aggregator
    spawn at toy scale.  Beyond it, the SCALE path: two hash-partitioned
    ``Dataset.join`` exchanges attach each side's text to the (slim)
    pairs rows — no driver-side corpus materialization, the corpus
    streams through the join shuffle keyed on doc id (uniform by
    construction).  ``broadcast_limit=0`` forces the join path (the
    parity test pins the two equal).  Aggregator count is sized to the
    cluster (oversubscribed hash-join actor pools deadlock small
    clusters — pipelines/rollup.py note).
    """
    import ray

    if broadcast_limit:
        docs_ds = docs_ds.materialize()  # consumed 1-2x below either way
        if docs_ds.count() <= broadcast_limit:
            lookup = {}
            for t in ray.get(docs_ds.to_arrow_refs()):
                lookup.update(zip(t[id_col].to_pylist(),
                                  t[text_col].to_pylist()))
            return ngram_jaccard_verify(pairs_ds, ray.put(lookup),
                                        shingle_k, min_jaccard)
    if num_partitions is None:
        # aggregator actors spawn per join; cap them by the cluster AND by
        # the candidate-pair volume (a handful of partitions moves tens of
        # thousands of slim pair rows fine — 16 actors × 2 joins of spawn
        # cost dominated the sf0.1 wall).  Pinning the pairs also keeps
        # the minhash chain from re-executing for the second join input.
        pairs_ds = pairs_ds.materialize()
        n_pairs = pairs_ds.count()
        cpu_cap = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
        num_partitions = int(min(cpu_cap, max(2, n_pairs // 25_000 + 2)))

    def _as_a(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch[id_col], "text_a": batch[text_col]})

    def _as_b(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_b": batch[id_col], "text_b": batch[text_col]})

    docs_a = docs_ds.map_batches(_as_a, batch_format="pyarrow",
                                 zero_copy_batch=True)
    docs_b = docs_ds.map_batches(_as_b, batch_format="pyarrow",
                                 zero_copy_batch=True)
    joined = pairs_ds.join(docs_a, "inner", num_partitions, on=("doc_a",))
    joined = joined.join(docs_b, "inner", num_partitions, on=("doc_b",))

    def _score(batch: pa.Table) -> pa.Table:
        return _score_pair_texts(batch, shingle_k, min_jaccard)

    return joined.map_batches(_score, batch_format="pyarrow")


def ngram_jaccard_verify(pairs_ds, docs_lookup_ref, shingle_k: int = 3,
                         min_jaccard: float = 0.0):
    """Broadcast variant of the jaccard verify (small corpus slices).

    ``docs_lookup_ref``: ray.ObjectRef of {doc_id: text} — broadcast once
    (ray.put), read zero-copy per task.  Valid while the candidate corpus
    slice fits the object store; ``ngram_jaccard_verify_join`` is the
    scale path (and the default in pipelines/queries.py).
    """

    def _verify(batch: pa.Table) -> pa.Table:
        import ray
        lookup = ray.get(docs_lookup_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        withtext = batch.select(["doc_a", "doc_b"])
        withtext = withtext.append_column(
            "text_a", pa.array([lookup.get(x) for x in a], pa.string()))
        withtext = withtext.append_column(
            "text_b", pa.array([lookup.get(x) for x in b], pa.string()))
        return _score_pair_texts(withtext, shingle_k, min_jaccard)

    return pairs_ds.map_batches(_verify, batch_format="pyarrow")


def exact_dup_pair_floor(pairs_ds, docs_ds, id_col: str = "doc_id",
                         text_col: str = "text",
                         num_partitions: int | None = None):
    """LSH recall-floor surface: candidate pairs whose two texts are
    BYTE-IDENTICAL — the subset of the LSH output that a SQL text-equality
    self-join can compute exactly.

    Exact duplicates have identical MinHash signatures, so a correct LSH
    chain must surface EVERY equal-text pair (hot-bucket-cap caveat in
    ``_bucket_pairs_slim``); equality with the oracle therefore pins the
    chain's recall floor — a dropped exact pair fails the row-count check,
    a phantom pair fails the hash check.

    Texts are compared by 16-byte blake2b FINGERPRINT, never shipped:
    the round-3 version joined full document texts through two shuffles
    (~2x the whole LSH chain's wall).  A 128-bit digest makes a phantom
    pair need a blake2b collision (~n^2 * 2^-128 — below any practical
    concern).  Lookup topology is the repo's gated switch: the
    doc-count-scale fingerprint table broadcasts under the
    ``collect_small`` gate (one ray.put, vectorized probe per batch);
    above it, two hash-partitioned ``Dataset.join``s on the slim
    (id, fp) rows — the web-scale path, pinned equal by tests."""
    import pyarrow.compute as pc

    import ray

    from .joins import attach_broadcast, collect_small

    def _fp(batch: pa.Table) -> pa.Table:
        import hashlib

        # NULL text -> NULL fp: SQL `a.text = b.text` never matches NULL,
        # and pc.equal(NULL, x) is NULL which Table.filter DROPS — so a
        # null-text doc can never form a phantom pair with another null
        # or empty text (matches the pre-fingerprint pc.equal semantics)
        fps = [None if t is None
               else hashlib.blake2b(t.encode("utf-8"),
                                    digest_size=16).digest()
               for t in batch[text_col].to_pylist()]
        return pa.table({id_col: batch[id_col],
                         "fp": pa.array(fps, pa.binary(16))})

    fp_ds = docs_ds.map_batches(_fp, batch_format="pyarrow",
                                zero_copy_batch=True)

    if num_partitions is None:
        try:
            lookup = collect_small(fp_ds)
        except ValueError:
            lookup = None
    else:
        lookup = None  # forced join path (tests pin it equal)

    if lookup is not None:
        la = pa.table({"doc_a": lookup[id_col], "fp_a": lookup["fp"]})
        lb = pa.table({"doc_b": lookup[id_col], "fp_b": lookup["fp"]})
        joined = attach_broadcast(
            attach_broadcast(pairs_ds, la, "doc_a", ["fp_a"]),
            lb, "doc_b", ["fp_b"])
    else:
        if num_partitions is None:
            pairs_ds = pairs_ds.materialize()
            n_pairs = pairs_ds.count()
            cpu_cap = max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)
            num_partitions = int(min(cpu_cap,
                                     max(2, n_pairs // 25_000 + 2)))

        def _as_a(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_a": batch[id_col], "fp_a": batch["fp"]})

        def _as_b(batch: pa.Table) -> pa.Table:
            return pa.table({"doc_b": batch[id_col], "fp_b": batch["fp"]})

        docs_a = fp_ds.map_batches(_as_a, batch_format="pyarrow",
                                   zero_copy_batch=True)
        docs_b = fp_ds.map_batches(_as_b, batch_format="pyarrow",
                                   zero_copy_batch=True)
        joined = pairs_ds.join(docs_a, "inner", num_partitions,
                               on=("doc_a",))
        joined = joined.join(docs_b, "inner", num_partitions,
                             on=("doc_b",))

    def _eq(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["fp_a"], batch["fp_b"])
        return batch.filter(keep).select(["doc_a", "doc_b"])

    return joined.map_batches(_eq, batch_format="pyarrow")


# ------------------------------------------------- passage-level dedup

def doc_gram_pairs(ds, window: int = 8, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Per-doc DISTINCT rolling-hash ``window``-word grams as slim
    (gram_h:uint64, id:int64) pairs — the shared map side of the
    passage-dedup and decontamination operators.  Tokens split on the
    exact whitespace class the SQL oracles use, hashed with blake2b-64
    (every byte), window-combined with a fixed polynomial."""
    import hashlib
    import re

    pat = re.compile(r"[ \t\n\r\f\v]+")  # EXACTLY the oracle's class
    base = np.uint64(1099511628211)
    powers = np.empty(window, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(1, window):
            powers[j] = powers[j - 1] * base

    def _grams(batch: pa.Table) -> pa.Table:
        blake = hashlib.blake2b
        ib = int.from_bytes
        ids_out, h_out = [], []
        for did, txt in zip(batch[id_col].to_pylist(),
                            batch[text_col].to_pylist()):
            toks = pat.split(txt or "")
            n = len(toks)
            if n < window:
                continue
            th = np.fromiter(
                (ib(blake(t.encode("utf-8"), digest_size=8).digest(),
                    "big") for t in toks),
                dtype=np.uint64, count=n)
            win = np.lib.stride_tricks.sliding_window_view(th, window)
            with np.errstate(over="ignore"):
                g = (win * powers[None, :]).sum(axis=1, dtype=np.uint64)
            g = np.unique(g)
            h_out.append(g)
            ids_out.append(np.full(g.size, did, np.int64))
        if not h_out:
            return pa.table({"gram_h": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64())})
        return pa.table({
            "gram_h": pa.array(np.concatenate(h_out), pa.uint64()),
            id_col: pa.array(np.concatenate(ids_out), pa.int64())})

    return ds.map_batches(_grams, batch_format="pyarrow",
                          zero_copy_batch=True)


def passage_dup_counts(ds, window: int = 8, id_col: str = "doc_id",
                       text_col: str = "text"):
    """Duplicated-PASSAGE detection (Lee et al. 2022's ExactSubstr idea at
    n-gram granularity): for every document, count its distinct
    ``window``-word windows that also appear in at least one OTHER
    document.  Suffix arrays do not distribute; fixed-width token
    windows do — and they bucket exactly like every other dedup family
    here:

    1. map side: each doc tokenizes (whitespace class mirrored by the
       SQL oracle's regexp_split_to_array), hashes tokens with blake2b-64
       (every byte hashed — no sampled-prefix collisions), rolls a
       polynomial window hash (vectorized sliding window), and emits its
       DISTINCT gram hashes as slim (gram_h, doc_id) pairs — 16 B/gram,
       never the gram text;
    2. ONE sorted_group_map over gram_h with a vectorized block kernel
       keeps rows of runs longer than 1 (gram shared by >= 2 docs — the
       pairs are per-doc distinct, so run length == distinct docs) and
       pre-counts per doc within the block;
    3. a final doc-keyed groupby sums the partial counts.

    Equal passages always collide (hash of equal token sequences is
    equal); distinct passages collide with ~2^-64 probability per pair
    (documented trade — the SQL oracle compares COUNT(DISTINCT gram
    STRING), bit-equal in practice).
    """
    import pyarrow.compute as pc

    from .sorted_groups import sorted_group_map

    pairs = doc_gram_pairs(ds, window, id_col, text_col)
    mid_schema = pa.schema([(id_col, pa.int64()), ("c", pa.int64())])

    def _dup_partial(batch: pa.Table) -> pa.Table:
        """Vectorized: keep rows of gram-runs >= 2, partial-count per doc."""
        n = len(batch)
        if n == 0:
            return mid_schema.empty_table()
        h = batch["gram_h"].to_numpy(zero_copy_only=False)
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = h[1:] != h[:-1]
        run_id = np.cumsum(changed) - 1
        run_len = np.bincount(run_id)
        keep = run_len[run_id] >= 2
        docs = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        if docs.size == 0:
            return mid_schema.empty_table()
        uids, counts = np.unique(docs, return_counts=True)
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "c": pa.array(counts, pa.int64())})

    partials = sorted_group_map(pairs, ["gram_h"], None, mid_schema,
                                block_fn=_dup_partial)
    summed = partials.groupby(id_col).sum("c")

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch[id_col],
            "n_dup_passages": pc.cast(batch["sum(c)"], pa.int64())})

    return summed.map_batches(_rename, batch_format="pyarrow")


def decontaminate_counts(corpus_ds, eval_ds, window: int = 8,
                         id_col: str = "doc_id", text_col: str = "text",
                         max_eval_grams: int = 50_000_000):
    """Eval-set DECONTAMINATION: per corpus document, the number of its
    distinct ``window``-word grams that appear anywhere in the eval set
    — the overlap count a pretraining pipeline thresholds on before a
    doc may enter the training corpus (e.g. Brown et al. 2020's 13-gram
    filtering).

    Eval sets are benchmark-scale (thousands of examples), so the eval
    side NEVER shuffles: its distinct gram hashes collect under a loud
    gate (8 B/gram — 50M grams = 400 MB ceiling), sort once, and ship
    via ONE ``ray.put``; every corpus batch then probes membership with
    a vectorized ``searchsorted``.  The corpus side is a stateless map
    over the slim (gram_h, doc) pairs — no exchange at all.  Docs with
    zero overlapping grams emit no row (the SQL GROUP BY contract)."""
    import ray

    from .joins import collect_small

    ev = doc_gram_pairs(eval_ds, window, id_col, text_col)

    def _just_grams(batch: pa.Table) -> pa.Table:
        g = np.unique(batch["gram_h"].to_numpy(zero_copy_only=False))
        return pa.table({"gram_h": pa.array(g, pa.uint64())})

    ev_tbl = collect_small(
        ev.map_batches(_just_grams, batch_format="pyarrow",
                       zero_copy_batch=True), max_rows=max_eval_grams)
    ev_grams = np.unique(ev_tbl["gram_h"].to_numpy(zero_copy_only=False))
    ref = ray.put(ev_grams)

    pairs = doc_gram_pairs(corpus_ds, window, id_col, text_col)
    out_schema = pa.schema([(id_col, pa.int64()),
                            ("n_contaminated", pa.int64())])

    def _probe(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        h = batch["gram_h"].to_numpy(zero_copy_only=False)
        docs = batch[id_col].to_numpy(zero_copy_only=False)
        if len(grams) == 0 or len(h) == 0:
            return out_schema.empty_table()
        pos = np.minimum(np.searchsorted(grams, h), len(grams) - 1)
        hit = grams[pos] == h
        docs = docs[hit]
        if docs.size == 0:
            return out_schema.empty_table()
        uids, counts = np.unique(docs, return_counts=True)
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "n_contaminated": pa.array(counts, pa.int64())},
                        schema=out_schema)

    partials = pairs.map_batches(_probe, batch_format="pyarrow",
                                 zero_copy_batch=True)
    import pyarrow.compute as pc

    summed = partials.groupby(id_col).sum("n_contaminated")
    return summed.map_batches(
        lambda t: pa.table({
            id_col: t[id_col],
            "n_contaminated": pc.cast(t["sum(n_contaminated)"],
                                      pa.int64())}),
        batch_format="pyarrow")


def decontaminate_fractions(corpus_ds, eval_ds, window: int = 8,
                            id_col: str = "doc_id",
                            text_col: str = "text",
                            keep_below: float = 0.05,
                            max_eval_grams: int = 50_000_000):
    """Contamination FRACTION per corpus doc — the metric pretraining
    filters actually threshold on (Brown et al. 2020 drop a doc when
    too much of it overlaps the eval set): distinct-gram overlap count
    divided by the doc's own distinct-gram count, plus the keep flag
    at ``keep_below``.  Same topology as :func:`decontaminate_counts`
    (eval grams broadcast once under the loud gate, corpus side a
    stateless map — no corpus exchange); the denominator rides the
    SAME probe pass as (doc, total, hits) partials, merged in one
    doc-keyed groupby.  Docs with zero grams emit no row."""
    import ray

    from .joins import collect_small

    ev = doc_gram_pairs(eval_ds, window, id_col, text_col)

    def _just_grams(batch: pa.Table) -> pa.Table:
        g = np.unique(batch["gram_h"].to_numpy(zero_copy_only=False))
        return pa.table({"gram_h": pa.array(g, pa.uint64())})

    ev_tbl = collect_small(
        ev.map_batches(_just_grams, batch_format="pyarrow",
                       zero_copy_batch=True), max_rows=max_eval_grams)
    ev_grams = np.unique(ev_tbl["gram_h"].to_numpy(zero_copy_only=False))
    ref = ray.put(ev_grams)

    pairs = doc_gram_pairs(corpus_ds, window, id_col, text_col)
    part_schema = pa.schema([(id_col, pa.int64()),
                             ("n_grams", pa.int64()),
                             ("n_contaminated", pa.int64())])

    def _probe(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        h = batch["gram_h"].to_numpy(zero_copy_only=False)
        docs = batch[id_col].to_numpy(zero_copy_only=False)
        if len(h) == 0:
            return part_schema.empty_table()
        if len(grams):
            pos = np.minimum(np.searchsorted(grams, h), len(grams) - 1)
            hit = (grams[pos] == h).astype(np.int64)
        else:
            hit = np.zeros(len(h), np.int64)
        uids, inv = np.unique(docs, return_inverse=True)
        tot = np.bincount(inv, minlength=len(uids))
        hits = np.bincount(inv, weights=hit,
                           minlength=len(uids)).astype(np.int64)
        return pa.table({id_col: pa.array(uids, pa.int64()),
                         "n_grams": pa.array(tot, pa.int64()),
                         "n_contaminated": pa.array(hits, pa.int64())},
                        schema=part_schema)

    partials = pairs.map_batches(_probe, batch_format="pyarrow",
                                 zero_copy_batch=True)
    import pyarrow.compute as pc

    from ..kernels.rounding import round6_tie_robust

    summed = partials.groupby(id_col).sum(["n_grams", "n_contaminated"])

    def _final(t: pa.Table) -> pa.Table:
        tot = pc.cast(t["sum(n_grams)"], pa.int64()).to_numpy(
            zero_copy_only=False)
        hits = pc.cast(t["sum(n_contaminated)"], pa.int64()).to_numpy(
            zero_copy_only=False)
        frac = round6_tie_robust(hits.astype(np.float64) / tot)
        return pa.table({
            id_col: t[id_col],
            "n_grams": pa.array(tot, pa.int64()),
            "n_contaminated": pa.array(hits, pa.int64()),
            "fraction": pa.array(frac, pa.float64()),
            "keep": pa.array(frac <= keep_below),
        })

    return summed.map_batches(_final, batch_format="pyarrow")
