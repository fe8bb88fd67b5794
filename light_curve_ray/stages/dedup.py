"""Deduplication stages: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Core training-data-pipeline operators built on the hashing kernels
(kernels/hashing.py — Broder MinHash, Charikar SimHash, banding LSH per
Leskovec-Rajaraman-Ullman MMDS ch.3; all deterministic uint64 arithmetic).

Scale design notes (the part the reference cannot seed — it is single
process — so this is engine design, SURVEY §2b "not built from reference"):

- **Exact dedup** is hash-partition + keyed aggregate: fingerprint each text
  (FNV-1a, 64-bit) in a stateless ``map_batches``, then
  ``groupby(fp).aggregate(Min(id), Count())`` — the shuffle moves only
  (fp, id) pairs, never the text.  One all-to-all on a uniform 64-bit key:
  no skew by construction.
- **MinHash LSH** is shingle → signature (actor pool; the permutation
  parameters are built once per actor) → band-key expansion (×``bands``
  rows, each carrying the 8·num_perm-byte signature so candidate scoring
  needs NO join back to the corpus — the signature payload is ~1KB/row,
  orders of magnitude under the document payload it replaces) → groupby
  band key → emit candidate pairs with signature-estimated Jaccard →
  groupby pair to dedupe multi-band hits.  Hot buckets (m docs in one
  bucket → m²/2 pairs) are capped at ``max_bucket`` docs with a
  deterministic min-id selection; at web scale an all-equal boilerplate
  cluster otherwise explodes quadratically.
- **SimHash** mirrors the MinHash topology with 16-bit bands of the 64-bit
  signature (any pair within Hamming distance d collides in ≥1 of 4 bands
  when d ≤ 3 by pigeonhole).
- **n-gram Jaccard verify** re-scores candidate pairs with exact shingle-set
  Jaccard.  The shingle sets are re-derived from a broadcast id → text
  lookup (``ray.put`` once, read per task) — valid while the *candidate*
  corpus slice fits the object store; the documented scale path is a
  hash-partitioned join of pairs against the corpus on doc id.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.hashing import (
    hamming64,
    jaccard,
    minhash_signatures_batch,
    shingle_hashes,
    simhash64,
)
from ..kernels.textkit import fnv1a64

_U64_TO_I64 = np.int64  # bitcast view for Arrow int64 keys


def _as_i64(u: np.ndarray) -> np.ndarray:
    return u.astype(np.uint64).view(np.int64)


# ------------------------------------------------------------------ exact

def add_fingerprint(batch: pa.Table, id_col: str = "doc_id",
                    text_col: str = "text") -> pa.Table:
    """(id, text, ...) -> (id, fp) — FNV-1a of whitespace-normalized text."""
    texts = batch[text_col].to_pylist()
    fp = np.fromiter(
        (fnv1a64(" ".join((t or "").split()).encode("utf-8")) for t in texts),
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


def dedup_rows_sorted(ds, key_cols: list):
    """Drop duplicate rows by ``key_cols``, keeping one row per key —
    the O10 pages dedup (same (url, warc_ts) re-crawled in overlapping
    dumps), scalable form.

    Same topology as the stats merge (stages/aggregate.merge_partials):
    sort by key (the one all-to-all), drop duplicates inside each sorted
    block vectorized, and resolve only each block's first/last key — the
    only keys that can straddle block boundaries — in a single tiny
    residual partition.  No per-group Python, no full-row groupby.
    """
    import pyarrow.compute as pc

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

    deduped = ds.sort(key_cols).map_batches(
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


# ------------------------------------------------------------------ minhash

class MinHashStage:
    """documents batch -> (doc_id, sig: fixed 8*num_perm bytes).

    Permutation parameters (a_i, b_i) are derived from ``seed`` once per
    actor in ``__init__`` — construct-once / apply-many.
    """

    def __init__(self, id_col: str = "doc_id", text_col: str = "text",
                 num_perm: int = 128, shingle_k: int = 3, seed: int = 42):
        self.id_col = id_col
        self.text_col = text_col
        self.num_perm = num_perm
        self.shingle_k = shingle_k
        self.seed = seed
        # warm the parameter cache (kernels derive a,b from seed each call;
        # cheap, but touching it here keeps first-batch latency flat)
        minhash_signatures_batch([np.array([1], dtype=np.uint64)],
                                 num_perm=num_perm, seed=seed)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        hash_sets = [shingle_hashes((t or "").split(), k=self.shingle_k)
                     for t in texts]
        sigs = minhash_signatures_batch(hash_sets, num_perm=self.num_perm,
                                        seed=self.seed)
        blobs = [sigs[i].tobytes() for i in range(len(texts))]
        return pa.table({
            self.id_col: batch[self.id_col],
            "sig": pa.array(blobs, pa.binary()),
        })


def _expand_bands(batch: pa.Table, bands: int, num_perm: int,
                  id_col: str) -> pa.Table:
    """(id, sig) -> bands rows of (band, band_key, id, sig), vectorized."""
    from ..kernels.hashing import band_key_matrix

    n = len(batch)
    ids = batch[id_col].to_numpy(zero_copy_only=False)
    sig_col = batch["sig"]
    if isinstance(sig_col, pa.ChunkedArray):
        sig_col = sig_col.combine_chunks()
    sig_list = sig_col.to_pylist()
    blob = b"".join(sig_list)
    sigs = np.frombuffer(blob, dtype=np.uint64).reshape(n, num_perm)
    keys = band_key_matrix(sigs, bands)  # (n, bands) uint64
    # NOTE: bytes must NOT round-trip through numpy ('S' dtype strips
    # trailing null bytes); repeat in Python, aligned with np.repeat(ids)
    rep_sigs = [b for b in sig_list for _ in range(bands)]
    return pa.table({
        "band": pa.array(np.tile(np.arange(bands, dtype=np.int32), n),
                         pa.int32()),
        "band_key": pa.array(keys.reshape(-1).view(np.int64), pa.int64()),
        id_col: pa.array(np.repeat(ids, bands)),
        "sig": pa.array(rep_sigs, pa.binary()),
    })


def _bucket_pairs(group: pa.Table, id_col: str, threshold: float,
                  max_bucket: int) -> pa.Table:
    """One LSH bucket -> candidate pairs with signature-estimated Jaccard."""
    ids = np.asarray(group[id_col].to_pylist())
    order = np.argsort(ids, kind="stable")
    ids = ids[order]
    sig_list = group["sig"].to_pylist()
    sigs = np.stack([np.frombuffer(sig_list[i], dtype=np.uint64)
                     for i in order])
    if len(ids) > max_bucket:  # hot-bucket cap: deterministic min-id subset
        ids, sigs = ids[:max_bucket], sigs[:max_bucket]
    a_out, b_out, est_out = [], [], []
    for i in range(len(ids) - 1):
        est = (sigs[i + 1:] == sigs[i][None, :]).mean(axis=1)
        keep = est >= threshold
        for j in np.nonzero(keep)[0]:
            a_out.append(ids[i])
            b_out.append(ids[i + 1 + j])
            est_out.append(est[i + 1 + j - (i + 1)])
    return pa.table({
        "doc_a": pa.array(a_out, pa.int64()),
        "doc_b": pa.array(b_out, pa.int64()),
        "est_jaccard": pa.array(np.asarray(est_out, dtype=np.float64),
                                pa.float64()),
    })


def minhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        num_perm: int = 128, bands: int = 16,
                        threshold: float = 0.5, max_bucket: int = 1000,
                        seed: int = 42):
    """Near-duplicate candidate pairs (doc_a < doc_b, est_jaccard).

    shingle -> minhash -> band -> sorted-bucket pair emit -> pair dedupe.
    """
    sigs = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col,
                                   num_perm=num_perm, seed=seed),
        batch_format="pyarrow", batch_size=1024,
        concurrency=(2, 8), num_cpus=1,
    )

    def _bands(batch: pa.Table) -> pa.Table:
        return _expand_bands(batch, bands, num_perm, id_col)

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        return _bucket_pairs(group, id_col, threshold, max_bucket)

    from .sorted_groups import sorted_group_map

    pairs_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("est_jaccard", pa.float64())])
    pairs = sorted_group_map(banded, ["band", "band_key"], _pairs,
                             pairs_schema, min_group_size=2)
    # a pair found in k bands appears k times with identical est; keep one
    return dedup_rows_sorted(pairs, ["doc_a", "doc_b"])


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


def simhash_dataset(ds, id_col: str = "doc_id", text_col: str = "text"):
    return ds.map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=1024,
        concurrency=(2, 8), num_cpus=1,
    )


def simhash_dedup_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        max_hamming: int = 3, max_bucket: int = 1000):
    """Pairs within Hamming distance ``max_hamming`` of 64-bit SimHash.

    Banding: 4 bands of 16 bits; any pair with d ≤ 3 shares ≥1 exact band
    (pigeonhole), so bucket-local comparison finds all such pairs.
    """
    sigs = simhash_dataset(ds, id_col, text_col)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sh = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(ids)
        out_band = np.repeat(np.arange(4, dtype=np.int32), n)
        out_key = np.empty(4 * n, dtype=np.int64)
        for b in range(4):
            out_key[b * n:(b + 1) * n] = (
                (sh >> np.uint64(16 * b)) & np.uint64(0xFFFF)).view(np.int64)
        return pa.table({
            "band": pa.array(out_band, pa.int32()),
            "band_key": pa.array(out_key, pa.int64()),
            id_col: pa.array(np.tile(ids, 4)),
            "simhash": pa.array(np.tile(sh.view(np.int64), 4), pa.int64()),
        })

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    def _pairs(group: pa.Table) -> pa.Table:
        ids = np.asarray(group[id_col].to_pylist())
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        sh = np.asarray(group["simhash"].to_pylist(), dtype=np.int64)[order]
        if len(ids) > max_bucket:
            ids, sh = ids[:max_bucket], sh[:max_bucket]
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids) - 1):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = hamming64(int(sh[i]) & (2**64 - 1),
                              int(sh[j]) & (2**64 - 1))
                if d <= max_hamming:
                    a_out.append(ids[i]); b_out.append(ids[j]); d_out.append(d)
        return pa.table({
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "hamming": pa.array(d_out, pa.int64()),
        })

    from .sorted_groups import sorted_group_map

    pairs_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                              ("hamming", pa.int64())])
    pairs = sorted_group_map(banded, ["band", "band_key"], _pairs,
                             pairs_schema, min_group_size=2)
    # identical pair -> identical signatures -> identical hamming; keep one
    return dedup_rows_sorted(pairs, ["doc_a", "doc_b"])


# -------------------------------------------------------- jaccard verify

def ngram_jaccard_verify(pairs_ds, docs_lookup_ref, shingle_k: int = 3,
                         min_jaccard: float = 0.0):
    """Re-score candidate pairs with EXACT n-gram-set Jaccard.

    ``docs_lookup_ref``: ray.ObjectRef of {doc_id: text} — broadcast once
    (ray.put), read zero-copy per task.  Scale path (corpus slice too big to
    broadcast): hash-partitioned join of pairs to the corpus on doc id.
    """

    def _verify(batch: pa.Table) -> pa.Table:
        import ray
        lookup = ray.get(docs_lookup_ref)
        a = batch["doc_a"].to_pylist()
        b = batch["doc_b"].to_pylist()
        jc = np.empty(len(a), dtype=np.float64)
        cache: dict = {}

        def _sh(d):
            if d not in cache:
                cache[d] = shingle_hashes((lookup.get(d) or "").split(),
                                          k=shingle_k)
            return cache[d]

        for i in range(len(a)):
            jc[i] = jaccard(_sh(a[i]), _sh(b[i]))
        out = batch.select(["doc_a", "doc_b"]).append_column(
            "jaccard", pa.array(jc, pa.float64()))
        if min_jaccard > 0.0:
            import pyarrow.compute as pc
            out = out.filter(pc.greater_equal(out["jaccard"], min_jaccard))
        return out

    return pairs_ds.map_batches(_verify, batch_format="pyarrow")
