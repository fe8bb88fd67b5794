"""Deterministic hash sampling & train/test splitting — the corpus
operators a training-data pipeline needs where `ds.random_sample` is the
WRONG tool: random sampling is neither reproducible across runs/cluster
sizes nor consistent per document (a re-crawled doc must land in the
same split every ingest, or train/test leak).

Everything here is a pure stateless `map_batches` projection/filter —
no shuffle, no state, no driver round-trip, embarrassingly scalable and
trivially resumable.  The hash is a Knuth multiplicative hash over the
document id (exact 32-bit arithmetic), chosen over a cryptographic
digest because it is expressible IN ANSI SQL (the driver's DuckDB
oracle reproduces every assignment bit-for-bit via HUGEINT arithmetic)
while still decorrelating the id's low bits from bucket boundaries.

    r1(id)        = (id * 2654435761) mod 2^32               (uint64-exact)
    r2(id, salt)  = xor(r1, (salt * 2654435769) mod 2^32)
    h(id, salt)   = (r2 * 2654435761) mod 2^32
    bucket        = h mod 100
    split         = train if bucket < train_pct else test
    sampled       = bucket(id, salt') < sample_pct            (independent)

The salt is injected by XOR BETWEEN two multiply rounds: a salt added
before a single multiply is just a constant offset of the hash (the
assignments at two such salts are perfectly correlated), while the
second multiply diffuses the xor'd bits across the word — measured
joint occupancy of two salted 50% samples is within 1% of 25%.
Different salts therefore give independent assignments (split vs
subsampling vs k-fold), all reproducible from the id alone.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_KNUTH = np.uint64(2654435761)
_GOLD = np.uint64(2654435769)
_MOD32 = np.uint64(4294967296)


def hash_bucket(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Vectorized 0..99 bucket per id — uint64-exact, SQL-mirrorable.

    Ids must be non-negative: the SQL mirror's ``%`` follows the
    dividend's sign (a negative id would produce a negative remainder
    there while the uint64 wrap here stays positive), so the contract
    fails LOUDLY rather than silently diverging."""
    if len(ids) and ids.min() < 0:
        raise ValueError("hash_bucket requires non-negative ids "
                         "(SQL % sign semantics diverge below 0)")
    r1 = (ids.astype(np.uint64) * _KNUTH) % _MOD32
    r2 = r1 ^ ((np.uint64(salt) * _GOLD) % _MOD32)
    h = (r2 * _KNUTH) % _MOD32
    return (h % np.uint64(100)).astype(np.int64)


def hash_bucket_sql(id_col: str, salt: int = 0) -> str:
    """The DuckDB mirror of :func:`hash_bucket` (HUGEINT keeps every
    product exact; mod 2^32 == the numpy uint64 wrap's low 32 bits)."""
    s = (salt * 2654435769) % 4294967296
    return (f"((xor(CAST({id_col} AS HUGEINT) * 2654435761 % 4294967296, "
            f"{s}) * 2654435761) % 4294967296) % 100")


def hash_bucket_fine(ids: np.ndarray, salt: int = 0,
                     mod: int = 1_000_000) -> np.ndarray:
    """hash_bucket at ppm granularity (0..mod-1) — for per-group RATE
    sampling where 1% steps are too coarse.  Same hash, same SQL-mirror
    contract (non-negative ids only)."""
    if len(ids) and ids.min() < 0:
        raise ValueError("hash_bucket_fine requires non-negative ids "
                         "(SQL % sign semantics diverge below 0)")
    r1 = (ids.astype(np.uint64) * _KNUTH) % _MOD32
    r2 = r1 ^ ((np.uint64(salt) * _GOLD) % _MOD32)
    h = (r2 * _KNUTH) % _MOD32
    return (h % np.uint64(mod)).astype(np.int64)


def hash_bucket_fine_sql(id_col: str, salt: int = 0,
                         mod: int = 1_000_000) -> str:
    """DuckDB mirror of :func:`hash_bucket_fine` (HUGEINT-exact)."""
    s = (salt * 2654435769) % 4294967296
    return (f"((xor(CAST({id_col} AS HUGEINT) * 2654435761 % 4294967296, "
            f"{s}) * 2654435761) % 4294967296) % {mod}")


def attach_split(ds, id_col: str, train_pct: int = 80,
                 split_col: str = "split", salt: int = 0):
    """Add a deterministic 'train'/'test' assignment column."""

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        b = hash_bucket(ids, salt)
        lab = np.where(b < train_pct, "train", "test")
        return batch.append_column(split_col, pa.array(lab, pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def mixture_sample(ds, id_col: str, group_col: str, scale: float = 8.0,
                   salt: int = 2):
    """Temperature-style corpus REWEIGHTING (the domain-mixture op:
    downsample head domains so the tail isn't drowned — inverse-sqrt
    frequency sampling, i.e. alpha=0.5 temperature without the
    normalization constant): every group keeps a deterministic
    rate = min(1, scale / sqrt(n_group)) of its rows by id hash.

    Two passes, both scale-safe: (1) per-group counts — slim map-side
    partials, one keyed exchange, result is GROUP-cardinality (domain
    scale, not row scale) so it broadcasts; (2) a stateless map-side
    filter: keep iff hash_bucket_fine(id) < floor(1e6 * rate).

    The threshold floor(scale*1e6 / sqrt(n)) uses only IEEE
    correctly-rounded ops (sqrt, one divide) in the SAME order as the
    DuckDB oracle's FLOOR(scale*1e6 / SQRT(n)), so assignments mirror
    bit-for-bit — same discipline as hash_bucket_sql."""
    import ray

    from .sorted_groups import sorted_group_map

    counts_schema = pa.schema([(group_col, pa.string()),
                               ("n", pa.int64())])

    def _count_partial(batch: pa.Table) -> pa.Table:
        g = batch.select([group_col]).group_by([group_col]).aggregate(
            [([], "count_all")])
        return g.rename_columns([group_col, "n"])

    def _count_merge(batch: pa.Table) -> pa.Table:
        from .sorted_groups import _runs

        if len(batch) == 0:
            return counts_schema.empty_table()
        starts, _ = _runs(batch, [group_col])
        idx = pa.array(starts, pa.int64())
        return pa.table({
            group_col: batch[group_col].take(idx),
            "n": pa.array(np.add.reduceat(
                batch["n"].to_numpy(zero_copy_only=False), starts)),
        }, schema=counts_schema)

    partials = ds.select_columns([group_col]).map_batches(
        _count_partial, batch_format="pyarrow", zero_copy_batch=True)
    from .joins import collect_small

    counts = collect_small(sorted_group_map(
        partials, [group_col], None, counts_schema,
        block_fn=_count_merge))

    groups = counts[group_col].to_pylist()
    n = counts["n"].to_numpy(zero_copy_only=False).astype(np.float64)
    thr = np.minimum(1e6, np.floor(scale * 1e6 / np.sqrt(n)))
    lut = dict(zip(groups, thr.astype(np.int64).tolist()))
    ref = ray.put(lut)

    def _filter(batch: pa.Table) -> pa.Table:
        m = ray.get(ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        fine = hash_bucket_fine(ids, salt)
        # dictionary-encode: Python touches only the UNIQUE group values
        enc = batch[group_col].combine_chunks().dictionary_encode()
        t_uniq = np.array([m.get(g, 0) for g in
                           enc.dictionary.to_pylist()], dtype=np.int64)
        t = t_uniq[enc.indices.to_numpy(zero_copy_only=False)]
        return batch.filter(pa.array(fine < t))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def hash_sample(ds, id_col: str, sample_pct: int, salt: int = 1):
    """Keep a deterministic ~sample_pct% of rows by id hash — the
    reproducible corpus subsample (same rows at every cluster size)."""

    def _filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = hash_bucket(ids, salt) < sample_pct
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
