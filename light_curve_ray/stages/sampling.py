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


def hash_sample(ds, id_col: str, sample_pct: int, salt: int = 1):
    """Keep a deterministic ~sample_pct% of rows by id hash — the
    reproducible corpus subsample (same rows at every cluster size)."""

    def _filter(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keep = hash_bucket(ids, salt) < sample_pct
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
