"""Equi-join building blocks: broadcast dimension lookup + the gated
broadcast/partitioned switch for fact-to-fact joins.

The engine's join discipline (SURVEY §4): SMALL sides never shuffle —
they are ``ray.put`` once and looked up inside ``map_batches`` with
vectorized Arrow/numpy kernels (one object-store read per task, not per
batch re-ship).  Fact-to-fact joins above the broadcast gate use Ray
Data's hash-partitioned ``Dataset.join`` — one exchange per side on the
join key.  Callers pick per pipeline; the driver queries pin the two
paths equal on test data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def collect_small(ds, max_rows: int = 2_000_000) -> pa.Table:
    """Materialize a DIMENSION dataset into one Arrow table for
    broadcast.  Guarded: refuses to collect more than ``max_rows`` so a
    mis-sized fact table fails loudly instead of flooding the driver."""
    import ray

    ds = ds.materialize()
    n = ds.count()
    if n > max_rows:
        raise ValueError(
            f"collect_small: {n} rows exceeds the broadcast gate "
            f"({max_rows}); use the partitioned Dataset.join path")
    tables = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
    if not tables:
        sch = ds.schema()
        return pa.schema(list(zip(sch.names, sch.types))).empty_table()
    return pa.concat_tables(tables).combine_chunks()


def attach_broadcast(ds, lookup: pa.Table, key_col: str,
                     value_cols: list, how: str = "inner"):
    """Map-side hash join of ``ds`` against a broadcast lookup table.

    ``lookup`` is put in the object store ONCE; every task reads the ref
    (zero-copy) and resolves its batch's keys with one sorted
    ``np.searchsorted`` (int keys) — no shuffle, no per-batch re-ship.
    ``how``: 'inner' drops unmatched rows, 'left' nulls the value cols.
    The lookup's ``key_col`` must be unique (dimension-table contract;
    duplicated keys would silently pick one arbitrarily, so it raises).
    """
    import ray

    keys = lookup[key_col].to_numpy(zero_copy_only=False)
    order = np.argsort(keys, kind="stable")
    sorted_keys = keys[order]
    if sorted_keys.size and (sorted_keys[1:] == sorted_keys[:-1]).any():
        raise ValueError(f"attach_broadcast: duplicate {key_col} in lookup")
    take = pa.array(order, pa.int64())
    packed = pa.table(
        {key_col: pa.array(sorted_keys),
         **{c: lookup[c].take(take) for c in value_cols}})
    ref = ray.put(packed)

    def _attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        sk = lk[key_col].to_numpy(zero_copy_only=False)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        if len(sk) == 0:
            pos_c = np.zeros(len(batch), dtype=np.int64)
            matched = np.zeros(len(batch), dtype=bool)
        else:
            pos_c = np.minimum(np.searchsorted(sk, bk), len(sk) - 1)
            matched = sk[pos_c] == bk
        if how == "inner":
            keep = np.nonzero(matched)[0]
            batch = batch.take(pa.array(keep, pa.int64()))
            src = pa.array(pos_c[keep], pa.int64())
            for c in value_cols:
                batch = batch.append_column(c, lk[c].take(src))
            return batch
        src = pa.array(pos_c, pa.int64())
        mask = pa.array(~matched)
        for c in value_cols:
            vals = lk[c].take(src)
            if isinstance(vals, pa.ChunkedArray):
                vals = vals.combine_chunks()
            batch = batch.append_column(
                c, pc.if_else(mask, pa.nulls(len(batch), vals.type), vals))
        return batch

    return ds.map_batches(_attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def anti_join_broadcast(ds, key_col: str, block_keys):
    """Blocklist filter (LEFT ANTI join): drop every row whose key is in
    ``block_keys`` — the corpus-exclusion op (takedowns, contaminated
    sources, eval-set decontamination).

    The blocklist is the SMALL side by nature, so it never shuffles:
    deduplicated, sorted, ``ray.put`` once; each task resolves its batch
    with one vectorized ``np.searchsorted`` membership probe.  The fact
    side streams through a stateless map — no exchange at all.

    ``block_keys``: a Dataset with ``key_col``, or a numpy/int sequence.
    """
    import ray

    if hasattr(block_keys, "map_batches"):  # a Dataset
        tbl = collect_small(block_keys)
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
    else:
        keys = np.asarray(block_keys)
    blocked = np.unique(keys)  # sorted + dedup
    ref = ray.put(blocked)

    def _filter(batch: pa.Table) -> pa.Table:
        bl = ray.get(ref)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        if len(bl) == 0:
            return batch
        pos = np.minimum(np.searchsorted(bl, bk), len(bl) - 1)
        keep = bl[pos] != bk
        return batch.filter(pa.array(keep))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def semi_join_broadcast(ds, key_col: str, keep_keys):
    """LEFT SEMI join: keep exactly the rows whose key is in
    ``keep_keys`` — the winner-id corpus filter when the id set fits a
    broadcast (the partitioned ``Dataset.join`` in
    dedup.exact_dedup_filter is the web-scale path; this one trades its
    two-sided exchange for one ray.put + a stateless probe map when the
    keep-set is gate-small)."""
    import ray

    if hasattr(keep_keys, "map_batches"):  # a Dataset
        tbl = collect_small(keep_keys)
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
    else:
        keys = np.asarray(keep_keys)
    keep = np.unique(keys)
    ref = ray.put(keep)

    def _filter(batch: pa.Table) -> pa.Table:
        kk = ray.get(ref)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        if len(kk) == 0:
            return batch.slice(0, 0)
        pos = np.minimum(np.searchsorted(kk, bk), len(kk) - 1)
        return batch.filter(pa.array(kk[pos] == bk))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)
