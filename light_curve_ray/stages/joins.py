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


def attach_broadcast_multi(ds, lookup: pa.Table, key_col: str,
                           value_cols: list):
    """Map-side INNER join against a broadcast lookup that MAY hold
    duplicate keys: each fact row emits one output row per matching
    lookup row (run-length expansion, fully vectorized — two
    searchsorted calls give each key's match range, repeat/cumsum
    arithmetic builds both gather index arrays, two ``take``s finish).
    The multiplying sibling of attach_broadcast (which requires unique
    dimension keys); used by the skew-safe join's hot path, where the
    broadcast side is the hot-key minority of a FACT table."""
    import ray

    order = pc.sort_indices(lookup[key_col])
    packed = pa.table(
        {key_col: lookup[key_col].take(order),
         **{c: lookup[c].take(order) for c in value_cols}})
    ref = ray.put(packed.combine_chunks())

    def _attach(batch: pa.Table) -> pa.Table:
        lk = ray.get(ref)
        sk = lk[key_col].to_numpy(zero_copy_only=False)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        lo = np.searchsorted(sk, bk, side="left")
        hi = np.searchsorted(sk, bk, side="right")
        cnt = hi - lo
        total = int(cnt.sum())
        rows = np.repeat(np.arange(len(batch)), cnt)
        cum = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        lk_idx = np.repeat(lo - cum, cnt) + np.arange(total)
        out = batch.take(pa.array(rows, pa.int64()))
        src = pa.array(lk_idx, pa.int64())
        for c in value_cols:
            out = out.append_column(c, lk[c].take(src))
        return out

    return ds.map_batches(_attach, batch_format="pyarrow",
                          zero_copy_batch=True)


def join_skew_safe(fact, key_col: str, other, value_cols: list,
                   hot_k: int = 64, num_partitions: int = 16,
                   detect=None):
    """Skew-resistant INNER equi-join of two FACT tables on ``key_col``:
    the hash-partitioned ``Dataset.join`` sends every key to one
    partition, so one hot key (a viral URL, a bot user) turns the
    exchange into a single straggler.  This operator routes around it:

    1. DETECT — one Count-Min pass over the fact side's keys
       (stages/sketch.heavy_hitters_cms): the top ``hot_k`` keys by
       estimated count are the hot set.  Sketch-scale, no exchange;
       overestimates only promote extra keys to the hot path (routing,
       never correctness).
    2. ROUTE — hot-key rows on the ``other`` side are by definition a
       small minority per key count x hot_k keys; they collect under
       collect_small's loud gate and BROADCAST (attach_broadcast_multi
       multiplies per duplicate match).  Cold rows on both sides take
       the partitioned join, now free of the straggler keys.
    3. UNION of the two disjoint result streams.

    Correctness does not depend on the detector: hot/cold is a
    PARTITION of the key space, each side joins exactly once
    (parity-pinned against plain Dataset.join under forced skew in
    tests).  Cost: one extra sketch pass + a second read of each input
    for the route split (inputs are lazy re-reads of pruned parquet).
    ``detect`` optionally supplies a cheaper dataset for the sketch
    pass (e.g. a single-column pruned read of the fact's source,
    skipping the fact's own map stages); it must carry ``key_col``
    with the fact's key distribution."""
    from .sketch import heavy_hitters_cms

    if detect is None:
        detect = fact.select_columns([key_col])
    hot_tbl = collect_small(heavy_hitters_cms(
        detect.select_columns([key_col]), [key_col], k=hot_k))
    hot_keys = hot_tbl[key_col].to_numpy(zero_copy_only=False)

    other_proj = other.select_columns([key_col] + value_cols)
    other_hot = collect_small(
        semi_join_broadcast(other_proj, key_col, hot_keys))
    fact_hot = semi_join_broadcast(fact, key_col, hot_keys)
    hot_joined = attach_broadcast_multi(fact_hot, other_hot, key_col,
                                        value_cols)

    fact_cold = anti_join_broadcast(fact, key_col, hot_keys)
    # the other side joins UNFILTERED: fact_cold carries no hot keys,
    # so hot-key other rows match nothing — dropping the anti pass
    # saves one full read of `other` at identical semantics (the hot
    # rows it would remove are a per-key-count minority anyway)
    cold_joined = fact_cold.join(other_proj, "inner", num_partitions,
                                 on=(key_col,))
    return hot_joined.union(cold_joined)


def _membership_filter(ds, key_col: str, key_source, keep_members: bool):
    """Shared broadcast membership probe behind the SEMI and ANTI joins:
    the key set is deduplicated, sorted and ``ray.put`` ONCE; each task
    resolves its batch with one vectorized ``np.searchsorted``.  The
    fact side streams through a stateless map — no exchange at all."""
    import ray

    if hasattr(key_source, "map_batches"):  # a Dataset
        tbl = collect_small(key_source)
        keys = tbl[key_col].to_numpy(zero_copy_only=False)
    else:
        keys = np.asarray(key_source)
    members = np.unique(keys)  # sorted + dedup
    ref = ray.put(members)

    def _filter(batch: pa.Table) -> pa.Table:
        mm = ray.get(ref)
        bk = batch[key_col].to_numpy(zero_copy_only=False)
        if len(mm) == 0:
            return batch.slice(0, 0) if keep_members else batch
        pos = np.minimum(np.searchsorted(mm, bk), len(mm) - 1)
        hit = mm[pos] == bk
        return batch.filter(pa.array(hit if keep_members else ~hit))

    return ds.map_batches(_filter, batch_format="pyarrow",
                          zero_copy_batch=True)


def build_bloom(key_ds, key_col: str, n_hint: int, fpp: float = 0.01):
    """Distributed bloom-filter build over ``key_ds[key_col]``: each block
    hashes its keys (vectorized row hash) and scatters them into a local
    m-bit partial; partials OR-merge first in a DISTRIBUTED 8-way
    pre-merge pass, then the driver ORs the <=8 survivors — so the driver
    receives 8 x m/8 bytes regardless of block count (the same pre-merge
    discipline the rollup's fine-partials path uses).  Returns
    ``(bits, k, n_partial_blocks)``.

    Scale note: m is sized from ``n_hint`` distinct keys (1e9 keys at 1%
    fpp ~ 1.2 GB of bits) — at that size raise the pre-merge fan-in, not
    the driver's share.  The filter is a PREFILTER only; callers must
    exact-confirm survivors (false positives at rate fpp)."""
    import ray

    from ..kernels.bloom import bloom_add, bloom_empty, bloom_params
    from ..kernels.hashing import hash_columns_u64

    m_bits, k = bloom_params(n_hint, fpp)

    def _partial(batch: pa.Table) -> pa.Table:
        bits = bloom_empty(m_bits)
        bloom_add(bits, hash_columns_u64(batch, [key_col]), k)
        return pa.table({"bloom": pa.array([bits.tobytes()],
                                           pa.large_binary())})

    def _or_merge(batch: pa.Table) -> pa.Table:
        acc = bloom_empty(m_bits)
        for blob in batch["bloom"]:
            np.bitwise_or(acc, np.frombuffer(blob.as_py(), np.uint8),
                          out=acc)
        return pa.table({"bloom": pa.array([acc.tobytes()],
                                           pa.large_binary())})

    partials = key_ds.select_columns([key_col]).map_batches(
        _partial, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.repartition(8).map_batches(
        _or_merge, batch_format="pyarrow", zero_copy_batch=True)
    rows = [t for t in ray.get(merged.materialize().to_arrow_refs())
            if len(t)]
    bits = bloom_empty(m_bits)
    n_parts = 0
    for t in rows:
        n_parts += len(t)
        for blob in t["bloom"]:
            np.bitwise_or(bits, np.frombuffer(blob.as_py(), np.uint8),
                          out=bits)
    return bits, k, n_parts


def semi_join_bloom(fact_ds, fact_key: str, key_ds, key_col: str,
                    n_hint: int, fpp: float = 0.01,
                    confirm: str = "broadcast"):
    """LEFT SEMI join with a bloom-filter RUNTIME PREFILTER (the
    Spark/Impala runtime-filter pattern): the key side builds an m-bit
    bloom (see build_bloom), every fact block probes it map-side and
    drops non-members BEFORE any exchange, then the fpp-rate false
    positives are removed by an exact confirm over the survivors only.
    At 100 TB this is the difference between shuffling the whole fact
    table into the join and shuffling ~selectivity of it: the bloom is
    m bits (keys never ship), the probe is stateless and vectorized.

    ``confirm``: 'broadcast' resolves survivors against the exact key
    set via the gated broadcast membership probe (key set must pass
    collect_small's gate); 'join' uses the hash-partitioned
    ``Dataset.join`` — the web-scale path, exchanging only the
    prefiltered survivors.  Both pinned equal by tests.  Result is the
    EXACT semi-join either way (bloom has no false negatives)."""
    import ray

    from ..kernels.bloom import bloom_probe
    from ..kernels.hashing import hash_columns_u64

    bits, k, _ = build_bloom(key_ds, key_col, n_hint, fpp)
    ref = ray.put(bits)

    def _prefilter(batch: pa.Table) -> pa.Table:
        b = ray.get(ref)
        mask = bloom_probe(b, hash_columns_u64(batch, [fact_key]), k)
        return batch.filter(pa.array(mask))

    survivors = fact_ds.map_batches(_prefilter, batch_format="pyarrow",
                                    zero_copy_batch=True)
    if confirm == "join":
        # distinct keys via a keyed count (stays distributed — Dataset
        # .unique() would collect values to the driver), then the
        # partitioned join exchanges only the prefiltered survivors
        keys = (key_ds.select_columns([key_col]).groupby(key_col)
                .count().select_columns([key_col]))
        if key_col != fact_key:
            keys = keys.rename_columns({key_col: fact_key})
        return survivors.join(keys, "inner", 16, on=(fact_key,))
    if key_col != fact_key:
        key_ds = key_ds.select_columns([key_col]).rename_columns(
            {key_col: fact_key})
    return semi_join_broadcast(survivors, fact_key, key_ds)


def anti_join_broadcast(ds, key_col: str, block_keys):
    """Blocklist filter (LEFT ANTI join): drop every row whose key is in
    ``block_keys`` — the corpus-exclusion op (takedowns, contaminated
    sources, eval-set decontamination).  ``block_keys``: a Dataset with
    ``key_col``, or a numpy/int sequence.  See _membership_filter."""
    return _membership_filter(ds, key_col, block_keys,
                              keep_members=False)


def semi_join_broadcast(ds, key_col: str, keep_keys):
    """LEFT SEMI join: keep exactly the rows whose key is in
    ``keep_keys`` — the winner-id corpus filter when the id set fits a
    broadcast (the partitioned ``Dataset.join`` in
    dedup.exact_dedup_filter is the web-scale path).  See
    _membership_filter."""
    return _membership_filter(ds, key_col, keep_keys, keep_members=True)
