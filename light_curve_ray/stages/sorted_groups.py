"""Generic sorted-group apply: the engine's replacement for
``groupby(keys).map_groups(fn)``.

Ray's ``map_groups`` dispatches one Python-level task call per group —
fine for hundreds of groups, pathological for millions (LSH buckets,
per-series kernels at web scale).  This utility uses the same topology as
the stats merge (stages/aggregate.merge_partials):

1. ``sort(key_cols)`` — the one all-to-all; equal keys become contiguous
   ACROSS the whole dataset, so a group that is not its block's first or
   last key lies entirely inside that block;
2. one ``map_batches`` pass per sorted block applies ``fn`` to each
   interior run (plain in-process calls, no Ray dispatch per group) and
   a second pass extracts the block's first/last runs untouched;
3. the extracted boundary rows — ≤ 2 groups per block — collapse into a
   single partition and get the same per-run apply.

``fn`` receives a ``pa.Table`` holding exactly one group's rows and
returns a ``pa.Table``; all outputs must share one schema, given as
``out_schema`` (used for empty blocks).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _runs(batch: pa.Table, key_cols: list):
    """(start, end) index pairs of the key-runs of a key-sorted block."""
    from ..kernels.moments import _group_codes

    n = len(batch)
    inv, _ = _group_codes(batch, key_cols)
    changed = np.empty(n, dtype=bool)
    changed[0] = True
    changed[1:] = inv[1:] != inv[:-1]
    starts = np.nonzero(changed)[0]
    ends = np.append(starts[1:], n)
    return starts, ends


def sorted_group_map(ds, key_cols: list, fn, out_schema: pa.Schema,
                     min_group_size: int = 1,
                     residual_block_cap: int = 16384,
                     driver_limit_rows: int = 2_000_000,
                     driver_limit_bytes: int = 256 << 20,
                     block_fn=None):
    """Distributed per-group apply without per-group Ray dispatch.

    ``fn(group: pa.Table) -> pa.Table`` with schema ``out_schema``.
    ``min_group_size``: skip groups smaller than this without calling
    ``fn`` (e.g. 2 for pair-emission over LSH buckets, where singleton
    buckets — the vast majority — can produce nothing).

    ``block_fn(batch: pa.Table) -> pa.Table`` (optional): a VECTORIZED
    whole-batch kernel applied to a key-sorted batch containing only
    whole groups, replacing the per-run ``fn`` loop entirely (one Python
    call per block instead of one per group — the gap-fill stage's
    multi-series kernel).  The kernel re-derives its own group runs and
    filtering; ``min_group_size`` must stay 1 with it.

    ``fn`` must not depend on row order WITHIN a group (sort internally if
    order matters — shape/interp kernels do): neither the distributed sort
    nor the in-process path guarantees non-key column order.

    Adaptive small-input path (same discipline as RollupConfig's
    driver_merge_limit / small_rollup_limit): at or below
    ``driver_limit_rows`` rows AND ``driver_limit_bytes`` bytes the SORT
    runs in-process — the distributed sort's fixed ~2 s of sampling +
    two-stage exchange dwarfs the work there (measured: the sf0.1 LSH
    chains spend ~40% of wall in it).  The per-group ``fn`` dispatch
    stays DISTRIBUTED either way: the sorted table is split into
    pool-sized chunks at group boundaries and applied via map_batches
    (an in-process fn loop serialized ~90k bucket calls the workers
    previously ran in parallel — measured 4× slower, not faster).  A
    web-scale input exceeds the gate and takes the sort path below.
    ``driver_limit_rows=0`` forces the distributed sort (tests pin the
    two paths equal).

    Trade, documented: when the gate is enabled the input is materialized
    BEFORE the size check (count/size_bytes need execution), so an
    over-gate input is transiently pinned alongside the sort's own
    shuffle blocks (~2× the streaming peak; the object store spills).
    Callers that know their input is web-scale should pass
    ``driver_limit_rows=0`` to keep the pure streaming topology.
    """
    if block_fn is not None and min_group_size != 1:
        raise ValueError("block_fn kernels implement their own group "
                         "filtering; min_group_size must be 1")

    def _apply_whole(batch: pa.Table) -> pa.Table:
        """Apply over a key-sorted batch containing only WHOLE groups."""
        if len(batch) == 0:
            return out_schema.empty_table()
        if block_fn is not None:
            return block_fn(batch)
        s_, e_ = _runs(batch, key_cols)
        outs = [fn(batch.slice(s, e - s))
                for s, e in zip(s_, e_)
                if e - s >= min_group_size]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    if driver_limit_rows:
        import ray
        import ray.data as rd

        ds = ds.materialize()
        if (ds.count() <= driver_limit_rows
                and (ds.size_bytes() or 0) <= driver_limit_bytes):
            tables = [t for t in ray.get(ds.to_arrow_refs()) if len(t)]
            if not tables:
                return rd.from_arrow(out_schema.empty_table())
            tbl = pa.concat_tables(tables).combine_chunks()
            tbl = tbl.sort_by([(c, "ascending") for c in key_cols])
            starts, _ = _runs(tbl, key_cols)
            slots = max(1, int(ray.cluster_resources().get("CPU", 8)) - 1)
            n_chunks = int(min(len(starts), 2 * slots))
            total = len(tbl)
            bounds = [0]
            for c in range(1, n_chunks):
                i = np.searchsorted(starts, c * total // n_chunks)
                if i >= len(starts):
                    break
                s = int(starts[i])
                if s > bounds[-1]:
                    bounds.append(s)
            bounds.append(total)
            pieces = [tbl.slice(b, e - b)
                      for b, e in zip(bounds[:-1], bounds[1:]) if e > b]
            return rd.from_arrow(pieces).map_batches(
                _apply_whole, batch_format="pyarrow", batch_size=None,
                zero_copy_batch=True)
    sorted_ds = ds.sort(key_cols).materialize()  # one exchange, two readers

    def _interior(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, key_cols)
        g = len(starts)
        if g <= 2:  # every run touches a block edge -> all residual
            return out_schema.empty_table()
        # interior rows = the contiguous whole-group span between the
        # first run's end and the last run's start
        return _apply_whole(batch.slice(ends[0], starts[g - 1] - ends[0]))

    def _boundary_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        starts, ends = _runs(batch, key_cols)
        pieces = [batch.slice(0, ends[0])]
        if len(starts) > 1:
            pieces.append(batch.slice(starts[-1], len(batch) - starts[-1]))
        return pa.concat_tables(pieces)

    def _residual(batch: pa.Table) -> pa.Table:
        return _apply_whole(batch)

    interior = sorted_ds.map_batches(
        _interior, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True)
    boundary = sorted_ds.map_batches(_boundary_rows, batch_format="pyarrow",
                                     batch_size=None, zero_copy_batch=True)
    if sorted_ds.num_blocks() <= residual_block_cap:
        residual = boundary.repartition(1).map_batches(
            _residual, batch_format="pyarrow", batch_size=None)
    else:
        def _one_group(g: pa.Table) -> pa.Table:
            if len(g) < min_group_size:
                return out_schema.empty_table()
            return block_fn(g) if block_fn is not None else fn(g)

        residual = boundary.groupby(key_cols).map_groups(
            _one_group, batch_format="pyarrow")
    return interior.union(residual)


def grouped_block_map(ds, key_cols: list, fn, out_schema: pa.Schema,
                      min_group_size: int = 1):
    """Per-group apply WITHOUT any exchange, for datasets whose blocks
    already contain only WHOLE groups — the output contract of
    ``sorted_group_map`` itself (interior blocks hold complete key runs;
    the residual partition holds complete boundary groups).  A pipeline
    that chains two per-group passes on the same key (gap-fill then
    Gorilla encode) pays ONE sort, not two: the second pass is a plain
    ``map_batches`` over the first pass's blocks.

    Caller contract (unchecked — cannot be validated locally): every
    group's rows live entirely inside one block.  ``fn`` must sort
    within the group itself if order matters, same as sorted_group_map.
    """
    def _apply(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        # blocks are not necessarily key-CLUSTERED (an fn may emit rows
        # in any order), so group by codes rather than assuming runs
        from ..kernels.moments import _group_codes

        inv, _ = _group_codes(batch, key_cols)
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        n = len(batch)
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = inv_s[1:] != inv_s[:-1]
        starts = np.nonzero(changed)[0]
        ends = np.append(starts[1:], n)
        sorted_batch = batch.take(pa.array(order, pa.int64()))
        outs = [fn(sorted_batch.slice(s, e - s))
                for s, e in zip(starts, ends) if e - s >= min_group_size]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    return ds.map_batches(_apply, batch_format="pyarrow", batch_size=None,
                          zero_copy_batch=True)
