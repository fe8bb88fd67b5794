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
                     residual_block_cap: int = 16384):
    """Distributed per-group apply without per-group Ray dispatch.

    ``fn(group: pa.Table) -> pa.Table`` with schema ``out_schema``.
    ``min_group_size``: skip groups smaller than this without calling
    ``fn`` (e.g. 2 for pair-emission over LSH buckets, where singleton
    buckets — the vast majority — can produce nothing).

    Residual scale path: boundary rows are ≤2 groups per sorted block, so
    up to ``residual_block_cap`` blocks they collapse into ONE partition
    (cheapest).  Beyond that (web-scale block counts) the residual groups
    go through ``groupby(key).map_groups`` instead — Ray's per-group
    dispatch is acceptable there because the residual is a vanishing
    fraction of the groups, and a single partition would not be.
    """
    sorted_ds = ds.sort(key_cols).materialize()  # one exchange, two readers

    def _interior(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, key_cols)
        g = len(starts)
        outs = [fn(batch.slice(starts[i], ends[i] - starts[i]))
                for i in range(g)
                if 0 < i < g - 1 and ends[i] - starts[i] >= min_group_size]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

    def _boundary_rows(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return batch
        starts, ends = _runs(batch, key_cols)
        pieces = [batch.slice(0, ends[0])]
        if len(starts) > 1:
            pieces.append(batch.slice(starts[-1], len(batch) - starts[-1]))
        return pa.concat_tables(pieces)

    def _residual(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return out_schema.empty_table()
        starts, ends = _runs(batch, key_cols)
        outs = [fn(batch.slice(s, e - s)) for s, e in zip(starts, ends)
                if e - s >= min_group_size]
        if not outs:
            return out_schema.empty_table()
        return pa.concat_tables(outs)

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
            return fn(g)

        residual = boundary.groupby(key_cols).map_groups(
            _one_group, batch_format="pyarrow")
    return interior.union(residual)
