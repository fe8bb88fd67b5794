"""Distributed prefix sum (exclusive scan) — the parallel-primitives
classic, here because sequence PACKING needs it: assigning docs to
fixed-token-budget training examples is exactly "bucket every row by its
global running token total", an inherently sequential-looking dependency
with a two-pass parallel answer.

Topology (the textbook scan):

1. ONE keyed sort co-locates and orders the rows (the same exchange any
   global order costs);
2. first pass: each sorted block reduces to its LOCAL total — one tiny
   number per block;
3. the block totals (block-count-scale, i.e. thousands of values for a
   100 TB input) exclusive-scan on the driver;
4. second pass: each block adds its offset to its local cumsum — pure
   map, no further exchange.

Both passes run as Ray tasks over the sorted dataset's ordered block
refs (Ray Data has no native scan operator; the ordered-refs form IS
the standard implementation and keeps pass 2 embarrassingly parallel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def prefix_sum(ds, order_cols: list, value_col: str,
               out_col: str = "cum_excl"):
    """Sort by ``order_cols`` and append ``out_col`` = the EXCLUSIVE
    global prefix sum of ``value_col`` (int64) in that order."""
    import ray
    import ray.data as rd

    sorted_ds = ds.sort(order_cols).materialize()
    refs = sorted_ds.to_arrow_refs()  # ordered blocks of the sorted ds
    if not refs:
        sch = ds.schema()
        return rd.from_arrow(pa.schema(
            list(zip(sch.names, sch.types))
            + [(out_col, pa.int64())]).empty_table())

    @ray.remote
    def _block_total(tbl: pa.Table) -> int:
        if len(tbl) == 0:
            return 0
        return int(np.sum(
            tbl[value_col].to_numpy(zero_copy_only=False),
            dtype=np.int64))

    totals = ray.get([_block_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals[:-1])]).astype(
        np.int64)

    @ray.remote
    def _attach(tbl: pa.Table, offset: int) -> pa.Table:
        v = tbl[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cum = offset + np.cumsum(v) - v  # exclusive
        return tbl.append_column(out_col, pa.array(cum, pa.int64()))

    out_refs = [_attach.remote(r, int(off))
                for r, off in zip(refs, offsets)]
    return rd.from_arrow_refs(out_refs)


def pack_sequences(token_counts, id_col: str = "doc_id",
                   count_col: str = "n_tok", window: int = 2048):
    """Sequence packing: lay documents end-to-end in ``id_col`` order
    and cut fixed ``window``-token training examples — each doc gets
    (pack_id, pack_offset) from its exclusive running total.  Pure
    integer arithmetic on top of :func:`prefix_sum`; deterministic at
    any cluster size or block layout."""
    cum = prefix_sum(token_counts, [id_col], count_col)

    def _assign(batch: pa.Table) -> pa.Table:
        c = batch["cum_excl"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch[id_col],
            count_col: batch[count_col],
            "pack_id": pa.array(c // window, pa.int64()),
            "pack_offset": pa.array(c % window, pa.int64()),
        })

    return cum.map_batches(_assign, batch_format="pyarrow",
                           zero_copy_batch=True)
