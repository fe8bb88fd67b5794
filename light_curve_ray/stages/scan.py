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

    # Ray's sort can emit EMPTY partition blocks with a degenerate
    # schema (no columns) on tiny inputs; normalize them to the real
    # output schema instead of indexing a missing column.
    sch = sorted_ds.schema()  # materialized -> no lazy re-execution
    out_schema = pa.schema(list(zip(sch.names, sch.types))
                           + [(out_col, pa.int64())])

    @ray.remote
    def _attach(tbl: pa.Table, offset: int) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
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


def chunk_stride_table(batch: pa.Table, id_col: str, text_col: str,
                       window: int, stride: int) -> pa.Table:
    """Context-window chunking with overlap, FULLY vectorized: split each
    doc into whitespace tokens (one RE2 C kernel), emit one chunk per
    ``stride`` tokens covering ``window`` tokens (the LLM-ingest
    long-doc splitter: window=W, stride<W overlaps chunks so no context
    is lost at boundaries).  No Python touches a row: the ragged token
    lists flatten once, all (chunk, token) gather indices are built with
    numpy repeat/cumsum arithmetic, one ``take`` gathers every chunk's
    tokens, and one ``binary_join`` re-joins them.  Stateless map —
    embarrassingly parallel, no exchange.

    Chunk count per doc: 1 + ceil(max(0, n_tok - window)/stride); docs
    with zero tokens emit nothing.  Output: id, chunk_idx, n_tokens,
    chunk (the joined text).
    """
    import pyarrow.compute as pc

    out_schema = pa.schema([
        (id_col, batch.schema.field(id_col).type),
        ("chunk_idx", pa.int64()), ("n_tokens", pa.int64()),
        ("chunk", pa.string()),
    ])
    if len(batch) == 0:
        return out_schema.empty_table()
    toks = pc.split_pattern_regex(
        batch[text_col].combine_chunks(), pattern=r"\s+")
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    n_tok = n_tok.astype(np.int64)
    n_chunks = np.where(
        n_tok == 0, 0,
        1 + -(-(np.maximum(0, n_tok - window)) // stride))
    total = int(n_chunks.sum())
    if total == 0:
        return out_schema.empty_table()
    # one output row per (doc, chunk)
    row = np.repeat(np.arange(len(batch)), n_chunks)
    first = np.concatenate([[0], np.cumsum(n_chunks[:-1])])
    cidx = np.arange(total) - np.repeat(first[n_chunks > 0],
                                        n_chunks[n_chunks > 0])
    start = cidx * stride
    clen = np.minimum(window, n_tok[row] - start)
    # gather every chunk's tokens from the flattened values in one take
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    tok0 = offs[row] + start  # flat index of each chunk's first token
    cum = np.concatenate([[0], np.cumsum(clen)])
    flat = np.repeat(tok0 - cum[:-1], clen) + np.arange(int(cum[-1]))
    gathered = toks.values.take(pa.array(flat, pa.int64()))
    if cum[-1] < 2**31:
        chunks_list = pa.ListArray.from_arrays(
            pa.array(cum, pa.int32()), gathered)
    else:  # >2B gathered tokens in one batch: large_list offsets
        chunks_list = pa.LargeListArray.from_arrays(
            pa.array(cum, pa.int64()), gathered)
    chunk_txt = pc.binary_join(chunks_list, " ")
    return pa.table({
        id_col: batch[id_col].take(pa.array(row, pa.int64())),
        "chunk_idx": pa.array(cidx, pa.int64()),
        "n_tokens": pa.array(clen, pa.int64()),
        "chunk": pc.cast(chunk_txt, pa.string()),
    }, schema=out_schema)


def chunk_stride(ds, id_col: str = "doc_id", text_col: str = "text",
                 window: int = 64, stride: int = 48):
    """Dataset wrapper over :func:`chunk_stride_table`."""
    return ds.map_batches(
        lambda t: chunk_stride_table(t, id_col, text_col, window, stride),
        batch_format="pyarrow", zero_copy_batch=True)
