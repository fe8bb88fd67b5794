"""Distributed mergeable-sketch stages: exact distinct count, HyperLogLog
distinct count, and mergeable quantiles — the "novel sketch" operator
family (kernels/sketch.py holds the pure kernels).

All three follow the engine's one-exchange discipline (SURVEY §4): a
map-side ``map_batches`` pass reduces each block to a SLIM per-(block,
key) partial — distinct rows, 2^p HLL register bytes, or a compressed
quantile summary — and ONE ``sorted_group_map`` over the group key
merges partials and finalizes.  Raw rows never shuffle; what crosses the
exchange is bounded per key (registers: 2^p bytes; quantile summary:
<= capacity values), so a 100 TB input moves only
O(n_blocks * n_keys_per_block) sketch rows.

Scale notes, per the build rules: the merge is keyed — one key's
partials (n_blocks_touching_key * sketch_size) must fit a worker's
heap.  At p=12 / capacity=2^16 that is ~4 KB / ~1 MB per partial; a key
touched by 10^4 blocks merges ~40 MB / streams through one group — salt
the partial pass (merge salted pre-merges first) if a deployment ever
exceeds that, the same two-level trick the moment rollup uses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.sketch import (hll_add_hashes, hll_estimate, hll_init,
                              qsummary_compress, qsummary_from_values,
                              qsummary_quantile)


def _key_fields(ds, key_cols):
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    return [(k, types[k]) for k in key_cols]


def distinct_count_exact(ds, key_cols: list, value_cols: list,
                         out_col: str = "n_distinct"):
    """EXACT distinct ``value_cols`` tuples per ``key_cols`` group.

    Map side: each block reduces to its distinct (key, value) rows (one
    dictionary-encode + np.unique — the _group_codes kernel), so the
    exchange carries at most the global distinct set, not the input.
    Reduce side: one sorted_group_map counts distinct value tuples per
    key group the same way.  Value comparison is on the REAL values
    (dictionary codes), not hashes — exact by construction.
    """
    from ..kernels.moments import _group_codes
    from .sorted_groups import sorted_group_map

    cols = key_cols + value_cols

    def _pre(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        if len(batch) == 0:
            return batch
        _, first = _group_codes(batch, cols)
        return batch.take(pa.array(np.sort(first), pa.int64()))

    slim = ds.map_batches(_pre, batch_format="pyarrow",
                          zero_copy_batch=True)
    out_schema = pa.schema(_key_fields(ds, key_cols)
                           + [(out_col, pa.int64())])

    def _count(group: pa.Table) -> pa.Table:
        _, first = _group_codes(group, value_cols)
        arrays = {k: group[k].slice(0, 1) for k in key_cols}
        arrays[out_col] = pa.array([len(first)], pa.int64())
        return pa.table(arrays).cast(out_schema)

    return sorted_group_map(slim, key_cols, _count, out_schema)


def hll_distinct(ds, key_cols: list, value_cols: list, p: int = 12,
                 out_col: str = "n_distinct_hll"):
    """Approximate distinct count per key via HyperLogLog registers.

    Map side: per block, per key, fold the row hashes into 2^p uint8
    registers (one vectorized pass per key run); the exchange carries
    2^p bytes per (block, key).  Reduce side: elementwise max of the
    register rows, then the classic estimator.  Deterministic: the row
    hash (kernels/hashing.hash_columns_u64) and the register fold are
    pure functions, so every merge order yields the same bytes.
    """
    from ..kernels.hashing import hash_columns_u64
    from ..kernels.moments import _group_codes
    from .sorted_groups import sorted_group_map

    m = 1 << p

    def _partial(batch: pa.Table) -> pa.Table:
        sel = batch.select(key_cols + value_cols)
        n = len(sel)
        if n == 0:
            return pa.table(
                {**{k: sel[k] for k in key_cols},
                 "__regs": pa.array([], pa.binary())})
        inv, first = _group_codes(sel, key_cols)
        hashes = hash_columns_u64(sel, value_cols)
        order = np.argsort(inv, kind="stable")
        inv_s = inv[order]
        h_s = hashes[order]
        bounds = np.concatenate(
            [[0], np.nonzero(inv_s[1:] != inv_s[:-1])[0] + 1, [n]])
        regs_rows = []
        for s, e in zip(bounds[:-1], bounds[1:]):
            regs = hll_init(p)
            hll_add_hashes(regs, h_s[s:e], p)
            regs_rows.append(regs.tobytes())
        arrays = {k: sel[k].take(pa.array(first, pa.int64()))
                  for k in key_cols}
        arrays["__regs"] = pa.array(regs_rows, pa.binary())
        return pa.table(arrays)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema(_key_fields(ds, key_cols)
                           + [(out_col, pa.float64())])

    def _merge(group: pa.Table) -> pa.Table:
        blobs = group["__regs"].to_pylist()
        mat = np.frombuffer(b"".join(blobs),
                            dtype=np.uint8).reshape(len(blobs), m)
        est = hll_estimate(mat.max(axis=0))
        arrays = {k: group[k].slice(0, 1) for k in key_cols}
        arrays[out_col] = pa.array([est], pa.float64())
        return pa.table(arrays).cast(out_schema)

    return sorted_group_map(partials, key_cols, _merge, out_schema)


def quantile_by_key(ds, key_cols: list, value_col: str, qs: list,
                    names: list, capacity: int = 1 << 16):
    """Mergeable quantiles of ``value_col`` per key group.

    Map side: per block, per key, a compressed summary (<= capacity
    sorted values + exact cumulative weights).  Reduce side: all of a
    key's summaries merge in ONE sorted concat + single compression,
    then linear-interpolated quantiles.  EXACT (== SQL quantile_cont)
    whenever a key's per-block totals stay under capacity — rank error
    <= W/capacity per compression otherwise.  ``names[i]`` is the output
    column for quantile ``qs[i]``.
    """
    if len(qs) != len(names):
        raise ValueError("qs and names must pair up")
    if capacity < 4:
        raise ValueError("capacity must be >= 4")
    from ..kernels.moments import _group_codes
    from .sorted_groups import sorted_group_map

    def _partial(batch: pa.Table) -> pa.Table:
        sel = batch.select(key_cols + [value_col])
        n = len(sel)
        if n == 0:
            return pa.table(
                {**{k: sel[k] for k in key_cols},
                 "__qv": pa.array([], pa.list_(pa.float64())),
                 "__qw": pa.array([], pa.list_(pa.int64()))})
        inv, first = _group_codes(sel, key_cols)
        vals = sel[value_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        order = np.argsort(inv, kind="stable")
        inv_s, v_s = inv[order], vals[order]
        bounds = np.concatenate(
            [[0], np.nonzero(inv_s[1:] != inv_s[:-1])[0] + 1, [n]])
        qv, qw = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            sv, sw = qsummary_from_values(v_s[s:e], capacity)
            qv.append(sv)
            qw.append(sw)
        arrays = {k: sel[k].take(pa.array(first, pa.int64()))
                  for k in key_cols}
        arrays["__qv"] = pa.array(qv, pa.list_(pa.float64()))
        arrays["__qw"] = pa.array(qw, pa.list_(pa.int64()))
        return pa.table(arrays)

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)
    out_schema = pa.schema(_key_fields(ds, key_cols)
                           + [(nm, pa.float64()) for nm in names])
    q_arr = np.asarray(qs, dtype=np.float64)

    def _merge(group: pa.Table) -> pa.Table:
        vs = group["__qv"].to_pylist()
        ws = group["__qw"].to_pylist()
        v = np.concatenate([np.asarray(x, dtype=np.float64) for x in vs])
        w = np.concatenate([np.asarray(x, dtype=np.int64) for x in ws])
        order = np.argsort(v, kind="stable")
        v, w = qsummary_compress(v[order], w[order], capacity)
        quants = qsummary_quantile(v, w, q_arr)
        arrays = {k: group[k].slice(0, 1) for k in key_cols}
        for nm, val in zip(names, quants):
            arrays[nm] = pa.array([float(val)], pa.float64())
        return pa.table(arrays).cast(out_schema)

    return sorted_group_map(partials, key_cols, _merge, out_schema)


def heavy_hitters_cms(ds, value_cols: list, k: int = 10,
                      depth: int = 4, width: int = 8192,
                      candidates_per_block: int = 64,
                      max_blobs: int = 100_000):
    """Global top-k heavy hitters from a Count-Min sketch + block-local
    candidate tracking — the frequent-items op at a cardinality where an
    exact groupby would be its own wide shuffle.

    One pass over the input; each block emits (a) its local top
    ``candidates_per_block`` values by exact local count — a true heavy
    hitter is a local heavy hitter in SOME block, and k << the combined
    candidate pool — and (b) ONE depth*width int64 CMS blob.  CMS is a
    LINEAR sketch (merge = elementwise add), so the blobs sum in any
    order; final estimates take min over rows (one-sided: never an
    undercount).  The reduce side is sketch-scale (blobs: O(blocks),
    candidates: O(blocks*candidates)) and collects under a loud gate —
    the cluster-scale path is the same sum as a tree reduce.

    Returns (value_cols..., est_count:int64, rn:int64), top-k by
    (est DESC, values ASC) — deterministic.  Rows-only driver check
    (estimates are sketch-valued); exactness/overestimate/merge
    invariance are unit-test oracles."""
    import ray

    from ..kernels.hashing import hash_columns_u64
    from ..kernels.moments import _group_codes
    from ..kernels.sketch import cms_add, cms_init, cms_query

    def _partial(batch: pa.Table) -> pa.Table:
        sel = batch.select(value_cols)
        n = len(sel)
        empty_blob = pa.array([], pa.binary())
        if n == 0:
            return pa.table({**{c: sel[c] for c in value_cols},
                             "__n_local": pa.array([], pa.int64()),
                             "__cms": empty_blob})
        inv, first = _group_codes(sel, value_cols)
        counts = np.bincount(inv)
        sketch = cms_init(depth, width)
        cms_add(sketch, hash_columns_u64(sel, value_cols))
        top = np.argsort(-counts, kind="stable")[:candidates_per_block]
        idx = pa.array(np.asarray(first)[top], pa.int64())
        arrays = {c: sel[c].take(idx) for c in value_cols}
        arrays["__n_local"] = pa.array(counts[top], pa.int64())
        # the blob rides on the block's first candidate row only
        blob = [sketch.tobytes()] + [None] * (len(top) - 1)
        arrays["__cms"] = pa.array(blob, pa.binary())
        return pa.table(arrays)

    from .joins import collect_small

    partials = collect_small(
        ds.map_batches(_partial, batch_format="pyarrow",
                       zero_copy_batch=True), max_rows=max_blobs)

    sketch = cms_init(depth, width)
    for blob in partials["__cms"].to_pylist():
        if blob is not None:
            sketch += np.frombuffer(blob, dtype=np.int64).reshape(
                depth, width)
    cand = partials.select(value_cols).group_by(value_cols).aggregate([])
    est = cms_query(sketch, hash_columns_u64(cand, value_cols))
    order = np.lexsort(tuple(
        np.asarray(cand[c].to_pylist())
        for c in reversed(value_cols)) + (-est,))[:k]
    idx = pa.array(order, pa.int64())
    out = {c: cand[c].take(idx) for c in value_cols}
    out["est_count"] = pa.array(est[order], pa.int64())
    out["rn"] = pa.array(np.arange(1, len(order) + 1), pa.int64())
    import ray.data as rd

    return rd.from_arrow(pa.table(out))
