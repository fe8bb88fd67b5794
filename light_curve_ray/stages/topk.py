"""Grouped top-k: the k best rows of every key group with a
deterministic ROW_NUMBER-style rank.

Two-level, like every order statistic here: each block keeps only its
own per-key top-k candidates (vectorized lexsort + run-limited take —
at most k rows per key LEAVE the block, so the exchange carries
O(k * keys * blocks) slim rows, never the fact table), then ONE
``sorted_group_map`` over the key re-ranks the survivors.  Ties in the
order column resolve by ``tiebreak_col`` ascending (then nothing — the
caller must supply a unique tie-break, same contract as SQL
ROW_NUMBER with a fully-specified ORDER BY; enforced per-group).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def top_k_by_key(ds, key_cols: list, order_col: str, k: int,
                 tiebreak_col: str, descending: bool = True,
                 rank_col: str = "rn"):
    """k best rows per key group + a 1-based ``rank_col``."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    carried = [c for c in sch.names]
    out_schema = pa.schema([(c, types[c]) for c in carried]
                          + [(rank_col, pa.int64())])

    def _sort_keys(batch: pa.Table):
        v = batch[order_col].to_numpy(zero_copy_only=False).astype(
            np.float64)
        t = batch[tiebreak_col].to_numpy(zero_copy_only=False)
        return (-v if descending else v), t

    def _partial(batch: pa.Table) -> pa.Table:
        from ..kernels.moments import _group_codes

        n = len(batch)
        if n == 0:
            return batch
        inv, _ = _group_codes(batch, key_cols)
        v, t = _sort_keys(batch)
        order = np.lexsort((t, v, inv))
        inv_s = inv[order]
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = inv_s[1:] != inv_s[:-1]
        starts = np.nonzero(changed)[0]
        run = np.cumsum(changed) - 1
        within = np.arange(n) - starts[run]
        keep = order[within < k]
        return batch.take(pa.array(np.sort(keep), pa.int64()))

    partials = ds.map_batches(_partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def _final(group: pa.Table) -> pa.Table:
        v, t = _sort_keys(group)
        if t.size > 1:
            ts = np.sort(t)
            if (ts[1:] == ts[:-1]).any():
                raise ValueError(
                    f"top_k_by_key: {tiebreak_col} not unique in a "
                    "group — rank would be nondeterministic")
        order = np.lexsort((t, v))[:k]
        out = group.take(pa.array(order, pa.int64()))
        return out.append_column(
            rank_col, pa.array(np.arange(1, len(order) + 1), pa.int64()))

    from .sorted_groups import sorted_group_map

    return sorted_group_map(partials, key_cols, _final, out_schema)
