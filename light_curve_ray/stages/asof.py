"""Distributed AS-OF join (time-series alignment).

The classic light-curve alignment operation — for every LEFT observation,
attach the latest RIGHT observation of the same series at or before its
timestamp (e.g. aligning two photometric bands, or joining events onto
the most recent reference reading).  Ray Data has no asof join; the
engine composes one from its own primitives:

1. both sides are harmonized onto one schema with a ``side`` tag (left
   rows carry NULL right-values and vice versa) — a zero-shuffle
   map_batches each;
2. ONE ``sorted_group_map`` over the series key co-locates each series
   (the same single all-to-all the gap-fill tail pays), with a
   vectorized ``block_fn``: per group, right rows are time-sorted and
   each left timestamp resolves with one ``np.searchsorted(side=
   "right") - 1`` — no per-row Python, no per-group Ray dispatch;
3. unmatched left rows (no right row at/before them) emit NULLs.

Partitioning assumption, documented per the build rules: the join is
keyed — each group must fit a worker's heap (same assumption as every
per-series kernel here).  An unkeyed asof (one global series) degrades
to a single group; range-partition by time and stitch the boundary if
that ever matters.

Tie semantics: equal right timestamps within a series are resolved by
LAST-in-sort-order; callers wanting determinism should pre-aggregate the
right side to one row per (key, ts) — the driver query does (MAX value),
matching DuckDB's ASOF JOIN on a unique right side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def asof_join(left_ds, right_ds, key_cols: list, ts_col: str,
              right_cols: list, suffix: str = "_r"):
    """left rows + latest right ``right_cols`` at ts'<=ts per key group.

    Returns a Dataset with the LEFT schema plus ``{c}{suffix}`` for each
    right column and ``{ts_col}{suffix}`` (the matched right timestamp);
    all NULL where a left row precedes every right row of its series.
    """
    sch = left_ds.schema()
    left_schema = pa.schema(list(zip(sch.names, sch.types)))
    left_value_fields = [(f.name, f.type) for f in left_schema
                         if f.name not in key_cols and f.name != ts_col]

    def _canonical(batch: pa.Table, side: int) -> pa.Table:
        """Both sides emit ONE canonical column order so union unifies."""
        n = len(batch)
        cols = {k: batch[k] for k in key_cols}
        cols[ts_col] = batch[ts_col]
        for name, typ in left_value_fields:
            cols[name] = (batch[name] if side == 0
                          else pa.nulls(n, typ))
        cols["__side"] = pa.array(
            np.full(n, side, dtype=np.int8), pa.int8())
        for c in right_cols:
            cols[f"__r_{c}"] = (pc.cast(batch[c], pa.float64())
                                if side == 1 else pa.nulls(n, pa.float64()))
        return pa.table(cols)

    tagged_left = left_ds.map_batches(
        lambda b: _canonical(b, 0), batch_format="pyarrow",
        zero_copy_batch=True)
    tagged_right = right_ds.map_batches(
        lambda b: _canonical(b, 1), batch_format="pyarrow",
        zero_copy_batch=True)
    both = tagged_left.union(tagged_right)

    out_fields = ([(f.name, f.type) for f in left_schema]
                  + [(f"{c}{suffix}", pa.float64()) for c in right_cols]
                  + [(f"{ts_col}{suffix}", left_schema.field(ts_col).type)])
    out_schema = pa.schema(out_fields)

    def _align(batch: pa.Table) -> pa.Table:
        """block_fn: every series in the sorted batch, vectorized."""
        from ..kernels.moments import _group_codes

        if len(batch) == 0:
            return out_schema.empty_table()
        inv, _ = _group_codes(batch, key_cols)
        ts = batch[ts_col].to_numpy(zero_copy_only=False)
        side = batch["__side"].to_numpy(zero_copy_only=False)
        # sort by (group, ts, RIGHT-first-at-equal-ts): asof is inclusive
        # (ts' <= ts), so a right row at the left row's exact timestamp
        # must sort BEFORE it and become visible to the prefix scan
        order = np.lexsort((1 - side, ts, inv))
        inv_s, ts_s, side_s = inv[order], ts[order], side[order]
        n_rows = len(order)
        changed = np.empty(n_rows, dtype=bool)
        changed[0] = True
        changed[1:] = inv_s[1:] != inv_s[:-1]
        run_of_row = np.cumsum(changed) - 1
        starts = np.nonzero(changed)[0]
        is_right = side_s == 1
        # latest right row at-or-before each position: one prefix max
        # (the gap-fill block kernel's propagation trick); a match from a
        # PREVIOUS group is rejected by the group-start bound below
        last_right = np.maximum.accumulate(
            np.where(is_right, np.arange(n_rows, dtype=np.int64), -1))
        left_pos = np.nonzero(~is_right)[0]
        li = last_right[left_pos]
        matched = li >= starts[run_of_row[left_pos]]
        src = np.where(matched, li, 0)
        take_left = pa.array(order[left_pos], pa.int64())
        cols = {}
        for f in left_schema:
            cols[f.name] = batch[f.name].take(take_left)
        mask = pa.array(~matched)
        take_right = pa.array(order[src], pa.int64())
        for c in right_cols:
            vals = batch[f"__r_{c}"].take(take_right)
            cols[f"{c}{suffix}"] = pc.if_else(mask, pa.nulls(
                len(left_pos), pa.float64()), pc.cast(vals, pa.float64()))
        rts = pa.array(ts_s[src], left_schema.field(ts_col).type)
        cols[f"{ts_col}{suffix}"] = pc.if_else(
            mask, pa.nulls(len(left_pos), left_schema.field(ts_col).type),
            rts)
        return pa.table(cols).cast(out_schema)

    from .sorted_groups import sorted_group_map

    return sorted_group_map(both, key_cols, None, out_schema,
                            block_fn=_align)
