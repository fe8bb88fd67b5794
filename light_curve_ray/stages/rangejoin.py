"""Distributed keyed RANGE (interval) join.

For every point row (key, ts, ...) emit one output row per interval row
(key, start, end, ...) of the same key group whose interval contains the
point's timestamp — the time-series companion to the AS-OF join
(stages/asof.py): asof answers "latest right row at-or-before", range
answers "ALL right intervals covering".  Ray Data has no non-equi join;
the engine composes one from its own primitives:

1. both sides are harmonized onto one tagged schema (points carry NULL
   interval columns and vice versa) — a zero-shuffle map_batches each;
2. ONE ``sorted_group_map`` over the join key co-locates each group (the
   same single all-to-all the gap-fill tail pays);
3. per group, points are time-sorted once and every interval resolves to
   a contiguous point span with two ``np.searchsorted`` calls; the pair
   fan-out is emitted with the vectorized repeat/offset gather (no
   per-pair Python).

Interval semantics: half-open ``start <= ts < end`` by default
(``closed="left"``), matching SQL ``ts >= start AND ts < end``;
``closed="both"`` gives BETWEEN semantics.  Output is an INNER join:
points covered by no interval vanish, intervals covering no points emit
nothing; a point covered by k intervals appears k times.

Partitioning assumption, documented per the build rules: the join is
keyed — each key group must fit a worker's heap (the same assumption as
every per-series kernel here).  An unkeyed range join (one global group)
degrades to a single group; range-partition by time with intervals
replicated to every bucket they overlap if that ever matters — the
bucket width must then be >= the maximum interval length so each pair is
discovered in at least one bucket, with lowest-bucket pair suppression
for dedup (the embedding-LSH banding uses the same trick,
stages/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def range_join(points_ds, intervals_ds, key_cols: list, ts_col: str,
               start_col: str, end_col: str, point_cols: list,
               interval_cols: list, closed: str = "left",
               suffix: str = "_iv"):
    """Inner keyed interval join; see module docstring.

    Output schema: ``key_cols + [ts_col] + point_cols + [start_col,
    end_col] + interval_cols`` — interval payload columns keep their
    names unless they collide with a point-side output name, in which
    case they get ``suffix``.
    """
    if closed not in ("left", "both"):
        raise ValueError(f"closed must be 'left' or 'both', got {closed!r}")
    p_sch = points_ds.schema()
    i_sch = intervals_ds.schema()
    p_types = dict(zip(p_sch.names, p_sch.types))
    i_types = dict(zip(i_sch.names, i_sch.types))
    ts_type = p_types[ts_col]

    left_names = set(key_cols) | {ts_col} | set(point_cols)
    iv_out_names = {c: (f"{c}{suffix}" if c in left_names else c)
                    for c in interval_cols}

    def _tag_points(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {k: batch[k] for k in key_cols}
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8), pa.int8())
        cols["__ts"] = pc.cast(batch[ts_col], ts_type)
        cols["__start"] = pa.nulls(n, ts_type)
        cols["__end"] = pa.nulls(n, ts_type)
        for c in point_cols:
            cols[f"__p_{c}"] = batch[c]
        for c in interval_cols:
            cols[f"__i_{c}"] = pa.nulls(n, i_types[c])
        return pa.table(cols)

    def _tag_intervals(batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols = {k: batch[k] for k in key_cols}
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8), pa.int8())
        cols["__ts"] = pa.nulls(n, ts_type)
        cols["__start"] = pc.cast(batch[start_col], ts_type)
        cols["__end"] = pc.cast(batch[end_col], ts_type)
        for c in point_cols:
            cols[f"__p_{c}"] = pa.nulls(n, p_types[c])
        for c in interval_cols:
            cols[f"__i_{c}"] = batch[c]
        return pa.table(cols)

    tagged = points_ds.map_batches(
        _tag_points, batch_format="pyarrow", zero_copy_batch=True).union(
        intervals_ds.map_batches(
            _tag_intervals, batch_format="pyarrow", zero_copy_batch=True))

    out_fields = ([(k, p_types[k]) for k in key_cols]
                  + [(ts_col, ts_type)]
                  + [(c, p_types[c]) for c in point_cols]
                  + [(start_col, ts_type), (end_col, ts_type)]
                  + [(iv_out_names[c], i_types[c]) for c in interval_cols])
    out_schema = pa.schema(out_fields)
    end_side = "left" if closed == "left" else "right"

    def _one_group(g: pa.Table) -> pa.Table:
        side = g["__side"].to_numpy(zero_copy_only=False)
        p_rows = np.nonzero(side == 0)[0]
        i_rows = np.nonzero(side == 1)[0]
        if len(p_rows) == 0 or len(i_rows) == 0:
            return out_schema.empty_table()
        ts = g["__ts"].to_numpy(zero_copy_only=False)[p_rows]
        order_p = np.argsort(ts, kind="stable")
        ts_s = ts[order_p]
        start = g["__start"].to_numpy(zero_copy_only=False)[i_rows]
        end = g["__end"].to_numpy(zero_copy_only=False)[i_rows]
        lo = np.searchsorted(ts_s, start, side="left")
        hi = np.searchsorted(ts_s, end, side=end_side)
        counts = hi - lo
        np.maximum(counts, 0, out=counts)
        total = int(counts.sum())
        if total == 0:
            return out_schema.empty_table()
        # vectorized pair fan-out: interval j repeats counts[j] times,
        # its points are the contiguous sorted span [lo[j], hi[j])
        rep = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        within = (np.arange(total, dtype=np.int64)
                  - np.repeat(np.cumsum(counts) - counts, counts))
        take_p = pa.array(p_rows[order_p[lo[rep] + within]], pa.int64())
        take_i = pa.array(i_rows[rep], pa.int64())
        cols = {}
        for k in key_cols:
            cols[k] = g[k].take(take_p)
        cols[ts_col] = g["__ts"].take(take_p)
        for c in point_cols:
            cols[c] = g[f"__p_{c}"].take(take_p)
        cols[start_col] = g["__start"].take(take_i)
        cols[end_col] = g["__end"].take(take_i)
        for c in interval_cols:
            cols[iv_out_names[c]] = g[f"__i_{c}"].take(take_i)
        return pa.table(cols).cast(out_schema)

    from .sorted_groups import sorted_group_map

    return sorted_group_map(tagged, key_cols, _one_group, out_schema)
