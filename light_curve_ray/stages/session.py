"""Sessionization: split each key's event stream into sessions at
inactivity gaps — the classic clickstream/telemetry operator (and, for
light curves, the "observing night" segmentation of an irregular time
series).

Semantics (mirrors the SQL LAG/cumsum derivation the oracle uses): per
key, events sorted by timestamp; a session BREAK occurs before the
first event and wherever the gap to the previous event exceeds
``gap_us``; ``session_id`` is the 1-based running count of breaks.
Equal timestamps can never break (gap 0), so tie order does not affect
session assignment or the per-session aggregates — the result is
deterministic under any sort tie-breaking, which is what makes it safe
distributed.

Execution: ONE keyed sort via ``sorted_group_map`` with a VECTORIZED
whole-block kernel — lexsort by (key, ts), one diff, one cumsum, one
run-length aggregation over (key, session) for the outputs.  No per-row
or per-session Python.  Partitioning assumption (documented, same as
every per-series kernel): one key's events fit a worker's heap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def sessionize(ds, key_cols: list, ts_col: str, gap_us: int,
               out_session_col: str = "session_id"):
    """Per-session aggregate rows: key_cols + (session_id, n_events,
    t_start_us, t_end_us)."""
    sch = ds.schema()
    types = dict(zip(sch.names, sch.types))
    out_schema = pa.schema(
        [(k, types[k]) for k in key_cols]
        + [(out_session_col, pa.int64()), ("n_events", pa.int64()),
           ("t_start_us", pa.int64()), ("t_end_us", pa.int64())])

    def _block(batch: pa.Table) -> pa.Table:
        from ..kernels.moments import _group_codes

        n = len(batch)
        if n == 0:
            return out_schema.empty_table()
        inv, _ = _group_codes(batch, key_cols)
        ts = batch[ts_col].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ts, inv))
        inv_s, ts_s = inv[order], ts[order]
        brk = np.empty(n, dtype=np.int64)
        brk[0] = 1
        gap_break = (ts_s[1:] - ts_s[:-1]) > gap_us
        brk[1:] = (inv_s[1:] != inv_s[:-1]) | gap_break
        csum = np.cumsum(brk)
        grp_changed = np.empty(n, dtype=bool)
        grp_changed[0] = True
        grp_changed[1:] = inv_s[1:] != inv_s[:-1]
        grp_start_csum = csum[np.nonzero(grp_changed)[0]]
        grp_run = np.cumsum(grp_changed) - 1
        # 1-based within-key session number (the group's first row has
        # brk=1, so csum - csum[group_start] + 1 == 1 there)
        sid = csum - grp_start_csum[grp_run] + 1
        # session runs: boundaries where brk == 1
        s_starts = np.nonzero(brk)[0]
        s_ends = np.append(s_starts[1:], n)
        first_rows = order[s_starts]
        cols = {k: batch[k].take(pa.array(first_rows, pa.int64()))
                for k in key_cols}
        cols[out_session_col] = pa.array(sid[s_starts], pa.int64())
        cols["n_events"] = pa.array(s_ends - s_starts, pa.int64())
        cols["t_start_us"] = pa.array(ts_s[s_starts], pa.int64())
        cols["t_end_us"] = pa.array(ts_s[s_ends - 1], pa.int64())
        return pa.table(cols).cast(out_schema)

    from .sorted_groups import sorted_group_map

    return sorted_group_map(ds, key_cols, None, out_schema,
                            block_fn=_block)
