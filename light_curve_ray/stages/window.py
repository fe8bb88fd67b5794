"""Sliding-window aggregate over bucketed series (windowed rollup).

For each (series, bucket) the window covers that bucket and the
``window - 1`` preceding bucket SLOTS (absent buckets contribute
nothing) — the standard trailing range window, e.g. a 3-hour moving
aggregate sampled hourly.  Built entirely from the engine's mergeable
state algebra: the fine-tier per-bucket states are already one row per
(series, bucket), so each window result is a Pébay merge of ≤ ``window``
state rows — count, mean, std, min, max all fall out of the merged
state, no second pass over points.

Execution: ONE keyed sort via sorted_group_map (the same exchange every
per-series stage pays) and a vectorized block kernel — for each shift
d = 1..window-1, rows whose grid positions differ by exactly d align via
one searchsorted over the block's (series, position) space and merge
with ONE ``merge_state_pairs_vec`` call; total work is (window-1) vector
merges per block, never per row.

Scale note: window width enters compute linearly (W-1 vector merges);
the shuffle cost is unchanged from the rollup's own tail (state rows,
not points).  The SQL oracle computes every window from raw points
two-pass (the oracle's luxury); the engine streams — same contract as
the rollup features.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..kernels.moments import (
    M2_,
    MEAN_,
    N_,
    VMAX_,
    VMIN_,
    merge_state_pairs_vec,
    state_matrix,
)


def sliding_window_states(fine_stats_ds, key_cols: list, step_us: int,
                          window: int):
    """(key_cols..., bucket_ts_us, state) -> per-bucket trailing-window
    merged stats: w_n, w_mean, w_std, w_min, w_max.

    ``fine_stats_ds`` must hold ONE state row per (key, bucket) — the
    output of the rollup's fine merge.
    """
    from .sorted_groups import sorted_group_map

    out_schema = pa.schema(
        [(k, pa.string()) for k in key_cols]
        + [("bucket_ts_us", pa.int64()), ("w_n", pa.int64()),
           ("w_mean", pa.float64()), ("w_std", pa.float64()),
           ("w_min", pa.float64()), ("w_max", pa.float64())])

    def _window_block(batch: pa.Table) -> pa.Table:
        from ..kernels.moments import _group_codes

        n = len(batch)
        if n == 0:
            return out_schema.empty_table()
        inv, _ = _group_codes(batch, key_cols)
        ts = batch["bucket_ts_us"].to_numpy(zero_copy_only=False)
        order = np.lexsort((ts, inv))
        inv_s, ts_s = inv[order], ts[order]
        mat = state_matrix(batch["state"])[order]
        # composite (series, grid position) — positions are bucket slots,
        # so "d slots earlier" is an exact integer offset
        pos = ts_s // step_us
        # encode (run, pos) as a sortable composite via run-local offsets:
        # within the (inv, ts) sort, rows are grouped by run and pos is
        # ascending within each run, so a row d slots earlier (if present)
        # is findable with ONE searchsorted over (run, pos) pairs encoded
        # relative to each run's own base (no cross-run aliasing: base
        # subtraction keeps values small and runs are matched on inv too)
        changed = np.empty(n, dtype=bool)
        changed[0] = True
        changed[1:] = inv_s[1:] != inv_s[:-1]
        run_of_row = np.cumsum(changed) - 1
        starts = np.nonzero(changed)[0]
        base = pos[starts][run_of_row]
        rel = pos - base  # >= 0, ascending within each run
        # pack (run, rel) into one int64: rel < 2^40 covers ~35k years of
        # hourly buckets; runs fit the remaining 23 bits per block easily
        comp = (run_of_row.astype(np.int64) << np.int64(40)) | rel
        acc = mat.copy()
        for d in range(1, window):
            want = comp - np.int64(d)
            j = np.searchsorted(comp, want)
            j_c = np.minimum(j, n - 1)
            hit = comp[j_c] == want
            if not hit.any():
                continue
            merged = merge_state_pairs_vec(acc[hit], mat[j_c[hit]])
            acc[hit] = merged
        w_n = acc[:, N_]
        with np.errstate(invalid="ignore", divide="ignore"):
            w_std = np.where(
                w_n > 1,
                np.sqrt(np.maximum(acc[:, M2_], 0.0)
                        / np.maximum(w_n - 1, 1)),
                np.nan)
        cols = {}
        take = pa.array(order, pa.int64())
        for k in key_cols:
            cols[k] = batch[k].take(take)
        cols["bucket_ts_us"] = pa.array(ts_s, pa.int64())
        cols["w_n"] = pa.array(w_n.astype(np.int64), pa.int64())
        cols["w_mean"] = pa.array(acc[:, MEAN_], pa.float64())
        cols["w_std"] = pa.array(w_std, pa.float64(),
                                 mask=~np.isfinite(w_std))
        cols["w_min"] = pa.array(acc[:, VMIN_], pa.float64())
        cols["w_max"] = pa.array(acc[:, VMAX_], pa.float64())
        return pa.table(cols).cast(out_schema)

    return sorted_group_map(fine_stats_ds, key_cols, None, out_schema,
                            block_fn=_window_block)
