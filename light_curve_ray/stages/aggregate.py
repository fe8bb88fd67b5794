"""Grouped feature aggregation (SURVEY §2b-O6) as map-side partials + a
mergeable shuffle-side reduce.

Scale design: a bare ``groupby().aggregate()`` shuffles every point row.
Here every block first collapses to one row per (lang, domain, bucket) via
vectorized segmented reduction (kernels/moments.point_stats_arrow), so the
all-to-all exchange moves partial-stat rows (≤ one per key per block), each
carrying ALL 14 sufficient statistics packed into one
fixed_size_list<double,14> ``state`` column.  The shuffle-side merge is ONE
custom mergeable aggregate — ``StateMerge``, plain sums + min/max + the
streaming Welford/Pébay central-moment combiner (north_star: "streaming
Welford/moment accumulators").  Central-moment form is a correctness
requirement, not a style choice: raw power sums cancel catastrophically
when |mean| >> std (see kernels/moments.py docstring).

Skew handling is two-layer (SURVEY §4; north rule "explicit salting for hot
domains"): (1) the map-side combine bounds any key at #blocks partial rows,
never #points; (2) for Zipf-head domains found by the sampling pre-pass
(``detect_hot_domains``), partials carry an extra ``salt`` key component so
the hot key's rows spread across n_salt sort positions at the shuffle, then
a second rollup-scale pass collapses the salts
(``merge_partials(salted=True)``).

Tier cascade (1h -> 1d -> 30d): coarser tiers re-bucket the *hourly
partials*, not the raw points — moment states and sums merge unchanged, and
the time-shifted OLS terms are re-based from hour start to the coarser
bucket start with exact algebra (``shift_stats``), so raw points shuffle
once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..kernels.moments import (
    N_,
    POINT_STAT_COLUMNS,
    ST1_,
    ST2_,
    STATE_WIDTH,
    STV_,
    MEAN_,
    finalize_features,
    merge_state_pair,
    merge_state_rows,
    pack_state,
    point_stats_arrow,
    state_matrix,
    unpack_state,
)

KEY_COLS = ["lang", "domain", "bucket_ts_us"]

# Columns finalized to NULL (not NaN) when undefined, so Arrow/parquet/DuckDB
# NULL semantics line up between engine output and oracle SQL.
_NULLABLE_FEATURES = ("wmean", "std", "skew", "kurtosis",
                      "linear_trend_slope", "linear_trend_sigma", "mean_variance",
                      "reduced_chi2", "excess_variance")

def make_partial_stats_fn(step_us: int, hot_domains: frozenset | None = None,
                          n_salt: int = 16):
    """map_batches fn: points block -> per-(lang,domain,bucket) partials
    with ALL sufficient statistics packed into the ``state`` column.

    ``hot_domains`` (optional): domains from the skew pre-pass
    (detect_hot_domains).  Points of a hot domain get a deterministic
    ``salt`` in [0, n_salt) derived from t_us, splitting that key's partial
    rows across ``n_salt`` merge keys so no single reducer position owns a
    Zipf head; everyone else gets salt 0.  merge_partials(salted=True)
    collapses the salts afterwards (north rule: explicit salting for hot
    domains)."""

    def partial_stats(batch: pa.Table) -> pa.Table:
        # exact int64 floor-to-bucket (kernels/grid.bucket_floor semantics);
        # float division would misround near bucket boundaries at epoch-µs
        # magnitudes, so this stays in integer arithmetic
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        bucket = (t_us // step_us) * step_us
        batch = batch.append_column("bucket_ts_us", pa.array(bucket, pa.int64()))
        key_cols = KEY_COLS
        if hot_domains:
            domains = batch["domain"].to_numpy(zero_copy_only=False)
            hot = np.isin(domains, list(hot_domains))
            # mix t_us so salt is uniform within a bucket (t_us % n_salt
            # would alias with regular cadences)
            mixed = (t_us.astype(np.uint64)
                     * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
            salt = np.where(hot, mixed % np.uint64(n_salt),
                            np.uint64(0)).astype(np.int32)
            batch = batch.append_column("salt", pa.array(salt, pa.int32()))
            key_cols = KEY_COLS + ["salt"]
        stats = point_stats_arrow(batch, key_cols, bucket_col="bucket_ts_us")
        return pack_state(stats, key_cols)

    return partial_stats


class StateMerge:
    """Ray AggregateFnV2: merge the packed 12-wide sufficient-statistic
    state (plain sums + min/max + Pébay central moments) in ONE aggregate.

    A single aggregate object means one Python-level call per (group,
    block) at the shuffle merge — with ten separate aggregates the
    per-group dispatch overhead dominated the merge stage ~10x.  The
    partial rows are already one-per-key-per-block, so this is
    rollup-scale work, never point-scale.
    """

    def __new__(cls, on: str = "state", alias_name: str = "state"):
        from ray.data.aggregate import AggregateFnV2
        from ray.data.block import BlockAccessor

        zero = np.zeros(STATE_WIDTH, dtype=np.float64)

        class _StateMerge(AggregateFnV2):
            def __init__(self):
                super().__init__(
                    alias_name,
                    zero_factory=lambda: zero,
                    on=on,
                    ignore_nulls=True,
                )

            def aggregate_block(self, block):
                tbl = BlockAccessor.for_block(block).to_arrow()
                mat = state_matrix(tbl[on])
                if mat.shape[0] == 0:
                    return zero
                return merge_state_rows(mat)

            def combine(self, current, new):
                return merge_state_pair(np.asarray(current),
                                        np.asarray(new))

            def finalize(self, acc):
                return list(acc)

        return _StateMerge()


def _block_state_merge(batch: pa.Table, key_cols: list = None) -> pa.Table:
    """Vectorized within-block merge: one state row per key in the block,
    plus a ``boundary`` flag on each block's first/last key (the only keys
    whose partial rows can continue into a neighboring sorted block)."""
    from ..kernels.moments import (
        _group_codes,
        segmented_state_merge_kway,
    )

    key_cols = key_cols or KEY_COLS
    if len(batch) == 0:
        return batch.append_column("boundary", pa.array([], pa.bool_()))
    inv, _ = _group_codes(batch, key_cols)
    # rows arrive key-sorted, so equal keys are contiguous; rebuild
    # positional run codes (equal inv <-> equal key) for the segmented merge
    changed = np.empty(len(batch), dtype=bool)
    changed[0] = True
    changed[1:] = inv[1:] != inv[:-1]
    order_codes = np.cumsum(changed) - 1
    mat = state_matrix(batch["state"])
    merged, codes = segmented_state_merge_kway(mat, order_codes)
    first_rows = np.nonzero(changed)[0]
    keys = {k: pc.take(batch[k], pa.array(first_rows, pa.int64()))
            for k in key_cols}
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(merged.ravel(), pa.float64()), STATE_WIDTH)
    g = len(first_rows)
    boundary = np.zeros(g, dtype=bool)
    boundary[0] = True
    boundary[-1] = True
    return pa.table({**keys, "state": state,
                     "boundary": pa.array(boundary, pa.bool_())})


def merge_partials(ds, salted: bool = False, residual_cap: int = 65536):
    """Shuffle-side merge: sort by key (the one all-to-all exchange), then
    a fully VECTORIZED segmented Pébay reduce per sorted block.

    Sorted order makes every key's partial rows contiguous, so a key that
    is not its block's first or last key is completely merged inside that
    block (exact, no cross-block traffic).  Only the ≤2 boundary keys per
    block need resolution; that residual is ~2 rows/block.  While the
    residual stays under ``residual_cap`` rows it collapses in a single
    partition with the same vectorized kernel; beyond that (≈ >32k input
    blocks — the round-1 cliff at ~1e6 blocks) the SAME sort-merge pass
    repeats HIERARCHICALLY: repartition the still-sorted boundary rows
    into residual/residual_cap blocks, merge interiors, and recurse on
    the (~blocks×2) rows that remain — O(log) levels, each a narrow
    order-preserving repartition, no extra sort.  This avoids Ray's
    per-group Python dispatch in groupby().aggregate(), which dominated
    the merge stage ~3x at 45k groups.

    ``salted=True``: partials carry a ``salt`` key component (hot-domain
    skew split, make_partial_stats_fn).  The first merge runs over
    key+salt — spreading a hot key across n_salt sort positions — and a
    second pass over the (rollup × n_salt)-scale result collapses the
    salts.
    """
    key_cols = KEY_COLS + ["salt"] if salted else KEY_COLS

    def _block_merge(batch: pa.Table) -> pa.Table:
        return _block_state_merge(batch, key_cols)

    merged = ds.sort(key_cols).map_batches(
        _block_merge, batch_format="pyarrow", batch_size=None,
        zero_copy_batch=True,
    ).materialize()

    def _interior(batch: pa.Table) -> pa.Table:
        mask = pc.invert(batch["boundary"])
        return batch.filter(mask).drop_columns(["boundary"])

    def _boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch["boundary"]).drop_columns(["boundary"])

    def _final_merge(batch: pa.Table) -> pa.Table:
        out = _block_state_merge(batch, key_cols)
        return out.drop_columns(["boundary"])

    outputs = [merged.map_batches(_interior, batch_format="pyarrow",
                                  zero_copy_batch=True)]
    res = merged.map_batches(_boundary, batch_format="pyarrow",
                             zero_copy_batch=True)
    rows_est = 2 * merged.num_blocks()
    while rows_est > residual_cap:
        k = max(2, -(-rows_est // residual_cap))
        level = res.repartition(k).map_batches(
            _block_merge, batch_format="pyarrow", batch_size=None,
        ).materialize()
        outputs.append(level.map_batches(_interior, batch_format="pyarrow",
                                         zero_copy_batch=True))
        res = level.map_batches(_boundary, batch_format="pyarrow",
                                zero_copy_batch=True)
        rows_est = 2 * k
    outputs.append(
        res.repartition(1).map_batches(_final_merge, batch_format="pyarrow",
                                       batch_size=None))
    out = outputs[0]
    for o in outputs[1:]:
        out = out.union(o)
    if salted:
        out = out.map_batches(
            lambda b: b.drop_columns(["salt"]), batch_format="pyarrow",
            zero_copy_batch=True,
        )
        out = merge_partials(out, salted=False)
    return out


def detect_hot_domains(points_ds, top_frac: float = 0.001,
                       min_share: float = 0.01, sample_blocks: int = 8):
    """Skew pre-pass (SURVEY §4): sample SPREAD-OUT blocks, count points
    per domain, return domains holding more than ``min_share`` of sampled
    points.

    Blocks are taken evenly spaced across the whole dataset, not from the
    head: input parquet clustered by domain (common for re-sharded crawls)
    would make a prefix 'sample' see only a few domains and silently
    disable salting.  Cheap by construction on the materialized points
    table run_rollup passes in (block refs already exist; only the sampled
    blocks are fetched); on a LAZY dataset the spread sample is unavailable
    without executing the whole chain (``to_arrow_refs`` on a lazy Dataset
    triggers full execution, it does not raise), so materialization is
    detected EXPLICITLY and lazy inputs take a bounded head scan instead.
    The result is a driver-side frozenset broadcast into
    make_partial_stats_fn."""
    import collections

    from ray.data.dataset import MaterializedDataset

    counts: collections.Counter = collections.Counter()
    total = 0
    if isinstance(points_ds, MaterializedDataset):
        import ray

        refs = points_ds.to_arrow_refs()
        if len(refs) > sample_blocks:
            idx = np.linspace(0, len(refs) - 1, sample_blocks,
                              dtype=np.int64)
            refs = [refs[i] for i in dict.fromkeys(idx.tolist())]
        batches = ray.get(refs)
    else:  # lazy input: bounded head scan, never full execution
        batches = points_ds.limit(sample_blocks * 65536).iter_batches(
            batch_format="pyarrow", batch_size=65536)
    for batch in batches:
        domains = batch["domain"].to_pylist()
        counts.update(domains)
        total += len(domains)
        if total >= sample_blocks * 65536 * 4:
            break
    if total == 0:
        return frozenset()
    return frozenset(d for d, c in counts.most_common(
        max(1, int(len(counts) * top_frac) + 8))
        if c / total >= min_share)


def driver_merge_states(tbl: pa.Table, key_cols: list = None) -> pa.Table:
    """In-process vectorized merge of a (keys..., state) table.

    Same segmented Pébay kernel as the distributed path; used by the
    adaptive small-rollup tail and the single-process oracle."""
    from ..kernels.moments import (
        _group_codes,
        segmented_state_merge_kway,
    )

    key_cols = key_cols or KEY_COLS
    if len(tbl) == 0:
        return tbl
    inv, _ = _group_codes(tbl, key_cols)
    order = np.argsort(inv, kind="stable")
    mat = state_matrix(tbl["state"])[order]
    inv_sorted = inv[order]
    merged, _codes = segmented_state_merge_kway(mat, inv_sorted)
    changed = np.empty(len(order), dtype=bool)
    changed[0] = True
    changed[1:] = inv_sorted[1:] != inv_sorted[:-1]
    first_rows = order[np.nonzero(changed)[0]]
    keys = {k: pc.take(tbl[k], pa.array(first_rows, pa.int64()))
            for k in key_cols}
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(merged.ravel(), pa.float64()), STATE_WIDTH)
    return pa.table({**keys, "state": state})


def merge_partials_agg(ds):
    """Alternative merge via Ray groupby + the StateMerge aggregate.

    Same algebra, Ray-native topology; kept for cross-checking (tests) and
    as the fallback when inputs are not sortable."""
    return ds.groupby(KEY_COLS).aggregate(StateMerge())


def shift_stats(batch: pa.Table, to_step_us: int) -> pa.Table:
    """Re-bucket merged stats to a coarser tier.

    Fine-bucket time sums are relative to the fine bucket start; re-base to
    the coarse start with c = (fine_start - coarse_start)/1e6 s:
        st1' = st1 + n·c,  st2' = st2 + 2c·st1 + n·c²,  stv' = stv + c·s1
    (s1 = n·mean).  The value-moment state is shift-invariant.  Exact
    algebra — cascading 1h -> 1d -> 30d merges the same accumulators as
    bucketing the raw points directly (test_rollup.py pins this).
    """
    fine = batch["bucket_ts_us"].to_numpy(zero_copy_only=False)
    coarse = (fine // to_step_us) * to_step_us
    c = (fine - coarse) / 1e6
    mat = state_matrix(batch["state"]).copy()
    n = mat[:, N_]
    st1 = mat[:, ST1_].copy()
    s1 = mat[:, MEAN_] * n
    mat[:, ST1_] = st1 + n * c
    mat[:, ST2_] = mat[:, ST2_] + 2.0 * c * st1 + n * c * c
    mat[:, STV_] = mat[:, STV_] + c * s1
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(mat.ravel(), pa.float64()), STATE_WIDTH)
    out = {name: batch[name] for name in batch.column_names}
    out["bucket_ts_us"] = pa.array(coarse, pa.int64())
    out["state"] = state
    return pa.table(out)


def finalize_stats_batch(batch: pa.Table, tier: str) -> pa.Table:
    """Merged stats -> feature columns (+ tier tag); NaN -> Arrow null."""
    batch = unpack_state(batch)
    stats = {c: batch[c].to_numpy(zero_copy_only=False)
             for c in POINT_STAT_COLUMNS}
    feats = finalize_features(stats)
    cols = {
        "lang": batch["lang"],
        "domain": batch["domain"],
        "tier": pa.array([tier] * len(batch), pa.string()),
        "bucket_ts_us": batch["bucket_ts_us"],
    }
    for name, arr in feats.items():
        if name in _NULLABLE_FEATURES:
            mask = ~np.isfinite(arr)
            cols[name] = pa.array(arr, pa.float64(), mask=mask)
        elif name == "n":
            cols[name] = pa.array(arr, pa.int64())
        else:
            cols[name] = pa.array(arr, pa.float64())
    return pa.table(cols)


def build_beyond_lookup(feats_pd: dict) -> dict:
    """Per-tier vectorized lookup for the beyond pass, built once on the
    driver from the finalized feature frames and broadcast via ray.put.

    Each tier maps to (skeys, step-agnostic composite key machinery): the
    rollup row's series is dictionary-encoded as "lang\\x1fdomain", the
    bucket index is rebased, and (series_id * stride + bucket_idx) gives a
    single int64 per rollup row — sorted so worker batches resolve their
    points with ONE np.searchsorted instead of a pandas string merge
    (which dominated the beyond phase wall).  ``rows`` maps a sorted
    position back to the tier frame's row index, so partials are emitted
    keyed by ROW INDEX and the final combine is a plain bincount."""
    from ..kernels.grid import TIER_STEP_US

    out = {}
    for tier, df in feats_pd.items():
        step = TIER_STEP_US[tier]
        # length-prefixed composite ("len(lang)\x1flang\x1fdomain"):
        # uniquely decodable for ANY key bytes — a bare "lang\x1fdomain"
        # concat would alias ("a\x1fb", "c") with ("a", "b\x1fc") if a key
        # ever contained the separator (worker side mirrors this)
        # Int64 (nullable) len: plain .astype(str) on a NaN-promoted
        # float64 length would render "2.0" prefixes for EVERY row the
        # moment one lang is null, corrupting all keys instead of one
        ser = pa.array((df["lang"].str.len().astype("Int64").astype(str)
                        + "\x1f" + df["lang"] + "\x1f"
                        + df["domain"]).to_numpy(),
                       pa.string())
        enc = ser.dictionary_encode()
        sid = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        bidx = df["bucket_ts_us"].to_numpy() // step
        base = int(bidx.min()) if len(bidx) else 0
        stride = int(bidx.max()) - base + 1 if len(bidx) else 1
        comp = sid * stride + (bidx - base)
        order = np.argsort(comp)
        out[tier] = {
            "skeys": enc.dictionary,
            "step": step,
            "base": base,
            "stride": stride,
            "comp": comp[order],
            "mean": df["mean"].to_numpy(dtype=np.float64)[order],
            "std": df["std"].to_numpy(dtype=np.float64)[order],
            "rows": np.asarray(order, dtype=np.int64),
            "n_rows": len(df),
        }
    return out


def make_beyond_partial_fn(lookup_ref, n_std: float = 1.0):
    """map_batches fn for the beyond_1_std second pass (SURVEY §2b-O6).

    ``lookup_ref``: ray.ObjectRef of build_beyond_lookup's dict — the
    small side, broadcast via ray.put once and read zero-copy in every
    task (never re-shipped per batch).  Fully vectorized per batch: arrow
    index_in for the series id, one searchsorted per tier for the
    (series, bucket) composite, numpy bincount partial sums.  Emits
    partial (tier, rollup-row-index, n_beyond, sum_abs_dev) rows; the
    driver's final combine is a bincount per tier.  Uses the final
    per-bucket mean/std, so the fraction is exact (not streamable in one
    pass by definition)."""

    def beyond_partials(batch: pa.Table) -> pa.Table:
        import ray

        lookup = ray.get(lookup_ref)
        lang = pc.cast(batch["lang"], pa.string())
        # length-prefixed composite — mirrors build_beyond_lookup exactly
        # (utf8_length counts code points, as pandas str.len does)
        series = pc.binary_join_element_wise(
            pc.cast(pc.utf8_length(lang), pa.string()), lang,
            pc.cast(batch["domain"], pa.string()), "\x1f")
        t_us = batch["t_us"].to_numpy(zero_copy_only=False)
        v = batch["v"].to_numpy(zero_copy_only=False)

        tiers, idxs, nbs, sads = [], [], [], []
        for tier, lk in lookup.items():
            sid = pc.index_in(series, value_set=lk["skeys"]) \
                .fill_null(-1).to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            bidx = t_us // lk["step"] - lk["base"]
            in_range = (sid >= 0) & (bidx >= 0) & (bidx < lk["stride"])
            comp = np.where(in_range, sid * lk["stride"] + bidx, -1)
            pos = np.searchsorted(lk["comp"], comp)
            pos_c = np.minimum(pos, len(lk["comp"]) - 1)
            valid = in_range & (lk["comp"][pos_c] == comp)
            mean = lk["mean"][pos_c]
            std = lk["std"][pos_c]
            absdev = np.abs(v - mean)
            with np.errstate(invalid="ignore"):
                beyond = (absdev > n_std * std)  # NaN std -> False
            rows = lk["rows"][pos_c]
            nb = np.bincount(rows[valid],
                             weights=beyond[valid].astype(np.float64),
                             minlength=lk["n_rows"])
            sad = np.bincount(rows[valid], weights=absdev[valid],
                              minlength=lk["n_rows"])
            nz = np.nonzero(sad)[0]
            # rows whose points all matched but absdev==0 still need the
            # count row when beyond>0 (can't happen: beyond>0 => absdev>0),
            # and rows with n>0 but sad==0 contribute zeros anyway
            tiers.append(np.full(len(nz), tier, dtype=object))
            idxs.append(nz)
            nbs.append(nb[nz])
            sads.append(sad[nz])
        return pa.table({
            "tier": pa.array(np.concatenate(tiers) if tiers else [],
                             pa.string()),
            "idx": pa.array(np.concatenate(idxs) if idxs else [],
                            pa.int64()),
            "n_beyond": pa.array(np.concatenate(nbs) if nbs else [],
                                 pa.float64()),
            "sum_abs_dev": pa.array(np.concatenate(sads) if sads else [],
                                    pa.float64()),
        })

    return beyond_partials
