"""Mergeable per-bucket sufficient statistics -> light-curve-style features.

The reference computes whole-series features in memory (the
light-curve-feature extractor family pointed at by
/root/reference/README.md:18; definitions are public knowledge, Malanchev et
al. 2021, MNRAS 502:5147).  Ray Data delivers a series in *blocks*, so the
engine's aggregates must be mergeable.  The value moments use the
**streaming Welford/Pébay central-moment form** (Pébay 2008, SAND2008-6212:
numerically stable arbitrary-order central-moment merging): each block emits
per-(series, bucket)

    n, mean, M2 = Σ(v-mean)², M3 = Σ(v-mean)³, M4 = Σ(v-mean)⁴

about its OWN block-local mean, and partials merge associatively with the
Pébay pairwise update.  Raw power sums (Σv², Σv³, Σv⁴) are NOT used for the
central moments: for data with |mean| >> std (e.g. prices ~8e4 with std
~20) they cancel catastrophically — s4-based kurtosis loses ~10 of 16
digits.  Central moments are exact-to-ulp regardless of the mean.

Plain-sum statistics (no subtraction -> no cancellation) stay plain sums so
the shuffle-side merge for them is Ray's built-in vectorized Sum/Min/Max:

    sum_w   Σw                 (weights)
    sum_wv  Σw·v
    sum_invw Σ(1/w)            (w = 1/σ² convention: Σσ², for ExcessVariance)
    vmin/vmax
    st1     Σt'    where t' = (t_us - bucket_ts_us)/1e6 seconds — shifting
    st2     Σt'²   by the bucket start is deterministic per group, needs no
    stv     Σt'·v  pre-pass, and keeps the OLS normal equations conditioned

Finalized features (nine, north_star list):

    mean      (streamed)
    wmean     sum_wv/sum_w
    std       sample std sqrt(M2/(n-1)), NULL when n < 2
    skew      population skewness m3/m2^1.5, NULL when m2 ≈ 0
    kurtosis  population excess kurtosis m4/m2² − 3, NULL when m2 ≈ 0
    amplitude (max−min)/2   (light-curve Amplitude definition)
    beyond_1_std  second pass (needs final mean/std; stages/aggregate.py)
    linear_trend_slope  OLS slope of v over t' seconds
    (count n is the ninth)

Weighted second moment (round 3, closes "weights flow only to wmean"):
``wM2 = Σw·(v - μw)²`` about the *weighted* mean streams exactly like the
unweighted Pébay state — per-block about the block's own weighted mean,
merged with the weight-frequency form of the pairwise update (West 1979 /
Chan-Golub-LeVeque 1982 with n→W):

    W = Wa + Wb,  δ = μw_b − μw_a,  wM2 = wM2_a + wM2_b + δ²·Wa·Wb/W

Raw Σw·v² is again avoided for the |mean| >> std cancellation reason.
Finalized weighted features (w carries the 1/σ² inverse-variance
convention of the light-curve ecosystem):

    reduced_chi2     wM2/(n−1)  — Malanchev et al. 2021 ReducedChi2
                     (χ²_red of the constant-wmean model), NULL n < 2
    excess_variance  (s² − ⟨σ²⟩)/mean², s² = M2/(n−1), ⟨σ²⟩ = sum_invw/n
                     (Nandra et al. 1997 normalized excess variance),
                     NULL when n < 2 or mean == 0

Noise budget, documented: wM2's merge delta is a DIFFERENCE OF RATIOS
(Σwv/Σw per side), so adversarial |wmean| >> std splits can cancel to
~1e-7 RELATIVE error (tests/test_moments.py pins 1e-7 for the k-way
kernel) — larger than the 1e-9 collapse granularity of the two-step
9-sig→6-sig oracle rounding.  Production merges measure 1e-9..1e-8 and
every oracle row is green at sf0.001/0.01/0.1; a flip would need both
the adversarial split AND a value within noise of a 6-significant-digit
boundary.  If one ever appears, widen the first rounding step (9→8
significant digits in kernels/rounding.round_sig6_tie_robust AND its
SQL mirror) rather than loosening the comparison.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

POINT_STAT_COLUMNS = (
    "n",
    "sum_w",
    "sum_wv",
    "mean",
    "M2",
    "M3",
    "M4",
    "vmin",
    "vmax",
    "st1",
    "st2",
    "stv",
    "wM2",
    "sum_invw",
)

# packed layout of the Pébay accumulator (the custom-aggregate payload)
MSTATE_COLUMNS = ("n", "mean", "M2", "M3", "M4")

FEATURE_COLUMNS = (
    "n",
    "mean",
    "wmean",
    "std",
    "skew",
    "kurtosis",
    "amplitude",
    "linear_trend_slope",
    "linear_trend_sigma",
    "mean_variance",
    "reduced_chi2",
    "excess_variance",
)


def _group_codes(tbl: pa.Table, key_cols: list):
    """Vectorized composite group codes + first-occurrence row per group.

    Dictionary-encode each key column (arrow C++), mix the per-column codes
    into one int64 (cardinalities are block-local so the product stays far
    under 2^63 for ≤3 key columns at any sane block size), then np.unique.
    Returns (inverse_codes, first_row_indices).
    """
    mixed = None
    for k in key_cols:
        col = tbl[k]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        enc = pc.dictionary_encode(col)
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        card = len(enc.dictionary)
        mixed = idx if mixed is None else mixed * max(card, 1) + idx
    _, first, inv = np.unique(mixed, return_index=True, return_inverse=True)
    return inv, first


def point_stats_arrow(
    tbl: pa.Table,
    key_cols: list,
    t_us_col: str = "t_us",
    v_col: str = "v",
    w_col: str = "w",
    bucket_col: str = "bucket_ts_us",
) -> pa.Table:
    """Block-local partial aggregation: one row per distinct key in ``tbl``.

    Vectorized (dictionary-encode + np.bincount segmented sums; no Python
    row loop).  ``key_cols`` must include ``bucket_col``.  Output columns:
    key_cols + POINT_STAT_COLUMNS.  This is the map-side combiner that
    shrinks the groupby shuffle from raw points to one row per (key, block)
    — also the skew bound: a Zipf-hot key contributes at most #blocks
    partial rows, never #points.
    """
    inv, first = _group_codes(tbl, key_cols)
    g = len(first)
    v = pc.cast(tbl[v_col], pa.float64()).to_numpy(zero_copy_only=False)
    w = pc.cast(tbl[w_col], pa.float64()).to_numpy(zero_copy_only=False)
    t_us = pc.cast(tbl[t_us_col], pa.int64()).to_numpy(zero_copy_only=False)
    b_us = pc.cast(tbl[bucket_col], pa.int64()).to_numpy(zero_copy_only=False)
    tp = (t_us - b_us).astype(np.float64) / 1e6

    n = np.bincount(inv, minlength=g).astype(np.int64)
    s1 = np.bincount(inv, weights=v, minlength=g)
    mean = s1 / n
    d = v - mean[inv]
    d2 = d * d
    M2 = np.bincount(inv, weights=d2, minlength=g)
    M3 = np.bincount(inv, weights=d2 * d, minlength=g)
    M4 = np.bincount(inv, weights=d2 * d2, minlength=g)
    sum_w = np.bincount(inv, weights=w, minlength=g)
    sum_wv = np.bincount(inv, weights=w * v, minlength=g)
    with np.errstate(divide="ignore", invalid="ignore"):
        # weighted central M2 about the block's own weighted mean (exact;
        # merges via the weight-frequency Pébay update — see module doc)
        wmean_blk = np.where(sum_w > 0, sum_wv / np.where(sum_w > 0, sum_w,
                                                          1.0), 0.0)
        dw = v - wmean_blk[inv]
        wM2 = np.bincount(inv, weights=w * dw * dw, minlength=g)
        sum_invw = np.bincount(inv, weights=1.0 / w, minlength=g)
    st1 = np.bincount(inv, weights=tp, minlength=g)
    st2 = np.bincount(inv, weights=tp * tp, minlength=g)
    stv = np.bincount(inv, weights=tp * v, minlength=g)
    vmin = np.full(g, np.inf)
    vmax = np.full(g, -np.inf)
    np.minimum.at(vmin, inv, v)
    np.maximum.at(vmax, inv, v)

    first_idx = pa.array(first, pa.int64())
    cols = {k: pc.take(tbl[k], first_idx) for k in key_cols}
    cols["n"] = pa.array(n, pa.int64())
    for name, arr in (("sum_w", sum_w), ("sum_wv", sum_wv), ("mean", mean),
                      ("M2", M2), ("M3", M3), ("M4", M4), ("vmin", vmin),
                      ("vmax", vmax), ("st1", st1), ("st2", st2),
                      ("stv", stv), ("wM2", wM2), ("sum_invw", sum_invw)):
        cols[name] = pa.array(arr, pa.float64())
    return pa.table(cols)


# state-vector layout == POINT_STAT_COLUMNS order; named indices:
(N_, SUM_W_, SUM_WV_, MEAN_, M2_, M3_, M4_, VMIN_, VMAX_, ST1_, ST2_, STV_,
 WM2_, SUM_INVW_) = range(14)

STATE_WIDTH = len(POINT_STAT_COLUMNS)


def pack_state(tbl: pa.Table, key_cols: list) -> pa.Table:
    """Pack ALL 14 sufficient statistics into one
    fixed_size_list<double, 14> column ``state``.

    One packed column -> ONE custom aggregate at the shuffle merge (one
    Python-level call per group instead of ten separate aggregate objects)
    and a denser shuffle payload (no per-column Arrow overhead)."""
    g = len(tbl)
    flat = np.empty(g * STATE_WIDTH, dtype=np.float64)
    for j, c in enumerate(POINT_STAT_COLUMNS):
        flat[j::STATE_WIDTH] = tbl[c].to_numpy(
            zero_copy_only=False).astype(np.float64)
    state = pa.FixedSizeListArray.from_arrays(
        pa.array(flat, pa.float64()), STATE_WIDTH)
    return pa.table({**{k: tbl[k] for k in key_cols}, "state": state})


def state_matrix(col) -> np.ndarray:
    """state column -> (n_rows, 12) float64 matrix, zero-copy when possible."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, (pa.FixedSizeListArray, pa.ListArray,
                        pa.LargeListArray)):
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(-1, STATE_WIDTH)
    return np.asarray(col.to_pylist(), dtype=np.float64).reshape(
        -1, STATE_WIDTH)


def unpack_state(tbl: pa.Table) -> pa.Table:
    """Inverse of pack_state: state column -> the 12 named stat columns."""
    mat = state_matrix(tbl["state"])
    out = tbl.drop_columns(["state"])
    for j, c in enumerate(POINT_STAT_COLUMNS):
        out = out.append_column(c, pa.array(mat[:, j], pa.float64()))
    return out


def merge_state_pair(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Merge two 14-wide state vectors: plain sums + min/max + Pébay."""
    na, nb = a[N_], b[N_]
    if na == 0:
        return np.array(b, dtype=np.float64)
    if nb == 0:
        return np.array(a, dtype=np.float64)
    out = np.empty(STATE_WIDTH, dtype=np.float64)
    for j in (SUM_W_, SUM_WV_, ST1_, ST2_, STV_, SUM_INVW_):
        out[j] = a[j] + b[j]
    out[VMIN_] = min(a[VMIN_], b[VMIN_])
    out[VMAX_] = max(a[VMAX_], b[VMAX_])
    # weighted M2: weight-frequency Pébay (module doc); zero-weight side
    # contributes no delta term
    Wa, Wb = a[SUM_W_], b[SUM_W_]
    if Wa > 0 and Wb > 0:
        dw = b[SUM_WV_] / Wb - a[SUM_WV_] / Wa
        out[WM2_] = a[WM2_] + b[WM2_] + dw * dw * (Wa * Wb / (Wa + Wb))
    else:
        out[WM2_] = a[WM2_] + b[WM2_]
    n, mean, M2, M3, M4 = merge_moments_pair(
        (na, a[MEAN_], a[M2_], a[M3_], a[M4_]),
        (nb, b[MEAN_], b[M2_], b[M3_], b[M4_]),
    )
    out[N_], out[MEAN_], out[M2_], out[M3_], out[M4_] = n, mean, M2, M3, M4
    return out


def merge_state_pairs_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized merge of row-aligned state matrices a[i] ⊕ b[i].

    Same algebra as merge_state_pair, as numpy array ops over all pairs at
    once — the inner kernel of the segmented sort-merge reduce."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    out = np.empty_like(a)
    for j in (SUM_W_, SUM_WV_, ST1_, ST2_, STV_, SUM_INVW_):
        out[:, j] = a[:, j] + b[:, j]
    out[:, VMIN_] = np.minimum(a[:, VMIN_], b[:, VMIN_])
    out[:, VMAX_] = np.maximum(a[:, VMAX_], b[:, VMAX_])
    Wa, Wb = a[:, SUM_W_], b[:, SUM_W_]
    with np.errstate(invalid="ignore", divide="ignore"):
        dw = b[:, SUM_WV_] / Wb - a[:, SUM_WV_] / Wa
        wm2_merged = (a[:, WM2_] + b[:, WM2_]
                      + dw * dw * (Wa * Wb / (Wa + Wb)))
    out[:, WM2_] = np.where((Wa > 0) & (Wb > 0), wm2_merged,
                            a[:, WM2_] + b[:, WM2_])
    na, nb = a[:, N_], b[:, N_]
    ma, mb = a[:, MEAN_], b[:, MEAN_]
    M2a, M2b = a[:, M2_], b[:, M2_]
    M3a, M3b = a[:, M3_], b[:, M3_]
    M4a, M4b = a[:, M4_], b[:, M4_]
    n = na + nb
    with np.errstate(invalid="ignore", divide="ignore"):
        delta = mb - ma
        mean = ma + delta * (nb / n)
        M2 = M2a + M2b + delta * delta * (na * nb / n)
        M3 = (M3a + M3b
              + delta**3 * (na * nb * (na - nb) / (n * n))
              + 3.0 * delta * (na * M2b - nb * M2a) / n)
        M4 = (M4a + M4b
              + delta**4 * (na * nb * (na * na - na * nb + nb * nb) / (n**3))
              + 6.0 * delta * delta * (na * na * M2b + nb * nb * M2a) / (n * n)
              + 4.0 * delta * (na * M3b - nb * M3a) / n)
    # empty-side identities (na or nb == 0): take the other side verbatim
    a_empty = na == 0
    b_empty = nb == 0
    out[:, N_] = np.where(a_empty, nb, np.where(b_empty, na, n))
    for j, merged in ((MEAN_, mean), (M2_, M2), (M3_, M3), (M4_, M4)):
        out[:, j] = np.where(a_empty, b[:, j],
                             np.where(b_empty, a[:, j], merged))
    return out


def segmented_state_merge(mat: np.ndarray, inv: np.ndarray):
    """Reduce state rows by group code, fully vectorized.

    ``mat`` (k, 12) MUST be ordered so equal ``inv`` codes are contiguous
    (sorted-by-key blocks guarantee this).  Iteratively merges adjacent
    same-group pairs — O(log max_multiplicity) numpy passes, no Python
    per-group loop.  Returns (merged matrix, group codes) with one row per
    distinct code, original code order preserved.
    """
    mat = np.array(mat, dtype=np.float64)  # copy: arrow views are read-only
    inv = np.asarray(inv)
    while len(inv) > 1:
        same = inv[:-1] == inv[1:]
        if not same.any():
            break
        k = len(inv)
        starts = np.empty(k, dtype=bool)
        starts[0] = True
        starts[1:] = inv[1:] != inv[:-1]
        pos = np.arange(k) - np.maximum.accumulate(
            np.where(starts, np.arange(k), 0))
        is_left = np.zeros(k, dtype=bool)
        is_left[:-1] = same & (pos[:-1] % 2 == 0)
        left = np.nonzero(is_left)[0]
        right = left + 1
        mat[left] = merge_state_pairs_vec(mat[left], mat[right])
        keep = np.ones(k, dtype=bool)
        keep[right] = False
        mat = mat[keep]
        inv = inv[keep]
    return mat, inv


def segmented_state_merge_kway(mat: np.ndarray, inv: np.ndarray):
    """One-pass k-way reduce of state rows by group code.

    Same contract as ``segmented_state_merge`` (``inv`` sorted so equal
    codes are contiguous) but a single pass of segmented sums
    (np.add.reduceat) instead of O(log multiplicity) pairwise sweeps:
    compute each group's combined weighted mean, shift every partial's
    central moments to that grand mean with the standard k-way combination
    identities (Chan, Golub & LeVeque 1982 / Pébay 2008 §3 — deltas are
    taken against the grand mean, never raw power sums, so the
    |mean| >> std stability of the pairwise form is preserved), and sum.
    Bit-for-bit it differs from the pairwise sweep in final ulps only; the
    tie-robust 9dp->6dp rounding contract absorbs that (tests pin both
    kernels against each other and the pandas oracle)."""
    inv = np.asarray(inv)
    k = len(inv)
    if k == 0:
        return np.empty((0, STATE_WIDTH), dtype=np.float64), inv
    starts_mask = np.empty(k, dtype=bool)
    starts_mask[0] = True
    starts_mask[1:] = inv[1:] != inv[:-1]
    starts = np.nonzero(starts_mask)[0]
    mat = np.asarray(mat, dtype=np.float64)
    n = mat[:, N_]

    def seg(col):
        return np.add.reduceat(col, starts)

    N = seg(n)
    with np.errstate(invalid="ignore", divide="ignore"):
        gmean = np.where(N > 0, seg(n * mat[:, MEAN_]) / np.where(
            N > 0, N, 1.0), 0.0)
    counts = np.diff(np.append(starts, k))
    d = mat[:, MEAN_] - np.repeat(gmean, counts)
    # rows with n == 0 are empty accumulators (mean/M* all zero): their
    # delta terms must not contribute
    d = np.where(n > 0, d, 0.0)
    d2 = d * d
    M2p, M3p, M4p = mat[:, M2_], mat[:, M3_], mat[:, M4_]
    out = np.empty((len(starts), STATE_WIDTH), dtype=np.float64)
    out[:, N_] = N
    out[:, MEAN_] = gmean
    out[:, M2_] = seg(M2p + n * d2)
    out[:, M3_] = seg(M3p + 3.0 * d * M2p + n * d2 * d)
    out[:, M4_] = seg(M4p + 4.0 * d * M3p + 6.0 * d2 * M2p + n * d2 * d2)
    for j in (SUM_W_, SUM_WV_, ST1_, ST2_, STV_, SUM_INVW_):
        out[:, j] = seg(mat[:, j])
    # weighted M2, k-way: shift each partial to the grand WEIGHTED mean
    # (same Chan/Pébay identity with n→W), then sum
    W = out[:, SUM_W_]
    w_row = mat[:, SUM_W_]
    with np.errstate(invalid="ignore", divide="ignore"):
        gwmean = np.where(W > 0, out[:, SUM_WV_] / np.where(W > 0, W, 1.0),
                          0.0)
        dwm = mat[:, SUM_WV_] / w_row - np.repeat(gwmean, counts)
    dwm = np.where(w_row > 0, dwm, 0.0)
    out[:, WM2_] = seg(mat[:, WM2_] + w_row * dwm * dwm)
    out[:, VMIN_] = np.minimum.reduceat(mat[:, VMIN_], starts)
    out[:, VMAX_] = np.maximum.reduceat(mat[:, VMAX_], starts)
    return out, inv[starts]


def merge_state_rows(mat: np.ndarray) -> np.ndarray:
    """Reduce a (k, 12) state matrix to one vector.

    Plain columns reduce vectorized; the moment quadruple folds via Pébay
    (k is the per-(group, block) multiplicity — almost always 1-3 rows)."""
    if mat.shape[0] == 1:
        return mat[0].astype(np.float64, copy=True)
    out = np.empty(STATE_WIDTH, dtype=np.float64)
    for j in (N_, SUM_W_, SUM_WV_, ST1_, ST2_, STV_, SUM_INVW_):
        out[j] = mat[:, j].sum()
    out[VMIN_] = mat[:, VMIN_].min()
    out[VMAX_] = mat[:, VMAX_].max()
    acc = (0.0, 0.0, 0.0, 0.0, 0.0)
    for i in range(mat.shape[0]):
        acc = merge_moments_pair(
            acc, (mat[i, N_], mat[i, MEAN_], mat[i, M2_], mat[i, M3_],
                  mat[i, M4_]))
    out[N_], out[MEAN_], out[M2_], out[M3_], out[M4_] = acc
    # weighted M2: shift partials to the grand weighted mean (k-way form)
    W = out[SUM_W_]
    w_row = mat[:, SUM_W_]
    if W > 0:
        with np.errstate(invalid="ignore", divide="ignore"):
            dwm = np.where(w_row > 0,
                           mat[:, SUM_WV_] / np.where(w_row > 0, w_row, 1.0)
                           - out[SUM_WV_] / W, 0.0)
        out[WM2_] = (mat[:, WM2_] + w_row * dwm * dwm).sum()
    else:
        out[WM2_] = mat[:, WM2_].sum()
    return out


def merge_moments_pair(a, b):
    """Pébay pairwise merge of two (n, mean, M2, M3, M4) accumulators.

    Pébay 2008 eqs. (1.12)/(2.12): associative & commutative to float
    precision; numerically stable for |mean| >> std.
    """
    na, ma, M2a, M3a, M4a = a
    nb, mb, M2b, M3b, M4b = b
    if na == 0:
        return tuple(b)
    if nb == 0:
        return tuple(a)
    n = na + nb
    delta = mb - ma
    mean = ma + delta * (nb / n)
    M2 = M2a + M2b + delta * delta * (na * nb / n)
    M3 = (
        M3a + M3b
        + delta**3 * (na * nb * (na - nb) / (n * n))
        + 3.0 * delta * (na * M2b - nb * M2a) / n
    )
    M4 = (
        M4a + M4b
        + delta**4 * (na * nb * (na * na - na * nb + nb * nb) / (n**3))
        + 6.0 * delta * delta * (na * na * M2b + nb * nb * M2a) / (n * n)
        + 4.0 * delta * (na * M3b - nb * M3a) / n
    )
    return (n, mean, M2, M3, M4)


def merge_moments_rows(mat: np.ndarray):
    """Sequentially merge rows of an (k, 5) accumulator matrix."""
    acc = (0.0, 0.0, 0.0, 0.0, 0.0)
    for i in range(mat.shape[0]):
        acc = merge_moments_pair(acc, tuple(mat[i]))
    return acc


# Guard for "variance is numerically zero": m2 below this fraction of the
# mean-square magnitude (mean² + m2 ≡ E[v²]) is a constant series.
_M2_EPS = 1e-12


def finalize_features(stats: dict) -> dict:
    """Finalize merged sufficient statistics into the feature columns.

    ``stats``: mapping of POINT_STAT_COLUMNS -> 1-D numpy arrays (one
    element per group).  Returns dict of numpy arrays; undefined entries are
    NaN (converted to Arrow nulls by the caller so SQL NULL semantics
    match)."""
    n = np.asarray(stats["n"], dtype=np.float64)
    mean = np.asarray(stats["mean"], dtype=np.float64)
    M2 = np.asarray(stats["M2"], dtype=np.float64)
    M3 = np.asarray(stats["M3"], dtype=np.float64)
    M4 = np.asarray(stats["M4"], dtype=np.float64)
    sum_w = np.asarray(stats["sum_w"], dtype=np.float64)
    sum_wv = np.asarray(stats["sum_wv"], dtype=np.float64)
    vmin = np.asarray(stats["vmin"], dtype=np.float64)
    vmax = np.asarray(stats["vmax"], dtype=np.float64)
    st1 = np.asarray(stats["st1"], dtype=np.float64)
    st2 = np.asarray(stats["st2"], dtype=np.float64)
    stv = np.asarray(stats["stv"], dtype=np.float64)

    with np.errstate(divide="ignore", invalid="ignore"):
        wmean = np.where(sum_w > 0, sum_wv / sum_w, np.nan)
        M2c = np.maximum(M2, 0.0)
        std = np.where(n > 1, np.sqrt(M2c / np.maximum(n - 1, 1)), np.nan)
        m2 = M2c / n
        m3 = M3 / n
        m4 = M4 / n
        scale = np.maximum(mean * mean + m2, 1.0)
        degenerate = m2 <= _M2_EPS * scale
        safe_m2 = np.where(degenerate, 1.0, m2)
        skew = np.where(degenerate, np.nan, m3 / np.power(safe_m2, 1.5))
        kurt = np.where(degenerate, np.nan, m4 / np.square(safe_m2) - 3.0)
        amplitude = (vmax - vmin) / 2.0
        s1 = mean * n
        denom = n * st2 - st1 * st1
        tscale = np.maximum(st2, 1.0)
        flat_t = denom <= _M2_EPS * n * tscale
        slope = np.where(
            flat_t, np.nan,
            (n * stv - st1 * s1) / np.where(flat_t, 1.0, denom))
        # LinearTrend's second output (catalog): the OLS slope's standard
        # error.  SSres = Syy − slope²·Sxx with Syy = Σ(v−mean)² = M2c and
        # Sxx = st2 − st1²/n (time centered); σ = √((SSres/(n−2))/Sxx).
        # Operand order mirrors the oracle SQL exactly; NULL when n < 3
        # or flat t (same denom guard as the slope).
        undef_sig = flat_t | (n < 3)
        sxx = st2 - st1 * st1 / n
        safe_sxx = np.where(undef_sig, 1.0, sxx)
        slope_safe = np.where(undef_sig, 0.0, slope)
        slope_sigma = np.where(
            undef_sig, np.nan,
            np.sqrt(np.maximum(M2c - slope_safe * slope_safe * safe_sxx,
                               0.0)
                    / np.maximum(n - 2.0, 1.0) / safe_sxx))
        # MeanVariance (Malanchev et al. 2021 catalog): std / mean;
        # undefined for n < 2 (std is NaN) or mean == 0 (exact compare,
        # mirrored by the oracle's CASE WHEN mean = 0)
        mean_variance = np.where(mean == 0.0, np.nan,
                                 std / np.where(mean == 0.0, 1.0, mean))
        wM2 = np.asarray(stats["wM2"], dtype=np.float64)
        sum_invw = np.asarray(stats["sum_invw"], dtype=np.float64)
        # ReducedChi2: χ²_red of the constant-wmean model, w = 1/σ²
        reduced_chi2 = np.where((n > 1) & (sum_w > 0),
                                np.maximum(wM2, 0.0) / np.maximum(n - 1, 1),
                                np.nan)
        # normalized excess variance (s² − ⟨σ²⟩)/mean², σ² = 1/w
        s2 = M2c / np.maximum(n - 1, 1)
        excess_variance = np.where(
            (n > 1) & (mean != 0.0),
            (s2 - sum_invw / n) / np.where(mean == 0.0, 1.0, mean * mean),
            np.nan)

    return {
        "n": np.asarray(stats["n"], dtype=np.int64),
        "mean": mean,
        "wmean": wmean,
        "std": std,
        "skew": skew,
        "kurtosis": kurt,
        "amplitude": amplitude,
        "linear_trend_slope": slope,
        "linear_trend_sigma": slope_sigma,
        "mean_variance": mean_variance,
        "reduced_chi2": reduced_chi2,
        "excess_variance": excess_variance,
    }


def merge_stats_numpy(stats: dict, group_codes: np.ndarray, n_groups: int) -> dict:
    """Segmented merge of stat rows by group code.

    Plain sums / min / max for the sum-form columns; sequential Pébay merge
    for the central-moment columns.  Used by the single-process oracle and
    tests; the distributed path uses Ray built-ins + the MomentMerge custom
    aggregate (stages/aggregate.py) computing the same algebra.
    """
    out = {}
    for col in ("n", "sum_w", "sum_wv", "st1", "st2", "stv", "sum_invw"):
        arr = np.asarray(stats[col], dtype=np.float64)
        acc = np.zeros(n_groups)
        np.add.at(acc, group_codes, arr)
        out[col] = acc
    # weighted M2: shift each partial to its group's grand weighted mean
    w_row = np.asarray(stats["sum_w"], dtype=np.float64)
    wv_row = np.asarray(stats["sum_wv"], dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        gwmean = np.where(out["sum_w"] > 0,
                          out["sum_wv"] / np.where(out["sum_w"] > 0,
                                                   out["sum_w"], 1.0), 0.0)
        dwm = np.where(w_row > 0,
                       wv_row / np.where(w_row > 0, w_row, 1.0)
                       - gwmean[group_codes], 0.0)
    wm2_acc = np.zeros(n_groups)
    np.add.at(wm2_acc, group_codes,
              np.asarray(stats["wM2"], dtype=np.float64) + w_row * dwm * dwm)
    out["wM2"] = wm2_acc
    for col, init, fn in (("vmin", np.inf, np.minimum),
                          ("vmax", -np.inf, np.maximum)):
        arr = np.asarray(stats[col], dtype=np.float64)
        acc = np.full(n_groups, init)
        fn.at(acc, group_codes, arr)
        out[col] = acc
    accs = [(0.0, 0.0, 0.0, 0.0, 0.0)] * n_groups
    n_in = np.asarray(stats["n"], dtype=np.float64)
    for i in range(len(group_codes)):
        g = group_codes[i]
        row = (n_in[i], stats["mean"][i], stats["M2"][i], stats["M3"][i],
               stats["M4"][i])
        accs[g] = merge_moments_pair(accs[g], row)
    for j, c in enumerate(("mean", "M2", "M3", "M4"), start=1):
        out[c] = np.array([a[j] for a in accs])
    out["n"] = out["n"].astype(np.int64)
    return out
