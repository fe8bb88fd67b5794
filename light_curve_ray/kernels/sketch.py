"""Mergeable sketch kernels: HyperLogLog distinct-count registers and a
weighted quantile summary.

Public-knowledge algorithms: HyperLogLog per Flajolet et al. 2007 (with
the standard small-range linear-counting and large-range corrections of
the original paper / Heule et al.'s presentation of the classic variant)
and a Greenwald-Khanna-style weighted quantile summary — kept values
carry their EXACT cumulative weight, compression selects values at
evenly spaced cumulative ranks, so rank error per compression is bounded
by W/capacity.

Everything is deterministic numpy on uint64/float64 — the same sketch
bytes come out of every worker for the same input, which is what makes
the distributed merge an elementwise max / a sorted merge with no
coordination.  No Ray imports here (kernel layer contract): the
distributed plumbing lives in stages/sketch.py.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------- HLL --

# _CLZ8_LUT[b] = leading zeros of byte b (8 for b == 0)
_CLZ8_LUT = np.array([8 if b == 0 else 8 - int(b).bit_length()
                      for b in range(256)], dtype=np.uint8)


def clz64(x: np.ndarray) -> np.ndarray:
    """EXACT vectorized count-leading-zeros of a uint64 array.

    Byte-LUT walk (same discipline as hashing.popcount64): view each
    word as its 8 bytes most-significant-first, find the first nonzero
    byte with one argmax, add that byte's LUT clz.  No float64 detour —
    casting to float rounds 54+-bit values and mis-counts at power-of-two
    boundaries.
    """
    x = np.ascontiguousarray(x, dtype=np.uint64)
    n = x.size
    if n == 0:
        return np.empty(0, dtype=np.int64)
    b = x.view(np.uint8).reshape(n, 8)[:, ::-1]  # MSB first
    nz = b != 0
    first = np.argmax(nz, axis=1)
    out = first.astype(np.int64) * 8 + _CLZ8_LUT[b[np.arange(n), first]]
    out[~nz.any(axis=1)] = 64
    return out


def hll_init(p: int = 12) -> np.ndarray:
    return np.zeros(1 << p, dtype=np.uint8)


def hll_add_hashes(registers: np.ndarray, hashes: np.ndarray,
                   p: int = 12) -> np.ndarray:
    """Fold a batch of uint64 hashes into the registers, vectorized.

    bucket = top p bits; rho = 1 + leading zeros of the remaining
    64-p bits (capped at 64-p+1 when they are all zero).
    """
    if hashes.size == 0:
        return registers
    h = hashes.astype(np.uint64, copy=False)
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining bits, MSB-aligned
    rho = np.minimum(clz64(rest), 64 - p).astype(np.uint8) + 1
    np.maximum.at(registers, bucket, rho)
    return registers


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(registers: np.ndarray) -> float:
    """Classic HLL estimator with small/large-range corrections."""
    m = registers.size
    if m >= 128:
        alpha = 0.7213 / (1.0 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    regs = registers.astype(np.float64)
    e = alpha * m * m / np.sum(np.exp2(-regs))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(registers == 0))
        if zeros:
            return m * np.log(m / zeros)  # linear counting
    two64 = float(1 << 64)
    if e > two64 / 30.0:
        return -two64 * np.log1p(-e / two64)
    return float(e)


# --------------------------------------------- weighted quantile summary --

def qsummary_from_values(vals: np.ndarray, capacity: int):
    """Build a summary (sorted values, weights) from raw float64 values."""
    v = np.sort(np.asarray(vals, dtype=np.float64), kind="stable")
    w = np.ones(v.size, dtype=np.int64)
    return qsummary_compress(v, w, capacity)


def qsummary_merge(v1, w1, v2, w2, capacity: int):
    """Merge two summaries: sorted merge of the kept values (weights ride
    along), then one compression if over capacity."""
    v = np.concatenate([v1, v2])
    w = np.concatenate([w1, w2])
    order = np.argsort(v, kind="stable")
    return qsummary_compress(v[order], w[order], capacity)


def qsummary_compress(v: np.ndarray, w: np.ndarray, capacity: int):
    """Keep <= capacity values at evenly spaced cumulative ranks.

    The kept value's weight is the telescoped sum of the weights it
    absorbs (everything since the previously kept value), so cumulative
    weight AT each kept value stays exact and total weight is preserved;
    the first and last values (global min / max) are always kept.  Rank
    error introduced per compression <= total_weight / capacity.
    """
    n = v.size
    if n <= capacity:
        return v, w
    cum = np.cumsum(w)
    total = cum[-1]
    # target cumulative ranks for capacity-2 interior picks + both ends
    targets = (np.arange(1, capacity - 1, dtype=np.float64)
               * (total / (capacity - 1)))
    idx = np.searchsorted(cum, targets, side="left")
    keep = np.unique(np.concatenate([[0], idx, [n - 1]]))
    kept_cum = cum[keep]
    new_w = np.diff(np.concatenate([[0], kept_cum]))
    return v[keep], new_w.astype(np.int64)


def qsummary_quantile(v: np.ndarray, w: np.ndarray,
                      qs: np.ndarray) -> np.ndarray:
    """Linear-interpolated quantiles of the weighted summary.

    Semantics: the summary stands for the expanded multiset where value
    v[j] repeats w[j] times; the quantile is numpy's method='linear'
    (== SQL quantile_cont) over that expansion — EXACT equality with
    quantile_cont whenever the summary was never compressed.  Expanded
    index t = q*(W-1); v[j] occupies expanded indices
    [cum[j-1], cum[j}).
    """
    qs = np.asarray(qs, dtype=np.float64)
    if v.size == 0:
        return np.full(qs.shape, np.nan)
    cum = np.cumsum(w)
    total = cum[-1]
    t = qs * (total - 1)
    fl = np.floor(t).astype(np.int64)
    ce = np.minimum(fl + 1, total - 1)
    frac = t - fl
    j_fl = np.searchsorted(cum, fl, side="right")
    j_ce = np.searchsorted(cum, ce, side="right")
    a, b = v[j_fl], v[j_ce]
    # numpy's _lerp, bit-for-bit (incl. the t>=0.5 symmetry fixup), so the
    # uncompressed path is EXACTLY np.quantile(method='linear'); DuckDB's
    # quantile_cont evaluates the same lerp with possibly different ulp
    # rounding — absorbed by the engine's 6-dp output rounding contract
    out = a + (b - a) * frac
    hi = frac >= 0.5
    out = np.where(hi, b - (b - a) * (1.0 - frac), out)
    return out


# ----------------------------------------------------------- Count-Min

_CMS_SALTS = np.uint64(0x9E3779B97F4A7C15)
_CMS_MIX = np.uint64(0xBF58476D1CE4E5B9)


def cms_init(depth: int = 4, width: int = 8192) -> np.ndarray:
    """Count-Min counter matrix — a LINEAR sketch: merge = elementwise
    add, so partials from any partitioning sum to the same matrix."""
    return np.zeros((depth, width), dtype=np.int64)


def cms_indices(hashes: np.ndarray, depth: int, width: int) -> np.ndarray:
    """(depth, n) row indices via splitmix-style remixing of the row
    hash — deterministic, vectorized, no Python per-row."""
    h = hashes.astype(np.uint64)
    out = np.empty((depth, len(h)), dtype=np.int64)
    with np.errstate(over="ignore"):  # uint64 wrap is the hash
        for d in range(depth):
            x = (h ^ (_CMS_SALTS * np.uint64(d + 1))) * _CMS_MIX
            x ^= x >> np.uint64(31)
            x *= _CMS_MIX
            out[d] = (x % np.uint64(width)).astype(np.int64)
    return out


def cms_add(counts: np.ndarray, hashes: np.ndarray) -> None:
    depth, width = counts.shape
    idx = cms_indices(hashes, depth, width)
    for d in range(depth):
        counts[d] += np.bincount(idx[d], minlength=width)


def cms_query(counts: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Point estimates: min over rows — >= the true count always
    (one-sided error <= eN with prob 1-delta at width=e/eps,
    depth=ln(1/delta); Cormode & Muthukrishnan 2005)."""
    depth, width = counts.shape
    idx = cms_indices(hashes, depth, width)
    est = counts[0, idx[0]]
    for d in range(1, depth):
        est = np.minimum(est, counts[d, idx[d]])
    return est


def kmv_add(sketch: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """K-Minimum-Values sketch update (Bar-Yossef et al. 2002): keep
    the k smallest DISTINCT uint64 hashes seen.  ``sketch`` is a sorted
    uint64 array (possibly shorter than k); returns the updated sorted
    array.  Merge of two sketches is the same operation (k smallest of
    the union) — associative and partition-order-invariant, the
    distributed requirement."""
    merged = np.unique(np.concatenate([sketch,
                                       np.asarray(hashes, np.uint64)]))
    return merged[:k]


def kmv_estimate(sketch: np.ndarray, k: int) -> float:
    """Distinct-count estimate: (k-1) / (kth_min / 2^64) — unbiased for
    n > k; exact len(sketch) when fewer than k distinct values exist."""
    if len(sketch) < k:
        return float(len(sketch))
    kth = float(sketch[k - 1]) / 2.0 ** 64
    return (k - 1) / kth if kth > 0 else float(len(sketch))


def kmv_intersection(sa: np.ndarray, sb: np.ndarray, k: int) -> float:
    """Set-INTERSECTION estimate from two KMV sketches (the operation
    HLL cannot do without inclusion-exclusion blowup): the union
    sketch K is the k smallest of sa ∪ sb; Jaccard ≈ |K ∩ sa ∩ sb|/|K|;
    |A ∩ B| ≈ Jaccard x |A ∪ B|_est (Beyer et al. 2007)."""
    union = np.unique(np.concatenate([sa, sb]))[:k]
    in_both = np.isin(union, sa) & np.isin(union, sb)
    rho = float(in_both.sum()) / len(union) if len(union) else 0.0
    return rho * kmv_estimate(union, k)


# ------------------------------------------------------- Misra-Gries

def mg_from_counts(keys: np.ndarray, counts: np.ndarray, k: int):
    """Build a k-counter Misra-Gries summary from EXACT (key, count)
    pairs (a block's local histogram): keep the k largest counters and
    subtract the (k+1)-th largest from each survivor — the mergeable-
    summaries form (Agarwal et al., PODS 2012) whose estimate obeys
    true − n/(k+1) ≤ est ≤ true with n the summarized weight.
    Deterministic: ties at the cut resolved by key order.  Returns
    (keys, residual_counts) sorted by key."""
    keys = np.asarray(keys, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if len(keys) <= k:
        o = np.argsort(keys, kind="stable")
        return keys[o], counts[o]
    # k largest by (count desc, key asc) — deterministic cut
    order = np.lexsort((keys, -counts))
    cut = counts[order[k]]            # the (k+1)-th largest count
    keep = order[:k]
    resid = counts[keep] - cut
    m = resid > 0
    kk, cc = keys[keep][m], resid[m]
    o = np.argsort(kk, kind="stable")
    return kk[o], cc[o]


def mg_merge(k1: np.ndarray, c1: np.ndarray,
             k2: np.ndarray, c2: np.ndarray, k: int):
    """Merge two MG summaries: add counters keywise, then re-apply the
    k-counter cut.  Error adds at most the two inputs' offsets (the
    mergeability theorem), so any merge tree keeps the n/(k+1) bound."""
    keys = np.concatenate([k1, k2])
    counts = np.concatenate([c1, c2])
    uk, inv = np.unique(keys, return_inverse=True)
    summed = np.bincount(inv, weights=counts,
                         minlength=len(uk)).astype(np.int64)
    return mg_from_counts(uk, summed, k)
