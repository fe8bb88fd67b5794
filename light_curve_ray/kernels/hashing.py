"""Vectorized hashing kernels for dedup / similarity: shingles, MinHash,
SimHash, n-gram Jaccard.

All public-knowledge algorithms (Broder 1997 resemblance/MinHash; Charikar
2002 SimHash; banding/LSH per Leskovec-Rajaraman-Ullman, "Mining of Massive
Datasets" ch.3).  NumPy uint64 arithmetic with wraparound (mod 2^64) keeps
everything deterministic and platform-independent; the MinHash permutations
are the multiply-shift family h_i(x) = (a_i*x + b_i) mod 2^64 with odd a_i —
a standard practical choice that vectorizes to one fused multiply-add per
permutation.
"""

from __future__ import annotations

import numpy as np

from .textkit import fnv1a64


_TOKEN_HASH_WIDTH = 16
_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def token_hashes(tokens: list) -> np.ndarray:
    """Deterministic 64-bit hash per token -> uint64 array, VECTORIZED.

    FNV-1a fold over the token's FIRST 8 and LAST 8 utf-8 bytes
    (zero-padded halves) plus the byte length as a final round — one numpy
    pass per byte COLUMN (16 fixed iterations for the whole batch) instead
    of a Python loop per byte.  Sampling head+tail (not a 16-byte prefix)
    means long tokens differing anywhere in their first or last 8 bytes
    hash apart — the practically relevant case for web text (URLs,
    identifiers: tails differ).  Residual collision class, by design:
    tokens >16 bytes sharing first 8 + last 8 bytes + byte length and
    differing only in MIDDLE bytes collide.  Not byte-identical to
    streaming fnv1a64 (this is the shingle/simhash token hash, a
    self-contained deterministic function); document-level fingerprints
    hash every byte (textkit.fingerprint, blake2b).
    """
    n = len(tokens)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    half = _TOKEN_HASH_WIDTH // 2
    mat = np.zeros((n, _TOKEN_HASH_WIDTH), dtype=np.uint8)
    lens = np.empty(n, dtype=np.uint64)
    for i, t in enumerate(tokens):
        b = t.encode("utf-8")
        head = b[:half]
        tail = b[-half:]
        mat[i, :len(head)] = np.frombuffer(head, dtype=np.uint8)
        mat[i, half:half + len(tail)] = np.frombuffer(tail, dtype=np.uint8)
        lens[i] = len(b)
    h = np.full(n, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(_TOKEN_HASH_WIDTH):
            h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
        h = (h ^ lens) * _FNV_PRIME
    return h


def shingle_hashes(tokens: list, k: int = 3) -> np.ndarray:
    """Rolling polynomial hash of every k-token shingle -> unique uint64 set.

    Polynomial rolling (Rabin-Karp) over per-token FNV hashes with base B:
    h(i) = sum_{j<k} B^j * th[i+j]  (mod 2^64), vectorized via a strided sum.
    Documents shorter than k tokens hash as one all-token shingle; empty
    documents -> empty set.
    """
    th = token_hashes(tokens)
    n = len(th) - k + 1
    if n <= 0:
        if len(th) == 0:
            return np.empty(0, dtype=np.uint64)
        k = len(th)
    B = np.uint64(1099511628211)
    powers = np.empty(k, dtype=np.uint64)
    powers[0] = np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(1, k):
            powers[j] = powers[j - 1] * B  # wraps mod 2^64
        windows = np.lib.stride_tricks.sliding_window_view(th, k)
        h = (windows * powers[None, :]).sum(axis=1, dtype=np.uint64)
    return np.unique(h)


def _minhash_params(num_perm: int, seed: int):
    rng = np.random.RandomState(seed)
    a = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64) * np.uint64(2) + np.uint64(1)
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def minhash_signature(
    hashes: np.ndarray, num_perm: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash signature of one unique-hash set -> uint64[num_perm].

    Empty input -> all-ones sentinel (max uint64) so empty docs only collide
    with empty docs.
    """
    a, b = _minhash_params(num_perm, seed)
    if hashes.size == 0:
        return np.full(num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        h = a[:, None] * hashes[None, :].astype(np.uint64) + b[:, None]
    return h.min(axis=1)


def minhash_signatures_batch(
    hash_sets: list, num_perm: int = 128, seed: int = 42
) -> np.ndarray:
    """MinHash for a batch of documents -> uint64[n_docs, num_perm]."""
    a, b = _minhash_params(num_perm, seed)
    out = np.full((len(hash_sets), num_perm), np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for d, hs in enumerate(hash_sets):
            if hs.size:
                out[d] = (a[:, None] * hs[None, :].astype(np.uint64) + b[:, None]).min(axis=1)
    return out


def band_key_matrix(sigs: np.ndarray, bands: int = 16) -> np.ndarray:
    """Vectorized band keys for a signature matrix (n_docs, num_perm)
    -> uint64 (n_docs, bands).

    FNV-1a-style fold over each band's uint64 lanes — one numpy pass per
    lane (num_perm/bands fixed iterations for the whole batch), replacing
    per-chunk Python byte loops.  Deterministic; docs sharing any band key
    are LSH candidates (MMDS ch.3 banding)."""
    n, num_perm = sigs.shape
    rows = num_perm // bands
    lanes = sigs[:, :bands * rows].reshape(n, bands, rows)
    h = np.full((n, bands), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    prime = np.uint64(0x100000001B3)
    with np.errstate(over="ignore"):
        for j in range(rows):
            h = (h ^ lanes[:, :, j]) * prime
    return h


def lsh_band_keys(sig: np.ndarray, bands: int = 16) -> list:
    """Band keys of ONE signature -> list of (band_id, band_hash)."""
    keys = band_key_matrix(sig[None, :].astype(np.uint64), bands)[0]
    return [(b, int(keys[b])) for b in range(bands)]


def simhash64(tokens: list) -> int:
    """Charikar SimHash: 64-bit majority vote over token-hash bits."""
    if not tokens:
        return 0
    th = token_hashes(tokens)
    bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    votes = (2 * bits - 1).sum(axis=0)
    return int(np.packbits((votes > 0)[::-1]).view(">u8")[0])


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


_POPCOUNT_LUT = np.array([bin(i).count("1") for i in range(256)],
                         dtype=np.uint8)


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array (any shape) via a byte LUT —
    numpy 1.x has no bitwise_count; 8 LUT gathers + a sum replace the
    per-element Python ``bin(x).count`` loop."""
    x = np.ascontiguousarray(x, dtype=np.uint64)
    bytes_view = x.view(np.uint8).reshape(x.shape + (8,))
    return _POPCOUNT_LUT[bytes_view].sum(axis=-1, dtype=np.int64)


def hamming_matrix64(sh: np.ndarray) -> np.ndarray:
    """All-pairs Hamming distances of a uint64 signature vector ->
    (n, n) int64 — one xor outer product + vectorized popcount."""
    x = np.bitwise_xor.outer(sh.astype(np.uint64), sh.astype(np.uint64))
    return popcount64(x)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two unique-hash sets."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0
