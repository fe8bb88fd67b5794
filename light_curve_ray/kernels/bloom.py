"""Bloom filter over 64-bit key hashes — the runtime-filter side of the
bloom semi-join (stages/joins.semi_join_bloom).

Classic partitioned-bloom math (Bloom 1970; the Spark/Impala "runtime
filter" pattern): m bits / k probes sized from the expected distinct-key
count and target false-positive rate.  Everything is vectorized numpy —
build scatters all k x n bit positions with one ``bitwise_or.at``; probe
gathers them with fancy indexing.  Positions use double hashing
(Kirsch & Mitzenmacher 2006): pos_i = h1 + i*h2 (mod m), with h1/h2
derived from the input u64 by two independent splitmix64 finalizers, so
one row hash (kernels/hashing.hash_columns_u64) feeds the whole probe
sequence.

Filters built over DISJOINT row subsets merge with bitwise OR — the
distributed-build requirement (per-block partials OR into the global
filter, order-independent; pinned by tests).
"""

from __future__ import annotations

import math

import numpy as np

_C1 = np.uint64(0xBF58476D1CE4E5B9)
_C2 = np.uint64(0x94D049BB133111EB)
_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def bloom_params(n_keys: int, fpp: float = 0.01) -> tuple:
    """(m_bits, k) for ``n_keys`` expected distinct keys at ``fpp``:
    m = -n ln p / (ln 2)^2 rounded up to a multiple of 64; k = m/n ln 2,
    clamped to [1, 16]."""
    n = max(1, int(n_keys))
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2.0) ** 2)))
    m = max(64, ((m + 63) // 64) * 64)
    k = int(round(m / n * math.log(2.0)))
    return m, min(16, max(1, k))


def _mix(x: np.ndarray, c: np.uint64) -> np.ndarray:
    """splitmix64 finalizer with mixing constant ``c``."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * c
        x = (x ^ (x >> np.uint64(27))) * _C2
        return x ^ (x >> np.uint64(31))


def _positions(hashes: np.ndarray, k: int, m_bits: int) -> np.ndarray:
    """(k, n) bit positions via double hashing; h2 forced odd so the
    probe sequence walks the whole table for power-of-two-free m too."""
    h = np.asarray(hashes, dtype=np.uint64)
    h1 = _mix(h, _C1)
    h2 = _mix(h ^ _GAMMA, _GAMMA) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[:, None]
    with np.errstate(over="ignore"):
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(m_bits))


def bloom_empty(m_bits: int) -> np.ndarray:
    return np.zeros(m_bits // 8, dtype=np.uint8)


def bloom_add(bits: np.ndarray, hashes: np.ndarray, k: int) -> None:
    """Set all k probe bits for every hash, in place (vectorized)."""
    if len(hashes) == 0:
        return
    pos = _positions(hashes, k, len(bits) * 8).ravel()
    np.bitwise_or.at(bits, (pos >> np.uint64(3)).astype(np.int64),
                     np.left_shift(np.uint8(1),
                                   (pos & np.uint64(7)).astype(np.uint8)))


def bloom_probe(bits: np.ndarray, hashes: np.ndarray, k: int) -> np.ndarray:
    """Boolean membership mask (no false negatives; false positives at
    the configured rate)."""
    if len(hashes) == 0:
        return np.zeros(0, dtype=bool)
    pos = _positions(hashes, k, len(bits) * 8)
    byte = (pos >> np.uint64(3)).astype(np.int64)
    bit = (pos & np.uint64(7)).astype(np.uint8)
    hit = (bits[byte] >> bit) & np.uint8(1)
    return hit.all(axis=0)
