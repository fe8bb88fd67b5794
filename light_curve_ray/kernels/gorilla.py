"""Gorilla time-series compression (delta-of-delta timestamps + XOR floats).

Public-knowledge encoding from Pelkonen et al., "Gorilla: A Fast, Scalable,
In-Memory Time Series Database", VLDB 2015 (§4.1.1 timestamps, §4.1.2 values).
Used by the rollup pipeline to pack each (series, tier) stream of
(bucket_ts, mean) into a single Arrow ``binary`` cell (SURVEY §2b-O8).

Layout (bit stream, MSB-first within bytes):

    header:  n       32-bit unsigned count
             t0      64-bit signed first timestamp (epoch microseconds)
             d0      64-bit signed first delta (0 when n == 1)
             v0      64-bit raw IEEE-754 bits of the first value
    per subsequent timestamp, D = delta-of-delta:
             D == 0            -> '0'
             -63   <= D <= 64  -> '10'   + 7-bit  (D + 63)
             -255  <= D <= 256 -> '110'  + 9-bit  (D + 255)
             -2047 <= D <= 2048-> '1110' + 12-bit (D + 2047)
             else              -> '1111' + 64-bit two's-complement D
    per subsequent value, X = bits(v) XOR bits(prev):
             X == 0 -> '0'
             X != 0, window reuse (leading >= prev leading AND
                     trailing >= prev trailing)       -> '10' + meaningful bits
             else   -> '11' + 6-bit leading-zero count + 6-bit length
                       (64 encoded as 0) + meaningful bits

Deviation from the paper, documented: the timestamp fallback class is 64-bit
(paper: 32) because epoch-microsecond streams overflow 32-bit deltas; and the
leading-zero field is 6 bits (paper: 5) so XORs with >31 leading zeros (common
for slowly varying rollup means) round-trip exactly.  Byte output is
deterministic — part of the golden contract (SURVEY §2b-O8).

NaN and -0.0 round-trip bit-exactly (values travel as raw IEEE bits).
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def bytes(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, width: int) -> int:
        out = 0
        remaining = width
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


def _signed(value: int, width: int) -> int:
    if value >= 1 << (width - 1):
        value -= 1 << width
    return value


def gorilla_encode(t_us: np.ndarray, v: np.ndarray) -> bytes:
    """Encode parallel (timestamp, value) arrays; timestamps must be sorted
    ascending (per-series co-sort runs first — SURVEY §2b-O3/R1)."""
    t = np.asarray(t_us, dtype=np.int64)
    vals = np.ascontiguousarray(np.asarray(v, dtype=np.float64)).view(np.uint64)
    if t.shape != vals.shape:
        raise ValueError("t and v must have the same length")
    n = t.size
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.bytes()
    w.write(int(t[0]), 64)
    d0 = int(t[1]) - int(t[0]) if n > 1 else 0
    w.write(d0, 64)
    w.write(int(vals[0]), 64)

    deltas = np.diff(t)
    dod = np.diff(deltas)
    for D in dod.tolist():
        if D == 0:
            w.write(0, 1)
        elif -63 <= D <= 64:
            w.write(0b10, 2)
            w.write(D + 63, 7)
        elif -255 <= D <= 256:
            w.write(0b110, 3)
            w.write(D + 255, 9)
        elif -2047 <= D <= 2048:
            w.write(0b1110, 4)
            w.write(D + 2047, 12)
        else:
            w.write(0b1111, 4)
            w.write(D, 64)

    prev_lead, prev_tail = -1, -1
    bits = vals.tolist()
    for i in range(1, n):
        xor = bits[i] ^ bits[i - 1]
        if xor == 0:
            w.write(0, 1)
            continue
        lead = 64 - xor.bit_length()
        tail = (xor & -xor).bit_length() - 1
        if prev_lead >= 0 and lead >= prev_lead and tail >= prev_tail:
            w.write(0b10, 2)
            width = 64 - prev_lead - prev_tail
            w.write(xor >> prev_tail, width)
        else:
            lead = min(lead, 63)
            width = 64 - lead - tail
            w.write(0b11, 2)
            w.write(lead, 6)
            w.write(width & 0x3F, 6)  # 64 -> 0
            w.write(xor >> tail, width)
            prev_lead, prev_tail = lead, tail
    return w.bytes()


def gorilla_decode(data: bytes):
    """Decode back to (t_us int64 array, v float64 array); exact inverse of
    ``gorilla_encode`` (round-trip identity is a property test)."""
    r = _BitReader(data)
    n = r.read(32)
    t = np.empty(n, dtype=np.int64)
    vbits = np.empty(n, dtype=np.uint64)
    if n == 0:
        return t, vbits.view(np.float64)
    t0 = _signed(r.read(64), 64)
    d0 = _signed(r.read(64), 64)
    v0 = r.read(64)
    t[0] = t0
    vbits[0] = v0
    delta = d0
    tick = t0
    if n > 1:
        tick += delta
        t[1] = tick  # d0 was stored explicitly in the header
    for i in range(2, n):
        if r.read(1) == 0:
            D = 0
        elif r.read(1) == 0:
            D = r.read(7) - 63
        elif r.read(1) == 0:
            D = r.read(9) - 255
        elif r.read(1) == 0:
            D = r.read(12) - 2047
        else:
            D = _signed(r.read(64), 64)
        delta = delta + D
        tick += delta
        t[i] = tick

    prev_lead, prev_tail = -1, -1
    prev = v0
    for i in range(1, n):
        if r.read(1) == 0:
            vbits[i] = prev
            continue
        if r.read(1) == 0:
            width = 64 - prev_lead - prev_tail
            xor = r.read(width) << prev_tail
        else:
            lead = r.read(6)
            width = r.read(6) or 64
            tail = 64 - lead - width
            xor = r.read(width) << tail
            prev_lead, prev_tail = lead, tail
        prev ^= xor
        vbits[i] = prev
    return t, vbits.view(np.float64)
