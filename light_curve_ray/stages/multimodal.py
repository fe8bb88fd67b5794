"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary()`` columns with a
small typed-metadata struct, exactly like the fat ``html`` column in the
pages pipeline: read column-pruned, decoded in a stateful actor-pool
``map_batches`` stage with SMALL batches (payloads are orders of magnitude
fatter than text rows), and the payload column dropped as soon as features
are extracted so downstream shuffles never move it.

Codec tiers (``PayloadDecodeStage``):

- ``codec="auto"`` (default) dispatches on the payload's magic bytes and
  REALLY decodes the formats implementable with the stdlib: RIFF/WAVE
  PCM audio (``wave`` module; per-sample mean/std, channel/bit-depth/
  frame metadata), binary PPM/PGM images (P5/P6 header parsing incl.
  comments; per-pixel mean/std), and — round 3 — **GIF87a/GIF89a with a
  full LZW decompressor** (variable code width, CLEAR/EOI, the KwKwK
  case, interlace reordering, per-frame palettes; animated streams walk
  every frame for ``n_frames`` and fully decode the first), **PNG
  with a full chunk/CRC/deflate/row-filter pipeline** (stdlib ``zlib``
  inflate; all five filters reversed; gray/RGB/alpha/palette color
  types; Adam7 rejected loudly), and **baseline-sequential JPEG
  (ITU T.81) from scratch**: marker walk, table-driven DQT/DHT parsing,
  Huffman entropy decode with byte unstuffing + restart markers, DC
  prediction, dequantize + exact orthonormal 8x8 IDCT, chroma
  upsampling (4:2:0/4:2:2/anything the SOF declares), JFIF YCbCr->RGB
  — plus the LCRF test container below.  Unknown magics come back
  ``decode_ok=false``.
- ``codec="real"`` raises NotImplementedError at actor construction —
  the remaining integration point for formats that genuinely need
  external libraries (mp3/h264/progressive-JPEG); GIF, PNG and baseline
  JPEG show the full pattern a linked codec plugs into.
- ``codec="fake"`` parses only the deterministic LCRF container written
  by ``fake_payload`` — a 16-byte header (magic ``LCRF``, kind, width,
  height, n_frames) + raw bytes.

All of the Ray-side plumbing (schema, batch sizing, actor signature,
output layout, column drop) is shared by every codec tier and exercised
by tests/test_textstats_multimodal.py.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

_MAGIC = b"LCRF"
_KINDS = {0: "image", 1: "audio", 2: "video"}
_HEADER = struct.Struct("<4sBxHHI")  # magic, kind, width, height, n_frames


def fake_payload(kind: str, width: int, height: int, n_frames: int,
                 seed: int) -> bytes:
    """Deterministic synthetic payload (header + seeded bytes)."""
    kind_id = {v: k for k, v in _KINDS.items()}[kind]
    rng = np.random.RandomState(seed)
    body_len = min(width * height, 4096)
    body = rng.randint(0, 256, size=body_len, dtype=np.int32).astype(np.uint8)
    return _HEADER.pack(_MAGIC, kind_id, width, height, n_frames) + body.tobytes()


def decode_fake(payload: bytes) -> dict:
    """Parse one LCRF payload -> feature dict; raises on bad magic."""
    magic, kind_id, width, height, n_frames = _HEADER.unpack_from(payload)
    if magic != _MAGIC:
        raise ValueError("not an LCRF payload")
    body = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER.size)
    return {
        "kind": _KINDS.get(kind_id, "unknown"),
        "width": width,
        "height": height,
        "n_frames": n_frames,
        "n_bytes": len(body),
        "byte_mean": float(body.mean()) if body.size else 0.0,
        "byte_std": float(body.std()) if body.size else 0.0,
    }


# ---------------------------------------------------- real stdlib codecs

def synth_wav(n_samples: int, freq_hz: float, rate: int = 8000,
              seed: int = 0) -> bytes:
    """Deterministic 16-bit mono PCM WAV (stdlib ``wave`` writer)."""
    import io
    import wave

    t = np.arange(n_samples, dtype=np.float64) / rate
    rng = np.random.RandomState(seed)
    sig = (0.6 * np.sin(2 * np.pi * freq_hz * t)
           + 0.1 * rng.standard_normal(n_samples))
    pcm = np.clip(sig * 32767.0, -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def synth_ppm(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic binary PPM (P6) image."""
    rng = np.random.RandomState(seed)
    body = rng.randint(0, 256, size=width * height * 3,
                       dtype=np.int32).astype(np.uint8)
    return (f"P6\n# synthetic\n{width} {height}\n255\n".encode("ascii")
            + body.tobytes())


def decode_wav(payload: bytes) -> dict:
    """REAL RIFF/WAVE PCM decode via the stdlib ``wave`` module."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        nframes = w.getnframes()
        raw = w.readframes(nframes)
    if sw == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128
    else:  # 24/32-bit PCM left to the "real" tier
        raise ValueError(f"unsupported sample width {sw}")
    return {
        "kind": "audio",
        "width": nch,                      # channels
        "height": sw * 8,                  # bit depth
        "n_frames": nframes,
        "n_bytes": len(raw),
        "byte_mean": float(samples.mean()) if samples.size else 0.0,
        "byte_std": float(samples.std()) if samples.size else 0.0,
    }


def decode_pnm(payload: bytes) -> dict:
    """REAL binary PPM/PGM (P6/P5) decode: header incl. comments, then
    the raw pixel plane."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    # header tokens: width, height, maxval; '#' comments run to newline
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM left to the 'real' tier")
    nch = 3 if magic == b"P6" else 1
    need = width * height * nch
    pixels = np.frombuffer(payload, dtype=np.uint8, offset=pos, count=need)
    return {
        "kind": "image",
        "width": width,
        "height": height,
        "n_frames": 1,
        "n_bytes": int(need),
        "byte_mean": float(pixels.mean()) if pixels.size else 0.0,
        "byte_std": float(pixels.std()) if pixels.size else 0.0,
    }


# ------------------------------------- real COMPRESSED codec: GIF (LZW)

def _lzw_encode_gif(data: bytes, min_code_size: int) -> bytes:
    """GIF-variant LZW compression (LSB-first bit packing, CLEAR/EOI
    codes, dictionary growth to 12 bits, CLEAR-reset at 4096).  Used by
    synth_gif; the per-byte Python loop is fine for fixture synthesis —
    the DECODER below is the production surface."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    prefix = b""
    for byte in data:
        cand = prefix + bytes([byte])
        if cand in table:
            prefix = cand
            continue
        emit(table[prefix], code_size)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # deferred bump: the decoder's table lags one entry behind
            # (it learns an entry's last byte from the NEXT code), so the
            # encoder widens one code later than the naive check
            if next_code == (1 << code_size) + 1 and code_size < 12:
                code_size += 1
        else:
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        prefix = bytes([byte])
    if prefix:
        emit(table[prefix], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def _lzw_decode_gif(data: bytes, min_code_size: int) -> np.ndarray:
    """GIF-variant LZW decompression — the real thing: variable code
    width, CLEAR/EOI, the code==next_code (KwKwK) case, deferred-clear
    full-table streams."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    bitbuf = 0
    nbits = 0
    pos = 0
    table: list = []
    next_code = 0
    code_size = min_code_size + 1
    prev = b""

    def reset():
        nonlocal table, next_code, code_size, prev
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        next_code = eoi + 1
        code_size = min_code_size + 1
        prev = b""

    reset()
    while True:
        while nbits < code_size:
            if pos >= len(data):  # truncated stream: return what we have
                return np.frombuffer(bytes(out), dtype=np.uint8)
            bitbuf |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if not prev:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError("corrupt LZW stream")
        out += entry
        if prev and next_code < 4096:
            table.append(prev + entry[:1])
            next_code += 1
            if next_code == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return np.frombuffer(bytes(out), dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def synth_gif(width: int, height: int, seed: int = 0,
              interlaced: bool = False) -> bytes:
    """Deterministic single-frame GIF89a with a 256-entry global palette
    and REAL LZW-compressed pixel data (structured pixels so the
    dictionary actually grows)."""
    import struct

    rng = np.random.RandomState(seed)
    # structured + noisy indices: runs compress, noise exercises growth
    grad = (np.arange(width * height, dtype=np.int64)
            * 17 // max(width, 1)) % 256
    noise = rng.randint(0, 8, size=width * height)
    idx = ((grad + noise) % 256).astype(np.uint8).reshape(height, width)
    if interlaced:
        rows = [r for start, step in _GIF_INTERLACE_PASSES
                for r in range(start, height, step)]
        stored = idx[rows]
    else:
        stored = idx
    pal = bytearray()
    for i in range(256):
        pal += bytes((i, (i * 7) % 256, (i * 13) % 256))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # LSD + GCT
    out += pal
    flags = 0x40 if interlaced else 0x00
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, flags)
    out.append(8)  # LZW min code size
    comp = _lzw_encode_gif(stored.tobytes(), 8)
    for i in range(0, len(comp), 255):
        block = comp[i:i + 255]
        out.append(len(block))
        out += block
    out.append(0)     # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(payload: bytes) -> dict:
    """REAL GIF87a/GIF89a decode, pure stdlib+numpy: logical screen +
    palettes parsed, extensions skipped, the FIRST frame fully
    LZW-decompressed (incl. interlace reordering) and mapped through its
    palette for the byte stats; remaining frames are walked block-wise
    (no decode needed to skip) so ``n_frames`` counts every image in an
    animated stream."""
    import struct

    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    width, height, flags, _bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload, np.uint8, count=3 * n,
                            offset=pos).reshape(n, 3)
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while payload[p] != 0:
            p += 1 + payload[p]
        return p + 1

    n_frames = 0
    stats: dict | None = None
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 2)
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        _l, _t, iw, ih, iflags = struct.unpack_from("<HHHHB", payload,
                                                    pos + 1)
        pos += 10
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(payload, np.uint8, count=3 * n,
                                offset=pos).reshape(n, 3)
            pos += 3 * n
        min_code = payload[pos]
        pos += 1
        if n_frames == 0:
            chunks = []
            p = pos
            while payload[p] != 0:
                ln = payload[p]
                chunks.append(payload[p + 1:p + 1 + ln])
                p += 1 + ln
            pos = p + 1
            idx = _lzw_decode_gif(b"".join(chunks), min_code)[:iw * ih]
            if iflags & 0x40:  # interlaced: restore natural row order
                rows = [r for start, step in _GIF_INTERLACE_PASSES
                        for r in range(start, ih, step)]
                natural = np.empty((ih, iw), dtype=np.uint8)
                natural[rows] = idx.reshape(ih, iw)
                idx = natural.ravel()
            if pal is None:
                raise ValueError("GIF frame without a color table")
            rgb = pal[np.minimum(idx, len(pal) - 1)].astype(np.float64)
            stats = {
                "kind": "image",
                "width": int(iw),
                "height": int(ih),
                "n_bytes": int(rgb.size),
                "byte_mean": float(rgb.mean()) if rgb.size else 0.0,
                "byte_std": float(rgb.std()) if rgb.size else 0.0,
            }
        else:
            pos = skip_subblocks(pos)
        n_frames += 1
    if stats is None:
        raise ValueError("GIF contains no image frame")
    stats["n_frames"] = n_frames
    return stats


# --------------------------------- real compressed codec: PNG (deflate)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> channels


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_ = abs(p - a)
    pb = abs(p - b)
    pc = abs(p - c)
    if pa_ <= pb and pa_ <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG row filters (spec §9): None/Sub/Up/Average/
    Paeth.  Sub collapses to a strided cumulative sum and Up to one
    vectorized add; Average/Paeth carry a left-neighbor dependency, so
    those rows run a per-pixel loop (payload decode is actor-parallel
    across payloads; single-image latency is not the hot path)."""
    stride = width * bpp
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, np.uint8, count=stride,
                            offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = row
        elif ftype == 1:  # Sub: prefix sum per byte lane, stride bpp
            lanes = row.reshape(width, bpp)
            out[y] = np.cumsum(lanes.astype(np.int64), axis=0).astype(
                np.uint8).reshape(stride)
        elif ftype == 2:  # Up
            out[y] = row + prev
        elif ftype == 3:  # Average
            o = out[y]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                o[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                o[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def synth_png(width: int, height: int, seed: int = 0,
              color_type: int = 2) -> bytes:
    """Deterministic PNG (8-bit, non-interlaced) with REAL deflate
    compression and a MIX of row filters (y % 5) so every unfilter path
    is exercised."""
    import zlib

    nch = _PNG_CHANNELS[color_type]
    rng = np.random.RandomState(seed)
    base = (np.arange(width * nch, dtype=np.int64) * 3) % 251
    img = np.empty((height, width * nch), dtype=np.uint8)
    for y in range(height):
        img[y] = ((base + y * 7) % 256 + rng.randint(0, 4, width * nch)) % 256
    bpp = nch
    raw = bytearray()
    for y in range(height):
        ftype = y % 5
        row = img[y].astype(np.int64)
        prev = img[y - 1].astype(np.int64) if y else np.zeros(
            width * nch, dtype=np.int64)
        if ftype == 0:
            filt = row
        elif ftype == 1:
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            filt = (row - left) % 256
        elif ftype == 2:
            filt = (row - prev) % 256
        elif ftype == 3:
            left = np.concatenate([np.zeros(bpp, np.int64), row[:-bpp]])
            filt = (row - ((left + prev) >> 1)) % 256
        else:
            filt = np.empty_like(row)
            for x in range(width * nch):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                filt[x] = (int(row[x]) - _paeth(left, int(prev[x]), ul)) % 256
        raw.append(ftype)
        raw += filt.astype(np.uint8).tobytes()

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
            + chunk(b"IEND", b""))


def decode_png(payload: bytes) -> dict:
    """REAL PNG decode, pure stdlib+numpy: chunk walk with CRC checks,
    concatenated-IDAT zlib inflate, all five row filters reversed, PLTE
    palette mapping for color type 3.  8-bit non-interlaced images (the
    PNG baseline); Adam7 is rejected loudly."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    color_type = None
    plte = None
    idat = bytearray()
    while pos < len(payload):
        ln, tag = struct.unpack_from(">I4s", payload, pos)
        body = payload[pos + 8:pos + 8 + ln]
        crc, = struct.unpack_from(">I", payload, pos + 8 + ln)
        if crc != (zlib.crc32(tag + body) & 0xFFFFFFFF):
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        pos += 12 + ln
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", body)
            if depth != 8:
                raise ValueError("non-8-bit PNG left to the 'real' tier")
            if interlace:
                raise ValueError("Adam7 PNG left to the 'real' tier")
        elif tag == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    nch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    img = _png_unfilter(raw, width, height, nch)
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        vals = plte[np.minimum(img.ravel(), len(plte) - 1)].astype(
            np.float64)
    else:
        vals = img.astype(np.float64)
    if color_type == 3:
        gray = vals.reshape(height, width, 3).mean(axis=2)
    elif nch >= 3:
        gray = img.astype(np.float64).reshape(
            height, width, nch)[:, :, :3].mean(axis=2)
    else:
        gray = img.astype(np.float64).reshape(height, width * nch)[
            :, :width]
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "n_frames": 1,
        "n_bytes": int(vals.size),
        "byte_mean": float(vals.mean()) if vals.size else 0.0,
        "byte_std": float(vals.std()) if vals.size else 0.0,
        # (h, w) float64 luminance plane for the feature-extract stage
        # (channel mean; scalar-only consumers just ignore it)
        "gray": gray,
    }


# ----------------------- real DCT-era codec: baseline JPEG (ITU T.81)
#
# A from-scratch baseline-sequential JPEG codec, pure stdlib+numpy —
# public spec only (ITU-T T.81 / ISO 10918-1): marker walk, DQT/DHT
# table parsing (the decoder is fully table-driven, so real-world
# baseline files decode with whatever tables they carry), MCU entropy
# decode with byte unstuffing and restart markers, DC prediction,
# zigzag + dequantize, exact float64 8x8 IDCT (orthonormal DCT-III
# matrix), chroma upsampling for subsampled scans, JFIF YCbCr->RGB.
# Progressive (SOF2) and arithmetic coding are rejected loudly.  The
# encoder exists to synthesize REAL compressed fixtures (Annex K
# quantization + Huffman tables, 4:2:0 or 4:4:4 or grayscale).

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_JPEG_QL = np.array([  # Annex K.1 luminance quant, natural order
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

_JPEG_QC = np.array([  # Annex K.2 chrominance quant
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K.3 Huffman specs: (BITS[1..16], HUFFVAL)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA])


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: row k = c_k * cos((2x+1)k*pi/16),
    c_0 = 1/(2*sqrt 2), c_k = 1/2.  Its 2-D transform M @ b @ M.T equals
    T.81's F(u,v) = 1/4 C(u)C(v) sum-sum exactly, and M.T @ F @ M is the
    spec's IDCT."""
    k = np.arange(8).reshape(8, 1)
    x = np.arange(8).reshape(1, 8)
    m = np.cos((2 * x + 1) * k * np.pi / 16.0) * 0.5
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _huff_canonical(bits: list, vals: list):
    """Canonical codes: [(code, length, symbol)] in spec order."""
    out = []
    code = 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out.append((code, ln, vals[i]))
            code += 1
            i += 1
        code <<= 1
    return out


class _HuffEncoder:
    def __init__(self, bits, vals):
        self.map = {sym: (code, ln)
                    for code, ln, sym in _huff_canonical(bits, vals)}


class _HuffDecoder:
    def __init__(self, bits, vals):
        self.by_len = {}
        for code, ln, sym in _huff_canonical(bits, vals):
            self.by_len.setdefault(ln, {})[code] = sym


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def flush(self):
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self):
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker: caller resyncs
                raise _RestartMarker(self.pos)
            else:
                raise ValueError(f"marker 0xFF{nxt:02X} inside scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, s: int) -> int:
        v = 0
        for _ in range(s):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: _HuffDecoder) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bit()
            sym = table.by_len.get(ln, {}).get(code)
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in scan")

    def resync(self, pos: int):
        """Skip the restart marker at ``pos`` and reset bit state."""
        self.pos = pos + 2
        self.acc = 0
        self.n = 0


class _RestartMarker(Exception):
    def __init__(self, pos):
        self.pos = pos


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _magnitude(v: int):
    """(size, code-bits) of a DC diff / AC coefficient."""
    s = abs(v).bit_length()
    if v < 0:
        v += (1 << s) - 1
    return s, v


def synth_jpeg(width: int, height: int, seed: int = 0,
               mode: str = "420", restart_every: int = 0) -> bytes:
    """Deterministic REAL baseline JPEG: smooth gradient + low-freq
    texture (so Annex-K quantization keeps it recognizable), encoded
    from scratch.  ``mode``: '420' (subsampled color), '444', 'gray';
    ``restart_every`` emits DRI + RSTn markers every N MCUs.  Returns
    the compressed bytes; ``synth_jpeg_pixels`` gives the exact source
    image for round-trip PSNR checks."""
    img = synth_jpeg_pixels(width, height, seed, mode)
    return _encode_jpeg(img, mode, restart_every=restart_every)


def synth_jpeg_pixels(width: int, height: int, seed: int = 0,
                      mode: str = "420") -> np.ndarray:
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:height, 0:width].astype(np.float64)
    base = (128 + 80 * np.sin(x / 17.0) * np.cos(y / 13.0)
            + 40 * np.sin((x + y) / 29.0))
    if mode == "gray":
        img = base[:, :, None]
    else:
        r = base + 30 * np.sin(x / 11.0)
        g = base
        b = base + 30 * np.cos(y / 9.0)
        img = np.stack([r, g, b], axis=2)
    img += rng.normal(0, 2.0, img.shape)
    return np.clip(np.round(img), 0, 255).astype(np.uint8)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a padded plane -> quantized zigzag coeffs
    (n_blocks_y, n_blocks_x, 64), vectorized over blocks."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = (plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
              .astype(np.float64) - 128.0)
    # (_DCT_M / 2) is the ORTHONORMAL 8x8 DCT-II basis, whose 2-D
    # transform equals T.81's F(u,v) = 1/4 C(u)C(v) sum-sum exactly
    # (c(0) = 1/(2*sqrt 2) = C(0)/4-scaled); the decoder applies the
    # orthonormal inverse, which is the spec's IDCT
    coef = np.einsum("ij,abjk,lk->abil", _DCT_M, blocks, _DCT_M)
    zz = coef.reshape(by, bx, 64)[:, :, _ZIGZAG]
    return np.round(zz / q[None, None, :]).astype(np.int64)


def _pad_to(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    h, w = plane.shape
    ph = (mh - h % mh) % mh
    pw = (mw - w % mw) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _encode_block(w: _BitWriter, zz: np.ndarray, pred: int,
                  dc: _HuffEncoder, ac: _HuffEncoder) -> int:
    diff = int(zz[0]) - pred
    s, bitsv = _magnitude(diff)
    code, ln = dc.map[s]
    w.write(code, ln)
    if s:
        w.write(bitsv, s)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac.map[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s, bitsv = _magnitude(v)
        code, ln = ac.map[(run << 4) | s]
        w.write(code, ln)
        w.write(bitsv, s)
        run = 0
    if last < 63:
        code, ln = ac.map[0x00]  # EOB
        w.write(code, ln)
    return int(zz[0])


def _encode_jpeg(img: np.ndarray, mode: str,
                 restart_every: int = 0) -> bytes:
    h, w = img.shape[:2]
    gray = mode == "gray"
    if gray:
        planes = [img[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    else:
        rgb = img.astype(np.float64)
        yy = (0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1]
              + 0.114 * rgb[:, :, 2])
        cb = 128.0 - 0.168735892 * rgb[:, :, 0] \
            - 0.331264108 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418687589 * rgb[:, :, 1] \
            - 0.081312411 * rgb[:, :, 2]
        if mode == "420":
            samp = [(2, 2), (1, 1), (1, 1)]
            pad = _pad_to(yy, 2, 2)
            cb = (_pad_to(cb, 2, 2).reshape(pad.shape[0] // 2, 2, -1, 2)
                  .mean(axis=(1, 3)))
            cr = (_pad_to(cr, 2, 2).reshape(pad.shape[0] // 2, 2, -1, 2)
                  .mean(axis=(1, 3)))
            planes = [yy, cb, cr]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
            planes = [yy, cb, cr]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    qtabs = [_JPEG_QL] + ([] if gray else [_JPEG_QC])
    coeffs = []
    for ci, (plane, (sh, sv)) in enumerate(zip(planes, samp)):
        q = qtabs[0 if ci == 0 else 1][_ZIGZAG]
        # pad plane so its block grid covers ceil(mcus) * sampling
        mcux = -(-w // (8 * hmax))
        mcuy = -(-h // (8 * vmax))
        need_w, need_h = mcux * 8 * sh, mcuy * 8 * sv
        ph, pw = plane.shape
        padded = np.pad(np.round(plane),
                        ((0, need_h - ph), (0, need_w - pw)), mode="edge")
        coeffs.append(_fdct_quant(padded, q.astype(np.float64)))
    enc_dc = [_HuffEncoder(*_DC_L)] + \
        ([] if gray else [_HuffEncoder(*_DC_C)] * 2)
    enc_ac = [_HuffEncoder(*_AC_L)] + \
        ([] if gray else [_HuffEncoder(*_AC_C)] * 2)
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    scan = bytearray()
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_every and n_mcu and n_mcu % restart_every == 0:
                scan += bw.flush()
                scan += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                bw = _BitWriter()
                preds = [0] * len(planes)
            n_mcu += 1
            for ci, (sh, sv) in enumerate(samp):
                for by in range(sv):
                    for bx in range(sh):
                        zz = coeffs[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            bw, zz, preds[ci], enc_dc[ci], enc_ac[ci])
    scan += bw.flush()

    out = bytearray(b"\xFF\xD8")  # SOI

    def seg(marker: int, body: bytes):
        out.extend(struct.pack(">BBH", 0xFF, marker, len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(_JPEG_QL[_ZIGZAG].tolist()))
    if not gray:
        seg(0xDB, bytes([1]) + bytes(_JPEG_QC[_ZIGZAG].tolist()))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    seg(0xC0, sof)
    for cls, tid, (bits, vals) in ((0, 0, _DC_L), (1, 0, _AC_L)):
        seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if not gray:
        for cls, tid, (bits, vals) in ((0, 1, _DC_C), (1, 1, _AC_C)):
            seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    if restart_every:
        seg(0xDD, struct.pack(">H", restart_every))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)
    out.extend(scan)
    out.extend(b"\xFF\xD9")  # EOI
    return bytes(out)


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Full baseline JPEG decode -> uint8 (h, w, ncomp) pixel array."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt = {}
    dc_tabs = {}
    ac_tabs = {}
    comps = None
    h = w = None
    restart = 0
    data = payload
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        ln, = struct.unpack_from(">H", data, pos)
        body = data[pos + 2:pos + ln]
        seg_end = pos + ln
        if marker == 0xDB:
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 15
                p += 1
                if pq:
                    tab = np.frombuffer(body, ">u2", 64, p).astype(np.int64)
                    p += 128
                else:
                    tab = np.frombuffer(body, np.uint8, 64, p).astype(
                        np.int64)
                    p += 64
                nat = np.empty(64, np.int64)
                nat[_ZIGZAG] = tab
                qt[tq] = nat
        elif marker in (0xC0, 0xC1):
            prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("non-8-bit JPEG unsupported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci:9 + 3 * ci]
                comps.append(dict(cid=cid, h=hv >> 4, v=hv & 15, tq=tq))
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arith) "
                             "unsupported")
        elif marker == 0xC4:
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 15
                bits = list(body[p + 1:p + 17])
                nv = sum(bits)
                vals = list(body[p + 17:p + 17 + nv])
                tab = _HuffDecoder(bits, vals)
                (dc_tabs if cls == 0 else ac_tabs)[tid] = tab
                p += 17 + nv
        elif marker == 0xDD:
            restart, = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:
            ns = body[0]
            scomp = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                c = next(c for c in comps if c["cid"] == cs)
                scomp.append((c, tt >> 4, tt & 15))
            pos = seg_end
            return _decode_scan(data, pos, w, h, scomp, qt, dc_tabs,
                                ac_tabs, restart)
        pos = seg_end
    raise ValueError("JPEG missing SOS scan")


def _decode_scan(data, pos, w, h, scomp, qt, dc_tabs, ac_tabs, restart):
    hmax = max(c["h"] for c, _, _ in scomp)
    vmax = max(c["v"] for c, _, _ in scomp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c, _, _ in scomp:
        planes.append(np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                               dtype=np.float64))
    br = _BitReader(data, pos)
    preds = [0] * len(scomp)
    idct_m = _DCT_M
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                # drop the byte-alignment pad bits, then the restart
                # marker must follow; resync and reset every DC predictor
                br.n = 0
                if not (br.data[br.pos] == 0xFF
                        and 0xD0 <= br.data[br.pos + 1] <= 0xD7):
                    raise ValueError("expected restart marker")
                br.resync(br.pos)
                preds = [0] * len(scomp)
            n_mcu += 1
            for ci, (c, dct, act) in enumerate(scomp):
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        s = br.huff(dc_tabs[dct])
                        diff = _extend(br.receive(s), s)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k <= 63:
                            rs = br.huff(ac_tabs[act])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.receive(s), s)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[_ZIGZAG] = zz * q[_ZIGZAG]
                        blk = idct_m.T @ nat.reshape(8, 8) @ idct_m
                        py, px = (my * c["v"] + by) * 8, \
                            (mx * c["h"] + bx) * 8
                        planes[ci][py:py + 8, px:px + 8] = blk + 128.0
    full = []
    for (c, _, _), plane in zip(scomp, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        yy, cb, cr = full
        r = yy + 1.402 * (cr - 128.0)
        g = yy - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        b = yy + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG -> feature dict (same layout as the other codecs)."""
    px = decode_jpeg_pixels(payload).astype(np.float64)
    h, w = px.shape[:2]
    return {
        "kind": "image",
        "width": int(w),
        "height": int(h),
        "n_frames": 1,
        "n_bytes": int(px.size),
        "byte_mean": float(px.mean()) if px.size else 0.0,
        "byte_std": float(px.std()) if px.size else 0.0,
    }


def decode_auto(payload: bytes) -> dict:
    """Magic-byte dispatch across the implemented decoders."""
    if payload[:4] == _MAGIC:
        return decode_fake(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(payload)
    if payload[:8] == _PNG_SIG:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        return decode_jpeg(payload)
    raise ValueError("unknown payload format")


class PayloadDecodeStage:
    """binary payload batch -> typed features; drops the payload column.

    Actor-pool stage: decoder state is built once per actor in __init__.
    Use SMALL ``batch_size`` (e.g. 32-128) — a batch × concurrency of fat
    payloads must fit the worker heap (SURVEY §4 memory row).
    """

    def __init__(self, payload_col: str = "payload", codec: str = "auto"):
        self.payload_col = payload_col
        if codec == "real":
            raise NotImplementedError(
                "mp3/h264/progressive-JPEG decode needs libsndfile/pyav/"
                "libjpeg — not in this container; plug the decoder here.  "
                "WAV PCM, PPM/PGM, GIF (LZW), PNG (deflate) and BASELINE "
                "JPEG (Huffman+DCT) all decode for real under "
                "codec='auto'."
            )
        if codec not in ("fake", "auto"):
            raise ValueError(f"unknown codec {codec!r}")
        self.codec = codec
        self._decode = decode_fake if codec == "fake" else decode_auto

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        feats = {
            "kind": [""] * n,
            "width": np.zeros(n, np.int64),
            "height": np.zeros(n, np.int64),
            "n_frames": np.zeros(n, np.int64),
            "n_bytes": np.zeros(n, np.int64),
            "byte_mean": np.zeros(n, np.float64),
            "byte_std": np.zeros(n, np.float64),
        }
        ok = np.ones(n, dtype=bool)
        for i, p in enumerate(payloads):
            try:
                d = self._decode(p)
            except Exception:
                ok[i] = False
                continue
            feats["kind"][i] = d["kind"]
            for c in ("width", "height", "n_frames", "n_bytes",
                      "byte_mean", "byte_std"):
                feats[c][i] = d[c]
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("kind", pa.array(feats["kind"], pa.string()))
        for c in ("width", "height", "n_frames", "n_bytes"):
            out = out.append_column(c, pa.array(feats[c], pa.int64()))
        for c in ("byte_mean", "byte_std"):
            out = out.append_column(c, pa.array(feats[c], pa.float64()))
        return out.append_column("decode_ok", pa.array(ok, pa.bool_()))


def decode_payloads(ds, payload_col: str = "payload", codec: str = "auto",
                    batch_size: int = 64):
    """Dataset plumbing for payload decode (small batches, actor pool)."""
    return ds.map_batches(
        PayloadDecodeStage,
        fn_constructor_kwargs=dict(payload_col=payload_col, codec=codec),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(2, 8),
        num_cpus=1,
    )


# ----------------------- feature-extract / resize / frame-sample stages

def pnm_gray(payload: bytes) -> np.ndarray:
    """P5/P6 payload -> (h, w) float64 grayscale plane (P6 averages the
    three channels; same header walk as decode_pnm)."""
    magic = payload[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PNM left to the 'real' tier")
    nch = 3 if magic == b"P6" else 1
    px = np.frombuffer(payload, np.uint8, count=width * height * nch,
                       offset=pos).astype(np.float64)
    if nch == 3:
        px = px.reshape(height, width, 3).mean(axis=2)
    else:
        px = px.reshape(height, width)
    return px


def resize_area(gray: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic area-average downsample (the thumbnail op): output
    cell (i, j) is the mean of the input block [floor(i*h/out_h),
    floor((i+1)*h/out_h)) x [same in w) — exact block means via two
    reduceat passes, no interpolation kernels, no float index math."""
    h, w = gray.shape
    if out_h > h or out_w > w:
        raise ValueError("resize_area only downsamples")
    rb = (np.arange(out_h, dtype=np.int64) * h) // out_h
    cb = (np.arange(out_w, dtype=np.int64) * w) // out_w
    rc = np.diff(np.append(rb, h)).astype(np.float64)
    cc = np.diff(np.append(cb, w)).astype(np.float64)
    rows = np.add.reduceat(gray, rb, axis=0)
    cells = np.add.reduceat(rows, cb, axis=1)
    return cells / (rc[:, None] * cc[None, :])


def image_dhash(gray: np.ndarray) -> int:
    """64-bit perceptual difference hash: area-resize to 8x9, compare
    horizontally adjacent cells (strictly brighter -> 1).  Invariant to
    uniform brightness shift and scale-robust — Hamming distance on the
    returned int is the standard image near-dup metric (composes with
    the engine's SimHash banding for image dedup at scale).  Returned as
    a PYTHON int in [0, 2^64)."""
    t = resize_area(gray, 8, 9)
    bits = (t[:, 1:] > t[:, :-1]).ravel()
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def _dctii_matrix(n: int) -> np.ndarray:
    """Orthonormal n-point DCT-II basis (the 8x8 JPEG basis generalized
    to n — same normalization, see _dct_matrix)."""
    x = np.arange(n, dtype=np.float64)
    m = np.cos((2.0 * x[None, :] + 1.0) * x[:, None] * np.pi / (2 * n))
    m *= np.sqrt(2.0 / n)
    m[0] *= 1.0 / np.sqrt(2.0)
    return m


_DCT_CACHE: dict = {}


def _dctii_cached(n: int) -> np.ndarray:
    m = _DCT_CACHE.get(n)
    if m is None:
        m = _DCT_CACHE[n] = _dctii_matrix(n)
    return m


def image_phash(gray: np.ndarray) -> int:
    """64-bit perceptual DCT hash (classic pHash): area-resize to
    32x32 (clamped to the image size — resize_area only downsamples),
    2-D orthonormal DCT-II, keep the top-left 8x8 low-frequency
    block, threshold each coefficient against the MEDIAN of the
    non-DC coefficients (63 of them at full size — odd count, so the
    median is an exact element, no interpolation ambiguity).
    Invariant to uniform brightness scaling (the DCT is linear, so
    the median scales with the coefficients) and robust to
    blur/resize — the frequency-domain complement of image_dhash's
    gradient signs.  Returned as a PYTHON int in [0, 2^64)."""
    h, w = gray.shape
    th, tw = min(32, h), min(32, w)
    t = resize_area(gray, th, tw)
    d = _dctii_cached(th) @ t @ _dctii_cached(tw).T
    block = d[:min(8, th), :min(8, tw)].ravel()
    med = float(np.median(block[1:])) if len(block) > 1 else 0.0
    out = 0
    for b in (block > med):
        out = (out << 1) | int(b)
    return out


def frame_sample_indices(n_frames: int, k: int) -> np.ndarray:
    """Deterministic frame sampling: k indices evenly spread over
    [0, n_frames), always including the first frame, strictly
    increasing (fewer than k when n_frames < k)."""
    if n_frames <= 0:
        return np.empty(0, dtype=np.int64)
    k = min(k, n_frames)
    return np.unique((np.arange(k, dtype=np.int64)
                      * n_frames) // k)


def audio_spectral(payload: bytes) -> dict:
    """WAV PCM payload -> spectral features via the real FFT:
    rms, spectral centroid (Hz), bandwidth (Hz, centroid-centred std),
    rolloff85 (Hz below which 85% of magnitude mass sits) and the
    dominant frequency (peak |rfft| bin, Hz).  Deterministic numpy;
    mono = channel mean."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        nch = w.getnchannels()
        sw = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.float64)
    elif sw == 1:
        s = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
    else:
        raise ValueError(f"unsupported sample width {sw}")
    if nch > 1:
        s = s.reshape(-1, nch).mean(axis=1)
    n = len(s)
    if n == 0:
        return {"rms": 0.0, "spectral_centroid_hz": 0.0,
                "spectral_bandwidth_hz": 0.0, "rolloff85_hz": 0.0,
                "dominant_freq_hz": 0.0, "sample_rate": rate,
                "n_samples": 0}
    mag = np.abs(np.fft.rfft(s))
    freqs = np.fft.rfftfreq(n, d=1.0 / rate)
    mag[0] = 0.0  # drop DC so a constant offset is not "dominant"
    tot = mag.sum()
    if tot > 0:
        centroid = float((freqs * mag).sum() / tot)
        bw = float(np.sqrt(((freqs - centroid) ** 2 * mag).sum() / tot))
        roll = float(freqs[np.searchsorted(np.cumsum(mag),
                                           0.85 * tot)])
    else:
        centroid = bw = roll = 0.0
    return {
        "rms": float(np.sqrt((s * s).mean())),
        "spectral_centroid_hz": centroid,
        "spectral_bandwidth_hz": bw,
        "rolloff85_hz": roll,
        "dominant_freq_hz": float(freqs[int(np.argmax(mag))]),
        "sample_rate": rate,
        "n_samples": n,
    }


class MediaFeatureStage:
    """payload batch -> modality-specific features: audio spectral
    features (FFT), image perceptual dHash + 4x4 area thumbnail stats,
    GIF frame-sample indices.  Actor-pool stage, same small-batch memory
    discipline as PayloadDecodeStage; the payload column is dropped
    in-stage so only slim features ever re-enter the object store."""

    def __init__(self, payload_col: str = "payload", n_sample_frames: int = 4):
        self.payload_col = payload_col
        self.k = n_sample_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        kind = [""] * n
        dhash = [None] * n
        phash = [None] * n
        thumb_mean = np.full(n, np.nan)
        thumb_std = np.full(n, np.nan)
        centroid = np.full(n, np.nan)
        dom = np.full(n, np.nan)
        rms = np.full(n, np.nan)
        frames = [None] * n
        ok = np.ones(n, dtype=bool)
        for i, p in enumerate(payloads):
            try:
                head = p[:6]
                if head[:4] == b"RIFF":
                    f = audio_spectral(p)
                    kind[i] = "audio"
                    centroid[i] = f["spectral_centroid_hz"]
                    dom[i] = f["dominant_freq_hz"]
                    rms[i] = f["rms"]
                elif head[:2] in (b"P5", b"P6") or \
                        p[:8] == _PNG_SIG or p[:2] == b"\xff\xd8":
                    if head[:2] in (b"P5", b"P6"):
                        g = pnm_gray(p)
                    elif p[:8] == _PNG_SIG:
                        g = decode_png(p)["gray"]
                    else:
                        px = decode_jpeg_pixels(p).astype(np.float64)
                        g = px.mean(axis=2) if px.ndim == 3 else px
                    kind[i] = "image"
                    dhash[i] = image_dhash(g) - (1 << 63)  # int64 view
                    phash[i] = image_phash(g) - (1 << 63)
                    t = resize_area(g, min(4, g.shape[0]),
                                    min(4, g.shape[1]))
                    thumb_mean[i] = t.mean()
                    thumb_std[i] = t.std()
                elif head in (b"GIF87a", b"GIF89a") or p[:4] == _MAGIC:
                    d = (decode_gif(p) if head in (b"GIF87a", b"GIF89a")
                         else decode_fake(p))
                    kind[i] = "video"
                    frames[i] = [int(x) for x in
                                 frame_sample_indices(d["n_frames"],
                                                      self.k)]
                else:
                    ok[i] = False
            except Exception:
                ok[i] = False
        out = batch.drop_columns([self.payload_col])
        out = out.append_column("kind", pa.array(kind, pa.string()))
        out = out.append_column("dhash", pa.array(dhash, pa.int64()))
        out = out.append_column("phash", pa.array(phash, pa.int64()))
        out = out.append_column("thumb_mean",
                                pa.array(thumb_mean, pa.float64()))
        out = out.append_column("thumb_std",
                                pa.array(thumb_std, pa.float64()))
        out = out.append_column("spectral_centroid_hz",
                                pa.array(centroid, pa.float64()))
        out = out.append_column("dominant_freq_hz",
                                pa.array(dom, pa.float64()))
        out = out.append_column("rms", pa.array(rms, pa.float64()))
        out = out.append_column("sampled_frames",
                                pa.array(frames, pa.list_(pa.int64())))
        return out.append_column("feat_ok", pa.array(ok, pa.bool_()))


def media_features(ds, payload_col: str = "payload",
                   n_sample_frames: int = 4, batch_size: int = 64):
    """Dataset plumbing for media feature extraction (actor pool)."""
    return ds.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs=dict(payload_col=payload_col,
                                   n_sample_frames=n_sample_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(2, 8),
        num_cpus=1,
    )
