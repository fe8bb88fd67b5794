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
  every frame for ``n_frames`` and fully decode the first) and **PNG
  with a full chunk/CRC/deflate/row-filter pipeline** (stdlib ``zlib``
  inflate; all five filters reversed; gray/RGB/alpha/palette color
  types; Adam7 rejected loudly) — plus the LCRF test container below.
  Unknown magics come back ``decode_ok=false``.
- ``codec="real"`` raises NotImplementedError at actor construction —
  the remaining integration point for DCT-era formats (jpeg/mp3/h264
  need Pillow/libsndfile/pyav, not in this container); GIF and PNG show
  the full pattern a linked codec plugs into.
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
    return {
        "kind": "image",
        "width": int(width),
        "height": int(height),
        "n_frames": 1,
        "n_bytes": int(vals.size),
        "byte_mean": float(vals.mean()) if vals.size else 0.0,
        "byte_std": float(vals.std()) if vals.size else 0.0,
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
                "compressed-format decode (jpeg/png/mp3/h264) needs "
                "Pillow/libsndfile/pyav — not in this container; plug the "
                "decoder here.  Self-describing formats (WAV PCM, PPM/PGM) "
                "decode for real under codec='auto'."
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
