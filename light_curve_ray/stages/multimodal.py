"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary()`` columns with a
small typed-metadata struct, exactly like the fat ``html`` column in the
pages pipeline: read column-pruned, decoded in a stateful actor-pool
``map_batches`` stage with SMALL batches (payloads are orders of magnitude
fatter than text rows), and the payload column dropped as soon as features
are extracted so downstream shuffles never move it.

Codec tiers (``PayloadDecodeStage``):

- ``codec="auto"`` (default) dispatches on the payload's magic bytes and
  REALLY decodes the self-describing formats implementable with the
  stdlib: RIFF/WAVE PCM audio (``wave`` module; per-sample mean/std,
  channel/bit-depth/frame metadata) and binary PPM/PGM images (P5/P6
  header parsing incl. comments; per-pixel mean/std) — plus the LCRF
  test container below.  Unknown magics come back ``decode_ok=false``.
- ``codec="real"`` raises NotImplementedError at actor construction —
  the marked integration point for COMPRESSED formats (jpeg/png/mp3/
  h264 need Pillow/libsndfile/pyav, not in this container).
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


def decode_auto(payload: bytes) -> dict:
    """Magic-byte dispatch across the implemented decoders."""
    if payload[:4] == _MAGIC:
        return decode_fake(payload)
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return decode_wav(payload)
    if payload[:2] in (b"P5", b"P6"):
        return decode_pnm(payload)
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
