"""Text-stats stage vs the single-process kernels; multimodal decode
plumbing (schema, payload drop, error rows, actor-pool path)."""

import numpy as np
import pyarrow as pa


def test_text_stats_matches_kernels(ray_session):
    import ray.data as rd

    from light_curve_ray.kernels.textkit import (
        fingerprint,
        lang_id,
        quality_scores,
        token_count_bpe,
    )
    from light_curve_ray.stages.textstats import text_stats_dataset

    texts = [
        "The cat and the dog, in the house.",
        "der hund und die katze ist nicht hier",
        "",
        "numbers 123 and CAPS here!",
        "это русский текст на кириллице написанный",
    ]
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = text_stats_dataset(ds).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for i, t in enumerate(texts):
        q = quality_scores(t)
        assert got["n_chars"][i] == q["n_chars"]
        assert got["n_words"][i] == q["n_words"]
        assert got["n_tokens_bpe"][i] == token_count_bpe(t)
        np.testing.assert_allclose(got["punct_ratio"][i], q["punct_ratio"])
        np.testing.assert_allclose(got["stopword_ratio"][i],
                                   q["stopword_ratio"])
        assert got["lang_pred"][i] == lang_id(t)
        assert got["fingerprint_hex"][i] == f"{fingerprint(t):016x}"


def test_multimodal_decode_roundtrip(ray_session):
    import ray.data as rd

    from light_curve_ray.stages.multimodal import (
        decode_payloads,
        fake_payload,
    )

    rows = [(i, fake_payload("image" if i % 2 else "audio",
                             64 + i, 48, 1 + i, seed=i))
            for i in range(20)]
    rows.append((99, b"not a payload"))
    ds = rd.from_arrow(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "payload": pa.array([r[1] for r in rows], pa.binary()),
    }))
    got = decode_payloads(ds, batch_size=8).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert "payload" not in got.columns  # fat column dropped in-stage
    ok = got[got["doc_id"] != 99]
    assert ok["decode_ok"].all()
    for _, r in ok.iterrows():
        i = r["doc_id"]
        assert r["width"] == 64 + i and r["n_frames"] == 1 + i
        assert r["kind"] == ("image" if i % 2 else "audio")
        assert 0 <= r["byte_mean"] <= 255
    bad = got[got["doc_id"] == 99].iloc[0]
    assert not bad["decode_ok"]


def test_multimodal_real_codec_is_marked_stub():
    import pytest

    from light_curve_ray.stages.multimodal import PayloadDecodeStage

    with pytest.raises(NotImplementedError):
        PayloadDecodeStage(codec="real")


def test_stdlib_wav_codec_roundtrip():
    """REAL RIFF/WAVE PCM decode: synthesized params come back exactly."""
    from light_curve_ray.stages.multimodal import decode_wav, synth_wav

    p = synth_wav(n_samples=1234, freq_hz=220.0, rate=8000, seed=3)
    assert p[:4] == b"RIFF" and p[8:12] == b"WAVE"
    d = decode_wav(p)
    assert d["kind"] == "audio"
    assert d["n_frames"] == 1234
    assert d["width"] == 1      # channels
    assert d["height"] == 16    # bit depth
    assert d["n_bytes"] == 1234 * 2
    # a sine + small noise: near-zero mean, std ~ 0.6*32767/sqrt(2)
    assert abs(d["byte_mean"]) < 500
    assert 10000 < d["byte_std"] < 20000


def test_stdlib_pnm_codec_roundtrip():
    """REAL binary PPM decode incl. header comments."""
    import numpy as np

    from light_curve_ray.stages.multimodal import decode_pnm, synth_ppm

    p = synth_ppm(20, 10, seed=5)
    d = decode_pnm(p)
    assert (d["kind"], d["width"], d["height"]) == ("image", 20, 10)
    assert d["n_bytes"] == 20 * 10 * 3
    body = np.frombuffer(p.split(b"255\n", 1)[1], dtype=np.uint8)
    assert abs(d["byte_mean"] - float(body.mean())) < 1e-9
    # PGM (P5), with a comment line
    pgm = b"P5\n# c\n4 2\n255\n" + bytes(range(8))
    d5 = decode_pnm(pgm)
    assert (d5["width"], d5["height"], d5["n_bytes"]) == (4, 2, 8)
    assert d5["byte_mean"] == 3.5


def test_auto_codec_dispatch(ray_session):
    """auto codec: wav/ppm/LCRF all decode, garbage -> decode_ok=false."""
    import ray.data as rd

    from light_curve_ray.stages.multimodal import (
        decode_payloads,
        fake_payload,
        synth_ppm,
        synth_wav,
    )

    tbl = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "payload": pa.array([
            synth_wav(100, 50.0, seed=0),
            synth_ppm(8, 8, seed=1),
            fake_payload("video", 32, 32, 3, seed=2),
            b"\x00garbage",
        ], pa.binary()),
    })
    out = decode_payloads(rd.from_arrow(tbl), batch_size=2).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert list(out["kind"]) == ["audio", "image", "video", ""]
    assert list(out["decode_ok"]) == [True, True, True, False]
    assert "payload" not in out.columns  # fat column dropped in-stage


def test_gif_lzw_roundtrip():
    """The GIF LZW pair must round-trip random, run-heavy, table-reset
    (>4096 entries) and KwKwK streams."""
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        _lzw_decode_gif,
        _lzw_encode_gif,
    )

    rng = np.random.RandomState(0)
    cases = [
        rng.randint(0, 256, 5000).astype(np.uint8).tobytes(),
        (b"\x07" * 400 + b"\x03\x04" * 300) * 5,
        rng.randint(0, 16, 80000).astype(np.uint8).tobytes(),  # 4096 reset
        b"\x2a",
        b"\x01" * 7,  # KwKwK case
    ]
    for data in cases:
        assert _lzw_decode_gif(_lzw_encode_gif(data, 8), 8).tobytes() == data


def test_gif_decode_real_compressed():
    """decode_gif parses the container (incl. interlace) and reproduces
    the palette-mapped pixel statistics exactly."""
    import numpy as np

    from light_curve_ray.stages.multimodal import decode_gif, synth_gif

    for interlaced in (False, True):
        payload = synth_gif(64, 48, seed=3, interlaced=interlaced)
        d = decode_gif(payload)
        rng = np.random.RandomState(3)
        grad = (np.arange(64 * 48, dtype=np.int64) * 17 // 64) % 256
        idx = ((grad + rng.randint(0, 8, size=64 * 48)) % 256).astype(
            np.uint8)
        pal = np.array([[i, (i * 7) % 256, (i * 13) % 256]
                        for i in range(256)], dtype=np.uint8)
        rgb = pal[idx].astype(np.float64)
        assert (d["width"], d["height"], d["n_frames"]) == (64, 48, 1)
        assert d["byte_mean"] == rgb.mean()
        assert d["byte_std"] == rgb.std()


def test_gif_via_decode_stage(ray_session):
    """GIF payloads flow through the actor-pool decode stage end-to-end
    (magic dispatch + payload drop + typed output)."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.multimodal import decode_payloads, synth_gif

    tbl = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "payload": pa.array([synth_gif(10 + i, 8 + i, seed=i)
                             for i in range(6)], pa.binary()),
    })
    out = decode_payloads(rd.from_arrow(tbl), batch_size=3).to_pandas()
    assert len(out) == 6
    assert "payload" not in out.columns
    assert (out["kind"] == "image").all()
    assert list(out.sort_values("doc_id")["width"]) == list(range(10, 16))


def test_png_roundtrip_all_color_types():
    """decode_png reverses all five row filters (synth cycles them per
    row) across gray/RGB/gray+alpha/RGBA, bit-exact pixel stats."""
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        _PNG_CHANNELS,
        decode_png,
        synth_png,
    )

    for ct in (0, 2, 4, 6):
        w, h = 37, 23
        d = decode_png(synth_png(w, h, seed=5, color_type=ct))
        nch = _PNG_CHANNELS[ct]
        rng = np.random.RandomState(5)
        base = (np.arange(w * nch, dtype=np.int64) * 3) % 251
        img = np.empty((h, w * nch), dtype=np.uint8)
        for y in range(h):
            img[y] = ((base + y * 7) % 256
                      + rng.randint(0, 4, w * nch)) % 256
        vals = img.astype(np.float64)
        assert (d["width"], d["height"]) == (w, h)
        assert d["byte_mean"] == vals.mean()
        assert d["byte_std"] == vals.std()


def test_png_palette_and_crc():
    """Palette (type 3) mapping works, and a corrupted chunk fails the
    CRC check loudly."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from light_curve_ray.stages.multimodal import _PNG_SIG, decode_png

    w, h = 8, 4
    idx = np.arange(w * h, dtype=np.uint8).reshape(h, w) % 16
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    pal = bytes(b for i in range(16) for b in (i * 16, 255 - i * 16, i))

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    png = (_PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
           + chunk(b"PLTE", pal)
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    d = decode_png(png)
    palette = np.frombuffer(pal, np.uint8).reshape(16, 3)
    vals = palette[idx.ravel()].astype(np.float64)
    assert d["byte_mean"] == vals.mean()
    corrupted = bytearray(png)
    corrupted[40] ^= 0xFF  # flip a byte inside a chunk body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupted))


def test_jpeg_roundtrip_all_modes():
    """Baseline JPEG round trip (our encoder -> our decoder) across
    grayscale / 4:4:4 / 4:2:0, with and without restart markers: pixel
    PSNR vs the pre-encode image must clear the quantization floor, and
    restart segmentation must not change a single pixel."""
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        decode_jpeg_pixels,
        synth_jpeg,
        synth_jpeg_pixels,
    )

    for mode in ("gray", "444", "420"):
        img = synth_jpeg_pixels(48, 40, seed=3, mode=mode)
        for rst in (0, 3):
            px = decode_jpeg_pixels(
                synth_jpeg(48, 40, seed=3, mode=mode, restart_every=rst))
            assert px.shape == img.shape
            mse = ((px.astype(float) - img.astype(float)) ** 2).mean()
            assert 10 * np.log10(255 ** 2 / mse) > 28, (mode, rst)
        a = decode_jpeg_pixels(synth_jpeg(48, 40, seed=3, mode=mode))
        b = decode_jpeg_pixels(
            synth_jpeg(48, 40, seed=3, mode=mode, restart_every=2))
        assert np.array_equal(a, b)


def test_jpeg_flat_block_is_dc_exact():
    """A solid-color image survives quantization exactly (DC-only path):
    decode must reproduce the color within DC-quant rounding (q=16 for
    luma DC -> max error 8 in Y, exact here because 128 shifts to 0)."""
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        _encode_jpeg,
        decode_jpeg_pixels,
    )

    img = np.full((16, 24, 1), 128, dtype=np.uint8)
    px = decode_jpeg_pixels(_encode_jpeg(img, "gray"))
    assert np.array_equal(px, img)
    img2 = np.full((16, 24, 1), 200, dtype=np.uint8)
    px2 = decode_jpeg_pixels(_encode_jpeg(img2, "gray"))
    assert np.abs(px2.astype(int) - 200).max() <= 8


def test_jpeg_rejects_and_odd_dims():
    """Progressive SOF rejected loudly; non-multiple-of-MCU dimensions
    crop correctly; auto-dispatch routes JPEG magic."""
    import pytest

    from light_curve_ray.stages.multimodal import (
        decode_auto,
        decode_jpeg_pixels,
        synth_jpeg,
    )

    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg_pixels(b"\xFF\xD8\xFF\xC2\x00\x05aaa")
    px = decode_jpeg_pixels(synth_jpeg(37, 23, seed=2, mode="420"))
    assert px.shape == (23, 37, 3)
    d = decode_auto(synth_jpeg(32, 16, seed=1, mode="444"))
    assert (d["kind"], d["width"], d["height"]) == ("image", 32, 16)


def test_jpeg_via_decode_stage(ray_session):
    """JPEG payloads flow through the actor-pool decode stage end-to-end
    alongside the other codecs (magic dispatch, payload drop)."""
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.multimodal import decode_payloads, synth_jpeg

    tbl = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "payload": pa.array(
            [synth_jpeg(16 + i, 16, seed=i,
                        mode=("gray", "444", "420")[i % 3])
             for i in range(6)], pa.binary()),
    })
    out = decode_payloads(rd.from_arrow(tbl), batch_size=3).to_pandas()
    assert len(out) == 6
    assert "payload" not in out.columns
    assert out["decode_ok"].all()
    assert (out["kind"] == "image").all()
    assert list(out.sort_values("doc_id")["width"]) == list(range(16, 22))


def test_resize_area_exact_block_means():
    import numpy as np

    from light_curve_ray.stages.multimodal import resize_area

    a = np.arange(16, dtype=float).reshape(4, 4)
    assert np.allclose(resize_area(a, 2, 2),
                       [[2.5, 4.5], [10.5, 12.5]])
    # non-divisible shapes still partition exactly (floor boundaries)
    b = np.arange(15, dtype=float).reshape(3, 5)
    r = resize_area(b, 2, 2)
    assert np.allclose(r[0, 0], b[:1, :2].mean())
    assert np.allclose(r[1, 1], b[1:, 2:].mean())
    import pytest

    with pytest.raises(ValueError):
        resize_area(a, 8, 8)  # upsample refused


def test_image_dhash_invariances():
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        image_dhash,
        pnm_gray,
        synth_ppm,
    )

    g = pnm_gray(synth_ppm(40, 30, seed=5))
    h = image_dhash(g)
    assert 0 <= h < (1 << 64)
    assert image_dhash(g + 31.0) == h          # brightness shift
    assert image_dhash(g * 2.0) == h           # contrast scale
    g2 = pnm_gray(synth_ppm(40, 30, seed=6))
    assert image_dhash(g2) != h                # different image differs


def test_image_phash_invariances():
    import numpy as np

    from light_curve_ray.stages.multimodal import (
        image_phash,
        pnm_gray,
        synth_ppm,
    )

    g = pnm_gray(synth_ppm(64, 48, seed=5))
    h = image_phash(g)
    assert 0 <= h < (1 << 64)
    # DCT is linear and the threshold is the coefficient median, so a
    # uniform CONTRAST scale cannot flip any bit
    assert image_phash(g * 2.0) == h
    assert image_phash(g * 0.3) == h
    g2 = pnm_gray(synth_ppm(64, 48, seed=6))
    assert image_phash(g2) != h                # different image differs
    # mild blur (2x2 box) moves few low-frequency bits
    gb = (g[0::2, 0::2] + g[1::2, 0::2] + g[0::2, 1::2]
          + g[1::2, 1::2]) / 4.0
    hb = image_phash(gb)
    assert bin(h ^ hb).count("1") <= 16


def test_phash_dct_matrix_orthonormal():
    import numpy as np

    from light_curve_ray.stages.multimodal import _dctii_matrix

    m = _dctii_matrix(32)
    assert np.allclose(m @ m.T, np.eye(32), atol=1e-12)


def test_audio_spectral_known_tone():
    from light_curve_ray.stages.multimodal import audio_spectral, synth_wav

    f = audio_spectral(synth_wav(8000, 440.0, rate=8000))
    assert abs(f["dominant_freq_hz"] - 440.0) < 2.0
    assert f["rms"] > 0 and f["n_samples"] == 8000
    assert f["spectral_centroid_hz"] > 0
    assert f["rolloff85_hz"] >= f["dominant_freq_hz"] * 0.5


def test_frame_sample_indices():
    import numpy as np

    from light_curve_ray.stages.multimodal import frame_sample_indices

    assert frame_sample_indices(10, 4).tolist() == [0, 2, 5, 7]
    assert frame_sample_indices(2, 4).tolist() == [0, 1]
    assert frame_sample_indices(0, 4).tolist() == []
    i = frame_sample_indices(1000, 7)
    assert i[0] == 0 and np.all(np.diff(i) > 0) and i[-1] < 1000


def test_media_feature_stage_all_formats(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from light_curve_ray.stages.multimodal import (
        MediaFeatureStage,
        fake_payload,
        media_features,
        synth_gif,
        synth_jpeg,
        synth_png,
        synth_ppm,
        synth_wav,
    )

    payloads = [
        synth_wav(1600, 200.0), synth_ppm(20, 14, seed=1),
        synth_gif(16, 12, seed=2), synth_png(12, 10, seed=3),
        synth_jpeg(16, 12, seed=4, mode="gray"),
        fake_payload("video", 64, 48, 9, seed=5), b"garbage",
    ]
    tbl = pa.table({"doc_id": pa.array(range(len(payloads)), pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    out = media_features(rd.from_arrow(tbl)).to_pandas()
    out = out.sort_values("doc_id").reset_index(drop=True)
    assert out["kind"].tolist() == [
        "audio", "image", "video", "image", "image", "video", ""]
    assert bool(out["feat_ok"][:-1].all()) and not bool(out["feat_ok"][6])
    assert abs(out["dominant_freq_hz"][0] - 200.0) < 2.0
    # images carry dhash + thumbnail stats; video carries sampled frames
    assert out["dhash"][[1, 3, 4]].notna().all()
    assert list(out["sampled_frames"][5]) == [0, 2, 4, 6]
    # stage parity with the single-process call
    solo = MediaFeatureStage()(tbl).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert solo["kind"].tolist() == out["kind"].tolist()
    assert (solo["dhash"].fillna(0) == out["dhash"].fillna(0)).all()
