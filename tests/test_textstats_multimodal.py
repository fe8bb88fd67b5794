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
