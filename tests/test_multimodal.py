"""Multimodal plumbing tests: schema, determinism, cardinality, stub gating.

The decode itself is a deterministic fake (codecs absent in this container,
rayextract/multimodal.py); what these tests pin down is the Ray-side contract:
media schema, actor-pool stage signatures, flat-map frame explosion counts,
and payload-drop in outputs.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

import ray.data as rd

from rayextract.multimodal import (
    FEATURE_DIM,
    FrameSampler,
    MEDIA_SCHEMA,
    MediaDecoder,
    _fake_pixels,
    docs_to_media,
    frame_features,
    media_features,
    resize_image,
    sample_frames,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def media_ds():
    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return docs_to_media(docs)


def test_media_schema(media_ds):
    sch = media_ds.schema()
    assert sch.names == MEDIA_SCHEMA.names
    t = media_ds.take_batch(5, batch_format="pyarrow")
    assert t.schema.field("payload").type == "binary"
    kinds = set(t.column("kind").to_pylist())
    assert kinds <= {"image", "audio", "video"}


def test_decoder_deterministic(media_ds):
    t = media_ds.take_batch(8, batch_format="pyarrow")
    d1, d2 = MediaDecoder(), MediaDecoder()
    f1 = d1(t).column("feature").to_pylist()
    f2 = d2(t).column("feature").to_pylist()
    assert f1 == f2
    assert all(len(f) == FEATURE_DIM for f in f1)


def test_real_codec_path_is_stubbed():
    with pytest.raises(NotImplementedError):
        MediaDecoder(use_real_codecs=True)


def test_media_features_pipeline(media_ds):
    out = media_features(media_ds).take_batch(20, batch_format="pyarrow")
    assert out.column_names == ["media_id", "kind", "n_bytes", "feature"]
    assert all(n > 0 for n in out.column("n_bytes").to_pylist())


def test_frame_sampler_cardinality(media_ds):
    t = media_ds.take_batch(50, batch_format="pyarrow")
    stride = 2
    expect = sum(
        math.ceil(max(1, m["n_frames"]) / stride)
        for k, m in zip(t.column("kind").to_pylist(), t.column("meta").to_pylist())
        if k == "video"
    )
    frames = FrameSampler(stride=stride)(t)
    assert len(frames) == expect
    assert "payload" not in frames.column_names  # payload dropped


def test_sample_and_featurize_frames(media_ds):
    frames = sample_frames(media_ds, stride=3)
    feats = frame_features(frames).take_batch(10, batch_format="pyarrow")
    assert feats.column_names == ["media_id", "frame_idx", "feature"]


def test_resize_block_mean():
    pix = np.arange(16, dtype=np.uint8).reshape(4, 4)
    out = resize_image(pix, 2, 2)
    assert out.shape == (2, 2)
    assert out[0, 0] == pytest.approx(pix[:2, :2].mean())
    assert out[1, 1] == pytest.approx(pix[2:, 2:].mean())


def test_fake_pixels_tiling():
    pix = _fake_pixels(b"ab", 3, 2)
    assert pix.shape == (2, 3)
    assert pix.tolist() == [[97, 98, 97], [98, 97, 98]]


def test_wav_codec_roundtrip_and_container():
    """Round 3: the REAL WAV path — encode produces a genuine RIFF container
    (magic bytes, fmt fields) and the stdlib decode recovers the exact PCM16
    samples; malformed payloads are quarantined as n_samples = -1."""
    import io
    import wave as wavemod

    import numpy as np
    import pyarrow as pa

    from rayextract.multimodal import WavPcmDecoder, wav_encode

    samples = np.array([0, 1, -1, 32767, -32768, 1234], dtype=np.int64)
    payload = wav_encode(samples, 12000)
    # real container: RIFF/WAVE magic + header fields readable by stdlib
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    with wavemod.open(io.BytesIO(payload), "rb") as w:
        assert w.getframerate() == 12000
        assert w.getnframes() == len(samples)
        back = np.frombuffer(w.readframes(len(samples)), dtype="<i2")
    assert (back == samples).all()

    dec = WavPcmDecoder()
    out = dec(
        pa.table(
            {
                "media_id": pa.array([1, 2], pa.int64()),
                "payload": pa.array([payload, b"not a wav"], pa.binary()),
            }
        )
    )
    good = out.to_pylist()[0]
    assert good["sample_rate"] == 12000
    assert good["n_samples"] == len(samples)
    assert good["peak"] == 32768
    assert good["energy"] == int((samples.astype(np.int64) ** 2).sum())
    bad = out.to_pylist()[1]
    assert bad["n_samples"] == -1 and bad["sample_rate"] == 0
