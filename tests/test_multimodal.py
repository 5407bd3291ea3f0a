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


# --- REAL BMP codec (round 4) ----------------------------------------------


def test_bmp_roundtrip_all_padding_cases():
    import numpy as np

    from rayextract.multimodal import BmpDecoder, bmp_encode

    rng = np.random.RandomState(1)
    dec = BmpDecoder()
    for w in range(1, 18):  # 3w % 4 cycles through every padding width
        pix = rng.randint(0, 256, size=(5, w)).astype(np.uint8)
        out = dec._decode(bmp_encode(pix))
        assert out.shape == (5, w, 3)
        assert (out == pix[:, :, None]).all(), w


def test_bmp_container_is_real():
    import numpy as np

    from rayextract.multimodal import bmp_encode

    pix = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = bmp_encode(pix)
    assert b[:2] == b"BM"
    assert int.from_bytes(b[2:6], "little") == len(b)  # declared file size
    assert int.from_bytes(b[10:14], "little") == 54  # pixel offset
    assert int.from_bytes(b[14:18], "little") == 40  # BITMAPINFOHEADER
    assert int.from_bytes(b[28:30], "little") == 24  # bpp


def test_bmp_decoder_handles_topdown_rows():
    import struct

    import numpy as np

    from rayextract.multimodal import BmpDecoder

    # hand-build a top-down (negative height) 2x2 24-bit BMP
    w, h = 2, 2
    stride = 8  # 2*3 rounded up to 4
    px = np.array(
        [[[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8
    )
    body = b"".join(px[y].tobytes() + b"\x00\x00" for y in range(h))
    header = struct.pack("<2sIHHI", b"BM", 54 + stride * h, 0, 0, 54)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h, 1, 24, 0, stride * h, 0, 0, 0, 0
    )
    out = BmpDecoder()._decode(header + info + body)
    assert (out == px).all()  # rows NOT flipped for top-down


def test_bmp_decoder_quarantines_malformed():
    import pyarrow as pa

    from rayextract.multimodal import BmpDecoder, bmp_encode
    import numpy as np

    good = bmp_encode(np.full((2, 2), 9, dtype=np.uint8))
    t = pa.table(
        {
            "media_id": pa.array([1, 2, 3, 4], pa.int64()),
            "payload": pa.array(
                [good, b"not a bmp", good[:30], b""], pa.binary()
            ),
        }
    )
    out = BmpDecoder()(t).to_pydict()
    assert out["width"] == [2, -1, -1, -1]
    assert out["px_sum"] == [9 * 3 * 4, 0, 0, 0]


def test_synth_bmp_matches_arithmetic_contract():
    import numpy as np
    import pyarrow as pa

    from rayextract.multimodal import BmpDecoder, synth_bmp_batch

    ids = [0, 1, 7, 12, 123]
    media = synth_bmp_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    out = BmpDecoder()(media).to_pydict()
    for k, d in enumerate(ids):
        w, h = 8 + d % 9, 8 + d % 5
        v = (d * 31 + np.arange(w * h, dtype=np.int64) * 13) % 256
        assert out["width"][k] == w and out["height"][k] == h
        assert out["px_sum"][k] == 3 * int(v.sum())
        assert out["px_max"][k] == int(v.max())


# ---- REAL Y4M video codec (round 5) -----------------------------------------

def test_y4m_roundtrip():
    import numpy as np

    from rayextract.multimodal import _y4m_parse, y4m_encode

    frames = np.arange(3 * 4 * 6, dtype=np.uint8).reshape(3, 4, 6)
    w, h, got = _y4m_parse(y4m_encode(frames))
    assert (w, h) == (6, 4)
    assert (got == frames).all()


def test_y4m_parser_rejects_bad_streams():
    import numpy as np
    import pytest

    from rayextract.multimodal import _y4m_parse, y4m_encode

    ok = y4m_encode(np.zeros((2, 2, 2), dtype=np.uint8))
    for bad in (
        b"not y4m",
        ok.replace(b"Cmono", b"C420"),    # chroma-subsampled: unsupported
        ok[:-2],                          # truncated frame data
        ok.replace(b"FRAME", b"FRAMX", 1),
        b"YUV4MPEG2 W2 F25:1\n",          # missing H token
    ):
        with pytest.raises(ValueError):
            _y4m_parse(bad)


def test_y4m_decoder_stats_and_quarantine():
    import numpy as np
    import pyarrow as pa

    from rayextract.multimodal import Y4mDecoder, y4m_encode

    frames = np.array(
        [[[1, 2], [3, 4]], [[5, 6], [7, 250]]], dtype=np.uint8
    )
    t = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "payload": pa.array([y4m_encode(frames), b"junk"], pa.binary()),
        }
    )
    out = Y4mDecoder()(t).to_pydict()
    assert out["width"] == [2, -1]
    assert out["n_frames"] == [2, -1]
    assert out["px_sum"] == [1 + 2 + 3 + 4 + 5 + 6 + 7 + 250, 0]
    assert out["px_max"] == [250, 0]


def test_y4m_frame_sampler_stride_and_quarantine():
    import numpy as np
    import pyarrow as pa

    from rayextract.multimodal import Y4mFrameSampler, y4m_encode

    frames = np.stack(
        [np.full((2, 3), 10 * (f + 1), dtype=np.uint8) for f in range(5)]
    )
    t = pa.table(
        {
            "media_id": pa.array([7, 8], pa.int64()),
            "payload": pa.array([y4m_encode(frames), b"junk"], pa.binary()),
        }
    )
    out = Y4mFrameSampler(stride=2)(t).to_pydict()
    # media 7: frames 0, 2, 4 sampled; media 8: one quarantine row
    assert out["media_id"] == [7, 7, 7, 8]
    assert out["frame_idx"] == [0, 2, 4, -1]
    assert out["fr_sum"] == [60, 180, 300, 0]
    assert out["fr_max"] == [10, 30, 50, 0]


def test_synth_y4m_matches_arithmetic_contract():
    import numpy as np
    import pyarrow as pa

    from rayextract.multimodal import _y4m_parse, synth_y4m_batch

    ids = [0, 1, 2, 5, 99]
    media = synth_y4m_batch(pa.table({"doc_id": pa.array(ids, pa.int64())}))
    for k, d in enumerate(ids):
        w, h, frames = _y4m_parse(media.column("payload")[k].as_py())
        assert (w, h) == (8 + d % 5, 4 + d % 3)
        assert frames.shape[0] == 2 + d % 3
        i = np.arange(h * w, dtype=np.int64)
        for f in range(frames.shape[0]):
            want = ((d * 31 + f * 101 + i * 13) % 256).reshape(h, w)
            assert (frames[f] == want).all()
