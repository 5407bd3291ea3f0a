"""Multimodal columns: opaque binary payloads + typed metadata.

The reference's only binary path is PDF bytes -> per-page TIFF streams
(/root/reference/Pdf-To-ImageStream/Convert.cs:9-35) decoded in-process by
native libs. Generalized here for training-data pipelines: image/audio/video
travel as an Arrow ``binary`` column with a typed ``meta`` struct, and every
media transform is an actor-pool ``map_batches`` stage (codec/model state
built once per actor, the D4 pattern from Worker.cs:61-95).

General image/video codecs (PIL / PyAV) are NOT in this container, so the
MediaDecoder path is a clearly-marked stub (``NotImplementedError`` behind
an import-try) and its default path is a DETERMINISTIC FAKE decoder that
derives pixel/sample arrays from the payload bytes with numpy. The Ray-side
plumbing — schema, batch sizing, actor signatures, flat-map frame explosion,
output layout — is real and tested (tests/test_multimodal.py).

AUDIO has a REAL codec path (round 3): ``WavPcmDecoder`` parses genuine
RIFF/WAV containers with the stdlib ``wave`` module (header fields + PCM16
little-endian frames), run as an actor-pool stage; ``wav_encode`` produces
the real container bytes. Under the driver gate as ``audio_wav_decode``.

IMAGE has a REAL codec path too (round 4): ``BmpDecoder`` parses genuine
uncompressed 24-bit BMP containers (file header, DIB header, bottom-up or
top-down row order, 4-byte stride padding, BGR bytes) with pure numpy;
``bmp_encode`` produces the real container bytes. Under the driver gate as
``image_bmp_decode``.

VIDEO has a REAL codec path too (round 5, retiring the last stub):
``Y4mDecoder`` / ``Y4mFrameSampler`` parse genuine YUV4MPEG2 (Y4M) streams
(ASCII stream header, per-frame FRAME markers, mono luma planes);
``y4m_encode`` produces the real container bytes. Under the driver gate as
``video_y4m_decode`` and the upgraded ``multimodal_frame_features``. The
generic MediaDecoder's fake-decode path remains only as the PIL/PyAV
import-gated placeholder for compressed formats.

Scale notes: payload rows are large, so media stages run with SMALL
``batch_size`` (default 64) and the binary column is dropped as soon as the
features are computed — never carried through a shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# typed metadata carried alongside the opaque payload
MEDIA_META_TYPE = pa.struct(
    [
        ("width", pa.int32()),        # images/video
        ("height", pa.int32()),
        ("n_frames", pa.int32()),     # video
        ("sample_rate", pa.int32()),  # audio
        ("codec", pa.string()),
    ]
)

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # image | audio | video
        ("payload", pa.binary()),
        ("meta", MEDIA_META_TYPE),
    ]
)

KINDS = ("image", "audio", "video")
FEATURE_DIM = 8
MEDIA_BATCH_SIZE = 64  # payload rows are big: keep batch x concurrency in heap

# Per-worker-process decoder instances, keyed by (class, ctor kwargs).
# Built lazily on first batch in each Ray worker process and reused for the
# process lifetime — across batches, tasks, AND Dataset executions.
_WORKER_DECODERS: dict = {}


def decode_stage(
    media: "ray.data.Dataset",
    cls: type,
    concurrency: "tuple[int, int] | None" = None,
    batch_size: "int | None" = MEDIA_BATCH_SIZE,
    batch_format: str = "pyarrow",
    **ctor,
) -> "ray.data.Dataset":
    """Host a decoder class as a Ray Data stage.

    Default (concurrency=None): a TASK-pool map whose UDF pulls the decoder
    from a per-worker-process cache — the same engine-loaded-once semantics
    as an actor pool (one construction per worker process, reused across
    batches and runs), but tasks launch at the pool's full width immediately
    instead of paying an actor-pool ramp-from-one on EVERY Dataset
    execution (measured at sf0.1: image_ocr_extract 3.0s -> 0.6s warm; the
    per-run ramp dominated each decode query's wall).

    Pass concurrency=(lo, hi) to host in a dedicated actor pool instead —
    the right shape when the engine is too heavy to replicate into every
    worker process (multi-GB weights, a GPU context) or must NOT share a
    process with other stages.
    """
    if concurrency is not None:
        return media.map_batches(
            cls,
            fn_constructor_kwargs=ctor,
            batch_format=batch_format,
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=1,
        )
    key = (cls.__module__, cls.__qualname__, tuple(sorted(ctor.items())))

    def fn(t):
        dec = _WORKER_DECODERS.get(key)
        if dec is None:
            dec = _WORKER_DECODERS.setdefault(key, cls(**ctor))
        return dec(t)

    fn.__name__ = f"decode_{cls.__name__}"
    return media.map_batches(fn, batch_format=batch_format, batch_size=batch_size)


def _try_import_codecs():
    """Real codecs, gated behind import-try (not in this container)."""
    try:  # pragma: no cover - not installed here
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def docs_to_media(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Deterministic media table derived from the documents table.

    payload = utf-8 bytes of ``text`` (opaque to every downstream stage);
    kind = doc_id % 3; meta synthesized from doc_id + payload length. This is
    the fixture generator for the media plumbing — at production scale the
    payload column comes from ``ray.data.read_binary_files`` / parquet blobs.
    """

    def to_media(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy()
        payloads = [s.encode("utf-8") for s in t.column("text").to_pylist()]
        nb = np.array([len(p) for p in payloads], dtype=np.int64)
        kind = np.array(KINDS, dtype=object)[ids % 3]
        metas = [
            {
                "width": int(16 + i % 17),
                "height": int(16 + i % 13),
                "n_frames": int(1 + i % 7),
                "sample_rate": 16000,
                "codec": "raw",
            }
            for i, _ in zip(ids, nb)
        ]
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "kind": pa.array(kind, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "meta": pa.array(metas, MEDIA_META_TYPE),
            }
        )

    return docs.map_batches(to_media, batch_format="pyarrow")


def _fake_pixels(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic fake decode: tile payload bytes into a (h, w) uint8 grid."""
    need = width * height
    raw = np.frombuffer(payload, dtype=np.uint8)
    if raw.size == 0:
        raw = np.zeros(1, dtype=np.uint8)
    reps = -(-need // raw.size)
    return np.tile(raw, reps)[:need].reshape(height, width)


def resize_image(pix: np.ndarray, out_h: int = 8, out_w: int = 8) -> np.ndarray:
    """Block-mean resize (no PIL): deterministic, vectorized."""
    h, w = pix.shape
    ri = (np.arange(h) * out_h) // h
    ci = (np.arange(w) * out_w) // w
    out = np.zeros((out_h, out_w), dtype=np.float64)
    cnt = np.zeros((out_h, out_w), dtype=np.int64)
    np.add.at(out, (ri[:, None], ci[None, :]), pix.astype(np.float64))
    np.add.at(cnt, (ri[:, None], ci[None, :]), 1)
    return out / np.maximum(cnt, 1)


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``__init__`` loads codec state once per actor (here: the import probe and
    the feature projection matrix — the D4 "engine loaded once" analog);
    ``__call__`` decodes a batch and emits fixed-dim features, dropping the
    payload. Use with ``map_batches(MediaDecoder, batch_size=64,
    concurrency=(1, N), num_cpus=1, batch_format="pyarrow")``.
    """

    def __init__(self, use_real_codecs: bool = False, seed: int = 17):
        self.real = use_real_codecs
        if use_real_codecs and not _try_import_codecs():
            # STUB: the real decode needs PIL/soundfile/PyAV, absent here.
            raise NotImplementedError(
                "real media codecs (PIL/soundfile/PyAV) are not installed; "
                "run with use_real_codecs=False for the deterministic fake path"
            )
        rng = np.random.RandomState(seed)
        self.proj = rng.standard_normal((64, FEATURE_DIM))

    def _features(self, payload: bytes, kind: str, meta: dict) -> np.ndarray:
        if kind == "image":
            pix = _fake_pixels(payload, meta["width"], meta["height"])
            small = resize_image(pix).reshape(-1)  # 64
        elif kind == "audio":
            raw = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
            if raw.size == 0:
                raw = np.zeros(64)
            # 64-bin mean "spectrogram" of the fake waveform
            bins = np.array_split(raw, 64)
            small = np.array([b.mean() if b.size else 0.0 for b in bins])
        else:  # video: mean over fake frames of the image path
            nf = max(1, meta["n_frames"])
            chunk = max(1, len(payload) // nf)
            frames = [
                _fake_pixels(payload[i * chunk : (i + 1) * chunk],
                             meta["width"], meta["height"])
                for i in range(nf)
            ]
            small = np.mean([resize_image(f) for f in frames], axis=0).reshape(-1)
        return small @ self.proj

    def __call__(self, t: pa.Table) -> pa.Table:
        kinds = t.column("kind").to_pylist()
        payloads = t.column("payload").to_pylist()
        metas = t.column("meta").to_pylist()
        feats = [
            self._features(p, k, m).astype(np.float32)
            for p, k, m in zip(payloads, kinds, metas)
        ]
        nb = np.array([len(p) for p in payloads], dtype=np.int64)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "kind": t.column("kind"),
                "n_bytes": pa.array(nb, pa.int64()),
                "feature": pa.array([f.tolist() for f in feats],
                                    pa.list_(pa.float32())),
            }
        )


class FrameSampler:
    """Video frame sampling as a flat-map stage: one input row -> ``stride``-th
    frames as rows (the D1 "1 doc -> N pages" cardinality change,
    Convert.cs:9-35). Output drops the payload (frame bytes only)."""

    def __init__(self, stride: int = 2):
        self.stride = max(1, stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "frame_bytes": [], "n_bytes": []}
        for mid, kind, payload, meta in zip(
            t.column("media_id").to_pylist(),
            t.column("kind").to_pylist(),
            t.column("payload").to_pylist(),
            t.column("meta").to_pylist(),
        ):
            if kind != "video":
                continue
            nf = max(1, meta["n_frames"])
            chunk = max(1, len(payload) // nf)
            for fi in range(0, nf, self.stride):
                fb = payload[fi * chunk : (fi + 1) * chunk]
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["frame_bytes"].append(fb)
                out["n_bytes"].append(len(fb))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame_bytes": pa.array(out["frame_bytes"], pa.binary()),
                "n_bytes": pa.array(out["n_bytes"], pa.int64()),
            }
        )


def media_features(
    media: "ray.data.Dataset", concurrency: "tuple[int, int] | None" = None
) -> "ray.data.Dataset":
    """media table -> (media_id, kind, n_bytes, feature) via the decoder
    stage (per-worker cached by default; see decode_stage)."""
    return decode_stage(media, MediaDecoder, concurrency=concurrency)


def sample_frames(
    media: "ray.data.Dataset", stride: int = 2,
    concurrency: "tuple[int, int] | None" = None,
) -> "ray.data.Dataset":
    """media table -> one row per sampled video frame."""
    return decode_stage(media, FrameSampler, concurrency=concurrency, stride=stride)


def frame_features(frames: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-frame resize features (stateless, vectorized per frame)."""

    def fn(t: pa.Table) -> pa.Table:
        feats = [
            resize_image(_fake_pixels(b, 16, 16)).reshape(-1)[:FEATURE_DIM].tolist()
            for b in t.column("frame_bytes").to_pylist()
        ]
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "frame_idx": t.column("frame_idx"),
                "feature": pa.array(feats, pa.list_(pa.float64())),
            }
        )

    return frames.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# REAL audio codec: RIFF/WAV PCM16 via the stdlib `wave` module (round 3)
# ---------------------------------------------------------------------------

def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 mono samples -> real RIFF/WAV container bytes (PCM16 LE)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def synth_wav_batch(t: pa.Table) -> pa.Table:
    """Deterministic WAV fixture per document: n = 64 + doc_id % 129 samples
    of sample[i] = ((doc_id*31 + i*7919) % 65536) - 32768 at
    8000 + (doc_id % 3)*4000 Hz — pure integer arithmetic a SQL oracle can
    regenerate, wrapped in a REAL WAV container."""
    ids = t.column("doc_id").to_numpy()
    payloads = []
    for d in ids:
        d = int(d)
        n = 64 + d % 129
        sr = 8000 + (d % 3) * 4000
        i = np.arange(n, dtype=np.int64)
        samples = ((d * 31 + i * 7919) % 65536) - 32768
        payloads.append(wav_encode(samples, sr))
    return pa.table(
        {
            "media_id": pa.array(ids.astype("int64"), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class WavPcmDecoder:
    """Actor-pool REAL audio decode stage: parses the RIFF/WAV container
    (stdlib ``wave`` — header, channel count, sample width, frame rate) and
    the PCM16 LE frames, emitting integer-exact per-clip statistics
    (sample_rate, n_samples, peak, energy). Malformed payloads are
    quarantined as rows with n_samples = -1 rather than poisoning the batch
    (Worker.cs:117-125 per-item try/catch analog)."""

    def __init__(self):
        import wave  # codec module bound once per actor (D4 pattern)

        self._wave = wave

    def _decode(self, payload: bytes) -> tuple[int, int, int, int]:
        import io

        with self._wave.open(io.BytesIO(payload), "rb") as w:
            if w.getnchannels() != 1 or w.getsampwidth() != 2:
                raise ValueError("expected mono PCM16")
            sr = w.getframerate()
            n = w.getnframes()
            samples = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
        peak = int(np.abs(samples).max()) if n else 0
        energy = int((samples * samples).sum())
        return sr, n, peak, energy

    def __call__(self, t: pa.Table) -> pa.Table:
        srs, ns, peaks, energies = [], [], [], []
        for payload in t.column("payload").to_pylist():
            try:
                sr, n, peak, energy = self._decode(payload)
            except Exception:
                sr, n, peak, energy = 0, -1, 0, 0
            srs.append(sr)
            ns.append(n)
            peaks.append(peak)
            energies.append(energy)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "sample_rate": pa.array(srs, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "peak": pa.array(peaks, pa.int64()),
                "energy": pa.array(energies, pa.int64()),
            }
        )


def wav_features(
    media: "ray.data.Dataset", concurrency: "tuple[int, int] | None" = None
) -> "ray.data.Dataset":
    """(media_id, payload) WAV table -> integer-exact audio stats via the
    real stdlib codec (per-worker cached decoder)."""
    return decode_stage(media, WavPcmDecoder, concurrency=concurrency)


class WavDspDecoder(WavPcmDecoder):
    """Real-codec audio FEATURE extraction (not just stats): decodes the
    RIFF/WAV container with the stdlib codec, then computes waveform DSP —
    zero-crossing count and absolute-amplitude sum (integer-exact, SQL-
    oracle-able because the fixture samples are arithmetic), plus the FFT
    spectral centroid in Hz (numpy rfft — real frequency-domain analysis;
    float, so its query is rows-only and the physics is pinned by a
    pure-tone pytest)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ns, zcrs, abs_sums, cents = [], [], [], []
        for payload in t.column("payload").to_pylist():
            try:
                import io

                with self._wave.open(io.BytesIO(payload), "rb") as w:
                    if w.getnchannels() != 1 or w.getsampwidth() != 2:
                        raise ValueError("expected mono PCM16")
                    sr = w.getframerate()
                    n = w.getnframes()
                    s = np.frombuffer(w.readframes(n), dtype="<i2").astype(np.int64)
                zcr = int(np.sum(s[:-1] * s[1:] < 0)) if n > 1 else 0
                abs_sum = int(np.abs(s).sum())
                if n > 1:
                    mag = np.abs(np.fft.rfft(s.astype(np.float64)))
                    freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                    denom = mag.sum()
                    cent = float((mag * freqs).sum() / denom) if denom > 0 else 0.0
                else:
                    cent = 0.0
            except Exception:
                n, zcr, abs_sum, cent = -1, 0, 0, 0.0
            ns.append(n)
            zcrs.append(zcr)
            abs_sums.append(abs_sum)
            cents.append(cent)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "n_samples": pa.array(ns, pa.int64()),
                "zcr": pa.array(zcrs, pa.int64()),
                "abs_sum": pa.array(abs_sums, pa.int64()),
                "centroid_hz": pa.array(cents, pa.float64()),
            }
        )


def wav_dsp_features(
    media: "ray.data.Dataset", concurrency: "tuple[int, int] | None" = None
) -> "ray.data.Dataset":
    """(media_id, payload) WAV table -> waveform + spectral features via the
    real stdlib codec and numpy FFT (per-worker cached decoder)."""
    return decode_stage(media, WavDspDecoder, concurrency=concurrency)


# ---------------------------------------------------------------------------
# REAL image codec: uncompressed 24-bit BMP via struct + numpy (round 4)
# ---------------------------------------------------------------------------
# Same playbook as the WAV codec above: the container is REAL (BITMAPFILE-
# HEADER + BITMAPINFOHEADER, bottom-up rows, 4-byte row padding, BGR byte
# order) and the parser is pure stdlib/numpy, so the reference's Tesseract-
# input raster path (Pdf-To-ImageStream/Convert.cs:9-35 produces page
# rasters) has a genuine decode analog without PIL in the container.


def bmp_encode(pix: "np.ndarray") -> bytes:
    """(h, w) uint8 grayscale -> real uncompressed 24-bit BMP bytes
    (bottom-up rows, 4-byte-aligned strides, gray replicated into BGR)."""
    import struct

    h, w = pix.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    img_size = stride * h
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + img_size, 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    bgr = np.repeat(pix[:, :, None].astype(np.uint8), 3, axis=2)
    padb = b"\x00" * pad
    body = b"".join(bgr[y].tobytes() + padb for y in range(h - 1, -1, -1))
    return header + info + body


def synth_bmp_batch(t: pa.Table) -> pa.Table:
    """Deterministic BMP fixture per document: a (8 + doc_id % 5) x
    (8 + doc_id % 9) grayscale image with pixel(idx) = (doc_id*31 + idx*13)
    % 256 in row-major top-down order — pure integer arithmetic a SQL oracle
    can regenerate, wrapped in a REAL BMP container (width range 8..16
    exercises every 4-byte row-padding case)."""
    ids = t.column("doc_id").to_numpy()
    payloads = []
    for d in ids:
        d = int(d)
        w, h = 8 + d % 9, 8 + d % 5
        idx = np.arange(h * w, dtype=np.int64)
        pix = ((d * 31 + idx * 13) % 256).astype(np.uint8).reshape(h, w)
        payloads.append(bmp_encode(pix))
    return pa.table(
        {
            "media_id": pa.array(ids.astype("int64"), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


class BmpDecoder:
    """Actor-pool REAL image decode stage: parses the BMP container (file
    header, DIB header, bottom-up or top-down row order, row padding, 24-bit
    BGR) with numpy and emits integer-exact per-image stats. Malformed
    payloads become quarantine rows (width = -1) rather than poisoning the
    batch (Worker.cs:117-125 per-item try/catch analog)."""

    def _decode(self, payload: bytes) -> "np.ndarray":
        """payload -> (h, w, 3) uint8 BGR pixel array (top-down row order)."""
        if len(payload) < 54 or payload[:2] != b"BM":
            raise ValueError("not a BMP")
        off = int.from_bytes(payload[10:14], "little")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        bpp = int.from_bytes(payload[28:30], "little")
        compression = int.from_bytes(payload[30:34], "little")
        if bpp != 24 or compression != 0 or w <= 0 or h == 0:
            raise ValueError("unsupported BMP variant")
        top_down = h < 0
        h = abs(h)
        stride = ((w * 3 + 3) // 4) * 4
        if off + stride * h > len(payload):
            raise ValueError("truncated pixel data")
        raw = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=off)
        rows = raw.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        return rows if top_down else rows[::-1]

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, sums, maxs = [], [], [], []
        for payload in t.column("payload").to_pylist():
            try:
                px = self._decode(payload)
                h, w = px.shape[:2]
                s = int(px.sum(dtype=np.int64))
                mx = int(px.max())
            except Exception:
                w, h, s, mx = -1, -1, 0, 0
            ws.append(w)
            hs.append(h)
            sums.append(s)
            maxs.append(mx)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "px_max": pa.array(maxs, pa.int64()),
            }
        )


def bmp_features(
    media: "ray.data.Dataset", concurrency: "tuple[int, int] | None" = None
) -> "ray.data.Dataset":
    """(media_id, payload) BMP table -> integer-exact image stats via the
    real numpy codec (per-worker cached decoder)."""
    return decode_stage(media, BmpDecoder, concurrency=concurrency)


# ---------------------------------------------------------------------------
# REAL video codec: YUV4MPEG2 (Y4M) containers via struct-free parsing (r5)
# ---------------------------------------------------------------------------
# Retires the last codec stub. Y4M is the classic uncompressed video
# interchange format (mjpegtools lineage): an ASCII stream header
# "YUV4MPEG2 W<w> H<h> F<n>:<d> Ip A1:1 C<fmt>\n" followed by frames, each
# "FRAME\n" + raw planar pixel data. We encode/decode the Cmono variant
# (a single Y plane per frame, w*h bytes) — pure python/numpy, same
# playbook as the WAV/BMP codecs above.


def y4m_encode(frames: "np.ndarray", fps: tuple[int, int] = (25, 1)) -> bytes:
    """(n_frames, h, w) uint8 luma -> real YUV4MPEG2 Cmono container bytes."""
    n, h, w = frames.shape
    header = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 Cmono\n"
    parts = [header.encode("ascii")]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[f].astype(np.uint8).tobytes())
    return b"".join(parts)


def synth_y4m_batch(t: pa.Table) -> pa.Table:
    """Deterministic Y4M fixture per document: nf = 2 + doc_id % 3 frames of
    (4 + doc_id % 3) x (8 + doc_id % 5) luma with pixel(f, i) =
    (doc_id*31 + f*101 + i*13) % 256 in row-major order — pure integer
    arithmetic a SQL oracle can regenerate, wrapped in a REAL Y4M container."""
    ids = t.column("doc_id").to_numpy()
    payloads = []
    for d in ids:
        d = int(d)
        w, h, nf = 8 + d % 5, 4 + d % 3, 2 + d % 3
        i = np.arange(h * w, dtype=np.int64)
        frames = np.stack(
            [((d * 31 + f * 101 + i * 13) % 256).astype(np.uint8).reshape(h, w)
             for f in range(nf)]
        )
        payloads.append(y4m_encode(frames))
    return pa.table(
        {
            "media_id": pa.array(ids.astype("int64"), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )


def _y4m_parse(payload: bytes) -> "tuple[int, int, np.ndarray]":
    """Y4M bytes -> (width, height, (n, h, w) uint8 frames). Validates the
    magic, the parameter tokens, Cmono sampling, and every FRAME marker."""
    nl = payload.find(b"\n")
    if nl < 0 or not payload.startswith(b"YUV4MPEG2"):
        raise ValueError("not a Y4M stream")
    w = h = None
    fmt = "420"  # Y4M default when no C tag is present
    for tok in payload[:nl].decode("ascii").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "C":
            fmt = tok[1:]
    if not w or not h:
        raise ValueError("missing W/H header tokens")
    if fmt != "mono":
        raise ValueError(f"unsupported sampling C{fmt} (Cmono only)")
    fsize = w * h
    frames = []
    pos = nl + 1
    while pos < len(payload):
        fnl = payload.find(b"\n", pos)
        if fnl < 0 or not payload[pos:fnl].startswith(b"FRAME"):
            raise ValueError("bad FRAME marker")
        start = fnl + 1
        if start + fsize > len(payload):
            raise ValueError("truncated frame data")
        frames.append(
            np.frombuffer(payload, np.uint8, count=fsize, offset=start)
            .reshape(h, w)
        )
        pos = start + fsize
    return w, h, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


class Y4mDecoder:
    """Actor-pool REAL video decode stage: parses the YUV4MPEG2 container
    (stream header tokens, per-frame FRAME markers, mono luma planes) and
    emits integer-exact per-clip stats. Malformed payloads quarantine as
    n_frames = -1 (Worker.cs:117-125 per-item try/catch analog)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ws, hs, nfs, sums, maxs = [], [], [], [], []
        for payload in t.column("payload").to_pylist():
            try:
                w, h, frames = _y4m_parse(payload)
                nf = int(frames.shape[0])
                s = int(frames.sum(dtype=np.int64))
                mx = int(frames.max()) if nf else 0
            except Exception:
                w, h, nf, s, mx = -1, -1, -1, 0, 0
            ws.append(w)
            hs.append(h)
            nfs.append(nf)
            sums.append(s)
            maxs.append(mx)
        return pa.table(
            {
                "media_id": t.column("media_id"),
                "width": pa.array(ws, pa.int64()),
                "height": pa.array(hs, pa.int64()),
                "n_frames": pa.array(nfs, pa.int64()),
                "px_sum": pa.array(sums, pa.int64()),
                "px_max": pa.array(maxs, pa.int64()),
            }
        )


class Y4mFrameSampler:
    """REAL-codec frame sampling flat-map: parses the Y4M container and
    emits every ``stride``-th frame as a row with integer-exact per-frame
    stats (the D1 "1 doc -> N pages" cardinality change over a genuine
    parser instead of byte-chunk slicing). Payload bytes never leave the
    stage. Malformed payloads quarantine as a single frame_idx = -1 row."""

    def __init__(self, stride: int = 2):
        self.stride = max(1, stride)

    def __call__(self, t: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "width": [], "height": [],
               "fr_sum": [], "fr_max": []}
        for mid, payload in zip(
            t.column("media_id").to_pylist(), t.column("payload").to_pylist()
        ):
            try:
                w, h, frames = _y4m_parse(payload)
            except Exception:
                out["media_id"].append(mid)
                out["frame_idx"].append(-1)
                out["width"].append(-1)
                out["height"].append(-1)
                out["fr_sum"].append(0)
                out["fr_max"].append(0)
                continue
            for fi in range(0, frames.shape[0], self.stride):
                out["media_id"].append(mid)
                out["frame_idx"].append(fi)
                out["width"].append(w)
                out["height"].append(h)
                out["fr_sum"].append(int(frames[fi].sum(dtype=np.int64)))
                out["fr_max"].append(int(frames[fi].max()))
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "frame_idx": pa.array(out["frame_idx"], pa.int64()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
                "fr_sum": pa.array(out["fr_sum"], pa.int64()),
                "fr_max": pa.array(out["fr_max"], pa.int64()),
            }
        )


def y4m_features(
    media: "ray.data.Dataset", concurrency: "tuple[int, int] | None" = None
) -> "ray.data.Dataset":
    """(media_id, payload) Y4M table -> integer-exact clip stats via the
    real parser (per-worker cached decoder)."""
    return decode_stage(media, Y4mDecoder, concurrency=concurrency)


def y4m_sample_frames(
    media: "ray.data.Dataset", stride: int = 2,
    concurrency: "tuple[int, int] | None" = None,
) -> "ray.data.Dataset":
    """(media_id, payload) Y4M table -> one row per sampled frame with
    integer-exact per-frame stats (real-codec FrameSampler)."""
    return decode_stage(
        media, Y4mFrameSampler, concurrency=concurrency, stride=stride
    )
