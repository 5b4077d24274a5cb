"""Multimodal column stages — binary payload plumbing with stubbed
codecs.

Treats image/audio/video as opaque ``binary`` columns with typed
metadata, as a 100 TB training-data pipeline would. The container has
no image/audio libraries, so the DECODE step is a deterministic fake
behind the ``Codec`` seam (clearly marked); everything Ray-side —
schema, batch sizing for large binaries, actor-pool signature, output
layout — is real and tested.

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


class ImageFeatureStage:
    """Actor-pool stage: decode + resize + feature-extract.

    ``__init__`` loads the codec once per actor (the model-load seam);
    ``__call__`` processes an Arrow batch of IMAGE_SCHEMA rows into
    (media_id, mean_rgb: list<float>, phash: uint64).
    """

    def __init__(self, codec: str = "fake", target: int = 8):
        if codec == "fake":
            self.codec = FakeCodec()
        else:  # pragma: no cover - real codecs absent in sandbox
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


def synth_media_table(n: int = 64, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table for tests/benchmarks."""
    ids = list(range(n))
    payloads = []
    for i in ids:
        rng = np.random.RandomState(i)
        payloads.append(rng.bytes(payload_bytes))
    return pa.table(
        {
            "media_id": pa.array(ids, pa.int64()),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["image/fake"] * n),
            "width": pa.array([32] * n, pa.int32()),
            "height": pa.array([32] * n, pa.int32()),
        }
    )
