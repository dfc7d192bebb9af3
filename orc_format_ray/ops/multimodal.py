"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool `map_batches` stages.

The decode kernels themselves are STUBBED (this container has no image/audio
libraries): each stage tries the real library in ``__init__`` and otherwise
uses a clearly-marked deterministic fake (or raises NotImplementedError when
``strict=True``). The Ray-side contract — schema, batch sizing for large
binary payloads, actor signature, output layout — is real and tested.

Scale notes: binary payloads make rows wide; stages default to small
``batch_size`` so batch x concurrency fits the worker heap, and outputs keep
payload columns binary (never pandas object dtype round-trips).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

IMAGE_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("payload", pa.binary()),
        pa.field("media_type", pa.string()),  # "image/png", ...
        pa.field("width", pa.int32()),
        pa.field("height", pa.int32()),
    ]
)

RECOMMENDED_BATCH_SIZE = 64  # large binary rows: keep batches small


class DecodeImage:
    """binary payload -> (height, width, 3) uint8 pixels (flattened column).

    Real path uses PIL when importable; fake path derives deterministic
    pixels from the payload hash. STUB: the fake is NOT a real decoder.
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None
            if strict:
                raise NotImplementedError("image decoding requires PIL, not available in this environment")

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        widths = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        pixels = []
        if self._pil is not None:
            import io

            for blob in batch["payload"]:
                with self._pil.open(io.BytesIO(blob.as_py())) as im:
                    pixels.append(np.asarray(im.convert("RGB"), dtype=np.uint8).reshape(-1))
        else:
            # deterministic fake: seeded by payload bytes (STUB, not a decoder)
            import zlib

            for blob, h, w in zip(batch["payload"], heights, widths):
                seed = zlib.crc32(blob.as_py())
                rng = np.random.default_rng(seed)
                pixels.append(rng.integers(0, 256, int(h) * int(w) * 3, dtype=np.uint8))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array([p.tobytes() for p in pixels], type=pa.binary()),
                "width": batch["width"],
                "height": batch["height"],
            }
        )


class ResizeImage:
    """Nearest-neighbor resize over decoded pixel buffers (pure numpy, real)."""

    def __init__(self, out_w: int = 32, out_h: int = 32):
        self.out_w = out_w
        self.out_h = out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        ws = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        hs = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        for blob, w, h in zip(batch["pixels"], ws, hs):
            px = np.frombuffer(blob.as_py(), dtype=np.uint8).reshape(int(h), int(w), 3)
            yi = (np.arange(self.out_h) * h // self.out_h).astype(np.int64)
            xi = (np.arange(self.out_w) * w // self.out_w).astype(np.int64)
            out.append(px[yi][:, xi].reshape(-1).tobytes())
        return pa.table(
            {
                "media_id": batch["media_id"],
                "pixels": pa.array(out, type=pa.binary()),
                "width": pa.array(np.full(len(out), self.out_w, dtype=np.int32)),
                "height": pa.array(np.full(len(out), self.out_h, dtype=np.int32)),
            }
        )


class ImageFeatures:
    """Cheap per-image features from pixel buffers (mean/std per channel)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for blob in batch["pixels"]:
            px = np.frombuffer(blob.as_py(), dtype=np.uint8).reshape(-1, 3).astype(np.float32)
            feats.append(np.concatenate([px.mean(axis=0), px.std(axis=0)]).astype(np.float32))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([f.tolist() for f in feats], type=pa.list_(pa.float32())),
            }
        )


class SampleFrames:
    """Video frame sampling STUB: emits every Nth 'frame' (payload chunk).

    Real frame extraction requires a video library; the chunking plumbing
    (one row per sampled frame, frame_index column) is the tested contract.
    """

    def __init__(self, every_n: int = 10, frame_bytes: int = 1024, strict: bool = False):
        if strict:
            raise NotImplementedError("video decoding library not available in this environment")
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs = [], [], []
        for mid, blob in zip(batch["media_id"], batch["payload"]):
            data = blob.as_py()
            n_frames = max(1, len(data) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_n):
                ids.append(mid.as_py())
                idxs.append(fi)
                frames.append(data[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
            }
        )


def synthetic_media_table(n: int = 32, seed: int = 11) -> pa.Table:
    """Deterministic fake media rows matching IMAGE_SCHEMA (for tests)."""
    rng = np.random.default_rng(seed)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "payload": pa.array([rng.integers(0, 256, int(rng.integers(512, 4096)), dtype=np.uint8).tobytes() for _ in range(n)], type=pa.binary()),
            "media_type": pa.array(["image/fake"] * n),
            "width": pa.array(rng.integers(8, 64, n).astype(np.int32)),
            "height": pa.array(rng.integers(8, 64, n).astype(np.int32)),
        }
    )
