"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by actor-pool `map_batches` stages.

Decode is REAL for the library-free formats — BMP (24-bit uncompressed),
PPM (P6), WAV (PCM16) and Y4M (YUV4MPEG2 raw video) are parsed with
struct+numpy from their public specs; compressed formats (JPEG/PNG/mp4/...)
use PIL when importable, else a clearly-marked deterministic fake (or
NotImplementedError when ``strict=True``).

Scale notes: binary payloads make rows wide; stages default to small
``batch_size`` so batch x concurrency fits the worker heap, and outputs keep
payload columns binary (never pandas object dtype round-trips).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

# ------------------------------------------------- library-free media codecs


def encode_bmp(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP (BGR, bottom-up,
    4-byte row padding — the classic BITMAPINFOHEADER layout)."""
    h, w, _ = px.shape
    row = w * 3
    stride = (row + 3) & ~3
    data_size = stride * h
    off = 14 + 40
    hdr = struct.pack("<2sIHHI", b"BM", off + data_size, 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :row] = px[::-1, :, ::-1].reshape(h, row)
    return hdr + dib + rows.tobytes()


def decode_bmp(b: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (h, w, 3) uint8 RGB."""
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", b, 10)[0]
    w, h = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    comp = struct.unpack_from("<I", b, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp}: only 24-bit uncompressed")
    bottom_up = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    arr = np.frombuffer(b, np.uint8, stride * h, off).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        arr = arr[::-1]
    return arr[:, :, ::-1].copy()  # BGR -> RGB


def encode_ppm(px: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    h, w, _ = px.shape
    return b"P6\n%d %d\n255\n" % (w, h) + px.tobytes()


def decode_ppm(b: bytes) -> np.ndarray:
    """P6 PPM -> (h, w, 3) uint8 RGB (whitespace/comment-tolerant header)."""
    if b[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    toks: list[int] = []
    p = 2
    while len(toks) < 3:
        while p < len(b) and b[p : p + 1].isspace():
            p += 1
        if b[p : p + 1] == b"#":  # comment to end of line
            while p < len(b) and b[p] != 0x0A:
                p += 1
            continue
        start = p
        while p < len(b) and not b[p : p + 1].isspace():
            p += 1
        toks.append(int(b[start:p]))
    p += 1  # single whitespace after maxval
    w, h, maxval = toks
    if maxval != 255:
        raise NotImplementedError("PPM maxval != 255")
    return np.frombuffer(b, np.uint8, h * w * 3, p).reshape(h, w, 3).copy()


def encode_y4m(frames: np.ndarray, fps: int = 30) -> bytes:
    """(n_frames, h, w) uint8 grayscale -> YUV4MPEG2 (C420, neutral chroma).

    Y4M is a pure-text-header raw video format (public spec): one stream
    header line, then per frame a ``FRAME\\n`` marker + planar YUV420 bytes.
    """
    n, h, w = frames.shape
    if h % 2 or w % 2:
        raise ValueError("Y4M C420 needs even dimensions")
    hdr = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 C420\n".encode()
    chroma = np.full((h // 2) * (w // 2), 128, np.uint8).tobytes()
    parts = [hdr]
    for f in frames:
        parts.append(b"FRAME\n")
        parts.append(f.tobytes())
        parts.append(chroma)  # U plane
        parts.append(chroma)  # V plane
    return b"".join(parts)


def decode_y4m(b: bytes) -> tuple[np.ndarray, int]:
    """YUV4MPEG2 (C420) -> ((n_frames, h, w) uint8 luma planes, fps)."""
    if not b.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 payload")
    eol = b.index(b"\n")
    w = h = fps = None
    for tok in b[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
        elif tok[:1] == b"F":
            fps = int(tok[1:].split(b":")[0])
        elif tok[:1] == b"C" and tok not in (b"C420", b"C420jpeg", b"C420mpeg2", b"C420paldv"):
            raise NotImplementedError(f"Y4M chroma {tok!r}: only C420 variants")
    if w is None or h is None:
        raise ValueError("Y4M header missing W/H")
    frame_bytes = h * w + 2 * (h // 2) * (w // 2)
    p = eol + 1
    frames = []
    while p < len(b):
        fe = b.index(b"\n", p)  # FRAME line (may carry parameters)
        if b[p : p + 5] != b"FRAME":
            raise ValueError("corrupt Y4M: missing FRAME marker")
        p = fe + 1
        frames.append(np.frombuffer(b, np.uint8, h * w, p).reshape(h, w))
        p += frame_bytes
    return (np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)), (fps or 30)


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 samples, (n,) or (n, channels) -> RIFF/WAVE PCM16."""
    if samples.ndim == 1:
        samples = samples[:, None]
    ch = samples.shape[1]
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(b: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 -> ((n, channels) int16 samples, sample_rate)."""
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    p = 12
    rate = ch = None
    data = None
    while p + 8 <= len(b):
        cid = b[p : p + 4]
        ln = struct.unpack_from("<I", b, p + 4)[0]
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", b, p + 8)
            if audio_fmt != 1 or bits != 16:
                raise NotImplementedError(f"WAV format={audio_fmt} bits={bits}: only PCM16")
        elif cid == b"data":
            data = b[p + 8 : p + 8 + ln]
        p += 8 + ln + (ln & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return np.frombuffer(data, dtype="<i2").reshape(-1, ch), int(rate)

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

    Dispatch on magic bytes: BMP, PPM and PNG decode natively (real
    parsers above, no library — PNG covers 8-bit gray/RGB/RGBA/palette and
    all five scanline filters); other formats use PIL when importable;
    otherwise a deterministic fake seeded by the payload hash (STUB — not
    a decoder; ``strict=True`` raises instead of faking).
    """

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:
            from PIL import Image  # noqa: F401

            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode_one(self, data: bytes, h: int, w: int) -> np.ndarray:
        if data[:2] == b"BM":
            return decode_bmp(data).reshape(-1)
        if data[:2] == b"P6":
            return decode_ppm(data).reshape(-1)
        if data[:8] == _PNG_MAGIC:
            px = decode_png(data)
            if px.ndim == 2:  # gray -> RGB
                px = np.repeat(px[:, :, None], 3, axis=2)
            elif px.shape[2] == 2:  # gray+alpha -> RGB (alpha dropped)
                px = np.repeat(px[:, :, :1], 3, axis=2)
            elif px.shape[2] == 4:  # RGBA -> RGB (alpha dropped)
                px = px[:, :, :3]
            return np.ascontiguousarray(px).reshape(-1)
        if self._pil is not None:
            import io

            with self._pil.open(io.BytesIO(data)) as im:
                return np.asarray(im.convert("RGB"), dtype=np.uint8).reshape(-1)
        if self.strict:
            raise NotImplementedError("payload is not BMP/PPM and PIL is unavailable")
        # deterministic fake: seeded by payload bytes (STUB, not a decoder)
        import zlib

        rng = np.random.default_rng(zlib.crc32(data))
        return rng.integers(0, 256, h * w * 3, dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        widths = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        pixels = [
            self._decode_one(blob.as_py(), int(h), int(w))
            for blob, h, w in zip(batch["payload"], heights, widths)
        ]
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
    """Video frame sampling: every Nth frame as a row.

    Y4M (YUV4MPEG2) payloads are REALLY decoded (library-free raw format,
    parser above) — the emitted ``frame`` is the luma plane bytes with
    width/height columns. Other containers (mp4/webm/...) need a video
    library this environment lacks: ``strict=True`` raises for them,
    otherwise a clearly-marked chunking STUB emits fixed-size payload slices.
    """

    def __init__(self, every_n: int = 10, frame_bytes: int = 1024, strict: bool = False):
        self.every_n = every_n
        self.frame_bytes = frame_bytes
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames, idxs, ws, hs = [], [], [], [], []
        for mid, blob in zip(batch["media_id"], batch["payload"]):
            data = blob.as_py()
            if data.startswith(b"YUV4MPEG2"):
                planes, _fps = decode_y4m(data)
                for fi in range(0, len(planes), self.every_n):
                    ids.append(mid.as_py())
                    idxs.append(fi)
                    frames.append(planes[fi].tobytes())
                    hs.append(planes.shape[1])
                    ws.append(planes.shape[2])
                continue
            if self.strict:
                raise NotImplementedError("payload is not Y4M and no video library is available")
            # STUB: fixed-size payload chunks stand in for frames
            n_frames = max(1, len(data) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_n):
                ids.append(mid.as_py())
                idxs.append(fi)
                frames.append(data[fi * self.frame_bytes : (fi + 1) * self.frame_bytes])
                ws.append(0)
                hs.append(0)
        return pa.table(
            {
                "media_id": pa.array(ids, type=pa.int64()),
                "frame_index": pa.array(idxs, type=pa.int32()),
                "frame": pa.array(frames, type=pa.binary()),
                "width": pa.array(ws, type=pa.int32()),
                "height": pa.array(hs, type=pa.int32()),
            }
        )


class DecodeAudio:
    """binary WAV payload -> samples + rate (real PCM16 parser, no library)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        blobs, rates, chans, ns = [], [], [], []
        for blob in batch["payload"]:
            samples, rate = decode_wav(blob.as_py())
            blobs.append(samples.tobytes())
            rates.append(rate)
            chans.append(samples.shape[1])
            ns.append(samples.shape[0])
        return pa.table(
            {
                "media_id": batch["media_id"],
                "samples": pa.array(blobs, type=pa.binary()),
                "rate": pa.array(rates, type=pa.int32()),
                "channels": pa.array(chans, type=pa.int32()),
                "n_samples": pa.array(ns, type=pa.int64()),
            }
        )


class AudioFeatures:
    """Per-clip DSP features from PCM16 buffers: duration, RMS, peak,
    zero-crossing rate (all vectorized numpy)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        rates = batch["rate"].to_numpy(zero_copy_only=False)
        chans = batch["channels"].to_numpy(zero_copy_only=False)
        for blob, rate, ch in zip(batch["samples"], rates, chans):
            x = np.frombuffer(blob.as_py(), dtype="<i2").reshape(-1, int(ch)).astype(np.float64) / 32768.0
            mono = x.mean(axis=1)
            zc = float(np.mean(np.abs(np.diff(np.signbit(mono).astype(np.int8))))) if len(mono) > 1 else 0.0
            feats.append(
                [
                    len(mono) / float(rate),  # duration_s
                    float(np.sqrt(np.mean(mono**2))) if len(mono) else 0.0,  # rms
                    float(np.abs(mono).max()) if len(mono) else 0.0,  # peak
                    zc,  # zero-crossing rate
                ]
            )
        return pa.table(
            {
                "media_id": batch["media_id"],
                "features": pa.array([[round(v, 6) for v in f] for f in feats], type=pa.list_(pa.float64())),
            }
        )


def _synthetic_pixels(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Deterministic gradient + noise test image."""
    yy, xx = np.mgrid[0:h, 0:w]
    px = np.empty((h, w, 3), np.uint8)
    px[:, :, 0] = (xx * 255 // max(w - 1, 1)).astype(np.uint8)
    px[:, :, 1] = (yy * 255 // max(h - 1, 1)).astype(np.uint8)
    px[:, :, 2] = rng.integers(0, 256, (h, w), dtype=np.uint8)
    return px


def synthetic_media_table(n: int = 32, seed: int = 11) -> pa.Table:
    """Deterministic REAL media rows matching IMAGE_SCHEMA: alternating
    genuine BMP / PPM / PNG payloads (library-free formats the decoder
    parses for real)."""
    rng = np.random.default_rng(seed)
    ids, payloads, mtypes, ws, hs = [], [], [], [], []
    for i in range(n):
        h = int(rng.integers(8, 64))
        w = int(rng.integers(8, 64))
        px = _synthetic_pixels(rng, h, w)
        if i % 3 == 0:
            payloads.append(encode_bmp(px))
            mtypes.append("image/bmp")
        elif i % 3 == 1:
            payloads.append(encode_ppm(px))
            mtypes.append("image/x-portable-pixmap")
        else:
            payloads.append(encode_png(px))
            mtypes.append("image/png")
        ids.append(i)
        ws.append(w)
        hs.append(h)
    return pa.table(
        {
            "media_id": pa.array(ids, type=pa.int64()),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(mtypes),
            "width": pa.array(np.asarray(ws, dtype=np.int32)),
            "height": pa.array(np.asarray(hs, dtype=np.int32)),
        }
    )


def synthetic_video_table(n: int = 8, seed: int = 13) -> pa.Table:
    """Deterministic REAL Y4M clips (moving-gradient grayscale frames)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        h = int(rng.integers(4, 17)) * 2
        w = int(rng.integers(4, 17)) * 2
        nf = int(rng.integers(5, 40))
        yy, xx = np.mgrid[0:h, 0:w]
        frames = ((xx[None] * 7 + yy[None] * 3 + np.arange(nf)[:, None, None] * 11) % 256).astype(np.uint8)
        rows.append({"media_id": i, "payload": encode_y4m(frames, fps=24), "media_type": "video/x-yuv4mpeg"})
    return pa.Table.from_pylist(rows).cast(
        pa.schema([("media_id", pa.int64()), ("payload", pa.binary()), ("media_type", pa.string())])
    )


def synthetic_audio_table(n: int = 16, seed: int = 12) -> pa.Table:
    """Deterministic REAL WAV clips (PCM16 sine + noise, mono/stereo mix)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        rate = 8000 if i % 2 == 0 else 16000
        dur = int(rng.integers(rate // 4, rate))  # 0.25-1.0 s
        t = np.arange(dur) / rate
        freq = float(rng.integers(100, 2000))
        mono = (np.sin(2 * np.pi * freq * t) * 12000 + rng.normal(0, 500, dur)).astype(np.int16)
        samples = mono if i % 3 else np.stack([mono, (mono // 2).astype(np.int16)], axis=1)
        rows.append({"media_id": i, "payload": encode_wav(samples, rate), "media_type": "audio/wav"})
    return pa.Table.from_pylist(rows).cast(
        pa.schema([("media_id", pa.int64()), ("payload", pa.binary()), ("media_type", pa.string())])
    )


class PerceptualHash:
    """payload -> 64-bit pHash (classic DCT perceptual hash): decode (real
    BMP/PPM parsers), integer luma, deterministic 32x32 box resample,
    DCT-II via two matmuls against a matrix precomputed ONCE per actor,
    top-left 8x8 low-frequency block thresholded at its median (DC
    excluded). Near-duplicate images (re-encodes, small edits, minor
    noise) land within a few bits; unrelated images differ by ~32.

    Actor-pool stage: pass the CLASS to map_batches(concurrency=...);
    the DCT basis and decoder live in __init__.
    """

    _N = 32  # resample + DCT size

    def __init__(self, strict: bool = True):
        self._decode = DecodeImage(strict=strict)
        n = self._N
        k = np.arange(n, dtype=np.float64)
        self._dct = np.sqrt(2.0 / n) * np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
        self._dct[0] *= np.sqrt(0.5)

    def _hash_one(self, data: bytes, h: int, w: int) -> int:
        px = self._decode._decode_one(data, h, w).reshape(h, w, 3).astype(np.int64)
        # integer luma (exact): (299 R + 587 G + 114 B) // 1000
        luma = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
        n = self._N
        # deterministic box resample: block means over floor-split ranges;
        # images smaller than 32px re-read rows/cols (nearest upsample)
        ri = (np.arange(n + 1, dtype=np.int64) * h) // n
        ci = (np.arange(n + 1, dtype=np.int64) * w) // n
        csum = np.zeros((h + 1, w + 1), dtype=np.int64)
        csum[1:, 1:] = luma.cumsum(0).cumsum(1)
        lo_r = np.minimum(ri[:-1], h - 1)
        hi_r = np.minimum(np.maximum(ri[1:], lo_r + 1), h)
        lo_c = np.minimum(ci[:-1], w - 1)
        hi_c = np.minimum(np.maximum(ci[1:], lo_c + 1), w)
        area = ((hi_r - lo_r)[:, None] * (hi_c - lo_c)[None, :]).astype(np.float64)
        block = (csum[hi_r][:, hi_c] - csum[hi_r][:, lo_c]
                 - csum[lo_r][:, hi_c] + csum[lo_r][:, lo_c]).astype(np.float64)
        g = block / area
        coef = self._dct @ g @ self._dct.T
        low = coef[:8, :8].copy().reshape(-1)
        med = np.median(low[1:])  # exclude DC
        bits = (low > med).astype(np.uint64)
        return int(np.bitwise_or.reduce(bits << np.arange(64, dtype=np.uint64)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        heights = batch["height"].to_numpy(zero_copy_only=False).astype(np.int64)
        widths = batch["width"].to_numpy(zero_copy_only=False).astype(np.int64)
        hashes = [
            self._hash_one(blob.as_py(), int(h), int(w))
            for blob, h, w in zip(batch["payload"], heights, widths)
        ]
        return pa.table({
            "media_id": batch["media_id"],
            "phash": pa.array(np.array(hashes, dtype=np.uint64).view(np.int64), pa.int64()),
        })


def phash_near_dups(ds, max_distance: int = 3, max_bucket: int = 10_000):
    """Near-duplicate image pairs by pHash hamming distance — the visual
    dedup pass. EXACT for ``max_distance <= 3``: the 64-bit hash splits
    into 4 x 16-bit bands, and by pigeonhole any pair within hamming 3
    agrees on at least one full band, so banding is a lossless blocking
    key (same guarantee shape as minhash LSH, but exact). Pairs emit
    exactly once: only from their LOWEST agreeing band (the interval_join
    canonical-cell rule). Buckets above ``max_bucket`` fail loudly (a
    constant-image corpus would otherwise go quadratic).

    Plan: one actor-pool hash pass (payloads never shuffle); per-band
    (band_key, media_id, phash) metadata groupbys; vectorized in-bucket
    pair expansion + popcount verify. Returns a Dataset of
    ``(id_a, id_b, distance)`` with id_a < id_b.
    """
    import pandas as pd
    import ray.data  # noqa: F401

    from .._rayutil import pool_size, remote_args

    if not 0 <= max_distance <= 3:
        raise ValueError("banded pHash blocking is exact only for max_distance in [0, 3]")

    hashed = ds.map_batches(PerceptualHash, concurrency=pool_size(),
                            batch_format="pyarrow", **remote_args())
    # actor-pool -> groupby deadlocks on small clusters (the union rule):
    # the hash table is tiny metadata — materialize it first.
    hashed = hashed.materialize()

    def bands(batch: pa.Table) -> pa.Table:
        h = batch["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        ids = batch["media_id"].to_numpy(zero_copy_only=False)
        out_band, out_key, out_id, out_hash = [], [], [], []
        for b in range(4):
            out_band.append(np.full(len(h), b, dtype=np.int64))
            out_key.append(((h >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64))
            out_id.append(ids)
            out_hash.append(h.view(np.int64))
        return pa.table({
            "band": pa.array(np.concatenate(out_band)),
            "key": pa.array(np.concatenate(out_key)),
            "media_id": pa.array(np.concatenate(out_id)),
            "phash": pa.array(np.concatenate(out_hash)),
        })

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        n = len(group)
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=np.int64),
                              "id_b": pd.Series([], dtype=np.int64),
                              "distance": pd.Series([], dtype=np.int64)})
        if n < 2:
            return empty
        if n > max_bucket:
            raise ValueError(f"phash band bucket holds {n} items (> {max_bucket})")
        band = int(group["band"].iloc[0])
        ids = group["media_id"].to_numpy()
        h = group["phash"].to_numpy().view(np.uint64)
        ia, ib = np.triu_indices(n, k=1)
        x = h[ia] ^ h[ib]
        dist = np.zeros(len(x), dtype=np.int64)
        v = x.copy()
        for _ in range(64):  # popcount via shift-accumulate (vectorized)
            dist += (v & np.uint64(1)).astype(np.int64)
            v >>= np.uint64(1)
            if not v.any():
                break
        keep = dist <= max_distance
        if not keep.any():
            return empty
        ia, ib, dist, x = ia[keep], ib[keep], dist[keep], x[keep]
        # canonical band: emit only if this is the LOWEST band the pair agrees on
        first_band = np.zeros(len(x), dtype=np.int64)
        agree_seen = np.zeros(len(x), dtype=bool)
        for b in range(4):
            agrees = ((x >> np.uint64(16 * b)) & np.uint64(0xFFFF)) == 0
            newly = agrees & ~agree_seen
            first_band[newly] = b
            agree_seen |= agrees
        keep2 = first_band == band
        a = np.minimum(ids[ia[keep2]], ids[ib[keep2]])
        b_ = np.maximum(ids[ia[keep2]], ids[ib[keep2]])
        return pd.DataFrame({"id_a": a.astype(np.int64), "id_b": b_.astype(np.int64),
                             "distance": dist[keep2]})

    return (
        hashed.map_batches(bands, batch_format="pyarrow", zero_copy_batch=True, **remote_args())
        .groupby(["band", "key"])
        .map_groups(pairs, batch_format="pandas", **remote_args())
    )


# ------------------------------------------------------------------- PNG

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/px


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import struct as _s
    import zlib as _z

    return (_s.pack(">I", len(payload)) + tag + payload
            + _s.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF))


def encode_png(px: np.ndarray) -> bytes:
    """uint8 pixels -> PNG. (h, w) -> grayscale; (h, w, 3) -> RGB;
    (h, w, 4) -> RGBA. Scanlines use filter 0 (None) — a fully valid,
    fully vectorized encoding; zlib does the compression."""
    import struct as _s
    import zlib as _z

    a = np.ascontiguousarray(px, dtype=np.uint8)
    if a.ndim == 2:
        ctype, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        ctype, ch = 2, 3
    elif a.ndim == 3 and a.shape[2] == 4:
        ctype, ch = 6, 4
    else:
        raise ValueError(f"encode_png wants (h,w[,3|4]) uint8, got {px.shape}")
    h, w = a.shape[:2]
    raw = np.zeros((h, 1 + w * ch), np.uint8)  # per-row filter byte 0
    raw[:, 1:] = a.reshape(h, w * ch)
    idat = _z.compress(raw.tobytes(), 6)
    ihdr = _s.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (_PNG_MAGIC + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", idat) + _png_chunk(b"IEND", b""))


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters. Filters 0/1/2 vectorize (1 = per-channel
    prefix sum mod 256); 3/4 (Average/Paeth) carry a left-pixel dependency
    and walk pixels within their rows — correct for foreign files; this
    engine's own encoder emits filter 0 only, so its decode path is fully
    vectorized."""
    rows = raw.reshape(h, 1 + stride)
    ftypes = rows[:, 0]
    out = np.zeros((h, stride), np.int64)
    for y in range(h):
        f = int(ftypes[y])
        cur = rows[y, 1:].astype(np.int64)
        prior = out[y - 1] if y else np.zeros(stride, np.int64)
        if f == 0:
            out[y] = cur
        elif f == 1:  # Sub: prefix sum along each channel lane
            lane = cur.reshape(-1, bpp)
            out[y] = np.cumsum(lane, axis=0).reshape(-1) % 256
        elif f == 2:  # Up
            out[y] = (cur + prior) % 256
        elif f == 3:  # Average (left dependency -> per-pixel walk)
            o = out[y]
            for x in range(stride):
                left = o[x - bpp] if x >= bpp else 0
                o[x] = (cur[x] + (left + prior[x]) // 2) % 256
        elif f == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                a = o[x - bpp] if x >= bpp else 0
                b = prior[x]
                c = prior[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb_ and pa_ <= pc_) else (b if pb_ <= pc_ else c)
                o[x] = (cur[x] + pred) % 256
        else:
            raise NotImplementedError(f"PNG filter type {f}")
    return out.astype(np.uint8)


def decode_png(b: bytes) -> np.ndarray:
    """PNG -> uint8 pixels ((h, w) gray, (h, w, 2) gray+alpha, (h, w, 3)
    RGB/palette, or (h, w, 4) RGBA). 8-bit depths, no interlace; palettes
    resolve through PLTE. CRCs are verified per chunk (corrupt is loud)."""
    import struct as _s
    import zlib as _z

    if not b.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG payload")
    p = len(_PNG_MAGIC)
    ihdr = None
    idat = []
    plte = None
    while p < len(b):
        (ln,) = _s.unpack(">I", b[p : p + 4])
        tag = b[p + 4 : p + 8]
        payload = b[p + 8 : p + 8 + ln]
        (crc,) = _s.unpack(">I", b[p + 8 + ln : p + 12 + ln])
        if _z.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch (corrupt file)")
        if tag == b"IHDR":
            ihdr = _s.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"PLTE":
            plte = np.frombuffer(payload, np.uint8).reshape(-1, 3)
        elif tag == b"IEND":
            break
        p += 12 + ln
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise NotImplementedError(f"PNG depth={depth} compression={comp}: 8-bit only")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG")
    if ctype not in _PNG_CHANNELS:
        raise NotImplementedError(f"PNG color type {ctype}")
    ch = _PNG_CHANNELS[ctype]
    raw = np.frombuffer(_z.decompress(b"".join(idat)), np.uint8)
    stride = w * ch
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel payload size mismatch (corrupt file)")
    out = _png_unfilter(raw, h, stride, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[out.reshape(h, w)]
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
