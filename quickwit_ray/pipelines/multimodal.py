"""Multimodal column plumbing: image/audio/video as opaque `binary`
columns with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment): `DecodeImageStage` raises NotImplementedError unless
`fake=True`, in which case a deterministic fake decoder (parse our own
fake header) stands in. The Ray-side plumbing — schema contract, actor
pool setup, batch sizing for wide binary rows, output layout — is real
and tested; swapping in PIL/ffmpeg is a one-function change in
`__init__`.
"""

from __future__ import annotations

import hashlib
from typing import Optional

import numpy as np
import pyarrow as pa

IMAGE_META_SCHEMA = pa.schema([
    ("width", pa.int32()), ("height", pa.int32()), ("channels", pa.int32()),
    ("format", pa.string()),
])


def make_fake_image(width: int, height: int, fmt: str = "fake") -> bytes:
    """Deterministic fake 'encoded image': header + seeded pixel bytes."""
    head = f"FAKEIMG:{fmt}:{width}:{height};".encode()
    n = width * height * 3
    seed = int(hashlib.sha1(head).hexdigest()[:8], 16)
    rng = np.random.Generator(np.random.PCG64(seed))
    return head + rng.integers(0, 256, n, dtype=np.uint8).tobytes()


class DecodeImageStage:
    """Actor-pool stage: binary image column -> decoded metadata + feature.

    Real deployment: replace `_decode` with PIL/torchvision in __init__
    (loaded ONCE per actor). Batch size must stay small for multi-MB
    payloads — callers pass batch_size explicitly.
    """

    def __init__(self, image_col: str = "image", fake: bool = False,
                 resize_to: Optional[tuple[int, int]] = None):
        self.image_col = image_col
        self.fake = fake
        self.resize_to = resize_to
        if not fake:
            raise NotImplementedError(
                "image decode requires an image library not present in this "
                "environment; construct with fake=True for the deterministic "
                "fake decoder (real plumbing, stubbed kernel)")

    def _decode(self, buf: bytes):
        if not buf.startswith(b"FAKEIMG:"):
            return None
        head, _, _ = buf.partition(b";")
        _, fmt, w, h = head.decode().split(":")
        w, h = int(w), int(h)
        pixels = np.frombuffer(buf[len(head) + 1:], np.uint8)
        return fmt, w, h, pixels[: w * h * 3].reshape(h, w, 3)

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, channels, fmts, means = [], [], [], [], []
        for buf in batch[self.image_col].to_pylist():
            dec = self._decode(buf) if buf is not None else None
            if dec is None:
                widths.append(None); heights.append(None)
                channels.append(None); fmts.append(None); means.append(None)
                continue
            fmt, w, h, px = dec
            if self.resize_to is not None:
                tw, th = self.resize_to
                yi = (np.arange(th) * h // th)[:, None]
                xi = (np.arange(tw) * w // tw)[None, :]
                px = px[yi, xi]
                h, w = th, tw
            widths.append(w); heights.append(h); channels.append(3)
            fmts.append(fmt); means.append(float(px.mean()))
        out = batch.drop_columns([self.image_col])
        return (out.append_column("width", pa.array(widths, pa.int32()))
                   .append_column("height", pa.array(heights, pa.int32()))
                   .append_column("channels", pa.array(channels, pa.int32()))
                   .append_column("format", pa.array(fmts, pa.string()))
                   .append_column("pixel_mean", pa.array(means, pa.float64())))


class FrameSampleStage:
    """Video frame-sampling stage stub: binary 'video' column -> one row
    per sampled frame index (real plumbing; ffmpeg kernel stubbed)."""

    def __init__(self, video_col: str = "video", every_n: int = 10, fake: bool = False):
        self.video_col = video_col
        self.every_n = every_n
        if not fake:
            raise NotImplementedError(
                "video decode requires ffmpeg; construct with fake=True")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, frames = [], []
        id_col = batch.column_names[0]
        for rid, buf in zip(batch[id_col].to_pylist(),
                            batch[self.video_col].to_pylist()):
            n_frames = (len(buf) // 1000) if buf else 0  # fake: 1 frame / KB
            for f in range(0, n_frames, self.every_n):
                ids.append(rid)
                frames.append(f)
        return pa.table({id_col: pa.array(ids), "frame_index": pa.array(frames, pa.int32())})


def decode_images(ds, image_col: str = "image", fake: bool = True,
                  resize_to=None, concurrency: int = 4, batch_size: int = 64):
    """Wire the decode stage as an actor pool with small batches (wide
    binary payloads: batch_size x concurrency must fit worker heaps)."""
    return ds.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs=dict(image_col=image_col, fake=fake,
                                   resize_to=resize_to),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=1)
