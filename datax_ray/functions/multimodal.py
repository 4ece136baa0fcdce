"""Multimodal column plumbing: image/audio/video as opaque `binary` columns
with typed metadata, processed by actor-pool map_batches stages.

The decode kernels themselves are STUBBED (no image/audio libraries in this
environment): `DecodeStub` raises NotImplementedError unless
`deterministic_fake=True`, in which case it emits a seeded, content-derived
fake feature vector — so the Ray-side plumbing (schema, batch sizing, actor
signature, output layout) is real and tested, and swapping in a real
decoder is a one-method change.

Large binary payloads: keep `batch_size` small (memory = batch_size ×
payload × concurrency) and let blocks split; these stages default to
batch_size=64.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("width", pa.int32()),  # -1 when unknown/not applicable
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (payload = seeded bytes) for tests."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads = [rng.bytes(int(rng.integers(128, 2048))) for _ in range(n)]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
            "height": pa.array(rng.integers(16, 512, size=n).astype(np.int32)),
            "duration_ms": pa.array(
                np.where(kinds == "image", -1, rng.integers(100, 60000, size=n)).astype(
                    np.int32
                )
            ),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeStub:
    """Actor-pool decode/feature-extract stage.

    Real deployment: __init__ loads the codec/model once per actor;
    __call__ decodes each payload and emits features. Here the decode is
    stubbed: deterministic_fake=True derives a `feat_dim` float vector from
    the payload's sha1 (stable across runs); otherwise NotImplementedError —
    clearly marking the boundary where a real libjpeg/ffmpeg/librosa kernel
    plugs in.
    """

    def __init__(self, feat_dim: int = 16, deterministic_fake: bool = True):
        self.feat_dim = feat_dim
        self.fake = deterministic_fake
        # real impl would do: self.codec = load_codec(); self.model = ...

    def _decode_one(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "media decode requires image/audio libraries not present in "
                "this environment; run with deterministic_fake=True or plug "
                "a real decoder into DecodeStub._decode_one"
            )
        digest = hashlib.sha1(payload).digest()
        seed = int.from_bytes(digest[:8], "little")
        rng = np.random.default_rng(seed)
        return rng.standard_normal(self.feat_dim)

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self._decode_one(p, k)
            for p, k in zip(t["payload"].to_pylist(), t["kind"].to_pylist())
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
            }
        )


def extract_features(ds, feat_dim: int = 16, concurrency=(1, 4), batch_size: int = 64):
    """media table -> (media_id, kind, feature) via the actor-pool stage."""
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs=dict(feat_dim=feat_dim, deterministic_fake=True),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


class ResizeStub:
    """Actor-pool image-resize stage (plumbing real, pixel kernel stubbed).

    Real deployment: __init__ picks the resampling kernel once; __call__
    decodes + resizes each image payload. The stub recomputes width/height
    to fit `max_side` preserving aspect ratio (the metadata math IS real)
    and re-hashes the payload as the stand-in for resized bytes."""

    def __init__(self, max_side: int = 224, deterministic_fake: bool = True):
        self.max_side = max_side
        self.fake = deterministic_fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image resize requires an imaging library not present here; "
                "plug one into ResizeStub.__call__"
            )
        w = t["width"].to_numpy().astype(np.int64)
        h = t["height"].to_numpy().astype(np.int64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h).clip(min=1))
        new_w = np.maximum(1, (w * scale).astype(np.int32))
        new_h = np.maximum(1, (h * scale).astype(np.int32))
        payloads = [
            hashlib.sha1(p + bytes([int(nw) % 256, int(nh) % 256])).digest()
            for p, nw, nh in zip(t["payload"].to_pylist(), new_w, new_h)
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array(new_w, pa.int32()),
                "height": pa.array(new_h, pa.int32()),
                "duration_ms": t["duration_ms"],
            },
            schema=MEDIA_SCHEMA,
        )


class FrameSampleStub:
    """Actor-pool video frame sampler: one row in -> `fps`-spaced frame rows
    out (media_id, frame_idx, t_ms, frame payload). Row-count expansion via
    numpy repeat inside the batch — the real decoder would seek instead of
    re-hashing."""

    def __init__(self, every_ms: int = 1000, max_frames: int = 16,
                 deterministic_fake: bool = True):
        self.every_ms = every_ms
        self.max_frames = max_frames
        self.fake = deterministic_fake

    def __call__(self, t: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "frame sampling requires a video library not present here; "
                "plug one into FrameSampleStub.__call__"
            )
        ids, times, frames, payloads = [], [], [], []
        for r in t.to_pylist():
            if r["kind"] != "video" or r["duration_ms"] <= 0:
                continue
            n = min(self.max_frames, max(1, r["duration_ms"] // self.every_ms))
            for i in range(int(n)):
                ids.append(r["media_id"])
                frames.append(i)
                times.append(i * self.every_ms)
                payloads.append(hashlib.sha1(r["payload"] + bytes([i % 256])).digest())
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(frames, pa.int32()),
                "t_ms": pa.array(times, pa.int32()),
                "frame": pa.array(payloads, pa.binary()),
            }
        )


def media_pipeline(ds, max_side: int = 224, every_ms: int = 1000, feat_dim: int = 16):
    """Decode-side media pipeline: resize images (actor pool), frame-sample
    videos (actor pool), then feature-extract everything. Returns
    (media_id, kind, feature)."""
    resized = ds.map_batches(
        ResizeStub,
        fn_constructor_kwargs=dict(max_side=max_side),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=(1, 4),
    )
    return extract_features(resized, feat_dim=feat_dim)
