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
