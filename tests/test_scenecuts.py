"""Shot-boundary detection (functions/multimodal.py:SceneCutDetector):
planted cuts are found, still segments stay silent, determinism across
layouts."""

import numpy as np
import pyarrow as pa

import ray.data

from datax_ray.functions.multimodal import MEDIA_SCHEMA, SceneCutDetector, encode_ppmv


def _video_row(media_id: int, frames: np.ndarray, frame_ms: int = 500):
    return {
        "media_id": media_id,
        "kind": "video",
        "payload": encode_ppmv(frames, frame_ms),
        "width": frames.shape[2],
        "height": frames.shape[1],
        "duration_ms": len(frames) * frame_ms,
    }


def _planted():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    b = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    # video 0: aaaa bbbb -> exactly one cut at frame 4
    v0 = np.stack([a] * 4 + [b] * 4)
    # video 1: all identical -> no cuts
    v1 = np.stack([a] * 5)
    # video 2: alternating -> cut at every transition (4 cuts)
    v2 = np.stack([a, b, a, b, a])
    rows = [_video_row(0, v0), _video_row(1, v1), _video_row(2, v2)]
    t = pa.Table.from_pylist(rows).cast(MEDIA_SCHEMA)
    return t


def _run(t, parts=1):
    ds = ray.data.from_arrow(t)
    if parts > 1:
        ds = ds.repartition(parts)
    out = ds.map_batches(
        SceneCutDetector,
        fn_constructor_kwargs=dict(threshold_milli=80),
        batch_format="pyarrow",
        batch_size=2,
        concurrency=(1, 2),
    ).to_pandas()
    return sorted(map(tuple, out[["media_id", "cut_frame"]].to_numpy()))


def test_planted_cuts_found(ray_session):
    got = _run(_planted())
    assert got == [(0, 4), (2, 1), (2, 2), (2, 3), (2, 4)]


def test_layout_invariant(ray_session):
    t = _planted()
    assert _run(t, parts=1) == _run(t, parts=3)
