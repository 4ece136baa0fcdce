"""Multimodal columns: image/audio/video as opaque `binary` columns with
typed metadata, processed by actor-pool map_batches stages.

Round 2: the decode kernels are REAL for formats that need no external
libraries —
  * image: binary PPM (P6) — header parse + raw RGB ndarray, pure numpy;
  * audio: WAV (RIFF, 16-bit PCM mono) — header parse + int16 samples;
  * video: a raw-frame container ("PPMV": ascii header + concatenated RGB
    frames). There is no dependency-free real-world video codec, so the
    container is ours, but the decoder genuinely parses bytes into frame
    ndarrays — swapping in ffmpeg/PIL for mp4/jpeg changes ONE function
    (`decode_image`/`decode_video`), not the Ray plumbing.
Features, resizing (nearest-neighbor) and frame sampling all operate on
the decoded pixels/samples — no hash-derived fakes anywhere.

Large binary payloads: keep `batch_size` small (memory = batch_size ×
payload × concurrency) and let blocks split; these stages default to
batch_size=64.
"""

from __future__ import annotations

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

AUDIO_RATE = 8000  # Hz, synthesized fixture rate


# ------------------------------------------------------------- codecs --


def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary PPM (P6) -> (h, w, 3) uint8. Pure numpy; real header parse."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated
    parts = payload.split(maxsplit=4)
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only maxval=255 PPM supported")
    header_len = len(payload) - w * h * 3
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=header_len)
    return px.reshape(h, w, 3)


def encode_wav(samples: np.ndarray, rate: int = AUDIO_RATE) -> bytes:
    """int16 mono samples -> minimal RIFF/WAV bytes (PCM16)."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    hdr = (
        b"RIFF" + (36 + n).to_bytes(4, "little") + b"WAVEfmt "
        + (16).to_bytes(4, "little")
        + (1).to_bytes(2, "little")      # PCM
        + (1).to_bytes(2, "little")      # mono
        + rate.to_bytes(4, "little")
        + (rate * 2).to_bytes(4, "little")
        + (2).to_bytes(2, "little")
        + (16).to_bytes(2, "little")
        + b"data" + n.to_bytes(4, "little")
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """Minimal RIFF/WAV (PCM16 mono) -> (rate, int16 samples)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = int.from_bytes(payload[24:28], "little")
    idx = payload.find(b"data")
    if idx < 0:
        raise ValueError("WAV data chunk missing")
    n = int.from_bytes(payload[idx + 4 : idx + 8], "little")
    samples = np.frombuffer(payload, dtype="<i2", count=n // 2, offset=idx + 8)
    return rate, samples


def encode_ppmv(frames: np.ndarray, frame_ms: int) -> bytes:
    """(n, h, w, 3) uint8 frames -> raw-frame video container."""
    n, h, w, _ = frames.shape
    return b"PPMV\n%d %d %d %d\n" % (n, w, h, frame_ms) + frames.astype(
        np.uint8
    ).tobytes()


def decode_ppmv(payload: bytes) -> tuple[np.ndarray, int]:
    """Raw-frame container -> ((n, h, w, 3) uint8 frames, frame_ms)."""
    if not payload.startswith(b"PPMV"):
        raise ValueError("not a PPMV payload")
    head_end = payload.index(b"\n", payload.index(b"\n") + 1)
    n, w, h, frame_ms = (int(x) for x in payload[5:head_end].split())
    px = np.frombuffer(payload, dtype=np.uint8, count=n * h * w * 3,
                       offset=head_end + 1)
    return px.reshape(n, h, w, 3), frame_ms


# ------------------------------------------------------------ fixtures --


def synthesize_media_table(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media rows whose payloads are REAL encodings: PPM
    images, PCM WAV audio, PPMV raw-frame videos (seeded gradients/sines,
    modest sizes so batch × payload stays small)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)
    ]
    payloads, widths, heights, durations = [], [], [], []
    for i in range(n):
        kind = kinds[i]
        if kind == "image":
            w, h = int(rng.integers(16, 64)), int(rng.integers(16, 64))
            yy, xx = np.mgrid[0:h, 0:w]
            img = np.stack(
                [
                    (xx * 255 // max(1, w - 1)),
                    (yy * 255 // max(1, h - 1)),
                    np.full((h, w), int(rng.integers(0, 256))),
                ],
                axis=-1,
            ).astype(np.uint8)
            payloads.append(encode_ppm(img))
            widths.append(w); heights.append(h); durations.append(-1)
        elif kind == "audio":
            dur_ms = int(rng.integers(100, 1000))
            t = np.arange(AUDIO_RATE * dur_ms // 1000)
            freq = float(rng.integers(100, 1000))
            wave = (np.sin(2 * np.pi * freq * t / AUDIO_RATE) * 12000).astype(np.int16)
            payloads.append(encode_wav(wave))
            widths.append(-1); heights.append(-1); durations.append(dur_ms)
        else:
            w, h = int(rng.integers(16, 33)), int(rng.integers(16, 33))
            frame_ms = 500
            nf = int(rng.integers(2, 9))
            base = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            frames = np.stack(
                [np.roll(base, shift=j, axis=1) for j in range(nf)], axis=0
            )
            payloads.append(encode_ppmv(frames, frame_ms))
            widths.append(w); heights.append(h); durations.append(nf * frame_ms)
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
            "width": pa.array(np.asarray(widths, dtype=np.int32)),
            "height": pa.array(np.asarray(heights, dtype=np.int32)),
            "duration_ms": pa.array(np.asarray(durations, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


# -------------------------------------------------------------- stages --


class MediaDecoder:
    """Actor-pool decode + feature-extract stage (real kernels).

    __init__ builds the (cheap, here) codec dispatch once per actor —
    exactly where a real model/codec load belongs; __call__ decodes each
    payload and emits a feat_dim vector:
      image -> per-channel mean/std + 10-bin gray histogram;
      audio -> RMS, zero-crossing rate, 14 log-spectrum bands (np.fft);
      video -> per-frame channel means pooled (mean+std) over frames.
    All padded/truncated to feat_dim; fully deterministic."""

    def __init__(self, feat_dim: int = 16):
        self.__name__ = "MediaDecoder"
        self.feat_dim = feat_dim
        self._dispatch = {
            "image": self._image_features,
            "audio": self._audio_features,
            "video": self._video_features,
        }

    def _fit(self, v: np.ndarray) -> np.ndarray:
        out = np.zeros(self.feat_dim)
        k = min(len(v), self.feat_dim)
        out[:k] = v[:k]
        return out

    def _image_features(self, payload: bytes) -> np.ndarray:
        img = decode_ppm(payload).astype(np.float64)
        gray = img.mean(axis=-1)
        hist, _ = np.histogram(gray, bins=10, range=(0, 255))
        return self._fit(
            np.r_[img.mean(axis=(0, 1)) / 255, img.std(axis=(0, 1)) / 255,
                  hist / max(1, gray.size)]
        )

    def _audio_features(self, payload: bytes) -> np.ndarray:
        rate, s = decode_wav(payload)
        x = s.astype(np.float64) / 32768.0
        if len(x) == 0:
            return self._fit(np.zeros(1))
        rms = float(np.sqrt((x**2).mean()))
        zcr = float((np.signbit(x[1:]) != np.signbit(x[:-1])).mean()) if len(x) > 1 else 0.0
        spec = np.abs(np.fft.rfft(x[: 4096]))
        bands = np.array_split(spec, 14)
        logb = np.log1p([float(b.mean()) if len(b) else 0.0 for b in bands])
        return self._fit(np.r_[rms, zcr, logb])

    def _video_features(self, payload: bytes) -> np.ndarray:
        frames, _ = decode_ppmv(payload)
        means = frames.astype(np.float64).mean(axis=(1, 2)) / 255  # (n, 3)
        return self._fit(np.r_[means.mean(axis=0), means.std(axis=0)])

    def __call__(self, t: pa.Table) -> pa.Table:
        feats = [
            self._dispatch[k](p)
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
        MediaDecoder,
        fn_constructor_kwargs=dict(feat_dim=feat_dim),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        concurrency=concurrency,
    )


def _resize_nn(img: np.ndarray, new_w: int, new_h: int) -> np.ndarray:
    h, w, _ = img.shape
    ys = (np.arange(new_h) * h // new_h).clip(max=h - 1)
    xs = (np.arange(new_w) * w // new_w).clip(max=w - 1)
    return img[ys][:, xs]


class ImageResizer:
    """Actor-pool image-resize stage: REAL nearest-neighbor resample of the
    decoded PPM pixels to fit `max_side` preserving aspect ratio, then
    re-encode. Non-image rows pass through unchanged."""

    def __init__(self, max_side: int = 224):
        self.__name__ = "ImageResizer"
        self.max_side = max_side

    def __call__(self, t: pa.Table) -> pa.Table:
        rows = t.to_pylist()
        for r in rows:
            if r["kind"] != "image":
                continue
            img = decode_ppm(r["payload"])
            h, w, _ = img.shape
            scale = min(1.0, self.max_side / max(1, max(w, h)))
            nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
            if (nw, nh) != (w, h):
                img = _resize_nn(img, nw, nh)
            r["payload"] = encode_ppm(img)
            r["width"], r["height"] = nw, nh
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class FrameSampler:
    """Actor-pool video frame sampler: one video row in -> one row per
    sampled frame out (media_id, frame_idx, t_ms, frame) where `frame` is
    the REAL decoded frame re-encoded as PPM. Sampling picks the frame
    covering each `every_ms` timestamp, capped at max_frames."""

    def __init__(self, every_ms: int = 1000, max_frames: int = 16):
        self.__name__ = "FrameSampler"
        self.every_ms = every_ms
        self.max_frames = max_frames

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, times, fidx, payloads = [], [], [], []
        for r in t.to_pylist():
            if r["kind"] != "video" or r["duration_ms"] <= 0:
                continue
            frames, frame_ms = decode_ppmv(r["payload"])
            n = min(self.max_frames, max(1, r["duration_ms"] // self.every_ms))
            for i in range(int(n)):
                t_ms = i * self.every_ms
                j = min(len(frames) - 1, t_ms // max(1, frame_ms))
                ids.append(r["media_id"])
                fidx.append(i)
                times.append(t_ms)
                payloads.append(encode_ppm(frames[j]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "t_ms": pa.array(times, pa.int32()),
                "frame": pa.array(payloads, pa.binary()),
            }
        )


class SceneCutDetector:
    """Actor-pool shot-boundary detector: one video row in -> one row per
    DETECTED CUT out (media_id, cut_frame, t_ms, diff_milli), where a cut
    is a frame whose mean absolute pixel delta from the previous frame
    exceeds `threshold_milli` (mean |delta| / 255, milli units). The frame
    diff runs on the REAL decoded pixels (PPMV raw frames); integer milli
    threshold keeps the decision deterministic. The per-video work is one
    vectorized numpy diff over the full frame stack — no Python loop over
    pixels; videos are independent, so the operator scales by actor count
    alone (no exchange at all)."""

    def __init__(self, threshold_milli: int = 80):
        self.__name__ = "SceneCutDetector"
        self.threshold_milli = threshold_milli

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, cuts, times, diffs = [], [], [], []
        for r in t.to_pylist():
            if r["kind"] != "video":
                continue
            frames, frame_ms = decode_ppmv(r["payload"])
            if len(frames) < 2:
                continue
            stack = frames.astype(np.int32)
            d = np.abs(stack[1:] - stack[:-1]).mean(axis=(1, 2, 3))
            dm = (d * 1000 / 255).astype(np.int64)
            for k in np.flatnonzero(dm >= self.threshold_milli):
                ids.append(r["media_id"])
                cuts.append(int(k) + 1)
                times.append((int(k) + 1) * int(frame_ms))
                diffs.append(int(dm[k]))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.int64()),
                "cut_frame": pa.array(cuts, pa.int32()),
                "t_ms": pa.array(times, pa.int32()),
                "diff_milli": pa.array(diffs, pa.int64()),
            }
        )


# Back-compat aliases (round-1 names; the kernels are no longer stubs).
DecodeStub = MediaDecoder
ResizeStub = ImageResizer
FrameSampleStub = FrameSampler


def media_pipeline(ds, max_side: int = 224, every_ms: int = 1000, feat_dim: int = 16):
    """Decode-side media pipeline: resize images (actor pool), then
    feature-extract everything. Returns (media_id, kind, feature)."""
    resized = ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs=dict(max_side=max_side),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=64,
        concurrency=(1, 4),
    )
    return extract_features(resized, feat_dim=feat_dim)
