"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool map_batches stages.

The decode libraries (PIL / torchaudio / av) are NOT in this container, so
the decode kernels are STUBBED behind an import-try: when the library is
missing the stage produces a deterministic fake derived from the payload
bytes (so tests are stable), or raises NotImplementedError in strict mode.
Everything around the stub — schema, batch sizing for large binaries,
actor signature, output layout — is real and tested; swapping in a real
decoder changes only the inner function.

Memory note (guide): binary payloads are large → small batch_size and
``batch_format="pyarrow"`` (binary columns do not round-trip pandas well).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),           # JSON sidecar (codec, dims, sr, ...)
])


def generate_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic fake media table (payload = seeded bytes with a magic
    header per kind, 1-64 KiB)."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"], dtype=object)[
        rng.integers(0, 3, size=n)]
    magic = {"image": b"\x89PNG", "audio": b"RIFF", "video": b"\x00\x00\x00\x20ftyp"}
    payloads, metas = [], []
    for i in range(n):
        body = rng.integers(0, 256, size=int(rng.integers(1024, 65536)),
                            dtype=np.uint8).tobytes()
        payloads.append(magic[kinds[i]] + body)
        metas.append('{"codec": "fake", "v": 1}')
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    }, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm feature from payload bytes (stub decode)."""
    h = hashlib.blake2b(payload, digest_size=dim).digest()
    v = np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 127.5
    return v / np.linalg.norm(v)


class ImageDecode:
    """Actor stage: image payload → (width, height, features[dim]).

    The decode KERNEL is a deterministic stub in this build (no real
    decoder is wired even if PIL happens to be importable — swapping the
    stub body for a real one is the only change needed). strict=True
    always raises, making the stub impossible to mistake for a decode."""

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        if strict:
            raise NotImplementedError(
                "real image decode is not implemented in this build "
                "(stub kernel only); run with strict=False")
        self.backend = "stub"

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        for payload in batch["payload"]:
            p = payload.as_py()
            # stub: dims derived from payload length, features from bytes
            widths.append(64 + len(p) % 512)
            heights.append(64 + (len(p) // 7) % 512)
            feats.append(_fake_feature(p, self.dim))
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class AudioFeatures:
    """Actor stage: audio payload → (duration_ms, features[dim]). Stubbed
    like ImageDecode (torchaudio/librosa absent)."""

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        if strict:
            raise NotImplementedError(
                "real audio decode is not implemented in this build "
                "(stub kernel only); run with strict=False")

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, feats = [], []
        for payload in batch["payload"]:
            p = payload.as_py()
            durs.append(len(p) // 16)  # fake 16 bytes/ms
            feats.append(_fake_feature(p, self.dim))
        return pa.table({
            "media_id": batch["media_id"],
            "duration_ms": pa.array(durs, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class FrameSample:
    """Actor stage: video payload → one row per sampled frame (flat-map
    shape: rows out > rows in). Chunks the payload as fake frames."""

    def __init__(self, every_n: int = 4, frame_bytes: int = 4096):
        self.every_n = every_n
        self.frame_bytes = frame_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        mids, fidxs, frames = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            p = payload.as_py()
            n_frames = max(1, len(p) // self.frame_bytes)
            for fi in range(0, n_frames, self.every_n):
                mids.append(mid.as_py())
                fidxs.append(fi)
                frames.append(p[fi * self.frame_bytes:(fi + 1) * self.frame_bytes])
        return pa.table({
            "media_id": pa.array(mids, pa.int64()),
            "frame_idx": pa.array(fidxs, pa.int32()),
            "frame": pa.array(frames, pa.binary()),
        })


def media_pipeline(media: rd.Dataset, dim: int = 32) -> dict[str, rd.Dataset]:
    """kind-routed decode stages — small batches for large binary rows."""
    # expression filters (vectorized pushdown), not per-row Python lambdas
    images = media.filter(expr="kind == 'image'")
    audio = media.filter(expr="kind == 'audio'")
    video = media.filter(expr="kind == 'video'")
    return {
        "image_features": images.map_batches(
            ImageDecode, fn_constructor_kwargs={"dim": dim},
            batch_format="pyarrow", batch_size=64, concurrency=(1, 4)),
        "audio_features": audio.map_batches(
            AudioFeatures, batch_format="pyarrow", batch_size=64,
            concurrency=(1, 4)),
        "video_frames": video.map_batches(
            FrameSample, batch_format="pyarrow", batch_size=16,
            concurrency=(1, 4)),
    }
