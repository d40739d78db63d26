"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by actor-pool map_batches stages.

Image and audio decode are REAL for the formats this build generates:
a pure-stdlib PNG codec (zlib inflate + filter-0 unfilter, IHDR dims) and
a RIFF/WAVE chunk parser (fmt + data → sample array). No external decode
library exists in this container, so payloads outside those shapes (other
PNG filter types, non-WAV audio, any video container) fall back to a
deterministic byte-derived stub — or raise when ``strict=True``, so a
stub result can never be mistaken for a decode. The Ray-side plumbing
(schema, batch sizing for large binaries, actor signature, output layout)
is identical for both paths; swapping in a full decoder changes only the
inner kernel.

Memory note (guide): binary payloads are large → small batch_size and
``batch_format="pyarrow"`` (binary columns do not round-trip pandas well).
"""

from __future__ import annotations

import binascii
import hashlib
import struct
import zlib

import numpy as np
import pyarrow as pa
import ray.data as rd

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),           # "image" | "audio" | "video"
    ("payload", pa.binary()),
    ("meta", pa.string()),           # JSON sidecar (codec, dims, sr, ...)
])

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_KNUTH = 2654435761  # multiplicative hash constant (public Knuth idiom)
WAV_RATE = 16000


def media_dims(media_id: int) -> tuple[int, int]:
    """Deterministic image dims as a PURE FUNCTION of media_id — this is
    what makes the decode SQL-checkable: DuckDB re-derives (width, height)
    from the id while the Ray side must actually parse the PNG to agree."""
    w = 16 + (media_id * _KNUTH) % 48
    h = 16 + ((media_id * _KNUTH) // 7) % 48
    return int(w), int(h)


def media_n_samples(media_id: int) -> int:
    """Deterministic WAV sample count (same SQL-checkable idea)."""
    return 1000 + (media_id * _KNUTH) % 30000


def png_encode_gray(arr: np.ndarray) -> bytes:
    """Minimal PNG encoder: 8-bit grayscale, filter 0 per row (stdlib
    zlib/struct/binascii only — the container has no image library)."""
    h, w = arr.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", binascii.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))
    return (_PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def png_decode_gray(data: bytes) -> np.ndarray:
    """Minimal REAL PNG decode: walk chunks, parse IHDR, inflate IDAT,
    undo per-row filters (types 0/1/2 — what our encoder and simple tools
    emit). Raises ValueError on anything else; callers choose stub
    fallback vs strict."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG signature")
    pos, idat, w, h = 8, b"", None, None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        payload = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, ctype = struct.unpack(">IIBB", payload[:10])
            if depth != 8 or ctype != 0:
                raise ValueError("only 8-bit grayscale PNGs supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    raw = np.frombuffer(zlib.decompress(idat), np.uint8)
    if len(raw) != h * (w + 1):
        raise ValueError("PNG payload length mismatch")
    rows = raw.reshape(h, w + 1)
    out = np.empty((h, w), np.uint8)
    prev = np.zeros(w, np.uint8)
    for r in range(h):
        ft, row = rows[r, 0], rows[r, 1:]
        if ft == 0:
            out[r] = row
        elif ft == 1:                        # Sub: left neighbour
            out[r] = np.cumsum(row, dtype=np.uint8)
        elif ft == 2:                        # Up: row above
            out[r] = row + prev
        else:
            raise ValueError(f"unsupported PNG filter type {ft}")
        prev = out[r]
    return out


def wav_encode(samples: np.ndarray, rate: int = WAV_RATE) -> bytes:
    """Minimal PCM16 mono WAV encoder (RIFF/WAVE fmt + data)."""
    data = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Minimal REAL WAV parse: walk RIFF chunks for fmt/data, return
    (sample_rate, int16 sample array). Raises ValueError otherwise."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        tag = data[pos:pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
        payload = data[pos + 8:pos + 8 + length]
        pos += 8 + length + (length & 1)     # RIFF chunks are 2-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate = struct.unpack("<HHI", payload[:8])
            if audio_fmt != 1 or channels != 1:
                raise ValueError("only PCM mono WAV supported")
        elif tag == b"data":
            samples = np.frombuffer(payload[:len(payload) & ~1], "<i2")
    if rate is None or samples is None:
        raise ValueError("WAV missing fmt/data chunk")
    return rate, samples


def generate_media(n: int = 64, seed: int = 42) -> pa.Table:
    """Deterministic media table: REAL payloads for image (grayscale PNG,
    dims = media_dims(id)) and audio (PCM16 WAV, media_n_samples(id)
    samples); video stays an opaque seeded byte stream behind an mp4-ish
    magic. kind = id % 3 (image/audio/video) — a pure function of the id,
    so the SQL oracle knows the routing without parsing bytes."""
    rng = np.random.default_rng(seed)
    kind_names = ["image", "audio", "video"]
    payloads, metas, kinds = [], [], []
    for i in range(n):
        kind = kind_names[i % 3]
        kinds.append(kind)
        if kind == "image":
            w, h = media_dims(i)
            # pixels are a PURE FUNCTION of (id, row, col) — like dims,
            # this is what makes pixel-level operators (resize checksum)
            # SQL-checkable; the PNG container around them is still real
            r = np.arange(h, dtype=np.int64)[:, None]
            c = np.arange(w, dtype=np.int64)[None, :]
            px = ((i * 7 + r * 31 + c * 13) % 256).astype(np.uint8)
            payloads.append(png_encode_gray(px))
            metas.append('{"codec": "png", "v": 1}')
        elif kind == "audio":
            ns = media_n_samples(i)
            # samples are a pure (id, t) function too (see image note)
            t = np.arange(ns, dtype=np.int64)
            samples = (((i * 13 + t * 7) % 4001) - 2000).astype(np.int16)
            payloads.append(wav_encode(samples))
            metas.append('{"codec": "pcm16", "v": 1}')
        else:
            body = rng.integers(0, 256, size=int(rng.integers(1024, 65536)),
                                dtype=np.uint8).tobytes()
            payloads.append(b"\x00\x00\x00\x20ftyp" + body)
            metas.append('{"codec": "fake", "v": 1}')
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array(kinds, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "meta": pa.array(metas, pa.string()),
    }, schema=MEDIA_SCHEMA)


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic unit-norm feature from payload bytes (stub path for
    undecodable payloads)."""
    h = hashlib.blake2b(payload, digest_size=dim).digest()
    v = np.frombuffer(h, dtype=np.uint8).astype(np.float64) - 127.5
    return v / np.linalg.norm(v)


class ImageDecode:
    """Actor stage: image payload → (width, height, features[dim]).

    REAL decode for 8-bit grayscale PNG (pure-stdlib inflate+unfilter);
    features are a normalized ``dim``-bin pixel histogram — derived from
    actual pixels. Payloads the mini-decoder can't handle fall back to
    the deterministic byte stub, or raise when strict=True."""

    def __init__(self, dim: int = 32, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, widths, heights = [], [], []
        for payload in batch["payload"]:
            p = payload.as_py()
            try:
                px = png_decode_gray(p)
                h, w = px.shape
                # int64 BEFORE the scale: uint8 * dim wraps mod 256 and
                # collapses every histogram into bin 0
                hist = np.bincount(
                    px.reshape(-1).astype(np.int64) * self.dim // 256,
                    minlength=self.dim).astype(np.float64)
                feat = hist / max(np.linalg.norm(hist), 1e-12)
            except (ValueError, zlib.error, struct.error):
                if self.strict:
                    raise
                w = 64 + len(p) % 512
                h = 64 + (len(p) // 7) % 512
                feat = _fake_feature(p, self.dim)
            widths.append(w)
            heights.append(h)
            feats.append(feat)
        return pa.table({
            "media_id": batch["media_id"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class AudioFeatures:
    """Actor stage: audio payload → (duration_ms, features[dim]).

    REAL parse for PCM16 mono WAV (RIFF chunk walk); duration from the
    actual sample count / rate, features = normalized histogram of sample
    magnitudes. Non-WAV payloads fall back to the byte stub (or raise
    when strict=True)."""

    def __init__(self, dim: int = 16, strict: bool = False):
        self.dim = dim
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        durs, feats = [], []
        for payload in batch["payload"]:
            p = payload.as_py()
            try:
                rate, samples = wav_decode(p)
                dur = len(samples) * 1000 // rate
                mag = np.minimum(np.abs(samples.astype(np.int32)), 32767)
                hist = np.bincount(mag.astype(np.int64) * self.dim // 32768,
                                   minlength=self.dim).astype(np.float64)
                feat = hist / max(np.linalg.norm(hist), 1e-12)
            except (ValueError, struct.error):
                if self.strict:
                    raise
                dur = len(p) // 16
                feat = _fake_feature(p, self.dim)
            durs.append(dur)
            feats.append(feat)
        return pa.table({
            "media_id": batch["media_id"],
            "duration_ms": pa.array(durs, pa.int64()),
            "features": pa.array([f.tolist() for f in feats],
                                 pa.list_(pa.float32())),
        })


class FrameSample:
    """Actor stage: video payload → one row per sampled frame (flat-map
    shape: rows out > rows in). No container parser exists in this build,
    so frames are fixed-size chunks of the opaque payload — an honest
    stand-in that keeps the fan-out plumbing (row multiplication, binary
    slicing, batch sizing) real."""

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


def media_pipeline(media: rd.Dataset, dim: int = 32,
                   strict: bool = False) -> dict[str, rd.Dataset]:
    """kind-routed decode stages — small batches for large binary rows."""
    # expression filters (vectorized pushdown), not per-row Python lambdas
    images = media.filter(expr="kind == 'image'")
    audio = media.filter(expr="kind == 'audio'")
    video = media.filter(expr="kind == 'video'")
    return {
        "image_features": images.map_batches(
            ImageDecode, fn_constructor_kwargs={"dim": dim, "strict": strict},
            batch_format="pyarrow", batch_size=64, concurrency=(1, 4)),
        "audio_features": audio.map_batches(
            AudioFeatures, fn_constructor_kwargs={"strict": strict},
            batch_format="pyarrow", batch_size=64, concurrency=(1, 4)),
        "video_frames": video.map_batches(
            FrameSample, batch_format="pyarrow", batch_size=16,
            concurrency=(1, 4)),
    }


def media_features_sql(n: int = 64) -> str:
    """DuckDB oracle for the image branch of media_pipeline: re-derives
    (width, height) from media_dims' pure-function formulas over
    range(n) — the Ray side must actually PARSE each generated PNG to
    agree, so this checks the real decode end-to-end."""
    return f"""
SELECT media_id,
       CAST(16 + (media_id * {_KNUTH}) % 48 AS INTEGER) AS width,
       CAST(16 + ((media_id * {_KNUTH}) // 7) % 48 AS INTEGER) AS height
FROM range({n}) t(media_id)
WHERE media_id % 3 = 0"""


class ImageResize:
    """Actor stage: REAL PNG decode → factor-2 nearest-neighbor
    decimation (every 2nd row/col — out dims ceil(h/2) × ceil(w/2)) →
    (media_id, out_w, out_h, pixel_sum). pixel_sum is the int64 sum of
    the RESIZED image's pixels, so the oracle checks the decode AND the
    resample pixel-for-pixel (generate_media's pixels are a pure
    function of (id, row, col)). strict=True raises on undecodable
    payloads — a resize must never silently stub."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ows, ohs, sums = [], [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            p = payload.as_py()
            try:
                px = png_decode_gray(p)
            except (ValueError, zlib.error, struct.error):
                if self.strict:
                    raise
                continue
            sub = px[::2, ::2]
            ids.append(mid.as_py())
            ohs.append(sub.shape[0])
            ows.append(sub.shape[1])
            sums.append(int(sub.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "out_w": pa.array(ows, pa.int32()),
            "out_h": pa.array(ohs, pa.int32()),
            "pixel_sum": pa.array(sums, pa.int64()),
        })


def media_resize_sql(n: int = 64) -> str:
    """DuckDB oracle for the resize stage: re-derives the decimated
    grid's pixel values from the (id, row, col) formula and sums them —
    the Ray side must inflate, unfilter and subsample the actual PNG to
    agree bit-for-bit."""
    return f"""
WITH ids AS (SELECT media_id,
                    16 + (media_id * {_KNUTH}) % 48 AS w,
                    16 + ((media_id * {_KNUTH}) // 7) % 48 AS h
             FROM range({n}) t(media_id)
             WHERE media_id % 3 = 0),
dims AS (SELECT media_id, (w + 1) // 2 AS ow, (h + 1) // 2 AS oh
         FROM ids),
rws AS (SELECT media_id, ow, unnest(range(oh)) AS r FROM dims),
cells AS (SELECT media_id, r, unnest(range(ow)) AS c FROM rws)
SELECT cells.media_id,
       CAST(min(dims.ow) AS INTEGER) AS out_w,
       CAST(min(dims.oh) AS INTEGER) AS out_h,
       CAST(sum((cells.media_id * 7 + 62 * r + 26 * c) % 256) AS BIGINT)
         AS pixel_sum
FROM cells JOIN dims ON dims.media_id = cells.media_id
GROUP BY 1"""


AUDIO_DECIM = 4  # audio resample keeps every 4th sample


class AudioResample:
    """Actor stage: REAL WAV parse → keep every AUDIO_DECIM-th sample →
    (media_id, n_out, sample_sum). Like ImageResize, the checksum is
    SQL-checkable because generate_media's samples are a pure (id, t)
    function; a one-sample parse or stride error breaks the hash."""

    def __init__(self, strict: bool = True):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, sums = [], [], []
        for mid, payload in zip(batch["media_id"], batch["payload"]):
            try:
                _, samples = wav_decode(payload.as_py())
            except (ValueError, struct.error):
                if self.strict:
                    raise
                continue
            sub = samples[::AUDIO_DECIM]
            ids.append(mid.as_py())
            ns.append(len(sub))
            sums.append(int(sub.astype(np.int64).sum()))
        return pa.table({
            "media_id": pa.array(ids, pa.int64()),
            "n_out": pa.array(ns, pa.int64()),
            "sample_sum": pa.array(sums, pa.int64()),
        })


def audio_resample_sql(n: int = 64) -> str:
    """DuckDB oracle for AudioResample: sample count from the pure id
    formula, decimated-sample sum from the pure (id, t) formula."""
    d = AUDIO_DECIM
    return f"""
WITH ids AS (SELECT media_id,
                    1000 + (media_id * {_KNUTH}) % 30000 AS ns
             FROM range({n}) t(media_id)
             WHERE media_id % 3 = 1),
ks AS (SELECT media_id, ns, unnest(range((ns + {d} - 1) // {d}))
         AS k FROM ids)
SELECT media_id,
       CAST(count(*) AS BIGINT) AS n_out,
       CAST(sum((media_id * 13 + ({d} * k) * 7) % 4001 - 2000) AS BIGINT)
         AS sample_sum
FROM ks GROUP BY 1"""
