"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow ``mapInPandas`` kernels.

The container has no image/audio libraries, so REAL codec decode
(jpeg/png/wav/mp4) is stubbed behind ``NotImplementedError`` with a
clearly-marked seam (``_REAL_DECODERS``); the deterministic RAW format
below makes every byte of the Spark-side plumbing — binary payload
construction, schema, batch iteration, explode of frames — real and
oracle-checkable (the payload generator is closed-form, so DuckDB can
recompute the pixel sums without ever seeing the bytes).

RAW formats (all big-endian headers):
- image:  b"RIMG" + u16 width + u16 height + width*height pixel bytes,
          pixel[p] = (media_id*7 + p*13) % 256
- audio:  b"RAUD" + u32 n_samples + int16 LE samples,
          s[i] = ((media_id*31 + i*17) % 4096) - 2048
- video:  b"RVID" + u16 n_frames + u16 width + u16 height + frames,
          pixel[f][p] = (media_id*7 + f*11 + p*13) % 256
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_REAL_DECODERS: dict[str, object] = {}  # format -> callable; none in this container


def _require_real_decoder(fmt: str):
    if fmt not in _REAL_DECODERS:
        raise NotImplementedError(
            f"real codec decode for {fmt!r} requires an image/audio library "
            "not present in this container; register one in _REAL_DECODERS"
        )
    return _REAL_DECODERS[fmt]


def _parse_image(fmt: str, payload: bytes):
    """(width, height, uint8 pixel array). Real formats go through the
    registered decoder; RAW parses the header."""
    if fmt != "raw":
        return _require_real_decoder(fmt)(payload)
    assert payload[:4] == b"RIMG", "not a RAW image payload"
    w, h = struct.unpack(">HH", payload[4:8])
    return w, h, np.frombuffer(payload, dtype=np.uint8, offset=8)


def _parse_audio(fmt: str, payload: bytes):
    """(n_samples, int64 sample array)."""
    if fmt != "raw":
        return _require_real_decoder(fmt)(payload)
    assert payload[:4] == b"RAUD", "not a RAW audio payload"
    (n,) = struct.unpack(">I", payload[4:8])
    return n, np.frombuffer(payload, dtype="<i2", offset=8).astype(np.int64)


def _parse_video(fmt: str, payload: bytes):
    """(n_frames, width, height, uint8 (frames, w*h) array)."""
    if fmt != "raw":
        return _require_real_decoder(fmt)(payload)
    assert payload[:4] == b"RVID", "not a RAW video payload"
    f, w, h = struct.unpack(">HHH", payload[4:10])
    return f, w, h, np.frombuffer(payload, dtype=np.uint8, offset=10).reshape(f, w * h)


# ---------------------------------------------------------------------------
# payload generation (deterministic, closed-form)
# ---------------------------------------------------------------------------

def image_dims(media_id: int) -> tuple[int, int]:
    return 32 + media_id % 64, 24 + media_id % 48


def make_image_payload(media_id: int) -> bytes:
    w, h = image_dims(media_id)
    p = np.arange(w * h, dtype=np.int64)
    px = ((media_id * 7 + p * 13) % 256).astype(np.uint8)
    return b"RIMG" + struct.pack(">HH", w, h) + px.tobytes()


def audio_len(media_id: int) -> int:
    return 2000 + (media_id % 10) * 100


def make_audio_payload(media_id: int) -> bytes:
    n = audio_len(media_id)
    i = np.arange(n, dtype=np.int64)
    s = (((media_id * 31 + i * 17) % 4096) - 2048).astype("<i2")
    return b"RAUD" + struct.pack(">I", n) + s.tobytes()


def video_shape(media_id: int) -> tuple[int, int, int]:
    return 4 + media_id % 8, 16, 16  # (n_frames, w, h)


def make_video_payload(media_id: int) -> bytes:
    f, w, h = video_shape(media_id)
    fi, p = np.meshgrid(np.arange(f, dtype=np.int64), np.arange(w * h, dtype=np.int64), indexing="ij")
    px = ((media_id * 7 + fi * 11 + p * 13) % 256).astype(np.uint8)
    return b"RVID" + struct.pack(">HHH", f, w, h) + px.tobytes()


def media_table(spark: SparkSession, n: int, kind: str) -> DataFrame:
    """media(media_id long, kind string, fmt string, payload binary) —
    payloads built inside an Arrow kernel (binary column plumbing)."""
    maker = {"image": make_image_payload, "audio": make_audio_payload, "video": make_video_payload}[kind]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "fmt": "raw",
                    "payload": [maker(int(m)) for m in ids],
                }
            )

    return spark.range(n).mapInPandas(
        gen, schema="media_id long, kind string, fmt string, payload binary"
    )


# ---------------------------------------------------------------------------
# decode / feature kernels
# ---------------------------------------------------------------------------

def decode_image_stats(media: DataFrame) -> DataFrame:
    """Parse the binary payload, emit (media_id, width, height,
    n_pixels, sum_pixels). Real formats raise via the decoder seam."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, fmt, payload in zip(b["media_id"], b["fmt"], b["payload"]):
                w, h, px = _parse_image(str(fmt), payload)
                rows.append((mid, w, h, w * h, int(px.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "n_pixels", "sum_pixels"]
            )

    return media.mapInPandas(
        gen,
        schema="media_id long, width long, height long, n_pixels long, sum_pixels long",
    )


def resize_image_halve(media: DataFrame) -> DataFrame:
    """2x2 average-pool resize (floor-truncated edges): real numpy over
    the decoded grid; emits the resized payload + checksum."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, fmt, payload in zip(b["media_id"], b["fmt"], b["payload"]):
                w, h, flat = _parse_image(str(fmt), payload)
                px = flat.reshape(h, w)
                h2, w2 = h // 2 * 2, w // 2 * 2
                pooled = (
                    px[:h2, :w2].reshape(h2 // 2, 2, w2 // 2, 2).astype(np.int64).sum(axis=(1, 3))
                    // 4
                ).astype(np.uint8)
                out = b"RIMG" + struct.pack(">HH", w2 // 2, h2 // 2) + pooled.tobytes()
                rows.append((mid, w2 // 2, h2 // 2, out, int(pooled.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "payload", "sum_pixels"]
            )

    return media.mapInPandas(
        gen,
        schema="media_id long, width long, height long, payload binary, sum_pixels long",
    )


def audio_features(media: DataFrame) -> DataFrame:
    """RMS-style features: n_samples, sum_abs, zero crossings."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, fmt, payload in zip(b["media_id"], b["fmt"], b["payload"]):
                n, samples = _parse_audio(str(fmt), payload)
                zc = int(((samples[:-1] < 0) != (samples[1:] < 0)).sum())
                rows.append((mid, n, int(np.abs(samples).sum()), zc))
            yield pd.DataFrame(rows, columns=["media_id", "n_samples", "sum_abs", "n_zero_cross"])

    return media.mapInPandas(
        gen, schema="media_id long, n_samples long, sum_abs long, n_zero_cross long"
    )


def sample_video_frames(media: DataFrame, every: int = 3) -> DataFrame:
    """Frame sampling: one OUTPUT ROW per kept frame (row fan-out inside
    mapInPandas — the UDTF shape), with per-frame pixel sums."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for mid, fmt, payload in zip(b["media_id"], b["fmt"], b["payload"]):
                f, w, h, px = _parse_video(str(fmt), payload)
                for fi in range(0, f, every):
                    rows.append((mid, fi, int(px[fi].astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_sum"])

    return media.mapInPandas(gen, schema="media_id long, frame_idx long, frame_sum long")
