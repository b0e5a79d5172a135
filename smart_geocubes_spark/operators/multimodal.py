"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow ``mapInPandas`` kernels.

The container has no image/audio libraries, so COMPRESSED codec decode
(jpeg/png/mp4) is stubbed behind ``NotImplementedError`` with a
clearly-marked seam (``_REAL_DECODERS``); the deterministic RAW format
below makes every byte of the Spark-side plumbing — binary payload
construction, schema, batch iteration, explode of frames — real and
oracle-checkable (the payload generator is closed-form, so DuckDB can
recompute the pixel sums without ever seeing the bytes).

The seam itself IS exercised for real: pure-numpy parsers for the two
standard UNCOMPRESSED containers — 8-bit grayscale BMP
(BITMAPINFOHEADER, palette, 4-byte-padded bottom-up rows) and PCM16
mono WAV (RIFF chunk walk) — are registered in ``_REAL_DECODERS``, and
the ``image_decode_bmp`` / ``audio_features_wav`` query variants route
standards-conformant files through them against the same closed-form
oracles.

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

# ---------------------------------------------------------------------------
# real-codec seam: pure-numpy parsers for standard uncompressed containers
# ---------------------------------------------------------------------------

def encode_bmp_gray8(w: int, h: int, flat_topdown: np.ndarray) -> bytes:
    """A standards-conformant 8-bit grayscale BMP: 14-byte file header,
    40-byte BITMAPINFOHEADER, 256-entry gray palette, pixel rows padded
    to 4 bytes and stored BOTTOM-UP (any image viewer opens the result)."""
    pad = (-w) % 4
    palette = b"".join(struct.pack("<BBBB", g, g, g, 0) for g in range(256))
    offset = 14 + 40 + len(palette)
    img_size = (w + pad) * h
    header = b"BM" + struct.pack("<IHHI", offset + img_size, 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, img_size, 2835, 2835, 256, 0)
    rows = np.asarray(flat_topdown, dtype=np.uint8).reshape(h, w)
    body = b"".join(rows[y].tobytes() + b"\x00" * pad for y in range(h - 1, -1, -1))
    return header + dib + palette + body


def decode_bmp_gray8(payload: bytes):
    """Parse real BMP header bytes -> (width, height, top-down flat
    uint8 pixels): honors the pixel-data offset, row padding, and both
    bottom-up (h > 0) and top-down (h < 0) row orders."""
    assert payload[:2] == b"BM", "not a BMP payload"
    (offset,) = struct.unpack_from("<I", payload, 10)
    dib_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", payload, 14)
    assert dib_size >= 40 and planes == 1 and bpp == 8 and comp == 0, (
        "only uncompressed 8-bit BMP is supported"
    )
    topdown = h < 0
    h = abs(h)
    stride = (w + 3) // 4 * 4
    rows = np.frombuffer(
        payload, dtype=np.uint8, offset=offset, count=stride * h
    ).reshape(h, stride)[:, :w]
    if not topdown:
        rows = rows[::-1]
    return w, h, np.ascontiguousarray(rows).reshape(-1)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """A standards-conformant PCM16 mono RIFF/WAVE file."""
    data = np.asarray(samples).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_pcm16(payload: bytes):
    """Walk RIFF chunks (word-aligned), find fmt + data ->
    (n_samples, int64 samples). PCM16 mono only."""
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE", "not a WAV payload"
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (sz,) = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + sz + (sz & 1)
    assert fmt is not None and data is not None, "missing fmt/data chunk"
    audio_format, channels, _rate, _br, _ba, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    assert audio_format == 1 and channels == 1 and bits == 16, "only PCM16 mono"
    s = np.frombuffer(data, dtype="<i2").astype(np.int64)
    return len(s), s


# format -> callable. Compressed codecs (jpeg/png/mp4) would need
# libraries this container doesn't have and stay behind the
# NotImplementedError below; the uncompressed standards are real.
_REAL_DECODERS: dict[str, object] = {
    "bmp": decode_bmp_gray8,
    "wav": decode_wav_pcm16,
}


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


def make_bmp_payload(media_id: int) -> bytes:
    """Same pixel content as the RAW image, as a real BMP file."""
    w, h = image_dims(media_id)
    p = np.arange(w * h, dtype=np.int64)
    px = ((media_id * 7 + p * 13) % 256).astype(np.uint8)
    return encode_bmp_gray8(w, h, px)


def make_wav_payload(media_id: int) -> bytes:
    """Same samples as the RAW audio, as a real PCM16 WAV file."""
    n = audio_len(media_id)
    i = np.arange(n, dtype=np.int64)
    s = (((media_id * 31 + i * 17) % 4096) - 2048).astype("<i2")
    return encode_wav_pcm16(s)


_MAKERS = {
    ("image", "raw"): make_image_payload,
    ("audio", "raw"): make_audio_payload,
    ("video", "raw"): make_video_payload,
    ("image", "bmp"): make_bmp_payload,
    ("audio", "wav"): make_wav_payload,
}


def media_table(spark: SparkSession, n: int, kind: str, fmt: str = "raw") -> DataFrame:
    """media(media_id long, kind string, fmt string, payload binary) —
    payloads built inside an Arrow kernel (binary column plumbing).
    ``fmt="bmp"``/``"wav"`` emit real container files with the same
    content as the RAW variants (routes the decoder seam)."""
    maker = _MAKERS[(kind, fmt)]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "kind": kind,
                    "fmt": fmt,
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
