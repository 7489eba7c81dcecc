"""Pure-stdlib media codecs: non-interlaced PNG and PCM-16 WAV.

The container ships no media libraries (no PIL/cv2/soundfile), but two
real formats are decodable with the standard library alone:

- PNG: chunked container (``struct``) + zlib-compressed filtered
  scanlines (``zlib``); this module implements the full per-row
  unfilter set (None/Sub/Up/Average/Paeth) for 8-bit gray/RGB/RGBA,
  non-interlaced — the overwhelmingly common case.
- WAV: RIFF PCM via the stdlib ``wave`` module.

These make the multimodal decode kernels REAL (bytes in → pixel/sample
arrays out) rather than stubs. They are demonstration kernels: correct
and Arrow-batch-friendly, not SIMD-optimized — in production you'd swap
`decode_png`/`decode_wav_pcm16` for PIL/soundfile without touching any
Spark plumbing (same signatures, same batch shapes).

Reference behaviors mirrored: the reference pipeline has no media path
(it is tabular IMDb data); this module exists for the training-data
extension surface (SURVEY.md §2 EXT-multimodal).
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> channel count (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def encode_png(arr: np.ndarray) -> bytes:
    """Encode an 8-bit image array to PNG (filter 0, non-interlaced).

    ``arr`` is (H, W) grayscale or (H, W, C) with C in {1, 2, 3, 4}.
    """
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 (None) per scanline
    raw = b"".join(b"\x00" + a[y].tobytes() for y in range(h))
    out = [_PNG_SIG, _chunk(b"IHDR", ihdr), _chunk(b"IDAT", zlib.compress(raw)), _chunk(b"IEND", b"")]
    return b"".join(out)


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def decode_png(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG to (H, W, C) uint8.

    Supports gray / gray+alpha / RGB / RGBA, all five scanline filters.
    Raises ValueError on anything else (16-bit, palette, interlaced).
    """
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, ihdr, idat = 8, None, []
    while pos < len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(f"unsupported PNG (depth={depth} color={color_type} interlace={interlace})")
    c = _CHANNELS[color_type]
    stride = w * c
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT size mismatch")
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        off = y * (stride + 1)
        ftype = raw[off]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=off + 1).copy()
        if ftype == 0:  # None
            pass
        elif ftype == 2:  # Up — vectorized across the row
            row += prev
        elif ftype == 1:  # Sub — sequential in x, vectorized across channels
            for x in range(c, stride):
                row[x] = (int(row[x]) + int(row[x - c])) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - c]) if x >= c else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                a = int(row[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                row[x] = (int(row[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = row
        prev = row
    return out.reshape(h, w, c)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 8000) -> bytes:
    """Encode mono int16 samples as a PCM WAV blob (44-byte header)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(rate)
        wv.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav_pcm16(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a PCM-16 WAV blob → ((n_frames, n_channels) int16, rate)."""
    with wave.open(io.BytesIO(data), "rb") as wv:
        if wv.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM supported")
        rate = wv.getframerate()
        ch = wv.getnchannels()
        raw = wv.readframes(wv.getnframes())
    arr = np.frombuffer(raw, dtype="<i2").reshape(-1, ch)
    return arr, rate


# ---------------------------------------------------------------------------
# Frame-pack container: the minimal real "video" a stdlib-only engine
# can parse. Layout: b"FPK1" | u16 n_frames | u32 frame_interval_ms |
# n_frames * (u32 length | PNG bytes). Real container parsing (offsets,
# bounds, magic) — swapping in pyav for true codecs touches only the
# encode/decode pair, never the Spark plumbing built on it.
# ---------------------------------------------------------------------------

_FPK_MAGIC = b"FPK1"


def encode_framepack(frames: list[bytes], interval_ms: int) -> bytes:
    """Pack PNG frame blobs into the FPK1 container."""
    if len(frames) > 0xFFFF:
        raise ValueError("too many frames")
    out = [_FPK_MAGIC, struct.pack(">HI", len(frames), interval_ms)]
    for f in frames:
        out.append(struct.pack(">I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_framepack(data: bytes) -> tuple[list[bytes], int]:
    """Unpack an FPK1 container → (frame blobs, frame interval ms).

    Raises ValueError on bad magic / truncation — callers treat that
    as an undecodable payload, same policy as the PNG/WAV kernels.
    """
    if data[:4] != _FPK_MAGIC:
        raise ValueError("not an FPK1 framepack")
    if len(data) < 10:
        raise ValueError("truncated framepack header")
    n, interval_ms = struct.unpack_from(">HI", data, 4)
    pos, frames = 10, []
    for _ in range(n):
        if pos + 4 > len(data):
            raise ValueError("truncated framepack header")
        (length,) = struct.unpack_from(">I", data, pos)
        pos += 4
        if pos + length > len(data):
            raise ValueError("truncated framepack frame")
        frames.append(data[pos : pos + length])
        pos += length
    return frames, interval_ms


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of (H, W, C) uint8 pixels: source index
    = floor(dst_index * src / dst) — the exact mapping the SQL oracles
    mirror as (y * h) // out_h, so resize is verifiable end to end."""
    h, w = px.shape[0], px.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return px[ys][:, xs]
