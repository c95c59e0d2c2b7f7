"""Pure-stdlib media codecs: PNG, BMP, PCM WAV.

The container has no PIL/cv2/av, but the formats themselves don't need
them: PNG is zlib + per-row byte filters, BMP is raw padded rows, WAV is
headered PCM — all decodable with ``zlib``/``wave`` + numpy. This makes the
multimodal operators' decode step REAL for these formats (the reference's
payload rows are likewise self-describing fixed layouts it parses by hand,
/root/reference/IO.h:92-121); compressed formats that genuinely require
codec libraries (JPEG, MP3, video) remain explicitly stubbed upstream.

Decoders accept any spec-conformant 8-bit non-interlaced PNG (all five row
filters, gray / gray+alpha / RGB / RGBA / palette); the encoder always
writes filter-0 rows, which keeps encode vectorized end-to-end.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # colortype -> samples/px


def sniff_kind(payload: bytes) -> str | None:
    """Container sniff by magic bytes: 'png' | 'bmp' | 'wav' | None."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------- PNG ----


def png_decode(data: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8 (C=1 gray, 2 gray+alpha, 3 RGB, 4 RGBA).

    8-bit, non-interlaced. Palette images are expanded to RGB."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, plte = 8, [], None
    w = h = ctype = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if ctag == b"IHDR":
            w, h, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0:
                raise ValueError(f"unsupported PNG (depth={depth} comp={comp} filt={filt})")
            if ilace != 0:
                raise ValueError("interlaced PNG not supported")
            if ctype not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG colortype {ctype}")
        elif ctag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctag == b"IDAT":
            idat.append(body)
        elif ctag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = raw[:, 0]
    rows = raw[:, 1:].astype(np.int64).reshape(h, w, ch)
    out = np.zeros((h, w, ch), dtype=np.int64)
    prev = np.zeros((w, ch), dtype=np.int64)
    for y in range(h):
        f, row = int(ftypes[y]), rows[y]
        if f == 0:  # None
            rec = row.copy()
        elif f == 1:  # Sub: prefix sum per channel lane (mod 256 associative)
            rec = np.cumsum(row, axis=0) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f == 3:  # Average — left-neighbor dependency: scan across x
            rec = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                left = (row[x] + (left + prev[x]) // 2) % 256
                rec[x] = left
        elif f == 4:  # Paeth predictor — scan across x
            rec = np.empty_like(row)
            left = np.zeros(ch, dtype=np.int64)
            ul = np.zeros(ch, dtype=np.int64)
            for x in range(w):
                a, b_, c = left, prev[x], ul
                p = a + b_ - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b_), np.abs(p - c)
                pred = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b_, c))
                left = (row[x] + pred) % 256
                rec[x] = left
                ul = b_  # next pixel's upper-left = this pixel's up
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        img = plte[img[:, :, 0]]
    return img


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def png_encode(img: np.ndarray) -> bytes:
    """(H, W) or (H, W, C) uint8 -> PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    # filter byte 0 per row, vectorized assembly
    raw = np.zeros((h, w * ch + 1), dtype=np.uint8)
    raw[:, 1:] = img.reshape(h, w * ch)
    idat = zlib.compress(raw.tobytes(), 6)
    return PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


# ---------------------------------------------------------------- BMP ----


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP -> (H, W, 3) uint8 RGB (handles bottom-up
    and top-down row order, 4-byte row padding)."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", data[10:14])
    hsize, w, h, planes, bpp, comp = struct.unpack("<IiihhI", data[14:34])
    if bpp != 24 or comp != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp} compression={comp})")
    bottom_up, h = h > 0, abs(h)
    stride = (w * 3 + 3) & ~3
    px = np.frombuffer(data[off : off + stride * h], dtype=np.uint8).reshape(h, stride)
    img = px[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def bmp_encode(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24-bit bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    body = rows.tobytes()
    info = struct.pack("<IiihhIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    head = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return head + info + body


# ---------------------------------------------------------------- WAV ----


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV -> ((n_frames, n_channels) int16 samples, sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError(f"only 16-bit PCM supported (got {f.getsampwidth() * 8}-bit)")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        samples = np.frombuffer(f.readframes(n), dtype=np.int16).reshape(-1, ch)
    return samples, rate


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, ch) int16 -> 16-bit PCM WAV bytes."""
    samples = np.ascontiguousarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(samples.tobytes())
    return buf.getvalue()


# ------------------------------------------------------------- resize ----


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index gather."""
    h, w = img.shape[:2]
    ys = np.minimum((np.arange(height) * h) // height, h - 1)
    xs = np.minimum((np.arange(width) * w) // width, w - 1)
    return img[ys][:, xs]
