"""Pure-stdlib media codecs: PNG/BMP/WAV round trips and spec conformance.

The decoder must accept any 8-bit non-interlaced PNG, including all five
row filter types — the test builds filtered streams with an independent
scalar reference implementation of the PNG filter spec and checks the
vectorized decoder reconstructs the original pixels exactly.
"""

import struct
import zlib

import numpy as np
import pytest

from ivfadc_spark.functions.media_codecs import (
    PNG_SIG,
    _chunk,
    bmp_decode,
    bmp_encode,
    png_decode,
    png_encode,
    resize_nearest,
    sniff_kind,
    wav_decode,
    wav_encode,
)


def _png_filter_reference(img: np.ndarray, ftype: int) -> bytes:
    """Scalar, spec-literal PNG row filter (encoder side) — independent of
    the decoder's vectorized math."""
    h, w, ch = img.shape
    raw = img.astype(np.int64).reshape(h, w * ch)
    prev = np.zeros(w * ch, dtype=np.int64)
    out = bytearray()
    for y in range(h):
        cur = raw[y]
        out.append(ftype)
        for i in range(w * ch):
            a = cur[i - ch] if i >= ch else 0
            b = prev[i]
            c = prev[i - ch] if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append(int((cur[i] - pred) % 256))
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip(ch):
    rng = np.random.default_rng(ch)
    img = rng.integers(0, 256, size=(13, 17, ch), dtype=np.uint8)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape and np.array_equal(out, img)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("ch,ctype", [(1, 0), (2, 4), (3, 2), (4, 6)])
def test_png_decode_all_filters(ftype, ch, ctype):
    rng = np.random.default_rng(ftype * 10 + ch)
    img = rng.integers(0, 256, size=(9, 11, ch), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 11, 9, 8, ctype, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_png_filter_reference(img, ftype)))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), img)


def test_png_palette():
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 5, size=(6, 7), dtype=np.uint8)
    plte = rng.integers(0, 256, size=(5, 3), dtype=np.uint8)
    raw = np.zeros((6, 8), dtype=np.uint8)
    raw[:, 1:] = idx
    ihdr = struct.pack(">IIBBBBB", 7, 6, 8, 3, 0, 0, 0)
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _chunk(b"IEND", b"")
    )
    assert np.array_equal(png_decode(data), plte[idx])


def test_png_multi_idat():
    img = np.arange(4 * 5 * 3, dtype=np.uint8).reshape(4, 5, 3)
    data = png_encode(img)
    # split the single IDAT into two chunks — decoders must concatenate
    pos, parts = 8, []
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        tag, body = data[pos + 4 : pos + 8], data[pos + 8 : pos + 8 + ln]
        parts.append((tag, body))
        pos += 12 + ln
    rebuilt = PNG_SIG
    for tag, body in parts:
        if tag == b"IDAT":
            mid = len(body) // 2
            rebuilt += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
        else:
            rebuilt += _chunk(tag, body)
    assert np.array_equal(png_decode(rebuilt), img)


def test_png_rejects_garbage():
    with pytest.raises(ValueError):
        png_decode(b"not a png at all")


def test_bmp_roundtrip():
    rng = np.random.default_rng(1)
    for w in (5, 6, 7, 8):  # all 4-byte padding phases
        img = rng.integers(0, 256, size=(10, w, 3), dtype=np.uint8)
        assert np.array_equal(bmp_decode(bmp_encode(img)), img)


def test_wav_roundtrip():
    s = (np.sin(np.arange(8000) / 10.0) * 20000).astype(np.int16)
    dec, rate = wav_decode(wav_encode(s, 16000))
    assert rate == 16000 and np.array_equal(dec[:, 0], s)
    st = np.random.default_rng(2).integers(-30000, 30000, size=(100, 2)).astype(np.int16)
    dec2, rate2 = wav_decode(wav_encode(st, 8000))
    assert rate2 == 8000 and np.array_equal(dec2, st)


def test_resize_nearest_identity_and_shapes():
    img = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    assert np.array_equal(resize_nearest(img, 4, 6), img)
    up = resize_nearest(img, 8, 12)
    assert up.shape == (12, 8, 3)
    # nearest-neighbor: every output pixel exists in the input
    assert set(map(tuple, up.reshape(-1, 3))) <= set(map(tuple, img.reshape(-1, 3)))
    down = resize_nearest(img, 2, 3)
    assert down.shape == (3, 2, 3)


def test_sniff():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert sniff_kind(png_encode(img)) == "png"
    assert sniff_kind(bmp_encode(img)) == "bmp"
    assert sniff_kind(wav_encode(np.zeros(4, dtype=np.int16), 8000)) == "wav"
    assert sniff_kind(b"garbage12345") is None
