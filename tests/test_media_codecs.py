"""Pure-stdlib PNG/WAV codec tests: round-trip over all five PNG
filter predictors, golden bytes, CRC/structure validation, RIFF chunk
walk robustness, and the generator-formula <-> decode agreement the
multimodal oracle relies on."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from tdigest_spark.functions.media_codecs import (
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def test_png_roundtrip_all_filters():
    rng = np.random.default_rng(7)
    for _ in range(40):
        h, w = int(rng.integers(1, 24)), int(rng.integers(1, 24))
        img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        for filters in ("cycle", "none"):
            assert np.array_equal(png_decode(png_encode(img, filters)), img)
    # >=5 rows guarantees every predictor (row % 5) is exercised
    tall = rng.integers(0, 256, size=(11, 3), dtype=np.uint8)
    assert np.array_equal(png_decode(png_encode(tall)), tall)


def test_png_filter_bytes_cycle():
    """The encoder really emits per-row filter types 0..4 (so the
    decoder's unfilter paths are all live, not just filter 0)."""
    img = np.arange(7 * 4, dtype=np.uint8).reshape(7, 4)
    data = png_encode(img, "cycle")
    # pull the IDAT stream back out and inspect raw filter bytes
    pos, idat = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        if typ == b"IDAT":
            idat += data[pos + 8 : pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    fts = [raw[r * 5] for r in range(7)]
    assert fts == [0, 1, 2, 3, 4, 0, 1]


def test_png_multi_idat_and_ancillary_chunks():
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    data = png_encode(img, "cycle")
    # split IDAT into two chunks + inject an ancillary tEXt chunk
    pos = 8
    chunks = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        chunks.append((typ, data[pos + 8 : pos + 8 + length]))
        pos += 12 + length
    out = data[:8]
    for typ, body in chunks:
        if typ == b"IDAT":
            mid = len(body) // 2
            out += _chunk(b"tEXt", b"note\x00split")
            out += _chunk(b"IDAT", body[:mid]) + _chunk(b"IDAT", body[mid:])
        else:
            out += _chunk(typ, body)
    assert np.array_equal(png_decode(out), img)


def test_png_validation_errors():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    good = png_encode(img)
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"JUNK" + good[4:])
    bad = bytearray(good)
    bad[20] ^= 0xFF  # inside IHDR body
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(bad))
    # unsupported color types (palette=3, gray+alpha=4) must be
    # rejected, not misread (RGB color=2 is SUPPORTED since round 5)
    for color in (3, 4, 6):
        ihdr = struct.pack(">IIBBBBB", 4, 3, 8, color, 0, 0, 0)
        bad_color = good[:8] + _chunk(b"IHDR", ihdr) + good[33:]
        with pytest.raises(ValueError, match="grayscale or RGB"):
            png_decode(bad_color)
    # 16-bit depth rejected
    ihdr16 = struct.pack(">IIBBBBB", 4, 3, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="8-bit"):
        png_decode(good[:8] + _chunk(b"IHDR", ihdr16) + good[33:])
    # grayscale IHDR relabeled RGB: scanline byte count no longer fits
    ihdr_rgb = struct.pack(">IIBBBBB", 4, 3, 8, 2, 0, 0, 0)
    with pytest.raises(ValueError, match="length mismatch"):
        png_decode(good[:8] + _chunk(b"IHDR", ihdr_rgb) + good[33:])
    with pytest.raises(ValueError, match="truncated"):
        png_decode(good[:-6])


def test_png_golden_bytes():
    """Pin the exact encoding of a known image (header fields + CRCs),
    so codec changes that alter the wire format are caught."""
    img = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    data = png_encode(img, "none")
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert data[8:29] == struct.pack(">I", 13) + b"IHDR" + struct.pack(
        ">IIBBBBB", 2, 2, 8, 0, 0, 0, 0
    )
    assert np.array_equal(png_decode(data), img)
    # IHDR chunk spans bytes [8, 33); IDAT length field is at [33, 37)
    raw = zlib.decompress(data[41 : 41 + struct.unpack(">I", data[33:37])[0]])
    assert raw == b"\x00\x00\x01\x00\x02\x03"


def test_wav_roundtrip_and_golden():
    rng = np.random.default_rng(11)
    for _ in range(30):
        n = int(rng.integers(1, 400))
        s = rng.integers(-32768, 32768, size=n).astype(np.int16)
        dec, rate = wav_decode(wav_encode(s, 16000))
        assert rate == 16000 and np.array_equal(dec, s)
    data = wav_encode(np.array([0, 1, -1], dtype=np.int16), 8000)
    assert data[:4] == b"RIFF" and data[8:12] == b"WAVE"
    # fmt chunk fields: PCM(1), mono(1), 8000 Hz, 16 bit
    assert struct.unpack("<HHIIHH", data[20:36]) == (1, 1, 8000, 16000, 2, 16)
    assert data[44:50] == b"\x00\x00\x01\x00\xff\xff"


def test_wav_chunk_walk_skips_unknown():
    s = np.arange(10, dtype=np.int16)
    data = wav_encode(s, 8000)
    # inject a LIST chunk between fmt and data (odd length -> checks
    # word-alignment padding in the walk)
    fmt_end = 36
    inject = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    out = bytearray(data[:fmt_end] + inject + data[fmt_end:])
    out[4:8] = struct.pack("<I", len(out) - 8)
    dec, rate = wav_decode(bytes(out))
    assert rate == 8000 and np.array_equal(dec, s)


def test_wav_validation_errors():
    s = np.arange(4, dtype=np.int16)
    good = wav_encode(s, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"JUNK" + good[4:])
    multi = bytearray(good)
    multi[22] = 3  # channels=3 (stereo is SUPPORTED since round 5)
    with pytest.raises(ValueError, match="mono/stereo"):
        wav_decode(bytes(multi))
    with pytest.raises(ValueError, match="truncated"):
        wav_decode(good[:-2])
    # mono relabeled stereo with an odd sample count must raise, not
    # silently drop a sample
    odd = wav_encode(np.arange(5, dtype=np.int16), 8000)
    odd = bytearray(odd)
    odd[22] = 2
    with pytest.raises(ValueError, match="odd sample count"):
        wav_decode(bytes(odd))


def test_decode_matches_generator_formulas():
    """The oracle contract: decoding the synthesized payload recovers
    exactly the closed-form pixel/sample values (no Spark needed)."""
    from tdigest_spark.operators.multimodal import _dims, _pixels, _samples

    # mid % 4 = 0 -> grayscale, 2 -> RGB; both decode back to the flat
    # formula sequence (for RGB, flat order is pixel-interleaved rgb)
    for mid in (0, 2, 14, 100):
        d = _dims(mid)
        px = _pixels(mid, d["width"], d["height"], d["channels"])
        assert px.ndim == (3 if mid % 4 == 2 else 2)
        assert np.array_equal(png_decode(png_encode(px)), px)
        i = np.arange(d["width"] * d["height"] * d["channels"])
        expect = (mid * 7 + i * 13 + 3) % 256
        assert np.array_equal(px.ravel(), expect.astype(np.uint8))
    # mid % 4 = 1 -> mono, 3 -> stereo (frame-interleaved on disk)
    for mid in (1, 3, 15, 101):
        d = _dims(mid)
        s = _samples(mid, d["n_samples"], d["channels"])
        assert s.ndim == (2 if mid % 4 == 3 else 1)
        dec, rate = wav_decode(wav_encode(s, d["sample_rate"]))
        assert rate == 8000 and np.array_equal(dec, s)
        i = np.arange(d["n_samples"] * d["channels"])
        expect = ((mid * 31 + i * 17) % 4096) - 2048
        assert np.array_equal(dec.astype(np.int64).ravel(), expect)


def test_png_matches_pil_when_available():
    """Independent-decoder cross-check: PIL (when installed) must read
    our PNG bytes to the same pixels, and our decoder must read
    PIL-written PNGs. Skipped in sandboxes without PIL."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(9, 13), dtype=np.uint8)
    theirs = np.asarray(PIL.open(io.BytesIO(png_encode(img, "cycle"))))
    assert np.array_equal(theirs, img)
    buf = io.BytesIO()
    PIL.fromarray(img, mode="L").save(buf, format="PNG")
    assert np.array_equal(png_decode(buf.getvalue()), img)
    # RGB (color type 2), both directions
    rgb = rng.integers(0, 256, size=(7, 11, 3), dtype=np.uint8)
    theirs = np.asarray(PIL.open(io.BytesIO(png_encode(rgb, "cycle"))))
    assert np.array_equal(theirs, rgb)
    buf = io.BytesIO()
    PIL.fromarray(rgb, mode="RGB").save(buf, format="PNG")
    assert np.array_equal(png_decode(buf.getvalue()), rgb)
