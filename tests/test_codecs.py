"""Unit tests for the pure-numpy media codecs (functions/codecs.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from etl_rs_spark.functions import codecs as C


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def test_ppm_round_trip(rng):
    img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
    blob = C.encode_ppm(img)
    assert C.sniff(blob) == "ppm"
    assert np.array_equal(C.decode_pnm(blob), img)
    assert np.array_equal(C.decode_image(blob), img)


def test_pgm_round_trip(rng):
    g = rng.integers(0, 256, (9, 11), dtype=np.uint8)
    blob = C.encode_pgm(g)
    assert C.sniff(blob) == "pgm"
    assert np.array_equal(C.decode_pnm(blob), g)


def test_pnm_header_comments_and_whitespace():
    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
    blob = b"P6 # inline\n# a comment line\n 2\t2 \n255\n" + img.tobytes()
    assert np.array_equal(C.decode_pnm(blob), img)


def test_bmp_round_trip_all_paddings(rng):
    # stride padding differs for each width mod 4
    for w in (1, 2, 3, 4, 5, 7):
        img = rng.integers(0, 256, (3, w, 3), dtype=np.uint8)
        blob = C.encode_bmp(img)
        assert C.sniff(blob) == "bmp"
        assert np.array_equal(C.decode_bmp(blob), img), f"width {w}"


def test_bmp_top_down_rows(rng):
    img = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    blob = bytearray(C.encode_bmp(img))
    # flip to top-down: negative height + un-reverse the rows
    struct.pack_into("<i", blob, 22, -4)
    stride = 4 * 3
    rows = np.frombuffer(bytes(blob[54:]), dtype=np.uint8).reshape(4, stride)
    blob[54:] = rows[::-1].tobytes()
    assert np.array_equal(C.decode_bmp(bytes(blob)), img)


def test_bmp_rejects_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    blob = bytearray(C.encode_bmp(img))
    struct.pack_into("<H", blob, 28, 8)  # 8 bpp
    with pytest.raises(ValueError, match="24-bit"):
        C.decode_bmp(bytes(blob))


def test_decode_image_names_unknown_format():
    with pytest.raises(NotImplementedError, match="png"):
        C.decode_image(b"\x89PNG\r\n\x1a\n" + b"x" * 16)
    with pytest.raises(NotImplementedError, match="unknown"):
        C.decode_image(b"garbage-not-an-image")


def test_resize_constant_exact():
    const = np.full((7, 5, 3), [10, 200, 77], dtype=np.uint8)
    out = C.resize_bilinear(const, 6, 4)
    assert out.shape == (4, 6, 3)
    assert (out.reshape(-1, 3) == [10, 200, 77]).all()


def test_resize_identity_and_gray(rng):
    img = rng.integers(0, 256, (8, 8), dtype=np.uint8)
    assert np.array_equal(C.resize_bilinear(img, 8, 8), img)
    up = C.resize_bilinear(img, 16, 16)
    assert up.shape == (16, 16)
    # upsample preserves global mean within quantization error
    assert abs(float(up.mean()) - float(img.mean())) < 2.0


def test_resize_downsample_midpoint():
    # 2x2 -> 1x1 with half-pixel centers samples the exact middle:
    # bilinear average of all four pixels
    img = np.array([[0, 100], [200, 60]], dtype=np.uint8)
    out = C.resize_bilinear(img, 1, 1)
    assert out[0, 0] == 90  # (0+100+200+60)/4


def test_wav_round_trip_mono_stereo(rng):
    s = rng.integers(-32768, 32768, 500, dtype=np.int16)
    d, rate = C.decode_wav(C.encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(d, s)
    st = rng.integers(-32768, 32768, (300, 2), dtype=np.int16)
    d2, r2 = C.decode_wav(C.encode_wav(st, 44100))
    assert r2 == 44100 and np.array_equal(d2, st)
    assert C.sniff(C.encode_wav(s, 8000)) == "wav"


def test_wav_skips_metadata_chunks(rng):
    s = rng.integers(-32768, 32768, 64, dtype=np.int16)
    wav = C.encode_wav(s, 16000)
    fmt_end = 12 + 8 + 16
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size, padded
    body = wav[12:fmt_end] + extra + wav[fmt_end:]
    hacked = b"RIFF" + struct.pack("<I", len(body) + 4) + b"WAVE" + body
    d, rate = C.decode_wav(hacked)
    assert rate == 16000 and np.array_equal(d, s)


def test_wav_rejects_non_pcm16(rng):
    s = rng.integers(-32768, 32768, 8, dtype=np.int16)
    blob = bytearray(C.encode_wav(s, 8000))
    struct.pack_into("<H", blob, 20, 3)  # IEEE float format tag
    with pytest.raises(ValueError, match="PCM-16"):
        C.decode_wav(bytes(blob))
