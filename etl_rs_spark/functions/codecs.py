"""Pure-numpy media codecs: PPM/PGM images, 24-bit BMP, PCM-16 WAV.

These are REAL decoders/encoders — header parsing with ``struct`` and
the stdlib, pixel/sample payloads via a single ``np.frombuffer`` — so
the multimodal kernels (operators/multimodal.py) can decode these
formats without PIL or any audio library. Compressed formats (PNG/JPEG,
MP3/FLAC) still require external libraries and stay gated behind
``_have_pil``; :func:`sniff` names the format so the gate's error is
precise.

Reference parity note: the reference engine (silvanoneto/etl-rs) has no
media codecs at all — this module is part of the LLM-training-data
operator suite layered on top of reference parity.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- sniffing --

_MAGIC = [
    (b"P6", "ppm"),
    (b"P5", "pgm"),
    (b"BM", "bmp"),
    (b"RIFF", "wav"),  # refined below (RIFF....WAVE)
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
]


def sniff(buf: bytes) -> str:
    """Identify a media blob by magic bytes; 'unknown' if unrecognized."""
    if buf is None:
        return "unknown"
    buf = bytes(buf[:16])
    for magic, name in _MAGIC:
        if buf.startswith(magic):
            if name == "wav" and buf[8:12] != b"WAVE":
                return "unknown"
            return name
    return "unknown"


# ---------------------------------------------------------------- PPM/PGM --


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM (P6, maxval 255)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_ppm expects (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 grayscale -> binary PGM (P5, maxval 255)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 2:
        raise ValueError(f"encode_pgm expects (h, w), got {arr.shape}")
    h, w = arr.shape
    return b"P5\n%d %d\n255\n" % (w, h) + arr.tobytes()


def _pnm_header(buf: bytes) -> tuple[bytes, int, int, int, int]:
    """Parse a PNM header: magic, width, height, maxval, payload offset.

    Handles arbitrary whitespace runs and ``#`` comment lines, per the
    Netpbm spec; exactly one whitespace byte separates the maxval token
    from the pixel payload.
    """
    magic = buf[:2]
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(buf) and buf[pos : pos + 1].isspace():
            pos += 1
        if buf[pos : pos + 1] == b"#":
            while pos < len(buf) and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PNM header")
        tokens.append(int(buf[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = tokens
    return magic, w, h, maxval, pos


def decode_pnm(buf: bytes) -> np.ndarray:
    """Binary PPM/PGM bytes -> uint8 array (h, w, 3) or (h, w)."""
    buf = bytes(buf)
    magic, w, h, maxval, pos = _pnm_header(buf)
    if maxval != 255:
        raise ValueError(f"only maxval=255 PNM supported, got {maxval}")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    payload = np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos)
    if ch == 3:
        return payload.reshape(h, w, 3)
    return payload.reshape(h, w)


# -------------------------------------------------------------------- BMP --


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP
    (BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"encode_bmp expects (h, w, 3), got {arr.shape}")
    h, w = arr.shape[:2]
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
    payload = rows.tobytes()
    file_size = 14 + 40 + len(payload)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(payload), 2835, 2835, 0, 0
    )
    return header + payload


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> uint8 RGB array (h, w, 3).

    Supports BITMAPINFOHEADER (and larger V4/V5 headers), top-down or
    bottom-up row order. Palette/compressed BMPs are rejected.
    """
    buf = bytes(buf)
    if buf[:2] != b"BM":
        raise ValueError("not a BMP file")
    (data_offset,) = struct.unpack_from("<I", buf, 10)
    (hdr_size,) = struct.unpack_from("<I", buf, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    w, h_signed = struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    (compression,) = struct.unpack_from("<I", buf, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(f"only 24-bit uncompressed BMP supported (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    stride = (w * 3 + 3) // 4 * 4
    rows = np.frombuffer(buf, dtype=np.uint8, count=h * stride, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if h_signed > 0:  # bottom-up storage
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


# ----------------------------------------------------------- image facade --


def decode_image(buf: bytes) -> np.ndarray:
    """Decode a supported image blob to uint8 (h, w, 3) RGB / (h, w) gray.

    Real numpy decoders for ppm/pgm/bmp; raises NotImplementedError
    naming the sniffed format for anything needing an external codec.
    """
    fmt = sniff(buf)
    if fmt in ("ppm", "pgm"):
        return decode_pnm(buf)
    if fmt == "bmp":
        return decode_bmp(buf)
    raise NotImplementedError(
        f"no built-in decoder for format '{fmt}' (supported without "
        f"external libs: ppm, pgm, bmp)"
    )


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    """Encode (h, w[, 3]) uint8 pixels as the named supported format."""
    if fmt == "ppm":
        return encode_ppm(arr)
    if fmt == "pgm":
        return encode_pgm(arr)
    if fmt == "bmp":
        return encode_bmp(arr)
    raise NotImplementedError(f"no built-in encoder for format '{fmt}'")


def resize_bilinear(arr: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Bilinear resample of (h, w[, 3]) uint8 pixels to (out_h, out_w).

    Half-pixel-center sampling (the PIL/OpenCV convention), edge clamp,
    round-half-away quantization back to uint8. Bilinear over a constant
    image is exactly constant, which the analytic oracles rely on.
    """
    gray = arr.ndim == 2
    src = arr[:, :, None] if gray else arr
    h, w = src.shape[:2]
    x = (np.arange(out_w, dtype=np.float64) + 0.5) * (w / out_w) - 0.5
    y = (np.arange(out_h, dtype=np.float64) + 0.5) * (h / out_h) - 0.5
    x0 = np.clip(np.floor(x).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(y).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(x - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(y - y0, 0.0, 1.0)[:, None, None]
    p = src.astype(np.float64)
    top = p[y0][:, x0] * (1 - fx) + p[y0][:, x1] * fx
    bot = p[y1][:, x0] * (1 - fx) + p[y1][:, x1] * fx
    out = top * (1 - fy) + bot * fy
    out = np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)
    return out[:, :, 0] if gray else out


# -------------------------------------------------------------------- WAV --


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 PCM samples -> RIFF/WAVE bytes. (n,) mono or (n, ch)."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    ch = 1 if samples.ndim == 1 else samples.shape[1]
    payload = samples.tobytes()
    block_align = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE bytes -> (int16 samples (n,) or (n, ch), sample_rate).

    Walks RIFF chunks (skipping unknown ones, word-aligned), so WAVs
    with LIST/INFO metadata decode too. PCM-16 only.
    """
    buf = bytes(buf)
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, rate, ch, bits, data = 12, None, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, ch, rate, _, _, bits = struct.unpack_from("<HHIIHH", buf, body)
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"only PCM-16 WAV supported (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = buf[body : body + size]
        pos = body + size + (size & 1)  # chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    samples = np.frombuffer(data, dtype="<i2")
    if ch and ch > 1:
        samples = samples[: len(samples) // ch * ch].reshape(-1, ch)
    return samples, rate
