"""Pure-Python media container/header parsing — no codec libraries.

Real metadata extraction for the multimodal pipeline: dimensions,
frame counts, and audio parameters come straight from the container
headers, which are byte-level specs needing no external decoder.
Formats: PNG, JPEG (SOF scan), GIF (logical screen + frame walk), BMP,
PPM (P6), WAV (RIFF fmt/data chunks). Pixel/sample DECODE — anything
past the header — still requires codec libs and stays behind the
explicit stub in operators/multimodal.py.

All functions take ``bytes`` and return a dict or None (not this
format). ``sniff_media`` dispatches by magic bytes.
"""

from __future__ import annotations

import struct
from typing import Optional


def parse_png(b: bytes) -> Optional[dict]:
    """PNG: 8-byte signature, then the IHDR chunk holds big-endian
    width/height at offsets 16/20."""
    if len(b) < 24 or b[:8] != b"\x89PNG\r\n\x1a\n" or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return {"format": "png", "width": w, "height": h, "n_frames": 1}


def parse_jpeg(b: bytes) -> Optional[dict]:
    """JPEG: walk the marker stream to the first SOFn (C0-CF except
    C4/C8/CC), which carries big-endian height/width."""
    if len(b) < 4 or b[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            i += 1
            continue
        marker = b[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            h, w = struct.unpack(">HH", b[i + 5:i + 9])
            return {"format": "jpeg", "width": w, "height": h, "n_frames": 1}
        i += 2 + seglen
    return None


def parse_gif(b: bytes) -> Optional[dict]:
    """GIF87a/89a: little-endian logical screen size at offset 6; the
    frame count is the number of image-descriptor blocks (0x2C), found
    by walking the block structure (extensions are sub-block chains)."""
    if len(b) < 13 or b[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    w, h = struct.unpack("<HH", b[6:10])
    flags = b[10]
    i = 13
    if flags & 0x80:  # global color table present
        i += 3 * (2 << (flags & 0x07))
    frames = 0
    n = len(b)
    while i < n:
        intro = b[i]
        if intro == 0x3B:  # trailer
            break
        if intro == 0x2C:  # image descriptor
            frames += 1
            if i + 10 > n:
                break
            lflags = b[i + 9]
            i += 10
            if lflags & 0x80:
                i += 3 * (2 << (lflags & 0x07))
            i += 1  # LZW minimum code size
        elif intro == 0x21:  # extension: label + sub-blocks
            i += 2
        else:
            break
        # walk sub-block chain (image data and extensions share it)
        while i < n and b[i] != 0:
            i += 1 + b[i]
        i += 1  # block terminator
    return {"format": "gif", "width": w, "height": h, "n_frames": max(frames, 1)}


def parse_bmp(b: bytes) -> Optional[dict]:
    """BMP: BITMAPINFOHEADER little-endian int32 width/height at 18/22
    (height may be negative for top-down rows)."""
    if len(b) < 26 or b[:2] != b"BM":
        return None
    w, h = struct.unpack("<ii", b[18:26])
    return {"format": "bmp", "width": w, "height": abs(h), "n_frames": 1}


def parse_ppm(b: bytes) -> Optional[dict]:
    """PPM binary (P6): ASCII header 'P6 <w> <h> <maxval>' with
    #-comments allowed between tokens."""
    if len(b) < 2 or b[:2] != b"P6":
        return None
    tokens: list[bytes] = []
    i = 2
    n = len(b)
    while i < n and len(tokens) < 3:
        c = b[i:i + 1]
        if c == b"#":
            while i < n and b[i] not in (0x0A, 0x0D):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not b[j:j + 1].isspace():
                j += 1
            tokens.append(b[i:j])
            i = j
    if len(tokens) < 2:
        return None
    try:
        w, h = int(tokens[0]), int(tokens[1])
    except ValueError:
        return None
    return {"format": "ppm", "width": w, "height": h, "n_frames": 1}


def parse_wav(b: bytes) -> Optional[dict]:
    """WAV: RIFF/WAVE chunk walk; the fmt chunk yields channels/rate/
    bit depth, the data chunk size yields the sample-frame count."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i = 12
    n = len(b)
    meta: dict = {"format": "wav", "width": 0, "height": 0}
    n_channels = bits = rate = data_size = None
    while i + 8 <= n:
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 24 <= n:
            _fmt, n_channels, rate = struct.unpack("<HHI", b[i + 8:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if n_channels is None:
        return None
    meta["channels"] = n_channels
    meta["sample_rate"] = rate
    meta["bits_per_sample"] = bits
    frames = 0
    if data_size is not None and n_channels and bits:
        frames = data_size // (n_channels * (bits // 8 or 1))
    meta["n_frames"] = frames
    return meta


def make_png(w: int, h: int) -> bytes:
    """Minimal PNG (signature + IHDR) — header-complete, no pixel data."""
    import zlib

    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def make_bmp(w: int, h: int) -> bytes:
    header = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    info = struct.pack("<Iii", 40, w, h) + b"\x00" * 28
    return header + info


def make_wav(channels: int, rate: int, bits: int, n_frames: int) -> bytes:
    data = b"\x00" * (n_frames * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


_PARSERS = (parse_png, parse_jpeg, parse_gif, parse_bmp, parse_ppm, parse_wav)


def sniff_media(b: bytes) -> Optional[dict]:
    """Dispatch on magic bytes; None if no supported container matches."""
    for p in _PARSERS:
        meta = p(b)
        if meta is not None:
            return meta
    return None
