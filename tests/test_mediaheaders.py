"""Header parsers against hand-rolled minimal container blobs."""

import struct
import zlib

from textsearch_spark.functions.mediaheaders import (
    parse_bmp, parse_gif, parse_jpeg, parse_png, parse_ppm, parse_wav,
    sniff_media,
)


def _png(w, h):
    ihdr = struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00"
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)))


def _jpeg(w, h):
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h, frames):
    out = b"GIF89a" + struct.pack("<HH", w, h) + bytes([0x00, 0, 0])  # no GCT
    for _ in range(frames):
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"  # descriptor, no LCT
        out += b"\x02" + b"\x01\x00" + b"\x00"  # LZW min size, 1 sub-block, terminator
    return out + b"\x3b"


def _bmp(w, h):
    header = b"BM" + struct.pack("<IHHI", 70, 0, 0, 54)
    info = struct.pack("<Iii", 40, w, -h) + b"\x00" * 28
    return header + info


def _wav(channels, rate, bits, n_frames):
    data = b"\x00" * (n_frames * channels * (bits // 8))
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * bits // 8,
                      channels * bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_png():
    m = parse_png(_png(320, 200))
    assert (m["width"], m["height"], m["n_frames"]) == (320, 200, 1)


def test_jpeg():
    m = parse_jpeg(_jpeg(640, 480))
    assert (m["width"], m["height"]) == (640, 480)


def test_gif_frames():
    m = parse_gif(_gif(99, 44, 3))
    assert (m["width"], m["height"], m["n_frames"]) == (99, 44, 3)


def test_bmp_topdown():
    m = parse_bmp(_bmp(17, 13))
    assert (m["width"], m["height"]) == (17, 13)  # negative height normalized


def test_ppm_with_comment():
    m = parse_ppm(b"P6\n# a comment\n12 34\n255\n" + b"\x00" * 10)
    assert (m["width"], m["height"]) == (12, 34)


def test_wav():
    m = parse_wav(_wav(2, 44100, 16, 1000))
    assert m["channels"] == 2 and m["sample_rate"] == 44100
    assert m["bits_per_sample"] == 16 and m["n_frames"] == 1000


def test_sniff_dispatch_and_reject():
    assert sniff_media(_png(2, 2))["format"] == "png"
    assert sniff_media(_wav(1, 8000, 8, 4))["format"] == "wav"
    assert sniff_media(b"not a media file at all") is None
    assert sniff_media(b"") is None
