"""Minimal pure-stdlib PNG codec (zlib + struct) for the multimodal
operators.

This container ships no imaging libraries, but PNG itself needs none:
DEFLATE is in the standard library and the rest of the format is chunk
framing + five per-scanline byte filters (PNG spec, RFC 2083). The
codec covers the shapes a synthetic-media pipeline produces — 8-bit
greyscale / grey+alpha / RGB / RGBA, non-interlaced — and refuses the
rest loudly (palette, 16-bit, interlaced), so callers can fall back to
Pillow (operators/multimodal.py prefers it when importable) or to the
deterministic stub.

Scale note: this runs INSIDE Arrow-batched ``mapInPandas`` workers on
payloads that are already per-row bounded; it is deliberately
dependency-free rather than fast. Swap Pillow in for production decode
throughput — the operator plumbing doesn't change.
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS_BY_COLOR_TYPE = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE_BY_CHANNELS = {1: 0, 2: 4, 3: 2, 4: 6}

#: hostile-input bounds: a crafted IHDR may claim absurd dimensions and a
#: tiny IDAT can DEFLATE-expand without limit, so cap per-side size and
#: the total filtered-scanline buffer before any allocation/decompression
#: sized from attacker-controlled fields happens (1 GiB raw ≈ a 256 MP
#: RGBA image — far past anything this fallback codec is for).
_MAX_DIM = 1 << 20
_MAX_RAW_BYTES = 1 << 30


def is_png(data: bytes) -> bool:
    return data[: len(PNG_SIGNATURE)] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> tuple[int, int, int, bytes]:
    """PNG bytes → ``(width, height, channels, pixels)`` with pixels
    row-major, 8 bits per sample. Raises ``ValueError`` on non-PNG input
    and on unsupported shapes (palette / 16-bit / interlaced)."""
    if not is_png(data):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), typ = struct.unpack(">I", data[pos : pos + 4]), data[pos + 4 : pos + 8]
        pos += 8
        chunk = data[pos : pos + length]
        pos += length + 4  # payload + CRC (not verified: zlib checks IDAT)
        if typ == b"IHDR":
            try:
                width, height, bit_depth, color_type, _comp, _filt, interlace = (
                    struct.unpack(">IIBBBBB", chunk)
                )
            except struct.error as exc:
                raise ValueError(f"malformed IHDR chunk: {exc}") from exc
            if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
                raise ValueError(
                    f"implausible PNG dimensions {width}x{height}"
                )
            if bit_depth != 8:
                raise ValueError(f"unsupported bit depth {bit_depth} (only 8)")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _CHANNELS_BY_COLOR_TYPE.get(color_type)
            if channels is None:
                raise ValueError(f"unsupported color type {color_type}")
        elif typ == b"IDAT":
            idat += chunk
        elif typ == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("truncated PNG (missing IHDR/IDAT)")
    stride = width * channels
    expected = height * (stride + 1)
    if expected > _MAX_RAW_BYTES:
        raise ValueError(
            f"PNG raw scanline buffer would be {expected} bytes "
            f"(> {_MAX_RAW_BYTES}); refusing"
        )
    # bounded inflate: never produce more than the IHDR-implied bytes +1,
    # so a decompression bomb errors out instead of eating executor RAM
    decomp = zlib.decompressobj()
    try:
        raw = decomp.decompress(bytes(idat), expected + 1)
    except zlib.error as exc:
        raise ValueError(f"corrupt IDAT stream: {exc}") from exc
    # eof=False means the stream was truncated before its adler32 trailer,
    # i.e. zlib never verified the checksum — reject, don't decode blindly
    if len(raw) != expected or decomp.unconsumed_tail or not decomp.eof:
        raise ValueError("PNG scanline data has wrong length or is truncated")
    out = bytearray(height * stride)
    prev = bytearray(stride)
    bpp = channels  # bytes per pixel at 8-bit depth
    p = 0
    for y in range(height):
        ftype = raw[p]
        p += 1
        line = bytearray(raw[p : p + stride])
        p += stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def png_encode(width: int, height: int, channels: int, pixels: bytes) -> bytes:
    """``(width, height, channels, pixels)`` → PNG bytes (filter 0 on
    every scanline — simplicity over ratio; payloads re-enter DEFLATE)."""
    color_type = _COLOR_TYPE_BY_CHANNELS.get(channels)
    if color_type is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(pixels) != height * stride:
        raise ValueError("pixel buffer does not match width×height×channels")

    def chunk(typ: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    width: int,
    height: int,
    channels: int,
    pixels: bytes,
    target_width: int,
    target_height: int,
) -> bytes:
    """Nearest-neighbor resample (floor source mapping — deterministic,
    matches the usual ``src = dst * src_size // dst_size`` convention)."""
    if target_width <= 0 or target_height <= 0:
        raise ValueError("target dimensions must be positive")
    out = bytearray(target_width * target_height * channels)
    src_stride = width * channels
    dst_stride = target_width * channels
    for y in range(target_height):
        sy = y * height // target_height
        src_row = sy * src_stride
        dst_row = y * dst_stride
        for x in range(target_width):
            sx = x * width // target_width
            out[dst_row + x * channels : dst_row + (x + 1) * channels] = pixels[
                src_row + sx * channels : src_row + (sx + 1) * channels
            ]
    return bytes(out)
