"""Pure-stdlib PNG codec (functions/png_codec.py): round-trips, all
five scanline filters, resize, and the real-decode path through the
multimodal operators (operators/multimodal.py _image_decode)."""

from __future__ import annotations

import zlib

import pytest

from hpc_hd_textreuse_etl_spark.functions.png_codec import (
    PNG_SIGNATURE,
    is_png,
    png_decode,
    png_encode,
    resize_nearest,
)


def _checker(w, h, c):
    """Deterministic w×h×c test pattern."""
    return bytes(
        ((x * 37 + y * 11 + ch * 5) % 256)
        for y in range(h)
        for x in range(w)
        for ch in range(c)
    )


@pytest.mark.parametrize("channels", [1, 2, 3, 4])
def test_encode_decode_roundtrip(channels):
    w, h = 7, 5
    pixels = _checker(w, h, channels)
    data = png_encode(w, h, channels, pixels)
    assert is_png(data)
    assert png_decode(data) == (w, h, channels, pixels)


def _encode_with_filters(w, h, c, pixels, ftypes):
    """Build a PNG applying the given filter type per scanline — the
    FORWARD filter transforms, so the decoder's unfilter is what's
    actually under test (the library encoder only emits filter 0)."""
    import struct

    def paeth(a, b, cc):
        p = a + b - cc
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else cc

    stride = w * c
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        f = ftypes[y % len(ftypes)]
        raw.append(f)
        for i in range(stride):
            left = line[i - c] if i >= c else 0
            up = prev[i]
            upleft = prev[i - c] if i >= c else 0
            if f == 0:
                v = line[i]
            elif f == 1:
                v = line[i] - left
            elif f == 2:
                v = line[i] - up
            elif f == 3:
                v = line[i] - ((left + up) >> 1)
            else:
                v = line[i] - paeth(left, up, upleft)
            raw.append(v & 0xFF)
        prev = line

    def chunk(typ, payload):
        return (
            struct.pack(">I", len(payload))
            + typ
            + payload
            + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
        )

    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("ftypes", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_decode_every_filter_type(ftypes):
    w, h, c = 6, 5, 3
    pixels = _checker(w, h, c)
    data = _encode_with_filters(w, h, c, pixels, ftypes)
    assert png_decode(data) == (w, h, c, pixels)


def test_decode_rejects_garbage_and_unsupported():
    with pytest.raises(ValueError, match="signature"):
        png_decode(b"\x00" * 32)
    # 16-bit depth refused loudly
    import struct

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    bad = (
        PNG_SIGNATURE
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="bit depth"):
        png_decode(bad)


def test_resize_nearest_golden():
    # 4×4 grey: downsample 2×2 picks the top-left of each 2×2 block
    pixels = bytes(range(16))
    assert resize_nearest(4, 4, 1, pixels, 2, 2) == bytes([0, 2, 8, 10])
    # upsample 2×2 → 4×4 repeats each pixel 2×2
    up = resize_nearest(2, 2, 1, bytes([1, 2, 3, 4]), 4, 4)
    assert up == bytes([1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4])


def test_image_decode_real_vs_stub_fallback():
    from hpc_hd_textreuse_etl_spark.operators.multimodal import _image_decode

    w, h, c = 8, 6, 3
    pixels = _checker(w, h, c)
    real = _image_decode(png_encode(w, h, c, pixels), "image/png")
    assert len(real["feature"]) == 16
    assert real["feature"][0] == pytest.approx(w / 4096)
    assert real["feature"][1] == pytest.approx(h / 4096)
    assert real["feature"][2] == pytest.approx(c / 4)
    assert sum(real["feature"][4:]) == pytest.approx(1.0)  # histogram sums to 1
    fake = _image_decode(b"not an image at all", "image/png")
    assert len(fake["feature"]) == 16  # stub fallback keeps the arity


def test_resize_images_real_path(spark):
    from hpc_hd_textreuse_etl_spark.operators.multimodal import resize_images

    w, h, c = 8, 8, 3
    pixels = _checker(w, h, c)
    rows = [
        (1, "image", "image/png", w, h, None, bytearray(png_encode(w, h, c, pixels))),
        (2, "image", "image/png", 3, 3, None, bytearray(b"undecodable")),
    ]
    df = spark.createDataFrame(
        rows,
        "media_id long, modality string, mime string, width int, height int, "
        "duration_ms int, payload binary",
    )
    out = {r["media_id"]: r for r in resize_images(df, 4, 4).collect()}
    assert out[1]["width"] == 4 and out[1]["height"] == 4
    got = png_decode(bytes(out[1]["payload"]))
    assert got == (4, 4, c, resize_nearest(w, h, c, pixels, 4, 4))
    # undecodable payload passes through unchanged (metadata updated)
    assert bytes(out[2]["payload"]) == b"undecodable"
    assert out[2]["width"] == 4


# --- property: arbitrary pixel buffers round-trip ---------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 12),
    c=st.integers(1, 4),
    data=st.data(),
)
def test_roundtrip_property(w, h, c, data):
    pixels = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * c, max_size=w * h * c
            )
        )
    )
    assert png_decode(png_encode(w, h, c, pixels)) == (w, h, c, pixels)
