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


# --- hostile-input guards ----------------------------------------------------


def _chunk(typ, payload):
    import struct

    return (
        struct.pack(">I", len(payload))
        + typ
        + payload
        + struct.pack(">I", zlib.crc32(typ + payload) & 0xFFFFFFFF)
    )


def _ihdr(w, h, bit_depth=8, color_type=0):
    import struct

    return struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)


def test_rejects_implausible_dimensions():
    # a crafted IHDR claiming a 2^30-wide image must be refused before
    # any allocation is sized from it
    bad = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(1 << 30, 2))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="implausible"):
        png_decode(bad)
    with pytest.raises(ValueError, match="implausible"):
        png_decode(
            PNG_SIGNATURE
            + _chunk(b"IHDR", _ihdr(0, 2))
            + _chunk(b"IDAT", zlib.compress(b"\x00"))
        )


def test_rejects_raw_buffer_past_cap():
    # dims individually under _MAX_DIM but whose scanline buffer tops
    # the 1 GiB cap — refused before decompression
    bad = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(1 << 20, 1 << 20, color_type=2))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 8))
    )
    with pytest.raises(ValueError, match="refusing"):
        png_decode(bad)


def test_rejects_decompression_bomb():
    # 2×2 grey expects 6 filtered bytes; an IDAT inflating to 1 MiB must
    # stop at the bounded-inflate cap, not expand fully
    bomb = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(2, 2))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="wrong length"):
        png_decode(bomb)


def test_rejects_truncated_idat_stream():
    # strip the 4-byte adler32 trailer from an otherwise-valid zlib
    # stream: it inflates to exactly the expected bytes but the checksum
    # was never verified (decomp.eof False) — must be refused
    pixels = _checker(2, 2, 1)
    raw = b"".join(b"\x00" + pixels[y * 2 : (y + 1) * 2] for y in range(2))
    stream = zlib.compress(raw)
    truncated = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(2, 2))
        + _chunk(b"IDAT", stream[:-4])
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="wrong length|truncated"):
        png_decode(truncated)
    # sanity: the untruncated stream decodes fine
    ok = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(2, 2))
        + _chunk(b"IDAT", stream)
        + _chunk(b"IEND", b"")
    )
    assert png_decode(ok) == (2, 2, 1, pixels)


def test_rejects_truncated_ihdr():
    bad = PNG_SIGNATURE + _chunk(b"IHDR", _ihdr(2, 2)[:9])
    with pytest.raises(ValueError, match="malformed IHDR"):
        png_decode(bad)


def test_corrupt_body_routes_to_stub_not_task_death():
    # valid signature + IHDR, garbage IDAT bytes: png_decode raises
    # ValueError, and _image_decode must route to the stub
    from hpc_hd_textreuse_etl_spark.operators.multimodal import (
        _image_decode,
        _stub_decode,
    )

    corrupt = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(4, 4, color_type=2))
        + _chunk(b"IDAT", b"\xde\xad\xbe\xef" * 8)
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        png_decode(corrupt)
    out = _image_decode(corrupt, "image/png")
    assert out == _stub_decode(corrupt, "image/png")
    # the bomb also routes to the stub on the pure-codec path (Pillow,
    # when present, may decode or apply its own bomb guard — either way
    # _image_decode must return a 16-float feature, never raise)
    from hpc_hd_textreuse_etl_spark.operators import multimodal as mm

    bomb = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(2, 2))
        + _chunk(b"IDAT", zlib.compress(b"\x00" * (1 << 20)))
        + _chunk(b"IEND", b"")
    )
    out2 = _image_decode(bomb, "image/png")
    assert len(out2["feature"]) == 16
    if mm._PILImage is None:
        assert out2 == _stub_decode(bomb, "image/png")


def test_extract_features_survives_corrupt_payloads(spark):
    from hpc_hd_textreuse_etl_spark.operators.multimodal import extract_features

    good = png_encode(4, 4, 3, _checker(4, 4, 3))
    corrupt = (
        PNG_SIGNATURE
        + _chunk(b"IHDR", _ihdr(4, 4, color_type=2))
        + _chunk(b"IDAT", b"\xde\xad\xbe\xef" * 8)
    )
    df = spark.createDataFrame(
        [
            (1, "image", "image/png", 4, 4, None, bytearray(good)),
            (2, "image", "image/png", 4, 4, None, bytearray(corrupt)),
        ],
        "media_id long, modality string, mime string, width int, height int, "
        "duration_ms int, payload binary",
    )
    rows = {r["media_id"]: r for r in extract_features(df).collect()}
    assert len(rows) == 2  # the corrupt row survived via the stub
    assert len(rows[1]["feature"]) == 16 and len(rows[2]["feature"]) == 16


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
