"""Round-5: real pure-numpy media decode (uncompressed BMP + binary
PPM/PGM) replacing the stubbed decoder slot — golden byte-fixtures
hand-assembled in-test, plus the Spark end-to-end decode -> bilinear
resize path over a real payload column (VERDICT round-4 next-round #3)."""

import numpy as np
import pytest

from ent_res_feedback_spark.operators.multimodal import (
    DecodeUnavailable,
    decode_bmp,
    decode_image,
    decode_image_or_fake,
    decode_netpbm,
    deterministic_fake_image,
    resize_bilinear,
    resize_media,
)

LUMA = np.array([0.299, 0.587, 0.114])


def _bmp24(pixels_rgb: list[list[tuple[int, int, int]]], top_down=False) -> bytes:
    """Assemble a 24-bit BI_RGB BMP from rows of (R,G,B) — bottom-up
    storage with 4-byte row padding unless top_down."""
    h = len(pixels_rgb)
    w = len(pixels_rgb[0])
    row_bytes = (w * 3 + 3) & ~3
    raster = bytearray()
    rows = pixels_rgb if top_down else pixels_rgb[::-1]
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes([b, g, r])  # stored BGR
        line += b"\x00" * (row_bytes - len(line))
        raster += line
    data_off = 14 + 40
    file_size = data_off + len(raster)
    hdr = (
        b"BM"
        + file_size.to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + (-h if top_down else h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(raster).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    return bytes(hdr) + bytes(raster)


RGB_ROWS = [
    [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
    [(0, 0, 0), (255, 255, 255), (128, 128, 128)],
]
RGB_GOLDEN = np.array(
    [[0.299, 0.587, 0.114], [0.0, 1.0, 128 / 255]], dtype=np.float32
)


def test_bmp24_bottom_up_golden():
    img = decode_bmp(_bmp24(RGB_ROWS))
    assert img.dtype == np.float32 and img.shape == (2, 3)
    np.testing.assert_allclose(img, RGB_GOLDEN, atol=1e-6)


def test_bmp24_top_down_matches_bottom_up():
    a = decode_bmp(_bmp24(RGB_ROWS))
    b = decode_bmp(_bmp24(RGB_ROWS, top_down=True))
    np.testing.assert_array_equal(a, b)


def test_bmp8_paletted_golden():
    # 2-entry palette: black, white; 3x2 raster of indices with padding
    w, h = 3, 2
    row_bytes = 4  # 3 -> padded to 4
    palette = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])  # BGRX
    raster = bytes([0, 1, 0, 0]) + bytes([1, 1, 1, 0])  # bottom row first
    data_off = 14 + 40 + len(palette)
    hdr = (
        b"BM"
        + (data_off + len(raster)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + data_off.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (8).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(raster).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 2
        + (2).to_bytes(4, "little")  # biClrUsed = 2
        + (0).to_bytes(4, "little")
    )
    img = decode_bmp(hdr + palette + raster)
    want = np.array([[1, 1, 1], [0, 1, 0]], dtype=np.float32)  # top row last-stored
    np.testing.assert_allclose(img, want, atol=1e-6)


def test_ppm_p6_with_comment_golden():
    payload = (
        b"P6\n# a comment\n3 1\n255\n"
        + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    )
    img = decode_netpbm(payload)
    np.testing.assert_allclose(
        img, np.array([[0.299, 0.587, 0.114]], dtype=np.float32), atol=1e-6
    )


def test_pgm_p5_8_and_16_bit():
    p8 = b"P5 2 2 255\n" + bytes([0, 64, 128, 255])
    np.testing.assert_allclose(
        decode_netpbm(p8),
        np.array([[0, 64], [128, 255]], dtype=np.float64) / 255,
        atol=1e-6,
    )
    # 16-bit samples are BIG-endian per the spec
    vals = [0, 1000, 30000, 65535]
    p16 = b"P5 2 2 65535\n" + b"".join(v.to_bytes(2, "big") for v in vals)
    np.testing.assert_allclose(
        decode_netpbm(p16),
        np.array([[0, 1000], [30000, 65535]], dtype=np.float64) / 65535,
        atol=1e-7,
    )


def test_dispatcher_and_fallbacks():
    bmp = _bmp24(RGB_ROWS)
    np.testing.assert_array_equal(decode_image(bmp), decode_bmp(bmp))
    # meta-hint dimension check
    np.testing.assert_array_equal(decode_image(bmp, 2, 3), decode_bmp(bmp))
    with pytest.raises(ValueError, match="meta says"):
        decode_image(bmp, 64, 64)
    with pytest.raises(DecodeUnavailable, match="no native decoder"):
        decode_image(b"\x89PNG\r\n....")
    # truncated real container is an error, not silently fake
    with pytest.raises(ValueError):
        decode_bmp(bmp[:30])
    # or_fake: real payloads decode, synthetic refs fall back
    np.testing.assert_array_equal(
        decode_image_or_fake(bmp, 64, 64), decode_bmp(bmp)
    )
    fake = decode_image_or_fake(b"media/ref/123", 4, 5)
    np.testing.assert_array_equal(
        fake, deterministic_fake_image(b"media/ref/123", 4, 5)
    )


def test_spark_end_to_end_decode_resize(spark):
    """The production path over a REAL payload column: media frame with
    BMP/PGM bytes -> mapInPandas decode (real) -> bilinear resize; pixel
    output must equal the numpy golden composition exactly. Mixed in: a
    synthetic ref handled by the or_fake fallback in the same batch."""
    bmp = _bmp24(RGB_ROWS)
    pgm = b"P5 2 2 255\n" + bytes([0, 64, 128, 255])
    rows = [
        ("m_bmp", "image", bytearray(bmp), (2, 3, None, "bmp")),
        ("m_pgm", "image", bytearray(pgm), (2, 2, None, "pgm")),
        ("m_fake", "image", bytearray(b"ref-xyz"), (4, 4, None, "fake")),
    ]
    media = spark.createDataFrame(
        rows,
        "media_ref string, kind string, payload binary, "
        "meta struct<height:int,width:int,duration_ms:int,codec:string>",
    )
    out = {
        r["media_ref"]: np.array(r["pixels"], dtype=np.float32)
        for r in resize_media(
            media, out_h=2, out_w=2, decode_fn=decode_image_or_fake
        ).collect()
    }
    np.testing.assert_allclose(
        out["m_bmp"],
        resize_bilinear(decode_bmp(bmp), 2, 2).ravel(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        out["m_pgm"],
        resize_bilinear(decode_netpbm(pgm), 2, 2).ravel(),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        out["m_fake"],
        resize_bilinear(deterministic_fake_image(b"ref-xyz", 4, 4), 2, 2).ravel(),
        atol=1e-6,
    )
