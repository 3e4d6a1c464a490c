"""GIF + BMP codecs (multimodal/gif.py): exact lossless round trips
(GIF's real LZW compressor proves table growth / width bumps /
interlace; BMP proves row padding and bottom-up order), palette and
top-down BMP variants, strict rejection, Spark pixel-stats wiring."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from compute_histogram_spark.multimodal.gif import (
    bmp_info,
    decode_bmp,
    decode_gif,
    encode_bmp,
    encode_gif,
    gif_info,
)


def paletted(h, w, n_colors=12, seed=3):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    return pal[rng.integers(0, n_colors, size=(h, w), dtype=np.uint8)]


@pytest.mark.parametrize("interlace", [False, True])
def test_gif_round_trip_exact(interlace):
    img = paletted(37, 53)
    blob = encode_gif(img, interlace=interlace)
    assert gif_info(blob) == (53, 37, 3)
    assert np.array_equal(decode_gif(blob), img)


def test_gif_lzw_table_growth_round_trip():
    # 60k pixels force the code table past several width bumps
    img = paletted(200, 300, n_colors=12, seed=7)
    blob = encode_gif(img)
    assert len(blob) < img.size  # actually compressed
    assert np.array_equal(decode_gif(blob), img)


def test_gif_two_color_min_code_size():
    img = paletted(16, 16, n_colors=2, seed=1)
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_gif_rejections():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_info(b"GIF00a" + b"\x00" * 16)
    blob = bytearray(encode_gif(paletted(8, 8)))
    with pytest.raises(ValueError):
        decode_gif(bytes(blob[:20]))  # truncated
    with pytest.raises(ValueError, match="256 distinct"):
        rng = np.random.default_rng(0)
        encode_gif(rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8))


@pytest.mark.parametrize("h,w", [(37, 53), (16, 15), (1, 1)])
def test_bmp_round_trip_exact(h, w):
    rng = np.random.default_rng(h * 100 + w)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    blob = encode_bmp(img)
    assert bmp_info(blob) == (w, h, 3)
    assert np.array_equal(decode_bmp(blob), img)


def test_bmp_top_down_variant():
    img = paletted(9, 7)
    # encoder stores img[::-1] bottom-up, i.e. file rows == img; flipping
    # the height sign marks the file top-down, so the decode is img again
    blob = bytearray(encode_bmp(img[::-1]))
    struct.pack_into("<i", blob, 22, -9)
    assert np.array_equal(decode_bmp(bytes(blob)), img)


def test_bmp_8bit_palette():
    # hand-build: 4x2 8-bit palette BMP, 2 colors, bottom-up
    pal = b"\x10\x20\x30\x00" + b"\x40\x50\x60\x00"  # BGRA entries
    rows = bytes([0, 1, 0, 1]) + bytes([1, 1, 0, 0])  # padded to 4 already
    hdr = b"BM" + struct.pack("<IHHI", 54 + 8 + 8, 0, 0, 54 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, 8, 0, 0, 2, 0)
    blob = hdr + info + pal + rows
    out = decode_bmp(blob)
    assert out.shape == (2, 4, 3)
    # bottom-up: file row 0 is image row 1
    assert tuple(out[1, 0]) == (0x30, 0x20, 0x10)
    assert tuple(out[1, 1]) == (0x60, 0x50, 0x40)
    assert tuple(out[0, 0]) == (0x60, 0x50, 0x40)


def test_bmp_rejections():
    with pytest.raises(ValueError, match="not a BMP"):
        bmp_info(b"XX" + b"\x00" * 30)
    blob = bytearray(encode_bmp(paletted(8, 8)))
    struct.pack_into("<I", blob, 30, 1)  # RLE8 compression
    with pytest.raises(ValueError, match="unsupported"):
        decode_bmp(bytes(blob))
    blob = bytearray(encode_bmp(paletted(8, 8)))
    struct.pack_into("<i", blob, 22, 1 << 20)  # absurd height
    with pytest.raises(ValueError, match="beyond end"):
        decode_bmp(bytes(blob))


def test_pixel_stats_decode_gif_and_bmp(spark):
    from compute_histogram_spark.multimodal import binary as MM

    img = paletted(24, 32)
    assets = spark.createDataFrame(
        [
            Row(asset_id=0, kind="image", content=encode_gif(img), source="g"),
            Row(asset_id=1, kind="image", content=encode_bmp(img), source="b"),
        ]
    )
    stats = {r["asset_id"]: r for r in MM.extract_pixel_stats(assets).collect()}
    luma = (
        0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2]
    ).mean()
    for aid in (0, 1):
        assert stats[aid]["decoded"] is True
        assert (stats[aid]["width"], stats[aid]["height"]) == (32, 24)
        assert abs(stats[aid]["mean_luma"] - luma) < 1e-6  # lossless decode
    feats = {r["asset_id"]: r for r in MM.extract_features(assets).collect()}
    assert (feats[0]["width"], feats[0]["height"], feats[0]["n_channels"]) == (32, 24, 3)
    assert (feats[1]["width"], feats[1]["height"], feats[1]["n_channels"]) == (32, 24, 3)
    assert MM.decode_image(encode_gif(img)) == (32, 24, 3)
    assert MM.decode_image(encode_bmp(img)) == (32, 24, 3)


def test_gif_truncated_color_table_diagnosed():
    """A color-table slice that is not a multiple of 3 must raise the
    diagnosed 'truncated color table', not numpy's bare reshape error
    (ADVICE r7)."""
    # header declares a 2-entry GCT (6 bytes) but only 4 bytes follow
    hdr = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x80, 0, 0])
    with pytest.raises(ValueError, match="truncated color table"):
        decode_gif(hdr + b"\x01\x02\x03\x04")
    # same for a local color table: valid header, no GCT, image
    # descriptor declaring an LCT cut mid-entry
    hdr2 = b"GIF89a" + struct.pack("<HH", 2, 2) + bytes([0x00, 0, 0])
    desc = b"\x2c" + struct.pack("<HHHH", 0, 0, 2, 2) + bytes([0x80])
    with pytest.raises(ValueError, match="truncated color table"):
        decode_gif(hdr2 + desc + b"\x01\x02\x03\x04")


def test_bmp_info_palette_reports_decoded_channels():
    """bmp_info must agree with decode_bmp's output shape: 8-bit palette
    files decode to (h, w, 3) RGB, so channels is 3 (ADVICE r7)."""
    pal = b"\x10\x20\x30\x00" + b"\x40\x50\x60\x00"
    rows = bytes([0, 1, 0, 1]) + bytes([1, 1, 0, 0])
    hdr = b"BM" + struct.pack("<IHHI", 54 + 8 + 8, 0, 0, 54 + 8)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, 8, 0, 0, 2, 0)
    blob = hdr + info + pal + rows
    assert bmp_info(blob) == (4, 2, 3)
    assert decode_bmp(blob).shape == (2, 4, 3)


def test_bmp_truncated_palette_diagnosed():
    # declared n_colors=0 -> 256 entries (1024 bytes) but the file ends
    # after 13 bytes of palette region — and 13 is not a multiple of 4,
    # so pre-fix this raised numpy's bare reshape error, not the
    # diagnosed 'truncated palette'
    hdr = b"BM" + struct.pack("<IHHI", 54 + 13, 0, 0, 54 + 5)
    info = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 0, 8, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="truncated palette"):
        decode_bmp(hdr + info + b"\x10\x20\x30\x00\x40" + bytes(8))
