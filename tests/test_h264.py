"""H.264 SPS / avcC parsing: grid round-trips via the bit-exact fixture
encoder, emulation-prevention handling, cropping math, malformed input,
fuzz, and the mp4_info / extract_video_info integration."""

import pytest

from compute_histogram_spark.multimodal.h264 import (
    build_avcc,
    build_sps,
    parse_avcc,
    parse_sps,
    strip_emulation_prevention,
)

GRID = [
    # profile_idc, width, height, frame_mbs_only, chroma_fmt, bit_depth
    (66, 640, 360, True, 1, 8),
    (77, 1920, 1080, True, 1, 8),     # 1080 = 1088 coded - 8 crop
    (88, 320, 240, True, 1, 8),
    (100, 1280, 720, True, 1, 8),
    (100, 854, 480, True, 1, 8),      # odd-ish width, 2-px crop unit
    (100, 720, 576, False, 1, 8),     # interlaced PAL
    (110, 3840, 2160, True, 1, 10),
    (122, 1280, 720, True, 2, 10),    # 4:2:2
    (244, 512, 512, True, 3, 12),     # 4:4:4
    (66, 176, 144, True, 1, 8),       # QCIF
]


@pytest.mark.parametrize("prof,w,h,fmo,cf,bd", GRID)
def test_sps_roundtrip(prof, w, h, fmo, cf, bd):
    sps = build_sps(prof, 31, w, h, fmo, cf, bd)
    info = parse_sps(sps)
    assert (info["width"], info["height"]) == (w, h)
    assert info["profile_idc"] == prof
    assert info["bit_depth_luma"] == bd
    assert info["interlaced"] == (not fmo)
    assert info["coded_width"] % 16 == 0
    assert info["coded_height"] % 16 == 0
    av = build_avcc(sps)
    ai = parse_avcc(av)
    assert (ai["width"], ai["height"]) == (w, h)
    assert ai["nal_length_size"] == 4


def test_cropping_is_encoded_when_needed():
    info = parse_sps(build_sps(77, 31, 1920, 1080))
    assert info["coded_height"] == 1088 and info["height"] == 1080


def test_emulation_prevention_strip():
    assert strip_emulation_prevention(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert strip_emulation_prevention(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    assert strip_emulation_prevention(b"\x00\x00\x02") == b"\x00\x00\x02"
    # 00 00 03 00 00 03 -> 00 00 00 00
    assert strip_emulation_prevention(
        b"\x00\x00\x03\x00\x00\x03") == b"\x00" * 4


def test_sps_without_nal_header():
    sps = build_sps(66, 31, 320, 240, nal_header=False)
    assert parse_sps(sps)["width"] == 320


def test_malformed_raises():
    with pytest.raises(ValueError):
        parse_sps(b"")
    with pytest.raises(ValueError):
        parse_sps(b"\x67\x64")  # truncated mid-header
    with pytest.raises(ValueError):
        parse_avcc(b"\x02\x64\x00\x1f")  # wrong version
    with pytest.raises(ValueError, match="no SPS"):
        parse_avcc(bytes((1, 100, 0, 31, 0xFF, 0xE0, 0x00)))


def test_fuzz_never_crashes():
    import random

    rng = random.Random(17)
    base = build_sps(100, 40, 1920, 1080)
    for _ in range(400):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            parse_sps(bytes(blob))
        except ValueError:
            pass


def test_mp4_avcc_integration(spark):
    """avcC SPS dims override the tkhd display size in mp4_info and in
    the extract_video_info kernel."""
    from pyspark.sql import Row

    from compute_histogram_spark.multimodal.mp4 import (
        encode_mp4,
        extract_video_info,
        mp4_info,
    )

    avcc = build_avcc(build_sps(100, 31, 854, 480))
    # tkhd deliberately carries a DIFFERENT (display) size
    blob = encode_mp4(2.0, video=("avc1", 640, 360), video_avcc=avcc)
    info = mp4_info(blob)
    vid = next(t for t in info["tracks"] if t["handler"] == "vide")
    assert (vid["width"], vid["height"]) == (640, 360)  # tkhd display
    assert vid["sps"]["profile"] == "High"
    assert (vid["sps"]["width"], vid["sps"]["height"]) == (854, 480)

    plain = encode_mp4(2.0, video=("avc1", 640, 360))  # no avcC: tkhd wins
    df = spark.createDataFrame(
        [
            Row(asset_id=1, kind="video", content=bytearray(blob)),
            Row(asset_id=2, kind="video", content=bytearray(plain)),
        ]
    )
    out = {r["asset_id"]: r for r in extract_video_info(df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (854, 480)
    assert out[1]["video_codec"] == "avc1" and out[1]["parsed"] is True
    assert (out[2]["width"], out[2]["height"]) == (640, 360)


def test_headerless_high444_intra_sps():
    """profile_idc 135 (High 4:4:4 Intra) has low5 == 7; a HEADERLESS SPS
    starting with it must not be mistaken for a NAL header byte
    (ADVICE r9 h264.py:95)."""
    sps = build_sps(135, 31, 640, 480, nal_header=False)
    info = parse_sps(sps)
    assert info["profile_idc"] == 135
    assert (info["width"], info["height"]) == (640, 480)
