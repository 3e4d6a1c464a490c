"""ADTS AAC + Ogg container parsers: fixture round-trips, CRC
verification, truncation, fuzz, and kernel integration."""

import struct

import pytest

from compute_histogram_spark.multimodal.aac import (
    AdtsFrameHeader,
    aac_info,
    build_adts,
)
from compute_histogram_spark.multimodal.ogg import (
    OggPage,
    _ogg_crc,
    build_ogg_opus,
    build_ogg_vorbis,
    ogg_info,
)

# ----------------------------------------------------------------- ADTS

AAC_GRID = [
    ("LC", 44100, 2, False, True),
    ("LC", 48000, 1, True, True),
    ("Main", 22050, 6, False, True),
    ("SSR", 8000, 7, False, False),
    ("LTP", 96000, 3, True, True),
]


@pytest.mark.parametrize("profile,rate,ch,crc,mpeg4", AAC_GRID)
def test_adts_roundtrip(profile, rate, ch, crc, mpeg4):
    blob = build_adts(profile, rate, ch, n_frames=5, crc=crc, mpeg4=mpeg4)
    info = aac_info(blob)
    assert info["profile"] == profile
    assert info["sample_rate"] == rate
    assert info["n_channels"] == (8 if ch == 7 else ch)
    assert info["n_frames"] == 5
    assert info["n_samples"] == 5 * 1024
    assert info["duration_s"] == pytest.approx(5 * 1024 / rate)
    h = AdtsFrameHeader(blob, 0)
    assert h.crc is crc and h.mpeg4 is mpeg4


def test_adts_truncated_raises():
    blob = build_adts(n_frames=3)
    with pytest.raises(ValueError, match="truncated"):
        aac_info(blob[:-5])


def test_adts_parameter_change_raises():
    a = build_adts(sample_rate=44100, n_frames=2)
    b = build_adts(sample_rate=48000, n_frames=2)
    with pytest.raises(ValueError, match="parameters changed"):
        aac_info(a + b)


def test_adts_garbage_raises():
    with pytest.raises(ValueError):
        aac_info(b"\x00" * 32)
    with pytest.raises(ValueError):
        aac_info(b"")


def test_adts_sync_is_disjoint_from_mp3():
    # ADTS second byte has layer bits 00 (reserved for MP3); an MP3
    # header must never parse as ADTS and vice versa
    from compute_histogram_spark.multimodal.mp3 import (
        Mp3FrameHeader,
        build_mp3,
    )

    adts = build_adts(n_frames=1)
    assert (adts[1] & 0xF6) == 0xF0
    with pytest.raises(ValueError, match="reserved version/layer"):
        Mp3FrameHeader(adts, 0)
    mp3 = build_mp3(n_frames=1)
    assert (mp3[1] & 0xF6) != 0xF0
    with pytest.raises(ValueError, match="layer"):
        AdtsFrameHeader(mp3, 0)


def test_adts_fuzz():
    import random

    rng = random.Random(11)
    base = build_adts(n_frames=4)
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 5)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            aac_info(bytes(blob))
        except ValueError:
            pass


# ------------------------------------------------------------------ Ogg


def test_ogg_vorbis_roundtrip():
    blob = build_ogg_vorbis(sample_rate=44100, channels=2, n_samples=88200,
                            n_audio_pages=4)
    info = ogg_info(blob)
    assert info["codec"] == "vorbis"
    assert info["sample_rate"] == 44100
    assert info["n_channels"] == 2
    assert info["n_samples"] == 88200
    assert info["duration_s"] == pytest.approx(2.0)
    assert info["n_pages"] == 5
    assert info["nominal_bitrate"] == 128000


def test_ogg_opus_roundtrip():
    blob = build_ogg_opus(channels=1, pre_skip=312, n_samples_48k=96000)
    info = ogg_info(blob)
    assert info["codec"] == "opus"
    assert info["sample_rate"] == 48000
    assert info["n_channels"] == 1
    assert info["pre_skip"] == 312
    assert info["input_sample_rate"] == 44100
    assert info["n_samples"] == 96000
    assert info["duration_s"] == pytest.approx(2.0)


def test_ogg_crc_is_verified():
    blob = bytearray(build_ogg_vorbis())
    # flip one payload byte of the second page: its CRC must now fail
    first_len = OggPage(bytes(blob), 0).size
    blob[first_len + 40] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_info(bytes(blob))


def test_ogg_crc_known_value():
    # the table-driven CRC matches a bit-at-a-time reference
    def ref(data):
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        return crc

    for blob in (b"", b"OggS", bytes(range(256))):
        assert _ogg_crc(blob) == ref(blob)


def test_ogg_missing_bos_raises():
    blob = build_ogg_vorbis()
    second = OggPage(blob, 0).size
    with pytest.raises(ValueError, match="BOS"):
        ogg_info(blob[second:])


def test_ogg_truncated_raises():
    blob = build_ogg_vorbis()
    with pytest.raises(ValueError, match="truncated|sync"):
        ogg_info(blob[:-7])


def test_ogg_long_page_lacing():
    # payloads > 255 bytes use 255-laces + terminator; builder emits them
    blob = build_ogg_vorbis(n_audio_pages=2)  # second audio page is 555 B
    info = ogg_info(blob)
    assert info["n_pages"] == 3


def test_ogg_fuzz():
    import random

    rng = random.Random(13)
    base = build_ogg_opus()
    for _ in range(200):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 4)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            ogg_info(bytes(blob))
        except ValueError:
            pass


# ------------------------------------------------------- kernel routing


def test_extract_audio_features_routes_all_lossy(spark):
    from pyspark.sql import Row

    from compute_histogram_spark.multimodal.audio import (
        extract_audio_features,
    )
    from compute_histogram_spark.multimodal.mp3 import build_mp3

    rows = [
        Row(asset_id=1, kind="audio",
            content=bytearray(build_adts("LC", 48000, 2, n_frames=8))),
        Row(asset_id=2, kind="audio",
            content=bytearray(build_ogg_vorbis(32000, 1, 64000))),
        Row(asset_id=3, kind="audio",
            content=bytearray(build_ogg_opus(2, 0, 48000))),
        Row(asset_id=4, kind="audio",
            content=bytearray(build_mp3(n_frames=3))),
    ]
    df = spark.createDataFrame(rows)
    out = {r["asset_id"]: r for r in extract_audio_features(df).collect()}
    assert out[1]["sample_rate"] == 48000 and out[1]["n_frames"] == 8 * 1024
    assert out[2]["sample_rate"] == 32000 and out[2]["n_frames"] == 64000
    assert out[3]["sample_rate"] == 48000 and out[3]["n_frames"] == 48000
    assert out[4]["sample_rate"] == 44100
    for i in (1, 2, 3, 4):
        assert out[i]["decoded"] is False
        assert out[i]["rms"] is None


def test_kernel_routes_id3_tagged_adts(spark):
    """Taggers put ID3v2 on ADTS files too: the kernel must sniff the
    first post-tag frame and route to the AAC parser, not MP3."""
    from pyspark.sql import Row

    from compute_histogram_spark.multimodal.audio import (
        extract_audio_features,
    )

    adts = build_adts("LC", 44100, 2, n_frames=6)
    id3 = b"ID3" + bytes((4, 0, 0)) + bytes((0, 0, 0, 20)) + bytes(20)
    df = spark.createDataFrame(
        [Row(asset_id=1, kind="audio", content=bytearray(id3 + adts))]
    )
    r = extract_audio_features(df).collect()[0]
    assert r["decoded"] is False
    assert r["sample_rate"] == 44100
    assert r["n_frames"] == 6 * 1024  # AAC samples, not MP3's 1152/frame
