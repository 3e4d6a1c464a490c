"""REAL ISO-BMFF container parsing: fixture round-trips across box
variants, malformed-input rejection, and the Spark metadata kernel."""

import pytest
from pyspark.sql import Row

from compute_histogram_spark.multimodal.mp4 import (
    encode_mp4,
    extract_video_info,
    mp4_info,
)


def test_basic_av_file():
    blob = encode_mp4(12.5, timescale=600, video=("avc1", 1280, 720),
                      audio="mp4a")
    i = mp4_info(blob)
    assert i["brand"] == "isom"
    assert i["timescale"] == 600
    assert i["duration_s"] == 12.5
    assert i["n_tracks"] == 2
    handlers = {t["handler"]: t for t in i["tracks"]}
    assert handlers["vide"]["codec"] == "avc1"
    assert (handlers["vide"]["width"], handlers["vide"]["height"]) == (1280, 720)
    assert handlers["soun"]["codec"] == "mp4a"


def test_version1_64bit_times():
    blob = encode_mp4(3600.25, timescale=90000, version1=True)
    i = mp4_info(blob)
    assert i["duration_s"] == 3600.25
    assert i["timescale"] == 90000


def test_largesize_box_header():
    blob = encode_mp4(5.0, large_moov=True)
    i = mp4_info(blob)
    assert i["duration_s"] == 5.0 and i["n_tracks"] == 2


def test_video_only_and_audio_only():
    v = mp4_info(encode_mp4(1.0, video=("hvc1", 3840, 2160), audio=None))
    assert v["n_tracks"] == 1 and v["tracks"][0]["codec"] == "hvc1"
    a = mp4_info(encode_mp4(1.0, video=None, audio="Opus"))
    assert a["n_tracks"] == 1 and a["tracks"][0]["handler"] == "soun"


def test_rejects_non_bmff_and_truncated():
    with pytest.raises(ValueError):
        mp4_info(b"RIFF....WAVE not a box structure at all")
    blob = encode_mp4(2.0)
    with pytest.raises(ValueError):
        mp4_info(blob[: len(blob) // 2])  # moov box truncated mid-span


def test_extract_video_info_spark(spark):
    rows = [
        Row(asset_id=1, kind="video",
            content=bytearray(encode_mp4(9.0, video=("av01", 1920, 1080)))),
        Row(asset_id=2, kind="video",
            content=bytearray(encode_mp4(2.5, video=None, audio="mp4a",
                                         brand="M4A "))),
        Row(asset_id=3, kind="video", content=bytearray(b"not a video")),
        Row(asset_id=4, kind="image", content=bytearray(b"filtered out")),
    ]
    out = {r["asset_id"]: r for r in
           extract_video_info(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2, 3}
    assert out[1]["parsed"] and out[1]["video_codec"] == "av01"
    assert (out[1]["width"], out[1]["height"]) == (1920, 1080)
    assert out[1]["duration_s"] == 9.0
    assert out[2]["parsed"] and out[2]["video_codec"] is None
    assert out[2]["audio_codec"] == "mp4a" and out[2]["brand"] == "M4A "
    assert out[3]["parsed"] is False and out[3]["duration_s"] is None
