"""MP3 frame-header parser: fixture round-trips over the version/layer/
bitrate/rate grid, ID3 handling, VBR/Xing, truncation, fuzz, and the
extract_audio_features integration (metadata with decoded=false)."""

import struct

import pytest

from compute_histogram_spark.multimodal.mp3 import (
    Mp3FrameHeader,
    build_mp3,
    id3v2_size,
    mp3_info,
)

GRID = [
    # version, layer, bitrate, rate, mono
    ("MPEG1", 3, 128, 44100, False),
    ("MPEG1", 3, 320, 48000, True),
    ("MPEG1", 2, 192, 32000, False),
    ("MPEG1", 1, 448, 44100, False),
    ("MPEG2", 3, 64, 22050, True),
    ("MPEG2", 2, 80, 24000, False),
    ("MPEG2", 1, 144, 16000, True),
    ("MPEG2.5", 3, 40, 11025, False),
    ("MPEG2.5", 3, 8, 8000, True),
]


@pytest.mark.parametrize("version,layer,kbps,rate,mono", GRID)
def test_roundtrip_grid(version, layer, kbps, rate, mono):
    blob = build_mp3(version, layer, kbps, rate, n_frames=7, mono=mono)
    info = mp3_info(blob)
    assert info["version"] == version
    assert info["layer"] == layer
    assert info["bitrate_kbps"] == float(kbps)
    assert info["sample_rate"] == rate
    assert info["n_channels"] == (1 if mono else 2)
    assert info["n_frames"] == 7
    spf = 384 if layer == 1 else (
        1152 if layer == 2 or version == "MPEG1" else 576)
    assert info["n_samples"] == 7 * spf
    assert info["duration_s"] == pytest.approx(7 * spf / rate)
    assert info["vbr"] is False


def test_padding_changes_frame_length_not_samples():
    plain = build_mp3(n_frames=6)
    padded = build_mp3(n_frames=6, padding_every=2)
    assert len(padded) == len(plain) + 3  # Layer III pad = 1 byte/frame
    assert mp3_info(padded)["n_samples"] == mp3_info(plain)["n_samples"]


def test_crc_flag_parses():
    blob = build_mp3(n_frames=3, crc=True)
    info = mp3_info(blob)
    assert info["n_frames"] == 3
    assert Mp3FrameHeader(blob, 0).crc is True


def test_id3v2_skip_and_id3v1_tail():
    blob = build_mp3(n_frames=4, id3v2_bytes=500, id3v1=True)
    assert id3v2_size(blob) == 510
    info = mp3_info(blob)
    assert info["n_frames"] == 4


def test_id3v2_footer_flag():
    blob = bytearray(build_mp3(n_frames=1, id3v2_bytes=64))
    blob[5] = 0x10  # set footer flag: size must grow by 10
    assert id3v2_size(bytes(blob)) == 10 + 64 + 10


def test_vbr_average_bitrate():
    rates = [64, 128, 192, 256]
    blob = build_mp3(n_frames=4, per_frame_bitrates=rates)
    info = mp3_info(blob)
    assert info["vbr"] is True
    # average of per-frame bitrates weighted by frame bytes, ~ byte-exact
    assert 64 < info["bitrate_kbps"] < 256
    assert info["n_frames"] == 4


def test_xing_header_frame_count():
    blob = build_mp3(n_frames=5, xing=True)
    info = mp3_info(blob)
    assert info["vbr"] is True  # Xing/Info marks the stream VBR-indexed
    assert info["n_frames"] == 5


def test_xing_count_mismatch_raises():
    blob = bytearray(build_mp3(n_frames=5, xing=True))
    # corrupt the Xing frame count (offset: header 4 + side info 32 + 8)
    struct.pack_into(">I", blob, 4 + 32 + 8, 99)
    with pytest.raises(ValueError, match="Xing frame count"):
        mp3_info(bytes(blob))


def test_truncated_stream_raises():
    blob = build_mp3(n_frames=3)
    with pytest.raises(ValueError, match="truncated|trailing"):
        mp3_info(blob[:-10])


def test_mid_stream_parameter_change_raises():
    a = build_mp3(n_frames=2, sample_rate=44100)
    b = build_mp3(n_frames=2, sample_rate=48000)
    with pytest.raises(ValueError, match="parameters changed"):
        mp3_info(a + b)


def test_garbage_raises():
    with pytest.raises(ValueError):
        mp3_info(b"\x00" * 64)
    with pytest.raises(ValueError):
        mp3_info(b"ID3" + b"\x04\x00\x00\x00\x00\x00\x05hello")  # tag only


def test_free_format_rejected_cleanly():
    h = (0x7FF << 21) | (3 << 19) | (1 << 17) | (1 << 16) | (0 << 12)
    with pytest.raises(ValueError, match="free-format"):
        Mp3FrameHeader(struct.pack(">I", h), 0)


def test_fuzz_never_crashes():
    import random

    rng = random.Random(7)
    base = build_mp3(n_frames=4, id3v2_bytes=32)
    for _ in range(300):
        blob = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            blob[rng.randrange(len(blob))] = rng.randrange(256)
        try:
            info = mp3_info(bytes(blob))
            assert info["n_frames"] >= 1  # parsed streams stay coherent
        except ValueError:
            pass  # the only allowed failure mode
    for n in (0, 1, 2, 3, 4, 10, 100):
        try:
            mp3_info(bytes(rng.randrange(256) for _ in range(n)))
        except ValueError:
            pass


def test_extract_audio_features_mp3_metadata(spark):
    """Integration: MP3 assets report header metadata, decoded=false,
    null PCM features — alongside a real WAV decode in the same batch."""
    from pyspark.sql import Row

    from compute_histogram_spark.multimodal.audio import (
        encode_wav,
        extract_audio_features,
    )

    mp3 = build_mp3("MPEG1", 3, 128, 44100, n_frames=10, id3v2_bytes=40)
    wav = encode_wav([0.0, 0.5, -0.5, 0.0], sample_rate=8000)
    df = spark.createDataFrame(
        [
            Row(asset_id=1, kind="audio", content=bytearray(mp3)),
            Row(asset_id=2, kind="audio", content=bytearray(wav)),
        ]
    )
    out = {r["asset_id"]: r for r in extract_audio_features(df).collect()}
    m = out[1]
    assert m["decoded"] is False
    assert m["sample_rate"] == 44100
    assert m["n_channels"] == 2
    assert m["n_frames"] == 10 * 1152
    assert m["duration_s"] == pytest.approx(10 * 1152 / 44100)
    assert m["rms"] is None and m["peak"] is None
    w = out[2]
    assert w["decoded"] is True and w["sample_rate"] == 8000


def test_xing_count_excluding_header_frame_tolerated():
    """LAME-style encoders write the Xing count EXCLUDING the header
    frame itself; that off-by-one is a valid stream, not corruption
    (ADVICE r9 mp3.py:181)."""
    blob = bytearray(build_mp3(n_frames=5, xing=True))
    struct.pack_into(">I", blob, 4 + 32 + 8, 4)  # 4 audio frames + Xing
    info = mp3_info(bytes(blob))
    assert info["n_frames"] == 5
    assert info["vbr"] is True
