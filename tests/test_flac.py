"""REAL FLAC decode: round-trips across the subframe/stereo/bit-depth
matrix, bitstream integrity checks, and the shared Spark feature kernel
over a mixed WAV+FLAC asset table."""

import numpy as np
import pytest
from pyspark.sql import Row

from compute_histogram_spark.multimodal.audio import (
    encode_wav,
    extract_audio_features,
)
from compute_histogram_spark.multimodal.binary import decode_audio
from compute_histogram_spark.multimodal.flac import (
    _BitReader,
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)

RNG = np.random.default_rng(13)
T = np.arange(10000)


def _roundtrip(x, rate=44100, bps=16, **kw):
    blob = encode_flac(x, rate, bps=bps, **kw)
    dec, r = decode_flac(blob)
    ref = np.asarray(x, dtype=np.float64)
    if ref.ndim == 1:
        ref = ref[:, None]
    assert r == rate
    assert np.array_equal(dec, ref / (1 << (bps - 1)))
    return blob


@pytest.mark.parametrize("mode", ["verbatim", "fixed2"])
def test_roundtrip_mono(mode):
    x = (10000 * np.sin(T / 50)).astype(np.int64)
    _roundtrip(x, mode=mode)


def test_roundtrip_constant_compresses_hard():
    blob = _roundtrip(np.full(9000, 123, dtype=np.int64), mode="constant")
    assert len(blob) < 120  # 9000 samples -> CONSTANT subframes + headers


def test_fixed2_beats_verbatim_on_smooth_signal():
    x = (10000 * np.sin(T / 50)).astype(np.int64)
    v = encode_flac(x, 44100, mode="verbatim")
    f = encode_flac(x, 44100, mode="fixed2")
    assert len(f) < len(v) / 2  # Rice-coded residuals actually compress


@pytest.mark.parametrize("stereo", ["independent", "leftside", "midside"])
def test_roundtrip_stereo_decorrelation(stereo):
    st = np.stack(
        [
            (8000 * np.sin(T / 40)).astype(np.int64),
            (7000 * np.cos(T / 60)).astype(np.int64),
        ],
        axis=1,
    )
    _roundtrip(st, rate=48000, mode="fixed2", stereo=stereo)


@pytest.mark.parametrize("bps", [8, 16, 24])
def test_roundtrip_bit_depths(bps):
    lim = 1 << (bps - 2)
    x = RNG.integers(-lim, lim, size=3000).astype(np.int64)
    _roundtrip(x, rate=16000, bps=bps, mode="verbatim")


def test_tail_frame_shorter_than_blocksize():
    x = RNG.integers(-1000, 1000, size=4097).astype(np.int64)
    _roundtrip(x, mode="fixed2")


def test_crc_corruption_detected():
    x = (5000 * np.sin(T[:5000] / 30)).astype(np.int64)
    blob = bytearray(encode_flac(x, 44100, mode="fixed2"))
    blob[-40] ^= 0x40  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(blob))


def test_truncated_stream_rejected():
    x = RNG.integers(-1000, 1000, size=5000).astype(np.int64)
    blob = encode_flac(x, 44100, mode="verbatim")
    with pytest.raises(ValueError):
        decode_flac(blob[: len(blob) // 2 + 3])


def test_not_flac_rejected():
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"RIFFxxxxWAVE")


def test_bitreader_unary_across_byte_boundaries():
    # 0b00000000 0b00100000: 10 zeros then a 1 -> q=10, then 5 more bits
    br = _BitReader(bytes([0x00, 0x20, 0xAB]))
    assert br.read_unary() == 10
    assert br.read(5) == 0b00000  # rest of byte 1
    assert br.read(8) == 0xAB


def test_crc_vectors():
    # classic check input "123456789"
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8  # CRC-16/BUYPASS


def test_decode_audio_gateway_routes_flac():
    x = (3000 * np.sin(T[:4000] / 25)).astype(np.int64)
    samples, rate = decode_audio(encode_flac(x, 22050, mode="fixed2"))
    assert rate == 22050 and samples.shape == (4000, 1)
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish payload")


def test_extract_audio_features_spark_mixed_wav_flac(spark):
    wav_sig = (np.sin(np.arange(8000) / 20.0) * 0.5).reshape(-1, 1)
    flac_sig = (6000 * np.cos(np.arange(6000) / 35.0)).astype(np.int64)
    rows = [
        Row(asset_id=1, kind="audio",
            content=bytearray(encode_wav(wav_sig, 16000, bits=-32))),
        Row(asset_id=2, kind="audio",
            content=bytearray(encode_flac(flac_sig, 44100, mode="fixed2"))),
        Row(asset_id=9, kind="audio", content=bytearray(b"not audio")),
    ]
    out = {r["asset_id"]: r for r in
           extract_audio_features(spark.createDataFrame(rows)).collect()}
    assert out[1]["decoded"] and out[1]["sample_rate"] == 16000
    assert out[2]["decoded"] and out[2]["sample_rate"] == 44100
    assert out[2]["n_frames"] == 6000 and out[2]["n_channels"] == 1
    ref = flac_sig / float(1 << 15)
    assert out[2]["rms"] == pytest.approx(float(np.sqrt((ref**2).mean())),
                                          rel=1e-9)
    assert out[2]["peak"] == pytest.approx(float(np.abs(ref).max()),
                                           rel=1e-9)
    assert out[9]["decoded"] is False


def test_roundtrip_lpc_subframe_path():
    """LPC subframes (precision/shift/coefficient parsing + the generic
    coef dot-product) — encoded as order-2 LPC with coefs [2, -1], the
    same predictor as FIXED-2, so residual sizing is known-good."""
    x = (9000 * np.sin(T / 45)).astype(np.int64)
    blob = _roundtrip(x, mode="lpc2")
    v = encode_flac(x, 44100, mode="verbatim")
    assert len(blob) < len(v) / 2  # the LPC path actually compresses too


def test_roundtrip_lpc_stereo_midside():
    st = np.stack(
        [
            (6000 * np.sin(T / 30)).astype(np.int64),
            (5500 * np.sin(T / 30 + 0.2)).astype(np.int64),
        ],
        axis=1,
    )
    _roundtrip(st, mode="lpc2", stereo="midside")
