"""Real WAV decode: round-trips across bit depths / channel layouts, spec
details (u8 offset-binary, i24 packing, EXTENSIBLE fmt, odd-sized chunk
padding), and the Spark feature kernel vs numpy."""

import struct

import numpy as np
import pytest
from pyspark.sql import Row

from compute_histogram_spark.multimodal.audio import (
    decode_wav,
    encode_wav,
    extract_audio_features,
)
from compute_histogram_spark.multimodal.binary import decode_audio

RNG = np.random.default_rng(3)


def _sig(n=1000, ch=1):
    t = np.arange(n)[:, None]
    f = 0.01 * (1 + np.arange(ch))[None, :]
    return (0.8 * np.sin(2 * np.pi * f * t)).reshape(n, ch)


@pytest.mark.parametrize("bits,tol", [(16, 2**-15), (32, 2**-31)])
def test_roundtrip_int_pcm(bits, tol):
    a = _sig()
    x, rate = decode_wav(encode_wav(a, 16000, bits=bits))
    assert rate == 16000 and x.shape == a.shape
    assert np.abs(x - a).max() <= tol


@pytest.mark.parametrize("bits", [-32, -64])
def test_roundtrip_float(bits):
    a = _sig(ch=2)
    x, rate = decode_wav(encode_wav(a, 44100, bits=bits))
    assert rate == 44100 and x.shape == a.shape
    if bits == -64:
        assert np.array_equal(x, a)  # float64 is lossless
    else:
        assert np.abs(x - a).max() < 1e-7


def test_u8_offset_binary():
    # u8 silence is 128, full negative is 0
    raw = encode_wav(np.zeros(10), 8000, bits=16)
    # hand-build a u8 file: 5 frames [0, 128, 255]
    data = bytes([0, 128, 255])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 1 + 8 + len(data) + 1)
        + b"WAVE"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data + b"\x00"
    )
    x, rate = decode_wav(blob)
    assert x[:, 0].tolist() == [-1.0, 0.0, pytest.approx(127 / 128)]
    assert raw  # silence encodes fine too


def test_i24_packing():
    vals = np.array([0.5, -0.5, 0.25])
    ints = np.round(vals * 2**23).astype(np.int64)
    data = b"".join(int(v & 0xFFFFFF).to_bytes(3, "little") for v in ints)
    fmt = struct.pack("<HHIIHH", 1, 1, 48000, 48000 * 3, 3, 24)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    x, _ = decode_wav(blob)
    assert np.abs(x[:, 0] - vals).max() < 2**-22


def test_extensible_fmt_resolves_guid():
    a = _sig(ch=2)
    base = encode_wav(a, 22050, bits=16)
    # rebuild with an EXTENSIBLE fmt chunk: base(16) + cbSize/validBits/
    # channelMask(8) + 16-byte SubFormat GUID whose first two bytes are the
    # real tag (PCM=1) -> 40 bytes total
    fmt = (
        struct.pack(
            "<HHIIHHHHI", 0xFFFE, 2, 22050, 22050 * 4, 4, 16, 22, 16, 0
        )
        + struct.pack("<H", 1)
        + b"\x00" * 14
    )
    data = base[base.index(b"data") + 8 :]
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + struct.pack("<4sI", b"fmt ", len(fmt)) + fmt
        + struct.pack("<4sI", b"data", len(data)) + data
    )
    x, rate = decode_wav(blob)
    assert rate == 22050 and x.shape == a.shape


def test_decode_audio_gateway():
    x, rate = decode_audio(encode_wav(_sig(), 8000))
    assert rate == 8000
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish payload")
    with pytest.raises(ValueError):
        decode_audio(b"RIFF\x00\x00\x00\x00AVI LIST")  # RIFF but not WAVE


def test_extract_audio_features_spark(spark):
    sigs = {1: _sig(8000, 1), 2: _sig(4000, 2)}
    rows = [
        Row(asset_id=k, kind="audio",
            content=bytearray(encode_wav(v, 16000, bits=-32)))
        for k, v in sigs.items()
    ] + [
        Row(asset_id=9, kind="audio", content=bytearray(b"not audio")),
        Row(asset_id=10, kind="image", content=bytearray(b"skipped")),
    ]
    out = {r["asset_id"]: r for r in
           extract_audio_features(spark.createDataFrame(rows)).collect()}
    assert set(out) == {1, 2, 9}           # non-audio kinds filtered out
    for k, v in sigs.items():
        r = out[k]
        assert r["decoded"] and r["sample_rate"] == 16000
        assert (r["n_frames"], r["n_channels"]) == v.shape
        assert r["duration_s"] == pytest.approx(v.shape[0] / 16000)
        assert r["rms"] == pytest.approx(float(np.sqrt((v**2).mean())), rel=1e-6)
        assert r["peak"] == pytest.approx(float(np.abs(v).max()), rel=1e-6)
    assert out[9]["decoded"] is False and out[9]["rms"] is None
