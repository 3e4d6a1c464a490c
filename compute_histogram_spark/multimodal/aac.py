"""ADTS AAC frame-header parsing — metadata only (see mp3.py preamble;
the same honest boundary: raw AAC decode needs the ISO codebooks, but the
ADTS transport syntax is a handful of public bit fields, including an
explicit per-frame byte length that makes the frame walk exact).
"""

from __future__ import annotations

import struct

_RATES = (
    96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
    16000, 12000, 11025, 8000, 7350,
)
_PROFILES = ("Main", "LC", "SSR", "LTP")
_SAMPLES_PER_BLOCK = 1024


class AdtsFrameHeader:
    __slots__ = (
        "mpeg4", "crc", "profile", "sample_rate", "channel_config",
        "frame_len", "n_blocks",
    )

    def __init__(self, b: bytes, pos: int):
        if pos + 7 > len(b):
            raise ValueError("malformed ADTS: truncated header")
        h = struct.unpack_from(">Q", b"\x00\x00" + b[pos:pos + 6])[0]
        # 48 bits: 12 sync, 1 id, 2 layer, 1 !crc, 2 profile, 4 rate idx,
        # 1 private, 3 channels, 1 orig, 1 home, 1 cpy-bit, 1 cpy-start,
        # 13 frame length, ... (buffer fullness + block count follow)
        if (h >> 36) & 0xFFF != 0xFFF:
            raise ValueError("malformed ADTS: lost frame sync")
        if (h >> 33) & 3 != 0:
            raise ValueError("malformed ADTS: layer must be 0")
        rate_idx = (h >> 26) & 0xF
        if rate_idx >= len(_RATES):
            raise ValueError("malformed ADTS: reserved sample-rate index")
        self.mpeg4 = (h >> 35) & 1 == 0
        self.crc = (h >> 32) & 1 == 0
        self.profile = _PROFILES[(h >> 30) & 3]
        self.sample_rate = _RATES[rate_idx]
        self.channel_config = (h >> 22) & 7
        self.frame_len = (h >> 5) & 0x1FFF  # includes the header itself
        if pos + 7 > len(b):
            raise ValueError("malformed ADTS: truncated header")
        self.n_blocks = (b[pos + 6] & 3) + 1
        if self.frame_len < (9 if self.crc else 7):
            raise ValueError("malformed ADTS: frame length below header size")


def aac_info(content: bytes) -> dict:
    """Walk every ADTS frame -> (sample_rate, n_channels, n_frames,
    n_samples, duration_s, bitrate_kbps, profile). Raises ValueError on
    malformed input (same contract as mp3_info)."""
    pos, end = 0, len(content)
    if pos >= end:
        raise ValueError("malformed ADTS: empty stream")
    first = AdtsFrameHeader(content, pos)
    n_frames = 0
    n_samples = 0
    while pos < end:
        h = AdtsFrameHeader(content, pos)
        if (h.sample_rate, h.channel_config) != (
            first.sample_rate, first.channel_config
        ):
            raise ValueError("malformed ADTS: stream parameters changed")
        if pos + h.frame_len > end:
            raise ValueError("malformed ADTS: truncated frame")
        n_frames += 1
        n_samples += _SAMPLES_PER_BLOCK * h.n_blocks
        pos += h.frame_len
    if first.channel_config == 0:
        # channel layout lives in an in-band PCE, which needs the raw
        # payload; stay strict rather than guess
        raise ValueError("malformed ADTS: PCE channel config unsupported")
    duration = n_samples / first.sample_rate
    return {
        "sample_rate": first.sample_rate,
        # configs 1..6 equal the channel count; 7 means 7.1 (8 channels)
        "n_channels": 8 if first.channel_config == 7 else first.channel_config,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": duration,
        "bitrate_kbps": round(len(content) * 8 / duration / 1000, 3)
        if duration else 0.0,
        "profile": first.profile,
    }


def build_adts(
    profile: str = "LC",
    sample_rate: int = 44100,
    channels: int = 2,
    n_frames: int = 4,
    payload_bytes: int = 200,
    crc: bool = False,
    mpeg4: bool = True,
) -> bytes:
    """Spec-valid ADTS frame sequence with deterministic dummy payloads
    (transport fixtures; the raw AAC payload is never decoded)."""
    if sample_rate not in _RATES:
        raise ValueError(f"invalid ADTS sample rate {sample_rate}")
    rate_idx = _RATES.index(sample_rate)
    prof_idx = _PROFILES.index(profile)
    out = bytearray()
    for i in range(n_frames):
        hdr_len = 9 if crc else 7
        flen = hdr_len + payload_bytes
        h = bytearray(7)
        h[0] = 0xFF
        h[1] = 0xF0 | ((0 if mpeg4 else 1) << 3) | (0 << 1) | (0 if crc else 1)
        h[2] = (prof_idx << 6) | (rate_idx << 2) | ((channels >> 2) & 1)
        h[3] = ((channels & 3) << 6) | ((flen >> 11) & 3)
        h[4] = (flen >> 3) & 0xFF
        h[5] = ((flen & 7) << 5) | 0x1F  # buffer fullness high bits (VBR)
        h[6] = 0xFC | 0  # fullness low + (blocks-1)=0
        out += h
        if crc:
            out += struct.pack(">H", (0xACDC + i) & 0xFFFF)
        out += bytes((i + j) % 253 for j in range(payload_bytes))
    return bytes(out)
