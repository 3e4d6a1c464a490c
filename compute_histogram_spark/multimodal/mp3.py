"""MP3 (MPEG-1/2/2.5 Layers I-III) frame-HEADER parsing + ID3 handling.

METADATA ONLY, deliberately: sample rate, channel count, frame walk,
sample-exact duration, CBR/VBR detection (including the Xing/Info VBR
header), ID3v2 skip and trailing ID3v1 tolerance. The header structure,
bitrate/sample-rate tables and frame-length formulas are small, fully
public facts (ISO/IEC 11172-3 / 13818-3 frame syntax); the AUDIO decode
(Huffman tables, IMDCT, synthesis window) needs spec tables this
container cannot reconstruct and still raises in
``binary.py:decode_audio`` — an encoder/decoder pair with invented
tables would round-trip internally yet fail on every real MP3, which is
worse than the honest boundary (BASELINE.md r9).

Used by ``audio.py:extract_audio_features``: MP3 assets report real
header metadata (rate/channels/frames/duration) with ``decoded=false``
and null PCM-derived features — the Spark-side plumbing is identical to
the decoded formats.
"""

from __future__ import annotations

import struct

# header: AAAAAAAA AAABBCCD EEEEFFGH IIJJKLMM
# A sync, B version, C layer, D !crc, E bitrate idx, F samplerate idx,
# G padding, H private, I channel mode, J mode ext, K copyright,
# L original, M emphasis

_V25, _V2, _V1 = 0, 2, 3  # version field values (1 is reserved)
_L3, _L2, _L1 = 1, 2, 3  # layer field values (0 is reserved)

_VERSION_NAME = {_V1: "MPEG1", _V2: "MPEG2", _V25: "MPEG2.5"}
_LAYER_NAME = {_L1: 1, _L2: 2, _L3: 3}

# bitrate tables, kbit/s, index 1..14 (0 = free format, 15 = invalid)
_BR_V1_L1 = (32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448)
_BR_V1_L2 = (32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384)
_BR_V1_L3 = (32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_BR_V2_L1 = (32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256)
_BR_V2_L23 = (8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)


def _bitrate_table(version: int, layer: int) -> tuple[int, ...]:
    if version == _V1:
        return {_L1: _BR_V1_L1, _L2: _BR_V1_L2, _L3: _BR_V1_L3}[layer]
    return _BR_V2_L1 if layer == _L1 else _BR_V2_L23


_RATES = {
    _V1: (44100, 48000, 32000),
    _V2: (22050, 24000, 16000),
    _V25: (11025, 12000, 8000),
}


def _samples_per_frame(version: int, layer: int) -> int:
    if layer == _L1:
        return 384
    if layer == _L2:
        return 1152
    return 1152 if version == _V1 else 576  # Layer III


class Mp3FrameHeader:
    __slots__ = (
        "version", "layer", "crc", "bitrate_kbps", "sample_rate",
        "padding", "channel_mode", "n_channels", "frame_len",
        "samples", "side_info_len",
    )

    def __init__(self, b: bytes, pos: int):
        if pos + 4 > len(b):
            raise ValueError("malformed MP3: truncated header")
        h = struct.unpack_from(">I", b, pos)[0]
        if (h >> 21) & 0x7FF != 0x7FF:
            raise ValueError("malformed MP3: lost frame sync")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version == 1 or layer == 0:
            raise ValueError("malformed MP3: reserved version/layer")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        if br_idx == 15 or sr_idx == 3:
            raise ValueError("malformed MP3: invalid bitrate/sample-rate")
        if br_idx == 0:
            # frame length is only recoverable by scanning for the next
            # sync word; rare in practice and not needed for fixtures
            raise ValueError("free-format bitrate unsupported")
        self.version = version
        self.layer = layer
        self.crc = (h >> 16) & 1 == 0  # protection bit 0 -> CRC present
        self.bitrate_kbps = _bitrate_table(version, layer)[br_idx - 1]
        self.sample_rate = _RATES[version][sr_idx]
        self.padding = (h >> 9) & 1
        self.channel_mode = (h >> 6) & 3
        self.n_channels = 1 if self.channel_mode == 3 else 2
        self.samples = _samples_per_frame(version, layer)
        br = self.bitrate_kbps * 1000
        if layer == _L1:
            self.frame_len = (12 * br // self.sample_rate + self.padding) * 4
        else:
            self.frame_len = (
                self.samples // 8 * br // self.sample_rate + self.padding
            )
        if version == _V1:
            self.side_info_len = 17 if self.n_channels == 1 else 32
        else:
            self.side_info_len = 9 if self.n_channels == 1 else 17


def id3v2_size(content: bytes) -> int:
    """Total bytes of a leading ID3v2 tag (0 when absent). Size field is
    syncsafe (7 bits per byte); the footer flag adds 10 more bytes."""
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    flags = content[5]
    sz = 0
    for byte in content[6:10]:
        if byte & 0x80:
            raise ValueError("malformed MP3: non-syncsafe ID3v2 size")
        sz = (sz << 7) | byte
    return 10 + sz + (10 if flags & 0x10 else 0)


def _xing_frame_count(content: bytes, pos: int, hdr: Mp3FrameHeader) -> int | None:
    """Frame count from a Xing/Info VBR header in the FIRST frame, when
    present: sits after the side info (and CRC if any)."""
    off = pos + 4 + (2 if hdr.crc else 0) + hdr.side_info_len
    if content[off:off + 4] not in (b"Xing", b"Info"):
        return None
    if off + 12 > len(content):
        raise ValueError("malformed MP3: truncated Xing header")
    flags = struct.unpack_from(">I", content, off + 4)[0]
    if flags & 1:
        return struct.unpack_from(">I", content, off + 8)[0]
    return None


def mp3_info(content: bytes) -> dict:
    """Walk every frame -> header metadata.

    Returns dict(sample_rate, n_channels, n_frames, n_samples,
    duration_s, bitrate_kbps [nominal for CBR, average for VBR],
    vbr bool, version str, layer int). Tolerates a leading ID3v2 tag and
    a trailing 128-byte ID3v1 tag; anything else malformed raises
    ValueError (same error contract as the image parsers)."""
    pos = id3v2_size(content)
    end = len(content)
    if content[end - 128:end - 125] == b"TAG":
        end -= 128
    if pos >= end:
        raise ValueError("malformed MP3: no audio frames")
    first = Mp3FrameHeader(content, pos)
    xing_frames = _xing_frame_count(content, pos, first)
    n_frames = 0
    n_samples = 0
    bitrates = set()
    byte_total = 0
    while pos < end:
        if end - pos < 4:
            raise ValueError("malformed MP3: trailing garbage")
        h = Mp3FrameHeader(content, pos)
        if (h.sample_rate, h.n_channels) != (
            first.sample_rate, first.n_channels
        ):
            raise ValueError("malformed MP3: stream parameters changed")
        if pos + h.frame_len > end:
            raise ValueError("malformed MP3: truncated frame")
        n_frames += 1
        n_samples += h.samples
        bitrates.add(h.bitrate_kbps)
        byte_total += h.frame_len
        pos += h.frame_len
    vbr = len(bitrates) > 1 or xing_frames is not None
    duration = n_samples / first.sample_rate
    if vbr and duration > 0:
        bitrate = round(byte_total * 8 / duration / 1000, 3)
    else:
        bitrate = float(first.bitrate_kbps)
    # Encoders disagree on whether the Xing/Info header frame itself is
    # counted: LAME-style writers exclude it (count = audio frames only),
    # others include it. Both are valid real-world streams — accept the
    # off-by-one and only raise on a genuinely inconsistent index.
    if xing_frames is not None and xing_frames not in (n_frames, n_frames - 1):
        raise ValueError("malformed MP3: Xing frame count mismatch")
    return {
        "sample_rate": first.sample_rate,
        "n_channels": first.n_channels,
        "n_frames": n_frames,
        "n_samples": n_samples,
        "duration_s": duration,
        "bitrate_kbps": bitrate,
        "vbr": vbr,
        "version": _VERSION_NAME[first.version],
        "layer": _LAYER_NAME[first.layer],
    }


# ------------------------------------------------------------- fixtures

_VERSION_FIELD = {"MPEG1": _V1, "MPEG2": _V2, "MPEG2.5": _V25}
_LAYER_FIELD = {1: _L1, 2: _L2, 3: _L3}


def build_mp3(
    version: str = "MPEG1",
    layer: int = 3,
    bitrate_kbps: int = 128,
    sample_rate: int = 44100,
    n_frames: int = 4,
    mono: bool = False,
    crc: bool = False,
    padding_every: int = 0,
    id3v2_bytes: int = 0,
    id3v1: bool = False,
    xing: bool = False,
    per_frame_bitrates: list[int] | None = None,
) -> bytes:
    """Spec-valid frame SEQUENCE with deterministic dummy payloads —
    fixtures for the header walker (the payload is never decoded).
    ``padding_every=k`` sets the padding bit on every k-th frame;
    ``per_frame_bitrates`` builds a VBR stream."""
    v = _VERSION_FIELD[version]
    lay = _LAYER_FIELD[layer]
    if sample_rate not in _RATES[v]:
        raise ValueError(f"sample rate {sample_rate} invalid for {version}")
    sr_idx = _RATES[v].index(sample_rate)
    out = bytearray()
    if id3v2_bytes:
        body = bytes((3 + i) % 128 for i in range(id3v2_bytes))
        sz = len(body)
        out += b"ID3" + bytes((4, 0, 0)) + bytes(
            (sz >> 21 & 0x7F, sz >> 14 & 0x7F, sz >> 7 & 0x7F, sz & 0x7F)
        ) + body
    rates = per_frame_bitrates or [bitrate_kbps] * n_frames
    table = _bitrate_table(v, lay)
    for i, kbps in enumerate(rates):
        if kbps not in table:
            raise ValueError(f"bitrate {kbps} invalid for {version} L{layer}")
        br_idx = table.index(kbps) + 1
        pad = 1 if padding_every and (i + 1) % padding_every == 0 else 0
        h = (
            (0x7FF << 21) | (v << 19) | (lay << 17)
            | ((0 if crc else 1) << 16)
            | (br_idx << 12) | (sr_idx << 10) | (pad << 9)
            | ((3 if mono else 0) << 6)
        )
        hdr_bytes = struct.pack(">I", h)
        fh = Mp3FrameHeader(hdr_bytes, 0)
        body_len = fh.frame_len - 4
        frame = bytearray(hdr_bytes)
        if crc:
            frame += struct.pack(">H", (0xBEEF + i) & 0xFFFF)
            body_len -= 2
        if xing and i == 0:
            side = bytes(body_len)  # zero side info
            frame += side[:fh.side_info_len]
            frame += b"Xing" + struct.pack(">II", 1, len(rates))
            rest = body_len - fh.side_info_len - 12
            frame += bytes((i + j) % 251 for j in range(rest))
        else:
            frame += bytes((i + j) % 251 for j in range(body_len))
        out += frame
    if id3v1:
        out += b"TAG" + bytes(125)
    return bytes(out)
