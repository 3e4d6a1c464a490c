"""Ogg container parsing (RFC 3533) + Vorbis/Opus identification headers —
metadata only, same honest boundary as mp3.py/aac.py: the page transport,
its CRC, and the codec ID headers are small public structures; the audio
payload decode (Vorbis codebooks / SILK+CELT) stays out.

Coverage: page walk with structure-version/flag checks and FULL CRC-32
verification (the Ogg polynomial 0x04C11DB7, zero init, no reflection,
CRC field zeroed during computation), BOS codec detection, Vorbis ID
header (channels, rate, bitrate fields), Opus ID header (OpusHead:
channel count, pre-skip, input rate), duration from the last page's
granule position (Vorbis: samples at the stream rate; Opus: 48 kHz
samples minus pre-skip per RFC 7845).
"""

from __future__ import annotations

import struct

OGG_MAGIC = b"OggS"

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if _r & 0x80000000 \
            else (_r << 1) & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) & 0xFF) ^ byte]
    return crc


class OggPage:
    __slots__ = (
        "header_type", "granule", "serial", "seq", "segments", "payload",
        "size",
    )

    def __init__(self, b: bytes, pos: int):
        if b[pos:pos + 4] != OGG_MAGIC:
            raise ValueError("malformed Ogg: lost page sync")
        if pos + 27 > len(b):
            raise ValueError("malformed Ogg: truncated page header")
        version, htype = b[pos + 4], b[pos + 5]
        if version != 0:
            raise ValueError("malformed Ogg: unknown structure version")
        (granule,) = struct.unpack_from("<q", b, pos + 6)
        serial, seq, crc = struct.unpack_from("<III", b, pos + 14)
        n_seg = b[pos + 26]
        if pos + 27 + n_seg > len(b):
            raise ValueError("malformed Ogg: truncated segment table")
        lacing = b[pos + 27:pos + 27 + n_seg]
        body_len = sum(lacing)
        end = pos + 27 + n_seg + body_len
        if end > len(b):
            raise ValueError("malformed Ogg: truncated page body")
        page = bytearray(b[pos:end])
        page[22:26] = b"\x00\x00\x00\x00"
        if _ogg_crc(bytes(page)) != crc:
            raise ValueError("malformed Ogg: page CRC mismatch")
        self.header_type = htype
        self.granule = granule
        self.serial = serial
        self.seq = seq
        self.segments = list(lacing)
        self.payload = b[pos + 27 + n_seg:end]
        self.size = end - pos


def _parse_vorbis_id(p: bytes) -> dict:
    # 1-byte type 1 + "vorbis" + version u32 + channels u8 + rate u32 +
    # bitrate max/nominal/min s32 + blocksizes + framing
    if len(p) < 30:
        raise ValueError("malformed Vorbis ID header")
    version, channels, rate = struct.unpack_from("<IBI", p, 7)
    if version != 0 or channels == 0 or rate == 0:
        raise ValueError("malformed Vorbis ID header")
    nominal = struct.unpack_from("<i", p, 20)[0]
    return {
        "codec": "vorbis",
        "n_channels": channels,
        "sample_rate": rate,
        "nominal_bitrate": nominal if nominal > 0 else None,
    }


def _parse_opus_head(p: bytes) -> dict:
    # "OpusHead" + version u8 + channels u8 + preskip u16 + input rate u32
    if len(p) < 19:
        raise ValueError("malformed OpusHead")
    version, channels = p[8], p[9]
    if version >> 4 != 0 or channels == 0:  # major version must be 0
        raise ValueError("malformed OpusHead")
    preskip, in_rate = struct.unpack_from("<HI", p, 10)
    return {
        "codec": "opus",
        "n_channels": channels,
        "sample_rate": 48000,  # Opus always decodes at 48 kHz
        "input_sample_rate": in_rate,
        "pre_skip": preskip,
    }


def ogg_info(content: bytes) -> dict:
    """Walk all pages of the FIRST logical stream -> codec metadata +
    duration. Raises ValueError on malformed input (CRC-verified)."""
    if not content.startswith(OGG_MAGIC):
        raise ValueError("not an Ogg stream")
    pos = 0
    first: OggPage | None = None
    last_granule = 0
    n_pages = 0
    serial = None
    meta: dict | None = None
    while pos < len(content):
        page = OggPage(content, pos)
        if first is None:
            if not page.header_type & 0x02:
                raise ValueError("malformed Ogg: first page is not BOS")
            first = page
            serial = page.serial
            p = page.payload
            if p[:7] == b"\x01vorbis":
                meta = _parse_vorbis_id(p)
            elif p[:8] == b"OpusHead":
                meta = _parse_opus_head(p)
            else:
                meta = {"codec": "unknown", "n_channels": None,
                        "sample_rate": None}
        if page.serial == serial and page.granule >= 0:
            last_granule = max(last_granule, page.granule)
        n_pages += 1
        pos += page.size
    assert meta is not None
    out = dict(meta)
    out["n_pages"] = n_pages
    if meta["codec"] == "vorbis":
        out["n_samples"] = last_granule
        out["duration_s"] = last_granule / meta["sample_rate"]
    elif meta["codec"] == "opus":
        samples = max(0, last_granule - meta["pre_skip"])
        out["n_samples"] = samples
        out["duration_s"] = samples / 48000
    else:
        out["n_samples"] = None
        out["duration_s"] = None
    return out


# ------------------------------------------------------------- fixtures


def _page(payload: bytes, granule: int, serial: int, seq: int,
          htype: int) -> bytes:
    # lacing: 255-splits, with a terminating short lace
    lacing = []
    rest = len(payload)
    while rest >= 255:
        lacing.append(255)
        rest -= 255
    lacing.append(rest)
    head = bytearray(b"OggS\x00")
    head.append(htype)
    head += struct.pack("<q", granule)
    head += struct.pack("<III", serial, seq, 0)
    head.append(len(lacing))
    head += bytes(lacing)
    page = bytes(head) + payload
    crc = _ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def build_ogg_vorbis(
    sample_rate: int = 44100,
    channels: int = 2,
    n_samples: int = 44100,
    n_audio_pages: int = 4,
    serial: int = 0x1234,
) -> bytes:
    """Structurally valid Ogg stream with a real Vorbis ID header and
    dummy audio pages (fixture for the container walker)."""
    ident = (b"\x01vorbis" + struct.pack("<IBI", 0, channels, sample_rate)
             + struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01")
    out = bytearray(_page(ident, 0, serial, 0, 0x02))
    for i in range(n_audio_pages):
        gran = n_samples * (i + 1) // n_audio_pages
        htype = 0x04 if i == n_audio_pages - 1 else 0
        body = bytes((i + j) % 250 for j in range(300 + 255 * (i % 2)))
        out += _page(body, gran, serial, i + 1, htype)
    return bytes(out)


def build_ogg_opus(
    channels: int = 2,
    pre_skip: int = 312,
    n_samples_48k: int = 48000,
    input_rate: int = 44100,
    n_audio_pages: int = 3,
    serial: int = 0xBEEF,
) -> bytes:
    head = (b"OpusHead" + bytes((1, channels))
            + struct.pack("<HI", pre_skip, input_rate)
            + struct.pack("<h", 0) + b"\x00")
    out = bytearray(_page(head, 0, serial, 0, 0x02))
    total = pre_skip + n_samples_48k
    for i in range(n_audio_pages):
        gran = total * (i + 1) // n_audio_pages
        htype = 0x04 if i == n_audio_pages - 1 else 0
        body = bytes((i * 3 + j) % 249 for j in range(200))
        out += _page(body, gran, serial, i + 1, htype)
    return bytes(out)
