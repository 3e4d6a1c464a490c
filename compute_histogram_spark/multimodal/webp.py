"""REAL WebP container/metadata parsing (RIFF walk + VP8/VP8L/VP8X
headers) — the mp3.py treatment applied to the last common crawl image
format: dimensions, variant, and alpha flag are small public facts of
the container (RFC 9649 container spec; RFC 6386 frame header), parsed
by in-repo code; PIXEL decode stays honestly gated — lossy WebP's VP8
boolean-arithmetic entropy layer runs on ~2k empirically-specified
per-context probability tables (the MP3-synthesis-window /
H.264-CAVLC non-derivable-constants class; boundary memo in
BASELINE.md r12).

``webp_info`` handles the three stream variants:
- 'VP8 ' lossy: keyframe start code 9d 01 2a, 14-bit width/height;
- 'VP8L' lossless: 0x2f signature, 14-bit minus-one fields + alpha hint;
- 'VP8X' extended: flag byte (alpha bit 0x10) + 24-bit minus-one canvas.

Fixture builders emit all three header forms so the parser is
round-trip-tested without any real encoder in the container.
"""

from __future__ import annotations

import struct


def _chunks(content: bytes):
    """Yield (fourcc, payload) over a RIFF/WEBP body; odd sizes padded."""
    pos = 12
    n = len(content)
    while pos + 8 <= n:
        fourcc = content[pos:pos + 4]
        (size,) = struct.unpack_from("<I", content, pos + 4)
        payload = content[pos + 8:pos + 8 + size]
        yield fourcc, payload
        pos += 8 + size + (size & 1)


def webp_info(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the first decodable stream chunk."""
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    for fourcc, p in _chunks(content):
        if fourcc == b"VP8X" and len(p) >= 10:
            alpha = bool(p[0] & 0x10)
            w = 1 + (p[4] | p[5] << 8 | p[6] << 16)
            h = 1 + (p[7] | p[8] << 8 | p[9] << 16)
            return w, h, 4 if alpha else 3
        if fourcc == b"VP8L" and len(p) >= 5 and p[0] == 0x2F:
            (bits,) = struct.unpack_from("<I", p, 1)
            w = 1 + (bits & 0x3FFF)
            h = 1 + ((bits >> 14) & 0x3FFF)
            alpha = bool((bits >> 28) & 1)
            return w, h, 4 if alpha else 3
        if fourcc == b"VP8 " and len(p) >= 10:
            # 3-byte frame tag; keyframe iff lowest bit of byte 0 is 0
            if p[0] & 1:
                continue  # interframe carries no dimensions
            if p[3:6] != b"\x9d\x01\x2a":
                continue
            (w16,) = struct.unpack_from("<H", p, 6)
            (h16,) = struct.unpack_from("<H", p, 8)
            return w16 & 0x3FFF, h16 & 0x3FFF, 3
    raise ValueError("no decodable VP8/VP8L/VP8X chunk")


# ------------------------------------------------------------- fixtures


def _riff(*chunks: tuple[bytes, bytes]) -> bytes:
    body = b"WEBP"
    for fourcc, payload in chunks:
        body += fourcc + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + body


def build_webp_lossy(width: int, height: int) -> bytes:
    """Minimal VP8-keyframe-header fixture (header only, no coefficient
    data — exactly the surface webp_info reads)."""
    p = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a"
    p += struct.pack("<H", width & 0x3FFF) + struct.pack("<H", height & 0x3FFF)
    return _riff((b"VP8 ", p))


def build_webp_lossless(width: int, height: int, alpha: bool = False) -> bytes:
    bits = (width - 1) & 0x3FFF
    bits |= ((height - 1) & 0x3FFF) << 14
    if alpha:
        bits |= 1 << 28
    return _riff((b"VP8L", bytes([0x2F]) + struct.pack("<I", bits)))


def build_webp_extended(width: int, height: int, alpha: bool = False) -> bytes:
    flags = 0x10 if alpha else 0
    p = bytes([flags, 0, 0, 0])
    p += struct.pack("<I", width - 1)[:3] + struct.pack("<I", height - 1)[:3]
    return _riff((b"VP8X", p))
