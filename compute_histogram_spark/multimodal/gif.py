"""REAL GIF and BMP decode — pure stdlib + numpy, no codec library.

The last two Pillow-gated image paths go native: GIF (LZW with variable
code width, the LSB-first twin of the TIFF LZW already in geotiff.py)
and BMP (the trivial one — padded BGR rows). With these, EVERY image
format the engine claims is decoded by its own code: PNG, JPEG
(baseline + progressive), TIFF/GeoTIFF (incl. JPEG-in-TIFF), GIF, BMP.

GIF coverage: 87a/89a headers, global + local color tables, extension
blocks skipped, the FIRST image frame decoded (animation = return the
poster frame; per-frame iteration belongs to the video surface,
multimodal/avi.py), interlaced row order, full LZW (clear/EOI codes,
table growth to 12 bits, deferred clears). BMP coverage: BITMAPINFO
uncompressed 8-bit palette / 24-bit / 32-bit, bottom-up and top-down.

Fixture encoders: a REAL GIF LZW compressor (hash-dict longest-match,
so decode's table-growth path is round-trip-proven, not just the
root-code path) and a 24-bit BMP writer. Both lossless — round trips
are exact-equality tests.
"""

from __future__ import annotations

import struct

import numpy as np


# ----------------------------------------------------------------- GIF


class _LSBReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            if (p >> 3) >= len(self.data):
                raise ValueError("malformed GIF: LZW data truncated")
            v |= ((self.data[p >> 3] >> (p & 7)) & 1) << i
        self.pos += n
        return v


def _gif_lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    """GIF-variant LZW (LSB-first, variable width, clear/EOI)."""
    if not 2 <= min_code_size <= 8:
        raise ValueError(f"malformed GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _LSBReader(data)
    out = bytearray()

    def reset():
        table = [bytes([i]) for i in range(clear)] + [b"", b""]
        return table, min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = rd.read(width)
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
            if code < clear:
                pass
            elif not entry:
                raise ValueError("malformed GIF: reference to empty code")
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("malformed GIF: LZW code out of range")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return bytes(out[:n_pixels])


def _read_subblocks(content: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(content):
            raise ValueError("malformed GIF: truncated sub-blocks")
        n = content[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        if pos + n > len(content):
            raise ValueError("malformed GIF: truncated sub-blocks")
        out += content[pos : pos + n]
        pos += n


def gif_info(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels) from the logical screen descriptor."""
    if len(content) < 13 or content[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", content, 6)
    if w == 0 or h == 0:
        raise ValueError("malformed GIF: zero dimension")
    return w, h, 3


def decode_gif(content: bytes) -> np.ndarray:
    """First frame -> uint8 (h, w, 3) RGB."""
    w, h, _ = gif_info(content)
    flags = content[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = content[pos : pos + 3 * n]
        if len(raw) < 3 * n:  # before reshape: slice may not be 3-aligned
            raise ValueError("malformed GIF: truncated color table")
        gct = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(content):
        b = content[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label + sub-blocks
            if pos >= len(content):
                raise ValueError("malformed GIF: truncated extension")
            pos += 1
            _, pos = _read_subblocks(content, pos)
            continue
        if b != 0x2C:
            raise ValueError(f"malformed GIF: unknown block 0x{b:02x}")
        # image descriptor
        if pos + 9 > len(content):
            raise ValueError("malformed GIF: truncated image descriptor")
        left, top, iw, ih = struct.unpack_from("<HHHH", content, pos)
        iflags = content[pos + 8]
        pos += 9
        if iw == 0 or ih == 0 or left + iw > w or top + ih > h:
            raise ValueError("malformed GIF: frame outside logical screen")
        ct = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            raw = content[pos : pos + 3 * n]
            if len(raw) < 3 * n:
                raise ValueError("malformed GIF: truncated color table")
            ct = np.frombuffer(raw, dtype=np.uint8).reshape(n, 3)
            pos += 3 * n
        if ct is None:
            raise ValueError("malformed GIF: no color table")
        if pos >= len(content):
            raise ValueError("malformed GIF: missing LZW code size")
        mcs = content[pos]
        pos += 1
        data, pos = _read_subblocks(content, pos)
        idx = np.frombuffer(
            _gif_lzw_decode(data, mcs, iw * ih), dtype=np.uint8
        )
        if len(idx) < iw * ih:
            raise ValueError("malformed GIF: short pixel data")
        if idx.max() >= len(ct):
            raise ValueError("malformed GIF: palette index out of range")
        grid = idx.reshape(ih, iw)
        if iflags & 0x40:  # interlaced: 4-pass row order
            order = np.concatenate([
                np.arange(0, ih, 8), np.arange(4, ih, 8),
                np.arange(2, ih, 4), np.arange(1, ih, 2),
            ])
            un = np.empty_like(grid)
            un[order] = grid
            grid = un
        frame = ct[grid]  # (ih, iw, 3)
        out = np.zeros((h, w, 3), dtype=np.uint8)
        out[top : top + ih, left : left + iw] = frame
        return out
    raise ValueError("malformed GIF: no image frame")


class _LSBWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.n
        self.n += width
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def flush(self) -> bytes:
        if self.n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _gif_lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """REAL GIF LZW compressor (longest-match dict) — exercises the
    decoder's table growth, width bumps, and 4096-entry clear handling."""
    clear = 1 << min_code_size
    eoi = clear + 1
    wtr = _LSBWriter()

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    wtr.write(clear, width)
    run = b""
    for px in indices:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        wtr.write(table[run], width)
        table[cand] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            wtr.write(clear, width)
            table, next_code, width = reset()
        run = bytes([px])
    if run:
        wtr.write(table[run], width)
    wtr.write(eoi, width)
    return wtr.flush()


def encode_gif(arr: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal GIF89a writer for uint8 (h, w, 3) with <= 256 distinct
    colors (palette built from the data) — the lossless fixture proving
    :func:`decode_gif` by exact round trip."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("need uint8 (h, w, 3)")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("more than 256 distinct colors")
    bits = max(2, int(len(palette) - 1).bit_length())
    n_pal = 1 << bits
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    grid = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate([
            np.arange(0, h, 8), np.arange(4, h, 8),
            np.arange(2, h, 4), np.arange(1, h, 2),
        ])
        grid = grid[order]

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT present, 2^bits entries
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h)
    out += bytes([0x40 if interlace else 0x00])
    mcs = bits
    out += bytes([mcs])
    data = _gif_lzw_encode(grid.tobytes(), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ----------------------------------------------------------------- BMP


def bmp_info(content: bytes) -> tuple[int, int, int]:
    if len(content) < 26 or content[:2] != b"BM":
        raise ValueError("not a BMP")
    w, h = struct.unpack_from("<ii", content, 18)
    if w <= 0 or h == 0:
        raise ValueError("malformed BMP: bad dimensions")
    # channels reports the DECODED shape: decode_bmp always expands the
    # palette to (h, w, 3) RGB, so 8-bit palette files are 3, not 1 —
    # keeps metadata consistent with extract_pixel_stats on the same asset
    return w, abs(h), 3


def decode_bmp(content: bytes) -> np.ndarray:
    """Uncompressed BITMAPINFO BMP -> uint8 (h, w, 3); 8-bit palette,
    24-bit BGR, 32-bit BGRA (alpha dropped); bottom-up or top-down."""
    if len(content) < 54 or content[:2] != b"BM":
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack_from("<I", content, 10)
    (hdr_size,) = struct.unpack_from("<I", content, 14)
    if hdr_size < 40:
        raise ValueError("unsupported BMP: pre-BITMAPINFO header")
    w, h_signed = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    (comp,) = struct.unpack_from("<I", content, 30)
    if w <= 0 or h_signed == 0:
        raise ValueError("malformed BMP: bad dimensions")
    if comp not in (0, 3) or bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP: compression {comp} bpp {bpp}")
    if comp == 3:
        # BI_BITFIELDS: only the standard BGR(A) masks decode — anything
        # else would silently swap channels; masks live in the header
        # (BITMAPV2+) or right after a 40-byte BITMAPINFOHEADER
        if bpp != 32:
            raise ValueError("unsupported BMP: BI_BITFIELDS needs 32 bpp")
        mask_off = 54 if hdr_size == 40 else 14 + 40
        if mask_off + 12 > len(content):
            raise ValueError("malformed BMP: missing BI_BITFIELDS masks")
        r_m, g_m, b_m = struct.unpack_from("<III", content, mask_off)
        if (r_m, g_m, b_m) != (0x00FF0000, 0x0000FF00, 0x000000FF):
            raise ValueError(
                "unsupported BMP: non-BGRA BI_BITFIELDS masks "
                f"({r_m:#010x}, {g_m:#010x}, {b_m:#010x})"
            )
    h = abs(h_signed)
    row_bytes = (w * bpp // 8 + 3) & ~3
    if data_off + row_bytes * h > len(content):
        raise ValueError("malformed BMP: pixel data beyond end of file")
    rows = np.frombuffer(
        content[data_off : data_off + row_bytes * h], dtype=np.uint8
    ).reshape(h, row_bytes)
    if bpp == 8:
        n_colors = struct.unpack_from("<I", content, 46)[0] or 256
        pal_off = 14 + hdr_size
        raw = content[pal_off : pal_off + 4 * n_colors]
        if len(raw) < 4 * n_colors:  # before reshape: may not be 4-aligned
            raise ValueError("malformed BMP: truncated palette")
        pal = np.frombuffer(raw, dtype=np.uint8).reshape(n_colors, 4)
        idx = rows[:, :w]
        if idx.max() >= n_colors:
            raise ValueError("malformed BMP: palette index out of range")
        px = pal[idx][:, :, [2, 1, 0]]  # BGRA palette -> RGB
    else:
        step = bpp // 8
        px = rows[:, : w * step].reshape(h, w, step)[:, :, [2, 1, 0]]
    if h_signed > 0:
        px = px[::-1]  # bottom-up storage
    return np.ascontiguousarray(px)


def encode_bmp(arr: np.ndarray) -> bytes:
    """24-bit uncompressed bottom-up BMP writer (lossless fixture)."""
    a = np.asarray(arr)
    if a.dtype != np.uint8 or a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("need uint8 (h, w, 3)")
    h, w = a.shape[:2]
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    body[:, : w * 3] = a[::-1, :, [2, 1, 0]].reshape(h, w * 3)
    data = body.tobytes()
    hdr = b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                       2835, 2835, 0, 0)
    return hdr + info + data
