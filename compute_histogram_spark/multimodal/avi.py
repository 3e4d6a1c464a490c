"""REAL video frame decode — MJPEG-in-AVI, pure stdlib + the repo's own
baseline JPEG codec.

Until now "video" was the one modality whose frame decode was a
deterministic fake (binary.py:sample_frames hashes byte slices): H.264/
AV1 genuinely need codec libraries the container lacks. Motion-JPEG
doesn't — every frame is an independent baseline JPEG (multimodal/
jpeg.py), and the AVI container is RIFF, the same chunk grammar the WAV
reader already parses (multimodal/audio.py). So MJPEG/AVI closes the
honesty gap for a real (if old-school) video format: surveillance,
capture cards, and OpenCV's default writer still emit it.

Container coverage:
- RIFF 'AVI ' with 'hdrl' (avih main header + one 'vids' stream: strh +
  BITMAPINFOHEADER strf), 'movi' LIST, optional 'idx1' index;
- frame chunks '00dc'/'00db' (compressed/uncompressed video for stream
  0), odd-length chunk padding, nested 'rec ' LISTs;
- strict rejection: truncated chunks raise; a declared frame count is
  validated against the movi payload size before any per-frame work
  (the corrupt-dimension lesson from geotiff.py), and each frame's JPEG
  decode enforces its own entropy-budget guard.

The fixture encoder writes spec-conformant MJPEG AVIs (header geometry,
fps as rate/scale, keyframe idx1 entries, even-padded chunks) so frame
extraction is round-trip-provable under the JPEG quality tolerance.

Scale shape: identical to the raster scan — decode is a per-file kernel
inside Arrow ``mapInPandas`` tasks (binary.py:sample_video_frames), one
output row per SAMPLED frame, so the expensive full-rate decode is
skipped for stride > 1 by seeking chunk-to-chunk without Huffman work.
Reference parity: the reference treats assets as opaque blobs
(main.py:86-99); frame decode is north-star surface beyond it.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from compute_histogram_spark.multimodal.jpeg import decode_jpeg


def _u32(b: bytes, off: int) -> int:
    if off + 4 > len(b):
        raise ValueError("malformed AVI: truncated")
    return struct.unpack_from("<I", b, off)[0]


def _walk_chunks(content: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) for each chunk in
    [start, end); LIST chunks yield as ('LIST:<type>', body_start, size)."""
    pos = start
    while pos + 8 <= end:
        fourcc = content[pos : pos + 4]
        size = _u32(content, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError("malformed AVI: chunk beyond container")
        if fourcc == b"LIST":
            ltype = content[body : body + 4]
            yield (b"LIST:" + ltype, body + 4, size - 4)
        else:
            yield (fourcc, body, size)
        pos = body + size + (size & 1)  # chunks are word-aligned


def avi_info(content: bytes) -> dict:
    """Header-only metadata: dims, fps, frame count, codec fourcc — no
    frame decode (the cheap path extract_features uses)."""
    if (
        len(content) < 12
        or content[:4] != b"RIFF"
        or content[8:12] != b"AVI "
    ):
        raise ValueError("not an AVI")
    riff_end = min(8 + _u32(content, 4), len(content))
    info: dict = {}
    for fourcc, off, size in _walk_chunks(content, 12, riff_end):
        if fourcc != b"LIST:hdrl":
            continue
        for f2, o2, s2 in _walk_chunks(content, off, off + size):
            if f2 == b"avih":
                if s2 < 40:
                    raise ValueError("malformed AVI: short avih")
                us_per_frame = _u32(content, o2)
                info["n_frames"] = _u32(content, o2 + 16)
                info["width"] = _u32(content, o2 + 32)
                info["height"] = _u32(content, o2 + 36)
                info["fps"] = (
                    round(1_000_000 / us_per_frame, 3) if us_per_frame else 0.0
                )
            elif f2 == b"LIST:strl":
                for f3, o3, s3 in _walk_chunks(content, o2, o2 + s2):
                    if f3 == b"strh" and s3 >= 8:
                        if content[o3 : o3 + 4] == b"vids":
                            info["codec"] = (
                                content[o3 + 4 : o3 + 8].decode("latin-1")
                            )
        break
    if "width" not in info:
        raise ValueError("malformed AVI: missing avih header")
    return info


def _movi_bounds(content: bytes) -> tuple[int, int]:
    riff_end = min(8 + _u32(content, 4), len(content))
    for fourcc, off, size in _walk_chunks(content, 12, riff_end):
        if fourcc == b"LIST:movi":
            return off, off + size
    raise ValueError("malformed AVI: missing movi list")


def iter_frames(
    content: bytes, every: int = 1, max_frames: int | None = None
) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_idx, pixel array) for every ``every``-th video frame
    of stream 0. Skipped frames are never Huffman-decoded — the walk
    seeks chunk-to-chunk, so stride sampling costs O(sampled frames)."""
    if every < 1:
        raise ValueError("every must be >= 1")
    info = avi_info(content)
    lo, hi = _movi_bounds(content)
    # sanity-check the DECLARED frame count against the movi payload
    # (every chunk costs at least an 8-byte header + SOI/EOI markers; use a
    # conservative 16-byte floor). Iteration itself is bounded by the
    # actual chunks present and each frame by the JPEG entropy-budget
    # guard, so this only rejects metadata lies early and loudly.
    if info.get("n_frames", 0) > max((hi - lo) // 16, 1):
        raise ValueError(
            "malformed AVI: frame count inconsistent with movi size"
        )
    idx = 0
    emitted = 0

    def chunks(start, end):
        for fourcc, off, size in _walk_chunks(content, start, end):
            if fourcc == b"LIST:rec ":
                yield from chunks(off, off + size)
            else:
                yield fourcc, off, size

    for fourcc, off, size in chunks(lo, hi):
        if fourcc not in (b"00dc", b"00db"):
            continue
        if idx % every == 0:
            if max_frames is not None and emitted >= max_frames:
                return
            payload = content[off : off + size]
            px = decode_jpeg(payload)
            yield idx, px
            emitted += 1
        idx += 1


def encode_avi_mjpeg(
    frames, fps: float = 30.0, quality: int = 85
) -> bytes:
    """Spec-conformant MJPEG AVI writer — the fixture side proving
    :func:`iter_frames` by round trip. ``frames``: iterable of uint8
    (h, w) or (h, w, 3) arrays, all the same shape."""
    from compute_histogram_spark.multimodal.jpeg import encode_jpeg_baseline

    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("frames disagree on dimensions")
    if fps <= 0:
        raise ValueError("fps must be positive")
    payloads = [encode_jpeg_baseline(f, quality=quality) for f in frames]

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = int(round(1_000_000 / fps))
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        us_per_frame,          # dwMicroSecPerFrame
        max_bytes * int(fps) if fps >= 1 else max_bytes,  # dwMaxBytesPerSec
        0,                     # dwPaddingGranularity
        0x10,                  # dwFlags: AVIF_HASINDEX
        len(frames),           # dwTotalFrames
        0,                     # dwInitialFrames
        1,                     # dwStreams
        max_bytes,             # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,            # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0,              # dwFlags
            0,              # wPriority + wLanguage
            0,              # dwInitialFrames
            1,              # dwScale
            max(int(round(fps)), 1),  # dwRate (fps = rate/scale)
            0,              # dwStart
            len(frames),    # dwLength
            max_bytes,      # dwSuggestedBufferSize
            0xFFFFFFFF,     # dwQuality (default)
            0,              # dwSampleSize (varies per frame)
            0, 0, w, h,     # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,                # biSize
        w,
        h,
        1,                 # biPlanes
        24,                # biBitCount
        b"MJPG",           # biCompression
        w * h * 3,         # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    idx_entries = []
    for p in payloads:
        # idx1 offsets are measured from the start of the 'movi' fourcc
        idx_entries.append((4 + len(movi_body), len(p)))
        movi_body += chunk(b"00dc", p)
    movi = lst(b"movi", bytes(movi_body))
    idx1 = b"".join(
        b"00dc" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
        for off, size in idx_entries
    )
    body = hdrl + movi + chunk(b"idx1", idx1)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body


def video_frame_stats(content: bytes, every: int = 1,
                      max_frames: int | None = None) -> Iterator[tuple]:
    """Yield (frame_idx, width, height, mean_luma) per sampled frame — the
    per-file kernel binary.py:sample_video_frames ships to executors.

    A GENERATOR, not a list, so a clip that corrupts mid-file still
    delivers its already-decoded frames to the caller before the decode
    error surfaces (callers keep the good frames and mark only zero-frame
    files as undecodable)."""
    for idx, px in iter_frames(content, every=every, max_frames=max_frames):
        if px.ndim == 3:
            luma = (
                0.299 * px[:, :, 0].astype(np.float64)
                + 0.587 * px[:, :, 1]
                + 0.114 * px[:, :, 2]
            )
        else:
            luma = px.astype(np.float64)
        yield (idx, px.shape[1], px.shape[0], float(luma.mean()))
