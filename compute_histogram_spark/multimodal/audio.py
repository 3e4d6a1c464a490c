"""REAL audio decode for WAV (RIFF PCM / IEEE-float) — pure stdlib struct
+ numpy, the audio sibling of the PNG codec (binary.py) and the GeoTIFF
reader (geotiff.py). This removes the engine's last decoder stub: WAV is a
chunked container with raw samples, fully parseable without any codec
library. Compressed formats (MP3/AAC/OGG/FLAC) genuinely need codecs the
container lacks; those still raise with a clear message.

Supported: RIFF/WAVE with fmt tags 1 (integer PCM: u8, i16, i24, i32) and
3 (float32/64), any channel count, chunk order per spec (fmt before data,
unknown chunks skipped). ``WAVE_FORMAT_EXTENSIBLE`` (tag 0xFFFE) resolves
through its SubFormat GUID.

Spark side: :func:`extract_audio_features` follows the module's kernel
pattern — Arrow-batched ``mapInPandas``, per-row decode inside the scan
stage's task, features projected out before any shuffle, a bad payload
yields ``decoded=false`` instead of poisoning the batch.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

RIFF_MAGIC = b"RIFF"

_PCM_DTYPES = {8: np.uint8, 16: np.int16, 32: np.int32}
_FLOAT_DTYPES = {32: np.float32, 64: np.float64}
# first two bytes of the EXTENSIBLE SubFormat GUID
_GUID_PCM, _GUID_FLOAT = 1, 3


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """-> (samples ``[n_frames, n_channels]`` as float64 in [-1, 1],
    sample_rate). Integer PCM is scaled by its full-scale value; float PCM
    passes through."""
    if content[:4] != RIFF_MAGIC or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos, end = 12, min(len(content), 8 + struct.unpack_from("<I", content, 4)[0])
    fmt = None
    data = None
    while pos + 8 <= end:
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            tag, n_ch, rate, _br, block, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag == 0xFFFE:  # EXTENSIBLE: real format is in the GUID
                if size < 40:
                    raise ValueError("malformed EXTENSIBLE fmt chunk")
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, n_ch, rate, block, bits)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    tag, n_ch, rate, _block, bits = fmt
    if tag == _GUID_PCM:
        if bits == 24:  # no i24 dtype: widen via byte padding
            b = np.frombuffer(data, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3)
            widened = np.zeros((b.shape[0], 4), dtype=np.uint8)
            widened[:, 1:] = b
            x = widened.view("<i4").ravel().astype(np.float64) / 2**31
        elif bits in _PCM_DTYPES:
            raw = np.frombuffer(data, dtype=np.dtype(_PCM_DTYPES[bits]).newbyteorder("<"))
            if bits == 8:  # u8 WAV is offset-binary
                x = (raw.astype(np.float64) - 128.0) / 128.0
            else:
                x = raw.astype(np.float64) / float(2 ** (bits - 1))
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _GUID_FLOAT:
        if bits not in _FLOAT_DTYPES:
            raise ValueError(f"unsupported float bit depth {bits}")
        x = np.frombuffer(
            data, dtype=np.dtype(_FLOAT_DTYPES[bits]).newbyteorder("<")
        ).astype(np.float64)
    else:
        raise ValueError(
            f"WAV format tag {tag} needs a codec library (only PCM/float "
            "decode without one)"
        )
    n = len(x) - len(x) % n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_wav(samples, sample_rate: int, bits: int = 16) -> bytes:
    """Minimal PCM/float WAV writer for fixtures and round-trip proof.
    ``bits``: 16/32 -> integer PCM, -32/-64 -> IEEE float."""
    a = np.asarray(samples, dtype=np.float64)
    if a.ndim == 1:
        a = a[:, None]
    n_ch = a.shape[1]
    if bits > 0:
        dt = np.dtype(_PCM_DTYPES[bits]).newbyteorder("<")
        full = float(2 ** (bits - 1))
        data = np.clip(np.round(a * full), -full, full - 1).astype(dt).tobytes()
        tag = 1
    else:
        bits = -bits
        dt = np.dtype(_FLOAT_DTYPES[bits]).newbyteorder("<")
        data = a.astype(dt).tobytes()
        tag = 3
    block = n_ch * bits // 8
    fmt = struct.pack(
        "<HHIIHH", tag, n_ch, sample_rate, sample_rate * block, block, bits
    )
    chunks = b"".join(
        struct.pack("<4sI", cid, len(body)) + body + (b"\x00" * (len(body) & 1))
        for cid, body in ((b"fmt ", fmt), (b"data", data))
    )
    return RIFF_MAGIC + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


AUDIO_FEATURE_SCHEMA = (
    "asset_id BIGINT, sample_rate INT, n_channels INT, n_frames BIGINT, "
    "duration_s DOUBLE, rms DOUBLE, peak DOUBLE, decoded BOOLEAN"
)


def extract_audio_features(assets: DataFrame) -> DataFrame:
    """Per-asset audio features via Arrow-batched ``mapInPandas``: REAL
    decode for WAV and FLAC payloads, ``decoded=false`` passthrough
    otherwise. rms/peak are over all channels; payload bytes never cross a
    shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from compute_histogram_spark.multimodal.audio import decode_wav
        from compute_histogram_spark.multimodal.flac import (
            FLAC_MAGIC,
            decode_flac,
        )

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                try:
                    if content[:4] == FLAC_MAGIC:
                        x, rate = decode_flac(content)
                    else:
                        x, rate = decode_wav(content)
                    n, c = x.shape
                    rows.append(
                        (row.asset_id, rate, c, n, n / rate,
                         float(np.sqrt((x ** 2).mean())) if n else 0.0,
                         float(np.abs(x).max()) if n else 0.0, True)
                    )
                except Exception:
                    rows.append(
                        (row.asset_id, None, None, None, None, None, None,
                         False)
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "sample_rate", "n_channels", "n_frames",
                         "duration_s", "rms", "peak", "decoded"],
            )

    return assets.where(F.col("kind") == "audio").mapInPandas(
        kernel, AUDIO_FEATURE_SCHEMA
    )
