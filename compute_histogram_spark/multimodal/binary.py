"""Multimodal (image/audio/video) columns as opaque BINARY + typed metadata.

The Spark-side plumbing is real: schemas, Arrow-batched ``mapInPandas``
kernels, partition-preserving feature extraction, frame-sampling explosion.
The *decoders* are stubs — the container has no image/audio libraries — so
``decode_image`` tries Pillow and otherwise falls back to a clearly-marked
deterministic fake (derived from the byte content, so tests are stable).
Swapping the fake for a real decoder changes only the inner function; the
distributed plan (batch iteration, schema, partitioning) is unchanged.

Scale notes: mapInPandas streams Arrow batches — one batch in memory per
task, never the whole partition; binary payloads never pass through a
shuffle (feature extraction projects them away first); at 100 TB the asset
table is stored with payloads in their own parquet column (column pruning
skips them unless the kernel asks).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_SCHEMA = (
    "asset_id BIGINT, kind STRING, content BINARY, source STRING"
)

FEATURE_SCHEMA = (
    "asset_id BIGINT, kind STRING, n_bytes BIGINT, sha256 STRING, "
    "width INT, height INT, n_channels INT"
)

FRAME_SCHEMA = "asset_id BIGINT, frame_idx INT, frame_sha256 STRING, n_bytes BIGINT"


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic asset table derived from ``documents``: the UTF-8 bytes
    of each text as an opaque 'image' payload. Stands in for a real
    (asset_id, kind, content, source) landing table so the multimodal path
    has a driver-checkable query; schema/plumbing identical to real assets.
    """
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.col("source"),
    )


def _try_real_image_decode(content: bytes) -> tuple[int, int, int] | None:
    """Real decode path, gated on Pillow being installed."""
    try:
        from PIL import Image  # noqa: PLC0415
        import io  # noqa: PLC0415
    except ImportError:
        return None
    img = Image.open(io.BytesIO(content))
    return img.width, img.height, len(img.getbands())


def decode_image(content: bytes) -> tuple[int, int, int]:
    """(width, height, channels). DETERMINISTIC FAKE when Pillow is absent:
    dimensions derived from the content digest — stable, content-addressed,
    clearly not a real decode."""
    real = _try_real_image_decode(content)
    if real is not None:
        return real
    d = hashlib.sha256(content).digest()
    return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 3


def decode_audio(content: bytes) -> Any:
    """Real audio decode requires a codec library not present here."""
    raise NotImplementedError(
        "audio decode needs soundfile/librosa; plumbing is ready — plug the "
        "decoder into extract_features' kernel"
    )


def extract_features(assets: DataFrame) -> DataFrame:
    """Per-asset features via Arrow-batched mapInPandas.

    The kernel is fully self-contained (local imports, no references to this
    module) so cloudpickle ships it BY VALUE: executors never need the
    engine package on their PYTHONPATH — required for remote clusters where
    only the driver has the repo checkout.

    Arrow batch sizing comes from the session conf
    ``spark.sql.execution.arrow.maxRecordsPerBatch`` — it is read at JOB
    time, so setting it here and restoring before returning the (lazy)
    DataFrame would be a no-op; size it where the job runs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # local: keep the closure self-contained

        def fake_decode(content: bytes) -> tuple[int, int, int]:
            try:
                from PIL import Image
                import io

                img = Image.open(io.BytesIO(content))
                return img.width, img.height, len(img.getbands())
            except ImportError:
                d = hashlib.sha256(content).digest()
                return 16 + d[0] % 240, 16 + d[1] % 240, 1 + d[2] % 3

        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                w, h, c = fake_decode(content) if row.kind == "image" else (0, 0, 0)
                out.append(
                    (
                        row.asset_id,
                        row.kind,
                        len(content),
                        hashlib.sha256(content).hexdigest(),
                        w,
                        h,
                        c,
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "asset_id",
                    "kind",
                    "n_bytes",
                    "sha256",
                    "width",
                    "height",
                    "n_channels",
                ],
            )

    return assets.mapInPandas(kernel, FEATURE_SCHEMA)


def sample_frames(assets: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Video' frame sampling: one output row per sampled chunk — the
    row-explosion shape of real frame extraction, with a byte-slice standing
    in for codec-decoded frames."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib  # local: keep the closure self-contained

        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                content = bytes(row.content)
                for i, off in enumerate(range(0, len(content), every_n_bytes)):
                    chunk = content[off : off + every_n_bytes]
                    rows.append(
                        (row.asset_id, i, hashlib.sha256(chunk).hexdigest(), len(chunk))
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_sha256", "n_bytes"]
            )

    return assets.where(F.col("kind") == "video").mapInPandas(kernel, FRAME_SCHEMA)
