"""MJPEG video files as a registered Spark SOURCE.

``spark.read.format("mjpegframes").option("path", <file|dir|glob>)``
exposes a directory of MJPEG AVIs (multimodal/avi.py) as a FRAME table
— the Spark-idiomatic face of real video decode: once frames are rows,
every engine operator (windowed aggregation, dedup, similarity,
histogram) applies to video with no new machinery.

Scale shape: one InputPartition per FILE — the natural unit of video
parallelism (a clip decodes sequentially; different clips are
independent), so a directory of 10 000 clips fans out to 10 000 tasks
while each task streams ONE file's frames through the stride-sampling
walk (skipped frames are never Huffman-decoded, avi.py:iter_frames).
The driver lists paths only; bytes are opened executor-side and never
cross a shuffle. Mirrors the tilecatalog source (sources/catalog.py) —
the reference's catalog-scan stage (reference main.py:86-99) — with the
asset payload itself as the scan target.

Options: ``path`` (file, directory, or glob — required), ``every``
(frame stride, default 1), ``maxframes`` (per-file cap, default
unlimited). Undecodable files yield one ``decoded=false`` row instead
of failing the scan (corrupt-input posture shared with the multimodal
kernels).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

FRAME_SCHEMA = (
    "path STRING, frame_idx INT, width INT, height INT, "
    "mean_luma DOUBLE, decoded BOOLEAN"
)


class MJPEGFramesDataSource(DataSource):
    """``spark.read.format("mjpegframes").option("path", ...)``.

    Registration: ``spark.dataSource.register(MJPEGFramesDataSource)``.
    """

    @classmethod
    def name(cls) -> str:
        return "mjpegframes"

    def schema(self) -> str:
        return FRAME_SCHEMA

    def reader(self, schema):  # noqa: ANN001 — framework signature
        return _MJPEGFramesReader(self.options)


class _MJPEGFramesReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("mjpegframes source requires .option('path', ...)")
        self._path = path
        self._every = int(options.get("every", "1"))
        mf = options.get("maxframes")
        self._max_frames = int(mf) if mf is not None else None
        if self._every < 1:
            raise ValueError("every must be >= 1")

    def _list(self) -> list[str]:
        import glob
        import os

        if os.path.isdir(self._path):
            # case-insensitive extension match: capture tools commonly
            # emit uppercase 'CLIP0001.AVI'
            files = sorted(
                os.path.join(self._path, f)
                for f in os.listdir(self._path)
                if f.lower().endswith(".avi")
            )
            pattern = os.path.join(self._path, "*.avi (any case)")
        else:
            pattern = self._path  # single file or user-provided glob
            files = sorted(glob.glob(pattern))
        if not files:
            raise ValueError(f"mjpegframes: no files match {pattern!r}")
        return files

    def partitions(self):
        # one partition per FILE: clips decode sequentially, so the file
        # is the parallelism unit; the driver touches only the listing
        return [InputPartition(p) for p in self._list()]

    def read(self, partition):
        from compute_histogram_spark.multimodal.avi import video_frame_stats

        path = partition.value
        yielded = False
        try:
            with open(path, "rb") as f:
                content = f.read()
            for idx, w, h, luma in video_frame_stats(
                content, every=self._every, max_frames=self._max_frames
            ):
                yielded = True
                yield (path, idx, w, h, luma, True)
        except Exception:
            # decoded=false marks files with ZERO decodable frames; a
            # mid-file corruption after some frames decoded keeps the
            # good frames and drops the tail (no mixed success+failure
            # rows for one file)
            if not yielded:
                yield (path, None, None, None, None, False)
