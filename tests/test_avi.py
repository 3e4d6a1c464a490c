"""MJPEG-in-AVI (multimodal/avi.py): container round trip, stride
sampling cost shape, header metadata, strict rejection, and the
sample_video_frames Spark operator."""

import numpy as np
import pytest
from pyspark.sql import Row

from compute_histogram_spark.multimodal.avi import (
    avi_info,
    encode_avi_mjpeg,
    iter_frames,
    video_frame_stats,
)


def gray_frames(n=12, h=32, w=48):
    yy, xx = np.mgrid[0:h, 0:w]
    return [
        (128 + 80 * np.sin(xx / 7.0 + t / 3.0) * np.cos(yy / 5.0)).astype(
            np.uint8
        )
        for t in range(n)
    ]


def test_round_trip_all_frames():
    frames = gray_frames()
    blob = encode_avi_mjpeg(frames, fps=24, quality=92)
    info = avi_info(blob)
    assert (info["width"], info["height"]) == (48, 32)
    assert info["n_frames"] == 12 and info["codec"] == "MJPG"
    assert info["fps"] == pytest.approx(24.0, abs=0.01)
    decoded = list(iter_frames(blob))
    assert [i for i, _ in decoded] == list(range(12))
    for (_, px), orig in zip(decoded, frames):
        assert px.shape == (32, 48) and px.dtype == np.uint8
        assert np.abs(px.astype(int) - orig.astype(int)).max() <= 8


def test_stride_and_cap_sampling():
    blob = encode_avi_mjpeg(gray_frames(10), fps=30)
    assert [i for i, _ in iter_frames(blob, every=3)] == [0, 3, 6, 9]
    assert [i for i, _ in iter_frames(blob, every=2, max_frames=3)] == [
        0,
        2,
        4,
    ]
    with pytest.raises(ValueError):
        list(iter_frames(blob, every=0))


def test_rgb_frame_stats():
    g = gray_frames(4)
    rgb = [np.stack([f, 255 - f, f // 2], axis=-1) for f in g]
    blob = encode_avi_mjpeg(rgb, fps=10, quality=92)
    stats = list(video_frame_stats(blob, every=2))
    assert [s[0] for s in stats] == [0, 2]
    for idx, w, h, luma in stats:
        assert (w, h) == (48, 32)
        f = g[idx].astype(np.float64)
        expect = (
            0.299 * f + 0.587 * (255 - g[idx]) + 0.114 * (g[idx] // 2)
        ).mean()
        assert abs(luma - expect) <= 3.0


def test_rejection_paths():
    with pytest.raises(ValueError, match="not an AVI"):
        avi_info(b"RIFF\x04\x00\x00\x00WAVE")
    blob = encode_avi_mjpeg(gray_frames(3), fps=5)
    with pytest.raises(ValueError):
        list(iter_frames(blob[:150]))  # truncated container
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], fps=5)
    with pytest.raises(ValueError):
        encode_avi_mjpeg(
            [np.zeros((8, 8), np.uint8), np.zeros((9, 8), np.uint8)], fps=5
        )


def test_frame_count_lie_rejected():
    """A corrupted dwTotalFrames far beyond what the movi payload could
    hold must be diagnosed before any per-frame decode work."""
    import struct

    blob = bytearray(encode_avi_mjpeg(gray_frames(3), fps=5))
    pos = blob.find(b"avih")
    struct.pack_into("<I", blob, pos + 8 + 16, 1 << 30)  # dwTotalFrames
    with pytest.raises(ValueError, match="frame count"):
        list(iter_frames(bytes(blob)))


def test_sample_video_frames_spark(spark):
    from compute_histogram_spark.multimodal import binary as MM

    blob = encode_avi_mjpeg(gray_frames(8), fps=12, quality=92)
    assets = spark.createDataFrame(
        [
            Row(asset_id=0, kind="video", content=blob, source="s0"),
            Row(asset_id=1, kind="video", content=bytes(range(64)), source="s1"),
            Row(asset_id=2, kind="image", content=b"pngish", source="s2"),
        ]
    )
    out = MM.sample_video_frames(assets, every=2).collect()
    by_asset = {}
    for r in out:
        by_asset.setdefault(r["asset_id"], []).append(r)
    # image assets filtered out entirely
    assert set(by_asset) == {0, 1}
    real = sorted(by_asset[0], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in real] == [0, 2, 4, 6]
    assert all(r["decoded"] and (r["width"], r["height"]) == (48, 32)
               for r in real)
    # non-AVI video -> one decoded=false row, batch not poisoned
    assert len(by_asset[1]) == 1 and by_asset[1][0]["decoded"] is False


def test_extract_video_info_handles_avi(spark):
    from compute_histogram_spark.multimodal.mp4 import (
        encode_mp4,
        extract_video_info,
    )

    avi = encode_avi_mjpeg(gray_frames(6), fps=12)
    mp4 = encode_mp4(3.5, timescale=600)
    assets = spark.createDataFrame(
        [
            Row(asset_id=0, kind="video", content=avi, source="a"),
            Row(asset_id=1, kind="video", content=mp4, source="b"),
            Row(asset_id=2, kind="video", content=b"neither", source="c"),
        ]
    )
    out = {r["asset_id"]: r for r in extract_video_info(assets).collect()}
    assert out[0]["parsed"] and out[0]["brand"] == "AVI "
    assert out[0]["video_codec"] == "MJPG"
    assert (out[0]["width"], out[0]["height"]) == (48, 32)
    assert out[0]["duration_s"] == pytest.approx(0.5, abs=0.01)
    assert out[1]["parsed"] and out[1]["brand"] != "AVI "
    assert out[2]["parsed"] is False


def test_mjpegframes_python_datasource(spark, tmp_path):
    from compute_histogram_spark.sources.video import MJPEGFramesDataSource

    for i, n in enumerate((4, 6)):
        (tmp_path / f"clip{i}.avi").write_bytes(
            encode_avi_mjpeg(gray_frames(n), fps=10, quality=92)
        )
    (tmp_path / "broken.avi").write_bytes(b"RIFFxxxxAVI garbage")

    spark.dataSource.register(MJPEGFramesDataSource)
    df = (
        spark.read.format("mjpegframes")
        .option("path", str(tmp_path))
        .option("every", 2)
        .load()
    )
    rows = df.collect()
    by_path = {}
    for r in rows:
        by_path.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    assert sorted(r["frame_idx"] for r in by_path["clip0.avi"]) == [0, 2]
    assert sorted(r["frame_idx"] for r in by_path["clip1.avi"]) == [0, 2, 4]
    assert all(
        r["decoded"] and (r["width"], r["height"]) == (48, 32)
        for r in by_path["clip0.avi"] + by_path["clip1.avi"]
    )
    # corrupt file -> one decoded=false row, scan survives
    assert len(by_path["broken.avi"]) == 1
    assert by_path["broken.avi"][0]["decoded"] is False
    # file-level parallelism: one planned partition per file
    assert df.rdd.getNumPartitions() == 3


def test_mjpegframes_uppercase_extension(spark, tmp_path):
    from compute_histogram_spark.sources.video import MJPEGFramesDataSource

    (tmp_path / "CLIP0001.AVI").write_bytes(
        encode_avi_mjpeg(gray_frames(3), fps=10)
    )
    spark.dataSource.register(MJPEGFramesDataSource)
    rows = (
        spark.read.format("mjpegframes")
        .option("path", str(tmp_path))
        .load()
        .collect()
    )
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2]


def corrupt_last_frame(blob: bytes) -> bytes:
    """Overwrite the JPEG SOI of the LAST video frame chunk inside movi
    (not the idx1 entries, which also spell '00dc') so that frame — and
    only that frame — fails to decode."""
    from compute_histogram_spark.multimodal.avi import (
        _movi_bounds,
        _walk_chunks,
    )

    b = bytearray(blob)
    lo, hi = _movi_bounds(blob)
    frame_offs = [
        off
        for fourcc, off, _ in _walk_chunks(blob, lo, hi)
        if fourcc in (b"00dc", b"00db")
    ]
    assert frame_offs
    off = frame_offs[-1]
    assert b[off : off + 2] == b"\xff\xd8"
    b[off : off + 2] = b"XX"
    return bytes(b)


def test_partial_corruption_keeps_decoded_frames(spark, tmp_path):
    """A clip that corrupts mid-file keeps its good frames and emits NO
    decoded=false row — failure rows mark zero-frame files only
    (ADVICE r7; sources/video.py + binary.sample_video_frames)."""
    from compute_histogram_spark.multimodal import binary as MM
    from compute_histogram_spark.sources.video import MJPEGFramesDataSource

    blob = corrupt_last_frame(encode_avi_mjpeg(gray_frames(4), fps=10))
    # the raw iterator raises at the bad frame after yielding good ones
    good = []
    with pytest.raises(ValueError):
        for item in video_frame_stats(blob):
            good.append(item)
    assert [i for i, *_ in good] == [0, 1, 2]

    assets = spark.createDataFrame(
        [Row(asset_id=0, kind="video", content=blob, source="s")]
    )
    rows = MM.sample_video_frames(assets).collect()
    assert sorted(r["frame_idx"] for r in rows) == [0, 1, 2]
    assert all(r["decoded"] for r in rows)

    (tmp_path / "partial.avi").write_bytes(blob)
    (tmp_path / "broken.avi").write_bytes(b"RIFFxxxxAVI garbage")
    spark.dataSource.register(MJPEGFramesDataSource)
    out = (
        spark.read.format("mjpegframes")
        .option("path", str(tmp_path))
        .load()
        .collect()
    )
    by = {}
    for r in out:
        by.setdefault(r["path"].rsplit("/", 1)[-1], []).append(r)
    assert sorted(r["frame_idx"] for r in by["partial.avi"]) == [0, 1, 2]
    assert all(r["decoded"] for r in by["partial.avi"])
    # zero-frame file still gets exactly one failure row
    assert len(by["broken.avi"]) == 1
    assert by["broken.avi"][0]["decoded"] is False
