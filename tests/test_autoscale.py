"""Input-volume shuffle scaling (session.py, VERDICT r11 #4): the sizing
rule, the floor/cap guards, and the live conf update."""

from compute_histogram_spark.session import (
    BYTES_PER_SHUFFLE_PARTITION,
    autoscale_shuffle,
    shuffle_partitions_for_bytes,
)

GiB = 1024 ** 3


def test_sizing_rule_floor_and_cap():
    # small inputs never move the tuned floor
    assert shuffle_partitions_for_bytes(0, 32) == 32
    assert shuffle_partitions_for_bytes(60 * 1024 * 1024, 32) == 32
    assert shuffle_partitions_for_bytes(2 * GiB, 32) == 32
    # the sf100 regime (17 GB parquet) lands near the measured-good 128
    assert shuffle_partitions_for_bytes(17 * GiB, 32) == 136
    # explicit env floors are respected upward
    assert shuffle_partitions_for_bytes(17 * GiB, 256) == 256
    # runaway inputs cap
    assert shuffle_partitions_for_bytes(10 * 1024 ** 4, 32) == 4096
    # exactly one partition per knee byte
    assert shuffle_partitions_for_bytes(
        5 * BYTES_PER_SHUFFLE_PARTITION, 1
    ) == 5


def test_autoscale_small_dir_keeps_floor(spark, sf_dir):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    n = autoscale_shuffle(spark, sf_dir)
    assert n == int(before)  # test data is far below the knee
    assert spark.conf.get("spark.sql.shuffle.partitions") == before


def test_autoscale_missing_dir_keeps_floor(spark):
    before = spark.conf.get("spark.sql.shuffle.partitions")
    assert autoscale_shuffle(spark, "/nonexistent/nowhere") == int(before)
