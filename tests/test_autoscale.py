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


def test_row_term_only_above_threshold():
    from compute_histogram_spark.session import (
        ROW_TERM_MIN_ROWS,
        ROWS_PER_SHUFFLE_PARTITION,
    )

    # below the threshold the row count is ignored entirely: sub-sf100
    # benchmark partitioning is unchanged by construction
    assert shuffle_partitions_for_bytes(
        2 * GiB, 32, input_rows=ROW_TERM_MIN_ROWS) == 32
    assert shuffle_partitions_for_bytes(
        2 * GiB, 32, input_rows=89_000_000) == 32  # the sf10 regime
    # above it, narrow-row inputs get row-bounded partitions (the sf100
    # q12/q16 OOM lesson: 17 GB / 893M rows -> ~596, not 136)
    n = shuffle_partitions_for_bytes(
        17 * GiB, 32, input_rows=893_000_000)
    assert n == -(-893_000_000 // ROWS_PER_SHUFFLE_PARTITION) == 596
    # the cap still binds
    assert shuffle_partitions_for_bytes(
        17 * GiB, 32, cap=256, input_rows=893_000_000) == 256


def test_parquet_rows_under_local_dir(sf_dir):
    import duckdb

    from compute_histogram_spark.session import _parquet_rows_under

    rows = _parquet_rows_under(sf_dir)
    con = duckdb.connect()
    expected = sum(
        con.execute(
            f"select count(*) from read_parquet('{sf_dir}/{t}.parquet')"
        ).fetchone()[0]
        for t in ("region nation customer supplier part orders lineitem "
                  "events documents embeddings").split()
    )
    assert rows == expected
    # non-local URIs and missing paths fall back to 0 (byte term stands)
    assert _parquet_rows_under("s3a://bucket/prefix") == 0
    assert _parquet_rows_under("/nonexistent/nowhere") == 0
