"""Session-factory conf contract.

The reference retries each flaky tile read up to 7 times
(reference main.py:231-236, retry_if_rasterio with exponential backoff);
the Spark-native equivalent is task-level retry, so the session factory
must pin ``spark.task.maxFailures`` to at least that attempt count.
"""


def test_task_retry_parity(spark):
    # The tests fixture builds the first session in this JVM, so the
    # builder conf binds (it is a cluster conf — see session.py).
    assert int(spark.conf.get("spark.task.maxFailures")) >= 7


def test_fail_loud_on_corrupt_files(spark):
    # Like the reference after its retries are exhausted: corrupt input is
    # an error, not a silent skip.
    assert spark.conf.get("spark.sql.files.ignoreCorruptFiles") == "false"


def test_ansi_off_for_numpy_parity(spark):
    # Reference relies on wrapping casts / silent truncation
    # (main.py:195,197); ANSI mode would throw where NumPy wraps.
    assert spark.conf.get("spark.sql.ansi.enabled") == "false"
