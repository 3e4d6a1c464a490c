import os

import pytest
from hypothesis import settings as hyp_settings

from compute_histogram_spark.session import get_session

# The CI gate must be deterministic: the r6 geotiff bug was found by an
# UNSEEDED Hypothesis run after the builder's own runs passed (good fuzzing,
# bad gate — VERDICT r6 task 2). Default every @settings to derandomize=True
# (per-test decorators inherit unspecified fields from the loaded profile);
# exploratory random fuzzing stays available via HYPOTHESIS_PROFILE=explore.
hyp_settings.register_profile("ci", derandomize=True)
hyp_settings.register_profile("explore", derandomize=False)
hyp_settings.load_profile(os.environ.get("HYPOTHESIS_PROFILE", "ci"))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # Small thread count keeps test wall-clock down; semantics identical.
    s = get_session("tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
