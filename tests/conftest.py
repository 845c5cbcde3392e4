import os
import sys

import pytest

_TESTS = os.path.dirname(os.path.abspath(__file__))
_ROOT = os.path.dirname(_TESTS)
sys.path.insert(0, _ROOT)

# Spark's Python workers inherit PYTHONPATH (not the driver's sys.path);
# closures over test-module classes need both dirs importable there.
os.environ["PYTHONPATH"] = os.pathsep.join(
    p for p in (_ROOT, _TESTS, os.environ.get("PYTHONPATH")) if p
)

from knovexlite_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.001"
SF_MEDIUM = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="knovexlite_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
