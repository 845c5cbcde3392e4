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

# --- default-run / slow-tier split (round 16, VERDICT #1) -------------------
#
# The full ~750-test suite takes ~25 min — beyond the round driver's
# pytest budget (VERIFY_r15 tests_ok:false, run killed mid-suite with
# zero failures), which left the driver blind to test health.  The
# default run therefore SKIPS the heavy tier — every test either
# marked @pytest.mark.slow or listed in tests/slow_tests.txt (a
# measured-duration manifest regenerated from real runs via
# KNOVEXLITE_WRITE_DURATIONS=1, threshold in scripts/gen_slow_list.py)
# — keeping the default run well inside the budget while the
# builder's own gate runs EVERYTHING with KNOVEXLITE_SLOW_TESTS=1.

_RUN_SLOW = os.environ.get("KNOVEXLITE_SLOW_TESTS", "") == "1"
_SLOW_LIST_PATH = os.path.join(_TESTS, "slow_tests.txt")


def _slow_list() -> set[str]:
    try:
        with open(_SLOW_LIST_PATH) as f:
            return {
                ln.strip()
                for ln in f
                if ln.strip() and not ln.startswith("#")
            }
    except FileNotFoundError:
        return set()


def pytest_collection_modifyitems(config, items):
    if _RUN_SLOW:
        return
    slow_ids = _slow_list()
    skip = pytest.mark.skip(
        reason="slow tier (see tests/slow_tests.txt) — run with "
        "KNOVEXLITE_SLOW_TESTS=1"
    )
    for item in items:
        rel_id = item.nodeid.split("tests/")[-1]
        if "slow" in item.keywords or rel_id in slow_ids:
            item.add_marker(skip)


_DURATIONS: dict[str, float] = {}


def pytest_runtest_logreport(report):
    if os.environ.get("KNOVEXLITE_WRITE_DURATIONS", "") != "1":
        return
    rel_id = report.nodeid.split("tests/")[-1]
    _DURATIONS[rel_id] = _DURATIONS.get(rel_id, 0.0) + report.duration


def pytest_sessionfinish(session, exitstatus):
    if os.environ.get("KNOVEXLITE_WRITE_DURATIONS", "") != "1":
        return
    import json

    with open(os.path.join(_TESTS, ".durations.json"), "w") as f:
        json.dump(_DURATIONS, f, indent=0, sort_keys=True)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="knovexlite_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()
