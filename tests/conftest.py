from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.session import get_spark  # noqa: E402

# Fast tier (r13, VERDICT r12 ask #2): the full 899-test suite runs ~60 min
# on the gate box — past the driver's verify window, which truncated r12's
# run at ~67% and recorded tests_ok=false with zero failures visible. The
# default run now skips the census-listed slow tests (tests/slow_tests.txt,
# every test totalling >=5 s) so `python -m pytest tests/ -x -q` completes
# inside the window; `--runslow` or SPARK_GRAFT_FULL_TESTS=1 restores the
# full suite (the builder's round-end gate always runs it).
_SLOW_LIST_PATH = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def _slow_ids() -> frozenset[str]:
    if not os.path.exists(_SLOW_LIST_PATH):
        return frozenset()
    with open(_SLOW_LIST_PATH) as f:
        return frozenset(
            line.strip()
            for line in f
            if line.strip() and not line.startswith("#")
        )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run the census-listed slow tests too (the full suite)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get(
        "SPARK_GRAFT_FULL_TESTS"
    ) == "1":
        return
    slow = _slow_ids()
    if not slow:
        return
    marker = pytest.mark.skip(
        reason="slow tier — run with --runslow or SPARK_GRAFT_FULL_TESTS=1"
    )
    for item in items:
        if item.nodeid in slow:
            item.add_marker(marker)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("ssidentity-tests", cores=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def observations(spark):
    from ssidentity_spark.fixtures import observations_df

    df = observations_df(spark, n_rows=4000).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def raw_frames(spark):
    from ssidentity_spark.fixtures import raw_frames_df

    df = raw_frames_df(spark, n_extra=100).cache()
    df.count()
    return df
