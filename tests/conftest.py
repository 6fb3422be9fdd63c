from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssidentity_spark.session import get_spark  # noqa: E402


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
