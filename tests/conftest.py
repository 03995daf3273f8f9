import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from kit_spark.session import get_spark

    spark = get_spark("kit_spark_tests", cores=4, shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def fixture_web():
    from kit_spark.sources.synth import synth_web

    return synth_web(seed=42)
