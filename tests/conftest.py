from __future__ import annotations

import pytest

from mapreduceimpl_spark import get_spark
from mapreduceimpl_spark.sources import load_table

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from mapreduceimpl_spark.sources import load_tables

    return load_tables(spark, SF_SMOKE)


@pytest.fixture(scope="session")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="session")
def embeddings(spark):
    return load_table(spark, SF_SMOKE, "embeddings")
