"""Shared fixtures: one session-scoped SparkSession (local[8], 8 shuffle
partitions — small enough that the suite's many tiny jobs stay fast, same
configs as production via webcrawler_spark.session.get_spark)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from webcrawler_spark.session import get_spark

    s = get_spark(app_name="webcrawler_spark_tests", master="local[8]", shuffle_partitions=8)
    # micro-data suite: whole-stage codegen compilation dominates tiny jobs
    s.conf.set("spark.sql.codegen.wholeStage", "false")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
