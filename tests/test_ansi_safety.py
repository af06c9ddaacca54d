"""ANSI-mode safety: every driver query must run under Spark 4's default
ANSI SQL semantics.

The driver builds its own SparkSession (ANSI on by default in Spark 4); the
repo's ``get_spark`` pins ``spark.sql.ansi.enabled=false``, which can mask
operators that depend on permissive casts (round-4 regression: a bare
``to_timestamp`` in the F4 date chain threw ``CAST_INVALID_INPUT`` on
malformed input instead of nulling, killing ``date_tolerance`` in the driver
harness while all pytest stayed green). This module flips the runtime conf to
ANSI for every ``queries()`` entry so driver-session drift surfaces here
first.
"""

import os

import pytest

import __spark_entry__ as entrymod

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")

ALL_QUERIES = sorted(entrymod.queries())


@pytest.fixture()
def ansi_spark(spark):
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield spark
    spark.conf.set("spark.sql.ansi.enabled", prev)


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_runs_under_ansi(ansi_spark, name):
    df = entrymod.queries()[name](ansi_spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0
