"""Shared fixtures: one Spark session per test run, duckdb oracle con."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyrle_spark.session import get_spark

    spark = get_spark("pyrle_spark_tests", cpus=8, shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def ducks():
    from pyrle_spark.operators.relational import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    return con
