"""Shared fixtures: one SparkSession and one DuckDB connection per test run."""

from __future__ import annotations

import duckdb
import pytest

from squrve_spark.catalog import ALL_TABLES
from squrve_spark.session import get_spark

SF_SMALL = "/root/testdata/sf0.001"
SF_MED = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("squrve-tests", cpus=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def duck_views(con: duckdb.DuckDBPyConnection, sf_dir: str) -> None:
    """Mirror the driver's pre-registered DuckDB views over the parquet."""
    for t in ALL_TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
