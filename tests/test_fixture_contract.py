"""Fixture-schema contract: the loader must normalize whatever the driver's
parquet actually ships — round 2 broke because the engine baked in one
events-ts encoding as fact (VERDICT r2 "What's wrong" #1). This test reads
the REAL fixture schemas at test time and exercises the normalizer against
every encoding the fixture has ever used, so the next fixture drift fails
loudly here instead of as seven opaque driver ERRs.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from squrve_spark.catalog import ALL_TABLES, load_table, normalize_events_time

from tests.conftest import SF_MED

REQUIRED_COLUMNS = {
    "region": {"r_regionkey", "r_name"},
    "nation": {"n_nationkey", "n_name", "n_regionkey"},
    "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
    "supplier": {"s_suppkey", "s_name", "s_nationkey"},
    "part": {"p_partkey", "p_name", "p_type", "p_size"},
    "orders": {"o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"},
    "lineitem": {
        "l_orderkey",
        "l_partkey",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_shipdate",
    },
    "events": {"event_id", "ts", "user_id", "event_type", "value"},
    "documents": {"doc_id", "text", "lang"},
    "embeddings": {"vec_id", "embedding"},
}


@pytest.mark.parametrize("table", ALL_TABLES)
def test_fixture_has_required_columns(table):
    schema = pq.read_schema(f"{SF_MED}/{table}.parquet")
    missing = REQUIRED_COLUMNS[table] - set(schema.names)
    assert not missing, f"{table}.parquet is missing {missing} — fixture drifted"


def test_loader_normalizes_actual_events_fixture(spark):
    """Whatever encoding the current fixture uses, the loaded frame must
    expose ts TIMESTAMP + ts_ns long and they must agree at micro precision."""
    e = load_table(spark, SF_MED, "events")
    dtypes = dict(e.dtypes)
    assert dtypes["ts"] == "timestamp", dtypes
    assert dtypes["ts_ns"] == "bigint", dtypes
    bad = e.filter(F.unix_micros("ts") != F.expr("ts_ns div 1000")).count()
    assert bad == 0


@pytest.mark.parametrize("encoding", ["bigint_ns", "timestamp", "timestamp_ntz"])
def test_normalizer_handles_every_known_encoding(spark, encoding):
    """Synthesize each historical fixture encoding of events.ts and assert
    the normalizer converges them all to identical (ts, ts_ns) values."""
    micros = 1_700_000_000_123_456  # arbitrary fixed instant, micro precision
    base = spark.createDataFrame(
        [(1, micros, 7, "view", 1.5, "{}")],
        "event_id long, ts_raw long, user_id long, event_type string, value double, props string",
    )
    if encoding == "bigint_ns":
        df = base.withColumn("ts", F.col("ts_raw") * F.lit(1000)).drop("ts_raw")
    elif encoding == "timestamp":
        df = base.withColumn("ts", F.timestamp_micros("ts_raw")).drop("ts_raw")
    else:
        df = base.withColumn(
            "ts", F.timestamp_micros("ts_raw").cast("timestamp_ntz")
        ).drop("ts_raw")
    out = normalize_events_time(df)
    assert dict(out.dtypes)["ts"] == "timestamp"
    row = out.select(F.unix_micros("ts").alias("us"), "ts_ns").first()
    assert row["ts_ns"] == micros * 1000
    assert row["us"] == micros  # session TZ pinned UTC => instant preserved
