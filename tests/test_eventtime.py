"""Schema-adaptive event-time accessors (functions/eventtime.py)."""
from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_partitioner_spark.functions.eventtime import (
    event_time_ts,
    event_time_us,
)


def test_nanos_floor_division_matches_python_floor(spark):
    """LONG-nanos → micros uses FLOOR semantics: negative (pre-1970)
    nanos round down, matching DuckDB's epoch_us, not toward zero."""
    nanos = [-1, -999, -1000, -1001, -1_500_000_123, 0, 1, 999, 1000,
             1001, 1_500_000_123, 1_700_000_000_123_456_789]
    df = spark.createDataFrame([(n,) for n in nanos], "ts long")
    got = {r.ts: r.us for r in
           df.select("ts", event_time_us(df, "ts").alias("us")).collect()}
    assert got == {n: n // 1000 for n in nanos}


def test_timestamp_path_is_unix_micros(spark):
    df = spark.createDataFrame(
        [("2024-01-02 03:04:05.123456",)], "s string"
    ).select(F.col("s").cast("timestamp").alias("ts"))
    row = df.select(event_time_us(df, "ts").alias("us"),
                    event_time_ts(df, "ts").alias("t")).collect()[0]
    assert row.us == row.t.timestamp() * 1_000_000 or \
        row.us == int(row.t.timestamp() * 1_000_000)


def test_nanos_ts_roundtrip(spark):
    df = spark.createDataFrame([(1_700_000_000_123_456_789,)], "ts long")
    row = df.select(event_time_ts(df, "ts").alias("t"),
                    event_time_us(df, "ts").alias("us")).collect()[0]
    assert int(row.t.timestamp() * 1_000_000) == row.us
