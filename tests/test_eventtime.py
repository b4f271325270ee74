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


def test_pre1970_nanos_parquet_cross_engine_contract(spark, tmp_path):
    """Pin the cross-engine event-time contract on a physical
    TIMESTAMP(NANOS) parquet, including pre-1970 rows.

    Spark (nanosAsLong + our floor div) and DuckDB agree exactly on
    every µs-ALIGNED value of either sign and every non-negative
    value.  The only divergence is sub-µs pre-1970 residue: DuckDB's
    parquet reader converts ns→µs at READ time and (as of 1.0.0)
    truncates that conversion toward zero (-999 ns → 0 µs), while we
    keep floor semantics (-999 ns → -1 µs: the instant lies in the
    µs bucket before zero, so bucketing stays monotone).  This test
    is the loud fence the oracle relies on — if DuckDB later reads
    NANOS natively (flooring), the tolerant assertion still holds."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    aligned = [-2_000_000_000, -1_000, 0, 1_000,
               1_700_000_000_123_456_000]
    subus = [-1, -999, -1001, -1_500_000_123]
    path = str(tmp_path / "ns.parquet")
    pq.write_table(
        pa.table({"ts": pa.array(aligned + subus, type=pa.timestamp("ns"))}),
        path, store_schema=False)
    df = spark.read.parquet(path)
    got_spark = {r.ts: r.us for r in
                 df.select(F.col("ts"),
                           event_time_us(df, "ts").alias("us")).collect()}
    # read_parquet preserves file row order, so zip against the input
    got_duck = {
        n: r[0] for n, r in zip(
            aligned + subus,
            duckdb.sql(f"SELECT epoch_us(ts) FROM read_parquet('{path}')")
            .fetchall())}
    for n in aligned:                       # exact parity, any sign
        assert got_spark[n] == got_duck[n] == n // 1000
    for n in subus:                         # spark floors; duckdb may
        assert got_spark[n] == n // 1000    # truncate (1.0.0 reader)
        assert got_duck[n] in (n // 1000, int(n / 1000))


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


def test_integer_ts_rejected(spark):
    """r14 review: an IntegerType ts can never be LONG nanoseconds
    (int32 spans +-2.1 s of nanos) — it is epoch seconds in the wild,
    and interpreting it as nanos landed every event in January 1970.
    Both accessors reject it loudly now."""
    import pytest

    from dynamic_partitioner_spark.functions.eventtime import (
        event_time_ts, event_time_us)

    df = spark.createDataFrame([(1723766400,)], "ts int")
    with pytest.raises(TypeError, match="unsupported event-time type"):
        event_time_us(df)
    with pytest.raises(TypeError, match="unsupported event-time type"):
        event_time_ts(df)
