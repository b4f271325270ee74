"""Schema-adaptive event-time accessors.

The engine's event tables carry a ``ts`` column whose physical parquet
encoding has two variants in the wild:

- ``TIMESTAMP(NANOS)`` — Spark has no nanosecond type, so with
  ``spark.sql.legacy.parquet.nanosAsLong`` (set in session.py) the
  column reads as LONG nanoseconds.
- ``TIMESTAMP(MICROS)`` (annotated, no timezone) — reads natively as
  ``TIMESTAMP_NTZ``.

Every operator that does event-time arithmetic goes through these two
helpers instead of assuming one encoding.  Both are exact: integer
floor-division for the nanos path (float division loses ~256 ns on
19-digit values; plain ``div`` truncates toward zero, which would
diverge from DuckDB's ``epoch_us`` floor on pre-1970 negative nanos)
and ``unix_micros`` for the timestamp path.  With the session timezone
pinned to UTC (session.py), an NTZ wall-clock reading equals the UTC
instant, so ``event_time_us`` matches DuckDB's ``epoch_us(ts)`` on the
same parquet bit-for-bit for every µs-aligned value of either sign and
every non-negative value.  The one known cross-engine residue: DuckDB's
parquet reader (1.0.0) converts sub-µs PRE-1970 nanos to µs by
truncation toward zero at read time (-999 ns → 0 µs) where this module
floors (-999 ns → -1 µs, keeping time-bucketing monotone); the fence is
pinned in tests/test_eventtime.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ts_type(df: DataFrame, col: str) -> T.DataType:
    return df.schema[col].dataType


def _floor_div_nanos_to_us(col: str) -> str:
    """SQL expr: LONG nanos → LONG micros with FLOOR semantics.

    ``div`` truncates toward zero; subtracting the canonical
    (always-non-negative) remainder first makes it a floor division, so
    negative (pre-1970) nanos round down exactly like DuckDB's
    ``epoch_us``.  Pure long arithmetic — stays inside codegen.
    """
    rem = f"(((`{col}` % 1000) + 1000) % 1000)"
    return f"(`{col}` - {rem}) div 1000"


def event_time_us(df: DataFrame, col: str = "ts") -> Column:
    """Event-time column → LONG epoch microseconds (exact, truncating)."""
    dt = _ts_type(df, col)
    # LongType ONLY for the integer path: the nanosAsLong read always
    # yields LONG, so an IntegerType ts is never nanos (int32 spans
    # +-2.1 s of them) — accepting it silently landed epoch-seconds
    # data in January 1970 (r14 review); reject loudly instead
    if isinstance(dt, T.LongType):
        return F.expr(_floor_div_nanos_to_us(col))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_micros(F.col(col).cast("timestamp"))
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt.simpleString()}"
        " (expected long nanos or timestamp)")


def event_time_ts(df: DataFrame, col: str = "ts") -> Column:
    """Event-time column → TIMESTAMP at microsecond precision.

    The streaming operators (watermarks, ``session_window``, tumbling /
    sliding ``window``) want a real timestamp; this is the counterpart
    of :func:`event_time_us` for those paths.
    """
    dt = _ts_type(df, col)
    # LongType ONLY — see event_time_us (r14 review)
    if isinstance(dt, T.LongType):
        return F.expr(f"timestamp_micros({_floor_div_nanos_to_us(col)})")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.col(col).cast("timestamp")
    raise TypeError(
        f"column {col!r} has unsupported event-time type {dt.simpleString()}"
        " (expected long nanos or timestamp)")
