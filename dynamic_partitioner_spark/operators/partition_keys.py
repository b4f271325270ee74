"""Partition-key normalization — the reference's S4 operator.

Reference semantics (``FieldValueDynamicPartitioner.java:18-33`` and the
three per-format ``getPartitionKey`` impls,
``AvroDynamicPartitionedDatasetSink.java:115-131``,
``ParquetDynamicPartitionedDatasetSink.java:120-137``,
``ORCDynamicPartitionedDatasetSink.java:190-207``):

  * each configured field value becomes ``String.valueOf(value).trim()``
  * a value containing ``/`` is rejected (it would split the directory)
  * keys are ordered exactly as configured

Spark-first translation: one ``select`` that rewrites each partition
column as ``trim(cast(col as string))`` with an inline JVM-side
``raise_error`` guard for ``/`` and NULL — no Python UDF, no extra pass
over the data; Catalyst folds the guard into the same projection that
feeds the writer, so the validation is free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def exact_col(name: str) -> Column:
    """Resolve ``name`` as an EXACT top-level column: backtick-quoted
    (with embedded backticks doubled), so a literal dot never parses
    as struct access.  ``F.col('price.usd')`` fails analysis on a
    column of that exact name — or silently reads a same-spelled
    struct field (r15 review)."""
    return F.col(f"`{name.replace('`', '``')}`")


def normalized_key_column(name: str, source: Column | None = None
                          ) -> Column:
    """``trim(cast(c as string))`` with inline rejection of '/', NUL
    and NULL.

    ``source`` is the column to normalize (default
    :func:`exact_col` of ``name``, which is right for any literal
    top-level column name; pass an explicit Column only to normalize
    a derived expression).

    The NUL rejection is engine hardening BEYOND the reference (which
    rejects only '/'): Hive's directory escaping starts at 0x01, so a
    NUL would pass into the file system name raw, and the merge
    paths' NUL-joined multi-field tuple encoding
    (``_partition_member_filter``) would read ('a', 'b\\x00c') and
    ('a\\x00b', 'c') as the same partition — a merge could rewrite
    the wrong one (r15 review)."""
    src = exact_col(name) if source is None else source
    s = F.trim(src.cast("string"))
    return (
        F.when(src.isNull(),
               F.raise_error(F.lit(
                   f"Partition field '{name}' must not be null")))
        .when(s.contains("/"),
              F.raise_error(F.concat(
                  F.lit(f"Invalid value for partition field '{name}': "),
                  s, F.lit(" (must not contain '/')"))))
        .when(s.contains("\x00"),
              F.raise_error(F.lit(
                  f"Invalid value for partition field '{name}': "
                  "must not contain NUL (0x00)")))
        .otherwise(s)
        .alias(name)
    )


def normalize_partition_keys(df: DataFrame, field_names: list[str]) -> DataFrame:
    """Rewrite every partition column to its normalized string form.

    Non-partition columns pass through untouched (the reference copies
    payload fields by name — ``StructuredToAvroTransformer.java:66-78``).
    """
    missing = [f for f in field_names if f not in df.columns]
    if missing:
        raise ValueError(f"partition fields not in input: {missing}")
    odd = [f for f in field_names if "." in f or "`" in f]
    if odd:
        # the KEY columns flow downstream as bare string names
        # (groupBy(*field_names), sortWithinPartitions, member
        # filters), where a dot parses as struct access and a
        # backtick breaks quoting — normalizing here and aborting
        # (or worse, silently reading a same-spelled struct field)
        # three operators later is the failure mode to refuse up
        # front.  PAYLOAD columns with such names pass through fine
        # via exact_col (r15 diff review)
        raise ValueError(
            f"partition key column names {odd} contain '.' or '`'; "
            "rename the key columns to plain names (payload columns "
            "may keep such names)")
    keyset = set(field_names)
    # exact_col, never bare F.col: the passthrough and key columns
    # must resolve EXACT top-level names — a payload column literally
    # named 'price.usd' (legal in Spark, common from ingested
    # JSON/CSV headers) parses as struct access unquoted and aborts a
    # valid write, or silently selects a same-spelled struct field
    # (r15 review)
    cols = [normalized_key_column(c) if c in keyset else exact_col(c)
            for c in df.columns]
    return df.select(*cols)
