"""Vector math over ``array<float>`` embedding columns — JVM-side Column
expressions (``zip_with`` / ``aggregate``), computed in DOUBLE so results
are reproducible against the DuckDB oracle.  No UDFs: at 100 TB these
run inside whole-stage codegen with zero Python round-trips.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    # try_divide: a zero-norm vector yields NULL (filtered by any
    # threshold predicate) instead of DIVIDE_BY_ZERO under ANSI mode.
    return F.try_divide(dot(a, b), l2_norm(a) * l2_norm(b))


L2_NORM_SQL = "sqrt(list_sum(list_transform({a}::DOUBLE[], x -> x * x)))"
#: DuckDB twin; cast to DOUBLE[] so accumulation precision matches Spark.
COSINE_SQL = "list_cosine_similarity({a}::DOUBLE[], {b}::DOUBLE[])"
