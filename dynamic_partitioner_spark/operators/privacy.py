"""K-anonymity suppression over quasi-identifier columns.

Governance primitive for shipping analytics extracts: any combination
of quasi-identifier values shared by fewer than ``k`` rows is
suppressed (replaced by a redaction marker), so no released row's
quasi-identifier tuple isolates fewer than ``k`` individuals.  Public
technique (Sweeney, k-anonymity); suppression-only — generalization
hierarchies are a caller-side mapping applied before this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def k_anonymize(df: DataFrame, quasi_cols: list[str], k: int,
                redacted: str = "*") -> DataFrame:
    """Suppress quasi-identifier tuples occurring fewer than ``k``
    times; adds ``group_size`` (the pre-suppression tuple count, a
    useful audit column — it never goes below ``k`` except on redacted
    rows).

    One window count over the quasi-identifier key — a single shuffle,
    no join; the redaction itself is a codegen CASE per column.  Quasi
    columns must be strings (redaction substitutes a marker string);
    cast or bucket numeric quasi-identifiers first, which is also what
    a generalization hierarchy does.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    w = Window.partitionBy(*quasi_cols)
    out = df.withColumn("group_size", F.count(F.lit(1)).over(w))
    small = F.col("group_size") < k
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(redacted)).otherwise(F.col(c)))
    return out


def l_diversify(df: DataFrame, quasi_cols: list[str], sensitive_col: str,
                l: int, redacted: str = "*") -> DataFrame:
    """l-diversity suppression: redact quasi-identifier tuples whose
    group contains fewer than ``l`` DISTINCT sensitive values.

    k-anonymity alone leaks when a large group is homogeneous in the
    sensitive attribute (everyone in the group shares the secret);
    l-diversity (Machanavajjhala et al., 2007) additionally requires
    in-group sensitive diversity.  Suppression-only, like
    :func:`k_anonymize`.

    Shape: one count-distinct aggregate on the quasi-identifier key,
    broadcast-joined back (group count ≤ distinct QI tuples — small
    relative to the table); redaction is a codegen CASE.  Adds
    ``sens_diversity`` (pre-suppression distinct count, audit column).
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    stats = (df.groupBy(*quasi_cols)
             .agg(F.countDistinct(sensitive_col).alias("sens_diversity")))
    # null-safe equality so NULL quasi-identifier values join back to
    # their own group exactly as groupBy grouped them
    stats_a = stats.select(
        *[F.col(c).alias(f"_qi_{c}") for c in quasi_cols],
        "sens_diversity")
    cond = None
    for c in quasi_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_qi_{c}"))
        cond = eq if cond is None else cond & eq
    out = df.join(F.broadcast(stats_a), cond)
    small = F.col("sens_diversity") < l
    for c in quasi_cols:
        out = out.withColumn(
            c, F.when(small, F.lit(redacted)).otherwise(F.col(c)))
    return out.select(*df.columns, "sens_diversity")
