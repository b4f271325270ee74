"""Declarative data-quality expectations — the contract-checking pass
a production pipeline runs before publishing a dataset (the
Great-Expectations / dbt-test shape, reduced to engine primitives).

Rule forms:

* ``("not_null", col)`` — NULL count
* ``("range", col, lo, hi)`` — values outside ``[lo, hi]`` (NULLs not
  counted here; pair with ``not_null``)
* ``("unique", col)`` — rows beyond the first per duplicated value
  (NULLs ignored, like a SQL unique constraint)
* ``("fk", col, ref_df, ref_col)`` — rows whose non-NULL value has no
  match in the reference column

Execution shape: every ``not_null``/``range`` rule folds into ONE
conditional-sum aggregate over a single scan; each ``unique`` rule is
one hash aggregate on its column; each ``fk`` rule is one anti-join
(broadcast when the reference is small).  Violation COUNTS, not
violating rows, cross the wire — auditing at 100 TB returns a
rule-sized table either way.

No counterpart in the reference (its validation is config-time only,
PartitionedFileSetSinkConfig.java:101-108 — schema presence, not data
content).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: list[tuple],
                       broadcast_refs: bool = True) -> DataFrame:
    """Evaluate ``rules`` against ``df`` → one row per rule:
    ``(rule_id, rule, col_name, n_violations)``; ``rule_id`` is the
    1-based position, so the output is stable and joinable against the
    rule definition.

    ``broadcast_refs`` controls the fk anti-join's build side: the
    default forces a broadcast (right for the usual small reference),
    but a reference with hundreds of millions of distinct keys would
    OOM the driver under a forced hint — pass ``False`` there and the
    planner picks a shuffle anti-join instead (r15 review: the hint
    was unconditional, contradicting the module's own 'broadcast when
    the reference is small')."""
    if not rules:
        raise ValueError("check_expectations needs at least one rule")

    scan_aggs = []     # (rule_id, kind, col, agg expr)
    other_rows = []    # DataFrames, one per unique/fk rule
    for i, rule in enumerate(rules, start=1):
        kind = rule[0]
        if kind == "not_null":
            _, col = rule
            scan_aggs.append((i, kind, col, F.sum(
                F.when(F.col(col).isNull(), 1).otherwise(0))))
        elif kind == "range":
            _, col, lo, hi = rule
            scan_aggs.append((i, kind, col, F.sum(
                F.when((F.col(col) < lo) | (F.col(col) > hi), 1)
                .otherwise(0))))
        elif kind == "unique":
            _, col = rule
            dup = (df.where(F.col(col).isNotNull())
                   .groupBy(col).agg(F.count(F.lit(1)).alias("_n"))
                   .where(F.col("_n") > 1)
                   .agg(F.coalesce(F.sum(F.col("_n") - 1), F.lit(0))
                        .alias("n_violations")))
            other_rows.append(dup.select(
                F.lit(i).alias("rule_id"), F.lit(kind).alias("rule"),
                F.lit(col).alias("col_name"),
                F.col("n_violations").cast("long")))
        elif kind == "fk":
            _, col, ref_df, ref_col = rule
            refs = (ref_df.where(F.col(ref_col).isNotNull())
                    .select(F.col(ref_col).alias(col)).distinct())
            if broadcast_refs:
                refs = F.broadcast(refs)
            orphans = (df.where(F.col(col).isNotNull())
                       .join(refs, col, "left_anti")
                       .agg(F.count(F.lit(1)).alias("n_violations")))
            other_rows.append(orphans.select(
                F.lit(i).alias("rule_id"), F.lit(kind).alias("rule"),
                F.lit(col).alias("col_name"),
                F.col("n_violations").cast("long")))
        else:
            raise ValueError(f"unknown expectation kind {kind!r}")

    parts = []
    if scan_aggs:
        wide = df.agg(*[a.alias(f"_r{i}") for i, _, _, a in scan_aggs])
        for i, kind, col, _ in scan_aggs:
            parts.append(wide.select(
                F.lit(i).alias("rule_id"), F.lit(kind).alias("rule"),
                F.lit(col).alias("col_name"),
                F.coalesce(F.col(f"_r{i}"), F.lit(0)).cast("long")
                .alias("n_violations")))
    parts.extend(other_rows)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
