"""Parallelism guards for exploding joins.

The r16 collapse family: pair/scoring self-joins over byte-small
relations plan as broadcast joins whose STREAM side runs directly on
the source scan's partitions.  With single-file (or post-filter
few-partition) inputs that is 1-2 tasks folding m²/2 exploded rows —
CPU volume that byte-based split sizing and AQE's advisory-size
coalescing cannot see.

:func:`spread_if_narrow` is the shared guard: an explicit-count
repartition (exempt from AQE partition coalescing) applied ONLY when
the relation's planned partition count is below the cluster's
``defaultParallelism``.  On wide inputs — the 100 TB case, where the
scan layout already provides the parallelism — it is a no-op, so the
spread never adds a shuffle, caps a large join at a fixed width, or
forfeits AQE's skew splitting there (r16 review).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_if_narrow(df: DataFrame, *cols: str,
                     probe: DataFrame | None = None) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it is planned
    narrower than that — by ``cols`` (hash; use for high-cardinality
    join keys so the exchange is reusable by the join) or round-robin
    with no cols (use when the join key has too few distinct values
    to spread, or for a broadcast join's stream side, which needs no
    particular partitioning).  Pure relocation: row content is
    untouched.

    The width probe (``.rdd.getNumPartitions()``) runs on ``probe``
    when given, else on ``df``.  CAVEAT (r16 ADVICE): with AQE on,
    ``.rdd`` over a plan containing exchanges MATERIALIZES its query
    stages — real Spark jobs at operator-construction time, running
    any upstream aggregate/broadcast twice.  Callers must hand this
    function an exchange-free relation: probe/spread BEFORE joining
    in broadcast subtrees (a BroadcastHashJoin preserves stream-side
    partitioning, so the spread carries through), or pass an eagerly
    ``localCheckpoint``-ed upstream whose partition count equals the
    target's planned width (``probe=``).  On exchange-free plans the
    probe only forces physical planning — no job runs."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() >= n:
        return df
    if cols:
        return df.repartition(n, *cols)
    return df.repartition(n)
