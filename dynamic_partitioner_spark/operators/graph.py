"""Iterative graph analytics on DataFrames — PageRank (Brin & Page
1998) as the representative fixed-iteration power method, alongside
the label-propagation connected components in ``operators/dedup``.

Shape per iteration: one join (edges × current ranks on the source)
and one aggregate (contributions by destination) — both keyed on node
ids, so co-partitioning carries across iterations; the dangling-node
mass is a single 1-row aggregate collected per iteration (bounded
driver state).  Lineage is truncated with ``localCheckpoint`` every
few rounds, the same guard the cluster-resolution loop uses — without
it the plan doubles per iteration.

Rows-only by nature (iterative float ranks have no SQL twin);
convergence and known-graph rankings are pinned in tests/test_graph.py.
No counterpart in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src_col: str, dst_col: str,
             n_iter: int = 8, damping: float = 0.85,
             checkpoint_every: int = 1) -> DataFrame:
    """PageRank over the directed edge relation → ``(node, rank)`` for
    every node appearing as a source or destination.  Fixed
    ``n_iter`` power iterations, uniform teleport, dangling mass
    redistributed uniformly each round (so total rank stays 1)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    # out-degree folded into the edge relation ONCE — iterations then
    # need a single join against the current ranks
    ew = (e.join(e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")),
                 "src").cache())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct()
             # nodes with no out-edges carry the dangling flag so the
             # dangling mass is a conditional sum, not a second join
             .join(ew.select(F.col("src").alias("node")).distinct()
                   .withColumn("_has_out", F.lit(True)),
                   "node", "left")
             .select("node", F.coalesce("_has_out", F.lit(False))
                     .alias("has_out"))
             .localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        ew.unpersist()
        return nodes.select("node").withColumn("rank", F.lit(0.0))
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n
    for i in range(n_iter):
        # dangling mass as a broadcast 1-row aggregate — stays inside
        # the iteration's single job instead of a separate collect
        dang = ranks.agg(F.coalesce(
            F.sum(F.when(~F.col("has_out"), F.col("rank"))),
            F.lit(0.0)).alias("_dm"))
        contribs = (ew.join(ranks.select(F.col("node").alias("src"),
                                         "rank"), "src")
                    .select(F.col("dst").alias("node"),
                            (F.col("rank") / F.col("deg")).alias("c"))
                    .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contribs, "node", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node", "has_out",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.col("_dm") / F.lit(float(n))))
                         .alias("rank")))
        # default: truncate every round so each materialization is one
        # iteration deep; raise checkpoint_every on small fast graphs
        # to trade lineage depth for fewer eager jobs
        if (i + 1) % checkpoint_every == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint(eager=True)
    ew.unpersist()
    return ranks.select("node", "rank")
