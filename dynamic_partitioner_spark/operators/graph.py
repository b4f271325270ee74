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

The iterative float ranks themselves have no SQL twin — the driver
key certifies exact BIGINT graph-structure columns plus
teleport-floor / mass-conservation booleans (r8); convergence and
known-graph rankings are pinned in tests/test_graph.py.
No counterpart in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.checkpoint import checkpoint_df


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
                     .alias("has_out")))
    nodes = checkpoint_df(nodes)
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
            ranks = checkpoint_df(ranks)
    ew.unpersist()
    return ranks.select("node", "rank")


def triangle_stats(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Exact triangle census + global clustering coefficient over an
    undirected edge list — the standard community-structure probe
    (Watts & Strogatz 1998 for the coefficient; the degree-ordered
    join algorithm is the classic MapReduce formulation, Suri &
    Vassilvitskii 2011).

    Algorithm (fully distributed, every step a keyed join/agg):
      1. canonicalize + dedup edges (min,max) — self-loops dropped;
      2. degree per vertex (one agg over the exploded endpoints);
      3. orient every edge from the LOWER (degree, id) rank to the
         higher — each triangle then has exactly one "apex" vertex
         with two outgoing oriented edges, so joining oriented edges
         on the apex and probing the closing edge counts each
         triangle ONCE, and the per-vertex join fan-out is bounded by
         O(√m) (the whole point: a hub with degree d contributes
         C(d,2) wedges UNoriented but only C(out,2) ≤ O(m) oriented —
         the skew killer at 100 TB edge lists);
      4. wedge total Σ C(deg,2) in exact BIGINTs (deg·(deg−1) is
         even, so the truncating div-2 is exact);
      5. coefficient = 3·T / wedges — one double division over exact
         integers, rounded to 4 dp.

    Output is a single row: n_vertices, n_edges, n_wedges,
    n_triangles, global_cc.
    """
    from ..functions.vectors import round4

    a, b = F.col(a_col), F.col(b_col)
    und = (edges.select(F.least(a, b).alias("u"),
                        F.greatest(a, b).alias("v"))
           .where(F.col("u") != F.col("v"))
           .distinct())
    # the canonical edge set feeds THREE consumers (degrees, the
    # oriented join, the closing-edge probe) — materialize it once or
    # Spark re-derives the upstream edge construction (often an
    # expensive self-join) per branch.  localCheckpoint (not cache):
    # lineage truncation keeps the census job's stages small — an
    # InMemoryRelation here measured ~1.5x slower end-to-end.  The
    # blocks do NOT pin for the session: the returned row is itself
    # checkpointed below, so nothing reachable references this RDD
    # after return and the ContextCleaner reclaims it on GC — a
    # session sweeping many SFs does not accumulate edge sets.
    und = checkpoint_df(und)
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    # orient by (deg, node) rank: lo -> hi
    du = deg.select(F.col("node").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("deg").alias("dv"))
    e = (und.join(du, "u").join(dv, "v")
         .select(
             F.when((F.col("du") < F.col("dv"))
                    | ((F.col("du") == F.col("dv"))
                       & (F.col("u") < F.col("v"))),
                    F.col("u")).otherwise(F.col("v")).alias("lo"),
             F.when((F.col("du") < F.col("dv"))
                    | ((F.col("du") == F.col("dv"))
                       & (F.col("u") < F.col("v"))),
                    F.col("v")).otherwise(F.col("u")).alias("hi")))
    # spread the wedge fold: the oriented edge list is byte-small (the
    # checkpointed blocks span 1-2 partitions, so the self-join's
    # stream side ran on 1-2 of 32 cores) but the join explodes
    # C(out_deg, 2) wedge rows per apex — CPU volume byte-based split
    # sizing cannot see (the r16 shingle-join fix, same shape; no-op
    # on already-wide inputs).  Pure relocation, every wedge and
    # triangle unchanged.  Probe the eagerly-checkpointed ``und``
    # (its RDD already exists, so the probe costs nothing), not ``e``:
    # e's plan contains the two broadcast degree joins, and probing
    # THROUGH a broadcast subtree materializes the degree aggregate as
    # an extra job per call (r16 ADVICE); the joins preserve und's
    # stream-side partitioning, so the counts are interchangeable.
    from ..functions.partitioning import spread_if_narrow
    e = spread_if_narrow(e, "lo", probe=und)
    e1 = e.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    e2 = e.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedge = (e1.join(e2, "apex")
             .where(F.col("x") < F.col("y")))
    # wedge guarantees x < y, so the closing edge in canonical
    # (u<v) form is exactly (x, y) — a single-direction semi-join probe
    tri = wedge.join(
        und.select(F.col("u").alias("x"), F.col("v").alias("y")),
        ["x", "y"], "left_semi")
    n_tri = tri.agg(F.count(F.lit(1)).alias("n_triangles"))
    stats = und.agg(F.count(F.lit(1)).alias("n_edges"))
    nv = deg.agg(F.count(F.lit(1)).alias("n_vertices"),
                 F.sum(F.expr("(deg * (deg - 1)) div 2"))
                 .alias("n_wedges"))
    # NULL coefficient when the graph has no wedges (every vertex
    # degree ≤ 1): an unguarded division crashes under Spark's default
    # ANSI mode while DuckDB returns NULL — guard both engines to NULL
    out = (nv.join(stats).join(n_tri)
           .select("n_vertices", "n_edges", "n_wedges", "n_triangles",
                   F.when(F.col("n_wedges") > 0,
                          round4(F.lit(3.0) * F.col("n_triangles")
                                 / F.col("n_wedges")))
                   .alias("global_cc")))
    # run the census NOW (1-row result — the eager job is the whole
    # point of the operator); checkpointing the output truncates the
    # plan's reference to the edge blocks, which releases them (via
    # GC + ContextCleaner) instead of leaking for the session lifetime
    out = checkpoint_df(out)
    return out


def neighbor_jaccard(edges: DataFrame, src_col: str, dst_col: str,
                     min_shared: int = 2, top: int = 50,
                     max_degree: int | None = None) -> DataFrame:
    """Shared-neighbor Jaccard between SOURCE nodes of a (bipartite)
    edge list — the classic structural link-prediction / entity-
    similarity score (Liben-Nowell & Kleinberg 2003, *The Link
    Prediction Problem for Social Networks*): two sources are similar
    when their destination neighborhoods overlap.

    Inverted-index shape (``ngram_jaccard_pairs``' shingle pattern
    applied to graphs): the self-join keys on the DESTINATION, so only
    pairs that actually share a neighbor materialize;
    ``|N(a) ∪ N(b)| = deg(a) + deg(b) − shared`` from per-source
    degrees, so neighbor SETS never shuffle.  A destination adjacent
    to m sources contributes C(m,2) join rows — the hot-key term — so
    ``max_degree`` drops hub destinations via a broadcast anti-join
    (same guard as ``max_shingle_df``): a deterministic
    under-approximation that only removes pairs, applied identically
    by the SQL oracle.  Jaccard is a ratio of exact small ints
    (union ≥ shared ≥ 1, ANSI-safe), so round4 hashes identically
    cross-engine.  Returns the top-``top`` pairs by
    (jaccard DESC, id_a, id_b) with a dense 1..top ``rnk`` —
    ``orderBy().limit()`` plans TakeOrderedAndProject (per-partition
    top-k), and the rank window then runs over ≤ ``top`` rows.
    """
    from pyspark.sql import Window

    from ..functions.vectors import round4

    e = (edges.select(F.col(src_col).alias("s"),
                      F.col(dst_col).alias("d"))
         .where(F.col("s").isNotNull() & F.col("d").isNotNull())
         .distinct())
    # materialize the canonical edge set ONCE: it feeds the hot-key
    # aggregate, the anti-join main side, the degree aggregate and
    # both self-join sides — without this every consumer re-derives
    # the (often expensive) upstream edge construction per branch
    # (r16: the co-purchase entry's orders⋈lineitem join appeared 5×,
    # 16 scans in the executed plan).  Same localCheckpoint posture
    # as triangle_stats' und — lineage truncation, blocks reclaimed
    # by the ContextCleaner once the result is returned.
    e = checkpoint_df(e)
    e_ck = e      # exchange-free probe target for the spread below
    if max_degree is not None:
        hot = (e.groupBy("d").agg(F.count(F.lit(1)).alias("_n"))
               .where(F.col("_n") > max_degree).select("d"))
        e = e.join(F.broadcast(hot), "d", "left_anti")
    deg = e.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # spread the per-destination pair fold: the checkpointed edge
    # blocks span 1-2 partitions while the self-join explodes C(m,2)
    # rows per destination (the r16 shingle-join fix, same shape;
    # no-op on already-wide inputs).  Pure relocation, every pair
    # count unchanged.  Probe the checkpointed edge set (RDD already
    # exists — zero cost), not the post-anti-join plan, whose
    # broadcast subtree the probe would materialize as an extra
    # hot-key-aggregate job per call (r16 ADVICE); the anti-join
    # preserves stream-side partitioning, so the counts match.
    from ..functions.partitioning import spread_if_narrow
    e2 = spread_if_narrow(e, "d", probe=e_ck)
    a = e2.select(F.col("s").alias("id_a"), "d")
    b = e2.select(F.col("s").alias("id_b"), "d")
    pairs = (a.join(b, "d").where(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b")
             .agg(F.count(F.lit(1)).alias("shared"))
             .where(F.col("shared") >= min_shared))
    da = deg.select(F.col("s").alias("id_a"), F.col("deg").alias("_da"))
    db = deg.select(F.col("s").alias("id_b"), F.col("deg").alias("_db"))
    scored = (pairs.join(da, "id_a").join(db, "id_b")
              .select("id_a", "id_b", "shared",
                      round4(F.col("shared").cast("double")
                             / (F.col("_da") + F.col("_db")
                                - F.col("shared"))).alias("jaccard")))
    ranked = scored.orderBy(F.col("jaccard").desc(), "id_a", "id_b") \
                   .limit(top)
    w = Window.orderBy(F.col("jaccard").desc(), "id_a", "id_b")
    return (ranked.withColumn("rnk", F.row_number().over(w))
            .select("id_a", "id_b", "shared", "jaccard", "rnk"))


def triangle_stats_sql(a: str, b: str, edges_from: str) -> str:
    """DuckDB twin of :func:`triangle_stats` (same orientation, same
    integer wedge arithmetic, same round4)."""
    return f"""
        WITH und AS (
            SELECT DISTINCT least({a}, {b}) AS u, greatest({a}, {b}) AS v
            FROM {edges_from} WHERE {a} <> {b}),
        deg AS (
            SELECT node, count(*) AS deg FROM (
                SELECT u AS node FROM und
                UNION ALL SELECT v FROM und) x GROUP BY node),
        e AS (
            SELECT CASE WHEN du.deg < dv.deg
                          OR (du.deg = dv.deg AND und.u < und.v)
                        THEN und.u ELSE und.v END AS lo,
                   CASE WHEN du.deg < dv.deg
                          OR (du.deg = dv.deg AND und.u < und.v)
                        THEN und.v ELSE und.u END AS hi
            FROM und
            JOIN deg du ON du.node = und.u
            JOIN deg dv ON dv.node = und.v),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM e e1 JOIN e e2
              ON e1.lo = e2.lo AND e1.hi < e2.hi
            WHERE EXISTS (SELECT 1 FROM und
                          WHERE und.u = e1.hi AND und.v = e2.hi)),
        nv AS (SELECT count(*) AS n_vertices,
                      CAST(sum((deg * (deg - 1)) // 2) AS BIGINT)
                          AS n_wedges
               FROM deg),
        ne AS (SELECT count(*) AS n_edges FROM und)
        SELECT n_vertices, n_edges, n_wedges, n_triangles,
               CASE WHEN n_wedges > 0 THEN
                   floor(3.0 * n_triangles / n_wedges * 10000 + 0.5)
                   / 10000
               END AS global_cc
        FROM nv, ne, tri
    """
