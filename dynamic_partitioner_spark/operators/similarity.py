"""Approximate-nearest-neighbor search over an ``array<float>`` embedding
column (north-star extension surface, SURVEY.md §2.9).

Two strategies:

* **brute-force top-k** — the exactness baseline.  The query set is
  broadcast (it is small by construction), so the big side is a single
  map-only scan: no shuffle of the corpus, embarrassingly parallel at
  100 TB.  Per-query top-k via window ranking.
* **sign-LSH bucketed** — random-hyperplane signatures (deterministic,
  seeded) bucket the corpus; each query only scans its own bucket
  (plus hamming-1 neighbor buckets for recall).  The corpus is hashed
  once — at scale you would persist the bucketed table and prune
  buckets at read time via partition pruning on ``bucket``.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _rank_window(qcol: str) -> Window:
    # deterministic ordering: rounded sim desc, then neighbor id
    return (Window.partitionBy(qcol)
            .orderBy(F.col("cos_sim").desc(), F.col("neighbor_id")))


def topk_bruteforce(emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", k: int = 5) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    ``queries`` must be small (it is broadcast).  Returns
    (query_id, neighbor_id, cos_sim, rank), self-matches excluded.
    """
    q = F.broadcast(queries.select(F.col(id_col).alias("query_id"),
                                   F.col(vec_col).alias("qv")))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"))
    scored = (c.crossJoin(q)
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 4)
                      .alias("cos_sim")))
    ranked = scored.withColumn("rank",
                               F.row_number().over(_rank_window("query_id")))
    return ranked.where(F.col("rank") <= k)


# ------------------------------------------------------------- sign LSH

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bit per hyperplane, packed into an int."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(F.zip_with(vec, plane,
                                   lambda x, y: x.cast("double") * y),
                        F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(d > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    return bucket


def topk_ann_lsh(emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 5, n_planes: int = 6,
                 n_tables: int = 4, dim: int = 64, seed: int = 42,
                 probe_hamming1: bool = True) -> DataFrame:
    """Approximate top-k: L independent sign-LSH tables (standard
    recall amplification — a pair colliding in ANY table becomes a
    candidate), each multi-probed at hamming distance 1 from the
    query's bucket.  The corpus is hashed in one narrow pass (all table
    buckets in one projection); the join key is (table, bucket), so the
    corpus shuffles once regardless of L.  Same output schema as
    :func:`topk_bruteforce`.
    """
    def bucket_entries(vec: Column) -> Column:
        return F.array(*[
            F.struct(F.lit(t).alias("tbl"),
                     sign_bucket(vec, _hyperplanes(dim, n_planes, seed + t))
                     .alias("bucket"))
            for t in range(n_tables)
        ])

    c = (emb.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("cv"),
                    F.explode(bucket_entries(F.col(vec_col))).alias("b"))
         .select("neighbor_id", "cv", "b.tbl", "b.bucket"))
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv"),
                         F.explode(bucket_entries(F.col(vec_col))).alias("b"))
          .select("query_id", "qv", "b.tbl", F.col("b.bucket").alias("qbucket")))
    if probe_hamming1:
        probes = F.array(F.col("qbucket"),
                         *[F.col("qbucket").bitwiseXOR(F.lit(2 ** j))
                           for j in range(n_planes)])
        qb = qb.select("query_id", "qv", "tbl",
                       F.explode(probes).alias("bucket"))
    else:
        qb = qb.withColumnRenamed("qbucket", "bucket")
    scored = (c.join(F.broadcast(qb), ["tbl", "bucket"])
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      F.round(cosine(F.col("qv"), F.col("cv")), 4)
                      .alias("cos_sim"))
              .distinct())
    ranked = scored.withColumn("rank",
                               F.row_number().over(_rank_window("query_id")))
    return ranked.where(F.col("rank") <= k)
