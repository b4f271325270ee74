"""Int8 embedding quantization + quantized grammian (north-star
extension surface; the reference has no vector ops — SURVEY.md §2.9's
embedding family, extended toward the storage/compute shapes a 100 TB
embedding corpus actually needs).

* :func:`quantize_embeddings` — per-vector symmetric int8 quantization
  (``scale = max|x|/127``, ``q = floor(x/scale + 0.5)``) with exact
  integer summaries (``sum q``, ``sum q²``) and the max reconstruction
  error.  4× smaller than float32 at <0.4% typical error — the standard
  precursor to int8 ANN / GEMM.  Every step is a deterministic IEEE
  operation identical in Spark and DuckDB, so the driver oracle matches
  bit-for-bit (the half-up ``floor(x+0.5)`` avoids banker's-rounding
  divergence, same trick as ``vectors.round4``).
* :func:`int8_grammian` — Gᵢⱼ = Σ_vec qᵢ·qⱼ (upper triangle), the XᵀX
  building block for PCA / whitening / covariance over an embedding
  corpus.  Integer products accumulated as BIGINT are exact and
  order-independent — unlike a float grammian, the distributed sum is
  reproducible and oracle-checkable regardless of partitioning.
* :func:`int8_topk` — exact top-k neighbor scoring over the quantized
  vectors (integer dots + per-vector rescale), the int8-GEMM ANN path
  with value-exact cross-engine results.

Scale shape (grammian): one Arrow ``mapInPandas`` pass emits a d×d
partial matrix per batch (numpy int64 ``Qᵀ·Q`` — the map-side combine),
then ONE aggregation shuffle of (batches × d²) tiny rows.  No per-pair
explode: the d² work happens inside the matmul, and the shuffled volume
is independent of corpus size.  This is the tree-aggregation pattern
Spark ML uses for covariance, expressed over DataFrames.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ROUND8_SQL = "floor(({x}) * 100000000 + 0.5) / 100000000"


def _round8(c):
    """Cross-engine 8-decimal rounding (floor half-up — see
    ``vectors.round4`` for why not ``F.round``)."""
    return F.floor(c * 100000000 + F.lit(0.5)) / 100000000


def quantize_embeddings(df: DataFrame, id_col: str,
                        vec_col: str) -> DataFrame:
    """Per-vector int8 quantization summary: ``(id, scale, qsum,
    qnorm2, max_abs_err)``.

    ``scale``/``max_abs_err`` are rounded to 8 decimals with the
    cross-engine floor trick; ``qsum``/``qnorm2`` are exact BIGINTs.
    A zero vector quantizes to all-zero with ``scale = 0``.

    One posexplode + one hash-aggregate back to vector grain — the
    element work is a handful of codegen'd arithmetic ops; at scale
    prefer :func:`int8_grammian`'s Arrow pass when the quantized
    vectors themselves (not summaries) are the output.
    """
    emb = F.col(vec_col)
    maxabs = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    scale = F.when(maxabs == 0, F.lit(None)).otherwise(
        maxabs.cast("double") / 127.0)
    base = df.select(F.col(id_col), scale.alias("_scale"),
                     F.posexplode(emb).alias("_i", "_x"))
    x = F.col("_x").cast("double")
    qv = F.when(F.col("_scale").isNull(), F.lit(0)).otherwise(
        F.floor(x / F.col("_scale") + 0.5)).cast("long")
    el = base.select(id_col, "_scale", x.alias("_xd"), qv.alias("_q"))
    return (el.groupBy(id_col)
            .agg(_round8(F.coalesce(F.first("_scale"), F.lit(0.0)))
                 .alias("scale"),
                 F.sum("_q").alias("qsum"),
                 F.sum(F.col("_q") * F.col("_q")).alias("qnorm2"),
                 _round8(F.max(F.abs(
                     F.col("_xd") - F.col("_q")
                     * F.coalesce(F.col("_scale"), F.lit(0.0)))))
                 .alias("max_abs_err")))


def int8_grammian(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Upper-triangle quantized grammian ``(i, j, g)`` with
    ``g = Σ_vec q_i·q_j`` as exact BIGINT (0-based ``i <= j``).

    Quantization matches :func:`quantize_embeddings` element-for-
    element (same ``floor(x/scale + 0.5)`` in float64).  Vectors not of
    length ``dim`` are rejected inside the pass (corrupt input should
    fail loudly, not silently skew the matrix).
    """
    out_schema = "i int, j int, g long"
    iu, ju = np.triu_indices(dim)

    def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.int64)
        seen = False
        for pdf in it:
            vecs = pdf[vec_col].tolist()
            if not vecs:
                continue
            X = np.asarray(vecs, dtype=np.float64)
            if X.ndim != 2 or X.shape[1] != dim:
                raise ValueError(
                    f"expected {dim}-dim vectors, got shape {X.shape}")
            maxabs = np.max(np.abs(X), axis=1, keepdims=True)
            scale = maxabs / 127.0
            with np.errstate(divide="ignore", invalid="ignore"):
                Q = np.floor(X / scale + 0.5)
            Q[np.repeat(maxabs == 0, dim, axis=1)] = 0.0
            Qi = Q.astype(np.int64)
            acc += Qi.T @ Qi
            seen = True
        if seen:
            yield pd.DataFrame({"i": iu.astype("int32"),
                                "j": ju.astype("int32"),
                                "g": acc[iu, ju]})

    partials = df.select(vec_col).mapInPandas(_partials, out_schema)
    return (partials.groupBy("i", "j").agg(F.sum("g").alias("g")))


def _quantize_np(X: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(scale, Q) for a float64 row-matrix — the same deterministic
    ``floor(x/(max|x|/127) + 0.5)`` as :func:`quantize_embeddings`."""
    maxabs = np.max(np.abs(X), axis=1, keepdims=True)
    scale = maxabs / 127.0
    with np.errstate(divide="ignore", invalid="ignore"):
        Q = np.floor(X / scale + 0.5)
    Q[np.repeat(maxabs == 0, X.shape[1], axis=1)] = 0.0
    return scale[:, 0], Q.astype(np.int64)


def int8_topk(emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
              vec_col: str = "embedding", k: int = 5) -> DataFrame:
    """Exact top-k over int8-quantized vectors: integer dot products
    (the int8-GEMM ANN scoring path) rescaled by the two per-vector
    scales.  Returns (query_id, neighbor_id, score_int, score, rank);
    self-matches excluded, ties broken by neighbor id.

    ``score_int = q_a·q_b`` is exact BIGINT; ``score = score_int ·
    scale_a · scale_b`` multiplies three identical-valued doubles
    left-to-right in both engines, so even the float rescale is
    bit-reproducible and the driver oracle matches on values, not just
    ranks.

    Scale shape: queries are collected (bounded — the query set is
    small by construction, same contract as ``topk_bruteforce``) and
    closed over; the corpus side is ONE Arrow ``mapInPandas`` scan
    computing an (batch × n_queries) int64 matmul — zero corpus
    shuffle; only the (corpus × n_queries) scored rows shuffle into
    the per-query rank window.
    """
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        raise ValueError("queries must be non-empty")
    qids = [int(r[0]) for r in qrows]
    qscale, Qq = _quantize_np(np.asarray([r[1] for r in qrows],
                                         dtype=np.float64))
    nq = len(qids)
    out_schema = ("query_id long, neighbor_id long, score_int long, "
                  "_raw double")

    def _score(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
            xscale, Xq = _quantize_np(X)
            D = Xq @ Qq.T                               # int64, exact
            raw = D * xscale[:, None] * qscale[None, :]
            yield pd.DataFrame({
                "query_id": np.repeat(np.asarray(qids, dtype=np.int64)
                                      [None, :], len(ids), axis=0).ravel(),
                "neighbor_id": np.repeat(ids, nq),
                "score_int": D.ravel(),
                "_raw": raw.ravel(),
            })

    scored = (emb.select(id_col, vec_col).mapInPandas(_score, out_schema)
              .where(F.col("neighbor_id") != F.col("query_id")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("_raw").desc(), F.col("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score_int",
                    _round8(F.col("_raw")).alias("score"), "rank"))
