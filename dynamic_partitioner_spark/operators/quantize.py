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


def _finite_matrix(vals: list, ctx: str) -> np.ndarray:
    """Validate a collected/Arrow vector batch into a clean float64
    row-matrix, failing LOUDLY on NULL vectors, ragged dimensions, or
    NaN/inf elements (Arrow delivers NULL ELEMENTS as NaN, which
    passes length checks — r13 review class).  The quantized operators
    are EXACT scorers: ``floor(NaN) .astype(int64)`` silently writes
    INT64_MIN garbage into grammians/scores, and a NaN code argmin
    silently lands in code 0 — corrupt input must raise, not skew
    (mirrors int8_grammian's existing shape check and
    decompose.second_moments' finite check)."""
    if any(v is None for v in vals):
        raise ValueError(
            f"{ctx}: NULL vector in input — filter NULL rows "
            "before quantizing")
    try:
        # NULL ELEMENTS inside a vector convert to NaN here (numpy
        # None→nan float casting) and are caught by the finite check;
        # ragged inputs raise numpy's inhomogeneous-shape ValueError,
        # re-raised with the operator-level diagnostic
        X = np.asarray(vals, dtype=np.float64)
    except (ValueError, TypeError):
        raise ValueError(
            f"{ctx}: ragged vector dimensions in input "
            f"(got lengths {sorted({len(v) for v in vals})})") from None
    if X.ndim != 2:
        raise ValueError(
            f"{ctx}: expected a batch of vectors, got ndim={X.ndim}")
    if not np.isfinite(X).all():
        raise ValueError(
            f"{ctx}: NaN/inf component in input (a NULL element "
            "arrives as NaN) — clean or filter before quantizing")
    return X


def quantize_embeddings(df: DataFrame, id_col: str,
                        vec_col: str) -> DataFrame:
    """Per-vector int8 quantization summary: ``(id, scale, qsum,
    qnorm2, max_abs_err)``.

    ``scale``/``max_abs_err`` are rounded to 8 decimals with the
    cross-engine floor trick; ``qsum``/``qnorm2`` are exact BIGINTs.
    A zero vector quantizes to all-zero with ``scale = 0``.  A NULL or
    EMPTY vector produces no output row (posexplode yields no element
    rows) — repair upstream if every id must survive.

    One posexplode + one hash-aggregate back to vector grain — the
    element work is a handful of codegen'd arithmetic ops; at scale
    prefer :func:`int8_grammian`'s Arrow pass when the quantized
    vectors themselves (not summaries) are the output.
    """
    emb = F.col(vec_col)
    maxabs = F.array_max(F.transform(emb, lambda x: F.abs(x)))
    # loud NaN guard (coalesce-over-assert_true, the interval_union
    # trick): a NaN element would otherwise reach ``cast("long")`` as
    # floor(NaN) and die with a cryptic ANSI CAST_INVALID_INPUT deep
    # in the plan.  Evaluated only for rows posexplode emits, so NULL/
    # empty vectors (whose ``clean`` is NULL) never trip the assert.
    clean = ~F.exists(emb, lambda x: F.isnan(x.cast("double")))
    nan_ok = F.assert_true(
        clean, F.lit("quantize_embeddings: NaN element in vector — "
                     "clean or filter before quantizing"))
    scale = F.when(maxabs == 0, F.lit(None)).otherwise(
        F.coalesce(nan_ok.cast("double"), maxabs.cast("double") / 127.0))
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
            X = _finite_matrix(vecs, "int8_grammian")
            if X.shape[1] != dim:
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
    ``floor(x/(max|x|/127) + 0.5)`` as :func:`quantize_embeddings`.
    Callers validate with :func:`_finite_matrix` first: a NaN here
    would flow through ``floor`` into ``astype(int64)`` as INT64_MIN
    garbage."""
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
    qscale, Qq = _quantize_np(_finite_matrix([r[1] for r in qrows],
                                             "int8_topk queries"))
    nq = len(qids)
    out_schema = ("query_id long, neighbor_id long, score_int long, "
                  "_raw double")

    def _score(it):
        for pdf in it:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            X = _finite_matrix(pdf[vec_col].tolist(), "int8_topk corpus")
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


# ----------------------------------------------------------------- PQ

def _sign_half(vec, lo_bit: int):
    """Bits ``lo_bit..lo_bit+31`` of the sign signature as one LONG:
    bit k set iff ``vec[k] > 0`` (exact float comparison — zero is
    negative-class).  A 32-term literal sum of CASE expressions stays
    inside whole-stage codegen; two halves because bit 63 would
    overflow signed int64."""
    return sum(
        (F.when(F.element_at(vec, k + 1) > 0,
                F.lit(1 << (k - lo_bit))).otherwise(F.lit(0))
         for k in range(lo_bit, lo_bit + 32)),
        F.lit(0)).cast("long")


def bq_topk(emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
            vec_col: str = "embedding", k: int = 5,
            dim: int = 64) -> DataFrame:
    """Exact top-k over BINARY-quantized vectors: 1-bit sign signatures
    (64 dims → two packed LONGs, a 32× memory cut over float32) ranked
    by Hamming distance — the binary-quantization retrieval path
    modern vector stores use as their cheapest tier.  Returns
    ``(query_id, neighbor_id, hamming, rank)``; self-matches excluded,
    ties broken by (hamming, neighbor_id).

    Everything is JVM Column arithmetic — the packing is a literal
    CASE sum inside codegen, the distance is
    ``bit_count(hi⊕hi) + bit_count(lo⊕lo)`` — so the DuckDB twin
    reproduces every value exactly (no floats anywhere past the sign
    comparison).  How well sign-bit Hamming tracks cosine rank is a
    property of the data and stays pinned in pytest, like the other
    quantized tiers.

    Scale shape: the bounded query SET broadcasts (the
    ``topk_bruteforce`` exact-baseline contract) and the corpus
    streams through the nested-loop scoring once — 16 bytes of
    signature per corpus row, never the float vectors; only the
    (corpus × n_queries) scored rows shuffle into the rank window.
    Vectors whose length differs from ``dim`` are excluded up front
    (mirrored by the oracle) rather than implicitly zero-padded.

    The two-LONG signature is wired for exactly 64 dims; other widths
    need ⌈dim/32⌉ packed words (and a matching oracle), so anything
    else is rejected here rather than silently truncating the vector
    (dim > 64) or reading past the array under ANSI mode (dim < 64).
    """
    if dim != 64:
        raise ValueError(
            f"bq_topk packs exactly 64 dims into its two signature "
            f"words; got dim={dim} — extend to ceil(dim/32) words "
            "(and the oracle twin) before widening")
    v = F.col(vec_col)
    q = (queries.where(F.size(v) == dim)
         .select(F.col(id_col).alias("query_id"),
                 _sign_half(v, 32).alias("_qhi"),
                 _sign_half(v, 0).alias("_qlo")))
    # spread the corpus scoring: the corpus projection is byte-small,
    # so the broadcast nested-loop's stream side ran on the scan's 1-2
    # partitions while every corpus row pays the 64-term packing CASE
    # and n_queries hamming evaluations (the r16 shingle-join
    # collapse, cross-join flavor).  The repartition sits BEFORE the
    # signature projection so the packing itself runs wide too.
    # Round-robin relocation only — every scored row identical.
    from ..functions.partitioning import spread_if_narrow
    c = (spread_if_narrow(emb.where(F.size(v) == dim))
         .select(F.col(id_col).alias("neighbor_id"),
                 _sign_half(v, 32).alias("_chi"),
                 _sign_half(v, 0).alias("_clo")))
    hamming = (F.bit_count(F.col("_chi").bitwiseXOR(F.col("_qhi")))
               + F.bit_count(F.col("_clo").bitwiseXOR(F.col("_qlo"))))
    scored = (c.crossJoin(F.broadcast(q))
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      hamming.cast("int").alias("hamming")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("hamming").asc(), F.col("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def sign_half_sql(col: str, lo_bit: int) -> str:
    """DuckDB twin of :func:`_sign_half` — the identical 32-term CASE
    sum over 1-based list indexing."""
    terms = " + ".join(
        f"CASE WHEN {col}[{k + 1}] > 0 THEN {1 << (k - lo_bit)} "
        f"ELSE 0 END"
        for k in range(lo_bit, lo_bit + 32))
    return f"CAST({terms} AS BIGINT)"


def train_pq_codebooks(emb: DataFrame, vec_col: str = "embedding",
                       id_col: str = "vec_id", dim: int = 64,
                       m: int = 8, ksub: int = 16,
                       sample_size: int = 2048,
                       iters: int = 5) -> np.ndarray:
    """Deterministic product-quantization codebooks (Jégou et al.,
    *Product Quantization for Nearest Neighbor Search*, TPAMI 2011):
    the vector splits into ``m`` subvectors of ``dim/m`` dims, each
    subspace gets its own ``ksub``-centroid Lloyd's k-means codebook.

    Same bounded-collect training recipe as the IVF coarse quantizer
    (``similarity.train_centroids``): id-ordered capped sample,
    first-k init, fixed iterations → identical data gives identical
    codebooks, which the driver's re-run check requires.  Returns
    ``(m, ksub, dim/m)`` float64.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    # the same NULL/NaN/ragged-robust bounded sample the IVF trainer
    # uses (r13 fixed train_centroids; this trainer had the identical
    # exposure — one NaN row silently poisons every subspace codebook
    # through the Lloyd update)
    from .similarity import _rectangular_sample
    try:
        sample = _rectangular_sample(emb, vec_col, id_col, sample_size)
    except ValueError:
        # zero usable rows — keep this trainer's pinned, ksub-specific
        # diagnostic rather than the sampler's generic one
        sample = np.empty((0, dim))
    if sample.shape[0] < ksub:
        raise ValueError(
            f"PQ training needs at least ksub={ksub} rows of "
            f"{dim}-dim vectors; got {sample.shape[0]} usable rows "
            f"(corpus smaller than ksub, or ragged/empty {vec_col!r}) — "
            f"lower ksub or raise sample_size")
    if sample.shape[1] != dim:
        raise ValueError(
            f"vectors are {sample.shape[1]}-dim but dim={dim} — training "
            "on a prefix/short slice would silently misrank (pass the "
            "real dimension)")
    books = np.zeros((m, ksub, dsub))
    for j in range(m):
        sub = sample[:, j * dsub:(j + 1) * dsub]
        cents = sub[:ksub].copy()
        for _ in range(iters):
            # ‖x−c‖² = ‖x‖² − 2x·c + ‖c‖²; ‖x‖² is constant per row so
            # the argmin needs only the matmul form (same trick as the
            # IVF assignment UDF)
            d2 = (-2.0 * (sub @ cents.T)
                  + (cents ** 2).sum(1)[None, :])
            assign = d2.argmin(1)
            # vectorized Lloyd update (np.add.at is deterministic, so
            # identical data still gives identical codebooks)
            sums = np.zeros((ksub, dsub))
            counts = np.zeros(ksub)
            np.add.at(sums, assign, sub)
            np.add.at(counts, assign, 1)
            nz = counts > 0
            cents[nz] = sums[nz] / counts[nz][:, None]
        books[j] = cents
    return books.round(6)


def pq_encode(emb: DataFrame, books: np.ndarray, id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Encode every vector as its ``m`` nearest-centroid codes — 8
    bytes instead of 256 for a 64-dim float32 vector (32× compression,
    the storage format FAISS-style IVF-PQ indexes shuffle and store).
    One Arrow map pass, codes via per-subspace argmin; zero shuffles.
    Returns ``(id, codes array<int>)``.
    """
    m, ksub, dsub = books.shape
    B = books.copy()

    @F.pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        X = _finite_matrix(v.tolist(), "pq_encode")
        if X.shape[1] != m * dsub:
            raise ValueError(
                f"expected {m * dsub}-dim vectors, got shape {X.shape} "
                "(corrupt input should fail loudly, not encode a prefix)")
        out = np.zeros((len(X), m), dtype=np.int32)
        for j in range(m):
            sub = X[:, j * dsub:(j + 1) * dsub]
            d2 = (-2.0 * (sub @ B[j].T)
                  + (B[j] ** 2).sum(1)[None, :])
            out[:, j] = d2.argmin(1)
        return pd.Series(list(out))

    return emb.select(F.col(id_col), _enc(F.col(vec_col)).alias("codes"))


def pq_topk(emb: DataFrame, queries: DataFrame, books: np.ndarray,
            id_col: str = "vec_id", vec_col: str = "embedding",
            k: int = 5) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: each query
    precomputes an ``(m × ksub)`` table of exact subvector dot products
    against the codebooks; a corpus row's approximate dot product is
    then ``m`` table lookups over its codes — no float vector ever
    read at scan time.

    Approximate by construction (codes quantize the corpus); recall vs
    the exact scorer is pinned in tests, the standard ANN contract
    (candidate selection is data-dependent;
    the driver key hash-checks per-query invariants, r8).  One Arrow pass over the encoded corpus;
    per-query rank window on the scored rows.
    """
    m, ksub, dsub = books.shape
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        raise ValueError("queries must be non-empty")
    qids = np.asarray([int(r[0]) for r in qrows], dtype=np.int64)
    Q = _finite_matrix([r[1] for r in qrows], "pq_topk queries")
    # lut[q, j, c] = dot(query_sub_j, codebook[j][c])
    lut = np.einsum("qjd,jcd->qjc",
                    Q.reshape(len(Q), m, dsub), books)
    nq = len(qids)
    codes_df = pq_encode(emb, books, id_col, vec_col)

    @F.pandas_udf("array<double>")
    def _scores(codes: pd.Series) -> pd.Series:
        C = np.asarray(codes.tolist(), dtype=np.int64)      # (n, m)
        # gather per query: scores[n, q] = Σ_j lut[q, j, C[n, j]]
        s = lut[np.arange(nq)[None, :, None],
                np.arange(m)[None, None, :],
                C[:, None, :]].sum(-1)                      # (n, nq)
        return pd.Series(list(s))

    scored = codes_df.select(
        F.col(id_col).alias("neighbor_id"),
        F.posexplode(_scores(F.col("codes"))).alias("_qi", "score"))
    qmap = F.array(*[F.lit(int(q)) for q in qids])
    scored = (scored.withColumn("query_id",
                                F.element_at(qmap, F.col("_qi") + 1))
              .where(F.col("neighbor_id") != F.col("query_id")))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("score").desc(), F.col("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    _round8(F.col("score")).alias("score"), "rank"))


def pq_topk_rerank(emb: DataFrame, queries: DataFrame, books: np.ndarray,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   k: int = 5, shortlist: int = 4) -> DataFrame:
    """PQ shortlist → exact rerank (the production IVF-PQ shape): ADC
    scores select ``shortlist·k`` candidates per query from the
    compressed codes, then ONLY those rows read their float vectors for
    an exact dot-product rerank to the final top-k.  At 100 TB the scan
    touches 8-byte codes, not 256-byte vectors; the exact pass touches
    ``shortlist·k`` rows per query.

    Recall vs the exact scorer is pinned in tests; the driver key
    hash-checks per-query structural invariants (r8).
    """
    cand = (pq_topk(emb, queries, books, id_col, vec_col,
                    k=shortlist * k)
            .select("query_id", "neighbor_id"))
    qrows = queries.select(id_col, vec_col).collect()
    qmap = {int(r[0]): np.asarray(r[1], dtype=np.float64) for r in qrows}

    vecs = emb.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("_v"))
    joined = cand.join(vecs, "neighbor_id")

    @F.pandas_udf("double")
    def _exact(qid: pd.Series, v: pd.Series) -> pd.Series:
        X = _finite_matrix(v.tolist(), "pq_topk_rerank exact pass")
        Qm = np.asarray([qmap[int(q)] for q in qid])
        return pd.Series((X * Qm).sum(1))

    scored = joined.select(
        "query_id", "neighbor_id",
        _exact(F.col("query_id"), F.col("_v")).alias("_raw"))
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("_raw").desc(), F.col("neighbor_id")))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    _round8(F.col("_raw")).alias("score"), "rank"))
