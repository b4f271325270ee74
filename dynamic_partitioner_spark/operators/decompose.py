"""PCA / whitening projection over an embedding column (north-star
extension surface; the reference has no linear algebra — SURVEY.md
§2.9).  The dimensionality-reduction step a training pipeline runs
before clustering / dedup / retrieval at scale.

Scale decomposition (the only one that works at 100 TB):

1. **Map-side exact second moments.** Each partition quantizes its
   vectors to integer micro-units (``floor(x·1e6 + 0.5)``, exact) and
   accumulates a local int64 Gram matrix plus a component-sum vector —
   one `mapInPandas` pass emitting ``d·(d+1)/2 + d`` numbers per
   partition, regardless of row count.
2. **Exact global reduce.** The tiny per-partition partials hash-sum
   as DECIMAL(38,0) — exact and order-free at any corpus size (int64
   would overflow past ~9·10⁶ rows at micro-unit scale; decimal sums
   never do) — so identical data yields an identical covariance under
   ANY partitioning.
3. **Driver-side eigendecomposition.** The covariance is d×d (a few
   KB); ``numpy.linalg.eigh`` on the driver, eigenvectors
   sign-normalized (largest-|component| made positive) for full
   determinism.
4. **Map-only projection.** The corpus streams through one Arrow
   matmul against the broadcast (d × k) basis; no shuffle.

Whitening divides each projected component by √eigenvalue, giving the
unit-covariance representation retrieval stacks (e.g. ZCA/PCA-whitened
embeddings before product quantization, Jégou et al.) expect.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MICRO = 1_000_000


def second_moments(emb: DataFrame, vec_col: str,
                   dim: int) -> tuple[np.ndarray, np.ndarray, int]:
    """Exact (Σ x xᵀ, Σ x, n) over micro-quantized vectors — the
    sufficient statistics for mean/covariance, reduced as documented
    in the module docstring.  Returns float64 arrays already scaled
    back from micro-units.  NULL / ragged vectors fail loudly."""
    iu, ju = np.triu_indices(dim)
    out_schema = "i int, j int, g decimal(38,0)"

    def _partials(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # object dtype = exact Python bigints: the per-partition
        # accumulator cannot wrap no matter how many rows a partition
        # holds; each bounded sub-chunk's int64 matmul is overflow-safe
        # by construction before it folds in
        gram = np.zeros((dim, dim), dtype=object)
        sums = np.zeros(dim, dtype=object)
        n = 0
        for pdf in it:
            vecs = pdf[vec_col].tolist()
            if not vecs:
                continue
            X = np.asarray(vecs, dtype=np.float64)
            if X.ndim != 2 or X.shape[1] != dim:
                raise ValueError(
                    f"expected {dim}-dim vectors, got shape {X.shape}")
            if not np.isfinite(X).all():
                raise ValueError(
                    "NaN/inf component in embedding input — clean or "
                    "filter before fitting PCA")
            Q = np.floor(X * _MICRO + 0.5).astype(np.int64)
            qmax = int(np.abs(Q).max()) or 1
            safe_rows = max(1, int(4e18 // (qmax * qmax)))
            for lo in range(0, len(Q), safe_rows):
                Qc = Q[lo:lo + safe_rows]
                gram = gram + Qc.T @ Qc
                sums = sums + Qc.sum(0)
            n += len(Q)
        # encode the mean-sums as row d, the count as (d+1, d+1):
        # one relation carries all three statistics
        yield pd.DataFrame({
            "i": np.concatenate([iu, np.full(dim, dim),
                                 [dim + 1]]).astype("int32"),
            "j": np.concatenate([ju, np.arange(dim),
                                 [dim + 1]]).astype("int32"),
            "g": [int(v) for v in gram[iu, ju]]
                 + [int(v) for v in sums] + [n]})

    rows = (emb.select(vec_col).mapInPandas(_partials, out_schema)
            .groupBy("i", "j").agg(F.sum("g").alias("g"))
            .collect())
    gram = np.zeros((dim, dim))
    mean_sums = np.zeros(dim)
    n = 0
    for r in rows:
        i, j, g = r["i"], r["j"], float(r["g"])
        if i == dim + 1:
            n = int(g)
        elif i == dim:
            mean_sums[j] = g / _MICRO
        else:
            gram[i, j] = gram[j, i] = g / (_MICRO * _MICRO)
    return gram, mean_sums, n


def fit_pca(emb: DataFrame, vec_col: str, dim: int,
            k: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fit a k-component PCA basis: returns (mean, components (d×k),
    eigenvalues (k,)) with eigenvalues descending and each component's
    largest-|element| sign-normalized positive (deterministic up to
    numerically degenerate eigenvalues)."""
    if not 0 < k <= dim:
        raise ValueError(f"k must be in (0, {dim}]")
    gram, sums, n = second_moments(emb, vec_col, dim)
    if n < 2:
        raise ValueError("PCA needs at least 2 vectors")
    mean = sums / n
    cov = gram / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)        # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    flip = np.sign(vecs[np.argmax(np.abs(vecs), axis=0),
                        np.arange(vecs.shape[1])])
    flip[flip == 0] = 1.0
    return mean.round(9), (vecs * flip).round(9), np.maximum(vals, 0.0)


def pca_project(emb: DataFrame, id_col: str, vec_col: str, dim: int,
                k: int = 8, whiten: bool = False,
                eps: float = 1e-9, basis=None) -> DataFrame:
    """Project every vector onto the fitted top-k principal components
    (one map-only Arrow matmul; the d×k basis rides inside the UDF
    closure).  ``whiten=True`` scales each component to unit variance.
    Returns ``(id, components array<double>)``, rounded to 6 decimals.

    ``basis``: optional pre-fitted ``(mean, components, eigenvalues)``
    from :func:`fit_pca` — pass it when the caller already fitted (or
    fits once and projects many tables); without it every call re-runs
    the full distributed second-moments pass.
    """
    mean, W, vals = basis if basis is not None \
        else fit_pca(emb, vec_col, dim, k)
    if W.shape != (dim, k):
        raise ValueError(
            f"basis shape {W.shape} does not match (dim={dim}, k={k})")
    scale = 1.0 / np.sqrt(vals + eps) if whiten else np.ones(k)

    @F.pandas_udf("array<double>")
    def _proj(v: pd.Series) -> pd.Series:
        X = np.asarray(v.tolist(), dtype=np.float64)
        P = ((X - mean) @ W) * scale
        return pd.Series(list(P.round(6)))

    return emb.select(F.col(id_col), _proj(F.col(vec_col)).alias("components"))


def label_centroid_outliers(emb: DataFrame, id_col: str, vec_col: str,
                            label_col: str, bottom_k: int = 5) -> DataFrame:
    """Embedding-quality screen: per label, the ``bottom_k`` vectors
    least cosine-similar to their OWN label centroid — the standard
    mislabeled/contaminated-sample triage over a labeled embedding
    corpus.

    Centroids are exact and partition-independent: each dimension
    explodes to an integer micro-unit (``floor(x·1e6 + 0.5)``), sums
    per (label, dim) are BIGINT (order-free), and the centroid value is
    one double division — so the DuckDB oracle reproduces centroids
    bit-for-bit.  The per-(label, dim) grid is labels × dim rows
    (tiny); centroid arrays broadcast back onto the corpus and the
    cosine is the codegen fold, one map-side pass.  The ranked cut is
    a per-label window over the corpus — WindowGroupLimit prunes
    map-side to k rows per partition per label.
    """
    # NULL vectors are excluded on BOTH sides of the contract: they
    # contribute nothing to the centroid (posexplode skips them) but
    # their cosine is NULL, and Spark's ASC window puts NULLS FIRST
    # where DuckDB puts them LAST — a NULL-vector row would silently
    # claim a bottom_k outlier slot here and not in the oracle (the
    # r13 NULL-ordering divergence class)
    base = emb.select(F.col(id_col).alias("_id"),
                      F.col(label_col).alias("_lbl"),
                      F.col(vec_col).alias("_v")) \
              .where(F.col("_lbl").isNotNull() & F.col("_v").isNotNull())
    ex = base.select("_lbl", F.posexplode("_v").alias("dim", "x"))
    sums = (ex.groupBy("_lbl", "dim")
            .agg(F.sum(F.floor(F.col("x").cast("double") * 1e6
                               + F.lit(0.5)).cast("long")).alias("s"),
                 F.count(F.lit(1)).alias("n")))
    cents = (sums
             .withColumn("c", (F.col("s").cast("double") / 1e6)
                         / F.col("n"))
             .groupBy("_lbl")
             .agg(F.transform(
                 F.array_sort(F.collect_list(F.struct("dim", "c"))),
                 lambda s: s["c"]).alias("_cent")))
    from ..functions.vectors import cosine, round4
    scored = (base.join(F.broadcast(cents), "_lbl")
              .select("_id", "_lbl",
                      round4(cosine(F.col("_v"), F.col("_cent")))
                      .alias("cos_centroid")))
    w = Window.partitionBy("_lbl").orderBy(F.asc("cos_centroid"),
                                           F.asc("_id"))
    return (scored.withColumn("rnk", F.row_number().over(w))
            .where(F.col("rnk") <= bottom_k)
            .select(F.col("_id").alias(id_col),
                    F.col("_lbl").alias(label_col),
                    "cos_centroid", "rnk"))


def prefix_dim_eval(emb: DataFrame, id_col: str, vec_col: str,
                    dims: tuple[int, ...] = (8, 16, 32, 64),
                    max_id: int = 32) -> DataFrame:
    """Prefix-dimension fidelity evaluation (the Matryoshka-style
    question: how much cosine similarity is lost when vectors are
    truncated to their first ``d`` components?) — the measurement a
    pipeline runs BEFORE shipping cheaper truncated embeddings to the
    ANN/dedup stages.

    Over the deterministic pair grid of vectors with ``id < max_id``
    (all C(max_id, 2) unordered pairs), for each prefix length:
    per-pair |round4-cosine(full) − round4-cosine(prefix)| in exact
    1e-4 micro-units, aggregated to ``(prefix_dim, n_pairs,
    mean_abs_delta, max_abs_delta)``.  The full-length row is the
    built-in self-check (delta exactly 0).

    Scale posture: the grid is bounded by construction (``max_id``
    vectors → one broadcast nested-loop over max_id² rows regardless
    of corpus size); sums/maxes are exact BIGINT micro-units, so the
    result is order-free and engine-exact — only the final
    mean division produces a float, over exact integers.
    """
    from ..functions.vectors import cosine

    if not dims:
        raise ValueError("need at least one prefix dim")
    e = (emb.where(F.col(id_col) < max_id)
         .select(F.col(id_col).alias("_i"), F.col(vec_col).alias("_v")))
    a = e.select(F.col("_i").alias("_ia"), F.col("_v").alias("_va"))
    b = e.select(F.col("_i").alias("_ib"), F.col("_v").alias("_vb"))
    # bounded pair grid: max_id rows broadcast, non-equi (<) join —
    # the allowlisted BNLJ, never data x data
    pairs = a.join(F.broadcast(b), F.col("_ia") < F.col("_ib"))
    p = pairs.select(
        "_va", "_vb",
        F.explode(F.array(*[F.lit(int(d)) for d in sorted(dims)]))
        .alias("prefix_dim"))
    u = lambda c: F.floor(c * 10000 + F.lit(0.5)).cast("long")
    delta = F.abs(
        u(cosine(F.col("_va"), F.col("_vb")))
        - u(cosine(F.slice("_va", F.lit(1), F.col("prefix_dim")),
                   F.slice("_vb", F.lit(1), F.col("prefix_dim")))))
    return (p.select("prefix_dim", delta.alias("_d"))
            .groupBy("prefix_dim")
            .agg(F.count("_d").alias("n_pairs"),
                 F.sum("_d").alias("_su"), F.max("_d").alias("_mu"))
            .select(F.col("prefix_dim").cast("long"),
                    "n_pairs",
                    (F.col("_su").cast("double") / F.col("n_pairs")
                     / 10000).alias("mean_abs_delta"),
                    (F.col("_mu").cast("double") / 10000)
                    .alias("max_abs_delta"))
            .orderBy("prefix_dim"))
