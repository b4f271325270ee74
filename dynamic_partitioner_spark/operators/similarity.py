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
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, round4
from ..functions.checkpoint import checkpoint_df


def _rank_window(qcol: str) -> Window:
    # deterministic ordering: rounded sim desc, then neighbor id
    return (Window.partitionBy(qcol)
            .orderBy(F.col("cos_sim").desc(), F.col("neighbor_id")))


def _score_and_rank(candidates, k: int, dedupe: bool = True):
    """Shared scoring tail of every ANN path: exclude self, exact
    round4 cosine, dedupe multi-probe copies, per-query row_number
    top-k.  ONE implementation (r13 review: the block was copy-pasted
    verbatim into four functions, so a scoring-contract change could
    drift).  ``candidates`` carries (query_id, qv, neighbor_id, cv)
    rows from the caller's blocking join.  ``dedupe=False`` skips the
    multi-probe distinct for callers whose candidates are unique by
    construction (the brute-force cross join) — r15 review: the
    baseline carried a verbatim copy of this tail, re-creating the
    drift this helper exists to kill."""
    scored = (candidates
              .where(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      round4(cosine(F.col("qv"), F.col("cv")))
                      .alias("cos_sim")))
    if dedupe:
        scored = scored.distinct()
    ranked = scored.withColumn(
        "rank", F.row_number().over(_rank_window("query_id")))
    return ranked.where(F.col("rank") <= k)


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
    # spread the corpus × query cosine fold: the projection is
    # byte-small, so the broadcast nested-loop's stream side ran on
    # the scan's 1-2 partitions (the r16 shingle-join collapse,
    # cross-join flavor; no-op on already-wide inputs).
    from ..functions.partitioning import spread_if_narrow
    c = spread_if_narrow(c)
    # cross-join candidates are unique by construction — no distinct
    return _score_and_rank(c.crossJoin(q), k, dedupe=False)


# ------------------------------------------------------------- sign LSH

def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).round(6).tolist()


def sign_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """LSH bucket id: sign bit per hyperplane, packed into an int.
    Pure-Column form (used by tests as the vectorized path's oracle).
    NULL/ragged/NaN-element/NULL-element vectors bucket to NULL —
    matching the vectorized ``_all_buckets_udf`` (r13 review: a NULL
    'd > 0' fell through to ``.otherwise(0)`` per plane, colliding
    every bad vector into the legitimate all-negative-signs bucket 0;
    r13 advice: in Spark SQL ``NaN > 0`` is TRUE — NaN sorts largest —
    so without an explicit element check a NaN-element vector landed
    in a real bucket here while the UDF NULL-bucketed it)."""
    bucket = F.lit(0)
    for j, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        d = F.aggregate(F.zip_with(vec, plane,
                                   lambda x, y: x.cast("double") * y),
                        F.lit(0.0), lambda acc, v: acc + v)
        bucket = bucket + F.when(d > 0, F.lit(2 ** j)).otherwise(F.lit(0))
    clean = ~F.exists(vec, lambda x: x.isNull()
                      | F.isnan(x.cast("double")))
    return F.when(vec.isNotNull()
                  & (F.size(vec) == len(planes[0])) & clean, bucket)


def _all_buckets_udf(dim: int, n_planes: int, n_tables: int, seed: int):
    """Arrow-batched bucket computation for ALL tables at once: one
    numpy matmul (batch×dim @ dim×(tables·planes)) per Arrow batch,
    then sign-bit packing per table.  Replaces tables×planes separate
    ``F.aggregate`` lambdas — those build an O(tables·planes·dim)
    expression tree that dominates planning/codegen time and evaluates
    interpreted per row; the matmul path is O(1) plan size and BLAS at
    runtime, which is the shape that survives 100 TB."""
    planes = np.vstack([_hyperplanes(dim, n_planes, seed + t)
                        for t in range(n_tables)])          # (T·P, dim)
    weights = (2 ** np.arange(n_planes, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def buckets(v: pd.Series) -> pd.Series:
        vals = v.tolist()
        # NULL/ragged vectors bucket to NULL (posexplode then drops
        # them) instead of collapsing the whole batch to an
        # inhomogeneous-shape ValueError
        ok = [x is not None and len(x) == dim for x in vals]
        out: list = [None] * len(vals)
        good = [x for x, k in zip(vals, ok) if k]
        if good:
            mat = np.asarray(good, dtype=np.float64)        # (B, dim)
            # Arrow delivers NULL ELEMENTS as NaN, which passes the
            # length check; 'NaN > 0' is False on every plane, so such
            # vectors collided into legitimate bucket 0 (r13 review) —
            # NULL-bucket them like NULL/ragged vectors instead
            nan_rows = np.isnan(mat).any(1)
            signs = (mat @ planes.T) > 0                    # (B, T·P)
            per_table = signs.reshape(len(mat), -1, n_planes)
            ids = per_table @ weights                       # (B, T)
            it = iter(zip(ids, nan_rows))
            for i, k in enumerate(ok):
                if k:
                    r, bad = next(it)
                    out[i] = None if bad else r
        return pd.Series(out)

    return buckets


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

    ``dim`` must match the corpus vector width: validated against one
    probed row (r15 review — a mismatched default silently
    NULL-bucketed every vector and returned an EMPTY result, total
    recall loss with no diagnostic; the semantic_dedup rule).
    """
    probe = (emb.where(F.col(vec_col).isNotNull())
             .select(F.size(F.col(vec_col)).alias("_d")).first())
    if probe is not None and probe["_d"] != dim:
        raise ValueError(
            f"dim={dim} does not match the corpus vector width "
            f"{probe['_d']}; pass dim={probe['_d']}")
    budf = _all_buckets_udf(dim, n_planes, n_tables, seed)

    def with_buckets(df: DataFrame, idc: str, vecc: str) -> DataFrame:
        # posexplode(array of per-table buckets) → (tbl, bucket) rows
        return (df.select(F.col(idc), F.col(vecc),
                          F.posexplode(budf(F.col(vecc))).alias("tbl", "bucket")))

    c = (with_buckets(emb.select(F.col(id_col).alias("neighbor_id"),
                                 F.col(vec_col).alias("cv")),
                      "neighbor_id", "cv"))
    qb = (with_buckets(queries.select(F.col(id_col).alias("query_id"),
                                      F.col(vec_col).alias("qv")),
                       "query_id", "qv")
          .withColumnRenamed("bucket", "qbucket"))
    if probe_hamming1:
        probes = F.array(F.col("qbucket"),
                         *[F.col("qbucket").bitwiseXOR(F.lit(2 ** j))
                           for j in range(n_planes)])
        qb = qb.select("query_id", "qv", "tbl",
                       F.explode(probes).alias("bucket"))
    else:
        qb = qb.withColumnRenamed("qbucket", "bucket")
    return _score_and_rank(c.join(F.broadcast(qb), ["tbl", "bucket"]),
                           k)


# ------------------------------------------------------------------- IVF

def _rectangular_sample(emb: DataFrame, vec_col: str, id_col: str,
                        sample_size: int) -> np.ndarray:
    """Bounded id-ordered training sample as a clean float64 matrix —
    ONE implementation for both trainers (r13 review: the block was
    duplicated and both copies shared two defects).  Rows kept: the
    sample's MODAL dimension (ties → the more frequent, then the
    smaller dim), so one ragged lowest-id vector cannot poison the
    trained dimension and silently empty every downstream topk; rows
    containing NULL elements (collected as None) or NaN are dropped —
    a single NaN collapses Lloyd's assignment to all-cluster-0 NaN
    centroids."""
    from collections import Counter

    rows = [r[1] for r in emb.select(id_col, vec_col).orderBy(id_col)
            .limit(sample_size).collect() if r[1] is not None]
    clean = [v for v in rows if not any(e is None for e in v)]
    dims = Counter(len(v) for v in clean)
    if dims:
        vdim = max(dims.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        sample = np.asarray([v for v in clean if len(v) == vdim],
                            dtype=np.float64)
        sample = sample[~np.isnan(sample).any(1)]
    else:
        sample = np.empty((0, 0))
    if len(sample) == 0:
        raise ValueError(
            "cannot train centroids: no usable (non-NULL, finite, "
            "uniform-dimension) vectors in the sample")
    return sample


def train_centroids(emb: DataFrame, vec_col: str = "embedding",
                    id_col: str = "vec_id", n_lists: int = 16,
                    sample_size: int = 2048, iters: int = 5) -> np.ndarray:
    """Deterministic IVF coarse quantizer: Lloyd's k-means on a bounded,
    id-ordered sample.

    The sample is capped at ``sample_size`` rows regardless of corpus
    size (the one deliberate driver-side collect in the engine — k-means
    training on a fixed sample is the standard IVF recipe; assignment,
    the O(corpus) part, stays distributed).  Init = first ``n_lists``
    sample points, so identical data → identical centroids → identical
    query results, which the driver's re-run check requires.
    """
    sample = _rectangular_sample(emb, vec_col, id_col, sample_size)
    # a corpus smaller than n_lists trains fewer (still valid)
    # centroids instead of indexing past the sample
    n_lists = min(n_lists, len(sample))
    return _lloyd(sample, n_lists, iters)


def _lloyd(sample: np.ndarray, k: int, iters: int) -> np.ndarray:
    """Deterministic Lloyd's k-means kernel on an in-memory sample:
    init = first ``k`` points, distances via the ``||a-b||^2 =
    ||a||^2 + ||b||^2 - 2 a.b`` matmul identity — the explicit
    (sample, lists, dim) broadcast difference allocated ~0.8 GB
    temporaries per iteration at 2048x782x64 and made training the
    sf10 whale (112 s; this form trains in <1 s).  argmin ordering is
    unchanged (ties still break on the first index); boundary points
    whose two distances differ only in ulp can flip lists, which
    every centroid consumer tolerates by design (invariant-row
    certification, recall pinned on clear margins in pytest)."""
    cents = sample[:k].copy()
    s2 = (sample * sample).sum(1)
    for _ in range(iters):
        d2 = s2[:, None] + (cents * cents).sum(1)[None, :] \
            - 2.0 * (sample @ cents.T)
        assign = d2.argmin(1)
        for c in range(k):
            pts = sample[assign == c]
            if len(pts):
                cents[c] = pts.mean(0)
    return cents.round(6)


_MICRO = 1_000_000


def train_centroids_distributed(emb: DataFrame, vec_col: str = "embedding",
                                id_col: str = "vec_id", n_lists: int = 16,
                                iters: int = 5) -> np.ndarray:
    """Full-corpus Lloyd's k-means — the 100 TB upgrade over the
    bounded-sample :func:`train_centroids`.

    Per iteration: assignment is one distributed Arrow matmul pass;
    the centroid update aggregates per-(cluster, dim) partial sums
    map-side, so the shuffle and the driver collect carry
    ``n_lists × dim`` rows regardless of corpus size.  Component sums
    are quantized to integer micro-units (``floor(x·1e6 + 0.5)`` per
    element) so the BIGINT aggregation is exact and order-free —
    identical data gives identical centroids under ANY partitioning,
    which float sums cannot promise.  Init = first ``n_lists`` vectors
    by id (deterministic); an emptied cluster keeps its previous
    centroid.  Cost: ``iters`` full passes — train on the corpus when
    the sample trainer's 2048 rows stop representing it, not before.
    """
    # clean rectangular init: a NULL/ragged row among the first
    # n_lists ids raised an opaque inhomogeneous-shape ValueError, and
    # the sample trainers' modal-dim discipline applies here too (r13
    # review); oversample 4x so a few bad rows still fill n_lists
    cents = _rectangular_sample(emb, vec_col, id_col,
                                max(4 * n_lists, 64))[:n_lists]
    micro = (F.floor(F.col("_x") * _MICRO + F.lit(0.5))).cast("bigint")
    for _ in range(iters):
        assign1 = _nearest_lists_udf(cents, 1)
        parts = (emb.select(assign1(F.col(vec_col))[0].alias("_c"),
                            F.posexplode(vec_col).alias("_d", "_x"))
                 # NULL/ragged vectors assign _c NULL; their group's
                 # Row value None used as a numpy index means
                 # np.newaxis — silently overwriting an entire sums
                 # row and ALL counts (r13 review, verified repro)
                 .where(F.col("_c").isNotNull())
                 .groupBy("_c", "_d")
                 .agg(F.sum(micro).alias("_s"),
                      F.count(F.lit(1)).alias("_n"))
                 .collect())
        nxt = cents.copy()
        counts = np.zeros(len(cents), dtype=np.int64)
        sums = np.zeros_like(cents)
        for r in parts:
            sums[r["_c"], r["_d"]] = r["_s"] / _MICRO
            counts[r["_c"]] = r["_n"]
        nz = counts > 0
        nxt[nz] = sums[nz] / counts[nz, None]
        cents = nxt.round(6)
    return cents


def _nearest_lists_udf(cents: np.ndarray, nprobe: int):
    """(vector) → array of the nprobe nearest list ids (L2)."""
    if nprobe < 1:
        # argsort[:, :0] would assign EMPTY lists and the result would
        # be silently empty (r13 review; same class as the dedup
        # extra_probes guard)
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    dim = cents.shape[1]

    @F.pandas_udf("array<long>")
    def nearest(v: pd.Series) -> pd.Series:
        vals = v.tolist()
        # NULL/ragged vectors assign to NULL (exploded away) rather
        # than killing the batch
        ok = [x is not None and len(x) == dim for x in vals]
        out: list = [None] * len(vals)
        good = [x for x, k in zip(vals, ok) if k]
        if good:
            mat = np.asarray(good, dtype=np.float64)
            # NaN elements (Arrow's NULL-element spelling) make the
            # whole distance row NaN and argmin degenerates to list 0
            # — a silent misassignment (r13 review); NULL-assign them
            nan_rows = np.isnan(mat).any(1)
            # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row
            d2 = -2.0 * (mat @ cents.T) + (cents ** 2).sum(1)[None, :]
            # stable sort: duplicate centroids (duplicate sampled
            # vectors survive Lloyd's) tie on d2, and quicksort's
            # tie order is value-dependent — a query could probe
            # duplicate j while its neighbors sit in duplicate i
            # (r15 review; the two-level twin already pins stable)
            order = np.argsort(d2, axis=1,
                               kind="stable")[:, :nprobe].astype(np.int64)
            it = iter(zip(order, nan_rows))
            for i, k in enumerate(ok):
                if k:
                    r, bad = next(it)
                    out[i] = None if bad else r
        return pd.Series(out)

    return nearest


def train_centroids_two_level(emb: DataFrame, vec_col: str = "embedding",
                              id_col: str = "vec_id",
                              n_coarse: int = 64, n_fine: int = 64,
                              sample_size: int = 8192,
                              iters: int = 5) -> tuple:
    """Two-level (coarse x residual-cell) quantizer — the standard IVF
    scaling step past the flat trainer's list-count clamp (Jégou et
    al. 2011's inverted-multi-index lineage: past ~1M vectors a flat
    codebook's assignment cost O(n·n_lists) dominates, because
    n_lists must track n/target to keep cells bounded).

    Train ``n_coarse`` coarse centroids on the bounded id-ordered
    sample, then an independent fine codebook INSIDE each coarse
    cell's sample points — the effective list count is
    ``sum(len(fine_c))`` (≈ n_coarse·n_fine) while assignment costs
    ``O(n·(n_coarse + n_fine))`` distance evaluations instead of
    ``O(n·n_coarse·n_fine)``: 128 dots/vector for a 4096-list
    codebook at 64x64 — a 32x flattening, measured in SCALING.md's
    quantizer micro-bench.

    Returns ``(coarse, fines, offsets)``: coarse ``(n_coarse, dim)``;
    ``fines[c]`` the cell's fine centroids ``(k_c, dim)`` (k_c <
    n_fine when the cell's sample is small — never empty: a cell with
    no sample points keeps its coarse centroid as the single fine);
    ``offsets[c]`` the first GLOBAL list id of cell ``c``, so
    ``offsets[c] + f`` is dense over all real lists.  Deterministic
    end to end (id-ordered sample, first-k init, first-index argmin
    ties) — identical data gives identical codebooks, which the
    driver's re-run check requires.
    """
    sample = _rectangular_sample(emb, vec_col, id_col, sample_size)
    n_coarse = min(n_coarse, len(sample))
    coarse = _lloyd(sample, n_coarse, iters)
    d2 = ((sample * sample).sum(1)[:, None]
          + (coarse * coarse).sum(1)[None, :]
          - 2.0 * (sample @ coarse.T))
    assign = d2.argmin(1)
    fines, offsets, off = [], [], 0
    for c in range(n_coarse):
        pts = sample[assign == c]
        if len(pts) == 0:
            fines.append(coarse[c:c + 1].copy())
        else:
            fines.append(_lloyd(pts, min(n_fine, len(pts)), iters))
        offsets.append(off)
        off += len(fines[-1])
    return coarse, fines, np.asarray(offsets, dtype=np.int64)


def _nearest_lists_two_level_udf(coarse: np.ndarray, fines: list,
                                 offsets: np.ndarray, nprobe: int,
                                 probe_coarse: int = 2):
    """(vector) → array of the ``nprobe`` nearest GLOBAL list ids
    under the two-level codebook.  Per Arrow batch: one matmul against
    the coarse codebook, then one matmul per PROBED coarse cell
    against that cell's fine codebook (vectorized over all batch rows
    probing the cell) — never against the full fine product, so the
    per-vector cost is ``probe_coarse·n_fine + n_coarse`` distances.
    ``probe_coarse >= 2`` is the boundary-recall lever: a vector near
    a coarse boundary still reaches the fine lists of its runner-up
    cell (the two-level analogue of multi-assignment nprobe)."""
    if nprobe < 1 or probe_coarse < 1:
        # zero-width probes produce empty assignment arrays and a
        # silently empty result (r13 review)
        raise ValueError(
            f"nprobe and probe_coarse must be >= 1, got nprobe="
            f"{nprobe}, probe_coarse={probe_coarse}")
    dim = coarse.shape[1]
    pc = min(probe_coarse, len(coarse))

    @F.pandas_udf("array<long>")
    def nearest(v: pd.Series) -> pd.Series:
        vals = v.tolist()
        ok = [x is not None and len(x) == dim for x in vals]
        out: list = [None] * len(vals)
        good = [x for x, k in zip(vals, ok) if k]
        if not good:
            return pd.Series(out)
        mat = np.asarray(good, dtype=np.float64)
        n = len(mat)
        dc = -2.0 * (mat @ coarse.T) + (coarse ** 2).sum(1)[None, :]
        top_c = np.argsort(dc, axis=1)[:, :pc]
        # candidate (distance, global list id) pools per row
        cand_d = np.full((n, pc * max(len(f) for f in fines)), np.inf)
        cand_i = np.zeros_like(cand_d, dtype=np.int64)
        for c in range(len(coarse)):
            hit = np.nonzero((top_c == c).any(1))[0]
            if len(hit) == 0:
                continue
            fc = fines[c]
            df_ = -2.0 * (mat[hit] @ fc.T) + (fc ** 2).sum(1)[None, :]
            slot = np.argmax(top_c[hit] == c, axis=1)  # which probe slot
            w = fc.shape[0]
            for s in np.unique(slot):
                rows_s = hit[slot == s]
                lo = s * cand_d.shape[1] // pc
                cand_d[rows_s, lo:lo + w] = df_[slot == s]
                cand_i[rows_s, lo:lo + w] = offsets[c] + np.arange(w)
        order = np.argsort(cand_d, axis=1, kind="stable")[:, :nprobe]
        picked = np.take_along_axis(cand_i, order, axis=1)
        valid = np.take_along_axis(cand_d, order, axis=1) < np.inf
        it = iter(range(len(good)))
        for i, k in enumerate(ok):
            if k:
                g = next(it)
                out[i] = picked[g][valid[g]][:nprobe]
        return pd.Series(out)

    return nearest


def build_ivf_index(emb: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding", n_lists: int = 16,
                    name: str = "ivf_index") -> np.ndarray:
    """Materialize the IVF layout with the engine's own sink: assign
    each vector to its nearest centroid list (one Arrow matmul pass) and
    write the corpus **partitioned by list_id** — the 100 TB shape where
    a query's nprobe lists become partition-PRUNED scans instead of a
    full-corpus read.  Returns the centroids (persist them next to the
    index in real use)."""
    from ..spec import SinkSpec
    from .partitioned_write import write_partitioned

    cents = train_centroids(emb, vec_col, id_col, n_lists)
    assign1 = _nearest_lists_udf(cents, 1)
    indexed = emb.select(
        F.col(id_col), F.col(vec_col),
        assign1(F.col(vec_col))[0].cast("string").alias("list_id"))
    write_partitioned(indexed,
                      SinkSpec(name=name, field_names=["list_id"],
                               overwrite_partitions=True), path)
    return cents


def topk_ivf_pruned(spark, index_path: str, centroids: np.ndarray,
                    queries: DataFrame, id_col: str = "vec_id",
                    vec_col: str = "embedding", k: int = 5,
                    nprobe: int = 4) -> DataFrame:
    """Query a :func:`build_ivf_index` layout: the union of all queries'
    nprobe lists becomes an ``isin`` filter on the partition column, so
    the scan touches only those directories (``PartitionFilters`` in the
    plan — pinned by a test).  The probe-list collect is bounded by
    |queries|·nprobe ints (queries are small by construction, they are
    broadcast anyway).  Same output schema as :func:`topk_bruteforce`;
    identical results to :func:`topk_ann_ivf` at equal centroids/nprobe.
    """
    from ..sources.read import read_partitioned

    from pyspark.storagelevel import StorageLevel

    probe = _nearest_lists_udf(centroids, nprobe)
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv"),
                         F.explode(probe(F.col(vec_col))).alias("list_id"))
          .withColumn("list_id", F.col("list_id").cast("string"))
          # the probe-list collect AND the broadcast join both read
          # this (query-set-sized) frame — persist so the probe UDF
          # and the caller's upstream query pipeline run once (r13
          # review).  Retention is intentional: the returned frame is
          # lazy and its broadcast build reads qb at ACTION time, so
          # unpersisting here would re-run the probe UDF; the block is
          # query-set-sized (small by construction) and Spark evicts
          # it LRU under memory pressure.
          .persist(StorageLevel.MEMORY_AND_DISK))
    wanted = sorted({r.list_id for r in qb.select("list_id").distinct()
                     .collect()})
    corpus = (read_partitioned(spark, index_path)
              .where(F.col("list_id").isin(wanted))
              .select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cv"), "list_id"))
    return _score_and_rank(corpus.join(F.broadcast(qb), "list_id"), k)


def topk_ann_ivf(emb: DataFrame, queries: DataFrame, id_col: str = "vec_id",
                 vec_col: str = "embedding", k: int = 5, n_lists: int = 16,
                 nprobe: int = 4, centroids: np.ndarray | None = None) -> DataFrame:
    """IVF-style ANN: corpus vectors are assigned to their nearest
    centroid list (one Arrow-batched matmul pass); each query scans only
    its ``nprobe`` nearest lists.

    Scale path: at 100 TB the assignment runs once and the corpus is
    **written partitioned by ``list_id``** (this engine's own
    partitioned sink), so a query's nprobe lists become partition-pruned
    scans — the join below then touches nprobe/n_lists of the data.
    Same output schema as :func:`topk_bruteforce`; recall grows with
    ``nprobe`` (= exact when nprobe == n_lists).
    """
    if centroids is None:
        centroids = train_centroids(emb, vec_col, id_col, n_lists)
    assign1 = _nearest_lists_udf(centroids, 1)
    probe = _nearest_lists_udf(centroids, nprobe)

    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"),
                   assign1(F.col(vec_col))[0].alias("list_id"))
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv"),
                         F.explode(probe(F.col(vec_col))).alias("list_id")))
    return _score_and_rank(c.join(F.broadcast(qb), "list_id"), k)


def topk_ann_ivf2(emb: DataFrame, queries: DataFrame,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  k: int = 5, n_coarse: int = 8, n_fine: int = 4,
                  nprobe: int = 4, probe_coarse: int = 2,
                  codebook: tuple | None = None) -> DataFrame:
    """Two-level-IVF ANN: :func:`topk_ann_ivf` with the coarse x
    residual-cell codebook (:func:`train_centroids_two_level`) doing
    the list assignment — the shape that keeps assignment cost
    O(n·(n_coarse + n_fine)) when the list count must track n/target
    past the flat trainer's clamp (~1M vectors).

    Corpus vectors take their single nearest two-level list; each
    query probes its ``nprobe`` nearest lists through the same staged
    search (``probe_coarse`` runner-up coarse cells for boundary
    recall).  Candidate scoring and ranking are identical to the flat
    IVF path — exact round4 cosine, window top-k — so with
    ``probe_coarse = n_coarse`` and ``nprobe`` >= the total list
    count the result EQUALS brute force (every list probed), the
    invariant q_similarity_ivf2_topk certifies end to end."""
    if codebook is None:
        codebook = train_centroids_two_level(
            emb, vec_col, id_col, n_coarse=n_coarse, n_fine=n_fine)
    coarse, fines, offsets = codebook
    assign1 = _nearest_lists_two_level_udf(coarse, fines, offsets, 1,
                                           probe_coarse=1)
    probe = _nearest_lists_two_level_udf(coarse, fines, offsets, nprobe,
                                         probe_coarse=probe_coarse)
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("cv"),
                   assign1(F.col(vec_col))[0].alias("list_id"))
    qb = (queries.select(F.col(id_col).alias("query_id"),
                         F.col(vec_col).alias("qv"),
                         F.explode(probe(F.col(vec_col))).alias("list_id")))
    return _score_and_rank(c.join(F.broadcast(qb), "list_id"), k)


def hybrid_rrf_topk(docs: DataFrame, doc_id: str, text_col: str,
                    emb: DataFrame, vec_id: str, vec_col: str,
                    query_vec: DataFrame, terms: list[str],
                    k: int = 20, shortlist: int = 100,
                    c: int = 60) -> DataFrame:
    """Hybrid (lexical + vector) retrieval with reciprocal-rank fusion:
    rank documents by query-term frequency AND by cosine to the query
    embedding, fuse the two shortlists with RRF
    ``Σ 1/(c + rank)`` (Cormack & Clarke 2009), return the top ``k``
    as ``(rank, doc_id, rrf, rank_text, rank_vec)`` — the standard
    first-stage shape of a RAG / search stack.

    Both ranking legs here are EXACT (tf aggregate; codegen cosine
    scan against the broadcast query vector) and cut to ``shortlist``
    before fusion — fusion itself touches ≤ 2·shortlist rows.  At
    100 TB each leg hands its shortlist over instead: the lexical leg
    from an inverted/term-pruned scan, the vector leg from
    ``topk_ann_lsh``/``topk_ann_ivf`` — RRF only ever sees ranks, so
    swapping a leg for its approximate twin changes nothing
    structurally.  RRF scores are single-op double sums of exact
    reciprocals → bit-identical cross-engine; rank ties break on id.
    """
    if k < 1 or shortlist < k:
        raise ValueError("need 1 <= k <= shortlist")
    if c < 1:
        # c = -rank_text for some rank divides by zero (ANSI raises;
        # non-ANSI injects Infinity that dominates the fusion), and
        # any negative c inverts the rank weighting (r15 review)
        raise ValueError(f"need c >= 1, got {c}")
    if not terms:
        # an empty lexical leg silently degrades to vector-only
        # ranking — the silent-recall-loss class (r15 review)
        raise ValueError("terms must be non-empty")
    # tokens() lowercases before splitting, so match terms lowercased
    # too: 'Spark' previously contributed ZERO lexical signal with no
    # warning (r15 review)
    terms = [t.lower() for t in terms]
    # ONE action reads query_vec: limit(2)+collect both validates the
    # exactly-1-row contract (r13 review — >1 rows under one global
    # rank window is garbage) and materializes the row, so an
    # expensive upstream pipeline no longer executes twice (count +
    # crossJoin build, r15 review)
    q_sel = query_vec.select(F.col(vec_col).alias("_qv"))
    qrows = q_sel.limit(2).collect()
    if len(qrows) != 1:
        raise ValueError(
            f"query_vec must have exactly 1 row, got "
            f"{'0' if not qrows else '2 or more'} — fuse multi-query "
            "retrieval one query at a time")
    from .dedup import tokens
    toks = (docs.select(F.col(doc_id).alias("_d"),
                        F.explode(tokens(F.col(text_col))).alias("_t")))
    tf = (toks.where(F.col("_t").isin(terms))
          .groupBy("_d").agg(F.count(F.lit(1)).alias("_tf")))
    wt = Window.orderBy(F.desc("_tf"), F.asc("_d"))
    lex = (tf.withColumn("rank_text", F.row_number().over(wt))
           .where(F.col("rank_text") <= shortlist))

    qv = query_vec.sparkSession.createDataFrame(qrows, q_sel.schema)
    # spread the per-corpus-row cosine against the 1-row query vector:
    # the stream side otherwise runs on the scan's 1-2 partitions (the
    # r16 shingle-join collapse, cross-join flavor; no-op on
    # already-wide inputs)
    from ..functions.partitioning import spread_if_narrow
    emb = spread_if_narrow(emb)
    scored = (emb.crossJoin(F.broadcast(qv))
              .select(F.col(vec_id).alias("_v"),
                      round4(cosine(F.col(vec_col), F.col("_qv")))
                      .alias("_cos")))
    wv = Window.orderBy(F.desc("_cos"), F.asc("_v"))
    vec = (scored.withColumn("rank_vec", F.row_number().over(wv))
           .where(F.col("rank_vec") <= shortlist))

    fused = (lex.join(vec, lex["_d"] == vec["_v"], "full_outer")
             .select(F.coalesce(lex["_d"], vec["_v"]).alias(doc_id),
                     "rank_text", "rank_vec"))
    rrf = (F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_text")),
                      F.lit(0.0))
           + F.coalesce(F.lit(1.0) / (F.lit(c) + F.col("rank_vec")),
                        F.lit(0.0)))
    wr = Window.orderBy(F.desc("_rrf"), F.asc(doc_id))
    return (fused.withColumn("_rrf", rrf)
            .withColumn("rank", F.row_number().over(wr))
            .where(F.col("rank") <= k)
            .select("rank", doc_id, round4(F.col("_rrf")).alias("rrf"),
                    "rank_text", "rank_vec"))


def cosine_threshold_sweep(df: DataFrame, id_col: str, vec_col: str,
                           target_rows: int,
                           salt: str = "sweep") -> DataFrame:
    """Dedup-threshold calibration: the pairwise-cosine histogram over
    a deterministic hash sample of the corpus — the evidence you read
    before choosing the near-dup cutoff ("0.92 keeps 0.4% of pairs,
    0.85 keeps 3%").  Output: one row per 0.05-wide similarity bucket
    with the pair count and the cumulative count at-or-above the
    bucket (the sweep).

    Deliberately quadratic ON THE SAMPLE and nothing else — and the
    sample is a FIXED ~``target_rows`` regardless of corpus size: the
    hash cut is ``u · N < target_rows`` with N the corpus row count
    (a 1-row broadcast), so the expected sample stays ~target_rows as
    the corpus grows and the pair count is O(target²), never O(N²).
    The sampled side broadcasts; the corpus never self-joins.
    Buckets come from the 1e-4-unit integer cosine
    (``(c4 + 10000) div 500``) so the boundary can never flip on a
    float multiply; zero-norm vectors are excluded (cosine
    undefined).  Cross-engine: the cut compares ``u·N`` (double ×
    BIGINT, one IEEE multiply on identical inputs) against the
    integer target — no division, bit-identical both engines.
    """
    from .sampling import hash_unit
    from ..functions.vectors import dot, l2_norm

    # reject floats explicitly: a legacy fraction-style 0.25 would
    # int-truncate to 0 and return a silently empty sweep
    if not isinstance(target_rows, int) or target_rows <= 0:
        raise ValueError("target_rows must be a positive int")
    base = df.select(F.col(id_col).alias("vid"),
                     F.col(vec_col).alias("vec"))
    n = base.agg(F.count(F.lit(1)).alias("n_total"))
    # NaN-element vectors must not reach the pair stage: their l2
    # norm is NaN and 'NaN > 0' is TRUE in BOTH engines, so they
    # slipped the zero-norm guard — every pair scored NaN cosine,
    # which the DuckDB twin's CAST(floor(NaN...)) rejects as a hard
    # Conversion Error and Spark mis-buckets (r15 review; same
    # exclusion rendered in the SQL twin)
    no_nan = ~F.coalesce(
        F.exists(F.col("vec"), lambda x: F.isnan(x.cast("double"))),
        F.lit(False))
    s = (base.join(F.broadcast(n))
         .where(hash_unit(F.col("vid"), salt) * F.col("n_total")
                < F.lit(int(target_rows)))
         .where((l2_norm(F.col("vec")) > 0) & no_nan)
         .select("vid", "vec"))
    # precompute each vector's norm ONCE on the ~target_rows sample —
    # cosine() would re-fold both norms per PAIR (O(target²) folds for
    # what is O(target) work); then materialize the frame once instead
    # of re-running count+filter+norm for both join sides.  eager
    # checkpoint: building the DataFrame runs the (tiny) sample jobs
    # up front; the blocks live until session end — acceptable for a
    # ~target_rows frame, and the lineage cut is what stops the count
    # + filter re-running per branch.
    s = s.select("vid", "vec", l2_norm(F.col("vec")).alias("_l2"))
    s = checkpoint_df(s)
    # spread the streamed side of the pair join across the cluster:
    # the sample inherits the (tiny) upstream scan's partitioning —
    # often ONE partition — which would run the O(target²) interpreted
    # cosine folds on a single core (r16 measured the whole sweep 4×
    # faster from this line alone).  Round-robin repartition only
    # relocates rows; every pair, cosine and bucket count is unchanged
    from ..functions.partitioning import spread_if_narrow
    a_side = spread_if_narrow(s)
    a = a_side.select(F.col("vid").alias("id_a"), F.col("vec").alias("va"),
                      F.col("_l2").alias("_la"))
    b = s.select(F.col("vid").alias("id_b"), F.col("vec").alias("vb"),
                 F.col("_l2").alias("_lb"))
    # length equality in the join predicate: a ragged (truncated)
    # vector would otherwise NULL-pad Spark's zip_with while DuckDB's
    # list_sum skips NULLs — a silent cross-engine divergence; equal
    # exclusion on both sides keeps parity and drops garbage pairs
    pairs = a.join(F.broadcast(b),
                   (F.col("id_a") < F.col("id_b"))
                   & (F.size("va") == F.size("vb")))
    cos = dot(F.col("va"), F.col("vb")) / (F.col("_la") * F.col("_lb"))
    c4 = F.floor(cos * 10000 + F.lit(0.5)).cast("long")
    bucketed = (pairs.select(c4.alias("c4"))
                .select(F.expr("(c4 + 10000) div 500").alias("bucket")))
    counts = bucketed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_pairs"))
    w = (Window.orderBy(F.col("bucket").desc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return counts.select(
        "bucket",
        round4(F.col("bucket") * 0.05 - 1.0).alias("cos_lo"),
        "n_pairs",
        F.sum("n_pairs").over(w).alias("n_pairs_ge"))


def cosine_threshold_sweep_sql(id_col: str, vec_col: str,
                               target_rows: int, from_table: str,
                               salt: str = "sweep") -> str:
    """DuckDB twin of :func:`cosine_threshold_sweep` (same size-
    adaptive hash cut, same integer bucket arithmetic, same
    equal-length pair predicate)."""
    from .sampling import hash_unit_sql
    from ..functions.vectors import L2_NORM_SQL

    if not isinstance(target_rows, int) or target_rows <= 0:
        raise ValueError("target_rows must be a positive int")
    u = hash_unit_sql(id_col, salt)
    l2 = L2_NORM_SQL.format(a=vec_col)
    # dot/(la·lb) with per-row norms, mirroring the Spark side's
    # precomputed-norm form (DuckDB's list_cosine_similarity would
    # re-derive both norms per pair instead of reusing the l2 column)
    cos = ("list_sum(list_transform(list_zip(a.vec::DOUBLE[], "
           "b.vec::DOUBLE[]), p -> p[1] * p[2])) / (a.l2 * b.l2)")
    return f"""
        WITH s AS (
            SELECT {id_col} AS vid, {vec_col} AS vec, ({l2}) AS l2
            FROM {from_table},
                 (SELECT count(*) AS n_total FROM {from_table}) t
            WHERE ({u}) * n_total < {int(target_rows)}
              AND ({l2}) > 0
              AND NOT coalesce(list_bool_or(list_transform(
                      {vec_col}, x -> isnan(x::DOUBLE))), FALSE)),
        c AS (SELECT CAST(floor(({cos}) * 10000 + 0.5) AS BIGINT) AS c4
              FROM s a JOIN s b
                ON a.vid < b.vid AND len(a.vec) = len(b.vec)),
        g AS (SELECT (c4 + 10000) // 500 AS bucket,
                     count(*) AS n_pairs
              FROM c GROUP BY 1)
        SELECT bucket,
               floor((bucket * 0.05 - 1.0) * 10000 + 0.5) / 10000
                   AS cos_lo,
               n_pairs,
               CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS n_pairs_ge
        FROM g
    """
