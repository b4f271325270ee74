"""Int8 quantization + quantized grammian (operators/quantize.py)."""
from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.quantize import (
    int8_grammian,
    quantize_embeddings,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_quantize_known_values(spark):
    df = _vecs(spark, [(1, [1.27, -1.27, 0.635])])
    r = quantize_embeddings(df, "vec_id", "embedding").collect()[0]
    assert r.scale == 0.01
    # q = [127, -127, 64]  (floor(63.5 + 0.5) = 64 — half-up)
    assert r.qsum == 64
    assert r.qnorm2 == 127 * 127 * 2 + 64 * 64
    assert abs(r.max_abs_err - 0.005) < 1e-9


def test_quantize_zero_vector(spark):
    df = _vecs(spark, [(1, [0.0, 0.0]), (2, [0.5, -0.5])])
    got = {r.vec_id: r for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    assert got[1].scale == 0.0 and got[1].qsum == 0
    assert got[1].qnorm2 == 0 and got[1].max_abs_err == 0.0
    assert got[2].qnorm2 == 127 * 127 * 2


def test_grammian_known_values(spark):
    df = _vecs(spark, [(1, [1.0, 1.0]), (2, [1.0, -1.0])])
    g = {(r.i, r.j): r.g for r in
         int8_grammian(df, "embedding", 2).collect()}
    assert g == {(0, 0): 2 * 127 * 127, (0, 1): 0, (1, 1): 2 * 127 * 127}


def test_grammian_diagonal_equals_qnorm2(spark):
    """Trace of the grammian == Σ qnorm2 over the corpus — ties the two
    operators' quantizers together on real data."""
    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(100))
    trace = (int8_grammian(emb, "embedding", 64)
             .where(F.col("i") == F.col("j"))
             .agg(F.sum("g")).collect()[0][0])
    qn = (quantize_embeddings(emb, "vec_id", "embedding")
          .agg(F.sum("qnorm2")).collect()[0][0])
    assert trace == qn > 0


def test_grammian_rejects_wrong_dim(spark):
    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    df = _vecs(spark, [(1, [1.0, 2.0, 3.0])])
    with pytest.raises((Py4JJavaError, PythonException)):
        int8_grammian(df, "embedding", 2).collect()


def test_int8_topk_agrees_with_float_cosine_ordering(spark):
    """Int8 top-1 neighbor matches the float cosine top-1 for most
    queries (quantization noise may flip near-ties further down)."""
    from dynamic_partitioner_spark.operators.quantize import int8_topk
    from dynamic_partitioner_spark.operators.similarity import (
        topk_bruteforce)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)
    got = {(r.query_id, r.neighbor_id) for r in
           int8_topk(emb, queries, k=1).collect()}
    want = {(r.query_id, r.neighbor_id) for r in
            topk_bruteforce(emb, queries, k=1).collect()}
    assert len(got & want) >= 8        # >= 80% top-1 agreement


def test_int8_topk_excludes_self_and_ranks(spark):
    from dynamic_partitioner_spark.operators.quantize import int8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    rows = int8_topk(emb, queries, k=5).collect()
    assert all(r.neighbor_id != r.query_id for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r.rank)
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_quantize_column_matches_numpy_on_adversarial_vectors(spark):
    """Property check: the Column-expression quantizer and the numpy
    quantizer (used by grammian/top-k) agree exactly on adversarial
    inputs — ties at the rounding boundary, tiny magnitudes, mixed
    signs, constant vectors."""
    import numpy as np

    from dynamic_partitioner_spark.operators.quantize import _quantize_np

    rng = np.random.RandomState(7)
    vecs = [rng.randn(8).astype(np.float32) * 10.0 ** rng.randint(-6, 3)
            for _ in range(50)]
    vecs += [np.zeros(8, dtype=np.float32),
             np.full(8, 1e-30, dtype=np.float32),
             np.array([1, -1, 0.5, -0.5, 0.25, -0.25, 0.125, 0],
                      dtype=np.float32)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: (r.qsum, r.qnorm2) for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    for i, v in enumerate(vecs):
        _, Q = _quantize_np(np.asarray([v], dtype=np.float64))
        assert got[i] == (int(Q.sum()), int((Q * Q).sum())), i


def test_pq_rerank_recall_and_determinism(spark):
    """PQ-ADC shortlist + exact rerank reaches >= 0.9 recall@10 vs the
    exact dot-product ranking; codebooks/codes are deterministic."""
    import numpy as np

    from dynamic_partitioner_spark.operators.quantize import (
        pq_topk_rerank, train_pq_codebooks)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, ksub=256, iters=8)
    books2 = train_pq_codebooks(emb, m=8, ksub=256, iters=8)
    assert (books == books2).all()

    data = {r[0]: np.array(r[1]) for r in
            emb.select("vec_id", "embedding").collect()}
    ids = sorted(data)
    M = np.array([data[i] for i in ids])
    idarr = np.array(ids)
    queries = emb.where(F.col("vec_id") < 10)
    rows = pq_topk_rerank(emb, queries, books, k=10,
                          shortlist=4).collect()
    hits = tot = 0
    for q in range(10):
        dots = M @ data[q]
        mask = idarr != q
        top = set(idarr[mask][np.argsort(-dots[mask])[:10]])
        got = {r.neighbor_id for r in rows if r.query_id == q}
        hits += len(got & top)
        tot += 10
    assert hits / tot >= 0.9


def test_pq_encode_shapes(spark):
    from dynamic_partitioner_spark.operators.quantize import (
        pq_encode, train_pq_codebooks)

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(50))
    books = train_pq_codebooks(emb, m=8, ksub=16, sample_size=50)
    rows = pq_encode(emb, books).collect()
    assert len(rows) == 50
    assert all(len(r.codes) == 8 for r in rows)
    assert all(0 <= c < 16 for r in rows for c in r.codes)


def test_pq_training_rejects_undersized_corpus(spark):
    """A corpus smaller than ksub raises a descriptive error instead of
    an opaque numpy broadcast failure (q_similarity_pq uses ksub=256)."""
    import pytest

    from dynamic_partitioner_spark.operators.quantize import (
        train_pq_codebooks)

    emb = (spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
           .limit(10))
    with pytest.raises(ValueError, match="ksub"):
        train_pq_codebooks(emb, m=8, ksub=256)
    with pytest.raises(ValueError, match="ksub"):
        train_pq_codebooks(emb.limit(0), m=8, ksub=16)


def test_pca_project_properties(spark):
    """PCA over the corpus: projected components are uncorrelated with
    descending variances equal to the eigenvalues; the fit is
    partition-independent (decimal-exact reduce); whitening gives unit
    variances."""
    import numpy as np

    from dynamic_partitioner_spark.operators.decompose import (
        fit_pca, pca_project)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dim, k = 64, 6
    mean, W, vals = fit_pca(emb, "embedding", dim, k)
    m2, W2, v2 = fit_pca(emb.repartition(13), "embedding", dim, k)
    assert np.array_equal(mean, m2) and np.array_equal(W, W2)

    P = np.asarray([r.components for r in
                    pca_project(emb, "vec_id", "embedding", dim, k)
                    .collect()])
    C = np.cov(P.T, bias=True)
    assert np.all(np.diff(np.diag(C)) <= 1e-6)          # desc variance
    np.testing.assert_allclose(np.diag(C), vals[:k], rtol=1e-3)
    off = C - np.diag(np.diag(C))
    assert np.abs(off).max() < 1e-3                     # uncorrelated

    Pw = np.asarray([r.components for r in
                     pca_project(emb, "vec_id", "embedding", dim, k,
                                 whiten=True).collect()])
    np.testing.assert_allclose(np.diag(np.cov(Pw.T, bias=True)),
                               np.ones(k), rtol=5e-3)

    import pytest
    with pytest.raises(ValueError):
        fit_pca(emb, "embedding", dim, 0)


def test_label_centroid_outliers_flags_the_planted_outlier(spark):
    from dynamic_partitioner_spark.operators.decompose import (
        label_centroid_outliers)
    # label 0: three near-identical vectors + one opposite-direction
    rows = [(0, [1.0, 0.0], 0), (1, [0.9, 0.1], 0), (2, [1.0, 0.1], 0),
            (3, [-1.0, 0.0], 0), (4, [0.0, 1.0], 1), (5, [0.1, 1.0], 1),
            (6, None, None)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    out = label_centroid_outliers(emb, "vec_id", "embedding", "label",
                                  bottom_k=1).collect()
    worst = {r.label: r.vec_id for r in out}
    assert worst[0] == 3          # the planted outlier
    assert len(out) == 2          # one per label; NULL label dropped


def test_prefix_dim_eval_full_length_is_exact_zero(spark):
    from dynamic_partitioner_spark.operators.decompose import (
        prefix_dim_eval)
    import pytest as _pt

    rows = [(i, [float(i + 1), float(2 * i + 1), 0.5 * i, 1.0])
            for i in range(6)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = {r.prefix_dim: r for r in prefix_dim_eval(
        emb, "vec_id", "embedding", dims=(2, 4), max_id=6).collect()}
    # C(6,2) pairs at every prefix length
    assert out[2].n_pairs == 15 and out[4].n_pairs == 15
    # full-length prefix reproduces the full cosine exactly
    assert out[4].mean_abs_delta == 0.0 and out[4].max_abs_delta == 0.0
    # truncation loses similarity on these deliberately skewed vectors
    assert out[2].max_abs_delta > 0.0
    assert 0.0 <= out[2].mean_abs_delta <= out[2].max_abs_delta
    with _pt.raises(ValueError, match="prefix dim"):
        prefix_dim_eval(emb, "vec_id", "embedding", dims=())


def test_bq_topk_matches_numpy_reference(spark):
    """The packed-sign Hamming ranks equal a numpy recompute, and the
    1-bit tier's rank-1 neighbor tracks the float-cosine rank-1 for a
    clearly-clustered corpus (the quantization-ladder sanity pin)."""
    import numpy as np

    from dynamic_partitioner_spark.operators.quantize import bq_topk

    rng = np.random.default_rng(11)
    base = rng.normal(size=(4, 64))
    rows = []
    vid = 0
    for b in range(4):
        for _ in range(6):
            rows.append((vid, (base[b] + 0.05 * rng.normal(size=64))
                         .tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = df.where(F.col("vec_id") < 3)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.hamming)
           for r in bq_topk(df, queries, k=5).collect()}

    X = np.asarray([v for _, v in rows])
    bits = (X > 0)
    for q in range(3):
        ham = (bits[q] != bits).sum(axis=1)
        order = sorted((int(ham[i]), i) for i in range(len(rows))
                       if i != q)[:5]
        for rk, (h, i) in enumerate(order, 1):
            assert got[(q, rk)] == (i, h), (q, rk)
        # same cluster (vectors 0..5) dominates the 1-bit shortlist
        assert {got[(q, rk)][0] // 6 for rk in (1, 2)} == {0}


def test_bq_topk_excludes_ragged_vectors(spark):
    from dynamic_partitioner_spark.operators.quantize import bq_topk

    rows = [(0, [1.0] * 64), (1, [-1.0] * 64), (2, [1.0] * 10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = bq_topk(df, df.where(F.col("vec_id") == 0), k=5).collect()
    assert {r.neighbor_id for r in out} == {1}   # ragged vec 2 dropped
    assert out[0].hamming == 64


def test_quantized_operators_reject_nan_vectors_loudly(spark):
    """r14 hardening (the r13 similarity NaN class applied to the
    quantized tier): a NaN element previously flowed through
    ``floor(NaN).astype(int64)`` into INT64_MIN garbage in the
    grammian / int8 scores, argmin'd into PQ code 0, or died as a
    cryptic ANSI cast error in the Column path — every entry point
    now names the problem."""
    import pytest

    from dynamic_partitioner_spark.operators.quantize import (
        int8_grammian, int8_topk, pq_encode, quantize_embeddings,
        train_pq_codebooks)

    bad = spark.createDataFrame(
        [(0, [1.0, float("nan")] + [0.0] * 62),
         (1, [1.0] * 64)],
        "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="NaN"):
        quantize_embeddings(bad, "vec_id", "embedding").collect()
    with pytest.raises(Exception, match="NaN"):
        int8_grammian(bad, "embedding", 64).collect()
    with pytest.raises(Exception, match="NaN"):
        int8_topk(bad, bad.where(F.col("vec_id") == 1)).collect()
    books = np.zeros((8, 2, 8))
    books[:, 1, :] = 1.0
    with pytest.raises(Exception, match="NaN"):
        pq_encode(bad, books).collect()
    # the PQ trainer reuses the NULL/NaN/ragged-robust sample: the
    # NaN row drops instead of poisoning every subspace codebook
    ok = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(4)]
        + [(99, [float("nan")] * 64), (100, None)],
        "vec_id long, embedding array<double>")
    trained = train_pq_codebooks(ok, dim=64, m=8, ksub=2, iters=2)
    clean = ok.where(F.col("vec_id") < 4)
    assert np.allclose(trained,
                       train_pq_codebooks(clean, dim=64, m=8, ksub=2,
                                          iters=2))


def test_label_centroid_outliers_excludes_null_vectors(spark):
    """r14 hardening (the r13 NULL-ordering divergence class): a NULL
    vector's NULL cosine sorted NULLS-FIRST in Spark's ASC rank window
    — silently claiming a bottom_k outlier slot the DuckDB oracle
    (NULLS LAST) never gives it.  NULL vectors are excluded up front
    now."""
    from dynamic_partitioner_spark.operators.decompose import (
        label_centroid_outliers)

    df = spark.createDataFrame(
        [(0, "a", [1.0, 0.0]), (1, "a", [0.9, 0.1]),
         (2, "a", [0.0, 1.0]), (3, "a", None)],
        "vec_id long, label string, embedding array<double>")
    got = {r.vec_id for r in
           label_centroid_outliers(df, "vec_id", "embedding", "label",
                                   bottom_k=2).collect()}
    assert 3 not in got          # NULL vector never ranks
    assert 2 in got              # the genuine outlier does


def test_quantize_drops_null_and_empty_vectors_silently(spark):
    """r15 ADVICE pin: quantize_embeddings' loud NaN guard relies on
    Spark's ExtractGenerator placing the assert_true projection ABOVE
    the Generate, so NULL/empty vectors (whose guard condition is
    NULL) never evaluate the assert — they simply produce no element
    rows (the posexplode contract the docstring promises).  If a
    future Spark plan-shape change starts evaluating the assert for
    those rows, this fails loudly in CI instead of in production."""
    from dynamic_partitioner_spark.operators.quantize import (
        quantize_embeddings)

    df = spark.createDataFrame(
        [(0, [3.0, -4.0]), (1, None), (2, [])],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: r for r in
           quantize_embeddings(df, "vec_id", "embedding").collect()}
    # NULL (id 1) and empty (id 2) vectors dropped, no assert trip
    assert set(got) == {0}
    assert got[0].qsum == 95 + -127            # floor(x/scale + .5)


def test_bq_topk_corpus_scoring_is_spread(spark):
    """r16 plan pin: bq_topk round-robin-repartitions the corpus side
    before the broadcast cross join (REPARTITION_BY_NUM) so the
    packing CASE + hamming scoring run cluster-wide instead of on the
    scan's 1-2 partitions."""
    from dynamic_partitioner_spark.operators.quantize import bq_topk

    emb = spark.createDataFrame(
        [(i, [float(j % 3 - 1) for j in range(64)]) for i in range(8)],
        "vec_id long, embedding array<double>").coalesce(1)
    out = bq_topk(emb, emb.where("vec_id < 2"), k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert out.count() == 4                # 2 queries x k=2
