from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.similarity import (
    topk_ann_lsh,
    topk_bruteforce,
)

EMB = "/root/testdata/sf0.001/embeddings.parquet"


def test_bruteforce_topk_known_vectors(spark):
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]), (3, [-1.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = df.where(F.col("vec_id") == 0)
    got = topk_bruteforce(df, q, k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in got] == [1, 2, 3]
    assert got[0].cos_sim > 0.99
    assert got[2].cos_sim == -1.0


def test_bruteforce_excludes_self(spark):
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 3)
    got = topk_bruteforce(df, q, k=5)
    assert got.where(F.col("query_id") == F.col("neighbor_id")).count() == 0
    assert got.count() == 15    # 3 queries × k


def test_ann_recall_vs_bruteforce(spark):
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in topk_bruteforce(df, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in topk_ann_lsh(df, q, k=5).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"multi-probe sign-LSH recall too low: {recall}"


def test_ann_deterministic(spark):
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, topk_ann_lsh(df, q, k=5).collect()))
    b = sorted(map(tuple, topk_ann_lsh(df, q, k=5).collect()))
    assert a == b


def test_ivf_recall_vs_bruteforce(spark):
    from dynamic_partitioner_spark.operators.similarity import topk_ann_ivf
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in topk_bruteforce(df, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in topk_ann_ivf(df, q, k=5, n_lists=16, nprobe=4).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"IVF nprobe=4/16 recall too low: {recall}"


def test_ivf_full_probe_is_exact(spark):
    """nprobe == n_lists scans everything -> identical to brute force."""
    from dynamic_partitioner_spark.operators.similarity import topk_ann_ivf
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 5)
    exact = sorted((r.query_id, r.neighbor_id, r.cos_sim)
                   for r in topk_bruteforce(df, q, k=5).collect())
    full = sorted((r.query_id, r.neighbor_id, r.cos_sim)
                  for r in topk_ann_ivf(df, q, k=5, n_lists=8,
                                        nprobe=8).collect())
    assert full == exact


def test_ivf_deterministic(spark):
    from dynamic_partitioner_spark.operators.similarity import topk_ann_ivf
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, topk_ann_ivf(df, q, k=5).collect()))
    b = sorted(map(tuple, topk_ann_ivf(df, q, k=5).collect()))
    assert a == b


def test_vectorized_buckets_match_column_form(spark):
    """The Arrow matmul bucket path must equal the pure-Column oracle."""
    from dynamic_partitioner_spark.operators.similarity import (
        _all_buckets_udf, _hyperplanes, sign_bucket)
    df = spark.read.parquet(EMB).limit(50)
    budf = _all_buckets_udf(dim=64, n_planes=6, n_tables=4, seed=42)
    fast = df.select("vec_id", budf(F.col("embedding")).alias("bk"))
    slow = df.select(
        "vec_id",
        F.array(*[sign_bucket(F.col("embedding"),
                              _hyperplanes(64, 6, 42 + t)).cast("long")
                  for t in range(4)]).alias("bk"))
    f = {r.vec_id: list(r.bk) for r in fast.collect()}
    s = {r.vec_id: list(r.bk) for r in slow.collect()}
    assert f == s


def test_ivf_pruned_equals_in_memory_ivf(spark, tmp_out):
    """The partition-pruned index path returns exactly the in-memory IVF
    results at equal centroids/nprobe, and the scan carries
    PartitionFilters (only the probed lists are read)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.similarity import (
        build_ivf_index, topk_ann_ivf, topk_ivf_pruned, train_centroids)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 10)

    cents = build_ivf_index(emb, tmp_out)
    pruned = topk_ivf_pruned(spark, tmp_out, cents, queries, k=5)
    mem = topk_ann_ivf(emb, queries, k=5,
                       centroids=train_centroids(emb))
    assert sorted(map(tuple, pruned.collect())) == \
           sorted(map(tuple, mem.collect()))

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain("formatted")
    assert "PartitionFilters" in buf.getvalue()


def test_distributed_kmeans_deterministic_and_converges(spark):
    """Full-corpus trainer: partition-independent (integer micro-unit
    sums), deterministic across runs, and its final assignment inertia
    beats the init's."""
    import numpy as np
    import pytest
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.similarity import (
        train_centroids_distributed)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c1 = train_centroids_distributed(emb, n_lists=8, iters=4)
    c2 = train_centroids_distributed(emb.repartition(7), n_lists=8,
                                     iters=4)
    assert np.array_equal(c1, c2)          # partitioning-independent

    X = np.asarray([r.embedding for r in
                    emb.select("vec_id", "embedding").orderBy("vec_id")
                    .collect()], dtype=np.float64)
    init = X[:8]

    def inertia(C):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1)
        return d2.min(1).sum()

    assert inertia(c1) < inertia(init)     # Lloyd improved the init
    with pytest.raises(ValueError):
        train_centroids_distributed(emb.limit(0), n_lists=8)


def test_hybrid_rrf_fuses_both_legs(spark):
    from dynamic_partitioner_spark.operators.similarity import (
        hybrid_rrf_topk)
    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha alpha"), (2, "gamma")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.1])],
        "vec_id long, embedding array<float>")
    qv = emb.where("vec_id = 0")
    out = {r.doc_id: r for r in
           hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                           "embedding", qv, ["alpha"], k=3).collect()}
    # lexical leg: doc1 (tf 2) > doc0 (tf 1); doc2 absent
    assert out[1].rank_text == 1 and out[0].rank_text == 2
    assert out[2].rank_text is None
    # vector leg: doc0 (cos 1) > doc2 > doc1
    assert out[0].rank_vec == 1 and out[2].rank_vec == 2
    # fusion: doc0 (2nd lex + 1st vec) beats doc1 (1st lex + 3rd vec)
    assert out[0].rank == 1
    assert abs(out[0].rrf - round(1 / 62 + 1 / 61, 4)) < 2e-4


def test_hybrid_rrf_validates_k(spark):
    import pytest

    from dynamic_partitioner_spark.operators.similarity import (
        hybrid_rrf_topk)
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    emb = spark.createDataFrame([(0, [1.0])],
                                "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                        "embedding", emb, ["x"], k=50, shortlist=10)


def test_cosine_threshold_sweep_invariants(spark):
    """The sweep's histogram covers every sampled pair exactly once,
    the cumulative column is a suffix sum, and zero vectors are out."""
    import pytest as _pytest

    from dynamic_partitioner_spark.operators.similarity import (
        cosine_threshold_sweep)

    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5), 1.0])
            for i in range(40)] + [(99, [0.0, 0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = cosine_threshold_sweep(df, "vec_id", "embedding",
                                 target_rows=10_000).collect()
    # zero vector excluded -> C(40, 2) pairs total
    assert sum(r.n_pairs for r in out) == 40 * 39 // 2
    by_bucket = sorted(out, key=lambda r: -r.bucket)
    cum = 0
    for r in by_bucket:
        cum += r.n_pairs
        assert r.n_pairs_ge == cum          # suffix-sum sweep
    assert all(-1.0 <= r.cos_lo <= 1.0 for r in out)

    with _pytest.raises(ValueError):
        cosine_threshold_sweep(df, "vec_id", "embedding", target_rows=0)


def test_cosine_threshold_sweep_caps_sample(spark):
    """With target_rows << N the hash cut actually bites: the sampled
    pair count stays far below C(N,2), is deterministic across runs,
    and ragged vectors are excluded from pairing."""
    from dynamic_partitioner_spark.operators.similarity import (
        cosine_threshold_sweep)

    n = 400
    rows = [(i, [float(i % 7 + 1), float((i * 3) % 5), 1.0])
            for i in range(n)]
    rows.append((n, [1.0, 2.0]))       # ragged: dim 2, never pairs
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    runs = []
    for _ in range(2):
        out = cosine_threshold_sweep(df, "vec_id", "embedding",
                                     target_rows=40).collect()
        runs.append(sorted((r.bucket, r.n_pairs) for r in out))
    assert runs[0] == runs[1]                       # deterministic
    total = sum(p for _, p in runs[0])
    # expected sample ~40 of 401 -> ~C(40,2)=780 pairs; allow slack
    # but require far below C(401,2)=80200
    assert 0 < total < 3000

    import pytest as _pytest
    with _pytest.raises(ValueError):
        cosine_threshold_sweep(df, "vec_id", "embedding",
                               target_rows=0.25)    # legacy fraction


# ------------------------------------------------- two-level quantizer

def test_two_level_codebook_shape_and_determinism(spark):
    from dynamic_partitioner_spark.operators.similarity import (
        train_centroids_two_level)
    df = spark.read.parquet(EMB)
    c1, f1, o1 = train_centroids_two_level(df, n_coarse=8, n_fine=4,
                                           sample_size=512)
    c2, f2, o2 = train_centroids_two_level(df, n_coarse=8, n_fine=4,
                                           sample_size=512)
    assert (c1 == c2).all() and (o1 == o2).all()
    assert all((a == b).all() for a, b in zip(f1, f2))
    assert len(f1) == len(c1) == len(o1)
    # offsets are the running list-count: dense global ids
    total = 0
    for off, fc in zip(o1, f1):
        assert off == total and len(fc) >= 1
        total += len(fc)


def test_two_level_assignment_covers_corpus_with_dense_ids(spark):
    from dynamic_partitioner_spark.operators.similarity import (
        _nearest_lists_two_level_udf, train_centroids_two_level)
    df = spark.read.parquet(EMB)
    coarse, fines, offsets = train_centroids_two_level(
        df, n_coarse=8, n_fine=4, sample_size=512)
    n_lists = int(offsets[-1]) + len(fines[-1])
    assign = _nearest_lists_two_level_udf(coarse, fines, offsets,
                                          nprobe=2)
    got = (df.select(F.explode(assign(F.col("embedding")))
                     .alias("list_id"))
           .agg(F.min("list_id"), F.max("list_id"),
                F.count(F.lit(1))).first())
    assert got[0] >= 0 and got[1] < n_lists
    assert got[2] == 2 * df.count()  # every vector gets nprobe ids


def test_two_level_assignment_agrees_with_exhaustive(spark):
    """The UDF's staged (coarse-then-fine) search must equal an
    exhaustive scan over the flattened codebook whenever the true
    nearest fine centroid lives in one of the probed coarse cells —
    pin it on vectors that ARE sample points (their residual to their
    own cell's codebook is minimal, so the coarse probe contains the
    winner)."""
    import numpy as np

    from dynamic_partitioner_spark.operators.similarity import (
        _nearest_lists_two_level_udf, train_centroids_two_level)
    df = spark.read.parquet(EMB)
    coarse, fines, offsets = train_centroids_two_level(
        df, n_coarse=4, n_fine=4, sample_size=256)
    flat = np.vstack(fines)
    assign = _nearest_lists_two_level_udf(coarse, fines, offsets,
                                          nprobe=1, probe_coarse=4)
    got = {r[0]: r[1][0] for r in
           df.where(F.col("vec_id") < 50)
           .select("vec_id", assign(F.col("embedding"))).collect()}
    vecs = {r[0]: np.asarray(r[1], dtype=np.float64) for r in
            df.where(F.col("vec_id") < 50)
            .select("vec_id", "embedding").collect()}
    for vid, lid in got.items():
        d2 = ((flat - vecs[vid]) ** 2).sum(1)
        assert d2[lid] == d2.min(), (vid, lid, d2.argmin())


def test_semantic_dedup_two_level_path_recovers_planted_pairs(
        spark, monkeypatch):
    """Exercise semantic_dedup's two-level switching branch on a small
    corpus by lowering the flat-codebook clamp: with the clamp at 16
    and target_cluster_size=4, want = 220/4 = 55 > 16 forces the
    two-level quantizer, and the blocked pair screen must still
    recover the planted near-dups (the same contract the flat path's
    recall test pins)."""
    import numpy as np

    from dynamic_partitioner_spark.operators import dedup as D

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # plant 20 near-dups: id 1000+i ~ id i
    for i in range(20):
        w = base[i] + rng.normal(scale=0.01, size=16)
        rows.append((1000 + i, (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setattr(D, "_FLAT_LIST_CLAMP", 16)
    got = D.semantic_dedup(df, "vec_id", "embedding", threshold=0.98,
                           n_lists=None, nprobe=2,
                           target_cluster_size=4)
    pairs = {(r.id_a, r.id_b) for r in got.collect()}
    planted = {(i, 1000 + i) for i in range(20)}
    assert len(planted & pairs) >= 18, sorted(planted - pairs)


def test_semantic_dedup_extra_probes_recall_monotone(spark, monkeypatch):
    """Pin the extra_probes knob (r11 VERDICT #7) on the two-level
    path: probed lists are nearest-k, so extra_probes ∈ {0,1,2} must
    yield a monotone pair-set chain (superset as probes grow), the
    default (1) must reproduce the pre-knob hard-coded nprobe+1
    recall, and even extra_probes=0 must keep most planted pairs."""
    import numpy as np

    from dynamic_partitioner_spark.operators import dedup as D

    rng = np.random.default_rng(11)
    base = rng.normal(size=(200, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    for i in range(20):
        w = base[i] + rng.normal(scale=0.01, size=16)
        rows.append((1000 + i, (w / np.linalg.norm(w)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setattr(D, "_FLAT_LIST_CLAMP", 16)
    planted = {(i, 1000 + i) for i in range(20)}
    by_probe = {}
    for ep in (0, 1, 2):
        got = D.semantic_dedup(df, "vec_id", "embedding", threshold=0.98,
                               n_lists=None, nprobe=2, extra_probes=ep,
                               target_cluster_size=4)
        by_probe[ep] = {(r.id_a, r.id_b) for r in got.collect()}
    assert by_probe[0] <= by_probe[1] <= by_probe[2], (
        "pair set must grow monotonically with extra_probes")
    assert len(planted & by_probe[1]) >= 18, sorted(planted - by_probe[1])
    assert len(planted & by_probe[0]) >= 14, sorted(planted - by_probe[0])


def test_ivf2_full_probe_is_exact(spark):
    """probe_coarse == n_coarse and nprobe >= total lists degenerates
    the staged search to exhaustive -> identical to brute force."""
    from dynamic_partitioner_spark.operators.similarity import (
        topk_ann_ivf2, train_centroids_two_level)
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 5)
    cb = train_centroids_two_level(df, n_coarse=4, n_fine=4,
                                   sample_size=512)
    total = int(cb[2][-1]) + len(cb[1][-1])
    exact = sorted((r.query_id, r.neighbor_id, r.cos_sim)
                   for r in topk_bruteforce(df, q, k=5).collect())
    full = sorted((r.query_id, r.neighbor_id, r.cos_sim)
                  for r in topk_ann_ivf2(df, q, k=5, codebook=cb,
                                         nprobe=total,
                                         probe_coarse=4).collect())
    assert full == exact


def test_ivf2_recall_vs_bruteforce(spark):
    from dynamic_partitioner_spark.operators.similarity import (
        topk_ann_ivf2)
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id)
             for r in topk_bruteforce(df, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in topk_ann_ivf2(df, q, k=5, n_coarse=8, n_fine=4,
                                     nprobe=4, probe_coarse=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"two-level IVF recall too low: {recall}"


def test_ivf2_deterministic(spark):
    from dynamic_partitioner_spark.operators.similarity import (
        topk_ann_ivf2)
    df = spark.read.parquet(EMB)
    q = df.where(F.col("vec_id") < 5)
    a = sorted(map(tuple, topk_ann_ivf2(df, q, k=5).collect()))
    b = sorted(map(tuple, topk_ann_ivf2(df, q, k=5).collect()))
    assert a == b


def test_nan_element_vectors_assign_null_not_list_zero(spark):
    """r13 review (verified repro): Arrow delivers NULL array elements
    as NaN, which passed the length check — the NaN row's distances
    were all-NaN and argmin silently assigned list 0 / bucket 0.
    Both UDFs must NULL-assign such vectors instead."""
    import numpy as np

    from dynamic_partitioner_spark.operators.similarity import (
        _all_buckets_udf, _nearest_lists_udf)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [None, 1.0]), (3, [0.0, 1.0])],
        "id long, v array<double>")
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    got = {r.id: r.lists for r in df.select(
        "id", _nearest_lists_udf(cents, 1)(F.col("v")).alias("lists"))
        .collect()}
    assert got[1] == [0] and got[3] == [1]
    assert got[2] is None
    got_b = {r.id: r.b for r in df.select(
        "id", _all_buckets_udf(2, 2, 1, 42)(F.col("v")).alias("b"))
        .collect()}
    assert got_b[2] is None and got_b[1] is not None


def test_nprobe_guards_raise(spark):
    """r13 review: zero-width probes produced silently empty results —
    the silent-recall-loss class the repo guards loudly elsewhere."""
    import numpy as np
    import pytest

    from dynamic_partitioner_spark.operators.similarity import (
        _nearest_lists_two_level_udf, _nearest_lists_udf)

    cents = np.eye(2)
    with pytest.raises(ValueError, match="nprobe"):
        _nearest_lists_udf(cents, 0)
    with pytest.raises(ValueError, match="probe_coarse"):
        _nearest_lists_two_level_udf(cents, [cents], np.array([0, 1]),
                                     1, probe_coarse=0)


def test_trainer_sample_uses_modal_dimension(spark):
    """r13 review: the trained dimension came from the FIRST sampled
    row, so one ragged lowest-id vector poisoned the codebook and
    every downstream topk silently returned empty — the modal
    dimension wins now."""
    from dynamic_partitioner_spark.operators.similarity import (
        train_centroids)

    df = spark.createDataFrame(
        [(0, [9.0])]                       # ragged lowest-id row
        + [(i, [float(i), 0.0]) for i in range(1, 9)],
        "vec_id long, embedding array<double>")
    cents = train_centroids(df, n_lists=2, sample_size=16)
    assert cents.shape[1] == 2             # not poisoned to dim 1


def test_distributed_trainer_tolerates_ragged_rows(spark):
    """r13 review (verified repro): a ragged vector's NULL assignment
    group used Row value None as a numpy index — None is np.newaxis,
    silently overwriting an entire sums row and ALL cluster counts."""
    import numpy as np

    from dynamic_partitioner_spark.operators.similarity import (
        train_centroids, train_centroids_distributed)

    clean = [(i, [float(i % 4), float(i % 3)]) for i in range(1, 17)]
    df_clean = spark.createDataFrame(
        clean, "vec_id long, embedding array<double>")
    df_dirty = spark.createDataFrame(
        clean + [(99, [5.0]), (100, None)],
        "vec_id long, embedding array<double>")
    a = train_centroids_distributed(df_clean, n_lists=2, iters=2)
    b = train_centroids_distributed(df_dirty, n_lists=2, iters=2)
    assert np.allclose(a, b)               # dirty rows change nothing


def test_sign_bucket_nulls_bad_vectors(spark):
    """r13 review: the pure-Column sign_bucket sent NULL/ragged
    vectors to bucket 0 (every NULL 'd > 0' fell through to 0),
    colliding them with legitimate all-negative-signs vectors — they
    bucket to NULL now, matching the vectorized path."""
    from dynamic_partitioner_spark.operators.similarity import (
        _hyperplanes, sign_bucket)
    from pyspark.sql import functions as F

    planes = _hyperplanes(2, 2, seed=1)
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, None), (3, [1.0])],
        "id long, v array<double>")
    got = {r.id: r.b for r in df.select(
        "id", sign_bucket(F.col("v"), planes).alias("b")).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None


def test_sign_bucket_nan_and_null_elements_match_udf(spark):
    """r13 advice: in Spark SQL ``NaN > 0`` is TRUE (NaN sorts
    largest), so the pure-Column oracle bucketed a NaN-element vector
    into a real bucket while the vectorized UDF NULL-bucketed it.
    Both paths NULL-bucket NaN- and NULL-element vectors now."""
    from dynamic_partitioner_spark.operators.similarity import (
        _all_buckets_udf, _hyperplanes, sign_bucket)
    from pyspark.sql import functions as F

    dim, n_planes, seed = 2, 2, 42
    planes = _hyperplanes(dim, n_planes, seed)
    budf = _all_buckets_udf(dim, n_planes, n_tables=1, seed=seed)
    df = spark.createDataFrame(
        [(1, [1.0, 1.0]), (2, [float("nan"), 1.0]), (3, [None, 1.0])],
        "id long, v array<double>")
    got = {r.id: (r.col, r.udf) for r in df.select(
        "id", sign_bucket(F.col("v"), planes).alias("col"),
        budf(F.col("v")).getItem(0).alias("udf")).collect()}
    assert got[1][0] is not None and got[1][0] == got[1][1]
    assert got[2] == (None, None)        # NaN element
    assert got[3] == (None, None)        # NULL element


def test_hybrid_rrf_rejects_multirow_query(spark):
    """r13 review: >1 query_vec rows interleaved under one global rank
    window, producing duplicate doc_ids with garbage rrf scores."""
    import pytest

    from dynamic_partitioner_spark.operators.similarity import (
        hybrid_rrf_topk)

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    emb = spark.createDataFrame([(1, [1.0, 0.0])],
                                "vec_id long, embedding array<double>")
    qv = spark.createDataFrame(
        [([1.0, 0.0],), ([0.0, 1.0],)], "embedding array<double>")
    with pytest.raises(ValueError, match="exactly 1 row"):
        hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                        "embedding", qv, ["a"], k=1, shortlist=5)


def test_r15_similarity_hardening(spark):
    """r15 module-review pins: (1) topk_ann_lsh rejects a dim that
    mismatches the corpus width instead of returning a silently EMPTY
    result; (2) hybrid_rrf_topk lowercases caller terms (tokens() is
    lowercased — 'Alpha' previously contributed zero lexical signal),
    rejects empty terms and c < 1; (3) cosine_threshold_sweep
    excludes NaN-element vectors (NaN l2 > 0 is TRUE both engines —
    the pair crashed the DuckDB cast / mis-bucketed in Spark);
    (4) duplicate centroids assign stably, so identical vectors probe
    the SAME duplicate list at nprobe=1."""
    import pytest

    from dynamic_partitioner_spark.operators.similarity import (
        cosine_threshold_sweep, hybrid_rrf_topk, topk_ann_ivf)

    emb32 = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="vector width"):
        topk_ann_lsh(emb32, emb32.limit(1), k=2)   # default dim=64

    docs = spark.createDataFrame(
        [(0, "alpha beta"), (1, "alpha alpha"), (2, "gamma")],
        "doc_id long, text string")
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 0.1])],
        "vec_id long, embedding array<float>")
    qv = emb.where("vec_id = 0")
    out = {r.doc_id: r for r in
           hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                           "embedding", qv, ["Alpha"], k=3).collect()}
    assert out[1].rank_text == 1 and out[0].rank_text == 2
    with pytest.raises(ValueError, match="non-empty"):
        hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                        "embedding", qv, [], k=1, shortlist=5)
    with pytest.raises(ValueError, match="c >= 1"):
        hybrid_rrf_topk(docs, "doc_id", "text", emb, "vec_id",
                        "embedding", qv, ["alpha"], k=1, shortlist=5,
                        c=-5)

    nanv = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [1.0, 0.0]),
         (3, [float("nan"), 1.0])],
        "vec_id long, embedding array<double>")
    sweep = cosine_threshold_sweep(nanv, "vec_id", "embedding",
                                   target_rows=10)
    rows = sweep.collect()
    # only the (1,2) pair survives; the NaN vector is excluded
    assert sum(r.n_pairs for r in rows) == 1

    dup = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)]
        + [(10 + i, [0.0, 1.0]) for i in range(4)],
        "vec_id long, embedding array<double>")
    # n_lists=2 over two tight duplicate piles -> possibly duplicate
    # centroids; stable assignment must keep each pile co-listed so
    # every query finds its identical neighbors at nprobe=1
    got = topk_ann_ivf(dup, dup, k=2, n_lists=2, nprobe=1)
    per_q = {r.query_id for r in got.collect()}
    assert per_q == {r.vec_id for r in dup.collect()}


def test_bruteforce_corpus_scoring_is_spread(spark):
    """r16 plan pin: topk_bruteforce round-robin-repartitions the
    corpus side before the broadcast cross join (REPARTITION_BY_NUM)
    so the per-pair cosine fold runs cluster-wide instead of on the
    scan's 1-2 partitions."""
    from dynamic_partitioner_spark.operators.similarity import (
        topk_bruteforce)

    emb = spark.createDataFrame(
        [(i, [1.0 * (i + 1), 2.0, 3.0]) for i in range(6)],
        "vec_id long, embedding array<double>").coalesce(1)
    out = topk_bruteforce(emb, emb.where("vec_id < 2"), k=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert out.count() == 4
