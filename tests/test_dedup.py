from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators import dedup as DD


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 1
        (3, "the quick brown fox jumps over the lazy cat", "en"),   # near dup of 1
        (4, "completely different words entirely unrelated text here", "en"),
        (5, "der schnelle braune fuchs springt ueber den faulen hund", "de"),
        (6, "der schnelle braune fuchs springt ueber den faulen hund extra", "de"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_exact_dedup_keeps_min_id(spark):
    out = {r.text: (r.doc_id, r.dup_count)
           for r in DD.exact_dedup(_docs(spark), ["text"], "doc_id").collect()}
    assert out["the quick brown fox jumps over the lazy dog"] == (1, 2)
    assert len(out) == 5


def test_shingles_and_jaccard(spark):
    df = spark.range(1).select(
        DD.shingles(F.lit("a b c d"), 3).alias("sh"),
        DD.shingles(F.lit("x"), 3).alias("short"))
    row = df.collect()[0]
    assert row.sh == ["a b c", "b c d"]
    assert row.short == []          # shorter than n → empty, not garbage


def test_minhash_finds_exact_and_near_dups(spark):
    pairs = {(r.id_a, r.id_b): r.jaccard
             for r in DD.near_dup_minhash(_docs(spark), "doc_id", "text",
                                          threshold=0.5).collect()}
    assert pairs[(1, 2)] == 1.0          # exact dup always at jaccard 1
    assert (1, 3) in pairs or (2, 3) in pairs   # near dup caught
    assert (5, 6) in pairs
    assert all(a < b for a, b in pairs)


def test_minhash_recall_vs_exact_baseline(spark):
    exact = {(r.id_a, r.id_b)
             for r in DD.ngram_jaccard_pairs(_docs(spark), "doc_id", "text",
                                             "lang", threshold=0.6).collect()}
    lsh = {(r.id_a, r.id_b)
           for r in DD.near_dup_minhash(_docs(spark), "doc_id", "text",
                                        threshold=0.6).collect()}
    assert exact, "baseline must find pairs"
    assert len(lsh & exact) / len(exact) >= 0.99   # high-sim pairs: near-total recall


def test_simhash_identical_docs_same_hash(spark):
    hashes = (_docs(spark)
              .select("doc_id", DD.simhash_batched(F.col("text")).alias("h"))
              .collect())
    by_id = {r.doc_id: r.h for r in hashes}
    assert by_id[1] == by_id[2]
    assert 0 <= by_id[1] < 2 ** 32


def test_simhash_pairs_blocked_by_lang(spark):
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in DD.simhash_pairs(_docs(spark), "doc_id", "text", "lang",
                                       max_hamming=8).collect()}
    assert pairs[(1, 2)] == 0
    # cross-lang pairs never appear regardless of hash proximity
    assert all(not (a == 1 and b == 5) for a, b in pairs)


def test_embedding_near_dup(spark):
    rows = [(1, [1.0, 0.0], "a"), (2, [0.999, 0.01], "a"),
            (3, [0.0, 1.0], "a"), (4, [1.0, 0.0], "b")]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>, label string")
    pairs = {(r.id_a, r.id_b): r.cos_sim
             for r in DD.embedding_near_dup(df, "vec_id", "v", "label",
                                            threshold=0.95).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.99
    assert (1, 3) not in pairs           # orthogonal
    assert (1, 4) not in pairs           # different block


def test_lsh_hot_bucket_cap(spark):
    """A degenerate bucket (many identical empty-ish docs) is dropped
    when over the cap; distinct docs still pair via their other bands."""
    from dynamic_partitioner_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signature, shingles)
    from pyspark.sql import functions as F

    # 30 empty docs (identical signature -> one hot bucket per band)
    # + 2 real near-dup docs
    rows = [(i, "") for i in range(30)]
    rows += [(100, "alpha beta gamma delta epsilon zeta"),
             (101, "alpha beta gamma delta epsilon zeta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = df.select("doc_id",
                     minhash_signature(shingles(F.col("text"), 3), 16)
                     .alias("sig"))
    uncapped = lsh_candidate_pairs(sigs, "doc_id", "sig", bands=4,
                                   rows_per_band=4, max_bucket_size=None)
    capped = lsh_candidate_pairs(sigs, "doc_id", "sig", bands=4,
                                 rows_per_band=4, max_bucket_size=10)
    # uncapped: 30*29/2 empty-doc pairs + the real pair
    assert uncapped.count() == 30 * 29 // 2 + 1
    got = {(r.id_a, r.id_b) for r in capped.collect()}
    assert (100, 101) in got               # real pair survives
    assert all(a >= 100 for a, _ in got)   # hot-bucket pairs dropped


def test_embedding_lsh_hot_bucket_cap(spark):
    """Degenerate bucket: 30 identical vectors share one bucket in every
    table (30·29/2 quadratic pairs).  Over the cap that bucket is
    dropped — the pile-up's pairs vanish — while a real near-identical
    pair in another bucket still verifies."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup_lsh)

    dim = 8
    pile = [0.0] * 7 + [1.0]
    rows = [(i, pile) for i in range(30)]
    rows += [(100, [1.0, 0.5, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]),
             (101, [1.0, 0.49, 0.0, 0.0, 0.0, 0.0, 0.0, 0.01])]
    df = spark.createDataFrame(rows, "vec_id long, v array<double>")

    def pairs(cap):
        return {(r.id_a, r.id_b) for r in
                embedding_near_dup_lsh(df, "vec_id", "v", threshold=0.9,
                                       dim=dim, n_planes=3, n_tables=2,
                                       max_bucket_size=cap).collect()}

    uncapped = pairs(None)
    assert len(uncapped) == 30 * 29 // 2 + 1     # pile quadratic + real pair
    capped = pairs(10)
    assert (100, 101) in capped                  # real pair survives
    assert all(a >= 100 for a, _ in capped)      # pile pairs dropped


def test_embedding_lsh_auto_planes(spark):
    """n_planes=None derives the bucket count from the corpus size."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup_lsh)

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = embedding_near_dup_lsh(emb, "vec_id", "embedding", threshold=0.3,
                                 n_planes=None, n_tables=8)
    # runs end-to-end, returns verified pairs only
    rows = out.collect()
    assert all(r.cos_sim >= 0.3 for r in rows)
    assert all(r.id_a < r.id_b for r in rows)


def test_embedding_near_dup_lsh_recall(spark):
    """Label-free LSH near-dup: every returned pair is a true pair
    (cosine verified) and recall vs the exact cross-join baseline is
    adequate at the tuned operating point."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup_lsh)
    from dynamic_partitioner_spark.functions.vectors import cosine
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a, b = emb.alias("a"), emb.alias("b")
    exact = {(r.i, r.j) for r in
             (a.crossJoin(b).where(F.col("a.vec_id") < F.col("b.vec_id"))
              .select(F.col("a.vec_id").alias("i"), F.col("b.vec_id").alias("j"),
                      F.round(cosine(F.col("a.embedding"), F.col("b.embedding")),
                              4).alias("c"))
              .where(F.col("c") >= 0.3)).collect()}
    # driver-key operating point: auto planes, 8 tables.  Measured
    # recall is 0.97 at sf0.001 and sf0.01; pin measured-minus-margin
    # so a real regression (not jitter) goes red.
    got = {(r.id_a, r.id_b) for r in
           embedding_near_dup_lsh(emb, "vec_id", "embedding", threshold=0.3,
                                  n_planes=None, n_tables=8).collect()}
    assert got <= exact                        # no false positives
    assert exact
    recall = len(got) / len(exact)
    assert recall >= 0.9, f"recall too low: {recall}"


def test_minhash_batched_bit_identical(spark):
    """The Arrow-batched signature must equal the Column spec form on
    every row, including empty-shingle docs ([NULL]*k both ways)."""
    from dynamic_partitioner_spark.operators.dedup import (
        minhash_signature, minhash_signature_batched, shingle_bases,
        shingles)

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(100).select("doc_id", "text"))
    edge = spark.createDataFrame([(100001, ""), (100002, "one two")],
                                 "doc_id long, text string")
    sh = docs.unionByName(edge).select(
        "doc_id", shingles(F.col("text"), 3).alias("sh"))
    both = sh.select(
        "doc_id",
        minhash_signature(F.col("sh"), 16).alias("col_form"),
        minhash_signature_batched(shingle_bases(F.col("sh")), 16)
        .alias("batched"))
    rows = both.collect()
    assert rows and all(r.col_form == r.batched for r in rows)


def test_ngram_jaccard_shingle_df_cap(spark):
    """max_shingle_df drops corpus-frequent shingles: results are an
    under-approximation (subset of exact pairs, jaccard never inflated)
    and a stop-shingle pile-up no longer drives the join quadratic."""
    common = "the common boiler plate header text"
    rows = [(i, f"{common} unique{i} filler{i} words{i}", "en")
            for i in range(20)]
    rows += [(100, "alpha beta gamma delta epsilon zeta", "en"),
             (101, "alpha beta gamma delta epsilon zeta", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    exact = {(r.id_a, r.id_b): r.jaccard for r in
             DD.ngram_jaccard_pairs(df, "doc_id", "text", "lang",
                                    threshold=0.1).collect()}
    capped = {(r.id_a, r.id_b): r.jaccard for r in
              DD.ngram_jaccard_pairs(df, "doc_id", "text", "lang",
                                     threshold=0.1,
                                     max_shingle_df=5).collect()}
    assert set(capped) <= set(exact)               # under-approximation
    assert all(capped[p] <= exact[p] for p in capped)
    assert capped[(100, 101)] == 1.0               # rare-shingle pair intact
    # boilerplate-only pairs vanish once their shingles are capped away
    assert any(p not in capped for p in exact if p != (100, 101))


def test_dedup_clusters_connected_components(spark):
    """Chain a-b, b-c plus an isolated pair d-e: one 3-cluster with min
    representative, one 2-cluster; transitivity crosses the chain even
    though (a, c) was never a pair."""
    pairs = spark.createDataFrame(
        [(10, 20), (20, 30), (40, 50)], "id_a long, id_b long")
    got = {r.doc_id: r.cluster_id
           for r in DD.dedup_clusters(pairs).collect()}
    assert got == {10: 10, 20: 10, 30: 10, 40: 40, 50: 40}


def test_incremental_dedup_history_and_batch(spark):
    """History rows excluded, intra-batch dup keeps the lowest id,
    genuinely new rows pass."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.functions.text import doc_fingerprint

    new = spark.createDataFrame(
        [(1, "seen before"), (2, "fresh one"), (3, "fresh one"),
         (4, "another new")], "doc_id long, text string")
    hist = spark.createDataFrame([("seen before",)], "t string").select(
        doc_fingerprint(F.col("t")).alias("fingerprint"))
    out = DD.incremental_dedup(new, hist,
                               doc_fingerprint(F.col("text")), "doc_id")
    assert sorted(r.doc_id for r in out.collect()) == [2, 4]


def test_decontaminate_flags_overlap_only(spark):
    """Docs sharing an n-gram with the benchmark are flagged with the
    distinct-shared-shingle count; clean docs don't appear."""
    corpus = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely different words here nothing shared at all"),
         (3, "quick brown fox jumps elsewhere entirely now")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "a quick brown fox jumps question")],
        "bid long, text string")
    got = {(r.doc_id, r.n_hits)
           for r in DD.decontaminate(corpus, bench, "doc_id", "text",
                                     bench_text_col="text", n=4).collect()}
    # shared 4-grams with bench: "quick brown fox jumps" in docs 1 and 3
    assert got == {(1, 1), (3, 1)}


def test_decontaminate_broadcasts_benchmark(spark):
    import contextlib
    import io

    corpus = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d")], "bid long, text string")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        DD.decontaminate(corpus, bench, "doc_id", "text",
                         n=4).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_shingles_batched_matches_column_form(spark):
    """Arrow shingles are element-for-element identical to the HOF
    Column form (same tokenization, same first-occurrence order)."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.dedup import (
        shingles, shingles_batched)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [(9001, ""), (9002, " "), (9003, "\t"), (9004, "a b"),
         (9005, "a b c a b c a b c"), (9006, None)],
        "doc_id long, text string")
    both = docs.select("doc_id", "text").unionByName(edge)
    diff = both.select(
        shingles(F.col("text"), 3).alias("col_form"),
        shingles_batched(F.col("text"), 3).alias("arrow"))
    assert diff.where(F.col("col_form") != F.col("arrow")).count() == 0
    assert diff.where(F.col("col_form").isNull()
                      != F.col("arrow").isNull()).count() == 0


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc pasted inside a long one: containment 1.0 while
    jaccard stays below any realistic threshold."""
    from dynamic_partitioner_spark.operators.dedup import (
        containment_pairs, ngram_jaccard_pairs)

    short = "alpha beta gamma delta epsilon"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(30))
    df = spark.createDataFrame(
        [(1, short, "en"), (2, short + " " + filler, "en")],
        "doc_id long, text string, lang string")
    cont = containment_pairs(df, "doc_id", "text", "lang",
                             threshold=0.9, n=3).collect()
    assert len(cont) == 1 and cont[0].containment == 1.0
    jac = ngram_jaccard_pairs(df, "doc_id", "text", "lang",
                              threshold=0.5, n=3).collect()
    assert jac == []


def test_ngrams_all_batched_matches_column_form(spark):
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.dedup import (
        ngrams_all, ngrams_all_batched)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    edge = spark.createDataFrame(
        [(9001, ""), (9002, "a b"), (9003, "a b a b"), (9004, None)],
        "doc_id long, text string")
    both = docs.select("doc_id", "text").unionByName(edge)
    for n in (2, 3):
        diff = both.select(
            ngrams_all(F.col("text"), n).alias("col_form"),
            ngrams_all_batched(F.col("text"), n).alias("arrow"))
        assert diff.where(F.col("col_form") != F.col("arrow")).count() == 0
        assert diff.where(F.col("col_form").isNull()
                          != F.col("arrow").isNull()).count() == 0


def test_winnow_guarantee_shared_span_shares_fingerprint(spark):
    """Winnowing guarantee: two docs sharing a run of >= w + k - 1
    tokens (7 here) share at least one fingerprint; disjoint docs
    share none."""
    from dynamic_partitioner_spark.operators.dedup import (
        winnow_fingerprints)

    span = "the quick brown fox jumps over lazily"          # 7 tokens
    df = spark.createDataFrame(
        [(1, "intro words here " + span + " trailing bits"),
         (2, span + " completely different ending text"),
         (3, "zero overlap with anything else at all here")],
        "doc_id long, text string")
    fps = winnow_fingerprints(df, "doc_id", "text", k=4, w=4).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2]                 # shared span detected
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_semantic_dedup_recall_vs_exact(spark):
    """Cluster-blocked semantic pairs recover most exact cosine pairs
    (multi-probe covers boundary stragglers), with zero false
    positives (every emitted pair passes the exact verify)."""
    from pyspark.sql import functions as F

    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup, semantic_dedup)

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = {(r.id_a, r.id_b) for r in
           semantic_dedup(emb, "vec_id", "embedding",
                          threshold=0.3).collect()}
    exact = {(r.id_a, r.id_b) for r in
             embedding_near_dup(
                 emb.withColumn("_one", F.lit(1)),
                 "vec_id", "embedding", "_one",
                 threshold=0.3).collect()}
    assert got <= exact                       # no false positives
    assert exact and len(got) / len(exact) >= 0.6   # blocking recall


def test_semantic_dedup_subdivides_hot_clusters(spark):
    """Corpus grown past n_lists × max_cluster_size: over-cap clusters
    are SUBDIVIDED (sign-LSH sub-blocks), not dropped — planted
    near-dup pairs inside a hot cluster still come out, with zero
    false positives."""
    import numpy as np

    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup, semantic_dedup)

    dim = 8
    rng = np.random.RandomState(7)
    rows = []
    for i in range(240):                       # diverse background
        v = rng.randn(dim)
        rows.append((i, (v / np.linalg.norm(v)).round(4).tolist()))
    for j in range(10):                        # planted near-dup pairs
        v = rng.randn(dim)
        v /= np.linalg.norm(v)
        w = v + rng.randn(dim) * 0.01
        w /= np.linalg.norm(w)
        rows.append((1000 + 2 * j, v.round(4).tolist()))
        rows.append((1001 + 2 * j, w.round(4).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    # n_lists=2 forces every cluster far over the cap of 40, so the
    # subdivision path (not the drop guard) must carry the recall
    got = {(r.id_a, r.id_b) for r in
           semantic_dedup(df, "vec_id", "embedding", threshold=0.95,
                          n_lists=2, nprobe=1, max_cluster_size=40,
                          dim=dim).collect()}
    exact = {(r.id_a, r.id_b) for r in
             embedding_near_dup(
                 df.withColumn("_one", F.lit(1)), "vec_id", "embedding",
                 "_one", threshold=0.95).collect()}
    planted = {(1000 + 2 * j, 1001 + 2 * j) for j in range(10)} & exact
    assert got <= exact                        # no false positives
    assert len(got & planted) / len(planted) >= 0.8


def test_semantic_dedup_drops_only_undivisible_piles(spark):
    """A pile of IDENTICAL vectors cannot be subdivided by any
    pair-preserving split — those sub-blocks are dropped (the quadratic
    guard), while a real pair outside the pile survives."""
    import numpy as np

    from dynamic_partitioner_spark.operators.dedup import semantic_dedup

    dim = 8
    pile = [0.0] * 7 + [1.0]
    rows = [(i, pile) for i in range(120)]
    rng = np.random.RandomState(11)
    for i in range(200, 260):                  # diverse spread
        v = rng.randn(dim)
        rows.append((i, (v / np.linalg.norm(v)).round(4).tolist()))
    v = rng.randn(dim)
    v /= np.linalg.norm(v)
    w = v + rng.randn(dim) * 0.005
    w /= np.linalg.norm(w)
    rows += [(900, v.round(4).tolist()), (901, w.round(4).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    got = {(r.id_a, r.id_b) for r in
           semantic_dedup(df, "vec_id", "embedding", threshold=0.95,
                          n_lists=4, nprobe=2, max_cluster_size=30,
                          dim=dim).collect()}
    assert (900, 901) in got                   # real pair survives
    assert not any(a < 120 and b < 120 for a, b in got)  # pile dropped


def test_apply_dedup_keeps_min_id_per_cluster(spark):
    """pairs → clusters → cleaned corpus: only min-id representatives
    of paired groups survive; unpaired docs pass through untouched."""
    from dynamic_partitioner_spark.operators.dedup import apply_dedup

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 7, 8, 9, 42)],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    kept = sorted(r.doc_id for r in
                  apply_dedup(corpus, pairs, "doc_id").collect())
    assert kept == [1, 7, 9, 42]


def test_semantic_dedup_nonstandard_dim_and_null_vectors(spark):
    """Review-finding fences: subdivision derives the plane width from
    the data (no 64-dim assumption) and NULL/ragged vectors are
    dropped, not fatal — matching the expression path's NULL-cosine
    filtering."""
    import numpy as np

    from dynamic_partitioner_spark.operators.dedup import semantic_dedup

    dim = 16                               # not the old hard-coded 64
    rng = np.random.RandomState(3)
    rows = []
    for i in range(120):
        v = rng.randn(dim)
        rows.append((i, (v / np.linalg.norm(v)).round(4).tolist()))
    v = rng.randn(dim); v /= np.linalg.norm(v)
    w = v + rng.randn(dim) * 0.005; w /= np.linalg.norm(w)
    rows += [(900, v.round(4).tolist()), (901, w.round(4).tolist()),
             (950, None), (951, [1.0, 0.0])]          # null + ragged
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           semantic_dedup(df, "vec_id", "embedding", threshold=0.95,
                          n_lists=2, nprobe=1,
                          max_cluster_size=30).collect()}
    assert (900, 901) in got
    assert not any(a in (950, 951) or b in (950, 951) for a, b in got)


def test_blocked_matmul_preserves_string_ids(spark):
    from dynamic_partitioner_spark.operators.dedup import (
        _blocked_cosine_pairs_matmul)

    df = spark.createDataFrame(
        [("doc-a", [1.0, 0.0], 1), ("doc-b", [0.999, 0.01], 1),
         ("doc-c", [0.0, 1.0], 1)],
        "doc_id string, v array<double>, blk int")
    got = {(r.id_a, r.id_b) for r in
           _blocked_cosine_pairs_matmul(df, "doc_id", "v", "blk", 0.95)
           .collect()}
    assert got == {("doc-a", "doc-b")}


def test_dedup_clusters_driver_and_distributed_paths_agree(spark):
    from dynamic_partitioner_spark.operators.dedup import dedup_clusters

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (99, 100)],
        "id_a long, id_b long")
    fast = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters(pairs).collect()}
    dist = {(r.doc_id, r.cluster_id)
            for r in dedup_clusters(pairs, driver_threshold=0).collect()}
    assert fast == dist
    assert (3, 1) in fast and (12, 10) in fast and (100, 99) in fast


def test_null_text_and_vectors_are_tolerated_corpus_wide(spark):
    """A NULL document / NULL embedding degrades gracefully on every
    sketch path (review findings): minhash signatures, LSH buckets and
    IVF assignment skip the row instead of killing the job, and
    incremental dedup passes NULL-key rows through undeduped."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup_lsh, incremental_dedup, near_dup_minhash)
    from dynamic_partitioner_spark.operators.similarity import (
        topk_ann_ivf)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, None)],
        "doc_id long, text string")
    pairs = {(r.id_a, r.id_b) for r in
             near_dup_minhash(docs, "doc_id", "text",
                              threshold=0.5).collect()}
    assert pairs == {(1, 2)}

    emb = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.999, 0.01]), (3, None), (4, [0.5])],
        "vec_id long, embedding array<double>")
    got = {(r.id_a, r.id_b) for r in
           embedding_near_dup_lsh(emb, "vec_id", "embedding",
                                  threshold=0.9, dim=2, n_planes=2,
                                  n_tables=2).collect()}
    assert got == {(1, 2)}
    ann = topk_ann_ivf(emb.where("vec_id <= 2"), emb.where("vec_id = 1"),
                       k=1, n_lists=2, nprobe=2)
    assert {(r.query_id, r.neighbor_id) for r in ann.collect()} == {(1, 2)}

    new = spark.createDataFrame(
        [(10, "x"), (11, "x"), (12, None), (13, None)],
        "doc_id long, text string")
    seen = spark.createDataFrame([("zzz",)], "fingerprint string")
    from pyspark.sql import functions as F
    out = incremental_dedup(new, seen, F.md5("text"), "doc_id")
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [10, 12, 13]     # keyed dup dropped, NULLs pass through


def test_minhash_band_width_validated(spark):
    import pytest

    from dynamic_partitioner_spark.operators.dedup import near_dup_minhash

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="signature length"):
        near_dup_minhash(df, "doc_id", "text", k=16, bands=8,
                         rows_per_band=4)


def test_duplicated_spans_detects_planted_span_only(spark):
    """A k-token run shared by two docs is found with the right counts;
    sub-threshold overlaps (k-1 tokens) and single-doc repeats are not;
    docs shorter than k never produce spans."""
    from dynamic_partitioner_spark.operators.dedup import duplicated_spans

    shared = "the quick brown fox jumps"              # k=5 planted span
    rows = [
        (1, f"alpha beta {shared} gamma"),
        (2, f"{shared} delta epsilon"),
        (3, "the quick brown fox sits zeta eta"),     # only 4 shared
        (4, "tiny doc"),                              # < k tokens
        (5, "solo solo solo solo solo solo solo"),    # 1-doc repeats
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.span: (r.n_docs, r.n_occurrences, r.first_doc, r.rnk)
           for r in duplicated_spans(df, "doc_id", "text", k=5).collect()}
    assert got == {shared: (2, 2, 1, 1)}

    # case/whitespace normalization folds variants onto one span
    df2 = spark.createDataFrame(
        [(1, "The  Quick\tBrown fox JUMPS x"), (2, f"{shared} y")],
        "doc_id long, text string")
    got2 = {r.span for r in
            duplicated_spans(df2, "doc_id", "text", k=5).collect()}
    assert got2 == {shared}

    import pytest
    with pytest.raises(ValueError, match="k must be"):
        duplicated_spans(df, "doc_id", "text", k=1)


def test_span_novelty_scores_copies_and_excludes_short_docs(spark):
    """A doc fully copied from another scores novelty 0, an unrelated
    doc scores 1, a part-copy lands in between with exact counts;
    sub-k docs are excluded (0/0 is undefined, not 1.0)."""
    from dynamic_partitioner_spark.operators.dedup import span_novelty

    shared = "a b c d e f"                     # 6 tokens, k=3 → 4 spans
    rows = [
        (1, shared),                           # copied verbatim by 2
        (2, shared),
        (3, "p q r s t u"),                    # fully novel
        (4, f"{shared} z"),                    # 5 spans, 4 shared
        (5, "x y"),                            # < k tokens → excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_spans, r.n_shared, r.novelty)
           for r in span_novelty(df, "doc_id", "text", k=3).collect()}
    assert got[1] == (4, 4, 0.0) and got[2] == (4, 4, 0.0)
    assert got[3] == (4, 0, 1.0)
    assert got[4] == (5, 4, 0.2)
    assert 5 not in got


def test_embedding_lsh_null_ids_dup_ids_and_dim_probe(spark):
    """r13 review triplet for embedding_near_dup_lsh: NULL ids are
    dropped (they crashed the in-bucket object-array pairing), two
    ROWS sharing an id never emit a (x,x) self-pair, and dim=None
    derives the corpus dimension."""
    import dynamic_partitioner_spark.operators.dedup as DD

    v = [1.0, 0.0, 0.0, 0.0]
    df = spark.createDataFrame(
        [("a", v), ("a", v), (None, v), ("b", v)],
        "id string, vec array<double>")
    out = DD.embedding_near_dup_lsh(df, "id", "vec", threshold=0.9,
                                    dim=None, n_planes=2)
    got = {(r.id_a, r.id_b) for r in out.collect()}
    assert got == {("a", "b")}          # no (a,a), no None pairs


def test_embedding_lsh_wrong_dim_fails_loudly(spark):
    """r13 review: a wrong dim NULL-buckets every vector — previously
    a silently empty result, indistinguishable from 'no duplicates'."""
    import pytest

    import dynamic_partitioner_spark.operators.dedup as DD

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [1.0, 0.0])],
        "id string, vec array<double>")
    with pytest.raises(ValueError, match="dim=64"):
        DD.embedding_near_dup_lsh(df, "id", "vec")  # default dim=64
    # dim=None derives and works
    assert DD.embedding_near_dup_lsh(
        df, "id", "vec", dim=None, n_planes=2).count() == 1


def test_embedding_lsh_all_null_vectors_empty_on_both_paths(spark):
    """r13 advice: a non-empty corpus whose vectors are ALL NULL raised
    ValueError on the explicit-dim path but returned the empty typed
    pair frame on the dim=None path.  Both paths return the empty
    frame now — the ValueError is reserved for the actual wrong-dim
    case where non-null vectors exist with a different size."""
    import dynamic_partitioner_spark.operators.dedup as DD

    df = spark.createDataFrame(
        [("a", None), ("b", None)], "id string, vec array<double>")
    explicit = DD.embedding_near_dup_lsh(df, "id", "vec", dim=4,
                                         n_planes=2)
    derived = DD.embedding_near_dup_lsh(df, "id", "vec", dim=None,
                                        n_planes=2)
    assert explicit.count() == 0 and derived.count() == 0
    assert explicit.columns == derived.columns == \
        ["id_a", "id_b", "cos_sim"]


def test_dedup_clusters_zero_max_iter_raises_cleanly(spark):
    """r13 review: max_iter=0 read the unbound loop variable and
    raised NameError instead of the non-convergence diagnostic."""
    import pytest

    import dynamic_partitioner_spark.operators.dedup as DD

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="no round ran"):
        DD.dedup_clusters(pairs, max_iter=0, driver_threshold=0)


def test_semantic_dedup_warns_on_unsplittable_hot_block(spark):
    """r13 review: the docstring promises the cap warning NAMES the
    dropped blocks — an anti-join alone cut recall silently.  An
    identical-vector pile-up cannot be split by sign-LSH, so it must
    warn."""
    import warnings as W

    import dynamic_partitioner_spark.operators.dedup as DD

    n = 12
    df = spark.createDataFrame(
        [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(n)],
        "id long, vec array<double>")
    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        out = DD.semantic_dedup(df, "id", "vec", n_lists=1,
                                max_cluster_size=4, sub_tables=1)
        out.count()
    msgs = [str(c.message) for c in caught
            if issubclass(c.category, RuntimeWarning)]
    assert any("still exceed max_cluster_size" in m for m in msgs), msgs


def test_r15_null_key_and_jaccard_hardening(spark):
    """r15 module-review pins.

    (1) jaccard: NULL array on either side yields NULL — under a
    non-ANSI session size(NULL) is -1, which previously scored two
    NULL-text docs -1/-1 = 1.0 (a PERFECT duplicate) and deleted all
    but one downstream.  (2) near_dup_minhash: two NULL-text docs
    report NO pair under either ANSI setting.  (3) exact_dedup:
    NULL-key rows pass through undeduped instead of collapsing to
    one survivor.  (4) winnow_fingerprints excludes NULL ids (the
    _span_relation rule)."""
    import dynamic_partitioner_spark.operators.dedup as DD

    prev = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for ansi in ("false", "true"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            arrs = spark.createDataFrame(
                [(1, ["a"], None), (2, None, None)],
                "id long, xs array<string>, ys array<string>")
            got = arrs.select(
                DD.jaccard(F.col("xs"), F.col("ys")).alias("j"),
                DD.jaccard(F.col("ys"), F.col("ys")).alias("jj"),
                DD.jaccard(F.col("xs"), F.col("xs")).alias("s")).collect()
            assert all(r.j is None and r.jj is None for r in got), ansi
            assert {r.s for r in got} == {1.0, None}
            docs = spark.createDataFrame(
                [(1, None), (2, None),
                 (3, "the quick brown fox jumps over the lazy dog ok"),
                 (4, "the quick brown fox jumps over the lazy dog ok")],
                "doc_id long, text string")
            pairs = DD.near_dup_minhash(docs, "doc_id", "text",
                                        threshold=0.5, persist=False)
            assert {(r.id_a, r.id_b) for r in pairs.collect()} \
                == {(3, 4)}, ansi
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

    dup = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, None), (4, None), (5, None)],
        "doc_id long, text string")
    got = DD.exact_dedup(dup, ["text"], "doc_id").collect()
    assert {(r.text, r.doc_id, r.dup_count) for r in got} \
        == {("x", 1, 2), (None, 3, 1), (None, 4, 1), (None, 5, 1)}

    wdocs = spark.createDataFrame(
        [(None, "a b c d e f g h"), (7, "a b c d e f g h")],
        "doc_id long, text string")
    fps = DD.winnow_fingerprints(wdocs, "doc_id", "text", k=3, w=2)
    ids = {r.doc_id for r in fps.collect()}
    assert ids == {7}


def test_r15_loud_validation_and_column_preservation(spark):
    """r15 module-review pins: semantic_dedup rejects a wrong explicit
    dim instead of silently dropping every hot-cluster member;
    lsh_candidate_pairs validates bands*rows_per_band against the
    signature length at the public entry point; incremental_dedup
    preserves a caller's own _fp column instead of clobbering it."""
    import pytest as _pytest

    import dynamic_partitioner_spark.operators.dedup as DD

    n = 12
    emb = spark.createDataFrame(
        [(i, [1.0 * (i % 3), 1.0, 0.0, 0.0]) for i in range(n)],
        "id long, vec array<double>")
    with _pytest.raises(ValueError, match="vector width"):
        DD.semantic_dedup(emb, "id", "vec", n_lists=1,
                          max_cluster_size=2, dim=64).count()

    sigs = spark.createDataFrame(
        [(1, list(range(8))), (2, list(range(8)))],
        "doc_id long, sig array<long>")
    # in-plan assert (zero extra jobs): raises at execution, not call
    with _pytest.raises(Exception, match="signature length"):
        DD.lsh_candidate_pairs(sigs, "doc_id", bands=8,
                               rows_per_band=4).collect()

    new = spark.createDataFrame(
        [(1, "a", "keepme"), (2, "a", "keepme2"), (3, "b", "keepme3")],
        "doc_id long, text string, _fp string")
    seen = spark.createDataFrame([("b",)], "fingerprint string")
    out = DD.incremental_dedup(new, seen, F.col("text"), "doc_id")
    assert "_fp" in out.columns
    assert {(r.doc_id, r._fp) for r in out.collect()} == {(1, "keepme")}


def test_exact_dedup_key_column_named_solo(spark):
    """A key column literally named _solo must survive: the helper
    grouping name bumps past the collision instead of drop() removing
    both (r15 ADVICE)."""
    from dynamic_partitioner_spark.operators.dedup import exact_dedup

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), (None, 3)], "_solo string, id long")
    got = exact_dedup(df, ["_solo"], "id")
    assert set(got.columns) == {"_solo", "id", "dup_count"}
    rows = {(r._solo, r.id, r.dup_count) for r in got.collect()}
    assert rows == {("a", 1, 2), (None, 3, 1)}


def test_shingle_pair_fold_is_spread_by_explicit_repartition(spark):
    """r16 plan pin: the shingle self-join's stream side must carry the
    explicit-count hash repartition on the join key (REPARTITION_BY_NUM
    — exempt from AQE coalescing).  Without it the whole m²/2 pair
    fold ran on the source scan's 1-2 partitions (r16 measured the
    pair family 5-17× slower from exactly that); a refactor that
    silently loses the spread fails here first."""
    from dynamic_partitioner_spark.operators.dedup import (
        ngram_jaccard_pairs)

    df = spark.createDataFrame(
        [(i, "a b c d e f", "x") for i in range(6)],
        "doc_id long, text string, lang string").coalesce(1)
    out = ngram_jaccard_pairs(df, "doc_id", "text", "lang", threshold=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    n = spark.sparkContext.defaultParallelism
    assert f"s#" in plan and f", {n}), REPARTITION_BY_NUM" in plan


def test_simhash_pair_fold_is_spread(spark):
    """r16 plan pin: simhash_pairs round-robin-repartitions the stream
    side of its block self-join (the block key has too few distinct
    values for a hash spread) so the per-block m²/2 hamming fold runs
    cluster-wide."""
    from dynamic_partitioner_spark.operators.dedup import simhash_pairs

    df = spark.createDataFrame(
        [(i, "the quick brown fox jumps", "en") for i in range(5)],
        "doc_id long, text string, lang string").coalesce(1)
    out = simhash_pairs(df, "doc_id", "text", "lang", max_hamming=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert out.count() == 10               # identical texts: C(5,2)


def test_embedding_near_dup_fold_is_spread(spark):
    """r16 plan pin: embedding_near_dup round-robins the stream side
    of its block self-join (_spread_stream) in BOTH scoring modes so
    the per-pair cosine fold runs cluster-wide."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup)

    df = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0], "x") for i in range(4)],
        "vec_id long, embedding array<double>, label string").coalesce(1)
    for batched in (False, True):
        out = embedding_near_dup(df, "vec_id", "embedding", "label",
                                 threshold=0.5, batched=batched)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "REPARTITION_BY_NUM" in plan, f"batched={batched}"
        assert out.count() == 6            # identical vectors: C(4,2)


def test_spread_if_narrow_is_noop_on_wide_inputs(spark):
    """r16 review guard: the explicit-count spread fires only when the
    relation is planned NARROWER than defaultParallelism — on an
    already-wide input it must be a no-op (no extra shuffle, no fixed
    width cap, AQE skew handling preserved at scale)."""
    from dynamic_partitioner_spark.functions.partitioning import (
        spread_if_narrow)

    n = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(8)], "k long") \
        .coalesce(1)
    assert "REPARTITION_BY_NUM" in spread_if_narrow(narrow, "k") \
        ._jdf.queryExecution().executedPlan().toString()
    wide = spark.createDataFrame([(i,) for i in range(8)], "k long") \
        .repartition(n + 1)
    plan = spread_if_narrow(wide, "k")._jdf.queryExecution() \
        .executedPlan().toString()
    # the only repartition is the test's own n+1 ROUND-ROBIN — no
    # spread hash exchange was added on top (the AQE plan string
    # repeats each node in its Initial Plan section, so count node
    # kinds, not occurrences)
    assert "hashpartitioning" not in plan


def test_spread_if_narrow_probe_relation_decides(spark):
    """r17 (r16 ADVICE): ``probe=`` lets a caller hand the width probe
    an exchange-free stand-in (a checkpointed upstream) so the probe
    never materializes broadcast/aggregate subtrees of the spread
    target.  The PROBE's planned width decides; the TARGET is what
    gets repartitioned."""
    from dynamic_partitioner_spark.functions.partitioning import (
        spread_if_narrow)

    n = spark.sparkContext.defaultParallelism
    narrow = spark.createDataFrame([(i,) for i in range(8)], "k long") \
        .coalesce(1)
    wide = spark.createDataFrame([(i,) for i in range(8)], "k long") \
        .repartition(n + 1)
    # wide probe -> no-op even though the target is narrow
    plan = spread_if_narrow(narrow, "k", probe=wide) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" not in plan
    # narrow probe -> spread fires on the target
    plan = spread_if_narrow(narrow, "k", probe=narrow.coalesce(1)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan


def test_spread_operators_run_no_jobs_at_construction(spark):
    """r16 ADVICE (medium): probing ``.rdd`` through a plan that holds
    an exchange materializes its query stages — the hot-key aggregate
    of the capped pair operators ran as REAL jobs at operator-
    construction time (and then again at action time).  The spread now
    sits before the anti-join / probes a checkpointed upstream, so
    constructing the lazy relation must submit zero Spark jobs."""
    from dynamic_partitioner_spark.operators.dedup import (
        ngram_jaccard_pairs)
    from dynamic_partitioner_spark.operators.linkage import fuzzy_pairs

    def n_jobs():
        return len(spark.sparkContext.statusTracker()
                   .getJobIdsForGroup(None) or [])

    docs = spark.createDataFrame(
        [(i, "a b c d e f g", "en") for i in range(20)],
        "doc_id long, text string, lang string").coalesce(1)
    before = n_jobs()
    ngram_jaccard_pairs(docs, "doc_id", "text", "lang",
                        threshold=0.1, max_shingle_df=50)
    assert n_jobs() == before, "ngram construction submitted jobs"

    names = spark.createDataFrame(
        [(i, f"name{i % 9:03d}") for i in range(30)],
        "id long, s string").coalesce(1)
    before = n_jobs()
    fuzzy_pairs(names, "id", "s", max_dist=1, max_key_df=50)
    assert n_jobs() == before, "fuzzy construction submitted jobs"


def test_lsh_candidate_fold_is_shuffle_spread(spark):
    """r16 VERDICT #6 pin: lsh_candidate_pairs needs no explicit-width
    spread because its band self-join plans as a SortMergeJoin whose
    (band_idx, band_hash) exchanges spread the pair fold cluster-wide
    by construction — even on a 1-partition input.  A regression to a
    broadcast join streaming the 1-2 cached partitions would put the
    m²/2 fold back on one core; catch it here instead of re-litigating
    (r17 re-adjudicated with a paired A/B: adding a spread changes
    nothing while this shape holds)."""
    from dynamic_partitioner_spark.operators.dedup import (
        lsh_candidate_pairs)

    sigs = spark.createDataFrame(
        [(i, [float((i * j) % 97) for j in range(32)])
         for i in range(60)],
        "doc_id long, sig array<double>").coalesce(1)
    rel = lsh_candidate_pairs(sigs, "doc_id", "sig",
                              bands=8, rows_per_band=4)
    plan = rel._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, \
        "band self-join degraded to a broadcast/nested-loop strategy"
    assert "hashpartitioning(band_idx" in plan, \
        "pair fold no longer exchanges on the band key"


def test_spread_stream_build_side_is_forced(spark):
    """r16 ADVICE: the round-robin spread of the pair self-joins only
    helps while side 'a' STREAMS — with two identical-size broadcast
    candidates that was a planner tie-break.  Side 'b' now carries an
    explicit broadcast hint, so the plan must build RIGHT regardless
    of stats."""
    from dynamic_partitioner_spark.operators.dedup import (
        embedding_near_dup, simhash_pairs)

    df = spark.createDataFrame(
        [(i, "the quick brown fox", "en") for i in range(5)],
        "doc_id long, text string, lang string").coalesce(1)
    plan = simhash_pairs(df, "doc_id", "text", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BuildRight" in plan and "BuildLeft" not in plan

    emb = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0], "x") for i in range(4)],
        "vec_id long, embedding array<double>, label string").coalesce(1)
    for batched in (False, True):
        plan = embedding_near_dup(emb, "vec_id", "embedding", "label",
                                  threshold=0.5, batched=batched) \
            ._jdf.queryExecution().executedPlan().toString()
        assert "BuildRight" in plan and "BuildLeft" not in plan, \
            f"batched={batched}"
