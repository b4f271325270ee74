"""Feature-hashing vectorizer: dense/sparse agreement and the
text → vector → embedding-operator bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.vectorize import (
    hashed_counts,
    hashed_vector,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


def test_dense_matches_sparse(spark):
    docs = spark.read.parquet(DOCS).limit(50)
    dim = 32
    sparse = {(r.doc_id, r.slot): r.cnt
              for r in hashed_counts(docs, "doc_id", "text", dim).collect()}
    for r in hashed_vector(docs, "doc_id", "text", dim).collect():
        assert len(r.vec) == dim
        for slot, v in enumerate(r.vec):
            assert v == float(sparse.get((r.doc_id, slot), 0)), (r.doc_id, slot)


def test_vector_norm_positive_and_deterministic(spark):
    docs = spark.read.parquet(DOCS).limit(20)
    a = {r.doc_id: r.vec for r in
         hashed_vector(docs, "doc_id", "text").collect()}
    b = {r.doc_id: r.vec for r in
         hashed_vector(docs, "doc_id", "text").collect()}
    assert a == b
    assert all(sum(v) > 0 for v in a.values())


def test_text_to_vector_to_near_dup_pipeline(spark):
    """The bridge: vectorize text with the hashing trick, then run the
    EMBEDDING near-dup operator on the result — identical docs hit
    cosine 1.0, unrelated docs don't pair."""
    from dynamic_partitioner_spark.operators.dedup import embedding_near_dup

    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "entirely different words about unrelated topics here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vec = hashed_vector(df, "doc_id", "text", dim=32) \
        .withColumn("blk", F.lit("all"))
    pairs = {(r.id_a, r.id_b): r.cos_sim
             for r in embedding_near_dup(vec, "doc_id", "vec", "blk",
                                         threshold=0.9).collect()}
    assert pairs.get((1, 2)) == 1.0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_build_vocab_ids_by_df_rank(spark):
    from dynamic_partitioner_spark.operators.vectorize import build_vocab

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "banana")],
        "doc_id long, text string")
    got = {(r.token, r.df, r.token_id)
           for r in build_vocab(docs, "text").collect()}
    # banana in 3 docs -> id 0; apple/cherry 1 doc each -> lexical tie-break
    assert got == {("banana", 3, 0), ("apple", 1, 1), ("cherry", 1, 2)}


def test_build_vocab_min_df_and_max_size(spark):
    from dynamic_partitioner_spark.operators.vectorize import build_vocab

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "a b")], "doc_id long, text string")
    assert {r.token for r in
            build_vocab(docs, "text", min_df=2).collect()} == {"a", "b"}
    assert {r.token for r in
            build_vocab(docs, "text", max_size=1).collect()} == {"a"}


def test_encode_tokens_order_and_oov(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        build_vocab, encode_tokens)

    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a z")], "doc_id long, text string")
    vocab = build_vocab(docs, "text", min_df=2)      # only 'a' survives
    rows = {r.doc_id: r for r in
            encode_tokens(docs, "doc_id", "text", vocab).collect()}
    assert rows[1].token_ids == [0, -1, 0]           # order preserved
    assert (rows[1].n_tokens, rows[1].n_oov) == (3, 1)
    assert rows[2].token_ids == [0, -1]
    assert (rows[2].n_tokens, rows[2].n_oov) == (2, 1)


def test_tfidf_terms_math_and_min_tf(spark):
    import math
    from dynamic_partitioner_spark.operators.vectorize import tfidf_terms

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "apple cherry cherry"),
         (3, "banana banana banana")], "doc_id long, text string")
    out = {(r.doc_id, r.term): r for r in
           tfidf_terms(docs, "doc_id", "text", min_tf=2).collect()}
    # hapax pairs dropped: (1, banana), (2, apple) have tf=1
    assert set(out) == {(1, "apple"), (2, "cherry"), (3, "banana")}
    r = out[(1, "apple")]
    assert (r.tf, r.df) == (2, 2)             # df counts docs, not tokens
    expected = math.floor(2 * math.log(1.0 + 3 / 2) * 10000 + 0.5) / 10000
    assert r.tfidf == expected
    assert out[(3, "banana")].df == 2         # banana in docs 1 and 3


def test_cooccurrence_pairs_window2_exact(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        cooccurrence_pairs)
    df = spark.createDataFrame([("a b c",), ("b a",), ("x",), ("",)],
                               "text string")
    got = {(r.w1, r.w2): r.n_cooc for r in
           cooccurrence_pairs(df, "text", window=2, top=10).collect()}
    # doc1 pairs: (a,b) (b,c) gap1, (a,c) gap2; doc2: (a,b); doc3/4 none
    assert got == {("a", "b"): 2, ("b", "c"): 1, ("a", "c"): 1}


def test_cooccurrence_pairs_rank_ties_lexicographic(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        cooccurrence_pairs)
    df = spark.createDataFrame([("z y",), ("c d",)], "text string")
    rows = cooccurrence_pairs(df, "text", window=1, top=1).collect()
    assert len(rows) == 1 and (rows[0].w1, rows[0].w2) == ("c", "d")


def test_cooccurrence_property_matches_bruteforce(spark):
    """Property: for random small corpora, pair counts equal the
    brute-force windowed enumeration."""
    from collections import Counter

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamic_partitioner_spark.operators.vectorize import (
        cooccurrence_pairs)

    @settings(max_examples=8, deadline=None)
    @given(st.lists(st.lists(st.sampled_from("ab cd ef g".split()),
                             min_size=0, max_size=6),
                    min_size=1, max_size=5),
           st.integers(1, 3))
    def prop(docs, window):
        rows = [(" ".join(toks),) for toks in docs]
        df = spark.createDataFrame(rows, "text string")
        got = {(r.w1, r.w2): r.n_cooc for r in
               cooccurrence_pairs(df, "text", window=window,
                                  top=1000).collect()}
        want: Counter = Counter()
        for toks in docs:
            for i in range(len(toks)):
                for g in range(1, window + 1):
                    if i + g < len(toks):
                        a, b = sorted((toks[i], toks[i + g]))
                        want[(a, b)] += 1
        assert got == dict(want)

    prop()


def test_bm25_ranks_exact_hand_computation(spark):
    import math

    from dynamic_partitioner_spark.operators.vectorize import bm25_topk
    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x z z"), (2, "z z z")],
        "doc_id long, text string")
    out = {r.doc_id: r.bm25 for r in
           bm25_topk(docs, "doc_id", "text", ["x"], top=10).collect()}
    # df(x)=2, N=3, dl=3 for all, avgdl=3
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def score(tf):
        return idf * (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 1.0))
    assert set(out) == {0, 1}          # doc 2 has no 'x'
    assert abs(out[0] - math.floor(score(2) * 1e6 + 0.5) / 1e6) < 1e-9
    assert abs(out[1] - math.floor(score(1) * 1e6 + 0.5) / 1e6) < 1e-9
    assert out[0] > out[1]


def test_bm25_rejects_empty_terms(spark):
    import pytest

    from dynamic_partitioner_spark.operators.vectorize import bm25_topk
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(docs, "doc_id", "text", [])


def test_bm25_retrieve_per_query_topk_and_qtf(spark):
    import math

    from dynamic_partitioner_spark.operators.vectorize import (
        bm25_retrieve, bm25_topk)
    docs = spark.createDataFrame(
        [(0, "x x y"), (1, "x z z"), (2, "z z z")],
        "doc_id long, text string")
    queries = spark.createDataFrame(
        [(10, "x"), (11, "z z"), (12, "missing")],
        "query_id long, qtext string")
    rows = bm25_retrieve(docs, "doc_id", "text", queries,
                         "query_id", "qtext", top=10).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, {})[r.doc_id] = (r.rank, r.bm25)
    # query 10 ('x') must equal the single-bag scorer exactly
    solo = {r.doc_id: (r.rank, r.bm25) for r in
            bm25_topk(docs, "doc_id", "text", ["x"], top=10).collect()}
    assert by_q[10] == solo
    # query 11 ('z z'): qtf=2 doubles every quantized partial
    idf_z = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))
    def part_z(tf):
        return math.floor(idf_z * (tf * 2.2)
                          / (tf + 1.2 * (1.0 - 0.75 + 0.75 * 1.0))
                          * 1e6 + 0.5)
    assert by_q[11][2] == (1, 2 * part_z(3) / 1e6)
    assert by_q[11][1] == (2, 2 * part_z(2) / 1e6)
    assert 0 not in by_q[11]
    # a query with no corpus hits returns no rows, not an error
    assert 12 not in by_q


def test_rake_hand_computed_scores(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        rake_keywords)
    docs = spark.createDataFrame(
        [(0, "red apple and green apple"), (1, "red apple")],
        "doc_id long, text string")
    out = {r.phrase: (r.rank, r.n_occurrences, r.rake_score)
           for r in rake_keywords(docs, "text",
                                  stopwords=["and"], top=10).collect()}
    # phrases: 'red apple' x2, 'green apple' x1
    # freq: red 2, apple 3, green 1; deg: red 4, apple 6, green 2
    # scores: red 2.0, apple 2.0, green 2.0
    # 'red apple' = 4.0, 'green apple' = 4.0 — tie breaks on phrase
    assert out["green apple"] == (1, 1, 4.0)
    assert out["red apple"] == (2, 2, 4.0)


def test_rake_punctuation_delimits_and_metachar_stopwords_literal(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        rake_keywords)
    # punctuation is a phrase boundary (Rose et al. §1.2.1): the period
    # must NOT glue 'green apple. red apple' into one candidate, and
    # trailing commas must not mint a distinct word 'apple,'
    docs = spark.createDataFrame(
        [(0, "green apple. red apple, and red apple")],
        "doc_id long, text string")
    out = {r.phrase: r.n_occurrences
           for r in rake_keywords(docs, "text",
                                  stopwords=["and"], top=10).collect()}
    assert out == {"green apple": 1, "red apple": 2}
    # regex-metachar stopwords match literally, not as syntax: an
    # unescaped '(' would be a Java-regex group error / silent misparse
    docs2 = spark.createDataFrame(
        [(0, "alpha beta gamma beta")], "doc_id long, text string")
    out2 = {r.phrase for r in rake_keywords(
        docs2, "text", stopwords=["beta", "x(y"], top=10).collect()}
    assert out2 == {"alpha", "gamma"}
    # \n / \t are WORD whitespace, not phrase boundaries: a line wrap
    # inside 'machine\nlearning' must not split the candidate
    docs3 = spark.createDataFrame(
        [(0, "machine\nlearning\tand machine learning")],
        "doc_id long, text string")
    out3 = {r.phrase: r.n_occurrences for r in rake_keywords(
        docs3, "text", stopwords=["and"], top=10).collect()}
    assert out3 == {"machine learning": 2}


def test_rake_max_words_discards_long_candidates(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        rake_keywords)
    # the 5-word run is DISCARDED before scoring (not truncated): its
    # words must not contribute to freq/degree of surviving phrases
    docs = spark.createDataFrame(
        [(0, "red apple and one two three four five and red apple")],
        "doc_id long, text string")
    out = {r.phrase: (r.n_occurrences, r.rake_score)
           for r in rake_keywords(docs, "text", stopwords=["and"],
                                  top=10, max_words=4).collect()}
    # freq: red 2, apple 2; deg: red 4, apple 4 → scores 2.0 each
    assert out == {"red apple": (2, 4.0)}


def test_rake_rejects_empty_stopword_set(spark):
    import pytest

    from dynamic_partitioner_spark.operators.vectorize import (
        rake_keywords)
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stopword"):
        rake_keywords(docs, "text", stopwords=[])


def test_phrase_collocations_known_corpus(spark):
    """Hand-checked score: 'new york' ×6 in doc 0, plus filler docs
    that bring 'new'/'york' to 12 occurrences each and the corpus to
    N=60 tokens — score = (6−5)·60/(12·12) = 0.4167."""
    from dynamic_partitioner_spark.operators.vectorize import (
        phrase_collocations)

    rows = [(0, "new york " * 6)]
    rows += [(1, "new a b c " * 6), (2, "york d e f " * 6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = phrase_collocations(df, "doc_id", "text",
                              delta=5, min_count=5, top=20).collect()
    got = {(r.w1, r.w2): (r.c12, r.c1, r.c2, r.score, r.rnk)
           for r in out}
    # 'new york': bigram 6× inside doc 0 ('york new' appears only 5×,
    # which still clears min_count but scores 0 after the discount);
    # unigrams: new/york 6+6 = 12 each; N = 24 + 6·3 + 6·3 = 60
    assert ("new", "york") in got
    c12, c1, c2, score, _ = got[("new", "york")]
    assert (c12, c1, c2) == (6, 12, 12)
    assert abs(score - (6 - 5) * 60.0 / 144.0) < 1e-4
    # filler bigrams ('a b' etc.): (6−5)·60/36, round4 → 1.6667 —
    # outscore the target pair (they're rarer words), ranked first
    assert got[("a", "b")][3] == 1.6667 and got[("a", "b")][4] == 1


def test_phrase_collocations_rejects_negative_discount(spark):
    from dynamic_partitioner_spark.operators.vectorize import (
        phrase_collocations)
    import pytest

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        phrase_collocations(df, "doc_id", "text", delta=5, min_count=2)


def test_bm25_topk_plans_take_ordered_not_global_window(spark):
    """r14 plan pin: Spark's LimitPushDownThroughWindow rewrites the
    rank<=top filter over bm25_topk's unpartitioned row_number window
    into TakeOrderedAndProject (per-partition heads), so the
    single-partition window never sees more than top rows — this pins
    that rewrite so an optimizer or query-shape change that silently
    loses it (pulling every matching document into one partition)
    fails here first."""
    from dynamic_partitioner_spark.operators.vectorize import bm25_topk

    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(50)], "doc_id long, text string")
    out = bm25_topk(docs, "doc_id", "text", ["x"], top=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    got = [r.doc_id for r in out.collect()]
    assert got == [0, 1, 2, 3, 4]      # equal scores -> id tie-break
