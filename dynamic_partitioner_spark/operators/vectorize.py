"""Feature-hashing text vectorizer (north-star extension surface).

The hashing trick: token → ``hash(token) mod dim`` → count per slot.
No vocabulary pass, no fitted state — the property that matters at
100 TB (a CountVectorizer needs a full vocabulary shuffle + broadcast;
the hashing trick is one narrow map + one aggregate).  Output vectors
feed this engine's embedding operators directly (cosine near-dup, ANN,
top-k), giving a text → vector → similarity pipeline with no external
model.

The slot index uses the same md5-based 60-bit hash as
``operators/sampling`` (Spark ``conv`` ≡ DuckDB ``'0x'`` cast), so the
sparse form is exactly SQL-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _slot(token: Column, dim: int) -> Column:
    h = F.conv(F.substring(F.md5(token), 1, 15), 16, 10).cast("bigint")
    return F.pmod(h, F.lit(dim))


def hashed_counts(df: DataFrame, id_col: str, text_col: str,
                  dim: int = 64) -> DataFrame:
    """Sparse form: (id, slot, cnt) — explode tokens, one hash-agg
    shuffle on (id, slot).  Zero slots are absent (sparse)."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), "[ \\t\\n\\r]+")
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(toks).alias("t"))
    return (ex.where(F.length("t") > 0)
            .groupBy(F.col("_id").alias(id_col),
                     _slot(F.col("t"), dim).alias("slot"))
            .agg(F.count(F.lit(1)).alias("cnt")))


def hashed_counts_sql(key: str, text: str, dim: int,
                      from_table: str = "documents") -> str:
    """DuckDB twin of :func:`hashed_counts` (identical md5 slot hash)."""
    toks = f"string_split_regex(trim(lower({text})), '[ \\t\\n\\r]+')"
    slot = ("CAST(concat('0x', substr(md5(t), 1, 15)) AS BIGINT) "
            f"% {dim}")
    return (f"WITH tok AS (SELECT {key}, unnest({toks}) AS t "
            f"FROM {from_table}) "
            f"SELECT {key}, {slot} AS slot, count(*) AS cnt "
            f"FROM tok WHERE length(t) > 0 GROUP BY 1, 2")


def build_vocab(df: DataFrame, text_col: str, min_df: int = 1,
                max_size: int | None = None) -> DataFrame:
    """Fitted vocabulary: ``(token, df, token_id)`` with ids assigned by
    descending document frequency (ties broken lexically, so the
    mapping is deterministic across runs/engines).

    ``df`` counts DOCUMENTS containing the token (per-doc distinct),
    the conventional CountVectorizer semantics.  One explode + one
    hash-agg over the corpus; the id-assigning ``row_number`` runs on
    the AGGREGATED token relation — vocabulary-sized (≤ a few million
    rows after ``min_df``), not corpus-sized, so the single-partition
    window is a bounded post-processing step, not a corpus bottleneck.
    For web-scale type counts prefer :func:`hashed_counts`, which needs
    no fitted state at all.
    """
    from pyspark.sql import Window

    toks = F.split(F.trim(F.lower(F.col(text_col))), "[ \\t\\n\\r]+")
    per_doc = df.select(F.explode(F.array_distinct(toks)).alias("token"))
    dfreq = (per_doc.where(F.length("token") > 0)
             .groupBy("token").agg(F.count(F.lit(1)).alias("df"))
             .where(F.col("df") >= min_df))
    if max_size is not None:
        # distributed top-k (TakeOrderedAndProject) BEFORE the rank
        # window, so the single-partition id assignment only ever sees
        # max_size rows regardless of corpus vocabulary size
        dfreq = dfreq.orderBy(F.col("df").desc(), F.col("token")) \
                     .limit(max_size)
    w = Window.orderBy(F.col("df").desc(), F.col("token"))
    return dfreq.select("token", "df",
                        (F.row_number().over(w) - 1).cast("long")
                        .alias("token_id"))


def encode_tokens(df: DataFrame, id_col: str, text_col: str,
                  vocab: DataFrame, unk_id: int = -1) -> DataFrame:
    """Encode each document as its token-id sequence against a fitted
    vocabulary: ``(id, token_ids array<long>, n_tokens, n_oov)``.
    Out-of-vocabulary tokens map to ``unk_id``.  A document with no
    tokens (empty/whitespace-only/NULL text) produces no output row —
    left-join against the source ids if every document must survive.

    Shape: posexplode (order-preserving) → broadcast join against the
    vocabulary (vocab is small by construction; the corpus side never
    shuffles for the lookup) → one hash-agg per doc re-assembling the
    sequence with ``array_sort`` on the carried position.  This is the
    bridge from raw text to the integer world a tokenizer-trainer or
    packing step (:func:`~.packing.pack_sequences`) consumes.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), "[ \\t\\n\\r]+")
    ex = (df.select(F.col(id_col), F.posexplode(toks)
                    .alias("pos", "token"))
          .where(F.length("token") > 0))
    joined = (ex.join(F.broadcast(vocab.select("token", "token_id")),
                      "token", "left")
              .select(id_col, "pos",
                      F.coalesce("token_id", F.lit(unk_id))
                      .alias("tid")))
    seq = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", "tid"))),
        lambda s: s["tid"])
    return (joined.groupBy(id_col)
            .agg(seq.alias("token_ids"),
                 F.count(F.lit(1)).alias("n_tokens"),
                 F.sum(F.when(F.col("tid") == unk_id, 1).otherwise(0))
                 .cast("long").alias("n_oov")))


def tfidf_terms(df: DataFrame, id_col: str, text_col: str,
                min_tf: int = 2) -> DataFrame:
    """Per-document TF-IDF term weights: ``(id, term, tf, df,
    tfidf)`` with ``tfidf = tf · ln(1 + N/df)`` — the classic relevance
    weighting, as three hash aggregates over one explode.

    Shape: explode tokens once → per-(doc, term) count (tf) → per-term
    document frequency from the SAME aggregated relation (no second
    corpus pass — df re-aggregates the (doc, term) pairs, which are
    already term-deduped per doc) → broadcast the term-level df back
    onto the pairs.  The corpus is scanned once; every later step runs
    on aggregated, vocabulary-bounded relations.  N (corpus size) is a
    one-row aggregate broadcast into the projection.

    ``min_tf`` drops hapax pairs before the df join, thinning the
    broadcast's probe side.  The score is floor-rounded
    (``vectors.round4``) so DuckDB hashes match bit-for-bit: both
    engines compute ``ln`` on the identical double ``1 + N/df``.
    """
    from ..functions.vectors import round4
    toks = F.split(F.trim(F.lower(F.col(text_col))), "[ \\t\\n\\r]+")
    pairs = (df.select(F.col(id_col).alias("_id"),
                       F.explode(toks).alias("term"))
             .where(F.length("term") > 0)
             .groupBy("_id", "term")
             .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = pairs.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("_n"))
    return (pairs.where(F.col("tf") >= min_tf)
            .join(F.broadcast(dfreq), "term")
            .crossJoin(F.broadcast(n_docs))
            .select(F.col("_id").alias(id_col), "term", "tf", "df",
                    round4(F.col("tf")
                           * F.log(F.lit(1.0) + F.col("_n") / F.col("df")))
                    .alias("tfidf")))


def hashed_vector(df: DataFrame, id_col: str, text_col: str,
                  dim: int = 64) -> DataFrame:
    """Dense form: (id, vec array<double> of length ``dim``) — the
    shape the embedding operators (:mod:`..functions.vectors`,
    :mod:`.similarity`, :mod:`.dedup`) consume.  Built from the sparse
    counts via map lookup over a fixed-length sequence, all JVM-side.
    Token-less documents produce no row (no zero vector) — same
    survive-by-join caveat as :func:`encode_tokens`."""
    sparse = hashed_counts(df, id_col, text_col, dim)
    as_map = (sparse.groupBy(id_col)
              .agg(F.map_from_entries(
                   F.collect_list(F.struct("slot", "cnt"))).alias("m")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("bigint")], F.lit(0))
        .cast("double"))
    return as_map.select(id_col, dense.alias("vec"))


def cooccurrence_pairs(df: DataFrame, text_col: str, window: int = 2,
                       top: int = 100) -> DataFrame:
    """Windowed token co-occurrence counts (the word2vec / PMI /
    embedding-prep primitive): for every token pair within ``window``
    positions of each other, the global count; unordered pairs are
    canonicalized (lexicographic min first) and ranked, ties breaking
    on the pair strings so both engines cut identically.

    Pair generation happens entirely INSIDE the token array — for each
    gap g ≤ ``window``, ``arrays_zip`` of the array against its
    g-shifted ``slice`` — so there is no positional self-join and no
    per-token window shuffle; every step is a whole-stage-codegen
    builtin (a nested-lambda ``transform`` formulation benches ~5×
    slower because Catalyst interprets the lambda per element).  The
    only shuffle is the final pair-count hash aggregate, whose
    cardinality is the distinct-pair grid, not the corpus; the explode
    factor is exactly ``window`` pairs per token — linear in corpus
    size, never quadratic.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    from .dedup import tokens
    base = df.select(F.filter(tokens(F.col(text_col)),
                              lambda t: F.length(t) > 0).alias("_t"))
    n = F.size("_t")
    slices = []
    for g in range(1, window + 1):
        zipped = F.arrays_zip(F.slice("_t", 1, n - g).alias("a"),
                              F.slice("_t", g + 1, n - g).alias("b"))
        slices.append(base.where(n >= g + 1)
                      .select(F.explode(zipped).alias("_p")))
    ex_all = slices[0]
    for s in slices[1:]:
        ex_all = ex_all.unionByName(s)
    ex = ex_all.select(
        F.least("_p.a", "_p.b").alias("w1"),
        F.greatest("_p.a", "_p.b").alias("w2"))
    counts = ex.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n_cooc"))
    rnk = Window.orderBy(F.desc("n_cooc"), F.asc("w1"), F.asc("w2"))
    return (counts.withColumn("rnk", F.row_number().over(rnk))
            .where(F.col("rnk") <= top))


def bm25_topk(df: DataFrame, id_col: str, text_col: str,
              terms: list[str], k1: float = 1.2, b: float = 0.75,
              top: int = 20) -> DataFrame:
    """Okapi BM25 ranking of documents against a bag of query terms —
    the standard lexical retrieval scorer (Robertson & Zaragoza 2009),
    and the drop-in upgrade for the tf leg of hybrid RRF retrieval.

    Two corpus passes total: one aggregate for the global stats
    (N docs, average doc length) and one tokenize+explode for the
    (doc, term) tf relation — the doc length rides the explode as a
    grouping column (it is functionally dependent on the doc id), so
    no per-doc join ever happens; document frequencies re-aggregate
    the tf relation.  Per-term partial scores are quantized to integer
    micro-units BEFORE the per-doc sum — a float sum over the term set
    would be order-dependent and break the cross-engine hash; integer
    sums are exact in any order.  Ranking ties break on the doc id.
    """
    if not terms:
        raise ValueError("bm25_topk needs at least one query term")
    from .dedup import tokens
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    base = df.select(F.col(id_col).alias("_d"), toks.alias("_t"))
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(F.size("_t")).alias("total_len"))
    tf = (base.select("_d", F.size("_t").alias("dl"),
                      F.explode("_t").alias("term"))
          .where(F.col("term").isin(terms))
          .groupBy("_d", "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats)))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    part = (idf * (F.col("tf") * (F.lit(k1) + 1.0))
            / (F.col("tf") + F.lit(k1)
               * (F.lit(1.0) - F.lit(b)
                  + F.lit(b) * F.col("dl") / avgdl)))
    per_term = scored.select(
        "_d", F.floor(part * 1e6 + F.lit(0.5)).cast("long").alias("_su"))
    agg = per_term.groupBy("_d").agg(F.sum("_su").alias("_s"))
    # the rank<=top filter over this unpartitioned row_number window
    # is rewritten by Spark's LimitPushDownThroughWindow into
    # TakeOrderedAndProject (per-partition heads, no global sort), so
    # the single-partition window never sees more than ``top`` rows —
    # pinned in tests/test_vectorize.py so an optimizer/shape change
    # that loses the rewrite fails loudly
    rnk = Window.orderBy(F.desc("_s"), F.asc("_d"))
    return (agg.withColumn("rank", F.row_number().over(rnk))
            .where(F.col("rank") <= top)
            .select("rank", F.col("_d").alias(id_col),
                    (F.col("_s").cast("double") / 1e6).alias("bm25")))


def bm25_retrieve(df: DataFrame, id_col: str, text_col: str,
                  queries: DataFrame, qid_col: str, qtext_col: str,
                  k1: float = 1.2, b: float = 0.75,
                  top: int = 10) -> DataFrame:
    """Batch BM25 retrieval: top-``top`` documents for EVERY query in
    the ``queries`` relation — the RAG / eval-harness shape
    (:func:`bm25_topk` scores one term bag; this scores a query SET).

    Scale decomposition (two corpus passes total, like
    :func:`bm25_topk`: one for the global stats aggregate, one for
    the posting build): queries tokenize into (query, term, qtf) and
    meet the postings on an equi-join over ``term`` — never a
    query × doc cross product, so corpus cost is independent of the
    number of queries and query fan-out rides the posting lists
    exactly like a distributed inverted index.  The query side
    broadcasts (a query batch is small by definition); document
    frequencies come from a count window over the already-pruned
    posting relation, so the posting subtree is never recomputed.

    Cross-engine exactness (same discipline as :func:`bm25_topk`):
    each (query, doc, term) partial quantizes to integer micro-units
    BEFORE the integer qtf multiply and the per-(query, doc) sum, so
    the score is order-free; ranking ties break on the doc id, per
    query.
    """
    from .dedup import tokens
    toks = F.filter(tokens(F.col(text_col)), lambda t: F.length(t) > 0)
    base = df.select(F.col(id_col).alias("_d"), toks.alias("_t"))
    stats = base.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.sum(F.size("_t")).alias("total_len"))
    tf = (base.select("_d", F.size("_t").alias("dl"),
                      F.explode("_t").alias("term"))
          .groupBy("_d", "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    qtoks = F.filter(tokens(F.col(qtext_col)),
                     lambda t: F.length(t) > 0)
    qterms = (queries.select(F.col(qid_col).alias("_q"),
                             qtoks.alias("_t"))
              .select("_q", F.explode("_t").alias("term"))
              .groupBy("_q", "term")
              .agg(F.count(F.lit(1)).alias("qtf")))
    # prune postings to the query vocabulary first — df per term is
    # unchanged (all docs for those terms survive the semi-join) and
    # the full-vocab aggregate never runs.  df comes from a window
    # over the pruned postings (one row per (doc, term), so the count
    # IS the document frequency) — a separate dfreq aggregate would
    # re-execute the whole posting subtree as a second scan.
    qvocab = qterms.select("term").distinct()
    tfq = (tf.join(F.broadcast(qvocab), "term", "semi")
           .withColumn("df", F.count(F.lit(1)).over(
               Window.partitionBy("term"))))
    scored = (tfq.join(F.broadcast(qterms), "term")
              .crossJoin(F.broadcast(stats)))
    avgdl = F.col("total_len").cast("double") / F.col("n_docs")
    idf = F.log(F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    part = (idf * (F.col("tf") * (F.lit(k1) + 1.0))
            / (F.col("tf") + F.lit(k1)
               * (F.lit(1.0) - F.lit(b)
                  + F.lit(b) * F.col("dl") / avgdl)))
    per_term = scored.select(
        "_q", "_d",
        (F.floor(part * 1e6 + F.lit(0.5)).cast("long")
         * F.col("qtf")).alias("_su"))
    agg = per_term.groupBy("_q", "_d").agg(F.sum("_su").alias("_s"))
    rnk = Window.partitionBy("_q").orderBy(F.desc("_s"), F.asc("_d"))
    return (agg.withColumn("rank", F.row_number().over(rnk))
            .where(F.col("rank") <= top)
            .select(F.col("_q").alias(qid_col), "rank",
                    F.col("_d").alias(id_col),
                    (F.col("_s").cast("double") / 1e6).alias("bm25")))


def rake_keywords(df: DataFrame, text_col: str,
                  stopwords: list[str] | None = None,
                  top: int = 20,
                  max_words: int | None = None) -> DataFrame:
    """RAKE keyword extraction (Rose et al. 2010, "Automatic Keyword
    Extraction from Individual Documents"): candidate phrases are the
    maximal stopword-free word runs; each word scores
    ``degree/frequency`` (degree = summed length of every phrase
    instance containing the word — co-occurrence weight), and a
    phrase scores the sum of its words' scores.  The corpus-level
    top-``top`` phrases with occurrence counts — the cheap,
    model-free topic/keyphrase tagger for corpus triage.

    Candidates are delimited at punctuation as well as stopwords
    (Rose et al. §1.2.1): every non-``[a-z0-9 ]`` character in the
    lowered text becomes a phrase boundary, so sentence/clause
    punctuation never glues two candidates together and tokens carry
    no trailing punctuation.  (Consequence: intra-word marks like
    apostrophes and hyphens also split — ``don't`` → ``don``/``t``.)
    ``max_words`` (Rose et al.'s candidate-length refinement) DISCARDS
    candidates longer than the cap before any scoring — on corpora
    with sparse delimiters (run-on text, word soup) unbounded
    candidates degenerate to whole-document "phrases".

    Shape: one tokenize+explode pass builds the (phrase instance,
    word) relation; word stats are ONE hash aggregate over it
    (vocabulary-bounded), broadcast back onto the same relation; the
    only other shuffle is the final phrase aggregate.  Engine-exact:
    the single division quantizes as ``deg·1e6 DIV freq`` (integer
    truncation, identical in Spark ``div`` and DuckDB ``//``), so
    phrase scores are exact integer sums in any order.
    """
    import re as _re

    from ..functions.text import _STOPWORDS
    stops = stopwords if stopwords is not None else _STOPWORDS
    if not stops:
        raise ValueError("rake_keywords needs a non-empty stopword set")
    # longest-first alternation: leftmost-FIRST regex engines would
    # otherwise prefer a short stopword that then fails its \b and
    # backtrack — same result, but longest-first keeps the pattern's
    # behavior obvious and identical across engines.  re.escape each
    # word: a caller stopword like "c++" or "a.b" must match literally,
    # not as regex syntax.
    ordered = sorted(stops, key=lambda w: (-len(w), w))
    pat = r"\b(" + "|".join(_re.escape(w) for w in ordered) + r")\b"
    # \t/\n/\r are WORD whitespace, not phrase boundaries — normalize
    # them to spaces first or the punctuation class below would split
    # every candidate at a line wrap
    phrases = (df.select(
        F.posexplode(F.split(F.regexp_replace(F.regexp_replace(
            F.regexp_replace(F.trim(F.lower(F.col(text_col))),
                             r"[ \t\n\r]+", " "),
            r"[^a-z0-9 ]", "|"), pat, "|"), r"\|"))
        .alias("_p", "_phrase"))
        .select(F.trim(F.regexp_replace("_phrase", r" +", " "))
                .alias("phrase"))
        .where(F.length("phrase") > 0))
    if max_words is not None:
        phrases = phrases.where(
            F.size(F.split("phrase", " ")) <= max_words)
    phrases = (phrases
        # instance identity only: ids are consumed within this single
        # lineage (grouped straight back), never compared across runs
        .withColumn("_pid", F.monotonically_increasing_id()))
    pw = phrases.select(
        "_pid", "phrase", F.size(F.split("phrase", " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("word"))
    stats = (pw.groupBy("word")
             .agg(F.sum("plen").alias("deg"),
                  F.count(F.lit(1)).alias("freq")))
    scored = (pw.join(F.broadcast(stats), "word")
              .withColumn("wscore_u", F.expr("deg * 1000000 div freq")))
    inst = (scored.groupBy("_pid", "phrase")
            .agg(F.sum("wscore_u").alias("score_u")))
    agg = (inst.groupBy("phrase")
           .agg(F.count(F.lit(1)).alias("n_occurrences"),
                # identical phrases score identically — max == the value
                F.max("score_u").alias("score_u")))
    rnk = Window.orderBy(F.desc("score_u"), F.asc("phrase"))
    return (agg.withColumn("rank", F.row_number().over(rnk))
            .where(F.col("rank") <= top)
            .select("rank", "phrase", "n_occurrences",
                    (F.col("score_u").cast("double") / 1e6)
                    .alias("rake_score")))


def phrase_collocations(df: DataFrame, id_col: str, text_col: str,
                        delta: int = 5, min_count: int = 5,
                        top: int = 50) -> DataFrame:
    """Two-word phrase (collocation) detection by the word2vec phrase
    score (Mikolov et al. 2013, *Distributed Representations of Words
    and Phrases*, §4):
    ``score(w1, w2) = (C(w1 w2) − δ) · N / (C(w1) · C(w2))`` — the
    discounted, corpus-size-normalized PMI exponent.  δ discounts rare
    accidental pairs; ``min_count`` floors bigram support (kept ≥ δ so
    the score never goes negative).

    Exactness: every operand is an exact BIGINT count and the score is
    the fixed IEEE sequence ``double(c12 − δ) · N / c1 / c2`` the SQL
    twin evaluates identically — NO logarithms, so none of the libm
    parity exposure raw PMI would carry.  Shape: ONE bigram explode
    (``doc_bigrams``' zip_with, no shuffle) → bigram hash-agg
    (support-filtered BEFORE the unigram joins, so only candidate
    phrases shuffle); the unigram counts join on w1/w2 (Catalyst
    broadcasts the filtered side when it fits); N is Σ unigram counts
    — a 1-row re-aggregate of the vocab-sized relation, broadcast
    (the allowlisted scalar-BNLJ shape).  Top-``top`` by
    (score DESC, w1, w2) plans TakeOrderedAndProject; the rank window
    then covers ≤ ``top`` rows.

    At 100 TB: BIGINT counts are safe until N² approaches 9.2e18
    (N ~ 3e9 tokens); past that CAST the products to DECIMAL(38,0) —
    both engines' decimal division is bit-identical.
    """
    from ..functions.vectors import round4
    from .dedup import tokens
    from .lm import doc_bigrams

    if min_count < delta:
        raise ValueError(
            f"min_count={min_count} below delta={delta} would emit "
            "negative-scored pairs the discount exists to remove")
    bg = doc_bigrams(df, id_col, text_col).where(
        (F.length("w1") > 0) & (F.length("w2") > 0))
    bgc = (bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
           .where(F.col("c12") >= min_count))
    uni = (df.select(F.explode(tokens(F.col(text_col))).alias("t"))
           .where(F.length("t") > 0)
           .groupBy("t").agg(F.count(F.lit(1)).alias("c")))
    tot = uni.agg(F.sum("c").alias("n"))
    u1 = uni.select(F.col("t").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("t").alias("w2"), F.col("c").alias("c2"))
    scored = (bgc.join(u1, "w1").join(u2, "w2")
              .crossJoin(F.broadcast(tot))
              .select("w1", "w2", "c12", "c1", "c2",
                      round4((F.col("c12") - F.lit(delta)).cast("double")
                             * F.col("n") / F.col("c1") / F.col("c2"))
                      .alias("score")))
    ranked = scored.orderBy(F.col("score").desc(), "w1", "w2").limit(top)
    w = Window.orderBy(F.col("score").desc(), "w1", "w2")
    return (ranked.withColumn("rnk", F.row_number().over(w))
            .select("w1", "w2", "c12", "c1", "c2", "score", "rnk"))
