"""Corpus bigram language model + perplexity-style document scoring.

The classic data-quality signal an LLM training pipeline computes at
scale: fit an n-gram LM on the corpus itself, score every document's
average token log-likelihood, and gate the tail (boilerplate and
gibberish both score far from the body of the distribution).  Public
technique (add-one-smoothed bigram LM — Jurafsky & Martin ch. 3);
re-expressed here as pure DataFrame aggregates and joins.

Determinism across engines: a per-document SUM of ``ln`` doubles is
accumulation-order-dependent, so each bigram's log-probability is first
quantized to integer micro-nats (``floor(ln(p)·1e6)``) — BIGINT sums
are exact and order-free, and the final division back to a double is a
single identical IEEE op in Spark and DuckDB (same trick as the
integer-sum moments in ``multimodal._byte_features``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..functions.checkpoint import checkpoint_df


def _tokens(text_col: str):
    # the ONE canonical whitespace tokenization (dedup.tokens) — keep a
    # single definition so a future tokenizer change can't silently
    # diverge between the LM, dedup, and vectorizer paths
    from .dedup import tokens
    return tokens(F.col(text_col))


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) with multiplicity — ``zip_with`` over the token
    array against itself shifted by one (empty for docs with < 2
    tokens), one explode, no shuffle."""
    toks = _tokens(text_col)
    n = F.size(toks)
    pairs = F.zip_with(F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                       lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return (df.select(F.col(id_col).alias("_id"),
                      F.explode(pairs).alias("bg"))
            .select("_id", F.col("bg.w1").alias("w1"),
                    F.col("bg.w2").alias("w2")))


def add_one_micro_model(bg: DataFrame, vocab: DataFrame) -> DataFrame:
    """Add-one-smoothed bigram model ``(w1, w2, lp_micro)`` from a
    ``(w1, w2)`` pair relation and a 1-row vocab-size aggregate ``v``
    — the ONE quantized-model construction shared by the token-LM and
    the event-sequence-LM paths (module docstring for the micro-nat
    rationale)."""
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    ctx = bgc.groupBy("w1").agg(F.sum("c_bg").alias("c_ctx"))
    lp = F.floor(F.log((F.col("c_bg") + F.lit(1.0))
                       / (F.col("c_ctx") + F.col("v")))
                 * F.lit(1_000_000.0)).cast("long")
    return (bgc.join(ctx, "w1").crossJoin(F.broadcast(vocab))
            .select("w1", "w2", lp.alias("lp_micro")))


def bigram_lm_score(df: DataFrame, id_col: str, text_col: str,
                    eager: bool = True) -> DataFrame:
    """Score every document by its average add-one-smoothed bigram log
    probability under the corpus's own bigram LM:
    ``P(w2|w1) = (C(w1,w2) + 1) / (C(w1,·) + V)``.

    Returns ``(id, n_bigrams, lm_score)`` — higher (less negative) is
    more "typical" text; documents with fewer than two tokens have no
    bigrams and are absent (gate them on length first).

    Shape: ONE bigram explode feeds everything — the bigram-count and
    context-count relations re-aggregate it (vocabulary-sized after the
    hash aggs), then the doc bigrams join the model on the bigram key
    (the one corpus-sized shuffle; Catalyst broadcasts the model side
    when it fits).  V (distinct token count) and the per-bigram
    quantized log-prob are described in the module docstring.

    The exploded bigram relation is cached while the model and the
    scores are built from it.  With ``eager=True`` (default) the small
    per-document result is materialized via ``localCheckpoint`` and the
    cache is released before returning — a long-lived session does not
    accumulate executor storage across calls (ADVICE r2).  Pass
    ``eager=False`` to keep the plan lazy; the caller then owns
    releasing the cache (``spark.catalog.clearCache()`` or unpersist).
    """
    bgs = doc_bigrams(df, id_col, text_col).cache()
    vocab = (df.select(F.explode(_tokens(text_col)).alias("t"))
             .where(F.length("t") > 0)
             .agg(F.countDistinct("t").alias("v")))
    model = add_one_micro_model(bgs.select("w1", "w2"), vocab)
    scored = bgs.join(model, ["w1", "w2"])
    from ..functions.vectors import round4
    out = (scored.groupBy(F.col("_id").alias(id_col))
           .agg(F.count(F.lit(1)).alias("n_bigrams"),
                F.sum("lp_micro").alias("_s"))
           .select(id_col, "n_bigrams",
                   round4(F.col("_s")
                          / (F.col("n_bigrams") * F.lit(1_000_000.0)))
                   .alias("lm_score")))
    if eager:
        # one row per document — small; lineage truncation lets the
        # bigram cache go away immediately
        out = checkpoint_df(out)
        bgs.unpersist()
    return out


def sequence_lm_score(df: DataFrame, key_col: str, order_cols: list[str],
                      state_col: str) -> DataFrame:
    """Behavioral-sequence anomaly scoring: fit the corpus's own
    add-one-smoothed state-transition model, then score every key by
    its mean transition log-likelihood — the sequence twin of
    :func:`bigram_lm_score` (bots and broken instrumentation both
    produce transition streams the population model finds
    improbable).

    Returns ``(key, n_steps, seq_score)``; keys with fewer than two
    events have no transitions and are absent.  One window shuffle
    builds the per-key transition stream; the model re-aggregates it
    (states² rows) and broadcasts back; per-key sums are exact integer
    micro-nats (module docstring), so the score is order-free and
    engine-exact.
    """
    from .relational import state_transitions

    # the shared transition construction; cached — it feeds BOTH the
    # model fit and the scoring join (the bigram path caches the same
    # shared relation for the same reason)
    bg = (state_transitions(df, key_col, order_cols, state_col)
          .select("_k", F.col("from_state").alias("w1"),
                  F.col("to_state").alias("w2"))
          .cache())
    vocab = (df.select(F.col(state_col).alias("t"))
             .where(F.col("t").isNotNull())
             .agg(F.countDistinct("t").alias("v")))
    model = add_one_micro_model(bg.select("w1", "w2"), vocab)
    from ..functions.vectors import round4
    out = (bg.join(F.broadcast(model), ["w1", "w2"])
           .groupBy(F.col("_k").alias(key_col))
           .agg(F.count(F.lit(1)).alias("n_steps"),
                F.sum("lp_micro").alias("_s"))
           .select(key_col, "n_steps",
                   round4(F.col("_s")
                          / (F.col("n_steps").cast("double")
                             * F.lit(1_000_000.0)))
                   .alias("seq_score")))
    out = checkpoint_df(out)
    bg.unpersist()
    return out
