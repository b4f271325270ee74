"""Byte-pair-encoding merge learning — distributed word counting, the
classic bounded-vocab merge loop on the driver (Sennrich et al. 2016,
arXiv:1508.07909).

Tokenizer training at corpus scale decomposes exactly this way: the
100 TB part is ONE distributed word-frequency aggregate (the corpus is
never touched again); the merge loop then runs over the bounded
word-frequency table, which is capped to ``max_vocab`` entries — driver
state is O(vocab), independent of corpus size.  This is the same split
every production BPE trainer makes; shipping the merge loop to
executors would serialize it anyway (each merge depends on the last).

No counterpart in the reference (a partitioned-sink plugin); public
algorithm, cited above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: end-of-word marker, kept printable and outside the corpus alphabet
EOW = "</w>"


def _word_counts(df: DataFrame, text_col: str, max_vocab: int) -> list:
    """Distributed word-frequency table, capped to the ``max_vocab``
    most frequent words (ties break on the word so the cap is
    deterministic).  The ONLY corpus-wide pass."""
    from .dedup import tokens
    counts = (df.select(F.explode(tokens(F.col(text_col))).alias("w"))
              .where(F.length("w") > 0)
              .groupBy("w").agg(F.count(F.lit(1)).alias("n"))
              .orderBy(F.desc("n"), F.asc("w"))
              .limit(max_vocab))
    return [(r.w, r.n) for r in counts.collect()]


def _merge_loop(vocab: list, n_merges: int) -> list:
    """Standard BPE merge loop over a word-frequency dict.  Pure
    Python, deterministic: the best pair maximizes count and breaks
    ties lexicographically."""
    words = {tuple(w) + (EOW,): n for w, n in vocab}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict = {}
        for syms, n in words.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # winner: max count, ties on the lexicographically least pair
        top_n = max(pairs.values())
        best_pair = min(p for p, n in pairs.items() if n == top_n)
        merges.append((rank, best_pair[0], best_pair[1],
                       best_pair[0] + best_pair[1], top_n))
        merged = {}
        a, b = best_pair
        for syms, n in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            merged[key] = merged.get(key, 0) + n
        words = merged
    return merges


def learn_bpe_merges(df: DataFrame, text_col: str, n_merges: int = 20,
                     max_vocab: int = 50_000) -> DataFrame:
    """Learn the first ``n_merges`` BPE merges from a text corpus.

    Returns ``(rank, left, right, merged, pair_count)`` — ``rank`` is
    the merge order, ``pair_count`` the weighted adjacent-pair count
    that won that round.  Deterministic at every step: word counting
    caps by (count desc, word), each round's winner breaks count ties
    on the lexicographically least pair.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    vocab = _word_counts(df, text_col, max_vocab)
    merges = _merge_loop(vocab, n_merges)
    if not merges:
        return spark.createDataFrame(
            [], "rank long, left string, right string, merged string, "
                "pair_count long")
    return spark.createDataFrame(
        merges, "rank long, left string, right string, merged string, "
                "pair_count long")
