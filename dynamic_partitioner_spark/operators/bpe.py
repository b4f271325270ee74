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

import pandas as pd
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


def _merge_loop(vocab: list, n_merges: int,
                with_mass: bool = False) -> list:
    """Standard BPE merge loop over a word-frequency dict.  Pure
    Python, deterministic: the best pair maximizes count and breaks
    ties lexicographically.  With ``with_mass`` each tuple carries a
    sixth element: the total weighted symbol count (sum of
    count x symbols-per-word) AFTER that merge applied — the
    conservation quantity the certified caller audits."""
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
        row = (rank, a, b, a + b, top_n)
        if with_mass:
            row += (sum(n * len(s) for s, n in words.items()),)
        merges.append(row)
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


def learn_bpe_certified(df: DataFrame, text_col: str, n_merges: int = 20,
                        max_vocab: int = 50_000) -> DataFrame:
    """:func:`learn_bpe_merges` in the certification shape: exact
    columns where SQL can replay them, hard combinatorial invariants
    as booleans everywhere else (the r6 sketch pattern).

    Per rank: ``left1/right1/merged1/count1`` carry the FIRST merge
    only (NULL elsewhere) — rank 1 is a pure function of the
    word-frequency relation (weighted adjacent-pair argmax, ties on
    the lexicographically least pair), so an independent SQL twin can
    recompute it exactly.  The iterative tail is pinned by invariants
    that hold for EVERY valid BPE run:

    - ``count_nonincreasing`` — the winning pair count never rises:
      merging (a,b) only deletes occurrences of existing pairs, and
      each new pair (x,ab)/(ab,y)/(ab,ab) occurrence maps 1:1 onto a
      deleted (x,a)/(b,y)/(b,a) occurrence, so every round-r+1 count
      is <= round r's maximum.
    - ``merged_is_concat`` — merged symbol == left || right.
    - ``merged_outside_base`` — the merged string is never a base
      symbol: merges concatenate two non-empty symbols (length >= 2,
      base symbols are single characters) and cannot spell EOW (its
      characters are not in any base alphabet word).  NOTE this is
      deliberately NOT "not an earlier merge's output": two distinct
      merges CAN produce the same string — (a,bc) and (ab,c) both
      yield "abc" — so vocab-grows-by-one is not a theorem and
      asserting it would flip the hash red on a correct engine for
      some corpus (r9 review); pair-level uniqueness is the theorem,
      and ``pairs_distinct`` asserts it.
    - ``mass_drop_in_bounds`` — with mass = sum(count x symbols) over
      the word table, each merge drops mass by the number of APPLIED
      merges: at least 1, at most the counted pair frequency (greedy
      application skips overlapping occurrences of doubled symbols,
      so applied <= counted).  Round 1 checks against the initial
      mass computed independently from the word lengths.
    - ``pairs_distinct`` — no (left, right) pair ever wins twice (its
      adjacencies are all fused and merges never split symbols).

    The full merge SEQUENCE stays pinned in tests/test_bpe.py against
    a hand-checked fixture.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    spark = df.sparkSession
    vocab = _word_counts(df, text_col, max_vocab)
    initial_mass = sum(n * (len(w) + 1) for w, n in vocab)
    base = {EOW} | {ch for w, _ in vocab for ch in w}
    merges = _merge_loop(vocab, n_merges, with_mass=True)
    # Build-time guards (r9 review): both conditions are CORPUS
    # properties, not engine bugs — a corpus whose text can spell the
    # EOW sentinel (e.g. literal '</w>' in HTML-ish docs) would flip
    # merged_outside_base false on a CORRECT engine, and a corpus
    # yielding < n_merges merges would return fewer rows than the
    # oracle's unconditional generate_series(1, n_merges).  Fail
    # loudly here (pytest / driver err) rather than as a hash flake.
    if len(merges) < n_merges:
        raise ValueError(
            f"corpus exhausted after {len(merges)} merges; the "
            f"certified relation requires exactly {n_merges} — "
            "lower n_merges or use a larger corpus")
    for _, left, right, m, _, _ in merges:
        if m in base:
            raise ValueError(
                f"merge ({left!r},{right!r}) spells base symbol "
                f"{m!r} (EOW constructible from this corpus's "
                "alphabet) — merged_outside_base is not certifiable; "
                "change the EOW sentinel for this corpus")
    pairs_distinct = (len({(l, r) for _, l, r, _, _, _ in merges})
                      == len(merges))
    rows, prev_count, prev_mass = [], None, initial_mass
    for rank, left, right, m, c, mass in merges:
        rows.append((
            rank,
            left if rank == 1 else None,
            right if rank == 1 else None,
            m if rank == 1 else None,
            c if rank == 1 else None,
            prev_count is None or c <= prev_count,
            m == left + right,
            m not in base,
            0 < prev_mass - mass <= c,
            pairs_distinct,
        ))
        prev_count, prev_mass = c, mass
    return spark.createDataFrame(
        rows,
        "rank long, left1 string, right1 string, merged1 string, "
        "count1 long, count_nonincreasing boolean, "
        "merged_is_concat boolean, merged_outside_base boolean, "
        "mass_drop_in_bounds boolean, pairs_distinct boolean")


def encode_bpe(df: DataFrame, id_col: str, text_col: str,
               merges: list[tuple[str, str]]) -> DataFrame:
    """APPLY a learned merge table — the other half of tokenizer
    training (:func:`learn_bpe_merges` fits, this encodes), i.e. what
    a training pipeline actually runs over the full 100 TB corpus
    once the vocab is frozen.

    Per word: split to characters + EOW, then apply each merge in
    RANK ORDER with the same greedy non-overlapping left-to-right
    scan the trainer uses — so a corpus encoded with its own learned
    merges reproduces the trainer's final word table exactly.  The
    merge table is tiny (it rides into the Arrow workers as a closure
    — the broadcast-vocab pattern); encoding is one map-only pass,
    no shuffle, and words are memoized per batch (Zipf repetition
    makes the per-distinct-word cost the real unit, not per-token).

    Returns ``(id_col, tokens array<string>, n_tokens long)``.
    """
    ranked = list(merges)

    @F.pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def word_syms(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                syms = list(w) + [EOW]
                for a, b in ranked:
                    out, i = [], 0
                    while i < len(syms):
                        if (i + 1 < len(syms) and syms[i] == a
                                and syms[i + 1] == b):
                            out.append(a + b)
                            i += 2
                        else:
                            out.append(syms[i])
                            i += 1
                    syms = out
                got = cache[w] = syms
            return got

        import re as _re
        # the same word boundary as _word_counts' tokens(): trim +
        # lower + split on [ \t\n\r]+ — NOT str.split()/str.strip(),
        # whose wider Unicode whitespace classes (\x0b, \x0c, \x85,
        # \xa0, ...) would silently disagree with the trainer (and
        # the SQL twin) on exotic-whitespace corpora (r10 review:
        # Spark's trim removes only spaces; the regex class governs)
        split = _re.compile(r"[ \t\n\r]+").split
        out = []
        for t in texts:
            if t is None:
                out.append(None)
                continue
            toks: list[str] = []
            for w in split(t.strip(" \t\n\r").lower()):
                if w:
                    toks.extend(word_syms(w))
            out.append(toks)
        return pd.Series(out)

    return (df.select(F.col(id_col), enc(F.col(text_col)).alias("tokens"))
            .withColumn("n_tokens", F.size("tokens").cast("long")))
