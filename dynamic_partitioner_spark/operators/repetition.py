"""Gopher-style n-gram repetition signals per document.

The reference has no equivalent (it is a partitioned-sink plugin suite,
SURVEY.md §2); this extends the corpus-quality family (SURVEY §2.9) with
the repeated-n-gram measures from Rae et al., *Scaling Language Models:
Methods, Analysis & Insights from Training Gopher* (arXiv 2112.11446,
appendix A1.1), the standard pre-training repetition filter alongside
the C4 heuristics already in :mod:`..functions.text`:

* ``top_{2,3}gram_char_frac`` — fraction of document characters covered
  by occurrences of the single most frequent word 2-/3-gram (characters
  counted on the normalized space-joined gram, denominator is the raw
  text length; ties broken toward the lexicographically largest gram so
  both engines agree).
* ``dup_5gram_frac`` — fraction of word-5-gram *occurrences* whose gram
  appears more than once in the document.  (Gopher counts covered
  characters with an overlap mask; the occurrence fraction is the same
  signal without the sequential mask, which keeps the operator a pure
  two-level aggregate and the DuckDB oracle exact.)

Scale shape: the signals are strictly per-document, so the default
path (:func:`repetition_signals`) is a single zero-shuffle scan with
one Arrow-batched ``pandas_udf`` computing all three signals per text —
embarrassingly parallel, no exploded-gram shuffle at all.  The pure
Column-expression form (:func:`repetition_signals_exprs` — explode the
tagged grams, two aggregate shuffles, left join back) is kept as the
engine-side twin of the DuckDB oracle and pinned bit-identical to the
Arrow path by ``tests/test_text.py``; the HOF-heavy gram construction
it uses is interpreted (outside codegen), which measured ~4× slower
than the Arrow pass on the same corpus.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import ROUND4_SQL, round4
from .dedup import ngrams_all

TOP_NS = (2, 3)
DUP_N = 5


def repetition_signals(df: DataFrame, id_col: str,
                       text_col: str) -> DataFrame:
    """Per-document repetition signals ``(id, top_2gram_char_frac,
    top_3gram_char_frac, dup_5gram_frac)``.

    Arrow-batched map-only pass; bit-identical to
    :func:`repetition_signals_exprs` (tokenization mirrors
    ``dedup.tokens``: lower → trim spaces → split on ``[ \\t\\n\\r]+``
    keeping empty edge tokens; ties toward the lexicographically
    largest gram — Python tuple ``max`` compares count then code-point
    string order, which equals Spark's binary struct comparison because
    UTF-8 byte order preserves code-point order; rounding is the
    cross-engine ``floor(x*1e4+0.5)/1e4``).
    """
    import re

    import numpy as np

    ws = re.compile(r"[ \t\n\r]+")

    def _round4(x: float) -> float:
        return float(np.floor(x * 10000.0 + 0.5) / 10000.0)

    def _one(text: str) -> tuple[float, float, float]:
        if text is None:
            return (0.0, 0.0, 0.0)
        n_chars = len(text)
        toks = ws.split(text.lower().strip(" "))
        out = []
        for n in TOP_NS:
            if len(toks) < n or n_chars == 0:
                out.append(0.0)
                continue
            counts = Counter(
                " ".join(toks[i:i + n]) for i in range(len(toks) - n + 1))
            cnt, gram = max((c, g) for g, c in counts.items())
            out.append(_round4(cnt * len(gram) / n_chars))
        if len(toks) < DUP_N:
            out.append(0.0)
        else:
            counts = Counter(
                tuple(toks[i:i + DUP_N])
                for i in range(len(toks) - DUP_N + 1))
            total = sum(counts.values())
            dup = sum(c for c in counts.values() if c > 1)
            out.append(_round4(dup / total) if total else 0.0)
        return tuple(out)

    @F.pandas_udf("top2 double, top3 double, dup5 double")
    def _signals(s: pd.Series) -> pd.DataFrame:
        rows = [_one(t) for t in s]
        return pd.DataFrame(rows, columns=["top2", "top3", "dup5"])

    sig = _signals(F.col(text_col))
    return df.select(
        F.col(id_col),
        sig.getField("top2").alias("top_2gram_char_frac"),
        sig.getField("top3").alias("top_3gram_char_frac"),
        sig.getField("dup5").alias("dup_5gram_frac"))


def repetition_signals_exprs(df: DataFrame, id_col: str,
                             text_col: str) -> DataFrame:
    """Pure Column-expression twin of :func:`repetition_signals`
    (exploded grams + two aggregate shuffles); slower, kept for oracle
    parity."""
    text = F.col(text_col)

    def _tag(n: int):
        # single-parameter lambda: a two-parameter `lambda g, n=n` would
        # be picked up by transform() as its (element, index) binary
        # form, tagging grams with their array position instead of n
        return lambda g: F.struct(F.lit(n).alias("n"), g.alias("gram"))

    tagged = F.concat(*[F.transform(ngrams_all(text, n), _tag(n))
                        for n in (*TOP_NS, DUP_N)])
    ex = df.select(F.col(id_col).alias("_id"),
                   F.length(text).alias("n_chars"),
                   F.explode(tagged).alias("g"))
    counts = (ex.groupBy("_id", "n_chars",
                         F.col("g.n").alias("n"),
                         F.col("g.gram").alias("gram"))
              .agg(F.count(F.lit(1)).alias("cnt")))

    def _top(n: int) -> Column:
        # max over (cnt, gram) structs = argmax by count, ties toward
        # the larger gram — the same comparison DuckDB's struct max does
        return F.max(F.when(F.col("n") == n,
                            F.struct(F.col("cnt").alias("cnt"),
                                     F.col("gram").alias("gram"))))

    per = counts.groupBy("_id", "n_chars").agg(
        _top(2).alias("t2"), _top(3).alias("t3"),
        F.sum(F.when((F.col("n") == DUP_N) & (F.col("cnt") > 1),
                     F.col("cnt"))).alias("d5"),
        F.sum(F.when(F.col("n") == DUP_N, F.col("cnt"))).alias("n5"))

    def _char_frac(t: Column) -> Column:
        covered = (t.getField("cnt")
                   * F.length(t.getField("gram"))).cast("double")
        return round4(F.try_divide(covered, F.col("n_chars")))

    sig = per.select(
        "_id",
        _char_frac(F.col("t2")).alias("top_2gram_char_frac"),
        _char_frac(F.col("t3")).alias("top_3gram_char_frac"),
        round4(F.try_divide(F.col("d5").cast("double"), F.col("n5")))
        .alias("dup_5gram_frac"))
    ids = df.select(F.col(id_col).alias("_id"))
    return (ids.join(sig, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    *[F.coalesce(c, F.lit(0.0)).alias(c)
                      for c in ("top_2gram_char_frac",
                                "top_3gram_char_frac",
                                "dup_5gram_frac")]))


def repetition_signals_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of :func:`repetition_signals` (driver oracle)."""
    toks = (f"string_split_regex(trim(lower({text_col})), "
            "'[ \\t\\n\\r]+')")

    def _grams(n: int) -> str:
        return (f"SELECT {id_col}, n_chars, {n} AS n, "
                f"array_to_string(list_slice(t, i, i + {n - 1}), ' ') "
                "AS gram "
                f"FROM (SELECT {id_col}, len({text_col}) AS n_chars, "
                f"{toks} AS t, "
                f"unnest(range(1, greatest(len({toks}) - {n - 2}, 1))) "
                f"AS i FROM {table})")

    grams = " UNION ALL ".join(_grams(n) for n in (*TOP_NS, DUP_N))
    struct = "{'cnt': cnt, 'gram': gram}"
    t2 = ROUND4_SQL.format(
        x="CAST(t2.cnt * len(t2.gram) AS DOUBLE) / per.n_chars")
    t3 = ROUND4_SQL.format(
        x="CAST(t3.cnt * len(t3.gram) AS DOUBLE) / per.n_chars")
    d5 = ROUND4_SQL.format(x="CAST(d5 AS DOUBLE) / n5")
    return f"""
        WITH g AS ({grams}),
        c AS (SELECT {id_col}, n_chars, n, gram, count(*) AS cnt
              FROM g GROUP BY ALL),
        per AS (SELECT {id_col}, n_chars,
                       max(CASE WHEN n = 2 THEN {struct} END) AS t2,
                       max(CASE WHEN n = 3 THEN {struct} END) AS t3,
                       sum(CASE WHEN n = {DUP_N} AND cnt > 1
                                THEN cnt END) AS d5,
                       sum(CASE WHEN n = {DUP_N} THEN cnt END) AS n5
                FROM c GROUP BY {id_col}, n_chars)
        SELECT d.{id_col},
               coalesce({t2}, 0.0) AS top_2gram_char_frac,
               coalesce({t3}, 0.0) AS top_3gram_char_frac,
               coalesce({d5}, 0.0) AS dup_5gram_frac
        FROM {table} d LEFT JOIN per USING ({id_col})
    """


def char_entropy(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document character-level Shannon entropy (nats) — the
    standard gibberish/binary-noise screen next to the C4/Gopher
    signals (natural text sits ~2.5-3.5 nats; base64/random bytes
    higher, single-char spam near 0).

    Exactness: each character's term ``p·ln(p)`` is quantized to an
    integer micro-nat (``floor(x·1e6)``, the :mod:`..operators.lm`
    trick), so the per-document sum is an exact BIGINT — aggregation-
    order-free and engine-exact.  ``split(text, '')`` yields identical
    character arrays in Spark and DuckDB (verified incl. the
    empty-string edge, which both engines split to one empty token —
    filtered, so empty docs surface with entropy 0 via the left join).

    Shape: one explode + two hash aggregates (char grain → doc grain)
    + a join back to the id list; all JVM expressions.
    """
    t = F.col(text_col)
    ex = (df.select(F.col(id_col).alias("_id"),
                    F.length(t).alias("_n"),
                    F.explode(F.split(t, "")).alias("_ch"))
          .where(F.length("_ch") > 0))
    counts = (ex.groupBy("_id", "_n", "_ch")
              .agg(F.count(F.lit(1)).alias("_c")))
    p = F.col("_c").cast("double") / F.col("_n").cast("double")
    term = F.floor(p * F.log(p) * F.lit(1_000_000.0)).cast("long")
    per = (counts.select("_id", term.alias("_t"))
           .groupBy("_id").agg(F.sum("_t").alias("_s")))
    ent = round4(-(F.col("_s").cast("double")) / 1_000_000.0)
    ids = df.select(F.col(id_col).alias("_id"))
    return (ids.join(per, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce(ent, F.lit(0.0)).alias("char_entropy_nats")))
