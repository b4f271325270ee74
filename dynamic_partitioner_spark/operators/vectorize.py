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

from pyspark.sql import Column, DataFrame
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


def hashed_vector(df: DataFrame, id_col: str, text_col: str,
                  dim: int = 64) -> DataFrame:
    """Dense form: (id, vec array<double> of length ``dim``) — the
    shape the embedding operators (:mod:`..functions.vectors`,
    :mod:`.similarity`, :mod:`.dedup`) consume.  Built from the sparse
    counts via map lookup over a fixed-length sequence, all JVM-side."""
    sparse = hashed_counts(df, id_col, text_col, dim)
    as_map = (sparse.groupBy(id_col)
              .agg(F.map_from_entries(
                   F.collect_list(F.struct("slot", "cnt"))).alias("m")))
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.col("m")[i.cast("bigint")], F.lit(0))
        .cast("double"))
    return as_map.select(id_col, dense.alias("vec"))
