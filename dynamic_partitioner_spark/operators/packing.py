"""Token-budget sequence packing (north-star extension surface).

Training pipelines pack documents into fixed-token-budget sequences to
avoid padding waste.  Packing is inherently sequential, so the Spark
shape is: **shard deterministically, pack within each shard** — one
``applyInPandas`` group per shard, each running a linear next-fit pass
over its documents.  Shards are independent ⇒ the packing parallelizes
to the shard count while staying byte-reproducible (shard assignment is
a pure hash of the doc id; within-shard order is sorted doc id).

Packing quality: next-fit over hash-ordered docs wastes at most one
document's worth of slack per bin versus first-fit-decreasing, but
needs no global sort and no cross-shard coordination — the right trade
at 100 TB, where a global FFD would serialize on a full sort and a
single packer.  Not SQL-expressible (running sum with reset is
iterative), so the driver key hash-checks the SQL-expressible
coverage/budget invariants (r8) with the layout pinned
in pytest.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution needs it
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = ("shard long, seq_idx long, doc_id long, n_tokens long")


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 64, overlap: int = 16) -> DataFrame:
    """Split documents into overlapping fixed-token-window chunks — the
    standard pre-tokenization step for context-window-bounded training
    and for RAG indexing.

    Each doc yields chunks starting at token offsets 0, stride, 2·stride
    … (``< n_tokens − overlap``, so a final start whose tokens are all
    inside the previous chunk's overlap zone is never emitted — a
    50-token doc at the 64/16 defaults is ONE chunk, not a full chunk
    plus a contained 2-token echo) where ``stride = chunk_tokens −
    overlap``; the last chunk may be short.  Empty tokens are filtered
    (NULL/empty/whitespace-only documents yield no chunks).  Returns
    ``(id_col, chunk_idx, chunk_text, n_tokens)``.

    Pure Column plan: one ``split`` + ``sequence``/``posexplode`` —
    stays in codegen, no Python, no shuffle at all (chunking is
    per-row; downstream writes repartition as needed).  Explode factor
    ≈ n_tokens/stride per doc, linear in input size.
    """
    if chunk_tokens <= 0:
        raise ValueError("chunk_tokens must be positive")
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("overlap must be in [0, chunk_tokens)")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))),
                "[ \\t\\n\\r]+"),
        lambda x: F.length(x) > 0)
    base = df.select(F.col(id_col), toks.alias("_toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_toks") - (overlap + 1), F.lit(0)),
        F.lit(stride))
    return (base
            .select(id_col, "_toks",
                    F.posexplode(starts).alias("chunk_idx", "_start"))
            .select(F.col(id_col), F.col("chunk_idx").cast("long"),
                    F.array_join(
                        F.slice("_toks", F.col("_start") + 1, chunk_tokens),
                        " ").alias("chunk_text"),
                    F.least(F.lit(chunk_tokens),
                            F.size("_toks") - F.col("_start"))
                    .cast("long").alias("n_tokens"))
            .where(F.col("n_tokens") > 0))


def pack_sequences(df: DataFrame, id_col: str, tokens_col: str,
                   budget: int, n_shards: int = 64) -> DataFrame:
    """Assign each doc to a (shard, seq_idx) bin with ≤ ``budget``
    total tokens per bin (a doc longer than the budget gets a bin of
    its own).  Returns (shard, seq_idx, doc_id, n_tokens); every input
    doc appears exactly once.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values("_id").reset_index(drop=True)
        seqs = []
        seq, acc, n_in = 0, 0, 0
        for tok in pdf["_tok"]:
            # NULL token counts arrive as NaN (long-with-nulls →
            # float64); both NaN and negatives would silently break the
            # ≤ budget invariant — fail loudly at the boundary
            if tok != tok or tok < 0:
                raise ValueError(
                    f"invalid token count {tok!r}: n_tokens must be a "
                    "non-negative integer")
            tok = int(tok)
            # bin-open test is DOC count, not token count: a zero-token
            # doc opening a bin must not let a following over-budget
            # doc share it (the over-budget exemption is single-doc
            # bins ONLY — the oracle-asserted bin_ok invariant)
            if n_in > 0 and acc + tok > budget:
                seq += 1
                acc, n_in = 0, 0
            seqs.append(seq)
            acc += tok
            n_in += 1
        return pd.DataFrame({"shard": shard, "seq_idx": seqs,
                             "doc_id": pdf["_id"], "n_tokens": pdf["_tok"]})

    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(tokens_col).cast("long").alias("_tok"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("_shard"))
    return base.groupBy("_shard").applyInPandas(pack, PACK_SCHEMA)


def dedup_chunks(df: DataFrame, id_col: str, text_col: str,
                 chunk_tokens: int = 64) -> DataFrame:
    """Corpus-wide chunk-level exact dedup: split every document into
    non-overlapping ``chunk_tokens`` windows and keep ONE copy of each
    distinct chunk text — the (doc, position)-lexicographic first.
    Catches boilerplate repeated across documents (headers, footers,
    license blocks) that document-level dedup can't see.

    One codegen explode + one hash-agg shuffle keyed on the chunk text;
    ``min(struct(doc, pos))`` picks the representative inside the same
    aggregate, so there is no second pass and no window sort.  At
    corpus scale, hash the chunk text first (`xxhash64`) if chunk
    strings are long enough to dominate shuffle volume.
    """
    ch = chunk_documents(df, id_col, text_col, chunk_tokens, overlap=0)
    rep = F.min(F.struct(id_col, "chunk_idx")).alias("s")
    return (ch.groupBy("chunk_text").agg(rep)
            .select(F.col(f"s.{id_col}").alias(id_col),
                    F.col("s.chunk_idx").alias("chunk_idx"),
                    "chunk_text"))


def scrub_dup_chunks(df: DataFrame, id_col: str, text_col: str,
                     chunk_tokens: int = 32) -> DataFrame:
    """C4-style duplicate-span SCRUBBING: split each document into
    non-overlapping ``chunk_tokens`` windows, keep only each distinct
    chunk's first corpus occurrence (ordered by (doc, position)), and
    reassemble every document from its surviving chunks — the step
    that actually removes cross-document boilerplate from the text
    instead of just reporting it (:func:`dedup_chunks`).

    Returns ``(id, n_kept_chunks, clean_text)``; documents whose every
    chunk was a later duplicate produce no row (they scrub to empty).
    Shape: one explode + one window rank on the chunk text (the same
    single wide shuffle any corpus-global dedup needs) + one per-doc
    ordered reassembly agg.  Text is whitespace/case-normalized by the
    chunker, as in :func:`chunk_documents`.
    """
    from pyspark.sql import Window

    ch = chunk_documents(df, id_col, text_col, chunk_tokens, overlap=0)
    w = Window.partitionBy("chunk_text").orderBy(id_col, "chunk_idx")
    kept = (ch.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1))
    order = F.array_sort(F.collect_list(
        F.struct(F.col("chunk_idx"), F.col("chunk_text"))))
    return (kept.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_kept_chunks"),
                 F.array_join(
                     F.transform(order, lambda s: s.getField("chunk_text")),
                     " ").alias("clean_text")))
