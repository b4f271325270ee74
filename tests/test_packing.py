"""Sequence-packing invariants: budget respected, every doc packed
exactly once, deterministic, shards balanced-ish."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.packing import pack_sequences


def _docs(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from dynamic_partitioner_spark.functions.text import token_count
    return docs.select("doc_id", token_count(F.col("text")).alias("n_tok"))


def test_pack_respects_budget_and_covers_all(spark):
    base = _docs(spark)
    out = pack_sequences(base, "doc_id", "n_tok", budget=256, n_shards=8)
    out.cache()
    # every doc exactly once
    assert out.count() == base.count()
    assert out.select("doc_id").distinct().count() == base.count()
    # no multi-doc bin exceeds the budget; singleton bins may (oversize doc)
    bins = (out.groupBy("shard", "seq_idx")
            .agg(F.sum("n_tokens").alias("tot"),
                 F.count(F.lit(1)).alias("n")))
    over = bins.where((F.col("tot") > 256) & (F.col("n") > 1))
    assert over.count() == 0
    # packing is non-trivial: fewer bins than docs
    assert bins.count() < base.count()


def test_pack_oversize_doc_gets_own_bin(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 999), (3, 100), (4, 100)], "doc_id long, t long")
    out = pack_sequences(df, "doc_id", "t", budget=256, n_shards=1).collect()
    by_doc = {r.doc_id: (r.shard, r.seq_idx) for r in out}
    big_bin = by_doc[2]
    assert sum(1 for r in out if (r.shard, r.seq_idx) == big_bin) == 1


def test_pack_deterministic(spark):
    base = _docs(spark)
    a = sorted(map(tuple, pack_sequences(base, "doc_id", "n_tok", 256, 8)
                   .collect()))
    b = sorted(map(tuple, pack_sequences(base, "doc_id", "n_tok", 256, 8)
                   .collect()))
    assert a == b


def test_pack_rejects_bad_budget(spark):
    import pytest
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(_docs(spark), "doc_id", "n_tok", 0)


def test_chunk_documents_windows_and_overlap(spark):
    from dynamic_partitioner_spark.operators.packing import chunk_documents

    text = " ".join(f"w{i}" for i in range(10))   # 10 tokens
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, "doc_id", "text", chunk_tokens=4,
                        overlap=2).collect(),
        key=lambda r: r.chunk_idx)
    # stride 2 -> starts 0,2,4,6 (a start-8 chunk would be tokens 8-9,
    # both already inside the start-6 chunk — contained echoes are
    # never emitted)
    assert [r.chunk_idx for r in rows] == [0, 1, 2, 3]
    assert rows[0].chunk_text == "w0 w1 w2 w3"
    assert rows[1].chunk_text == "w2 w3 w4 w5"
    assert rows[-1].chunk_text == "w6 w7 w8 w9"
    assert [r.n_tokens for r in rows] == [4, 4, 4, 4]


def test_chunk_documents_degenerate_docs(spark):
    from dynamic_partitioner_spark.operators.packing import chunk_documents

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, None), (4, "\tpadded\n")],
        "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=4,
                           overlap=2).collect()
    assert {(r.doc_id, r.chunk_text, r.n_tokens) for r in rows} == {
        (4, "padded", 1)}                    # empty/NULL docs: no chunks


def test_chunk_documents_short_doc_single_chunk(spark):
    from dynamic_partitioner_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "only three tokens")],
                               "doc_id long, text string")
    rows = chunk_documents(df, "doc_id", "text", chunk_tokens=64,
                           overlap=16).collect()
    assert len(rows) == 1
    assert rows[0].chunk_text == "only three tokens"
    assert rows[0].n_tokens == 3


def test_chunk_documents_rejects_bad_params(spark):
    import pytest

    from dynamic_partitioner_spark.operators.packing import chunk_documents

    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


def test_dedup_chunks_collapses_shared_boilerplate(spark):
    from dynamic_partitioner_spark.operators.packing import dedup_chunks

    header = " ".join(f"h{i}" for i in range(4))       # shared 4-token block
    df = spark.createDataFrame(
        [(1, header + " unique one text here"),
         (2, header + " other body entirely different")],
        "doc_id long, text string")
    out = dedup_chunks(df, "doc_id", "text", chunk_tokens=4)
    rows = {(r.doc_id, r.chunk_idx, r.chunk_text) for r in out.collect()}
    # the shared header chunk survives once, attributed to doc 1 / pos 0
    assert (1, 0, header) in rows
    assert not any(r[0] == 2 and r[1] == 0 for r in rows)
    # each doc's unique tail chunk survives
    assert any(r[0] == 1 and r[1] == 1 for r in rows)
    assert any(r[0] == 2 and r[1] == 1 for r in rows)


def test_chunk_documents_property_nonoverlap_reconstructs(spark):
    """Property: with overlap=0, concatenating a doc's chunks in
    chunk_idx order reproduces its exact token sequence, and every
    chunk except possibly the last is full."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dynamic_partitioner_spark.operators.packing import chunk_documents

    @settings(max_examples=12, deadline=None)
    @given(st.lists(st.integers(1, 30), min_size=1, max_size=6),
           st.integers(1, 9))
    def prop(doc_lens, chunk_tokens):
        rows = [(i, " ".join(f"t{i}x{j}" for j in range(n)))
                for i, n in enumerate(doc_lens)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = chunk_documents(df, "doc_id", "text",
                              chunk_tokens=chunk_tokens, overlap=0)
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        for (i, n) in enumerate(doc_lens):
            chunks = sorted(by_doc[i], key=lambda r: r.chunk_idx)
            toks = " ".join(c.chunk_text for c in chunks).split(" ")
            assert toks == rows[i][1].split(" ")
            for c in chunks[:-1]:
                assert c.n_tokens == chunk_tokens
            assert chunks[-1].n_tokens == n - chunk_tokens * (len(chunks) - 1)

    prop()


def test_scrub_dup_chunks_removes_cross_doc_spans(spark):
    """Later occurrences of a corpus-duplicate chunk are scrubbed; the
    first keeps it; unique chunks survive; all-dup docs vanish."""
    from dynamic_partitioner_spark.operators.packing import (
        scrub_dup_chunks)

    span = " ".join(f"w{i}" for i in range(4))       # one 4-token chunk
    rows = [(1, span + " unique tail here now"),
            (2, span + " other body of text x"),     # loses the span
            (3, span)]                               # scrubs to nothing
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_kept_chunks, r.clean_text) for r in
           scrub_dup_chunks(df, "doc_id", "text", chunk_tokens=4)
           .collect()}
    assert got[1] == (2, span + " unique tail here now")
    assert got[2] == (2, "other body of text x")   # 5 tokens → 2 chunks
    assert 3 not in got                              # fully scrubbed


def test_zero_token_doc_never_shares_bin_with_oversized(spark):
    from dynamic_partitioner_spark.operators.packing import pack_sequences
    # one shard: ids in hash order; a 0-token doc must not hold a bin
    # open for a following over-budget doc (bin_ok invariant)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([0, 500, 10, 0, 0, 300])],
        "doc_id long, n_tok long")
    out = pack_sequences(df, "doc_id", "n_tok", budget=256, n_shards=1)
    rows = {r.doc_id: (r.seq_idx, r.n_tokens) for r in out.collect()}
    bins = {}
    for d, (s, t) in rows.items():
        bins.setdefault(s, []).append(t)
    for toks in bins.values():
        assert sum(toks) <= 256 or len(toks) == 1
