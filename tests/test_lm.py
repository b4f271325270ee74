"""Bigram LM scoring vs a plain-Python reference model."""

from __future__ import annotations

import math
from collections import Counter

from dynamic_partitioner_spark.operators.lm import (
    bigram_lm_score,
    doc_bigrams,
)

DOCS = [(1, "the cat sat on the mat"),
        (2, "the cat sat"),
        (3, "dog"),                      # single token: no bigrams
        (4, "zz qq zz qq zz")]


def _reference():
    toks = {i: t.split() for i, t in DOCS}
    bgs = {i: list(zip(ts, ts[1:])) for i, ts in toks.items()}
    bgc = Counter(b for bs in bgs.values() for b in bs)
    ctx = Counter()
    for (w1, _), c in bgc.items():
        ctx[w1] += c
    vocab = len({w for ts in toks.values() for w in ts})
    out = {}
    for i, bs in bgs.items():
        if not bs:
            continue
        lp = [math.floor(math.log((bgc[b] + 1.0) / (ctx[b[0]] + vocab))
                         * 1e6) for b in bs]
        score = sum(lp) / (len(bs) * 1e6)
        out[i] = (len(bs), math.floor(score * 1e4 + 0.5) / 1e4)
    return out


def test_doc_bigrams_multiplicity_and_short_docs(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [(r._id, r.w1, r.w2) for r in doc_bigrams(df, "doc_id", "text")
           .collect()]
    assert (4, "zz", "qq") in got
    assert sum(1 for g in got if g == (4, "zz", "qq")) == 2   # multiplicity
    assert not any(g[0] == 3 for g in got)                    # no bigrams
    assert sum(1 for g in got if g[0] == 1) == 5


def test_bigram_lm_score_matches_reference(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r.doc_id: (r.n_bigrams, r.lm_score) for r in
           bigram_lm_score(df, "doc_id", "text").collect()}
    assert got == _reference()
    # repeated in-corpus phrasing scores higher than the rare tail
    assert got[2][1] > got[4][1] or got[2][1] > got[1][1]


def test_bigram_lm_score_orders_typicality(spark):
    # a doc repeating the corpus's dominant pattern outscores gibberish
    rows = [(i, "alpha beta gamma delta") for i in range(20)]
    rows.append((100, "alpha beta gamma delta"))
    rows.append((200, "qq zz pp ww"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.lm_score for r in
           bigram_lm_score(df, "doc_id", "text").collect()}
    assert got[100] > got[200]


def test_sequence_lm_score_flags_rare_transitions(spark):
    from dynamic_partitioner_spark.operators.lm import sequence_lm_score
    # users 1..3 walk a>b>a>b...; user 9 walks a>z (rare transition)
    rows = []
    for u in (1, 2, 3):
        for i, s in enumerate(["a", "b", "a", "b"]):
            rows.append((u, i, s))
    rows += [(9, 0, "a"), (9, 1, "z")]
    df = spark.createDataFrame(rows, "u long, seq long, st string")
    out = {r.u: r for r in
           sequence_lm_score(df, "u", ["seq"], "st").collect()}
    assert out[1].n_steps == 3 and out[9].n_steps == 1
    # the common-pattern walkers all score identically and higher
    # (less negative) than the rare-transition user
    assert out[1].seq_score == out[2].seq_score == out[3].seq_score
    assert out[9].seq_score < out[1].seq_score
