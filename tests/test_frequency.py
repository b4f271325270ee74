"""Heavy-hitter mining (operators/frequency.py): the Misra-Gries
candidate pass must be a complete superset, and the final counts exact
— equal to the naive full groupBy regardless of partitioning."""
from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dynamic_partitioner_spark.operators.frequency import (
    _mg_merge,
    heavy_hitters,
)


def _zipf_items(n: int, seed: int = 5) -> list[str]:
    rng = random.Random(seed)
    # heavy head + long tail: item i drawn with weight 1/(i+1)
    vocab = [f"w{i}" for i in range(500)]
    weights = [1.0 / (i + 1) for i in range(500)]
    return rng.choices(vocab, weights=weights, k=n)


def test_heavy_hitters_equals_exact_groupby(spark):
    items = _zipf_items(40_000)
    df = (spark.createDataFrame([(t,) for t in items], "term string")
          .repartition(16))        # summaries must merge across partitions
    support = 0.01
    got = {(r.term, r.n) for r in
           heavy_hitters(df, "term", support).collect()}
    thresh = support * len(items)
    from collections import Counter
    exact = {(t, c) for t, c in Counter(items).items() if c >= thresh}
    assert got == exact
    assert len(exact) > 5                       # non-trivial result


def test_heavy_hitters_rejects_bad_support(spark):
    df = spark.createDataFrame([("a",)], "term string")
    for s in (0.0, 1.0, -0.5, 2.0):
        with pytest.raises(ValueError):
            heavy_hitters(df, "term", s)


def test_mg_merge_deficit_bound():
    """After any merge sequence, est >= true - n/(m+1) — the bound the
    completeness guarantee rests on."""
    from collections import Counter

    items = _zipf_items(10_000, seed=9)
    m = 20
    counters: dict = {}
    for i in range(0, len(items), 500):
        counters = _mg_merge(counters, Counter(items[i:i + 500]), m)
    assert len(counters) <= m
    true = Counter(items)
    bound = len(items) / (m + 1)
    for term, c in true.items():
        est = counters.get(term, 0)
        assert est >= c - bound
        assert est <= c                          # MG never overcounts


def test_heavy_hitters_integer_items_and_null_tolerance(spark):
    """Non-string item columns work (schema derived from the input) and
    NULL items are ignored rather than conflated with the count
    markers."""
    from collections import Counter

    rows = [(i % 7,) for i in range(700)] + [(None,)] * 50
    df = (spark.createDataFrame(rows, "k int").repartition(8))
    got = {(r.k, r.n) for r in heavy_hitters(df, "k", 0.1).collect()}
    exact = {(k, c) for k, c in
             Counter(k for k, in rows if k is not None).items()
             if c >= 0.1 * 700}
    assert got == exact and got
