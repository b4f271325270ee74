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


def test_cms_estimates_overestimate_only_and_bounded(spark):
    import math

    from dynamic_partitioner_spark.operators.frequency import cms_estimates

    rows = ([("hot",)] * 500
            + [(f"mid{i}", ) for i in range(50) for _ in range(10)]
            + [(f"tail{i}",) for i in range(400)])
    df = spark.createDataFrame(rows, "term string").repartition(8)
    out = cms_estimates(df, "term", top=10, width=256, depth=4).collect()
    assert len(out) == 10
    n_stream = len(rows)
    bound = math.e * n_stream / 256
    for r in out:
        assert r.n_est >= r.n_true, (r.item, r.n_true, r.n_est)
        assert r.n_est - r.n_true <= bound, (r.item, r.n_true, r.n_est)
    top1 = next(r for r in out if r.rank == 1)
    assert top1.item == "hot" and top1.n_true == 500


def test_cms_estimates_deterministic_across_partitionings(spark):
    from dynamic_partitioner_spark.operators.frequency import cms_estimates

    rows = [(f"t{i % 20}",) for i in range(1000)]
    a = spark.createDataFrame(rows, "term string").repartition(2)
    b = spark.createDataFrame(rows, "term string").repartition(16)
    ra = sorted((r.item, r.n_true, r.n_est)
                for r in cms_estimates(a, "term", top=5).collect())
    rb = sorted((r.item, r.n_true, r.n_est)
                for r in cms_estimates(b, "term", top=5).collect())
    assert ra == rb


def test_heavy_hitters_releases_summary_cache(spark):
    """r14 hardening (the persist-retention class): the summary block
    is released once the bounded candidate set is collected — a long
    session mining many corpora must not accumulate MEMORY_AND_DISK
    blocks — and the result is unchanged by the collect-then-broadcast
    rewrite."""
    rows = [("a",)] * 60 + [("b",)] * 30 + [("c",)] * 10
    df = spark.createDataFrame(rows, "w string").repartition(4)
    # delta, not absolute: the shared test session may carry other
    # operators' INTENTIONAL persists (e.g. topk_ivf_pruned's qb)
    jsc = spark.sparkContext._jsc.sc()
    pinned_before = jsc.getPersistentRDDs().size()
    got = {(r.w, r.n) for r in heavy_hitters(df, "w", 0.25).collect()}
    assert got == {("a", 60), ("b", 30)}
    pinned_after = jsc.getPersistentRDDs().size()
    assert pinned_after <= pinned_before, (
        f"heavy_hitters leaked {pinned_after - pinned_before} "
        f"persisted RDD block(s)")
